"""Round-3 int8-score kernel overlap lab (VERDICT item 1).

The shipped int8 kernel measures 10.2-10.7 ms/layer at the d64 flagship
shape; its floor decomposition is qk-int8 ~2.1 + transposed pv ~4.2 +
f32 exp chain ~4 ms => near-serial. These variants attack the MXU/VPU
overlap and the exp cost itself:

- base:   the shipped structure (all qk sub-matmuls, then exp+pv chains)
- inter:  explicit round-robin software pipeline - each iteration issues
          qk(u+1) [MXU], exp(u) [VPU], pv(u) [MXU] in program order so the
          scheduler can overlap independent units
- poly:   exp2 via exponent assembly + degree-3 polynomial (bitcast int
          ops only - Mosaic's transcendental exp2 upcasts and serializes)
- sexp:   Schraudolph one-fma exp2 (accuracy ~2-3%: speed ceiling probe,
          not a shippable default)

Timing protocol (memory/round2-kernel-findings): 12 layer-equivalents
chained per jit call, distinct random inputs per call, scalar readback.
Numerics: rel err vs XLA f32 softmax per variant.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, N, D = 12, 20480, 64
LAYERS = 12
FLOPS = 4 * N * N * D * H
NEG_INF = -1e30
LOG2E = 1.4426950408889634


def exp2_poly(t):
    """exp2 for t <= 0 via exponent assembly + cubic poly on the fraction.
    Max rel err ~2e-4 (vs bf16 quantization 4e-3). No transcendental."""
    t = jnp.maximum(t, -126.0)
    i = jnp.floor(t)
    f = t - i                                     # [0, 1)
    # least-squares-on-relative-error cubic: max rel err 1.4e-4
    p = 0.99986369 + f * (0.69617211 + f * (0.22586841 + f * 0.07782313))
    e = (i.astype(jnp.int32) + 127) << 23
    return jax.lax.bitcast_convert_type(e, jnp.float32) * p


def exp2_sexp(t):
    """Schraudolph: one fma + bitcast. Rel err up to ~3%."""
    t = jnp.maximum(t, -126.0)
    e = (t * 8388608.0 + 1065353223.0).astype(jnp.int32)
    return jax.lax.bitcast_convert_type(e, jnp.float32)


def _kernel(q_ref, k_ref, v1_ref, sq_ref, sk_ref, o_ref, c_scr, acc_scr,
            *, block_k, kv_len, unroll, mode, exp_fn):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)
    b = pl.program_id(0)
    q = q_ref[0]
    scale = sk_ref[b] * sq_ref[b]
    sub = block_k // unroll
    d = o_ref.shape[-1]

    def qk(u):
        k_u = k_ref[0][u * sub:(u + 1) * sub]
        st = jax.lax.dot_general(k_u, q, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        return st.astype(jnp.float32) * scale

    if mode == "base":
        sts = [qk(u) for u in range(unroll)]

        @pl.when(ik == 0)
        def _init():
            m = jnp.max(sts[0], axis=0, keepdims=True)
            for st in sts[1:]:
                m = jnp.maximum(m, jnp.max(st, axis=0, keepdims=True))
            c_scr[:] = jnp.broadcast_to(m, c_scr.shape)
            acc_scr[:] = jnp.zeros_like(acc_scr)

        c = c_scr[:1]
        acc = acc_scr[:]
        for u in range(unroll):
            v_u = v1_ref[0][u * sub:(u + 1) * sub]
            pt = exp_fn(sts[u] - c).astype(v_u.dtype)
            acc += jax.lax.dot_general(v_u, pt, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
        acc_scr[:] = acc
    else:  # inter: round-robin qk(u+1) / exp(u) / pv(u)
        st0 = qk(0)

        @pl.when(ik == 0)
        def _init():
            # shift from the FIRST sub-block only (vs all sub-blocks in
            # base): unblocks the pipeline; exactness unaffected (shift
            # cancels), overflow margin still >100 log2 units
            m = jnp.max(st0, axis=0, keepdims=True)
            c_scr[:] = jnp.broadcast_to(m, c_scr.shape)
            acc_scr[:] = jnp.zeros_like(acc_scr)

        c = c_scr[:1]
        acc = acc_scr[:]
        st = st0
        for u in range(unroll):
            st_next = qk(u + 1) if u + 1 < unroll else None
            v_u = v1_ref[0][u * sub:(u + 1) * sub]
            pt = exp_fn(st - c).astype(v_u.dtype)
            acc += jax.lax.dot_general(v_u, pt, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            st = st_next
        acc_scr[:] = acc

    @pl.when(ik == nk - 1)
    def _finish():
        l = acc_scr[d:d + 1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:d] / l).T.astype(o_ref.dtype)


def fwd_i8_v2(q, k, v, *, scale, block_q, block_k, unroll=4, mode="base",
              exp_kind="hw"):
    bh, nq, d = q.shape
    kv = k.shape[1]
    qf = q.astype(jnp.float32) * (scale * LOG2E)
    sq = jnp.max(jnp.abs(qf), axis=(1, 2), keepdims=True) / 127.0
    q8 = jnp.clip(jnp.round(qf / sq), -127, 127).astype(jnp.int8)
    kf = k.astype(jnp.float32)
    sk = jnp.max(jnp.abs(kf), axis=(1, 2), keepdims=True) / 127.0
    k8 = jnp.clip(jnp.round(kf / sk), -127, 127).astype(jnp.int8)
    ones = jnp.ones((bh, kv, 1), v.dtype)
    zpad = jnp.zeros((bh, kv, 7), v.dtype)
    v1 = jnp.concatenate([v, ones, zpad], axis=-1)
    exp_fn = {"hw": jnp.exp2, "poly": exp2_poly, "sexp": exp2_sexp}[exp_kind]
    grid = (bh, nq // block_q, kv // block_k)
    return pl.pallas_call(
        functools.partial(_kernel, block_k=block_k, kv_len=kv,
                          unroll=unroll, mode=mode, exp_fn=exp_fn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d + 8), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, nq, d), v.dtype),
        scratch_shapes=[
            pltpu.VMEM((8, block_q), jnp.float32),
            pltpu.VMEM((d + 8, block_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=110 * 2 ** 20),
    )(q8, k8, v1, sq.reshape(bh), sk.reshape(bh))


def mk(i, n=N):
    ks = jax.random.split(jax.random.PRNGKey(i), 3)
    return [(jax.random.normal(kk, (H, n, D)) * 0.5).astype(jnp.bfloat16)
            for kk in ks]


def xla_ref(q, k, v, scale):
    s = jnp.einsum("hqd,hkd->hqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("hqk,hkd->hqd", p, v.astype(jnp.float32))


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    scale = 1 / np.sqrt(D)
    cache = {}

    # numerics at a small shape first (cheap compile)
    nq_s = 1024
    qs, ks_, vs = mk(7, nq_s)

    def check(mode, exp_kind, unroll=4):
        out = jax.jit(lambda q, k, v: fwd_i8_v2(
            q, k, v, scale=scale, block_q=512, block_k=512, unroll=unroll,
            mode=mode, exp_kind=exp_kind))(qs, ks_, vs)
        ref = jax.jit(lambda q, k, v: xla_ref(q, k, v, scale))(qs, ks_, vs)
        err = float(jnp.linalg.norm(out.astype(jnp.float32) - ref)
                    / jnp.linalg.norm(ref))
        print(f"numerics {mode}/{exp_kind}/u{unroll}: rel err {err:.5f}",
              flush=True)

    for mode, ek in (("base", "hw"), ("inter", "hw"), ("inter", "poly"),
                     ("inter", "sexp")):
        check(mode, ek)

    def bench(tag, mode, exp_kind, unroll, bq=4096, bk=2048):
        @jax.jit
        def many(q, k, v):
            out = q
            for _ in range(LAYERS):
                out = fwd_i8_v2(out, k, v, scale=scale, block_q=bq,
                                block_k=bk, unroll=unroll, mode=mode,
                                exp_kind=exp_kind)
            return jnp.sum(out.astype(jnp.float32))

        def run(i):
            if i not in cache:
                cache[i] = mk(i)
            q, k, v = cache[i]
            return many(q, k, v)

        try:
            float(run(0))
        except Exception as e:  # noqa: BLE001
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:150]}",
                  flush=True)
            return
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            float(run(100 + i))
            times.append(time.perf_counter() - t0)
        t = min(times) / LAYERS
        print(f"{tag:24s}: {t*1e3:6.2f} ms/layer "
              f"{FLOPS/t/1e12:6.1f} TFLOP/s-equiv", flush=True)

    combos = [
        ("base_u4 (control)", "base", "hw", 4),
        ("inter_u4", "inter", "hw", 4),
        ("inter_u8", "inter", "hw", 8),
        ("base_u8", "base", "hw", 8),
        ("inter_poly_u4", "inter", "poly", 4),
        ("inter_poly_u8", "inter", "poly", 8),
        ("base_poly_u4", "base", "poly", 4),
        ("inter_sexp_u4", "inter", "sexp", 4),
    ]
    for tag, mode, ek, u in combos:
        bench(tag, mode, ek, u)


if __name__ == "__main__":
    main()
