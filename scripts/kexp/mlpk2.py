"""Isolate which gelu formulation Mosaic will lower (erf is not
supported: 'Unimplemented primitive ... erf'), then time the fused MLP
with the survivor. Micro-kernels first (fast compiles), then the chain.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INVSQRT2 = 0.7071067811865476


def gelu_as(x):
    # Abramowitz-Stegun 7.1.26 erf (|err|<=1.5e-7), sign via where
    z = jnp.abs(x) * INVSQRT2
    t = 1.0 / (1.0 + 0.3275911 * z)
    poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
             - 0.284496736) * t + 0.254829592) * t
    e = 1.0 - poly * jnp.exp(-z * z)
    erf = jnp.where(x >= 0, e, -e)
    return 0.5 * x * (1.0 + erf)


def gelu_tanh(x):
    return 0.5 * x * (1.0 + jnp.tanh(
        0.7978845608028654 * (x + 0.044715 * x * x * x)))


VARIANTS = {"as": gelu_as, "tanh": gelu_tanh}


def micro(name):
    g = VARIANTS[name]

    def kern(x_ref, o_ref):
        o_ref[...] = g(x_ref[...].astype(jnp.float32)).astype(o_ref.dtype)

    x = jnp.linspace(-4, 4, 8 * 128, dtype=jnp.float32).reshape(8, 128)
    y = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x)
    ref = jax.nn.gelu(x, approximate=False)
    err = float(jnp.abs(y - ref).max())
    print(f"micro[{name}] ok, max abs err vs erf-gelu: {err:.2e}",
          flush=True)


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    for name in VARIANTS:
        try:
            micro(name)
        except Exception as e:  # noqa: BLE001
            print(f"micro[{name}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    # chain timing with the A-S gelu (and tanh as control)
    from scripts.kexp import mlpk

    M, K, F = mlpk.M, mlpk.K, mlpk.F
    LINKS = mlpk.LINKS
    xs = [mlpk.mk(i, (M, K)) for i in range(4)]
    w1, w2 = mlpk.mk(97, (K, F)), mlpk.mk(98, (F, K))
    b1 = mlpk.mk(99, (1, F), jnp.float32) * 0.1
    b2 = mlpk.mk(100, (1, K), jnp.float32) * 0.1

    def fused(x, w1, b1, w2, b2, bm, bn, g):
        def kern(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
            xv = x_ref[...]
            acc = jnp.zeros((bm, K), jnp.float32)
            for j in range(F // bn):
                h = jax.lax.dot_general(
                    xv, w1_ref[:, j * bn:(j + 1) * bn],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                h = g(h + b1_ref[0, j * bn:(j + 1) * bn])
                acc = acc + jax.lax.dot_general(
                    h.astype(jnp.bfloat16), w2_ref[j * bn:(j + 1) * bn, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            o_ref[...] = (acc + b2_ref[...]).astype(o_ref.dtype)

        return pl.pallas_call(
            kern,
            grid=(M // bm,),
            in_specs=[
                pl.BlockSpec((bm, K), lambda i: (i, 0)),
                pl.BlockSpec((K, F), lambda i: (0, 0)),
                pl.BlockSpec((1, F), lambda i: (0, 0)),
                pl.BlockSpec((F, K), lambda i: (0, 0)),
                pl.BlockSpec((1, K), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((bm, K), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((M, K), x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(x, w1, b1, w2, b2)

    FLOPS = 4 * M * K * F * LINKS

    def timeit(label, fn, args_list, n_pass=3):
        float(fn(*args_list[0]))
        times = []
        for _ in range(n_pass):
            for args in args_list[1:]:
                t0 = time.perf_counter()
                float(fn(*args))
                times.append(time.perf_counter() - t0)
        t = min(times)
        print(f"{label:34s} {t/LINKS*1e3:8.3f} ms/link  "
              f"{FLOPS/t/1e12:7.1f} TFLOP/s", flush=True)

    for gname, g in VARIANTS.items():
        for bm, bn in ((256, 768), (512, 768), (512, 1536), (1024, 768)):
            @jax.jit
            def chain(x, w1, b1, w2, b2, bm=bm, bn=bn, g=g):
                y = x
                for _ in range(LINKS):
                    y = (fused(y, w1, b1, w2, b2, bm, bn, g) * 0.2
                         ).astype(jnp.bfloat16)
                return jnp.sum(y.astype(jnp.float32))

            try:
                timeit(f"pallas[{gname}] bm={bm} bn={bn}", chain,
                       [(x, w1, b1, w2, b2) for x in xs])
            except Exception as e:  # noqa: BLE001
                print(f"pallas[{gname}] bm={bm} bn={bn} FAILED: "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)

    # accuracy of the A-S fused kernel vs f32 reference
    xf = xs[0].astype(jnp.float32)
    ref = (jax.nn.gelu(xf @ w1.astype(jnp.float32) + b1,
                       approximate=False) @ w2.astype(jnp.float32) + b2)
    scale = float(jnp.abs(ref).max())
    y = fused(xs[0], w1, b1, w2, b2, 512, 768, gelu_as).astype(jnp.float32)
    print(f"rel err pallas[as]    : "
          f"{float(jnp.abs(y - ref).max()) / scale:.2e}", flush=True)


if __name__ == "__main__":
    main()
