"""Pallas-backward fused MLP (ops/mlp.py impl="pallas_bwd", round-5
VERDICT #1): the forward spills the pre-activation, the backward kernel
computes dx/dh/a recompute-free, and dw1/dw2 are plain bf16 matmuls.
Gradients are bf16-class vs the XLA path (NOT bit-identical, unlike the
recompute-VJP "pallas" impl) — these tests bound that drift and check
the padding and SPMD paths on the CPU mesh (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smb_vision_tpu.ops.mlp import _mlp_fused_tb, _mlp_xla, mlp_forward

K, F = 128, 256


def _args(rng, m, k=K, f=F):
    x = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(k, f)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(f,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(f, k)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(k,)) * 0.1, jnp.float32)
    return x, w1, b1, w2, b2


def _grads(fn, args, w):
    # random cotangent weights: a structured weight (e.g. cos(arange))
    # makes the true db2 a near-cancelling trigonometric sum, amplifying
    # benign bf16 rounding into large RELATIVE error
    def loss(*a):
        y = fn(*a)
        return jnp.sum(y.astype(jnp.float32) * w)
    return jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))(*args)


def _assert_close(got, want, tol, what):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    scale = np.abs(want).max() + 1e-6
    err = np.abs(got - want).max() / scale
    assert err < tol, (what, err)


@pytest.mark.parametrize("act", ["gelu", "gelu_new"])
def test_pallas_bwd_fwd_and_grads_match_xla(rng, act):
    args = _args(rng, 256)
    bx = tuple(a.astype(jnp.bfloat16) if i == 0 else a
               for i, a in enumerate(args))

    def pb(*a):
        return _mlp_fused_tb(*a, (act, True))

    def xla(*a):
        return _mlp_xla(*a, act=act)

    y = jax.jit(pb)(*bx)
    y_ref = jax.jit(xla)(*bx)
    _assert_close(y, y_ref, 2e-2, "fwd")

    w = jnp.asarray(rng.normal(size=y.shape), jnp.float32)
    g = _grads(pb, bx, w)
    g_ref = _grads(xla, bx, w)
    # bias grads: the XLA bf16 path reduces the bf16 cotangent in bf16
    # while the pallas path accumulates in f32 (strictly tighter), so
    # XLA's own accumulation noise dominates the cross-path gap there —
    # db1/db2 are checked against the all-f32 ground truth instead
    g_f32 = _grads(xla, args, w)
    for gi, ri, fi, name in zip(g, g_ref, g_f32,
                                ["dx", "dw1", "db1", "dw2", "db2"]):
        ref = fi if name in ("db1", "db2") else ri
        _assert_close(gi, ref, 3e-2, name)
        assert gi.dtype == ri.dtype or name == "dx", (name, gi.dtype)


def test_pallas_bwd_padding_rows(rng):
    """Odd row counts pad to the next 512 multiple; padded rows must
    contribute exactly nothing to any gradient (0-cotangent rows ride
    finite spilled h — no 0*NaN poisoning)."""
    m = 2176 + 64                        # not a 512 multiple, >= 2048
    args = _args(rng, m)
    bx = tuple(a.astype(jnp.bfloat16) if i == 0 else a
               for i, a in enumerate(args))

    def pb(*a):
        return _mlp_fused_tb(*a, ("gelu", True))

    y = jax.jit(pb)(*bx)
    assert y.shape == (m, K)
    xla = lambda *a: _mlp_xla(*a, act="gelu")     # noqa: E731
    w = jnp.asarray(rng.normal(size=y.shape), jnp.float32)
    g = _grads(pb, bx, w)
    g_ref = _grads(xla, bx, w)
    g_f32 = _grads(xla, args, w)         # see the grads test: bias grads
    for gi, ri, fi, name in zip(g, g_ref, g_f32,   # vs f32 ground truth
                                ["dx", "dw1", "db1", "dw2", "db2"]):
        assert np.isfinite(np.asarray(gi, np.float32)).all(), name
        ref = fi if name in ("db1", "db2") else ri
        _assert_close(gi, ref, 3e-2, name)


def test_mlp_forward_entry_routes_pallas_bwd(rng):
    x, w1, b1, w2, b2 = _args(rng, 256)
    y = jax.jit(lambda *a: mlp_forward(*a, act="gelu", impl="pallas_bwd"))(
        x.astype(jnp.bfloat16), w1, b1, w2, b2)
    y_ref = _mlp_xla(x.astype(jnp.bfloat16), w1, b1, w2, b2, "gelu")
    _assert_close(y, y_ref, 2e-2, "entry fwd")
    with pytest.raises(ValueError, match="cannot map"):
        mlp_forward(x[:100], w1, b1, w2, b2, act="gelu",
                    impl="pallas_bwd")


def test_pallas_bwd_sharded_rows_match_replicated(rng):
    """dp/fsdp SPMD: row-sharded input through the partitioned train
    fwd + bwd must equal the replicated result (dim0_partitioned keeps
    the kernel per-shard; weight grads psum through GSPMD)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from smb_vision_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(devices=jax.devices()[:8])
    args = _args(rng, 512)
    bx = [a.astype(jnp.bfloat16) if i == 0 else a
          for i, a in enumerate(args)]

    def loss(*a):
        y = _mlp_fused_tb(*a, ("gelu", True))
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g_ref = jax.jit(jax.grad(loss, argnums=(0, 1, 3)))(*bx)

    xs = jax.device_put(bx[0], NamedSharding(mesh, P("data", None)))
    with jax.set_mesh(mesh):
        g_sh = jax.jit(jax.grad(loss, argnums=(0, 1, 3)))(
            xs, *bx[1:])
        g_sh = jax.block_until_ready(g_sh)
    for a, b, name in zip(g_sh, g_ref, ["dx", "dw1", "dw2"]):
        _assert_close(a, b, 1e-2, name)


def test_pallas_bwd_keeps_megatron_tp_split(rng):
    """Megatron-TP weights (fc1 column-split / fc2 row-split over the
    mesh axis) must KEEP their split through the pallas_bwd TRAIN path
    (round-5 review): each shard computes its F chunk of h/dh/a — the
    spilled h stays (m, F/tp) per device — and the y/dx partials psum.
    Forcing replication would silently multiply per-device MLP FLOPs
    and h memory by the model-axis size."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from smb_vision_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(devices=jax.devices()[:8])
    args = _args(rng, 512, k=128, f=1024)    # per-shard F chunk = 128
    bx = [a.astype(jnp.bfloat16) if i == 0 else a
          for i, a in enumerate(args)]
    w1s = jax.device_put(bx[1], NamedSharding(mesh, P(None, "data")))
    b1s = jax.device_put(bx[2], NamedSharding(mesh, P("data")))
    w2s = jax.device_put(bx[3], NamedSharding(mesh, P("data", None)))

    def loss(x, w1, b1, w2, b2):
        y = _mlp_fused_tb(x, w1, b1, w2, b2, ("gelu", True))
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g_ref = jax.jit(jax.grad(loss, argnums=(0, 1, 3)))(*bx)
    with jax.set_mesh(mesh):
        f = jax.jit(jax.grad(loss, argnums=(0, 1, 3)))
        hlo = f.lower(bx[0], w1s, b1s, w2s, bx[4]).compile().as_text()
        assert hlo.count("all-gather") == 0, "TP split was replicated"
        assert hlo.count("all-reduce") >= 1, "missing partial-sum combine"
        g_sh = jax.block_until_ready(f(bx[0], w1s, b1s, w2s, bx[4]))
    for a, b, name in zip(g_sh, g_ref, ["dx", "dw1", "dw2"]):
        _assert_close(a, b, 1e-2, name)


def test_pallas_bwd_primal_is_no_spill_forward(rng):
    """A NON-differentiated pallas_bwd call (EMA teacher, eval,
    inference) must run the plain no-spill forward kernel — XLA cannot
    DCE one output of a pallas custom-call, so routing the primal
    through the train kernel would write a dead (m, F) h buffer to HBM
    per layer (round-5 review). At a shape where the fwd and train
    tile plans coincide the outputs are bitwise equal."""
    args = _args(rng, 256)   # K=128, F=256: both planners pick (256,256,256)
    bx = tuple(a.astype(jnp.bfloat16) if i == 0 else a
               for i, a in enumerate(args))
    y_tb = jax.jit(lambda *a: mlp_forward(*a, act="gelu",
                                          impl="pallas_bwd"))(*bx)
    y_fwd = jax.jit(lambda *a: mlp_forward(*a, act="gelu",
                                           impl="pallas"))(*bx)
    assert jnp.array_equal(y_tb, y_fwd)


def test_pallas_bwd_cotangent_dtypes_match_primals(rng):
    """The VJP's cotangent dtypes must match the primals', like the
    'pallas'/'xla' impls (round-5 review: dw1/dw2 came back f32 for
    bf16 primal weights)."""
    args = _args(rng, 256)
    bx = tuple(a.astype(jnp.bfloat16) for a in args)

    def loss(*a):
        y = _mlp_fused_tb(*a, ("gelu", True))
        return jnp.sum(y.astype(jnp.float32))

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))(*bx)
    for gi, pi, name in zip(g, bx, ["dx", "dw1", "db1", "dw2", "db2"]):
        assert gi.dtype == pi.dtype, (name, gi.dtype)


def test_mlp_module_trains_with_pallas_bwd(rng):
    """One optimizer step through the flax Mlp module at
    mlp_impl='pallas_bwd' decreases the loss (interpret mode)."""
    import optax

    from smb_vision_tpu.models.layers import Mlp

    m = Mlp(hidden_size=K, intermediate_size=F, act="gelu",
            dtype=jnp.bfloat16, mlp_impl="pallas_bwd")
    x = jnp.asarray(rng.normal(size=(2, 128, K)), jnp.bfloat16)
    tgt = jnp.asarray(rng.normal(size=(2, 128, K)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        def loss_fn(p):
            y = m.apply(p, x).astype(jnp.float32)
            return jnp.mean((y - tgt) ** 2)
        l, g = jax.value_and_grad(loss_fn)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    losses = []
    for _ in range(3):
        params, opt, l = step(params, opt)
        losses.append(float(l))
    assert losses[-1] < losses[0], losses
