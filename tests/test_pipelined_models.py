"""Model-level pipeline parallelism: whole-checkpoint embedding forwards
(VideoMAE, VJEPA2 with RoPE) through the GPipe pipeline match the dense
model application bit-for-bit at f32 tolerances."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from smb_vision_tpu.models.configs import VideoMAEConfig, VJEPA2Config
from smb_vision_tpu.models.pipelined import (
    pipelined_encoder,
    videomae_pipeline_encode,
    vjepa2_pipeline_encode,
)
from smb_vision_tpu.models.videomae import VideoMAEModel
from smb_vision_tpu.models.vjepa import VJEPA2Encoder

KEY = jax.random.PRNGKey(0)


def test_videomae_pipeline_encode_matches_dense(eight_devices):
    cfg = VideoMAEConfig(
        image_size=32, num_frames=16, patch_size=8, tubelet_size=8,
        num_channels=1, hidden_size=64, num_hidden_layers=4,
        num_attention_heads=4, intermediate_size=128,
        dtype="float32", attn_impl="xla")
    model = VideoMAEModel(cfg)
    px = jax.random.normal(KEY, (4, 16, 1, 32, 32))
    params = model.init(KEY, px)
    ref, _ = model.apply(params, px)

    mesh = Mesh(np.array(eight_devices).reshape(2, 4), ("data", "pipe"))
    out = jax.jit(lambda p, x: videomae_pipeline_encode(
        cfg, p, x, mesh=mesh, num_microbatches=2,
        batch_axis="data"))(params, px)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_vjepa2_pipeline_encode_matches_dense(eight_devices):
    cfg = VJEPA2Config(
        crop_size=32, frames_per_clip=16, patch_size=8, tubelet_size=8,
        in_chans=1, hidden_size=64, num_hidden_layers=4,
        num_attention_heads=4, mlp_ratio=2.0,
        pred_hidden_size=32, pred_num_hidden_layers=1,
        pred_num_attention_heads=2, dtype="float32", attn_impl="xla")
    model = VJEPA2Encoder(cfg)
    px = jax.random.normal(KEY, (2, 16, 1, 32, 32))
    params = model.init(KEY, px)
    ref = model.apply(params, px)

    mesh = Mesh(np.array(eight_devices[:4]), ("pipe",))
    out = jax.jit(lambda p, x: vjepa2_pipeline_encode(
        cfg, p, x, mesh=mesh, num_microbatches=2))(params, px)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_dinov2_pipeline_encode_matches_dense(eight_devices):
    from smb_vision_tpu.models.configs import Dinov2Config
    from smb_vision_tpu.models.dinov2 import Dinov2Model
    from smb_vision_tpu.models.pipelined import dinov2_pipeline_encode

    cfg = Dinov2Config(
        image_size=32, depth=16, patch_size=8, num_channels=1,
        hidden_size=48, num_hidden_layers=4, num_attention_heads=4,
        mlp_ratio=2, layerscale_value=1e-5, use_swiglu_ffn=True,
        dtype="float32", attn_impl="xla")
    model = Dinov2Model(cfg)
    px = jax.random.normal(KEY, (4, 1, 32, 32, 16))
    params = model.init(KEY, px)
    ref = model.apply(params, px)

    mesh = Mesh(np.array(eight_devices).reshape(2, 4), ("data", "pipe"))
    out = jax.jit(lambda pp, x: dinov2_pipeline_encode(
        cfg, pp, x, mesh=mesh, num_microbatches=2,
        batch_axis="data"))(params, px)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipelined_encoder_guards(eight_devices):
    from smb_vision_tpu.models.layers import Encoder

    mesh = Mesh(np.array(eight_devices[:2]), ("pipe",))
    x = jax.random.normal(KEY, (2, 8, 16))
    enc_dp = Encoder(num_layers=2, hidden_size=16, num_heads=2,
                     intermediate_size=32, dtype=jnp.float32,
                     attn_impl="xla", drop_path_rate=0.1)
    params = enc_dp.init(KEY, x)["params"]
    with pytest.raises(ValueError, match="deterministic"):
        pipelined_encoder(enc_dp, params, x, mesh=mesh,
                          num_microbatches=2, deterministic=False)
    enc_sp = Encoder(num_layers=2, hidden_size=16, num_heads=2,
                     intermediate_size=32, dtype=jnp.float32,
                     attn_impl="xla", sequence_parallel=True)
    with pytest.raises(ValueError, match="sequence_parallel"):
        pipelined_encoder(enc_sp, params, x, mesh=mesh,
                          num_microbatches=2)


def _tiny_pretrain_cfg():
    return VideoMAEConfig(
        image_size=32, num_frames=16, patch_size=8, tubelet_size=8,
        num_channels=1, hidden_size=64, num_hidden_layers=4,
        num_attention_heads=4, intermediate_size=128,
        decoder_hidden_size=32, decoder_num_hidden_layers=2,
        decoder_num_attention_heads=2, decoder_intermediate_size=64,
        dtype="float32", attn_impl="xla")


def test_videomae_pipeline_pretrain_matches_dense(eight_devices):
    """Full MIM pretraining forward AND gradients through the pipelined
    encoder+decoder match the dense VideoMAEForPreTraining."""
    from smb_vision_tpu.models.pipelined import (
        from_pipeline_pretrain_params,
        to_pipeline_pretrain_params,
        videomae_pipeline_pretrain,
    )
    from smb_vision_tpu.models.videomae import VideoMAEForPreTraining
    from smb_vision_tpu.ops.masking import mim_mask, num_masked_tokens

    cfg = _tiny_pretrain_cfg()
    model = VideoMAEForPreTraining(cfg)
    M = num_masked_tokens(32, 16, 8, 8, 0.5)
    px = jax.random.normal(KEY, (4, 16, 1, 32, 32))
    mask = mim_mask(KEY, 4, input_size=32, depth=16, mask_patch_size=8,
                    model_patch_size=8, mask_ratio=0.5)
    params = model.init(KEY, px, mask, M)

    def dense_loss(p):
        return model.apply(p, px, mask, M)["loss"]

    ref_loss, ref_grads = jax.value_and_grad(dense_loss)(params)

    pparams = to_pipeline_pretrain_params(params)
    # round-trip identity
    rt = from_pipeline_pretrain_params(pparams)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, rt)

    mesh = Mesh(np.array(eight_devices[:4]).reshape(2, 2),
                ("data", "model"))

    def pipe_loss(p):
        return videomae_pipeline_pretrain(
            cfg, p, px, mask, M, mesh=mesh, num_microbatches=2,
            batch_axis="data")["loss"]

    loss, grads = jax.jit(jax.value_and_grad(pipe_loss))(pparams)
    np.testing.assert_allclose(float(loss), float(ref_loss),
                               rtol=2e-5, atol=2e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5),
        from_pipeline_pretrain_params(grads), ref_grads)


def test_pipelined_mim_workload_trains_sharded(eight_devices):
    """End-to-end pipelined pretraining: stacked params/opt-state shard
    their layer axis over the model axis, the loss falls, and the stacked
    leaves really live S-way sharded."""
    import optax

    from smb_vision_tpu.parallel.mesh import create_mesh
    from smb_vision_tpu.parallel.sharding import (
        opt_state_shardings,
        param_shardings,
        shard_params,
    )
    from smb_vision_tpu.train.mim import make_pipelined_mim_workload

    cfg = _tiny_pretrain_cfg()
    mesh = create_mesh(model=2, devices=eight_devices)
    _, init_fn, step_fn, eval_fn = make_pipelined_mim_workload(
        cfg, mask_patch_size=8, mask_ratio=0.5, tx=optax.adamw(1e-3),
        mesh=mesh, num_microbatches=2)
    with jax.set_mesh(mesh):
        state = init_fn(KEY)
    p_sh = param_shardings(state["params"], mesh, policy="pipeline")
    state["params"] = shard_params(state["params"], p_sh)
    state["opt_state"] = jax.device_put(
        state["opt_state"],
        opt_state_shardings(state["opt_state"], p_sh, mesh,
                            params=state["params"]))

    enc_stack_leaf = state["params"]["params"]["videomae"][
        "encoder_stacked"]["attention"]["query"]["kernel"]
    spec = enc_stack_leaf.sharding.spec
    assert spec and spec[0] == "model", spec

    batch = {"pixel_values": jax.random.normal(KEY, (8, 16, 1, 32, 32))}
    step = jax.jit(step_fn, donate_argnums=(0,))
    losses = []
    with jax.set_mesh(mesh):
        for i in range(4):
            state, metrics = step(state, batch,
                                  jax.random.PRNGKey(100 + i))
            losses.append(float(metrics["loss"]))
        ev = eval_fn(state, batch)
    assert losses[-1] < losses[0], losses
    assert np.isfinite(ev["loss"])
    # opt-state moments mirror the pipe sharding
    mu = jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda x: x, state["opt_state"]))
    assert all(np.isfinite(np.asarray(m)).all() for m in mu
               if hasattr(m, "shape"))


def _tiny_vjepa_cfg():
    return VJEPA2Config(
        crop_size=32, frames_per_clip=16, patch_size=8, tubelet_size=8,
        in_chans=1, hidden_size=64, num_hidden_layers=4,
        num_attention_heads=4, mlp_ratio=2.0, pred_hidden_size=32,
        pred_num_hidden_layers=2, pred_num_attention_heads=2,
        pred_mlp_ratio=2.0, dtype="float32", attn_impl="xla")


def test_vjepa2_pipeline_pretrain_matches_dense(eight_devices):
    """V-JEPA pretraining loss AND grads through the pipelined student /
    teacher / predictor stacks match the dense formulation."""
    from smb_vision_tpu.models.pipelined import (
        from_pipeline_vjepa_params,
        to_pipeline_vjepa_params,
        vjepa2_pipeline_pretrain,
    )
    from smb_vision_tpu.models.vjepa import VJEPA2Model, vjepa_loss
    from smb_vision_tpu.ops.masking import vjepa_target_mask

    cfg = _tiny_vjepa_cfg()
    model = VJEPA2Model(cfg)
    px = jax.random.normal(KEY, (4, 16, 1, 32, 32))
    tb = vjepa_target_mask(KEY, 4, grid=cfg.grid)
    params = model.init(KEY, px, target_bool=tb)
    teacher = jax.tree_util.tree_map(
        lambda a: a + 0.01, params)   # distinct teacher

    def dense_loss(p):
        out = model.apply(p, px, target_bool=tb, deterministic=True)
        tgt = model.apply(teacher, px, target_bool=tb,
                          skip_predictor=True)["last_hidden_state"]
        return vjepa_loss(out["predictor_output"],
                          jax.lax.stop_gradient(tgt), tb)

    ref_loss, ref_grads = jax.value_and_grad(dense_loss)(params)

    pparams = to_pipeline_vjepa_params(params)
    pteacher = to_pipeline_vjepa_params(teacher)
    rt = from_pipeline_vjepa_params(pparams)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, rt)

    mesh = Mesh(np.array(eight_devices[:4]).reshape(2, 2),
                ("data", "model"))

    def pipe_loss(p):
        return vjepa2_pipeline_pretrain(
            cfg, p, pteacher, px, tb, mesh=mesh, num_microbatches=2,
            batch_axis="data")

    loss, grads = jax.jit(jax.value_and_grad(pipe_loss))(pparams)
    np.testing.assert_allclose(float(loss), float(ref_loss),
                               rtol=2e-5, atol=2e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5),
        from_pipeline_vjepa_params(grads), ref_grads)


def test_pipelined_vjepa_workload_trains_sharded(eight_devices):
    """Pipelined V-JEPA end-to-end: stacked student+teacher+opt shard over
    the model axis, EMA tracks the online params, loss falls."""
    import optax

    from smb_vision_tpu.parallel.mesh import create_mesh
    from smb_vision_tpu.parallel.sharding import (
        opt_state_shardings,
        param_shardings,
        shard_params,
    )
    from smb_vision_tpu.train.vjepa import make_pipelined_vjepa_workload

    cfg = _tiny_vjepa_cfg()
    mesh = create_mesh(model=2, devices=eight_devices)
    _, init_fn, step_fn, eval_fn = make_pipelined_vjepa_workload(
        cfg, tx=optax.adamw(1e-3), mesh=mesh, num_microbatches=2)
    with jax.set_mesh(mesh):
        state = init_fn(KEY)
    p_sh = param_shardings(state["params"], mesh, policy="pipeline")
    state["params"] = shard_params(state["params"], p_sh)
    state["teacher"] = shard_params(
        state["teacher"],
        param_shardings(state["teacher"], mesh, policy="pipeline"))
    state["opt_state"] = jax.device_put(
        state["opt_state"],
        opt_state_shardings(state["opt_state"], p_sh, mesh,
                            params=state["params"]))
    spec = state["params"]["params"]["encoder"]["encoder_stacked"][
        "attention"]["query"]["kernel"].sharding.spec
    assert spec and spec[0] == "model", spec

    batch = {"pixel_values": jax.random.normal(KEY, (8, 16, 1, 32, 32))}
    step = jax.jit(step_fn, donate_argnums=(0,))
    losses = []
    with jax.set_mesh(mesh):
        for _ in range(4):
            # fixed key -> fixed mask: a stationary objective, so the
            # loss must fall even over few steps (per-step random masks
            # make a 4-step trend noise-dominated)
            state, metrics = step(state, batch, jax.random.PRNGKey(100))
            losses.append(float(metrics["loss"]))
        ev = eval_fn(state, batch)
    assert losses[-1] < losses[0], losses
    assert np.isfinite(ev["loss"])
    # EMA teacher moved toward the online params but is not equal
    t = state["teacher"]["params"]["encoder"]["encoder_stacked"][
        "attention"]["query"]["kernel"]
    s = state["params"]["params"]["encoder"]["encoder_stacked"][
        "attention"]["query"]["kernel"]
    d = float(jnp.abs(jnp.asarray(t) - jnp.asarray(s)).max())
    assert 0 < d < 1.0, d


def test_pipelined_encoder_layerscale_swiglu(eight_devices):
    """DINOv2-style blocks (LayerScale + SwiGLU) through the pipeline:
    the stacked layout must carry every per-layer param kind."""
    from smb_vision_tpu.models.layers import Encoder

    enc = Encoder(num_layers=4, hidden_size=32, num_heads=4,
                  intermediate_size=48, layerscale_value=1e-5,
                  use_swiglu=True, dtype=jnp.float32, attn_impl="xla")
    x = jax.random.normal(KEY, (2, 8, 32))
    params = enc.init(KEY, x)
    ref = enc.apply(params, x)
    mesh = Mesh(np.array(eight_devices[:4]), ("pipe",))
    out = jax.jit(lambda p, h: pipelined_encoder(
        enc, p["params"], h, mesh=mesh, num_microbatches=2))(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipelined_encoder_droppath_matches_layer_loop(eight_devices):
    """Train-mode stochastic depth through the pipeline (round-3 VERDICT
    #7): pipelined_encoder(deterministic=False, dp_rng=...) must equal a
    dense per-layer loop applying the SAME Block with the identical
    stacked rate/key schedule (rates[i] = rate*i/(L-1), key =
    fold_in(split(dp_rng)[i], microbatch)) — proving the scan/ppermute/
    stacking machinery preserves the computation with DropPath active."""
    from smb_vision_tpu.models.layers import Block, Encoder

    L, H, M = 4, 16, 2
    enc = Encoder(num_layers=L, hidden_size=H, num_heads=2,
                  intermediate_size=32, dtype=jnp.float32,
                  attn_impl="xla", drop_path_rate=0.5)
    x = jax.random.normal(KEY, (4, 8, H))
    params = enc.init(KEY, x, deterministic=True)["params"]
    dp_rng = jax.random.PRNGKey(7)

    mesh = Mesh(np.array(eight_devices[:4]), ("pipe",))
    out = jax.jit(lambda p, h: pipelined_encoder(
        enc, p, h, mesh=mesh, num_microbatches=M, deterministic=False,
        dp_rng=dp_rng))(params, x)

    # reference: dense per-layer loop, same key/rate schedule
    block = Block(H, 2, 32, dtype=jnp.float32, attn_impl="xla")
    keys = jax.random.split(dp_rng, L)
    rates = [0.5 * i / (L - 1) for i in range(L)]
    mbs = []
    rows = x.shape[0] // M
    for mb in range(M):
        h = x[mb * rows:(mb + 1) * rows]
        for i in range(L):
            h = block.apply(
                {"params": params[f"layer_{i}"]}, h, None, False,
                jnp.asarray(rates[i], jnp.float32),
                rngs={"droppath": jax.random.fold_in(keys[i], mb)})
        mbs.append(h)
    ref = jnp.concatenate(mbs, axis=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # DropPath actually fired: train-mode output differs from eval-mode
    det = enc.apply({"params": params}, x, deterministic=True)
    assert float(jnp.abs(out - det).max()) > 1e-3
    # and dropped residuals are exact: layer-0 rate is 0, later layers
    # scale kept rows by 1/keep — just assert determinism of the draw
    out2 = jax.jit(lambda p, h: pipelined_encoder(
        enc, p, h, mesh=mesh, num_microbatches=M, deterministic=False,
        dp_rng=dp_rng))(params, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_pipelined_vjepa_droppath_trains(eight_devices):
    """V-JEPA pipelined pretraining with drop_path_rate > 0 (previously a
    hard error): student+predictor run stochastic depth through the
    stacked layout, the EMA teacher stays deterministic, loss falls, and
    eval-mode is DropPath-free (bitwise repeatable)."""
    import dataclasses

    import optax

    from smb_vision_tpu.parallel.mesh import create_mesh
    from smb_vision_tpu.parallel.sharding import (
        opt_state_shardings,
        param_shardings,
        shard_params,
    )
    from smb_vision_tpu.train.vjepa import make_pipelined_vjepa_workload

    cfg = dataclasses.replace(_tiny_vjepa_cfg(), drop_path_rate=0.3)
    mesh = create_mesh(model=2, devices=eight_devices)
    _, init_fn, step_fn, eval_fn = make_pipelined_vjepa_workload(
        cfg, tx=optax.adamw(1e-3), mesh=mesh, num_microbatches=2)
    with jax.set_mesh(mesh):
        state = init_fn(KEY)
    p_sh = param_shardings(state["params"], mesh, policy="pipeline")
    state["params"] = shard_params(state["params"], p_sh)
    state["teacher"] = shard_params(
        state["teacher"],
        param_shardings(state["teacher"], mesh, policy="pipeline"))
    state["opt_state"] = jax.device_put(
        state["opt_state"],
        opt_state_shardings(state["opt_state"], p_sh, mesh,
                            params=state["params"]))

    batch = {"pixel_values": jax.random.normal(KEY, (8, 16, 1, 32, 32))}
    step = jax.jit(step_fn, donate_argnums=(0,))
    losses = []
    with jax.set_mesh(mesh):
        for _ in range(4):
            state, metrics = step(state, batch, jax.random.PRNGKey(100))
            losses.append(float(metrics["loss"]))
        ev1 = eval_fn(state, batch)
        ev2 = eval_fn(state, batch)
    assert all(np.isfinite(v) for v in losses), losses
    assert losses[-1] < losses[0], losses
    assert float(ev1["loss"]) == float(ev2["loss"])
