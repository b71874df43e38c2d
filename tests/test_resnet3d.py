"""Inflated-3D ResNet (Merlin image tower) — models/resnet3d.py.

The reference's Merlin path runs the external `merlin` package's
I3D-inflated ResNet-152 on GPU (reference src/encoders/run_merlin.py:24,
`Merlin(ImageEmbedding=True)` -> (batch, tokens, dim)). That package is
not installable here, so parity is established two independent ways:

1. a torch re-derivation golden: the exact architecture built from torch
   primitives (Conv3d/BatchNorm3d/MaxPool3d with torch-default geometry),
   randomly initialised INCLUDING nontrivial BN running stats, converted
   through models/convert.py::convert_torch_resnet3d — outputs must match
   to f32 tolerance; and
2. the I3D inflation property: a 2D torchvision-schema ResNet inflated in
   "center" mode must compute EXACTLY the 2D response independently per
   axis-0 slice (every inflated element is per-slice in center mode; max
   pooling and BN preserve axis-0-constant inputs), asserted against a
   torch 2D forward.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax

from smb_vision_tpu.models.configs import ResNet3DConfig
from smb_vision_tpu.models.convert import (
    convert_torch_resnet3d,
    inflate_resnet2d,
    resnet3d_config_from_state_dict,
)
from smb_vision_tpu.models.resnet3d import ResNet3D

SMALL = dict(stage_sizes=(1, 2), base_width=8, num_channels=1,
             stem_kernel_t=3, stem_stride_t=2, pool_kernel_t=3,
             pool_stride_t=2, conv2_kernel_t=3, expansion=4)


class TorchBottleneck(tnn.Module):
    def __init__(self, cin, width, stride, kt, expansion):
        super().__init__()
        cout = width * expansion
        self.conv1 = tnn.Conv3d(cin, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm3d(width)
        self.conv2 = tnn.Conv3d(width, width, (kt, 3, 3), stride=stride,
                                padding=(kt // 2, 1, 1), bias=False)
        self.bn2 = tnn.BatchNorm3d(width)
        self.conv3 = tnn.Conv3d(width, cout, 1, bias=False)
        self.bn3 = tnn.BatchNorm3d(cout)
        self.downsample = None
        if stride != (1, 1, 1) or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv3d(cin, cout, 1, stride=stride, bias=False),
                tnn.BatchNorm3d(cout))
        self.relu = tnn.ReLU()

    def forward(self, x):
        h = self.relu(self.bn1(self.conv1(x)))
        h = self.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        sc = x if self.downsample is None else self.downsample(x)
        return self.relu(h + sc)


class TorchI3ResNet(tnn.Module):
    """torchvision-schema i3d resnet (state-dict keys conv1/bn1/
    layer{i}.{j}.*) with the geometry ResNet3DConfig describes."""

    def __init__(self, cfg: ResNet3DConfig):
        super().__init__()
        self.conv1 = tnn.Conv3d(
            cfg.num_channels, cfg.base_width,
            (cfg.stem_kernel_t, 7, 7), stride=(cfg.stem_stride_t, 2, 2),
            padding=(cfg.stem_kernel_t // 2, 3, 3), bias=False)
        self.bn1 = tnn.BatchNorm3d(cfg.base_width)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool3d(
            (cfg.pool_kernel_t, 3, 3), stride=(cfg.pool_stride_t, 2, 2),
            padding=(cfg.pool_kernel_t // 2, 1, 1))
        cin = cfg.base_width
        for i, n in enumerate(cfg.stage_sizes):
            width = cfg.base_width * (2 ** i)
            sp = 1 if i == 0 else 2
            st = sp if cfg.temporal_downsample else 1
            blocks = []
            for j in range(n):
                stride = (st, sp, sp) if j == 0 else (1, 1, 1)
                blocks.append(TorchBottleneck(
                    cin, width, stride, cfg.conv2_kernel_t,
                    cfg.expansion))
                cin = width * cfg.expansion
            setattr(self, f"layer{i + 1}", tnn.Sequential(*blocks))
        self.stages = len(cfg.stage_sizes)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for i in range(self.stages):
            x = getattr(self, f"layer{i + 1}")(x)
        # (B, C, a0, a1, a2) -> (B, L, C) row-major tokens
        return x.flatten(2).transpose(1, 2)


def _randomize_bn(model, rng):
    """Nontrivial BN affine AND running stats — a converter that drops
    or swaps them must fail the golden."""
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm3d):
            f = m.num_features
            m.weight.data = torch.from_numpy(
                rng.uniform(0.5, 1.5, f).astype(np.float32))
            m.bias.data = torch.from_numpy(
                rng.normal(0, 0.2, f).astype(np.float32))
            m.running_mean.data = torch.from_numpy(
                rng.normal(0, 0.3, f).astype(np.float32))
            m.running_var.data = torch.from_numpy(
                rng.uniform(0.5, 2.0, f).astype(np.float32))


def test_torch_golden(rng):
    cfg = ResNet3DConfig(**SMALL, dtype="float32")
    ref = TorchI3ResNet(cfg)
    _randomize_bn(ref, rng)
    ref.eval()

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_torch_resnet3d(sd, cfg)
    model = ResNet3D(cfg)

    px = rng.normal(0, 1, (2, 1, 16, 32, 24)).astype(np.float32)
    with torch.inference_mode():
        want = ref(torch.from_numpy(px)).numpy()
    tokens, pooled = jax.jit(model.apply)(params, px)
    np.testing.assert_allclose(np.asarray(tokens), want,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pooled),
                               want.mean(axis=1), rtol=2e-4, atol=2e-4)


def test_torch_golden_prefixed_and_config_from_shapes(rng):
    cfg = ResNet3DConfig(**SMALL, dtype="float32")
    ref = TorchI3ResNet(cfg)
    _randomize_bn(ref, rng)
    ref.eval()
    sd = {"encode_image.i3_resnet." + k: v.numpy()
          for k, v in ref.state_dict().items()}
    # text-tower keys must be ignored, not tripped over
    sd["encode_text.proj.weight"] = np.zeros((4, 4), np.float32)

    derived = resnet3d_config_from_state_dict(sd)
    assert derived.stage_sizes == (1, 2)
    assert derived.base_width == 8
    assert derived.stem_kernel_t == 3
    assert derived.conv2_kernel_t == 3
    assert derived.expansion == 4
    assert derived.num_labels == 0

    derived.dtype = "float32"
    params = convert_torch_resnet3d(sd)
    px = rng.normal(0, 1, (1, 1, 16, 32, 24)).astype(np.float32)
    with torch.inference_mode():
        want = ref(torch.from_numpy(px)).numpy()
    got, _ = jax.jit(ResNet3D(derived).apply)(params, px)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4,
                               atol=2e-4)


def test_partial_checkpoint_rejected(rng):
    cfg = ResNet3DConfig(**SMALL)
    ref = TorchI3ResNet(cfg)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    del sd["layer2.1.bn2.running_mean"]
    with pytest.raises(KeyError, match="layer2.1.bn2"):
        convert_torch_resnet3d(sd, cfg)


class TorchBottleneck2D(tnn.Module):
    def __init__(self, cin, width, stride, expansion):
        super().__init__()
        cout = width * expansion
        self.conv1 = tnn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride=stride,
                                padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(cout))
        self.relu = tnn.ReLU()

    def forward(self, x):
        h = self.relu(self.bn1(self.conv1(x)))
        h = self.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        sc = x if self.downsample is None else self.downsample(x)
        return self.relu(h + sc)


class TorchResNet2D(tnn.Module):
    """torchvision-schema 2D resnet (the inflation source schema)."""

    def __init__(self, stage_sizes, base_width, num_channels, expansion):
        super().__init__()
        self.conv1 = tnn.Conv2d(num_channels, base_width, 7, stride=2,
                                padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(base_width)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        cin = base_width
        for i, n in enumerate(stage_sizes):
            width = base_width * (2 ** i)
            sp = 1 if i == 0 else 2
            blocks = []
            for j in range(n):
                blocks.append(TorchBottleneck2D(
                    cin, width, sp if j == 0 else 1, expansion))
                cin = width * expansion
            setattr(self, f"layer{i + 1}", tnn.Sequential(*blocks))
        self.stages = len(stage_sizes)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for i in range(self.stages):
            x = getattr(self, f"layer{i + 1}")(x)
        return x


def _randomize_bn2d(model, rng):
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            f = m.num_features
            m.weight.data = torch.from_numpy(
                rng.uniform(0.5, 1.5, f).astype(np.float32))
            m.bias.data = torch.from_numpy(
                rng.normal(0, 0.2, f).astype(np.float32))
            m.running_mean.data = torch.from_numpy(
                rng.normal(0, 0.3, f).astype(np.float32))
            m.running_var.data = torch.from_numpy(
                rng.uniform(0.5, 2.0, f).astype(np.float32))


def test_center_inflation_reproduces_2d(rng):
    """The I3D correctness anchor usable without the merlin package:
    center-mode inflation makes every conv act per axis-0 slice, and
    pooling/BN preserve axis-0-constant activations — so on an input
    that repeats one 2D image along axis 0, every token plane must equal
    the 2D network's response exactly."""
    ref2d = TorchResNet2D((1, 2), 8, 1, 4)
    _randomize_bn2d(ref2d, rng)
    ref2d.eval()
    sd2d = {k: v.numpy() for k, v in ref2d.state_dict().items()}

    sd3d = inflate_resnet2d(sd2d, stem_kernel_t=3, conv2_kernel_t=3,
                            mode="center")
    cfg = resnet3d_config_from_state_dict(sd3d)
    cfg.dtype = "float32"
    assert cfg.stem_kernel_t == 3 and cfg.conv2_kernel_t == 3
    params = convert_torch_resnet3d(sd3d, cfg)

    img = rng.normal(0, 1, (1, 1, 32, 24)).astype(np.float32)
    with torch.inference_mode():
        want2d = ref2d(torch.from_numpy(img)).numpy()   # (1, C, h, w)
    t = 12
    vol = np.broadcast_to(img[:, :, None], (1, 1, t) + img.shape[2:])
    tokens, _ = jax.jit(ResNet3D(cfg).apply)(
        params, np.ascontiguousarray(vol))
    c = want2d.shape[1]
    h, w = want2d.shape[2], want2d.shape[3]
    got = np.asarray(tokens).reshape(-1, h, w, c)      # (t', h, w, C)
    want = np.transpose(want2d[0], (1, 2, 0))          # (h, w, C)
    assert got.shape[0] > 1
    for plane in got:
        np.testing.assert_allclose(plane, want, rtol=2e-4, atol=2e-4)


def test_average_inflation_interior_matches_2d(rng):
    """mode="average" (the I3D paper init): on an axis-0-constant input,
    interior axis-0 positions (full receptive field inside the volume)
    match the 2D response; borders are affected by zero padding."""
    ref2d = TorchResNet2D((1,), 8, 1, 4)
    _randomize_bn2d(ref2d, rng)
    ref2d.eval()
    sd2d = {k: v.numpy() for k, v in ref2d.state_dict().items()}
    sd3d = inflate_resnet2d(sd2d, stem_kernel_t=3, conv2_kernel_t=3,
                            mode="average")
    cfg = resnet3d_config_from_state_dict(sd3d)
    cfg.dtype = "float32"
    params = convert_torch_resnet3d(sd3d, cfg)

    img = rng.normal(0, 1, (1, 1, 32, 24)).astype(np.float32)
    with torch.inference_mode():
        want2d = ref2d(torch.from_numpy(img)).numpy()
    t = 16
    vol = np.ascontiguousarray(np.broadcast_to(
        img[:, :, None], (1, 1, t) + img.shape[2:]))
    tokens, _ = jax.jit(ResNet3D(cfg).apply)(params, vol)
    c, h, w = want2d.shape[1:]
    got = np.asarray(tokens).reshape(-1, h, w, c)
    want = np.transpose(want2d[0], (1, 2, 0))
    mid = got.shape[0] // 2
    np.testing.assert_allclose(got[mid], want, rtol=5e-4, atol=5e-4)


def test_classifier_head_and_bad_inputs(rng):
    cfg = ResNet3DConfig(**SMALL, dtype="float32", num_labels=3)
    ref = TorchI3ResNet(cfg)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    sd["fc.weight"] = rng.normal(0, 0.1, (3, cfg.hidden_size)
                                 ).astype(np.float32)
    sd["fc.bias"] = rng.normal(0, 0.1, 3).astype(np.float32)
    params = convert_torch_resnet3d(sd, cfg)
    px = rng.normal(0, 1, (1, 1, 16, 32, 24)).astype(np.float32)
    tokens, pooled, logits = jax.jit(ResNet3D(cfg).apply)(params, px)
    assert logits.shape == (1, 3)
    want = np.asarray(pooled) @ sd["fc.weight"].T + sd["fc.bias"]
    np.testing.assert_allclose(np.asarray(logits), want, rtol=1e-4,
                               atol=1e-4)

    with pytest.raises(ValueError, match="a0, a1, a2"):
        ResNet3D(cfg).apply(params, px[0])

    with pytest.raises(ValueError, match="no inflated-3D resnet"):
        resnet3d_config_from_state_dict({"x.weight":
                                         np.zeros((2, 2), np.float32)})


def test_merlin_encoder_jax_end_to_end(tmp_path, rng):
    """The zoo path: a Merlin-style checkpoint (tower nested under
    encode_image.i3_resnet., extra text-tower keys present) -> jax-backend
    MerlinEncoder -> BaseEncoderRunner over real NIfTIs -> parquet with
    the reference's (tokens, dim) embedding surface
    (run_merlin.py:45-66)."""
    from safetensors.numpy import save_file

    from smb_vision_tpu.data.nifti import save_nifti
    from smb_vision_tpu.inference.encoders import MerlinEncoder
    from smb_vision_tpu.inference.runner import BaseEncoderRunner

    cfg = ResNet3DConfig(**SMALL)
    ref = TorchI3ResNet(cfg)
    _randomize_bn(ref, rng)
    sd = {"encode_image.i3_resnet." + k: v.numpy().copy()
          for k, v in ref.state_dict().items()}
    sd["encode_text.proj.weight"] = np.zeros((4, 4), np.float32)
    ckpt = tmp_path / "merlin.safetensors"
    save_file(sd, str(ckpt))

    items = []
    for i in range(2):
        vol = rng.normal(0, 300, (24, 24, 16)).astype(np.float32)
        p = tmp_path / f"v{i}.nii.gz"
        save_nifti(p, vol)
        items.append({"uid": f"v{i}", "image_path": str(p)})

    enc = MerlinEncoder(checkpoint=str(ckpt), dtype="float32",
                        target_size=(32, 32, 24))
    runner = BaseEncoderRunner(enc, str(tmp_path / "out"), fmt="parquet",
                               batch_size=2, num_workers=2)
    stats = runner.run(items)
    assert stats["embedded"] == 2 and stats["failed"] == 0

    import pandas as pd

    df = pd.read_parquet(tmp_path / "out" / "model_id=merlin"
                         / "v0.parquet")
    shape = tuple(int(s) for s in df["embedding_shape"][0])
    assert shape[-1] == cfg.hidden_size  # (tokens, 2048-analog dim)
    assert len(shape) == 2 and shape[0] >= 1
    emb = np.asarray(df["embedding"][0]).reshape(shape)
    assert np.isfinite(emb).all()


def test_merlin_encoder_backend_gates():
    from smb_vision_tpu.inference.encoders import MerlinEncoder

    with pytest.raises(ValueError, match="backend"):
        MerlinEncoder(backend="tf")
    with pytest.raises(ValueError, match="checkpoint"):
        MerlinEncoder(backend="jax").setup_model()
    with pytest.raises(RuntimeError, match="merlin"):
        MerlinEncoder(backend="torch").setup_model()

def test_export_torch_roundtrip(rng):
    """export_torch_resnet3d output must be consumable BY torch (the
    torchvision-schema module loads it strict=True) and round-trip
    through convert_torch_resnet3d bit-exactly."""
    cfg = ResNet3DConfig(**SMALL, dtype="float32", num_labels=3)
    model = ResNet3D(cfg)
    params = jax.jit(model.init)(
        jax.random.key(0), np.zeros((1, 1, 16, 32, 24), np.float32))

    from smb_vision_tpu.models.convert import export_torch_resnet3d

    sd = export_torch_resnet3d(params, cfg)

    ref = TorchI3ResNet(cfg)
    ref.fc = tnn.Linear(cfg.hidden_size, 3)
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd.items()}, strict=False)
    assert not unexpected
    # only torch BN bookkeeping (num_batches_tracked) may be absent
    assert all("num_batches_tracked" in k for k in missing)
    ref.eval()

    px = rng.normal(0, 1, (1, 1, 16, 32, 24)).astype(np.float32)
    with torch.inference_mode():
        want_tokens = ref(torch.from_numpy(px)).numpy()
        want_logits = (ref.fc(torch.from_numpy(want_tokens).mean(1))
                       .numpy())
    tokens, _, logits = jax.jit(model.apply)(params, px)
    np.testing.assert_allclose(np.asarray(tokens), want_tokens,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits), want_logits,
                               rtol=2e-4, atol=2e-4)

    back = convert_torch_resnet3d(sd, cfg)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = {jax.tree_util.keystr(k): v for k, v
              in jax.tree_util.tree_leaves_with_path(back)}
    assert len(flat_a) == len(flat_b)
    for k, v in flat_a:
        np.testing.assert_array_equal(np.asarray(v),
                                      flat_b[jax.tree_util.keystr(k)])

def test_run_encoders_merlin_cli(tmp_path, rng):
    """Full zoo CLI path (reference run_merlin.py:50-66 main loop):
    manifest -> jax I3D tower -> parquet per uid; resume skips processed
    uids; --checkpoint is required for the jax backend."""
    import json

    from safetensors.numpy import save_file

    from smb_vision_tpu.cli.run_encoders import main
    from smb_vision_tpu.data.nifti import save_nifti

    cfg = ResNet3DConfig(**SMALL)
    ref = TorchI3ResNet(cfg)
    _randomize_bn(ref, rng)
    sd = {"encode_image.i3_resnet." + k: v.numpy().copy()
          for k, v in ref.state_dict().items()}
    ckpt = tmp_path / "merlin.safetensors"
    save_file(sd, str(ckpt))

    items = []
    for uid in ("ct-1", "ct-2", "ct-3"):
        vol = rng.normal(0, 300, (20, 20, 12)).astype(np.float32)
        p = tmp_path / f"{uid}.nii.gz"
        save_nifti(p, vol)
        items.append({"uid": uid, "image_path": str(p)})
    manifest = tmp_path / "manifest.json"
    manifest.write_text(json.dumps({"images": items}))

    out = tmp_path / "emb"
    argv = ["--encoder", "merlin", "--checkpoint", str(ckpt),
            "--input_json", str(manifest), "--output_dir", str(out),
            "--batch_size", "2", "--merlin_backend", "jax",
            "--target_size", "32,32,24"]
    main(argv)
    part = out / "model_id=merlin"
    files = sorted(f.name for f in part.glob("*.parquet"))
    assert files == ["ct-1.parquet", "ct-2.parquet", "ct-3.parquet"]

    # resume: a second run must skip all three
    mtimes = {f: (part / f).stat().st_mtime_ns for f in files}
    main(argv)
    assert {f: (part / f).stat().st_mtime_ns for f in files} == mtimes

    with pytest.raises(SystemExit, match="checkpoint"):
        main(["--encoder", "merlin", "--merlin_backend", "jax",
              "--input_json", str(manifest)])
    with pytest.raises(SystemExit, match="target_size"):
        main(argv[:-1] + ["32,32"])
    with pytest.raises(SystemExit, match="target_size"):
        main(argv[:-1] + ["32,32,x"])

def test_frozen_bn_gets_no_gradients_and_no_decay(rng):
    """FrozenBatchNorm must be frozen under fine-tuning: zero gradients
    into scale/bias/mean/var (stop_gradient) AND excluded from weight
    decay (train/optim.py '/bn/' rule) — otherwise AdamW would silently
    drift the checkpoint's running statistics toward 0."""
    import jax.numpy as jnp

    from smb_vision_tpu.train.optim import decay_mask

    cfg = ResNet3DConfig(**SMALL, dtype="float32", num_labels=2)
    model = ResNet3D(cfg)
    px = rng.normal(0, 1, (1, 1, 16, 32, 24)).astype(np.float32)
    params = jax.jit(model.init)(jax.random.key(0), px)

    def loss(p):
        _, _, logits = model.apply(p, px)
        return jnp.sum(logits ** 2)

    grads = jax.grad(loss)(params)
    flat = {jax.tree_util.keystr(k): np.asarray(v) for k, v
            in jax.tree_util.tree_leaves_with_path(grads)}
    bn_keys = [k for k in flat if "'bn'" in k or "bn']" in k]
    conv_keys = [k for k in flat if "conv" in k]
    assert bn_keys and conv_keys
    for k in bn_keys:
        assert not flat[k].any(), f"gradient leaked into frozen BN: {k}"
    assert any(flat[k].any() for k in conv_keys)

    mask = decay_mask(params)
    mflat = {jax.tree_util.keystr(k): v for k, v
             in jax.tree_util.tree_leaves_with_path(mask)}
    for k, v in mflat.items():
        if "'bn'" in k or "bn']" in k:
            assert v is False or v == False, f"BN param decayed: {k}"  # noqa: E712
