"""Online embedding server (cli/serve.py): health, single/multi-volume
embed, pooling modes, padding/chunking to the compiled batch size, and
error paths — all through real HTTP against a live ThreadingHTTPServer."""

import http.client
import json
import threading

import numpy as np
import pytest

from smb_vision_tpu.data.nifti import save_nifti


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(3):
        vol = rng.normal(0, 300, (32, 32, 32)).astype(np.int16)
        p = root / f"case_{i}.nii.gz"
        save_nifti(p, vol, np.diag([1.5, 1.5, 3.0, 1.0]))
        paths.append(str(p))

    cfg = {"image_size": 32, "num_frames": 32, "patch_size": 16,
           "tubelet_size": 16, "num_channels": 1, "hidden_size": 32,
           "num_hidden_layers": 1, "num_attention_heads": 2,
           "intermediate_size": 64}
    cfg_path = root / "config.json"
    cfg_path.write_text(json.dumps(cfg))

    from smb_vision_tpu.cli.serve import ServeArguments, make_server

    args = ServeArguments(host="127.0.0.1", port=0,
                          config_path=str(cfg_path), dtype="float32",
                          attn_impl="xla", batch_size=2,
                          cache_data_dir=str(root / "cache"))
    srv = make_server(args)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, paths
    srv.shutdown()


def _request(srv, method, path, body=None):
    host, port = srv.server_address[:2]
    conn = http.client.HTTPConnection(host, port, timeout=120)
    conn.request(method, path,
                 body=json.dumps(body) if body is not None else None)
    resp = conn.getresponse()
    out = json.loads(resp.read())
    conn.close()
    return resp.status, out


def test_healthz(server):
    srv, _ = server
    status, out = _request(srv, "GET", "/healthz")
    assert status == 200
    assert out["status"] == "ok"
    assert out["grid"] == [2, 2, 2] and out["hidden_size"] == 32


def test_embed_single_matches_direct(server):
    srv, paths = server
    status, out = _request(srv, "POST", "/embed", {"image": paths[0]})
    assert status == 200
    assert out["shape"] == [1, 32]          # mean-pooled (N, D)

    # direct path through the same resident encoder
    svc = srv.service
    px, _, _ = svc._preprocess([paths[0], paths[0]])  # compiled batch is 2
    direct = svc.encoder.generate_embedding(px)[0].mean(axis=0)
    np.testing.assert_allclose(np.asarray(out["embeddings"][0]), direct,
                               rtol=2e-5, atol=2e-5)


def test_embed_batch_pads_and_chunks(server):
    """3 volumes through a compiled batch of 2: chunk [2] + padded [1]."""
    srv, paths = server
    status, out = _request(srv, "POST", "/embed", {"images": paths})
    assert status == 200
    assert out["shape"] == [3, 32]
    emb = np.asarray(out["embeddings"])
    # volumes differ -> embeddings differ (padding didn't leak between rows)
    assert np.abs(emb[0] - emb[1]).max() > 1e-6
    # per-volume result identical to a single-volume request
    _, one = _request(srv, "POST", "/embed", {"image": paths[2]})
    np.testing.assert_allclose(emb[2], np.asarray(one["embeddings"][0]),
                               rtol=2e-5, atol=2e-5)


def test_embed_pool_none_returns_tokens(server):
    srv, paths = server
    status, out = _request(srv, "POST", "/embed",
                           {"image": paths[0], "pool": "none"})
    assert status == 200
    assert out["shape"] == [1, 8, 32]       # (N, tokens, D)


def test_embed_raw_nifti_bytes(server):
    """POST raw NIfTI bytes (octet-stream): same embedding as the path
    route, no shared filesystem needed."""
    srv, paths = server
    host, port = srv.server_address[:2]
    body = open(paths[0], "rb").read()
    conn = http.client.HTTPConnection(host, port, timeout=120)
    conn.request("POST", "/embed", body=body,
                 headers={"Content-Type": "application/octet-stream"})
    resp = conn.getresponse()
    raw = json.loads(resp.read())
    conn.close()
    assert resp.status == 200 and raw["shape"] == [1, 32]
    _, by_path = _request(srv, "POST", "/embed", {"image": paths[0]})
    np.testing.assert_allclose(np.asarray(raw["embeddings"]),
                               np.asarray(by_path["embeddings"]),
                               rtol=2e-5, atol=2e-5)


def test_embed_uint8_input_dtype(server, tmp_path):
    """--input_dtype uint8 ships one byte per voxel (on-device affine
    decode); embeddings must track the f32-shipped server closely."""
    srv, paths = server
    from smb_vision_tpu.cli.serve import ServeArguments, make_server

    args = ServeArguments(
        host="127.0.0.1", port=0,
        config_path=srv.service.args.config_path, dtype="float32",
        attn_impl="xla", batch_size=2, input_dtype="uint8",
        cache_data_dir=str(tmp_path / "cache_u8"))
    srv8 = make_server(args)
    t = threading.Thread(target=srv8.serve_forever, daemon=True)
    t.start()
    try:
        status, health = _request(srv8, "GET", "/healthz")
        assert status == 200 and health["input_dtype"] == "uint8"
        status, out8 = _request(srv8, "POST", "/embed", {"images": paths})
        assert status == 200 and out8["shape"] == [3, 32]
        _, outf = _request(srv, "POST", "/embed", {"images": paths})
        a, b = np.asarray(out8["embeddings"]), np.asarray(outf["embeddings"])
        # uint8 decode error is (max-min)/510 per voxel; pooled embeddings
        # of a tiny random model stay within a few percent
        assert np.abs(a - b).max() / np.abs(b).max() < 0.05
    finally:
        srv8.shutdown()


def test_embed_errors(server):
    srv, paths = server
    status, out = _request(srv, "POST", "/embed", {})
    assert status == 400 and "image" in out["error"]
    status, out = _request(srv, "POST", "/embed",
                           {"image": paths[0], "pool": "max"})
    assert status == 400 and "pool" in out["error"]
    status, out = _request(srv, "POST", "/embed",
                           {"image": "/nonexistent.nii.gz"})
    assert status in (400, 404) and "nonexistent" in out["error"]
    status, _ = _request(srv, "GET", "/nope")
    assert status == 404


def test_embed_malformed_bodies(server):
    """Client mistakes must be 400s, not 500s: non-object JSON bodies; a
    bare string under 'images' is accepted as a single path."""
    srv, paths = server
    status, out = _request(srv, "POST", "/embed", [{"image": paths[0]}])
    assert status == 400 and "JSON object" in out["error"]
    status, out = _request(srv, "POST", "/embed", "just a string")
    assert status == 400
    status, out = _request(srv, "POST", "/embed", {"images": 17})
    assert status == 400
    status, out = _request(srv, "POST", "/embed", {"images": [1, 2]})
    assert status == 400
    status, out = _request(srv, "POST", "/embed", {"images": paths[0]})
    assert status == 200 and out["shape"][0] == 1


def test_embed_concurrent_overlapping_requests(server):
    """Round-4 adversarial review (VERDICT #9): overlapping requests —
    mixed single/multi-volume embeds (which pad+chunk and interleave
    their per-chunk device dispatches) plus health polls from 12 threads
    at once. Every response must be 200, every embedding must equal the
    serial answer for the same volume (the dispatch lock may interleave
    chunks of different requests but never mix their data), and the
    request counter must account every volume exactly once."""
    import concurrent.futures

    srv, paths = server
    base = _request(srv, "POST", "/embed", {"image": paths[0]})[1]
    base1 = _request(srv, "POST", "/embed", {"image": paths[1]})[1]
    served0 = _request(srv, "GET", "/healthz")[1]["requests_served"]

    jobs = []
    for i in range(12):
        if i % 3 == 0:
            jobs.append(("POST", "/embed", {"images": [paths[1], paths[0],
                                                       paths[2]]}))
        elif i % 3 == 1:
            jobs.append(("POST", "/embed", {"image": paths[i % 2]}))
        else:
            jobs.append(("GET", "/healthz", None))

    with concurrent.futures.ThreadPoolExecutor(max_workers=12) as ex:
        results = list(ex.map(lambda j: _request(srv, *j), jobs))

    n_vols = 0
    for (method, path, body), (status, out) in zip(jobs, results):
        assert status == 200, (path, out)
        if path == "/healthz":
            assert out["status"] == "ok"
            continue
        n_vols += len(out["embeddings"])
        if body.get("image") == paths[0] or (
                body.get("images") and body["images"][1] == paths[0]):
            idx = 0 if "image" in body else 1
            got = out["embeddings"][idx] if "images" in body \
                else out["embeddings"][0]
            np.testing.assert_allclose(got, base["embeddings"][0],
                                       rtol=1e-5, atol=1e-6)
        if body.get("image") == paths[1]:
            np.testing.assert_allclose(out["embeddings"][0],
                                       base1["embeddings"][0],
                                       rtol=1e-5, atol=1e-6)
    served1 = _request(srv, "GET", "/healthz")[1]["requests_served"]
    assert served1 - served0 == n_vols


def test_serve_merlin_encoder(tmp_path):
    """--encoder merlin serves the first-party I3D tower: healthz reports
    the tower, /embed returns (tokens-pooled) vectors matching a direct
    forward, uint8 shipping is rejected with a clear error."""
    import torch
    import torch.nn as tnn

    from smb_vision_tpu.cli.serve import ServeArguments, make_server
    from tests.test_resnet3d import SMALL, TorchI3ResNet, _randomize_bn
    from smb_vision_tpu.models.configs import ResNet3DConfig

    rng = np.random.default_rng(3)
    cfg = ResNet3DConfig(**SMALL)
    ref = TorchI3ResNet(cfg)
    _randomize_bn(ref, rng)
    sd = {"encode_image.i3_resnet." + k: v for k, v
          in ref.state_dict().items()}
    ckpt = tmp_path / "merlin.pt"
    torch.save(sd, str(ckpt))

    paths = []
    for i in range(2):
        vol = rng.normal(0, 300, (24, 24, 16)).astype(np.float32)
        p = tmp_path / f"v{i}.nii.gz"
        save_nifti(p, vol)
        paths.append(str(p))

    args = ServeArguments(host="127.0.0.1", port=0, encoder="merlin",
                          model_name_or_path=str(ckpt), dtype="float32",
                          batch_size=2, target_size="32,32,24")
    srv = make_server(args)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        status, out = _request(srv, "GET", "/healthz")
        assert status == 200
        assert out["encoder"] == "merlin"
        assert out["hidden_size"] == 8 * 2 * 4     # base 8, 2 stages, exp 4
        assert out["pixel_shape"] == [1, 32, 32, 24]

        status, out = _request(srv, "POST", "/embed", {"images": paths})
        assert status == 200
        n, d = out["shape"]
        assert (n, d) == (2, 64)

        svc = srv.service
        px, _, _ = svc._preprocess(paths)
        direct = svc.encoder.generate_embedding(px).mean(axis=1)
        np.testing.assert_allclose(np.asarray(out["embeddings"]), direct,
                                   rtol=2e-5, atol=2e-5)
    finally:
        srv.shutdown()

    # uint8 affine shipping works on the merlin path too (on-device
    # dequant, same contract as the ViT encoder)
    srv8 = make_server(ServeArguments(
        host="127.0.0.1", port=0, encoder="merlin",
        model_name_or_path=str(ckpt), dtype="float32", batch_size=2,
        target_size="32,32,24", input_dtype="uint8"))
    t8 = threading.Thread(target=srv8.serve_forever, daemon=True)
    t8.start()
    try:
        status, out8 = _request(srv8, "POST", "/embed", {"images": paths})
        assert status == 200
        # uint8 affine coding: max abs pixel err (max-min)/510 -> loose
        np.testing.assert_allclose(np.asarray(out8["embeddings"]),
                                   direct, rtol=0.05, atol=0.05)
    finally:
        srv8.shutdown()

    with pytest.raises(ValueError, match="model_name_or_path"):
        make_server(ServeArguments(encoder="merlin", port=0))
    with pytest.raises(ValueError, match="unknown encoder"):
        make_server(ServeArguments(encoder="clip", port=0))
