"""Multi-host bring-up (parallel/mesh.py::maybe_initialize_distributed)."""

import os
from unittest import mock

import jax

from smb_vision_tpu.parallel.mesh import maybe_initialize_distributed

_VARS = ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
         "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES")


def _clean_env():
    return {k: v for k, v in os.environ.items() if k not in _VARS}


def test_auto_detect_negative():
    """Auto is a no-op in a clean env AND with a single-entry worker list
    (the dev relay exports TPU_WORKER_HOSTNAMES=localhost)."""
    with mock.patch.dict(os.environ, _clean_env(), clear=True):
        assert maybe_initialize_distributed(None) is False
        os.environ["TPU_WORKER_HOSTNAMES"] = "localhost"
        assert maybe_initialize_distributed(None) is False
    assert maybe_initialize_distributed(False) is False


def test_auto_detect_positive_and_forced():
    called = {"n": 0}

    def fake_init(*a, **k):
        called["n"] += 1

    with mock.patch.object(jax.distributed, "initialize", fake_init):
        assert maybe_initialize_distributed(True) is False  # 1 process
        assert called["n"] == 1
        with mock.patch.dict(os.environ, _clean_env(), clear=True):
            os.environ["TPU_WORKER_HOSTNAMES"] = "host-0,host-1"
            maybe_initialize_distributed(None)
            assert called["n"] == 2
            os.environ.pop("TPU_WORKER_HOSTNAMES")
            os.environ["JAX_COORDINATOR_ADDRESS"] = "host:1234"
            maybe_initialize_distributed(None)
            assert called["n"] == 3


def test_auto_degrades_when_no_coordinator():
    """Guessed multi-host without a resolvable coordinator must not kill
    the run; forcing --multihost true must surface the error."""

    def fail_init(*a, **k):
        raise ValueError("coordinator_address should be defined.")

    with mock.patch.object(jax.distributed, "initialize", fail_init):
        with mock.patch.dict(os.environ, _clean_env(), clear=True):
            os.environ["TPU_WORKER_HOSTNAMES"] = "host-0,host-1"
            assert maybe_initialize_distributed(None) is False
        try:
            maybe_initialize_distributed(True)
        except ValueError:
            pass
        else:  # pragma: no cover
            raise AssertionError("forced init should propagate the error")


def test_double_init_is_noop():
    """jax 0.9 raises 'distributed.initialize should only be called once.'
    on a second init — the guard must swallow it (the promised 'safe to
    call twice' contract), not kill the run."""

    def second_init(*a, **k):
        raise RuntimeError("distributed.initialize should only be called "
                           "once.")

    with mock.patch.object(jax.distributed, "initialize", second_init):
        assert maybe_initialize_distributed(True) is False  # 1 process

    def other_error(*a, **k):
        raise RuntimeError("something actually broke")

    with mock.patch.object(jax.distributed, "initialize", other_error):
        try:
            maybe_initialize_distributed(True)
            raise AssertionError("unrelated RuntimeError swallowed")
        except RuntimeError as e:
            assert "actually broke" in str(e)


def test_local_batch_slice_is_per_process():
    """Per-PROCESS share: on a single-process 8-device mesh the whole
    global batch stays on this host (per-device slicing is GSPMD's job)."""
    import pytest

    from smb_vision_tpu.parallel.mesh import create_mesh, local_batch_slice

    mesh = create_mesh()
    assert local_batch_slice(16, mesh) == 16
    with pytest.raises(ValueError, match="divide"):
        # single process: any batch divides by 1 — fake a 3-process world
        class FakeDev:
            def __init__(self, p):
                self.process_index = p

        import numpy as np

        from jax.sharding import Mesh
        fake = mock.MagicMock()
        fake.devices.flat = [FakeDev(0), FakeDev(1), FakeDev(2)]
        local_batch_slice(16, fake)
