"""Test harness: force an 8-device CPU mesh so sharding logic is exercised
without TPU hardware (the reference had no distributed tests at all;
cf. /root/reference SURVEY §4)."""

import os

# The test suite runs on a virtual 8-device CPU mesh. The session
# environment pins JAX_PLATFORMS to the TPU backend and a sitecustomize hook
# imports jax at interpreter start, so env vars alone are too late — use
# jax.config updates (effective until the first backend is initialised).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_threefry_partitionable", True)
# XLA:CPU's DEFAULT matmul precision is bf16-like; use exact f32 in tests so
# numeric comparisons are meaningful.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The native CT loader (.so) is gitignored — build it on demand so a fresh
# checkout runs the native tests instead of silently skipping them.
_so = os.path.join(os.path.dirname(__file__), "..", "smb_vision_tpu",
                   "data", "_native", "libctloader.so")
if not os.path.exists(_so):
    try:
        import subprocess
        import sys as _sys

        subprocess.run(
            [_sys.executable,
             os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "build_native.py")],
            check=True, capture_output=True, timeout=120)
    except Exception:  # noqa: BLE001 — tests then skip via native_available
        pass


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]
