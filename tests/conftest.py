"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding correctness is
validated on ``xla_force_host_platform_device_count=8`` CPU devices
(single-device vs sharded allclose), mirroring the driver's separate
multi-chip dry-run.

NOTE: this environment registers an `axon` TPU plugin via sitecustomize and
forces ``jax_platforms=axon,cpu`` *after* env vars are read, so plain
``JAX_PLATFORMS=cpu`` is ineffective — we must override through
``jax.config`` before any backend initializes.  Running tests on the axon
tunnel is ~20× slower per compile and serializes across processes.
"""
import os

# Persistent compilation cache: the 2-vCPU CI box pays seconds per XLA
# compile; cache across runs keeps the suite fast.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# LS_TEST_TPU=1 keeps the real TPU backend so @pytest.mark.tpu tests can
# check COMPILED (non-interpret) Pallas kernels against the oracle on
# hardware; default runs everything on the virtual CPU mesh.
RUN_TPU = os.environ.get("LS_TEST_TPU") == "1"
if not RUN_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: needs the real TPU chip (run with LS_TEST_TPU=1)")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if "tpu" in item.keywords and not RUN_TPU:
            item.add_marker(pytest.mark.skip(
                reason="compiled-kernel parity needs LS_TEST_TPU=1"))
        elif "tpu" not in item.keywords and RUN_TPU:
            # TPU session runs ONLY the hardware-parity suite: everything
            # else assumes the CPU mesh (and would serialize on the tunnel)
            item.add_marker(pytest.mark.skip(reason="CPU-mesh test"))


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
