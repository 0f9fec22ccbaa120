"""Multi-host (multi-process) entry: jax.distributed wiring.

The reference is strictly single-process/single-GPU (SURVEY §2.3 — no
torch.distributed anywhere); multi-host execution is north-star scope.
TPU-native design: one process per host, ``jax.distributed.initialize``
connects them to a coordination service, the device mesh spans all
processes, and GSPMD collectives ride ICI within a slice / DCN across
hosts.  Nothing else in the framework changes — the sharded step built by
the driver's step builder is already
expressed over a Mesh; this module supplies process bring-up, global-array
construction from per-host shards, and process-0-only checkpointing.

Works identically on multi-process CPU (gloo collectives) for testing:
see tests/test_multihost.py, which runs 2 coordinated processes on
localhost.
"""
from __future__ import annotations

import os

import numpy as np

__all__ = [
    "init_distributed", "global_mesh", "host_local_to_global",
    "replicate_global", "process_index", "process_count", "is_coordinator",
    "save_checkpoint_multihost", "sync",
]


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     local_device_count: int | None = None,
                     platform: str | None = None):
    """Initialize the distributed runtime (idempotent).

    Arguments default to the standard JAX env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID); on
    managed TPU pods all of this is auto-detected and ``init_distributed()``
    with no arguments is correct.  ``local_device_count`` forces that many
    virtual CPU devices per process (testing); ``platform`` forces a
    backend before initialization (this environment's sitecustomize
    overrides JAX_PLATFORMS, so tests pass platform='cpu' explicitly).
    """
    if local_device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags +
                f" --xla_force_host_platform_device_count={local_device_count}"
            ).strip()

    import jax

    if platform is not None:
        jax.config.update("jax_platforms", platform)

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    already = getattr(jax.distributed.initialize, "_ls_done", False)
    if not already and (coordinator_address or num_processes):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        jax.distributed.initialize._ls_done = True
    return jax


def process_index() -> int:
    import jax
    return jax.process_index()


def process_count() -> int:
    import jax
    return jax.process_count()


def is_coordinator() -> bool:
    return process_index() == 0


def global_mesh(sp: int = 1):
    """('dp', 'sp') mesh over ALL devices of ALL processes.

    Device order follows ``jax.devices()`` (grouped by process), so with
    sp ≤ local device count the 'sp' axis stays within a host and its halo
    exchanges ride intra-host links; 'dp' spans hosts over DCN.
    """
    import jax
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices())
    n = devices.size
    assert n % sp == 0, (n, sp)
    return Mesh(devices.reshape(n // sp, sp), axis_names=("dp", "sp"))


def host_local_to_global(mesh, spec, local_array):
    """Assemble a global sharded array from this process's LOCAL shard.

    ``local_array`` holds this process's slice of the global array along
    the 'dp'-sharded axis (e.g. this host's cameras' reference images);
    the result is a global jax.Array distributed over the mesh.
    """
    import jax
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_array))


def replicate_global(mesh, tree):
    """Replicate a host-identical pytree across every device of the mesh.

    All processes must pass identical values (params, optimizer state)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.make_array_from_callback(
            np.shape(x), sharding,
            lambda idx, x=x: np.asarray(x)[idx]),
        tree)


def sync(name: str = "ls_sync"):
    """Barrier across all processes."""
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def save_checkpoint_multihost(path, **kwargs):
    """Checkpoint from a multi-process run: process 0 writes, all sync.

    State that is replicated (theta, optimizer moments) is identical on
    every process, so a single writer suffices; sharded arrays must be
    gathered by the caller first (the driver checkpoints only replicated
    state, matching the single-process format for seamless resume at any
    process count)."""
    from ..driver.checkpoint import save_checkpoint

    if is_coordinator():
        save_checkpoint(path, **kwargs)
    sync("ls_checkpoint")
    return path
