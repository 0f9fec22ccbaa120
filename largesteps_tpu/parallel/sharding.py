"""SPMD sharding over TPU device meshes.

The reference is strictly single-GPU (SURVEY §2.3 — hardcoded 'cuda', no
torch.distributed anywhere); the distributed design here is new scope
mandated by the north star:

  * **dp** axis — viewpoint (camera-batch) data parallelism: every
    per-camera array (MVPs, backgrounds, reference images, rasterizer
    output) is sharded on its leading camera dim; the image loss is a mean
    over all pixels ⇒ XLA inserts the cross-device psum, and vertex/
    parameter gradients (replicated params) are all-reduced over ICI
    automatically, overlapped with the backward by the XLA scheduler.
  * **sp** axis — image-row (tile) parallelism: the H dimension of every
    image tensor is sharded; the antialias pass reads one-row halos via its
    shifted adds, which GSPMD lowers to neighbor collective-permutes.
  * Mesh topology: lay 'dp' on the outer (slower) axis and 'sp' inner so
    halo exchange rides nearest-neighbor ICI links.

Vertices, faces and solver state stay replicated at this scale (a 100k-vert
mesh is ~1.2 MB — far below HBM pressure); triangle sharding enters with
the Pallas rasterizer's binning stage.

All entry points also run on a CPU mesh created with
``--xla_force_host_platform_device_count`` for testing (see
tests/test_sharding.py and __graft_entry__.dryrun_multichip).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_renderer", "camera_sharding"]


def make_mesh(n_devices=None, sp: int = 1, devices=None) -> Mesh:
    """Create a ('dp', 'sp') mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    assert n_devices % sp == 0, (n_devices, sp)
    grid = devices.reshape(n_devices // sp, sp)
    return Mesh(grid, axis_names=("dp", "sp"))


def camera_sharding(mesh: Mesh, ndim: int, cam_axis: int = 0,
                    row_axis: int | None = None) -> NamedSharding:
    """NamedSharding putting 'dp' on the camera axis and (optionally) 'sp'
    on the image-row axis."""
    spec = [None] * ndim
    spec[cam_axis] = "dp"
    if row_axis is not None:
        spec[row_axis] = "sp"
    return NamedSharding(mesh, P(*spec))


def shard_renderer(renderer, mesh: Mesh, shard_rows: bool = True):
    """Re-place a Renderer's per-camera constants onto the mesh in place
    and attach the mesh so ``render`` runs SPMD.

    Backend-dependent layout (decided + documented per SURVEY §2.3):
      * ``xla`` backend: pure-GSPMD — mvps (C,4,4) → P('dp'), bgs
        (C,H,W,4) → P('dp','sp') with image rows on 'sp'; the antialias
        shifts become neighbor collective-permutes automatically.
      * ``pallas`` backend with ``shard_rows`` and row-divisible tiles:
        cameras on 'dp', image TILE ROWS on 'sp' — the fused kernels run
        under ``shard_map`` on each device's (TY/sp)-row slice and the
        antialias pass ppermutes one-row halos across 'sp'
        (pallas_core._shift_up_halo).
      * ``pallas`` fallback (too few tile rows to split): the CAMERA axis
        shards over BOTH mesh axes (P(('dp','sp'))) — loss-free but capped
        at n_cameras devices.
    """
    from .. render.pallas_core import TILE_H

    n_cam = renderer.mvps.shape[0]
    pallas = renderer.backend == "pallas"
    sp = mesh.shape["sp"]
    ty_full = renderer.res[0] // TILE_H
    row_shard = (pallas and shard_rows and sp > 1 and ty_full % sp == 0
                 and ty_full >= sp)
    if pallas and not row_shard:
        need = mesh.shape["dp"] * sp
        cam_axes = ("dp", "sp")
    else:
        need = mesh.shape["dp"]
        cam_axes = "dp"
    if n_cam % need != 0:
        raise ValueError(f"cameras ({n_cam}) must divide {need}")
    renderer.mvps = jax.device_put(
        renderer.mvps, NamedSharding(mesh, P(cam_axes, None, None)))
    if pallas and not row_shard:
        bg_spec = P(cam_axes, None, None, None)
    else:
        bg_spec = P("dp", "sp" if (shard_rows and sp > 1) else None,
                    None, None)
    renderer.bgs = jax.device_put(renderer.bgs, NamedSharding(mesh, bg_spec))
    renderer.mesh = mesh
    renderer.cam_axes = cam_axes
    renderer.row_shards = sp if row_shard else 1
    return renderer


# NOTE: the former build_sharded_step helper (a second, test-only step
# builder) was removed in round 4 — the driver's _make_step is the single
# step-construction path, and tests/test_sharding.py exercises sharding
# through driver.optimize_shape(params={"sharding": ...}) directly.
