"""The optimization driver — TPU equivalent of scripts/main.py::optimize_shape.

Reference semantics (scripts/main.py:18-218): load scene → render reference
images → (optionally) parameterize v→u with M = I+λL → AdamUniform loop
[from_differential → normals → render → image loss (+ laplacian/bilaplacian
reg) → backward → step], with a remeshing schedule that rebuilds the system
matrix, resets the optimizer and decays the step size by 0.8× per event, and
either a step budget or a wall-clock budget.

TPU design:
  * one **jitted step function** per topology epoch (remesh events are
    recompile boundaries — rare by construction, SURVEY §7);
  * optimizer state is functional (optax-style), not mutable;
  * per-iteration history recording is OPTIONAL and device-side — the
    reference's per-iteration ``.cpu()`` sync (main.py:200-202) is a perf
    bug we do not replicate.  Loss history is accumulated on device and
    fetched at the end (or at remesh boundaries);
  * CG warm starts are threaded explicitly: the previous vertex solution
    warm-starts the forward solve and the previous u-gradient warm-starts
    the backward solve (the functional replacement for
    largesteps/solvers.py:102-124 mutable guesses).
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable

import numpy as np
import jax
import jax.numpy as jnp

from ..core.geometry import compute_matrix, laplacian_uniform
from ..core.parameterize import to_differential, get_solver
from ..core.solvers import solve as diff_solve
from ..core.sparse import coo_matvec
from ..core.optimize import adam_uniform, adam
from ..ops.mesh import remove_duplicates, average_edge_length
from ..ops.normals import compute_face_normals, compute_vertex_normals
from ..render.renderer import Renderer, Topology
from ..io.xml_scene import load_scene

__all__ = ["optimize_shape", "default_params", "EpochState"]


def default_params():
    """Defaults mirroring scripts/main.py:30-44."""
    return {
        "time": -1,            # optimization time (minutes); overrides steps
        "steps": 100,
        "step_size": 0.01,
        "boost": 1,            # antialias position-gradient boost
        "smooth": True,        # our parameterization vs plain coordinates
        "shading": True,       # shaded vs silhouette rendering
        "reg": 0.0,
        "solver": "Cholesky",
        "lambda": 1.0,
        "alpha": None,
        "remesh": -1,          # iteration(s) at which to remesh
        "optimizer": "AdamUniform",
        "use_tr": True,        # optimize a global translation too
        "loss": "l2",
        "bilaplacian": True,
        "record_verts": False, # per-iter vertex history (heavy; ref always on)
        "sharding": None,      # None | {"dp": n, "sp": m} — SPMD device mesh
        "raster_chunk": 128,
        # large-F binning: above this face count the pallas pipeline uses
        # HOST-computed triangle bins (margin-expanded bboxes), recomputed
        # every rebin_every steps — the traced per-step binning is
        # O(T·F log F) and measured 22 s/step at 327k faces on chip
        "host_bin_faces": 32768,
        "host_bin_cap": None,  # minimum bin capacity for the host-binned
                               # path (None = size from occupancy); >1024
                               # forces the camera-sequential big pipeline
        "rebin_every": 16,     # max steps between re-binning passes
        "rebin_margin": 4.0,   # bbox expansion (px) that keeps stale bins valid
        "rebin_auto": True,    # rebin when the measured screen displacement
                               # since bin time exceeds margin/2 (device
                               # scalar polled lazily; enforces the
                               # margin-staleness contract instead of hoping)
        "cull_backfaces": False,  # drop screen-space back-facing triangles
                               # from the host/device bins (valid for closed
                               # meshes; halves bin occupancy)
        "checkpoint_every": 0, # iterations between checkpoints (0 = off)
        "checkpoint_path": None,
        "resume": None,        # path of a checkpoint to resume from
        "nan_check_every": 25, # steps between non-finite-loss divergence
                               # checks (host fetch; 0 disables)
        "max_inflight": 8,     # host-bins path: max dispatched-not-executed
                               # steps.  Unbounded async dispatch runs the
                               # Python loop arbitrarily far ahead, so the
                               # displacement-triggered rebins lag and the
                               # stale-bin window silently under-draws
                               # (measured 7× worse loss at suzanne scale);
                               # a small bound keeps the device busy AND the
                               # rebin trigger responsive
    }


def _make_optimizer(name_or_tx, lr):
    if callable(name_or_tx):
        return name_or_tx(lr)
    if name_or_tx == "AdamUniform":
        return adam_uniform(lr)
    if name_or_tx == "Adam":
        return adam(lr)
    raise ValueError(f"unknown optimizer {name_or_tx!r}")


@dataclass
class EpochState:
    """Everything tied to one topology epoch (rebuilt at each remesh)."""
    v_unique: np.ndarray
    f_unique: np.ndarray
    duplicate_idx: np.ndarray
    f_src: np.ndarray
    topology: Topology
    M: Any = None
    L: Any = None
    u: Any = None
    solver: Any = None
    step_fn: Callable = None
    use_host_bins: bool = False
    bins: Any = None           # ((C,T,cap) int32, (C,T) int32) device arrays
    bin_cap: int = 0
    last_sxy: Any = None       # (C,V,2) px positions at the last rebin
    max_window_disp: float = 0.0
    sxy_dev: Any = None        # (C,V,2) device px positions at bin time
    dup_dev: Any = None        # duplicate_idx on device
    faces_dev: Any = None      # topology faces on device (for device rebin)
    device_rebin_ok: bool = False  # spans fit the static device-bin bound
    pending_occ: Any = None    # device occupancy scalar of the last rebin
    rebin_fn: Any = None       # cached jitted device-rebin function
    rebin_fn_cap: int = -1


def _host_bins(renderer, v, topology, margin, cap=None, cull=False,
               return_spans=False):
    """Host-side triangle binning for the current geometry (large-F path).
    The projection runs ON HOST from the (V, 3) vertices — fetching the
    (C, V, 4) device NDC measured 1.8 s over the axon tunnel at 163k verts
    vs 0.4 s for the host matmul.
    Returns ((bins, counts) device arrays, occupancy, cap, screen-xy
    [, spans])."""
    from ..render.pallas_core import bin_triangles_host, suggest_cap
    v_host = np.asarray(v, np.float32)
    mvps = np.asarray(renderer.mvps)
    vh = np.concatenate(
        [v_host, np.ones((v_host.shape[0], 1), np.float32)], axis=1)
    v_ndc = np.einsum("cij,vj->cvi", mvps, vh)
    out = bin_triangles_host(
        v_ndc, topology.faces, renderer.res, cap=cap, margin=margin,
        cull=cull, return_spans=return_spans, return_slots=True)
    bins, counts, fslots = out[0], out[1], out[2]
    # pad the face→slot inverse to the device-binner's static K=4 span so
    # pipe shapes stay stable when mid-run rebins move on device
    if fslots.shape[-1] < 4:
        T = bins.shape[1]
        fslots = np.pad(fslots, ((0, 0), (0, 0), (0, 4 - fslots.shape[-1])),
                        constant_values=T * bins.shape[-1])
    # pixel-space positions, kept to validate the margin-staleness contract
    # at the NEXT rebin (no vertex may move > ~margin/2 px inside a window)
    h, w = renderer.res
    safe_w = np.where(v_ndc[..., 3] == 0, 1.0, v_ndc[..., 3])
    sxy = np.stack([(v_ndc[..., 0] / safe_w + 1.0) * (w / 2.0),
                    (v_ndc[..., 1] / safe_w + 1.0) * (h / 2.0)], axis=-1)
    res = ((jnp.asarray(bins), jnp.asarray(counts), jnp.asarray(fslots)),
           out[3], bins.shape[-1], sxy)
    if return_spans:
        return res + (out[4],)
    return res


def _sxy_device(renderer, v_ndc):
    """Device (C, V, 2) pixel positions from device NDC."""
    h, w = renderer.res
    safe_w = jnp.where(v_ndc[..., 3] == 0, 1.0, v_ndc[..., 3])
    return jnp.stack([(v_ndc[..., 0] / safe_w + 1.0) * (w / 2.0),
                      (v_ndc[..., 1] / safe_w + 1.0) * (h / 2.0)], axis=-1)


def _make_rebin_fn(renderer, p, cap):
    """Jitted project → device-bin → sxy pipeline (one dispatch per rebin;
    faces/mvps ride as device-array arguments)."""
    from ..render.pallas_core import bin_triangles_device
    from ..render.camera import project
    res = renderer.res
    margin = float(p["rebin_margin"])
    cull = bool(p["cull_backfaces"])
    h, w = res

    @jax.jit
    def fn(v_render, faces, mvps):
        v_ndc = project(v_render, mvps)
        bins, counts, fslots, occ = bin_triangles_device(
            v_ndc, faces, res, cap, margin=margin, cull=cull)
        safe_w = jnp.where(v_ndc[..., 3] == 0, 1.0, v_ndc[..., 3])
        sxy = jnp.stack([(v_ndc[..., 0] / safe_w + 1.0) * (w / 2.0),
                         (v_ndc[..., 1] / safe_w + 1.0) * (h / 2.0)],
                        axis=-1)
        return bins, counts, fslots, occ, sxy

    return fn


def _rebin_device(st: EpochState, p, renderer, v_render_dev):
    """Recompute the bins ON DEVICE (pallas_core.bin_triangles_device) —
    no host fetch, no tunnel upload (the host path measured ~20 s per rebin
    at 163k verts: 7.9 s numpy + 12 s bins upload at ~3.6 MB/s)."""
    if st.rebin_fn is None or st.rebin_fn_cap != st.bin_cap:
        st.rebin_fn = _make_rebin_fn(renderer, p, st.bin_cap)
        st.rebin_fn_cap = st.bin_cap
    bins, counts, fslots, occ, sxy = st.rebin_fn(v_render_dev, st.faces_dev,
                                                 renderer.mvps)
    st.bins = (bins, counts, fslots)
    st.sxy_dev = sxy
    st.pending_occ = occ          # device scalar; checked at the next rebin
    return st


def _rebin(st: EpochState, p, renderer, v_render):
    """Recompute host bins mid-epoch; grows the cap (recompile) only on
    overflow — this is also the mid-epoch occupancy re-check and the
    retrospective margin-staleness check (ADVICE r4): if any vertex moved
    more than margin/2 px since the PREVIOUS rebin, that window's tiles may
    have silently under-drawn, so warn with the measured displacement."""
    bins, occ, cap, sxy = _host_bins(renderer, v_render, st.topology,
                                     p["rebin_margin"], cap=st.bin_cap,
                                     cull=p["cull_backfaces"])
    if occ > st.bin_cap:           # overflow: resize and re-bin (rare)
        bins, occ, cap, sxy = _host_bins(renderer, v_render, st.topology,
                                         p["rebin_margin"], cap=None,
                                         cull=p["cull_backfaces"])
        st.bin_cap = cap
    if st.bins is not None and len(st.bins) > 2 and st.bins[2] is not None:
        # keep the face→slot K stable across host rebins (K shrinking would
        # needlessly retrace the pipe; growth is a legitimate retrace)
        k_old = int(st.bins[2].shape[-1])
        k_new = int(bins[2].shape[-1])
        if k_new < k_old and bins[0].shape == st.bins[0].shape:
            sentinel = bins[0].shape[1] * bins[0].shape[-1]
            fs = jnp.pad(bins[2], ((0, 0), (0, 0), (0, k_old - k_new)),
                         constant_values=sentinel)
            bins = (bins[0], bins[1], fs)
    if st.last_sxy is not None and st.last_sxy.shape == sxy.shape:
        disp = float(np.max(np.abs(sxy - st.last_sxy)))
        st.max_window_disp = max(st.max_window_disp, disp)
        if disp > 0.5 * float(p["rebin_margin"]):
            import warnings
            warnings.warn(
                f"vertices moved up to {disp:.2f} px between host rebins "
                f"(> margin/2 = {0.5 * float(p['rebin_margin']):.2f}); the "
                f"last {p['rebin_every']}-step window may have under-drawn "
                f"tiles — lower rebin_every or raise rebin_margin")
    st.last_sxy = sxy
    st.bins = bins
    # keep the device-side bin-time positions in sync for the step's
    # displacement scalar (cheap device recompute, not a 17 MB upload)
    from ..render.camera import project
    st.sxy_dev = _sxy_device(
        renderer, project(jnp.asarray(np.asarray(v_render, np.float32)),
                          renderer.mvps))
    return st


def _make_solver(M, p, renderer):
    """Solver for this epoch's matrix.  With a device mesh attached and the
    CG solver selected, the solve runs edge-sharded under shard_map
    (parallel/tri_shard.py) — the distributed-mesh path where solver state
    must not be replicated work."""
    if getattr(renderer, "mesh", None) is not None and p["solver"] == "CG":
        from ..parallel.tri_shard import ShardedCGSolver
        return ShardedCGSolver(M, renderer.mesh, axes=("dp", "sp"))
    return get_solver(M, p["solver"])


def _build_epoch(v_src, f_src, p, renderer):
    v_unique, f_unique, duplicate_idx = remove_duplicates(v_src, f_src)
    st = EpochState(
        v_unique=v_unique, f_unique=f_unique, duplicate_idx=duplicate_idx,
        f_src=np.asarray(f_src, np.int32), topology=Topology(f_src),
    )
    st.L = laplacian_uniform(len(v_unique), f_unique)
    st.use_host_bins = (renderer.backend == "pallas"
                        and st.topology.n_faces >= int(p["host_bin_faces"]))
    if st.use_host_bins:
        st.bins, occ, st.bin_cap, st.last_sxy, spans = _host_bins(
            renderer, v_src, st.topology, p["rebin_margin"],
            cap=p.get("host_bin_cap"), cull=p["cull_backfaces"],
            return_spans=True)
        if occ > st.bin_cap:       # configured floor too small: resize
            st.bins, occ, st.bin_cap, st.last_sxy, spans = _host_bins(
                renderer, v_src, st.topology, p["rebin_margin"],
                cull=p["cull_backfaces"], return_spans=True)
        # mid-run rebins run ON DEVICE when the measured tile spans fit the
        # static (2, 2) expansion bound of bin_triangles_device
        st.device_rebin_ok = spans[0] <= 2 and spans[1] <= 2
        st.dup_dev = jnp.asarray(st.duplicate_idx)
        st.faces_dev = jnp.asarray(st.topology.faces)
        from ..render.camera import project
        st.sxy_dev = _sxy_device(
            renderer, project(jnp.asarray(v_src), renderer.mvps))
    else:
        # size the raster bins for this epoch's geometry before the first
        # traced render: overflow would under-draw tiles silently (ADVICE r2)
        renderer.check_overflow(v_src, st.topology)
    if p["smooth"]:
        st.M = compute_matrix(v_unique, f_unique, lambda_=p["lambda"], alpha=p["alpha"])
        st.u = to_differential(st.M, jnp.asarray(v_unique))
        # materialize the factorization now (once per epoch)
        st.solver = _make_solver(st.M, p, renderer)
    return st


def _make_step(st: EpochState, p, renderer, ref_imgs, tx):
    """Build the jitted train step for one topology epoch."""
    smooth = p["smooth"]
    use_tr = p["use_tr"]
    dup = jnp.asarray(st.duplicate_idx)
    f_unique = st.f_unique
    L = st.L
    solver = st.solver if smooth else None
    reg = float(p["reg"])
    loss_kind = p["loss"]
    bilap = p["bilaplacian"]
    track_disp = st.use_host_bins
    h_res, w_res = renderer.res

    def forward(theta, guess_fwd, guess_bwd, solver, bins):
        if smooth:
            v_unique = diff_solve(solver, theta["u"], guess_fwd, guess_bwd)
        else:
            v_unique = theta["u"]
        v_opt = v_unique[dup]
        fn = compute_face_normals(v_unique, f_unique)
        n_unique = compute_vertex_normals(v_unique, f_unique, fn)
        n_opt = n_unique[dup]
        tr = theta["tr"] if use_tr else jnp.zeros((1, 3), v_opt.dtype)
        v_render = tr + v_opt
        imgs = renderer.render(v_render, n_opt, st.topology, bins=bins)
        diff = imgs - ref_imgs
        im_loss = jnp.abs(diff).mean() if loss_kind == "l1" else jnp.square(diff).mean()
        Lv = coo_matvec(L, v_unique)
        if bilap:
            reg_loss = jnp.square(Lv).mean()
        else:
            reg_loss = (v_unique * Lv).mean()
        loss = im_loss + reg * reg_loss
        # always log the bilaplacian magnitude, like main.py:200
        bilap_mag = jnp.square(jax.lax.stop_gradient(Lv)).mean()
        return loss, (im_loss, bilap_mag, v_unique,
                      jax.lax.stop_gradient(v_render))

    @jax.jit
    def jit_step(theta, opt_state, guess_fwd, guess_bwd, solver, bins,
                 sxy_bin):
        # the solver and bins ride in as ARGUMENTS so their device tables
        # stay device buffers — closed over, they would be baked into the
        # compiled program (fatal at 163k verts on the axon client)
        (loss, (im_loss, bilap_mag, v_unique, v_render)), grads = \
            jax.value_and_grad(forward, has_aux=True)(
                theta, guess_fwd, guess_bwd, solver, bins)
        if not use_tr:
            grads["tr"] = jnp.zeros_like(theta["tr"])
        updates, opt_state = tx.update(grads, opt_state, theta)
        theta = jax.tree.map(lambda a, b: a + b, theta, updates)
        new_guess_fwd = jax.lax.stop_gradient(v_unique)
        new_guess_bwd = grads["u"] if smooth else jnp.zeros_like(theta["u"])
        if track_disp:
            # max screen-space (px) displacement vs the bin-time positions:
            # the host polls this (lazily) to trigger rebins exactly when
            # the margin-staleness contract is about to break
            from ..render.camera import project
            v_ndc = project(v_render, renderer.mvps)
            safe_w = jnp.where(v_ndc[..., 3] == 0, 1.0, v_ndc[..., 3])
            sxy = jnp.stack(
                [(v_ndc[..., 0] / safe_w + 1.0) * (w_res / 2.0),
                 (v_ndc[..., 1] / safe_w + 1.0) * (h_res / 2.0)], axis=-1)
            disp = jnp.abs(sxy - sxy_bin).max()
        else:
            disp = jnp.float32(0.0)
        return (theta, opt_state, (im_loss, bilap_mag), new_guess_fwd,
                new_guess_bwd, disp)

    def step(theta, opt_state, guess_fwd, guess_bwd):
        sxy = st.sxy_dev if track_disp else jnp.zeros((), jnp.float32)
        return jit_step(theta, opt_state, guess_fwd, guess_bwd, solver,
                        st.bins, sxy)

    return step


def optimize_shape(scene, params=None):
    """Run the shape optimization.  ``scene`` is a scene-params dict or a
    path to a scene XML.  Returns the reference-compatible result dict
    (main.py:124-126,217-218)."""
    p = default_params()
    if params:
        p.update(params)
    t_setup0 = time.perf_counter()

    # persistent compile cache: each topology epoch is a recompile boundary,
    # and the two render chains cost minutes to compile cold on the axon
    # client — cache across runs/epochs (harmless if already configured)
    import os
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.expanduser("~/.jax_cache")))
    except Exception:
        pass

    scene_params = load_scene(scene) if isinstance(scene, str) else scene

    v_ref = jnp.asarray(scene_params["mesh-target"]["vertices"])
    f_ref = np.asarray(scene_params["mesh-target"]["faces"], np.int32)
    if "normals" in scene_params["mesh-target"]:
        n_ref = jnp.asarray(scene_params["mesh-target"]["normals"])
    else:
        fn = compute_face_normals(v_ref, f_ref)
        n_ref = compute_vertex_normals(v_ref, f_ref, fn)

    v_src = np.asarray(scene_params["mesh-source"]["vertices"], np.float32)
    f_src = np.asarray(scene_params["mesh-source"]["faces"], np.int32)

    resume_data = None
    if p["resume"]:
        from .checkpoint import load_checkpoint
        resume_data = load_checkpoint(p["resume"])
        v_src = resume_data["v_src"].astype(np.float32)
        f_src = resume_data["f_src"].astype(np.int32)

    renderer = Renderer(scene_params, shading=p["shading"], boost=p["boost"],
                        chunk=p["raster_chunk"])
    if p["sharding"]:
        # one code path for single- and multi-device runs: attach the mesh
        # to the renderer (shard_map for the pallas kernels, GSPMD for the
        # xla backend) and let jit propagate shardings through the step —
        # remeshing, checkpointing and loss logging compose unchanged
        from ..parallel.sharding import make_mesh, shard_renderer
        sh = p["sharding"]
        sh = {"dp": sh} if isinstance(sh, int) else dict(sh)
        sp = int(sh.get("sp", 1))
        mesh = make_mesh(int(sh.get("dp", 1)) * sp, sp=sp)
        renderer = shard_renderer(renderer, mesh, shard_rows=sp > 1)
    ref_topo = Topology(f_ref)
    if renderer.backend == "pallas" \
            and ref_topo.n_faces >= int(p["host_bin_faces"]):
        ref_bins, _, _, _ = _host_bins(renderer, v_ref, ref_topo, 0.0)
        ref_imgs = renderer.render(v_ref, n_ref, ref_topo, bins=ref_bins)
    else:
        ref_imgs = renderer.render(v_ref, n_ref, ref_topo)
    ref_imgs = jax.lax.stop_gradient(ref_imgs)
    if p["sharding"] and renderer.backend != "pallas":
        from ..parallel.sharding import camera_sharding
        ref_imgs = jax.device_put(
            ref_imgs, camera_sharding(renderer.mesh, ref_imgs.ndim,
                                      row_axis=1 if sp > 1 else None))

    st = _build_epoch(v_src, f_src, p, renderer)

    step_size = float(p["step_size"])
    if resume_data is not None:
        step_size = float(resume_data["meta"]["step_size"])
    tx = _make_optimizer(p["optimizer"], step_size)
    theta = {
        "u": st.u if p["smooth"] else jnp.asarray(st.v_unique),
        "tr": jnp.zeros((1, 3), jnp.float32),
    }
    opt_state = tx.init(theta)
    if resume_data is not None:
        from .checkpoint import load_pytree
        theta = load_pytree(resume_data["theta"], theta)
        opt_state = load_pytree(resume_data["opt_state"], opt_state)
        if st.use_host_bins:
            # the epoch's bins were computed from v_src, but the restored
            # theta may be far from it — until the first scheduled rebin the
            # tiles would silently under-draw (ADVICE r4).  Re-bin from the
            # restored solved vertices now.
            if p["smooth"]:
                v_restored = np.asarray(jax.lax.stop_gradient(
                    diff_solve(st.solver, theta["u"])))
            else:
                v_restored = np.asarray(theta["u"])
            tr_np = np.asarray(theta["tr"]) if p["use_tr"] else 0.0
            st = _rebin(st, p, renderer,
                        v_restored[st.duplicate_idx] + tr_np)
    guess_fwd = jnp.asarray(st.v_unique)
    guess_bwd = jnp.zeros_like(guess_fwd)
    step = _make_step(st, p, renderer, ref_imgs, tx)

    steps = int(p["steps"])
    opt_time = float(p["time"]) * 60.0
    if float(p["time"]) > 0:
        steps = -1

    remesh = p["remesh"]
    remesh_schedule = list(remesh) if isinstance(remesh, (list, tuple)) else []
    remesh_it = remesh_schedule.pop(0) if remesh_schedule else (
        remesh if isinstance(remesh, int) else -1
    )
    start_it = 0
    if resume_data is not None:
        start_it = int(resume_data["meta"]["step"])
        # checkpoints are written BEFORE the remesh branch of the same
        # iteration, so a remesh scheduled exactly at start_it must replay
        remesh_schedule = [r for r in resume_data["meta"]["remesh_schedule"]
                           if r >= start_it]
        remesh_it = remesh_schedule.pop(0) if remesh_schedule else -1

    result = {
        "vert_steps": [], "tr_steps": [], "f": [f_src.copy()], "losses": [],
        "im_ref": np.asarray(ref_imgs),
        "v_ref": np.asarray(v_ref), "f_ref": f_ref.copy(),
    }

    it = start_it
    last_rebin_it = start_it
    from collections import deque
    disp_q = deque()
    inflight = deque()
    prof = {"rebin_s": 0.0, "rebin_n": 0, "first_step_s": 0.0,
            "setup_s": time.perf_counter() - t_setup0}
    t0 = time.perf_counter()
    t = t0
    loss_log = []
    while (steps > 0 and it < steps) or (steps < 0 and (t - t0) < opt_time):
        if p["checkpoint_every"] and p["checkpoint_path"] and it > start_it \
                and it % p["checkpoint_every"] == 0:
            from .checkpoint import save_checkpoint
            full_schedule = ([remesh_it] if remesh_it > 0 else []) + remesh_schedule
            save_checkpoint(
                p["checkpoint_path"], theta=theta, opt_state=opt_state,
                v_src=v_src, f_src=f_src, step=it, step_size=step_size,
                remesh_schedule=full_schedule,
            )
        if it == remesh_it:
            # --- remesh event: host round-trip, new epoch ---------------
            from ..native import remesh as native_remesh
            if p["smooth"]:
                v_unique = diff_solve(st.solver, theta["u"])
                v_unique = np.asarray(jax.lax.stop_gradient(v_unique))
            else:
                v_unique = np.asarray(theta["u"])
            h = float(average_edge_length(v_unique, st.f_unique)) * 0.5
            v_new, f_new = native_remesh.remesh_botsch(
                v_unique.astype(np.float64), st.f_unique.astype(np.int32), 5, h, True
            )
            v_src = v_new.astype(np.float32)
            f_src = f_new.astype(np.int32)
            # Free the OLD epoch before building the new one.  At nefertiti
            # scale the two epochs' solver factor tables, render bin tables
            # and compiled step executables do not fit HBM side by side
            # (measured: the teaser ours_remesh leg ResourceExhausted'd at
            # the 40k→156k remesh).  Everything needed from the old epoch
            # (v_unique, theta["tr"]) is already on host above.
            while inflight:
                jax.block_until_ready(inflight.popleft())
            disp_q.clear()
            theta = {"tr": np.asarray(theta["tr"])}
            opt_state = guess_fwd = guess_bwd = None
            step = None          # drop the old executable + its constants
            st = None
            import gc
            jax.clear_caches()   # old-shape executables hold device buffers
            gc.collect()
            st = _build_epoch(v_src, f_src, p, renderer)
            result["f"].append(f_new.copy())
            step_size *= 0.8
            tx = _make_optimizer(p["optimizer"], step_size)
            theta = {
                "u": st.u if p["smooth"] else jnp.asarray(st.v_unique),
                "tr": jnp.asarray(theta["tr"]),
            }
            opt_state = tx.init(theta)
            guess_fwd = jnp.asarray(st.v_unique)
            guess_bwd = jnp.zeros_like(guess_fwd)
            step = _make_step(st, p, renderer, ref_imgs, tx)
            last_rebin_it = it
            disp_q.clear()
            if remesh_schedule:
                remesh_it = remesh_schedule.pop(0)
            else:
                remesh_it = -1

        if st.use_host_bins and it > start_it:
            # rebin when due: at the max interval (rebin_every), or as soon
            # as the measured screen displacement since bin time crosses
            # margin/2 (the step emits that scalar; poll it WITHOUT forcing
            # a device sync — .is_ready() — so the async pipeline stays full)
            due = bool(p["rebin_every"]) and \
                (it - last_rebin_it) >= int(p["rebin_every"])
            if not due and p["rebin_auto"]:
                # drain every displacement scalar that has EXECUTED (poll
                # the FIFO head — the loop dispatches far ahead, so the
                # latest step's scalar is chronically not-ready)
                while disp_q:
                    head = disp_q[0]
                    try:
                        ready = head.is_ready()
                    except Exception:
                        ready = True
                    if not ready:
                        break
                    d = float(disp_q.popleft())
                    st.max_window_disp = max(st.max_window_disp, d)
                    if d > 0.5 * float(p["rebin_margin"]):
                        due = True
            if due:
                t_rb = time.perf_counter()
                grow = False
                if st.device_rebin_ok and st.pending_occ is not None:
                    # occupancy of a PREVIOUS device rebin: grow the cap
                    # through the host path if a window truncated.  Poll
                    # only — a blocking fetch here would drain the whole
                    # dispatch pipeline every rebin
                    try:
                        occ_ready = st.pending_occ.is_ready()
                    except Exception:
                        occ_ready = True
                    if occ_ready:
                        occ_prev = float(np.asarray(st.pending_occ))
                        st.pending_occ = None
                        if occ_prev > st.bin_cap:
                            import warnings
                            warnings.warn(
                                f"bin occupancy {int(occ_prev)} exceeded cap "
                                f"{st.bin_cap} during the last window; "
                                f"growing")
                            grow = True
                if st.device_rebin_ok and not grow:
                    tr_dev = theta["tr"] if p["use_tr"] else 0.0
                    st = _rebin_device(st, p, renderer,
                                       guess_fwd[st.dup_dev] + tr_dev)
                else:
                    tr_np = np.asarray(theta["tr"]) if p["use_tr"] else 0.0
                    v_render = np.asarray(guess_fwd)[st.duplicate_idx] + tr_np
                    st = _rebin(st, p, renderer, v_render)
                    st.pending_occ = None
                last_rebin_it = it
                disp_q.clear()
                prof["rebin_s"] += time.perf_counter() - t_rb
                prof["rebin_n"] += 1

        t_st = time.perf_counter() if it == start_it else 0.0
        theta, opt_state, losses, guess_fwd, guess_bwd, disp = step(
            theta, opt_state, guess_fwd, guess_bwd
        )
        if st.use_host_bins:
            disp_q.append(disp)
            inflight.append(losses[0])
            if len(inflight) > int(p["max_inflight"]):
                jax.block_until_ready(inflight.popleft())
        if it == start_it:
            # first step = trace + compile (+ one execution); recorded so
            # sustained-throughput numbers can separate compile from run
            jax.block_until_ready(losses)
            prof["first_step_s"] = time.perf_counter() - t_st
        loss_log.append(losses)
        # divergence detection: a NaN/Inf loss means every further step is
        # wasted work (round-4 naive teaser leg burned its full budget
        # producing NaNs).  Check periodically (not every step — a per-step
        # host fetch would serialize the async dispatch pipeline).
        if p["nan_check_every"] and (it + 1) % int(p["nan_check_every"]) == 0:
            # check BOTH logged scalars: NaN vertices render as background,
            # leaving the image loss FINITE while the bilaplacian magnitude
            # (a function of the vertices) goes NaN — the observed teaser
            # divergence mode
            if not (np.isfinite(float(np.asarray(losses[0])))
                    and np.isfinite(float(np.asarray(losses[1])))):
                import warnings
                warnings.warn(
                    f"non-finite loss/reg at iteration {it}; aborting "
                    f"optimization (diverged)")
                result["diverged"] = True
                it += 1
                break
        if p["record_verts"]:
            # the step already returns this iteration's solved vertices as
            # the next forward warm start — record those instead of paying a
            # second solve outside the jitted step (ref main.py:200-202)
            result["vert_steps"].append(np.asarray(guess_fwd)[st.duplicate_idx])
            result["tr_steps"].append(np.asarray(theta["tr"]))

        it += 1
        if steps < 0:
            # time-budget mode must count EXECUTED seconds (main.py:119-121
            # semantics); async dispatch would otherwise run far ahead of
            # the wall clock
            jax.block_until_ready(losses)
        t = time.perf_counter()

    # drain the async dispatch queue so wall_time reflects execution, not
    # enqueue time (steps are dispatched asynchronously in step mode); the
    # timestamp is taken BEFORE the final checkpoint write so checkpointed
    # runs report the same wall_time as uncheckpointed ones
    jax.block_until_ready(guess_fwd)
    t = time.perf_counter()

    if p["checkpoint_every"] and p["checkpoint_path"]:
        # final checkpoint so a finished run (or a steps-budget slice of a
        # longer schedule) can be resumed exactly from its end state
        from .checkpoint import save_checkpoint
        full_schedule = ([remesh_it] if remesh_it > 0 else []) + remesh_schedule
        save_checkpoint(
            p["checkpoint_path"], theta=theta, opt_state=opt_state,
            v_src=v_src, f_src=f_src, step=it, step_size=step_size,
            remesh_schedule=full_schedule,
        )

    result["losses"] = np.array(
        [(float(a), float(b)) for a, b in loss_log], dtype=np.float64
    )
    # final state
    if p["smooth"]:
        v_final = diff_solve(st.solver, theta["u"])
    else:
        v_final = theta["u"]
    result["v_final"] = np.asarray(jax.lax.stop_gradient(v_final))[st.duplicate_idx]
    result["f_final"] = st.f_src.copy()
    result["tr"] = np.asarray(theta["tr"])
    result["iters"] = it
    result["wall_time"] = t - t0
    prof["max_window_disp_px"] = st.max_window_disp
    result["prof"] = prof
    return result
