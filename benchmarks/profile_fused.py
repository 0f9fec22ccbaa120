"""Per-stage timing of the fused Pallas render pipeline on the current
backend (run on the TPU chip to find the hot stage).

Stages, each timed as its own chained jit (data-dependent iterations +
scalar fetch — the only reliable completion barrier on the axon client):
  setup   — triangle_setup + bin_triangles + bin gather (_setup_and_bin)
  fwd     — raster_fwd_pallas from pre-binned records
  aafwd   — aa_fwd_pallas
  rbwd    — raster_bwd_pallas
  aabwd   — aa_bwd_pallas
  scatter — _chain_planes + _scatter_to_vertices
  pipe    — full pipe fwd, and full fwd+bwd via jax.grad
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def fetch(x):
    return np.asarray(jax.tree.leaves(x)[0]).ravel()[0]


def chain_time(make_body, x0, iters=20, label=""):
    """Time `body` applied iters times with a data-dependency chain."""
    @jax.jit
    def chain(x):
        def body(i, x_):
            return make_body(x_)
        return jax.lax.fori_loop(0, iters, body, x0 * 0 + x)

    fetch(chain(x0))
    t0 = time.perf_counter()
    fetch(chain(x0))
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:10s} {ms:9.3f} ms", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=13)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--cap", type=int, default=768)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    except Exception:
        pass

    from largesteps_tpu.io.synth import make_scene
    from largesteps_tpu.render.renderer import Renderer, Topology
    from largesteps_tpu.render.camera import project
    from largesteps_tpu.render import pallas_core as pc
    from largesteps_tpu.render.sh import sh_eval
    from largesteps_tpu.ops.normals import (compute_face_normals,
                                            compute_vertex_normals)

    print(f"backend: {jax.default_backend()}", flush=True)
    scene = make_scene(source=("icosphere", 4), target=("gourd", 4),
                       n_views=args.views, res=args.res)
    renderer = Renderer(scene, shading=True, boost=3)
    res = renderer.res
    v = jnp.asarray(scene["mesh-source"]["vertices"])
    f = scene["mesh-source"]["faces"]
    topo = Topology(f)
    fj, oj = topo.faces, topo.opp
    fn = compute_face_normals(v, f)
    n = compute_vertex_normals(v, f, fn)
    attrs = sh_eval(renderer.sh_M, n) / np.pi
    v_ndc = project(v, renderer.mvps)
    cap = args.cap
    it = args.iters
    print(f"V={v.shape[0]} F={fj.shape[0]} views={args.views} res={res} cap={cap}",
          flush=True)

    # --- setup+bin ---------------------------------------------------------
    def setup_body(vc):
        rfb, rbb, bins, counts = pc._setup_and_bin(vc, fj, attrs, oj,
                                                   res[0], res[1], cap)
        return vc + 1e-20 * rfb.mean()
    chain_time(setup_body, v_ndc, it, "setup+bin")

    rfb, rbb, bins, counts = jax.jit(
        lambda vc: pc._setup_and_bin(vc, fj, attrs, oj, res[0], res[1], cap)
    )(v_ndc)
    rfb, rbb, bins, counts = map(jax.block_until_ready,
                                 (rfb, rbb, bins, counts))

    # --- forward kernel ----------------------------------------------------
    def fwd_body(x):
        outs = pc.raster_fwd_pallas(rfb + x * 0, counts, res, cap)
        return x + 1e-20 * outs[0].mean()
    chain_time(fwd_body, rfb, it, "fwd")

    u, vv, z, fid, slot, c0, c1, c2 = jax.jit(
        lambda: pc.raster_fwd_pallas(rfb, counts, res, cap))()
    color = jnp.stack([c0, c1, c2], axis=-1)
    cov = (fid > 0.0)[..., None]
    col4 = jnp.concatenate([color, cov.astype(color.dtype)], axis=-1)
    comp = jnp.where(cov, col4, renderer.bgs)
    comp = jax.block_until_ready(comp)

    # --- aa forward --------------------------------------------------------
    def aafwd_body(x):
        out = pc.aa_fwd_pallas(rbb + x * 0, counts, fid, z, comp, res, cap, D=4)
        return x + 1e-20 * out.mean()
    chain_time(aafwd_body, rbb, it, "aafwd")

    # --- raster backward ---------------------------------------------------
    d_col = jnp.ones_like(color)
    dz = jnp.zeros_like(fid)

    def rbwd_body(x):
        dslot = pc.raster_bwd_pallas(rbb + x * 0, counts, slot, d_col, dz, dz,
                                     res, cap)
        return x + 1e-20 * dslot.mean()
    chain_time(rbwd_body, rbb, it, "rbwd")

    # --- aa backward -------------------------------------------------------
    d_out = jnp.ones_like(comp)

    def aabwd_body(x):
        dcol, dsl = pc.aa_bwd_pallas(rbb + x * 0, counts, fid, z, comp, d_out,
                                     res, cap, D=4)
        return x + 1e-20 * dcol.mean()
    chain_time(aabwd_body, rbb, it, "aabwd")

    # --- gradient chaining + vertex scatter --------------------------------
    dslot = jax.block_until_ready(jax.jit(
        lambda: pc.raster_bwd_pallas(rbb, counts, slot, d_col, dz, dz,
                                     res, cap))())

    inc = pc.build_incidence(np.asarray(fj), v.shape[0])

    def scatter_body(x):
        t21 = pc._chain_planes(dslot + x * 0, None, 0.0, rbb)
        dv, da = pc._scatter_via_faces(t21, bins, inc, int(fj.shape[0]),
                                       v.shape[0])
        return x + 1e-20 * dv.mean()
    chain_time(scatter_body, dslot, it, "scatter")

    # --- full pipeline -----------------------------------------------------
    pipe = pc.make_render_pipeline(fj, oj, res, shading=True, boost=3.0,
                                   cap=cap)
    bgs = renderer.bgs

    def pipe_fwd_body(vc):
        out = pipe(vc, attrs, bgs)
        return vc + 1e-20 * out.mean()
    chain_time(pipe_fwd_body, v_ndc, it, "pipe fwd")

    def pipe_fb_body(vc):
        g = jax.grad(lambda x: pipe(x, attrs, bgs).mean())(vc)
        return vc + 1e-20 * g
    chain_time(pipe_fb_body, v_ndc, it, "pipe f+b")


if __name__ == "__main__":
    main()
