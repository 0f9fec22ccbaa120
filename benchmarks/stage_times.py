"""Per-stage timing of the fused pipeline at suzanne scale (13×256²) and of
the big pipeline's per-camera stages at nefertiti scale.

Usage: python benchmarks/stage_times.py [suzanne|nefertiti]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=20, warmup=2):
    # barrier on a device-side SCALAR reduction of every output: fetching a
    # large output itself would measure the tunnel (108 MB tables at 163k),
    # and sums can't be DCE'd without skipping the compute
    fs = jax.jit(lambda *a: sum(jnp.sum(o) for o in jax.tree.leaves(fn(*a))))
    for _ in range(warmup):
        out = fs(*args)
    float(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fs(*args)
    float(out)
    return (time.perf_counter() - t0) / n * 1e3


def suzanne():
    from largesteps_tpu.io.synth import make_scene
    from largesteps_tpu.render.renderer import Renderer, Topology
    from largesteps_tpu.render.camera import project
    from largesteps_tpu.render import pallas_core as pc
    from largesteps_tpu.render.sh import sh_eval
    from largesteps_tpu.ops.normals import (compute_face_normals,
                                            compute_vertex_normals)

    scene = make_scene(source=("icosphere", 4), target=("gourd", 4),
                       n_views=13, res=256)
    r = Renderer(scene, shading=True, boost=3)
    v = jnp.asarray(scene["mesh-source"]["vertices"])
    f = scene["mesh-source"]["faces"]
    topo = Topology(f)
    r.check_overflow(v, topo)
    cap = r.bin_cap
    print(f"V={v.shape[0]} F={topo.n_faces} cap={cap}", flush=True)
    fn = compute_face_normals(v, f)
    n = compute_vertex_normals(v, f, fn)
    attrs = sh_eval(r.sh_M, n) / np.pi
    v_ndc = jax.block_until_ready(project(v, r.mvps))
    res = r.res
    fj, oj = topo.faces, topo.opp

    setup = jax.jit(lambda vc: pc._setup_and_bin(vc, fj, attrs, oj,
                                                 res[0], res[1], cap))
    rfb, rbb, bins, counts = jax.block_until_ready(setup(v_ndc))
    print(f"setup_and_bin:  {timeit(setup, v_ndc):7.2f} ms", flush=True)

    rfwd = jax.jit(lambda rf, ct: pc.raster_fwd_pallas(rf, ct, res, cap,
                                                       chunk=128))
    outs = jax.block_until_ready(rfwd(rfb, counts))
    u, vv, z, fid, slot, c0, c1, c2 = outs
    print(f"raster_fwd:     {timeit(rfwd, rfb, counts):7.2f} ms", flush=True)

    color = jnp.stack([c0, c1, c2], axis=-1)
    cov = (fid > 0.0)[..., None]
    col4 = jnp.concatenate([color, cov.astype(color.dtype)], axis=-1)
    comp = jnp.where(cov, col4, r.bgs)
    aafwd = jax.jit(lambda rb, ct, fi, zz, cm: pc.aa_fwd_pallas(
        rb, ct, fi, zz, cm, res, cap, D=4))
    jax.block_until_ready(aafwd(rbb, counts, fid, z, comp))
    print(f"aa_fwd:         {timeit(aafwd, rbb, counts, fid, z, comp):7.2f} ms",
          flush=True)

    g = jnp.ones_like(comp) * 1e-3
    aabwd = jax.jit(lambda rb, ct, fi, zz, cm, gg: pc.aa_bwd_pallas(
        rb, ct, fi, zz, cm, gg, res, cap, D=4))
    jax.block_until_ready(aabwd(rbb, counts, fid, z, comp, g))
    print(f"aa_bwd:         {timeit(aabwd, rbb, counts, fid, z, comp, g):7.2f} ms",
          flush=True)

    dcol = g[..., :3]
    rbwd = jax.jit(lambda rb, ct, sl, dc, fi: pc.raster_bwd_pallas(
        rb, ct, sl, dc, jnp.zeros_like(fi), jnp.zeros_like(fi), res, cap))
    dslot = jax.block_until_ready(rbwd(rbb, counts, slot, dcol, fid))
    print(f"raster_bwd:     {timeit(rbwd, rbb, counts, slot, dcol, fid):7.2f} ms",
          flush=True)

    inc = pc.build_incidence(fj, v.shape[0])
    dslot_aa = jnp.zeros((*counts.shape, cap, 8), jnp.float32)
    chain = jax.jit(lambda ds, da, rb, bi: pc._scatter_via_faces(
        pc._chain_planes(ds, da, 3.0, rb), bi, inc, fj.shape[0], v.shape[0]))
    jax.block_until_ready(chain(dslot, dslot_aa, rbb, bins))
    print(f"chain+scatter:  {timeit(chain, dslot, dslot_aa, rbb, bins):7.2f} ms",
          flush=True)


def nefertiti():
    from largesteps_tpu.io.synth import make_scene
    from largesteps_tpu.render.renderer import Renderer, Topology
    from largesteps_tpu.render.camera import project
    from largesteps_tpu.render import pallas_core as pc
    from largesteps_tpu.render.sh import sh_eval
    from largesteps_tpu.ops.normals import (compute_face_normals,
                                            compute_vertex_normals)

    scene = make_scene(source=("icosphere", 7), target=("gourd", 4),
                       n_views=13, res=256)
    r = Renderer(scene, shading=True, boost=3)
    v = jnp.asarray(scene["mesh-source"]["vertices"])
    f = scene["mesh-source"]["faces"]
    topo = Topology(f)
    fn = compute_face_normals(v, f)
    n = compute_vertex_normals(v, f, fn)
    attrs = sh_eval(r.sh_M, n) / np.pi
    v_ndc_d = jax.block_until_ready(project(v, r.mvps))
    v_ndc = np.asarray(v_ndc_d)
    res = r.res
    fj, oj = topo.faces, topo.opp
    bins, counts, occ = pc.bin_triangles_host(v_ndc, fj, res, margin=4.0)
    cap = bins.shape[-1]
    ty, tx = res[0] // 32, res[1] // 128
    print(f"V={v.shape[0]} F={topo.n_faces} cap={cap} occ={occ}", flush=True)
    b1 = jnp.asarray(bins[0])
    c1 = jnp.asarray(counts[0])
    vc1 = v_ndc_d[0]

    setup1 = jax.jit(lambda vc, b: pc.setup_from_bins(vc, fj, attrs, oj, b,
                                                      res[0], res[1]))
    rfb1, rbb1 = jax.block_until_ready(setup1(vc1, b1))
    print(f"setup_from_bins/cam: {timeit(setup1, vc1, b1, n=5):8.2f} ms",
          flush=True)
    rfb = rfb1.reshape(1, ty, tx, cap, 32)
    rbb = rbb1.reshape(1, ty, tx, cap, 32)
    c3 = c1.reshape(1, ty, tx).astype(jnp.int32)

    rfwd = jax.jit(lambda rf, ct: pc.raster_fwd_pallas(rf, ct, res, cap,
                                                       chunk=128))
    outs = jax.block_until_ready(rfwd(rfb, c3))
    u, vv, z, fid, slot, c0_, c1_, c2_ = outs
    print(f"raster_fwd/cam:      {timeit(rfwd, rfb, c3, n=5):8.2f} ms",
          flush=True)

    color = jnp.stack([c0_, c1_, c2_], axis=-1)
    cov = (fid > 0.0)[..., None]
    col4 = jnp.concatenate([color, cov.astype(color.dtype)], axis=-1)
    comp = jnp.where(cov, col4, r.bgs[:1])
    aafwd = jax.jit(lambda rb, ct, fi, zz, cm: pc.aa_fwd_pallas(
        rb, ct, fi, zz, cm, res, cap, D=4))
    jax.block_until_ready(aafwd(rbb, c3, fid, z, comp))
    print(f"aa_fwd/cam:          {timeit(aafwd, rbb, c3, fid, z, comp, n=5):8.2f} ms",
          flush=True)

    g = jnp.ones_like(comp) * 1e-3
    aabwd = jax.jit(lambda rb, ct, fi, zz, cm, gg: pc.aa_bwd_pallas(
        rb, ct, fi, zz, cm, gg, res, cap, D=4))
    jax.block_until_ready(aabwd(rbb, c3, fid, z, comp, g))
    print(f"aa_bwd/cam:          {timeit(aabwd, rbb, c3, fid, z, comp, g, n=5):8.2f} ms",
          flush=True)

    dcol = g[..., :3]
    rbwd = jax.jit(lambda rb, ct, sl, dc, fi: pc.raster_bwd_pallas(
        rb, ct, sl, dc, jnp.zeros_like(fi), jnp.zeros_like(fi), res, cap))
    dslot = jax.block_until_ready(rbwd(rbb, c3, slot, dcol, fid))
    print(f"raster_bwd/cam:      {timeit(rbwd, rbb, c3, slot, dcol, fid, n=5):8.2f} ms",
          flush=True)

    inc = pc.build_incidence(fj, v.shape[0])
    dslot_aa = jnp.zeros((*c3.shape, cap, 8), jnp.float32)
    bins4 = b1.reshape(1, ty, tx, cap)
    chain = jax.jit(lambda ds, da, rb, bi: pc._scatter_via_faces(
        pc._chain_planes(ds, da, 3.0, rb), bi, inc, fj.shape[0], v.shape[0]))
    jax.block_until_ready(chain(dslot, dslot_aa, rbb, bins4))
    print(f"chain+scatter/cam:   {timeit(chain, dslot, dslot_aa, rbb, bins4, n=5):8.2f} ms",
          flush=True)


if __name__ == "__main__":
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    which = sys.argv[1] if len(sys.argv) > 1 else "suzanne"
    (nefertiti if which == "nefertiti" else suzanne)()
