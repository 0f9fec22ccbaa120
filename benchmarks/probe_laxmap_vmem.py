"""Probe: does a large-cap Pallas kernel survive inside lax.map when the
scoped-VMEM limit is raised GLOBALLY via XLA_FLAGS instead of per-kernel
compiler_params?  (The per-kernel attribute is dropped inside loop bodies
on the axon AOT path — pallas_core._ccall_kwargs — which is why the big
pipeline Python-unrolls its camera loop, paying 13× trace/compile.)

Run WITH:    XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=114688
and WITHOUT, to compare.
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main(cap=8192, n_cam=3):
    from largesteps_tpu.io.synth import make_scene
    from largesteps_tpu.render.renderer import Renderer, Topology
    from largesteps_tpu.render.camera import project
    from largesteps_tpu.render import pallas_core as pc
    from largesteps_tpu.render.sh import sh_eval
    from largesteps_tpu.ops.normals import (compute_face_normals,
                                            compute_vertex_normals)

    print("XLA_FLAGS:", os.environ.get("XLA_FLAGS", ""), flush=True)
    scene = make_scene(source=("icosphere", 5), target=("gourd", 4),
                       n_views=n_cam, res=256)
    r = Renderer(scene, shading=True, boost=3)
    v = jnp.asarray(scene["mesh-source"]["vertices"])
    f = scene["mesh-source"]["faces"]
    topo = Topology(f)
    fn = compute_face_normals(v, f)
    n = compute_vertex_normals(v, f, fn)
    attrs = sh_eval(r.sh_M, n) / np.pi
    v_ndc = project(v, r.mvps)
    res = r.res
    ty, tx = res[0] // 32, res[1] // 128
    bins, counts, _ = pc.bin_triangles_host(np.asarray(v_ndc), topo.faces,
                                            res, cap=cap, margin=2.0)
    bins, counts = jnp.asarray(bins), jnp.asarray(counts)
    fj, oj = topo.faces, topo.opp

    def cam(args):
        vc1, b1, c1 = args
        rfb, _ = pc.setup_from_bins(vc1, fj, attrs, oj, b1, res[0], res[1])
        rfb = rfb.reshape(1, ty, tx, cap, 32)
        c3 = c1.reshape(1, ty, tx).astype(jnp.int32)
        outs = pc.raster_fwd_pallas(rfb, c3, res, cap, chunk=128)
        return outs[3][0]          # fid plane

    @jax.jit
    def run_map(vn, b, c):
        return jax.lax.map(cam, (vn, b, c))

    t0 = time.perf_counter()
    out = jax.block_until_ready(run_map(v_ndc, bins, counts))
    print(f"lax.map OK  compile+run {time.perf_counter()-t0:.1f}s "
          f"coverage={float((out > 0).mean()):.3f}", flush=True)


if __name__ == "__main__":
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8192)
