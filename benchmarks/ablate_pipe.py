"""Differential timing of the fused pipeline stages (run on chip).

Each ablation zeroes one backward stage inside pipe_bwd; the time DELTA vs
the full pipeline is that stage's true in-pipe cost (the standalone stage
micro-benches pay artificial operand copies and launch overhead)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def fetch(x):
    return np.asarray(jax.tree.leaves(x)[0]).ravel()[0]


def main():
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

    scene = make_scene(source=("icosphere", 4), target=("gourd", 4),
                       n_views=13, res=256)
    renderer = Renderer(scene, shading=True, boost=3)
    v = jnp.asarray(scene["mesh-source"]["vertices"])
    f = scene["mesh-source"]["faces"]
    topo = Topology(f)
    fn = compute_face_normals(v, f)
    n = compute_vertex_normals(v, f, fn)
    attrs = sh_eval(renderer.sh_M, n) / np.pi
    v_ndc = project(v, renderer.mvps)
    bgs = renderer.bgs
    cap = int(os.environ.get("LS_CAP", "768"))
    it = 20

    for ablate in ("", "scatter", "rbwd", "aabwd", "scatter,rbwd,aabwd"):
        pipe = pc.make_render_pipeline(topo.faces, topo.opp, renderer.res,
                                       shading=True, boost=3.0, cap=cap,
                                       ablate=ablate)

        @jax.jit
        def fb(vc):
            def body(i, v_):
                g = jax.grad(lambda x: pipe(x, attrs, bgs).mean())(v_)
                return v_ + 1e-12 * g
            return jax.lax.fori_loop(0, it, body, vc)

        fetch(fb(v_ndc))
        t0 = time.perf_counter()
        fetch(fb(v_ndc))
        ms = (time.perf_counter() - t0) / it * 1e3
        print(f"f+b ablate={ablate or 'none':22s} {ms:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
