"""Is closed-mesh backface culling safe under the teaser 'ours' config?
The suzanne stress test (lr 0.05) showed culling corrupts optimization when
triangles flip mid-run; the teaser runs 25× gentler steps (AdamUniform
2e-3, α=0.98, l1).  Compare 100-step loss trajectories with/without cull at
nefertiti scale, and report the rebin cost with the gather-built bins."""
import json
import time

import numpy as np
import jax


def main(steps=100):
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    from largesteps_tpu.io.synth import make_scene
    from largesteps_tpu.driver import optimize_shape

    scene = make_scene(source=("icosphere", 7), target=("gourd", 7),
                       n_views=13, res=256)
    base = {"steps": steps, "step_size": 2e-3, "alpha": 0.98, "loss": "l1",
            "boost": 3, "solver": "Cholesky", "optimizer": "AdamUniform"}
    for tag, extra in (("cull", {"cull_backfaces": True}),
                       ("nocull", {})):
        r = optimize_shape(scene, {**base, **extra})
        prof = r["prof"]
        post = max(r["wall_time"] - prof["first_step_s"], 1e-9)
        print(json.dumps({
            "tag": tag, "steps": r["iters"],
            "loss0": round(float(r["losses"][0][0]), 6),
            "loss_end": round(float(r["losses"][-1][0]), 6),
            "sustained_it_per_s": round((r["iters"] - 1) / post, 3),
            "first_step_s": round(prof["first_step_s"], 1),
            "rebin_n": prof["rebin_n"],
            "rebin_host_s": round(prof["rebin_s"], 2),
            "max_disp_px": round(prof.get("max_window_disp_px", 0), 2),
        }), flush=True)


if __name__ == "__main__":
    import sys
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100)
