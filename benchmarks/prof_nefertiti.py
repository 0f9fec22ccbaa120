"""Sustained-throughput attribution at nefertiti scale (163,842 verts,
327,680 faces, 13 views, 256², default driver config).

Round-4 verdict: the bench's steady-state 6.0 it/s and the delivered 0.2
it/s disagree by 30×.  This probe runs the REAL driver loop (default
rebin_every) twice (first run warms the persistent compile cache) and
prints the phase breakdown the driver now records: setup (epoch build +
banded factorization + ref render), first-step trace+compile, host rebin
total, and the residual device loop.
"""
import json
import time

import jax


def main(steps=40):
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    from largesteps_tpu.io.synth import make_scene
    from largesteps_tpu.driver import optimize_shape

    scene = make_scene(source=("icosphere", 7), target=("gourd", 4),
                       n_views=13, res=256)
    p = {"steps": steps, "step_size": 0.05, "lambda": 19.0, "boost": 3,
         "solver": "Cholesky"}

    for tag in ("cold", "warm"):
        t0 = time.perf_counter()
        r = optimize_shape(scene, p)
        wt = time.perf_counter() - t0
        prof = r["prof"]
        loop = r["wall_time"]
        post = loop - prof["first_step_s"] - prof["rebin_s"]
        n_post = r["iters"] - 1
        print(json.dumps({
            "run": tag, "steps": r["iters"],
            "total_s": round(wt, 2),
            "setup_s": round(prof["setup_s"], 2),
            "first_step_s": round(prof["first_step_s"], 2),
            "rebin_s": round(prof["rebin_s"], 3),
            "rebin_n": prof["rebin_n"],
            "device_loop_s": round(post, 2),
            "device_it_per_s": round(n_post / max(post, 1e-9), 3),
            "sustained_it_per_s": round(r["iters"] / max(loop, 1e-9), 3),
            "max_window_disp_px": round(prof.get("max_window_disp_px", 0), 2),
        }), flush=True)


if __name__ == "__main__":
    import sys
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 40)
