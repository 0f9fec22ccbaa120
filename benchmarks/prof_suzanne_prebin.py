"""Suzanne-class step cost: traced per-step binning vs prebinned bins
(margin 4, rebinned once per window).  If prebinned wins, the driver's
default host_bin_faces drops so ALL pallas meshes bin once per rebin
window instead of every step."""
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    from largesteps_tpu.io.synth import make_scene
    from largesteps_tpu.driver import optimize_shape

    scene = make_scene(source=("icosphere", 4), target=("gourd", 4),
                       n_views=13, res=256)
    base = {"steps": 120, "step_size": 0.05, "lambda": 19.0, "boost": 3,
            "solver": "Cholesky"}
    for tag, extra in (
            ("traced", {}),
            ("prebin", {"host_bin_faces": 1}),
            ("prebin_cull", {"host_bin_faces": 1, "cull_backfaces": True})):
        r = optimize_shape(scene, {**base, **extra})
        prof = r["prof"]
        post = max(r["wall_time"] - prof["first_step_s"], 1e-9)
        print(f"{tag:12s} sustained={((r['iters']-1)/post):6.2f} it/s "
              f"first_step={prof['first_step_s']:5.1f}s "
              f"rebin_n={prof['rebin_n']} rebin_s={prof['rebin_s']:.2f} "
              f"loss={r['losses'][-1][0]:.5f}", flush=True)


if __name__ == "__main__":
    main()
