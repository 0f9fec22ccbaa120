"""Decompose the 163k rebin cost: device->host fetch, host binning compute,
host->device bins upload, and the steady per-step rate with rebinning off."""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    from largesteps_tpu.io.synth import make_scene
    from largesteps_tpu.render.renderer import Renderer, Topology
    from largesteps_tpu.render.camera import project
    from largesteps_tpu.render.pallas_core import bin_triangles_host

    scene = make_scene(source=("icosphere", 7), target=("gourd", 4),
                       n_views=13, res=256)
    r = Renderer(scene, shading=True, boost=3)
    v = jnp.asarray(scene["mesh-source"]["vertices"])
    f = scene["mesh-source"]["faces"]
    topo = Topology(f)

    # device project + fetch (what _host_bins does today)
    pj = jax.jit(lambda vv: project(vv, r.mvps))
    v_ndc_dev = jax.block_until_ready(pj(v))
    t0 = time.perf_counter()
    v_ndc = np.asarray(v_ndc_dev)
    t_fetch = time.perf_counter() - t0

    # host-side project from (V,3) instead (2 MB fetch + host matmul)
    t0 = time.perf_counter()
    v_host = np.asarray(v)
    mvps = np.asarray(r.mvps)
    vh = np.concatenate([v_host, np.ones((v_host.shape[0], 1), np.float32)],
                        axis=1)
    v_ndc2 = np.einsum("cij,vj->cvi", mvps, vh)
    t_hostproj = time.perf_counter() - t0
    err = np.abs(v_ndc2 - v_ndc).max()

    t0 = time.perf_counter()
    bins, counts, occ = bin_triangles_host(v_ndc, topo.faces, r.res,
                                           margin=4.0)
    t_bin = time.perf_counter() - t0

    t0 = time.perf_counter()
    b_dev = jax.block_until_ready(jnp.asarray(bins))
    c_dev = jax.block_until_ready(jnp.asarray(counts))
    t_upload = time.perf_counter() - t0

    print(json.dumps({
        "fetch_ndc_s": round(t_fetch, 3),
        "host_proj_s": round(t_hostproj, 3),
        "host_proj_err": float(err),
        "bin_host_s": round(t_bin, 3),
        "upload_bins_s": round(t_upload, 3),
        "bins_mb": round(bins.nbytes / 1e6, 1),
        "occ": int(occ), "cap": int(bins.shape[-1]),
    }), flush=True)

    # steady per-step rate through the driver with rebinning disabled
    from largesteps_tpu.driver import optimize_shape
    p = {"steps": 24, "step_size": 0.05, "lambda": 19.0, "boost": 3,
         "solver": "Cholesky", "rebin_every": 0, "nan_check_every": 0}
    res = optimize_shape(scene, p)
    prof = res["prof"]
    post = res["wall_time"] - prof["first_step_s"]
    print(json.dumps({
        "steps": res["iters"],
        "first_step_s": round(prof["first_step_s"], 2),
        "post_first_loop_s": round(post, 2),
        "steady_it_per_s": round((res["iters"] - 1) / max(post, 1e-9), 3),
    }), flush=True)


if __name__ == "__main__":
    main()
