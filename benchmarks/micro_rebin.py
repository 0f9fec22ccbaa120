"""Isolate the device-rebin cost at 163k: the full jitted rebin fn and its
components (vmapped argsort, bins gather, fslots inverse)."""
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=5, warmup=1):
    fs = jax.jit(lambda *a: sum(jnp.sum(o.astype(jnp.float32))
                                for o in jax.tree.leaves(fn(*a))))
    for _ in range(warmup):
        out = fs(*args)
    float(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fs(*args)
    float(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    from largesteps_tpu.io.synth import make_scene
    from largesteps_tpu.render.renderer import Renderer, Topology
    from largesteps_tpu.render.camera import project
    from largesteps_tpu.render import pallas_core as pc

    scene = make_scene(source=("icosphere", 7), target=("gourd", 7),
                       n_views=13, res=256)
    r = Renderer(scene, shading=True, boost=3)
    v = jnp.asarray(scene["mesh-source"]["vertices"])
    f = scene["mesh-source"]["faces"]
    topo = Topology(f)
    v_ndc = jax.block_until_ready(jax.jit(
        lambda vv: project(vv, r.mvps))(v))
    cap = 52992

    full = lambda vn: pc.bin_triangles_device(vn, topo.faces, r.res, cap,
                                              margin=4.0)
    print(f"bin_device full:   {timeit(full, v_ndc):8.1f} ms", flush=True)

    F = topo.n_faces
    K = 4
    keys = jnp.asarray(
        np.random.default_rng(0).integers(0, 16 * 4096, (13, K * F),
                                          dtype=np.int32))
    srt = lambda k: jax.vmap(jnp.argsort)(k)
    print(f"vmapped argsort:   {timeit(srt, keys):8.1f} ms", flush=True)
    srt1 = lambda k: jnp.argsort(k.reshape(-1))
    print(f"flat argsort 17M:  {timeit(srt1, keys):8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
