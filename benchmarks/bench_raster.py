"""Rasterizer microbenchmark on the real TPU: XLA scan path vs Pallas
tile-binned kernel, forward and forward+backward, Mpix/s."""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main(n_views=13, res=256, subdiv=4):
    from largesteps_tpu.render.raster import rasterize, interpolate
    from largesteps_tpu.render.pallas_raster import rasterize_pallas_fwd, check_bin_overflow
    from largesteps_tpu.render.camera import persp_proj, build_mvps, project
    from largesteps_tpu.io.synth import turntable_views
    from largesteps_tpu.ops import icosphere

    v, f = icosphere(subdiv)
    views = np.stack(turntable_views(n_views))
    mvps = build_mvps(persp_proj(45, 1.0, 0.1, 100.0), views)
    vc = project(jnp.asarray(v), jnp.asarray(mvps))
    fj = jnp.asarray(f)
    mpix = n_views * res * res / 1e6
    print(f"V={len(v)} F={len(f)} views={n_views} res={res} ({mpix:.2f} Mpix)")
    print("max bin occupancy:", check_bin_overflow(vc, fj, (res, res)))

    xla_fwd = jax.jit(lambda x: rasterize(x, fj, (res, res), 256))
    t = timeit(xla_fwd, vc)
    print(f"XLA fwd: {t*1e3:.2f} ms  {mpix/t:.1f} Mpix/s")

    pal_fwd = jax.jit(lambda x: rasterize_pallas_fwd(x, fj, (res, res)))
    t = timeit(pal_fwd, vc)
    print(f"Pallas fwd: {t*1e3:.2f} ms  {mpix/t:.1f} Mpix/s")

    attr = jnp.ones((len(v), 4))

    def loss_xla(x):
        r = rasterize(x, fj, (res, res), 256)
        return interpolate(attr, r, fj).mean()

    g_xla = jax.jit(jax.grad(loss_xla))
    t = timeit(g_xla, vc)
    print(f"XLA fwd+bwd: {t*1e3:.2f} ms  {mpix/t:.1f} Mpix/s")

    # agreement check on TPU
    a = np.asarray(xla_fwd(vc))
    b = np.asarray(pal_fwd(vc))
    match = (a[..., 3] == b[..., 3]).mean()
    print("tpu id match:", match)


if __name__ == "__main__":
    main()
