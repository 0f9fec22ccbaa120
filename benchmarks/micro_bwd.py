"""Micro-benchmarks for the rasterizer backward: which half dominates —
the dense per-pixel VJP math or the scatter (segment_sum) into vertices?"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    C, H, W, V, F = 13, 256, 256, 2562, 5120
    key = jax.random.PRNGKey(0)
    ids = jax.random.randint(key, (C, H, W), 0, F)       # owning triangle
    fidx = jax.random.randint(key, (F, 3), 0, V)         # faces
    dt = jax.random.normal(key, (C, H, W, 3, 4), jnp.float32)
    vc = jax.random.normal(key, (C, V, 4), jnp.float32)
    g = jax.random.normal(key, (C, H, W, 2), jnp.float32)

    # scatter into vertices (current path): per-cam segment_sum over H*W*3
    @jax.jit
    def seg_vertices(dt, ids):
        def per_cam(d, i):
            fi = fidx[i]                                  # (H, W, 3)
            return jax.ops.segment_sum(
                d.reshape(-1, 4), fi.reshape(-1), num_segments=V)
        return jax.vmap(per_cam)(dt, ids)

    print(f"scatter pixels->verts (segsum {H*W*3} x {C}): "
          f"{timeit(seg_vertices, dt, ids):8.2f} ms", flush=True)

    # two-stage: pixels -> triangles (segsum by tri id), then tri -> verts
    @jax.jit
    def seg_triangles(dt, ids):
        def per_cam(d, i):
            per_tri = jax.ops.segment_sum(
                d.reshape(-1, 12), i.reshape(-1), num_segments=F)  # (F, 12)
            per_tri = per_tri.reshape(F, 3, 4)
            return jax.ops.segment_sum(
                per_tri.reshape(-1, 4), fidx.reshape(-1), num_segments=V)
        return jax.vmap(per_cam)(dt, ids)

    print(f"scatter pixels->tris->verts:                  "
          f"{timeit(seg_triangles, dt, ids):8.2f} ms", flush=True)

    # dense per-pixel vjp math alone (no scatter)
    from largesteps_tpu.render.raster import _pixel_uv_depth, pixel_grid
    px, py = pixel_grid(H, W)

    @jax.jit
    def vjp_math(vc, ids, g):
        def per_cam(vcc, i, gg):
            tri_clip = vcc[fidx[i]]                       # (H, W, 3, 4)

            def pixel_vjp(tc, x, y, du, dv):
                _, vjp = jax.vjp(
                    lambda t: _pixel_uv_depth(t, x, y)[:2], tc)
                (dtc,) = vjp((du, dv))
                return dtc

            return jax.vmap(jax.vmap(pixel_vjp))(
                tri_clip, px, py, gg[..., 0], gg[..., 1])
        return jax.vmap(per_cam)(vc, ids, g)

    print(f"dense per-pixel vjp math (incl tri gather):   "
          f"{timeit(vjp_math, vc, ids, g):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
