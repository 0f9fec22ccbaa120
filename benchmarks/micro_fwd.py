"""Micro-benchmarks for forward render pieces: interpolate, AA fwd, argsort."""
import os, sys, time
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


C, H, W, V, F = 13, 256, 256, 2562, 5120
key = jax.random.PRNGKey(0)
rast = jnp.concatenate([
    jax.random.uniform(key, (C, H, W, 3)),
    jax.random.randint(key, (C, H, W, 1), 0, F).astype(jnp.float32),
], axis=-1)
attr = jax.random.normal(key, (V, 3), jnp.float32)
faces = jax.random.randint(key, (F, 3), 0, V)

from largesteps_tpu.render.raster import interpolate
interp = jax.jit(lambda a, r: interpolate(a, r, faces))
print(f"interpolate fwd:        {timeit(interp, attr, rast):8.2f} ms", flush=True)

interp_bwd = jax.jit(jax.grad(lambda a: interpolate(a, rast, faces).sum()))
print(f"interpolate fwd+bwd:    {timeit(interp_bwd, attr):8.2f} ms", flush=True)

mask = jax.random.bernoulli(key, 0.02, (C, H * (W - 1) + (H - 1) * W))
srt = jax.jit(lambda m: jax.vmap(lambda x: jnp.argsort(~x, stable=True))(m))
print(f"argsort 130k x13:       {timeit(srt, mask):8.2f} ms", flush=True)

# gather-heavy: faces[tri_id] per pixel
gath = jax.jit(lambda r: faces[r[..., 3].astype(jnp.int32) % F])
print(f"faces gather per pixel: {timeit(gath, rast):8.2f} ms", flush=True)

# attr[fidx] per pixel: (C,H,W,3,3)
def attr_gather(r):
    fi = faces[r[..., 3].astype(jnp.int32) % F]
    return attr[fi]
print(f"attr gather per pixel:  {timeit(jax.jit(attr_gather), rast):8.2f} ms", flush=True)
