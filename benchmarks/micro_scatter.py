"""Microbenchmark: segment-reduction strategies for the rasterizer backward.

The backward pass must reduce ~852k per-pixel moment rows (13 cams x 256^2)
keyed by triangle id into ~5k per-face accumulators.  Candidates:
  a) jax.ops.segment_sum (XLA scatter-add)
  b) sort-based: sort_key_val + cumsum + boundary gather
  c) Pallas one-hot matmul on the MXU (construct one-hot in VMEM, never HBM)
Also times the binning argsort and a top_k alternative.
"""
import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def onehot_matmul_kernel(ids_ref, m_ref, out_ref, *, px_chunk, f_chunk, ch):
    fi = pl.program_id(1)
    pi = pl.program_id(2)
    ids = ids_ref[0]                                   # (px_chunk,) int32 rows? keep 2d
    base = fi * f_chunk
    fid = jax.lax.broadcasted_iota(jnp.int32, (px_chunk, f_chunk), 1) + base
    onehot = (ids_ref[0][:, None] == fid).astype(jnp.float32)   # (px, f)
    m = m_ref[0]                                        # (px, ch)
    part = jax.lax.dot_general(
        onehot, m, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                                   # (f, ch)
    @pl.when(pi == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)
    out_ref[...] += part


@partial(jax.jit, static_argnames=("n_faces", "px_chunk", "f_chunk"))
def onehot_scatter(ids, m, n_faces, px_chunk=4096, f_chunk=512):
    """ids (C, P) int32, m (C, P, ch) -> (n_faces, ch) summed over cams."""
    C, P = ids.shape
    ch = m.shape[-1]
    n_f = (n_faces + f_chunk - 1) // f_chunk * f_chunk
    n_p = (P + px_chunk - 1) // px_chunk * px_chunk
    kernel = partial(onehot_matmul_kernel, px_chunk=px_chunk, f_chunk=f_chunk, ch=ch)
    out = pl.pallas_call(
        kernel,
        grid=(C, n_f // f_chunk, n_p // px_chunk),
        in_specs=[
            pl.BlockSpec((1, px_chunk), lambda c, f, p: (c, p)),
            pl.BlockSpec((1, px_chunk, ch), lambda c, f, p: (c, p, 0)),
        ],
        out_specs=pl.BlockSpec((1, f_chunk, ch), lambda c, f, p: (c, f, 0)),
        out_shape=jax.ShapeDtypeStruct((C, n_f, ch), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(ids, m)
    return out.sum(0)[:n_faces]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cams", type=int, default=13)
    ap.add_argument("--px", type=int, default=65536)
    ap.add_argument("--faces", type=int, default=5121)
    ap.add_argument("--ch", type=int, default=32)
    args = ap.parse_args()
    C, P, F, ch = args.cams, args.px, args.faces, args.ch
    print(f"backend={jax.default_backend()} C={C} P={P} F={F} ch={ch}", flush=True)

    key = jax.random.PRNGKey(0)
    ids = jax.random.randint(key, (C, P), 0, F, jnp.int32)
    m = jax.random.normal(key, (C, P, ch), jnp.float32)

    # a) segment_sum
    f_seg = jax.jit(lambda i, mm: jax.ops.segment_sum(
        mm.reshape(-1, ch), i.reshape(-1), num_segments=F))
    r_seg = f_seg(ids, m)
    print(f"segment_sum:      {timeit(f_seg, ids, m):8.2f} ms", flush=True)

    # b) sort-based
    def sort_based(i, mm):
        i = i.reshape(-1)
        mm = mm.reshape(-1, ch)
        order = jnp.argsort(i)
        si = i[order]
        sm = mm[order]
        cs = jnp.cumsum(sm, axis=0)
        cs = jnp.concatenate([jnp.zeros((1, ch), cs.dtype), cs], axis=0)
        bounds = jnp.searchsorted(si, jnp.arange(F + 1))
        return cs[bounds[1:]] - cs[bounds[:-1]]
    f_sort = jax.jit(sort_based)
    r_sort = f_sort(ids, m)
    print(f"sort+cumsum:      {timeit(f_sort, ids, m):8.2f} ms", flush=True)

    # c) pallas one-hot matmul
    f_oh = jax.jit(lambda i, mm: onehot_scatter(i, mm, F))
    r_oh = f_oh(ids, m)
    print(f"pallas onehot:    {timeit(f_oh, ids, m):8.2f} ms", flush=True)

    err = jnp.abs(r_oh - r_seg).max() / (jnp.abs(r_seg).max() + 1e-9)
    err2 = jnp.abs(r_sort - r_seg).max() / (jnp.abs(r_seg).max() + 1e-9)
    print(f"rel err onehot={err:.2e} sort={err2:.2e}", flush=True)

    # binning: argsort vs top_k over (tiles, F) bool
    T = 256
    cap = 192
    ov = jax.random.bernoulli(key, 0.03, (C, T, F - 1))
    f_as = jax.jit(lambda o: jnp.argsort(~o, axis=-1, stable=True)[..., :cap])
    print(f"bin argsort:      {timeit(f_as, ov):8.2f} ms", flush=True)
    f_tk = jax.jit(lambda o: jax.lax.top_k(
        jnp.where(o, -jnp.arange(F - 1, dtype=jnp.int32),
                  jnp.int32(-2 ** 30)), cap)[0])
    print(f"bin top_k:        {timeit(f_tk, ov):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
