"""Microbenchmark at nefertiti scale: the chain+scatter stage's two halves
(slot→face segment_sum of 848k×18 unsorted entries into 327k faces, and the
incidence gather face→vertex), plus a presorted-permutation variant of the
segment_sum (gather by a rebin-time argsort, then indices_are_sorted=True).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=10, warmup=2):
    fs = jax.jit(lambda *a: sum(jnp.sum(o) for o in jax.tree.leaves(fn(*a))))
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
    rng = np.random.default_rng(0)
    F = 327_680
    V = 163_842
    S = 16 * 52992            # slots per camera (one camera at a time)
    Q = 18
    ids_np = rng.integers(0, F + 1, size=S, dtype=np.int32)
    ids = jnp.asarray(ids_np)
    table = jnp.asarray(rng.standard_normal((S, Q)).astype(np.float32))

    seg = lambda t, i: jax.ops.segment_sum(t, i, num_segments=F + 1)
    print(f"segsum unsorted:   {timeit(seg, table, ids):8.2f} ms", flush=True)

    perm_np = np.argsort(ids_np, kind="stable").astype(np.int32)
    perm = jnp.asarray(perm_np)
    ids_sorted = jnp.asarray(ids_np[perm_np])

    def seg_sorted(t, p, i_s):
        return jax.ops.segment_sum(t[p], i_s, num_segments=F + 1,
                                   indices_are_sorted=True)
    print(f"gather+segsorted:  {timeit(seg_sorted, table, perm, ids_sorted):8.2f} ms",
          flush=True)

    gather_only = lambda t, p: t[p]
    print(f"  gather alone:    {timeit(gather_only, table, perm):8.2f} ms",
          flush=True)

    # incidence gather stage (face→vertex): (V, K) rows from (F·3, 6)
    K = 7
    idx = jnp.asarray(rng.integers(0, (F + 1) * 3, size=(V, K)))
    per_corner = jnp.asarray(
        rng.standard_normal(((F + 1) * 3, 6)).astype(np.float32))
    take = lambda d, i: jnp.take(d, i.reshape(-1), axis=0).reshape(V, K, 6).sum(axis=1)
    print(f"incidence take:    {timeit(take, per_corner, idx):8.2f} ms",
          flush=True)

    # one-sort-for-all-cameras scale check: argsort 848k keys on device
    srt = lambda i: jnp.argsort(i)
    print(f"argsort 848k:      {timeit(srt, ids):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
