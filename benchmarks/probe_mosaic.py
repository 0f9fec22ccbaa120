"""Probe Mosaic support + cost for the kernel-v2 primitives on the chip:

  1. (32,128) -> (1,4096) reshape (sublanes into lane tiles) and back
  2. (cap, 4096) broadcast-compare one-hot build
  3. fields = recT (32, cap) @ oh (cap, 4096)       [owner gather]
  4. S = dot_general(oh, G(18,4096), contract lanes) [slot reduction]

Compares against a numpy oracle and times the kernel.
"""
import functools
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CAP = 256
P = 32 * 128


def kernel(slot_ref, recT_ref, g0_ref, fields_ref, S_ref):
    slot_flat = slot_ref[...].reshape(1, P)                      # probe 1
    iota = jax.lax.broadcasted_iota(jnp.int32, (CAP, P), 0).astype(jnp.float32)
    oh = (iota == slot_flat).astype(jnp.float32)                 # probe 2
    fields = jax.lax.dot_general(                                # probe 3
        recT_ref[...], oh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)                     # (32, P)
    fields_ref[...] = fields
    g = jnp.concatenate(
        [g0_ref[...].reshape(1, P) * (i + 1.0) for i in range(18)], axis=0)
    S_ref[...] = jax.lax.dot_general(                            # probe 4
        oh, g, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)                     # (CAP, 18)


def main():
    rng = np.random.default_rng(0)
    slot = rng.integers(-1, CAP, (32, 128)).astype(np.float32)
    recT = rng.standard_normal((32, CAP)).astype(np.float32)
    g0 = rng.standard_normal((32, 128)).astype(np.float32)

    fn = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((32, P), jnp.float32),
                   jax.ShapeDtypeStruct((CAP, 18), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )
    fields, S = jax.jit(fn)(jnp.asarray(slot), jnp.asarray(recT), jnp.asarray(g0))
    fields, S = np.asarray(fields), np.asarray(S)

    # oracle
    sf = slot.reshape(-1)
    oh = (np.arange(CAP)[:, None] == sf[None, :]).astype(np.float32)
    fields_o = recT @ oh
    g = np.stack([g0.reshape(-1) * (i + 1.0) for i in range(18)], axis=0)
    S_o = oh @ g.T
    print("fields max err:", np.abs(fields - fields_o).max())
    print("S max err:", np.abs(S - S_o).max())

    # timing: chain 50 calls
    @jax.jit
    def chain(s):
        def body(i, s_):
            f_, S_ = fn(s_, jnp.asarray(recT), jnp.asarray(g0))
            return s_ + 0.0 * f_[0, 0]
        return jax.lax.fori_loop(0, 200, body, s)

    x = jnp.asarray(slot)
    np.asarray(chain(x))
    t0 = time.perf_counter()
    np.asarray(chain(x))
    dt = (time.perf_counter() - t0) / 200
    print(f"per-call: {dt*1e6:.1f} us  (one tile's phaseA+C at cap={CAP})")


if __name__ == "__main__":
    main()
