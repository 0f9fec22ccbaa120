"""Checkpoint / resume.

The reference has no checkpointing (SURVEY §5: a crash loses the run).
Here: (u, tr, optimizer moments, mesh-of-the-epoch, remesh cursor, step
counter) round-trip through a single ``.npz`` — cheap, host-side, and
enough to resume an ``optimize_shape`` run mid-schedule.  Factorizations are
NOT checkpointed: they are deterministic functions of (mesh, λ) and are
rebuilt on load (same policy as the reference's per-epoch cache).
"""
from __future__ import annotations

import json

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["save_pytree", "load_pytree", "save_checkpoint", "load_checkpoint"]


def save_pytree(tree) -> dict:
    """Flatten a pytree of arrays into {leaf_i: np.ndarray} dict."""
    leaves = jax.tree_util.tree_leaves(tree)
    return {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}


def load_pytree(arrays: dict, like):
    """Rebuild a pytree with ``like``'s structure from save_pytree output."""
    treedef = jax.tree_util.tree_structure(like)
    n = treedef.num_leaves
    leaves = [jnp.asarray(arrays[f"leaf_{i}"]) for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(path, *, theta, opt_state, v_src, f_src, step,
                    step_size, remesh_schedule=(), extras=None):
    """Write one self-contained resume point."""
    payload = {}
    for k, v in save_pytree(theta).items():
        payload[f"theta_{k}"] = v
    for k, v in save_pytree(opt_state).items():
        payload[f"opt_{k}"] = v
    payload["v_src"] = np.asarray(v_src)
    payload["f_src"] = np.asarray(f_src)
    meta = {
        "step": int(step),
        "step_size": float(step_size),
        "remesh_schedule": list(int(x) for x in remesh_schedule),
        "extras": extras or {},
    }
    payload["meta_json"] = np.frombuffer(json.dumps(meta).encode(), np.uint8)
    np.savez(path, **payload)


def load_checkpoint(path, theta_like=None, opt_state_like=None):
    """Read a checkpoint.  If ``*_like`` pytrees are given, theta/opt_state
    are unflattened into their structure; otherwise raw dicts are returned."""
    data = np.load(path)
    meta = json.loads(bytes(data["meta_json"]).decode())
    theta_arrays = {k[len("theta_"):]: data[k] for k in data.files if k.startswith("theta_")}
    opt_arrays = {k[len("opt_"):]: data[k] for k in data.files if k.startswith("opt_")}
    out = {
        "v_src": data["v_src"],
        "f_src": data["f_src"],
        "meta": meta,
    }
    out["theta"] = load_pytree(theta_arrays, theta_like) if theta_like is not None else theta_arrays
    out["opt_state"] = (
        load_pytree(opt_arrays, opt_state_like) if opt_state_like is not None else opt_arrays
    )
    return out
