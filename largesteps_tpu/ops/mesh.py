"""Host+device mesh utilities.

Reference semantics: scripts/geometry.py (remove_duplicates:3-11,
average_edge_length:13-33, massmatrix_voronoi:35-89, safe_acos:113-114).
Dynamic-output-shape ops (vertex welding) run on host with numpy; everything
per-iteration differentiable runs as jnp gathers/segment ops.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "remove_duplicates",
    "average_edge_length",
    "massmatrix_voronoi",
    "safe_acos",
]


def remove_duplicates(v: np.ndarray, f: np.ndarray):
    """Weld duplicated vertices (UV/seam splits) — host-side.

    Returns (unique_verts, new_faces, duplicate_idx) where
    ``verts == unique_verts[duplicate_idx]``, matching
    scripts/geometry.py:3-11 (torch.unique(dim=0) sorts rows, as does
    np.unique(axis=0)).  Output shape is data-dependent ⇒ numpy, executed
    once per topology epoch.
    """
    v = np.asarray(v)
    f = np.asarray(f)
    unique_verts, inverse = np.unique(v, axis=0, return_inverse=True)
    inverse = inverse.reshape(-1).astype(np.int32)
    new_faces = inverse[f.astype(np.int64)]
    return unique_verts, new_faces.astype(np.int32), inverse


def safe_acos(x: jax.Array) -> jax.Array:
    """acos clamped STRICTLY inside the valid domain
    (scripts/geometry.py:113-114 clamps to exactly ±1, where acos' = ∓inf —
    collinear corner edges of a sliver face then emit one inf gradient
    component, which AdamUniform's global-max second-moment denominator
    turns into NaN for EVERY parameter; observed killing a 2170-step
    nefertiti run at step 151).  The 1e-6 margin bounds the backward at
    ~707 and biases the angle by ≤1.4e-3 rad."""
    return jnp.arccos(jnp.clip(x, -1.0 + 1e-6, 1.0 - 1e-6))


def average_edge_length(verts, faces) -> jax.Array:
    """Mean length of all face sides (scripts/geometry.py:13-33)."""
    fv = jnp.asarray(verts)[jnp.asarray(faces)]
    v0, v1, v2 = fv[:, 0], fv[:, 1], fv[:, 2]
    A = jnp.linalg.norm(v1 - v2, axis=1)
    B = jnp.linalg.norm(v0 - v2, axis=1)
    C = jnp.linalg.norm(v0 - v1, axis=1)
    return (A + B + C).sum() / (3 * faces.shape[0])


def massmatrix_voronoi(verts: jax.Array, faces) -> jax.Array:
    """Voronoi cell area around each vertex with the obtuse-triangle
    correction (scripts/geometry.py:35-89).  Returns (V,) areas."""
    faces_np = np.asarray(faces)
    fidx = jnp.asarray(faces_np)
    fv = verts[fidx]
    l0 = jnp.linalg.norm(fv[:, 1] - fv[:, 2], axis=1)
    l1 = jnp.linalg.norm(fv[:, 2] - fv[:, 0], axis=1)
    l2 = jnp.linalg.norm(fv[:, 0] - fv[:, 1], axis=1)
    l = jnp.stack([l0, l1, l2], axis=1)

    cos0 = (l1**2 + l2**2 - l0**2) / (2 * l1 * l2)
    cos1 = (l2**2 + l0**2 - l1**2) / (2 * l2 * l0)
    cos2 = (l0**2 + l1**2 - l2**2) / (2 * l0 * l1)
    cosines = jnp.stack([cos0, cos1, cos2], axis=1)

    barycentric = cosines * l
    barycentric = barycentric / barycentric.sum(axis=1, keepdims=True)

    areas = 0.25 * jnp.sqrt(
        jnp.clip((l0 + l1 + l2) * (l0 + l1 - l2) * (l0 - l1 + l2) * (-l0 + l1 + l2), 0.0, None)
    )
    tri_areas = areas[:, None] * barycentric

    cell0 = 0.5 * (tri_areas[:, 1] + tri_areas[:, 2])
    cell1 = 0.5 * (tri_areas[:, 2] + tri_areas[:, 0])
    cell2 = 0.5 * (tri_areas[:, 0] + tri_areas[:, 1])
    cells = jnp.stack([cell0, cell1, cell2], axis=1)

    # obtuse corrections, applied in corner order like the reference
    for k in range(3):
        obtuse = cosines[:, k] < 0
        half = jnp.where(obtuse, 0.5 * areas, cells[:, k])
        quarter_a = jnp.where(obtuse, 0.25 * areas, cells[:, (k + 1) % 3])
        quarter_b = jnp.where(obtuse, 0.25 * areas, cells[:, (k + 2) % 3])
        cells = cells.at[:, k].set(half)
        cells = cells.at[:, (k + 1) % 3].set(quarter_a)
        cells = cells.at[:, (k + 2) % 3].set(quarter_b)

    flat = cells.reshape(-1)
    return jax.ops.segment_sum(flat, fidx.reshape(-1), num_segments=verts.shape[0])
