"""Face and angle-weighted vertex normals (differentiable).

Reference semantics: scripts/geometry.py:91-147.  The reference accumulates
face normals weighted by the corner angle via ``index_add_``; on TPU this is
a gather + ``segment_sum`` over the 3F face-corner contributions with static
shapes.

Note on parity: the reference normalizes the corner edge vectors by the
*global* Frobenius norm of the whole (3, F) tensor
(``d0 / torch.norm(d0)``, scripts/geometry.py:138-140), so its "angles" are
``acos(tiny) ≈ π/2`` almost everywhere — i.e. effectively uniform weighting.
We implement the mathematically intended per-corner angle weighting (the
quirk is documented in SURVEY.md; golden tests compare against our own
oracle).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .mesh import safe_acos

__all__ = ["compute_face_normals", "compute_vertex_normals"]


def compute_face_normals(verts: jax.Array, faces) -> jax.Array:
    """Unit face normals, (F, 3).  Reference: scripts/geometry.py:91-111
    (cross(v1−v0, v2−v0), normalized)."""
    fv = verts[jnp.asarray(np.asarray(faces))]
    c = jnp.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
    # rsqrt(‖c‖² + ε): a fully degenerate face (naive optimization at high
    # resolution collapses triangles) must yield a zero normal AND a finite
    # BACKWARD — jnp.linalg.norm's VJP is c/‖c‖ = 0/0 = NaN at exactly 0
    # even with +eps added outside, and one NaN component poisons every
    # parameter through AdamUniform's global max
    return c * jax.lax.rsqrt(jnp.sum(c * c, axis=1, keepdims=True) + 1e-20)


def compute_vertex_normals(verts: jax.Array, faces, face_normals: jax.Array) -> jax.Array:
    """Angle-weighted vertex normals, (V, 3).

    For each corner i of each face: weight = angle between the two edges
    leaving that corner; accumulate ``face_normal * weight`` into the corner
    vertex; normalize.  Reference: scripts/geometry.py:116-147.
    """
    faces_np = np.asarray(faces)
    fidx = jnp.asarray(faces_np)          # (F, 3)
    fv = verts[fidx]                       # (F, 3, 3)

    eps = 1e-20
    # rsqrt-based normalization everywhere: norm()'s VJP is NaN at exactly
    # zero (see compute_face_normals)
    unit = lambda a: a * jax.lax.rsqrt(
        jnp.sum(a * a, axis=1, keepdims=True) + eps)
    contributions = []
    for i in range(3):
        d0 = unit(fv[:, (i + 1) % 3] - fv[:, i])
        d1 = unit(fv[:, (i + 2) % 3] - fv[:, i])
        angle = safe_acos(jnp.sum(d0 * d1, axis=1))
        contributions.append(face_normals * angle[:, None])

    # corner i contributions go to vertex faces[:, i]
    ids = fidx.transpose().reshape(-1)                           # (3F,)
    contrib = jnp.concatenate(contributions, axis=0)             # (3F, 3)
    normals = jax.ops.segment_sum(contrib, ids, num_segments=verts.shape[0])
    return unit(normals)
