"""Cameras: perspective projection and model-view-projection stacks.

Reference semantics: scripts/render.py:89-111 (persp_proj, including the
negated-x first row matching the Mitsuba camera convention) and
render.py:143-147 (mvps = proj @ view per sensor).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["persp_proj", "build_mvps", "rotation_matrix", "translation_matrix"]


def persp_proj(fov_x: float = 45.0, ar: float = 1.0, near: float = 0.1,
               far: float = 100.0) -> np.ndarray:
    """OpenGL-style projection from horizontal FoV (degrees) and aspect w/h.

    Matches scripts/render.py:89-111: x negated (Mitsuba convention), y
    scaled by aspect, depth mapped with [near, far], w' = +z.
    """
    fov_rad = np.deg2rad(fov_x)
    return np.array(
        [
            [-1.0 / np.tan(fov_rad / 2.0), 0, 0, 0],
            [0, ar / np.tan(fov_rad / 2.0), 0, 0],
            [0, 0, -(near + far) / (near - far), 2 * far * near / (near - far)],
            [0, 0, 1, 0],
        ],
        dtype=np.float32,
    )


def build_mvps(proj: np.ndarray, view_mats: np.ndarray) -> np.ndarray:
    """(C, 4, 4) MVP stack = proj @ view per camera (render.py:146-147)."""
    return np.einsum("ij,cjk->cik", np.asarray(proj), np.asarray(view_mats)).astype(np.float32)


def rotation_matrix(axis: str, angle_deg: float) -> np.ndarray:
    """Homogeneous rotation about x|y|z (scripts/load_xml.py:9-29)."""
    assert axis in "xyz", "Invalid axis, expected x, y or z"
    mat = np.eye(4, dtype=np.float64)
    theta = np.deg2rad(angle_deg)
    idx = "xyz".find(axis)
    i1, i2 = (idx + 1) % 3, (idx + 2) % 3
    mat[i1, i1] = np.cos(theta)
    mat[i2, i2] = np.cos(theta)
    mat[i1, i2] = -np.sin(theta)
    mat[i2, i1] = np.sin(theta)
    return mat


def translation_matrix(tr) -> np.ndarray:
    """Homogeneous translation (scripts/load_xml.py:31-43)."""
    mat = np.eye(4, dtype=np.float64)
    mat[:3, 3] = np.asarray(tr, dtype=np.float64)
    return mat


def project(verts: jnp.ndarray, mvps: jnp.ndarray) -> jnp.ndarray:
    """Batched clip-space transform: (V,3) × (C,4,4) → (C,V,4).

    One fused MXU matmul over all cameras (render.py:204-205 pads to
    homogeneous then matmuls the transposed MVP stack).
    """
    v_hom = jnp.concatenate([verts, jnp.ones_like(verts[:, :1])], axis=1)
    return jnp.einsum("cij,vj->cvi", jnp.asarray(mvps), v_hom)
