"""largesteps_tpu — TPU-native inverse rendering of geometry.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
rgl-epfl/large-steps-pytorch ("Large Steps in Inverse Rendering of
Geometry", Nicolet, Jacobson, Jakob; SIGGRAPH Asia 2021): Laplacian
differential parameterization with a cached differentiable sparse solve,
AdamUniform optimization, a differentiable tile-based rasterizer
(rasterize → interpolate → antialias), spherical-harmonics shading,
Botsch-Kobbelt remeshing, and SPMD sharding over TPU device meshes.
"""

__version__ = "0.1.0"

from .core.geometry import compute_matrix, laplacian_uniform, laplacian_cot
from .core.parameterize import to_differential, from_differential
from .core.optimize import adam_uniform, adam
from .core.sparse import SparseCOO

__all__ = [
    "compute_matrix",
    "laplacian_uniform",
    "laplacian_cot",
    "to_differential",
    "from_differential",
    "adam_uniform",
    "adam",
    "SparseCOO",
]
