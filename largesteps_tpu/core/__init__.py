from .sparse import SparseCOO, CooStructure, from_coo, coo_matvec
from .geometry import compute_matrix, laplacian_uniform, laplacian_cot
from .parameterize import to_differential, from_differential, get_solver, clear_cache
from .solvers import (CholeskySolver, CholeskyHostSolver,
                      ConjugateGradientSolver, cg_solve, solve)
from .optimize import adam_uniform, adam, AdamUniformState
