from .optimize_shape import optimize_shape, default_params
from .checkpoint import save_checkpoint, load_checkpoint
