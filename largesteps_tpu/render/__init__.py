from .camera import persp_proj, build_mvps, project, rotation_matrix, translation_matrix
from .sh import SphericalHarmonics, sh_matrices, sh_eval
from .texture import texture_bilinear
from .raster import rasterize, interpolate, pixel_grid
from .antialias import antialias, face_adjacency
from .renderer import Renderer, Topology, render_backgrounds
