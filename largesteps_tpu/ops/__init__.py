from .mesh import remove_duplicates, average_edge_length, massmatrix_voronoi, safe_acos
from .normals import compute_face_normals, compute_vertex_normals
from .shapes import icosphere, torus, gourd, supershape
