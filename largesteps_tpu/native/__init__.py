"""Native C++ components (sparse Cholesky, remesher, Hausdorff)."""
