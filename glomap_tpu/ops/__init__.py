"""Device kernels (XLA + Pallas): camera models, epipolar scoring,
triangulation, RANSAC minimal solvers, Schur products, segment reductions."""
