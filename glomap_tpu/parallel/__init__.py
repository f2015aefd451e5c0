"""Multi-chip execution: device meshes + sharded solvers (SPMD over
observations with XLA collectives over ICI)."""
