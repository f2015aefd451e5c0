"""COLMAP database / sparse-model IO. Counterpart of reference glomap/io/."""
