"""Scalar/vectorized kernels: H3 math, geometry, text, vectors."""
