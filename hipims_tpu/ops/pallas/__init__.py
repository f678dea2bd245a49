"""Pallas TPU kernels for the hot per-step stencils."""
