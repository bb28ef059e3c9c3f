"""Pallas TPU kernels (flash attention)."""
