"""Compute ops: segmentation scan, attention dispatch, Pallas kernels."""
