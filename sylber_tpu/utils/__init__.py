"""Utilities: audio IO, metrics, profiling, native bindings."""
