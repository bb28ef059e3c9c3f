"""Checkpoint IO: torch conversion, Orbax save/restore."""
