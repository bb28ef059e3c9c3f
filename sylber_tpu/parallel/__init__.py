"""Device mesh and sharding rules (DP/TP)."""
