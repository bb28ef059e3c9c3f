"""Flow matching: CFM loss, ODE samplers, quantizers, k-means."""
