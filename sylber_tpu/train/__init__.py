"""Training: distillation steps, EMA, thresholder, LR, loop."""
