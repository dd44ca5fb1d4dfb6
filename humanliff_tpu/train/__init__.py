"""Training: optimizers/schedules, Stage-1 reconstruction, Stage-2 diffusion."""
