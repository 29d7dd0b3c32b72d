"""Training: jit train/eval steps, plateau LR schedule, checkpointed loop."""
