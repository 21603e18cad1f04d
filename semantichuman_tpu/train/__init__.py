"""Training: vectorized loss stack, jitted train/eval steps, epoch loop,
optimizer/schedule, checkpointing."""
