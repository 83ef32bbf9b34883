"""Engine: optimizers, schedulers, train loop, checkpointing."""
