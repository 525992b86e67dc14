"""Training runtime: optimizers, schedulers, trainer, checkpointing."""
