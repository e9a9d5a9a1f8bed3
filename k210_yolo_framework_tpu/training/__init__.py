"""Training stack: loss, metrics, train step, pruning, checkpointing."""
