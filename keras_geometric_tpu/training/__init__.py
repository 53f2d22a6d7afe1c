"""Training tier: train state, jitted steps, checkpointing, metrics."""
