"""Training infrastructure: losses, optimizer schedules, the jitted +
sharded train step, and checkpointing."""
