"""Host-side utilities: checkpointing, video/json IO, logging."""
