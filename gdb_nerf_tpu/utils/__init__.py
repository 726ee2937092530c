"""Host-side utilities: file IO, checkpointing, logging."""
