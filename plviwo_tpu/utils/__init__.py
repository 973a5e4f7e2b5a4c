"""L6 utilities: logging, timing, state recording, checkpointing."""
