"""Event-driven incremental indexing (the reference's events/ subsystem
re-expressed as batch replay + Structured Streaming)."""
