"""Structured Streaming operators (event-time windows, stateful ops)."""
