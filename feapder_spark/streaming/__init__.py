"""Structured Streaming feeds (SURVEY §2.10 — engine-introduced; the
reference's loop is a 1 s polling loop, not event-time streaming)."""
