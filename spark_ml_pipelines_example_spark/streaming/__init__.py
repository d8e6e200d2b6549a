"""Structured Streaming twins of the batch streaming-semantics queries
(SURVEY §2.2 'Streaming' — engine-only surface; the batch forms in
``queries/streaming_batch.py`` are what the driver oracle-checks)."""
