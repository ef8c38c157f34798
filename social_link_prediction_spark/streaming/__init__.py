"""Structured Streaming layer. The reference is batch-only (SURVEY.md
§2.10); this module exposes the engine's continuous-ingest analog of
its paginated extraction plus streaming variants of the event
aggregations. Every transformation is identical in batch and stream —
the same function body runs on read() and readStream() frames."""
