"""Structured Streaming surface. The reference is batch-only (SURVEY.md
§2.11) and the north rule is snapshot-resumable batch; this package adds
the natural streaming demo over the events table (tumbling windows +
watermark) so the engine's streaming path is exercised and tested."""
