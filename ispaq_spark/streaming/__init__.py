"""Structured Streaming variants of the batch pipeline (SURVEY.md §2.8:
the reference is strictly daily batch; its day loop is micro-batch-shaped,
so the streaming build is window(warc_ts, '1 day') + watermark)."""
