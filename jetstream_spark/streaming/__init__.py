"""Structured Streaming: the standing ingest pipeline and live subscriptions."""
