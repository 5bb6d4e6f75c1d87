"""The jetstream event engine: ATProto firehose events on Spark.

Pipeline (SURVEY.md §3.1):
  raw frames → normalize (S3-S9) → sequencer (S10/H1) → event log (S11)
  → replay/subscriptions (S14-S21).
"""
