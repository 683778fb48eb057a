"""Structured Streaming formalization of the reference's batch idioms.

The reference is strictly batch (SURVEY.md §2.9); this package provides the
streaming equivalents: availableNow incremental ingest, tumbling-window
aggregation with watermarks, and a foreachBatch keyed-upsert sink.
"""
