"""Incremental / streaming ingestion.

The reference has NO streaming operators (SURVEY.md §2.10) — its
temporality is batch snapshotting. What this package adds is the one
streaming-shaped capability the north_rule wants: incremental,
resumable ingestion of new transcript turns into the mention table,
via Structured Streaming with `availableNow` micro-batching.
"""
