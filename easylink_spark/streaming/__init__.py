"""Batch-incremental (cascading) drivers; the reference has no true
streaming (SURVEY.md §2.10) — its incremental semantics are the LoopStep
cascade, reproduced here, plus an optional Structured Streaming foreachBatch
wrapper driving the same operators."""
