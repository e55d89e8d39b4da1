"""Structured Streaming over the events table (SURVEY §2.10 optional
extension — beyond the reference's batch-incremental model)."""
