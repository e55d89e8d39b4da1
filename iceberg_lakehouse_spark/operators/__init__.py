"""Lakehouse operators over LakeTable (SURVEY §2.3, §2.10-§2.12)."""
