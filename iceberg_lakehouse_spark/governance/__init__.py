"""Governance / data-management layer (SURVEY §2.11, §2.14, §2.10).

Engine-independent semantics stored as JSON side-stores (the
reference's ~15 files under ~/.lakehouse, SURVEY §1.1) + DataFrame
checks where data is touched. Every store takes an explicit
``store_path`` so tests isolate cheaply (reference conftest pattern).
"""
