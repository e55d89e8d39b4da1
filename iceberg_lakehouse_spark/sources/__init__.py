"""Import/export connectors and table lifecycle sources (SURVEY §2.1)."""
