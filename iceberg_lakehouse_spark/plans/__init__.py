"""Query lifecycle: engine façade, caching, advisor (SURVEY §3, §4)."""
