"""Tags, bookmarks, descriptions, search + catalog enrichment
(SURVEY G6/G7, reference tagging.py:40-269, catalog_metadata.py).

Bare table names normalize to the ``default`` namespace like the
catalog does; tags are lowercased, deduped, and kept sorted; every
mutation stamps ``updated_at`` on the table's entry."""

from __future__ import annotations

from datetime import datetime, timezone

from .stores import JsonStore

CLASSIFICATIONS = {"pii", "financial", "public", "internal", "confidential"}


def _normalize(name: str) -> str:
    return name if "." in name else f"default.{name}"


class TagManager:
    def __init__(self, store_path: str):
        self.store = JsonStore(store_path, {})

    def _entry(self, data: dict, table: str) -> dict:
        e = data.setdefault(
            _normalize(table), {"tags": [], "description": "", "bookmarked": False}
        )
        e["updated_at"] = datetime.now(timezone.utc).isoformat()
        return e

    def tag(self, table: str, tags: list[str]) -> dict:
        """Add tags (lowercased, deduped, sorted; blank tags ignored) —
        reference tag_table (tagging.py:40-72)."""
        data = self.store.load()
        e = self._entry(data, table)
        clean = [t.strip().lower() for t in tags if t and t.strip()]
        e["tags"] = sorted(set(e["tags"]) | set(clean))
        self.store.save(data)
        return {"table": _normalize(table), "tags": e["tags"]}

    def untag(self, table: str, tags: list[str]) -> dict:
        """Remove tags; unknown tags are a no-op (reference untag_table)."""
        data = self.store.load()
        e = self._entry(data, table)
        drop = {t.strip().lower() for t in tags}
        e["tags"] = [t for t in e["tags"] if t not in drop]
        self.store.save(data)
        return {"table": _normalize(table), "tags": e["tags"]}

    def add_tag(self, table: str, tag: str) -> list[str]:
        return self.tag(table, [tag])["tags"]

    def remove_tag(self, table: str, tag: str) -> list[str]:
        return self.untag(table, [tag])["tags"]

    def get_tags(self, table: str) -> list[str]:
        return self.store.load().get(_normalize(table), {}).get("tags", [])

    def search_by_tag(self, tag: str) -> list[str]:
        """Exact-tag lookup → sorted table names (reference
        search_by_tag, tagging.py:99-118)."""
        tag = tag.lower()
        return sorted(
            t for t, e in self.store.load().items() if tag in e.get("tags", [])
        )

    def set_description(self, table: str, description: str) -> None:
        data = self.store.load()
        self._entry(data, table)["description"] = description
        self.store.save(data)

    def get_description(self, table: str) -> str:
        """Empty string (not None) for an undescribed table."""
        return (
            self.store.load().get(_normalize(table), {}).get("description") or ""
        )

    def bookmark(self, table: str, value: bool = True) -> dict:
        data = self.store.load()
        self._entry(data, table)["bookmarked"] = value
        self.store.save(data)
        verb = "bookmarked" if value else "unbookmarked"
        return {
            "table": _normalize(table),
            "message": f"{verb.capitalize()} {_normalize(table)}",
        }

    def unbookmark(self, table: str) -> dict:
        return self.bookmark(table, value=False)

    def info(self, table: str) -> dict:
        return self.store.load().get(
            _normalize(table), {"tags": [], "description": "", "bookmarked": False}
        )

    def bookmarks(self) -> list[str]:
        return sorted(t for t, e in self.store.load().items() if e.get("bookmarked"))

    def search(self, term: str, catalog_tables: list[str] | None = None) -> list[dict]:
        """Across name, tags, description + catalog names
        (tagging.py:200-254); each hit carries its match_type(s) and
        bookmark status."""
        term = term.lower()
        data = self.store.load()
        hits = {}
        for t, e in data.items():
            match_types = []
            if term in t.lower():
                match_types.append("name")
            if any(term in tag for tag in e.get("tags", [])):
                match_types.append("tag")
            if e.get("description") and term in e["description"].lower():
                match_types.append("description")
            if match_types:
                hits[t] = {"table": t, **e, "match_type": match_types}
        for t in catalog_tables or []:
            t = _normalize(t)
            if term in t.lower() and t not in hits:
                hits[t] = {
                    "table": t,
                    "tags": [],
                    "description": "",
                    "bookmarked": False,
                    "match_type": ["name"],
                }
        return sorted(hits.values(), key=lambda d: d["table"])


class CatalogMetadata:
    """Column descriptions, classifications, business glossary (G7)."""

    def __init__(self, store_path: str):
        self.store = JsonStore(store_path, {"columns": {}, "glossary": {}})

    def set_column_description(self, table: str, column: str, description: str) -> None:
        data = self.store.load()
        data["columns"].setdefault(table, {}).setdefault(column, {})[
            "description"
        ] = description
        self.store.save(data)

    def classify_column(self, table: str, column: str, classification: str) -> None:
        if classification not in CLASSIFICATIONS:
            raise ValueError(
                f"invalid classification {classification!r}; one of {sorted(CLASSIFICATIONS)}"
            )
        data = self.store.load()
        data["columns"].setdefault(table, {}).setdefault(column, {})[
            "classification"
        ] = classification
        self.store.save(data)

    def column_info(self, table: str) -> dict:
        return self.store.load()["columns"].get(table, {})

    def pii_columns(self, table: str | None = None) -> list[dict]:
        data = self.store.load()["columns"]
        out = []
        for t, cols in data.items():
            if table and t != table:
                continue
            for c, meta in cols.items():
                if meta.get("classification") == "pii":
                    out.append({"table": t, "column": c})
        return out

    def add_glossary_term(
        self, term: str, definition: str, aliases: list[str] | None = None
    ) -> None:
        data = self.store.load()
        data["glossary"][term.lower()] = {
            "definition": definition,
            "aliases": [a.lower() for a in (aliases or [])],
        }
        self.store.save(data)

    def lookup_term(self, term: str) -> dict | None:
        g = self.store.load()["glossary"]
        term = term.lower()
        if term in g:
            return {"term": term, **g[term]}
        for t, e in g.items():
            if term in e.get("aliases", []):
                return {"term": t, **e}
        return None
