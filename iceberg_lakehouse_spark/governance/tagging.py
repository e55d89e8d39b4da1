"""Tags, bookmarks, descriptions, search + catalog enrichment
(SURVEY G6/G7, reference tagging.py:40-254, catalog_metadata.py)."""

from __future__ import annotations

from .stores import JsonStore

CLASSIFICATIONS = {"pii", "financial", "public", "internal", "confidential"}


class TagManager:
    def __init__(self, store_path: str):
        self.store = JsonStore(store_path, {})

    def _entry(self, data: dict, table: str) -> dict:
        return data.setdefault(
            table, {"tags": [], "description": None, "bookmarked": False}
        )

    def add_tag(self, table: str, tag: str) -> list[str]:
        data = self.store.load()
        e = self._entry(data, table)
        tag = tag.lower()
        if tag not in e["tags"]:
            e["tags"].append(tag)
        self.store.save(data)
        return e["tags"]

    def remove_tag(self, table: str, tag: str) -> list[str]:
        data = self.store.load()
        e = self._entry(data, table)
        e["tags"] = [t for t in e["tags"] if t != tag.lower()]
        self.store.save(data)
        return e["tags"]

    def set_description(self, table: str, description: str) -> None:
        data = self.store.load()
        self._entry(data, table)["description"] = description
        self.store.save(data)

    def bookmark(self, table: str, value: bool = True) -> None:
        data = self.store.load()
        self._entry(data, table)["bookmarked"] = value
        self.store.save(data)

    def info(self, table: str) -> dict:
        return self.store.load().get(
            table, {"tags": [], "description": None, "bookmarked": False}
        )

    def bookmarks(self) -> list[str]:
        return sorted(t for t, e in self.store.load().items() if e.get("bookmarked"))

    def search(self, term: str, catalog_tables: list[str] | None = None) -> list[dict]:
        """Across name, tags, description + catalog names (tagging.py:200-254)."""
        term = term.lower()
        data = self.store.load()
        hits = {}
        for t, e in data.items():
            if (
                term in t.lower()
                or any(term in tag for tag in e.get("tags", []))
                or (e.get("description") and term in e["description"].lower())
            ):
                hits[t] = {"table": t, **e}
        for t in catalog_tables or []:
            if term in t.lower() and t not in hits:
                hits[t] = {"table": t, "tags": [], "description": None, "bookmarked": False}
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
