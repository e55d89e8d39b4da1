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
    """Column descriptions, classifications, business glossary, schema
    enrichment (G7, reference catalog_metadata.py). Storage format is
    the reference's: top-level column_descriptions / classifications /
    glossary maps keyed by normalized table name."""

    def __init__(self, store_path: str):
        self.store = JsonStore(
            store_path,
            {"column_descriptions": {}, "classifications": {}, "glossary": {}},
        )

    def set_column_description(self, table: str, column: str, description: str) -> dict:
        table = _normalize(table)
        data = self.store.load()
        data["column_descriptions"].setdefault(table, {})[column] = description
        self.store.save(data)
        return {
            "table": table,
            "descriptions": data["column_descriptions"][table],
            "message": f"Description set for {table}.{column}",
        }

    def get_column_descriptions(self, table: str) -> dict:
        table = _normalize(table)
        return {
            "table": table,
            "descriptions": self.store.load()["column_descriptions"].get(table, {}),
        }

    def classify_column(self, table: str, column: str, classification: str) -> dict:
        if classification not in CLASSIFICATIONS:
            raise ValueError(
                f"invalid classification {classification!r}; one of {sorted(CLASSIFICATIONS)}"
            )
        table = _normalize(table)
        data = self.store.load()
        data["classifications"].setdefault(table, {})[column] = classification
        self.store.save(data)
        return {
            "table": table,
            "column": column,
            "classification": classification,
            "message": f"Classified {table}.{column} as {classification}",
        }

    def classified_columns(
        self, table: str | None = None, classification: str | None = None
    ) -> list[dict]:
        """All classifications, filterable by table and/or type
        (reference get_classifications)."""
        data = self.store.load()["classifications"]
        t_filter = _normalize(table) if table else None
        out = []
        for t, cols in data.items():
            if t_filter and t != t_filter:
                continue
            for c, cls in cols.items():
                if classification and cls != classification:
                    continue
                out.append({"table": t, "column": c, "classification": cls})
        return out

    def column_info(self, table: str) -> dict:
        """Merged per-column view {col: {description?, classification?}}."""
        table = _normalize(table)
        data = self.store.load()
        merged: dict[str, dict] = {}
        for c, d in data["column_descriptions"].get(table, {}).items():
            merged.setdefault(c, {})["description"] = d
        for c, cls in data["classifications"].get(table, {}).items():
            merged.setdefault(c, {})["classification"] = cls
        return merged

    def pii_columns(self, table: str | None = None) -> list[dict]:
        return [
            {"table": e["table"], "column": e["column"]}
            for e in self.classified_columns(table, classification="pii")
        ]

    def add_glossary_term(
        self, term: str, definition: str, aliases: list[str] | None = None
    ) -> None:
        data = self.store.load()
        data["glossary"][term.lower()] = {
            "term": term,
            "definition": definition,
            "aliases": [a.lower() for a in (aliases or [])],
        }
        self.store.save(data)

    def lookup_term(self, term: str) -> dict | None:
        g = self.store.load()["glossary"]
        term = term.lower()
        if term in g:
            return {**g[term], "term": term}
        for t, e in g.items():
            if term in e.get("aliases", []):
                return {**e, "term": t}
        return None

    def search_glossary(self, query: str) -> list[dict]:
        """Match term names, definitions, and aliases (reference
        search_glossary)."""
        q = query.lower()
        out = []
        for key, e in self.store.load()["glossary"].items():
            if (
                q in key
                or q in e.get("definition", "").lower()
                or any(q in a for a in e.get("aliases", []))
            ):
                out.append(e)
        return out

    def list_glossary(self) -> list[dict]:
        return sorted(self.store.load()["glossary"].values(),
                      key=lambda e: e.get("term", "").lower())

    def remove_glossary_term(self, term: str) -> dict:
        data = self.store.load()
        key = term.lower()
        if key in data["glossary"]:
            del data["glossary"][key]
            self.store.save(data)
            return {"term": term, "message": f"Removed glossary term '{term}'"}
        return {"term": term, "message": f"Glossary term '{term}' not found"}

    def enrich_schema(self, table) -> dict:
        """Reference get_enriched_schema: the table's fields annotated
        with descriptions, classifications, and glossary term matches,
        plus coverage counts. ``table`` is a LakeTable."""
        name = f"{table.namespace}.{table.table}"
        descriptions = self.store.load()["column_descriptions"].get(name, {})
        classifications = self.store.load()["classifications"].get(name, {})
        glossary = self.store.load()["glossary"]
        fields = []
        for f in table.schema().fields:
            matches = [
                e.get("term", key)
                for key, e in glossary.items()
                if key in f.name.lower()
                or any(a in f.name.lower() for a in e.get("aliases", []))
            ]
            fields.append(
                {
                    "name": f.name,
                    "type": f.dataType.simpleString(),
                    "description": descriptions.get(f.name),
                    "classification": classifications.get(f.name),
                    "glossary_matches": matches,
                }
            )
        return {
            "table": name,
            "fields": fields,
            "total_fields": len(fields),
            "described_fields": sum(1 for f in fields if f["description"]),
            "classified_fields": sum(1 for f in fields if f["classification"]),
        }
