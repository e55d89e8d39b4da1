"""Write-format/config resolution chain (SURVEY S15, reference
config.py:150-218): override > table property `write.format.default`
> per-table config > global config > 'parquet'. TOML in the reference;
JSON here (same resolution semantics, no tomllib dependency needed for
writes)."""

from __future__ import annotations

from ..catalog import LakehouseCatalog
from .stores import JsonStore

DEFAULT_FORMAT = "parquet"
SUPPORTED = {"parquet", "orc"}


class ConfigManager:
    def __init__(self, store_path: str):
        self.store = JsonStore(store_path, {"global": {}, "tables": {}})

    def set_global(self, key: str, value: str) -> None:
        data = self.store.load()
        data["global"][key] = value
        self.store.save(data)

    def set_table(self, table: str, key: str, value: str) -> None:
        data = self.store.load()
        data["tables"].setdefault(table, {})[key] = value
        self.store.save(data)

    def get(self, key: str, table: str | None = None, default=None):
        data = self.store.load()
        if table and key in data["tables"].get(table, {}):
            return data["tables"][table][key]
        return data["global"].get(key, default)

    def resolve_write_format(
        self,
        catalog: LakehouseCatalog,
        table: str | None = None,
        override: str | None = None,
    ) -> str:
        """The reference's 4-level chain (config.py:150-218)."""
        if override:
            fmt = override
        elif table and catalog.table_exists(table):
            props = catalog.load_table(table).properties()
            fmt = props.get("write.format.default") or self.get(
                "write.format.default", table=table, default=None
            ) or self.get("write.format.default", default=DEFAULT_FORMAT)
        else:
            fmt = self.get(
                "write.format.default", table=table, default=None
            ) or self.get("write.format.default", default=DEFAULT_FORMAT)
        fmt = fmt.lower()
        if fmt not in SUPPORTED:
            raise ValueError(f"unsupported write format {fmt!r} (supported: {sorted(SUPPORTED)})")
        return fmt
