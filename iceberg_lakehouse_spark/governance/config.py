"""Write-format/config resolution chain (SURVEY S15, reference
config.py:150-218): override > table property `write.format.default`
> per-table config > global config > 'parquet'. TOML in the reference;
JSON here (same resolution semantics, no tomllib dependency needed for
writes). Reference 'vortex' maps to the sanctioned ORC substitution
(SURVEY §7), so the supported set here is parquet|orc.

Reference-pinned edges: format values are validated when SET (invalid
raises immediately); a table PROPERTY with an invalid or unknown value
is ignored and resolution falls through the chain (config.py
resolve_format_with_table), and property values match
case-insensitively; table names are stored by short name so
'default.expenses' and 'expenses' address the same override."""

from __future__ import annotations

from ..catalog import LakehouseCatalog
from .stores import JsonStore

DEFAULT_FORMAT = "parquet"
SUPPORTED = {"parquet", "orc"}
FORMAT_KEY = "write.format.default"


def _short(table: str) -> str:
    return table.split(".", 1)[-1]


def _check_format(value: str) -> str:
    v = (value or "").lower()
    if v not in SUPPORTED:
        raise ValueError(
            f"unsupported write format {value!r} (supported: {sorted(SUPPORTED)})"
        )
    return v


class ConfigManager:
    def __init__(self, store_path: str):
        self.store = JsonStore(store_path, {"global": {}, "tables": {}})

    def set_global(self, key: str, value: str) -> None:
        if key == FORMAT_KEY:
            value = _check_format(value)
        data = self.store.load()
        data["global"][key] = value
        self.store.save(data)

    def set_table(self, table: str, key: str, value: str) -> None:
        if key == FORMAT_KEY:
            value = _check_format(value)
        data = self.store.load()
        data["tables"].setdefault(_short(table), {})[key] = value
        self.store.save(data)

    def get(self, key: str, table: str | None = None, default=None):
        data = self.store.load()
        if table and key in data["tables"].get(_short(table), {}):
            return data["tables"][_short(table)][key]
        return data["global"].get(key, default)

    def summary(self) -> dict:
        """Reference get_config_summary: effective default + per-table
        format overrides."""
        data = self.store.load()
        return {
            "default_format": data["global"].get(FORMAT_KEY, DEFAULT_FORMAT),
            "table_overrides": {
                t: cfg[FORMAT_KEY]
                for t, cfg in data["tables"].items()
                if FORMAT_KEY in cfg
            },
        }

    def resolve_write_format(
        self,
        catalog: LakehouseCatalog | None,
        table: str | None = None,
        override: str | None = None,
    ) -> str:
        """The reference's 4-level chain (config.py:150-218). An invalid
        OVERRIDE raises; an invalid table PROPERTY is skipped and the
        chain continues."""
        if override:
            return _check_format(override)
        if table and catalog is not None and catalog.table_exists(table):
            prop = catalog.load_table(table).properties().get(FORMAT_KEY)
            if prop and prop.lower() in SUPPORTED:
                return prop.lower()
        fmt = (
            self.get(FORMAT_KEY, table=table, default=None)
            or self.get(FORMAT_KEY, default=DEFAULT_FORMAT)
        )
        return _check_format(fmt)
