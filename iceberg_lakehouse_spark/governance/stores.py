"""Tiny JSON side-store base used by every governance module."""

from __future__ import annotations

import json
import os
import uuid
from typing import Any


class JsonStore:
    def __init__(self, path: str, default: Any = None):
        self.path = path
        self.default = default if default is not None else {}

    def load(self) -> Any:
        if not os.path.exists(self.path):
            return json.loads(json.dumps(self.default))
        with open(self.path) as f:
            try:
                return json.load(f)
            except json.JSONDecodeError:
                # a torn/corrupt side-store must not brick its whole
                # governance module (reference store semantics: corrupt
                # → start from the default; writes are atomic-replace,
                # so this only happens to externally damaged files)
                return json.loads(json.dumps(self.default))

    def save(self, data: Any) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(self.path)), exist_ok=True)
        tmp = f"{self.path}.tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(data, f, indent=1, default=str)
        os.replace(tmp, self.path)
