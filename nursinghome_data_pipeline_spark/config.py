"""Dataset configuration model (YAML-driven ingest specs).

Accepts the reference's ``config/datasets.yml`` shape
(``/root/reference/config/datasets.yml:1-25``, consumed by
``build.py:10-12,55-58``): a top-level ``datasets`` mapping of
per-dataset file glob, staging table name, natural key, and declared
column types with nullability.
"""

from __future__ import annotations

from dataclasses import dataclass, field

VALID_TYPES = ("string", "numeric", "int", "date")


@dataclass(frozen=True)
class ColumnSpec:
    name: str
    #: one of: string | numeric | int | date  (reference build.py:27-37)
    type: str
    nullable: bool = True


@dataclass(frozen=True)
class DatasetSpec:
    name: str
    filename_pattern: str
    staging_table: str
    natural_key: tuple[str, ...]
    columns: tuple[ColumnSpec, ...] = field(default_factory=tuple)

    def column(self, name: str) -> ColumnSpec:
        for c in self.columns:
            if c.name == name:
                return c
        raise KeyError(name)


def specs_from_dict(raw: dict) -> dict[str, DatasetSpec]:
    datasets = raw.get("datasets", raw)
    out: dict[str, DatasetSpec] = {}
    for name, spec in datasets.items():
        cols = []
        for cname, meta in (spec.get("columns") or {}).items():
            typ = (meta or {}).get("type", "string")
            if typ not in VALID_TYPES:
                raise ValueError(f"{name}.{cname}: unknown type {typ!r}")
            cols.append(
                ColumnSpec(name=cname, type=typ, nullable=(meta or {}).get("nullable", True))
            )
        out[name] = DatasetSpec(
            name=name,
            filename_pattern=spec["filename_pattern"],
            staging_table=spec["staging_table"],
            natural_key=tuple(spec.get("natural_key", [])),
            columns=tuple(cols),
        )
    return out


def load_config(path: str) -> dict[str, DatasetSpec]:
    """Parse a datasets.yml-style config into DatasetSpecs."""
    import yaml

    with open(path) as f:
        return specs_from_dict(yaml.safe_load(f))
