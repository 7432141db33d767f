"""Source-type registry.

Mirrors the reference's plugin-by-type surface (reference:
src/sous_chef/sous_chef.py:32-45 SOURCE_TYPE_MAP/SOURCE_PARAMS,
src/sous_chef/registry.py:8-31 SourceRegistry) re-expressed as a plain dict
of reader factories producing ray.data Datasets. Unknown types raise
ImportError with the available-types message, matching the reference's
error contract (sous_chef.py:116-117, registry.py:28-29).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List

# per-type allowed constructor params (reference: sous_chef.py:40-45)
SOURCE_PARAMS: Dict[str, List[str]] = {
    "file": ["path", "timestamp_field", "created_timestamp_column", "field_mapping"],
    "spark": ["table", "query", "path", "file_format", "timestamp_field", "field_mapping"],
    "kafka": ["bootstrap_servers", "topic", "timestamp_field", "message_format", "batch_source"],
    "redis": ["connection_string", "key_ttl"],
}


def _read_file(path: str, columns=None, field_mapping: Dict[str, str] | None = None, **_: Any):
    """Parquet file source; ``field_mapping`` renames columns on read
    (reference B5 semantics: field_mapping param on file sources,
    sous_chef.py:41-42)."""
    import ray.data as rd

    ds = rd.read_parquet(path, columns=columns)
    if field_mapping:
        mapping = dict(field_mapping)

        def rename(t):
            return t.rename_columns(
                [mapping.get(c, c) for c in t.column_names]
            )

        ds = ds.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)
    return ds


class SourceRegistry:
    """type name → reader factory, with lazy registration and caching."""

    _sources: Dict[str, Callable] = {}
    _builtin: Dict[str, Callable] = {"file": _read_file}

    @classmethod
    def get_source(cls, source_type: str) -> Callable:
        if source_type in cls._sources:
            return cls._sources[source_type]
        if source_type in cls._builtin:
            cls._sources[source_type] = cls._builtin[source_type]
            return cls._sources[source_type]
        available = sorted(set(cls._builtin) | set(cls._sources))
        raise ImportError(
            f"Unsupported source type: {source_type}. Available types: {available}"
        )

    @classmethod
    def register(cls, source_type: str, factory: Callable) -> None:
        cls._sources[source_type] = factory


def filter_source_config(source_type: str, config: Dict[str, Any]) -> Dict[str, Any]:
    """Whitelist kwargs per source type; unknown types pass through
    untouched (reference: sous_chef.py:119-125)."""
    if source_type not in SOURCE_PARAMS:
        return config
    allowed = SOURCE_PARAMS[source_type]
    return {k: v for k, v in config.items() if k in allowed}
