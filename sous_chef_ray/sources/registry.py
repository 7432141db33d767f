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

# per-type allowed constructor params — EXACTLY the reference's lists
# (reference: sous_chef.py:40-45); anything else is stripped on register.
SOURCE_PARAMS: Dict[str, List[str]] = {
    "file": ["path", "timestamp_field", "created_timestamp_column", "field_mapping"],
    "spark": ["path", "timestamp_field", "table", "query", "field_mapping"],
    "kafka": ["bootstrap_servers", "topic", "timestamp_field", "message_format"],
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


def _read_spark(path: str | None = None, table: str | None = None,
                query: str | None = None,
                field_mapping: Dict[str, str] | None = None, **_: Any):
    """Spark source (reference: SOURCE_TYPE_MAP 'spark' → SparkSource,
    sous_chef.py:34). Spark tables materialize as parquet directories, so
    a ``path`` reads directly; ``table``/``query`` declare a warehouse
    surface this engine has no connector for — declared, not silently
    dropped."""
    if path:
        return _read_file(path, field_mapping=field_mapping)
    raise NotImplementedError(
        "spark source without a parquet 'path' needs a live warehouse "
        f"connection (table={table!r}, query={query!r}); none in this "
        "environment — map the table to its parquet location instead"
    )


class StreamingSourceSpec:
    """Declared-but-not-executed source (kafka/redis): the batch engine
    registers and validates the config exactly like the reference (which
    also only constructs config objects, never consumes the stream —
    reference: sous_chef.py:35-36,43-44), and surfaces it in the registry
    manifest for an online/streaming runtime to pick up."""

    def __init__(self, source_type: str, **params: Any):
        self.source_type = source_type
        self.params = params

    def __repr__(self) -> str:  # pragma: no cover
        return f"StreamingSourceSpec({self.source_type}, {self.params})"


def _kafka_source(**params: Any) -> StreamingSourceSpec:
    return StreamingSourceSpec("kafka", **params)


def _redis_source(**params: Any) -> StreamingSourceSpec:
    return StreamingSourceSpec("redis", **params)


def _rename_stage(ds, field_mapping: Dict[str, str] | None):
    if not field_mapping:
        return ds
    mapping = dict(field_mapping)

    def rename(t):
        return t.rename_columns([mapping.get(c, c) for c in t.column_names])

    return ds.map_batches(rename, batch_format="pyarrow",
                          zero_copy_batch=True)


def _read_csv(path: str, columns=None,
              field_mapping: Dict[str, str] | None = None, **_: Any):
    """CSV source (ENGINE EXTENSION — not a reference type): Arrow CSV
    reader via ray.data, column projection after parse (Arrow's CSV
    reader has no pushdown), same field_mapping semantics as file."""
    import ray.data as rd

    ds = rd.read_csv(path)
    if columns:
        ds = ds.select_columns(list(columns))
    return _rename_stage(ds, field_mapping)


def _read_jsonl(path: str, columns=None,
                field_mapping: Dict[str, str] | None = None, **_: Any):
    """JSON-lines source (ENGINE EXTENSION): ray.data's Arrow JSON
    reader (newline-delimited records)."""
    import ray.data as rd

    ds = rd.read_json(path)
    if columns:
        ds = ds.select_columns(list(columns))
    return _rename_stage(ds, field_mapping)


class SourceRegistry:
    """type name → reader factory, with lazy registration and caching.

    All four reference source types register (reference SOURCE_TYPE_MAP,
    sous_chef.py:32-37, pinned by tests/test_sous_chef.py:128-133);
    csv/jsonl are engine extensions (SOURCE_PARAMS stays reference-exact
    — unknown-type configs pass through unfiltered by design)."""

    _sources: Dict[str, Callable] = {}
    _builtin: Dict[str, Callable] = {
        "file": _read_file,
        "spark": _read_spark,
        "kafka": _kafka_source,
        "redis": _redis_source,
        "csv": _read_csv,
        "jsonl": _read_jsonl,
    }

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
