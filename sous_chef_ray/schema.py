"""Type system: declared dtype names → Arrow types.

The reference's declared dtype universe is {'FLOAT': Float32, 'INT64': Int64}
(reference: src/sous_chef/sous_chef.py:26-29; unknown dtype raises KeyError at
sous_chef.py:217) and its SQL inference emits only INT64 / FLOAT / STRING,
collapsing nested types to STRING (sql_sources.py:212-219, 226-233, 306-312).

We keep those exact names and semantics for conformance, and additionally
LIFT the "arrays stored as strings" limitation: the engine's flagship table
carries a native list<int32> `tokens` column (BASELINE.json input_hint), so
the dtype table here also knows ARRAY_INT32 / ARRAY_FLOAT / TIMESTAMP etc.
for native Ray-Data/Arrow pipelines.
"""

from __future__ import annotations

from typing import Dict, List

import pyarrow as pa

# Conformance-exact declared dtype map (FLOAT means float32, as in the
# reference's DTYPE_MAP). Unknown names must raise KeyError.
DTYPE_MAP: Dict[str, pa.DataType] = {
    "FLOAT": pa.float32(),
    "INT64": pa.int64(),
}

# Extended native dtype map for the Ray engine (superset; lookup falls back
# to DTYPE_MAP semantics for the two conformance names).
NATIVE_DTYPE_MAP: Dict[str, pa.DataType] = {
    **DTYPE_MAP,
    "FLOAT64": pa.float64(),
    "INT32": pa.int32(),
    "STRING": pa.large_string(),
    "BOOL": pa.bool_(),
    "TIMESTAMP": pa.timestamp("us"),
    "DATE": pa.date32(),
    "BINARY": pa.large_binary(),
    "ARRAY_INT32": pa.list_(pa.int32()),
    "ARRAY_INT64": pa.list_(pa.int64()),
    "ARRAY_FLOAT": pa.list_(pa.float32()),
    "ARRAY_FLOAT64": pa.list_(pa.float64()),
    "ARRAY_STRING": pa.list_(pa.large_string()),
}

# SQL-inference logical type names (sql_sources.py:212-219 emits only these)
SQL_LOGICAL_TYPES: List[str] = ["INT64", "FLOAT", "STRING"]


def resolve_dtype(name: str, native: bool = False) -> pa.DataType:
    """Resolve a declared dtype name to an Arrow type.

    With native=False this reproduces the reference contract exactly:
    only FLOAT / INT64 are legal and anything else raises KeyError
    (reference: sous_chef.py:217).
    """
    table = NATIVE_DTYPE_MAP if native else DTYPE_MAP
    return table[name.upper()]


def fields_to_schema(fields: List[dict], native: bool = True) -> pa.Schema:
    """[{'name': ..., 'dtype': ...}, ...] → pyarrow.Schema."""
    return pa.schema(
        [pa.field(f["name"], resolve_dtype(f["dtype"], native=native)) for f in fields]
    )
