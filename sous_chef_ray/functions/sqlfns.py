"""Scalar SQL function library over Arrow arrays (SURVEY §2.C14-C19).

The SQL surface the reference recognizes for pushdown (CASE, COALESCE /
NVL / NULLIF / IFF / ZEROIFNULL, EXTRACT / DATE_TRUNC, CONCAT, CAST —
reference: sql_sources.py:195-210, validators.py:55-69) expressed as
pyarrow.compute kernels usable inside any map_batches stage.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import pyarrow as pa
import pyarrow.compute as pc


def case_when(branches: Sequence[Tuple[pa.Array, object]], default: object) -> pa.Array:
    """CASE WHEN c1 THEN v1 WHEN c2 THEN v2 ... ELSE default END."""
    conds = pc.make_struct(*[c for c, _ in branches])
    return pc.case_when(conds, *[v for _, v in branches], default)


def coalesce(*arrays) -> pa.Array:
    return pc.coalesce(*arrays)


def nullif(arr: pa.Array, value) -> pa.Array:
    return pc.if_else(pc.equal(arr, value), pa.nulls(len(arr), type=arr.type), arr)


def nvl(arr: pa.Array, default) -> pa.Array:
    return pc.fill_null(arr, default)


def zeroifnull(arr: pa.Array) -> pa.Array:
    return pc.fill_null(arr, 0)


def iff(cond: pa.Array, then, otherwise) -> pa.Array:
    return pc.if_else(cond, then, otherwise)


_EXTRACT = {
    "year": pc.year,
    "month": pc.month,
    "day": pc.day,
    "hour": pc.hour,
    "minute": pc.minute,
    "second": pc.second,
    "dow": pc.day_of_week,
    "doy": pc.day_of_year,
    "quarter": pc.quarter,
}


def extract(part: str, ts: pa.Array) -> pa.Array:
    """EXTRACT(part FROM ts) → int64."""
    return pc.cast(_EXTRACT[part.lower()](ts), pa.int64())


def date_trunc(unit: str, ts: pa.Array) -> pa.Array:
    """DATE_TRUNC(unit, ts); unit in day/week/month/quarter/year/hour/..."""
    return pc.floor_temporal(ts, unit=unit.lower())


def concat_ws(sep: str, *arrays) -> pa.Array:
    """a || sep || b || ... (null if any input null, SQL || semantics)."""
    return pc.binary_join_element_wise(*arrays, sep)


def cast(arr: pa.Array, target: str | pa.DataType) -> pa.Array:
    """CAST(arr AS target); accepts Arrow types or SQL-ish names."""
    if isinstance(target, str):
        target = {
            "BIGINT": pa.int64(),
            "INT": pa.int32(),
            "INTEGER": pa.int64(),
            "DOUBLE": pa.float64(),
            "FLOAT": pa.float32(),
            "VARCHAR": pa.string(),
            "STRING": pa.string(),
            "DATE": pa.date32(),
            "TIMESTAMP": pa.timestamp("us"),
            "BOOLEAN": pa.bool_(),
        }[target.upper()]
    return pc.cast(arr, target)


def columns(t: pa.Table, names: List[str]) -> List[pa.ChunkedArray]:
    return [t[n] for n in names]
