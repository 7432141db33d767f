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


# -- string functions (SUBSTR / REPLACE / LPAD / SPLIT_PART / ...) ----------

def substr(arr: pa.Array, start: int, length: int | None = None) -> pa.Array:
    """SQL SUBSTR(arr, start[, length]) — 1-based, like Snowflake/Teradata."""
    stop = None if length is None else start - 1 + length
    return pc.utf8_slice_codeunits(arr, start - 1, stop)


def replace(arr: pa.Array, find: str, repl: str) -> pa.Array:
    return pc.replace_substring(arr, find, repl)


def lpad(arr: pa.Array, width: int, fill: str = " ") -> pa.Array:
    return pc.utf8_lpad(arr, width, fill)


def rpad(arr: pa.Array, width: int, fill: str = " ") -> pa.Array:
    return pc.utf8_rpad(arr, width, fill)


def split_part(arr: pa.Array, sep: str, index: int) -> pa.Array:
    """SPLIT_PART(arr, sep, index) — 1-based; empty string when the part
    does not exist, NULL for a NULL input (DuckDB semantics)."""
    parts = pc.split_pattern(arr, sep)
    n = pc.list_value_length(parts)
    ok = pc.greater_equal(n, index)
    # null out rows whose list is too short so list_element can't raise,
    # then map those nulls to '' (DuckDB returns '' for a missing part) —
    # but only for rows whose INPUT was non-null (NULL in → NULL out)
    safe = pc.if_else(ok, parts, pa.scalar(None, type=pa.list_(pa.string())))
    filled = pc.fill_null(pc.list_element(safe, index - 1), "")
    return pc.if_else(pc.is_valid(arr), filled, pa.scalar(None, type=pa.string()))


def upper(arr: pa.Array) -> pa.Array:
    return pc.utf8_upper(arr)


def lower(arr: pa.Array) -> pa.Array:
    return pc.utf8_lower(arr)


def length(arr: pa.Array) -> pa.Array:
    return pc.cast(pc.utf8_length(arr), pa.int64())


def left(arr: pa.Array, n: int) -> pa.Array:
    return pc.utf8_slice_codeunits(arr, 0, n)


def right(arr: pa.Array, n: int) -> pa.Array:
    """RIGHT(arr, n): last n codeunits (reverse → prefix → reverse —
    slice kernels take scalar starts only)."""
    return pc.utf8_reverse(pc.utf8_slice_codeunits(pc.utf8_reverse(arr), 0, n))


def strpos(arr: pa.Array, sub: str) -> pa.Array:
    """POSITION(sub IN arr) — 1-based, 0 when absent (DuckDB strpos)."""
    return pc.cast(pc.add(pc.find_substring(arr, sub), 1), pa.int64())


def reverse(arr: pa.Array) -> pa.Array:
    return pc.utf8_reverse(arr)


def starts_with(arr: pa.Array, prefix: str) -> pa.Array:
    return pc.starts_with(arr, prefix)


def ends_with(arr: pa.Array, suffix: str) -> pa.Array:
    return pc.ends_with(arr, suffix)


# -- date arithmetic (DATEADD / DATEDIFF / LAST_DAY) ------------------------

def dateadd(part: str, n: int, ts: pa.Array) -> pa.Array:
    """DATEADD(part, n, ts) — day/hour/minute/second via exact duration;
    month/year via calendar arithmetic (pandas offsets, matching SQL)."""
    part = part.lower()
    import pandas as pd

    if part in ("day", "hour", "minute", "second", "week"):
        unit = {"day": "D", "hour": "h", "minute": "m", "second": "s", "week": "W"}[part]
        delta = pd.Timedelta(n, unit=unit)
        return pc.add(ts, pa.scalar(delta.to_pytimedelta(), type=pa.duration("us")))
    if part in ("month", "year"):
        s = ts.to_pandas()
        off = pd.DateOffset(months=n) if part == "month" else pd.DateOffset(years=n)
        return pa.array(s + off, type=ts.type if isinstance(ts, pa.Array) else ts.type)
    raise ValueError(f"unsupported DATEADD part: {part}")


def datediff_days(a: pa.Array, b: pa.Array) -> pa.Array:
    """DATEDIFF('day', a, b) = calendar-day difference b - a (DuckDB
    semantics: difference of the day-truncated values)."""
    da = pc.floor_temporal(a, unit="day")
    db = pc.floor_temporal(b, unit="day")
    diff_us = pc.cast(pc.cast(pc.subtract(db, da), pa.duration("us")), pa.int64())
    return pc.divide(diff_us, 86_400_000_000)


def last_day(ts: pa.Array) -> pa.Array:
    """LAST_DAY(ts): last calendar day of ts's month (date32)."""
    import pandas as pd

    s = pd.to_datetime(ts.to_pandas())
    out = (s + pd.offsets.MonthEnd(0)).dt.normalize().dt.date
    return pa.array(out, type=pa.date32())


def json_extract_int(arr: pa.Array, key: str) -> pa.Array:
    """JSON_EXTRACT(arr, '$.key') for flat integer scalar fields — one
    vectorized RE2 pass (no per-row json.loads). NULL when the key is
    absent or the input is NULL; use ``json_extract_scalar`` for strings."""
    import re

    pat = rf'"{re.escape(key)}"\s*:\s*(?P<v>-?\d+)'
    hit = pc.extract_regex(arr, pat)
    return pc.cast(pc.struct_field(hit, "v"), pa.int64())


def json_extract_scalar(arr: pa.Array, key: str) -> pa.Array:
    """JSON_EXTRACT_STRING(arr, '$.key') for flat scalar fields: returns
    the raw scalar token (quoted strings unquoted, numbers as text).
    One vectorized RE2 pass; escaped quotes inside strings unsupported
    (flat telemetry-style payloads)."""
    import re

    k = re.escape(key)
    quoted = pc.struct_field(
        pc.extract_regex(arr, rf'"{k}"\s*:\s*"(?P<v>[^"]*)"'), "v")
    bare = pc.struct_field(
        pc.extract_regex(arr, rf'"{k}"\s*:\s*(?P<v>-?[0-9.eE+]+|true|false|null)'),
        "v")
    return pc.coalesce(quoted, bare)
