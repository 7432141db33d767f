"""SQLite online store analogue (SURVEY §2 "what's missing" #3).

The reference's configs declare ``online_store: {type: sqlite, path:
...}`` and delegate both materialization and online reads to Feast
(reference: tests/test_feature_services.py:14-19,
examples/customer_analytics_demo/customer_metrics.py:56-59 — the
reference itself never reads online). This module is the native
analogue:

* ``materialize_online`` — DISTRIBUTED latest-row-per-entity reduce
  (stages/dedup.latest_per_key: per-batch partial winners, bucketed
  final reduce — the input streams, only one row per key survives),
  then an upsert of the bounded winner set into a SQLite file. One row
  per (view, entity key); each row's payload is a one-row Arrow IPC
  stream so EVERY dtype round-trips exactly (lists, timestamps,
  float32) — no JSON/str collapse.

* ``SqliteOnlineStore.read`` / ``Engine.get_online_features`` — point
  lookups by entity key with typed nulls for unknown keys (the view's
  schema is persisted alongside the rows).

Scale note: a single SQLite file is the serving-side bottleneck by
construction (it is the reference's own declared online store). The
Ray-side work — the latest-per-key reduce — is the part that must
scale, and it shares the exact bucketed plan the engine uses
everywhere; swap the writer for a sharded KV in a real deployment.
"""

from __future__ import annotations

import io
import sqlite3
from typing import Dict, List, Optional, Sequence

import pyarrow as pa

import ray.data as rd


def _ipc_bytes(t: pa.Table) -> bytes:
    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, t.schema) as w:
        w.write_table(t)
    return sink.getvalue()


def _ipc_table(b: bytes) -> pa.Table:
    with pa.ipc.open_stream(io.BytesIO(b)) as r:
        return r.read_all()


class SqliteOnlineStore:
    """One table per feature view: (entity_key TEXT PRIMARY KEY,
    event_ts INTEGER µs, payload BLOB = one-row Arrow IPC stream); a
    ``_meta`` table keeps each view's (key column, Arrow schema IPC)."""

    def __init__(self, path: str):
        self.path = str(path)

    def _conn(self) -> sqlite3.Connection:
        con = sqlite3.connect(self.path)
        con.execute(
            "CREATE TABLE IF NOT EXISTS _meta "
            "(view TEXT PRIMARY KEY, key_col TEXT, schema_ipc BLOB)")
        return con

    @staticmethod
    def _tbl(view: str) -> str:
        if not view.replace("_", "").isalnum():
            raise ValueError(f"bad view name {view!r}")
        return f"view_{view}"

    def write_view(self, view: str, key_col: str, ts_col: Optional[str],
                   rows: pa.Table) -> int:
        """Upsert one-latest-row-per-key ``rows`` (already reduced)."""
        con = self._conn()
        tbl = self._tbl(view)
        con.execute(
            f"CREATE TABLE IF NOT EXISTS {tbl} (entity_key TEXT PRIMARY "
            "KEY, event_ts INTEGER, payload BLOB)")
        schema_ipc = _ipc_bytes(rows.slice(0, 0))
        con.execute(
            "INSERT OR REPLACE INTO _meta VALUES (?, ?, ?)",
            (view, key_col, schema_ipc))
        keys = rows[key_col].cast(pa.string()).to_pylist()
        if ts_col is not None and ts_col in rows.column_names:
            ts = rows[ts_col].cast(pa.timestamp("us")).cast(
                pa.int64()).to_pylist()
        else:
            ts = [None] * len(rows)
        payloads = [
            sqlite3.Binary(_ipc_bytes(rows.slice(i, 1)))
            for i in range(len(rows))
        ]
        con.executemany(
            f"INSERT OR REPLACE INTO {tbl} VALUES (?, ?, ?)",
            list(zip(keys, ts, payloads)))
        con.commit()
        con.close()
        return len(rows)

    def read(self, view: str, entity_keys: Sequence) -> pa.Table:
        """Point lookups; unknown keys come back as typed-null rows in
        the requested order (the view schema is persisted)."""
        con = self._conn()
        row = con.execute(
            "SELECT key_col, schema_ipc FROM _meta WHERE view = ?",
            (view,)).fetchone()
        if row is None:
            con.close()
            raise KeyError(f"view {view!r} not materialized")
        key_col, schema_ipc = row
        schema = _ipc_table(schema_ipc).schema
        tbl = self._tbl(view)
        want = [str(k) for k in entity_keys]
        got: Dict[str, bytes] = {}
        CHUNK = 500  # sqlite bind-variable limit headroom
        for i in range(0, len(want), CHUNK):
            part = want[i:i + CHUNK]
            q = (f"SELECT entity_key, payload FROM {tbl} WHERE "
                 f"entity_key IN ({','.join('?' * len(part))})")
            got.update(dict(con.execute(q, part).fetchall()))
        con.close()
        pieces: List[pa.Table] = []
        null_row = None
        for k in want:
            if k in got:
                pieces.append(_ipc_table(got[k]))
            else:
                if null_row is None:
                    null_row = pa.table({
                        f.name: pa.nulls(1, f.type) for f in schema})
                pieces.append(null_row)
        out = (pa.concat_tables(pieces) if pieces
               else _ipc_table(schema_ipc))
        # unknown keys still echo the requested key value
        key_arr = pa.array(want, pa.string())
        kt = schema.field(key_col).type
        if kt != pa.string():
            key_arr = key_arr.cast(kt)
        idx = out.column_names.index(key_col)
        return out.set_column(idx, key_col, key_arr)


def materialize_online(
    ds: "rd.Dataset",
    store: SqliteOnlineStore,
    view: str,
    key_col: str,
    ts_col: str,
    tie_col: Optional[str] = None,
    num_buckets: int = 64,
) -> int:
    """Distributed latest-per-key reduce → bounded upsert into the
    online store. The input Dataset streams; only one row per entity
    key reaches the driver (that bound is the online store's own
    cardinality, so a driver-side writer is the honest shape here)."""
    from sous_chef_ray.stages.dedup import latest_per_key

    latest = latest_per_key(ds, key_col, order_by=ts_col, tie_by=tie_col,
                            num_buckets=num_buckets)
    winners = pa.concat_tables(
        latest.iter_batches(batch_size=None, batch_format="pyarrow"))
    return store.write_view(view, key_col, ts_col, winners)
