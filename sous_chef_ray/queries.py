"""Driver-facing query inventory: one entry per implemented operator
(SURVEY.md §2), each paired with an ANSI-SQL DuckDB oracle where
SQL-expressible.

Float-aggregate determinism: sums over doubles are computed as exact
integer sums of round(x * 10^k) in BOTH the Ray pipeline and the oracle
SQL (per-row doubles are bit-identical on both sides since both read the
same parquet and apply the same arithmetic, so the rounded integers agree
and the integer sums are order-independent). Derived averages divide the
same exact integers → identical doubles → stable value hashes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

QUERIES = {}
ORACLE_SQL = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


def _read(sf_dir: str, table: str, columns=None) -> "rd.Dataset":
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# B2: point-in-time as-of join (flagship; broadcast-spine strategy)
# ---------------------------------------------------------------------------

_ASOF_SQL = """
WITH s AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
     f AS (SELECT user_id, ts AS fts, value FROM events WHERE event_type = 'purchase'),
     j AS (
       SELECT s.user_id, s.ts, f.fts, f.value
       FROM s ASOF LEFT JOIN f
         ON s.user_id = f.user_id AND f.fts <= s.ts
     )
SELECT user_id, ts,
       CASE WHEN fts >= ts - INTERVAL 7 DAY THEN value END AS last_purchase_value
FROM j
"""


@register("asof_last_purchase", _ASOF_SQL)
def asof_last_purchase(sf_dir: str) -> pa.Table:
    """For every click, the value of the user's latest purchase at-or-before
    the click (TTL 7 days) — SURVEY §2.B2 via stages.asof."""
    from sous_chef_ray.stages.asof import asof_join_broadcast

    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_type", "value"])

    def to_feats(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        return pa.table({"user_id": t["user_id"], "fts": t["ts"], "value": t["value"]})

    feats = ev.map_batches(to_feats, batch_format="pyarrow", zero_copy_batch=True)
    spine_batches = [
        b.filter(pc.equal(b["event_type"], "click")).select(["user_id", "ts"])
        for b in ev.iter_batches(batch_size=None, batch_format="pyarrow")
    ]
    spine = pa.concat_tables(spine_batches)
    out = asof_join_broadcast(
        feats,
        spine,
        key="user_id",
        spine_ts="ts",
        feature_ts="fts",
        tie_col=None,
        payload_cols=["value"],
        ttl=pd.Timedelta(days=7),
        concurrency=2,
        batch_size=8192,
    )
    return pa.table(
        {
            "user_id": out["user_id"],
            "ts": out["ts"],
            "last_purchase_value": out["value"],
        }
    )


# ---------------------------------------------------------------------------
# B4: latest-per-key dedup
# ---------------------------------------------------------------------------

_LATEST_SQL = """
SELECT user_id, ts, event_type, value FROM (
  SELECT user_id, ts, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) WHERE rn = 1
"""


@register("latest_event_per_user", _LATEST_SQL)
def latest_event_per_user(sf_dir: str) -> pa.Table:
    """Latest event row per user (tie-break by event_id) — SURVEY §2.B4."""
    from sous_chef_ray.stages.dedup import latest_per_key

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type", "value"])
    out = latest_per_key(ev, "user_id", order_by="ts", tie_by="event_id")
    return out.select_columns(["user_id", "ts", "event_type", "value"])


# ---------------------------------------------------------------------------
# C3: grouped aggregation (TPC-H Q1-like pricing summary)
# ---------------------------------------------------------------------------

_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty,
       SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base_price,
       SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0
           AS sum_disc_price,
       SUM(l_quantity) / COUNT(*) AS avg_qty,
       SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) / 100.0 / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("pricing_summary", _PRICING_SQL)
def pricing_summary(sf_dir: str) -> pd.DataFrame:
    """Q1-style pricing summary: filter → derive → groupby aggregate
    (SURVEY §2.C2/C3). Partial aggregation happens inside Ray's hash
    aggregate; the derived money columns are exact integer cents."""
    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"],
    )
    cutoff = pa.scalar(np.datetime64("2000-12-01", "us"), type=pa.timestamp("us"))

    def derive(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff))
        base_e2 = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)), pa.int64())
        disc_price = pc.multiply(
            t["l_extendedprice"], pc.subtract(1.0, t["l_discount"])
        )
        disc_e4 = pc.cast(pc.round(pc.multiply(disc_price, 10000.0)), pa.int64())
        disc_e2 = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)), pa.int64())
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "l_quantity": t["l_quantity"],
                "base_e2": base_e2,
                "disc_e4": disc_e4,
                "disc_e2": disc_e2,
            }
        )

    agg = (
        li.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("base_e2", alias_name="base_e2"),
            Sum("disc_e4", alias_name="disc_e4"),
            Sum("disc_e2", alias_name="disc_e2"),
            Count(alias_name="count_order"),
        )
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "l_returnflag": agg["l_returnflag"],
            "l_linestatus": agg["l_linestatus"],
            "sum_qty": agg["sum_qty"],
            "sum_base_price": agg["base_e2"] / 100.0,
            "sum_disc_price": agg["disc_e4"] / 10000.0,
            "avg_qty": agg["sum_qty"] / agg["count_order"],
            "avg_disc": agg["disc_e2"] / 100.0 / agg["count_order"],
            "count_order": agg["count_order"],
        }
    )
    return out
