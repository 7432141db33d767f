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
import sous_chef_ray.compat  # noqa: F401  (ray 2.49 hash-shuffle schema fix)

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


def _buckets(sf_dir: str, table: str, min_buckets: int = 8) -> int:
    """Size partition_apply bucket counts from the input's on-disk bytes
    (≤ ~512 MB in-memory per bucket) instead of a fixed constant — a 10×
    input gets ~10× buckets, so no whole-bucket OOM at scale."""
    import os

    from sous_chef_ray.stages.partition import auto_num_buckets

    try:
        sz = os.path.getsize(f"{sf_dir}/{table}.parquet")
    except OSError:
        sz = None
    return auto_num_buckets(sz, min_buckets=min_buckets)


def _partitions(sf_dir: str, *tables: str) -> int:
    """Hash-join / distributed-verify partition count: scale with the
    LARGER input's on-disk bytes (same ≤512 MB-per-partition invariant as
    _buckets) but stay within 2× the cluster CPUs — Ray's hash-shuffle
    join schedules one aggregator actor per partition, and far more
    actors than CPUs deadlocks actor scheduling on small clusters (the
    round-4 compiled-Q5 observation, sqlexec.py). A fixed ``8`` silently
    under-parallelizes at 100×; this grows with data AND cluster."""
    import os

    import ray

    from sous_chef_ray.stages.partition import auto_num_buckets

    sz = 0
    for t in tables:
        try:
            sz = max(sz, os.path.getsize(f"{sf_dir}/{t}.parquet"))
        except OSError:
            pass
    by_bytes = auto_num_buckets(sz or None, min_buckets=8)
    cpus = (int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized() else 8)
    return max(2, min(by_bytes, cpus * 2))


# ---------------------------------------------------------------------------
# B2: point-in-time as-of join (flagship; broadcast-spine strategy)
# ---------------------------------------------------------------------------


def _asof_out(out, cols: "dict[str, str]"):
    """Project/rename an asof_join_auto result (pa.Table under the
    broadcast guard, streaming Dataset above it) to output columns."""
    if isinstance(out, pa.Table):
        return pa.table({o: out[src] for o, src in cols.items()})
    ds = out.select_columns(list(dict.fromkeys(cols.values())))
    return ds.rename_columns({src: o for o, src in cols.items()})


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
    from sous_chef_ray.stages.asof import asof_join_auto

    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_type", "value"])

    def to_feats(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        return pa.table({"user_id": t["user_id"], "fts": t["ts"], "value": t["value"]})

    feats = ev.map_batches(to_feats, batch_format="pyarrow", zero_copy_batch=True)
    # spine derived DISTRIBUTED (round-5 VERDICT: never iter_batches the
    # raw table to the driver); asof_join_auto gathers it only under the
    # measured broadcast guard, else routes to the co-partitioned plan
    spine_ds = ev.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "click"))
                   .select(["user_id", "ts"]),
        batch_format="pyarrow", zero_copy_batch=True)
    out = asof_join_auto(
        feats,
        spine_ds,
        key="user_id",
        spine_ts="ts",
        feature_ts="fts",
        tie_col=None,
        payload_cols=["value"],
        ttl=pd.Timedelta(days=7),
        num_buckets=_buckets(sf_dir, "events"),
        concurrency=2,
        batch_size=8192,
    )
    return _asof_out(out, {"user_id": "user_id", "ts": "ts",
                           "last_purchase_value": "value"})


_ASOF_FWD_SQL = """
WITH s AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
     fraw AS (SELECT user_id, ts AS fts, event_id, value FROM events
              WHERE event_type = 'click'),
     f AS (SELECT * FROM fraw
           QUALIFY row_number() OVER (PARTITION BY user_id, fts
                                      ORDER BY event_id DESC) = 1),
     j AS (SELECT s.user_id, s.ts, f.fts, f.value
           FROM s ASOF LEFT JOIN f
             ON s.user_id = f.user_id AND f.fts >= s.ts)
SELECT user_id, ts,
       CASE WHEN fts <= ts + INTERVAL 7 DAY THEN value END AS next_click_value
FROM j
"""


@register("asof_next_click", _ASOF_FWD_SQL)
def asof_next_click(sf_dir: str) -> pa.Table:
    """FORWARD as-of: for every purchase, the value of the user's FIRST
    click at-or-after it (lookahead TTL 7 days; equal-ts ties break to
    the largest event_id) — asof_join_auto(direction='forward'),
    same two-pass streaming plan as the backward flagship."""
    from sous_chef_ray.stages.asof import asof_join_auto

    ev = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_type", "event_id", "value"])

    def to_feats(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "click"))
        return pa.table({"user_id": t["user_id"], "fts": t["ts"],
                         "event_id": t["event_id"], "value": t["value"]})

    feats = ev.map_batches(to_feats, batch_format="pyarrow", zero_copy_batch=True)
    spine_ds = ev.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "purchase"))
                   .select(["user_id", "ts"]),
        batch_format="pyarrow", zero_copy_batch=True)
    out = asof_join_auto(
        feats,
        spine_ds,
        key="user_id",
        spine_ts="ts",
        feature_ts="fts",
        tie_col="event_id",
        payload_cols=["value"],
        ttl=pd.Timedelta(days=7),
        num_buckets=_buckets(sf_dir, "events"),
        concurrency=2,
        batch_size=8192,
        direction="forward",
    )
    return _asof_out(out, {"user_id": "user_id", "ts": "ts",
                           "next_click_value": "value"})


_ASOF_NEAREST_SQL = """
WITH s AS (SELECT row_number() OVER (ORDER BY user_id, ts) AS sid, user_id, ts
           FROM events WHERE event_type = 'purchase'),
     fraw AS (SELECT user_id, ts AS fts, event_id, value FROM events
              WHERE event_type = 'click'),
     f AS (SELECT * FROM fraw
           QUALIFY row_number() OVER (PARTITION BY user_id, fts
                                      ORDER BY event_id DESC) = 1),
     b AS (SELECT s.sid, s.user_id, s.ts, f.fts AS bts, f.value AS bval
           FROM s ASOF LEFT JOIN f
             ON s.user_id = f.user_id AND f.fts <= s.ts),
     fw AS (SELECT s.sid, f.fts AS ffts, f.value AS fval
            FROM s ASOF LEFT JOIN f
              ON s.user_id = f.user_id AND f.fts >= s.ts)
SELECT b.user_id, b.ts,
       CASE
         WHEN bts IS NOT NULL AND b.ts - bts <= INTERVAL 7 DAY
              AND (ffts IS NULL OR ffts - b.ts > INTERVAL 7 DAY
                   OR b.ts - bts <= ffts - b.ts) THEN bval
         WHEN ffts IS NOT NULL AND ffts - b.ts <= INTERVAL 7 DAY THEN fval
       END AS nearest_click_value
FROM b JOIN fw USING (sid)
"""


@register("asof_nearest_click", _ASOF_NEAREST_SQL)
def asof_nearest_click(sf_dir: str) -> pa.Table:
    """NEAREST as-of: for every purchase, the click closest in time
    (either side, symmetric 7-day TTL; equidistant ties prefer the
    backward match, equal-ts ties the largest event_id) —
    asof_join_auto(direction='nearest'), verified against a
    dual-ASOF DuckDB oracle that applies the same preference rules."""
    from sous_chef_ray.stages.asof import asof_join_auto

    ev = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_type", "event_id", "value"])

    def to_feats(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "click"))
        return pa.table({"user_id": t["user_id"], "fts": t["ts"],
                         "event_id": t["event_id"], "value": t["value"]})

    feats = ev.map_batches(to_feats, batch_format="pyarrow", zero_copy_batch=True)
    spine_ds = ev.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "purchase"))
                   .select(["user_id", "ts"]),
        batch_format="pyarrow", zero_copy_batch=True)
    out = asof_join_auto(
        feats,
        spine_ds,
        key="user_id",
        spine_ts="ts",
        feature_ts="fts",
        tie_col="event_id",
        payload_cols=["value"],
        ttl=pd.Timedelta(days=7),
        num_buckets=_buckets(sf_dir, "events"),
        concurrency=2,
        batch_size=8192,
        direction="nearest",
    )
    return _asof_out(out, {"user_id": "user_id", "ts": "ts",
                           "nearest_click_value": "value"})


_ASOF_MULTIKEY_SQL = """
WITH s AS (SELECT l_partkey, l_suppkey, l_shipdate FROM lineitem
           WHERE l_linenumber = 1),
     fraw AS (SELECT l_partkey, l_suppkey, l_shipdate AS fts, l_orderkey,
                     l_quantity
              FROM lineitem WHERE l_linenumber > 1),
     f AS (SELECT * FROM fraw
           QUALIFY row_number() OVER (PARTITION BY l_partkey, l_suppkey, fts
                                      ORDER BY l_orderkey DESC) = 1),
     j AS (SELECT s.l_partkey, s.l_suppkey, s.l_shipdate, f.fts, f.l_quantity
           FROM s ASOF LEFT JOIN f
             ON s.l_partkey = f.l_partkey AND s.l_suppkey = f.l_suppkey
            AND f.fts <= s.l_shipdate)
SELECT l_partkey, l_suppkey, l_shipdate,
       l_quantity AS prev_shipment_qty
FROM j
"""


@register("asof_prev_shipment_multikey", _ASOF_MULTIKEY_SQL)
def asof_prev_shipment_multikey(sf_dir: str) -> pa.Table:
    """MULTI-KEY as-of: for each first-line lineitem, the latest later-line
    shipment of the same (l_partkey, l_suppkey) at-or-before its shipdate
    (equal-date ties → largest l_orderkey). Exercises the composite-key
    path (key=[...] composes an injective synthetic key on both sides)."""
    from sous_chef_ray.stages.asof import asof_join_auto

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_linenumber",
                        "l_shipdate", "l_orderkey", "l_quantity"])

    def to_feats(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_linenumber"], 1))
        return pa.table({
            "l_partkey": t["l_partkey"], "l_suppkey": t["l_suppkey"],
            "fts": t["l_shipdate"], "l_orderkey": t["l_orderkey"],
            "l_quantity": t["l_quantity"],
        })

    feats = li.map_batches(to_feats, batch_format="pyarrow", zero_copy_batch=True)
    spine_ds = li.map_batches(
        lambda t: t.filter(pc.equal(t["l_linenumber"], 1))
                   .select(["l_partkey", "l_suppkey", "l_shipdate"]),
        batch_format="pyarrow", zero_copy_batch=True)
    out = asof_join_auto(
        feats,
        spine_ds,
        key=["l_partkey", "l_suppkey"],
        spine_ts="l_shipdate",
        feature_ts="fts",
        tie_col="l_orderkey",
        payload_cols=["l_quantity"],
        num_buckets=_buckets(sf_dir, "lineitem"),
        concurrency=2,
        batch_size=8192,
    )
    return _asof_out(out, {
        "l_partkey": "l_partkey", "l_suppkey": "l_suppkey",
        "l_shipdate": "l_shipdate", "prev_shipment_qty": "l_quantity"})


# ---------------------------------------------------------------------------
# C4/C5/C6: count distinct, exact quantile, array_agg
# ---------------------------------------------------------------------------

_EXTREMES_SQL = """
SELECT l_returnflag, MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
       MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price
FROM lineitem GROUP BY l_returnflag
"""


@register("quantity_extremes", _EXTREMES_SQL)
def quantity_extremes(sf_dir: str):
    """MIN/MAX grouped aggregates (SURVEY §2.C3) — exact: extrema of
    stored doubles are order-independent."""
    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity", "l_extendedprice"])
    return (
        li.groupby("l_returnflag")
        .aggregate(
            Min("l_quantity", alias_name="min_qty"),
            Max("l_quantity", alias_name="max_qty"),
            Min("l_extendedprice", alias_name="min_price"),
            Max("l_extendedprice", alias_name="max_price"),
        )
    )


_CNTD_SQL = """
SELECT user_id, COUNT(DISTINCT event_type) AS n_distinct FROM events GROUP BY user_id
"""


@register("distinct_event_types_per_user", _CNTD_SQL)
def distinct_event_types_per_user(sf_dir: str):
    """COUNT(DISTINCT) per key (SURVEY §2.C4)."""
    from sous_chef_ray.stages.agg import count_distinct

    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])
    return count_distinct(ev, "user_id", "event_type", name="n_distinct", num_buckets=_buckets(sf_dir, "events"))


_MEDIAN_SQL = """
SELECT l_returnflag, percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity) AS median_qty
FROM lineitem GROUP BY l_returnflag
"""


@register("median_quantity_per_flag", _MEDIAN_SQL)
def median_quantity_per_flag(sf_dir: str):
    """Exact PERCENTILE_CONT(0.5) per group (SURVEY §2.C5)."""
    from sous_chef_ray.stages.agg import group_quantile

    li = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
    return group_quantile(li, "l_returnflag", "l_quantity", q=0.5,
                          name="median_qty", num_buckets=4)


_MEDIAN_DISC_SQL = """
SELECT l_returnflag,
       percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity) AS q25_qty
FROM lineitem GROUP BY l_returnflag
"""


@register("quantile_disc_per_flag", _MEDIAN_DISC_SQL)
def quantile_disc_per_flag(sf_dir: str):
    """PERCENTILE_DISC(0.25) — discrete quantile, an actual member value
    (SURVEY §2.C5 complement to PERCENTILE_CONT)."""
    from sous_chef_ray.stages.agg import group_quantile_disc

    li = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
    return group_quantile_disc(li, "l_returnflag", "l_quantity", q=0.25,
                               name="q25_qty", num_buckets=4)


_UNION_DISTINCT_SQL = """
SELECT user_id FROM events WHERE event_type = 'click'
UNION
SELECT user_id FROM events WHERE event_type = 'purchase'
"""


@register("union_distinct_users", _UNION_DISTINCT_SQL)
def union_distinct_users(sf_dir: str):
    """UNION (distinct) — Dataset.union of the filtered streams followed
    by a distributed distinct (per-batch unique → Dataset.unique), the
    C13 complement to UNION ALL."""
    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def pick(kind):
        return ev.map_batches(
            lambda t, k=kind: t.filter(pc.equal(t["event_type"], k)).select(["user_id"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )

    from sous_chef_ray.stages.join import distinct_key_array

    both = pick("click").union(pick("purchase"))
    vals = distinct_key_array(both, "user_id")
    return pa.table({"user_id": vals})


_ARRAYAGG_SQL = """
SELECT o_custkey, list(o_orderkey ORDER BY o_orderkey) AS order_keys
FROM orders GROUP BY o_custkey
"""


@register("orders_array_per_customer", _ARRAYAGG_SQL)
def orders_array_per_customer(sf_dir: str):
    """ARRAY_AGG WITHIN GROUP (ORDER BY) emitting a native list column —
    the reference collapses arrays to STRING; limitation lifted
    (SURVEY §2.C6)."""
    from sous_chef_ray.stages.agg import array_agg

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderkey"])
    return array_agg(orders, "o_custkey", "o_orderkey",
                     order_by="o_orderkey", name="order_keys", num_buckets=_buckets(sf_dir, "orders"))


_STRUCTAGG_SQL = """
SELECT o_custkey,
       list(struct_pack(orderkey := o_orderkey, totalprice := o_totalprice)
            ORDER BY o_orderkey) AS orders
FROM orders GROUP BY o_custkey
"""


@register("order_struct_per_customer", _STRUCTAGG_SQL)
def order_struct_per_customer(sf_dir: str):
    """ARRAY_AGG(OBJECT_CONSTRUCT(...)) emitting a native list<struct>
    column (SURVEY §2.C6 struct emission; the reference infers these
    expressions but collapses them to STRING — ref
    tests/test_snowflake_sources.py:99-106). Exact vs DuckDB
    list(struct_pack(...))."""
    from sous_chef_ray.stages.agg import struct_agg

    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderkey", "o_totalprice"])
    return struct_agg(
        orders, "o_custkey",
        {"orderkey": "o_orderkey", "totalprice": "o_totalprice"},
        order_by="o_orderkey", name="orders",
        num_buckets=_buckets(sf_dir, "orders"))


_LISTAGG_SQL = """
SELECT l_returnflag, string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus)
  AS statuses
FROM lineitem GROUP BY l_returnflag
"""


@register("listagg_statuses", _LISTAGG_SQL)
def listagg_statuses(sf_dir: str):
    """LISTAGG / string_agg DISTINCT WITHIN GROUP (SURVEY §2.C6)."""
    from sous_chef_ray.stages.agg import array_agg

    li = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus"])
    arr = array_agg(li, "l_returnflag", "l_linestatus",
                    distinct=True, name="vals", num_buckets=4).to_pandas()
    arr["statuses"] = arr["vals"].map(lambda v: ",".join(sorted(v)))
    return arr[["l_returnflag", "statuses"]]


_DISTINCT_SQL = """
SELECT DISTINCT lang FROM documents
"""


@register("distinct_langs", _DISTINCT_SQL)
def distinct_langs(sf_dir: str):
    """SELECT DISTINCT via Dataset.unique (shuffle of distinct values)."""
    docs = _read(sf_dir, "documents", columns=["lang"])
    vals = sorted(docs.unique("lang"))
    return pd.DataFrame({"lang": vals})


_CROSS_SQL = """
SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
"""


@register("region_nation_cross", _CROSS_SQL)
def region_nation_cross(sf_dir: str):
    """CROSS JOIN via broadcast (SURVEY §2.C12): the small side is
    ray.put ONCE and read once per actor — no per-batch re-conversion."""
    import pyarrow.parquet as pq

    from sous_chef_ray.stages.join import broadcast_join

    region = _read(sf_dir, "region", columns=["r_name"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_name"])
    return broadcast_join(region, nation, on=None, how="cross", concurrency=2)


@register("approx_distinct_users")  # sketch → rows-only (tolerance, not equality)
def approx_distinct_users(sf_dir: str):
    """HyperLogLog approximate COUNT(DISTINCT user_id): mergeable
    per-batch sketches (2^14 B each), merged driver-side
    (stages/sketch.py; ±~1% at p=14 — see tests)."""
    from sous_chef_ray.stages.sketch import approx_count_distinct

    ev = _read(sf_dir, "events", columns=["user_id"])
    est = approx_count_distinct(ev, "user_id", p=14)
    return pd.DataFrame({"approx_n_users": [float(round(est, 1))]})


@register("approx_quantile_quantity")  # KLL sketch → rows-only (tolerance)
def approx_quantile_quantity(sf_dir: str):
    """KLL-sketch approximate quantiles of l_quantity — mergeable
    per-batch sketches, no global sort (stages/sketch.KllSketch;
    rank error ~O(1/k), accuracy-tested in tests/test_sketch.py)."""
    from sous_chef_ray.stages.sketch import approx_quantiles

    li = _read(sf_dir, "lineitem", columns=["l_quantity"])
    qs = [0.25, 0.5, 0.75, 0.95]
    est = approx_quantiles(li, "l_quantity", qs, k=200)
    return pd.DataFrame({"q": qs, "approx_quantity": np.round(est, 2)})


@register("theta_click_purchase_overlap")  # theta sketch → rows-only (tolerance)
def theta_click_purchase_overlap(sf_dir: str):
    """Theta/KMV sketch set operations: |click ∪ purchase| /
    |click ∩ purchase| / |click \\ purchase| user cardinalities from two
    mergeable sketches — no distinct shuffle (stages/sketch.ThetaSketch)."""
    from sous_chef_ray.stages.sketch import ThetaSketch, theta_sketch_of

    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def only(kind):
        return ev.map_batches(
            lambda t, k=kind: t.filter(pc.equal(t["event_type"], k)),
            batch_format="pyarrow", zero_copy_batch=True,
        )

    a = theta_sketch_of(only("click"), "user_id", k=4096)
    b = theta_sketch_of(only("purchase"), "user_id", k=4096)
    return pd.DataFrame({
        "set_op": ["click", "purchase", "union", "intersection", "click_only"],
        "approx_users": [
            round(a.estimate(), 1), round(b.estimate(), 1),
            round(ThetaSketch.union(a, b), 1),
            round(ThetaSketch.intersection(a, b), 1),
            round(ThetaSketch.difference(a, b), 1),
        ],
    })


# ---------------------------------------------------------------------------
# C12: joins — hash (large-large), broadcast (dim), semi/anti
# ---------------------------------------------------------------------------

_JOIN_SQL = """
SELECT o.o_orderkey, o.o_totalprice, c.c_name, n.n_name
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
              JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'O'
"""


@register("orders_customer_nation", _JOIN_SQL)
def orders_customer_nation(sf_dir: str):
    """Inner joins: hash join for orders⋈customer (both scale with sf),
    broadcast join for the nation dim table (SURVEY §2.C12)."""
    from sous_chef_ray.stages.join import broadcast_join, hash_join

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"])
    orders = orders.map_batches(
        lambda t: t.filter(pc.equal(t["o_orderstatus"], "O")).drop_columns(["o_orderstatus"]),
        batch_format="pyarrow", zero_copy_batch=True)
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name", "c_nationkey"])
    joined = hash_join(orders, cust, on="o_custkey", right_on="c_custkey",
                       join_type="inner", num_partitions=_partitions(sf_dir, "orders", "customer"))
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    out = broadcast_join(joined, nation, on="c_nationkey", right_on="n_nationkey",
                         how="inner", concurrency=2)
    return out.select_columns(["o_orderkey", "o_totalprice", "c_name", "n_name"])


_LEFTJOIN_SQL = """
SELECT c.c_custkey, c.c_acctbal, o.o_orderkey, o.o_totalprice
FROM customer c LEFT JOIN orders o
  ON c.c_custkey = o.o_custkey AND o.o_totalprice > 100000
"""


@register("customer_left_join_orders", _LEFTJOIN_SQL)
def customer_left_join_orders(sf_dir: str):
    """LEFT OUTER hash join with a pushed-down right-side predicate."""
    from sous_chef_ray.stages.join import hash_join

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    orders = orders.map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], 100000.0)),
        batch_format="pyarrow", zero_copy_batch=True)
    out = hash_join(cust, orders, on="c_custkey", right_on="o_custkey",
                    join_type="left_outer", num_partitions=_partitions(sf_dir, "orders", "customer"))
    return out.select_columns(["c_custkey", "c_acctbal", "o_orderkey", "o_totalprice"])


_SEMI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
"""


@register("customers_with_big_orders", _SEMI_SQL)
def customers_with_big_orders(sf_dir: str):
    """Semi join: the filter keys are reduced DISTRIBUTEDLY (per-batch
    unique → Dataset.unique) before the small distinct set broadcasts —
    the big side never streams through the driver (SURVEY §4)."""
    from sous_chef_ray.stages.join import distinct_key_array, semi_join

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    big = orders.map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], 200000.0)).select(["o_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return semi_join(cust, distinct_key_array(big, "o_custkey"), "c_custkey",
                     concurrency=2)


@register("customers_with_big_orders_bloom", _SEMI_SQL)
def customers_with_big_orders_bloom(sf_dir: str):
    """Same semi join through the BLOOM pushdown path
    (stages/bloom.bloom_semi_filter): a constant-size bitmask broadcast
    pre-filters the big side (false positives only), the exact key-set
    filter removes the residue — the 100-TB shape where the exact key
    set itself would be too large to broadcast. Same oracle as the
    exact semi join, so end-to-end equality is driver-checked."""
    from sous_chef_ray.stages.bloom import bloom_semi_filter
    from sous_chef_ray.stages.join import distinct_key_array, semi_join

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    big = orders.map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], 200000.0)).select(["o_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    pre = bloom_semi_filter(cust, big, "c_custkey", small_col="o_custkey",
                            num_bits=1 << 16, concurrency=2)
    # exact residue removal over the (bloom-shrunk) stream
    return semi_join(pre, distinct_key_array(big, "o_custkey"), "c_custkey",
                     concurrency=2)


_CORR_SUBQ_SQL = """
SELECT o_orderkey, o_custkey,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
FROM orders o
WHERE o_totalprice > (SELECT AVG(o2.o_totalprice) FROM orders o2
                      WHERE o2.o_custkey = o.o_custkey)
"""


@register("orders_above_customer_avg", _CORR_SUBQ_SQL)
def orders_above_customer_avg(sf_dir: str):
    """Correlated-scalar-subquery shape (each row vs its group's
    aggregate): one grouped pre-aggregate (exact integer cents for a
    deterministic mean) broadcast back onto the stream — no row-at-a-time
    subquery, no second shuffle."""
    from sous_chef_ray.stages.join import broadcast_join

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"], "o_custkey": t["o_custkey"],
            "price_cents": pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                                   pa.int64()),
        })

    oc = orders.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    avg = (
        oc.groupby("o_custkey")
        .aggregate(Sum("price_cents", alias_name="sum_c"), Count(alias_name="n"))
        .to_pandas()
    )
    avg["avg_cents"] = avg["sum_c"] / avg["n"]
    out = broadcast_join(oc, avg[["o_custkey", "avg_cents"]], on="o_custkey")
    return out.map_batches(
        lambda t: t.filter(pc.greater(pc.cast(t["price_cents"], pa.float64()),
                                      t["avg_cents"])).select(
            ["o_orderkey", "o_custkey", "price_cents"]),
        batch_format="pyarrow",
    )


_RATIO_SQL = """
SELECT l_returnflag, l_orderkey, l_linenumber,
       CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_cents,
       CAST(ROUND(l_extendedprice * 100) AS BIGINT)
         / CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                OVER (PARTITION BY l_returnflag) AS DOUBLE) AS ratio_to_flag
FROM lineitem
"""


@register("lineitem_ratio_to_report", _RATIO_SQL)
def lineitem_ratio_to_report(sf_dir: str):
    """RATIO_TO_REPORT / percent-of-total window: value ÷ its
    partition's SUM — grouped exact-integer pre-aggregate broadcast back
    onto the stream (both sides divide the same integers, so the doubles
    hash identically)."""
    from sous_chef_ray.stages.join import broadcast_join

    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_orderkey", "l_linenumber",
                        "l_extendedprice"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": t["l_returnflag"], "l_orderkey": t["l_orderkey"],
            "l_linenumber": t["l_linenumber"],
            "price_cents": pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                                   pa.int64()),
        })

    lc = li.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    totals = (
        lc.groupby("l_returnflag")
        .aggregate(Sum("price_cents", alias_name="flag_total"))
        .to_pandas()
    )
    out = broadcast_join(lc, totals, on="l_returnflag")
    return out.map_batches(
        lambda t: t.append_column(
            "ratio_to_flag",
            pc.divide(pc.cast(t["price_cents"], pa.float64()),
                      pc.cast(t["flag_total"], pa.float64())),
        ).select(["l_returnflag", "l_orderkey", "l_linenumber",
                  "price_cents", "ratio_to_flag"]),
        batch_format="pyarrow",
    )


_ANTI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
"""


@register("customers_without_big_orders", _ANTI_SQL)
def customers_without_big_orders(sf_dir: str):
    """Anti join via distributed distinct reduction + broadcast filter."""
    from sous_chef_ray.stages.join import anti_join, distinct_key_array

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    big = orders.map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], 300000.0)).select(["o_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return anti_join(cust, distinct_key_array(big, "o_custkey"), "c_custkey",
                     concurrency=2)


# ---------------------------------------------------------------------------
# C13: UNION ALL
# ---------------------------------------------------------------------------

_UNION_SQL = """
SELECT user_id, ts, 'click' AS kind FROM events WHERE event_type = 'click'
UNION ALL
SELECT user_id, ts, 'purchase' AS kind FROM events WHERE event_type = 'purchase'
"""


@register("union_click_purchase", _UNION_SQL)
def union_click_purchase(sf_dir: str):
    """UNION ALL of two filtered streams (SURVEY §2.C13)."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def pick(kind):
        def fn(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t["event_type"], kind))
            return pa.table({
                "user_id": t["user_id"], "ts": t["ts"],
                "kind": pa.array([kind] * len(t), type=pa.string()),
            })
        return fn

    clicks = ev.map_batches(pick("click"), batch_format="pyarrow", zero_copy_batch=True)
    purch = ev.map_batches(pick("purchase"), batch_format="pyarrow", zero_copy_batch=True)
    return clicks.union(purch)


# ---------------------------------------------------------------------------
# C14-C19: scalar surface — arithmetic, CASE, null handling, datetime,
# string concat, casts
# ---------------------------------------------------------------------------

_SCALAR_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000) AS BIGINT)
         / 1000000.0 AS charge,
       CASE WHEN l_quantity < 10 THEN 'small'
            WHEN l_quantity < 30 THEN 'medium'
            ELSE 'large' END AS size_class,
       COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS flag_or_none,
       EXTRACT(month FROM l_shipdate) AS ship_month,
       CAST(l_quantity AS BIGINT) AS qty_int,
       l_returnflag || '-' || l_linestatus AS flag_status
FROM lineitem
"""


@register("lineitem_scalar_surface", _SCALAR_SQL)
def lineitem_scalar_surface(sf_dir: str):
    """One pass exercising C14 arithmetic, C15 CASE, C16 COALESCE/NULLIF,
    C17 EXTRACT, C18 concat, C19 CAST — all pyarrow.compute kernels."""
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
                        "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"])

    def derive(t: pa.Table) -> pa.Table:
        charge = pc.multiply(
            pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"])),
            pc.add(1.0, t["l_tax"]))
        charge = pc.divide(
            pc.cast(pc.round(pc.multiply(charge, 1e6)), pa.int64()), 1e6)
        q = t["l_quantity"]
        size_class = pc.case_when(
            pc.make_struct(pc.less(q, 10.0), pc.less(q, 30.0)),
            "small", "medium", "large")
        flag = pc.if_else(pc.equal(t["l_returnflag"], "N"),
                          pa.nulls(len(t), pa.string()), t["l_returnflag"])
        flag_or_none = pc.coalesce(flag, "none")
        ship_month = pc.cast(pc.month(t["l_shipdate"]), pa.int64())
        qty_int = pc.cast(q, pa.int64())
        flag_status = pc.binary_join_element_wise(
            t["l_returnflag"], t["l_linestatus"], "-")
        return pa.table({
            "l_orderkey": t["l_orderkey"], "l_linenumber": t["l_linenumber"],
            "charge": charge, "size_class": size_class,
            "flag_or_none": flag_or_none, "ship_month": ship_month,
            "qty_int": qty_int, "flag_status": flag_status,
        })

    return li.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)


_DATETRUNC_SQL = """
SELECT date_trunc('week', ts) AS week,
       COUNT(*) AS n_events,
       SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS total_value
FROM events GROUP BY date_trunc('week', ts)
"""


@register("weekly_event_rollup", _DATETRUNC_SQL)
def weekly_event_rollup(sf_dir: str):
    """DATE_TRUNC + grouped aggregate (SURVEY §2.C17)."""
    ev = _read(sf_dir, "events", columns=["ts", "value"])

    def derive(t: pa.Table) -> pa.Table:
        week = pc.floor_temporal(t["ts"], unit="week")
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        return pa.table({"week": week, "cents": cents})

    agg = (
        ev.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("week")
        .aggregate(Count(alias_name="n_events"), Sum("cents", alias_name="cents"))
        .to_pandas()
    )
    return pd.DataFrame({
        "week": agg["week"], "n_events": agg["n_events"],
        "total_value": agg["cents"] / 100.0,
    })


# ---------------------------------------------------------------------------
# global top-k (sort + limit)
# ---------------------------------------------------------------------------

_GLOBAL_TOPK_SQL = """
SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


@register("top10_orders_global", _GLOBAL_TOPK_SQL)
def top10_orders_global(sf_dir: str):
    """Global top-k = ds.sort(desc).limit(k) (SURVEY §2.C11)."""
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return (
        orders.sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(10)
        .select_columns(["o_orderkey", "o_totalprice"])
    )


@register("asof_last_purchase_partitioned", _ASOF_SQL)
def asof_last_purchase_partitioned(sf_dir: str):
    """Same point-in-time semantics via the LARGE-LARGE strategy:
    hash-bucket co-partitioned sorted merge (stages.asof
    .asof_join_partitioned) — validates both physical plans against one
    oracle."""
    from sous_chef_ray.stages.asof import asof_join_partitioned

    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_type", "value"])

    def to_feats(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        return pa.table({"user_id": t["user_id"], "fts": t["ts"], "value": t["value"]})

    def to_spine(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "click"))
        return pa.table({"user_id": t["user_id"], "ts": t["ts"]})

    feats = ev.map_batches(to_feats, batch_format="pyarrow", zero_copy_batch=True)
    spine = ev.map_batches(to_spine, batch_format="pyarrow", zero_copy_batch=True)
    out = asof_join_partitioned(
        spine, feats, key="user_id", left_ts="ts", right_ts="fts",
        payload_cols=["value"], ttl=pd.Timedelta(days=7), num_buckets=_buckets(sf_dir, "events"),
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "ts": t["ts"].cast(pa.timestamp("us")),
            "last_purchase_value": t["value"],
        })

    return out.map_batches(finish, batch_format="pyarrow")


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
# C7/C11: rank, row_number, top-k per group
# ---------------------------------------------------------------------------

_TOPK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) WHERE rn <= 3
"""


@register("top_orders_per_customer", _TOPK_SQL)
def top_orders_per_customer(sf_dir: str):
    """Top-3 orders by price per customer — QUALIFY row_number()<=k
    (SURVEY §2.C11) via stages.window.topk_per_group."""
    from sous_chef_ray.stages.window import topk_per_group

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"])
    out = topk_per_group(
        orders, "o_custkey", ["o_totalprice", "o_orderkey"], k=3,
        descending=[True, False], num_buckets=_buckets(sf_dir, "orders"),
    )
    return out.select_columns(["o_custkey", "o_orderkey", "o_totalprice"])


_RANK_SQL = """
SELECT o_custkey, o_orderkey,
       row_number() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey) AS rn,
       rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk,
       dense_rank() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC) AS drnk
FROM orders
"""


@register("order_rank_per_customer", _RANK_SQL)
def order_rank_per_customer(sf_dir: str):
    """ROW_NUMBER + RANK + DENSE_RANK per partition (SURVEY §2.C7)."""
    from sous_chef_ray.stages.window import with_rank, with_row_number

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"])
    out = with_row_number(
        orders, "o_custkey", ["o_totalprice", "o_orderkey"],
        descending=[True, False], name="rn", num_buckets=_buckets(sf_dir, "orders"),
    )
    out = with_rank(out, "o_custkey", "o_totalprice", descending=True,
                    name="rnk", num_buckets=_buckets(sf_dir, "orders"))
    out = with_rank(out, "o_custkey", "o_totalprice", descending=True,
                    name="drnk", dense=True, num_buckets=_buckets(sf_dir, "orders"))
    return out.select_columns(["o_custkey", "o_orderkey", "rn", "rnk", "drnk"])


# ---------------------------------------------------------------------------
# C8/C9: lag/lead, first/last value
# ---------------------------------------------------------------------------

_LAGLEAD_SQL = """
SELECT user_id, event_id, ts, value,
       lag(value) OVER w AS prev_value,
       lead(value) OVER w AS next_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@register("event_lag_lead", _LAGLEAD_SQL)
def event_lag_lead(sf_dir: str):
    """LAG/LEAD within user ordered by (ts, event_id) (SURVEY §2.C8)."""
    from sous_chef_ray.stages.window import with_lag_lead

    ev = _read(sf_dir, "events", columns=["user_id", "event_id", "ts", "value"])
    out = with_lag_lead(
        ev, "user_id", ["ts", "event_id"], "value",
        lag_name="prev_value", lead_name="next_value", num_buckets=_buckets(sf_dir, "events"),
    )
    return out.select_columns(["user_id", "event_id", "ts", "value", "prev_value", "next_value"])


_FIRSTLAST_SQL = """
SELECT user_id, event_id, ts,
       first_value(value) OVER w AS first_value_seen,
       last_value(value) OVER w AS last_value_seen
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


@register("event_first_last", _FIRSTLAST_SQL)
def event_first_last(sf_dir: str):
    """FIRST_VALUE / LAST_VALUE over whole key partition (SURVEY §2.C9)."""
    from sous_chef_ray.stages.window import with_first_last

    ev = _read(sf_dir, "events", columns=["user_id", "event_id", "ts", "value"])
    out = with_first_last(
        ev, "user_id", ["ts", "event_id"], "value",
        first_name="first_value_seen", last_name="last_value_seen", num_buckets=_buckets(sf_dir, "events"),
    )
    return out.select_columns(["user_id", "event_id", "ts", "first_value_seen", "last_value_seen"])


# ---------------------------------------------------------------------------
# C10: moving-window aggregate (exact integer cents)
# ---------------------------------------------------------------------------

_ROLLING_SQL = """
SELECT user_id, event_id, ts,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT) AS rolling_cents,
       SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w
         / (100.0 * COUNT(*) OVER w) AS rolling_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
"""


@register("rolling_event_value", _ROLLING_SQL)
def rolling_event_value(sf_dir: str):
    """AVG/SUM OVER (... ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
    (SURVEY §2.C10) — exact integer-cents rolling sum."""
    from sous_chef_ray.stages.window import with_rolling_sum_count

    ev = _read(sf_dir, "events", columns=["user_id", "event_id", "ts", "value"])

    def cents(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        return t.drop_columns(["value"]).append_column("cents", c)

    out = with_rolling_sum_count(
        ev.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        "user_id", ["ts", "event_id"], "cents", window=30,
        sum_name="rolling_cents", cnt_name="rolling_cnt", num_buckets=_buckets(sf_dir, "events"),
    )

    def finish(t: pa.Table) -> pa.Table:
        rc = pc.cast(t["rolling_cents"], pa.int64())
        avg = pc.divide(pc.cast(rc, pa.float64()),
                        pc.multiply(pc.cast(t["rolling_cnt"],
                                            pa.float64()), 100.0))
        return pa.table({"user_id": t["user_id"], "event_id": t["event_id"],
                         "ts": t["ts"], "rolling_cents": rc,
                         "rolling_avg": avg})

    return out.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


_CENTERED_ROLLING_SQL = """
SELECT user_id, event_id, ts,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT)
         AS centered_cents,
       CAST(COUNT(*) OVER w AS BIGINT) AS centered_cnt
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
"""


@register("centered_rolling_event_value", _CENTERED_ROLLING_SQL)
def centered_rolling_event_value(sf_dir: str):
    """Centered frame: ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING — the
    lookahead side of §2.C10, same prefix-sum kernel with a clipped
    group-end upper bound (stages/window.with_rolling_sum_count
    following=2)."""
    from sous_chef_ray.stages.window import with_rolling_sum_count

    ev = _read(sf_dir, "events", columns=["user_id", "event_id", "ts", "value"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"], "event_id": t["event_id"], "ts": t["ts"],
            "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64()),
        })

    out = with_rolling_sum_count(
        ev.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        "user_id", ["ts", "event_id"], "cents", window=3, following=2,
        sum_name="centered_cents", cnt_name="centered_cnt",
        num_buckets=_buckets(sf_dir, "events"),
    )
    return out.select_columns(
        ["user_id", "event_id", "ts", "centered_cents", "centered_cnt"]
    )


_ROLLING_TIME_SQL = """
SELECT user_id, event_id, ts,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT)
         AS rolling_1h_cents,
       CAST(COUNT(*) OVER w AS BIGINT) AS rolling_1h_cnt
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


@register("rolling_time_event_value", _ROLLING_TIME_SQL)
def rolling_time_event_value(sf_dir: str):
    """Time-RANGE moving window (RANGE BETWEEN INTERVAL 1 HOUR PRECEDING):
    per-run binary-searched frame bounds + prefix sums
    (stages/window.with_rolling_time_sum) — the time-based sibling of
    the ROWS-frame C10 operator, incl. SQL's peers-share-frame tie rule."""
    from sous_chef_ray.stages.window import with_rolling_time_sum

    ev = _read(sf_dir, "events", columns=["user_id", "event_id", "ts", "value"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"], "event_id": t["event_id"], "ts": t["ts"],
            "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64()),
        })

    out = with_rolling_time_sum(
        ev.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        "user_id", "ts", "cents", pd.Timedelta(hours=1), tie_by="event_id",
        sum_name="rolling_1h_cents", cnt_name="rolling_1h_cnt",
        num_buckets=_buckets(sf_dir, "events"),
    )
    return out.select_columns(
        ["user_id", "event_id", "ts", "rolling_1h_cents", "rolling_1h_cnt"]
    )


_TUMBLING_SQL = """
SELECT event_type, time_bucket(INTERVAL '6 hours', ts) AS window_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events GROUP BY event_type, time_bucket(INTERVAL '6 hours', ts)
"""


@register("tumbling_6h_by_type", _TUMBLING_SQL)
def tumbling_6h_by_type(sf_dir: str):
    """Tumbling event-time windows (streaming-shaped workload on the
    batch engine): epoch-aligned 6h windows per event_type
    (stages/timewindow.tumbling_window_agg)."""
    from sous_chef_ray.stages.timewindow import tumbling_window_agg

    ev = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"], "ts": t["ts"],
            "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64()),
        })

    return tumbling_window_agg(
        ev.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        "event_type", "ts", pd.Timedelta(hours=6), value_int_col="cents",
    )


_HOPPING_SQL = """
WITH grid AS (
  SELECT unnest(generate_series(TIMESTAMP '2023-12-31 18:00:00',
                                TIMESTAMP '2024-02-01 00:00:00',
                                INTERVAL 2 HOUR)) AS window_start)
SELECT e.event_type, g.window_start, COUNT(*) AS n_events
FROM events e JOIN grid g
  ON g.window_start <= e.ts AND g.window_start > e.ts - INTERVAL 6 HOUR
GROUP BY e.event_type, g.window_start
"""


@register("hopping_6h_2h_by_type", _HOPPING_SQL)
def hopping_6h_2h_by_type(sf_dir: str):
    """Hopping (overlapping) windows, size 6h hop 2h: each event is
    exploded into its 3 windows, then a hash aggregate
    (stages/timewindow.hopping_window_agg)."""
    from sous_chef_ray.stages.timewindow import hopping_window_agg

    ev = _read(sf_dir, "events", columns=["event_type", "ts"])
    return hopping_window_agg(
        ev, "event_type", "ts", pd.Timedelta(hours=6), pd.Timedelta(hours=2)
    )


# ---------------------------------------------------------------------------
# North-rule: gap-based sessionization
# ---------------------------------------------------------------------------

_RUNNING_SQL = """
SELECT user_id, event_id, ts,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
FROM events
"""


@register("running_event_value", _RUNNING_SQL)
def running_event_value(sf_dir: str):
    """Running cumulative sum per key (SUM OVER ROWS UNBOUNDED
    PRECEDING) — exact integer cents (SURVEY §2.C10 family)."""
    from sous_chef_ray.stages.window import with_running_sum

    ev = _read(sf_dir, "events", columns=["user_id", "event_id", "ts", "value"])

    def cents(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        return t.drop_columns(["value"]).append_column("cents", c)

    out = with_running_sum(
        ev.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        "user_id", ["ts", "event_id"], "cents",
        name="running_cents", num_buckets=_buckets(sf_dir, "events"),
    )
    return out.select_columns(["user_id", "event_id", "ts", "running_cents"])


_SESSION_SQL = """
SELECT user_id, event_id, ts,
       CAST(SUM(CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
FROM (SELECT user_id, event_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events)
"""


@register("sessionize_events", _SESSION_SQL)
def sessionize_events(sf_dir: str):
    """Gap-based sessionization, 30-minute gap (SURVEY §2.D)."""
    from sous_chef_ray.stages.session import sessionize

    ev = _read(sf_dir, "events", columns=["user_id", "event_id", "ts"])
    out = sessionize(
        ev, "user_id", "ts", gap=pd.Timedelta(minutes=30),
        tie_by="event_id", num_buckets=_buckets(sf_dir, "events"),
    )
    return out.select_columns(["user_id", "event_id", "ts", "session_id"])


_SESSION_STATS_SQL = """
WITH s AS (
  SELECT user_id, ts, value,
         CAST(SUM(CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM (SELECT user_id, event_id, ts, value,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS prev_ts
        FROM events)
)
SELECT user_id, session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS duration_us
FROM s GROUP BY user_id, session_id
"""


@register("session_value_stats", _SESSION_STATS_SQL)
def session_value_stats(sf_dir: str):
    """Per-session aggregates over gap sessions (SURVEY §2.D composed
    with §2.C3): sessionize keeps payload columns, timestamps aggregate
    as int64 µs (Ray's pandas reduce mangles nullable timestamps — the
    funnel query's documented workaround), exact integer cents."""
    from ray.data.aggregate import Count, Max, Min, Sum

    from sous_chef_ray.stages.session import sessionize

    ev = _read(sf_dir, "events",
               columns=["user_id", "event_id", "ts", "value"])
    sess = sessionize(
        ev, "user_id", "ts", gap=pd.Timedelta(minutes=30),
        tie_by="event_id", num_buckets=_buckets(sf_dir, "events"),
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "session_id": t["session_id"],
            "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                             pa.int64()),
            "ts_us": pc.cast(t["ts"].combine_chunks().cast(
                pa.timestamp("us")), pa.int64()),
        })

    agg = (sess.map_batches(prep, batch_format="pyarrow",
                            zero_copy_batch=True)
           .groupby(["user_id", "session_id"])
           .aggregate(Count(alias_name="n_events"),
                      Sum("cents", alias_name="sum_cents"),
                      Min("ts_us", alias_name="__t0"),
                      Max("ts_us", alias_name="__t1")))
    return agg.map_batches(
        lambda t: pa.table({
            "user_id": t["user_id"], "session_id": t["session_id"],
            "n_events": pc.cast(t["n_events"], pa.int64()),
            "sum_cents": t["sum_cents"],
            "duration_us": pc.subtract(t["__t1"], t["__t0"]),
        }),
        batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# North-rule: backfill over a dense spine
# ---------------------------------------------------------------------------

_BACKFILL_SQL = """
WITH users AS (SELECT DISTINCT user_id FROM events),
     grid AS (SELECT unnest(generate_series(TIMESTAMP '2024-01-05',
                                            TIMESTAMP '2024-01-25',
                                            INTERVAL 1 DAY)) AS grid_ts),
     spine AS (SELECT u.user_id, g.grid_ts FROM users u CROSS JOIN grid g),
     f AS (SELECT user_id, ts AS fts, value FROM events WHERE event_type = 'purchase'),
     j AS (SELECT s.user_id, s.grid_ts, f.fts, f.value
           FROM spine s ASOF LEFT JOIN f
             ON s.user_id = f.user_id AND f.fts <= s.grid_ts)
SELECT user_id, grid_ts,
       CASE WHEN fts >= grid_ts - INTERVAL 3 DAY THEN value END AS filled_value
FROM j
"""


@register("backfill_daily_purchase", _BACKFILL_SQL)
def backfill_daily_purchase(sf_dir: str):
    """Forward-fill last purchase value onto a dense per-user daily grid,
    TTL 3 days (SURVEY §2.D backfill; nulls where expired)."""
    from sous_chef_ray.stages.backfill import backfill, dense_spine

    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_type", "value"])

    def to_feats(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        return pa.table({"user_id": t["user_id"], "fts": t["ts"], "value": t["value"]})

    feats = ev.map_batches(to_feats, batch_format="pyarrow", zero_copy_batch=True)
    users = sorted(ev.unique("user_id"))
    spine = dense_spine(
        np.array(users, dtype=np.int64),
        np.datetime64("2024-01-05"), np.datetime64("2024-01-25"),
        pd.Timedelta(days=1), key_name="user_id", ts_name="grid_ts",
    )
    out = backfill(
        feats, spine, key="user_id", spine_ts="grid_ts", feature_ts="fts",
        payload_cols=["value"], ttl=pd.Timedelta(days=3), concurrency=2,
    )
    return pa.table(
        {"user_id": out["user_id"], "grid_ts": out["grid_ts"],
         "filled_value": out["value"]}
    )


@register("approx_distinct_users_per_type")  # sketch aggregate → rows-only
def approx_distinct_users_per_type(sf_dir: str):
    """Grouped HyperLogLog as a NATIVE Ray Data aggregate
    (stages/sketch.HllDistinct, AggregateFnV2): per-block partial
    registers, register max-merge in the shuffle — approximate
    COUNT(DISTINCT user_id) per event_type without a distinct shuffle."""
    from sous_chef_ray.stages.sketch import HllDistinct

    ev = _read(sf_dir, "events", columns=["event_type", "user_id"])
    out = (
        ev.groupby("event_type")
        .aggregate(HllDistinct(on="user_id", p=14, alias_name="approx_users"))
        .to_pandas()
    )
    out["approx_users"] = out["approx_users"].round(1)
    return out.sort_values("event_type").reset_index(drop=True)


@register("approx_median_value_per_type")  # sketch aggregate → rows-only
def approx_median_value_per_type(sf_dir: str):
    """Grouped KLL quantile as a NATIVE Ray Data aggregate
    (stages/sketch.KllQuantile, AggregateFnV2): per-block few-KB
    sketches, level-concat merge in the shuffle — approximate
    MEDIAN(value) per event_type with no per-group sort and no value
    shuffle (accuracy pinned in tests/test_sketch.py)."""
    from sous_chef_ray.stages.sketch import KllQuantile

    ev = _read(sf_dir, "events", columns=["event_type", "value"])
    out = (
        ev.groupby("event_type")
        .aggregate(KllQuantile(on="value", q=0.5, k=200, alias_name="approx_median"))
        .to_pandas()
    )
    out["approx_median"] = out["approx_median"].round(2)
    return out.sort_values("event_type").reset_index(drop=True)


_PROFILE_SQL = """
SELECT 'l_quantity' AS col,
       MIN(l_quantity) AS min_v, MAX(l_quantity) AS max_v,
       CAST(COUNT(l_quantity) AS BIGINT) AS n_nonnull,
       CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS n_distinct
FROM lineitem
UNION ALL
SELECT 'l_discount', MIN(l_discount), MAX(l_discount),
       CAST(COUNT(l_discount) AS BIGINT),
       CAST(COUNT(DISTINCT l_discount) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'l_tax', MIN(l_tax), MAX(l_tax),
       CAST(COUNT(l_tax) AS BIGINT),
       CAST(COUNT(DISTINCT l_tax) AS BIGINT)
FROM lineitem
"""


@register("lineitem_profile", _PROFILE_SQL)
def lineitem_profile(sf_dir: str):
    """Column profiling (describe): min/max/non-null/distinct per column
    in ONE streaming pass — per-batch partial stats merged on the driver.
    Exact distinct via per-batch value sets is right for LOW-cardinality
    columns (bounded by cardinality, not table size); for high-cardinality
    columns swap in the mergeable HLL (`stages.sketch.HllDistinct`)."""
    cols = ["l_quantity", "l_discount", "l_tax"]
    li = _read(sf_dir, "lineitem", columns=cols)

    def partial(t: pa.Table) -> pa.Table:
        rows = []
        for c in cols:
            a = t[c]
            rows.append({
                "col": c,
                "min_v": pc.min(a).as_py(),
                "max_v": pc.max(a).as_py(),
                "n_nonnull": len(a) - a.null_count,
                "distinct_vals": pc.unique(a.combine_chunks()).to_pylist(),
            })
        return pa.table({
            "col": pa.array([r["col"] for r in rows]),
            "min_v": pa.array([r["min_v"] for r in rows], type=pa.float64()),
            "max_v": pa.array([r["max_v"] for r in rows], type=pa.float64()),
            "n_nonnull": pa.array([r["n_nonnull"] for r in rows], type=pa.int64()),
            "distinct_vals": pa.array([r["distinct_vals"] for r in rows],
                                      type=pa.list_(pa.float64())),
        })

    parts = li.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    out = []
    for c in cols:
        sub = parts[parts["col"] == c]
        distinct = set()
        for vals in sub["distinct_vals"]:
            distinct.update(float(v) for v in vals)
        out.append({
            "col": c,
            "min_v": float(sub["min_v"].min()),
            "max_v": float(sub["max_v"].max()),
            "n_nonnull": int(sub["n_nonnull"].sum()),
            "n_distinct": len(distinct),
        })
    return pd.DataFrame(out)


_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


@register("lineitem_rollup", _ROLLUP_SQL)
def lineitem_rollup(sf_dir: str):
    """GROUP BY ROLLUP(a, b): the three aggregation levels — (a,b), (a),
    grand total — computed as three groupbys over one pre-aggregated
    (a,b) base (the finest level re-aggregates, so the raw table streams
    ONCE) and unioned with typed-null padding."""
    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_extendedprice"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "cents": pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                             pa.int64()),
        })

    base = (
        li.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Count(alias_name="n"), Sum("cents", alias_name="price_cents"))
        .to_pandas()
    )
    lvl1 = (
        base.groupby("l_returnflag", as_index=False)[["n", "price_cents"]].sum()
    )
    lvl1["l_linestatus"] = None
    total = pd.DataFrame({
        "l_returnflag": [None], "l_linestatus": [None],
        "n": [base["n"].sum()], "price_cents": [base["price_cents"].sum()],
    })
    out = pd.concat(
        [base, lvl1, total], ignore_index=True
    )[["l_returnflag", "l_linestatus", "n", "price_cents"]]
    out["n"] = out["n"].astype("int64")
    out["price_cents"] = out["price_cents"].astype("int64")
    return out


_UNPIVOT_SQL = """
SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
       l_quantity AS value FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
"""


@register("lineitem_unpivot", _UNPIVOT_SQL)
def lineitem_unpivot(sf_dir: str):
    """UNPIVOT/melt: wide numeric columns → (metric, value) long rows,
    one vectorized per-batch explode (3× rows out, zero-copy key
    replication) — the inverse of the conditional-agg pivot."""
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_quantity",
                        "l_discount", "l_tax"])
    metrics = ["l_quantity", "l_discount", "l_tax"]

    def melt(t: pa.Table) -> pa.Table:
        n = len(t)
        keys_ok = pa.chunked_array([t["l_orderkey"]] * len(metrics)).combine_chunks()
        keys_ln = pa.chunked_array([t["l_linenumber"]] * len(metrics)).combine_chunks()
        metric = pa.array(np.repeat(np.asarray(metrics, dtype=object), n),
                          type=pa.string())
        value = pa.chunked_array([t[m] for m in metrics]).combine_chunks()
        return pa.table({
            "l_orderkey": keys_ok, "l_linenumber": keys_ln,
            "metric": metric, "value": value,
        })

    return li.map_batches(melt, batch_format="pyarrow", zero_copy_batch=True)


_JSON_SQL = """
SELECT event_type,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(COUNT(json_extract(props, '$.k')) AS BIGINT) AS n_k
FROM events GROUP BY event_type
"""


@register("event_props_json", _JSON_SQL)
def event_props_json(sf_dir: str):
    """JSON field extraction from a string payload column
    (functions/sqlfns.json_extract_int: one vectorized RE2 pass, no
    per-row json.loads) → grouped exact integer aggregate; DuckDB
    json_extract oracle."""
    from sous_chef_ray.functions.sqlfns import json_extract_int

    ev = _read(sf_dir, "events", columns=["event_type", "props"])

    def extract(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "k": json_extract_int(t["props"].combine_chunks(), "k"),
        })

    out = (
        ev.map_batches(extract, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(Sum("k", alias_name="sum_k"), Count("k", alias_name="n_k"))
        .to_pandas()
    )
    out["sum_k"] = out["sum_k"].astype("int64")
    out["n_k"] = out["n_k"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


_FREQ_ITEMS_SQL = """
SELECT event_type AS item, CAST(COUNT(*) AS BIGINT) AS est_count
FROM events GROUP BY event_type
"""


@register("frequent_event_types", _FREQ_ITEMS_SQL)
def frequent_event_types(sf_dir: str):
    """Misra-Gries heavy hitters (stages/sketch.frequent_items): the
    shuffle moves ≤ k (item, count) counters per block. With distinct
    items ≤ k the sketch is EXACT, so this checks against the plain
    GROUP BY COUNT oracle; the approximate guarantee (containment of
    items with freq > n/(k+1)) is pytest-pinned on Zipf data."""
    from sous_chef_ray.stages.sketch import frequent_items

    ev = _read(sf_dir, "events", columns=["event_type"])
    out = frequent_items(ev, "event_type", k=32)
    return out.sort_values("item").reset_index(drop=True)


_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents
FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


@register("lineitem_grouping_sets", _GROUPING_SETS_SQL)
def lineitem_grouping_sets(sf_dir: str):
    """GROUP BY GROUPING SETS ((a), (b), ()): every set re-aggregates
    from ONE pre-aggregated (a, b) base — the raw table streams once and
    the base (|a|×|b| rows) is driver-sized; each set is a pandas
    re-group with typed-null padding for the absent key."""
    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_extendedprice"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "cents": pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                             pa.int64()),
        })

    base = (
        li.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Count(alias_name="n"), Sum("cents", alias_name="price_cents"))
        .to_pandas()
    )
    by_flag = base.groupby("l_returnflag", as_index=False)[["n", "price_cents"]].sum()
    by_flag["l_linestatus"] = None
    by_status = base.groupby("l_linestatus", as_index=False)[["n", "price_cents"]].sum()
    by_status["l_returnflag"] = None
    total = pd.DataFrame({
        "l_returnflag": [None], "l_linestatus": [None],
        "n": [base["n"].sum()], "price_cents": [base["price_cents"].sum()],
    })
    out = pd.concat(
        [by_flag, by_status, total], ignore_index=True
    )[["l_returnflag", "l_linestatus", "n", "price_cents"]]
    out["n"] = out["n"].astype("int64")
    out["price_cents"] = out["price_cents"].astype("int64")
    return out


_CUBE_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("lineitem_cube", _CUBE_SQL)
def lineitem_cube(sf_dir: str):
    """GROUP BY CUBE (a, b) = GROUPING SETS ((a,b),(a),(b),()): the
    same one-streaming-pass plan as lineitem_grouping_sets — the raw
    table aggregates once to the (a, b) base (driver-sized: |a|×|b|
    rows) and all four sets re-aggregate from that base."""
    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_extendedprice"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "cents": pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                             pa.int64()),
        })

    base = (
        li.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Count(alias_name="n"), Sum("cents", alias_name="price_cents"))
        .to_pandas()
    )
    by_flag = base.groupby("l_returnflag", as_index=False)[["n", "price_cents"]].sum()
    by_flag["l_linestatus"] = None
    by_status = base.groupby("l_linestatus", as_index=False)[["n", "price_cents"]].sum()
    by_status["l_returnflag"] = None
    total = pd.DataFrame({
        "l_returnflag": [None], "l_linestatus": [None],
        "n": [base["n"].sum()], "price_cents": [base["price_cents"].sum()],
    })
    out = pd.concat(
        [base, by_flag, by_status, total], ignore_index=True
    )[["l_returnflag", "l_linestatus", "n", "price_cents"]]
    out["n"] = out["n"].astype("int64")
    out["price_cents"] = out["price_cents"].astype("int64")
    return out


_STREAMING_SQL = """
SELECT user_id, time_bucket(INTERVAL '6 hours', ts) AS window_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value
FROM events GROUP BY user_id, time_bucket(INTERVAL '6 hours', ts)
"""


@register("streaming_tumbling_by_user", _STREAMING_SQL)
def streaming_tumbling_by_user(sf_dir: str):
    """Streaming tumbling windows with watermark (stages/streaming.py),
    SHARD-FED: the events table hash-partitions by user (one shuffle);
    each shard sorts by event time inside its own Ray task and streams
    through its watermark state machine in arrival-ordered chunks — no
    global sort, no driver byte path (round-2 review item). The operator
    returns a Dataset (round-3 review item: no driver collect inside the
    operator); this bounded oracle query collects it at the end. The
    result must reproduce the batch aggregate EXACTLY (SQL oracle)."""
    from sous_chef_ray.stages.streaming import (
        collect_closed_windows, streaming_tumbling_window_sharded)

    ev = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"], "ts": t["ts"],
            "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64()),
        })

    out_ds = streaming_tumbling_window_sharded(
        ev.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        key_col="user_id", ts_col="ts", value_col="cents",
        window=pd.Timedelta(hours=6), allowed_lateness=pd.Timedelta(hours=1),
        num_shards=max(4, _buckets(sf_dir, "events")),
    )
    out, dropped = collect_closed_windows(out_ds, "user_id", ["window_start"])
    assert dropped == 0, dropped
    return out[["user_id", "window_start", "n_events", "sum_value"]]


_STREAM_SESSION_SQL = """
WITH lagd AS (
  SELECT user_id, ts, value, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events),
sess AS (
  SELECT user_id, ts, value,
         CAST(SUM(CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
  FROM lagd)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value
FROM sess GROUP BY user_id, sid
"""


@register("streaming_sessions_by_user", _STREAM_SESSION_SQL)
def streaming_sessions_by_user(sf_dir: str):
    """STREAMING gap-sessionization with watermark + session merging
    (stages/streaming.WatermarkSessionWindow), SHARD-FED: hash-partition
    by user, per-shard event-time order, per-shard watermark — closed +
    flushed sessions equal the batch sessionization aggregate EXACTLY
    (SQL oracle). No global sort, no driver ingest loop; the operator
    returns a Dataset and this bounded oracle query collects it."""
    from sous_chef_ray.stages.streaming import (
        collect_closed_windows, streaming_session_window_sharded)

    ev = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"], "ts": t["ts"],
            "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64()),
        })

    out_ds = streaming_session_window_sharded(
        ev.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        key_col="user_id", ts_col="ts", value_col="cents",
        gap=pd.Timedelta(minutes=30), allowed_lateness=pd.Timedelta(minutes=5),
        num_shards=max(4, _buckets(sf_dir, "events")),
    )
    out, dropped = collect_closed_windows(out_ds, "user_id", ["session_start"])
    assert dropped == 0, dropped
    return out[["user_id", "session_start", "session_end", "n_events", "sum_value"]]


_EMB_NEARDUP_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.v, b.v), 6) AS cosine_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.3
"""


@register("embedding_neardup_pairs", _EMB_NEARDUP_SQL)
def embedding_neardup_pairs(sf_dir: str):
    """Embedding-cosine near-dup pairs (cosine ≥ 0.3, id_a < id_b):
    broadcast corpus matrix, per-batch matmul, pairs only move
    (stages/similarity.cosine_pairs_above). Exact vs a DuckDB
    list_cosine_similarity self-join."""
    from sous_chef_ray.stages.similarity import cosine_pairs_above

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return cosine_pairs_above(emb, 0.3, id_col="vec_id", emb_col="embedding",
                              concurrency=2)


@register("semdedup_embeddings")  # clustering not SQL-expressible → rows-only
def semdedup_embeddings(sf_dir: str):
    """SemDeDup semantic dedup (stages/similarity.semdedup, Abbas et al.
    2023): spherical k-means clusters the embedding table, then a
    per-cluster greedy cosine prune keeps the lowest-id member of every
    near-duplicate group. All-pairs work stays inside clusters; the
    driver sees only the k x d centroid table. Group-keep semantics and
    partition invariance are pinned in tests/test_multimodal_lsh.py."""
    from sous_chef_ray.stages.similarity import semdedup

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = semdedup(emb, n_clusters=8, threshold=0.995, num_buckets=8)
    return out.to_pandas().sort_values("vec_id").reset_index(drop=True)


@register("embedding_neardup_pairs_lsh", _EMB_NEARDUP_SQL)
def embedding_neardup_pairs_lsh(sf_dir: str):
    """Embedding-cosine near-dup pairs via the BUCKETED scale path
    (stages/similarity.cosine_pairs_lsh): hyperplane-LSH buckets emit
    slim (table, code, id) rows, within-bucket candidate pairs are
    exact-verified through distributed hash joins of candidate-only
    embedding blobs — the corpus never materializes on the driver.
    Same DuckDB oracle as the brute-force op; bits/num_tables sized so
    recall at threshold 0.3 is 1.0 (checked exact at sf0.001/sf0.01).
    NOTE: 0.3 is the exactness STRESS setting — at such a low threshold
    nearly every pair is a candidate, so this runs as distributed
    all-pairs by design; production near-dup thresholds (≥0.8, see
    tests' planted-cluster case) keep candidate sets sparse."""
    from sous_chef_ray.stages.similarity import cosine_pairs_lsh

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return cosine_pairs_lsh(emb, 0.3, id_col="vec_id", emb_col="embedding",
                            bits=2, num_tables=64, concurrency=2)


@register("embedding_neardup_pairs_ivf", _EMB_NEARDUP_SQL)
def embedding_neardup_pairs_ivf(sf_dir: str):
    """Embedding-cosine near-dup pairs via the IVF-cell-bucketed scale
    path (stages/similarity.cosine_pairs_ivf): data-adaptive k-means
    cells replace LSH's random hyperplanes; rows multi-assign to their
    n_assign closest cells, within-cell candidate pairs go through the
    same distributed exact verifier. Same DuckDB oracle as the brute
    path; n_assign == n_centroids is the exactness STRESS setting (every
    row in every cell ⇒ distributed all-pairs by design) — production
    near-dup thresholds keep n_assign ≪ n_centroids and candidates
    sparse (see tests' planted-cluster case)."""
    from sous_chef_ray.stages.similarity import cosine_pairs_ivf

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return cosine_pairs_ivf(emb, 0.3, id_col="vec_id", emb_col="embedding",
                            n_centroids=8, n_assign=8, concurrency=2)


_INTERSECT_SQL = """
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
"""


@register("users_click_and_purchase", _INTERSECT_SQL)
def users_click_and_purchase(sf_dir: str):
    """INTERSECT: distinct reduction of each side in the cluster, then a
    vectorized membership filter of the two (small) distinct sets."""
    from sous_chef_ray.stages.join import distinct_key_array

    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def pick(kind):
        return ev.map_batches(
            lambda t, k=kind: t.filter(pc.equal(t["event_type"], k)).select(["user_id"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )

    a = distinct_key_array(pick("click"), "user_id")
    b = distinct_key_array(pick("purchase"), "user_id")
    return pa.table({"user_id": a.filter(pc.is_in(a, value_set=b))})


_EXCEPT_SQL = """
SELECT user_id FROM events WHERE event_type = 'click'
EXCEPT
SELECT user_id FROM events WHERE event_type = 'purchase'
"""


@register("users_click_not_purchase", _EXCEPT_SQL)
def users_click_not_purchase(sf_dir: str):
    """EXCEPT: same distinct-then-membership shape, inverted mask."""
    from sous_chef_ray.stages.join import distinct_key_array

    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def pick(kind):
        return ev.map_batches(
            lambda t, k=kind: t.filter(pc.equal(t["event_type"], k)).select(["user_id"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )

    a = distinct_key_array(pick("click"), "user_id")
    b = distinct_key_array(pick("purchase"), "user_id")
    return pa.table({"user_id": a.filter(pc.invert(pc.is_in(a, value_set=b)))})


_FULL_OUTER_SQL = """
WITH c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_clicks
           FROM events WHERE event_type = 'click' GROUP BY user_id),
     p AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_purchases
           FROM events WHERE event_type = 'purchase' GROUP BY user_id)
SELECT COALESCE(c.user_id, p.user_id) AS user_id, c.n_clicks, p.n_purchases
FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
"""


@register("click_purchase_full_outer", _FULL_OUTER_SQL)
def click_purchase_full_outer(sf_dir: str):
    """FULL OUTER JOIN (C12 completion): per-user click and purchase
    counts joined so either-side-only users survive with nulls —
    Ray Data's hash-partitioned full_outer join."""
    from sous_chef_ray.stages.join import hash_join

    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def counts(kind, name):
        schema = pa.schema([("user_id", pa.int64()), (name, pa.int64())])

        def fix_empty(t: pa.Table, s=schema) -> pa.Table:
            # empty shuffle partitions emit ZERO-COLUMN blocks; Arrow's
            # join rejects them ("no match for key field") — re-type
            return s.empty_table() if t.num_columns == 0 else t

        return (
            ev.map_batches(
                lambda t, k=kind: t.filter(pc.equal(t["event_type"], k)).select(["user_id"]),
                batch_format="pyarrow", zero_copy_batch=True,
            )
            .groupby("user_id")
            .aggregate(Count(alias_name=name))
            .map_batches(fix_empty, batch_format="pyarrow", zero_copy_batch=True)
        )

    c = counts("click", "n_clicks")
    p = counts("purchase", "n_purchases")
    # Ray's full_outer join coalesces the key column automatically
    return hash_join(c, p, on="user_id", join_type="full_outer",
                     num_partitions=_partitions(sf_dir, "events"))


_MOMENTS_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)
                * CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sumsq_cents,
       SUM(CAST(ROUND(value * 100) AS BIGINT)) / (100.0 * COUNT(*)) AS mean_value,
       (SUM(CAST(ROUND(value * 100) AS BIGINT)
            * CAST(ROUND(value * 100) AS BIGINT))
        - SUM(CAST(ROUND(value * 100) AS BIGINT))
          * SUM(CAST(ROUND(value * 100) AS BIGINT)) / (1.0 * COUNT(*)))
       / (10000.0 * (COUNT(*) - 1)) AS var_value
FROM events GROUP BY event_type
"""


@register("value_moments_per_type", _MOMENTS_SQL)
def value_moments_per_type(sf_dir: str):
    """VARIANCE/STDDEV family via exact integer moments: both engines
    sum cents and cents² as int64 (order-independent), then derive mean
    and sample variance from THE SAME integers — bit-identical doubles
    (the queries.py determinism note applied to second moments)."""
    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    def cents(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        return pa.table({
            "event_type": t["event_type"], "cents": c,
            "cents_sq": pc.multiply(c, c),
        })

    agg = (
        ev.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n"),
            Sum("cents", alias_name="sum_cents"),
            Sum("cents_sq", alias_name="sumsq_cents"),
        )
        .to_pandas()
    )
    agg["mean_value"] = agg["sum_cents"] / (100.0 * agg["n"])
    agg["var_value"] = (
        agg["sumsq_cents"] - agg["sum_cents"] * agg["sum_cents"] / (1.0 * agg["n"])
    ) / (10000.0 * (agg["n"] - 1))
    return agg[["event_type", "n", "sum_cents", "sumsq_cents",
                "mean_value", "var_value"]]


_Q3_SQL = """
SELECT l.l_orderkey,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                AS BIGINT)) AS BIGINT) AS revenue_e4,
       o.o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < TIMESTAMP '2024-03-15'
GROUP BY l.l_orderkey, o.o_orderdate
"""


@register("shipping_priority_q3", _Q3_SQL)
def shipping_priority_q3(sf_dir: str):
    """TPC-H Q3-shaped pipeline: filter-pushdown on both dimensions, a
    semi-filter of orders by the (small) BUILDING customer set, one hash
    join lineitem⋈orders, then a hash aggregate of exact integer
    revenue — the canonical multi-join + agg composition."""
    from sous_chef_ray.stages.join import distinct_key_array, hash_join, semi_join

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    building = cust.map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING")).select(["c_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    cutoff = pd.Timestamp("2024-03-15")
    orders_f = orders.map_batches(
        lambda t: t.filter(pc.less(t["o_orderdate"], pa.scalar(cutoff, type=pa.timestamp("us")))),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    orders_b = semi_join(orders_f, distinct_key_array(building, "c_custkey"),
                         "o_custkey", concurrency=2)
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def revenue(t: pa.Table) -> pa.Table:
        rev = pc.cast(pc.round(pc.multiply(
            pc.multiply(t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"])),
            10000.0)), pa.int64())
        return pa.table({"l_orderkey": t["l_orderkey"], "rev_e4": rev})

    li_r = li.map_batches(revenue, batch_format="pyarrow", zero_copy_batch=True)
    joined = hash_join(li_r, orders_b.select_columns(["o_orderkey", "o_orderdate"]),
                       on="l_orderkey", right_on="o_orderkey",
                       join_type="inner", num_partitions=_partitions(sf_dir, "lineitem", "orders"))
    return (
        joined.groupby(["l_orderkey", "o_orderdate"])
        .aggregate(Sum("rev_e4", alias_name="revenue_e4"))
        .select_columns(["l_orderkey", "revenue_e4", "o_orderdate"])
    )


_Q18_SQL = """
WITH big AS (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS BIGINT)) > 200
)
SELECT c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       b.total_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
LIMIT 100
"""


@register("large_volume_orders_q18", _Q18_SQL)
def large_volume_orders_q18(sf_dir: str):
    """TPC-H Q18 shape: pre-aggregate lineitem quantities per order (the
    big side reduces FIRST — only order-level sums enter any join),
    HAVING-filter, hash-join the surviving order keys to orders, enrich
    with a broadcast customer join, global top-100 with a fully
    deterministic tie-break."""
    from sous_chef_ray.stages.join import broadcast_join, hash_join

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def qty(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "q": pc.cast(t["l_quantity"], pa.int64()),
        })

    big = (
        li.map_batches(qty, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_orderkey").aggregate(Sum("q", alias_name="total_qty"))
        .map_batches(lambda t: t.filter(pc.greater(t["total_qty"], 200)),
                     batch_format="pyarrow")
    )
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate",
                            "o_totalprice"])
    j = hash_join(big, orders, on="l_orderkey", right_on="o_orderkey",
                  num_partitions=_partitions(sf_dir, "lineitem", "orders")).rename_columns({"l_orderkey": "o_orderkey"})
    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name"])
    enriched = broadcast_join(j, cust, on="o_custkey", right_on="c_custkey")
    out = (
        enriched.sort(["o_totalprice", "o_orderdate", "o_orderkey"],
                      descending=[True, False, False])
        .limit(100)
        .select_columns(["c_name", "o_custkey", "o_orderkey", "o_orderdate",
                         "o_totalprice", "total_qty"])
    )
    return out


_HAVING_SQL = """
SELECT o_custkey, COUNT(*) AS n_orders
FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12
"""


@register("frequent_customers", _HAVING_SQL)
def frequent_customers(sf_dir: str):
    """GROUP BY ... HAVING — aggregate then a vectorized post-filter."""
    orders = _read(sf_dir, "orders", columns=["o_custkey"])
    agg = orders.groupby("o_custkey").aggregate(Count(alias_name="n_orders"))
    return agg.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_orders"], 12)),
        batch_format="pyarrow", zero_copy_batch=True,
    )


_PIVOT_SQL = """
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
       CAST(SUM(CASE WHEN event_type = 'purchase'
                THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
         AS purchase_cents
FROM events GROUP BY user_id
"""


@register("event_type_pivot", _PIVOT_SQL)
def event_type_pivot(sf_dir: str):
    """Conditional aggregation (SUM(CASE WHEN ...) pivot): indicator
    columns built per batch (partial pre-aggregation shape), one hash
    aggregate — the standard wide-to-narrow pivot at scale."""
    ev = _read(sf_dir, "events", columns=["user_id", "event_type", "value"])

    def indicators(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        is_purchase = pc.equal(et, "purchase")
        zero = pa.scalar(0, type=pa.int64())
        return pa.table({
            "user_id": t["user_id"],
            "n_clicks": pc.cast(pc.equal(et, "click"), pa.int64()),
            "n_purchases": pc.cast(is_purchase, pa.int64()),
            "n_errors": pc.cast(pc.equal(et, "error"), pa.int64()),
            "purchase_cents": pc.if_else(is_purchase, cents, zero),
        })

    return (
        ev.map_batches(indicators, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(
            Sum("n_clicks", alias_name="n_clicks"),
            Sum("n_purchases", alias_name="n_purchases"),
            Sum("n_errors", alias_name="n_errors"),
            Sum("purchase_cents", alias_name="purchase_cents"),
        )
    )


_RANGEJOIN_SQL = """
SELECT c.user_id, c.event_id AS click_id, c.ts AS click_ts,
       p.event_id AS purchase_id
FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click') c
JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND c.ts >= p.ts AND c.ts < p.ts + INTERVAL 2 DAY
"""


@register("clicks_in_purchase_window", _RANGEJOIN_SQL)
def clicks_in_purchase_window(sf_dir: str):
    """Interval (range) join: every click inside [purchase, purchase+2d)
    of the same user — granule-bucketed plan (stages/rangejoin.py: each
    interval explodes to its coarse granules, points carry one granule,
    hash equi-join on (key, granule) + exact filter; no per-key cross
    product, no dedup needed)."""
    from sous_chef_ray.stages.rangejoin import interval_join

    ev = _read(sf_dir, "events", columns=["user_id", "event_id", "ts", "event_type"])

    def clicks(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "click"))
        return pa.table({"user_id": t["user_id"], "click_id": t["event_id"],
                         "click_ts": t["ts"]})

    def purchases(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        end = pc.add(t["ts"], pa.scalar(pd.Timedelta(days=2).to_pytimedelta(),
                                        type=pa.duration("us")))
        return pa.table({"user_id": t["user_id"], "purchase_id": t["event_id"],
                         "win_start": t["ts"], "win_end": end})

    pts = ev.map_batches(clicks, batch_format="pyarrow", zero_copy_batch=True)
    ivs = ev.map_batches(purchases, batch_format="pyarrow", zero_copy_batch=True)
    out = interval_join(
        pts, ivs, key="user_id", point_ts="click_ts",
        start_ts="win_start", end_ts="win_end",
        granule=pd.Timedelta(days=2), point_cols=["click_id"],
        interval_cols=["purchase_id"], num_partitions=_partitions(sf_dir, "events"),
    )
    return out.select_columns(["user_id", "click_id", "click_ts", "purchase_id"])


_STRFN_SQL = """
SELECT c_custkey,
       substr(c_name, 10, 5) AS name_mid,
       replace(c_name, '#', '-') AS name_dash,
       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_pad,
       split_part(c_name, '#', 2) AS name_num,
       upper(c_mktsegment) AS seg_upper,
       left(c_name, 8) AS name_left,
       right(c_name, 6) AS name_right,
       strpos(c_name, '#') AS hash_pos,
       reverse(c_mktsegment) AS seg_rev,
       length(c_name) AS name_len
FROM customer
"""


@register("string_function_surface", _STRFN_SQL)
def string_function_surface(sf_dir: str):
    """SUBSTR/REPLACE/LPAD/SPLIT_PART/UPPER/LEFT/RIGHT/STRPOS/REVERSE/
    LENGTH as vectorized Arrow kernels (functions/sqlfns.py) — the string
    surface the reference's dialects push to warehouses."""
    from sous_chef_ray.functions import sqlfns as F

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name", "c_mktsegment"])

    def fn(t: pa.Table) -> pa.Table:
        name = t["c_name"].combine_chunks()
        seg = t["c_mktsegment"].combine_chunks()
        return pa.table({
            "c_custkey": t["c_custkey"],
            "name_mid": F.substr(name, 10, 5),
            "name_dash": F.replace(name, "#", "-"),
            "key_pad": F.lpad(pc.cast(t["c_custkey"], pa.string()), 10, "0"),
            "name_num": F.split_part(name, "#", 2),
            "seg_upper": F.upper(seg),
            "name_left": F.left(name, 8),
            "name_right": F.right(name, 6),
            "hash_pos": F.strpos(name, "#"),
            "seg_rev": F.reverse(seg),
            "name_len": F.length(name),
        })

    return cust.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


_DATEFN_SQL = """
SELECT o_orderkey,
       o_orderdate + INTERVAL 30 DAY AS due_date,
       o_orderdate + INTERVAL 3 MONTH AS quarter_out,
       CAST(datediff('day', o_orderdate, TIMESTAMP '2024-06-01') AS BIGINT)
         AS days_to_cutoff,
       CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end
FROM orders
"""


@register("date_function_surface", _DATEFN_SQL)
def date_function_surface(sf_dir: str):
    """DATEADD (day + calendar month) / DATEDIFF / LAST_DAY — the date
    arithmetic the reference's validators recognize (DATEADD/DATEDIFF at
    validators.py:16), as Arrow/pandas-offset kernels."""
    from sous_chef_ray.functions import sqlfns as F

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    cutoff = pd.Timestamp("2024-06-01")

    def fn(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].combine_chunks()
        cut = pa.array([cutoff] * len(t), type=pa.timestamp("us"))
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "due_date": F.dateadd("day", 30, d),
            "quarter_out": F.dateadd("month", 3, d),
            "days_to_cutoff": F.datediff_days(d, cut),
            "month_end": pc.cast(F.last_day(d), pa.timestamp("us")),
        })

    return orders.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


_NTILE_SQL = """
SELECT user_id, event_id,
       NTILE(4) OVER w AS ntile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume_dist
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
"""


@register("event_ntile_pct", _NTILE_SQL)
def event_ntile_pct(sf_dir: str):
    """NTILE / PERCENT_RANK / CUME_DIST in one fused Arrow pass
    (SURVEY §2.C7 family). Ordered by the unique event_id so NTILE's
    tie-arbitrary row numbering is deterministic on both sides."""
    from sous_chef_ray.stages.window import with_ntile_pct

    ev = _read(sf_dir, "events", columns=["user_id", "event_id"])
    out = with_ntile_pct(
        ev, "user_id", "event_id", n_tiles=4,
        num_buckets=_buckets(sf_dir, "events"),
    )
    return out.select_columns(["user_id", "event_id", "ntile", "pct_rank", "cume_dist"])


# ---------------------------------------------------------------------------
# North-rule: the flagship's FUSED window op (lag/lead + session in one
# shuffle, pipelines.materialize.window_features) verified end-to-end.
# ---------------------------------------------------------------------------

_FLAGSHIP_WINDOW_SQL = r"""
WITH tok AS (
  SELECT 'doc' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS doc_id,
         source,
         CAST(length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok,
         TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 SECOND AS event_ts
  FROM documents),
lagd AS (
  SELECT doc_id, source, event_ts, n_tok,
         lag(n_tok) OVER w AS n_tok_lag1,
         lead(n_tok) OVER w AS n_tok_lead1,
         lag(event_ts) OVER w AS prev_ts
  FROM tok WINDOW w AS (PARTITION BY source ORDER BY event_ts, doc_id))
SELECT doc_id, source, event_ts, n_tok, n_tok_lag1, n_tok_lead1,
       CAST(SUM(CASE WHEN prev_ts IS NULL OR event_ts - prev_ts > INTERVAL 15 SECOND
                THEN 1 ELSE 0 END)
            OVER (PARTITION BY source ORDER BY event_ts, doc_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
FROM lagd
"""


@register("flagship_window_features", _FLAGSHIP_WINDOW_SQL)
def flagship_window_features(sf_dir: str):
    """The flagship's fused Arrow window kernel (tokenize → lag/lead n_tok
    + gap sessions per source, ONE shuffle) against a DuckDB
    lag()/lead()/SUM(CASE) oracle. Keyed by ``source`` so partitions are
    non-degenerate at testdata shape (doc_id is unique per row there)."""
    from sous_chef_ray.pipelines.materialize import tokenize_documents, window_features

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])
    out = window_features(
        tokenize_documents(docs),
        key="source", ts_col="event_ts", tie_col="created_ts",
        value_col="n_tok", session_gap=pd.Timedelta(seconds=15),
        num_buckets=_buckets(sf_dir, "documents"),
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "source": t["source"],
            "event_ts": t["event_ts"],
            "n_tok": pc.cast(t["n_tok"], pa.int64()),
            "n_tok_lag1": pc.cast(t["n_tok_lag1"], pa.int64()),
            "n_tok_lead1": pc.cast(t["n_tok_lead1"], pa.int64()),
            "session_id": t["session_id"],
        })

    return out.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Training-data ops: text analysis, dedup, similarity search
# ---------------------------------------------------------------------------

_TOKCOUNT_SQL = r"""
SELECT doc_id, length(regexp_split_to_array(trim(text), '\s+')) AS n_words
FROM documents
"""


@register("doc_token_counts", _TOKCOUNT_SQL)
def doc_token_counts(sf_dir: str):
    """Whitespace token counting over documents (training-data op)."""
    from sous_chef_ray.stages.text import add_token_count

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return add_token_count(docs, "text", name="n_words").select_columns(
        ["doc_id", "n_words"]
    )


@register("lm_quality_scores")  # model scoring → rows-only
def lm_quality_scores(sf_dir: str):
    """Bigram-LM quality scoring: the model trains on the corpus itself
    (distributed gram counting → one groupby-sum → bounded top-K model),
    broadcasts once, and every doc gets a mean-NLL fluency score
    (stages/lm.py — the KenLM-style filter shape with no external data)."""
    from sous_chef_ray.stages.lm import score_nll, train_bigram_lm

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    model = train_bigram_lm(docs, "text", max_vocab=30_000, max_bigrams=200_000)
    out = score_nll(
        _read(sf_dir, "documents", columns=["doc_id", "text"]), model, "text"
    ).select_columns(["doc_id", "lm_nll"]).to_pandas()
    out["lm_nll"] = out["lm_nll"].round(6)
    return out.sort_values("doc_id").reset_index(drop=True)


@register("train_val_test_split")  # engine-defined hash → rows-only
def train_val_test_split(sf_dir: str):
    """Deterministic leakage-free train/val/test split by doc_id hash
    (stages/dedup.hash_split): same key → same split across runs and
    partitionings; per-split doc counts returned."""
    from sous_chef_ray.stages.dedup import hash_split

    docs = _read(sf_dir, "documents", columns=["doc_id"])
    split_ds = hash_split(docs, "doc_id",
                          {"train": 0.8, "val": 0.1, "test": 0.1}, seed=7)
    counts = (
        split_ds.groupby("split").aggregate(Count(alias_name="n_docs")).to_pandas()
    )
    return counts.sort_values("split").reset_index(drop=True)


@register("pack_training_sequences")  # not SQL-expressible → rows-only
def pack_training_sequences(sf_dir: str):
    """Sequence packing: tokenize documents → concatenate per block with
    EOS separators → fixed 512-token training rows (stages/pack.py; the
    canonical LLM pre-training step). Token conservation + row-length
    invariants are pytest-verified (tests/test_pack.py)."""
    from sous_chef_ray.pipelines.materialize import tokenize_documents
    from sous_chef_ray.stages.pack import pack_sequences

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])
    out = pack_sequences(tokenize_documents(docs), "tokens", seq_len=512,
                         eos_id=50256)
    df = out.to_pandas()
    df["tokens"] = df["tokens"].map(lambda v: tuple(int(x) for x in v))
    return df.sort_values(["seq_id", "n_tokens"]).reset_index(drop=True)


_CHUNK_SQL = r"""
WITH words AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
  FROM documents
)
SELECT doc_id,
       CAST(g.c AS BIGINT) AS chunk_id,
       ws[g.c * 15 + 1 : least(g.c * 15 + 20, len(ws))] AS words,
       CAST(least(20, len(ws) - g.c * 15) AS INT) AS n_words
FROM words,
     UNNEST(generate_series(0, CAST((len(ws) - 1) // 15 AS BIGINT))) AS g(c)
"""


@register("chunk_doc_word_windows", _CHUNK_SQL)
def chunk_doc_word_windows(sf_dir: str):
    """Sliding-window context chunking (stages/pack.chunk_token_windows):
    each document's word list is cut into window=20 chunks starting every
    stride=15 words (overlapping; last chunk is the remainder) — the
    context-window prep step between tokenization and training. One
    ragged-arange gather per batch; shard-parallel, no shuffle."""
    from sous_chef_ray.stages.pack import chunk_token_windows

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def split(t: pa.Table) -> pa.Table:
        ws = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(t["text"]))
        return pa.table({"doc_id": t["doc_id"], "words": ws})

    ds = docs.map_batches(split, batch_format="pyarrow", zero_copy_batch=True)
    return chunk_token_windows(ds, "words", window=20, stride=15,
                               id_cols=["doc_id"])


_NORMALIZE_SQL = r"""
SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm_text
FROM documents
"""


@register("doc_normalize_text", _NORMALIZE_SQL)
def doc_normalize_text(sf_dir: str):
    """Text normalization (lowercase + whitespace collapse + trim) —
    vectorized RE2 kernels (stages/text.normalize_text)."""
    from sous_chef_ray.stages.text import normalize_text

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return normalize_text(docs, "text").select_columns(["doc_id", "norm_text"])


_BOILER_SQL = r"""
WITH lined AS (
  SELECT doc_id,
         regexp_replace(text, '(\S+ \S+ \S+) ', '\1' || chr(10), 'g') AS t
  FROM documents
),
lines AS (
  SELECT doc_id, i AS ln, ls[i] AS line
  FROM (SELECT doc_id, string_split(t, chr(10)) AS ls FROM lined),
       UNNEST(generate_series(1, len(ls))) AS g(i)
),
hot AS (
  SELECT line FROM lines GROUP BY line HAVING count(DISTINCT doc_id) >= 3
),
flagged AS (
  SELECT l.doc_id, l.ln, l.line, h.line IS NOT NULL AS is_hot
  FROM lines l LEFT JOIN hot h ON l.line = h.line
)
SELECT doc_id,
       coalesce(string_agg(CASE WHEN NOT is_hot THEN line END,
                           chr(10) ORDER BY ln), '') AS text,
       CAST(count(*) FILTER (WHERE is_hot) AS BIGINT) AS n_lines_removed
FROM flagged GROUP BY doc_id
"""


@register("doc_remove_boilerplate", _BOILER_SQL)
def doc_remove_boilerplate(sf_dir: str):
    """Cross-corpus boilerplate-line removal (C4/RefinedWeb-style): the
    corpus has no newlines, so both sides first line-ify deterministically
    (newline after every 3rd word via the same RE2 rewrite), then lines
    appearing in >= 3 DISTINCT docs are detected by the distributed
    (hash, n) counter and stripped with the broadcast hot-set rebuild
    (stages/text.find_boilerplate_lines / remove_boilerplate_lines)."""
    from sous_chef_ray.stages.text import (
        find_boilerplate_lines,
        remove_boilerplate_lines,
    )

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def lineify(t: pa.Table) -> pa.Table:
        lined = pc.replace_substring_regex(
            t["text"], r"(\S+ \S+ \S+) ", "\\1\n")
        return pa.table({"doc_id": t["doc_id"], "text": lined})

    # materialize: BOTH passes (hot-line count, strip) consume this —
    # without it the lazy chain re-reads + re-lineifies the corpus
    ds = docs.map_batches(lineify, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    hot = find_boilerplate_lines(ds, min_docs=3)
    out = remove_boilerplate_lines(ds, hot)

    def widen(t: pa.Table) -> pa.Table:  # driver dtype parity vs SQL COUNT
        i = t.column_names.index("n_lines_removed")
        return t.set_column(i, "n_lines_removed",
                            pc.cast(t["n_lines_removed"], pa.int64()))

    return out.map_batches(widen, batch_format="pyarrow", zero_copy_batch=True)


_REDACT_SQL = r"""
SELECT doc_id,
       regexp_replace(
         regexp_replace(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
         '\+?[0-9][0-9()\-\s]{6,}[0-9]', '[PHONE]', 'g') AS redacted
FROM documents
"""


@register("doc_redact_pii", _REDACT_SQL)
def doc_redact_pii(sf_dir: str):
    """PII-shaped span redaction (emails, phone-number shapes) — both
    engines run the identical RE2 patterns (stages/text.redact_pii)."""
    from sous_chef_ray.stages.text import redact_pii

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return redact_pii(docs, "text").select_columns(["doc_id", "redacted"])


_SENTENCES_SQL = r"""
SELECT doc_id,
       CAST(generate_subscripts(regexp_split_to_array(text, '[.!?]+\s+'), 1)
            AS BIGINT) AS sent_idx,
       unnest(regexp_split_to_array(text, '[.!?]+\s+')) AS sentence
FROM documents
"""


@register("doc_sentences", _SENTENCES_SQL)
def doc_sentences(sf_dir: str):
    """Sentence explosion: one row per (doc, sentence, index) via
    vectorized split + Arrow list flatten (stages/text.explode_sentences)."""
    from sous_chef_ray.stages.text import explode_sentences

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return explode_sentences(docs, "doc_id", "text")


_BPE_SQL = (
    "SELECT doc_id, CAST(length(regexp_extract_all(text, "
    "'" + r"''s|''t|''re|''ve|''m|''ll|''d| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+" + "'"
    ")) AS BIGINT) AS n_bpe_tokens FROM documents"
)


@register("doc_bpe_token_counts", _BPE_SQL)
def doc_bpe_token_counts(sf_dir: str):
    """BPE-ish token counting: matches of the GPT-2-style pre-tokenizer
    regex, one RE2 pass per batch (stages/text.add_bpe_token_count)."""
    from sous_chef_ray.stages.text import add_bpe_token_count

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return add_bpe_token_count(docs, "text").select_columns(
        ["doc_id", "n_bpe_tokens"]
    )


@register("bpe_train_merges")  # iterative trainer → rows-only check
def bpe_train_merges(sf_dir: str) -> pa.Table:
    """BPE tokenizer TRAINING over the corpus (stages/bpe.py): one
    distributed word-count aggregate (the corpus never reaches the
    driver; the unique-word table is the bounded working set — the
    GPT-2-style production shape), then a numpy-vectorized merge loop.
    Deterministic tie-break → partition-invariant merge list."""
    from sous_chef_ray.stages.bpe import bpe_train

    docs = _read(sf_dir, "documents", columns=["text"])
    merges = bpe_train(docs, "text", num_merges=24)
    return pa.table({
        "rank": pa.array(range(len(merges)), pa.int64()),
        "left": pa.array([a for a, _ in merges], pa.string()),
        "right": pa.array([b for _, b in merges], pa.string()),
    })


@register("bpe_encode_docs")  # rows-only (BPE is not SQL-expressible)
def bpe_encode_docs(sf_dir: str) -> "rd.Dataset":
    """Corpus encoded with a corpus-trained BPE vocab: actor-pool stage,
    merge ranks broadcast once per actor, per-distinct-word memo."""
    from sous_chef_ray.stages.bpe import bpe_encode, bpe_train

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    merges = bpe_train(docs, "text", num_merges=24)
    out = bpe_encode(docs, "text", merges, concurrency=2)
    return out.map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "n_bpe_symbols": pc.list_value_length(t["bpe_symbols"]),
        }),
        batch_format="pyarrow", zero_copy_batch=True)


@register("bm25_search_docs")  # ln-based ranking → rows-only
def bm25_search_docs(sf_dir: str):
    """Okapi BM25 ranked retrieval over documents (stages/text
    bm25_search): two streaming corpus passes (query-vocab df stats,
    then score + per-batch local top-k) and a distributed per-qid
    reduce — document text never reaches the driver."""
    from sous_chef_ray.stages.text import bm25_search

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = bm25_search(
        docs,
        {"q_the_and": "the and", "q_of_to": "of to in"},
        id_col="doc_id", text_col="text", k=5, concurrency=2)
    out["score"] = out["score"].round(6)
    return out


_DSIR_SQL = """
SELECT doc_id, CAST(SUM(s) AS BIGINT) AS dsir_score,
       CAST(COUNT(*) AS BIGINT) AS n_grams
FROM (SELECT h.doc_id, sc.s
      FROM (SELECT doc_id,
                   CAST(('0x' || substr(md5(g), 1, 8)) AS UBIGINT)
                       % 4096 AS b
            FROM (SELECT doc_id,
                         UNNEST(regexp_split_to_array(lower(text),
                                                      '[^a-z0-9]+')) AS g
                  FROM documents)
            WHERE g <> '') h
      JOIN (SELECT b, t_cnt * 1000000 // (r_cnt + 1) AS s
            FROM (SELECT CAST(('0x' || substr(md5(g), 1, 8)) AS UBIGINT)
                             % 4096 AS b,
                         SUM(CASE WHEN src IN ('src0', 'src1', 'src2')
                                  THEN 1 ELSE 0 END) AS t_cnt,
                         SUM(CASE WHEN src IN ('src0', 'src1', 'src2')
                                  THEN 0 ELSE 1 END) AS r_cnt
                  FROM (SELECT source AS src,
                               UNNEST(regexp_split_to_array(lower(text),
                                      '[^a-z0-9]+')) AS g
                        FROM documents)
                  WHERE g <> ''
                  GROUP BY b)) sc
      ON h.b = sc.b)
GROUP BY doc_id
"""


@register("dsir_importance_weights", _DSIR_SQL)
def dsir_importance_weights(sf_dir: str):
    """DSIR-style data selection (stages/dsir): hashed-unigram bucket
    counts split target-vs-raw (two streaming passes, bounded bucket
    table to the driver, weights broadcast once), integer-quantized
    likelihood-ratio score per document — value-EXACT vs the DuckDB
    oracle because every step is integer math on md5-derived buckets."""
    from sous_chef_ray.stages.dsir import dsir_weights

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])
    return dsir_weights(docs, ("src0", "src1", "src2"))


_PSI_SQL = """
WITH b AS (
  SELECT CAST(value >= 25 AS INT) + CAST(value >= 50 AS INT)
       + CAST(value >= 100 AS INT) + CAST(value >= 200 AS INT) AS bin,
         CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END
           AS is_base
  FROM events
), c AS (
  SELECT bin, CAST(SUM(is_base) AS BIGINT) AS n_base,
         CAST(SUM(1 - is_base) AS BIGINT) AS n_curr
  FROM b GROUP BY bin
), bins AS (SELECT * FROM (VALUES (0), (1), (2), (3), (4)) AS v(bin)),
f AS (
  SELECT bins.bin, COALESCE(c.n_base, 0) AS n_base,
         COALESCE(c.n_curr, 0) AS n_curr
  FROM bins LEFT JOIN c ON bins.bin = c.bin
), p AS (
  SELECT bin, n_base, n_curr,
         CAST(n_base AS DOUBLE) / SUM(n_base) OVER () AS pb,
         CAST(n_curr AS DOUBLE) / SUM(n_curr) OVER () AS pc
  FROM f
)
SELECT CAST(bin AS BIGINT) AS bin,
       CASE bin WHEN 0 THEN CAST('-infinity' AS DOUBLE) WHEN 1 THEN 25
            WHEN 2 THEN 50 WHEN 3 THEN 100 ELSE 200 END AS lo,
       CASE bin WHEN 0 THEN 25 WHEN 1 THEN 50 WHEN 2 THEN 100
            WHEN 3 THEN 200 ELSE CAST('infinity' AS DOUBLE) END AS hi,
       n_base, n_curr,
       ROUND((pc - pb) * ln(GREATEST(pc, 1e-6) / GREATEST(pb, 1e-6)), 6)
           AS psi_contrib,
       ROUND(SUM((pc - pb) * ln(GREATEST(pc, 1e-6) / GREATEST(pb, 1e-6)))
             OVER (), 6) AS psi_total
FROM p
"""


@register("events_value_psi", _PSI_SQL)
def events_value_psi(sf_dir: str) -> pa.Table:
    """Distribution-drift PSI (stages/drift.distribution_psi): value
    distribution of the first half of January vs the rest, fixed bin
    edges [25, 50, 100, 200]. Exact integer bin counts hash-match the
    oracle; the PSI floats round to 6 decimals on both sides (libm ulp
    differences are far below that)."""
    from sous_chef_ray.stages.drift import distribution_psi

    ev = _read(sf_dir, "events", columns=["ts", "value"])
    cut = np.datetime64("2024-01-16T00:00:00", "us")

    def mask(t: pa.Table) -> pa.Table:
        return t.append_column(
            "is_base",
            pc.less(t["ts"], pa.scalar(cut, type=pa.timestamp("us"))))

    tagged = ev.map_batches(mask, batch_format="pyarrow",
                            zero_copy_batch=True)
    return distribution_psi(tagged, "value", "is_base",
                            bin_edges=[25, 50, 100, 200])


_REPETITION_SQL = r"""
SELECT doc_id,
       1.0 - CAST(length(list_distinct(string_split(text, chr(10)))) AS DOUBLE)
           / length(string_split(text, chr(10))) AS dup_line_fraction,
       1.0 - CAST(length(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS DOUBLE)
           / length(regexp_split_to_array(trim(text), '\s+')) AS dup_word_fraction
FROM documents
"""


@register("doc_repetition_scores", _REPETITION_SQL)
def doc_repetition_scores(sf_dir: str):
    """Gopher-style repetition gates: duplicate-line and duplicate-word
    fractions per doc (stages/text.add_repetition_scores — one split +
    one hash pass + per-doc distinct counts, fully vectorized)."""
    from sous_chef_ray.stages.text import add_repetition_scores

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return add_repetition_scores(docs, "text").select_columns(
        ["doc_id", "dup_line_fraction", "dup_word_fraction"]
    )


_QUALITY_SQL = r"""
SELECT doc_id,
       length(regexp_split_to_array(trim(text), '\s+')) AS n_words,
       length(text)::DOUBLE / length(regexp_split_to_array(trim(text), '\s+'))
         AS chars_per_word,
       length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))::DOUBLE / length(text)
         AS alnum_ratio
FROM documents
"""


@register("doc_quality_scores", _QUALITY_SQL)
def doc_quality_scores(sf_dir: str):
    """Cheap quality-gate features (length/punct ratios) per document."""
    from sous_chef_ray.stages.text import add_quality_score

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return add_quality_score(docs, "text").select_columns(
        ["doc_id", "n_words", "chars_per_word", "alnum_ratio"]
    )


@register("doc_compression_ratio")  # zlib not SQL-expressible → rows-only
def doc_compression_ratio(sf_dir: str):
    """zlib compression-ratio redundancy signal per document
    (stages/text.add_compression_ratio — the Gopher/RefinedWeb
    repetitive-text gate). Deterministic (fixed level-6, no dict);
    value-level behavior is pinned in tests/test_text_dedup.py."""
    from sous_chef_ray.stages.text import add_compression_ratio

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return add_compression_ratio(docs, "text").select_columns(
        ["doc_id", "raw_bytes", "zlib_bytes", "compression_ratio"]
    )


_FPRINT_SQL = """
SELECT doc_id, md5(text) AS fingerprint FROM documents
"""


@register("doc_fingerprints", _FPRINT_SQL)
def doc_fingerprints(sf_dir: str):
    """Exact content fingerprint (md5) — dedup key at scale."""
    from sous_chef_ray.stages.text import add_md5_fingerprint

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return add_md5_fingerprint(docs, "text").select_columns(["doc_id", "fingerprint"])


_HASH_SAMPLE_SQL = """
SELECT doc_id, md5(text) AS fingerprint
FROM documents WHERE md5(text) < '28'
"""


@register("doc_hash_sample", _HASH_SAMPLE_SQL)
def doc_hash_sample(sf_dir: str):
    """Deterministic ~15.6% content-hash sample (md5 prefix threshold):
    the reproducible, leakage-free sampling primitive for eval holdouts —
    a pure filter, no RNG state, identical on any partitioning. Exact
    md5 oracle."""
    from sous_chef_ray.stages.text import add_md5_fingerprint

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    fp = add_md5_fingerprint(docs, "text").select_columns(["doc_id", "fingerprint"])
    return fp.map_batches(
        lambda t: t.filter(pc.less(t["fingerprint"], "28")),
        batch_format="pyarrow", zero_copy_batch=True,
    )


_EXACTDEDUP_SQL = """
SELECT MIN(doc_id) AS doc_id, md5(text) AS fingerprint
FROM documents GROUP BY md5(text)
"""


@register("exact_dedup_docs", _EXACTDEDUP_SQL)
def exact_dedup_docs(sf_dir: str):
    """Exact dedup: keep smallest doc_id per content hash — the shuffle
    moves 16-byte hashes, not documents."""
    from sous_chef_ray.stages.dedup import exact_dedup
    from sous_chef_ray.stages.text import add_md5_fingerprint

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    with_fp = add_md5_fingerprint(docs, "text").select_columns(["doc_id", "fingerprint"])
    return exact_dedup(with_fp, "fingerprint", keep_by="doc_id")


@register("minhash_neardup_pairs")  # not SQL-expressible → rows-only check
def minhash_neardup_pairs(sf_dir: str):
    """MinHash+LSH near-dup candidates verified by exact Jaccard ≥ 0.5 —
    verification is fully distributed (shingle sets of candidate docs
    only are joined to the pairs; the corpus never hits the driver)."""
    from sous_chef_ray.stages.neardup import (
        jaccard_verify_distributed,
        minhash_lsh_candidates,
    )

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    cand = minhash_lsh_candidates(
        docs, "doc_id", "text", k=3, num_hashes=64, bands=16, concurrency=2
    )
    out = jaccard_verify_distributed(
        cand, docs, "doc_id", "text", k=3, threshold=0.5, num_partitions=_partitions(sf_dir, "documents"),
        concurrency=2,
    ).to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


@register("neardup_doc_clusters")  # iterative graph algo → rows-only check
def neardup_doc_clusters(sf_dir: str):
    """End-to-end dedup clustering, every stage distributed: MinHash+LSH
    candidates → exact-Jaccard verify (candidate-only shingle joins) →
    connected components by min-label propagation + pointer jumping
    (stages/neardup.connected_components_distributed) → (doc_id, cluster)
    rows. The driver only ever holds the final cluster assignment."""
    from sous_chef_ray.stages.neardup import (
        connected_components_distributed,
        jaccard_verify_distributed,
        minhash_lsh_candidates,
    )

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    cand = minhash_lsh_candidates(
        docs, "doc_id", "text", k=3, num_hashes=64, bands=16, concurrency=2
    )
    verified = jaccard_verify_distributed(
        cand, docs, "doc_id", "text", k=3, threshold=0.5, num_partitions=_partitions(sf_dir, "documents"),
        concurrency=2,
    ).select_columns(["id_a", "id_b"])
    roots = connected_components_distributed(verified).to_pandas()
    return roots.sort_values("node").reset_index(drop=True).rename(
        columns={"node": "doc_id", "root": "cluster"}
    )


@register("simhash_signatures")  # rows-only
def simhash_signatures(sf_dir: str):
    """64-bit SimHash per document (near-dup signature family)."""
    from sous_chef_ray.stages.neardup import add_simhash

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = add_simhash(docs, "text", concurrency=2).select_columns(["doc_id", "simhash"])
    df = out.to_pandas()
    df["simhash"] = df["simhash"].astype("uint64")
    return df


@register("langid_predictions")  # heuristic; rows-only
def langid_predictions(sf_dir: str):
    """n-gram/stopword language-ID heuristic (actor-pool stage)."""
    from sous_chef_ray.stages.text import add_lang_id

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return add_lang_id(docs, "text", concurrency=2).select_columns(
        ["doc_id", "lang_pred"]
    )


_KNN_SQL = """
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < 10),
     c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS ce FROM embeddings WHERE vec_id >= 10),
     s AS (SELECT qid, neighbor_id, list_cosine_similarity(qe, ce) AS sim
           FROM q CROSS JOIN c),
     r AS (SELECT qid, neighbor_id, sim,
                  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id) AS rn
           FROM s)
SELECT qid, neighbor_id, ROUND(sim, 6) AS cosine_sim FROM r WHERE rn <= 5
"""


@register("knn_cosine_top5", _KNN_SQL)
def knn_cosine_top5(sf_dir: str):
    """Brute-force cosine top-5 of 10 query vectors against the corpus —
    broadcast query matrix, streaming float64 matmul per batch."""
    from sous_chef_ray.stages.similarity import knn_brute_force

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    import pyarrow.parquet as pq

    q_tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).filter(pc.less(pc.field("vec_id"), 10))
    corpus = emb.map_batches(
        lambda t: t.filter(pc.greater_equal(t["vec_id"], 10)),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    out = knn_brute_force(
        corpus, q_tbl, id_col="vec_id", emb_col="embedding",
        qid_col="vec_id", qemb_col="embedding", k=5, concurrency=2,
    )
    out["cosine_sim"] = out["cosine_sim"].round(6)
    return out[["qid", "neighbor_id", "cosine_sim"]]


_NN1_SQL = """
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < 50),
     c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS ce FROM embeddings),
     s AS (SELECT qid, neighbor_id, list_cosine_similarity(qe, ce) AS sim
           FROM q CROSS JOIN c WHERE qid <> neighbor_id),
     r AS (SELECT qid, neighbor_id, sim,
                  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id) AS rn
           FROM s)
SELECT qid, neighbor_id, ROUND(sim, 6) AS cosine_sim FROM r WHERE rn = 1
"""


@register("embedding_nearest_neighbor", _NN1_SQL)
def embedding_nearest_neighbor(sf_dir: str):
    """Embedding-cosine near-dup form: each query's single nearest
    neighbor (self excluded)."""
    from sous_chef_ray.stages.similarity import knn_brute_force

    import pyarrow.parquet as pq

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q_tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).filter(pc.less(pc.field("vec_id"), 50))
    out = knn_brute_force(
        emb, q_tbl, id_col="vec_id", emb_col="embedding",
        qid_col="vec_id", qemb_col="embedding", k=2, concurrency=2,
    )
    out = out[out["qid"] != out["neighbor_id"]]
    out = out.sort_values(["qid", "cosine_sim", "neighbor_id"],
                          ascending=[True, False, True], kind="mergesort")
    out = out.groupby("qid", sort=False).head(1).reset_index(drop=True)
    out["cosine_sim"] = out["cosine_sim"].round(6)
    return out[["qid", "neighbor_id", "cosine_sim"]]


_PUSHDOWN_SQL = """
SELECT user_id, COUNT(*) AS n_errors,
       SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS error_value
FROM events WHERE event_type = 'error' GROUP BY user_id
"""


@register("error_events_per_user", _PUSHDOWN_SQL)
def error_events_per_user(sf_dir: str):
    """WHERE pushdown at the read (SURVEY §2.C2): the predicate is a
    pyarrow dataset expression passed to read_parquet, so non-matching
    row groups never leave storage."""
    import ray.data as rd

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "value"],
        filter=(pc.field("event_type") == "error"),
    )

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64()),
        })

    agg = (
        ev.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(Count(alias_name="n_errors"), Sum("cents", alias_name="cents"))
        .to_pandas()
    )
    agg["error_value"] = agg["cents"] / 100.0
    return agg[["user_id", "n_errors", "error_value"]]


@register("doc_rolling_fingerprints")  # rows-only (hash values not SQL-expressible)
def doc_rolling_fingerprints(sf_dir: str):
    """Rolling (Rabin-Karp) min-hash fingerprint per document — the
    append/prepend-robust dedup key (stages/text)."""
    from sous_chef_ray.stages.text import add_rolling_fingerprint

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = add_rolling_fingerprint(docs, "text").select_columns(["doc_id", "rh_fingerprint"])
    df = out.to_pandas()
    df["rh_fingerprint"] = df["rh_fingerprint"].astype("uint64")
    return df


@register("char_minhash_signatures")  # rows-only
def char_minhash_signatures(sf_dir: str):
    """Character-shingle MinHash signatures (16-byte windows, 32 bases)
    — word-boundary-robust near-dup family (stages/neardup.CharMinHash)."""
    from sous_chef_ray.stages.neardup import CharMinHash

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = docs.map_batches(
        CharMinHash,
        fn_constructor_kwargs=dict(text_col="text", window=16, num_hashes=32),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 2),
    ).select_columns(["doc_id", "char_minhash"])
    return pa.concat_tables(out.iter_batches(batch_size=None, batch_format="pyarrow"))


@register("knn_lsh_top5")  # approximate → rows-only
def knn_lsh_top5(sf_dir: str):
    """LSH-bucketed approximate cosine top-5 (scale path of similarity
    search): only same-bucket candidates are scored."""
    import pyarrow.parquet as pq

    from sous_chef_ray.stages.similarity import knn_lsh_bucketed

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q_tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).filter(pc.less(pc.field("vec_id"), 10))
    corpus = emb.map_batches(
        lambda t: t.filter(pc.greater_equal(t["vec_id"], 10)),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    out = knn_lsh_bucketed(
        corpus, q_tbl, id_col="vec_id", emb_col="embedding",
        qid_col="vec_id", qemb_col="embedding", k=5,
        num_tables=12, bits=6, concurrency=2,
    )
    out["cosine_sim"] = out["cosine_sim"].round(6)
    return out[["qid", "neighbor_id", "cosine_sim"]]


@register("knn_pq_top5")  # approximate → rows-only
def knn_pq_top5(sf_dir: str):
    """Product-quantized approximate cosine top-5 (stages/similarity
    knn_pq): ADC over m-byte codes narrows candidates, an exact rescore
    of the bounded candidate set fixes the order — the memory-scale ANN
    path (codes are m bytes/vector vs 4·dim for floats)."""
    import pyarrow.parquet as pq

    from sous_chef_ray.stages.similarity import knn_pq

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q_tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).filter(pc.less(pc.field("vec_id"), 10))
    corpus = emb.map_batches(
        lambda t: t.filter(pc.greater_equal(t["vec_id"], 10)),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    out = knn_pq(
        corpus, q_tbl, id_col="vec_id", emb_col="embedding",
        qid_col="vec_id", qemb_col="embedding", k=5, m=8, n_codes=32,
        refine=4, concurrency=2,
    )
    out["cosine_sim"] = out["cosine_sim"].round(6)
    return out[["qid", "neighbor_id", "cosine_sim"]]


@register("knn_ivf_top5")  # approximate → rows-only
def knn_ivf_top5(sf_dir: str):
    """IVF approximate cosine top-5 (the other scale path): coarse
    k-means quantizer trained on a sample, corpus filtered to each
    query's nprobe nearest cells, exact scoring on the survivors
    (stages/similarity.knn_ivf; recall-tested vs brute force)."""
    import pyarrow.parquet as pq

    from sous_chef_ray.stages.similarity import knn_ivf

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q_tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).filter(pc.less(pc.field("vec_id"), 10))
    corpus = emb.map_batches(
        lambda t: t.filter(pc.greater_equal(t["vec_id"], 10)),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    out = knn_ivf(
        corpus, q_tbl, id_col="vec_id", emb_col="embedding",
        qid_col="vec_id", qemb_col="embedding", k=5,
        n_centroids=32, nprobe=8, sample_rows=20000, concurrency=2,
    )
    out["cosine_sim"] = out["cosine_sim"].round(6)
    return out[["qid", "neighbor_id", "cosine_sim"]]


@register("embedding_kmeans_clusters")  # iterative fit → rows-only
def embedding_kmeans_clusters(sf_dir: str):
    """Distributed Lloyd's k-means over the embeddings table: coarse
    init on a bounded sample, then full-corpus refinement where each
    iteration is ONE streaming pass whose (cid, dim, sum, count)
    partials reduce in-cluster (the driver only sees the k x d table);
    final assignment is a broadcast-centroid matmul pass."""
    from sous_chef_ray.stages.similarity import (
        kmeans_assign,
        kmeans_fit_distributed,
    )

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cent, _ = kmeans_fit_distributed(emb, emb_col="embedding",
                                     n_centroids=8, iters=8)
    out = kmeans_assign(emb, cent).to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


@register("multimodal_decode")  # binary decode → rows-only
def multimodal_decode(sf_dir: str):
    """Binary media column → per-image feature rows via the actor-pool
    decode stage with REAL codecs: a mixed corpus of genuine PNG files
    (exact pixels, stages/png.py) and genuine baseline JPEG files
    (Huffman + IDCT, stages/jpeg.py — 4:4:4 and 4:2:0 payloads); pixel
    stats + 32×32 thumbnails are true values. Progressive JPEG / video
    remain the declared NotImplementedError boundary."""
    import ray.data as rd

    from sous_chef_ray.stages.multimodal import (
        decode_images,
        synth_jpeg_table,
        synth_png_table,
    )

    imgs = pa.concat_tables(
        [synth_png_table(192, seed=42), synth_jpeg_table(64, seed=43)]
    )
    out = decode_images(rd.from_arrow(imgs), fake=False, concurrency=2,
                        batch_size=32)
    return out.drop_columns(["thumbnail"])  # driver hash: keep scalar cols


@register("gif_frame_samples")  # multi-frame decode → rows-only
def gif_frame_samples(sf_dir: str):
    """Animated-GIF frame sampling with a REAL codec (stages/gif.py:
    full LZW, interlace, transparency compositing): the actor-pool stage
    decodes each payload's composited frames and emits one true
    pixel-stat row per sampled frame — the genuine multi-frame media
    path (video containers remain the declared stub boundary)."""
    import ray.data as rd

    from sous_chef_ray.stages.multimodal import sample_gif_frames, synth_gif_table

    gifs = synth_gif_table(96, seed=44)
    return sample_gif_frames(rd.from_arrow(gifs), every_nth=2,
                             concurrency=2, batch_size=16)


@register("audio_features")  # binary decode → rows-only
def audio_features(sf_dir: str):
    """WAV PCM decode: deterministic synthetic tones/noise clips →
    true duration/RMS/peak features via the actor-pool DecodeAudio
    (pure-stdlib RIFF parser, stages/multimodal.decode_wav)."""
    import ray.data as rd

    from sous_chef_ray.stages.multimodal import decode_audio, encode_wav

    rng = np.random.default_rng(13)
    clips, ids = [], []
    for i in range(64):
        secs = float(rng.uniform(0.2, 1.5))
        n = int(16000 * secs)
        freq = float(rng.uniform(100, 2000))
        amp = float(rng.uniform(0.1, 0.9))
        t = np.arange(n) / 16000.0
        clips.append(encode_wav(amp * np.sin(2 * np.pi * freq * t)[:, None], 16000))
        ids.append(f"clip{i:04d}")
    tbl = pa.table({
        "media_id": pa.array(ids),
        "payload": pa.array(clips, type=pa.large_binary()),
    })
    out = decode_audio(rd.from_arrow(tbl), concurrency=2).to_pandas()
    for c in ("duration_sec", "rms", "peak"):
        out[c] = out[c].round(6)
    return out.sort_values("media_id").reset_index(drop=True)


_DERIVED_SQL = """
SELECT n_name, COUNT(*) AS n_big_customers,
       SUM(CAST(ROUND(total_spend * 100) AS BIGINT)) / 100.0 AS spend
FROM (
  SELECT c.c_custkey, c.c_nationkey,
         SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) / 100.0 AS total_spend
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey, c.c_nationkey
) big JOIN nation n ON big.c_nationkey = n.n_nationkey
WHERE big.total_spend > 500000
GROUP BY n_name
"""


@register("big_spenders_by_nation", _DERIVED_SQL)
def big_spenders_by_nation(sf_dir: str):
    """Derived-table composition (SURVEY §2.C20): aggregate subquery →
    filter → dim join → re-aggregate, all as chained Datasets."""
    from sous_chef_ray.stages.join import broadcast_join, hash_join

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": t["o_custkey"],
            "cents": pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64()),
        })

    spend = (
        orders.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_custkey")
        .aggregate(Sum("cents", alias_name="cents"))
    )
    joined = hash_join(spend, cust, on="o_custkey", right_on="c_custkey",
                       join_type="inner", num_partitions=_partitions(sf_dir, "orders", "customer"))
    big = joined.map_batches(
        lambda t: t.filter(pc.greater(t["cents"], 50000000)),
        batch_format="pyarrow",
    )
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    withnation = broadcast_join(big, nation, on="c_nationkey",
                                right_on="n_nationkey", how="inner", concurrency=2)
    agg = (
        withnation.groupby("n_name")
        .aggregate(Count(alias_name="n_big_customers"), Sum("cents", alias_name="cents"))
        .to_pandas()
    )
    agg["spend"] = agg["cents"] / 100.0
    return agg[["n_name", "n_big_customers", "spend"]]


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
    (SURVEY §2.C2/C3). The shipdate predicate pushes into the parquet
    read (row-group pruning; l_shipdate never leaves storage); partial
    aggregation happens inside Ray's hash aggregate; the derived money
    columns are exact integer cents."""
    cutoff = pa.scalar(np.datetime64("2000-12-01", "us"), type=pa.timestamp("us"))
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"],
        filter=pc.field("l_shipdate") <= cutoff,
    )

    def derive(t: pa.Table) -> pa.Table:
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


# ---------------------------------------------------------------------------
# MODE() aggregate (most frequent value per group, deterministic tie-break)
# ---------------------------------------------------------------------------

_MODE_SQL = """
SELECT user_id, event_type AS mode_event_type, n FROM (
  SELECT user_id, event_type, COUNT(*) AS n,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY COUNT(*) DESC, event_type) AS rn
  FROM events GROUP BY user_id, event_type) t
WHERE rn = 1
"""


@register("mode_event_type_per_user", _MODE_SQL)
def mode_event_type_per_user(sf_dir: str):
    """MODE() per group: hash-aggregate (user, value) counts — the shuffle
    moves one row per distinct pair, not per event — then a per-user top-1
    with a deterministic (count DESC, value ASC) tie-break."""
    from sous_chef_ray.stages.window import topk_per_group

    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])
    counts = ev.groupby(["user_id", "event_type"]).aggregate(
        Count(alias_name="n")
    )
    top = topk_per_group(
        counts, "user_id", ["n", "event_type"], k=1,
        descending=[True, False], num_buckets=_buckets(sf_dir, "events"),
    )
    return top.rename_columns({"event_type": "mode_event_type"}).select_columns(
        ["user_id", "mode_event_type", "n"]
    )


# ---------------------------------------------------------------------------
# TPC-H Q4 shape: EXISTS semi-join decorrelated to a pre-aggregate
# ---------------------------------------------------------------------------

_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


@register("order_priority_q4", _Q4_SQL)
def order_priority_q4(sf_dir: str):
    """Correlated EXISTS decorrelated: the subquery only asks whether ANY
    lineitem ships after the order date, so a per-orderkey MAX(l_shipdate)
    pre-aggregate (orders-sized, not lineitem-sized) replaces the
    semi-join fan-out; then one hash join + vectorized compare + count."""
    from sous_chef_ray.stages.join import hash_join

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])

    def as_int(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "ship_us": pc.cast(t["l_shipdate"], pa.int64()),
        })

    max_ship = (
        li.map_batches(as_int, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_orderkey").aggregate(Max("ship_us", alias_name="max_ship_us"))
    )
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    j = hash_join(orders, max_ship, on="o_orderkey", right_on="l_orderkey",
                  num_partitions=_partitions(sf_dir, "lineitem", "orders"))

    def late(t: pa.Table) -> pa.Table:
        od = pc.cast(t["o_orderdate"], pa.int64())
        return t.filter(pc.greater(t["max_ship_us"], od)).select(
            ["o_orderpriority"])

    return (
        j.map_batches(late, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_orderpriority").aggregate(Count(alias_name="n_orders"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q13 shape: LEFT join + two-level aggregation (customer order dist.)
# ---------------------------------------------------------------------------

_Q13_SQL = """
SELECT n_orders, COUNT(*) AS n_cust FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey) t
GROUP BY n_orders
"""


@register("customer_order_distribution_q13", _Q13_SQL)
def customer_order_distribution_q13(sf_dir: str):
    """Two-level aggregation: orders pre-aggregate to per-customer counts
    (one row per customer leaves the first shuffle), LEFT join keeps
    order-less customers as count 0, second tiny aggregate builds the
    histogram."""
    from sous_chef_ray.stages.join import hash_join

    counts = (
        _read(sf_dir, "orders", columns=["o_custkey"])
        .groupby("o_custkey").aggregate(Count(alias_name="n_orders"))
    )
    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    j = hash_join(cust, counts, on="c_custkey", right_on="o_custkey",
                  join_type="left_outer", num_partitions=_partitions(sf_dir, "orders", "customer"))

    def fill(t: pa.Table) -> pa.Table:
        n = pc.fill_null(pc.cast(t["n_orders"], pa.int64()), 0)
        return pa.table({"n_orders": n})

    return (
        j.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("n_orders").aggregate(Count(alias_name="n_cust"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q14 shape: conditional revenue ratio over a join (promo share)
# ---------------------------------------------------------------------------

_Q14_SQL = """
SELECT 100.0 * promo_e4 / total_e4 AS promo_pct,
       promo_e4 / 10000.0 AS promo_revenue,
       total_e4 / 10000.0 AS total_revenue
FROM (
  SELECT SUM(CASE WHEN p.p_type = 'PROMO' THEN rev_e4 ELSE 0 END) AS promo_e4,
         SUM(rev_e4) AS total_e4
  FROM (SELECT l_partkey,
               CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
                 AS rev_e4
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-02-01') l
  JOIN part p ON l.l_partkey = p.p_partkey) t
"""


@register("promo_revenue_q14", _Q14_SQL)
def promo_revenue_q14(sf_dir: str):
    """Promo-revenue ratio: month filter pushed into the lineitem scan,
    revenue pre-derived to exact integer e4-cents per batch, one hash join
    against part, then a 2-sum global aggregate → a single ratio row."""
    from sous_chef_ray.stages.join import hash_join

    lo = pd.Timestamp("1997-01-01").value // 1000  # us
    hi = pd.Timestamp("1997-02-01").value // 1000
    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_extendedprice", "l_discount",
                        "l_shipdate"])

    def derive(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["l_shipdate"], pa.int64())
        m = pc.and_(pc.greater_equal(ts, lo), pc.less(ts, hi))
        t = t.filter(m)
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(1.0, t["l_discount"]))
        e4 = pc.cast(pc.round(pc.multiply(rev, 10000.0)), pa.int64())
        return pa.table({"l_partkey": t["l_partkey"], "rev_e4": e4})

    slim = li.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    part = _read(sf_dir, "part", columns=["p_partkey", "p_type"])
    j = hash_join(slim, part, on="l_partkey", right_on="p_partkey",
                  num_partitions=_partitions(sf_dir, "lineitem", "part"))

    def split(t: pa.Table) -> pa.Table:
        promo = pc.if_else(pc.equal(t["p_type"], "PROMO"), t["rev_e4"],
                           pa.scalar(0, pa.int64()))
        return pa.table({"promo_e4": promo, "total_e4": t["rev_e4"]})

    agg = (
        j.map_batches(split, batch_format="pyarrow", zero_copy_batch=True)
        .aggregate(Sum("promo_e4", alias_name="promo_e4"),
                   Sum("total_e4", alias_name="total_e4"))
    )
    promo, total = agg["promo_e4"], agg["total_e4"]
    return pd.DataFrame({
        "promo_pct": [100.0 * promo / total],
        "promo_revenue": [promo / 10000.0],
        "total_revenue": [total / 10000.0],
    })


# ---------------------------------------------------------------------------
# TPC-H Q15 shape: argmax over a grouped aggregate (top supplier)
# ---------------------------------------------------------------------------

_Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
           AS rev_e4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, rev_e4 / 10000.0 AS total_revenue
FROM supplier s JOIN rev ON s.s_suppkey = rev.l_suppkey
WHERE rev_e4 = (SELECT MAX(rev_e4) FROM rev)
"""


@register("top_supplier_q15", _Q15_SQL)
def top_supplier_q15(sf_dir: str):
    """Argmax over a grouped aggregate: per-supplier exact-integer revenue
    (supplier-sized after the first shuffle), global MAX as a scalar
    aggregate, vectorized equality filter. The argmax row set is bounded
    by the number of MAX ties (~1 row), so it is BROADCAST and the
    supplier table streams past it — a hash join here would feed Ray's
    join a nearly-all-empty left side, which Ray 2.49 mishandles (empty
    hash partitions lose their schema and Acero rejects the key ref)."""
    from sous_chef_ray.stages.join import broadcast_join

    lo = pd.Timestamp("1997-01-01").value // 1000
    hi = pd.Timestamp("1997-04-01").value // 1000
    li = _read(sf_dir, "lineitem",
               columns=["l_suppkey", "l_extendedprice", "l_discount",
                        "l_shipdate"])

    def derive(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["l_shipdate"], pa.int64())
        t = t.filter(pc.and_(pc.greater_equal(ts, lo), pc.less(ts, hi)))
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(1.0, t["l_discount"]))
        e4 = pc.cast(pc.round(pc.multiply(rev, 10000.0)), pa.int64())
        return pa.table({"l_suppkey": t["l_suppkey"], "rev_e4": e4})

    rev = (
        li.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_suppkey").aggregate(Sum("rev_e4", alias_name="rev_e4"))
        .materialize()
    )
    best = rev.aggregate(Max("rev_e4", alias_name="best"))["best"]
    top = rev.map_batches(
        lambda t: t.filter(pc.equal(t["rev_e4"], best)),
        batch_format="pyarrow", zero_copy_batch=True,
    ).to_pandas()  # bounded: one row per MAX tie
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    j = broadcast_join(supp, top, on="s_suppkey", right_on="l_suppkey",
                       concurrency=2)

    def out(t: pa.Table) -> pa.Table:
        return pa.table({
            "s_suppkey": t["s_suppkey"],
            "s_name": t["s_name"],
            "total_revenue": pc.divide(pc.cast(t["rev_e4"], pa.float64()),
                                       10000.0),
        })

    return j.map_batches(out, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# TPC-H Q19 shape: disjunctive multi-predicate join (OR of AND-groups)
# ---------------------------------------------------------------------------

_Q19_SQL = """
SELECT SUM(rev_e4) / 10000.0 AS revenue, COUNT(*) AS n_items
FROM (SELECT l_partkey, l_quantity,
             CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
               AS rev_e4
      FROM lineitem) l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#16' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""


@register("disjunctive_part_revenue_q19", _Q19_SQL)
def disjunctive_part_revenue_q19(sf_dir: str):
    """Disjunctive (OR-of-AND-groups) join predicate: the part side is
    pre-filtered to the union of the brand/size groups BEFORE the join
    (shrinks the build side), the residual quantity conjunctions are
    evaluated vectorized after the join."""
    from sous_chef_ray.stages.join import hash_join

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice",
                        "l_discount"])

    def derive(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(1.0, t["l_discount"]))
        e4 = pc.cast(pc.round(pc.multiply(rev, 10000.0)), pa.int64())
        return pa.table({"l_partkey": t["l_partkey"],
                         "l_quantity": t["l_quantity"], "rev_e4": e4})

    groups = [("Brand#13", 1, 5, 1.0, 11.0),
              ("Brand#22", 1, 10, 10.0, 20.0),
              ("Brand#16", 1, 15, 20.0, 30.0)]

    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])

    def part_prefilter(t: pa.Table) -> pa.Table:
        m = None
        for brand, slo, shi, _, _ in groups:
            g = pc.and_(pc.equal(t["p_brand"], brand),
                        pc.and_(pc.greater_equal(t["p_size"], slo),
                                pc.less_equal(t["p_size"], shi)))
            m = g if m is None else pc.or_(m, g)
        return t.filter(m)

    slim_li = li.map_batches(derive, batch_format="pyarrow",
                             zero_copy_batch=True)
    slim_part = part.map_batches(part_prefilter, batch_format="pyarrow",
                                 zero_copy_batch=True)
    j = hash_join(slim_li, slim_part, on="l_partkey", right_on="p_partkey",
                  num_partitions=_partitions(sf_dir, "lineitem", "part"))

    def residual(t: pa.Table) -> pa.Table:
        m = None
        for brand, slo, shi, qlo, qhi in groups:
            g = pc.and_(
                pc.and_(pc.equal(t["p_brand"], brand),
                        pc.and_(pc.greater_equal(t["p_size"], slo),
                                pc.less_equal(t["p_size"], shi))),
                pc.and_(pc.greater_equal(t["l_quantity"], qlo),
                        pc.less_equal(t["l_quantity"], qhi)),
            )
            m = g if m is None else pc.or_(m, g)
        return t.filter(m).select(["rev_e4"])

    agg = (
        j.map_batches(residual, batch_format="pyarrow", zero_copy_batch=True)
        .aggregate(Sum("rev_e4", alias_name="rev_e4"),
                   Count(alias_name="n_items"))
    )
    return pd.DataFrame({"revenue": [(agg["rev_e4"] or 0) / 10000.0],
                         "n_items": [agg["n_items"]]})


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: scalar-average subquery (exact integer compare) + anti join
# ---------------------------------------------------------------------------

_Q22_SQL = """
WITH stats AS (
  SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS s,
         COUNT(*) AS n
  FROM customer WHERE c_acctbal > 0)
SELECT c_custkey, c_acctbal
FROM customer, stats
WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) * n > s
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-01-01')
"""


@register("idle_rich_customers_q22", _Q22_SQL)
def idle_rich_customers_q22(sf_dir: str):
    """Scalar AVG subquery + NOT EXISTS: the average compare is done as an
    exact integer cross-multiplication (cents * count > sum_cents) so both
    engines agree bit-for-bit at the threshold; the anti-join key set
    (customers with a RECENT order — every sf0.01 customer has SOME
    order, so the date predicate keeps the anti join non-trivial) is
    reduced distributedly then broadcast."""
    from sous_chef_ray.stages.join import anti_join, distinct_key_array

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])

    def cents_pos(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["c_acctbal"], 0.0))
        c = pc.cast(pc.round(pc.multiply(t["c_acctbal"], 100.0)), pa.int64())
        return pa.table({"cents": c})

    stats = (
        cust.map_batches(cents_pos, batch_format="pyarrow",
                         zero_copy_batch=True)
        .aggregate(Sum("cents", alias_name="s"), Count(alias_name="n"))
    )
    s, n = stats["s"], stats["n"]

    def rich(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(t["c_acctbal"], 100.0)), pa.int64())
        return t.filter(pc.greater(pc.multiply(c, n), s))

    rich_ds = cust.map_batches(rich, batch_format="pyarrow",
                               zero_copy_batch=True)
    cut = pd.Timestamp("2000-01-01").value // 1000  # us
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    recent = orders.map_batches(
        lambda t: t.filter(
            pc.greater_equal(pc.cast(t["o_orderdate"], pa.int64()), cut)
        ).select(["o_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return anti_join(rich_ds, distinct_key_array(recent, "o_custkey"),
                     "c_custkey", concurrency=2)


# ---------------------------------------------------------------------------
# Distributed vocabulary build (explode + partial count + hash aggregate)
# ---------------------------------------------------------------------------

_VOCAB_SQL = """
SELECT token, COUNT(*) AS n FROM (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
WHERE token <> '' GROUP BY token ORDER BY n DESC, token LIMIT 50
"""


@register("vocab_top_terms", _VOCAB_SQL)
def vocab_top_terms(sf_dir: str):
    """Corpus vocabulary: whitespace tokens exploded and PARTIALLY counted
    per batch (value_counts inside map_batches) so the shuffle moves one
    row per distinct (batch, token), not one per token occurrence; global
    hash aggregate + deterministic top-50."""
    docs = _read(sf_dir, "documents", columns=["text"])

    def partial_counts(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(t["text"], " "))
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table({
            "token": vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        })

    return (
        docs.map_batches(partial_counts, batch_format="pyarrow",
                         zero_copy_batch=True)
        .groupby("token").aggregate(Sum("n", alias_name="n"))
        .sort(["n", "token"], descending=[True, False])
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Conversion funnel (conditional-min aggregate, no self-join)
# ---------------------------------------------------------------------------

_FUNNEL_SQL = """
SELECT user_id, first_click, first_purchase,
       CAST(CASE WHEN first_purchase IS NOT NULL
                  AND first_purchase >= first_click
                 THEN 1 ELSE 0 END AS BIGINT) AS converted
FROM (SELECT user_id,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END)
               AS first_purchase
      FROM events GROUP BY user_id) t
WHERE first_click IS NOT NULL
"""


@register("click_purchase_funnel", _FUNNEL_SQL)
def click_purchase_funnel(sf_dir: str):
    """Click→purchase funnel WITHOUT a self-join: the classic funnel
    correlates two event subsets per user, but MIN(CASE WHEN ...) turns
    it into ONE grouped aggregate over conditionally-masked timestamp
    columns (nulls ignored by MIN) — a single shuffle of (user, 2×ts)
    instead of events⋈events."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def masked(t: pa.Table) -> pa.Table:
        # aggregate int64 µs, not timestamps: Ray's grouped Min pushes
        # nullable timestamp blocks through a pandas reduce that emits
        # object datetimes + None (ArrowConversionError → pickle blocks)
        ts = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        nulls = pa.nulls(len(t), pa.int64())
        return pa.table({
            "user_id": t["user_id"],
            "click_us": pc.if_else(pc.equal(t["event_type"], "click"), ts, nulls),
            "purchase_us": pc.if_else(pc.equal(t["event_type"], "purchase"), ts, nulls),
        })

    agg = (
        ev.map_batches(masked, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(Min("click_us", alias_name="first_click_us"),
                   Min("purchase_us", alias_name="first_purchase_us"))
    )

    def finish(t: pa.Table) -> pa.Table:
        fc = pc.cast(pc.cast(t["first_click_us"], pa.int64()),
                     pa.timestamp("us"))
        fp = pc.cast(pc.cast(t["first_purchase_us"], pa.int64()),
                     pa.timestamp("us"))
        t = pa.table({"user_id": t["user_id"], "first_click": fc,
                      "first_purchase": fp})
        t = t.filter(pc.is_valid(t["first_click"]))
        conv = pc.and_kleene(
            pc.is_valid(t["first_purchase"]),
            pc.greater_equal(t["first_purchase"], t["first_click"]),
        )
        return t.append_column(
            "converted", pc.cast(pc.fill_null(conv, False), pa.int64()))

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Cohort retention matrix (per-user anchor broadcast + distinct reduce)
# ---------------------------------------------------------------------------

_COHORT_SQL = """
SELECT first_week, active_week,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM (SELECT e.user_id,
             date_trunc('week', f.first_ts) AS first_week,
             date_trunc('week', e.ts) AS active_week
      FROM events e
      JOIN (SELECT user_id, MIN(ts) AS first_ts
            FROM events GROUP BY user_id) f USING (user_id)) t
GROUP BY first_week, active_week
"""


@register("cohort_retention_weekly", _COHORT_SQL)
def cohort_retention_weekly(sf_dir: str):
    """Weekly cohort retention: per-user first-event anchors reduce to a
    user-sized table that BROADCASTS back over the streaming events (no
    events⋈events shuffle), per-batch distinct (first_week, active_week,
    user) pre-dedup shrinks the shuffle to distinct triples, then one
    hash aggregate counts users per cohort cell."""
    from sous_chef_ray.stages.join import broadcast_join

    ev = _read(sf_dir, "events", columns=["user_id", "ts"])
    anchors = (
        ev.groupby("user_id").aggregate(Min("ts", alias_name="first_ts"))
        .to_pandas()  # bounded: one row per user
    )
    tagged = broadcast_join(ev, anchors, on="user_id", concurrency=2)

    def weeks(t: pa.Table) -> pa.Table:
        out = pa.table({
            "first_week": pc.floor_temporal(
                pc.cast(t["first_ts"], pa.timestamp("us")), unit="week"),
            "active_week": pc.floor_temporal(
                pc.cast(t["ts"], pa.timestamp("us")), unit="week"),
            "user_id": t["user_id"],
        })
        return out.group_by(
            ["first_week", "active_week", "user_id"]).aggregate([])

    from sous_chef_ray.stages.agg import count_distinct

    triples = tagged.map_batches(weeks, batch_format="pyarrow",
                                 zero_copy_batch=True)
    return count_distinct(
        triples, ["first_week", "active_week"], "user_id", name="n_users",
        num_buckets=_buckets(sf_dir, "events"),
    )


# ---------------------------------------------------------------------------
# NTH_VALUE window function (whole-partition frame)
# ---------------------------------------------------------------------------

_NTH_SQL = """
SELECT user_id, event_id, ts,
       NTH_VALUE(event_id, 3) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS event_id_nth3
FROM events
"""


@register("event_nth_value", _NTH_SQL)
def event_nth_value(sf_dir: str):
    """NTH_VALUE over the whole key partition: one bucketed sort per
    key, the n-th slot is group_start+(n-1) validity-masked against the
    group end — same single-shuffle plan as FIRST/LAST_VALUE."""
    from sous_chef_ray.stages.window import with_nth_value

    ev = _read(sf_dir, "events", columns=["user_id", "event_id", "ts"])
    out = with_nth_value(
        ev, "user_id", ["ts", "event_id"], "event_id", 3,
        num_buckets=_buckets(sf_dir, "events"),
    )
    return out.select_columns(["user_id", "event_id", "ts", "event_id_nth3"])


# ---------------------------------------------------------------------------
# CORR / COVAR_SAMP via exact integer cross moments
# ---------------------------------------------------------------------------

_CORR_SQL = """
WITH m AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sx,
         CAST(SUM(CAST(FLOOR(l_extendedprice + 0.5) AS BIGINT)) AS BIGINT) AS sy,
         CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)
                  * CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sxx,
         CAST(SUM(CAST(FLOOR(l_extendedprice + 0.5) AS BIGINT)
                  * CAST(FLOOR(l_extendedprice + 0.5) AS BIGINT)) AS BIGINT) AS syy,
         CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)
                  * CAST(FLOOR(l_extendedprice + 0.5) AS BIGINT)) AS BIGINT) AS sxy
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, n, sx, sy, sxx, syy, sxy,
       CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
         / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)) AS covar_samp,
       CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
         / sqrt(CAST((CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
                     * (CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy)
                     AS DOUBLE))
         AS corr_qty_price
FROM m
"""


@register("corr_qty_price_per_flag", _CORR_SQL)
def corr_qty_price_per_flag(sf_dir: str):
    """CORR / COVAR_SAMP via exact integer CROSS moments (the
    value_moments_per_type determinism recipe extended to two columns):
    both engines sum x, y, x², y², xy as int64 over rounded whole units
    (order-independent), then compute n·Sxy−Sx·Sy and the variance
    product EXACTLY in wide integers (HUGEINT / Python int — these
    products exceed 2⁵³, where double arithmetic rounds differently per
    engine) and convert to double ONCE; sqrt and divide are correctly
    rounded IEEE, so the doubles are bit-identical. Whole units (not
    cents) keep y² sums ~4 decimal digits inside int64 at sf1."""
    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def moments(t: pa.Table) -> pa.Table:
        # floor(x+0.5), NOT pc.round: Arrow rounds half-to-even, DuckDB
        # ROUND half-away — whole-unit rounding of 2-decimal prices hits
        # .5 ties (the *100 cents trick never does); half-UP is the one
        # tie rule both engines express identically
        x = pc.cast(pc.floor(pc.add(t["l_quantity"], 0.5)), pa.int64())
        y = pc.cast(pc.floor(pc.add(t["l_extendedprice"], 0.5)), pa.int64())
        return pa.table({
            "l_returnflag": t["l_returnflag"], "x": x, "y": y,
            "xx": pc.multiply(x, x), "yy": pc.multiply(y, y),
            "xy": pc.multiply(x, y),
        })

    agg = (
        li.map_batches(moments, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_returnflag")
        .aggregate(
            Count(alias_name="n"),
            Sum("x", alias_name="sx"), Sum("y", alias_name="sy"),
            Sum("xx", alias_name="sxx"), Sum("yy", alias_name="syy"),
            Sum("xy", alias_name="sxy"),
        )
        .to_pandas()
    )
    nf = agg["n"].astype("float64")
    # exact wide-integer numerator/denominator (Python ints), ONE
    # int→double rounding — mirrors the SQL's HUGEINT arithmetic
    num = pd.Series(
        [int(n) * int(sxy) - int(sx) * int(sy)
         for n, sxy, sx, sy in zip(agg["n"], agg["sxy"], agg["sx"], agg["sy"])]
    ).astype("float64")
    den = pd.Series(
        [(int(n) * int(sxx) - int(sx) ** 2) * (int(n) * int(syy) - int(sy) ** 2)
         for n, sxx, sx, syy, sy
         in zip(agg["n"], agg["sxx"], agg["sx"], agg["syy"], agg["sy"])]
    ).astype("float64")
    agg["covar_samp"] = num / (nf * (nf - 1))
    agg["corr_qty_price"] = num / np.sqrt(den)
    return agg[["l_returnflag", "n", "sx", "sy", "sxx", "syy", "sxy",
                "covar_samp", "corr_qty_price"]]


# ---------------------------------------------------------------------------
# TF-IDF-style distinctive terms per document (tf × df join, top-3)
# ---------------------------------------------------------------------------

_TFIDF_SQL = """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
              FROM documents),
 tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks
        WHERE token <> '' GROUP BY doc_id, token),
 df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token)
SELECT doc_id, token, tf, df FROM (
  SELECT tf.doc_id, tf.token, tf.tf, df.df,
         ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf DESC, df.df, tf.token) AS rn
  FROM tf JOIN df USING (token)) t
WHERE rn <= 3
"""


@register("doc_distinctive_terms", _TFIDF_SQL)
def doc_distinctive_terms(sf_dir: str):
    """TF-IDF-shaped distinctive terms: each document's top-3 tokens by
    (term frequency DESC, document frequency ASC) — the exact integer
    ranking that makes the float idf = ln(N/df) ordering reproducible
    against SQL (ln() is not bit-identical across engines; the integer
    (tf, df) key orders the same pairs). Plan: tf is computed WITHOUT a
    shuffle (a document is one row, so one pass of per-batch pandas
    groupby is exact), df is a token-keyed hash aggregate over the
    (doc, token) distinct rows, tf⋈df is a large-large hash join on
    token, and the per-doc top-3 is a bucketed QUALIFY — every stage
    streams, nothing doc-corpus-sized reaches the driver."""
    from sous_chef_ray.stages.join import hash_join
    from sous_chef_ray.stages.window import topk_per_group

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def tf_batch(t: pa.Table) -> pa.Table:
        # split on single spaces (pc.split_pattern, NOT whitespace-split)
        # to stay token-identical with the oracle's string_split(text,' ')
        words = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = pc.list_flatten(words)
        parents = pc.list_parent_indices(words)
        doc = t["doc_id"].combine_chunks().take(parents)
        tbl = pa.table({"doc_id": doc, "token": flat})
        tbl = tbl.filter(pc.not_equal(tbl["token"], ""))
        g = tbl.group_by(["doc_id", "token"]).aggregate([([], "count_all")])
        return pa.table({"doc_id": g["doc_id"], "token": g["token"],
                         "tf": pc.cast(g["count_all"], pa.int64())})

    tf = docs.map_batches(tf_batch, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    df = tf.groupby("token").aggregate(Count(alias_name="df"))
    joined = hash_join(tf, df, on="token", num_partitions=_partitions(sf_dir, "documents"))
    top = topk_per_group(
        joined, "doc_id", ["tf", "df", "token"], k=3,
        descending=[True, False, False],
        num_buckets=_buckets(sf_dir, "documents"),
    )
    return top.select_columns(["doc_id", "token", "tf", "df"])


# ---------------------------------------------------------------------------
# TPC-H Q5 shape: star join through two fact tables + dim broadcast chain
# ---------------------------------------------------------------------------

_Q5_SQL = """
SELECT n.n_name, CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                               * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4
FROM customer c, orders o, lineitem l, supplier s, nation n, region r
WHERE c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey
  AND l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
  AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
  AND r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
"""


@register("local_supplier_volume_q5", _Q5_SQL)
def local_supplier_volume_q5(sf_dir: str):
    """Six-table star join with ONE large-large hash join: region/nation/
    supplier are driver-read dims (broadcast maps), the year filter prunes
    orders before the shuffle, customer nationkeys ride the orders join,
    and the same-nation condition is a vectorized compare after broadcast
    lookups — lineitem, the big fact, is touched once and never re-keyed.
    The two large joins are separated by a materialize: two pipelined Ray
    JoinOperators over-reserve aggregator actors and deadlock at low CPU
    counts."""
    import pyarrow.parquet as pq

    from sous_chef_ray.stages.join import broadcast_join, hash_join

    region = pq.read_table(f"{sf_dir}/region.parquet")
    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    asia_key = region.filter(pc.equal(region["r_name"], "ASIA"))["r_regionkey"][0].as_py()
    nat = nation.filter(pc.equal(nation["n_regionkey"], asia_key))
    nat_keys = set(nat["n_nationkey"].to_pylist())
    nat_df = nat.select(["n_nationkey", "n_name"]).to_pandas()
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"]).to_pandas()
    supp = supp[supp["s_nationkey"].isin(nat_keys)]

    lo = pd.Timestamp("1996-01-01").value // 1000
    hi = pd.Timestamp("1997-01-01").value // 1000
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])
    orders_f = orders.map_batches(
        lambda t: t.filter(pc.and_(
            pc.greater_equal(pc.cast(t["o_orderdate"], pa.int64()), lo),
            pc.less(pc.cast(t["o_orderdate"], pa.int64()), hi),
        )).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    cust_f = cust.map_batches(
        lambda t, ks=list(nat_keys): t.filter(
            pc.is_in(t["c_nationkey"], value_set=pa.array(ks))),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    o_c = hash_join(orders_f, cust_f, on="o_custkey", right_on="c_custkey",
                    num_partitions=_partitions(sf_dir, "lineitem", "orders")).select_columns(
        ["o_orderkey", "c_nationkey"]).materialize()

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount"])

    def rev(t: pa.Table) -> pa.Table:
        e4 = pc.cast(pc.round(pc.multiply(pc.multiply(
            t["l_extendedprice"], pc.subtract(1.0, t["l_discount"])),
            10000.0)), pa.int64())
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_suppkey": t["l_suppkey"], "rev_e4": e4})

    li_r = li.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True)
    j = hash_join(li_r, o_c, on="l_orderkey", right_on="o_orderkey",
                  num_partitions=_partitions(sf_dir, "lineitem", "orders"))
    with_supp = broadcast_join(j, supp, on="l_suppkey", right_on="s_suppkey",
                               concurrency=2)
    same_nation = with_supp.map_batches(
        lambda t: t.filter(pc.equal(t["c_nationkey"], t["s_nationkey"])),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    named = broadcast_join(same_nation, nat_df, on="s_nationkey",
                           right_on="n_nationkey", concurrency=2)
    return (
        named.groupby("n_name").aggregate(Sum("rev_e4", alias_name="revenue_e4"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q10 shape: returned-item revenue per customer, top 20
# ---------------------------------------------------------------------------

_Q10_SQL = """
SELECT c.c_custkey, c.c_name, t.revenue_e4, c.c_acctbal, n.n_name
FROM (SELECT o.o_custkey,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                 * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
        AND o.o_orderdate < TIMESTAMP '1996-10-01'
        AND l.l_returnflag = 'R'
      GROUP BY o.o_custkey) t
JOIN customer c ON c.c_custkey = t.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
ORDER BY t.revenue_e4 DESC, c.c_custkey
LIMIT 20
"""


@register("returned_item_revenue_q10", _Q10_SQL)
def returned_item_revenue_q10(sf_dir: str):
    """Lost-revenue-per-customer: lineitem pre-reduces to per-ORDER
    returned revenue before any join (the only lineitem-sized shuffle is
    that pre-aggregate), one hash join to quarter-filtered orders,
    re-aggregate per customer, then broadcast customer/nation attributes
    onto the (customer-sized) result and take a deterministic top 20."""
    import pyarrow.parquet as pq

    from sous_chef_ray.stages.join import broadcast_join, hash_join

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount",
                        "l_returnflag"])

    def returned_rev(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        e4 = pc.cast(pc.round(pc.multiply(pc.multiply(
            t["l_extendedprice"], pc.subtract(1.0, t["l_discount"])),
            10000.0)), pa.int64())
        return pa.table({"l_orderkey": t["l_orderkey"], "rev_e4": e4})

    per_order = (
        li.map_batches(returned_rev, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("l_orderkey").aggregate(Sum("rev_e4", alias_name="rev_e4"))
    )
    lo = pd.Timestamp("1996-07-01").value // 1000
    hi = pd.Timestamp("1996-10-01").value // 1000
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])
    orders_f = orders.map_batches(
        lambda t: t.filter(pc.and_(
            pc.greater_equal(pc.cast(t["o_orderdate"], pa.int64()), lo),
            pc.less(pc.cast(t["o_orderdate"], pa.int64()), hi),
        )).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    per_cust = (
        hash_join(per_order, orders_f, on="l_orderkey", right_on="o_orderkey",
                  num_partitions=_partitions(sf_dir, "lineitem", "orders"))
        .groupby("o_custkey").aggregate(Sum("rev_e4", alias_name="revenue_e4"))
    )
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name", "c_acctbal",
                                  "c_nationkey"]).to_pandas()
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"]).to_pandas()
    cust = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    named = broadcast_join(per_cust, cust, on="o_custkey",
                           right_on="c_custkey", concurrency=2)
    top = (
        named.sort(["revenue_e4", "c_custkey"], descending=[True, False])
        .limit(20)
    )
    return top.select_columns(
        ["c_custkey", "c_name", "revenue_e4", "c_acctbal", "n_name"]
    )


# ---------------------------------------------------------------------------
# TPC-H Q17 shape: correlated per-part average → broadcast threshold map
# ---------------------------------------------------------------------------

_Q17_SQL = """
WITH pp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#23'),
     agg AS (SELECT l.l_partkey,
                    SUM(CAST(l.l_quantity AS BIGINT)) AS s, COUNT(*) AS n
             FROM lineitem l JOIN pp ON l.l_partkey = pp.p_partkey
             GROUP BY l.l_partkey)
SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS price_e2,
       COUNT(*) AS n_items
FROM lineitem l JOIN agg a ON l.l_partkey = a.l_partkey
WHERE 5 * CAST(l.l_quantity AS BIGINT) * a.n < a.s
"""


@register("small_quantity_revenue_q17", _Q17_SQL)
def small_quantity_revenue_q17(sf_dir: str):
    """Correlated per-part AVG decorrelated: the brand's partkey set is
    tiny, so lineitem semi-filters against it, per-part (sum_qty, count)
    aggregates to a brand-sized map that BROADCASTS back, and the
    below-one-fifth-of-average test is the exact integer cross-multiply
    5·qty·n < s — no float average ever computed, both engines agree
    bit-for-bit at the threshold."""
    import pyarrow.parquet as pq

    from sous_chef_ray.stages.join import broadcast_join, semi_join

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    keys = part.filter(pc.equal(part["p_brand"], "Brand#23"))["p_partkey"]
    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice"])
    li_b = semi_join(li, keys.combine_chunks(), "l_partkey", concurrency=2)

    def qty_int(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": t["l_partkey"],
            "qty": pc.cast(pc.round(t["l_quantity"]), pa.int64()),
            "price_e2": pc.cast(pc.round(pc.multiply(
                t["l_extendedprice"], 100.0)), pa.int64()),
        })

    slim = li_b.map_batches(qty_int, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    stats = (
        slim.groupby("l_partkey")
        .aggregate(Sum("qty", alias_name="s"), Count(alias_name="n"))
    ).to_pandas()  # bounded: one row per brand part
    tagged = broadcast_join(slim, stats, on="l_partkey", concurrency=2)

    def below(t: pa.Table) -> pa.Table:
        keep = pc.less(pc.multiply(pc.multiply(t["qty"], 5), t["n"]), t["s"])
        return t.filter(keep).select(["price_e2"])

    agg = (
        tagged.map_batches(below, batch_format="pyarrow", zero_copy_batch=True)
        .aggregate(Sum("price_e2", alias_name="price_e2"),
                   Count(alias_name="n_items"))
    )
    return pd.DataFrame({"price_e2": [agg["price_e2"] or 0],
                         "n_items": [agg["n_items"]]})


# ---------------------------------------------------------------------------
# Count-Min sketch frequency estimates (exact when domain << width)
# ---------------------------------------------------------------------------

_CMS_SQL = """
SELECT event_type, COUNT(*) AS est_n FROM events GROUP BY event_type
"""


@register("cms_event_type_counts", _CMS_SQL)
def cms_event_type_counts(sf_dir: str):
    """Count-Min frequency estimates per event_type: per-batch exact
    value_counts fold into fixed (d×w×8)-byte partial tables that
    sum-merge — the shuffle moves sketches, never events. With the
    event-type domain (~5 values) far below w=2048, no two types
    collide in all d=4 rows, so the deterministic estimates equal the
    exact counts and an exact COUNT(*) oracle applies; at adversarial
    cardinalities the same sketch degrades gracefully to the
    n·e/w-bounded overestimate."""
    from sous_chef_ray.stages.join import distinct_key_array
    from sous_chef_ray.stages.sketch import countmin_of

    ev = _read(sf_dir, "events", columns=["event_type"])
    sk = countmin_of(ev, "event_type", w=2048, d=4)
    types = sorted(distinct_key_array(ev, "event_type").to_pylist())
    vals = pd.Series(types, dtype="object")
    return pd.DataFrame({
        "event_type": vals,
        "est_n": sk.estimate(vals).astype("int64"),
    })


# ---------------------------------------------------------------------------
# Train-test decontamination: drop docs sharing a word-4-gram with the
# benchmark slice (doc_id % 29 == 0 stands in for the held-out benchmark)
# ---------------------------------------------------------------------------

_DECON_SQL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT doc_id,
         ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS gram
  FROM w, UNNEST(generate_series(1, len(ws) - 3)) AS t(i)
),
bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 29 = 0),
bad AS (SELECT DISTINCT doc_id FROM g
        WHERE doc_id % 29 <> 0 AND gram IN (SELECT gram FROM bench))
SELECT doc_id, n_chars FROM documents
WHERE doc_id % 29 <> 0 AND doc_id NOT IN (SELECT doc_id FROM bad)
"""


@register("decontaminate_docs", _DECON_SQL)
def decontaminate_docs(sf_dir: str):
    """Train-test decontamination (stages/text.decontaminate): the
    benchmark slice's distinct word-4-gram hashes are collected
    distributed (8-byte hashes move, never text), broadcast once, and
    every training doc with ANY overlapping 4-gram is dropped — the
    standard leakage guard an LLM data pipeline runs before training."""
    from sous_chef_ray.stages.text import collect_benchmark_ngrams, decontaminate

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    def slice_of(bench_side: bool):
        def fn(t: pa.Table) -> pa.Table:
            is_bench = pc.equal(
                pc.subtract(t["doc_id"],
                            pc.multiply(pc.divide(t["doc_id"], 29), 29)), 0)
            return t.filter(is_bench if bench_side else pc.invert(is_bench))
        return fn

    bench = docs.map_batches(slice_of(True), batch_format="pyarrow",
                             zero_copy_batch=True)
    corpus = docs.map_batches(slice_of(False), batch_format="pyarrow",
                              zero_copy_batch=True)
    grams = collect_benchmark_ngrams(bench, n=4)
    kept = decontaminate(corpus, grams, n=4)
    return kept.select_columns(["doc_id", "n_chars"])


# ---------------------------------------------------------------------------
# RATIO_TO_REPORT window: share of yearly revenue per nation
# ---------------------------------------------------------------------------

_SHARE_SQL = """
WITH a AS (
  SELECT EXTRACT(year FROM o.o_orderdate) AS o_year, n.n_name,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_c
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2
)
SELECT o_year, n_name, rev_c,
       CAST(rev_c AS DOUBLE)
         / CAST(CAST(SUM(rev_c) OVER (PARTITION BY o_year) AS BIGINT)
                AS DOUBLE) AS share
FROM a
"""


@register("nation_revenue_share", _SHARE_SQL)
def nation_revenue_share(sf_dir: str):
    """RATIO_TO_REPORT window shape: exact-cents revenue per (year,
    nation) via a distributed hash aggregate (customer nation rides a
    broadcast map), then the share-of-year window as a partition_apply
    over o_year — the same integers divide on both sides, so the doubles
    are bit-identical."""
    import pyarrow.parquet as pq

    from sous_chef_ray.stages.partition import partition_apply

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    nm = dict(zip(nation["n_nationkey"].to_pylist(),
                  nation["n_name"].to_pylist()))
    ckeys = pa.array(cust["c_custkey"].to_pylist(), type=pa.int64())
    cnames = pa.array([nm[k] for k in cust["c_nationkey"].to_pylist()])

    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def prep(t: pa.Table, ck=ckeys, cn=cnames) -> pa.Table:
        name = pc.take(cn, pc.index_in(t["o_custkey"], value_set=ck))
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                        pa.int64())
        return pa.table({"o_year": pc.year(t["o_orderdate"]),
                         "n_name": name, "rev_c": cents})

    agg = (
        orders.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["o_year", "n_name"])
        .aggregate(Sum("rev_c", alias_name="rev_c"))
    )

    def share(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        tot = df.groupby("o_year")["rev_c"].transform("sum")
        df["share"] = df["rev_c"].astype(float) / tot.astype(float)
        return df

    # key cardinality (distinct years) is a single-digit constant —
    # buckets beyond it are empty; NOT a scale knob
    return partition_apply(agg, "o_year", share, num_buckets=8)


# ---------------------------------------------------------------------------
# Correlated-subquery shape: orders above the customer's own average
# ---------------------------------------------------------------------------

_ABOVEAVG_SQL = """
WITH s AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_c,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY o_custkey
)
SELECT o.o_orderkey, o.o_custkey,
       CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS price_c
FROM orders o JOIN s ON s.o_custkey = o.o_custkey
WHERE CAST(ROUND(o.o_totalprice * 100) AS BIGINT) * s.n > s.sum_c
"""


@register("orders_above_customer_avg", _ABOVEAVG_SQL)
def orders_above_customer_avg(sf_dir: str):
    """Correlated-subquery shape (WHERE price > AVG(...) per customer)
    as ONE partition_apply pass: each bucket holds whole customers, the
    per-customer sum/count are vectorized transforms, and the comparison
    is the integer cross-multiplication price_c * n > sum_c — no float
    average exists on either side, so parity is exact by construction."""
    from sous_chef_ray.stages.partition import partition_apply

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                        pa.int64())
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_custkey": t["o_custkey"], "price_c": cents})

    def above(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_custkey")["price_c"]
        n = g.transform("size").to_numpy(dtype=np.int64)
        s = g.transform("sum").to_numpy(dtype=np.int64)
        keep = df["price_c"].to_numpy() * n > s
        return df.loc[keep, ["o_orderkey", "o_custkey", "price_c"]]

    slim = orders.map_batches(prep, batch_format="pyarrow",
                              zero_copy_batch=True)
    return partition_apply(slim, "o_custkey", above,
                           num_buckets=_buckets(sf_dir, "orders"))


# ---------------------------------------------------------------------------
# Per-source document cap (the per-domain cap step of web-corpus recipes)
# ---------------------------------------------------------------------------

_CAP_SQL = """
SELECT doc_id, source
FROM documents
QUALIFY row_number() OVER (PARTITION BY source
                           ORDER BY md5(text), doc_id) <= 10
"""


@register("per_source_doc_cap", _CAP_SQL)
def per_source_doc_cap(sf_dir: str):
    """Per-domain cap: keep at most 10 docs per source, chosen by
    deterministic md5 order (stateless, partitioning-independent — the
    same docs survive on any cluster size). One partition_apply bucket
    pass does a vectorized per-source nsmallest; only (doc_id, source,
    16-byte hash) rows shuffle, never text."""
    from sous_chef_ray.stages.partition import partition_apply
    from sous_chef_ray.stages.text import add_md5_fingerprint

    docs = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])
    slim = add_md5_fingerprint(docs, "text").select_columns(
        ["doc_id", "source", "fingerprint"])

    def cap(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["source", "fingerprint", "doc_id"],
                            kind="mergesort")
        kept = df.groupby("source", sort=False).head(10)
        return kept[["doc_id", "source"]]

    # "source" has a handful of distinct values — buckets beyond key
    # cardinality stay empty; NOT a scale knob
    return partition_apply(slim, "source", cap, num_buckets=8)


# ---------------------------------------------------------------------------
# Cross-document duplicated-substring spans (exact-substring dedup shape)
# ---------------------------------------------------------------------------

_DUPSPAN_SQL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT doc_id, i, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
  FROM w, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)
),
dup AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
hits AS (SELECT doc_id, i FROM g WHERE gram IN (SELECT gram FROM dup)),
runs AS (
  SELECT doc_id, i,
         i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
  FROM hits
),
runlen AS (SELECT doc_id, grp, count(*) AS rl FROM runs GROUP BY doc_id, grp),
perdoc AS (
  SELECT h.doc_id, CAST(count(*) AS BIGINT) AS n_dup_grams,
         CAST(max(r.mx) AS BIGINT) AS max_dup_run
  FROM hits h
  JOIN (SELECT doc_id, max(rl) AS mx FROM runlen GROUP BY doc_id) r
    ON r.doc_id = h.doc_id
  GROUP BY h.doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_dup_grams, 0) AS n_dup_grams,
       COALESCE(p.max_dup_run, 0) AS max_dup_run,
       CASE WHEN p.max_dup_run IS NULL THEN 0
            ELSE p.max_dup_run + 2 END AS dup_span_words
FROM documents d LEFT JOIN perdoc p ON p.doc_id = d.doc_id
"""


@register("doc_duplicate_spans", _DUPSPAN_SQL)
def doc_duplicate_spans(sf_dir: str):
    """Exact-substring dedup signal (the 'deduplicating training data'
    shape): word-3-gram hashes appearing in >= 2 distinct docs are found
    distributed (8-byte (hash, n) pairs shuffle), broadcast, and one
    vectorized pass per batch marks hit positions, groups consecutive
    hits into runs (never crossing docs) and reports per doc the number
    of duplicated grams and the longest verbatim-shared span in words."""
    from sous_chef_ray.stages.text import (
        find_crossdoc_grams,
        flag_duplicate_substrings,
    )

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"]).materialize()
    dup = find_crossdoc_grams(docs, n=3, min_docs=2)
    out = flag_duplicate_substrings(docs, dup, n=3)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "n_dup_grams": t["n_dup_grams"],
            "max_dup_run": t["max_dup_run"],
            "dup_span_words": t["dup_span_words"],
        })

    return out.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Robust (median/MAD) per-source outlier detection — integer-exact
# ---------------------------------------------------------------------------

_MAD_SQL = """
WITH med AS (
  SELECT source,
         CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars)
              AS BIGINT) AS med
  FROM documents GROUP BY source
),
dev AS (
  SELECT d.doc_id, d.source, d.n_chars, ABS(d.n_chars - m.med) AS adev
  FROM documents d JOIN med m ON d.source = m.source
),
mad AS (
  SELECT source,
         CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)
              AS BIGINT) AS mad
  FROM dev GROUP BY source
)
SELECT v.doc_id, v.source, v.n_chars
FROM dev v JOIN mad m ON v.source = m.source
WHERE v.adev > 3 * m.mad
"""


@register("doc_length_outliers", _MAD_SQL)
def doc_length_outliers(sf_dir: str):
    """Robust per-source outlier detection (median/MAD z-score on doc
    length): all three steps are per-source, so ONE partition_apply
    bucket pass computes the lower-median, absolute deviations, MAD and
    the 3-MAD filter per stratum — pure int64 comparisons end to end
    (no float drift vs the SQL oracle)."""
    from sous_chef_ray.stages.partition import partition_apply

    docs = _read(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        def disc_median(v: np.ndarray) -> int:
            v = np.sort(v)
            return int(v[max(int(np.ceil(0.5 * len(v))) - 1, 0)])

        outs = []
        for src, g in df.groupby("source", sort=False):
            n = g["n_chars"].to_numpy()
            adev = np.abs(n - disc_median(n))
            keep = adev > 3 * disc_median(adev)
            outs.append(g.loc[keep, ["doc_id", "source", "n_chars"]])
        return (pd.concat(outs) if outs
                else df[["doc_id", "source", "n_chars"]].iloc[:0])

    # "source" has a handful of distinct values — buckets beyond key
    # cardinality stay empty; NOT a scale knob
    return partition_apply(docs, "source", fn, num_buckets=8)


# ---------------------------------------------------------------------------
# Training-mix assembly: per-source sampling fraction + epoch repetition
# ---------------------------------------------------------------------------

_MIX_THR = ["20", "55", "aa", "ff"]
_MIX_ROWS = ",\n  ".join(
    f"('src{k}', '{_MIX_THR[k % 4]}', {k % 3 + 1})" for k in range(20))
_MIX_SQL = f"""
WITH cfg(source, thr, reps) AS (VALUES
  {_MIX_ROWS})
SELECT d.doc_id, d.source, CAST(e.epoch AS BIGINT) AS epoch
FROM documents d
JOIN cfg ON d.source = cfg.source,
     UNNEST(generate_series(1, cfg.reps)) AS e(epoch)
WHERE md5(d.text) < cfg.thr
"""


@register("source_mix_sample", _MIX_SQL)
def source_mix_sample(sf_dir: str):
    """Data-recipe assembly (stages/dedup.mix_sources): each source gets
    a deterministic md5-threshold sampling fraction and an integer epoch
    repetition count (the "Wikipedia x3, CommonCrawl 20%" mix). One
    map_batches pass, no shuffle, no RNG state."""
    from sous_chef_ray.stages.dedup import mix_sources

    plan = {f"src{k}": (_MIX_THR[k % 4], k % 3 + 1) for k in range(20)}
    docs = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])
    return mix_sources(docs, "source", "text", plan).select_columns(
        ["doc_id", "source", "epoch"])


# ---------------------------------------------------------------------------
# End-to-end corpus preparation: the full LLM-training-data cleaning chain
# as ONE streaming pipeline with ONE exact SQL oracle
# ---------------------------------------------------------------------------

_PREP_SQL = r"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
  FROM documents
),
words AS (SELECT doc_id, string_split(t, ' ') AS ws FROM norm),
grams AS (
  SELECT doc_id,
         ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS gram
  FROM words, UNNEST(generate_series(1, len(ws) - 3)) AS g(i)
),
bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 29 = 0),
train AS (
  SELECT doc_id, t FROM norm
  WHERE doc_id % 29 <> 0
    AND length(regexp_split_to_array(t, '\s+')) >= 30
),
bad AS (SELECT DISTINCT doc_id FROM grams
        WHERE doc_id % 29 <> 0 AND gram IN (SELECT gram FROM bench)),
decon AS (SELECT * FROM train WHERE doc_id NOT IN (SELECT doc_id FROM bad)),
lined AS (
  SELECT doc_id,
         regexp_replace(t, '(\S+ \S+ \S+) ', '\1' || chr(10), 'g') AS t
  FROM decon
),
lines AS (
  SELECT doc_id, i AS ln, ls[i] AS line
  FROM (SELECT doc_id, string_split(t, chr(10)) AS ls FROM lined),
       UNNEST(generate_series(1, len(ls))) AS g(i)
),
hot AS (SELECT line FROM lines GROUP BY line HAVING count(DISTINCT doc_id) >= 3),
flagged AS (
  SELECT l.doc_id, l.ln, l.line, h.line IS NOT NULL AS is_hot
  FROM lines l LEFT JOIN hot h ON l.line = h.line
),
stripped AS (
  SELECT doc_id,
         coalesce(string_agg(CASE WHEN NOT is_hot THEN line END,
                             chr(10) ORDER BY ln), '') AS t,
         CAST(count(*) FILTER (WHERE is_hot) AS BIGINT) AS n_lines_removed
  FROM flagged GROUP BY doc_id
),
dedup AS (
  SELECT doc_id, t, n_lines_removed,
         row_number() OVER (PARTITION BY t ORDER BY doc_id) AS rn
  FROM stripped
)
SELECT doc_id, t AS text, n_lines_removed,
       CASE WHEN t = '' THEN 0
            ELSE CAST(length(regexp_split_to_array(t, '\s+')) AS BIGINT)
       END AS n_tokens
FROM dedup WHERE rn = 1
"""


@register("prepare_corpus", _PREP_SQL)
def prepare_corpus(sf_dir: str):
    """The full training-corpus cleaning chain as one streaming Ray
    pipeline: normalize -> quality-filter (>= 30 words) -> train-test
    decontamination (word-4-gram overlap vs the doc_id%29 benchmark
    slice) -> cross-corpus boilerplate-line removal -> exact content
    dedup (min doc_id per md5) -> token count. Every pass is the
    production stage (stages/text.py, stages/dedup.py); the shuffles
    move 8-16-byte hashes, never documents; the whole chain is verified
    value-exact against ONE composed DuckDB oracle."""
    from sous_chef_ray.stages.dedup import exact_dedup
    from sous_chef_ray.stages.text import (
        add_md5_fingerprint,
        collect_benchmark_ngrams,
        decontaminate,
        find_boilerplate_lines,
        normalize_text,
        remove_boilerplate_lines,
    )

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    norm = normalize_text(docs, "text").select_columns(["doc_id", "norm_text"])

    def is_bench_mask(t: pa.Table):
        return pc.equal(
            pc.subtract(t["doc_id"],
                        pc.multiply(pc.divide(t["doc_id"], 29), 29)), 0)

    bench = norm.map_batches(
        lambda t: t.filter(is_bench_mask(t)),
        batch_format="pyarrow", zero_copy_batch=True)
    grams = collect_benchmark_ngrams(bench, text_col="norm_text", n=4)

    def to_train(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(is_bench_mask(t)))
        trimmed = pc.utf8_trim_whitespace(t["norm_text"])
        n = pc.list_value_length(pc.split_pattern_regex(trimmed, r"\s+"))
        t = t.filter(pc.greater_equal(n, 30))
        return pa.table({"doc_id": t["doc_id"], "text": t["norm_text"]})

    train = norm.map_batches(to_train, batch_format="pyarrow",
                             zero_copy_batch=True)
    decon = decontaminate(train, grams, text_col="text", n=4)

    def lineify(t: pa.Table) -> pa.Table:
        lined = pc.replace_substring_regex(
            t["text"], r"(\S+ \S+ \S+) ", "\\1\n")
        return pa.table({"doc_id": t["doc_id"], "text": lined})

    # materialize the cleaned training set ONCE: the hot-line counting
    # pass and the strip pass both consume it, and without a pin the
    # lazy chain re-runs normalize->quality->decontaminate per consumer
    # (blocks spill to the object store at scale rather than recompute)
    lined = decon.map_batches(lineify, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    hot = find_boilerplate_lines(lined, min_docs=3)
    stripped = remove_boilerplate_lines(lined, hot)

    deduped = exact_dedup(
        add_md5_fingerprint(stripped, "text"), "fingerprint", keep_by="doc_id")

    def finish(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(t["text"])
        n = pc.list_value_length(pc.split_pattern_regex(trimmed, r"\s+"))
        n = pc.if_else(pc.equal(t["text"], ""), pa.scalar(0, pa.int32()), n)
        return pa.table({
            "doc_id": t["doc_id"], "text": t["text"],
            "n_lines_removed": pc.cast(t["n_lines_removed"], pa.int64()),
            "n_tokens": pc.cast(n, pa.int64()),
        })

    return deduped.map_batches(finish, batch_format="pyarrow",
                               zero_copy_batch=True)


# ---------------------------------------------------------------------------
# TPC-H Q6 shape: forecast-revenue-change scan (pure filter + aggregate)
# ---------------------------------------------------------------------------

_Q6_SQL = """
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 10000) AS BIGINT))
            AS BIGINT) AS revenue_e4,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


@register("forecast_revenue_q6", _Q6_SQL)
def forecast_revenue_q6(sf_dir: str):
    """TPC-H Q6: the canonical scan-dominated query — predicate pushed
    into the parquet read (row groups outside the year/discount/quantity
    envelope never leave storage), exact-cents revenue summed in one
    streaming aggregate; no shuffle at all."""
    import pyarrow.dataset as pads

    f = (
        (pads.field("l_shipdate") >= pd.Timestamp("1996-01-01"))
        & (pads.field("l_shipdate") < pd.Timestamp("1997-01-01"))
        & (pads.field("l_discount") >= 0.05)
        & (pads.field("l_discount") <= 0.07)
        & (pads.field("l_quantity") < 24)
    )
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount"],
        filter=f,
    )

    def rev(t: pa.Table) -> pa.Table:
        e4 = pc.cast(pc.round(pc.multiply(pc.multiply(
            t["l_extendedprice"], t["l_discount"]), 10000.0)), pa.int64())
        return pa.table({"rev_e4": e4})

    agg = (
        li.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True)
        .aggregate(Sum("rev_e4", alias_name="revenue_e4"),
                   Count(alias_name="n_rows"))
    )
    return pd.DataFrame({"revenue_e4": [int(agg["revenue_e4"])],
                         "n_rows": [int(agg["n_rows"])]})


# ---------------------------------------------------------------------------
# TPC-H Q7 shape: volume shipping between two nations by year
# ---------------------------------------------------------------------------

_Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(vol_e4) AS BIGINT) AS revenue_e4
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM l.l_shipdate) AS l_year,
         CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
              AS BIGINT) AS vol_e4
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN region r1 ON r1.r_regionkey = n1.n_regionkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
  WHERE ((r1.r_name = 'AMERICA' AND r2.r_name = 'ASIA')
      OR (r1.r_name = 'ASIA' AND r2.r_name = 'AMERICA'))
    AND l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate < TIMESTAMP '1998-01-01'
) GROUP BY supp_nation, cust_nation, l_year
"""


@register("volume_shipping_q7", _Q7_SQL)
def volume_shipping_q7(sf_dir: str):
    """TPC-H Q7 (region-pair variant — the testdata's 10-supplier
    nation-pair cell is empty at sf0.001): eight-table join with ONE
    large-large shuffle. Nation/region/supplier are broadcast dims;
    customers are pre-filtered to the two regions before the orders hash
    join; lineitem is date-pruned at the read and joined once; the
    region-pair disjunction is a vectorized compare after broadcast
    lookups."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from sous_chef_ray.stages.join import broadcast_join, hash_join

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    rkeys = {r["r_name"]: r["r_regionkey"]
             for r in region.to_pylist()}
    want = {rkeys["AMERICA"], rkeys["ASIA"]}
    pair = nation.filter(pc.is_in(nation["n_regionkey"],
                                  value_set=pa.array(sorted(want))))
    pair_keys = pair["n_nationkey"].to_pylist()
    name_of = dict(zip(pair_keys, pair["n_name"].to_pylist()))
    region_of = dict(zip(pair_keys, pair["n_regionkey"].to_pylist()))

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"]).to_pandas()
    supp = supp[supp["s_nationkey"].isin(pair_keys)]

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    cust_f = cust.map_batches(
        lambda t, ks=pair_keys: t.filter(
            pc.is_in(t["c_nationkey"], value_set=pa.array(ks))),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    o_c = hash_join(orders, cust_f, on="o_custkey", right_on="c_custkey",
                    num_partitions=_partitions(sf_dir, "lineitem", "orders")).select_columns(
        ["o_orderkey", "c_nationkey"]).materialize()

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
        filter=((pads.field("l_shipdate") >= pd.Timestamp("1996-01-01"))
                & (pads.field("l_shipdate") < pd.Timestamp("1998-01-01"))),
    )

    def prep(t: pa.Table) -> pa.Table:
        e4 = pc.cast(pc.round(pc.multiply(pc.multiply(
            t["l_extendedprice"], pc.subtract(1.0, t["l_discount"])),
            10000.0)), pa.int64())
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_suppkey": t["l_suppkey"],
                         "l_year": pc.year(t["l_shipdate"]),
                         "vol_e4": e4})

    li_p = li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    j = hash_join(li_p, o_c, on="l_orderkey", right_on="o_orderkey",
                  num_partitions=_partitions(sf_dir, "lineitem", "orders"))
    with_supp = broadcast_join(j, supp, on="l_suppkey", right_on="s_suppkey",
                               concurrency=2)

    def tag(t: pa.Table, nm=name_of, rg=region_of) -> pa.Table:
        keys = pa.array(list(nm), type=pa.int64())
        names = pa.array([nm[k] for k in nm])
        regions = pa.array([rg[k] for k in nm], type=pa.int64())
        si = pc.index_in(t["s_nationkey"], value_set=keys)
        ci = pc.index_in(t["c_nationkey"], value_set=keys)
        # cross-region pairs only (both endpoints are already in the two
        # wanted regions by the supplier/customer pre-filters)
        t = t.filter(pc.invert(pc.equal(pc.take(regions, si),
                                        pc.take(regions, ci))))
        si = pc.index_in(t["s_nationkey"], value_set=keys)
        ci = pc.index_in(t["c_nationkey"], value_set=keys)
        return pa.table({"supp_nation": pc.take(names, si),
                         "cust_nation": pc.take(names, ci),
                         "l_year": t["l_year"], "vol_e4": t["vol_e4"]})

    return (
        with_supp.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["supp_nation", "cust_nation", "l_year"])
        .aggregate(Sum("vol_e4", alias_name="revenue_e4"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q8 shape: national market share within a region for a part type
# ---------------------------------------------------------------------------

_Q8_SQL = """
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN vol_e4 ELSE 0 END)
            AS BIGINT) AS nation_e4,
       CAST(SUM(vol_e4) AS BIGINT) AS total_e4,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN vol_e4 ELSE 0 END)
            AS DOUBLE) / CAST(SUM(vol_e4) AS DOUBLE) AS mkt_share
FROM (
  SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
         n1.n_name AS supp_nation,
         CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
              AS BIGINT) AS vol_e4
  FROM part p
  JOIN lineitem l ON l.l_partkey = p.p_partkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n2.n_regionkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'AMERICA' AND p.p_type = 'STANDARD'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate < TIMESTAMP '1998-01-01'
) GROUP BY o_year
"""


@register("national_market_share_q8", _Q8_SQL)
def national_market_share_q8(sf_dir: str):
    """TPC-H Q8: eight-table star with one large-large shuffle. part is
    reduced to a broadcast key set (semi filter inside the lineitem
    read path), supplier/nation/region are broadcast maps, customers are
    region-filtered before the orders join, and the market-share ratio
    divides the SAME exact-cents integers on both sides so the doubles
    are bit-identical."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from sous_chef_ray.stages.join import hash_join

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    rkey = region.filter(pc.equal(region["r_name"], "AMERICA"))["r_regionkey"][0].as_py()
    region_nations = nation.filter(pc.equal(nation["n_regionkey"], rkey))
    rn_keys = region_nations["n_nationkey"].to_pylist()

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    s_keys = pa.array(supp["s_suppkey"].to_pylist(), type=pa.int64())
    nm = dict(zip(nation["n_nationkey"].to_pylist(),
                  nation["n_name"].to_pylist()))
    s_names = pa.array([nm[k] for k in supp["s_nationkey"].to_pylist()])

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    pkeys = part.filter(pc.equal(part["p_type"], "STANDARD"))["p_partkey"]
    pkeys = pa.array(pkeys.to_pylist(), type=pa.int64())

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    cust_f = cust.map_batches(
        lambda t, ks=rn_keys: t.filter(
            pc.is_in(t["c_nationkey"], value_set=pa.array(ks))
        ).select(["c_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=((pads.field("o_orderdate") >= pd.Timestamp("1996-01-01"))
                & (pads.field("o_orderdate") < pd.Timestamp("1998-01-01"))),
    )
    o_c = hash_join(orders, cust_f, on="o_custkey", right_on="c_custkey",
                    num_partitions=_partitions(sf_dir, "lineitem", "orders"))
    o_c = o_c.map_batches(
        lambda t: pa.table({"o_orderkey": t["o_orderkey"],
                            "o_year": pc.year(t["o_orderdate"])}),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_partkey", "l_suppkey",
                        "l_extendedprice", "l_discount"])

    def prep(t: pa.Table, pk=pkeys, sk=s_keys, sn=s_names) -> pa.Table:
        t = t.filter(pc.is_in(t["l_partkey"], value_set=pk))
        e4 = pc.cast(pc.round(pc.multiply(pc.multiply(
            t["l_extendedprice"], pc.subtract(1.0, t["l_discount"])),
            10000.0)), pa.int64())
        supp_nation = pc.take(sn, pc.index_in(t["l_suppkey"], value_set=sk))
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "supp_nation": supp_nation, "vol_e4": e4})

    li_p = li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    j = hash_join(li_p, o_c, on="l_orderkey", right_on="o_orderkey",
                  num_partitions=_partitions(sf_dir, "lineitem", "orders"))

    def split(t: pa.Table) -> pa.Table:
        hit = pc.equal(t["supp_nation"], "NATION_1")
        nat = pc.if_else(hit, t["vol_e4"], pa.scalar(0, pa.int64()))
        return pa.table({"o_year": t["o_year"], "nation_e4": nat,
                         "total_e4": t["vol_e4"]})

    agg = (
        j.map_batches(split, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_year")
        .aggregate(Sum("nation_e4", alias_name="nation_e4"),
                   Sum("total_e4", alias_name="total_e4"))
    )

    def share(t: pa.Table) -> pa.Table:
        return t.append_column(
            "mkt_share",
            pc.divide(pc.cast(t["nation_e4"], pa.float64()),
                      pc.cast(t["total_e4"], pa.float64())))

    return agg.map_batches(share, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Registration order: the driver's correctness gate checks the FIRST ~50
# registered queries, so every exact-oracle §2.F / north-rule operator must
# land inside that window; redundant SQL-surface variants and rows-only
# sketches follow. Source order above stays grouped by topic — this block
# re-keys the dicts (insertion order IS the registration order).
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# SQL → Ray plan compiler (sqlexec.py): each query below is executed by
# compiling the SQL STRING ITSELF into a Ray Data plan — zero hand-built
# pipeline — and the identical string is the DuckDB oracle.  This is the
# bridge from the reference's validated-SQL surface (ref
# sql_sources.py:155-193, validators.py:15-16) to execution.
# ---------------------------------------------------------------------------

_SQL_EXECUTE_FAMILY = {
    # reuse the two flagship aggregate SQLs verbatim (round-3 VERDICT #1)
    "sql_execute_pricing_summary": _PRICING_SQL,
    "sql_execute_weekly_rollup": _DATETRUNC_SQL,
    # scalar surface: CASE / strings / dates / IN / BETWEEN / LIKE, with
    # the WHERE pushed into the parquet scan where scan-expressible
    "sql_execute_filter_case": """
SELECT o_orderkey,
       CASE WHEN o_totalprice > 200000 THEN 'big'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'small' END AS size_class,
       UPPER(o_orderstatus) || '-' || o_orderpriority AS tag,
       EXTRACT(YEAR FROM o_orderdate) AS yr
FROM orders
WHERE o_orderstatus IN ('F', 'O') AND o_totalprice BETWEEN 1000 AND 250000
      AND o_orderpriority LIKE '%-%'
""",
    # GROUP BY expression + HAVING + COUNT(DISTINCT) via
    # stages/agg.count_distinct
    "sql_execute_having_distinct": """
SELECT user_id, COUNT(DISTINCT event_type) AS n_types,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events GROUP BY user_id HAVING COUNT(*) > 5
""",
    # window functions → stages/window dispatch
    "sql_execute_rank_rownumber": """
SELECT o_orderkey, o_custkey,
       RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rk,
       ROW_NUMBER() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey) AS rn
FROM orders
""",
    "sql_execute_lag_lead": """
SELECT event_id, user_id,
       LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
       LEAD(value, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next2_value
FROM events
""",
    "sql_execute_first_last_runsum": """
SELECT event_id,
       FIRST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS first_value_seen,
       LAST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_value_seen,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
FROM events
""",
    # global aggregate (constant-key groupby) + AVG exactness
    "sql_execute_global_agg": """
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
       AVG(o_orderkey) AS avg_key
FROM orders
""",
    # bare COUNT(*): the plan needs ZERO input columns — the scan keeps
    # one narrow key column so Arrow blocks carry their row count (a
    # zero-column block loses it through Ray's shuffle)
    "sql_execute_count_star": """
SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem
""",
    # named WINDOW clause: one definition shared by several OVER w refs
    # (the Snowflake/Teradata reporting idiom), resolved at parse time
    "sql_execute_named_window": """
SELECT event_id, user_id,
       LAG(value) OVER w AS prev_value,
       LEAD(value) OVER w AS next_value,
       ROW_NUMBER() OVER w AS rn
FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    # global COUNT(DISTINCT): no GROUP BY keys — buckets on the constant
    # group key (partition_apply needs ≥1 key), merged scalar-wise
    "sql_execute_count_distinct_global": """
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs
FROM orders
""",
    # ORDER BY + LIMIT on a streaming projection (global top-k)
    "sql_execute_topk": """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
""",
    # LIMIT/OFFSET pagination (order-preserving bounded gather) +
    # ORDER BY naming a select alias
    "sql_execute_topk_offset": """
SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n FROM orders
GROUP BY o_custkey ORDER BY n DESC, o_custkey LIMIT 20 OFFSET 10
""",
    # dates + arithmetic + NULLIF/COALESCE surface
    "sql_execute_scalar_dates": """
SELECT l_orderkey, l_linenumber,
       DATE_TRUNC('month', l_shipdate) AS ship_month,
       CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS net_cents,
       COALESCE(NULLIF(l_returnflag, 'N'), 'NONE') AS flag_or_none,
       l_quantity / 2 AS half_qty
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1996-01-01 00:00:00'
""",
    # --- joins (round 4): FROM-clause planner ----------------------------
    # inner equi-join, dim side broadcast (customer ≤ broadcast_rows),
    # per-side WHERE conjuncts pushed below the join
    "sql_execute_join_filter": """
SELECT o.o_orderkey AS ok, c.c_name AS cust_name, o.o_totalprice AS price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_totalprice > 180000 AND c.c_mktsegment = 'BUILDING'
""",
    # LEFT OUTER join + aggregate over the preserved side
    "sql_execute_join_left_agg": """
SELECT c.c_mktsegment AS seg,
       CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_mktsegment
""",
    # three-way join chain + integer-cents exact aggregate
    "sql_execute_join_three_way": """
SELECT n.n_name AS nation,
       CAST(SUM(CAST(o.o_totalprice * 100 AS BIGINT)) AS BIGINT) AS cents,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F'
GROUP BY n.n_name
""",
    # derived table (bounded aggregate subquery) joined as a dim side
    "sql_execute_join_derived": """
SELECT c.c_name AS cust_name, t.total_cents AS total_cents
FROM (SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice * 100 AS BIGINT)) AS BIGINT) AS total_cents
      FROM orders GROUP BY o_custkey) t
JOIN customer c ON t.o_custkey = c.c_custkey
WHERE t.total_cents > 50000000
""",
    # scalar subquery → Lit at plan time (bounded 1×1)
    "sql_execute_scalar_subquery": """
SELECT o_orderkey, o_totalprice FROM orders
WHERE o_totalprice > (SELECT AVG(o_totalprice) AS a FROM orders) * 1.8
""",
    # IN (subquery) → distributed distinct + broadcast semi filter
    "sql_execute_in_subquery": """
SELECT c_name, c_acctbal FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
""",
    # moving frame: prefix-sum rolling kernel, exact integer cents
    "sql_execute_moving_frame": """
SELECT event_id, user_id,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS mv3_cents
FROM events
""",
    # UNION DISTINCT (hash aggregate over all columns) + trailing ORDER BY
    "sql_execute_union_distinct": """
SELECT o_orderstatus AS s FROM orders UNION
SELECT l_returnflag AS s FROM lineitem ORDER BY s
""",
    # exact quantile aggregates → stages/agg.group_quantile[_disc]
    "sql_execute_quantiles": """
SELECT l_returnflag, MEDIAN(l_quantity) AS med_qty,
       QUANTILE_CONT(l_extendedprice, 0.75) AS p75_price,
       QUANTILE_DISC(l_quantity, 0.9) AS p90_qty_disc,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem GROUP BY l_returnflag
""",
    # NTILE / PERCENT_RANK / CUME_DIST → stages/window.with_ntile_pct
    "sql_execute_ntile_pct": """
SELECT event_id,
       NTILE(4) OVER (PARTITION BY user_id ORDER BY value) AS quartile,
       PERCENT_RANK() OVER (PARTITION BY user_id ORDER BY value) AS pr,
       CUME_DIST() OVER (PARTITION BY user_id ORDER BY value) AS cd
FROM events
""",
    # correlated EXISTS (Q4 shape) decorrelated to a broadcast semi
    # filter; inner-only predicate filters the subquery first
    "sql_execute_exists_q4": """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 AS x FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY o_orderpriority
""",
    # NOT EXISTS → broadcast anti filter
    "sql_execute_not_exists": """
SELECT c_name, c_acctbal FROM customer
WHERE NOT EXISTS (SELECT 1 AS x FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
""",
    # SELECT DISTINCT → one hash aggregate over the projection
    "sql_execute_select_distinct": """
SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
""",
    # the full TPC-H Q3 shape COMPILED — same SQL string as the
    # hand-built shipping_priority_q3 plan (three-relation join chain +
    # pushed per-side filters + exact integer-revenue aggregate): the
    # compiler's plan, the hand-built plan, and DuckDB all agree
    "sql_execute_q3": _Q3_SQL,
    # six-relation comma-join star (implicit joins: equi keys pulled
    # from the WHERE pool at plan time), dims broadcast
    "sql_execute_q5": _Q5_SQL,
    # scan-only filter + global aggregate
    "sql_execute_q6": _Q6_SQL,
    # derived-table pre-aggregate + two dim joins + exact ORDER/LIMIT
    "sql_execute_q10": _Q10_SQL,
    # rank over grouped results: windows evaluate on the BOUNDED
    # post-aggregate table (one row per group), after HAVING
    "sql_execute_rank_over_agg": """
SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id
            ORDER BY COUNT(*) DESC, event_type) AS BIGINT) AS rn,
       CAST(DENSE_RANK() OVER (PARTITION BY user_id
            ORDER BY COUNT(*) DESC) AS BIGINT) AS dr
FROM events GROUP BY user_id, event_type
""",
    # partition-total window (percent-of-total): bounded grouped
    # aggregate broadcast back onto the stream — no second shuffle.
    # Integer-cents total so the share division is bit-identical (float
    # SUM order differs between engines).
    "sql_execute_partition_total": """
SELECT o_orderkey, o_custkey,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) /
       SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
           OVER (PARTITION BY o_custkey) AS share,
       CAST(COUNT(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_orders
FROM orders
""",
    # QUALIFY top-k (Snowflake idiom; ref tests/test_snowflake_sources
    # exercises QUALIFY): ROW_NUMBER <= k compiles to topk_per_group —
    # the filter runs INSIDE the bucket stage, k rows per key downstream
    "sql_execute_qualify_topk": """
SELECT o_custkey, o_orderkey, o_totalprice
FROM orders
QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey) <= 3
""",
    # QUALIFY general path: RANK keeps ALL tied rows, so it computes the
    # window column and filters the stream (not positional top-k)
    "sql_execute_qualify_rank": """
SELECT o_custkey, o_orderkey
FROM orders
QUALIFY RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) = 1
""",
    # time-RANGE moving frame (ref tests/test_teradata_sources moving
    # windows): searchsorted rolling kernel, peers share frames;
    # integer-cents so the prefix sums are exact in both engines
    "sql_execute_range_frame": """
SELECT event_id, user_id,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
            PARTITION BY user_id ORDER BY ts
            RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
            AS BIGINT) AS r1h_cents,
       CAST(COUNT(value) OVER (
            PARTITION BY user_id ORDER BY ts
            RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
            AS BIGINT) AS r1h_n
FROM events
""",
    # LAST_VALUE under SQL's DEFAULT frame (RANGE UNBOUNDED PRECEDING →
    # CURRENT ROW): peers-aware — with a unique ORDER BY the last peer
    # is the row itself, which both engines must agree on exactly (the
    # tie-heavy peer case is pinned engine-side in tests/test_sqlexec)
    "sql_execute_last_value_default": """
SELECT event_id,
       LAST_VALUE(value) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS lv
FROM events
""",
    # cross-side non-equi ON on LEFT JOIN: the residual decides
    # MATCHING (failing matches drop, the left row null-extends iff no
    # match passes) — the broadcast DimIndex collapse, not a post-join
    # filter (which would wrongly drop preserved rows)
    "sql_execute_left_join_nonequi": """
SELECT c.c_custkey, c.c_acctbal, o.o_orderkey, o.o_totalprice
FROM customer c LEFT JOIN orders o
ON c.c_custkey = o.o_custkey AND o.o_totalprice > c.c_acctbal * 20
""",
    # mixed UNION ALL / DISTINCT chain: left-associative per SQL (the
    # DISTINCT step dedupes the accumulated prefix; the trailing ALL
    # appends with duplicates)
    "sql_execute_union_mixed": """
SELECT o_orderstatus AS s FROM orders UNION
SELECT o_orderstatus AS s FROM orders UNION ALL
SELECT o_orderstatus AS s FROM orders WHERE o_orderkey < 50
""",
    # INTERSECT/EXCEPT [ALL]: tagged-count hash aggregate + multiset
    # row expansion; INTERSECT binds tighter than UNION/EXCEPT
    "sql_execute_intersect_except": """
SELECT o_orderstatus AS s FROM orders WHERE o_orderkey < 200
EXCEPT ALL SELECT o_orderstatus AS s FROM orders
WHERE o_orderkey >= 200 AND o_orderkey < 260
""",
    # aggregate FILTER (WHERE ...) — parse-time desugar to CASE args
    # (exact for the null-skipping aggregates incl. COUNT DISTINCT)
    "sql_execute_agg_filter": """
SELECT o_orderstatus,
       CAST(COUNT(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT)
           AS n_big,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
            FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT)
           AS urgent_cents,
       CAST(COUNT(DISTINCT o_custkey)
            FILTER (WHERE o_totalprice > 100000) AS BIGINT) AS nd
FROM orders GROUP BY o_orderstatus
""",
    # multiple DISTINCT aggregates per query (COUNT/SUM/AVG(DISTINCT)) —
    # aggs sharing an argument share ONE distinct-reduce pass
    # (stages/agg.distinct_count_sum); integer casts keep both sides exact
    "sql_execute_multi_distinct": """
SELECT l_returnflag,
       COUNT(DISTINCT l_suppkey) AS n_supp,
       COUNT(DISTINCT l_partkey) AS n_part,
       CAST(SUM(DISTINCT CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT)
           AS sum_qty_d,
       AVG(DISTINCT CAST(ROUND(l_quantity) AS BIGINT)) AS avg_qty_d,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem GROUP BY l_returnflag
""",
    # QUALIFY over GROUP BY results: rank windows evaluate on the bounded
    # post-aggregate table after HAVING, then the predicate filters
    "sql_execute_qualify_over_agg": """
SELECT o_custkey,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY o_custkey
QUALIFY ROW_NUMBER() OVER (ORDER BY
    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
    DESC, o_custkey) <= 25
""",
    # GROUP BY ROLLUP compiled from SQL text: one finest-grain Ray
    # aggregate, bounded per-set re-aggregation, GROUPING() indicators
    "sql_execute_rollup_grouping": """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(COUNT(*) AS BIGINT) AS n,
       GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    # GROUPING SETS with a grand-total set and AVG re-aggregation
    "sql_execute_grouping_sets": """
SELECT o_orderstatus, o_orderpriority,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents,
       AVG(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS avg_cents
FROM orders GROUP BY GROUPING SETS
    ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
""",
    # TPC-H Q14 shape: promo revenue share — join + conditional SUM,
    # integer-cents on both sides for hash-exactness
    "sql_execute_q14": """
SELECT CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                     THEN CAST(ROUND(l_extendedprice * (1 - l_discount)
                                     * 100) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS promo_cents,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS total_cents
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= DATE '1995-09-01'
  AND l.l_shipdate < DATE '1995-10-01'
""",
    # TPC-H Q16 shape: COUNT(DISTINCT) per group with a NOT IN
    # LIKE-filtered subquery (synthetic supplier has s_name, not
    # s_comment)
    "sql_execute_q16": """
SELECT p_brand, CAST(p_size AS BIGINT) AS p_size_b,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#45' AND p.p_size IN (1, 4, 7)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                          WHERE s_name LIKE '%001%')
GROUP BY p_brand, CAST(p_size AS BIGINT)
""",
    # TPC-H Q18 shape: large-volume customers via an IN over a
    # HAVING-filtered grouped subquery
    "sql_execute_q18": """
SELECT c.c_custkey, o.o_orderkey,
       CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                       GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
""",
    # TPC-H Q22 shape: substring-derived group key + uncorrelated scalar
    # AVG subquery (auto-aliased) + decorrelated NOT EXISTS, all inside
    # a derived table (synthetic customer has c_name, not c_phone)
    "sql_execute_q22": """
SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS totacctbal
FROM (SELECT SUBSTRING(c_name, 17, 2) AS cntrycode, c_acctbal
      FROM customer c
      WHERE SUBSTRING(c_name, 17, 2) IN ('13','31','23','29','30','18','17')
        AND c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                         WHERE c_acctbal > 0.00)
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)) t
GROUP BY cntrycode
""",
    # anti-join idiom with SAME-NAMED keys across derived tables: the
    # right key must null-extend (not alias the left key) for unmatched
    # preserved rows, so `p.user_id IS NULL` selects exactly the
    # never-purchased users (round-5 ADVICE regression, both physical
    # join paths keep a pre-join right-key copy)
    "sql_execute_antijoin_samekey": """
SELECT c.user_id, CAST(c.n AS BIGINT) AS n_clicks
FROM (SELECT user_id, COUNT(*) AS n FROM events
      WHERE event_type = 'click' GROUP BY user_id) c
LEFT JOIN (SELECT DISTINCT user_id FROM events
           WHERE event_type = 'purchase' AND value > 200) p
ON c.user_id = p.user_id
WHERE p.user_id IS NULL
""",
    # same-named right key PROJECTED through a LEFT JOIN: NULL for
    # unmatched rows, the key value for matched ones
    "sql_execute_left_join_right_key": """
SELECT c.user_id AS cu, p.user_id AS pu
FROM (SELECT DISTINCT user_id FROM events
      WHERE event_type = 'click') c
LEFT JOIN (SELECT DISTINCT user_id FROM events
           WHERE event_type = 'purchase') p
ON c.user_id = p.user_id
""",
    # correlated scalar aggregate subquery (TPC-H Q17 shape): decorrelated
    # into a per-partkey AVG pre-aggregate LEFT-joined back; the inner
    # aggregate table is bounded (one row per distinct correlation key)
    "sql_execute_correlated_scalar": """
SELECT l_orderkey, l_partkey, l_quantity
FROM lineitem l
WHERE l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
                      WHERE l2.l_partkey = l.l_partkey)
""",
    # TPC-H Q2 shape: correlated scalar MIN subquery compared with
    # EQUALITY — pick the min-price row(s) per part (the synthetic
    # schema has no partsupp; lineitem is the part↔supplier relation)
    "sql_execute_q2": """
SELECT l.l_partkey, l.l_suppkey, l.l_extendedprice
FROM lineitem l
WHERE l.l_extendedprice = (SELECT MIN(l2.l_extendedprice) FROM lineitem l2
                           WHERE l2.l_partkey = l.l_partkey)
  AND l.l_quantity > 40
""",
    # TPC-H Q11 shape: grouped SUM with a HAVING threshold that is an
    # uncorrelated scalar subquery (fraction of the global total) —
    # integer-cents on both sides for hash-exactness
    "sql_execute_q11": """
SELECT l_partkey,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS value_cents
FROM lineitem
GROUP BY l_partkey
HAVING SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
       > (SELECT 0.001 * SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
          FROM lineitem)
""",
    # TPC-H Q12 shape: join + per-group conditional counts (the
    # synthetic lineitem has no l_shipmode/commitdate; l_linestatus
    # stands in as the group key, shipdate-year as the date window)
    "sql_execute_q12": """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                      OR o_orderpriority = '2-HIGH'
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT'
                      AND o_orderpriority <> '2-HIGH'
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= DATE '1995-01-01'
  AND l.l_shipdate < DATE '1996-01-01'
GROUP BY l_linestatus
""",
    # TPC-H Q9 shape: five-relation join star (two hops deep: nation
    # joins on a supplier column) + LIKE filter + EXTRACT(YEAR) group
    # key; profit uses p_retailprice for the missing ps_supplycost
    "sql_execute_q9": """
SELECT n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)
             - p_retailprice * l_quantity) * 100) AS BIGINT)) AS BIGINT)
           AS profit_cents
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%gear%'
GROUP BY n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)
""",
    # TPC-H Q20 shape: nested IN — the outer key set is itself a
    # grouped HAVING subquery whose WHERE carries another IN subquery
    "sql_execute_q20": """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN
    (SELECT l_suppkey FROM lineitem
     WHERE l_partkey IN (SELECT p_partkey FROM part
                         WHERE p_name LIKE 'small%')
     GROUP BY l_suppkey HAVING SUM(l_quantity) > 100)
""",
    # TPC-H Q21 shape: EXISTS / NOT EXISTS with a `<>` correlation on
    # top of the equality key (another supplier on the same order) —
    # decorrelated to a per-key (min, max) broadcast (ExistsNeq)
    "sql_execute_q21": """
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier s JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_quantity > 45)
GROUP BY s_name
""",
    # compiled parity for two more hand-built TPC-H plans: the SAME
    # oracle SQL strings run through the compiler (Q13 left-join count
    # distribution over a derived table; Q19 disjunctive OR groups)
    "sql_execute_q13": _Q13_SQL,
    "sql_execute_q19": _Q19_SQL,
    # TPC-H Q15 shape (CTE-free): argmax over a grouped derived table,
    # the MAX threshold an uncorrelated scalar subquery over the same
    # derived aggregate
    "sql_execute_q15": """
SELECT s.s_suppkey, s.s_name, rev_e4 / 10000.0 AS total_revenue
FROM supplier s
JOIN (SELECT l_suppkey,
             SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                      AS BIGINT)) AS rev_e4
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey) rev
ON s.s_suppkey = rev.l_suppkey
WHERE rev_e4 = (SELECT MAX(rev_e4) FROM
    (SELECT l_suppkey,
            SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                     AS BIGINT)) AS rev_e4
     FROM lineitem
     WHERE l_shipdate >= TIMESTAMP '1997-01-01'
       AND l_shipdate < TIMESTAMP '1997-04-01'
     GROUP BY l_suppkey) t)
""",
}

# exercises the HASH join physical plan (broadcast disabled): both sides
# stream through Ray's hash-partitioned Dataset.join
_SQL_JOIN_HASH = """
SELECT l.l_orderkey AS ok, l.l_quantity AS qty, o.o_orderstatus AS st
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_totalprice > 250000
"""


@register("sql_execute_join_hash", _SQL_JOIN_HASH)
def sql_execute_join_hash(sf_dir: str):
    """Same compiler contract as the rest of the sql_execute_* family but
    with ``broadcast_rows=0``, forcing the hash-shuffle join path."""
    from sous_chef_ray.sqlexec import sql_execute

    return sql_execute(_SQL_JOIN_HASH, sf_dir, broadcast_rows=0)


def _register_sql_execute(name: str, sql: str) -> None:
    @register(name, sql)
    def run(sf_dir: str, _sql: str = sql):
        from sous_chef_ray.sqlexec import sql_execute

        return sql_execute(_sql, sf_dir)

    run.__name__ = name
    run.__doc__ = (
        "Compiled from the SQL string itself by sous_chef_ray.sqlexec — "
        "no hand-built pipeline; the oracle is the same string."
    )


for _name, _sql in _SQL_EXECUTE_FAMILY.items():
    _register_sql_execute(_name, _sql)


_WINDOW_PRIORITY = [
    # SQL→Ray compiler family (round-4): the SQL string IS the plan
    "sql_execute_pricing_summary", "sql_execute_having_distinct",
    "sql_execute_rank_rownumber", "sql_execute_first_last_runsum",
    "sql_execute_join_three_way", "sql_execute_join_derived",
    "sql_execute_join_hash", "sql_execute_in_subquery",
    "sql_execute_moving_frame", "sql_execute_exists_q4",
    "sql_execute_q3", "sql_execute_q5",
    # round-5 compiler additions: QUALIFY, time-RANGE frames, non-equi
    # LEFT JOIN, mixed UNION chains
    "sql_execute_qualify_topk", "sql_execute_qualify_rank",
    "sql_execute_range_frame", "sql_execute_last_value_default",
    "sql_execute_left_join_nonequi", "sql_execute_union_mixed",
    "sql_execute_agg_filter", "sql_execute_intersect_except",
    "sql_execute_topk_offset",
    # round-5 TPC-H closure: all 22 query shapes now compile or verify;
    # the ones exercising NEW decorrelations lead (Q21 ExistsNeq, Q20
    # nested IN, Q2 correlated MIN, Q11 HAVING scalar threshold)
    "sql_execute_q21", "sql_execute_q20", "sql_execute_q2",
    "sql_execute_q11", "sql_execute_q9", "sql_execute_q12",
    "dsir_importance_weights",
    # LLM-data §2.F, exact oracles
    "flagship_window_features", "doc_token_counts", "doc_bpe_token_counts",
    "doc_normalize_text", "doc_redact_pii", "doc_sentences",
    "doc_repetition_scores", "doc_quality_scores", "doc_fingerprints",
    "exact_dedup_docs", "knn_cosine_top5", "embedding_nearest_neighbor",
    "embedding_neardup_pairs", "embedding_neardup_pairs_lsh",
    "prepare_corpus", "decontaminate_docs", "doc_remove_boilerplate",
    # north-rule operators
    "asof_last_purchase", "asof_last_purchase_partitioned",
    "latest_event_per_user", "sessionize_events", "backfill_daily_purchase",
    "rolling_event_value", "rolling_time_event_value", "running_event_value",
    "tumbling_6h_by_type", "hopping_6h_2h_by_type",
    "streaming_tumbling_by_user", "streaming_sessions_by_user",
    # window functions
    "event_lag_lead", "event_first_last", "order_rank_per_customer",
    "event_ntile_pct", "top_orders_per_customer",
    # joins
    "orders_customer_nation", "customer_left_join_orders",
    "click_purchase_full_outer", "customers_with_big_orders",
    "customers_without_big_orders", "clicks_in_purchase_window",
    "shipping_priority_q3",
    # aggregates / SQL surface (one representative per family)
    "pricing_summary", "big_spenders_by_nation", "weekly_event_rollup",
    "frequent_customers", "event_type_pivot",
    "value_moments_per_type", "median_quantity_per_flag",
    "distinct_event_types_per_user", "lineitem_profile",
]


def _apply_registration_order() -> None:
    global QUERIES, ORACLE_SQL
    missing = [n for n in _WINDOW_PRIORITY if n not in QUERIES]
    assert not missing, f"priority list names unknown queries: {missing}"
    rest = [n for n in QUERIES if n not in _WINDOW_PRIORITY]
    # remaining exact-oracle queries register before rows-only sketches so
    # any widening of the driver's checked window hits oracles first
    ordered = (
        _WINDOW_PRIORITY
        + [n for n in rest if n in ORACLE_SQL]
        + [n for n in rest if n not in ORACLE_SQL]
    )
    QUERIES = {n: QUERIES[n] for n in ordered}
    ORACLE_SQL = {n: ORACLE_SQL[n] for n in ordered if n in ORACLE_SQL}


_apply_registration_order()
