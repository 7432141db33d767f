"""Property-based as-of correctness: random tables vs the DuckDB ASOF
oracle (zero temporal leakage by construction of the oracle; exercises
ties, duplicate (key,ts), TTL edges, unknown keys)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from sous_chef_ray.stages.asof import asof_join_broadcast


@st.composite
def asof_case(draw):
    seed = draw(st.integers(0, 10_000))
    n_keys = draw(st.integers(1, 8))
    n_feat = draw(st.integers(1, 200))
    n_spine = draw(st.integers(1, 60))
    ttl_days = draw(st.integers(1, 20))
    return seed, n_keys, n_feat, n_spine, ttl_days


@given(asof_case())
@settings(max_examples=12, deadline=None)
def test_asof_matches_duckdb_on_random_tables(case):
    seed, n_keys, n_feat, n_spine, ttl_days = case
    rng = np.random.default_rng(seed)
    base = np.datetime64("2024-01-01", "us").astype(np.int64)
    feat = pa.table(
        {
            "k": pa.array(rng.integers(0, n_keys, n_feat)),
            "fts": pa.array(
                base + rng.integers(0, 40, n_feat) * 86_400_000_000
                + rng.integers(0, 10, n_feat),  # coarse grid → frequent ties
                type=pa.timestamp("us"),
            ),
            "created": pa.array(
                base + rng.integers(0, 1000, n_feat), type=pa.timestamp("us")
            ),
            "v": pa.array(rng.normal(size=n_feat)),
        }
    )
    spine = pa.table(
        {
            "k": pa.array(rng.integers(0, n_keys + 2, n_spine)),  # some unknown
            "ts": pa.array(
                base + rng.integers(-5, 60, n_spine) * 86_400_000_000,
                type=pa.timestamp("us"),
            ),
        }
    )
    got = asof_join_broadcast(
        rd.from_arrow(feat).repartition(3),
        spine,
        key="k",
        spine_ts="ts",
        feature_ts="fts",
        tie_col="created",
        payload_cols=["v"],
        ttl=pd.Timedelta(days=ttl_days),
        concurrency=2,
        batch_size=64,
    ).to_pandas()

    con = duckdb.connect()
    con.register("f", feat)
    con.register("s", spine)
    exp = con.execute(
        f"""
        WITH dedup AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (
              PARTITION BY k, fts ORDER BY created DESC) AS rn FROM f)
          WHERE rn = 1),
        j AS (
          SELECT s.k, s.ts, d.fts, d.v
          FROM s ASOF LEFT JOIN dedup d ON s.k = d.k AND d.fts <= s.ts)
        SELECT k, ts,
               CASE WHEN fts >= ts - INTERVAL {ttl_days} DAY THEN v END AS v
        FROM j
        """
    ).df()
    key = ["k", "ts"]
    g = got.sort_values(key + ["v"], kind="mergesort").reset_index(drop=True)
    e = exp.sort_values(key + ["v"], kind="mergesort").reset_index(drop=True)
    assert len(g) == len(e)
    assert (g["k"].to_numpy() == e["k"].to_numpy()).all()
    gv, ev = g["v"].to_numpy(), e["v"].to_numpy()
    both_nan = np.isnan(gv) & np.isnan(ev)
    assert (both_nan | (gv == ev)).all()
