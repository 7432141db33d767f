"""Interval join (stages/rangejoin.py): boundary semantics, multi-granule
intervals, many-to-many overlap, granule independence."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from sous_chef_ray.stages.rangejoin import interval_join


def _run(points, intervals, granule):
    return (
        interval_join(
            rd.from_arrow(points), rd.from_arrow(intervals),
            key="k", point_ts="pts", start_ts="s", end_ts="e",
            granule=granule, point_cols=["pid"], interval_cols=["iid"],
            num_partitions=4,
        )
        .to_pandas()[["k", "pid", "iid"]]
        .sort_values(["k", "pid", "iid"]).reset_index(drop=True)
    )


def _ts(*hours):
    base = pd.Timestamp("2024-01-01")
    return pa.array([base + pd.Timedelta(hours=h) for h in hours],
                    type=pa.timestamp("us"))


def test_boundaries_and_many_to_many():
    points = pa.table({
        "k": pa.array([1, 1, 1, 1, 2]),
        "pid": pa.array([10, 11, 12, 13, 14]),
        "pts": _ts(0, 5, 10, 20, 5),
    })
    # interval A [0,10) and B [5,15): point@5 hits both; point@10 only B;
    # point@20 neither; key 2 has no intervals
    intervals = pa.table({
        "k": pa.array([1, 1]),
        "iid": pa.array([100, 101]),
        "s": _ts(0, 5),
        "e": _ts(10, 15),
    })
    expected = [(1, 10, 100), (1, 11, 100), (1, 11, 101), (1, 12, 101)]
    for granule in (pd.Timedelta(hours=1), pd.Timedelta(hours=7),
                    pd.Timedelta(days=2)):
        out = _run(points, intervals, granule)
        got = list(zip(out["k"], out["pid"], out["iid"]))
        assert got == expected, (granule, got)


def test_matches_duckdb_on_random_data():
    import duckdb

    rng = np.random.default_rng(5)
    n_p, n_i = 800, 120
    points = pa.table({
        "k": pa.array(rng.integers(0, 10, n_p)),
        "pid": pa.array(np.arange(n_p, dtype=np.int64)),
        "pts": pa.array(pd.Timestamp("2024-01-01")
                        + pd.to_timedelta(rng.integers(0, 10**6, n_p), unit="s"),
                        type=pa.timestamp("us")),
    })
    starts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 10**6, n_i), unit="s")
    durs = pd.to_timedelta(rng.integers(1, 10**5, n_i), unit="s")
    intervals = pa.table({
        "k": pa.array(rng.integers(0, 10, n_i)),
        "iid": pa.array(np.arange(n_i, dtype=np.int64)),
        "s": pa.array(starts, type=pa.timestamp("us")),
        "e": pa.array(starts + durs, type=pa.timestamp("us")),
    })
    out = _run(points, intervals, pd.Timedelta(hours=6))
    con = duckdb.connect()
    con.register("p", points)
    con.register("i", intervals)
    exp = con.execute(
        "SELECT p.k, p.pid, i.iid FROM p JOIN i ON p.k = i.k "
        "AND p.pts >= i.s AND p.pts < i.e ORDER BY p.k, p.pid, i.iid"
    ).df()
    assert list(zip(out["k"], out["pid"], out["iid"])) == list(
        zip(exp["k"], exp["pid"], exp["iid"])
    )
