"""Window / sessionization goldens on hand-written sequences (SURVEY §5,
FIXTURES.md F6: lag/lead golden on a 10-row per-key series; sessionization
golden on a sequence with known gaps)."""

import numpy as np
import pandas as pd
import ray.data as rd

from sous_chef_ray.stages.session import sessionize
from sous_chef_ray.stages.window import (
    topk_per_group,
    with_first_last,
    with_lag_lead,
    with_rolling_sum_count,
    with_row_number,
)


def _df():
    return pd.DataFrame(
        {
            "k": ["a"] * 5 + ["b"] * 5,
            "ts": list(range(5)) * 2,
            "v": [10, 20, 30, 40, 50, 1, 2, 3, 4, 5],
        }
    )


def test_lag_lead_golden():
    out = (
        with_lag_lead(rd.from_pandas(_df()).repartition(3), "k", "ts", "v",
                      lag_name="prev", lead_name="nxt", num_buckets=4)
        .to_pandas()
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    assert out.loc[0, "prev"] != out.loc[0, "prev"]  # NaN
    assert list(out["prev"].fillna(-1)) == [-1, 10, 20, 30, 40, -1, 1, 2, 3, 4]
    assert list(out["nxt"].fillna(-1)) == [20, 30, 40, 50, -1, 2, 3, 4, 5, -1]


def test_row_number_and_topk():
    rn = (
        with_row_number(rd.from_pandas(_df()), "k", "v", descending=True, name="rn")
        .to_pandas().sort_values(["k", "v"], ascending=[True, False]).reset_index(drop=True)
    )
    assert list(rn[rn["k"] == "a"]["rn"]) == [1, 2, 3, 4, 5]
    tk = topk_per_group(rd.from_pandas(_df()), "k", "v", k=2).to_pandas()
    assert sorted(tk[tk["k"] == "a"]["v"]) == [40, 50]
    assert sorted(tk[tk["k"] == "b"]["v"]) == [4, 5]


def test_first_last():
    out = with_first_last(rd.from_pandas(_df()), "k", "ts", "v").to_pandas()
    a = out[out["k"] == "a"]
    assert (a["v_first"] == 10).all() and (a["v_last"] == 50).all()


def test_rolling_exact():
    out = (
        with_rolling_sum_count(rd.from_pandas(_df()), "k", "ts", "v", window=3,
                               sum_name="s", cnt_name="c")
        .to_pandas().sort_values(["k", "ts"]).reset_index(drop=True)
    )
    a = out[out["k"] == "a"]
    assert list(a["s"]) == [10, 30, 60, 90, 120]
    assert list(a["c"]) == [1, 2, 3, 3, 3]


def test_sessionize_golden():
    # gaps: >10 starts new session
    df = pd.DataFrame(
        {
            "k": ["x"] * 6 + ["y"] * 3,
            "ts": pd.to_datetime(
                [0, 5, 30, 32, 60, 61, 0, 100, 101], unit="s"
            ),
        }
    )
    out = (
        sessionize(rd.from_pandas(df), "k", "ts", gap=pd.Timedelta(seconds=10),
                   num_buckets=4)
        .to_pandas().sort_values(["k", "ts"]).reset_index(drop=True)
    )
    assert list(out[out["k"] == "x"]["session_id"]) == [1, 1, 2, 2, 3, 3]
    assert list(out[out["k"] == "y"]["session_id"]) == [1, 2, 2]


def test_session_exact_boundary():
    # gap exactly equal to threshold does NOT start a new session (> not >=)
    df = pd.DataFrame({"k": ["z"] * 3, "ts": pd.to_datetime([0, 10, 21], unit="s")})
    out = (
        sessionize(rd.from_pandas(df), "k", "ts", gap=pd.Timedelta(seconds=10),
                   num_buckets=2)
        .to_pandas().sort_values("ts").reset_index(drop=True)
    )
    assert list(out["session_id"]) == [1, 1, 2]


def test_rolling_and_running_sum_skip_nulls():
    """A null value must not poison later rolling/running sums (SQL SUM
    skips nulls; COUNT(col) counts non-null only; all-null frame → NULL)."""
    import pyarrow as pa
    import ray.data as rd

    from sous_chef_ray.stages.window import with_rolling_sum_count, with_running_sum

    df = pd.DataFrame({
        "k": ["a"] * 5 + ["b"] * 2,
        "ts": list(range(5)) + [0, 1],
        "v": [1.0, None, 3.0, None, 5.0, None, None],
    })
    out = (
        with_rolling_sum_count(rd.from_pandas(df), "k", "ts", "v", window=2,
                               num_buckets=2)
        .to_pandas().sort_values(["k", "ts"]).reset_index(drop=True)
    )
    assert list(out[out["k"] == "a"]["rolling_sum"]) == [1.0, 1.0, 3.0, 3.0, 5.0]
    assert list(out[out["k"] == "a"]["rolling_cnt"]) == [1, 1, 1, 1, 1]
    b = out[out["k"] == "b"]
    assert b["rolling_sum"].isna().all()  # all-null frames -> NULL like SQL
    assert list(b["rolling_cnt"]) == [0, 0]

    run = (
        with_running_sum(rd.from_pandas(df), "k", "ts", "v", num_buckets=2)
        .to_pandas().sort_values(["k", "ts"]).reset_index(drop=True)
    )
    assert list(run[run["k"] == "a"]["running_sum"]) == [1.0, 1.0, 4.0, 4.0, 9.0]
    assert run[run["k"] == "b"]["running_sum"].isna().all()


def test_nth_value_null_when_partition_too_small():
    """NTH_VALUE(col, 3): keys with <3 rows get NULL; others get the
    3rd value in (ts) order on every row of the key."""
    import pandas as pd

    from sous_chef_ray.stages.window import with_nth_value

    df = pd.DataFrame({
        "k": ["a", "a", "a", "a", "b", "b"],
        "ts": [3, 1, 2, 4, 1, 2],
        "v": [30, 10, 20, 40, 100, 200],
    })
    out = (
        with_nth_value(rd.from_pandas(df).repartition(3), "k", "ts", "v", 3,
                       num_buckets=2)
        .to_pandas().sort_values(["k", "ts"]).reset_index(drop=True)
    )
    assert out[out["k"] == "a"]["v_nth3"].tolist() == [30, 30, 30, 30]
    assert out[out["k"] == "b"]["v_nth3"].isna().all()


def test_struct_agg_list_of_structs():
    """SURVEY §2.C6 struct emission: list<struct> per key, ordered."""
    import ray.data as rd

    from sous_chef_ray.stages.agg import struct_agg

    df = pd.DataFrame({
        "k": ["a", "b", "a", "a", "b"],
        "x": [3, 1, 1, 2, 2],
        "y": [30.0, 10.0, 10.0, 20.0, 20.0],
    })
    out = struct_agg(rd.from_pandas(df).repartition(3), "k",
                     {"xx": "x", "yy": "y"}, order_by="x", name="objs",
                     num_buckets=4)
    t = out.to_pandas().sort_values("k").reset_index(drop=True)
    assert list(t["k"]) == ["a", "b"]
    assert t["objs"][0].tolist() == [
        {"xx": 1, "yy": 10.0}, {"xx": 2, "yy": 20.0}, {"xx": 3, "yy": 30.0}]
    assert t["objs"][1].tolist() == [{"xx": 1, "yy": 10.0}, {"xx": 2, "yy": 20.0}]


def test_null_partition_keys_group_together():
    """SQL PARTITION BY groups NULL keys as ONE partition; a numpy
    NaN != NaN boundary check silently splits them one-group-per-row
    (round-5 ADVICE fix, stages/_util.adjacent_neq)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from sous_chef_ray.stages.agg import struct_agg
    from sous_chef_ray.stages.window import (
        with_rank, with_row_number, with_running_sum)

    t = pa.table({
        "k": pa.array([1, 1, None, None, None, 2], type=pa.int64()),
        "v": pa.array([10, 20, 30, 40, 50, 60], type=pa.int64()),
    })
    ds = rd.from_arrow(t).repartition(3)

    rn = with_row_number(ds, "k", "v", name="rn", num_buckets=4).to_pandas()
    nulls = rn[rn["k"].isna()].sort_values("v")
    assert list(nulls["rn"]) == [1, 2, 3]

    rk = with_rank(ds, "k", "v", name="r", num_buckets=4).to_pandas()
    nulls = rk[rk["k"].isna()].sort_values("v")
    assert list(nulls["r"]) == [1, 2, 3]

    rs = with_running_sum(ds, "k", "v", "v", name="s",
                          num_buckets=4).to_pandas()
    nulls = rs[rs["k"].isna()].sort_values("v")
    assert list(nulls["s"]) == [30, 70, 120]

    sa = struct_agg(ds, "k", {"vv": "v"}, order_by="v", name="objs",
                    num_buckets=4).to_pandas()
    nulls = sa[sa["k"].isna()]
    assert len(nulls) == 1
    assert [d["vv"] for d in nulls["objs"].iloc[0]] == [30, 40, 50]
