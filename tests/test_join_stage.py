"""Arrow-native broadcast join (sous_chef_ray/stages/join.py DimIndex).

The round-4 pandas `_BroadcastMerge` round-tripped every fact batch
through pandas (object arrays for list columns, silent NUL-key merges).
These tests pin the Arrow-native replacement: zero pandas conversion,
exact NUL-containing-key semantics, one-to-many expansion, left-join
null extension, and cross join."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from sous_chef_ray.stages.join import DimIndex, broadcast_join


def _fact_table():
    return pa.table({
        "k": pa.array([1, 2, 3, None, 2], pa.int64()),
        "payload": pa.array([[1, 2], [3], [], [4, 5, 6], [7]],
                            pa.list_(pa.int64())),
        "v": pa.array([10.0, 20.0, 30.0, 40.0, 50.0]),
    })


def _dim_table():
    return pa.table({
        "k": pa.array([1, 2, 2, 9], pa.int64()),
        "name": pa.array(["a", "b1", "b2", "z"]),
    })


def test_dimindex_inner_one_to_many():
    idx = DimIndex(_dim_table(), ["k"], "inner", drop_keys=frozenset(["k"]))
    out = idx.merge(_fact_table(), ["k"])
    df = out.to_pandas().sort_values(["k", "name"]).reset_index(drop=True)
    # k=1 matches once; each k=2 fact row matches both dim rows; 3/None drop
    assert list(df["k"]) == [1, 2, 2, 2, 2]
    assert sorted(df["name"]) == ["a", "b1", "b1", "b2", "b2"]
    # list column survives the join with values intact
    assert list(df.loc[df["k"] == 1, "payload"].iloc[0]) == [1, 2]


def test_dimindex_left_null_extends():
    idx = DimIndex(_dim_table(), ["k"], "left", drop_keys=frozenset(["k"]))
    out = idx.merge(_fact_table(), ["k"])
    df = out.to_pandas()
    # unmatched rows (k=3, k=None) survive with NULL dim payload
    unmatched = df[df["name"].isna()]
    assert sorted(unmatched["v"]) == [30.0, 40.0]
    assert len(df) == 2 + 1 + 2 + 2  # two k=2 rows expand ×2


def test_dimindex_unique_key_fast_path():
    dim = pa.table({"k": pa.array([3, 1, 2], pa.int64()),
                    "tag": pa.array(["c", "a", "b"])})
    idx = DimIndex(dim, ["k"], "left", drop_keys=frozenset(["k"]))
    assert idx.unique_keys
    out = idx.merge(_fact_table(), ["k"]).to_pandas()
    assert list(out["tag"]) == ["a", "b", "c", None, "b"]
    assert list(out["v"]) == [10.0, 20.0, 30.0, 40.0, 50.0]


def test_dimindex_nul_embedded_string_keys():
    """Keys differing only by an embedded NUL byte must NOT merge (the
    documented pandas-path hazard this stage replaces)."""
    dim = pa.table({"k": pa.array(["a\x00b", "ab"]),
                    "tag": pa.array(["nul", "plain"])})
    fact = pa.table({"k": pa.array(["a\x00b", "ab", "a"]),
                     "v": pa.array([1, 2, 3], pa.int64())})
    idx = DimIndex(dim, ["k"], "left", drop_keys=frozenset(["k"]))
    out = idx.merge(fact, ["k"]).to_pandas()
    assert list(out["tag"]) == ["nul", "plain", None]


def test_dimindex_null_dim_keys_never_match():
    dim = pa.table({"k": pa.array([None, 1], pa.int64()),
                    "tag": pa.array(["bad", "ok"])})
    fact = pa.table({"k": pa.array([None, 1], pa.int64()),
                     "v": pa.array([0, 1], pa.int64())})
    idx = DimIndex(dim, ["k"], "left", drop_keys=frozenset(["k"]))
    out = idx.merge(fact, ["k"]).to_pandas()
    assert list(out["tag"]) == [None, "ok"]  # NULL = NULL never joins


def test_dimindex_multikey_and_name_collision():
    dim = pa.table({"a": pa.array([1, 1, 2], pa.int64()),
                    "b": pa.array(["x", "y", "x"]),
                    "v": pa.array([100, 200, 300], pa.int64())})
    fact = pa.table({"a": pa.array([1, 2, 2], pa.int64()),
                     "b": pa.array(["y", "x", "z"]),
                     "v": pa.array([1, 2, 3], pa.int64())})
    idx = DimIndex(dim, ["a", "b"], "inner", drop_keys=frozenset(["a", "b"]))
    out = idx.merge(fact, ["a", "b"]).to_pandas()
    assert list(out["v"]) == [1, 2]          # fact column keeps its name
    assert list(out["v_r"]) == [200, 300]    # dim collision suffixed


def test_dimindex_cross():
    dim = pa.table({"tag": pa.array(["p", "q"])})
    fact = pa.table({"v": pa.array([1, 2, 3], pa.int64())})
    idx = DimIndex(dim, None, "cross")
    out = idx.merge(fact, None).to_pandas()
    assert list(out["v"]) == [1, 1, 2, 2, 3, 3]
    assert list(out["tag"]) == ["p", "q"] * 3


def test_broadcast_join_dataset_list_column_no_pandas(ray_session):
    """End-to-end through Ray Data: a list<int64> column crosses the
    broadcast-join stage intact and the output batch stays Arrow with
    the list type preserved (a pandas round-trip would degrade it to
    object arrays)."""
    fact = rd.from_arrow(_fact_table())
    out = broadcast_join(fact, _dim_table(), on="k", how="left")
    tbl = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    assert pa.types.is_list(tbl.schema.field("payload").type)
    df = tbl.to_pandas()
    assert len(df) == 7
    got = df[df["k"] == 1]
    assert list(got["payload"].iloc[0]) == [1, 2]


def test_broadcast_join_matches_pandas_merge_oracle(ray_session):
    """Randomized parity: Arrow DimIndex output == pandas merge on
    NUL-free int keys (the regime where pandas is a valid oracle)."""
    rng = np.random.default_rng(7)
    fact = pd.DataFrame({"k": rng.integers(0, 20, 500),
                         "v": rng.normal(size=500)})
    dim = pd.DataFrame({"k": np.arange(0, 15),
                        "w": rng.normal(size=15)})
    for how in ("inner", "left"):
        out = broadcast_join(rd.from_pandas(fact), dim, on="k", how=how)
        got = out.to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
        exp = fact.merge(dim, on="k", how=how) \
            .sort_values(["k", "v"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["k", "v", "w"]], exp[["k", "v", "w"]], check_dtype=False)


def test_dimindex_property_matches_pandas_merge():
    """Property test: random one-to-many int keys with nulls — DimIndex
    inner/left output row-sets equal pandas merge (null keys never
    match, per SQL; pandas merge also drops NaN matches)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        fk=st.lists(st.one_of(st.integers(0, 6), st.none()),
                    min_size=0, max_size=25),
        dk=st.lists(st.integers(0, 6), min_size=0, max_size=12),
        how=st.sampled_from(["inner", "left"]),
    )
    def check(fk, dk, how):
        fact = pa.table({
            "k": pa.array(fk, pa.int64()),
            "v": pa.array(range(len(fk)), pa.int64()),
        })
        dim = pa.table({
            "k": pa.array(dk, pa.int64()),
            "w": pa.array(range(len(dk)), pa.int64()),
        })
        idx = DimIndex(dim, ["k"], how, drop_keys=frozenset(["k"]))
        got = idx.merge(fact, ["k"]).to_pandas()
        exp = fact.to_pandas().merge(dim.to_pandas(), on="k", how=how)
        key = lambda df: sorted(
            (-1 if pd.isna(r.k) else int(r.k), int(r.v),
             -1 if pd.isna(r.w) else int(r.w))
            for r in df.itertuples())
        assert key(got) == key(exp)

    check()


def test_hash_join_sparse_aggregate_sides():
    """ray 2.49 hash-shuffle schema race (sous_chef_ray.compat): a
    groupby emits schemaless empty blocks for sparse output partitions;
    if one of them is shuffled into the join first, the side's schema
    broadcast is consumed and sparse join partitions fail with
    ArrowInvalid.  Pin the compat fix with parquet-sourced distinct
    sides at 16 partitions (the shape that reproduced it)."""
    import tempfile

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import Count

    from sous_chef_ray.stages.join import hash_join

    d = tempfile.mkdtemp()
    pq.write_table(
        pa.table({"k": [1, 2, 3, 4], "et": ["c", "c", "p", "c"]}),
        d + "/e.parquet")

    def side(val):
        ds = rd.read_parquet(d + "/e.parquet", columns=["k", "et"])
        ds = ds.map_batches(lambda t, v=val: t.filter(pc.equal(t["et"], v)),
                            batch_format="pyarrow")
        ds = ds.map_batches(lambda t: t.select(["k"]),
                            batch_format="pyarrow")
        ds = ds.groupby(["k"]).aggregate(Count(alias_name="__dn"))
        return ds.map_batches(lambda t: t.drop_columns(["__dn"]),
                              batch_format="pyarrow")

    for _ in range(3):  # the failure was block-order dependent
        right = side("p").map_batches(
            lambda t: t.append_column("kk", t["k"]), batch_format="pyarrow")
        out = hash_join(side("c"), right, on=["k"], right_on=["k"],
                        join_type="left_outer", num_partitions=16)
        df = out.to_pandas().sort_values("k")
        assert list(df["k"]) == [1, 2, 4]
        assert df["kk"].isna().all()
