"""Streaming tumbling windows with watermark (stages/streaming.py):
batch-equivalence when nothing is too late, late-drop semantics,
incremental emission, shard-count invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa

from sous_chef_ray.stages.streaming import (
    WatermarkTumblingWindow,
    streaming_tumbling_window,
)


def _mk_batches(df, batch_rows=100):
    tbl = pa.table({
        "k": pa.array(df["k"].to_numpy(dtype=object), type=pa.string()),
        "ts": pa.array(pd.to_datetime(df["ts"]), type=pa.timestamp("us")),
        "v": pa.array(df["v"].to_numpy(np.int64)),
    })
    return [tbl.slice(i, batch_rows) for i in range(0, len(tbl), batch_rows)]


def _batch_oracle(df, window):
    start = pd.to_datetime(df["ts"]).dt.floor(window)
    g = df.assign(window_start=start).groupby(["k", "window_start"])["v"]
    out = g.agg(n_events="count", sum_value="sum").reset_index()
    return out.sort_values(["k", "window_start"]).reset_index(drop=True)


def test_matches_batch_when_in_order():
    rng = np.random.default_rng(4)
    n = 3000
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], n),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(np.sort(rng.integers(0, 86_400, n)), unit="s"),
        "v": rng.integers(0, 100, n),
    })
    got, dropped = streaming_tumbling_window(
        _mk_batches(df), key_col="k", ts_col="ts", value_col="v",
        window=pd.Timedelta(hours=1), allowed_lateness=pd.Timedelta(0),
        num_shards=3,
    )
    exp = _batch_oracle(df, "1h")
    assert dropped == 0
    pd.testing.assert_frame_equal(
        got[["k", "window_start", "n_events", "sum_value"]],
        exp[["k", "window_start", "n_events", "sum_value"]],
        check_dtype=False,
    )


def test_bounded_out_of_order_tolerated_and_late_dropped():
    sm = WatermarkTumblingWindow(window_us=60_000_000, lateness_us=30_000_000)
    base = 1_700_000_000_000_000
    k = np.array(["x"], dtype=object)
    # in-order record at t=100s
    closed = sm.process(k, np.array([base + 100_000_000]), np.array([1]))
    assert closed == []
    # 20s-late record (within 30s lateness) is accepted
    closed = sm.process(k, np.array([base + 80_000_000]), np.array([2]))
    assert sm.dropped_late == 0
    # advance far: watermark passes old windows -> they close
    closed = sm.process(k, np.array([base + 400_000_000]), np.array([5]))
    starts = {c[1] for c in closed}
    assert (base // 60_000_000 * 60_000_000 + 60_000_000) in starts
    # ancient record (far behind watermark) is dropped and counted
    sm.process(k, np.array([base]), np.array([9]))
    assert sm.dropped_late == 1
    # flush emits the still-open tail window
    tail = sm.flush()
    assert any(c[2] == 1 and c[3] == 5 for c in tail)


def test_shard_count_invariance():
    rng = np.random.default_rng(6)
    n = 2000
    df = pd.DataFrame({
        "k": rng.choice([f"u{i}" for i in range(20)], n),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(np.sort(rng.integers(0, 40_000, n)), unit="s"),
        "v": rng.integers(0, 10, n),
    })
    a, _ = streaming_tumbling_window(
        _mk_batches(df), key_col="k", ts_col="ts", value_col="v",
        window=pd.Timedelta(minutes=30), allowed_lateness=pd.Timedelta(minutes=5),
        num_shards=1,
    )
    b, _ = streaming_tumbling_window(
        _mk_batches(df), key_col="k", ts_col="ts", value_col="v",
        window=pd.Timedelta(minutes=30), allowed_lateness=pd.Timedelta(minutes=5),
        num_shards=6,
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_session_streaming_matches_batch_sessionize():
    """In-order stream + flush must reproduce batch gap-sessionization
    (session spans and per-session counts)."""
    import pyarrow as pa
    import ray.data as rd

    from sous_chef_ray.stages.session import sessionize
    from sous_chef_ray.stages.streaming import streaming_session_window

    rng = np.random.default_rng(12)
    n = 2500
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c", "d"], n),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(np.sort(rng.integers(0, 200_000, n)), unit="s"),
        "v": rng.integers(0, 10, n),
    }).drop_duplicates(["k", "ts"]).reset_index(drop=True)
    got, dropped = streaming_session_window(
        _mk_batches(df), key_col="k", ts_col="ts", value_col="v",
        gap=pd.Timedelta(minutes=30), allowed_lateness=pd.Timedelta(0),
        num_shards=3,
    )
    assert dropped == 0
    batch = sessionize(
        rd.from_pandas(df), "k", "ts", gap=pd.Timedelta(minutes=30),
        num_buckets=4,
    ).to_pandas()
    exp = (
        batch.groupby(["k", "session_id"])
        .agg(session_start=("ts", "min"), session_end=("ts", "max"),
             n_events=("ts", "count"), sum_value=("v", "sum"))
        .reset_index().sort_values(["k", "session_start"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["k", "session_start", "session_end", "n_events", "sum_value"]],
        exp[["k", "session_start", "session_end", "n_events", "sum_value"]],
        check_dtype=False,
    )


def test_session_bridging_merge():
    """A late-but-allowed record that bridges two open sessions merges
    them into one."""
    from sous_chef_ray.stages.streaming import WatermarkSessionWindow

    sm = WatermarkSessionWindow(gap_us=10_000_000, lateness_us=60_000_000)
    base = 1_700_000_000_000_000
    k = np.array(["x"], dtype=object)
    sm.process(k, np.array([base]), np.array([1]))             # session A
    sm.process(k, np.array([base + 15_000_000]), np.array([2]))  # session B (gap 15s > 10s)
    assert len(sm.open["x"]) == 2
    # bridging record at +7s: within 10s of both spans -> merge
    sm.process(k, np.array([base + 7_000_000]), np.array([4]))
    assert len(sm.open["x"]) == 1
    s = sm.open["x"][0]
    assert s[2] == 3 and s[3] == 7 and s[0] == base and s[1] == base + 15_000_000


def test_sharded_dataset_feed_shard_invariance():
    """The shard-fed (no global sort, no driver loop) path returns the
    identical result at num_shards ∈ {1, 4, 16} and equals the batch
    tumbling aggregate."""
    import ray.data as rd

    from sous_chef_ray.stages.streaming import (
        collect_closed_windows, streaming_tumbling_window_sharded)

    rng = np.random.default_rng(5)
    n = 5000
    base = 1_700_000_000_000_000
    df = pd.DataFrame({
        "k": rng.integers(0, 40, n).astype(str),
        "ts": pd.to_datetime(
            base + rng.integers(0, 3 * 86_400_000_000, n), unit="us"),
        "v": rng.integers(0, 100, n).astype(np.int64),
    })
    ds = rd.from_pandas(df).repartition(6)
    outs = []
    for shards in (1, 4, 16):
        out_ds = streaming_tumbling_window_sharded(
            ds, key_col="k", ts_col="ts", value_col="v",
            window=pd.Timedelta(hours=6),
            allowed_lateness=pd.Timedelta(minutes=1),
            num_shards=shards, chunk=512,
        )
        assert isinstance(out_ds, rd.Dataset)  # operator must NOT collect
        out, dropped = collect_closed_windows(out_ds, "k", ["window_start"])
        assert dropped == 0
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])
    exp = (
        df.assign(ws=df["ts"].dt.floor("6h"))
        .groupby(["k", "ws"])
        .agg(n_events=("v", "count"), sum_value=("v", "sum"))
        .reset_index().rename(columns={"ws": "window_start"})
        .sort_values(["k", "window_start"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        outs[0][["k", "window_start", "n_events", "sum_value"]],
        exp[["k", "window_start", "n_events", "sum_value"]],
        check_dtype=False,
    )


def test_sharded_session_feed_matches_batch():
    import ray.data as rd

    from sous_chef_ray.stages.streaming import (
        collect_closed_windows, streaming_session_window_sharded)

    rng = np.random.default_rng(9)
    n = 3000
    base = 1_700_000_000_000_000
    df = pd.DataFrame({
        "k": rng.integers(0, 25, n).astype(str),
        "ts": pd.to_datetime(
            base + rng.integers(0, 86_400_000_000, n), unit="us"),
        "v": rng.integers(0, 50, n).astype(np.int64),
    })
    ds = rd.from_pandas(df).repartition(5)
    out_ds = streaming_session_window_sharded(
        ds, key_col="k", ts_col="ts", value_col="v",
        gap=pd.Timedelta(minutes=30),
        allowed_lateness=pd.Timedelta(minutes=1),
        num_shards=4, chunk=256,
    )
    assert isinstance(out_ds, rd.Dataset)  # operator must NOT collect
    out, dropped = collect_closed_windows(out_ds, "k", ["session_start"])
    assert dropped == 0
    sdf = df.sort_values(["k", "ts"]).reset_index(drop=True)
    new = (sdf.groupby("k")["ts"].diff() > pd.Timedelta(minutes=30)) | (
        sdf.groupby("k")["ts"].diff().isna())
    sdf["session_id"] = new.groupby(sdf["k"]).cumsum()
    exp = (
        sdf.groupby(["k", "session_id"])
        .agg(session_start=("ts", "min"), session_end=("ts", "max"),
             n_events=("ts", "count"), sum_value=("v", "sum"))
        .reset_index().sort_values(["k", "session_start"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out[["k", "session_start", "session_end", "n_events", "sum_value"]],
        exp[["k", "session_start", "session_end", "n_events", "sum_value"]],
        check_dtype=False,
    )
