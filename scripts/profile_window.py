"""Profile the window-feature phase under different shuffle plans.

Usage: python scripts/profile_window.py <ncpu> <plan A|B|C>
Prints one line: plan, ncpu, seconds.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd

import ray
import ray.data as rd

NCPU = int(sys.argv[1])
PLAN = sys.argv[2]
TOKEN_CACHE = "/tmp/sous_chef_bench/tokens_4000000"

ray.init(address="local", num_cpus=NCPU, include_dashboard=False, logging_level="ERROR")

from sous_chef_ray.stages.partition import BUCKET_COL, add_bucket  # noqa: E402

NUM_BUCKETS = max(64, NCPU * 4)


def fn(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["doc_id", "event_ts", "created_ts"], kind="mergesort").reset_index(drop=True)
    n = len(df)
    if n == 0:
        return df
    g = df.groupby("doc_id", sort=False)["n_tok"]
    df["n_tok_lag1"] = g.shift(1)
    df["n_tok_lead1"] = g.shift(-1)
    tsv = df["event_ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
    kv = df["doc_id"].to_numpy()
    key_change = np.zeros(n, dtype=bool)
    key_change[0] = True
    key_change[1:] = kv[1:] != kv[:-1]
    diff = np.empty(n, dtype=np.int64)
    diff[0] = 0
    diff[1:] = tsv[1:] - tsv[:-1]
    is_new = key_change | (diff > pd.Timedelta(hours=6).value)
    sid = np.cumsum(is_new)
    base = np.maximum.accumulate(np.where(key_change, sid, 0))
    df["session_id"] = (sid - base + 1).astype(np.int64)
    return df


# warm page cache
rd.read_parquet(TOKEN_CACHE, columns=["doc_id"]).count()

t0 = time.time()
ds = rd.read_parquet(TOKEN_CACHE, columns=["doc_id", "n_tok", "source", "event_ts", "created_ts"])

if PLAN == "A":
    tagged = ds.map_batches(lambda df: add_bucket(df, ["doc_id"], NUM_BUCKETS), batch_format="pandas")
    out = tagged.groupby(BUCKET_COL).map_groups(
        lambda g: fn(g.drop(columns=[BUCKET_COL])), batch_format="pandas"
    )
elif PLAN == "B":
    tagged = ds.map_batches(lambda df: add_bucket(df, ["doc_id"], NUM_BUCKETS), batch_format="pandas")
    out = tagged.sort(BUCKET_COL, boundaries=list(range(1, NUM_BUCKETS))).map_batches(
        lambda df: fn(df.drop(columns=[BUCKET_COL])), batch_format="pandas", batch_size=None
    )
elif PLAN == "C":
    from ray.data.context import DataContext, ShuffleStrategy

    DataContext.get_current().shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    tagged = ds.map_batches(lambda df: add_bucket(df, ["doc_id"], NUM_BUCKETS), batch_format="pandas")
    out = tagged.repartition(NUM_BUCKETS, keys=[BUCKET_COL], sort=False).map_batches(
        lambda df: fn(df.drop(columns=[BUCKET_COL])), batch_format="pandas", batch_size=None
    )

out.write_parquet("/tmp/sous_chef_bench/profile_out")
dt = time.time() - t0
print(f"RESULT plan={PLAN} ncpu={NCPU} sec={dt:.2f}")
ray.shutdown()
