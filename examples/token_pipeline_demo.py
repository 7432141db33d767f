"""Flagship token-table pipeline demo: the north-star workload end-to-end
at toy scale (BASELINE.json north_star).

Generates a pre-tokenized sequence table (doc_id, tokens:list<int32>,
n_tok, source, event_ts, created_ts) with Zipf-hot keys and ts ties,
then runs:
  1. window features (lag/lead n_tok + gap sessionization, one shuffle)
  2. point-in-time as-of join of a spine (TTL + created-ts tie-break)
  3. resumable partitioned write with a lineage manifest

Run: python examples/token_pipeline_demo.py
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import pandas as pd
import pyarrow.parquet as pq

import ray
import ray.data as rd


def main() -> None:
    from sous_chef_ray.pipelines.materialize import materialize_features, window_features
    from sous_chef_ray.sources.synth import spine_table, token_table
    from sous_chef_ray.state.manifest import run_partitioned

    tmp = Path(tempfile.mkdtemp(prefix="token_demo_"))
    features = token_table(20_000, seed=42, n_docs=400)
    spine = spine_table(features, 2_000, seed=43)

    # shard the input (the resumable unit is the input shard)
    shards = {}
    for i in range(4):
        p = tmp / f"in_{i}.parquet"
        pq.write_table(features.slice(i * 5000, 5000), p)
        shards[f"{i:04d}"] = [str(p)]

    # 1+3. window features per shard with exactly-once manifest commits
    def process(ds: "rd.Dataset") -> "rd.Dataset":
        return window_features(
            ds, key="doc_id", ts_col="event_ts", tie_col="created_ts",
            value_col="n_tok", session_gap=pd.Timedelta(hours=1), num_buckets=8,
        )

    records = run_partitioned(
        shards, process, str(tmp / "out"), sort_by=["doc_id", "event_ts"]
    )
    print("partitions committed:", {p: r.row_count for p, r in records.items()})

    # 2. point-in-time retrieval over the full table
    ds = rd.read_parquet([str(tmp / f"in_{i}.parquet") for i in range(4)])
    out = materialize_features(ds, spine, ttl=pd.Timedelta(days=7), concurrency=2)
    hit = out["n_tok"].null_count
    print(f"spine rows: {len(out)}; null-backfill rows: {hit}")
    print(out.slice(0, 3).to_pandas())


if __name__ == "__main__":
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR")
    main()
    ray.shutdown()
