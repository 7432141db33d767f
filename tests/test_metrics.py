"""Per-stage metrics capture (state/metrics.py): ds.stats() parsed into
machine-readable per-operator records appended as JSONL."""

import json

import pandas as pd
import ray.data as rd

from sous_chef_ray.state.metrics import parse_stats, record_stats


def test_record_stats_appends_operator_records(tmp_path):
    ds = rd.from_pandas(pd.DataFrame({"a": range(1000)})).map_batches(
        lambda df: df, batch_format="pandas"
    )
    # consume via iter_batches — count() takes a metadata fastpath whose
    # stats do not attach to this dataset object
    for _ in ds.iter_batches(batch_size=500):
        pass
    path = str(tmp_path / "metrics.jsonl")
    rec = record_stats(ds, path, stage="unit", extra={"run": 1})
    assert rec["stage"] == "unit" and rec["run"] == 1
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 1
    ops = lines[0]["operators"]
    assert ops, "expected at least one parsed operator"
    assert all("wall_sec" in o and "name" in o for o in ops)
    names = " ".join(o["name"] for o in ops)
    assert "MapBatches" in names


def test_parse_stats_ignores_garbage():
    assert parse_stats("no operators here") == []
