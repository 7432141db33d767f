"""Checkpoint manifest + exactly-once resumable partition runs.

North-rule contract (BASELINE.json): each partition emits a lineage
record — input fragments, row count, checksum of token arrays — to a
manifest; a re-run skips completed partitions, so a 10^12-sequence
backfill killed mid-run resumes with exactly-once partition semantics.

Mechanics: output is one directory per input shard, written to a temp
path and atomically renamed; the manifest line is appended ONLY after the
rename, so a crash between write and record leaves a stale temp dir that
the next run overwrites (idempotent). The checksum is computed from the
output data itself (sorted, content-addressed), doubling as an output
validation on resume.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import zlib
from dataclasses import asdict, dataclass
from typing import Callable, Dict, List, Optional

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd


@dataclass
class PartitionRecord:
    partition_id: str
    input_fragments: List[str]
    row_count: int
    checksum: str
    output_path: str
    status: str
    wall_sec: float
    finished_at: float
    output_bytes: int = 0


class Manifest:
    """Append-only JSONL manifest of completed partitions."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def load(self) -> Dict[str, PartitionRecord]:
        done: Dict[str, PartitionRecord] = {}
        if not os.path.exists(self.path):
            return done
        with open(self.path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rec = PartitionRecord(**json.loads(line))
                if rec.status == "done":
                    done[rec.partition_id] = rec
        return done

    def append(self, rec: PartitionRecord) -> None:
        # single atomic appended line (O_APPEND write < PIPE_BUF)
        with open(self.path, "a") as f:
            f.write(json.dumps(asdict(rec)) + "\n")
            f.flush()
            os.fsync(f.fileno())


def table_checksum(tbl: pa.Table, sort_by: Optional[List[str]] = None) -> str:
    """Order-independent content checksum: crc32 over each column's
    serialized bytes after sorting by ``sort_by`` (list/token columns
    hash their flattened values + offsets — per-row token-array identity)."""
    if sort_by:
        keys = [k for k in sort_by if k in tbl.column_names]
        if keys:
            import pyarrow.compute as pc

            idx = pc.sort_indices(tbl, sort_keys=[(k, "ascending") for k in keys])
            tbl = tbl.take(idx)
    crc = 0
    for name in sorted(tbl.column_names):
        col = tbl[name].combine_chunks()
        if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            crc = zlib.crc32(col.offsets.to_numpy().tobytes(), crc)
            flat = col.flatten()
            crc = zlib.crc32(flat.to_numpy(zero_copy_only=False).tobytes(), crc)
        else:
            try:
                import numpy as np

                arr = col.to_numpy(zero_copy_only=False)
                if arr.dtype == object:
                    crc = zlib.crc32("\x00".join(map(str, arr)).encode(), crc)
                else:
                    crc = zlib.crc32(np.ascontiguousarray(arr).tobytes(), crc)
            except Exception:
                crc = zlib.crc32(str(col.to_pylist()).encode(), crc)
    return f"{crc:08x}"


def run_partitioned(
    shards: Dict[str, List[str]],
    process_fn: Callable[["rd.Dataset"], "rd.Dataset"],
    out_dir: str,
    manifest_path: Optional[str] = None,
    sort_by: Optional[List[str]] = None,
    read_fn: Optional[Callable[[List[str]], "rd.Dataset"]] = None,
) -> Dict[str, PartitionRecord]:
    """Run ``process_fn`` per input shard with exactly-once resume.

    shards: partition_id → list of input parquet fragments.
    Completed partitions (per the manifest) are SKIPPED; interrupted
    partitions are re-run idempotently (temp dir + atomic rename).
    Returns all partition records (existing + new).
    """
    manifest = Manifest(manifest_path or os.path.join(out_dir, "_manifest.jsonl"))
    done = manifest.load()
    read_fn = read_fn or (lambda frags: rd.read_parquet(frags))
    os.makedirs(out_dir, exist_ok=True)

    for pid, frags in shards.items():
        if pid in done:
            continue
        t0 = time.time()
        final_path = os.path.join(out_dir, f"part={pid}")
        tmp_path = os.path.join(out_dir, f"_tmp_part={pid}")
        shutil.rmtree(tmp_path, ignore_errors=True)
        shutil.rmtree(final_path, ignore_errors=True)

        ds = read_fn(frags)
        out = process_fn(ds)
        out.write_parquet(tmp_path)

        out_tbl = pq.read_table(tmp_path)
        out_bytes = sum(
            os.path.getsize(os.path.join(tmp_path, f))
            for f in os.listdir(tmp_path)
            if f.endswith(".parquet")
        )
        rec = PartitionRecord(
            partition_id=pid,
            input_fragments=list(frags),
            row_count=len(out_tbl),
            checksum=table_checksum(out_tbl, sort_by=sort_by),
            output_path=final_path,
            status="done",
            wall_sec=round(time.time() - t0, 3),
            finished_at=time.time(),
            output_bytes=out_bytes,
        )
        os.rename(tmp_path, final_path)
        manifest.append(rec)
        done[pid] = rec
    return done


def write_bucketed_resumable(
    build_fn: Callable[[Optional[frozenset]], "rd.Dataset"],
    keys: List[str],
    out_dir: str,
    num_buckets: int,
    manifest_path: Optional[str] = None,
    sort_by: Optional[List[str]] = None,
) -> Dict[str, PartitionRecord]:
    """Exactly-once resumable write of a KEY-BUCKETED pipeline (the
    flagship shape: keys straddle input shards, so the resume unit is
    the hash bucket, not the input file).

    ``build_fn(missing)`` returns the pipeline's output Dataset, built
    over the input filtered to rows whose ``bucket_ids(keys) %
    num_buckets`` lands in ``missing`` (``None`` = all buckets) and
    bucketed with the SAME ``num_buckets`` — each output block is then
    exactly one bucket. The write runs INSIDE the bucket's own Ray task:
    tmp dir → parquet → in-memory checksum → atomic rename → manifest
    append (single O_APPEND line — atomic on one node; on a multi-node
    cluster the manifest path must be shared storage). A kill between
    rename and append re-runs just that bucket idempotently; a completed
    run costs ONE input scan regardless of how many buckets exist.
    Buckets with zero rows get an explicit rows=0 record after the pass
    (otherwise they'd re-run forever)."""
    manifest = Manifest(manifest_path or os.path.join(out_dir, "_manifest.jsonl"))
    done = manifest.load()
    missing = [b for b in range(num_buckets) if str(b) not in done]
    if not missing:
        return done
    os.makedirs(out_dir, exist_ok=True)
    for b in missing:  # clear partial dirs from a previous kill
        shutil.rmtree(os.path.join(out_dir, f"_tmp_part={b}"), ignore_errors=True)
        shutil.rmtree(os.path.join(out_dir, f"part={b}"), ignore_errors=True)
    miss_set = frozenset(missing) if len(missing) < num_buckets else None
    mpath = manifest.path

    def write_bucket(t: pa.Table) -> pa.Table:
        from sous_chef_ray.stages.partition import bucket_ids

        t0 = time.time()
        pid = int(bucket_ids(t.slice(0, 1), keys, num_buckets)[0])
        tmp = os.path.join(out_dir, f"_tmp_part={pid}")
        final = os.path.join(out_dir, f"part={pid}")
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(t, os.path.join(tmp, "data.parquet"))
        rec = PartitionRecord(
            partition_id=str(pid),
            input_fragments=[f"bucket={pid}/{num_buckets}"],
            row_count=len(t),
            checksum=table_checksum(t, sort_by=sort_by),
            output_path=final,
            status="done",
            wall_sec=round(time.time() - t0, 3),
            finished_at=time.time(),
            output_bytes=os.path.getsize(os.path.join(tmp, "data.parquet")),
        )
        shutil.rmtree(final, ignore_errors=True)
        os.rename(tmp, final)
        Manifest(mpath).append(rec)
        return pa.table({"partition_id": pa.array([rec.partition_id]),
                         "rows": pa.array([rec.row_count], pa.int64())})

    out = build_fn(miss_set)
    # one whole-bucket block per map call (same batch_size=None contract
    # as partition_apply's apply stage)
    out.map_batches(write_bucket, batch_format="pyarrow",
                    batch_size=None, zero_copy_batch=True).count()

    done = manifest.load()
    for b in missing:  # empty buckets produced no block: record rows=0
        if str(b) not in done:
            final = os.path.join(out_dir, f"part={b}")
            os.makedirs(final, exist_ok=True)
            rec = PartitionRecord(
                partition_id=str(b),
                input_fragments=[f"bucket={b}/{num_buckets}"],
                row_count=0, checksum="0" * 8, output_path=final,
                status="done", wall_sec=0.0, finished_at=time.time())
            manifest.append(rec)
            done[str(b)] = rec
    return done
