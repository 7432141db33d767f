"""Per-stage execution metrics: ``Dataset.stats()`` → structured JSONL.

Ray Data's ``ds.stats()`` is a human-oriented text report; at 100 TB you
want the per-operator wall times, block counts and output bytes machine-
readable next to the lineage manifest, so a slow stage in yesterday's
run is a grep away. ``record_stats`` parses the report into one JSON
line per pipeline execution and appends it to a metrics file.

Parsing is best-effort over the stable parts of the format ("Operator N
<name>: ... blocks executed in <t>s"); unknown lines are ignored, and
the raw text is preserved under ``raw`` when ``keep_raw=True``.
"""

from __future__ import annotations

import json
import os
import re
import time
from typing import Dict, List, Optional

import ray.data as rd

_OP_RE = re.compile(
    r"Operator (\d+) (.+?): (\d+) tasks executed, (\d+) blocks produced"
    r" in ([0-9.]+)s"
)
_BYTES_RE = re.compile(r"Output size bytes per block: .*?([0-9,]+) total")
_ROWS_RE = re.compile(r"Output num rows per block: .*?([0-9,]+) total")


def parse_stats(text: str) -> List[Dict]:
    """Best-effort parse of a Dataset.stats() report → per-operator dicts."""
    ops: List[Dict] = []
    # split on "Operator N" headers, keeping each section's body
    sections = re.split(r"(?=Operator \d+ )", text)
    for sec in sections:
        m = _OP_RE.search(sec)
        if not m:
            continue
        op = {
            "operator": int(m.group(1)),
            "name": m.group(2).strip(),
            "tasks": int(m.group(3)),
            "blocks": int(m.group(4)),
            "wall_sec": float(m.group(5)),
        }
        mb = _BYTES_RE.search(sec)
        if mb:
            op["output_bytes"] = int(mb.group(1).replace(",", ""))
        mr = _ROWS_RE.search(sec)
        if mr:
            op["output_rows"] = int(mr.group(1).replace(",", ""))
        ops.append(op)
    return ops


def record_stats(
    ds: "rd.Dataset",
    metrics_path: str,
    stage: str,
    keep_raw: bool = False,
    extra: Optional[Dict] = None,
) -> Dict:
    """Append one JSON line of per-operator metrics for an EXECUTED
    dataset to ``metrics_path``. Call after consuming the dataset
    (write_parquet / count / iter) — stats of an unexecuted plan are
    empty. Returns the record."""
    text = ds.stats()
    rec = {
        "stage": stage,
        "recorded_at": time.time(),
        "operators": parse_stats(text),
        **(extra or {}),
    }
    if keep_raw:
        rec["raw"] = text
    os.makedirs(os.path.dirname(metrics_path) or ".", exist_ok=True)
    with open(metrics_path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    return rec
