"""Distribution-drift detection between two corpus slices (PSI).

The ops-side operator a 100 TB ingest pipeline runs on every snapshot:
bin a numeric column with FIXED edges, compare the baseline slice's bin
distribution against the current slice's, and report the population
stability index PSI = Σ (p_cur − p_base) · ln(p_cur / p_base). One
streaming pass bins and tags rows (vectorized searchsorted), one hash
aggregate produces the (side, bin) counts — the driver sees only
n_bins × 2 integers. Counts are exact (hash-comparable to a SQL
oracle); the PSI contribution is a float rounded to 6 decimals so the
engine and the oracle agree bit-for-bit despite libm ulp differences.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def distribution_psi(
    ds: "rd.Dataset",
    value_col: str,
    base_mask_col: str,
    bin_edges: Sequence[float],
) -> pa.Table:
    """PSI per bin between rows where ``base_mask_col`` is true
    (baseline) and the rest (current). ``bin_edges`` are interior edges:
    bin i covers [edges[i-1], edges[i]) with open ends. Returns one row
    per bin: (bin, lo, hi, n_base, n_curr, psi_contrib) plus the scalar
    PSI repeated — exact integer counts, 6-decimal floats."""
    from ray.data.aggregate import Sum

    edges = np.asarray(list(bin_edges), dtype=np.float64)

    def tag(t: pa.Table) -> pa.Table:
        v = pc.cast(t[value_col], pa.float64()).to_numpy(
            zero_copy_only=False)
        b = np.searchsorted(edges, v, side="right")
        base = t[base_mask_col].to_numpy(zero_copy_only=False).astype(bool)
        return pa.table({
            "bin": pa.array(b.astype(np.int64)),
            "n_base": pa.array(base.astype(np.int64)),
            "n_curr": pa.array((~base).astype(np.int64)),
        })

    g = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("bin").aggregate(Sum("n_base", alias_name="n_base"),
                                  Sum("n_curr", alias_name="n_curr"))
    t = pa.concat_tables(g.iter_batches(batch_size=None,
                                        batch_format="pyarrow"))
    df = t.to_pandas().set_index("bin").reindex(
        range(len(edges) + 1), fill_value=0)
    nb = df["n_base"].to_numpy(dtype=np.int64)
    nc = df["n_curr"].to_numpy(dtype=np.int64)
    p = nb / max(nb.sum(), 1)
    q = nc / max(nc.sum(), 1)
    # standard ε-clip: a bin that vanished or appeared contributes a
    # LARGE finite term instead of being excluded (excluding it hides
    # exactly the one-sided drift PSI exists to detect)
    eps = 1e-6
    contrib = (q - p) * np.log(np.maximum(q, eps) / np.maximum(p, eps))
    lo = np.concatenate([[-np.inf], edges])
    hi = np.concatenate([edges, [np.inf]])
    return pa.table({
        "bin": pa.array(np.arange(len(p), dtype=np.int64)),
        "lo": pa.array(lo),
        "hi": pa.array(hi),
        "n_base": pa.array(nb),
        "n_curr": pa.array(nc),
        "psi_contrib": pa.array(np.round(contrib, 6)),
        "psi_total": pa.array(
            np.full(len(p), round(float(contrib.sum()), 6))),
    })
