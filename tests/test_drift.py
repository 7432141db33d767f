"""Distribution-drift PSI (stages/drift.py): exact bin counts, known
PSI on a planted shift, zero PSI on identical distributions."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from sous_chef_ray.stages.drift import distribution_psi


def _ds(base_vals, curr_vals):
    t = pa.table({
        "value": pa.array(np.concatenate([base_vals, curr_vals]),
                          pa.float64()),
        "is_base": pa.array([True] * len(base_vals)
                            + [False] * len(curr_vals)),
    })
    return rd.from_arrow(t).repartition(3)


def test_psi_zero_on_identical(ray_session):
    v = np.repeat([5.0, 15.0, 25.0, 35.0], 50)
    out = distribution_psi(_ds(v, v), "value", "is_base",
                           bin_edges=[10, 20, 30]).to_pandas()
    assert (out["psi_contrib"] == 0).all()
    assert (out["psi_total"] == 0).all()
    assert out["n_base"].sum() == 200 and out["n_curr"].sum() == 200
    assert len(out) == 4


def test_psi_matches_direct_formula_on_shift(ray_session):
    rng = np.random.default_rng(3)
    base = rng.uniform(0, 40, 1000)
    curr = rng.uniform(10, 50, 1000)  # shifted distribution
    edges = [10, 20, 30, 40]
    out = distribution_psi(_ds(base, curr), "value", "is_base",
                           bin_edges=edges).to_pandas()
    nb = np.histogram(base, bins=[-np.inf] + edges + [np.inf])[0]
    nc = np.histogram(curr, bins=[-np.inf] + edges + [np.inf])[0]
    assert list(out["n_base"]) == list(nb)
    assert list(out["n_curr"]) == list(nc)
    p, q = nb / nb.sum(), nc / nc.sum()
    eps = 1e-6
    psi = ((q - p) * np.log(np.maximum(q, eps) / np.maximum(p, eps))).sum()
    assert abs(out["psi_total"].iloc[0] - round(psi, 6)) < 2e-6
    assert out["psi_total"].iloc[0] > 1.0  # the shift is detected
