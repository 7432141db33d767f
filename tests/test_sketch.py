"""HyperLogLog sketch accuracy + mergeability."""

import numpy as np
import pandas as pd
import ray.data as rd

from sous_chef_ray.stages.sketch import HllSketch, approx_count_distinct


def test_hll_accuracy_and_merge():
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 100_000, 400_000)  # ~98k distinct
    true = len(np.unique(vals))

    h = pd.util.hash_pandas_object(pd.Series(vals), index=False).to_numpy()
    full = HllSketch(p=14)
    full.add_hashes(h)
    est = full.estimate()
    assert abs(est - true) / true < 0.03, (est, true)

    # merge of halves == whole
    a, b = HllSketch(p=14), HllSketch(p=14)
    a.add_hashes(h[: len(h) // 2])
    b.add_hashes(h[len(h) // 2 :])
    a.merge(b)
    assert a.estimate() == est


def test_approx_count_distinct_dataset():
    rng = np.random.default_rng(4)
    df = pd.DataFrame({"u": rng.integers(0, 5_000, 50_000)})
    true = df["u"].nunique()
    est = approx_count_distinct(rd.from_pandas(df).repartition(6), "u", p=14)
    assert abs(est - true) / true < 0.05, (est, true)
