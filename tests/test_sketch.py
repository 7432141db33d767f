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


def test_kll_quantile_accuracy():
    """Merged per-chunk KLL sketches estimate quantiles within ~2% rank
    error of exact (k=200 → expected O(1/k) error)."""
    import numpy as np

    from sous_chef_ray.stages.sketch import KllSketch

    rng = np.random.default_rng(4)
    data = rng.lognormal(0, 1, 200_000)
    merged = KllSketch(200)
    for i in range(0, len(data), 10_000):  # simulate per-batch sketching
        sk = KllSketch(200, seed=i)
        sk.add(data[i:i + 10_000])
        merged.merge(sk)
    qs = [0.1, 0.5, 0.9, 0.99]
    est = merged.quantiles(qs)
    sorted_data = np.sort(data)
    for q, e in zip(qs, est):
        # rank of the estimate vs target rank
        rank = np.searchsorted(sorted_data, e) / len(data)
        assert abs(rank - q) < 0.02, (q, e, rank)


def test_kll_distributed_matches_exact_within_tolerance():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from sous_chef_ray.stages.sketch import approx_quantiles

    rng = np.random.default_rng(7)
    vals = rng.standard_normal(50_000)
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(8)
    est = approx_quantiles(ds, "v", [0.25, 0.5, 0.75], k=200)
    exact = np.quantile(vals, [0.25, 0.5, 0.75])
    s = np.sort(vals)
    for e, q in zip(est, [0.25, 0.5, 0.75]):
        rank = np.searchsorted(s, e) / len(s)
        assert abs(rank - q) < 0.02, (q, e, rank)
    assert np.all(np.abs(est - exact) < 0.2)


def test_theta_sketch_set_ops():
    """KMV union/intersection/difference within ~5% on planted overlap."""
    import numpy as np
    import pandas as pd

    from sous_chef_ray.stages.sketch import ThetaSketch

    def sketch_of(ids):
        h = pd.util.hash_pandas_object(pd.Series(ids), index=False).to_numpy()
        sk = ThetaSketch(4096)
        sk.add_hashes(np.unique(h))
        return sk

    a_ids = np.arange(0, 60_000)          # |A| = 60k
    b_ids = np.arange(40_000, 90_000)     # |B| = 50k, overlap 20k
    a, b = sketch_of(a_ids), sketch_of(b_ids)
    assert abs(a.estimate() - 60_000) / 60_000 < 0.05
    assert abs(ThetaSketch.union(a, b) - 90_000) / 90_000 < 0.05
    assert abs(ThetaSketch.intersection(a, b) - 20_000) / 20_000 < 0.08
    assert abs(ThetaSketch.difference(a, b) - 40_000) / 40_000 < 0.08


def test_theta_sketch_distributed():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from sous_chef_ray.stages.sketch import theta_sketch_of

    ids = np.arange(30_000)
    ds = rd.from_pandas(pd.DataFrame({"u": ids})).repartition(8)
    sk = theta_sketch_of(ds, "u", k=2048)
    assert abs(sk.estimate() - 30_000) / 30_000 < 0.06


def test_hll_grouped_aggregate_v2():
    """HllDistinct as a native Ray Data AggregateFnV2: per-group approx
    distinct within 5% of exact."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from sous_chef_ray.stages.sketch import HllDistinct

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "g": rng.integers(0, 3, 60_000),
        "u": rng.integers(0, 4000, 60_000),
    })
    out = (
        rd.from_pandas(df).repartition(8)
        .groupby("g").aggregate(HllDistinct(on="u", p=12, alias_name="nd"))
        .to_pandas()
    )
    exact = df.groupby("g")["u"].nunique()
    for _, r in out.iterrows():
        e = exact[r["g"]]
        assert abs(r["nd"] - e) / e < 0.05, (r["g"], r["nd"], e)


def test_hll_grouped_ignores_nulls():
    """ignore_nulls=True (default): a null row must not add a phantom
    distinct value to its group's HLL."""
    import pandas as pd
    import ray.data as rd

    from sous_chef_ray.stages.sketch import HllDistinct

    df = pd.DataFrame({
        "g": ["a"] * 50 + ["b"] * 50,
        "u": [f"u{i}" for i in range(50)] + [None] * 50,
    })
    out = (
        rd.from_pandas(df).groupby("g")
        .aggregate(HllDistinct(on="u", p=12, alias_name="nd"))
        .to_pandas().set_index("g")["nd"]
    )
    assert abs(out["a"] - 50) / 50 < 0.1
    assert out["b"] == 0.0


def test_misra_gries_exact_when_under_capacity():
    import pandas as pd
    import ray.data as rd

    from sous_chef_ray.stages.sketch import frequent_items

    df = pd.DataFrame({"v": ["a"] * 70 + ["b"] * 20 + ["c"] * 10})
    out = frequent_items(rd.from_pandas(df).repartition(4), "v", k=8)
    assert dict(zip(out["item"], out["est_count"])) == {"a": 70, "b": 20, "c": 10}


def test_misra_gries_zipf_heavy_hitter_guarantee():
    """Every item with true frequency > n/(k+1) must be present, with
    estimate ≤ true ≤ estimate + n/(k+1); partition count must not
    change containment."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from sous_chef_ray.stages.sketch import frequent_items

    rng = np.random.default_rng(11)
    n, k = 40000, 16
    vals = rng.zipf(1.6, n).astype(np.int64)
    vals = np.minimum(vals, 1000)
    df = pd.DataFrame({"v": vals})
    truth = df["v"].value_counts()
    for parts in (2, 10):
        out = frequent_items(rd.from_pandas(df).repartition(parts), "v", k=k)
        est = dict(zip(out["item"], out["est_count"]))
        bound = n / (k + 1)
        for item, true_c in truth.items():
            if true_c > bound:
                assert item in est, (item, true_c, bound)
                assert est[item] <= true_c <= est[item] + bound


def test_kll_grouped_aggregate_accuracy():
    """Grouped KllQuantile (AggregateFnV2): per-group approximate median
    within ~2% rank error of the exact per-group median; null-heavy
    groups return NaN."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from sous_chef_ray.stages.sketch import KllQuantile

    rng = np.random.default_rng(4)
    n = 30000
    df = pd.DataFrame({
        "g": np.repeat(["a", "b", "c"], n // 3),
        "v": np.concatenate([
            rng.normal(0, 1, n // 3),
            rng.exponential(5, n // 3),
            rng.uniform(10, 20, n // 3),
        ]),
    })
    out = (
        rd.from_pandas(df).repartition(8).groupby("g")
        .aggregate(KllQuantile(on="v", q=0.5, k=200, alias_name="med"))
        .to_pandas().set_index("g")["med"]
    )
    for g, sub in df.groupby("g"):
        v = np.sort(sub["v"].to_numpy())
        # rank of the estimate must be within 2.5% of the true median rank
        rank = np.searchsorted(v, out[g]) / len(v)
        assert abs(rank - 0.5) < 0.025, (g, rank)


def test_countmin_exact_small_domain_and_merge():
    """Small domain << width → exact counts; halves sum-merge to whole."""
    from sous_chef_ray.stages.sketch import CountMinSketch

    rng = np.random.default_rng(7)
    vals = pd.Series(rng.choice(list("abcde"), 30_000))
    vc = vals.value_counts()
    items = pd.Series(vc.index)

    full = CountMinSketch(w=2048, d=4)
    full.add_values(items, vc.to_numpy(dtype=np.int64))
    assert (full.estimate(items) == vc.to_numpy()).all()

    a, b = CountMinSketch(w=2048, d=4), CountMinSketch(w=2048, d=4)
    half = vals[:15_000].value_counts()
    rest = vals[15_000:].value_counts()
    a.add_values(pd.Series(half.index), half.to_numpy(dtype=np.int64))
    b.add_values(pd.Series(rest.index), rest.to_numpy(dtype=np.int64))
    a.merge(b)
    assert (a.table == full.table).all()


def test_countmin_overestimate_bound_zipf():
    """Estimates never undercount, and error stays within the n·e/w
    bound with high probability on an adversarially wide Zipf domain."""
    from sous_chef_ray.stages.sketch import CountMinSketch

    rng = np.random.default_rng(11)
    vals = pd.Series(rng.zipf(1.3, 100_000).astype(str))
    vc = vals.value_counts()
    sk = CountMinSketch(w=512, d=4)
    sk.add_values(pd.Series(vc.index), vc.to_numpy(dtype=np.int64))
    est = sk.estimate(pd.Series(vc.index))
    true = vc.to_numpy()
    assert (est >= true).all()
    bound = len(vals) * np.e / 512
    assert np.mean(est - true <= bound) > 0.98


def test_countmin_distributed_matches_local():
    """countmin_of over a 6-block Dataset == one local sketch (sum-merge
    is exact, not approximate)."""
    from sous_chef_ray.stages.sketch import CountMinSketch, countmin_of

    rng = np.random.default_rng(13)
    df = pd.DataFrame({"t": rng.choice(["x", "y", "z", "w"], 20_000)})
    dist = countmin_of(rd.from_pandas(df).repartition(6), "t", w=1024, d=3)
    vc = df["t"].value_counts()
    local = CountMinSketch(w=1024, d=3)
    local.add_values(pd.Series(vc.index), vc.to_numpy(dtype=np.int64))
    assert (dist.table == local.table).all()
    assert (dist.estimate(pd.Series(vc.index)) == vc.to_numpy()).all()


def test_tree_reduce_equals_local_merge():
    """Round-3 review item: the ungrouped sketch paths route through a
    constant-key Dataset.aggregate (tree combine), NOT a driver merge
    loop. For the order-independent sketches (HLL register max, KMV
    union, Count-Min add, Misra-Gries when exact) the distributed result
    must EQUAL a local single-process build over the same rows."""
    import ray.data as rd

    from sous_chef_ray.stages.sketch import (
        CountMinSketch, HllSketch, ThetaSketch, approx_count_distinct,
        countmin_of, frequent_items, theta_sketch_of)

    rng = np.random.default_rng(12)
    vals = rng.integers(0, 5000, 60_000)
    df = pd.DataFrame({"v": vals.astype(str)})
    ds = rd.from_pandas(df).repartition(16)

    # HLL: distributed estimate == local estimate over identical hashes
    local_hll = HllSketch(14)
    local_hll.add_hashes(
        pd.util.hash_pandas_object(df["v"], index=False).to_numpy())
    assert approx_count_distinct(ds, "v", p=14) == local_hll.estimate()

    # Theta/KMV: identical sorted k-minimum hash sets
    local_theta = ThetaSketch(512)
    local_theta.add_hashes(np.unique(
        pd.util.hash_pandas_object(df["v"], index=False).to_numpy()))
    dist_theta = theta_sketch_of(ds, "v", k=512)
    np.testing.assert_array_equal(dist_theta.hashes, local_theta.hashes)

    # Count-Min: identical counter tables (element-wise adds commute)
    local_cms = CountMinSketch(1024, 3)
    vc = df["v"].value_counts()
    local_cms.add_values(pd.Series(vc.index), vc.to_numpy(dtype=np.int64))
    dist_cms = countmin_of(ds, "v", w=1024, d=3)
    np.testing.assert_array_equal(dist_cms.table, local_cms.table)


def test_frequent_items_exact_when_under_k():
    """MG with k ≥ #distinct is exact regardless of combine order."""
    import ray.data as rd

    rng = np.random.default_rng(3)
    vals = rng.choice(list("abcdefg"), 20_000, p=[.4, .2, .15, .1, .08, .05, .02])
    df = pd.DataFrame({"v": vals})
    out = frequent_items_import()(rd.from_pandas(df).repartition(8), "v", k=16)
    exp = df["v"].value_counts()
    got = dict(zip(out["item"], out["est_count"]))
    assert got == {i: int(c) for i, c in exp.items()}


def frequent_items_import():
    from sous_chef_ray.stages.sketch import frequent_items

    return frequent_items


def test_kll_tree_reduce_within_rank_error():
    """KLL compaction is merge-order dependent, so the tree path is
    tolerance-checked (rank error ~O(1/k)), not equality-checked."""
    import ray.data as rd

    from sous_chef_ray.stages.sketch import approx_quantiles

    rng = np.random.default_rng(7)
    x = rng.normal(100.0, 15.0, 80_000)
    ds = rd.from_pandas(pd.DataFrame({"x": x})).repartition(12)
    qs = [0.1, 0.5, 0.9]
    est = approx_quantiles(ds, "x", qs, k=200)
    exact = np.quantile(x, qs)
    # rank-error bound: estimated quantile's true rank within ±2.5% of q
    ranks = np.searchsorted(np.sort(x), est) / len(x)
    assert np.all(np.abs(ranks - np.asarray(qs)) < 0.025), (ranks, exact, est)
