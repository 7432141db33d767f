"""Retail feature-store demo — the reference's second example re-run on
the Ray engine (reference: examples/retail_feature_store/retail_analytics.py:31-132 —
daily retail rows for customers {1001, 1002} over 100 days from
2024-01-01, required-tag metadata rules, entity + file-source
registration, YAML feature view + `customer_insights` service,
point-in-time retrieval at 2024-01-15; feature_repo/features.yaml for
the tag schema).

Two deliberate extensions over the reference run:
  * a SECOND feature view (loyalty snapshots on a different cadence)
    feeds the same service, exercising multi-view retrieval concat;
  * the retrieved frame is asserted against a DuckDB ASOF JOIN oracle —
    the demo FAILS loudly on any point-in-time drift instead of just
    printing rows.

Run: python examples/retail_feature_store_demo.py   (also exercised by
tests/test_engine.py::test_retail_feature_store_demo in CI time)
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import pandas as pd
import yaml

import ray

RETAIL_TAGS = {"owner": "retail_analytics", "version": "1.0",
               "domain": "retail", "data_quality": "verified"}


def build_repo(repo: Path) -> None:
    """Sample data in the reference's shape (retail_analytics.py:24-47):
    100 daily rows per customer {1001, 1002} from 2024-01-01."""
    rng = np.random.default_rng(2024)
    dates = pd.date_range("2024-01-01", periods=100, freq="D")
    retail = pd.DataFrame({
        "event_timestamp": np.repeat(dates.values, 2),
        "customer_id": np.tile([1001, 1002], 100),
        "total_purchases": rng.integers(50, 200, 200).astype(np.float64),
        "purchase_frequency": rng.integers(1, 5, 200).astype(np.float64),
        "customer_segment": rng.integers(1, 4, 200),
    })
    # second view's source: sparser loyalty snapshots (every 7 days)
    snap_dates = dates[::7]
    loyalty = pd.DataFrame({
        "event_timestamp": np.repeat(snap_dates.values, 2),
        "customer_id": np.tile([1001, 1002], len(snap_dates)),
        "loyalty_points": rng.integers(0, 1000, 2 * len(snap_dates)),
        "tier": rng.integers(1, 4, 2 * len(snap_dates)),
    })
    (repo / "data").mkdir(parents=True)
    retail.to_parquet(repo / "data" / "retail_data.parquet")
    loyalty.to_parquet(repo / "data" / "loyalty_data.parquet")


def main() -> pd.DataFrame:
    from sous_chef_ray.engine import SousChef

    repo = Path(tempfile.mkdtemp(prefix="retail_demo_"))
    build_repo(repo)

    # engine bootstrap with the reference's metadata rules
    # (retail_analytics.py:73-80) — every view/feature/service below must
    # carry the required tags or create_from_yaml raises
    config = {
        "project": "retail_feature_store",
        "entities": [
            {"name": "customer", "join_key": "customer_id", "tags": RETAIL_TAGS}
        ],
        "data_sources": {
            "retail_transactions": {
                "type": "file",
                "path": "data/retail_data.parquet",
                "timestamp_field": "event_timestamp",
                "tags": RETAIL_TAGS,
            },
            "loyalty_snapshots": {
                "type": "file",
                "path": "data/loyalty_data.parquet",
                "timestamp_field": "event_timestamp",
                "tags": RETAIL_TAGS,
            },
        },
    }
    rules = {
        "required_tags": {
            "global": ["owner", "version", "domain"],
            "feature_view": ["team", "data_quality"],
            "feature": ["description", "data_quality"],
            "feature_service": ["status", "SLA"],
        },
        # the reference example omits this key and would KeyError in its
        # own ConfigValidator._get_allowed_tags (ref validators.py:188);
        # the engine keeps that exact behavior, so supply it here
        "optional_tags": {"global": []},
    }
    chef = SousChef(str(repo), config, rules)

    def feat(name: str, dtype: str, description: str) -> dict:
        return {"name": name, "dtype": dtype,
                "tags": {**RETAIL_TAGS, "description": description}}

    spec = {
        "feature_views": {
            "customer_features": {
                "source_name": "retail_transactions",
                "entities": ["customer"],
                "ttl_days": 90,
                "schema": [
                    feat("total_purchases", "FLOAT", "Total purchase amount"),
                    feat("purchase_frequency", "FLOAT", "Purchase frequency"),
                    feat("customer_segment", "INT64", "Customer segment code"),
                ],
                "tags": {**RETAIL_TAGS, "team": "customer_insights"},
            },
            "loyalty_features": {
                "source_name": "loyalty_snapshots",
                "entities": ["customer"],
                "ttl_days": 90,
                "schema": [
                    feat("loyalty_points", "INT64", "Accrued loyalty points"),
                    feat("tier", "INT64", "Loyalty tier"),
                ],
                "tags": {**RETAIL_TAGS, "team": "customer_insights"},
            },
        },
        "feature_services": {
            "customer_insights": {
                "features": ["customer_features", "loyalty_features"],
                "description": "Customer behavior analysis service",
                "tags": {**RETAIL_TAGS, "status": "production", "SLA": "T+1"},
            }
        },
    }
    with open(repo / "features.yaml", "w") as f:
        yaml.dump(spec, f)
    created = chef.create_from_yaml("features.yaml")
    print("created:", sorted(created))

    # point-in-time retrieval at 2024-01-15 (retail_analytics.py:122-132)
    query_ts = pd.Timestamp("2024-01-15")
    entity_df = pd.DataFrame({
        "customer_id": [1001, 1002],
        "event_timestamp": [query_ts, query_ts],
    })
    feats = chef.get_historical_features(
        entity_df, chef.get_feature_service("customer_insights"))
    print(feats.to_string())

    # --- DuckDB ASOF oracle: both views, zero temporal leakage ---
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW retail AS SELECT * FROM "
                f"read_parquet('{repo}/data/retail_data.parquet')")
    con.execute(f"CREATE VIEW loyalty AS SELECT * FROM "
                f"read_parquet('{repo}/data/loyalty_data.parquet')")
    con.execute("CREATE TABLE spine (customer_id BIGINT, "
                "event_timestamp TIMESTAMP)")
    con.executemany("INSERT INTO spine VALUES (?, ?)",
                    list(entity_df.itertuples(index=False, name=None)))
    exp = con.execute("""
        SELECT s.customer_id, s.event_timestamp,
               r.total_purchases, r.purchase_frequency, r.customer_segment,
               l.loyalty_points, l.tier
        FROM spine s
        ASOF LEFT JOIN retail r
          ON s.customer_id = r.customer_id
         AND r.event_timestamp <= s.event_timestamp
        ASOF LEFT JOIN loyalty l
          ON s.customer_id = l.customer_id
         AND l.event_timestamp <= s.event_timestamp
        ORDER BY s.customer_id
    """).df()
    got = feats.sort_values("customer_id").reset_index(drop=True)
    exp = exp.sort_values("customer_id").reset_index(drop=True)
    for c in ["total_purchases", "purchase_frequency"]:
        got[c] = got[c].astype(np.float64)  # engine keeps Float32 outputs
    pd.testing.assert_frame_equal(
        got[exp.columns], exp, check_dtype=False)
    print("ASOF oracle check: OK (multi-view point-in-time exact)")
    return feats


if __name__ == "__main__":
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR")
    main()
    ray.shutdown()
