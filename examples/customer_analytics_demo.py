"""Customer-analytics demo — the reference's flagship example re-run on
the Ray engine (reference: examples/customer_analytics_demo/customer_metrics.py:
daily purchase rows for customers {1,2,3} over 100 days from 2024-01-01,
entity+source registration, YAML feature view + service, point-in-time
retrieval at 2024-01-15).

Run: python examples/customer_analytics_demo.py
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


def main() -> None:
    from sous_chef_ray.engine import SousChef

    repo = Path(tempfile.mkdtemp(prefix="customer_demo_"))

    # 1. generate the example source table (reference shape:
    #    event_timestamp, customer_id, total_purchases f32, purchase_count)
    rng = np.random.default_rng(42)
    dates = pd.date_range("2024-01-01", periods=100, freq="D")
    df = pd.DataFrame(
        {
            "event_timestamp": np.repeat(dates.values, 3),
            "customer_id": np.tile([1, 2, 3], 100),
            "total_purchases": rng.uniform(10, 1000, 300).astype(np.float32),
            "purchase_count": rng.integers(1, 50, 300),
        }
    )
    (repo / "data").mkdir(parents=True)
    df.to_parquet(repo / "data" / "customer_data.parquet")

    # 2. engine bootstrap: entities + sources from config (no Feast)
    config = {
        "project": "customer_analytics",
        "entities": [
            {"name": "customer", "join_key": "customer_id",
             "description": "A customer of the business"}
        ],
        "data_sources": {
            "customer_data": {
                "type": "file",
                "path": "data/customer_data.parquet",
                "timestamp_field": "event_timestamp",
            }
        },
    }
    rules = {
        "required_tags": {"global": [], "feature_view": [], "feature": [],
                          "feature_service": []},
        "optional_tags": {"global": ["description", "domain", "team"]},
    }
    chef = SousChef(str(repo), config, rules)

    # 3. YAML feature views + service (reference: feature_repo/features.yaml)
    spec = {
        "feature_views": {
            "customer_stats": {
                "source_name": "customer_data",
                "entities": ["customer"],
                "ttl_days": 90,
                "schema": [
                    {"name": "total_purchases", "dtype": "FLOAT"},
                    {"name": "purchase_count", "dtype": "INT64"},
                ],
                "tags": {"domain": "customer_analytics"},
            }
        },
        "feature_services": {
            "customer_insights": {
                "features": ["customer_stats"],
                "description": "Customer purchase insights",
            }
        },
    }
    with open(repo / "features.yaml", "w") as f:
        yaml.dump(spec, f)
    created = chef.create_from_yaml("features.yaml")
    print("created:", sorted(created))

    # 4. point-in-time retrieval on a spine at 2024-01-15
    entity_df = pd.DataFrame(
        {
            "customer_id": [1, 2],
            "event_timestamp": pd.to_datetime(["2024-01-15", "2024-01-15"]),
        }
    )
    feats = chef.get_historical_features(
        entity_df, chef.get_feature_service("customer_insights")
    )
    print(feats)


if __name__ == "__main__":
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR")
    main()
    ray.shutdown()
