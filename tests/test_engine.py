"""Engine facade end-to-end: the reference's customer-analytics example
scenario (reference: examples/customer_analytics_demo/customer_metrics.py —
100 daily rows for customers {1,2,3} from 2024-01-01, spine at 2024-01-15,
retrieval via feature service) run natively on Ray with a DuckDB oracle,
plus dry-run/apply registry semantics (reference:
tests/test_feature_services.py:214-249)."""

import numpy as np
import pandas as pd
import pytest
import yaml

from sous_chef_ray.engine import Engine, FeatureService, FeatureView

FEATURES_YAML = {
    "feature_views": {
        "customer_stats": {
            "source_name": "customer_data",
            "entities": ["customer"],
            "ttl_days": 90,
            "schema": [
                {"name": "total_purchases", "dtype": "FLOAT"},
                {"name": "purchase_count", "dtype": "INT64"},
            ],
        }
    },
    "feature_services": {
        "customer_insights": {
            "features": ["customer_stats"],
            "description": "Customer purchase insights",
        }
    },
}

RULES = {
    "required_tags": {"global": [], "feature_view": [], "feature": [], "feature_service": []},
    "optional_tags": {"global": ["description", "domain"]},
}


@pytest.fixture()
def repo(tmp_path):
    # reference-shaped source table: daily rows for 3 customers
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
    data_path = tmp_path / "data" / "customer_data.parquet"
    data_path.parent.mkdir(parents=True)
    df.to_parquet(data_path)

    config = {
        "project": "demo",
        "entities": [
            {"name": "customer", "join_key": "customer_id", "description": "A customer"}
        ],
        "data_sources": {
            "customer_data": {
                "type": "file",
                "path": "data/customer_data.parquet",
                "timestamp_field": "event_timestamp",
                "invalid_param": "dropped",  # must be filtered out
            }
        },
    }
    with open(tmp_path / "features.yaml", "w") as f:
        yaml.dump(FEATURES_YAML, f)
    eng = Engine(str(tmp_path), config, RULES)
    return eng, df, tmp_path


def test_param_filtering_and_registry(repo):
    eng, _, tmp = repo
    src = eng.get_data_source("customer_data")
    assert "invalid_param" not in src.params
    assert src.params["timestamp_field"] == "event_timestamp"
    assert (tmp / "feature_repo" / "feature_store.yaml").exists()
    assert (tmp / "feature_repo" / "registry.json").exists()


def test_dry_run_does_not_apply(repo):
    eng, _, _ = repo
    objs = eng.create_from_yaml("features.yaml", dry_run=True)
    assert set(objs) == {"customer_stats", "customer_insights"}
    with pytest.raises(KeyError):
        eng.get_feature_service("customer_insights")


def test_apply_registers_created_set(repo):
    eng, _, _ = repo
    objs = eng.create_from_yaml("features.yaml", apply=True)
    svc = eng.get_feature_service("customer_insights")
    assert isinstance(svc, FeatureService)
    assert isinstance(objs["customer_stats"], FeatureView)
    assert [f.name for f in objs["customer_stats"].schema] == [
        "total_purchases", "purchase_count",
    ]


def test_unknown_dtype_raises_keyerror(repo):
    eng, _, tmp = repo
    bad = {
        "feature_views": {
            "v": {
                "source_name": "customer_data",
                "entities": ["customer"],
                "schema": [{"name": "x", "dtype": "DOUBLE"}],
            }
        }
    }
    with open(tmp / "bad.yaml", "w") as f:
        yaml.dump(bad, f)
    with pytest.raises(KeyError):
        eng.create_from_yaml("bad.yaml")


def test_point_in_time_retrieval_matches_duckdb(repo):
    eng, df, _ = repo
    eng.create_from_yaml("features.yaml", apply=True)
    entity_df = pd.DataFrame(
        {
            "customer_id": [1, 2, 3, 999],
            "event_timestamp": pd.to_datetime(
                ["2024-01-15", "2024-01-15 12:00:00", "2023-12-31", "2024-01-15"],
                format="mixed",
            ),
        }
    )
    out = eng.get_historical_features(
        entity_df, eng.get_feature_service("customer_insights"), concurrency=2
    )

    import duckdb

    con = duckdb.connect()
    con.register("f", df)
    con.register("s", entity_df)
    exp = con.execute(
        """
        WITH j AS (
          SELECT s.customer_id, s.event_timestamp, f.event_timestamp AS fts,
                 f.total_purchases, f.purchase_count
          FROM s ASOF LEFT JOIN f
            ON s.customer_id = f.customer_id AND f.event_timestamp <= s.event_timestamp
        )
        SELECT customer_id, event_timestamp,
          CASE WHEN fts >= event_timestamp - INTERVAL 90 DAY THEN total_purchases END
            AS total_purchases,
          CASE WHEN fts >= event_timestamp - INTERVAL 90 DAY THEN purchase_count END
            AS purchase_count
        FROM j
        """
    ).df()
    got = out.sort_values(["customer_id", "event_timestamp"]).reset_index(drop=True)
    exp = exp.sort_values(["customer_id", "event_timestamp"]).reset_index(drop=True)
    assert np.allclose(
        got["total_purchases"].astype(float), exp["total_purchases"].astype(float),
        equal_nan=True,
    )
    assert got["purchase_count"].isna().tolist() == exp["purchase_count"].isna().tolist()
    # customer 999 and the 2023 timestamp must be null (B6/null-backfill)
    nulls = got[got["customer_id"] == 999]
    assert nulls["total_purchases"].isna().all()


def test_field_mapping_renames_columns(repo):
    eng, df, tmp = repo
    # re-register the source with a field_mapping (B5)
    from sous_chef_ray.engine import DataSource

    src = eng.get_data_source("customer_data")
    params = dict(src.params, field_mapping={"total_purchases": "purchases_total"})
    eng._sources["mapped"] = DataSource("mapped", "file", params)
    names = eng._sources["mapped"].load().schema().names
    assert "purchases_total" in names and "total_purchases" not in names


def test_two_view_service_concat(repo):
    """B3: a service over two views column-concats on the shared spine."""
    eng, df, tmp = repo
    spec = {
        "feature_views": {
            "v_purch": {
                "source_name": "customer_data",
                "entities": ["customer"],
                "ttl_days": 90,
                "schema": [{"name": "total_purchases", "dtype": "FLOAT"}],
            },
            "v_count": {
                "source_name": "customer_data",
                "entities": ["customer"],
                "ttl_days": 90,
                "schema": [{"name": "purchase_count", "dtype": "INT64"}],
            },
        },
        "feature_services": {
            "both": {"features": ["v_purch", "v_count"]}
        },
    }
    with open(tmp / "two.yaml", "w") as f:
        yaml.dump(spec, f)
    eng.create_from_yaml("two.yaml", apply=True)
    entity_df = pd.DataFrame(
        {"customer_id": [1, 2], "event_timestamp": pd.to_datetime(["2024-01-15"] * 2)}
    )
    out = eng.get_historical_features(entity_df, eng.get_feature_service("both"))
    assert set(out.columns) == {
        "customer_id", "event_timestamp", "total_purchases", "purchase_count",
    }
    assert out["total_purchases"].notna().all()
    assert out["purchase_count"].notna().all()


def test_unicode_tags_preserved(repo):
    """Unicode/emoji metadata survives the YAML → object path end-to-end
    (reference pins this: tests/test_sous_chef.py:224-237)."""
    eng, _, tmp = repo
    spec = {
        "feature_views": {
            "uni_view": {
                "source_name": "customer_data",
                "entities": ["customer"],
                "schema": [
                    {"name": "total_purchases", "dtype": "FLOAT",
                     "tags": {"description": "🚀 Résumé © † ∑ ∀ 数据"}}
                ],
                "tags": {"description": "统计 ∞ emoji 🎯"},
            }
        }
    }
    with open(tmp / "uni.yaml", "w", encoding="utf-8") as f:
        yaml.dump(spec, f, allow_unicode=True)
    objs = eng.create_from_yaml("uni.yaml", apply=True)
    view = objs["uni_view"]
    assert view.tags["description"] == "统计 ∞ emoji 🎯"
    assert view.schema[0].tags["description"] == "🚀 Résumé © † ∑ ∀ 数据"


def test_ttl_expiry_yields_nulls(repo):
    eng, df, tmp = repo
    short = {
        "feature_views": {
            "stats_1d": {
                "source_name": "customer_data",
                "entities": ["customer"],
                "ttl_days": 1,
                "schema": [{"name": "total_purchases", "dtype": "FLOAT"}],
            }
        }
    }
    with open(tmp / "short.yaml", "w") as f:
        yaml.dump(short, f)
    objs = eng.create_from_yaml("short.yaml", apply=True)
    # last source row is 2024-04-09; query >1 day later must be null
    entity_df = pd.DataFrame(
        {
            "customer_id": [1, 1],
            "event_timestamp": pd.to_datetime(
                ["2024-04-09 23:00:00", "2024-06-01"], format="mixed"
            ),
        }
    )
    out = eng.get_historical_features(entity_df, objs["stats_1d"], concurrency=2)
    out = out.sort_values("event_timestamp").reset_index(drop=True)
    assert not pd.isna(out.loc[0, "total_purchases"])
    assert pd.isna(out.loc[1, "total_purchases"])


def test_retail_feature_store_demo():
    """The ported reference example (examples/retail_feature_store_demo.py,
    ref examples/retail_feature_store/retail_analytics.py:31-132): two
    feature views on different cadences feed one service; the retrieval
    is asserted inside the demo against a DuckDB ASOF oracle."""
    import importlib.util
    from pathlib import Path

    path = Path(__file__).parent.parent / "examples" / "retail_feature_store_demo.py"
    spec = importlib.util.spec_from_file_location("retail_demo", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    feats = mod.main()  # raises on any ASOF-oracle mismatch
    assert len(feats) == 2
    assert {"total_purchases", "loyalty_points", "tier"} <= set(feats.columns)


def test_engine_execute_sql(repo):
    """Engine.execute_sql: the Ray-native analogue of the reference's
    warehouse pushdown (ref sql_sources.py:315-322) — the engine
    compiles and runs the SELECT instead of shipping it."""
    import duckdb

    eng, df, tmp_path = repo
    out = eng.execute_sql(
        "SELECT customer_id, CAST(SUM(purchase_count) AS BIGINT) AS total "
        "FROM customer_data GROUP BY customer_id",
        data_dir=str(tmp_path / "data"))
    con = duckdb.connect()
    con.register("customer_data", df)
    exp = con.execute(
        "SELECT customer_id, CAST(SUM(purchase_count) AS BIGINT) AS total "
        "FROM customer_data GROUP BY customer_id").df()
    got = out.sort_values("customer_id").reset_index(drop=True)
    exp = exp.sort_values("customer_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_engine_execute_sql_dialect_gate(tmp_path):
    """With a snowflake offline store the dialect validator gates
    execution: SELECT * is rejected (reference validator semantics)."""
    config = {
        "project": "demo",
        "offline_store": {"type": "snowflake"},
    }
    eng = Engine(str(tmp_path), config, RULES, check_dirs=False)
    with pytest.raises(ValueError, match="validator"):
        eng.execute_sql("SELECT * FROM t", data_dir=str(tmp_path))


def test_online_store_roundtrip_matches_historical(repo):
    """Round-5 (VERDICT missing #3): materialize_online writes each
    view's latest row per key into the configured sqlite store; online
    reads equal get_historical_features at a now-spine (the natural
    oracle: latest == as-of(now)), unknown keys come back typed-null,
    and dtypes survive (float32 stays float32)."""
    eng, df, tmp = repo
    created = eng.create_from_yaml(str(tmp / "features.yaml"))
    svc = eng.get_feature_service("customer_insights")

    written = eng.materialize_online(svc)
    assert written == {"customer_stats": 3}
    assert (tmp / "online_store.db").exists()  # config-default path

    online = eng.get_online_features(
        svc, [{"customer_id": 1}, {"customer_id": 2}, {"customer_id": 3},
              {"customer_id": 99}])
    assert list(online["customer_id"]) == [1, 2, 3, 99]
    assert online["total_purchases"].dtype == np.float32

    spine = pd.DataFrame({
        "customer_id": [1, 2, 3],
        "event_timestamp": pd.Timestamp("2024-04-10"),  # past the data
    })
    hist = eng.get_historical_features(spine, svc)
    for cid in (1, 2, 3):
        o = online[online["customer_id"] == cid].iloc[0]
        h = hist[hist["customer_id"] == cid].iloc[0]
        assert o["total_purchases"] == h["total_purchases"]
        assert o["purchase_count"] == h["purchase_count"]
    miss = online[online["customer_id"] == 99].iloc[0]
    assert pd.isna(miss["total_purchases"]) and pd.isna(miss["purchase_count"])

    # second materialize is an idempotent upsert, not a duplicate insert
    assert eng.materialize_online(svc) == {"customer_stats": 3}
    again = eng.get_online_features(svc, [{"customer_id": 2}])
    assert again.iloc[0]["purchase_count"] == online[
        online["customer_id"] == 2].iloc[0]["purchase_count"]
