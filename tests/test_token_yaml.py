"""The flagship token table driven through the DECLARATIVE path:
a YAML feature view with a native list<int32> tokens column
(Engine(native_dtypes=True) — SURVEY §1.3 'arrays stored as strings'
limitation lifted) retrieved point-in-time, token-array equality checked
against DuckDB."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
import yaml

from sous_chef_ray.engine import Engine
from sous_chef_ray.sources.synth import spine_table, token_table

RULES = {
    "required_tags": {"global": [], "feature_view": [], "feature": [], "feature_service": []},
    "optional_tags": {"global": []},
}


@pytest.fixture()
def token_repo(tmp_path):
    tbl = token_table(3000, seed=42, n_docs=50)
    (tmp_path / "data").mkdir()
    pq.write_table(tbl, tmp_path / "data" / "tokens.parquet")
    config = {
        "project": "tokens",
        "entities": [{"name": "doc", "join_key": "doc_id"}],
        "data_sources": {
            "token_data": {
                "type": "file",
                "path": "data/tokens.parquet",
                "timestamp_field": "event_ts",
                "created_timestamp_column": "created_ts",
            }
        },
    }
    spec = {
        "feature_views": {
            "token_features": {
                "source_name": "token_data",
                "entities": ["doc"],
                "ttl_days": 7,
                "schema": [
                    {"name": "tokens", "dtype": "ARRAY_INT32"},
                    {"name": "n_tok", "dtype": "INT32"},
                ],
            }
        }
    }
    with open(tmp_path / "tokens.yaml", "w") as f:
        yaml.dump(spec, f)
    eng = Engine(str(tmp_path), config, RULES, native_dtypes=True)
    return eng, tbl, tmp_path


def test_token_view_declared_and_retrieved(token_repo):
    eng, tbl, _ = token_repo
    objs = eng.create_from_yaml("tokens.yaml", apply=True)
    view = objs["token_features"]
    import pyarrow as pa

    assert view.schema[0].dtype == pa.list_(pa.int32())

    spine_t = spine_table(tbl, 200, seed=5)
    spine = pd.DataFrame(
        {
            "doc_id": spine_t["doc_id"].to_numpy(zero_copy_only=False),
            "event_timestamp": spine_t["event_timestamp"].to_pandas(),
        }
    )
    got = eng.get_historical_features(spine, view, concurrency=2)

    con = duckdb.connect()
    con.register("f", tbl)
    con.register("s", spine)
    exp = con.execute(
        """
        WITH dedup AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (
              PARTITION BY doc_id, event_ts ORDER BY created_ts DESC) AS rn FROM f)
          WHERE rn = 1),
        j AS (
          SELECT s.doc_id, s.event_timestamp, d.event_ts AS fts, d.tokens, d.n_tok
          FROM s ASOF LEFT JOIN dedup d
            ON s.doc_id = d.doc_id AND d.event_ts <= s.event_timestamp)
        SELECT doc_id, event_timestamp,
          CASE WHEN fts >= event_timestamp - INTERVAL 7 DAY THEN tokens END AS tokens,
          CASE WHEN fts >= event_timestamp - INTERVAL 7 DAY THEN n_tok END AS n_tok
        FROM j
        """
    ).df()

    def norm(df):
        df = df.copy()
        df["tokens"] = df["tokens"].map(
            lambda v: None if v is None or (isinstance(v, float) and np.isnan(v))
            else tuple(int(x) for x in v)
        )
        df["n_tok"] = df["n_tok"].astype("float64")
        return df.sort_values(["doc_id", "event_timestamp", "n_tok"]).reset_index(drop=True)

    g, e = norm(got), norm(exp)
    # per-row token-array equality (the BASELINE.json invariant)
    assert g["tokens"].tolist() == e["tokens"].tolist()
    pd.testing.assert_series_equal(g["n_tok"], e["n_tok"], check_dtype=False)


def test_default_mode_rejects_native_dtype(token_repo):
    eng, _, tmp = token_repo
    strict = Engine(str(tmp), eng.config, RULES)  # native_dtypes=False
    with pytest.raises(KeyError):
        strict.create_from_yaml("tokens.yaml")
