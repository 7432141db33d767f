"""Source-registry conformance (reference: tests/test_registry.py —
import caching and error paths)."""

import pytest

from sous_chef_ray.sources.registry import SourceRegistry, filter_source_config


def test_get_source_caches():
    r1 = SourceRegistry.get_source("file")
    r2 = SourceRegistry.get_source("file")
    assert r1 is r2


def test_unknown_source_type_error_lists_available():
    with pytest.raises(ImportError, match="Available types"):
        SourceRegistry.get_source("nonexistent_source")


def test_register_custom_source():
    def fake_reader(**kwargs):
        return "fake"

    SourceRegistry.register("faketype", fake_reader)
    assert SourceRegistry.get_source("faketype") is fake_reader


def test_filter_source_config_whitelist():
    cfg = {
        "path": "x.parquet",
        "timestamp_field": "ts",
        "invalid_param": "nope",
        "created_timestamp_column": "c",
    }
    out = filter_source_config("file", cfg)
    assert "invalid_param" not in out
    assert set(out) == {"path", "timestamp_field", "created_timestamp_column"}
    # unknown type passes config through untouched (reference behavior)
    assert filter_source_config("mystery", cfg) == cfg


@pytest.mark.parametrize("source_type", ["file", "spark", "kafka", "redis"])
def test_supported_sources(source_type):
    """All four reference source types resolve (reference:
    tests/test_sous_chef.py:127-133 over SOURCE_TYPE_MAP/SOURCE_PARAMS)."""
    from sous_chef_ray.sources.registry import SOURCE_PARAMS

    assert SourceRegistry.get_source(source_type) is not None
    assert source_type in SOURCE_PARAMS


def test_source_params_match_reference_exactly():
    """Pinned to reference sous_chef.py:40-45 (no drift: no file_format,
    no batch_source)."""
    from sous_chef_ray.sources.registry import SOURCE_PARAMS

    assert SOURCE_PARAMS == {
        "file": ["path", "timestamp_field", "created_timestamp_column", "field_mapping"],
        "spark": ["path", "timestamp_field", "table", "query", "field_mapping"],
        "kafka": ["bootstrap_servers", "topic", "timestamp_field", "message_format"],
        "redis": ["connection_string", "key_ttl"],
    }


def test_spark_source_reads_parquet_path(tmp_path):
    import pandas as pd
    import ray.data as rd  # noqa: F401  (ray session from conftest)

    p = tmp_path / "t.parquet"
    pd.DataFrame({"a": [1, 2], "b": ["x", "y"]}).to_parquet(p)
    ds = SourceRegistry.get_source("spark")(path=str(p), field_mapping={"a": "a2"})
    out = ds.to_pandas()
    assert sorted(out.columns) == ["a2", "b"]
    assert len(out) == 2


def test_spark_source_without_path_declares_not_wired():
    with pytest.raises(NotImplementedError, match="parquet 'path'"):
        SourceRegistry.get_source("spark")(table="db.events")


def test_streaming_sources_return_spec_objects():
    k = SourceRegistry.get_source("kafka")(
        bootstrap_servers="b:9092", topic="t", timestamp_field="ts",
        message_format="json",
    )
    assert k.source_type == "kafka" and k.params["topic"] == "t"
    r = SourceRegistry.get_source("redis")(connection_string="redis://x", key_ttl=60)
    assert r.source_type == "redis" and r.params["key_ttl"] == 60


def test_csv_and_jsonl_extension_sources(tmp_path, ray_session):
    """Round-5 engine-extension source formats: CSV and JSON-lines read
    through the same registry surface (projection + field_mapping), and
    agree with the parquet reader on identical data. SOURCE_PARAMS stays
    reference-exact — extension-type configs pass through unfiltered."""
    import pandas as pd
    import pyarrow.parquet as pq

    from sous_chef_ray.sources.registry import (SOURCE_PARAMS,
                                                SourceRegistry,
                                                filter_source_config)

    df = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"],
                       "drop_me": [0.0, 1.0, 2.0]})
    df.to_csv(tmp_path / "t.csv", index=False)
    df.to_json(tmp_path / "t.jsonl", orient="records", lines=True)
    df.to_parquet(tmp_path / "t.parquet")

    base = SourceRegistry.get_source("file")(
        str(tmp_path / "t.parquet"), columns=["a", "b"],
        field_mapping={"b": "label"}).to_pandas()
    for typ, fname in (("csv", "t.csv"), ("jsonl", "t.jsonl")):
        got = SourceRegistry.get_source(typ)(
            str(tmp_path / fname), columns=["a", "b"],
            field_mapping={"b": "label"}).to_pandas()
        pd.testing.assert_frame_equal(
            got.sort_values("a").reset_index(drop=True),
            base.sort_values("a").reset_index(drop=True),
            check_dtype=False)

    # extension types are NOT in the reference-pinned param whitelist,
    # so their configs pass through unfiltered
    assert "csv" not in SOURCE_PARAMS and "jsonl" not in SOURCE_PARAMS
    cfg = {"path": "p", "anything": 1}
    assert filter_source_config("csv", cfg) == cfg
