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
