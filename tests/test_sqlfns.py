"""Unit tests for scalar SQL function kernels (pure Arrow, no Ray)."""

import pyarrow as pa

from sous_chef_ray.functions.sqlfns import split_part


def test_split_part_null_and_missing_semantics():
    """DuckDB semantics: NULL input → NULL; missing part → ''."""
    arr = pa.array(["a,b,c", "a", None, ""])
    out = split_part(arr, ",", 2)
    assert out.to_pylist() == ["b", "", None, ""]
    first = split_part(arr, ",", 1)
    assert first.to_pylist() == ["a", "a", None, ""]
