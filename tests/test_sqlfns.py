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


def test_composite_key_strings_injective():
    from sous_chef_ray.stages._util import composite_key_strings

    # adversarial: separator bytes inside components must not collide
    a = pa.array(["a\x1fb", "a", None, ""])
    b = pa.array(["c", "b\x1fc", "x", None])
    ck = composite_key_strings([a, b]).to_pylist()
    assert len(set(ck)) == 4  # all distinct
    # same tuples → same key
    ck2 = composite_key_strings([a, b]).to_pylist()
    assert ck == ck2
    # NULL vs empty string differ
    e = composite_key_strings([pa.array([None, ""])]).to_pylist()
    assert e[0] != e[1]
    # int keys compose too
    ik = composite_key_strings([pa.array([1, 12]), pa.array([23, 3])]).to_pylist()
    assert ik[0] != ik[1]


def test_json_extract_kernels():
    from sous_chef_ray.functions.sqlfns import json_extract_int, json_extract_scalar

    a = pa.array(['{"k": 69}', '{"k":-3, "z": 1}', '{"z": 2}', None,
                  '{"k": "s v"}', '{"k": true}'])
    assert json_extract_int(a, "k").to_pylist() == [69, -3, None, None, None, None]
    assert json_extract_scalar(a, "k").to_pylist() == [
        "69", "-3", None, None, "s v", "true"]
