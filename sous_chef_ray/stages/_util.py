"""Shared stage helpers."""


def pool(concurrency):
    """Normalize an actor-pool concurrency spec to an autoscaling range.

    A fixed-size pool of N actors RESERVES N CPUs for the whole stage; if
    that equals the cluster's CPU count the upstream read starves and the
    pipeline deadlocks (observed on both the 4-cpu test session and the
    32-cpu bench). An autoscaling (1, N) pool starts at one actor and
    grows only while CPUs are actually available.
    """
    if isinstance(concurrency, int):
        return (1, max(1, concurrency))
    return concurrency


def composite_key_strings(cols) -> "object":
    """Injective composition of several key columns into ONE string key.

    Each component casts to string and escapes ``\\x1f`` → ``\\x1fE``;
    components then join on ``\\x1fS``. After escaping, every ``\\x1f``
    inside a component is followed by ``E``, so the ``\\x1fS`` boundary
    can never occur within a component — distinct tuples stay distinct
    even when raw keys contain the separator byte. NULL components
    render as an empty string plus a validity marker so (NULL,) ≠ ("",).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    parts = []
    for c in cols:
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        s = pc.cast(c, pa.string())
        esc = pc.replace_substring(s, "\x1f", "\x1fE")
        tagged = pc.binary_join_element_wise(
            pc.if_else(pc.is_valid(esc), pa.scalar("V"), pa.scalar("N")),
            pc.fill_null(esc, ""),
            "",
        )
        parts.append(tagged)
    if len(parts) == 1:
        return parts[0]
    return pc.binary_join_element_wise(*parts, "\x1fS")


def nul_safe_key_strings(arr):
    """Return a NUL-free equivalent of an Arrow string array for hashing.

    ``pd.util.hash_pandas_object`` is NOT value-deterministic for python
    strs with embedded ``\\x00`` (its C fast path truncates at the NUL,
    its fallback does not, and which one runs depends on the array's
    other values — see stages/salt.py). Bytes values hash fine; only str
    keys need this. The escape (\\x1f→\\x1fE, \\x00→\\x1fZ) is injective,
    so distinct keys stay distinct; the (cheap, one C pass) detection
    skips the rewrite entirely for clean columns — the common case.

    The escape must fire when the column contains EITHER \\x00 or \\x1f:
    a key containing only \\x1f would otherwise hash raw in clean
    batches but escaped in batches that happen to also hold a NUL key,
    landing the same key in different buckets across batches.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)):
        return arr
    n_esc = (pc.sum(pc.count_substring(arr, "\x00")).as_py() or 0) + (
        pc.sum(pc.count_substring(arr, "\x1f")).as_py() or 0
    )
    if not n_esc:
        return arr
    esc = pc.replace_substring(arr, "\x1f", "\x1fE")
    return pc.replace_substring(esc, "\x00", "\x1fZ")


def adjacent_neq(col) -> "object":
    """Null-aware boundary mask for a SORTED column: out[i] (length n-1)
    is True iff row i+1 differs from row i under SQL grouping semantics
    (NULL groups with NULL). A raw numpy ``a[1:] != a[:-1]`` turns NULL
    into NaN/NaT where ``NaN != NaN`` is True, silently splitting a NULL
    key run into one group per row."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n < 2:
        return np.zeros(max(0, n - 1), dtype=bool)
    a, b = col.slice(1), col.slice(0, n - 1)
    neq = pc.fill_null(pc.not_equal(a, b), False)  # null vs anything → null
    null_edge = pc.xor(pc.is_null(a), pc.is_null(b))
    return np.asarray(pc.or_(neq, null_edge))
