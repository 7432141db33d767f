"""SQL → Ray plan compiler (sous_chef_ray/sqlexec.py).

The compiled plan for each supported construct must match DuckDB running
the IDENTICAL SQL string — that is the whole point of the module (the
driver's sql_execute_* correctness entries enforce the same contract at
sf0.01; here we pin parser shapes, evaluation semantics, and the
unsupported-construct error boundary at sf0.001)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from sous_chef_ray.sqlexec import (
    Bin, Case, Cast, Col, Func, InList, IsNull, Lit, Win, eval_expr,
    parse_sql, sql_execute)

SF = "/root/testdata/sf0.001"
TABLES = "orders lineitem events customer nation region supplier part".split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def run_both(con, sql: str) -> None:
    import ray.data as rd

    got = sql_execute(sql, SF)
    if isinstance(got, rd.Dataset):
        got = got.to_pandas()
    exp = con.execute(sql).df()
    cols = sorted(got.columns)
    assert cols == sorted(exp.columns)
    g = got[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    e = exp[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(g, e, check_dtype=True)


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


def test_parse_select_shape():
    sel = parse_sql(
        "SELECT a, b + 1 AS c FROM t WHERE a > 2 GROUP BY a "
        "HAVING COUNT(*) > 1 ORDER BY a DESC LIMIT 5")
    assert sel.table == "t"
    assert sel.items[0] == (None, Col("a"))
    assert sel.items[1] == ("c", Bin("+", Col("b"), Lit(1, "int")))
    assert sel.where == Bin(">", Col("a"), Lit(2, "int"))
    assert sel.group_by == [Col("a")]
    assert isinstance(sel.having, Bin)
    assert sel.order_by == [(Col("a"), True)]
    assert sel.limit == 5


def test_parse_window_and_frames():
    sel = parse_sql(
        "SELECT SUM(x) OVER (PARTITION BY k ORDER BY ts "
        "ROWS UNBOUNDED PRECEDING) AS s FROM t")
    w = sel.items[0][1]
    assert isinstance(w, Win)
    assert w.func == Func("SUM", (Col("x"),))
    assert w.frame == "rows_unbounded_preceding"
    sel2 = parse_sql(
        "SELECT LAST_VALUE(x) OVER (PARTITION BY k ORDER BY ts ROWS BETWEEN "
        "UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS s FROM t")
    assert sel2.items[0][1].frame == "full_partition"


def test_parse_typed_literals_and_case():
    sel = parse_sql(
        "SELECT CASE WHEN ts >= TIMESTAMP '2024-01-01 00:00:00' THEN 1 "
        "ELSE 0 END AS flag, CAST(x AS BIGINT) AS xi FROM t "
        "WHERE d IS NOT NULL AND s IN ('a', 'b') AND x NOT BETWEEN 1 AND 2")
    case = sel.items[0][1]
    assert isinstance(case, Case) and case.default == Lit(0, "int")
    assert sel.items[1][1] == Cast(Col("x"), "BIGINT")
    conj = sel.where
    assert isinstance(conj, Bin) and conj.op == "AND"


def test_parse_rejects_trailing_garbage():
    with pytest.raises(ValueError):
        parse_sql("SELECT a FROM t WHERE")
    with pytest.raises(ValueError):
        parse_sql("SELECT a FROM t alias 42")
    with pytest.raises(ValueError):
        parse_sql("SELECT a FROM t JOIN u ON")


def test_parse_join_shapes():
    sel = parse_sql(
        "SELECT o.o_orderkey AS ok FROM orders o "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "LEFT OUTER JOIN nation AS n ON c.c_nationkey = n.n_nationkey "
        "CROSS JOIN region")
    assert sel.frm.table == "orders" and sel.frm.alias == "o"
    assert [j.kind for j in sel.joins] == ["inner", "left", "cross"]
    assert sel.joins[1].ref.alias == "n"
    assert sel.joins[2].ref.alias == "region" and sel.joins[2].on is None
    assert sel.items[0][1] == Col("o_orderkey", "o")
    # derived table
    sel2 = parse_sql(
        "SELECT t.total AS total FROM (SELECT o_custkey AS k, "
        "SUM(o_totalprice) AS total FROM orders GROUP BY o_custkey) t")
    assert sel2.frm.table is None and sel2.frm.alias == "t"
    assert sel2.frm.sub.table == "orders"


# ---------------------------------------------------------------------------
# evaluation semantics (DuckDB-pinned)
# ---------------------------------------------------------------------------


def test_eval_duckdb_division_and_round():
    t = pa.table({"a": pa.array([7, 5], pa.int64())})
    v = eval_expr(parse_sql("SELECT a / 2 AS h FROM t").items[0][1], t)
    assert v.to_pylist() == [3.5, 2.5]  # DuckDB: int/int → DOUBLE
    t2 = pa.table({"x": pa.array([2.5, 3.5, -2.5])})
    v2 = eval_expr(Func("ROUND", (Col("x"),)), t2)
    assert v2.to_pylist() == [3.0, 4.0, -3.0]  # half away from zero
    v3 = eval_expr(Cast(Col("x"), "BIGINT"), t2)
    assert v3.to_pylist() == [3, 4, -3]


def test_eval_null_semantics():
    t = pa.table({"x": pa.array([1, None, 3], pa.int64())})
    m = eval_expr(parse_sql("SELECT 1 FROM t WHERE x > 1").where, t)
    assert m.to_pylist() == [False, None, True]  # Kleene: null stays null
    nn = eval_expr(IsNull(Col("x"), negated=True), t)
    assert nn.to_pylist() == [True, False, True]
    inl = eval_expr(InList(Col("x"), (Lit(1, "int"), Lit(3, "int"))), t)
    assert inl.to_pylist()[0] is True and inl.to_pylist()[2] is True


# ---------------------------------------------------------------------------
# end-to-end vs DuckDB (same string both sides)
# ---------------------------------------------------------------------------


def test_compiled_family_matches_duckdb(con):
    """Every registered sql_execute_* query at sf0.001 (the sf0.01 runs
    are the driver gate's job)."""
    from sous_chef_ray.queries import _SQL_EXECUTE_FAMILY

    for name, sql in _SQL_EXECUTE_FAMILY.items():
        run_both(con, sql)


def test_where_pushdown_prunes_scan(con):
    """A scan-expressible WHERE must land in the parquet read filter, not
    a runtime map_batches filter (plan shape, not just results)."""
    import ray.data as rd

    sql = ("SELECT o_orderkey FROM orders "
           "WHERE o_totalprice > 150000 AND o_orderstatus = 'O'")
    ds = sql_execute(sql, SF)
    assert isinstance(ds, rd.Dataset)
    # pushed-down plan = read → ONE MapBatches (the projection); a
    # non-pushable WHERE adds a second MapBatches (runtime filter)
    plan = str(ds._plan.get_plan_as_string(type(ds)))
    assert plan.count("MapBatches") == 1, plan
    not_pushed = sql_execute(
        "SELECT o_orderkey FROM orders WHERE UPPER(o_orderstatus) = 'O'", SF)
    assert str(not_pushed._plan.get_plan_as_string(type(ds))).count(
        "MapBatches") == 2
    run_both(con, sql)


def test_non_pushable_where_still_correct(con):
    run_both(con, "SELECT o_orderkey FROM orders "
                  "WHERE UPPER(o_orderstatus) = 'O' AND o_totalprice / 2 > 50000")


def test_group_by_ordinal(con):
    run_both(con, "SELECT EXTRACT(YEAR FROM o_orderdate) AS yr, "
                  "CAST(COUNT(*) AS BIGINT) AS n FROM orders GROUP BY 1")


def test_count_column_skips_nulls(con):
    # LAG produces nulls at partition starts; COUNT(col) must skip them.
    run_both(con, "SELECT CAST(COUNT(o_orderkey) AS BIGINT) AS n, "
                  "CAST(COUNT(*) AS BIGINT) AS n_star FROM orders")


def test_unsupported_constructs_raise():
    with pytest.raises(ValueError):
        sql_execute("SELECT a FROM t; DROP TABLE t", SF)  # validator gate
    with pytest.raises(ValueError):
        sql_execute(
            "SELECT LAST_VALUE(value) OVER (PARTITION BY user_id "
            "ORDER BY ts ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) "
            "AS lv FROM events", SF)  # moving LAST_VALUE frame
    with pytest.raises((ValueError, KeyError)):
        sql_execute("SELECT user_id, CORR(value, value) AS c FROM events "
                    "GROUP BY user_id", SF)


def test_streaming_projection_returns_dataset():
    import ray.data as rd

    out = sql_execute("SELECT o_orderkey, o_totalprice * 2 AS dbl FROM orders", SF)
    assert isinstance(out, rd.Dataset)  # projection stays streaming
    assert out.count() > 0


# ---------------------------------------------------------------------------
# joins (round 4): SQL string is both the Ray plan and the DuckDB oracle
# ---------------------------------------------------------------------------


def test_join_inner_broadcast(con):
    # customer (small at sf0.001) broadcasts; orders streams
    run_both(con, """
SELECT o.o_orderkey AS ok, c.c_name AS name, o.o_totalprice AS price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_totalprice > 180000 AND c.c_mktsegment = 'BUILDING'""")


def test_join_inner_hash_large(con):
    # force the hash path: broadcast_rows=0 disables dim broadcast
    import ray.data as rd
    from sous_chef_ray.sqlexec import sql_execute as ex

    sql = """
SELECT l.l_orderkey AS ok, l.l_quantity AS qty, o.o_orderstatus AS st
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_totalprice > 250000"""
    got = ex(sql, SF, broadcast_rows=0)
    assert isinstance(got, rd.Dataset)
    got = got.to_pandas()
    exp = con.execute(sql).df()
    cols = sorted(got.columns)
    assert cols == sorted(exp.columns)
    g = got[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    e = exp[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(g, e, check_dtype=True)


def test_join_left_outer_with_aggregate(con):
    run_both(con, """
SELECT c.c_mktsegment AS seg, CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_mktsegment""")


def test_join_three_way_group(con):
    run_both(con, """
SELECT n.n_name AS nation, CAST(SUM(CAST(o.o_totalprice * 100 AS BIGINT)) AS BIGINT) AS cents
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F'
GROUP BY n.n_name""")


def test_join_derived_table(con):
    run_both(con, """
SELECT c.c_name AS name, t.total_cents AS total_cents
FROM (SELECT o_custkey, CAST(SUM(CAST(o_totalprice * 100 AS BIGINT)) AS BIGINT) AS total_cents
      FROM orders GROUP BY o_custkey) t
JOIN customer c ON t.o_custkey = c.c_custkey
WHERE t.total_cents > 50000000""")


def test_join_cross_small(con):
    run_both(con, """
SELECT n.n_name AS nation, r.r_name AS region_name
FROM nation n CROSS JOIN region r
WHERE r.r_regionkey = 0""")


def test_join_errors():
    with pytest.raises(ValueError):
        sql_execute("SELECT o.o_orderkey AS ok FROM orders o "
                    "JOIN customer c ON o.o_totalprice > c.c_acctbal", SF)
    with pytest.raises(ValueError):
        # collision: both orders aliases expose o_orderkey
        sql_execute("SELECT a.o_orderkey AS x, b.o_orderkey AS y "
                    "FROM orders a JOIN orders b ON a.o_custkey = b.o_custkey",
                    SF)
    with pytest.raises(KeyError):
        sql_execute("SELECT z.nope AS x FROM orders z", SF)


# ---------------------------------------------------------------------------
# subqueries, moving frames, UNION (round 4)
# ---------------------------------------------------------------------------


def test_scalar_subquery(con):
    run_both(con, "SELECT o_orderkey, o_totalprice FROM orders "
                  "WHERE o_totalprice > (SELECT AVG(o_totalprice) AS a "
                  "FROM orders) * 1.8")


def test_in_subquery_semi_anti(con):
    run_both(con, "SELECT c_name, c_acctbal FROM customer WHERE c_custkey "
                  "IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)")
    run_both(con, "SELECT c_name, c_acctbal FROM customer WHERE c_custkey "
                  "NOT IN (SELECT o_custkey FROM orders "
                  "WHERE o_totalprice > 450000)")


def test_moving_frames(con):
    run_both(con, """
SELECT event_id, user_id,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS mv3_cents
FROM events""")
    run_both(con, """
SELECT event_id,
       AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 3 PRECEDING AND 1 FOLLOWING) AS mavg,
       CAST(COUNT(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 3 PRECEDING AND 1 FOLLOWING) AS BIGINT) AS mcnt
FROM events""")


def test_union_all_and_distinct(con):
    run_both(con, "SELECT o_orderkey AS k, 'ord' AS src FROM orders "
                  "WHERE o_totalprice > 290000 UNION ALL "
                  "SELECT l_orderkey AS k, 'line' AS src FROM lineitem "
                  "WHERE l_quantity = 50")
    run_both(con, "SELECT o_orderstatus AS s FROM orders UNION "
                  "SELECT l_returnflag AS s FROM lineitem ORDER BY s")


def test_union_rejects_mismatched_columns():
    with pytest.raises(ValueError):
        sql_execute("SELECT o_orderkey AS a FROM orders UNION ALL "
                    "SELECT l_orderkey AS b FROM lineitem", SF)


def test_union_mixed_chains(con):
    """Round-5: mixed ALL/DISTINCT chains evaluate left-associative per
    SQL — a DISTINCT step dedupes the accumulated prefix, a later ALL
    step appends with duplicates."""
    run_both(con, (
        "SELECT o_orderstatus AS s FROM orders UNION "
        "SELECT o_orderstatus AS s FROM orders UNION ALL "
        "SELECT o_orderstatus AS s FROM orders WHERE o_orderkey < 50"))
    run_both(con, (
        "SELECT o_orderstatus AS s FROM orders UNION ALL "
        "SELECT o_orderstatus AS s FROM orders UNION "
        "SELECT 'Z' AS s FROM orders WHERE o_orderkey < 5"))


def test_left_join_nonequi_on(con):
    """Round-5: cross-side non-equi ON conjuncts on LEFT JOIN decide
    MATCHING (failing matches drop; the left row null-extends iff no
    match passes) — broadcast merge collapse, incl. the anti-idiom."""
    run_both(con, (
        "SELECT c.c_name, c.c_acctbal, o.o_orderkey, o.o_totalprice "
        "FROM customer c LEFT JOIN orders o "
        "ON c.c_custkey = o.o_custkey AND o.o_totalprice > c.c_acctbal * 20"))
    run_both(con, (
        "SELECT c.c_custkey FROM customer c LEFT JOIN orders o "
        "ON c.c_custkey = o.o_custkey AND o.o_totalprice > c.c_acctbal * 50 "
        "WHERE o.o_orderkey IS NULL"))
    # hash path (right side above broadcast threshold) raises clearly
    with pytest.raises(ValueError):
        sql_execute(
            "SELECT c.c_name FROM customer c LEFT JOIN orders o "
            "ON c.c_custkey = o.o_custkey AND o.o_totalprice > c.c_acctbal",
            SF, broadcast_rows=0)


def test_quantile_aggregates(con):
    run_both(con, "SELECT l_returnflag, MEDIAN(l_quantity) AS med_qty, "
                  "QUANTILE_CONT(l_extendedprice, 0.75) AS p75_price "
                  "FROM lineitem GROUP BY l_returnflag")
    run_both(con, "SELECT MEDIAN(o_totalprice) AS med_price, "
                  "CAST(COUNT(*) AS BIGINT) AS n FROM orders")


def test_ntile_pct_windows(con):
    run_both(con, """
SELECT event_id,
       NTILE(4) OVER (PARTITION BY user_id ORDER BY value) AS quartile,
       PERCENT_RANK() OVER (PARTITION BY user_id ORDER BY value) AS pr,
       CUME_DIST() OVER (PARTITION BY user_id ORDER BY value) AS cd
FROM events""")


def test_partition_total_windows(con):
    # percent-of-total / RATIO_TO_REPORT shape: grouped aggregate
    # broadcast back onto the stream
    run_both(con, "SELECT o_orderkey, o_custkey, "
                  "o_totalprice / SUM(o_totalprice) OVER "
                  "(PARTITION BY o_custkey) AS share, "
                  "CAST(COUNT(*) OVER (PARTITION BY o_custkey) AS BIGINT) "
                  "AS n_orders FROM orders")
    run_both(con, "SELECT event_id, user_id, "
                  "value - AVG(value) OVER (PARTITION BY user_id) AS dev, "
                  "MIN(value) OVER (PARTITION BY user_id) AS mn, "
                  "MAX(value) OVER (PARTITION BY user_id) AS mx FROM events")


def test_exists_decorrelation(con):
    # Q4 shape: one equality correlation + inner-only predicate
    run_both(con, "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n "
                  "FROM orders WHERE EXISTS (SELECT 1 AS x FROM lineitem "
                  "WHERE l_orderkey = o_orderkey AND l_quantity > 45) "
                  "GROUP BY o_orderpriority")
    # NOT EXISTS → anti filter
    run_both(con, "SELECT c_name FROM customer WHERE NOT EXISTS "
                  "(SELECT 1 AS x FROM orders WHERE o_custkey = c_custkey "
                  "AND o_totalprice > 400000)")
    # uncorrelated EXISTS folds to a boolean literal
    run_both(con, "SELECT o_orderkey FROM orders WHERE EXISTS "
                  "(SELECT 1 AS x FROM customer WHERE c_acctbal > 9000) "
                  "AND o_totalprice > 300000")


def test_select_distinct(con):
    run_both(con, "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders")
    run_both(con, "SELECT DISTINCT l_returnflag FROM lineitem "
                  "ORDER BY l_returnflag")


def test_window_over_aggregate(con):
    # rank over grouped results (bounded post-aggregate window)
    run_both(con, """
SELECT o_custkey,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
       CAST(RANK() OVER (ORDER BY SUM(CAST(ROUND(o_totalprice * 100)
            AS BIGINT)) DESC) AS BIGINT) AS spend_rank
FROM orders GROUP BY o_custkey""")
    run_both(con, """
SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id
            ORDER BY COUNT(*) DESC, event_type) AS BIGINT) AS rn,
       CAST(DENSE_RANK() OVER (PARTITION BY user_id
            ORDER BY COUNT(*) DESC) AS BIGINT) AS dr
FROM events GROUP BY user_id, event_type""")


def test_compiled_q3_matches_handbuilt_oracle(con):
    from sous_chef_ray.queries import _Q3_SQL

    run_both(con, _Q3_SQL)


def test_compiled_tpch_q5_q6_q10(con):
    """The hand-built TPC-H plans' own oracle SQL strings run through
    the compiler: Q5 (comma-join star), Q6 (scan-only), Q10 (derived
    table + joins + ORDER/LIMIT)."""
    import duckdb as _d

    from sous_chef_ray.queries import _Q5_SQL, _Q6_SQL, _Q10_SQL

    con.execute(f"CREATE VIEW IF NOT EXISTS supplier AS SELECT * FROM "
                f"read_parquet('{SF}/supplier.parquet')")
    for sql in (_Q5_SQL, _Q6_SQL, _Q10_SQL):
        run_both(con, sql)


def test_left_join_on_right_predicate(con):
    """LEFT JOIN ON-predicates owned by the right side filter BEFORE the
    join (left rows preserved) — both physical paths."""
    import ray.data as rd
    from sous_chef_ray.sqlexec import sql_execute as ex

    sql = ("SELECT c.c_name, o.o_orderkey, o.o_totalprice "
           "FROM customer c LEFT JOIN orders o "
           "ON c.c_custkey = o.o_custkey AND o.o_totalprice > 400000")
    run_both(con, sql)  # broadcast path
    got = ex(sql, SF, broadcast_rows=0)  # hash path
    got = got.to_pandas() if isinstance(got, rd.Dataset) else got
    exp = con.execute(sql).df()
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    e = exp[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(g, e, check_dtype=True)


def run_both_paths(con, sql: str) -> None:
    """Assert the compiled plan matches DuckDB on BOTH physical join
    paths (dim broadcast and hash shuffle)."""
    import ray.data as rd
    from sous_chef_ray.sqlexec import sql_execute as ex

    exp = con.execute(sql).df()
    for kw in ({}, {"broadcast_rows": 0}):
        got = ex(sql, SF, **kw)
        got = got.to_pandas() if isinstance(got, rd.Dataset) else got
        cols = sorted(got.columns)
        assert cols == sorted(exp.columns), (kw, cols, sorted(exp.columns))
        g = got[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
        e = exp[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
        pd.testing.assert_frame_equal(g, e, check_dtype=False)


def test_left_join_same_named_key_null_extends(con):
    """ADVICE r5 (high): with same-named equi-keys, the right side's key
    must null-extend independently of the left's — `b.k IS NULL` is the
    SQL anti-join idiom and must NOT be answered from the left key."""
    run_both_paths(con, (
        "SELECT a.k FROM (SELECT o_custkey AS k FROM orders) a "
        "LEFT JOIN (SELECT c_custkey AS k FROM customer "
        "           WHERE c_custkey < 50) b "
        "ON a.k = b.k WHERE b.k IS NULL"))
    run_both_paths(con, (
        "SELECT a.k AS ak, b.k AS bk "
        "FROM (SELECT o_custkey AS k FROM orders) a "
        "LEFT JOIN (SELECT c_custkey AS k FROM customer "
        "           WHERE c_custkey < 50) b ON a.k = b.k"))


def test_left_join_residual_on_dropped_right_key(con):
    """ADVICE r5 (medium): residual WHERE conjuncts naming a right key
    the physical join dropped must be rewritten to its keep-alive copy."""
    run_both_paths(con, (
        "SELECT c.c_custkey FROM customer c LEFT JOIN "
        "(SELECT o_orderkey, o_custkey FROM orders "
        " WHERE o_custkey < 50) o "
        "ON c.c_custkey = o.o_custkey WHERE o.o_custkey IS NULL"))


def test_in_subquery_with_null_projected(con):
    """ADVICE r5 (low): non-negated IN over a key set containing NULL is
    three-valued — a non-match projects as NULL, not FALSE."""
    run_both_paths(con, (
        "SELECT o_orderkey, o_custkey IN "
        "(SELECT CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_custkey END "
        " AS k FROM customer) AS f FROM orders"))


def test_global_count_star_no_where(con):
    """Global COUNT(*) with no GROUP BY and no WHERE needs zero input
    columns; the plan must keep one scan column so Arrow blocks carry
    their row count through Ray (zero-column blocks lose it)."""
    run_both(con, "SELECT COUNT(*) AS n FROM part")
    run_both(con, ("SELECT COUNT(*) AS n FROM "
                   "(SELECT o_custkey FROM orders "
                   " WHERE o_totalprice > 100000) t"))


def test_global_aggregate_empty_input(con):
    """Global aggregate over zero rows still yields exactly one row:
    COUNT = 0, SUM/AVG/MIN/MAX = NULL."""
    run_both(con, ("SELECT COUNT(*) AS n, SUM(l_quantity) AS s, "
                   "AVG(l_discount) AS a, MAX(l_tax) AS mx "
                   "FROM lineitem WHERE l_quantity < -5"))


def test_named_window_clause(con):
    """WINDOW w AS (...) named windows: `OVER w` references resolve to
    the clause's spec (multiple windows, frames, and QUALIFY use)."""
    run_both(con, (
        "SELECT event_id, LAG(value) OVER w AS prev_v, "
        "LEAD(value) OVER w AS next_v "
        "FROM events WINDOW w AS (PARTITION BY user_id "
        "ORDER BY ts, event_id)"))
    run_both(con, (
        "SELECT o_orderkey, SUM(o_totalprice) OVER w1 AS run_sum, "
        "ROW_NUMBER() OVER w2 AS rn FROM orders "
        "WINDOW w1 AS (PARTITION BY o_custkey "
        "ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING), "
        "w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"))
    run_both(con, (
        "SELECT o_custkey, o_orderkey FROM orders "
        "WINDOW w AS (PARTITION BY o_custkey "
        "ORDER BY o_totalprice DESC, o_orderkey) "
        "QUALIFY ROW_NUMBER() OVER w <= 2"))


def test_rank_multi_key_order(con):
    """RANK/DENSE_RANK over several ORDER BY keys (peers = rows equal on
    ALL keys), including mixed ASC/DESC directions."""
    run_both(con, (
        "SELECT l_orderkey, l_linenumber, "
        "RANK() OVER (PARTITION BY l_orderkey "
        "ORDER BY l_returnflag, l_linestatus) AS rk, "
        "DENSE_RANK() OVER (PARTITION BY l_orderkey "
        "ORDER BY l_returnflag, l_linestatus) AS drk FROM lineitem"))
    run_both(con, (
        "SELECT o_orderkey, RANK() OVER w AS rk FROM orders "
        "WINDOW w AS (PARTITION BY o_custkey "
        "ORDER BY o_orderdate DESC, o_orderpriority)"))


def test_ntile_pct_multi_key_order(con):
    """NTILE / PERCENT_RANK / CUME_DIST over several ORDER BY keys.
    NTILE gets a TOTAL order (tie placement is engine-dependent
    otherwise); the peer-based pr/cd are deterministic under ties."""
    run_both(con, (
        "SELECT l_orderkey, l_linenumber, NTILE(3) OVER w AS nt "
        "FROM lineitem WINDOW w AS (PARTITION BY l_orderkey "
        "ORDER BY l_returnflag, l_linenumber)"))
    run_both(con, (
        "SELECT l_orderkey, l_linenumber, PERCENT_RANK() OVER w AS pr, "
        "CUME_DIST() OVER w AS cd "
        "FROM lineitem WINDOW w AS (PARTITION BY l_orderkey "
        "ORDER BY l_returnflag, l_linestatus)"))


def test_named_window_unknown_name():
    from sous_chef_ray.sqlexec import parse_sql

    with pytest.raises(ValueError, match="unknown window name"):
        parse_sql("SELECT ROW_NUMBER() OVER nope AS rn FROM orders "
                  "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)")


def test_global_count_distinct(con):
    """Global COUNT(DISTINCT x) — no GROUP BY keys — buckets on the
    constant group key instead of crashing partition_apply, including
    mixed with plain aggregates and over empty input (→ 0)."""
    run_both(con, "SELECT COUNT(DISTINCT o_custkey) AS n FROM orders")
    run_both(con, ("SELECT COUNT(*) AS n, COUNT(DISTINCT o_custkey) AS d "
                   "FROM orders"))
    run_both(con, ("SELECT COUNT(DISTINCT o_custkey) AS d FROM orders "
                   "WHERE o_totalprice < -1"))


def test_global_quantile_empty_input(con):
    """ADVICE r5 (low): global quantile over zero rows returns NULL like
    SUM/AVG instead of raising IndexError."""
    run_both(con, ("SELECT MEDIAN(l_quantity) AS m FROM lineitem "
                   "WHERE l_quantity < 0"))


def test_rank_window_null_partition_key(con):
    """ADVICE r5 (low): PARTITION BY groups NULL keys together — the
    pandas NaN != NaN row-change detector must not split them."""
    run_both_paths(con, (
        "SELECT CASE WHEN n_regionkey = 0 THEN NULL ELSE n_regionkey END "
        "AS rk, n_nationkey, COUNT(*) AS n, "
        "RANK() OVER (PARTITION BY CASE WHEN n_regionkey = 0 THEN NULL "
        "ELSE n_regionkey END ORDER BY n_nationkey) AS r "
        "FROM nation GROUP BY 1, 2"))


def test_qualify_topk_and_rank(con):
    """QUALIFY (round-5): ROW_NUMBER <= k takes the topk_per_group fast
    path; RANK = 1 keeps ties via the general compute-then-filter path.
    Same string runs in DuckDB."""
    run_both(con, (
        "SELECT o_custkey, o_orderkey, o_totalprice FROM orders "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey "
        "ORDER BY o_totalprice DESC, o_orderkey) <= 3"))
    run_both(con, (
        "SELECT o_custkey, o_orderkey FROM orders "
        "QUALIFY RANK() OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderdate) = 1"))


def test_multi_distinct_aggregates(con):
    """Any number of COUNT/SUM/AVG(DISTINCT x) per query (round-5);
    aggs sharing an argument share one distinct-reduce pass. Integer
    casts keep SUM/AVG exact on both sides."""
    run_both(con, (
        "SELECT l_returnflag, "
        "COUNT(DISTINCT l_suppkey) AS n_supp, "
        "COUNT(DISTINCT l_partkey) AS n_part, "
        "CAST(SUM(DISTINCT CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) "
        "AS sum_qty_d, "
        "AVG(DISTINCT CAST(ROUND(l_quantity) AS BIGINT)) AS avg_qty_d, "
        "CAST(COUNT(*) AS BIGINT) AS n "
        "FROM lineitem GROUP BY l_returnflag"))
    # global (no GROUP BY) variant
    run_both(con, (
        "SELECT COUNT(DISTINCT user_id) AS n_users, "
        "CAST(SUM(DISTINCT CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) "
        "AS sum_cents_d FROM events WHERE event_type = 'click'"))


def test_sum_distinct_all_null_group_is_null(con):
    """SUM(DISTINCT x) over a group with zero non-null values is NULL."""
    run_both(con, (
        "SELECT user_id, "
        "SUM(DISTINCT CASE WHEN event_type = 'no_such_type' "
        "THEN CAST(ROUND(value) AS BIGINT) END) AS s "
        "FROM events GROUP BY user_id"))


def test_qualify_over_aggregate(con):
    """QUALIFY over GROUP BY results (round-5): rank-family windows
    evaluate on the bounded post-aggregate table, after HAVING; the
    QUALIFY predicate filters before projection."""
    run_both(con, (
        "SELECT o_custkey, "
        "CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
        "AS cents, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM orders GROUP BY o_custkey "
        "QUALIFY ROW_NUMBER() OVER (ORDER BY "
        "CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
        "DESC, o_custkey) <= 10"))
    # window only referenced in QUALIFY + HAVING interaction
    run_both(con, (
        "SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus "
        "HAVING COUNT(*) > 10 "
        "QUALIFY RANK() OVER (PARTITION BY l_returnflag "
        "ORDER BY COUNT(*) DESC) = 1"))


def test_rollup_cube_grouping_sets(con):
    """GROUP BY ROLLUP / CUBE / GROUPING SETS compile (round-5): one
    finest-grain aggregate, bounded per-set re-aggregation, GROUPING()
    indicators, rolled-up keys → NULL; HAVING applies per output row."""
    run_both(con, (
        "SELECT l_returnflag, l_linestatus, "
        "CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty, "
        "CAST(COUNT(*) AS BIGINT) AS n, "
        "GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls "
        "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"))
    run_both(con, (
        "SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) "
        "AS min_cents, "
        "CAST(MAX(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) "
        "AS max_cents "
        "FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"))
    run_both(con, (
        "SELECT o_orderstatus, o_orderpriority, "
        "CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
        "AS cents, AVG(CAST(ROUND(o_totalprice * 100) AS BIGINT)) "
        "AS avg_cents FROM orders GROUP BY GROUPING SETS "
        "((o_orderstatus, o_orderpriority), (o_orderstatus), ())"))
    # HAVING filters the per-set output rows (grand total included)
    run_both(con, (
        "SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus) "
        "HAVING COUNT(*) > 100"))


def test_correlated_scalar_subquery(con):
    """Correlated scalar aggregate subqueries (round-5) decorrelate into
    a LEFT-joined per-key pre-aggregate: SELECT-list MAX, COUNT with the
    0-not-NULL empty-group rule, and the TPC-H Q17 WHERE-clause shape."""
    run_both(con, (
        "SELECT c_custkey, "
        "(SELECT CAST(MAX(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) "
        "AS BIGINT) FROM orders o WHERE o.o_custkey = c.c_custkey) "
        "AS max_cents FROM customer c"))
    # inner-only predicate leaves some customers with zero matches:
    # COUNT must yield 0 there, not NULL
    run_both(con, (
        "SELECT c_custkey, "
        "(SELECT COUNT(*) AS n FROM orders o "
        "WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000) "
        "AS n_big FROM customer c"))
    run_both(con, (
        "SELECT l_orderkey, l_partkey, l_quantity FROM lineitem l "
        "WHERE l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity) "
        "FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)"))


def test_grouping_sets_reject_distinct(con):
    """DISTINCT / quantile aggregates cannot re-aggregate from the
    finest grain — clear error instead of wrong numbers."""
    with pytest.raises(ValueError, match="ROLLUP / CUBE / GROUPING SETS"):
        sql_execute(
            "SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n "
            "FROM lineitem GROUP BY ROLLUP (l_returnflag)", SF)


def test_time_range_frame(con):
    """RANGE BETWEEN INTERVAL n PRECEDING AND CURRENT ROW (round-5):
    searchsorted rolling kernel; integer-cents for exactness."""
    run_both(con, (
        "SELECT event_id, user_id, "
        "CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER ("
        "PARTITION BY user_id ORDER BY ts "
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) "
        "AS BIGINT) AS r1h_cents, "
        "CAST(COUNT(value) OVER (PARTITION BY user_id ORDER BY ts "
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) "
        "AS BIGINT) AS r1h_n FROM events"))


def test_last_value_default_and_rows_frames(con):
    """LAST_VALUE no longer raises under the default frame; the three
    supported frames all match DuckDB (unique ORDER BY)."""
    for frame in ("",
                  " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
                  " ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED "
                  "FOLLOWING",
                  " RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"):
        run_both(con, (
            "SELECT o_orderkey, LAST_VALUE(o_orderkey) OVER ("
            "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey"
            f"{frame}) AS lv FROM orders"))


def test_last_value_peers_with_ties(ray_session):
    """Tie-heavy peers case, pinned engine-side (SQL engines disagree on
    WHICH peer row supplies the value when the argument varies within a
    peer group, so the DuckDB oracle uses unique ORDER BY instead):
    every row in a peer group gets the group's LAST row's value under
    the bucket sort, and peer groups never leak across ORDER BY values."""
    import ray.data as rd

    from sous_chef_ray.stages.window import with_last_value_peers

    t = pa.table({
        "k": [1, 1, 1, 1, 2, 2],
        "o": [10, 10, 20, 20, 10, 30],
        "v": [100, 101, 200, 201, 300, 301],
    })
    out = with_last_value_peers(
        rd.from_arrow(t), "k", "o", "v", name="lv", num_buckets=2
    ).to_pandas().sort_values(["k", "o", "v"]).reset_index(drop=True)
    # peers (k=1, o=10) → last row of that run; runs don't cross o=20
    assert list(out["lv"]) == [101, 101, 201, 201, 300, 301]


def test_select_star_in_derived_tables(con):
    """Round-5: SELECT * expands inside derived tables (schema from the
    parquet file, recursively). Top-level SELECT * stays REJECTED — the
    reference validator's golden behavior (validators.py `+-*/` rule)."""
    run_both(con, (
        "SELECT o.o_orderkey, o.o_totalprice FROM "
        "(SELECT * FROM orders WHERE o_totalprice > 300000) o"))
    run_both(con, (
        "SELECT o.o_orderkey, c.c_name FROM "
        "(SELECT * FROM orders WHERE o_totalprice > 300000) o "
        "JOIN customer c ON o.o_custkey = c.c_custkey"))
    with pytest.raises(ValueError):
        sql_execute("SELECT * FROM orders", SF)  # validator conformance


def test_aggregate_filter_clause(con):
    """Round-5: FILTER (WHERE ...) on aggregates — exact desugar to
    CASE-wrapped arguments (null-skipping aggregates + COUNT DISTINCT)."""
    run_both(con, (
        "SELECT o_orderstatus, "
        "CAST(COUNT(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT) "
        "AS n_big, "
        "MAX(o_totalprice) FILTER (WHERE o_orderkey % 2 = 0) AS max_even, "
        "CAST(COUNT(DISTINCT o_custkey) "
        "FILTER (WHERE o_totalprice > 100000) AS BIGINT) AS nd "
        "FROM orders GROUP BY o_orderstatus"))
    with pytest.raises(ValueError):
        sql_execute("SELECT UPPER(o_orderstatus) "
                    "FILTER (WHERE o_orderkey > 1) AS u FROM orders", SF)


def test_desc_order_windows(con):
    """Round-5: all-DESC ORDER BY compiles for LAG/LEAD (flip to the
    opposite shift over ASC), FIRST/LAST_VALUE partition-head frames,
    and moving ROWS frames (frame bounds swap) — unique ORDER BY keys so
    both engines are deterministic."""
    run_both(con, (
        "SELECT event_id, LAG(value) OVER (PARTITION BY user_id "
        "ORDER BY ts DESC, event_id DESC) AS prev_v, "
        "LEAD(value, 2) OVER (PARTITION BY user_id "
        "ORDER BY ts DESC, event_id DESC) AS next_v FROM events"))
    run_both(con, (
        "SELECT event_id, FIRST_VALUE(value) OVER (PARTITION BY user_id "
        "ORDER BY ts DESC, event_id DESC) AS newest, "
        "LAST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts DESC, "
        "event_id DESC ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED "
        "FOLLOWING) AS oldest FROM events"))
    run_both(con, (
        "SELECT event_id, CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) "
        "OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC "
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS mv "
        "FROM events"))


def test_count_star_moving_frames(con):
    """Round-5: COUNT(*) over moving ROWS and time-RANGE frames (a
    never-null ones column through the rolling kernels)."""
    run_both(con, (
        "SELECT event_id, CAST(COUNT(*) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) "
        "AS BIGINT) AS c3 FROM events"))
    run_both(con, (
        "SELECT event_id, CAST(COUNT(*) OVER (PARTITION BY user_id "
        "ORDER BY ts RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND "
        "CURRENT ROW) AS BIGINT) AS c1h FROM events"))


def test_intersect_except_set_ops(con):
    """Round-5: INTERSECT/EXCEPT [ALL] — tagged-count hash aggregate +
    multiset row expansion; INTERSECT binds tighter than UNION/EXCEPT
    (standard precedence)."""
    run_both(con, (
        "SELECT user_id AS u FROM events WHERE event_type = 'click' "
        "EXCEPT SELECT user_id AS u FROM events "
        "WHERE event_type = 'purchase' AND user_id < 5"))
    run_both(con, (
        "SELECT o_orderstatus AS s FROM orders WHERE o_orderkey < 200 "
        "INTERSECT ALL SELECT o_orderstatus AS s FROM orders "
        "WHERE o_orderkey >= 200 AND o_orderkey < 260"))
    run_both(con, (
        "SELECT o_orderstatus AS s FROM orders WHERE o_orderkey < 200 "
        "EXCEPT ALL SELECT o_orderstatus AS s FROM orders "
        "WHERE o_orderkey >= 200 AND o_orderkey < 260"))
    run_both(con, (
        "SELECT user_id AS u FROM events WHERE event_type = 'view' UNION "
        "SELECT user_id AS u FROM events WHERE event_type = 'click' "
        "INTERSECT SELECT user_id AS u FROM events "
        "WHERE event_type = 'purchase' ORDER BY u LIMIT 30"))


def test_qualified_star(con):
    """Round-5: `t.*` expands to exactly that relation's columns — legal
    over joins (unambiguous, unlike bare `*` under the same-named-key
    collapse) and over derived tables."""
    run_both(con, (
        "SELECT n.*, c.c_name FROM customer c "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "WHERE c.c_custkey < 30"))
    run_both(con, (
        "SELECT t.* FROM (SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_totalprice > 300000) t"))
    with pytest.raises(ValueError):
        sql_execute("SELECT o.o_orderkey AS k1, c.c_custkey AS k2 FROM "
                    "orders o JOIN customer c ON o.o_custkey = c.c_custkey "
                    "UNION SELECT * FROM orders o JOIN customer c "
                    "ON o.o_custkey = c.c_custkey", SF)


def test_limit_offset(con):
    """Round-5: LIMIT n OFFSET m on all three execution paths — an
    order-preserving bounded gather of m+n rows; OFFSET without ORDER BY
    is rejected (nondeterministic)."""
    run_both(con, (
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 7"))
    run_both(con, (
        "SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n FROM orders "
        "GROUP BY o_custkey ORDER BY o_custkey LIMIT 5 OFFSET 3"))
    run_both(con, (
        "SELECT o_orderkey, ROW_NUMBER() OVER (PARTITION BY o_custkey "
        "ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders "
        "ORDER BY o_orderkey LIMIT 8 OFFSET 4"))
    with pytest.raises(ValueError):
        sql_execute("SELECT o_orderkey FROM orders LIMIT 5 OFFSET 2", SF)


def test_order_by_select_alias(con):
    """Round-5: ORDER BY may name a SELECT-item alias (output column,
    not base column) on aggregate and projection paths."""
    run_both(con, (
        "SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n FROM orders "
        "GROUP BY o_custkey ORDER BY n DESC, o_custkey LIMIT 5 OFFSET 3"))
    run_both(con, (
        "SELECT o_orderkey, o_totalprice * 2 AS dbl FROM orders "
        "ORDER BY dbl DESC, o_orderkey LIMIT 6"))


def test_scalar_subquery_auto_alias(con):
    """Round-5: `(SELECT AVG(x) FROM …)` without an alias auto-aliases —
    the TPC-H Q22 shape (scalar threshold inside a derived table)."""
    run_both(con, (
        "SELECT c_custkey, c_acctbal FROM customer "
        "WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer "
        "WHERE c_acctbal > 0.00)"))


def test_group_by_select_alias(con):
    """Round-5: GROUP BY may name a SELECT-item alias (the DuckDB /
    Snowflake extension, mirroring the ORDER BY alias rule); a name that
    is also a base column still resolves to the base column."""
    run_both(con, (
        "SELECT SUBSTRING(c_name, 17, 2) AS code, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM customer "
        "GROUP BY code ORDER BY code"))
    run_both(con, (
        "SELECT CAST(p_size AS BIGINT) AS sz, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM part GROUP BY sz ORDER BY sz"))


def test_empty_grouped_aggregate_keeps_schema(con):
    """Round-5 regression: Ray's hash aggregate over an EMPTY stream
    returns a zero-COLUMN table; the compiler must rebuild the expected
    group-key + aggregate schema (the sf0.001 TPC-H Q22 shape, where the
    derived table filters to zero rows)."""
    import ray.data as rd

    # plain aggregate path
    sql = ("SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n, "
           "CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
           "AS cents FROM orders WHERE o_totalprice < -1 "
           "GROUP BY o_orderstatus")
    got = sql_execute(sql, SF)
    if isinstance(got, rd.Dataset):
        got = got.to_pandas()
    assert len(got) == 0
    assert sorted(got.columns) == ["cents", "n", "o_orderstatus"]
    # distinct-aggregate and quantile merge paths over the empty stream
    sql2 = ("SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS nd, "
            "MEDIAN(o_totalprice) AS med FROM orders "
            "WHERE o_totalprice < -1 GROUP BY o_orderstatus")
    got2 = sql_execute(sql2, SF)
    if isinstance(got2, rd.Dataset):
        got2 = got2.to_pandas()
    assert len(got2) == 0
    assert sorted(got2.columns) == ["med", "nd", "o_orderstatus"]


def test_exists_neq_correlation(con):
    """Round-5: EXISTS with `inner <> outer` on top of the equality
    correlation (TPC-H Q21 shape) decorrelates to a per-key (min, max)
    broadcast — exists iff the key matches and min <> v OR max <> v."""
    run_both(con, (
        "SELECT l1.l_orderkey, l1.l_suppkey FROM lineitem l1 "
        "WHERE EXISTS (SELECT 1 FROM lineitem l2 "
        "WHERE l2.l_orderkey = l1.l_orderkey "
        "AND l2.l_suppkey <> l1.l_suppkey) "
        "AND l1.l_quantity > 48"))
    # NOT EXISTS + an inner-only predicate filtering before the min/max
    run_both(con, (
        "SELECT l1.l_orderkey, l1.l_linenumber FROM lineitem l1 "
        "WHERE NOT EXISTS (SELECT 1 FROM lineitem l2 "
        "WHERE l2.l_orderkey = l1.l_orderkey "
        "AND l2.l_suppkey <> l1.l_suppkey AND l2.l_quantity > 30) "
        "AND l1.l_quantity > 48"))


def test_exists_neq_requires_equality(con):
    from sous_chef_ray.sqlexec import sql_execute as ex

    with pytest.raises(ValueError, match="equality correlation"):
        ex("SELECT l1.l_orderkey FROM lineitem l1 "
           "WHERE EXISTS (SELECT 1 FROM lineitem l2 "
           "WHERE l2.l_suppkey <> l1.l_suppkey)", SF)
