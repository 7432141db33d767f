"""Conformance tests for SQL schema inference, mirroring the reference's
goldens (reference: tests/test_sql_sources.py, test_snowflake_sources.py,
test_teradata_sources.py, test_spark_emr_sources.py)."""

import pytest

from sous_chef_ray.sqlschema import (
    SnowflakeSource,
    SparkSqlEmrSource,
    SQLSource,
    SQLSourceRegistry,
    SQLValidator,
    TeradataSource,
)


def test_registry():
    assert SQLSourceRegistry.get_source_class("snowflake").__name__ == "SnowflakeSource"
    assert SQLSourceRegistry.get_source_class("teradata").__name__ == "TeradataSource"
    assert SQLSourceRegistry.get_source_class("spark_sql_emr").__name__ == "SparkSqlEmrSource"
    assert SQLSourceRegistry.get_source_class("invalid") is None


def test_registry_config_validation():
    assert not SQLSourceRegistry.validate_config(
        "snowflake", {"query": "SELECT * FROM table", "timestamp_field": "ts"}
    )
    errs = SQLSourceRegistry.validate_config("bogus", {})
    assert errs == ["Unsupported SQL provider: bogus"]
    errs = SQLSourceRegistry.validate_config(
        "snowflake", {"query": "WITH t AS (SELECT 1) SELECT * FROM t"}
    )
    assert errs == ["CTEs (WITH clauses) are not supported"]
    errs = SQLSourceRegistry.validate_config("snowflake", {})
    assert errs == ["Either 'query' or 'table' must be specified"]
    errs = SQLSourceRegistry.validate_config("snowflake", {"table": "t"})
    assert errs == ["Missing required field: timestamp_field"]


GOLDEN_QUERY = """
SELECT
    id,
    users.name,
    orders.status,
    COUNT(*) AS order_count,
    SUM(amount) AS total,
    CASE WHEN amount > 100 THEN 'high' ELSE 'low' END AS category
FROM orders"""


def test_schema_inference_golden():
    schema = SQLSource().infer_schema(GOLDEN_QUERY)
    assert [s["name"] for s in schema] == [
        "ID", "NAME", "STATUS", "ORDER_COUNT", "TOTAL", "CATEGORY",
    ]
    types = {s["name"]: s["dtype"] for s in schema}
    assert types["ORDER_COUNT"] == "INT64"
    assert types["TOTAL"] == "FLOAT"
    assert types["CATEGORY"] == "STRING"
    assert types["ID"] == "STRING"


def test_schema_inference_errors():
    src = SQLSource()
    with pytest.raises(ValueError, match="CTEs .* not supported"):
        src.infer_schema("WITH t AS (SELECT id FROM users)\nSELECT * FROM t")
    with pytest.raises(ValueError, match="Query must contain FROM clause"):
        src.infer_schema("SELECT id, name")
    with pytest.raises(ValueError, match="Invalid SELECT statement"):
        src.infer_schema("SELECT id; name FROM users")


def test_aliasless_expressions_dropped():
    q = """
    SELECT
        id,
        orders.status,
        COUNT(*),
        SUM(amount),
        CASE WHEN amount > 100 THEN 'high' ELSE 'low' END
    FROM orders
    GROUP BY id, orders.status"""
    schema = SQLSource().infer_schema(q)
    assert sorted(s["name"] for s in schema) == ["ID", "STATUS"]


def test_parse_column_goldens():
    src = SQLSource()
    assert src._parse_column("customer_id") == ("CUSTOMER_ID", "CUSTOMER_ID")
    assert src._parse_column("orders.status") == ("STATUS", "ORDERS.STATUS")
    assert src._parse_column("public.users.email") == ("EMAIL", "PUBLIC.USERS.EMAIL")
    assert src._parse_column("COUNT(*)") == (None, "COUNT(*)")
    assert src._parse_column("user_id + 1") == (None, "USER_ID + 1")
    assert src._parse_column("orders.status AS order_status") == ("ORDER_STATUS", "ORDERS.STATUS")
    assert src._parse_column("COUNT(*) AS total_orders") == ("TOTAL_ORDERS", "COUNT(*)")
    assert src._parse_column(
        "CASE WHEN amount > 100 THEN 'high' ELSE 'low' END AS category"
    ) == ("CATEGORY", "CASE WHEN AMOUNT > 100 THEN 'HIGH' ELSE 'LOW' END")


def test_validate_query_rejects_star_and_cte():
    src = SQLSource()
    assert not src.validate_query("SELECT * FROM t")
    assert not src.validate_query("WITH x AS (SELECT 1) SELECT a FROM x")
    assert src.validate_query("SELECT\n  a,\n  b\nFROM t")
    # reference quirk preserved: single-line comma queries get comma-split
    # into lines, so the FROM clause lands mid-line and validation fails
    # (reference: sql_sources.py:19-21)
    assert not src.validate_query("SELECT a, b FROM t")


def test_dialect_type_maps():
    sf = SnowflakeSource()
    assert sf._map_snowflake_type("NUMBER") == "FLOAT"
    assert sf._map_snowflake_type("ARRAY") == "STRING"
    assert sf._map_snowflake_type("VARIANT") == "STRING"
    assert sf._map_snowflake_type("mystery") == "STRING"

    td = TeradataSource()
    assert td._map_teradata_type("INTEGER") == "INT64"
    assert td._map_teradata_type("DECIMAL(10,2)") == "FLOAT"
    assert td._map_teradata_type("TIMESTAMP") == "STRING"

    sp = SparkSqlEmrSource()
    assert sp._map_spark_type("INTEGER") == "INT64"
    assert sp._map_spark_type("DOUBLE") == "FLOAT"
    assert sp._map_spark_type("STRUCT") == "STRING"


def test_snowflake_filters_sys_columns():
    q = "SELECT\n  id,\n  sys_internal.x AS sys_flag\nFROM t"
    names = [s["name"] for s in SnowflakeSource().infer_schema(q)]
    assert names == ["ID"]


def test_teradata_permissive_validate():
    td = TeradataSource()
    assert td.validate_query("SELECT a, RANK() OVER (ORDER BY b) AS r FROM t")
    assert not td.validate_query("SELECT * FROM t")
    assert not td.validate_query("DELETE FROM t")


def test_sql_validator_list_flavor():
    errs = SQLValidator.validate_sql("SELECT COUNT(*) FROM t")
    assert any("Missing alias for aggregate function" in e for e in errs)
    assert SQLValidator.validate_sql("SELECT COUNT(*) AS n FROM t") == []
    assert SQLValidator.validate_sql("UPDATE t SET x=1") == [
        "Query must start with SELECT or WITH"
    ]
    errs = SQLValidator.validate_config({})
    assert "Missing required field: query" in errs
    assert "Missing required field: database" in errs
