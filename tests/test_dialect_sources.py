"""The reference's three per-dialect test suites ported wholesale —
same fixture queries, same golden assertions (reference:
tests/test_snowflake_sources.py, tests/test_teradata_sources.py,
tests/test_spark_emr_sources.py)."""

import pytest

from sous_chef_ray.sqlschema import (
    SnowflakeSource,
    SparkSqlEmrSource,
    SQLSourceRegistry,
    TeradataSource,
)

# --------------------------------------------------------------------------
# Snowflake (reference: tests/test_snowflake_sources.py)
# --------------------------------------------------------------------------

COMPLEX_SNOWFLAKE_QUERY = """
    WITH customer_stats AS (
        SELECT
            customer_id,
            COUNT(DISTINCT order_id) as order_count,
            SUM(amount) as total_spend,
            AVG(amount) as avg_order_value,
            PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY amount) as median_order,
            FIRST_VALUE(transaction_date) OVER (PARTITION BY customer_id ORDER BY transaction_date) as first_purchase,
            LAST_VALUE(transaction_date) OVER (PARTITION BY customer_id ORDER BY transaction_date) as last_purchase
        FROM transactions
        WHERE transaction_date >= DATEADD(month, -6, CURRENT_DATE())
        GROUP BY customer_id
    )
    SELECT cs.* FROM customer_stats cs
    """

NESTED_CTE_QUERY = """
    WITH user_metrics AS (
        WITH daily_stats AS (
            SELECT user_id,
                   DATE_TRUNC('day', event_ts) as day,
                   COUNT(*) as events
            FROM events
            GROUP BY user_id, DATE_TRUNC('day', event_ts)
        )
        SELECT user_id,
               AVG(events) as avg_daily_events
        FROM daily_stats
        GROUP BY user_id
    )
    SELECT u.user_id, u.avg_daily_events FROM user_metrics u
    """

SNOWFLAKE_ARRAY_AGG_QUERY = """
    SELECT
        user_id,
        ARRAY_AGG(DISTINCT category) WITHIN GROUP (ORDER BY category) as categories,
        ARRAY_AGG(OBJECT_CONSTRUCT('product', product_name, 'qty', quantity))
            as purchase_details
    FROM purchases
    GROUP BY user_id
    """


def test_snowflake_complex_query():
    """CTE query rejected with the reference's message (ref :83-91)."""
    config = {"query": COMPLEX_SNOWFLAKE_QUERY, "timestamp_field": "event_timestamp"}
    errors = SQLSourceRegistry.validate_config("snowflake", config)
    assert len(errors) > 0
    assert "CTEs (WITH clauses) are not supported" in errors[0]


def test_snowflake_nested_ctes():
    source = SnowflakeSource()
    with pytest.raises(ValueError, match="CTEs .* not supported"):
        source.infer_schema(NESTED_CTE_QUERY)


def test_snowflake_array_aggs():
    """Arrays stored as strings (ref :99-106)."""
    source = SnowflakeSource()
    schema = source.infer_schema(SNOWFLAKE_ARRAY_AGG_QUERY)
    features = [f["name"] for f in schema]
    assert "CATEGORIES" in features
    assert "PURCHASE_DETAILS" in features
    assert all(f["dtype"] == "STRING" for f in schema)


def test_snowflake_type_mapping():
    assert SnowflakeSource()._map_snowflake_type("NUMBER") == "FLOAT"


def test_snowflake_config_validation():
    assert not SQLSourceRegistry.validate_config(
        "snowflake", {"query": "SELECT * FROM table", "timestamp_field": "ts"}
    )
    assert not SQLSourceRegistry.validate_config(
        "snowflake", {"table": "my_table", "timestamp_field": "ts"}
    )
    errors = SQLSourceRegistry.validate_config(
        "snowflake", {"query": "SELECT * FROM table"}
    )
    assert len(errors) == 1
    assert "timestamp_field" in errors[0]


def test_snowflake_query_validation():
    source = SnowflakeSource()
    assert not source.validate_query("SELECT * FROM table")
    assert not source.validate_query("WITH cte AS (...) SELECT * FROM cte")


# --------------------------------------------------------------------------
# Teradata (reference: tests/test_teradata_sources.py)
# --------------------------------------------------------------------------

COMPLEX_TERADATA_QUERY = """
    SELECT
        ds.date_key,
        cm.customer_id,
        cm.segment_code,
        SUM(ZEROIFNULL(t.daily_transactions)) as transaction_count,
        SUM(ZEROIFNULL(t.daily_amount)) as daily_amount,
        MAX(cm.segment_rank) as customer_rank
    FROM (
        SELECT CAST('2023-01-01' AS DATE) as date_key
        UNION ALL
        SELECT date_key + INTERVAL '1' DAY
        FROM date_spine
        WHERE date_key < CAST('2024-01-01' AS DATE)
    ) ds
    CROSS JOIN (
        SELECT
            c.customer_id,
            c.segment_code,
            RANK() OVER (PARTITION BY c.segment_code ORDER BY t.total_amount DESC) as segment_rank
        FROM customer_dim c
    ) cm
    GROUP BY ds.date_key, cm.customer_id, cm.segment_code
    """

SIMPLE_TERADATA_QUERY = """
SELECT
    customer_id,
    COUNT(*) AS order_count,
    SUM(amount) AS total_amount,
    MAX(order_date) AS last_order
FROM orders
GROUP BY customer_id"""

WINDOW_TERADATA_QUERY = """
    SELECT
        customer_id,
        order_date,
        amount,
        AVG(amount) OVER (PARTITION BY customer_id ORDER BY order_date
            ROWS BETWEEN 30 PRECEDING AND CURRENT ROW) as moving_avg_amount,
        RANK() OVER (PARTITION BY customer_id ORDER BY amount DESC) as amount_rank
    FROM orders
    """


def test_teradata_complex_query():
    config = {"query": COMPLEX_TERADATA_QUERY, "timestamp_field": "transaction_date"}
    assert not SQLSourceRegistry.validate_config("teradata", config)


def test_teradata_table_source():
    config = {"table": "transactions", "timestamp_field": "event_timestamp"}
    assert not SQLSourceRegistry.validate_config("teradata", config)


def test_teradata_query_features():
    """Schema golden over the derived-table query (ref :89-98)."""
    schema = TeradataSource().infer_schema(COMPLEX_TERADATA_QUERY)
    features = {f["name"] for f in schema}
    assert features == {
        "DATE_KEY", "CUSTOMER_ID", "SEGMENT_CODE",
        "TRANSACTION_COUNT", "DAILY_AMOUNT", "CUSTOMER_RANK",
    }


def test_teradata_simple_query():
    schema = TeradataSource().infer_schema(SIMPLE_TERADATA_QUERY)
    features = [f["name"] for f in schema]
    assert "ORDER_COUNT" in features
    assert "TOTAL_AMOUNT" in features
    assert "LAST_ORDER" in features


def test_teradata_window_functions():
    """Window-function inference goldens incl. dtypes (ref :109-121)."""
    schema = TeradataSource().infer_schema(WINDOW_TERADATA_QUERY)
    features = {f["name"] for f in schema}
    assert features == {
        "CUSTOMER_ID", "ORDER_DATE", "AMOUNT", "MOVING_AVG_AMOUNT", "AMOUNT_RANK",
    }
    types = {f["name"]: f["dtype"] for f in schema}
    assert types["AMOUNT_RANK"] == "INT64"      # RANK() returns INT64
    assert types["MOVING_AVG_AMOUNT"] == "FLOAT"  # AVG() returns FLOAT


def test_teradata_type_mapping():
    """Full type-map golden incl. DECIMAL(10,2) base extraction (ref :123-132)."""
    source = TeradataSource()
    assert source._map_teradata_type("INTEGER") == "INT64"
    assert source._map_teradata_type("DECIMAL(10,2)") == "FLOAT"
    assert source._map_teradata_type("VARCHAR(255)") == "STRING"
    assert source._map_teradata_type("DATE") == "STRING"
    assert source._map_teradata_type("TIMESTAMP") == "STRING"
    assert source._map_teradata_type("NUMBER") == "FLOAT"
    assert source._map_teradata_type("UNKNOWN_TYPE") == "STRING"


def test_teradata_invalid_query():
    source = TeradataSource()
    with pytest.raises(ValueError, match="Query must start with SELECT"):
        source.infer_schema("INVALID SQL SYNTAX")
    with pytest.raises(ValueError, match="Query must contain FROM clause"):
        source.infer_schema("SELECT FROM")


def test_teradata_query_validation():
    source = TeradataSource()
    assert source.validate_query("SELECT customer_id FROM customers") == True  # noqa: E712
    assert not source.validate_query("SELECT FROM")
    assert not source.validate_query("INSERT INTO table")


# --------------------------------------------------------------------------
# Spark SQL EMR (reference: tests/test_spark_emr_sources.py)
# --------------------------------------------------------------------------

COMPLEX_SPARK_EMR_QUERY = """
    SELECT
        customer_id,
        COUNT(DISTINCT order_id) as order_count,
        SUM(amount) as total_spend,
        AVG(amount) as avg_order_value,
        FIRST_VALUE(transaction_date) OVER (PARTITION BY customer_id ORDER BY transaction_date) as first_purchase,
        SUM(amount) / NULLIF(COUNT(DISTINCT order_id), 0) as calculated_aov,
        CASE
            WHEN SUM(amount) > 1000 THEN 'HIGH'
            WHEN SUM(amount) > 500 THEN 'MEDIUM'
            ELSE 'LOW'
        END as customer_segment
    FROM transactions
    WHERE transaction_date >= DATEADD(month, -6, CURRENT_DATE())
    GROUP BY customer_id
    """

SPARK_ARRAY_AGG_QUERY = """
    SELECT
        user_id,
        COLLECT_LIST(DISTINCT category) as categories,
        COLLECT_LIST(NAMED_STRUCT('product', product_name, 'qty', quantity)) as purchase_details
    FROM purchases
    GROUP BY user_id
    """


def test_spark_emr_complex_query():
    config = {"query": COMPLEX_SPARK_EMR_QUERY, "timestamp_field": "event_timestamp"}
    assert not SQLSourceRegistry.validate_config("spark_sql_emr", config)


def test_spark_emr_nested_ctes():
    with pytest.raises(ValueError, match="CTEs .* not supported"):
        SparkSqlEmrSource().infer_schema(NESTED_CTE_QUERY)


def test_spark_emr_array_aggs():
    schema = SparkSqlEmrSource().infer_schema(SPARK_ARRAY_AGG_QUERY)
    features = [f["name"] for f in schema]
    assert "CATEGORIES" in features
    assert "PURCHASE_DETAILS" in features
    assert all(f["dtype"] == "STRING" for f in schema)


def test_spark_emr_type_mapping():
    source = SparkSqlEmrSource()
    assert source._map_spark_type("INTEGER") == "INT64"
    assert source._map_spark_type("DOUBLE") == "FLOAT"
    assert source._map_spark_type("STRING") == "STRING"


def test_spark_emr_config_validation():
    assert not SQLSourceRegistry.validate_config(
        "spark_sql_emr", {"query": "SELECT * FROM table", "timestamp_field": "ts"}
    )
    assert not SQLSourceRegistry.validate_config(
        "spark_sql_emr", {"table": "my_table", "timestamp_field": "ts"}
    )
    errors = SQLSourceRegistry.validate_config(
        "spark_sql_emr", {"query": "SELECT * FROM table"}
    )
    assert len(errors) == 1
    assert "timestamp_field" in errors[0]


def test_spark_emr_query_validation():
    source = SparkSqlEmrSource()
    assert not source.validate_query("SELECT * FROM table")
    assert not source.validate_query("WITH cte AS (...) SELECT * FROM cte")
