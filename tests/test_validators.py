"""Conformance tests for the validator surface, mirroring the reference's
test strategy (reference: tests/test_validators.py — invalid/valid SQL
goldens :4-62, feature-service error strings :165-228, tag matrices
:230-431)."""

from sous_chef_ray.validators import ConfigValidator, SQLValidator

INVALID_SQL = [
    """
SELECT
    customer_id,
    COUNT(*),
    SUM(amount) / 100,
    MAX(order_date)
FROM orders
GROUP BY customer_id""",
    """
SELECT
    orders.
FROM orders""",
    """
SELECT
    amount + tax,
    EXTRACT(month FROM date)
FROM orders""",
]

VALID_SQL = [
    """
    SELECT
        customer_id,
        orders.order_id,
        COUNT(*) as order_count,
        SUM(amount) as total_amount,
        amount + tax as total_with_tax,
        EXTRACT(month FROM date) as order_month
    FROM orders
    GROUP BY customer_id
    """,
    """
    SELECT
        t.product_id,
        COUNT(DISTINCT order_id) as order_count,
        AVG(amount) as avg_amount
    FROM transactions t
    GROUP BY t.product_id
    """,
]


def test_sql_validation_goldens():
    for q in INVALID_SQL:
        assert not SQLValidator.validate_sql(q), q
    for q in VALID_SQL:
        assert SQLValidator.validate_sql(q), q


def test_sql_config_validation():
    assert not SQLValidator.validate_config({"query": "SELECT * FROM table"})
    assert SQLValidator.validate_config(
        {
            "query": "SELECT id as customer_id FROM customers",
            "timestamp_field": "created_at",
            "database": "analytics",
        }
    )


_EMPTY_RULES = {
    "required_tags": {"global": [], "feature_view": [], "feature": [], "feature_service": []},
    "optional_tags": {"global": []},
}


def test_feature_service_error_strings():
    cases = [
        (
            {
                "feature_views": {"view1": {"source_name": "s", "entities": ["e"], "schema": []}},
                "feature_services": {"service1": {"description": "Test"}},
            },
            "Feature service 'service1' missing required field: features",
        ),
        (
            {
                "feature_views": {"view1": {"source_name": "s", "entities": ["e"], "schema": []}},
                "feature_services": {"service1": {"features": [], "description": "Test"}},
            },
            "Feature service 'service1' features list cannot be empty",
        ),
        (
            {
                "feature_views": {"view1": {"source_name": "s", "entities": ["e"], "schema": []}},
                "feature_services": {"service1": {"features": ["view1"], "tags": "invalid"}},
            },
            "Feature service 'service1' tags must be a dictionary",
        ),
    ]
    for config, expected in cases:
        errors = ConfigValidator(metadata_rules=_EMPTY_RULES).validate(config)
        assert any(expected in e for e in errors), (expected, errors)


def test_dangling_view_reference():
    config = {
        "feature_services": {"service1": {"features": ["nonexistent_view"]}},
        "feature_views": {},
    }
    errors = ConfigValidator.validate(config)
    assert any(
        "Feature service 'service1' references non-existent feature view: nonexistent_view" in e
        for e in errors
    )


def test_view_missing_fields():
    config = {"feature_views": {"v": {"entities": ["e"]}}}
    errors = ConfigValidator.validate(config)
    assert any("Feature view 'v' missing required fields" in e for e in errors)


def test_tag_matrix_default_rules():
    v = ConfigValidator()
    ok_cases = [
        ({"owner": "team1", "version": "1.0"}, "entity"),
        ({"owner": "t", "version": "1", "domain": "d", "team": "x"}, "feature_view"),
        ({"owner": "t", "version": "1", "status": "production", "SLA": "T+1"}, "feature_service"),
    ]
    for tags, ctx_type in ok_cases:
        assert v.validate_tags(tags, "ctx", ctx_type) == []

    assert v.validate_tags("not_a_dict", "ctx", "entity") == ["ctx: tags must be a dictionary"]
    errs = v.validate_tags({"version": "1.0"}, "ctx", "entity")
    assert any("missing required tags" in e and "owner" in e for e in errs)
    errs = v.validate_tags({"owner": "t", "version": "1", "bogus": "x"}, "ctx", "entity")
    assert any("unsupported tags found" in e and "bogus" in e for e in errs)


def test_custom_metadata_rules_full_config():
    custom = {
        "required_tags": {
            "global": ["owner", "version"],
            "feature_view": ["team", "domain"],
            "feature": ["description", "data_quality"],
            "feature_service": ["status", "SLA"],
        },
        "optional_tags": {"global": ["domain", "data_quality", "SLA", "team", "description", "status"]},
    }
    config = {
        "feature_views": {
            "test_view": {
                "source_name": "source1",
                "entities": ["entity1"],
                "schema": [
                    {
                        "name": "feature1",
                        "dtype": "INT64",
                        "tags": {
                            "owner": "o", "version": "1.0",
                            "description": "d", "data_quality": "verified",
                        },
                    }
                ],
                "tags": {"owner": "o", "version": "1.0", "team": "t", "domain": "d"},
            }
        },
        "feature_services": {
            "service1": {
                "features": ["test_view"],
                "tags": {"owner": "o", "version": "1.0", "status": "production", "SLA": "T+1"},
            }
        },
    }
    assert ConfigValidator(metadata_rules=custom).validate(config) == []
