"""SQL column parsing / schema inference / dialect type maps.

Behavioral parity with the reference's SQL-source surface (reference:
src/sous_chef/sql_sources.py — format validation :8-52, column split
:89-124, column parse :126-146, type inference :212-219, dialect maps
:221-313, registry :315-359), written from scratch around a small scanner.
Pinned goldens: tests/test_sql_sources.py (schema column lists, parse
tuples, error messages), CTE rejection strings.

The inferred logical types are INT64 / FLOAT / STRING; in this engine
they feed pyarrow schema construction (schema.fields_to_schema).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple, Type

_BAD_CHARS = (";", "`", "|")
_CTE_MSG = "CTEs (WITH clauses) are not supported"

_ALIAS_TRIGGERS = (
    "COUNT(", "SUM(", "AVG(", "MAX(", "MIN(",
    "RANK(", "ROW_NUMBER(",
    "CASE",
    "+", "-", "*", "/",
    "CONCAT(", "||",
    "COALESCE(", "NVL(",
    "CAST(", "CONVERT(",
)

_INT_FNS = ("COUNT(", "ROW_NUMBER(", "RANK(")
_FLOAT_FNS = ("SUM(", "AVG(", "MIN(", "MAX(")


def infer_expr_type(expr: str) -> str:
    """Expression → logical type: COUNT/ROW_NUMBER/RANK→INT64,
    SUM/AVG/MIN/MAX→FLOAT, everything else STRING."""
    up = expr.upper()
    if any(f in up for f in _INT_FNS):
        return "INT64"
    if any(f in up for f in _FLOAT_FNS):
        return "FLOAT"
    return "STRING"


def requires_alias(expr: str) -> bool:
    up = expr.upper()
    return any(t in up for t in _ALIAS_TRIGGERS)


def split_select_columns(select_part: str) -> List[str]:
    """Top-level comma split, aware of parens and CASE...END blocks."""
    text = " ".join(select_part.split())
    out: List[str] = []
    buf: List[str] = []
    depth = 0
    in_case = False
    for ch in text:
        if ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == "," and depth == 0 and not in_case:
            piece = "".join(buf).strip()
            if piece:
                out.append(piece)
            buf = []
        elif ch.isspace() and not buf:
            continue
        else:
            acc = "".join(buf).upper()
            if "CASE" in acc:
                in_case = True
                if "END" in acc:
                    in_case = False
            buf.append(ch)
    tail = "".join(buf).strip()
    if tail:
        out.append(tail)
    return [c.strip() for c in out if c.strip()]


def parse_column(col: str) -> Tuple[Optional[str], str]:
    """Column text → (alias-or-None, normalized expression), uppercased.

    Rules (pinned by reference tests/test_sql_sources.py:88-108):
    explicit AS wins; qualified a.b[.c] names alias to the last segment;
    bare identifiers alias to themselves; anything else needs an alias.
    """
    col = col.strip()
    up = col.upper()
    if " AS " in up:
        expr_part, _, alias_part = up.partition(" AS ")
        return alias_part.strip(), expr_part.strip()
    special = ("(", "CASE", "+", "-", "*", "/")
    if "." in col and not any(s in up for s in special):
        return col.split(".")[-1].strip().upper(), up.strip()
    if not any(s in up for s in special + (".", "OVER")):
        return up.strip(), up.strip()
    return None, up


class SQLSource:
    """Base SQL source: validates query shape and infers a schema."""

    def _validate_format(self, query: str) -> List[str]:
        """Return the lines between SELECT and FROM, or raise ValueError
        with the reference's exact messages."""
        query = query.strip()
        if any(c in query for c in _BAD_CHARS):
            raise ValueError("Invalid SELECT statement")
        if "\n" not in query and "," in query:
            query = "\n".join(query.split(","))
        if query.upper().startswith("WITH"):
            raise ValueError(_CTE_MSG)

        lines = [ln.strip() for ln in query.splitlines() if ln.strip()]
        if not lines:
            raise ValueError("Empty query")

        sel_at: Optional[int] = None
        from_at: Optional[int] = None
        for i, ln in enumerate(lines):
            up = ln.upper()
            if up.startswith("SELECT"):
                sel_at = i
            elif up.startswith("FROM"):
                from_at = i
                break
        if sel_at is None:
            raise ValueError("Query must start with SELECT")
        if from_at is None:
            raise ValueError("Query must contain FROM clause")
        return lines[sel_at:from_at]

    def _extract_select(self, lines: List[str]) -> str:
        parts = []
        for ln in lines:
            if ln.upper().startswith("SELECT"):
                ln = ln[6:].strip()
            parts.append(ln)
        return " ".join(parts).strip()

    def _clean_sql(self, sql: str) -> str:
        out = []
        for ln in sql.splitlines():
            if "--" in ln:
                ln = ln[: ln.index("--")]
            out.append(ln.strip())
        return " ".join(out)

    # expose module-level helpers as methods for API parity
    def _split_columns(self, select_part: str) -> List[str]:
        return split_select_columns(select_part)

    def _parse_column(self, col: str) -> Tuple[Optional[str], str]:
        return parse_column(col)

    def _requires_alias(self, expr: str) -> bool:
        return requires_alias(expr)

    def _infer_type(self, expr: str) -> str:
        return infer_expr_type(expr)

    def validate_query(self, query: str) -> bool:
        try:
            if "*" in query or "WITH" in query.upper():
                return False
            lines = self._validate_format(query)
            select_part = self._extract_select(lines)
            return bool(select_part and self._split_columns(select_part))
        except Exception:
            return False

    def infer_schema(self, query: str) -> List[Dict]:
        """Query → [{'name', 'dtype'}] dropping alias-less expressions."""
        try:
            stripped = query.strip().upper()
            if stripped.startswith("WITH"):
                raise ValueError(_CTE_MSG)
            if not stripped.startswith("SELECT"):
                raise ValueError("Query must start with SELECT")
            if "FROM" not in stripped:
                raise ValueError("Query must contain FROM clause")
            if any(c in query for c in _BAD_CHARS):
                raise ValueError("Invalid SELECT statement")

            lines = self._validate_format(query)
            cols = self._split_columns(self._extract_select(lines))
            schema = []
            for col in cols:
                name, expr = self._parse_column(col)
                if name:
                    schema.append({"name": name, "dtype": self._infer_type(expr)})
            return schema
        except ValueError:
            raise
        except Exception:
            return []


class SnowflakeSource(SQLSource):
    """Snowflake dialect: NUMBER→FLOAT, nested (ARRAY/OBJECT/VARIANT)
    collapse to STRING; SYS_-prefixed columns are filtered out."""

    _TYPES = {
        "NUMBER": "FLOAT",
        "FLOAT": "FLOAT",
        "VARCHAR": "STRING",
        "ARRAY": "STRING",
        "OBJECT": "STRING",
        "VARIANT": "STRING",
    }

    def _map_snowflake_type(self, sf_type: str) -> str:
        return self._TYPES.get(sf_type.upper(), "STRING")

    def infer_schema(self, query: str) -> List[Dict]:
        return [
            s for s in super().infer_schema(query) if not s["name"].startswith("SYS_")
        ]


class TeradataSource(SQLSource):
    """Teradata dialect: permissive validate_query, parameterized-type
    base extraction (DECIMAL(10,2) → DECIMAL → FLOAT)."""

    _TYPES = {
        "INTEGER": "INT64",
        "DECIMAL": "FLOAT",
        "NUMBER": "FLOAT",
        "FLOAT": "FLOAT",
        "VARCHAR": "STRING",
        "DATE": "STRING",
        "TIMESTAMP": "STRING",
    }

    def validate_query(self, query: str) -> bool:
        try:
            up = query.strip().upper()
            if not up.startswith("SELECT") or "FROM" not in up:
                return False
            select_part = up[up.index("SELECT") + 6 : up.index("FROM")].strip()
            return bool(select_part) and select_part != "*"
        except Exception:
            return False

    def _map_teradata_type(self, td_type: str) -> str:
        base = td_type.split("(")[0].upper()
        return self._TYPES.get(base, "STRING")


class SparkSqlEmrSource(SQLSource):
    """Spark SQL dialect: INTEGER→INT64, DOUBLE→FLOAT, nested
    (ARRAY/STRUCT) collapse to STRING."""

    _TYPES = {
        "INTEGER": "INT64",
        "DOUBLE": "FLOAT",
        "STRING": "STRING",
        "ARRAY": "STRING",
        "STRUCT": "STRING",
    }

    def _map_spark_type(self, spark_type: str) -> str:
        return self._TYPES.get(spark_type.upper(), "STRING")


class SQLSourceRegistry:
    """provider name → dialect class; config validation with the
    reference's exact error strings."""

    _sources: Dict[str, Type[SQLSource]] = {
        "snowflake": SnowflakeSource,
        "teradata": TeradataSource,
        "spark_sql_emr": SparkSqlEmrSource,
    }

    @classmethod
    def get_source_class(cls, provider: str) -> Optional[Type[SQLSource]]:
        return cls._sources.get(provider)

    @classmethod
    def validate_config(cls, provider: str, config: Dict) -> List[str]:
        if provider not in cls._sources:
            return [f"Unsupported SQL provider: {provider}"]
        if "query" in config and config["query"].strip().upper().startswith("WITH"):
            return [_CTE_MSG]
        if "query" in config:
            required = ["query", "timestamp_field"]
        elif "table" in config:
            required = ["table", "timestamp_field"]
        else:
            return ["Either 'query' or 'table' must be specified"]
        return [f"Missing required field: {f}" for f in required if f not in config]


class SQLValidator:
    """Error-list SQL/config validator (reference: sql_sources.py:361-403)."""

    @classmethod
    def validate_sql(cls, query: str) -> List[str]:
        errors: List[str] = []
        up = query.strip().upper()
        if not (up.startswith("SELECT") or up.startswith("WITH")):
            return ["Query must start with SELECT or WITH"]
        try:
            select_part = up[up.index("SELECT") + 6 : up.index("FROM")].strip()
        except ValueError:
            return ["Invalid SELECT statement"]
        for col in select_part.split(","):
            col = col.strip()
            if any(a in col for a in ("COUNT(", "SUM(", "AVG(", "MAX(", "MIN(")):
                if " AS " not in col:
                    errors.append(f"Missing alias for aggregate function: {col}")
        return errors

    @classmethod
    def validate_config(cls, config: Dict) -> List[str]:
        errors = [
            f"Missing required field: {f}"
            for f in ("query", "timestamp_field", "database")
            if f not in config
        ]
        if "query" in config:
            errors.extend(cls.validate_sql(config["query"]))
        return errors
