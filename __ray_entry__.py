"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship point-in-time feature-materialization
pipeline on /root/testdata/sf0.001. ``queries()`` / ``oracle_sql()`` expose
one entry per implemented operator from SURVEY.md §2 with a DuckDB oracle
where SQL-expressible. Ray is initialised by the driver — nothing here
calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 (tokenize documents →
    token table → broadcast spine → as-of join with TTL + tie-break)."""
    from sous_chef_ray.pipelines.materialize import flagship

    return flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from sous_chef_ray import queries as q

    return q.QUERIES


def oracle_sql() -> dict[str, str]:
    from sous_chef_ray import queries as q

    return q.ORACLE_SQL
