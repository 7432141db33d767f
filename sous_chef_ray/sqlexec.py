"""SQL text → executable Ray Data plan.

The engine already ports the reference's SQL *validation* surface
(reference: src/sous_chef/sql_sources.py:89-146 column parsing,
src/sous_chef/validators.py:15-16 AGGREGATE_FUNCTIONS / WINDOW_FUNCTIONS
allow-lists) and implements every tier-C operator natively
(stages/agg.py, stages/window.py, functions/sqlfns.py) — but until this
module the two halves never met: a validated SELECT string could not be
*executed*.  The reference pushes SQL to a warehouse
(sql_sources.py:315-322); the Ray-native analogue is this compiler,
which parses the recognized tier-C surface and dispatches to the
existing stage library:

  - FROM table            → ray.data.read_parquet (columns= pruned to
                            exactly the referenced base columns)
  - WHERE                 → pushed into the parquet scan as a
                            pyarrow.dataset expression when the
                            predicate is scan-expressible (col ⋈ literal
                            conjunctions), else a vectorized
                            map_batches filter — never a row loop
  - scalar expressions    → pyarrow.compute kernels via eval_expr
                            (arithmetic with DuckDB division/round
                            semantics, CASE, CAST, string/date
                            functions from functions/sqlfns.py)
  - GROUP BY + aggregates → per-batch projection of key / argument
                            expressions (the partial/combine happens
                            inside Ray's hash aggregate), then
                            Dataset.groupby().aggregate(Sum/Min/Max/
                            Count/…); COUNT(DISTINCT x) routes to
                            stages/agg.count_distinct (per-batch dedup
                            combiner) and re-joins on the bounded
                            post-aggregate table
  - window functions      → stages/window.with_row_number / with_rank /
                            with_lag_lead / with_first_last /
                            with_running_sum (all partition_apply-based:
                            one bucketed shuffle, per-bucket vector
                            sort)
  - HAVING / ORDER / LIMIT→ post-aggregate (bounded) or Dataset.sort/
                            limit on the streaming path

Scale shape: the only driver-side materialization is the post-GROUP-BY
aggregate table (bounded: one row per group) — exactly the contract the
hand-built queries in queries.py follow.  Projection-only statements
return a streaming Dataset.

Exactness: division is always float64 (DuckDB: 7/2 = 3.5), ROUND and
CAST(float AS int) round half-away-from-zero (DuckDB: round(2.5)=3,
CAST(2.5 AS BIGINT)=3), so a query string executed here and handed to
DuckDB verbatim produces bit-identical values when float aggregates use
the integer-cents idiom (see queries.py module docstring).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""\s*(?:
      (?P<num>\d+\.\d+|\.\d+|\d+)
    | (?P<str>'(?:[^']|'')*')
    | (?P<ident>[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)
    | (?P<op><=|>=|<>|!=|\|\||[=<>+\-*/%(),.])
    )""",
    re.X,
)


def tokenize(sql: str) -> List[Tuple[str, str]]:
    # strip -- comments
    sql = "\n".join(ln.split("--")[0] for ln in sql.splitlines())
    out: List[Tuple[str, str]] = []
    pos = 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if not m:
            if sql[pos:].strip():
                raise ValueError(f"cannot tokenize SQL at: {sql[pos:pos+30]!r}")
            break
        pos = m.end()
        if m.lastgroup == "num":
            out.append(("num", m.group("num")))
        elif m.lastgroup == "str":
            out.append(("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.lastgroup == "ident":
            out.append(("ident", m.group("ident")))
        else:
            out.append(("op", m.group("op")))
    return out


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Col:
    name: str  # unqualified (last segment), original case
    qual: Optional[str] = None  # table alias qualifier (lowercase) or None


@dataclass(frozen=True)
class Lit:
    value: object
    kind: str = "auto"  # int | float | str | bool | null | timestamp | interval


@dataclass(frozen=True)
class Bin:
    op: str
    left: object
    right: object


@dataclass(frozen=True)
class Un:
    op: str  # NOT | NEG
    operand: object


@dataclass(frozen=True)
class Func:
    name: str  # uppercased
    args: tuple
    distinct: bool = False


@dataclass(frozen=True)
class Win:
    func: Func
    partition_by: tuple
    order_by: tuple  # of (expr, desc: bool)
    frame: Optional[str] = None  # None | 'rows_unbounded_preceding'
    ref: Optional[str] = None  # unresolved `OVER w` named-window reference


@dataclass(frozen=True)
class Case:
    whens: tuple  # of (cond, value)
    default: object = None


@dataclass(frozen=True)
class Cast:
    operand: object
    to: str  # uppercased SQL type name


@dataclass(frozen=True)
class InList:
    operand: object
    items: tuple
    negated: bool = False


@dataclass(frozen=True)
class Between:
    operand: object
    lo: object
    hi: object
    negated: bool = False


@dataclass(frozen=True)
class IsNull:
    operand: object
    negated: bool = False


@dataclass(frozen=True)
class Like:
    operand: object
    pattern: str
    negated: bool = False


@dataclass(frozen=True)
class Star:
    qual: Optional[str] = None  # `t.*` (lowercased relation alias)


@dataclass(eq=False)  # identity hash: holds an unhashable Select
class ScalarSub:
    """Uncorrelated scalar subquery — materialized to a Lit at plan time
    (bounded: one row, one column)."""

    sel: object  # Select


@dataclass(eq=False)
class InSubquery:
    """x [NOT] IN (SELECT ...) — materialized to an InSet at plan time."""

    operand: object
    sel: object  # Select
    negated: bool = False


@dataclass(eq=False)
class Exists:
    """[NOT] EXISTS (SELECT …) — decorrelated at plan time: one equality
    correlation → broadcast key-set semi filter; uncorrelated → a
    row-existence boolean literal."""

    sel: object  # Select


@dataclass(eq=False)
class InSet:
    """Broadcast semi/anti key-set filter (the Ray-native IN-subquery
    plan): the subquery's distinct keys live in the object store ONCE
    (ray.put); each filter task fetches the ref from shared memory —
    never re-shipped per batch. SQL three-valued logic: NULL operand →
    NULL; a NULL in the set makes NOT IN never-true. EXISTS-derived
    sets use null_is_false (a NULL correlation key simply matches
    nothing — no three-valued propagation)."""

    operand: object
    keys: object  # ray.ObjectRef of a pa.Array (nulls dropped)
    negated: bool = False
    set_has_null: bool = False
    null_is_false: bool = False


@dataclass(eq=False)
class ExistsNeq:
    """Decorrelated EXISTS carrying ONE extra ``inner_col <> outer_expr``
    conjunct (the TPC-H Q21 shape: another lineitem on the same order
    from a DIFFERENT supplier). Per correlation key the inner relation
    reduces to (min, max) of the compared column — a qualifying row
    exists iff the key matches and (min <> v OR max <> v). The bounded
    (key, min, max) table lives in the object store ONCE (ray.put)."""

    key_operand: object  # outer expr of the equality correlation
    val_operand: object  # outer expr compared by <>
    table: object        # ray.ObjectRef of pa.Table(__k, __mn, __mx)


@dataclass(frozen=True)
class TableRef:
    """FROM-clause relation: a base parquet table or a derived table."""

    table: Optional[str]  # parquet table name; None for a derived table
    alias: str  # effective name (lowercase): explicit alias or table name
    sub: object = None  # Select, for derived tables


@dataclass(frozen=True)
class JoinSpec:
    kind: str  # inner | left | right | full | cross
    ref: TableRef
    on: object = None  # expr (None for cross)


@dataclass
class Select:
    items: List[Tuple[Optional[str], object]]  # (alias-or-None, expr)
    frm: TableRef = None
    joins: List[JoinSpec] = field(default_factory=list)
    where: object = None
    group_by: List[object] = field(default_factory=list)
    having: object = None
    qualify: object = None  # window-predicate filter (Snowflake/DuckDB)
    order_by: List[Tuple[object, bool]] = field(default_factory=list)
    limit: Optional[int] = None
    offset: int = 0
    distinct: bool = False
    # ROLLUP / CUBE / GROUPING SETS: each entry is a list of indices into
    # group_by naming the keys active in that grouping set (None = plain
    # GROUP BY). Execution aggregates once at the finest grain and
    # re-aggregates the bounded result per set.
    group_sets: Optional[List[List[int]]] = None

    @property
    def table(self) -> Optional[str]:
        return self.frm.table if self.frm is not None else None


@dataclass
class Compound:
    """Set-operation chain; trailing ORDER BY / LIMIT apply to the whole
    compound. ``ops[i]`` ∈ {union, union_all, except, except_all,
    intersect, intersect_all} between selects[i] and selects[i+1] —
    left-associative per SQL (a DISTINCT union step dedupes everything
    accumulated so far; a later ALL step appends WITH duplicates).
    INTERSECT binds tighter than UNION/EXCEPT, so ``selects`` entries
    may themselves be nested (intersect-chain) Compounds."""

    selects: List[object]  # Select | Compound
    ops: List[str]
    order_by: List[Tuple[object, bool]] = field(default_factory=list)
    limit: Optional[int] = None


# idents that end a table alias position in the FROM clause
_TABLE_STOP = {
    "WHERE", "GROUP", "HAVING", "QUALIFY", "WINDOW", "ORDER", "LIMIT",
    "JOIN", "INNER", "LEFT", "RIGHT", "FULL", "OUTER", "CROSS", "ON",
    "UNION", "INTERSECT", "EXCEPT", "AS",
}

_AGG_FNS = {"COUNT", "SUM", "AVG", "MIN", "MAX",
            "MEDIAN", "QUANTILE_CONT", "QUANTILE_DISC"}
_QUANTILE_FNS = {"MEDIAN", "QUANTILE_CONT", "QUANTILE_DISC"}
_WIN_FNS = {
    "ROW_NUMBER", "RANK", "DENSE_RANK", "LAG", "LEAD",
    "FIRST_VALUE", "LAST_VALUE", "SUM", "COUNT", "AVG",
}


class _Parser:
    def __init__(self, sql: str):
        self.toks = tokenize(sql)
        self.i = 0

    # --- token helpers ---
    def peek(self, off: int = 0):
        j = self.i + off
        return self.toks[j] if j < len(self.toks) else ("eof", "")

    def peek_kw(self, off: int = 0) -> str:
        k, v = self.peek(off)
        return v.upper() if k == "ident" else ""

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def accept_kw(self, *kws: str) -> bool:
        if self.peek_kw() in kws:
            self.i += 1
            return True
        return False

    def expect_kw(self, kw: str):
        if not self.accept_kw(kw):
            raise ValueError(f"expected {kw}, got {self.peek()!r}")

    def accept_op(self, *ops: str) -> bool:
        k, v = self.peek()
        if k == "op" and v in ops:
            self.i += 1
            return True
        return False

    def expect_op(self, op: str):
        if not self.accept_op(op):
            raise ValueError(f"expected {op!r}, got {self.peek()!r}")

    # --- statement ---
    def parse_select(self) -> Select:
        sel = self._select_body()
        if self.peek()[0] != "eof":
            raise ValueError(f"unexpected trailing tokens: {self.peek()!r}")
        return sel

    def _intersect_term(self):
        """select (INTERSECT [ALL] select)* — INTERSECT binds tighter
        than UNION/EXCEPT per the SQL standard."""
        sels: List[object] = [self._select_body()]
        ops: List[str] = []
        while self.accept_kw("INTERSECT"):
            all_ = self.accept_kw("ALL")
            if not all_:
                self.accept_kw("DISTINCT")
            ops.append("intersect_all" if all_ else "intersect")
            sels.append(self._select_body())
        if len(sels) == 1:
            return sels[0]
        return Compound(sels, ops=ops)

    def parse_statement(self):
        """term ((UNION [ALL] | EXCEPT [ALL]) term)* → Select or
        Compound (terms are INTERSECT chains)."""
        items = [self._intersect_term()]
        ops: List[str] = []
        while True:
            if self.accept_kw("UNION"):
                all_ = self.accept_kw("ALL")
                if not all_:
                    self.accept_kw("DISTINCT")
                ops.append("union_all" if all_ else "union")
            elif self.accept_kw("EXCEPT"):
                all_ = self.accept_kw("ALL")
                ops.append("except_all" if all_ else "except")
            else:
                break
            items.append(self._intersect_term())
        if self.peek()[0] != "eof":
            raise ValueError(f"unexpected trailing tokens: {self.peek()!r}")
        if len(items) == 1 and isinstance(items[0], Select):
            return items[0]

        def _last_select(x):
            return _last_select(x.selects[-1]) if isinstance(x, Compound) \
                else x

        def _each_select(x):
            if isinstance(x, Compound):
                for s in x.selects:
                    yield from _each_select(s)
            else:
                yield x

        last = _last_select(items[-1])
        for it in items:
            for s in _each_select(it):
                if s is last:
                    continue
                if s.order_by or s.limit is not None:
                    raise ValueError(
                        "ORDER BY / LIMIT only allowed after the last "
                        "branch (applies to the whole compound)")
        order_by, limit = last.order_by, last.limit
        last.order_by, last.limit = [], None
        if len(items) == 1:
            comp = items[0]
            comp.order_by, comp.limit = order_by, limit
            return comp
        return Compound(items, ops=ops, order_by=order_by, limit=limit)

    def _parse_table_ref(self) -> TableRef:
        if self.accept_op("("):
            sub = self._select_body()
            self.expect_op(")")
            self.accept_kw("AS")
            k, v = self.next()
            if k != "ident" or v.upper() in _TABLE_STOP:
                raise ValueError("derived table requires an alias")
            return TableRef(None, v.lower(), sub)
        k, name = self.next()
        if k != "ident":
            raise ValueError(f"expected table name, got {name!r}")
        alias = name.lower()
        if self.accept_kw("AS"):
            k2, v2 = self.next()
            if k2 != "ident":
                raise ValueError(f"expected table alias, got {v2!r}")
            alias = v2.lower()
        elif self.peek()[0] == "ident" and self.peek_kw() not in _TABLE_STOP:
            alias = self.next()[1].lower()
        return TableRef(name, alias)

    def _parse_joins(self) -> List[JoinSpec]:
        joins: List[JoinSpec] = []
        while True:
            kind = None
            if self.accept_kw("JOIN"):
                kind = "inner"
            elif self.peek_kw() == "INNER" and self.peek_kw(1) == "JOIN":
                self.i += 2
                kind = "inner"
            elif self.peek_kw() in ("LEFT", "RIGHT", "FULL"):
                k0 = self.peek_kw()
                off = 2 if self.peek_kw(1) == "OUTER" else 1
                if self.peek_kw(off) == "JOIN":
                    self.i += off + 1
                    kind = k0.lower()
            elif self.peek_kw() == "CROSS" and self.peek_kw(1) == "JOIN":
                self.i += 2
                kind = "cross"
            if kind is None:
                return joins
            ref = self._parse_table_ref()
            on = None
            if kind != "cross":
                self.expect_kw("ON")
                on = self.parse_expr()
            joins.append(JoinSpec(kind, ref, on))

    def _select_body(self) -> Select:
        self.expect_kw("SELECT")
        distinct = self.accept_kw("DISTINCT")
        items: List[Tuple[Optional[str], object]] = []
        while True:
            expr = self.parse_expr()
            alias = None
            if self.accept_kw("AS"):
                k, v = self.next()
                if k != "ident":
                    raise ValueError(f"expected alias, got {v!r}")
                alias = v
            items.append((alias, expr))
            if not self.accept_op(","):
                break
        self.expect_kw("FROM")
        frm = self._parse_table_ref()
        joins: List[JoinSpec] = []
        while self.accept_op(","):
            # comma-list FROM: implicit join; equi keys are pulled from
            # the WHERE conjunct pool at plan time
            joins.append(JoinSpec("comma", self._parse_table_ref(), None))
        joins += self._parse_joins()
        sel = Select(items=items, frm=frm, joins=joins, distinct=distinct)
        if self.accept_kw("WHERE"):
            sel.where = self.parse_expr()
        if self.accept_kw("GROUP"):
            self.expect_kw("BY")
            if self.accept_kw("ROLLUP"):
                self._parse_group_construct(sel, "rollup")
            elif self.accept_kw("CUBE"):
                self._parse_group_construct(sel, "cube")
            elif self.accept_kw("GROUPING"):
                self.expect_kw("SETS")
                self._parse_grouping_sets(sel)
            else:
                while True:
                    sel.group_by.append(self.parse_expr())
                    if not self.accept_op(","):
                        break
        if self.accept_kw("HAVING"):
            sel.having = self.parse_expr()
        named_wins = self._parse_window_clause()
        if self.accept_kw("QUALIFY"):
            sel.qualify = self.parse_expr()
        named_wins.update(self._parse_window_clause())
        if self.accept_kw("ORDER"):
            self.expect_kw("BY")
            while True:
                e = self.parse_expr()
                desc = False
                if self.accept_kw("DESC"):
                    desc = True
                else:
                    self.accept_kw("ASC")
                sel.order_by.append((e, desc))
                if not self.accept_op(","):
                    break
        if self.accept_kw("LIMIT"):
            k, v = self.next()
            if k != "num":
                raise ValueError(f"expected LIMIT count, got {v!r}")
            sel.limit = int(v)
            if self.accept_kw("OFFSET"):
                k2, v2 = self.next()
                if k2 != "num":
                    raise ValueError(f"expected OFFSET count, got {v2!r}")
                sel.offset = int(v2)
                if not sel.order_by:
                    raise ValueError("OFFSET requires ORDER BY (the "
                                     "skipped rows are otherwise "
                                     "nondeterministic)")
        self._resolve_named_windows(sel, named_wins)
        return sel

    def _parse_group_construct(self, sel: "Select", kind: str) -> None:
        """GROUP BY ROLLUP(a, b, ...) / CUBE(a, b, ...) → grouping sets
        over the listed keys (ROLLUP: each prefix; CUBE: every subset)."""
        self.expect_op("(")
        exprs = []
        while True:
            exprs.append(self.parse_expr())
            if not self.accept_op(","):
                break
        self.expect_op(")")
        sel.group_by = exprs
        n = len(exprs)
        if kind == "rollup":
            sel.group_sets = [list(range(k)) for k in range(n, -1, -1)]
        else:
            sel.group_sets = sorted(
                ([i for i in range(n) if mask & (1 << i)]
                 for mask in range(1 << n)),
                key=lambda s: (-len(s), s))

    def _parse_grouping_sets(self, sel: "Select") -> None:
        """GROUP BY GROUPING SETS ((a, b), (a), b, ()) — each set is a
        parenthesized key list, a bare key, or () for the grand total."""
        self.expect_op("(")
        raw_sets: List[list] = []
        while True:
            s: list = []
            if self.accept_op("("):
                if not self.accept_op(")"):
                    while True:
                        s.append(self.parse_expr())
                        if not self.accept_op(","):
                            break
                    self.expect_op(")")
            else:
                s.append(self.parse_expr())
            raw_sets.append(s)
            if not self.accept_op(","):
                break
        self.expect_op(")")
        exprs: list = []
        idx_sets: List[List[int]] = []
        for s in raw_sets:
            idx = []
            for e in s:
                try:
                    j = exprs.index(e)
                except ValueError:
                    j = len(exprs)
                    exprs.append(e)
                idx.append(j)
            idx_sets.append(idx)
        sel.group_by = exprs
        sel.group_sets = idx_sets

    def _parse_window_clause(self) -> dict:
        """WINDOW w AS (spec)[, w2 AS (spec)] — named window definitions
        (standard position: after HAVING, before ORDER BY; also accepted
        after QUALIFY for the Snowflake ordering)."""
        named = {}
        if not self.accept_kw("WINDOW"):
            return named
        while True:
            k, name = self.next()
            if k != "ident":
                raise ValueError(f"expected window name, got {name!r}")
            self.expect_kw("AS")
            self.expect_op("(")
            part, order, frame = self._parse_window_spec()
            named[name.lower()] = (tuple(part), tuple(order), frame)
            if not self.accept_op(","):
                break
        return named

    @staticmethod
    def _resolve_named_windows(sel: "Select", named: dict) -> None:
        """Rewrite `OVER w` placeholder Win nodes to their WINDOW-clause
        definitions everywhere a window call can appear."""
        mapping = {}
        for w in _find(sel, Win):
            if w.ref is None:
                continue
            spec = named.get(w.ref)
            if spec is None:
                raise ValueError(f"unknown window name {w.ref!r}")
            mapping[w] = Win(w.func, spec[0], spec[1], spec[2])
        if not mapping:
            return
        sel.items = [(a, _replace(e, mapping)) for a, e in sel.items]
        sel.having = _replace(sel.having, mapping)
        sel.qualify = _replace(sel.qualify, mapping)
        sel.order_by = [(_replace(e, mapping), d) for e, d in sel.order_by]

    # --- expressions (precedence climbing) ---
    def parse_expr(self):
        return self._or()

    def _or(self):
        node = self._and()
        while self.accept_kw("OR"):
            node = Bin("OR", node, self._and())
        return node

    def _and(self):
        node = self._not()
        while self.accept_kw("AND"):
            node = Bin("AND", node, self._not())
        return node

    def _not(self):
        if self.accept_kw("NOT"):
            return Un("NOT", self._not())
        return self._cmp()

    def _cmp(self):
        node = self._add()
        negated = False
        if self.peek_kw() == "NOT" and self.peek_kw(1) in ("IN", "BETWEEN", "LIKE"):
            self.i += 1
            negated = True
        k, v = self.peek()
        if k == "op" and v in ("=", "<>", "!=", "<", "<=", ">", ">="):
            self.i += 1
            op = "<>" if v == "!=" else v
            return Bin(op, node, self._add())
        if self.accept_kw("IN"):
            self.expect_op("(")
            if self.peek_kw() == "SELECT":
                sub = self._select_body()
                self.expect_op(")")
                return InSubquery(node, sub, negated)
            items = [self.parse_expr()]
            while self.accept_op(","):
                items.append(self.parse_expr())
            self.expect_op(")")
            return InList(node, tuple(items), negated)
        if self.accept_kw("BETWEEN"):
            lo = self._add()
            self.expect_kw("AND")
            hi = self._add()
            return Between(node, lo, hi, negated)
        if self.accept_kw("LIKE"):
            k2, pat = self.next()
            if k2 != "str":
                raise ValueError("LIKE pattern must be a string literal")
            return Like(node, pat, negated)
        if self.accept_kw("IS"):
            neg = self.accept_kw("NOT")
            self.expect_kw("NULL")
            return IsNull(node, neg)
        return node

    def _add(self):
        node = self._mul()
        while True:
            k, v = self.peek()
            if k == "op" and v in ("+", "-", "||"):
                self.i += 1
                node = Bin(v, node, self._mul())
            else:
                return node

    def _mul(self):
        node = self._unary()
        while True:
            k, v = self.peek()
            if k == "op" and v in ("*", "/", "%"):
                self.i += 1
                node = Bin(v, node, self._unary())
            else:
                return node

    def _unary(self):
        if self.accept_op("-"):
            return Un("NEG", self._unary())
        if self.accept_op("+"):
            return self._unary()
        return self._primary()

    def _parse_order_list(self) -> List[Tuple[object, bool]]:
        out = []
        while True:
            e = self.parse_expr()
            desc = False
            if self.accept_kw("DESC"):
                desc = True
            else:
                self.accept_kw("ASC")
            out.append((e, desc))
            if not self.accept_op(","):
                break
        return out

    def _primary(self):
        k, v = self.peek()
        if k == "num":
            self.i += 1
            return Lit(float(v), "float") if "." in v else Lit(int(v), "int")
        if k == "str":
            self.i += 1
            return Lit(v, "str")
        if k == "op" and v == "(":
            self.i += 1
            if self.peek_kw() == "SELECT":
                sub = self._select_body()
                self.expect_op(")")
                return ScalarSub(sub)
            node = self.parse_expr()
            self.expect_op(")")
            return node
        if k == "op" and v == "*":
            self.i += 1
            return Star()
        if k != "ident":
            raise ValueError(f"unexpected token {v!r}")
        up = v.upper()
        # typed literals
        if up in ("TIMESTAMP", "DATE") and self.peek(1)[0] == "str":
            self.i += 1
            _, s = self.next()
            return Lit(np.datetime64(s.replace(" ", "T"), "us"), "timestamp")
        if up == "INTERVAL":
            self.i += 1
            k2, v2 = self.next()
            if k2 == "str":
                return Lit(pd.Timedelta(v2).to_numpy(), "interval")
            if k2 == "num":
                k3, unit = self.next()
                if k3 != "ident":
                    raise ValueError("expected INTERVAL unit")
                unit = unit.upper().rstrip("S")
                td = pd.Timedelta(**{
                    {"DAY": "days", "HOUR": "hours", "MINUTE": "minutes",
                     "SECOND": "seconds", "WEEK": "weeks"}[unit]: int(v2)})
                return Lit(td.to_numpy(), "interval")
            raise ValueError("bad INTERVAL literal")
        if up == "TRUE":
            self.i += 1
            return Lit(True, "bool")
        if up == "FALSE":
            self.i += 1
            return Lit(False, "bool")
        if up == "NULL":
            self.i += 1
            return Lit(None, "null")
        if up == "EXISTS":
            self.i += 1
            self.expect_op("(")
            sub = self._select_body()
            self.expect_op(")")
            return Exists(sub)
        if up == "CAST":
            self.i += 1
            self.expect_op("(")
            operand = self.parse_expr()
            self.expect_kw("AS")
            ty_parts = []
            while self.peek()[0] == "ident":
                ty_parts.append(self.next()[1])
            self.expect_op(")")
            return Cast(operand, " ".join(ty_parts).upper())
        if up == "CASE":
            self.i += 1
            whens = []
            while self.accept_kw("WHEN"):
                cond = self.parse_expr()
                self.expect_kw("THEN")
                whens.append((cond, self.parse_expr()))
            default = self.parse_expr() if self.accept_kw("ELSE") else None
            self.expect_kw("END")
            return Case(tuple(whens), default)
        if up == "EXTRACT":
            self.i += 1
            self.expect_op("(")
            k2, part = self.next()
            self.expect_kw("FROM")
            operand = self.parse_expr()
            self.expect_op(")")
            return Func("EXTRACT", (Lit(part.upper(), "str"), operand))
        # function call?
        if self.peek(1) == ("op", "("):
            self.i += 2
            distinct = self.accept_kw("DISTINCT")
            args: List[object] = []
            if not self.accept_op(")"):
                args.append(self.parse_expr())
                while self.accept_op(","):
                    args.append(self.parse_expr())
                self.expect_op(")")
            fn = Func(up, tuple(args), distinct)
            # aggregate FILTER (WHERE cond) desugars exactly for the
            # null-skipping aggregates: F(x) FILTER c ≡ F(CASE WHEN c
            # THEN x END); COUNT(*) FILTER c ≡ COUNT(CASE WHEN c THEN 1
            # END) — no executor changes needed
            if (self.peek_kw() == "FILTER"
                    and self.peek(1) == ("op", "(")):
                if up not in _AGG_FNS and up != "COUNT":
                    raise ValueError(
                        f"FILTER is only valid on aggregates, not {up}")
                self.i += 1
                self.expect_op("(")
                self.expect_kw("WHERE")
                cond = self.parse_expr()
                self.expect_op(")")
                arg = (Lit(1, "int")
                       if not args or isinstance(args[0], Star)
                       else args[0])
                fn = Func(up, (Case(((cond, arg),), None),)
                          + tuple(args[1:]), distinct)
            # OVER clause → window
            if self.peek_kw() == "OVER":
                self.i += 1
                if self.peek() != ("op", "("):
                    # named window reference: OVER w — resolved against
                    # the WINDOW clause after the full SELECT is parsed
                    kr, vr = self.next()
                    if kr != "ident":
                        raise ValueError(
                            f"expected window name or '(', got {vr!r}")
                    return Win(fn, (), (), None, ref=vr.lower())
                self.expect_op("(")
                part, order, frame = self._parse_window_spec()
                return Win(fn, tuple(part), tuple(order), frame)
            return fn
        # bare (possibly qualified) column, or a qualified star `t.*`
        self.i += 1
        if self.peek() == ("op", ".") and self.peek(1) == ("op", "*"):
            self.i += 2
            return Star(v.lower())
        parts = v.split(".")
        return Col(parts[-1], parts[-2].lower() if len(parts) > 1 else None)

    def _parse_window_spec(self):
        """Window specification body — after the opening '(' up to and
        including the closing ')'. Shared by OVER (...) and the named
        WINDOW clause."""
        part: List[object] = []
        order: List[Tuple[object, bool]] = []
        frame = None
        if self.accept_kw("PARTITION"):
            self.expect_kw("BY")
            part.append(self.parse_expr())
            while self.accept_op(","):
                part.append(self.parse_expr())
        if self.accept_kw("ORDER"):
            self.expect_kw("BY")
            order = self._parse_order_list()
        if self.accept_kw("ROWS"):
            if self.accept_kw("BETWEEN"):
                if self.accept_kw("UNBOUNDED"):
                    self.expect_kw("PRECEDING")
                    lo = None
                else:
                    k2, v2 = self.next()
                    if k2 != "num":
                        raise ValueError("expected frame bound")
                    lo = int(v2)
                    self.expect_kw("PRECEDING")
                self.expect_kw("AND")
                if self.accept_kw("UNBOUNDED"):
                    self.expect_kw("FOLLOWING")
                    hi = None
                elif self.accept_kw("CURRENT"):
                    self.expect_kw("ROW")
                    hi = 0
                else:
                    k3, v3 = self.next()
                    if k3 != "num":
                        raise ValueError("expected frame bound")
                    hi = int(v3)
                    self.expect_kw("FOLLOWING")
                if lo is None and hi is None:
                    frame = "full_partition"
                elif lo is None and hi == 0:
                    frame = "rows_unbounded_preceding"
                elif lo is not None:
                    frame = ("rows", lo, hi)
                else:
                    raise ValueError("UNBOUNDED PRECEDING with a "
                                     "numeric upper bound is not "
                                     "supported")
            else:
                self.expect_kw("UNBOUNDED")
                self.expect_kw("PRECEDING")
                frame = "rows_unbounded_preceding"
        elif self.accept_kw("RANGE"):
            self.expect_kw("BETWEEN")
            if self.accept_kw("UNBOUNDED"):
                self.expect_kw("PRECEDING")
                lo_ivl = None
            else:
                # INTERVAL literal (time-RANGE) or numeric bound
                b = self.parse_expr()
                if not isinstance(b, Lit) or b.kind not in (
                        "interval", "int"):
                    raise ValueError(
                        "RANGE lower bound must be an INTERVAL "
                        "or integer literal")
                lo_ivl = b.value
                self.expect_kw("PRECEDING")
            self.expect_kw("AND")
            self.expect_kw("CURRENT")
            self.expect_kw("ROW")
            # SQL's default frame when ORDER BY is present is
            # RANGE UNBOUNDED PRECEDING..CURRENT ROW — map the
            # explicit spelling to frame None (same semantics)
            frame = None if lo_ivl is None else ("range", lo_ivl)
        self.expect_op(")")
        return part, order, frame


def parse_sql(sql: str) -> Select:
    return _Parser(sql).parse_select()


# ---------------------------------------------------------------------------
# Expression evaluation over a pyarrow Table
# ---------------------------------------------------------------------------

_ROUND_AWAY = pc.RoundOptions(round_mode="half_towards_infinity")

_CAST_TYPES = {
    "BIGINT": pa.int64(), "INT": pa.int32(), "INTEGER": pa.int32(),
    "SMALLINT": pa.int16(), "DOUBLE": pa.float64(), "FLOAT": pa.float32(),
    "REAL": pa.float32(), "VARCHAR": pa.string(), "TEXT": pa.string(),
    "STRING": pa.string(), "DATE": pa.date32(), "TIMESTAMP": pa.timestamp("us"),
    "BOOLEAN": pa.bool_(), "DOUBLE PRECISION": pa.float64(),
}


def _lit_array(value, kind: str):
    if kind == "timestamp":
        return pa.scalar(value, type=pa.timestamp("us"))
    if kind == "interval":
        return pa.scalar(value.astype("timedelta64[us]"), type=pa.duration("us"))
    if kind == "null":
        return pa.scalar(None, type=pa.null())
    if kind == "int":
        return pa.scalar(value, type=pa.int64())
    if kind == "float":
        return pa.scalar(value, type=pa.float64())
    return pa.scalar(value)


def _is_floating(x) -> bool:
    return pa.types.is_floating(x.type)


def _to_f64(x):
    return pc.cast(x, pa.float64()) if not pa.types.is_float64(x.type) else x


def _empty_frame(cols) -> pd.DataFrame:
    """Zero-row frame with the given columns: the stand-in for Ray
    aggregates over an EMPTY stream, which return zero-COLUMN tables."""
    return pd.DataFrame({c: pd.Series(dtype="object") for c in cols})


def _to_string(x):
    if pa.types.is_string(x.type) or pa.types.is_large_string(x.type):
        return x
    return pc.cast(x, pa.string())


def eval_expr(node, t: pa.Table):
    """AST → pyarrow Array/ChunkedArray/Scalar against table ``t``.

    Column lookup is case-insensitive (SQL identifiers); all kernels are
    pyarrow.compute — no Python row loops anywhere."""
    from sous_chef_ray.functions import sqlfns

    if isinstance(node, Col):
        for name in t.column_names:
            if name.lower() == node.name.lower():
                return t[name]
        raise KeyError(f"unknown column {node.name!r}; have {t.column_names}")
    if isinstance(node, Lit):
        return _lit_array(node.value, node.kind)
    if isinstance(node, Un):
        x = eval_expr(node.operand, t)
        if node.op == "NOT":
            return pc.invert(x)
        return pc.negate(x)
    if isinstance(node, Bin):
        if node.op in ("AND", "OR"):
            l, r = eval_expr(node.left, t), eval_expr(node.right, t)
            return (pc.and_kleene if node.op == "AND" else pc.or_kleene)(l, r)
        l, r = eval_expr(node.left, t), eval_expr(node.right, t)
        if node.op == "=":
            return pc.equal(l, r)
        if node.op == "<>":
            return pc.not_equal(l, r)
        if node.op == "<":
            return pc.less(l, r)
        if node.op == "<=":
            return pc.less_equal(l, r)
        if node.op == ">":
            return pc.greater(l, r)
        if node.op == ">=":
            return pc.greater_equal(l, r)
        if node.op == "||":
            return pc.binary_join_element_wise(_to_string(l), _to_string(r), "")
        if node.op == "/":
            # DuckDB `/` is always double division (7/2 = 3.5)
            return pc.divide(_to_f64(l), _to_f64(r))
        if node.op == "%":
            # arrow has no modulo kernel; a - trunc(a/b)*b (ints stay int)
            q = pc.cast(pc.trunc(pc.divide(_to_f64(l), _to_f64(r))), pa.int64())
            return pc.subtract(l, pc.multiply(q, r))
        fn = {"+": pc.add, "-": pc.subtract, "*": pc.multiply}[node.op]
        # timestamp ± interval works natively (timestamp + duration)
        return fn(l, r)
    if isinstance(node, Case):
        conds = [eval_expr(c, t) for c, _ in node.whens]
        vals = [eval_expr(v, t) for _, v in node.whens]
        default = (eval_expr(node.default, t) if node.default is not None
                   else pa.scalar(None, type=pa.null()))
        out = default
        for cond, val in zip(reversed(conds), reversed(vals)):
            out = pc.if_else(cond, val, out)
        return out
    if isinstance(node, Cast):
        x = eval_expr(node.operand, t)
        ty = _CAST_TYPES.get(node.to)
        if ty is None:
            raise ValueError(f"unsupported CAST type {node.to!r}")
        if pa.types.is_integer(ty) and (
            isinstance(x, (pa.Array, pa.ChunkedArray)) and _is_floating(x)
            or isinstance(x, pa.Scalar) and pa.types.is_floating(x.type)
        ):
            # DuckDB casts float→int by rounding half away from zero
            x = pc.round(x, options=_ROUND_AWAY)
            return pc.cast(x, ty)
        return pc.cast(x, ty)
    if isinstance(node, InList):
        x = eval_expr(node.operand, t)
        vals = [it.value for it in node.items]
        if not all(isinstance(it, Lit) for it in node.items):
            raise ValueError("IN list must be literals")
        out = pc.is_in(x, value_set=pa.array(vals))
        return pc.invert(out) if node.negated else out
    if isinstance(node, Between):
        x = eval_expr(node.operand, t)
        lo, hi = eval_expr(node.lo, t), eval_expr(node.hi, t)
        out = pc.and_kleene(pc.greater_equal(x, lo), pc.less_equal(x, hi))
        return pc.invert(out) if node.negated else out
    if isinstance(node, IsNull):
        x = eval_expr(node.operand, t)
        out = pc.is_null(x)
        return pc.invert(out) if node.negated else out
    if isinstance(node, Like):
        x = eval_expr(node.operand, t)
        out = pc.match_like(x, node.pattern)
        return pc.invert(out) if node.negated else out
    if isinstance(node, InSet):
        import ray as _ray

        x = eval_expr(node.operand, t)
        keys = node.keys
        if isinstance(keys, _ray.ObjectRef):
            keys = _ray.get(keys)  # shared-memory fetch, once per worker
        if node.null_is_false:
            # EXISTS semantics: NULL key matches nothing — plain boolean
            out = pc.is_in(x, value_set=keys)
            return pc.invert(out) if node.negated else out
        if node.negated and node.set_has_null:
            # SQL: x NOT IN (… NULL …) is never TRUE
            return pa.nulls(len(t), pa.bool_())
        out = pc.is_in(x, value_set=keys)
        if node.negated:
            out = pc.invert(out)
        elif node.set_has_null:
            # x IN (… NULL …): a non-match is UNKNOWN (x = NULL could
            # hold), not FALSE — matters when the IN lands in a
            # projection or under NOT/CASE rather than a WHERE filter
            out = pc.if_else(out, pa.scalar(True),
                             pa.scalar(None, pa.bool_()))
        # NULL operand → NULL (pc.is_in maps null → false)
        return pc.if_else(pc.is_null(x), pa.scalar(None, pa.bool_()), out)
    if isinstance(node, ExistsNeq):
        import ray as _ray

        tab = node.table
        if isinstance(tab, _ray.ObjectRef):
            tab = _ray.get(tab)  # shared-memory fetch, once per worker
        k = eval_expr(node.key_operand, t)
        v = eval_expr(node.val_operand, t)
        idx = pc.index_in(k, value_set=tab["__k"].combine_chunks())
        mn = pc.take(tab["__mn"].combine_chunks(), idx)
        mx = pc.take(tab["__mx"].combine_chunks(), idx)
        # EXISTS is two-valued: a NULL comparison (all-NULL inner values
        # or a NULL outer operand) means no qualifying row → FALSE
        hit = pc.or_kleene(pc.not_equal(mn, v), pc.not_equal(mx, v))
        return pc.and_(pc.is_valid(idx), pc.fill_null(hit, False))
    if isinstance(node, Func):
        return _eval_func(node, t, sqlfns)
    raise ValueError(f"cannot evaluate node {node!r}")


def _scalar_str(node) -> str:
    if isinstance(node, Lit) and isinstance(node.value, str):
        return node.value
    raise ValueError(f"expected string literal argument, got {node!r}")


def _scalar_int(node) -> int:
    if isinstance(node, Lit) and isinstance(node.value, (int, float)):
        return int(node.value)
    if isinstance(node, Un) and node.op == "NEG":
        return -_scalar_int(node.operand)
    raise ValueError(f"expected integer literal argument, got {node!r}")


def _eval_func(node: Func, t: pa.Table, sqlfns):
    name, args = node.name, node.args
    ev = lambda i: eval_expr(args[i], t)  # noqa: E731
    if name in ("UPPER", "UCASE"):
        return pc.utf8_upper(ev(0))
    if name in ("LOWER", "LCASE"):
        return pc.utf8_lower(ev(0))
    if name in ("LENGTH", "LEN"):
        return pc.cast(pc.utf8_length(ev(0)), pa.int64())
    if name == "TRIM":
        return pc.utf8_trim_whitespace(ev(0))
    if name in ("SUBSTR", "SUBSTRING"):
        start = _scalar_int(args[1])
        length = _scalar_int(args[2]) if len(args) > 2 else None
        return sqlfns.substr(ev(0), start, length)
    if name == "REPLACE":
        return pc.replace_substring(
            ev(0), pattern=_scalar_str(args[1]), replacement=_scalar_str(args[2]))
    if name == "CONCAT":
        parts = [_to_string(eval_expr(a, t)) for a in args]
        return pc.binary_join_element_wise(*parts, "")
    if name == "COALESCE":
        return pc.coalesce(*[eval_expr(a, t) for a in args])
    if name == "NULLIF":
        x, y = ev(0), ev(1)
        return pc.if_else(pc.equal(x, y), pa.scalar(None, type=x.type), x)
    if name == "NVL":
        return pc.coalesce(ev(0), ev(1))
    if name == "IFF":
        return pc.if_else(ev(0), ev(1), ev(2))
    if name == "ABS":
        return pc.abs(ev(0))
    if name == "FLOOR":
        return pc.floor(ev(0))
    if name in ("CEIL", "CEILING"):
        return pc.ceil(ev(0))
    if name == "ROUND":
        nd = _scalar_int(args[1]) if len(args) > 1 else 0
        return pc.round(ev(0), options=pc.RoundOptions(
            ndigits=nd, round_mode="half_towards_infinity"))
    if name == "EXTRACT":
        return pc.cast(sqlfns.extract(_scalar_str(args[0]), ev(1)), pa.int64())
    if name in ("YEAR", "MONTH", "DAY"):
        return pc.cast(sqlfns.extract(name, ev(0)), pa.int64())
    if name == "DATE_TRUNC":
        return sqlfns.date_trunc(_scalar_str(args[0]), ev(1))
    if name == "DATEADD":
        return sqlfns.dateadd(_scalar_str(args[0]), _scalar_int(args[1]), ev(2))
    if name == "LAST_DAY":
        return sqlfns.last_day(ev(0))
    if name == "GREATEST":
        return pc.max_element_wise(*[eval_expr(a, t) for a in args])
    if name == "LEAST":
        return pc.min_element_wise(*[eval_expr(a, t) for a in args])
    if name == "STRPOS":
        return sqlfns.strpos(ev(0), _scalar_str(args[1]))
    if name == "LEFT":
        return sqlfns.left(ev(0), _scalar_int(args[1]))
    if name == "RIGHT":
        return sqlfns.right(ev(0), _scalar_int(args[1]))
    if name == "LPAD":
        fill = _scalar_str(args[2]) if len(args) > 2 else " "
        return sqlfns.lpad(ev(0), _scalar_int(args[1]), fill)
    if name == "RPAD":
        fill = _scalar_str(args[2]) if len(args) > 2 else " "
        return sqlfns.rpad(ev(0), _scalar_int(args[1]), fill)
    if name == "SPLIT_PART":
        return sqlfns.split_part(ev(0), _scalar_str(args[1]), _scalar_int(args[2]))
    if name == "REVERSE":
        return sqlfns.reverse(ev(0))
    if name == "STARTS_WITH":
        return sqlfns.starts_with(ev(0), _scalar_str(args[1]))
    if name == "ENDS_WITH":
        return sqlfns.ends_with(ev(0), _scalar_str(args[1]))
    if name == "ZEROIFNULL":
        return sqlfns.zeroifnull(ev(0))
    raise ValueError(f"unsupported scalar function {name}")


# ---------------------------------------------------------------------------
# Predicate pushdown: AST → pyarrow.dataset expression (best-effort)
# ---------------------------------------------------------------------------


def _to_scan_filter(node):
    """Convert a WHERE AST to a pyarrow dataset expression, or raise
    ``ValueError`` if any piece is not scan-expressible.  Only
    column-vs-literal comparisons, IS [NOT] NULL, IN, and AND/OR
    combinations qualify — exactly what parquet row-group stats can
    prune on."""
    import pyarrow.dataset as pads

    if isinstance(node, Bin):
        if node.op in ("AND", "OR"):
            l, r = _to_scan_filter(node.left), _to_scan_filter(node.right)
            return (l & r) if node.op == "AND" else (l | r)
        if isinstance(node.left, Col) and isinstance(node.right, Lit):
            f, v = pads.field(node.left.name), _lit_array(node.right.value,
                                                          node.right.kind)
            return {"=": f == v, "<>": f != v, "<": f < v, "<=": f <= v,
                    ">": f > v, ">=": f >= v}[node.op]
        raise ValueError("not scan-expressible")
    if isinstance(node, IsNull):
        if isinstance(node.operand, Col):
            import pyarrow.dataset as pads2

            f = pads2.field(node.operand.name)
            return ~f.is_null() if node.negated else f.is_null()
        raise ValueError("not scan-expressible")
    if isinstance(node, InList):
        if isinstance(node.operand, Col) and not node.negated:
            import pyarrow.dataset as pads2

            return pads2.field(node.operand.name).isin(
                [it.value for it in node.items])
        raise ValueError("not scan-expressible")
    if isinstance(node, Between):
        if isinstance(node.operand, Col) and not node.negated \
                and isinstance(node.lo, Lit) and isinstance(node.hi, Lit):
            import pyarrow.dataset as pads2

            f = pads2.field(node.operand.name)
            return (f >= _lit_array(node.lo.value, node.lo.kind)) & (
                f <= _lit_array(node.hi.value, node.hi.kind))
        raise ValueError("not scan-expressible")
    raise ValueError("not scan-expressible")


# ---------------------------------------------------------------------------
# Plan + execute
# ---------------------------------------------------------------------------


def _walk(node):
    yield node
    for f_ in getattr(node, "__dataclass_fields__", {}):
        v = getattr(node, f_)
        if isinstance(v, (list, tuple)):
            for item in v:
                if isinstance(item, tuple):
                    for sub in item:
                        if hasattr(sub, "__dataclass_fields__"):
                            yield from _walk(sub)
                elif hasattr(item, "__dataclass_fields__"):
                    yield from _walk(item)
        elif hasattr(v, "__dataclass_fields__"):
            yield from _walk(v)




def _find(node, kind) -> list:
    return [n for n in _walk(node) if isinstance(n, kind)]


def _find_aggs(node) -> list:
    """Aggregate Func nodes NOT inside a window call — ``SUM(x) OVER
    (...)`` is a window function, not a grouped aggregate."""
    win_funcs = [w.func for w in _find(node, Win)]
    out = []
    for n in _walk(node):
        if isinstance(n, Func) and n.name in _AGG_FNS:
            if n in win_funcs:
                win_funcs.remove(n)  # consume one occurrence
            else:
                out.append(n)
    return out


def _replace(node, mapping: dict):
    """Structurally substitute sub-expressions (by dataclass equality)
    with replacement nodes — used to rewrite aggregate / window calls
    into references to their computed columns."""
    if node in mapping:
        return mapping[node]
    if not hasattr(node, "__dataclass_fields__"):
        return node
    kwargs = {}
    for f_ in node.__dataclass_fields__:
        v = getattr(node, f_)
        if isinstance(v, tuple):
            kwargs[f_] = tuple(
                tuple(_replace(s, mapping) for s in item) if isinstance(item, tuple)
                else _replace(item, mapping)
                for item in v
            )
        elif isinstance(v, list):
            kwargs[f_] = [_replace(item, mapping) for item in v]
        elif hasattr(v, "__dataclass_fields__"):
            kwargs[f_] = _replace(v, mapping)
        else:
            kwargs[f_] = v
    return type(node)(**kwargs)


def _out_name(alias: Optional[str], expr) -> str:
    if alias:
        return alias
    if isinstance(expr, Col):
        return expr.name
    raise ValueError(f"select item needs an alias: {expr!r}")


def _project_fn(named_exprs: List[Tuple[str, object]]):
    """map_batches fn evaluating (name, AST) pairs over Arrow batches."""

    def fn(t: pa.Table) -> pa.Table:
        cols, names = [], []
        for name, expr in named_exprs:
            v = eval_expr(expr, t)
            if isinstance(v, pa.Scalar):
                v = pa.chunked_array([pa.repeat(v, len(t))])
            if pa.types.is_null(v.type):
                v = pc.cast(v, pa.string())
            if pa.types.is_timestamp(v.type) and v.type.unit != "us":
                # DuckDB returns microsecond timestamps; Ray's shuffle can
                # downcast date_trunc outputs to [s]
                v = pc.cast(v, pa.timestamp("us", tz=v.type.tz))
            names.append(name)
            cols.append(v)
        return pa.table(dict(zip(names, cols)))

    return fn


def _mask_fn(expr):
    """Predicate → numpy bool mask (nulls FALSE) — the shape
    DimIndex.merge's ON-residual collapse consumes."""
    def fn(t: pa.Table) -> np.ndarray:
        mask = eval_expr(expr, t)
        if isinstance(mask, pa.Scalar):
            return np.full(len(t), bool(mask.is_valid and mask.as_py()),
                           dtype=bool)
        if isinstance(mask, pa.ChunkedArray):
            mask = mask.combine_chunks()
        return np.asarray(pc.fill_null(mask, False))

    return fn


def _filter_fn(where):
    def fn(t: pa.Table) -> pa.Table:
        mask = eval_expr(where, t)
        if isinstance(mask, pa.Scalar):
            # constant predicate (e.g. folded uncorrelated EXISTS)
            return t if (mask.is_valid and mask.as_py()) else t.slice(0, 0)
        if isinstance(mask, pa.ChunkedArray):
            mask = mask.combine_chunks()
        return t.filter(pc.fill_null(mask, False))

    return fn


# ---------------------------------------------------------------------------
# FROM-clause planning (base tables, equi-joins, derived tables)
# ---------------------------------------------------------------------------


def _conjuncts(e) -> list:
    if isinstance(e, Bin) and e.op == "AND":
        return _conjuncts(e.left) + _conjuncts(e.right)
    return [e]


def _and_all(conds: list):
    out = conds[0]
    for c in conds[1:]:
        out = Bin("AND", out, c)
    return out


def _ref_columns(ref: TableRef, sf_dir: str) -> List[str]:
    if ref.sub is not None:
        return [_out_name(a, e) for a, e in ref.sub.items]
    import pyarrow.parquet as pq

    return list(pq.read_schema(f"{sf_dir}/{ref.table}.parquet").names)


def _expand_stars(sel: Select, sf_dir: str) -> None:
    """Rewrite top-level ``SELECT *`` items into explicit Cols (schema
    from the parquet file or the derived table's own select list).
    Derived tables expand recursively FIRST so an outer relation over a
    ``SELECT *`` sub sees its concrete output names. Joined selects are
    rejected: with the engine's same-named-key collapse, ``*`` over a
    join has no unambiguous column list."""
    for ref in [sel.frm] + [j.ref for j in sel.joins]:
        if ref is not None and ref.sub is not None:
            _expand_stars(ref.sub, sf_dir)
    if not any(isinstance(e, Star) for _, e in sel.items):
        return
    refs = [sel.frm] + [j.ref for j in sel.joins]

    def _cols_for(qual: Optional[str]) -> List[Tuple[str, Optional[str]]]:
        if qual is None:
            if sel.joins:
                # unqualified * over a join is ambiguous under the
                # engine's same-named-key collapse; t.* is fine
                raise ValueError("SELECT * over a join is ambiguous — "
                                 "use qualified t.*")
            return [(c, None) for c in _ref_columns(sel.frm, sf_dir)]
        for r in refs:
            if r.alias == qual:
                return [(c, qual) for c in _ref_columns(r, sf_dir)]
        raise KeyError(f"unknown relation {qual!r} in {qual}.*")

    items: List[Tuple[Optional[str], object]] = []
    for a, e in sel.items:
        if isinstance(e, Star):
            if a:
                raise ValueError("* cannot take an alias")
            items.extend((None, Col(c, q)) for c, q in _cols_for(e.qual))
        else:
            items.append((a, e))
    sel.items = items


def _resolve_col(col: Col, refs, ref_cols) -> Tuple[int, str]:
    """(qualifier, name) → (relation index, actual schema column name)."""
    cands = []
    for i, ref in enumerate(refs):
        if col.qual is not None and ref.alias != col.qual:
            continue
        for n in ref_cols[i]:
            if n.lower() == col.name.lower():
                cands.append((i, n))
                break
    if not cands:
        q = f"{col.qual}." if col.qual else ""
        raise KeyError(f"unknown column {q}{col.name}; relations: "
                       f"{[r.alias for r in refs]}")
    if len(cands) > 1:
        raise ValueError(f"ambiguous column {col.name!r}: add a qualifier")
    return cands[0]


def _lit_from_py(v) -> Lit:
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return Lit(None, "null")
    if isinstance(v, (bool, np.bool_)):
        return Lit(bool(v), "bool")
    if isinstance(v, (int, np.integer)):
        return Lit(int(v), "int")
    if isinstance(v, (float, np.floating)):
        return Lit(float(v), "float")
    if isinstance(v, (pd.Timestamp, np.datetime64)):
        return Lit(np.datetime64(v, "us"), "timestamp")
    return Lit(str(v), "str")


def _scalar_sub_lit(sub: Select, sf_dir: str, num_buckets: int,
                    broadcast_rows: int) -> Lit:
    """Run an uncorrelated scalar subquery (bounded by contract) → Lit."""
    import ray.data as rd

    if len(sub.items) == 1 and not sub.items[0][0]:
        # `(SELECT AVG(x) FROM …)` — the output name is irrelevant for a
        # scalar, so auto-alias instead of demanding one (TPC-H Q22 shape)
        sub.items[0] = ("__scalar", sub.items[0][1])
    res = _execute_select(sub, sf_dir, num_buckets, broadcast_rows)
    if isinstance(res, rd.Dataset):
        res = res.limit(2).to_pandas()
    if res.shape[1] != 1:
        raise ValueError("scalar subquery must select exactly one column")
    if len(res) == 0:
        return Lit(None, "null")
    if len(res) > 1:
        raise ValueError("scalar subquery returned more than one row")
    return _lit_from_py(res.iloc[0, 0])


def _in_subquery_set(node: InSubquery, sf_dir: str, num_buckets: int,
                     broadcast_rows: int) -> InSet:
    """x [NOT] IN (SELECT k …) → broadcast key-set filter.  The distinct
    key reduction is DISTRIBUTED (per-block pc.unique inside map_batches
    before Dataset.unique — stages/join.distinct_key_array); only the
    distinct set reaches the driver, then ray.put ONCE."""
    import ray
    import ray.data as rd

    from sous_chef_ray.stages.join import distinct_key_array

    res = _execute_select(node.sel, sf_dir, num_buckets, broadcast_rows)
    if isinstance(res, pd.DataFrame):
        if res.shape[1] != 1:
            raise ValueError("IN subquery must select exactly one column")
        arr = pa.Array.from_pandas(res.iloc[:, 0])
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        arr = pc.unique(arr)
    elif res.schema() is None:
        # Ray loses the schema on an empty stream: the IN set is empty
        arr = pa.array([], type=pa.null())
    else:
        names = res.schema().names
        if len(names) != 1:
            raise ValueError("IN subquery must select exactly one column")
        arr = distinct_key_array(res, names[0])
    has_null = arr.null_count > 0
    arr = arr.drop_null()
    return InSet(node.operand, ray.put(arr), node.negated, has_null)


def _decorrelate_exists(node: Exists, sf_dir: str, num_buckets: int,
                        broadcast_rows: int):
    """[NOT] EXISTS (SELECT … WHERE inner.k = outer.x AND <inner preds>)
    → the TPC-H Q4/Q22 decorrelation: inner-only predicates filter the
    subquery, its distinct correlation keys broadcast as a semi filter
    on the outer stream (InSet with null_is_false — a NULL outer key
    matches nothing). Uncorrelated EXISTS folds to a boolean literal."""
    sub = node.sel
    refs = [sub.frm] + [j.ref for j in sub.joins]
    ref_cols = [_ref_columns(r, sf_dir) for r in refs]

    def scope(e) -> str:
        cols = _find(e, Col)
        if not cols:
            return "const"
        inner = 0
        for c in cols:
            try:
                _resolve_col(c, refs, ref_cols)
                inner += 1
            except (KeyError, ValueError):
                pass
        if inner == len(cols):
            return "inner"
        if inner == 0:
            return "outer"
        return "mixed"

    corr = None
    neq = None
    inner_conjs: list = []
    for cj in (_conjuncts(sub.where) if sub.where is not None else []):
        if isinstance(cj, Bin) and cj.op == "=" and corr is None:
            s1, s2 = scope(cj.left), scope(cj.right)
            if {s1, s2} == {"inner", "outer"}:
                corr = ((cj.left, cj.right) if s1 == "inner"
                        else (cj.right, cj.left))
                continue
        if isinstance(cj, Bin) and cj.op in ("<>", "!=") and neq is None:
            s1, s2 = scope(cj.left), scope(cj.right)
            if {s1, s2} == {"inner", "outer"}:
                neq = ((cj.left, cj.right) if s1 == "inner"
                       else (cj.right, cj.left))
                continue
        if scope(cj) in ("inner", "const"):
            inner_conjs.append(cj)
        else:
            raise ValueError(
                "unsupported EXISTS correlation (one equality correlation "
                "plus optionally one <> correlation plus inner-only "
                "predicates is supported)")
    inner_where = _and_all(inner_conjs) if inner_conjs else None
    if neq is not None and corr is None:
        raise ValueError("a <> EXISTS correlation needs an accompanying "
                         "equality correlation")
    if corr is None:
        probe = Select(items=[("__k", Col(ref_cols[0][0]))], frm=sub.frm,
                       joins=sub.joins, where=inner_where, limit=1)
        res = _execute_select(probe, sf_dir, num_buckets, broadcast_rows)
        n = len(res) if isinstance(res, pd.DataFrame) else res.count()
        return Lit(n > 0, "bool")
    inner_e, outer_e = corr
    if neq is not None:
        import ray

        n_inner, n_outer = neq
        # bounded pre-aggregate: one row per distinct correlation key
        agg_sel = Select(
            items=[("__k", inner_e),
                   ("__mn", Func("MIN", (n_inner,))),
                   ("__mx", Func("MAX", (n_inner,)))],
            frm=sub.frm, joins=sub.joins, where=inner_where,
            group_by=[inner_e])
        res = _execute_select(agg_sel, sf_dir, num_buckets, broadcast_rows)
        if not isinstance(res, pd.DataFrame):
            res = res.to_pandas()
        tab = pa.Table.from_pandas(res, preserve_index=False)
        # a NULL correlation key matches nothing (EXISTS semantics)
        tab = tab.filter(pc.is_valid(tab["__k"].combine_chunks()))
        return ExistsNeq(outer_e, n_outer, ray.put(tab))
    key_sel = Select(items=[("__k", inner_e)], frm=sub.frm,
                     joins=sub.joins, where=inner_where)
    ins = _in_subquery_set(InSubquery(outer_e, key_sel, False), sf_dir,
                           num_buckets, broadcast_rows)
    return InSet(ins.operand, ins.keys, False, ins.set_has_null,
                 null_is_false=True)


def _try_decorrelate_scalar(sub: Select, sf_dir: str, idx: int):
    """Correlated scalar aggregate subquery — the TPC-H Q17 shape
    ``(SELECT AGG(e) FROM inner WHERE inner.k = outer.x AND <inner
    preds>)`` — decorrelated into a per-key pre-aggregate joined back as
    a LEFT-join derived table. Returns (JoinSpec, replacement expr), or
    None when the subquery is uncorrelated (the bounded Lit path applies).

    SQL empty-group semantics ride the LEFT join: no inner rows for an
    outer key → NULL (COUNT → COALESCE 0)."""
    if (sub.group_by or sub.qualify or sub.order_by or sub.limit
            or sub.distinct or len(sub.items) != 1):
        return None
    item_alias, e = sub.items[0]
    if not _find_aggs(e):
        return None
    refs = [sub.frm] + [j.ref for j in sub.joins]
    ref_cols = [_ref_columns(r, sf_dir) for r in refs]

    def scope(node) -> str:
        cols = _find(node, Col)
        if not cols:
            return "const"
        inner = 0
        for c in cols:
            try:
                _resolve_col(c, refs, ref_cols)
                inner += 1
            except (KeyError, ValueError):
                pass
        if inner == len(cols):
            return "inner"
        if inner == 0:
            return "outer"
        return "mixed"

    corr = None
    inner_conjs: list = []
    for cj in (_conjuncts(sub.where) if sub.where is not None else []):
        if isinstance(cj, Bin) and cj.op == "=" and corr is None:
            s1, s2 = scope(cj.left), scope(cj.right)
            if {s1, s2} == {"inner", "outer"}:
                corr = ((cj.left, cj.right) if s1 == "inner"
                        else (cj.right, cj.left))
                continue
        if scope(cj) in ("inner", "const"):
            inner_conjs.append(cj)
        else:
            raise ValueError(
                "unsupported scalar-subquery correlation (exactly one "
                "equality correlation plus inner-only predicates)")
    if corr is None:
        return None  # uncorrelated → bounded Lit materialization
    inner_e, outer_e = corr
    if not isinstance(outer_e, Col):
        raise ValueError("scalar-subquery correlation must compare a "
                         "plain outer column")
    if isinstance(e, Func) and e.name == "COUNT":
        repl_expr: object = Func("COALESCE",
                                 (Col(f"__cv{idx}"), Lit(0, "int")))
    elif any(a.name == "COUNT" for a in _find_aggs(e)):
        # a COUNT buried in an expression would need 0 (not NULL) on
        # empty groups — the LEFT join can't express that per-term
        raise ValueError("correlated scalar subquery: COUNT must be the "
                         "whole select expression")
    else:
        repl_expr = Col(f"__cv{idx}")
    key_sel = Select(
        items=[(f"__ck{idx}", inner_e), (f"__cv{idx}", e)],
        frm=sub.frm, joins=sub.joins,
        where=_and_all(inner_conjs) if inner_conjs else None,
        group_by=[inner_e])
    join = JoinSpec("left", TableRef(None, f"__corr{idx}", key_sel),
                    Bin("=", outer_e, Col(f"__ck{idx}")))
    return join, repl_expr


def _materialize_subqueries(sel: Select, sf_dir: str, num_buckets: int,
                            broadcast_rows: int) -> Select:
    """Replace ScalarSub → Lit and InSubquery → InSet throughout the
    statement's expressions (uncorrelated subqueries only — a correlated
    column fails resolution inside the subquery's own plan). A CORRELATED
    scalar aggregate subquery instead decorrelates into a LEFT-joined
    per-key pre-aggregate (_try_decorrelate_scalar)."""
    repl: dict = {}
    targets = [e for _, e in sel.items] + list(sel.group_by)
    if sel.where is not None:
        targets.append(sel.where)
    if sel.having is not None:
        targets.append(sel.having)
    if sel.qualify is not None:
        targets.append(sel.qualify)
    targets += [e for e, _ in sel.order_by]
    targets += [j.on for j in sel.joins if j.on is not None]
    new_joins: List[JoinSpec] = []
    for n in targets:
        for s in _walk(n):
            if isinstance(s, ScalarSub) and s not in repl:
                dec = _try_decorrelate_scalar(s.sel, sf_dir, len(new_joins))
                if dec is not None:
                    join, expr = dec
                    new_joins.append(join)
                    repl[s] = expr
                    continue
                repl[s] = _scalar_sub_lit(s.sel, sf_dir, num_buckets,
                                          broadcast_rows)
            elif isinstance(s, InSubquery) and s not in repl:
                repl[s] = _in_subquery_set(s, sf_dir, num_buckets,
                                           broadcast_rows)
            elif isinstance(s, Exists) and s not in repl:
                repl[s] = _decorrelate_exists(s, sf_dir, num_buckets,
                                              broadcast_rows)
    if not repl:
        return sel
    return Select(
        items=[(a, _replace(e, repl)) for a, e in sel.items],
        frm=sel.frm,
        joins=[JoinSpec(j.kind, j.ref,
                        _replace(j.on, repl) if j.on is not None else None)
               for j in sel.joins] + new_joins,
        where=_replace(sel.where, repl) if sel.where is not None else None,
        group_by=[_replace(g, repl) for g in sel.group_by],
        having=_replace(sel.having, repl) if sel.having is not None else None,
        qualify=(_replace(sel.qualify, repl)
                 if sel.qualify is not None else None),
        order_by=[(_replace(e, repl), d) for e, d in sel.order_by],
        limit=sel.limit, offset=sel.offset, distinct=sel.distinct,
        group_sets=sel.group_sets)


class _BroadcastMergeChain:
    """ONE actor-pool stage applying a whole run of consecutive
    broadcast dim-joins (+ interleaved residual filters).  A chain of
    separate actor-pool stages needs one minimum actor EACH — more
    minimum actors than CPUs deadlocks the streaming executor on small
    clusters (observed: the compiled six-relation Q5 at 4 CPUs), and
    each extra stage is an extra batch copy at 100 TB.  Dims live in
    the object store once (ray.put of the step list).

    Arrow-native: each merge step probes a stages/join.DimIndex built
    once per actor (``pc.index_in`` + null-masked ``Table.take``) —
    fact batches never round-trip through pandas, so list/token
    columns stay zero-copy and NUL-containing keys join exactly."""

    def __init__(self, steps_ref):
        import ray

        from sous_chef_ray.stages.join import DimIndex

        self.steps = []
        for step in ray.get(steps_ref):
            if step[0] == "merge":
                _, dim, on, right_on, how, resid = step
                drop = frozenset() if how == "cross" else frozenset(
                    r for l_, r in zip(on, right_on) if l_ == r)
                self.steps.append(
                    ("merge", DimIndex(dim, right_on, how, drop_keys=drop),
                     on, _mask_fn(resid) if resid is not None else None))
            else:  # ("filter", expr)
                self.steps.append(("filter", _filter_fn(step[1])))

    def __call__(self, batch: pa.Table) -> pa.Table:
        for step in self.steps:
            if step[0] == "merge":
                batch = step[1].merge(batch, step[2], resid_mask=step[3])
            else:
                batch = step[1](batch)
        return batch


def _plan_from(sel: Select, sf_dir: str, num_buckets: int,
               broadcast_rows: int):
    """FROM + WHERE → (Dataset-or-DataFrame, Col-substitution mapping).

    Scale shape:
      - every relation is read with ``columns=`` pruned to exactly the
        referenced names + join keys;
      - single-relation WHERE conjuncts are pushed to their relation's
        scan (as a pyarrow dataset filter when scan-expressible) — only
        pushed past null-preserving sides of outer joins;
      - a small right side (parquet metadata row count ≤
        ``broadcast_rows``, or a bounded aggregate subquery) joins via
        stages/join.broadcast_join — ``ray.put`` once, no shuffle of the
        big side — exactly the dim-table shape the hand-built queries
        use at 100 TB;
      - otherwise stages/join.hash_join (Ray's hash-partitioned
        ``Dataset.join``).  Ray's join keeps the LEFT key name and drops
        a differently-named right key column, so referenced right keys
        are re-aliased (inner: substituted with the left key; outer:
        kept alive via a pre-join copy).
    """
    import pyarrow.parquet as pq
    import ray.data as rd

    from sous_chef_ray.stages.join import hash_join

    refs = [sel.frm] + [j.ref for j in sel.joins]
    aliases = [r.alias for r in refs]
    if len(set(aliases)) != len(aliases):
        raise ValueError("duplicate table aliases in FROM clause")
    ref_cols = [_ref_columns(r, sf_dir) for r in refs]

    # GROUP BY may name a SELECT-item alias (DuckDB/Snowflake extension,
    # same contract as ORDER BY aliases): substitute the aliased
    # expression IN PLACE (indices are stable — grouping sets reference
    # group_by positions) unless the name is also a base column, which
    # wins per SQL resolution rules
    alias_exprs = {a.lower(): e for a, e in sel.items if a}
    base_names = {n.lower() for cols in ref_cols for n in cols}
    for gi, g in enumerate(sel.group_by):
        if (isinstance(g, Col) and g.qual is None
                and g.name.lower() in alias_exprs
                and g.name.lower() not in base_names):
            sel.group_by[gi] = alias_exprs[g.name.lower()]

    # resolve every column reference in the statement
    nodes = [e for _, e in sel.items] + list(sel.group_by)
    if sel.where is not None:
        nodes.append(sel.where)
    if sel.having is not None:
        nodes.append(sel.having)
    if sel.qualify is not None:
        nodes.append(sel.qualify)
    # ORDER BY may name a SELECT-item alias (e.g. ORDER BY n over
    # COUNT(*) AS n): aliases are output columns, not base columns —
    # exclude them from base-relation resolution (the finishers map
    # them to output names via _order_key)
    aliases = {a.lower() for a, _ in sel.items if a}
    nodes += [e for e, _ in sel.order_by
              if not (isinstance(e, Col) and e.qual is None
                      and e.name.lower() in aliases)]
    nodes += [j.on for j in sel.joins if j.on is not None]
    resolved: dict = {}
    for n in nodes:
        for c in _find(n, Col):
            if c not in resolved:
                resolved[c] = _resolve_col(c, refs, ref_cols)

    needed: List[set] = [set() for _ in refs]
    for c, (i, actual) in resolved.items():
        needed[i].add(actual)

    # reject cross-relation output-name collisions (same-named equi-join
    # keys are fine: the join dedups them to one column)
    same_key_names = set()
    on_pools = [j.on for j in sel.joins if j.on is not None]
    if sel.where is not None and any(j.kind == "comma" for j in sel.joins):
        on_pools.append(sel.where)  # comma joins take keys from WHERE
    for pool in on_pools:
        for conj in _conjuncts(pool):
            if (isinstance(conj, Bin) and conj.op == "="
                    and isinstance(conj.left, Col)
                    and isinstance(conj.right, Col)):
                _, n1 = resolved[conj.left]
                _, n2 = resolved[conj.right]
                if n1.lower() == n2.lower():
                    same_key_names.add(n1.lower())
    for a in range(len(refs)):
        for b in range(a + 1, len(refs)):
            clash = ({n.lower() for n in needed[a]}
                     & {n.lower() for n in needed[b]}) - same_key_names
            if clash:
                raise ValueError(
                    f"column name collision across joined relations: "
                    f"{sorted(clash)}; disambiguate via a derived table")

    # relation nullability under the join chain (for WHERE pushdown)
    nullable = [False] * len(refs)
    for k, j in enumerate(sel.joins):
        if j.kind == "left":
            nullable[k + 1] = True
        elif j.kind == "right":
            for i in range(k + 1):
                nullable[i] = True
        elif j.kind == "full":
            for i in range(k + 2):
                nullable[i] = True

    pushed: List[list] = [[] for _ in refs]
    residual: list = []
    if sel.where is not None:
        for conj in _conjuncts(sel.where):
            owners = {resolved[c][0] for c in _find(conj, Col)} or {0}
            o = next(iter(owners))
            if len(owners) == 1 and not nullable[o]:
                pushed[o].append(conj)
            else:
                residual.append(conj)

    def table_rows(i: int) -> Optional[int]:
        if refs[i].sub is not None:
            return None
        path = f"{sf_dir}/{refs[i].table}.parquet"
        return pq.ParquetFile(path).metadata.num_rows

    def build_side(i: int):
        """Relation i as a pruned, filtered Dataset (or DataFrame for a
        bounded aggregate subquery)."""
        ref = refs[i]
        cols = sorted(needed[i])
        if ref.sub is not None:
            side = _execute_select(ref.sub, sf_dir, num_buckets,
                                   broadcast_rows)
            if isinstance(side, pd.DataFrame):
                t = pa.Table.from_pandas(side, preserve_index=False)
                if pushed[i]:
                    t = _filter_fn(_and_all(pushed[i]))(t)
                return (t.select(cols) if cols else t).to_pandas()
            if cols:
                side = side.select_columns(cols)
            if pushed[i]:
                side = side.map_batches(_filter_fn(_and_all(pushed[i])),
                                        batch_format="pyarrow",
                                        zero_copy_batch=True)
            return side
        path = f"{sf_dir}/{ref.table}.parquet"
        if not cols:
            # COUNT(*)-only over this relation: zero-column Arrow blocks
            # lose their row count through Ray — keep the first (narrow,
            # key) column at the scan instead
            cols = [pq.ParquetFile(path).schema_arrow.names[0]]
        # partial pushdown: each conjunct lands in the scan when
        # scan-expressible; only the rest become a runtime filter
        scan_parts, rt_parts = [], []
        for conj in pushed[i]:
            try:
                scan_parts.append(_to_scan_filter(conj))
            except ValueError:
                rt_parts.append(conj)
        scan_filter = None
        for sp in scan_parts:
            scan_filter = sp if scan_filter is None else (scan_filter & sp)
        ds_i = rd.read_parquet(path, columns=cols, filter=scan_filter)
        if rt_parts:
            ds_i = ds_i.map_batches(_filter_fn(_and_all(rt_parts)),
                                    batch_format="pyarrow",
                                    zero_copy_batch=True)
        return ds_i

    def build_small(i: int) -> pa.Table:
        """Small base relation as a bounded in-memory dim table."""
        small_cols = sorted(needed[i])
        t = pq.read_table(f"{sf_dir}/{refs[i].table}.parquet",
                          columns=small_cols or None)
        if pushed[i]:
            t = _filter_fn(_and_all(pushed[i]))(t)
        return t

    mapping = {c: Col(actual) for c, (i, actual) in resolved.items()
               if c != Col(actual)}

    if not sel.joins:
        side = build_side(0)
        if residual:  # constant-only conjuncts can land here
            if isinstance(side, pd.DataFrame):
                t = _filter_fn(_and_all(residual))(
                    pa.Table.from_pandas(side, preserve_index=False))
                side = t.to_pandas()
            else:
                side = side.map_batches(_filter_fn(_and_all(residual)),
                                        batch_format="pyarrow",
                                        zero_copy_batch=True)
        return side, mapping

    left = build_side(0)
    if isinstance(left, pd.DataFrame):
        left = rd.from_pandas(left)

    pending: list = []  # consecutive broadcast steps → ONE actor stage

    def flush_chain(lhs):
        if not pending:
            return lhs
        import ray as _ray

        from sous_chef_ray.stages._util import pool as _pool

        ref = _ray.put(list(pending))
        pending.clear()
        return lhs.map_batches(
            _BroadcastMergeChain,
            fn_constructor_kwargs=dict(steps_ref=ref),
            batch_format="pyarrow", zero_copy_batch=True,
            concurrency=_pool(4))

    for k, j in enumerate(sel.joins):
        ri = k + 1
        kind = j.kind
        eq: List[Tuple[str, str]] = []
        resid_on: list = []
        if kind == "comma":
            # implicit join: claim equi conjuncts between this relation
            # and the joined prefix from the WHERE pool; any other
            # conjunct fully contained in the prefix+this relation
            # applies right after this join (inner semantics)
            prefix_ok = all(j2.kind in ("inner", "cross", "comma")
                            for j2 in sel.joins[:ri])
            remaining: list = []
            for conj in residual:
                owners = {resolved[c][0] for c in _find(conj, Col)}
                if (isinstance(conj, Bin) and conj.op == "="
                        and isinstance(conj.left, Col)
                        and isinstance(conj.right, Col)):
                    i1, n1 = resolved[conj.left]
                    i2, n2 = resolved[conj.right]
                    if i1 < ri and i2 == ri:
                        eq.append((n1, n2))
                        continue
                    if i2 < ri and i1 == ri:
                        eq.append((n2, n1))
                        continue
                if (prefix_ok and owners and ri in owners
                        and owners <= set(range(ri + 1))):
                    resid_on.append(conj)
                    continue
                remaining.append(conj)
            residual = remaining
            kind = "inner" if eq else "cross"
        else:
            for conj in _conjuncts(j.on) if j.on is not None else []:
                done = False
                if (isinstance(conj, Bin) and conj.op == "="
                        and isinstance(conj.left, Col)
                        and isinstance(conj.right, Col)):
                    i1, n1 = resolved[conj.left]
                    i2, n2 = resolved[conj.right]
                    if i1 < ri and i2 == ri:
                        eq.append((n1, n2))
                        done = True
                    elif i2 < ri and i1 == ri:
                        eq.append((n2, n1))
                        done = True
                if not done:
                    resid_on.append(conj)
            if kind != "cross" and not eq:
                raise ValueError("JOIN ON requires at least one equi-key "
                                 "(a.x = b.y) condition")
        # LEFT JOIN ON-predicates owned solely by the right relation
        # filter the right side BEFORE the join (SQL ON semantics: left
        # rows are preserved either way)
        right_pre = None
        if resid_on and kind == "left":
            rp = [c for c in resid_on
                  if {resolved[cc][0] for cc in _find(c, Col)} <= {ri}]
            if rp:
                right_pre = _and_all(rp)
                resid_on = [c for c in resid_on if c not in rp]
        if resid_on and kind not in ("inner", "cross", "left"):
            raise ValueError("non-equi ON conditions are only supported "
                             "for INNER and LEFT JOIN")

        right_side = build_side(ri) if refs[ri].sub is not None else None
        dim = None
        if kind in ("inner", "left", "cross"):
            if isinstance(right_side, pd.DataFrame):
                dim = right_side
            elif right_side is None:
                nrows = table_rows(ri)
                if nrows is not None and nrows <= broadcast_rows:
                    dim = build_small(ri)
        if dim is not None:
            if isinstance(dim, pd.DataFrame):
                dim = pa.Table.from_pandas(dim, preserve_index=False)
            if right_pre is not None:
                dim = _filter_fn(right_pre)(dim)
            if kind == "left":
                # same-named equi-keys collapse to the preserved (left)
                # side's column in the merged batch; a referenced right
                # key must stay independently null-extendable (SQL:
                # ``b.k IS NULL`` marks unmatched rows) → keep it alive
                # as a renamed dim payload column and remap references
                for n_l, n_r in eq:
                    if n_l == n_r and n_r in needed[ri]:
                        keep = f"__jk_{ri}_{n_r}"
                        dim = dim.append_column(keep, dim[n_r])
                        for c, (i_, a_) in resolved.items():
                            if i_ == ri and a_ == n_r:
                                mapping[c] = Col(keep)
            if kind == "cross":
                pending.append(("merge", dim, None, None, "cross", None))
            elif kind == "left" and resid_on:
                # non-equi ON on LEFT JOIN: the residual decides MATCHING
                # (failing matches drop, the left row null-extends iff no
                # match passes) — it rides inside the merge step; a
                # post-join filter would wrongly drop preserved rows
                pending.append((
                    "merge", dim, [p[0] for p in eq], [p[1] for p in eq],
                    "left",
                    _and_all([_replace(c, mapping) for c in resid_on])))
                resid_on = []
            else:
                pending.append((
                    "merge", dim, [p[0] for p in eq], [p[1] for p in eq],
                    {"inner": "inner", "left": "left"}[kind], None))
            if resid_on:
                pending.append(
                    ("filter",
                     _and_all([_replace(c, mapping) for c in resid_on])))
            continue
        else:
            if kind == "cross":
                raise ValueError("CROSS JOIN right side too large to "
                                 "broadcast")
            if resid_on and kind == "left":
                # the residual decides MATCHING on an outer join — a
                # post-join filter would drop preserved rows; only the
                # broadcast merge implements the collapse
                raise ValueError(
                    "non-equi ON on LEFT JOIN needs the right side "
                    "within the broadcast threshold (broadcast_rows)")
            left = flush_chain(left)
            right = right_side if right_side is not None else build_side(ri)
            if isinstance(right, pd.DataFrame):
                right = rd.from_pandas(right)
            if right_pre is not None:
                right = right.map_batches(_filter_fn(right_pre),
                                          batch_format="pyarrow",
                                          zero_copy_batch=True)
            for n_l, n_r in eq:
                if n_r not in needed[ri]:
                    continue
                if kind == "inner":
                    if n_l == n_r:
                        continue  # join keeps the one shared key column
                    repl = Col(n_l)
                else:
                    # outer join: Ray's join keeps the LEFT key column
                    # (null-extended on its own schedule) and drops the
                    # right key — a referenced right key must survive
                    # independently (``b.k IS NULL`` anti-join idiom),
                    # SAME-NAMED OR NOT, via a pre-join copy
                    keep = f"__jk_{ri}_{n_r}"
                    right = right.map_batches(
                        lambda t, _n=n_r, _k=keep:
                            t.append_column(_k, t[_n]),
                        batch_format="pyarrow", zero_copy_batch=True)
                    repl = Col(keep)
                for c, (i_, a_) in resolved.items():
                    if i_ == ri and a_ == n_r:
                        mapping[c] = repl
            # Ray's hash-shuffle join spawns aggregator actors per
            # partition; far more partitions than CPUs deadlocks actor
            # scheduling on small clusters (observed: 64 partitions on a
            # 4-CPU local cluster never schedules). Cap at 2× CPUs.
            import ray as _ray

            cpus = (int(_ray.cluster_resources().get("CPU", 8))
                    if _ray.is_initialized() else 8)
            left = hash_join(
                left, right, on=[p[0] for p in eq],
                right_on=[p[1] for p in eq],
                join_type={"inner": "inner", "left": "left_outer",
                           "right": "right_outer",
                           "full": "full_outer"}[kind],
                num_partitions=max(2, min(num_buckets, cpus * 2)))
        if resid_on:
            # rewrite through the incrementally-built mapping: a
            # predicate naming a right key column that the physical
            # join dropped must point at its __jk_ keep-alive copy
            left = left.map_batches(
                _filter_fn(_and_all([_replace(c, mapping)
                                     for c in resid_on])),
                batch_format="pyarrow", zero_copy_batch=True)
    left = flush_chain(left)
    if residual:
        left = left.map_batches(
            _filter_fn(_and_all([_replace(c, mapping) for c in residual])),
            batch_format="pyarrow", zero_copy_batch=True)
    return left, mapping


def _rewrite_select(sel: Select, mapping: dict) -> Select:
    """Substitute resolved/qualified Cols with their post-join names; the
    WHERE clause has already been applied by the planner."""
    return Select(
        items=[(a, _replace(e, mapping)) for a, e in sel.items],
        frm=sel.frm, joins=sel.joins, where=None,
        group_by=[_replace(g, mapping) for g in sel.group_by],
        having=(_replace(sel.having, mapping)
                if sel.having is not None else None),
        qualify=(_replace(sel.qualify, mapping)
                 if sel.qualify is not None else None),
        order_by=[(_replace(e, mapping), d) for e, d in sel.order_by],
        limit=sel.limit, offset=sel.offset, distinct=sel.distinct,
        group_sets=sel.group_sets)


def sql_execute(sql: str, sf_dir: str, *, num_buckets: int = 64,
                broadcast_rows: int = 200_000):
    """Compile + run a tier-C SELECT over ``{sf_dir}/{table}.parquet``.

    Returns a streaming ``ray.data.Dataset`` for projection-only
    statements, a bounded ``pandas.DataFrame`` for aggregates (one row
    per group — same contract as the hand-built queries)."""
    from sous_chef_ray.validators import SQLValidator

    # gate on the ported reference validator first: this is the bridge
    # from the reference's validation surface (validators.py, ported from
    # ref src/sous_chef/validators.py) to execution
    if not SQLValidator.validate_sql(sql):
        raise ValueError("query rejected by SQL validator")

    stmt = _Parser(sql).parse_statement()
    if isinstance(stmt, Compound):
        return _execute_compound(stmt, sf_dir, num_buckets, broadcast_rows)
    return _execute_select(stmt, sf_dir, num_buckets, broadcast_rows)


def _setop(a, b, names: List[str], kind: str):
    """Distributed INTERSECT/EXCEPT [ALL]: tag per-side indicator
    columns, one hash aggregate over ALL output columns (the same
    single-shuffle shape as _distinct_ds), then an offset-arithmetic
    row expansion by the SQL multiset count:
      intersect      → 1 copy where both sides have the row
      intersect_all  → min(count_a, count_b) copies
      except         → 1 copy where only side A has it
      except_all     → max(count_a − count_b, 0) copies."""
    from ray.data.aggregate import Sum

    def tag(a_side: bool):
        def fn(t: pa.Table) -> pa.Table:
            one = pa.array(np.ones(len(t), np.int64))
            zero = pa.array(np.zeros(len(t), np.int64))
            t = t.append_column("__sa", one if a_side else zero)
            return t.append_column("__sb", zero if a_side else one)

        return fn

    ta = a.map_batches(tag(True), batch_format="pyarrow",
                       zero_copy_batch=True)
    tb = b.map_batches(tag(False), batch_format="pyarrow",
                       zero_copy_batch=True)
    g = ta.union(tb).groupby(names).aggregate(
        Sum("__sa", alias_name="__ca"), Sum("__sb", alias_name="__cb"))

    def expand(t: pa.Table) -> pa.Table:
        ca = pc.fill_null(t["__ca"], 0).to_numpy(zero_copy_only=False)
        cb = pc.fill_null(t["__cb"], 0).to_numpy(zero_copy_only=False)
        if kind == "intersect":
            copies = ((ca > 0) & (cb > 0)).astype(np.int64)
        elif kind == "intersect_all":
            copies = np.minimum(ca, cb)
        elif kind == "except":
            copies = ((ca > 0) & (cb == 0)).astype(np.int64)
        else:  # except_all
            copies = np.maximum(ca - cb, 0)
        idx = np.repeat(np.arange(len(t), dtype=np.int64), copies)
        return t.take(pa.array(idx)).drop_columns(["__ca", "__cb"])

    return g.map_batches(expand, batch_format="pyarrow",
                         zero_copy_batch=True)


def _execute_compound(comp: Compound, sf_dir: str, num_buckets: int,
                      broadcast_rows: int):
    """Set-operation chains: plan each branch (recursively for nested
    INTERSECT terms), fold left-associative — UNION ALL appends, runs of
    UNION DISTINCT collapse to one hash dedup, INTERSECT/EXCEPT go
    through the tagged-count kernel. Trailing ORDER BY / LIMIT on the
    combined stream."""
    import ray.data as rd

    names = None
    parts = []
    for s in comp.selects:
        if isinstance(s, Compound):
            p = _execute_compound(s, sf_dir, num_buckets, broadcast_rows)
        else:
            p = _execute_select(s, sf_dir, num_buckets, broadcast_rows)
        if isinstance(p, pd.DataFrame):
            p = rd.from_pandas(p)
        cols = p.schema().names
        if names is None:
            names = cols
        elif cols != names:
            raise ValueError(f"set-operation branches must produce "
                             f"identical column names: {names} vs {cols}")
        parts.append(p)
    out = parts[0]
    i = 0
    while i < len(comp.ops):
        op = comp.ops[i]
        if op == "union_all":
            out = out.union(parts[i + 1])
            i += 1
        elif op == "union":
            # dedup(dedup(A∪B)∪C) ≡ dedup(A∪B∪C): collapse the run
            j = i
            while j < len(comp.ops) and comp.ops[j] == "union":
                j += 1
            out = out.union(*parts[i + 1:j + 1])
            out = _distinct_ds(out, names)
            i = j
        else:
            out = _setop(out, parts[i + 1], names, op)
            i += 1
    if comp.order_by:
        named = [(n, Col(n)) for n in names]
        keys = [_order_key(named, e) for e, _ in comp.order_by]
        out = out.sort(keys, descending=[d for _, d in comp.order_by])
    if comp.limit is not None:
        out = out.limit(comp.limit)
    return out


def _limit_offset(out, limit: int, offset: int):
    """LIMIT n OFFSET m over a SORTED stream: fetch the first m+n rows
    (streaming limit), gather the bounded remainder ORDER-PRESERVING
    (iter_batches keeps dataset order; repartition would not) and slice
    off the offset — ≤ m+n rows ever materialize."""
    import ray.data as rd

    if not offset:
        return out.limit(limit)
    head = pa.concat_tables(
        out.limit(limit + offset).iter_batches(batch_size=None,
                                               batch_format="pyarrow"))
    return rd.from_arrow(head.slice(offset))


def _distinct_ds(out, names: List[str]):
    """Full-row distinct: one hash aggregate over all columns."""
    from ray.data.aggregate import Count

    out = out.groupby(names).aggregate(Count(alias_name="__dn"))
    return out.map_batches(lambda t: t.drop_columns(["__dn"]),
                           batch_format="pyarrow", zero_copy_batch=True)


def _execute_select(sel: Select, sf_dir: str, num_buckets: int,
                    broadcast_rows: int):
    import ray.data as rd

    _expand_stars(sel, sf_dir)
    sel = _materialize_subqueries(sel, sf_dir, num_buckets, broadcast_rows)
    ds, mapping = _plan_from(sel, sf_dir, num_buckets, broadcast_rows)
    sel = _rewrite_select(sel, mapping)
    if isinstance(ds, pd.DataFrame):
        ds = rd.from_pandas(ds)

    aggs = []
    for _, e in sel.items:
        aggs.extend(_find_aggs(e))
    if sel.having is not None:
        aggs.extend(_find_aggs(sel.having))
    if sel.qualify is not None:
        aggs.extend(_find_aggs(sel.qualify))

    if sel.group_by or aggs:
        return _execute_aggregate(ds, sel, aggs, num_buckets)

    wins = []
    for _, e in sel.items:
        wins.extend(_find(e, Win))
    if wins or sel.qualify is not None:
        return _execute_window(ds, sel, wins, num_buckets)

    # pure projection → streaming Dataset
    named = [(_out_name(a, e), e) for a, e in sel.items]
    out = ds.map_batches(_project_fn(named), batch_format="pyarrow",
                         zero_copy_batch=True)
    if sel.distinct:
        out = _distinct_ds(out, [n for n, _ in named])
    if sel.order_by:
        keys = [_order_key(named, e) for e, _ in sel.order_by]
        out = out.sort(keys, descending=[d for _, d in sel.order_by])
    if sel.limit is not None:
        out = _limit_offset(out, sel.limit, sel.offset)
    return out


def _order_key(named: List[Tuple[str, object]], expr) -> str:
    """ORDER BY entry → output column name (alias, column, or ordinal)."""
    if isinstance(expr, Lit) and isinstance(expr.value, int):
        return named[expr.value - 1][0]
    for name, e in named:
        if e == expr:
            return name
    if isinstance(expr, Col):
        for name, e in named:
            if name.lower() == expr.name.lower():
                return name
        return expr.name
    raise ValueError(f"ORDER BY expression not in select list: {expr!r}")


def _eval_bounded_window(at: pa.Table, w: Win):
    """Rank-family window over the BOUNDED post-aggregate table (one row
    per group — driver-side by design): ROW_NUMBER / RANK / DENSE_RANK
    with arbitrary PARTITION BY / multi-key ORDER BY."""
    n = len(at)
    fname = w.func.name
    if fname not in ("ROW_NUMBER", "RANK", "DENSE_RANK"):
        raise ValueError(f"unsupported window function {fname} over an "
                         "aggregated result")
    cols_p = {}
    for i, p in enumerate(w.partition_by):
        v = eval_expr(p, at)
        cols_p[f"p{i}"] = (v.combine_chunks() if isinstance(
            v, pa.ChunkedArray) else v).to_pandas()
    cols_o = {}
    descs = []
    for j, (o, d) in enumerate(w.order_by):
        v = eval_expr(o, at)
        cols_o[f"o{j}"] = (v.combine_chunks() if isinstance(
            v, pa.ChunkedArray) else v).to_pandas()
        descs.append(d)
    df = pd.DataFrame({**cols_p, **cols_o})
    sorted_index = df.sort_values(
        list(cols_p) + list(cols_o),
        ascending=[True] * len(cols_p) + [not d for d in descs],
        kind="mergesort").index.to_numpy()
    sdf = df.iloc[sorted_index].reset_index(drop=True)
    arange = np.arange(n)

    def _neq_shift(frame: pd.DataFrame) -> np.ndarray:
        # null-aware row-change detection: SQL PARTITION BY groups NULL
        # keys together, but pandas NaN != NaN is True — mask out the
        # both-null positions so a NULL key doesn't restart per row
        prev = frame.shift()
        neq = (frame != prev) & ~(frame.isna() & prev.isna())
        return neq.any(axis=1).to_numpy()

    if cols_p:
        part_change = _neq_shift(sdf[list(cols_p)])
    else:
        part_change = np.zeros(n, dtype=bool)
    if n:
        part_change[0] = True
    part_start = np.maximum.accumulate(np.where(part_change, arange, 0))
    if fname == "ROW_NUMBER":
        out_sorted = arange - part_start + 1
    else:
        val_change = part_change | _neq_shift(sdf[list(cols_o)])
        if n:
            val_change[0] = True
        if fname == "RANK":
            first_tie = np.maximum.accumulate(np.where(val_change, arange, 0))
            out_sorted = first_tie - part_start + 1
        else:  # DENSE_RANK
            g = np.cumsum(val_change)
            g_at_start = np.maximum.accumulate(np.where(part_change, g, 0))
            out_sorted = g - g_at_start + 1
    out = np.empty(n, dtype=np.int64)
    out[sorted_index] = out_sorted
    return pa.array(out)


def _execute_aggregate(ds, sel: Select, aggs: List[Func], num_buckets: int):
    """GROUP BY plan: per-batch projection of keys + aggregate args →
    Dataset.groupby().aggregate() (partial/combine inside Ray's hash
    aggregate) → bounded post-aggregate expression evaluation."""
    from ray.data.aggregate import Count, Max, Min, Sum

    from sous_chef_ray.stages.agg import distinct_count_sum

    # group keys: resolve ordinals (GROUP BY 1) to select expressions
    key_exprs = []
    for g in sel.group_by:
        if isinstance(g, Lit) and isinstance(g.value, int):
            key_exprs.append(sel.items[g.value - 1][1])
        else:
            key_exprs.append(g)
    key_names = []
    for i, ke in enumerate(key_exprs):
        for a, e in sel.items:
            if e == ke:
                key_names.append(_out_name(a, e))
                break
        else:
            key_names.append(ke.name if isinstance(ke, Col) else f"__k{i}")

    # unique aggregates → computed argument columns
    uniq: List[Func] = []
    for a in aggs:
        if a not in uniq:
            uniq.append(a)
    distinct_aggs = [a for a in uniq if a.distinct]
    # DISTINCT aggregates: any number of COUNT/SUM/AVG(DISTINCT x); aggs
    # sharing an argument expression share ONE distinct reduce pass
    d_args: List[object] = []
    d_need_sum: List[bool] = []
    d_of: dict = {}
    for idx, a in enumerate(distinct_aggs):
        if a.name not in ("COUNT", "SUM", "AVG"):
            raise ValueError(
                f"unsupported DISTINCT aggregate {a.name} (COUNT/SUM/AVG)")
        arg = a.args[0]
        try:
            j = d_args.index(arg)
        except ValueError:
            j = len(d_args)
            d_args.append(arg)
            d_need_sum.append(False)
        if a.name in ("SUM", "AVG"):
            d_need_sum[j] = True
        d_of[a] = j
    q_aggs = [a for a in uniq if not a.distinct and a.name in _QUANTILE_FNS]
    plain = [a for a in uniq if not a.distinct and a.name not in _QUANTILE_FNS]
    if sel.group_sets is not None and (distinct_aggs or q_aggs):
        raise ValueError("DISTINCT / quantile aggregates are not supported "
                         "with ROLLUP / CUBE / GROUPING SETS")

    proj: List[Tuple[str, object]] = list(zip(key_names, key_exprs))
    ray_aggs = []
    agg_col = {}
    for i, a in enumerate(plain):
        nm = f"__agg{i}"
        agg_col[a] = nm
        if a.name == "COUNT" and (not a.args or isinstance(a.args[0], Star)):
            ray_aggs.append(Count(alias_name=nm))
            continue
        arg = a.args[0]
        if a.name == "COUNT":
            # COUNT(x): count non-null → exact Sum of validity
            proj.append((nm, Cast(IsNull(arg, negated=True), "BIGINT")))
            ray_aggs.append(Sum(nm, alias_name=nm))
        elif a.name == "SUM":
            proj.append((nm, arg))
            ray_aggs.append(Sum(nm, alias_name=nm))
        elif a.name == "MIN":
            proj.append((nm, arg))
            ray_aggs.append(Min(nm, alias_name=nm))
        elif a.name == "MAX":
            proj.append((nm, arg))
            ray_aggs.append(Max(nm, alias_name=nm))
        elif a.name == "AVG":
            # AVG = exact SUM(double) / COUNT(non-null), divided post-agg
            proj.append((nm, Cast(arg, "DOUBLE")))
            proj.append((nm + "_n", Cast(IsNull(arg, negated=True), "BIGINT")))
            ray_aggs.append(Sum(nm, alias_name=nm))
            ray_aggs.append(Sum(nm + "_n", alias_name=nm + "_n"))
        else:
            raise ValueError(f"unsupported aggregate {a.name}")
    for idx, a in enumerate(distinct_aggs):
        agg_col[a] = f"__adv{idx}"
    for j, arg in enumerate(d_args):
        proj.append((f"__ad{j}_in", arg))
    for i, a in enumerate(q_aggs):
        agg_col[a] = f"__qa{i}"
        proj.append((f"__qa{i}_in", a.args[0]))

    # COUNT(*)-only global aggregate: an empty projection would emit
    # zero-column batches, and Arrow blocks with no columns carry no row
    # count through Ray's shuffle — project the constant group key instead
    proj_has_g = False
    if not proj:
        proj.append(("__g", Lit(0, "int")))
        proj_has_g = True

    slim = ds.map_batches(_project_fn(proj), batch_format="pyarrow",
                          zero_copy_batch=True)
    # >1 consumer of the pruned projection (main aggregate + each
    # quantile pass + count_distinct) → pin it once instead of
    # recomputing the read+project per consumer (slim is the narrow
    # post-projection table; spill beats recompute — same call as the
    # prepare_corpus two-consumer branch)
    if len(q_aggs) + len(d_args) >= 1:
        slim = slim.materialize()

    # exact quantiles (MEDIAN / QUANTILE_CONT / QUANTILE_DISC): bucketed
    # partition_apply per key group (stages/agg), merged onto the bounded
    # post-aggregate table
    q_tables = []
    if q_aggs:
        from sous_chef_ray.stages.agg import group_quantile, group_quantile_disc

        s2 = slim
        qkeys = key_names
        if not key_names:
            if not proj_has_g:
                s2 = slim.map_batches(
                    lambda t: t.append_column(
                        "__g", pa.array(np.zeros(len(t), np.int8))),
                    batch_format="pyarrow")
            qkeys = ["__g"]
        for i, a in enumerate(q_aggs):
            if a.name == "MEDIAN":
                q = 0.5
            else:
                if len(a.args) != 2 or not isinstance(a.args[1], Lit):
                    raise ValueError(f"{a.name} needs a literal quantile "
                                     "argument")
                q = float(a.args[1].value)
            fn = (group_quantile_disc if a.name == "QUANTILE_DISC"
                  else group_quantile)
            qt = fn(s2, qkeys, f"__qa{i}_in", q=q, name=f"__qa{i}",
                    num_buckets=num_buckets).to_pandas()
            q_tables.append(qt)

    if not key_names:
        # global aggregate: Ray needs a groupby key → constant key column
        if not proj_has_g:
            slim = slim.map_batches(
                lambda t: t.append_column(
                    "__g", pa.array(np.zeros(len(t), np.int8))),
                batch_format="pyarrow")
        agg_t = slim.groupby("__g").aggregate(*ray_aggs).to_pandas() \
            if ray_aggs else pd.DataFrame({"__g": [0]})
        if "__g" in agg_t.columns:
            agg_t = agg_t.drop(columns=["__g"])
        if not len(agg_t):
            # empty input: a global aggregate still yields exactly one
            # row — COUNT = 0, SUM/MIN/MAX/AVG = NULL
            row = {}
            for a in plain:
                nm = agg_col[a]
                row[nm] = 0 if a.name == "COUNT" else np.nan
                if a.name == "AVG":
                    row[nm + "_n"] = np.nan
            agg_t = pd.DataFrame([row])
    elif ray_aggs:
        agg_t = slim.groupby(key_names).aggregate(*ray_aggs).to_pandas()
    else:
        # no plain aggregates (quantile-/distinct-only, or bare GROUP BY
        # = DISTINCT): reduce to the distinct key set
        agg_t = slim.groupby(key_names).aggregate(
            Count(alias_name="__gn")).to_pandas()
        agg_t = agg_t.drop(columns=["__gn"], errors="ignore")
    if key_names and not agg_t.shape[1]:
        # Ray's hash aggregate over an EMPTY stream returns a
        # zero-column table; rebuild the expected empty frame so the
        # final projection still sees the group keys and agg columns
        cols = list(key_names)
        for a in plain:
            nm = agg_col[a]
            cols.append(nm)
            if a.name == "AVG":
                cols.append(nm + "_n")
        agg_t = _empty_frame(cols)

    if distinct_aggs:
        # global DISTINCT aggregates: slim already carries the constant
        # __g key by this point — bucket on it (partition_apply needs ≥1)
        dkeys = key_names if key_names else ["__g"]
        for j in range(len(d_args)):
            cn = f"__ad{j}_cnt"
            sn = f"__ad{j}_sum" if d_need_sum[j] else None
            dctx = distinct_count_sum(
                slim, dkeys, f"__ad{j}_in", cnt_name=cn, sum_name=sn,
                num_buckets=num_buckets).to_pandas()
            if not key_names:
                agg_t[cn] = np.int64(dctx[cn].iloc[0] if len(dctx) else 0)
                if sn:
                    agg_t[sn] = (dctx[sn].iloc[0] if len(dctx) else np.nan)
            else:
                if not dctx.shape[1]:
                    dctx = _empty_frame(
                        [*key_names, cn, *([sn] if sn else [])])
                agg_t = agg_t.merge(dctx, on=key_names, how="left")
                agg_t[cn] = agg_t[cn].fillna(0).astype("int64")
        # derive each DISTINCT aggregate's output column from (cnt, sum)
        for a in distinct_aggs:
            j, nm = d_of[a], agg_col[a]
            cn, sn = f"__ad{j}_cnt", f"__ad{j}_sum"
            if a.name == "COUNT":
                agg_t[nm] = agg_t[cn]
            elif a.name == "SUM":
                # SQL: SUM over zero distinct non-null values is NULL;
                # keep the exact integer dtype when no group is empty
                if bool((agg_t[cn] == 0).any()):
                    agg_t[nm] = agg_t[sn].astype("float64").where(
                        agg_t[cn] > 0, np.nan)
                else:
                    agg_t[nm] = agg_t[sn]
            else:  # AVG(DISTINCT) = sum/count of the distinct values
                c = agg_t[cn].to_numpy(dtype=np.float64)
                s = agg_t[sn].to_numpy(dtype=np.float64)
                with np.errstate(invalid="ignore", divide="ignore"):
                    agg_t[nm] = np.where(c > 0, s / c, np.nan)

    for i, qt in enumerate(q_tables):
        if key_names:
            if not qt.shape[1]:
                qt = _empty_frame([*key_names, f"__qa{i}"])
            agg_t = agg_t.merge(qt, on=key_names, how="left")
        else:
            # empty input: global quantile is NULL, like SUM/AVG
            # (np.nan keeps the column float64 — a Python None would
            # flip it to object dtype and change the output schema)
            agg_t[f"__qa{i}"] = (qt[f"__qa{i}"].iloc[0]
                                 if len(qt) else np.nan)

    if sel.group_sets is not None:
        # ROLLUP / CUBE / GROUPING SETS: re-aggregate the bounded
        # finest-grain table once per set (SUM/COUNT re-sum, MIN/MAX
        # re-extremize, AVG re-sums its parts), rolled-up keys → NULL
        agg_t = _expand_grouping_sets(agg_t, sel.group_sets, key_names,
                                      plain, agg_col)

    # bounded post-aggregate table (one row per group) → Arrow, then
    # evaluate the final select expressions with aggregates substituted
    at = pa.Table.from_pandas(agg_t, preserve_index=False)
    mapping = {a: Col(c) for a, c in agg_col.items()}
    for nm, ke in zip(key_names, key_exprs):
        mapping[ke] = Col(nm)
    if sel.group_sets is not None:
        # GROUPING(key) → the per-set 0/1 indicator column
        for i, ke in enumerate(key_exprs):
            mapping[Func("GROUPING", (ke,))] = Col(f"__grp{i}")

    def finalize(expr):
        expr = _replace(expr, mapping)
        # AVG substitution: Col(__aggN) → __aggN / __aggN_n
        return expr

    # AVG columns divide here
    for a in plain:
        if a.name == "AVG":
            nm = agg_col[a]
            col = pc.divide(_to_f64(at[nm].combine_chunks()),
                            _to_f64(at[nm + "_n"].combine_chunks()))
            at = at.set_column(at.column_names.index(nm), nm, col)

    if sel.having is not None:
        mask = eval_expr(finalize(sel.having), at)
        if isinstance(mask, pa.ChunkedArray):
            mask = mask.combine_chunks()
        at = at.filter(pc.fill_null(mask, False))

    # rank-family windows over the aggregated result (SQL evaluation
    # order: after HAVING) — bounded, one row per group
    wins: List[Win] = []
    win_sources: list = [e for _, e in sel.items]
    if sel.qualify is not None:
        win_sources.append(sel.qualify)
    for e in win_sources:
        for wnode in _find(e, Win):
            if wnode not in wins:
                wins.append(wnode)
    win_map = {}
    for i, wnode in enumerate(wins):
        col = _eval_bounded_window(at, _replace(wnode, mapping))
        at = at.append_column(f"__bw{i}", col)
        win_map[wnode] = Col(f"__bw{i}")
    if win_map:
        _fin = finalize

        def finalize(expr, _f=_fin):  # noqa: F811
            return _f(_replace(expr, win_map))

    if sel.qualify is not None:
        # QUALIFY evaluates after HAVING and the window functions (the
        # bounded post-aggregate table makes this a vectorized filter)
        mask = eval_expr(finalize(sel.qualify), at)
        if isinstance(mask, pa.ChunkedArray):
            mask = mask.combine_chunks()
        at = at.filter(pc.fill_null(mask, False))

    named = [(_out_name(a, e), finalize(e)) for a, e in sel.items]
    out = _project_fn(named)(at).to_pandas()
    if sel.distinct:
        out = out.drop_duplicates().reset_index(drop=True)
    if sel.order_by:
        keys = [_order_key([(n, e) for (n, _), (_, e) in
                            zip(named, sel.items)], e) for e, _ in sel.order_by]
        out = out.sort_values(keys, ascending=[not d for _, d in sel.order_by],
                              kind="mergesort").reset_index(drop=True)
    if sel.limit is not None:
        out = out.iloc[sel.offset:sel.offset + sel.limit]
        out = out.reset_index(drop=True)
    return out


def _expand_grouping_sets(agg_t: pd.DataFrame, group_sets: List[List[int]],
                          key_names: List[str], plain: list,
                          agg_col: dict) -> pd.DataFrame:
    """Finest-grain post-aggregate table → union of one re-aggregated
    frame per grouping set. Bounded driver-side work by design (the big
    input was already reduced to one row per full key group). COUNT
    columns re-sum plainly (never null); SUM / AVG parts re-sum with
    min_count=1 (all-NULL → NULL, SQL semantics); MIN/MAX re-extremize.
    Rolled-up key columns become NULL; __grp{i} carries GROUPING(key)."""
    spec: List[Tuple[str, str]] = []
    for a in plain:
        nm = agg_col[a]
        if a.name == "COUNT":
            spec.append((nm, "count"))
        elif a.name == "SUM":
            spec.append((nm, "sum"))
        elif a.name == "MIN":
            spec.append((nm, "min"))
        elif a.name == "MAX":
            spec.append((nm, "max"))
        else:  # AVG: numerator + count re-sum, division happens later
            spec.append((nm, "sum"))
            spec.append((nm + "_n", "count"))
    n_keys = len(key_names)
    parts = []
    for s in group_sets:
        keys = [key_names[i] for i in sorted(s)]
        if sorted(s) == list(range(n_keys)):
            sub = agg_t.copy()
        elif keys:
            g = agg_t.groupby(keys, dropna=False, sort=False)
            cols = {}
            for nm, how in spec:
                if how == "count":
                    cols[nm] = g[nm].sum()
                elif how == "sum":
                    cols[nm] = g[nm].sum(min_count=1)
                elif how == "min":
                    cols[nm] = g[nm].min()
                else:
                    cols[nm] = g[nm].max()
            sub = pd.DataFrame(cols).reset_index()
        else:
            # grand total: always exactly one row, even over empty input
            row = {}
            for nm, how in spec:
                col = agg_t[nm]
                if how == "count":
                    row[nm] = np.int64(col.sum()) if len(col) else np.int64(0)
                elif how == "sum":
                    row[nm] = col.sum(min_count=1) if len(col) else np.nan
                elif how == "min":
                    row[nm] = col.min() if len(col) else np.nan
                else:
                    row[nm] = col.max() if len(col) else np.nan
            sub = pd.DataFrame([row])
        for i in range(n_keys):
            if i not in s:
                sub[key_names[i]] = None
            sub[f"__grp{i}"] = np.int64(0 if i in s else 1)
        parts.append(sub)
    return pd.concat(parts, ignore_index=True)


def _qualify_topk(q) -> Optional[Tuple[Win, int]]:
    """Match `ROW_NUMBER() OVER (... ORDER BY ...) {<=|<|=} k` (the
    Snowflake QUALIFY top-k idiom) → (window, k). RANK is NOT eligible:
    ties can keep more than k rows per key, which topk_per_group's
    positional cut would drop."""
    if not isinstance(q, Bin) or q.op not in ("<=", "<", "="):
        return None
    w, lit = q.left, q.right
    if not isinstance(w, Win) or not isinstance(lit, Lit):
        return None
    if w.func.name != "ROW_NUMBER" or not isinstance(lit.value, int):
        return None
    k = {"<=": lit.value, "<": lit.value - 1, "=": 1}[q.op]
    if q.op == "=" and lit.value != 1:
        return None
    return (w, k) if k >= 1 and w.order_by and w.partition_by else None


def _execute_window(ds, sel: Select, wins: List[Win], num_buckets: int):
    """Window plan: project base expressions → dispatch each distinct
    window call to the matching stages/window operator (bucketed
    partition_apply: one shuffle, per-bucket vector sort) → final
    projection.  Returns a streaming Dataset."""
    from sous_chef_ray.stages.window import (
        with_first_last, with_lag_lead, with_rank, with_row_number,
        with_running_sum)

    # QUALIFY: `ROW_NUMBER() OVER (...) <= k` whose window the select
    # list doesn't need compiles to topk_per_group (the filter runs
    # INSIDE the bucket stage, so only k rows per key flow downstream);
    # any other predicate computes its window columns like the select
    # wins and filters the stream afterward (SQL evaluation order)
    topk = None
    if sel.qualify is not None:
        topk = _qualify_topk(sel.qualify)
        if topk is not None and topk[0] in wins:
            topk = None  # select list needs the rn column anyway
        if topk is None:
            wins = wins + _find(sel.qualify, Win)

    uniq: List[Win] = []
    for w in wins:
        if w not in uniq:
            uniq.append(w)

    # pre-project: every base column used anywhere + computed partition /
    # order / argument expressions
    pre: List[Tuple[str, object]] = []
    seen = {}

    def col_for(expr, hint: str) -> str:
        if isinstance(expr, Col):
            if expr.name not in [n for n, _ in pre]:
                pre.append((expr.name, expr))
            return expr.name
        if expr in seen:
            return seen[expr]
        nm = f"__{hint}{len(seen)}"
        seen[expr] = nm
        pre.append((nm, expr))
        return nm

    # pass through every base column referenced by the select items
    for _, e in sel.items:
        for c in _find(e, Col):
            col_for(c, "c")
    for e, _ in sel.order_by:
        for c in _find(e, Col):
            col_for(c, "c")
    if sel.qualify is not None:
        for c in _find(sel.qualify, Col):
            col_for(c, "c")

    tk_args = None
    if topk is not None:
        tw, tk = topk
        tk_args = ([col_for(p, "p") for p in tw.partition_by],
                   [col_for(o, "o") for o, _ in tw.order_by],
                   [d for _, d in tw.order_by], tk)

    plans = []  # (win, out_col, dispatch closure args)
    for i, w in enumerate(uniq):
        out_col = f"__w{i}"
        part_cols = [col_for(p, "p") for p in w.partition_by]
        order_cols = [col_for(o, "o") for o, _ in w.order_by]
        descs = [d for _, d in w.order_by]
        arg_col = None
        if (w.func.name not in ("NTILE", "PERCENT_RANK", "CUME_DIST")
                and w.func.args and not isinstance(w.func.args[0], Star)):
            arg_col = col_for(w.func.args[0], "a")
        elif (w.func.name == "COUNT" and isinstance(w.frame, tuple)):
            # COUNT(*) over a moving/RANGE frame: count a never-null
            # ones column — identical row count, reuses the sum/count
            # rolling kernels
            arg_col = col_for(Lit(1, "int"), "a")
        plans.append((w, out_col, part_cols, order_cols, descs, arg_col))

    out = ds.map_batches(_project_fn(pre), batch_format="pyarrow",
                         zero_copy_batch=True)

    for w, out_col, part_cols, order_cols, descs, arg_col in plans:
        fname = w.func.name
        if not part_cols:
            raise ValueError("window functions require PARTITION BY "
                             "(global windows need a single partition)")
        if fname == "ROW_NUMBER":
            out = with_row_number(out, part_cols, order_cols, descs,
                                  name=out_col, num_buckets=num_buckets)
        elif fname in ("RANK", "DENSE_RANK"):
            out = with_rank(out, part_cols, order_cols, descs,
                            name=out_col, dense=fname == "DENSE_RANK",
                            num_buckets=num_buckets)
        elif fname in ("LAG", "LEAD"):
            n = _scalar_int(w.func.args[1]) if len(w.func.args) > 1 else 1
            eff = fname
            if all(descs) and descs:
                # LAG over DESC ≡ LEAD over ASC (exact for total orders;
                # SQL leaves tie order unspecified either way)
                eff = "LEAD" if fname == "LAG" else "LAG"
            elif any(descs):
                raise ValueError("LAG/LEAD with mixed-direction ORDER BY "
                                 "unsupported")
            out = with_lag_lead(
                out, part_cols, order_cols, arg_col,
                lag=n if eff == "LAG" else 0,
                lead=n if eff == "LEAD" else 0,
                lag_name=out_col if eff == "LAG" else None,
                lead_name=out_col if eff == "LEAD" else None,
                num_buckets=num_buckets)
        elif fname in ("FIRST_VALUE", "LAST_VALUE"):
            frame = w.frame
            if any(descs):
                # FIRST_VALUE's default/running/whole frames all start at
                # the partition head, so over DESC it is the partition's
                # LAST row in ASC order; LAST_VALUE full-partition over
                # DESC is the ASC FIRST. Peers/row-self LAST_VALUE under
                # DESC stays unsupported (tie-dependent).
                if all(descs) and fname == "FIRST_VALUE":
                    fname, frame = "LAST_VALUE", "full_partition"
                elif all(descs) and frame == "full_partition":
                    fname = "FIRST_VALUE"
                else:
                    raise ValueError(
                        "FIRST/LAST_VALUE with DESC order supports only "
                        "partition-head-anchored frames")
            if fname == "LAST_VALUE" and frame is None:
                # SQL's DEFAULT frame is RANGE UNBOUNDED PRECEDING →
                # CURRENT ROW: the frame ends at the current row's last
                # ORDER-BY peer, so LAST_VALUE is peers-aware (NOT the
                # row itself, NOT the partition's last row)
                from sous_chef_ray.stages.window import \
                    with_last_value_peers

                out = with_last_value_peers(
                    out, part_cols, order_cols, arg_col, name=out_col,
                    num_buckets=num_buckets)
            elif (fname == "LAST_VALUE"
                  and frame == "rows_unbounded_preceding"):
                # ROWS frame ending at the current row: LAST_VALUE is
                # the current row's own value — a column copy
                out = out.map_batches(
                    lambda t, _a=arg_col, _o=out_col:
                        t.append_column(_o, t[_a]),
                    batch_format="pyarrow", zero_copy_batch=True)
            elif fname == "LAST_VALUE" and frame != "full_partition":
                raise ValueError(
                    "LAST_VALUE supports the default frame, ROWS "
                    "UNBOUNDED PRECEDING, or ROWS BETWEEN UNBOUNDED "
                    "PRECEDING AND UNBOUNDED FOLLOWING")
            else:
                out = with_first_last(
                    out, part_cols, order_cols, arg_col,
                    first_name=(out_col if fname == "FIRST_VALUE"
                                else "__drop_f"),
                    last_name=(out_col if fname == "LAST_VALUE"
                               else "__drop_l"),
                    num_buckets=num_buckets)
                out = out.drop_columns(
                    ["__drop_f" if fname == "LAST_VALUE" else "__drop_l"])
        elif fname == "SUM" and w.frame == "rows_unbounded_preceding":
            if any(descs):
                raise ValueError("running SUM with DESC unsupported")
            out = with_running_sum(out, part_cols, order_cols, arg_col,
                                   name=out_col, num_buckets=num_buckets)
        elif (fname in ("SUM", "AVG", "COUNT", "MIN", "MAX")
              and not w.order_by and w.frame in (None, "full_partition")):
            # partition-total window (percent-of-total / RATIO_TO_REPORT
            # shape): grouped aggregate — bounded, one row per key —
            # broadcast-merged back onto the stream (no second shuffle)
            from ray.data.aggregate import Count as _Cnt
            from ray.data.aggregate import Max as _Max
            from ray.data.aggregate import Min as _Min
            from ray.data.aggregate import Sum as _Sum

            from sous_chef_ray.stages.join import broadcast_join

            if fname == "COUNT" and arg_col is None:
                aggs_ = [_Cnt(alias_name=out_col)]
            elif fname == "SUM":
                aggs_ = [_Sum(arg_col, alias_name=out_col)]
            elif fname == "MIN":
                aggs_ = [_Min(arg_col, alias_name=out_col)]
            elif fname == "MAX":
                aggs_ = [_Max(arg_col, alias_name=out_col)]
            elif fname == "COUNT":
                aggs_ = [_Cnt(on=arg_col, alias_name=out_col,
                              ignore_nulls=True)]
            else:  # AVG
                aggs_ = [_Sum(arg_col, alias_name=f"{out_col}_s"),
                         _Cnt(on=arg_col, alias_name=f"{out_col}_n",
                              ignore_nulls=True)]
            tot = out.groupby(part_cols).aggregate(*aggs_).to_pandas()
            if fname == "AVG":
                tot[out_col] = (tot[f"{out_col}_s"].astype("float64")
                                / tot[f"{out_col}_n"].astype("float64"))
                tot = tot.drop(columns=[f"{out_col}_s", f"{out_col}_n"])
            out = broadcast_join(out, tot, on=part_cols, how="left")
        elif fname in ("NTILE", "PERCENT_RANK", "CUME_DIST"):
            from sous_chef_ray.stages.window import with_ntile_pct

            n_tiles = (_scalar_int(w.func.args[0]) if fname == "NTILE"
                       else 2)
            names = {"NTILE": f"{out_col}_nt", "PERCENT_RANK": f"{out_col}_pr",
                     "CUME_DIST": f"{out_col}_cd"}
            names[fname] = out_col
            out = with_ntile_pct(
                out, part_cols, order_cols, n_tiles=n_tiles,
                descending=descs, ntile_name=names["NTILE"],
                pct_rank_name=names["PERCENT_RANK"],
                cume_dist_name=names["CUME_DIST"], num_buckets=num_buckets)
            out = out.drop_columns([v for k, v in names.items()
                                    if v != out_col])
        elif (fname in ("SUM", "AVG", "COUNT")
              and isinstance(w.frame, tuple) and w.frame[0] == "range"):
            # time-RANGE moving window: RANGE BETWEEN <INTERVAL|n>
            # PRECEDING AND CURRENT ROW → searchsorted rolling kernel
            # (one shuffle; peers share frames per SQL RANGE semantics)
            from sous_chef_ray.stages.window import with_rolling_time_sum

            if len(order_cols) != 1 or any(descs):
                raise ValueError("RANGE frames need a single ASC "
                                 "ORDER BY key")
            if arg_col is None:
                raise ValueError(f"RANGE-frame {fname} needs a column "
                                 "argument (COUNT(*) unsupported)")
            sum_nm = out_col if fname == "SUM" else f"{out_col}_s"
            cnt_nm = out_col if fname == "COUNT" else f"{out_col}_n"
            if fname == "AVG":
                sum_nm, cnt_nm = f"{out_col}_s", f"{out_col}_n"
            out = with_rolling_time_sum(
                out, part_cols, order_cols[0], arg_col,
                interval=w.frame[1], sum_name=sum_nm, cnt_name=cnt_nm,
                num_buckets=num_buckets)
            if fname == "AVG":
                def _divr(t: pa.Table, _s=sum_nm, _n=cnt_nm, _o=out_col):
                    v = pc.divide(pc.cast(t[_s], pa.float64()),
                                  pc.cast(t[_n], pa.float64()))
                    return t.append_column(_o, v).drop_columns([_s, _n])

                out = out.map_batches(_divr, batch_format="pyarrow",
                                      zero_copy_batch=True)
            else:
                out = out.drop_columns(
                    [cnt_nm if fname == "SUM" else sum_nm])
        elif (fname in ("SUM", "AVG", "COUNT")
              and isinstance(w.frame, tuple) and w.frame[0] == "rows"):
            # moving frame: ROWS BETWEEN n PRECEDING AND {CURRENT ROW |
            # m FOLLOWING} → prefix-sum rolling kernel (one shuffle)
            from sous_chef_ray.stages.window import with_rolling_sum_count

            lo, hi = w.frame[1], w.frame[2]
            if all(descs) and descs:
                # ROWS [lo PRECEDING, hi FOLLOWING] over DESC covers the
                # SAME row set as [hi PRECEDING, lo FOLLOWING] over ASC
                lo, hi = hi, lo
            elif any(descs):
                raise ValueError("moving frames with mixed-direction "
                                 "ORDER BY unsupported")
            if arg_col is None:
                raise ValueError(f"moving-frame {fname} needs a column "
                                 "argument (COUNT(*) unsupported)")
            sum_nm = out_col if fname == "SUM" else f"{out_col}_s"
            cnt_nm = out_col if fname == "COUNT" else f"{out_col}_n"
            if fname == "AVG":
                sum_nm, cnt_nm = f"{out_col}_s", f"{out_col}_n"
            out = with_rolling_sum_count(
                out, part_cols, order_cols, arg_col, window=lo + 1,
                following=hi, sum_name=sum_nm, cnt_name=cnt_nm,
                num_buckets=num_buckets)
            if fname == "AVG":
                def _div(t: pa.Table, _s=sum_nm, _n=cnt_nm, _o=out_col):
                    v = pc.divide(pc.cast(t[_s], pa.float64()),
                                  pc.cast(t[_n], pa.float64()))
                    return t.append_column(_o, v).drop_columns([_s, _n])

                out = out.map_batches(_div, batch_format="pyarrow",
                                      zero_copy_batch=True)
            else:
                out = out.drop_columns(
                    [cnt_nm if fname == "SUM" else sum_nm])
        else:
            raise ValueError(f"unsupported window function {fname} "
                             f"(frame={w.frame})")

    mapping = {w: Col(oc) for (w, oc, *_rest) in plans}
    if tk_args is not None:
        from sous_chef_ray.stages.window import topk_per_group

        tp, to, td, tk = tk_args
        out = topk_per_group(out, tp, to, tk, descending=td,
                             num_buckets=num_buckets)
    elif sel.qualify is not None:
        out = out.map_batches(
            _filter_fn(_replace(sel.qualify, mapping)),
            batch_format="pyarrow", zero_copy_batch=True)
    named = [(_out_name(a, e), _replace(e, mapping)) for a, e in sel.items]
    final = out.map_batches(_project_fn(named), batch_format="pyarrow",
                            zero_copy_batch=True)
    if sel.distinct:
        final = _distinct_ds(final, [n for n, _ in named])
    if sel.order_by:
        keys = [_order_key(named, e) for e, _ in sel.order_by]
        final = final.sort(keys, descending=[d for _, d in sel.order_by])
    if sel.limit is not None:
        final = _limit_offset(final, sel.limit, sel.offset)
    return final
