"""Minimal SQL front-end for the conjunctive-query-with-comparisons subset.

The reference parses with Calcite (sqlplus-core/.../parser/SqlPlusParser.java)
and accepts exactly one SELECT with: FROM list (tables and one shape of
aggregated subquery), a conjunctive WHERE (=, <>, <, <=, >, >=, [NOT] LIKE,
[NOT] IN, BETWEEN, IS [NOT] NULL, parenthesized OR), arithmetic / CASE /
EXTRACT(YEAR) expressions, GROUP BY + aggregates, and ORDER BY ... LIMIT
(SURVEY §2.1, §3.1 step 4). We parse the same surface (plus explicit
INNER JOIN ... ON sugar) into a :class:`QuerySpec`.

Anything outside the subset raises :class:`UnsupportedSqlError`; the API
layer then falls back to ``spark.sql`` verbatim.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from sparksqlplus_spark.expressions import (
    AGG_FUNCS,
    AggCall,
    AndCond,
    Arith,
    CaseWhen,
    Cast,
    Cmp,
    Col,
    Cond,
    Exists,
    Expr,
    ExtractYear,
    Func,
    InList,
    IsNull,
    Like,
    Lit,
    Neg,
    OrCond,
    ScalarSubquery,
    Star,
)


class UnsupportedSqlError(Exception):
    """Query is outside the planner subset — caller should fall back."""


# ---------------------------------------------------------------------------
# AST containers
# ---------------------------------------------------------------------------


@dataclass
class SelectItem:
    expr: Expr
    alias: str | None = None


@dataclass
class FromItem:
    alias: str
    table: str | None = None
    subquery: "QuerySpec | None" = None


@dataclass
class OrderItem:
    expr: Expr
    desc: bool = False


@dataclass
class OuterJoin:
    """One LEFT/RIGHT/FULL [OUTER] JOIN attachment (engine extension;
    the reference supports inner joins only). Applied AFTER the inner
    FROM block joins, in source order; `conds` is the ON conjunction.
    For a LEFT join, right-local conjuncts pre-filter the right side
    (equivalent — the right side is not preserved); for RIGHT/FULL the
    right side IS preserved, so every conjunct stays in the join
    condition (ON never removes preserved-side rows)."""

    item: FromItem
    conds: list[Cond]
    side: str = "left"  # 'left' | 'right' | 'full'


@dataclass
class QuerySpec:
    select: list[SelectItem]
    distinct: bool
    from_items: list[FromItem]
    where: list[Cond]  # top-level conjunction
    group_by: list[Expr] = field(default_factory=list)
    order_by: list[OrderItem] = field(default_factory=list)
    limit: int | None = None
    having: list[Cond] = field(default_factory=list)  # conjunction
    # GROUP BY ROLLUP(...) / CUBE(...) / GROUPING SETS ((...), ...) —
    # engine extension (the reference's GROUP BY takes plain columns
    # only). 'plain' | 'rollup' | 'cube' | 'sets'; for 'sets',
    # grouping_sets holds one list of group_by indices per set.
    group_mode: str = "plain"
    grouping_sets: list[list[int]] = field(default_factory=list)
    # LEFT/RIGHT/FULL [OUTER] JOIN attachments, applied after the inner
    # FROM block (engine extension — api._run_outer). build_context
    # rejects specs carrying these; the API routes them to the
    # outer-join planner.
    outer_joins: list[OuterJoin] = field(default_factory=list)
    # ON conjuncts of INNER JOINs in the FROM block. Kept separate from
    # `where` ONLY when a RIGHT/FULL OUTER JOIN follows: they then
    # belong inside the outer join's left operand (pre-join), while the
    # WHERE clause applies after ALL joins — the placements differ once
    # the left side is null-supplied. For LEFT-only / no-outer
    # statements the two placements are equivalent, so the parser merges
    # them into `where` and this stays empty.
    inner_on: list[Cond] = field(default_factory=list)


@dataclass
class CompoundSpec:
    """UNION [ALL] / INTERSECT [ALL] / EXCEPT [ALL] chain (engine
    extension; the reference parses exactly one SELECT). Parts combine
    by POSITION, left-associatively; a trailing ORDER BY / LIMIT binds
    to the whole compound. Parts carry ANSI bag semantics (the CQ
    non-full => DISTINCT rule is a reference-dialect behavior; set
    operators are pure SQL surface, so they follow SQL exactly).
    INTERSECT mixed with other operators is rejected (its higher ANSI
    precedence would make left-assoc evaluation wrong)."""

    parts: list[QuerySpec]
    ops: list[tuple[str, bool]]  # between parts: (op, is_all)
    order_by: list[OrderItem] = field(default_factory=list)
    limit: int | None = None


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<str>'(?:[^']|'')*')
  | (?P<num>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<id>[A-Za-z_][A-Za-z_0-9]*)
  | (?P<op><=|>=|<>|!=|=|<|>|\(|\)|,|\.|\*|\+|-|/|\|\|)
    """,
    re.VERBOSE,
)

KEYWORDS = {
    "select", "distinct", "from", "where", "group", "by", "order", "limit",
    "and", "or", "not", "like", "in", "between", "is", "null", "as",
    "case", "when", "then", "else", "end", "extract", "year", "date",
    "interval", "timestamp", "day", "join", "inner", "on", "asc", "desc",
    "having", "union", "exists", "with",
}


@dataclass
class Tok:
    kind: str  # kw | id | num | str | op
    text: str  # lowercase for kw, verbatim otherwise


def tokenize(sql: str) -> list[Tok]:
    toks: list[Tok] = []
    pos = 0
    sql = re.sub(r"--[^\n]*", " ", sql)
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if not m:
            raise UnsupportedSqlError(f"cannot tokenize at: {sql[pos:pos+30]!r}")
        pos = m.end()
        if m.lastgroup == "ws":
            continue
        text = m.group()
        if m.lastgroup == "id":
            low = text.lower()
            if low in KEYWORDS:
                toks.append(Tok("kw", low))
            else:
                toks.append(Tok("id", text))
        elif m.lastgroup == "str":
            toks.append(Tok("str", text[1:-1].replace("''", "'")))
        elif m.lastgroup == "num":
            toks.append(Tok("num", text))
        else:
            toks.append(Tok("op", text))
    return toks


# ---------------------------------------------------------------------------
# recursive-descent parser
# ---------------------------------------------------------------------------


class _Parser:
    def __init__(self, toks: list[Tok]):
        self.toks = toks
        self.i = 0

    # -- cursor helpers ----------------------------------------------------
    def peek(self, k: int = 0) -> Tok | None:
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else None

    def at(self, kind: str, text: str | None = None, k: int = 0) -> bool:
        t = self.peek(k)
        return t is not None and t.kind == kind and (text is None or t.text == text)

    def take(self) -> Tok:
        t = self.peek()
        if t is None:
            raise UnsupportedSqlError("unexpected end of query")
        self.i += 1
        return t

    def expect(self, kind: str, text: str | None = None) -> Tok:
        if not self.at(kind, text):
            got = self.peek()
            raise UnsupportedSqlError(f"expected {text or kind}, got {got}")
        return self.take()

    def accept(self, kind: str, text: str | None = None) -> bool:
        if self.at(kind, text):
            self.take()
            return True
        return False

    # -- grammar -----------------------------------------------------------
    def _with_clause(self) -> dict[str, QuerySpec]:
        # WITH name AS (SELECT ...) [, ...] — desugared by substituting
        # each CTE reference in FROM with an inline subquery, so the
        # C21 aggregated-view shape plans natively (the reference's own
        # TPC-H rewrites use exactly that form); other CTE bodies raise
        # at context build and ride the fallback. Earlier CTEs are
        # visible inside later ones.
        ctes: dict[str, QuerySpec] = {}
        if self.accept("kw", "with"):
            while True:
                name = self.expect("id").text
                self.expect("kw", "as")
                self.expect("op", "(")
                sub = self._select_stmt()
                self.expect("op", ")")
                _substitute_ctes(sub, ctes)
                ctes[name.lower()] = sub
                if not self.accept("op", ","):
                    break
        return ctes

    def parse_query(self) -> QuerySpec:
        ctes = self._with_clause()
        q = self._select_stmt()
        if ctes:
            _substitute_ctes(q, ctes)
        if self.peek() is not None:
            raise UnsupportedSqlError(f"trailing tokens at {self.peek()}")
        return q

    def parse_statement(self) -> "QuerySpec | CompoundSpec":
        """Like parse_query, but additionally accepts a top-level
        UNION [ALL] / INTERSECT [ALL] / EXCEPT [ALL] chain."""
        ctes = self._with_clause()
        parts = [self._select_stmt()]
        ops: list[tuple[str, bool]] = []
        while True:
            t = self.peek()
            if self.at("kw", "union"):
                self.take()
                op = "union"
            elif t is not None and t.kind == "id" and t.text.lower() in (
                "intersect", "except",
            ):
                self.take()
                op = t.text.lower()
            else:
                break
            is_all = False
            t2 = self.peek()
            if t2 is not None and t2.kind == "id" and t2.text.lower() == "all":
                self.take()
                is_all = True
            ops.append((op, is_all))
            parts.append(self._select_stmt())
        if ctes:
            for p in parts:
                _substitute_ctes(p, ctes)
        if self.peek() is not None:
            raise UnsupportedSqlError(f"trailing tokens at {self.peek()}")
        if len(parts) == 1:
            return parts[0]
        opnames = {op for op, _ in ops}
        if "intersect" in opnames and len(opnames) > 1:
            raise UnsupportedSqlError(
                "INTERSECT mixed with UNION/EXCEPT is not in the subset "
                "(precedence); parenthesize via the spark.sql fallback"
            )
        for p in parts[:-1]:
            if p.order_by or p.limit is not None:
                raise UnsupportedSqlError(
                    "ORDER BY/LIMIT on a non-final compound part needs "
                    "parentheses; not in the subset"
                )
        order_by, limit = parts[-1].order_by, parts[-1].limit
        parts[-1].order_by, parts[-1].limit = [], None
        return CompoundSpec(parts, ops, order_by, limit)

    def _select_stmt(self) -> QuerySpec:
        self.expect("kw", "select")
        distinct = self.accept("kw", "distinct")
        items = [self._select_item()]
        while self.accept("op", ","):
            items.append(self._select_item())
        self.expect("kw", "from")
        from_items = [self._from_item()]
        where: list[Cond] = []
        inner_on: list[Cond] = []
        outer_joins: list[OuterJoin] = []
        while True:
            t = self.peek()
            if self.at("op", ","):
                if outer_joins:
                    raise UnsupportedSqlError(
                        "joins after an OUTER JOIN must be outer "
                        "(ordering changes semantics); not in the subset"
                    )
                self.take()
                from_items.append(self._from_item())
            elif self.at("kw", "inner") or self.at("kw", "join"):
                self.accept("kw", "inner")
                self.expect("kw", "join")
                if outer_joins:
                    # INNER JOIN after an outer join: ANSI joins
                    # left-associate, so this is an attachment over the
                    # outer-joined frame — same three-phase planner,
                    # join type 'inner' (side='inner' below)
                    item = self._from_item()
                    self.expect("kw", "on")
                    outer_joins.append(
                        OuterJoin(item, self._conjunction(), "inner")
                    )
                else:
                    # INNER JOIN t AS a ON cond in the FROM block —
                    # desugar to comma + condition
                    from_items.append(self._from_item())
                    self.expect("kw", "on")
                    inner_on.extend(self._conjunction())
            elif (
                t is not None
                and t.kind == "id"
                and t.text.lower() in ("left", "right", "full")
            ):
                side = self.take().text.lower()
                t2 = self.peek()
                if t2 is not None and t2.kind == "id" and t2.text.lower() == "outer":
                    self.take()
                self.expect("kw", "join")
                item = self._from_item()
                self.expect("kw", "on")
                outer_joins.append(OuterJoin(item, self._conjunction(), side))
            else:
                break
        if self.accept("kw", "where"):
            where.extend(self._conjunction())
        if all(oj.side in ("left", "inner") for oj in outer_joins):
            # pre-join vs post-join placement is equivalent when the
            # FROM block stays non-null-supplied through every
            # attachment (LEFT preserves it; INNER never null-extends)
            # — merge (QuerySpec.inner_on docstring)
            where, inner_on = inner_on + where, []
        group_by: list[Expr] = []
        group_mode = "plain"
        grouping_sets: list[list[int]] = []
        if self.accept("kw", "group"):
            self.expect("kw", "by")
            # ROLLUP( ... ) / CUBE( ... ) / GROUPING SETS ((...),...) —
            # soft keywords (plain ids) so columns named e.g. 'cube'
            # stay usable outside this position
            t = self.peek()
            if (
                t is not None
                and t.kind == "id"
                and t.text.lower() in ("rollup", "cube")
                and self.at("op", "(", k=1)
            ):
                group_mode = self.take().text.lower()
                self.expect("op", "(")
                group_by.append(self._expr())
                while self.accept("op", ","):
                    group_by.append(self._expr())
                self.expect("op", ")")
            elif (
                t is not None
                and t.kind == "id"
                and t.text.lower() == "grouping"
                and self.at("id", k=1)
                and self.peek(1).text.lower() == "sets"
            ):
                self.take()
                self.take()
                group_mode = "sets"
                self.expect("op", "(")
                # each set: ( expr, ... ) or ( ) — exprs dedup into
                # group_by; sets hold indices into it
                keys: dict[str, int] = {}
                while True:
                    self.expect("op", "(")
                    one: list[int] = []
                    if not self.at("op", ")"):
                        while True:
                            e = self._expr()
                            k = e.key()
                            if k not in keys:
                                keys[k] = len(group_by)
                                group_by.append(e)
                            one.append(keys[k])
                            if not self.accept("op", ","):
                                break
                    self.expect("op", ")")
                    grouping_sets.append(one)
                    if not self.accept("op", ","):
                        break
                self.expect("op", ")")
            else:
                group_by.append(self._expr())
                while self.accept("op", ","):
                    group_by.append(self._expr())
        having: list[Cond] = []
        if self.at("kw", "having"):
            # post-aggregation filter (engine extension — the reference
            # has no HAVING surface at all, SURVEY §2.1 not-supported
            # list). Only meaningful over GROUP BY; a bare HAVING keeps
            # raising so api.sql mode='auto' can delegate it.
            if not group_by:
                raise UnsupportedSqlError("HAVING without GROUP BY not in subset")
            self.expect("kw", "having")
            having = self._conjunction()
        order_by: list[OrderItem] = []
        if self.accept("kw", "order"):
            self.expect("kw", "by")
            while True:
                e = self._expr()
                desc = False
                if self.accept("kw", "desc"):
                    desc = True
                else:
                    self.accept("kw", "asc")
                order_by.append(OrderItem(e, desc))
                if not self.accept("op", ","):
                    break
        limit = None
        if self.accept("kw", "limit"):
            limit = int(self.expect("num").text)
        return QuerySpec(
            items, distinct, from_items, where, group_by, order_by, limit,
            having=having, group_mode=group_mode, grouping_sets=grouping_sets,
            outer_joins=outer_joins,
            inner_on=inner_on,
        )

    def _select_item(self) -> SelectItem:
        e = self._expr()
        alias = None
        if self.accept("kw", "as"):
            alias = self.take().text
        elif self.at("id") :
            alias = self.take().text
        return SelectItem(e, alias)

    # ids that act as soft keywords right after a FROM item — NOT
    # implicit aliases ("FROM customer LEFT JOIN ..." must not read
    # 'left' as an alias and silently degrade to an inner join)
    _SOFT_AFTER_FROM = {"left", "right", "full", "outer", "intersect", "except"}

    def _from_item(self) -> FromItem:
        if self.accept("op", "("):
            sub = self._select_stmt()
            self.expect("op", ")")
            explicit_as = self.accept("kw", "as")
            if (
                not explicit_as
                and self.at("id")
                and self.peek().text.lower() in self._SOFT_AFTER_FROM
            ):
                # "(SELECT ...) LEFT JOIN ..." — the id is a join
                # keyword, NOT an implicit alias; an unaliased derived
                # table is outside the subset (silently reading 'left'
                # as the alias would degrade the outer join to inner)
                raise UnsupportedSqlError(
                    "derived table needs an alias before a join keyword"
                )
            alias = self.expect("id").text
            return FromItem(alias=alias, subquery=sub)
        name = self.expect("id").text
        alias = name
        if self.accept("kw", "as"):
            alias = self.take().text
        elif self.at("id") and self.peek().text.lower() not in self._SOFT_AFTER_FROM:
            alias = self.take().text
        return FromItem(alias=alias, table=name)

    # -- boolean grammar ----------------------------------------------------
    def _conjunction(self) -> list[Cond]:
        out: list[Cond] = []

        def add(c: Cond) -> None:
            if isinstance(c, AndCond):
                for ch in c.children:
                    add(ch)
            else:
                out.append(c)

        add(self._or_cond())
        while self.accept("kw", "and"):
            add(self._or_cond())
        return out

    def _or_cond(self) -> Cond:
        c = self._and_cond()
        if self.at("kw", "or"):
            children = [c]
            while self.accept("kw", "or"):
                children.append(self._and_cond())
            return OrCond(tuple(children))
        return c

    def _and_cond(self) -> Cond:
        c = self._cond_primary()
        if self.at("kw", "and"):
            children = [c]
            while self.accept("kw", "and"):
                children.append(self._cond_primary())
            return AndCond(tuple(children))
        return c

    def _cond_primary(self) -> Cond:
        # try parenthesized boolean first (backtrack to expression on failure)
        if self.at("op", "("):
            save = self.i
            try:
                self.take()
                inner = self._or_cond()
                self.expect("op", ")")
                # guard: if followed by a comparison, '(' opened an expression
                if not self._at_cmp_or_predicate():
                    return inner
            except UnsupportedSqlError:
                pass
            self.i = save
        if self.accept("kw", "not"):
            inner = self._cond_primary()
            if isinstance(inner, Like):
                return Like(inner.expr, inner.pattern, not inner.negated)
            if isinstance(inner, InList):
                return InList(inner.expr, inner.values, not inner.negated)
            if isinstance(inner, IsNull):
                return IsNull(inner.expr, not inner.negated)
            if isinstance(inner, Cmp) and inner.op == "=":
                return Cmp("<>", inner.left, inner.right)
            if isinstance(inner, Exists):
                return Exists(
                    inner.table, inner.table_alias, inner.conds,
                    not inner.negated, inner.null_aware, inner.body,
                )
            raise UnsupportedSqlError("NOT only supported on LIKE/IN/IS NULL/=/EXISTS")
        if self.accept("kw", "exists"):
            return self._exists_tail()
        left = self._expr()
        return self._predicate_tail(left)

    def _exists_tail(self) -> "Exists":
        """EXISTS (SELECT ... FROM tables [WHERE conj]) — the
        single-table shape the planner folds directly into a semi/anti
        join; a multi-table body (comma or INNER JOIN list) is carried
        as Exists.body and lifted by api._lift_exists_joins into a
        composite view + the same single-table semi-join. GROUP BY or
        nested subqueries inside EXISTS raise UnsupportedSqlError,
        which mode='auto' routes to spark.sql."""
        self.expect("op", "(")
        self.expect("kw", "select")
        # the select list of an EXISTS subquery is semantically void —
        # accept `*` or a plain column list and discard either
        if not self.accept("op", "*"):
            self._expr()
            while self.accept("op", ","):
                self._expr()
        self.expect("kw", "from")
        items = [self._from_item()]
        conds: list[Cond] = []
        while True:
            if self.accept("op", ","):
                items.append(self._from_item())
            elif self.at("kw", "inner") or self.at("kw", "join"):
                self.accept("kw", "inner")
                self.expect("kw", "join")
                items.append(self._from_item())
                self.expect("kw", "on")
                conds.extend(self._conjunction())
            else:
                break
        for fi in items:
            if fi.subquery is not None:
                raise UnsupportedSqlError(
                    "EXISTS over a subquery is not in the subset"
                )
        if self.accept("kw", "where"):
            conds.extend(self._conjunction())
        if not self.at("op", ")"):
            raise UnsupportedSqlError(
                "EXISTS subquery supports only FROM tables + WHERE"
            )
        self.expect("op", ")")
        if len(items) == 1:
            return Exists(items[0].table, items[0].alias, tuple(conds))
        if len({fi.alias for fi in items}) != len(items):
            raise UnsupportedSqlError("duplicate alias inside EXISTS")
        return Exists(
            "", "", (),
            body=QuerySpec(
                select=[], distinct=False, from_items=items, where=conds
            ),
        )

    def _at_cmp_or_predicate(self) -> bool:
        t = self.peek()
        if t is None:
            return False
        if t.kind == "op" and t.text in ("=", "<>", "!=", "<", "<=", ">", ">=", "+", "-", "*", "/"):
            return True
        if t.kind == "kw" and t.text in ("like", "in", "between", "is", "not"):
            return True
        return False

    def _predicate_tail(self, left: Expr) -> Cond:
        t = self.peek()
        if t is None:
            raise UnsupportedSqlError("expected predicate")
        if t.kind == "op" and t.text in ("=", "<>", "!=", "<", "<=", ">", ">="):
            op = self.take().text
            if op == "!=":
                op = "<>"
            right = self._expr()
            return Cmp(op, left, right)
        negated = False
        if self.at("kw", "not"):
            self.take()
            negated = True
        if self.accept("kw", "like"):
            pat = self.expect("str").text
            return Like(left, pat, negated)
        if self.accept("kw", "in"):
            if self.at("kw", "select", k=1):
                # [NOT] IN (SELECT col FROM t [WHERE ...]) desugars to
                # the correlated-equality EXISTS the planner folds into
                # a semi join (engine extension). The Exists carries
                # null_aware=True: a negated one plans as a NULL-AWARE
                # anti join (SQL's NOT IN returns no rows when the inner
                # side contains a NULL — plans/context.py SemiFilter,
                # compiler/cqc.py _apply_semi_filter).
                return self._in_subquery_tail(left, negated)
            self.expect("op", "(")
            vals: list[object] = []
            while True:
                lit = self._literal()
                vals.append(lit.value)
                if not self.accept("op", ","):
                    break
            self.expect("op", ")")
            return InList(left, tuple(vals), negated)
        if self.accept("kw", "between"):
            lo = self._expr()
            self.expect("kw", "and")
            hi = self._expr()
            # Calcite desugars BETWEEN to two <= (SURVEY C11)
            c = AndCond((Cmp(">=", left, lo), Cmp("<=", left, hi)))
            if negated:
                raise UnsupportedSqlError("NOT BETWEEN not in subset")
            return c
        if self.accept("kw", "is"):
            neg2 = self.accept("kw", "not")
            self.expect("kw", "null")
            return IsNull(left, neg2)
        raise UnsupportedSqlError(f"expected predicate after expression, got {t}")

    def _in_subquery_tail(self, left: Expr, negated: bool = False) -> "Exists":
        """expr [NOT] IN (SELECT col FROM t [WHERE conj]) — desugared
        to the same Exists node as a correlated-equality EXISTS
        (semi/anti join) with null_aware=True; identical subset limits
        apply (one table, no nesting)."""
        self.expect("op", "(")
        self.expect("kw", "select")
        sel = self._expr()
        if self.accept("kw", "as"):
            self.take()
        self.expect("kw", "from")
        fi = self._from_item()
        if fi.subquery is not None:
            raise UnsupportedSqlError("IN over a nested subquery is not in the subset")
        conds: list[Cond] = []
        if self.accept("kw", "where"):
            conds = self._conjunction()
        if not self.at("op", ")"):
            raise UnsupportedSqlError(
                "IN subquery supports only FROM one table + WHERE"
            )
        self.expect("op", ")")
        return Exists(
            fi.table, fi.alias, (Cmp("=", sel, left), *conds),
            negated=negated, null_aware=True,
        )

    # -- scalar expression grammar -------------------------------------------
    def _expr(self) -> Expr:
        return self._additive()

    def _additive(self) -> Expr:
        e = self._multiplicative()
        while self.at("op", "+") or self.at("op", "-"):
            op = self.take().text
            e = Arith(op, e, self._multiplicative())
        return e

    def _multiplicative(self) -> Expr:
        e = self._unary()
        while self.at("op", "*") or self.at("op", "/"):
            op = self.take().text
            e = Arith(op, e, self._unary())
        return e

    def _unary(self) -> Expr:
        if self.accept("op", "-"):
            return Neg(self._unary())
        if self.accept("op", "+"):
            return self._unary()
        return self._primary()

    def _literal(self) -> Lit:
        if self.at("str"):
            return Lit(self.take().text, "str")
        if self.at("num"):
            txt = self.take().text
            if "." in txt or "e" in txt or "E" in txt:
                return Lit(float(txt), "double")
            v = int(txt)
            return Lit(v, "int" if -(2**31) <= v < 2**31 else "long")
        if self.accept("op", "-"):
            inner = self._literal()
            return Lit(-inner.value, inner.kind)  # type: ignore[operator]
        if self.accept("kw", "date"):
            return Lit(self.expect("str").text, "date")
        if self.accept("kw", "timestamp"):
            return Lit(self.expect("str").text, "timestamp")
        if self.accept("kw", "interval"):
            v = self.expect("str").text
            self.expect("kw", "day")
            return Lit(int(v), "interval_day")
        raise UnsupportedSqlError(f"expected literal, got {self.peek()}")

    def _primary(self) -> Expr:
        t = self.peek()
        if t is None:
            raise UnsupportedSqlError("unexpected end in expression")
        if t.kind in ("str", "num") or (
            t.kind == "kw" and t.text in ("date", "timestamp", "interval")
        ):
            return self._literal()
        if t.kind == "kw" and t.text == "null":
            self.take()
            return Lit(None, "null")
        if t.kind == "kw" and t.text == "case":
            return self._case_when()
        if t.kind == "kw" and t.text == "extract":
            self.take()
            self.expect("op", "(")
            self.expect("kw", "year")
            self.expect("kw", "from")
            inner = self._expr()
            self.expect("op", ")")
            return ExtractYear(inner)
        if self.at("op", "(") and self.at("kw", "select", k=1):
            # uncorrelated scalar subquery — folded to a Lit by
            # api._fold_scalars before planning (engine extension)
            self.take()
            sub = self._select_stmt()
            self.expect("op", ")")
            return ScalarSubquery(sub)
        if self.accept("op", "("):
            e = self._expr()
            self.expect("op", ")")
            return e
        if self.at("op", "*"):
            self.take()
            return Star()
        if t.kind == "id":
            name = self.take().text
            # CAST(expr AS TYPE)
            if name.lower() == "cast" and self.at("op", "("):
                self.take()
                inner = self._expr()
                self.expect("kw", "as")
                type_tok = self.take().text.lower()
                type_map = {
                    "int": "int", "integer": "int", "bigint": "bigint",
                    "varchar": "string", "string": "string", "double": "double",
                    "decimal": "double", "float": "float", "date": "date",
                    "timestamp": "timestamp", "boolean": "boolean",
                }
                if type_tok not in type_map:
                    raise UnsupportedSqlError(f"unsupported CAST type {type_tok}")
                self.expect("op", ")")
                return Cast(inner, type_map[type_tok])
            # function call?
            if self.at("op", "("):
                self.take()
                low = name.lower()
                distinct = self.accept("kw", "distinct")
                args: list[Expr] = []
                if not self.at("op", ")"):
                    args.append(self._expr())
                    while self.accept("op", ","):
                        args.append(self._expr())
                self.expect("op", ")")
                # fn(...) OVER (...) — window call ('over' is a soft id)
                t_over = self.peek()
                if (
                    t_over is not None
                    and t_over.kind == "id"
                    and t_over.text.lower() == "over"
                    and self.at("op", "(", k=1)
                ):
                    if distinct:
                        raise UnsupportedSqlError(
                            "DISTINCT window arguments not in subset"
                        )
                    return self._window_tail(low, args)
                if low in AGG_FUNCS:
                    if len(args) != 1:
                        raise UnsupportedSqlError(f"{low} needs 1 arg")
                    return AggCall(low, args[0], distinct)
                return Func(low, tuple(args))
            # dotted column ref
            if self.accept("op", "."):
                col = self.take().text
                return Col(name, col)
            return Col("", name)
        raise UnsupportedSqlError(f"unexpected token {t} in expression")

    def _window_tail(self, func: str, args: list[Expr]) -> Expr:
        """fn(args) OVER ([PARTITION BY e,...] [ORDER BY e [DESC],...])
        — engine extension; explicit frame specs (ROWS/RANGE BETWEEN)
        are not in the subset and ride the fallback."""
        from sparksqlplus_spark.expressions import (
            WINDOW_AGG_FUNCS,
            WINDOW_RANK_FUNCS,
            WindowCall,
        )

        if func in WINDOW_RANK_FUNCS:
            if args:
                raise UnsupportedSqlError(f"{func}() takes no arguments")
        elif func in ("lag", "lead"):
            if not 1 <= len(args) <= 3 or any(
                not isinstance(a, Lit) for a in args[1:]
            ):
                raise UnsupportedSqlError(
                    f"{func} takes (expr [, literal offset [, literal default]])"
                )
        elif func in WINDOW_AGG_FUNCS:
            if len(args) != 1:
                raise UnsupportedSqlError(f"window {func} needs 1 arg")
            if isinstance(args[0], Star) and func != "count":
                raise UnsupportedSqlError(f"window {func}(*) is invalid")
        else:
            raise UnsupportedSqlError(f"unsupported window function {func}")
        self.take()  # 'over'
        self.expect("op", "(")
        partition: list[Expr] = []
        order: list[tuple[Expr, bool]] = []
        t = self.peek()
        if t is not None and t.kind == "id" and t.text.lower() == "partition":
            self.take()
            self.expect("kw", "by")
            partition.append(self._expr())
            while self.accept("op", ","):
                partition.append(self._expr())
        if self.accept("kw", "order"):
            self.expect("kw", "by")
            while True:
                e = self._expr()
                desc = False
                if self.accept("kw", "desc"):
                    desc = True
                else:
                    self.accept("kw", "asc")
                order.append((e, desc))
                if not self.accept("op", ","):
                    break
        frame = None
        t = self.peek()
        if t is not None and t.kind == "id" and t.text.lower() in ("rows", "range"):
            frame = self._window_frame(func, order)
        if not self.at("op", ")"):
            raise UnsupportedSqlError(
                "unsupported window specification tail"
            )
        self.expect("op", ")")
        return WindowCall(
            func, tuple(args), tuple(partition), tuple(order), frame
        )

    def _window_frame(self, func: str, order) -> tuple[str, int, int]:
        """ROWS/RANGE [BETWEEN] frame spec (engine extension) —
        UNBOUNDED PRECEDING | <n> PRECEDING | CURRENT ROW |
        <n> FOLLOWING | UNBOUNDED FOLLOWING bounds, mapped to Spark's
        Window.rowsBetween/rangeBetween ints (ANSI-identical). The
        single-bound form `ROWS <b>` desugars to BETWEEN <b> AND
        CURRENT ROW per ANSI. RANGE with a numeric offset needs exactly
        one ORDER BY expression (Spark and ANSI agree); ranking
        functions and lag/lead take no frame."""
        from pyspark.sql.window import Window

        kind = self.take().text.lower()
        from sparksqlplus_spark.expressions import WINDOW_RANK_FUNCS

        if func in WINDOW_RANK_FUNCS or func in ("lag", "lead"):
            raise UnsupportedSqlError(f"{func} does not accept a frame")
        if not order:
            raise UnsupportedSqlError(
                "a window frame requires ORDER BY in the window"
            )

        def bound(is_start: bool) -> int:
            t = self.peek()
            if t is not None and t.kind == "id" and t.text.lower() == "unbounded":
                self.take()
                d = self.take().text.lower()
                if d == "preceding":
                    return Window.unboundedPreceding
                if d == "following":
                    return Window.unboundedFollowing
                raise UnsupportedSqlError(f"bad frame bound UNBOUNDED {d}")
            if t is not None and t.kind == "id" and t.text.lower() == "current":
                self.take()
                if self.take().text.lower() != "row":
                    raise UnsupportedSqlError("expected CURRENT ROW")
                return 0
            if t is not None and t.kind == "num":
                n = int(self.take().text)
                d = self.take().text.lower()
                if d == "preceding":
                    return -n
                if d == "following":
                    return n
                raise UnsupportedSqlError(f"bad frame bound {n} {d}")
            raise UnsupportedSqlError(f"bad window frame bound at {t}")

        if self.accept("kw", "between"):
            start = bound(True)
            self.expect("kw", "and")
            end = bound(False)
        else:
            start, end = bound(True), 0
        if start > end:
            raise UnsupportedSqlError("window frame start is after its end")
        if kind == "range":
            offsets = {
                b
                for b in (start, end)
                if b not in (Window.unboundedPreceding, Window.unboundedFollowing, 0)
            }
            if offsets and len(order) != 1:
                raise UnsupportedSqlError(
                    "RANGE with a numeric offset needs exactly one "
                    "ORDER BY expression"
                )
        return (kind, start, end)

    def _case_when(self) -> Expr:
        self.expect("kw", "case")
        branches: list[tuple[Cond, Expr]] = []
        while self.accept("kw", "when"):
            conds = self._conjunction()
            cond = conds[0] if len(conds) == 1 else AndCond(tuple(conds))
            self.expect("kw", "then")
            branches.append((cond, self._expr()))
        otherwise: Expr = Lit(None, "null")
        if self.accept("kw", "else"):
            otherwise = self._expr()
        self.expect("kw", "end")
        return CaseWhen(tuple(branches), otherwise)


def _substitute_ctes(spec: QuerySpec, ctes: dict[str, QuerySpec]) -> None:
    """Replace CTE references in FROM with inline subqueries (in
    place), recursing into FROM-subqueries, scalar subqueries, and
    EXISTS bodies. An EXISTS over a CTE is rejected (its planner path
    loads the inner table from the catalog) so mode='auto' falls back."""
    if not ctes:
        return
    from sparksqlplus_spark.expressions import Exists, ScalarSubquery, map_expr

    for fi in [*spec.from_items, *[oj.item for oj in spec.outer_joins]]:
        if fi.table is not None and fi.table.lower() in ctes:
            fi.subquery = ctes[fi.table.lower()]
            fi.table = None
        elif fi.subquery is not None:
            _substitute_ctes(fi.subquery, ctes)

    def probe(node):
        if isinstance(node, ScalarSubquery):
            _substitute_ctes(node.spec, ctes)
        if isinstance(node, Exists) and node.table and node.table.lower() in ctes:
            raise UnsupportedSqlError(
                "EXISTS over a CTE is not in the subset"
            )
        if isinstance(node, Exists) and node.body is not None and any(
            fi.table and fi.table.lower() in ctes
            for fi in node.body.from_items
        ):
            raise UnsupportedSqlError(
                "EXISTS over a CTE is not in the subset"
            )
        return None

    for c in [*spec.where, *spec.inner_on, *spec.having]:
        map_expr(c, probe)
    for si in spec.select:
        map_expr(si.expr, probe)


def parse_query(sql: str) -> QuerySpec:
    """Parse the supported SQL subset into a QuerySpec (raises
    UnsupportedSqlError outside the subset, including compounds)."""
    return _Parser(tokenize(sql.strip().rstrip(";"))).parse_query()


def parse_statement(sql: str) -> "QuerySpec | CompoundSpec":
    """Parse one statement: a plain query, or a top-level set-operator
    compound (engine extension) as a CompoundSpec."""
    return _Parser(tokenize(sql.strip().rstrip(";"))).parse_statement()
