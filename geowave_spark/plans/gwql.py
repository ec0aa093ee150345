"""GWQL — the reference's query language — compiled to Spark SQL.

The reference exposes GWQL as its primary text query surface (grammar
`core/store/src/main/antlr4/.../GWQL.g4`, statements
`core/store/.../query/gwql/statement/{Select,Delete}Statement.java`,
function registry `GWQLCoreExtensions.java` +
`core/geotime/.../gwql/GWQLSpatialTemporalExtensions.java` in
/root/reference).  A reference user runs statements like

    SELECT COUNT(*) AS n FROM mytype
    WHERE intersects(geometry, 'POLYGON((...))') AND start DURING
    '2020-01-01/2020-02-01' LIMIT 10

Spark-first re-expression: no ANTLR — a hand-rolled tokenizer + recursive
descent parser (the same approach as `plans/cql.py`) compiles the full
grammar to ONE Spark SQL string, so everything but the Geom* UDF calls
stays inside whole-stage codegen and `plans/sqlrewrite.spatial_sql` can
inject the closed-form cell prefilter in front of the spatial UDFs exactly
as it does for hand-written SQL.

Surface parity with the reference registry:
- statements: ``SELECT sel[, ...] FROM t [WHERE f] [LIMIT n]``,
  ``DELETE FROM t [WHERE f]`` (the delete executes against a
  `table/snapshots.py` table — the engine's copy-on-write ``DELETE FROM``).
- selectors: ``*``, columns with ``AS`` aliases, or aggregates
  COUNT/MIN/MAX/SUM (single-arg, like the reference grammar) and the BBOX
  envelope aggregate.
- filters: AND / OR / NOT, ``( )`` and ``[ ]`` grouping, INCLUDE / EXCLUDE,
  comparisons ``= <> < <= > >=``, BETWEEN, IS [NOT] NULL.
- predicate functions: STRSTARTSWITH / STRENDSWITH / STRCONTAINS; spatial
  BBOX / BBOXLOOSE / INTERSECTS / INTERSECTSLOOSE / DISJOINT /
  DISJOINTLOOSE / CROSSES / OVERLAPS / CONTAINS / TOUCHES / WITHIN
  (geometry args are WKT, per the engine's geometry convention); temporal
  TCONTAINS / TOVERLAPS.
- infix temporal operators: BEFORE, BEFORE_OR_DURING, DURING,
  DURING_OR_AFTER, AFTER.
- expressions: ``+ - * /``, ABS, CONCAT, ``::`` casts
  (text / number / date / geometry), numeric / text / boolean literals.

Temporal semantics follow the reference's `GWQLParserTest` fixtures: a
bare datetime literal is an INSTANT (start == end — see the tcontains
assertions), ``'a/b'`` is the closed range [a, b]; for an instant-valued
field f vs range [s, e]:  AFTER ⇢ f > e,  BEFORE ⇢ f < s,
DURING ⇢ s <= f <= e,  BEFORE_OR_DURING ⇢ f <= e,
DURING_OR_AFTER ⇢ f >= s,  TOVERLAPS ⇢ s <= f <= e,
TCONTAINS(f, r) ⇢ f <= s AND f >= e (a point can only contain a point).

``BBOX(..., 'EPSG:3857')`` accepts web-mercator boxes and converts the
corners at compile time (`sfc/crs.inv_merc`); the LOOSE spatial variants
test envelopes only (the reference's "may return false positives" index
test) — both envelopes are computed at compile time for literal geometry
and the field side stays exact, a strict superset of the tight predicate.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..geom import wkt as W

_GEOM_TYPES = ("MULTIPOLYGON", "MULTILINESTRING", "MULTIPOINT",
               "POLYGON", "LINESTRING", "POINT")

# spatial predicate function name -> engine UDF (functions/register.py)
_SPATIAL_FNS = {
    "INTERSECTS": "GeomIntersects", "DISJOINT": "GeomDisjoint",
    "CROSSES": "GeomCrosses", "OVERLAPS": "GeomOverlaps",
    "CONTAINS": "GeomContains", "TOUCHES": "GeomTouches",
    "WITHIN": "GeomWithin",
}
_LOOSE_FNS = {"INTERSECTSLOOSE": "GeomIntersects",
              "DISJOINTLOOSE": "GeomDisjoint"}
_TEXT_FNS = {"STRSTARTSWITH": "startswith", "STRENDSWITH": "endswith",
             "STRCONTAINS": "contains"}
_TEMPORAL_FNS = ("TCONTAINS", "TOVERLAPS")
_TEMPORAL_OPS = ("BEFORE_OR_DURING", "DURING_OR_AFTER", "BEFORE", "DURING",
                 "AFTER")
_AGG_FNS = ("COUNT", "MIN", "MAX", "SUM", "BBOX")
_EXPR_FNS = {"ABS": "abs", "CONCAT": "concat"}

_KEYWORDS = {"SELECT", "DELETE", "FROM", "WHERE", "LIMIT", "AS", "AND",
             "OR", "NOT", "IS", "NULL", "BETWEEN", "INCLUDE", "EXCLUDE",
             "TRUE", "FALSE"}

_TOKEN_RE = re.compile(r"""
    \s*(?:
      (?P<num>-?\d+\.\d+(?:[eE][-+]?\d+)?|-?\d+(?:[eE]\d+)?)
    | (?P<str>'(?:[^'\\]|''|\\.)*')
    | (?P<cast>::)
    | (?P<op><>|<=|>=|=|<|>)
    | (?P<arith>[*/+\-])
    | (?P<punct>[(),;\[\]])
    | (?P<qident>"(?:[^"]|"")*"|`(?:[^`]|``)*`)
    | (?P<word>[A-Za-z_][A-Za-z0-9_]*)
    )""", re.VERBOSE)


class GWQLError(ValueError):
    pass


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            if text[pos:].strip() == "":
                break
            raise GWQLError(f"GWQL: cannot tokenize at: {text[pos:pos + 30]!r}")
        pos = m.end()
        kind = m.lastgroup
        val = m.group(kind)
        if kind == "word":
            up = val.upper()
            if up in _KEYWORDS:
                out.append(("kw", up))
            else:
                out.append(("ident", val))
        elif kind == "qident":
            out.append(("ident", val[1:-1].replace(val[0] * 2, val[0])))
        else:
            out.append((kind, val))
    return out


_DT_RE = re.compile(
    r"^(\d{4}-\d{2}-\d{2})([T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?)?(Z)?$")


def _parse_instant(s: str) -> str:
    m = _DT_RE.match(s.strip())
    if not m:
        raise GWQLError(f"GWQL: not a datetime literal: {s!r}")
    d, t, _z = m.groups()
    return f"{d} {t[1:] if t else '00:00:00'}"


def _temporal_range(lit: str) -> tuple[str, str]:
    """Text literal -> (start, end) SQL timestamp strings.  A bare datetime
    is an instant (start == end, `GWQLParserTest.testTemporalPredicateFunctions`
    in /root/reference asserts start == end for '2020-01-01')."""
    if "/" in lit:
        a, b = lit.split("/", 1)
        return _parse_instant(a), _parse_instant(b)
    t = _parse_instant(lit)
    return t, t


def _envelope_wkt(wkt_text: str) -> str:
    x0, y0, x1, y1 = W.bounds(wkt_text)
    if x0 == x1 and y0 == y1:
        return f"POINT ({x0} {y0})"
    return _box_wkt(x0, y0, x1, y1)


def _box_wkt(x0, y0, x1, y1) -> str:
    return (f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, "
            f"{x0} {y1}, {x0} {y0}))")


@dataclass
class _Expr:
    """A compiled expression: its SQL text plus the literal metadata the
    temporal/spatial emitters need at compile time."""

    sql: str
    text_lit: str | None = None  # unquoted python value when a text literal


@dataclass
class SelectStatement:
    table: str
    selectors: list[tuple[str, str | None]] | None  # None => *
    where: str | None
    limit: int | None
    aggregate: bool = False

    def to_sql(self) -> str:
        if self.selectors is None:
            cols = "*"
        else:
            cols = ", ".join(
                f"{e} AS {a}" if a else e for e, a in self.selectors)
        sql = f"SELECT {cols} FROM {self.table}"
        if self.where:
            sql += f" WHERE {self.where}"
        if self.limit is not None:
            sql += f" LIMIT {self.limit}"
        return sql


@dataclass
class DeleteStatement:
    table: str
    where: str | None


class _Parser:
    def __init__(self, toks, geom_map: dict[str, str]):
        self.toks = toks
        self.i = 0
        self.geom_map = geom_map

    # -- token helpers ------------------------------------------------
    def peek(self, kind=None, value=None):
        if self.i >= len(self.toks):
            return None
        k, v = self.toks[self.i]
        if kind and k != kind:
            return None
        if value is not None and v.upper() != value.upper():
            return None
        return v

    def take(self, kind=None, value=None):
        got = self.peek(kind, value)
        if got is None:
            at = self.toks[self.i] if self.i < len(self.toks) else "<EOF>"
            raise GWQLError(f"GWQL: expected {value or kind}, got {at}")
        self.i += 1
        return got

    def done(self) -> bool:
        while self.peek("punct", ";"):
            self.take()
        return self.i >= len(self.toks)

    # -- statements ---------------------------------------------------
    def statement(self):
        if self.peek("kw", "SELECT"):
            return self._select()
        if self.peek("kw", "DELETE"):
            return self._delete()
        raise GWQLError("GWQL: expected SELECT or DELETE")

    def _select(self) -> SelectStatement:
        self.take("kw", "SELECT")
        selectors, aggregate = self._selectors()
        self.take("kw", "FROM")
        table = self.take("ident")
        where = limit = None
        if self.peek("kw", "WHERE"):
            self.take()
            where = self.filter()
        if self.peek("kw", "LIMIT"):
            self.take()
            n = self.take("num")
            if "." in n or "-" in n:
                raise GWQLError(f"GWQL: LIMIT expects a positive integer, got {n}")
            limit = int(float(n))
        return SelectStatement(table, selectors, where, limit, aggregate)

    def _delete(self) -> DeleteStatement:
        self.take("kw", "DELETE")
        self.take("kw", "FROM")
        table = self.take("ident")
        where = None
        if self.peek("kw", "WHERE"):
            self.take()
            where = self.filter()
        return DeleteStatement(table, where)

    def _selectors(self):
        if self.peek("arith", "*"):
            self.take()
            return None, False
        first_is_agg = (
            self.peek("ident") is not None
            and self.toks[self.i][1].upper() in _AGG_FNS
            and self.i + 1 < len(self.toks)
            and self.toks[self.i + 1] == ("punct", "(")
        )
        sels = [self._agg_selector() if first_is_agg else self._col_selector()]
        while self.peek("punct", ","):
            self.take()
            sels.append(self._agg_selector() if first_is_agg
                        else self._col_selector())
        return sels, first_is_agg

    def _alias(self) -> str | None:
        if self.peek("kw", "AS"):
            self.take()
            return self.take("ident")
        return None

    def _col_selector(self):
        name = self.take("ident")
        return name, self._alias()

    def _agg_selector(self):
        fn = self.take("ident").upper()
        if fn not in _AGG_FNS:
            raise GWQLError(f"GWQL: unknown aggregation function {fn}")
        self.take("punct", "(")
        star = False
        if self.peek("arith", "*"):
            self.take()
            star = True
            arg = "*"
        else:
            arg = self.take("ident")
        self.take("punct", ")")
        alias = self._alias()
        if fn == "COUNT":
            expr = "count(*)" if star else f"count({arg})"
            return expr, alias or ("count_all" if star else f"count_{arg}")
        if star:
            raise GWQLError(f"GWQL: {fn}(*) is not valid")
        if fn == "BBOX":
            g = self.geom_map.get(arg, arg)
            expr = (f"named_struct('minx', min(GeomMinX({g})), "
                    f"'miny', min(GeomMinY({g})), "
                    f"'maxx', max(GeomMaxX({g})), "
                    f"'maxy', max(GeomMaxY({g})))")
            return expr, alias or f"bbox_{arg}"
        return f"{fn.lower()}({arg})", alias or f"{fn.lower()}_{arg}"

    # -- filters ------------------------------------------------------
    def filter(self) -> str:
        out = self._and_f()
        while self.peek("kw", "OR"):
            self.take()
            out = f"({out} OR {self._and_f()})"
        return out

    def _and_f(self) -> str:
        out = self._not_f()
        while self.peek("kw", "AND"):
            self.take()
            out = f"({out} AND {self._not_f()})"
        return out

    def _not_f(self) -> str:
        if self.peek("kw", "NOT"):
            self.take()
            return f"(NOT {self._not_f()})"
        return self._primary_f()

    def _primary_f(self) -> str:
        if self.peek("kw", "INCLUDE"):
            self.take()
            return "true"
        if self.peek("kw", "EXCLUDE"):
            self.take()
            return "false"
        for opn, cls in (("(", ")"), ("[", "]")):
            if self.peek("punct", opn) and self._paren_is_filter():
                self.take()
                f = self.filter()
                self.take("punct", cls)
                return f
        # predicate function?
        if self.peek("ident") is not None and self.i + 1 < len(self.toks) \
                and self.toks[self.i + 1] == ("punct", "("):
            name = self.toks[self.i][1].upper()
            if name in _SPATIAL_FNS or name in _LOOSE_FNS \
                    or name in _TEXT_FNS or name in _TEMPORAL_FNS \
                    or name in ("BBOX", "BBOXLOOSE"):
                return self._predicate_fn()
        return self._comparison()

    def _paren_is_filter(self) -> bool:
        """Lookahead: does this paren group contain a filter (vs an
        arithmetic expression)?  Scan to the matching close paren; any
        filter-only token (AND/OR/NOT/comparison/BETWEEN/IS) means filter."""
        depth = 0
        for k, v in self.toks[self.i:]:
            if k == "punct" and v in "([":
                depth += 1
            elif k == "punct" and v in ")]":
                depth -= 1
                if depth == 0:
                    return False
            elif k == "kw" and v in ("AND", "OR", "NOT", "BETWEEN", "IS",
                                     "INCLUDE", "EXCLUDE"):
                return True
            elif k == "op":
                return True
            elif k == "ident" and v.upper() in _TEMPORAL_OPS:
                return True
        return False

    def _predicate_fn(self) -> str:
        name = self.take("ident").upper()
        self.take("punct", "(")
        args: list[_Expr] = [self.expression()]
        while self.peek("punct", ","):
            self.take()
            args.append(self.expression())
        self.take("punct", ")")
        if name in _TEXT_FNS:
            if len(args) != 2:
                raise GWQLError(f"GWQL: {name} takes 2 arguments")
            return f"{_TEXT_FNS[name]}({args[0].sql}, {args[1].sql})"
        if name in _TEMPORAL_FNS:
            if len(args) != 2:
                raise GWQLError(f"GWQL: {name} takes 2 arguments")
            f, lit = args
            if lit.text_lit is None:
                raise GWQLError(f"GWQL: {name} needs a datetime literal")
            s, e = _temporal_range(lit.text_lit)
            if name == "TOVERLAPS":
                return (f"({f.sql} >= TIMESTAMP '{s}' AND "
                        f"{f.sql} <= TIMESTAMP '{e}')")
            return (f"({f.sql} <= TIMESTAMP '{s}' AND "
                    f"{f.sql} >= TIMESTAMP '{e}')")
        if name in ("BBOX", "BBOXLOOSE"):
            if len(args) not in (5, 6):
                raise GWQLError("GWQL: BBOX takes (geom, x0, y0, x1, y1[, crs])")
            g = args[0].sql
            try:
                x0, y0, x1, y1 = (float(a.sql) for a in args[1:5])
            except ValueError:
                raise GWQLError("GWQL: BBOX bounds must be numeric literals")
            if len(args) == 6:
                crs = (args[5].text_lit or "").upper()
                if crs in ("EPSG:4326", ""):
                    pass
                elif crs == "EPSG:3857":
                    from ..sfc import crs as C

                    (x0, x1), (y0, y1) = C.inv_merc([x0, x1], [y0, y1])
                else:
                    raise GWQLError(f"GWQL: unsupported CRS {crs!r}")
            # loose == tight for an axis-aligned box (its envelope is itself)
            return f"GeomIntersects({g}, '{_box_wkt(x0, y0, x1, y1)}')"
        # spatial predicates
        if len(args) != 2:
            raise GWQLError(f"GWQL: {name} takes 2 arguments")
        g, other = args
        if name in _LOOSE_FNS:
            if other.text_lit is None:
                raise GWQLError(f"GWQL: {name} needs a WKT literal")
            env = _envelope_wkt(other.text_lit)
            return f"{_LOOSE_FNS[name]}(GeomEnvelope({g.sql}), '{env}')"
        rhs = f"'{other.text_lit}'" if other.text_lit is not None else other.sql
        return f"{_SPATIAL_FNS[name]}({g.sql}, {rhs})"

    def _comparison(self) -> str:
        lhs = self.expression()
        if self.peek("kw", "IS"):
            self.take()
            if self.peek("kw", "NOT"):
                self.take()
                self.take("kw", "NULL")
                return f"({lhs.sql} IS NOT NULL)"
            self.take("kw", "NULL")
            return f"({lhs.sql} IS NULL)"
        if self.peek("kw", "BETWEEN"):
            self.take()
            lo = self.expression()
            self.take("kw", "AND")
            hi = self.expression()
            return f"({lhs.sql} BETWEEN {lo.sql} AND {hi.sql})"
        if self.peek("op") is not None:
            op = self.take("op")
            rhs = self.expression()
            sqlop = "!=" if op == "<>" else op
            return f"({lhs.sql} {sqlop} {rhs.sql})"
        if self.peek("ident") is not None \
                and self.toks[self.i][1].upper() in _TEMPORAL_OPS:
            op = self.take("ident").upper()
            rhs = self.expression()
            if rhs.text_lit is not None:
                s, e = _temporal_range(rhs.text_lit)
                s, e = f"TIMESTAMP '{s}'", f"TIMESTAMP '{e}'"
            else:
                s = e = rhs.sql
            f = lhs.sql
            return {
                "AFTER": f"({f} > {e})",
                "BEFORE": f"({f} < {s})",
                "DURING": f"({f} >= {s} AND {f} <= {e})",
                "BEFORE_OR_DURING": f"({f} <= {e})",
                "DURING_OR_AFTER": f"({f} >= {s})",
            }[op]
        raise GWQLError(
            f"GWQL: expected a predicate at token {self.i}: {self.toks[self.i:][:3]}")

    # -- expressions ----------------------------------------------------
    def expression(self) -> _Expr:
        out = self._term()
        while self.peek("arith", "+") or self.peek("arith", "-"):
            op = self.take("arith")
            rhs = self._term()
            out = _Expr(f"({out.sql} {op} {rhs.sql})")
        return self._postfix(out)

    def _term(self) -> _Expr:
        out = self._factor()
        while self.peek("arith", "*") or self.peek("arith", "/"):
            op = self.take("arith")
            rhs = self._factor()
            out = _Expr(f"({out.sql} {op} {rhs.sql})")
        return out

    def _factor(self) -> _Expr:
        if self.peek("punct", "(") or self.peek("punct", "["):
            cls = ")" if self.take("punct") == "(" else "]"
            e = self.expression()
            self.take("punct", cls)
            return self._postfix(_Expr(f"({e.sql})", e.text_lit))
        if self.peek("num") is not None:
            n = self.take("num")
            sql = n if "." in n or "e" in n or "E" in n else f"{n}"
            return self._postfix(_Expr(sql))
        if self.peek("str") is not None:
            raw = self.take("str")
            inner = raw[1:-1].replace("''", "'").replace("\\'", "'")
            return self._postfix(_Expr(raw, text_lit=inner))
        if self.peek("kw", "TRUE"):
            self.take()
            return _Expr("true")
        if self.peek("kw", "FALSE"):
            self.take()
            return _Expr("false")
        if self.peek("ident") is not None:
            name = self.take("ident")
            if self.peek("punct", "("):
                up = name.upper()
                if up not in _EXPR_FNS:
                    raise GWQLError(f"GWQL: unknown expression function {name}")
                self.take()
                args = [self.expression()]
                while self.peek("punct", ","):
                    self.take()
                    args.append(self.expression())
                self.take("punct", ")")
                sql = f"{_EXPR_FNS[up]}({', '.join(a.sql for a in args)})"
                return self._postfix(_Expr(sql))
            mapped = self.geom_map.get(name)
            return self._postfix(_Expr(mapped if mapped else name))
        raise GWQLError(f"GWQL: expected expression at {self.toks[self.i:][:3]}")

    def _postfix(self, e: _Expr) -> _Expr:
        while self.peek("cast") is not None:
            self.take()
            t = self.take("ident").lower()
            if t == "text":
                e = _Expr(f"cast({e.sql} as string)")
            elif t == "number":
                e = _Expr(f"cast({e.sql} as double)")
            elif t == "date":
                e = _Expr(f"cast({e.sql} as timestamp)", e.text_lit)
            elif t == "geometry":
                e = _Expr(e.sql, e.text_lit)  # geometry repr IS WKT text
            else:
                raise GWQLError(f"GWQL: unknown cast type {t!r}")
        return e


def parse_statement(statement: str, geom_map: dict[str, str] | None = None):
    """Parse a GWQL statement -> SelectStatement | DeleteStatement.

    ``geom_map`` binds GWQL geometry attribute names to SQL geometry
    expressions (the adapter-field binding in the reference), e.g.
    ``{"geom": "GeomPoint(lon, lat)"}``.
    """
    p = _Parser(_tokenize(statement), geom_map or {})
    stmt = p.statement()
    if not p.done():
        raise GWQLError(f"GWQL: trailing tokens: {p.toks[p.i:][:4]}")
    return stmt


def gwql(spark, statement: str, geom_map: dict[str, str] | None = None,
         snapshot_tables: dict[str, str] | None = None, optimize: bool = True,
         res: int = 6):
    """Execute a GWQL statement.

    SELECT -> DataFrame (spatial predicates get the same sqlrewrite cell
    prefilter as hand-written SQL).  DELETE -> the snapshot table layer's
    copy-on-write delete; ``snapshot_tables`` maps GWQL type names to
    `table/snapshots.py` paths (returns the commit summary dict).
    """
    from . import sqlrewrite

    stmt = parse_statement(statement, geom_map)
    if isinstance(stmt, DeleteStatement):
        paths = snapshot_tables or {}
        if stmt.table not in paths:
            raise GWQLError(
                f"GWQL: DELETE needs a snapshot table mapping for {stmt.table!r}")
        from ..table import snapshots as snap

        return snap.delete_where(spark, paths[stmt.table],
                                 stmt.where or "true")
    if not spark.catalog.tableExists(stmt.table):
        raise GWQLError(f"GWQL: no type named {stmt.table}")
    return sqlrewrite.spatial_sql(spark, stmt.to_sql(), optimize=optimize,
                                  res=res)
