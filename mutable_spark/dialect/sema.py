"""Semantic analysis — mutable's typing + validation rules
(`src/parse/Sema.cpp`), applied to the dialect AST before compilation.

Implemented checks (mirroring the reference's sema-negative test corpus,
`test/ours/sema-san-select-*.yml`):
- unknown / ambiguous designators (attribute in several FROM sources)
- UDF rejection: "User-defined functions are not yet supported"
  (`Sema.cpp:549-552`)
- aggregates are illegal in WHERE and GROUP BY
- scalar/vector mixing (`Type.hpp:47-48`, `semantics.md:39-45`): in a
  grouped query every SELECT/HAVING/ORDER BY expression must be composed
  of group keys, aggregates, or constants
- operand typing: arithmetic needs numerics, `..` needs strings, LIKE
  needs strings (`Sema.cpp:790-925`)

Type vocabulary is Spark dtype strings ('bigint', 'double', 'string', …);
`arithmetic_join` reproduces the reference's widening rules
(`semantics.md:50-73`) so the compiler can emit explicit casts.
"""

from __future__ import annotations

from mutable_spark.dialect import ast_nodes as A

AGGREGATES = {"COUNT", "SUM", "AVG", "MIN", "MAX"}
BUILTINS = AGGREGATES | {"ISNULL", "INT"}

_INTS = ("tinyint", "smallint", "int", "bigint")
_NUMERIC = _INTS + ("float", "double")


class SemaError(ValueError):
    pass


def is_int(t: str) -> bool:
    return t in _INTS


def is_numeric(t: str) -> bool:
    return t in _NUMERIC or t.startswith("decimal")


def _decimal_params(t: str) -> tuple[int, int]:
    """'decimal(p,s)' → (p, s); bare 'decimal' → Spark's default (10, 0)."""
    if "(" not in t:
        return (10, 0)
    p, s = t[t.index("(") + 1 : t.rindex(")")].split(",")
    return (int(p), int(s))


def arithmetic_join(lt: str, rt: str, op: str) -> str:
    """Result type of a binary arithmetic expression (`semantics.md:50-73`,
    impl used at `Sema.cpp:790`): ints widen by width; any floating operand
    makes the result floating; FLOAT+DOUBLE→DOUBLE."""
    if not (is_numeric(lt) and is_numeric(rt)):
        raise SemaError(f"invalid operands to binary {op}: {lt}, {rt}")
    if "double" in (lt, rt):
        return "double"
    if lt.startswith("decimal") or rt.startswith("decimal"):
        if lt.startswith("decimal") and rt.startswith("decimal"):
            # combine numerically: max integer digits + max scale (NOT a
            # lexicographic dtype-string compare, which would rank
            # decimal(18,2) below decimal(3,2))
            (lp, ls), (rp, rs) = _decimal_params(lt), _decimal_params(rt)
            scale = max(ls, rs)
            precision = max(lp - ls, rp - rs) + scale
            return f"decimal({min(precision, 38)},{scale})"
        return lt if lt.startswith("decimal") else rt
    if "float" in (lt, rt):
        return "float"
    return _INTS[max(_INTS.index(lt), _INTS.index(rt))]


def walk(node: A.Node):
    yield node
    if isinstance(node, A.Unary):
        yield from walk(node.operand)
    elif isinstance(node, A.Binary):
        yield from walk(node.left)
        yield from walk(node.right)
    elif isinstance(node, A.FnApplication):
        for a in node.args:
            yield from walk(a)


def designator_matches(e: A.Node, k: A.Node) -> bool:
    """``e`` refers to grouping key ``k``, allowing an unqualified
    designator to match a table-qualified one with the same attribute
    (the reference binds grouping-key results by attribute name,
    `Sema.cpp:262-276`: `SELECT key … GROUP BY R.key` is valid)."""
    if e == k:
        return True
    if (
        isinstance(e, A.Designator)
        and isinstance(k, A.Designator)
        and e.attr == k.attr
    ):
        return e.table is None or k.table is None
    return False


def contains_aggregate(node: A.Node) -> bool:
    return any(
        isinstance(n, A.FnApplication) and n.name.upper() in AGGREGATES
        for n in walk(node)
    )


def check_no_udf(node: A.Node) -> None:
    for n in walk(node):
        if isinstance(n, A.FnApplication) and n.name.upper() not in BUILTINS:
            raise SemaError("User-defined functions are not yet supported")


def check_stmt(stmt: A.SelectStmt) -> None:
    """Statement-level checks that don't need the schema (the compiler does
    name resolution and operand typing with the schema in hand)."""
    for item in stmt.items:
        if item.expr is not None:
            check_no_udf(item.expr)
    if stmt.where is not None:
        check_no_udf(stmt.where)
        if contains_aggregate(stmt.where):
            raise SemaError("aggregate functions are not allowed in WHERE")
    for g in stmt.group_by:
        check_no_udf(g.expr)
        if contains_aggregate(g.expr):
            raise SemaError("aggregate functions are not allowed in GROUP BY")
    if stmt.having is not None:
        check_no_udf(stmt.having)

    def _is_vectorial(e: A.Node) -> bool:
        """Does the expression reference an attribute (per-row varying)?
        Scalar subqueries are scalar by construction — do NOT descend."""
        if isinstance(e, A.Designator):
            return True
        if isinstance(e, (A.Literal, A.QueryExpr)):
            return False
        if isinstance(e, A.Unary):
            return _is_vectorial(e.operand)
        if isinstance(e, A.Binary):
            return _is_vectorial(e.left) or _is_vectorial(e.right)
        if isinstance(e, A.FnApplication):
            return any(_is_vectorial(a) for a in e.args)
        return False

    # HAVING makes the query grouped even without GROUP BY (global group)
    grouped = (
        bool(stmt.group_by)
        or stmt.having is not None
        or any(
            item.expr is not None and contains_aggregate(item.expr)
            for item in stmt.items
        )
    )
    if grouped:
        keys = [g.expr for g in stmt.group_by]
        key_aliases = {g.alias for g in stmt.group_by if g.alias}

        def scalar_ok(e: A.Node) -> bool:
            """Expression is scalar in the grouped context: a group key, an
            aggregate, a literal, or built from scalar parts."""
            if any(designator_matches(e, k) for k in keys):
                return True
            if isinstance(e, A.Designator) and e.table is None and e.attr in key_aliases:
                return True
            if isinstance(e, A.Literal):
                return True
            if isinstance(e, A.QueryExpr):
                return True  # a scalar subquery is scalar by construction
            if isinstance(e, A.FnApplication) and e.name.upper() in AGGREGATES:
                return True
            if isinstance(e, A.FnApplication):
                return all(scalar_ok(a) for a in e.args)
            if isinstance(e, A.Unary):
                return scalar_ok(e.operand)
            if isinstance(e, A.Binary):
                return scalar_ok(e.left) and scalar_ok(e.right)
            return False

        for item in stmt.items:
            if item.expr is None:
                continue
            if not scalar_ok(item.expr):
                raise SemaError(
                    "expression is neither a grouping key nor composed of "
                    "aggregates (scalar/vector mismatch)"
                )
        if stmt.having is not None and not scalar_ok(stmt.having):
            raise SemaError(
                "HAVING expression must be composed of grouping keys and aggregates"
            )
    else:
        # Sema.cpp:1358-1361: without grouping, an ordering expression
        # must be vectorial — a constant orders nothing (and the dialect
        # has no ordinal ORDER BY; DuckDB would read `ORDER BY 2` as a
        # column position, the reference rejects it)
        for o in stmt.order_by:
            if not _is_vectorial(o.expr):
                raise SemaError(
                    f"Cannot order by {o.expr}, expression must be vectorial"
                )
