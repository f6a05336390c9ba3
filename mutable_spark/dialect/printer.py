"""Statement pretty-printer — behavioral twin of the reference's
ASTPrinter (`src/parse/ASTPrinter.cpp`), the `parser` test stage of the
corpus harness: `mutable --parse` echoes every parsed statement in this
canonical layout, and `test/empty/parse-pos-*.yml` pin it golden-exact.

Format contract (all cited to ASTPrinter.cpp):
- expressions: constants echo their raw lexeme (`:24-27`), designators
  print `[table.]attr` (`:17-22`), fn applications `NAME(arg, ...)`
  (`:29-38`), unary `(OPexpr)` with a space only after NOT (`:40-46`),
  binary ALWAYS parenthesized `(lhs op rhs)` (`:48-55`), nested queries
  `(SELECT ...)` expanded inline (`:57-66`);
- SELECT: one clause per line, `*` and items comma-joined (`:75-85`),
  FROM subqueries print their inner statement verbatim — newlines and
  all — inside parens (`:86-103`), ORDER BY always prints an explicit
  ASC/DESC (`:126-136`), LIMIT keeps a literal `OFFSET 0` (`:137-144`);
  a nested SELECT drops its semicolon (`:274-310`);
- CREATE TABLE: attributes indented 4, constraints echoed in parse
  order with duplicates (`:210-223`);
- INSERT/UPDATE/DELETE/USE/IMPORT layouts per `:312-364`.
"""

from __future__ import annotations

from . import ast_nodes as A


def _lit(e: A.Literal) -> str:
    if e.raw is not None:
        return e.raw
    if e.kind == "str":
        return f'"{e.value}"'
    if e.kind == "bool":
        return "TRUE" if e.value else "FALSE"
    if e.kind == "null":
        return "NULL"
    if e.kind in ("date", "datetime"):
        return f"d'{e.value}'"
    return str(e.value)


def print_expr(e: A.Node) -> str:
    if isinstance(e, A.Literal):
        return _lit(e)
    if isinstance(e, A.Designator):
        return f"{e.table}.{e.attr}" if e.table else e.attr
    if isinstance(e, A.FnApplication):
        if e.star:
            return f"{e.name}(*)"
        return f"{e.name}({', '.join(print_expr(a) for a in e.args)})"
    if isinstance(e, A.Unary):
        sep = " " if e.op == "NOT" else ""
        return f"({e.op}{sep}{print_expr(e.operand)})"
    if isinstance(e, A.Binary):
        return f"({print_expr(e.left)} {e.op} {print_expr(e.right)})"
    if isinstance(e, A.QueryExpr):
        return f"({_select_body(e.stmt)})"
    raise TypeError(f"cannot print expression {e!r}")


def _select_body(s: A.SelectStmt) -> str:
    """SELECT statement without the trailing semicolon (the nested form,
    ASTPrinter.cpp:274-310)."""
    items = ", ".join(
        "*" if it.expr is None
        else print_expr(it.expr) + (f" AS {it.alias}" if it.alias else "")
        for it in s.items
    )
    lines = [f"SELECT {items}"]
    if s.from_:
        srcs = []
        for t in s.from_:
            base = f"({_select_body(t.subquery)})" if t.subquery else t.name
            srcs.append(base + (f" AS {t.alias}" if t.alias else ""))
        lines.append("FROM " + ", ".join(srcs))
    if s.where is not None:
        lines.append("WHERE " + print_expr(s.where))
    if s.group_by:
        lines.append(
            "GROUP BY "
            + ", ".join(
                print_expr(g.expr) + (f" AS {g.alias}" if g.alias else "")
                for g in s.group_by
            )
        )
    if s.having is not None:
        lines.append("HAVING " + print_expr(s.having))
    if s.order_by:
        lines.append(
            "ORDER BY "
            + ", ".join(
                print_expr(o.expr) + (" ASC" if o.asc else " DESC")
                for o in s.order_by
            )
        )
    if s.limit is not None:
        # echo the raw token spelling (ASTPrinter.cpp:139 prints
        # c.limit.text): `LIMIT 0x10` must not normalize to `LIMIT 16`
        lim = f"LIMIT {s.limit_raw if s.limit_raw is not None else s.limit}"
        if s.offset is not None:
            off = s.offset_raw if s.offset_raw is not None else s.offset
            lim += f" OFFSET {off}"
        lines.append(lim)
    return "\n".join(lines)


def _constraint(c: tuple) -> str:
    if c[0] == "CHECK":
        return f"CHECK ({print_expr(c[1])})"
    if c[0] == "REFERENCES":
        return f"REFERENCES {c[1]}({c[2]})"
    return c[0]  # PRIMARY KEY / NOT NULL / UNIQUE


def _type(col: A.ColumnDef) -> str:
    t = col.type_name
    if col.params:
        t += "(" + ", ".join(str(p) for p in col.params) + ")"
    return t


def print_stmt(s: A.Node) -> str:
    """Canonical single-statement rendering, trailing `;` included."""
    if isinstance(s, A.EmptyStmt):
        return ";"
    if isinstance(s, A.SelectStmt):
        return _select_body(s) + ";"
    if isinstance(s, A.UseStmt):
        return f"USE {s.name};"
    if isinstance(s, A.CreateDatabaseStmt):
        return f"CREATE DATABASE {s.name};"
    if isinstance(s, A.CreateTableStmt):
        cols = ",".join(
            "\n    "
            + " ".join(
                [c.name, _type(c)] + [_constraint(k) for k in c.constraints]
            )
            for c in s.columns
        )
        return f"CREATE TABLE {s.name}\n({cols}\n);"
    if isinstance(s, A.DropStmt):
        kw = {"TABLE": "DROP TABLE ", "DATABASE": "DROP DATABASE ",
              "INDEX": "DROP INDEX "}[s.kind]
        ifx = "IF EXISTS " if s.if_exists else ""
        return kw + ifx + ", ".join(s.names) + ";"
    if isinstance(s, A.InsertStmt):
        tuples = ",\n    ".join(
            "("
            + ", ".join(
                v if isinstance(v, str) else print_expr(v) for v in row
            )
            + ")"
            for row in s.rows
        )
        return f"INSERT INTO {s.table}\nVALUES\n    {tuples};"
    if isinstance(s, A.UpdateStmt):
        sets = ",\n".join(
            f"    {name} = {print_expr(expr)}" for name, expr in s.assignments
        )
        out = f"UPDATE {s.table}\nSET\n{sets}"
        if s.where is not None:
            out += "\nWHERE " + print_expr(s.where)
        return out + ";"
    if isinstance(s, A.DeleteStmt):
        out = f"DELETE FROM {s.table}"
        if s.where is not None:
            out += "\nWHERE " + print_expr(s.where)
        return out + ";"
    if isinstance(s, A.ImportDSVStmt):
        # non-default reader options are printed so the canonical form
        # round-trips the statement's semantics (ASTPrinter.cpp:349-364
        # prints the delimiter/header tokens it parsed; our AST stores
        # resolved option values, so "differs from default" is the
        # equivalent presence test)
        out = f'IMPORT INTO {s.table} DSV "{s.path}"'
        if s.rows is not None:
            out += f" ROWS {s.rows}"
        if s.delimiter != ",":
            out += f' DELIMITER "{s.delimiter}"'
        if s.escape != "\\":
            out += f' ESCAPE "{s.escape}"'
        if s.quote != '"':
            out += f' QUOTE "{s.quote}"'
        if s.has_header:
            out += " HAS HEADER"
        if s.skip_header:
            out += " SKIP HEADER"
        return out + ";"
    if isinstance(s, A.CreateIndexStmt):
        out = "CREATE " + ("UNIQUE " if s.has_unique else "") + "INDEX "
        if s.if_not_exists:
            out += "IF NOT EXISTS "
        if s.name:
            out += s.name + " "
        out += f"ON {s.table}"
        if s.method and s.method != "DEFAULT":
            out += f" USING {s.method}"
        fields = ",".join("\n    " + print_expr(f) for f in s.key_fields)
        return out + f"\n({fields}\n);"
    raise TypeError(f"cannot print statement {s!r}")
