"""AST for mutable's dialect — mirrors the reference's node taxonomy
(`include/mutable/parse/AST.hpp`: Expr kinds :427-434, Clause kinds
:642-650, Stmt kinds :793-1004) at Python-dataclass granularity."""

from __future__ import annotations

from dataclasses import dataclass, field


class Node:
    pass


# --- expressions ----------------------------------------------------------
@dataclass
class Literal(Node):
    value: object  # int | float | str | bool | None
    kind: str      # 'int' | 'float' | 'str' | 'bool' | 'null' | 'date' | 'datetime'
    #: original source spelling — the reference's Constant keeps its token
    #: and its printer echoes `e.tok.text` verbatim (`ASTPrinter.cpp:24-27`:
    #: 0xC0FF33 stays hex, "ab\"c" keeps quotes+escapes), so round-trip
    #: printing needs the raw lexeme, not the converted value
    raw: str | None = None


@dataclass
class Designator(Node):
    """[table.]attribute (AST.hpp Designator)."""
    table: str | None
    attr: str


@dataclass
class FnApplication(Node):
    """COUNT/SUM/AVG/MIN/MAX/ISNULL/INT(...) — complete fn list
    `include/mutable/tables/Functions.tbl:10-20`."""
    name: str
    args: list[Node]
    star: bool = False  # COUNT(*)


@dataclass
class QueryExpr(Node):
    """Nested query in an expression position — `(SELECT …)` in WHERE or
    SELECT (AST.hpp QueryExpr). Correlated forms are decorrelated at
    compile time the way the reference's QueryGraph does
    (`src/IR/QueryGraph.cpp:24-340`)."""
    stmt: "SelectStmt"


@dataclass
class Unary(Node):
    op: str  # '+', '-', '~', 'NOT'
    operand: Node


@dataclass
class Binary(Node):
    op: str  # * / % + - .. < > <= >= = != AND OR LIKE
    left: Node
    right: Node


# --- clauses / statements -------------------------------------------------
@dataclass
class SelectItem(Node):
    expr: Node | None  # None → '*'
    alias: str | None = None


@dataclass
class TableRef(Node):
    name: str | None          # base table
    subquery: "SelectStmt | None"  # (SELECT …) AS alias
    alias: str | None = None


@dataclass
class OrderItem(Node):
    expr: Node
    asc: bool = True


@dataclass
class GroupItem(Node):
    """GROUP BY expr [AS alias] — nonstandard alias form, grammar
    `doc/syntax-grammar.md` group_by-clause."""
    expr: Node
    alias: str | None = None


@dataclass
class SelectStmt(Node):
    items: list[SelectItem] = field(default_factory=list)
    from_: list[TableRef] = field(default_factory=list)
    where: Node | None = None
    group_by: list[GroupItem] = field(default_factory=list)
    having: Node | None = None
    order_by: list[OrderItem] = field(default_factory=list)
    limit: int | None = None
    offset: int | None = None
    # raw token spellings — the reference ASTPrinter echoes c.limit.text
    # verbatim (ASTPrinter.cpp:139), so `LIMIT 0x10` must round-trip as
    # `LIMIT 0x10`, not `LIMIT 16`
    limit_raw: str | None = None
    offset_raw: str | None = None


@dataclass
class ColumnDef(Node):
    name: str
    type_name: str           # INT, FLOAT, DOUBLE, DECIMAL, BOOL, CHAR, VARCHAR, DATE, DATETIME
    params: list[int] = field(default_factory=list)
    not_null: bool = False
    primary_key: bool = False
    unique: bool = False
    #: REFERENCES t(attr) constraints — kept as a list so sema can reject
    #: multiples (`Sema.cpp:1552-1555`: at most one reference per attribute)
    references: list[tuple[str, str]] = field(default_factory=list)
    #: CHECK condition expressions — sema requires boolean type
    #: (`Sema.cpp:1543-1550`); any number allowed
    checks: list[Node] = field(default_factory=list)
    #: ordered constraint record in PARSE order, with duplicates — the
    #: reference keeps `attr->constraints` as the parsed list and its
    #: printer echoes it verbatim (`ASTPrinter.cpp:210-223`: `UNIQUE ...
    #: NOT NULL UNIQUE NOT NULL` round-trips with both repeats). Entries:
    #: ('PRIMARY KEY',) ('NOT NULL',) ('UNIQUE',) ('CHECK', expr)
    #: ('REFERENCES', table, attr). The boolean/list fields above stay the
    #: deduplicated view sema and the engine consume.
    constraints: list[tuple] = field(default_factory=list)


@dataclass
class CreateTableStmt(Node):
    name: str
    columns: list[ColumnDef]


@dataclass
class CreateDatabaseStmt(Node):
    name: str


@dataclass
class DropStmt(Node):
    """DROP DATABASE|TABLE|INDEX [IF EXISTS] name {, name} — grammar
    `Parser.cpp` parse_Drop{Database,Table,Index}Stmt (DATABASE takes a
    single name; TABLE/INDEX take a list)."""

    kind: str  # 'TABLE' | 'DATABASE' | 'INDEX'
    names: list[str]
    if_exists: bool = False


@dataclass
class CreateIndexStmt(Node):
    """CREATE [UNIQUE] INDEX [[IF NOT EXISTS] name] ON table
    [USING method] '(' key_field {',' key_field} ')' —
    `Parser.cpp:395-480` parse_CreateIndexStmt."""

    name: str | None
    table: str
    key_fields: list[Node]
    method: str | None = None  # None/'DEFAULT' | identifier
    if_not_exists: bool = False
    has_unique: bool = False


@dataclass
class EmptyStmt(Node):
    """A bare `;` (AST.hpp EmptyStmt) — parses clean, prints as `;`,
    executes as a no-op (`test/empty/end2end-pos-empty.yml`)."""


@dataclass
class UseStmt(Node):
    name: str


@dataclass
class InsertStmt(Node):
    table: str
    rows: list[list[Node | str]]  # Node expr, or 'DEFAULT'


@dataclass
class UpdateStmt(Node):
    """UPDATE t SET a = expr {, a = expr} [WHERE cond] — grammar
    update-statement (`doc/syntax-grammar.md:105,163`; AST.hpp:985). The
    reference parses this but its sema/execution are `M_unreachable`
    (`Sema.cpp:1884`, `DatabaseCommand.cpp:189-191`); here it executes
    copy-on-write (additive)."""
    table: str
    assignments: list[tuple[str, Node]]
    where: Node | None = None


@dataclass
class DeleteStmt(Node):
    """DELETE FROM t [WHERE cond] — grammar delete-statement
    (`doc/syntax-grammar.md:110`; AST.hpp:1004); reference execution
    unreachable, completed here copy-on-write (additive)."""
    table: str
    where: Node | None = None


@dataclass
class ImportDSVStmt(Node):
    """IMPORT INTO t DSV "file" [ROWS n] [DELIMITER c] [ESCAPE c] [QUOTE c]
    [HAS HEADER] [SKIP HEADER] — grammar import-statement; reader config
    `src/mutable.cpp:263-292`."""
    table: str
    path: str
    rows: int | None = None
    delimiter: str = ","
    escape: str = "\\"
    quote: str = '"'
    has_header: bool = False
    skip_header: bool = False
