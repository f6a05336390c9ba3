"""Recursive-descent parser for mutable's dialect.

Grammar: `/root/reference/doc/syntax-grammar.md`; operator precedence per
the reference's table (`src/parse/Parser.cpp:20-50`), tightest first:

    primary ( literals, designators, fn(), parens )
    unary   + - ~ NOT
    *  /  %
    +  -
    ..                      (string concatenation)
    =  !=  <  >  <=  >=  LIKE
    AND
    OR
"""

from __future__ import annotations

from mutable_spark.dialect import ast_nodes as A
from mutable_spark.dialect.lexer import Token, tokenize


class ParseError(ValueError):
    pass


def _int_value(tok: Token) -> int:
    """Integer literal → value, mirroring the reference lexer's bases:
    0x… hex, 0b… binary, leading-zero decimal is octal (TK_OCT_INT,
    `Lexer.cpp` read_number). Malformed literals raise ParseError with the
    token position instead of an uncaught ValueError."""
    text = tok.text
    try:
        if len(text) > 1 and text[0] == "0" and text[1].isdigit():
            return int(text, 8)
        return int(text, 0)
    except ValueError:
        raise ParseError(
            f"invalid integer literal {text!r} at position {tok.pos}"
        ) from None


def _float_value(tok: Token) -> float:
    """Float literal → value; hex floats (`0x1.23p5`, `Lexer.cpp`
    read_number's is_hex path) via float.fromhex, which wants an explicit
    exponent."""
    text = tok.text
    if text[:2].lower() == "0x":
        try:
            return float.fromhex(text if "p" in text.lower() else text + "p0")
        except ValueError:
            raise ParseError(
                f"invalid hex float literal {text!r} at position {tok.pos}"
            ) from None
    return float(text)


_AGG_OR_FN = {"COUNT", "SUM", "AVG", "MIN", "MAX", "ISNULL"}

#: keywords that the reference's own fixtures use as identifiers (e.g. the
#: `key` column of test/ours R/S/T) — accepted as names where context is
#: unambiguous
SOFT_KEYWORDS = {"KEY", "ROWS", "HEADER", "QUOTE", "ESCAPE", "DELIMITER", "DSV", "INDEX"}


class Parser:
    def __init__(self, sql: str):
        self.toks = tokenize(sql)
        self.i = 0

    # --- token helpers ---------------------------------------------------
    def peek(self) -> Token:
        return self.toks[self.i]

    def next(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept(self, kind: str, text: str | None = None) -> Token | None:
        t = self.peek()
        if t.kind == kind and (text is None or t.text == text):
            return self.next()
        return None

    def expect(self, kind: str, text: str | None = None) -> Token:
        t = self.accept(kind, text)
        if t is None:
            got = self.peek()
            raise ParseError(
                f"expected {text or kind}, got {got.text!r} at position {got.pos}"
            )
        return t

    def accept_kw(self, *kws: str) -> Token | None:
        t = self.peek()
        if t.kind == "KEYWORD" and t.text in kws:
            return self.next()
        return None

    def expect_kw(self, kw: str) -> Token:
        t = self.accept_kw(kw)
        if t is None:
            got = self.peek()
            raise ParseError(f"expected {kw}, got {got.text!r} at position {got.pos}")
        return t

    def expect_name(self) -> str:
        """Identifier, or a soft keyword used as an identifier."""
        t = self.peek()
        if t.kind == "IDENT":
            return self.next().text
        if t.kind == "KEYWORD" and t.text in SOFT_KEYWORDS:
            return self.next().orig or t.text.lower()
        raise ParseError(f"expected identifier, got {t.text!r} at position {t.pos}")

    # --- entry -----------------------------------------------------------
    def parse_stmt(self) -> A.Node:
        t = self.peek()
        if t.kind == "OP" and t.text == ";":
            # bare `;` → EmptyStmt (AST.hpp EmptyStmt; end2end-pos-empty)
            self.next()
            self.expect("EOF")
            return A.EmptyStmt()
        if t.kind != "KEYWORD":
            raise ParseError(f"statement must start with a keyword, got {t.text!r}")
        if t.text == "SELECT":
            stmt = self.parse_select()
        elif t.text == "CREATE":
            stmt = self.parse_create()
        elif t.text == "DROP":
            stmt = self.parse_drop()
        elif t.text == "USE":
            self.next()
            stmt = A.UseStmt(self.expect("IDENT").text)
        elif t.text == "INSERT":
            stmt = self.parse_insert()
        elif t.text == "IMPORT":
            stmt = self.parse_import()
        elif t.text == "UPDATE":
            stmt = self.parse_update()
        elif t.text == "DELETE":
            stmt = self.parse_delete()
        else:
            raise ParseError(f"unsupported statement {t.text}")
        self.accept("OP", ";")
        self.expect("EOF")
        return stmt

    # --- SELECT ----------------------------------------------------------
    def parse_select(self) -> A.SelectStmt:
        self.expect_kw("SELECT")
        s = A.SelectStmt()
        while True:
            if self.accept("OP", "*"):
                s.items.append(A.SelectItem(expr=None))
            else:
                e = self.parse_expr()
                alias = None
                if self.accept_kw("AS"):
                    alias = self.expect("IDENT").text
                s.items.append(A.SelectItem(expr=e, alias=alias))
            if not self.accept("OP", ","):
                break
        if self.accept_kw("FROM"):
            while True:
                s.from_.append(self.parse_table_ref())
                if not self.accept("OP", ","):
                    break
        if self.accept_kw("WHERE"):
            s.where = self.parse_expr()
        if self.accept_kw("GROUP"):
            self.expect_kw("BY")
            while True:
                e = self.parse_expr()
                alias = None
                if self.accept_kw("AS"):
                    alias = self.expect("IDENT").text
                s.group_by.append(A.GroupItem(e, alias))
                if not self.accept("OP", ","):
                    break
        if self.accept_kw("HAVING"):
            s.having = self.parse_expr()
        if self.accept_kw("ORDER"):
            self.expect_kw("BY")
            while True:
                e = self.parse_expr()
                asc = True
                if self.accept_kw("DESC"):
                    asc = False
                else:
                    self.accept_kw("ASC")
                s.order_by.append(A.OrderItem(e, asc))
                if not self.accept("OP", ","):
                    break
        if self.accept_kw("LIMIT"):
            t = self.expect("INT")
            s.limit, s.limit_raw = _int_value(t), (t.orig or t.text)
            if self.accept_kw("OFFSET"):
                t = self.expect("INT")
                s.offset, s.offset_raw = _int_value(t), (t.orig or t.text)
        return s

    def parse_table_ref(self) -> A.TableRef:
        if self.accept("OP", "("):
            sub = self.parse_select()
            self.expect("OP", ")")
            self.expect_kw("AS")
            alias = self.expect("IDENT").text
            return A.TableRef(name=None, subquery=sub, alias=alias)
        name = self.expect("IDENT").text
        alias = None
        if self.accept_kw("AS"):
            alias = self.expect("IDENT").text
        elif self.peek().kind == "IDENT":
            alias = self.next().text
        return A.TableRef(name=name, subquery=None, alias=alias)

    # --- DDL / DML -------------------------------------------------------
    def parse_create(self) -> A.Node:
        self.expect_kw("CREATE")
        if self.accept_kw("DATABASE"):
            return A.CreateDatabaseStmt(self.expect("IDENT").text)
        has_unique = bool(self.accept_kw("UNIQUE"))
        if has_unique:
            self.expect_kw("INDEX")
            return self.parse_create_index(has_unique=True)
        if self.accept_kw("INDEX"):
            return self.parse_create_index(has_unique=False)
        self.expect_kw("TABLE")
        tname = self.expect("IDENT").text
        self.expect("OP", "(")
        cols: list[A.ColumnDef] = []
        while True:
            cname = self.expect_name()
            ttok = self.next()
            if ttok.kind != "KEYWORD":
                raise ParseError(f"expected type name, got {ttok.text!r}")
            params: list[int] = []
            if self.accept("OP", "("):
                while True:
                    params.append(_int_value(self.expect("INT")))
                    if not self.accept("OP", ","):
                        break
                self.expect("OP", ")")
            col = A.ColumnDef(cname, ttok.text, params)
            while True:
                if self.accept_kw("PRIMARY"):
                    self.expect_kw("KEY")
                    col.primary_key = True
                    col.not_null = True
                    col.constraints.append(("PRIMARY KEY",))
                elif self.accept_kw("NOT"):
                    self.expect_kw("NULL")
                    col.not_null = True
                    col.constraints.append(("NOT NULL",))
                elif self.accept_kw("UNIQUE"):
                    col.unique = True
                    col.constraints.append(("UNIQUE",))
                elif self.accept_kw("REFERENCES"):
                    # expect_name: the referenced attribute may be a soft
                    # keyword (the fixture schema's `key` column)
                    ref_table = self.expect("IDENT").text
                    self.expect("OP", "(")
                    ref_attr = self.expect_name()
                    self.expect("OP", ")")
                    col.references.append((ref_table, ref_attr))
                    col.constraints.append(("REFERENCES", ref_table, ref_attr))
                elif self.accept_kw("CHECK"):
                    # CHECK '(' expression ')' — condition kept for sema's
                    # boolean-type requirement (`Sema.cpp:1543-1550`); not
                    # enforced at runtime, same as the reference
                    # (`src/mutable.cpp:238-256`)
                    self.expect("OP", "(")
                    cond = self.parse_expr()
                    self.expect("OP", ")")
                    col.checks.append(cond)
                    col.constraints.append(("CHECK", cond))
                else:
                    break
            cols.append(col)
            if not self.accept("OP", ","):
                break
        self.expect("OP", ")")
        return A.CreateTableStmt(tname, cols)

    def parse_create_index(self, has_unique: bool) -> A.CreateIndexStmt:
        """CREATE [UNIQUE] INDEX [[IF NOT EXISTS] name] ON table
        [USING (identifier|DEFAULT)] '(' key_field {, key_field} ')'
        — `Parser.cpp:395-480`. With IF NOT EXISTS the name is mandatory;
        without it the name is optional (sema rejects anonymous indexes).
        A key_field is a bare identifier or a parenthesized expression."""
        if_not_exists, name = False, None
        if self.accept_kw("IF"):
            self.expect_kw("NOT")
            self.expect_kw("EXISTS")
            if_not_exists = True
            name = self.expect("IDENT").text
        elif self.peek().kind == "IDENT":
            name = self.next().text
        self.expect_kw("ON")
        table = self.expect("IDENT").text
        method = None
        if self.accept_kw("USING"):
            t = self.peek()
            if t.kind == "KEYWORD" and t.text == "DEFAULT":
                self.next()
                method = "DEFAULT"
            elif t.kind == "IDENT":
                method = self.next().text
            else:
                raise ParseError(
                    f"expected an identifier or DEFAULT, got {t.text!r}"
                )
        self.expect("OP", "(")
        key_fields: list[A.Node] = []
        while True:
            t = self.peek()
            if t.kind == "IDENT":
                key_fields.append(A.Designator(None, self.next().text))
            elif t.kind == "OP" and t.text == "(":
                # parenthesized expression key field (parsed, sema rejects)
                key_fields.append(self.parse_expr())
            else:
                raise ParseError(
                    f"expected an identifier or expression, got {t.text!r}"
                )
            if not self.accept("OP", ","):
                break
        self.expect("OP", ")")
        return A.CreateIndexStmt(
            name=name,
            table=table,
            key_fields=key_fields,
            method=method,
            if_not_exists=if_not_exists,
            has_unique=has_unique,
        )

    def parse_drop(self) -> A.DropStmt:
        """DROP DATABASE|TABLE|INDEX [IF EXISTS] name {, name} — DATABASE
        takes exactly one name; TABLE/INDEX accept a comma list
        (`Parser.cpp` parse_Drop*Stmt)."""
        self.expect_kw("DROP")
        if self.accept_kw("DATABASE"):
            if_exists = self._accept_if_exists()
            return A.DropStmt("DATABASE", [self.expect("IDENT").text], if_exists)
        kind = "INDEX" if self.accept_kw("INDEX") else None
        if kind is None:
            self.expect_kw("TABLE")
            kind = "TABLE"
        if_exists = self._accept_if_exists()
        names = [self.expect("IDENT").text]
        while self.accept("OP", ","):
            names.append(self.expect("IDENT").text)
        return A.DropStmt(kind, names, if_exists)

    def _accept_if_exists(self) -> bool:
        if self.accept_kw("IF"):
            self.expect_kw("EXISTS")
            return True
        return False

    def parse_insert(self) -> A.InsertStmt:
        self.expect_kw("INSERT")
        self.expect_kw("INTO")
        table = self.expect("IDENT").text
        self.expect_kw("VALUES")
        rows: list[list[A.Node | str]] = []
        while True:
            self.expect("OP", "(")
            row: list[A.Node | str] = []
            while True:
                if self.accept_kw("DEFAULT"):
                    row.append("DEFAULT")
                else:
                    row.append(self.parse_expr())
                if not self.accept("OP", ","):
                    break
            self.expect("OP", ")")
            rows.append(row)
            if not self.accept("OP", ","):
                break
        return A.InsertStmt(table, rows)

    def parse_update(self) -> A.UpdateStmt:
        """update-statement ::= 'UPDATE' IDENTIFIER 'SET' IDENTIFIER '='
        expression { ',' ... } [ where-clause ]
        (`doc/syntax-grammar.md:105,163`)."""
        self.expect_kw("UPDATE")
        table = self.expect("IDENT").text
        self.expect_kw("SET")
        assignments: list[tuple[str, A.Node]] = []
        while True:
            name = self.expect("IDENT").text
            self.expect("OP", "=")
            assignments.append((name, self.parse_expr()))
            if not self.accept("OP", ","):
                break
        where = self.parse_expr() if self.accept_kw("WHERE") else None
        return A.UpdateStmt(table, assignments, where)

    def parse_delete(self) -> A.DeleteStmt:
        """delete-statement ::= 'DELETE' 'FROM' IDENTIFIER [ where-clause ]
        (`doc/syntax-grammar.md:110`)."""
        self.expect_kw("DELETE")
        self.expect_kw("FROM")
        table = self.expect("IDENT").text
        where = self.parse_expr() if self.accept_kw("WHERE") else None
        return A.DeleteStmt(table, where)

    def parse_import(self) -> A.ImportDSVStmt:
        self.expect_kw("IMPORT")
        self.expect_kw("INTO")
        table = self.expect("IDENT").text
        self.expect_kw("DSV")
        path = self.expect("STR").text
        stmt = A.ImportDSVStmt(table, path)
        while True:
            if self.accept_kw("ROWS"):
                stmt.rows = _int_value(self.expect("INT"))
            elif self.accept_kw("DELIMITER"):
                stmt.delimiter = self.expect("STR").text
            elif self.accept_kw("ESCAPE"):
                stmt.escape = self.expect("STR").text
            elif self.accept_kw("QUOTE"):
                stmt.quote = self.expect("STR").text
            elif self.accept_kw("HAS"):
                self.expect_kw("HEADER")
                stmt.has_header = True
            elif self.accept_kw("SKIP"):
                self.expect_kw("HEADER")
                stmt.skip_header = True
            else:
                break
        return stmt

    # --- expressions ------------------------------------------------------
    def expect_name_or_ident(self) -> str:
        return self.expect_name()

    def parse_expr(self) -> A.Node:
        return self.parse_or()

    def parse_or(self) -> A.Node:
        e = self.parse_and()
        while self.accept_kw("OR"):
            e = A.Binary("OR", e, self.parse_and())
        return e

    def parse_and(self) -> A.Node:
        e = self.parse_not()
        while self.accept_kw("AND"):
            e = A.Binary("AND", e, self.parse_not())
        return e

    def parse_not(self) -> A.Node:
        if self.accept_kw("NOT"):
            return A.Unary("NOT", self.parse_not())
        return self.parse_comparison()

    def parse_comparison(self) -> A.Node:
        e = self.parse_concat()
        while True:
            t = self.peek()
            if t.kind == "OP" and t.text in ("=", "!=", "<", ">", "<=", ">="):
                self.next()
                e = A.Binary(t.text, e, self.parse_concat())
            elif t.kind == "KEYWORD" and t.text == "LIKE":
                self.next()
                e = A.Binary("LIKE", e, self.parse_concat())
            else:
                return e

    def parse_concat(self) -> A.Node:
        e = self.parse_add()
        while self.accept("OP", ".."):
            e = A.Binary("..", e, self.parse_add())
        return e

    def parse_add(self) -> A.Node:
        e = self.parse_mul()
        while True:
            t = self.peek()
            if t.kind == "OP" and t.text in ("+", "-"):
                self.next()
                e = A.Binary(t.text, e, self.parse_mul())
            else:
                return e

    def parse_mul(self) -> A.Node:
        e = self.parse_unary()
        while True:
            t = self.peek()
            if t.kind == "OP" and t.text in ("*", "/", "%"):
                self.next()
                e = A.Binary(t.text, e, self.parse_unary())
            else:
                return e

    def parse_unary(self) -> A.Node:
        t = self.peek()
        if t.kind == "OP" and t.text in ("+", "-", "~"):
            self.next()
            return A.Unary(t.text, self.parse_unary())
        return self.parse_primary()

    def parse_primary(self) -> A.Node:
        t = self.next()
        if t.kind == "INT":
            return A.Literal(_int_value(t), "int", raw=t.orig or t.text)
        if t.kind == "FLOAT":
            return A.Literal(_float_value(t), "float", raw=t.orig or t.text)
        if t.kind == "STR":
            return A.Literal(t.text, "str", raw=t.orig)
        if t.kind == "DATE":
            kind = "datetime" if " " in t.text.strip() else "date"
            return A.Literal(t.text.strip(), kind, raw=t.orig)
        if t.kind == "KEYWORD" and t.text in SOFT_KEYWORDS:
            nxt = self.peek()
            name = t.orig or t.text.lower()
            if nxt.kind == "OP" and nxt.text == ".":
                self.next()
                return A.Designator(name, self.expect_name_or_ident())
            return A.Designator(None, name)
        if t.kind == "KEYWORD":
            if t.text == "TRUE":
                return A.Literal(True, "bool", raw="TRUE")
            if t.text == "FALSE":
                return A.Literal(False, "bool", raw="FALSE")
            if t.text == "NULL":
                return A.Literal(None, "null", raw="NULL")
            if t.text == "INT":  # INT(x) scalar cast, Functions.tbl:20
                self.expect("OP", "(")
                arg = self.parse_expr()
                self.expect("OP", ")")
                return A.FnApplication("INT", [arg])
            raise ParseError(f"unexpected keyword {t.text} in expression")
        if t.kind == "OP" and t.text == "(":
            nxt = self.peek()
            if nxt.kind == "KEYWORD" and nxt.text == "SELECT":
                sub = self.parse_select()
                self.expect("OP", ")")
                return A.QueryExpr(sub)
            e = self.parse_expr()
            self.expect("OP", ")")
            return e
        if t.kind == "IDENT":
            nxt = self.peek()
            if nxt.kind == "OP" and nxt.text == "(":
                name = t.text.upper()
                if name not in _AGG_OR_FN:
                    # mirror the reference: UDFs parse but sema rejects
                    # (`src/parse/Sema.cpp:549-552`)
                    name = t.text
                self.next()
                if self.accept("OP", "*"):
                    self.expect("OP", ")")
                    return A.FnApplication(name, [], star=True)
                args = []
                if not self.accept("OP", ")"):
                    while True:
                        args.append(self.parse_expr())
                        if not self.accept("OP", ","):
                            break
                    self.expect("OP", ")")
                return A.FnApplication(name, args)
            if nxt.kind == "OP" and nxt.text == ".":
                self.next()
                attr = self.expect_name_or_ident()
                return A.Designator(t.text, attr)
            return A.Designator(None, t.text)
        raise ParseError(f"unexpected token {t.text!r} at position {t.pos}")


def parse(sql: str) -> A.Node:
    return Parser(sql).parse_stmt()
