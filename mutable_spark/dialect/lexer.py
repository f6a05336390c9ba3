"""Lexer for mutable's SQL dialect.

Token inventory follows the reference's `include/mutable/tables/TokenType.tbl`
and keyword table `Keywords.tbl` (lexer impl `src/lex/Lexer.cpp`): keywords
are case-sensitive-insensitively matched, identifiers are
`[A-Za-z_][A-Za-z0-9_]*`, literals include integers, floats, single- or
double-quoted strings, and date/datetime literals `d'YYYY-MM-DD'` /
`d'YYYY-MM-DD HH:MM:SS'` (`src/lex/Lexer.cpp:56-62,267`). The operator `..`
is string concatenation (`Sema.cpp:794-811`), `~` bitwise NOT.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


class LexError(ValueError):
    pass


KEYWORDS = {
    # statement / clause keywords actually in Keywords.tbl (SURVEY §2.3:
    # notably NO CASE/IN/EXISTS/BETWEEN/DISTINCT/OVER/UNION)
    "SELECT", "FROM", "WHERE", "GROUP", "BY", "HAVING", "ORDER", "LIMIT",
    "OFFSET", "AS", "ASC", "DESC", "AND", "OR", "NOT", "LIKE",
    "CREATE", "DROP", "DATABASE", "TABLE", "USE", "INSERT", "INTO",
    "UPDATE", "DELETE", "SET",
    "VALUES", "DEFAULT", "IMPORT", "DSV", "ROWS", "DELIMITER", "ESCAPE",
    "QUOTE", "HAS", "SKIP", "HEADER", "TRUE", "FALSE", "NULL",
    "PRIMARY", "KEY", "UNIQUE", "REFERENCES", "CHECK",
    "INT", "FLOAT", "DOUBLE", "DECIMAL", "BOOL", "CHAR", "VARCHAR",
    "DATE", "DATETIME", "INDEX", "ON",
    # index / drop grammar (Keywords.tbl: If, Exists, Using, Cascade,
    # Restrict — the latter two reserved but unused, as in the reference)
    "IF", "EXISTS", "USING", "CASCADE", "RESTRICT",
}

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|--[^\n]*)
  | (?P<datelit>[dD]'(?P<dateval>[^']*)')
  | (?P<float>
        0[xX][0-9a-fA-F]*\.[0-9a-fA-F]*(?:[pP][+-]?\d+)?  (?# hex: has '.')
      | 0[xX][0-9a-fA-F]+[pP][+-]?\d+                     (?# hex: has 'p')
      | \d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+
    )
  | (?P<int>0[xX][0-9a-fA-F]+|\d+)
  | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>\.\.|<=|>=|!=|<|>|=|\+|-|\*|/|%|~|\(|\)|,|;|\.)
    """,
    re.VERBOSE,
)


@dataclass(frozen=True)
class Token:
    kind: str  # KEYWORD, IDENT, INT, FLOAT, STR, DATE, OP, EOF
    text: str
    pos: int
    orig: str = ""  # original spelling (keywords are canonicalized upper)


def tokenize(sql: str) -> list[Token]:
    out: list[Token] = []
    i = 0
    while i < len(sql):
        m = _TOKEN_RE.match(sql, i)
        if not m:
            raise LexError(f"illegal character {sql[i]!r} at position {i}")
        i = m.end()
        if m.lastgroup == "ws" or (m.group("ws") is not None):
            continue
        if m.group("datelit") is not None:
            out.append(Token("DATE", m.group("dateval"), m.start(), m.group()))
        elif m.group("float") is not None:
            out.append(Token("FLOAT", m.group("float"), m.start(), m.group()))
        elif m.group("int") is not None:
            out.append(Token("INT", m.group("int"), m.start(), m.group()))
        elif m.group("str") is not None:
            raw = m.group("str")
            body = raw[1:-1].replace("\\'", "'").replace('\\"', '"').replace("\\\\", "\\")
            out.append(Token("STR", body, m.start(), raw))
        elif m.group("ident") is not None:
            text = m.group("ident")
            # keywords are case-SENSITIVE, exactly like the reference
            # (`src/lex/Lexer.cpp:121`: exact pooled-string lookup) — a
            # lowercase `key`/`select` is a plain identifier
            if text in KEYWORDS:
                out.append(Token("KEYWORD", text, m.start(), text))
            else:
                out.append(Token("IDENT", text, m.start(), text))
        else:
            out.append(Token("OP", m.group("op"), m.start()))
    out.append(Token("EOF", "", len(sql)))
    return out


# --------------------------------------------------------------------------
# Token-stream dump — the reference's `lexer` test stage
# (`test/empty/lexer-pos-*.yml`): one line per token,
# `-:LINE:COL: TEXT TK_NAME`, where TEXT is the raw source spelling and the
# TK names come from `include/mutable/tables/TokenType.tbl` +
# `Keywords.tbl` + `Operators.tbl`.

#: keyword text -> TokenType name (Keywords.tbl's TokenType column): the
#: capitalized spelling of the keyword except the two long forms
_KW_TOKEN_NAME = {
    kw: {"ASC": "Ascending", "DESC": "Descending"}.get(kw, kw.capitalize())
    for kw in KEYWORDS
}

_OP_TOKEN_NAME = {
    "(": "LPAR", ")": "RPAR", "~": "TILDE", "+": "PLUS", "-": "MINUS",
    "*": "ASTERISK", "/": "SLASH", "%": "PERCENT", "..": "DOTDOT",
    "=": "EQUAL", "!=": "BANG_EQUAL", "<": "LESS", ">": "GREATER",
    "<=": "LESS_EQUAL", ">=": "GREATER_EQUAL", ",": "COMMA", ".": "DOT",
    ";": "SEMICOL",
}


def _token_type_name(tok: Token) -> str:
    """TK_* classification, mirroring `Lexer.cpp read_number`: a leading-0
    integer is octal (bare `0` included), 0x.. is hex; a number is a FLOAT
    when it carries '.'/exponent (hex floats use the p-exponent)."""
    if tok.kind == "KEYWORD":
        return "TK_" + _KW_TOKEN_NAME[tok.text]
    if tok.kind == "IDENT":
        return "TK_IDENTIFIER"
    if tok.kind == "INT":
        t = tok.text
        if t[:2].lower() == "0x":
            return "TK_HEX_INT"
        if t.startswith("0") and any(ch in "89" for ch in t):
            # Lexer.cpp read_number: a 0-prefixed (octal) integer that
            # contains decimal-only digits leaves `is != has` -> TK_ERROR
            # ('08'/'09' are invalid numbers, not octal literals)
            return "TK_ERROR"
        return "TK_OCT_INT" if t.startswith("0") else "TK_DEC_INT"
    if tok.kind == "FLOAT":
        return "TK_HEX_FLOAT" if tok.text[:2].lower() == "0x" else "TK_DEC_FLOAT"
    if tok.kind == "STR":
        return "TK_STRING_LITERAL"
    if tok.kind == "DATE":
        return "TK_DATE_TIME" if " " in tok.text.strip() else "TK_DATE"
    if tok.kind == "OP":
        return "TK_" + _OP_TOKEN_NAME[tok.text]
    raise LexError(f"no token-type name for {tok!r}")


def token_dump(sql: str, filename: str = "-") -> str:
    """The reference lexer stage's stdout: `FILE:LINE:COL: TEXT TK_NAME`
    per token (1-based line/column), EOF omitted."""
    lines = []
    for tok in tokenize(sql):
        if tok.kind == "EOF":
            break
        prefix = sql[: tok.pos]
        line = prefix.count("\n") + 1
        col = tok.pos - (prefix.rfind("\n") + 1) + 1
        text = tok.orig or tok.text
        lines.append(f"{filename}:{line}:{col}: {text} {_token_type_name(tok)}")
    return "".join(ln + "\n" for ln in lines)
