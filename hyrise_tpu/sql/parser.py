"""SQL lexer + recursive-descent parser.

Replaces the reference's vendored flex/bison parser
(third_party/sql-parser, invoked at sql_pipeline_statement.cpp:78) with a
hand-written Python parser covering the same surface: SELECT (joins incl.
natural/USING, set operations, GROUP BY/HAVING, DISTINCT, ORDER BY,
LIMIT/OFFSET, WITH CTEs, subqueries, CASE, EXISTS, IN, BETWEEN, LIKE,
CAST, EXTRACT, intervals), DML (INSERT/UPDATE/DELETE), DDL (CREATE/DROP
TABLE/VIEW, PREPARE/EXECUTE), COPY import/export, transaction control.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

from hyrise_tpu.expression import ast
from hyrise_tpu.sql import statements as st
from hyrise_tpu.types import DataType, PredicateCondition

KEYWORDS = {
    "select", "from", "where", "group", "by", "having", "order", "limit",
    "offset", "as", "and", "or", "not", "in", "is", "null", "like", "between",
    "case", "when", "then", "else", "end", "cast", "extract", "exists",
    "join", "inner", "left", "right", "full", "outer", "cross", "on", "using",
    "natural", "union", "intersect", "except", "all", "distinct", "asc",
    "desc", "nulls", "first", "last", "insert", "into", "values", "update",
    "set", "delete", "create", "drop", "table", "view", "if", "with",
    "prepare", "execute", "copy", "to", "begin", "commit", "rollback",
    "interval", "date", "true", "false", "substr", "substring", "show",
    "tables", "columns", "primary", "key", "year", "month", "day",
    "transaction",
}

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|--[^\n]*|/\*.*?\*/)
  | (?P<num>\d+\.\d*([eE][+-]?\d+)?|\.\d+([eE][+-]?\d+)?|\d+([eE][+-]?\d+)?)
  | (?P<str>'(?:[^']|'')*')
  | (?P<qid>"(?:[^"]|"")*")
  | (?P<id>[A-Za-z_][A-Za-z0-9_$]*)
  | (?P<op><>|!=|<=|>=|\|\||::|[-+*/%(),.;=<>?\[\]])
    """,
    re.VERBOSE | re.DOTALL,
)


class Token:
    __slots__ = ("kind", "value", "pos")

    def __init__(self, kind: str, value, pos: int):
        self.kind = kind  # num | str | id | kw | op | eof
        self.value = value
        self.pos = pos

    def __repr__(self):
        return f"Token({self.kind},{self.value!r})"


class ParserError(ValueError):
    pass


def tokenize(sql: str) -> List[Token]:
    tokens: List[Token] = []
    pos = 0
    n = len(sql)
    while pos < n:
        m = _TOKEN_RE.match(sql, pos)
        if not m:
            raise ParserError(f"cannot tokenize at {sql[pos:pos+20]!r}")
        pos = m.end()
        if m.lastgroup == "ws":
            continue
        text = m.group()
        if m.lastgroup == "num":
            if "." in text or "e" in text or "E" in text:
                tokens.append(Token("num", float(text), m.start()))
            else:
                tokens.append(Token("num", int(text), m.start()))
        elif m.lastgroup == "str":
            tokens.append(Token("str", text[1:-1].replace("''", "'"), m.start()))
        elif m.lastgroup == "qid":
            tokens.append(Token("id", text[1:-1].replace('""', '"'), m.start()))
        elif m.lastgroup == "id":
            low = text.lower()
            if low in KEYWORDS:
                tokens.append(Token("kw", low, m.start()))
            else:
                tokens.append(Token("id", text, m.start()))
        else:
            tokens.append(Token("op", text, m.start()))
    tokens.append(Token("eof", None, n))
    return tokens


class Parser:
    def __init__(self, sql: str):
        self.sql = sql
        self.tokens = tokenize(sql)
        self.i = 0

    # ------------------------------------------------------------ plumbing

    @property
    def cur(self) -> Token:
        return self.tokens[self.i]

    def peek(self, ahead: int = 1) -> Token:
        j = min(self.i + ahead, len(self.tokens) - 1)
        return self.tokens[j]

    def advance(self) -> Token:
        t = self.cur
        self.i += 1
        return t

    def at_kw(self, *kws: str) -> bool:
        return self.cur.kind == "kw" and self.cur.value in kws

    def at_op(self, *ops: str) -> bool:
        return self.cur.kind == "op" and self.cur.value in ops

    def accept_kw(self, *kws: str) -> bool:
        if self.at_kw(*kws):
            self.advance()
            return True
        return False

    def accept_op(self, *ops: str) -> bool:
        if self.at_op(*ops):
            self.advance()
            return True
        return False

    def expect_kw(self, kw: str) -> None:
        if not self.accept_kw(kw):
            raise ParserError(f"expected {kw.upper()}, got {self.cur!r}")

    def expect_op(self, op: str) -> None:
        if not self.accept_op(op):
            raise ParserError(f"expected {op!r}, got {self.cur!r}")

    def expect_identifier(self) -> str:
        if self.cur.kind == "id":
            return self.advance().value
        # tolerate non-reserved keywords as identifiers
        if self.cur.kind == "kw" and self.cur.value in (
            "year", "month", "day", "date", "first", "last", "key", "tables",
            "columns", "show", "values", "left", "right",
        ):
            return self.advance().value
        raise ParserError(f"expected identifier, got {self.cur!r}")

    # ---------------------------------------------------------- statements

    def parse_statements(self) -> List[st.Statement]:
        out = []
        while self.cur.kind != "eof":
            out.append(self.parse_statement())
            while self.accept_op(";"):
                pass
        return out

    def parse_statement(self) -> st.Statement:
        if self.cur.kind == "id" and self.cur.value.lower() == "explain":
            self.advance()
            return st.ExplainStatement(self.parse_statement())
        if self.at_kw("select", "with") or self.at_op("("):
            return self.parse_select()
        if self.at_kw("insert"):
            return self.parse_insert()
        if self.at_kw("update"):
            return self.parse_update()
        if self.at_kw("delete"):
            return self.parse_delete()
        if self.at_kw("create"):
            return self.parse_create()
        if self.at_kw("drop"):
            return self.parse_drop()
        if self.at_kw("prepare"):
            return self.parse_prepare()
        if self.at_kw("execute"):
            return self.parse_execute()
        if self.at_kw("copy"):
            return self.parse_copy()
        if self.at_kw("begin"):
            self.advance()
            self.accept_kw("transaction")
            return st.TransactionStatement("begin")
        if self.at_kw("commit"):
            self.advance()
            return st.TransactionStatement("commit")
        if self.at_kw("rollback"):
            self.advance()
            return st.TransactionStatement("rollback")
        if self.at_kw("show"):
            return self.parse_show()
        raise ParserError(f"cannot parse statement at {self.cur!r}")

    # -------------------------------------------------------------- SELECT

    def parse_select(self) -> st.SelectStatement:
        with_clauses: List[st.WithClause] = []
        if self.accept_kw("with"):
            while True:
                name = self.expect_identifier()
                col_aliases = None
                if self.accept_op("("):
                    col_aliases = [self.expect_identifier()]
                    while self.accept_op(","):
                        col_aliases.append(self.expect_identifier())
                    self.expect_op(")")
                self.expect_kw("as")
                self.expect_op("(")
                sub = self.parse_select()
                self.expect_op(")")
                with_clauses.append(st.WithClause(name, sub, col_aliases))
                if not self.accept_op(","):
                    break
        stmt = self._parse_select_core()
        stmt.with_clauses = with_clauses
        return stmt

    def _parse_select_atom(self) -> st.SelectStatement:
        """One SELECT core or a parenthesized select — never consumes a
        following set operation, so chains associate at the caller."""
        if self.accept_op("("):
            stmt = self.parse_select()
            self.expect_op(")")
        else:
            self.expect_kw("select")
            stmt = st.SelectStatement()
            stmt.distinct = bool(self.accept_kw("distinct"))
            self.accept_kw("all")
            stmt.select_list = self._parse_select_list()
            if self.accept_kw("from"):
                stmt.from_clause = self._parse_from()
            if self.accept_kw("where"):
                stmt.where = self.parse_expression()
            if self.accept_kw("group"):
                self.expect_kw("by")
                self._parse_group_by(stmt)
            if self.accept_kw("having"):
                stmt.having = self.parse_expression()
        return stmt

    def _parse_select_core(self) -> st.SelectStatement:
        stmt = self._parse_select_atom()
        # set operations bind here, LEFT-associative (A EXCEPT B EXCEPT C
        # = (A EXCEPT B) EXCEPT C); trailing ORDER BY/LIMIT bind to the
        # whole chain, not the last operand
        while self.at_kw("union", "intersect", "except"):
            kind = self.advance().value
            all_mode = bool(self.accept_kw("all"))
            self.accept_kw("distinct")
            rhs = self._parse_select_atom()
            left = stmt
            stmt = st.SelectStatement()
            stmt.select_list = []
            stmt.set_op = (kind, all_mode, rhs)
            stmt.from_clause = None
            # represent as wrapper: keep left in a dedicated attribute
            stmt.with_clauses = []
            stmt._set_op_left = left  # type: ignore[attr-defined]
        if self.accept_kw("order"):
            self.expect_kw("by")
            stmt.order_by = [self._parse_order_item()]
            while self.accept_op(","):
                stmt.order_by.append(self._parse_order_item())
        if self.accept_kw("limit"):
            stmt.limit = self.parse_expression()
        if self.accept_kw("offset"):
            stmt.offset = self.parse_expression()
        return stmt

    def _parse_select_list(self):
        items = []
        while True:
            if self.at_op("*"):
                self.advance()
                items.append((st.Star(), None))
            elif (
                self.cur.kind == "id"
                and self.peek().kind == "op"
                and self.peek().value == "."
                and self.peek(2).kind == "op"
                and self.peek(2).value == "*"
            ):
                tname = self.advance().value
                self.advance()
                self.advance()
                items.append((st.Star(tname), None))
            else:
                expr = self.parse_expression()
                alias = None
                if self.accept_kw("as"):
                    alias = self.expect_identifier()
                elif self.cur.kind == "id":
                    alias = self.advance().value
                items.append((expr, alias))
            if not self.accept_op(","):
                break
        return items

    def _parse_order_item(self) -> st.OrderByItem:
        expr = self.parse_expression()
        ascending = True
        if self.accept_kw("asc"):
            ascending = True
        elif self.accept_kw("desc"):
            ascending = False
        nulls_first = None
        if self.accept_kw("nulls"):
            if self.accept_kw("first"):
                nulls_first = True
            else:
                self.expect_kw("last")
                nulls_first = False
        return st.OrderByItem(expr, ascending, nulls_first)

    # ---------------------------------------------------------------- FROM

    def _parse_from(self) -> st.TableRef:
        ref = self._parse_join_chain()
        while self.accept_op(","):
            right = self._parse_join_chain()
            ref = st.JoinRef(ref, right, "cross")
        return ref

    def _parse_join_chain(self) -> st.TableRef:
        left = self._parse_table_primary()
        while True:
            natural = bool(self.accept_kw("natural"))
            if self.accept_kw("join") or self.at_kw(
                "inner", "left", "right", "full", "cross"
            ):
                if self.tokens[self.i - 1].value == "join":
                    jt = "inner"
                else:
                    jt = self.advance().value
                    self.accept_kw("outer")
                    self.expect_kw("join")
                right = self._parse_table_primary()
                cond = None
                using = None
                if jt != "cross" and not natural:
                    if self.accept_kw("on"):
                        cond = self.parse_expression()
                    elif self.accept_kw("using"):
                        self.expect_op("(")
                        using = [self.expect_identifier()]
                        while self.accept_op(","):
                            using.append(self.expect_identifier())
                        self.expect_op(")")
                left = st.JoinRef(left, right, jt, cond, using, natural)
            else:
                if natural:
                    raise ParserError("NATURAL must precede a JOIN")
                return left

    def _parse_table_primary(self) -> st.TableRef:
        if self.accept_op("("):
            if self.at_kw("select", "with"):
                sub = self.parse_select()
                self.expect_op(")")
                alias, col_aliases = self._parse_alias(required=True)
                return st.DerivedTable(sub, alias, col_aliases)
            ref = self._parse_from()
            self.expect_op(")")
            return ref
        name = self.expect_identifier()
        alias, col_aliases = self._parse_alias(required=False)
        return st.NamedTable(name, alias, col_aliases)

    def _parse_alias(self, required: bool):
        alias = None
        if self.accept_kw("as"):
            alias = self.expect_identifier()
        elif self.cur.kind == "id":
            alias = self.advance().value
        if required and alias is None:
            raise ParserError("derived table requires an alias")
        col_aliases = None
        if alias is not None and self.accept_op("("):
            col_aliases = [self.expect_identifier()]
            while self.accept_op(","):
                col_aliases.append(self.expect_identifier())
            self.expect_op(")")
        return alias, col_aliases

    # ----------------------------------------------------------------- DML

    def parse_insert(self) -> st.InsertStatement:
        self.expect_kw("insert")
        self.expect_kw("into")
        name = self.expect_identifier()
        columns = None
        if self.accept_op("("):
            columns = [self.expect_identifier()]
            while self.accept_op(","):
                columns.append(self.expect_identifier())
            self.expect_op(")")
        if self.accept_kw("values"):
            rows = []
            while True:
                self.expect_op("(")
                row = [self.parse_expression()]
                while self.accept_op(","):
                    row.append(self.parse_expression())
                self.expect_op(")")
                rows.append(row)
                if not self.accept_op(","):
                    break
            return st.InsertStatement(name, columns, rows, None)
        sel = self.parse_select()
        return st.InsertStatement(name, columns, None, sel)

    def parse_update(self) -> st.UpdateStatement:
        self.expect_kw("update")
        name = self.expect_identifier()
        self.expect_kw("set")
        assignments = []
        while True:
            col = self.expect_identifier()
            self.expect_op("=")
            assignments.append((col, self.parse_expression()))
            if not self.accept_op(","):
                break
        where = self.parse_expression() if self.accept_kw("where") else None
        return st.UpdateStatement(name, assignments, where)

    def parse_delete(self) -> st.DeleteStatement:
        self.expect_kw("delete")
        self.expect_kw("from")
        name = self.expect_identifier()
        where = self.parse_expression() if self.accept_kw("where") else None
        return st.DeleteStatement(name, where)

    # ----------------------------------------------------------------- DDL

    _TYPE_MAP = {
        "int": DataType.INT, "integer": DataType.INT, "smallint": DataType.INT,
        "bigint": DataType.LONG, "long": DataType.LONG,
        "float": DataType.FLOAT, "real": DataType.FLOAT,
        "double": DataType.DOUBLE, "decimal": DataType.DOUBLE,
        "numeric": DataType.DOUBLE,
        "text": DataType.STRING, "varchar": DataType.STRING,
        "char": DataType.STRING, "string": DataType.STRING,
        "date": DataType.DATE,
    }

    def parse_create(self):
        self.expect_kw("create")
        if self.accept_kw("table"):
            if_not_exists = self._parse_if_not_exists()
            name = self.expect_identifier()
            if self.accept_kw("as"):
                return st.CreateTableStatement(name, if_not_exists, None,
                                               self.parse_select())
            self.expect_op("(")
            cols = []
            while True:
                if self.accept_kw("primary"):
                    self.expect_kw("key")
                    self.expect_op("(")
                    pk_cols = [self.expect_identifier()]
                    while self.accept_op(","):
                        pk_cols.append(self.expect_identifier())
                    self.expect_op(")")
                    for c in cols:
                        if c.name in pk_cols:
                            c.primary_key = True
                            c.nullable = False
                else:
                    cname = self.expect_identifier()
                    tname = (
                        self.advance().value.lower()
                        if self.cur.kind in ("id", "kw")
                        else None
                    )
                    if tname not in self._TYPE_MAP:
                        raise ParserError(f"unknown type {tname!r}")
                    dt = self._TYPE_MAP[tname]
                    if self.accept_op("("):
                        self.advance()  # precision
                        if self.accept_op(","):
                            self.advance()
                        self.expect_op(")")
                    nullable = True
                    pk = False
                    while True:
                        if self.accept_kw("not"):
                            self.expect_kw("null")
                            nullable = False
                        elif self.accept_kw("null"):
                            nullable = True
                        elif self.accept_kw("primary"):
                            self.expect_kw("key")
                            pk = True
                            nullable = False
                        else:
                            break
                    cols.append(st.ColumnSpec(cname, dt, nullable, pk))
                if not self.accept_op(","):
                    break
            self.expect_op(")")
            return st.CreateTableStatement(name, if_not_exists, cols, None)
        if self.accept_kw("view"):
            if_not_exists = self._parse_if_not_exists()
            name = self.expect_identifier()
            col_aliases = None
            if self.accept_op("("):
                col_aliases = [self.expect_identifier()]
                while self.accept_op(","):
                    col_aliases.append(self.expect_identifier())
                self.expect_op(")")
            self.expect_kw("as")
            return st.CreateViewStatement(name, if_not_exists, col_aliases,
                                          self.parse_select())
        raise ParserError(f"CREATE {self.cur!r} unsupported")

    def _parse_if_not_exists(self) -> bool:
        if self.accept_kw("if"):
            self.expect_kw("not")
            if self.cur.kind == "kw" and self.cur.value == "exists":
                self.advance()
            else:
                raise ParserError("expected EXISTS")
            return True
        return False

    def parse_drop(self):
        self.expect_kw("drop")
        is_view = False
        if self.accept_kw("view"):
            is_view = True
        else:
            self.expect_kw("table")
        if_exists = False
        if self.accept_kw("if"):
            if self.cur.kind == "kw" and self.cur.value == "exists":
                self.advance()
                if_exists = True
            else:
                raise ParserError("expected EXISTS")
        name = self.expect_identifier()
        if is_view:
            return st.DropViewStatement(name, if_exists)
        return st.DropTableStatement(name, if_exists)

    def parse_prepare(self) -> st.PrepareStatement:
        self.expect_kw("prepare")
        name = self.expect_identifier()
        self.expect_kw("as")
        # the prepared body may be quoted (reference console style) or bare
        if self.cur.kind == "str":
            body = self.advance().value
            inner = Parser(body).parse_statement()
        else:
            inner = self.parse_statement()
        return st.PrepareStatement(name, inner)

    def parse_execute(self) -> st.ExecuteStatement:
        self.expect_kw("execute")
        name = self.expect_identifier()
        params: List[ast.Expression] = []
        if self.accept_op("("):
            if not self.at_op(")"):
                params.append(self.parse_expression())
                while self.accept_op(","):
                    params.append(self.parse_expression())
            self.expect_op(")")
        return st.ExecuteStatement(name, params)

    def parse_copy(self) -> st.CopyStatement:
        self.expect_kw("copy")
        name = self.expect_identifier()
        if self.accept_kw("from"):
            direction = "from"
        else:
            self.expect_kw("to")
            direction = "to"
        path = self.advance().value
        fmt = None
        if self.accept_kw("with"):
            self.expect_op("(")
            while not self.at_op(")"):
                word = self.advance()
                if word.kind == "id" and word.value.lower() == "format":
                    fmt = self.advance().value.lower()
                self.accept_op(",")
            self.expect_op(")")
        return st.CopyStatement(name, path, direction, fmt)

    def parse_show(self) -> st.ShowStatement:
        self.expect_kw("show")
        if self.accept_kw("tables"):
            return st.ShowStatement("tables")
        self.expect_kw("columns")
        name = self.expect_identifier()
        return st.ShowStatement("columns", name)

    # ---------------------------------------------------------- expressions

    def parse_expression(self) -> ast.Expression:
        return self._parse_or()

    def _parse_or(self) -> ast.Expression:
        left = self._parse_and()
        while self.accept_kw("or"):
            left = ast.Logical("or", left, self._parse_and())
        return left

    def _parse_and(self) -> ast.Expression:
        left = self._parse_not()
        while self.accept_kw("and"):
            left = ast.Logical("and", left, self._parse_not())
        return left

    def _parse_not(self) -> ast.Expression:
        if self.accept_kw("not"):
            return ast.Not(self._parse_not())
        return self._parse_comparison()

    def _parse_comparison(self) -> ast.Expression:
        left = self._parse_additive()
        negated = False
        if self.at_kw("not"):
            nxt = self.peek()
            if nxt.kind == "kw" and nxt.value in ("in", "like", "between"):
                self.advance()
                negated = True
        if self.accept_kw("is"):
            neg = bool(self.accept_kw("not"))
            self.expect_kw("null")
            cond = (
                PredicateCondition.IS_NOT_NULL if neg else PredicateCondition.IS_NULL
            )
            return ast.Predicate(cond, [left])
        if self.accept_kw("between"):
            lo = self._parse_additive()
            self.expect_kw("and")
            hi = self._parse_additive()
            p = ast.Predicate(PredicateCondition.BETWEEN_INCLUSIVE, [left, lo, hi])
            return ast.Not(p) if negated else p
        if self.accept_kw("like"):
            pat = self._parse_additive()
            cond = (
                PredicateCondition.NOT_LIKE if negated else PredicateCondition.LIKE
            )
            return ast.Predicate(cond, [left, pat])
        if self.accept_kw("in"):
            self.expect_op("(")
            if self.at_kw("select", "with"):
                sub = self.parse_select()
                self.expect_op(")")
                return ast.InSubquery(left, st.SelectSubquery(sub), negated)
            values = [self.parse_expression()]
            while self.accept_op(","):
                values.append(self.parse_expression())
            self.expect_op(")")
            return ast.InList(left, values, negated)
        for op_text, cond in (
            ("=", PredicateCondition.EQUALS),
            ("<>", PredicateCondition.NOT_EQUALS),
            ("!=", PredicateCondition.NOT_EQUALS),
            ("<=", PredicateCondition.LESS_THAN_EQUALS),
            (">=", PredicateCondition.GREATER_THAN_EQUALS),
            ("<", PredicateCondition.LESS_THAN),
            (">", PredicateCondition.GREATER_THAN),
        ):
            if self.accept_op(op_text):
                right = self._parse_additive()
                return ast.Predicate(cond, [left, right])
        return left

    def _parse_additive(self) -> ast.Expression:
        left = self._parse_multiplicative()
        while True:
            if self.accept_op("+"):
                left = ast.Arithmetic("+", left, self._parse_multiplicative())
            elif self.accept_op("-"):
                left = ast.Arithmetic("-", left, self._parse_multiplicative())
            elif self.accept_op("||"):
                right = self._parse_multiplicative()
                left = ast.Function("concat", [left, right])
            else:
                return left

    def _parse_multiplicative(self) -> ast.Expression:
        left = self._parse_unary()
        while True:
            if self.accept_op("*"):
                left = ast.Arithmetic("*", left, self._parse_unary())
            elif self.accept_op("/"):
                left = ast.Arithmetic("/", left, self._parse_unary())
            elif self.accept_op("%"):
                left = ast.Arithmetic("%", left, self._parse_unary())
            else:
                return left

    def _parse_unary(self) -> ast.Expression:
        if self.accept_op("-"):
            operand = self._parse_unary()
            if isinstance(operand, ast.Literal) and isinstance(
                operand.value, (int, float)
            ):
                return ast.Literal(-operand.value)
            return ast.UnaryMinus(operand)
        if self.accept_op("+"):
            return self._parse_unary()
        return self._parse_primary()

    def _parse_primary(self) -> ast.Expression:
        t = self.cur
        if t.kind == "num":
            self.advance()
            return ast.Literal(t.value)
        if t.kind == "str":
            self.advance()
            return ast.Literal(t.value)
        if self.at_op("?"):
            self.advance()
            # positional prepared-statement placeholder
            pid = getattr(self, "_placeholder_count", 0)
            self._placeholder_count = pid + 1
            return ast.Parameter(pid)
        if self.at_op("("):
            self.advance()
            if self.at_kw("select", "with"):
                sub = self.parse_select()
                self.expect_op(")")
                return st.SelectSubquery(sub)
            e = self.parse_expression()
            self.expect_op(")")
            return e
        if t.kind == "kw":
            return self._parse_keyword_primary()
        if t.kind == "id":
            return self._parse_identifier_primary()
        raise ParserError(f"unexpected token {t!r}")

    def _parse_keyword_primary(self) -> ast.Expression:
        if self.accept_kw("null"):
            return ast.Literal(None)
        if self.accept_kw("true"):
            return ast.Literal(1)
        if self.accept_kw("false"):
            return ast.Literal(0)
        if self.accept_kw("date"):
            tok = self.advance()
            if tok.kind != "str":
                raise ParserError("DATE literal needs a quoted string")
            return ast.Literal(tok.value, DataType.DATE)
        if self.accept_kw("interval"):
            tok = self.advance()
            if tok.kind == "str":
                parts = tok.value.split()
                if len(parts) == 2:
                    count, unit = int(parts[0]), parts[1]
                else:
                    count = int(tok.value)
                    unit = self.advance().value
            elif tok.kind == "num":
                count = int(tok.value)
                unit = self.advance().value
            else:
                raise ParserError("bad INTERVAL literal")
            return ast.IntervalLiteral(count, unit)
        if self.accept_kw("case"):
            whens = []
            simple = None
            if not self.at_kw("when"):
                simple = self.parse_expression()
            while self.accept_kw("when"):
                c = self.parse_expression()
                if simple is not None:
                    c = ast.eq(simple, c)
                self.expect_kw("then")
                whens.append((c, self.parse_expression()))
            else_ = None
            if self.accept_kw("else"):
                else_ = self.parse_expression()
            self.expect_kw("end")
            return ast.Case(whens, else_)
        if self.accept_kw("cast"):
            self.expect_op("(")
            e = self.parse_expression()
            self.expect_kw("as")
            tname = self.advance().value.lower()
            if tname not in self._TYPE_MAP:
                raise ParserError(f"unknown cast type {tname!r}")
            if self.accept_op("("):
                self.advance()
                if self.accept_op(","):
                    self.advance()
                self.expect_op(")")
            self.expect_op(")")
            return ast.Cast(e, self._TYPE_MAP[tname])
        if self.accept_kw("extract"):
            self.expect_op("(")
            field = self.advance().value
            self.expect_kw("from")
            e = self.parse_expression()
            self.expect_op(")")
            return ast.Extract(str(field), e)
        if self.accept_kw("exists"):
            self.expect_op("(")
            sub = self.parse_select()
            self.expect_op(")")
            return ast.Exists(st.SelectSubquery(sub), negated=False)
        if self.at_kw("substr", "substring"):
            fname = self.advance().value
            self.expect_op("(")
            args = [self.parse_expression()]
            if self.accept_kw("from"):
                args.append(self.parse_expression())
                if self.accept_kw("for"):
                    args.append(self.parse_expression())
            else:
                while self.accept_op(","):
                    args.append(self.parse_expression())
            self.expect_op(")")
            return ast.Function("substr", args)
        if self.at_kw("left", "right") and self.peek().kind == "op" and \
                self.peek().value == "(":
            fname = self.advance().value
            self.expect_op("(")
            args = [self.parse_expression()]
            while self.accept_op(","):
                args.append(self.parse_expression())
            self.expect_op(")")
            return ast.Function(fname, args)
        raise ParserError(f"unexpected keyword {self.cur!r}")

    _AGG_NAMES = {
        "min", "max", "sum", "avg", "count", "stddev_samp", "stddev", "any",
    }
    _RANKING_NAMES = {
        "rank", "dense_rank", "row_number", "cume_dist", "percent_rank",
    }
    _NAV_NAMES = {"lag", "lead", "first_value", "last_value", "ntile"}

    def _parse_identifier_primary(self) -> ast.Expression:
        name = self.advance().value
        if self.at_op("("):
            self.advance()
            low = name.lower()
            if low in self._AGG_NAMES:
                return self._parse_aggregate_call(low)
            if low in self._RANKING_NAMES:
                from hyrise_tpu.types import AggregateFunction as AF

                self.expect_op(")")
                fn = {
                    "rank": AF.RANK, "dense_rank": AF.DENSE_RANK,
                    "row_number": AF.ROW_NUMBER, "cume_dist": AF.CUME_DIST,
                    "percent_rank": AF.PERCENT_RANK,
                }[low]
                win = self._maybe_window(None, fn, None, [], [])
                if win is None or not isinstance(win, ast.WindowExpression):
                    raise ParserError(f"{low}() requires an OVER clause")
                return win
            if low in self._NAV_NAMES:
                return self._parse_nav_window(low)
            args = []
            if not self.at_op(")"):
                args.append(self.parse_expression())
                while self.accept_op(","):
                    args.append(self.parse_expression())
            self.expect_op(")")
            return ast.Function(low, args)
        parts = [name]
        while self.at_op(".") and self.peek().kind in ("id", "kw"):
            self.advance()
            parts.append(self.expect_identifier())
        return st.UnresolvedColumn(tuple(parts))

    def _parse_aggregate_call(self, low: str) -> ast.Expression:
        from hyrise_tpu.types import AggregateFunction as AF

        distinct = bool(self.accept_kw("distinct"))
        if self.at_op("*"):
            self.advance()
            self.expect_op(")")
            agg = ast.AggregateExpression(AF.COUNT, None)
            return self._maybe_window(agg, AF.COUNT, None, [], [])
        arg = self.parse_expression()
        self.expect_op(")")
        fn = {
            "min": AF.MIN, "max": AF.MAX, "sum": AF.SUM, "avg": AF.AVG,
            "count": AF.COUNT_DISTINCT if distinct else AF.COUNT,
            "stddev_samp": AF.STDDEV_SAMP, "stddev": AF.STDDEV_SAMP,
            "any": AF.ANY,
        }[low]
        agg = ast.AggregateExpression(fn, arg, distinct)
        return self._maybe_window(agg, fn, arg, [], [])

    def _parse_group_by(self, stmt) -> None:
        """GROUP BY list | ROLLUP(...) | CUBE(...) | GROUPING SETS((..),..).
        Extended forms record `grouping_sets` (index lists into group_by);
        the translator desugars them into a UNION ALL of aggregates."""
        import itertools

        low = self.cur.value.lower() if self.cur.kind == "id" else ""
        if low in ("rollup", "cube") and self.peek().kind == "op" \
                and self.peek().value == "(":
            self.advance()
            self.expect_op("(")
            exprs = [self.parse_expression()]
            while self.accept_op(","):
                exprs.append(self.parse_expression())
            self.expect_op(")")
            stmt.group_by = exprs
            n = len(exprs)
            if low == "rollup":
                stmt.grouping_sets = [list(range(k))
                                      for k in range(n, -1, -1)]
            else:  # cube: all subsets, largest first
                sets = []
                for k in range(n, -1, -1):
                    sets.extend(sorted(c) for c in
                                itertools.combinations(range(n), k))
                stmt.grouping_sets = [list(s) for s in sets]
            return
        if low == "grouping" and self.peek().kind == "id" \
                and self.peek().value.lower() == "sets":
            self.advance()
            self.advance()
            self.expect_op("(")
            raw_sets = []
            while True:
                if self.at_op("("):
                    self.advance()
                    one = []
                    if not self.at_op(")"):
                        one.append(self.parse_expression())
                        while self.accept_op(","):
                            one.append(self.parse_expression())
                    self.expect_op(")")
                else:
                    one = [self.parse_expression()]
                raw_sets.append(one)
                if not self.accept_op(","):
                    break
            self.expect_op(")")
            # flatten to a deduped group_by + index lists
            group_by = []
            keys = []

            def key_of(e):
                if isinstance(e, st.UnresolvedColumn):
                    return ("col", e.parts)
                return ("desc", repr(e.__dict__.get("parts", id(e))))

            stmt.grouping_sets = []
            for one in raw_sets:
                idxs = []
                for e in one:
                    k = key_of(e)
                    if k in keys:
                        idxs.append(keys.index(k))
                    else:
                        keys.append(k)
                        group_by.append(e)
                        idxs.append(len(group_by) - 1)
                stmt.grouping_sets.append(idxs)
            stmt.group_by = group_by
            return
        stmt.group_by = [self.parse_expression()]
        while self.accept_op(","):
            stmt.group_by.append(self.parse_expression())

    def _parse_nav_window(self, low: str) -> ast.Expression:
        """LAG(x[,offset[,default]]) / LEAD(...) / FIRST_VALUE(x) /
        LAST_VALUE(x) / NTILE(n), each requiring an OVER clause.  Offset,
        default and n must be literal constants (they parameterize the
        compiled kernel, they are not per-row expressions)."""
        from hyrise_tpu.types import AggregateFunction as AF

        fn = {
            "lag": AF.LAG, "lead": AF.LEAD, "first_value": AF.FIRST_VALUE,
            "last_value": AF.LAST_VALUE, "ntile": AF.NTILE,
        }[low]
        args = [self.parse_expression()]
        while self.accept_op(","):
            args.append(self.parse_expression())
        self.expect_op(")")
        extra: tuple = ()
        if low == "ntile":
            if len(args) != 1 or not isinstance(args[0], ast.Literal) \
                    or not isinstance(args[0].value, int):
                raise ParserError("ntile(n) requires an integer literal")
            extra = (args[0].value,)
            arg = None
        elif low in ("lag", "lead"):
            arg = args[0]
            offset, default = 1, None
            if len(args) >= 2:
                if not isinstance(args[1], ast.Literal) \
                        or not isinstance(args[1].value, int):
                    raise ParserError(f"{low} offset must be an int literal")
                offset = args[1].value
            if len(args) >= 3:
                if not isinstance(args[2], ast.Literal):
                    raise ParserError(f"{low} default must be a literal")
                default = args[2].value
            if len(args) > 3:
                raise ParserError(f"{low} takes at most 3 arguments")
            extra = (offset, default)
        else:  # first_value / last_value
            if len(args) != 1:
                raise ParserError(f"{low} takes exactly 1 argument")
            arg = args[0]
        win = self._maybe_window(None, fn, arg, [], [], extra=extra)
        if not isinstance(win, ast.WindowExpression):
            raise ParserError(f"{low}() requires an OVER clause")
        return win

    def _maybe_window(self, agg, fn, arg, partition, order, extra=()):
        if not (self.cur.kind == "id" and self.cur.value.lower() == "over"):
            return agg
        self.advance()
        self.expect_op("(")
        partition_by = []
        order_by = []
        if self.cur.kind == "id" and self.cur.value.lower() == "partition":
            self.advance()
            self.expect_kw("by")
            partition_by.append(self.parse_expression())
            while self.accept_op(","):
                partition_by.append(self.parse_expression())
        if self.accept_kw("order"):
            self.expect_kw("by")
            item = self._parse_order_item()
            order_by.append((item.expr, item.sort_mode))
            while self.accept_op(","):
                item = self._parse_order_item()
                order_by.append((item.expr, item.sort_mode))
        frame = self._maybe_frame()
        self.expect_op(")")
        return ast.WindowExpression(fn, arg, partition_by, order_by, extra,
                                    frame=frame)

    def _maybe_frame(self):
        """[ROWS|RANGE [BETWEEN] UNBOUNDED PRECEDING
        [AND (CURRENT ROW | UNBOUNDED FOLLOWING)]] — the frames with an
        unbounded start (all TPC-DS uses); anything else is rejected."""
        if not (self.cur.kind == "id"
                and self.cur.value.lower() in ("rows", "range")):
            return None
        mode = self.cur.value.lower()
        self.advance()
        has_between = (self.cur.kind == "kw"
                       and self.cur.value.lower() == "between")
        if has_between:
            self.advance()

        def expect_word(*words):
            if not (self.cur.kind in ("id", "kw")
                    and self.cur.value.lower() in words):
                raise ParserError(
                    f"unsupported window frame near {self.cur!r}")
            w = self.cur.value.lower()
            self.advance()
            return w

        expect_word("unbounded")
        expect_word("preceding")
        end = "current"
        if has_between:
            expect_word("and")
            w = expect_word("current", "unbounded")
            if w == "current":
                expect_word("row")
            else:
                expect_word("following")
                end = "following"
        return (mode, end)


def parse_sql(sql: str) -> List[st.Statement]:
    return Parser(sql).parse_statements()
