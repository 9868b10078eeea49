"""TypeScript frontend: parses the parity-generator subset of TS into
the common AST.

Covers `sdks/typescript/scripts/generate-fixtures.ts`: imports/type
declarations (stripped), const/let with type annotations, arrow
functions (expression and block bodies), for-of with array
destructuring, template literals with embedded expressions, bigint
literals, `as` casts (stripped), object/array literals, and method
chains.  Everything else raises.
"""

from __future__ import annotations

import re

from .core import (
    TokenStream, parse_number, tokenize, unquote,
)

_KEYWORD_LITS = {"true": True, "false": False, "null": None, "undefined": None}


def _preprocess(src: str) -> str:
    # drop the filesystem-writing tail (shimmed by the sink)
    marker = "// -- write the corpus"
    if marker in src:
        src = src[: src.index(marker)]
    # imports span lines; strip balanced `import ... from "...";`
    src = re.sub(r"^import[\s\S]*?from\s+\"[^\"]*\";$", "", src,
                 flags=re.MULTILINE)
    src = re.sub(r"^import .*;$", "", src, flags=re.MULTILINE)
    return src


class TsParser:
    def __init__(self, src: str, strip: bool = True):
        self.ts = TokenStream(tokenize(_preprocess(src) if strip else src))

    # -- statements -----------------------------------------------------

    def parse_program(self) -> list:
        stmts = []
        while self.ts.peek().kind != "eof":
            stmt = self.parse_stmt()
            if stmt is not None:
                stmts.append(stmt)
        return stmts

    def _skip_type(self, stop: tuple[str, ...]) -> None:
        depth = 0
        while True:
            tok = self.ts.peek()
            if depth == 0 and tok.text in stop:
                return
            if tok.text in ("<", "(", "[", "{"):
                depth += 1
            elif tok.text in (">", ")", "]", "}"):
                if depth == 0:
                    return
                depth -= 1
            elif tok.kind == "eof":
                raise self.ts.error("unterminated type")
            self.ts.next()

    def parse_stmt(self):
        if self.ts.at("type"):
            # `type X = ...;` — skip to terminating semicolon at depth 0
            self.ts.next()
            self._skip_type((";",))
            self.ts.expect(";")
            return None
        if self.ts.at("const") or self.ts.at("let"):
            self.ts.next()
            name = self.ts.next().text
            if self.ts.eat(":"):
                self._skip_type(("=", ";"))
            self.ts.expect("=")
            expr = self.parse_expr()
            self.ts.eat(";")
            return ("let", name, expr)
        if self.ts.at("for"):
            self.ts.next()
            self.ts.expect("(")
            self.ts.expect("const")
            names = []
            if self.ts.eat("["):
                while not self.ts.at("]"):
                    names.append(self.ts.next().text)
                    if not self.ts.eat(","):
                        break
                self.ts.expect("]")
            else:
                names.append(self.ts.next().text)
            self.ts.expect("of")
            iter_expr = self.parse_expr()
            self.ts.expect(")")
            body = self.parse_block_stmts()
            return ("for", names, iter_expr, body)
        if self.ts.at("{"):
            # bare scoping block: inline its statements via a for-like
            # single-iteration? simplest: return a block-exec statement
            body = self.parse_block_stmts()
            return ("for", ["__scope__"], ("arr", [("lit", 0)]), body)
        if (
            self.ts.peek().kind == "ident"
            and self.ts.peek(1).text in ("+=", "-=", "=")
        ):
            name = self.ts.next().text
            op = self.ts.next().text
            expr = self.parse_expr()
            self.ts.eat(";")
            if op == "=":
                return ("assign", name, expr)
            return ("aug", name, op[0], expr)
        if self.ts.at("return"):
            self.ts.next()
            if self.ts.at(";") or self.ts.at("}"):
                self.ts.eat(";")
                return ("return", None)
            expr = self.parse_expr()
            self.ts.eat(";")
            return ("return", expr)
        expr = self.parse_expr()
        self.ts.eat(";")
        return ("expr", expr)

    def parse_block_stmts(self) -> list:
        self.ts.expect("{")
        stmts = []
        while not self.ts.at("}"):
            stmt = self.parse_stmt()
            if stmt is not None:
                stmts.append(stmt)
        self.ts.expect("}")
        return stmts

    # -- expressions ----------------------------------------------------

    _BIN_LEVELS = [
        ("||", "??"), ("&&",), ("==", "!=", "===", "!=="),
        ("<", ">", "<=", ">="), ("<<", ">>"), ("+", "-"), ("*", "/", "%"),
    ]

    def parse_expr(self, level: int = 0):
        if level == len(self._BIN_LEVELS):
            return self.parse_unary()
        lhs = self.parse_expr(level + 1)
        while self.ts.peek().text in self._BIN_LEVELS[level]:
            op = self.ts.next().text
            rhs = self.parse_expr(level + 1)
            op = {"===": "==", "!==": "!=", "??": "||"}.get(op, op)
            lhs = ("binop", op, lhs, rhs)
        return lhs

    def parse_unary(self):
        if self.ts.at("-"):
            self.ts.next()
            return ("unary", "-", self.parse_unary())
        if self.ts.at("!"):
            self.ts.next()
            return ("unary", "!", self.parse_unary())
        return self.parse_postfix(self.parse_primary())

    def parse_postfix(self, expr):
        while True:
            if self.ts.at("."):
                self.ts.next()
                name = self.ts.next().text
                if self.ts.eat("("):
                    args = self.parse_args(")")
                    expr = ("method", expr, name, args)
                else:
                    expr = ("attr", expr, name)
            elif self.ts.at("("):
                self.ts.next()
                args = self.parse_args(")")
                expr = ("call", expr, args)
            elif self.ts.at("as"):
                self.ts.next()
                self._skip_type((",", ")", ";", "]", "}"))
            else:
                return expr

    def parse_args(self, closer: str) -> list:
        args = []
        while not self.ts.at(closer):
            args.append(self.parse_expr())
            if not self.ts.eat(","):
                break
        self.ts.expect(closer)
        return args

    def _try_arrow(self):
        """Detect `(params) =>` or `ident =>` lookahead; returns lambda
        AST or None."""
        save = self.ts.i
        params: list[str] = []
        if self.ts.at("("):
            self.ts.next()
            ok = True
            while not self.ts.at(")"):
                tok = self.ts.next()
                if tok.kind != "ident":
                    ok = False
                    break
                params.append(tok.text)
                if self.ts.eat(":"):
                    self._skip_type((",", ")"))
                if not self.ts.eat(","):
                    break
            if ok and self.ts.eat(")") and self.ts.eat("=>"):
                pass
            else:
                self.ts.i = save
                return None
        elif self.ts.peek().kind == "ident" and self.ts.peek(1).text == "=>":
            params.append(self.ts.next().text)
            self.ts.next()
        else:
            return None
        if self.ts.at("{"):
            body = self.parse_block_stmts()
            return ("lambda", params, body)
        return ("lambda", params, self.parse_expr())

    def parse_primary(self):
        arrow = self._try_arrow()
        if arrow is not None:
            return arrow
        tok = self.ts.peek()
        if tok.kind == "string":
            self.ts.next()
            if tok.text.startswith("`"):
                return self.parse_template(tok.text[1:-1])
            return ("lit", unquote(tok.text))
        if tok.kind == "number":
            self.ts.next()
            # bigint suffix: `11n`
            if self.ts.peek().kind == "ident" and self.ts.peek().text == "n":
                self.ts.next()
                return ("lit", int(tok.text.replace("_", ""), 0))
            return ("lit", parse_number(tok.text))
        if tok.text == "(":
            self.ts.next()
            inner = self.parse_expr()
            self.ts.expect(")")
            return inner
        if tok.text == "[":
            self.ts.next()
            return ("arr", self.parse_args("]"))
        if tok.text == "{":
            self.ts.next()
            pairs = []
            while not self.ts.at("}"):
                key = self.ts.next()
                if key.kind == "string":
                    key_val = unquote(key.text)
                elif key.kind in ("ident", "number"):
                    key_val = key.text
                else:
                    raise self.ts.error("bad object key")
                self.ts.expect(":")
                pairs.append((("lit", key_val), self.parse_expr()))
                if not self.ts.eat(","):
                    break
            self.ts.expect("}")
            return ("obj", pairs)
        if tok.kind == "ident":
            name = self.ts.next().text
            if name in _KEYWORD_LITS:
                return ("lit", _KEYWORD_LITS[name])
            if name == "new":  # `new Ctor(args)` — plain call in Python
                return self.parse_primary()
            return ("var", name)
        raise self.ts.error("unexpected token in expression")

    def parse_template(self, body: str):
        parts: list = []
        buf = ""
        i = 0
        while i < len(body):
            if body[i] == "$" and i + 1 < len(body) and body[i + 1] == "{":
                depth = 1
                j = i + 2
                while j < len(body) and depth:
                    if body[j] == "{":
                        depth += 1
                    elif body[j] == "}":
                        depth -= 1
                    j += 1
                snippet = body[i + 2 : j - 1]
                sub = TsParser(snippet, strip=False)
                expr = sub.parse_expr()
                if buf:
                    parts.append(buf)
                    buf = ""
                parts.append(("expr", expr, ""))
                i = j
            else:
                ch = body[i]
                if ch == "\\" and i + 1 < len(body):
                    ch = {"n": "\n", "t": "\t"}.get(body[i + 1], body[i + 1])
                    i += 1
                buf += ch
                i += 1
        if buf:
            parts.append(buf)
        return ("fstring", parts)


def extract(src: str, sink) -> None:
    from .core import Env, Interp
    from .shims import TsShim

    stmts = TsParser(src).parse_program()
    shim = TsShim(sink)
    interp = Interp(shim)
    root = Env()
    interp.run_block(stmts, root)
    for var, bucket in (
        ("runtime", "runtime"), ("combo", "combo"), ("jsonOnly", "json-only"),
    ):
        for name, request in root.get(var):
            sink.write(bucket, name, request)
