"""Rust frontend: parses the parity-generator subset of Rust into the
common AST (core.py).

Covers what `sdks/rust/examples/generate_parity_fixtures.rs` uses:
fn items (incl. generics + typed params, which are stripped), let /
let mut, `+=`/`=`, for-over-array, match expressions, if/else block
expressions with tail values, method chains, `json!` / `vec!` /
`format!` macros, `Some`/`None`, references (`&`), numeric suffixes,
shifts, tuples and string literals.  Everything else raises.
"""

from __future__ import annotations

import re

from .core import (
    TokenStream, parse_number, tokenize, unquote,
)

_NUM_SUFFIXES = {"u64", "i64", "u32", "i32", "f32", "f64", "usize"}
_KEYWORD_LITS = {"true": True, "false": False, "null": None, "None": None}


def _strip_items(src: str, names: tuple[str, ...]) -> str:
    """Remove `fn <name>...{...}` items (main, fs-touching helpers)."""
    out = src
    for name in names:
        m = re.search(rf"\bfn {name}\b", out)
        if m is None:
            continue
        i = out.index("{", m.start())
        depth = 0
        j = i
        while j < len(out):
            if out[j] == "{":
                depth += 1
            elif out[j] == "}":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        out = out[: m.start()] + out[j + 1 :]
    return out


class RustParser:
    def __init__(self, src: str):
        src = _strip_items(src, ("main", "write_fixture"))
        src = re.sub(r"^\s*use .*;$", "", src, flags=re.MULTILINE)
        src = re.sub(r"^\s*#!?\[.*\]$", "", src, flags=re.MULTILINE)
        self.ts = TokenStream(tokenize(src))

    # -- items ----------------------------------------------------------

    def parse_items(self) -> list:
        items = []
        while self.ts.peek().kind != "eof":
            if self.ts.at("fn") or (
                self.ts.at("pub") and self.ts.peek(1).text == "fn"
            ):
                items.append(self.parse_fn())
            else:
                raise self.ts.error("expected fn item")
        return items

    def _skip_generics(self) -> None:
        if not self.ts.eat("<"):
            return
        depth = 1
        while depth:
            text = self.ts.next().text
            if text == "<":
                depth += 1
            elif text == ">":
                depth -= 1
            elif text == "":
                raise self.ts.error("unterminated generics")

    def _skip_type(self, stop: tuple[str, ...]) -> None:
        depth = 0
        while True:
            tok = self.ts.peek()
            if depth == 0 and tok.text in stop:
                return
            if tok.text in ("<", "("):
                depth += 1
            elif tok.text in (">", ")"):
                if depth == 0:
                    return
                depth -= 1
            elif tok.kind == "eof":
                raise self.ts.error("unterminated type")
            self.ts.next()

    def parse_fn(self):
        self.ts.eat("pub")
        self.ts.expect("fn")
        name = self.ts.next().text
        self._skip_generics()
        self.ts.expect("(")
        params = []
        while not self.ts.at(")"):
            params.append(self.ts.next().text)
            if self.ts.eat(":"):
                self._skip_type((",", ")"))
            if not self.ts.eat(","):
                break
        self.ts.expect(")")
        if self.ts.eat("->"):
            self._skip_type(("{",))
        body = self.parse_block_stmts()
        return ("fn", name, params, body)

    # -- statements -----------------------------------------------------

    def parse_block_stmts(self) -> list:
        self.ts.expect("{")
        stmts = []
        while not self.ts.at("}"):
            stmts.append(self.parse_stmt())
        self.ts.expect("}")
        return stmts

    def parse_stmt(self):
        if self.ts.at("let"):
            self.ts.next()
            self.ts.eat("mut")
            name = self.ts.next().text
            if self.ts.eat(":"):
                self._skip_type(("=",))
            self.ts.expect("=")
            expr = self.parse_expr()
            self.ts.expect(";")
            return ("let", name, expr)
        if self.ts.at("for"):
            self.ts.next()
            names = [self.ts.next().text]
            self.ts.expect("in")
            iter_expr = self.parse_expr_no_struct()
            body = self.parse_block_stmts()
            return ("for", names, iter_expr, body)
        if self.ts.at("fn"):
            return self.parse_fn()
        if (
            self.ts.peek().kind == "ident"
            and self.ts.peek(1).text in ("+=", "-=", "=")
        ):
            name = self.ts.next().text
            op = self.ts.next().text
            expr = self.parse_expr()
            self.ts.expect(";")
            if op == "=":
                return ("assign", name, expr)
            return ("aug", name, op[0], expr)
        expr = self.parse_expr()
        self.ts.eat(";")
        return ("expr", expr)

    # -- expressions ----------------------------------------------------

    _BIN_LEVELS = [
        ("||",), ("&&",), ("==", "!=", "<", ">", "<=", ">="),
        ("<<", ">>"), ("+", "-"), ("*", "/", "%"),
    ]

    def parse_expr(self, level: int = 0, no_struct: bool = False):
        if level == len(self._BIN_LEVELS):
            return self.parse_unary(no_struct)
        lhs = self.parse_expr(level + 1, no_struct)
        while self.ts.peek().text in self._BIN_LEVELS[level]:
            # `<` / `>` ambiguity with generics does not arise in
            # expression position in this corpus
            op = self.ts.next().text
            rhs = self.parse_expr(level + 1, no_struct)
            lhs = ("binop", op, lhs, rhs)
        return lhs

    def parse_expr_no_struct(self):
        return self.parse_expr(no_struct=True)

    def parse_unary(self, no_struct: bool):
        if self.ts.eat("&"):
            return self.parse_unary(no_struct)
        if self.ts.at("-"):
            self.ts.next()
            return ("unary", "-", self.parse_unary(no_struct))
        return self.parse_postfix(self.parse_primary(no_struct))

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

    def parse_primary(self, no_struct: bool = False):
        tok = self.ts.peek()
        if tok.kind == "string":
            self.ts.next()
            return ("lit", unquote(tok.text))
        if tok.kind == "number":
            self.ts.next()
            if self.ts.peek().kind == "ident" and (
                self.ts.peek().text in _NUM_SUFFIXES
            ):
                self.ts.next()
            return ("lit", parse_number(tok.text))
        if tok.text == "(":
            self.ts.next()
            items = self.parse_args(")")
            if len(items) == 1:
                return items[0]
            return ("tuple", items)
        if tok.text == "[":
            self.ts.next()
            return ("arr", self.parse_args("]"))
        if tok.text in ("match",):
            return self.parse_match()
        if tok.text == "if":
            return self.parse_if_expr()
        if tok.text == "{":
            stmts = self.parse_block_stmts()
            tail = None
            if stmts and stmts[-1][0] == "expr":
                tail = stmts.pop()[1]
            return ("block", stmts, tail)
        if tok.kind == "ident":
            name = tok.text
            self.ts.next()
            if name in _KEYWORD_LITS:
                return ("lit", _KEYWORD_LITS[name])
            if name == "Some":
                self.ts.expect("(")
                inner = self.parse_args(")")
                if len(inner) != 1:
                    raise self.ts.error("Some() takes one value")
                return inner[0]
            if name in ("json!",):
                self.ts.expect("(")
                value = self.parse_json()
                self.ts.expect(")")
                return value
            if name == "vec!":
                self.ts.expect("[")
                return ("arr", self.parse_args("]"))
            if name == "format!":
                self.ts.expect("(")
                lit = self.ts.next()
                if lit.kind != "string":
                    raise self.ts.error("format! expects a literal")
                self.ts.expect(")")
                return self.parse_format(unquote(lit.text))
            if name.endswith("!"):
                raise self.ts.error(f"unsupported macro {name}")
            segs = [name]
            while self.ts.at("::"):
                self.ts.next()
                segs.append(self.ts.next().text)
            if len(segs) > 1:
                return ("path", segs)
            return ("var", name)
        raise self.ts.error("unexpected token in expression")

    def parse_if_expr(self):
        self.ts.expect("if")
        cond = self.parse_expr_no_struct()
        then_stmts = self.parse_block_stmts()
        then_tail = None
        if then_stmts and then_stmts[-1][0] == "expr":
            then_tail = then_stmts.pop()[1]
        self.ts.expect("else")
        if self.ts.at("if"):
            else_block = self.parse_if_expr()
        else:
            else_stmts = self.parse_block_stmts()
            else_tail = None
            if else_stmts and else_stmts[-1][0] == "expr":
                else_tail = else_stmts.pop()[1]
            else_block = ("block", else_stmts, else_tail)
        return ("ifexpr", cond, ("block", then_stmts, then_tail), else_block)

    def parse_match(self):
        self.ts.expect("match")
        subject = self.parse_expr_no_struct()
        self.ts.expect("{")
        arms = []
        while not self.ts.at("}"):
            if self.ts.eat("_"):
                pattern = None
            else:
                tok = self.ts.next()
                if tok.kind != "string":
                    raise self.ts.error("match patterns must be strings or _")
                pattern = ("lit", unquote(tok.text))
            self.ts.expect("=>")
            arms.append((pattern, self.parse_expr()))
            self.ts.eat(",")
        self.ts.expect("}")
        return ("match", subject, arms)

    def parse_json(self):
        """Pure-JSON literal inside json!()."""
        tok = self.ts.peek()
        if tok.kind == "string":
            self.ts.next()
            return ("lit", unquote(tok.text))
        if tok.kind == "number":
            self.ts.next()
            return ("lit", parse_number(tok.text))
        if tok.text == "-":
            self.ts.next()
            num = self.ts.next()
            return ("lit", -parse_number(num.text))
        if tok.text in ("true", "false", "null"):
            self.ts.next()
            return ("lit", {"true": True, "false": False, "null": None}[tok.text])
        if tok.text == "[":
            self.ts.next()
            items = []
            while not self.ts.at("]"):
                items.append(self.parse_json())
                if not self.ts.eat(","):
                    break
            self.ts.expect("]")
            return ("arr", items)
        if tok.text == "{":
            self.ts.next()
            pairs = []
            while not self.ts.at("}"):
                key = self.ts.next()
                if key.kind == "string":
                    key_val = unquote(key.text)
                elif key.kind == "ident":
                    key_val = key.text
                else:
                    raise self.ts.error("bad json! key")
                self.ts.expect(":")
                pairs.append((("lit", key_val), self.parse_json()))
                if not self.ts.eat(","):
                    break
            self.ts.expect("}")
            return ("obj", pairs)
        raise self.ts.error("bad json! literal")

    @staticmethod
    def parse_format(template: str):
        """format! template -> fstring parts."""
        parts: list = []
        buf = ""
        i = 0
        while i < len(template):
            c = template[i]
            if c == "{":
                if template[i : i + 2] == "{{":
                    buf += "{"
                    i += 2
                    continue
                end = template.index("}", i)
                inner = template[i + 1 : end]
                name, _, spec = inner.partition(":")
                if buf:
                    parts.append(buf)
                    buf = ""
                parts.append(("expr", ("var", name), spec))
                i = end + 1
            elif template[i : i + 2] == "}}":
                buf += "}"
                i += 2
            else:
                buf += c
                i += 1
        if buf:
            parts.append(buf)
        return ("fstring", parts)


def extract(src: str, sink, shim=None) -> None:
    """Parse + evaluate the Rust generator; fixtures land in ``sink``.
    ``shim`` overrides the name-resolution backend (the serializer
    replay passes the interpreted-DSL shim from ``rustnative``)."""
    from .core import Env, Interp
    from .shims import RustShim

    items = RustParser(src).parse_items()
    shim = shim or RustShim(sink)
    interp = Interp(shim)
    root = Env()
    for item in items:
        interp.run_stmt(item, root)
    for fn_name, bucket in (
        ("runtime", "runtime"), ("combos", "combo"), ("json_only", "json-only"),
    ):
        root.get(fn_name)(bucket)
