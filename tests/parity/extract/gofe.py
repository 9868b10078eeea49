"""Go frontend: parses the parity-generator subset of Go into the
common AST.

Covers `sdks/go/cmd/generate-parity-fixtures/main.go`: func decls +
func literals, `:=`/`=`/`++`, for-range with `_, v` destructuring,
local struct type decls + composite literals (positional and
field-named), slice and map literals (incl. implicit element types),
`fmt.Sprintf`, numeric casts and shifts.  Everything else raises.
"""

from __future__ import annotations

import re

from .core import (
    TokenStream, parse_number, tokenize, unquote,
)

_CASTS = {"uint64", "int64", "int", "float64", "float32", "uint32"}


def _strip_funcs(src: str, names: tuple[str, ...]) -> str:
    out = src
    for name in names:
        m = re.search(rf"^func {name}\b", out, flags=re.MULTILINE)
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


class GoParser:
    def __init__(self, src: str):
        src = _strip_funcs(src, ("main", "writeBucket"))
        src = re.sub(r"^package .*$", "", src, flags=re.MULTILINE)
        src = re.sub(r"^import \([\s\S]*?\)$", "", src, flags=re.MULTILINE)
        src = re.sub(r"^import .*$", "", src, flags=re.MULTILINE)
        self.ts = TokenStream(tokenize(src))
        self.structs: dict[str, list[str]] = {}

    # -- types ----------------------------------------------------------

    def parse_type(self) -> str:
        """Consume one type; returns the bare element/struct name when
        it is a plain (possibly package-qualified) identifier."""
        if self.ts.eat("["):
            if self.ts.peek().kind == "number":  # fixed-size array [2]T
                self.ts.next()
            self.ts.expect("]")
            return self.parse_type()
        if self.ts.at("map"):
            self.ts.next()
            self.ts.expect("[")
            self.parse_type()
            self.ts.expect("]")
            self.parse_type()
            return ""
        if self.ts.at("*"):
            self.ts.next()
            return self.parse_type()
        if self.ts.at("interface"):
            self.ts.next()
            self.ts.expect("{")
            self.ts.expect("}")
            return ""
        if self.ts.at("func"):
            self.ts.next()
            self.ts.expect("(")
            depth = 1
            while depth:
                text = self.ts.next().text
                if text == "(":
                    depth += 1
                elif text == ")":
                    depth -= 1
            # optional return type
            if self.ts.peek().kind == "ident" or self.ts.at("["):
                self.parse_type()
            return ""
        name = self.ts.next().text
        if self.ts.at("."):
            self.ts.next()
            name = self.ts.next().text
        return name

    def parse_struct_decl(self) -> None:
        self.ts.expect("type")
        name = self.ts.next().text
        if self.ts.at("struct"):
            self.ts.next()
            self.ts.expect("{")
            fields = []
            while not self.ts.at("}"):
                fields.append(self.ts.next().text)
                self.parse_type()
            self.ts.expect("}")
            self.structs[name] = fields
        else:
            self.parse_type()

    # -- program --------------------------------------------------------

    def parse_program(self) -> list:
        items = []
        while self.ts.peek().kind != "eof":
            if self.ts.at("type"):
                self.parse_struct_decl()
            elif self.ts.at("func"):
                items.append(self.parse_func_decl())
            else:
                raise self.ts.error("expected top-level func or type")
        return items

    def parse_func_decl(self):
        self.ts.expect("func")
        name = self.ts.next().text
        params = self._parse_params()
        if not self.ts.at("{"):
            self.parse_type()  # return type
        body = self.parse_block_stmts()
        return ("fn", name, params, body)

    def _parse_params(self) -> list[str]:
        self.ts.expect("(")
        params = []
        while not self.ts.at(")"):
            # names share a trailing type per group: `title, body string`
            group = [self.ts.next().text]
            while self.ts.eat(","):
                group.append(self.ts.next().text)
            if not self.ts.at(")"):
                self.parse_type()
            params.extend(group)
            self.ts.eat(",")
        self.ts.expect(")")
        return params

    # -- statements -----------------------------------------------------

    def parse_block_stmts(self) -> list:
        self.ts.expect("{")
        stmts = []
        while not self.ts.at("}"):
            stmt = self.parse_stmt()
            if stmt is not None:
                stmts.append(stmt)
        self.ts.expect("}")
        return stmts

    def parse_stmt(self):
        if self.ts.at("type"):
            self.parse_struct_decl()
            return None
        if self.ts.at("return"):
            self.ts.next()
            if self.ts.at("}"):
                return ("return", None)
            return ("return", self.parse_expr())
        if self.ts.at("for"):
            self.ts.next()
            names = [self.ts.next().text]
            while self.ts.eat(","):
                names.append(self.ts.next().text)
            self.ts.expect(":=")
            self.ts.expect("range")
            iter_expr = self.parse_expr(no_struct=True)
            body = self.parse_block_stmts()
            return ("for", names, ("call", ("var", "enumerate"), [iter_expr]),
                    body)
        tok = self.ts.peek()
        nxt = self.ts.peek(1).text
        if tok.kind == "ident" and nxt == ":=":
            self.ts.next()
            self.ts.next()
            return ("let", tok.text, self.parse_expr())
        if tok.kind == "ident" and nxt == "=":
            self.ts.next()
            self.ts.next()
            return ("assign", tok.text, self.parse_expr())
        if tok.kind == "ident" and nxt == "+" and (
            self.ts.peek(2).text == "+"
        ):
            self.ts.next()
            self.ts.next()
            self.ts.next()
            return ("aug", tok.text, "+", ("lit", 1))
        expr = self.parse_expr()
        return ("expr", expr)

    # -- expressions ----------------------------------------------------

    _BIN_LEVELS = [
        ("||",), ("&&",), ("==", "!=", "<", ">", "<=", ">="),
        ("<<", ">>"), ("+", "-"), ("*", "/", "%"),
    ]

    def parse_expr(self, level: int = 0, no_struct: bool = False):
        if level == len(self._BIN_LEVELS):
            return self.parse_postfix(self.parse_primary(no_struct), no_struct)
        lhs = self.parse_expr(level + 1, no_struct)
        while self.ts.peek().text in self._BIN_LEVELS[level]:
            op = self.ts.next().text
            rhs = self.parse_expr(level + 1, no_struct)
            lhs = ("binop", op, lhs, rhs)
        return lhs

    def parse_postfix(self, expr, no_struct: bool = False):
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
            elif self.ts.at("{") and not no_struct and expr[0] == "var" and (
                expr[1] in self.structs
            ):
                expr = self.parse_struct_literal(expr[1])
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

    def parse_struct_literal(self, type_name: str):
        """``T{...}`` with positional or field-named entries -> obj."""
        self.ts.expect("{")
        fields = self.structs.get(type_name)
        named = (
            self.ts.peek().kind == "ident" and self.ts.peek(1).text == ":"
        )
        pairs = []
        idx = 0
        while not self.ts.at("}"):
            if named:
                key = self.ts.next().text
                self.ts.expect(":")
                pairs.append((("lit", key), self.parse_expr()))
            else:
                if fields is None or idx >= len(fields):
                    raise self.ts.error(
                        f"unknown positional fields for {type_name}"
                    )
                pairs.append((("lit", fields[idx]), self.parse_expr()))
                idx += 1
            if not self.ts.eat(","):
                break
        self.ts.expect("}")
        return ("obj", pairs)

    def parse_primary(self, no_struct: bool = False):
        tok = self.ts.peek()
        if tok.text == "&":  # address-of: pointers are identity here
            self.ts.next()
            return self.parse_primary(no_struct)
        if tok.text == "-":
            self.ts.next()
            return ("unary", "-", self.parse_primary(no_struct))
        if tok.kind == "string":
            self.ts.next()
            return ("lit", unquote(tok.text))
        if tok.kind == "number":
            self.ts.next()
            return ("lit", parse_number(tok.text))
        if tok.text == "(":
            self.ts.next()
            inner = self.parse_expr()
            self.ts.expect(")")
            return inner
        if tok.text == "[":
            # slice literal: []T{...} (possibly [][2]string{{...}})
            self.ts.next()
            if self.ts.peek().kind == "number":
                self.ts.next()
            self.ts.expect("]")
            elem = self.parse_type()
            self.ts.expect("{")
            items = []
            while not self.ts.at("}"):
                if self.ts.at("{"):
                    if elem in self.structs:
                        items.append(self.parse_struct_literal(elem))
                    else:
                        # implicit nested array literal: {"a", "b"}
                        self.ts.expect("{")
                        inner = self.parse_args("}")
                        items.append(("tuple", inner))
                else:
                    items.append(self.parse_expr())
                if not self.ts.eat(","):
                    break
            self.ts.expect("}")
            return ("arr", items)
        if tok.text == "map":
            self.ts.next()
            self.ts.expect("[")
            self.parse_type()
            self.ts.expect("]")
            self.parse_type()
            self.ts.expect("{")
            pairs = []
            while not self.ts.at("}"):
                key = self.parse_expr()
                self.ts.expect(":")
                pairs.append((key, self.parse_expr()))
                if not self.ts.eat(","):
                    break
            self.ts.expect("}")
            return ("obj", pairs)
        if tok.text == "func":
            self.ts.next()
            params = self._parse_params()
            if not self.ts.at("{"):
                self.parse_type()
            body = self.parse_block_stmts()
            return ("lambda", params, body)
        if tok.kind == "ident":
            name = self.ts.next().text
            if name in ("true", "false"):
                return ("lit", name == "true")
            if name == "nil":
                return ("lit", None)
            return ("var", name)
        raise self.ts.error("unexpected token in expression")


def _field_struct(elem_name: str):
    return elem_name


def extract(src: str, sink) -> None:
    from .core import Env, Interp
    from .shims import GoShim

    parser = GoParser(src)
    # implicit struct element types used before declaration (shim types)
    parser.structs.setdefault("PropPair", ["Key", "Value"])
    parser.structs.setdefault("WhenThen", ["When", "Then"])
    items = parser.parse_program()
    shim = GoShim(sink)
    interp = Interp(shim)
    root = Env()
    root.set("enumerate", enumerate)
    root.set("append", lambda lst, *items_: list(lst) + list(items_))
    root.set("fmt", _FmtShim())
    for cast in _CASTS:
        root.set(cast, int if cast != "float64" else float)
    root.set("float64", float)
    root.set("float32", float)
    for item in items:
        interp.run_stmt(item, root)
    for fn_name, bucket in (
        ("runtimeFixtures", "runtime"),
        ("comboFixtures", "combo"),
        ("jsonOnlyFixtures", "json-only"),
    ):
        for fx in root.get(fn_name)():
            sink.write(bucket, fx["name"], fx["req"])


class _FmtShim:
    @staticmethod
    def sprintf(template: str, *args):
        return template % args

    Sprintf = sprintf
