"""Shared tokenizer, AST, and evaluator for the SDK-generator extractors.

The three generators (Rust/TS/Go) are disciplined builder-call programs:
literals, arrays/objects, calls, method chains, local helpers, nested
for-loops over literal lists, and match/switch-like dispatch.  Each
language frontend parses its source into this module's small AST; the
tree-walking evaluator runs it against the Python DSL through a
language shim (see shims.py).  Anything outside the subset raises
``ExtractError`` loudly — silent skips would defeat the proof.
"""

from __future__ import annotations

import re
from typing import Any


class ExtractError(Exception):
    pass


# ---------------------------------------------------------------- tokens

TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>//[^\n]*|/\*.*?\*/)
  | (?P<string>"(?:\\.|[^"\\])*"|'(?:\\.|[^'\\])*'|`(?:\\.|[^`\\])*`)
  | (?P<number>0x[0-9a-fA-F_]+|\d[\d_]*\.\d+(?:[eE][+-]?\d+)?|\d[\d_]*(?:[eE][+-]?\d+)?)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*!?)
  | (?P<punct>===|!==|\?\?|::|=>|->|\.\.\.|\.\.=|\.\.|:=|<<|>>|<=|>=|==|!=|&&|\|\||\+=|-=|[{}()\[\],.;:&|<>=+\-*/%!?_@#])
    """,
    re.VERBOSE | re.DOTALL,
)


class Token:
    __slots__ = ("kind", "text", "pos", "line")

    def __init__(self, kind: str, text: str, pos: int, line: int):
        self.kind = kind
        self.text = text
        self.pos = pos
        self.line = line

    def __repr__(self):
        return f"Token({self.kind}, {self.text!r}, line {self.line})"


def tokenize(src: str) -> list[Token]:
    out: list[Token] = []
    pos = 0
    line = 1
    while pos < len(src):
        m = TOKEN_RE.match(src, pos)
        if m is None:
            raise ExtractError(
                f"cannot tokenize at line {line}: {src[pos:pos + 40]!r}"
            )
        kind = m.lastgroup
        text = m.group()
        if kind not in ("ws", "comment"):
            out.append(Token(kind, text, pos, line))
        line += text.count("\n")
        pos = m.end()
    out.append(Token("eof", "", pos, line))
    return out


class TokenStream:
    def __init__(self, tokens: list[Token]):
        self.tokens = tokens
        self.i = 0

    def peek(self, ahead: int = 0) -> Token:
        return self.tokens[min(self.i + ahead, len(self.tokens) - 1)]

    def next(self) -> Token:
        tok = self.tokens[self.i]
        if tok.kind != "eof":
            self.i += 1
        return tok

    def at(self, text: str) -> bool:
        return self.peek().text == text

    def eat(self, text: str) -> bool:
        if self.at(text):
            self.next()
            return True
        return False

    def expect(self, text: str) -> Token:
        tok = self.next()
        if tok.text != text:
            raise ExtractError(
                f"expected {text!r}, got {tok.text!r} at line {tok.line}"
            )
        return tok

    def error(self, msg: str) -> ExtractError:
        tok = self.peek()
        return ExtractError(f"{msg} at line {tok.line} (near {tok.text!r})")


def unquote(text: str) -> str:
    body = text[1:-1]
    return re.sub(
        r"\\(.)",
        lambda m: {"n": "\n", "t": "\t", "r": "\r", "0": "\0"}.get(
            m.group(1), m.group(1)
        ),
        body,
    )


def parse_number(text: str) -> int | float:
    text = text.replace("_", "")
    if text.startswith("0x"):
        return int(text, 16)
    if "." in text or "e" in text or "E" in text:
        return float(text)
    return int(text)


# ------------------------------------------------------------------- AST
#
# Expressions (tuples):
#   ("lit", value)                  ("var", name)
#   ("path", [seg, ...])            ("call", fn_expr, [args])
#   ("method", obj, name, [args])   ("attr", obj, name)
#   ("arr", [items])                ("tuple", [items])
#   ("obj", [(key_expr, val_expr)])
#   ("lambda", [params], body_expr_or_block)
#   ("binop", op, a, b)             ("unary", op, a)
#   ("fstring", [part, ...])        part = str | ("expr", expr, spec)
#   ("block", [stmts], tail_expr_or_None)
#   ("ifexpr", cond, then_block, else_block)
#   ("match", subject, [(pattern_or_None, expr)])
#
# Statements:
#   ("let", name, expr)             ("assign", target_name, expr)
#   ("aug", name, op, expr)         ("expr", expr)
#   ("for", [names], iter_expr, [stmts])
#   ("fn", name, [params], [stmts])
#   ("return", expr_or_None)
#   ("if", cond, [then], [else])


class _Return(Exception):
    def __init__(self, value):
        self.value = value


class Env:
    def __init__(self, parent: "Env | None" = None, names: dict | None = None):
        self.parent = parent
        self.names = names or {}

    def get(self, name: str) -> Any:
        env = self
        while env is not None:
            if name in env.names:
                return env.names[name]
            env = env.parent
        raise ExtractError(f"unknown name {name!r}")

    def set(self, name: str, value: Any) -> None:
        self.names[name] = value

    def assign(self, name: str, value: Any) -> None:
        env = self
        while env is not None:
            if name in env.names:
                env.names[name] = value
                return
            env = env.parent
        raise ExtractError(f"assignment to unknown name {name!r}")


class Interp:
    """Tree-walking evaluator.  ``shim`` resolves paths/attrs/methods."""

    def __init__(self, shim):
        self.shim = shim

    # -- statements -----------------------------------------------------

    def run_block(self, stmts: list, env: Env) -> None:
        for stmt in stmts:
            self.run_stmt(stmt, env)

    def run_stmt(self, stmt, env: Env) -> None:
        op = stmt[0]
        if op == "let":
            env.set(stmt[1], self.eval(stmt[2], env))
        elif op == "assign":
            env.assign(stmt[1], self.eval(stmt[2], env))
        elif op == "aug":
            cur = env.get(stmt[1])
            val = self.eval(stmt[3], env)
            env.assign(stmt[1], self._binop(stmt[2], cur, val))
        elif op == "expr":
            self.eval(stmt[1], env)
        elif op == "for":
            names, iter_expr, body = stmt[1], stmt[2], stmt[3]
            for item in self.eval(iter_expr, env):
                child = Env(env)
                if len(names) == 1:
                    child.set(names[0], item)
                else:
                    if len(item) != len(names):
                        raise ExtractError(
                            f"destructure arity mismatch for {names}"
                        )
                    for name, val in zip(names, item):
                        child.set(name, val)
                self.run_block(body, child)
        elif op == "fn":
            env.set(stmt[1], self._make_fn(stmt[1], stmt[2], stmt[3], env))
        elif op == "return":
            raise _Return(
                None if stmt[1] is None else self.eval(stmt[1], env)
            )
        elif op == "if":
            if self.eval(stmt[1], env):
                self.run_block(stmt[2], Env(env))
            elif stmt[3] is not None:
                self.run_block(stmt[3], Env(env))
        else:
            raise ExtractError(f"unknown statement {op!r}")

    def _make_fn(self, name: str, params: list[str], body: list, defenv: Env):
        interp = self

        def fn(*args):
            if len(args) != len(params):
                raise ExtractError(
                    f"{name}() expects {len(params)} args, got {len(args)}"
                )
            env = Env(defenv, dict(zip(params, args)))
            try:
                # Rust-style tail expression: a trailing bare expression
                # statement is the return value.
                for i, stmt in enumerate(body):
                    if i == len(body) - 1 and stmt[0] == "expr":
                        return interp.eval(stmt[1], env)
                    interp.run_stmt(stmt, env)
            except _Return as ret:
                return ret.value
            return None

        return fn

    # -- expressions ----------------------------------------------------

    def eval(self, node, env: Env) -> Any:
        op = node[0]
        if op == "lit":
            return node[1]
        if op == "var":
            name = node[1]
            try:
                return env.get(name)
            except ExtractError:
                return self.shim.lookup([name])
        if op == "path":
            segs = node[1]
            try:
                base = env.get(segs[0])
            except ExtractError:
                return self.shim.lookup(segs)
            for seg in segs[1:]:
                base = self.shim.attr(base, seg)
            return base
        if op == "call":
            fn = self.eval(node[1], env)
            args = [self.eval(a, env) for a in node[2]]
            if not callable(fn):
                # zero-arg constructor spelled over a constant (e.g.
                # Rust NodeRef::all() -> Python NodeRef.all == "All")
                if not args:
                    return fn
                raise ExtractError(f"cannot call non-callable {fn!r}")
            return fn(*args)
        if op == "method":
            obj = self.eval(node[1], env)
            args = [self.eval(a, env) for a in node[3]]
            return self.shim.method(obj, node[2], args)
        if op == "attr":
            return self.shim.attr(self.eval(node[1], env), node[2])
        if op == "arr":
            return [self.eval(item, env) for item in node[1]]
        if op == "tuple":
            return tuple(self.eval(item, env) for item in node[1])
        if op == "obj":
            return {
                self.eval(k, env): self.eval(v, env) for k, v in node[1]
            }
        if op == "lambda":
            params, body = node[1], node[2]
            interp = self

            def fn(*args):
                child = Env(env, dict(zip(params, args)))
                if isinstance(body, list):  # statement body
                    try:
                        interp.run_block(body, child)
                    except _Return as ret:
                        return ret.value
                    return None
                return interp.eval(body, child)

            return fn
        if op == "binop":
            return self._binop(
                node[1], self.eval(node[2], env), self.eval(node[3], env)
            )
        if op == "unary":
            val = self.eval(node[2], env)
            if node[1] == "-":
                return -val
            if node[1] == "!":
                return not val
            raise ExtractError(f"unknown unary {node[1]!r}")
        if op == "fstring":
            out = []
            for part in node[1]:
                if isinstance(part, str):
                    out.append(part)
                else:
                    val = self.eval(part[1], env)
                    out.append(format(val, part[2]) if part[2] else str(val))
            return "".join(out)
        if op == "block":
            child = Env(env)
            self.run_block(node[1], child)
            return self.eval(node[2], child) if node[2] is not None else None
        if op == "ifexpr":
            branch = node[2] if self.eval(node[1], env) else node[3]
            return self.eval(branch, env)
        if op == "match":
            subject = self.eval(node[1], env)
            for pattern, result in node[2]:
                if pattern is None or self.eval(pattern, env) == subject:
                    return self.eval(result, env)
            raise ExtractError(f"no match arm for {subject!r}")
        raise ExtractError(f"unknown expression {op!r}")

    @staticmethod
    def _binop(op: str, a, b):
        if op == "+":
            return a + b
        if op == "-":
            return a - b
        if op == "*":
            return a * b
        if op == "/":
            return a / b
        if op == "<<":
            return a << b
        if op == ">>":
            return a >> b
        if op == "==":
            return a == b
        if op == "!=":
            return a != b
        if op == "<":
            return a < b
        if op == ">":
            return a > b
        if op == "<=":
            return a <= b
        if op == ">=":
            return a >= b
        if op == "&&":
            return a and b
        if op == "||":
            return a or b
        raise ExtractError(f"unknown binop {op!r}")
