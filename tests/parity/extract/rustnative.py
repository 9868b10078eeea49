"""Rust DSL *serializer* interpreter: executes ``dsl.rs`` itself.

Counterpart of :mod:`gonative`/:mod:`tsnative` for the Rust SDK
(round-3 verdict weak item 5): parses ``sdks/rust/src/dsl.rs`` — impl
blocks, enums with payloads, ``json!`` bodies, matches, closures —
into an interpreted module and replays the fixture generator through
the SDK's OWN builder bodies, so the wire JSON comes from Rust's code,
not the Python DSL.

Value model: ``serde_json::Value`` maps to plain Python values (dicts
preserve insertion order like ``serde_json``'s ``preserve_order``
feature is irrelevant to the structural diff), ``Option`` is
value-or-``None``, structs/enums are small tagged records.  Typestate
generics and ``PhantomData`` are erased, exactly as at Rust runtime.
"""

from __future__ import annotations

import copy
import re
from typing import Any

from .core import (
    ExtractError, TokenStream, parse_number, tokenize, unquote,
)


class RsPanic(Exception):
    pass


class _Return(Exception):
    def __init__(self, value):
        self.value = value


class RsStruct:
    __slots__ = ("type_name", "fields")

    def __init__(self, type_name: str, fields: dict[str, Any]):
        self.type_name = type_name
        self.fields = fields

    def __repr__(self):
        return f"RsStruct({self.type_name}, {self.fields!r})"


class RsEnum:
    __slots__ = ("type_name", "variant", "payload")

    def __init__(self, type_name: str, variant: str, payload: tuple):
        self.type_name = type_name
        self.variant = variant
        self.payload = payload

    def __repr__(self):
        return f"{self.type_name}::{self.variant}{self.payload!r}"


_PHANTOM = object()


# ---------------------------------------------------------------- parser
#
# Statements:
#   ("let", name, expr)  ("expr", expr)  ("ret", expr|None)
#   ("if", cond, [..], [..]|None)
#   ("iflet", bind_name, subject_expr, [..], [..]|None)  # Some(x) only
#   ("tail", expr)
# Expressions:
#   ("lit", v) ("path", [segs]) ("self",)
#   ("call", fn_expr, [args]) ("method", obj, name, [args])
#   ("field", obj, name)  ("index", obj, key_expr)
#   ("structlit", name, [(field, expr)]) ("json", json_ast) ("vec", [..])
#   ("closure", [params], body) ("match", subject, [(pattern, expr/stmts)])
#   ("binop", op, a, b) ("unary", op, a) ("ref", expr)
# json_ast: ("obj", [(key_expr, val)]) | ("arr", [..]) | ("expr", rust_expr)
#   key_expr is a rust expr (string literal or interpolated ident)


class RsDslParser:
    def __init__(self, src: str):
        # drop the test module entirely (uses asserts/shifts we don't need)
        m = re.search(r"^#\[cfg\(test\)\]\s*\nmod tests \{", src,
                      flags=re.MULTILINE)
        if m:
            src = src[: m.start()]
        src = re.sub(r"^use .*;$", "", src, flags=re.MULTILINE)
        # lifetimes lex as the start of a char/string literal; erase
        # them (they have no runtime meaning)
        src = re.sub(r"'static\b", "", src)
        src = re.sub(r"<'[a-z]+>", "", src)
        src = re.sub(r"&'[a-z]+ ", "&", src)
        self.ts = TokenStream(tokenize(src))
        self.structs: dict[str, list[str]] = {}   # name -> field names
        # name -> {field -> head token of its type} (Default derivation)
        self.struct_field_types: dict[str, dict[str, str]] = {}
        self.tuple_structs: set[str] = set()
        self.enums: dict[str, list[str]] = {}     # name -> variants
        self.fns: dict[str, tuple] = {}
        self.methods: dict[tuple[str, str], tuple] = {}
        #   (type, name) -> (has_self, params, body)

    # -- helpers --------------------------------------------------------

    def _skip_attr(self) -> None:
        ts = self.ts
        while ts.at("#"):
            ts.next()
            self._skip_balanced("[", "]")

    def _skip_balanced(self, opener: str, closer: str) -> None:
        ts = self.ts
        ts.expect(opener)
        depth = 1
        while depth:
            tok = ts.next()
            if tok.kind == "eof":
                raise ts.error("unbalanced")
            depth += tok.text == opener
            depth -= tok.text == closer

    def _skip_generics(self) -> None:
        ts = self.ts
        if not ts.at("<"):
            return
        depth = 0
        while True:
            tok = ts.next()
            if tok.kind == "eof":
                raise ts.error("unterminated generics")
            t = tok.text
            if t == "<":
                depth += 1
            elif t == "<<":
                depth += 2
            elif t == ">":
                depth -= 1
            elif t == ">>":
                depth -= 2
            if depth <= 0:
                return

    def _skip_type(self, stop: tuple[str, ...]) -> str:
        ts = self.ts
        depth = 0
        parts: list[str] = []
        while True:
            tok = ts.peek()
            if tok.kind == "eof":
                raise ts.error("unterminated type")
            t = tok.text
            if depth == 0 and t in stop:
                return "".join(parts)
            if t in ("<", "(", "["):
                depth += 1
            elif t in (">", ")", "]"):
                if depth == 0:
                    return "".join(parts)
                depth -= 1
            elif t == ">>":
                depth -= 2
            parts.append(t)
            ts.next()

    # -- items ----------------------------------------------------------

    def parse_program(self) -> None:
        ts = self.ts
        while ts.peek().kind != "eof":
            self._skip_attr()
            ts.eat("pub")
            if ts.at("struct"):
                self.parse_struct()
            elif ts.at("enum"):
                self.parse_enum()
            elif ts.at("trait"):
                ts.next()
                ts.next()  # name
                self._skip_balanced("{", "}")
            elif ts.at("impl"):
                self.parse_impl()
            elif ts.at("fn"):
                name, item = self.parse_fn()
                self.fns[name] = item
            else:
                raise ts.error("unexpected item")

    def parse_struct(self) -> None:
        ts = self.ts
        ts.expect("struct")
        name = ts.next().text
        self._skip_generics()
        if ts.eat(";"):  # unit struct (typestate markers)
            self.structs[name] = []
            return
        if ts.at("("):  # tuple struct
            self._skip_balanced("(", ")")
            ts.eat(";")
            self.structs[name] = ["0"]
            self.tuple_structs.add(name)
            return
        ts.expect("{")
        fields: list[str] = []
        types: dict[str, str] = {}
        while not ts.at("}"):
            self._skip_attr()
            ts.eat("pub")
            fname = ts.next().text
            ts.expect(":")
            type_head = ts.peek().text  # Vec / Option / String / ...
            self._skip_type((",", "}"))
            fields.append(fname)
            types[fname] = type_head
            ts.eat(",")
        ts.expect("}")
        self.structs[name] = fields
        self.struct_field_types[name] = types

    def parse_enum(self) -> None:
        ts = self.ts
        ts.expect("enum")
        name = ts.next().text
        self._skip_generics()
        ts.expect("{")
        variants: list[str] = []
        while not ts.at("}"):
            self._skip_attr()
            vname = ts.next().text
            if ts.at("("):
                self._skip_balanced("(", ")")
            variants.append(vname)
            ts.eat(",")
        ts.expect("}")
        self.enums[name] = variants

    def parse_impl(self) -> None:
        ts = self.ts
        ts.expect("impl")
        self._skip_generics()
        first = ts.next().text
        self._skip_generics()
        if ts.at("for"):  # trait impl: `impl From<X> for Y { ... }` etc.
            ts.next()
            target = ts.next().text
            self._skip_generics()
            if first == "From":
                # register as <Target>::from_<...>? `.into()` is identity
                # in our model, so From bodies need no registration —
                # but parse past the block
                self._skip_balanced("{", "}")
                return
            self._skip_balanced("{", "}")
            return
        type_name = first
        ts.expect("{")
        while not ts.at("}"):
            self._skip_attr()
            ts.eat("pub")
            if not ts.at("fn"):
                raise ts.error("unexpected impl member")
            name, item = self.parse_fn(impl_type=type_name)
            self.methods[(type_name, name)] = item
        ts.expect("}")

    def parse_fn(self, impl_type: str | None = None):
        ts = self.ts
        ts.expect("fn")
        name = ts.next().text
        self._skip_generics()
        ts.expect("(")
        has_self = False
        params: list[str] = []
        while not ts.at(")"):
            ts.eat("&")
            ts.eat("mut")
            if ts.at("self"):
                ts.next()
                has_self = True
            else:
                pname = ts.next().text
                ts.expect(":")
                ptype = self._skip_type((",", ")"))
                params.append((pname, ptype))
            ts.eat(",")
        ts.expect(")")
        if ts.eat("->"):
            self._skip_type(("{", "where"))
        if ts.at("where"):
            self._skip_type(("{",))
        body = self.parse_block()
        return name, (has_self, params, body)

    # -- statements -----------------------------------------------------

    def parse_block(self) -> list:
        ts = self.ts
        ts.expect("{")
        stmts: list = []
        while not ts.at("}"):
            stmts.append(self.parse_stmt())
        ts.expect("}")
        return stmts

    def parse_stmt(self):
        ts = self.ts
        if ts.at("let"):
            ts.next()
            ts.eat("mut")
            name = ts.next().text
            if ts.eat(":"):
                self._skip_type(("=", ";"))
            ts.expect("=")
            expr = self.parse_expr()
            ts.expect(";")
            return ("let", name, expr)
        if ts.at("return"):
            ts.next()
            if ts.eat(";"):
                return ("ret", None)
            expr = self.parse_expr()
            ts.eat(";")
            return ("ret", expr)
        if ts.at("if"):
            node = self.parse_if()
            ts.eat(";")
            return node
        if ts.at("for"):
            ts.next()
            if ts.eat("("):
                names = []
                while not ts.at(")"):
                    names.append(ts.next().text)
                    ts.eat(",")
                ts.expect(")")
            else:
                names = [ts.next().text]
            ts.expect("in")
            it = self.parse_expr(struct_ok=False)
            body = self.parse_block()
            return ("for", names, it, body)
        expr = self.parse_expr()
        if ts.eat("="):
            value = self.parse_expr()
            ts.expect(";")
            return ("assign", expr, value)
        if ts.eat(";"):
            return ("expr", expr)
        return ("tail", expr)  # tail expression = block value

    def parse_if(self):
        ts = self.ts
        ts.expect("if")
        if ts.eat("let"):
            # `if let Some(x) = expr { .. }` — the only pattern used
            seg = ts.next().text
            if seg != "Some":
                raise ts.error("only `if let Some(..)` is supported")
            ts.expect("(")
            bind = ts.next().text
            ts.expect(")")
            ts.expect("=")
            subject = self.parse_expr(struct_ok=False)
            then = self.parse_block()
            other = None
            if ts.eat("else"):
                other = (
                    [self.parse_if()] if ts.at("if") else self.parse_block()
                )
            return ("iflet", bind, subject, then, other)
        cond = self.parse_expr(struct_ok=False)
        then = self.parse_block()
        other = None
        if ts.eat("else"):
            other = [self.parse_if()] if ts.at("if") else self.parse_block()
        return ("if", cond, then, other)

    # -- expressions ----------------------------------------------------

    _PREC = {
        "||": 1, "&&": 2,
        "==": 3, "!=": 3, "<": 3, "<=": 3, ">": 3, ">=": 3,
        "+": 4, "-": 4, "*": 5, "/": 5, "%": 5,
    }

    def parse_expr(self, min_prec: int = 0, struct_ok: bool = True):
        left = self.parse_unary(struct_ok)
        while True:
            op = self.ts.peek().text
            prec = self._PREC.get(op)
            if prec is None or prec < min_prec:
                return left
            self.ts.next()
            right = self.parse_expr(prec + 1, struct_ok)
            left = ("binop", op, left, right)

    def parse_unary(self, struct_ok: bool = True):
        ts = self.ts
        if ts.eat("!"):
            return ("unary", "!", self.parse_unary(struct_ok))
        if ts.eat("-"):
            return ("unary", "-", self.parse_unary(struct_ok))
        if ts.eat("&"):
            ts.eat("mut")
            return self.parse_unary(struct_ok)
        if ts.eat("*"):
            return self.parse_unary(struct_ok)
        return self.parse_postfix(self.parse_primary(struct_ok))

    def parse_postfix(self, expr):
        ts = self.ts
        while True:
            if ts.at("."):
                ts.next()
                tok = ts.next()
                if tok.kind == "number":  # tuple field .0
                    expr = ("field", expr, tok.text)
                    continue
                name = tok.text
                if ts.at("::"):  # turbofish `.collect::<Vec<_>>()`
                    ts.next()
                    self._skip_generics()
                if ts.at("("):
                    args = self._parse_args()
                    expr = ("method", expr, name, args)
                else:
                    expr = ("field", expr, name)
                continue
            if ts.at("("):
                args = self._parse_args()
                expr = ("call", expr, args)
                continue
            if ts.at("["):
                ts.next()
                idx = self.parse_expr()
                ts.expect("]")
                expr = ("index", expr, idx)
                continue
            if ts.at("as"):  # numeric cast
                ts.next()
                self.ts.next()  # type name
                continue
            return expr

    def _parse_args(self) -> list:
        ts = self.ts
        ts.expect("(")
        args: list = []
        while not ts.at(")"):
            args.append(self.parse_expr())
            if not ts.eat(","):
                break
        ts.expect(")")
        return args

    def parse_primary(self, struct_ok: bool = True):
        ts = self.ts
        tok = ts.peek()
        if tok.kind == "string":
            ts.next()
            return ("lit", unquote(tok.text))
        if tok.kind == "number":
            ts.next()
            return ("lit", parse_number(tok.text))
        if ts.eat("("):
            inner = self.parse_expr()
            ts.expect(")")
            return inner
        if ts.at("|"):  # closure |a, b| expr
            ts.next()
            params: list[str] = []
            while not ts.at("|"):
                ts.eat("&")
                if ts.eat("("):  # tuple pattern |(a, b)|
                    names = []
                    while not ts.at(")"):
                        names.append(ts.next().text)
                        ts.eat(",")
                    ts.expect(")")
                    params.append(tuple(names))
                else:
                    params.append(ts.next().text)
                ts.eat(",")
            ts.expect("|")
            body = (
                self.parse_block() if ts.at("{")
                else [("tail", self.parse_expr())]
            )
            return ("closure", params, body)
        if ts.at("match"):
            ts.next()
            subject = self.parse_expr(struct_ok=False)
            ts.expect("{")
            arms: list[tuple] = []
            while not ts.at("}"):
                pattern = self.parse_pattern()
                ts.expect("=>")
                if ts.at("{"):
                    result = ("block", self.parse_block())
                else:
                    result = ("expr", self.parse_expr())
                ts.eat(",")
                arms.append((pattern, result))
            ts.expect("}")
            return ("match", subject, arms)
        if tok.kind == "ident":
            name = ts.next().text
            if name == "json!":
                ts.expect("(")
                node = self.parse_json_value()
                ts.expect(")")
                return ("json", node)
            if name == "vec!":
                ts.expect("[")
                items = []
                while not ts.at("]"):
                    items.append(self.parse_expr())
                    if not ts.eat(","):
                        break
                ts.expect("]")
                return ("vec", items)
            if name == "true":
                return ("lit", True)
            if name == "false":
                return ("lit", False)
            if name == "self":
                return ("self",)
            segs = [name]
            while ts.at("::"):
                ts.next()
                if ts.at("<"):  # turbofish in path
                    self._skip_generics()
                    continue
                segs.append(ts.next().text)
            if struct_ok and ts.at("{") and self._looks_like_structlit():
                return self._parse_structlit(segs[-1])
            if len(segs) == 1:
                return ("path", segs)
            return ("path", segs)
        raise ts.error("unsupported rust expression")

    def _looks_like_structlit(self) -> bool:
        # `{` directly after a path: struct literal if `ident :` or
        # `ident ,`/`ident }` follows (field shorthand)
        ts = self.ts
        nxt = ts.peek(1)
        n2 = ts.peek(2)
        return nxt.kind == "ident" and n2.text in (":", ",", "}")

    def _parse_structlit(self, name: str):
        ts = self.ts
        ts.expect("{")
        fields: list[tuple] = []
        while not ts.at("}"):
            fname = ts.next().text
            if ts.eat(":"):
                fields.append((fname, self.parse_expr()))
            else:
                fields.append((fname, ("path", [fname])))
            ts.eat(",")
        ts.expect("}")
        return ("structlit", name, fields)

    def parse_pattern(self):
        """Patterns: `_`, literal, Path::Variant, Path::Variant(bind)."""
        ts = self.ts
        tok = ts.peek()
        if tok.text == "_":
            ts.next()
            return ("any",)
        if tok.kind == "string":
            ts.next()
            return ("plit", unquote(tok.text))
        segs = [ts.next().text]
        while ts.at("::"):
            ts.next()
            segs.append(ts.next().text)
        bind = None
        if ts.eat("("):
            bind = ts.next().text
            ts.expect(")")
        return ("pvariant", segs, bind)

    # -- json! body ------------------------------------------------------

    def parse_json_value(self):
        ts = self.ts
        if ts.at("{"):
            ts.next()
            pairs: list[tuple] = []
            while not ts.at("}"):
                # key: string literal or interpolated expression
                if ts.peek().kind == "string":
                    key = ("lit", unquote(ts.next().text))
                else:
                    key = self.parse_expr()
                ts.expect(":")
                pairs.append((key, self.parse_json_value()))
                if not ts.eat(","):
                    break
            ts.expect("}")
            return ("jobj", pairs)
        if ts.at("["):
            ts.next()
            items = []
            while not ts.at("]"):
                items.append(self.parse_json_value())
                if not ts.eat(","):
                    break
            ts.expect("]")
            return ("jarr", items)
        if ts.at("null"):
            ts.next()
            return ("jexpr", ("lit", None))
        return ("jexpr", self.parse_expr())


# ------------------------------------------------------------- evaluator


class RsModule:
    def __init__(self, src: str):
        parser = RsDslParser(src)
        parser.parse_program()
        self.structs = parser.structs
        self.struct_field_types = parser.struct_field_types
        self.tuple_structs = parser.tuple_structs
        self.enums = parser.enums
        self.fns = parser.fns
        self.methods = parser.methods

    # -- public ---------------------------------------------------------

    def free(self, name: str):
        if name in self.fns:
            has_self, params, body = self.fns[name]
            return self._bind(None, params, body, name)
        if name in self.structs:
            return _StructCtor(self, name)
        if name in self.enums:
            return _EnumNs(self, name)
        raise ExtractError(f"rust dsl has no symbol {name!r}")

    def static_path(self, segs: list[str]):
        """Resolve A::b paths: enum variants, static methods, Map/Vec."""
        if len(segs) == 2:
            type_name, member = segs
            if type_name in self.enums and member in self.enums[type_name]:
                return _VariantCtor(type_name, member)
            if (type_name, member) in self.methods:
                has_self, params, body = self.methods[(type_name, member)]
                if has_self:
                    raise ExtractError(
                        f"{type_name}::{member} needs a receiver"
                    )
                return self._bind(None, params, body,
                                  f"{type_name}::{member}",
                                  self_type=type_name)
            if type_name == "Map" and member == "new":
                return dict
            if type_name == "Vec" and member == "new":
                return list
            if member == "default" and type_name in self.structs:
                # #[derive(Default)]: zero values derived from each
                # field's PARSED type head, not its name — a field-name
                # special case once defaulted any non-'steps' Vec to
                # None, which the for-loop then silently iterated as
                # empty (wrong corpus, no error)
                zero = {
                    "Vec": list, "String": str, "HashMap": dict,
                    "BTreeMap": dict, "Option": lambda: None,
                    "bool": lambda: False, "u64": int, "i64": int,
                    "u32": int, "i32": int, "usize": int, "f64": float,
                }
                heads = self.struct_field_types.get(type_name, {})

                def default_of(f):
                    head = heads.get(f)
                    if head not in zero:
                        raise ExtractError(
                            f"{type_name}::default(): no zero value "
                            f"for field {f!r} of type {head!r}"
                        )
                    return zero[head]()

                fields = {f: default_of(f) for f in self.structs[type_name]}
                return lambda: RsStruct(type_name, dict(fields))
            if type_name == "Value":
                if member == "Null":
                    return None
                if member == "Object":
                    return lambda m: dict(m)
                if member == "Array":
                    return lambda v: list(v)
        raise ExtractError(f"unknown rust path {'::'.join(segs)}")

    def call_method(self, obj: Any, name: str, args: list,
                    self_type: str | None = None) -> Any:
        if isinstance(obj, (RsStruct, RsEnum)):
            type_name = obj.type_name
            entry = self.methods.get((type_name, name))
            if entry is not None:
                has_self, params, body = entry
                if not has_self:
                    raise ExtractError(f"{type_name}::{name} is static")
                return self._invoke(obj, params, body,
                                    f"{type_name}.{name}", args, type_name)
        return self._builtin_method(obj, name, args)

    # -- invocation -----------------------------------------------------

    def _bind(self, recv, params, body, label, self_type=None):
        def fn(*args):
            return self._invoke(recv, params, body, label, list(args),
                                self_type)

        return fn

    def _coerce(self, type_text: str, value):
        """Apply the DSL's From-impl semantics at typed boundaries —
        what ``.into()`` resolves to in real Rust."""
        t = type_text.replace("&", "")
        if t.startswith("implInto<"):
            return self._coerce(t[len("implInto<"):-1], value)
        if t.startswith("Option<"):
            return None if value is None else self._coerce(t[7:-1], value)
        if t == "Input":
            if isinstance(value, RsEnum) and value.type_name == "Input":
                return value
            if isinstance(value, RsStruct) and value.type_name == "Expr":
                return RsEnum("Input", "Expr", (value,))
            return RsEnum("Input", "Value", (value,))
        if t == "Bound":
            if isinstance(value, RsEnum) and value.type_name == "Bound":
                return value
            if isinstance(value, RsStruct) and value.type_name == "Expr":
                return RsEnum("Bound", "Expr", (value,))
            return RsEnum("Bound", "Literal", (value,))
        if t == "Batch":
            if isinstance(value, RsStruct) and value.type_name in (
                "ReadBatch", "WriteBatch"
            ):
                return value.fields["0"]
            return value
        if "(" in t and ("Input" in t or "Bound" in t) and isinstance(
            value, list
        ):
            inner = t[t.index("(") + 1:t.rindex(")")].split(",")
            return [
                tuple(
                    self._coerce(inner[i].strip(), item[i])
                    for i in range(len(item))
                ) if isinstance(item, (tuple, list)) else item
                for item in value
            ]
        return value

    def _invoke(self, recv, params, body, label, args, self_type=None):
        if len(args) != len(params):
            raise ExtractError(
                f"{label}: expected {len(params)} args, got {len(args)}"
            )
        env: dict[str, Any] = {
            pname: self._coerce(ptype, arg)
            for (pname, ptype), arg in zip(params, args)
        }
        if recv is not None:
            env["self"] = recv
        if self_type is not None:
            env["Self"] = self_type
        return self.run_fn_body(body, env)

    def run_fn_body(self, stmts: list, env: dict) -> Any:
        """Function-level body: `return` unwinds to here."""
        try:
            return self.run_body(stmts, env)
        except _Return as ret:
            return ret.value

    def run_body(self, stmts: list, env: dict) -> Any:
        """Block-level body: `return` propagates to the enclosing fn."""
        result = None
        for stmt in stmts:
            result = self.run_stmt(stmt, env)
        return result

    def run_stmt(self, stmt, env: dict) -> Any:
        op = stmt[0]
        if op == "let":
            env[stmt[1]] = self.eval(stmt[2], env)
            return None
        if op == "expr":
            self.eval(stmt[1], env)
            return None
        if op == "tail":
            return self.eval(stmt[1], env)
        if op == "ret":
            raise _Return(
                None if stmt[1] is None else self.eval(stmt[1], env)
            )
        if op == "if":
            if self.eval(stmt[1], env):
                return self.run_body(stmt[2], env)
            if stmt[3] is not None:
                return self.run_body(stmt[3], env)
            return None
        if op == "assign":
            target, value_expr = stmt[1], stmt[2]
            value = self.eval(value_expr, env)
            if target[0] == "field":
                obj = self.eval(target[1], env)
                if isinstance(obj, RsStruct):
                    obj.fields[target[2]] = value
                elif isinstance(obj, dict):
                    obj[target[2]] = value
                else:
                    raise ExtractError(f"cannot assign field on {obj!r}")
            elif target[0] == "path" and len(target[1]) == 1:
                env[target[1][0]] = value
            elif target[0] == "index":
                obj = self.eval(target[1], env)
                obj[self.eval(target[2], env)] = value
            else:
                raise ExtractError(f"bad assignment target {target!r}")
            return None
        if op == "for":
            names, it, body = stmt[1], stmt[2], stmt[3]
            seq = self.eval(it, env)
            if isinstance(seq, dict):
                seq = list(seq.items())
            if seq is None:
                # iterating None as empty would silently certify a
                # corpus real Rust would not produce
                raise ExtractError(f"for-loop over None: {it!r}")
            for item in seq:
                if len(names) == 1:
                    env[names[0]] = item
                else:
                    for n, v in zip(names, item):
                        env[n] = v
                self.run_body(body, env)
            return None
        if op == "iflet":
            value = self.eval(stmt[2], env)
            if value is not None:
                env[stmt[1]] = value
                return self.run_body(stmt[3], env)
            if stmt[4] is not None:
                return self.run_body(stmt[4], env)
            return None
        raise ExtractError(f"unknown rust statement {op!r}")

    # -- expressions ----------------------------------------------------

    def eval(self, node, env: dict) -> Any:
        op = node[0]
        if op == "lit":
            return node[1]
        if op == "self":
            return env["self"]
        if op == "path":
            segs = node[1]
            if len(segs) == 1:
                name = segs[0]
                if name in env:
                    return env[name]
                if name == "None":
                    return None
                if name == "Some":
                    return lambda v: v
                if name == "PhantomData":
                    return _PHANTOM
                if name == "Self" and "Self" in env:
                    return _SelfNs(self, env["Self"])
                return self.free(name)
            if segs[0] == "Self" and "Self" in env:
                segs = [env["Self"], *segs[1:]]
            return self.static_path(segs)
        if op == "call":
            fn = self.eval(node[1], env)
            args = [self.eval(a, env) for a in node[2]]
            if fn is None and not args:
                return None
            if not callable(fn):
                raise ExtractError(f"cannot call {fn!r}")
            return fn(*args)
        if op == "method":
            obj = self.eval(node[1], env)
            args = [self.eval(a, env) for a in node[3]]
            return self.call_method(obj, node[2], args)
        if op == "field":
            obj = self.eval(node[1], env)
            if isinstance(obj, (RsStruct,)):
                if node[2] in obj.fields:
                    return obj.fields[node[2]]
                raise ExtractError(
                    f"{obj.type_name} has no field {node[2]!r}"
                )
            if isinstance(obj, dict) and node[2] in obj:
                return obj[node[2]]
            raise ExtractError(f"cannot read field {node[2]!r} of {obj!r}")
        if op == "index":
            obj = self.eval(node[1], env)
            key = self.eval(node[2], env)
            return obj[key]
        if op == "structlit":
            name, fields = node[1], node[2]
            values = {}
            for fname, expr in fields:
                v = self.eval(expr, env)
                if v is not _PHANTOM:
                    values[fname] = v
            return RsStruct(name, values)
        if op == "json":
            return self.eval_json(node[1], env)
        if op == "vec":
            return [self.eval(item, env) for item in node[1]]
        if op == "closure":
            params, body = node[1], node[2]

            def fn(*args, _params=params, _body=body, _env=env):
                child = dict(_env)
                for p, a in zip(_params, args):
                    if isinstance(p, tuple):
                        for n, v in zip(p, a):
                            child[n] = v
                    else:
                        child[p] = a
                return self.run_fn_body(_body, child)

            return fn
        if op == "match":
            subject = self.eval(node[1], env)
            for pattern, result in node[2]:
                bound = self.match_pattern(pattern, subject)
                if bound is None:
                    continue
                child = dict(env)
                child.update(bound)
                if result[0] == "block":
                    return self.run_body(result[1], child)
                return self.eval(result[1], child)
            raise RsPanic(f"no match arm for {subject!r}")
        if op == "binop":
            bop = node[1]
            a = self.eval(node[2], env)
            if bop == "&&":
                return bool(a) and bool(self.eval(node[3], env))
            if bop == "||":
                return bool(a) or bool(self.eval(node[3], env))
            b = self.eval(node[3], env)
            return {
                "+": lambda: a + b, "-": lambda: a - b,
                "*": lambda: a * b, "/": lambda: a / b, "%": lambda: a % b,
                "==": lambda: a == b, "!=": lambda: a != b,
                "<": lambda: a < b, "<=": lambda: a <= b,
                ">": lambda: a > b, ">=": lambda: a >= b,
            }[bop]()
        if op == "unary":
            v = self.eval(node[2], env)
            return (-v) if node[1] == "-" else (not v)
        raise ExtractError(f"unknown rust expression {op!r}")

    def eval_json(self, node, env: dict) -> Any:
        kind = node[0]
        if kind == "jobj":
            out = {}
            for key_expr, val in node[1]:
                key = self.eval(key_expr, env)
                out[key] = self.eval_json(val, env)
            return out
        if kind == "jarr":
            return [self.eval_json(item, env) for item in node[1]]
        value = self.eval(node[1], env)
        return _to_value(value)

    # -- patterns -------------------------------------------------------

    def match_pattern(self, pattern, subject) -> dict | None:
        kind = pattern[0]
        if kind == "any":
            return {}
        if kind == "plit":
            return {} if subject == pattern[1] else None
        segs, bind = pattern[1], pattern[2]
        variant = segs[-1]
        type_name = segs[0] if len(segs) > 1 else None
        if type_name == "Value":
            checks = {
                "Null": lambda v: v is None,
                "Bool": lambda v: isinstance(v, bool),
                "Number": lambda v: isinstance(v, (int, float))
                and not isinstance(v, bool),
                "String": lambda v: isinstance(v, str),
                "Array": lambda v: isinstance(v, list),
                "Object": lambda v: isinstance(v, dict),
            }
            check = checks.get(variant)
            if check is None:
                raise ExtractError(f"unknown Value variant {variant}")
            if not check(subject):
                return None
            if bind is None:
                return {}
            return {bind: _NumberView(subject)
                    if variant == "Number" else subject}
        if isinstance(subject, RsEnum) and subject.variant == variant:
            if bind is None:
                return {}
            return {bind: subject.payload[0] if subject.payload else None}
        if variant == "Some" and subject is not None:
            return {bind: subject} if bind else {}
        if variant == "None" and subject is None:
            return {}
        return None

    # -- builtin methods -------------------------------------------------

    def _builtin_method(self, obj, name, args):
        if name in ("into", "as_ref"):
            return obj
        if name == "clone":
            # Rust's derive(Clone) deep-copies: an aliasing clone of a
            # builder (RsStruct/RsEnum) would let one traversal's push
            # mutate another's steps
            if isinstance(obj, (dict, list, RsStruct, RsEnum)):
                return copy.deepcopy(obj)
            return obj
        if name == "to_string":
            return str(obj)
        # serde Value probes (used by encode_property_value)
        if name == "is_string":
            return isinstance(obj, str)
        if name == "is_boolean":
            return isinstance(obj, bool)
        if name == "is_number":
            return isinstance(obj, (int, float)) and not isinstance(obj, bool)
        if name == "is_null":
            return obj is None
        if name in ("as_i64", "as_u64"):
            ok = isinstance(obj, int) and not isinstance(obj, bool)
            if name == "as_u64":
                ok = ok and obj >= 0
            return obj if ok else None
        if name == "as_f64":
            return (
                float(obj)
                if isinstance(obj, (int, float)) and not isinstance(obj, bool)
                else None
            )
        if name == "is_some":
            return obj is not None
        if name == "is_none":
            return obj is None
        if obj is None:
            # Option::None receivers
            if name == "map":
                return None
            if name == "unwrap_or":
                return args[0]
            if name in ("as_ref", "cloned"):
                return None
            raise ExtractError(f"Option::None.{name} unsupported")
        if name == "map" and not isinstance(obj, (list, dict)):
            return args[0](obj)  # Option::Some
        if name == "unwrap_or":
            return obj
        if isinstance(obj, list):
            if name in ("iter", "into_iter"):
                return obj
            if name == "map":
                return [args[0](v) for v in obj]
            if name == "collect":
                return obj
            if name == "push":
                obj.append(args[0])
                return None
            if name == "len":
                return len(obj)
            if name == "is_empty":
                return len(obj) == 0
            if name == "all":
                return all(args[0](v) for v in obj)
            if name == "any":
                return any(args[0](v) for v in obj)
            raise ExtractError(f"Vec.{name} unsupported")
        if isinstance(obj, dict):
            if name == "insert":
                obj[args[0]] = args[1]
                return None
            if name == "len":
                return len(obj)
            if name == "is_empty":
                return len(obj) == 0
            if name in ("iter", "into_iter"):
                return [(k, v) for k, v in obj.items()]
            raise ExtractError(f"Map.{name} unsupported")
        if isinstance(obj, str):
            if name == "len":
                return len(obj)
            if name == "is_empty":
                return obj == ""
            raise ExtractError(f"str.{name} unsupported")
        if isinstance(obj, _NumberView):
            if name == "is_i64" or name == "is_u64":
                return isinstance(obj.value, int)
            if name == "as_i64" or name == "as_u64":
                return obj.value if isinstance(obj.value, int) else None
            raise ExtractError(f"Number.{name} unsupported")
        raise ExtractError(
            f"cannot invoke {name!r} on {type(obj).__name__}"
        )


class _NumberView:
    """serde Number binding (is_i64/as_i64 surface)."""

    def __init__(self, value):
        self.value = value


def _to_value(v) -> Any:
    """json!-interpolation: serde's ToValue on our model."""
    if isinstance(v, _NumberView):
        return v.value
    if isinstance(v, RsStruct) or isinstance(v, RsEnum):
        raise ExtractError(f"cannot interpolate {v!r} into json!")
    if isinstance(v, list):
        return [_to_value(i) for i in v]
    if isinstance(v, dict):
        return {k: _to_value(val) for k, val in v.items()}
    return v


class _StructCtor:
    def __init__(self, module: RsModule, name: str):
        self.module = module
        self.name = name

    def __call__(self, *args):
        if self.name in self.module.tuple_structs:
            return RsStruct(self.name, {"0": args[0] if args else None})
        if not args:
            return RsStruct(self.name, {})
        raise ExtractError(f"{self.name} is not a tuple struct")


class _VariantCtor:
    def __init__(self, type_name: str, variant: str):
        self.type_name = type_name
        self.variant = variant

    def __call__(self, *args):
        return RsEnum(self.type_name, self.variant, tuple(args))


class _EnumNs:
    def __init__(self, module: RsModule, name: str):
        self.module = module
        self.name = name


class _SelfNs:
    def __init__(self, module: RsModule, type_name: str):
        self.module = module
        self.type_name = type_name


# ----------------------------------------------------- native extraction


class RsNativeShim:
    """Routes the Rust generator extraction through the interpreted
    Rust DSL module."""

    def __init__(self, sink, module: RsModule):
        self.sink = sink
        self.module = module

    def lookup(self, segs: list[str]):
        if len(segs) == 1:
            name = segs[0]
            if name == "write_fixture":
                return self._write_fixture
            if name == "None":
                return None
            if name == "Some":
                return lambda v: v
            return self.module.free(name)
        return self.module.static_path(segs)

    def _write_fixture(self, bucket: str, name: str, body: Any) -> None:
        if isinstance(body, RsStruct):
            body = self.module.call_method(body, "encode", [])
        self.sink.write(bucket, name, body)

    def attr(self, obj: Any, name: str):
        if isinstance(obj, RsStruct) and name in obj.fields:
            return obj.fields[name]
        return lambda *args, _o=obj, _n=name: self.method(_o, _n, list(args))

    def method(self, obj: Any, name: str, args: list):
        return self.module.call_method(obj, name, args)


def extract_native(src: str, sink) -> None:
    """Replay the Rust fixture generator through the interpreted DSL."""
    from pathlib import Path

    from .rustfe import extract as _rust_extract  # noqa: F401 (parser reuse)
    from . import rustfe

    dsl_src = (
        Path(__file__).resolve().parents[3] / "sdks/rust/src/dsl.rs"
    ).read_text()
    module = RsModule(dsl_src)
    shim = RsNativeShim(sink, module)
    rustfe.extract(src, sink, shim=shim)
