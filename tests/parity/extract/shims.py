"""Language shims: resolve generator-source names onto the Python DSL.

Each shim provides ``lookup(path_segments)``, ``attr(obj, name)`` and
``method(obj, name, args)`` for the evaluator.  Unknown names raise —
an SDK generator calling something the shim can't map is a finding,
not a skip.
"""

from __future__ import annotations

import re
from typing import Any

from helix_tpu import dsl as D
from .core import ExtractError


def _camel_to_snake(name: str) -> str:
    # acronym-aware: DropEdgeByID -> drop_edge_by_id
    s1 = re.sub(r"(.)([A-Z][a-z]+)", r"\1_\2", name)
    return re.sub(r"([a-z0-9])([A-Z])", r"\1_\2", s1).lower()


class FixtureSink:
    """Collects (bucket, name) -> encoded request."""

    def __init__(self):
        self.corpus: dict[tuple[str, str], Any] = {}

    def write(self, bucket: str, name: str, body: Any) -> None:
        key = (bucket, str(name))
        if key in self.corpus:
            raise ExtractError(f"duplicate fixture {key}")
        if hasattr(body, "encode"):
            body = body.encode()
        self.corpus[key] = body


class BaseShim:
    """Shared method dispatch with per-language alias tables."""

    #: name -> python name, or a callable (obj, *args) -> result
    METHOD_ALIASES: dict[str, Any] = {}
    #: path tuple -> value/callable
    GLOBALS: dict[str, Any] = {}

    def __init__(self, sink: FixtureSink):
        self.sink = sink

    def lookup(self, segs: list[str]) -> Any:
        cur = self.GLOBALS.get(segs[0])
        if cur is None:
            cur = self._root(segs[0])
        for seg in segs[1:]:
            cur = self.attr(cur, seg)
        return cur

    def _root(self, name: str) -> Any:
        raise ExtractError(f"unknown global {name!r}")

    def attr(self, obj: Any, name: str) -> Any:
        mapped = self.METHOD_ALIASES.get(name, name)
        if callable(mapped) and not isinstance(mapped, type):
            return lambda *args, _obj=obj: mapped(_obj, *args)
        got = getattr(obj, mapped, None)
        if got is None:
            raise ExtractError(
                f"{type(obj).__name__} has no attribute {name!r}"
            )
        return got

    def method(self, obj: Any, name: str, args: list) -> Any:
        return self.attr(obj, name)(*args)


# ------------------------------------------------------------------ Rust


def _with_parameter(req, name, ty, value):
    return req.with_parameter_type(name, ty).with_parameter_value(name, value)


def _vector_search_nodes_tenant(t, label, prop, vec, k, tenant):
    return t.vector_search_nodes(label, prop, vec, k, tenant)


def _vector_search_edges_tenant(t, label, prop, vec, k, tenant):
    return t.vector_search_edges(label, prop, vec, k, tenant)


def _text_search_nodes_tenant(t, label, prop, text, k, tenant):
    return t.text_search_nodes(label, prop, text, k, tenant)


def _text_search_edges_tenant(t, label, prop, text, k, tenant):
    return t.text_search_edges(label, prop, text, k, tenant)


_SHARED_ALIASES: dict[str, Any] = {
    "into": lambda obj: obj,
    "and": "and_",
    "or": "or_",
    "not": "not_",
    "as": "as_",
    "in": "in_",
    "where": "where_",
    "limit_by": "limit",
    "skip_by": "skip",
    "range_by": "range",
    "with_parameter": _with_parameter,
    "vector_search_nodes_tenant": _vector_search_nodes_tenant,
    "vector_search_edges_tenant": _vector_search_edges_tenant,
    "text_search_nodes_tenant": _text_search_nodes_tenant,
    "text_search_edges_tenant": _text_search_edges_tenant,
    "prev_not_empty": lambda _obj: D.BatchCondition.prev_not_empty,
}


class _RustIndexSpec:
    """Rust's node_equality carries the unique flag as an argument."""

    @staticmethod
    def node_equality(label, prop, unique=False):
        if unique:
            return D.IndexSpec.node_unique_equality(label, prop)
        return D.IndexSpec.node_equality(label, prop)

    def __getattr__(self, name):
        return getattr(D.IndexSpec, name)


class RustShim(BaseShim):
    METHOD_ALIASES = dict(_SHARED_ALIASES)

    def __init__(self, sink: FixtureSink):
        super().__init__(sink)
        self.GLOBALS = {
            "g": D.g,
            "sub": D.sub,
            "read_batch": D.read_batch,
            "write_batch": D.write_batch,
            "IndexSpec": _RustIndexSpec(),
            "Predicate": D.Predicate,
            "SourcePredicate": D.SourcePredicate,
            "NodeRef": D.NodeRef,
            "EdgeRef": D.EdgeRef,
            "Expr": D.Expr,
            "Projection": D.Projection,
            "RepeatConfig": D.RepeatConfig,
            "BatchCondition": D.BatchCondition,
            "BindingRef": D.BindingRef,
            "BindingProjection": D.BindingProjection,
            "PropertyValue": D.PropertyValue,
            "StreamBound": D.StreamBound,
            "f32_array": lambda vals: D.PropertyValue.f32_array(list(vals)),
            "f32_value": D.PropertyValue.f32,
            "datetime_millis": D.PropertyValue.date_time,
            "bytes_value": lambda vals: D.PropertyValue.bytes(bytes(vals)),
            "write_fixture": self._write_fixture,
        }

    def _write_fixture(self, bucket: str, name: str, body: Any) -> None:
        self.sink.write(bucket, name, body)


# -------------------------------------------------------------- TypeScript


def _ts_push(lst, item):
    lst.append(item)
    return None


class TsShim(BaseShim):
    """camelCase method names map onto the Python DSL's snake_case."""

    METHOD_ALIASES = dict(
        _SHARED_ALIASES,
        var_="var",
        push=_ts_push,
        pad_start=lambda s, width, fill=" ": s.rjust(width, fill),
    )

    def __init__(self, sink: FixtureSink):
        super().__init__(sink)
        self.GLOBALS = {
            "String": str,
            "g": D.g,
            "sub": D.sub,
            "readBatch": D.read_batch,
            "writeBatch": D.write_batch,
            "IndexSpec": D.IndexSpec,
            "Predicate": D.Predicate,
            "SourcePredicate": D.SourcePredicate,
            "NodeRef": D.NodeRef,
            "EdgeRef": D.EdgeRef,
            "Expr": D.Expr,
            "Projection": D.Projection,
            "PropertyValue": D.PropertyValue,
            "RepeatConfig": D.RepeatConfig,
            "BatchCondition": D.BatchCondition,
            "BindingRef": D.BindingRef,
            "BindingProjection": D.BindingProjection,
            "DynamicQueryRequest": D.DynamicQueryRequest,
            "defineParams": D.define_params,
            "param": D.param,
        }

    def attr(self, obj: Any, name: str) -> Any:
        snake = _camel_to_snake(name)
        mapped = self.METHOD_ALIASES.get(snake, snake)
        if callable(mapped) and not isinstance(mapped, type):
            return lambda *args, _obj=obj: mapped(_obj, *args)
        # TS spells Python-reserved names with a trailing underscore
        # (var_, case_) and vice versa (in, as) — try both directions.
        for cand in (mapped, name, snake.rstrip("_"), snake + "_"):
            got = getattr(obj, cand, None)
            if got is not None:
                return got
        raise ExtractError(
            f"{type(obj).__name__} has no attribute {name!r} "
            f"(tried {mapped!r})"
        )


# --------------------------------------------------------------------- Go


def _pairs_from_structs(entries):
    return [(p["Key"], p["Value"]) for p in entries]


def _go_add_n_ordered(t, label, pairs):
    return t.add_n(label, _pairs_from_structs(pairs))


def _go_add_e_ordered(t, label, to, pairs):
    return t.add_e(label, to, _pairs_from_structs(pairs))


def _go_case(whenthens, default=None):
    return D.Expr.case(
        [(w["When"], w["Then"]) for w in whenthens], default
    )


class _GoSub:
    """Go spells sub-traversals as full ``helix.G()`` chains; adapt to
    the SubTraversal steps/encode contract."""

    def __init__(self, traversal):
        steps = traversal.steps
        self.steps = list(steps() if callable(steps) else steps)

    def encode(self):
        return {"steps": list(self.steps)}


def _go_subwrap(t):
    return t if hasattr(t, "encode") else _GoSub(t)


def _go_union(t, *subs):
    return t.union([_go_subwrap(s) for s in subs])


def _go_coalesce(t, *subs):
    return t.coalesce([_go_subwrap(s) for s in subs])


def _go_choose(t, pred, then, else_=None):
    return t.choose(
        pred, _go_subwrap(then),
        _go_subwrap(else_) if else_ is not None else None,
    )


def _go_optional(t, sub_t):
    return t.optional(_go_subwrap(sub_t))


def _go_repeat_cfg(sub_t):
    return D.RepeatConfig(_go_subwrap(sub_t))


class GoShim(BaseShim):
    """``helix.PascalCase`` free functions + PascalCase methods."""

    METHOD_ALIASES = dict(
        _SHARED_ALIASES,
        add_n_ordered=_go_add_n_ordered,
        add_e_ordered=_go_add_e_ordered,
        i_ds="id",
        ids="id",
        returning=lambda batch, *names: batch.returning(list(names)),
        values=lambda t, *props: t.values(list(props)),
        project=lambda t, *ps: t.project(list(ps)),
        union=_go_union,
        coalesce=_go_coalesce,
        choose=_go_choose,
        optional=_go_optional,
        # Go spells "no label" / "no tenant" as "" (no Option type)
        out=lambda t, label="": t.out(label or None),
        both=lambda t, label="": t.both(label or None),
        out_e=lambda t, label="": t.out_e(label or None),
        in_e=lambda t, label="": t.in_e(label or None),
        both_e=lambda t, label="": t.both_e(label or None),
        create_vector_index_nodes=lambda t, l, p, ten="": (
            t.create_vector_index_nodes(l, p, ten or None)),
        create_vector_index_edges=lambda t, l, p, ten="": (
            t.create_vector_index_edges(l, p, ten or None)),
        create_text_index_nodes=lambda t, l, p, ten="": (
            t.create_text_index_nodes(l, p, ten or None)),
        create_text_index_edges=lambda t, l, p, ten="": (
            t.create_text_index_edges(l, p, ten or None)),
        **{"in": lambda t, label="": t.in_(label or None)},
        **{"and": lambda _o, *ps: D.Predicate.and_(list(ps)),
           "or": lambda _o, *ps: D.Predicate.or_(list(ps))},
    )

    # helix.<Name> free functions that aren't method-style
    _FREE = {
        "G": lambda: D.g(),
        "Sub": lambda: D.sub(),
        "ReadBatch": D.read_batch,
        "WriteBatch": D.write_batch,
        "Read": D.DynamicQueryRequest.read,
        "Write": D.DynamicQueryRequest.write,
        "NodeEqualityIndex": _RustIndexSpec.node_equality,
        "NewRepeat": _go_repeat_cfg,
        "NodeRangeIndex": D.IndexSpec.node_range,
        "NodeRangeDescIndex": D.IndexSpec.node_range_desc,
        "EdgeEqualityIndex": D.IndexSpec.edge_equality,
        "EdgeRangeIndex": D.IndexSpec.edge_range,
        "EdgeRangeDescIndex": D.IndexSpec.edge_range_desc,
        "NodeVectorIndex": lambda label, prop, tenant="": (
            D.IndexSpec.node_vector(label, prop, tenant or None)
        ),
        "NodeTextIndex": lambda label, prop, tenant="": (
            D.IndexSpec.node_text(label, prop, tenant or None)
        ),
        "EdgeVectorIndex": lambda label, prop, tenant="": (
            D.IndexSpec.edge_vector(label, prop, tenant or None)
        ),
        "EdgeTextIndex": lambda label, prop, tenant="": (
            D.IndexSpec.edge_text(label, prop, tenant or None)
        ),
        "NodeVar": D.NodeRef.var,
        "NodeParam": D.NodeRef.param,
        "NodeIds": lambda ids: D.NodeRef.ids(list(ids)),
        "NodeAll": D.NodeRef.all,
        "EdgeVar": D.EdgeRef.var,
        "EdgeIds": lambda ids: D.EdgeRef.ids(list(ids)),
        "EdgeParam": D.EdgeRef.param,
        "Eq": D.SourcePredicate.eq,
        "F32Array": lambda vals: D.PropertyValue.f32_array(list(vals)),
        "F32Value": D.PropertyValue.f32,
        "DatetimeMillis": D.PropertyValue.date_time,
        "BytesValue": lambda vals: D.PropertyValue.bytes(bytes(vals)),
        "Prop": D.Expr.prop,
        "Val": D.Expr.val,
        "Param": D.Expr.param,
        "ExprID": D.Expr.id,
        "Timestamp": D.Expr.timestamp,
        "DateTimeNow": D.Expr.date_time_now,
        "F32": D.PropertyValue.f32,
        "Bytes": lambda vals: D.PropertyValue.bytes(bytes(vals)),
        "DateTimeMillis": D.PropertyValue.date_time,
        "NodeIDs": lambda *ids: D.NodeRef.ids(
            list(ids[0]) if len(ids) == 1 and isinstance(ids[0], (list, tuple))
            else list(ids)
        ),
        "EdgeIDs": lambda *ids: D.EdgeRef.ids(
            list(ids[0]) if len(ids) == 1 and isinstance(ids[0], (list, tuple))
            else list(ids)
        ),
        "NodeRangeIndexDesc": D.IndexSpec.node_range_desc,
        "Case": _go_case,
        "HasKeyPred": D.Predicate.has_key,
        "ProjectProp": D.Projection.property,
        "ProjectExpr": D.Projection.expr,
        "ProjectFrom": D.Projection.from_endpoint,
        "ProjectTo": D.Projection.to_endpoint,
        "Current": "Current",
        "Binding": lambda name: {"Binding": name},
        "BindingProp": D.BindingProjection.property,
        "BindingCoalesce": D.BindingProjection.coalesce,
        "BindingRefOf": lambda target, source: {
            "target": target, "source": source,
        },
    }

    def __init__(self, sink: FixtureSink):
        super().__init__(sink)
        self.GLOBALS = {"helix": self}

    def _root(self, name: str) -> Any:
        raise ExtractError(f"unknown Go global {name!r}")

    def helix_attr(self, name: str) -> Any:
        if name in self._FREE:
            return self._FREE[name]
        # Pascal method-style statics on DSL classes
        snake = _camel_to_snake(name)
        mapped = self.METHOD_ALIASES.get(snake, snake)
        if callable(mapped) and not isinstance(mapped, type):
            return lambda *args: mapped(None, *args)
        for cls in (D.Predicate, D.Expr, D.Projection, D.RepeatConfig,
                    D.BatchCondition, D.IndexSpec):
            if hasattr(cls, mapped):
                return getattr(cls, mapped)
        raise ExtractError(f"unknown helix.{name}")

    def attr(self, obj: Any, name: str) -> Any:
        if obj is self:  # helix.<name>
            return self.helix_attr(name)
        if isinstance(obj, dict) and name in obj:  # struct field access
            return obj[name]
        snake = _camel_to_snake(name)
        mapped = self.METHOD_ALIASES.get(snake, snake)
        if callable(mapped) and not isinstance(mapped, type):
            return lambda *args, _obj=obj: mapped(_obj, *args)
        got = getattr(obj, mapped, None)
        if got is None:
            raise ExtractError(
                f"{type(obj).__name__} has no attribute {name!r} "
                f"(tried {mapped!r})"
            )
        return got
