//! Query-builder DSL emitting wire-format JSON directly.
//!
//! Every builder method encodes its step eagerly into a
//! `serde_json::Value`, so a built traversal *is* its wire
//! representation (the same design as the Python SDK — unlike the
//! reference SDK, which builds a typed AST and serializes at the end;
//! reference step catalog: `sdks/rust/src/dsl.rs:2795-3262`).
//! u64 ids are preserved losslessly by `serde_json`.
//!
//! Invalid chains are compile errors via typestate
//! (`Traversal<S, M>`, reference analog `dsl.rs:3304`):
//!
//! - `S` tracks the stream kind: [`Start`] (no source yet), [`Nodes`],
//!   [`Edges`], [`Done`] (terminal emitted).  `out_n()` on a node
//!   stream, `out()` on an edge stream, or any step after a terminal
//!   does not compile.
//! - `M` tracks the mode: [`Read`] or [`Write`].  Mutating steps flip
//!   `M` to `Write`; `read_batch().var_as(..)` only accepts
//!   `Traversal<_, Read>`, so a write inside a read batch is a type
//!   error (reference `dsl.rs:4476-4477`).

use std::marker::PhantomData;

use serde_json::{json, Map, Value};

// ---------------------------------------------------------------------
// typestate markers
// ---------------------------------------------------------------------

/// Stream state: no source step yet.
pub struct Start;
/// Stream state: current elements are nodes.
pub struct Nodes;
/// Stream state: current elements are edges.
pub struct Edges;
/// Stream state: a terminal has been emitted; no further steps.
pub struct Done;

/// Mode: read-only traversal.
pub struct Read;
/// Mode: traversal contains at least one mutation.
pub struct Write;

/// States that still carry a live element stream (nodes or edges).
pub trait ActiveStream {}
impl ActiveStream for Nodes {}
impl ActiveStream for Edges {}

// ---------------------------------------------------------------------
// expressions
// ---------------------------------------------------------------------

/// Encoded expression node (reference `dsl.rs:1390-1422`).
#[derive(Debug, Clone)]
pub struct Expr(pub Value);

impl Expr {
    pub fn prop(name: &str) -> Expr {
        Expr(json!({ "Property": name }))
    }
    pub fn val(value: Value) -> Expr {
        Expr(json!({ "Constant": encode_property_value(value) }))
    }
    pub fn param(name: &str) -> Expr {
        Expr(json!({ "Param": name }))
    }
    pub fn id() -> Expr {
        Expr(json!("Id"))
    }
    pub fn timestamp() -> Expr {
        Expr(json!("Timestamp"))
    }
    pub fn date_time_now() -> Expr {
        Expr(json!("DateTimeNow"))
    }
    fn bin(self, tag: &str, other: Expr) -> Expr {
        Expr(json!({ tag: [self.0, other.0] }))
    }
    pub fn add(self, other: Expr) -> Expr {
        self.bin("Add", other)
    }
    pub fn sub(self, other: Expr) -> Expr {
        self.bin("Sub", other)
    }
    pub fn mul(self, other: Expr) -> Expr {
        self.bin("Mul", other)
    }
    pub fn div(self, other: Expr) -> Expr {
        self.bin("Div", other)
    }
    pub fn modulo(self, other: Expr) -> Expr {
        self.bin("Mod", other)
    }
    pub fn neg(self) -> Expr {
        Expr(json!({ "Neg": self.0 }))
    }
    pub fn case(when_then: Vec<(Predicate, Expr)>, else_expr: Option<Expr>) -> Expr {
        let pairs: Vec<Value> = when_then
            .into_iter()
            .map(|(p, e)| json!([p.0, e.0]))
            .collect();
        Expr(json!({ "Case": {
            "when_then": pairs,
            "else_expr": else_expr.map(|e| e.0),
        }}))
    }
}

// ---------------------------------------------------------------------
// values
// ---------------------------------------------------------------------

fn is_property_tag(tag: &str) -> bool {
    tag == "Null" || tag == "Bool" || tag == "I64" || tag == "DateTime"
        || tag == "F64" || tag == "F32" || tag == "String" || tag == "Bytes"
        || tag == "I64Array" || tag == "F64Array" || tag == "F32Array"
        || tag == "StringArray" || tag == "Array" || tag == "Object"
}

/// Already-encoded PropertyValues pass through coercion unchanged —
/// the other SDKs' tagged-value recognition (Python
/// `PropertyValue.is_encoded`, Go's `Tagged` branch, TS `isTagged`).
/// Without this, the pinning wrappers below (`f32_array`, `f32_value`,
/// `datetime_millis`, `bytes_value`) would re-encode as an `Object`
/// property and silently break cross-SDK wire parity (caught by the
/// interpreted-serializer replay, tests/test_sdk_serializers.py).
fn is_encoded(value: &Value) -> bool {
    match value {
        Value::String(s) => s == "Null",
        Value::Object(map) => {
            if map.len() != 1 {
                return false;
            }
            let mut tagged = false;
            for (k, _v) in map {
                tagged = is_property_tag(k);
            }
            tagged
        }
        _ => false,
    }
}

/// Coerce a plain JSON value into an encoded `PropertyValue`
/// (reference variants `dsl.rs:973-1002`).
///
/// Coercion matches the other SDKs: null/bool/i64/f64/string map to
/// their variants; homogeneous string/int arrays become typed arrays,
/// mixed numeric arrays become `F64Array`, other arrays become `Array`;
/// objects become `Object`.  Use the explicit wrappers (`f32_array`,
/// `f32_value`, `bytes_value`, `datetime_millis`) to pin non-default
/// variants.
pub fn encode_property_value(value: Value) -> Value {
    if is_encoded(&value) {
        return value;
    }
    match value {
        Value::Null => json!("Null"),
        Value::Bool(b) => json!({ "Bool": b }),
        Value::Number(n) => {
            if n.is_i64() || n.is_u64() {
                json!({ "I64": n })
            } else {
                json!({ "F64": n })
            }
        }
        Value::String(s) => json!({ "String": s }),
        Value::Array(items) => {
            if !items.is_empty() && items.iter().all(|v| v.is_string()) {
                json!({ "StringArray": items })
            } else if !items.is_empty()
                && items
                    .iter()
                    .all(|v| v.as_i64().is_some() || v.as_u64().is_some())
            {
                json!({ "I64Array": items })
            } else if !items.is_empty() && items.iter().all(|v| v.is_number()) {
                json!({ "F64Array": items })
            } else {
                let encoded: Vec<Value> =
                    items.into_iter().map(encode_property_value).collect();
                json!({ "Array": encoded })
            }
        }
        Value::Object(map) => {
            let mut out = Map::new();
            for (k, v) in map {
                out.insert(k, encode_property_value(v));
            }
            json!({ "Object": out })
        }
    }
}

/// Pin an `F32Array` (vector) property value.
pub fn f32_array(values: &[f32]) -> Value {
    json!({ "F32Array": values })
}

/// Pin an `F32` property value.
pub fn f32_value(value: f32) -> Value {
    json!({ "F32": value })
}

/// Pin a `DateTime` (epoch millis) property value.
pub fn datetime_millis(millis: i64) -> Value {
    json!({ "DateTime": millis })
}

/// Pin a `Bytes` property value.
pub fn bytes_value(bytes: &[u8]) -> Value {
    json!({ "Bytes": bytes })
}

/// A value-or-expression input slot (reference `PropertyInput`).
pub enum Input {
    Value(Value),
    Expr(Expr),
}

impl Input {
    fn encode(self) -> Value {
        match self {
            Input::Value(v) => json!({ "Value": encode_property_value(v) }),
            Input::Expr(e) => json!({ "Expr": e.0 }),
        }
    }
}

impl From<Value> for Input {
    fn from(v: Value) -> Input {
        Input::Value(v)
    }
}

impl From<Expr> for Input {
    fn from(e: Expr) -> Input {
        Input::Expr(e)
    }
}

/// Literal-or-expression stream bound (reference `dsl.rs:1496`).
pub enum Bound {
    Literal(u64),
    Expr(Expr),
}

impl Bound {
    fn encode(self) -> Value {
        match self {
            Bound::Literal(n) => json!({ "Literal": n }),
            Bound::Expr(e) => json!({ "Expr": e.0 }),
        }
    }
}

impl From<u64> for Bound {
    fn from(n: u64) -> Bound {
        Bound::Literal(n)
    }
}

impl From<Expr> for Bound {
    fn from(e: Expr) -> Bound {
        Bound::Expr(e)
    }
}

// ---------------------------------------------------------------------
// predicates
// ---------------------------------------------------------------------

/// Encoded filter predicate (reference `dsl.rs:1586-1648`, 28 variants).
#[derive(Debug, Clone)]
pub struct Predicate(pub Value);

impl Predicate {
    fn cmp(tag: &str, prop: &str, value: Value) -> Predicate {
        Predicate(json!({ tag: [prop, encode_property_value(value)] }))
    }
    fn cmp_expr(tag: &str, prop: &str, expr: Expr) -> Predicate {
        let mut map = Map::new();
        map.insert(tag.to_string(), json!([prop, expr.0]));
        Predicate(Value::Object(map))
    }
    pub fn eq(prop: &str, value: Value) -> Predicate {
        Self::cmp("Eq", prop, value)
    }
    pub fn neq(prop: &str, value: Value) -> Predicate {
        Self::cmp("Neq", prop, value)
    }
    pub fn gt(prop: &str, value: Value) -> Predicate {
        Self::cmp("Gt", prop, value)
    }
    pub fn gte(prop: &str, value: Value) -> Predicate {
        Self::cmp("Gte", prop, value)
    }
    pub fn lt(prop: &str, value: Value) -> Predicate {
        Self::cmp("Lt", prop, value)
    }
    pub fn lte(prop: &str, value: Value) -> Predicate {
        Self::cmp("Lte", prop, value)
    }
    pub fn eq_expr(prop: &str, expr: Expr) -> Predicate {
        Self::cmp_expr("EqExpr", prop, expr)
    }
    pub fn neq_expr(prop: &str, expr: Expr) -> Predicate {
        Self::cmp_expr("NeqExpr", prop, expr)
    }
    pub fn gt_expr(prop: &str, expr: Expr) -> Predicate {
        Self::cmp_expr("GtExpr", prop, expr)
    }
    pub fn gte_expr(prop: &str, expr: Expr) -> Predicate {
        Self::cmp_expr("GteExpr", prop, expr)
    }
    pub fn lt_expr(prop: &str, expr: Expr) -> Predicate {
        Self::cmp_expr("LtExpr", prop, expr)
    }
    pub fn lte_expr(prop: &str, expr: Expr) -> Predicate {
        Self::cmp_expr("LteExpr", prop, expr)
    }
    pub fn eq_param(prop: &str, name: &str) -> Predicate {
        Self::cmp_expr("EqExpr", prop, Expr::param(name))
    }
    pub fn gt_param(prop: &str, name: &str) -> Predicate {
        Self::cmp_expr("GtExpr", prop, Expr::param(name))
    }
    pub fn between(prop: &str, lo: Value, hi: Value) -> Predicate {
        Predicate(json!({ "Between": [
            prop, encode_property_value(lo), encode_property_value(hi),
        ]}))
    }
    pub fn has_key(prop: &str) -> Predicate {
        Predicate(json!({ "HasKey": prop }))
    }
    pub fn is_null(prop: &str) -> Predicate {
        Predicate(json!({ "IsNull": prop }))
    }
    pub fn is_not_null(prop: &str) -> Predicate {
        Predicate(json!({ "IsNotNull": prop }))
    }
    pub fn starts_with(prop: &str, prefix: &str) -> Predicate {
        Predicate(json!({ "StartsWith": [prop, prefix] }))
    }
    pub fn ends_with(prop: &str, suffix: &str) -> Predicate {
        Predicate(json!({ "EndsWith": [prop, suffix] }))
    }
    pub fn contains(prop: &str, needle: &str) -> Predicate {
        Predicate(json!({ "Contains": [prop, needle] }))
    }
    pub fn contains_expr(prop: &str, expr: Expr) -> Predicate {
        Predicate(json!({ "ContainsExpr": [prop, expr.0] }))
    }
    pub fn is_in(prop: &str, values: Value) -> Predicate {
        Predicate(json!({ "IsIn": [prop, encode_property_value(values)] }))
    }
    pub fn is_in_expr(prop: &str, expr: Expr) -> Predicate {
        Predicate(json!({ "IsInExpr": [prop, expr.0] }))
    }
    pub fn and(predicates: Vec<Predicate>) -> Predicate {
        let nodes: Vec<Value> = predicates.into_iter().map(|p| p.0).collect();
        Predicate(json!({ "And": nodes }))
    }
    pub fn or(predicates: Vec<Predicate>) -> Predicate {
        let nodes: Vec<Value> = predicates.into_iter().map(|p| p.0).collect();
        Predicate(json!({ "Or": nodes }))
    }
    pub fn not(predicate: Predicate) -> Predicate {
        Predicate(json!({ "Not": predicate.0 }))
    }
    pub fn compare(left: Expr, op: &str, right: Expr) -> Predicate {
        Predicate(json!({ "Compare": {
            "left": left.0, "op": op, "right": right.0,
        }}))
    }
    pub fn contains_param(prop: &str, name: &str) -> Predicate {
        Self::contains_expr(prop, Expr::param(name))
    }
    pub fn is_in_param(prop: &str, name: &str) -> Predicate {
        Self::is_in_expr(prop, Expr::param(name))
    }
}

/// Index-friendly predicate subset for `NWhere`/`EWhere` sources —
/// the variants the planner can push into index lookups (reference
/// `dsl.rs:1650-1697`: no Not/Contains/EndsWith/IsNull/IsIn/Compare).
pub struct SourcePredicate;

impl SourcePredicate {
    pub fn eq(prop: &str, value: Value) -> Predicate {
        Predicate::eq(prop, value)
    }
    pub fn neq(prop: &str, value: Value) -> Predicate {
        Predicate::neq(prop, value)
    }
    pub fn gt(prop: &str, value: Value) -> Predicate {
        Predicate::gt(prop, value)
    }
    pub fn gte(prop: &str, value: Value) -> Predicate {
        Predicate::gte(prop, value)
    }
    pub fn lt(prop: &str, value: Value) -> Predicate {
        Predicate::lt(prop, value)
    }
    pub fn lte(prop: &str, value: Value) -> Predicate {
        Predicate::lte(prop, value)
    }
    pub fn between(prop: &str, lo: Value, hi: Value) -> Predicate {
        Predicate::between(prop, lo, hi)
    }
    pub fn starts_with(prop: &str, prefix: &str) -> Predicate {
        Predicate::starts_with(prop, prefix)
    }
    pub fn has_key(prop: &str) -> Predicate {
        Predicate::has_key(prop)
    }
    pub fn is_not_null(prop: &str) -> Predicate {
        Predicate::is_not_null(prop)
    }
    pub fn and(predicates: Vec<Predicate>) -> Predicate {
        Predicate::and(predicates)
    }
    pub fn or(predicates: Vec<Predicate>) -> Predicate {
        Predicate::or(predicates)
    }
}

// ---------------------------------------------------------------------
// references / specs / projections
// ---------------------------------------------------------------------

/// Node source references (reference `dsl.rs:1263`).
pub struct NodeRef;

impl NodeRef {
    pub fn all() -> Value {
        json!("All")
    }
    pub fn ids(ids: &[u64]) -> Value {
        json!({ "Ids": ids })
    }
    pub fn var(name: &str) -> Value {
        json!({ "Var": name })
    }
    pub fn param(name: &str) -> Value {
        json!({ "Param": name })
    }
}

/// Edge source references (reference `dsl.rs:1330`).
pub struct EdgeRef;

impl EdgeRef {
    pub fn ids(ids: &[u64]) -> Value {
        json!({ "Ids": ids })
    }
    pub fn var(name: &str) -> Value {
        json!({ "Var": name })
    }
    pub fn param(name: &str) -> Value {
        json!({ "Param": name })
    }
}

/// Index specifications (reference `dsl.rs:2580-2658`, 8 kinds).
pub struct IndexSpec;

impl IndexSpec {
    pub fn node_equality(label: &str, property: &str, unique: bool) -> Value {
        json!({ "NodeEquality": {
            "label": label, "property": property, "unique": unique,
        }})
    }
    pub fn edge_equality(label: &str, property: &str) -> Value {
        json!({ "EdgeEquality": { "label": label, "property": property } })
    }
    fn range(tag: &str, label: &str, property: &str, direction: &str) -> Value {
        let mut fields = Map::new();
        fields.insert("label".into(), json!(label));
        fields.insert("property".into(), json!(property));
        if direction != "Asc" {
            fields.insert("direction".into(), json!(direction));
        }
        json!({ tag: fields })
    }
    pub fn node_range(label: &str, property: &str) -> Value {
        Self::range("NodeRange", label, property, "Asc")
    }
    pub fn node_range_desc(label: &str, property: &str) -> Value {
        Self::range("NodeRange", label, property, "Desc")
    }
    pub fn edge_range(label: &str, property: &str) -> Value {
        Self::range("EdgeRange", label, property, "Asc")
    }
    pub fn edge_range_desc(label: &str, property: &str) -> Value {
        Self::range("EdgeRange", label, property, "Desc")
    }
    fn tenant(tag: &str, label: &str, property: &str, t: Option<&str>) -> Value {
        let mut fields = Map::new();
        fields.insert("label".into(), json!(label));
        fields.insert("property".into(), json!(property));
        if let Some(t) = t {
            fields.insert("tenant_property".into(), json!(t));
        }
        json!({ tag: fields })
    }
    pub fn node_vector(label: &str, property: &str, tenant: Option<&str>) -> Value {
        Self::tenant("NodeVector", label, property, tenant)
    }
    pub fn node_text(label: &str, property: &str, tenant: Option<&str>) -> Value {
        Self::tenant("NodeText", label, property, tenant)
    }
    pub fn edge_vector(label: &str, property: &str, tenant: Option<&str>) -> Value {
        Self::tenant("EdgeVector", label, property, tenant)
    }
    pub fn edge_text(label: &str, property: &str, tenant: Option<&str>) -> Value {
        Self::tenant("EdgeText", label, property, tenant)
    }
}

/// `Project` entries (reference `dsl.rs:2039-2063`).
pub struct Projection;

impl Projection {
    pub fn property(source: &str, alias: &str) -> Value {
        json!({ "source": source, "alias": alias })
    }
    pub fn from_endpoint(source: &str, alias: &str) -> Value {
        json!({ "source": format!("$from.{source}"), "alias": alias })
    }
    pub fn to_endpoint(source: &str, alias: &str) -> Value {
        json!({ "source": format!("$to.{source}"), "alias": alias })
    }
    pub fn expr(alias: &str, expr: Expr) -> Value {
        json!({ "alias": alias, "expr": expr.0 })
    }
}

/// Row-binding projection entries for `ProjectBindings`
/// (reference `dsl.rs:2132-2150`, wire v5).
pub struct BindingProjection;

impl BindingProjection {
    pub fn current(source: &str, alias: &str) -> Value {
        json!({ "kind": "Property", "target": "Current",
                "source": source, "alias": alias })
    }
    pub fn binding(name: &str, source: &str, alias: &str) -> Value {
        json!({ "kind": "Property", "target": { "Binding": name },
                "source": source, "alias": alias })
    }
    pub fn coalesce(refs: Vec<Value>, alias: &str) -> Value {
        json!({ "kind": "Coalesce", "refs": refs, "alias": alias })
    }
}

/// A (target, source) reference used by binding coalesce projections.
pub struct BindingRef;

impl BindingRef {
    pub fn current(source: &str) -> Value {
        json!({ "target": "Current", "source": source })
    }
    pub fn binding(name: &str, source: &str) -> Value {
        json!({ "target": { "Binding": name }, "source": source })
    }
}

// ---------------------------------------------------------------------
// sub-traversals and repeat config
// ---------------------------------------------------------------------

/// A branch traversal for union/choose/coalesce/optional/repeat bodies.
/// Branches are mode-checked at runtime by the engine; the builder
/// keeps them read-shaped (no mutation methods are exposed here).
#[derive(Debug, Clone, Default)]
pub struct SubTraversal {
    pub steps: Vec<Value>,
}

/// Start an empty branch traversal.
pub fn sub() -> SubTraversal {
    SubTraversal::default()
}

impl SubTraversal {
    fn push(mut self, step: Value) -> SubTraversal {
        self.steps.push(step);
        self
    }
    pub fn encode(&self) -> Value {
        json!({ "steps": self.steps })
    }

    pub fn out(self, label: Option<&str>) -> SubTraversal {
        self.push(json!({ "Out": label }))
    }
    pub fn in_(self, label: Option<&str>) -> SubTraversal {
        self.push(json!({ "In": label }))
    }
    pub fn both(self, label: Option<&str>) -> SubTraversal {
        self.push(json!({ "Both": label }))
    }
    pub fn out_e(self, label: Option<&str>) -> SubTraversal {
        self.push(json!({ "OutE": label }))
    }
    pub fn in_e(self, label: Option<&str>) -> SubTraversal {
        self.push(json!({ "InE": label }))
    }
    pub fn both_e(self, label: Option<&str>) -> SubTraversal {
        self.push(json!({ "BothE": label }))
    }
    pub fn out_n(self) -> SubTraversal {
        self.push(json!("OutN"))
    }
    pub fn in_n(self) -> SubTraversal {
        self.push(json!("InN"))
    }
    pub fn other_n(self) -> SubTraversal {
        self.push(json!("OtherN"))
    }
    pub fn has(self, prop: &str, value: Value) -> SubTraversal {
        self.push(json!({ "Has": [prop, encode_property_value(value)] }))
    }
    pub fn has_label(self, label: &str) -> SubTraversal {
        self.push(json!({ "HasLabel": label }))
    }
    pub fn where_(self, predicate: Predicate) -> SubTraversal {
        self.push(json!({ "Where": predicate.0 }))
    }
    pub fn dedup(self) -> SubTraversal {
        self.push(json!("Dedup"))
    }
    pub fn limit(self, n: u64) -> SubTraversal {
        self.push(json!({ "Limit": n }))
    }
    pub fn value_map(self, props: Option<&[&str]>) -> SubTraversal {
        self.push(json!({ "ValueMap": props }))
    }
}

/// `Repeat` configuration builder (reference `dsl.rs:2503-2576`).
#[derive(Debug, Clone)]
pub struct RepeatConfig {
    traversal: SubTraversal,
    times: Option<u64>,
    until: Option<Predicate>,
    emit: &'static str,
    emit_predicate: Option<Predicate>,
    max_depth: u64,
}

impl RepeatConfig {
    pub fn new(traversal: SubTraversal) -> RepeatConfig {
        RepeatConfig {
            traversal,
            times: None,
            until: None,
            emit: "None",
            emit_predicate: None,
            max_depth: 100,
        }
    }
    pub fn times(mut self, n: u64) -> Self {
        self.times = Some(n);
        self
    }
    pub fn until(mut self, predicate: Predicate) -> Self {
        self.until = Some(predicate);
        self
    }
    pub fn emit_all(mut self) -> Self {
        self.emit = "All";
        self
    }
    pub fn emit_before(mut self) -> Self {
        self.emit = "Before";
        self
    }
    pub fn emit_after(mut self) -> Self {
        self.emit = "After";
        self
    }
    pub fn emit_if(mut self, predicate: Predicate) -> Self {
        self.emit = "After";
        self.emit_predicate = Some(predicate);
        self
    }
    pub fn max_depth(mut self, depth: u64) -> Self {
        self.max_depth = depth;
        self
    }
    pub fn encode(&self) -> Value {
        json!({
            "traversal": { "steps": self.traversal.steps },
            "times": self.times,
            "until": self.until.as_ref().map(|p| p.0.clone()),
            "emit": self.emit,
            "emit_predicate": self.emit_predicate.as_ref().map(|p| p.0.clone()),
            "max_depth": self.max_depth,
        })
    }
}

// ---------------------------------------------------------------------
// the typestate traversal
// ---------------------------------------------------------------------

/// An immutable step chain; every method returns a new traversal with
/// the stream/mode transition recorded in its type.
#[derive(Debug, Clone)]
pub struct Traversal<S = Start, M = Read> {
    pub steps: Vec<Value>,
    _stream: PhantomData<S>,
    _mode: PhantomData<M>,
}

/// Start an empty traversal.
pub fn g() -> Traversal<Start, Read> {
    Traversal { steps: Vec::new(), _stream: PhantomData, _mode: PhantomData }
}

impl<S, M> Traversal<S, M> {
    fn step<S2, M2>(mut self, step: Value) -> Traversal<S2, M2> {
        self.steps.push(step);
        Traversal { steps: self.steps, _stream: PhantomData, _mode: PhantomData }
    }
}

fn search_struct(
    tag: &str,
    label: &str,
    property: &str,
    query_key: &str,
    query: Input,
    k: Bound,
    tenant_value: Option<Input>,
) -> Value {
    let mut fields = Map::new();
    fields.insert("label".into(), json!(label));
    fields.insert("property".into(), json!(property));
    if let Some(t) = tenant_value {
        fields.insert("tenant_value".into(), t.encode());
    }
    fields.insert(query_key.into(), query.encode());
    fields.insert("k".into(), k.encode());
    json!({ tag: fields })
}

// -- sources: only from Start ------------------------------------------

impl<M> Traversal<Start, M> {
    pub fn n(self, nodes: Value) -> Traversal<Nodes, M> {
        self.step(json!({ "N": nodes }))
    }
    pub fn n_where(self, predicate: Predicate) -> Traversal<Nodes, M> {
        self.step(json!({ "NWhere": predicate.0 }))
    }
    pub fn n_with_label(self, label: &str) -> Traversal<Nodes, M> {
        self.n_where(Predicate::eq("$label", json!(label)))
    }
    pub fn e(self, edges: Value) -> Traversal<Edges, M> {
        self.step(json!({ "E": edges }))
    }
    pub fn e_where(self, predicate: Predicate) -> Traversal<Edges, M> {
        self.step(json!({ "EWhere": predicate.0 }))
    }
    pub fn e_with_label(self, label: &str) -> Traversal<Edges, M> {
        self.e_where(Predicate::eq("$label", json!(label)))
    }
    pub fn inject(self, name: &str) -> Traversal<Nodes, M> {
        self.step(json!({ "Inject": name }))
    }

    /// Vector search over node vectors; hits carry `$distance`
    /// (reference contract `dsl.rs:129-155`).
    pub fn vector_search_nodes(
        self,
        label: &str,
        property: &str,
        query: impl Into<Input>,
        k: impl Into<Bound>,
    ) -> Traversal<Nodes, M> {
        self.step(search_struct(
            "VectorSearchNodes", label, property, "query_vector",
            query.into(), k.into(), None,
        ))
    }
    pub fn vector_search_nodes_tenant(
        self,
        label: &str,
        property: &str,
        query: impl Into<Input>,
        k: impl Into<Bound>,
        tenant_value: impl Into<Input>,
    ) -> Traversal<Nodes, M> {
        self.step(search_struct(
            "VectorSearchNodes", label, property, "query_vector",
            query.into(), k.into(), Some(tenant_value.into()),
        ))
    }
    pub fn vector_search_edges(
        self,
        label: &str,
        property: &str,
        query: impl Into<Input>,
        k: impl Into<Bound>,
    ) -> Traversal<Edges, M> {
        self.step(search_struct(
            "VectorSearchEdges", label, property, "query_vector",
            query.into(), k.into(), None,
        ))
    }
    pub fn vector_search_edges_tenant(
        self,
        label: &str,
        property: &str,
        query: impl Into<Input>,
        k: impl Into<Bound>,
        tenant_value: impl Into<Input>,
    ) -> Traversal<Edges, M> {
        self.step(search_struct(
            "VectorSearchEdges", label, property, "query_vector",
            query.into(), k.into(), Some(tenant_value.into()),
        ))
    }
    /// BM25 text search over node text; hits carry `$score`.
    pub fn text_search_nodes(
        self,
        label: &str,
        property: &str,
        query: impl Into<Input>,
        k: impl Into<Bound>,
    ) -> Traversal<Nodes, M> {
        self.step(search_struct(
            "TextSearchNodes", label, property, "query_text",
            query.into(), k.into(), None,
        ))
    }
    pub fn text_search_nodes_tenant(
        self,
        label: &str,
        property: &str,
        query: impl Into<Input>,
        k: impl Into<Bound>,
        tenant_value: impl Into<Input>,
    ) -> Traversal<Nodes, M> {
        self.step(search_struct(
            "TextSearchNodes", label, property, "query_text",
            query.into(), k.into(), Some(tenant_value.into()),
        ))
    }
    pub fn text_search_edges(
        self,
        label: &str,
        property: &str,
        query: impl Into<Input>,
        k: impl Into<Bound>,
    ) -> Traversal<Edges, M> {
        self.step(search_struct(
            "TextSearchEdges", label, property, "query_text",
            query.into(), k.into(), None,
        ))
    }
    pub fn text_search_edges_tenant(
        self,
        label: &str,
        property: &str,
        query: impl Into<Input>,
        k: impl Into<Bound>,
        tenant_value: impl Into<Input>,
    ) -> Traversal<Edges, M> {
        self.step(search_struct(
            "TextSearchEdges", label, property, "query_text",
            query.into(), k.into(), Some(tenant_value.into()),
        ))
    }

    // -- index DDL (write mode, terminal) -------------------------------

    pub fn create_index(self, spec: Value) -> Traversal<Done, Write> {
        self.step(json!({ "CreateIndex": { "spec": spec, "if_not_exists": false } }))
    }
    pub fn create_index_if_not_exists(self, spec: Value) -> Traversal<Done, Write> {
        self.step(json!({ "CreateIndex": { "spec": spec, "if_not_exists": true } }))
    }
    pub fn drop_index(self, spec: Value) -> Traversal<Done, Write> {
        self.step(json!({ "DropIndex": { "spec": spec } }))
    }
    /// Legacy sugar (reference `dsl.rs:3073-3114`).
    pub fn create_vector_index_nodes(
        self,
        label: &str,
        property: &str,
        tenant: Option<&str>,
    ) -> Traversal<Done, Write> {
        self.create_index_if_not_exists(IndexSpec::node_vector(label, property, tenant))
    }
    pub fn create_vector_index_edges(
        self,
        label: &str,
        property: &str,
        tenant: Option<&str>,
    ) -> Traversal<Done, Write> {
        self.create_index_if_not_exists(IndexSpec::edge_vector(label, property, tenant))
    }
    pub fn create_text_index_nodes(
        self,
        label: &str,
        property: &str,
        tenant: Option<&str>,
    ) -> Traversal<Done, Write> {
        self.create_index_if_not_exists(IndexSpec::node_text(label, property, tenant))
    }
    pub fn create_text_index_edges(
        self,
        label: &str,
        property: &str,
        tenant: Option<&str>,
    ) -> Traversal<Done, Write> {
        self.create_index_if_not_exists(IndexSpec::edge_text(label, property, tenant))
    }

    /// `AddN` seeds the stream with the created node (reference
    /// `dsl.rs:3121`).
    pub fn add_n(self, label: &str, properties: Vec<(&str, Input)>) -> Traversal<Nodes, Write> {
        let entries: Vec<Value> = properties
            .into_iter()
            .map(|(k, v)| json!([k, v.encode()]))
            .collect();
        self.step(json!({ "AddN": { "label": label, "properties": entries } }))
    }
}

// -- node-stream steps ---------------------------------------------------

impl<M> Traversal<Nodes, M> {
    pub fn out(self, label: Option<&str>) -> Traversal<Nodes, M> {
        self.step(json!({ "Out": label }))
    }
    pub fn in_(self, label: Option<&str>) -> Traversal<Nodes, M> {
        self.step(json!({ "In": label }))
    }
    pub fn both(self, label: Option<&str>) -> Traversal<Nodes, M> {
        self.step(json!({ "Both": label }))
    }
    pub fn out_e(self, label: Option<&str>) -> Traversal<Edges, M> {
        self.step(json!({ "OutE": label }))
    }
    pub fn in_e(self, label: Option<&str>) -> Traversal<Edges, M> {
        self.step(json!({ "InE": label }))
    }
    pub fn both_e(self, label: Option<&str>) -> Traversal<Edges, M> {
        self.step(json!({ "BothE": label }))
    }

    /// `AddE` from each node in the stream to `to` (reference
    /// `dsl.rs:3131`).
    pub fn add_e(
        self,
        label: &str,
        to: Value,
        properties: Vec<(&str, Input)>,
    ) -> Traversal<Nodes, Write> {
        let entries: Vec<Value> = properties
            .into_iter()
            .map(|(k, v)| json!([k, v.encode()]))
            .collect();
        self.step(json!({ "AddE": { "label": label, "to": to, "properties": entries } }))
    }
    /// Drop all edges from stream nodes to `to` (reference `dsl.rs:3141-3167`).
    pub fn drop_edge(self, to: Value) -> Traversal<Nodes, Write> {
        self.step(json!({ "DropEdge": to }))
    }
    pub fn drop_edge_labeled(self, to: Value, label: &str) -> Traversal<Nodes, Write> {
        self.step(json!({ "DropEdgeLabeled": { "to": to, "label": label } }))
    }
    pub fn drop_edge_by_id(self, edges: Value) -> Traversal<Nodes, Write> {
        self.step(json!({ "DropEdgeById": edges }))
    }
}

// -- edge-stream steps -----------------------------------------------------

impl<M> Traversal<Edges, M> {
    pub fn out_n(self) -> Traversal<Nodes, M> {
        self.step(json!("OutN"))
    }
    pub fn in_n(self) -> Traversal<Nodes, M> {
        self.step(json!("InN"))
    }
    pub fn other_n(self) -> Traversal<Nodes, M> {
        self.step(json!("OtherN"))
    }
    pub fn edge_has(self, prop: &str, value: impl Into<Input>) -> Traversal<Edges, M> {
        self.step(json!({ "EdgeHas": [prop, value.into().encode()] }))
    }
    pub fn edge_has_label(self, label: &str) -> Traversal<Edges, M> {
        self.step(json!({ "EdgeHasLabel": label }))
    }
    /// Terminal: full edge rows incl. `$from`/`$to` (reference
    /// `dsl.rs:3016-3054`).
    pub fn edge_properties(self) -> Traversal<Done, M> {
        self.step(json!("EdgeProperties"))
    }
}

// -- steps shared by both live streams ------------------------------------

impl<S: ActiveStream, M> Traversal<S, M> {
    // filters
    pub fn has(self, prop: &str, value: Value) -> Traversal<S, M> {
        self.step(json!({ "Has": [prop, encode_property_value(value)] }))
    }
    pub fn has_label(self, label: &str) -> Traversal<S, M> {
        self.step(json!({ "HasLabel": label }))
    }
    pub fn has_key(self, prop: &str) -> Traversal<S, M> {
        self.step(json!({ "HasKey": prop }))
    }
    pub fn where_(self, predicate: Predicate) -> Traversal<S, M> {
        self.step(json!({ "Where": predicate.0 }))
    }
    pub fn dedup(self) -> Traversal<S, M> {
        self.step(json!("Dedup"))
    }
    pub fn within(self, name: &str) -> Traversal<S, M> {
        self.step(json!({ "Within": name }))
    }
    pub fn without(self, name: &str) -> Traversal<S, M> {
        self.step(json!({ "Without": name }))
    }

    // stream shaping
    pub fn limit(self, n: u64) -> Traversal<S, M> {
        self.step(json!({ "Limit": n }))
    }
    pub fn limit_by(self, expr: Expr) -> Traversal<S, M> {
        self.step(json!({ "LimitBy": expr.0 }))
    }
    pub fn skip(self, n: u64) -> Traversal<S, M> {
        self.step(json!({ "Skip": n }))
    }
    pub fn skip_by(self, expr: Expr) -> Traversal<S, M> {
        self.step(json!({ "SkipBy": expr.0 }))
    }
    pub fn range(self, start: u64, end: u64) -> Traversal<S, M> {
        self.step(json!({ "Range": [start, end] }))
    }
    pub fn range_by(self, start: impl Into<Bound>, end: impl Into<Bound>) -> Traversal<S, M> {
        self.step(json!({ "RangeBy": [start.into().encode(), end.into().encode()] }))
    }
    pub fn order_by(self, prop: &str, order: &str) -> Traversal<S, M> {
        self.step(json!({ "OrderBy": [prop, order] }))
    }
    pub fn order_by_multiple(self, orderings: &[(&str, &str)]) -> Traversal<S, M> {
        let entries: Vec<Value> = orderings.iter().map(|(p, o)| json!([p, o])).collect();
        self.step(json!({ "OrderByMultiple": entries }))
    }

    // variables / bindings (wire v5, reference dsl.rs:2999-3012)
    pub fn as_(self, name: &str) -> Traversal<S, M> {
        self.step(json!({ "As": name }))
    }
    pub fn store(self, name: &str) -> Traversal<S, M> {
        self.step(json!({ "Store": name }))
    }
    pub fn select(self, name: &str) -> Traversal<S, M> {
        self.step(json!({ "Select": name }))
    }
    pub fn bind(self, name: &str) -> Traversal<S, M> {
        self.step(json!({ "Bind": name }))
    }

    // control flow (reference dsl.rs:3180-3200)
    pub fn repeat(self, config: RepeatConfig) -> Traversal<S, M> {
        self.step(json!({ "Repeat": config.encode() }))
    }
    pub fn union(self, branches: Vec<SubTraversal>) -> Traversal<S, M> {
        let encoded: Vec<Value> = branches.iter().map(|t| t.encode()).collect();
        self.step(json!({ "Union": encoded }))
    }
    pub fn choose(
        self,
        condition: Predicate,
        then_traversal: SubTraversal,
        else_traversal: Option<SubTraversal>,
    ) -> Traversal<S, M> {
        self.step(json!({ "Choose": {
            "condition": condition.0,
            "then_traversal": then_traversal.encode(),
            "else_traversal": else_traversal.map(|t| t.encode()),
        }}))
    }
    pub fn coalesce(self, branches: Vec<SubTraversal>) -> Traversal<S, M> {
        let encoded: Vec<Value> = branches.iter().map(|t| t.encode()).collect();
        self.step(json!({ "Coalesce": encoded }))
    }
    pub fn optional(self, branch: SubTraversal) -> Traversal<S, M> {
        self.step(json!({ "Optional": branch.encode() }))
    }

    // reserved no-ops: serialize, the interpreter ignores them
    // (reference dsl.rs:3214-3254)
    pub fn fold(self) -> Traversal<S, M> {
        self.step(json!("Fold"))
    }
    pub fn unfold(self) -> Traversal<S, M> {
        self.step(json!("Unfold"))
    }
    pub fn path(self) -> Traversal<S, M> {
        self.step(json!("Path"))
    }
    pub fn simple_path(self) -> Traversal<S, M> {
        self.step(json!("SimplePath"))
    }
    pub fn with_sack(self, initial: Value) -> Traversal<S, M> {
        self.step(json!({ "WithSack": encode_property_value(initial) }))
    }
    pub fn sack_set(self, prop: &str) -> Traversal<S, M> {
        self.step(json!({ "SackSet": prop }))
    }
    pub fn sack_add(self, prop: &str) -> Traversal<S, M> {
        self.step(json!({ "SackAdd": prop }))
    }
    pub fn sack_get(self) -> Traversal<S, M> {
        self.step(json!("SackGet"))
    }

    // terminals (S -> Done)
    pub fn count(self) -> Traversal<Done, M> {
        self.step(json!("Count"))
    }
    pub fn exists(self) -> Traversal<Done, M> {
        self.step(json!("Exists"))
    }
    pub fn id(self) -> Traversal<Done, M> {
        self.step(json!("Id"))
    }
    pub fn label(self) -> Traversal<Done, M> {
        self.step(json!("Label"))
    }
    pub fn values(self, props: &[&str]) -> Traversal<Done, M> {
        self.step(json!({ "Values": props }))
    }
    pub fn value_map(self, props: Option<&[&str]>) -> Traversal<Done, M> {
        self.step(json!({ "ValueMap": props }))
    }
    pub fn project(self, projections: Vec<Value>) -> Traversal<Done, M> {
        self.step(json!({ "Project": projections }))
    }
    pub fn project_bindings(
        self,
        projections: Vec<Value>,
        distinct: bool,
    ) -> Traversal<Done, M> {
        self.step(json!({ "ProjectBindings": {
            "projections": projections, "distinct": distinct,
        }}))
    }

    // aggregation (reference dsl.rs:3204-3212)
    pub fn group(self, prop: &str) -> Traversal<Done, M> {
        self.step(json!({ "Group": prop }))
    }
    pub fn group_count(self, prop: &str) -> Traversal<Done, M> {
        self.step(json!({ "GroupCount": prop }))
    }
    pub fn aggregate_by(self, func: &str, prop: &str) -> Traversal<Done, M> {
        self.step(json!({ "AggregateBy": [func, prop] }))
    }

    // mutations on the current stream (flip to Write)
    pub fn set_property(self, name: &str, value: impl Into<Input>) -> Traversal<S, Write> {
        self.step(json!({ "SetProperty": [name, value.into().encode()] }))
    }
    pub fn remove_property(self, name: &str) -> Traversal<S, Write> {
        self.step(json!({ "RemoveProperty": name }))
    }
    /// Drop stream elements (nodes drop incident edges too).
    pub fn drop(self) -> Traversal<Done, Write> {
        self.step(json!("Drop"))
    }
}

// ---------------------------------------------------------------------
// batches
// ---------------------------------------------------------------------

/// Batch conditions (reference `dsl.rs:4432-4441`).
pub struct BatchCondition;

impl BatchCondition {
    pub fn var_not_empty(name: &str) -> Value {
        json!({ "VarNotEmpty": name })
    }
    pub fn var_empty(name: &str) -> Value {
        json!({ "VarEmpty": name })
    }
    pub fn var_min_size(name: &str, size: u64) -> Value {
        json!({ "VarMinSize": [name, size] })
    }
    pub fn prev_not_empty() -> Value {
        json!("PrevNotEmpty")
    }
}

/// Type-erased batch payload shared by [`ReadBatch`] and [`WriteBatch`].
#[derive(Debug, Clone)]
pub struct Batch {
    pub kind: &'static str,
    pub queries: Vec<Value>,
    pub returns: Vec<String>,
}

impl Batch {
    pub fn encode(&self) -> Value {
        json!({ "queries": self.queries, "returns": self.returns })
    }
    pub fn to_dynamic_request(&self) -> DynamicQueryRequest {
        DynamicQueryRequest {
            request_type: self.kind.to_string(),
            query_name: None,
            query: self.encode(),
            parameters: Map::new(),
            parameter_types: Map::new(),
        }
    }
}

/// A read-only batch: `var_as` only accepts `Traversal<_, Read>`,
/// so a mutation inside a read batch is a compile error.
#[derive(Debug, Clone)]
pub struct ReadBatch(pub Batch);

/// A write batch: mixes read and write traversals.
#[derive(Debug, Clone)]
pub struct WriteBatch(pub Batch);

impl From<ReadBatch> for Batch {
    fn from(b: ReadBatch) -> Batch {
        b.0
    }
}

impl From<WriteBatch> for Batch {
    fn from(b: WriteBatch) -> Batch {
        b.0
    }
}

/// Start a read-only batch.
pub fn read_batch() -> ReadBatch {
    ReadBatch(Batch { kind: "read", queries: Vec::new(), returns: Vec::new() })
}

/// Start a write batch.
pub fn write_batch() -> WriteBatch {
    WriteBatch(Batch { kind: "write", queries: Vec::new(), returns: Vec::new() })
}

fn batch_entry(name: &str, steps: Vec<Value>, condition: Value) -> Value {
    json!({ "Query": { "name": name, "steps": steps, "condition": condition } })
}

impl ReadBatch {
    pub fn var_as<S>(mut self, name: &str, traversal: Traversal<S, Read>) -> ReadBatch {
        self.0.queries.push(batch_entry(name, traversal.steps, Value::Null));
        self
    }
    pub fn var_as_if<S>(
        mut self,
        name: &str,
        condition: Value,
        traversal: Traversal<S, Read>,
    ) -> ReadBatch {
        self.0.queries.push(batch_entry(name, traversal.steps, condition));
        self
    }
    pub fn returning(mut self, vars: &[&str]) -> ReadBatch {
        self.0.returns = vars.iter().map(|s| s.to_string()).collect();
        self
    }
    pub fn encode(&self) -> Value {
        self.0.encode()
    }
    pub fn to_dynamic_request(&self) -> DynamicQueryRequest {
        self.0.to_dynamic_request()
    }
    pub fn into_batch(self) -> Batch {
        self.0
    }
}

impl WriteBatch {
    pub fn var_as<S, M>(mut self, name: &str, traversal: Traversal<S, M>) -> WriteBatch {
        self.0.queries.push(batch_entry(name, traversal.steps, Value::Null));
        self
    }
    pub fn var_as_if<S, M>(
        mut self,
        name: &str,
        condition: Value,
        traversal: Traversal<S, M>,
    ) -> WriteBatch {
        self.0.queries.push(batch_entry(name, traversal.steps, condition));
        self
    }
    /// Run the body once per object in a top-level array parameter —
    /// the bulk-ingest primitive (reference `dsl.rs:4458-4468`).
    pub fn for_each_param(mut self, param: &str, body: WriteBatch) -> WriteBatch {
        self.0.queries.push(json!({ "ForEach": {
            "param": param, "body": body.0.queries,
        }}));
        self
    }
    pub fn returning(mut self, vars: &[&str]) -> WriteBatch {
        self.0.returns = vars.iter().map(|s| s.to_string()).collect();
        self
    }
    pub fn encode(&self) -> Value {
        self.0.encode()
    }
    pub fn to_dynamic_request(&self) -> DynamicQueryRequest {
        self.0.to_dynamic_request()
    }
    pub fn into_batch(self) -> Batch {
        self.0
    }
}

// ---------------------------------------------------------------------
// request envelope
// ---------------------------------------------------------------------

/// The `POST /v1/query` envelope (reference `dsl.rs:4769-4784`).
#[derive(Debug, Clone)]
pub struct DynamicQueryRequest {
    pub request_type: String,
    pub query_name: Option<String>,
    pub query: Value,
    pub parameters: Map<String, Value>,
    pub parameter_types: Map<String, Value>,
}

impl DynamicQueryRequest {
    pub fn with_query_name(mut self, name: &str) -> Self {
        self.query_name = Some(name.to_string());
        self
    }
    /// Bind a typed parameter (ty e.g. `json!("I64")`, `json!({"Array": "F32"})`).
    pub fn with_parameter(mut self, name: &str, ty: Value, value: Value) -> Self {
        self.parameters.insert(name.to_string(), value);
        self.parameter_types.insert(name.to_string(), ty);
        self
    }
    pub fn encode(&self) -> Value {
        let mut out = Map::new();
        out.insert("request_type".into(), json!(self.request_type));
        out.insert(
            "query_name".into(),
            self.query_name
                .as_ref()
                .map(|n| json!(n))
                .unwrap_or(Value::Null),
        );
        out.insert("query".into(), self.query.clone());
        if !self.parameters.is_empty() {
            out.insert("parameters".into(), Value::Object(self.parameters.clone()));
        }
        if !self.parameter_types.is_empty() {
            out.insert(
                "parameter_types".into(),
                Value::Object(self.parameter_types.clone()),
            );
        }
        Value::Object(out)
    }
    pub fn to_json_string(&self) -> String {
        self.encode().to_string()
    }
}

#[cfg(test)]
mod tests {
    use super::*;

    #[test]
    fn scaffold_request_shape() {
        let request = read_batch()
            .var_as("node_count", g().n_with_label("User").count())
            .returning(&["node_count"])
            .to_dynamic_request();
        let body = request.encode();
        assert_eq!(body["request_type"], "read");
        assert_eq!(
            body["query"]["queries"][0]["Query"]["steps"][0],
            json!({ "NWhere": { "Eq": ["$label", { "String": "User" }] } })
        );
        assert_eq!(body["query"]["queries"][0]["Query"]["steps"][1], json!("Count"));
    }

    #[test]
    fn u64_ids_preserved() {
        let big: u64 = (1 << 63) + 11;
        let t = g().n(NodeRef::ids(&[big]));
        assert_eq!(t.steps[0]["N"]["Ids"][0].as_u64(), Some(big));
    }

    #[test]
    fn control_flow_shapes() {
        let t = g()
            .n_with_label("User")
            .repeat(RepeatConfig::new(sub().out(Some("FOLLOWS"))).times(2).emit_all())
            .union(vec![sub().out(Some("A")), sub().out(Some("B"))])
            .choose(
                Predicate::eq("kind", json!("x")),
                sub().out(None),
                Some(sub().in_(None)),
            )
            .coalesce(vec![sub().out(Some("X")), sub().both(None)])
            .optional(sub().out(Some("MAYBE")))
            .count();
        assert_eq!(t.steps[1]["Repeat"]["times"], json!(2));
        assert_eq!(t.steps[1]["Repeat"]["emit"], json!("All"));
        assert_eq!(t.steps[1]["Repeat"]["max_depth"], json!(100));
        assert_eq!(t.steps[2]["Union"][1]["steps"][0], json!({ "Out": "B" }));
        assert_eq!(t.steps[3]["Choose"]["else_traversal"]["steps"].as_array().unwrap().len(), 1);
        assert_eq!(t.steps[4]["Coalesce"][0]["steps"][0], json!({ "Out": "X" }));
        assert_eq!(t.steps[5]["Optional"]["steps"][0], json!({ "Out": "MAYBE" }));
    }

    #[test]
    fn row_bindings_shapes() {
        let t = g()
            .n_with_label("Doc")
            .bind("doc")
            .out_e(Some("AUTHORED_BY"))
            .bind("edge")
            .out_n()
            .project_bindings(
                vec![
                    BindingProjection::binding("doc", "title", "doc_title"),
                    BindingProjection::current("name", "author"),
                    BindingProjection::coalesce(
                        vec![
                            BindingRef::binding("edge", "weight"),
                            BindingRef::current("fallback"),
                        ],
                        "weight",
                    ),
                ],
                true,
            );
        let pb = &t.steps[t.steps.len() - 1]["ProjectBindings"];
        assert_eq!(pb["distinct"], json!(true));
        assert_eq!(pb["projections"][0]["target"], json!({ "Binding": "doc" }));
        assert_eq!(pb["projections"][1]["target"], json!("Current"));
        assert_eq!(pb["projections"][2]["kind"], json!("Coalesce"));
    }

    #[test]
    fn reserved_noops_round_trip() {
        let t = g()
            .n(NodeRef::all())
            .fold()
            .unfold()
            .path()
            .simple_path()
            .with_sack(json!(0))
            .sack_set("x")
            .sack_add("y")
            .sack_get()
            .count();
        assert_eq!(t.steps[1], json!("Fold"));
        assert_eq!(t.steps[5], json!({ "WithSack": { "I64": 0 } }));
        assert_eq!(t.steps[7], json!({ "SackAdd": "y" }));
    }

    #[test]
    fn edge_search_and_order_multi() {
        let t = g()
            .vector_search_edges("SIMILAR", "emb", f32_array(&[1.0, 0.0]), 4u64)
            .edge_has("w", json!(1))
            .order_by_multiple(&[("a", "Asc"), ("b", "Desc")])
            .edge_properties();
        assert!(t.steps[0]["VectorSearchEdges"]["k"]["Literal"] == json!(4));
        assert_eq!(t.steps[2]["OrderByMultiple"][1], json!(["b", "Desc"]));
    }

    #[test]
    fn param_query_vector_matches_python_sdk_shape() {
        let t = g().vector_search_nodes("Doc", "emb", Expr::param("q"), Expr::param("k"));
        assert_eq!(
            t.steps[0]["VectorSearchNodes"]["query_vector"],
            json!({ "Expr": { "Param": "q" } })
        );
        assert_eq!(
            t.steps[0]["VectorSearchNodes"]["k"],
            json!({ "Expr": { "Param": "k" } })
        );
    }

    // Typestate: the commented chains below must NOT compile.
    // (compile-fail coverage; mirrors the reference's typestate claims)
    //
    // fn _write_in_read_batch() {
    //     read_batch().var_as("x", g().add_n("User", vec![]));
    // }
    // fn _out_n_on_nodes() {
    //     g().n(NodeRef::all()).out_n();
    // }
    // fn _steps_after_terminal() {
    //     g().n(NodeRef::all()).count().limit(3);
    // }
}
