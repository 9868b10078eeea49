//! Query-builder DSL emitting wire-format JSON directly.
//!
//! Every builder method encodes its step eagerly into a
//! `serde_json::Value`, so a built traversal *is* its wire
//! representation (the same design as the Python SDK).  u64 ids are
//! preserved losslessly by `serde_json`.

use serde_json::{json, Map, Value};

/// Encoded expression node.
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

/// Coerce a plain JSON value into an encoded `PropertyValue`.
///
/// Coercion matches the other SDKs: null/bool/i64/f64/string map to
/// their variants; homogeneous string/int arrays become typed arrays,
/// other arrays become `Array`; objects become `Object`.  Use the
/// explicit wrappers (`f32_value`, `bytes_value`, `datetime_millis`)
/// to pin non-default variants.
pub fn encode_property_value(value: Value) -> Value {
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

fn as_input(value: Value) -> Value {
    json!({ "Value": encode_property_value(value) })
}

fn expr_input(expr: Expr) -> Value {
    json!({ "Expr": expr.0 })
}

/// Encoded filter predicate.
#[derive(Debug, Clone)]
pub struct Predicate(pub Value);

impl Predicate {
    fn cmp(tag: &str, prop: &str, value: Value) -> Predicate {
        Predicate(json!({ tag: [prop, encode_property_value(value)] }))
    }
    fn cmp_expr(tag: &str, prop: &str, expr: Expr) -> Predicate {
        let mut map = Map::new();
        map.insert(format!("{tag}Expr"), json!([prop, expr.0]));
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
    pub fn eq_param(prop: &str, name: &str) -> Predicate {
        Self::cmp_expr("Eq", prop, Expr::param(name))
    }
    pub fn gt_param(prop: &str, name: &str) -> Predicate {
        Self::cmp_expr("Gt", prop, Expr::param(name))
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
    pub fn is_in(prop: &str, values: Value) -> Predicate {
        Predicate(json!({ "IsIn": [prop, encode_property_value(values)] }))
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
}

/// Node source references.
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

/// Edge source references.
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

/// Index specifications.
pub struct IndexSpec;

impl IndexSpec {
    pub fn node_equality(label: &str, property: &str, unique: bool) -> Value {
        json!({ "NodeEquality": {
            "label": label, "property": property, "unique": unique,
        }})
    }
    pub fn node_range(label: &str, property: &str) -> Value {
        json!({ "NodeRange": { "label": label, "property": property } })
    }
    pub fn node_vector(label: &str, property: &str, tenant: Option<&str>) -> Value {
        let mut fields = Map::new();
        fields.insert("label".into(), json!(label));
        fields.insert("property".into(), json!(property));
        if let Some(t) = tenant {
            fields.insert("tenant_property".into(), json!(t));
        }
        json!({ "NodeVector": fields })
    }
    pub fn node_text(label: &str, property: &str, tenant: Option<&str>) -> Value {
        let mut fields = Map::new();
        fields.insert("label".into(), json!(label));
        fields.insert("property".into(), json!(property));
        if let Some(t) = tenant {
            fields.insert("tenant_property".into(), json!(t));
        }
        json!({ "NodeText": fields })
    }
}

/// Projection entries.
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

/// An immutable step chain; every method returns a new traversal.
#[derive(Debug, Clone, Default)]
pub struct Traversal {
    pub steps: Vec<Value>,
    pub write: bool,
}

/// Start an empty traversal.
pub fn g() -> Traversal {
    Traversal::default()
}

impl Traversal {
    fn push(mut self, step: Value) -> Traversal {
        self.steps.push(step);
        self
    }
    fn push_write(mut self, step: Value) -> Traversal {
        self.steps.push(step);
        self.write = true;
        self
    }

    pub fn n(self, nodes: Value) -> Traversal {
        self.push(json!({ "N": nodes }))
    }
    pub fn n_where(self, predicate: Predicate) -> Traversal {
        self.push(json!({ "NWhere": predicate.0 }))
    }
    pub fn n_with_label(self, label: &str) -> Traversal {
        self.n_where(Predicate::eq("$label", json!(label)))
    }
    pub fn e(self, edges: Value) -> Traversal {
        self.push(json!({ "E": edges }))
    }
    pub fn e_where(self, predicate: Predicate) -> Traversal {
        self.push(json!({ "EWhere": predicate.0 }))
    }
    pub fn e_with_label(self, label: &str) -> Traversal {
        self.e_where(Predicate::eq("$label", json!(label)))
    }
    pub fn inject(self, name: &str) -> Traversal {
        self.push(json!({ "Inject": name }))
    }

    pub fn vector_search_nodes(
        self,
        label: &str,
        property: &str,
        query: &[f32],
        k: u64,
    ) -> Traversal {
        self.push(json!({ "VectorSearchNodes": {
            "label": label,
            "property": property,
            "query_vector": { "Value": { "F32Array": query } },
            "k": { "Literal": k },
        }}))
    }
    pub fn text_search_nodes(
        self,
        label: &str,
        property: &str,
        query: &str,
        k: u64,
    ) -> Traversal {
        self.push(json!({ "TextSearchNodes": {
            "label": label,
            "property": property,
            "query_text": { "Value": { "String": query } },
            "k": { "Literal": k },
        }}))
    }

    pub fn out(self, label: Option<&str>) -> Traversal {
        self.push(json!({ "Out": label }))
    }
    pub fn in_(self, label: Option<&str>) -> Traversal {
        self.push(json!({ "In": label }))
    }
    pub fn both(self, label: Option<&str>) -> Traversal {
        self.push(json!({ "Both": label }))
    }
    pub fn out_e(self, label: Option<&str>) -> Traversal {
        self.push(json!({ "OutE": label }))
    }
    pub fn in_e(self, label: Option<&str>) -> Traversal {
        self.push(json!({ "InE": label }))
    }
    pub fn out_n(self) -> Traversal {
        self.push(json!("OutN"))
    }
    pub fn in_n(self) -> Traversal {
        self.push(json!("InN"))
    }
    pub fn other_n(self) -> Traversal {
        self.push(json!("OtherN"))
    }

    pub fn has(self, prop: &str, value: Value) -> Traversal {
        self.push(json!({ "Has": [prop, encode_property_value(value)] }))
    }
    pub fn has_label(self, label: &str) -> Traversal {
        self.push(json!({ "HasLabel": label }))
    }
    pub fn where_(self, predicate: Predicate) -> Traversal {
        self.push(json!({ "Where": predicate.0 }))
    }
    pub fn dedup(self) -> Traversal {
        self.push(json!("Dedup"))
    }
    pub fn within(self, name: &str) -> Traversal {
        self.push(json!({ "Within": name }))
    }
    pub fn without(self, name: &str) -> Traversal {
        self.push(json!({ "Without": name }))
    }

    pub fn limit(self, n: u64) -> Traversal {
        self.push(json!({ "Limit": n }))
    }
    pub fn limit_by(self, expr: Expr) -> Traversal {
        self.push(json!({ "LimitBy": expr.0 }))
    }
    pub fn skip(self, n: u64) -> Traversal {
        self.push(json!({ "Skip": n }))
    }
    pub fn range(self, start: u64, end: u64) -> Traversal {
        self.push(json!({ "Range": [start, end] }))
    }
    pub fn order_by(self, prop: &str, order: &str) -> Traversal {
        self.push(json!({ "OrderBy": [prop, order] }))
    }
    pub fn as_(self, name: &str) -> Traversal {
        self.push(json!({ "As": name }))
    }
    pub fn store(self, name: &str) -> Traversal {
        self.push(json!({ "Store": name }))
    }
    pub fn select(self, name: &str) -> Traversal {
        self.push(json!({ "Select": name }))
    }
    pub fn bind(self, name: &str) -> Traversal {
        self.push(json!({ "Bind": name }))
    }

    pub fn count(self) -> Traversal {
        self.push(json!("Count"))
    }
    pub fn exists(self) -> Traversal {
        self.push(json!("Exists"))
    }
    pub fn ids_terminal(self) -> Traversal {
        self.push(json!("Id"))
    }
    pub fn label(self) -> Traversal {
        self.push(json!("Label"))
    }
    pub fn values(self, props: &[&str]) -> Traversal {
        self.push(json!({ "Values": props }))
    }
    pub fn value_map(self, props: Option<&[&str]>) -> Traversal {
        self.push(json!({ "ValueMap": props }))
    }
    pub fn project(self, projections: Vec<Value>) -> Traversal {
        self.push(json!({ "Project": projections }))
    }
    pub fn edge_properties(self) -> Traversal {
        self.push(json!("EdgeProperties"))
    }
    pub fn group_count(self, prop: &str) -> Traversal {
        self.push(json!({ "GroupCount": prop }))
    }
    pub fn aggregate_by(self, func: &str, prop: &str) -> Traversal {
        self.push(json!({ "AggregateBy": [func, prop] }))
    }

    pub fn create_index_if_not_exists(self, spec: Value) -> Traversal {
        self.push_write(json!({ "CreateIndex": {
            "spec": spec, "if_not_exists": true,
        }}))
    }
    pub fn create_vector_index_nodes(
        self,
        label: &str,
        property: &str,
        tenant: Option<&str>,
    ) -> Traversal {
        self.create_index_if_not_exists(IndexSpec::node_vector(label, property, tenant))
    }
    pub fn create_text_index_nodes(
        self,
        label: &str,
        property: &str,
        tenant: Option<&str>,
    ) -> Traversal {
        self.create_index_if_not_exists(IndexSpec::node_text(label, property, tenant))
    }

    pub fn add_n(self, label: &str, properties: Vec<(&str, Value)>) -> Traversal {
        let entries: Vec<Value> = properties
            .into_iter()
            .map(|(k, v)| json!([k, as_input(v)]))
            .collect();
        self.push_write(json!({ "AddN": {
            "label": label, "properties": entries,
        }}))
    }
    pub fn add_e(
        self,
        label: &str,
        to: Value,
        properties: Vec<(&str, Value)>,
    ) -> Traversal {
        let entries: Vec<Value> = properties
            .into_iter()
            .map(|(k, v)| json!([k, as_input(v)]))
            .collect();
        self.push_write(json!({ "AddE": {
            "label": label, "to": to, "properties": entries,
        }}))
    }
    pub fn set_property(self, name: &str, value: Value) -> Traversal {
        self.push_write(json!({ "SetProperty": [name, as_input(value)] }))
    }
    pub fn set_property_expr(self, name: &str, expr: Expr) -> Traversal {
        self.push_write(json!({ "SetProperty": [name, expr_input(expr)] }))
    }
    pub fn remove_property(self, name: &str) -> Traversal {
        self.push_write(json!({ "RemoveProperty": name }))
    }
    pub fn drop(self) -> Traversal {
        self.push_write(json!("Drop"))
    }
}

/// Batch conditions.
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

/// A read or write batch under assembly.
#[derive(Debug, Clone)]
pub struct Batch {
    pub kind: &'static str,
    pub queries: Vec<Value>,
    pub returns: Vec<String>,
}

/// Start a read-only batch.
pub fn read_batch() -> Batch {
    Batch { kind: "read", queries: Vec::new(), returns: Vec::new() }
}

/// Start a write batch.
pub fn write_batch() -> Batch {
    Batch { kind: "write", queries: Vec::new(), returns: Vec::new() }
}

impl Batch {
    pub fn var_as(mut self, name: &str, traversal: Traversal) -> Batch {
        assert!(
            !(self.kind == "read" && traversal.write),
            "read batches only accept read-only traversals"
        );
        self.queries.push(json!({ "Query": {
            "name": name, "steps": traversal.steps, "condition": Value::Null,
        }}));
        self
    }
    pub fn var_as_if(mut self, name: &str, condition: Value, traversal: Traversal) -> Batch {
        self.queries.push(json!({ "Query": {
            "name": name, "steps": traversal.steps, "condition": condition,
        }}));
        self
    }
    pub fn for_each_param(mut self, param: &str, body: Batch) -> Batch {
        self.queries.push(json!({ "ForEach": {
            "param": param, "body": body.queries,
        }}));
        self
    }
    pub fn returning(mut self, vars: &[&str]) -> Batch {
        self.returns = vars.iter().map(|s| s.to_string()).collect();
        self
    }
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

/// The `POST /v1/query` envelope.
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
    fn read_batch_rejects_writes() {
        let result = std::panic::catch_unwind(|| {
            read_batch().var_as("x", g().add_n("User", vec![]))
        });
        assert!(result.is_err());
    }
}
