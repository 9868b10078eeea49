//! Query-bundle generation (wire v5).
//!
//! The reference collects `#[register]`-ed queries through the
//! `inventory` crate and emits a versioned `queries.json`
//! (`sdks/rust/src/query_generator.rs:51,150` and the proc-macro at
//! `sdks/rust/helix-dsl-macros/src/lib.rs:347-348`).  helix-tpu keeps
//! the same bundle format but replaces compile-time magic with an
//! explicit registry: read/write kind comes from the batch you hand in
//! (not from scanning function bodies for tokens), and parameter
//! schemas are declared values.  The [`register_queries!`] macro gives
//! the same one-place registration ergonomics without a proc-macro
//! crate.
//!
//! ```ignore
//! let bundle = register_queries! {
//!     read find_users(min_age: I64, want: String) => |_| {
//!         read_batch().var_as("grown", g().n_with_label("User").count())
//!     },
//!     write add_user() => |_| {
//!         write_batch().var_as("u", g().add_n("User", vec![]))
//!     },
//! };
//! std::fs::write("queries.json", bundle.build().to_string())?;
//! ```

use std::collections::BTreeMap;

use serde_json::{json, Map, Value};

use crate::dsl::Batch;

/// Bundle wire version emitted by [`QueryBundle::build`]
/// (reference `query_generator.rs:6-13`; v4 remains readable by the
/// engine's loader).
pub const QUERY_BUNDLE_VERSION: u64 = 5;

/// Parameter types accepted on the JSON route
/// (reference `query_generator.rs:17-38`; `Bytes` serializes in the
/// schema but is rejected at bind time on the JSON route).
#[derive(Debug, Clone, PartialEq, Eq)]
pub enum QueryParamType {
    Bool,
    I64,
    F64,
    F32,
    String,
    DateTime,
    Bytes,
    Json,
    Object,
    Array(Box<QueryParamType>),
}

impl QueryParamType {
    /// Encode to the bundle's type tag (`"I64"`, `{"Array": "Object"}`).
    pub fn encode(&self) -> Value {
        match self {
            QueryParamType::Bool => json!("Bool"),
            QueryParamType::I64 => json!("I64"),
            QueryParamType::F64 => json!("F64"),
            QueryParamType::F32 => json!("F32"),
            QueryParamType::String => json!("String"),
            QueryParamType::DateTime => json!("DateTime"),
            QueryParamType::Bytes => json!("Bytes"),
            QueryParamType::Json => json!("Json"),
            QueryParamType::Object => json!("Object"),
            QueryParamType::Array(inner) => json!({ "Array": inner.encode() }),
        }
    }
}

/// One registered route: a parameter schema plus the batch it runs.
pub struct RegisteredQuery {
    pub name: String,
    pub params: Vec<(String, QueryParamType)>,
    pub batch: Batch,
}

/// Accumulates registered queries and emits the v5 bundle.
#[derive(Default)]
pub struct QueryBundle {
    reads: BTreeMap<String, RegisteredQuery>,
    writes: BTreeMap<String, RegisteredQuery>,
}

impl QueryBundle {
    pub fn new() -> QueryBundle {
        QueryBundle::default()
    }

    /// Register a route; kind is taken from the batch itself.
    /// Panics on duplicate names (same contract as the Python
    /// `define_queries`).
    pub fn register(
        mut self,
        name: &str,
        params: Vec<(String, QueryParamType)>,
        batch: impl Into<Batch>,
    ) -> QueryBundle {
        let batch: Batch = batch.into();
        if self.reads.contains_key(name) || self.writes.contains_key(name) {
            panic!("duplicate generated query name: {name}");
        }
        let table = if batch.kind == "write" {
            &mut self.writes
        } else {
            &mut self.reads
        };
        table.insert(
            name.to_string(),
            RegisteredQuery { name: name.to_string(), params, batch },
        );
        self
    }

    fn routes(table: &BTreeMap<String, RegisteredQuery>) -> Value {
        let mut out = Map::new();
        for (name, query) in table {
            out.insert(name.clone(), query.batch.encode());
        }
        Value::Object(out)
    }

    fn parameters(table: &BTreeMap<String, RegisteredQuery>) -> Value {
        let mut out = Map::new();
        for (name, query) in table {
            let schema: Vec<Value> = query
                .params
                .iter()
                .map(|(pname, ty)| json!({ "name": pname, "ty": ty.encode() }))
                .collect();
            out.insert(name.clone(), Value::Array(schema));
        }
        Value::Object(out)
    }

    /// Emit the versioned bundle (`POST /v1/bundle` payload).
    pub fn build(&self) -> Value {
        json!({
            "version": QUERY_BUNDLE_VERSION,
            "read_routes": QueryBundle::routes(&self.reads),
            "write_routes": QueryBundle::routes(&self.writes),
            "read_parameters": QueryBundle::parameters(&self.reads),
            "write_parameters": QueryBundle::parameters(&self.writes),
        })
    }
}

/// One-place registration sugar over [`QueryBundle`]; each arm names a
/// route, declares its parameter schema, and supplies a closure from
/// the param-name list to a batch.
#[macro_export]
macro_rules! register_queries {
    ($($kind:ident $name:ident ( $($pname:ident : $pty:ident),* $(,)? ) => $body:expr),* $(,)?) => {{
        let mut bundle = $crate::query_generator::QueryBundle::new();
        $(
            {
                let params: Vec<(String, $crate::query_generator::QueryParamType)> = vec![
                    $((
                        stringify!($pname).to_string(),
                        $crate::query_generator::QueryParamType::$pty,
                    )),*
                ];
                let names: Vec<&str> = vec![$(stringify!($pname)),*];
                let batch: $crate::dsl::Batch = ($body)(&names).into_batch();
                let expected = if batch.kind == "write" { "write" } else { "read" };
                assert_eq!(
                    stringify!($kind), expected,
                    "query `{}` declared {} but its batch is {}",
                    stringify!($name), stringify!($kind), batch.kind,
                );
                bundle = bundle.register(stringify!($name), params, batch);
            }
        )*
        bundle
    }};
}

#[cfg(test)]
mod tests {
    use super::*;
    use crate::dsl::{g, read_batch, write_batch};

    #[test]
    fn bundle_shape_v5() {
        let bundle = QueryBundle::new()
            .register(
                "find_users",
                vec![("min_age".to_string(), QueryParamType::I64)],
                read_batch().var_as("n", g().n_with_label("User").count()),
            )
            .register(
                "add_user",
                vec![],
                write_batch().var_as("u", g().add_n("User", vec![])),
            )
            .build();
        assert_eq!(bundle["version"], QUERY_BUNDLE_VERSION);
        assert!(bundle["read_routes"]["find_users"]["queries"].is_array());
        assert!(bundle["write_routes"]["add_user"]["queries"].is_array());
        assert_eq!(
            bundle["read_parameters"]["find_users"][0],
            json!({ "name": "min_age", "ty": "I64" })
        );
    }

    #[test]
    fn array_types_nest() {
        let ty = QueryParamType::Array(Box::new(QueryParamType::Object));
        assert_eq!(ty.encode(), json!({ "Array": "Object" }));
    }
}
