//! Rust SDK for the helix-tpu engine.
//!
//! Mirrors the dynamic-query wire format of the Python SDK
//! (`helix_tpu/dsl.py`): externally tagged enum JSON built eagerly over
//! `serde_json::Value`, `g()` traversal builder, read/write batch
//! assembly, typed parameters, and (with the `client` feature) an async
//! `reqwest` client with the engine-behavior header toggles.
//!
//! NOTE: this environment ships no Rust toolchain, so this crate is
//! source-only in round 1 (see docs/STATUS.md).  The builder is
//! intentionally macro- and generics-light: queries are validated by the
//! engine, and batch read/write discipline is enforced at runtime.

pub mod dsl;
pub mod query_generator;

#[cfg(feature = "client")]
pub mod client;

pub use dsl::*;
pub use query_generator::{QueryBundle, QueryParamType, QUERY_BUNDLE_VERSION};

#[cfg(feature = "client")]
pub use client::{Client, HelixError, QueryBuilder};
