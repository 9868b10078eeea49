"""helix-tpu: a TPU-native graph-vector database engine.

A from-scratch rebuild of the HelixDB engine contract (graph traversal,
HNSW-class vector search, BM25 full-text, document/KV data behind the
``POST /v1/query`` dynamic-batch wire protocol) with the query core running
on TPU via JAX/XLA/Pallas and storage/transactions host-side.

Public surface:

- :mod:`helix_tpu.dsl` — query builder + wire envelope (SDK layer)
- :mod:`helix_tpu.engine` — the database engine (storage + interpreter)
- :mod:`helix_tpu.ops` — TPU kernels (distance/top-k, quantized tiers, CSR)
- :mod:`helix_tpu.parallel` — multi-chip sharded search
- :mod:`helix_tpu.server` — HTTP gateway
- :mod:`helix_tpu.client` — HTTP client SDK
"""

__version__ = "0.1.0"

from . import wire  # noqa: F401
from .dsl import (  # noqa: F401
    g, sub, read_batch, write_batch, define_params, define_queries, param,
    register_read, register_write,
    Predicate, SourcePredicate, Expr, PropertyValue, NodeRef, EdgeRef,
    StreamBound, Projection, BindingProjection, BindingRef, BindingTarget,
    IndexSpec, RepeatConfig, BatchCondition, DynamicQueryRequest,
    Order, EmitBehavior, AggregateFunction, CompareOp, DateTime,
    i64, f32, f64, bytes_,
)
