"""Malformed-envelope robustness: every mangled request must surface as a
clean QueryError/EngineError (HTTP 400), never an internal TypeError or
KeyError (HTTP 500)."""

import copy
import json

import numpy as np
import pytest

from helix_tpu.dsl import DynamicQueryRequest, NodeRef, g, read_batch, write_batch
from helix_tpu.engine import Engine, EngineError

BASE = DynamicQueryRequest.read(
    read_batch()
    .var_as(
        "hits",
        g().vector_search_nodes("Doc", "emb", [1.0, 0.0], 3).value_map(["$id"]),
    )
    .var_as("count", g().n_with_label("Doc").out("REL").limit(2).count())
    .returning(["hits", "count"])
).encode()


def mangle(rng: np.random.Generator, node):
    """Randomly corrupt one location in a JSON tree."""
    choice = rng.random()
    if isinstance(node, dict) and node:
        key = str(rng.choice(list(node)))
        if choice < 0.25:
            node.pop(key)
        elif choice < 0.5:
            node[key] = None
        elif choice < 0.7:
            node[key] = 12345
        elif choice < 0.85:
            node["Bogus" + key] = node.pop(key)
        else:
            mangle(rng, node[key])
    elif isinstance(node, list) and node:
        i = int(rng.integers(0, len(node)))
        if choice < 0.3:
            node.pop(i)
        elif choice < 0.6:
            node[i] = {"Garbage": True}
        else:
            mangle(rng, node[i])


@pytest.mark.parametrize("seed", range(150))
def test_mangled_requests_fail_cleanly(seed):
    rng = np.random.default_rng(seed)
    engine = Engine()
    engine.execute(DynamicQueryRequest.write(
        write_batch()
        .var_as("idx", g().create_vector_index_nodes("Doc", "emb"))
        .var_as("d", g().add_n("Doc", {"emb": [1.0, 0.0]}))
        .var_as("d2", g().add_n("Doc", {"emb": [0.0, 1.0]}))
        .var_as("e", g().n(NodeRef.var("d")).add_e("REL", NodeRef.var("d2")))
    ).encode())

    request = copy.deepcopy(BASE)
    for _ in range(int(rng.integers(1, 9))):
        # Bias half the mutations into the step bodies, where tag
        # validation alone cannot protect the interpreter.
        if rng.random() < 0.5:
            try:
                target = request["query"]["queries"]
            except (KeyError, TypeError):
                target = request
            mangle(rng, target)
        else:
            mangle(rng, request)
    try:
        out = engine.execute(request)
        json.dumps(out)  # survivors must still serialize
    except EngineError:
        pass  # clean 400-class failure
    # Any other exception type fails the test (would surface as a 500).
