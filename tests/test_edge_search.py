"""Edge vector/text search contract: $id/$from/$to/$distance on hits,
re-seeding traversals from edge-hit variables (reference dsl.rs:129-155,
edge examples :263-283)."""

import pytest

from helix_tpu.dsl import (
    DynamicQueryRequest, EdgeRef, NodeRef, g, read_batch, write_batch,
)
from helix_tpu.engine import Engine


@pytest.fixture
def engine():
    eng = Engine()
    eng.execute(DynamicQueryRequest.write(
        write_batch()
        .var_as("vec_idx", g().create_vector_index_edges("SIMILAR", "embedding"))
        .var_as("txt_idx", g().create_text_index_edges("SIMILAR", "note"))
        .var_as("a", g().add_n("Doc", {"title": "A"}))
        .var_as("b", g().add_n("Doc", {"title": "B"}))
        .var_as("c", g().add_n("Doc", {"title": "C"}))
        .var_as(
            "e1",
            g().n(NodeRef.var("a")).add_e("SIMILAR", NodeRef.var("b"), {
                "embedding": [1.0, 0.0], "note": "strong match between docs",
            }),
        )
        .var_as(
            "e2",
            g().n(NodeRef.var("b")).add_e("SIMILAR", NodeRef.var("c"), {
                "embedding": [0.0, 1.0], "note": "weak partial overlap",
            }),
        )
    ).encode())
    return eng


def read(eng, batch):
    return eng.execute(DynamicQueryRequest.read(batch).encode())


def test_edge_vector_hits_expose_endpoints_and_distance(engine):
    out = read(
        engine,
        read_batch().var_as(
            "hits",
            g().vector_search_edges("SIMILAR", "embedding", [1.0, 0.05], 2)
            .edge_properties(),
        ),
    )
    hits = out["hits"]
    assert len(hits) == 2
    first = hits[0]
    assert first["note"].startswith("strong")
    assert {"$id", "$from", "$to", "$distance"} <= set(first)
    assert hits[0]["$distance"] <= hits[1]["$distance"]


def test_edge_hits_reseed_traversal(engine):
    out = read(
        engine,
        read_batch()
        .var_as(
            "edge_hits",
            g().vector_search_edges("SIMILAR", "embedding", [1.0, 0.0], 1),
        )
        .var_as(
            "targets",
            g().e(EdgeRef.var("edge_hits")).out_n().values(["title"]),
        )
        .var_as(
            "sources",
            g().e(EdgeRef.var("edge_hits")).in_n().values(["title"]),
        )
        .returning(["targets", "sources"]),
    )
    # e1 runs a->b: OutN = source endpoint (a), InN = target endpoint (b).
    assert out["targets"] == ["A"]
    assert out["sources"] == ["B"]


def test_metadata_lost_after_leaving_hit_stream(engine):
    out = read(
        engine,
        read_batch().var_as(
            "rows",
            g().vector_search_edges("SIMILAR", "embedding", [1.0, 0.0], 1)
            .out_n()
            .value_map(["title", "$distance"]),
        ),
    )
    row = out["rows"][0]
    assert "title" in row and "$distance" not in row


def test_edge_text_search_scores(engine):
    out = read(
        engine,
        read_batch().var_as(
            "hits",
            g().text_search_edges("SIMILAR", "note", "strong match", 2)
            .value_map(["$score", "note"]),
        ),
    )
    hits = out["hits"]
    assert hits[0]["note"].startswith("strong")
    assert all("$score" in h for h in hits)
    scores = [h["$score"] for h in hits]
    assert scores == sorted(scores, reverse=True)
