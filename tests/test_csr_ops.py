"""Device traversal kernels vs a NumPy BFS oracle."""

import numpy as np
import pytest

from helix_tpu.ops.csr import PaddedGraph, hybrid_expand, khop_count, khop_mask


@pytest.fixture(scope="module")
def graph():
    rng = np.random.default_rng(7)
    n, avg_deg = 500, 6
    edges = []
    for src in range(n):
        for dst in rng.integers(0, n, rng.poisson(avg_deg)):
            edges.append((src, int(dst), int(rng.integers(0, 3))))
    edges.sort()
    src = np.array([e[0] for e in edges])
    dst = np.array([e[1] for e in edges], np.int32)
    lab = np.array([e[2] for e in edges], np.int32)
    counts = np.bincount(src, minlength=n)
    indptr = np.concatenate(([0], np.cumsum(counts)))
    return n, indptr, dst, lab


def bfs_oracle(n, indptr, dst, lab, start, hops, label_code):
    mask = np.zeros(n, bool)
    mask[start] = True
    for _ in range(hops):
        nxt = np.zeros(n, bool)
        for u in np.nonzero(mask)[0]:
            for j in range(indptr[u], indptr[u + 1]):
                if label_code < 0 or lab[j] == label_code:
                    nxt[dst[j]] = True
        mask = nxt
    return mask


def test_padded_graph_khop_matches_bfs(graph):
    n, indptr, dst, lab = graph
    padded = PaddedGraph.from_csr(indptr, dst, lab, n)
    assert padded is not None
    start = np.zeros(n, bool)
    start[[0, 17, 123]] = True
    import jax.numpy as jnp

    for hops in (1, 2, 3):
        for code in (-1, 1):
            got = np.asarray(
                khop_mask(
                    padded.neighbors, padded.edge_labels,
                    jnp.asarray(start), jnp.int32(code), hops,
                )
            )
            want = bfs_oracle(n, indptr, dst, lab, [0, 17, 123], hops, code)
            assert np.array_equal(got, want), (hops, code)


def test_khop_count_with_filter(graph):
    n, indptr, dst, lab = graph
    padded = PaddedGraph.from_csr(indptr, dst, lab, n)
    import jax.numpy as jnp

    start = np.zeros(n, bool)
    start[0] = True
    keep = np.zeros(n, bool)
    keep[: n // 2] = True  # predicate: slot < n/2
    got = int(
        khop_count(
            padded.neighbors, padded.edge_labels,
            jnp.asarray(start), jnp.int32(-1), 2, jnp.asarray(keep),
        )
    )
    want = int((bfs_oracle(n, indptr, dst, lab, [0], 2, -1) & keep).sum())
    assert got == want


def test_hybrid_expand(graph):
    n, indptr, dst, lab = graph
    padded = PaddedGraph.from_csr(indptr, dst, lab, n)
    import jax.numpy as jnp

    seeds = np.array([5, 9, 300], np.int32)
    keep = np.ones(n, bool)
    mask, count = hybrid_expand(
        padded.neighbors, padded.edge_labels,
        jnp.asarray(np.pad(seeds, (0, 7), constant_values=n)),
        jnp.int32(-1), 1, jnp.asarray(keep),
    )
    want = bfs_oracle(n, indptr, dst, lab, seeds.tolist(), 1, -1)
    assert np.array_equal(np.asarray(mask), want)
    assert int(count) == int(want.sum())


def test_degree_cap_returns_none():
    indptr = np.array([0, 300])
    dst = np.zeros(300, np.int32)
    lab = np.zeros(300, np.int32)
    assert PaddedGraph.from_csr(indptr, dst, lab, 1, max_degree_cap=256) is None


def test_adaptive_hop_tiers_match_oracle():
    """Both the compact tier (small frontier) and the dense fallback
    (frontier above every tier) must agree with a NumPy BFS oracle at a
    size where the tier conds genuinely branch (n > 4096)."""
    import jax.numpy as jnp

    from helix_tpu.ops.csr import PaddedGraph, khop_mask

    rng = np.random.default_rng(12)
    n, deg = 10_000, 4
    dst = rng.integers(0, n, size=n * deg).astype(np.int32)
    lab = rng.integers(0, 3, size=n * deg).astype(np.int32)
    indptr = np.arange(n + 1, dtype=np.int64) * deg
    g = PaddedGraph.from_csr(indptr, dst, lab, n)

    def oracle(mask, code, hops):
        out = np.asarray(mask)
        for _ in range(hops):
            nxt = np.zeros(n, bool)
            for u in np.nonzero(out)[0]:
                sel = (lab[indptr[u]:indptr[u + 1]] == code) if code >= 0 \
                    else np.ones(deg, bool)
                nxt[dst[indptr[u]:indptr[u + 1]][sel]] = True
            out = nxt
        return out

    small = rng.random(n) < 0.01   # ~100 live -> compact tier 4096
    large = rng.random(n) < 0.9    # ~9000 live -> dense fallback
    for start, code, hops in [
        (small, 1, 2), (small, -1, 1), (large, 0, 1), (large, -1, 2),
    ]:
        got = np.asarray(khop_mask(
            g.neighbors, g.edge_labels, jnp.asarray(start),
            jnp.int32(code), hops,
        ))
        np.testing.assert_array_equal(got, oracle(start, code, hops),
                                      err_msg=f"code={code} hops={hops}")
