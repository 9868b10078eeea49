"""Device BM25 scoring: padded postings + scatter-add accumulation.

The device path for large text corpora (the host inverted index in
``engine/text.py`` stays authoritative and serves small partitions).
Layout mirrors the traversal kernels: postings become a padded
``[T, P]`` doc-slot matrix with a parallel term-frequency matrix, and a
query scores by scatter-adding each query term's weighted contributions
into a dense ``[N]`` score vector — static shapes throughout (query
terms padded to ``MAX_QUERY_TERMS``).

Okapi BM25 with the same constants as the host index (k1=1.2, b=0.75).
Scores agree with the host path to float32 precision (the host
accumulates in float64, the kernel in float32 scatter-adds, so
near-tied docs below one f32 ulp apart can rank differently across the
path threshold).  Top-k MEMBERSHIP under exact ties matches the host
rule (-score, doc id) by construction: doc slots are assigned in
ascending doc-id order, and ``lax.top_k`` breaks ties by lowest slot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

K1 = 1.2
B = 0.75
MAX_QUERY_TERMS = 16


def _prepare_terms(vocab, df, n_docs, tokens):
    """Shared query prep for the single-device and sharded paths:
    ``(terms, idf)`` padded to MAX_QUERY_TERMS, ``None`` when the query
    has more known terms than the pad (caller -> host path), or
    ``(None, None)`` when nothing matched the vocabulary."""
    import math

    rows, idfs = [], []
    for token in tokens:
        row = vocab.get(token)
        if row is None:
            continue
        rows.append(row)
        d = df[row]
        idfs.append(math.log(1.0 + (n_docs - d + 0.5) / (d + 0.5)))
    if len(rows) > MAX_QUERY_TERMS:
        return None
    if not rows:
        return (None, None)
    pad = MAX_QUERY_TERMS - len(rows)
    return (
        np.array(rows + [-1] * pad, np.int32),
        np.array(idfs + [0.0] * pad, np.float32),
    )


def _finalize(scores, slots, slot_to_doc):
    """Shared postprocess: drop zero scores, map slots to doc ids, and
    order by (-score, id) — membership already matches the host rule
    because slots are id-ordered (see the build methods)."""
    scores = np.asarray(scores, np.float64)
    slots = np.asarray(slots)
    keep = scores > 0
    ids = slot_to_doc[slots[keep]].astype(np.uint64)
    vals = scores[keep]
    order = np.lexsort((ids, -vals))
    return ids[order], vals[order]


@functools.partial(jax.jit, static_argnames=("k",))
def bm25_scores(
    post_docs: jax.Array,    # [T, P] int32 doc slots, pad = N
    post_tf: jax.Array,      # [T, P] float32 term frequencies
    doc_len: jax.Array,      # [N] float32
    avgdl: jax.Array,        # scalar float32
    query_terms: jax.Array,  # [Q] int32 term rows, pad = -1
    query_idf: jax.Array,    # [Q] float32 (0 for pads)
    *,
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Top-k (scores desc, doc slots) for one query."""
    n = doc_len.shape[0]
    safe_terms = jnp.clip(query_terms, 0, post_docs.shape[0] - 1)
    docs = post_docs[safe_terms]                     # [Q, P]
    tf = post_tf[safe_terms]                         # [Q, P]
    term_valid = (query_terms >= 0)[:, None]
    doc_valid = docs < n
    safe_docs = jnp.where(doc_valid, docs, 0)
    dl = doc_len[safe_docs]
    denom = tf + K1 * (1.0 - B + B * dl / jnp.maximum(avgdl, 1e-9))
    contrib = query_idf[:, None] * (tf * (K1 + 1.0)) / jnp.maximum(denom, 1e-9)
    contrib = jnp.where(term_valid & doc_valid, contrib, 0.0)
    target = jnp.where(term_valid & doc_valid, docs, n)
    scores = jnp.zeros(n + 1, jnp.float32).at[target.reshape(-1)].add(
        contrib.reshape(-1)
    )[:n]
    top, idx = jax.lax.top_k(scores, min(k, n))
    return top, idx


class DevicePostings:
    """Device-ready postings built from the host inverted index."""

    def __init__(
        self,
        vocab: dict[str, int],
        post_docs: jax.Array,
        post_tf: jax.Array,
        doc_len: jax.Array,
        avgdl: float,
        slot_to_doc: np.ndarray,
        n_docs: int,
        df: np.ndarray,
    ):
        self.vocab = vocab
        self.post_docs = post_docs
        self.post_tf = post_tf
        self.doc_len = doc_len
        self.avgdl = avgdl
        self.slot_to_doc = slot_to_doc
        self.n_docs = n_docs
        self.df = df

    @staticmethod
    def build(
        postings: dict[str, dict[int, int]],
        doc_len: dict[int, int],
        max_postings_cap: int = 1 << 16,
    ) -> "DevicePostings | None":
        """Pack the host index; None when a term's postings exceed the cap
        (ultra-common terms — callers keep the host path)."""
        n = len(doc_len)
        if n == 0:
            return None
        # Slot order IS the tie-break order: lax.top_k keeps the
        # lowest slot among equal scores, so ascending-id slots make
        # device membership match the host's (-score, id) rule even
        # when ties straddle rank k.
        slot_to_doc = np.sort(np.fromiter(doc_len.keys(), np.int64, count=n))
        doc_to_slot = {int(d): i for i, d in enumerate(slot_to_doc)}
        lengths = np.array(
            [doc_len[int(d)] for d in slot_to_doc], np.float32
        )
        terms = sorted(postings.keys())
        widths = [len(postings[t]) for t in terms]
        p = max(widths) if widths else 1
        if p > max_postings_cap:
            return None
        t = max(len(terms), 1)
        docs = np.full((t, p), n, np.int32)
        tf = np.zeros((t, p), np.float32)
        df = np.zeros(t, np.int64)
        for row, term in enumerate(terms):
            bucket = postings[term]
            df[row] = len(bucket)
            for col, (doc, freq) in enumerate(bucket.items()):
                docs[row, col] = doc_to_slot[doc]
                tf[row, col] = freq
        return DevicePostings(
            {term: i for i, term in enumerate(terms)},
            jnp.asarray(docs),
            jnp.asarray(tf),
            jnp.asarray(lengths),
            float(lengths.sum() / n),
            slot_to_doc,
            n,
            df,
        )

    def search(self, tokens: list[str], k: int) -> tuple[np.ndarray, np.ndarray] | None:
        """(doc ids, scores desc) for tokenized query text.

        Returns ``None`` when the query has more KNOWN terms than the
        kernel's pad width — the caller serves it on the host path so
        results never silently drop terms.  Unknown tokens are filtered
        BEFORE the cap (they score nothing on either path)."""
        prepared = _prepare_terms(self.vocab, self.df, self.n_docs, tokens)
        if prepared is None:
            return None
        terms, idf = prepared
        if terms is None:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        scores, slots = bm25_scores(
            self.post_docs, self.post_tf, self.doc_len,
            jnp.float32(self.avgdl),
            jnp.asarray(terms), jnp.asarray(idf), k=k,
        )
        return _finalize(scores, slots, self.slot_to_doc)


class ShardedBM25:
    """Multi-chip BM25: documents partition across the mesh, each shard
    scores its slice with the same Okapi kernel (global IDF/avgdl travel
    with the query), and an ICI all-gather merges per-shard top-k —
    completing the mesh story for the text workload family alongside
    vectors (exact + int8) and graph traversal.

    Per-shard postings widths shrink roughly by the shard count, so the
    stacked layout costs about the same memory as the single-device
    padding."""

    def __init__(self, mesh, vocab, docs, tf, dl, rows_per_shard,
                 avgdl, slot_to_doc, n_docs, df):
        self.mesh = mesh
        self.vocab = vocab
        self.docs = docs            # [S, T, P] device, sharded on axis 0
        self.tf = tf
        self.dl = dl                # [S, rows]
        self.rows_per_shard = rows_per_shard
        self.avgdl = avgdl
        self.slot_to_doc = slot_to_doc  # [S * rows] host (0 pads)
        self.n_docs = n_docs
        self.df = df
        self._fn_cache: dict[int, object] = {}

    @staticmethod
    def build(postings, doc_len, mesh, max_postings_cap: int = 1 << 16):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        n = len(doc_len)
        if n == 0:
            return None
        n_shard = int(mesh.shape["shard"])
        rows = -(-n // n_shard)
        rows = ((rows + 127) // 128) * 128
        slot_to_doc_full = np.zeros(n_shard * rows, np.int64)
        # ascending-id assignment: within a shard lax.top_k's
        # lowest-slot tie-break = lowest id, and the shard-major merge
        # flatten prefers earlier shards = lower ids — together the
        # host's (-score, id) membership rule, exactly
        all_docs = np.sort(np.fromiter(doc_len.keys(), np.int64, count=n))
        lengths_full = np.zeros(n_shard * rows, np.float32)
        doc_to_local: dict[int, tuple[int, int]] = {}
        for i, doc in enumerate(all_docs):
            shard, local = divmod(i, rows)
            doc_to_local[int(doc)] = (shard, local)
            slot_to_doc_full[shard * rows + local] = doc
            lengths_full[shard * rows + local] = doc_len[int(doc)]
        terms = sorted(postings.keys())
        t = max(len(terms), 1)
        # per-shard max postings width
        width = 1
        for term in terms:
            counts = np.zeros(n_shard, np.int64)
            for doc in postings[term]:
                counts[doc_to_local[doc][0]] += 1
            width = max(width, int(counts.max()))
        if width > max_postings_cap:
            return None
        docs = np.full((n_shard, t, width), rows, np.int32)
        tf = np.zeros((n_shard, t, width), np.float32)
        df = np.zeros(t, np.int64)
        fill = np.zeros((n_shard, t), np.int32)
        for row, term in enumerate(terms):
            bucket = postings[term]
            df[row] = len(bucket)
            for doc, freq in bucket.items():
                shard, local = doc_to_local[doc]
                col = fill[shard, row]
                docs[shard, row, col] = local
                tf[shard, row, col] = freq
                fill[shard, row] += 1
        spec = NamedSharding(mesh, P("shard", None, None))
        return ShardedBM25(
            mesh,
            {term: i for i, term in enumerate(terms)},
            jax.device_put(docs, spec),
            jax.device_put(tf, spec),
            jax.device_put(
                lengths_full.reshape(n_shard, rows),
                NamedSharding(mesh, P("shard", None)),
            ),
            rows,
            float(lengths_full.sum() / n),
            slot_to_doc_full,
            n,
            df,
        )

    def _fn(self, k: int):
        import jax
        from jax.sharding import PartitionSpec as P

        fn = self._fn_cache.get(k)
        if fn is not None:
            return fn
        rows = self.rows_per_shard
        n_shard = int(self.mesh.shape["shard"])
        k_local = min(k, rows)

        def shard_fn(docs, tf, dl, terms, idf, avgdl):
            docs = docs[0]          # [T, P] local block
            tf = tf[0]
            dl = dl[0]              # [rows]
            shard_id = jax.lax.axis_index("shard")
            scores, idx = bm25_scores(
                docs, tf, dl, avgdl, terms, idf, k=k_local
            )
            global_idx = idx + shard_id * rows
            all_s = jax.lax.all_gather(scores, "shard", axis=0)  # [S, k]
            all_i = jax.lax.all_gather(global_idx, "shard", axis=0)
            flat_s = all_s.reshape(n_shard * k_local)
            flat_i = all_i.reshape(n_shard * k_local)
            top, pos = jax.lax.top_k(flat_s, min(k, n_shard * k_local))
            return top, flat_i[pos]

        fn = jax.jit(jax.shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=(
                P("shard", None, None), P("shard", None, None),
                P("shard", None), P(), P(), P(),
            ),
            out_specs=(P(), P()),
            check_vma=False,
        ))
        self._fn_cache[k] = fn
        return fn

    def search(self, tokens: list[str], k: int):
        """(doc ids, scores desc) — None when the query exceeds the
        kernel's term pad (caller serves on the host path)."""
        prepared = _prepare_terms(self.vocab, self.df, self.n_docs, tokens)
        if prepared is None:
            return None
        terms, idf = prepared
        if terms is None:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        scores, slots = self._fn(k)(
            self.docs, self.tf, self.dl,
            jnp.asarray(terms), jnp.asarray(idf),
            jnp.float32(self.avgdl),
        )
        return _finalize(scores, slots, self.slot_to_doc)
