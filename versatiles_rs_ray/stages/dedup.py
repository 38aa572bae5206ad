"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Large-scale shapes (ray_guide.md "Aggregation at scale"):
- exact: content hash in map_batches -> groupby(hash) -> min doc keeps;
  the md5 here is the *deterministic oracle-parity* hash (DuckDB md5);
  a production run would swap in xxhash — same topology.
- MinHash/LSH: signatures per batch (vectorized universal hashing) ->
  explode to (band, band_hash, doc) -> groupby band key -> candidate
  pairs inside small groups -> exact-Jaccard verify. Hot buckets are
  bounded by `max_bucket` (documented cap, logged, not silent).
- SimHash: 64-bit signature, 4x16-bit band blocking, Hamming verify.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

_MERSENNE = np.uint64((1 << 61) - 1)
_MAX_BUCKET = 256  # cap on candidate-pair generation per LSH bucket


def md5_hex(texts) -> list:
    return [hashlib.md5((t or "").encode()).hexdigest() for t in texts]


def add_md5_batch(batch: pa.Table) -> pa.Table:
    return batch.append_column("text_md5", pa.array(md5_hex(batch["text"].to_pylist())))


def dedup_exact(docs_ds):
    """Survivors of exact-text dedup: (text_md5, keep_doc = min doc_num)."""
    from ray.data.aggregate import Count, Min

    hashed = docs_ds.map_batches(add_md5_batch, batch_format="pyarrow")
    return hashed.groupby("text_md5").aggregate(
        Min("doc_num", alias_name="keep_doc"), Count(alias_name="n_dupes")
    )


# ---- MinHash -----------------------------------------------------------


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Rolling k-byte shingle hashes of one doc (uint64, overflow ok)."""
    b = np.frombuffer((text or "").encode(), dtype=np.uint8).astype(np.uint64)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)), constant_values=0)
    n = len(b) - k + 1
    h = np.zeros(n, dtype=np.uint64)
    base = np.uint64(1000003)
    for j in range(k):
        h = h * base + b[j : j + n]
    return np.unique(h)


class MinHashSignatures:
    """map_batches actor: per-doc MinHash signature -> band rows.

    num_perm universal hash perms ((a*x + b) mod p, p = 2^61-1) applied
    to the shingle set; emitted as (band_id, band_hash, doc_num) rows
    ready for the LSH groupby. Permutation constants are seeded once in
    __init__ (per actor), deterministic across the cluster.
    """

    def __init__(self, k=5, num_perm=64, bands=8, seed=42):
        rng = np.random.default_rng(seed)
        self.k = k
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k) & _MERSENNE
        # (P, S) universal hashes -> min over shingles
        vals = (self.a[:, None] * sh[None, :] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        doc_num = np.asarray(batch["doc_num"], dtype=np.int64)
        sigs = np.stack([self.signature(t) for t in texts])  # (N, P)
        band_hash = np.empty((len(texts), self.bands), dtype=np.int64)
        base = np.uint64(1099511628211)
        for bd in range(self.bands):
            seg = sigs[:, bd * self.rows_per_band : (bd + 1) * self.rows_per_band]
            h = np.zeros(len(texts), dtype=np.uint64)
            for c in range(seg.shape[1]):
                h = h * base + seg[:, c].astype(np.uint64)
            band_hash[:, bd] = h.astype(np.int64)
        n, bcount = len(texts), self.bands
        return pa.table(
            {
                "band_id": pa.array(np.tile(np.arange(bcount, dtype=np.int64), n)),
                "band_hash": pa.array(band_hash.ravel(), type=pa.int64()),
                "doc_num": pa.array(np.repeat(doc_num, bcount), type=pa.int64()),
            }
        )


def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
    docs = np.unique(g["doc_num"].to_numpy())
    if len(docs) < 2:
        return pd.DataFrame({"doc_a": [], "doc_b": []}, dtype=np.int64)
    if len(docs) > _MAX_BUCKET:
        # cap hot buckets deterministically (keep lowest ids) and SAY so
        # — silent truncation would read as full coverage
        import logging

        logging.getLogger(__name__).warning(
            "LSH bucket capped: %d docs > %d; raise bands or _MAX_BUCKET",
            len(docs),
            _MAX_BUCKET,
        )
        docs = docs[:_MAX_BUCKET]
    ia, ib = np.triu_indices(len(docs), k=1)
    return pd.DataFrame({"doc_a": docs[ia], "doc_b": docs[ib]})


def minhash_candidates(docs_ds, k=5, num_perm=64, bands=8, seed=42):
    """Candidate near-dup pairs (doc_a < doc_b), deduplicated."""
    band_rows = docs_ds.map_batches(
        MinHashSignatures(k=k, num_perm=num_perm, bands=bands, seed=seed),
        batch_format="pyarrow",
        concurrency=4,
    )
    pairs = band_rows.groupby(["band_id", "band_hash"]).map_groups(
        _bucket_pairs, batch_format="pandas"
    )
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


class JaccardVerify:
    """Verify candidate pairs with exact shingle-set Jaccard.

    Broadcast side: dict doc_num -> text (built once per actor from a
    ray.put handle). At full scale this would be a co-partitioned
    lookup; for the verify stage the candidate set is small by design.
    For corpus-wide EXACT verification use ngram_jaccard_pairs below
    (inverted-index double exchange, no broadcast anywhere).
    """

    def __init__(self, texts_ref, k=5, threshold=0.6):
        import ray

        self.texts = ray.get(texts_ref) if not isinstance(texts_ref, dict) else texts_ref
        self.k = k
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["doc_a"], dtype=np.int64)
        b = np.asarray(batch["doc_b"], dtype=np.int64)
        jac = np.empty(len(a), dtype=np.float64)
        for i in range(len(a)):
            sa = _shingle_hashes(self.texts.get(int(a[i]), ""), self.k)
            sb = _shingle_hashes(self.texts.get(int(b[i]), ""), self.k)
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            jac[i] = inter / union if union else 1.0
        keep = jac >= self.threshold
        out = batch.filter(pa.array(keep))
        return out.append_column("jaccard", pa.array(jac[keep], type=pa.float64()))


def dup_groups_driver(pairs_df) -> "pd.DataFrame":
    """Duplicate-pair components via union-find (doc -> group leader).

    Driver-side: the verified-pair set is small by design (LSH prunes
    first). Returns (doc_num, group_id) with group_id = min doc in the
    component. For pair sets too large for the driver, use
    :func:`propagate_min_labels`.
    """
    parent = {}

    def find(a):
        while parent.get(a, a) != a:
            parent[a] = parent.get(parent[a], parent[a])
            a = parent[a]
        return a

    for a, b in zip(pairs_df["doc_a"], pairs_df["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    docs = sorted({int(v) for v in pairs_df["doc_a"]} | {int(v) for v in pairs_df["doc_b"]})
    return pd.DataFrame({"doc_num": docs, "group_id": [find(d) for d in docs]})


def propagate_min_labels(pairs_ds, max_rounds: int = 10):
    """Distributed connected components: iterative min-label propagation.

    Each round: labels flow across edges (union of both directions),
    groupby(doc).min(label). Converges in O(component diameter)
    rounds; LSH duplicate components are near-cliques so 2-3 rounds
    suffice in practice. The groupby inputs shrink to one row per doc
    after round one. Returns a Dataset (doc_num, group_id).
    """
    import ray.data as rd
    from ray.data.aggregate import Min

    def edges_both(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["doc_a"], dtype=np.int64)
        b = np.asarray(batch["doc_b"], dtype=np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b]), type=pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), type=pa.int64()),
            }
        )

    edges = pairs_ds.map_batches(edges_both, batch_format="pyarrow").materialize()
    # initial labels: label(doc) = min(doc, min neighbor)
    start = edges.map_batches(
        lambda t: pa.table(
            {
                "doc_num": t["src"],
                "label": pa.array(
                    np.minimum(
                        np.asarray(t["src"], dtype=np.int64),
                        np.asarray(t["dst"], dtype=np.int64),
                    ),
                    type=pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    labels = start.groupby("doc_num").aggregate(Min("label", alias_name="label")).materialize()
    for _ in range(max_rounds):
        prev_df = labels.to_pandas().sort_values("doc_num").reset_index(drop=True)
        # broadcast the label map for the relabel pass (at 10^9-doc
        # scale this becomes a co-partitioned join on dst instead)
        lmap = dict(zip(prev_df["doc_num"], prev_df["label"]))

        def relabel(batch: pa.Table, lmap=lmap) -> pa.Table:
            src = np.asarray(batch["src"], dtype=np.int64)
            dst = np.asarray(batch["dst"], dtype=np.int64)
            lab = np.asarray([lmap[int(d)] for d in dst], dtype=np.int64)
            return pa.table(
                {"doc_num": pa.array(src), "label": pa.array(lab, type=pa.int64())}
            )

        flowed = edges.map_batches(relabel, batch_format="pyarrow").union(labels)
        labels = flowed.groupby("doc_num").aggregate(
            Min("label", alias_name="label")
        ).materialize()
        cur_df = labels.to_pandas().sort_values("doc_num").reset_index(drop=True)
        if cur_df.equals(prev_df):
            break
    return labels.map_batches(
        lambda t: pa.table({"doc_num": t["doc_num"], "group_id": t["label"]}),
        batch_format="pyarrow",
    )


# ---- SimHash -----------------------------------------------------------


class SimHashSignatures:
    """64-bit SimHash over token hashes; emits 4x16-bit blocking bands."""

    def __init__(self, seed=42):
        self.seed = seed

    def _simhash(self, text: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        for w in (text or "").split():
            h = np.uint64(
                int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "little")
            )
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits.astype(bool), 1, -1)
        return int(sum((1 << i) for i in range(64) if acc[i] > 0))

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_num = np.asarray(batch["doc_num"], dtype=np.int64)
        sims = np.asarray(
            [self._simhash(t) for t in batch["text"].to_pylist()], dtype=np.uint64
        )
        n = len(doc_num)
        band_id = np.tile(np.arange(4, dtype=np.int64), n)
        band_val = np.empty(4 * n, dtype=np.int64)
        for bd in range(4):
            band_val[bd::4] = ((sims >> np.uint64(16 * bd)) & np.uint64(0xFFFF)).astype(np.int64)
        return pa.table(
            {
                "band_id": pa.array(band_id),
                "band_hash": pa.array(band_val),
                "doc_num": pa.array(np.repeat(doc_num, 4), type=pa.int64()),
                "simhash": pa.array(np.repeat(sims.astype(np.int64), 4), type=pa.int64()),
            }
        )


def simhash_candidates(docs_ds, max_hamming=3):
    """Near-dup pairs by SimHash banding + Hamming verification."""
    rows = docs_ds.map_batches(SimHashSignatures(), batch_format="pyarrow", concurrency=4)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_num").sort_values("doc_num")
        docs = g["doc_num"].to_numpy()
        sims = g["simhash"].to_numpy().astype(np.uint64)
        if len(docs) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []}, dtype=np.int64)
        if len(docs) > _MAX_BUCKET:
            docs, sims = docs[:_MAX_BUCKET], sims[:_MAX_BUCKET]
        ia, ib = np.triu_indices(len(docs), k=1)
        x = sims[ia] ^ sims[ib]
        ham = np.asarray([bin(int(v)).count("1") for v in x], dtype=np.int64)
        m = ham <= max_hamming
        return pd.DataFrame({"doc_a": docs[ia][m], "doc_b": docs[ib][m], "hamming": ham[m]})

    cand = rows.groupby(["band_id", "band_hash"]).map_groups(pairs, batch_format="pandas")
    return cand.groupby(["doc_a", "doc_b"]).map_groups(lambda g: g.head(1), batch_format="pandas")


# ---- n-gram Jaccard (exact, oracle-parity) -----------------------------
#
# Reference has no text dedup (SURVEY.md §2.7 "dedup: per-key
# first-wins only"); this is graft surface for the training-data
# pipeline. Topology = inverted-index join, all exact:
#   shingle (vectorized byte windows) -> exchange on gram -> pair-gen
#   within partition -> exchange on pair -> sum intersections ->
#   jaccard filter. Per-doc shingle counts ride along on every row, so
#   no broadcast/lookup join is needed anywhere.

_NGRAM_K_MAX = 15  # gram packs into 2 uint64 with length byte


def _shingle_rows(batch: pa.Table, k: int) -> pa.Table:
    """Distinct k-byte shingles per doc -> (route, hi, lo, doc, n_sh).

    Gram identity is its 16-byte zero-padded form as two uint64s plus
    the gram length in the final pad byte (k <= 15) — injective, no
    hash collisions, and 24 bytes/row through the exchange instead of
    a string column. Byte windows == DuckDB substr() char windows on
    ASCII corpora (the driver tables are ASCII; non-ASCII text still
    dedups correctly, it just isn't SQL-oracle-comparable).
    Fully vectorized: one strided gather builds every window, one
    lexsort dedups per doc.
    """
    assert 2 <= k <= _NGRAM_K_MAX
    texts = batch["text"]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    b = texts.cast(pa.binary())
    _, off_buf, data_buf = b.buffers()
    offs = np.frombuffer(off_buf, dtype=np.int32)[b.offset : b.offset + len(b) + 1]
    data = np.frombuffer(data_buf, dtype=np.uint8)
    doc_num = np.asarray(batch["doc_num"], dtype=np.int64)

    L = np.diff(offs).astype(np.int64)
    n_win = np.maximum(L - k + 1, 1)  # short docs -> one whole-text gram
    glen = np.minimum(L, k)
    doc_rep = np.repeat(np.arange(len(L), dtype=np.int64), n_win)
    total = int(n_win.sum())
    run_start = np.zeros(len(L), dtype=np.int64)
    run_start[1:] = np.cumsum(n_win)[:-1]
    within = np.arange(total, dtype=np.int64) - np.repeat(run_start, n_win)
    g_start = np.repeat(offs[:-1].astype(np.int64), n_win) + within
    g_len = np.repeat(glen, n_win)

    # gather windows into (N, 16) zero-padded, mask tail bytes of
    # short grams, stamp gram length into the spare 16th byte
    idx = g_start[:, None] + np.arange(k, dtype=np.int64)[None, :]
    idx = np.minimum(idx, len(data) - 1 if len(data) else 0)
    pad = np.zeros((total, 16), dtype=np.uint8)
    if len(data):
        pad[:, :k] = data[idx]
    col_mask = np.arange(k, dtype=np.int64)[None, :] >= g_len[:, None]
    pad[:, :k][col_mask] = 0
    pad[:, 15] = g_len.astype(np.uint8)
    u = pad.view(np.uint64).reshape(total, 2)
    hi, lo = u[:, 0].copy(), u[:, 1].copy()

    order = np.lexsort((lo, hi, doc_rep))
    dh, dhi, dlo = doc_rep[order], hi[order], lo[order]
    first = np.ones(total, dtype=bool)
    if total > 1:
        first[1:] = (dh[1:] != dh[:-1]) | (dhi[1:] != dhi[:-1]) | (dlo[1:] != dlo[:-1])
    sel = order[first]
    n_sh = np.bincount(doc_rep[sel], minlength=len(L)).astype(np.int64)

    s_hi = hi[sel].view(np.int64)
    s_lo = lo[sel].view(np.int64)
    route = (hi[sel] * np.uint64(0x9E3779B97F4A7C15) ^ lo[sel] * np.uint64(0xC2B2AE3D27D4EB4F)).view(np.int64)
    return pa.table(
        {
            "route": pa.array(route, type=pa.int64()),
            "hi": pa.array(s_hi, type=pa.int64()),
            "lo": pa.array(s_lo, type=pa.int64()),
            "doc": pa.array(doc_num[doc_rep[sel]], type=pa.int64()),
            "n_sh": pa.array(n_sh[doc_rep[sel]], type=pa.int64()),
        }
    )


def _gram_pairs_block(table: pa.Table) -> pa.Table:
    """One exchange partition: group rows by gram, emit doc pairs with
    per-partition intersection partial-sums. (a, b) ordered a < b."""
    hi = np.asarray(table["hi"], dtype=np.int64)
    lo = np.asarray(table["lo"], dtype=np.int64)
    doc = np.asarray(table["doc"], dtype=np.int64)
    n_sh = np.asarray(table["n_sh"], dtype=np.int64)

    order = np.lexsort((doc, lo, hi))
    hi, lo, doc, n_sh = hi[order], lo[order], doc[order], n_sh[order]
    n = len(doc)
    empty = pa.table(
        {
            "route": pa.array([], type=pa.int64()),
            "a": pa.array([], type=pa.int64()),
            "b": pa.array([], type=pa.int64()),
            "inter": pa.array([], type=pa.int64()),
            "n_a": pa.array([], type=pa.int64()),
            "n_b": pa.array([], type=pa.int64()),
        }
    )
    if n == 0:
        return empty
    new_run = np.ones(n, dtype=bool)
    new_run[1:] = (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])
    run_start = np.repeat(np.flatnonzero(new_run), np.diff(np.append(np.flatnonzero(new_run), n)))
    w = np.arange(n, dtype=np.int64) - run_start  # position within gram run
    total_pairs = int(w.sum())
    if total_pairs == 0:
        return empty
    # element g (the pair's b side) pairs with every earlier element of
    # its run: a indices = run_start[g] .. g-1
    b_idx = np.repeat(np.arange(n, dtype=np.int64), w)
    p_start = np.zeros(n, dtype=np.int64)
    p_start[1:] = np.cumsum(w)[:-1]
    intra = np.arange(total_pairs, dtype=np.int64) - np.repeat(p_start, w)
    a_idx = np.repeat(run_start, w) + intra

    a, b = doc[a_idx], doc[b_idx]
    na, nb = n_sh[a_idx], n_sh[b_idx]
    swap = a > b
    a2 = np.where(swap, b, a)
    b2 = np.where(swap, a, b)
    na2 = np.where(swap, nb, na)
    nb2 = np.where(swap, na, nb)

    # partial-sum intersections per (a, b) within this partition
    order2 = np.lexsort((b2, a2))
    a2, b2, na2, nb2 = a2[order2], b2[order2], na2[order2], nb2[order2]
    firstp = np.ones(total_pairs, dtype=bool)
    firstp[1:] = (a2[1:] != a2[:-1]) | (b2[1:] != b2[:-1])
    starts = np.flatnonzero(firstp)
    inter = np.diff(np.append(starts, total_pairs)).astype(np.int64)
    a3, b3, na3, nb3 = a2[starts], b2[starts], na2[starts], nb2[starts]
    route = (
        a3.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        ^ b3.view(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
    ).view(np.int64)
    return pa.table(
        {
            "route": pa.array(route, type=pa.int64()),
            "a": pa.array(a3, type=pa.int64()),
            "b": pa.array(b3, type=pa.int64()),
            "inter": pa.array(inter, type=pa.int64()),
            "n_a": pa.array(na3, type=pa.int64()),
            "n_b": pa.array(nb3, type=pa.int64()),
        }
    )


def _sum_pairs_block(table: pa.Table) -> pa.Table:
    """Second exchange: total intersection per (a, b)."""
    a = np.asarray(table["a"], dtype=np.int64)
    b = np.asarray(table["b"], dtype=np.int64)
    inter = np.asarray(table["inter"], dtype=np.int64)
    n_a = np.asarray(table["n_a"], dtype=np.int64)
    n_b = np.asarray(table["n_b"], dtype=np.int64)
    order = np.lexsort((b, a))
    a, b, inter, n_a, n_b = a[order], b[order], inter[order], n_a[order], n_b[order]
    first = np.ones(len(a), dtype=bool)
    if len(a) > 1:
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    starts = np.flatnonzero(first)
    sums = np.add.reduceat(inter, starts) if len(a) else inter
    return pa.table(
        {
            "doc_a": pa.array(a[starts], type=pa.int64()),
            "doc_b": pa.array(b[starts], type=pa.int64()),
            "inter": pa.array(sums, type=pa.int64()),
            "n_a": pa.array(n_a[starts], type=pa.int64()),
            "n_b": pa.array(n_b[starts], type=pa.int64()),
        }
    )


def ngram_jaccard_pairs(docs_ds, k: int = 12, threshold: float = 0.5, num_buckets: int = 32):
    """Exact n-gram Jaccard near-dup pairs over the docs table.

    Returns (doc_a, doc_b, inter, jaccard) for every unordered doc
    pair with jaccard(distinct k-gram sets) >= threshold. EXACT (no
    LSH approximation): the inverted-index join generates a pair
    candidate per shared gram, partial-summed inside each partition
    before the pair exchange — the same combiner-before-shuffle shape
    as the pyramid. Skew: a gram shared by m docs in one partition
    emits m(m-1)/2 partials; at web scale drop top-frequency grams
    upstream (they carry no Jaccard signal) — not done here because
    the oracle comparison must stay exact.
    """
    import functools

    from .exchange import hash_exchange

    shingles = docs_ds.map_batches(
        functools.partial(_shingle_rows, k=k), batch_format="pyarrow"
    )
    partial_pairs = hash_exchange(
        shingles, "route", _gram_pairs_block, num_partitions=num_buckets
    )
    totals = hash_exchange(
        partial_pairs, "route", _sum_pairs_block, num_partitions=max(2, num_buckets // 4)
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_a" not in t.column_names:
            return pa.table(
                {
                    "doc_a": pa.array([], type=pa.int64()),
                    "doc_b": pa.array([], type=pa.int64()),
                    "inter": pa.array([], type=pa.int64()),
                    "jaccard": pa.array([], type=pa.float64()),
                }
            )
        inter = np.asarray(t["inter"], dtype=np.int64)
        n_a = np.asarray(t["n_a"], dtype=np.int64)
        n_b = np.asarray(t["n_b"], dtype=np.int64)
        j = inter / (n_a + n_b - inter)
        keep = j >= threshold
        return pa.table(
            {
                "doc_a": pa.array(np.asarray(t["doc_a"], dtype=np.int64)[keep], type=pa.int64()),
                "doc_b": pa.array(np.asarray(t["doc_b"], dtype=np.int64)[keep], type=pa.int64()),
                "inter": pa.array(inter[keep], type=pa.int64()),
                "jaccard": pa.array(j[keep], type=pa.float64()),
            }
        )

    return totals.map_batches(finish, batch_format="pyarrow")


# ---- distributed connected components (co-partitioned propagation) -----


def _edges_rows(table: pa.Table) -> pa.Table:
    a = np.asarray(table["doc_a"], dtype=np.int64)
    b = np.asarray(table["doc_b"], dtype=np.int64)
    return pa.table(
        {
            "src": pa.array(np.concatenate([a, b]), type=pa.int64()),
            "dst": pa.array(np.concatenate([b, a]), type=pa.int64()),
        }
    )


def _split_by(table: pa.Table, col: str, p: int):
    """One routing implementation for the whole engine: the exchange's
    split (same hash, same slicing) — co-partitioning of labels and
    edges is guaranteed by construction, not by parallel code."""
    from .exchange import _split_block

    return _split_block(col, p, table)


def _cc_edges_split(p: int, *tables):
    """Route edge rows by hash(dst) — static across rounds."""
    t = pa.concat_tables([x for x in tables if x.num_rows], promote_options="default") \
        if any(x.num_rows for x in tables) else tables[0]
    return _split_by(t, "dst", p)


def _cc_init_labels(p: int, *tables):
    """Initial labels (doc=src, label=min(src,dst)) routed by hash(doc),
    combined per doc within this partition's slice."""
    ok = [x for x in tables if x.num_rows]
    if not ok:
        empty = pa.table({"doc_num": pa.array([], type=pa.int64()),
                          "label": pa.array([], type=pa.int64())})
        return tuple(empty for _ in range(p))
    t = pa.concat_tables(ok, promote_options="default")
    src = np.asarray(t["src"], dtype=np.int64)
    dst = np.asarray(t["dst"], dtype=np.int64)
    lab = pa.table(
        {
            "doc_num": pa.array(src, type=pa.int64()),
            "label": pa.array(np.minimum(src, dst), type=pa.int64()),
        }
    )
    return tuple(_cc_min_by_doc(x) for x in _split_by(lab, "doc_num", p))


def _cc_min_by_doc(table: pa.Table) -> pa.Table:
    doc = np.asarray(table["doc_num"], dtype=np.int64)
    lab = np.asarray(table["label"], dtype=np.int64)
    if not len(doc):
        return table
    uniq, inv = np.unique(doc, return_inverse=True)
    mn = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(mn, inv, lab)
    return pa.table(
        {"doc_num": pa.array(uniq, type=pa.int64()), "label": pa.array(mn, type=pa.int64())}
    )


def _cc_merge_labels(*slices):
    ok = [s for s in slices if s.num_rows]
    if not ok:
        return slices[0]
    return _cc_min_by_doc(pa.concat_tables(ok, promote_options="default"))


def _cc_join_flow(labels_p: pa.Table, p: int, *edges_slices):
    """One round, join side: label(dst) flows to src; outputs split by
    hash(src). Co-partitioning guarantees every dst in edges_p has its
    label in labels_p (same hash, same p)."""
    ok = [e for e in edges_slices if e.num_rows]
    if not ok or labels_p.num_rows == 0:
        empty = pa.table({"doc_num": pa.array([], type=pa.int64()),
                          "label": pa.array([], type=pa.int64())})
        return tuple(empty for _ in range(p))
    edges_p = ok[0] if len(ok) == 1 else pa.concat_tables(ok, promote_options="default")
    dst = np.asarray(edges_p["dst"], dtype=np.int64)
    src = np.asarray(edges_p["src"], dtype=np.int64)
    docs = np.asarray(labels_p["doc_num"], dtype=np.int64)  # sorted (from _cc_min_by_doc)
    labs = np.asarray(labels_p["label"], dtype=np.int64)
    pos = np.searchsorted(docs, dst)
    pos = np.minimum(pos, len(docs) - 1)
    lab = labs[pos]
    flowed = pa.table(
        {"doc_num": pa.array(src, type=pa.int64()), "label": pa.array(lab, type=pa.int64())}
    )
    return tuple(_cc_min_by_doc(x) for x in _split_by(flowed, "doc_num", p))


def _cc_combine(labels_p: pa.Table, *flow_slices):
    """One round, reduce side: new label = min(old, flowed); returns
    (new_labels, n_changed)."""
    parts = [labels_p, *[s for s in flow_slices if s.num_rows]]
    merged = _cc_min_by_doc(pa.concat_tables(parts, promote_options="default"))
    # changed count vs old (docs never appear/disappear across rounds)
    old_doc = np.asarray(labels_p["doc_num"], dtype=np.int64)
    old_lab = np.asarray(labels_p["label"], dtype=np.int64)
    new_lab = np.asarray(merged["label"], dtype=np.int64)
    changed = int((old_lab != new_lab).sum()) if len(old_doc) == len(new_lab) else len(new_lab)
    return merged, changed


def propagate_min_labels_exchange(pairs_ds, max_rounds: int = 64, num_partitions: int = 16):
    """Distributed connected components with NO driver-side label map.

    Labels and edges share one hash partitioning (co-partitioned
    join): each round, partition p joins its dst-routed edges against
    its labels (searchsorted — labels are sorted per partition), the
    flowed (src, label) rows split back by hash(src), and a reduce
    takes per-doc mins. The driver only ever sees P change-counts per
    round. Replaces the broadcast-dict relabel (propagate_min_labels)
    at corpus scale; equality is pytest-verified.

    Runs until a full round changes nothing (min-label propagation
    needs O(component diameter) rounds); ``max_rounds`` is a safety
    cap and exhausting it RAISES rather than silently returning
    unconverged labels.
    """
    import ray
    import ray.data as rd

    p = num_partitions
    edges_rows = pairs_ds.map_batches(_edges_rows, batch_format="pyarrow")
    refs = edges_rows.to_arrow_refs()
    if not refs:
        return rd.from_arrow(
            pa.table({"doc_num": pa.array([], type=pa.int64()),
                      "group_id": pa.array([], type=pa.int64())})
        )
    split_edges = ray.remote(num_returns=p)(_cc_edges_split)
    init_labels = ray.remote(num_returns=p)(_cc_init_labels)
    merge_labels = ray.remote(_cc_merge_labels)
    join_flow = ray.remote(num_returns=p)(_cc_join_flow)
    combine = ray.remote(num_returns=2)(_cc_combine)

    # shard the one-time split/init over ref groups so no single task
    # holds the whole edge set
    groups = [refs[i : i + 8] for i in range(0, len(refs), 8)]
    edge_lists = [split_edges.remote(p, *g) for g in groups]
    init_lists = [init_labels.remote(p, *g) for g in groups]
    edge_parts = [[el[i] for el in edge_lists] for i in range(p)]
    label_parts = [merge_labels.remote(*[il[i] for il in init_lists]) for i in range(p)]
    changed = None
    for _ in range(max_rounds):
        flow_lists = [
            join_flow.remote(label_parts[i], p, *edge_parts[i]) for i in range(p)
        ]
        outs = [
            combine.remote(label_parts[q], *[fl[q] for fl in flow_lists])
            for q in range(p)
        ]
        label_parts = [o[0] for o in outs]
        changed = sum(ray.get([o[1] for o in outs]))
        if changed == 0:
            break
    if changed:
        raise RuntimeError(
            f"label propagation did not converge in {max_rounds} rounds "
            f"({changed} labels still changing); raise max_rounds — a "
            f"component's diameter exceeds the cap"
        )

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"doc_num": t["doc_num"], "group_id": t["label"]})

    return rd.from_arrow_refs(label_parts).map_batches(rename, batch_format="pyarrow")
