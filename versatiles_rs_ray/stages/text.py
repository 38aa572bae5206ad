"""Text analysis stages: token stats, quality scoring, language ID,
document fingerprinting.

All per-batch and vectorized/C-speed; the token semantics are chosen to
be exactly reproducible in DuckDB SQL (see queries.py):
``tokens = text.split()`` == ``regexp_split_to_array(trim(text), '\\s+')``
(empty text -> 0 tokens).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

STOPWORDS = ("the", "and", "of", "a", "to", "in", "is")

# tiny per-language stopword profiles for the heuristic language id
# (n-gram/stopword heuristic — the no-model baseline)
LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "for", "with"},
    "de": {"der", "die", "und", "das", "ist", "mit", "für", "von"},
    "fr": {"le", "la", "et", "les", "des", "est", "pour", "avec"},
    "es": {"el", "la", "los", "las", "es", "para", "con", "una"},
    "zh": set(),  # no-space scripts fall through to the char heuristic
}

_FP_BASE = np.uint64(1000003)
_FP_K = 8  # fingerprint shingle length (bytes)


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """doc_id, n_tokens, n_stop, max_token_len per document."""
    texts = batch["text"].to_pylist()
    n_tokens = np.empty(len(texts), dtype=np.int64)
    n_stop = np.empty(len(texts), dtype=np.int64)
    max_len = np.empty(len(texts), dtype=np.int64)
    stop = set(STOPWORDS)
    for i, t in enumerate(texts):
        toks = (t or "").split()
        n_tokens[i] = len(toks)
        n_stop[i] = sum(1 for w in toks if w in stop)
        max_len[i] = max((len(w) for w in toks), default=0)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": batch["n_chars"],
            "n_tokens": pa.array(n_tokens, type=pa.int64()),
            "n_stop": pa.array(n_stop, type=pa.int64()),
            "max_token_len": pa.array(max_len, type=pa.int64()),
        }
    )


def quality_batch(batch: pa.Table) -> pa.Table:
    """Heuristic quality signals + integer quality bucket.

    bucket = 2 (good) if 10 <= n_tokens and mean token length in [3, 12]
    and stopword ratio >= 5%; 1 (mid) if 3 <= n_tokens; else 0.
    Expressed with integer comparisons only so SQL mirrors exactly:
    mean-len test as  3*n_tokens <= alpha_chars <= 12*n_tokens,
    stop test as      20*n_stop >= n_tokens.
    """
    stats = token_stats_batch(batch)
    n_tokens = np.asarray(stats["n_tokens"])
    n_stop = np.asarray(stats["n_stop"])
    texts = batch["text"].to_pylist()
    alpha = np.asarray([sum(len(w) for w in (t or "").split()) for t in texts], dtype=np.int64)
    good = (
        (n_tokens >= 10)
        & (3 * n_tokens <= alpha)
        & (alpha <= 12 * n_tokens)
        & (20 * n_stop >= n_tokens)
    )
    mid = n_tokens >= 3
    bucket = np.where(good, 2, np.where(mid, 1, 0)).astype(np.int64)
    return stats.append_column("alpha_chars", pa.array(alpha, type=pa.int64())).append_column(
        "quality_bucket", pa.array(bucket, type=pa.int64())
    )


class LangId:
    """Actor-style language guesser: profiles built once per worker."""

    def __init__(self):
        self.profiles = {k: frozenset(v) for k, v in LANG_PROFILES.items() if v}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        guesses = []
        for t in texts:
            toks = set((t or "").lower().split())
            best, best_hits = "unk", 0
            for lang, prof in sorted(self.profiles.items()):
                hits = len(toks & prof)
                if hits > best_hits:
                    best, best_hits = lang, hits
            guesses.append(best)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "lang_guess": pa.array(guesses, type=pa.string()),
            }
        )


def _doc_fingerprint(data: bytes) -> int:
    """Winnowed rolling-hash fingerprint of one document.

    k-byte rolling hashes (mod 2^64 via uint64 overflow) reduced with
    min — a content fingerprint stable under reordering-free edits.
    Vectorized: the rolling hash is computed with _FP_K shifted adds
    over the whole byte array at once.
    """
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    if len(b) < _FP_K:
        b = np.pad(b, (0, _FP_K - len(b)), constant_values=0)
    n = len(b) - _FP_K + 1
    h = np.zeros(n, dtype=np.uint64)
    for j in range(_FP_K):
        h = h * _FP_BASE + b[j : j + n]
    return int(h.min())


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    fps = [_doc_fingerprint((t or "").encode()) for t in batch["text"].to_pylist()]
    # store as int64 (wrapped) for Arrow/SQL friendliness
    out = np.asarray(fps, dtype=np.uint64).astype(np.int64)
    return pa.table(
        {"doc_id": batch["doc_id"], "fingerprint": pa.array(out, type=pa.int64())}
    )


def lang_accuracy(ds):
    """Aggregate: per true lang, docs and correct guesses (diagnostics)."""
    from ray.data.aggregate import Count, Sum

    def add_hit(batch: pa.Table) -> pa.Table:
        hit = (
            np.asarray(batch["lang"].to_pandas()) == np.asarray(batch["lang_guess"].to_pandas())
        ).astype(np.int64)
        return batch.append_column("hit", pa.array(hit, type=pa.int64()))

    return (
        ds.map_batches(LangId, batch_format="pyarrow", concurrency=2)
        .map_batches(add_hit, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Count(alias_name="n_docs"), Sum("hit", alias_name="n_correct"))
    )
