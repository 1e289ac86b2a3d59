"""Deterministic, self-contained chunk embedder (reference X7).

The reference embeds chunk ``context_text`` with a SentenceTransformer in
batches of 128 and L2-normalizes (core/embedder.py:15-33, indexer.py:92-98).
No model files exist in this environment, so the embedder is a from-scratch
*hashed random-projection* encoder: each token deterministically seeds a
Gaussian direction (md5 → PCG64 seed), a document's vector is the
log-tf-weighted sum of its token directions, L2-normalized to float32.
This preserves every contract the engine relies on:

  * deterministic: same text → same vector, on any executor, any run;
  * cosine-meaningful: shared vocabulary ⇒ higher cosine (bag-of-words
    random projection approximates token-set similarity);
  * dim is schema-frozen config (reference pins 1024 to the model,
    db_schema.py:33 / CLAUDE.md:111 — here EMBED_DIM in config);
  * empty text → zero vector (reference returns a (0, dim) matrix for an
    empty batch, embedder.py:21-24; per-row analog is the zero vector).

Execution shape: one ``pandas_udf`` over Arrow batches — numpy inside,
token-vector cache per Python worker (the executor-lifetime model cache of
the reference, api/app.py:72-78).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from docling_rag_spark.config import EMBED_DIM

_TOKEN_CACHE: dict[tuple[str, int], np.ndarray] = {}
_TOKEN_CACHE_MAX = 200_000


def _token_vector(tok: str, dim: int) -> np.ndarray:
    # keyed by (token, dim): a reused Python worker may embed at several
    # dims; a token-only key would return wrongly-sized cached vectors
    v = _TOKEN_CACHE.get((tok, dim))
    if v is None:
        seed = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
        v = np.random.default_rng(seed).standard_normal(dim).astype(np.float32)
        if len(_TOKEN_CACHE) < _TOKEN_CACHE_MAX:
            _TOKEN_CACHE[(tok, dim)] = v
    return v


_PAIR_SLICE = 8192  # (text, token) pairs per gather slice: keeps the
                    # (pairs × dim) contribution buffer ~8 MB so the
                    # gather + reduce stay cache-resident (measured 20x
                    # faster than one monolithic 600 MB gather on this
                    # memory-contended box)


def _vocab_matrix(uniq, dim: int) -> np.ndarray:
    V = np.empty((len(uniq), dim), dtype=np.float32)
    for j, t in enumerate(uniq):
        V[j] = _token_vector(t, dim)
    return V


def embed_texts(texts: "pd.Series | list[str]", dim: int = EMBED_DIM) -> np.ndarray:
    """(N,) strings → (N, dim) float32, rows L2-normalized (zero stays
    zero).

    Vectorized (no per-token Python loop): unique (text, token) pairs
    are factorized once per batch; contributions w·V[code] are gathered
    into a preallocated cache-sized buffer in pair-slices ALIGNED TO
    TEXT BOUNDARIES, and per-text sums are per-segment np.sum calls.
    Determinism contract: pairs are ordered by each
    token's FIRST OCCURRENCE within its own text and each text reduces
    over exactly its own contiguous rows, so the float32 sum tree
    depends only on the text itself — a text embeds identically
    regardless of batch composition, executor, or slice boundaries.
    (np.sum's pairwise blocking reordered the float32 sum relative to
    the earlier scalar += loop — a one-time, determinism-preserving
    value change; the digest goldens were re-frozen for it.)"""
    texts = list(texts)
    out = np.zeros((len(texts), dim), dtype=np.float32)
    rows: list[int] = []
    toks: list[str] = []
    for i, text in enumerate(texts):
        if isinstance(text, str) and text:
            ts = text.lower().split()
            rows.extend([i] * len(ts))
            toks.extend(ts)
    if not toks:
        return out
    codes, uniq = pd.factorize(np.asarray(toks, dtype=object))
    row_of = np.asarray(rows, dtype=np.int64)
    # one np.unique pass: tf counts AND first-occurrence position of
    # each (text, token) pair (flat order == token order in text)
    key = row_of * len(uniq) + codes
    ukey, first_idx, cnt = np.unique(key, return_index=True,
                                     return_counts=True)
    urow, ucode = ukey // len(uniq), ukey % len(uniq)
    order = np.lexsort((first_idx, urow))
    urow, ucode, cnt = urow[order], ucode[order], cnt[order]
    V = _vocab_matrix(uniq, dim)
    w = (1.0 + np.log(cnt)).astype(np.float32)
    starts = np.flatnonzero(np.r_[True, urow[1:] != urow[:-1]])
    bounds = np.r_[starts, len(urow)]
    seg_rows = urow[starts]
    cap = max(_PAIR_SLICE, int(np.diff(bounds).max()))
    buf = np.empty((cap, dim), dtype=np.float32)
    i = 0
    n_seg = len(starts)
    while i < n_seg:
        # extend the slice while it stays under the pair budget, but
        # never split a text's segment across slices
        j = np.searchsorted(bounds, bounds[i] + _PAIR_SLICE, "right") - 1
        j = min(max(j, i + 1), n_seg)
        lo_p, hi_p = int(bounds[i]), int(bounds[j])
        k = hi_p - lo_p
        np.take(V, ucode[lo_p:hi_p], axis=0, out=buf[:k])
        buf[:k] *= w[lo_p:hi_p, None]
        # per-segment np.sum (pairwise SIMD path) — measured 10x faster
        # than np.add.reduceat's generic inner loop; the sum tree depends
        # only on the segment length, so it stays text-intrinsic
        rel = bounds[i:j + 1] - lo_p
        sums = np.empty((j - i, dim), dtype=np.float32)
        for m in range(j - i):
            buf[rel[m]:rel[m + 1]].sum(axis=0, out=sums[m],
                                       dtype=np.float32)
        s64 = sums.astype(np.float64)
        nrm = np.sqrt(np.einsum("ij,ij->i", s64, s64))  # per-row, exact order
        keep = nrm > 0
        out[seg_rows[i:j][keep]] = (s64[keep]
                                    / nrm[keep][:, None]).astype(np.float32)
        i = j
    return out


def embedding_udf(dim: int = EMBED_DIM):
    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(texts: pd.Series) -> pd.Series:
        mat = embed_texts(texts, dim)
        return pd.Series(list(mat))
    return _embed


def embed_chunks(chunks: DataFrame, dim: int = EMBED_DIM,
                 text_col: str = "context_text") -> DataFrame:
    """chunks(url, chunk_id, …) → (url, chunk_id, embedding array<float>).

    Embeds ``context_text`` (headings + body), the reference's embedding
    input (core/chunker.py:80, CLAUDE.md:131). Map-only: no shuffle — the
    UDF runs in the same stage as the chunk scan.
    """
    return chunks.select(
        "url", "chunk_id",
        embedding_udf(dim)(F.col(text_col)).alias("embedding"))
