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


def embed_texts(texts: "pd.Series | list[str]", dim: int = EMBED_DIM) -> np.ndarray:
    """(N,) strings → (N, dim) float32, rows L2-normalized (zero stays zero)."""
    out = np.zeros((len(texts), dim), dtype=np.float32)
    for i, text in enumerate(texts):
        if not isinstance(text, str) or not text:
            continue
        toks = text.lower().split()
        if not toks:
            continue
        counts: dict[str, int] = {}
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
        acc = np.zeros(dim, dtype=np.float32)
        for t, c in counts.items():
            acc += np.float32(1.0 + np.log(c)) * _token_vector(t, dim)
        nrm = float(np.linalg.norm(acc))
        if nrm > 0:
            out[i] = acc / nrm
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
