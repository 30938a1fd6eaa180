"""Embedding stage (SURVEY.md §2.3 T1/T2, §2.2 M15-M17).

The reference loads e5-base-v2 as module-level singletons
(``src/embeddings/e5_base_v2_utils.py:32-33``) and runs micro-batched
CPU inference (batch 15, ``:196-235``). Here the model loads once per
actor (``__init__``) and inference is per ``map_batches`` batch — the
canonical actor-pool pattern.

No torch/transformers in this sandbox, so the model is a deterministic
stand-in (clearly marked): a seeded random projection of hashed
token counts → unit-normalized float32 vector. It exercises the real
pipeline shape — prefix ("passage: ", M17), format wrap (M15),
token-count truncation (M16), batched matrix math, fixed-dim output —
and swaps for a SentenceTransformer in one place.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.textstats import truncate_tokens
from ..functions.urlnorm import hash64

EMBED_DIM = 64
_VOCAB_BUCKETS = 2048


def format_passage(title: str, description: str) -> str:
    """The e5 passage wrap + prefix (M15/M17,
    ``embed_latest_crawled_data.py:58-81``, ``e5_base_v2_utils.py:85-96``)
    — the ONE definition of the format, shared by ``EmbedDocuments``
    and the CLI's record-embedding path so the two can never drift."""
    return f"passage: <title>{title}</title> <description>{description}</description>"


class EmbedDocuments:
    """Actor-pool stage: text → (doc_id, embedding list<float>).

    __init__ = model load (once per actor); __call__ = batched
    inference. ``max_tokens`` mirrors the reference's 1000-token
    truncation (``embed_latest_crawled_data.py:87``)."""

    def __init__(self, seed: int = 7, max_tokens: int = 1000):
        rng = np.random.default_rng(seed)
        # the "model": a fixed random projection (deterministic stand-in
        # for e5-base-v2 — see module docstring)
        self.proj = rng.standard_normal((_VOCAB_BUCKETS, EMBED_DIM)).astype(np.float32)
        self.max_tokens = max_tokens

    def _embed(self, texts: list[str]) -> np.ndarray:
        counts = np.zeros((len(texts), _VOCAB_BUCKETS), dtype=np.float32)
        for i, t in enumerate(texts):
            body = truncate_tokens(t, self.max_tokens)
            for tok in body.split(" "):
                counts[i, hash64(tok) % _VOCAB_BUCKETS] += 1.0
        vecs = counts @ self.proj  # one matmul per batch
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        return vecs / np.maximum(norms, 1e-12)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        passages = [
            format_passage(f"doc-{d}", t)
            for d, t in zip(df["doc_id"], df["text"])
        ]
        vecs = self._embed(passages)
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "embedding": list(vecs),
        })
