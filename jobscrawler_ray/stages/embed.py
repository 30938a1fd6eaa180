"""Embedding stage (SURVEY.md §2.3 T1/T2, §2.2 M15-M17).

The reference loads e5-base-v2 as module-level singletons
(``src/embeddings/e5_base_v2_utils.py:32-33``) and runs micro-batched
CPU inference (batch 15, ``:196-235``). Here the model loads once per
actor (``__init__``) and inference is per ``map_batches`` batch — the
canonical actor-pool pattern.

Two encode backends behind ONE prep path (prefix "passage: " M17,
format wrap M15, token-count truncation M16 — shared, so the branches
can never drift):

- stand-in (default; this sandbox has no torch/transformers): a
  seeded random projection of hashed token counts → unit-normalized
  float32 vector. Deterministic, exercises the real pipeline shape.
- real (``model_name=`` or ``JCR_EMBED_MODEL``, e.g.
  "intfloat/e5-base-v2"): torch + transformers, loaded once per actor,
  micro-batched ``no_grad`` inference with attention-mask mean pooling
  — the reference's exact arithmetic
  (``e5_base_v2_utils.py:196-235``: tokenizer(max_length=512,
  padding, truncation) → model → masked mean over last_hidden_state).
  Import-guarded: constructing with a model name raises
  NotImplementedError in environments without the libs.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from ..functions.textstats import truncate_tokens
from ..functions.urlnorm import hash64

EMBED_DIM = 64
_VOCAB_BUCKETS = 2048
# reference micro-batch + tokenizer cap (e5_base_v2_utils.py:29-30)
_REAL_CHUNK = 15
_REAL_MAX_LENGTH = 512


def format_passage(title: str, description: str) -> str:
    """The e5 passage wrap + prefix (M15/M17,
    ``embed_latest_crawled_data.py:58-81``, ``e5_base_v2_utils.py:85-96``)
    — the ONE definition of the format, shared by ``EmbedDocuments``
    and the CLI's record-embedding path so the two can never drift."""
    return f"passage: <title>{title}</title> <description>{description}</description>"


def _load_real_backend(model_name: str):
    """Import-guarded torch/transformers loader (once per actor).
    Returns an ``encode(texts) -> np.ndarray`` closure implementing the
    reference's batched mean-pool inference
    (``e5_base_v2_utils.py:196-235``). Raises NotImplementedError when
    the libs are absent (this sandbox) — the documented seam."""
    try:
        import torch
        from transformers import AutoModel, AutoTokenizer
    except ImportError as e:  # pragma: no cover - sandbox has no torch
        raise NotImplementedError(
            f"real embedding backend '{model_name}' needs torch + "
            "transformers (absent here); unset JCR_EMBED_MODEL to use "
            "the deterministic stand-in"
        ) from e

    tokenizer = AutoTokenizer.from_pretrained(model_name)
    model = AutoModel.from_pretrained(model_name)
    model.eval()

    def encode(texts: list[str]) -> np.ndarray:  # pragma: no cover
        outs = []
        with torch.no_grad():
            for i in range(0, len(texts), _REAL_CHUNK):
                batch = tokenizer(
                    texts[i:i + _REAL_CHUNK],
                    max_length=_REAL_MAX_LENGTH,
                    padding=True,
                    truncation=True,
                    return_tensors="pt",
                )
                hidden = model(**batch).last_hidden_state
                mask = batch["attention_mask"]
                # masked mean pool (reference average_pool,
                # e5_base_v2_utils.py:59-61); raw — the reference does
                # not L2-normalize stored passage vectors
                hidden = hidden.masked_fill(~mask[..., None].bool(), 0.0)
                pooled = hidden.sum(dim=1) / mask.sum(dim=1)[..., None]
                outs.append(pooled.detach().numpy())
        return np.vstack(outs)

    return encode


class EmbedDocuments:
    """Actor-pool stage: text → (doc_id, embedding list<float>).

    __init__ = model load (once per actor); __call__ = batched
    inference. ``max_tokens`` mirrors the reference's 1000-token
    truncation (``embed_latest_crawled_data.py:87``). ``model_name``
    (or env ``JCR_EMBED_MODEL``) selects the real torch/e5 backend;
    default is the deterministic stand-in."""

    def __init__(self, seed: int = 7, max_tokens: int = 1000,
                 model_name: str | None = None):
        self.max_tokens = max_tokens
        self.model_name = model_name or os.environ.get("JCR_EMBED_MODEL")
        if self.model_name:
            self._encode = _load_real_backend(self.model_name)
        else:
            rng = np.random.default_rng(seed)
            # the "model": a fixed random projection (deterministic
            # stand-in for e5-base-v2 — see module docstring)
            self.proj = rng.standard_normal(
                (_VOCAB_BUCKETS, EMBED_DIM)).astype(np.float32)
            self._encode = self._encode_standin

    def _prep(self, titles, descriptions) -> list[str]:
        """SHARED prep: e5 format wrap + prefix (M15/M17) then
        whitespace-token truncation (M16). Every encode backend sees
        exactly this output — the seam tests pin it."""
        return [
            truncate_tokens(format_passage(t, d), self.max_tokens)
            for t, d in zip(titles, descriptions)
        ]

    def _encode_standin(self, texts: list[str]) -> np.ndarray:
        counts = np.zeros((len(texts), _VOCAB_BUCKETS), dtype=np.float32)
        for i, t in enumerate(texts):
            for tok in t.split(" "):
                counts[i, hash64(tok) % _VOCAB_BUCKETS] += 1.0
        vecs = counts @ self.proj  # one matmul per batch
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        return vecs / np.maximum(norms, 1e-12)

    def _embed(self, texts: list[str]) -> np.ndarray:
        """Back-compat entry (tests, CLI): truncate then encode."""
        return self._encode(
            [truncate_tokens(t, self.max_tokens) for t in texts])

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        passages = self._prep(
            [f"doc-{d}" for d in df["doc_id"]], list(df["text"]))
        vecs = self._encode(passages)
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "embedding": list(vecs),
        })
