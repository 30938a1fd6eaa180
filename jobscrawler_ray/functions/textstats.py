"""Text analysis kernels for the large-scale training-data pipeline ops:
token counting, quality scoring, language-ID heuristic, document
fingerprinting. All pure numpy/python — vectorized at batch level inside
``map_batches`` stages (no model dependencies in this sandbox).

These extend the reference's text handling (token counting/truncation at
``src/embeddings/e5_base_v2_utils.py:37-56`` used tiktoken; here a
whitespace tokenizer + a BPE-ish regex tokenizer stand in, with the same
truncate-at-N semantics)."""

from __future__ import annotations

import re

import numpy as np

# BPE-ish pre-tokenization: word pieces OR single non-space symbols
# (public GPT-2 style pre-tokenizer shape, simplified)
_BPEISH = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")

_STOPWORDS = frozenset({"a", "the", "of", "and", "to", "in"})

# tiny per-language stopword lists for the n-gram/stopword language
# heuristic (public-knowledge function words)
_LANG_MARKERS = {
    "en": {"the", "and", "of", "a", "to", "in", "is"},
    "de": {"der", "die", "das", "und", "ist", "nicht"},
    "fr": {"le", "la", "les", "et", "est", "une"},
    "es": {"el", "la", "los", "y", "es", "una"},
    "zh": set(),  # CJK detected by codepoint range below
}


def ws_tokens(text: str) -> list[str]:
    return text.split(" ")


def token_count_ws(text: str) -> int:
    """Whitespace token count — matches SQL len(string_split(text,' '))."""
    return text.count(" ") + 1 if text else 0


def token_count_bpeish(text: str) -> int:
    return len(_BPEISH.findall(text))


def truncate_tokens(text: str, max_tokens: int) -> str:
    """Reference M16 semantics: count, truncate at N tokens
    (``e5_base_v2_utils.py:37-51``), whitespace tokenizer variant."""
    toks = text.split(" ")
    if len(toks) <= max_tokens:
        return text
    return " ".join(toks[:max_tokens])


def stopword_ratio(tokens: list[str]) -> float:
    if not tokens:
        return 0.0
    return sum(t in _STOPWORDS for t in tokens) / len(tokens)


def punct_ratio(text: str) -> float:
    if not text:
        return 0.0
    return sum(not (c.isalnum() or c.isspace()) for c in text) / len(text)


def quality_scores(texts: list[str]) -> dict[str, np.ndarray]:
    """Length / punctuation / stopword heuristics (batch-vectorized)."""
    n = len(texts)
    n_chars = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
    n_tokens = np.fromiter((token_count_ws(t) for t in texts), dtype=np.int64, count=n)
    cpt = np.where(n_tokens > 0, n_chars / np.maximum(n_tokens, 1), 0.0)
    stop = np.fromiter(
        (stopword_ratio(t.split(" ")) for t in texts), dtype=np.float64, count=n
    )
    punct = np.fromiter((punct_ratio(t) for t in texts), dtype=np.float64, count=n)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "chars_per_token": cpt,
        "stopword_ratio": stop,
        "punct_ratio": punct,
    }


def lang_id(text: str) -> str:
    """Stopword/charset language heuristic. CJK codepoints → zh;
    otherwise argmax of marker-word hits (ties → 'en' > 'de' > 'fr' >
    'es' by fixed order); no hits → 'unknown'."""
    if any("一" <= c <= "鿿" for c in text[:200]):
        return "zh"
    toks = set(text.lower().split(" ")[:200])
    best, best_hits = "unknown", 0
    for lang in ("en", "de", "fr", "es"):
        hits = len(toks & _LANG_MARKERS[lang])
        if hits > best_hits:
            best, best_hits = lang, hits
    return best


_FP_BASE = np.uint64(257)
_FP_MOD = np.uint64((1 << 61) - 1)


def fingerprint64(text: str) -> int:
    """Polynomial rolling hash of the whole document (mod 2^61-1) —
    an order-sensitive content fingerprint, int64-safe."""
    h = np.uint64(0)
    base = int(_FP_BASE)
    mod = int(_FP_MOD)
    acc = 0
    for b in text.encode("utf-8"):
        acc = (acc * base + b + 1) % mod
    return int(acc)


def winnow_fingerprints(text: str, k: int = 8, window: int = 16) -> list[int]:
    """Winnowing (Schleimer et al., SIGMOD 2003 — public paper): min
    k-gram hash per sliding window; dedup-preserving local fingerprints."""
    data = text.encode("utf-8")
    n = len(data)
    if n < k:
        return [fingerprint64(text)]
    base, mod = int(_FP_BASE), int(_FP_MOD)
    # rolling k-gram hashes
    power = pow(base, k - 1, mod)
    hashes = []
    h = 0
    for i, b in enumerate(data):
        h = (h * base + b + 1) % mod
        if i >= k:
            h = (h - (data[i - k] + 1) * power * base) % mod
        if i >= k - 1:
            hashes.append(h)
    arr = np.array(hashes, dtype=np.int64)
    if len(arr) <= window:
        return [int(arr.min())]
    # min per sliding window, deduped consecutively
    from numpy.lib.stride_tricks import sliding_window_view

    mins = sliding_window_view(arr, window).min(axis=1)
    out = []
    prev = None
    for m in mins.tolist():
        if m != prev:
            out.append(m)
            prev = m
    return out
