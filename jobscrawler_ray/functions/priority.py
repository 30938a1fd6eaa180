"""Frontier priority keys (north_rule: host-fairness + depth + recrawl-age).

The reference's implicit ordering is: strategies race on one event loop
(``src/main.py:28-37``), sites race within a strategy
(``src/crawler.py:320-333``), pages are sequential per site
(``src/crawlers/async_bs4.py:349-350``), DOM order within a page. The
engine replaces the race with an explicit min-heap key so global order is
deterministic; the conformance invariant (per-host sequential page→DOM
order, first-wins dedup) is preserved because ``seq`` is monotone in
(page, slot) within a host.

Packed int64 layout (ascending = higher priority):
    fairness_round : 14 bits  (how many URLs this host already got this wave cycle)
    depth          :  6 bits  (0 seed page, 1 follow-link, 2 image / two-hop)
    recrawl_age    : 16 bits  (0 = fresh; larger = staler, crawled later)
    seq            : 27 bits  (site-local monotone sequence: page*slots+slot)
"""

from __future__ import annotations

import numpy as np

_SEQ_BITS = 27
_AGE_BITS = 16
_DEPTH_BITS = 6

SEQ_MASK = (1 << _SEQ_BITS) - 1
AGE_MASK = (1 << _AGE_BITS) - 1
DEPTH_MASK = (1 << _DEPTH_BITS) - 1


def pack_priority(
    fairness_round: np.ndarray | int,
    depth: np.ndarray | int,
    recrawl_age: np.ndarray | int,
    seq: np.ndarray | int,
) -> np.ndarray | int:
    """Vectorized (or scalar) key packing."""
    fr = np.asarray(fairness_round, dtype=np.int64)
    d = np.asarray(depth, dtype=np.int64) & DEPTH_MASK
    a = np.asarray(recrawl_age, dtype=np.int64) & AGE_MASK
    s = np.asarray(seq, dtype=np.int64) & SEQ_MASK
    key = (fr << (_DEPTH_BITS + _AGE_BITS + _SEQ_BITS)) | (
        d << (_AGE_BITS + _SEQ_BITS)
    ) | (a << _SEQ_BITS) | s
    if key.ndim == 0:
        return int(key)
    return key


def unpack_priority(key: int) -> tuple[int, int, int, int]:
    seq = key & SEQ_MASK
    age = (key >> _SEQ_BITS) & AGE_MASK
    depth = (key >> (_SEQ_BITS + _AGE_BITS)) & DEPTH_MASK
    fr = key >> (_SEQ_BITS + _AGE_BITS + _DEPTH_BITS)
    return fr, depth, age, seq
