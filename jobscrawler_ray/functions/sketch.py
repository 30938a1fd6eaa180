"""Sketch kernels: HyperLogLog distinct-count (leaf functions shared by
the Ray query and its sequential golden oracle — the same shared-leaf /
independent-orchestration split ``pipelines/goldens.py`` documents).

Everything here is bit-deterministic and merge-order-free: registers
combine by elementwise max, so any partitioning of the input produces
the identical register table, and the estimator sums registers in index
order so the float result is bit-identical across engines.
"""

from __future__ import annotations

import numpy as np

HLL_P = 12  # 4096 registers; standard error ~1.04/sqrt(4096) = 1.6%
HLL_M = 1 << HLL_P
_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)  # alpha_m for m >= 128


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — a well-mixed 64-bit hash for
    integer keys (public-domain constants from Vigna's splitmix64)."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def hll_registers(keys: np.ndarray) -> np.ndarray:
    """Register table (length 4096, dtype int64) for a batch of integer
    keys: register index = top 12 hash bits, value = 1 + count of
    leading zeros in the remaining 52 bits (capped at 53)."""
    h = splitmix64(np.asarray(keys))
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = h << np.uint64(HLL_P)  # remaining 52 bits, MSB-aligned
    # leading-zero count of the 52-bit remainder via branch-free binary
    # MSB search — 6 vectorized passes, exact. (A float64 log2 rounds UP
    # across integer boundaries for values just below a power of two,
    # e.g. log2(2^52 - 1) -> 52.0, misranking ~2^-49 of keys.)
    v = rest.copy()
    msb = np.zeros(v.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(s))
        msb[big] += s
        v[big] >>= np.uint64(s)
    rank = np.where(rest > 0, np.int64(64) - msb, np.int64(53)).astype(np.int64)
    regs = np.zeros(HLL_M, dtype=np.int64)
    np.maximum.at(regs, idx, rank)
    return regs


CM_D = 4  # count-min rows (independent hash seeds)
CM_W = 4096  # columns per row
_CM_SEEDS = np.array([0x243F6A8885A308D3, 0x13198A2E03707344,
                      0xA4093822299F31D0, 0x082EFA98EC4E6C89],
                     dtype=np.uint64)  # pi digits — nothing up the sleeve


def cm_table(keys: np.ndarray) -> np.ndarray:
    """Count-min partial for a batch of integer keys: a (CM_D, CM_W)
    int64 table where row r increments column splitmix64(key ^ seed_r)
    mod CM_W. Partials merge by elementwise SUM — integer, associative,
    partition-order-free."""
    k = np.asarray(keys).astype(np.uint64)
    tbl = np.zeros((CM_D, CM_W), dtype=np.int64)
    for r in range(CM_D):
        idx = (splitmix64(k ^ _CM_SEEDS[r]) % np.uint64(CM_W)).astype(np.int64)
        np.add.at(tbl[r], idx, 1)
    return tbl


def cm_query(tbl: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Point-count estimates (min over rows) for integer keys against a
    merged count-min table. Overestimates only; error ≤ 2N/CM_W with
    probability 1 − 2^-CM_D."""
    k = np.asarray(keys).astype(np.uint64)
    est = np.full(k.shape, np.iinfo(np.int64).max, dtype=np.int64)
    for r in range(CM_D):
        idx = (splitmix64(k ^ _CM_SEEDS[r]) % np.uint64(CM_W)).astype(np.int64)
        est = np.minimum(est, tbl[r][idx])
    return est


def hll_estimate(regs: np.ndarray) -> int:
    """Standard HLL estimator with the small-range (linear counting)
    correction. Registers are summed in index order — deterministic."""
    regs = np.asarray(regs, dtype=np.int64)
    raw = _ALPHA * HLL_M * HLL_M / float(np.sum(2.0 ** (-regs.astype(np.float64))))
    zeros = int(np.sum(regs == 0))
    if raw <= 2.5 * HLL_M and zeros > 0:
        return int(round(HLL_M * np.log(HLL_M / float(zeros))))
    return int(round(raw))
