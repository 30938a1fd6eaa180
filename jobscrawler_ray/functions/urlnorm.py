"""URL hygiene: canonicalization, hashing, host partitioning.

The reference dedups on the raw absolutized link string
(``src/utils/handy.py:11-22`` — one ``SELECT EXISTS`` per link against
Postgres). The north_rule upgrades this to canonicalized + SHA1 URLs
partitioned by host-hash; this module is the pure-function core shared by
the Ray stages, the seen-set shards and the sequential conformance oracle.

All functions are vectorizable (operate on lists / numpy arrays) so the
hot path inside ``map_batches`` never loops rows in Python except for the
unavoidable per-string parse (urllib-free, regex-free splitting — cheap).
"""

from __future__ import annotations

import hashlib

import numpy as np

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize(url: str, base: str | None = None) -> str:
    """Canonical URL form used for the seen-set key.

    Rules (documented superset of the reference's ``cfg.name + href``
    absolutization at ``src/crawlers/async_bs4.py:152``):

    - resolve a relative ``url`` against ``base`` (scheme+host of base)
    - lowercase scheme and host
    - strip the fragment
    - drop default ports (``:80`` http / ``:443`` https)
    - collapse empty path to ``/``
    - preserve query string byte-for-byte (ordering is significant to
      most job boards' pagination)
    """
    url = url.strip()
    if base is not None and "://" not in url:
        scheme, _, rest = base.partition("://")
        hostpart = rest.split("/", 1)[0]
        if url.startswith("/"):
            url = f"{scheme}://{hostpart}{url}"
        else:
            url = f"{scheme}://{hostpart}/{url}"
    scheme, sep, rest = url.partition("://")
    if not sep:
        # schemeless: treat as https
        scheme, rest = "https", url
    scheme = scheme.lower()
    hostpart, slash, path = rest.partition("/")
    hostpart = hostpart.lower()
    if ":" in hostpart:
        h, _, port = hostpart.rpartition(":")
        if _DEFAULT_PORTS.get(scheme) == port:
            hostpart = h
    path = path.split("#", 1)[0]
    return f"{scheme}://{hostpart}/{path}"


def host_of(canon_url: str) -> str:
    """Host component of an (already canonical) URL."""
    rest = canon_url.split("://", 1)[-1]
    return rest.split("/", 1)[0]


def sha1_hex(canon_url: str) -> str:
    return hashlib.sha1(canon_url.encode("utf-8")).hexdigest()


def sha1_bytes(canon_url: str) -> bytes:
    return hashlib.sha1(canon_url.encode("utf-8")).digest()


def hash64(s: str) -> int:
    """Stable 63-bit hash (first 8 bytes of SHA1, sign-cleared) — used for
    host partitioning and the cuckoo filter's primary index. Deterministic
    across processes (unlike ``hash()``)."""
    d = hashlib.sha1(s.encode("utf-8")).digest()
    return int.from_bytes(d[:8], "big") & 0x7FFF_FFFF_FFFF_FFFF


def host_shard(host: str, num_shards: int) -> int:
    return hash64(host) % num_shards


def canonicalize_batch(
    urls: list[str], bases: list[str] | None = None
) -> tuple[list[str], list[str], np.ndarray, np.ndarray]:
    """Vector path used by the frontier stage: returns
    ``(canon_urls, hosts, url_hash64, host_hash64)``."""
    n = len(urls)
    canon = [
        canonicalize(urls[i], bases[i] if bases is not None else None)
        for i in range(n)
    ]
    hosts = [host_of(c) for c in canon]
    uh = np.fromiter((hash64(c) for c in canon), dtype=np.int64, count=n)
    hh = np.fromiter((hash64(h) for h in hosts), dtype=np.int64, count=n)
    return canon, hosts, uh, hh
