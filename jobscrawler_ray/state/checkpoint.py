"""Per-wave checkpoint manifests: lineage + metrics + resume (north_rule).

The reference's only resumability is the embedding watermark
(``src/embeddings/embed_latest_crawled_data.py:135-177``); a crashed
crawl re-runs fully and relies on DB dedup to no-op. Here every wave
commits a manifest after its outputs are durably written:

    <out_dir>/ckpt/manifest_w{k}.json
      wave, frontier_path (next wave's input), records/images/errors
      parquet paths written this wave, seen-shard snapshot paths,
      politeness states, per-site metrics (fetched/parsed/deduped/
      errors), and lineage (seed params + parent wave).

Resume = find the highest complete manifest, restore seen shards +
politeness state, re-enter the wave loop at ``wave+1`` reading
``frontier_path``. Waves are atomic: outputs are written to their final
paths before the manifest rename, so a crash mid-wave simply replays
that wave from the previous manifest (idempotent: the records sink
dedups by url_sha1 at assembly, SURVEY.md §2.7 D4).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field


@dataclass
class WaveManifest:
    wave: int
    frontier_path: str | None  # next frontier parquet dir (None = crawl done)
    records_paths: list[str] = field(default_factory=list)
    images_paths: list[str] = field(default_factory=list)
    errors_paths: list[str] = field(default_factory=list)
    seen_paths: list[str] = field(default_factory=list)
    politeness_states: list[dict] = field(default_factory=list)
    metrics: dict = field(default_factory=dict)
    lineage: dict = field(default_factory=dict)


def ckpt_dir(out_dir: str) -> str:
    d = os.path.join(out_dir, "ckpt")
    os.makedirs(d, exist_ok=True)
    return d


def write_manifest(out_dir: str, m: WaveManifest) -> str:
    path = os.path.join(ckpt_dir(out_dir), f"manifest_w{m.wave:04d}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(asdict(m), f, indent=1)
    os.replace(tmp, path)
    return path


def latest_manifest(out_dir: str) -> WaveManifest | None:
    d = os.path.join(out_dir, "ckpt")
    if not os.path.isdir(d):
        return None
    names = sorted(n for n in os.listdir(d) if n.startswith("manifest_w") and n.endswith(".json"))
    if not names:
        return None
    with open(os.path.join(d, names[-1])) as f:
        return WaveManifest(**json.load(f))


def all_manifests(out_dir: str) -> list[WaveManifest]:
    d = os.path.join(out_dir, "ckpt")
    if not os.path.isdir(d):
        return []
    out = []
    for n in sorted(os.listdir(d)):
        if n.startswith("manifest_w") and n.endswith(".json"):
            with open(os.path.join(d, n)) as f:
                out.append(WaveManifest(**json.load(f)))
    return out
