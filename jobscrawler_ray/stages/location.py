"""Location tagging stage (SURVEY.md §2.2 M12-M14, §2.4 J2).

Faithful re-expression of the reference's explode → per-token lookup
with compound retry → regroup pipeline (``src/crawler.py:45-167``), with
two structural changes mandated by the Ray-first design:

- The nested continent→zones→countries→aliases scan
  (``find_tag_in_location_data``, O(dict) per token) is flattened once
  per actor into an alias→tag hashmap (O(1) per token) — same results,
  built in ``__init__`` (broadcast-dictionary pattern J2).
- The explode/groupby("original_index")/re-join round trip
  (``src/crawler.py:126-161``) is row-local: the compound-word retry only
  ever joins adjacent tokens of the same original row, so the whole
  explode+regroup never needs to leave the batch (M14: no distributed
  shuffle).

Reference semantics reproduced exactly, including:
- tokenization: strip "," "(" ")", "|"→space, strip, whitespace split
  (``src/crawler.py:130-134``)
- continent/zone matches return the uppercased token itself; country or
  alias matches return the country name (``src/crawler.py:45-58``)
- the rejoined ``location`` column is the space-joined token list
- ``location_tags`` is the first-occurrence-unique tag list (including
  the literal string "NaN" for misses), via the reference's
  str(unique-array) → re.findall("'([^']*)'") round trip
  (``src/crawler.py:33-35,145-153``)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..synth.locations import WORLD_LOCATIONS


def build_alias_map(location_data: dict) -> dict[str, str]:
    alias: dict[str, str] = {}
    for continent, body in location_data.items():
        alias.setdefault(continent.upper(), continent.upper())
        for zone in body["Zones"]:
            alias.setdefault(zone, zone)
        for country in body["Countries"]:
            for country_name, locs in country.items():
                alias.setdefault(country_name, country_name)
                for loc in locs:
                    alias.setdefault(loc, country_name)
    return alias


def tag_tokens(tokens: list[str], alias: dict[str, str]) -> list[str]:
    """Per-token lookup with the adjacent-compound retry
    (``src/crawler.py:78-104``); misses → 'NaN'."""
    tags: list[str] = []
    i = 0
    n = len(tokens)
    while i < n:
        word = tokens[i].upper()
        tag = alias.get(word, "")
        if tag:
            tags.append(tag)
            i += 1
            continue
        if i + 1 < n:
            compound = f"{tokens[i]} {tokens[i + 1]}".upper()
            tag = alias.get(compound, "")
            if tag:
                tags.extend([tag, tag])
                i += 2
                continue
        tags.append("NaN")
        i += 1
    return tags


def tag_location(value: str, alias: dict[str, str]) -> tuple[str, list[str]]:
    """Returns (rejoined location, unique tag list) for one row."""
    s = str(value).replace(",", "").replace(")", "").replace("(", "").replace("|", " ")
    tokens = s.strip().split()
    tags = tag_tokens(tokens, alias)
    # reference: ' '.join(exploded tokens), then strip []' chars
    joined = " ".join(tokens).replace("[", "").replace("]", "").replace("'", "")
    uniq = list(dict.fromkeys(tags))  # pd.Series.unique = first-occurrence order
    return joined, uniq


class LocationTagger:
    """map_batches callable class: alias map built once per actor.
    Defaults to the dictionary-scale map (~1k aliases,
    synth/locations_full.py — the reference's 6,613-line
    WorldLocations.json scale); pass ``WORLD_LOCATIONS`` for the
    miniature fixture."""

    def __init__(self, location_data: dict | None = None):
        if location_data is None:
            from ..synth.locations_full import WORLD_LOCATIONS_FULL

            location_data = WORLD_LOCATIONS_FULL
        self.alias = build_alias_map(location_data)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            df = df.copy()
            df["location_tags"] = pd.Series([], dtype=object)
            return df
        df = df.copy()
        out_loc, out_tags = [], []
        for v in df["location"].tolist():
            joined, uniq = tag_location(v, self.alias)
            out_loc.append(joined)
            out_tags.append(uniq)
        df["location"] = out_loc
        df["location_tags"] = out_tags
        return df
