"""Full-catalog mirror as a pytest target: the same 79-query
rows+schema+values comparison ``mirror.py`` runs, at the driver's own
sf0.01 scale, emitting ``MIRROR_r{N}.json`` (``GRAFT_MIRROR_OUT``,
default ``MIRROR.json``). Deselected by default (pytest.ini addopts);
run explicitly:

    python -m pytest -m full_mirror -q
"""

import json
import os

import pytest


@pytest.mark.full_mirror
def test_full_catalog_mirror(ray_session):
    from mirror import run_mirror

    sf = os.environ.get("GRAFT_MIRROR_SF", "/root/testdata/sf0.01")
    results = run_mirror(sf)
    out = os.environ.get("GRAFT_MIRROR_OUT", "MIRROR.json")
    green = sorted(
        n for n, r in results.items()
        if r["rows_match"] and r["schema_match"] and r["hash_match"])
    with open(out, "w") as f:
        json.dump({"sf": sf, "green": len(green), "total": len(results),
                   "queries": results}, f, indent=1)
    red = sorted(set(results) - set(green))
    assert not red, f"{len(red)}/{len(results)} queries diverge: {red}"
