"""Per-query grading provenance, derived MECHANICALLY from the
CORRECTNESS_r*.json files the driver writes each round (verdict r14:
COVERAGE.md hand-tracked a wrong round for media_pixel_stats; rotation
banking decisions must cite derived numbers, not memory).

Usage:
    python tools/grading_rounds.py            # table: query, last round
    python tools/grading_rounds.py --stale 8  # only last-graded <= r8
    python tools/grading_rounds.py --json     # machine-readable

"last green" = the highest round whose CORRECTNESS file contains the
query with rows/schema/hash all true. Queries in the registry that no
CORRECTNESS file ever graded show round 0 (never driver-graded).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def last_green_rounds() -> dict[str, int]:
    """{query: last driver-green round} across all CORRECTNESS files."""
    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        mt = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not mt:
            continue
        rnd = int(mt.group(1))
        with open(path) as fh:
            data = json.load(fh)
        for name, rec in data.items():
            if not isinstance(rec, dict):
                continue
            if (
                rec.get("rows_match")
                and rec.get("schema_match")
                and rec.get("hash_match") is not False
                and rec.get("err") in (None, "")
            ):
                out[name] = max(out.get(name, 0), rnd)
    return out


def registry_names() -> list[str]:
    sys.path.insert(0, REPO)
    import __spark_entry__  # noqa: F401

    from scalable_etl_spark.registry import QUERIES

    return list(QUERIES)


def main() -> None:
    args = sys.argv[1:]
    as_json = "--json" in args
    stale_max = None
    if "--stale" in args:
        stale_max = int(args[args.index("--stale") + 1])
    greens = last_green_rounds()
    rows = sorted(
        ((greens.get(n, 0), n) for n in registry_names()),
    )
    if stale_max is not None:
        rows = [(r, n) for r, n in rows if r <= stale_max]
    if as_json:
        print(json.dumps({n: r for r, n in rows}, indent=1, sort_keys=True))
        return
    for r, n in rows:
        print(f"r{r:02d}  {n}")
    print(f"-- {len(rows)} queries", file=sys.stderr)


if __name__ == "__main__":
    main()
