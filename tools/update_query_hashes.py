#!/usr/bin/env python
"""Rewrite QUERY_HASHES.json — the per-round content-hash ledger behind
the changed-query rotation bump (VERDICT r15 #4).

Run at the END of each round (and commit the result): the ledger then
records each catalog query's implementation hash *as of that round*, so
any plan-function or oracle edit in the NEXT round makes
``__spark_entry__._changed_since_ledger()`` flag the query and
``_rotated_names()`` sorts it ahead of the stale cohort — the driver
re-hashes a round-N behavior change in round N+1 regardless of where
its last pass sits in the rotation.

    python tools/update_query_hashes.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry  # noqa: E402
from wikidata_to_surrealdb_spark.plans.queries import QUERIES  # noqa: E402


def main() -> None:
    path = os.path.join(REPO, "QUERY_HASHES.json")
    hashes = {name: entry._query_content_hash(name) for name in QUERIES}
    with open(path, "w") as fh:
        json.dump(hashes, fh, indent=1, sort_keys=True)
        fh.write("\n")
    stale = entry._changed_since_ledger()
    print(f"wrote {len(hashes)} hashes to {path}")
    if stale:
        print(f"WARNING: still-changed after rewrite (bug): {sorted(stale)}")


if __name__ == "__main__":
    main()
