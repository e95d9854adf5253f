#!/usr/bin/env python
"""Rewrite QUERY_HASHES.json — the per-round content-hash ledger behind
the changed-query rotation bump (VERDICT r15 #4).

Run at the START of each round, BEFORE making changes (and commit the
result): the ledger then records each query's implementation hash as of
the previous round, so any plan-function, transitive-operator, or
oracle edit made DURING the
round makes ``__spark_entry__._changed_since_ledger()`` flag the query
and ``_rotated_names()`` sorts it ahead of the stale cohort — the
driver's end-of-round correctness run re-hashes every same-round
behavior change regardless of where its last pass sits in the rotation.
(Regenerating at round END would erase the flags right before the
driver reads them.)

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
