#!/usr/bin/env python
"""Rewrite QUERY_HASHES.json — the per-round content-hash ledger behind
the changed-query rotation bump (VERDICT r15 #4).

Run at the START of each round, BEFORE making changes (and commit the
result): the ledger then records each query's implementation hash as of
the previous round, so any plan-function, transitive-operator, or
oracle edit made DURING the round makes
``__spark_entry__._changed_since_ledger()`` flag the query and
``_rotated_names()`` sorts it ahead of the stale cohort — the driver's
end-of-round correctness run re-hashes every same-round behavior change
regardless of where its last pass sits in the rotation. (Regenerating
at round END would erase the flags right before the driver reads them.)

Since r18 the ledger also carries a ``"_pending"`` list: queries whose
hash differed from the OLD ledger at refresh time (i.e. they were
changed last round) but whose last driver FULL pass predates the latest
CORRECTNESS round — they were flagged but missed the 50-slot window, so
the rewrite must not erase their obligation. They stay flagged (via
``_changed_since_ledger``) until a driver full pass lands, at which
point the next refresh drops them. A query that DID pass the latest
round is considered verified-as-changed and leaves the pending set.

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
    try:
        with open(path) as fh:
            old = json.load(fh)
    except (OSError, ValueError):
        old = {}
    if not isinstance(old, dict):
        old = {}

    hashes = {name: entry._query_content_hash(name) for name in QUERIES}

    # carry unverified changes: flagged-by-the-old-ledger (hash diff or
    # already pending) and no driver full pass in the latest round
    last = entry._last_verified_round()
    latest = max((max(v) for v in last.values()), default=0)
    previously_flagged = {
        n for n in old.get("_pending", []) if isinstance(n, str)
    } | {
        n
        for n in QUERIES
        if isinstance(old.get(n), str) and old[n] != hashes[n]
    }
    pending = sorted(
        n
        for n in previously_flagged
        if n in QUERIES and max(last.get(n, (-1, -1))) < latest
    )

    out: dict = dict(sorted(hashes.items()))
    if pending:
        out["_pending"] = pending
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {len(hashes)} hashes to {path}")
    if pending:
        print(
            f"carried {len(pending)} unverified changed queries as "
            f"_pending: {pending}"
        )
    stale = entry._changed_since_ledger() - set(pending)
    if stale:
        print(f"WARNING: still-changed after rewrite (bug): {sorted(stale)}")


if __name__ == "__main__":
    main()
