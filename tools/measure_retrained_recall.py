"""Retrain-vs-widen evidence run (VERDICT r11 #8).

Run: python tools/measure_retrained_recall.py [sf_dir]

Measures panel recall@10 (16-query panel, exact scaled-int ground
truth) of the PQ/IVF stack under BOTH artifact sets at the given
scale — the canonical sf0.01-trained codebooks/centroids the catalog
serves with, and the sf0.1-retrained side-by-side artifacts
(data/pq_codebooks_sf0_1.py, data/ivf_centroids_sf0_1.py) — at
refine 50 and 200. This is the exact decision a 100 TB operator
faces when recall sags on a grown corpus: retrain the index, or
widen the exact-rerank candidate stage. Prints one JSON line per
(artifact, method, refine) arm; numbers are recorded in COVERAGE.md's
retrain-vs-widen table.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str = "/root/testdata/sf0.1") -> None:
    from wikidata_to_surrealdb_spark.data.ivf_centroids import IVF_CENTROIDS
    from wikidata_to_surrealdb_spark.data.ivf_centroids_sf0_1 import (
        IVF_CENTROIDS as IVF_SF01,
    )
    from wikidata_to_surrealdb_spark.data.pq_codebooks import PQ_CODEBOOKS
    from wikidata_to_surrealdb_spark.data.pq_codebooks_sf0_1 import (
        PQ_CODEBOOKS as PQ_SF01,
    )
    from wikidata_to_surrealdb_spark.functions import respread
    from wikidata_to_surrealdb_spark.operators import similarity as S
    from wikidata_to_surrealdb_spark.session import get_spark

    spark = get_spark(app_name="measure_retrained_recall")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = S.panel_query_vectors(emb, n=16)
    truth = S.exact_topk_int_panel(emb, queries, k=10).localCheckpoint(
        eager=False
    )

    for tag, books, cents in (
        ("fixed_sf0.01", PQ_CODEBOOKS, IVF_CENTROIDS),
        ("retrained_sf0.1", PQ_SF01, IVF_SF01),
    ):
        codes = S.pq_encode(
            respread(emb.select("vec_id", "embedding")), books
        ).localCheckpoint(eager=False)
        for refine in (50, 200):
            adc = S.pq_adc_panel(
                codes, books, queries, k=refine
            ).localCheckpoint(eager=False)
            methods = {
                "pq_rerank": S.rerank_panel(emb, adc, queries, k=10),
                "ivf_pq": S.rerank_panel(
                    emb,
                    S.ivf_pq_panel_candidates(
                        emb, cents, books, queries, nprobe=2, refine=refine
                    ),
                    queries,
                    k=10,
                ),
            }
            if refine == 50:
                methods["pq_adc"] = S._panel_global_topk(adc, 10, "adc_dist")
            out = S.ann_recall_panel(methods, truth, k=10).collect()
            for r in sorted(out, key=lambda r: r.method):
                print(
                    json.dumps(
                        {
                            "sf_dir": sf_dir,
                            "artifacts": tag,
                            "method": r.method,
                            "refine": refine,
                            "hits": r.hits,
                            "denom": r.denom,
                        }
                    )
                )
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
