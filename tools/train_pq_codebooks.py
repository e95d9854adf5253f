"""Reproducible generator for data/pq_codebooks.py.

Run: python tools/train_pq_codebooks.py [sf_dir]
Product-quantization codebooks: the 64-dim embedding space is split
into M=8 contiguous 8-dim subspaces; per subspace, pyspark.ml KMeans
(k=16, seed=42, maxIter=40, initSteps=5, tol=1e-6) is trained on that
slice of <sf_dir>/embeddings.parquet and the 16 centroids are written
as literals rounded to 6 decimals. Deterministic for a fixed input and
seed (same protocol as tools/train_ivf_centroids.py).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M_SUBSPACES = 8
K_CENTROIDS = 16
DIM = 64


def main(
    sf_dir: str = "/root/testdata/sf0.01",
    out_module: str = "pq_codebooks",
) -> None:
    """``out_module`` names the data/ module to write (no .py) — pass
    e.g. ``pq_codebooks_sf0_1`` to produce a retrained artifact
    SIDE-BY-SIDE with the canonical sf0.01 one (VERDICT r11 #8: the
    oracles embed the canonical books as literals, so retraining must
    never overwrite them in place)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from wikidata_to_surrealdb_spark.session import get_spark

    spark = get_spark(app_name="train_pq_codebooks")
    sub = DIM // M_SUBSPACES
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").selectExpr(
        "transform(embedding, x -> cast(x as double)) AS arr"
    )
    books = []
    for j in range(M_SUBSPACES):
        df = base.selectExpr(
            f"slice(arr, {j * sub + 1}, {sub}) AS sl"
        ).withColumn("features", array_to_vector("sl"))
        model = KMeans(
            k=K_CENTROIDS, seed=42, maxIter=40, initSteps=5, tol=1e-6
        ).fit(df)
        books.append(
            [[round(float(x), 6) for x in c] for c in model.clusterCenters()]
        )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "wikidata_to_surrealdb_spark",
        "data",
        f"{out_module}.py",
    )
    with open(out, "w") as f:
        f.write(
            '"""Trained product-quantization codebooks.\n\n'
            "Produced by tools/train_pq_codebooks.py: per 8-dim subspace,\n"
            "pyspark.ml KMeans (k=16, seed=42, maxIter=40, initSteps=5,\n"
            f"tol=1e-6) over that slice of {sf_dir}/embeddings.parquet,\n"
            "coefficients rounded to 6 decimals. Embedded as literals so\n"
            "the Spark encode/search plans and the DuckDB oracles quantize\n"
            "with the SAME codebooks (centroids are points in the shared\n"
            "subspaces — valid at any corpus scale).\n\"\"\"\n\n"
            "# PQ_CODEBOOKS[subspace][centroid] -> 8 coefficients\n"
            "PQ_CODEBOOKS: list[list[list[float]]] = [\n"
        )
        for book in books:
            f.write("    [\n")
            for c in book:
                f.write("        " + json.dumps(c) + ",\n")
            f.write("    ],\n")
        f.write("]\n")
    spark.stop()
    print(f"wrote {len(books)}x{K_CENTROIDS} codebooks to {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
