"""Reproducible generator for data/ivf_centroids.py.

Run: python tools/train_ivf_centroids.py [sf_dir]
Trains pyspark.ml KMeans (k=8, seed=42, maxIter=40, initSteps=5,
tol=1e-6) on <sf_dir>/embeddings.parquet and rewrites the centroid
literals module. Deterministic for a fixed input and seed.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(
    sf_dir: str = "/root/testdata/sf0.01",
    out_module: str = "ivf_centroids",
) -> None:
    """``out_module`` names the data/ module to write (no .py) — pass
    e.g. ``ivf_centroids_sf0_1`` for a retrained side-by-side artifact
    (the canonical module is embedded in oracles; never overwrite it
    with differently-scaled training)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from wikidata_to_surrealdb_spark.session import get_spark

    spark = get_spark(app_name="train_ivf_centroids")
    df = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .selectExpr("transform(embedding, x -> cast(x as double)) AS arr")
        .withColumn("features", array_to_vector("arr"))
    )
    model = KMeans(k=8, seed=42, maxIter=40, initSteps=5, tol=1e-6).fit(df)
    cents = [[round(float(x), 6) for x in c] for c in model.clusterCenters()]
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "wikidata_to_surrealdb_spark",
        "data",
        f"{out_module}.py",
    )
    with open(out, "w") as f:
        f.write(
            '"""Trained IVF coarse-quantizer centroids.\n\n'
            "Produced by tools/train_ivf_centroids.py: pyspark.ml KMeans\n"
            "(k=8, seed=42, maxIter=40, initSteps=5, tol=1e-6) over\n"
            f"{sf_dir}/embeddings.parquet, rounded to 6 decimals.\n"
            "Embedded as literals so the Spark plan and the DuckDB oracle\n"
            "assign cells from the same quantizer, and so assignment needs\n"
            "no training step at query time (centroids are points in the\n"
            "shared 64-dim space — valid at any corpus scale).\n\"\"\"\n\n"
            "IVF_CENTROIDS: list[list[float]] = [\n"
        )
        for c in cents:
            f.write("    " + json.dumps(c) + ",\n")
        f.write("]\n")
    spark.stop()
    print(f"wrote {len(cents)} centroids to {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
