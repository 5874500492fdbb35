#!/usr/bin/env python
"""Dirty-vs-clean MinHash A/B at scale (VERDICT r8 item 5 evidence).

Measures, at a given fixture dir:

* ``clean_pairs``   — q_minhash_clean's candidate count and wall time
  (plant chrome -> corpus-DF line strip -> MinHash+LSH);
* ``dirty_analytic`` — the candidate-pair count MinHash+LSH WOULD
  generate on the uncleaned (chrome-laden) corpus, computed
  analytically from band-bucket cardinalities (sum over buckets of
  C(n,2)) — the pairs are never materialized, because at sf10+ the
  dirty candidate set is exactly the quadratic blowup the composition
  exists to avoid;
* ``cc_star_clean`` — downstream connected-components wall time over
  the clean pairs (the stage the r7 713M-pair explosion dominated).

Prints one JSON line; append findings to BASELINE.md by hand.

Usage: python scripts/minhash_clean_ab.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from block_data_fetcher_spark.catalog import parallelize, table  # noqa: E402
from block_data_fetcher_spark.functions.hashing import (  # noqa: E402
    BAND_ROWS,
    N_HASHES,
    minhash_pairs,
    minhash_signature,
    shingle_hashes,
    star_components,
)
from block_data_fetcher_spark.functions.web import (  # noqa: E402
    plant_boilerplate,
    strip_boilerplate,
)
from block_data_fetcher_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("minhash-clean-ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = parallelize(table(spark, sf_dir, "documents"), spark).select(
        "doc_id", "text"
    )
    dirty = plant_boilerplate(docs, n_lines=5)

    # analytic dirty candidate count: bucket-cardinality sum, no pairs
    t0 = time.perf_counter()
    sig = dirty.select(
        "doc_id", minhash_signature(shingle_hashes(F.col("text"))).alias("sig")
    )
    n_bands = N_HASHES // BAND_ROWS
    bands = sig.select(
        F.posexplode(
            F.array(
                *[
                    F.struct(
                        *[
                            F.get("sig", i * BAND_ROWS + r).alias(f"h{r}")
                            for r in range(BAND_ROWS)
                        ]
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("band_idx", "band")
    )
    dirty_analytic = int(
        bands.groupBy("band_idx", "band")
        .count()
        .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2))
        .first()[0]
    )
    t_dirty_analytic = round(time.perf_counter() - t0, 1)

    # clean pipeline: strip then hash; count candidates
    t0 = time.perf_counter()
    cleaned = strip_boilerplate(dirty, docs.count())
    clean_pairs_df = minhash_pairs(cleaned)
    clean_n = clean_pairs_df.count()
    t_clean = round(time.perf_counter() - t0, 1)

    # downstream CC over the clean candidate set (est_sim >= 0.5)
    t0 = time.perf_counter()
    edges = minhash_pairs(strip_boilerplate(dirty, docs.count())).where(
        F.col("est_sim") >= 0.5
    )
    n_clusters = (
        star_components(spark, docs.select("doc_id"), edges, canonical=True)
        .select("cluster_id")
        .distinct()
        .count()
    )
    t_cc = round(time.perf_counter() - t0, 1)

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "dirty_analytic_pairs": dirty_analytic,
                "dirty_analytic_sec": t_dirty_analytic,
                "clean_pairs": clean_n,
                "clean_pipeline_sec": t_clean,
                "cc_star_clean_sec": t_cc,
                "cc_clusters": n_clusters,
            }
        )
    )


if __name__ == "__main__":
    main()
