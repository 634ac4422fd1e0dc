"""FFD shard-boundary fill-rate audit (VERDICT r8 #7).

`pack_sequences(strategy="ffd")` runs first-fit-decreasing per
deterministic shard, so bins near shard boundaries can underfill
relative to a single global FFD.  This script quantifies that gap at
a given sf: fill rate = sum(tokens in non-oversize bins) /
(n_bins * max_tokens), for n_shards in {1 (global reference), 16,
64, 256} at a few budgets.  Results go to SCALE.md.

Usage: python tools/ffd_fill_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import pack_sequences  # noqa: E402
from sample_keyspaces_cdc_streams_connectors_spark.session import get_spark  # noqa: E402


def fill_rate(docs, max_tokens: int, n_shards: int) -> tuple[float, int]:
    packed = pack_sequences(
        docs, max_tokens, n_shards=n_shards, strategy="ffd"
    )
    row = (
        packed.filter(~F.col("oversize"))
        .groupBy("pack_shard", "message_idx")
        .agg(F.sum("n_tokens").alias("fill"))
        .agg(
            F.count(F.lit(1)).alias("bins"),
            F.sum("fill").alias("tokens"),
        )
        .first()
    )
    return float(row["tokens"]) / (row["bins"] * max_tokens), int(row["bins"])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ffd-fill-audit")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    print(f"sf_dir={sf_dir} docs={docs.count()}")
    for max_tokens in (512, 2048):
        ref_rate, ref_bins = fill_rate(docs, max_tokens, 1)
        print(
            f"max_tokens={max_tokens} n_shards=1 (global ref): "
            f"fill={ref_rate:.4f} bins={ref_bins}"
        )
        for n_shards in (16, 64, 256):
            rate, bins = fill_rate(docs, max_tokens, n_shards)
            print(
                f"max_tokens={max_tokens} n_shards={n_shards}: "
                f"fill={rate:.4f} bins={bins} "
                f"gap_vs_global={ref_rate - rate:+.4f} "
                f"extra_bins={bins - ref_bins}"
            )


if __name__ == "__main__":
    main()
