"""Gate-scale pixel/audio stats stress (r12 — VERDICT r11 #6): run the
px and au arms at sf1-equivalent document counts and confirm (a) the
decode cost scales LINEARLY with media bytes and (b) the id-spread
keeps all cores busy (no skew: wall-clock ratio ≈ row ratio).

The arms need only ids (``synthesize_pattern_media`` /
``synthesize_pattern_audio`` build payloads executor-side from doc_id
arithmetic), so sf1 scale is ``spark.range`` at 10× the sf0.1
document count — no sf1 parquet needed.  The r11 lesson under test:
mapInPandas inherits the source's parallelism; the conditional
id-spread repartition inside the synthesizers must hold at every
scale.

Usage: python tools/media_stress.py [base_docs=5900] [mult=10]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 5900
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import functions as F

    from sample_keyspaces_cdc_streams_connectors_spark.llm.multimodal import (
        audio_stats,
        image_pixel_stats,
        synthesize_pattern_audio,
        synthesize_pattern_media,
    )
    from sample_keyspaces_cdc_streams_connectors_spark.session import get_spark

    spark = get_spark("media_stress")

    def px_pass(n: int) -> float:
        docs = spark.range(0, n).select(F.col("id").alias("doc_id"))
        df = image_pixel_stats(synthesize_pattern_media(docs, mod_side=16))
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        return time.time() - t0

    def au_pass(n: int) -> float:
        docs = spark.range(0, n).select(F.col("id").alias("doc_id"))
        df = audio_stats(synthesize_pattern_audio(docs))
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        return time.time() - t0

    # warm the codegen/worker pool, unmeasured
    px_pass(256)
    au_pass(256)

    for name, fn in (("px", px_pass), ("au", au_pass)):
        t1 = min(fn(base) for _ in range(2))
        t10 = fn(base * mult)
        ratio = t10 / t1
        print(
            f"{name}: sf0.1-scale ({base} docs) = {t1:.2f}s, "
            f"sf1-scale ({base * mult} docs) = {t10:.2f}s, "
            f"ratio = {ratio:.1f}x (linear = {mult}.0x; sublinear is "
            f"fine — fixed costs amortize; superlinear means skew)"
        )
    spark.stop()


if __name__ == "__main__":
    main()
