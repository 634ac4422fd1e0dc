"""Standing-index maintenance stress (VERDICT r8 #1 "Done" clause):
probe latency after N appends, before vs after maintenance, at an
sf1-scale (10x sf0.1) clone.

Text index: base build over the 10x corpus, then N small appends
(fragmenting the posting buckets and vocabulary), timing `bm25_topk`
fresh / fragmented / compacted.  IVF index: base build + N appends,
timing `ivf_index_topk` fresh / appended / rebalanced, and recording
cell-size skew (max cell / mean cell) before vs after.  Dedup
(fingerprint) index (r11 — VERDICT r10 #5): base build + N appends
including one replayed batch (duplicate fp rows, the at-least-once
retry shape), timing `dedup_against_index` fresh / fragmented /
compacted, checking survivor-set equality throughout and that a Bloom
sidecar built BEFORE compaction still yields identical survivors
after (the key set is unchanged, so no rebuild is required).

Usage: python tools/maintenance_stress.py [sf_dir] [n_appends]
Results go to SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import (  # noqa: E402
    append_to_ivf_index,
    ivf_index_topk,
    write_ivf_index,
)
from sample_keyspaces_cdc_streams_connectors_spark.llm.maintenance import (  # noqa: E402
    compact_text_index,
    rebalance_ivf_index,
)
from sample_keyspaces_cdc_streams_connectors_spark.llm.retrieval import (  # noqa: E402
    bm25_topk,
    append_to_text_index,
    write_text_index,
)
from sample_keyspaces_cdc_streams_connectors_spark.session import get_spark  # noqa: E402

QUERY = "the quick brown data pipeline"
CLONES = 10


def _best(fn, n: int = 3) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def _clone(df, id_col: str, k: int):
    out = df
    for i in range(1, k):
        off = i * 100_000_000
        shifted = df.withColumn(id_col, F.col(id_col) + F.lit(off))
        if "text" in df.columns:
            shifted = shifted.withColumn(
                "text", F.concat(F.col("text"), F.lit(f" clone{i}"))
            )
        out = out.unionByName(shifted)
    return out


def main() -> None:
    import shutil
    import tempfile

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_appends = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("maintenance-stress")
    base = tempfile.mkdtemp(prefix="maint_stress_")
    try:
        docs = _clone(
            spark.read.parquet(f"{sf_dir}/documents.parquet").select(
                "doc_id", "text"
            ),
            "doc_id",
            CLONES,
        ).persist()
        n_docs = docs.count()
        print(f"docs={n_docs} (sf_dir={sf_dir} x{CLONES})")

        # ---- text index -------------------------------------------------
        fresh = f"{base}/text_fresh"
        grown = f"{base}/text_grown"
        t0 = time.time()
        write_text_index(docs, fresh)
        print(f"text fresh build: {time.time()-t0:.2f}s")
        # base = 50% of docs, then n_appends slices over the rest
        write_text_index(docs.filter(F.col("doc_id") % 2 == 0), grown)
        odd = docs.filter(F.col("doc_id") % 2 == 1)
        t0 = time.time()
        for i in range(n_appends):
            append_to_text_index(
                odd.filter(F.col("doc_id") % (2 * n_appends) == 2 * i + 1),
                grown,
            )
        print(f"text {n_appends} appends: {time.time()-t0:.2f}s")
        lat_fresh = _best(
            lambda: bm25_topk(spark, fresh, QUERY, k=10).collect()
        )
        lat_frag = _best(
            lambda: bm25_topk(spark, grown, QUERY, k=10).collect()
        )
        t0 = time.time()
        report = compact_text_index(spark, grown)
        t_compact = time.time() - t0
        lat_comp = _best(
            lambda: bm25_topk(spark, grown, QUERY, k=10).collect()
        )
        same = [r["doc"] for r in bm25_topk(spark, grown, QUERY, k=10).collect()] == [
            r["doc"] for r in bm25_topk(spark, fresh, QUERY, k=10).collect()
        ]
        print(
            f"text probe: fresh={lat_fresh:.3f}s fragmented={lat_frag:.3f}s "
            f"compacted={lat_comp:.3f}s compact_time={t_compact:.2f}s "
            f"report={report} ranking_matches_fresh={same}"
        )

        # ---- dedup (fingerprint) index (r11) -----------------------------
        from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup_index import (
            append_to_dedup_index,
            build_dedup_index,
            build_index_bloom,
            dedup_against_index,
        )
        from sample_keyspaces_cdc_streams_connectors_spark.llm.maintenance import compact_dedup_index

        d_fresh = f"{base}/dedup_fresh"
        d_grown = f"{base}/dedup_grown"
        t0 = time.time()
        build_dedup_index(docs, d_fresh)
        print(f"dedup fresh build: {time.time()-t0:.2f}s")
        build_dedup_index(docs.filter(F.col("doc_id") % 2 == 0), d_grown)
        d_odd = docs.filter(F.col("doc_id") % 2 == 1)
        t0 = time.time()
        for i in range(n_appends):
            append_to_dedup_index(
                d_odd.filter(F.col("doc_id") % (2 * n_appends) == 2 * i + 1),
                d_grown,
            )
        # one REPLAYED batch: duplicate fp rows land in the index (the
        # at-least-once retry shape compaction must collapse)
        append_to_dedup_index(
            d_odd.filter(F.col("doc_id") % (2 * n_appends) == 1), d_grown
        )
        print(f"dedup {n_appends}+1 appends: {time.time()-t0:.2f}s")
        # probe = the whole corpus PLUS a planted novel slice (the
        # ingest-gate shape): exactly the novel docs must survive, in
        # every state — a compaction that drops keys creates extra
        # survivors, one that invents keys suppresses novel docs
        novel = (
            docs.filter(F.col("doc_id") % 7 == 0)
            .withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000_000))
            .withColumn("text", F.concat(F.col("text"), F.lit(" novel")))
        )
        n_novel = novel.count()
        probe_docs = docs.unionByName(novel)
        print(f"dedup probe corpus: {n_docs} indexed + {n_novel} novel")

        def _dedup_probe(path: str, bloom=None) -> int:
            return dedup_against_index(
                probe_docs, path, bloom=bloom
            ).count()

        def _files_per_bucket(path: str) -> tuple[int, float]:
            import glob as _glob

            counts = [
                len(_glob.glob(f"{b}/*.parquet"))
                for b in _glob.glob(f"{path}/exact/bucket=*")
            ]
            return max(counts), sum(counts) / len(counts)

        lat_dfresh = _best(lambda: _dedup_probe(d_fresh))
        surv_frag = _dedup_probe(d_grown)
        lat_dfrag = _best(lambda: _dedup_probe(d_grown))
        fmax0, favg0 = _files_per_bucket(d_grown)
        # Bloom sidecar built BEFORE compaction
        bloom = build_index_bloom(spark, d_grown)
        t0 = time.time()
        d_report = compact_dedup_index(spark, d_grown)
        t_dcomp = time.time() - t0
        surv_comp = _dedup_probe(d_grown)
        lat_dcomp = _best(lambda: _dedup_probe(d_grown))
        surv_bloom = _dedup_probe(d_grown, bloom=bloom)
        fmax1, favg1 = _files_per_bucket(d_grown)
        idx = spark.read.parquet(f"{d_grown}/exact")
        dup_free = idx.count() == idx.distinct().count()
        print(
            f"dedup probe: fresh={lat_dfresh:.3f}s "
            f"fragmented={lat_dfrag:.3f}s compacted={lat_dcomp:.3f}s "
            f"compact_time={t_dcomp:.2f}s report={d_report} "
            f"files/bucket max {fmax0}->{fmax1} avg {favg0:.1f}->{favg1:.1f} "
            f"survivors frag={surv_frag} comp={surv_comp} "
            f"bloom_pre_compact={surv_bloom} dup_rows_collapsed={dup_free}"
        )

        # ---- IVF index --------------------------------------------------
        emb = _clone(
            spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
                "vec_id", "embedding"
            ),
            "vec_id",
            CLONES,
        ).persist()
        n_vec = emb.count()
        qvec = [float(x) for x in emb.first()["embedding"]]
        ivf_fresh = f"{base}/ivf_fresh"
        ivf_grown = f"{base}/ivf_grown"
        k_cells = 16
        t0 = time.time()
        write_ivf_index(emb, ivf_fresh, k=k_cells)
        print(f"ivf fresh build ({n_vec} vecs): {time.time()-t0:.2f}s")
        # grown: codebook trained on the FIRST clone only (the drift
        # scenario — appends come from a corpus the quantizer never saw)
        write_ivf_index(
            emb.filter(F.col("vec_id") < 100_000_000), ivf_grown, k=k_cells
        )
        rest = emb.filter(F.col("vec_id") >= 100_000_000)
        t0 = time.time()
        for i in range(1, CLONES):
            lo, hi = i * 100_000_000, (i + 1) * 100_000_000
            append_to_ivf_index(
                rest.filter(
                    (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
                ),
                ivf_grown,
            )
        print(f"ivf {CLONES-1} appends: {time.time()-t0:.2f}s")

        def skew(path: str) -> float:
            sizes = [
                r["n"]
                for r in spark.read.parquet(path)
                .groupBy("cell")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            ]
            return max(sizes) / (sum(sizes) / len(sizes))

        lat_ifresh = _best(
            lambda: ivf_index_topk(
                spark, ivf_fresh, qvec, topk=10, n_probe=2
            ).collect()
        )
        lat_igrown = _best(
            lambda: ivf_index_topk(
                spark, ivf_grown, qvec, topk=10, n_probe=2
            ).collect()
        )
        skew_before = skew(ivf_grown)
        t0 = time.time()
        rebalance_ivf_index(spark, ivf_grown)
        t_reb = time.time() - t0
        lat_ireb = _best(
            lambda: ivf_index_topk(
                spark, ivf_grown, qvec, topk=10, n_probe=2
            ).collect()
        )
        skew_after = skew(ivf_grown)
        print(
            f"ivf probe: fresh={lat_ifresh:.3f}s appended={lat_igrown:.3f}s "
            f"rebalanced={lat_ireb:.3f}s rebalance_time={t_reb:.2f}s "
            f"cell_skew before={skew_before:.2f} after={skew_after:.2f}"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
