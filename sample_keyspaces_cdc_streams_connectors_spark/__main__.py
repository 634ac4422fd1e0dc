"""Runnable pipeline entrypoint — the ``KCLMainRunner.main`` analog.

Boot sequence mirrors the reference (KCLMainRunner.java:25-113):

1. resolve the config file — ``--config`` flag, else the
   ``APPLICATION_CONF_LOCATION`` environment variable
   (KCLMainRunner.java:25-58);
2. parse it with env-var overrides (config.py);
3. build the pipeline (filter/shape settings) and the named sink
   (the reflective ITargetMapper load becomes the sink registry);
4. run the stream with checkpointing until drained
   (``availableNow`` here; a processing-time trigger for a live
   source) — graceful shutdown is Spark's query stop, replacing the
   KCL shutdown hook.

Usage::

    python -m sample_keyspaces_cdc_streams_connectors_spark \
        --config pipeline.conf --source /path/to/envelopes \
        [--sink console|object-store|queue] [--out DIR]

    # batch corpus curation (annotate -> language -> quality -> dedup,
    # stages gated by keyspaces-cdc-streams.corpus.* config keys):
    python -m sample_keyspaces_cdc_streams_connectors_spark \
        --mode corpus --config corpus.conf \
        --source /path/to/documents --out DIR
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    from sample_keyspaces_cdc_streams_connectors_spark.config import (
        ConfigError,
        build_sink,
        load_config,
        pipeline_config,
    )
    from sample_keyspaces_cdc_streams_connectors_spark.session import get_spark
    from sample_keyspaces_cdc_streams_connectors_spark.streaming import CdcPipeline, local_dir_transport
    from sample_keyspaces_cdc_streams_connectors_spark.streaming.sinks import queue_sink

    p = argparse.ArgumentParser(prog="sample_keyspaces_cdc_streams_connectors_spark")
    p.add_argument("--config", default=None, help="config file path")
    p.add_argument("--source", required=True, help="source parquet dir")
    p.add_argument(
        "--mode",
        default="cdc",
        choices=(
            "cdc",
            "corpus",
            "profile",
            "select",
            "train-quality",
            "chunk",
            "index-vectors",
            "search-vectors",
            "index-semantic",
            "index-text",
            "reindex-text-docs",
            "compact-text-index",
            "rebalance-ivf-index",
            "rebalance-semantic-index",
            "search-text",
            "search-hybrid",
            "shard",
            "train-bpe",
            "train-lm",
            "train-langid",
        ),
        help="cdc: stream envelopes to a sink; corpus: batch-curate "
        "documents; profile: one-pass per-column table statistics; "
        "select: DSIR importance resampling of --source docs that "
        "resemble the --target exemplar corpus; train-quality: fit "
        "the hashed-feature quality classifier on --source labeled "
        "docs (text + label columns) and save it to --out; chunk: "
        "split --source docs into sentence-aligned pieces of at most "
        "--max-tokens tokens; index-vectors: build a cell-partitioned "
        "ANN index (--index-kind ivf|ivf-pq) from --source embeddings "
        "into --out; search-vectors: top-k over an --source index for "
        "the --query-id row of --target embeddings; shard: "
        "epoch-shuffle --source docs into --n-shards token-balanced "
        "shard dirs under --out; train-bpe: fit a --n-merges BPE "
        "merge table on --source docs and save it to --out; "
        "train-lm: fit the Stupid-Backoff n-gram fluency LM on "
        "--source docs and save it to --out (point "
        "corpus.lm-model-path at it); train-langid: fit the "
        "multiclass char-n-gram language classifier on --source "
        "labeled docs (text + label columns) and save it to --out "
        "(point corpus.langid-model-path at it); index-semantic: build a "
        "standing SemDeDup index from --source embeddings into --out "
        "(point corpus.semantic-index-path at it for cross-corpus / "
        "streaming paraphrase suppression); index-text: build a BM25 "
        "inverted index from --source docs into --out; "
        "reindex-text-docs: remove every indexed instance of --source "
        "docs from the --out text index and re-append once (crashed "
        "ingest-window repair); search-text: "
        "BM25 top-k over an --source index for --query; "
        "search-hybrid: reciprocal-rank fusion of BM25 over the "
        "--source text index with the --vector-index top-k for the "
        "--query-id row of --target (ids must share the doc space); "
        "compact-text-index: merge append-fragmented posting buckets "
        "and collapse vocabulary delta segments of the text index at "
        "--source, in place, probes bit-identical; "
        "rebalance-ivf-index: refit the coarse quantizer of the IVF "
        "index at --source on its own vectors and rewrite the cell "
        "layout (use after appends drift the codebook; --cells "
        "changes the cell count, default keeps it); "
        "rebalance-semantic-index: the same recluster for a standing "
        "SemDeDup index at --source (trains on its own float or "
        "dequantized-int8 unit members)",
    )
    p.add_argument(
        "--query",
        default=None,
        help="search-text mode: the query string",
    )
    p.add_argument(
        "--query-file",
        default=None,
        help="search-text mode: file with one query per line — bulk "
        "scoring in ONE pass over the pruned postings "
        "(llm.retrieval.bm25_topk_many) instead of a job per query",
    )
    p.add_argument(
        "--max-tokens",
        type=int,
        default=2048,
        help="chunk mode: token budget per chunk",
    )
    p.add_argument(
        "--target",
        default=None,
        help="select mode: parquet of exemplar documents (text column)",
    )
    p.add_argument(
        "--k",
        type=int,
        default=10_000,
        help="select mode: number of documents to sample",
    )
    p.add_argument(
        "--sink",
        default="console",
        choices=("console", "object-store", "queue"),
    )
    p.add_argument("--out", default=None, help="output dir")
    p.add_argument(
        "--index-kind",
        default="ivf",
        choices=("ivf", "ivf-pq", "ivf-int8", "int8"),
        help="index-vectors mode: plain IVF cells, IVF-PQ "
        "(cells + m-byte ADC codes), ivf-int8 (cells + 1-byte/dim "
        "symmetric codes — cell pruning AND a 4x narrower scan, "
        "exact re-rank; r8), or int8 (flat symmetric codes, no "
        "training, search re-ranks exactly)",
    )
    p.add_argument(
        "--vector-index",
        default=None,
        help="search-hybrid mode: vector index dir to fuse with the "
        "--source text index (ids must share the doc id space)",
    )
    p.add_argument(
        "--append",
        action="store_true",
        help="index-text mode: append --source docs into the EXISTING "
        "index at --out (incremental ingest; doc ids must be new) "
        "instead of rebuilding",
    )
    p.add_argument(
        "--cells",
        type=int,
        default=None,
        help="index-vectors mode: coarse-quantizer cell count "
        "(default 16); rebalance-ivf-index mode: new cell count "
        "(default: keep the current codebook's)",
    )
    p.add_argument(
        "--n-probe",
        type=int,
        default=2,
        help="search-vectors mode: probed cell count",
    )
    p.add_argument(
        "--topk",
        type=int,
        default=10,
        help="search-vectors mode: results to return",
    )
    p.add_argument(
        "--query-id",
        type=int,
        default=None,
        help="search-vectors mode: vec_id of the query row in --target",
    )
    p.add_argument(
        "--query-ids",
        default=None,
        help="search-vectors mode: comma-separated vec_ids — BULK "
        "search, every query answered in ONE pruned pass over the "
        "index (llm.ivf_index.ivf_index_topk_many; plain-IVF "
        "layouts)",
    )
    p.add_argument(
        "--n-shards",
        type=int,
        default=64,
        help="shard mode: number of token-balanced output shards",
    )
    p.add_argument(
        "--n-merges",
        type=int,
        default=8000,
        help="train-bpe mode: merge-table size (subword vocab growth)",
    )
    p.add_argument(
        "--health-port",
        type=int,
        default=None,
        help="serve GET /health + /metrics on this port during the run "
        "(the reference's HealthServer binds 8080)",
    )
    args = p.parse_args(argv)

    conf_path = args.config or os.environ.get("APPLICATION_CONF_LOCATION")
    try:
        cfg = load_config(conf_path) if conf_path else load_config({})
        pc = pipeline_config(cfg)
    except ConfigError as e:
        print(f"config error: {e}", file=sys.stderr)
        return 2

    if args.mode == "index-vectors":
        from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import (
            write_ivf_index,
            write_ivf_pq_index,
        )

        if not args.out:
            print("--out required for index-vectors mode", file=sys.stderr)
            return 2
        spark = get_spark("index-vectors")
        vectors = spark.read.parquet(args.source)
        cells = args.cells or 16
        if args.index_kind == "int8":
            import json as _json

            from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import _write_text
            from sample_keyspaces_cdc_streams_connectors_spark.llm.quant import quantize_embeddings

            quantize_embeddings(vectors).select(
                "vec_id", "q_scale", "q_code"
            ).write.mode("overwrite").parquet(f"{args.out.rstrip('/')}/codes")
            _write_text(
                spark,
                f"{args.out.rstrip('/')}/_quant.json",
                _json.dumps({"kind": "int8"}),
            )
            print(f"int8 index over {args.source} -> {args.out}")
            return 0
        if args.index_kind == "ivf-pq":
            write_ivf_pq_index(vectors, args.out, k=cells)
        elif args.index_kind == "ivf-int8":
            from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import write_ivf_int8_index

            write_ivf_int8_index(vectors, args.out, k=cells)
        else:
            write_ivf_index(vectors, args.out, k=cells)
        print(
            f"{args.index_kind} index over {args.source} -> {args.out} "
            f"({cells} cells)"
        )
        return 0

    if args.mode == "index-semantic":
        from sample_keyspaces_cdc_streams_connectors_spark.llm.semdedup import write_semantic_index

        if not args.out:
            print("--out required for index-semantic mode", file=sys.stderr)
            return 2
        spark = get_spark("index-semantic")
        vectors = spark.read.parquet(args.source)
        cells = args.cells or 16
        write_semantic_index(vectors, args.out, k=cells)
        print(
            f"semantic index over {args.source} -> {args.out} "
            f"({cells} cells)"
        )
        return 0

    if args.mode == "index-text":
        from sample_keyspaces_cdc_streams_connectors_spark.llm.retrieval import (
            append_to_text_index,
            write_text_index,
        )

        if not args.out:
            print("--out required for index-text mode", file=sys.stderr)
            return 2
        spark = get_spark("index-text")
        if args.append:
            append_to_text_index(spark.read.parquet(args.source), args.out)
            print(f"text index {args.out} appended from {args.source}")
        else:
            write_text_index(spark.read.parquet(args.source), args.out)
            print(f"text index over {args.source} -> {args.out}")
        return 0

    if args.mode == "reindex-text-docs":
        # surgical repair/deletion (r12): remove every indexed instance
        # of --source's docs from the --out text index and re-append
        # them once (the crashed-ledger-window fix; see
        # llm.maintenance.reindex_docs)
        import json as _json

        from sample_keyspaces_cdc_streams_connectors_spark.llm.maintenance import reindex_docs

        if not args.out:
            print(
                "--out (the text index path) required for "
                "reindex-text-docs mode",
                file=sys.stderr,
            )
            return 2
        spark = get_spark("reindex-text-docs")
        report = reindex_docs(
            spark, args.out, spark.read.parquet(args.source)
        )
        print(_json.dumps({"index": args.out, **report}))
        return 0

    if args.mode == "compact-text-index":
        import json as _json

        from sample_keyspaces_cdc_streams_connectors_spark.llm.maintenance import compact_text_index

        spark = get_spark("compact-text-index")
        report = compact_text_index(spark, args.source)
        print(_json.dumps({"index": args.source, **report}))
        return 0

    if args.mode == "rebalance-ivf-index":
        from sample_keyspaces_cdc_streams_connectors_spark.llm.maintenance import rebalance_ivf_index

        spark = get_spark("rebalance-ivf-index")
        cb = rebalance_ivf_index(spark, args.source, k=args.cells)
        print(f"rebalanced IVF index {args.source} ({len(cb)} cells)")
        return 0

    if args.mode == "rebalance-semantic-index":
        from sample_keyspaces_cdc_streams_connectors_spark.llm.maintenance import rebalance_semantic_index

        spark = get_spark("rebalance-semantic-index")
        cb = rebalance_semantic_index(spark, args.source, k=args.cells)
        print(
            f"rebalanced semantic index {args.source} ({len(cb)} cells)"
        )
        return 0

    if args.mode == "search-text":
        from sample_keyspaces_cdc_streams_connectors_spark.llm.retrieval import bm25_topk, bm25_topk_many

        if not args.query and not args.query_file:
            print(
                "--query or --query-file required for search-text mode",
                file=sys.stderr,
            )
            return 2
        spark = get_spark("search-text")
        if args.query_file:
            with open(args.query_file, encoding="utf-8") as fh:
                qs = [ln.strip() for ln in fh if ln.strip()]
            if not qs:
                print("query file is empty", file=sys.stderr)
                return 2
            queries = spark.createDataFrame(
                list(enumerate(qs)), "query_id long, query string"
            )
            # ids come from enumerate() — unique by construction, so
            # skip the eager uniqueness job
            out = bm25_topk_many(
                spark, args.source, queries, k=args.topk,
                check_unique_ids=False,
            ).orderBy("query_id", "rank")
            for row in out.collect():
                print(
                    f"{row['query_id']}\t{row['doc']}\t"
                    f"{row['score']:.6f}\t{row['rank']}"
                )
            return 0
        for row in bm25_topk(
            spark, args.source, args.query, k=args.topk
        ).collect():
            print(f"{row['doc']}\t{row['score']:.6f}")
        return 0

    if args.mode == "search-vectors":
        from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import (
            PQ_MODEL_FILE,
            ivf_index_topk,
            ivf_pq_topk,
        )

        if not args.target or (
            args.query_id is None and not args.query_ids
        ):
            print(
                "--target (embeddings parquet) and --query-id (or "
                "--query-ids) required for search-vectors mode",
                file=sys.stderr,
            )
            return 2
        spark = get_spark("search-vectors")
        from pyspark.sql import functions as F

        if args.query_ids:
            from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import ivf_index_topk_many

            qids = [int(x) for x in args.query_ids.split(",") if x.strip()]
            queries = (
                spark.read.parquet(args.target)
                .filter(F.col("vec_id").isin(qids))
                .select(F.col("vec_id").alias("query_id"), "embedding")
            )
            if queries.count() != len(set(qids)):
                print("some --query-ids not found", file=sys.stderr)
                return 2
            rows = ivf_index_topk_many(
                spark,
                args.source,
                queries,
                topk=args.topk,
                n_probe=args.n_probe,
            ).collect()
            for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
                print(
                    f"{r['query_id']}\t{r['vec_id']}\t{r['sim']:.6f}"
                    f"\t{r['rank']}"
                )
            return 0

        row = (
            spark.read.parquet(args.target)
            .filter(F.col("vec_id") == args.query_id)
            .select("embedding")
            .first()
        )
        if row is None:
            print(f"query id {args.query_id} not found", file=sys.stderr)
            return 2
        qvec = [float(x) for x in row[0]]

        def _exists(rel: str) -> bool:
            jp = spark._jvm.org.apache.hadoop.fs.Path(
                f"{args.source.rstrip('/')}/{rel}"
            )
            return jp.getFileSystem(
                spark._jsc.hadoopConfiguration()
            ).exists(jp)

        if _exists("_quant.json"):
            from sample_keyspaces_cdc_streams_connectors_spark.llm.quant import quantized_topk

            codes = spark.read.parquet(f"{args.source.rstrip('/')}/codes")
            top = quantized_topk(
                codes,
                qvec,
                k=args.topk,
                rerank_with=spark.read.parquet(args.target),
            ).select("vec_id", F.col("score").alias("sim"))
        elif _exists(PQ_MODEL_FILE):
            top = ivf_pq_topk(
                spark, args.source, qvec, topk=args.topk, n_probe=args.n_probe
            )
        elif "q_code" in spark.read.parquet(args.source).columns:
            from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import ivf_int8_topk

            top = ivf_int8_topk(
                spark, args.source, qvec, topk=args.topk, n_probe=args.n_probe
            ).select("vec_id", F.col("score").alias("sim"))
        else:
            top = ivf_index_topk(
                spark, args.source, qvec, topk=args.topk, n_probe=args.n_probe
            )
        for r in top.collect():
            print(f"{r['vec_id']}	{r['sim']:.6f}")
        return 0

    if args.mode == "search-hybrid":
        # lexical + dense hybrid retrieval: BM25 over the --source
        # text index fused with the vector index's top-k by
        # reciprocal-rank fusion (llm.retrieval.rrf_fuse) — the two
        # indexes must share a doc id space (index the embeddings
        # keyed by doc_id)
        from pyspark.sql import functions as F

        from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import (
            PQ_MODEL_FILE as _PQF,
        )
        from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import (
            ivf_index_topk,
            ivf_int8_topk,
            ivf_pq_topk,
        )
        from sample_keyspaces_cdc_streams_connectors_spark.llm.retrieval import bm25_topk, rrf_fuse

        if not (
            args.query
            and args.vector_index
            and args.target
            and args.query_id is not None
        ):
            print(
                "--query, --vector-index, --target and --query-id "
                "required for search-hybrid mode",
                file=sys.stderr,
            )
            return 2
        spark = get_spark("search-hybrid")
        row = (
            spark.read.parquet(args.target)
            .filter(F.col("vec_id") == args.query_id)
            .select("embedding")
            .first()
        )
        if row is None:
            print(f"query id {args.query_id} not found", file=sys.stderr)
            return 2
        qvec = [float(x) for x in row[0]]
        lex = bm25_topk(spark, args.source, args.query, k=args.topk)

        def _vexists(rel: str) -> bool:
            jp = spark._jvm.org.apache.hadoop.fs.Path(
                f"{args.vector_index.rstrip('/')}/{rel}"
            )
            return jp.getFileSystem(
                spark._jsc.hadoopConfiguration()
            ).exists(jp)

        if _vexists(_PQF):
            dense = ivf_pq_topk(
                spark, args.vector_index, qvec,
                topk=args.topk, n_probe=args.n_probe,
            )
        elif "q_code" in spark.read.parquet(args.vector_index).columns:
            dense = ivf_int8_topk(
                spark, args.vector_index, qvec,
                topk=args.topk, n_probe=args.n_probe,
            ).select("vec_id", F.col("score").alias("sim"))
        else:
            dense = ivf_index_topk(
                spark, args.vector_index, qvec,
                topk=args.topk, n_probe=args.n_probe,
            )
        fused = rrf_fuse(
            [
                lex.select(F.col("doc").cast("long").alias("doc"), "score"),
                dense.select(
                    F.col("vec_id").cast("long").alias("doc"),
                    F.col("sim").alias("score"),
                ),
            ],
            topk=args.topk,
        )
        for r in fused.collect():
            print(f"{r['doc']}\t{r['rrf_score']:.12f}\t{r['n_rankings']}")
        return 0

    if args.mode == "chunk":
        from sample_keyspaces_cdc_streams_connectors_spark.llm.chunking import chunk_documents

        if not args.out:
            print("--out required for chunk mode", file=sys.stderr)
            return 2
        spark = get_spark("chunk-documents")
        chunks = chunk_documents(
            spark.read.parquet(args.source), max_tokens=args.max_tokens
        )
        chunks.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(
            f"chunked {args.source} -> {args.out} "
            f"({n} chunks, budget {args.max_tokens} tokens)"
        )
        return 0

    if args.mode == "train-quality":
        from sample_keyspaces_cdc_streams_connectors_spark.llm.quality_model import (
            save_quality_model,
            train_quality_model,
        )

        if not args.out:
            print("--out required for train-quality mode", file=sys.stderr)
            return 2
        spark = get_spark("train-quality")
        model = train_quality_model(spark.read.parquet(args.source))
        save_quality_model(spark, model, args.out)
        import numpy as _np

        nz = int(_np.count_nonzero(model.weights))
        print(
            f"quality model saved to {args.out} "
            f"({nz} non-zero weights, bias {model.bias:.4f}); use it via "
            f"corpus.quality-model-path"
        )
        return 0

    if args.mode == "select":
        from sample_keyspaces_cdc_streams_connectors_spark.llm.importance import select_like_target

        if not args.target or not args.out:
            print("--target and --out required for select mode", file=sys.stderr)
            return 2
        spark = get_spark("dsir-select")
        chosen = select_like_target(
            spark.read.parquet(args.source),
            spark.read.parquet(args.target),
            k=args.k,
        )
        chosen.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(f"selected {n} docs like {args.target} -> {args.out}")
        return 0

    if args.mode == "shard":
        from pyspark.sql import functions as F

        from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import shard_corpus

        if not args.out:
            print("--out required for shard mode", file=sys.stderr)
            return 2
        spark = get_spark("corpus-shard")
        sharded = shard_corpus(
            spark.read.parquet(args.source), n_shards=args.n_shards
        )
        docs = spark.read.parquet(args.source)
        (
            docs.join(sharded.select("doc_id", "epoch_pos", "shard"), "doc_id")
            .repartition(F.col("shard"))
            .sortWithinPartitions("epoch_pos")
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(args.out)
        )
        n = spark.read.parquet(args.out).count()
        print(
            f"sharded {n} docs into {args.n_shards} token-balanced "
            f"shards -> {args.out}"
        )
        return 0

    if args.mode == "train-lm":
        from sample_keyspaces_cdc_streams_connectors_spark.llm.ngram_lm import save_ngram_lm, train_ngram_lm

        if not args.out:
            print("--out required for train-lm mode", file=sys.stderr)
            return 2
        spark = get_spark("lm-train")
        lm = train_ngram_lm(spark.read.parquet(args.source))
        save_ngram_lm(spark, lm, args.out)
        print(
            f"ngram lm saved to {args.out} ({len(lm.unigrams)} unigrams, "
            f"{len(lm.bigrams)} bigrams, {lm.total_tokens} tokens); "
            f"use it via corpus.lm-model-path"
        )
        return 0

    if args.mode == "train-langid":
        from sample_keyspaces_cdc_streams_connectors_spark.llm.langid import save_langid_model, train_langid

        if not args.out:
            print("--out required for train-langid mode", file=sys.stderr)
            return 2
        spark = get_spark("langid-train")
        model = train_langid(spark.read.parquet(args.source))
        save_langid_model(spark, model, args.out)
        print(
            f"langid model saved to {args.out} "
            f"({len(model.labels)} classes: {','.join(model.labels)}); "
            f"use it via corpus.langid-model-path"
        )
        return 0

    if args.mode == "train-bpe":
        from sample_keyspaces_cdc_streams_connectors_spark.llm.bpe import save_bpe_model, train_bpe

        if not args.out:
            print("--out required for train-bpe mode", file=sys.stderr)
            return 2
        spark = get_spark("bpe-train")
        model = train_bpe(spark.read.parquet(args.source), n_merges=args.n_merges)
        save_bpe_model(spark, model, args.out)
        print(
            f"bpe model saved to {args.out} ({len(model.merges)} merges); "
            f"load with llm.bpe.load_bpe_model"
        )
        return 0

    if args.mode == "profile":
        from sample_keyspaces_cdc_streams_connectors_spark.operators.profile import profile_table

        spark = get_spark("table-profile")
        prof = profile_table(spark.read.parquet(args.source))
        if args.out:
            prof.repartition(1).write.mode("overwrite").parquet(args.out)
        for r in prof.collect():
            v = "" if r["value"] is None else f"{r['value']:.6g}"
            print(f"{r['column']}\t{r['metric']}\t{v}")
        return 0

    if args.mode == "corpus":
        from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import build_corpus_pipeline, corpus_stats

        if not args.out:
            print("--out required for corpus mode", file=sys.stderr)
            return 2
        try:
            run = build_corpus_pipeline(cfg)
        except ConfigError as e:
            print(f"config error: {e}", file=sys.stderr)
            return 2
        spark = get_spark("corpus-pipeline")
        curated = run(spark.read.parquet(args.source))
        writer = curated.write.mode("overwrite")
        if cfg.get("keyspaces-cdc-streams.corpus.split-permille", None):
            # corpus.split-permille labeled the rows: lay the output
            # out split=train/val/test so the training loader's reads
            # are directory-pruned per split.  Gated on the CONFIG,
            # not on a column named "split" — a source corpus that
            # happens to carry its own high-cardinality "split"
            # column must not silently explode into one directory
            # per value
            writer = writer.partitionBy("split")
        writer.parquet(args.out)
        stats = corpus_stats(spark.read.parquet(args.out)).first()
        print(
            f"corpus curated: {args.source} -> {args.out} "
            f"({stats.n_docs} docs, {stats.total_tokens} tokens)"
        )
        for stage, obs in getattr(run, "last_observations", {}).items():
            print(f"stage {stage}: {obs.get['rows']} rows")
        return 0

    spark = get_spark("cdc-pipeline")
    if args.sink == "console":
        sink = build_sink("console")
    elif args.sink == "object-store":
        if not args.out:
            print("--out required for object-store", file=sys.stderr)
            return 2
        sink = build_sink("object-store", out_dir=args.out)
    else:
        if not args.out:
            print("--out required for queue", file=sys.stderr)
            return 2
        # default distributed path: one transport per partition
        from sample_keyspaces_cdc_streams_connectors_spark.config import queue_delay_seconds

        out_dir = args.out
        from sample_keyspaces_cdc_streams_connectors_spark.metrics import DEFAULT_REGISTRY as _REG

        sink = queue_sink(
            lambda: local_dir_transport(out_dir),
            delay_seconds=queue_delay_seconds(cfg),
            # native accumulator counters — the foreachPartition action
            # is invisible to SQL observed metrics
            registry=_REG,
            metrics_name=args.sink,
        )

    # metrics: every run counts; the HTTP surface is opt-in
    from sample_keyspaces_cdc_streams_connectors_spark.metrics import DEFAULT_REGISTRY, attach_metrics, counted_sink

    if args.sink != "queue":
        sink = counted_sink(sink, args.sink, registry=DEFAULT_REGISTRY)
    attach_metrics(spark, DEFAULT_REGISTRY)
    terminated_before = DEFAULT_REGISTRY.get("streaming.queries_terminated")
    server = None
    if args.health_port is not None:
        from sample_keyspaces_cdc_streams_connectors_spark.runtime import HealthServer

        server = HealthServer(
            port=args.health_port, metrics=DEFAULT_REGISTRY
        ).start()

    try:
        pipe = CdcPipeline(pc)
        schema = spark.read.parquet(args.source).schema
        stream = pipe.read_envelope_stream(spark, args.source, schema)
        query = pipe.start(stream, sink)
        query.awaitTermination()
        # listener events arrive asynchronously — give the bus a
        # bounded moment to flush this run's termination event so the
        # printed summary reflects the drain
        import time as _time

        for _ in range(50):
            if (
                DEFAULT_REGISTRY.get("streaming.queries_terminated")
                > terminated_before
            ):
                break
            _time.sleep(0.1)
    finally:
        if server is not None:
            server.stop()
    snap = DEFAULT_REGISTRY.snapshot()
    print(f"pipeline drained: {args.source} -> {args.sink}")
    print(
        "metrics: "
        f"records_in={int(snap.get('streaming.records_in', 0))} "
        f"records_out={int(snap.get(f'sink.{args.sink}.records_out', 0))} "
        f"batches={int(snap.get(f'sink.{args.sink}.batches', 0))} "
        f"failed={int(snap.get(f'sink.{args.sink}.failed_batches', 0))}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
