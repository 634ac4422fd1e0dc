"""End-to-end CLI entrypoint (__main__.py): config resolution, sink
selection, full drain."""

from __future__ import annotations

import glob
import json

from sample_keyspaces_cdc_streams_connectors_spark.__main__ import main


def test_main_object_store_end_to_end(spark, envelopes, tmp_path):
    src = str(tmp_path / "src")
    envelopes.limit(100).coalesce(1).write.parquet(src)
    conf = tmp_path / "pipeline.conf"
    conf.write_text(
        "keyspaces-cdc-streams.filter-expression = "
        "metadata.stream_operation_type <> 'UNKNOWN'\n"
        f"keyspaces-cdc-streams.checkpoint-location = {tmp_path}/ckpt\n"
    )
    out = str(tmp_path / "out")
    rc = main(
        [
            "--config",
            str(conf),
            "--source",
            src,
            "--sink",
            "object-store",
            "--out",
            out,
        ]
    )
    assert rc == 0
    written = spark.read.json(f"{out}/*/*.json")
    n_expected = envelopes.limit(100).filter(
        "metadata.stream_operation_type <> 'UNKNOWN'"
    )
    # limit(100) is plan-dependent; compare against the written filter
    assert written.count() > 0
    assert "stream_operation_type" in written.columns
    assert written.filter("stream_operation_type = 'UNKNOWN'").count() == 0


def test_main_queue_sink(spark, envelopes, tmp_path):
    src = str(tmp_path / "src2")
    envelopes.limit(50).coalesce(1).write.parquet(src)
    out = str(tmp_path / "q")
    rc = main(["--source", src, "--sink", "queue", "--out", out])
    assert rc == 0
    lines = [
        json.loads(line)
        for f in glob.glob(f"{out}/*.jsonl")
        for line in open(f)
    ]
    assert len(lines) == 50


def test_main_requires_out_for_file_sinks(spark, envelopes, tmp_path):
    src = str(tmp_path / "src3")
    envelopes.limit(5).write.parquet(src)
    assert main(["--source", src, "--sink", "object-store"]) == 2


def test_main_corpus_mode(spark, sf_dir, tmp_path):
    """Corpus mode end to end: config-gated curation from CLI, stats
    line printed, curated parquet written."""
    src = str(tmp_path / "docs_src")
    spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).write.parquet(src)
    conf = tmp_path / "corpus.conf"
    conf.write_text(
        "keyspaces-cdc-streams.corpus.min-quality = 400\n"
        "keyspaces-cdc-streams.corpus.dedup = exact\n"
    )
    out = str(tmp_path / "curated")
    rc = main(
        ["--mode", "corpus", "--config", str(conf), "--source", src, "--out", out]
    )
    assert rc == 0
    curated = spark.read.parquet(out)
    assert {"n_tokens", "lang", "quality"} <= set(curated.columns)
    assert curated.filter("quality < 400").count() == 0
    assert 0 < curated.count() <= spark.read.parquet(src).count()


def test_main_corpus_mode_scrub_and_cluster(spark, sf_dir, tmp_path):
    """The round-3 stages reach the CLI through the same config file:
    scrub-pii redacts before annotation, cluster dedup transitively
    collapses planted near-dups."""
    src = str(tmp_path / "docs_src3")
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(50)
    )
    import pyspark.sql.functions as F

    planted = docs.limit(5).select(
        (F.col("doc_id") + 500000).alias("doc_id"),
        F.concat(F.lit("contact me bob@example.com "), F.col("text")).alias(
            "text"
        ),
    )
    docs.unionByName(planted).write.parquet(src)
    conf = tmp_path / "corpus3.conf"
    conf.write_text(
        "keyspaces-cdc-streams.corpus.scrub-pii = true\n"
        "keyspaces-cdc-streams.corpus.dedup = cluster\n"
        "keyspaces-cdc-streams.corpus.jaccard-threshold = 500\n"
    )
    out = str(tmp_path / "curated3")
    rc = main(
        ["--mode", "corpus", "--config", str(conf), "--source", src, "--out", out]
    )
    assert rc == 0
    curated = spark.read.parquet(out)
    # the email never survives into the curated output
    assert curated.filter(F.col("text").contains("bob@example.com")).count() == 0
    assert "n_email" in curated.columns
    # each planted near-dup clustered with its base doc; min-id survives
    assert curated.filter(F.col("doc_id") >= 500000).count() == 0
    from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup import release_ngram_cache

    release_ngram_cache()


def test_main_corpus_requires_out(spark, sf_dir, tmp_path):
    src = str(tmp_path / "docs_src2")
    spark.read.parquet(f"{sf_dir}/documents.parquet").limit(5).write.parquet(src)
    assert main(["--mode", "corpus", "--source", src]) == 2


def test_main_profile_mode(spark, sf_dir, tmp_path, capsys):
    out = str(tmp_path / "prof")
    rc = main(
        [
            "--mode",
            "profile",
            "--source",
            f"{sf_dir}/documents.parquet",
            "--out",
            out,
        ]
    )
    assert rc == 0
    lines = [
        l for l in capsys.readouterr().out.splitlines() if "\t" in l
    ]
    assert any(l.startswith("*\trows\t") for l in lines)
    assert any(l.startswith("text\tmean_length\t") for l in lines)
    prof = spark.read.parquet(out)
    assert prof.count() == len(lines)


def test_main_corpus_mode_prints_stage_counts(spark, sf_dir, tmp_path, capsys):
    conf = tmp_path / "c.conf"
    conf.write_text(
        "keyspaces-cdc-streams.corpus.observe = true\n"
        "keyspaces-cdc-streams.corpus.languages = en\n"
    )
    out = str(tmp_path / "cur")
    rc = main(
        [
            "--mode",
            "corpus",
            "--config",
            str(conf),
            "--source",
            f"{sf_dir}/documents.parquet",
            "--out",
            out,
        ]
    )
    assert rc == 0
    printed = capsys.readouterr().out
    assert "stage input:" in printed
    assert "stage language:" in printed
    assert "stage output:" in printed


def test_main_select_mode(spark, sf_dir, tmp_path, capsys):
    target = str(tmp_path / "target")
    (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .limit(20)
        .select("text")
        .write.parquet(target)
    )
    out = str(tmp_path / "sel")
    rc = main(
        [
            "--mode",
            "select",
            "--source",
            f"{sf_dir}/documents.parquet",
            "--target",
            target,
            "--k",
            "50",
            "--out",
            out,
        ]
    )
    assert rc == 0
    sel = spark.read.parquet(out)
    assert sel.count() == 50
    assert "log_importance" in sel.columns


def test_main_select_requires_target_and_out(spark, sf_dir):
    rc = main(
        ["--mode", "select", "--source", f"{sf_dir}/documents.parquet"]
    )
    assert rc == 2


def test_main_train_quality_mode(spark, tmp_path, capsys):
    labeled = str(tmp_path / "labeled")
    spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog", 1),
            (2, "a bright cold day in april with clocks", 1),
            (3, "click here buy now free offer subscribe", 0),
            (4, "win casino prize jackpot claim now", 0),
        ],
        "doc_id int, text string, label int",
    ).write.parquet(labeled)
    out = str(tmp_path / "model")
    rc = main(
        ["--mode", "train-quality", "--source", labeled, "--out", out]
    )
    assert rc == 0
    assert "quality model saved" in capsys.readouterr().out

    from sample_keyspaces_cdc_streams_connectors_spark.llm.quality_model import load_quality_model, score_quality

    model = load_quality_model(spark, out)
    probe = spark.createDataFrame(
        [(1, "the fox and the dog in april"), (2, "click buy casino now")],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: r["model_quality"]
        for r in score_quality(probe, model).collect()
    }
    assert got[1] > got[2]


def test_main_chunk_mode(spark, sf_dir, tmp_path, capsys):
    out = str(tmp_path / "chunks")
    rc = main(
        [
            "--mode",
            "chunk",
            "--source",
            f"{sf_dir}/documents.parquet",
            "--max-tokens",
            "30",
            "--out",
            out,
        ]
    )
    assert rc == 0
    chunks = spark.read.parquet(out)
    assert {"doc_id", "chunk_idx", "chunk_text", "n_tokens"} <= set(
        chunks.columns
    )
    # every doc with non-blank text yields at least one chunk (blank
    # docs produce no rows by contract — chunking.py)
    from pyspark.sql import functions as F

    n_nonblank = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.trim("text") != "")
        .count()
    )
    assert chunks.select("doc_id").distinct().count() == n_nonblank


def test_cli_index_and_search_vectors(spark, sf_dir, tmp_path, capsys):
    """index-vectors (both kinds) + search-vectors end-to-end: the
    IVF-PQ index is auto-detected by its persisted model file and the
    printed top-k leads with the nearest neighbor."""
    from sample_keyspaces_cdc_streams_connectors_spark.__main__ import main

    src = f"{sf_dir}/embeddings.parquet"
    for kind in ("ivf", "ivf-pq"):
        out = str(tmp_path / kind)
        rc = main(
            [
                "--source", src,
                "--mode", "index-vectors",
                "--index-kind", kind,
                "--cells", "4",
                "--out", out,
            ]
        )
        assert rc == 0
        rc = main(
            [
                "--source", out,
                "--mode", "search-vectors",
                "--target", src,
                "--query-id", "1",
                "--topk", "5",
                "--n-probe", "4",
            ]
        )
        assert rc == 0
        lines = [
            l for l in capsys.readouterr().out.splitlines() if "\t" in l
        ]
        assert len(lines) == 5
        top_id, top_sim = lines[0].split("\t")
        assert top_id == "1" and float(top_sim) > 0.999  # self is nearest


def test_cli_shard_corpus(spark, sf_dir, tmp_path, capsys):
    """shard mode: token-balanced shard directories, each file sorted
    by epoch position, all docs present exactly once."""
    from pyspark.sql import functions as F

    from sample_keyspaces_cdc_streams_connectors_spark.__main__ import main

    out = str(tmp_path / "shards")
    rc = main(
        [
            "--source", f"{sf_dir}/documents.parquet",
            "--mode", "shard",
            "--n-shards", "4",
            "--out", out,
        ]
    )
    assert rc == 0
    assert "token-balanced" in capsys.readouterr().out
    sharded = spark.read.parquet(out)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sharded.count() == n_docs
    assert sharded.select("doc_id").distinct().count() == n_docs
    assert sharded.select("shard").distinct().count() == 4
    # epoch positions are globally unique across shard dirs
    assert sharded.select("epoch_pos").distinct().count() == n_docs


def test_cli_train_bpe(spark, sf_dir, tmp_path, capsys):
    from sample_keyspaces_cdc_streams_connectors_spark.__main__ import main
    from sample_keyspaces_cdc_streams_connectors_spark.llm.bpe import load_bpe_model

    out = str(tmp_path / "bpe")
    rc = main(
        [
            "--source", f"{sf_dir}/documents.parquet",
            "--mode", "train-bpe",
            "--n-merges", "40",
            "--out", out,
        ]
    )
    assert rc == 0
    assert "bpe model saved" in capsys.readouterr().out
    model = load_bpe_model(spark, out)
    assert 0 < len(model.merges) <= 40


def test_cli_shard_requires_out(capsys):
    from sample_keyspaces_cdc_streams_connectors_spark.__main__ import main

    rc = main(
        ["--source", "/tmp/nope", "--mode", "shard"]
    )
    assert rc == 2
    rc = main(
        ["--source", "/tmp/nope", "--mode", "train-bpe"]
    )
    assert rc == 2


def test_cli_train_lm(spark, sf_dir, tmp_path, capsys):
    from sample_keyspaces_cdc_streams_connectors_spark.__main__ import main
    from sample_keyspaces_cdc_streams_connectors_spark.llm.ngram_lm import load_ngram_lm

    out = str(tmp_path / "lm")
    rc = main(
        [
            "--source", f"{sf_dir}/documents.parquet",
            "--mode", "train-lm",
            "--out", out,
        ]
    )
    assert rc == 0
    assert "ngram lm saved" in capsys.readouterr().out
    lm = load_ngram_lm(spark, out)
    assert lm.total_tokens > 0 and len(lm.unigrams) > 0


def test_cli_index_semantic(spark, sf_dir, tmp_path):
    """index-semantic mode: the persisted standing index suppresses
    re-presented copies of its own members through the probe."""
    from sample_keyspaces_cdc_streams_connectors_spark.__main__ import main
    from sample_keyspaces_cdc_streams_connectors_spark.llm.semdedup import (
        semantic_dedup_against_index,
    )

    src = f"{sf_dir}/embeddings.parquet"
    out = str(tmp_path / "semidx")
    rc = main(
        [
            "--source", src,
            "--mode", "index-semantic",
            "--cells", "4",
            "--out", out,
        ]
    )
    assert rc == 0
    emb = spark.read.parquet(src)
    assert semantic_dedup_against_index(emb, out, eps=0.99).count() == 0


def test_cli_index_and_search_text(spark, sf_dir, tmp_path, capsys):
    """index-text + search-text end-to-end: top-k lines print
    doc<TAB>score in descending-score order."""
    from sample_keyspaces_cdc_streams_connectors_spark.__main__ import main

    out = str(tmp_path / "bm25idx")
    rc = main(
        [
            "--source", f"{sf_dir}/documents.parquet",
            "--mode", "index-text",
            "--out", out,
        ]
    )
    assert rc == 0
    rc = main(
        [
            "--source", out,
            "--mode", "search-text",
            "--query", "the data pipeline",
            "--topk", "5",
        ]
    )
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if "\t" in l]
    assert 0 < len(lines) <= 5
    scores = [float(l.split("\t")[1]) for l in lines]
    assert scores == sorted(scores, reverse=True)


def test_cli_search_text_query_file_bulk(spark, sf_dir, tmp_path, capsys):
    """search-text --query-file: bulk scoring prints
    query_id<TAB>doc<TAB>score<TAB>rank, grouped per query in rank
    order, and agrees with the single-query mode."""
    from sample_keyspaces_cdc_streams_connectors_spark.__main__ import main

    out = str(tmp_path / "bm25idx2")
    rc = main(
        [
            "--source", f"{sf_dir}/documents.parquet",
            "--mode", "index-text",
            "--out", out,
        ]
    )
    assert rc == 0
    capsys.readouterr()
    qf = tmp_path / "queries.txt"
    qf.write_text("the data pipeline\nquick brown\n\n")
    rc = main(
        [
            "--source", out,
            "--mode", "search-text",
            "--query-file", str(qf),
            "--topk", "3",
        ]
    )
    assert rc == 0
    lines = [
        l.split("\t")
        for l in capsys.readouterr().out.splitlines()
        if l.count("\t") == 3
    ]
    assert lines
    by_q: dict = {}
    for qid, doc, score, rank in lines:
        by_q.setdefault(int(qid), []).append((int(rank), int(doc), float(score)))
    assert set(by_q) <= {0, 1} and 0 in by_q
    for qid, rows in by_q.items():
        assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
        scores = [r[2] for r in rows]
        assert scores == sorted(scores, reverse=True)
    # single-query mode agrees on query 0's top doc
    rc = main(
        [
            "--source", out,
            "--mode", "search-text",
            "--query", "the data pipeline",
            "--topk", "3",
        ]
    )
    assert rc == 0
    single = [
        l for l in capsys.readouterr().out.splitlines() if l.count("\t") == 1
    ]
    assert int(single[0].split("\t")[0]) == by_q[0][0][1]


def test_main_corpus_mode_split_partitioned_output(spark, sf_dir, tmp_path):
    """corpus.split-permille through the CLI: curated output carries
    the split column AND is laid out partitionBy(split) so a training
    loader's per-split read is directory-pruned."""
    import os

    src = str(tmp_path / "docs_split_src")
    spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).write.parquet(src)
    conf = tmp_path / "corpus_split.conf"
    conf.write_text(
        "keyspaces-cdc-streams.corpus.split-permille = train:900,val:100\n"
    )
    out = str(tmp_path / "curated_split")
    rc = main(
        ["--mode", "corpus", "--config", str(conf), "--source", src, "--out", out]
    )
    assert rc == 0
    dirs = {d for d in os.listdir(out) if d.startswith("split=")}
    assert dirs == {"split=train", "split=val"}
    curated = spark.read.parquet(out)
    assert curated.count() == spark.read.parquet(src).count()
    n_train = curated.filter("split = 'train'").count()
    assert abs(n_train / curated.count() - 0.9) < 0.1


def test_cli_index_and_search_vectors_int8(spark, sf_dir, tmp_path, capsys):
    """int8 index kind end-to-end: _quant.json auto-detects, the
    re-ranked search equals the exact brute-force top-k."""
    from sample_keyspaces_cdc_streams_connectors_spark.__main__ import main
    from sample_keyspaces_cdc_streams_connectors_spark.llm.similarity import brute_force_topk

    src = f"{sf_dir}/embeddings.parquet"
    out = str(tmp_path / "int8idx")
    rc = main(
        ["--source", src, "--mode", "index-vectors",
         "--index-kind", "int8", "--out", out]
    )
    assert rc == 0
    rc = main(
        ["--source", out, "--mode", "search-vectors",
         "--target", src, "--query-id", "1", "--topk", "5"]
    )
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if "\t" in l]
    assert len(lines) == 5
    vecs = spark.read.parquet(src)
    import pyspark.sql.functions as F

    qvec = [float(x) for x in vecs.filter(F.col("vec_id") == 1).first()["embedding"]]
    exact = [r["vec_id"] for r in brute_force_topk(vecs, qvec, k=5).collect()]
    assert [int(l.split("\t")[0]) for l in lines] == exact


def test_cli_ivf_int8_index_and_search(spark, sf_dir, tmp_path, capsys):
    """r8: --index-kind ivf-int8 builds the cell-partitioned int8
    layout and search-vectors auto-detects it (q_code columns) — the
    query row is its own nearest neighbor through the quantized
    double-pruned path."""
    from sample_keyspaces_cdc_streams_connectors_spark.__main__ import main

    src = f"{sf_dir}/embeddings.parquet"
    out = str(tmp_path / "ivf8")
    rc = main(
        [
            "--source", src, "--mode", "index-vectors",
            "--index-kind", "ivf-int8", "--cells", "4", "--out", out,
        ]
    )
    assert rc == 0
    rc = main(
        [
            "--source", out, "--mode", "search-vectors",
            "--target", src, "--query-id", "1",
            "--topk", "5", "--n-probe", "4",
        ]
    )
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if "\t" in l]
    assert len(lines) == 5
    top_id, top_sim = lines[0].split("\t")
    assert top_id == "1" and float(top_sim) > 0.999


def test_cli_search_hybrid(spark, sf_dir, tmp_path, capsys):
    """r8 search-hybrid: BM25 over the text index fused with the
    vector index's top-k by RRF; ids share the doc space (embeddings
    built from the documents themselves)."""
    from pyspark.sql import functions as F

    from sample_keyspaces_cdc_streams_connectors_spark.__main__ import main
    from sample_keyspaces_cdc_streams_connectors_spark.llm.embedding import hash_embed

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb_src = str(tmp_path / "docemb")
    docs.select(
        F.col("doc_id").alias("vec_id"),
        hash_embed(F.col("text"), 64).alias("embedding"),
    ).write.parquet(emb_src)
    text_idx = str(tmp_path / "textidx")
    vec_idx = str(tmp_path / "vecidx")
    assert main(
        ["--source", f"{sf_dir}/documents.parquet",
         "--mode", "index-text", "--out", text_idx]
    ) == 0
    assert main(
        ["--source", emb_src, "--mode", "index-vectors",
         "--index-kind", "ivf-int8", "--cells", "4", "--out", vec_idx]
    ) == 0
    capsys.readouterr()
    rc = main(
        [
            "--source", text_idx, "--mode", "search-hybrid",
            "--query", "data stream window batch",
            "--vector-index", vec_idx,
            "--target", emb_src, "--query-id", "3",
            "--topk", "8", "--n-probe", "4",
        ]
    )
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if "\t" in l]
    assert 0 < len(lines) <= 8
    for l in lines:
        doc, score, n = l.split("\t")
        assert float(score) > 0 and int(n) in (1, 2)
    # fused scores print in descending order
    scores = [float(l.split("\t")[1]) for l in lines]
    assert scores == sorted(scores, reverse=True)


def test_cli_search_hybrid_validates(spark, sf_dir, capsys):
    from sample_keyspaces_cdc_streams_connectors_spark.__main__ import main

    rc = main(
        ["--source", "/nonexistent", "--mode", "search-hybrid"]
    )
    assert rc == 2
    assert "required for search-hybrid" in capsys.readouterr().err


def test_cli_index_text_append(spark, sf_dir, tmp_path, capsys):
    """r8: index-text --append extends a standing index; search finds
    docs from both segments."""
    from pyspark.sql import functions as F

    from sample_keyspaces_cdc_streams_connectors_spark.__main__ import main

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a_src = str(tmp_path / "a")
    b_src = str(tmp_path / "b")
    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(a_src)
    docs.filter(F.col("doc_id") % 2 == 1).write.parquet(b_src)
    idx = str(tmp_path / "tidx")
    assert main(["--source", a_src, "--mode", "index-text", "--out", idx]) == 0
    assert main(
        ["--source", b_src, "--mode", "index-text", "--out", idx, "--append"]
    ) == 0
    capsys.readouterr()
    rc = main(
        ["--source", idx, "--mode", "search-text",
         "--query", "data stream window batch", "--topk", "20"]
    )
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if "\t" in l]
    ids = {int(l.split("\t")[0]) for l in lines}
    assert any(i % 2 == 0 for i in ids) and any(i % 2 == 1 for i in ids)


def test_cli_compact_text_index(spark, sf_dir, tmp_path, capsys):
    """r9: compact-text-index merges append fragments in place;
    search results are unchanged."""
    import json

    from pyspark.sql import functions as F

    from sample_keyspaces_cdc_streams_connectors_spark.__main__ import main

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a_src = str(tmp_path / "a")
    b_src = str(tmp_path / "b")
    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(a_src)
    docs.filter(F.col("doc_id") % 2 == 1).write.parquet(b_src)
    idx = str(tmp_path / "tidx")
    assert main(["--source", a_src, "--mode", "index-text", "--out", idx]) == 0
    assert main(
        ["--source", b_src, "--mode", "index-text", "--out", idx, "--append"]
    ) == 0

    def search():
        capsys.readouterr()
        assert main(
            ["--source", idx, "--mode", "search-text",
             "--query", "data stream window batch", "--topk", "10"]
        ) == 0
        return [
            l for l in capsys.readouterr().out.splitlines() if "\t" in l
        ]

    before = search()
    capsys.readouterr()
    assert main(["--source", idx, "--mode", "compact-text-index"]) == 0
    report = json.loads(
        [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    )
    assert report["buckets_compacted"] > 0
    assert search() == before


def test_cli_rebalance_ivf_index(spark, sf_dir, tmp_path, capsys):
    """r9: rebalance-ivf-index refits a drifted index in place;
    search still returns the query row as its own nearest."""
    from sample_keyspaces_cdc_streams_connectors_spark.__main__ import main

    src = f"{sf_dir}/embeddings.parquet"
    out = str(tmp_path / "ivf")
    assert main(
        ["--source", src, "--mode", "index-vectors",
         "--index-kind", "ivf", "--cells", "4", "--out", out]
    ) == 0
    capsys.readouterr()
    assert main(
        ["--source", out, "--mode", "rebalance-ivf-index", "--cells", "6"]
    ) == 0
    assert "6 cells" in capsys.readouterr().out
    assert main(
        ["--source", out, "--mode", "search-vectors", "--target", src,
         "--query-id", "1", "--topk", "5", "--n-probe", "6"]
    ) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if "\t" in l]
    top_id, top_sim = lines[0].split("\t")
    assert top_id == "1" and float(top_sim) > 0.999


def test_cli_rebalance_semantic_index(spark, sf_dir, tmp_path, capsys):
    """r9: rebalance-semantic-index reclusters a standing SemDeDup
    index in place; member payload survives."""
    from sample_keyspaces_cdc_streams_connectors_spark.__main__ import main

    src = f"{sf_dir}/embeddings.parquet"
    out = str(tmp_path / "sem")
    assert main(
        ["--source", src, "--mode", "index-semantic", "--cells", "4",
         "--out", out]
    ) == 0
    n0 = spark.read.parquet(f"{out}/members").count()
    capsys.readouterr()
    assert main(
        ["--source", out, "--mode", "rebalance-semantic-index",
         "--cells", "6"]
    ) == 0
    assert "6 cells" in capsys.readouterr().out
    assert spark.read.parquet(f"{out}/members").count() == n0


def test_cli_search_vectors_bulk(spark, sf_dir, tmp_path, capsys):
    """r9: search-vectors --query-ids answers every query in ONE
    pruned pass; each query's own row ranks first."""
    from sample_keyspaces_cdc_streams_connectors_spark.__main__ import main

    src = f"{sf_dir}/embeddings.parquet"
    out = str(tmp_path / "ivf")
    assert main(
        ["--source", src, "--mode", "index-vectors",
         "--index-kind", "ivf", "--cells", "4", "--out", out]
    ) == 0
    capsys.readouterr()
    rc = main(
        ["--source", out, "--mode", "search-vectors", "--target", src,
         "--query-ids", "1,2,3", "--topk", "5", "--n-probe", "4"]
    )
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if "\t" in l]
    assert len(lines) == 15
    firsts = {
        int(l.split("\t")[0]): l.split("\t")
        for l in lines
        if l.split("\t")[3] == "1"
    }
    for qid, parts in firsts.items():
        assert int(parts[1]) == qid and float(parts[2]) > 0.999
