"""Config-driven corpus curation: stage gating, deterministic dedup
survivors, and env-override plumbing shared with the engine config."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.config import ConfigError, load_config
from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import (
    annotate_corpus,
    build_corpus_pipeline,
    corpus_stats,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .cache()
    )


def test_annotate_adds_columns_map_only(spark, docs):
    out = annotate_corpus(docs)
    assert {"n_tokens", "n_bpe_est", "lang", "quality"} <= set(out.columns)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_stage_gating(spark, docs):
    n_all = build_corpus_pipeline(load_config({}))(docs).count()
    assert n_all == docs.count()  # no stages configured -> annotate only

    n_en = (
        build_corpus_pipeline(
            load_config({"keyspaces-cdc-streams": {"corpus": {"languages": "en"}}})
        )(docs)
        .filter(F.col("lang") != "en")
        .count()
    )
    assert n_en == 0

    cfg = load_config(
        {"keyspaces-cdc-streams": {"corpus": {"min-quality": 500}}}
    )
    filtered = build_corpus_pipeline(cfg)(docs)
    assert filtered.filter(F.col("quality") < 500).count() == 0
    assert 0 < filtered.count() <= docs.count()


def test_exact_dedup_keeps_lowest_id(spark, docs):
    # plant duplicates: doc_id + 100000 with identical text
    dupes = docs.limit(20).withColumn(
        "doc_id", F.col("doc_id") + F.lit(100000)
    )
    corpus = docs.unionByName(dupes)
    cfg = load_config(
        {"keyspaces-cdc-streams": {"corpus": {"dedup": "exact"}}}
    )
    out = build_corpus_pipeline(cfg)(corpus)
    # every planted duplicate suppressed, original (lower id) kept
    assert out.filter(F.col("doc_id") >= 100000).count() == 0
    assert out.count() == docs.select("text").distinct().count()


def test_near_dedup_and_stats(spark, docs):
    dupes = docs.limit(10).withColumn(
        "doc_id", F.col("doc_id") + F.lit(100000)
    )
    cfg = load_config(
        {"keyspaces-cdc-streams": {"corpus": {"dedup": "near"}}}
    )
    out = build_corpus_pipeline(cfg)(docs.unionByName(dupes))
    assert out.filter(F.col("doc_id") >= 100000).count() == 0
    row = corpus_stats(out).first()
    assert row.n_docs == out.count()
    assert row.total_tokens > 0 and row.mean_quality > 0


def test_cluster_dedup_transitive(spark):
    """dedup=cluster must close pairs transitively: (a,b)+(a,c) near
    pairs keep only a — even when b and c are not directly paired."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    toks = base.split()
    rows = [
        (1, base),
        (2, " ".join(toks[:-1] + ["omega"])),
        (3, " ".join(["omega"] + toks[1:])),
        (4, "completely different words entirely unrelated content here"),
    ]
    docs4 = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = load_config(
        {"keyspaces-cdc-streams": {"corpus": {"dedup": "cluster"}}}
    )
    out = build_corpus_pipeline(cfg)(docs4)
    assert {r.doc_id for r in out.select("doc_id").collect()} == {1, 4}
    from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup import release_ngram_cache

    release_ngram_cache()


def test_cluster_dedup_minhash_method(spark):
    """cluster-method=minhash: LSH-bucketed pair generation feeding
    the same components closure — near-dup triplet collapses to its
    min-id survivor."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    toks = base.split()
    rows = [
        (1, base),
        (2, " ".join(toks[:-1] + ["omega"])),
        (3, " ".join(["omega"] + toks[1:])),
        (4, "completely different words entirely unrelated content here"),
    ]
    docs4 = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = load_config(
        {
            "keyspaces-cdc-streams": {
                "corpus": {"dedup": "cluster", "cluster-method": "minhash"}
            }
        }
    )
    out = build_corpus_pipeline(cfg)(docs4)
    kept = {r.doc_id for r in out.select("doc_id").collect()}
    assert 4 in kept and 1 in kept
    assert 2 not in kept  # near-dup of 1 via LSH candidates


def test_cluster_prefer_keeps_best_quality(spark):
    """cluster-prefer=quality: the survivor is the highest-quality
    member of each duplicate cluster, not the lowest id."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    toks = base.split()
    rows = [
        # doc 2 is the near-dup with MORE text -> higher quality score
        (1, base),
        (2, base + " " + " ".join(toks)),
        (3, "completely different words entirely unrelated content here"),
    ]
    docs3 = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = load_config(
        {
            "keyspaces-cdc-streams": {
                "corpus": {
                    "dedup": "cluster",
                    "jaccard-threshold": "400",
                    "cluster-prefer": "quality",
                }
            }
        }
    )
    out = build_corpus_pipeline(cfg)(docs3)
    kept = {r.doc_id for r in out.select("doc_id").collect()}
    from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup import release_ngram_cache

    release_ngram_cache()
    assert 3 in kept and len(kept) == 2
    assert 2 in kept  # quality winner, though 1 has the lower id


def test_decontaminate_stage_drops_leaked_docs(spark, tmp_path):
    eval_q = "what is the capital of france the answer is paris exactly"
    eval_path = str(tmp_path / "eval")
    spark.createDataFrame(
        [(1, eval_q)], "doc_id long, text string"
    ).write.parquet(eval_path)
    corpus = spark.createDataFrame(
        [
            (1, f"leaked: {eval_q} with commentary"),
            (2, "a perfectly clean document about distributed joins"),
        ],
        "doc_id long, text string",
    )
    cfg = load_config(
        {
            "keyspaces-cdc-streams": {
                "corpus": {"decontaminate-path": eval_path}
            }
        }
    )
    out = build_corpus_pipeline(cfg)(corpus)
    assert {r.doc_id for r in out.select("doc_id").collect()} == {2}


def test_bad_cluster_method_rejected():
    cfg = load_config(
        {
            "keyspaces-cdc-streams": {
                "corpus": {"dedup": "cluster", "cluster-method": "simhash"}
            }
        }
    )
    with pytest.raises(ConfigError):
        build_corpus_pipeline(cfg)


def test_scrub_pii_stage_before_annotation(spark):
    rows = [
        (1, "email bob@example.com and phone (555) 123-4567 here"),
        (2, "nothing sensitive at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = load_config(
        {"keyspaces-cdc-streams": {"corpus": {"scrub-pii": "true"}}}
    )
    out = {r.doc_id: r for r in build_corpus_pipeline(cfg)(df).collect()}
    assert "[PII:email]" in out[1].text and "[PII:phone]" in out[1].text
    assert out[1].n_email == 1 and out[1].n_phone == 1
    assert out[2].text == rows[1][1] and out[2].n_email == 0
    # annotation ran on the scrubbed text (token count sees the markers)
    assert out[1].n_tokens == len(out[1].text.split())


def test_env_override_reaches_corpus_keys(spark, docs):
    cfg = load_config({}, env={"CORPUS_MIN_QUALITY": "999999"})
    out = build_corpus_pipeline(cfg)(docs)
    assert out.count() == 0  # impossible threshold via env override


def test_semantic_dedup_stage(spark, docs):
    """``dedup = semantic``: exact-duplicate texts embed to identical
    hash vectors (cos = 1 > any eps), so planted copies must vanish
    while the base corpus stays intact; k is clamped to tiny batches."""
    dupes = docs.limit(15).withColumn(
        "doc_id", F.col("doc_id") + F.lit(100000)
    )
    corpus = docs.unionByName(dupes)
    cfg = load_config(
        {
            "keyspaces-cdc-streams": {
                "corpus": {
                    "dedup": "semantic",
                    "semantic-eps-permille": 999,
                    "semantic-clusters": 4,
                    "semantic-dims": 32,
                }
            }
        }
    )
    out = build_corpus_pipeline(cfg)(corpus)
    assert out.count() == docs.count()
    # exactly one of each planted pair survives
    planted = out.filter(
        (F.col("doc_id") >= 100000)
        | F.col("doc_id").isin(
            [r["doc_id"] for r in docs.limit(15).collect()]
        )
    )
    assert planted.count() == 15

    # tiny batch: k clamps to the row count instead of raising
    tiny = corpus.limit(2)
    assert build_corpus_pipeline(cfg)(tiny).count() <= 2


def test_bad_dedup_mode_rejected():
    cfg = load_config(
        {"keyspaces-cdc-streams": {"corpus": {"dedup": "fuzzy"}}}
    )
    with pytest.raises(ConfigError):
        build_corpus_pipeline(cfg)


def test_deterministic_sample_partition_invariant(spark, docs):
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import deterministic_sample

    a = {r.doc_id for r in deterministic_sample(docs, 0.4).collect()}
    b = {
        r.doc_id
        for r in deterministic_sample(docs.repartition(7), 0.4).collect()
    }
    assert a == b  # pure function of (salt, id)
    n = docs.count()
    assert 0.25 * n < len(a) < 0.55 * n  # ~fraction at fixture size
    # different salt -> a different (roughly independent) subset
    c = {r.doc_id for r in deterministic_sample(docs, 0.4, salt="other").collect()}
    assert c != a
    # edge fractions
    assert deterministic_sample(docs, 0.0).count() == 0
    assert deterministic_sample(docs, 1.0).count() == n


def test_mixture_tags_and_weights(spark, docs):
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import sample_corpus_mixture

    half = docs.filter(F.col("doc_id") % 2 == 0)
    rest = docs.filter(F.col("doc_id") % 2 == 1)
    mix = sample_corpus_mixture(
        {"web": (half, 1.0), "books": (rest, 0.3)}
    )
    counts = {r.source: r.n for r in mix.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["web"] == half.count()
    assert 0 < counts["books"] < rest.count()
    plan = mix._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only filters + plan-level union


def test_pack_sequences_bound_and_totality(spark, docs):
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import pack_sequences

    max_tokens = 512
    packed = pack_sequences(docs, max_tokens, n_shards=8).cache()
    assert packed.count() == docs.count()  # every doc packed exactly once
    per_seq = packed.groupBy("pack_shard", "message_idx").agg(
        F.sum("n_tokens").alias("total"),
        F.max("n_tokens").alias("biggest"),
    )
    # the batcher's bound contract: total < max + largest member
    assert per_seq.filter(
        F.col("total") >= F.lit(max_tokens) + F.col("biggest")
    ).count() == 0
    # parallel shards actually used
    assert packed.select("pack_shard").distinct().count() > 1


def test_repetition_stage_gated_and_overridable(spark, docs):
    spam = spark.createDataFrame(
        [(900001, "\n".join(["buy now limited offer"] * 30))],
        "doc_id long, text string",
    )
    corpus = docs.unionByName(spam)
    cfg_on = load_config(
        {"keyspaces-cdc-streams": {"corpus": {"repetition-filter": "true"}}}
    )
    out = build_corpus_pipeline(cfg_on)(corpus)
    assert out.filter(F.col("doc_id") == 900001).count() == 0
    # stat columns do not leak into the pipeline output
    assert "dup_line_frac" not in out.columns

    # per-mille override loosens one bound enough to keep the spam doc
    cfg_loose = load_config(
        {
            "keyspaces-cdc-streams": {
                "corpus": {
                    "repetition-filter": "true",
                    "repetition-max-permille": {
                        "dup_line_frac": 1000,
                        "dup_line_char_frac": 1000,
                        "top_2gram_char_frac": 1000,
                        "top_3gram_char_frac": 1000,
                        "top_4gram_char_frac": 1000,
                        "dup_5gram_frac": 1000,
                        "dup_10gram_frac": 1000,
                    },
                }
            }
        }
    )
    out_loose = build_corpus_pipeline(cfg_loose)(corpus)
    assert out_loose.filter(F.col("doc_id") == 900001).count() == 1


def test_quality_model_stage(spark, docs, tmp_path):
    from sample_keyspaces_cdc_streams_connectors_spark.llm.quality_model import (
        save_quality_model,
        train_quality_model,
    )

    labeled = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today", 1),
            (2, "a bright cold day in april with striking clocks", 1),
            (3, "click here buy now free offer click subscribe", 0),
            (4, "win win casino prize jackpot claim now cheap", 0),
        ],
        "doc_id int, text string, label int",
    )
    model = train_quality_model(labeled, n_buckets=2048, n_iters=30, lr=1.0)
    path = str(tmp_path / "qm")
    save_quality_model(spark, model, path)

    corpus = spark.createDataFrame(
        [
            (1, "the fox and the dog met on a bright cold day"),
            (2, "click buy now free casino prize win subscribe now"),
        ],
        "doc_id long, text string",
    )
    cfg = load_config(
        {
            "keyspaces-cdc-streams": {
                "corpus": {"quality-model-path": path}
            }
        }
    )
    out = build_corpus_pipeline(cfg)(corpus)
    kept = [r["doc_id"] for r in out.select("doc_id").collect()]
    assert kept == [1]
    assert "model_quality" in out.columns


def test_dedup_index_stage(spark, docs, tmp_path):
    from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup_index import build_dedup_index

    # the standing corpus = the first 10 docs; the batch = 20 docs
    standing = docs.orderBy("doc_id").limit(10)
    batch = docs.orderBy("doc_id").limit(20)
    idx = str(tmp_path / "dedup_idx")
    build_dedup_index(standing, idx, mode="exact")
    cfg = load_config(
        {
            "keyspaces-cdc-streams": {
                "corpus": {"dedup-index-path": idx}
            }
        }
    )
    out = build_corpus_pipeline(cfg)(batch)
    known = {r["doc_id"] for r in standing.select("doc_id").collect()}
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert kept.isdisjoint(known)
    assert len(kept) == 10


def test_dedup_index_mode_validated(spark):
    with pytest.raises(ConfigError):
        build_corpus_pipeline(
            load_config(
                {
                    "keyspaces-cdc-streams": {
                        "corpus": {
                            "dedup-index-path": "/tmp/x",
                            "dedup-index-mode": "fuzzy",
                        }
                    }
                }
            )
        )


def test_observe_reports_per_stage_counts(spark, docs):
    cfg = load_config(
        {
            "keyspaces-cdc-streams": {
                "corpus": {
                    "observe": "true",
                    "languages": "en",
                    "dedup": "exact",
                }
            }
        }
    )
    run = build_corpus_pipeline(cfg)
    out = run(docs)
    n_out = out.count()  # the action that populates the observations
    obs = run.last_observations
    assert set(obs) == {"input", "language", "output"}
    n_in = obs["input"].get["rows"]
    n_lang = obs["language"].get["rows"]
    assert n_in == docs.count()
    assert n_lang <= n_in
    assert obs["output"].get["rows"] == n_out
    # observation is per-run: a fresh run repopulates cleanly
    run(docs).count()
    assert run.last_observations["input"].get["rows"] == n_in


def test_observe_off_by_default(spark, docs):
    run = build_corpus_pipeline(load_config({}))
    run(docs).count()
    assert run.last_observations == {}


def test_streaming_curation_matches_batch(spark, docs, tmp_path):
    """The stream-safe stage subset produces EXACTLY the batch
    pipeline's rows when replayed through readStream micro-batches."""
    import uuid

    from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup_index import build_dedup_index
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import build_streaming_curation

    standing = docs.orderBy("doc_id").limit(5)
    idx = str(tmp_path / "idx")
    build_dedup_index(standing, idx, mode="exact")
    # an eval set overlapping part of the corpus, so the streaming
    # decontamination stage actually has docs to drop
    eval_path = str(tmp_path / "eval")
    docs.orderBy(F.desc("doc_id")).limit(3).select("doc_id", "text").write.parquet(
        eval_path
    )
    conf = {
        "keyspaces-cdc-streams": {
            "corpus": {
                "languages": "en",
                "repetition-filter": "true",
                "dedup-index-path": idx,
                "decontaminate-path": eval_path,
            }
        }
    }
    src = str(tmp_path / "src")
    docs.select("doc_id", "text").repartition(4).write.parquet(src)
    schema = spark.read.parquet(src).schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = f"curated_{uuid.uuid4().hex[:8]}"
    q = (
        build_streaming_curation(load_config(conf))(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    streamed = {
        r["doc_id"] for r in spark.table(name).select("doc_id").collect()
    }
    spark.catalog.dropTempView(name)

    batch = build_corpus_pipeline(load_config(conf))(
        spark.read.parquet(src)
    )
    expected = {r["doc_id"] for r in batch.select("doc_id").collect()}
    assert streamed == expected
    assert 0 < len(expected) < docs.count()


def test_streaming_curation_rejects_batch_only_keys(spark):
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import build_streaming_curation

    with pytest.raises(ConfigError) as e:
        build_streaming_curation(
            load_config(
                {"keyspaces-cdc-streams": {"corpus": {"dedup": "exact"}}}
            )
        )
    assert "dedup" in str(e.value)


def test_streaming_matches_batch_with_repetition_overrides(spark, tmp_path):
    """Threshold overrides must apply identically in the batch and
    streaming paths (a streaming path that silently used the default
    bounds would drop different docs for the same config)."""
    import uuid

    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import build_streaming_curation

    spam = "\n".join(["buy now limited offer"] * 30)
    corpus = spark.createDataFrame(
        [(1, spam), (2, "a perfectly ordinary clean sentence here.")],
        "doc_id long, text string",
    )
    conf = {
        "keyspaces-cdc-streams": {
            "corpus": {
                "repetition-filter": "true",
                "repetition-max-permille": {
                    k: 1000
                    for k in (
                        "dup_line_frac",
                        "dup_line_char_frac",
                        "top_2gram_char_frac",
                        "top_3gram_char_frac",
                        "top_4gram_char_frac",
                        "dup_5gram_frac",
                        "dup_10gram_frac",
                    )
                },
            }
        }
    }
    batch_ids = {
        r["doc_id"]
        for r in build_corpus_pipeline(load_config(conf))(corpus)
        .select("doc_id")
        .collect()
    }
    assert batch_ids == {1, 2}  # loosened bounds keep the spam doc

    src = str(tmp_path / "src")
    corpus.write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    name = f"ovr_{uuid.uuid4().hex[:8]}"
    q = (
        build_streaming_curation(load_config(conf))(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    stream_ids = {
        r["doc_id"] for r in spark.table(name).select("doc_id").collect()
    }
    spark.catalog.dropTempView(name)
    assert stream_ids == batch_ids


def test_cap_per_group_two_phase_equals_single_window(spark):
    """The skew-safe two-phase rank must select EXACTLY the rows a
    single global window would, for every salt layout — and hot
    groups cap at n while small groups pass through."""
    from pyspark.sql import Window

    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import cap_per_group

    rows = [
        (i, "hot" if i < 40 else f"s{i % 3}", float(i % 7)) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, score double")
    for n_salts in (1, 4, 16):
        got = {
            r.doc_id
            for r in cap_per_group(
                df, "source", 5, order_col="score", n_salts=n_salts
            ).collect()
        }
        w = Window.partitionBy("source").orderBy(
            F.col("score").desc_nulls_last(), F.col("doc_id").asc()
        )
        want = {
            r.doc_id
            for r in df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5)
            .collect()
        }
        assert got == want
    counts = (
        cap_per_group(df, "source", 5, order_col="score")
        .groupBy("source")
        .count()
        .collect()
    )
    assert {r["source"]: r["count"] for r in counts}["hot"] == 5


def test_pipeline_group_cap_stage(spark, sf_dir):
    full = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    run = build_corpus_pipeline(
        load_config(
            {
                "keyspaces-cdc-streams": {
                    "corpus": {"max-docs-per-group": 2}
                }
            }
        )
    )
    out = run(full)
    per = out.groupBy("source").count().collect()
    assert per and all(r["count"] <= 2 for r in per)

    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import build_streaming_curation

    with pytest.raises(ConfigError) as e:
        build_streaming_curation(
            load_config(
                {
                    "keyspaces-cdc-streams": {
                        "corpus": {"max-docs-per-group": 2}
                    }
                }
            )
        )
    assert "max-docs-per-group" in str(e.value)


@pytest.mark.parametrize("int8", [False, True])
def test_streaming_semantic_index_matches_batch(spark, docs, tmp_path, int8):
    """The late-r5 paraphrase-level suppression stage
    (``semantic-index-path``) is stream-safe: micro-batch replay
    produces EXACTLY the batch pipeline's rows, and docs identical to
    standing-index members are suppressed (hash-embed cos = 1, and
    int8 approx-cos ≈ 1 well above eps).  Parametrized over the r8
    int8 member layout — the probe auto-detects it, so the SAME
    config key covers both."""
    import uuid

    from sample_keyspaces_cdc_streams_connectors_spark.llm.embedding import hash_embed
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import build_streaming_curation
    from sample_keyspaces_cdc_streams_connectors_spark.llm.semdedup import write_semantic_index

    standing = docs.orderBy("doc_id").limit(5)
    idx = str(tmp_path / "semidx")
    write_semantic_index(
        standing.select(
            F.col("doc_id").alias("vec_id"),
            hash_embed(F.col("text"), dims=64).alias("embedding"),
        ),
        idx,
        k=4,
        n_iter=2,
        int8=int8,
    )
    conf = {
        "keyspaces-cdc-streams": {
            "corpus": {"semantic-index-path": idx}
        }
    }
    src = str(tmp_path / "src")
    docs.select("doc_id", "text").repartition(4).write.parquet(src)
    schema = spark.read.parquet(src).schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = f"semcur_{uuid.uuid4().hex[:8]}"
    q = (
        build_streaming_curation(load_config(conf))(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    streamed = {
        r["doc_id"] for r in spark.table(name).select("doc_id").collect()
    }
    spark.catalog.dropTempView(name)

    batch = build_corpus_pipeline(load_config(conf))(
        spark.read.parquet(src)
    )
    expected = {r["doc_id"] for r in batch.select("doc_id").collect()}
    assert streamed == expected
    # the standing docs themselves are suppressed (self-similarity 1)
    standing_ids = {r["doc_id"] for r in standing.select("doc_id").collect()}
    assert not (streamed & standing_ids)
    assert len(streamed) > 0


def test_semantic_dedup_passes_empty_input_through(spark):
    """dedup=semantic on an input the earlier stages emptied returns
    an empty frame like every other mode instead of crashing
    kmeans_fit (r5 review finding)."""
    conf = {
        "keyspaces-cdc-streams": {
            "corpus": {"dedup": "semantic", "min-quality": 1000000}
        }
    }
    empty_out = build_corpus_pipeline(load_config(conf))(
        spark.createDataFrame(
            [(1, "some document text here")], "doc_id long, text string"
        )
    )
    assert empty_out.count() == 0


def test_cluster_dedup_exact_collapse_equivalence(spark):
    """The r6 dedup-ladder pre-pass (exact-collapse before candidate
    generation) must be OUTPUT-IDENTICAL to pairing the full corpus:
    exact duplicates are Jaccard-1 cliques, so rep-star edges preserve
    every connected component.  Fixture mixes exact copies, near dups
    and a transitive chain."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.components import dedup_survivors
    from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup import (
        ngram_jaccard_pairs,
        release_ngram_cache,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    toks = base.split()
    rows = [
        (1, base),
        (2, " ".join(toks[:-1] + ["omega"])),   # near dup of 1
        (3, " ".join(["omega"] + toks[1:])),    # near dup of 1 (chain)
        (4, "completely different words entirely unrelated content here"),
        (101, base),                             # exact copy of 1
        (102, base),                             # exact copy of 1
        (104, "completely different words entirely unrelated content here"),
        (5, "a third island of text with its own vocabulary and phrasing"),
    ]
    docs8 = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = load_config(
        {"keyspaces-cdc-streams": {"corpus": {"dedup": "cluster"}}}
    )
    got = {r.doc_id for r in build_corpus_pipeline(cfg)(docs8).collect()}
    # ground truth: full-corpus pair generation (the pre-r6 shape)
    full_pairs = ngram_jaccard_pairs(
        docs8.select("doc_id", "text"), threshold=0.5
    )
    expect = {
        r.doc_id
        for r in dedup_survivors(docs8, full_pairs, id_col="doc_id")
        .select("doc_id")
        .collect()
    }
    release_ngram_cache()
    assert got == expect == {1, 4, 5}


def test_cluster_candidate_generation_sees_only_reps(spark, monkeypatch):
    """The ladder-ordering pin: in cluster mode the pair generator
    receives the exact-collapsed representatives, never the raw
    duplicated corpus (6-way duplication would otherwise send 36x the
    candidate volume through the pair shuffle)."""
    import sample_keyspaces_cdc_streams_connectors_spark.llm.dedup as d

    seen = {}
    real = d.ngram_jaccard_pairs

    def spy(docs, **kw):
        seen["n_docs"] = docs.count()
        return real(docs, **kw)

    monkeypatch.setattr(d, "ngram_jaccard_pairs", spy)
    texts = [
        " ".join(f"grp{t}tok{i}" for i in range(12)) for t in range(4)
    ]
    rows = [
        (t * 100 + c, texts[t]) for t in range(4) for c in range(6)
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = load_config(
        {"keyspaces-cdc-streams": {"corpus": {"dedup": "cluster"}}}
    )
    out = build_corpus_pipeline(cfg)(corpus)
    kept = {r.doc_id for r in out.select("doc_id").collect()}
    assert seen["n_docs"] == 4          # only the 4 representatives
    assert kept == {0, 100, 200, 300}   # min id per exact group
    from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup import release_ngram_cache

    release_ngram_cache()


def test_cluster_dedup_collapses_short_exact_copies(spark):
    """Docs shorter than shingle_k tokens yield no shingles, so the
    pre-ladder pipeline could never pair them — exact copies of a
    1-2 token doc both survived.  The r6 exact-collapse star edge is
    an intentional improvement: byte-identical short docs now
    collapse to one representative, while DISTINCT short docs are
    untouched (no shingles -> no near-dup pairs)."""
    rows = [
        (1, "hi"),                       # 1 token < shingle_k=3
        (2, "hi"),                       # exact copy: now collapses
        (3, "hi there"),                 # 2 tokens, distinct: kept
        (4, "one two three four five"),  # normal doc
        (5, "one two three four five"),  # exact copy: collapses
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = load_config(
        {"keyspaces-cdc-streams": {"corpus": {"dedup": "cluster"}}}
    )
    kept = {r.doc_id for r in build_corpus_pipeline(cfg)(docs).collect()}
    from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup import release_ngram_cache

    release_ngram_cache()
    assert kept == {1, 3, 4}


def test_assign_split_total_exclusive_deterministic(spark, docs):
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import assign_split

    fr = {"train": 0.98, "val": 0.01, "test": 0.01}
    out = assign_split(docs, fr)
    n = docs.count()
    # total: every row gets exactly one label
    assert out.count() == n
    labels = {r["split"] for r in out.select("split").distinct().collect()}
    assert labels <= set(fr)
    # deterministic + partition-invariant
    a = {(r.doc_id, r.split) for r in out.collect()}
    b = {
        (r.doc_id, r.split)
        for r in assign_split(docs.repartition(7), fr).collect()
    }
    assert a == b
    # a different salt re-deals the split
    c = {(r.doc_id, r.split) for r in assign_split(docs, fr, salt="s2").collect()}
    assert a != c
    # split hash independent of the mixture hash: sampling then
    # splitting keeps ~the same split shares as splitting alone
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import deterministic_sample

    sampled = assign_split(deterministic_sample(docs, 0.5), fr)
    whole = dict(a)
    assert all(whole[r.doc_id] == r.split for r in sampled.collect())


def test_assign_split_fraction_accuracy(spark):
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import assign_split

    big = spark.range(20000).select(F.col("id").alias("doc_id"))
    counts = {
        r["split"]: r["count"]
        for r in assign_split(big, {"train": 0.8, "val": 0.2})
        .groupBy("split")
        .count()
        .collect()
    }
    assert abs(counts["train"] / 20000 - 0.8) < 0.02
    assert abs(counts["val"] / 20000 - 0.2) < 0.02


def test_assign_split_is_map_only(spark, docs):
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import assign_split

    plan = (
        assign_split(docs, {"a": 0.5, "b": 0.5})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_assign_split_validates(spark, docs):
    import pytest as _pytest

    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import assign_split

    with _pytest.raises(ValueError, match="non-empty"):
        assign_split(docs, {})
    with _pytest.raises(ValueError, match="sum to 1"):
        assign_split(docs, {"a": 0.5, "b": 0.4})
    with _pytest.raises(ValueError, match=">= 0"):
        assign_split(docs, {"a": 1.5, "b": -0.5})
    # single-label degenerate case: everything gets the label, no when()
    assert (
        assign_split(docs, {"all": 1.0})
        .filter(F.col("split") != "all")
        .count()
        == 0
    )


def test_pipeline_split_stage_batch_and_streaming_agree(spark, docs, tmp_path):
    """corpus.split-permille labels every surviving row; the batch and
    streaming pipelines assign IDENTICAL labels (pure (salt, id)
    function), and the ladder parses/validates through config."""
    import uuid

    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import build_streaming_curation

    conf = {
        "keyspaces-cdc-streams": {
            "corpus": {"split-permille": "train:800,val:100,test:100"}
        }
    }
    batch = build_corpus_pipeline(load_config(conf))(docs)
    assert "split" in batch.columns
    got = {r.doc_id: r.split for r in batch.select("doc_id", "split").collect()}
    assert set(got.values()) <= {"train", "val", "test"}
    assert len(got) == docs.count()

    src = str(tmp_path / "split_src")
    docs.select("doc_id", "text").repartition(3).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = f"split_{uuid.uuid4().hex[:8]}"
    q = (
        build_streaming_curation(load_config(conf))(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    streamed = {
        r.doc_id: r.split
        for r in spark.table(name).select("doc_id", "split").collect()
    }
    spark.catalog.dropTempView(name)
    assert {k: streamed[k] for k in got} == got


def test_pipeline_split_config_validates(spark):
    for bad in (
        "train:900,val:10",          # sums to 910
        "train:980,val:10,train:10",  # repeated label
        "train:abc,val:10",           # non-int
        ":990,val:10",                # empty label
    ):
        with pytest.raises(ConfigError):
            build_corpus_pipeline(
                load_config(
                    {"keyspaces-cdc-streams": {"corpus": {"split-permille": bad}}}
                )
            )


def test_mixture_weights_temperature():
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import mixture_weights_temperature

    counts = {"big": 90_000, "small": 10_000}
    # tau=1: proportional — every source sampled at the same rate, so
    # the default target (binding source at 1.0) keeps everything
    prop = mixture_weights_temperature(counts, tau=1.0)
    assert prop == {"big": 1.0, "small": 1.0}
    # tau<1 flattens: the small source's KEPT SHARE of the output
    # exceeds its corpus share; fractions stay in [0,1]
    flat = mixture_weights_temperature(counts, tau=0.5, target_total=20_000)
    out_small = flat["small"] * 10_000
    out_big = flat["big"] * 90_000
    assert out_small / (out_small + out_big) > 0.1
    assert 0.0 <= flat["big"] <= 1.0 and 0.0 <= flat["small"] <= 1.0
    assert abs((out_small + out_big) - 20_000) < 1.0
    # tau=0 is uniform per source
    uni = mixture_weights_temperature(counts, tau=0.0, target_total=10_000)
    assert abs(uni["big"] * 90_000 - 5_000) < 1.0
    assert abs(uni["small"] * 10_000 - 5_000) < 1.0
    # default target under tau<1: binding source hits exactly 1.0
    d = mixture_weights_temperature(counts, tau=0.5)
    assert max(d.values()) == 1.0
    # zero-count sources get 0.0; validation errors raise
    z = mixture_weights_temperature({"a": 100, "b": 0})
    assert z["b"] == 0.0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mixture_weights_temperature({})
    with _pytest.raises(ValueError):
        mixture_weights_temperature({"a": -1})
    with _pytest.raises(ValueError):
        mixture_weights_temperature({"a": 1}, tau=-0.1)


# --- FFD packing (r8) --------------------------------------------------------


def test_pack_ffd_strict_budget_and_totality(spark, docs):
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import pack_sequences

    out = pack_sequences(docs, max_tokens=24, n_shards=4, strategy="ffd")
    rows = out.select(
        "pack_shard", "message_idx", "n_tokens", "oversize", "doc_id"
    ).collect()
    assert {r["doc_id"] for r in rows} == {
        r["doc_id"] for r in docs.collect()
    }
    bins: dict = {}
    for r in rows:
        bins.setdefault((r["pack_shard"], r["message_idx"]), []).append(r)
    for key, members in bins.items():
        if any(m["oversize"] for m in members):
            # oversize docs are alone in their bin
            assert len(members) == 1
            assert members[0]["n_tokens"] > 24
        else:
            assert sum(m["n_tokens"] for m in members) <= 24, key


def test_pack_ffd_matches_sequential_reference_and_partitioning(spark, docs):
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import pack_sequences

    def collect_assign(df):
        return {
            r["doc_id"]: (r["pack_shard"], r["message_idx"])
            for r in pack_sequences(
                df, max_tokens=32, n_shards=4, strategy="ffd"
            ).collect()
        }

    a = collect_assign(docs)
    b = collect_assign(docs.repartition(7))
    assert a == b

    # sequential FFD reference over one shard's members
    rows = pack_sequences(
        docs, max_tokens=32, n_shards=4, strategy="ffd"
    ).select("pack_shard", "doc_id", "n_tokens").collect()
    shard0 = sorted(
        ((r["n_tokens"], r["doc_id"]) for r in rows if r["pack_shard"] == 0),
        key=lambda t: (-t[0], t[1]),
    )
    bins = []
    ref = {}
    for w, did in shard0:
        if w > 32:
            bins.append(-1)
            ref[did] = len(bins) - 1
            continue
        for j, cap in enumerate(bins):
            if cap >= w:
                bins[j] = cap - w
                ref[did] = j
                break
        else:
            bins.append(32 - w)
            ref[did] = len(bins) - 1
    got = {d: m for d, (s, m) in a.items() if s == 0}
    # a (re-run uses max_tokens=32 too)
    assert got == ref


def test_pack_ffd_strict_where_greedy_overflows(spark, docs):
    """The two strategies' actual trade-off: at the same budget the
    greedy id-ordered cut produces bins that EXCEED max_tokens (its
    documented +largest-member overflow), while FFD bins never do —
    and FFD stays within its 11/9·OPT approximation bound per shard."""
    import math

    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import pack_sequences

    mt = 128
    greedy = (
        pack_sequences(docs, max_tokens=mt, n_shards=2, strategy="greedy")
        .groupBy("pack_shard", "message_idx")
        .agg(F.sum("n_tokens").alias("tot"))
        .collect()
    )
    assert any(r["tot"] > mt for r in greedy)  # greedy overflows

    ffd = (
        pack_sequences(docs, max_tokens=mt, n_shards=2, strategy="ffd")
        .groupBy("pack_shard", "message_idx")
        .agg(F.sum("n_tokens").alias("tot"), F.max("oversize").alias("ov"))
        .collect()
    )
    assert all(r["tot"] <= mt for r in ffd if not r["ov"])  # FFD never does
    # FFD approximation bound per shard: bins <= 11/9 * OPT + 1, with
    # OPT >= ceil(total/max) (no oversize docs at this budget)
    per_shard: dict = {}
    for r in ffd:
        s = per_shard.setdefault(r["pack_shard"], [0, 0])
        s[0] += 1
        s[1] += r["tot"]
    for shard, (n_bins, total) in per_shard.items():
        opt_lb = math.ceil(total / mt)
        assert n_bins <= math.ceil(11 / 9 * opt_lb) + 1, shard


def test_pack_strategy_validated(spark, docs):
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import pack_sequences

    with pytest.raises(ValueError, match="strategy"):
        pack_sequences(docs, max_tokens=32, strategy="bogus")


def test_annotate_corpus_sql_text_matches_column_form(spark, sf_dir):
    """r15: annotate_corpus composes its projection as SQL text (the
    functions.text *_sql twins); rows must be byte-identical to the
    Column form, and a frame that already carries annotation columns
    takes the replace-in-place Column path (no duplicate columns)."""
    from pyspark.sql import functions as F

    from sample_keyspaces_cdc_streams_connectors_spark.functions.text import (
        bpe_token_estimate,
        lang_id,
        quality_score,
        stopword_count,
        token_count,
    )
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import annotate_corpus
    from sample_keyspaces_cdc_streams_connectors_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(300)

    t = F.col("text")
    staged = docs.withColumns(
        {"__ntok": token_count(t), "__nstop": stopword_count(t)}
    )
    n, stops = F.col("__ntok"), F.col("__nstop")
    column_form = staged.withColumns(
        {
            "n_tokens": n,
            "n_bpe_est": bpe_token_estimate(t),
            "lang": lang_id(t, n=n, stops=stops),
            "quality": quality_score(t, n=n, stops=stops),
        }
    ).drop("__ntok", "__nstop")

    new = annotate_corpus(docs)
    assert new.columns == column_form.columns
    assert sorted(map(tuple, new.collect())) == sorted(
        map(tuple, column_form.collect())
    )

    # re-annotation: columns replace in place, count unchanged
    again = annotate_corpus(new)
    assert again.columns == new.columns
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, new.collect())
    )
