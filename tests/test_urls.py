"""URL curation functions (functions/urls.py): normalization rules,
host/domain extraction, subdomain-aware blocklist filtering, and the
zero-shuffle/zero-Python plan for the column functions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.functions.urls import (
    filter_blocked_hosts,
    normalize_url,
    registered_domain,
    url_host,
)


def _one(spark, fn, url):
    return (
        spark.createDataFrame([(url,)], "u string")
        .select(fn(F.col("u")).alias("v"))
        .first()["v"]
    )


@pytest.mark.parametrize(
    "url,host",
    [
        ("https://WWW.Example.COM/path", "example.com"),
        ("http://user:pw@sub.Example.org:8080/x", "sub.example.org"),
        ("https://example.com", "example.com"),
        ("ftp://files.example.net/a", "files.example.net"),
        ("not a url", ""),
        ("https://192.168.0.1:8443/admin", "192.168.0.1"),
    ],
)
def test_url_host(spark, url, host):
    assert _one(spark, url_host, url) == host


@pytest.mark.parametrize(
    "url,dom",
    [
        ("https://a.b.example.com/x", "example.com"),
        ("https://news.bbc.co.uk/x", "bbc.co.uk"),
        ("https://bbc.co.uk/x", "bbc.co.uk"),
        ("https://example.com/", "example.com"),
        ("https://localhost/x", "localhost"),
        ("https://192.168.0.1/x", "192.168.0.1"),
        ("https://deep.sub.shop.com.au/x", "shop.com.au"),
    ],
)
def test_registered_domain(spark, url, dom):
    assert _one(spark, registered_domain, url) == dom


@pytest.mark.parametrize(
    "url,norm",
    [
        # scheme+host casefold, path case preserved
        ("HTTPS://Example.COM/Path/File", "https://example.com/Path/File"),
        # default ports dropped, non-default kept
        ("http://example.com:80/a", "http://example.com/a"),
        ("https://example.com:443/a", "https://example.com/a"),
        ("https://example.com:8443/a", "https://example.com:8443/a"),
        # fragment dropped
        ("https://example.com/a#section", "https://example.com/a"),
        # tracking params stripped, separators repaired
        (
            "https://example.com/a?utm_source=x&id=7&utm_campaign=y",
            "https://example.com/a?id=7",
        ),
        ("https://example.com/a?utm_source=x", "https://example.com/a"),
        (
            "https://example.com/a?fbclid=abc&q=spark",
            "https://example.com/a?q=spark",
        ),
        # one trailing slash off a non-root path; root kept
        ("https://example.com/a/b/", "https://example.com/a/b"),
        ("https://example.com/", "https://example.com/"),
        # non-URLs pass through untouched
        ("plain text", "plain text"),
    ],
)
def test_normalize_url(spark, url, norm):
    assert _one(spark, normalize_url, url) == norm


def test_normalized_dedup_collapses_tracking_variants(spark):
    urls = [
        (1, "https://Example.com/a?utm_source=tw"),
        (2, "https://example.com/a"),
        (3, "https://example.com/a#frag"),
        (4, "https://example.com/b"),
    ]
    df = spark.createDataFrame(urls, "id long, u string")
    n = (
        df.select(normalize_url(F.col("u")).alias("cu"))
        .distinct()
        .count()
    )
    assert n == 2


def test_filter_blocked_hosts_subdomain_aware(spark):
    rows = [
        (1, "https://ads.example.com/x"),      # subdomain of blocked
        (2, "https://example.com/y"),          # blocked exactly
        (3, "https://example.org/z"),          # clean
        (4, "https://notexample.com/w"),       # NOT a subdomain (no dot)
        (5, "not a url"),                      # hostless, survives
    ]
    df = spark.createDataFrame(rows, "id long, u string")
    out = {r["id"] for r in filter_blocked_hosts(df, "u", ["example.com"]).collect()}
    assert out == {3, 4, 5}


def test_filter_blocked_hosts_dataframe_blocklist(spark):
    df = spark.createDataFrame(
        [(1, "https://a.bad.net/x"), (2, "https://good.net/y")],
        "id long, u string",
    )
    blocked = spark.createDataFrame([("BAD.net",)], "host string")
    out = {r["id"] for r in filter_blocked_hosts(df, "u", blocked).collect()}
    assert out == {2}


def test_filter_blocked_hosts_null_columns_still_filtered(spark):
    """r8 ADVICE fix: the old full-row anti-join used null-unsafe
    equality, so a blocked row with ANY NULL column leaked through.
    Blocking must depend only on the URL."""
    rows = [
        (1, "https://bad.com/x", None),            # blocked, NULL text
        (2, "https://sub.bad.com/y", None),        # blocked subdomain, NULL
        (3, "https://ok.com/z", None),             # clean, NULL text
        (4, None, "no url at all"),                # NULL url survives
    ]
    df = spark.createDataFrame(rows, "id long, u string, text string")
    out = {r["id"] for r in filter_blocked_hosts(df, "u", ["bad.com"]).collect()}
    assert out == {3, 4}


def test_filter_blocked_hosts_non_equatable_columns(spark):
    """Map-typed columns broke the old full-row join outright; the
    suffix-key joins never touch them."""
    df = spark.createDataFrame(
        [(1, "https://bad.com/x", {"k": "v"}), (2, "https://ok.com/y", {})],
        "id long, u string, meta map<string,string>",
    )
    out = {r["id"] for r in filter_blocked_hosts(df, "u", ["bad.com"]).collect()}
    assert out == {2}


def test_filter_blocked_hosts_www_blocklist_entry(spark):
    """r8 ADVICE fix: hosts-file blocklists commonly carry a leading
    ``www.`` — the entry must get the same normalization as row hosts."""
    rows = [
        (1, "https://www.bad.com/x"),
        (2, "https://bad.com/y"),
        (3, "https://tracker.bad.com/z"),
        (4, "https://good.com/w"),
    ]
    df = spark.createDataFrame(rows, "id long, u string")
    out = {
        r["id"]
        for r in filter_blocked_hosts(df, "u", ["WWW.bad.com "]).collect()
    }
    assert out == {4}


def test_filter_blocked_hosts_literal_plan_pure_filter(spark):
    """r14: a LITERAL blocklist compiles to a pure filter predicate
    (one INSET per depth) — zero joins, zero exchanges; the r8 shape
    paid one broadcast anti-join per depth on every execution."""
    df = spark.createDataFrame([(1, "https://a.com/x")], "id long, u string")
    plan = (
        filter_blocked_hosts(df, "u", ["bad.com", "deep.sub.bad.org"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_filter_blocked_hosts_dataframe_plan_broadcast_anti(spark):
    """A DataFrame blocklist keeps the per-depth broadcast hash
    anti-joins (the scalable path for large lists); never a
    nested-loop or cartesian plan."""
    df = spark.createDataFrame([(1, "https://a.com/x")], "id long, u string")
    bl = spark.createDataFrame(
        [("bad.com",), ("deep.sub.bad.org",)], "host string"
    )
    plan = (
        filter_blocked_hosts(df, "u", bl)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_filter_blocked_hosts_empty_blocklist_is_identity(spark):
    df = spark.createDataFrame([(1, "https://a.com/x")], "id long, u string")
    assert filter_blocked_hosts(df, "u", []).count() == 1


def test_column_functions_zero_shuffle_zero_python(spark):
    df = spark.createDataFrame([("https://a.example.com/x?utm_source=1",)], "u string")
    plan = (
        df.select(
            normalize_url(F.col("u")),
            url_host(F.col("u")),
            registered_domain(F.col("u")),
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan


# --- pipeline wiring ---------------------------------------------------------


def test_pipeline_url_dedup_and_blocklist(spark, tmp_path):
    from sample_keyspaces_cdc_streams_connectors_spark.config import load_config
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import build_corpus_pipeline

    rows = [
        (1, "https://Example.com/a?utm_source=x", "doc one text"),
        (2, "https://example.com/a", "doc one text copy"),   # url-dup of 1
        (3, "https://spam.bad.org/p", "spam text"),          # blocked subdomain
        (4, "https://good.org/q", "clean text"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string, text string")
    blocked_path = str(tmp_path / "blocked")
    spark.createDataFrame([("bad.org",)], "host string").write.parquet(
        blocked_path
    )
    cfg = load_config(
        {
            "keyspaces-cdc-streams": {
                "corpus": {
                    "dedup": "url",
                    "url-column": "url",
                    "blocked-hosts-path": blocked_path,
                }
            }
        }
    )
    kept = {
        r.doc_id for r in build_corpus_pipeline(cfg)(docs).collect()
    }
    assert kept == {1, 4}


def test_pipeline_url_keys_validated(spark):
    from sample_keyspaces_cdc_streams_connectors_spark.config import ConfigError, load_config
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import build_corpus_pipeline

    with pytest.raises(ConfigError, match="requires corpus.url-column"):
        build_corpus_pipeline(
            load_config(
                {"keyspaces-cdc-streams": {"corpus": {"dedup": "url"}}}
            )
        )
    with pytest.raises(ConfigError, match="requires corpus.url-column"):
        build_corpus_pipeline(
            load_config(
                {
                    "keyspaces-cdc-streams": {
                        "corpus": {"blocked-hosts-path": "/x"}
                    }
                }
            )
        )


def test_pipeline_url_dedup_exempts_missing_urls(spark):
    """r8 ADVICE fix: docs with NULL or non-URL ``url`` values must
    NOT collapse to one survivor — they are exempt from URL dedup."""
    from sample_keyspaces_cdc_streams_connectors_spark.config import load_config
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import build_corpus_pipeline

    rows = [
        (1, None, "null url one"),
        (2, None, "null url two"),
        (3, "N/A", "sentinel one"),
        (4, "N/A", "sentinel two"),
        (5, "https://example.com/a?utm_source=x", "real dup a"),
        (6, "https://example.com/a", "real dup b"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string, text string")
    cfg = load_config(
        {
            "keyspaces-cdc-streams": {
                "corpus": {"dedup": "url", "url-column": "url"}
            }
        }
    )
    kept = {r.doc_id for r in build_corpus_pipeline(cfg)(docs).collect()}
    assert kept == {1, 2, 3, 4, 5}


def test_streaming_blocklist_matches_batch(spark, tmp_path):
    """r8: blocked-hosts filtering is stream-safe (stream-static
    broadcast anti-joins) — micro-batch replay equals the batch
    pipeline on the same rows."""
    import uuid

    from sample_keyspaces_cdc_streams_connectors_spark.config import load_config
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import (
        build_corpus_pipeline,
        build_streaming_curation,
    )

    rows = [
        (1, "https://spam.bad.org/p", "spam text here and there"),
        (2, "https://good.org/q", "the clean text of a doc on the site"),
        (3, None, "the doc with no url is kept for it is clean"),
        (4, "https://bad.org/r", "more spam on the apex host"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string, text string")
    blocked_path = str(tmp_path / "blocked")
    spark.createDataFrame([("bad.org",)], "host string").write.parquet(
        blocked_path
    )
    conf = {
        "keyspaces-cdc-streams": {
            "corpus": {
                "url-column": "url",
                "blocked-hosts-path": blocked_path,
            }
        }
    }
    src = str(tmp_path / "src")
    docs.repartition(2).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = f"blk_{uuid.uuid4().hex[:8]}"
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
    batch = build_corpus_pipeline(load_config(conf))(spark.read.parquet(src))
    assert streamed == {r["doc_id"] for r in batch.select("doc_id").collect()}
    assert streamed == {2, 3}


def test_streaming_blocklist_requires_url_column(spark):
    from sample_keyspaces_cdc_streams_connectors_spark.config import ConfigError, load_config
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import build_streaming_curation

    with pytest.raises(ConfigError, match="requires corpus.url-column"):
        build_streaming_curation(
            load_config(
                {
                    "keyspaces-cdc-streams": {
                        "corpus": {"blocked-hosts-path": "/x"}
                    }
                }
            )
        )


def test_streaming_curation_rejects_url_dedup(spark):
    from sample_keyspaces_cdc_streams_connectors_spark.config import ConfigError, load_config
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import build_streaming_curation

    with pytest.raises(ConfigError, match="not stream-safe"):
        build_streaming_curation(
            load_config(
                {
                    "keyspaces-cdc-streams": {
                        "corpus": {"dedup": "url", "url-column": "url"}
                    }
                }
            )
        )


def test_pipeline_domain_quota(spark):
    """r8 corpus.max-docs-per-domain: cap per registered domain
    straight from the URL column; missing-URL docs exempt."""
    from sample_keyspaces_cdc_streams_connectors_spark.config import ConfigError, load_config
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import build_corpus_pipeline

    rows = [
        (1, "https://a.shop.com/1", "t1"),
        (2, "https://b.shop.com/2", "t2"),
        (3, "https://shop.com/3", "t3"),          # 3 docs, one domain
        (4, "https://other.org/x", "t4"),
        (5, None, "no url one"),
        (6, None, "no url two"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string, text string")
    cfg = load_config(
        {
            "keyspaces-cdc-streams": {
                "corpus": {
                    "url-column": "url",
                    "max-docs-per-domain": "2",
                }
            }
        }
    )
    kept = {r.doc_id for r in build_corpus_pipeline(cfg)(docs).collect()}
    # shop.com capped at 2 (lowest ids win), other.org under quota,
    # NULL-url docs both exempt
    assert kept == {1, 2, 4, 5, 6}
    with pytest.raises(ConfigError, match="requires corpus.url-column"):
        build_corpus_pipeline(
            load_config(
                {
                    "keyspaces-cdc-streams": {
                        "corpus": {"max-docs-per-domain": "2"}
                    }
                }
            )
        )


def test_streaming_rejects_domain_quota(spark):
    from sample_keyspaces_cdc_streams_connectors_spark.config import ConfigError, load_config
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import build_streaming_curation

    with pytest.raises(ConfigError, match="not stream-safe"):
        build_streaming_curation(
            load_config(
                {
                    "keyspaces-cdc-streams": {
                        "corpus": {
                            "url-column": "url",
                            "max-docs-per-domain": "2",
                        }
                    }
                }
            )
        )
