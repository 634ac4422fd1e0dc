"""Property-based tests (hypothesis) for the operators whose
correctness is combinatorial: message batching invariants,
op-classification vs a pure-Python reference, winnowing guarantees.

The reference repo has NO property tests (SURVEY §5); these pin the
semantic invariants that single examples cannot.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SLOW = settings(
    max_examples=8,  # each example is a full Spark job (~1s)
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# --- batching invariants ---------------------------------------------------

sizes_strategy = st.lists(
    st.integers(min_value=1, max_value=400), min_size=1, max_size=60
)


@SLOW
@given(sizes=sizes_strategy, max_records=st.integers(1, 10))
def test_batching_count_bound_holds(spark, sizes, max_records):
    from sample_keyspaces_cdc_streams_connectors_spark.operators.batching import assign_messages

    rows = [("s", f"{i:06d}", s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "shard string, seq string, nbytes long")
    out = assign_messages(
        df,
        shard_col="shard",
        seq_col="seq",
        size_col=F.col("nbytes"),
        max_message_size=1 << 30,
        max_records=max_records,
    ).collect()
    # every record present exactly once
    assert sorted(r.seq for r in out) == sorted(r[1] for r in rows)
    by_msg: dict = {}
    for r in out:
        by_msg.setdefault(r.message_idx, []).append(r)
    # count bound holds per message
    assert all(len(v) <= max_records for v in by_msg.values())
    # message ids are the true seq range of their members
    for v in by_msg.values():
        seqs = sorted(r.seq for r in v)
        assert v[0].message_id == f"{seqs[0]}-{seqs[-1]}"


@SLOW
@given(sizes=sizes_strategy, max_size=st.integers(200, 1000))
def test_batching_size_bound_holds(spark, sizes, max_size):
    """Bucketing by floor(running/max): any message's byte total is
    < max_size + its largest member (the same guarantee the greedy
    reference packing gives for records <= max_size)."""
    from sample_keyspaces_cdc_streams_connectors_spark.operators.batching import assign_messages

    rows = [("s", f"{i:06d}", s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "shard string, seq string, nbytes long")
    out = assign_messages(
        df,
        shard_col="shard",
        seq_col="seq",
        size_col=F.col("nbytes"),
        max_message_size=max_size,
    ).collect()
    by_msg: dict = {}
    for r in out:
        by_msg.setdefault(r.message_idx, []).append(r["__size"])
    for sizes_in_msg in by_msg.values():
        assert sum(sizes_in_msg) < max_size + max(sizes_in_msg)
    # monotone: bucket index never decreases along the sequence
    ordered = sorted(out, key=lambda r: r.seq)
    idxs = [r.message_idx for r in ordered]
    assert idxs == sorted(idxs)


# --- classification vs pure-python reference -------------------------------


def _py_classify(origin, has_new, has_old):
    """StreamHelpers.getOperationType re-written in Python
    (StreamHelpers.java:26-63)."""
    if origin is None:
        return "UNKNOWN"
    if origin == "TTL":
        return "TTL"
    repl = origin == "REPLICATION"
    if has_old and not has_new:
        return "REPLICATED_DELETE" if repl else "DELETE"
    if has_new and not has_old:
        return "REPLICATED_INSERT" if repl else "INSERT"
    # reference final else (StreamHelpers.java:55-61): both present —
    # or both absent — is update-class
    return "REPLICATED_UPDATE" if repl else "UPDATE"


@SLOW
@given(
    cases=st.lists(
        st.tuples(
            st.sampled_from([None, "USER", "REPLICATION", "TTL"]),
            st.booleans(),
            st.booleans(),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_classification_matches_reference(spark, cases):
    from tests.test_classify import SCHEMA

    from sample_keyspaces_cdc_streams_connectors_spark.operators.classify import classify_operation

    rows = [
        (
            ("ks", "tbl", None, origin),
            (1,) if has_new else None,
            (2,) if has_old else None,
        )
        for origin, has_new, has_old in cases
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = [
        r.op
        for r in classify_operation(df)
        .select(F.col("metadata.stream_operation_type").alias("op"))
        .collect()
    ]
    expect = [_py_classify(*c) for c in cases]
    assert got == expect


# --- winnowing guarantees --------------------------------------------------


@SLOW
@given(
    hashes=st.lists(st.integers(0, 10**9), min_size=1, max_size=40),
    w=st.integers(2, 6),
)
def test_winnow_covers_every_window(spark, hashes, w):
    from sample_keyspaces_cdc_streams_connectors_spark.functions.text import winnow_fingerprints

    df = spark.createDataFrame([(hashes,)], "h array<bigint>").select(
        winnow_fingerprints(F.col("h"), w).alias("fps")
    )
    fps = set(df.collect()[0].fps)
    assert fps <= set(hashes)
    # the defining guarantee: every w-window's minimum is selected
    if len(hashes) >= w:
        for i in range(len(hashes) - w + 1):
            assert min(hashes[i : i + w]) in fps
    else:
        assert min(hashes) in fps


# --- typed file-source round-trip ------------------------------------------


@SLOW
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs",),  # no lone surrogates
            ),
            max_size=40,
        ),
        min_size=1,
        max_size=20,
    ),
    vals=st.lists(
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        min_size=1,
        max_size=20,
    ),
)
def test_csv_roundtrip_survives_arbitrary_text(spark, tmp_path_factory, texts, vals):
    """Quotes, commas, newlines, unicode, extreme doubles — the typed
    CSV writer/reader pair must return every row bit-exactly (the
    loss modes are quoting bugs and float formatting)."""
    from sample_keyspaces_cdc_streams_connectors_spark.sources.files import load_csv, write_csv

    n = min(len(texts), len(vals))
    rows = [
        (i, texts[i % len(texts)], float(vals[i % len(vals)]))
        for i in range(n)
        # documented residual: a literal \N cell IS the null sentinel
        if texts[i % len(texts)] != "\\N"
    ]
    if not rows:
        return
    df = spark.createDataFrame(rows, "id bigint, body string, x double")
    path = str(tmp_path_factory.mktemp("csv_prop"))
    write_csv(df, path)
    back = load_csv(
        spark,
        path,
        {"id": "bigint", "body": "text", "x": "double"},
        multiline=True,  # generated text may contain line terminators
    )
    got = sorted((r.id, r.body, r.x) for r in back.collect())
    assert got == sorted(rows)


@SLOW
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)),
            max_size=60,
        ),
        min_size=1,
        max_size=20,
    ),
)
def test_json_roundtrip_survives_arbitrary_text(spark, tmp_path_factory, texts):
    """Unicode, control characters, quotes, backslashes — the JSON
    lines writer/reader pair must return every row exactly (the
    reference's converter tests stress the same classes of input:
    AbstractJSONConverterTest.java:204-218, 1039-1052)."""
    from sample_keyspaces_cdc_streams_connectors_spark.sources.files import load_json, write_json

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id bigint, body string")
    path = str(tmp_path_factory.mktemp("json_prop"))
    write_json(df, path)
    back = load_json(spark, path, {"id": "bigint", "body": "text"})
    got = sorted((r.id, r.body) for r in back.collect())
    assert got == sorted(rows)


# --- PII scrub invariants --------------------------------------------------

pii_fragments = st.lists(
    st.sampled_from(
        [
            "plain words here",
            "bob@example.com",
            "(555) 123-4567",
            "10.0.0.1",
            "123-45-6789",
            "4111 1111 1111 1111",
            "v1.2.3.4.5",
            "x" * 30,
            "unicode ñöŵ",
        ]
    ),
    min_size=1,
    max_size=6,
)


@SLOW
@given(frags=st.lists(pii_fragments, min_size=1, max_size=10))
def test_pii_scrub_idempotent_and_complete(spark, frags):
    """Scrubbing twice equals scrubbing once (redaction tokens contain
    no PII-shaped substrings), and no scrubbed row still matches any
    PII pattern."""
    from sample_keyspaces_cdc_streams_connectors_spark.functions.pii import (
        PII_PATTERNS,
        scrub_pii,
    )

    rows = [(i, " ".join(f)) for i, f in enumerate(frags)]
    df = spark.createDataFrame(rows, "id long, text string")
    once = scrub_pii(F.col("text"))
    out = df.select(
        "id",
        once.alias("once"),
        scrub_pii(once).alias("twice"),
        *[
            F.regexp_count(once, F.lit(p)).alias(f"left_{k}")
            for k, p in PII_PATTERNS.items()
        ],
    )
    for r in out.collect():
        assert r.once == r.twice, "scrub must be idempotent"
        for k in PII_PATTERNS:
            assert getattr(r, f"left_{k}") == 0, (k, r.once)


# --- repetition statistics invariants --------------------------------------

words = st.text(
    alphabet="abcdefg", min_size=1, max_size=4
)
lines_strategy = st.lists(
    st.lists(words, min_size=1, max_size=6).map(" ".join),
    min_size=0,
    max_size=12,
)


@SLOW
@given(lines=lines_strategy)
def test_repetition_stats_are_valid_fractions(spark, lines):
    """Every repetition statistic is in [0,1] on arbitrary text, and
    the duplicate-line fraction is 0 iff all non-blank lines are
    distinct."""
    from sample_keyspaces_cdc_streams_connectors_spark.functions.repetition import (
        GOPHER_DEFAULTS,
        with_repetition_stats,
    )

    text = "\n".join(lines)
    df = spark.createDataFrame([(1, text)], "id long, text string")
    row = with_repetition_stats(df).collect()[0].asDict()
    for stat in GOPHER_DEFAULTS:
        assert 0.0 <= row[stat] <= 1.0, (stat, row[stat], text)
    nonblank = [l for l in lines if l.strip()]
    if len(set(nonblank)) == len(nonblank):
        assert row["dup_line_frac"] == 0.0
        assert row["dup_line_char_frac"] == 0.0
    else:
        assert row["dup_line_frac"] > 0.0


@SLOW
@given(vals=st.lists(words, min_size=0, max_size=30))
def test_most_common_run_matches_counter(spark, vals):
    """The sorted-array mode pass agrees with a Python Counter (on
    count; the winning value must carry that count)."""
    from collections import Counter

    from sample_keyspaces_cdc_streams_connectors_spark.functions.repetition import most_common_run

    df = spark.createDataFrame([(1, vals)], "id long, arr array<string>")
    got = df.select(
        most_common_run(F.array_sort("arr")).alias("m")
    ).collect()[0]["m"]
    if not vals:
        assert got["best_run"] == 0
    else:
        counts = Counter(vals)
        assert got["best_run"] == max(counts.values())
        assert counts[got["best"]] == got["best_run"]


# --- importance resampling invariants --------------------------------------


@SLOW
@given(
    weights=st.lists(
        st.floats(min_value=-5, max_value=5, allow_nan=False),
        min_size=1,
        max_size=20,
    ),
    k=st.integers(1, 25),
)
def test_gumbel_topk_size_and_subset(spark, weights, k):
    """Gumbel top-k returns exactly min(k, n) rows drawn from the
    input, independent of partitioning."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.importance import gumbel_resample_top_k

    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id long, log_importance double")
    picked = gumbel_resample_top_k(df, k).collect()
    assert len(picked) == min(k, len(weights))
    ids = {r["doc_id"] for r in picked}
    assert ids <= {i for i, _ in rows}
    again = gumbel_resample_top_k(df.repartition(5), k).collect()
    assert {r["doc_id"] for r in again} == ids


# --- Avro codec round-trip (pure Python — no Spark session needed) --------

_avro_field_types = st.sampled_from(
    ["string", "long", "int", "double", "float", "boolean", "bytes"]
)


def _value_for(t: str):
    if t == "string":
        return st.text(max_size=40)
    if t in ("long", "int"):
        lo, hi = (
            (-(2**63), 2**63 - 1) if t == "long" else (-(2**31), 2**31 - 1)
        )
        return st.integers(lo, hi)
    if t == "double":
        return st.floats(allow_nan=False, width=64)
    if t == "float":
        return st.floats(allow_nan=False, width=32)
    if t == "boolean":
        return st.booleans()
    return st.binary(max_size=40)


@st.composite
def _avro_tables(draw):
    n_fields = draw(st.integers(1, 5))
    fields = []
    for i in range(n_fields):
        t = draw(_avro_field_types)
        nullable = draw(st.booleans())
        fields.append(
            {"name": f"f{i}", "type": ["null", t] if nullable else t}
        )
    schema = {"type": "record", "name": "prop", "fields": fields}
    n_rows = draw(st.integers(0, 30))
    rows = []
    for _ in range(n_rows):
        row = []
        for f in fields:
            t = f["type"]
            if isinstance(t, list) and draw(st.booleans()):
                row.append(None)
            else:
                base = t[1] if isinstance(t, list) else t
                row.append(draw(_value_for(base)))
        rows.append(tuple(row))
    return schema, rows


@settings(max_examples=60, deadline=None)
@given(table=_avro_tables(), block=st.integers(1, 7))
def test_avro_container_roundtrip_property(tmp_path_factory, table, block):
    """encode -> container -> decode is the identity for every
    supported type/nullability/row-count/block-size combination
    (floats compare exactly: the codec stores the bit pattern)."""
    import os
    import struct as _struct
    import uuid

    from sample_keyspaces_cdc_streams_connectors_spark.streaming.avro_io import (
        decode_container,
        write_container,
    )

    schema, rows = table
    path = os.path.join(
        str(tmp_path_factory.mktemp("avp")), f"{uuid.uuid4().hex}.avro"
    )
    # float32 fields: pre-round the expectation to float32 precision
    def f32(v):
        return _struct.unpack("<f", _struct.pack("<f", v))[0]

    expect = []
    for row in rows:
        vals = []
        for f, v in zip(schema["fields"], row):
            base = f["type"][1] if isinstance(f["type"], list) else f["type"]
            vals.append(f32(v) if base == "float" and v is not None else v)
        expect.append(tuple(vals))

    n = write_container(path, schema, rows, block_records=block)
    assert n == len(rows)
    with open(path, "rb") as fh:
        got_schema, got = decode_container(fh.read())
    assert [f["name"] for f in got_schema["fields"]] == [
        f["name"] for f in schema["fields"]
    ]
    assert got == expect


# --- distributed prefix sum vs sequential reference ------------------------


@SLOW
@given(
    weights=st.lists(
        st.integers(min_value=0, max_value=1000), min_size=1, max_size=80
    ),
    parts=st.integers(1, 7),
    n_buckets=st.sampled_from([1, 3, 16]),
)
def test_prefix_sum_matches_sequential_reference(
    spark, weights, parts, n_buckets
):
    """with_order_stats == the sequential scan of rows sorted by
    (hash, id), for ANY weights, partitioning, and bucket count."""
    import hashlib

    from sample_keyspaces_cdc_streams_connectors_spark.operators.prefixsum import with_order_stats

    rows = [
        (i, hashlib.md5(str(i).encode()).hexdigest(), w)
        for i, w in enumerate(weights)
    ]
    df = spark.createDataFrame(rows, "k long, h string, w long").repartition(
        parts
    )
    out, n_rows, total_w = with_order_stats(
        df, "h", ["k"], weight_col="w", n_buckets=n_buckets
    )
    got = {r["k"]: (r["pos"], r["cum"]) for r in out.collect()}

    expect, cum = {}, 0
    for pos, (k, _h, w) in enumerate(sorted(rows, key=lambda r: (r[1], r[0]))):
        expect[k] = (pos, cum)
        cum += w
    assert got == expect
    assert n_rows == len(weights)
    assert total_w == sum(weights)


def test_sql_twins_match_column_forms(spark):
    """r14 optimization: the `*_sql` SQL-text twins in functions.text
    (and llm.dedup.simhash_fold_sql) must produce byte-identical
    results to the Column-builder forms they replace on the hot
    construction paths — including whitespace runs, regex
    metacharacters, unicode, empties, and sub-k-token docs."""
    from pyspark.sql import functions as F

    from sample_keyspaces_cdc_streams_connectors_spark.functions.text import (
        bpe_token_estimate,
        bpe_token_estimate_sql,
        doc_fingerprint,
        doc_fingerprint_sql,
        lang_id,
        lang_id_sql,
        normalize_text,
        normalize_text_sql,
        quality_score,
        quality_score_sql,
        shingles_from_tokens,
        shingles_from_tokens_sql,
        stopword_count,
        stopword_count_sql,
        token_count,
        token_count_sql,
        tokens,
        tokens_sql,
    )
    from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup import (
        md5_int,
        simhash_fold,
        simhash_fold_sql,
    )

    texts = [
        "",
        "   ",
        "one",
        "The quick  brown\tfox\njumps over the lazy dog 42 !?",
        "a of THE and to in is on for it the the",
        "x" * 500,
        "tab\tsep\tvals 1.5 -3 [brackets] (parens) \\backslash\\ 'quo'",
        "ünïcode tëxt ümlaut ß € 中文 словами",
        "a b",
        "a b c d e f g h",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")

    t = F.col("text")
    col_form = df.select(
        "i",
        normalize_text(t).alias("norm"),
        tokens(t).alias("toks"),
        token_count(t).alias("n"),
        bpe_token_estimate(t).alias("bpe"),
        stopword_count(t).alias("stops"),
        lang_id(t).alias("lang"),
        quality_score(t).alias("q"),
        doc_fingerprint(t).alias("fp"),
    )
    sql_form = df.selectExpr(
        "i",
        f"{normalize_text_sql('text')} AS norm",
        f"{tokens_sql('text')} AS toks",
        f"{token_count_sql('text')} AS n",
        f"{bpe_token_estimate_sql('text')} AS bpe",
        f"{stopword_count_sql('text')} AS stops",
        f"{lang_id_sql('text')} AS lang",
        f"{quality_score_sql('text')} AS q",
        f"{doc_fingerprint_sql('text')} AS fp",
    )
    a = sorted(map(tuple, col_form.collect()))
    b = sorted(map(tuple, sql_form.collect()))
    assert a == b

    # shingles + simhash fold twins operate on the bound token array
    toks_df = df.select("i", tokens(normalize_text(t)).alias("__toks")).filter(
        F.size("__toks") > 0
    )
    sh_col = toks_df.select(
        "i",
        shingles_from_tokens(F.col("__toks"), 3).alias("sh"),
        simhash_fold(
            F.transform(F.col("__toks"), md5_int), 16
        ).alias("code"),
    )
    from sample_keyspaces_cdc_streams_connectors_spark.functions.text import md5_int_sql

    sh_sql = toks_df.selectExpr(
        "i",
        f"{shingles_from_tokens_sql('__toks', 3)} AS sh",
        f"{simhash_fold_sql(f'transform(__toks, x -> {md5_int_sql(chr(120))})', 16)} AS code",
    )
    a2 = sorted(map(tuple, sh_col.collect()))
    b2 = sorted(map(tuple, sh_sql.collect()))
    assert a2 == b2
