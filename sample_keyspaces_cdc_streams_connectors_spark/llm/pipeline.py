"""Config-driven training-corpus curation pipeline.

The reference assembles its CDC pipeline from configuration
(filter-expression, record-format, fields-to-include —
KeyspacesConfig.java:226-357); this module applies the same pattern
to the LLM-data layer: a declarative chain of corpus stages, each a
pure ``DataFrame -> DataFrame`` Column-expression transform, built
from the same ``EngineConfig`` machinery (env override included).

Stage order (each optional, config-gated):

1. scrub-pii     — redact emails/phones/IPs/SSNs/cards (codegen-only
                   projection; redaction counts ride along)
2. annotate      — token counts, BPE estimate, language id, quality
                   score (one projection, zero Python)
3. language      — keep configured languages
4. quality       — keep docs at/above the configured score
5. repetition    — drop boilerplate docs by the Gopher repetition
                   rules (``functions.repetition``; pure projection)
6. quality-model — score with the learned hashed-feature classifier
                   (``llm.quality_model``; map-only Arrow margin
                   pass) and keep docs above the threshold
6b. lm-perplexity — score fluency under a Stupid-Backoff n-gram LM
                   trained on a trusted corpus (``llm.ngram_lm``;
                   map-only Arrow pass) and drop the high-perplexity
                   tail (CCNet-style)
7. decontaminate — drop docs sharing long k-grams with an eval corpus
                   (broadcast-probe; see ``llm.decontaminate``)
8. dedup         — ``exact`` (md5 fingerprint), ``near`` (full
                   MinHash signature digest), ``cluster``
                   (ngram/minhash pairs closed into connected
                   components; min-id or ``cluster-prefer``-column
                   survivor), or ``semantic`` (SemDeDup in embedding
                   space; see ``llm.semdedup``)

Scale: scrub/annotate/language/quality are map-only;
exact/near dedup cost exactly ONE hash-shuffle of (key, id) pairs —
document text never moves; cluster dedup adds the bucketed pair
generation + the iterative components closure (see
``llm.components``).  The exact/near survivor rule uses
min-over-window rather than ``dropDuplicates`` so the kept row is
deterministic under any partitioning (dropDuplicates keeps an
arbitrary first row).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.config import EngineConfig
from sample_keyspaces_cdc_streams_connectors_spark.functions.text import (
    bpe_token_estimate,
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count,
)
from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup import with_minhash_signature

#: config key prefix (reference-style dotted paths, env-overridable)
_P = "keyspaces-cdc-streams.corpus"



def _repetition_overrides(cfg: EngineConfig) -> dict[str, float]:
    """Parse the per-mille repetition threshold overrides (shared by
    the batch pipeline and the streaming curation subset so both
    apply IDENTICAL bounds for the same config)."""
    from sample_keyspaces_cdc_streams_connectors_spark.functions.repetition import GOPHER_DEFAULTS

    overrides: dict[str, float] = {}
    for stat, (direction, _) in GOPHER_DEFAULTS.items():
        permille = cfg.get_int(
            f"{_P}.repetition-{direction}-permille.{stat}", default=-1
        )
        if permille >= 0:
            overrides[stat] = permille / 1000.0
    return overrides


def annotate_corpus(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the standard curation columns.

    r14: the token and stopword counts stage ONCE in a lower
    projection — the single-projection form re-evaluated the token
    split 4× (n_tokens, lang guard + ratio, quality) and the stopword
    regex 2× per row (guide §4.4 duplicate-evaluation class; the same
    fix the text_analysis gate got).  Staged aliases are referenced
    >1× and are non-cheap, so CollapseProject keeps the two
    projections separate; the substituted expressions are identical,
    batch≡stream untouched (map-only either way).

    r15: the projection composes as SQL TEXT (the functions.text
    ``*_sql`` twins the text_analysis gate already runs through the
    oracle) — the Column-tree form cost ~0.2 s of py4j round trips
    per pipeline construction, and the bench's corpus loop builds the
    pipeline EVERY pass (guide §1.2 driver work; same idiom as the
    r14 wave-1 builders).  Expressions are token-identical; rows are
    pinned byte-identical against the Column form in
    tests/test_corpus_pipeline.py."""
    annotate_cols = ("n_tokens", "n_bpe_est", "lang", "quality")
    if any(c in df.columns for c in annotate_cols + ("__ntok", "__nstop")):
        # re-annotation replaces in place (withColumns semantics) —
        # rare; keep the Column form for it, selectExpr("*", ...)
        # would duplicate the columns instead
        from sample_keyspaces_cdc_streams_connectors_spark.functions.text import stopword_count

        t = F.col(text_col)
        staged = df.withColumns(
            {"__ntok": token_count(t), "__nstop": stopword_count(t)}
        )
        n, stops = F.col("__ntok"), F.col("__nstop")
        return staged.withColumns(
            {
                "n_tokens": n,
                "n_bpe_est": bpe_token_estimate(t),
                "lang": lang_id(t, n=n, stops=stops),
                "quality": quality_score(t, n=n, stops=stops),
            }
        ).drop("__ntok", "__nstop")
    from sample_keyspaces_cdc_streams_connectors_spark.functions.text import (
        bpe_token_estimate_sql,
        lang_id_sql,
        quality_score_sql,
        stopword_count_sql,
        token_count_sql,
    )

    t = "`" + text_col.replace("`", "``") + "`"
    staged = df.selectExpr(
        "*",
        f"{token_count_sql(t)} AS __ntok",
        f"{stopword_count_sql(t)} AS __nstop",
    )
    return staged.selectExpr(
        "*",
        "__ntok AS n_tokens",
        f"{bpe_token_estimate_sql(t)} AS n_bpe_est",
        f"{lang_id_sql(t, n='__ntok', stops='__nstop')} AS lang",
        f"{quality_score_sql(t, n='__ntok', stops='__nstop')} AS quality",
    ).drop("__ntok", "__nstop")


def keep_first_per(df: DataFrame, key_col: str, id_col: str = "doc_id") -> DataFrame:
    """Deterministic survivor: the lowest id in each key group (one
    hash-shuffle; text columns ride along but do not widen the
    shuffle key)."""
    w = Window.partitionBy(key_col).orderBy(id_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def build_corpus_pipeline(
    cfg: EngineConfig,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Callable[[DataFrame], DataFrame]:
    """EngineConfig -> corpus transform.

    Keys (all under ``keyspaces-cdc-streams.corpus.``, env-overridable
    like every engine key):

    - ``languages``    csv of lang ids to keep (empty = keep all)
    - ``langid-model-path``  persisted trained language-ID model
      (``llm.langid``, r8): replaces the heuristic ``lang`` column
      with multiclass softmax predictions (+``lang_conf``) BEFORE the
      language filter — map-only Arrow scoring, stream-safe (also
      accepted by :func:`build_streaming_curation`)
    - ``min-quality``  int per-mille threshold (default 0 = keep all)
    - ``extract-media-text``  true|false (r14) — recover tag text
      (titles/artists/comments) and subtitle-cue transcripts from the
      binary ``media-column`` payloads as DERIVED documents
      (``media_text_src`` = ``tags``|``cues``; originals carry NULL)
      that flow through every later cleaning stage.  One mapInPandas
      pass, zero shuffles, stream-safe (``llm.media_text``)
    - ``media-column``  binary column holding each doc's media payload
      (default ``media``; used by ``extract-media-text``)
    - ``scrub-pii``    true|false — redact emails/phones/IPs/SSNs/cards
      BEFORE annotation (quality is scored on the scrubbed text, and
      redaction counts ride along as ``n_email`` etc.)
    - ``remove-repeated-spans``  true|false — drop every ``span-k``-token
      window occurring in >= ``span-min-docs`` distinct docs (exact
      substring boilerplate, Lee et al. ACL'22 EXACTSUBSTR recipe;
      ``llm.spans``).  ``span-count-mode`` = ``docs`` (default,
      distinct-document frequency) | ``occurrences`` (total
      occurrence counting — the paper's exact criterion; r8).  Runs BEFORE annotation so quality/token counts
      reflect the scrubbed text; ``n_removed_tokens`` /
      ``n_flagged_spans`` ride along.  Batch-only (corpus-wide window
      frequencies)
    - ``dedup``        none | exact | near | cluster | semantic | url
      (default none; ``url`` keeps one doc per canonical URL —
      :func:`~sample_keyspaces_cdc_streams_connectors_spark.functions.urls.normalize_url` over ``url-column`` — and runs
      FIRST, before any text stage, because tracking-param variants
      are the cheapest duplicate class to collapse)
    - ``url-column``   column holding each doc's URL; required by
      ``dedup = url`` and ``blocked-hosts-path``
    - ``blocked-hosts-path``  parquet of blocked hosts (``host``
      column); rows whose URL host is a blocked host or any
      subdomain of one are dropped before everything else
      (:func:`~sample_keyspaces_cdc_streams_connectors_spark.functions.urls.filter_blocked_hosts`).  Batch-only
    - ``shingle-k``    shingle width for near/cluster dedup (default 3)
    - ``jaccard-threshold``  pair threshold for cluster dedup /1000
      (int per-mille, default 500 = 0.5)
    - ``cluster-method``  ngram | minhash — pair generator for cluster
      dedup (default ngram = exact inverted-index Jaccard; minhash =
      LSH-bucketed candidates, cheaper at scale, recall-pinned in
      tests/test_llm.py)
    - ``cluster-prefer``  column whose HIGHEST value picks each
      cluster's survivor (e.g. ``quality`` — annotation runs before
      dedup so the score exists); empty (default) keeps the min-id
    - ``semantic-eps-permille``  SemDeDup cosine threshold /1000 for
      ``dedup = semantic`` (int per-mille, default 950 = 0.95)
    - ``semantic-clusters`` / ``semantic-dims``  k-means cluster count
      (default 16, clamped to the batch size) and hash-embedder width
      (default 64) for ``dedup = semantic``
    - ``repetition-filter``  true|false — drop boilerplate docs by the
      Gopher repetition rules (duplicate-line/paragraph and top-n-gram
      character fractions; ``functions.repetition.GOPHER_DEFAULTS``
      bounds).  Runs AFTER the quality gate, BEFORE decontamination —
      a pure projection + filter, no shuffle
    - ``repetition-max-permille.<stat>`` / ``repetition-min-permille.<stat>``
      int per-mille override for one stat's bound (e.g.
      ``repetition-max-permille.dup_line_frac: 500`` allows up to 50%
      duplicated lines); the min/max direction must match the stat's
      GOPHER_DEFAULTS direction
    - ``quality-model-path``  saved ``llm.quality_model`` layout; when
      set, docs are scored with the learned classifier (map-only
      Arrow margin pass) and rows below
      ``quality-model-min-permille`` (default 500 = P(good) ≥ 0.5)
      are dropped; the ``model_quality`` score rides along
    - ``lm-model-path``  saved ``llm.ngram_lm`` layout (Stupid-Backoff
      n-gram LM trained on a trusted corpus); when set, docs are
      scored map-only and rows above ``lm-max-perplexity`` (default
      10000) are dropped — the CCNet-style fluency gate; the
      ``lm_ppl`` column rides along (NULL-text rows drop: no tokens,
      no fluency evidence)
    - ``decontaminate-path``  parquet of eval/benchmark docs (needs a
      ``text`` column); corpus rows sharing >=
      ``decontaminate-min-collisions`` (default 1) normalized
      ``decontaminate-k``-grams (default 8) with ANY eval doc are
      dropped BEFORE dedup (so survivor selection never keeps a
      contaminated doc)
    - ``observe``  true|false — attach a zero-cost row counter
      (``DataFrame.observe``/CollectMetrics) to the input, every
      row-changing stage, and the output; after the caller executes
      an action, per-stage counts are readable from
      ``run.last_observations`` (stage name → ``Observation``)
    - ``max-docs-per-group``  int (default 0 = off) — after dedup,
      keep at most this many docs per ``group-column`` (default
      ``source``), ranked by ``cap-order-column`` descending (empty =
      lowest ids win): the per-domain quota that stops one
      over-crawled site dominating the mixture
      (:func:`cap_per_group`, skew-safe two-phase).  Batch-only
    - ``max-docs-per-domain``  int (default 0 = off, r8) — the same
      quota keyed by the REGISTERED DOMAIN of ``url-column``
      (:func:`~sample_keyspaces_cdc_streams_connectors_spark.functions.urls.registered_domain` computed on the
      fly — no precomputed domain column needed); docs without a
      usable URL are exempt (per-doc sentinel domains).  Requires
      ``url-column``; batch-only
    - ``dedup-index-path`` / ``dedup-index-mode`` (exact|minhash,
      default exact) — suppress docs already present in a persisted
      cross-corpus fingerprint index (``llm.dedup_index``) BEFORE
      within-batch dedup: the incremental-ingestion mode, where the
      batch is deduped against the standing corpus without re-reading
      it
    - ``semantic-index-path`` — the PARAPHRASE-level analog (late
      r5): suppress docs with a cosine>eps neighbor in a persisted
      semantic index (``llm.semdedup.write_semantic_index``);
      threshold/dims shared with ``dedup = semantic``
      (``semantic-eps-permille`` / ``semantic-dims``).  Stream-safe —
      also accepted by :func:`build_streaming_curation`.  An index
      written with ``int8=True`` (r8) is auto-detected from the
      member schema: same key, ~4× narrower probe scans
    - ``split-permille`` (r7) — csv of ``<label>:<int per-mille>``
      entries summing to 1000 (e.g. ``train:980,val:10,test:10``);
      when set, the FINAL stage labels every surviving row with a
      ``split`` column via :func:`assign_split` (deterministic
      md5-ticket thresholds, salt ``split-salt``, default "split") —
      map-only, stream-safe, labels identical between the batch and
      streaming pipelines

    ``near`` keeps one doc per identical MinHash signature (a narrow,
    stream-safe approximation); ``cluster`` runs the full exact-Jaccard
    pair generation and closes pairs into components, keeping the
    min-id survivor per cluster — transitive ((a,b)+(b,c) drops both b
    AND c), the batch-corpus gold standard.
    """
    languages = cfg.get_list(f"{_P}.languages", default=[]) or []
    min_quality = cfg.get_int(f"{_P}.min-quality", default=0)
    scrub = (cfg.get(f"{_P}.scrub-pii", "false") or "false").lower() == "true"
    spans = cfg.get_bool(f"{_P}.remove-repeated-spans", default=False)
    span_k = cfg.get_int(f"{_P}.span-k", default=10)
    span_min_docs = cfg.get_int(f"{_P}.span-min-docs", default=2)
    span_count_mode = (
        cfg.get(f"{_P}.span-count-mode", "docs") or "docs"
    ).lower()
    if span_count_mode not in ("docs", "occurrences"):
        from sample_keyspaces_cdc_streams_connectors_spark.config import ConfigError

        raise ConfigError(
            "corpus.span-count-mode must be docs|occurrences, "
            f"got {span_count_mode!r}"
        )
    dedup_mode = (cfg.get(f"{_P}.dedup", "none") or "none").lower()
    shingle_k = cfg.get_int(f"{_P}.shingle-k", default=3)
    jaccard_permille = cfg.get_int(f"{_P}.jaccard-threshold", default=500)
    cluster_method = (
        cfg.get(f"{_P}.cluster-method", "ngram") or "ngram"
    ).lower()
    cluster_prefer = cfg.get(f"{_P}.cluster-prefer", None) or None
    repetition = cfg.get_bool(f"{_P}.repetition-filter", default=False)
    repetition_overrides = _repetition_overrides(cfg) if repetition else {}
    langid_model_path = cfg.get(f"{_P}.langid-model-path", None)
    quality_model_path = cfg.get(f"{_P}.quality-model-path", None)
    quality_model_min = cfg.get_int(
        f"{_P}.quality-model-min-permille", default=500
    )
    lm_model_path = cfg.get(f"{_P}.lm-model-path", None)
    lm_max_ppl = cfg.get_int(f"{_P}.lm-max-perplexity", default=10_000)
    decontaminate_path = cfg.get(f"{_P}.decontaminate-path", None)
    decontaminate_k = cfg.get_int(f"{_P}.decontaminate-k", default=8)
    decontaminate_min = cfg.get_int(
        f"{_P}.decontaminate-min-collisions", default=1
    )
    max_per_group = cfg.get_int(f"{_P}.max-docs-per-group", default=0)
    group_column = cfg.get(f"{_P}.group-column", "source") or "source"
    max_per_domain = cfg.get_int(f"{_P}.max-docs-per-domain", default=0)
    cap_order = cfg.get(f"{_P}.cap-order-column", None) or None
    dedup_index_path = cfg.get(f"{_P}.dedup-index-path", None)
    dedup_index_mode = (
        cfg.get(f"{_P}.dedup-index-mode", "exact") or "exact"
    ).lower()
    if dedup_index_path and dedup_index_mode not in ("exact", "minhash"):
        from sample_keyspaces_cdc_streams_connectors_spark.config import ConfigError

        raise ConfigError(
            "corpus.dedup-index-mode must be exact|minhash, "
            f"got {dedup_index_mode!r}"
        )
    semantic_eps_permille = cfg.get_int(
        f"{_P}.semantic-eps-permille", default=950
    )
    semantic_clusters = cfg.get_int(f"{_P}.semantic-clusters", default=16)
    semantic_dims = cfg.get_int(f"{_P}.semantic-dims", default=64)
    semantic_index_path = cfg.get(f"{_P}.semantic-index-path", None)
    url_column = cfg.get(f"{_P}.url-column", None) or None
    blocked_hosts_path = cfg.get(f"{_P}.blocked-hosts-path", None)
    if dedup_mode not in ("none", "exact", "near", "cluster", "semantic", "url"):
        from sample_keyspaces_cdc_streams_connectors_spark.config import ConfigError

        raise ConfigError(
            "corpus.dedup must be none|exact|near|cluster|semantic|url, "
            f"got {dedup_mode!r}"
        )
    if dedup_mode == "url" and not url_column:
        from sample_keyspaces_cdc_streams_connectors_spark.config import ConfigError

        raise ConfigError("corpus.dedup = url requires corpus.url-column")
    if blocked_hosts_path and not url_column:
        from sample_keyspaces_cdc_streams_connectors_spark.config import ConfigError

        raise ConfigError(
            "corpus.blocked-hosts-path requires corpus.url-column"
        )
    if max_per_domain > 0 and not url_column:
        from sample_keyspaces_cdc_streams_connectors_spark.config import ConfigError

        raise ConfigError(
            "corpus.max-docs-per-domain requires corpus.url-column"
        )
    if cluster_method not in ("ngram", "minhash"):
        from sample_keyspaces_cdc_streams_connectors_spark.config import ConfigError

        raise ConfigError(
            "corpus.cluster-method must be ngram|minhash, "
            f"got {cluster_method!r}"
        )

    observe = cfg.get_bool(f"{_P}.observe", default=False)
    split_fracs = _split_fractions(cfg)
    split_salt = cfg.get(f"{_P}.split-salt", "split") or "split"
    media_text = cfg.get_bool(f"{_P}.extract-media-text", default=False)
    media_column = cfg.get(f"{_P}.media-column", "media") or "media"

    def run(df: DataFrame) -> DataFrame:
        observations: dict[str, "Observation"] = {}
        run.last_observations = observations

        def tap(frame: DataFrame, stage: str) -> DataFrame:
            """Attach a zero-cost row counter (CollectMetrics rides
            the existing pass; no extra job).  Counters populate when
            the caller executes an action over the result."""
            if not observe:
                return frame
            from pyspark.sql import Observation

            obs = Observation()
            observations[stage] = obs
            return frame.observe(obs, F.count(F.lit(1)).alias("rows"))

        out = tap(df, "input")
        if url_column and blocked_hosts_path:
            from sample_keyspaces_cdc_streams_connectors_spark.functions.urls import filter_blocked_hosts

            blocked = out.sparkSession.read.parquet(blocked_hosts_path)
            out = tap(
                filter_blocked_hosts(out, url_column, blocked),
                "blocked-hosts",
            )
        if dedup_mode == "url":
            # URL-level dedup FIRST — it is the cheapest duplicate
            # class (same page, tracking-param variants) and shrinks
            # everything downstream; canonical form via normalize_url.
            # Rows WITHOUT a usable URL (NULL, or a string with no
            # scheme://host) are exempt: their key coalesces to a
            # per-doc sentinel (\x00 cannot occur in a normalized
            # URL), otherwise every missing-URL doc would collapse to
            # one survivor (r8 fix).
            from sample_keyspaces_cdc_streams_connectors_spark.functions.urls import normalize_url, url_host

            u = F.col(url_column)
            key = F.when(
                u.isNull() | (url_host(u) == ""),
                F.concat(F.lit("\x00doc:"), F.col(id_col).cast("string")),
            ).otherwise(normalize_url(u))
            out = out.withColumn("__key", key)
            out = tap(
                keep_first_per(out, "__key", id_col).drop("__key"),
                "url-dedup",
            )
        if media_text:
            # media-text recovery (r14): derive tag/cue text documents
            # from media payloads so titles and captions flow through
            # the SAME cleaning chain as crawled text.  AFTER url-dedup
            # (derived rows copy the parent URL and would collapse
            # into their parent), BEFORE scrub/annotate (recovered
            # text is scrubbed, scored, and deduped like any other)
            from sample_keyspaces_cdc_streams_connectors_spark.llm.media_text import extract_media_text

            out = tap(
                extract_media_text(
                    out,
                    media_col=media_column,
                    text_col=text_col,
                    id_col=id_col,
                ),
                "media-text",
            )
        if scrub:
            from sample_keyspaces_cdc_streams_connectors_spark.functions.pii import with_pii_scrubbed

            out = with_pii_scrubbed(out, text_col=text_col)
        if spans:
            from sample_keyspaces_cdc_streams_connectors_spark.llm.spans import remove_repeated_spans

            out = remove_repeated_spans(
                out,
                text_col=text_col,
                k=span_k,
                min_docs=span_min_docs,
                count_mode=span_count_mode,
                id_col=id_col,
            )
        out = annotate_corpus(out, text_col)
        if langid_model_path:
            # trained multiclass language-ID (r8): overwrite the
            # heuristic ``lang`` with model predictions (+``lang_conf``)
            # BEFORE the language filter — map-only Arrow scoring
            from sample_keyspaces_cdc_streams_connectors_spark.llm.langid import load_langid_model, score_langid

            lm_model = load_langid_model(
                out.sparkSession, langid_model_path
            )
            out = score_langid(out, lm_model, text_col=text_col)
        if languages:
            out = tap(out.filter(F.col("lang").isin(languages)), "language")
        if min_quality > 0:
            out = tap(out.filter(F.col("quality") >= min_quality), "quality")
        if repetition:
            from sample_keyspaces_cdc_streams_connectors_spark.functions.repetition import repetition_filter

            out = tap(
                repetition_filter(
                    out, text_col=text_col, thresholds=repetition_overrides
                ),
                "repetition",
            )
        if quality_model_path:
            from sample_keyspaces_cdc_streams_connectors_spark.llm.quality_model import (
                load_quality_model,
                score_quality,
            )

            qm = load_quality_model(out.sparkSession, quality_model_path)
            out = tap(
                score_quality(out, qm, text_col=text_col).filter(
                    F.col("model_quality") >= quality_model_min / 1000.0
                ),
                "quality-model",
            )
        if lm_model_path:
            from sample_keyspaces_cdc_streams_connectors_spark.llm.ngram_lm import (
                lm_perplexity,
                load_ngram_lm,
            )

            lm = load_ngram_lm(out.sparkSession, lm_model_path)
            out = tap(
                out.withColumn(
                    "lm_ppl", lm_perplexity(F.col(text_col), lm)
                ).filter(
                    F.col("lm_ppl").isNotNull()
                    & (F.col("lm_ppl") <= float(lm_max_ppl))
                ),
                "lm-perplexity",
            )
        if decontaminate_path:
            from sample_keyspaces_cdc_streams_connectors_spark.llm.decontaminate import decontaminate

            eval_docs = out.sparkSession.read.parquet(decontaminate_path)
            out = tap(
                decontaminate(
                    out,
                    eval_docs,
                    text_col=text_col,
                    k=decontaminate_k,
                    min_collisions=decontaminate_min,
                    id_col=id_col,
                ),
                "decontaminate",
            )
        if dedup_index_path:
            from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup_index import dedup_against_index

            out = tap(
                dedup_against_index(
                    out,
                    dedup_index_path,
                    mode=dedup_index_mode,
                    text_col=text_col,
                    id_col=id_col,
                    shingle_k=shingle_k,
                ),
                "dedup-index",
            )
        if semantic_index_path:
            out = tap(
                _semantic_index_stage(
                    out,
                    semantic_index_path,
                    eps=semantic_eps_permille / 1000.0,
                    dims=semantic_dims,
                    text_col=text_col,
                    id_col=id_col,
                ),
                "semantic-index",
            )
        if dedup_mode == "exact":
            out = out.withColumn("__key", doc_fingerprint(F.col(text_col)))
            out = keep_first_per(out, "__key", id_col).drop("__key")
        elif dedup_mode == "near":
            out = with_minhash_signature(
                out, text_col=text_col, k=shingle_k, sig_col="__key"
            )
            out = keep_first_per(out, "__key", id_col).drop("__key")
        elif dedup_mode == "cluster":
            from sample_keyspaces_cdc_streams_connectors_spark.llm.components import dedup_survivors
            from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup import (
                minhash_candidate_pairs,
                ngram_jaccard_pairs,
            )

            docs_kv = out.select(
                F.col(id_col).alias("doc_id"), F.col(text_col)
            )
            # DEDUP-LADDER ENFORCEMENT: exact-collapse BEFORE candidate
            # generation.  Candidate volume is Σ C(df, 2) over posting
            # lists / band buckets — QUADRATIC in the corpus's
            # duplication factor (the sf1 stress run measured 27×
            # candidates at 10× data on a 10-way-duplicated corpus).
            # Collapsing byte-identical texts to one representative
            # first removes exactly that mass.  For any doc long
            # enough to shingle, the result is identical: exact
            # duplicates are Jaccard-1 cliques (>= any threshold), so
            # wiring each member to its group's representative by a
            # star edge preserves every connected component the full
            # pair set would produce — survivor selection (including
            # ``prefer``) sees the same components.  ONE deliberate
            # improvement over pure candidate generation: exact
            # duplicates SHORTER than shingle_k tokens produce no
            # shingles, so the pre-ladder pipeline paired nothing and
            # kept every copy — the star edge now collapses those
            # too (fixture-pinned in tests/test_corpus_pipeline.py).
            # Cost: ONE fingerprint window shuffle, the same price as
            # dedup_mode="exact".
            fpd = docs_kv.withColumn(
                "__fp", doc_fingerprint(F.col(text_col))
            ).withColumn(
                "__rep",
                F.min("doc_id").over(Window.partitionBy("__fp")),
            )
            reps = fpd.filter(F.col("doc_id") == F.col("__rep")).select(
                "doc_id", text_col
            )
            star_edges = fpd.filter(
                F.col("doc_id") != F.col("__rep")
            ).select(
                F.col("__rep").alias("doc_a"),
                F.col("doc_id").alias("doc_b"),
                F.lit(1.0).alias("jaccard"),
            )
            if cluster_method == "minhash":
                rep_pairs = minhash_candidate_pairs(
                    reps,
                    text_col=text_col,
                    k=shingle_k,
                    jaccard_threshold=jaccard_permille / 1000.0,
                )
            else:
                rep_pairs = ngram_jaccard_pairs(
                    reps,
                    text_col=text_col,
                    k=shingle_k,
                    threshold=jaccard_permille / 1000.0,
                )
            pairs = rep_pairs.unionByName(star_edges)
            out = dedup_survivors(
                out, pairs, id_col=id_col, prefer=cluster_prefer
            )
        elif dedup_mode == "semantic":
            # SemDeDup over the deterministic hash embedder (swap in a
            # real encoder via llm.embedding.make_embedder): paraphrase-
            # level dedup that lexical fingerprints miss.  Only
            # (id, vector) enters the scoring pass; text rejoins by id.
            from sample_keyspaces_cdc_streams_connectors_spark.llm.embedding import hash_embed
            from sample_keyspaces_cdc_streams_connectors_spark.llm.semdedup import (
                semantic_dedup_annotate,
            )

            vecs = out.select(
                F.col(id_col).alias("vec_id"),
                hash_embed(F.col(text_col), dims=semantic_dims).alias(
                    "embedding"
                ),
            )
            # clamp k for tiny batches (streaming tails, test corpora):
            # limit(k).count() bounds the probe at k rows.  An EMPTY
            # input skips the stage entirely — kmeans_fit needs >= 1
            # vector, and every other dedup mode passes empty frames
            # through (r5 review finding)
            n_probe = vecs.limit(semantic_clusters).count()
            if n_probe > 0:
                keep = (
                    semantic_dedup_annotate(
                        vecs, k=min(semantic_clusters, n_probe)
                    )
                    .filter(
                        F.col("max_prior_sim")
                        <= semantic_eps_permille / 1000.0
                    )
                    .select(F.col("vec_id").alias(id_col))
                )
                out = out.join(keep, id_col, "inner")
        if max_per_group > 0:
            out = tap(
                cap_per_group(
                    out,
                    group_column,
                    max_per_group,
                    order_col=cap_order,
                    id_col=id_col,
                ),
                "group-cap",
            )
        if max_per_domain > 0:
            # per-registered-domain quota straight from the URL (r8):
            # the anti-over-crawl primitive — one site cannot dominate
            # the mixture however many subdomains/pages it has.  Docs
            # WITHOUT a usable URL get a per-doc sentinel domain (the
            # same exemption rule as dedup=url) so they are never
            # capped as one giant '' group.
            from sample_keyspaces_cdc_streams_connectors_spark.functions.urls import registered_domain

            u = F.col(url_column)
            dom = registered_domain(u)
            out = out.withColumn(
                "__domain",
                F.when(
                    u.isNull() | (dom == ""),
                    F.concat(
                        F.lit("\x00doc:"), F.col(id_col).cast("string")
                    ),
                ).otherwise(dom),
            )
            out = tap(
                cap_per_group(
                    out,
                    "__domain",
                    max_per_domain,
                    order_col=cap_order,
                    id_col=id_col,
                ).drop("__domain"),
                "domain-cap",
            )
        if split_fracs:
            # final stage: the n-way train/val/test label (map-only,
            # never row-changing, so no tap of its own)
            out = assign_split(
                out, split_fracs, id_col=id_col, salt=split_salt
            )
        return tap(out, "output")

    return run


def _split_fractions(cfg: EngineConfig) -> dict[str, float] | None:
    """Parse ``corpus.split-permille`` ("train:980,val:10,test:10")
    into :func:`assign_split` fractions; None when unset.  Validation
    (labels non-empty, per-mille ints summing to 1000) raises
    ``ConfigError`` at build time, not mid-job."""
    raw = cfg.get_list(f"{_P}.split-permille", default=[]) or []
    if not raw:
        return None
    from sample_keyspaces_cdc_streams_connectors_spark.config import ConfigError

    fracs: dict[str, float] = {}
    for item in raw:
        name, _, permille = item.partition(":")
        name = name.strip()
        try:
            pm = int(permille.strip())
        except ValueError:
            raise ConfigError(
                f"corpus.split-permille entry {item!r} must be "
                "<label>:<int per-mille>"
            ) from None
        if not name or pm < 0:
            raise ConfigError(
                f"corpus.split-permille entry {item!r} must be "
                "<label>:<int per-mille>"
            )
        if name in fracs:
            raise ConfigError(
                f"corpus.split-permille label {name!r} repeated"
            )
        fracs[name] = pm / 1000.0
    total = sum(int(round(f * 1000)) for f in fracs.values())
    if total != 1000:
        raise ConfigError(
            f"corpus.split-permille must sum to 1000, got {total}"
        )
    return fracs


def _semantic_index_stage(
    out: DataFrame,
    path: str,
    eps: float,
    dims: int,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Cross-corpus SEMANTIC suppression (shared by the batch pipeline
    and the streaming curation chain): embed the text with the
    deterministic hash embedder (swap in a real encoder upstream by
    precomputing an embedding column and building the index from it),
    then drop rows with a cosine->eps neighbor in the standing
    semantic index — ``llm.semdedup.semantic_dedup_against_index``
    (map-only assignment + one cell-keyed stream-static left-anti
    join; stream-safe)."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.embedding import hash_embed
    from sample_keyspaces_cdc_streams_connectors_spark.llm.semdedup import semantic_dedup_against_index

    emb = out.withColumn(
        "__emb", hash_embed(F.col(text_col), dims=dims)
    )
    return semantic_dedup_against_index(
        emb, path, eps=eps, id_col=id_col, vec_col="__emb"
    ).drop("__emb")


def build_streaming_curation(
    cfg: EngineConfig,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Callable[[DataFrame], DataFrame]:
    """The STREAM-SAFE subset of the corpus pipeline, same config keys.

    Every filtering/annotation stage of :func:`build_corpus_pipeline`
    is a stateless map (scrub-pii, annotate, language, quality,
    repetition, quality-model, lm-perplexity), so the identical
    transforms apply to
    a ``readStream`` frame — micro-batch outputs equal the batch
    pipeline run on the same rows (equivalence pinned in
    tests/test_corpus_pipeline.py).  Cross-corpus suppression
    (``dedup-index-path``) joins the stream against the STATIC index
    as a stream-static left-anti join — stateless, no watermark
    needed; unlike the batch path it anti-joins full rows directly
    (micro-batches are small; the batch path's id-rejoin trick exists
    to keep text out of corpus-sized shuffles).
    ``decontaminate-path`` is stream-safe too: the eval-gram table
    collects ONCE at query-definition time into a broadcast sorted
    array and each row's collision count is a map-only Arrow
    membership probe (``llm.decontaminate.decontaminate_map_only``)
    — decision-identical to the batch join formulation.
    ``semantic-index-path`` (late r5) completes the streaming dedup
    ladder at the paraphrase level: map-only cell assignment against
    the broadcast codebook + ONE cell-keyed stream-static left-anti
    join against the persisted semantic index
    (``llm.semdedup.semantic_dedup_against_index``).

    ``blocked-hosts-path`` (r8) runs the SAME subdomain-aware host
    blocklist as the batch pipeline: ``filter_blocked_hosts`` is a
    handful of stream-static broadcast anti-joins on computed suffix
    keys — stateless, watermark-free, batch≡stream pinned in
    tests/test_urls.py.

    Batch-only keys raise ``ConfigError``: within-batch ``dedup``
    modes including ``url`` (global aggregation state — use
    ``streaming.dedup.streaming_near_dedup`` with a watermark for the
    streaming analog), ``remove-repeated-spans`` (corpus-wide window
    frequencies), and ``observe`` (batch Observation semantics).
    """
    from sample_keyspaces_cdc_streams_connectors_spark.config import ConfigError

    unsupported = {
        "dedup": (cfg.get(f"{_P}.dedup", "none") or "none").lower() != "none",
        "remove-repeated-spans": cfg.get_bool(
            f"{_P}.remove-repeated-spans", default=False
        ),
        "max-docs-per-group": cfg.get_int(
            f"{_P}.max-docs-per-group", default=0
        )
        > 0,
        "max-docs-per-domain": cfg.get_int(
            f"{_P}.max-docs-per-domain", default=0
        )
        > 0,
        "observe": cfg.get_bool(f"{_P}.observe", default=False),
    }
    bad = sorted(k for k, v in unsupported.items() if v)
    if bad:
        raise ConfigError(
            f"corpus keys not stream-safe: {bad}; use the batch "
            "pipeline or streaming.dedup for these stages"
        )

    languages = cfg.get_list(f"{_P}.languages", default=[]) or []
    min_quality = cfg.get_int(f"{_P}.min-quality", default=0)
    scrub = (cfg.get(f"{_P}.scrub-pii", "false") or "false").lower() == "true"
    repetition = cfg.get_bool(f"{_P}.repetition-filter", default=False)
    repetition_overrides = _repetition_overrides(cfg) if repetition else {}
    langid_model_path = cfg.get(f"{_P}.langid-model-path", None)
    quality_model_path = cfg.get(f"{_P}.quality-model-path", None)
    quality_model_min = cfg.get_int(
        f"{_P}.quality-model-min-permille", default=500
    )
    lm_model_path = cfg.get(f"{_P}.lm-model-path", None)
    lm_max_ppl = cfg.get_int(f"{_P}.lm-max-perplexity", default=10_000)
    decontaminate_path = cfg.get(f"{_P}.decontaminate-path", None)
    decontaminate_k = cfg.get_int(f"{_P}.decontaminate-k", default=8)
    decontaminate_min = cfg.get_int(
        f"{_P}.decontaminate-min-collisions", default=1
    )
    dedup_index_path = cfg.get(f"{_P}.dedup-index-path", None)
    dedup_index_mode = (
        cfg.get(f"{_P}.dedup-index-mode", "exact") or "exact"
    ).lower()
    shingle_k = cfg.get_int(f"{_P}.shingle-k", default=3)
    url_column = cfg.get(f"{_P}.url-column", None) or None
    blocked_hosts_path = cfg.get(f"{_P}.blocked-hosts-path", None)
    if blocked_hosts_path and not url_column:
        raise ConfigError(
            "corpus.blocked-hosts-path requires corpus.url-column"
        )
    semantic_index_path = cfg.get(f"{_P}.semantic-index-path", None)
    semantic_eps_permille = cfg.get_int(
        f"{_P}.semantic-eps-permille", default=950
    )
    semantic_dims = cfg.get_int(f"{_P}.semantic-dims", default=64)
    split_fracs = _split_fractions(cfg)
    split_salt = cfg.get(f"{_P}.split-salt", "split") or "split"
    media_text = cfg.get_bool(f"{_P}.extract-media-text", default=False)
    media_column = cfg.get(f"{_P}.media-column", "media") or "media"

    def run(stream: DataFrame) -> DataFrame:
        out = stream
        if url_column and blocked_hosts_path:
            from sample_keyspaces_cdc_streams_connectors_spark.functions.urls import filter_blocked_hosts

            blocked = out.sparkSession.read.parquet(blocked_hosts_path)
            out = filter_blocked_hosts(out, url_column, blocked)
        if media_text:
            # media-text recovery (r14): a stateless mapInPandas pass
            # (rows-out ≥ rows-in), so the stage is stream-safe
            # verbatim — identical derived rows to the batch pipeline
            from sample_keyspaces_cdc_streams_connectors_spark.llm.media_text import extract_media_text

            out = extract_media_text(
                out,
                media_col=media_column,
                text_col=text_col,
                id_col=id_col,
            )
        if scrub:
            from sample_keyspaces_cdc_streams_connectors_spark.functions.pii import with_pii_scrubbed

            out = with_pii_scrubbed(out, text_col=text_col)
        out = annotate_corpus(out, text_col)
        if langid_model_path:
            # stream-safe: the trained language-ID scorer is a
            # stateless map-only Arrow pass (r8) — identical lang
            # labels to the batch pipeline
            from sample_keyspaces_cdc_streams_connectors_spark.llm.langid import load_langid_model, score_langid

            lid = load_langid_model(out.sparkSession, langid_model_path)
            out = score_langid(out, lid, text_col=text_col)
        if languages:
            out = out.filter(F.col("lang").isin(languages))
        if min_quality > 0:
            out = out.filter(F.col("quality") >= min_quality)
        if repetition:
            from sample_keyspaces_cdc_streams_connectors_spark.functions.repetition import repetition_filter

            out = repetition_filter(
                out, text_col=text_col, thresholds=repetition_overrides
            )
        if quality_model_path:
            from sample_keyspaces_cdc_streams_connectors_spark.llm.quality_model import (
                load_quality_model,
                score_quality,
            )

            qm = load_quality_model(out.sparkSession, quality_model_path)
            out = score_quality(out, qm, text_col=text_col).filter(
                F.col("model_quality") >= quality_model_min / 1000.0
            )
        if lm_model_path:
            from sample_keyspaces_cdc_streams_connectors_spark.llm.ngram_lm import (
                lm_perplexity,
                load_ngram_lm,
            )

            lm = load_ngram_lm(out.sparkSession, lm_model_path)
            out = out.withColumn(
                "lm_ppl", lm_perplexity(F.col(text_col), lm)
            ).filter(
                F.col("lm_ppl").isNotNull()
                & (F.col("lm_ppl") <= float(lm_max_ppl))
            )
        if decontaminate_path:
            from sample_keyspaces_cdc_streams_connectors_spark.llm.decontaminate import (
                decontaminate_map_only,
                eval_gram_table,
            )

            eval_docs = out.sparkSession.read.parquet(decontaminate_path)
            grams = eval_gram_table(
                eval_docs, text_col=text_col, k=decontaminate_k
            )
            out = decontaminate_map_only(
                out,
                grams,
                text_col=text_col,
                k=decontaminate_k,
                min_collisions=decontaminate_min,
            )
        if dedup_index_path:
            from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup_index import _check_mode, _with_key

            sub, _ = _check_mode(dedup_index_mode)
            index = out.sparkSession.read.parquet(
                f"{dedup_index_path}/{sub}"
            )
            keyed = _with_key(
                out, dedup_index_mode, text_col, shingle_k
            ).withColumn("bucket", F.substring("fp", 1, 2))
            out = keyed.join(
                index, ["bucket", "fp"], "left_anti"
            ).drop("bucket", "fp")
        if semantic_index_path:
            out = _semantic_index_stage(
                out,
                semantic_index_path,
                eps=semantic_eps_permille / 1000.0,
                dims=semantic_dims,
                text_col=text_col,
                id_col=id_col,
            )
        if split_fracs:
            # per-row pure function of (salt, id) — stream-safe by
            # construction, identical labels to the batch pipeline
            out = assign_split(
                out, split_fracs, id_col=id_col, salt=split_salt
            )
        return out

    return run


def corpus_stats(df: DataFrame) -> DataFrame:
    """One-row curation summary (docs, tokens, mean quality) — the
    numbers a data-mix report needs; decimal-exact sums emitted as
    BIGINT/DOUBLE."""
    return df.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("n_tokens").cast("bigint")).alias("total_tokens"),
        F.sum(F.col("n_bpe_est").cast("bigint")).alias("total_bpe_est"),
        F.avg(F.col("quality").cast("double")).alias("mean_quality"),
    )


# --- data mixing & sequence packing ---------------------------------------

def cap_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    order_col: str | None = None,
    id_col: str = "doc_id",
    n_salts: int = 16,
) -> DataFrame:
    """Keep at most ``n`` rows per group — the per-domain/per-source
    quota every curation recipe applies so one over-crawled site
    cannot dominate the mixture.

    Deterministic: the kept rows are the group's top-``n`` by
    ``order_col`` DESCENDING (ties, and the no-order-column case,
    break to the LOWEST id).  SKEW-SAFE in two phases, the same
    discipline as ``operators.skew.salted_agg``: phase 1 ranks within
    ``(group, salt)`` — a hot group's rows spread over ``n_salts``
    window partitions — and keeps each salt's local top-``n``; phase
    2 ranks the surviving ``<= n_salts*n`` rows per group and keeps
    the global top-``n``.  Every global top-``n`` row is a local
    top-``n`` row of its salt, so the two-phase result is EXACTLY the
    single-window result (pinned in tests), but no task ever holds
    more than a salt's share of a hot group.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    order = (
        [F.col(order_col).desc_nulls_last(), F.col(id_col).asc()]
        if order_col
        else [F.col(id_col).asc()]
    )
    salt = F.pmod(F.hash(F.col(id_col)), F.lit(n_salts)).cast("int")
    w1 = Window.partitionBy(F.col(group_col), salt).orderBy(*order)
    local = (
        df.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )
    w2 = Window.partitionBy(group_col).orderBy(*order)
    return (
        local.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


#: sampling resolution (1e-6 fraction granularity)
_SAMPLE_MOD = 1_000_000


def mixture_weights_temperature(
    counts: dict[str, int],
    tau: float = 0.7,
    target_total: int | None = None,
) -> dict[str, float]:
    """Per-source sampling FRACTIONS for :func:`sample_corpus_mixture`
    from raw per-source doc counts, via temperature-based mixing
    (the multilingual-pretraining rule, e.g. mC4/XLM-R: sample source
    ``s`` with probability ``p_s ∝ n_s^tau``).  ``tau < 1`` flattens
    the mixture — low-resource sources are UPsampled relative to
    their share, dominant sources capped; ``tau = 1`` is proportional
    (keep everything at the same rate); ``tau = 0`` is uniform per
    source.

    ``target_total`` is the desired output doc count (default: keep
    the fraction ceiling at the largest feasible total, i.e. scale
    until the binding source reaches fraction 1.0 — without
    replacement, a source cannot be sampled above itself).  Returned
    fractions are each clamped to [0, 1]; pair with
    ``sample_corpus_mixture({s: (df_s, frac_s)})``.

    Driver-side arithmetic over the (tiny) per-source count table —
    counts come from one groupBy the caller already ran."""
    if not counts:
        raise ValueError("counts must be non-empty")
    if any(n < 0 for n in counts.values()):
        raise ValueError(f"counts must be >= 0, got {counts}")
    if tau < 0:
        raise ValueError(f"tau must be >= 0, got {tau}")
    live = {s: n for s, n in counts.items() if n > 0}
    if not live:
        return {s: 0.0 for s in counts}
    weights = {s: float(n) ** tau for s, n in live.items()}
    wsum = sum(weights.values())
    probs = {s: w / wsum for s, w in weights.items()}
    if target_total is None:
        # largest total where every fraction stays <= 1: the binding
        # source is the one with the smallest n_s / p_s ratio
        target_total = min(live[s] / probs[s] for s in live)
    fracs = {
        s: min(1.0, max(0.0, target_total * probs[s] / live[s]))
        for s in live
    }
    for s in counts:
        fracs.setdefault(s, 0.0)
    return fracs


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided by a content hash of the id
    — NOT ``df.sample``: the decision per row is a pure function of
    (salt, id), so it is reproducible across runs, partitionings and
    engines (md5 is SQL-portable), and re-running a 100 TB pipeline
    resamples the identical subset.  Different salts give independent
    samples."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup import md5_int

    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    gate = F.lit(int(round(fraction * _SAMPLE_MOD)))
    ticket = md5_int(
        F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))
    ) % _SAMPLE_MOD
    return df.filter(ticket < gate)


def sample_corpus_mixture(
    sources: dict[str, tuple[DataFrame, float]],
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Weighted corpus mixture: per-source deterministic sampling at
    the given fraction, tagged with a ``source`` column and unioned —
    the data-mix recipe step of a training pipeline, with the same
    reproducibility guarantee as :func:`deterministic_sample`.

    Scale: sampling is a map-only filter per source (no shuffle);
    union is plan-level.  Sources must share a schema."""
    parts = []
    for name, (df, frac) in sorted(sources.items()):
        parts.append(
            deterministic_sample(
                df, frac, id_col=id_col, salt=f"{salt}:{name}"
            ).withColumn("source", F.lit(name))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def assign_split(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test (or any n-way) split: every row
    gets exactly one label from ``fractions`` (e.g. ``{"train": .98,
    "val": .01, "test": .01}``, must sum to 1 within resolution),
    decided by the same (salt, id) content-hash ticket as
    :func:`deterministic_sample` against CUMULATIVE thresholds — so
    the assignment is reproducible across runs, partitionings and
    engines, rows never migrate between splits when unrelated data
    is added, and the id hash is INDEPENDENT of any mixture-sampling
    salt (a sampled-then-split pipeline composes without correlation).

    Scale: map-only (one md5 + a CASE ladder per row, no shuffle).
    Labels are assigned in sorted-name order so the threshold ladder
    itself is deterministic."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup import md5_int

    if not fractions:
        raise ValueError("fractions must be non-empty")
    if any(f < 0 for f in fractions.values()):
        raise ValueError(f"fractions must be >= 0, got {fractions}")
    total = int(round(sum(fractions.values()) * _SAMPLE_MOD))
    if total != _SAMPLE_MOD:
        raise ValueError(
            f"fractions must sum to 1 (at 1e-6 resolution), got "
            f"{sum(fractions.values())}"
        )
    ticket = md5_int(
        F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))
    ) % _SAMPLE_MOD
    expr = None
    acc = 0
    names = sorted(fractions)
    for name in names[:-1]:
        acc += int(round(fractions[name] * _SAMPLE_MOD))
        expr = (
            F.when(ticket < acc, F.lit(name))
            if expr is None
            else expr.when(ticket < acc, F.lit(name))
        )
    expr = (
        F.lit(names[-1])
        if expr is None
        else expr.otherwise(F.lit(names[-1]))
    )
    return df.withColumn(split_col, expr)


def _token_weight(text_col: str, counter) -> "F.Column":
    """Resolve the packing/sharding stack's token counter (r8 —
    VERDICT r7 #6: packing by whitespace tokens misestimates sequence
    budgets by the tokenizer's fertility ratio at deploy):

    - ``None``   → the default whitespace :func:`token_count` over
      ``text_col`` (bit-identical to the pre-r8 behavior — pinned);
    - a Column   → used as the per-doc count directly (e.g. a
      precomputed ``n_bpe`` column);
    - a callable → ``counter(F.col(text_col))`` (e.g.
      ``lambda c: bpe_token_count(c, model)`` for trained-BPE
      budgets, ``llm.bpe``)."""
    from pyspark.sql import Column

    if counter is None:
        return token_count(F.col(text_col))
    if isinstance(counter, Column):
        return counter
    return counter(F.col(text_col))


def pack_sequences(
    docs: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 64,
    counter=None,
    strategy: str = "greedy",
) -> DataFrame:
    """Sequence packing: assign each document to a training sequence.
    Documents are distributed over ``n_shards`` deterministic shards
    and packed independently within each — the standard
    parallel-packing compromise (a single global ordering would
    serialize through one partition at scale).

    ``strategy``:

    - ``"greedy"`` (default) — id-ordered run-length cut via the
      message batcher: streaming-friendly (one window pass, no sort
      by size), bound contract ``max_tokens`` PLUS at most the
      largest member (a doc that straddles a boundary overflows its
      bin).  Output adds ``message_id`` (firstSeq-lastSeq).
    - ``"ffd"`` (r8) — first-fit-decreasing bin packing per shard
      (the classic 11/9·OPT+6/9 approximation): docs sort by
      (tokens desc, id), each drops into the FIRST bin it fits, so
      the ``max_tokens`` budget is STRICT — only a single doc larger
      than the budget gets (its own) oversized bin, flagged
      ``oversize = true``.  Tighter bins = less padding waste per
      training sequence; costs a per-shard Arrow pass
      (``applyInPandas`` over the bounded shard groups) instead of a
      pure-JVM window.  Deterministic on any partitioning (sort key
      is total within a shard).

    Output adds: ``pack_shard``, ``n_tokens`` (packing weight) and
    ``message_idx`` — the sequence id is (pack_shard, message_idx) —
    plus the strategy's extras above.  ``counter`` swaps the packing
    weight (see :func:`_token_weight` — whitespace default, column,
    or callable such as trained-BPE counts).

    Shard-size guideline (r9, quantified in SCALE.md): per-shard
    packing underfills bins near shard boundaries relative to one
    global FFD, and the gap is governed by BINS PER SHARD — keep
    ``n_docs / n_shards`` ≥ ~50 bins' worth of documents and the fill
    gap stays ≈1-2%; over-sharding a small corpus (a few bins per
    shard) costs tens of percent.  At production scale shards carry
    millions of documents, so the default 64 is safe; shrink
    ``n_shards`` for small corpora rather than the budget."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup import md5_int

    if strategy not in ("greedy", "ffd"):
        raise ValueError(f"strategy must be greedy|ffd, got {strategy!r}")
    with_shard = docs.withColumn(
        "pack_shard",
        (md5_int(F.col(id_col).cast("string")) % n_shards).cast("int"),
    ).withColumn("n_tokens", _token_weight(text_col, counter))
    if strategy == "greedy":
        from sample_keyspaces_cdc_streams_connectors_spark.operators.batching import assign_messages

        return assign_messages(
            with_shard,
            shard_col="pack_shard",
            seq_col=id_col,
            size_col=F.col("n_tokens").cast("bigint"),
            max_message_size=max_tokens,
            max_records=-1,
        )
    return _pack_ffd(with_shard, max_tokens, id_col=id_col)


def _pack_ffd(
    with_shard: DataFrame, max_tokens: int, id_col: str = "doc_id"
) -> DataFrame:
    """First-fit-decreasing within each ``pack_shard`` group: one
    Arrow ``applyInPandas`` pass emitting ``(id, message_idx,
    oversize)`` joined back to the input by id — the text never
    enters the packing group, so the grouped pass shuffles only
    ``(shard, id, n_tokens)``."""
    import pandas as pd
    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StructField,
        StructType,
    )

    id_field = with_shard.schema[id_col]
    out_schema = StructType(
        [
            StructField(id_col, id_field.dataType, id_field.nullable),
            StructField("message_idx", LongType(), False),
            StructField("oversize", BooleanType(), False),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", id_col], ascending=[False, True]
        )
        bins: list[int] = []  # remaining capacity per bin
        assign: list[int] = []
        oversize: list[bool] = []
        for w in pdf["n_tokens"].tolist():
            w = int(w)
            if w > max_tokens:
                # an indivisible doc over budget gets its own
                # (closed) bin — flagged, never shared
                bins.append(-1)
                assign.append(len(bins) - 1)
                oversize.append(True)
                continue
            for j, cap in enumerate(bins):
                if cap >= w:
                    bins[j] = cap - w
                    assign.append(j)
                    break
            else:
                bins.append(max_tokens - w)
                assign.append(len(bins) - 1)
            oversize.append(False)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].to_numpy(),
                "message_idx": assign,
                "oversize": oversize,
            }
        )

    packed = (
        with_shard.select("pack_shard", id_col, "n_tokens")
        .groupBy("pack_shard")
        .applyInPandas(pack, out_schema)
    )
    return with_shard.join(packed, id_col, "inner")


def shard_corpus(
    docs: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "epoch0",
    n_buckets: int = 256,
    persist: bool = False,
    counter=None,
) -> DataFrame:
    """Epoch shuffle + token-balanced shard assignment — the final
    stage before training: order the corpus by a salted content hash
    (the deterministic "shuffle" for this epoch; a new ``salt`` is a
    new epoch permutation) and cut the ordered token stream into
    ``n_shards`` contiguous, token-balanced shards.

    Output per document: ``epoch_pos`` (0-based position in the
    shuffled order), ``n_tokens``, and ``shard`` — computed as
    ``(tokens_before_this_doc * n_shards) div total_tokens``, so
    every shard's token sum is within one document of ``total/n``
    (property-pinned).  Everything is a pure function of
    (salt, id, text): re-running a 100 TB pipeline reproduces the
    identical sharding bit-for-bit on any partitioning.

    Scale: uses :func:`~sample_keyspaces_cdc_streams_connectors_spark.operators.prefixsum.with_order_stats`
    — two map-side-combined shuffles (one of ``n_buckets`` keys, one
    of the data bucketed 256 ways), never a single-partition global
    window.  Unlike :func:`pack_sequences` (independent hash shards,
    no global order) this yields the *contiguous-in-epoch-order*
    shards a sequential training loader consumes.

    ``persist=True`` caches the 3-column (id, hash, n_tokens)
    projection between the prefix-sum's two passes so the tokenize
    runs ONCE — use when the lineage above ``docs`` is expensive;
    release with
    :func:`~sample_keyspaces_cdc_streams_connectors_spark.operators.prefixsum.release_order_stats_cache`
    after materializing the result.

    ``counter`` swaps the balancing weight (see :func:`_token_weight`
    — whitespace default, column, or callable such as trained-BPE
    counts; the loader's budget should be counted in the tokens it
    actually trains on).
    """
    from sample_keyspaces_cdc_streams_connectors_spark.operators.prefixsum import with_order_stats

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    base = docs.select(
        F.col(id_col),
        F.md5(
            F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))
        ).alias("_h"),
        _token_weight(text_col, counter).cast("long").alias("n_tokens"),
    )
    scanned, _n_rows, total_tokens = with_order_stats(
        base,
        hash_col="_h",
        tiebreak_cols=[id_col],
        weight_col="n_tokens",
        n_buckets=n_buckets,
        pos_col="epoch_pos",
        cum_col="_cum",
        persist=persist,
    )
    if total_tokens <= 0:
        return scanned.drop("_h", "_cum").withColumn(
            "shard", F.lit(0).cast("int")
        )
    return scanned.withColumn(
        "shard",
        F.least(
            F.expr(f"(_cum * {n_shards}) div {total_tokens}"),
            F.lit(n_shards - 1),
        ).cast("int"),
    ).drop("_h", "_cum")


def pack_chunks(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "epoch0",
    n_buckets: int = 256,
    persist: bool = False,
    counter=None,
) -> DataFrame:
    """EXACT fixed-length sequence packing — the GPT-style
    concat-and-chunk: the epoch-shuffled corpus is one token stream,
    cut into consecutive windows of exactly ``seq_len`` tokens, and
    each document contributes its token spans to whichever windows it
    falls across (long docs SPLIT over window boundaries; short docs
    share a window with their neighbors — zero padding except the
    final partial window).

    This is the complement to :func:`pack_sequences` (whole-document
    greedy bins, no splitting, bounded overflow) — use that when
    document integrity matters, this when the training loader wants
    dense fixed-shape batches and boundary-crossing is handled by the
    attention mask.

    Output one row per (document, window) intersection:

    - ``chunk``      the global window index (0-based);
    - ``doc_start`` / ``doc_end``  the token span of THIS doc that
      lands in the window (0-based, end exclusive — loader-ready);
    - ``chunk_pos``  where the span begins inside the window;
    - ``n_tokens``   the doc's total token count (rides along).

    Deterministic on any partitioning: the epoch order and the token
    prefix sums come from
    :func:`~sample_keyspaces_cdc_streams_connectors_spark.operators.prefixsum.with_order_stats` under the salted
    content hash — the same "shuffle" :func:`shard_corpus` uses, so
    ``pack_chunks(salt=s)`` packs exactly the order ``shard_corpus``
    shards.  Scale: two map-side-combined shuffles (the prefix sum),
    then a map-only window-span explode — a doc of ``t`` tokens emits
    ``ceil`` spans proportional to ``t/seq_len``, so output volume
    equals corpus token volume / seq_len, never quadratic.  Docs with
    zero tokens yield no rows.  ``counter`` swaps the span weight
    (see :func:`_token_weight` — whitespace default, column, or
    callable such as trained-BPE counts; a fixed-shape loader budget
    only holds when spans are counted in the model's own tokens)."""
    from sample_keyspaces_cdc_streams_connectors_spark.operators.prefixsum import with_order_stats

    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    base = docs.select(
        F.col(id_col),
        F.md5(
            F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))
        ).alias("_h"),
        _token_weight(text_col, counter).cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    scanned, _n, _total = with_order_stats(
        base,
        hash_col="_h",
        tiebreak_cols=[id_col],
        weight_col="n_tokens",
        n_buckets=n_buckets,
        pos_col="_pos",
        cum_col="_cum",
        persist=persist,
    )
    first = F.expr(f"_cum div {seq_len}")
    last = F.expr(f"(_cum + n_tokens - 1) div {seq_len}")
    spans = scanned.withColumn(
        "chunk", F.explode(F.sequence(first, last))
    )
    cstart = F.col("chunk") * seq_len  # window's global token start
    return spans.select(
        F.col(id_col),
        "n_tokens",
        F.col("chunk").cast("long"),
        F.greatest(cstart - F.col("_cum"), F.lit(0))
        .cast("long")
        .alias("doc_start"),
        F.least(
            cstart + seq_len - F.col("_cum"), F.col("n_tokens")
        )
        .cast("long")
        .alias("doc_end"),
        F.greatest(F.col("_cum") - cstart, F.lit(0))
        .cast("long")
        .alias("chunk_pos"),
    )
