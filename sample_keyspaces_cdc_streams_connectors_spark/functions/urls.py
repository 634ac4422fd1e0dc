"""URL normalization + host/domain curation functions.

Web-scale corpus curation is keyed by URL long before it is keyed by
text: dedup-by-canonical-URL removes the cheapest duplicate class
(same page, different tracking params), per-registered-domain quotas
stop one site dominating the mixture (feed :func:`~sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline.cap_per_group`
with :func:`registered_domain`), and host blocklists drop known-bad
sources outright.  Everything here is pure JVM column expressions
(regexp + string ops inside whole-stage codegen) — zero shuffle, zero
Python, so the functions ride any scan at scan bandwidth.

Normalization contract (:func:`normalize_url`) — deliberately the
conservative, reversible-decision subset every public crawler agrees
on (scheme/host casefold, default ports, fragments, tracking params,
trailing slash); it does NOT resolve dot-segments or percent-decode,
which change semantics on hostile inputs.

``registered_domain`` is an eTLD+1 APPROXIMATION over a built-in list
of common two-level public suffixes (co.uk, com.au, ...) — the full
Public Suffix List is a dataset, not an algorithm, and is not bundled
in this environment; the column to swap in a PSL-backed UDF is
isolated here.  No reference counterpart (the reference has no web
corpus tooling).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "normalize_url",
    "url_host",
    "registered_domain",
    "filter_blocked_hosts",
]

#: common two-level public suffixes for the eTLD+1 approximation —
#: second-level labels that act as TLDs (registration happens one
#: level below them)
_TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp",
    "com.br", "com.cn", "com.mx", "com.tr", "com.ar",
    "co.in", "co.kr", "co.za", "co.nz",
)

#: tracking query params stripped by normalize_url (crawler-standard)
_TRACKING_PARAMS = r"utm_[a-z]+|fbclid|gclid|msclkid|mc_eid|igshid"


def url_host(url: Column | str) -> Column:
    """Lowercased host of a URL, without userinfo, port, or a
    leading ``www.`` — NULL-safe (non-URL strings yield '')."""
    u = url if isinstance(url, Column) else F.col(url)
    host = F.lower(
        F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1)
    )
    return F.regexp_replace(host, r"^www\.", "")


def registered_domain(
    url: Column | str | None = None, *, host: Column | None = None
) -> Column:
    """eTLD+1 approximation: the last two host labels, or the last
    THREE when the last two are a known two-level public suffix
    (``a.b.co.uk`` → ``b.co.uk``, ``a.b.example.com`` →
    ``example.com``).  Empty for IP hosts and non-URLs is NOT
    attempted — IPs pass through whole (a per-IP quota is the right
    behavior anyway).

    ``host=`` takes a pre-computed :func:`url_host` column instead of
    re-deriving it — callers that also project the host can stage it
    once in a lower Project (r14: the optimizer refuses to inline a
    non-cheap alias referenced many times, so the host's regexes run
    once per row instead of once per reference; guide §1.2 per-task
    work)."""
    if host is None:
        if url is None:
            raise ValueError("registered_domain needs url or host=")
        host = url_host(url)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(
        ".", F.element_at(parts, -2), F.element_at(parts, -1)
    )
    last3 = F.concat_ws(
        ".",
        F.element_at(parts, -3),
        F.element_at(parts, -2),
        F.element_at(parts, -1),
    )
    is_ip = host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    two_level = last2.isin(*_TWO_LEVEL_SUFFIXES)
    return (
        F.when(host == "", F.lit(""))
        .when(is_ip | (n <= 2), host)
        .when(two_level & (n >= 3), last3)
        .otherwise(last2)
    )


def normalize_url(url: Column | str) -> Column:
    """Canonical URL for URL-level dedup:

    - scheme and host lowercased (path/query case preserved — it is
      significant on most servers);
    - default ports dropped (``:80`` for http, ``:443`` for https);
    - fragment dropped;
    - tracking params dropped (``utm_*``, ``fbclid``, ``gclid``,
      ``msclkid``, ``mc_eid``, ``igshid``), the query's ``?``/``&``
      punctuation repaired, an emptied query dropped;
    - ONE trailing slash trimmed from a non-root path.

    Pure string surgery — no dot-segment resolution, no percent
    decoding (semantics-changing on hostile inputs)."""
    u = url if isinstance(url, Column) else F.col(url)
    scheme = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    authority = F.lower(
        F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    )
    rest = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", 1)
    # default ports
    authority = F.when(
        (scheme == "http"), F.regexp_replace(authority, r":80$", "")
    ).otherwise(authority)
    authority = F.when(
        (scheme == "https"), F.regexp_replace(authority, r":443$", "")
    ).otherwise(authority)
    # tracking params: remove `key=value` pairs, then repair separators
    rest = F.regexp_replace(
        rest, r"(?:(?<=[?&]))(?:" + _TRACKING_PARAMS + r")=[^&#]*&?", ""
    )
    rest = F.regexp_replace(rest, r"[?&]+$", "")  # emptied query tail
    rest = F.regexp_replace(rest, r"\?&", "?")  # leading orphan &
    # one trailing slash off a non-root path (query-free tails only)
    rest = F.regexp_replace(rest, r"^(/.+?)/$", "$1")
    norm = F.concat(scheme, F.lit("://"), authority, rest)
    return F.when(scheme == "", u).otherwise(norm)


def filter_blocked_hosts(
    df: DataFrame,
    url_col: str,
    blocked_hosts: DataFrame | list[str],
    host_col: str = "host",
) -> DataFrame:
    """Drop rows whose URL host is a blocked host OR any subdomain of
    one (``ads.example.com`` is blocked by ``example.com``).

    ``blocked_hosts`` is a DataFrame with ``host_col`` or a plain list
    for small literal blocklists; entries get the SAME normalization
    as :func:`url_host` applies to row hosts (lowercase, trim, leading
    ``www.`` stripped — so a hosts-file entry ``www.bad.com`` blocks
    ``bad.com`` and every subdomain, r8 fix).

    Matching is one equi-anti-join per distinct blocklist LABEL DEPTH
    (an entry with ``j`` labels matches exactly the row host's last-j
    suffix): the blocklist's depth set comes from one tiny static-side
    aggregate, then for each depth the row's suffix column anti-joins
    the depth's entries.  Real blocklists have ~2-4 depths, so this is
    a handful of broadcast hash anti-joins riding one stage — no
    explode, no ``distinct``, and (unlike a full-row self-anti-join)
    NULL-safe for every row column, type-safe for non-equatable
    columns (maps/arrays), and STREAM-SAFE (each join is stream-static
    left_anti on a computed key).  Rows whose URL parses to no host
    (NULL / non-URL strings) never match and always survive."""
    spark = df.sparkSession
    if isinstance(blocked_hosts, DataFrame):
        blocked = (
            blocked_hosts.select(
                F.regexp_replace(
                    F.lower(F.trim(F.col(host_col))), r"^www\.", ""
                ).alias("__blocked_host")
            )
            .filter(F.col("__blocked_host") != "")
            .distinct()
            .withColumn(
                "__depth", F.size(F.split("__blocked_host", r"\."))
            )
        )
        # the blocklist is always a static (batch) frame — one tiny
        # collect of its distinct label depths decides the join fan-out
        depths = sorted(
            r["__depth"]
            for r in blocked.select("__depth").distinct().collect()
        )
        by_depth = {
            j: blocked.filter(F.col("__depth") == j).select("__blocked_host")
            for j in depths
        }
    else:
        # literal blocklist: normalize + bucket by depth driver-side
        # (zero Spark jobs at build time)
        norm = {
            h.strip().lower().removeprefix("www.")
            for h in blocked_hosts
            if h and h.strip().lower().removeprefix("www.")
        }
        buckets: dict[int, list[str]] = {}
        for h in norm:
            buckets.setdefault(len(h.split(".")), []).append(h)
        if not buckets:
            return df
        # r14 optimization: a literal blocklist becomes a pure column
        # predicate (one INSET per depth) instead of one broadcast
        # anti-join per depth — the join shipped a Python-parallelized
        # 1-row relation through a BroadcastExchange on EVERY
        # execution (~0.25 s/query at sf0.1) and at scale each depth
        # cost a broadcast build.  Same semantics: a NULL suffix
        # (host shallower than the depth, or no host) never matched
        # the anti-join, so coalesce(..., false) keeps those rows.
        # Very large lists (>10k entries/depth) stay joins upstream:
        # pass a DataFrame blocklist instead.
        host = url_host(F.col(url_col))
        parts = F.split(host, r"\.")
        n = F.size(parts)
        keep = F.lit(True)
        for j, hs in sorted(buckets.items()):
            suffix = F.when(
                n >= j, F.concat_ws(".", F.slice(parts, -j, j))
            )
            keep = keep & ~F.coalesce(
                suffix.isin(sorted(hs)), F.lit(False)
            )
        return df.filter(keep)
    if not depths:
        return df
    host = url_host(F.col(url_col))
    parts = F.split(host, r"\.")
    n = F.size(parts)
    out = df
    for j in depths:
        # last-j-labels suffix of the row host; NULL when the host is
        # shallower than j (or absent) — NULL never joins, row survives
        suffix = F.when(
            n >= j, F.concat_ws(".", F.slice(parts, -j, j))
        )
        bl_j = F.broadcast(by_depth[j])
        out = out.join(
            bl_j, suffix == bl_j["__blocked_host"], "left_anti"
        )
    return out
