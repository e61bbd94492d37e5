"""Web-crawl ingest operators over the (url, warc_ts, html, text, lang) shape.

The north-rule input is an Iceberg table of Common-Crawl-style pages whose
per-row invariant is byte-identical extracted text per url. These operators
cover the crawl-side of that contract:

  wrap_html_expr      -> JVM-side deterministic text->html wrapper (the exact
                         column twin of functions.text.wrap_text_as_html, so
                         fixtures can be synthesized at scale with zero Python)
  extract_html_text   -> the real extractor: Arrow-batched pandas UDF applying
                         functions.text.html_to_text to the html binary column
  html_roundtrip_check-> wrap + extract + byte-compare in one plan; the
                         roundtrip gate the pipeline's P/R claim rests on
  latest_snapshot     -> as-of dedup: newest crawl per url (max_by struct agg,
                         map-side combinable — no window sort at 10^12 rows)
  repetition_stats    -> Gopher-style repetition signals per doc: duplicate
                         n-gram fraction + top-n-gram mass fraction
  domain_stats        -> per-domain corpus rollup (doc counts, token mass,
                         language spread, mean quality)

The reference pipeline reads whole .txt files (main.py:283-284) and has no
crawl layer; these ops are the scale-out ingest surface a Common-Crawl corpus
needs before the reference's chunk/extract stages apply. All plans are
shuffle-linear: one hash aggregation per operator, no windows, no collects.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import html_to_text
from .textstats import quality_scores

# html.escape(quote=True) replacement chain, in python's exact order
# (& first, quotes last) — order matters for byte parity.
_ESCAPES = (
    ("&", "&amp;"),
    ("<", "&lt;"),
    (">", "&gt;"),
    ('"', "&quot;"),
    ("'", "&#x27;"),
)

HTML_PREFIX = "<html><body><p>"
HTML_SUFFIX = "</p></body></html>"


def wrap_html_expr(text_col: str | Column) -> Column:
    """text -> utf-8 html bytes, byte-identical to wrap_text_as_html().

    Pure JVM column expression (literal replace chain + concat + encode) so
    a pages fixture can be synthesized from any text column with no Python
    worker in the plan.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    for src, dst in _ESCAPES:
        c = F.replace(c, F.lit(src), F.lit(dst))
    return F.encode(F.concat(F.lit(HTML_PREFIX), c, F.lit(HTML_SUFFIX)), "UTF-8")


def extract_html_text(
    pages: DataFrame, html_col: str = "html", out_col: str = "extracted_text"
) -> DataFrame:
    """Append ``out_col``: text extracted from the html binary column.

    The extractor is the engine's real one (functions.text.html_to_text —
    script/style drop, tag strip, entity unescape), applied as an
    Arrow-batched scalar pandas UDF: one Python stage, vectorized transfer,
    no per-row pickling. Everything upstream/downstream stays JVM-side.
    """

    @F.pandas_udf("string")
    def _extract(payloads: pd.Series) -> pd.Series:
        return payloads.map(lambda p: html_to_text(p) if p is not None else None)

    return pages.withColumn(out_col, _extract(F.col(html_col)))


def html_roundtrip_check(
    pages: DataFrame, html_col: str = "html", text_col: str = "text"
) -> DataFrame:
    """Per-row gate for the north-rule invariant: extracted(html) == text.

    Adds ``roundtrip_ok`` (byte equality) and ``extracted_sha256`` so a
    driver can value-hash the extracted bytes without shipping them.
    """
    out = extract_html_text(pages, html_col=html_col, out_col="_extracted")
    return out.select(
        "*",
        (F.col("_extracted") == F.col(text_col)).alias("roundtrip_ok"),
        F.sha2(F.col("_extracted"), 256).alias("extracted_sha256"),
        F.length("_extracted").alias("extracted_chars"),
    ).drop("_extracted")


def latest_snapshot(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    tie_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Keep the newest crawl per url (as-of dedup of a multi-crawl corpus).

    One aggregation: ``max_by(struct(row), struct(ts, *tie_cols))`` —
    map-side combinable, so each partition reduces to one candidate row per
    url before the single Exchange; no window, no per-key row buffering.
    Physical note: the struct-valued buffer makes Spark pick SortAggregate
    (structs aren't hash-agg mutable), so each map task does a LOCAL sort by
    url before combining. That local, spillable sort still beats the
    alternatives at 10^12 rows: a window would shuffle the FULL table then
    sort per key; a max(ts)+self-join would pay a second full-table network
    shuffle. Shuffle bytes here stay O(urls x partitions).

    ``tie_cols`` break exact ts ties deterministically (pass e.g. a digest
    column); with no tie column the ts must be unique per url.
    """
    payload = [c for c in pages.columns if c != url_col]
    order = F.struct(F.col(ts_col), *[F.col(c) for c in tie_cols])
    out = pages.groupBy(url_col).agg(
        F.max_by(F.struct(*payload), order).alias("_row"),
        F.count(F.lit(1)).alias("n_crawls"),
    )
    return out.select(url_col, "_row.*", "n_crawls")


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 2
) -> DataFrame:
    """Gopher-style repetition signals per document.

    For word n-grams (default bigrams):

      n_grams        total n-gram count
      distinct_grams distinct n-gram count
      dup_gram_frac  1 - distinct/total   (duplicate n-gram fraction)
      top_gram_frac  max single-gram count / total (top n-gram mass)

    Plan: array-transform to n-grams (JVM), explode, two hash aggregations
    with map-side combine — linear in corpus size, the per-(doc, gram) key
    space is bounded by document length so there is no skew beyond document
    length itself. Docs with < n words report zeros.
    """
    words = F.filter(F.split(F.lower(text_col), r"\s+"), lambda w: w != F.lit(""))
    grams = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(words, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))

    per_gram = (
        docs.select(F.col(id_col), F.explode(grams).alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    stats = per_gram.groupBy(id_col).agg(
        F.sum("cnt").alias("n_grams"),
        F.count(F.lit(1)).alias("distinct_grams"),
        F.max("cnt").alias("top_cnt"),
    )
    zero = F.lit(0).cast("bigint")
    return (
        docs.select(id_col)
        .join(stats, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", zero).alias("n_grams"),
            F.coalesce("distinct_grams", zero).alias("distinct_grams"),
            F.round(
                F.when(
                    F.col("n_grams") > 0,
                    1.0 - F.col("distinct_grams") / F.col("n_grams"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_gram_frac"),
            F.round(
                F.when(
                    F.col("n_grams") > 0, F.col("top_cnt") / F.col("n_grams")
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("top_gram_frac"),
        )
    )


def domain_stats(
    docs: DataFrame, domain_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Per-domain corpus rollup: the aggregation behind crawl blocklists.

    One hash aggregation keyed by domain. Domains are the canonical skewed
    key of a web corpus (a head domain can hold 1e8 pages); every aggregate
    used here is algebraic (count/sum/avg) so the map-side combine bounds
    reducer input by (n_partitions x n_domains) regardless of skew — no
    per-domain row lists are ever built. count_distinct(lang) partial-aggs
    over the tiny (domain, lang) key space (|langs| is O(100)); for a
    high-cardinality distinct swap in approx_count_distinct.
    """
    q = quality_scores(docs, text_col=text_col)
    return q.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_words").cast("bigint")).alias("total_words"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
        F.count_distinct("lang").alias("n_langs"),
    )


# Query parameters dropped during URL canonicalization: the standard
# click-tracking keys that vary per visitor without changing the resource.
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|ref)="

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_AUTHORITY_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def normalize_url(
    url_col: str | Column, tracking_re: str = TRACKING_PARAM_RE
) -> Column:
    """Canonical form of an http(s) URL — a pure JVM column expression.

    Canonicalization applied (the usual crawl-frontier/dedup set):

      * scheme and host lowercased
      * default ports stripped (http://h:80 -> http://h, https://h:443)
      * empty path -> "/"
      * fragment dropped
      * tracking query params dropped (``tracking_re``), the rest sorted
        bytewise and rejoined, so param order never splits a URL's identity

    No Python in the plan: regexp extracts + a higher-order filter/sort over
    the split query string, all whole-stage-codegen-able. URLs without a
    ``scheme://`` prefix pass through unchanged (the expression only
    rewrites rows the authority regex matches).

    The reference has no crawl layer (main.py:283-284 reads local .txt
    files); this is ingest surface the Common-Crawl shape needs so that
    per-url invariants (north rule) key on one canonical identity.
    """
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    scheme = F.lower(F.regexp_extract(c, _SCHEME_RE, 1))
    auth0 = F.lower(F.regexp_extract(c, _AUTHORITY_RE, 1))
    authority = (
        F.when(scheme == "http", F.regexp_replace(auth0, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth0, ":443$", ""))
        .otherwise(auth0)
    )
    path0 = F.regexp_extract(c, _PATH_RE, 1)
    path = F.when(path0 == "", F.lit("/")).otherwise(path0)
    query = F.regexp_extract(c, _QUERY_RE, 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != F.lit("")) & ~p.rlike(tracking_re),
    )
    qnorm = F.array_join(F.array_sort(kept), "&")
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        authority,
        path,
        F.when(qnorm != "", F.concat(F.lit("?"), qnorm)).otherwise(F.lit("")),
    )
    return F.when(auth0 != "", rebuilt).otherwise(c)


def canonical_url_dedup(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    tie_cols: tuple[str, ...] = (),
    tracking_re: str = TRACKING_PARAM_RE,
) -> DataFrame:
    """As-of dedup keyed by the CANONICAL url, not the raw crawl string.

    ``normalize_url`` collapses scheme/host case, default ports, fragments,
    tracking params and param order into one identity, then
    ``latest_snapshot`` keeps the newest crawl per identity (map-side
    combinable max_by — same single-Exchange shape, see latest_snapshot).
    Output carries ``canonical_url`` plus the surviving row's raw ``url``.
    """
    with_canon = pages.withColumn(
        "canonical_url", normalize_url(url_col, tracking_re)
    )
    return latest_snapshot(
        with_canon, url_col="canonical_url", ts_col=ts_col, tie_cols=tie_cols
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    sha_col: str = "content_sha",
) -> DataFrame:
    """Per-url delta between two crawl snapshots: added/removed/changed/unchanged.

    Inputs are one-row-per-url snapshots (e.g. two ``latest_snapshot``
    outputs at different cut points) carrying a content digest. One
    full-outer hash join on url — both sides are unique on the key, so the
    join is 1:1, skew-free, and shuffle bytes are O(|old| + |new|); the
    digest comparison avoids shipping page bodies. This is the operator an
    incremental re-crawl pipeline runs to decide which urls to re-extract.
    """
    o = old.select(F.col(url_col), F.col(sha_col).alias("old_sha"))
    n = new.select(F.col(url_col), F.col(sha_col).alias("new_sha"))
    j = o.join(n, url_col, "full_outer")
    status = (
        F.when(F.col("old_sha").isNull(), F.lit("added"))
        .when(F.col("new_sha").isNull(), F.lit("removed"))
        .when(F.col("old_sha") != F.col("new_sha"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(url_col, status.alias("status"), "old_sha", "new_sha")


def corpus_cube(
    docs: DataFrame,
    dims: tuple[str, str] = ("source", "lang"),
    size_col: str = "n_chars",
) -> DataFrame:
    """OLAP CUBE over two corpus dimensions with exact size percentiles:
    (dim1, dim2, gid, n_docs, total_size, p50_size, p95_size) — one row
    per (dim1, dim2) cell PLUS per-dim subtotals and the grand total;
    ``gid`` = grouping(dim1)*2 + grouping(dim2) disambiguates a subtotal
    NULL from a genuine NULL dimension value.

    The dashboard query of a crawl corpus (how big is each
    domain x language slice, and how are document sizes distributed in
    it) in ONE pass: Spark expands CUBE into grouping sets inside a
    single hash aggregation — 4x the key space of a plain groupBy, not 4
    scans. ``percentile`` is the exact linear-interpolation quantile
    (matches DuckDB ``quantile_cont``) — per-cell state is the cell's
    sorted size multiset, bounded by cell cardinality; swap in
    ``percentile_approx`` (t-digest, O(1) state) when cells reach 1e9
    rows. Reference has no OLAP layer (nearest: graph_stats counters).
    """
    d1, d2 = dims
    return (
        docs.cube(d1, d2)
        .agg(
            (F.grouping(d1) * 2 + F.grouping(d2)).alias("gid"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col(size_col).cast("bigint")).alias("total_size"),
            F.round(F.percentile(size_col, F.lit(0.5)), 6).alias("p50_size"),
            F.round(F.percentile(size_col, F.lit(0.95)), 6).alias("p95_size"),
        )
    )


def robots_filter(
    urls: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """Crawl-politeness gate: evaluate each URL against its domain's
    robots.txt and append ``robots_allowed``.

    Grammar (the documented common subset of REP / RFC 9309): groups are
    separated by blank lines; a group applies when it contains a
    ``User-agent: *`` line; its ``Allow:`` / ``Disallow:`` values are
    prefix rules. Decision per URL path: longest matching prefix wins,
    Allow wins length ties, no match (or no robots row) = allowed —
    i.e. ``max(allow match len) >= max(disallow match len)`` with empty
    maxes as -1. Wildcards (*, $) are NOT interpreted (documented
    simplification; they appear in a minority of files).

    Entirely JVM higher-order functions: the robots side parses each file
    ONCE into a rules array (per-domain work, |domains| << |urls|), the
    join is a hash equi-join on domain, and the per-URL decision is an
    array fold over that domain's rules — no Python, no explode of the
    URL side, no shuffle beyond the domain join (broadcast when the
    robots table measures small).
    """
    lines = lambda g: F.transform(  # noqa: E731
        F.split(g, "\n"), lambda ln: F.trim(ln)
    )
    is_star = lambda g: F.exists(  # noqa: E731
        lines(g), lambda ln: F.lower(ln) == F.lit("user-agent: *")
    )
    rule_lines = lambda g: F.filter(  # noqa: E731
        lines(g),
        lambda ln: F.lower(ln).rlike(r"^(allow|disallow):"),
    )
    groups = F.split(F.col(robots_col), r"\n[ \t\r]*\n")
    all_rule_lines = F.flatten(
        F.transform(
            F.filter(groups, is_star),
            rule_lines,
        )
    )
    rules = F.filter(
        F.transform(
            all_rule_lines,
            lambda ln: F.struct(
                F.lower(ln).rlike(r"^allow:").alias("allow"),
                F.trim(F.regexp_replace(ln, r"^[A-Za-z-]+:", "")).alias(
                    "prefix"
                ),
            ),
        ),
        lambda r: r["prefix"] != F.lit(""),
    )
    parsed = robots.select(F.col(domain_col).alias("_dom"), rules.alias("_rules"))

    dom = F.regexp_extract(F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1)
    path_raw = F.regexp_extract(
        F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^#]*)", 1
    )
    path = F.when(path_raw == "", F.lit("/")).otherwise(path_raw)
    u = urls.withColumn("_dom", dom).withColumn("_path", path)

    best = lambda want_allow: F.coalesce(  # noqa: E731
        F.array_max(
            F.transform(
                F.filter(
                    F.col("_rules"),
                    lambda r: (r["allow"] == F.lit(want_allow))
                    & F.col("_path").startswith(r["prefix"]),
                ),
                lambda r: F.length(r["prefix"]),
            )
        ),
        F.lit(-1),
    )
    joined = u.join(parsed, "_dom", "left")
    allowed = F.when(F.col("_rules").isNull(), F.lit(True)).otherwise(
        best(True) >= best(False)
    )
    return joined.withColumn("robots_allowed", allowed).drop(
        "_dom", "_path", "_rules"
    )


def scd2_versions(
    snapshots: DataFrame,
    key_col: str = "url",
    ts_col: str = "warc_ts",
    digest_col: str = "digest",
    tiebreak_col: str = "doc_id",
) -> DataFrame:
    """SCD-type-2 version history from raw snapshots: collapse consecutive
    identical captures, emit one row per CHANGE with a validity interval —
    (key, version, valid_from, valid_to [null = current], is_current,
    digest). The warehouse twin of snapshot_diff: diff answers "what
    changed between two crawls", this builds the full change timeline a
    temporal join (as-of on valid_from/valid_to) can query.

    Plan: one shuffle on the key; change detection is lag(digest) over the
    (ts, tiebreak) sort, interval close is lead(ts) over the surviving
    change rows — two stacked windows, both partitioned by the key (crawl
    cardinality per url bounds the partition, same skew envelope as
    latest_snapshot). Nothing leaves the JVM.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    changed = snapshots.withColumn(
        "_prev", F.lag(digest_col).over(w)
    ).filter(F.col("_prev").isNull() | (F.col("_prev") != F.col(digest_col)))
    w2 = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    return (
        changed.withColumn("version", F.row_number().over(w2))
        .withColumn("valid_to", F.lead(ts_col).over(w2))
        .select(
            key_col,
            "version",
            F.col(ts_col).alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
            digest_col,
        )
    )


# --- hyperlink graph extraction ---------------------------------------------

# Documented parse subset (crawl-grade, not a full HTML5 parser): lowercase
# <a ...> elements with a DOUBLE-quoted href and no nested markup inside the
# anchor text. Both regexes live in the Java∩RE2 common subset.
_ANCHOR_RE = r'<a\s[^>]*href="[^"]*"[^>]*>[^<]*</a>'
_HREF_IN_ANCHOR_RE = r'href="([^"]*)"'
_TEXT_IN_ANCHOR_RE = r">([^<]*)</a>"
_ABS_URL_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://"
_SCHEME_ONLY_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*:"


def resolve_url(base: str | Column, href: str | Column) -> Column:
    """RFC 3986-style reference resolution as a pure JVM column expression.

    Handled branches: absolute (``scheme://``), protocol-relative (``//h``),
    root-relative (``/p``), fragment-only (``#x`` -> the base url sans
    fragment), and path-relative (joined onto the base path's directory).
    Fragments are dropped from every result (crawl identity; matches
    :func:`normalize_url`). Dot-segment removal is a bounded fixpoint — four
    passes each of ``/./`` collapse and ``/seg/../`` collapse, where ``seg``
    starts with an alphanumeric (true of crawl paths; keeps the pattern in
    the RE2 subset, which has no lookahead to exclude ``..`` itself).
    Non-hierarchical schemes (``mailto:``, ``javascript:`` — a scheme with
    no ``//``) resolve to NULL so callers can filter them.

    The reference has no crawl layer; this is the web-graph ingest surface
    (link edges feed pagerank/trustrank/hits over REAL crawl structure).
    """
    b = F.col(base) if isinstance(base, str) else base
    h = F.col(href) if isinstance(href, str) else href
    scheme = F.lower(F.regexp_extract(b, _SCHEME_RE, 1))
    authority = F.lower(F.regexp_extract(b, _AUTHORITY_RE, 1))
    root = F.concat(scheme, F.lit("://"), authority)
    bpath = F.regexp_extract(b, _PATH_RE, 1)
    bpath = F.when(bpath == "", F.lit("/")).otherwise(bpath)
    bdir = F.regexp_replace(bpath, r"[^/]*$", "")
    nofrag = F.regexp_replace(h, r"#.*$", "")
    resolved = (
        F.when(h.rlike(r"^#"), F.regexp_replace(b, r"#.*$", ""))
        .when(nofrag.rlike(_ABS_URL_RE), nofrag)
        .when(nofrag.rlike(r"^//"), F.concat(scheme, F.lit(":"), nofrag))
        .when(nofrag.rlike(r"^/"), F.concat(root, nofrag))
        .when(nofrag.rlike(_SCHEME_ONLY_RE), F.lit(None).cast("string"))
        .otherwise(F.concat(root, bdir, nofrag))
    )
    for _ in range(4):
        resolved = F.replace(resolved, F.lit("/./"), F.lit("/"))
    for _ in range(4):
        resolved = F.regexp_replace(resolved, r"/[A-Za-z0-9][^/]*/\.\./", "/")
    return resolved


def extract_links(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    drop_self: bool = False,
) -> DataFrame:
    """(url, pos, href_raw, anchor_text, dst_url) — one row per ``<a href>``.

    One linear JVM pass: ``regexp_extract_all`` pulls whole anchor elements
    from the decoded html, ``posexplode`` fans them out (document order
    preserved in ``pos``), then per-anchor extracts + :func:`resolve_url` +
    :func:`normalize_url`. No Python in the plan, no shuffle — link
    extraction at crawl scale is scan-shaped. Non-resolvable hrefs
    (``mailto:`` etc.) come out with dst_url NULL; ``drop_self`` removes
    edges pointing back at the (normalized) page itself.
    """
    html_str = F.decode(F.col(html_col), "UTF-8")
    anchors = F.regexp_extract_all(html_str, F.lit(_ANCHOR_RE), 0)
    out = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(anchors).alias("pos", "_anchor"),
    ).select(
        "url",
        "pos",
        F.regexp_extract("_anchor", _HREF_IN_ANCHOR_RE, 1).alias("href_raw"),
        F.regexp_extract("_anchor", _TEXT_IN_ANCHOR_RE, 1).alias("anchor_text"),
    )
    out = out.withColumn(
        "dst_url",
        F.when(
            resolve_url("url", "href_raw").isNotNull(),
            normalize_url(resolve_url("url", "href_raw")),
        ),
    )
    if drop_self:
        out = out.filter(
            F.col("dst_url").isNull()
            | (F.col("dst_url") != normalize_url(F.col("url")))
        )
    return out


def host_graph(links: DataFrame) -> DataFrame:
    """(src_host, dst_host, n_links) — the host-level web graph.

    Map-side-combined hash aggregation keyed by the host pair; reducer
    input is bounded by partitions × distinct host pairs, so hub hosts
    cost memory proportional to their distinct neighbor set, not their
    link count. Output feeds pagerank/trustrank/hits with real edges.
    """
    host = lambda c: F.regexp_extract(c, _AUTHORITY_RE, 1)  # noqa: E731
    return (
        links.filter(F.col("dst_url").isNotNull())
        .groupBy(
            host(F.col("url")).alias("src_host"),
            host(F.col("dst_url")).alias("dst_host"),
        )
        .agg(F.count(F.lit(1)).alias("n_links"))
    )


def anchor_entity_mentions(
    links: DataFrame, mapping: DataFrame, broadcast_mapping: bool = True
) -> DataFrame:
    """(entity, dst_url, n_mentions): ground canonical KG entities to crawl
    URLs via anchor text — the web-graph signal a KG-construction pipeline
    feeds back into entity linking (anchor text is the classic free label
    for the page it points at).

    Anchor texts are matched lowercased/trimmed against the entity
    standardization mapping's ``variant`` column (the same variant space the
    KG itself resolves, so anchor and in-document mentions canonicalize
    identically) and emitted under the canonical ``standard`` form. The
    mapping is vocabulary-sized -> broadcast hash join (no shuffle on the
    link side); the count is a map-side-combined aggregation. Anchors with
    NULL dst_url (mailto: etc.) or no entity match drop out.
    """
    m = mapping.select(
        F.col("variant").alias("_v"), F.col("standard").alias("entity")
    )
    if broadcast_mapping:
        m = F.broadcast(m)
    return (
        links.filter(F.col("dst_url").isNotNull())
        .join(m, F.lower(F.trim(F.col("anchor_text"))) == F.col("_v"))
        .groupBy("entity", "dst_url")
        .agg(F.count(F.lit(1)).alias("n_mentions"))
    )


def frontier_schedule(
    urls: DataFrame,
    k_per_host: int = 8,
    max_per_host: int | None = None,
    url_col: str = "url",
    priority_col: str | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Politeness-aware crawl-frontier scheduling: assign every URL a
    ``fetch_rank`` within its host (priority desc, url asc — deterministic)
    and a ``fetch_round`` = (rank-1) // k_per_host, so round r fetches at
    most ``k_per_host`` pages per host (the per-host rate cap every polite
    crawler enforces; rounds map to scheduler ticks).

    ``max_per_host`` caps each host's crawl budget. The cap is applied with
    a LOSSLESS two-phase rank so no reducer ever windows a whole hub host
    (a 10^7-page host would otherwise sort through one task):

      1. rank within (host, hash-bucket of url) — per-reducer input is
         |host| / n_buckets — and keep bucket_rank <= max_per_host. Any URL
         whose true host-rank is <= max_per_host has bucket_rank <=
         max_per_host (ranks only shrink when restricted to a subset), so
         phase 1 never drops a survivor: it is a superset filter.
      2. exact rank over the <= n_buckets * max_per_host survivors per
         host — bounded reducer input by construction.

    Without ``max_per_host`` the budget is unbounded and the plain per-host
    window is the only correct plan (documented skew exposure: schedule
    unbudgeted hub hosts in their own run, or set a budget).

    Reference repo has no crawler (beyond-reference web-pipeline surface,
    same family as robots_filter / normalize_url).
    """
    from pyspark.sql import Window

    prio = (
        F.col(priority_col)
        if priority_col
        else F.lit(0)
    )
    base = urls.select(
        "*",
        F.regexp_extract(F.col(url_col), _AUTHORITY_RE, 1).alias("host"),
        prio.cast("long").alias("_prio"),
    )
    order = [F.col("_prio").desc(), F.col(url_col).asc()]
    if max_per_host is not None:
        bucket = F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_buckets))
        w1 = Window.partitionBy("host", bucket).orderBy(*order)
        base = base.withColumn("_brank", F.row_number().over(w1)).filter(
            F.col("_brank") <= max_per_host
        )
    w = Window.partitionBy("host").orderBy(*order)
    out = base.withColumn("fetch_rank", F.row_number().over(w).cast("long"))
    if max_per_host is not None:
        out = out.filter(F.col("fetch_rank") <= max_per_host)
    return (
        out.withColumn(
            "fetch_round",
            ((F.col("fetch_rank") - 1) / F.lit(k_per_host)).cast("long"),
        )
        .drop("_prio", "_brank")
    )


def resolve_redirects(
    redirects: DataFrame,
    max_hops: int = 32,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Resolve every URL to its redirect-chain terminal by pointer jumping.

    Input: one row per redirect edge (src -> dst); a URL with no outgoing
    edge is terminal. Output: ``url, final_url, hops`` for every url that
    appears anywhere in the edge set (terminals resolve to themselves with
    hops 0).

    Plan shape (the 100 TB story): path-halving — each round composes the
    current pointer table with itself (f := f . f), doubling resolved
    chain length, so ``ceil(log2(max_hops))`` self-joins on the pointer
    key resolve chains up to ``max_hops``; each round is one hash
    equijoin on a (url, pointer, hops) table, localCheckpoint'd to keep
    the lineage flat (the components-family pattern). Rows still moving
    after the last round (a cycle, or a chain longer than max_hops) are
    flagged ``resolved = false`` instead of looping forever.
    """
    edges = redirects.select(
        F.col(src_col).alias("url"), F.col(dst_col).alias("ptr")
    ).distinct()
    nodes = (
        edges.select("url")
        .union(edges.select(F.col("ptr").alias("url")))
        .distinct()
    )
    # initial pointer: the redirect target, or self (terminal, 0 hops)
    state = (
        nodes.join(edges, "url", "left")
        .select(
            "url",
            F.coalesce("ptr", F.col("url")).alias("ptr"),
            F.when(F.col("ptr").isNull(), F.lit(0)).otherwise(F.lit(1)).alias("hops"),
        )
        .localCheckpoint(eager=True)
    )
    rounds = max(1, int(math.ceil(math.log2(max(2, max_hops)))))
    for _ in range(rounds):
        nxt = state.select(
            F.col("url").alias("ptr"),
            F.col("ptr").alias("ptr2"),
            F.col("hops").alias("hops2"),
        )
        state = (
            state.join(nxt, "ptr")
            .select(
                "url",
                F.col("ptr2").alias("ptr"),
                (F.col("hops") + F.col("hops2")).alias("hops"),
            )
            .localCheckpoint(eager=True)
        )
    # a pointer that still has an outgoing edge after all rounds never
    # reached a terminal within max_hops (cycle or over-long chain)
    unresolved = edges.select(F.col("url").alias("ptr")).distinct().withColumn(
        "_moving", F.lit(True)
    )
    return (
        state.join(unresolved, "ptr", "left")
        .select(
            "url",
            F.col("ptr").alias("final_url"),
            F.col("hops").cast("int").alias("hops"),
            F.coalesce(~F.col("_moving"), F.lit(True)).alias("resolved"),
        )
    )


def parse_sitemaps(
    sitemaps: DataFrame,
    host_col: str = "host",
    xml_col: str = "sitemap_xml",
) -> DataFrame:
    """Parse sitemap.xml documents into (host, url, lastmod, priority) rows.

    Grammar: the sitemaps.org <urlset> subset — each ``<url>`` entry's
    ``<loc>`` (required), ``<lastmod>`` (optional, ISO date prefix kept
    verbatim), ``<priority>`` (optional, defaults 0.5 per the protocol).
    Entries without a <loc> are dropped. Entirely JVM-side: one
    regexp_extract_all per sitemap splits the <url> blocks (per-host work,
    |hosts| << |urls|), then per-entry field extraction over the exploded
    block — no Python UDF, no shuffle before the explode; downstream
    consumers join on host or url as usual.
    """
    blocks = F.expr(
        f"regexp_extract_all({xml_col}, '<url>(.*?)</url>', 1)"
    )
    entry = F.col("_entry")
    loc = F.regexp_extract(entry, r"<loc>\s*(.*?)\s*</loc>", 1)
    lastmod = F.regexp_extract(entry, r"<lastmod>\s*(.*?)\s*</lastmod>", 1)
    prio = F.regexp_extract(entry, r"<priority>\s*(.*?)\s*</priority>", 1)
    return (
        sitemaps.select(F.col(host_col).alias("host"), blocks.alias("_blocks"))
        .select("host", F.explode("_blocks").alias("_entry"))
        .select(
            "host",
            loc.alias("url"),
            F.when(lastmod == "", None).otherwise(lastmod).alias("lastmod"),
            F.when(prio == "", F.lit(0.5))
            .otherwise(prio.cast("double"))
            .alias("priority"),
        )
        .filter(F.col("url") != "")
    )


def anchor_corpus(links: DataFrame) -> DataFrame:
    """(dst_url, anchor_text, n_mentions, n_src_hosts): aggregated anchor
    texts per link target — the classic web-search description signal
    (anchor text describes the TARGET page better than the page itself;
    Brin & Page 1998 §2.2), which a crawl-fed KG uses as entity surface
    forms and page descriptions.

    One hash aggregation keyed on (dst_url, anchor_text); the mention
    count combines map-side and the distinct-source-host count is bounded
    per key by the host universe. Empty/whitespace anchors are dropped.
    """
    host = F.regexp_extract(F.col("url"), _AUTHORITY_RE, 1)
    return (
        links.filter(F.col("dst_url").isNotNull())
        .filter(F.trim(F.col("anchor_text")) != "")
        .groupBy("dst_url", "anchor_text")
        .agg(
            F.count(F.lit(1)).alias("n_mentions"),
            F.countDistinct(host).alias("n_src_hosts"),
        )
    )


def url_templates(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """(host, template, n_urls, example_url): URL pattern mining — collapse
    digit runs to ``{n}`` and aggregate per host, the standard crawler
    pass for spotting parameterized page families (pagination, article
    ids, session paths) so the frontier can cap or canonicalize them
    (the URL-template clustering of Koppula et al., WSDM 2010, reduced
    to its digit-generalization core).

    ``example_url`` is the lexicographically smallest member
    (deterministic). One hash aggregation keyed (host, template); both
    aggregates combine map-side, so hub hosts cost their distinct
    template count, not their page count.
    """
    host = F.regexp_extract(F.col(url_col), _AUTHORITY_RE, 1)
    template = F.regexp_replace(F.col(url_col), "[0-9]+", "{n}")
    return (
        pages.select(
            host.alias("host"),
            template.alias("template"),
            F.col(url_col).alias("u"),
        )
        .groupBy("host", "template")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.min("u").alias("example_url"),
        )
    )


def recrawl_priority(snapshots: list[DataFrame]) -> DataFrame:
    """(url, n_snaps, n_obs_pairs, n_changes, change_ppm, priority):
    change-rate estimation across crawl snapshots (the freshness-driven
    recrawl scheduling of Cho & Garcia-Molina, TOIT 2003): for each URL,
    compare content digests between CONSECUTIVE snapshots where the URL
    is present in both; the observed change fraction maps to a recrawl
    priority bucket (fast >= 50%, medium > 0, slow = 0, unknown when the
    URL never appears in two consecutive snapshots).

    ``snapshots`` is the crawl-ordered list of (url, content_sha) frames.
    One union with a snapshot tag, one url-keyed presence aggregation,
    one (url, snap+1) equi-self-join for the consecutive pairs — no
    windows, no per-url sorting; change_ppm is exact integer arithmetic.
    """
    if not snapshots:
        raise ValueError("recrawl_priority requires at least one snapshot")
    tagged = None
    for i, snap in enumerate(snapshots):
        t = snap.select(
            "url", "content_sha", F.lit(i).alias("snap")
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    tagged = tagged.localCheckpoint(eager=True)
    presence = tagged.groupBy("url").agg(F.count(F.lit(1)).alias("n_snaps"))
    nxt = tagged.select(
        "url",
        (F.col("snap") - 1).alias("snap"),
        F.col("content_sha").alias("_sha2"),
    )
    pairs = (
        tagged.join(nxt, ["url", "snap"])
        .groupBy("url")
        .agg(
            F.count(F.lit(1)).alias("n_obs_pairs"),
            F.sum(
                (F.col("content_sha") != F.col("_sha2")).cast("long")
            ).alias("n_changes"),
        )
    )
    ppm = F.expr("(n_changes * 1000000) DIV n_obs_pairs")
    return (
        presence.join(pairs, "url", "left")
        .select(
            "url",
            F.col("n_snaps").cast("long").alias("n_snaps"),
            F.coalesce("n_obs_pairs", F.lit(0)).cast("long").alias("n_obs_pairs"),
            F.coalesce("n_changes", F.lit(0)).cast("long").alias("n_changes"),
        )
        .select(
            "*",
            F.when(F.col("n_obs_pairs") > 0, ppm).alias("change_ppm"),
            F.when(F.col("n_obs_pairs") == 0, F.lit("unknown"))
            .when(ppm >= 500000, F.lit("fast"))
            .when(ppm > 0, F.lit("medium"))
            .otherwise(F.lit("slow"))
            .alias("priority"),
        )
    )
