"""Web/crawl-specific column algebra — URL canonicalization and
host extraction, the keys a crawl-curation pipeline dedups and
aggregates on (one crawl sees the same page as ``http://`` vs
``https://``, with/without ``www.``, with tracking params, fragments,
and trailing slashes — all one logical document).

Everything here is pure string algebra (regexp_replace / regexp_extract
chains) so it stays inside whole-stage codegen and mirrors 1:1 into any
SQL engine for oracle checks. At 100 TB the canonical URL is THE dedup
key for crawl snapshots: an exact groupBy on ``url_canon`` replaces a
far more expensive text-level near-dup pass for the (dominant) fraction
of duplicates that are literal re-crawls of one page.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tracking params stripped during canonicalization: the standard
# utm_* family plus the common click ids. Kept minimal and explicit —
# a deployment extends the list, the mechanics don't change. The
# leading ([?&]) boundary is load-bearing: without it the pattern
# matches INSIDE other param names ('href=...' loses its 'ref=...'
# suffix) and inside path segments ('/dp/B01/ref=sr_1_1'), merging
# genuinely distinct URLs. The delimiter is kept via the $1 group and
# cleaned up by the later collapse steps.
_TRACKING_PARAM_RE = r"([?&])(utm_[a-z]+|gclid|fbclid|msclkid|ref)=[^&#]*"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_host(col: Column | str) -> Column:
    """Lower-cased host of a URL, ``www.`` prefix dropped. NULL-safe:
    a value with no authority-ish prefix yields its first path-less
    segment (garbage in, deterministic garbage out — never an error)."""
    no_scheme = F.regexp_replace(_c(col), r"(?i)^[a-z][a-z0-9+.-]*://", "")
    host = F.lower(F.regexp_extract(no_scheme, r"^([^/?#]+)", 1))
    return F.regexp_replace(host, r"^www\.", "")


def url_canonical(col: Column | str) -> Column:
    """Canonical form of a URL: lower-cased de-``www``-ed host +
    case-preserved path with tracking params, empty query and fragment
    stripped, and any trailing slash removed.

    Op order (each step mirrors to one SQL regexp_replace, in the same
    order, for cross-engine exactness):

    1. trim, drop scheme (case-insensitive)
    2. split authority/rest at the first ``/?#``
    3. host: lower + strip leading ``www.``
    4. rest: drop fragment; drop ``[?&]``-anchored tracking params
       (keeping the delimiter); collapse ``&&`` runs, then a leading
       ``?&``; strip dangling ``?``/``&`` and trailing ``/``

    The collapse ORDER matters: ``&&+ → &`` must run before
    ``?&+ → ?`` or two leading tracking params leave a stray ``&``
    (``?utm_a=..&utm_b=..&x=1`` → ``?&&x=1`` → ``?&x=1`` → ``?x=1``),
    which would break the idempotency this function promises.

    Paths stay case-sensitive (lower-casing them would merge genuinely
    distinct documents); only the authority is case-folded.
    """
    no_scheme = F.regexp_replace(
        F.trim(_c(col)), r"(?i)^[a-z][a-z0-9+.-]*://", ""
    )
    host = F.regexp_replace(
        F.lower(F.regexp_extract(no_scheme, r"^([^/?#]+)", 1)), r"^www\.", ""
    )
    rest = F.regexp_replace(no_scheme, r"^[^/?#]+", "")
    rest = F.regexp_replace(rest, r"#.*$", "")
    rest = F.regexp_replace(rest, _TRACKING_PARAM_RE, "$1")
    rest = F.regexp_replace(rest, r"&&+", "&")
    rest = F.regexp_replace(rest, r"\?&+", "?")
    rest = F.regexp_replace(rest, r"[?&]+$", "")
    rest = F.regexp_replace(rest, r"/+$", "")
    return F.concat(host, rest)


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact dedup by canonical URL: keep the smallest ``id_col`` per
    ``url_canonical(url_col)`` group (the deterministic representative —
    same keep rule as the digest dedup family). Adds ``url_canon`` and
    ``host``; drops the losing re-crawls.

    Rows whose URL is NULL or canonicalizes to the empty string carry
    no dedup key and pass through UNTOUCHED — collapsing every url-less
    document into one "duplicate" group would silently drop them all
    but one.

    Scale shape: one shuffle keyed on the canonical URL (uniform —
    URLs are near-unique by construction after canonicalization), an
    aggregate-to-min + self-join-free keep via the (key, min_id) frame.
    No windows, no collects.
    """
    canon = df.withColumn("url_canon", url_canonical(url_col)).withColumn(
        "host", url_host(url_col)
    )
    keyless = F.col("url_canon").isNull() | (F.col("url_canon") == "")
    keyed = canon.filter(~keyless)
    keep = keyed.groupBy("url_canon").agg(F.min(F.col(id_col)).alias("__keep"))
    return (
        keyed.join(keep, on="url_canon")
        .filter(F.col(id_col) == F.col("__keep"))
        .drop("__keep")
        .unionByName(canon.filter(keyless))
    )


def domain_suffix_filter(
    df: DataFrame,
    blocklist: DataFrame,
    *,
    url_col: str = "url",
    suffix_col: str = "suffix",
    max_labels: int = 10,
) -> DataFrame:
    """Domain-suffix blocklist matching — the crawl-gating rule where a
    blocklist entry ``example.com`` must cover ``a.b.example.com`` too
    (registrable-domain semantics, the URL-filtering stage of the
    C4/RefinedWeb-style web pipelines). Suffix matching cannot be an
    equi-join on the host, so the host EXPANDS to its dot-suffix chain
    (``a.b.example.com`` → itself, ``b.example.com``, ``example.com``,
    ``com`` — at most ``max_labels`` entries, deepest labels dropped
    first on pathological hosts) and the chain equi-joins the
    blocklist. A row is blocked when ANY suffix matches; the reported
    match is the LONGEST (most specific) one, picked by an exact
    (length, suffix) struct-max — deterministic, never partition-order.

    Output: every input row as ``(id-and-payload columns…, host,
    blocked, matched_suffix)`` — a split the caller filters, so the
    kept/rejected sides share one plan (the reference's
    blocklist-split discipline, filters.py:19).

    Scale shape: the explode fans out ≤ ``max_labels`` rows per doc
    (label count, not data size); ONE equi-join against the (small,
    broadcast) blocklist; one keyed re-aggregate back to the row grain.
    Blocklists are operator-curated lists — broadcastable by
    construction; a million-entry list is still MBs.
    """
    if max_labels < 1:
        raise ValueError("domain_suffix_filter: max_labels must be >= 1")
    host = url_host(F.col(url_col))
    base = df.withColumn("host", host)
    labels = F.split(F.col("host"), r"\.")
    n = F.size(labels)
    # suffix i (1-based from the LAST label kept): join of labels[i..n]
    chain = F.transform(
        F.sequence(
            F.greatest(F.lit(1), n - F.lit(int(max_labels)) + 1), n
        ),
        lambda i: F.concat_ws(".", F.slice(labels, i, n - i + 1)),
    )
    sfx = F.broadcast(
        blocklist.select(
            F.lower(F.trim(F.col(suffix_col))).alias("__sfx")
        ).distinct()
    )
    exploded = base.select(
        "*", F.explode_outer(chain).alias("__cand")
    )
    hits = (
        exploded.join(sfx, exploded["__cand"] == sfx["__sfx"], "left")
        .groupBy(*df.columns, "host")
        .agg(
            F.max(
                F.when(
                    F.col("__sfx").isNotNull(),
                    F.struct(
                        F.length("__sfx").alias("l"),
                        F.col("__sfx").alias("s"),
                    ),
                )
            ).alias("__m")
        )
    )
    return hits.select(
        *df.columns,
        "host",
        F.col("__m").isNotNull().alias("blocked"),
        F.col("__m.s").alias("matched_suffix"),
    )
