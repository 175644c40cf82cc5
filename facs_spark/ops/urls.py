"""Web-corpus URL curation: canonicalization + host keys, and
CCNet-style corpus-wide line (paragraph) dedup.

URL canonicalization is the first step of every crawl-dedup pipeline
(the same page arrives as ``HTTP://Site.com:80/a/?utm_source=x#top``
and ``http://site.com/a``).  The whole transform is JVM expression
code (regexp + array ops inside whole-stage codegen) — no Python, no
shuffle; it composes with ``exact_dedup`` for crawl-level URL dedup.

Rules (documented, deterministic, shared with the q54 DuckDB oracle):

* scheme and host lowercased; fragment dropped;
* default ports stripped (``:80`` for http, ``:443`` for https);
* empty path becomes ``/``; a trailing slash on a non-root path is
  dropped;
* query params: empties and tracking params (``utm_*``, ``fbclid``,
  ``gclid``, ``msclkid``, ``ref``) dropped, the rest byte-sorted and
  rejoined (param ORDER never distinguishes pages);
* ``www.`` is KEPT (stripping it conflates distinct vhosts).

``registrable_domain`` is the naive last-two-labels key (a real
deployment substitutes the public-suffix list; the column contract is
identical), useful as the per-host grouping/cap key
(``sampling.cap_per_group``) and the salting key for skewed hosts.

Line dedup (CCNet, Wenzek et al. 2020): a line/paragraph is kept only
at its FIRST corpus occurrence (smallest ``(doc_id, line_no)``); every
later identical line drops.  Scale shape: lines hash to 8-byte keys,
the first-occurrence winner per hash comes from ONE map-side-
combinable ``min(struct(doc_id, line_no))`` agg, kept lines rejoin
their doc in one groupBy — raw text crosses exactly one shuffle (the
rebuild), the dedup decision itself ships only longs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# RFC 3986 appendix-B parse, no backrefs (works in both Java regex and
# RE2, so the DuckDB oracle replays it verbatim)
_URL_RE = r"^(([^:/?#]+):)?(//([^/?#]*))?([^?#]*)(\?([^#]*))?(#(.*))?"
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|ref)="


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form of a URL column — pure JVM expression."""
    u = F.trim(F.col(url) if isinstance(url, str) else url)
    scheme = F.lower(F.regexp_extract(u, _URL_RE, 2))
    auth = F.lower(F.regexp_extract(u, _URL_RE, 4))
    host = F.regexp_replace(auth, r":\d+$", "")
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    keep_port = ~(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")))
    path = F.regexp_extract(u, _URL_RE, 5)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when((path != "/") & path.endswith("/"),
                  F.regexp_replace(path, r"/+$", "")).otherwise(path)
    query = F.regexp_extract(u, _URL_RE, 7)
    params = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE)))
    qpart = F.when(F.size(params) > 0,
                   F.concat(F.lit("?"), F.array_join(params, "&"))
                   ).otherwise(F.lit(""))
    pport = F.when(keep_port, F.concat(F.lit(":"), port)) \
             .otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, pport, path, qpart)


def host_of(url: Column | str) -> Column:
    """Lowercased host (port stripped) — the per-site group/cap key."""
    u = F.trim(F.col(url) if isinstance(url, str) else url)
    return F.regexp_replace(
        F.lower(F.regexp_extract(u, _URL_RE, 4)), r":\d+$", "")


def registrable_domain(url: Column | str) -> Column:
    """Naive registrable domain: the last two dot-labels of the host
    (public-suffix-list substitution point; documented limitation for
    ccTLD second-level registries like ``.co.uk``)."""
    h = host_of(url)
    parts = F.split(h, r"\.")
    n = F.size(parts)
    return F.when(n <= 2, h).otherwise(
        F.concat_ws(".", F.element_at(parts, -2),
                    F.element_at(parts, -1)))


def with_canonical_url(df: DataFrame, url_col: str = "url",
                       out_col: str = "canonical_url") -> DataFrame:
    """Attach canonical URL + host + registrable domain columns."""
    return (df.withColumn(out_col, canonicalize_url(url_col))
              .withColumn("host", host_of(url_col))
              .withColumn("domain", registrable_domain(url_col)))


# ------------------------------------------------------- line dedup
def line_dedup(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", sep: str = "\n",
               out_col: str = "clean_text") -> DataFrame:
    """Corpus-wide line dedup: each distinct line survives only at its
    first occurrence (min ``(doc_id, line_no)``); later copies drop.
    Returns (id_col, out_col, n_lines, n_kept).

    Empty lines are kept verbatim (they carry document structure, and
    deduping them would glue unrelated paragraphs).
    """
    hashed = (df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep))
         .alias("line_no", "line"))
        .withColumn("lh", F.xxhash64("line")))
    winners = (hashed.filter(F.trim("line") != "")
               .groupBy("lh")
               .agg(F.min(F.struct(id_col, "line_no")).alias("w")))
    # one flagged join on the 8-byte hash (winners are unique per lh,
    # so no fan-out), then ONE groupBy per doc computes totals, kept
    # counts, and the rebuilt text together — the two-branch
    # totals/rebuilt shape this replaces cost 6 exchanges
    flagged = (hashed.join(winners, "lh", "left")
               .withColumn(
                   "_keep",
                   F.when(F.trim("line") == "", F.lit(True))
                    .otherwise((F.col(f"w.{id_col}") == F.col(id_col))
                               & (F.col("w.line_no")
                                  == F.col("line_no")))))
    return (flagged.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_lines"),
                 F.sum(F.col("_keep").cast("long")).alias("n_kept"),
                 F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.when(F.col("_keep"),
                                    F.struct("line_no", "line")))),
                         lambda s: s["line"]),
                     sep).alias(out_col))
            .select(id_col, out_col, "n_lines", "n_kept"))
