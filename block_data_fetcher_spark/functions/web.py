"""Web-corpus curation: URL canonicalization + dedup.

Every large crawl pipeline dedups by CANONICAL url before any content
hashing (the same page is fetched as `HTTP://WWW.Site.COM:443/a/?b=2&a=1`
and `https://site.com/a?a=1&b=2`). Canonicalization here is pure
built-in column expressions — regexp parsing, array filter/sort,
concat — entirely JVM-side/codegen, zero Python, zero shuffle until
the final groupBy on the canonical key. The DuckDB oracle replicates
the same normalization with its own string/list functions, so the two
independent implementations must agree value-for-value.

Rules (the common subset of RFC 3986 normalization + tracker
stripping): lowercase scheme and host, drop a leading ``www.``, drop
default ports ``:80``/``:443``, drop trailing slashes from the path,
drop the fragment, drop ``utm_*``/``fbclid``/``gclid`` query params,
sort the surviving params.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import parallelize, table

_TRACKER_RE = "^(utm_|fbclid|gclid)"


def synth_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic messy-URL corpus from ``documents``: casing, a
    www. prefix, an explicit :443, a trailing slash, shuffled query
    param order, tracker params and fragments all vary with doc_id —
    77 canonical targets (host x path classes) survive."""
    docs = parallelize(table(spark, sf_dir, "documents"), spark).select("doc_id")
    d = F.col("doc_id")
    url = F.concat(
        F.when(d % 5 == 0, F.lit("HTTPS://")).otherwise(F.lit("https://")),
        F.when(d % 2 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.lit("site"),
        (d % 7).cast("string"),
        F.when(d % 3 == 0, F.lit(".COM")).otherwise(F.lit(".com")),
        F.when(d % 4 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/p/"),
        (d % 11).cast("string"),
        F.when(d % 6 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(d % 2 == 0, F.lit("?b=2&a=1")).otherwise(F.lit("?a=1&b=2")),
        F.when(d % 8 == 0, F.lit("&utm_source=u")).otherwise(F.lit("")),
        F.when(d % 9 == 0, F.lit("#sec")).otherwise(F.lit("")),
    )
    return docs.select("doc_id", url.alias("url"))


def canonical_url(url: Column) -> Column:
    """Canonicalize a URL column with built-in expressions only."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z]+)://", 1))
    host = F.lower(F.regexp_extract(url, r"^[A-Za-z]+://([^/?#]+)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r":(443|80)$", "")
    path = F.regexp_extract(url, r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKER_RE),
        )
    )
    qs = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.concat_ws("&", params))
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, qs)


def q_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL dedup by canonical form: normalize every messy variant,
    group on the canonical key, keep the lowest doc_id per group and
    report the variant count and distinct RAW spellings collapsed.
    One shuffle on the canonical string; everything before it is
    whole-stage-codegen string work at the scan."""
    urls = synth_urls(spark, sf_dir)
    return (
        urls.select(
            "doc_id", "url", canonical_url(F.col("url")).alias("canon")
        )
        .groupBy("canon")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count("*").alias("n_variants"),
            F.count_distinct("url").alias("n_spellings"),
        )
    )


_LD_CHUNK = 4  # tokens per pseudo-line
_LD_DF_DENOM = 20  # boilerplate threshold: line in > N/20 docs


def plant_boilerplate(docs: DataFrame, n_lines: int = 1) -> DataFrame:
    """Fixture synthesis of web chrome: prepend ``n_lines`` per-class
    4-token pseudo-lines (K = doc_id % 5). Line 0 is the classic
    "subscribe to siteK now" header (q_line_dedup's fixture); lines
    1+ are "chromeJ siteK banner now" — together a cookie-banner-sized
    block. Every line is exactly one aligned pseudo-line, so a correct
    corpus-frequency cleaner removes the block and nothing else."""
    k = (F.col("doc_id") % 5).cast("string")
    parts: list = []
    for j in range(n_lines):
        if j == 0:
            parts += [F.lit("subscribe to site"), k, F.lit(" now ")]
        else:
            parts += [F.lit(f"chrome{j} site"), k, F.lit(" banner now ")]
    parts.append(F.col("text"))
    return docs.select("doc_id", F.concat(*parts).alias("text"))


def chunk_lines(docs: DataFrame) -> DataFrame:
    """(doc_id, text) → (doc_id, idx, line): aligned 4-token
    pseudo-lines in document order — the unit of corpus-frequency
    boilerplate detection (CCNet/RefinedWeb chunk analog for a corpus
    whose text carries no newlines)."""
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    return toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.size("t") / F.lit(_LD_CHUNK)).cast("int") - 1,
                ),
                lambda i: F.concat_ws(
                    " ", F.slice(F.col("t"), i * _LD_CHUNK + 1, _LD_CHUNK)
                ),
            )
        ).alias("idx", "line"),
    )


def strip_boilerplate(docs: DataFrame, n_docs: int) -> DataFrame:
    """Corpus-frequency line removal as a reusable (doc_id, text) →
    (doc_id, text) stage (VERDICT r8 item 5): lines with DF >
    n_docs/20 are dropped from every document, documents reassembled
    in order. This is the production pre-filter that belongs BEFORE
    near-dup hashing — shared chrome makes DIFFERENT documents
    band-collide, so LSH candidate counts on boilerplate-laden
    corpora are output-quadratic in the chrome's reach, not the true
    near-dup rate (the sf100 713M-pair explosion shape).

    Scale: one (line, doc_id) shuffle for the DF count; the boiler set
    is tiny by Zipf, so the removal join broadcasts; reassembly is a
    per-doc sorted collect bounded by document length. ``n_docs`` is a
    caller-supplied scalar (metadata-sized count job)."""
    chunks = chunk_lines(docs)
    dfreq = chunks.groupBy("line").agg(
        F.count_distinct("doc_id").alias("df")
    )
    boiler = dfreq.where(
        F.col("df") * _LD_DF_DENOM > F.lit(n_docs)
    ).select("line")
    flagged = chunks.join(
        F.broadcast(boiler.withColumn("is_b", F.lit(True))), "line", "left"
    )
    return flagged.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("is_b").isNull(), F.struct("idx", "line"))
                    )
                ),
                lambda s: s["line"],
            ),
        ).alias("text"),
    )


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level boilerplate line removal (the CCNet/RefinedWeb
    step: a LINE appearing in many documents is chrome — nav bars,
    cookie banners — not content, and is dropped from every document
    while unique lines stay). The corpus plants a per-class 4-token
    header ("subscribe to siteK now", K = doc_id % 5) in front of each
    document's text; detection is purely corpus-driven: documents are
    chunked into aligned 4-token pseudo-lines, a line's document
    frequency is counted corpus-wide, lines with DF > N/20 are removed
    everywhere, and each document is reassembled in order.

    Scale: the DF count shuffles (line-hash, doc_id) pairs once; the
    boilerplate set (lines above a 5% DF threshold) is tiny by
    construction — Zipf guarantees few lines are in >5% of a crawl —
    so the removal join broadcasts. Reassembly groups by doc_id with
    an order-preserving sorted collect, bounded by document length."""
    docs = parallelize(table(spark, sf_dir, "documents"), spark).select(
        "doc_id", "text"
    )
    aug = plant_boilerplate(docs)
    chunks = chunk_lines(aug)
    n_docs = docs.count()  # scalar corpus size (metadata-sized)
    dfreq = chunks.groupBy("line").agg(
        F.count_distinct("doc_id").alias("df")
    )
    boiler = dfreq.where(F.col("df") * _LD_DF_DENOM > F.lit(n_docs)).select(
        "line"
    )
    flagged = chunks.join(
        F.broadcast(boiler.withColumn("is_b", F.lit(True))), "line", "left"
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_lines"),
        F.count_if(F.col("is_b").isNotNull()).alias("n_removed"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("is_b").isNull(), F.struct("idx", "line"))
                    )
                ),
                lambda s: s["line"],
            ),
        ).alias("cleaned"),
    )


ORACLE: dict[str, str] = {
    "q_line_dedup": """
        WITH aug AS (
          SELECT doc_id,
                 'subscribe to site' || CAST(doc_id % 5 AS VARCHAR)
                 || ' now ' || text AS text
          FROM documents
        ), toks AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM aug
        ), chunks AS (
          SELECT doc_id, i.i AS idx,
                 array_to_string(t[i.i * 4 + 1 : i.i * 4 + 4], ' ') AS line
          FROM toks CROSS JOIN range(256) i(i)
          WHERE i.i < CAST(ceil(len(t) / 4.0) AS INTEGER)
        ), dfreq AS (
          SELECT line, count(DISTINCT doc_id) AS df FROM chunks GROUP BY line
        ), n AS (SELECT count(*) AS n_docs FROM documents),
        boiler AS (
          SELECT line FROM dfreq, n WHERE df * 20 > n_docs
        ), flagged AS (
          SELECT c.*, c.line IN (SELECT line FROM boiler) AS is_b
          FROM chunks c
        )
        SELECT doc_id,
               count(*) AS n_lines,
               count(*) FILTER (WHERE is_b) AS n_removed,
               coalesce(string_agg(line, ' ' ORDER BY idx)
                          FILTER (WHERE NOT is_b), '') AS cleaned
        FROM flagged
        GROUP BY doc_id
    """,
    "q_url_canonical": """
        -- independent canonicalizer: DuckDB string/list functions
        -- reproduce the same RFC-3986-subset normalization over the
        -- same deterministic messy-URL corpus
        WITH raw AS (
          SELECT doc_id,
                 (CASE WHEN doc_id % 5 = 0 THEN 'HTTPS://' ELSE 'https://' END)
              || (CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END)
              || 'site' || CAST(doc_id % 7 AS VARCHAR)
              || (CASE WHEN doc_id % 3 = 0 THEN '.COM' ELSE '.com' END)
              || (CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END)
              || '/p/' || CAST(doc_id % 11 AS VARCHAR)
              || (CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END)
              || (CASE WHEN doc_id % 2 = 0 THEN '?b=2&a=1' ELSE '?a=1&b=2' END)
              || (CASE WHEN doc_id % 8 = 0 THEN '&utm_source=u' ELSE '' END)
              || (CASE WHEN doc_id % 9 = 0 THEN '#sec' ELSE '' END) AS url
          FROM documents
        ), parts AS (
          SELECT doc_id, url,
                 lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
                 regexp_replace(regexp_replace(
                   lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)),
                   '^www\\.', ''), ':(443|80)$', '') AS host,
                 regexp_replace(
                   regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1),
                   '/+$', '') AS path,
                 list_sort(list_filter(
                   string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
                   p -> p <> '' AND NOT regexp_matches(p, '^(utm_|fbclid|gclid)')
                 )) AS params
          FROM raw
        ), canon AS (
          SELECT doc_id, url,
                 scheme || '://' || host || path
              || (CASE WHEN len(params) > 0
                       THEN '?' || array_to_string(params, '&')
                       ELSE '' END) AS canon
          FROM parts
        )
        SELECT canon, min(doc_id) AS keep_id, count(*) AS n_variants,
               count(DISTINCT url) AS n_spellings
        FROM canon GROUP BY canon
    """,
}
