"""Text analysis for LLM-training-data pipelines (SURVEY §2.9 X1-X3 +
north-star text ops): exact dedup, tokenization, corpus stats,
language-ID heuristic, quality scoring, token counting, document
fingerprinting.

All pure Catalyst expressions — `split`/`explode`/higher-order array
functions — so they codegen and scale linearly with no Python in the
hot path. At 100 TB the dominant cost is the explode-shuffle of
`q_text_tokenize`; partial aggregation collapses each partition's word
counts before the exchange, so the shuffle is ~|vocab| per partition,
not |tokens|."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import parallelize, table
from ..storage import ITER_STORAGE

# Tiny per-language stopword lists for the language-ID heuristic.
# Deterministic and mirrored literally in the DuckDB oracle.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "y", "que"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "de", "et", "est"],
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (documents fixture is space-separated)."""
    return F.split(text, " ")


def token_count(text: Column | str) -> Column:
    """Whitespace token count — the cheap `wc -w` analog."""
    return F.size(tokens(text)).cast("long")


def bpe_ish_piece_count(text: Column | str) -> Column:
    """BPE-ish sub-token estimate: count maximal runs of letters,
    digits, or single punctuation — a deterministic regex stand-in for
    a real BPE tokenizer (which isn't in this container)."""
    return F.size(F.regexp_extract_all(F.col(text) if isinstance(text, str) else text,
                                       F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0)).cast("long")


def stopword_hits(toks: Column, lang: str) -> Column:
    """How many tokens are stopwords of `lang`."""
    arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("long")


def quality_score(text: Column | str) -> Column:
    """Quality heuristic in [0,1]: mean-word-length band + stopword
    ratio + length band. Deterministic arithmetic, mirrored in SQL.

    The common column-name case builds the whole expression as ONE
    SQL string: constructing the lambda-HOF tree through the Python
    Column API costs ~0.5 s of py4j round-trips per call (measured),
    which dominated the composed pipelines' plan-build time. Both
    paths produce the same Catalyst expression."""
    if isinstance(text, str):
        sw = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
        ntok = f"cast(size(split({text}, ' ')) as double)"
        mean_wlen = f"((length({text}) - ({ntok} - 1)) / {ntok})"
        stop_ratio = (
            f"(cast(size(filter(split({text}, ' '), "
            f"x -> array_contains(array({sw}), x))) as double) / {ntok})"
        )
        return F.expr(
            f"round(0.4 * if({mean_wlen} >= 3 and {mean_wlen} <= 10, 1.0d, 0.0d)"
            f" + 0.3 * least({stop_ratio} * 5, 1.0d)"
            f" + 0.3 * if({ntok} >= 10 and {ntok} <= 1000, 1.0d, 0.0d)"
            f" + 1e-9, 4)"
        )
    t = text
    toks = tokens(t)
    n_tok = F.size(toks).cast("double")
    mean_wlen = (F.length(t) - (n_tok - 1)) / n_tok  # total chars minus spaces
    en_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop_ratio = F.size(F.filter(toks, lambda x: F.array_contains(en_stop, x))).cast("double") / n_tok
    # +1e-9 before round: ratios of small ints can land exactly on a
    # .00005 half-boundary where Spark's and DuckDB's round() disagree;
    # the identical nudge on both sides makes the choice consistent.
    return F.round(
        0.4 * F.when((mean_wlen >= 3) & (mean_wlen <= 10), 1.0).otherwise(0.0)
        + 0.3 * F.least(stop_ratio * 5, F.lit(1.0))
        + 0.3 * F.when((n_tok >= 10) & (n_tok <= 1000), 1.0).otherwise(0.0)
        + 1e-9,
        4,
    )


# ---------------------------------------------------------------------------
# Catalog queries
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup (X1): distinct (lang, source) pairs — `dropDuplicates`
    on the dedup key. Scale: hash-aggregate, map-side partials."""
    docs = table(spark, sf_dir, "documents")
    return docs.select("lang", "source").dropDuplicates()


def q_text_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize + top-10 words (X2): explode → count → total-ordered
    top-k (count desc, word asc)."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens("text")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word").asc())
        .limit(10)
    )


def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the token distribution — the
    lexical-diversity gate next to the repetition filter (low entropy
    = templated/repetitive text, a standard LLM-corpus quality
    signal). Computed as H = ln(N) − Σ c·ln(c) / N over per-word
    counts c, so ONE (doc, word) aggregate and one per-doc aggregate
    suffice — no per-word probability column, both shuffles on doc_id.

    MEASURED DEAD END (r8): a zero-shuffle rewrite (per-word counts
    as run lengths over each doc's sorted token array, one map-side
    higher-order expression) was 1.7× SLOWER at sf10 in interleaved
    A/B — Spark evaluates HOF lambda bodies interpreted, per element,
    while this exploded shape stays entirely inside whole-stage
    codegen's hash aggregation; the exchange it saves is cheaper than
    the codegen it gives up. Kept the shuffle shape (4×-per-decade
    sublinear through sf100). On a network-bound cluster the
    trade-off may invert; revisit only with a measured win there."""
    docs = table(spark, sf_dir, "documents")
    words = (
        docs.select("doc_id", F.explode(tokens("text")).alias("w"))
        .where(F.col("w") != "")
    )
    wc = words.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    n = F.sum("c")
    return wc.groupBy("doc_id").agg(
        n.cast("long").alias("n_tokens"),
        F.count("*").alias("vocab"),
        (
            F.round(
                F.log(n) - F.sum(F.col("c") * F.log("c")) / n + 1e-9, 4
            )
            + 0.0
        ).alias("entropy"),
    )


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats (X3)."""
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars") + 1e-9, 4).alias("avg_chars"),
    )


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (north star): whitespace tokens + BPE-ish pieces
    per document."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        bpe_ish_piece_count("text").alias("n_pieces"),
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (north star): argmax of stopword hits per
    language, priority order en > es > de > fr on ties, 'und'
    (undetermined) when no hits. Compared against nothing — it's a
    prediction — but the oracle replicates the identical rule."""
    docs = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    hits = {lang: stopword_hits(toks, lang) for lang in ("en", "es", "de", "fr")}
    best = F.greatest(*hits.values())
    pred = (
        F.when(best == 0, "und")
        .when(hits["en"] == best, "en")
        .when(hits["es"] == best, "es")
        .when(hits["de"] == best, "de")
        .otherwise("fr")
    )
    return docs.select("doc_id", pred.alias("pred_lang"))


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring (north star): deterministic heuristic in [0,1]."""
    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", quality_score("text").alias("quality"))


def _stop_sql(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"


def _hits_sql(lang: str) -> str:
    return (
        f"CAST(len(list_filter(string_split(text, ' '), "
        f"t -> list_contains({_stop_sql(lang)}, t))) AS BIGINT)"
    )


def quality_sql(src: str) -> str:
    """DuckDB SELECT of (doc_id, lang, text, quality) over relation
    ``src`` — the oracle twin of :func:`quality_score`, shared so
    composed pipelines (corpus curation) reuse the identical
    expression."""
    return f"""
        SELECT doc_id, lang, text,
               round(0.4 * (CASE WHEN mean_wlen BETWEEN 3 AND 10 THEN 1.0 ELSE 0.0 END)
                   + 0.3 * least(stop_ratio * 5, 1.0)
                   + 0.3 * (CASE WHEN n_tok BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.0 END)
                   + 1e-9,
                   4) AS quality
        FROM (
          SELECT doc_id, lang, text,
                 (length(text) - (n_tok - 1)) / n_tok AS mean_wlen,
                 CAST(len(list_filter(string_split(text, ' '),
                          t -> list_contains({_stop_sql("en")}, t))) AS DOUBLE)
                   / n_tok AS stop_ratio,
                 n_tok
          FROM (
            SELECT doc_id, lang, text,
                   CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok
            FROM {src}
          )
        )
    """


def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction: top-3 terms per document by
    tf·ln(N/df), ties broken by term.

    Scale shape: the *documents* table (not the exploded tokens) is
    shuffled once on doc_id; the explode, the (doc_id, term) counts and
    the per-doc top-3 window all run inside that one partitioning
    (hash(doc_id) satisfies both the grouping's and the window's
    ClusteredDistribution). Document frequency comes from a separate
    reduced branch and joins back as a broadcast — at vocab sizes past
    broadcast range this one join becomes the only shuffle-join."""
    docs = table(spark, sf_dir, "documents").repartition("doc_id")
    toks = docs.select(
        "doc_id", F.explode(tokens("text")).alias("term")
    ).where(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = toks.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    n_docs = table(spark, sf_dir, "documents").agg(
        F.count("*").alias("n_docs")
    )
    tfidf = F.col("tf") * F.log(F.col("n_docs") / F.col("df"))
    w = Window.partitionBy("doc_id").orderBy(
        tfidf.desc(), F.col("term").asc()
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(n_docs))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            "doc_id", "term", F.round(tfidf + 1e-9, 4).alias("tfidf")
        )
    )


# Let-bound repetition stats: `ws` (the token array) and `gs` (the
# 2-gram array) are bound as lambda variables via the
# get(transform(array(x), v -> body), 0) idiom — higher-order
# functions get NO codegen subexpression elimination, so a naive
# inline form would re-split the text once per array element
# (measured 4-6x on the shingle path). One F.expr string: building
# lambda HOFs through the Python Column API costs ~0.5 s of py4j
# per lambda.
_REPETITION = """
get(transform(array(split(text, ' ')), ws ->
  get(transform(array(
        if(size(ws) < 2, array(),
           array_sort(transform(sequence(1, size(ws) - 1),
                     i -> concat_ws(' ', slice(ws, i, 2)))))), sg ->
    get(transform(array(concat(array(1),
          filter(sequence(2, greatest(size(sg), 2)), i ->
            i <= size(sg) AND NOT (get(sg, i - 1) <=> get(sg, i - 2))))),
        st ->
      named_struct(
        'dup_word_frac',
          round(1.0d - size(array_distinct(ws)) / size(ws) + 1e-9, 4),
        'top2_frac',
          round(if(size(ws) < 2, 0.0d,
                   aggregate(sequence(1, size(st)), 0, (acc, k) ->
                     greatest(acc, cast(coalesce(get(st, k), size(sg) + 1)
                                        - element_at(st, k) as int)))
                   / (size(ws) - 1.0d)) + 1e-9, 4))), 0)), 0)), 0)
"""

_REPETITION_DUCK = """
  SELECT doc_id,
         round(1.0 - len(list_distinct(ws)) * 1.0 / len(ws) + 1e-9, 4)
           AS dup_word_frac,
         round(CASE WHEN len(ws) < 2 THEN 0.0
               ELSE list_max(list_transform(list_distinct(grams),
                      g -> len(list_filter(grams, x -> x = g)))) * 1.0
                    / (len(ws) - 1) END + 1e-9, 4) AS top2_frac
  FROM (
    SELECT doc_id, ws,
           CASE WHEN len(ws) < 2 THEN []
                ELSE list_transform(range(1, len(ws)),
                                    i -> ws[i] || ' ' || ws[i+1]) END AS grams
    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
  )
"""


def q_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality gate: per document, the
    duplicate-word fraction (1 − distinct/total) and the fraction of
    2-gram slots taken by the most frequent 2-gram; flag documents
    exceeding either threshold.

    Entirely map-side Catalyst expressions over the token array —
    zero shuffles, zero Python (plan-gated): at 100 TB this is a pure
    scan-speed filter.

    r8: the most-frequent-2-gram count is the LONGEST RUN in the
    sorted gram array (run starts = positions where the sorted array
    changes), O(n log n) per doc — the previous
    count-each-distinct-gram scan was O(n·distinct) interpreted
    per doc and dominated this query's wall (67 s at sf10)."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.withColumn("rep", F.expr(_REPETITION))
        .select(
            "doc_id",
            F.col("rep.dup_word_frac").alias("dup_word_frac"),
            F.col("rep.top2_frac").alias("top2_frac"),
        )
        .withColumn(
            "flagged",
            (F.col("dup_word_frac") > 0.6) | (F.col("top2_frac") > 0.05),
        )
    )


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring (the cheap perplexity stand-in):
    per document, mean ln p(token) under the corpus unigram
    distribution. Low scores mark out-of-distribution documents.

    Scale shape: the frequency table is a reduced aggregate
    (|vocab| rows) broadcast back into the token stream; documents are
    shuffled once on doc_id so the per-doc mean runs without another
    exchange."""
    docs = table(spark, sf_dir, "documents").repartition("doc_id")
    toks = docs.select(
        "doc_id", F.explode(tokens("text")).alias("term")
    ).where(F.col("term") != "")
    freq = (
        table(spark, sf_dir, "documents")
        .select(F.explode(tokens("text")).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )
    total = freq.agg(F.sum("cnt").alias("total"))
    return (
        toks.join(F.broadcast(freq), "term")
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.log(F.col("cnt") / F.col("total")))
                / F.count("*")
                + 1e-9,
                4,
            ).alias("logprob")
        )
    )


def _bigrams(text: Column | str) -> Column:
    """Adjacent token pairs 'a b' from the whitespace token stream —
    zip of the array against itself shifted by one (empty tokens
    filtered first so pairs never straddle a blank)."""
    arr = F.filter(tokens(text), lambda t: t != "")
    # clamp at 0: an empty/whitespace-only text tokenizes to n=0 and
    # slice(arr, 1, -1) is a runtime error in Spark, not an empty array
    n = F.greatest(F.size(arr) - 1, F.lit(0))
    return F.zip_with(
        F.slice(arr, 1, n),
        F.slice(arr, 2, n),
        lambda a, b: F.concat_ws(" ", a, b),
    )


def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model scoring with add-one smoothing: per
    document, mean ln P(w_i | w_{i-1}) where
    P(b|a) = (c_ab + 1) / (c_a + V) — one rung up the perplexity
    ladder from q_unigram_logprob, sensitive to word ORDER (a
    shuffled-word document keeps its unigram score but craters here —
    the template/spam signal unigrams miss).

    Scale shape: bigram and unigram frequency tables are reduced
    aggregates; the per-doc-bigram join keys are PRE-HASHED to 64-bit
    (xxhash64) before the exchange — the r6 decontamination-gram
    precedent (`hashing.py`): the corpus-sized shuffle carries 8-byte
    longs instead of ~25-byte bigram strings (~2.5× fewer exchange
    bytes on a network-bound cluster, cheaper hash-partitioning and
    sort-merge compares). A hash collision would merge two bigrams'
    counts; odds are ~n²/2⁶⁴ (≈2·10⁻⁵ at sf10's ~3·10⁷ distinct
    bigrams) and the string-keyed DuckDB oracle monitors exactness at
    every gate scale. Vocab size rides along as a 1-row cross join.
    Documents shorter than 2 tokens have no bigrams and drop out —
    mirrored by the oracle."""
    docs = table(spark, sf_dir, "documents")
    doc_bg = docs.select(
        "doc_id", F.explode(_bigrams("text")).alias("bg")
    ).select(
        "doc_id",
        F.xxhash64(F.col("bg")).alias("bg_h"),
        F.xxhash64(
            F.split_part(F.col("bg"), F.lit(" "), F.lit(1))
        ).alias("w1_h"),
    )
    corpus_bg = (
        table(spark, sf_dir, "documents")
        .select(F.explode(_bigrams("text")).alias("bg"))
        .groupBy(F.xxhash64(F.col("bg")).alias("bg_h"))
        .agg(F.count("*").alias("c_ab"))
    )
    uni = (
        table(spark, sf_dir, "documents")
        .select(F.explode(tokens("text")).alias("term"))
        .where(F.col("term") != "")
        .groupBy(F.xxhash64(F.col("term")).alias("term_h"))
        .agg(F.count("*").alias("c_a"))
    )
    vocab = uni.agg(F.count("*").alias("v"))
    scored = (
        doc_bg.join(corpus_bg, "bg_h")
        .join(uni, doc_bg.w1_h == uni.term_h)
        .join(F.broadcast(vocab))
        .select(
            "doc_id",
            F.log((F.col("c_ab") + 1) / (F.col("c_a") + F.col("v"))).alias(
                "lp"
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.sum("lp") / F.count("*") + 1e-9, 4).alias("logprob"),
    )


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-ranked vocabulary builder: tokens ordered by corpus
    frequency (ties by token), kept while cumulative coverage of the
    prefix *before* each token is under 90%.

    The global window runs on the REDUCED frequency table (|vocab|
    rows, bounded by the token domain, not the corpus), so the
    single-partition sort is deliberate and safe at any corpus size;
    the corpus-sized work is the one partial-aggregated explode
    shuffle that builds the table."""
    docs = table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(tokens("text")).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )
    total = freq.agg(F.sum("cnt").alias("total"))
    w = Window.orderBy(F.col("cnt").desc(), F.col("term").asc())
    return (
        freq.join(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w))
        .withColumn("cum", F.sum("cnt").over(w))
        .where((F.col("cum") - F.col("cnt")) < 0.9 * F.col("total"))
        .select(
            "term",
            "cnt",
            "rank",
            F.round(F.col("cum") / F.col("total") + 1e-9, 4).alias(
                "cum_share"
            ),
        )
    )


# PII patterns — RE2-safe (no backreferences/lookaround) so Java regex
# (Spark) and RE2 (DuckDB) match identically.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — the compliance pass every training-data
    pipeline runs before a corpus ships: emails → [EMAIL], phone
    numbers → [PHONE], IPv4 addresses → [IP], with per-doc match
    counts for the scrub report.

    The synthetic corpus carries no organic PII, so the query first
    ENRICHES each doc with deterministic doc_id-derived PII (both
    engines build the identical string), then scrubs it — the oracle
    therefore verifies the actual regex/replace semantics, not a
    vacuous no-op. All map-side built-ins (regexp_extract_all /
    regexp_replace), zero shuffle, scan-speed at any corpus size;
    the scrubbed text is equality-checked via the portable md5
    fingerprint, not shipped."""
    docs = table(spark, sf_dir, "documents")
    ds = F.col("doc_id").cast("string")
    enriched = F.concat(
        F.col("text"),
        F.lit(" contact user"), ds, F.lit("@example.com"),
        F.lit(" call 555-010-"), F.lpad(ds, 4, "0"),
        F.lit(" from 10.0."), (F.col("doc_id") % 256).cast("string"),
        F.lit("."), (F.col("doc_id") % 100).cast("string"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(enriched, _PII_EMAIL, "[EMAIL]"),
            _PII_PHONE,
            "[PHONE]",
        ),
        _PII_IP,
        "[IP]",
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(enriched, F.lit(_PII_EMAIL), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(enriched, F.lit(_PII_PHONE), 0))
        .cast("long")
        .alias("n_phones"),
        F.size(F.regexp_extract_all(enriched, F.lit(_PII_IP), 0))
        .cast("long")
        .alias("n_ips"),
        F.length(scrubbed).cast("long").alias("len_scrubbed"),
        F.conv(F.substring(F.md5(scrubbed), 1, 15), 16, 10)
        .cast("long")
        .alias("scrubbed_fp"),
    )


BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("data", "spark", "query")  # fixed retrieval query


PHRASE = ("data", "spark")  # fixed 2-term phrase query


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase search — the inverted-index operation BM25's
    bag-of-words scoring can't express: find documents containing the
    exact consecutive phrase "data spark" and count its occurrences
    per document. The plan builds POSITIONAL postings (term, doc,
    position) with posexplode, filters to the two phrase terms at scan
    speed (same pushdown stance as q_bm25), and self-joins postings on
    (doc, pos + 1 = pos) — adjacency as an equi-join, the classical
    distributed phrase-query evaluation. Shuffle carries only the two
    terms' postings, never the corpus."""
    docs = table(spark, sf_dir, "documents")
    posts = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "term"),
    ).where(F.col("term").isin(*PHRASE))
    a = posts.where(F.col("term") == PHRASE[0]).select(
        "doc_id", F.col("pos").alias("p0")
    )
    b = posts.where(F.col("term") == PHRASE[1]).select(
        "doc_id", F.col("pos").alias("p1")
    )
    return (
        a.join(b, ["doc_id"])
        .where(F.col("p1") == F.col("p0") + 1)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_occurrences"))
    )


def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval scoring of the corpus against a fixed 3-term
    query — the ranking function a curation pipeline uses to pull
    topical documents (e.g. seed-similar selection), and the
    classical sparse-retrieval baseline next to the dense kNN path.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)  (Robertson/Lucene).

    Scale shape: the token explode is filtered to the query terms
    BEFORE any shuffle (a 3-term IN predicate at scan speed), so the
    (doc, term) aggregate shuffles only matching postings — the
    inverted-index access pattern, not a corpus-wide shuffle. Doc
    lengths ride the same row; df (3 rows) and the N/avgdl scalars
    broadcast back."""
    docs = table(spark, sf_dir, "documents")
    stats = docs.select(
        F.count("*").alias("n_docs"),
        F.avg(F.size(F.split("text", " "))).alias("avgdl"),
    )
    posts = (
        docs.select(
            "doc_id",
            F.size(F.split("text", " ")).alias("dl"),
            F.explode(F.split("text", " ")).alias("term"),
        )
        .where(F.col("term").isin(*BM25_QUERY))
    )
    tf = posts.groupBy("doc_id", "term").agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl")
    )
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    term_score = (
        idf
        * F.col("tf")
        * (BM25_K1 + 1)
        / (
            F.col("tf")
            + BM25_K1
            * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    return (
        tf.join(F.broadcast(df_t), "term")
        .join(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.round(F.sum(term_score) + 1e-9, 4).alias("bm25"),
            F.count("*").alias("n_query_terms"),
        )
    )


CHUNK_TOKENS = 128
CHUNK_STRIDE = 96  # 32-token overlap between consecutive chunks


def q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-window chunking: split each document into overlapping
    token windows (128 tokens, stride 96) — the context-window
    preparation step between curation and tokenization in an LLM data
    pipeline.

    Map-side only: token array let-bound once, chunk starts from
    ``sequence(1, n, stride)`` (tail partials included), one generator
    explode — no shuffle, scan-parallel at any corpus size. Chunks
    are reported as (index, length, portable md5 fingerprint), so the
    oracle verifies exact chunk CONTENT without shipping text."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("ws"))
    chunks = toks.select(
        "doc_id",
        "ws",
        F.explode(
            F.sequence(F.lit(1), F.size("ws"), F.lit(CHUNK_STRIDE))
        ).alias("start"),
    )
    chunk = F.slice("ws", F.col("start"), F.lit(CHUNK_TOKENS))
    return chunks.select(
        "doc_id",
        ((F.col("start") - 1) / CHUNK_STRIDE).cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.conv(F.substring(F.md5(F.concat_ws(" ", chunk)), 1, 15), 16, 10)
        .cast("long")
        .alias("chunk_fp"),
    )


SUBSTR_W = 8  # tokens per dedup window
SUBSTR_DUP_FRAC = 0.2  # flag docs whose shared-window fraction reaches this


def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplicate detection (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", ACL'22): slide an
    8-token window over every document, fingerprint each window, and
    flag documents whose distinct windows are substantially shared
    with OTHER occurrences in the corpus — catching partial overlap
    (boilerplate, quoted passages) that whole-document hashing misses.

    Spark-first shape: window generation is a map-side generator
    explode (``sequence`` of starts + ``slice``), so the blow-up is
    linear in corpus token count and never leaves the scan stage. The
    only shuffles are window-hash scale: one distinct on
    (doc_id, window) and one count per window — both partially
    aggregated map-side. Full text never moves; only 32-hex-char
    fingerprints travel. At 100 TB the (doc, window) stream is ~token
    count × 32 B; hashing windows to int64 first would halve shuffle
    bytes (kept as md5 here for oracle portability).

    A window that repeats WITHIN one doc only does not flag it
    (per-doc distinct before counting); ``n_docs_with >= 2`` means
    two distinct documents share the window."""
    docs = parallelize(table(spark, sf_dir, "documents"), spark)
    toks = docs.select("doc_id", F.split("text", " ").alias("ws"))
    wins = (
        toks.select(
            "doc_id",
            "ws",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.size("ws") - (SUBSTR_W - 1), F.lit(1)),
                )
            ).alias("start"),
        )
        .select(
            "doc_id",
            F.md5(
                F.concat_ws(" ", F.slice("ws", F.col("start"), F.lit(SUBSTR_W)))
            ).alias("wh"),
        )
        .distinct()
    )
    # Window-count instead of groupBy+join-back: the per-window doc
    # count lands on each (doc, window) row in ONE exchange on `wh`
    # (vs aggregate + re-shuffle + join = two extra exchanges).
    counted = wins.withColumn(
        "n_docs_with", F.count("*").over(Window.partitionBy("wh"))
    )
    shared = F.sum(F.when(F.col("n_docs_with") >= 2, 1).otherwise(0)).cast("long")
    frac = F.round(shared / F.count("*") + F.lit(1e-9), 4)
    return counted.groupBy("doc_id").agg(
        F.count("*").alias("n_windows"),
        shared.alias("n_shared"),
        frac.alias("dup_frac"),
        (frac >= SUBSTR_DUP_FRAC).alias("flagged"),
    )


FUZZY_PREFIX = 48  # chars of prefix compared
FUZZY_MAX_DIST = 25  # emit pairs at or under this edit distance
FUZZY_WINDOW = 8  # sorted-neighborhood width (pairs per doc)


def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy duplicate pairs by edit distance via the Sorted
    Neighborhood Method (Hernández & Stolfo, SIGMOD '95): sort each
    language's documents by their 48-char prefix and compare every
    document against its next `FUZZY_WINDOW` sort neighbors, emitting
    pairs within levenshtein distance 25 — record linkage / near-dup
    confirmation on short fields.

    The round-3 version blocked on (lang, first token); at 10× data
    its within-block pair count grew 100× (measured 371 s at sf1 —
    the quadratic survives inside any block whose size scales with
    the corpus). SNM makes the candidate count N·W BY CONSTRUCTION,
    independent of how similarity mass clusters: near-identical
    prefixes are sort-adjacent, so a fixed window catches them while
    total work stays linear. Candidate generation is a lead() window
    — NO join at all: one sort shuffle, then map-side lead + filter;
    ``levenshtein`` runs JVM-side on 48-char prefixes. Recall is
    bounded by the window (the published multi-pass variant re-sorts
    on a second key; the SimHash/MinHash entries are those other
    passes here). The lang partitioning is 5 keys at this sf; at
    100 TB you range-partition on the full (lang, p) sort key into
    thousands of splits and carry only W rows of overlap per split
    boundary (the parallel-SNM refinement).

    Emits (doc_a < doc_b, lang, dist)."""
    docs = table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "lang",
        F.substring("text", 1, FUZZY_PREFIX).alias("p"),
    )
    w = Window.partitionBy("lang").orderBy("p", "doc_id")
    led = d.select(
        "doc_id",
        "lang",
        "p",
        *[
            c
            for k in range(1, FUZZY_WINDOW + 1)
            for c in (
                F.lead("doc_id", k).over(w).alias(f"nbr{k}"),
                F.lead("p", k).over(w).alias(f"np{k}"),
            )
        ],
    )
    neigh = F.array(
        *[
            F.struct(
                F.col(f"nbr{k}").alias("nbr"), F.col(f"np{k}").alias("np")
            )
            for k in range(1, FUZZY_WINDOW + 1)
        ]
    )
    dist = F.levenshtein("p", F.col("n.np"))
    return (
        led.select("doc_id", "lang", "p", F.explode(neigh).alias("n"))
        .where(F.col("n.nbr").isNotNull() & (dist <= FUZZY_MAX_DIST))
        .select(
            F.least("doc_id", F.col("n.nbr")).alias("doc_a"),
            F.greatest("doc_id", F.col("n.nbr")).alias("doc_b"),
            "lang",
            dist.cast("long").alias("dist"),
        )
    )


BPE_ROUNDS = 3


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training (Sennrich et al. '16), the first
    BPE_ROUNDS merge rules learned from the corpus — the missing
    piece between q_token_count's BPE-ish *application* regex and an
    actual learned subword vocabulary.

    Trains on the REDUCED word-type/frequency table (the classic
    distributed formulation: corpora have billions of tokens but only
    millions of word types, so everything after the first groupBy is
    dimension-scale). Each round is:
      1. adjacent symbol pairs per word type (map-side array zip),
         weighted by word frequency → one combinable aggregate;
      2. argmax pair (count desc, then lexicographic — deterministic)
         → a 1-row driver collect (bounded, like k-means centroids);
      3. greedy left-to-right merge application as an `aggregate` HOF
         fold carrying (output-array, skip-flag) — the skip flag
         consumes the right symbol of a merged pair so overlapping
         occurrences merge non-overlapping, exactly reference BPE.
    Pair counting counts per-position (overlapping) occurrences, also
    matching the reference implementation.

    The oracle replays the identical rounds in DuckDB: same
    char-split, same per-position pair counts, same tie-break, and
    the same greedy fold via list_reduce with a string-encoded
    (skip, output) accumulator (DuckDB lambdas fold scalars, not
    structs — same spelling stance as the EWMA oracle).

    Emits (round, lhs, rhs, pair_count)."""
    out_rows, _ = _train_bpe(spark, sf_dir)
    return spark.createDataFrame(
        out_rows, "round INT, lhs STRING, rhs STRING, pair_count BIGINT"
    )


def _train_bpe(spark: SparkSession, sf_dir: str):
    """Shared BPE trainer: returns (merge rows, the word-type frame
    with post-merge symbol arrays) — q_bpe_merges reports the rules,
    q_bpe_encode applies the final segmentation back to documents."""
    docs = table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .persist(ITER_STORAGE)
    )
    syms = F.expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
    )
    cur = words.select("word", "freq", syms.alias("syms"))

    out_rows: list[tuple[int, str, str, int]] = []
    for rnd in range(1, BPE_ROUNDS + 1):
        pairs = cur.select(
            "freq",
            F.explode(
                # sequence(1, 0) counts DOWN in Spark — guard 1-symbol
                # words (q_bigram_logprob's r3 advice, same trap)
                F.expr(
                    "CASE WHEN size(syms) < 2 THEN"
                    "  cast(array() as array<struct<l: string, r: string>>)"
                    " ELSE transform(sequence(1, size(syms) - 1),"
                    "   i -> struct(element_at(syms, i) AS l,"
                    "               element_at(syms, i + 1) AS r)) END"
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc())
            .head()
        )
        if top is None:  # corpus ran dry (all words fully merged)
            break
        a, b, cnt = top["l"], top["r"], int(top["cnt"])
        out_rows.append((rnd, a, b, cnt))
        merged = F.expr(
            f"""aggregate(
              transform(sequence(1, size(syms)),
                        i -> struct(element_at(syms, i) AS cur,
                                    try_element_at(syms, i + 1) AS nxt)),
              struct(cast(array() as array<string>) AS out, false AS skip),
              (acc, p) -> CASE
                WHEN acc.skip THEN struct(acc.out AS out, false AS skip)
                WHEN p.cur = '{a}' AND p.nxt = '{b}'
                  THEN struct(concat(acc.out, array(concat(p.cur, p.nxt)))
                                AS out,
                              true AS skip)
                ELSE struct(concat(acc.out, array(p.cur)) AS out,
                            false AS skip) END,
              acc -> acc.out)"""
        )
        cur = cur.select("word", "freq", merged.alias("syms"))
    words.unpersist()
    return out_rows, cur


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLICATION — the other half of q_bpe_merges:
    train the same 3 merge rules, then encode every document with the
    resulting segmentation and report per-document token accounting
    (words, characters, BPE pieces, chars-per-piece compression).

    The distributed shape is the important part: the trained
    segmentation lives on the WORD-TYPE table (dimension-scale — a
    corpus has billions of tokens but only millions of types), so
    encoding a document is explode-words → BROADCAST join against the
    type→piece-count map → per-doc re-aggregate. No UDF tokenizer, no
    per-row Python; at 100 TB the only data-scale work is the word
    explode, and the join side that moves is the small one. The
    oracle replays the identical merges in DuckDB (the q_bpe_merges
    unrolled CTEs) and re-derives every document's piece counts."""
    _, typed = _train_bpe(spark, sf_dir)
    pieces = typed.select("word", F.size("syms").alias("n_pieces_word"))
    docs = table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).where(F.col("word") != "")
    return (
        words.join(F.broadcast(pieces), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.length("word")).alias("n_chars"),
            F.sum("n_pieces_word").alias("n_pieces"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_chars",
            "n_pieces",
            F.round(
                F.col("n_chars") / F.col("n_pieces") + F.lit(1e-9), 4
            ).alias("chars_per_piece"),
        )
    )


def _bpe_oracle() -> str:
    """Unrolled BPE rounds. s{r} holds (word, freq, syms) after r
    merges; m{r} is the round-r winning pair (1 row)."""
    ctes = _bpe_ctes()
    sel = " UNION ALL ".join(
        f"SELECT {r} AS round, l AS lhs, rr AS rhs, cnt AS pair_count FROM m{r}"
        for r in range(1, BPE_ROUNDS + 1)
    )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT * FROM ({sel}) ORDER BY round"


def _bpe_encode_oracle() -> str:
    """Re-derive every document's BPE piece counts from the final
    word-type segmentation s{BPE_ROUNDS} of the unrolled trainer."""
    ctes = _bpe_ctes()
    r = BPE_ROUNDS
    ctes.append(
        f"wp AS (SELECT word, len(syms) AS n_pieces_word FROM s{r})"
    )
    ctes.append(
        """dw AS (
          SELECT doc_id, word FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents
          ) WHERE word <> ''
        )"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
        SELECT dw.doc_id,
               count(*) AS n_words,
               CAST(sum(length(dw.word)) AS BIGINT) AS n_chars,
               CAST(sum(wp.n_pieces_word) AS BIGINT) AS n_pieces,
               round(CAST(sum(length(dw.word)) AS DOUBLE)
                     / sum(wp.n_pieces_word) + 1e-9, 4) AS chars_per_piece
        FROM dw JOIN wp ON dw.word = wp.word
        GROUP BY dw.doc_id"""
    )


def _bpe_ctes() -> list[str]:
    ctes = [
        """w AS (
          SELECT word, count(*) AS freq FROM (
            SELECT unnest(string_split(text, ' ')) AS word FROM documents
          ) WHERE word <> '' GROUP BY word
        )""",
        """s0 AS (
          SELECT word, freq,
                 list_transform(range(1, length(word) + 1),
                                i -> substr(word, i, 1)) AS syms
          FROM w
        )""",
    ]
    for r in range(1, BPE_ROUNDS + 1):
        p = r - 1
        ctes.append(
            f"""m{r} AS (
              SELECT l, rr, cnt FROM (
                SELECT syms[i] AS l, syms[i + 1] AS rr,
                       CAST(sum(freq) AS BIGINT) AS cnt
                FROM s{p}, unnest(range(1, len(syms))) AS t(i)
                GROUP BY 1, 2
              ) ORDER BY cnt DESC, l ASC, rr ASC LIMIT 1
            )"""
        )
        ctes.append(
            f"""s{r} AS (
              SELECT word, freq,
                     list_filter(string_split(substr(list_reduce(
                       ['INIT0'] || list_transform(range(1, len(syms) + 1),
                         i -> syms[i] || chr(30) || coalesce(syms[i + 1], '')),
                       (acc, x) -> CASE
                         WHEN substr(acc, 5, 1) = '1'
                           THEN substr(acc, 1, 4) || '0' || substr(acc, 6)
                         WHEN split_part(x, chr(30), 1) = m{r}.l
                              AND split_part(x, chr(30), 2) = m{r}.rr
                           THEN substr(acc, 1, 4) || '1' || substr(acc, 6)
                                || chr(31) || split_part(x, chr(30), 1)
                                || split_part(x, chr(30), 2)
                         ELSE substr(acc, 1, 4) || '0' || substr(acc, 6)
                              || chr(31) || split_part(x, chr(30), 1)
                       END), 6), chr(31)), s -> s <> '') AS syms
              FROM s{p}, m{r}
            )"""
        )
    return ctes


_BM25_TERMS = ", ".join(f"'{t}'" for t in BM25_QUERY)

ORACLE: dict[str, str] = {
    "q_phrase_search": """
        WITH posts AS (
          SELECT doc_id, t.i - 1 AS pos, toks[t.i] AS term
          FROM (SELECT doc_id, string_split(text, ' ') AS toks
                FROM documents),
               unnest(range(1, len(toks) + 1)) AS t(i)
          WHERE toks[t.i] IN ('data', 'spark')
        )
        SELECT a.doc_id, count(*) AS n_occurrences
        FROM posts a JOIN posts b
          ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        WHERE a.term = 'data' AND b.term = 'spark'
        GROUP BY a.doc_id
    """,
    "q_bpe_merges": _bpe_oracle(),
    "q_bpe_encode": _bpe_encode_oracle(),
    "q_bm25": f"""
        WITH stats AS (
          SELECT count(*) AS n_docs,
                 avg(len(string_split(text, ' '))) AS avgdl
          FROM documents
        ), posts AS (
          SELECT doc_id, len(string_split(text, ' ')) AS dl,
                 unnest(string_split(text, ' ')) AS term
          FROM documents
        ), tf AS (
          SELECT doc_id, term, count(*) AS tf, min(dl) AS dl
          FROM posts WHERE term IN ({_BM25_TERMS})
          GROUP BY doc_id, term
        ), dft AS (
          SELECT term, count(*) AS df FROM tf GROUP BY term
        )
        SELECT doc_id,
               round(sum(
                 ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                 * tf * ({BM25_K1} + 1)
                 / (tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl / avgdl))
               ) + 1e-9, 4) AS bm25,
               count(*) AS n_query_terms
        FROM tf JOIN dft USING (term) CROSS JOIN stats
        GROUP BY doc_id
    """,
    "q_pii_scrub": f"""
        WITH enriched AS (
          SELECT doc_id,
                 text || ' contact user' || CAST(doc_id AS VARCHAR)
                      || '@example.com'
                      || ' call 555-010-' || lpad(CAST(doc_id AS VARCHAR), 4, '0')
                      || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                      || '.' || CAST(doc_id % 100 AS VARCHAR) AS t
          FROM documents
        ), scrub AS (
          SELECT doc_id, t,
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(t, '{_PII_EMAIL}', '[EMAIL]', 'g'),
                     '{_PII_PHONE}', '[PHONE]', 'g'),
                   '{_PII_IP}', '[IP]', 'g') AS s
          FROM enriched
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(t, '{_PII_EMAIL}')) AS BIGINT)
                 AS n_emails,
               CAST(len(regexp_extract_all(t, '{_PII_PHONE}')) AS BIGINT)
                 AS n_phones,
               CAST(len(regexp_extract_all(t, '{_PII_IP}')) AS BIGINT)
                 AS n_ips,
               CAST(length(s) AS BIGINT) AS len_scrubbed,
               CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) AS scrubbed_fp
        FROM scrub
    """,
    "q_chunk_docs": f"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ), starts AS (
          SELECT doc_id, ws, unnest(range(1, len(ws) + 1, {CHUNK_STRIDE}))
                   AS start
          FROM toks
        )
        SELECT doc_id,
               CAST((start - 1) // {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
               CAST(len(ws[start : least(start + {CHUNK_TOKENS - 1}, len(ws))])
                    AS BIGINT) AS n_chunk_tokens,
               CAST('0x' || substr(md5(array_to_string(
                      ws[start : least(start + {CHUNK_TOKENS - 1}, len(ws))],
                      ' ')), 1, 15) AS BIGINT) AS chunk_fp
        FROM starts
    """,
    "q_tfidf": """
        WITH toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS term
          FROM documents
        ), tf AS (
          SELECT doc_id, term, count(*) AS tf FROM toks
          WHERE term <> '' GROUP BY 1, 2
        ), dfreq AS (
          SELECT term, count(DISTINCT doc_id) AS df FROM toks
          WHERE term <> '' GROUP BY 1
        ), n AS (SELECT count(*) AS n_docs FROM documents)
        SELECT doc_id, term,
               round(tf * ln(n_docs * 1.0 / df) + 1e-9, 4) AS tfidf
        FROM (
          SELECT tf.doc_id, tf.term, tf.tf, dfreq.df, n.n_docs,
                 row_number() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY tf.tf * ln(n.n_docs * 1.0 / dfreq.df) DESC,
                            tf.term ASC) AS rn
          FROM tf JOIN dfreq USING (term) CROSS JOIN n
        ) WHERE rn <= 3
    """,
    "q_repetition_filter": f"""
        SELECT doc_id, dup_word_frac, top2_frac,
               (dup_word_frac > 0.6 OR top2_frac > 0.05) AS flagged
        FROM ({_REPETITION_DUCK})
    """,
    "q_unigram_logprob": """
        WITH toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS term
          FROM documents
        ), freq AS (
          SELECT term, count(*) AS cnt FROM toks
          WHERE term <> '' GROUP BY 1
        ), tot AS (SELECT sum(cnt) AS total FROM freq)
        SELECT doc_id,
               round(sum(ln(cnt * 1.0 / total)) / count(*) + 1e-9, 4)
                 AS logprob
        FROM toks JOIN freq USING (term) CROSS JOIN tot
        WHERE toks.term <> ''
        GROUP BY doc_id
    """,
    "q_bigram_logprob": """
        WITH bigr AS (
          SELECT doc_id, bg FROM (
            SELECT doc_id,
                   unnest(list_transform(
                     list_zip(toks[1:len(toks)-1], toks[2:]),
                     p -> p[1] || ' ' || p[2])) AS bg
            FROM (
              SELECT doc_id,
                     list_filter(string_split(text, ' '), t -> t <> '') AS toks
              FROM documents
            )
          )
        ), cbg AS (
          SELECT bg, count(*) AS c_ab FROM bigr GROUP BY bg
        ), uni AS (
          SELECT term, count(*) AS c_a FROM (
            SELECT unnest(string_split(text, ' ')) AS term FROM documents
          ) WHERE term <> '' GROUP BY term
        ), voc AS (SELECT count(*) AS v FROM uni)
        SELECT doc_id,
               count(*) AS n_bigrams,
               round(sum(ln((c_ab + 1) * 1.0 / (c_a + v))) / count(*) + 1e-9, 4)
                 AS logprob
        FROM bigr
        JOIN cbg USING (bg)
        JOIN uni ON string_split(bigr.bg, ' ')[1] = uni.term
        CROSS JOIN voc
        GROUP BY doc_id
    """,
    "q_vocab_coverage": """
        WITH freq AS (
          SELECT term, count(*) AS cnt FROM (
            SELECT unnest(string_split(text, ' ')) AS term FROM documents
          ) WHERE term <> '' GROUP BY 1
        ), tot AS (SELECT sum(cnt) AS total FROM freq)
        SELECT term, cnt, rank,
               round(cum * 1.0 / total + 1e-9, 4) AS cum_share
        FROM (
          SELECT term, cnt, total,
                 row_number() OVER (ORDER BY cnt DESC, term ASC) AS rank,
                 sum(cnt) OVER (ORDER BY cnt DESC, term ASC
                                ROWS UNBOUNDED PRECEDING) AS cum
          FROM freq CROSS JOIN tot
        ) WHERE (cum - cnt) < 0.9 * total
    """,
    "q_dedup_exact": "SELECT DISTINCT lang, source FROM documents",
    "q_text_tokenize": """
        SELECT word, count(*) AS cnt FROM (
          SELECT unnest(string_split(text, ' ')) AS word FROM documents
        ) WHERE word <> ''
        GROUP BY word ORDER BY cnt DESC, word ASC LIMIT 10
    """,
    "q_text_stats": """
        SELECT lang, count(*) AS n_docs, round(avg(n_chars) + 1e-9, 4) AS avg_chars
        FROM documents GROUP BY lang
    """,
    "q_token_entropy": """
        WITH wc AS (
          SELECT doc_id, w, count(*) AS c FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
          ) WHERE w <> ''
          GROUP BY doc_id, w
        )
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_tokens,
               count(*) AS vocab,
               round(ln(sum(c)) - sum(c * ln(c)) / sum(c) + 1e-9, 4)
                 + 0.0 AS entropy
        FROM wc GROUP BY doc_id
    """,
    "q_token_count": r"""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))
                    AS BIGINT) AS n_pieces
        FROM documents
    """,
    "q_lang_id": f"""
        SELECT doc_id,
               CASE WHEN best = 0 THEN 'und'
                    WHEN h_en = best THEN 'en'
                    WHEN h_es = best THEN 'es'
                    WHEN h_de = best THEN 'de'
                    ELSE 'fr' END AS pred_lang
        FROM (
          SELECT doc_id, h_en, h_es, h_de, h_fr,
                 greatest(h_en, h_es, h_de, h_fr) AS best
          FROM (
            SELECT doc_id,
                   {_hits_sql("en")} AS h_en,
                   {_hits_sql("es")} AS h_es,
                   {_hits_sql("de")} AS h_de,
                   {_hits_sql("fr")} AS h_fr
            FROM documents
          )
        )
    """,
    "q_quality_score": f"""
        SELECT doc_id, quality FROM ({quality_sql("documents")})
    """,
    "q_substring_dedup": f"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ), wins AS (
          SELECT DISTINCT doc_id,
                 md5(array_to_string(ws[start : start + {SUBSTR_W - 1}], ' '))
                   AS wh
          FROM (
            SELECT doc_id, ws,
                   unnest(range(1, greatest(len(ws) - {SUBSTR_W - 1}, 1) + 1))
                     AS start
            FROM toks
          )
        ), cnt AS (
          SELECT wh, count(*) AS n_docs_with FROM wins GROUP BY wh
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_windows,
               CAST(sum(CASE WHEN n_docs_with >= 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_shared,
               round(sum(CASE WHEN n_docs_with >= 2 THEN 1 ELSE 0 END) * 1.0
                     / count(*) + 1e-9, 4) AS dup_frac,
               round(sum(CASE WHEN n_docs_with >= 2 THEN 1 ELSE 0 END) * 1.0
                     / count(*) + 1e-9, 4) >= {SUBSTR_DUP_FRAC} AS flagged
        FROM wins JOIN cnt USING (wh)
        GROUP BY doc_id
    """,
    "q_fuzzy_match": f"""
        WITH d AS (
          SELECT doc_id, lang, substr(text, 1, {FUZZY_PREFIX}) AS p
          FROM documents
        ), led AS (
          SELECT doc_id, lang, p,
                 {", ".join(
                     f"lead(doc_id, {k}) OVER w AS nbr{k}, "
                     f"lead(p, {k}) OVER w AS np{k}"
                     for k in range(1, FUZZY_WINDOW + 1))}
          FROM d
          WINDOW w AS (PARTITION BY lang ORDER BY p, doc_id)
        ), pairs AS (
          {" UNION ALL ".join(
              f"SELECT doc_id, lang, p, nbr{k} AS nbr, np{k} AS np FROM led"
              for k in range(1, FUZZY_WINDOW + 1))}
        )
        SELECT least(doc_id, nbr) AS doc_a,
               greatest(doc_id, nbr) AS doc_b,
               lang,
               CAST(levenshtein(p, np) AS BIGINT) AS dist
        FROM pairs
        WHERE nbr IS NOT NULL AND levenshtein(p, np) <= {FUZZY_MAX_DIST}
    """,
}
