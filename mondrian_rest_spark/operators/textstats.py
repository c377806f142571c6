"""Text analysis operators for training-data pipelines: token counting,
quality scoring, language ID (n-gram/stopword heuristic), and document
fingerprinting.  All built-in Spark SQL functions — no Python UDFs —
so they run inside whole-stage codegen and scale linearly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# Tiny per-language stopword lists for the heuristic language ID.
# Deliberately simple + deterministic (SQL-replicable for the oracle).
STOPWORDS = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "for", "was"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ich", "ein", "zu", "mit"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"),
    "es": ("el", "la", "los", "las", "es", "un", "una", "que", "por", "para"),
}

TOKEN_SPLIT = r"\s+"


def with_tokens(df: DataFrame, text_col: str = "text",
                out_col: str = "__tokens") -> DataFrame:
    return df.withColumn(out_col, F.split(F.trim(F.col(text_col)), TOKEN_SPLIT))


def token_stats(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Per-document token statistics: whitespace token count, a BPE-ish
    subword estimate (word-piece regex), char count, mean token length."""
    d = with_tokens(df, text_col)
    return d.select(
        F.col(id_col),
        F.size("__tokens").alias("n_tokens"),
        # BPE-ish proxy: alpha runs + digit runs + punctuation are
        # separate pieces (cheap deterministic stand-in for a real BPE)
        F.size(F.expr(
            f"filter(split({text_col}, '[^A-Za-z0-9]+'), x -> x <> '')"
        )).alias("n_subword_pieces"),
        F.length(text_col).alias("n_chars_measured"),
        F.round(F.length(text_col) / F.size("__tokens"), 6).alias("chars_per_token"),
    )


def with_quality_columns(df: DataFrame,
                         text_col: str = "text") -> DataFrame:
    """APPEND the quality-heuristic columns (n_tokens, punct_ratio,
    stopword_ratio, mean_word_len, quality) to ``df`` — the
    composable per-row form (r14 optimization round): pipelines that
    need quality AND other per-row signals stack these with_* helpers
    on ONE frame instead of joining each operator's select back by id
    (each such join re-executes the whole upstream lineage and adds a
    shuffle — clean_corpus paid the dedup pipeline 3x that way)."""
    d = with_tokens(df, text_col)
    en = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    d = d.withColumns({
        "n_tokens": F.size("__tokens"),
        "punct_ratio": F.round(
            F.length(F.regexp_replace(F.col(text_col), r"[^.,;:!?]", "")) /
            F.greatest(F.length(text_col), F.lit(1)), 6),
        "stopword_ratio": F.round(
            F.expr(f"size(filter(__tokens, t -> t in ({en})))") /
            F.greatest(F.size("__tokens"), F.lit(1)), 6),
        "mean_word_len": F.round(
            F.expr("aggregate(__tokens, 0L, (acc, t) -> acc + length(t))") /
            F.greatest(F.size("__tokens"), F.lit(1)), 6)})
    score = (F.when(F.col("n_tokens") >= 10, F.lit(0.25)).otherwise(F.lit(0.0)) +
             F.when(F.col("punct_ratio") <= 0.1, F.lit(0.25)).otherwise(F.lit(0.0)) +
             F.when(F.col("mean_word_len").between(3, 12), F.lit(0.25)).otherwise(F.lit(0.0)) +
             F.when(F.col("stopword_ratio") >= 0.02, F.lit(0.25)).otherwise(F.lit(0.0)))
    return d.withColumn("quality", F.round(score, 2))


def quality_score(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Composite quality heuristics: length, punctuation density,
    stopword ratio, mean word length — the classic cheap pre-filters in
    a training-data pipeline."""
    return with_quality_columns(df, text_col).select(
        id_col, "n_tokens", "punct_ratio", "stopword_ratio",
        "mean_word_len", "quality")


def with_language_columns(df: DataFrame,
                          text_col: str = "text") -> DataFrame:
    """APPEND the language-ID columns ({lang}_hits, predicted_lang) —
    see with_quality_columns for why the appending form exists."""
    d = with_tokens(df, text_col)
    hits = {}
    for lang, words in STOPWORDS.items():
        lst = ", ".join(f"'{w}'" for w in words)
        hits[f"{lang}_hits"] = F.expr(
            f"size(array_intersect(__tokens, array({lst})))")
    d = d.withColumns(hits)
    best = F.greatest(*[F.col(f"{l}_hits") for l in STOPWORDS])
    pred = (F.when(best == 0, F.lit("unknown")))
    for lang in STOPWORDS:  # fixed priority order resolves ties
        pred = pred.when(F.col(f"{lang}_hits") == best, F.lit(lang))
    return d.withColumn("predicted_lang", pred)


def language_id(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: count distinct stopword hits per language,
    argmax with a fixed priority order (en > de > fr > es > unknown).
    Deterministic and SQL-replicable; a real pipeline would swap in a
    fastText-style model behind the same column contract."""
    return with_language_columns(df, text_col).select(
        id_col, *[f"{l}_hits" for l in STOPWORDS], "predicted_lang")


def fingerprint(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: md5 over whitespace-normalized, lowercased
    text — stable across engines (md5 is standardized), used as the
    exact-dedup key and as a cheap content id."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return df.select(id_col, F.md5(norm).alias("fingerprint"))


def top_tokens(df: DataFrame, k: int = 20, text_col: str = "text") -> DataFrame:
    """Corpus-wide top-k tokens by occurrence count (vocabulary head
    inspection — the first thing to look at before training a
    tokenizer).  explode -> hash-agg -> TakeOrdered: the shuffle moves
    one row per distinct token, and orderBy+limit never sorts the full
    vocabulary.  Deterministic tie-break on the token string."""
    ex = (df.select(F.explode(F.split(F.trim(F.col(text_col)), r"\s+"))
                    .alias("token"))
            .filter(F.col("token") != ""))
    return (ex.groupBy("token")
              .agg(F.count(F.lit(1)).alias("occurrences"))
              .orderBy(F.desc("occurrences"), F.asc("token"))
              .limit(k))


def length_histogram(df: DataFrame, bucket_tokens: int = 50,
                     text_col: str = "text") -> DataFrame:
    """Document-length histogram in fixed-width token buckets
    (corpus shape report: truncation/padding decisions come from
    this).  One projection + one hash-agg; bucket_lo is the bucket's
    inclusive lower bound in tokens."""
    n = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    lo = (F.floor(n / bucket_tokens) * bucket_tokens).cast("long")
    return (df.select(lo.alias("bucket_lo"))
              .groupBy("bucket_lo")
              .agg(F.count(F.lit(1)).alias("n_docs"))
              .orderBy("bucket_lo"))


def source_stats(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 source_col: str = "source") -> DataFrame:
    """Per-source corpus report: doc count, token volume, mean quality
    — the table that decides which sources to up/down-weight in a mix.
    One quality pass joined to the source column, one hash-agg."""
    # one scan: quality columns stack on the frame that already holds
    # the source column (r14; the id re-join form scanned twice)
    qs = with_quality_columns(df, text_col)
    return (qs
            .groupBy(source_col)
            .agg(F.count(id_col).alias("n_docs"),
                 F.sum("n_tokens").alias("total_tokens"),
                 F.round(F.sum(F.col("quality").cast("decimal(25,6)"))
                          .cast("double") / F.count(id_col), 6)
                  .alias("mean_quality"))
            .orderBy(source_col))


def language_confusion(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       truth_col: str = "lang") -> DataFrame:
    """Confusion counts (true lang, predicted lang, n_docs) for the
    heuristic language classifier against the table's ground-truth
    column — the evaluation every heuristic gate needs before it is
    trusted to filter a corpus."""
    # one scan: predicted_lang stacks beside the ground-truth column
    # (r14; the id re-join form scanned twice)
    return (with_language_columns(df, text_col)
            .withColumn("true_lang", F.col(truth_col))
            .groupBy("true_lang", "predicted_lang")
            .agg(F.count(id_col).alias("n_docs"))
            .orderBy("true_lang", "predicted_lang"))


def corpus_stats(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """One-row corpus report (the dashboard query a training-data
    pipeline runs after every ingest): document count, total token
    count, mean quality and per-language document counts.

    ONE scan of the (id, text) projection (r14: quality and language
    are per-row projections stacked on the same frame — the previous
    two-scan + id-join shape paid a shuffle for nothing), then a
    single partial+final global aggregate.  The quality mean goes
    through DECIMAL so it is partition-order independent
    (hash-matches the DuckDB oracle)."""
    j = with_language_columns(with_quality_columns(df, text_col), text_col)
    return j.agg(
        F.count(id_col).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.sum(F.col("quality").cast("decimal(25,6)")).cast("double") /
                F.count(id_col), 6).alias("mean_quality"),
        *[F.sum(F.when(F.col("predicted_lang") == lang, 1).otherwise(0))
            .alias(f"n_{lang}")
          for lang in (*STOPWORDS, "unknown")])


def repetition_ratio(df: DataFrame, n: int = 3, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Within-document n-gram repetition: 1 - distinct/total n-grams —
    the classic boilerplate/spam signal (repeated headers, keyword
    stuffing) a corpus-quality filter thresholds on.  Pure higher-order
    functions over the token array (one projection, no shuffle, no
    UDF); docs shorter than n tokens score 0."""
    d = with_tokens(df, text_col)
    # sequence(1, 0) would DESCEND ([1, 0]) — short docs need the guard
    grams = (f"case when size(__tokens) >= {n} then "
             f"transform(sequence(1, size(__tokens) - {n - 1}), "
             f"i -> concat_ws(' ', slice(__tokens, i, {n}))) "
             f"else array() end")
    return (d.withColumn("__grams", F.expr(grams))
             .select(
                 id_col,
                 F.size("__grams").alias("total_ngrams"),
                 F.size(F.array_distinct("__grams")).alias("distinct_ngrams"),
                 F.round(F.when(F.size("__grams") > 0,
                                1 - F.size(F.array_distinct("__grams")) /
                                F.size("__grams")).otherwise(F.lit(0.0)),
                         6).alias("repetition_ratio")))


#: PII patterns shared with the DuckDB oracle: plain character classes
#: only (no lookaround/backrefs), so Java regex (Spark) and RE2
#: (DuckDB) match identically.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+?[0-9][0-9()\- ]{6,}[0-9]"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def redact_pii(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """PII scrubbing pass (training-data hygiene): emails, phone-like
    digit runs and IPv4 literals are replaced with typed placeholder
    tokens, with per-document redaction counts for audit.  Order
    matters (emails first — their local parts can contain digits);
    whole-stage-codegen regexp_replace, no UDFs."""
    c = F.col(text_col)
    step1 = F.regexp_replace(c, PII_EMAIL, "<EMAIL>")
    step2 = F.regexp_replace(step1, PII_IPV4, "<IP>")
    return (df
            .withColumn("n_emails",
                        F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL), F.lit(0))))
            .withColumn("n_ips",
                        F.size(F.regexp_extract_all(step1, F.lit(PII_IPV4), F.lit(0))))
            .withColumn("__t2", step2)
            .withColumn("n_phones", F.size(F.regexp_extract_all(
                F.col("__t2"), F.lit(PII_PHONE), F.lit(0))))
            .withColumn("clean_text",
                        F.regexp_replace(F.col("__t2"), PII_PHONE, "<PHONE>"))
            .select(id_col, "clean_text", "n_emails", "n_ips", "n_phones"))


def _distinct_ngrams_expr(n: int) -> str:
    """Distinct n-grams of the __tokens column (see repetition_ratio
    for the short-doc guard)."""
    return (f"array_distinct(case when size(__tokens) >= {n} then "
            f"transform(sequence(1, size(__tokens) - {n - 1}), "
            f"i -> concat_ws(' ', slice(__tokens, i, {n}))) "
            f"else array() end)")


def boilerplate_ngrams(df: DataFrame, n: int = 3, min_docs: int = 5,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Corpus-level boilerplate n-grams: phrases appearing in at least
    ``min_docs`` DISTINCT documents (repeated headers/footers/templates
    — the cross-document analog of repetition_ratio).  One explode +
    hash aggregate shuffled on the gram key; per-doc grams are
    pre-deduped so a gram counts each document once."""
    d = with_tokens(df, text_col)
    return (d.select(F.explode(F.expr(_distinct_ngrams_expr(n)))
                     .alias("gram"))
             .groupBy("gram")
             .agg(F.count(F.lit(1)).alias("n_docs"))
             .filter(F.col("n_docs") >= min_docs))


def with_boilerplate_fraction(df: DataFrame, n: int = 3, min_docs: int = 5,
                              text_col: str = "text",
                              id_col: str = "doc_id") -> DataFrame:
    """Per-document boilerplate exposure: the fraction of a doc's
    distinct n-grams that are corpus boilerplate (boilerplate_ngrams) —
    the score a cleaning pipeline thresholds to drop template-heavy
    docs.  Gram-key join (narrow: id + gram only), then one count per
    doc; docs with no grams score 0.

    One persisted (id, gram) explode feeds all three consumers — the
    corpus boilerplate aggregate, the per-doc hit count, and the
    per-doc gram count (== size of the pre-deduped gram array).
    Previously each consumer re-ran the tokenize + distinct-ngrams
    pipeline from the raw text (3 full passes; r14 optimization
    round measured 7.6 s -> ~3 s at sf0.1).  Docs with no grams
    re-enter via a left join from the id spine, exactly as before."""
    exploded = (with_tokens(df, text_col)
                .select(F.col(id_col),
                        F.explode(F.expr(_distinct_ngrams_expr(n)))
                        .alias("gram"))
                .persist())
    boiler = (exploded.groupBy("gram")
              .agg(F.count(F.lit(1)).alias("n_docs"))
              .filter(F.col("n_docs") >= min_docs))
    hits = (exploded.join(boiler.select("gram"), "gram")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_boilerplate")))
    sizes = (exploded.groupBy(id_col)
             .agg(F.count(F.lit(1)).cast("int").alias("n_distinct_grams")))
    from .dedup import _tag_persisted
    return _tag_persisted(
        (df.select(id_col)
           .join(sizes, id_col, "left")
           .join(hits, id_col, "left")
           .select(
               id_col,
               F.coalesce("n_distinct_grams", F.lit(0))
                .alias("n_distinct_grams"),
               F.coalesce("n_boilerplate", F.lit(0)).alias("n_boilerplate"),
               F.round(F.when(
                   F.col("n_distinct_grams") > 0,
                   F.coalesce("n_boilerplate", F.lit(0)) /
                   F.col("n_distinct_grams")).otherwise(F.lit(0.0)),
                   6).alias("boilerplate_frac"))),
        exploded)


def hashed_ngram_features(df: DataFrame, dim: int = 64, n: int = 2,
                          text_col: str = "text", id_col: str = "doc_id",
                          out_col: str = "features") -> DataFrame:
    """fastText-style hashed bag-of-ngrams feature vector per document:
    token ``n``-grams hash into ``dim`` buckets (engine-portable md5
    hex fold — the same trick as sampling.with_split), feature j = the
    count of grams landing in bucket j.  The standard cheap featurizer
    for quality/language/domain classifiers over a training corpus.

    Built-ins end to end: split → transform-to-grams → explode →
    two hash aggregates → map lookup to a DENSE array<bigint> of
    length ``dim`` (documents with fewer than ``n`` tokens keep an
    all-zero vector — a left join against the id spine, so the output
    has exactly one row per input row).  No per-row Python, no
    collect; the wide text never enters the count shuffle (only
    (id, bucket) rows do).  At 100 TB: one explode-shuffle pass over
    the corpus, output ~dim*8 bytes/doc — the natural input for a
    broadcast-scored linear classifier or the embedding-free dedup
    prefilters."""
    if n < 1 or dim < 1:
        raise ValueError("n and dim must be >= 1")
    # guard: sequence(1, 0) DESCENDS in Spark, so short documents
    # (< n tokens) must yield an empty gram array explicitly
    gram_expr = (
        f"case when size(__tokens) < {n} then array() "
        f"else transform(sequence(1, size(__tokens) - {n - 1}), "
        f"i -> array_join(slice(__tokens, i, {n}), ' ')) end")
    grams = (with_tokens(df, text_col)
             .select(F.col(id_col),
                     F.explode(F.expr(gram_expr)).alias("__g")))
    bucket = (F.conv(F.substring(F.md5(F.col("__g")), 1, 8), 16, 10)
              .cast("long") % dim)
    counts = (grams.withColumn("__b", bucket)
              .groupBy(id_col, "__b").agg(F.count(F.lit(1)).alias("__c"))
              .groupBy(id_col)
              .agg(F.map_from_entries(
                  F.collect_list(F.struct("__b", "__c"))).alias("__m")))
    dense = F.expr(
        f"transform(sequence(0, {dim - 1}), "
        f"i -> coalesce(element_at(__m, cast(i as bigint)), 0L))")
    return (df.select(id_col)
              .join(counts, id_col, "left")
              .select(F.col(id_col), dense.alias(out_col)))


def bigram_novelty(df: DataFrame, rare_max: int = 1,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Per-document novelty vs the corpus bigram distribution: the
    fraction of a doc's adjacent-token bigrams whose TOTAL corpus
    occurrence count is <= ``rare_max``.  The integer-exact stand-in
    for an LM-perplexity quality filter (CCNet ranks by LM score; at
    corpus-bootstrap time the corpus itself is the only LM available,
    and its bigram table IS that LM's unigram-of-pairs view): a very
    HIGH novelty flags gibberish / OCR noise / non-language rows, a
    very LOW one flags boilerplate — both standard cut points.  No
    transcendental ops anywhere, so an independent engine replays the
    scores bit-for-bit (ln() differs across libm builds; ratios of
    counts don't).

    Plan shape: one gram explode (a row per adjacent pair, md5 key
    keeps the shuffle narrow), one corpus-wide hash agg for the
    frequency table, one join-back keyed on the gram hash, one
    per-doc agg — all linear, the classic two-shuffle profile of the
    boilerplate detector (t12).  Returns
    ``(doc_id, n_bigrams, n_rare, novelty)``; docs with < 2 tokens
    score 0/0/0.0 (a left join against the id spine keeps them)."""
    gram_expr = (
        "case when size(__tokens) < 2 then array() "
        "else transform(sequence(1, size(__tokens) - 1), "
        "i -> md5(array_join(slice(__tokens, i, 2), ' '))) end")
    pos = (with_tokens(df, text_col)
           .select(F.col(id_col), F.explode(F.expr(gram_expr)).alias("__g")))
    freq = pos.groupBy("__g").agg(F.count(F.lit(1)).alias("__c"))
    per_doc = (pos.join(freq, "__g")
               .groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("n_bigrams"),
                    F.sum(F.when(F.col("__c") <= rare_max, F.lit(1))
                           .otherwise(F.lit(0)).cast("long"))
                     .alias("n_rare")))
    return (df.select(id_col)
            .join(per_doc, id_col, "left")
            .select(
                F.col(id_col),
                F.coalesce("n_bigrams", F.lit(0).cast("long"))
                 .alias("n_bigrams"),
                F.coalesce("n_rare", F.lit(0).cast("long")).alias("n_rare"),
                F.round(F.coalesce("n_rare", F.lit(0).cast("long")) /
                        F.greatest(F.coalesce("n_bigrams",
                                              F.lit(0).cast("long")),
                                   F.lit(1)), 6).alias("novelty")))


def gopher_rules(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 min_tokens: int = 50, max_tokens: int = 100_000,
                 min_mean_word_len: float = 3.0,
                 max_mean_word_len: float = 10.0,
                 max_symbol_ratio: float = 0.1,
                 min_alpha_word_ratio: float = 0.8,
                 min_stopword_hits: int = 2) -> DataFrame:
    """Gopher-style repetition-free quality gate (Rae et al. 2021,
    arXiv:2112.11446 Appendix A): the rule battery every large web
    corpus passes through BEFORE any model-based scoring — word-count
    bounds, mean-word-length bounds, symbol-to-word ratio ('#' and
    '...' — the markup/ellipsis-spam signal), fraction of words with
    an alphabetic character, and a minimum count of DISTINCT common
    stopwords (the "contains real language" check).  Unlike the
    composite ``quality_score`` (a ranked 0–1 heuristic), this is a
    hard gate: each rule is its own audit column so a curation run can
    read WHICH rule fired, and ``kept`` is their conjunction.

    All integer/ratio math (ratios rounded to 6), so an independent
    engine replays every flag bit-for-bit.  Pure projection over the
    corpus — zero shuffles, whole-stage codegen end to end."""
    d = with_tokens(df, text_col)
    en = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    n_tok = F.greatest(F.size("__tokens"), F.lit(1))
    d = (d
         .withColumn("n_tokens", F.size("__tokens"))
         .withColumn("mean_word_len", F.round(
             F.expr("aggregate(__tokens, 0L, (acc, t) -> acc + length(t))")
             / n_tok, 6))
         .withColumn("symbol_ratio", F.round(
             ((F.length(text_col)
               - F.length(F.replace(F.col(text_col), F.lit("#"), F.lit(""))))
              + (F.length(text_col)
                 - F.length(F.replace(F.col(text_col), F.lit("..."),
                                      F.lit("")))) / F.lit(3))
             / n_tok, 6))
         .withColumn("alpha_word_ratio", F.round(
             F.expr("size(filter(__tokens, t -> t rlike '[A-Za-z]'))")
             / n_tok, 6))
         .withColumn("stopword_hits", F.expr(
             f"size(array_intersect(__tokens, array({en})))")))
    rules = {
        "r_word_count": F.col("n_tokens").between(min_tokens, max_tokens),
        "r_mean_word_len": F.col("mean_word_len").between(
            min_mean_word_len, max_mean_word_len),
        "r_symbol_ratio": F.col("symbol_ratio") <= max_symbol_ratio,
        "r_alpha_words": F.col("alpha_word_ratio") >= min_alpha_word_ratio,
        "r_stopwords": F.col("stopword_hits") >= min_stopword_hits,
    }
    kept = F.lit(True)
    for name, cond in rules.items():
        d = d.withColumn(name, cond)
        kept = kept & cond
    return d.select(id_col, "n_tokens", "mean_word_len", "symbol_ratio",
                    "alpha_word_ratio", "stopword_hits", *rules,
                    kept.alias("kept"))


def fertility_by_language(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id",
                          lang_col: str = "lang") -> DataFrame:
    """Tokenizer fertility report: subword pieces per whitespace word,
    by language — THE table a multilingual tokenizer evaluation reads
    (high fertility = a language the vocabulary under-serves, so its
    token budget buys fewer words; the metric behind per-language
    budget corrections in mT5/XGLM-style data cards).  Uses the same
    deterministic BPE-ish piece proxy as ``token_stats`` so the two
    reports reconcile.  One projection + one tiny hash-agg (|langs|
    groups); sums are exact BIGINTs, ratios rounded to 6."""
    ts = token_stats(df, text_col, id_col).select(
        id_col, "n_tokens", "n_subword_pieces")
    return (ts.join(df.select(id_col, lang_col), id_col)
            .groupBy(lang_col)
            .agg(F.count(id_col).alias("n_docs"),
                 F.sum("n_tokens").alias("total_words"),
                 F.sum("n_subword_pieces").alias("total_pieces"))
            .withColumn("fertility", F.round(
                F.col("total_pieces") /
                F.greatest(F.col("total_words"), F.lit(1)), 6))
            .orderBy(lang_col))


def self_perplexity(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """CCNet-style perplexity scoring (Wenzek et al. 2019,
    arXiv:1911.00359 §4.3) with the LM trained on the corpus ITSELF:
    a unigram model with add-one smoothing over lowercased whitespace
    tokens, then per-document bits-per-token = mean -log2 p(token) and
    ppl = 2^bits.  CCNet trains KenLM on Wikipedia; with no external
    model in the engine the self-trained unigram LM is the same shape
    of signal (rare-vocabulary documents score high, stopword-dense
    running text scores low) and is exactly replayable by any SQL
    engine — which a real 5-gram KenLM would not be.

    Two passes, both Spark-native aggregations:
      1. corpus pass — ``groupBy(token)`` builds the unigram table
         (map-side combine shrinks the shuffle to |vocab| rows), then
         one global agg yields N (total tokens) and V (vocab size);
      2. scoring pass — per-(doc, token) counts shuffle on a
         well-distributed composite key, join the unigram table on
         token (AQE skew-join splits the stopword keys — 'the' joins
         to every doc — and at test scale the vocab side simply
         broadcasts), then one doc-keyed agg folds
         sum(c_doc * -log2((c+1)/(N+V))) / n_doc.

    Returns ``(doc_id, n_tokens, bits_per_token, ppl)``, ratios
    rounded to 6 so an independent engine reproduces the hash despite
    summation-order float noise."""
    tok = (with_tokens(df, text_col)
           .select(F.col(id_col),
                   F.explode(F.expr("transform(__tokens, t -> lower(t))"))
                   .alias("tok")))
    uni = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = uni.agg(F.sum("c").alias("n_corpus"),
                  F.count(F.lit(1)).alias("v_vocab"))
    per_doc_tok = (tok.groupBy(id_col, "tok")
                   .agg(F.count(F.lit(1)).alias("c_doc")))
    scored = (per_doc_tok.join(uni, "tok").crossJoin(F.broadcast(tot))
              .withColumn("bits", F.col("c_doc")
                          * -F.log2((F.col("c") + F.lit(1.0))
                                    / (F.col("n_corpus") + F.col("v_vocab")))))
    return (scored.groupBy(id_col)
            .agg(F.sum("c_doc").alias("n_tokens"),
                 (F.sum("bits") / F.sum("c_doc")).alias("__bpt"))
            .select(id_col,
                    F.col("n_tokens").cast("long").alias("n_tokens"),
                    F.round("__bpt", 6).alias("bits_per_token"),
                    F.round(F.pow(F.lit(2.0), F.col("__bpt")), 6)
                    .alias("ppl")))


def perplexity_filter(df: DataFrame, n_buckets: int = 3,
                      keep_buckets: tuple = (1, 2),
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """CCNet's head/middle/tail split: rank documents by
    ``self_perplexity`` bits-per-token, cut the corpus into
    ``n_buckets`` equal-frequency bands (1 = head = most fluent), and
    flag ``kept`` for the bands CCNet trains on (head+middle by
    default; the tail is where boilerplate-free gibberish lives).
    Banding is NTILE over (bits_per_token, doc_id) — the id tie-break
    makes the band assignment deterministic across engines and
    partitionings.  The NTILE window is a single global sort of one
    small row per DOCUMENT (id + two doubles, not text) — at 100 TB
    that frame is ~1% of corpus bytes; the heavy lifting stays in the
    distributed passes of ``self_perplexity``."""
    from pyspark.sql import Window
    sp = self_perplexity(df, text_col, id_col)
    w = Window.orderBy(F.col("bits_per_token").asc(), F.col(id_col).asc())
    return (sp.withColumn("band", F.ntile(n_buckets).over(w))
            .withColumn("kept", F.col("band")
                        .isin([int(b) for b in keep_buckets]))
            .select(id_col, "n_tokens", "bits_per_token", "ppl",
                    "band", "kept"))


def unigram_lm(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Train the add-one unigram LM ``score_against_lm`` consumes: one
    ``groupBy(token)`` over the lowercased whitespace tokens of the
    REFERENCE corpus (CCNet trains on the target-domain slice — e.g.
    the high-quality English subset — and scores candidates against
    it).  Returns the ``(tok, c)`` frame; persist it when scoring many
    batches (streaming ingest does).  Map-side combine shrinks the
    shuffle to |vocab| rows."""
    return (with_tokens(df, text_col)
            .select(F.explode(F.expr(
                "transform(__tokens, t -> lower(t))")).alias("tok"))
            .groupBy("tok").agg(F.count(F.lit(1)).alias("c")))


def score_against_lm(df: DataFrame, lm: DataFrame,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Score documents against a FROZEN unigram LM (the true CCNet
    shape, arXiv:1911.00359 §4.3: LM from the reference corpus, scores
    for the candidates — unlike ``self_perplexity`` the scored corpus
    does not influence its own model).  Out-of-vocabulary tokens take
    the add-one floor p = 1/(N+V+1) and are counted in ``oov_tokens``
    so a curation run can tell "fluent but foreign vocabulary" from
    "gibberish the LM has seen".

    Per-(doc, token) counts LEFT-join the LM on token (broadcast when
    the vocab is small, AQE skew-split otherwise — same posture as
    ``self_perplexity``), then one doc-keyed agg.  Returns
    ``(doc_id, n_tokens, oov_tokens, bits_per_token, ppl)``."""
    tot = lm.agg(F.sum("c").alias("n_lm"),
                 F.count(F.lit(1)).alias("v_lm"))
    per_doc_tok = (with_tokens(df, text_col)
                   .select(F.col(id_col),
                           F.explode(F.expr(
                               "transform(__tokens, t -> lower(t))"))
                           .alias("tok"))
                   .groupBy(id_col, "tok")
                   .agg(F.count(F.lit(1)).alias("c_doc")))
    denom = F.col("n_lm") + F.col("v_lm") + F.lit(1.0)
    scored = (per_doc_tok.join(lm, "tok", "left")
              .crossJoin(F.broadcast(tot))
              .withColumn("bits", F.col("c_doc")
                          * -F.log2((F.coalesce(F.col("c"), F.lit(0))
                                     + F.lit(1.0)) / denom))
              .withColumn("oov", F.when(F.col("c").isNull(),
                                        F.col("c_doc"))
                          .otherwise(F.lit(0))))
    return (scored.groupBy(id_col)
            .agg(F.sum("c_doc").alias("n_tokens"),
                 F.sum("oov").alias("oov_tokens"),
                 (F.sum("bits") / F.sum("c_doc")).alias("__bpt"))
            .select(id_col,
                    F.col("n_tokens").cast("long").alias("n_tokens"),
                    F.col("oov_tokens").cast("long").alias("oov_tokens"),
                    F.round("__bpt", 6).alias("bits_per_token"),
                    F.round(F.pow(F.lit(2.0), F.col("__bpt")), 6)
                    .alias("ppl")))


def vocab_coverage(df: DataFrame, ks: tuple = (100, 1000, 10000),
                   text_col: str = "text") -> DataFrame:
    """Tokenizer vocabulary-budget table: for each candidate vocab
    size k, what fraction of ALL corpus token occurrences the top-k
    most frequent (lowercased whitespace) tokens cover — the curve a
    tokenizer design reads to pick its vocab size, and the Zipf
    reality check (natural text covers ~90%+ with a few thousand
    types; flat coverage means OCR noise or ID-like junk).

    Ordering is (count DESC, token ASC) so the rank — and therefore
    every coverage number — is deterministic across engines and
    partitionings.  One corpus pass builds the unigram table; the
    rank/cumulative window then sorts |vocab| narrow rows, not the
    corpus (same posture as perplexity_filter's NTILE).  Returns
    ``(k, distinct_tokens, covered_tokens, total_tokens, coverage)``
    — distinct_tokens < k flags a vocab smaller than the budget."""
    from pyspark.sql import Window
    uni = (with_tokens(df, text_col)
           .select(F.explode(F.expr(
               "transform(__tokens, t -> lower(t))")).alias("tok"))
           .groupBy("tok").agg(F.count(F.lit(1)).alias("c")))
    w = (Window.orderBy(F.col("c").desc(), F.col("tok").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    ranked = (uni.withColumn("__rank", F.row_number().over(
        Window.orderBy(F.col("c").desc(), F.col("tok").asc())))
        .withColumn("__cum", F.sum("c").over(w)))
    # ONE conditional aggregation over the ranked vocab (no theta
    # join — a LEFT BNLJ would broadcast the vocab side), reshaped to
    # a row per k with a literal explode
    aggs = [F.sum("c").alias("__total")]
    for k in sorted(ks):
        cond = F.col("__rank") <= F.lit(int(k))
        aggs += [F.count(F.when(cond, 1)).alias(f"__d{k}"),
                 F.coalesce(F.max(F.when(cond, F.col("__cum"))),
                            F.lit(0).cast("long")).alias(f"__c{k}")]
    one = ranked.agg(*aggs)
    rows = F.array(*[
        F.struct(F.lit(int(k)).alias("k"),
                 F.col(f"__d{k}").cast("long").alias("distinct_tokens"),
                 F.col(f"__c{k}").alias("covered_tokens"),
                 F.col("__total").alias("total_tokens"),
                 F.round(F.col(f"__c{k}")
                         / F.greatest("__total", F.lit(1)), 6)
                 .alias("coverage"))
        for k in sorted(ks)])
    return (one.select(F.explode(rows).alias("r"))
            .select("r.k", "r.distinct_tokens", "r.covered_tokens",
                    "r.total_tokens", "r.coverage")
            .orderBy("k"))
