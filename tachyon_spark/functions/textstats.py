"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All built-in column expressions — they codegen and
scale linearly with no shuffle (except explicit groupBys by the caller).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# A small english stopword set for the n-gram/stopword-ratio heuristic.
EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "this", "for", "on", "with", "as", "at", "by", "be", "are",
]


def _tokens(text_col) -> F.Column:
    return F.filter(F.split(text_col, " "), lambda t: t != "")


def _stopword_count(toks) -> F.Column:
    """Count tokens (with multiplicity) in EN_STOPWORDS.

    Implementation note: F.filter with a per-element .isin(list) lambda is
    ~10x slower than aggregate+array_contains against a literal array (the
    IN-list inside a higher-order lambda defeats codegen); measured 3.0s vs
    0.3s on 500 docs.
    """
    stop = F.lit(EN_STOPWORDS)
    return F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.when(F.array_contains(stop, t), 1).otherwise(0)
    )


def text_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document stats: token count, char count, avg token length.

    sum(len(token)) == length(text) - #spaces (empty tokens contribute 0), so
    avg_token_len needs no array aggregation — plain string expressions that
    codegen, instead of an interpreted higher-order lambda.
    """
    text = F.col(text_col)
    n_tok = F.size(_tokens(text))
    char_sum = F.length(F.replace(text, F.lit(" "), F.lit("")))  # non-space chars
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.length(text).alias("n_chars"),
        F.round(
            char_sum.cast("double") / F.greatest(n_tok, F.lit(1)), 6
        ).alias("avg_token_len"),
    )


def language_id(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.05,
) -> DataFrame:
    """Stopword-ratio language heuristic: 'en' if ratio > threshold."""
    toks = _tokens(F.lower(F.col(text_col)))
    staged = df.select(
        F.col(id_col),
        _stopword_count(toks).alias("__stop"),
        F.size(toks).alias("__n"),
    )
    ratio = F.col("__stop").cast("double") / F.greatest(F.col("__n"), F.lit(1))
    return staged.select(
        F.col(id_col),
        F.round(ratio, 6).alias("stopword_ratio"),
        F.when(ratio > threshold, F.lit("en")).otherwise(F.lit("unk")).alias("lang_pred"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality score in [0,1] from length / punctuation / stopwords.

    score = 0.4*len_score + 0.3*(1 - punct_ratio) + 0.3*min(1, 10*stop_ratio)
    with len_score = min(1, n_tokens/100). Deterministic, SQL-expressible.
    """
    text = F.col(text_col)
    toks = _tokens(F.lower(text))
    staged = df.select(
        F.col(id_col),
        F.size(toks).alias("__n"),
        _stopword_count(toks).alias("__stop"),
        F.length(text).alias("__len"),
        (F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))).alias("__punct"),
    )
    punct_ratio = F.col("__punct").cast("double") / F.greatest(F.col("__len"), F.lit(1))
    stop_ratio = F.col("__stop").cast("double") / F.greatest(F.col("__n"), F.lit(1))
    len_score = F.least(F.lit(1.0), F.col("__n").cast("double") / 100.0)
    score = 0.4 * len_score + 0.3 * (1.0 - punct_ratio) + 0.3 * F.least(F.lit(1.0), 10.0 * stop_ratio)
    return staged.select(F.col(id_col), F.round(score, 6).alias("quality"))


BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def bpe_tokens(text_col) -> F.Column:
    """BPE-ish tokens: letter runs, single digits, single punctuation marks
    (the GPT-2-style pre-tokenizer shape). Plain alternation — no lookarounds,
    so the same pattern runs on RE2 engines (DuckDB oracle) and codegens."""
    return F.regexp_extract_all(text_col, F.lit(BPE_TOKEN_RE), 0)


def token_count(df: DataFrame, text_col: str = "text", bpe_like: bool = False) -> F.Column:
    """Token count column: whitespace, or the BPE-ish regex tokenizer."""
    toks = bpe_tokens(F.col(text_col)) if bpe_like else _tokens(F.col(text_col))
    return F.size(toks)


def doc_fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic 64-bit-ish fingerprint (md5 prefix of normalized text)."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return df.select(F.col(id_col), F.substring(F.md5(norm), 1, 16).alias("fingerprint"))


def repetition_score(
    df: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Within-document repetition: 1 - distinct_ngrams / total_ngrams over
    word n-grams (a standard training-data quality signal — boilerplate and
    degenerate generations score high). Pure array HOFs per row: the n-gram
    list is built with transform over a sequence (no explode, no shuffle),
    so this codegens and scales linearly like the rest of the module.
    Documents with fewer than n tokens score 0."""
    from tachyon_spark.functions.util import spread

    # the n-gram HOFs are the dominant per-row cost of the whole module —
    # make sure a small-file corpus doesn't serialize them on one core
    df = spread(df)
    toks = _tokens(F.col(text_col))
    m = F.size(toks) - F.lit(n - 1)  # number of n-grams
    # F.get is 0-based and null-safe out of bounds (no ANSI index error on
    # the clamped short-document branch, whose result is unused anyway)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(m - 1, F.lit(0))),
        lambda i: F.concat_ws(
            " ", *[F.get(toks, (i + j).cast("int")) for j in range(n)]
        ),
    )
    score = F.when(
        m <= 0, F.lit(0.0)
    ).otherwise(
        1.0 - F.size(F.array_distinct(grams)).cast("double") / m.cast("double")
    )
    return df.select(F.col(id_col), F.round(score, 6).alias("repetition"))


def gopher_quality_flags(
    df: DataFrame,
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_word_len: float = 3.0,
    max_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style document quality RULES (Rae et al. 2021, appendix A1.1
    — the rule set most large English pretraining pipelines start from),
    each as its own boolean column plus the conjunctive `pass` flag so a
    pipeline can both filter and audit which rule rejected what:

      ok_n_tokens   min_tokens <= token count <= max_tokens
      ok_word_len   min <= mean word length <= max
      ok_symbols    (# + ellipsis) / tokens <= max_symbol_ratio
      ok_alpha      fraction of words containing a letter >= min_alpha_frac
      ok_stopwords  at least min_stopwords DISTINCT stopwords present

    Pure column expressions over the token array — codegen, linear at any
    corpus size (same contract as text_stats). The per-row work (two
    tokenizations, a per-token rlike, an array_intersect against the
    stopword list) is heavy enough that a small-file corpus must not
    serialize it on one core — spread() is a no-op at real scan widths
    (r12: cut the 10x-single-file bench reading ~4x)."""
    from tachyon_spark.functions.util import spread

    df = spread(df)
    text = F.col(text_col)
    toks = _tokens(text)
    low = _tokens(F.lower(text))
    n = F.size(toks)
    nz = F.greatest(n, F.lit(1))
    char_sum = F.length(F.replace(text, F.lit(" "), F.lit("")))
    mean_len = char_sum.cast("double") / nz
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    n_sym = n_hash + n_ellipsis
    # words containing at least one alphabetic character
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    stop_distinct = F.size(
        F.array_intersect(F.array_distinct(low), F.lit(EN_STOPWORDS))
    )
    staged = df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        (n.between(min_tokens, max_tokens)).alias("ok_n_tokens"),
        F.round(mean_len, 6).alias("mean_word_len"),
        (
            (mean_len >= F.lit(float(min_word_len)))
            & (mean_len <= F.lit(float(max_word_len)))
        ).alias("ok_word_len"),
        (
            n_sym.cast("double") / nz <= F.lit(float(max_symbol_ratio))
        ).alias("ok_symbols"),
        (
            n_alpha.cast("double") / nz >= F.lit(float(min_alpha_frac))
        ).alias("ok_alpha"),
        (stop_distinct >= F.lit(min_stopwords)).alias("ok_stopwords"),
    )
    return staged.select(
        "*",
        (
            F.col("ok_n_tokens")
            & F.col("ok_word_len")
            & F.col("ok_symbols")
            & F.col("ok_alpha")
            & F.col("ok_stopwords")
        ).alias("pass"),
    )


def token_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Within-document Shannon entropy of the token distribution (nats):
    H = -sum_t p_t ln p_t over the doc's own token frequencies — near 0
    for degenerate repeated-token documents, ln(n_tok) when every token is
    unique. The scale-free companion to repetition_score (which fixes an
    n-gram width); low entropy at high n_tokens is the classic generated-
    boilerplate signature.

    Shape: token explode -> (doc, token) count groupBy -> per-doc entropy
    groupBy. Two shuffles, keys are doc-id-based (no hot corpus-wide keys:
    unlike unigram_logprob nothing aggregates per TOKEN, so 'the' cannot
    skew), everything JVM-side."""
    from tachyon_spark.functions.util import spread

    toks = spread(df, cap=16).select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).where(F.col("tok") != "")
    counts = toks.groupBy("id", "tok").agg(F.count("*").alias("__c"))
    return (
        counts.groupBy("id")
        .agg(
            F.sum("__c").alias("__n"),
            F.sum(F.col("__c") * F.log(F.col("__c").cast("double"))).alias(
                "__clogc"
            ),
        )
        # H = ln n - (sum c ln c) / n  (algebraic form: one pass, no join
        # back of the total to compute p_t per row)
        .select(
            F.col("id"),
            F.col("__n").alias("n_tok"),
            F.round(
                F.log(F.col("__n").cast("double"))
                - F.col("__clogc") / F.col("__n").cast("double"),
                6,
            ).alias("entropy"),
        )
    )


def unigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-trained unigram LM negative log-likelihood per document —
    the classic LM-quality filter (CCNet/Gopher-shape): gibberish and
    badly-OCR'd documents average high NLL (improbable tokens), natural
    prose and boilerplate average low. Returns (id, n_tok, avg_nll) with
    add-one smoothing over (N + V).

    Shape: explode → token-count groupBy (shuffle 1, map-side partials),
    token join back (shuffle 2 — hot tokens like 'the' are skew-split by
    AQE), per-doc average (shuffle 3). The model frame (distinct tokens)
    is vocabulary-sized, not corpus-sized; everything stays JVM-side."""
    from tachyon_spark.functions.util import spread

    toks = spread(df, cap=16).select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).where(F.col("tok") != "")
    counts = toks.groupBy("tok").agg(F.count("*").alias("__c"))
    totals = counts.agg(F.sum("__c").alias("__N"), F.count("*").alias("__V"))
    nll = -F.log(
        (F.col("__c") + 1).cast("double")
        / (F.col("__N") + F.col("__V")).cast("double")
    )
    scored = (
        toks.join(counts, "tok")
        .crossJoin(F.broadcast(totals))
        .select("id", nll.alias("__nll"))
    )
    return scored.groupBy("id").agg(
        F.count("*").alias("n_tok"),
        F.round(F.avg("__nll"), 6).alias("avg_nll"),
    )


def tfidf_top_terms(
    df: DataFrame,
    top: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top `top` terms per document by tf-idf (tf = in-doc count, idf =
    ln(N / df) over distinct-doc term frequency) — the classic keyword /
    topic fingerprint. Ties break (score desc, term asc) so the selection
    is deterministic and SQL-replayable.

    Shape: one (doc, term) count shuffle, one term-keyed df-count shuffle
    joined back (broadcast when the vocabulary is small, shuffle join
    otherwise), one per-doc top-k window. Scale-safe: every key is a term
    or a doc id; no all-pairs step."""
    from pyspark.sql import Window

    toks = _tokens(F.col(text_col))
    # no spread() here: the flat token explode is cheap per row and the
    # added pre-explode shuffle measured ~2x slower at sf0.1
    pairs = (
        df.select(F.col(id_col).alias("id"), F.explode(toks).alias("term"))
        .where(F.col("term") != "")
    )
    tf = pairs.groupBy("id", "term").agg(F.count("*").alias("tf"))
    n_docs = df.select(F.count("*").alias("__n"))
    dfreq = pairs.distinct().groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(dfreq, "term").crossJoin(F.broadcast(n_docs)).select(
        "id",
        "term",
        (F.col("tf") * F.log(F.col("__n") / F.col("df"))).alias("score"),
    )
    w = Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= top)
        .select(F.col("id").alias(id_col), F.col("__rn").alias("rank"), "term",
                F.round("score", 6).alias("score"))
    )


def bigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-trained BIGRAM LM negative log-likelihood per document: the
    next-order companion to unigram_logprob — word-salad documents whose
    unigram stats look fine (common words, wrong order) average high
    bigram NLL. P(w_i | w_{i-1}) = (c(w_{i-1} w_i) + 1) / (c(w_{i-1}) + V)
    (add-one over the context count + vocabulary); per-doc average over
    the n-1 transitions. Returns (id, n_pairs, avg_nll); single-token
    docs have no transitions and drop.

    Shape: pair enumeration is a narrow per-row transform; bigram and
    unigram counts are two keyed groupBys; the join back is keyed on the
    pair/context (hot contexts skew-split by AQE); per-doc avg is one id
    shuffle. Model frames are vocabulary/bigram-type-sized."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    pairs_arr = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("prev"),
                F.element_at(toks, i + 1).alias("cur"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))
    from tachyon_spark.functions.util import spread

    # spread BEFORE the explode: a single-file local scan is 1 partition
    # and would enumerate every pair in one task (no-op at scale)
    src = spread(df, cap=16)
    pairs = src.select(
        F.col(id_col).alias("id"), F.explode(pairs_arr).alias("p")
    ).select("id", F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur"))
    uni = (
        src.select(F.explode(F.filter(F.split(F.col(text_col), " "), lambda t: t != "")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("__cu"))
    )
    totals = uni.agg(F.count("*").alias("__V"))
    bi = pairs.groupBy("prev", "cur").agg(F.count("*").alias("__cb"))
    nll = -F.log(
        (F.col("__cb") + 1).cast("double")
        / (F.col("__cu") + F.col("__V")).cast("double")
    )
    scored = (
        pairs.join(bi, ["prev", "cur"])
        .join(uni.withColumnRenamed("tok", "prev"), "prev")
        .crossJoin(F.broadcast(totals))
        .select("id", nll.alias("__nll"))
    )
    return scored.groupBy("id").agg(
        F.count("*").alias("n_pairs"),
        F.round(F.avg("__nll"), 6).alias("avg_nll"),
    )


def quality_percentile(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Domain-RELATIVE quality: percent_rank of the heuristic quality
    score WITHIN each source. The filtering companion to quality_score —
    a single global threshold over-prunes domains whose style
    systematically scores low (code, forums) and under-prunes ones that
    score high (news); per-domain percentiles make "drop the worst 20%"
    mean the same thing everywhere (the quality-pruning shape used by
    CCNet's perplexity buckets and FineWeb's per-dump filters).

    Shape: the score is a narrow codegen projection; the only wide
    exchange is one window shuffle on the domain key. Ties share a rank
    (SQL percent_rank), so the output is deterministic and replayable.
    Skew note: a window over a hot domain lands that domain in one task —
    at 100 TB prefer pre-bucketing by domain (the catalog layout) or the
    two-phase cap pattern; domains in practice are many and bounded."""
    from pyspark.sql import Window

    scored = quality_score(df, id_col=id_col, text_col=text_col)
    keyed = df.select(F.col(id_col), F.col(group_col)).join(
        scored, id_col
    )
    w = Window.partitionBy(group_col).orderBy("quality")
    return keyed.select(
        id_col,
        group_col,
        "quality",
        F.round(F.percent_rank().over(w), 6).alias("pctl"),
    )


def corpus_top_ngrams(
    df: DataFrame,
    n: int = 2,
    top: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide top-`top` word n-grams by occurrence count — the
    corpus-analysis staple (tokenizer vocabulary design, contamination
    screens, boilerplate scouting). Deterministic tie-break
    (count desc, ngram asc).

    Shape: the n-gram enumeration is a per-row array transform (no
    pairwise join); counts combine MAP-SIDE before the single
    ngram-keyed exchange, so hot n-grams ("of the") never concentrate
    rows; the final top-k is TakeOrderedAndProject, not a global sort."""
    if n < 1:
        raise ValueError("n must be >= 1")
    from tachyon_spark.functions.util import spread

    staged = spread(df).select(_tokens(F.lower(F.col(text_col))).alias("__w"))
    # gram construction without per-gram array allocation (r13): bigrams
    # zip the two shifted slices (ONE slice pair per row, not one per
    # gram); higher n indexes the token array directly — both measurably
    # cheaper than the former slice+array_join-per-gram shape, identical
    # output strings (oracle parity preserved)
    if n == 2:
        gram_expr = (
            "zip_with(slice(__w, 1, size(__w) - 1),"
            " slice(__w, 2, size(__w) - 1), (a, b) -> concat(a, ' ', b))"
        )
    else:
        parts = ", ' ', ".join(f"__w[i + {j}]" for j in range(n))
        gram_expr = (
            f"transform(sequence(0, size(__w) - {n}),"
            f" i -> concat({parts}))"
        )
    grams = staged.where(F.size("__w") >= n).select(
        F.explode(F.expr(gram_expr)).alias("ngram")
    )
    counts = grams.groupBy("ngram").agg(F.count("*").alias("n"))
    return counts.orderBy(F.col("n").desc(), F.col("ngram")).limit(top)


def vocab_stats(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain vocabulary statistics: token count, distinct terms,
    type-token ratio, and hapax share (fraction of types occurring once —
    Heaps-law health check; scripted/boilerplate domains show tiny TTR
    and hapax collapse, OCR-noise domains show hapax explosion).

    Shape: one (domain, term)-keyed count (map-side combine absorbs hot
    terms), then a domain-keyed rollup — two bounded exchanges, both on
    keys with natural cardinality; no window, no driver collect."""
    pairs = (
        df.select(
            F.col(group_col),
            F.explode(_tokens(F.lower(F.col(text_col)))).alias("__t"),
        )
        .groupBy(group_col, "__t")
        .agg(F.count("*").alias("__c"))
    )
    return pairs.groupBy(group_col).agg(
        F.sum("__c").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.round(F.count("*") / F.sum("__c"), 6).alias("ttr"),
        F.round(
            F.sum(F.when(F.col("__c") == 1, 1).otherwise(0))
            / F.count("*"),
            6,
        ).alias("hapax_frac"),
    )
