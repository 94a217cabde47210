"""Lexical retrieval: BM25 scoring over a tokenized document column.

Beyond-reference (the reference engine has no text surface —
tachyon_core is a pure numeric TSDB): the lexical counterpart to
functions/similarity.py's embedding ANN, and the classic first-stage
retriever of a training-data curation pipeline — query-based corpus
slicing, contamination hunting, eval-set mining ("find every document
about X before it leaks into the train split").

Scale shape (the part that matters at 100 TB):
- document frequencies are computed ONLY for the query's terms — a
  handful of rows, broadcast — never a full-vocabulary posting list;
- the corpus scalars (N, avgdl) are one tiny aggregate crossJoined as a
  broadcast 1-row frame (fully lazy, no driver collect);
- the per-document score is a single groupBy(doc_id) over the
  term-FILTERED token stream (the `tok IN (query)` predicate prunes the
  explode's output before the shuffle);
- top-k is orderBy + limit = TakeOrderedAndProject, never a full sort.

Scoring is classic Robertson/Sparck-Jones BM25:
    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by BM25 score for `query_terms` (whitespace
    tokenization, lowercased — the corpus convention shared with
    functions/textstats.py). Returns (id_col, score) ordered by
    (rounded score desc, id) — the rounding makes the ordering
    reproducible across engines and summation orders."""
    if not query_terms:
        raise ValueError("bm25_topk requires at least one query term")
    terms = sorted({t.lower() for t in query_terms})
    # doc length as a NARROW column expression — the full token stream
    # never shuffles (only query-term hits below reach an exchange)
    dl = docs.select(
        id_col,
        F.size(
            F.filter(
                F.split(F.lower(F.col(text_col)), " "),
                lambda t: t != "",
            )
        ).alias("__dl"),
    )
    stats = dl.agg(
        F.count("*").alias("__n"), F.avg("__dl").alias("__avgdl")
    )
    tf = (
        docs.select(
            id_col,
            F.explode(
                F.split(F.lower(F.col(text_col)), " ")
            ).alias("tok"),
        )
        .where(F.col("tok").isin(terms))
        .groupBy(id_col, "tok")
        .agg(F.count("*").alias("__tf"))
    )
    dfreq = tf.groupBy("tok").agg(
        F.countDistinct(id_col).alias("__df")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("__df") + F.lit(0.5))
        / (F.col("__df") + F.lit(0.5))
    )
    norm = F.col("__tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            (idf * F.col("__tf") * F.lit(k1 + 1.0) / norm).alias("__s"),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("__s"), 6).alias("score"))
    )
    return scored.orderBy(F.desc("score"), id_col).limit(int(k))


def rrf_fuse(
    ranked: "list[DataFrame]",
    k: int = 10,
    c: int = 60,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009)
    of N ranked candidate lists — the standard hybrid-retrieval combiner
    (BM25 lexical + embedding-cosine semantic being the classic pair):

        rrf(d) = sum_i 1 / (c + rank_i(d))

    with rank_i the 1-based position of d in list i (absent -> no
    contribution). Returns (id_col, rrf) ordered by (rrf desc, id),
    top-k.

    PRECONDITIONS: ids are unique within each list (true of any top-k
    retriever output; duplicate ids would cross-multiply through the
    fuse join), and the inputs are ALREADY bounded top-k
    candidate lists (the output of bm25_topk / *_cosine_topk — tens to
    thousands of rows), so the per-list rank window and the full-outer
    fuse join run on frames whose size is set by the retrievers' k, not
    by the corpus. Ranks tie-break by id on BOTH engines (scores are
    pre-rounded by the retrievers), contributions 1/(c+rank) are single
    correctly-rounded divisions added in fixed left-to-right list order
    — bit-identical in any IEEE-754 engine, so the fusion replays
    exactly in the DuckDB oracle."""
    if not ranked:
        raise ValueError("rrf_fuse requires at least one ranked list")
    if c < 1:
        raise ValueError(f"c must be >= 1, got {c}")
    from pyspark.sql import Window

    fused = None
    for i, df in enumerate(ranked):
        w = Window.orderBy(F.desc(score_col), F.col(id_col))
        r = df.select(
            id_col, F.row_number().over(w).alias(f"__r{i}")
        )
        fused = r if fused is None else fused.join(r, id_col, "full_outer")
    score = F.lit(0.0)
    for i in range(len(ranked)):
        score = score + F.coalesce(
            F.lit(1.0) / (F.lit(float(c)) + F.col(f"__r{i}")), F.lit(0.0)
        )
    out = fused.select(id_col, F.round(score, 6).alias("rrf"))
    return out.orderBy(F.desc("rrf"), id_col).limit(int(k))
