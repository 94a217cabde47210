"""Fuzzy string joins (record linkage / entity resolution within edit
distance k) — the missing piece between exact dedup (functions/dedup.py,
equality) and MinHash near-dup (set overlap): TYPO-level matching, e.g.
joining scraped titles/URLs/author names against a canonical table where
the only differences are single-character edits.

Both methods are CANDIDATE GENERATION BY BUCKETED EQUI-JOIN followed by an
exact `levenshtein` verify — never an all-pairs comparison — and both
generators are provably COMPLETE (supersets of the true pair set), so
verify-after-block returns exactly the pairs within distance k:

- "neighborhood" (FastSS / SymSpell family): every string expands to its
  deletion neighborhood (all strings reachable by deleting <= k chars);
  lev(a,b) <= k implies the neighborhoods intersect (delete the edited
  positions from each side of any <=k-op edit script and the remainders
  coincide), so an equi-join on variants finds every true pair. Explode
  factor is C(len, k)-ish per row — linear in data for fixed k, and each
  variant bucket stays small when keys are near-distinct (the join is a
  plain hash equi-join that shuffles only (variant, id, key)).

- "segment" (PassJoin-style pigeonhole, k=1 only): a single edit cannot
  touch both the first m and the last m characters when len >= 2m, so
  pairs within distance 1 agree on prefix_m OR suffix_m. Two equi-joins
  (prefix bucket, suffix bucket) + union + verify. Zero explode factor —
  the cheaper shape when k=1 and keys are long enough.

At 100 TB both shapes are shuffle-bounded by the candidate pair count:
keys should be near-distinct per side (dedupe upstream — duplicate keys
multiply pairs by definition of the output, not as an artifact).

Reference parity note: the reference engine (tachyontsdb/tachyon) has no
string-linkage surface; this belongs to the LLM-pipeline extension set
(SURVEY.md "training-data pipeline" operators), same family as
functions/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["deletion_variants", "fuzzy_join"]


def deletion_variants(col, k: int = 1):
    """Array column of every string reachable from `col` by deleting at
    most `k` characters (the FastSS deletion neighborhood), including the
    string itself. Pure SQL higher-order functions — JVM-side, codegen.

    k=1: 1 + len variants; k=2 adds ~len^2/2 — keep k small (1 or 2), as
    every published FastSS/SymSpell deployment does.
    """
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    big = 1 << 20

    def one_deletion(c):
        # variant i = drop the i-th character (1-based)
        return F.transform(
            F.sequence(F.lit(1), F.length(c)),
            lambda i: F.concat(
                F.substring(c, F.lit(1), i - 1),
                c.substr(i + 1, F.lit(big)),
            ),
        )

    out = F.array(col)
    frontier = F.array(col)
    for _ in range(k):
        # expand the current frontier by one deletion each
        frontier = F.array_distinct(
            F.flatten(F.transform(frontier, one_deletion))
        )
        out = F.array_distinct(F.concat(out, frontier))
    return out


def _explode_variants(df: DataFrame, id_col: str, key_col: str, k: int,
                      side: str) -> DataFrame:
    # NULL/empty keys never match (and sequence(1, 0) would descend,
    # fabricating variants); drop them before the explode
    df = df.where(F.length(key_col) > 0)
    return df.select(
        F.col(id_col).alias(f"{side}_id"),
        F.col(key_col).alias(f"{side}_key"),
        F.explode(deletion_variants(F.col(key_col), k)).alias("__variant"),
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    k: int = 1,
    method: str = "neighborhood",
    left_id: str = "left_id",
    right_id: str = "right_id",
) -> DataFrame:
    """All (left, right) pairs whose `on` strings are within Levenshtein
    distance `k`. Returns (left_id, right_id, dist) — exact distances,
    full recall (see module docstring for the completeness argument per
    method). `left`/`right` must carry `left_id`/`right_id` columns plus
    the `on` string column; NULL or empty keys never match.

    method="neighborhood" supports any small k; method="segment" is the
    explode-free k=1 shape and requires every key to have at least 2
    characters (m = floor(min_len / 2) >= 1).
    """
    if method == "neighborhood":
        lv = _explode_variants(left, left_id, on, k, "l")
        rv = _explode_variants(right, right_id, on, k, "r")
        cand = lv.join(rv, "__variant").drop("__variant")
    elif method == "segment":
        if k != 1:
            raise ValueError("segment method supports k=1 only")
        left = left.where(F.length(on) > 0)
        right = right.where(F.length(on) > 0)
        # m from the corpus: one tiny agg action; a single edit cannot
        # clear both the first m and last m chars when every key has
        # len >= 2m, so prefix-OR-suffix bucketing is complete for k=1
        min_len = min(
            left.select(F.min(F.length(on))).first()[0] or 0,
            right.select(F.min(F.length(on))).first()[0] or 0,
        )
        if min_len < 2:
            raise ValueError(
                f"segment method needs every key >= 2 chars (min={min_len})"
            )
        m = min_len // 2
        buckets = []
        for part in (
            lambda c: F.substring(c, 1, m),
            lambda c: F.substring(c, -m, m),
        ):
            lb = left.select(
                F.col(left_id).alias("l_id"),
                F.col(on).alias("l_key"),
                part(F.col(on)).alias("__b"),
            )
            rb = right.select(
                F.col(right_id).alias("r_id"),
                F.col(on).alias("r_key"),
                part(F.col(on)).alias("__b"),
            )
            buckets.append(lb.join(rb, "__b").drop("__b"))
        cand = buckets[0].unionByName(buckets[1])
    else:
        raise ValueError(f"unknown method {method!r}")

    dist = F.levenshtein("l_key", "r_key")
    return (
        cand.where(dist <= k)
        .select(
            F.col("l_id").alias(left_id),
            F.col("r_id").alias(right_id),
            dist.alias("dist"),
        )
        .distinct()
    )
