"""Fuzzy string joins (record linkage / entity resolution within edit
distance k) — the missing piece between exact dedup (functions/dedup.py,
equality) and MinHash near-dup (set overlap): TYPO-level matching, e.g.
joining scraped titles/URLs/author names against a canonical table where
the only differences are single-character edits.

All methods are CANDIDATE GENERATION BY BUCKETED EQUI-JOIN followed by an
exact `levenshtein` verify — never an all-pairs comparison — and every
generator is provably COMPLETE (a superset of the true pair set), so
verify-after-block returns exactly the pairs within distance k:

- "neighborhood" (FastSS / SymSpell family): every string expands to its
  deletion neighborhood (all strings reachable by deleting <= k chars);
  lev(a,b) <= k implies the neighborhoods intersect (delete the edited
  positions from each side of any <=k-op edit script and the remainders
  coincide), so an equi-join on variants finds every true pair. Explode
  factor is C(len, k)-ish per row — linear in data for fixed k, and each
  variant bucket stays small when keys are near-distinct (the join is a
  plain hash equi-join that shuffles only (variant, id, key)).

- "segment" (PassJoin, Li et al. PVLDB 2011, re-derived; any k >= 0):
  each RIGHT key is evenly partitioned into k+1 contiguous segments by
  ITS OWN length. Pigeonhole: a <=k-op edit script cannot touch all k+1
  segments, so if lev(s, r) <= k then s CONTAINS a substring equal to at
  least one segment of r, starting within +-k of that segment's position
  in r. The left side therefore emits, per key s, every substring that
  could be such a segment — for each plausible right length
  L in [len(s)-k, len(s)+k], each segment index j, each start within the
  +-k shift window — and the join key is (j, L, substring) ==
  (j, len(r), segment). Explode factor is O(k^3) per left row and k+1
  per right row — INDEPENDENT of key length, the cheap shape for long
  keys where the deletion neighborhood is ~len^k/k!. Per-row lengths:
  no corpus-global statistic, no eager action at plan-build, one short
  outlier key affects only itself. Right keys shorter than k+1 chars
  cannot be segmented; pairs involving them necessarily have BOTH sides
  <= 2k chars (lev bounds the length gap by k), so a tiny
  deletion-neighborhood arm over the <=2k-char subset completes the
  candidate set.

- "prefix_suffix" (k=1 only): the fixed-width two-bucket pigeonhole — a
  single edit cannot touch both the first m and last m characters of
  keys with len >= 2m, so pairs within distance 1 agree on prefix_m OR
  suffix_m. Two equi-joins + union + verify, zero explode. `m` is
  caller-supplied (completeness precondition: every key has len >= 2m —
  the caller asserts it); when omitted it is derived from the corpus
  min length with ONE eager aggregate at plan-build time (documented
  cost), and an empty side yields an empty result rather than an error.
  Prefer method="segment", which gets the same explode-free shape with
  per-row widths.

At 100 TB every shape is shuffle-bounded by the candidate pair count:
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


def _even_partition(L, kk: int):
    """(base, rem) of splitting a length-L string into kk contiguous
    segments: segment j (0-based) has length base + (j < rem) and starts
    at 1-based position j*base + min(j, rem) + 1."""
    base = F.floor(L / kk).cast("int")
    rem = (L % kk).cast("int")
    return base, rem


def _passjoin_right(df: DataFrame, id_col: str, key_col: str,
                    k: int) -> DataFrame:
    """Each right key (len >= k+1) → its k+1 even segments, keyed
    (j, len, segment)."""
    c = F.col(key_col)
    n = F.length(c)
    base, rem = _even_partition(n, k + 1)
    segs = F.transform(
        F.sequence(F.lit(0), F.lit(k)),
        lambda j: F.struct(
            j.cast("int").alias("j"),
            c.substr(
                (j.cast("int") * base + F.least(j.cast("int"), rem) + 1),
                (base + F.when(j.cast("int") < rem, F.lit(1))
                 .otherwise(F.lit(0))),
            ).alias("sub"),
        ),
    )
    return (
        df.where(F.length(key_col) >= k + 1)
        .select(
            F.col(id_col).alias("r_id"),
            c.alias("r_key"),
            n.cast("int").alias("__L"),
            F.explode(segs).alias("__c"),
        )
        .select(
            "r_id", "r_key", "__L",
            F.col("__c.j").alias("__j"),
            F.col("__c.sub").alias("__sub"),
        )
    )


def _passjoin_left(df: DataFrame, id_col: str, key_col: str,
                   k: int) -> DataFrame:
    """Each left key → every substring that could equal a segment of a
    right key within distance k: for each right length L in
    [len-k, len+k] (L >= k+1), each segment index j, each start within
    the +-k shift window. All SQL HOFs — JVM-side, no Python rows."""
    c = F.col(key_col)
    n = F.length(c)
    kk = k + 1

    def per_j(L, j):
        base, rem = _even_partition(L, kk)
        j = j.cast("int")
        seg_len = base + F.when(j < rem, F.lit(1)).otherwise(F.lit(0))
        seg_pos = j * base + F.least(j, rem) + 1
        qmin = F.greatest(F.lit(1), seg_pos - k)
        qmax = F.least(n - seg_len + 1, seg_pos + k)
        gen = F.transform(
            # greatest() keeps the sequence ascending when the window is
            # empty (sequence(a, b) DESCENDS for a > b); slice() then
            # trims to the true (possibly zero) window size
            F.sequence(qmin, F.greatest(qmin, qmax)),
            lambda q: F.struct(
                j.alias("j"),
                L.cast("int").alias("L"),
                c.substr(q.cast("int"), seg_len).alias("sub"),
            ),
        )
        return F.slice(gen, 1, F.greatest(qmax - qmin + 1, F.lit(0)))

    def per_L(L):
        inner = F.flatten(
            F.transform(F.sequence(F.lit(0), F.lit(k)),
                        lambda j: per_j(L, j))
        )
        # lengths below k+1 are unsegmentable (handled by the short arm)
        return F.when(L >= kk, inner).otherwise(F.slice(inner, 1, 0))

    arr = F.array_distinct(
        F.flatten(F.transform(F.sequence(n - k, n + k), per_L))
    )
    return (
        df.where(F.length(key_col) > 0)
        .select(
            F.col(id_col).alias("l_id"),
            c.alias("l_key"),
            F.explode(arr).alias("__c"),
        )
        .select(
            "l_id", "l_key",
            F.col("__c.j").alias("__j"),
            F.col("__c.L").alias("__L"),
            F.col("__c.sub").alias("__sub"),
        )
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    k: int = 1,
    method: str = "neighborhood",
    left_id: str = "left_id",
    right_id: str = "right_id",
    m: int | None = None,
) -> DataFrame:
    """All (left, right) pairs whose `on` strings are within Levenshtein
    distance `k`. Returns (left_id, right_id, dist) — exact distances,
    full recall (see module docstring for the completeness argument per
    method). `left`/`right` must carry `left_id`/`right_id` columns plus
    the `on` string column; NULL or empty keys never match.

    method="neighborhood" supports any small k (explode ~len^k/k! per
    row); method="segment" (PassJoin) supports any k with O(k^3)
    length-independent explode — the default choice for long keys;
    method="prefix_suffix" is the legacy explode-free k=1 shape
    (`m` caller-supplied, else one eager corpus-min aggregate)."""
    if method == "neighborhood":
        lv = _explode_variants(left, left_id, on, k, "l")
        rv = _explode_variants(right, right_id, on, k, "r")
        cand = lv.join(rv, "__variant").drop("__variant")
    elif method == "segment":
        if k < 0:
            raise ValueError(f"k must be >= 0, got {k}")
        lv = _passjoin_left(left, left_id, on, k)
        rv = _passjoin_right(right, right_id, on, k)
        cand = lv.join(rv, ["__j", "__L", "__sub"]).select(
            "l_id", "l_key", "r_id", "r_key"
        )
        if k >= 1:
            # pairs whose RIGHT key is shorter than k+1 chars cannot be
            # segmented; lev <= k bounds both sides to <= 2k chars, so a
            # deletion-neighborhood arm over that tiny subset completes
            # the candidate set (variants of <=2k-char strings: O(4^k))
            sl = left.where(F.length(on).between(1, 2 * k))
            sr = right.where(F.length(on).between(1, k))
            short = (
                _explode_variants(sl, left_id, on, k, "l")
                .join(_explode_variants(sr, right_id, on, k, "r"),
                      "__variant")
                .select("l_id", "l_key", "r_id", "r_key")
            )
            cand = cand.unionByName(short)
    elif method == "prefix_suffix":
        if k != 1:
            raise ValueError("prefix_suffix method supports k=1 only")
        left = left.where(F.length(on) > 0)
        right = right.where(F.length(on) > 0)
        if m is None:
            # corpus-derived m: TWO tiny eager aggregates at plan-build
            # time (documented cost — pass m explicitly to stay lazy);
            # an empty side means no pairs, returned lazily as a typed
            # empty frame rather than raised
            mins = [
                s.select(F.min(F.length(on))).first()[0]
                for s in (left, right)
            ]
            if any(v is None for v in mins):
                return (
                    left.limit(0)
                    .select(F.col(left_id))
                    .crossJoin(right.limit(0).select(F.col(right_id)))
                    .withColumn("dist", F.lit(0).cast("int"))
                )
            min_len = min(mins)
            if min_len < 2:
                raise ValueError(
                    "prefix_suffix needs every key >= 2 chars "
                    f"(min={min_len}); use method='segment' instead"
                )
            m = min_len // 2
        if m < 1:
            raise ValueError(f"m must be >= 1, got {m}")
        # completeness precondition with caller-supplied m: every key
        # has len >= 2m (one edit cannot clear both ends) — the caller
        # asserts it; keys the corpus-min derivation saw satisfy it by
        # construction
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
