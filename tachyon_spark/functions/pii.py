"""PII detection and redaction for training-data pipelines.

Standard corpus-hygiene step before pretraining: find and replace
personally identifiable substrings (emails, IPv4 addresses, SSN-shaped
ids, long digit runs / phone shapes) with typed placeholder tokens, and
report per-document match counts so the pipeline can drop or audit
PII-dense documents.

Everything is JVM-side `regexp_replace` / `regexp_count` — no UDFs,
narrow projections over the scan (the only exchange is spread()'s
small-file-input repartition, a no-op at real scan widths; composes with predicate
pushdown; at 100 TB this runs at scan speed). The patterns deliberately
use the regex subset shared by Java (Spark), RE2, and PCRE — no
lookarounds, no backreferences — so the same pattern strings replay
bit-for-bit in other engines (the DuckDB oracle runs these exact
strings).

Redaction applies in a fixed order (EMAIL → IP → SSN → PHONE) and each
stage operates on the previous stage's output, so placeholder text can
never be re-matched by a later pattern (placeholders contain no digits
or '@').
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ordered: applied top to bottom; counts are measured on the ORIGINAL text
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # phone-shaped: international prefix optional, 9+ digits with
    # separators; anchored on word boundaries to avoid eating ids inside
    # longer tokens
    ("phone", r"\b\+?\d[\d. -]{7,}\d\b", "<PHONE>"),
]


def scrub_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per document: (id, n_email, n_ip, n_ssn, n_phone, clean) —
    per-category counts plus the fully redacted text. Each category is
    counted on the text AS THAT STAGE SEES IT (i.e. after the earlier
    redactions), so every match is counted by exactly one category even
    where patterns overlap (an SSN is phone-shaped; it counts as SSN
    only, because the phone stage runs on SSN-redacted text)."""
    # Eight regex passes per row is the dominant cost — a small-file
    # corpus must not serialize them on one core (spread() is a no-op at
    # real scan widths; r12 measured 3.0 s -> 0.6 s on the 10x-replicated
    # single-file bench table).
    #
    # Counts use regexp_count — same non-overlapping match count as
    # size(regexp_extract_all) without materializing the match array;
    # NULL text propagates NULL counts/clean exactly as before.
    #
    # r12 perf note: per-stage containment guards (contains('@') /
    # rlike digit wrapped in when()) were measured and REVERTED — Spark's
    # codegen subexpression elimination skips conditionally-evaluated
    # branches, so the guards force each count column to RECOMPUTE the
    # staged replace chain (2x slower on PII-dense rows at sf0.1; the
    # unconditional chain is CSE-shared across all five output columns).
    # A regex scan over guaranteed-miss prose is already near-linear, so
    # the unconditional form wins on both corpus shapes.
    from tachyon_spark.functions.util import spread

    df = spread(df)
    clean = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(F.regexp_count(clean, F.lit(pat)).alias(f"n_{name}"))
        clean = F.regexp_replace(clean, pat, repl)
    return df.select(F.col(id_col), *counts, clean.alias("clean"))


def pii_density(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_pii, n_tok, pii_per_100_tok) — the drop/keep signal: a
    document whose PII density is high is usually a directory dump or a
    leak, not prose. Whitespace token count matches textstats."""
    from tachyon_spark.functions.util import spread

    df = spread(df)
    text = F.col(text_col)
    clean = text
    n_pii = None
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_count(clean, F.lit(pat))
        n_pii = c if n_pii is None else n_pii + c
        clean = F.regexp_replace(clean, pat, repl)  # staged, like scrub_pii
    n_tok = F.size(F.split(text, " "))
    # single narrow projection — no join, no shuffle
    return df.select(
        F.col(id_col),
        n_pii.alias("n_pii"),
        n_tok.alias("n_tok"),
        F.round(n_pii * 100.0 / n_tok, 6).alias("pii_per_100_tok"),
    )
