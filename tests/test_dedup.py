import pytest

from pyspark.sql import functions as F

from tachyon_spark.functions.dedup import (
    MERSENNE31,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash_pairs,
)
from tachyon_spark.functions.similarity import brute_force_cosine_topk, lsh_cosine_topk

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
    (3, "completely different text with no overlap at all here"),
    (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_shingles(docs):
    sh = shingles(docs, n=3).collect()
    by_id = {}
    for r in sh:
        by_id.setdefault(r.id, set()).add(r.shingle)
    assert "the quick brown" in by_id[1]
    assert "over the lazy" in by_id[2]
    assert len(by_id[1]) == 7  # 9 tokens -> 7 trigrams, all distinct
    assert by_id[1] == by_id[4]


def test_exact_dedup(docs):
    kept = {r.doc_id for r in exact_dedup(docs).collect()}
    assert kept == {1, 2, 3}  # doc 4 deduped to min id 1


def test_ngram_jaccard_pairs(docs):
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in ngram_jaccard_pairs(docs, 0.5).collect()}
    assert pairs[(1, 4)] == 1.0
    # docs 1,2 share 6 of their 8 distinct union trigrams -> 0.75
    assert abs(pairs[(1, 2)] - 0.75) < 1e-6
    assert (1, 3) not in pairs


def test_ngram_jaccard_max_postings(docs):
    """Stop-shingle cap: same pairs with exact jaccard values as the exact
    path here (the shared trigrams are below the cap)."""
    exact = {(r.doc_a, r.doc_b): r.jaccard for r in ngram_jaccard_pairs(docs, 0.5).collect()}
    capped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, 0.5, max_postings=3).collect()
    }
    assert capped == exact
    # cap of 1 kills every shared shingle -> no candidates at all
    assert ngram_jaccard_pairs(docs, 0.5, max_postings=0).count() == 0


def test_ngram_jaccard_hot_shingles_still_exact(spark):
    """r16: the capped path counts capped-shingle intersections during
    candidate generation and recounts ONLY hot (df > cap) shingles per
    pair — this pins the hot branch: pairs found via capped shingles
    must still include every shared HOT shingle in their exact
    jaccard."""
    boiler = "shared boilerplate trailer text"
    rows = [
        (1, "alpha beta gamma delta " + boiler),
        (2, "alpha beta gamma epsilon " + boiler),
        (3, "one filler document body " + boiler),
        (4, "two filler document body " + boiler),
        (5, "six filler document body " + boiler),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, 0.3).collect()
    }
    # cap 4 < the boilerplate trigrams' df of 5 -> they are HOT; the
    # (1,2) pair is found via its capped "alpha beta gamma" overlap and
    # its jaccard must still count the shared boilerplate trigrams
    capped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, 0.3, max_postings=4).collect()
    }
    assert (1, 2) in capped
    assert capped[(1, 2)] == exact[(1, 2)]
    for k, v in capped.items():
        assert v == exact[k]


def test_decontaminate_ngram(spark):
    from tachyon_spark.functions.dedup import decontaminate_ngram

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "prefix words then the quick brown fox jumps over something"),
            (2, "totally unrelated content about spark aggregation plans"),
            (3, "quick brown fox jumps over the lazy dog exact suffix hit"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.n_hits for r in decontaminate_ngram(corpus, bench, n=5).collect()}
    # doc 1 shares 2 distinct 5-grams, doc 3 shares 4, doc 2 none
    assert out == {1: 2, 3: 4}
    strict = {r.doc_id for r in decontaminate_ngram(corpus, bench, n=5, min_hits=3).collect()}
    assert strict == {3}


def test_minhash_signatures_shape(docs):
    sigs = {r.id: r.sig for r in minhash_signatures(docs, 16).collect()}
    assert len(sigs) == 4 and all(len(s) == 16 for s in sigs.values())
    assert sigs[1] == sigs[4]  # identical shingle sets -> identical signatures
    assert all(0 <= h < MERSENNE31 for h in sigs[1])


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in minhash_lsh_pairs(docs, 16, 4, 0.5).collect()}
    assert pairs[(1, 4)] == 1.0  # identical sigs always collide
    assert (1, 3) not in pairs  # verification kills false positives


def test_simhash_pairs(docs):
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in simhash_pairs(docs, max_hamming=16).collect()}
    assert pairs[(1, 4)] == 0  # identical docs: distance 0
    # candidate blocking requires agreement on one 16-bit chunk, so only
    # assert reported pairs respect the bound
    assert all(h <= 16 for h in pairs.values())


def test_ivf_cosine_topk(spark):
    import random

    from tachyon_spark.functions.similarity import (
        brute_force_cosine_topk,
        ivf_cosine_topk,
        train_ivf_centroids,
    )

    rng = random.Random(11)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = [float(x) for x in rows[0][1]]
    cents = train_ivf_centroids(df, n_centroids=4, sample=200)
    assert len(cents) == 4 and all(len(c) == 8 for c in cents)
    exact = [r.vec_id for r in brute_force_cosine_topk(df, q, k=10).collect()]
    approx = [r.vec_id for r in ivf_cosine_topk(df, q, cents, k=10, nprobe=2).collect()]
    # query vector itself must be found; recall@10 over half the lists >= 50%
    assert approx[0] == 0
    assert len(set(exact) & set(approx)) >= 5


def test_embedding_near_dup_pairs(spark):
    """True near-dups (tiny perturbations) must be found with their exact
    cosine; unrelated vectors must not pair at a high threshold."""
    import random

    from tachyon_spark.functions.similarity import embedding_near_dup_pairs

    rnd = random.Random(5)
    base = [rnd.gauss(0, 1) for _ in range(64)]
    near = [x + rnd.gauss(0, 0.01) for x in base]
    rows = [(0, base), (1, near)] + [
        (i, [rnd.gauss(0, 1) for _ in range(64)]) for i in range(2, 100)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {
        (r.id_a, r.id_b): r.score
        for r in embedding_near_dup_pairs(df, threshold=0.95).collect()
    }
    assert set(pairs) == {(0, 1)} and pairs[(0, 1)] > 0.99


def test_ann_recall_on_real_embeddings(spark):
    """Recall@20 gates for both ANN paths against the exact scan, on the
    driver's real embeddings table (not synthetic gaussians)."""
    from pyspark.sql import functions as F

    from tachyon_spark.functions.similarity import (
        brute_force_cosine_topk,
        ivf_cosine_topk,
        lsh_cosine_topk,
        train_ivf_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).head().embedding]
    others = emb.where(F.col("vec_id") != 0)
    exact = {r.vec_id for r in brute_force_cosine_topk(others, q, k=20).collect()}

    cents = train_ivf_centroids(others, n_centroids=8, sample=1024)
    ivf = {r.vec_id for r in ivf_cosine_topk(others, q, cents, k=20, nprobe=2).collect()}
    assert len(exact & ivf) / 20 >= 0.3  # nprobe=2 of 8 k-means lists

    lsh = {r.vec_id for r in lsh_cosine_topk(others, q, k=20, planes=4, tables=8).collect()}
    assert len(exact & lsh) / 20 >= 0.45  # 8 OR-ed tables (single-table ~0.05)


def test_ivf_persisted_index_prunes_partitions(spark, tmp_path):
    """The persisted IVF layout: probing reads ONLY the nprobe list
    partitions (PartitionFilters on ivf_list) and returns exactly what the
    inline-filter form returns."""
    import contextlib
    import io
    import re

    from pyspark.sql import functions as F

    from tachyon_spark.functions.similarity import (
        ivf_build_index,
        ivf_cosine_topk,
        ivf_probe_index,
        train_ivf_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).head().embedding]
    others = emb.where(F.col("vec_id") != 0)
    cents = train_ivf_centroids(others, n_centroids=4, sample=1024)
    idx = str(tmp_path / "ivf_index")
    ivf_build_index(others, cents, idx)

    probed = ivf_probe_index(spark, idx, q, cents, k=10, nprobe=2)
    inline = ivf_cosine_topk(others, q, cents, k=10, nprobe=2)
    assert [(r.vec_id, round(r.score, 9)) for r in probed.collect()] == [
        (r.vec_id, round(r.score, 9)) for r in inline.collect()
    ]

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probed.explain("formatted")
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", buf.getvalue())
    assert m is not None and "ivf_list" in m.group(1), buf.getvalue()


def test_cosine_topk(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [-1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = brute_force_cosine_topk(df, [1.0, 0.0, 0.0], k=2).collect()
    assert [r.vec_id for r in out] == [1, 2]
    assert out[0].score == pytest.approx(1.0)
    # LSH probe returns a subset of brute force, led by the exact match
    lsh = lsh_cosine_topk(df, [1.0, 0.0, 0.0], k=2, planes=2).collect()
    assert lsh and lsh[0].vec_id == 1


def test_auto_planes_sizing():
    from tachyon_spark.functions.similarity import auto_planes

    assert auto_planes(10) == 4
    assert auto_planes(2_000) == 5  # ~64 vectors per expected bucket
    assert auto_planes(1_000_000) == 14
    assert auto_planes(10**9) == 24


def test_repetition_score_golden(spark):
    from tachyon_spark.functions.textstats import repetition_score

    df = spark.createDataFrame(
        [
            (1, "a b c a b c a b"),  # 6 grams, 3 distinct -> 0.5
            (2, "x y"),  # shorter than n -> 0.0
            (3, "p q r s"),  # 2 grams distinct -> 0.0
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.repetition for r in repetition_score(df, n=3).collect()}
    assert rows == {1: 0.5, 2: 0.0, 3: 0.0}


def test_lsh_plane_sign_margins_are_safe():
    """Canary for the documented hash-flake risk (COVERAGE.md determinism
    notes): LSH bucket parity between numpy (engine) and DuckDB list_sum
    (oracle) relies on no embedding lying numerically ON a hyperplane. The
    minimum |dot| across the shipped corpus is ~3.7e-5 — ten orders above
    double noise. If the driver regenerates embeddings and this fails, the
    LSH oracles may hash-flake: regenerate plane seeds, don't chase ghosts."""
    import numpy as np
    import pyarrow.parquet as pq

    from tachyon_spark.functions.similarity import _hyperplanes

    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    emb = np.array(t.column("embedding").to_pylist(), dtype=float)
    for planes, seed in [(8, 7), (4, 7)]:
        P = np.array(_hyperplanes(emb.shape[1], planes, seed))
        margin = np.abs(emb @ P.T).min()
        assert margin > 1e-8, f"plane-dot margin {margin:.2e} too tight"


def test_dedup_clusters_min_label(spark):
    from tachyon_spark.functions.dedup import dedup_clusters

    # two components: a chain {a,b,c,d} (diameter 3 — exercises multiple
    # propagation rounds) and a pair {x,y}
    pairs = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("c", "d"), ("x", "y")],
        "doc_a string, doc_b string",
    )
    got = {r.doc_id: r.cluster_rep for r in dedup_clusters(pairs).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a", "x": "x", "y": "x"}


def test_dedup_clusters_null_ids_terminate(spark):
    # ADVICE r15 #1: a null src/dst used to spin the driver fast path
    # forever (NaN != NaN). Nulls now fall through to the distributed
    # loop, whose join semantics define the public behavior: null edges
    # never match, null nodes label themselves.
    from tachyon_spark.functions.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [("a", None), ("b", "c")], "doc_a string, doc_b string"
    )
    got = {r.doc_id: r.cluster_rep for r in dedup_clusters(pairs).collect()}
    assert got == {"a": "a", None: None, "b": "b", "c": "b"}


def test_dedup_clusters_long_ids_and_long_chain(spark):
    # integer ids ride the 16-bytes-per-edge fast-path bound; the
    # 40-node chain (diameter 39) exercises the pointer-jumping rounds
    from tachyon_spark.functions.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "doc_a long, doc_b long"
    )
    got = {r.doc_id: r.cluster_rep for r in dedup_clusters(pairs).collect()}
    assert got == {i: 0 for i in range(41)}


def test_dedup_clusters_output_is_linear_in_members(spark):
    from tachyon_spark.functions.dedup import dedup_clusters, minhash_lsh_pairs

    # an all-identical family: pairs are O(n^2); clusters are O(n)
    n = 30
    docs = spark.createDataFrame(
        [(f"d{i:02d}", "the same exact text repeated here") for i in range(n)],
        "doc_id string, text string",
    )
    pairs = minhash_lsh_pairs(docs, 16, 4, 0.4, 3)
    assert pairs.count() == n * (n - 1) // 2  # the quadratic shape
    clusters = dedup_clusters(pairs).collect()
    assert len(clusters) == n  # the linear shape
    assert {r.cluster_rep for r in clusters} == {"d00"}
    # "keep one per cluster" composes: n - (clusters) + reps = 1 kept
    kept = {r.cluster_rep for r in clusters}
    assert len(kept) == 1


def test_hot_bucket_cap_bounds_candidates(spark):
    """Degenerate all-identical corpus: with max_bucket set, the quadratic
    family's buckets drop from candidate generation (bounded shuffle), the
    cap is surfaced in dedup_stats, and an unrelated small near-dup pair
    is still found through its own cool buckets."""
    from tachyon_spark.functions.dedup import minhash_lsh_pairs, simhash_pairs

    fam = [(f"h{i:02d}", "spam spam spam spam wonderful spam and eggs") for i in range(20)]
    pair = [
        ("p1", "a perfectly unique sentence about distributed query engines"),
        ("p2", "a perfectly unique sentence about distributed query planes"),
    ]
    docs = spark.createDataFrame(fam + pair, "doc_id string, text string")

    out = minhash_lsh_pairs(docs, 16, 4, 0.4, 3, max_bucket=5)
    rows = out.collect()
    ids = {d for r in rows for d in (r.doc_a, r.doc_b)}
    assert ("p1", "p2") in {(r.doc_a, r.doc_b) for r in rows}  # survivor
    assert not any(d.startswith("h") for d in ids)  # family capped away
    assert out.dedup_stats["max_bucket"] == 5
    assert out.dedup_stats["dropped_buckets"].count() > 0
    drop = out.dedup_stats["dropped_buckets"].collect()
    assert all(r.n_members == 20 for r in drop)

    # uncapped: the same corpus yields the full quadratic family
    full = minhash_lsh_pairs(docs, 16, 4, 0.4, 3)
    assert full.count() == 20 * 19 // 2 + 1
    assert full.dedup_stats["dropped_buckets"] is None

    # simhash: capped output = uncapped output minus the hot family's
    # pairs (the p1/p2 hamming distance is data-dependent, so compare
    # against the uncapped run rather than pinning it)
    sfull = {(r.doc_a, r.doc_b) for r in simhash_pairs(docs, max_hamming=8).collect()}
    sp = simhash_pairs(docs, max_hamming=8, max_bucket=5)
    scapped = {(r.doc_a, r.doc_b) for r in sp.collect()}
    assert scapped == {p for p in sfull if not p[0].startswith("h")}
    assert sp.dedup_stats["dropped_buckets"].count() > 0


def test_hot_bucket_cap_embedding_near_dup(spark):
    from tachyon_spark.functions.similarity import embedding_near_dup_pairs

    # 12 identical vectors (hot bucket) + 2 near-identical outliers
    hot = [(f"v{i:02d}", [1.0, 0.0, 0.0, 0.0]) for i in range(12)]
    cool = [("w1", [0.0, 1.0, 0.1, 0.0]), ("w2", [0.0, 1.0, 0.11, 0.0])]
    df = spark.createDataFrame(hot + cool, "vec_id string, embedding array<double>")
    out = embedding_near_dup_pairs(df, threshold=0.9, planes=4, tables=2, max_bucket=6)
    rows = out.collect()
    assert ("w1", "w2") in {(r.id_a, r.id_b) for r in rows}
    assert not any(r.id_a.startswith("v") for r in rows)
    assert out.dedup_stats["dropped_buckets"].count() > 0


def test_dedup_keep_best_composition(spark):
    from tachyon_spark.functions.dedup import dedup_clusters, dedup_keep_best

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 8)], "doc_id long, text string"
    )
    # two clusters {1,2,3} and {5,6}; 4 and 7 are singletons
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long"
    )
    clusters = dedup_clusters(pairs)
    scores = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.1), (5, 0.5), (6, 0.4), (7, 0.8)],
        "doc_id long, quality double",
    )
    keep = {r["doc_id"]: r["cluster_rep"] for r in dedup_keep_best(docs, clusters, scores).collect()}
    # cluster rep 1: best quality 0.9 tie between 2 and 3 -> lowest id 2
    assert keep == {2: 1, 5: 5, 4: None, 7: None}


def test_dup_span_stats(spark):
    from tachyon_spark.functions.dedup import dup_span_stats

    docs = spark.createDataFrame(
        [
            # 1 and 2 share the 10-token prefix; tails differ
            (1, "a b c d e f g h i j unique1 tail1 x1 y1 z1"),
            (2, "a b c d e f g h i j unique2 tail2 x2 y2 z2"),
            # no cross-doc 4-gram anywhere
            (3, "entirely different words that never recur elsewhere"),
            # shorter than k -> zero grams, zero dup
            (4, "too short"),
            # within-doc repetition only: not duplicated (min_docs=2 DISTINCT docs)
            (5, "p q r s p q r s p q r s p q r s"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dup_span_stats(docs, k=4).collect()}
    assert len(out) == 5
    # docs 1/2: duplicated 4-gram starts at pos 1..7 (within the shared
    # 10-token prefix) -> interval union covers tokens 1..10
    assert out[1].dup_tokens == 10 and out[2].dup_tokens == 10
    assert out[1].n_tokens == 15
    assert abs(out[1].dup_ratio - 10 / 15) < 1e-12
    assert out[3].dup_tokens == 0 and out[3].dup_ratio == 0.0
    assert out[4].dup_tokens == 0 and out[4].n_tokens == 2
    assert out[5].dup_tokens == 0  # self-repeats don't count across docs


def test_dup_span_stats_identical_corpus(spark):
    """Degenerate all-identical corpus: every token duplicated, and the
    cost stays linear (positions x 1 semi-join, no pair product)."""
    from tachyon_spark.functions.dedup import dup_span_stats

    text = " ".join(f"t{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(i, text) for i in range(30)], "doc_id long, text string"
    )
    rows = dup_span_stats(docs, k=8).collect()
    assert len(rows) == 30
    assert all(r.dup_tokens == 20 and r.dup_ratio == 1.0 for r in rows)


def test_semdedup(spark):
    from tachyon_spark.functions.similarity import semdedup

    # two tight semantic groups + one outlier; centroids = group axes
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),   # near-dup of 1 -> dropped (higher id)
        (3, [0.0, 1.0, 0.0]),
        (4, [0.01, 0.999, 0.0]),   # near-dup of 3 -> dropped
        (5, [0.0, 0.0, 1.0]),      # alone in its cluster -> kept
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    out = {r.vec_id: r for r in semdedup(emb, cents, threshold=0.95).collect()}
    assert len(out) == 5
    assert out[1].kept and not out[2].kept
    assert out[3].kept and not out[4].kept
    assert out[5].kept
    assert out[1].cluster == out[2].cluster == 0
    assert out[5].cluster == 2


def test_semdedup_hot_cluster_cap(spark):
    """A capped cluster keeps all members (conservative) and the drop is
    surfaced in dedup_stats, never silent."""
    from tachyon_spark.functions.similarity import semdedup

    rows = [(i, [1.0, 0.0]) for i in range(10)] + [(100, [0.0, 1.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [[1.0, 0.0], [0.0, 1.0]]
    out = semdedup(emb, cents, threshold=0.9, max_cluster=5)
    got = {r.vec_id: r for r in out.collect()}
    assert all(r.kept for r in got.values())  # hot cluster exempted
    stats = out.dedup_stats
    assert stats["max_bucket"] == 5
    dropped = stats["dropped_buckets"].collect()
    assert len(dropped) == 1 and dropped[0].n_members == 10
    # uncapped: 9 of the 10 identical vectors are dropped
    out2 = semdedup(emb, cents, threshold=0.9)
    assert sum(1 for r in out2.collect() if not r.kept) == 9


def test_strip_dup_spans(spark):
    from tachyon_spark.functions.dedup import strip_dup_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c d e unique1 x1 y1"),
            (2, "a b c d e unique2 x2 y2"),
            (3, "nothing shared here at all today"),
            (4, "a b c d e"),  # ENTIRE doc is the duplicated span
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in strip_dup_spans(docs, k=5).collect()}
    assert out[1].clean_text == "unique1 x1 y1" and out[1].n_kept == 3
    assert out[2].clean_text == "unique2 x2 y2"
    assert out[3].clean_text == docs.where("doc_id = 3").head().text
    assert out[4].clean_text == "" and out[4].n_kept == 0
    assert out[4].n_tokens == 5


def test_quantized_ann_recall_and_quantizer(spark):
    from pyspark.sql import functions as F
    from tachyon_spark.functions.similarity import (
        brute_force_cosine_topk,
        quantize_embeddings,
        quantized_cosine_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qvec = [float(x) for x in emb.where(F.col("vec_id") == 0).head().embedding]
    others = emb.where("vec_id != 0")
    exact = [r.vec_id for r in brute_force_cosine_topk(others, qvec, k=10).collect()]
    quant = [r.vec_id for r in quantized_cosine_topk(others, qvec, k=10).collect()]
    # int8 with exact rescore: high recall on real embeddings
    assert len(set(exact) & set(quant)) >= 9
    # quantizer invariants: codes in [-127,127], max|x| maps to ±127
    qd = quantize_embeddings(emb).limit(50).collect()
    for r in qd:
        assert all(-127 <= q <= 127 for q in r.qvec)
        assert max(abs(q) for q in r.qvec) == 127  # the max-magnitude element
        assert r.scale > 0


def test_hamming_pairs_full_recall(spark):
    """Pigeonhole blocking must find EVERY pair within max_hamming —
    compare against brute force on random 15-bit signatures."""
    import random

    from tachyon_spark.functions.dedup import hamming_pairs

    rnd = random.Random(5)
    sigs = [(i, rnd.randrange(1 << 15)) for i in range(120)]
    df = spark.createDataFrame(sigs, "id long, sig long")
    got = {(r.id_a, r.id_b): r.hamming
           for r in hamming_pairs(df, n_bits=15, max_hamming=2).collect()}
    want = {}
    for i, (ia, sa) in enumerate(sigs):
        for ib, sb in sigs[i + 1:]:
            h = bin(sa ^ sb).count("1")
            if h <= 2:
                want[(ia, ib)] = h
    assert got == want and len(want) > 0


def test_knn_graph_matches_brute_force_on_candidates(spark):
    """knn_graph: per-id top-k over LSH candidates; with enough tables the
    graph matches the exact brute-force graph on a small set."""
    import numpy as np

    from tachyon_spark.functions.similarity import knn_graph

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(40, 16)).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # many tables + few planes -> candidate recall ~1 on 40 vectors
    got = knn_graph(df, k=3, planes=2, tables=12).collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r["id"], []).append((r["rank"], r["neighbor_id"], r["score"]))
    # exact graph
    norms = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = np.round((norms @ norms.T).astype(np.float64), 6)
    ok = 0
    for i in range(40):
        order = sorted(
            ((sims[i, j], j) for j in range(40) if j != i),
            key=lambda p: (-p[0], p[1]),
        )[:3]
        expect = [j for _, j in order]
        gotn = [n for _, n, _ in sorted(by_id.get(i, []))]
        ok += gotn == expect
    assert ok >= 38  # allow boundary rounding wiggle, not recall misses
    # structural invariants: ranks are 1..k dense, no self edges
    for i, lst in by_id.items():
        ranks = sorted(r for r, _, _ in lst)
        assert ranks == list(range(1, len(ranks) + 1))
        assert all(n != i for _, n, _ in lst)


def test_knn_graph_deterministic_and_k_bound(spark):
    from tachyon_spark.functions.similarity import knn_graph

    rows = [(i, [float(i == j) for j in range(4)]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = sorted(map(tuple, knn_graph(df, k=2, planes=1, tables=4).collect()))
    b = sorted(map(tuple, knn_graph(df.repartition(3), k=2, planes=1, tables=4).collect()))
    assert a == b
    assert all(t[1] <= 2 for t in a)
    import pytest

    with pytest.raises(ValueError):
        knn_graph(df, k=0)


def test_source_overlap_matrix(spark):
    """source_overlap: distinct n-gram sets per source, shared counts,
    containment fractions and Jaccard per pair."""
    from tachyon_spark.functions.dedup import source_overlap

    docs = spark.createDataFrame(
        [
            (1, "a", "w x y z p q"),      # grams(3): wxy xyz yzp zpq
            (2, "b", "w x y z"),          # grams: wxy xyz
            (3, "c", "p p p p"),          # grams: ppp (distinct)
        ],
        ["doc_id", "source", "text"],
    )
    out = {(r.source_a, r.source_b): r for r in
           source_overlap(docs, n=3).collect()}
    ab = out[("a", "b")]
    assert (ab.shared, ab.grams_a, ab.grams_b) == (2, 4, 2)
    assert ab.containment_b == 1.0      # b's grams all appear in a
    assert ab.containment_a == 0.5
    assert ab.jaccard == 0.5            # 2 / (4 + 2 - 2)
    # disjoint pair emits nothing
    assert ("a", "c") not in out and ("b", "c") not in out


def test_embedding_pca_recovers_principal_direction(spark):
    import math
    import random

    from tachyon_spark.functions.similarity import embedding_pca

    rng = random.Random(3)
    axis = [1.0 / math.sqrt(2), 1.0 / math.sqrt(2), 0.0, 0.0]
    rows = []
    for i in range(300):
        t = rng.uniform(-10, 10)
        noise = [rng.gauss(0, 0.05) for _ in range(4)]
        rows.append((i, [t * a + e for a, e in zip(axis, noise)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    mean, comps, explained = embedding_pca(df, 2, dim=4)
    # first component aligns with the planted axis
    dot = abs(sum(a * c for a, c in zip(axis, comps[0])))
    assert dot > 0.999
    # descending, normalized variance-explained; dominant first
    assert explained[0] > 0.99 and explained[0] >= explained[1] >= 0
    # orthonormal components
    n0 = sum(c * c for c in comps[0])
    n1 = sum(c * c for c in comps[1])
    x01 = sum(a * b for a, b in zip(comps[0], comps[1]))
    assert abs(n0 - 1) < 1e-9 and abs(n1 - 1) < 1e-9 and abs(x01) < 1e-9


def test_pca_project_matches_numpy_and_handles_nulls(spark):
    import numpy as np

    from tachyon_spark.functions.similarity import (
        embedding_pca,
        pca_project,
    )

    rows = [(i, [float((i * j) % 5) for j in range(1, 7)])
            for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    mean, comps, _ = embedding_pca(df, 3, dim=6)
    out = {
        r["vec_id"]: r["p"]
        for r in pca_project(
            df, mean, comps, out_col="p"
        ).select("vec_id", "p").collect()
    }
    w, mu = np.asarray(comps), np.asarray(mean)
    for i, v in rows:
        exp = w @ (np.asarray(v) - mu)
        assert np.allclose(out[i], exp, atol=1e-12), i
    # NULL and wrong-length rows project to NULL
    bad = spark.createDataFrame(
        [(0, None), (1, [1.0, 2.0])],
        "vec_id long, embedding array<double>",
    )
    got = pca_project(bad, mean, comps, out_col="p").select("p").collect()
    assert [r["p"] for r in got] == [None, None]


def test_pca_then_ann_keeps_recall_on_fixture(spark):
    import numpy as np

    from tachyon_spark.functions.similarity import (
        brute_force_cosine_topk,
        embedding_pca,
        pca_project,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    mean, comps, _ = embedding_pca(emb, 32, dim=64)
    proj = pca_project(emb, mean, comps, out_col="p").select(
        "vec_id", F.col("p").alias("embedding")
    )
    qfull = [float(x) for x in emb.where(F.col("vec_id") == 0).head()[1]]
    qproj = (np.asarray(comps) @ (np.asarray(qfull) - np.asarray(mean))).tolist()
    full = {r["vec_id"] for r in brute_force_cosine_topk(
        emb.where(F.col("vec_id") != 0), qfull, k=20).collect()}
    half = {r["vec_id"] for r in brute_force_cosine_topk(
        proj.where(F.col("vec_id") != 0), qproj, k=20).collect()}
    # the 32-dim projection of direction-uniform 64-dim vectors keeps
    # over half the true top-20 (a collapsed projection would keep ~1)
    assert len(full & half) >= 10, len(full & half)
