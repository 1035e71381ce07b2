"""LLM-extension operator tests: text stats, dedup family, similarity
search, multimodal plumbing — small inline corpora with known answers."""

from __future__ import annotations

import pytest

import blackroad_data_pipeline_spark.llmops  # noqa: F401  (registers ops)
from pyspark.sql import functions as F
from blackroad_data_pipeline_spark.operators import apply_operator as op


@pytest.fixture()
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),      # exact dup of 0
        (2, "the quick brown fox leaps over the lazy dog"),      # near dup of 0
        (3, "el gato y el perro corren por la casa con los ninos"),
        (4, "completely different content about spark engines and data"),
        (5, "THE QUICK  brown fox jumps over the lazy dog"),     # case/ws dup of 0
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture()
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),   # near dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [0.7, 0.7, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


# -- text ---------------------------------------------------------------------


def test_text_stats(docs):
    got = {r["doc_id"]: r for r in op("text_stats", docs, {}).collect()}
    assert got[0]["n_tokens"] == 9
    assert got[0]["n_chars_calc"] == len("the quick brown fox jumps over the lazy dog")
    assert got[0]["punct_ratio"] == 0.0
    assert got[5]["upper_ratio"] > 0.05


def test_token_count(spark):
    df = spark.createDataFrame([(0, "hello, world! x2")], ["doc_id", "text"])
    r = op("token_count", df, {}).collect()[0]
    assert r["ws_tokens"] == 3
    # hello , world ! x 2  -> 6 BPE-ish tokens
    assert r["bpeish_tokens"] == 6


def test_quality_score(docs, spark):
    got = {r["doc_id"]: r["quality_score"] for r in op("quality_score", docs, {}).collect()}
    assert got[0] == 1.0  # long enough, no punct, has stopwords
    junk = spark.createDataFrame([(9, "!!! ??? ...")], ["doc_id", "text"])
    assert op("quality_score", junk, {}).collect()[0]["quality_score"] < 0.5


def test_lang_id(docs):
    got = {r["doc_id"]: r["lang_pred"] for r in op("lang_id", docs, {}).collect()}
    assert got[0] == "en"
    assert got[3] == "es"


def test_fingerprint_normalizes(docs):
    got = {r["doc_id"]: r["fingerprint"] for r in op("fingerprint", docs, {}).collect()}
    assert got[0] == got[1] == got[5]   # exact + case/whitespace dups collide
    assert got[0] != got[2]


def test_winnow_guarantee_and_edges(spark):
    # winnowing guarantee: substrings of length >= window + k - 1
    # shared between docs must share at least one fingerprint HASH
    shared = "a very distinctive shared passage of text"
    rows = [(1, "prefix one " + shared + " suffix alpha"),
            (2, "totally different opening, " + shared + ", other end"),
            (3, "no overlap with the others whatsoever here"),
            (4, "abc"),        # shorter than k -> no fingerprints
            (5, "abcdefg")]    # 3 grams < window -> exactly one
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = op("winnow", df, {"k": 5, "window": 4}, views={})
    fps = {}
    for r in out.collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[1] & fps[2]                  # guarantee holds
    # overlap with the shared passage dwarfs incidental gram collisions
    assert len(fps[1] & fps[2]) > len(fps[1] & fps[3])
    assert 4 not in fps
    assert len(fps[5]) == 1
    # density ~ 2/(window+1): well under one fp per gram
    n_grams1 = len("prefix one " + shared + " suffix alpha") - 4
    assert len(fps[1]) < n_grams1 * 0.75


def test_winnow_position_shift_invariance(spark):
    # the SAME tail text at different offsets selects the same HASHES
    # (positions differ) — the property minhash-over-doc loses
    tail = " common document body repeated verbatim in both documents"
    df = spark.createDataFrame(
        [(1, "x" + tail), (2, "yyyyyyyyyyyyyyyyyyyy" + tail)],
        "doc_id long, text string")
    out = op("winnow", df, {"k": 5, "window": 4}, views={})
    fps = {}
    for r in out.collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    inter = fps[1] & fps[2]
    assert len(inter) >= len(fps[1]) * 0.5


def test_winnow_validation_and_plan(spark, monkeypatch):
    # knob-off: the shuffle budgets below pin the AT-SCALE plan shape,
    # where fan_out is a structural no-op (inputs already wide). The
    # LocalRelation fixture is 1 partition, so without the knob
    # fan_out legitimately adds its widening exchange.
    monkeypatch.setenv("SPARK_GRAFT_KERNEL_FANOUT", "0")
    df = spark.createDataFrame([(1, "hello world")],
                               "doc_id long, text string")
    with pytest.raises(ValueError, match="k and window"):
        op("winnow", df, {"k": 0}, views={})
    from blackroad_data_pipeline_spark.plans import quality as plans

    with pytest.raises(ValueError, match="impl"):
        op("winnow", df, {"impl": "rust"}, views={})
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        # default (arrow kernel): doc-local -> ZERO shuffles
        out = op("winnow", df, {}, views={})
        plans.assert_no_row_python(out)
        plans.assert_max_shuffles(out, 0)
        # jvm path: the one documented id shuffle
        outj = op("winnow", df, {"impl": "jvm"}, views={})
        plans.assert_no_row_python(outj)
        plans.assert_max_shuffles(outj, 1)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_winnow_arrow_jvm_parity(spark):
    """impl='arrow' (zero-shuffle mapInPandas kernel) and impl='jvm'
    (explode + LAG window) must be byte-identical — including
    rightmost-tie selection on degenerate all-equal hashes, short and
    NULL docs, Java-\\s-only whitespace collapse (NBSP must NOT
    collapse), and non-ASCII lowercasing."""
    rows = [(1, "the quick brown fox jumps over the lazy dog"),
            (2, "aaaaaaaaaaaa"),
            (3, "abc"), (4, None),
            (5, "ab\u00a0cd efgh\u00a0ijkl"),   # real NBSPs
            (6, "  MiXeD   Case\tand\nnewlines  "),
            (7, "abcdefg"),
            (8, "ÉLAN déjà vu naïve")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for cfg in ({"k": 5, "window": 4}, {"k": 2, "window": 7},
                {"k": 1, "window": 1}):
        a = sorted(map(tuple, op("winnow", df, {**cfg, "impl": "arrow"},
                                 views={}).collect()))
        j = sorted(map(tuple, op("winnow", df, {**cfg, "impl": "jvm"},
                                 views={}).collect()))
        assert a and a == j, cfg


# -- dedup --------------------------------------------------------------------


def test_dedup_exact(docs):
    kept = sorted(r["doc_id"] for r in op("dedup_exact", docs, {}).collect())
    assert kept == [0, 2, 3, 4]  # 1 and 5 are content-dups of 0; min id wins


def test_minhash_signature_shape(docs):
    r = op("minhash", docs, {"num_hashes": 16}).collect()[0]
    assert len(r["minhash_sig"]) == 16


def test_minhash_signature_positions_are_independent_hashes(spark):
    """Regression: a ``lambda s, i=i:`` seed capture makes pyspark bind
    the second lambda arg to the ARRAY INDEX, collapsing every
    signature position to one hash family (signatures become a single
    effective band and LSH recall silently dies). Positions must
    differ, and near-identical sets must agree on most positions."""
    df = spark.createDataFrame(
        [(1, ["a", "b", "c", "d", "e", "f", "g", "h"]),
         (2, ["a", "b", "c", "d", "e", "f", "g", "x"])],
        "id long, sh array<string>")
    from blackroad_data_pipeline_spark.llmops.dedup import minhash_signature
    from pyspark.sql import functions as F

    r1, r2 = sorted(
        df.withColumn("sig", minhash_signature(F.col("sh"), 16)).collect(),
        key=lambda r: r.id)
    assert len(set(r1.sig)) > 4          # 16 distinct hash families
    agree = sum(1 for x, y in zip(r1.sig, r2.sig) if x == y)
    assert 4 <= agree < 16               # j=7/9: most but not all agree


def test_near_dup_minhash_pairs(docs):
    # shingle_size=2: jaccard(0,2) = 6/10 = 0.6; rows_per_band=1 makes
    # band recall ~1 at that similarity, so the candidate is deterministic
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in op("near_dup_minhash", docs,
                         {"threshold": 0.5, "shingle_size": 2,
                          "bands": 16, "rows_per_band": 1}).collect()}
    assert pairs[(0, 1)] == 1.0        # identical text
    assert (0, 2) in pairs             # one-word edit
    assert pairs[(0, 2)] < 1.0
    assert not any({a, b} == {0, 4} for a, b in pairs)


def test_near_dup_minhash_leaves_no_cache(spark, docs):
    """near_dup_minhash holds NO persisted state: signatures come from
    one Arrow kernel pass (shared across both self-join branches via
    the bucket-key repartition) and verification shingles only the
    semi-join-pruned candidate docs — a long-lived service running
    many near-dup jobs must not accumulate persisted corpora."""
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    out = op("near_dup_minhash", docs,
             {"threshold": 0.5, "shingle_size": 2,
              "bands": 16, "rows_per_band": 1})
    assert out.count() >= 2
    assert jsc.getPersistentRDDs().size() == before


def test_near_dup_minhash_max_bucket_caps_boilerplate(spark):
    """The band-bucket self-join is O(|bucket|²) per bucket; a
    boilerplate-heavy bucket goes quadratic at corpus scale (VERDICT
    r6 #5). ``max_bucket`` drops over-full buckets BEFORE the join
    (the winnow_overlap max_postings pattern): a 200-doc identical
    clique contributes zero candidates under a 50 cap, while a
    2-doc near-dup pair in its own buckets is untouched. Default
    (0 = uncapped) keeps exact-parity behavior."""
    boiler = "the same license header text repeated for every file"
    rows = [(i, boiler) for i in range(200)]
    rows += [(1000, "quick brown fox jumps over the lazy dog tonight"),
             (1001, "quick brown fox jumps over the lazy dog today")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = {"threshold": 0.5, "shingle_size": 2, "bands": 8,
           "rows_per_band": 1}
    capped = op("near_dup_minhash", df, {**cfg, "max_bucket": 50}).collect()
    assert {(r["id_a"], r["id_b"]) for r in capped} == {(1000, 1001)}
    # uncapped default still finds the boilerplate clique
    assert op("near_dup_minhash", df, cfg) \
        .filter("id_a = 0 AND id_b = 1").count() == 1
    with pytest.raises(ValueError, match="max_bucket"):
        op("near_dup_minhash", df, {**cfg, "max_bucket": 1})


def test_dedup_near_against_max_bucket_caps_history_buckets(spark):
    """Same hazard on the incremental path: a history band bucket
    with H docs multiplies every matching batch doc by H. The cap
    drops over-full HISTORY buckets — a boilerplate batch doc then
    survives dedup (the documented recall trade; route boilerplate
    through dedup_exact first), while normal near-dups still drop."""
    boiler = "the same license header text repeated for every file"
    hist = spark.createDataFrame(
        [(i, boiler) for i in range(100)]
        + [(500, "quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string")
    batch = spark.createDataFrame(
        [(9000, boiler),
         (9001, "quick brown fox jumps over the lazy dog tonight"),
         (9002, "totally unrelated content about spark physical plans")],
        "doc_id long, text string")
    cfg = {"threshold": 0.5, "shingle_size": 2, "bands": 8,
           "rows_per_band": 1, "history": hist}
    kept_un = sorted(r["doc_id"] for r in
                     op("dedup_near_against", batch, cfg).collect())
    assert kept_un == [9002]
    kept_cap = sorted(r["doc_id"] for r in
                      op("dedup_near_against", batch,
                         {**cfg, "max_bucket": 50}).collect())
    assert kept_cap == [9000, 9002]    # boilerplate bucket dropped


def test_dedup_near_minhash(docs):
    kept = sorted(r["doc_id"] for r in
                  op("dedup_near_minhash", docs, {"threshold": 0.5}).collect())
    assert 0 in kept and 4 in kept and 3 in kept
    assert 1 not in kept  # dup of smaller id 0


def test_simhash_deterministic_and_near(docs):
    got = {r["doc_id"]: r["simhash"] for r in op("simhash", docs, {}).collect()}
    assert got[0] == got[1]
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in op("near_dup_simhash", docs, {"max_distance": 16}).collect()}
    assert pairs[(0, 1)] == 0
    assert (0, 2) in pairs and 0 < pairs[(0, 2)] <= 16


def test_ngram_jaccard_join(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in op("ngram_jaccard_join", docs,
                         {"threshold": 0.3, "shingle_size": 2}).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs


# -- similarity ---------------------------------------------------------------


def test_ann_bruteforce(vecs):
    got = [r["vec_id"] for r in
           op("ann_bruteforce", vecs, {"probe_id": 0, "k": 3}).collect()]
    assert got[0] == 0          # the probe itself, cos=1
    assert got[1] == 1          # nearest real neighbor
    assert got[2] == 4


def test_ann_bruteforce_literal_probe(vecs):
    got = [r["vec_id"] for r in
           op("ann_bruteforce", vecs, {"probe": [0.0, 1.0, 0.0, 0.0], "k": 2}).collect()]
    assert got[0] == 2


def test_lsh_bucket_deterministic(vecs):
    a = {r["vec_id"]: r["lsh_bucket"] for r in
         op("lsh_bucket", vecs, {"dim": 4, "n_planes": 8}).collect()}
    b = {r["vec_id"]: r["lsh_bucket"] for r in
         op("lsh_bucket", vecs, {"dim": 4, "n_planes": 8}).collect()}
    assert a == b
    assert a[0] == a[1]  # near-identical vectors share a bucket


def test_ann_lsh_finds_near_neighbor(vecs):
    got = [r["vec_id"] for r in
           op("ann_lsh", vecs, {"probe_id": 0, "k": 3, "dim": 4, "n_planes": 4}).collect()]
    assert got[0] == 0 and 1 in got


def test_similarity_join_and_dedup_embedding(vecs):
    pairs = {(r["id_a"], r["id_b"]) for r in
             op("similarity_join", vecs,
                {"threshold": 0.99, "dim": 4, "n_planes": 4}).collect()}
    assert (0, 1) in pairs
    kept = sorted(r["vec_id"] for r in
                  op("dedup_embedding", vecs,
                     {"threshold": 0.99, "dim": 4, "n_planes": 4}).collect())
    assert 0 in kept and 1 not in kept


def test_similarity_join_multi_table_amplifies_recall(vecs):
    """L hash tables union their candidates: with enough tables the
    pair set must equal the exact brute-force result at the threshold
    (single-table recall is (1-theta/pi)^b per pair — low), and every
    reported cos_sim must clear the threshold (exact verification)."""
    # brute-force truth at 0.6: (0,1) cos~1; 4=[.7,.7] has cos~0.707
    # with 0, 1 and 2; all other pairs are orthogonal-ish
    exact = {(0, 1), (0, 4), (1, 4), (2, 4)}
    multi = op("similarity_join", vecs,
               {"threshold": 0.6, "dim": 4, "n_planes": 2, "n_tables": 16})
    rows = multi.collect()
    got = {(r["id_a"], r["id_b"]) for r in rows}
    assert got == exact and all(r["cos_sim"] >= 0.6 for r in rows)
    # no duplicate pairs despite multi-table candidate duplication
    assert len(rows) == len(got)


def _knn_truth(rows, k, exclude_self=True):
    """Brute-force top-k cosine truth (ties -> smaller neighbor id)."""
    import numpy as np

    ids = [i for i, _ in rows]
    mat = np.array([v for _, v in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    out = {}
    for qi, q in enumerate(ids):
        cand = [(-sims[qi, ni], n) for ni, n in enumerate(ids)
                if not (exclude_self and n == q)]
        out[q] = [n for _, n in sorted(cand)[:k]]
    return out


def test_knn_join_exhaustive_matches_bruteforce(vecs):
    """nprobe == n_cells probes every inverted list — the bucketed
    plan must equal exact all-pairs kNN for EVERY query."""
    rows = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.999, 0.01, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0, 0.0]), (3, [0.0, 0.0, 1.0, 0.0]),
            (4, [0.7, 0.7, 0.0, 0.0])]
    truth = _knn_truth(rows, k=2)
    got = {}
    for r in op("knn_join", vecs,
                {"k": 2, "n_cells": 2, "nprobe": 2, "refine": 1}).collect():
        got.setdefault(r["vec_id"], []).append((r["knn_rank"], r["neighbor_id"]))
    assert {q: [n for _, n in sorted(v)] for q, v in got.items()} == truth


def test_knn_join_lsh_mode_matches_exhaustive(vecs):
    """A recall~1 LSH geometry (2 planes x 16 tables) must recover the
    same ranked neighbor lists as the exhaustive-IVF exact path."""
    exact = {(r["vec_id"], r["knn_rank"], r["neighbor_id"]) for r in
             op("knn_join", vecs,
                {"k": 2, "n_cells": 2, "nprobe": 2}).collect()}
    lsh = {(r["vec_id"], r["knn_rank"], r["neighbor_id"]) for r in
           op("knn_join", vecs,
              {"k": 2, "method": "lsh", "dim": 4, "n_planes": 2,
               "n_tables": 16}).collect()}
    assert lsh == exact


def test_knn_join_index_mode_and_exclude_self(spark, vecs):
    """An external index searches only index vectors; with
    exclude_self off, a vector present on both sides is its own
    rank-1 neighbor at cos ~1."""
    idx = vecs.filter("vec_id % 2 = 0")  # 0, 2, 4
    out = op("knn_join", vecs, {"k": 1, "index": "idx", "n_cells": 2,
                                "nprobe": 2, "exclude_self": False},
             views={"idx": idx}).collect()
    got = {r["vec_id"]: r for r in out}
    assert set(got) == {0, 1, 2, 3, 4}
    assert all(r["neighbor_id"] % 2 == 0 for r in out)
    for q in (0, 2, 4):  # self is in the index -> rank 1, cos ~1
        assert got[q]["neighbor_id"] == q
        assert abs(got[q]["cos_sim"] - 1.0) < 1e-9


def test_knn_join_cogroup_equals_pairs_impl(spark):
    """The default cogrouped per-cell matmul kernel must produce the
    SAME ranked neighbor lists as the explicit pair-join impl (cos
    values may differ by accumulation-order ulps; ordering may not)."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cfg = {"k": 4, "n_cells": 8, "nprobe": 3, "refine": 1}
    cg = {(r["vec_id"], r["knn_rank"], r["neighbor_id"]) for r in
          op("knn_join", e, cfg).collect()}
    pr = {(r["vec_id"], r["knn_rank"], r["neighbor_id"]) for r in
          op("knn_join", e, {**cfg, "impl": "pairs"}).collect()}
    assert cg == pr and len(cg) == 4 * e.count()


def test_knn_join_null_embeddings_excluded(spark):
    """NULL embeddings neither query nor serve as neighbors."""
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, None), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>")
    out = op("knn_join", df, {"k": 3, "n_cells": 1, "nprobe": 1}).collect()
    assert {r["vec_id"] for r in out} == {0, 1, 3}
    assert all(r["neighbor_id"] != 2 for r in out)


# -- semdedup ------------------------------------------------------------------


def _semdedup_model(rows, dim, eps, n_cells, refine=1, keep="outlier",
                    scale=1e6):
    """Driver-side replay of op_semdedup's pinned fixed-point contract
    (seed_order='id'): quantize once, id-ordered seeds, truncated-
    integer-mean Lloyd rounds, argmax-cosine cells, then drop any row
    with an >= eps earlier row in keep order within its cell."""
    import numpy as np

    ids = np.array([i for i, _ in rows])
    Q = np.floor(np.array([v for _, v in rows], dtype=np.float64) * scale)
    k = min(n_cells, len(ids))
    cents = Q[np.argsort(ids)[:k]].copy()

    def norms(M):
        n = np.sqrt((M * M).sum(axis=1))
        return np.where(n == 0, 1.0, n)

    def assign(cs):
        cos = (Q @ cs.T) / (norms(Q)[:, None] * norms(cs)[None, :])
        return np.argmax(cos, axis=1)

    for _ in range(refine):
        cell = assign(cents)
        for c in range(k):
            m = cell == c
            if m.any():
                s = Q[m].sum(axis=0)
                cnt = m.sum()
                cents[c] = np.sign(s) * (np.abs(s) // cnt)
    cell = assign(cents)
    csim = (np.einsum("ij,ij->i", Q, cents[cell])
            / (norms(Q) * norms(cents)[cell]))
    dup = {}
    for c in range(k):
        m = np.where(cell == c)[0]
        order = (m[np.lexsort((ids[m], csim[m]))] if keep == "outlier"
                 else m[np.argsort(ids[m])])
        for j, r in enumerate(order):
            earlier = order[:j]
            cos = (Q[earlier] @ Q[r]) / (norms(Q)[earlier] * norms(Q)[r])
            dup[ids[r]] = bool((cos >= eps).any()) if j else False
    return {int(i): (int(cell[j]), bool(dup[ids[j]]))
            for j, i in enumerate(ids)}


def test_semdedup_matches_python_model(spark):
    """Cells and drop decisions on the sf0.001 corpus must equal the
    driver-side replay of the pinned fixed-point contract."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = [(r["vec_id"], list(r["embedding"])) for r in e.collect()]
    want = _semdedup_model(rows, dim=64, eps=0.3, n_cells=3, refine=2)
    got = {r["vec_id"]: (r["semdedup_cell"], r["is_dup"]) for r in
           op("semdedup", e, {"dim": 64, "eps": 0.3, "n_cells": 3,
                              "refine": 2, "seed_order": "id",
                              "action": "flag"}).collect()}
    assert got == want


def test_semdedup_filter_equals_flag_survivors(vecs):
    """action='filter' keeps exactly the rows flag mode marks
    is_dup=false, with the original schema untouched."""
    cfg = {"dim": 4, "eps": 0.9, "n_cells": 1, "seed_order": "id"}
    flags = op("semdedup", vecs, {**cfg, "action": "flag"}).collect()
    survivors = {r["vec_id"] for r in flags if not r["is_dup"]}
    out = op("semdedup", vecs, cfg)
    assert out.columns == vecs.columns
    assert {r["vec_id"] for r in out.collect()} == survivors
    # 0 and 1 are near-dups (cos ~0.99995): exactly one survives
    assert len({0, 1} & survivors) == 1


def test_semdedup_keep_policies(spark):
    """keep='outlier' keeps the duplicate FARTHEST from the cell
    centroid (the paper's rule); keep='min_id' keeps the smaller id.
    2 sits near the centroid of its {0,1,2} cluster-mates, so outlier
    keeps an edge vector while min_id keeps 0."""
    rows = [(0, [1.0, 0.05, 0.0]), (1, [1.0, -0.05, 0.0]),
            (2, [1.0, 0.0, 0.0]), (3, [0.0, 0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cfg = {"dim": 3, "eps": 0.99, "n_cells": 1, "seed_order": "id",
           "refine": 1, "action": "flag"}
    outlier = {r["vec_id"]: r for r in op("semdedup", df, cfg).collect()}
    kept = [i for i in (0, 1, 2) if not outlier[i]["is_dup"]]
    assert len(kept) == 1
    assert outlier[kept[0]]["centroid_sim"] == min(
        outlier[i]["centroid_sim"] for i in (0, 1, 2))
    min_id = {r["vec_id"]: r["is_dup"] for r in
              op("semdedup", df, {**cfg, "keep": "min_id"}).collect()}
    assert not min_id[0] and min_id[1] and min_id[2]
    assert not outlier[3]["is_dup"] and not min_id[3]


def test_semdedup_null_embeddings_never_dups(spark):
    """NULL-embedding rows are flagged false with NULL cell/sim and
    survive filter mode."""
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.001]), (2, None)],
        "vec_id long, embedding array<float>")
    cfg = {"dim": 2, "eps": 0.99, "n_cells": 1, "seed_order": "id"}
    flags = {r["vec_id"]: r for r in
             op("semdedup", df, {**cfg, "action": "flag"}).collect()}
    assert flags[2]["is_dup"] is False
    assert flags[2]["semdedup_cell"] is None
    assert 2 in {r["vec_id"] for r in op("semdedup", df, cfg).collect()}


def test_semdedup_guards(spark, vecs):
    """max_cell bounds the per-cell quadratic loudly; the fixed-point
    guard rejects values whose dots would lose bits past 2^53."""
    with pytest.raises(Exception, match="max_cell"):
        op("semdedup", vecs, {"dim": 4, "eps": 0.9, "n_cells": 1,
                              "seed_order": "id", "max_cell": 2,
                              "action": "flag"}).collect()
    big = spark.createDataFrame(
        [(0, [100.0, 0.0]), (1, [0.0, 100.0])],
        "vec_id long, embedding array<float>")
    with pytest.raises(Exception, match="quantized value"):
        # |q| = 1e8 > sqrt(2^53/2) ~ 6.7e7: exactness would be lost
        op("semdedup", big, {"dim": 2, "eps": 0.9, "n_cells": 1,
                             "seed_order": "id",
                             "action": "flag"}).collect()


# -- multimodal ---------------------------------------------------------------


def test_attach_binary_meta(docs):
    r = op("attach_binary", docs, {"media_type": "text/plain"}).collect()[0]
    assert r["media_meta"]["n_bytes"] == len(r["text"].encode())
    assert len(r["media_meta"]["sha256"]) == 64
    assert bytes(r["payload"]).decode() == r["text"]


def test_decode_image_stub_deterministic(docs):
    df = op("attach_binary", docs, {})
    a = {r["doc_id"]: (r["img_width"], r["img_height"])
         for r in op("decode_image", df, {}).collect()}
    b = {r["doc_id"]: (r["img_width"], r["img_height"])
         for r in op("decode_image", df, {}).collect()}
    assert a == b
    assert all(16 <= w < 256 and 16 <= h < 256 for w, h in a.values())
    assert a[0] == a[1]  # same payload -> same fake dims


def test_decode_image_strict_mode_raises_on_nonimages(docs):
    """fake_decode=False is strict on BOTH seam branches: without PIL
    it raises NotImplementedError; with PIL the text payloads fail to
    decode and the error propagates instead of stubbing."""
    df = op("attach_binary", docs, {})
    with pytest.raises(Exception,
                       match="NotImplementedError|PIL|identify|image"):
        op("decode_image", df, {"fake_decode": False}).collect()


def test_decode_and_resize_real_codec_path(spark):
    """Runs only when PIL is installed: a real PNG payload must come
    back with its true dimensions (not stub pseudo-dims) and resize
    must re-encode to the target size."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    buf = io.BytesIO()
    PIL_Image.new("RGB", (40, 30)).save(buf, format="PNG")
    df = spark.createDataFrame([(1, bytearray(buf.getvalue()))],
                               "doc_id long, payload binary")
    r = op("decode_image", df, {}).collect()[0]
    assert (r["img_width"], r["img_height"], r["img_mode"]) == (40, 30, "RGB")
    rz = op("resize_image", df, {"target_w": 8, "target_h": 6}).collect()[0]
    with PIL_Image.open(io.BytesIO(bytes(rz["resized_payload"]))) as img:
        assert (img.width, img.height) == (8, 6)


def test_decode_image_auto_mode_stubs_nonimages(docs):
    """Auto mode (default): payloads that aren't decodable images get
    deterministic stub dims tagged img_mode='STUB' — with or without
    PIL installed (text payloads are never valid images)."""
    df = op("attach_binary", docs, {})
    rows = op("decode_image", df, {}).collect()
    assert all(r["img_mode"] == "STUB" for r in rows)


def test_frame_sample(docs):
    df = op("attach_binary", docs, {})
    out = op("frame_sample", df, {"n_frames": 3}).collect()
    assert len(out) == 3 * docs.count()
    per_doc = [r for r in out if r["doc_id"] == 0]
    assert [r["frame_idx"] for r in per_doc] == [0, 1, 2]
    assert all(len(bytes(r["frame_payload"])) <= 16 for r in per_doc)


def test_resize_image_stub(docs):
    df = op("attach_binary", docs, {})
    out = op("resize_image", df, {"target_w": 32, "target_h": 32}).collect()
    assert all(r["resized_w"] == 32 and r["resized_h"] == 32 for r in out)
    assert all(len(bytes(r["resized_payload"])) <= 32 * 32 // 64 for r in out)


def test_audio_features_stub(docs):
    df = op("attach_binary", docs, {})
    out = op("audio_features", df, {"sample_rate": 8000}).collect()
    for r in out:
        n = len(bytes(r["payload"])) * 4
        assert r["audio_samples"] == n
        assert abs(r["audio_seconds"] - n / 8000) < 1e-9
        assert 0.0 <= r["audio_rms"] <= 1.0


def test_ivf_assign_groups_similar_vectors(vecs):
    out = {r["vec_id"]: r["ivf_cell"]
           for r in op("ivf_assign", vecs, {"n_cells": 3, "dim": 4}).collect()}
    assert out[0] == out[1]           # near-identical vectors share a cell
    assert len(set(out.values())) > 1  # and the corpus isn't one cell


def test_ann_ivf_matches_bruteforce_on_clustered_data(spark):
    import math
    rows = []
    for cid, base in enumerate([(1.0, 0.0), (0.0, 1.0)]):
        for i in range(20):
            t = (i + 1) / 200.0
            v = [base[0] + t, base[1] + t * 0.5, 0.0, 0.0]
            n = math.sqrt(sum(x * x for x in v))
            rows.append((cid * 100 + i, [x / n for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cfg = {"probe_id": 5, "k": 5, "n_cells": 2, "dim": 4}
    bf = [r["vec_id"] for r in op("ann_bruteforce", df, cfg).collect()]
    ivf = [r["vec_id"] for r in op("ann_ivf", df, {**cfg, "nprobe": 1}).collect()]
    assert ivf == bf  # probing 1 of 2 well-separated cells finds the true top-k


def test_simhash_batch_udf_matches_reference_fn(spark):
    """The batched vocab-dedup UDF must equal the per-doc reference
    implementation bit-for-bit."""
    from blackroad_data_pipeline_spark.llmops.dedup import _simhash64

    texts = ["the quick brown fox", "fox fox fox the", "", "one two three",
             "THE Quick brown FOX", "unique tokens only here"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["doc_id", "text"])
    got = {r["doc_id"]: r["simhash"] for r in op("simhash", df, {}).collect()}
    assert got == {i: _simhash64(t) for i, t in enumerate(texts)}


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3, pair 10-11, isolated edge 20-21; min-id labeling
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11), (21, 20)], ["id_a", "id_b"])
    got = {r["id"]: r["component"]
           for r in op("connected_components", edges, {}).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_long_path_converges(spark):
    n = 40  # path graph: diameter >> one hop, forces multiple rounds
    edges = spark.createDataFrame([(i, i + 1) for i in range(n)],
                                  ["id_a", "id_b"])
    # driver_threshold=0 forces the distributed pointer-jumping loop
    got = {r["id"]: r["component"]
           for r in op("connected_components", edges,
                       {"driver_threshold": 0}).collect()}
    assert set(got.values()) == {0} and len(got) == n + 1


def test_connected_components_driver_and_distributed_agree(spark):
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (7, 9), (9, 8), (20, 21)], ["id_a", "id_b"])
    fast = {(r["id"], r["component"])
            for r in op("connected_components", edges, {}).collect()}
    dist = {(r["id"], r["component"])
            for r in op("connected_components", edges,
                        {"driver_threshold": 0}).collect()}
    assert fast == dist
    assert dict(fast) == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 9: 7, 20: 20, 21: 20}


def test_dedup_near_groups_transitive(docs):
    """doc 2 is a near-dup of 0 via one edit; with components the
    whole {0,1,2,5}-ish cluster keeps exactly min id 0."""
    kept = sorted(r["doc_id"] for r in
                  op("dedup_near_groups", docs,
                     {"threshold": 0.5, "shingle_size": 2,
                      "bands": 16, "rows_per_band": 1}).collect())
    assert 0 in kept and 3 in kept and 4 in kept
    assert 1 not in kept and 2 not in kept


def test_ann_lsh_multi_probe_improves_recall(spark):
    import math
    rows = []
    for i in range(60):
        ang = i * math.pi / 2 / 60  # quarter-circle fan in 2D (padded to 4)
        rows.append((i, [math.cos(ang), math.sin(ang), 0.0, 0.0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    bf = [r["vec_id"] for r in
          op("ann_bruteforce", df, {"probe_id": 30, "k": 10}).collect()]
    base = [r["vec_id"] for r in
            op("ann_lsh", df, {"probe_id": 30, "k": 10, "dim": 4,
                               "n_planes": 6}).collect()]
    multi = [r["vec_id"] for r in
             op("ann_lsh", df, {"probe_id": 30, "k": 10, "dim": 4,
                                "n_planes": 6, "probe_radius": 1}).collect()]
    recall = lambda got: len(set(got) & set(bf)) / len(bf)
    assert recall(multi) >= recall(base)
    assert recall(multi) >= 0.5  # neighboring buckets recovered


def test_ann_ivf_unknown_probe_returns_empty(vecs):
    out = op("ann_ivf", vecs, {"probe_id": 999, "k": 3, "dim": 4,
                               "n_cells": 2})
    assert out.count() == 0
    assert out.columns == ["vec_id", "cos_sim"]


def test_ann_lsh_radius_two_expands(spark, vecs):
    got = [r["vec_id"] for r in
           op("ann_lsh", vecs, {"probe_id": 0, "k": 5, "dim": 4,
                                "n_planes": 4, "probe_radius": 2}).collect()]
    assert got[0] == 0 and len(got) >= 2
    import pytest as _pytest
    with _pytest.raises(ValueError, match="probe_radius"):
        op("ann_lsh", vecs, {"probe_id": 0, "dim": 4, "n_planes": 16,
                             "probe_radius": 4})


def test_ann_lsh_literal_probe(vecs):
    got = [r["vec_id"] for r in
           op("ann_lsh", vecs, {"probe": [0.0, 1.0, 0.0, 0.0], "k": 2,
                                "dim": 4, "n_planes": 2}).collect()]
    assert got and got[0] == 2


def test_dedup_embedding_groups_transitive(spark):
    # chain: 0~1 (cos ~1), 1~2 (cos ~1), 0!~2 handled transitively
    rows = [(0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.995, 0.0999, 0.0, 0.0]),
            (2, [0.980, 0.198, 0.0, 0.0]),
            (3, [0.0, 0.0, 1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kept = sorted(r["vec_id"] for r in
                  op("dedup_embedding_groups", df,
                     {"threshold": 0.99, "dim": 4, "n_planes": 1}).collect())
    assert kept == [0, 3]  # whole chain collapses to min id 0


# -- training-corpus prep (round 2) ------------------------------------------


def test_chunk_text_windows(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b"), (3, "")],
        ["doc_id", "text"])
    out = [r.asDict() for r in
           op("chunk_text", df, {"chunk_tokens": 4, "overlap": 1})
           .orderBy("doc_id", "chunk_idx").collect()]
    d1 = [r for r in out if r["doc_id"] == 1]
    # 10 tokens, window 4, step 3 -> starts 0,3,6 cover through t9
    assert [r["start_token"] for r in d1] == [0, 3, 6]
    assert d1[0]["chunk_text"] == "t0 t1 t2 t3"
    assert d1[1]["chunk_text"] == "t3 t4 t5 t6"
    assert d1[2]["chunk_text"] == "t6 t7 t8 t9"
    assert [r["chunk_tokens"] for r in d1] == [4, 4, 4]
    # short doc -> one whole-doc chunk; empty doc -> one empty chunk
    d2 = [r for r in out if r["doc_id"] == 2]
    assert len(d2) == 1 and d2[0]["chunk_text"] == "a b" and d2[0]["chunk_tokens"] == 2
    d3 = [r for r in out if r["doc_id"] == 3]
    assert len(d3) == 1 and d3[0]["chunk_text"] == "" and d3[0]["chunk_tokens"] == 0


def test_chunk_text_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="overlap"):
        op("chunk_text", df, {"chunk_tokens": 4, "overlap": 4})


def test_vocab_topk_deterministic_cut(spark):
    df = spark.createDataFrame(
        [(1, "b a a c C b a"), (2, "c d")], ["doc_id", "text"])
    out = [(r["token"], r["n_occurrences"]) for r in
           op("vocab_topk", df, {"k": 3}).collect()]
    # a=3, b=2, c=3 (lowercased) -> ties break token-asc: a, c, b
    assert out == [("a", 3), ("c", 3), ("b", 2)]


def test_contamination_join_flags_shared_ngrams(spark):
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "totally unrelated content with no overlap at all here")],
        ["doc_id", "text"])
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"])
    out = op("contamination_join", train,
             {"benchmark": bench, "shingle_size": 3, "min_shared": 5}).collect()
    assert [(r["doc_id"], r["bench_id"]) for r in out] == [(1, 100)]
    assert out[0]["n_shared"] >= 5


def test_pii_scrub_redacts_typed_spans(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b+c@ex-ample.org see https://x.io/a?b=1 "
             "host 192.168.0.1 call +1 (555) 010-1234 done")],
        ["doc_id", "text"])
    got = op("pii_scrub", df, {}).collect()[0]["text"]
    assert got == "mail <EMAIL> see <URL> host <IPV4> call <PHONE> done"


def test_tfidf_topk_ranks_and_ties(spark):
    df = spark.createDataFrame(
        [
            (1, "apple apple banana unique"),
            (2, "banana cherry"),
            (3, "apple cherry cherry cherry"),
        ],
        ["doc_id", "text"])
    out = op("tfidf_topk", df, {"k": 3}).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    d1 = sorted(by_doc[1], key=lambda r: r["tfidf_rank"])
    # idf: unique ln(4/2)+1 > apple/banana ln(4/3)+1; tf lifts apple
    assert [r["term"] for r in d1] == ["apple", "unique", "banana"]
    assert (d1[0]["tf"], d1[0]["doc_freq"]) == (2, 2)
    # exact score tie (same tf, df) resolves by term ascending
    d2 = sorted(by_doc[2], key=lambda r: r["tfidf_rank"])
    assert [r["term"] for r in d2] == ["banana", "cherry"]


def test_repetition_stats_known_answers(spark):
    df = spark.createDataFrame(
        [
            # 3 lines, "a b" twice; top 2-gram "a b" x2 of 5 gram slots
            (1, "a b c\na b c\nx y z"),
            (2, "solo"),                    # 1 line, 1 token: no 2-grams
            (3, "dup\ndup\ndup"),           # all lines identical
            (4, None),                      # null text must not drop out
            (5, "x x x x x"),               # overlapping top gram
        ],
        ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           op("repetition_stats", df, {}).collect()}
    r1 = got[1]
    assert (r1["n_lines"], r1["n_distinct_lines"], r1["n_tokens"]) == (3, 2, 9)
    assert r1["top_line_count"] == 2
    # grams: a b, b c, c a, a b, b c, c x, x y, y z -> "a b"/"b c" x2
    assert r1["top_2gram_count"] == 2
    assert r1["dup_line_ratio"] == pytest.approx(1 / 3)
    # dup chars: "a b c" x2 = 10 of 15 line chars
    assert r1["dup_line_char_ratio"] == pytest.approx(10 / 15)
    assert r1["top_2gram_ratio"] == pytest.approx(4 / 9)
    r2 = got[2]
    assert (r2["n_lines"], r2["n_tokens"]) == (1, 1)
    assert r2["top_2gram_count"] is None
    assert r2["top_2gram_ratio"] is None
    assert r2["dup_line_char_ratio"] == 0.0
    r3 = got[3]
    assert r3["dup_line_ratio"] == pytest.approx(2 / 3)
    assert r3["dup_line_char_ratio"] == 1.0
    assert r3["top_line_count"] == 3
    r4 = got[4]  # null text -> one empty line, zero tokens
    assert (r4["n_lines"], r4["n_tokens"]) == (1, 0)
    assert r4["dup_line_ratio"] == 0.0
    assert r4["top_2gram_ratio"] is None
    r5 = got[5]  # "x x" occurs 4x overlapping; share capped at 1.0
    assert r5["top_2gram_count"] == 4
    assert r5["top_2gram_ratio"] == 1.0


def test_ngram_jaccard_releases_cache(spark, docs):
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    out = op("ngram_jaccard_join", docs, {"shingle_size": 2, "threshold": 0.5})
    assert out.count() >= 1
    assert jsc.getPersistentRDDs().size() - before <= 1


def test_pack_sequences_bins_by_cumulative_tokens(spark):
    rows = [(i, "t " * 10, 0) for i in range(6)]  # 10 tokens each
    df = spark.createDataFrame(rows, ["doc_id", "text", "shard"])
    out = {r["doc_id"]: r["pack_id"] for r in
           op("pack_sequences", df, {"seq_tokens": 25, "shard_by": "shard"}).collect()}
    # cumsum-before: 0,10,20,30,40,50 -> packs 0,0,0,1,1,2
    assert [out[i] for i in range(6)] == ["0#0", "0#0", "0#0", "0#1", "0#1", "0#2"]


def test_pack_sequences_requires_shard(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="shard_by"):
        op("pack_sequences", df, {"seq_tokens": 128})


def test_pack_sequences_shards_are_independent(spark):
    rows = [(1, "t " * 10, 0), (2, "t " * 10, 1),
            (3, "t " * 10, 0), (5, "t " * 10, 0)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "shard"])
    out = {r["doc_id"]: r["pack_id"] for r in
           op("pack_sequences", df, {"seq_tokens": 15, "shard_by": "shard"}).collect()}
    # shard 0 cum-before: 0, 10, 20 -> packs 0, 0, 1 (contiguous
    # packing overflows a pack by at most one doc, never splits one)
    assert [out[i] for i in (1, 3, 5)] == ["0#0", "0#0", "0#1"]
    assert out[2] == "1#0"  # shard 1 starts fresh


def test_minhash_kernels_null_safe(spark):
    """Round-11 NULL-text contract on every signature path: NULL text
    gets a NULL signature (never bands, never pairs, survives dedup —
    the text twin of _drop_null_ts/valid_vec), while an EMPTY STRING
    is a present-but-empty doc that keeps its one-empty-shingle
    signature and CAN pair with other empty docs. Before this, every
    NULL doc shared one '' shingle and the similarity joins paired
    all of them quadratically (NULL-text fixture sweep find)."""
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a b c d"), (4, "")],
        "doc_id long, text string")
    rows = op("minhash", df, {"num_hashes": 8, "shingle_size": 2}).collect()
    sigs = {r["doc_id"]: r["minhash_sig"] and tuple(r["minhash_sig"])
            for r in rows}
    assert sigs[1] is None                 # NULL -> NULL signature
    assert sigs[2] == sigs[4]              # empty == empty (present)
    assert sigs[3] not in (None, sigs[2])
    pairs = op("near_dup_minhash", df,
               {"threshold": 0.5, "shingle_size": 2,
                "bands": 8, "rows_per_band": 1}).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(2, 4)}
    kept = sorted(r["doc_id"] for r in op(
        "dedup_near_minhash", df,
        {"threshold": 0.5, "shingle_size": 2,
         "bands": 8, "rows_per_band": 1}).collect())
    assert kept == [1, 2, 3]               # NULL doc 1 always survives


def test_shingle_kernels_match_jvm_on_unicode_whitespace(spark):
    """Python str.split() also splits on Unicode whitespace (NBSP...);
    the kernels must split ASCII-only like Spark's \\s regex, or
    candidate generation and exact verification disagree."""
    text = "a b c d a b c d x"  # NBSP inside a token
    df = spark.createDataFrame([(1, text), (2, text + " y")],
                               ["doc_id", "text"])
    from pyspark.sql import functions as F
    from blackroad_data_pipeline_spark.llmops.dedup import (
        shingles_col, _shingle_set)
    jvm = set(df.filter("doc_id = 1")
              .select(shingles_col(F.col("text"), 2).alias("sh"))
              .collect()[0]["sh"])
    assert set(_shingle_set(text, 2)) == jvm
    # and the full pipeline agrees: this near-dup pair is found
    pairs = op("near_dup_minhash", df,
               {"threshold": 0.5, "shingle_size": 2,
                "bands": 8, "rows_per_band": 1}).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]


# -- stdlib codec fallback (round 3): the real-decode branch runs even
# without PIL/soundfile, via _png.py and the wave module -----------------------


def _tiny_png(w, h, ch=3):
    from blackroad_data_pipeline_spark.llmops import _png

    px = bytearray((x * 7 + y * 13 + c * 29) % 256
                   for y in range(h) for x in range(w) for c in range(ch))
    return _png.png_encode(w, h, ch, px), px


def test_png_codec_roundtrip_and_filters():
    """Encoder->decoder roundtrip, and decode of all five scanline
    filters via a zlib stream we build by hand."""
    import struct
    import zlib

    from blackroad_data_pipeline_spark.llmops import _png

    data, px = _tiny_png(17, 9)
    assert _png.png_meta(data) == (17, 9, "RGB")
    w, h, ch, got = _png.png_decode(data)
    assert (w, h, ch) == (17, 9, 3) and bytes(got) == bytes(px)
    # hand-build a 2x2 grayscale PNG exercising filters Sub and Up
    rows = b"\x01" + bytes([10, 5]) + b"\x02" + bytes([1, 2])
    # filter1 row: [10, 10+5=15]; filter2 row adds prev: [11, 17]
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    raw = (b"\x89PNG\r\n\x1a\n"
           + _png._chunk(b"IHDR", ihdr)
           + _png._chunk(b"IDAT", zlib.compress(rows))
           + _png._chunk(b"IEND", b""))
    w, h, ch, got = _png.png_decode(raw)
    assert bytes(got) == bytes([10, 15, 11, 17])


def test_decode_and_resize_via_stdlib_codec(spark):
    """decode_image/resize_image run their REAL branch on a genuine
    PNG with no third-party codec installed (strict mode — no stub
    fallback permitted)."""
    data, _ = _tiny_png(40, 30)
    df = spark.createDataFrame([(1, bytearray(data))],
                               "doc_id long, payload binary")
    r = op("decode_image", df, {"fake_decode": False}).collect()[0]
    assert (r["img_width"], r["img_height"], r["img_mode"]) == (40, 30, "RGB")
    rz = op("resize_image", df, {"target_w": 8, "target_h": 6,
                                 "fake_decode": False}).collect()[0]
    from blackroad_data_pipeline_spark.llmops import _png

    w, h, ch, px = _png.png_decode(bytes(rz["resized_payload"]))
    assert (w, h, ch) == (8, 6, 3)
    assert (rz["resized_w"], rz["resized_h"]) == (8, 6)


def test_audio_features_via_stdlib_wave(spark):
    """audio_features decodes a genuine PCM WAV through the stdlib
    wave fallback (strict mode): sample count, duration and RMS match
    the signal we synthesized."""
    import io
    import math
    import struct
    import wave

    sr, n = 8000, 800
    samples = [int(12000 * math.sin(2 * math.pi * 440 * t / sr))
               for t in range(n)]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(sr)
        wv.writeframes(struct.pack(f"<{n}h", *samples))
    df = spark.createDataFrame([(1, bytearray(buf.getvalue()))],
                               "doc_id long, payload binary")
    r = op("audio_features", df, {"fake_decode": False}).collect()[0]
    assert r["audio_samples"] == n
    assert abs(r["audio_seconds"] - n / sr) < 1e-9
    expect_rms = (sum((v / 32768.0) ** 2 for v in samples) / n) ** 0.5
    assert abs(r["audio_rms"] - expect_rms) < 1e-9


def test_strict_mode_still_raises_on_undecodable(spark):
    """fake_decode=False on non-image/non-audio bytes must raise even
    now that stdlib codecs exist (they reject the payload)."""
    df = spark.createDataFrame([(1, bytearray(b"plainly not media"))],
                               "doc_id long, payload binary")
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    for op_name in ("decode_image", "resize_image", "audio_features"):
        with pytest.raises((PythonException, Py4JJavaError)):
            op(op_name, df, {"fake_decode": False}).collect()


# -- embedding_outlier -----------------------------------------------------


def test_embedding_outlier_global_centroid(spark):
    import math

    rows = [(0, [1.0, 0.0]), (1, [1.0, 0.1]), (2, [-1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r["centroid_sim"]
           for r in op("embedding_outlier", df,
                       {"dim": 2, "scale": 1e6}, views={}).collect()}
    # centroid (scaled sum) = [1e6, 1e5-ish]; python model
    sums = [math.floor(1.0 * 1e6) + math.floor(1.0 * 1e6)
            + math.floor(-1.0 * 1e6),
            math.floor(0.0) + math.floor(0.1 * 1e6) + math.floor(0.0)]

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / (math.sqrt(sum(x * x for x in a))
                      * math.sqrt(sum(y * y for y in b)))

    for vid, vec in rows:
        assert abs(out[vid] - cos(vec, sums)) < 1e-9
    # the opposite-direction vector is the outlier
    assert out[2] < out[0] and out[2] < out[1]


def test_embedding_outlier_by_group_and_filter(spark):
    rows = [(0, "a", [1.0, 0.0]), (1, "a", [1.0, 0.05]),
            (2, "a", [0.0, 1.0]),            # outlier within 'a'
            (3, "b", [-1.0, 0.0]), (4, "b", [-1.0, -0.05])]
    df = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<float>")
    out = {r["vec_id"]: r["centroid_sim"]
           for r in op("embedding_outlier", df,
                       {"dim": 2, "by": "label"}, views={}).collect()}
    assert out[2] < out[0] and out[2] < out[1]
    # group 'b' scores are against b's own centroid: both near 1
    assert out[3] > 0.9 and out[4] > 0.9
    kept = op("embedding_outlier", df,
              {"dim": 2, "by": "label", "mode": "filter",
               "min_sim": 0.8}, views={})
    assert sorted(r["vec_id"] for r in kept.collect()) == [0, 1, 3, 4]
    assert "centroid_sim" not in kept.columns
    # NULL group label: a regular group to the aggregation, so the
    # joinback must be null-safe — its rows score against their OWN
    # centroid, not NULL (the unlabeled-slice case)
    nulls = spark.createDataFrame(
        rows + [(9, None, [0.0, -1.0]), (10, None, [0.05, -1.0])],
        "vec_id long, label string, embedding array<float>")
    outn = {r["vec_id"]: r["centroid_sim"]
            for r in op("embedding_outlier", nulls,
                        {"dim": 2, "by": "label"}, views={}).collect()}
    assert outn[9] is not None and outn[9] > 0.9 and outn[10] > 0.9
    assert abs(outn[0] - out[0]) < 1e-12   # labeled groups unchanged


# -- quality_classifier ----------------------------------------------------


def _clf_corpus(spark):
    good = [(i, "the quick brown fox jumps over the lazy dog again", 1.0)
            for i in range(12)]
    bad = [(100 + i, "zxq vvk qqj xkz jjq kzx qzv kvv jxq zzz", 0.0)
           for i in range(12)]
    return spark.createDataFrame(
        good + bad, "doc_id long, text string, lab double")


def test_quality_classifier_separates_disjoint_vocab(spark):
    df = _clf_corpus(spark)
    out = op("quality_classifier", df,
             {"field": "text", "label_field": "lab",
              "num_features": 1 << 12}, views={})
    rows = {r["doc_id"]: r for r in out.collect()}
    assert all(rows[i]["quality_pred"] for i in range(12))
    assert not any(rows[100 + i]["quality_pred"] for i in range(12))
    assert min(rows[i]["quality_prob"] for i in range(12)) > \
        max(rows[100 + i]["quality_prob"] for i in range(12))


def test_quality_classifier_train_view_and_filter(spark):
    df = _clf_corpus(spark)
    # fit on half the corpus via a separate train frame, score all
    train = df.filter((F.col("doc_id") % 2) == 0)
    kept = op("quality_classifier", df,
              {"field": "text", "label_field": "lab", "train": train,
               "num_features": 1 << 12, "mode": "filter",
               "min_prob": 0.5}, views={})
    assert sorted(r["doc_id"] for r in kept.collect()) == list(range(12))
    assert "quality_prob" not in kept.columns


def test_quality_classifier_null_text_scores(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox the fox", 1.0),
         (2, "zxq vvk qqj xkz", 0.0),
         (3, None, 0.0)], "doc_id long, text string, lab double")
    out = op("quality_classifier", df,
             {"field": "text", "label_field": "lab",
              "num_features": 1 << 10}, views={})
    assert out.filter(F.col("doc_id") == 3).count() == 1  # NULL survives


# -- phash_image / near_dup_hamming ----------------------------------------


def _png_bytes(pixel_fn, w=32, h=32):
    from blackroad_data_pipeline_spark.llmops._png import png_encode

    px = bytearray()
    for y in range(h):
        for x in range(w):
            px.extend(pixel_fn(x, y))
    return png_encode(w, h, 3, bytes(px))


def test_phash_real_png_locality_and_hamming_pairs(spark):
    """REAL stdlib-PNG decode path: a gradient, the same gradient with
    a tiny brightness shift (near-dup), and an inverted gradient
    (far). dHash must put the near pair within a few bits and the far
    pair near ~32; near_dup_hamming then recovers exactly the near
    pair via the piece-bucket join."""
    grad = _png_bytes(lambda x, y: (x * 8 % 256, x * 8 % 256, x * 8 % 256))
    shifted = _png_bytes(
        lambda x, y: (min(255, x * 8 % 256 + 3),) * 3)
    inverted = _png_bytes(lambda x, y: (255 - x * 8 % 256,) * 3)
    df = spark.createDataFrame(
        [(1, grad), (2, shifted), (3, inverted)],
        "doc_id long, payload binary")
    hashed = op("phash_image", df, {"fake_decode": False}, views={})
    hs = {r["doc_id"]: r["phash"] for r in hashed.collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(hs[1], hs[2]) <= 3
    assert ham(hs[1], hs[3]) > 16
    pairs = op("near_dup_hamming", hashed,
               {"hash_field": "phash", "max_distance": 3}, views={})
    assert [(r["id_a"], r["id_b"]) for r in pairs.collect()] == [(1, 2)]


def test_phash_stub_deterministic_and_matches_model(spark):
    from blackroad_data_pipeline_spark.llmops.multimodal import (
        _dhash_from_grid,
        _stub_gray_grid,
    )

    df = spark.createDataFrame(
        [(1, b"some bytes"), (2, b"other payload"), (3, b"some bytes")],
        "doc_id long, payload binary")
    hs = {r["doc_id"]: r["phash"]
          for r in op("phash_image", df, {"fake_decode": True},
                      views={}).collect()}
    assert hs[1] == hs[3] != hs[2]
    assert hs[1] == _dhash_from_grid(_stub_gray_grid(b"some bytes"))


def test_near_dup_hamming_pieces_validation(spark):
    import pytest

    df = spark.createDataFrame([(1, 5)], "doc_id long, simhash long")
    with pytest.raises(ValueError, match="pieces"):
        op("near_dup_hamming", df, {"pieces": 7}, views={})
    # 8 pieces widen the pigeonhole guarantee to distance 7
    wide = spark.createDataFrame(
        [(1, 0), (2, 0b1111111)], "doc_id long, phash long")
    pairs = op("near_dup_hamming", wide,
               {"hash_field": "phash", "max_distance": 7, "pieces": 8},
               views={}).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in pairs] == [(1, 2, 7)]


def test_video_frame_dedup_composition(spark):
    """Multimodal pipeline composition: frame_sample -> phash_image on
    the frame payloads -> near_dup_hamming. Two 'videos' sharing their
    byte content produce identical stub frames, so every frame pairs
    with its twin at hamming 0; the distinct third video pairs with
    nothing."""
    payload = bytes(range(256)) * 4
    other = bytes(reversed(range(256))) * 4
    df = spark.createDataFrame(
        [(1, payload), (2, payload), (3, other)],
        "doc_id long, payload binary")
    frames = op("frame_sample", df, {"n_frames": 3}, views={})
    frames = frames.withColumn(
        "frame_id", F.col("doc_id") * 10 + F.col("frame_idx"))
    hashed = op("phash_image", frames,
                {"field": "frame_payload", "fake_decode": True}, views={})
    pairs = op("near_dup_hamming", hashed,
               {"id_field": "frame_id", "hash_field": "phash",
                "max_distance": 0}, views={})
    got = sorted((r["id_a"], r["id_b"]) for r in pairs.collect())
    assert got == [(10, 20), (11, 21), (12, 22)]


# -- quantize / dequantize embedding ---------------------------------------


def test_quantize_dequantize_roundtrip_error_bound(spark):
    rows = [(i, [(-1.0) ** i * (i / 10.0), 0.25 * i]) for i in range(9)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = op("quantize_embedding", df, {"dim": 2, "bits": 8}, views={})
    codes = {r["vec_id"]: r["embedding"] for r in q.collect()}
    assert all(0 <= v <= 255 for c in codes.values() for v in c)
    import numpy as np

    back = op("dequantize_embedding", q, {"bits": 8}, views={})
    # the column stores float32 — bound the error against what Spark
    # actually held, not the Python doubles
    orig = {i: [float(np.float32(a)), float(np.float32(b))]
            for i, (a, b) in rows}
    lo0, hi0 = min(v[0] for v in orig.values()), max(v[0] for v in orig.values())
    lo1, hi1 = min(v[1] for v in orig.values()), max(v[1] for v in orig.values())
    steps = ((hi0 - lo0) / 255, (hi1 - lo1) / 255)
    for r in back.collect():
        for d in (0, 1):
            err = abs(r["embedding"][d] - orig[r["vec_id"]][d])
            assert err <= steps[d] / 2 + 1e-9, (r["vec_id"], d, err)
    assert "q_lo" not in back.columns


def test_quantize_embedding_explicit_bounds_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 1.0]), (2, [2.0, -1.0]), (3, None)],
        "vec_id long, embedding array<float>")
    q = {r["vec_id"]: r["embedding"]
         for r in op("quantize_embedding", df,
                     {"dim": 2, "bits": 8, "bounds": [0.0, 1.0]},
                     views={}).collect()}
    assert q[1] == [0, 255]
    assert q[2] == [255, 0]      # clamped both ways
    assert q[3] is None          # NULL embedding rides through


# -- dedup_near_against / minhash_bands ------------------------------------


def test_dedup_near_against_raw_history(spark):
    history = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "completely unrelated historical content here now")],
        ["doc_id", "text"])
    batch = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog yesterday"),
         (11, "novel fresh writing with no history twin at all")],
        ["doc_id", "text"])
    out = op("dedup_near_against", batch,
             {"field": "text", "history": history, "shingle_size": 3,
              "bands": 16, "rows_per_band": 1, "threshold": 0.5},
             views={})
    assert sorted(r["doc_id"] for r in out.collect()) == [11]


def test_dedup_near_against_band_store(spark):
    """The 100 TB path: history is a precomputed minhash_bands table;
    band agreement decides without any history text."""
    cfg = {"field": "text", "shingle_size": 3, "bands": 4,
           "rows_per_band": 4}
    history = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today")],
        ["doc_id", "text"])
    store = op("minhash_bands", history, cfg, views={})
    assert store.columns == ["doc_id", "band_idx", "band_hash"]
    assert store.count() == 4
    batch = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog today"),
         (11, "entirely different words that share no band")],
        ["doc_id", "text"])
    out = op("dedup_near_against", batch,
             {**cfg, "history": store, "history_is_bands": True}, views={})
    assert sorted(r["doc_id"] for r in out.collect()) == [11]


def test_dedup_near_against_batch_bands_precomputed(spark):
    """Round 14: ``batch_bands`` reuses a band table computed from a
    SUPERSET of the batch (the day's just-written store) instead of
    re-running the signature kernel. Output must equal the default
    re-sign path exactly — including when the table carries ids the
    batch no longer has (within-day dropped docs must not leak)."""
    cfg = {"field": "text", "shingle_size": 3, "bands": 4,
           "rows_per_band": 4}
    history = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today")],
        ["doc_id", "text"])
    store = op("minhash_bands", history, cfg, views={})
    day = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog today"),
         (11, "entirely different words that share no band"),
         (12, "a within-day duplicate dropped before the against")],
        ["doc_id", "text"])
    batch = day.filter("doc_id != 12")
    day_bands = op("minhash_bands", day, cfg, views={})  # superset
    plain = op("dedup_near_against", batch,
               {**cfg, "history": store, "history_is_bands": True},
               views={})
    reused = op("dedup_near_against", batch,
                {**cfg, "history": store, "history_is_bands": True,
                 "batch_bands": day_bands}, views={})
    want = sorted(r["doc_id"] for r in plain.collect())
    assert sorted(r["doc_id"] for r in reused.collect()) == want == [11]
    # raw-history (verify) mode composes with batch_bands too
    plain_v = op("dedup_near_against", batch,
                 {**cfg, "history": history, "threshold": 0.5}, views={})
    reused_v = op("dedup_near_against", batch,
                  {**cfg, "history": history, "threshold": 0.5,
                   "batch_bands": day_bands}, views={})
    assert (sorted(r["doc_id"] for r in reused_v.collect())
            == sorted(r["doc_id"] for r in plain_v.collect()))


def test_incremental_daily_ingest_end_to_end(spark):
    """The composed 100 TB daily-ingest story (VERDICT r6 #7): three
    successive 'days' flow through the WHOLE incremental family —
    within-day dedup_near_minhash, dedup_near_against a growing
    minhash_bands store (bands of ALL docs seen, kept or dropped, so
    the greedy smaller-id policy matches the batch run), merge_agg
    folding per-day partials, quantile_sketch_merge folding per-day
    sketches — and day-3 state must EQUAL the from-scratch batch run
    over the 3-day union: same kept ids, same aggregate row, same
    sketch rows. Banding is the recall~1 geometry so band agreement
    and verified jaccard coincide on this corpus."""
    from pyspark.sql import functions as F

    base_b = "completely different content about spark engines and"
    base_c = "el gato y el perro corren por la casa con los"
    days = {
        1: [(1001, "the quick brown fox jumps over the lazy dog tonight"),
            (1002, base_b + " data"),
            (1003, base_b + " files")],     # within-day near-dup of 1002
        2: [(2001, "the quick brown fox jumps over the lazy dog today"),
            # near-dup of 1001 -> dropped vs history
            (2002, base_c + " ninos")],     # new
        3: [(3001, base_b + " models"),     # near-dup of 1002 (dropped
            # doc 1003 is ALSO its twin — batch still drops 3001)
            (3002, base_c + " gatos"),      # near-dup of 2002
            (3003, "streaming watermarks bound state for late events")],
    }
    cfg = {"field": "text", "shingle_size": 2, "bands": 16,
           "rows_per_band": 1, "threshold": 0.5}
    agg_cfg = {"group_by": [], "aggregates": [
        {"function": "count", "alias": "n_docs"},
        {"field": "n_chars", "function": "sum", "alias": "sum_chars"},
        {"field": "n_chars", "function": "max", "alias": "max_chars"}]}
    sk_cfg = {"field": "n_chars", "id_field": "doc_id", "k": 8}

    def mk(d):
        return spark.createDataFrame(days[d], "doc_id long, text string")

    def with_len(frame):
        return frame.withColumn("n_chars", F.length("text"))

    band_store, agg_store, sk_store, kept_ids = None, None, None, []
    for d in (1, 2, 3):
        batch = mk(d)
        kept = op("dedup_near_minhash", batch, cfg)
        if band_store is not None:
            kept = op("dedup_near_against", kept,
                      {**cfg, "history": band_store,
                       "history_is_bands": True}, views={})
        bands = op("minhash_bands", batch, cfg)   # ALL docs seen
        band_store = bands if band_store is None \
            else band_store.unionByName(bands)
        agg_store = op("merge_agg", with_len(kept), agg_cfg,
                       views={}) if agg_store is None else \
            op("merge_agg", with_len(kept),
               {**agg_cfg, "store": agg_store}, views={})
        day_sk = op("quantile_sketch", with_len(kept), sk_cfg, views={})
        sk_store = day_sk if sk_store is None else \
            op("quantile_sketch_merge", sk_store,
               {**sk_cfg, "others": [day_sk]}, views={})
        kept_ids.extend(r["doc_id"] for r in kept.select("doc_id").collect())
        # materialize the stores like a real daily job would persist
        band_store = band_store.localCheckpoint()
        agg_store = agg_store.localCheckpoint()
        sk_store = sk_store.localCheckpoint()

    union = mk(1).unionByName(mk(2)).unionByName(mk(3))
    batch_kept = op("dedup_near_minhash", union, cfg)
    assert sorted(kept_ids) == \
        sorted(r["doc_id"] for r in batch_kept.select("doc_id").collect())
    assert sorted(kept_ids) == [1001, 1002, 2002, 3003]
    batch_agg = op("merge_agg", with_len(batch_kept), agg_cfg, views={})
    assert sorted(map(tuple, agg_store.collect())) == \
        sorted(map(tuple, batch_agg.collect()))
    batch_sk = op("quantile_sketch", with_len(batch_kept), sk_cfg,
                  views={})
    assert sorted(map(tuple, sk_store.collect())) == \
        sorted(map(tuple, batch_sk.collect()))


def test_embedding_incremental_ingest_end_to_end(spark):
    """The embedding-side composed daily-ingest story (VERDICT r7 #6,
    the vector twin of test_incremental_daily_ingest_end_to_end):
    three 'days' flow through within-day dedup_embedding, then
    dedup_embedding_against a growing INT8 history store
    (quantize_embedding with fixed bounds, dequantized on read — raw
    fp32 history is never re-read), and the day-3 kept set must EQUAL
    the from-scratch dedup_embedding batch run over the 3-day union.
    The serving step is pinned too: ann_ivf over the incremental kept
    store (int8 -> dequantize) must return row-identical results to
    ann_ivf over the batch-kept corpus quantized the same way —
    fixed-bounds quantization is per-element deterministic, so the
    codes agree no matter which frame produced them.

    Vector geometry keeps every decision far from the 0.9 threshold
    on BOTH raw and dequantized comparisons (near-dups at cos>0.999,
    distinct pairs orthogonal; 8-bit midpoint error ~4e-3), so int8
    history cannot flip a keep/drop vs the raw batch run. The LSH
    geometry (2 planes x 8 tables) is recall~1 at these angles."""
    import math

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [float(x / n) for x in v]

    a = unit([1.0, 0.02, 0.0, 0.0])
    b = unit([0.0, 1.0, 0.03, 0.0])
    c = unit([0.0, 0.0, 1.0, 0.04])
    dd = unit([0.02, 0.0, 0.0, 1.0])

    def near(v, eps):
        return unit([x + e for x, e in zip(v, eps)])

    days = {
        1: [(101, a), (102, b),
            (103, near(a, [0.0, 0.01, 0.0, 0.0]))],   # within-day dup of 101
        2: [(201, near(a, [0.0, 0.0, 0.01, 0.0])),    # dup of history 101
            (202, c)],                                # new
        3: [(301, near(b, [0.01, 0.0, 0.0, 0.0])),    # dup of history 102
            (302, near(c, [0.0, 0.01, 0.0, 0.0])),    # dup of history 202
            (303, dd)],                               # new
    }
    cfg = {"threshold": 0.9, "dim": 4, "n_planes": 2, "n_tables": 8,
           "id_field": "vec_id"}
    qcfg = {"dim": 4, "bits": 8, "bounds": [-1.0, 1.0]}

    def mk(d):
        return spark.createDataFrame(
            days[d], "vec_id long, embedding array<float>")

    store, kept_ids = None, []
    for d in (1, 2, 3):
        batch = mk(d)
        kept = op("dedup_embedding", batch, cfg)
        if store is not None:
            hist = op("dequantize_embedding", store, {"bits": 8})
            kept = op("dedup_embedding_against", kept,
                      {**cfg, "history": hist}, views={})
        # the store holds ALL docs seen (kept or dropped) as int8 —
        # the greedy smaller-id policy needs dropped docs too, exactly
        # like the minhash band store
        q = op("quantize_embedding", batch, qcfg).select(
            "vec_id", "embedding", "q_lo", "q_hi")
        store = q if store is None else store.unionByName(q)
        store = store.localCheckpoint()
        kept_ids.extend(r["vec_id"]
                        for r in kept.select("vec_id").collect())

    union = mk(1).unionByName(mk(2)).unionByName(mk(3))
    batch_kept = op("dedup_embedding", union, cfg)
    assert sorted(kept_ids) == sorted(
        r["vec_id"] for r in batch_kept.select("vec_id").collect())
    assert sorted(kept_ids) == [101, 102, 202, 303]

    # serving parity: ann over the incremental int8 kept store ==
    # ann over the batch-kept corpus quantized with the same bounds
    kept_frame = spark.createDataFrame(
        [(i,) for i in kept_ids], "vec_id long")
    inc_serve = op("dequantize_embedding",
                   store.join(kept_frame, "vec_id"), {"bits": 8})
    batch_serve = op("dequantize_embedding",
                     op("quantize_embedding", batch_kept, qcfg).select(
                         "vec_id", "embedding", "q_lo", "q_hi"),
                     {"bits": 8})
    ann_cfg = {"probe_id": 202, "k": 3, "dim": 4, "n_cells": 2,
               "nprobe": 2, "refine": 0, "id_field": "vec_id"}
    inc_rows = sorted(map(tuple, op("ann_ivf", inc_serve, ann_cfg,
                                    views={}).collect()))
    batch_rows = sorted(map(tuple, op("ann_ivf", batch_serve, ann_cfg,
                                      views={}).collect()))
    assert inc_rows == batch_rows
    assert [r[0] for r in sorted(inc_rows, key=lambda t: -t[1])][0] == 202


# -- pagerank --------------------------------------------------------------


def test_pagerank_matches_integer_model(spark):
    edges = [(1, 2), (2, 3), (3, 1), (4, 1), (4, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_scaled"]
           for r in op("pagerank", df, {"max_iter": 4}, views={}).collect()}

    from collections import defaultdict

    scale, n = 10 ** 12, 4
    base = (3 * scale) // (20 * n)
    od = defaultdict(int)
    for s, _ in edges:
        od[s] += 1
    r = {v: scale // n for v in (1, 2, 3, 4)}
    for _ in range(4):
        acc = defaultdict(int)
        for s, d in edges:
            acc[d] += r[s] // od[s]
        r = {v: base + (17 * acc[v]) // 20 for v in r}
    assert got == r
    # a node everyone points at outranks the pure source
    assert got[1] > got[4] and got[3] > got[4]


def test_pagerank_dangling_redistribution_matches_integer_model(spark):
    """Opt-in dangling mode: node 3 is a pure sink; its damped mass
    is redistributed uniformly each iteration, still integer-exact
    (VERDICT r3 #10)."""
    edges = [(1, 2), (2, 3), (4, 1), (4, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_scaled"]
           for r in op("pagerank", df,
                       {"max_iter": 4, "dangling_redistribution": True},
                       views={}).collect()}

    from collections import defaultdict

    scale, n = 10 ** 12, 4
    base = (3 * scale) // (20 * n)
    od = defaultdict(int)
    for s, _ in edges:
        od[s] += 1
    r = {v: scale // n for v in (1, 2, 3, 4)}
    for _ in range(4):
        share = sum(r[v] for v in r if od[v] == 0) // n
        acc = defaultdict(int)
        for s, d in edges:
            acc[d] += r[s] // od[s]
        r = {v: base + (17 * (acc[v] + share)) // 20 for v in r}
    assert got == r
    # the sink's mass no longer vanishes: total mass stays closer to
    # scale than under the dropped-mass default
    dropped = {q["node"]: q["rank_scaled"]
               for q in op("pagerank", df, {"max_iter": 4},
                           views={}).collect()}
    assert sum(got.values()) > sum(dropped.values())


def test_pagerank_is_partition_invariant(spark):
    edges = [(i, (i * 7) % 23) for i in range(200)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted(map(tuple, op("pagerank", df, {"max_iter": 3},
                             views={}).collect()))
    b = sorted(map(tuple, op("pagerank", df.repartition(13),
                             {"max_iter": 3}, views={}).collect()))
    assert a == b   # exact integer arithmetic: bit-identical anywhere


# -- bm25_score -------------------------------------------------------------


def test_bm25_matches_python_model(spark):
    corpus = [
        (1, "the cat sat on the mat"),
        (2, "dogs and cats and dogs"),
        (3, "the quick brown fox the the"),
        (4, "cat cat cat"),
        (5, ""),
    ]
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in op(
        "bm25_score", df, {"query": "the cat", "k1": 1.2, "b": 0.75},
        views={}).collect()}

    import math

    docs = {i: t.lower().split() for i, t in corpus}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    terms = ["the", "cat"]
    dfreq = {t: sum(1 for toks in docs.values() if t in toks)
             for t in terms}
    for i, toks in docs.items():
        expect = 0.0
        matched = 0
        for t in terms:
            tf = toks.count(t)
            if not tf:
                continue
            matched += 1
            idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            expect += idf * tf * 2.2 / (
                tf + 1.2 * (1 - 0.75 + 0.75 * len(toks) / avgdl))
        if matched == 0:
            assert i not in got
            continue
        r = got[i]
        assert r["n_matched_terms"] == matched
        assert r["dl"] == len(toks)
        assert abs(r["bm25"] - expect) <= 1e-9 * max(abs(expect), 1), (
            i, r["bm25"], expect)
    # tf saturation: doc 4 (cat x3) must NOT score 3x doc 1's cat term
    assert got[4]["bm25"] < 3 * got[1]["bm25"]


def test_bm25_empty_query_raises(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="non-empty query"):
        op("bm25_score", df, {"query": "   "}, views={})


# -- triangle_count ---------------------------------------------------------


def test_triangle_count_k4_plus_noise(spark):
    """K4 has exactly 4 triangles; self-loops, duplicate and reversed
    edges must not change the count."""
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (2, 1), (3, 3), (1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    assert op("triangle_count", df, {}, views={}).collect()[0][
        "n_triangles"] == 4
    per = sorted(map(tuple, op("triangle_count", df, {"per_node": True},
                               views={}).collect()))
    assert per == [(1, 3), (2, 3), (3, 3), (4, 3)]
    # each triangle touches 3 nodes: per-node total = 3 * global
    assert sum(n for _, n in per) == 12


def test_triangle_count_matches_python_model(spark):
    import itertools
    import random

    rng = random.Random(11)
    nodes = list(range(30))
    edges = [(a, b) for a in nodes for b in nodes
             if a < b and rng.random() < 0.2]
    expect = sum(1 for x, y, z in itertools.combinations(nodes, 3)
                 if (x, y) in set(edges) and (y, z) in set(edges)
                 and (x, z) in set(edges))
    df = spark.createDataFrame(edges, "src long, dst long")
    got = op("triangle_count", df, {}, views={}).collect()[0]["n_triangles"]
    assert got == expect and expect > 0


# -- url_parts --------------------------------------------------------------


def test_url_parts_decomposition(spark):
    df = spark.createDataFrame(
        [(1, "https://docs.example.com/a/b?x=1&y=two"),
         (2, "http://example.org/"),
         (3, "not a url")],
        ["id", "url"])
    got = {r["id"]: r for r in op(
        "url_parts", df, {"params": ["y"]}, views={}).collect()}
    assert got[1]["url_protocol"] == "https"
    assert got[1]["url_host"] == "docs.example.com"
    assert got[1]["url_path"] == "/a/b"
    assert got[1]["url_query"] == "x=1&y=two"
    assert got[1]["url_registered_domain"] == "example.com"
    assert got[1]["param_y"] == "two"
    assert got[2]["url_registered_domain"] == "example.org"
    assert got[2]["url_query"] is None
    assert got[3]["url_host"] is None


# -- BPE train/apply --------------------------------------------------------


def test_train_bpe_matches_hand_model(spark):
    """Tiny Sennrich example: 'low' x5, 'lower' x2 — first merges are
    deterministic (count then lexicographic tie-break)."""
    rows = [(i, "low") for i in range(5)] + [(9, "lower"), (10, "lower")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = [(r["left"], r["right"]) for r in
              op("train_bpe", df, {"num_merges": 3}, views={})
              .orderBy("rank").collect()]
    # pair counts round 1: (l,o)=7, (o,w)=7, (w,</w>)=5, (w,e)=2,
    # (e,r)=2, (r,</w>)=2 -> tie (l,o)/(o,w) -> lexicographic: (l,o)
    assert merges[0] == ("l", "o")
    assert merges[1] == ("lo", "w")          # (lo,w)=7 now unique max
    assert merges[2] == ("low", "</w>")      # 5 beats the 2-count pairs


def test_bpe_apply_segments_and_counts(spark):
    train = spark.createDataFrame(
        [(i, "low low lower lowest") for i in range(3)],
        ["doc_id", "text"])
    merges = op("train_bpe", train, {"num_merges": 4}, views={})
    test = spark.createDataFrame(
        [(1, "low lower UNSEEN"), (2, None)], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in op(
        "bpe_apply", test, {"merges": merges}, views={}).collect()}
    toks = got[1]["bpe_tokens"]
    # 'low' must be a single learned token; unseen words fall back to
    # finer pieces but still end with the EOW marker
    assert "low</w>" in toks
    assert got[2]["bpe_tokens"] == []
    # python-model equivalence on the same merges
    from blackroad_data_pipeline_spark.llmops.tokenize import encode_word

    pairs = [(r["left"], r["right"]) for r in
             merges.orderBy("rank").collect()]
    ranks = {p: i for i, p in enumerate(pairs)}
    expect = (encode_word("low", ranks) + encode_word("lower", ranks)
              + encode_word("unseen", ranks))
    assert toks == expect
    counts = {r["doc_id"]: r["n_bpe_tokens"] for r in op(
        "bpe_apply", test, {"merges": merges, "counts_only": True},
        views={}).collect()}
    assert counts[1] == len(expect) and counts[2] == 0


def test_train_bpe_max_vocab_caps_driver_collect(spark):
    """max_vocab truncates the collected vocabulary to the top-N words
    by (count desc, word asc) BEFORE the driver collect — the default
    config is driver-OOM-safe at any corpus size (VERDICT r4 #5)."""
    rows = ([(i, "aa bb") for i in range(10)]
            + [(100 + i, "cc dd ee") for i in range(3)])
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # cap 2: only aa/bb (count 10) make the vocab; merges come from
    # them alone, so no merge may mention c/d/e characters
    merges = op("train_bpe", df, {"num_merges": 10, "max_vocab": 2,
                                  "min_count": 1}, views={}).collect()
    assert merges, "aa/bb vocab must still learn merges"
    syms = {r["left"] for r in merges} | {r["right"] for r in merges}
    assert not any(set(s) & set("cde") for s in syms)
    # uncapped control: the cc/dd/ee words re-enter the statistics
    full = op("train_bpe", df, {"num_merges": 10, "max_vocab": 0,
                                "min_count": 1}, views={}).collect()
    fsyms = {r["left"] for r in full} | {r["right"] for r in full}
    assert any(set(s) & set("cde") for s in fsyms)


def test_bpe_apply_unicode_whitespace_matches_train_split(spark):
    """A document with non-breaking spaces (U+00A0) must segment into
    the SAME words at train and apply time: tokens_col splits on Java
    \\s+ (ASCII-only), so the apply kernel must too — Python
    str.split() would split on U+00A0 and skew the vocabularies
    (ADVICE r4-medium)."""
    text = "low\u00a0low lower"
    df = spark.createDataFrame([(i, text) for i in range(3)],
                               ["doc_id", "text"])
    merges = op("train_bpe", df, {"num_merges": 8, "min_count": 1},
                views={})
    got = op("bpe_apply", df.limit(1), {"merges": merges},
             views={}).collect()[0]
    from blackroad_data_pipeline_spark.llmops.tokenize import encode_word
    pairs = [(r["left"], r["right"]) for r in
             merges.orderBy("rank").collect()]
    ranks = {p: i for i, p in enumerate(pairs)}
    expect = (encode_word("low low", ranks)
              + encode_word("lower", ranks))
    assert got["bpe_tokens"] == expect
    # reconstruction (the bpe_gate predicate) holds: strip </w> and
    # rejoin equals the Java-split word sequence
    joined = "".join(got["bpe_tokens"]).replace("</w>", "")
    assert joined == "low low" + "lower"


def test_winnow_overlap_pairs_and_postings_cap(spark):
    shared = "an unmistakably shared long passage that dominates both docs"
    rows = [(1, "alpha " + shared), (2, "beta " + shared),
            (3, "entirely unrelated content in this third document here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = {"k": 12, "window": 4, "min_shared": 2}
    got = {(r["id_a"], r["id_b"]): r["n_shared"]
           for r in op("winnow_overlap", df, cfg, views={}).collect()}
    assert set(got) == {(1, 2)} and got[(1, 2)] >= 2
    # max_postings=2 drops nothing here (each fp in <= 2 docs) ...
    same = {(r["id_a"], r["id_b"]) for r in op(
        "winnow_overlap", df, {**cfg, "max_postings": 2},
        views={}).collect()}
    assert same == {(1, 2)}
    # ... but duplicating the passage into doc 3 pushes its fps to 3
    # postings, and the cap now suppresses the boilerplate pairs
    df3 = spark.createDataFrame(
        rows[:2] + [(3, "gamma " + shared)], "doc_id long, text string")
    capped = {(r["id_a"], r["id_b"]) for r in op(
        "winnow_overlap", df3, {**cfg, "max_postings": 2},
        views={}).collect()}
    assert capped == set()
    with pytest.raises(ValueError, match="min_shared"):
        op("winnow_overlap", df, {"min_shared": 0}, views={})


# -- product quantization -------------------------------------------------------


def _pq_model(rows, dim, m, ks, refine=1, scale=1e6):
    """Driver-side replay of op_pq_encode's pinned contract
    (seed_order='id'): quantize, id-ordered seed rows sliced into all
    m sub-codebooks, argmin squared-L2 codes, truncated-integer-mean
    Lloyd rounds."""
    import numpy as np

    ids = np.array([i for i, _ in rows])
    Q = np.floor(np.array([v for _, v in rows], dtype=np.float64) * scale)
    sub = dim // m
    k = min(ks, len(ids))
    books = Q[np.argsort(ids)[:k]].reshape(k, m, sub).transpose(1, 0, 2).copy()

    def assign(bk):
        codes = np.empty((len(Q), m), dtype=int)
        for j in range(m):
            X = Q[:, j * sub:(j + 1) * sub]
            d = ((X[:, None, :] - bk[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = np.argmin(d, axis=1)
        return codes

    for _ in range(refine):
        codes = assign(books)
        for j in range(m):
            for c in range(k):
                msk = codes[:, j] == c
                if msk.any():
                    s = Q[msk, j * sub:(j + 1) * sub].sum(axis=0)
                    books[j, c] = np.sign(s) * (np.abs(s) // msk.sum())
    return {int(i): list(map(int, c)) for i, c in zip(ids, assign(books))}


def test_pq_encode_matches_python_model(spark):
    """Codes on the sf0.001 corpus must equal the driver-side replay
    of the pinned fixed-point contract (argmin L2, Lloyd means)."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = [(r["vec_id"], list(r["embedding"])) for r in e.collect()]
    want = _pq_model(rows, dim=64, m=8, ks=4, refine=2)
    got = {r["vec_id"]: list(r["pq_code"]) for r in
           op("pq_encode", e, {"dim": 64, "m": 8, "ks": 4, "refine": 2,
                               "seed_order": "id"}).collect()}
    assert got == want


def test_pq_encode_null_and_validation(spark):
    """NULL embeddings encode to NULL codes; m must divide dim."""
    df = spark.createDataFrame(
        [(0, [1.0, 0.0, 2.0, 1.0]), (1, None), (2, [0.0, 1.0, 1.0, 2.0])],
        "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r["pq_code"] for r in
           op("pq_encode", df, {"dim": 4, "m": 2, "ks": 2,
                                "seed_order": "id"}).collect()}
    assert out[1] is None and out[0] is not None and len(out[0]) == 2
    with pytest.raises(ValueError, match="must divide"):
        op("pq_encode", df, {"dim": 4, "m": 3})


def test_ann_pq_adc_is_exact_table_sum(spark):
    """adc_dist must equal the exact integer sum of per-subspace
    squared-L2 distances between the probe's quantized slices and the
    assigned codewords — recomputed independently in numpy."""
    import numpy as np

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = [(r["vec_id"], list(r["embedding"])) for r in e.collect()]
    dim, m, ks, sub = 64, 8, 4, 8
    codes = _pq_model(rows, dim, m, ks, refine=1)
    ids = np.array([i for i, _ in rows])
    Q = np.floor(np.array([v for _, v in rows], dtype=np.float64) * 1e6)
    books = Q[np.argsort(ids)[:ks]].reshape(ks, m, sub).transpose(1, 0, 2).copy()
    codes0 = _pq_model(rows, dim, m, ks, refine=0)
    for j in range(m):  # one Lloyd round, mirroring the model
        for c in range(ks):
            msk = np.array([codes0[int(i)][j] for i in ids]) == c
            if msk.any():
                s = Q[msk, j * sub:(j + 1) * sub].sum(axis=0)
                books[j, c] = np.sign(s) * (np.abs(s) // msk.sum())
    probe = Q[ids == 0][0]
    want = {}
    for i in ids:
        d = 0
        for j in range(m):
            diff = probe[j * sub:(j + 1) * sub] - books[j, codes[int(i)][j]]
            d += int((diff * diff).sum())
        want[int(i)] = d
    got = {r["vec_id"]: r["adc_dist"] for r in
           op("ann_pq", e, {"dim": 64, "m": 8, "ks": 4, "refine": 1,
                            "seed_order": "id", "probe_id": 0,
                            "k": len(rows)}).collect()}
    assert got == {i: want[i] for i in got}
    assert len(got) == len(rows)


def test_ann_pq_rerank_recall(spark):
    """On clustered data (the regime ANN serves — iid-random vectors
    are all near-orthogonal and ANY coarse index ranks them weakly),
    reranking the top-20 ADC candidates with exact cosine must
    recover the brute-force top-10: the production recall knob."""
    import numpy as np

    rng = np.random.RandomState(7)
    centers = rng.randn(6, 64) * 3
    rows = [(int(c * 20 + i),
             (centers[c] + rng.randn(64) * 0.3).tolist())
            for c in range(6) for i in range(12)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cfg = {"dim": 64, "m": 8, "ks": 16, "refine": 2, "probe_id": 0,
           "k": 10, "rerank": 20}
    approx = {r["vec_id"] for r in op("ann_pq", e, cfg).collect()}
    exact = {r["vec_id"] for r in
             op("ann_bruteforce", e, {"probe_id": 0, "k": 10}).collect()}
    assert len(approx) == 10
    assert len(approx & exact) >= 9


def test_ann_pq_unknown_probe_empty(spark, vecs):
    out = op("ann_pq", vecs, {"dim": 4, "m": 2, "ks": 2,
                              "probe_id": 999}).collect()
    assert out == []


def test_pq_train_serve_split_roundtrip(spark, tmp_path):
    """Round 10: books persisted to parquet and fed back must encode
    and serve bit-identically to the self-training path — the
    fixed-point contract is 'same books in, same codes out'."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cfg = {"dim": 64, "m": 8, "ks": 4, "refine": 1, "seed_order": "id"}
    books = op("pq_encode", e, {**cfg, "emit": "books"})
    p = str(tmp_path / "books.parquet")
    books.write.parquet(p)
    stored = spark.read.parquet(p)

    direct = {r["vec_id"]: list(r["pq_code"]) for r in
              op("pq_encode", e, cfg).collect()}
    served = {r["vec_id"]: list(r["pq_code"]) for r in
              op("pq_encode", e, {**cfg, "books": stored}).collect()}
    assert served == direct

    codes = op("pq_encode", e, {**cfg, "books": stored}).select(
        "vec_id", "pq_code")
    want = [(r["vec_id"], r["adc_dist"]) for r in
            op("ann_pq", e, {**cfg, "probe_id": 0, "k": 10}).collect()]
    got = [(r["vec_id"], r["adc_dist"]) for r in
           op("ann_pq", e, {**cfg, "probe_id": 0, "k": 10,
                            "books": stored, "codes": codes}).collect()]
    assert got == want


def test_ann_pq_codes_require_books(spark, vecs):
    codes = op("pq_encode", vecs, {"dim": 4, "m": 2, "ks": 2}).select(
        "vec_id", "pq_code")
    with pytest.raises(ValueError, match="requires `books`"):
        op("ann_pq", vecs, {"dim": 4, "m": 2, "ks": 2, "probe_id": 0,
                            "codes": codes})


def test_pq_books_geometry_mismatch_raises(spark, vecs):
    books = op("pq_encode", vecs, {"dim": 4, "m": 2, "ks": 2,
                                   "emit": "books"})
    with pytest.raises(ValueError, match="subspaces"):
        op("pq_encode", vecs, {"dim": 4, "m": 4, "ks": 2,
                               "books": books})
    with pytest.raises(ValueError, match="codeword length"):
        op("pq_encode", vecs, {"dim": 2, "m": 2, "ks": 2,
                               "books": books})


def test_ann_ivfpq_exhaustive_equals_plain_adc(spark):
    """nprobe == n_cells keeps every cell, so IVFADC must reproduce
    the plain ADC top-k bit for bit (the contract-query geometry)."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cfg = {"dim": 64, "m": 8, "ks": 4, "refine": 1, "seed_order": "id",
           "probe_id": 0, "k": 10}
    plain = [(r["vec_id"], r["adc_dist"]) for r in
             op("ann_pq", e, cfg).collect()]
    ivf = [(r["vec_id"], r["adc_dist"]) for r in
           op("ann_pq", e, {**cfg, "n_cells": 4, "nprobe": 4}).collect()]
    assert sorted(ivf) == sorted(plain)


def test_ann_ivfpq_pruned_recall_on_clustered_data(spark):
    """At nprobe < n_cells on clustered vectors, the pruned scan must
    still recover (nearly) all of the exhaustive ADC top-k — the
    FAISS IVFADC recall story, pytest-pinned."""
    import numpy as np

    rng = np.random.RandomState(11)
    centers = rng.randn(4, 64) * 3
    rows = [(int(c * 30 + i),
             (centers[c] + rng.randn(64) * 0.2).tolist())
            for c in range(4) for i in range(30)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cfg = {"dim": 64, "m": 8, "ks": 16, "refine": 2, "probe_id": 0,
           "k": 10}
    exact = {r["vec_id"] for r in op("ann_pq", e, cfg).collect()}
    pruned = {r["vec_id"] for r in
              op("ann_pq", e, {**cfg, "n_cells": 4, "nprobe": 1})
              .collect()}
    assert len(pruned & exact) >= 9


def test_ann_ivfpq_served_with_frozen_models(spark):
    """Full served IVFADC: frozen cells model + books + stored codes
    carrying ivf_cell — the probe plan reads only stored artifacts and
    must match the internally-trained pruned result."""
    import numpy as np

    rng = np.random.RandomState(12)
    centers = rng.randn(4, 64) * 3
    rows = [(int(c * 25 + i),
             (centers[c] + rng.randn(64) * 0.2).tolist())
            for c in range(4) for i in range(25)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cfg = {"dim": 64, "m": 8, "ks": 16, "refine": 1}
    cells = op("ivf_assign", e, {"n_cells": 4, "emit": "cells"})
    books = op("pq_encode", e, {**cfg, "emit": "books"})
    codes = op("ivf_assign",
               op("pq_encode", e, {**cfg, "books": books}),
               {"n_cells": 4, "cells": cells}).select(
        "vec_id", "pq_code", "ivf_cell")
    got = [(r["vec_id"], r["adc_dist"]) for r in
           op("ann_pq", e, {**cfg, "probe_id": 0, "k": 10, "n_cells": 4,
                            "nprobe": 2, "books": books, "codes": codes,
                            "cells": cells}).collect()]
    # internal reference: same geometry, cells_refine matching the
    # emitted model's default refine=1
    want = [(r["vec_id"], r["adc_dist"]) for r in
            op("ann_pq", e, {**cfg, "probe_id": 0, "k": 10,
                             "n_cells": 4, "nprobe": 2}).collect()]
    assert got == want
    # pruning over served codes without a cell column fails loudly
    flat = codes.select("vec_id", "pq_code")
    with pytest.raises(ValueError, match="ivf_cell"):
        op("ann_pq", e, {**cfg, "probe_id": 0, "k": 10, "n_cells": 4,
                         "books": books, "codes": flat, "cells": cells})


def test_ivf_assign_frozen_cells_stable_across_days(spark):
    """ivf_assign with a frozen cells model must give day-2 vectors
    the same cell ids the day-1 quantizer would — retraining per day
    would shift every stored ivf_cell."""
    import numpy as np

    rng = np.random.RandomState(13)
    rows = [(i, rng.randn(8).tolist()) for i in range(40)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    day1 = e.filter("vec_id < 20")
    cells = op("ivf_assign", day1, {"n_cells": 3, "emit": "cells"})
    whole = {r["vec_id"]: r["ivf_cell"] for r in
             op("ivf_assign", e, {"n_cells": 3, "cells": cells})
             .collect()}
    day1_direct = {r["vec_id"]: r["ivf_cell"] for r in
                   op("ivf_assign", day1, {"n_cells": 3}).collect()}
    assert all(whole[i] == day1_direct[i] for i in day1_direct)


def test_ann_pq_validates_params_like_pq_encode(spark, vecs):
    """ADVICE r9: ann_pq used to skip pq_encode's guards — dim=64 m=7
    would silently slice a wrong sub-geometry."""
    for bad in ({"dim": 4, "m": 3, "probe_id": 0},
                {"dim": 4, "m": 2, "ks": 1, "probe_id": 0},
                {"dim": 4, "m": 2, "seed_order": "rand", "probe_id": 0}):
        with pytest.raises(ValueError):
            op("ann_pq", vecs, bad)


def test_ann_pq_explicit_probe_empty_corpus(spark):
    """ADVICE r9: config["probe"] bypasses the probe_id early-return,
    so an empty/all-NULL corpus reached F.array() with zero elements
    (analysis error). Now guarded to an empty typed frame."""
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    allnull = spark.createDataFrame(
        [(0, None), (1, None)], "vec_id long, embedding array<float>")
    for df in (empty, allnull):
        out = op("ann_pq", df, {"dim": 2, "m": 1, "ks": 2,
                                "probe": [0.5, 0.5]})
        assert out.count() == 0
        assert dict(out.dtypes)["adc_dist"] == "bigint"
        rr = op("ann_pq", df, {"dim": 2, "m": 1, "ks": 2, "rerank": 4,
                               "probe": [0.5, 0.5]})
        assert rr.count() == 0 and dict(rr.dtypes)["cos_sim"] == "double"


def test_ann_pq_adc_dist_is_long_for_small_tables(spark):
    """ADVICE r9: with table entries all under 2^31 (tiny scale), the
    F.lit literals used to resolve array<int> -> int32 adc_dist (silent
    wrap risk + dtype mismatch vs the oracle's BIGINT)."""
    rows = [(i, [i / 100.0, (10 - i) / 100.0]) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = op("ann_pq", df, {"dim": 2, "m": 1, "ks": 2, "scale": 10.0,
                            "probe_id": 0, "k": 8})
    assert dict(out.dtypes)["adc_dist"] == "bigint"
    assert out.count() == 8


def test_null_embeddings_never_crash_vector_ops(spark):
    """Round-9 NULL-fixture sweep: a single NULL embedding used to
    crash every LSH/IVF kernel (np.vstack over a batch containing
    None). NULL vectors hash/assign to NULL, are never probes,
    neighbors or dup candidates, and dedup keeps them."""
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.95, 0.05]), (2, None), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>")
    b = {r["vec_id"]: r["lsh_bucket"] for r in
         op("lsh_bucket", df, {"dim": 2, "n_planes": 4}).collect()}
    assert b[2] is None and b[0] is not None
    iv = {r["vec_id"]: r["ivf_cell"] for r in
          op("ivf_assign", df, {"dim": 2, "n_cells": 2}).collect()}
    assert iv[2] is None and iv[0] is not None
    for name, cfg in [
            ("ann_bruteforce", {"probe_id": 0, "k": 10}),
            ("ann_lsh", {"probe_id": 0, "k": 10, "dim": 2,
                         "n_planes": 2, "probe_radius": 2}),
            ("ann_ivf", {"probe_id": 0, "k": 10, "n_cells": 1,
                         "nprobe": 1})]:
        got = {r["vec_id"] for r in op(name, df, cfg).collect()}
        assert 2 not in got and got, name
        # a NULL-embedding probe id finds nothing rather than crashing
        assert op(name, df, {**cfg, "probe_id": 2}).collect() == []
    pairs = op("similarity_join", df, {
        "threshold": 0.9, "dim": 2, "n_planes": 1}).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(0, 1)}
    kept = {r["vec_id"] for r in op("dedup_embedding", df, {
        "threshold": 0.9, "dim": 2, "n_planes": 1}).collect()}
    assert kept == {0, 2, 3}  # NULL row survives, near-dup 1 dropped
    inc = {r["vec_id"] for r in op("dedup_embedding_against", df, {
        "history": df, "threshold": 0.9, "dim": 2, "n_planes": 1,
        "history_id_field": "vec_id"}, views={}).collect()}
    assert 2 in inc  # NULL batch rows are never near-duplicates


def test_vector_ops_degenerate_corpora(spark):
    """Empty and all-NULL corpora (round-9 self-review): search ops
    return empty frames, annotate ops keep rows with NULL cells/codes,
    dedup keeps everything — never an AxisError from 0-length seeds."""
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    allnull = spark.createDataFrame(
        [(0, None), (1, None)], "vec_id long, embedding array<float>")
    for df, n_all in ((empty, 0), (allnull, 2)):
        assert op("knn_join", df,
                  {"k": 2, "n_cells": 2, "nprobe": 1}).count() == 0
        assert op("ann_ivf", df, {"probe_id": 0, "k": 2, "n_cells": 2,
                                  "nprobe": 1}).count() == 0
        assert op("ann_pq", df, {"dim": 2, "m": 1, "ks": 2,
                                 "probe_id": 0}).count() == 0
        assert op("ivf_assign", df, {"dim": 2, "n_cells": 2}).count() == n_all
        assert op("pq_encode", df, {"dim": 2, "m": 1, "ks": 2}).count() == n_all
        assert op("semdedup", df, {"dim": 2, "eps": 0.9,
                                   "n_cells": 2}).count() == n_all
        flags = op("semdedup", df, {"dim": 2, "eps": 0.9, "n_cells": 2,
                                    "action": "flag"}).collect()
        assert len(flags) == n_all
        assert all(r["is_dup"] is False and r["semdedup_cell"] is None
                   for r in flags)


@pytest.fixture()
def dirty_vecs(spark):
    """The valid_vec contract fixture (round 10): 5 clean vectors plus
    one of every invalid shape — NULL, empty, NaN component, +Inf,
    -Inf, NULL component."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [0.7, 0.7, 0.0, 0.0]),
        (10, None),
        (11, []),
        (12, [float("nan"), 0.0, 0.0, 0.0]),
        (13, [float("inf"), 0.0, 0.0, 0.0]),
        (14, [0.0, float("-inf"), 0.0, 0.0]),
        (15, [0.0, None, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_vector_health_counts(spark, dirty_vecs):
    row = op("vector_health", dirty_vecs, {}).collect()[0]
    assert (row["n_rows"], row["n_null"], row["n_empty"],
            row["n_nonfinite"], row["n_valid"]) == (11, 1, 1, 4, 5)
    assert row["valid_pct"] == 10000 * 5 // 11
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    erow = op("vector_health", empty, {}).collect()[0]
    assert erow["n_rows"] == 0 and erow["valid_pct"] is None


def test_valid_vec_excludes_nonfinite_everywhere(spark, dirty_vecs, vecs):
    """Every vector op must produce on the dirty corpus exactly what
    it produces on the clean 5-row subset — invalid vectors neither
    participate nor crash (round-10 valid_vec contract)."""
    cfg_bf = {"probe_id": 0, "k": 3}
    want = [(r["vec_id"], r["cos_sim"]) for r in
            op("ann_bruteforce", vecs, cfg_bf).collect()]
    got = [(r["vec_id"], r["cos_sim"]) for r in
           op("ann_bruteforce", dirty_vecs, cfg_bf).collect()]
    assert got == want

    cfg_sj = {"threshold": 0.9, "dim": 4, "n_planes": 2, "n_tables": 8}
    want_p = sorted((r["id_a"], r["id_b"]) for r in
                    op("similarity_join", vecs, cfg_sj).collect())
    got_p = sorted((r["id_a"], r["id_b"]) for r in
                   op("similarity_join", dirty_vecs, cfg_sj).collect())
    assert got_p == want_p

    cfg_knn = {"k": 2, "n_cells": 2, "nprobe": 2, "dim": 4}
    want_k = sorted((r["vec_id"], r["knn_rank"], r["neighbor_id"]) for r in
                    op("knn_join", vecs, cfg_knn).collect())
    got_k = sorted((r["vec_id"], r["knn_rank"], r["neighbor_id"]) for r in
                   op("knn_join", dirty_vecs, cfg_knn).collect())
    assert got_k == want_k

    cfg_sd = {"dim": 4, "eps": 0.9, "n_cells": 2, "seed_order": "id",
              "action": "flag"}
    want_s = {r["vec_id"]: (r["semdedup_cell"], r["is_dup"]) for r in
              op("semdedup", vecs, cfg_sd).collect()}
    got_s = {r["vec_id"]: (r["semdedup_cell"], r["is_dup"]) for r in
             op("semdedup", dirty_vecs, cfg_sd).collect()}
    for vid, v in want_s.items():
        assert got_s[vid] == v
    for vid in (10, 11, 12, 13, 14, 15):
        assert got_s[vid] == (None, False)

    cfg_pq = {"dim": 4, "m": 2, "ks": 2}
    want_c = {r["vec_id"]: list(r["pq_code"]) for r in
              op("pq_encode", vecs, cfg_pq).collect()}
    coded = {r["vec_id"]: r["pq_code"] for r in
             op("pq_encode", dirty_vecs, cfg_pq).collect()}
    for vid, v in want_c.items():
        assert list(coded[vid]) == v
    for vid in (10, 11, 12, 13, 14, 15):
        assert coded[vid] is None

    want_a = [(r["vec_id"], r["adc_dist"]) for r in
              op("ann_pq", vecs, {**cfg_pq, "probe_id": 0, "k": 3})
              .collect()]
    got_a = [(r["vec_id"], r["adc_dist"]) for r in
             op("ann_pq", dirty_vecs, {**cfg_pq, "probe_id": 0, "k": 3})
             .collect()]
    assert got_a == want_a


def test_valid_vec_annotate_ops_null_out(spark, dirty_vecs):
    buckets = {r["vec_id"]: r["lsh_bucket"] for r in
               op("lsh_bucket", dirty_vecs, {"dim": 4, "n_planes": 4})
               .collect()}
    cells = {r["vec_id"]: r["ivf_cell"] for r in
             op("ivf_assign", dirty_vecs, {"dim": 4, "n_cells": 2})
             .collect()}
    quant = {r["vec_id"]: r["embedding"] for r in
             op("quantize_embedding", dirty_vecs, {"dim": 4, "bits": 8})
             .collect()}
    for vid in (10, 11, 12, 13, 14, 15):
        assert buckets[vid] is None
        assert cells[vid] is None
        assert quant[vid] is None
    for vid in (0, 1, 2, 3, 4):
        assert buckets[vid] is not None
        assert cells[vid] is not None
        assert quant[vid] is not None
    # quantize bounds must come from VALID vectors only: with Inf in
    # the corpus a poisoned hi_d would zero-width dim 0 and squash
    # every valid code to 0/255 ties
    assert len({tuple(quant[v]) for v in (0, 1, 2, 3, 4)}) > 1


def test_valid_vec_outlier_scores_null(spark, dirty_vecs):
    out = {r["vec_id"]: r["centroid_sim"] for r in
           op("embedding_outlier", dirty_vecs, {"dim": 4}).collect()}
    for vid in (10, 11, 12, 13, 14, 15):
        assert out[vid] is None
    import math
    for vid in (0, 1, 2, 3, 4):
        assert out[vid] is not None and math.isfinite(out[vid])


def test_valid_vec_probe_semantics(spark, dirty_vecs):
    """Literal config probes with NaN/Inf raise (config error); a
    probe_id pointing at an invalid vector returns empty (data-side
    exclusion)."""
    with pytest.raises(ValueError, match="finite"):
        op("ann_bruteforce", dirty_vecs,
           {"probe": [float("nan"), 0.0, 0.0, 0.0], "k": 2})
    with pytest.raises(ValueError, match="finite"):
        op("ann_lsh", dirty_vecs,
           {"probe": [float("inf"), 0.0, 0.0, 0.0], "k": 2, "dim": 4})
    with pytest.raises(ValueError, match="finite"):
        op("ann_pq", dirty_vecs,
           {"probe": [1.0, float("-inf"), 0.0, 0.0], "dim": 4, "m": 2,
            "ks": 2, "k": 2})
    for bad_probe in (12, 13, 14, 15, 11):
        assert op("ann_bruteforce", dirty_vecs,
                  {"probe_id": bad_probe, "k": 2}).count() == 0
        assert op("ann_pq", dirty_vecs,
                  {"dim": 4, "m": 2, "ks": 2, "probe_id": bad_probe,
                   "k": 2}).count() == 0


def test_valid_vec_dedup_against_survivors(spark, dirty_vecs, vecs):
    """Invalid batch rows always survive (they can't be near-dups);
    invalid history rows match nothing."""
    hist = vecs.filter("vec_id = 0").union(
        spark.createDataFrame([(99, [float("nan"), 1.0, 1.0, 1.0])],
                              "vec_id long, embedding array<float>"))
    out = {r["vec_id"] for r in
           op("dedup_embedding_against", dirty_vecs,
              {"threshold": 0.9, "dim": 4, "n_planes": 2, "n_tables": 8,
               "history": hist}, views={}).collect()}
    # 0/1 are near-dups of history vec 0 -> dropped; every invalid row
    # survives; 2/3/4 survive (cosine < 0.9 to [1,0,0,0])
    assert out == {2, 3, 4, 10, 11, 12, 13, 14, 15}


def test_centroid_drift_trips_on_shift_not_in_distribution(spark):
    """centroid_drift (round 11): against a frozen 2-cell quantizer,
    an in-distribution batch keeps every cell un-drifted while a
    synthetically shifted batch trips exactly the shifted cell."""
    dim = 8

    def vec(center, bump, eps):
        v = [0.0] * dim
        v[center] = 1.0
        v[(center + 3) % dim] += eps
        v[4] += bump
        return v

    cells = spark.createDataFrame(
        [(0, [1.0] + [0.0] * 7), (1, [0.0, 1.0] + [0.0] * 6)],
        "cell int, centroid array<double>")
    # 20 baseline points per cell, deterministic +-0.01-ish jitter
    base = spark.createDataFrame(
        [(i, vec(i % 2, 0.0, 0.01 * ((i % 5) - 2))) for i in range(40)],
        "vec_id long, embedding array<float>")
    batch_in = spark.createDataFrame(
        [(100 + i, vec(i % 2, 0.0, 0.01 * ((i % 5) - 2)))
         for i in range(40)],
        "vec_id long, embedding array<float>")
    # shift ONLY the cell-1 population
    batch_shift = spark.createDataFrame(
        [(200 + i, vec(i % 2, 0.5 if i % 2 == 1 else 0.0,
                       0.01 * ((i % 5) - 2))) for i in range(40)],
        "vec_id long, embedding array<float>")

    cfg = {"dim": dim, "cells": cells, "baseline": base,
           "threshold": 0.10}
    ok = {r["cell"]: r for r in
          op("centroid_drift", batch_in, cfg, views={}).collect()}
    assert [ok[c]["drifted"] for c in (0, 1)] == [False, False]
    assert ok[0]["n_base"] == 20 and ok[0]["n_batch"] == 20

    tripped = {r["cell"]: r for r in
               op("centroid_drift", batch_shift, cfg, views={}).collect()}
    assert tripped[0]["drifted"] is False
    assert tripped[1]["drifted"] is True
    assert tripped[1]["mean_d2_batch"] > tripped[1]["mean_d2_base"] * 1.1

    # invalid vectors are excluded, not poisonous (valid_vec contract)
    poisoned = batch_in.union(spark.createDataFrame(
        [(300, None), (301, []),
         (302, [float("nan")] * dim)],
        "vec_id long, embedding array<float>"))
    again = {r["cell"]: r for r in
             op("centroid_drift", poisoned, cfg, views={}).collect()}
    assert again[0]["n_batch"] + again[1]["n_batch"] == 40


def test_ann_ivfpq_recall_floor_at_default_nprobe(spark):
    """VERDICT r10 #7: the IVFADC plan gate proves the cell filter
    prunes; this pins what pruning COSTS in recall. Clustered
    synthetic data (the knn_join recall pattern): recall@10 at the
    default pruned nprobe must clear a floor, and probing every cell
    must recover the exact top-10."""
    import numpy as np

    rng = np.random.RandomState(3)
    dim = 16

    def unit(v):
        v = np.asarray(v, dtype=np.float64)
        return v / np.linalg.norm(v)

    cents = [unit(rng.randn(dim)) for _ in range(8)]
    rows = []
    for ci, c in enumerate(cents):
        for j in range(30):
            rows.append((ci * 100 + j,
                         unit(c + 0.05 * rng.randn(dim)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    mat = np.vstack([np.asarray(v, dtype=np.float64) for _, v in rows])
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    probe = mat[0]
    ids = np.array([i for i, _ in rows])
    truth = set(ids[np.argsort(-(mat @ probe), kind="stable")[:10]])

    cfg = {"dim": dim, "m": 4, "ks": 16, "refine": 1,
           "probe_id": 0, "k": 10, "rerank": 32}
    pruned = {r["vec_id"] for r in
              op("ann_pq", df, {**cfg, "n_cells": 8, "nprobe": 2})
              .collect()}
    assert len(pruned & truth) / 10 >= 0.9, sorted(pruned)

    exhaustive = {r["vec_id"] for r in
                  op("ann_pq", df, {**cfg, "n_cells": 8, "nprobe": 8})
                  .collect()}
    assert exhaustive == truth


def test_model_refresh_selective_reencode_versions_and_model_root(
        spark, tmp_path):
    """model_refresh (round 12, VERDICT r11 #4): a drifted cell
    retrains and re-encodes ONLY its rows (version_old+1); quiet
    cells pass through bit-untouched; the no-drift path runs zero
    training; model_root persists the retrained books/cells as an
    atomically-swapped managed version; and mixed-version serving
    (ann_pq_versioned) returns the exact numpy-merged top-k."""
    import numpy as np

    from blackroad_data_pipeline_spark.store import (
        store_current_version,
        store_resolve,
    )

    dim = 8

    def vec(center, bump, eps):
        v = [0.0] * dim
        v[center] = 1.0
        v[(center + 3) % dim] += eps
        v[4] += bump
        return v

    cells = spark.createDataFrame(
        [(0, [1.0] + [0.0] * 7), (1, [0.0, 1.0] + [0.0] * 6)],
        "cell int, centroid array<double>")
    base = spark.createDataFrame(
        [(i, vec(i % 2, 0.0, 0.01 * ((i % 5) - 2))) for i in range(40)],
        "vec_id long, embedding array<float>")
    batch_shift = spark.createDataFrame(
        [(200 + i, vec(i % 2, 0.5 if i % 2 == 1 else 0.0,
                       0.01 * ((i % 5) - 2))) for i in range(40)],
        "vec_id long, embedding array<float>")
    batch_in = spark.createDataFrame(
        [(100 + i, vec(i % 2, 0.0, 0.01 * ((i % 5) - 2)))
         for i in range(40)],
        "vec_id long, embedding array<float>")

    pq = {"dim": dim, "m": 2, "ks": 2, "refine": 1, "seed_order": "id"}
    books0 = op("pq_encode", base, {**pq, "emit": "books"})
    root = str(tmp_path / "models")
    cfg = {**pq, "threshold": 0.10, "n_cells": 2, "cells": cells,
           "books": books0, "baseline": base, "store": base,
           "model_root": root}

    out = {r["vec_id"]: r for r in
           op("model_refresh", batch_shift, cfg, views={}).collect()}
    assert len(out) == 40
    # cell 1 drifted (shifted population), cell 0 quiet
    vers = {r["ivf_cell"] for r in out.values()
            if r["model_version"] == 0}
    assert vers == {0}
    redo = [r for r in out.values() if r["model_version"] == 1]
    assert redo and all(r["vec_id"] % 2 == 1 for r in redo)

    # quiet rows pass through with the OLD model's codes, bit-equal
    old_codes = {r["vec_id"]: list(r["pq_code"]) for r in
                 op("pq_encode", base, {**pq, "books": books0},
                    views={}).collect()}
    for r in out.values():
        if r["model_version"] == 0:
            assert list(r["pq_code"]) == old_codes[r["vec_id"]]

    # drifted rows carry codes from books retrained on the window
    # (deterministic training: an independent pq_encode reproduces
    # the frozen retrain bit-for-bit)
    books1 = op("pq_encode", batch_shift, {**pq, "emit": "books"})
    new_codes = {r["vec_id"]: list(r["pq_code"]) for r in
                 op("pq_encode", base, {**pq, "books": books1},
                    views={}).collect()}
    for r in redo:
        assert list(r["pq_code"]) == new_codes[r["vec_id"]]

    # model_root: managed version swapped in, q_centroid schema
    assert store_current_version(root) == "v000001"
    vdir = store_resolve(root)
    nb = spark.read.parquet(f"{vdir}/books")
    assert nb.count() == 4  # m*ks
    nc = spark.read.parquet(f"{vdir}/cells")
    assert set(nc.columns) == {"cell", "q_centroid"}
    # the refreshed cells model feeds the NEXT refresh (q_centroid
    # path). ADVICE r12 strengthening: gate, keep/redo split, and an
    # independent integer replay must AGREE cell-for-cell — the old
    # q/scale float detour in the gate could disagree with the exact
    # integers the split uses on boundary components.
    out2 = op("model_refresh", batch_in,
              {**cfg, "cells": nc, "baseline": batch_shift,
               "model_root": None, "version_old": 1},
              views={}).collect()
    assert {r["model_version"] for r in out2} <= {1, 2}
    drifted2 = {r["cell"] for r in
                op("centroid_drift", batch_in,
                   {"field": "embedding", "dim": dim, "cells": nc,
                    "baseline": batch_shift, "threshold": 0.10},
                   views={}).collect() if r["drifted"]}
    qc2 = np.zeros((2, dim), dtype=np.int64)
    for r in nc.collect():
        qc2[r["cell"]] = r["q_centroid"]
    base_emb = {b["vec_id"]: b["embedding"] for b in base.collect()}
    for r in sorted(out2, key=lambda r: r["vec_id"]):
        q = np.floor(np.array(base_emb[r["vec_id"]],
                              dtype=np.float64) * 1e6).astype(np.int64)
        old_cell = int(np.argmin(((qc2 - q) ** 2).sum(axis=1)))
        assert r["model_version"] == (2 if old_cell in drifted2 else 1)
        if r["model_version"] == 1:
            assert r["ivf_cell"] == old_cell

    # no-drift path: in-distribution batch -> everything version_old,
    # and no new model version appears under the root
    quiet = op("model_refresh", batch_in, cfg, views={}).collect()
    assert {r["model_version"] for r in quiet} == {0}
    assert store_current_version(root) == "v000001"

    # mixed-version serving: exact merged top-k vs a numpy replay
    mixed = op("model_refresh", batch_shift, {**cfg, "model_root": None},
               views={})
    vbooks = (books0.withColumn("model_version", F.lit(0))
              .unionByName(books1.withColumn("model_version", F.lit(1))))
    probe = vec(0, 0.0, 0.0)
    got = op("ann_pq_versioned", base,
             {**pq, "probe": probe, "k": 5, "books": vbooks,
              "codes": mixed}, views={}).collect()

    def books_np(bdf):
        arr = np.zeros((2, 2, 4), dtype=np.int64)
        for r in bdf.collect():
            arr[r["subspace"], r["code"]] = r["codeword"]
        return arr
    b_np = {0: books_np(books0), 1: books_np(books1)}
    qv = np.floor(np.array(probe) * 1e6).astype(np.int64)
    exp = []
    for r in mixed.collect():
        bb = b_np[r["model_version"]]
        d = sum(int(((qv[j * 4:(j + 1) * 4]
                      - bb[j, r["pq_code"][j]]) ** 2).sum())
                for j in range(2))
        exp.append((d, r["vec_id"]))
    exp = sorted(exp)[:5]
    assert [(r["adc_dist"], r["vec_id"]) for r in got] == exp


def test_corrupt_media_payloads_never_crash_and_null_mode(spark):
    """Round 12 (VERDICT r11 #7): NON-NULL garbage — zero-byte blobs,
    wrong magic, a TRUNCATED genuine PNG (valid signature, torn
    chunks) — through every media kernel. Auto mode: deterministic
    stub, tagged, never a kernel crash. on_error='null': corrupt
    payloads become ABSENT ones (NULL metadata, the round-11
    NULL-payload contract), while a VALID payload in the same Arrow
    batch still decodes for real."""
    import io
    import struct
    import wave

    png, _ = _tiny_png(24, 16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(8000)
        wv.writeframes(struct.pack("<4h", 1, -1, 2, -2))
    wav = buf.getvalue()

    rows = [(0, bytearray(png)),            # valid PNG
            (1, bytearray(b"")),            # zero-byte blob
            (2, bytearray(b"GIF89a trust me")),   # wrong magic
            (3, bytearray(png[:20])),       # truncated mid-IHDR
            (4, bytearray(png[:-30])),      # torn IDAT/IEND
            (5, bytearray(wav))]            # audio bytes in an image op
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    # auto mode: stub fallback, tagged, no crash (pinned since r10).
    # doc 4 (torn IDAT) keeps REAL metadata: decode_image reads the
    # intact IHDR only — width/height/mode don't need pixel data.
    auto = {r["doc_id"]: r for r in
            op("decode_image", df, {}).collect()}
    assert (auto[0]["img_width"], auto[0]["img_mode"]) == (24, "RGB")
    assert (auto[4]["img_width"], auto[4]["img_mode"]) == (24, "RGB")
    assert all(auto[i]["img_mode"] == "STUB" for i in (1, 2, 3, 5))

    # on_error=null: corrupt == absent, valid still decodes for real
    nul = {r["doc_id"]: r for r in
           op("decode_image", df, {"on_error": "null"}).collect()}
    assert (nul[0]["img_width"], nul[0]["img_height"],
            nul[0]["img_mode"]) == (24, 16, "RGB")
    assert nul[4]["img_mode"] == "RGB"  # header intact -> still meta
    for i in (1, 2, 3, 5):
        assert (nul[i]["img_width"], nul[i]["img_height"],
                nul[i]["img_mode"]) == (None, None, None)

    rz = {r["doc_id"]: r for r in
          op("resize_image", df, {"target_w": 8, "target_h": 6,
                                  "on_error": "null"}).collect()}
    assert rz[0]["resized_payload"] is not None
    assert (rz[0]["resized_w"], rz[0]["resized_h"]) == (8, 6)
    for i in (1, 2, 3, 4):
        assert rz[i]["resized_payload"] is None
        assert rz[i]["resized_w"] is None and rz[i]["resized_h"] is None

    ph = {r["doc_id"]: r for r in
          op("phash_image", df, {"on_error": "null"}).collect()}
    assert ph[0]["phash"] is not None
    assert all(ph[i]["phash"] is None for i in (1, 2, 3, 4, 5))

    au = {r["doc_id"]: r for r in
          op("audio_features", df, {"on_error": "null"}).collect()}
    assert au[5]["audio_samples"] == 4          # the WAV decodes
    for i in (0, 1, 2, 3, 4):                   # images are not audio
        assert au[i]["audio_samples"] is None
        assert au[i]["audio_seconds"] is None
        assert au[i]["audio_rms"] is None

    # frame_sample is pure byte plumbing: a zero-byte payload yields
    # empty frame slices, never a crash
    fr = op("frame_sample", df, {"n_frames": 2}).collect()
    assert len(fr) == 12
    assert all(r["frame_payload"] is not None for r in fr)

    with pytest.raises(Exception, match="on_error must be"):
        op("decode_image", df, {"on_error": "explode"}).collect()


def test_semdedup_max_cell_trips_loud_on_hot_cluster(spark):
    """Round 12 (VERDICT r11 #5): the per-cell quadratic guard under
    key skew — a zipf-hot cluster (95% of the corpus in one cell,
    ~20x the median) must trip max_cell LOUDLY instead of silently
    going quadratic; raising the cap (the operator's documented
    remedy) completes on the same data."""
    import numpy as np

    rng = np.random.RandomState(12)

    def unit(v):
        v = np.asarray(v, dtype=np.float64)
        return (v / np.linalg.norm(v)).tolist()

    hot, cold = [1.0] + [0.0] * 7, [0.0, 1.0] + [0.0] * 6
    rows = [(i, unit(np.asarray(hot if i < 190 else cold)
                     + 0.05 * rng.randn(8)))
            for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cfg = {"dim": 8, "n_cells": 2, "eps": 0.999, "seed_order": "id",
           "max_cell": 50}
    with pytest.raises(Exception, match="exceeds max_cell"):
        op("semdedup", df, cfg, views={}).collect()
    out = op("semdedup", df, {**cfg, "max_cell": 500}, views={})
    assert out.count() > 100  # hot cell processed once the cap allows


def test_centroid_drift_q_centroid_path_is_integer_exact(spark):
    """ADVICE r12: a refreshed ``q_centroid`` model must feed the
    drift gate's assignment as EXACT integers — the old q/scale float
    detour rounded (floor((249/1e6)*1e6) == 248), shifting boundary
    cell assignments by 1/component. Constructed boundary: with the
    lossy centroid the batch point TIES and falls to cell 0; with the
    exact integer it strictly belongs to cell 1."""
    import math

    scale = 1e6
    qa = next(q for q in range(2, 100000)
              if math.floor(q / scale * scale) == q - 1)
    # data point quantizes (pinned floor(x*scale) semantics) to q_v
    x = (qa - 2) / scale
    q_v = math.floor(x * scale)
    qb = 2 * q_v - qa + 1  # exact: |q_v-qa| > |q_v-qb|; lossy: tie
    assert (q_v - qa) ** 2 > (q_v - qb) ** 2
    assert (q_v - (qa - 1)) ** 2 == (q_v - qb) ** 2  # lossy tie -> cell 0

    cells = spark.createDataFrame(
        [(0, [qa]), (1, [qb])], "cell int, q_centroid array<bigint>")
    baseline = spark.createDataFrame(
        [(0, [qa / scale]), (1, [qb / scale])],
        "vec_id long, embedding array<double>")
    batch = spark.createDataFrame(
        [(10, [x])], "vec_id long, embedding array<double>")
    out = {r["cell"]: r for r in
           op("centroid_drift", batch,
              {"field": "embedding", "dim": 1, "scale": scale,
               "cells": cells, "baseline": baseline}, views={}).collect()}
    assert out[1]["n_batch"] == 1 and out[0]["n_batch"] == 0


def test_ann_pq_versioned_max_versions_guard(spark, vecs):
    """VERDICT r12 #3: the serving CASE bakes m*ks literals per live
    version; a store that accumulates versions (forgotten store_gc)
    must trip a LOUD bound instead of quietly growing the codegen
    expression past the interpreted-fallback cliff."""
    pq = {"dim": 4, "m": 2, "ks": 2, "seed_order": "id"}
    books0 = op("pq_encode", vecs, {**pq, "emit": "books"})
    vbooks = None
    for v in range(9):
        b = books0.withColumn("model_version", F.lit(v))
        vbooks = b if vbooks is None else vbooks.unionByName(b)
    codes = (op("pq_encode", vecs, {**pq, "books": books0})
             .withColumn("model_version", F.lit(0))
             .select("vec_id", "pq_code", "model_version"))
    cfg = {**pq, "probe": [1.0, 0.0, 0.0, 0.0], "k": 3,
           "books": vbooks, "codes": codes}
    with pytest.raises(Exception, match="max_versions"):
        op("ann_pq_versioned", vecs, cfg, views={}).collect()
    got = op("ann_pq_versioned", vecs, {**cfg, "max_versions": 9},
             views={}).collect()
    assert len(got) == 3
