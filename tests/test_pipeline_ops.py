"""Training-data pipeline operators: dedup (exact/MinHash/SimHash),
similarity search, text analysis, multimodal plumbing."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparkolumnar.pipeline import (attach_media_meta, brute_force_topk,
                                   decode_and_featurize, exact_dedup,
                                   fingerprint, frame_sample, ivf_topk,
                                   lang_id, minhash_neardup_pairs,
                                   minhash_signatures, quality_score,
                                   simhash_buckets, token_stats)


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        "the quick brown fox jumps over the lazy dog again and again",
        "a completely different document about spark and columnar storage",
        "der schnelle braune fuchs springt und springt nicht mit",
        "le renard brun rapide saute et saute pour la science",
    ]
    rows = []
    i = 0
    for rep in range(25):
        for b in base:
            rows.append((i, b))  # exact duplicates across reps
            i += 1
    # near-duplicates: one word changed
    rows.append((i, base[0].replace("lazy", "sleepy"))); i += 1
    rows.append((i, base[1].replace("spark", "flink"))); i += 1
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_exact_dedup(spark, docs):
    out = exact_dedup(docs, ["text"], "doc_id")
    assert out.count() == 6  # 4 bases + 2 near-dup variants
    assert out.agg(F.min("doc_id")).collect()[0][0] == 0


def _true_jaccard(a: str, b: str, k: int = 5) -> float:
    sa = {a[i:i + k] for i in range(len(a) - k + 1)}
    sb = {b[i:i + k] for i in range(len(b) - k + 1)}
    return len(sa & sb) / len(sa | sb)


def test_minhash_estimates_jaccard(spark, docs):
    pairs = minhash_neardup_pairs(docs, "text", "doc_id", n_hashes=128,
                                  bands=32, threshold=0.5)
    got = {(r["a"], r["b"]): r["est_jaccard"] for r in pairs.collect()}
    # exact duplicates estimate ~1.0
    assert got[(0, 4)] > 0.95
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    near = (0, 100)  # base0 vs its 'sleepy' variant
    assert near in got
    true_j = _true_jaccard(texts[near[0]], texts[near[1]])
    assert abs(got[near] - true_j) < 0.25
    # unrelated docs never pair
    assert (0, 1) not in got


def test_simhash_duplicates_share_bands(spark, docs):
    sh = simhash_buckets(docs, "text", "doc_id")
    rows = {r["doc_id"]: r for r in sh.collect()}
    assert rows[0]["simhash"] == rows[4]["simhash"]  # identical docs
    near = rows[0], rows[100]
    shared = sum(near[0][f"band{b}"] == near[1][f"band{b}"] for b in range(4))
    assert shared >= 1  # near-dup shares at least one band
    far = rows[0], rows[1]
    assert rows[0]["simhash"] != rows[1]["simhash"]


def test_brute_force_topk_matches_numpy(spark):
    rng = np.random.default_rng(3)
    emb = rng.normal(size=(200, 16))
    pdf = pd.DataFrame({"vec_id": range(200),
                        "embedding": [e.tolist() for e in emb]})
    df = spark.createDataFrame(pdf)
    queries = df.filter(F.col("vec_id") < 5)
    out = brute_force_topk(df, queries, k=3)
    got = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in out.collect()}
    normed = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    sims = normed @ normed.T
    for q in range(5):
        order = np.argsort(-sims[q])
        expect = [i for i in order if i != q][:3]
        assert [got[(q, r + 1)] for r in range(3)] == expect


def test_ivf_topk_recall(spark):
    rng = np.random.default_rng(4)
    # clustered data so IVF has structure to exploit
    centers = rng.normal(size=(8, 16)) * 5
    emb = np.vstack([c + rng.normal(size=(50, 16)) for c in centers])
    pdf = pd.DataFrame({"vec_id": range(len(emb)),
                        "embedding": [e.tolist() for e in emb]})
    df = spark.createDataFrame(pdf)
    queries = df.filter(F.col("vec_id") % 50 == 0)
    exact = brute_force_topk(df, queries, k=5)
    approx = ivf_topk(df, queries, k=5, n_clusters=8, nprobe=3)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.8, recall


def test_text_stats_and_lang_id(spark, docs):
    ts = token_stats(docs).collect()
    assert all(r["ws_tokens"] > 0 for r in ts)
    qs = quality_score(docs).collect()
    assert all(0.0 <= r["quality"] <= 1.0 for r in qs)
    li = {r["doc_id"]: r["lang_pred"] for r in lang_id(docs).collect()}
    assert li[0] == "en"
    assert li[2] == "de"
    assert li[3] == "fr"
    fp = fingerprint(docs).collect()
    by_text = {}
    for r in fp:
        by_text.setdefault(r["fp_md5"], set()).add(r["doc_id"])
    assert len(by_text) == 6  # same normalization groups as exact dedup


def test_multimodal_plumbing(spark):
    pdf = pd.DataFrame({
        "k": range(20),
        "img": [bytes([i] * (100 + i)) for i in range(20)],
    })
    df = spark.createDataFrame(pdf)
    meta = attach_media_meta(df, "img").collect()
    assert all(r["n_bytes"] == 100 + r["k"] for r in meta)
    feats = decode_and_featurize(df, "img", target=8, fake=True).collect()
    assert all(len(r["feature"]) == 3 for r in feats)
    assert all(0.0 <= v <= 1.0 for r in feats for v in r["feature"])
    # determinism of the stub
    feats2 = decode_and_featurize(df, "img", target=8, fake=True).collect()
    assert sorted(r["feature"] for r in feats) == sorted(r["feature"] for r in feats2)
    with pytest.raises(Exception):
        decode_and_featurize(df, "img", fake=False).collect()
    frames = frame_sample(df, "img", every_n_bytes=32, max_frames=4)
    got = frames.groupBy("k").count().collect()
    assert all(1 <= r["count"] <= 4 for r in got)


def test_ngram_jaccard_verify(spark, docs):
    from sparkolumnar.pipeline import ngram_jaccard_verify, minhash_neardup_pairs
    import pandas as pd

    cand = minhash_neardup_pairs(docs, "text", "doc_id", n_hashes=128,
                                 bands=32, threshold=0.5)
    verified = ngram_jaccard_verify(docs, cand.select("a", "b"),
                                    "text", "doc_id")
    got = {(r["a"], r["b"]): r["jaccard"] for r in verified.collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert got[(0, 4)] == 1.0  # exact duplicates
    tj = _true_jaccard(texts[0], texts[100])
    assert abs(got[(0, 100)] - tj) < 1e-6  # exact, not an estimate


def test_cosine_neardup_pairs(spark):
    from sparkolumnar.pipeline import cosine_neardup_pairs
    import pandas as pd

    rng = np.random.default_rng(9)
    base = rng.normal(size=(50, 8))
    # 5 near-dup rows: tiny perturbations of rows 0..4
    emb = np.vstack([base, base[:5] + 0.01 * rng.normal(size=(5, 8))])
    pdf = pd.DataFrame({"vec_id": range(55),
                        "embedding": [e.tolist() for e in emb]})
    df = spark.createDataFrame(pdf)
    out = cosine_neardup_pairs(df, df, threshold=0.99)
    pairs = {(r["query_id"], r["neighbor_id"]) for r in out.collect()}
    for i in range(5):
        assert (i, 50 + i) in pairs and (50 + i, i) in pairs
    # unrelated gaussian vectors in 8d essentially never reach 0.99
    assert len(pairs) <= 25


def test_minhash_hot_bucket_cap(spark):
    """Mass-duplicated boilerplate must not go quadratic: 10k identical
    docs land in one bucket per band, which the cap drops (run exact_dedup
    first in production; the cap is the safety valve). Must complete fast
    and emit no pairs from the capped bucket."""
    import time

    from sparkolumnar.pipeline import minhash_neardup_pairs

    rows = [(i, "the same boilerplate text repeated forever " * 5)
            for i in range(10_000)]
    # plus one pair of genuinely similar non-boilerplate docs
    rows.append((20_000, "a unique document about columnar encoding speed"))
    rows.append((20_001, "a unique document about columnar encoding speeds"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    t0 = time.time()
    pairs = minhash_neardup_pairs(df, "text", "doc_id", n_hashes=64,
                                  bands=16, threshold=0.5,
                                  max_bucket=256).collect()
    assert time.time() - t0 < 120  # quadratic blowup would be ~50M pairs
    ids = {(r["a"], r["b"]) for r in pairs}
    assert (20_000, 20_001) in ids
    assert all(a >= 20_000 for a, _ in ids)  # boilerplate bucket capped


def test_minhash_band_join_carries_ids_only(spark):
    """The LSH band self-join must not shuffle signature arrays — the
    banded plan projects (id, band, bucket) only."""
    from sparkolumnar.pipeline import minhash_neardup_pairs

    rows = [(i, f"doc number {i} words {' x' * (i % 7)}")
            for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = minhash_neardup_pairs(df, "text", "doc_id", threshold=0.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the self-join inputs are id-only projections; signatures join later
    joins = [seg for seg in plan.split("SortMergeJoin")]
    assert "signature" not in joins[0] or "sig_a" in plan  # sanity
    out.count()  # runs end-to-end


def test_ivf_persisted_index_recall(spark, tmp_path):
    """ivf_build writes centroids + cell-partitioned corpus; ivf_query
    probes only the needed cells (pruned scan) with recall >= 0.8."""
    from sparkolumnar.pipeline import ivf_build, ivf_query

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(8, 16)) * 5
    emb = np.vstack([c + rng.normal(size=(50, 16)) for c in centers])
    pdf = pd.DataFrame({"vec_id": range(len(emb)),
                        "embedding": [e.tolist() for e in emb]})
    df = spark.createDataFrame(pdf)
    path = str(tmp_path / "ivf")
    ivf_build(df, path, n_clusters=8, sample_rows=400)
    queries = df.filter(F.col("vec_id") % 50 == 0)
    approx = ivf_query(spark, path, queries, k=5, nprobe=3)
    exact = brute_force_topk(df, queries, k=5)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert len(e & a) / len(e) >= 0.8
    # the probe scan is partition-pruned: it reads only the probed cells
    probe_plan = ivf_query(spark, path, queries.limit(1), k=5, nprobe=2)
    plan = probe_plan._jdf.queryExecution().executedPlan().toString()
    assert "cell" in plan  # partition filter present on the scan


def test_media_embedding_to_ann_pipeline(spark):
    """Multimodal near-dup shape end-to-end: media bytes -> (stub)
    embeddings -> exact cosine top-k. Duplicate media must be each
    other's nearest neighbor (identical bytes -> identical embedding)."""
    from sparkolumnar.pipeline import media_embeddings

    rows = [(i, bytes([i % 7] * (64 + i % 5))) for i in range(40)]
    rows += [(100, rows[3][1]), (101, rows[4][1])]  # exact dup media
    df = spark.createDataFrame(rows, "k long, img binary")
    emb = media_embeddings(df, "img", "k", dim=16, fake=True)
    assert emb.count() == 42
    queries = emb.filter(F.col("k").isin([100, 101]))
    top = brute_force_topk(emb, queries, k=1, id_col="k")
    got = {r["query_id"]: r["neighbor_id"] for r in top.collect()}
    assert got[100] == 3 and got[101] == 4
    import pytest as _pt
    with _pt.raises(Exception):
        media_embeddings(df, "img", "k", fake=False).collect()


def test_hyperplane_lsh_duplicates_and_noise(spark):
    """Identical embeddings share all bands (hamming 0); a perturbed copy
    stays close in hamming; unrelated random vectors are farther on
    average. Deterministic across runs (fixed integer hyperplanes)."""
    import numpy as np

    from sparkolumnar.pipeline import (hyperplane_lsh_signatures,
                                       hyperplane_neardup_pairs)

    rng = np.random.default_rng(4)
    base = rng.normal(size=64)
    near = base + rng.normal(scale=0.01, size=64)
    rows = [(0, base.tolist()), (1, base.tolist()), (2, near.tolist())]
    rows += [(10 + i, rng.normal(size=64).tolist()) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    sigs = {r["vec_id"]: r["simhash"]
            for r in hyperplane_lsh_signatures(df).collect()}
    assert sigs[0] == sigs[1]
    ham_near = bin(sigs[0] ^ sigs[2]).count("1")
    assert ham_near <= 2
    pairs = {(r["a"], r["b"]): r["hamming"]
             for r in hyperplane_neardup_pairs(df).collect()}
    assert pairs[(0, 1)] == 0
    assert (0, 2) in pairs or (2, 0) in pairs  # near-dup collides
    # determinism
    sigs2 = {r["vec_id"]: r["simhash"]
             for r in hyperplane_lsh_signatures(df).collect()}
    assert sigs == sigs2


# --- round 4: near-dup group resolution (connected components) ---------------


def test_connected_components_known_graph(spark):
    from sparkolumnar.pipeline import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (3, 7)], "a long, b long")
    nodes = spark.createDataFrame([(i,) for i in range(9)], "id long")
    got = {r["id"]: r["group_id"]
           for r in connected_components(pairs, nodes).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 1, 7: 1, 4: 4, 5: 5, 6: 5, 8: 8}


def test_connected_components_chain_converges(spark):
    """A 12-node path graph needs several propagation rounds — the loop
    must iterate to fixpoint, not stop after one join."""
    from sparkolumnar.pipeline import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "a long, b long")
    nodes = spark.createDataFrame([(i,) for i in range(12)], "id long")
    got = {r["id"]: r["group_id"]
           for r in connected_components(pairs, nodes).collect()}
    assert got == {i: 0 for i in range(12)}


def test_dedup_groups_survivors(spark):
    from pyspark.sql import functions as F

    from sparkolumnar.pipeline import dedup_groups

    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "a long, b long")
    nodes = spark.createDataFrame(
        [(i, float(10 - i)) for i in range(8)], "id long, quality double")
    # default: min-id survivor
    got = {r["id"]: (r["group_id"], r["keep"])
           for r in dedup_groups(pairs, nodes).collect()}
    assert got[1] == (1, 1) and got[2] == (1, 0) and got[3] == (1, 0)
    assert got[5] == (5, 1) and got[6] == (5, 0)
    assert got[0] == (0, 1) and got[4] == (4, 1) and got[7] == (7, 1)
    # prefer_col: highest quality wins (quality decreasing in id -> still
    # min id here), so flip the preference with a crafted column
    nodes2 = spark.createDataFrame(
        [(i, float(i)) for i in range(8)], "id long, quality double")
    got2 = {r["id"]: r["keep"]
            for r in dedup_groups(pairs, nodes2,
                                  prefer_col="quality").collect()}
    assert got2[3] == 1 and got2[1] == 0 and got2[2] == 0  # max quality=id 3
    assert got2[6] == 1 and got2[5] == 0
    # exactly one survivor per group either way
    out = dedup_groups(pairs, nodes2, prefer_col="quality")
    per_group = (out.groupBy("group_id")
                 .agg(F.sum("keep").alias("k")).collect())
    assert all(r["k"] == 1 for r in per_group)


def test_connected_components_warns_when_unconverged(spark):
    import warnings

    from sparkolumnar.pipeline import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "a long, b long")
    nodes = spark.createDataFrame([(i,) for i in range(10)], "id long")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        connected_components(pairs, nodes, max_iter=2).collect()
    assert any("did not converge" in str(x.message) for x in w)


def test_connected_components_long_chain_olog_rounds(spark, tmp_path):
    """r4-verdict item #4: pointer doubling makes an adversarial 2000-node
    path graph converge within the default 25 rounds (plain neighbor-min
    propagation would need ~2000), with no unconverged warning."""
    import warnings

    from sparkolumnar.pipeline import connected_components

    n = 2000
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a long, b long")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = connected_components(pairs, nodes).groupBy("group_id").count()
        rows = got.collect()
    assert not any("did not converge" in str(x.message) for x in w)
    assert len(rows) == 1 and rows[0]["count"] == n
    assert rows[0]["group_id"] == 0


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """checkpoint='reliable' (cluster-durable) produces the same groups;
    without a checkpoint dir it fails loudly up front."""
    import pytest as _pytest

    from sparkolumnar.pipeline import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "a long, b long")
    nodes = spark.createDataFrame([(i,) for i in range(8)], "id long")
    sc = spark.sparkContext
    old = sc.getCheckpointDir()
    if old is None:
        with _pytest.raises(ValueError, match="setCheckpointDir"):
            connected_components(pairs, nodes, checkpoint="reliable")
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    got = {r["id"]: r["group_id"]
           for r in connected_components(
               pairs, nodes, checkpoint="reliable").collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7}
    del old  # dir stays set for the session; .checkpoint() is opt-in


def test_shingle_hashes_vectorized_identity():
    """r4-verdict item #6: the cross-document vectorized shingle hasher
    (concatenated buffer + global lexsort dedup, chunked) produces
    byte-identical output to the straightforward per-doc formula, for
    long/short/empty/unicode docs and across chunk boundaries."""
    import pandas as pd

    import sparkolumnar.pipeline.dedup as dd

    def reference(texts, k):
        out = []
        B = np.uint64(1099511628211)
        for t in texts:
            enc = t.encode("utf-8", "surrogatepass")
            b = np.frombuffer(enc, dtype=np.uint8)
            n = len(b)
            if n < k:
                h = np.uint64(1469598103934665603)
                with np.errstate(over="ignore"):
                    for byte in enc:
                        h = (h ^ np.uint64(byte)) * B
                out.append(np.array([h], dtype=np.uint64))
                continue
            h = np.zeros(n - k + 1, dtype=np.uint64)
            with np.errstate(over="ignore"):
                for j in range(k):
                    h = h * B + b[j: n - k + 1 + j]
            out.append(np.unique(h))
        return out

    import numpy as np
    import random

    rng = random.Random(99)
    texts = ["", "ab", "abcd", "héllo wörld " * 50,
             "the quick brown fox " * 200, "aaaaaaa" * 30]
    texts += ["".join(rng.choice("abcdef ") for _ in range(
        rng.randrange(0, 400))) for _ in range(200)]
    s = pd.Series(texts)
    for k in (3, 5, 8):
        want = reference(texts, k)
        got = dd._shingle_hashes(s, k)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g.dtype == w.dtype and np.array_equal(g, w)
    # chunking exercised: force a tiny chunk budget, results unchanged
    old = dd._SHINGLE_CHUNK_BYTES
    dd._SHINGLE_CHUNK_BYTES = 64
    try:
        got2 = dd._shingle_hashes(s, 5)
        for g, w in zip(got2, reference(texts, 5)):
            assert np.array_equal(g, w)
    finally:
        dd._SHINGLE_CHUNK_BYTES = old


def test_winnow_fingerprints_guarantee_and_join(spark):
    """Winnowing guarantee (SIGMOD 2003): documents sharing a substring
    of length >= window + k - 1 share at least one fingerprint, so a
    fingerprint equi-join surfaces the fuzzy-duplicate pair; unrelated
    documents share none (probabilistically, distinct alphabets here)."""
    from pyspark.sql import functions as F

    from sparkolumnar.pipeline import winnow_fingerprints

    shared = "the quick brown fox jumps over the lazy dog"
    rows = [(1, "AAA " + shared + " BBB"),
            (2, "xyzzy plugh " + shared + " qwert"),
            (3, "0123456789 0123456789 0123456789 012345")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(df, "text", "doc_id", k=5, window=4).cache()
    per = {r["doc_id"]: r["n"] for r in
           fps.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert all(per[i] > 0 for i in (1, 2, 3))
    a = fps.alias("a")
    b = fps.alias("b")
    pairs = (a.join(b, F.col("a.fp") == F.col("b.fp"))
             .where(F.col("a.doc_id") < F.col("b.doc_id"))
             .select(F.col("a.doc_id").alias("x"),
                     F.col("b.doc_id").alias("y")).distinct().collect())
    got = {(r["x"], r["y"]) for r in pairs}
    assert (1, 2) in got       # shared 44-char substring >= 8
    assert (1, 3) not in got and (2, 3) not in got
    # deterministic: same text -> identical fingerprint set
    again = winnow_fingerprints(df, "text", "doc_id", k=5, window=4)
    assert fps.exceptAll(again).count() == 0


def test_winnow_neardup_pairs_containment_and_hot_cap(spark):
    """winnow_neardup_pairs surfaces containment overlaps (a long
    substring shared by two docs) and the hot-fingerprint cap drops
    boilerplate shared by every document."""
    from pyspark.sql import functions as F

    from sparkolumnar.pipeline import winnow_neardup_pairs

    shared = "a remarkably specific sentence that both documents contain"
    # negatives use DISJOINT alphabets (digits / consonant runs) so no
    # 5-gram can collide with the English docs even by accident
    rows = [(1, "intro text. " + shared + " and more."),
            (2, "totally different framing: " + shared + " epilogue."),
            (3, "0123456789012345678901234567890123456789"),
            (4, "zzzzyyyyxxxxwwwwvvvvuuuuttttssssrrrrqqqq")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = winnow_neardup_pairs(df, "text", "doc_id", min_shared=2)
    got = {(r["a"], r["b"]): r["n_shared"] for r in pairs.collect()}
    assert (1, 2) in got and got[(1, 2)] >= 2
    assert all(p == (1, 2) for p in got)
    # boilerplate present in EVERY doc: max_bucket=3 drops its
    # fingerprints, so docs sharing ONLY the boilerplate pair-match less
    boiler = " COMMON FOOTER TEXT APPENDED EVERYWHERE IN THE CORPUS"
    rows2 = [(i, f"unique body {i} {'x' * i} zz{i}qq" + boiler)
             for i in range(1, 6)]
    df2 = spark.createDataFrame(rows2, "doc_id long, text string")
    uncapped = winnow_neardup_pairs(df2, "text", "doc_id",
                                    min_shared=1, max_bucket=10_000)
    capped = winnow_neardup_pairs(df2, "text", "doc_id",
                                  min_shared=1, max_bucket=3)
    assert uncapped.count() > capped.count()


# ------------------------------------------------- sampling + packing


def test_deterministic_sample_partition_invariant(spark):
    """The hash-threshold sample selects the SAME rows regardless of
    partitioning (Spark's df.sample does not) and different salts give
    independent subsets."""
    from sparkolumnar.pipeline import deterministic_sample

    pdf = pd.DataFrame({"k": range(20_000)})
    a = spark.createDataFrame(pdf).repartition(1)
    b = spark.createDataFrame(pdf).repartition(17)
    sa = {r["k"] for r in deterministic_sample(a, "k", 0.1).collect()}
    sb = {r["k"] for r in deterministic_sample(b, "k", 0.1).collect()}
    assert sa == sb
    assert 0.08 * 20_000 < len(sa) < 0.12 * 20_000  # ~uniform
    s2 = {r["k"] for r in
          deterministic_sample(a, "k", 0.1, salt="val").collect()}
    ovl = len(sa & s2) / 20_000
    assert ovl < 0.02  # ~f1*f2 = 1% expected overlap
    with pytest.raises(ValueError, match="fraction"):
        deterministic_sample(a, "k", 1.5)


def test_stratified_sample_per_stratum_rates(spark):
    from sparkolumnar.pipeline import stratified_sample

    pdf = pd.DataFrame({"k": range(30_000),
                        "g": ["en", "de", "xx"] * 10_000})
    df = spark.createDataFrame(pdf)
    out = stratified_sample(df, "g", "k", {"en": 0.2, "de": 1.0},
                            default_fraction=0.0)
    got = {r["g"]: r["n"] for r in
           out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert got["de"] == 10_000          # keep-all stratum is exact
    assert "xx" not in got              # default 0 drops the stratum
    assert 0.17 * 10_000 < got["en"] < 0.23 * 10_000


def test_pack_sequences_matches_python_twin(spark):
    """Every bin id equals the streaming-offset rule recomputed in
    Python; oversize documents get exactly one bin; groups pack
    independently."""
    from sparkolumnar.pipeline import pack_sequences, packing_stats

    rng = np.random.RandomState(11)
    pdf = pd.DataFrame({
        "doc_id": range(3_000),
        "g": [f"g{i % 5}" for i in range(3_000)],
        "tok": rng.randint(1, 900, 3_000)})
    pdf.loc[7, "tok"] = 5_000  # oversize doc: one bin, still packs
    df = spark.createDataFrame(pdf).repartition(8)
    packed = pack_sequences(df, "tok", budget=2_048, group_cols="g",
                            order_col="doc_id")
    got = {r["doc_id"]: r["bin_id"] for r in packed.collect()}
    for g, grp in pdf.sort_values("doc_id").groupby("g"):
        start = 0
        for _, row in grp.iterrows():
            assert got[row["doc_id"]] == start // 2_048, row["doc_id"]
            start += row["tok"]
    st = packing_stats(packed, "tok", group_cols="g").collect()
    assert all(r["n_docs"] >= 1 for r in st)
    with pytest.raises(ValueError, match="order_col"):
        pack_sequences(df, "tok", budget=2_048, group_cols="g")
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, "tok", budget=0, group_cols="g",
                       order_col="doc_id")
