"""Similarity search, text stats, multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_spark.operators import multimodal, similarity, textstats


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(5)
    base = rng.standard_normal((200, 32)).astype(np.float32)
    # plant near-dups: rows 100..104 ≈ rows 0..4 + tiny noise
    for i in range(5):
        base[100 + i] = base[i] + rng.standard_normal(32).astype(np.float32) * 0.01
    rows = [(int(i), base[i].tolist()) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df.persist(), base


def _brute_topk(base, q, k):
    sims = base @ q / (np.linalg.norm(base, axis=1) * np.linalg.norm(q))
    order = np.argsort(np.round(-sims, 4), kind="stable")
    return [int(i) for i in order[:k]]


def test_cosine_topk_matches_numpy(vectors):
    df, base = vectors
    q = base[7].tolist()
    got = [r["vec_id"] for r in similarity.cosine_topk(df, q, k=5).collect()]
    assert got[0] == 7
    expect = _brute_topk(base, np.asarray(q), 5)
    assert set(got) == set(expect)


def test_ann_lsh_recall(vectors):
    df, base = vectors
    hits = 0
    for probe in range(5):
        q = base[probe].tolist()
        exact = set(_brute_topk(base, np.asarray(q), 3))
        approx = {
            r["vec_id"]
            for r in similarity.ann_topk_lsh(df, q, k=3, n_bits=8).collect()
        }
        hits += len(exact & approx)
    assert hits >= 10  # ≥ 2/3 recall on the planted structure


def test_ivf_full_probe_equals_bruteforce(vectors):
    """n_probe = n_cells probes every cell, so the IVF result must EQUAL
    brute-force cosine_topk row-for-row regardless of the clustering."""
    df, base = vectors
    q = base[7].tolist()
    got = [
        (r["vec_id"], r["cosine"])
        for r in similarity.ivf_topk(df, q, k=8, n_cells=8, n_probe=8).collect()
    ]
    expect = [
        (r["vec_id"], r["cosine"])
        for r in similarity.cosine_topk(df, q, k=8).collect()
    ]
    assert got == expect


def test_ivf_recall_partial_probe(vectors):
    """Probing 3 of 8 cells: the query row itself must be retrieved
    (its cell is always the top probe: cos(q, centroid) ranking puts
    q's own argmax cell first) and planted near-dups should mostly
    surface — ≥2/3 recall of the exact top-3 over 5 probes, same bar
    as the LSH test."""
    df, base = vectors
    hits = 0
    for probe in range(5):
        q = base[probe].tolist()
        exact = set(_brute_topk(base, np.asarray(q), 3))
        approx = {
            r["vec_id"]
            for r in similarity.ivf_topk(
                df, q, k=3, n_cells=8, n_probe=3
            ).collect()
        }
        assert probe in approx  # self-retrieval
        hits += len(exact & approx)
    assert hits >= 10


def test_ivf_assignment_stable_under_repartition(vectors):
    """Cell assignment is a pure function of (vec, centroid set):
    repartitioning must not change any row's cell — the property that
    makes a persisted cell-partitioned index layout valid."""
    df, base = vectors
    a1, cents1 = similarity.ivf_index(df, n_cells=8)
    a2, cents2 = similarity.ivf_index(df.repartition(7), n_cells=8)
    assert np.allclose(cents1, cents2)
    m1 = {r["vec_id"]: r["_cell"] for r in a1.select("vec_id", "_cell").collect()}
    m2 = {r["vec_id"]: r["_cell"] for r in a2.select("vec_id", "_cell").collect()}
    assert m1 == m2
    assert len(set(m1.values())) > 1  # the quantizer actually partitions


def test_ivf_index_guards(spark, vectors):
    """Empty input raises a descriptive error; a pre-existing _cell
    column is rejected instead of silently clobbered."""
    df, _ = vectors
    empty = df.filter(F.col("vec_id") < 0)
    with pytest.raises(ValueError, match="empty"):
        similarity.ivf_centroids(empty, n_cells=4)
    with pytest.raises(ValueError, match="empty"):
        similarity.ivf_centroids_kmeans(empty, n_cells=4)
    with pytest.raises(ValueError, match="_cell"):
        similarity.ivf_index(df.withColumn("_cell", F.lit(0)), n_cells=4)


def test_ivf_index_reuse_and_kmeans(vectors):
    """A prebuilt (assigned, centroids) index reused across queries gives
    the same result as the one-shot path; the kmeans-refined centroids
    are deterministic under repartitioning and still satisfy the
    full-probe == brute-force identity."""
    df, base = vectors
    idx = similarity.ivf_index(df, n_cells=8)
    for qid in (3, 7):
        q = base[qid].tolist()
        one_shot = similarity.ivf_topk(df, q, k=5, n_cells=8, n_probe=8).collect()
        reused = similarity.ivf_topk(df, q, k=5, n_cells=8, n_probe=8, index=idx).collect()
        assert [tuple(r) for r in one_shot] == [tuple(r) for r in reused]
    c1 = similarity.ivf_centroids_kmeans(df, n_cells=8, iters=5, sample_size=200)
    c2 = similarity.ivf_centroids_kmeans(
        df.repartition(7), n_cells=8, iters=5, sample_size=200
    )
    assert np.array_equal(c1, c2)  # bitwise-deterministic spec
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)
    kidx = similarity.ivf_index(df, n_cells=8, centroids=c1)
    q = base[7].tolist()
    got = [
        (r["vec_id"], r["cosine"])
        for r in similarity.ivf_topk(
            df, q, k=8, n_cells=8, n_probe=8, index=kidx
        ).collect()
    ]
    expect = [
        (r["vec_id"], r["cosine"])
        for r in similarity.cosine_topk(df, q, k=8).collect()
    ]
    assert got == expect


def test_embedding_neardup_exact_matches_numpy(vectors):
    """The exact operator (the correctness contract the driver oracles)
    must equal the numpy brute-force pair set."""
    df, base = vectors
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in similarity.embedding_neardup_exact(df, threshold=0.9).collect()
    }
    norms = np.linalg.norm(base, axis=1)
    sims = (base @ base.T) / np.outer(norms, norms)
    expected = {
        (a, b): round(float(sims[a, b]), 4)
        for a in range(200)
        for b in range(a + 1, 200)
        if round(float(sims[a, b]), 4) >= 0.9
    }
    assert got == expected and {(i, 100 + i) for i in range(5)} <= set(got)


def test_embedding_neardup_lsh_recall_vs_exact(vectors):
    """The LSH scale path in its real pruning regime (high threshold,
    few wide bands) must recall every exact pair here and never emit a
    below-threshold pair (precision 1 by the exact-cosine verify)."""
    df, base = vectors
    exact = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_neardup_exact(df, threshold=0.98).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_neardup_pairs(
            df, threshold=0.98, n_bands=8, bits_per_band=8
        ).collect()
    }
    assert approx <= exact  # precision 1
    recall = len(approx & exact) / max(1, len(exact))
    assert recall >= 0.8, (recall, exact - approx)


def test_embedding_neardup_pairs(vectors):
    df, base = vectors
    pairs = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_neardup_pairs(df, threshold=0.98).collect()
    }
    expected = {(i, 100 + i) for i in range(5)}
    assert expected <= pairs
    for a, b in pairs - expected:
        cos = float(
            base[a] @ base[b] / (np.linalg.norm(base[a]) * np.linalg.norm(base[b]))
        )
        assert cos >= 0.979, (a, b, cos)


def test_textstats_columns(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog."),
            (2, "한국어 문서 품질 점수 계산 테스트 입니다"),
            (3, ""),
            (4, "mixed 한국어 and english tokens, punctuation! here?"),
        ],
        "doc_id long, text string",
    )
    out = textstats.quality_features(df).withColumns(
        {
            "lang": textstats.lang_id(F.col("text")),
            "subwords": textstats.subword_count(F.col("text")),
            "fp": textstats.fingerprint_udf(4)(F.col("text")),
        }
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["n_tokens"] == 9
    assert rows[1]["lang"] == "en"
    assert rows[2]["n_tokens"] == 7 and rows[2]["lang"] == "ko"
    assert rows[3]["n_tokens"] == 0 and rows[3]["lang"] == "unknown"
    assert rows[3]["fp"] == 0
    assert rows[4]["lang"] == "ko" or rows[4]["lang"] == "en"  # mixed: ratio rule
    assert rows[4]["subwords"] >= 8
    # fingerprint deterministic
    again = {r["doc_id"]: r["fp"] for r in out.collect()}
    assert all(again[k] == rows[k]["fp"] for k in again)


def test_multimodal_plumbing(spark):
    media = multimodal.synth_media(spark, n=30)
    feats = multimodal.extract_features(media, fake=True)
    rows = feats.collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r["feature"]) == multimodal.FEATURE_DIM
        assert r["n_bytes"] > 0
    # determinism across runs
    again = {r["asset_id"]: r["feature"] for r in feats.collect()}
    for r in rows:
        assert again[r["asset_id"]] == r["feature"]
    # frame sampling fan-out: one row per 1000ms of video
    frames = multimodal.sample_frames(media, every_ms=1000, fake=True)
    per_asset = {
        r["asset_id"]: r["n"]
        for r in frames.groupBy("asset_id").agg(F.count("*").alias("n")).collect()
    }
    vids = {r["asset_id"]: r["duration_ms"] for r in media.filter("kind='video'").collect()}
    assert set(per_asset) == set(vids)
    for aid, dur in vids.items():
        assert per_asset[aid] == max(1, dur // 1000)


def test_multimodal_real_decode_import_guarded(spark):
    """fake=False attempts the REAL decoders; in this sandbox the
    libraries are genuinely absent, so the guarded import must raise
    (fail fast on environment problems) — a cluster with Pillow/PyAV
    installed takes the real-decode path with no code change."""
    media = multimodal.synth_media(spark, n=3)
    with pytest.raises(Exception) as ei:
        multimodal.extract_features(media, fake=False).collect()
    msg = str(ei.value)
    assert "PIL" in msg or "av" in msg or "ImportError" in msg or "ModuleNotFound" in msg


def test_sample_frames_real_decode_import_guarded(spark):
    """fake=False now seeks/decodes for real (container.seek per
    frame_idx * every_ms); with PyAV genuinely absent the guarded import
    must raise ImportError — NOT NotImplementedError (the round-3 stub is
    gone) — and a cluster with PyAV takes the real path unchanged."""
    media = multimodal.synth_media(spark, n=6)
    with pytest.raises(Exception) as ei:
        multimodal.sample_frames(media, every_ms=1000, fake=False).collect()
    msg = str(ei.value)
    assert "NotImplementedError" not in msg
    assert "av" in msg or "ImportError" in msg or "ModuleNotFound" in msg
