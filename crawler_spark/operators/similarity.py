"""Similarity search over embedding columns (array<float>).

* **Brute-force cosine top-k** — the correctness baseline: dot product
  via ``F.zip_with`` + ``F.aggregate`` (pure JVM, no Python), norm
  precomputed per row, global top-k via orderBy+limit. At scale Spark
  turns the limit into a TakeOrdered (per-partition top-k then merge),
  so no full sort materializes.
* **LSH-bucketed ANN (random hyperplanes)** — the scale path: s signed
  projections onto fixed seeded hyperplanes pack into an s-bit signature
  (numpy matmul in a pandas UDF); queries probe only their own bucket
  (optionally multi-probe neighbors at Hamming distance 1).
* **IVF ANN (inverted-file / coarse quantizer)** — the other standard
  scale path: rows are assigned to the nearest of ``n_cells`` centroid
  cells once (an indexing pass; persist the assigned frame partitioned
  by cell), queries probe the ``n_probe`` most query-similar cells with
  exact cosine inside. Centroids are hash-selected corpus rows rather
  than k-means output so the whole spec is deterministic and exactly
  oracle-checkable; n_probe = n_cells degenerates to brute force.
* **embedding near-dup pairs** — cosine ≥ threshold self-join within LSH
  buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType


def _cos_cols(vec_col, query):
    """Column expressions for dot(vec, query) and |vec| (JVM-side)."""
    q = F.array(*[F.lit(float(x)) for x in query])
    dot = F.aggregate(
        F.zip_with(vec_col, q, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform(vec_col, lambda a: a * a), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    return dot, norm


def cosine_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine similarity to ``query`` (brute force)."""
    qn = float(np.linalg.norm(query))
    dot, norm = _cos_cols(F.col(vec_col), query)
    return (
        df.select(
            F.col(id_col),
            F.round(dot / (norm * F.lit(qn)), 4).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def hyperplane_signature_udf(dim: int, n_bits: int = 16, seed: int = 42):
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_bits)).astype(np.float32)

    @F.pandas_udf(IntegerType())
    def fn(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        m = np.stack(vecs.to_numpy())  # (batch, dim)
        bits = (m @ planes) > 0  # (batch, n_bits)
        sig = np.zeros(len(vecs), dtype=np.int64)
        for b in range(n_bits):
            sig |= bits[:, b].astype(np.int64) << b
        return pd.Series(sig.astype(np.int32))

    return fn


def ann_topk_lsh(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    n_bits: int = 12,
    multiprobe: bool = True,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: probe the query's hyperplane bucket (and its
    Hamming-1 neighbors with ``multiprobe``), exact cosine inside."""
    dim = len(query)
    sig_udf = hyperplane_signature_udf(dim, n_bits, seed)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_bits)).astype(np.float32)
    qbits = (np.asarray(query, dtype=np.float32) @ planes) > 0
    qsig = 0
    for b in range(n_bits):
        qsig |= int(qbits[b]) << b
    probes = [qsig]
    if multiprobe:
        probes += [qsig ^ (1 << b) for b in range(n_bits)]

    bucketed = df.withColumn("_sig", sig_udf(F.col(vec_col)))
    cand = bucketed.filter(F.col("_sig").isin(probes))
    return cosine_topk(cand, query, k, vec_col, id_col)


_IVF_MULT = 1103515245  # LCG multiplier (< 2^31: the product of a
_IVF_INC = 12345        # 2^32-reduced id with it stays inside int64,
#                         so the key never overflows under ANSI SQL
#                         even for 10^10-scale ids


def _ivf_select_key():
    """Deterministic centroid-selection key:
    ``((vec_id mod 2^32) * 1103515245 + 12345) mod 2^31``.

    Content-independent and trivially reproducible anywhere (the
    independent oracle recomputes it in two lines of int64 numpy),
    uniform over ids, stable under partitioning/cluster size — the same
    reproducibility argument as curation.deterministic_sample. A
    k-means(||) refinement would cluster better but its float reduction
    order varies with partitioning, which would make cell contents —
    and therefore any fixed-probe result — unreproducible across runs."""
    return F.pmod(
        F.pmod(F.col("vec_id"), F.lit(2**32)) * F.lit(_IVF_MULT)
        + F.lit(_IVF_INC),
        F.lit(2**31),
    )


def ivf_centroids(
    df: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """The IVF coarse quantizer: ``n_cells`` unit-normalized centroid
    vectors, rows with the smallest selection key (ties by id).

    Driver-side result is (n_cells, dim) float64 — tiny; the selection
    itself is a distributed TakeOrdered (orderBy+limit never sorts the
    full corpus)."""
    rows = (
        df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
        .withColumn("_k", _ivf_select_key())
        .orderBy("_k", "vec_id")
        .limit(n_cells)
        .collect()
    )
    if not rows:
        raise ValueError(
            "ivf_centroids: input DataFrame is empty — cannot select centroids"
        )
    cents = np.stack(
        [np.asarray(r["v"], dtype=np.float64) for r in rows]
    )
    norms = np.linalg.norm(cents, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return cents / norms


def ivf_centroids_kmeans(
    df: DataFrame,
    n_cells: int = 16,
    iters: int = 10,
    sample_size: int = 65536,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Spherical-k-means-refined IVF centroids — deterministic Lloyd.

    Hash-selected centroids (:func:`ivf_centroids`) are reproducible but
    unclustered: on skewed/clustered embedding distributions most rows
    land in a few cells and probe pruning collapses. This refinement
    runs fixed-iteration spherical k-means (Lloyd) ON THE DRIVER over a
    deterministic corpus sample, keeping the whole spec exactly
    checkable:

    * the sample is the ``sample_size`` rows with the smallest
      ``_ivf_select_key()`` (ties by id) — a distributed TakeOrdered,
      same uniform content-independent key as centroid selection, so
      the sample is identical under any partitioning / cluster size;
    * init = the first ``n_cells`` sample rows (exactly the hash-
      selected centroids), unit-normalized;
    * each Lloyd step assigns sample rows by float64 argmax dot (ties →
      lowest cell) and recomputes cell means with numpy's fixed
      row-order reduction — driver-side, so no distributed float
      reduction-order nondeterminism; empty cells keep their previous
      centroid; means are re-unit-normalized (spherical k-means, the
      right objective for cosine IVF).

    Driver cost is O(sample_size × dim × n_cells × iters) — at the
    FAISS-style defaults (64k sample) this is a few seconds regardless
    of corpus size, the standard quantizer-training-on-a-sample trade.
    Returns (n_cells, dim) float64 unit rows for :func:`ivf_index`'s
    ``centroids`` param."""
    rows = (
        df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
        .withColumn("_k", _ivf_select_key())
        .orderBy("_k", "vec_id")
        .limit(max(sample_size, n_cells))
        .collect()
    )
    if not rows:
        raise ValueError(
            "ivf_centroids_kmeans: input DataFrame is empty — cannot train"
        )
    if len(rows) < n_cells:
        raise ValueError(
            f"ivf_centroids_kmeans: {len(rows)} rows < n_cells={n_cells}"
        )
    x = np.stack([np.asarray(r["v"], dtype=np.float64) for r in rows])
    xn = np.linalg.norm(x, axis=1, keepdims=True)
    xn[xn == 0] = 1.0
    x = x / xn
    cents = x[:n_cells].copy()
    for _ in range(max(0, iters)):
        sims = x @ cents.T  # (sample, n_cells)
        assign = np.argmax(sims, axis=1)  # first-max tie rule
        for c in range(n_cells):
            members = x[assign == c]
            if len(members) == 0:
                continue  # empty cell keeps its previous centroid
            m = members.mean(axis=0)
            n = np.linalg.norm(m)
            if n > 0:
                cents[c] = m / n
    return cents


def ivf_assign_udf(centroids: np.ndarray):
    """pandas UDF: nearest-centroid cell id per row (max dot product
    with the unit centroids == max cosine; ties → lowest cell id, the
    argmax first-max rule).

    Arithmetic spec (shared with the independent oracle): the row is
    promoted to float64 and each cell's similarity is one float64 gemv
    ``m @ centroid`` — per-row dot products are independent of batch
    size, so engine Arrow batches and the oracle's whole-matrix pass
    agree bit-for-bit."""
    cents = [np.ascontiguousarray(c, dtype=np.float64) for c in centroids]

    @F.pandas_udf(IntegerType())
    def fn(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        sims = np.column_stack([m @ c for c in cents])
        return pd.Series(np.argmax(sims, axis=1).astype(np.int32))

    return fn


def ivf_index(
    df: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: np.ndarray | None = None,
) -> tuple[DataFrame, np.ndarray]:
    """Build the IVF index: ``(df + _cell column, centroids)``.

    At scale the assigned frame is WRITTEN partitioned by ``_cell``
    (or with a ``bucket(_cell)`` Iceberg transform): a query probing
    ``n_probe`` of ``n_cells`` cells then prunes the scan to
    ``n_probe/n_cells`` of the corpus at the file level — the IVF
    trade (one indexing pass, sub-linear probes) the task brief names
    alongside the hyperplane-LSH variant above. Assignment is one
    map-side pandas UDF pass, no shuffle.

    ``centroids``: pass a precomputed (n_cells, dim) unit-row array
    (from :func:`ivf_centroids` or :func:`ivf_centroids_kmeans`) to
    skip the selection pass — the repeated-query path."""
    if "_cell" in df.columns:
        raise ValueError(
            "ivf_index: input already carries a '_cell' column (internal "
            "name) — rename it before indexing"
        )
    if centroids is None:
        cents = ivf_centroids(df, n_cells, vec_col, id_col)
    else:
        cents = np.ascontiguousarray(centroids, dtype=np.float64)
    return df.withColumn("_cell", ivf_assign_udf(cents)(F.col(vec_col))), cents


def ivf_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    index: tuple[DataFrame, np.ndarray] | None = None,
) -> DataFrame:
    """IVF ANN top-k: probe the ``n_probe`` cells whose centroids are
    most query-similar, exact JVM cosine inside (precision 1 on the
    probed set; recall grows with n_probe and is 1 at
    ``n_probe = n_cells`` where this EQUALS brute-force
    :func:`cosine_topk` by construction).

    Probe choice is driver-side over n_cells similarities (tiny);
    candidates are a ``_cell IN probes`` filter — on a cell-partitioned
    index layout that is partition pruning, not a scan.

    ``index``: pass the ``(assigned_df, centroids)`` pair from
    :func:`ivf_index` (ideally with the assigned frame persisted /
    written partitioned by ``_cell``) so repeated queries reuse one
    indexing pass instead of rebuilding it per call; the inline
    one-shot path below is the oracle-checkable single-query form."""
    if index is not None:
        assigned, cents = index
    else:
        assigned, cents = ivf_index(df, n_cells, vec_col, id_col)
    qsims = cents @ np.asarray(query, dtype=np.float64)
    order = sorted(range(len(qsims)), key=lambda c: (-qsims[c], c))
    probes = order[: max(1, n_probe)]
    cand = assigned.filter(F.col("_cell").isin(probes)).drop("_cell")
    return cosine_topk(cand, query, k, vec_col, id_col)


def embedding_neardup_exact(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """EXACT near-dup pairs (cosine ≥ threshold, id_a < id_b) — the
    brute-force all-pairs self-join, pure JVM cosine. This is the
    correctness CONTRACT for the approximate scale path
    (:func:`embedding_neardup_pairs`): LSH recall is < 1 in general, so
    the exact operator is what the DuckDB oracle checks, and the LSH
    variant is validated separately by recall tests + throughput bench.
    O(n²) — do not run on a full 100 TB corpus; at scale it serves as
    the verification stage on LSH candidates or on sampled partitions."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate(F.transform("va", lambda x: x * x), F.lit(0.0), lambda a_, x: a_ + x))
    nb = F.sqrt(F.aggregate(F.transform("vb", lambda x: x * x), F.lit(0.0), lambda a_, x: a_ + x))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(dot / (na * nb), 4))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def band_signatures_udf(dim: int, n_bands: int, bits_per_band: int, seed: int = 42):
    """Per-row array of ``n_bands`` hyperplane signatures (one LSH hash
    table per band — the multi-table construction that trades index size
    for recall, same shape as MinHash banding)."""
    from pyspark.sql.types import ArrayType

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_bands * bits_per_band)).astype(np.float32)

    @F.pandas_udf(ArrayType(IntegerType()))
    def fn(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="object")
        m = np.stack(vecs.to_numpy())
        bits = (m @ planes) > 0  # (batch, n_bands*bits_per_band)
        out = np.zeros((len(vecs), n_bands), dtype=np.int32)
        for band in range(n_bands):
            for b in range(bits_per_band):
                out[:, band] |= bits[:, band * bits_per_band + b].astype(
                    np.int32
                ) << b
        return pd.Series(list(out))

    return fn


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    n_bands: int = 8,
    bits_per_band: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Pairs with cosine ≥ threshold, candidate-limited to pairs sharing
    at least one LSH band (banded random-hyperplane signatures — the
    multi-hash-table construction, so the self-join is an equi-join on
    (band, signature) instead of an all-pairs cross).

    Tuning: a pair at angle θ shares one b-bit band with probability
    (1−θ/π)^b, and survives n bands with 1−(1−(1−θ/π)^b)^n. Production
    near-dup thresholds (≥0.9 cosine) prune hard with few wide bands;
    low-threshold regimes need many narrow bands to keep recall — at
    which point pruning is modest, as it must be: near-orthogonal
    'duplicates' are not LSH-friendly.

    Scale note (measured, BENCH/EMB_SCALE.md): the RANDOM-pair
    collision term n·2^−b × |pairs| is still quadratic in the corpus —
    with 16-bit bands it dominated a 101k-row corpus (1.2M junk
    candidates, 32× time at 10× rows). Size b ≳ log2(n_rows) + margin
    so the quadratic term stays below the linear work (64 bands × 32
    bits held recall 1.0 with ~linear time there); raise n to buy back
    recall. Exact cosine is recomputed on candidates, so precision is
    always 1.
    """
    first = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).first()
    if first is None:
        return df.sparkSession.createDataFrame([], "id_a long, id_b long, cosine double")
    dim = len(first["v"])
    sig_udf = band_signatures_udf(dim, n_bands, bits_per_band, seed)
    # Candidate generation carries IDS ONLY (same shape as the MinHash
    # path): the banded self-join and the pair-dedup shuffle rows of
    # (id, band, sig), never the vectors — with n_bands tables the
    # vector payload would otherwise be shuffled n_bands× through the
    # join and again through dropDuplicates. Vectors are re-joined only
    # for the (much smaller, pruning-regime-bounded) candidate set.
    banded = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(sig_udf(F.col(vec_col))).alias("band", "sig"),
    )
    cands = (
        banded.select(F.col("id").alias("id_a"), "band", "sig")
        .join(banded.select(F.col("id").alias("id_b"), "band", "sig"), ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()  # a pair may share several bands
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate(F.transform("va", lambda x: x * x), F.lit(0.0), lambda a_, x: a_ + x))
    nb = F.sqrt(F.aggregate(F.transform("vb", lambda x: x * x), F.lit(0.0), lambda a_, x: a_ + x))
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", F.round(dot / (na * nb), 4))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
