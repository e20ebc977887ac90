"""ML analyses: KMeans clustering and Isolation-Forest outlier scoring.

Reference semantics (SURVEY.md §2.11):
  * ``KMeans(n_clusters=4, random_state=RANDOM_SEED)`` on
    ``log1p(distance, duration, total_amount)`` with per-cluster
    ``describe()`` profiles
    (``notebooks/comprehensive_trip_analysis_part2.ipynb:1008-1030
    (cell 25)``).
  * ``IsolationForest(n_estimators=100, contamination=0.02,
    random_state=...)`` fit per cab type on sampled trips
    (``notebooks/comprehensive_trip_analysis_part2.ipynb:926-960
    (cell 23)``).

Spark-first mapping:
  * KMeans → ``pyspark.ml.clustering.KMeans`` (distributed Lloyd's, no
    driver-side data). Features built with Catalyst ``log1p`` (P14) and
    ``VectorAssembler``; profiles are a plain ``groupBy("cluster")``
    aggregate (A17).
  * Isolation Forest has no MLlib implementation → grouped-map pandas
    UDF (``applyInPandas``): each group (cab type in the reference)
    fits its own forest on an Arrow batch, exactly like the notebook
    fits per cab type. The forest itself is a pure-numpy
    implementation (this container has no scikit-learn) following the
    original iForest construction (Liu, Ting, Zhou, ICDM 2008):
    random-split trees on a subsample, anomaly score
    ``2^(-E[h(x)]/c(n))``.

Scale posture: grouped maps materialize one GROUP per Arrow batch, so
the group must be bounded BEFORE ``applyInPandas`` runs —
``presample_per_group`` applies a deterministic Catalyst-side hash
gate capping every group at ~``max_rows_per_group`` rows (the same
contract as the reference's per-cab 5 000-row sampled fit), keeping
executor memory bounded no matter the table size.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

__all__ = [
    "kmeans_assign",
    "kmeans_cluster_profile",
    "isolation_forest_by_group",
    "presample_per_group",
]


# ---------------------------------------------------------------------------
# KMeans (MLlib — distributed, seed-deterministic)
# ---------------------------------------------------------------------------


def kmeans_assign(
    df: DataFrame,
    feature_cols: list[str],
    k: int = 4,
    seed: int = 42,
    log_features: bool = True,
) -> DataFrame:
    """Assign a ``cluster`` column via MLlib KMeans.

    ``log_features`` mirrors the reference's ``np.log1p`` transform
    (P14) — applied as a Catalyst expression so the feature build stays
    JVM-side; only the assembled vectors reach the ML stage.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import VectorAssembler

    feats = []
    work = df
    for c in feature_cols:
        fc = f"__f_{c}"
        expr = F.log1p(F.coalesce(F.col(c).cast("double"), F.lit(0.0))) if log_features else F.coalesce(
            F.col(c).cast("double"), F.lit(0.0)
        )
        work = work.withColumn(fc, expr)
        feats.append(fc)

    assembler = VectorAssembler(inputCols=feats, outputCol="__features")
    vecs = assembler.transform(work)
    if vecs.isEmpty():
        # SURVEY §7.3: empty input yields a typed empty frame, never a
        # fit() failure (MLlib KMeans cannot train on zero rows)
        return (
            df.withColumn("cluster", F.lit(0).cast("int")).limit(0)
        )
    model = KMeans(k=k, seed=seed, featuresCol="__features", predictionCol="cluster").fit(vecs)
    return model.transform(vecs).drop("__features", *feats)


def kmeans_cluster_profile(
    df: DataFrame, feature_cols: list[str], k: int = 4, seed: int = 42
) -> DataFrame:
    """Per-cluster describe() (A17): count / mean / stddev / min / max
    of the first feature column, one row per cluster."""
    c = feature_cols[0]
    assigned = kmeans_assign(df, feature_cols, k=k, seed=seed)
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(c), 4).alias("mean"),
            F.round(F.stddev_samp(c), 4).alias("stddev"),
            F.round(F.min(c), 4).alias("min"),
            F.round(F.max(c), 4).alias("max"),
        )
        .orderBy("cluster")
    )


# ---------------------------------------------------------------------------
# Isolation Forest (pure numpy, per-group via applyInPandas)
# ---------------------------------------------------------------------------


def _c_factor(n: int) -> float:
    """Average unsuccessful-search path length in a BST of n nodes —
    the normalizer c(n) from the iForest paper."""
    if n <= 1:
        return 0.0
    h = math.log(n - 1) + 0.5772156649015329
    return 2.0 * h - 2.0 * (n - 1) / n


def _fit_trees(
    X: np.ndarray, rng: np.random.Generator, n_trees: int, sample_size: int
):
    """Build iTrees as flat arrays. Each tree is a dict of numpy arrays
    (feature, threshold, left, right, size); leaves carry subset size."""
    n = X.shape[0]
    sample_size = min(sample_size, n)
    max_depth = max(1, int(math.ceil(math.log2(max(sample_size, 2)))))
    trees = []
    for _ in range(n_trees):
        idx = rng.choice(n, size=sample_size, replace=False)
        nodes = {"feature": [], "threshold": [], "left": [], "right": [], "size": []}

        def build(rows: np.ndarray, depth: int) -> int:
            node_id = len(nodes["feature"])
            for key in nodes:
                nodes[key].append(-1)
            if depth >= max_depth or rows.size <= 1:
                nodes["size"][node_id] = rows.size
                return node_id
            # pick a feature with spread; give up → leaf
            feats = rng.permutation(X.shape[1])
            for f in feats:
                lo = X[rows, f].min()
                hi = X[rows, f].max()
                if hi > lo:
                    thr = rng.uniform(lo, hi)
                    mask = X[rows, f] < thr
                    nodes["feature"][node_id] = int(f)
                    nodes["threshold"][node_id] = float(thr)
                    nodes["left"][node_id] = build(rows[mask], depth + 1)
                    nodes["right"][node_id] = build(rows[~mask], depth + 1)
                    return node_id
            nodes["size"][node_id] = rows.size
            return node_id

        build(idx, 0)
        trees.append(
            {
                "feature": np.asarray(nodes["feature"], dtype=np.int64),
                "threshold": np.asarray(nodes["threshold"], dtype=np.float64),
                "left": np.asarray(nodes["left"], dtype=np.int64),
                "right": np.asarray(nodes["right"], dtype=np.int64),
                "size": np.asarray(nodes["size"], dtype=np.int64),
            }
        )
    return trees, sample_size


def _path_lengths(X: np.ndarray, tree) -> np.ndarray:
    """Vectorized path-length evaluation: advance all rows one level per
    iteration (levels are O(log n), so this is ~15 passes, not per-row
    recursion)."""
    n = X.shape[0]
    node = np.zeros(n, dtype=np.int64)
    depth = np.zeros(n, dtype=np.float64)
    out = np.full(n, -1.0)
    active = np.arange(n)
    while active.size:
        cur = node[active]
        is_leaf = tree["feature"][cur] < 0
        if is_leaf.any():
            rows = active[is_leaf]
            leaf_sz = tree["size"][node[rows]]
            out[rows] = depth[rows] + np.array([_c_factor(int(s)) for s in leaf_sz])
            active = active[~is_leaf]
            if active.size == 0:
                break
            cur = node[active]
        f = tree["feature"][cur]
        thr = tree["threshold"][cur]
        go_left = X[active, f] < thr
        node[active] = np.where(go_left, tree["left"][cur], tree["right"][cur])
        depth[active] += 1.0
    return out


def isolation_forest_scores(
    pdf: pd.DataFrame,
    feature_cols: list[str],
    n_trees: int = 100,
    sample_size: int = 256,
    seed: int = 42,
) -> np.ndarray:
    """Anomaly scores in [0,1] for one in-memory group (higher = more
    anomalous): ``2^(-E[h(x)] / c(sample_size))``."""
    X = pdf[feature_cols].to_numpy(dtype=np.float64)
    X = np.nan_to_num(X, nan=0.0, posinf=0.0, neginf=0.0)
    rng = np.random.default_rng(seed)
    trees, eff_sample = _fit_trees(X, rng, n_trees, sample_size)
    depths = np.zeros(X.shape[0], dtype=np.float64)
    for tree in trees:
        depths += _path_lengths(X, tree)
    avg_depth = depths / len(trees)
    c = _c_factor(eff_sample) or 1.0
    return np.power(2.0, -avg_depth / c)


#: ppm granularity for the deterministic per-group pre-sample filter.
_PPM = 1_000_000
#: binomial-fluctuation slack on the ppm threshold: the Catalyst-side
#: filter keeps ~1.25 × cap rows; the in-UDF hash-ordered cut finalizes
#: at exactly ≤ cap.
_PRESAMPLE_SLACK = 1.25


def presample_per_group(
    df: DataFrame,
    group_col: str,
    cap: int,
    seed: int = 42,
    sample_col: str = "_sample_ppm",
    max_groups: int = 100_000,
) -> DataFrame:
    """Deterministic per-group row-count cap that runs BEFORE any
    grouped-map materialization — a Catalyst filter, not a pandas one.

    ``applyInPandas`` loads the ENTIRE group into a single Arrow batch
    before user code runs, so an in-UDF ``iloc[:cap]`` bounds nothing:
    a terabyte group still materializes on one executor first. This
    helper bounds the group *upstream*: a per-group count (one hash
    agg over the group domain), joined back, gates each row on
    ``pmod(xxhash64(all cols, seed), 1e6) < ceil(cap/count·1e6·slack)``.
    Groups already within ``cap`` pass through whole. Expected kept
    rows ≈ ``slack × cap``; the caller trims to exactly ``cap`` by
    sorting on the retained ``sample_col``, which carries the FULL
    64-bit xxhash64 value (only the gate uses the mod-1e6 bucket), so
    the trim's sort key is effectively tie-free — deterministic and
    shuffle-order independent regardless of Arrow batch row order.

    Broadcast contract: the counts frame is one row per distinct
    group. The probe collects at most ``max_groups+1`` short rows to
    the driver; when the full domain fits, those collected rows ARE
    the gate (a local frame, force-broadcast — no persist, no cache
    entry left alive across repeated calls). Above the cap the join
    degrades to a plain equi-join on the distributed aggregate and
    lets AQE/sort-merge handle it instead of shipping an unbounded
    broadcast (that path recomputes the one hash agg — the documented
    price of exceeding the contract, mirroring ``max_queries`` in
    ``operators/pq.py``).

    Matches the reference's 5 000-row sampled iForest fit
    (``notebooks/comprehensive_trip_analysis_part2.ipynb:926``), made
    distribution-safe.
    """
    counts = df.groupBy(group_col).agg(F.count("*").alias("_grp_n"))
    thr = (
        F.when(F.col("_grp_n") <= cap, F.lit(_PPM))
        .otherwise(
            F.least(
                F.lit(_PPM).cast("long"),
                F.ceil(
                    F.lit(float(cap) * _PRESAMPLE_SLACK * _PPM)
                    / F.col("_grp_n")
                ),
            )
        )
        .cast("long")
        .alias("_keep_ppm")
    )
    gate = counts.select(group_col, thr)
    # Bounded probe: at most max_groups+1 short (group, ppm) rows ever
    # reach the driver. In-contract domains become a LOCAL frame — the
    # broadcast ships driver-side rows, nothing is persisted, so
    # repeated calls leave no cache-manager entries behind.
    probe = gate.limit(max_groups + 1).collect()
    if len(probe) <= max_groups:
        gate_side = F.broadcast(
            df.sparkSession.createDataFrame(probe, gate.schema)
        )
    else:
        gate_side = gate
    full_hash = F.xxhash64(*[F.col(c) for c in df.columns], F.lit(seed))
    return (
        df.withColumn(sample_col, full_hash)
        .join(gate_side, on=group_col, how="inner")
        .where(
            F.pmod(F.col(sample_col), F.lit(_PPM)).cast("long")
            < F.col("_keep_ppm")
        )
        .drop("_keep_ppm")
    )


def isolation_forest_by_group(
    df: DataFrame,
    group_col: str,
    feature_cols: list[str],
    contamination: float = 0.02,
    n_trees: int = 100,
    seed: int = 42,
    max_rows_per_group: int = 100_000,
) -> DataFrame:
    """Per-group outlier flagging — the reference's per-cab-type
    IsolationForest fit (grouped-map pandas UDF; one Arrow batch per
    group).

    Output: input columns + ``anomaly_score`` (double) + ``is_outlier``
    (1.0 for the top ``contamination`` fraction by score within the
    group, matching sklearn's contamination threshold semantics).

    Scale: groups are bounded BEFORE the grouped map —
    :func:`presample_per_group` filters each group to ~1.25 ×
    ``max_rows_per_group`` rows Catalyst-side (per-group hash gate),
    so the Arrow batch ``applyInPandas`` materializes is capped no
    matter the table size; the in-UDF hash-ordered cut then trims to
    exactly ≤ ``max_rows_per_group``. Mirrors the reference's
    5 000-row sampled fit (``part2:926``). No explicit repartition:
    the grouped map plans its own hash distribution on ``group_col``.
    """
    sample_col = "_sample_ppm"
    sampled = presample_per_group(
        df, group_col, max_rows_per_group, seed=seed, sample_col=sample_col
    )
    out_schema = StructType(
        df.schema.fields
        + [
            StructField("anomaly_score", DoubleType()),
            StructField("is_outlier", DoubleType()),
        ]
    )
    in_cols = [f.name for f in df.schema.fields]

    def fit_score(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > max_rows_per_group:
            pdf = pdf.sort_values(sample_col, kind="mergesort").iloc[
                :max_rows_per_group
            ]
        if len(pdf) < 2:
            pdf = pdf.copy()
            pdf["anomaly_score"] = 0.0
            pdf["is_outlier"] = 0.0
            return pdf[in_cols + ["anomaly_score", "is_outlier"]]
        scores = isolation_forest_scores(
            pdf, feature_cols, n_trees=n_trees, seed=seed
        )
        thr = np.quantile(scores, 1.0 - contamination)
        pdf = pdf.copy()
        pdf["anomaly_score"] = scores
        pdf["is_outlier"] = (scores >= thr).astype(np.float64)
        return pdf[in_cols + ["anomaly_score", "is_outlier"]]

    return sampled.groupBy(group_col).applyInPandas(fit_score, out_schema)


def lda_topics(
    df: DataFrame,
    text_col: str = "text",
    k: int = 5,
    seed: int = 42,
    vocab_size: int = 200,
    max_iter: int = 20,
    top_n: int = 8,
) -> DataFrame:
    """Latent Dirichlet Allocation topic model over a text column —
    the unsupervised TOPIC companion to KMeans' numeric clusters
    (SURVEY §2.11 extension; the reference has no text-ML surface).

    Tokenization happens Catalyst-side (operators/text.py tokens —
    same rule every text entry uses); CountVectorizer builds the
    bounded document-term matrix; LDA trains with the EM optimizer
    (deterministic under a fixed seed, unlike online variational
    minibatching). Output: ``(topic, term_rank, term, weight)`` —
    k × top_n rows describing each topic by its heaviest terms.

    Scale: EM-LDA iterates Spark jobs whose shuffle size is
    O(docs × k) topic-count vectors, never a driver-side matrix;
    ``vocab_size`` bounds the term dimension (the topic-term matrix
    lives on the driver at k × vocab — metadata scale). For web-scale
    corpora raise ``vocab_size`` and switch to the online optimizer,
    trading determinism for per-minibatch memory.
    """
    from pyspark.ml.clustering import LDA
    from pyspark.ml.feature import CountVectorizer

    from .operators.text import tokens

    toks = df.select(
        tokens(F.lower(F.col(text_col))).alias("__tokens")
    ).filter(F.size("__tokens") > 0)
    if toks.isEmpty():
        return df.sparkSession.createDataFrame(
            [], "topic long, term_rank long, term string, weight double"
        )
    cv = CountVectorizer(
        inputCol="__tokens", outputCol="__features", vocabSize=vocab_size
    ).fit(toks)
    feats = cv.transform(toks)
    model = LDA(
        k=k,
        seed=seed,
        maxIter=max_iter,
        optimizer="em",
        featuresCol="__features",
    ).fit(feats)
    vocab = F.lit(list(cv.vocabulary))
    desc = model.describeTopics(top_n)
    return desc.select(
        F.col("topic").cast("long"),
        F.posexplode(
            F.arrays_zip(
                F.col("termIndices").alias("idx"),
                F.col("termWeights").alias("w"),
            )
        ).alias("pos", "z"),
    ).select(
        "topic",
        (F.col("pos") + 1).cast("long").alias("term_rank"),
        F.element_at(vocab, F.col("z.idx").cast("int") + 1).alias("term"),
        F.round(F.col("z.w"), 6).alias("weight"),
    )
