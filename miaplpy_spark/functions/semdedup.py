"""Semantic deduplication over the embedding column — the SemDeDup
method (Abbas et al. 2023, arXiv:2303.09540, public): k-means the
corpus embeddings, then drop near-duplicates WITHIN each cluster by
pairwise cosine, keeping one canonical member per duplicate group.
Complements the existing embedding-dedup family:

- ``cosine_near_dup_pairs``  — exact, blocked on the GIVEN label
  column (only works when a trusted coarse partitioner ships with the
  data);
- ``lsh_near_dup_pairs``     — random-hyperplane buckets (no training,
  recall bounded by plane count);
- ``semantic_dup_pairs``     — LEARNED Voronoi cells: the blocker
  adapts to the corpus geometry, so semantically-equal documents meet
  even when no label exists and LSH's random planes split them.

Scale shape (the part that must survive 10^12 vectors):

- the k-means FIT is distributed Lloyd: per sweep, assignment is a
  shuffle-free argmin against literal centroids (one narrow map over
  the corpus — the ``_d2_array`` expression IVF already uses), and the
  update is ONE groupBy(cell) carrying dim per-dimension partial sums
  (map-side combine reduces every partition to <= n_cells rows before
  the exchange; the driver only ever sees the n_cells x dim mean
  matrix, never data);
- the pair join is cell-blocked: expected candidate count is
  sum_c |cell_c|^2 / 2, i.e. ~n^2/n_cells for balanced cells —
  n_cells is the knob that keeps the within-cell join tractable (the
  SemDeDup paper runs 50k clusters over LAION); the cell id is the
  single shuffle key, so each cluster's pairs are produced co-located;
- the keep rule is the paper's: within a duplicate component keep the
  member with the LOWEST similarity to its cluster centroid (ties ->
  lowest id), so retained examples sit far from cluster cores where
  information density is higher; ``policy="min_id"`` gives the
  engine-wide deterministic-canonical rule instead.

Determinism: centroids are rounded to 6 dp after every sweep and
embedded as plan literals (same contract as the IVF codebook, so a
DuckDB oracle could evaluate the identical assignment). Partial sums
are floating-point and partition-order dependent in the last ulps;
the 6-dp rounding absorbs that everywhere except exact round-half
boundaries, which the tests' planted margins stay far away from.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .similarity import (_d2_array, _emb, cos_prenormed, fit_ivf_codebook,
                         vnorm, with_cosine)


def kmeans_fit(spark: SparkSession, sf_dir: str, n_cells: int = 10,
               dim: int = 64, n_iters: int = 2, sample: int = 4096,
               seeding: str = "first") -> list[list[float]]:
    """Distributed Lloyd's k-means over the full corpus. Seeds come
    from the driver-side sample model (``fit_ivf_codebook`` with zero
    sweeps — O(sample) I/O); every refinement sweep then runs over ALL
    vectors: shuffle-free literal-centroid argmin assignment, then one
    partial-aggregated groupBy(cell) producing dim sums + a count per
    cell. Empty cells keep their previous centroid. Returns the
    6-dp-rounded centroid list, a plan literal like ``plane_signs``."""
    cents = fit_ivf_codebook(sf_dir, n_cells, dim, n_iters=0,
                             sample=sample, seeding=seeding)
    e = _emb(spark, sf_dir)
    for _ in range(n_iters):
        d2s = _d2_array(F.col("embedding"), cents)
        assigned = e.select(
            (F.array_position(d2s, F.array_min(d2s)) - 1)
            .cast("int").alias("cell"),
            "embedding")
        agg = (assigned.groupBy("cell")
               .agg(F.count("*").alias("n"),
                    *[F.sum(F.element_at("embedding", i + 1).cast("double"))
                      .alias(f"s{i}") for i in range(dim)])
               .collect())                     # n_cells rows — the model
        by_cell = {int(r["cell"]): r for r in agg}
        cents = [
            [round(by_cell[j][f"s{i}"] / by_cell[j]["n"], 6)
             for i in range(dim)] if j in by_cell else cents[j]
            for j in range(n_cells)
        ]
    return cents


def kmeans_assign(df: DataFrame, cents: list[list[float]],
                  out: str = "cell") -> DataFrame:
    """Append the nearest-centroid cell id (lowest-cell tiebreak) as a
    shuffle-free projection; also exposes ``d2_own`` — the rounded
    squared distance to the assigned centroid — which the
    ``centroid_far`` keep rule consumes."""
    d2s = _d2_array(F.col("embedding"), cents)
    return (df.withColumn("_d2s", d2s)
            .withColumn(out, (F.array_position(F.col("_d2s"),
                                               F.array_min("_d2s")) - 1)
                        .cast("long"))
            .withColumn("d2_own", F.element_at("_d2s",
                                               (F.col(out) + 1).cast("int")))
            .drop("_d2s"))


def semantic_dup_pairs(spark: SparkSession, sf_dir: str,
                       threshold: float = 0.95, n_cells: int = 10,
                       n_iters: int = 2,
                       cents: list[list[float]] | None = None) -> DataFrame:
    """Within-cluster cosine near-dup pairs: assign every vector to its
    learned cell, self-join ON the cell id only, keep pairs with
    rounded cosine >= threshold. Returns (id1, id2, sim, cell). A dup
    pair is missed only when its two members land in different Voronoi
    cells — at dup-grade similarity (>= 0.9) both endpoints sit nearly
    on top of each other, so cell-straddling is confined to pairs on a
    cell boundary; the tests measure recall against the exact all-pairs
    oracle."""
    cents = cents or kmeans_fit(spark, sf_dir, n_cells=n_cells,
                                n_iters=n_iters)
    e = kmeans_assign(_emb(spark, sf_dir), cents)
    # norms hoisted per vector (similarity.vnorm): the within-cell
    # self-join pays only the dot fold per pair, bit-identically
    a = e.select(F.col("vec_id").alias("id1"),
                 F.col("embedding").alias("v1"),
                 vnorm("embedding").alias("n1"), "cell")
    b = e.select(F.col("vec_id").alias("id2"),
                 F.col("embedding").alias("v2"),
                 vnorm("embedding").alias("n2"), "cell")
    pairs = a.join(b, "cell").where(F.col("id1") < F.col("id2"))
    return (pairs.select(
                "id1", "id2",
                F.round(cos_prenormed("v1", "v2", "n1", "n2"), 4)
                 .alias("sim"), "cell")
            .where(F.col("sim") >= threshold))


def semantic_dedup_keep_list(spark: SparkSession, sf_dir: str,
                             threshold: float = 0.95, n_cells: int = 10,
                             n_iters: int = 2,
                             policy: str = "centroid_far") -> DataFrame:
    """TOTAL semantic-dedup decision over the vector spine:
    pairs -> connected components -> one kept member per component,
    singletons kept by construction. Returns (doc_id, comp, keep).

    ``policy="centroid_far"`` keeps the component member with the
    largest distance to its own cluster centroid (the SemDeDup paper's
    low-centroid-similarity rule; ties -> lowest id). ``"min_id"``
    keeps the smallest id — the same canonical rule every other dedup
    family in this engine uses (``dedup_keep_list``)."""
    from .dedup import connected_components, dedup_keep_list

    if policy not in ("centroid_far", "min_id"):
        raise ValueError(f"unknown keep policy: {policy!r}")
    cents = kmeans_fit(spark, sf_dir, n_cells=n_cells, n_iters=n_iters)
    pairs = semantic_dup_pairs(spark, sf_dir, threshold=threshold,
                               cents=cents)
    spine = _emb(spark, sf_dir).select("vec_id")
    if policy == "min_id":
        return dedup_keep_list(pairs, id1="id1", id2="id2",
                               doc_spine=spine, spine_col="vec_id",
                               algorithm="auto")
    comps = connected_components(pairs, "id1", "id2", algorithm="auto")
    d2 = (kmeans_assign(_emb(spark, sf_dir), cents)
          .select(F.col("vec_id").alias("node"), "d2_own"))
    # component membership is tiny relative to the corpus (only paired
    # nodes appear); the per-node centroid distance joins on, then one
    # window picks the farthest member per component
    w = Window.partitionBy("comp").orderBy(F.desc("d2_own"), F.asc("node"))
    labeled = (comps.join(d2, "node")
               .withColumn("rk", F.row_number().over(w))
               .select(F.col("node").alias("doc_id"), "comp",
                       (F.col("rk") == 1).alias("keep")))
    singles = (spine.select(F.col("vec_id").alias("doc_id"))
               .join(F.broadcast(labeled.select("doc_id")),
                     "doc_id", "left_anti")
               .select("doc_id", F.col("doc_id").alias("comp"),
                       F.lit(True).alias("keep")))
    return labeled.unionByName(singles)
