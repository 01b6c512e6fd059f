"""Semantic dedup (SemDeDup): the learned-cell blocker must recover
the exact all-pairs near-dup set on a clustered corpus (recall vs a
NumPy oracle, precision exactly 1), Lloyd sweeps must not increase
inertia, and the centroid_far keep rule must pick the planted
far-from-centroid member of a duplicate component.

The sandbox embeddings table is near-orthogonal noise (max pairwise
cosine 0.48 at sf0.001), i.e. it has no semantic-dup structure at
all — so the pair/keep tests run on planted CLUSTERED corpora, the
geometry semantic dedup exists for, while the fit-mechanics tests
(inertia descent, shuffle-free assignment) run on the real table."""

import numpy as np
import pytest

from miaplpy_spark.functions import semdedup as sd

SF_DIR = "/root/testdata/sf0.001"
THRESH = 0.95
DIM = 64


def _clustered_corpus():
    """3 directional clusters x 40 members (noise 0.08 -> same-cluster
    cosine ~0.72, cross-cluster ~0, max non-dup pair 0.86), plus 5
    planted duplicates of members 9/10/11/12/12 (cosine >= 0.9998;
    the doubled 12 yields a transitive 3-node component). Cluster ids
    are interleaved so first-K seeding lands one seed per cluster."""
    rng = np.random.default_rng(7)
    dirs = rng.standard_normal((3, DIM))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    rows = []
    for _ in range(40):
        for k in range(3):
            d = dirs[k] + 0.08 * rng.standard_normal(DIM)
            d /= np.linalg.norm(d)
            rows.append(d * rng.uniform(8, 12))
    X = np.array(rows)
    extra = [X[i] + 0.02 * rng.standard_normal(DIM)
             for i in (9, 10, 11, 12, 12)]
    return np.vstack([X, np.array(extra)])


def _exact_pairs(X, threshold=THRESH):
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    C = np.round(Xn @ Xn.T, 4)
    n = len(X)
    return {(i, j): C[i, j]
            for i in range(n) for j in range(i + 1, n)
            if C[i, j] >= threshold}


@pytest.fixture(scope="module")
def clustered_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("semdedup_clustered")
    X = _clustered_corpus()
    rows = [(i, [float(np.float32(v)) for v in X[i]], int(i % 3))
            for i in range(len(X))]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    df.write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    return str(d)


def test_semantic_pairs_match_exact_oracle(spark, clustered_dir):
    """Every emitted pair is a TRUE near-dup with the oracle's rounded
    cosine (precision 1.0), and the learned cells recover the FULL
    exact all-pairs set — dup-grade pairs co-locate because both
    endpoints sit essentially on the same point of the space."""
    X = np.asarray(
        [r.embedding for r in
         spark.read.parquet(f"{clustered_dir}/embeddings.parquet")
         .orderBy("vec_id").collect()], dtype=np.float64)
    truth = _exact_pairs(X)
    assert len(truth) == 6, "fixture must plant exactly 6 dup pairs"
    got = {(r.id1, r.id2): r.sim
           for r in sd.semantic_dup_pairs(spark, clustered_dir,
                                          threshold=THRESH,
                                          n_cells=3).collect()}
    for k, sim in got.items():
        assert k in truth, f"false positive pair {k}"
        assert abs(sim - truth[k]) < 2e-3, (k, sim, truth[k])
    assert set(got) == set(truth), \
        f"missed pairs: {set(truth) - set(got)}"


def test_lloyd_sweeps_do_not_increase_inertia(spark):
    """Distributed Lloyd refinement on the REAL (unclustered) table:
    total within-cluster squared distance after 2 full-corpus sweeps
    is <= the seed codebook's, evaluated by the same NumPy oracle."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    vid = t.column("vec_id").to_numpy(zero_copy_only=False)
    X = np.asarray(t.column("embedding").combine_chunks().flatten()
                   .to_numpy(zero_copy_only=False),
                   dtype=np.float64).reshape(len(vid), DIM)

    def inertia(cents):
        C = np.asarray(cents)
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return float(d2.min(axis=1).sum())

    seeds = sd.fit_ivf_codebook(SF_DIR, n_cells=10, dim=DIM, n_iters=0)
    fitted = sd.kmeans_fit(spark, SF_DIR, n_cells=10, n_iters=2)
    assert len(fitted) == 10 and all(len(c) == DIM for c in fitted)
    assert inertia(fitted) <= inertia(seeds) * (1 + 1e-9)


def test_kmeans_assign_is_shuffle_free(spark):
    """Cell assignment is a narrow projection against literal
    centroids — zero exchanges in the plan (the property that makes
    the fit's per-sweep corpus pass and the pair join's blocker key
    free at 10^12 vectors)."""
    from miaplpy_spark.plans.explain import count_exchanges

    cents = sd.fit_ivf_codebook(SF_DIR, n_cells=4, dim=DIM, n_iters=0)
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    assert count_exchanges(sd.kmeans_assign(e, cents)) == 0


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    """Two orthogonal clusters (directions e1 / e2, scaled to radius
    10) with a planted duplicate component in cluster A: vec_ids
    {0, 2, 3} share direction e1 exactly (cosine 1.0) but sit at radii
    10 / 20 / 10.1 — vec 2 is the far-from-centroid member. All other
    members mix in a second axis (cosine ~0.89 to everything, safely
    under the 0.95 gate). vec 0 and vec 1 seed the two cells."""
    d = tmp_path_factory.mktemp("semdedup_planted")

    def v(direction, scale):
        x = np.zeros(DIM)
        for axis, w in direction:
            x[axis] = w
        x = x / np.linalg.norm(x) * scale
        return [float(np.float32(y)) for y in x]

    rows = [
        (0, v([(0, 1.0)], 10.0), 0),          # dup group, near centroid
        (1, v([(1, 1.0)], 10.0), 1),          # cluster-B seed
        (2, v([(0, 1.0)], 20.0), 0),          # dup group, FAR member
        (3, v([(0, 1.0)], 10.1), 0),          # dup group
        (4, v([(0, 1.0), (10, 0.5)], 10.0), 0),
        (5, v([(0, 1.0), (11, 0.5)], 10.0), 0),
        (6, v([(1, 1.0), (20, 0.5)], 10.0), 1),
        (7, v([(1, 1.0), (21, 0.5)], 10.0), 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    df.write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    return str(d)


def test_centroid_far_keeps_planted_far_member(spark, planted_dir):
    out = sd.semantic_dedup_keep_list(
        spark, planted_dir, threshold=THRESH, n_cells=2, n_iters=2,
        policy="centroid_far").collect()
    assert len(out) == 8                              # total labeling
    by_id = {r.doc_id: r for r in out}
    comp = {by_id[i].comp for i in (0, 2, 3)}
    assert len(comp) == 1, "planted dups must share one component"
    kept = [i for i in (0, 2, 3) if by_id[i].keep]
    assert kept == [2], \
        f"centroid_far must keep the radius-20 member, got {kept}"
    for i in (1, 4, 5, 6, 7):
        assert by_id[i].keep, f"singleton {i} must be kept"


def test_min_id_policy_keeps_lowest(spark, planted_dir):
    out = sd.semantic_dedup_keep_list(
        spark, planted_dir, threshold=THRESH, n_cells=2, n_iters=2,
        policy="min_id").collect()
    by_id = {r.doc_id: r for r in out}
    assert [i for i in (0, 2, 3) if by_id[i].keep] == [0]
    assert sum(1 for r in out if r.keep) == 6         # 5 singletons + 1


def test_unknown_policy_raises(spark, planted_dir):
    with pytest.raises(ValueError, match="keep policy"):
        sd.semantic_dedup_keep_list(spark, planted_dir, policy="nope")
