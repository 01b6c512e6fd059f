"""Synthetic documents-corpus generator (datagen.generate_documents):
determinism, schema parity with the driver testdata, and planted-family
ground truth flowing through the full curation composition — the
corpus that backs the curation scaling bench beyond the fixed 5k-doc
sf corpora."""

import tempfile

import pyspark.sql.functions as F
import pytest

from miaplpy_spark.datagen import generate_documents
from miaplpy_spark.functions.curate import curate_corpus

N = 3000


@pytest.fixture(scope="module")
def corpus(spark):
    """One generated corpus (with ground-truth families) + its
    parquet materialization, shared across the module's tests."""
    fam = generate_documents(spark, N, with_families=True)
    tmp = tempfile.mkdtemp(prefix="gen_docs_")
    fam.drop("kind", "content_seed").write.parquet(
        f"{tmp}/documents.parquet")
    return fam.localCheckpoint(), tmp


def test_schema_matches_testdata(spark, corpus):
    fam, tmp = corpus
    got = spark.read.parquet(f"{tmp}/documents.parquet")
    ref = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert dict(got.dtypes) == dict(ref.dtypes)


def test_deterministic(spark, corpus):
    fam, _ = corpus
    again = generate_documents(spark, N, with_families=True)
    def digest(df):
        return df.agg(F.sum(F.pmod(
            F.xxhash64("doc_id", "text", "lang", "source", "n_chars"),
            F.lit(10 ** 12)))).first()[0]

    a, b = digest(fam), digest(again)
    assert a == b
    assert fam.count() == N


def test_exact_dups_are_byte_identical_to_target(spark, corpus):
    """Every planted exact doc's text equals its content-seed target's
    text — the generator's one-hop guarantee (targets live in the
    always-base lower quarter, so dup-of-dup chains cannot form)."""
    fam, _ = corpus
    exact = fam.where(F.col("kind") == "exact")
    n_exact = exact.count()
    assert n_exact > 10
    tgt = fam.select(F.col("doc_id").alias("content_seed"),
                     F.col("text").alias("tgt_text"),
                     F.col("kind").alias("tgt_kind"))
    j = exact.join(tgt, "content_seed")
    assert j.where(F.col("tgt_kind") != "base").count() == 0
    assert j.where(F.col("text") != F.col("tgt_text")).count() == n_exact * 0


def test_curate_reasons_recover_planted_families(spark, corpus):
    """The full curation composition over the generated corpus:
    totality, and each planted family lands on its designed gate —
    exact plants ALL report exact_dup, loops ALL repetitive, shorts
    ALL too_short, and most near plants are near-dup losers (the
    component canonical keeps its minimum-id member; LSH banding is
    probabilistic, so a small planted fraction may not collide)."""
    fam, tmp = corpus
    out = curate_corpus(spark, tmp).localCheckpoint()
    assert out.count() == N
    j = out.join(fam.select("doc_id", "kind"), "doc_id")
    by = {(r["kind"], r["reason"]): r["n"]
          for r in j.groupBy("kind", "reason")
                    .agg(F.count("*").alias("n")).collect()}

    def total(kind):
        return sum(v for (k, _), v in by.items() if k == kind)

    assert by.get(("exact", "exact_dup"), 0) == total("exact") > 0
    assert by.get(("loop", "repetitive"), 0) == total("loop") > 0
    assert by.get(("short", "too_short"), 0) == total("short") > 0
    near_caught = by.get(("near", "near_dup"), 0)
    assert near_caught >= 0.6 * total("near") > 0
    # base docs overwhelmingly survive (no planted defects there)
    assert by.get(("base", "kept"), 0) >= 0.99 * total("base")


def test_shingles_short_docs_no_crash(spark):
    """Regression: shingles() on docs shorter than k words must yield
    zero rows, not a backwards F.sequence -> slice(start=0) crash
    (found generating corpora with 1-4-word planted docs)."""
    from miaplpy_spark.functions.text import shingles

    d = spark.createDataFrame(
        [(1, "one"), (2, "two words"), (3, "now three words"),
         (4, "four words right here")],
        "doc_id long, text string")
    got = shingles(d, k=3).groupBy("doc_id").count()
    rows = {r["doc_id"]: r["count"] for r in got.collect()}
    assert rows == {3: 1, 4: 2}
