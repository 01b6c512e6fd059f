"""CCNet-style unigram self-information quality score vs a pure
pandas/NumPy oracle, plus the tail-behavior sanity the filter relies
on (boilerplate scores low, rare-token noise scores high)."""

import math

import pandas as pd
import pyspark.sql.functions as F

from miaplpy_spark.functions.text import self_information_score

SF_DIR = "/root/testdata/sf0.001"


def _oracle(docs: pd.DataFrame) -> dict[int, tuple[int, float]]:
    words = docs["text"].str.split(" ")
    counts: dict[str, int] = {}
    for ws in words:
        for w in ws:
            counts[w] = counts.get(w, 0) + 1
    n_total = sum(counts.values())
    out = {}
    for doc_id, ws in zip(docs["doc_id"], words):
        bits = sum(-math.log2(counts[w] / n_total) for w in ws)
        out[doc_id] = (len(ws), round(bits / len(ws), 6))
    return out


def test_self_information_matches_oracle(spark):
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"])
    exp = _oracle(docs)
    got = {r["doc_id"]: r for r in
           self_information_score(spark, SF_DIR).collect()}
    assert set(got) == set(exp)
    for doc_id, (n, bpt) in exp.items():
        assert got[doc_id]["n_words"] == n
        assert abs(got[doc_id]["bits_per_token"] - bpt) < 1e-5, doc_id


def test_self_information_orders_tails(spark, tmp_path):
    """A doc of one repeated common word must land at the very bottom
    of the score distribution; a doc of globally-unique tokens at the
    very top — the two tails the CCNet-style filter trims."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base = docs.orderBy("doc_id").limit(1)
    boiler = (base.withColumn("doc_id", F.lit(10 ** 9).cast("long"))
              .withColumn("text", F.concat_ws(
                  " ", F.array_repeat(F.lit("the"), 200))))
    noise = (base.withColumn("doc_id", F.lit(10 ** 9 + 1).cast("long"))
             .withColumn("text", F.concat_ws(" ", F.array(
                 *[F.lit(f"zq{i}xv") for i in range(30)]))))
    corpus = str(tmp_path / "c")
    (docs.unionByName(boiler).unionByName(noise)
     .write.parquet(f"{corpus}/documents.parquet"))
    rows = self_information_score(spark, corpus).collect()
    score = {r["doc_id"]: r["bits_per_token"] for r in rows}
    natural = [v for k, v in score.items() if k < 10 ** 9]
    assert score[10 ** 9] < min(natural)        # boilerplate tail
    assert score[10 ** 9 + 1] > max(natural)    # rare-noise tail
