"""PII scrub vs a DuckDB/RE2 oracle over a planted corpus, plus the
clean-corpus zero-hit check and the shuffle-free plan pin."""

import duckdb
import pyspark.sql.functions as F
import pytest

from miaplpy_spark.functions.pii import PII_PATTERNS, pii_scrub

SF_DIR = "/root/testdata/sf0.001"

PLANTS = {
    10**9: ("reach me at jane.doe+spam@example.co.uk or "
            "jdoe@sub.domain.org thanks"),
    10**9 + 1: "ssn 123-45-6789 phone 555-123-4567 and +01 555 987 6543",
    10**9 + 2: "servers 10.0.0.1 and 192.168.255.254 but not 1.2.3",
    10**9 + 3: "mixed: a@b.io then 001-22-3333 then 172.16.0.9 end",
}
EXPECTED = {
    10**9: dict(n_email=2, n_ssn=0, n_phone=0, n_ipv4=0),
    # "+01 555 987 6543" is 2-3-3-4 — the phone regex needs 3-3-4 with
    # single separators, so only "555 987 6543" matches
    10**9 + 1: dict(n_email=0, n_ssn=1, n_phone=2, n_ipv4=0),
    10**9 + 2: dict(n_email=0, n_ssn=0, n_phone=0, n_ipv4=2),
    10**9 + 3: dict(n_email=1, n_ssn=1, n_phone=0, n_ipv4=1),
}


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    corpus = str(tmp_path_factory.mktemp("pii") / "c")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plants = spark.createDataFrame(
        [(k, v) for k, v in PLANTS.items()], "doc_id long, text string")
    extra = (plants
             .withColumn("lang", F.lit("en"))
             .withColumn("source", F.lit("planted"))
             .withColumn("n_chars", F.length("text").cast("long")))
    docs.unionByName(extra).write.parquet(f"{corpus}/documents.parquet")
    return corpus


def test_planted_counts_exact(spark, planted_dir):
    got = {r["doc_id"]: r for r in pii_scrub(spark, planted_dir)
           .filter(F.col("doc_id") >= 10**9).collect()}
    assert set(got) == set(PLANTS)
    for doc_id, exp in EXPECTED.items():
        r = got[doc_id]
        for k, v in exp.items():
            assert r[k] == v, (doc_id, k, r)
        assert r["n_pii"] == sum(exp.values())


def test_redaction_removes_every_match(spark, planted_dir):
    rows = pii_scrub(spark, planted_dir).collect()
    for r in rows:
        red = r["text_redacted"]
        if r["doc_id"] == 10**9:
            assert red == ("reach me at <EMAIL> or <EMAIL> thanks")
        if r["doc_id"] == 10**9 + 1:
            assert red == "ssn <SSN> phone <PHONE> and +01 <PHONE>"
        if r["doc_id"] == 10**9 + 2:
            assert red == "servers <IPV4> and <IPV4> but not 1.2.3"


def test_matches_duckdb_re2_oracle(spark, planted_dir):
    """Same patterns through DuckDB's RE2: counts per family and the
    chained global replace must agree with Java's regex engine."""
    got = {r["doc_id"]: r for r in pii_scrub(spark, planted_dir).collect()}
    con = duckdb.connect()
    count_cols = ", ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS n_{name}"
        for name, pat in PII_PATTERNS)
    red = "text"
    for name, pat in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '<{name.upper()}>', 'g')"
    exp = con.sql(
        f"SELECT doc_id, {count_cols}, {red} AS text_redacted"
        f" FROM '{planted_dir}/documents.parquet/*.parquet'").df()
    assert len(exp) == len(got)
    for row in exp.itertuples():
        r = got[row.doc_id]
        for name, _ in PII_PATTERNS:
            assert r[f"n_{name}"] == getattr(row, f"n_{name}"), row.doc_id
        assert r["text_redacted"] == row.text_redacted, row.doc_id


def test_clean_corpus_is_untouched(spark):
    out = pii_scrub(spark, SF_DIR)
    hits = out.agg(F.sum("n_pii")).collect()[0][0]
    assert hits == 0
    unchanged = (out.join(
        spark.read.parquet(f"{SF_DIR}/documents.parquet"), "doc_id")
        .filter(F.col("text_redacted") != F.col("text")).count())
    assert unchanged == 0


def test_plan_is_shuffle_free(spark):
    plan = (pii_scrub(spark, SF_DIR)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan[:2000]
