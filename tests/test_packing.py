"""Two-phase sequence packing vs the single-window DuckDB oracle
(the decomposition must be bit-identical to the naive global cumsum),
span-partition properties, and the plan pins."""

import duckdb
import pyspark.sql.functions as F

from miaplpy_spark.functions.packing import (
    N_BUCKETS, pack_sequences, packing_summary)
from miaplpy_spark.functions.sampling import _MIX_MOD, _MIX_MULT

SF_DIR = "/root/testdata/sf0.001"
SEQ_LEN = 512


def _oracle(seq_len=SEQ_LEN, n_buckets=N_BUCKETS):
    return duckdb.sql(f"""
        WITH t AS (
            SELECT doc_id,
                   (doc_id * {_MIX_MULT} % {_MIX_MOD}) % {n_buckets}
                       AS bucket,
                   len(string_split(text, ' '))::BIGINT AS n_tok
            FROM '{SF_DIR}/documents.parquet'),
        c AS (
            SELECT *, sum(n_tok) OVER (ORDER BY bucket, doc_id
                       ROWS UNBOUNDED PRECEDING) AS tok_end
            FROM t)
        SELECT doc_id, bucket, n_tok, tok_end - n_tok AS tok_start,
               tok_end,
               (tok_end - n_tok) // {seq_len} AS chunk_first,
               (tok_end - 1) // {seq_len} AS chunk_last
        FROM c""").df()


def test_two_phase_matches_single_window_oracle(spark):
    got = {r["doc_id"]: r for r in
           pack_sequences(spark, SF_DIR, SEQ_LEN).collect()}
    exp = _oracle()
    assert len(got) == len(exp)
    for row in exp.itertuples():
        r = got[row.doc_id]
        assert (r["bucket"], r["n_tok"], r["tok_start"], r["tok_end"],
                r["chunk_first"], r["chunk_last"]) == \
            (row.bucket, row.n_tok, row.tok_start, row.tok_end,
             row.chunk_first, row.chunk_last), row.doc_id


def test_spans_partition_the_token_stream(spark):
    rows = sorted(pack_sequences(spark, SF_DIR, SEQ_LEN).collect(),
                  key=lambda r: r["tok_start"])
    assert rows[0]["tok_start"] == 0
    for prev, cur in zip(rows, rows[1:]):
        assert cur["tok_start"] == prev["tok_end"]        # no gap/overlap
    for r in rows:
        assert r["tok_end"] - r["tok_start"] == r["n_tok"] > 0
        assert r["n_chunks"] == r["chunk_last"] - r["chunk_first"] + 1


def test_bucket_count_changes_order_not_coverage(spark):
    """A different n_buckets permutes the shuffle order but must still
    produce a perfect partition of the same total token count."""
    a = pack_sequences(spark, SF_DIR, SEQ_LEN, n_buckets=7)
    total = a.agg(F.max("tok_end")).collect()[0][0]
    b_total = (pack_sequences(spark, SF_DIR, SEQ_LEN, n_buckets=64)
               .agg(F.max("tok_end")).collect()[0][0])
    assert total == b_total
    spans = sorted((r["tok_start"], r["tok_end"]) for r in a.collect())
    pos = 0
    for s, e in spans:
        assert s == pos
        pos = e
    assert pos == total


def test_summary_accounts_for_every_token(spark):
    s = packing_summary(spark, SF_DIR, SEQ_LEN).collect()[0]
    exp = _oracle()
    assert s["n_docs"] == len(exp)
    assert s["n_tokens"] == int(exp["n_tok"].sum())
    n_chunks = -(-int(exp["tok_end"].max()) // SEQ_LEN)
    assert s["n_chunks"] == n_chunks
    assert s["tail_pad_tokens"] == n_chunks * SEQ_LEN - s["n_tokens"]
    assert s["n_boundary_docs"] == int(
        (exp["chunk_last"] > exp["chunk_first"]).sum())


def test_plan_single_corpus_shuffle_and_broadcast_bases(spark):
    plan = (pack_sequences(spark, SF_DIR, SEQ_LEN)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan, plan[:3000]
    assert "SortMergeJoin" not in plan, plan[:3000]
    # corpus-scale data moves through exactly one hash exchange (the
    # bucket window); the bases side is bucket-keyed totals only
    assert plan.count("Scan parquet") == 2, plan[:3000]
