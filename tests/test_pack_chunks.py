"""Materialized chunk packing: token-array equality against a NumPy
reconstruction of the global stream, chunk-size law, and the
round-trip with the span assignment."""

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import Row

from miaplpy_spark.functions.packing import pack_chunks, pack_spans
from miaplpy_spark.functions.sampling import _MIX_MOD, _MIX_MULT

SEQ_LEN = 64
N_BUCKETS = 16


def _corpus():
    """300 docs, lengths 1..~200 (many spanning several 64-token
    chunks), fixed-seed token arrays, plus empty-array docs that must
    vanish."""
    rng = np.random.RandomState(0)
    rows = []
    for doc_id in range(300):
        n = int(rng.randint(1, 200)) if doc_id % 37 else 0
        toks = rng.randint(0, 50_000, size=n).astype(np.int32).tolist()
        rows.append(Row(doc_id=doc_id, tokens=toks))
    return rows


def _stream(rows):
    """Concatenate non-empty docs in (bucket, doc_id) order."""
    def bucket(doc_id):
        return (doc_id * _MIX_MULT % _MIX_MOD) % N_BUCKETS
    ordered = sorted((r for r in rows if r.tokens),
                     key=lambda r: (bucket(r.doc_id), r.doc_id))
    out = []
    for r in ordered:
        out.extend(r.tokens)
    return out


def test_chunks_reproduce_the_stream_exactly(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    got = sorted(pack_chunks(df, SEQ_LEN, N_BUCKETS).collect(),
                 key=lambda r: r["chunk_id"])
    stream = _stream(rows)
    n_chunks = -(-len(stream) // SEQ_LEN)
    assert [r["chunk_id"] for r in got] == list(range(n_chunks))
    for r in got:
        lo = r["chunk_id"] * SEQ_LEN
        assert r["tokens"] == stream[lo:lo + SEQ_LEN], r["chunk_id"]
        assert r["n_tok"] == len(r["tokens"])
    # every chunk full except possibly the tail
    for r in got[:-1]:
        assert r["n_tok"] == SEQ_LEN
    assert 0 < got[-1]["n_tok"] <= SEQ_LEN


def test_chunks_agree_with_span_assignment(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    d = (df.withColumn("n_tok", F.size("tokens").cast("long"))
         .filter("n_tok > 0"))
    spans = {r["doc_id"]: r for r in
             pack_spans(d, SEQ_LEN, N_BUCKETS).collect()}
    chunks = {r["chunk_id"]: r["tokens"] for r in
              pack_chunks(df, SEQ_LEN, N_BUCKETS).collect()}
    for r in rows:
        if not r.tokens:
            assert r.doc_id not in spans
            continue
        s = spans[r.doc_id]
        # re-read the doc back out of its chunks: must equal its input
        # token array element for element
        out = []
        for cid in range(s["chunk_first"], s["chunk_last"] + 1):
            seg = chunks[cid]
            lo = max(cid * SEQ_LEN, s["tok_start"]) - cid * SEQ_LEN
            hi = min((cid + 1) * SEQ_LEN, s["tok_end"]) - cid * SEQ_LEN
            out.extend(seg[lo:hi])
        assert out == list(r.tokens), r.doc_id


def test_chunk_shuffle_count(spark):
    df = spark.createDataFrame(_corpus(), "doc_id long, tokens array<int>")
    plan = (pack_chunks(df, SEQ_LEN, N_BUCKETS)
            ._jdf.queryExecution().executedPlan().toString())
    assert "SortMergeJoin" not in plan, plan[:3000]
    assert "BroadcastHashJoin" in plan, plan[:3000]
