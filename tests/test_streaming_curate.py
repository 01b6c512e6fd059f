"""Streaming curation (streaming.curate_stream.stream_curate): every
arriving file is curated against the dedup index per micro-batch, kept
docs extend the index before the next trigger, and a restart from the
same checkpoint neither re-decides nor double-indexes."""

import os

import pyspark.sql.functions as F
import pytest

from miaplpy_spark.datagen import generate_documents
from miaplpy_spark.functions.curate import curate_batch
from miaplpy_spark.functions.dedup import (
    build_minhash_index,
    extend_minhash_index,
)
from miaplpy_spark.streaming.curate_stream import DOCS_SCHEMA, stream_curate

N = 2000
A_END, B_END = 1400, 1700


@pytest.fixture()
def setup(spark, workdir):
    """Index over base A; arriving files B then C; a TWIN index for
    the sequential batch-by-batch oracle."""
    docs = generate_documents(spark, N)
    d = {}
    for name, lo, hi in (("a", 0, A_END), ("b", A_END, B_END),
                         ("c", B_END, N)):
        path = os.path.join(workdir, name)
        (docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
         .coalesce(1).write.parquet(f"{path}/documents.parquet"))
        d[name] = path
    d["incoming"] = os.path.join(workdir, "incoming")
    os.makedirs(d["incoming"])
    for i, name in enumerate(("b", "c")):
        # one file per slice so maxFilesPerTrigger=1 yields one
        # micro-batch per slice, in write order
        src = [f for f in os.listdir(f"{d[name]}/documents.parquet")
               if f.endswith(".parquet")]
        assert len(src) == 1
        os.link(f"{d[name]}/documents.parquet/{src[0]}",
                f"{d['incoming']}/slice_{i}.parquet")
    d["index"] = os.path.join(workdir, "index")
    d["oracle_index"] = os.path.join(workdir, "oracle_index")
    build_minhash_index(spark, d["a"], d["index"])
    build_minhash_index(spark, d["a"], d["oracle_index"])
    d["out"] = os.path.join(workdir, "decisions")
    d["stage"] = os.path.join(workdir, "stage")
    d["ckpt"] = os.path.join(workdir, "ckpt")
    return d


def _run(spark, d):
    stream = (spark.readStream.schema(DOCS_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(d["incoming"]))
    q = stream_curate(stream, d["index"], d["out"], d["stage"],
                      checkpoint_dir=d["ckpt"], available_now=True)
    q.awaitTermination(120)
    return spark.read.parquet(d["out"])


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_stream_equals_sequential_batches(spark, setup):
    got = _run(spark, setup)
    # oracle: the proven sequential loop on the twin index
    dec_b = curate_batch(spark, setup["b"], setup["oracle_index"])
    want_b = _rows(dec_b.select("doc_id", "reason", "keep"))
    extend_minhash_index(spark, setup["b"], setup["oracle_index"],
                         keep=dec_b.where("keep"))
    dec_c = curate_batch(spark, setup["c"], setup["oracle_index"])
    want_c = _rows(dec_c.select("doc_id", "reason", "keep"))

    by_batch = {int(r[0]): r[1] for r in
                got.groupBy("batch").count().collect()}
    assert by_batch == {0: B_END - A_END, 1: N - B_END}
    assert _rows(got.where("batch = 0")
                 .select("doc_id", "reason", "keep")) == want_b
    assert _rows(got.where("batch = 1")
                 .select("doc_id", "reason", "keep")) == want_c
    # cross-micro-batch store-wins must have fired: some C doc near/
    # exact-matches a doc kept in micro-batch 0 or the base store
    assert any(r[1] in ("exact_dup", "near_dup") for r in want_c)


def test_restart_is_idempotent(spark, setup):
    first = _rows(_run(spark, setup))
    n_sig = spark.read.parquet(f"{setup['index']}/signatures").count()
    # same checkpoint: the drained stream has nothing to reprocess
    again = _rows(_run(spark, setup))
    assert again == first
    assert spark.read.parquet(
        f"{setup['index']}/signatures").count() == n_sig


def test_extend_if_absent_guards_double_append(spark, setup):
    dec = curate_batch(spark, setup["b"], setup["index"])
    n1 = extend_minhash_index(spark, setup["b"], setup["index"],
                              keep=dec.where("keep"), if_absent=True)
    assert n1 > 0
    n_sig = spark.read.parquet(f"{setup['index']}/signatures").count()
    n2 = extend_minhash_index(spark, setup["b"], setup["index"],
                              keep=dec.where("keep"), if_absent=True)
    assert n2 == 0
    assert spark.read.parquet(
        f"{setup['index']}/signatures").count() == n_sig
