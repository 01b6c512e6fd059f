#!/usr/bin/env python
"""Fast local mirror of the driver's CORRECTNESS gate for a subset of
queries: python scripts/check_oracles.py q30 q31 q32 ...  (empty = all
oracled queries). Same normalization as tests/test_entry_contract.py."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entrymod
from miaplpy_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_T2", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].astype(np.float64)
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype(np.int64)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def main():
    prefixes = sys.argv[1:]
    oracles = entrymod.oracle_sql()
    queries = entrymod.queries()
    names = sorted(n for n in oracles
                   if not prefixes or any(n.startswith(p) for p in prefixes))
    spark = get_spark(app_name="check_oracles", master="local[8]",
                      shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    fails = 0
    for name in names:
        try:
            got = _normalize(queries[name](spark, SF_DIR).toPandas())
            exp = _normalize(con.execute(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            fails += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols {list(got.columns)} != {list(exp.columns)}")
            fails += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            fails += 1
            continue
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                          rtol=0, atol=1e-9)
        except AssertionError as e:
            print(f"FAIL {name}: values differ\n{str(e)[:1500]}")
            d = (got.select_dtypes(float) - exp.select_dtypes(float))
            if len(d.columns):
                print("max abs float diff:", d.abs().max().to_dict())
            fails += 1
            continue
        print(f"ok   {name}: {len(got)} rows")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
