"""Keep repo claims synced to the driver artifacts (round-3 VERDICT
item 8): the driver's CORRECTNESS gate certifies at most the FIRST 50
entries of ``queries()`` (CORRECTNESS_r03.json was exactly the first
50 of 52 registered, in registration order), so registering more than
50 silently drops the tail from certification. These guards would
have caught the round-3 "52 registered vs 50 certified" drift."""

import glob
import json
import os
import re

import __spark_entry__ as entrymod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER_QUERY_CAP = 50


def test_registered_queries_fit_driver_cap():
    q = entrymod.queries()
    assert len(q) <= DRIVER_QUERY_CAP, (
        f"{len(q)} queries registered but the driver certifies only the "
        f"first {DRIVER_QUERY_CAP}; merge or drop entries past the cap")


def test_every_query_has_an_oracle():
    q, o = entrymod.queries(), entrymod.oracle_sql()
    assert set(o) <= set(q), f"orphan oracles: {sorted(set(o) - set(q))}"
    assert set(q) == set(o), (
        f"rows-only (oracle-less) queries: {sorted(set(q) - set(o))}")


def test_readme_query_count_matches_registration():
    text = open(os.path.join(REPO, "README.md")).read()
    m = re.search(r"(\d+) queries, every one with a full DuckDB oracle",
                  text)
    assert m, "README no longer states the query count"
    assert int(m.group(1)) == len(entrymod.queries())


def test_latest_driver_artifact_covers_all_queries():
    """Once a CORRECTNESS_r*.json exists that was produced AFTER the
    registration shrank to the cap, it must contain every registered
    query. Older artifacts (with a superset or the pre-merge names)
    are tolerated — the guard is that no REGISTERED query past the
    artifact's coverage goes unnoticed when counts already agree."""
    arts = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    if not arts:
        return
    rows = json.load(open(arts[-1]))
    reg = list(entrymod.queries())
    missing = [q for q in reg if q not in rows]
    # the artifact predates this registration iff it holds names we
    # no longer register; only a same-generation artifact must be full
    if not (set(rows) - set(reg)):
        assert not missing, (
            f"driver artifact {os.path.basename(arts[-1])} is missing "
            f"registered queries: {missing}")
