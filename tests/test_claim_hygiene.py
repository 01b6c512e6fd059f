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


def test_readme_bench_claims_track_artifacts():
    """Round-4 VERDICT item 8: README cites specific inversion
    throughputs that silently went stale as reruns improved (claimed
    2.44x while BENCH_r04 measured 2.9x). Design: the claim names its
    artifact round inline ([artifact BENCH_rNN]); the numbers must
    match THAT artifact within 5%, and the citation may lag the
    newest artifact by at most one round — so a better measurement
    landing right after a commit cannot flip the test mid-round, but
    numbers can never rot more than one round behind."""
    text = open(os.path.join(REPO, "README.md")).read()
    m = re.search(r"\*\*(\d+\.\d+)M doc·pair/s \(L2\)\*\* / "
                  r"(\d+\.\d+)M \(WLS\) — (\d+\.\d+)x / (\d+\.\d+)x"
                  r".{0,200}?\[artifact BENCH_r(\d+)\]",
                  text, re.DOTALL)
    assert m, ("README no longer states the inversion throughput claim "
               "with its [artifact BENCH_rNN] citation")
    l2_claim, wls_claim = float(m.group(1)) * 1e6, float(m.group(2)) * 1e6
    l2_mult, wls_mult = float(m.group(3)), float(m.group(4))
    cited = int(m.group(5))

    rounds = {}
    all_rounds = set()
    for p in glob.glob(os.path.join(REPO, "BENCH_r*.json")):
        rm = re.search(r"BENCH_r(\d+)\.json$", p)
        if not rm:
            continue
        # an artifact that EXISTS but cannot be parsed (or carries no
        # inversion datapoint) still counts as "a newer round exists"
        # for the freshness bound — round-5 VERDICT item 2: a
        # parsed:null artifact let a stale 2.9x claim outlive a 1.09x
        # driver measurement because this loop silently skipped it
        all_rounds.add(int(rm.group(1)))
        try:
            parsed = json.load(open(p)).get("parsed") or {}
        except (json.JSONDecodeError, AttributeError):
            continue
        if (parsed.get("invert") or {}).get("px_ifg_per_s"):
            rounds[int(rm.group(1))] = parsed
    if not rounds:
        return  # no bench artifact with an inversion datapoint yet
    assert cited in rounds, f"cited BENCH_r{cited:02d} has no datapoint"
    latest = max(all_rounds)
    assert latest - cited <= 1, (
        f"README cites BENCH_r{cited:02d} but BENCH_r{latest:02d} "
        "exists (parseable or not) — refresh the claim")
    art = rounds[cited]
    pairs = [(l2_claim, art["invert"]["px_ifg_per_s"])]
    if art.get("invert_wls"):
        pairs.append((wls_claim, art["invert_wls"]["px_ifg_per_s"]))
    for claim, meas in pairs:
        assert 0.95 * meas <= claim <= 1.05 * meas, (
            f"README claim {claim:.3g} vs cited artifact {meas:.3g}")
    ref = 626_000  # the reference's published px·ifg/s (BASELINE.md)
    assert abs(l2_mult - l2_claim / ref) < 0.11
    assert abs(wls_mult - wls_claim / ref) < 0.11


def test_latest_driver_artifact_covers_all_queries():
    """Once a CORRECTNESS_r*.json exists that was produced AFTER the
    registration shrank to the cap, it must contain every registered
    query. Older artifacts (with a superset or the pre-merge names)
    are tolerated — the guard is that no REGISTERED query past the
    artifact's coverage goes unnoticed when counts already agree."""
    # sort by the NUMERIC round (round-4 ADVICE: lexicographic sort
    # puts CORRECTNESS_r9.json after r10 and would validate against a
    # stale artifact once rounds pass one digit)
    def _round_no(p):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1

    arts = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
                  key=_round_no)
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
