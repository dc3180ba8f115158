"""Registry-ordering invariants: the external gate truncates the
checked prefix at ~50 entries, so the ordering IS part of the
verification strategy — every prefix must cover all families, and the
checked window must rotate toward the least-driver-verified queries
each round (VERDICT r2 #2)."""

from __future__ import annotations

import json

from fairy_spark.queries import (
    FAMILY,
    QUERIES,
    _RECHECK_FIRST,
    _driver_verified_counts,
)


def test_prefix_covers_every_family_with_unverified_rows():
    """Every family that still has a never-driver-verified query must
    land at least one of them in the checked 50-prefix; fully-verified
    families may legitimately rotate out."""
    counts = _driver_verified_counts()
    names = list(QUERIES)
    unverified_fams = {FAMILY[n] for n in names if counts.get(n, 0) <= 0}
    seen = {FAMILY[n] for n in names[:50] if counts.get(n, 0) <= 0}
    assert seen == unverified_fams, (
        f"prefix misses families with unverified rows: {unverified_fams - seen}"
    )


def test_least_verified_queries_sort_first():
    """Outside the pinned flagship, no query with k driver passes may
    precede one with fewer than k (recheck-pinned rows excepted)."""
    counts = _driver_verified_counts()
    names = [n for n in QUERIES if n != "q1_pricing_summary"]

    def tier(n: str) -> int:
        return -1 if n in _RECHECK_FIRST else counts.get(n, 0)

    tiers = [tier(n) for n in names]
    assert tiers == sorted(tiers), "registry not ordered by verification tier"


def test_verified_counts_shape(tmp_path):
    """Counts parse pass/fail correctly: a pass increments, any failure
    (error, row/hash mismatch) forces the query to the front tier."""
    fixture = {
        "good": {"err": None, "rows_match": True, "schema_match": True, "hash_match": True},
        "bad_hash": {"err": None, "rows_match": True, "schema_match": True, "hash_match": False},
        "errored": {"err": "boom", "rows_match": False, "schema_match": False, "hash_match": False},
    }
    p = tmp_path / "CORRECTNESS_r99.json"
    p.write_text(json.dumps(fixture))
    import glob as glob_mod

    orig_glob = glob_mod.glob
    try:
        glob_mod.glob = (
            lambda pat: [str(p)] if "CORRECTNESS" in pat else orig_glob(pat)
        )
        counts = _driver_verified_counts()
    finally:
        glob_mod.glob = orig_glob
    assert counts["good"] == 1
    assert counts["bad_hash"] < 0 and counts["errored"] < 0


def test_no_oracle_rows_check_counts_as_verified(tmp_path):
    """Declared rows-only checks (err='no_oracle' + a row count) are
    the designed verification for the ANN queries — they must count as
    passes, not camp in the re-check tier every round (r4 fix)."""
    fixture = {
        "ann": {
            "err": "no_oracle", "rows_match": None, "schema_match": None,
            "hash_match": None, "spark_rows": 23, "oracle_rows": None,
        },
    }
    p = tmp_path / "CORRECTNESS_r99.json"
    p.write_text(json.dumps(fixture))
    import glob as glob_mod

    orig_glob = glob_mod.glob
    try:
        glob_mod.glob = (
            lambda pat: [str(p)] if "CORRECTNESS" in pat else orig_glob(pat)
        )
        counts = _driver_verified_counts()
    finally:
        glob_mod.glob = orig_glob
    assert counts["ann"] == 1


def test_later_pass_clears_earlier_failure(tmp_path):
    """A query that failed once and was then fixed + driver-reverified
    must not stay pinned at the front forever (r4 fix): only a LATEST-
    round failure forces the re-check tier."""
    r1 = {"q": {"err": None, "rows_match": True, "schema_match": True, "hash_match": False}}
    r2 = {"q": {"err": None, "rows_match": True, "schema_match": True, "hash_match": True}}
    p1 = tmp_path / "CORRECTNESS_r01.json"
    p2 = tmp_path / "CORRECTNESS_r02.json"
    p1.write_text(json.dumps(r1))
    p2.write_text(json.dumps(r2))
    import glob as glob_mod

    orig_glob = glob_mod.glob
    try:
        glob_mod.glob = (
            lambda pat: [str(p1), str(p2)] if "CORRECTNESS" in pat else orig_glob(pat)
        )
        counts = _driver_verified_counts()
    finally:
        glob_mod.glob = orig_glob
    assert counts["q"] > 0  # green again → normal tier
    # and the reverse (a LATER round fails after the pass) stays
    # pinned — files iterate in sorted round order, so add an r03 fail
    p3 = tmp_path / "CORRECTNESS_r03.json"
    p3.write_text(json.dumps(r1))
    try:
        glob_mod.glob = (
            lambda pat: [str(p1), str(p2), str(p3)]
            if "CORRECTNESS" in pat
            else orig_glob(pat)
        )
        counts = _driver_verified_counts()
    finally:
        glob_mod.glob = orig_glob
    assert counts["q"] < 0


def test_round_files_iterate_in_numeric_round_order(tmp_path):
    """ADVICE r4: 'latest result wins' must use the parsed round
    number, not lexicographic path order — under a plain sort an
    unpadded CORRECTNESS_r9 would be read AFTER r10 and a stale r9
    failure would shadow the r10 pass."""
    fail = {"q": {"err": None, "rows_match": True, "schema_match": True, "hash_match": False}}
    ok = {"q": {"err": None, "rows_match": True, "schema_match": True, "hash_match": True}}
    p9 = tmp_path / "CORRECTNESS_r9.json"
    p10 = tmp_path / "CORRECTNESS_r10.json"
    p9.write_text(json.dumps(fail))
    p10.write_text(json.dumps(ok))
    import glob as glob_mod

    orig_glob = glob_mod.glob
    try:
        glob_mod.glob = (
            # Hand the paths over lexicographically sorted (r10 < r9) to
            # prove the function re-sorts by round number itself.
            lambda pat: [str(p10), str(p9)] if "CORRECTNESS" in pat else orig_glob(pat)
        )
        counts = _driver_verified_counts()
    finally:
        glob_mod.glob = orig_glob
    assert counts["q"] > 0, "r10 pass must win over the earlier r9 failure"


def test_never_checked_queries_fill_prefix():
    """Every query no CORRECTNESS file has ever seen must land in the
    checked 50-prefix (up to the slots the flagship + recheck pins
    take), so the external gate converges on full coverage."""
    counts = _driver_verified_counts()
    names = list(QUERIES)
    never = [n for n in names if n not in counts]
    in_prefix = [n for n in never if n in names[:50]]
    budget = 50 - 1 - len(_RECHECK_FIRST)  # flagship + pinned rows
    assert len(in_prefix) >= min(len(never), budget), (
        f"{len(never)} never-checked, only {len(in_prefix)} in prefix"
    )
