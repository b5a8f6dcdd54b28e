"""Registry invariants: the driver contract's structural guarantees.

The grading driver samples the FIRST 50 `queries()` entries for its
correctness file, so the rotation mechanics in queries.py (externally
confirmed names last) are load-bearing — pin them.
"""

from __future__ import annotations

import json
from pathlib import Path

from time_series_spark_spark import queries as reg


def test_every_entry_well_formed():
    assert len(reg.REGISTRY) >= 150
    for name, q in reg.REGISTRY.items():
        assert callable(q.fn), name
        assert q.oracle is None or "SELECT" in q.oracle.upper(), name


def test_window_structure_regression_slice_regime():
    """Round 12+: the fresh pool no longer fills the 50-slot window, so
    the live registry runs the REGRESSION-SLICE regime — rechecks first,
    then EVERY fresh (never-confirmed) query, then a rotating slice of
    confirmed queries fills the spare slots. Pin that every fresh query
    is inside the driver's sample window (the round-11 verdict's top
    item: the last never-sampled queries must face the driver)."""
    names = list(reg.REGISTRY)
    confirmed = set(reg._EXTERNALLY_CONFIRMED)
    recheck = reg._RECHECK_FIRST
    assert confirmed <= set(names)
    fresh = [n for n in names if n not in confirmed and n not in set(recheck)]
    window = names[: reg.SAMPLE_WINDOW]
    # rechecks lead, all fresh queries fit inside the window
    assert window[: len(recheck)] == recheck
    assert set(fresh) <= set(window), sorted(set(fresh) - set(window))
    assert window[len(recheck) : len(recheck) + len(fresh)] == fresh
    # spare slots hold confirmed queries only (the rotating slice)
    assert set(window[len(recheck) + len(fresh) :]) <= confirmed
    # everything after the window is confirmed (nothing fresh buried)
    assert set(names[reg.SAMPLE_WINDOW :]) <= confirmed


def test_confirmed_list_covers_settled_driver_files():
    """Greens from every settled CORRECTNESS_r{N}.json belong in
    _EXTERNALLY_CONFIRMED (rotation maintenance, see queries.py). The
    NEWEST file is exempt — the driver writes it at round end, after the
    registry was last editable — so this guards against names being
    dropped, while the new file's maintenance happens at next round's
    start. Membership in _RECHECK_FIRST ALSO counts as covered: a green
    query deliberately held back for re-confirmation under a stronger
    oracle is accounted for, not dropped (round-7 verdict item 1 — the
    old confirmed-only criterion reddened the suite the instant the
    driver's new round file landed)."""
    repo = Path(__file__).resolve().parent.parent
    files = sorted(repo.glob("CORRECTNESS_r*.json"))
    assert files
    covered = set(reg._EXTERNALLY_CONFIRMED) | set(reg._RECHECK_FIRST)
    for f in files[:-1]:
        # Strict green: a hash/rows/schema FAIL has err=None too — it must
        # STAY in the driver's sample window until re-verified (round-3
        # verdict #4: the old err-only criterion would have rotated two
        # hash-failed queries out of external view permanently).
        green = {
            n
            for n, r in json.loads(f.read_text()).items()
            if (
                r.get("rows_match")
                and r.get("schema_match")
                and r.get("hash_match")
            )
            or r.get("err") == "no_oracle"
        }
        missing = green - covered
        assert not missing, (
            f"{f.name}: rotation maintenance due — add to "
            f"_EXTERNALLY_CONFIRMED in queries.py: {sorted(missing)}"
        )


def test_apply_rotation_fresh_regime():
    """While never-confirmed queries overfill the window, rotation is
    rechecks-first + fresh + confirmed tail (no regression slice) — the
    regime the live registry ran in rounds 1–11, kept pinned as a pure
    function so a future registration surge can't silently bury fresh
    queries behind a confirmed slice."""
    registry = {f"q{i}": i for i in range(20)}
    confirmed = [f"q{i}" for i in range(5)]  # q5..q19 fresh: overfills w=10
    rotated = list(
        reg._apply_rotation(registry, confirmed, ["q19"], window=10, round_idx=3)
    )
    assert rotated[0] == "q19"
    assert rotated[1:15] == [f"q{i}" for i in range(5, 19)]
    assert rotated[-5:] == confirmed  # confirmed tail, original order


def test_apply_rotation_regression_slice_regime():
    """Once the fresh pool no longer fills the window, spare slots take a
    slice of confirmed queries that ROTATES with the round index — every
    confirmed query is re-sampled eventually, and fresh/recheck names
    always stay in front."""
    registry = {f"q{i}": i for i in range(20)}
    confirmed = [f"q{i}" for i in range(15)]  # q15..q19 fresh
    window = 10
    seen = set()
    for rnd in range(8):
        rotated = list(
            reg._apply_rotation(
                registry, confirmed, ["q19"], window=window, round_idx=rnd
            )
        )
        assert set(rotated) == set(registry)  # nothing lost
        assert rotated[0] == "q19"  # recheck first
        assert set(rotated[1:5]) == {"q15", "q16", "q17", "q18"}  # fresh next
        in_window = rotated[:window]
        slice_part = in_window[5:]
        assert len(slice_part) == 5  # spare slots filled from confirmed
        assert set(slice_part) <= set(confirmed)
        seen |= set(slice_part)
    assert seen == set(confirmed)  # rotation eventually covers everyone
