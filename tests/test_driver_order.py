"""Driver rotation invariants (round-2 verdict item #1): DRIVER_SEEN is
derived from the committed CORRECTNESS_r*.json artifacts, and every key
the driver has never checked sorts inside the 50-key budget window."""

from __future__ import annotations

import json
from pathlib import Path

from bigdata_financial_reporting_spark.queries.driver_order import (
    _STATIC_SEEN,
    DEFER_BEHIND_STALE,
    DEFER_BEHIND_STALE_R13,
    DEFER_BEHIND_STALE_R14,
    DRIVER_LAST_ROUND,
    DRIVER_SEEN,
    RECHECK_FIRST,
    RISK_ORDER,
    ordered_names,
)
from bigdata_financial_reporting_spark.queries.registry import QUERIES

REPO_ROOT = Path(__file__).resolve().parents[1]

DRIVER_BUDGET = 50


def _artifact_keys() -> set[str]:
    seen: set[str] = set()
    for path in sorted(REPO_ROOT.glob("CORRECTNESS_r*.json")):
        seen.update(json.loads(path.read_text()))
    return seen


def test_driver_seen_matches_committed_artifacts():
    artifacts = _artifact_keys()
    if not artifacts:  # bare checkout without driver outputs
        return
    assert DRIVER_SEEN == artifacts


def test_ordered_names_is_a_permutation_of_registry():
    names = ordered_names()
    assert sorted(names) == sorted(QUERIES)


def test_unseen_keys_fit_in_driver_budget():
    """Every never-checked key must appear before the driver's ~50-key
    truncation point, else it can be starved for another round — with
    the ONE sanctioned exception of DEFER_BEHIND_STALE (round-12:
    growth must not preempt the r02 staleness drain, so those keys
    deliberately queue behind it and land in the next round)."""
    names = ordered_names()
    unseen = [
        n
        for n in QUERIES
        if n not in DRIVER_SEEN
        and n not in DEFER_BEHIND_STALE
        and n not in DEFER_BEHIND_STALE_R13
        and n not in DEFER_BEHIND_STALE_R14
    ]
    if len(unseen) + len(RECHECK_FIRST) > DRIVER_BUDGET:
        # More unseen keys than budget: at least the budget must be spent
        # entirely on recheck+unseen keys.
        head = names[:DRIVER_BUDGET]
        assert all(n in RECHECK_FIRST or n not in DRIVER_SEEN for n in head)
    else:
        head = set(names[: len(unseen) + len(RECHECK_FIRST)])
        assert set(unseen) <= head
        assert set(RECHECK_FIRST) <= head


def test_defer_behind_stale_sits_between_stale_and_fresh():
    """The round-12 deferral contract: a DEFER_BEHIND_STALE key (while
    unseen) ranks after every r02-or-older seen key (so it cannot eat
    a staleness-drain slot) and before every r03-or-fresher seen key
    (so it cannot itself starve once the drain completes)."""
    names = ordered_names()
    deferred = [n for n in DEFER_BEHIND_STALE if n not in DRIVER_SEEN]
    if not deferred:
        return  # inert once driver-checked
    last_def = max(names.index(n) for n in deferred)
    first_def = min(names.index(n) for n in deferred)
    for n in names:
        if n in DRIVER_SEEN and n not in RECHECK_FIRST:
            rnd = DRIVER_LAST_ROUND.get(n, 0)
            if rnd <= 2:
                assert names.index(n) < first_def, (
                    f"stale key {n} (r{rnd:02d}) ranked after deferred "
                    f"new keys — growth is preempting the drain"
                )
            else:
                assert names.index(n) > last_def, (
                    f"deferred new keys ranked after fresh key {n}"
                )


def test_recheck_first_keys_lead():
    names = ordered_names()
    for i, key in enumerate(RECHECK_FIRST):
        assert names[i] == key


def test_static_seen_names_exist_in_registry():
    """Round-4 verdict item 7: the bare-checkout fallback must never
    carry names that no longer exist in the registry."""
    stale = _STATIC_SEEN - set(QUERIES)
    assert not stale, f"stale fallback names: {sorted(stale)}"


def test_risk_order_names_exist_and_are_unique():
    assert len(set(RISK_ORDER)) == len(RISK_ORDER)
    missing = set(RISK_ORDER) - set(QUERIES)
    assert not missing, f"RISK_ORDER names not in registry: {sorted(missing)}"


def test_seen_tier_is_oldest_check_first():
    """Round-7 verdict item 1: among already-driver-checked keys (not
    in RECHECK_FIRST), the export must be monotone in last-check round
    so stale evidence is refreshed before fresh evidence is re-spent.
    While the rotation has capacity, no key's staleness can exceed
    ceil(n_seen / budget) rounds."""
    names = ordered_names()
    seen_tail = [
        n for n in names if n in DRIVER_SEEN and n not in RECHECK_FIRST
    ]
    rounds = [DRIVER_LAST_ROUND.get(n, 0) for n in seen_tail]
    assert rounds == sorted(rounds), "seen tier not oldest-check-first"
    # The budget head must contain the globally stalest seen keys: no
    # key outside the head may be staler than one inside it.
    head = names[:DRIVER_BUDGET]
    head_seen = [n for n in head if n in DRIVER_SEEN and n not in RECHECK_FIRST]
    if head_seen and len(seen_tail) > len(head_seen):
        max_head = max(DRIVER_LAST_ROUND.get(n, 0) for n in head_seen)
        min_tail = min(
            DRIVER_LAST_ROUND.get(n, 0) for n in seen_tail[len(head_seen):]
        )
        assert max_head <= min_tail


def test_recheck_first_matches_gen_recheck():
    """The static RECHECK_FIRST tuple must agree with the git-derived
    computation (scripts/gen_recheck.py) so a source change after a
    driver check can never be silently dropped from the rotation.

    Asymmetric tolerance (round-8 verdict item 1): when the external
    driver drops a NEW CORRECTNESS_r{N}.json after the round's last
    commit, keys it just re-checked vanish from the computed list
    before the builder can possibly re-sync the tuple, so strict
    equality went red at every round boundary (r8, r9). A key the
    computation WANTS must always be present (the real staleness
    hazard); an extra key still listed in RECHECK_FIRST is tolerated
    iff the newest driver artifact just re-checked it green — i.e. the
    exact boundary case, never a silently dropped recheck."""
    import subprocess
    import sys

    if not (REPO_ROOT / ".git").exists():
        return  # bare checkout: no git history to derive from
    proc = subprocess.run(
        [sys.executable, str(REPO_ROOT / "scripts" / "gen_recheck.py")],
        capture_output=True,
        text=True,
        cwd=REPO_ROOT,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr
    want = tuple(r["key"] for r in json.loads(proc.stdout)["recheck"])
    missing = set(want) - set(RECHECK_FIRST)
    assert not missing, (
        f"RECHECK_FIRST silently drops stale-evidence keys {sorted(missing)} "
        "— run scripts/gen_recheck.py and re-sync driver_order.RECHECK_FIRST"
    )
    # computed keys must keep their oldest-check-first relative order
    want_set = set(want)
    assert tuple(k for k in RECHECK_FIRST if k in want_set) == want
    extras = set(RECHECK_FIRST) - want_set
    if extras:
        import re

        latest = max(
            REPO_ROOT.glob("CORRECTNESS_r*.json"),
            key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
        )
        rows = json.loads(latest.read_text())
        for k in sorted(extras):
            e = rows.get(k)
            assert e is not None and e.get("err") is None, (
                f"{k} left the computed recheck list but was NOT just "
                f"re-checked by the driver ({latest.name}) — stale tuple, "
                "re-sync RECHECK_FIRST"
            )
            assert (
                e.get("rows_match")
                and e.get("schema_match")
                and e.get("hash_match") is not False
            ), f"{k} was driver-re-checked RED in {latest.name}: {e}"


def test_risk_order_precedes_untriaged_unseen():
    """Triaged backlog keys must outrank any later additions so the
    driver budget clears the risk-ranked backlog first."""
    names = ordered_names()
    pos = {n: i for i, n in enumerate(names)}
    triaged_unseen = [n for n in RISK_ORDER if n not in DRIVER_SEEN]
    untriaged_unseen = [
        n
        for n in QUERIES
        if n not in DRIVER_SEEN
        and n not in RISK_ORDER
        and n not in RECHECK_FIRST
    ]
    if triaged_unseen and untriaged_unseen:
        assert max(pos[n] for n in triaged_unseen) < min(
            pos[n] for n in untriaged_unseen
        )


def test_defer_behind_stale_r13_sits_behind_both_stale_tiers():
    """The round-13 deferral contract: an R13 deferred key (while
    unseen) ranks after every r04-or-older seen key — the round-13
    budget is exactly consumed by rechecks + the r03 drain, so growth
    must not displace a single stale row — and before every
    r05-or-fresher seen key (so it cannot itself starve once the
    drains complete)."""
    names = ordered_names()
    deferred = [n for n in DEFER_BEHIND_STALE_R13 if n not in DRIVER_SEEN]
    if not deferred:
        return  # inert once driver-checked
    last_def = max(names.index(n) for n in deferred)
    first_def = min(names.index(n) for n in deferred)
    for n in names:
        if n in DRIVER_SEEN and n not in RECHECK_FIRST:
            rnd = DRIVER_LAST_ROUND.get(n, 0)
            if rnd <= 4:
                assert names.index(n) < first_def, (
                    f"stale key {n} (r{rnd:02d}) ranked after r13 deferred "
                    f"new keys — growth is preempting the drain"
                )
            else:
                assert names.index(n) > last_def, (
                    f"r13 deferred new keys ranked after fresh key {n}"
                )


def test_defer_behind_stale_r14_sits_behind_r04_and_r05_tiers():
    """The round-14 deferral contract: an R14 deferred key (while
    unseen) ranks after every r05-or-older seen key (growth must not
    eat a staleness-drain slot) and before every r06-or-fresher seen
    key (so it cannot itself starve once the drains complete)."""
    names = ordered_names()
    deferred = [n for n in DEFER_BEHIND_STALE_R14 if n not in DRIVER_SEEN]
    if not deferred:
        return  # inert once driver-checked
    last_def = max(names.index(n) for n in deferred)
    first_def = min(names.index(n) for n in deferred)
    for n in names:
        if n in DRIVER_SEEN and n not in RECHECK_FIRST:
            rnd = DRIVER_LAST_ROUND.get(n, 0)
            if rnd <= 5:
                assert names.index(n) < first_def, (
                    f"stale key {n} (r{rnd:02d}) ranked after r14 deferred "
                    f"new keys — growth is preempting the drain"
                )
            else:
                assert names.index(n) > last_def, (
                    f"r14 deferred new keys ranked after fresh key {n}"
                )
