"""Registry-rotation discipline (VERDICT r10 item 8).

The driver's CORRECTNESS gate checks only the FIRST 50 entries of
`__spark_entry__.queries()` each round, so proofs decay unless the
registry is rotated staleness-first (tools/rotate_registry.py). This
check fails the suite if rotation is skipped a round:

- the registry must be ordered by last-gated round ascending (stalest
  first), so the upcoming driver run re-gates exactly the entries whose
  proof is oldest;
- assuming the current window IS gated next round, no entry's latest
  driver row may end up older than 2 rounds;
- every queries() key has an oracle_sql() mate (or is a documented
  rows-only entry) and every oracle key exists in queries().

No Spark session is needed — queries() only builds the dict.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def _history():
    last: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        r = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for k in json.load(open(f)):
            last[k] = r
    return last


def test_registry_rotation_not_lapsed():
    import math

    import __spark_entry__ as e

    last = _history()
    # REGATE markers void driver rows recorded at/below the noted round
    # (the gate's semantics changed after that run) — such entries count
    # as never-gated and must lead the next window
    for k, r in getattr(e, "REGATE", {}).items():
        if last.get(k, 0) <= r:
            last.pop(k, None)
    n = max(last.values())
    keys = list(e.queries().keys())
    window = set(keys[:WINDOW])
    # the achievable bound: with staleness-first rotation every round, an
    # entry re-gates every ceil(N/50) rounds, so an entry outside the
    # UPCOMING window may be at most cycle-1 rounds old. POLICY
    # (COVERAGE.md "Staleness-bound policy"): the registry is held at
    # <=150 entries so the bound stays at 2 rounds; growth above 150
    # requires merging near-duplicate gates first. The check still
    # computes the bound from N so a deliberate policy change can't make
    # the invariant unsatisfiable.
    assert len(keys) <= 150, (
        f"registry has {len(keys)} entries — policy caps it at 150 "
        "(merge near-duplicate gates; see COVERAGE.md staleness policy)"
    )
    cycle = max(2, math.ceil(len(keys) / WINDOW))
    floor_round = n - (cycle - 1)
    # Freshly-gated window (ADVICE r11 / VERDICT r12 item 1): when the
    # driver's CORRECTNESS file for round n has just landed, keys[:50]
    # all carry round n and the literal ordering is temporarily violated
    # by design — rotation is *pending*, not lapsed. In that state,
    # validate the PENDING rotation instead: simulate stalest-first
    # reordering and require nothing outside the simulated next window
    # to be older than the bound. If rotation is then skipped a round,
    # the un-rotated tail keeps aging and this same simulated check
    # fires at n+1 (the r10 crowd drops below the rising floor), so a
    # skipped rotation is still caught — just one round later, on the
    # tree where it is actually a lapse.
    window_fresh = all(last.get(k, 0) == n for k in keys[:WINDOW])
    if window_fresh:
        # the exemption covers ONE pending rotation, not a skipped one:
        # if these same keys were also the round-(n-1) window, the
        # registry was gated twice without rotating — fail immediately
        # instead of letting the tail age a third round (r13 review
        # finding on the original simulate-only version)
        prev = os.path.join(REPO, f"CORRECTNESS_r{n - 1:02d}.json")
        if os.path.exists(prev):
            prev_keys = set(json.load(open(prev)))
            assert prev_keys != set(keys[:WINDOW]), (
                f"rotation skipped: keys[:{WINDOW}] were the driver "
                f"window in BOTH r{n - 1} and r{n}; run "
                "tools/rotate_registry.py"
            )
        simulated = sorted(keys, key=lambda k: last.get(k, 0))
        window = set(simulated[:WINDOW])
    stale = [
        f"{k} (last gated r{last.get(k, 0)})"
        for k in keys
        if k not in window and last.get(k, 0) < floor_round
    ]
    assert not stale, (
        "registry rotation lapsed — these entries are outside the next "
        f"driver window with a proof older than r{floor_round}: {stale}; "
        "run tools/rotate_registry.py"
    )
    # staleness-first ordering: last-gated rounds never decrease along
    # the registry (never-gated entries count as round 0 and must lead).
    # A freshly-gated window is exempt (rotation pending, validated via
    # the simulation above).
    rounds = [last.get(k, 0) for k in keys]
    assert window_fresh or rounds == sorted(rounds), (
        "registry is not ordered staleness-first; run "
        "tools/rotate_registry.py"
    )


def test_registry_oracle_parity():
    import __spark_entry__ as e

    qs, osql = set(e.queries()), set(e.oracle_sql())
    assert not (osql - qs), f"oracle-only keys: {sorted(osql - qs)}"
    missing = qs - osql
    # rows-only entries (non-SQL-expressible) must stay a deliberate,
    # enumerated exception — growth here is a correctness-gate hole
    assert not missing, f"queries() entries without an oracle: {sorted(missing)}"
