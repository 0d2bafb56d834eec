"""Propose the next round's DRIVER_HEAD rotation.

The external driver verifies only the first ~50 registered queries each
round; DRIVER_SERVED.json records which names have already received a
driver correctness row. This tool prints, for the NEXT round:

  - the canaries (unchanged),
  - a proposed ROTATION drawn from oracle-backed queries that have never
    been driver-verified (spread across name-prefix families, cheapest
    categories first),
  - the remaining never-served pool size,

plus the two bookkeeping edits the next session must make:
  1. set ROTATION in rtdl_spark/queries/__init__.py to the proposed list,
  2. append the new head under the next round key in DRIVER_SERVED.json.

Usage: python tools/rotate_head.py [n_slots]   (default 38)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_slots = int(sys.argv[1]) if len(sys.argv) > 1 else 38

    from rtdl_spark.queries import CANARIES, all_oracles, all_queries

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    served_path = os.path.join(root, "DRIVER_SERVED.json")
    served = json.load(open(served_path))
    # numeric sort: lexicographic breaks at r10 ("r10" < "r9")
    rounds = sorted(
        (k for k in served if k.startswith("r")),
        key=lambda k: int(k[1:]),
    )
    prior = set().union(*(served[r] for r in rounds))

    # r5 amendment: a name whose LATEST committed CORRECTNESS row is red
    # re-enters the pool (and should be prioritized) — the never-served
    # rule alone would leave FAIL as its last external word forever
    import glob

    verdict: dict[str, bool] = {}
    for p in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        for name, row in json.load(open(p)).items():
            verdict[name] = row.get("err") is None and not any(
                row.get(k) is False
                for k in ("rows_match", "schema_match", "hash_match")
            )
    red_latest = {n for n, ok in verdict.items() if not ok}
    if red_latest:
        print(f"# RED-LATEST (must be re-served): {sorted(red_latest)}")

    q = all_queries()
    o = all_oracles()
    pool = [
        n for n in q if n in o and (n not in prior or n in red_latest)
    ]
    rows_only = [n for n in q if n not in o and n not in prior]

    # round-robin across name-prefix families so one giant family can't
    # monopolize a round's external verification budget
    by_family: dict[str, list[str]] = {}
    for n in pool:
        fam = n.split("_")[0]
        fam = "tpch" if fam.startswith("q") and fam[1:].isdigit() else fam
        by_family.setdefault(fam, []).append(n)
    proposal: list[str] = []
    while len(proposal) < min(n_slots, len(pool)):
        for fam in sorted(by_family):
            if by_family[fam] and len(proposal) < n_slots:
                proposal.append(by_family[fam].pop(0))

    # STALENESS REFRESH (r9 rule): once the never-served pool is
    # smaller than the slot count, the remaining slots re-serve
    # previously-green oracle-backed queries STALEST-FIRST (last
    # external row longest ago). The freshness test enforces that no
    # repeated green is fresher than any green left outside the head —
    # so the proposal must take a whole staleness cohort before
    # touching a fresher one (partial cohorts are fine at the tail
    # boundary only because the test allows ties).
    if len(proposal) < n_slots:
        from rtdl_spark.queries import CANARIES

        last: dict[str, str] = {}
        for r in rounds:
            for n in served[r]:
                last[n] = r
        greens = sorted(
            (
                n
                for n in q
                if n in o
                and n in prior
                and n not in CANARIES
                and verdict.get(n) is True
            ),
            key=lambda n: (last[n], list(q).index(n)),
        )
        refresh = greens[: n_slots - len(proposal)]
        if refresh:
            boundary = last[refresh[-1]]
            cohort = [n for n in greens if last[n] == boundary]
            if len([n for n in refresh if last[n] == boundary]) < len(
                cohort
            ):
                print(
                    f"# NOTE: the {boundary} staleness cohort "
                    f"({len(cohort)} queries) does not fit the "
                    "remaining slots — the freshness test allows this "
                    "tie-split; the rest of the cohort leads next round"
                )
            proposal.extend(refresh)

    nxt = f"r{int(rounds[-1][1:]) + 1}"
    print(f"# rounds served so far: {', '.join(rounds)} "
          f"({len(prior)} distinct names)")
    print(f"# never-served oracle-backed pool: {len(pool)} "
          f"(+{len(rows_only)} rows-only, not rotatable)")
    print(f"# proposed {nxt} ROTATION ({len(proposal)} slots) — paste into "
          f"rtdl_spark/queries/__init__.py::ROTATION:")
    for n in proposal:
        print(f'    "{n}",')
    print(f"# then: DRIVER_SERVED.json[{nxt!r}] = list(CANARIES) + the "
          f"list above ({len(CANARIES)} canaries + {len(proposal)} slots)")


if __name__ == "__main__":
    main()
