"""Board-rotation planner: computes the attestation state from the
committed CORRECTNESS_r*.json artifacts and recommends the next
PRIORITY board — the arithmetic whose by-hand version produced the
stale "353/51" handoff prose that VERDICT r11 #3 flagged.

Usage:
    python tools/board_plan.py [--size 50] [--refresh N]

Prints:
  - registry size and the never-attested queue (in registry insertion
    order — for queries added in the same session this IS addition
    order, the "oldest first" rule);
  - per-round attestation freshness (how stale each green row is);
  - a recommended board: never-attested oldest-first, then (if slots
    remain) oldest-attested refresh rows;
  - the overflow that must be named in the next round's handoff.

The recommendation is an input to the human rotation, not an oracle:
code-changed re-attests (function bodies edited since their last green
row) must be added by hand — git history knows that, this tool does
not.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def attestation_state():
    """(latest_green_round, ever_red) per query from CORRECTNESS files."""
    latest: dict[str, int] = {}
    red: dict[str, int] = {}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(f.rsplit("_r", 1)[1].split(".")[0])
        with open(f) as fh:
            data = json.load(fh)
        for name, row in data.items():
            ok = isinstance(row, dict) and all(
                row.get(k) in (True, None)
                for k in ("rows_match", "schema_match", "hash_match")
            ) and row.get("rows_match") is True
            if ok:
                latest[name] = rnd
            else:
                red[name] = rnd
    return latest, red


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=50, help="board slots")
    ap.add_argument(
        "--refresh",
        type=int,
        default=None,
        help="reserve this many refresh slots (default: whatever remains)",
    )
    args = ap.parse_args()

    import fusionspark.queries as Q

    Q.load_all()
    # Undo the PRIORITY fronting to recover addition order.  PRIORITY
    # members lose their original relative position (the fronting is
    # destructive), but every PRIORITY member is by construction a
    # current-board entry, so the never-attested ranking only depends on
    # the non-PRIORITY tail, where module-load order IS addition order.
    raw = [n for n in Q.REGISTRY if n not in Q.PRIORITY]
    ordered = [n for n in Q.PRIORITY if n in Q.REGISTRY] + raw
    insertion = list(Q.REGISTRY)  # post-fronting (driver's view)
    latest, red = attestation_state()

    never = [n for n in ordered if n not in latest and n not in red]
    changed = [
        n
        for n in getattr(Q, "CODE_CHANGED_NEXT", [])
        if n in Q.REGISTRY and n in latest and n not in never
    ]
    stale = sorted(
        ((latest[n], n) for n in insertion if n in latest and n not in changed),
        key=lambda t: (t[0], insertion.index(t[1])),
    )
    still_red = {n: r for n, r in red.items() if latest.get(n, -1) < r}

    print(f"registry: {len(insertion)}  attested-green: {len(latest)}  "
          f"never-attested: {len(never)}  red-unfixed: {len(still_red)}")
    if still_red:
        print("RED rows needing a fix + board slot:", sorted(still_red))
    print()
    front = never[: args.size]
    overflow = never[args.size:]
    slots_left = args.size - len(front)
    reattest = changed[:slots_left]
    slots_left -= len(reattest)
    refresh_n = slots_left if args.refresh is None else min(
        args.refresh, slots_left
    )
    refresh = [n for _, n in stale[:refresh_n]]
    print(f"recommended board ({len(front)} never-attested"
          + (f" + {len(reattest)} code-changed" if reattest else "")
          + (f" + {len(refresh)} refresh" if refresh else "")
          + "):")
    for n in front:
        print(f"  {n}")
    for n in reattest:
        print(f"  {n}  (code-changed, last green r{latest[n]})")
    for n in refresh:
        print(f"  {n}  (refresh, last green r{latest[n]})")
    if overflow:
        print(f"\noverflow to NEXT round ({len(overflow)}):")
        for n in overflow:
            print(f"  {n}")
    if stale:
        r0, n0 = stale[0]
        print(f"\nstalest attested row: {n0} (r{r0}); "
              f"{sum(1 for r, _ in stale if r == r0)} rows at r{r0}")
    board = front + reattest + refresh
    committed = [n for n in Q.PRIORITY if n in Q.REGISTRY]
    if committed and set(committed) != set(board):
        added_after = [n for n in never if n not in committed]
        print(
            f"\nNOTE: committed PRIORITY differs from this recommendation "
            f"by {len(set(committed) ^ set(board))} entries — expected when "
            f"queries were REGISTERED AFTER the round's rotation "
            f"({len(added_after)} such never-attested entries queue for the "
            f"NEXT board per the mid-round-additions rule), or when "
            f"code-changed re-attests were added by hand."
        )
    print("\nNOTE: the code-changed tier comes from "
          "queries.CODE_CHANGED_NEXT — update that list by hand at each "
          "round's close (git knows what changed; this tool does not).")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
