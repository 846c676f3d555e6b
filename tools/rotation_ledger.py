"""Per-query driver-certification ledger (r4 verdict #6): for every
query declared in ``__spark_entry__.queries()``, the last round whose
driver ``CORRECTNESS_r*.json`` shows it fully green (rows + schema +
hash all matching), so window planning reads a table instead of doing
archaeology over the per-round files.

Usage:  python tools/rotation_ledger.py            # markdown table
        python tools/rotation_ledger.py --summary  # one-line counts

The table is pasted into SURVEY.md §8 each round (the sweep
regenerates it). ``declared #`` is the 1-based declaration position —
the driver certifies a ~50-query prefix, so positions ≤ 50 are the
current window.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _rounds() -> list[tuple[int, dict]]:
    out = []
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            out.append((int(m.group(1)), json.load(f)))
    return out


def _green(row: dict) -> bool:
    return bool(
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match")
    )


def ledger() -> list[tuple[int, str, str, str]]:
    """(position, query, last-green round or '—', note)."""
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    declared = list(entry.queries())
    rounds = _rounds()
    rows = []
    for i, q in enumerate(declared, 1):
        last_green, last_seen, fail_note = None, None, ""
        for rnd, data in rounds:
            if q not in data:
                continue
            last_seen = rnd
            if _green(data[q]):
                last_green = rnd
            else:
                fail_note = f"r{rnd}: not green"
        if last_green is None:
            note = "never driver-certified" if last_seen is None else fail_note
            rows.append((i, q, "—", note))
        else:
            note = ""
            if last_seen is not None and last_seen > last_green:
                note = f"FAILED r{last_seen}"
            rows.append((i, q, f"r{last_green}", note))
    return rows


def main() -> None:
    rows = ledger()
    if "--summary" in sys.argv:
        never = sum(1 for r in rows if r[2] == "—")
        failed = sum(1 for r in rows if r[3].startswith("FAILED"))
        print(
            f"{len(rows)} declared, {len(rows) - never} ever driver-green, "
            f"{never} never certified, {failed} green-then-failed"
        )
        return
    print("| # | query | last driver-green | note |")
    print("|---|---|---|---|")
    for i, q, g, note in rows:
        print(f"| {i} | {q} | {g} | {note} |")


if __name__ == "__main__":
    main()
