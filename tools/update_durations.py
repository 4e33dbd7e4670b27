"""Refresh tools/test_durations.txt from shard logs (VERDICT r06 #7).

Parses the ``--durations=0`` section each shard emits (lines like
``12.34s call tests/test_x.py::test_y``) and sums call+setup+teardown
per FILE — the quantity the bin-packer balances. Only rewrites entries
for files that appear in the logs, so a partial run never zeroes the
rest of the table.

Usage: python tools/update_durations.py /tmp/willa_test_logs
"""

from __future__ import annotations

import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from shard_plan import TABLE, load_table

LINE = re.compile(r"^\s*([0-9.]+)s\s+(?:call|setup|teardown)\s+(tests/[^:]+)::")


def main(logdir: str) -> int:
    totals: dict[str, float] = {}
    for log in glob.glob(os.path.join(logdir, "shard*.log")):
        for line in open(log, errors="replace"):
            m = LINE.match(line)
            if m:
                totals[m.group(2)] = totals.get(m.group(2), 0.0) + float(m.group(1))
    if not totals:
        print("update_durations: no duration lines found; table unchanged")
        return 0
    table = load_table()
    table.update({f: round(t, 1) for f, t in totals.items()})
    with open(TABLE, "w") as f:
        for name in sorted(table):
            f.write(f"{table[name]} {name}\n")
    print(f"update_durations: refreshed {len(totals)} of {len(table)} entries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/willa_test_logs"))
