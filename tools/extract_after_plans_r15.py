"""Round-close helper: refresh plans/r15/<row>_after.txt for every row
that has a _before capture, from the just-written BENCH_PLANTEXT.json
(the final bench's normalized formatted plans — same normalization as
the _before files, which were extracted from the baseline run's
plantext). Rows absent from the plantext keep their measure_r15-captured
after files.

Usage: python tools/extract_after_plans_r15.py
"""

from __future__ import annotations

import json
from pathlib import Path

repo = Path(__file__).resolve().parent.parent
pt = json.loads((repo / "BENCH_PLANTEXT.json").read_text())
r15 = repo / "plans" / "r15"
for before in sorted(r15.glob("*_before.txt")):
    row = before.name.removesuffix("_before.txt")
    if row in pt:
        (r15 / f"{row}_after.txt").write_text(pt[row])
        print("refreshed", row)
    else:
        print("kept measure_r15 capture for", row)
