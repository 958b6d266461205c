"""Artifact consistency pass (VERDICT r04 item #8): regenerate the
headline throughput/bench numbers in ROADMAP.md from the committed
BENCH_LOCAL.json in ONE step, so prose claims can't drift from the
measured artifact (r04 drift: ROADMAP said app1 30.9k rec/s while
BENCH_LOCAL.json said 25,641 — run-to-run variance across sessions,
frozen at different times).

The generated block lives between the markers below; everything outside
them is hand-written history and never touched.

Usage: python tools/refresh_docs.py        (after the final bench run)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
BEGIN = "<!-- BEGIN GENERATED HEADLINE (tools/refresh_docs.py) -->"
END = "<!-- END GENERATED HEADLINE -->"


def block() -> str:
    b = json.loads((ROOT / "BENCH_LOCAL.json").read_text())
    t = b["throughput"]
    nq = len(b["queries"])
    lines = [
        BEGIN,
        "",
        "## Headline numbers (generated from BENCH_LOCAL.json — do not edit)",
        "",
        f"- bench: **{nq} headline queries in {b['value']:.1f} s** at sf{b['sf']}",
        "- throughput vs BASELINE.md (records/s):",
        f"  app1 **{t['app1_records_per_s']:,}** (ref Spark ~800),"
        f" app2 **{t['app2_records_per_s']:,}** (~760),",
        f"  plugin **{t['app2_plugin_records_per_s']:,}**,"
        f" vectorized **{t['app2_vectorized_records_per_s']:,}**,",
        f"  simple **{t['simple_task_records_per_s']:,}** (~725),"
        f" complex **{t['complex_task_records_per_s']:,}** (~710)",
        "",
        END,
    ]
    return "\n".join(lines)


def main() -> int:
    p = ROOT / "ROADMAP.md"
    text = p.read_text()
    gen = block()
    if BEGIN in text:
        pre = text[: text.index(BEGIN)]
        post = text[text.index(END) + len(END) + 1 :]
        text = pre + gen + "\n" + post
    else:
        # insert right after the H1 line
        lines = text.split("\n", 1)
        text = lines[0] + "\n\n" + gen + "\n" + lines[1]
    p.write_text(text)
    print("ROADMAP.md headline refreshed from BENCH_LOCAL.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
