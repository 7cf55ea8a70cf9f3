"""Mechanically re-point the docs' canonical headline at the latest
driver-captured ``BENCH_r*.json`` (round-4 verdict item 6).

The canonical-figure protocol (PERF.md "Headline") says the quoted
headline is ALWAYS the latest driver capture; rounds 3 and 4 both ended
with docs quoting the previous round's file because the driver captures
AFTER the final commit. This script makes the re-point a one-liner
(``make headline``), and ``tests/test_docs_headline.py`` fails the suite
whenever the quoted figure drifts from the latest committed capture.

Each doc carries the canonical quote on a single line containing the
``BENCH_r*.json`` filename; only those lines are rewritten, token by
token (filename, MP/s, ms/step, GPix/s, ~Nx reference multiple, Nx
north-star multiple, NN.N% exact).
"""

from __future__ import annotations

import json
import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
DOCS = ("PERF.md", "README.md", "STATUS.md")


def latest_bench(root: pathlib.Path = ROOT) -> pathlib.Path:
    files = sorted(root.glob("BENCH_r*.json"))
    if not files:
        raise SystemExit("no BENCH_r*.json captures found")
    return max(files, key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)))


def rewrite_line(line: str, name: str, d: dict) -> str:
    value = float(d["value"])
    line = re.sub(r"BENCH_r\d+\.json", name, line)
    line = re.sub(r"[\d,]+\.\d+ MP/s", f"{value:,.1f} MP/s", line)
    if "per_step_ms" in d:
        line = re.sub(
            r"[\d.]+ ms/step", f"{d['per_step_ms']:g} ms/step", line
        )
    line = re.sub(r"[\d.]+ GPix/s", f"{value / 1000:.1f} GPix/s", line)
    if "vs_baseline" in d:
        line = re.sub(r"~\d+x", f"~{round(float(d['vs_baseline']))}x", line)
        line = re.sub(
            r"\d+x the reference",
            f"{round(float(d['vs_baseline']))}x the reference",
            line,
        )
    line = re.sub(
        r"[\d.]+x the 5 GP/s", f"{value / 5000:.1f}x the 5 GP/s", line
    )
    if "exact_fraction" in d:
        line = re.sub(
            r"[\d.]+% exact", f"{100 * d['exact_fraction']:.1f}% exact", line
        )
    return line


def main() -> int:
    bench = latest_bench()
    d = json.loads(bench.read_text())
    if "parsed" in d:  # driver wrapper shape
        d = d["parsed"]
    changed = []
    for doc in DOCS:
        p = ROOT / doc
        lines = p.read_text().splitlines(keepends=True)
        out = [
            rewrite_line(ln, bench.name, d)
            if re.search(r"BENCH_r\d+\.json", ln) else ln
            for ln in lines
        ]
        if out != lines:
            p.write_text("".join(out))
            changed.append(doc)
    print(f"headline <- {bench.name} ({d['value']:,.1f} MP/s); "
          f"updated: {', '.join(changed) or 'nothing (already current)'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
