#!/usr/bin/env python3
"""Regenerate the measured section of BENCH_NOTES.md from a bench artifact.

The bench artifact is the one-line JSON `graft.Bench` prints:
  {"metric":"total","value":N,"unit":"sec","queries":{...},
   "queries_cold":{...}?,"errors":{...},"sf":"..."}

Usage:
  tools/bench_notes.py BENCH_builder_r5.json            # print the block
  tools/bench_notes.py BENCH_builder_r5.json --update   # splice into BENCH_NOTES.md

With --update the block between `<!-- bench:begin -->` and
`<!-- bench:end -->` in BENCH_NOTES.md is replaced byte-for-byte with the
generated text, so the notes' numbers can never drift from the artifact.
"""
import json
import sys
from pathlib import Path

BEGIN = "<!-- bench:begin -->"
END = "<!-- bench:end -->"


def render(artifact_path: str) -> str:
    raw = Path(artifact_path).read_text().strip().splitlines()
    # artifact may carry log lines; the payload is the last JSON object line
    payload = next(l for l in reversed(raw) if l.startswith("{"))
    b = json.loads(payload)
    warm = b.get("queries", {})
    cold = b.get("queries_cold", {})
    errors = b.get("errors", {})
    lines = []
    lines.append(f"Artifact: `{Path(artifact_path).name}` (sf dir `{b.get('sf', '?')}`).")
    total_warm = sum(warm.values())
    n = len(warm)
    med = sorted(warm.values())[n // 2] if n else 0.0
    if cold:
        total_cold = sum(cold.values())
        lines.append(
            f"**{n} queries — cold {total_cold:.1f} s total, steady-state "
            f"(min of repeats) {total_warm:.1f} s total, warm median "
            f"{med:.2f} s/query.**")
    else:
        lines.append(
            f"**{n} queries — {total_warm:.1f} s total, median {med:.2f} s/query** "
            f"(single run: cold == steady).")
    if errors:
        lines.append("")
        lines.append(f"**ERRORS ({len(errors)})** — excluded from totals:")
        for k in sorted(errors):
            lines.append(f"- `{k}`: {errors[k].splitlines()[0][:160]}")
    lines.append("")
    lines.append("The 10 slowest, cold/warm seconds:")
    lines.append("")
    lines.append("| query | cold | warm |")
    lines.append("|---|---|---|")
    ranked = sorted(warm, key=lambda q: -warm[q])[:10]
    for q2 in ranked:
        c = f"{cold[q2]:.2f}" if q2 in cold else "—"
        lines.append(f"| {q2} | {c} | {warm[q2]:.2f} |")
    return "\n".join(lines)


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    block = render(sys.argv[1])
    if "--update" in sys.argv:
        notes = Path(__file__).resolve().parent.parent / "BENCH_NOTES.md"
        text = notes.read_text()
        if BEGIN not in text or END not in text:
            sys.exit(f"markers {BEGIN} / {END} not found in {notes}")
        head, rest = text.split(BEGIN, 1)
        _, tail = rest.split(END, 1)
        notes.write_text(head + BEGIN + "\n" + block + "\n" + END + tail)
        print(f"updated {notes}")
    else:
        print(block)


if __name__ == "__main__":
    main()
