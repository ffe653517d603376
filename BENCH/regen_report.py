"""Rebuild BENCH/BASELINE.md from one or more run_scaling logs.

run_scaling only writes the report when every round completes; this
tool recovers a report from the per-session progress lines of any
(possibly killed) run, merging multiple logs of the SAME input size.

Usage: python BENCH/regen_report.py <n_series> <log> [<log> ...]
       [--no-calibration]
"""

from __future__ import annotations

import ast
import re
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, __file__.rsplit("/", 1)[0])

LINE = re.compile(
    r"round (\d+) cpus (\d+): prod (\[[^\]]*\]) long (\[[^\]]*\])"
    r"(?: fused (\[[^\]]*\]))? "
    r"\(box index (\[[^\]]*\]) Mpts/s\)")


def parse_logs(paths: list[str]) -> dict[int, dict[str, list[float]]]:
    results: dict[int, dict[str, list[float]]] = {}
    for path in paths:
        text = open(path).read().replace("\r", "\n")
        for m in LINE.finditer(text):
            cpus = int(m.group(2))
            slot = results.setdefault(
                cpus, {"prod": [], "long": [], "fused": [], "bsi": []})
            slot["prod"].extend(ast.literal_eval(m.group(3)))
            slot["long"].extend(ast.literal_eval(m.group(4)))
            if m.group(5):
                slot["fused"].extend(ast.literal_eval(m.group(5)))
            slot["bsi"].extend(ast.literal_eval(m.group(6)))
    return results


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--no-calibration"]
    run_cal = "--no-calibration" not in sys.argv
    n_series = int(args[0])
    results = parse_logs(args[1:])
    if not results:
        raise SystemExit("no progress lines found")

    import run_scaling as rs
    rs.write_report(n_series, len(next(iter(results.values()))["prod"]),
                    results, run_calibration=run_cal)


if __name__ == "__main__":
    main()
