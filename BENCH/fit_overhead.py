"""Fit t(c) = F + W/c to per-core-count minimum wall times from
run_scaling logs — separating the per-rep FIXED cost F (job submit,
driver round-trips, Python-worker handshakes; does not shrink with
cores) from the parallelizable WORK W.

Why this matters for the north rule: measured raw efficiency between
two core counts on a small input is dominated by F — eff(N->4N) =
(F + W/N) / (4F + W/N) -> 1/(4) * ... -> limited by F/W, NOT by the
engine's shuffle/partition structure (the plans are zero-Exchange).
The model makes that quantitative: with the fitted F and W one can
predict eff at any input size, and the prediction is testable against
the other sweep sizes. At cluster scale W grows with data per
executor while F stays per-job-constant, so W >> F and eff -> the
kernel ceiling.

Usage: python BENCH/fit_overhead.py <log> [<log> ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])

from regen_report import parse_logs  # noqa: E402


def fit(points: list[tuple[int, float]]) -> tuple[float, float]:
    """Least squares for t = F + W * (1/c) over (c, t) points."""
    xs = [1.0 / c for c, _ in points]
    ys = [t for _, t in points]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    w = sxy / sxx if sxx else 0.0
    f = my - w * mx
    return f, w


def eff(f: float, w: float, lo: int, hi: int) -> float:
    return (f + w / lo) / (f + w / hi) / (hi / lo)


def main() -> None:
    results = parse_logs(sys.argv[1:])
    levels = sorted(results)
    print(f"levels: {levels}")
    for path in ("prod", "fused", "long"):
        pts = [(c, min(results[c][path])) for c in levels
               if results[c].get(path)]
        if len(pts) < 2:
            continue
        f, w = fit(pts)
        print(f"\n{path}: min walls {[(c, round(t, 2)) for c, t in pts]}")
        print(f"  fitted F (fixed per rep) = {f:.2f} s, "
              f"W (serial work) = {w:.2f} s")
        for lo, hi in ((2, 8), (4, 16)):
            if lo in levels and hi in levels:
                print(f"  model eff {lo}->{hi}: {eff(f, w, lo, hi):.3f} "
                      f"(measured {(min(results[lo][path]) / min(results[hi][path]) / (hi / lo)):.3f})"
                      if results[lo].get(path) and results[hi].get(path)
                      else "")
        # what the same F/W predicts if the input (W) were 10x / 100x
        for mult in (10, 100):
            pairs = [(lo, hi) for lo, hi in ((2, 8), (4, 16))
                     if lo in levels and hi in levels]
            preds = ", ".join(f"{lo}->{hi} {eff(f, w * mult, lo, hi):.3f}"
                              for lo, hi in pairs)
            print(f"  predicted eff at {mult}x input: {preds}")


if __name__ == "__main__":
    main()
