"""Scaling-efficiency evidence (BASELINE.json north_rule): the SAME
tokens jobs at N and 4N cores on identical input; report throughput at
both plus efficiency eff = (thr_4N / thr_N) / 4. Sandbox stand-in for
N vs 4N executors per the driver instruction.

Two measured engine paths (real paths, not microbenchmarks):

- production — what ``plans.rollup_plan.run_rollup_pipeline`` computes:
  1m tier as Gorilla blocks (compress_tokens, zero shuffle) + 1h/1d
  tiers via the mapInArrow cascade. Output is small (blocks + coarse
  rows), so the measurement is the compute, not a giant row transfer.
- longform — the pure-JVM declarative cascade (posexplode -> LOCF
  window -> tiered groupBys, single shuffle), materializing 1d.

Methodology — this sandbox VM is NOISY (time-varying throughput:
identical trials minutes apart have measured 3x wall-clock spreads)
and its shared DRAM bandwidth saturates near ~8-12 cores for
memory-bound kernels, which no Spark plan can exceed on one box:

1. TWO (N, 4N) pairs are measured: (4, 16) — below the box's DRAM
   saturation knee, the pair that isolates the ENGINE's scaling — and
   (8, 32) — which deliberately crosses the knee and measures the
   box. Trials are INTERLEAVED round-robin over all core counts
   (fresh JVM each trial, warmup inside), so machine drift hits every
   config equally; medians + IQR across ROUNDS rounds are reported.
2. Decomposition is IDENTICAL at every core count (same scan splits,
   same shuffle partition count) so parallelism is the only variable.
3. Next to the Spark numbers we report what this box can scale AT ALL
   (plain multiprocessing, no Spark): a pure-ALU loop AND the
   engine's own Arrow-batch kernels (gorilla.encode_batch, the tier
   reducer). The kernel rows are the per-box ceiling for the matching
   Spark path; hardware-normalized efficiency = Spark eff / kernel
   ceiling eff is the number that transfers to a real cluster, where
   each executor brings its own memory controllers.

Writes BENCH/scaling_last_run.md (override: SCALING_OUT=path).
BENCH/BASELINE.md is CURATED — it holds the adjudicated history plus
per-round addenda; never point SCALING_OUT at it from an automated
run. Usage:
    python BENCH/run_scaling.py [n_series] [rounds]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_TOK = 144
#: levels actually run (override: SCALING_LEVELS="4,16"); decomposition
#: is always sized for MAX_CORES so every level sees identical splits
MAX_CORES = 32
CORE_LEVELS = tuple(int(x) for x in os.environ.get(
    "SCALING_LEVELS", "4,8,16,32").split(","))
PAIRS = tuple((lo, lo * 4) for lo in (2, 4, 8) if lo in CORE_LEVELS
              and lo * 4 in CORE_LEVELS)
#: which engine paths a trial times (skip longform at local[2]: this
#: VM runs 2-core window cascades pathologically slowly — see memory
#: note in BENCH/BASELINE.md r1)
PATHS = tuple(os.environ.get("SCALING_PATHS", "prod,long,fused").split(","))


def _dir_bytes(path: str) -> int:
    return sum(os.path.getsize(os.path.join(path, f))
               for f in os.listdir(path) if f.endswith(".parquet"))


def box_speed_index() -> float:
    """~1 s of fixed single-proc NumPy work (the engine's own encode
    kernel): a box-speed probe taken right before each timed trial.
    This VM's throughput drifts by integer factors over minutes; the
    index lets the report (a) show the drift and (b) flag trials taken
    in a slow phase. Unit: Mpts/s."""
    import numpy as np

    from kapra_spark.functions import gorilla
    rng = np.random.default_rng(1)
    rows, t = 2048, N_TOK
    steps = rng.integers(-3, 4, size=(rows, t))
    vals = np.maximum(0, 50 + np.cumsum(steps, axis=1)).astype(np.int64)
    ts = np.broadcast_to(
        1704067200 + np.arange(t, dtype=np.int64) * 60, (rows, t))
    n, t_end = 0, time.time() + 1.0
    while time.time() < t_end:
        gorilla.encode_batch(ts, vals)
        n += vals.size
    return round(n / (time.time() - t_end + 1.0) / 1e6, 2)


#: reps per trial subprocess / per-subprocess wall cap — override via
#: env (SCALING_REPS, SCALING_TRIAL_TIMEOUT) for big inputs on slow
#: phases of this VM, where 6 reps at a low core count can exceed 1 h
REPS = int(os.environ.get("SCALING_REPS", "6"))
TRIAL_TIMEOUT = int(os.environ.get("SCALING_TRIAL_TIMEOUT", "3600"))


def trial(cpus: int, tokens_path: str, reps: int = REPS
          ) -> tuple[list[float], list[float], list[float], list[float]]:
    """One session: warmup, then ``reps`` timed runs of each path,
    alternating, with a box-speed probe before each pair. Run this in
    a FRESH SUBPROCESS (see main): PySpark python daemons of a stopped
    context can linger and burn CPU, polluting the next trial.

    Why repeated in-session runs: this VM alternates between a healthy
    phase (32-core production run ~2 s) and a degraded phase (same run
    30-90 s, CPU time showing up as SYSTEM time) on a minutes scale.
    Single-shot trials mostly sample the degraded phase; repeating the
    timed section inside one session straddles phases, and the
    per-config minimum recovers the uncontended number."""
    import pyspark.sql.functions as F

    from kapra_spark.operators import rollup as R
    from kapra_spark.operators.compress import compress_tokens
    from kapra_spark.session import get_spark

    # identical decomposition at every core count — same scan splits,
    # same shuffle partition count (sized for the LARGEST config) —
    # so the only variable between N and 4N is parallelism, and no
    # config spills where another doesn't
    split = max(1 << 20, _dir_bytes(tokens_path) // (MAX_CORES * 3))
    spark = get_spark(
        f"scaling_{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=MAX_CORES * 2,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(split),
                    "spark.sql.files.openCostInBytes": "0",
                    "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "48g")})
    spark.sparkContext.setLogLevel("ERROR")
    tokens = spark.read.parquet(tokens_path)
    tokens.count()

    from kapra_spark.operators.compress import compress_and_cascade

    warm = tokens.limit(50_000).cache()
    warm.count()
    compress_tokens(warm).agg(F.sum(F.length("payload"))).collect()
    R.cascade_fast(warm, tiers=("1h", "1d")).groupBy("tier").count().collect()
    compress_and_cascade(warm).groupBy("kind").count().collect()
    R.cascade(warm)["1d"].count()
    warm.unpersist()

    # clean-sample harvesting (SCALING_MIN_BSI, Mpts/s — same unit
    # as the report's bsi column, clean phase ~2.8; 0 = off): the
    # VM's phases oscillate on a sub-minute scale, so a rep whose
    # pre-trial probe reads degraded would only waste minutes producing
    # a wall the min-statistic discards anyway. Skip it (short sleep),
    # up to 3x the requested reps in total attempts, so mixed phases
    # still yield the requested number of phase-vetted samples.
    min_bsi = float(os.environ.get("SCALING_MIN_BSI", "0"))
    prods, longs, fuseds, bsis = [], [], [], []
    attempts, max_attempts = 0, reps * 3
    while len(bsis) < reps and attempts < max_attempts:
        attempts += 1
        probe = box_speed_index()
        if min_bsi > 0 and probe < min_bsi and attempts < max_attempts:
            time.sleep(20)
            continue
        bsis.append(probe)
        if "prod" in PATHS:
            t0 = time.time()
            compress_tokens(tokens).agg(F.sum(F.length("payload"))).collect()
            R.cascade_fast(tokens, tiers=("1h", "1d")).groupBy("tier").count().collect()
            prods.append(round(time.time() - t0, 2))

        if "fused" in PATHS:
            t0 = time.time()
            compress_and_cascade(tokens).agg(
                F.count("*"), F.sum(F.length("payload"))).collect()
            fuseds.append(round(time.time() - t0, 2))

        if "long" in PATHS:
            t0 = time.time()
            R.cascade(tokens)["1d"].count()
            longs.append(round(time.time() - t0, 2))

    spark.stop()
    return prods, longs, fuseds, bsis


# --- OS-level calibration (no Spark): what the box itself can scale ---

def _burn_alu(q):
    x, n, t_end = 0, 0, time.time() + 4
    while time.time() < t_end:
        for _ in range(100000):
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        n += 100000
    q.put(n)


def _mk_tokens_block(rows=4096):
    import numpy as np
    rng = np.random.default_rng(1)
    steps = rng.integers(-3, 4, size=(rows, N_TOK))
    vals = np.maximum(0, 50 + np.cumsum(steps, axis=1)).astype(np.int64)
    ts = np.broadcast_to(
        1704067200 + np.arange(N_TOK, dtype=np.int64) * 60, (rows, N_TOK))
    return ts, vals


def _burn_encode(q):
    """The engine's actual Gorilla encode kernel on Arrow-batch-shaped
    blocks — the ceiling for the production compress path."""
    from kapra_spark.functions import gorilla
    ts, vals = _mk_tokens_block()
    n, t_end = 0, time.time() + 4
    while time.time() < t_end:
        gorilla.encode_batch(ts, vals)
        n += vals.size
    q.put(n)


def _burn_tier(q):
    """The engine's actual cascade kernel (LOCF + 1h/1d tier reduce)."""
    from kapra_spark.operators.rollup import _locf_2d, _tier_reduce
    _, vals = _mk_tokens_block()
    filled, fmask = _locf_2d(vals)
    n, t_end = 0, time.time() + 4
    while time.time() < t_end:
        for mins in (60, 1440):
            _tier_reduce(filled, fmask, mins)
        n += vals.size
    q.put(n)


def calibrate(kind, procs: int) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=kind, args=(q,)) for _ in range(procs)]
    [p.start() for p in ps]
    total = sum(q.get() for _ in ps)
    [p.join() for p in ps]
    return total / 4 / 1e6  # M ops/s aggregate


def _iqr(xs: list[float]) -> float:
    qs = statistics.quantiles(xs, n=4)
    return qs[2] - qs[0]


def main() -> None:
    n_series = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    tokens_path = os.path.join(REPO, ".bench_data",
                               f"tokens_{n_series}_{N_TOK}_f1")

    if not os.path.exists(os.path.join(tokens_path, "_SUCCESS")):
        from kapra_spark import datagen
        from kapra_spark.session import get_spark

        spark = get_spark("gen", master="local[32]")
        spark.sparkContext.setLogLevel("ERROR")
        datagen.tokens_df(spark, n_series, n_tok=N_TOK, fast=True,
                          partitions=max(96, n_series // 10_000)) \
            .write.mode("overwrite").parquet(tokens_path)
        spark.stop()

    import subprocess

    def trial_subprocess(cpus: int) -> tuple[list, list, list, list]:
        """Fresh process per session: guarantees the JVM and every
        pyspark daemon die between sessions (leaked daemons from a
        stopped context otherwise keep burning CPU into the next
        trial's numbers)."""
        code = (
            "import sys, json; sys.path.insert(0, %r); sys.path.insert(0, %r)\n"
            "import run_scaling as rs\n"
            "tp, tl, tf, bsi = rs.trial(%d, %r)\n"
            "print('RESULT ' + json.dumps([tp, tl, tf, bsi]))\n"
            % (REPO, os.path.join(REPO, "BENCH"), cpus, tokens_path))
        out = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                             capture_output=True, text=True,
                             timeout=TRIAL_TIMEOUT)
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                tp, tl, tf, bsi = json.loads(line[len("RESULT "):])
                return tp, tl, tf, bsi
        raise RuntimeError(f"trial cpus={cpus} failed:\n{out.stderr[-2000:]}")

    results: dict[int, dict[str, list[float]]] = {
        c: {"prod": [], "long": [], "fused": [], "bsi": []}
        for c in CORE_LEVELS}
    for rnd in range(rounds):
        for cpus in CORE_LEVELS:  # interleaved: drift hits all configs
            tp, tl, tf, bsi = trial_subprocess(cpus)
            results[cpus]["prod"].extend(tp)
            results[cpus]["long"].extend(tl)
            results[cpus]["fused"].extend(tf)
            results[cpus]["bsi"].extend(bsi)
            print(f"round {rnd} cpus {cpus}: prod {tp} long {tl} "
                  f"fused {tf} (box index {bsi} Mpts/s)", flush=True)

    write_report(n_series, len(results[CORE_LEVELS[0]]["prod"]), results)


def write_report(n_series: int, n_samples: int,
                 results: dict[int, dict[str, list[float]]],
                 run_calibration: bool = True) -> None:
    levels = sorted(results)
    points = n_series * N_TOK
    med = {c: {k: statistics.median(v) for k, v in results[c].items() if v}
           for c in levels}
    # On a shared VM every interference mechanism (CPU steal, DRAM
    # contention from neighbors, scheduler delay) only ADDS wall time,
    # so the per-config minimum over interleaved rounds is the best
    # estimator of the uncontended time; medians + IQR shown alongside
    # for honesty about the spread.
    mins = {c: {k: min(v) for k, v in results[c].items() if v}
            for c in levels}
    spread = {c: {k: round(_iqr(v), 2) for k, v in results[c].items() if v}
              for c in levels}
    thr = {c: {k: round(points / mins[c][k], 1)
               for k in ("prod", "long", "fused") if k in mins[c]}
           for c in levels}

    def eff(path, lo, hi):
        return (thr[hi][path] / thr[lo][path]) / (hi / lo)

    cal = {}
    if run_calibration:
        for name, fn in (("alu", _burn_alu), ("encode_kernel", _burn_encode),
                         ("tier_kernel", _burn_tier)):
            cal[name] = {c: round(calibrate(fn, c), 1) for c in levels}
    else:
        cal = {name: {c: 1.0 for c in levels}
               for name in ("alu", "encode_kernel", "tier_kernel")}

    def cal_eff(name, lo, hi):
        return cal[name][hi] / cal[name][lo] / (hi / lo)

    pairs = [(lo, hi) for lo, hi in PAIRS if lo in levels and hi in levels]

    rows = "\n".join(
        f"| {path} | {c} | {mins[c][k]} | {med[c][k]} | {spread[c][k]} | "
        f"{thr[c][k]:,} | {round(med[c]['bsi'], 2)} |"
        for k, path in (("prod", "production (Gorilla 1m blocks + 1h/1d cascade)"),
                        ("fused", "production FUSED (one scan: blocks + tiers)"),
                        ("long", "longform (declarative cascade, 1 shuffle)"))
        for c in levels if k in mins[c])

    eff_rows = "\n".join(
        f"| {label} | {lo}->{hi} | {eff(k, lo, hi):.3f} | "
        f"{cal_eff('alu' if k == 'long' else 'encode_kernel', lo, hi):.3f} | "
        f"{eff(k, lo, hi) / cal_eff('alu' if k == 'long' else 'encode_kernel', lo, hi):.3f} |"
        for k, label in (("prod", "production"),
                         ("fused", "production-fused"), ("long", "longform"))
        for lo, hi in pairs if k in mins[lo] and k in mins[hi])

    cal_rows = "\n".join(
        f"| {name} | " + " | ".join(str(cal[name][c]) for c in levels)
        + " | " + " | ".join(f"{cal_eff(name, lo, hi):.3f}" for lo, hi in pairs) + " |"
        for name in ("alu", "encode_kernel", "tier_kernel"))

    md = f"""# BENCH/BASELINE.md — scaling efficiency (N vs 4N)

Same jobs, same input ({n_series:,} series x {N_TOK} tokens =
{points:,} points), IDENTICAL decomposition at every core count (same
scan splits, same {MAX_CORES * 2} shuffle partitions) so the
only variable is parallelism. Trials interleaved round-robin over core
counts (fresh subprocess + JVM each, warmed up inside),
{n_samples} timed samples per core count. Efficiency is computed from per-config MINIMUM wall time:
on a shared VM every interference mechanism (CPU steal, neighbor DRAM
traffic, scheduler delay) only ADDS time, so min-of-interleaved-rounds
estimates the uncontended wall; median + IQR are shown for honesty
about the (large) spread this VM exhibits.

| path | cores | min wall (s) | median (s) | IQR (s) | points/sec (min) | box index (Mpts/s) |
| --- | --- | --- | --- | --- | --- | --- |
{rows}

(box index = fixed 1-proc NumPy probe taken immediately before each
trial — a drift detector: a trial whose index is far below the column
median was taken while the VM was in a slow phase. Every trial runs in
a fresh subprocess so no JVM or pyspark daemon leaks across trials.)

**Scaling efficiency, N -> 4N (north_rule target >= 0.8).** Two pairs:
(4 -> 16) sits below this box's shared-DRAM saturation knee (~8-12
cores) and isolates the engine; (8 -> 32) crosses the knee and
measures the box. "kernel ceiling" = the SAME work as plain
multiprocessing with zero Spark, zero coordination, zero shared state
— the hardware bound for that workload class on this VM; normalized =
engine / ceiling (the cluster-relevant number, since each real
executor brings its own memory controllers).

| path | pair | raw eff | kernel ceiling | normalized |
| --- | --- | --- | --- | --- |
{eff_rows}

**Calibration (plain multiprocessing, M ops/s aggregate):**

| workload | {' | '.join(str(c) + 'p' for c in levels)} | {' | '.join(f'eff {lo}->{hi}' for lo, hi in pairs)} |
| --- |{' --- |' * (len(levels) + len(pairs))}
{cal_rows}

Reference single-node baseline (BASELINE.md): kapra ~1,879 points/s on
palestine; every Spark row above exceeds it by orders of magnitude.

Raw: {json.dumps({'median_sec': med, 'iqr_sec': spread, 'throughput': thr, 'all_runs': results, 'calibration_Mops': cal})}
"""
    out = os.environ.get(
        "SCALING_OUT", os.path.join(REPO, "BENCH", "scaling_last_run.md"))
    with open(out, "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
