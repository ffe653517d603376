"""Benchmark driver: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>, ...extras}

The tokens-cascade queries run over a deterministic synthetic tokens
table (BASELINE.json input_hint shape) generated once into
.bench_data/ and reused; points/sec per retention tier is reported in
the extras (BASELINE.md's headline metric).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def ensure_tokens(spark, n: int, n_tok: int, path: str) -> tuple[float, bool]:
    """Generate the bench tokens table if absent; returns (wall seconds
    spent generating — 0.0 when the cached copy is reused, generated?).
    Uses the vectorized counter-stream generator (datagen fast path).
    NEVER regenerates an existing table (round-4 lesson: a silent
    regeneration mid-series broke round-over-round comparability);
    delete the directory explicitly to regenerate, and the digest in
    the bench JSON will record that the input changed."""
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return 0.0, False
    from kapra_spark import datagen

    print(f"bench: generating NEW input table at {path} — "
          f"round-over-round comparability resets here", file=sys.stderr)
    parts = max(64, n // 10_000)
    t0 = time.time()
    datagen.tokens_df(spark, n, n_tok=n_tok, partitions=parts, fast=True) \
        .write.mode("overwrite").parquet(path)
    return round(time.time() - t0, 3), True


def input_digest(path: str) -> str:
    """md5 over the byte-concatenation of the table's part files in
    sorted name order — pins the EXACT input identity in the bench
    JSON so a regenerated (even distributionally-identical) table is
    visible as a digest change. ~30 MB at sf0.1: negligible cost."""
    import hashlib

    h = hashlib.md5()
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        with open(os.path.join(path, name), "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
    return h.hexdigest()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_from_dir(sf_dir)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from kapra_spark.session import get_spark

    # small-file inputs must still yield >= 3 scan tasks per core —
    # Spark's default 128 MB maxPartitionBytes would pack the whole
    # bench input into one task (at 100 TB file granularity does this
    # for free)
    spark = get_spark("kapra_bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8) * 2,
                      extra_conf={
                          "spark.sql.files.maxPartitionBytes": str(1 << 20),
                          "spark.sql.files.openCostInBytes": "0"})
    spark.sparkContext.setLogLevel("ERROR")

    n_series = max(1000, int(1_000_000 * sf))
    n_tok = 144
    # SPARK_GRAFT_BENCH_TOKENS overrides the input table — used for
    # input-attribution A/B runs (e.g. the r3-era legacy-generator
    # table vs the pinned _f1 table on the same box phase); the digest
    # in the JSON records which table actually ran
    tokens_path = os.environ.get(
        "SPARK_GRAFT_BENCH_TOKENS",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_data", f"tokens_{n_series}_{n_tok}_f1"))
    setup_gen_sec, generated = ensure_tokens(spark, n_series, n_tok,
                                             tokens_path)

    import __spark_entry__ as E
    from kapra_spark.operators import rollup as R

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}
    queries: list[tuple[str, object]] = []

    def timed(name: str, fn) -> None:
        # registration only; execution is interleaved in rounds below
        # (BENCH/run_scaling.py methodology: this VM's throughput is
        # bimodal on a minutes scale, so per-query sequential repeats
        # can pin one query entirely inside a degraded phase — rounds
        # that cycle through ALL queries straddle phases, and the
        # per-query MIN across rounds estimates the uncontended time;
        # interference only ever ADDS wall time)
        queries.append((name, fn))

    def box_speed_index() -> float:
        """1-s single-thread NumPy probe (Mops/s) — drift detector."""
        import numpy as np
        a = np.arange(1 << 16, dtype=np.int64)
        n, t_end = 0, time.time() + 0.5
        while time.time() < t_end:
            (a * 3 + 1).sum()
            n += a.size
        return round(n / (time.time() - t_end + 0.5) / 1e6, 1)

    def run_rounds(rounds: int) -> None:
        probes = []
        for _ in range(rounds):
            probes.append(box_speed_index())
            for name, fn in queries:
                t0 = time.time()
                fn()
                dt = time.time() - t0
                if name not in timings or dt < timings[name]:
                    timings[name] = round(dt, 3)
        extras["box_index_per_round"] = probes

    tokens = spark.read.parquet(tokens_path)
    total_points = n_series * n_tok

    # warm up the JVM + Python workers so timings measure the
    # operators, not process spawn / codegen compilation
    tokens.limit(1000).mapInPandas(lambda it: it, tokens.schema).count()
    tokens.count()

    # q1: all-tier cascade, zero-shuffle fast path
    def q_fast():
        rows = R.cascade_fast(tokens).groupBy("tier").count().collect()
        extras["rollup_rows_fast"] = int(sum(r["count"] for r in rows))

    timed("tokens_cascade_fast", q_fast)

    # q2: long-form cascade (single-shuffle plan), materialize 1d tier
    def q_long():
        tiers = R.cascade(tokens)
        extras["rollup_rows_1d"] = tiers["1d"].count()

    timed("tokens_cascade_longform", q_long)

    # q2b: production path — 1m tier as Gorilla blocks + 1h/1d rows
    from pyspark.sql import functions as F

    from kapra_spark.operators.compress import compress_tokens

    def q_prod():
        blocks = compress_tokens(tokens)
        st = blocks.agg(F.sum(F.length("payload")).alias("b"),
                        F.sum("n").alias("p")).collect()[0]
        extras["gorilla_bits_per_point"] = round(st["b"] * 8 / st["p"], 2)
        R.cascade_fast(tokens, tiers=("1h", "1d")).groupBy("tier").count().collect()

    timed("tokens_compress_plus_rollup", q_prod)

    # q2c: FUSED production path — blocks + tiers in ONE scan/Arrow pass
    from kapra_spark.operators.compress import compress_and_cascade

    def q_fused():
        fused = compress_and_cascade(tokens, tiers=("1h", "1d"))
        fused.groupBy("kind").agg(
            F.count("*").alias("rows"),
            F.sum(F.length("payload")).alias("bytes")).collect()

    timed("tokens_production_fused", q_fused)

    # q3/q4: events rollup + gap-fill on driver testdata
    timed("events_rollup_1h", lambda: E.q_rollup_1h_events(spark, sf_dir).count())
    timed("events_gapfill_locf", lambda: E.q_gapfill_locf_events(spark, sf_dir).count())

    # q5/q6: envelope + VL group aggregates on lineitem
    timed("envelope_groups", lambda: E.q_envelope_groups(spark, sf_dir).count())
    timed("vl_groups", lambda: E.q_vl_groups(spark, sf_dir).count())

    # q7: broadcast join
    timed("join_broadcast", lambda: E.q_join_broadcast(spark, sf_dir).count())

    # clamp to >= 1: ROUNDS=0 would leave `timings` empty and the
    # points_per_sec extras below would KeyError. Default 6: the box's
    # throughput is bimodal on a minutes scale and min-of-3 proved too
    # few samples to straddle a degraded phase (round-4 regression was
    # phase noise, not plan change)
    run_rounds(max(1, int(os.environ.get("SPARK_GRAFT_BENCH_ROUNDS", "6"))))

    # PNG decode throughput (directive: measured MB/s for the
    # vectorized unfilter) — one 256x256 RGB image per filter type
    # 0/1/2, decoded in a loop for ~0.4 s
    from kapra_spark.operators.multimodal import png_decode, png_encode
    import numpy as np

    img = (np.arange(256 * 256 * 3, dtype=np.int64) * 2654435761 % 256) \
        .astype(np.uint8).reshape(256, 256, 3)
    pngs = [png_encode(img, filter_type=ft) for ft in (0, 1, 2)]
    raw_mb = img.nbytes / 1e6
    n_dec, t_end = 0, time.time() + 0.4
    t0 = time.time()
    while time.time() < t_end:
        for p in pngs:
            png_decode(p)
        n_dec += len(pngs)
    extras["png_decode_mbps"] = round(n_dec * raw_mb / (time.time() - t0), 1)

    # AVI raw-DIB decode throughput — 12 frames of 128x127 RGB (odd
    # width exercises the stride-padded path), decoded for ~0.4 s
    from kapra_spark.operators.multimodal import avi_decode, avi_encode

    fr = (np.arange(12 * 128 * 127 * 3, dtype=np.int64) * 2654435761
          % 256).astype(np.uint8).reshape(12, 128, 127, 3)
    avi = avi_encode(fr, fps=24)
    raw_mb = fr.nbytes / 1e6
    n_dec, t_end = 0, time.time() + 0.4
    t0 = time.time()
    while time.time() < t_end:
        avi_decode(avi)
        n_dec += 1
    extras["avi_decode_mbps"] = round(n_dec * raw_mb / (time.time() - t0), 1)

    # MJPG decode throughput — the same frames as baseline JPEGs
    # (functions/jpeg.py through the AVI path), decoded for ~0.4 s
    mj = avi_encode(fr, fps=24, codec="MJPG", quality=85)
    n_dec, t_end = 0, time.time() + 0.4
    t0 = time.time()
    while time.time() < t_end:
        avi_decode(mj)
        n_dec += 1
    extras["mjpg_decode_mbps"] = round(n_dec * raw_mb / (time.time() - t0), 1)

    # BPE encode throughput (kernel path the mapInPandas batches run):
    # deterministic pseudo-text, merges trained on it, ~0.4 s encode
    from kapra_spark.operators.bpe import (_encode_word, _train_merges,
                                           _WORD_RE)
    import re as _re

    rng_words = [f"w{(i * 2654435761) % 997:03d}" for i in range(400)]
    text = " ".join(rng_words[i % 400] for i in range(20_000))
    wre = _re.compile(_WORD_RE)
    words = wre.findall(text)
    freqs: dict = {}
    for w in words:
        freqs[w] = freqs.get(w, 0) + 1
    ranks = {p: i for i, p in enumerate(_train_merges(freqs, 200))}
    n_words, t_end = 0, time.time() + 0.4
    t0 = time.time()
    while time.time() < t_end:
        cache: dict = {}          # cold per pass: measures the encode
        for w in words:           # kernel, not the memo-hit dict read
            if w not in cache:
                cache[w] = _encode_word(w, ranks)
        n_words += len(words)
    extras["bpe_encode_mwords_s"] = round(
        n_words / (time.time() - t0) / 1e6, 2)

    extras["points_per_sec_fast"] = round(
        total_points / timings["tokens_cascade_fast"], 1)
    extras["points_per_sec_longform"] = round(
        total_points / timings["tokens_cascade_longform"], 1)
    extras["points_per_sec_production"] = round(
        total_points / timings["tokens_compress_plus_rollup"], 1)
    extras["points_per_sec_production_fused"] = round(
        total_points / timings["tokens_production_fused"], 1)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "rolled-up points/sec per retention tier (tokens cascade) + headline query wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "setup_gen_sec": setup_gen_sec,
        "input_generated_this_run": generated,
        "tokens_input_digest": input_digest(tokens_path),
        "n_series": n_series,
        "n_tok": n_tok,
        **extras,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
