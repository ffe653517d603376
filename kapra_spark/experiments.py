"""Experiment-grid runner — the engine equivalent of the reference's
``experiments/__main__.py`` (reference experiments/__main__.py:7-26:
k_P_pairs x ALGORITHMS x DATASETS with per-cell error capture).

The reference shells out one ``python k_P_anonymity.py ...`` process
per cell via ProcessPoolExecutor; here every cell runs inside ONE
SparkSession (the cluster is the parallelism) and appends its 1-row
metrics record to a results parquet, so the sweep is resumable and the
results table accumulates across runs exactly like the reference's
stdout logs — but queryable.

Usage (mirrors the reference's defaults):

    python -m kapra_spark.experiments <tokens.parquet> [results.parquet]

or programmatically with any grid::

    run_grid(spark, {"mydata": tokens_df}, results_path="...")
"""

from __future__ import annotations

import json
import sys
import traceback

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .plans.anonymize_plan import run_kp_anonymity

#: explicit results schema: single-dict inference would fail on a None
#: metric and drift the parquet schema across appends
RESULTS_SCHEMA = T.StructType([
    T.StructField("algorithm", T.StringType()),
    T.StructField("k", T.IntegerType()),
    T.StructField("p", T.IntegerType()),
    T.StructField("paa", T.IntegerType()),
    T.StructField("l", T.IntegerType()),
    T.StructField("eta", T.DoubleType()),
    T.StructField("tot_pattern_loss", T.DoubleType()),
    T.StructField("avg_pattern_loss", T.DoubleType()),
    T.StructField("tot_value_loss", T.DoubleType()),
    T.StructField("avg_value_loss", T.DoubleType()),
    T.StructField("dataset", T.StringType()),
])

#: reference experiments/__main__.py:7-12
K_P_PAIRS = [(16, 9), (64, 6), (128, 6), (16, 12)]
#: reference experiments/__main__.py:14-15
L_DEFAULT = 1
PAA_DEFAULT = 6
#: reference experiments/__main__.py:23-26
ALGORITHMS = ["naive", "kapra"]


def run_grid(
    spark: SparkSession,
    datasets: dict[str, DataFrame],
    algorithms: list[str] | None = None,
    k_p_pairs: list[tuple[int, int]] | None = None,
    paa: int = PAA_DEFAULT,
    l: int = L_DEFAULT,
    results_path: str | None = None,
) -> tuple[list[dict], list[dict]]:
    """Run the (dataset x algorithm x (k,P)) grid; returns
    (results, errors). Each result row is the anonymize plan's metrics
    record plus the dataset name; each error row captures the failing
    cell and its traceback (the reference collects per-dataset error
    lists, experiments/__main__.py:33-48)."""
    algorithms = algorithms if algorithms is not None else ALGORITHMS
    k_p_pairs = k_p_pairs if k_p_pairs is not None else K_P_PAIRS

    results: list[dict] = []
    errors: list[dict] = []
    for name, tokens in datasets.items():
        for algo in algorithms:
            for k, p in k_p_pairs:
                try:
                    row = run_kp_anonymity(
                        spark, algo, k, p, paa, l, tokens,
                        results_path=None)
                    row["dataset"] = name
                    results.append(row)
                    if results_path:
                        norm = [{f.name: row.get(f.name)
                                 for f in RESULTS_SCHEMA.fields}]
                        (spark.createDataFrame(norm, schema=RESULTS_SCHEMA)
                         .write.mode("append").parquet(results_path))
                except Exception:
                    errors.append({
                        "dataset": name, "algorithm": algo, "k": k, "p": p,
                        "error": traceback.format_exc(limit=5),
                    })
    return results, errors


def write_statfile(results: list[dict], metric: str, fixed_param: str,
                   fixed_value: int, path: str) -> None:
    """Emit the reference's statfile format (utils/draw_stat_plots.py:
    header ``<metric> <fixed_param> <fixed_value>``, rows
    ``<algorithm> <value> <tuned_param_value> <dataset>``) from grid
    results, so the reference's own plotting script can chart engine
    runs unchanged."""
    tuned = "P" if fixed_param.upper() == "K" else "K"
    fixed_key = "k" if fixed_param.upper() == "K" else "p"
    tuned_key = "p" if tuned == "P" else "k"
    lines = [f"{metric} {fixed_param.upper()} {fixed_value}"]
    for r in results:
        if r[fixed_key] != fixed_value or metric not in r:
            continue
        lines.append(f"{r['algorithm']} {r[metric]} {r[tuned_key]} "
                     f"{r.get('dataset', 'unknown')}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def main(argv: list[str] | None = None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 1:
        print("usage: kapra_spark.experiments <tokens parquet> "
              "[results parquet]", file=sys.stderr)
        return 2
    inp = argv[0]
    results_path = argv[1] if len(argv) > 1 else None

    from .session import get_spark

    spark = get_spark("kp_experiments")
    tokens = spark.read.parquet(inp)
    name = inp.rstrip("/").rsplit("/", 1)[-1]
    results, errors = run_grid(spark, {name: tokens},
                               results_path=results_path)
    for row in results:
        print(json.dumps(row))
    if errors:
        print(f"Found {len(errors)} errors with dataset {name}",
              file=sys.stderr)
        for e in errors:
            print(json.dumps(e), file=sys.stderr)
    else:
        print(f"No errors found with dataset {name}", file=sys.stderr)
    spark.stop()
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
