"""CLI with the reference's argv shape (README.md:38-48,
k_P_anonymity.py:28-44):

    spark-submit --py-files kapra_spark.zip -m kapra_spark.cli \\
        <algorithm> <k_value> <p_value> <paa_value> <l_value> <input>

``input`` is a parquet (or Iceberg) tokens table
(doc_id, tokens:array<int32>, n_tok, source); the reference's wide-CSV
files are ingested with ``kapra_spark.sources.csv_compat``.
"""

from __future__ import annotations

import json
import sys


def main(argv: list[str] | None = None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 6:
        print("usage: kapra_spark.cli <algorithm:naive|kapra> <k> <P> <paa> <l> "
              "<input parquet> [output parquet] [results parquet]",
              file=sys.stderr)
        return 2
    algorithm, k, p, paa, l, inp = argv[:6]
    out = argv[6] if len(argv) > 6 else None
    res = argv[7] if len(argv) > 7 else None
    k, p, paa, l = int(k), int(p), int(paa), int(l)
    if algorithm not in ("naive", "kapra"):
        print("algorithm must be 'naive' or 'kapra'", file=sys.stderr)
        return 2
    if k < p:
        print("<k_value> must be >= <p_value>", file=sys.stderr)
        return 2

    from .plans.anonymize_plan import run_kp_anonymity
    from .session import get_spark

    spark = get_spark(f"kp_{algorithm}")
    tokens = spark.read.parquet(inp)
    row = run_kp_anonymity(spark, algorithm, k, p, paa, l, tokens,
                           output_path=out, results_path=res)
    print(json.dumps(row))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
