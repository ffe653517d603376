"""Time every declared query (Spark side only, noop sink where
possible) at a given sf dir — the per-operator examination evidence for
OPTIMIZATION_r06.md. Not part of the driver contract.

Usage: python tools/time_queries_r06.py [sf_dir] [rounds]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    import __spark_entry__ as E
    from kapra_spark.session import get_spark

    spark = get_spark("time_queries", master="local[32]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    # warm the Python worker path once
    spark.range(1000).mapInPandas(lambda it: it, "id long").count()

    qs = E.queries()
    times: dict[str, float] = {}
    errs: dict[str, str] = {}
    for _ in range(rounds):
        for name, fn in qs.items():
            spark.sparkContext.setJobDescription(f"time:{name}")
            t0 = time.time()
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            except Exception as ex:  # streaming/self-materializing queries
                try:
                    fn(spark, sf_dir).collect()
                except Exception as ex2:
                    errs[name] = f"{type(ex).__name__}/{type(ex2).__name__}"
                    continue
            dt = round(time.time() - t0, 3)
            if name not in times or dt < times[name]:
                times[name] = dt
    print(json.dumps({"sf_dir": sf_dir, "rounds": rounds,
                      "times_sec_min": dict(sorted(times.items(),
                                                   key=lambda kv: -kv[1])),
                      "errors": errs}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
