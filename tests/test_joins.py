"""As-of / range join tests: semantics vs pandas.merge_asof, tie and
tolerance handling, and the no-nested-loop plan guarantee."""

import pandas as pd
import pyspark.sql.functions as F
import pytest

from kapra_spark.operators.joins import asof_join, range_join


@pytest.fixture(scope="module")
def sides(spark):
    left = pd.DataFrame({
        "k": ["a"] * 4 + ["b"] * 3 + ["c"] * 2,
        "ts": pd.to_datetime([
            "2024-01-01 00:00:05", "2024-01-01 00:01:00",
            "2024-01-01 00:10:00", "2024-01-01 02:00:00",
            "2024-01-01 00:00:30", "2024-01-01 00:02:00", "2024-01-01 09:00:00",
            "2024-01-01 00:00:01", "2024-01-01 00:00:02",
        ]),
        "lv": list(range(9)),
    })
    right = pd.DataFrame({
        "k": ["a", "a", "a", "b", "b", "z"],
        "ts": pd.to_datetime([
            "2024-01-01 00:00:05",   # exact tie with left a@00:00:05
            "2024-01-01 00:05:00",
            "2024-01-01 01:00:00",
            "2024-01-01 00:01:00",
            "2024-01-01 08:00:00",
            "2024-01-01 00:00:00",   # key with no left rows
        ]),
        "rv": [10, 20, 30, 40, 50, 60],
    })
    return (left, right,
            spark.createDataFrame(left), spark.createDataFrame(right))


def _expected(left, right, tolerance=None):
    kw = {"tolerance": pd.Timedelta(seconds=tolerance)} if tolerance else {}
    return pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts"),
        on="ts", by="k", direction="backward", **kw
    ).sort_values("lv").reset_index(drop=True)


def test_asof_matches_pandas_left(spark, sides):
    left, right, ldf, rdf = sides
    got = (asof_join(ldf, rdf, by="k", how="left")
           .orderBy("lv").toPandas())
    exp = _expected(left, right)
    assert list(got["lv"]) == list(exp["lv"])
    assert got["r_rv"].where(got["r_rv"].notna(), -1).tolist() == \
        exp["rv"].where(exp["rv"].notna(), -1).tolist()


def test_asof_inner_drops_unmatched(spark, sides):
    left, right, ldf, rdf = sides
    got = asof_join(ldf, rdf, by="k", how="inner").toPandas()
    exp = _expected(left, right)
    assert len(got) == int(exp["rv"].notna().sum())
    # ties match: left a@00:00:05 pairs with right a@00:00:05
    tie = got[got["lv"] == 0]
    assert tie["r_rv"].iloc[0] == 10


def test_asof_tolerance(spark, sides):
    left, right, ldf, rdf = sides
    got = (asof_join(ldf, rdf, by="k", how="left", tolerance_seconds=120)
           .orderBy("lv").toPandas())
    exp = _expected(left, right, tolerance=120)
    assert got["r_rv"].where(got["r_rv"].notna(), -1).tolist() == \
        exp["rv"].where(exp["rv"].notna(), -1).tolist()


def test_asof_plan_has_no_nested_loop(spark, sides):
    _, _, ldf, rdf = sides
    plan = asof_join(ldf, rdf, by="k")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_point_in_interval(spark, sides):
    _, _, ldf, _ = sides
    intervals = spark.createDataFrame(pd.DataFrame({
        "k": ["a", "a", "b"],
        "win": ["early", "late", "all"],
        "start_ts": pd.to_datetime(["2024-01-01 00:00:00",
                                    "2024-01-01 01:00:00",
                                    "2024-01-01 00:00:00"]),
        "end_ts": pd.to_datetime(["2024-01-01 00:05:00",
                                  "2024-01-01 03:00:00",
                                  "2024-01-02 00:00:00"]),
    }))
    got = (range_join(ldf, intervals, by="k")
           .groupBy("win").agg(F.count("*").alias("n"))
           .toPandas().set_index("win")["n"].to_dict())
    # a rows in [00:00, 00:05): lv 0,1 ; a rows in [01:00, 03:00): lv 3
    # b rows all on day one: lv 4,5,6
    assert got == {"early": 2, "late": 1, "all": 3}


# ---------------------------------------------------------------------------
# skew mitigation: (by, coarse time bucket) pre-partition + carry rows
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def skewed(spark):
    """One hot key carrying 95% of the rows across 6 hours, sparse
    right side with multi-bucket gaps (so carries must cross several
    empty buckets), plus cold keys and a right-only key."""
    import numpy as np
    rng = np.random.default_rng(17)
    base = pd.Timestamp("2024-03-01")
    n_hot = 4000
    left = pd.DataFrame({
        "k": ["hot"] * n_hot + ["cold1"] * 100 + ["cold2"] * 100,
        "ts": ([base + pd.Timedelta(seconds=int(s))
                for s in np.sort(rng.integers(0, 6 * 3600, n_hot))]
               + [base + pd.Timedelta(seconds=int(s))
                  for s in np.sort(rng.integers(0, 6 * 3600, 200))]),
        "lv": list(range(n_hot + 200)),
    })
    # distinct right timestamps per key (tie order within equal right
    # ts is arbitrary in BOTH formulations, so keep the oracle tie-free)
    rts = np.sort(rng.choice(6 * 3600, size=40, replace=False))
    right = pd.DataFrame({
        "k": ["hot"] * 30 + ["cold1"] * 9 + ["only_right"],
        "ts": [base + pd.Timedelta(seconds=int(s)) for s in rts[:30]]
        + [base + pd.Timedelta(seconds=int(s)) for s in rts[30:39]]
        + [base],
        "rv": list(range(40)),
    })
    return spark.createDataFrame(left), spark.createDataFrame(right)


@pytest.mark.parametrize("how,tol", [("left", None), ("inner", None),
                                     ("left", 600)])
def test_asof_skew_bucketing_parity(spark, skewed, how, tol):
    """The bucketed formulation is row-for-row equal to the global
    window, including carries across empty buckets and tolerance."""
    ldf, rdf = skewed
    plain = (asof_join(ldf, rdf, by="k", how=how, tolerance_seconds=tol)
             .orderBy("lv").toPandas())
    bucketed = (asof_join(ldf, rdf, by="k", how=how, tolerance_seconds=tol,
                          skew_bucket_seconds=900)
                .orderBy("lv").toPandas())
    assert list(plain["lv"]) == list(bucketed["lv"])
    a = plain["r_rv"].where(plain["r_rv"].notna(), -1).tolist()
    b = bucketed["r_rv"].where(bucketed["r_rv"].notna(), -1).tolist()
    assert a == b


def test_asof_skew_plan_partitions_by_bucket(spark, skewed):
    """The hot key no longer funnels through one window task: the main
    window's partition spec includes the coarse bucket, and no
    nested-loop join appears."""
    ldf, rdf = skewed
    plan = (asof_join(ldf, rdf, by="k", skew_bucket_seconds=900)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "_cb" in plan  # window/exchange keyed on (by, bucket)
    # the data actually spreads: >1 distinct bucket for the hot key
    u = (ldf.withColumn("_cb", F.floor(F.unix_timestamp("ts") / 900))
         .filter(F.col("k") == "hot").select("_cb").distinct().count())
    assert u > 10


def test_asof_auto_skew_detection(spark):
    """skew_bucket_seconds='auto': a planted hot key engages the
    bucketed plan (and stays exactly equal to the global path); a
    uniform high-cardinality key keeps the global single-window plan."""
    import numpy as np
    from kapra_spark.operators.joins import _auto_skew_bucket_seconds

    n = 4000
    rng = np.random.default_rng(3)
    hot_keys = np.where(rng.random(n) < 0.5, "hot",
                        rng.integers(0, 200, n).astype(str))
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 7 * 86400, n), unit="s")
    left = pd.DataFrame({"k": hot_keys, "ts": ts,
                         "lv": np.arange(n, dtype=np.int64)})
    right = pd.DataFrame({
        "k": hot_keys[:400], "ts": ts[:400] - pd.Timedelta(seconds=1),
        "rv": np.arange(400, dtype=np.int64)})
    ldf = spark.createDataFrame(left)
    rdf = spark.createDataFrame(right)
    opts = {"sample_fraction": 1.0, "min_sample": 100}

    # detection: hot key -> width chosen; uniform key -> None
    assert _auto_skew_bucket_seconds(ldf, ["k"], "ts", **opts) is not None
    uni = ldf.withColumn("k", F.concat(F.lit("u"), F.col("lv") % 1000))
    assert _auto_skew_bucket_seconds(uni, ["k"], "ts", **opts) is None

    # parity: auto-bucketed result == global-window result
    a = (asof_join(ldf, rdf, by="k", how="left").toPandas()
         .sort_values("lv").reset_index(drop=True))
    b = (asof_join(ldf, rdf, by="k", how="left",
                   skew_bucket_seconds="auto", auto_opts=opts).toPandas()
         .sort_values("lv").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)

    # the plan actually partitions by the coarse bucket only in auto
    plan_auto = asof_join(ldf, rdf, by="k", skew_bucket_seconds="auto",
                          auto_opts=opts)._jdf.queryExecution().toString()
    plan_glob = asof_join(ldf, rdf, by="k")._jdf.queryExecution().toString()
    assert "_cb" in plan_auto
    assert "_cb" not in plan_glob
