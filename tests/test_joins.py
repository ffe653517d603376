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
