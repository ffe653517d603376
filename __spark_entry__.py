"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (1h rollup cascade over the
events stream) at sf0.001. ``queries()`` exposes every SQL-expressible
operator from SURVEY.md §2 against the driver testdata; ``oracle_sql()``
holds the DuckDB equivalents (identical aliases, floats rounded to 4
decimals on both sides, buckets as epoch-second longs so no tz drift).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF_DEFAULT = "/root/testdata/sf0.001"


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _r4(c):
    return F.round(c, 4)


# ---------------------------------------------------------------------------
# rollup / window / gap-fill queries (A10, W1, J4)
# ---------------------------------------------------------------------------

def q_rollup_1h_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kapra_spark.operators.rollup import events_rollup

    df = events_rollup(_read(spark, sf_dir, "events"), 3600)
    return df.select(
        "series", "bucket", "cnt",
        _r4("sum").alias("sum_v"), _r4("min").alias("min_v"), _r4("max").alias("max_v"))


def q_rollup_1d_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kapra_spark.operators.rollup import events_rollup

    df = events_rollup(_read(spark, sf_dir, "events"), 86400)
    return df.select(
        "series", "bucket", "cnt",
        _r4("sum").alias("sum_v"), _r4("min").alias("min_v"), _r4("max").alias("max_v"))


def q_cascade_1d_from_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1d tier re-aggregated from the 1h tier (continuous-aggregate
    cascade, A10) — must equal a direct 1d rollup (the oracle)."""
    from kapra_spark.operators.rollup import events_rollup

    h = events_rollup(_read(spark, sf_dir, "events"), 3600)
    d = (h.groupBy("series", ((F.col("bucket") / 86400).cast("long") * 86400).alias("bucket"))
         .agg(F.sum("cnt").alias("cnt"), F.sum("sum").alias("sum"),
              F.min("min").alias("min"), F.max("max").alias("max")))
    return d.select("series", "bucket", "cnt",
                    _r4("sum").alias("sum_v"), _r4("min").alias("min_v"),
                    _r4("max").alias("max_v"))


def q_gapfill_locf_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kapra_spark.operators.rollup import events_gapfill

    df = events_gapfill(_read(spark, sf_dir, "events"), 3600)
    return df.select("series", "bucket", "filled", _r4("value").alias("value"))


def q_row_number_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: deterministic ranking window (replaces the reference's
    head(n) downsampler, utils/downsample_dataset.py:27)."""
    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), "event_id")
    return (ev.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5)
            .select("event_type", "event_id", _r4("value").alias("value"), "rn"))


def q_limit_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/O6: deterministic downsample via orderBy + limit."""
    return (_read(spark, sf_dir, "events")
            .orderBy("event_id").limit(100)
            .select("event_id", "event_type", _r4("value").alias("value")))


# ---------------------------------------------------------------------------
# aggregation / envelope / metric queries (A1-A5, A11)
# ---------------------------------------------------------------------------

def q_global_minmax_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: table-wide per-attribute min/max (reference io.py:17-45)."""
    li = _read(spark, sf_dir, "lineitem")
    return li.agg(
        _r4(F.min("l_quantity")).alias("min_qty"), _r4(F.max("l_quantity")).alias("max_qty"),
        _r4(F.min("l_extendedprice")).alias("min_price"), _r4(F.max("l_extendedprice")).alias("max_price"),
        _r4(F.min("l_discount")).alias("min_disc"), _r4(F.max("l_discount")).alias("max_disc"))


def q_envelope_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: per-group per-attribute envelope [lo|hi]
    (reference anonymized_dataset.py:27-35)."""
    li = _read(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.count("*").alias("cnt"),
                 _r4(F.min("l_quantity")).alias("lo_qty"), _r4(F.max("l_quantity")).alias("hi_qty"),
                 _r4(F.min("l_extendedprice")).alias("lo_price"), _r4(F.max("l_extendedprice")).alias("hi_price")))


def q_ncp_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: NCP(T) per group = |T| * sum_i (max_i-min_i)/(gmax_i-gmin_i)
    (reference metric.py:5-47)."""
    li = _read(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.max("l_quantity").alias("zq"), F.min("l_quantity").alias("yq"),
        F.max("l_extendedprice").alias("zp"), F.min("l_extendedprice").alias("yp"))
    glob = li.agg(
        (F.max("l_quantity") - F.min("l_quantity")).alias("aq"),
        (F.max("l_extendedprice") - F.min("l_extendedprice")).alias("ap"))
    return (g.crossJoin(F.broadcast(glob))
            .select("l_returnflag",
                    _r4(F.col("n") * ((F.col("zq") - F.col("yq")) / F.col("aq")
                                      + (F.col("zp") - F.col("yp")) / F.col("ap"))).alias("ncp")))


def q_vl_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: instant value loss per group
    = |T| * sqrt(sum_i (max_i-min_i)^2 / n_attrs) (reference metric.py:49-83)."""
    li = _read(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        (F.max("l_quantity") - F.min("l_quantity")).alias("rq"),
        (F.max("l_extendedprice") - F.min("l_extendedprice")).alias("rp"))
        .select("l_returnflag",
                _r4(F.col("n") * F.sqrt((F.col("rq") ** 2 + F.col("rp") ** 2) / 2)).alias("vl")))


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: tier x source summaries via grouping sets / cube."""
    ev = _read(spark, sf_dir, "events")
    return (ev.cube("event_type")
            .agg(F.count("*").alias("cnt"), _r4(F.sum("value")).alias("sum_v"))
            .select(F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
                    "cnt", "sum_v"))


def q_distinct_sensitive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11/P2: distinct sensitive-value sets per equivalence class
    (reference l_diversity.py:47)."""
    ev = _read(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n_users"),
                 F.count("*").alias("cnt")))


# ---------------------------------------------------------------------------
# joins / set ops (J1-J3, U1, U2)
# ---------------------------------------------------------------------------

def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1-style equi join with an explicitly broadcast small side."""
    o = _read(spark, sf_dir, "orders")
    c = _read(spark, sf_dir, "customer")
    n = _read(spark, sf_dir, "nation")
    return (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("n_name")
            .agg(F.count("*").alias("cnt"), _r4(F.sum("o_totalprice")).alias("sum_price")))


def q_join_pattern_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: original x derived-summary join by key (pattern-loss pairing
    shape, reference pattern_loss.py:237-247)."""
    li = _read(spark, sf_dir, "lineitem")
    summary = li.groupBy("l_orderkey").agg(_r4(F.avg("l_quantity")).alias("avg_qty"))
    return (li.join(summary, "l_orderkey")
            .groupBy("l_returnflag")
            .agg(F.count("*").alias("cnt"), _r4(F.sum("avg_qty")).alias("sum_avg_qty")))


def q_anti_join_processed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4/U2/J5: left anti-join against a processed-keys set (the
    reference's index_ignored / keyset exclusion lists)."""
    o = _read(spark, sf_dir, "orders")
    done = o.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    return (o.join(done, "o_custkey", "left_anti")
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("cnt"), _r4(F.sum("o_totalprice")).alias("sum_price")))


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    big = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q")).filter("q > 100")
    return (li.join(big.select("l_orderkey"), "l_orderkey", "left_semi")
            .groupBy("l_returnflag").agg(F.count("*").alias("cnt")))


def q_union_suppressed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: union of kept + suppressed rows with null markers
    (reference anonymized_dataset.py:21-50)."""
    ev = _read(spark, sf_dir, "events")
    kept = ev.filter("value >= 100").select(
        "event_id", F.col("event_type").alias("etype"), _r4("value").alias("value"))
    suppressed = ev.filter("value < 100").select(
        "event_id", F.lit(None).cast("string").alias("etype"),
        F.lit(None).cast("double").alias("value"))
    return kept.unionByName(suppressed)


# ---------------------------------------------------------------------------
# extremum search (O1-O5)
# ---------------------------------------------------------------------------

def q_max_by_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O2: argmax via max_by (the tuple maximizing a metric)."""
    ev = _read(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
            .agg(F.max_by("event_id", "value").alias("argmax_event"),
                 _r4(F.max("value")).alias("max_value"),
                 F.min_by("event_id", "value").alias("argmin_event"),
                 _r4(F.min("value")).alias("min_value")))


# ---------------------------------------------------------------------------
# contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 1h rollup cascade over the events stream at sf0.001."""
    return q_rollup_1h_events(spark, SF_DEFAULT)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "rollup_1h_events": q_rollup_1h_events,
        "rollup_1d_events": q_rollup_1d_events,
        "cascade_1d_from_1h": q_cascade_1d_from_1h,
        "gapfill_locf_events": q_gapfill_locf_events,
        "row_number_rank": q_row_number_rank,
        "limit_events": q_limit_events,
        "global_minmax_lineitem": q_global_minmax_lineitem,
        "envelope_groups": q_envelope_groups,
        "ncp_groups": q_ncp_groups,
        "vl_groups": q_vl_groups,
        "grouping_sets": q_grouping_sets,
        "distinct_sensitive": q_distinct_sensitive,
        "join_broadcast": q_join_broadcast,
        "join_pattern_assignment": q_join_pattern_assignment,
        "anti_join_processed": q_anti_join_processed,
        "semi_join": q_semi_join,
        "union_suppressed": q_union_suppressed,
        "max_by_argmax": q_max_by_argmax,
    }


def oracle_sql() -> dict[str, str]:
    rollup = """
        SELECT event_type AS series,
               (floor(epoch(ts))::BIGINT // {sec}) * {sec} AS bucket,
               count(value) AS cnt,
               round(sum(value), 4) AS sum_v,
               round(min(value), 4) AS min_v,
               round(max(value), 4) AS max_v
        FROM events GROUP BY 1, 2
    """
    return {
        "rollup_1h_events": rollup.format(sec=3600),
        "rollup_1d_events": rollup.format(sec=86400),
        "cascade_1d_from_1h": rollup.format(sec=86400),
        "gapfill_locf_events": """
            WITH actual AS (
              SELECT event_type AS series,
                     (floor(epoch(ts))::BIGINT // 3600) * 3600 AS bucket,
                     sum(value) AS value
              FROM events GROUP BY 1, 2
            ), bounds AS (
              SELECT (min(floor(epoch(ts))::BIGINT) // 3600) * 3600 AS lo,
                     (max(floor(epoch(ts))::BIGINT) // 3600) * 3600 AS hi
              FROM events
            ), spine AS (
              SELECT s.series, g.bucket
              FROM (SELECT DISTINCT event_type AS series FROM events) s
              CROSS JOIN (SELECT unnest(generate_series(lo, hi, 3600)) AS bucket
                          FROM bounds) g
            )
            SELECT sp.series, sp.bucket,
                   (a.value IS NULL) AS filled,
                   round(last_value(a.value IGNORE NULLS) OVER (
                     PARTITION BY sp.series ORDER BY sp.bucket
                     ROWS UNBOUNDED PRECEDING), 4) AS value
            FROM spine sp LEFT JOIN actual a
              ON sp.series = a.series AND sp.bucket = a.bucket
        """,
        "row_number_rank": """
            SELECT event_type, event_id, round(value, 4) AS value, rn
            FROM (SELECT event_type, event_id, value,
                         row_number() OVER (PARTITION BY event_type
                           ORDER BY value DESC, event_id) AS rn
                  FROM events)
            WHERE rn <= 5
        """,
        "limit_events": """
            SELECT event_id, event_type, round(value, 4) AS value
            FROM events ORDER BY event_id LIMIT 100
        """,
        "global_minmax_lineitem": """
            SELECT round(min(l_quantity), 4) AS min_qty, round(max(l_quantity), 4) AS max_qty,
                   round(min(l_extendedprice), 4) AS min_price, round(max(l_extendedprice), 4) AS max_price,
                   round(min(l_discount), 4) AS min_disc, round(max(l_discount), 4) AS max_disc
            FROM lineitem
        """,
        "envelope_groups": """
            SELECT l_returnflag, l_linestatus, count(*) AS cnt,
                   round(min(l_quantity), 4) AS lo_qty, round(max(l_quantity), 4) AS hi_qty,
                   round(min(l_extendedprice), 4) AS lo_price, round(max(l_extendedprice), 4) AS hi_price
            FROM lineitem GROUP BY 1, 2
        """,
        "ncp_groups": """
            SELECT l_returnflag,
                   round(n * ((zq - yq) / aq + (zp - yp) / ap), 4) AS ncp
            FROM (SELECT l_returnflag, count(*) AS n,
                         max(l_quantity) AS zq, min(l_quantity) AS yq,
                         max(l_extendedprice) AS zp, min(l_extendedprice) AS yp
                  FROM lineitem GROUP BY 1) g
            CROSS JOIN (SELECT max(l_quantity) - min(l_quantity) AS aq,
                               max(l_extendedprice) - min(l_extendedprice) AS ap
                        FROM lineitem) gbl
        """,
        "vl_groups": """
            SELECT l_returnflag,
                   round(n * sqrt((rq * rq + rp * rp) / 2), 4) AS vl
            FROM (SELECT l_returnflag, count(*) AS n,
                         max(l_quantity) - min(l_quantity) AS rq,
                         max(l_extendedprice) - min(l_extendedprice) AS rp
                  FROM lineitem GROUP BY 1)
        """,
        "grouping_sets": """
            SELECT coalesce(event_type, 'ALL') AS event_type,
                   count(*) AS cnt, round(sum(value), 4) AS sum_v
            FROM events GROUP BY CUBE (event_type)
        """,
        "distinct_sensitive": """
            SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS cnt
            FROM events GROUP BY 1
        """,
        "join_broadcast": """
            SELECT n_name, count(*) AS cnt, round(sum(o_totalprice), 4) AS sum_price
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1
        """,
        "join_pattern_assignment": """
            SELECT l_returnflag, count(*) AS cnt, round(sum(avg_qty), 4) AS sum_avg_qty
            FROM lineitem
            JOIN (SELECT l_orderkey, round(avg(l_quantity), 4) AS avg_qty
                  FROM lineitem GROUP BY 1) USING (l_orderkey)
            GROUP BY 1
        """,
        "anti_join_processed": """
            SELECT o_orderstatus, count(*) AS cnt, round(sum(o_totalprice), 4) AS sum_price
            FROM orders
            WHERE o_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
            GROUP BY 1
        """,
        "semi_join": """
            SELECT l_returnflag, count(*) AS cnt
            FROM lineitem
            WHERE l_orderkey IN (SELECT l_orderkey FROM lineitem
                                 GROUP BY 1 HAVING sum(l_quantity) > 100)
            GROUP BY 1
        """,
        "union_suppressed": """
            SELECT event_id, event_type AS etype, round(value, 4) AS value
            FROM events WHERE value >= 100
            UNION ALL
            SELECT event_id, NULL AS etype, NULL AS value
            FROM events WHERE value < 100
        """,
        "max_by_argmax": """
            SELECT event_type,
                   arg_max(event_id, value) AS argmax_event,
                   round(max(value), 4) AS max_value,
                   arg_min(event_id, value) AS argmin_event,
                   round(min(value), 4) AS min_value
            FROM events GROUP BY 1
        """,
    }
