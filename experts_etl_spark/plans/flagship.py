"""Flagship composite pipeline — the reference's core person-assembly
shape (SURVEY.md §3.2, §7.4) re-expressed as one declarative DAG.

Events play job entries: ``user_id`` = person, ``event_type`` = jobcode,
``ts`` = effective date.  The pipeline is
latest-feed-compaction → run-length grouping (W2) → group rollup →
lead-capped end dates (W4) → primary election (W8) → per-person summary
— scan, filter, window, group, join in a single Catalyst plan with one
shuffle key (``user_id``) reused across every stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from experts_etl_spark.operators import elect_primary, run_groups, with_lead_end
from experts_etl_spark.sources import read_table


def person_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")

    # W1+W2: ordered scan per entity → run-length groups.
    grouped = run_groups(
        ev, ["user_id"], [F.col("ts"), F.col("event_id")], ["event_type"]
    )

    # Group rollup (the reference's per-group pandas collapse,
    # oit_to_edw/employee_job.py:89-116, as one aggregation).
    jobs = grouped.groupBy("user_id", "group_id").agg(
        F.min("event_type").alias("job_type"),
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
        F.count(F.lit(1)).alias("n_entries"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
    )

    # W4: next group's start caps this group's end.
    jobs = with_lead_end(
        jobs, ["user_id"], [F.col("start_ts"), F.col("group_id")], "start_ts",
        out_col="next_start",
    ).withColumn("end_capped", F.coalesce("next_start", "end_ts"))

    # W8: elect exactly one primary job per person via a priority cascade.
    priority = (
        F.when(F.col("job_type") == "purchase", 1)
        .when(F.col("job_type") == "signup", 2)
        .when(F.col("job_type") == "view", 3)
        .when(F.col("job_type") == "click", 4)
        .otherwise(5)
    )
    elected = elect_primary(
        jobs, ["user_id"], priority, [F.col("start_ts"), F.col("group_id")]
    )

    # A10-style rollup: per-person summary with the primary job's facts.
    return (
        elected.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_jobs"),
            F.sum(F.col("n_entries")).alias("n_entries"),
            F.max(F.when(F.col("primary"), F.col("job_type"))).alias("primary_type"),
            F.max(F.when(F.col("primary"), F.col("start_ts"))).alias("primary_start"),
            F.sum("total_value").alias("total_value"),
        )
    )
