"""EDW → Pure XML sync pipeline (SURVEY.md §3.4).

The reference iterates persons row-at-a-time, filters that person's
staff-org associations in Python, renders a Jinja2 template per person
and appends to one XML file (edw_to_pure/person.py:23-47).

Spark shape (SURVEY.md §3.4): join the association table pre-grouped
with ``collect_list(struct(...))`` — one shuffle, no per-row filtering —
then render each person *with their nested jobs* as one element via
native string expressions, and stream the elements in key order through
the single-file sink.

The synthetic cast: ``customer`` plays ``pure_sync_person_data``,
``orders`` plays ``pure_sync_staff_org_association``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from experts_etl_spark.sources import read_table
from experts_etl_spark.sources.serialization import write_single_xml, xml_escape


def person_sync_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """persons ⟕ collect_list(jobs) → one rendered ``<person>`` element
    per row, nested ``<jobs>`` children in (start-date, key) order."""
    persons = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("person_id"),
        F.col("c_name").alias("name"),
    )
    jobs = read_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("person_id"),
        F.col("o_orderkey").alias("job_id"),
        F.col("o_orderdate").alias("start_date"),
    )
    nested = (
        jobs.groupBy("person_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("start_date", "job_id"))
            ).alias("jobs")
        )
    )
    joined = persons.join(nested, "person_id", "left")
    jobs_xml = F.concat_ws(
        "",
        F.transform(
            F.coalesce(F.col("jobs"), F.array()),
            lambda j: F.concat(
                F.lit('<job id="'),
                j["job_id"].cast("string"),
                F.lit('" start="'),
                F.date_format(j["start_date"], "dd-MM-yyyy"),
                F.lit('"/>'),
            ),
        ),
    )
    person_xml = F.concat(
        F.lit('<person id="'),
        F.col("person_id").cast("string"),
        F.lit('"><name>'),
        xml_escape(F.col("name")),
        F.lit("</name><jobs>"),
        jobs_xml,
        F.lit("</jobs></person>"),
    )
    return joined.select("person_id", person_xml.alias("xml"))


def run_person_sync(spark: SparkSession, sf_dir: str, out_path: str) -> int:
    """Render every person and write the single ordered sync file
    (edw_to_pure/person.py:33-47)."""
    df = person_sync_frame(spark, sf_dir)
    return write_single_xml(
        df,
        out_path,
        "xml",
        ["person_id"],
        header="<persons>",
        footer="</persons>",
    )
