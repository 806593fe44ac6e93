"""Serialization pack: escaping, ordered single-file sink, rotation,
Jinja2 fidelity path (SURVEY.md §2.1 S7/S10, §2.7 F14)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from experts_etl_spark.sources.serialization import (
    render_jinja_udf,
    rotate_sync_files,
    write_single_xml,
    write_single_xml_distributed,
    xml_element,
    xml_escape,
)


def test_xml_escape_order(spark):
    df = spark.createDataFrame([("a&b <c> &lt;",)], ["s"])
    got = df.select(xml_escape(F.col("s")).alias("e")).collect()[0].e
    # & escaped first, so pre-existing entities are double-escaped (like
    # jinja2 autoescape does)
    assert got == "a&amp;b &lt;c&gt; &amp;lt;"


def test_xml_element_null_is_empty(spark):
    df = spark.createDataFrame([(None,), ("x",)], "s string")
    got = sorted(
        r.e for r in df.select(xml_element("name", F.col("s")).alias("e")).collect()
    )
    assert got == ["<name>x</name>", "<name></name>"] or got == [
        "<name></name>",
        "<name>x</name>",
    ]


def test_write_single_xml_ordered(spark, tmp_path):
    df = spark.createDataFrame(
        [(3, "<p>3</p>"), (1, "<p>1</p>"), (2, "<p>2</p>")], ["k", "xml"]
    ).repartition(3)
    path = str(tmp_path / "persons_2026-01-01T00:00:00.xml")
    n = write_single_xml(
        df, path, "xml", ["k"], header="<persons>", footer="</persons>"
    )
    assert n == 3
    lines = open(path).read().splitlines()
    assert lines == ["<persons>", "<p>1</p>", "<p>2</p>", "<p>3</p>", "</persons>"]


def test_write_single_xml_distributed_byte_equal(spark, tmp_path):
    """The distributed per-range-parts + ordered-concat writer must
    produce byte-identical output to the serial toLocalIterator writer
    (and the same element count) — including empty ranges, multi-part
    layouts, and rows containing characters the text sink must not
    mangle."""
    df = (
        spark.range(500)
        .select(
            (F.col("id") * 37 % 500).alias("k"),
            F.concat(
                F.lit("<p a=\"x&amp;y\">"),
                (F.col("id") * 37 % 500).cast("string"),
                F.lit("</p>"),
            ).alias("xml"),
        )
        .repartition(7)
    )
    serial = str(tmp_path / "serial.xml")
    dist = str(tmp_path / "dist.xml")
    n1 = write_single_xml(
        df, serial, "xml", ["k"], header="<ps>", footer="</ps>"
    )
    n2 = write_single_xml_distributed(
        df, dist, "xml", ["k"], header="<ps>", footer="</ps>", n_parts=5
    )
    assert n1 == n2 == 500
    assert open(serial, "rb").read() == open(dist, "rb").read()
    assert not os.path.exists(dist + ".parts")  # staging cleaned up


def test_write_single_xml_distributed_multiline_and_null(spark, tmp_path):
    """Element counts must be ROW counts, not newline counts: the real
    sync payloads (plans/xml_sync.py) render multi-line XML per row.
    NULL xml renders as an empty line in BOTH writers (aligned
    contract), keeping the outputs byte-equal."""
    rows = [
        (2, "<p>\n  <a>2</a>\n</p>"),
        (1, "<p>\n  <a>1</a>\n</p>"),
        (3, None),
        (4, "<p>4</p>"),
    ]
    df = spark.createDataFrame(rows, ["k", "xml"]).repartition(3)
    serial = str(tmp_path / "serial_ml.xml")
    dist = str(tmp_path / "dist_ml.xml")
    n1 = write_single_xml(
        df, serial, "xml", ["k"], header="<ps>", footer="</ps>"
    )
    n2 = write_single_xml_distributed(
        df, dist, "xml", ["k"], header="<ps>", footer="</ps>", n_parts=2
    )
    assert n1 == n2 == 4  # 4 rows despite 8 payload newlines
    assert open(serial, "rb").read() == open(dist, "rb").read()


def test_write_single_xml_distributed_empty(spark, tmp_path):
    df = spark.createDataFrame([], "k int, xml string")
    path = str(tmp_path / "empty.xml")
    n = write_single_xml_distributed(
        df, path, "xml", ["k"], header="<ps>", footer="</ps>", n_parts=3
    )
    assert n == 0
    assert open(path).read().splitlines() == ["<ps>", "</ps>"]


def test_rotate_sync_files_keeps_newest_and_symlinks(tmp_path):
    d = str(tmp_path)
    for i in range(7):
        open(os.path.join(d, f"person_2026-01-0{i}T00:00:00.xml"), "w").write(str(i))
    kept = rotate_sync_files(d, "person_", keep=3)
    assert len(kept) == 3 and kept[-1] == "person_2026-01-06T00:00:00.xml"
    remaining = sorted(os.listdir(d))
    assert len([f for f in remaining if not f.startswith("latest_")]) == 3
    link = os.path.join(d, "latest_person_.xml")
    assert os.path.islink(link) and os.readlink(link) == kept[-1]


def test_jinja_udf_matches_native_render(spark):
    """F14 fidelity: the Jinja2 template path and the native-column path
    produce identical bytes for the same rows."""
    df = spark.createDataFrame(
        [(1, "alice & bob"), (2, "<admin>")], ["id", "name"]
    )
    tmpl = "<person id=\"{{ id }}\"><name>{{ name }}</name></person>"
    jinja = df.withColumn(
        "xml", render_jinja_udf(tmpl)(F.struct("id", "name"))
    )
    native = df.withColumn(
        "xml",
        F.concat(
            F.lit('<person id="'),
            F.col("id").cast("string"),
            F.lit('"><name>'),
            xml_escape(F.col("name")),
            F.lit("</name></person>"),
        ),
    )
    j = {r.id: r.xml for r in jinja.collect()}
    n = {r.id: r.xml for r in native.collect()}
    assert j == n
    assert j[1] == '<person id="1"><name>alice &amp; bob</name></person>'


def test_run_person_sync_writes_ordered_file(spark, tmp_path):
    from experts_etl_spark.plans.xml_sync import run_person_sync

    path = str(tmp_path / "person_sync.xml")
    n = run_person_sync(spark, "/root/testdata/sf0.001", path)
    lines = open(path).read().splitlines()
    assert lines[0] == (
        '<persons xmlns="v1.unified-person-sync.pure.atira.dk"'
        ' xmlns:v3="v3.commons.pure.atira.dk">'
    ) and lines[-1] == "</persons>"
    assert n == len(lines) - 2
    # elements are in person_id order
    import re

    ids = [int(re.match(r'<person id="(\d+)">', l).group(1)) for l in lines[1:-1]]
    assert ids == sorted(ids)
    # every person with orders carries nested job elements
    assert any("<job id=" in l for l in lines)
