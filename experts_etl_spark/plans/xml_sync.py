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

from pyspark.sql import Column, DataFrame, SparkSession
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


# ---------------------------------------------------------------------------
# Byte-parity renderer for the reference's REAL Pure person template
# (templates/person.xml.j2, rendered by edw_to_pure/person.py:33-47).
# Native column expressions — whole-stage codegen, no Python per row —
# reproducing Jinja2's exact whitespace-control and autoescape output
# (tests/test_reference_fixture_parity.py proves byte equality against
# the template file itself).
# ---------------------------------------------------------------------------

def _esc(c: Column) -> Column:
    """markupsafe-equivalent escape (Jinja2 autoescape): & < > " '."""
    out = F.regexp_replace(c, "&", "&amp;")
    out = F.regexp_replace(out, "<", "&lt;")
    out = F.regexp_replace(out, ">", "&gt;")
    out = F.regexp_replace(out, '"', "&#34;")
    return F.regexp_replace(out, "'", "&#39;")


def _present(c: Column) -> Column:
    """Jinja2 truthiness for optional string fields: non-null, non-empty."""
    return c.isNotNull() & (c != "")


def _job_element(j: Column) -> Column:
    email = F.when(
        _present(j["email_address"]),
        F.concat(
            F.lit(
                '\n      <emails>\n        <v3:classifiedEmail id="personStaffAssocEmail1">'
                "\n          <v3:classification>email</v3:classification>"
                "\n          <v3:value>"
            ),
            _esc(j["email_address"]),
            F.lit("</v3:value>\n        </v3:classifiedEmail>\n      </emails>"),
        ),
    ).otherwise(F.lit(""))
    end_date = F.when(
        j["period_end_date"].isNotNull(),
        F.concat(
            F.lit("\n        <v3:endDate>"),
            F.date_format(j["period_end_date"], "dd-MM-yyyy"),
            F.lit("</v3:endDate>"),
        ),
    ).otherwise(F.lit(""))
    return F.concat(
        F.lit('\n    <staffOrganisationAssociation id="'),
        _esc(j["staff_org_association_id"]),
        F.lit('" managedInPure="false">\n      <affiliationId>'),
        _esc(j["affiliation_id"]),
        F.lit("</affiliationId>"),
        email,
        F.lit("\n      <employmentType>"),
        _esc(j["employment_type"]),
        F.lit("</employmentType>\n      <primaryAssociation>"),
        F.when(j["primary_association"], F.lit("true")).otherwise(F.lit("false")),
        F.lit(
            "</primaryAssociation>\n      <organisation>\n        <v3:source_id>"
        ),
        _esc(j["org_id"]),
        F.lit(
            "</v3:source_id>\n      </organisation>\n      <period>\n        <v3:startDate>"
        ),
        F.date_format(j["period_start_date"], "dd-MM-yyyy"),
        F.lit("</v3:startDate>"),
        end_date,
        F.lit("\n      </period>\n      <staffType>"),
        _esc(j["staff_type"]),
        F.lit("</staffType>\n      <jobDescription><v3:text lang=\"en\">"),
        _esc(j["job_description"]),
        F.lit("</v3:text></jobDescription>\n    </staffOrganisationAssociation>"),
    )


def pure_person_xml(
    person_id: Column,
    first_name: Column,
    last_name: Column,
    postnominal: Column,
    emplid: Column,
    internet_id: Column,
    visibility: Column,
    profiled: Column,
    jobs: Column,
) -> Column:
    """One rendered ``<person>`` element, byte-identical to the
    reference's person.xml.j2 under Jinja2's whitespace rules (including
    the leading newline from the autoescape tag line and the trailing
    two-space line the un-trimmed ``{% endif %}`` leaves after a
    postnominal block)."""
    titles = F.when(
        _present(postnominal),
        F.concat(
            F.lit('\n  <titles>\n    <title id="'),
            _esc(emplid),
            F.lit(
                '">\n      <typeClassification>postnominal</typeClassification>'
                '\n      <value>\n        <v3:text lang="en" country="US">'
            ),
            _esc(postnominal),
            F.lit("</v3:text>\n      </value>\n    </title>\n  </titles>\n  "),
        ),
    ).otherwise(F.lit(""))
    jobs_xml = F.concat_ws(
        "", F.transform(F.coalesce(jobs, F.array()), _job_element)
    )
    user = F.when(
        _present(internet_id),
        F.concat(
            F.lit('\n  <user id="'),
            _esc(person_id),
            F.lit('">\n    <userName>'),
            _esc(internet_id),
            F.lit("@umn.edu</userName>\n    <email>"),
            _esc(internet_id),
            F.lit("@umn.edu</email>\n  </user>"),
        ),
    ).otherwise(F.lit(""))
    umn_id = F.when(
        _present(internet_id),
        F.concat(
            F.lit('\n    <v3:id type="umn" id="autoid:'),
            _esc(person_id),
            F.lit("-umn-"),
            _esc(internet_id),
            F.lit('">'),
            _esc(internet_id),
            F.lit("</v3:id>"),
        ),
    ).otherwise(F.lit(""))
    return F.concat(
        F.lit('\n<person id="'),
        _esc(person_id),
        F.lit('">\n  <name>\n    <v3:firstname>'),
        _esc(first_name),
        F.lit("</v3:firstname>\n    <v3:lastname>"),
        _esc(last_name),
        F.lit("</v3:lastname>\n  </name>"),
        titles,
        F.lit(
            "\n  <gender>unknown</gender>\n  <organisationAssociations>"
        ),
        jobs_xml,
        F.lit("\n  </organisationAssociations>"),
        user,
        F.lit('\n  <personIds>\n    <v3:id type="employee" id="autoid:'),
        _esc(person_id),
        F.lit("-employee-"),
        _esc(emplid),
        F.lit('">'),
        _esc(emplid),
        F.lit("</v3:id>"),
        umn_id,
        F.lit("\n  </personIds>\n  <visibility>"),
        _esc(visibility),
        F.lit("</visibility>\n  <profiled>"),
        F.when(profiled, F.lit("true")).otherwise(F.lit("false")),
        F.lit("</profiled>\n</person>\n"),
    )


def pure_user_xml(
    person_id: Column,
    user_name: Column,
    email: Column,
    first_name: Column,
    last_name: Column,
) -> Column:
    """Byte-parity render of templates/user.xml.j2 (edw_to_pure/user.py)."""
    return F.concat(
        F.lit('\n<user id="'),
        _esc(person_id),
        F.lit('">\n  <userName>'),
        _esc(user_name),
        F.lit("@umn.edu</userName>\n  <email>"),
        _esc(email),
        F.lit("</email>\n  <name>\n    <v3:firstname>"),
        _esc(first_name),
        F.lit("</v3:firstname>\n    <v3:lastname>"),
        _esc(last_name),
        F.lit("</v3:lastname>\n  </name>\n</user>\n"),
    )


def _typed_section(items: Column, section: str, render_item) -> Column:
    """``{%- if xs|length > 0 %}<section>…{%- endif %}`` blocks of
    organisation.xml.j2: emit nothing for empty/null lists."""
    safe = F.coalesce(items, F.array())
    return F.when(
        F.size(safe) > 0,
        F.concat(
            F.lit(f"\n    <{section}>"),
            F.concat_ws("", F.transform(safe, render_item)),
            F.lit(f"\n    </{section}>"),
        ),
    ).otherwise(F.lit(""))


def _tv(item: Column, outer: str, type_tag: str, value_tag: str) -> Column:
    """The recurring ``<outer><type>t</type><value_tag>v</value_tag></outer>``
    item shape (phone numbers, emails, ids)."""
    return F.concat(
        F.lit(f"\n        <{outer}>\n            <{type_tag}>"),
        _esc(item["type"]),
        F.lit(f"</{type_tag}>\n            <{value_tag}>"),
        _esc(item["value"]),
        F.lit(f"</{value_tag}>\n        </{outer}>"),
    )


def _opt_field(value: Column, tag: str, indent: str = "            ") -> Column:
    """``{%- if x is not none %}`` fields: null skipped, empty rendered."""
    return F.when(
        value.isNotNull(),
        F.concat(F.lit(f"\n{indent}<{tag}>"), _esc(value), F.lit(f"</{tag}>")),
    ).otherwise(F.lit(""))


def pure_organisation_xml(
    organisation_id: Column,
    org_type: Column,
    name: Column,
    start_date: Column,
    end_date: Column,
    visibility: Column,
    parent_organisation_id: Column,
    name_variants: Column,
    profile_infos: Column,
    photos: Column,
    phone_numbers: Column,
    emails: Column,
    web_addresses: Column,
    addresses: Column,
    ids: Column,
) -> Column:
    """Byte-parity render of templates/organisation.xml.j2 — every
    optional section, the ``is not none`` (null-only) guards, and the
    CDATA profile-info block (inner ``autoescape false``: the value is
    emitted RAW)."""

    def name_variant(v):
        return F.concat(
            F.lit(
                "\n        <nameVariant>\n            <type>"
            ),
            _esc(v["type"]),
            F.lit(
                '</type>\n            <name>\n                <v3:text lang="en" country="US">'
            ),
            _esc(v["value"]),
            F.lit(
                "</v3:text>\n            </name>\n        </nameVariant>"
            ),
        )

    def profile_info(p):
        return F.concat(
            F.lit("\n        <profileInfo>\n            <type>"),
            _esc(p["type"]),
            F.lit(
                '</type>\n            <profileInfo>\n                <v3:text lang="en" country="US">'
                "\n                  <![CDATA["
            ),
            p["value"],  # inner {%- autoescape false %}: raw bytes
            F.lit(
                "]]>\n                </v3:text>\n            </profileInfo>\n        </profileInfo>"
            ),
        )

    def photo(p):
        return F.concat(
            F.lit("\n        <photo>\n            <type>"),
            _esc(p["type"]),
            F.lit("</type>\n            <photoValue>"),
            _esc(p["value"]),
            F.lit(
                "</photoValue>\n            <photoProtocol>http</photoProtocol>\n        </photo>"
            ),
        )

    def web_address(w):
        return F.concat(
            F.lit("\n        <webAddress>\n            <type>"),
            _esc(w["type"]),
            F.lit(
                '</type>\n            <webAddress>\n                <v3:text lang="en" country="US">'
            ),
            _esc(w["value"]),
            F.lit(
                "</v3:text>\n            </webAddress>\n        </webAddress>"
            ),
        )

    def address(a):
        return F.concat(
            F.lit("\n        <address>\n            <type>"),
            _esc(a["type"]),
            F.lit("</type>"),
            _opt_field(a["city"], "city"),
            _opt_field(a["postalcode"], "postalCode"),
            _opt_field(a["street"], "street"),
            _opt_field(a["building"], "building"),
            _opt_field(a["country"], "country"),
            _opt_field(a["subdivision"], "subdivision"),
            _opt_field(a["geospatial_point"], "geospatialPoint"),
            F.lit("\n        </address>"),
        )

    def org_id_item(i):
        return F.concat(
            F.lit("\n        <id>\n            <idSource>"),
            _esc(i["type"]),
            F.lit("</idSource>\n            <id>"),
            _esc(i["value"]),
            F.lit("</id>\n        </id>"),
        )

    return F.concat(
        F.lit('<organisation managedInPure="false">\n    <organisationId>'),
        _esc(organisation_id),
        F.lit("</organisationId>\n    <type>"),
        _esc(org_type),
        F.lit(
            '</type>\n    <name>\n        <v3:text lang="en" country="US">'
        ),
        _esc(name),
        F.lit("</v3:text>\n    </name>\n    <startDate>"),
        F.date_format(start_date, "yyyy-MM-dd"),
        F.lit("</startDate>"),
        F.when(
            end_date.isNotNull(),
            F.concat(
                F.lit("\n    <endDate>"),
                F.date_format(end_date, "yyyy-MM-dd"),
                F.lit("</endDate>"),
            ),
        ).otherwise(F.lit("")),
        F.lit("\n    <visibility>"),
        _esc(visibility),
        F.lit("</visibility>"),
        _opt_field(parent_organisation_id, "parentOrganisationId", "    "),
        _typed_section(name_variants, "nameVariants", name_variant),
        _typed_section(profile_infos, "profileInfos", profile_info),
        _typed_section(photos, "photos", photo),
        _typed_section(phone_numbers, "phoneNumbers", lambda p: _tv(p, "phoneNumber", "type", "phoneNumber")),
        _typed_section(emails, "emails", lambda e: _tv(e, "email", "type", "email")),
        _typed_section(web_addresses, "webAddresses", web_address),
        _typed_section(addresses, "addresses", address),
        _typed_section(ids, "ids", org_id_item),
        F.lit("\n</organisation>"),
    )


def run_person_sync(spark: SparkSession, sf_dir: str, out_path: str) -> int:
    """Render every person and write the single ordered sync file
    (edw_to_pure/person.py:33-47)."""
    df = person_sync_frame(spark, sf_dir)
    return write_single_xml(
        df,
        out_path,
        "xml",
        ["person_id"],
        header='<persons xmlns="v1.unified-person-sync.pure.atira.dk"'
        ' xmlns:v3="v3.commons.pure.atira.dk">',
        footer="</persons>",
    )
