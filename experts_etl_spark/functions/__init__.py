"""Scalar column functions (SURVEY.md §2.7).

Every one is a composition of built-in ``pyspark.sql.functions`` —
JVM-side, whole-stage-codegen'd, no Python in the hot path.  File:line
citations point at the reference behavior each reproduces.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# F1: multi-format date/timestamp parse (reference transformers.py:8-29
# dispatches on regex over four formats; unknown → typed error).  The
# Spark expression is a regex-gated coalesce of to_timestamp calls; rows
# matching no format yield NULL — callers route those to the quarantine
# branch instead of raising (set-at-a-time error semantics).
# Exactly the reference's pattern (transformers.py:9): 3 fraction
# digits and a '+' offset only — wider strings must stay unparsed so
# they route to quarantine exactly where the reference raises.
_ISO_RE = r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}\+\d{4}$"
_YMD_RE = r"^\d{4}-\d{2}-\d{2}$"
_YM_RE = r"^\d{4}-\d{2}$"
_Y_RE = r"^\d{4}$"


def multi_format_ts(col: Column) -> Column:
    """F1/F2: parse ISO-8601-with-offset, date, year-month, or year
    strings into a timestamp; NULL when no format matches."""
    return (
        F.when(col.rlike(_ISO_RE), F.to_timestamp(col, "yyyy-MM-dd'T'HH:mm:ss.SSSZ"))
        .when(col.rlike(_YMD_RE), F.to_timestamp(col, "yyyy-MM-dd"))
        .when(col.rlike(_YM_RE), F.to_timestamp(col, "yyyy-MM"))
        .when(col.rlike(_Y_RE), F.to_timestamp(col, "yyyy"))
        .otherwise(F.lit(None).cast("timestamp"))
    )


def date_precision(col: Column) -> Column:
    """F11 companion: precision ∈ {366 (year), 31 (year-month), 1 (full
    date/timestamp)} mirroring transformer_loaders/pure_api_pub.py:48-62;
    NULL for unparseable strings."""
    return (
        F.when(col.rlike(_Y_RE), F.lit(366))
        .when(col.rlike(_YM_RE), F.lit(31))
        .when(col.rlike(_YMD_RE) | col.rlike(_ISO_RE), F.lit(1))
        .otherwise(F.lit(None).cast("int"))
    )


def partial_date(year: Column, month: Column, day: Column) -> Column:
    """F11: partial-precision date — missing month/day default to 1
    (transformer_loaders/pure_api_pub.py:48-62)."""
    return F.make_date(
        year, F.coalesce(month, F.lit(1)), F.coalesce(day, F.lit(1))
    )


def uri_tail(col: Column, n: int = 3) -> Column:
    """F7: split a '/'-separated uri, reverse, take the first ``n``
    segments (subtype/type/parent extraction,
    transformer_loaders/pure_api_pub.py:185-187)."""
    return F.slice(F.reverse(F.split(col, "/")), 1, n)


def locale_pick(
    texts: Column, locale: str = "en_US", locale_field: str = "locale",
    value_field: str = "value",
) -> Column:
    """P8: first ``value`` in an array<struct> whose locale matches
    (transformer_loaders/pure_api_internal_person.py:196-203).  A
    higher-order ``filter`` + element_at — no explode, no shuffle."""
    matches = F.filter(texts, lambda t: t[locale_field] == locale)
    return F.when(F.size(matches) > 0, matches[0][value_field])


def slug(col: Column) -> Column:
    """F8: lowercase + strip non-alpha ('non-academic' → 'nonacademic',
    transformer_loaders/pure_api_internal_person.py:256-263)."""
    return F.lower(F.regexp_replace(col, "[^a-zA-Z]+", ""))


def full_name(first: Column, middle: Column) -> Column:
    """F4: first_name + ' ' + middle_initial when the initial has any
    non-blank character (oit_to_edw/person.py:486-491)."""
    return F.when(
        middle.isNotNull() & middle.rlike(r"\S"), F.concat_ws(" ", first, middle)
    ).otherwise(first)


def synthetic_assoc_id(*parts: Column) -> Column:
    """F5: 'autoid:{a}-{b}-...' synthetic business key
    (oit_to_edw/person.py:278-284)."""
    return F.concat(F.lit("autoid:"), F.concat_ws("-", *parts))


def derive_email(user: Column, domain: str = "umn.edu") -> Column:
    """F6: internet_id + '@domain' (oit_to_edw/person.py:116)."""
    return F.when(user.isNotNull(), F.concat(user, F.lit("@" + domain)))


def stable_id(*business_key: Column) -> Column:
    """F10 replacement: deterministic surrogate key — sha2 of the
    business key instead of uuid4() so runs are reproducible
    (SURVEY.md §4.2 item 3; reference uses uuid.uuid4() at
    transformer_loaders/pure_api_pub.py:132-136)."""
    return F.sha2(F.concat_ws("\x1f", *business_key), 256)


def json_normalize(col: Column, schema: str) -> Column:
    """F13: dumps/loads round-trip for log normalization
    (loggers.py:20-26) — to_json(from_json(...))."""
    return F.to_json(F.from_json(col, schema))
