"""Text analysis for document pipelines: token counting, quality
scoring, language-ID heuristic, fingerprinting.

All pure column expressions (JVM-side).  Determinism rule: only
+,-,*,/ and sqrt on deterministic inputs — no exp/log (libm results
differ across engines, which would break oracle parity).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Whitespace tokens and a BPE-ish lexer: letter runs, digit runs, single
# punctuation marks — the shape a byte-pair pretokenizer produces.
TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"
PUNCT_RE = r"[^.!?,;:]"

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["der", "die", "und", "das", "nicht", "ist", "ein"],
    "es": ["el", "la", "los", "las", "una", "es", "y"],
    "fr": ["le", "la", "les", "des", "est", "et", "un"],
}


def words(text: Column) -> Column:
    """Whitespace tokenization of lowercased text."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def ws_token_count(text: Column) -> Column:
    return F.size(words(text))


def regex_token_count(text: Column) -> Column:
    """BPE-ish token count via the lexer regex (JVM regexp_count)."""
    return F.regexp_count(text, F.lit(TOKEN_RE))


def punct_count(text: Column) -> Column:
    return F.length(F.regexp_replace(text, PUNCT_RE, ""))


def stopword_hits(text: Column, lang: str = "en") -> Column:
    stops = STOPWORDS[lang]
    return F.size(F.filter(words(text), lambda w: w.isin(*stops)))


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic: stopword density +
    bounded length + low punctuation noise.  Rational arithmetic only."""
    n_chars = F.length(text).cast("double")
    toks = ws_token_count(text).cast("double")
    stop_ratio = stopword_hits(text).cast("double") / F.greatest(toks, F.lit(1.0))
    len_term = F.least(n_chars, F.lit(400.0)) / F.lit(400.0)
    punct_ratio = punct_count(text).cast("double") / F.greatest(n_chars, F.lit(1.0))
    return stop_ratio * 0.5 + len_term * 0.3 + (F.lit(1.0) - punct_ratio) * 0.2


def lang_id(text: Column) -> Column:
    """N-gram/stopword language-ID heuristic: argmax of marker-word hits
    per language; 'und' (undetermined) when nothing matches.  Ties break
    by the fixed language order below."""
    scores = {lang: stopword_hits(text, lang) for lang in ("en", "de", "es", "fr")}
    best = F.greatest(*scores.values())
    out = F.lit("und")
    # Build the when-cascade in reverse so earlier langs win ties.
    for lang in ("fr", "es", "de", "en"):
        out = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(out)
    return out


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text
    (the deterministic stand-in for a rolling winnowing hash; same
    exact-dedup semantics)."""
    return F.md5(F.concat_ws(" ", words(text)))
