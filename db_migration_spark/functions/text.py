"""Text-analysis functions for the training-data pipeline (BASELINE.json
north star; SURVEY §2.12).

All pure ``pyspark.sql.functions`` expressions — whole-stage codegen, no
Python per row.  Designed for the ``documents`` table
(``doc_id, text, lang, source, n_chars``) but column-generic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic.  Deliberately small and deterministic; real deployments swap in
# fuller lists — the plan shape (array_intersect over a literal array) is
# what matters at scale.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "es", "por"],
    "de": ["der", "die", "das", "und", "zu", "in", "ist", "ein", "nicht", "mit"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "une", "est", "pour"],
}


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization, empties dropped."""
    return F.filter(F.split(F.trim(_col(text)), r"\s+"), lambda t: t != F.lit(""))


def token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """BPE-ish token estimate: split on word/number/punct boundaries the way
    byte-pair vocabularies tend to segment.  Regex-only, codegen'd."""
    pieces = F.regexp_extract_all(
        _col(text), F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"), 0
    )
    return F.size(pieces)


def punct_ratio(text: Column | str) -> Column:
    """Punctuation chars / total chars (quality-scoring feature)."""
    t = _col(text)
    punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    return punct / F.greatest(F.length(t), F.lit(1))


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords."""
    toks = tokens(F.lower(_col(text)))
    sw = F.array([F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column | str) -> Column:
    """Composite document-quality score in [0,1]: length band, punctuation
    sanity, mean word length band.  Cheap, deterministic, fully codegen'd —
    the shape of a Gopher/C4-style rule filter."""
    t = _col(text)
    n_tok = token_count(t)
    mean_wlen = F.length(F.regexp_replace(t, r"\s+", "")) / F.greatest(n_tok, F.lit(1))
    len_ok = (n_tok >= 5) & (n_tok <= 100000)
    wlen_ok = (mean_wlen >= 2.0) & (mean_wlen <= 12.0)
    punct_ok = punct_ratio(t) <= 0.3
    return (
        (len_ok.cast("double") + wlen_ok.cast("double") + punct_ok.cast("double"))
        / F.lit(3.0)
    )


def lang_id(text: Column | str) -> Column:
    """Stopword-vote language ID: the language whose stopword list hits the
    most tokens; 'und' (undetermined) when nothing hits.

    Plan shape: one lowered token array, K literal-array intersections —
    no shuffle, no UDF; at 100 TB this is a pure map stage.
    """
    toks = tokens(F.lower(_col(text)))

    # NB: pyspark HOF lambdas must have exactly one parameter here — a
    # second (even defaulted) parameter is bound to the element index.
    def hit_counter(words: list[str]):
        sw = F.array([F.lit(w) for w in words])
        return lambda t: F.array_contains(sw, t)

    scores = []
    for lang, words in STOPWORDS.items():
        score = F.size(F.filter(toks, hit_counter(words)))
        scores.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: xxhash64 of whitespace-normalized, lowercased
    text — the exact-dup key.  (Rolling/shingled variants live in
    operators/dedup.py.)"""
    norm = F.lower(F.regexp_replace(F.trim(_col(text)), r"\s+", " "))
    return F.xxhash64(norm)


# PII patterns — deliberately RE2-compatible (no backrefs/lookaround) so
# the same pattern text runs in Spark (java.util.regex) and any RE2-based
# engine (DuckDB oracle, Go/Rust scrubbers) with identical matches.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}(\.\d{1,3}){3}\b"
PII_PHONE = r"\+\d{1,2}-\d{3}-\d{4}"


def redact_pii(text: Column | str) -> Column:
    """Scrub emails, IPv4 addresses and phone numbers to typed placeholder
    tags — the standard pre-training privacy pass.  Chained
    ``regexp_replace`` (replace-all), fully codegen'd: a pure map stage at
    any corpus size.  Email first so address-like tails can't be half
    matched by the later patterns."""
    t = _col(text)
    t = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    t = F.regexp_replace(t, PII_IPV4, "<IP>")
    t = F.regexp_replace(t, PII_PHONE, "<PHONE>")
    return t


def shingles(text: Column | str, k: int = 3) -> Column:
    """Word k-shingles as an array of strings (distinct), the MinHash/Jaccard
    input unit.  Built with transform over a token array — no explode needed
    until the caller wants one."""
    toks = tokens(F.lower(_col(text)))
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n >= k,
        F.array_distinct(
            F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " "))
        )
    ).otherwise(F.array(F.array_join(toks, " ")))
