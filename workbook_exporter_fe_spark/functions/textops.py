"""Text-analysis column builders for training-data pipelines.

All pure Column expressions (JVM-side, codegen'd — no Python in the hot
path): whitespace + BPE-ish tokenization, language-ID heuristic, quality
scoring, shingling, md5-based document fingerprints. md5 is the only hash
used so results are reproducible across engines (DuckDB oracle parity).

Scale: every function here is a narrow per-row projection — no shuffle, no
UDF. At 100 TB these run inside the scan stage at full codegen speed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the heuristic language ID.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "a", "is"],
    "fr": ["le", "la", "et", "les", "de"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "los", "y", "es", "que"],
}

EN_STOPWORDS = ["the", "a", "an", "and", "of", "to", "in", "is", "on", "for"]

# BPE-ish pre-tokenizer: letter runs | single digits | single punctuation.
BPE_PATTERN = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]"


def ws_tokens(text: Column) -> Column:
    """Whitespace tokens (split on single space, the corpus convention)."""
    return F.split(text, " ")


def token_count_ws(text: Column) -> Column:
    return F.size(ws_tokens(text))


def token_count_bpe(text: Column) -> Column:
    """Token count under a BPE-style pre-tokenization regex."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0))


def punct_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit("[^a-zA-Z0-9\\s]"), 0))


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    words = ws_tokens(text)
    sw = F.array(*[F.lit(w) for w in (stopwords or EN_STOPWORDS)])
    hits = F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
    return hits / F.size(words)


def marker_hits(text: Column, lang: str) -> Column:
    words = ws_tokens(text)
    mk = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    return F.size(F.filter(words, lambda w: F.array_contains(mk, w)))


def lang_id(text: Column) -> Column:
    """Heuristic language ID: argmax of marker-word hits, 'und' if none.

    Ties break in fixed lang order (en > fr > de > es) via strict '>'.
    """
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    for lang in ["en", "fr", "de", "es"]:
        h = marker_hits(text, lang)
        new_best = h > best_hits
        best_lang = F.when(new_best, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(new_best, h).otherwise(best_hits)
    return best_lang


def quality_features(text: Column) -> dict[str, Column]:
    """Deterministic quality signals: lengths, ratios, score in [0,1]."""
    n_chars = F.length(text)
    n_tok = token_count_ws(text)
    avg_len = F.round(n_chars.cast("double") / n_tok, 6)
    sw_ratio = F.round(stopword_ratio(text), 6)
    p_ratio = F.round(punct_count(text).cast("double") / n_chars, 6)
    # crude composite: long-enough docs with typical word length and some
    # stopwords score high; heavy punctuation scores low
    score = F.round(
        F.least(n_tok.cast("double") / 50.0, F.lit(1.0)) * 0.4
        + F.when((avg_len >= 3.0) & (avg_len <= 8.0), 0.3).otherwise(0.0)
        + F.least(sw_ratio * 3.0, F.lit(0.3)),
        6,
    )
    return {
        "n_chars": n_chars,
        "n_tokens_ws": n_tok,
        "avg_token_len": avg_len,
        "stopword_ratio": sw_ratio,
        "punct_ratio": p_ratio,
        "quality_score": score,
    }


def repetition_features(text: Column) -> dict[str, Column]:
    """Gopher-style intra-document repetition signals (Rae et al. 2021
    §A1.1 quality filters): the fraction of duplicate word n-grams and the
    most-frequent-word share — high values mark boilerplate/spam docs a
    curation pass drops before training.

    - dup_word_ratio / dup_2gram_ratio / dup_3gram_ratio: 1 − distinct/total
      over word n-grams (0.0 for docs too short to form a gram);
    - top_word_ratio: occurrences of the most frequent word / total words.

    Pure Column expressions — no shuffle, no UDF. The top-word count is a
    nested HOF (count per DISTINCT word), O(n·d) per row interpreted: fine
    for the once-per-doc curation scan over natural-language docs; for
    pathological multi-MB docs compute it from the exploded token relation
    instead."""

    # split(' ') maps '' to [''] — drop empty tokens so blank/multi-space
    # docs score 0, matching a python str.split() reference
    words = F.filter(ws_tokens(text), lambda t: t != "")

    def dup_ratio(k: int) -> Column:
        if k == 1:
            grams = words
        else:
            idx = F.sequence(F.lit(1), F.size(words) - (k - 1))
            grams = F.when(
                F.size(words) >= k,
                F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, k))),
            ).otherwise(F.array().cast("array<string>"))
        n = F.size(grams)
        d = F.size(F.array_distinct(grams))
        return F.round(
            F.when(n > 0, (n - d).cast("double") / n).otherwise(0.0), 6
        )

    n1 = F.size(words)
    counts = F.transform(
        F.array_distinct(words),
        lambda w: F.size(F.filter(words, lambda x: x == w)),
    )
    top = F.round(
        F.when(n1 > 0, F.array_max(counts).cast("double") / n1).otherwise(0.0),
        6,
    )
    return {
        "dup_word_ratio": dup_ratio(1),
        "dup_2gram_ratio": dup_ratio(2),
        "dup_3gram_ratio": dup_ratio(3),
        "top_word_ratio": top,
    }


def word_shingles(text: Column, k: int = 3) -> Column:
    """Overlapping word k-grams joined by ' ' (empty array if < k words).

    Guarded: ``sequence(1, 0)`` in Spark yields a DESCENDING [1, 0], so the
    short-doc case must short-circuit to an empty array explicitly."""
    words = ws_tokens(text)
    n = F.size(words)
    idx = F.sequence(F.lit(1), n - (k - 1))
    return F.when(
        n >= k, F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, k)))
    ).otherwise(F.array().cast("array<string>"))


def fingerprint(text: Column, k: int = 5) -> Column:
    """Document fingerprint: lexicographic-min md5 over word k-grams —
    the set-min rolling-hash fingerprint (winnowing's simplest form).
    Short docs (< k words) hash the whole text."""
    sh = word_shingles(text, k)
    return F.when(F.size(sh) > 0, F.array_min(F.transform(sh, F.md5))).otherwise(
        F.md5(text)
    )


# PII detection/redaction (training-data hygiene pass). Patterns stay in
# the common Java-regex ∩ RE2 subset (character classes, bounded repeats,
# \b word boundaries — no lookaround, no backrefs) so the DuckDB oracle
# runs the IDENTICAL pattern: both engines use leftmost-first greedy
# matching here, so match sets — and therefore the redacted string and its
# md5 — agree byte-for-byte. Dict order IS the redaction order (email
# before the digit patterns so an address never half-redacts).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-category PII match counts (n_email, n_ssn, n_phone, n_ipv4).

    Counts run on the RAW text independently per pattern (a string both an
    email and something else would count twice — deterministic, and what a
    triage dashboard wants). Pure Column exprs, scan-stage at scale."""
    return {
        f"n_{k}": F.size(F.regexp_extract_all(text, F.lit(p), 0))
        for k, p in PII_PATTERNS.items()
    }


PII_PLACEHOLDERS: dict[str, str] = {
    "email": "<EMAIL>",
    "ssn": "<SSN>",
    "phone": "<PHONE>",
    "ipv4": "<IP>",
}


def redact_pii(text: Column) -> Column:
    """Replace every PII match with its placeholder, applying patterns in
    PII_PATTERNS order (placeholders contain no digits, so a later pattern
    can never re-match inside an earlier redaction)."""
    out = text
    for k, p in PII_PATTERNS.items():
        out = F.regexp_replace(out, p, PII_PLACEHOLDERS[k])
    return out


# char-trigram language profiles: the n-gram heuristic variant of lang-ID
# (the stopword variant is `lang_id`). Profiles are tiny fixed lists so
# both Spark and the SQL oracle embed them literally.
TRIGRAM_PROFILES = {
    "en": ["the", "he ", "nd ", "ing", " th"],
    "fr": ["le ", "es ", " de", "ent", "que"],
    "de": ["er ", "ein", "ich", "und", "sch"],
    "es": [" de", "la ", "os ", "as ", " el"],
}


def char_trigrams(col_name: str):
    """array<string> of overlapping 3-char shingles of a text column.

    Guarded for len<3: `sequence(1, 0)` DESCENDS in Spark ([1,0]), it is
    not empty — texts shorter than a trigram yield [] explicitly."""
    from pyspark.sql import functions as F

    return F.expr(
        f"CASE WHEN length({col_name}) >= 3 THEN"
        f" transform(sequence(1, length({col_name}) - 2),"
        f" i -> substring({col_name}, i, 3))"
        f" ELSE array() END"
    )


def lang_id_ngram(col_name: str):
    """Char-trigram language-ID: argmax of profile-trigram hits (the
    n-gram-heuristic variant; `lang_id` is the stopword variant). Ties and
    the no-hit case resolve in the fixed order en→fr→de→es→und, mirrored
    exactly by the SQL oracle."""
    from pyspark.sql import functions as F

    tg = char_trigrams(col_name)
    scores = {
        lang: F.size(
            F.filter(tg, lambda t: t.isin(TRIGRAM_PROFILES[lang]))  # noqa: B023
        )
        for lang in TRIGRAM_PROFILES
    }
    best = F.greatest(*scores.values())
    out = F.when(best == 0, "und")
    for lang in ("en", "fr", "de", "es"):
        out = out.when(scores[lang] == best, lang)
    return out.otherwise("und")
