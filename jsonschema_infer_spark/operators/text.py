"""Text-analysis operators for large-scale training-data pipelines.

All hot-path functions are pure Spark Column expressions (JVM-side,
whole-stage codegen) — language ID, quality scoring, token counting and
fingerprinting run as part of a single scan with no Python in the loop.
Each has an ANSI-SQL twin in __spark_entry__.oracle_sql() so the driver can
cross-check against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# tiny per-language marker-word sets for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "que"],
    "de": ["der", "die", "und", "ist", "das", "ein", "nicht", "mit"],
    "es": ["el", "la", "los", "y", "es", "una", "que", "con"],
}


def token_count(col: Column) -> Column:
    """Whitespace token count; empty/blank strings count 0."""
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token estimate: count of word/number/punct chunks by a
    BPE-like regex (letters runs, digit runs, single punct)."""
    return F.size(
        F.regexp_extract_all(col, F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), 0)
    )


def _marker_hits(col: Column, words: list) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(col), F.lit(pat))


def lang_id(col: Column) -> Column:
    """Heuristic language ID: most marker-word hits wins; 'und' when no
    marker hits. Deterministic tie-break: language key order en,fr,de,es."""
    hits = [(_marker_hits(col, ws), lang) for lang, ws in LANG_MARKERS.items()]
    best = hits[0][0]
    best_lang = F.lit(hits[0][1])
    for h, lang in hits[1:]:
        best_lang = F.when(h > best, F.lit(lang)).otherwise(best_lang)
        best = F.when(h > best, h).otherwise(best)
    return F.when(best <= 0, F.lit("und")).otherwise(best_lang)


def quality_features(df: DataFrame, text_col: str = "text", keep: list | None = None) -> DataFrame:
    """Per-document quality features in one vectorized scan:
    n_chars, n_tokens, mean token length, punctuation count/ratio,
    uppercase ratio, stopword(en) ratio, and a composite quality score."""
    c = F.col(text_col)
    n_chars = F.length(c)
    n_tokens = token_count(c)
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[\.,;:!\?]", ""))
    n_upper = F.length(c) - F.length(F.regexp_replace(c, r"[A-Z]", ""))
    n_alpha = F.length(c) - F.length(F.regexp_replace(c, r"[A-Za-z]", ""))
    n_stop = _marker_hits(c, LANG_MARKERS["en"])
    safe = lambda num, den: F.when(den > 0, num / den).otherwise(F.lit(0.0))  # noqa: E731
    feats = {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": F.round(safe(n_chars.cast("double"), n_tokens), 4),
        "punct_ratio": F.round(safe(n_punct.cast("double"), n_chars), 4),
        "upper_ratio": F.round(safe(n_upper.cast("double"), n_chars), 4),
        "alpha_ratio": F.round(safe(n_alpha.cast("double"), n_chars), 4),
        "stopword_ratio": F.round(safe(n_stop.cast("double"), n_tokens), 4),
    }
    out = df.select(*(keep or df.columns), *(v.alias(k) for k, v in feats.items()))
    score = (
        F.when(F.col("n_tokens") < 5, 0.0)
        .when(F.col("alpha_ratio") < 0.5, 0.2)
        .otherwise(
            F.least(
                F.lit(1.0),
                F.round(
                    0.4 * F.least(F.col("n_tokens") / 100.0, F.lit(1.0))
                    + 0.3 * F.col("alpha_ratio")
                    + 0.3 * F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0)),
                    4,
                ),
            )
        )
    )
    return out.withColumn("quality_score", F.round(score, 4))


def repetition_features(
    df: DataFrame, text_col: str = "text", keep: list | None = None
) -> DataFrame:
    """Intra-document repetition features (the Gopher-rules family): the
    fraction of non-blank lines that repeat an earlier line, the fraction
    of characters inside those repeated lines, and the duplicate word
    2-gram / 3-gram occurrence fractions. ``repetitive`` flags documents
    over the published thresholds (dup lines > 0.30 or dup line chars
    > 0.20 or dup 2-grams > 0.20).

    Pure Column expressions, no shuffle, no Python. Two projections, not
    one: higher-order functions (transform/filter/aggregate) are evaluated
    INTERPRETED per occurrence — Spark never codegens them and common-
    subexpression elimination does not reach across aggregate-expression
    trees — so the line/n-gram arrays are materialized once in a first
    projection and every feature reads the materialized column (measured
    ~50x on 5k short docs: the single-projection form re-ran each
    split/transform chain per referencing feature)."""
    c = F.col(text_col)
    lines = F.filter(
        F.transform(F.split(c, "\n"), lambda l: F.trim(l)),
        lambda l: F.length(l) > 0,
    )
    toks = F.split(normalize_text(c), " ")
    cnt = F.size(toks)

    def ngrams(n: int):
        idx = F.sequence(F.lit(0), F.greatest(cnt - n, F.lit(0)))
        return F.filter(
            F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")),
            lambda s: F.size(F.split(s, " ")) == n,
        )

    arrays = df.select(
        *(keep or df.columns),
        lines.alias("_lines"),
        F.array_distinct(lines).alias("_dlines"),
        ngrams(2).alias("_g2"),
        ngrams(3).alias("_g3"),
    )

    sum_len = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0), lambda acc, x: acc + F.length(x)
    )
    safe = lambda num, den: F.round(  # noqa: E731
        F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0)), 4
    )
    n_lines = F.size(F.col("_lines"))
    chars_all = sum_len(F.col("_lines"))

    def dup_frac(col_name):
        g = F.col(col_name)
        return safe(F.size(g) - F.size(F.array_distinct(g)), F.size(g))

    feats = {
        "n_lines": n_lines,
        "dup_line_frac": safe(n_lines - F.size(F.col("_dlines")), n_lines),
        "dup_line_char_frac": safe(chars_all - sum_len(F.col("_dlines")), chars_all),
        "dup_2gram_frac": dup_frac("_g2"),
        "dup_3gram_frac": dup_frac("_g3"),
    }
    out = arrays.select(
        *(keep or df.columns), *(v.alias(k) for k, v in feats.items())
    )
    return out.withColumn(
        "repetitive",
        (F.col("dup_line_frac") > 0.30)
        | (F.col("dup_line_char_frac") > 0.20)
        | (F.col("dup_2gram_frac") > 0.20),
    )


def normalize_text(col: Column) -> Column:
    """Canonical form for exact-ish dedup: lowercase, collapse whitespace,
    strip leading/trailing space."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text
    (portable across engines — DuckDB md5() agrees byte-for-byte)."""
    return F.md5(normalize_text(col))


def rolling_fingerprint(col: Column, window: int = 8) -> Column:
    """Winnowing-style content fingerprint: md5 over the sequence of
    per-window-min token hashes — robust to small edits at the ends.
    Pure Spark expressions: tokens -> xxhash64 -> sliding-window mins."""
    tokens = F.split(normalize_text(col), " ")
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))
    n = F.size(hashes)
    idx = F.sequence(F.lit(0), F.greatest(n - window, F.lit(0)))
    mins = F.transform(
        idx, lambda i: F.array_min(F.slice(hashes, i + 1, window))
    )
    return F.md5(F.to_json(mins))
