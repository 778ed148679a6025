"""Text-analysis primitives over a documents table, built from JVM-side
expressions wherever the semantics allow (whole-stage codegen, SQL-oracle
checkable) and numpy-vectorized UDFs only where they don't.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

# tiny deterministic stopword profiles for the language-ID heuristic
_PROFILES = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "it", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "que", "pour"],
    "es": ["el", "la", "los", "que", "de", "no", "una", "por", "con"],
}


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish subword estimate per row (pure
    JVM expressions; the subword estimate counts alphanumeric runs and
    digits/punctuation as separate tokens, a common pre-tokenizer proxy)."""
    ws_tokens = F.when(F.length(text_col) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.col(text_col), r"\s+")))
    subword = (F.length(F.regexp_replace(F.col(text_col), r"[A-Za-z0-9]+", "x"))
               ).cast("long")
    return df.withColumn("ws_tokens", ws_tokens.cast("long")) \
             .withColumn("subword_tokens_est", subword)


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + composite
    score in [0,1]; all JVM-side (SQL-expressible, oracle-checkable)."""
    length = F.length(text_col).cast("double")
    n_punct = length - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    words = F.when(F.length(text_col) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.col(text_col), r"\s+"))).cast("double")
    stop_hits = sum(
        (F.size(F.split(F.concat(F.lit(" "), F.lower(text_col), F.lit(" ")),
                        f" {w} ")) - 1).cast("double")
        for w in _PROFILES["en"])
    punct_ratio = F.when(length > 0, n_punct / length).otherwise(F.lit(0.0))
    stop_ratio = F.when(words > 0, stop_hits / words).otherwise(F.lit(0.0))
    len_score = F.least(length / F.lit(1000.0), F.lit(1.0))
    score = (F.lit(0.4) * len_score
             + F.lit(0.4) * F.least(stop_ratio * 4, F.lit(1.0))
             + F.lit(0.2) * (F.lit(1.0) - F.least(punct_ratio * 5, F.lit(1.0))))
    return (df.withColumn("n_chars_text", length.cast("long"))
            .withColumn("punct_ratio", F.round(punct_ratio, 6))
            .withColumn("stopword_ratio", F.round(stop_ratio, 6))
            .withColumn("quality", F.round(score, 6)))


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-profile language-ID heuristic (vectorized pandas UDF —
    per-language token-set membership over the batch token matrix)."""
    profiles = {k: set(v) for k, v in _PROFILES.items()}

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            langs = []
            confs = []
            for t in pdf[text_col]:
                toks = t.lower().split()
                if not toks:
                    langs.append("unknown")
                    confs.append(0.0)
                    continue
                scores = {k: sum(tok in prof for tok in toks) / len(toks)
                          for k, prof in profiles.items()}
                best = max(scores, key=lambda k: (scores[k], k))
                langs.append(best if scores[best] > 0.03 else "unknown")
                confs.append(round(scores[best], 6))
            out = pdf.copy()
            out["lang_pred"] = langs
            out["lang_conf"] = confs
            yield out

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    return df.mapInPandas(fn, f"{fields}, lang_pred string, lang_conf double")


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase text
    (JVM-side; oracle-checkable), plus a 64-bit rolling-hash fingerprint
    (xxhash64) for cheap joins."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return (df.withColumn("fp_md5", F.md5(norm))
            .withColumn("fp64", F.xxhash64(norm)))
