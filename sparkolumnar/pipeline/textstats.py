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


def _batch_lang_scores(texts, profiles_hashed, n_langs):
    """(hits[lang, doc], n_tokens[doc]) for a whole batch, no per-token
    Python: all texts are concatenated into ONE byte buffer (newline-
    separated, lowercased), tokenized with the vectorized run-finder from
    dedup._token_hashes, and profile membership is a hashed np.isin."""
    import numpy as np

    from .dedup import _token_hashes

    n_docs = len(texts)
    joined = "\n".join(t.lower() for t in texts)
    enc = joined.encode("utf-8", "surrogatepass")
    # doc start byte offsets in the concatenated buffer
    doc_lens = np.fromiter((len(t.lower().encode("utf-8", "surrogatepass"))
                            for t in texts), dtype=np.int64, count=n_docs)
    doc_starts = np.zeros(n_docs, dtype=np.int64)
    if n_docs > 1:
        np.cumsum(doc_lens[:-1] + 1, out=doc_starts[1:])
    b = np.frombuffer(enc, dtype=np.uint8)
    # MUST match _token_hashes' whitespace set exactly (same tokenization)
    is_ws = (b == 32) | (b == 10) | (b == 9) | (b == 13)
    tok = ~is_ws
    tok_starts = np.flatnonzero(tok & ~np.concatenate([[False], tok[:-1]]))
    hashes = _token_hashes(joined)  # hashes whole buffer; \n splits tokens
    tok_doc = np.searchsorted(doc_starts, tok_starts, side="right") - 1
    n_tokens = np.bincount(tok_doc, minlength=n_docs).astype(np.int64)
    hits = np.zeros((n_langs, n_docs), dtype=np.int64)
    for li, prof in enumerate(profiles_hashed):
        m = np.isin(hashes, prof)
        hits[li] = np.bincount(tok_doc, weights=m, minlength=n_docs)
    return hits, n_tokens


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-profile language-ID heuristic, batch-vectorized: the whole
    Arrow batch is tokenized as one numpy buffer and profile membership is
    a hashed np.isin — no per-token (or per-row) Python.

    Exact semantics (mirrored 1:1 by the DuckDB oracle in
    __spark_entry__.oracle_sql): tokens = maximal non-whitespace runs of
    lower(text); score(lang) = |tokens in profile(lang)|; prediction =
    argmax score with lexicographically-larger lang winning ties, or
    'unknown' when 100*hits <= 3*n_tokens (integer-exact threshold);
    lang_conf = round(hits / n_tokens, 6)."""
    import numpy as np

    from .dedup import _token_hashes

    langs = sorted(_PROFILES)
    profiles_hashed = [np.sort(np.array(
        [_token_hashes(w)[0] for w in _PROFILES[k]], dtype=np.uint64))
        for k in langs]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            out = pdf.copy()
            if n == 0:
                out["lang_pred"] = pd.Series([], dtype=str)
                out["lang_conf"] = pd.Series([], dtype=float)
                yield out
                continue
            hits, n_tok = _batch_lang_scores(
                list(pdf[text_col]), profiles_hashed, len(langs))
            best_hits = np.zeros(n, dtype=np.int64)
            best_lang = np.zeros(n, dtype=np.int64)
            for li in range(len(langs)):  # ascending: later (larger) lang
                upd = hits[li] >= best_hits  # wins ties, like max((s, k))
                best_hits[upd] = hits[li][upd]
                best_lang[upd] = li
            known = 100 * best_hits > 3 * n_tok  # integer-exact threshold
            preds = np.where(known & (n_tok > 0),
                             np.array(langs, dtype=object)[best_lang],
                             "unknown")
            conf = np.where(n_tok > 0,
                            np.round(best_hits / np.maximum(n_tok, 1), 6),
                            0.0)
            out["lang_pred"] = preds
            out["lang_conf"] = conf
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


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Repetition/boilerplate signal per document: word-3-gram shingle
    count vs DISTINCT shingle count (their gap counts repeated 3-grams —
    the standard duplicate-n-gram quality feature for web-scale corpus
    filtering). Entirely JVM expressions (tokenize -> shingle transform ->
    array_distinct), whole-stage codegen, SQL-reproducible bit-for-bit;
    same shingle construction as the minhash word-gram family
    (pipeline/dedup.py)."""
    from .dedup import _TOKS_EXPR

    toks = F.expr(_TOKS_EXPR.format(col=text_col))
    sh = F.expr(
        "CASE WHEN size(__toks) >= 3 THEN "
        "  transform(sequence(0, size(__toks) - 3),"
        "            i -> concat_ws(' ', __toks[i], __toks[i+1], __toks[i+2]))"
        " WHEN size(__toks) >= 1 THEN array(concat_ws(' ', __toks))"
        " ELSE array('') END")
    out = (df.withColumn("__toks", toks)
           .withColumn("__sh", sh)
           .withColumn("n_shingles", F.size("__sh").cast("long"))
           .withColumn("n_distinct_shingles",
                       F.size(F.array_distinct("__sh")).cast("long"))
           .withColumn("n_repeated",
                       (F.col("n_shingles")
                        - F.col("n_distinct_shingles")).cast("long"))
           .drop("__toks", "__sh"))
    return out


def winnow_fingerprints(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 5, window: int = 4,
                        base: int = 1_000_003,
                        mod: int = (1 << 31) - 1) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
    2003 — the MOSS technique): polynomial ROLLING HASHES of the k
    code-point grams, a sliding minimum over every `window` consecutive
    hashes, and the DISTINCT window-minima values as the document's
    fingerprint set. Guarantees of the paper: any shared substring of
    length >= window + k - 1 between two documents yields at least one
    shared fingerprint, so a fingerprint equi-join is a scale-safe
    fuzzy-duplicate candidate generator (bucketed, not all-pairs) that
    complements the MinHash family in pipeline/dedup.py.

    h(i) = sum_j cp[i+j] * base^(k-1-j) mod `mod` over UTF code points
    — integer-exact and term-orderable, so a DuckDB oracle recomputes
    every fingerprint bit-for-bit (oracle query winnow_fingerprint_
    profile). One mapInPandas pass, vectorized ACROSS documents (the
    _shingle_hashes discipline): one concatenated code-point buffer per
    batch, boundary-straddling grams and windows masked out, per-doc
    distinct minima via one global lexsort — no per-document Python
    loop in the hot path.

    Returns (id_col, fp) exploded, one row per fingerprint."""
    import numpy as np

    if k < 1 or window < 1:
        raise ValueError("k and window must be >= 1")
    powers = np.array([pow(base, k - 1 - j, mod) for j in range(k)],
                      dtype=np.uint64)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        sw = np.lib.stride_tricks.sliding_window_view
        for pdf in batches:
            encs = [str(t).encode("utf-32-le") for t in pdf[text_col]]
            lens = np.array([len(e) // 4 for e in encs], dtype=np.int64)
            ids_all = pdf[id_col].to_numpy()
            keep = lens >= k
            if not keep.any():
                yield pd.DataFrame({id_col: np.array([], dtype=np.int64),
                                    "fp": np.array([], dtype=np.int64)})
                continue
            doc_ids = ids_all[keep].astype(np.int64)
            dl = lens[keep]
            cps = np.frombuffer(
                b"".join(e for e, m in zip(encs, keep) if m),
                dtype="<u4").astype(np.uint64)
            # k-gram hashes over the ONE concatenated buffer; a gram
            # starting within k-1 of a doc's end would straddle — drop
            n_h = dl - k + 1                     # valid grams per doc
            starts = np.cumsum(dl) - dl          # doc starts in cps
            g = sw(cps, k)                       # (N-k+1, k) view
            h_all = (g * powers % mod).sum(axis=1) % mod
            didx = np.repeat(np.arange(len(dl)), n_h)
            gpos = (np.arange(n_h.sum())
                    - np.repeat(np.cumsum(n_h) - n_h, n_h)
                    + np.repeat(starts, n_h))
            h = h_all[gpos]                      # compacted per-doc runs
            # sliding minima over each doc's contiguous hash run: windows
            # are positions in the COMPACTED array; one crossing a doc
            # boundary is masked. Short docs (< window hashes) take the
            # doc-wide min, matching the per-doc formula exactly.
            long = n_h >= window
            mins_parts = []
            min_docs = []
            if long.any():
                wmins = sw(h, window).min(axis=1)
                wdoc = didx[:len(wmins)]
                ok = wdoc == didx[window - 1:]   # window inside one doc
                mins_parts.append(wmins[ok])
                min_docs.append(wdoc[ok])
            if (~long).any():
                # reduceat segments must be contiguous: reduce over
                # EVERY doc's run, then select the short docs
                seg_starts = np.cumsum(n_h) - n_h
                shorts = np.flatnonzero(~long)
                mins_parts.append(
                    np.minimum.reduceat(h, seg_starts)[shorts])
                min_docs.append(shorts)
            mv = np.concatenate(mins_parts)
            md = np.concatenate(min_docs)
            # per-doc distinct: one global lexsort + consecutive dedupe
            order = np.lexsort((mv, md))
            ds, vs = md[order], mv[order]
            keep2 = np.ones(len(ds), dtype=bool)
            keep2[1:] = (ds[1:] != ds[:-1]) | (vs[1:] != vs[:-1])
            ds, vs = ds[keep2], vs[keep2]
            yield pd.DataFrame({id_col: doc_ids[ds],
                                "fp": vs.astype(np.int64)})

    return df.select(id_col, text_col).mapInPandas(
        fn, f"{id_col} long, fp long")
