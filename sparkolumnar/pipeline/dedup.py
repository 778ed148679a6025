"""Deduplication operators.

* exact_dedup — hash-groupBy exact dedup (pure JVM-side expressions;
  Catalyst handles partial aggregation, AQE handles skew).
* MinHash-LSH — shingle -> minhash signature (vectorized numpy inside
  mapInPandas) -> band buckets -> self-join on (band, bucket) to get
  candidate pairs. Scale shape: the only shuffle is on bucket keys, and
  bucket cardinality ~ n_docs * bands, so it scales linearly; no
  cross-join anywhere.
* SimHash — 64-bit simhash over token hashes; near-dup candidates share a
  16-bit band (hamming <= 3 within 4 bands guarantee).
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

_M61 = (1 << 61) - 1


def exact_dedup(df: DataFrame, cols: List[str], keep_col: str) -> DataFrame:
    """Keep one row (min keep_col) per distinct value tuple of `cols`."""
    key = F.sha2(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]), 256)
    w = df.withColumn("__key", key)
    winners = w.groupBy("__key").agg(F.min(keep_col).alias(keep_col))
    return (w.join(winners, ["__key", keep_col], "left_semi")
            .drop("__key"))


_SHINGLE_CHUNK_BYTES = 2 << 20  # ~2 MiB of text per vectorized chunk:
#                                 cache-resident working sets multi-core
#                                 scale on this host (CLAUDE.md quirks)


def _shingle_hashes(texts: pd.Series, k: int) -> List[np.ndarray]:
    """k-byte shingle hashes per doc — sorted unique per doc.

    Vectorized ACROSS documents (r4-verdict item #6, the
    textstats._batch_lang_scores pattern): docs are concatenated into
    one byte buffer per ~2 MiB chunk, the rolling polynomial hash runs
    in k vectorized steps over the WHOLE chunk (identical values to the
    per-doc formula — position i only touches bytes i..i+k-1, and
    boundary-straddling windows are excluded), and per-doc dedup is one
    global lexsort + neighbor-diff instead of per-doc np.unique. The
    only remaining Python loops are per-CHUNK (dozens per batch) and
    trivial per-doc slice views. Short docs (< k bytes) hash via a
    masked vectorized FNV over a padded byte matrix — one loop over the
    ≤ k-1 byte POSITIONS, not over docs (a zero sentinel would make all
    short docs look identical to each other)."""
    B = np.uint64(1099511628211)
    encs = [t.encode("utf-8", "surrogatepass") for t in texts]
    lens = np.array([len(e) for e in encs], dtype=np.int64)
    out: List = [None] * len(encs)

    short = np.nonzero(lens < k)[0]
    if len(short):
        ml = int(lens[short].max())
        mat = np.zeros((len(short), max(ml, 1)), dtype=np.uint8)
        for r, i in enumerate(short):
            if lens[i]:
                mat[r, :lens[i]] = np.frombuffer(encs[i], np.uint8)
        h = np.full(len(short), np.uint64(1469598103934665603),
                    dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(ml):
                alive = lens[short] > j
                hj = (h ^ mat[:, j].astype(np.uint64)) * B
                h = np.where(alive, hj, h)
        for r, i in enumerate(short):
            out[i] = h[r:r + 1].copy()

    long_idx = np.nonzero(lens >= k)[0]
    c0 = 0
    while c0 < len(long_idx):
        c1, tot = c0, 0
        while c1 < len(long_idx) and (tot < _SHINGLE_CHUNK_BYTES
                                      or c1 == c0):
            tot += lens[long_idx[c1]]
            c1 += 1
        idx = long_idx[c0:c1]
        c0 = c1
        buf = np.frombuffer(b"".join(encs[i] for i in idx), np.uint8)
        dl = lens[idx]
        n = len(buf)
        h = np.zeros(n - k + 1, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(k):
                h = h * B + buf[j: n - k + 1 + j]
        counts = dl - k + 1  # valid (non-straddling) starts per doc
        ends = np.cumsum(dl)
        didx = np.repeat(np.arange(len(idx)), counts)
        base = np.repeat(ends - dl, counts)
        csum = np.cumsum(counts)
        within = np.arange(csum[-1]) - np.repeat(csum - counts, counts)
        hv = h[base + within]
        order = np.lexsort((hv, didx))
        ds, hs = didx[order], hv[order]
        keep = np.ones(len(ds), dtype=bool)
        keep[1:] = (ds[1:] != ds[:-1]) | (hs[1:] != hs[:-1])
        ds, hu = ds[keep], hs[keep]
        bounds = np.searchsorted(ds, np.arange(len(idx) + 1))
        for r, i in enumerate(idx):
            out[i] = hu[bounds[r]:bounds[r + 1]]
    return out


def minhash_signatures(df: DataFrame, text_col: str, id_col: str,
                       n_hashes: int = 64, shingle: int = 5) -> DataFrame:
    """id -> minhash signature array<long>, computed batch-vectorized."""
    rng = np.random.default_rng(0xC0FFEE)
    a = rng.integers(1, _M61, n_hashes, dtype=np.uint64)
    b = rng.integers(0, _M61, n_hashes, dtype=np.uint64)

    CH = 1 << 16  # shingles per chunk: (n_hashes, CH) u64 matrix ~32 MB

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hs_list = _shingle_hashes(pdf[text_col], shingle)
            sigs = []
            i = 0
            while i < len(hs_list):
                # cross-DOC vectorization, memory-bounded: the
                # (n_hashes, n_shingles) universal-hash matrix covers a
                # whole chunk of docs, segment row-mins via reduceat
                j, tot = i, 0
                while j < len(hs_list) and (tot < CH or j == i):
                    tot += len(hs_list[j])
                    j += 1
                allh = np.concatenate(hs_list[i:j])
                cnts = np.array([len(x) for x in hs_list[i:j]],
                                dtype=np.int64)
                with np.errstate(over="ignore"):
                    m = (allh[None, :] * a[:, None]
                         + b[:, None]) % np.uint64(_M61)
                starts = np.concatenate(([0], np.cumsum(cnts[:-1])))
                mins = np.minimum.reduceat(m, starts, axis=1)
                minsT = np.ascontiguousarray(mins.T).view(np.int64)
                sigs.extend(minsT[c] for c in range(len(cnts)))
                i = j
            yield pd.DataFrame({id_col: pdf[id_col].values,
                                "signature": [s.tolist() for s in sigs]})

    schema = f"{id_col} long, signature array<long>"
    return df.select(id_col, text_col).mapInPandas(fn, schema)


def minhash_neardup_pairs(df: DataFrame, text_col: str, id_col: str,
                          n_hashes: int = 64, bands: int = 16,
                          shingle: int = 5,
                          threshold: float = 0.7,
                          max_bucket: int = 256) -> DataFrame:
    """Candidate near-dup pairs via LSH banding, with the estimated jaccard
    (fraction of matching minhashes) filtered at `threshold`.

    Returns (a, b, est_jaccard) with a < b, deduplicated across bands.

    Scale shape (the 100 TB rules):
    * band rows carry IDS ONLY — the 64-long signatures never ride the
      band self-join shuffle (which multiplies volume by `bands`);
      signatures are re-joined exactly once per side AFTER the (a, b)
      pair dedup, when the pair set is small;
    * hot-bucket cap: buckets larger than `max_bucket` are dropped via a
      broadcast anti-join (the per-(band,bucket) count is a cheap
      map-side-combined aggregation of id-free rows). A bucket of k
      mass-duplicated boilerplate docs would otherwise emit k^2/2 pairs —
      run exact_dedup first; the cap is the quadratic-blowup safety valve.
    """
    rows_per_band = n_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, n_hashes, shingle).cache()
    band_idx = F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band")
    banded = (sigs.select(id_col, "signature", band_idx)
              .withColumn("bucket", F.xxhash64(
                  F.slice("signature",
                          F.col("band") * rows_per_band + 1, rows_per_band),
                  F.col("band")))
              .select(id_col, "band", "bucket"))  # ids only past this point
    hot = (banded.groupBy("band", "bucket").count()
           .filter(F.col("count") > max_bucket)
           .select("band", "bucket"))
    banded = banded.join(F.broadcast(hot), ["band", "bucket"], "left_anti")
    left = banded.select(F.col(id_col).alias("a"), "band", "bucket")
    right = banded.select(F.col(id_col).alias("b"), "band", "bucket")
    pairs = (left.join(right, ["band", "bucket"])
             .filter(F.col("a") < F.col("b"))
             .select("a", "b")
             .dropDuplicates(["a", "b"]))
    sig_a = sigs.select(F.col(id_col).alias("a"),
                        F.col("signature").alias("sig_a"))
    sig_b = sigs.select(F.col(id_col).alias("b"),
                        F.col("signature").alias("sig_b"))
    pairs = pairs.join(sig_a, "a").join(sig_b, "b")
    matches = F.size(F.filter(F.zip_with(
        "sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        lambda v: v == 1))
    return (pairs.withColumn("est_jaccard", matches / F.lit(float(n_hashes)))
            .filter(F.col("est_jaccard") >= threshold)
            .select("a", "b", "est_jaccard"))


def ngram_jaccard_verify(df: DataFrame, pairs: DataFrame, text_col: str,
                         id_col: str, shingle: int = 5) -> DataFrame:
    """Exact k-gram Jaccard for candidate pairs (a, b): joins texts in,
    computes |A∩B| / |A∪B| over the shingle-hash sets vectorized
    (np.intersect1d on the unique-hash arrays). Use after minhash banding
    to turn estimates into exact similarities.
    """
    a_txt = df.select(F.col(id_col).alias("a"), F.col(text_col).alias("ta"))
    b_txt = df.select(F.col(id_col).alias("b"), F.col(text_col).alias("tb"))
    joined = pairs.join(a_txt, "a").join(b_txt, "b").select("a", "b", "ta", "tb")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ha = _shingle_hashes(pdf["ta"], shingle)
            hb = _shingle_hashes(pdf["tb"], shingle)
            inters, unions, jac = [], [], []
            for x, y in zip(ha, hb):
                inter = len(np.intersect1d(x, y, assume_unique=True))
                union = len(x) + len(y) - inter
                inters.append(inter)
                unions.append(union)
                jac.append(inter / union if union else 1.0)
            yield pd.DataFrame({"a": pdf["a"].values, "b": pdf["b"].values,
                                "n_inter": np.array(inters, np.int64),
                                "n_union": np.array(unions, np.int64),
                                "jaccard": np.round(jac, 6)})

    return joined.mapInPandas(
        fn, "a long, b long, n_inter long, n_union long, jaccard double")


def _token_hashes(text: str) -> np.ndarray:
    """Deterministic 64-bit polynomial hash per whitespace token,
    vectorized over the whole document (no per-token Python loop)."""
    b = np.frombuffer(text.lower().encode("utf-8", "surrogatepass"),
                      dtype=np.uint8)
    if len(b) == 0:
        return np.zeros(0, dtype=np.uint64)
    is_ws = (b == 32) | (b == 10) | (b == 9) | (b == 13)
    tok = ~is_ws
    starts = np.flatnonzero(tok & ~np.concatenate([[False], tok[:-1]]))
    ends = np.flatnonzero(tok & ~np.concatenate([tok[1:], [False]])) + 1
    if len(starts) == 0:
        return np.zeros(0, dtype=np.uint64)
    B = np.uint64(1099511628211)
    # h(token) = sum b[i] * B^(end-1-i): weights depend on distance from
    # token end; add.reduceat sums per token (uint64 wraparound is the hash)
    tok_id = np.searchsorted(starts, np.arange(len(b)), side="right") - 1
    pos_from_end = ends[tok_id] - 1 - np.arange(len(b))
    max_len = int((ends - starts).max())
    W = np.ones(max_len, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(1, max_len):
            W[i] = W[i - 1] * B
        # non-token positions (leading/interior whitespace) carry junk indices;
        # clip them — their contribution is zeroed by the np.where anyway
        widx = np.clip(pos_from_end, 0, max_len - 1)
        contrib = np.where(tok, b.astype(np.uint64) * W[widx], 0)
        sums = np.add.reduceat(contrib, starts)
    return sums


_TOKS_EXPR = "filter(split(lower({col}), '\\\\s+'), x -> x != '')"


def simhash64_md5(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash computed ENTIRELY in JVM expressions (whole-stage
    codegen, SQL-expressible — the DuckDB oracle recomputes it exactly):
    tokens -> md5 -> high 64 bits -> per-bit votes -> sign -> packed long.

    This is the oracle-checkable twin of simhash_buckets (whose numpy
    polynomial hash is faster per batch but not SQL-reproducible). Shape:
    one explode + one hash-aggregate over (id, 64 conditional sums) — no
    driver data, no Python workers, scales like any groupBy."""
    toks = F.expr(_TOKS_EXPR.format(col=text_col))
    ex = df.select(F.col(id_col), F.explode_outer(toks).alias("tok"))
    ex = ex.withColumn("h", F.md5("tok"))
    votes = []
    for j in range(64):
        c = 16 - j // 4  # 1-based hex char (of the first 16) holding bit j
        nib = F.conv(F.substring("h", c, 1), 16, 10).cast("long")
        bit = F.shiftright(nib, j % 4).bitwiseAND(F.lit(1))
        votes.append(F.sum(bit * 2 - 1).alias(f"v{j}"))
    agg = ex.groupBy(id_col).agg(*votes)
    sim = None
    for j in range(64):
        term = F.when(F.col(f"v{j}") > 0,
                      F.shiftleft(F.lit(1).cast("long"), j)).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim.bitwiseOR(term)
    return (agg.select(F.col(id_col), sim.alias("simhash"))
            .withColumn("band0", F.col("simhash").bitwiseAND(F.lit(0xFFFF).cast("long"))))


def minhash_wordgram_signatures(df: DataFrame, text_col: str, id_col: str,
                                n_hashes: int = 8) -> DataFrame:
    """Deterministic, SQL-reproducible MinHash variant over word 3-gram
    shingles: sig_i = min over shingles of the 60-bit integer read from
    md5(i || '|' || shingle). Entirely JVM expressions (explode + one
    hash-aggregate of conditional mins) so a DuckDB oracle recomputes it
    bit-for-bit — the correctness gate for the minhash family (the
    production path minhash_signatures uses faster numpy universal
    hashing with the same algorithmic shape)."""
    toks = F.expr(_TOKS_EXPR.format(col=text_col))
    sh = F.expr(
        "CASE WHEN size(__toks) >= 3 THEN "
        "  transform(sequence(0, size(__toks) - 3),"
        "            i -> concat_ws(' ', __toks[i], __toks[i+1], __toks[i+2]))"
        " WHEN size(__toks) >= 1 THEN array(concat_ws(' ', __toks))"
        " ELSE array('') END")
    ex = (df.select(F.col(id_col), toks.alias("__toks"))
          .select(F.col(id_col), F.explode(sh).alias("sh"))
          .select(F.col(id_col), F.explode(
              F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("i"), "sh"))
    h60 = F.conv(F.substring(F.md5(F.concat_ws("|", F.col("i").cast("string"),
                                               F.col("sh"))), 2, 15),
                 16, 10).cast("long")
    ex = ex.withColumn("h", h60)
    mins = [F.min(F.when(F.col("i") == i, F.col("h"))).alias(f"h{i}")
            for i in range(n_hashes)]
    return ex.groupBy(id_col).agg(*mins)


def minhash_wordgram_neardup_pairs(df: DataFrame, text_col: str,
                                   id_col: str, n_hashes: int = 8,
                                   bands: int = 4) -> DataFrame:
    """LSH-banded near-dup candidates over the DETERMINISTIC md5 word-gram
    signatures (minhash_wordgram_signatures) — the oracle-checkable twin
    of minhash_neardup_pairs: every step (signatures, band keys, the band
    self-join, the matching-component estimate) is recomputable bit-for-
    bit in SQL. Same scale shape as the production path: band rows carry
    (id, band, band-key) only, the only shuffle is the equi-join on the
    band key, pairs dedup across bands before the signatures rejoin.

    Returns (a, b, n_match, est_jaccard) with a < b; n_match = how many
    of the n_hashes signature components match (integer, so downstream
    aggregates stay exactly cross-engine-comparable), est_jaccard =
    n_match / n_hashes."""
    rows = n_hashes // bands
    sigs = minhash_wordgram_signatures(df, text_col, id_col, n_hashes)
    sig_arr = F.array(*[F.col(f"h{i}") for i in range(n_hashes)])
    banded = (sigs.select(F.col(id_col), sig_arr.alias("sig"))
              .select(F.col(id_col), "sig",
                      F.explode(F.sequence(F.lit(0), F.lit(bands - 1)))
                      .alias("band"))
              .withColumn("key", F.slice("sig", F.col("band") * rows + 1,
                                         rows))
              .select(id_col, "band", "key"))
    left = banded.select(F.col(id_col).alias("a"), "band", "key")
    right = banded.select(F.col(id_col).alias("b"), "band", "key")
    pairs = (left.join(right, ["band", "key"])
             .filter(F.col("a") < F.col("b"))
             .select("a", "b")
             .dropDuplicates(["a", "b"]))
    sig_a = sigs.select(F.col(id_col).alias("a"), sig_arr.alias("sig_a"))
    sig_b = sigs.select(F.col(id_col).alias("b"), sig_arr.alias("sig_b"))
    pairs = pairs.join(sig_a, "a").join(sig_b, "b")
    matches = F.size(F.filter(F.zip_with(
        "sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        lambda v: v == 1))
    return (pairs
            .withColumn("n_match", matches.cast("long"))
            .withColumn("est_jaccard",
                        F.col("n_match") / F.lit(float(n_hashes)))
            .select("a", "b", "n_match", "est_jaccard"))


def connected_components(pairs: DataFrame, nodes: DataFrame,
                         id_col: str = "id",
                         max_iter: int = 25,
                         checkpoint: str = "local") -> DataFrame:
    """Resolve candidate near-dup PAIRS into duplicate GROUPS:
    (id, group_id) where group_id is the minimum id in the pair-graph's
    connected component (singletons map to themselves).

    Iterative min-label propagation with POINTER DOUBLING — a loop of
    join + min-aggregate + one label self-join until fixpoint, no graph
    library:

      labels[v] <- min(labels[v],
                       min over neighbors u of labels[u],
                       labels[labels[v]])        # path halving

    The labels[labels[v]] hop is the pointer-doubling step: the distance
    a minimum travels along a chain doubles each round, so even an
    adversarial path graph converges in O(log V) rounds instead of
    O(diameter) — the same bound the alternating large-star/small-star
    contraction achieves (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC 2014) with one self-join instead of two
    re-grouping passes, and it degrades to a no-op on the shallow dense
    components real near-dup graphs produce.

    Scale shape: each round is one equi-join of the (src, dst) edge list
    against the label table, one map-side-combinable min-aggregate, and
    one O(V) label self-join — shuffle O(E + V) per round, label state
    O(V), nothing driver-side but the convergence flag.

    checkpoint: how each round's labels are pinned so the plan does not
    grow with iterations. "local" (default) stores blocks on executors —
    fast, but an executor loss mid-loop fails the job; "reliable" uses
    spark's fault-tolerant checkpoint (requires
    spark.sparkContext.setCheckpointDir — HDFS/S3 on a real cluster), the
    right setting for 1000-executor runs; "none" lets lineage grow
    (tests/tiny graphs only).

    pairs: DataFrame with columns (a, b) — undirected candidate edges.
    nodes: DataFrame carrying every id in `id_col` (including docs in no
    pair — they become singleton groups).
    """
    if checkpoint not in ("local", "reliable", "none"):
        raise ValueError(
            f"checkpoint={checkpoint!r}: one of 'local', 'reliable', "
            f"'none'")
    if checkpoint == "reliable" \
            and pairs.sparkSession.sparkContext.getCheckpointDir() is None:
        raise ValueError(
            "checkpoint='reliable' needs "
            "spark.sparkContext.setCheckpointDir(...) — a cluster-visible "
            "path (HDFS/S3) so the loop survives executor loss")

    def _pin(df):
        if checkpoint == "reliable":
            return df.checkpoint()
        if checkpoint == "local":
            return df.localCheckpoint()
        return df

    edges = (pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
             .union(pairs.select(F.col("b").alias("src"),
                                 F.col("a").alias("dst")))
             .distinct())
    edges = (edges.localCheckpoint(eager=False)
             if checkpoint == "local" else _pin(edges))
    labels = (nodes.select(F.col(id_col).alias("__id"))
              .distinct()
              .withColumn("__label", F.col("__id")))
    converged = False
    for _ in range(max_iter):
        prop = (edges.join(labels.select(F.col("__id").alias("src"),
                                         "__label"), "src")
                .select(F.col("dst").alias("__id"), "__label"))
        mins = (labels.select("__id", "__label").union(prop)
                .groupBy("__id").agg(F.min("__label").alias("__label")))
        # pointer doubling: follow the label's own label. Every label
        # value IS a node id, so the self-join always matches, and
        # labels only ever decrease (label[l] <= l) — least() is safe
        hop = mins.select(F.col("__id").alias("__l"),
                          F.col("__label").alias("__ll"))
        new = (mins.join(hop, mins["__label"] == hop["__l"], "left")
               .select("__id",
                       F.least("__label", "__ll").alias("__label")))
        new = _pin(new)  # truncate lineage: O(1) plan per round
        changed = (new.join(labels.withColumnRenamed("__label", "__old"),
                            "__id")
                   .where(F.col("__label") < F.col("__old")))
        labels = new
        if changed.isEmpty():
            converged = True
            break
    if not converged:
        # unconverged labels would silently split groups — be loud (a
        # component with diameter > max_iter means the input is not a
        # near-dup pair graph; raise max_iter or pre-thin the edges)
        import warnings

        warnings.warn(
            f"connected_components did not converge within {max_iter} "
            f"rounds; group_ids may split long-chain components — raise "
            f"max_iter", stacklevel=2)
    return labels.select(F.col("__id").alias(id_col),
                         F.col("__label").alias("group_id"))


def dedup_groups(pairs: DataFrame, nodes: DataFrame, id_col: str = "id",
                 prefer_col: str = None, max_iter: int = 25,
                 checkpoint: str = "local") -> DataFrame:
    """Survivor selection over resolved duplicate groups:
    (id, group_id, keep) with exactly one keep=1 row per group.

    Default survivor is the group's minimum id (deterministic, and
    SQL-recomputable for the oracle). prefer_col selects the group
    member with the HIGHEST value of that column instead (ties broken
    by min id) — e.g. keep the longest/highest-quality document."""
    comp = connected_components(pairs, nodes, id_col, max_iter,
                                checkpoint=checkpoint)
    if prefer_col is None:
        return comp.withColumn(
            "keep", (F.col("group_id") == F.col(id_col)).cast("int"))
    scored = comp.join(nodes.select(F.col(id_col), F.col(prefer_col)),
                       id_col)
    # two-stage winner: max prefer value per group, then min id among
    # the rows achieving it — works for ANY orderable id type (a
    # -id tie-break would fail on string/url ids); eqNullSafe keeps
    # all-null-prefer groups from losing their survivor entirely
    best = (scored.groupBy("group_id")
            .agg(F.max(prefer_col).alias("__best")))
    winners = (scored.join(best, "group_id")
               .where(F.col(prefer_col).eqNullSafe(F.col("__best")))
               .groupBy("group_id")
               .agg(F.min(id_col).alias("__winner")))
    return (scored.join(winners, "group_id")
            .withColumn("keep",
                        (F.col(id_col) == F.col("__winner")).cast("int"))
            .select(id_col, "group_id", "keep"))


def simhash_buckets(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash per doc + its 4 16-bit bands for candidate bucketing.

    Two docs with hamming distance <= 3 share at least one band (pigeonhole
    over 4 bands). Computed batch-vectorized in numpy inside mapInPandas:
    token hashes -> 64-bit vote matrix -> sign -> packed hash.
    """
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = np.zeros(len(pdf), dtype=np.uint64)
            for i, t in enumerate(pdf[text_col]):
                hs = _token_hashes(t)
                if len(hs) == 0:
                    continue
                bits = np.unpackbits(
                    hs.view(np.uint8).reshape(-1, 8)[:, ::-1], axis=1)
                votes = (bits.astype(np.int32) * 2 - 1).sum(axis=0)
                sim_bits = (votes > 0).astype(np.uint8)
                out[i] = int.from_bytes(np.packbits(sim_bits).tobytes(), "big")
            res = pd.DataFrame({id_col: pdf[id_col].values,
                                "simhash": out.view(np.int64)})
            for band in range(4):
                res[f"band{band}"] = ((out >> np.uint64(band * 16))
                                      & np.uint64(0xFFFF)).view(np.int64).astype(np.int64)
            yield res

    schema = (f"{id_col} long, simhash long, band0 long, band1 long, "
              f"band2 long, band3 long")
    return df.select(id_col, text_col).mapInPandas(fn, schema)


def neardup_dedup(df: DataFrame, text_col: str, id_col: str,
                  n_hashes: int = 8, bands: int = 4,
                  prefer_col: str = None, max_iter: int = 25,
                  checkpoint: str = "local") -> DataFrame:
    """One-call corpus near-deduplication: banded MinHash candidate
    pairs -> connected components -> survivor selection -> the KEPT rows
    of `df` (left-semi join on the survivors, so the full rows come back
    without reshuffling text through the dedup machinery).

    Uses the deterministic md5 word-gram signature path so the whole
    chain stays SQL-oracle-checkable end-to-end; swap the pairs stage
    for minhash_neardup_pairs (numpy universal hashing, hot-bucket cap)
    when throughput matters more than oracle-exactness — the downstream
    components/survivor stages are identical."""
    pairs = minhash_wordgram_neardup_pairs(df, text_col, id_col,
                                           n_hashes=n_hashes, bands=bands)
    nodes = (df.select(id_col) if prefer_col is None
             else df.select(id_col, prefer_col))
    groups = dedup_groups(pairs.select("a", "b"), nodes, id_col,
                          prefer_col=prefer_col, max_iter=max_iter,
                          checkpoint=checkpoint)
    keep = groups.filter(F.col("keep") == 1).select(id_col)
    return df.join(keep, id_col, "left_semi")


def winnow_neardup_pairs(df: DataFrame, text_col: str, id_col: str,
                         k: int = 5, window: int = 4,
                         min_shared: int = 2,
                         max_bucket: int = 256) -> DataFrame:
    """Fuzzy-duplicate candidate pairs via winnowing fingerprints
    (textstats.winnow_fingerprints, SIGMOD 2003): documents sharing any
    substring of length >= window + k - 1 share a fingerprint, so the
    fingerprint equi-join surfaces containment/boilerplate overlaps the
    whole-document MinHash jaccard can miss.

    Returns (a, b, n_shared) with a < b, keeping pairs that share at
    least `min_shared` fingerprints.

    Scale shape (same rules as minhash_neardup_pairs): fingerprint rows
    carry IDS ONLY through the self-join shuffle, and hot fingerprints —
    boilerplate substrings present in more than `max_bucket` documents,
    each otherwise emitting count^2/2 pairs — are dropped via a
    broadcast anti-join on a map-side-combined count. Bucketed, never
    all-pairs."""
    from .textstats import winnow_fingerprints

    fps = winnow_fingerprints(df, text_col, id_col, k=k, window=window)
    hot = (fps.groupBy("fp").count()
           .filter(F.col("count") > max_bucket).select("fp"))
    fps = fps.join(F.broadcast(hot), "fp", "left_anti")
    left = fps.select(F.col(id_col).alias("a"), "fp")
    right = fps.select(F.col(id_col).alias("b"), "fp")
    return (left.join(right, "fp")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b").agg(F.count("*").alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared))
