"""Document deduplication for large-scale training-data pipelines.

Four tiers, all shuffle-conscious:

- ``exact_dedup``       content-hash groupBy (one shuffle on a 16-byte key)
- ``minhash_lsh``       shingle -> minhash -> band -> bucket-join; candidate
                        pairs only form inside LSH buckets, never all-pairs.
                        Entirely JVM-side: shingling via ``sequence`` +
                        ``substring`` higher-order functions, hashing via
                        ``xxhash64`` — no Python in the pipeline.
- ``simhash``           64-bit sign-of-weighted-votes fingerprint (Arrow
                        batch UDF), near-dups = Hamming distance <= t via
                        bucket join on rotated prefixes.
- ``ngram_jaccard``     exact Jaccard verification on candidate pairs.

At 100 TB the only shuffles are groupBys on (band_id, band_hash) — bounded,
well-distributed keys; pair verification joins stay within buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """One row per duplicate *group* (n>1): content hash, count, keeper id."""
    return (docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
                .agg(F.count("*").alias("n_dups"),
                     F.min(id_col).alias("keeper"))
                .where(F.col("n_dups") > 1))


def drop_exact_dups(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative of each content group."""
    w_keeper = (docs.groupBy(F.md5(F.col(text_col)).alias("_h"))
                    .agg(F.min(id_col).alias(id_col)))
    return docs.join(w_keeper.select(id_col), id_col, "left_semi")


def shingles(text_col: str, k: int = 5) -> F.Column:
    """Array of character k-shingles — pure higher-order-function SQL."""
    t = F.lower(F.col(text_col))
    n = F.greatest(F.length(t) - (k - 1), F.lit(1))
    return F.transform(F.sequence(F.lit(1), n), lambda i: t.substr(i, F.lit(k)))


# SplitMix64 constants (public mix function) as signed-long literals
_SM_GAMMA = -7046029254386353131    # 0x9E3779B97F4A7C15
_SM_M1 = -4658895280553007687       # 0xBF58476D1CE4E5B9
_SM_M2 = -7723592293110705685       # 0x94D049BB133111EB


def _sm_mix(z):
    """SplitMix64 finalizer as wrapping long column math (ANSI off)."""
    z = z.bitwiseXOR(F.shiftrightunsigned(z, 30)) * F.lit(_SM_M1)
    z = z.bitwiseXOR(F.shiftrightunsigned(z, 27)) * F.lit(_SM_M2)
    return z.bitwiseXOR(F.shiftrightunsigned(z, 31))


def shingle_hashes(shingle_col):
    """One xxhash64 pass over the shingles — the only string hashing."""
    return F.transform(shingle_col, lambda sh: F.xxhash64(sh))


def _km_signature(hashes_col, n_hashes: int):
    """Length-``n_hashes`` minhash signature from a base-hash array via
    Kirsch–Mitzenmacher double hashing: variant i of element hash h is
    ``h1 + i * h2`` with ``h1 = h`` and ``h2 = splitmix(h) | 1`` (odd, so
    every variant family is a full-period permutation of Z_2^64).

    WHY KM (round 3): the round-2 family ``mix(h xor salt_i)`` derived all
    variants from one mix of the same base — measured on sf0.1 documents it
    left the per-slot argmins CORRELATED across salts, inflating est_jaccard
    for non-dup pairs: 2831 candidate pairs of which only 256 were true
    (precision 0.09).  KM double hashing, same cost, emits 299 with the
    SAME 256 true pairs (precision 0.86).  See BENCH/IMPROVEMENTS.md.

    Formulation: a single ``aggregate`` whose accumulator is the length-n
    running-minimum array, merged per element via ``zip_with(least)`` over
    a literal index array — one plan node, the hash array traversed once
    (the n-transforms form took ~13 s of analysis/codegen in round 2)."""
    idx = F.array(*[F.lit(i).cast("long") for i in range(n_hashes)])
    init = F.array_repeat(F.lit(2 ** 63 - 1), n_hashes)
    pairs = F.transform(hashes_col, lambda h: F.struct(
        h.alias("h1"), _sm_mix(h).bitwiseOR(F.lit(1)).alias("h2")))
    return F.aggregate(
        pairs, init,
        lambda acc, s: F.zip_with(
            acc,
            F.transform(idx, lambda i: s["h1"] + i * s["h2"]),
            lambda a, b: F.least(a, b)))


def minhash_signature(shingle_col, n_hashes: int = 32):
    """Array of ``n_hashes`` min-hash values in ONE pass over the hashes
    (xxhash64 base + KM double hashing — see ``_km_signature``)."""
    return _km_signature(shingle_hashes(shingle_col), n_hashes)


def _sm_mix_np(z: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer on uint64 arrays (twin of ``_sm_mix``)."""
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _widened_id_type(simple: str, id_col: str, strict: bool = True) -> str:
    """Stable on-disk id type for signature tables/stores: integral
    widths all widen to ``long``, strings pass through.  ``strict``
    (the STORE boundary — build/append) raises on anything else, so a
    store can never accumulate mixed-type files; non-strict (in-session
    signature generation, where ids only flow through joins and ``<``)
    passes unknown types through unchanged."""
    if simple in ("tinyint", "smallint", "int", "bigint"):
        return "bigint"
    if simple == "string" or not strict:
        return simple
    raise ValueError(
        f"id column {id_col!r} must be integral or string for the "
        f"signature store, got {simple}")


def _widened_id_col(df: DataFrame, id_col: str) -> F.Column:
    """``_id`` select expression at the store-stable widened type."""
    t = _widened_id_type(df.schema[id_col].dataType.simpleString(), id_col)
    return F.col(id_col).cast(t).alias("_id")


def _check_store_id_type(spark, path: str, new_sig: DataFrame) -> None:
    """Append chokepoint: the batch's ``_id`` type must equal the
    resident ``sigs`` type.  A store built before the round-7 widening
    (int32 on disk) or a string-id store fed a bigint batch would
    otherwise accumulate mixed-type parquet files and wedge every later
    read (review r7, second pass)."""
    from .similarity import _live_dir
    resident = dict(spark.read.parquet(_live_dir(f"{path}/sigs"))
                    .dtypes)["_id"]
    batch = dict(new_sig.dtypes)["_id"]
    if resident != batch:
        raise ValueError(
            f"store at {path} holds _id:{resident} but the batch carries "
            f"_id:{batch} — appending would mix parquet schemas; rebuild "
            "the store (or cast the batch ids) to migrate")


def minhash_signatures_np(docs: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id", k: int = 5,
                          n_hashes: int = 32) -> DataFrame:
    """(_id, sig array<long>) via a NumPy mapInPandas kernel: sliding-window
    FNV-1a over the lowercased UTF-8 bytes + Kirsch–Mitzenmacher double
    hashing (``h1 + i * h2``, ``h2 = splitmix(h1) | 1`` — see
    ``_km_signature`` for why KM replaced the xor-salt family in round 3).

    The A/B alternative to the interpreted-HOF pipeline (VERDICT r2 item 8
    — see BENCH/IMPROVEMENTS.md).  Same KM family downstream; the BASE hash
    differs (FNV-1a on byte windows vs JVM xxhash64 on char shingles), so
    signatures are engine-specific — pairs/estimates are statistically
    equivalent, not byte-equal.

    ``_id`` follows the input id type — STRING ids carry the namespaced
    ``doc:``/``img:`` nodes of ``cross_modal_pairs``; every INTEGRAL
    width is widened to ``long`` so two batches of the same store can
    never append mixed int32/int64 parquet files (which would wedge
    every later read of ``sigs`` — review r7).  Other id types pass
    through for in-session pair generation; the STORE boundary
    (build/append) enforces integral-or-string separately."""
    id_type = _widened_id_type(docs.schema[id_col].dataType.simpleString(),
                               id_col, strict=False)

    def batch(it):
        for pdf in it:
            sig = km_minhash_batch(pdf[text_col], k, n_hashes)
            yield pd.DataFrame({"_id": pdf[id_col],
                                "sig": sig.astype(np.int64).tolist()})

    return docs.select(id_col, text_col).mapInPandas(
        batch, schema=f"_id {id_type}, sig array<long>")


def km_minhash_batch(texts, k: int = 5, n_hashes: int = 32) -> np.ndarray:
    """(n_docs, n_hashes) KM minhash signatures, vectorized across the WHOLE
    batch (round 8, guide §4.2): one flat byte buffer for every document,
    ONE sliding-window FNV-1a pass over it, per-doc minima via
    ``minimum.reduceat`` — no per-document Python loop (the round-3 kernel
    ran ~30 interpreter steps per doc; at 72k docs that loop was the
    dedup-pipeline wall).  Byte-identical to the scalar form
    (``_km_sig_doc``, kept as the parity oracle — asserted in tests):
    windows crossing document boundaries are EXCLUDED by a ragged index
    gather, never by a sentinel (KM variants wrap modulo 2^64, so a
    sentinel hash could still win a minimum)."""
    prime = np.uint64(0x100000001B3)
    bufs = []
    for t in texts:
        b = str(t).lower().encode("utf-8")
        if len(b) < k:
            b = b + b"\x00" * (k - len(b))
        bufs.append(b)
    n_docs = len(bufs)
    if n_docs == 0:
        return np.zeros((0, n_hashes), dtype=np.uint64)
    lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=n_docs)
    flat = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    # FNV-1a over every flat window (including doc-crossing ones — cheaper
    # to compute than to branch; they are dropped by the gather below)
    win = np.lib.stride_tricks.sliding_window_view(flat, k)
    h1f = np.full(len(win), 0xCBF29CE484222325, np.uint64)
    for j in range(k):
        h1f = (h1f ^ win[:, j].astype(np.uint64)) * prime
    # ragged index of each doc's VALID windows in the flat window array
    nwin = lens - (k - 1)                      # >= 1 (short docs padded)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    total = int(nwin.sum())
    # valid_idx = concat(arange(start_d, start_d + nwin_d))
    doc_of = np.repeat(np.arange(n_docs), nwin)
    within = np.arange(total) - np.repeat(np.cumsum(nwin) - nwin, nwin)
    valid_idx = starts[doc_of] + within
    h1 = h1f[valid_idx]
    h2 = _sm_mix_np(h1) | np.uint64(1)
    red = np.cumsum(nwin) - nwin               # reduceat boundaries
    sig = np.empty((n_docs, n_hashes), dtype=np.uint64)
    for i in range(n_hashes):
        sig[:, i] = np.minimum.reduceat(h1 + np.uint64(i) * h2, red)
    return sig


def _km_sig_doc(text, k: int = 5, n_hashes: int = 32) -> np.ndarray:
    """Scalar per-document reference of ``km_minhash_batch`` (the round-3
    kernel verbatim) — kept ONLY as the batch kernel's parity oracle."""
    prime = np.uint64(0x100000001B3)
    iarr = np.arange(n_hashes, dtype=np.uint64)
    b = np.frombuffer(str(text).lower().encode("utf-8"), np.uint8)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)))
    win = np.lib.stride_tricks.sliding_window_view(b, k)
    h1 = np.full(len(win), 0xCBF29CE484222325, np.uint64)
    for j in range(k):
        h1 = (h1 ^ win[:, j].astype(np.uint64)) * prime
    h2 = _sm_mix_np(h1) | np.uint64(1)
    return (h1[:, None] + iarr[None, :] * h2[:, None]).min(axis=0)


def minhash_lsh(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                k: int = 5, n_hashes: int = 32, bands: int = 8,
                jaccard_threshold: float = 0.6,
                max_bucket: int = 200, engine: str = "numpy") -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, est_jaccard) via banded MinHash.

    rows_per_band = n_hashes/bands; a pair collides if any band's slice of
    the signature matches exactly.  est_jaccard = fraction of matching
    minhashes (unbiased estimator); filtered at ``jaccard_threshold``.

    ``max_bucket``: buckets larger than this are dropped before the pair
    join — the standard skew guard at scale (an over-full bucket means
    boilerplate shared by thousands of docs and would blow up the join
    quadratically; its members still pair through their other bands).

    ``engine``: ``"numpy"`` (default) = Arrow mapInPandas signatures
    (``minhash_signatures_np``) — measured 2-3x faster than the interpreted
    HOF pipeline at sf0.1 (BENCH/IMPROVEMENTS.md); ``"hof"`` = JVM
    higher-order-function signatures (no Python workers needed).  Both use
    KM double hashing; pairs are statistically equivalent, not byte-equal."""
    r = n_hashes // bands
    # Small inputs arrive as ONE parquet split, which would serialize the
    # (interpreted, expensive) shingle-hash projection on a single core —
    # spread the rows first.  At scale inputs already have many splits and
    # this is a no-op.
    par = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)
    if engine == "numpy":
        sig = minhash_signatures_np(docs, text_col, id_col, k, n_hashes)
        return minhash_pairs_from_sig(sig, n_hashes, bands,
                                      jaccard_threshold, max_bucket)
    # Two-step materialization, both load-bearing:
    # 1. the base shingle-hash array is persisted so the (interpreted,
    #    expensive) string-hash pass runs ONCE — Catalyst's CollapseProject
    #    would otherwise inline it into all n_hashes salted variants;
    # 2. the signature table is persisted (inside minhash_pairs_from_sig)
    #    before the self-join — signatures recomputed per join side are
    #    wasteful AND self-joins of renamed un-materialized projections
    #    have bitten us before (see git log).
    hashed = docs.select(
        F.col(id_col).alias("_id"),
        shingle_hashes(shingles(text_col, k)).alias("_h")).persist()
    sig = hashed.select(
        "_id", _km_signature(F.col("_h"), n_hashes).alias("sig"))
    out = minhash_pairs_from_sig(sig, n_hashes, bands, jaccard_threshold,
                                 max_bucket)
    hashed.unpersist()
    return out


def band_table(sig: DataFrame, n_hashes: int = 32,
               bands: int = 8) -> DataFrame:
    """(_id, band_id, band_hash) LSH band table from a signature table —
    the shared banding step of ``minhash_pairs_from_sig`` and the
    persisted incremental store (``build_minhash_store``)."""
    r = n_hashes // bands
    return sig.select(
        "_id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band_id"),
                     F.xxhash64(F.concat_ws(",", *[
                         F.element_at("sig", b * r + j + 1).cast("string")
                         for j in range(r)])).alias("band_hash"))
            for b in range(bands)])).alias("band")
    ).select("_id", "band.band_id", "band.band_hash")


def minhash_pairs_from_sig(sig: DataFrame, n_hashes: int = 32,
                           bands: int = 8, jaccard_threshold: float = 0.6,
                           max_bucket: int = 200) -> DataFrame:
    """Banded pair join + estimate stage of ``minhash_lsh`` over a
    precomputed signature table (columns ``_id``, ``sig array<long>``) —
    callable over a persisted signature artifact so an external oracle can
    re-run the same banding/join/estimate SQL-side (band buckets formed by
    xxhash64 of the band tuple here ≡ grouping by the raw tuple there)."""
    # persist only if the CALLER hasn't: Spark has no persist refcounting,
    # so unpersisting a caller-cached input here would silently evict
    # their cache (incremental_minhash_pairs passes an already-persisted
    # batch signature table it keeps using afterwards)
    lvl = sig.storageLevel
    sig_owned = not (lvl.useMemory or lvl.useDisk)
    if sig_owned:
        sig = sig.persist()

    bands_df = band_table(sig, n_hashes, bands).persist()
    bands_cached = bands_df   # keep the persisted handle (bands_df is
    #                           reassigned by the skew filter below)

    # force materialization NOW: a lazily-persisted self-join input is
    # still re-resolved per side at analysis time (observed nondeterminism
    # persists until the cache actually exists before the join is planned).
    # ONE job materializes both caches — bands_df scans every sig partition,
    # so counting it fills sig's cache too (the separate sig.count() job
    # was measured at ~0.4 s of pure latency per call, round 8)
    bands_df.count()

    if max_bucket is not None:
        # hot-bucket EXCLUSION list via aggregate + broadcast anti-join: the
        # probe rows never shuffle (a window count would re-shuffle them all
        # on the bucket key just to count); the hot list is tiny by definition
        hot = (bands_df.groupBy("band_id", "band_hash").count()
                       .where(F.col("count") > max_bucket)
                       .select("band_id", "band_hash"))
        bands_df = bands_df.join(F.broadcast(hot),
                                 ["band_id", "band_hash"], "left_anti")

    # Self-join via explicit aliases + qualified columns.  NOTE: renaming
    # columns of the SAME plan and joining (the naive self-join) hits
    # Spark's ambiguous-attribute resolution — both `sig_a` and `sig_b`
    # can silently bind to one side, corrupting the estimator
    # NONDETERMINISTICALLY.  Qualified aliases below are the supported
    # pattern; ids travel through the bucket join, signatures re-attach by
    # id afterwards.
    ba, bb = bands_df.alias("ba"), bands_df.alias("bb")
    pairs = (ba.join(bb,
                     (F.col("ba.band_id") == F.col("bb.band_id"))
                     & (F.col("ba.band_hash") == F.col("bb.band_hash"))
                     & (F.col("ba._id") < F.col("bb._id")))
               .select(F.col("ba._id").alias("id_a"),
                       F.col("bb._id").alias("id_b"))
               .dropDuplicates(["id_a", "id_b"]))
    sa = sig.select(F.col("_id").alias("id_a"), F.col("sig").alias("sig_a")).alias("sa")
    sb = sig.select(F.col("_id").alias("id_b"), F.col("sig").alias("sig_b")).alias("sb")
    pairs = pairs.join(sa, "id_a").join(sb, "id_b")
    # A/B-measured (round 8): this zip_with/filter form beats a flat
    # 32-term element_at comparison sum (1.9 s vs 2.5 s at 600k candidate
    # pairs) — keep the higher-order form.
    est = (F.size(F.filter(F.zip_with(F.col("sa.sig_a"), F.col("sb.sig_b"),
                                      lambda x, y: x == y),
                           lambda m: m)).cast("double") / F.lit(float(n_hashes)))
    pairs = pairs.withColumn("est_jaccard", est)
    out = (pairs.where(F.col("est_jaccard") >= jaccard_threshold)
                .select("id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard"))
                .persist())
    # Materialize the (small) pair result, then release the heavy
    # intermediate caches — they otherwise leak executor storage memory
    # across repeated calls in one session.  Callers owning long sessions
    # may unpersist() the returned DataFrame when done with it.
    out.count()
    if sig_owned:
        sig.unpersist()
    bands_cached.unpersist()
    return out


def _fnv1a64(data: bytes) -> int:
    """Deterministic 64-bit FNV-1a (public algorithm) — SCALAR reference.
    The hot path is ``_fnv1a64_batch``; this stays as its parity oracle
    (same pattern as jpeg.py's scalar/vectorized pair).  NEVER use Python's
    builtin ``hash()`` in executor code: string hashing is salted per
    process (PYTHONHASHSEED), so results would differ across workers."""
    h = 0xCBF29CE484222325
    for b in data:
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def _fnv1a64_batch(tokens: list) -> np.ndarray:
    """Vectorized FNV-1a over a batch of byte strings -> uint64 array.

    The fold is sequential over BYTE POSITIONS but whole-array over tokens:
    scatter all bytes into a (n_tokens, maxlen) uint8 matrix, then loop
    maxlen times (token lengths, ~5-15) doing uint64 xor/multiply on every
    still-live token at once — the round-2 per-byte-per-token Python loop
    ran len(token) x n_tokens interpreter steps instead.  Byte-identical to
    ``_fnv1a64`` (test_simhash_vectorized_matches_scalar)."""
    n = len(tokens)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    lens = np.fromiter((len(t) for t in tokens), dtype=np.int64, count=n)
    maxlen = int(lens.max())
    h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    if maxlen == 0:
        return h
    flat = np.frombuffer(b"".join(tokens), dtype=np.uint8)
    ends = np.cumsum(lens)
    rows = np.repeat(np.arange(n), lens)
    cols = np.arange(len(flat)) - np.repeat(ends - lens, lens)
    mat = np.zeros((n, maxlen), dtype=np.uint8)
    mat[rows, cols] = flat
    prime = np.uint64(0x100000001B3)
    for pos in range(maxlen):
        live = lens > pos
        h[live] = (h[live] ^ mat[live, pos].astype(np.uint64)) * prime
    return h


def simhash_pdf(texts, ids, text_col: str, id_col: str) -> pd.DataFrame:
    """SimHash a batch of texts (vectorized across ALL tokens of the batch):
    one FNV pass over the concatenated token list, bits via ``unpackbits``
    on the hash bytes, per-doc vote sums in ONE ``add.reduceat`` pass over
    the doc-ordered token rows — no per-document Python loop."""
    tok_lists = [str(t).lower().split() for t in texts]
    n_docs = len(tok_lists)
    n_tok = np.fromiter((len(tl) for tl in tok_lists), dtype=np.int64,
                        count=n_docs)
    all_toks = [w.encode("utf-8") for tl in tok_lists for w in tl]
    hs = _fnv1a64_batch(all_toks)
    sig = np.zeros(n_docs, dtype=np.uint64)
    nz = n_tok > 0
    if len(hs):
        # (n_tokens, 64) bit matrix, column j = bit j of the hash
        # (little-endian byte view + per-byte LSB-first unpack)
        bits = np.unpackbits(hs.astype("<u8").view(np.uint8).reshape(-1, 8),
                             axis=1, bitorder="little")
        starts = (np.cumsum(n_tok) - n_tok)[nz]
        # dtype= on the ufunc (NOT bits.astype) — the widened copy of the
        # (n_tokens, 64) matrix was 7x the cost of the reduce itself
        ones = np.add.reduceat(bits, starts, axis=0, dtype=np.int32)
        votes_pos = 2 * ones > n_tok[nz, None]     # votes = 2*ones - n > 0
        weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
        sig[nz] = votes_pos.astype(np.uint64) @ weights
    return pd.DataFrame({id_col: ids, "simhash": sig.astype(np.int64)})


def simhash_signature(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document (vectorized Arrow batches)."""

    par = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)  # spread single-split inputs (see minhash_lsh)

    def batch(it):
        for pdf in it:
            yield simhash_pdf(pdf[text_col], pdf[id_col], text_col, id_col)

    return docs.select(id_col, text_col).mapInPandas(
        batch, schema=f"{id_col} long, simhash long")


def simhash_pairs(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", max_hamming: int = 3,
                  max_bucket: int = 200) -> DataFrame:
    """Near-duplicate pairs by SimHash: (id_a < id_b, hamming <= max_hamming).

    Pigeonhole bucketing: the 64-bit signature splits into
    ``max_hamming + 1`` blocks — any pair within ``max_hamming`` flipped
    bits matches EXACTLY on at least one block, so candidates form only
    inside (block_id, block_value) buckets (never all-pairs) with 100%
    recall at the stated radius.  Verification is a JVM ``bit_count(xor)``.
    ``max_bucket`` is the same hot-bucket skew guard as ``minhash_lsh``."""
    sig = simhash_signature(docs, text_col, id_col) \
        .withColumnRenamed(id_col, "_id")
    return simhash_pairs_from_sig(sig, max_hamming, max_bucket)


def simhash_blocks(max_hamming: int):
    """(widths, offsets) of the ``max_hamming + 1`` pigeonhole blocks a
    64-bit signature splits into — shared by the Spark pair join and the
    SQL oracle that re-expresses it."""
    n_tables = max_hamming + 1
    widths = [64 // n_tables + (1 if i < 64 % n_tables else 0)
              for i in range(n_tables)]
    offs = [sum(widths[:i]) for i in range(n_tables)]
    return widths, offs


def pigeonhole_block_table(sig: DataFrame,
                           max_hamming: int = 3) -> DataFrame:
    """(_id, simhash, block_id, block_val) pigeonhole table from a
    64-bit signature table — shared by the in-session pair join and the
    persisted incremental phash store."""
    n_tables = max_hamming + 1
    widths, offs = simhash_blocks(max_hamming)
    return sig.select(
        "_id", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("block_id"),
                F.shiftrightunsigned(F.col("simhash"), offs[b])
                 .bitwiseAND(F.lit((1 << widths[b]) - 1)).alias("block_val"))
            for b in range(n_tables)])).alias("blk")
    ).select("_id", "simhash", "blk.block_id", "blk.block_val")


def simhash_pairs_from_sig(sig: DataFrame, max_hamming: int = 3,
                           max_bucket: int = 200) -> DataFrame:
    """Pigeonhole pair join over a precomputed signature table (columns
    ``_id``, ``simhash``) — the pair-join stage of ``simhash_pairs``,
    callable over a persisted signature artifact so an external oracle can
    re-run the same join SQL-side."""
    # unlike minhash_pairs_from_sig, sig is consumed EXACTLY once here (the
    # self-joined table is ``blocks``, which carries simhash through), so an
    # owned sig needs no cache of its own — blocks' materialization below is
    # the pre-self-join fence (two redundant jobs removed, round 8)
    blocks = pigeonhole_block_table(sig, max_hamming).persist()
    blocks.count()  # materialize before the self-join (see minhash_lsh)

    if max_bucket is not None:
        # broadcast anti-join exclusion (see minhash_lsh): probe rows stay put
        hot = (blocks.groupBy("block_id", "block_val").count()
                     .where(F.col("count") > max_bucket)
                     .select("block_id", "block_val"))
        blocks_f = blocks.join(F.broadcast(hot),
                               ["block_id", "block_val"], "left_anti")
    else:
        blocks_f = blocks

    ba, bb = blocks_f.alias("ba"), blocks_f.alias("bb")
    pairs = (ba.join(bb,
                     (F.col("ba.block_id") == F.col("bb.block_id"))
                     & (F.col("ba.block_val") == F.col("bb.block_val"))
                     & (F.col("ba._id") < F.col("bb._id")))
               .select(F.col("ba._id").alias("id_a"),
                       F.col("bb._id").alias("id_b"),
                       F.bit_count(F.col("ba.simhash")
                                   .bitwiseXOR(F.col("bb.simhash"))).alias("hamming"))
               .where(F.col("hamming") <= max_hamming)
               .dropDuplicates(["id_a", "id_b"]))
    out = pairs.persist()
    out.count()   # materialize the (small) result, release intermediates
    blocks.unpersist()
    return out


def phash_pairs(images: DataFrame, id_col: str = "image_id",
                phash_col: str = "phash", max_hamming: int = 3,
                max_bucket: int = 200) -> DataFrame:
    """Image near-duplicate pairs by perceptual-hash Hamming distance:
    (id_a < id_b, hamming <= max_hamming) over the input table's
    ``phash:int64`` column (the BASELINE.json ``input_hint`` carries it
    for exactly this).  Identical machinery to ``simhash_pairs_from_sig``
    — the 64-bit pigeonhole guarantee is hash-agnostic: any pair within
    ``max_hamming`` flipped bits matches exactly on one of the
    ``max_hamming + 1`` blocks, so candidates form only inside
    (block_id, block_value) buckets, verified by a JVM ``bit_count(xor)``.
    Works for long OR string ids (only ``<`` ordering is used).  Feed the
    result into ``components.dedup_corpus`` for the survivor table."""
    sig = images.select(F.col(id_col).alias("_id"),
                        F.col(phash_col).cast("long").alias("simhash"))
    return simhash_pairs_from_sig(sig, max_hamming, max_bucket)


def ngram_jaccard(docs: DataFrame, pairs: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  k: int = 5) -> DataFrame:
    """Exact shingle-Jaccard for candidate (id_a, id_b) pairs.

    The returned DataFrame is materialized + persisted so the shingle-set
    intermediate can be unpersisted here (same cache hygiene as
    ``minhash_lsh``); callers may ``unpersist()`` the result when done."""
    sh = docs.select(F.col(id_col).alias("_id"),
                     F.array_distinct(shingles(text_col, k)).alias("sh")).persist()
    j = (pairs
         .join(sh.select(F.col("_id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
         .join(sh.select(F.col("_id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    out = j.select("id_a", "id_b",
                   F.round(inter / union, 6).alias("jaccard")).persist()
    out.count()
    sh.unpersist()
    return out


# ---------------------------------------------------------------------------
# incremental dedup against a persisted signature store (round 6 — the
# streaming-ingest analog of similarity.append_to_index: a training-data
# pipeline appends documents daily and must reject near-dups of the
# RESIDENT corpus without recomputing anything over it)
# ---------------------------------------------------------------------------

def build_minhash_store(docs: DataFrame, path: str, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 5,
                        n_hashes: int = 32, bands: int = 8) -> None:
    """Persist the corpus's minhash state: ``sigs`` (_id, sig) and the
    LSH ``bands`` table, plus a params sidecar.  One full pass at build;
    every :func:`incremental_minhash_pairs` batch afterwards touches the
    store only as (a) one SCAN of ``bands`` probed by a BROADCAST of the
    new batch's bands (the resident rows never shuffle), and (b) a
    semi-joined read of ``sigs`` bounded by the candidate count."""
    import pandas as pd
    # store boundary: enforce the canonical integral-or-string id class
    _widened_id_type(docs.schema[id_col].dataType.simpleString(), id_col)
    sig = minhash_signatures_np(docs, text_col, id_col, k, n_hashes)
    sig.write.mode("overwrite").parquet(f"{path}/sigs")
    spark = docs.sparkSession
    stored_sig = spark.read.parquet(f"{path}/sigs")
    band_table(stored_sig, n_hashes, bands) \
        .write.mode("overwrite").parquet(f"{path}/bands")
    spark.createDataFrame(pd.DataFrame({
        "k": [k], "n_hashes": [n_hashes], "bands": [bands],
    })).write.mode("overwrite").parquet(f"{path}/params")


def incremental_minhash_pairs(spark, path: str, new_docs: DataFrame,
                              text_col: str = "text",
                              id_col: str = "doc_id",
                              jaccard_threshold: float = 0.6,
                              max_bucket: int = 200,
                              broadcast_threshold: int = 1_000_000):
    """Near-dup pairs of a NEW batch against the persisted store AND
    within the batch itself, touching only O(batch + candidates) of the
    resident corpus.  Returns ``(pairs, new_sig)``: pairs carry
    ``id_a``/``id_b``/``est_jaccard`` with id_a from the store side for
    cross pairs (canonical id_a < id_b within the batch); ``new_sig`` is
    the batch signature table for :func:`append_to_minhash_store`.

    Scale shape: the daily batch is small relative to the corpus, so the
    batch's band table BROADCASTS and the resident ``bands`` table is
    only SCANNED (no shuffle of resident rows); signature re-attachment
    reads ``sigs`` through a join keyed by the (bounded) candidate ids.

    ``broadcast_threshold`` (round-6 verdict #3): the daily-trickle
    broadcast assumption breaks on a large BACKFILL batch — broadcasting
    millions of band rows OOMs the driver/executors.  Batches whose band
    table exceeds this row count fall back to a sort-merge join on the
    band key (hint-pinned so size stats can't flip it back), shuffling
    both sides but never materializing the batch in every executor."""
    from .similarity import _live_dir
    # a compaction crashed mid-swap leaves the layout under
    # __compact_old — READ it from there; renaming from this (read-only)
    # path would race an in-flight compaction swap (review r7, third
    # pass).  The next append/compaction performs the actual recovery.
    spath, bpath = _live_dir(f"{path}/sigs"), _live_dir(f"{path}/bands")
    p = spark.read.parquet(f"{path}/params").collect()[0]
    k, n_hashes, bands = int(p["k"]), int(p["n_hashes"]), int(p["bands"])

    new_sig = minhash_signatures_np(new_docs, text_col, id_col, k,
                                    n_hashes).persist()
    # fail BEFORE any pair work or sink delivery: with the id widening
    # relaxed in-session, a mistyped batch id would otherwise surface
    # only at append time — after incremental_dedup's out_sink already
    # delivered the batch, leaving a permanent poison pill (review r7,
    # third pass)
    _check_store_id_type(spark, path, new_sig)
    n_new = new_sig.count()
    small_batch = n_new * bands <= broadcast_threshold
    new_bands = band_table(new_sig, n_hashes, bands)

    stored_bands = spark.read.parquet(bpath)
    if max_bucket is not None:
        # resident hot buckets are a property of the STORE — exclude them
        # store-side (broadcast list), same guard as minhash_lsh.
        # countDistinct, not count: a crash-replayed append can leave
        # DUPLICATE band rows (harmless for pairs, which dedupe), and a
        # raw row count would let them push a legitimate bucket over the
        # cap — silently disabling near-dup detection for it
        hot = (stored_bands.groupBy("band_id", "band_hash")
                           .agg(F.countDistinct("_id").alias("n"))
                           .where(F.col("n") > max_bucket)
                           .select("band_id", "band_hash"))
        stored_bands = stored_bands.join(F.broadcast(hot),
                                         ["band_id", "band_hash"],
                                         "left_anti")

    nb_side = (F.broadcast(new_bands) if small_batch
               else new_bands.hint("merge"))
    cross = (stored_bands.alias("sb")
             .join(nb_side.alias("nb"),
                   (F.col("sb.band_id") == F.col("nb.band_id"))
                   & (F.col("sb.band_hash") == F.col("nb.band_hash")))
             .select(F.col("sb._id").alias("id_a"),
                     F.col("nb._id").alias("id_b"))
             .where(F.col("id_a") != F.col("id_b"))
             .dropDuplicates(["id_a", "id_b"]))
    stored_sig = spark.read.parquet(spath)
    sa = stored_sig.select(F.col("_id").alias("id_a"),
                           F.col("sig").alias("sig_a"))
    sb = new_sig.select(F.col("_id").alias("id_b"),
                        F.col("sig").alias("sig_b"))
    if not small_batch:  # signature re-attachment scales with the batch too
        sb = sb.hint("merge")
    est = (F.size(F.filter(F.zip_with("sig_a", "sig_b",
                                      lambda x, y: x == y),
                           lambda m: m)).cast("double")
           / F.lit(float(n_hashes)))
    sb_side = F.broadcast(sb) if small_batch else sb
    cross_pairs = (cross.join(sa, "id_a").join(sb_side, "id_b")
                        .withColumn("est_jaccard", F.round(est, 6))
                        .where(F.col("est_jaccard") >= jaccard_threshold)
                        .select("id_a", "id_b", "est_jaccard")
                        # crash-replay-duplicated sig rows in the store
                        # re-expand the deduped candidates here — dedupe
                        # AFTER attachment too (bounded: candidate-sized)
                        .dropDuplicates(["id_a", "id_b"]))

    intra = minhash_pairs_from_sig(new_sig, n_hashes, bands,
                                   jaccard_threshold, max_bucket)
    pairs = cross_pairs.unionByName(intra)
    if spath != f"{path}/sigs" or bpath != f"{path}/bands":
        # crashed-swap view: checkpoint (not persist) so the pair table
        # survives the writer recovery that the downstream append runs —
        # a persisted plan re-evaluates against the renamed-away path if
        # its partitions are evicted.  Eager: no count needed.
        pairs = pairs.localCheckpoint(eager=True)
    else:
        pairs = pairs.persist()
        pairs.count()
    intra.unpersist()
    return pairs, new_sig


def append_to_minhash_store(spark, path: str, new_sig: DataFrame,
                            check_id_type: bool = True) -> int:
    """Append a batch's signatures + bands to the store (call with the
    ACCEPTED subset after dedup so rejected near-dups never pollute the
    store).  Returns the number of rows appended.  ``check_id_type=False``
    skips the resident-schema probe when the caller (the incremental
    paths) already ran it pre-sink — direct callers keep the chokepoint."""
    from .similarity import _recover_swap
    # a compaction crashed mid-swap leaves sigs/bands under __compact_old;
    # appending into a fresh root would orphan the resident store
    _recover_swap(f"{path}/sigs")
    _recover_swap(f"{path}/bands")
    if check_id_type:
        _check_store_id_type(spark, path, new_sig)
    p = spark.read.parquet(f"{path}/params").collect()[0]
    # checkpoint: the (semi-join) input evaluates ONCE, not per action.
    # Write order bands THEN sigs: a crash between the files leaves
    # duplicate-band rows a replay re-appends harmlessly, whereas
    # sigs-without-bands would trip the same-id replay guard while
    # silently losing CONTENT rejection for those docs forever.  (At
    # deployment both appends belong in one transactional Iceberg
    # commit — SCALE.md checkpoint row.)
    new_sig = new_sig.localCheckpoint(eager=True)
    n = new_sig.count()
    band_table(new_sig, int(p["n_hashes"]), int(p["bands"])) \
        .write.mode("append").parquet(f"{path}/bands")
    new_sig.write.mode("append").parquet(f"{path}/sigs")
    return n


def _admit_batch(new_docs: DataFrame, pairs: DataFrame,
                 new_ids: DataFrame, stored_ids: DataFrame,
                 id_col: str) -> DataFrame:
    """Pure admission set-logic of :func:`incremental_dedup` (separated
    so its edge semantics are unit-testable with handcrafted pairs):

    (a) an id ALREADY RESIDENT is rejected outright — the cross band
        join cannot represent a self-pair (id_a == id_b is filtered), so
        a replayed batch (foreachBatch crash-replay, duplicate feeds)
        would otherwise re-admit its rows and double-append signatures;
    (b) direct near-dups of resident docs are rejected;
    (c) batch-internal clusters collapse to the min-id survivor — but a
        cluster with ANY store-hitting member is rejected WHOLE
        (B~A~S means B transitively duplicates resident S even when B
        never band-matches S directly; the same closure semantics the
        batch path gets from connected components)."""
    from . import components as cc
    already = new_ids.join(stored_ids.withColumnRenamed("_id", id_col),
                           id_col, "left_semi")
    hit_store = (pairs.join(stored_ids.withColumnRenamed("_id", "id_a"),
                            "id_a", "left_semi")
                      .select(F.col("id_b").alias(id_col))
                 .unionByName(
                     pairs.join(stored_ids.withColumnRenamed("_id", "id_b"),
                                "id_b", "left_semi")
                          .select(F.col("id_a").alias(id_col)))
                 .join(new_ids, id_col, "left_semi")
                 .distinct())
    hits = hit_store.unionByName(already).distinct()

    intra = (pairs.join(new_ids.withColumnRenamed(id_col, "id_a"),
                        "id_a", "left_semi")
                  .join(new_ids.withColumnRenamed(id_col, "id_b"),
                        "id_b", "left_semi")
                  .select("id_a", "id_b"))
    comp = cc.connected_components(intra)
    bad_roots = (comp.join(hits.withColumnRenamed(id_col, "node"),
                           "node", "left_semi")
                     .select("root").distinct())
    cluster_reject = (comp.join(F.broadcast(bad_roots), "root", "left_semi")
                          .select(F.col("node").alias(id_col)))
    survivors_in_batch = cc.dedup_corpus(new_docs, intra, id_col=id_col,
                                         components=comp)
    reject = hits.unionByName(cluster_reject).distinct()
    return survivors_in_batch.join(reject, id_col, "left_anti")


def incremental_dedup(spark, path: str, new_docs: DataFrame,
                      text_col: str = "text", id_col: str = "doc_id",
                      jaccard_threshold: float = 0.6,
                      max_bucket: int = 200,
                      out_sink=None,
                      broadcast_threshold: int = 1_000_000) -> DataFrame:
    """Admission control for a new batch: reject rows near-duplicating
    the RESIDENT corpus, collapse duplicate clusters WITHIN the batch to
    their min-id survivor (transitively, via connected components), and
    append only the accepted rows' signatures to the store — "first seen
    wins", the streaming-natural survivor policy.  Returns the accepted
    rows of ``new_docs``.  Re-submitting an already-accepted batch —
    same ids or fresh ids — rejects every row (its first copy now lives
    in the store)."""
    pairs, new_sig = incremental_minhash_pairs(
        spark, path, new_docs, text_col, id_col, jaccard_threshold,
        max_bucket, broadcast_threshold)
    new_ids = new_sig.select(F.col("_id").alias(id_col))
    from .similarity import _live_dir
    stored_ids = spark.read.parquet(_live_dir(f"{path}/sigs")) \
        .select("_id")
    # localCheckpoint (NOT persist): the append below writes into
    # {path}/sigs, and Spark's InsertIntoHadoopFsRelation refreshes that
    # path's file index — invalidating any CACHED plan that reads it
    # (this plan does, via stored_ids).  A recompute after the append
    # would see the just-accepted rows as resident and reject them.
    # Checkpointing truncates the plan to materialized blocks with no
    # path dependency, so the returned DataFrame is stable.
    accepted = _admit_batch(new_docs, pairs, new_ids, stored_ids,
                            id_col).localCheckpoint(eager=True)
    if out_sink is not None:
        # deliver BEFORE the store append: a crash after the append but
        # before delivery would make the replay reject these rows as
        # already-resident — accepted docs silently lost from the
        # output forever.  Sink-first + an idempotent per-batch sink
        # narrows the failure window to a mid-append crash, whose
        # residue is duplicate store rows, not lost documents.
        out_sink(accepted)
    append_to_minhash_store(
        spark, path,
        new_sig.join(accepted.select(F.col(id_col).alias("_id")),
                     "_id", "left_semi"),
        check_id_type=False)   # already checked pre-sink in the pairs step
    new_sig.unpersist()
    pairs.unpersist()
    return accepted


def build_phash_store(images: DataFrame, path: str,
                      id_col: str = "image_id", phash_col: str = "phash",
                      max_hamming: int = 3) -> None:
    """Persist the IMAGE corpus's phash state — the multimodal twin of
    :func:`build_minhash_store`: ``sigs`` (_id, simhash) plus the
    pigeonhole ``blocks`` table and a params sidecar.  Incremental
    batches then touch the resident corpus only as a block scan probed
    by a broadcast (no resident shuffle)."""
    import pandas as pd
    sig = images.select(_widened_id_col(images, id_col),
                        F.col(phash_col).cast("long").alias("simhash"))
    sig.write.mode("overwrite").parquet(f"{path}/sigs")
    spark = images.sparkSession
    stored = spark.read.parquet(f"{path}/sigs")
    pigeonhole_block_table(stored, max_hamming) \
        .write.mode("overwrite").parquet(f"{path}/blocks")
    spark.createDataFrame(pd.DataFrame({
        "max_hamming": [max_hamming],
    })).write.mode("overwrite").parquet(f"{path}/params")


def incremental_phash_pairs(spark, path: str, new_images: DataFrame,
                            id_col: str = "image_id",
                            phash_col: str = "phash",
                            max_bucket: int = 200,
                            broadcast_threshold: int = 1_000_000):
    """Near-dup pairs of a new image batch vs the persisted phash store
    AND within the batch — same scale shape as
    :func:`incremental_minhash_pairs` (batch blocks broadcast, resident
    rows scanned, hamming verified JVM-side; ``broadcast_threshold``
    guards the backfill case with the same sort-merge fallback).
    Returns ``(pairs, new_sig)``."""
    from .similarity import _live_dir
    # read-only crashed-swap view — see incremental_minhash_pairs
    bpath = _live_dir(f"{path}/blocks")
    p = spark.read.parquet(f"{path}/params").collect()[0]
    max_hamming = int(p["max_hamming"])

    new_sig = new_images.select(
        _widened_id_col(new_images, id_col),
        F.col(phash_col).cast("long").alias("simhash")).persist()
    # type-match vs the resident store BEFORE pair work / sink delivery
    # (review r7, third pass — same rationale as the minhash path)
    _check_store_id_type(spark, path, new_sig)
    n_new = new_sig.count()
    small_batch = n_new * (max_hamming + 1) <= broadcast_threshold
    new_blocks = pigeonhole_block_table(new_sig, max_hamming)

    stored_blocks = spark.read.parquet(bpath)
    if max_bucket is not None:
        # countDistinct — see incremental_minhash_pairs (replay-duplicated
        # rows must not inflate a bucket over the cap)
        hot = (stored_blocks.groupBy("block_id", "block_val")
                            .agg(F.countDistinct("_id").alias("n"))
                            .where(F.col("n") > max_bucket)
                            .select("block_id", "block_val"))
        stored_blocks = stored_blocks.join(F.broadcast(hot),
                                           ["block_id", "block_val"],
                                           "left_anti")

    nb_side = (F.broadcast(new_blocks) if small_batch
               else new_blocks.hint("merge"))
    cross = (stored_blocks.alias("sb")
             .join(nb_side.alias("nb"),
                   (F.col("sb.block_id") == F.col("nb.block_id"))
                   & (F.col("sb.block_val") == F.col("nb.block_val")))
             .select(F.col("sb._id").alias("id_a"),
                     F.col("nb._id").alias("id_b"),
                     F.bit_count(F.col("sb.simhash")
                                 .bitwiseXOR(F.col("nb.simhash")))
                      .alias("hamming"))
             .where((F.col("hamming") <= max_hamming)
                    & (F.col("id_a") != F.col("id_b")))
             .dropDuplicates(["id_a", "id_b"]))

    intra = simhash_pairs_from_sig(new_sig, max_hamming, max_bucket)
    pairs = cross.unionByName(intra)
    if bpath != f"{path}/blocks":
        # crashed-swap view — see incremental_minhash_pairs
        pairs = pairs.localCheckpoint(eager=True)
    else:
        pairs = pairs.persist()
        pairs.count()
    intra.unpersist()
    return pairs, new_sig


def append_to_phash_store(spark, path: str, new_sig: DataFrame,
                          check_id_type: bool = True) -> int:
    """Image twin of :func:`append_to_minhash_store`: checkpoint once,
    write blocks THEN sigs (same crash-ordering rationale)."""
    from .similarity import _recover_swap
    _recover_swap(f"{path}/sigs")
    _recover_swap(f"{path}/blocks")
    if check_id_type:
        _check_store_id_type(spark, path, new_sig)
    p = spark.read.parquet(f"{path}/params").collect()[0]
    new_sig = new_sig.localCheckpoint(eager=True)
    n = new_sig.count()
    pigeonhole_block_table(new_sig, int(p["max_hamming"])) \
        .write.mode("append").parquet(f"{path}/blocks")
    new_sig.write.mode("append").parquet(f"{path}/sigs")
    return n


def incremental_phash_dedup(spark, path: str, new_images: DataFrame,
                            id_col: str = "image_id",
                            phash_col: str = "phash",
                            max_bucket: int = 200,
                            out_sink=None,
                            broadcast_threshold: int = 1_000_000
                            ) -> DataFrame:
    """Image admission control vs the persisted phash store — identical
    semantics to :func:`incremental_dedup` (same ``_admit_batch`` logic:
    resident-id replay rejection, direct near-dup rejection, WHOLE-
    cluster transitive rejection, min-id in-batch survivor), with
    accepted rows' phashes appended (first-seen-wins, durable)."""
    pairs, new_sig = incremental_phash_pairs(
        spark, path, new_images, id_col, phash_col, max_bucket,
        broadcast_threshold)
    new_ids = new_sig.select(F.col("_id").alias(id_col))
    from .similarity import _live_dir
    stored_ids = spark.read.parquet(_live_dir(f"{path}/sigs")) \
        .select("_id")
    # localCheckpoint, not persist — see incremental_dedup (the sig
    # append refreshes the path's file index and would invalidate a
    # cached plan reading it, flipping the returned rows to rejected)
    accepted = _admit_batch(new_images, pairs.select("id_a", "id_b"),
                            new_ids, stored_ids,
                            id_col).localCheckpoint(eager=True)
    if out_sink is not None:
        out_sink(accepted)   # sink-first — see incremental_dedup
    append_to_phash_store(
        spark, path,
        new_sig.join(accepted.select(F.col(id_col).alias("_id")),
                     "_id", "left_semi"),
        check_id_type=False)   # already checked pre-sink in the pairs step
    new_sig.unpersist()
    pairs.unpersist()
    return accepted


def compact_store(spark, path: str, n_files: int = 8) -> dict:
    """Store maintenance (round-6 verdict #2): rewrite a minhash or phash
    signature store in place — dropping crash-replay-duplicated ``_id``
    rows (admission tolerates them; every scan pays for them forever) and
    coalescing the daily-append small files to ``n_files``.  The derived
    table (``bands``/``blocks``) is REGENERATED from the compacted sigs
    with the params sidecar, which both dedupes it and guarantees
    sig/derived consistency.  Admission and pair results are identical
    pre/post (duplicate rows are byte-identical replay copies — the
    same-id admission guard means a differing re-submission never reaches
    the store).  Returns file/row counts so operators see the reclaim.

    Crash ordering: both rewrites go to tmp dirs first, then swap derived
    THEN sigs — a crash between the swaps leaves new-derived/old-sigs,
    whose extra duplicate sig rows are exactly the state this function
    cleans (re-run to converge); queries stay correct throughout because
    pairs ``dropDuplicates`` and the hot-bucket guard ``countDistinct``.
    Each swap itself uses the shared two-rename protocol of
    ``similarity._swap_dir`` with ``_recover_swap`` restoring a
    mid-swap-crashed directory on the next call.  At deployment the whole
    rewrite is one transactional Iceberg ``rewrite_data_files`` —
    SCALE.md checkpoint row."""
    from .similarity import _count_data_files, _recover_swap, _swap_dir

    p = spark.read.parquet(f"{path}/params").collect()[0]
    is_minhash = "n_hashes" in p.__fields__
    dname = "bands" if is_minhash else "blocks"
    spath, dpath = f"{path}/sigs", f"{path}/{dname}"
    _recover_swap(spath)
    _recover_swap(dpath)
    files_before = _count_data_files(spath) + _count_data_files(dpath)
    sigs = spark.read.parquet(spath)
    rows_before = sigs.count()
    ded = sigs.dropDuplicates(["_id"]).coalesce(max(1, n_files))
    rows_after = ded.count()

    stmp, dtmp = spath + "__compact_tmp", dpath + "__compact_tmp"
    ded.write.mode("overwrite").parquet(stmp)
    ded2 = spark.read.parquet(stmp)
    derived = (band_table(ded2, int(p["n_hashes"]), int(p["bands"]))
               if is_minhash
               else pigeonhole_block_table(ded2, int(p["max_hamming"])))
    derived.coalesce(max(1, n_files)).write.mode("overwrite").parquet(dtmp)

    for live, tmp in ((dpath, dtmp), (spath, stmp)):  # derived THEN sigs
        _swap_dir(live, tmp)
    return {"store": "minhash" if is_minhash else "phash",
            "files_before": files_before,
            "files_after": _count_data_files(spath) + _count_data_files(dpath),
            "rows_before": rows_before, "rows_after": rows_after,
            "dup_rows_dropped": rows_before - rows_after}
