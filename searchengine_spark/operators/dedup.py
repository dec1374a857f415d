"""Deduplication operators for large-scale training-data pipelines.

The reference's only dedup is the crawl visited-set (ParseHtml.java:28-29,
F5 — exact URL dedup via a shared mutable set), replaced here by shuffle
dedup; the rest are first-class scale extensions:

- exact          content-hash groupBy (one shuffle, map-side combine)
- ngram_jaccard  exact word-shingle Jaccard similarity pairs (self-join on
                 shingle; the brute-force oracle for the sketch methods)
- minhash_lsh    MinHash signatures + LSH banding: candidate pairs meet in
                 band buckets (equi-join on (band, bucket)) instead of an
                 all-pairs cross join — the 100 TB path.  Deterministic: the
                 k hash functions are ``xxhash64(shingle, seed=i)``.
- simhash        64-bit SimHash fingerprints + hamming-distance candidate
                 pairs bucketed by 16-bit blocks (index permutation trick).

All of it is built-in-function DataFrame code — no Python UDFs.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def _shingle_col(text_col: str, n: int):
    """array<string> of distinct word n-grams, JVM-side.

    Guarded: ``sequence(0, size-n)`` would DESCEND for docs shorter than n
    tokens (Spark sequence semantics), so short docs map to array() instead.
    Splits on a single space to mirror the oracle's ``string_split``.
    """
    arr = f"split({text_col}, ' ')"
    grams = F.expr(
        f"CASE WHEN size({arr}) >= {n} THEN "
        f"transform(sequence(0, size({arr}) - {n}), "
        f"i -> concat_ws(' ', slice({arr}, i + 1, {n}))) "
        f"ELSE array() END"
    )
    return F.array_distinct(grams)


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(fp, keep_id, n_dups): one row per distinct content hash; keep the
    smallest id (deterministic winner).  Single hash-aggregate shuffle."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("fp"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
    )


def shingles(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
             n: int = 3) -> DataFrame:
    """(id, shingle) distinct word n-grams per doc (empty for short docs)."""
    grams = _shingle_col(text_col, n)
    return (
        docs.select(id_col, F.explode(grams).alias("shingle"))
        .filter(F.col("shingle") != "")
        .distinct()
    )


def ngram_jaccard_pairs(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """Exact Jaccard pairs (a < b) over word n-gram sets.

    Self-equi-join on shingle -> per-pair intersection counts -> sizes join.
    O(Σ postings²) per hot shingle: correct at test scale and the oracle for
    the LSH path; at 100 TB use :func:`minhash_lsh_pairs` instead.
    """
    sh = shingles(docs, text_col, id_col, n)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", n: int = 3,
                       num_hashes: int = 64) -> DataFrame:
    """(id, sig: array<long>[num_hashes]) — sig[i] = min over shingles of
    xxhash64(shingle, seed=i).  Deterministic, JVM-side, no UDFs: the per-doc
    min-hash is computed by ``transform`` over seeds + ``array_min`` over
    shingle hashes — zero shuffles beyond the input scan."""
    grams = _shingle_col(text_col, n)
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    sig = F.transform(
        seeds,
        lambda s: F.array_min(
            F.transform(F.col("_sh"), lambda g: F.xxhash64(g, s))
        ),
    )
    return (
        docs.select(id_col, F.array_distinct(grams).alias("_sh"))
        .filter(F.size("_sh") > 0)
        .select(id_col, sig.alias("sig"))
    )


def minhash_lsh_pairs(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", n: int = 3,
                      num_hashes: int = 64, bands: int = 16,
                      threshold: float = 0.5, verify: bool = True) -> DataFrame:
    """MinHash + LSH banding near-dup pairs.

    num_hashes/bands rows per band; two docs collide if any band signature
    matches (equi-join on (band, hash-of-rows)).  ``verify=True`` re-checks
    candidates with exact n-gram Jaccard (no false positives; recall is the
    usual LSH S-curve).  The band join is the scale path: shuffle keyed on
    (band, bucket) — hot buckets are bounded by band width.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(docs, text_col, id_col, n, num_hashes)
    band_idx = F.sequence(F.lit(0), F.lit(bands - 1))
    banded = sigs.select(
        id_col,
        F.explode(
            F.transform(
                band_idx,
                lambda bidx: F.struct(
                    bidx.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(
                                    F.col("sig"), bidx * rows_per_band + 1, rows_per_band
                                ),
                                lambda x: x.cast("string"),
                            ),
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    a = banded.select(F.col(id_col).alias("doc_a"), "band", "bucket")
    b = banded.select(F.col(id_col).alias("doc_b"), "band", "bucket")
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    if not verify:
        return cand
    exact = ngram_jaccard_pairs(docs, text_col, id_col, n, threshold)
    return cand.join(exact, ["doc_a", "doc_b"]).select("doc_a", "doc_b", "jaccard")


def simhash64(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash: long) — 64-bit SimHash over word tokens.

    Per bit i: sum over tokens of ±1 by bit i of xxhash64(token); bit set if
    the sum > 0.  Expressed with transform/aggregate/filter built-ins —
    whole-stage codegen, no shuffle (narrow map)."""
    toks = F.expr(f"filter(split({text_col}, '\\\\s+'), t -> t <> '')")
    # SQL-expr form: the Python shiftright/shiftleft wrappers require literal
    # shift amounts, but the SQL builtins take expressions (the lambda var).
    packed = F.expr(
        "aggregate(sequence(0, 63), cast(0 as bigint), (acc, i) -> acc | IF("
        "  aggregate(_t, 0, (a, t) ->"
        "    a + IF((shiftright(xxhash64(t), i) & 1) = 1, 1, -1)) > 0,"
        "  shiftleft(cast(1 as bigint), i), cast(0 as bigint)))"
    )
    return docs.select(id_col, toks.alias("_t")).filter(F.size("_t") > 0).select(
        id_col, packed.alias("simhash")
    )


def simhash_near_pairs(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Near-dup candidate pairs by SimHash hamming distance <= max_hamming.

    Block trick: split the 64-bit fingerprint into 4 x 16-bit blocks; any
    pair within hamming<=3 shares at least one exact block -> equi-join on
    (block_idx, block_value), then verify the true hamming distance with
    bit_count.  Avoids the all-pairs cross join at scale.
    """
    sh = simhash64(docs, text_col, id_col)
    exploded = sh.select(
        id_col,
        "simhash",
        F.explode(
            F.expr(
                "transform(sequence(0, 3), i -> "
                "struct(i AS blk, shiftright(simhash, i * 16) & 65535 AS val))"
            )
        ).alias("b"),
    ).select(id_col, "simhash", "b.blk", "b.val")
    a = exploded.select(F.col(id_col).alias("doc_a"), F.col("simhash").alias("sh_a"), "blk", "val")
    b = exploded.select(F.col(id_col).alias("doc_b"), F.col("simhash").alias("sh_b"), "blk", "val")
    return (
        a.join(b, ["blk", "val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
