"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design for 10^12 documents:
  * exact: groupBy(content hash) — one shuffle on a 16-byte key, never on
    the text itself.
  * MinHash+LSH: signatures are computed in-row (transform/array_min, pure
    Catalyst, no shuffle); banding shuffles only (band_id, band_key) pairs;
    candidate verification touches text again only for the tiny candidate
    set (semi-join back).
  * SimHash: relational explode + conditional agg; the bit-vote shuffle
    carries (doc, bit, ±1) longs only.
All hashes derive from md5 (engine-portable) — swap for xxhash64 when DuckDB
parity is not required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

N_MINHASH_DEFAULT = 4


def content_hash(text) -> F.Column:
    return F.md5(text)


def exact_dedup(df: DataFrame, text_col: str = "text", keep_cols=None) -> DataFrame:
    """Keep one row per distinct content hash (deterministic winner: min of
    the first key column). The reference's drop_duplicates analog
    (ispaq/concierge.py:1001-1005) made shuffle-cheap: the hash, not the
    document, is the shuffle key."""
    h = content_hash(F.col(text_col)).alias("_ch")
    w_cols = keep_cols or df.columns
    from pyspark.sql import Window

    win = Window.partitionBy("_ch").orderBy(*w_cols[:1])
    return (
        df.withColumn("_ch", h)
        .withColumn("_rn", F.row_number().over(win))
        .where("_rn = 1")
        .drop("_ch", "_rn")
    )


def hex_hash(col) -> F.Column:
    """First 8 md5 hex chars -> bigint (portable 32-bit content hash)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def shingles_of(toks: F.Column, k: int = 3, sep: str = " ") -> F.Column:
    """k-shingles from a token array column, CLOSURE-FREE.

    `sep` joins the k tokens per shingle (default word-gram " "; pass ""
    with a char array from split(text, '') for char n-grams — the substr-
    per-position form is O(len^2) because UTF8String.substring scans to
    the codepoint offset on every call).

    Never build shingles with `transform(sequence(...), i -> slice(toks,
    i, k))`: the lambda closes over `toks`, and Catalyst's projection
    collapsing can inline the upstream split(text) EXPRESSION into the
    lambda body, where the HOF re-evaluates it PER ELEMENT — O(len^2)
    re-splits, ~10^12 character ops on a 10^6-token document (found live
    by the hostile fixture; materializing toks with withColumn does NOT
    reliably survive the optimizer). This form zips top-level shifted
    copies instead: every slice is evaluated once per ROW, the zip_with
    lambdas touch only their element arguments, so no optimizer rewrite
    can make it quadratic.

    Pass count is O(log k) by binary doubling (fast-exponentiation over
    array-shift-and-concat): `cur` always holds the width-2^m shingle
    array and squares by zipping with itself shifted 2^m; set bits of k
    append `cur` to the accumulated prefix `res`. Character copying drops
    from O(n*k^2) for the naive one-token-per-pass chain (pass j copies
    width-j partials: sum 2..k) to O(n*k*log k) worst case — for k=8
    that is 3 passes copying 2+4+8=14n chars vs 7 passes copying 35n.
    Order is preserved because `res` is always the contiguous prefix
    block and `cur` is appended at offset res_width.

    Trailing positions are partial (zip_with pads the shorter side with
    null; concat_ws skips nulls) — position p is a full k-gram iff
    p <= n-k+1, which is exactly the final slice bound, so partials in
    INTERMEDIATE widths also never leak: combining a full width-rw prefix
    at p with a full width-cw block at p+rw needs p <= n-(rw+cw)+1, the
    same invariant."""
    n = F.size(toks)

    def shift(arr: F.Column, s: int) -> F.Column:
        return F.slice(arr, s + 1, n - s)

    def join2(a: F.Column, b: F.Column) -> F.Column:
        return F.zip_with(a, b, lambda x, y: F.concat_ws(sep, x, y))

    res = None  # accumulated prefix shingle array
    res_w = 0  # its width in tokens
    cur, cur_w = toks, 1  # current power-of-two block
    kk = k
    while kk:
        if kk & 1:
            if res is None:
                res, res_w = cur, cur_w
            else:
                res = join2(res, shift(cur, res_w))
                res_w += cur_w
        kk >>= 1
        if kk:  # don't square past the last bit
            cur = join2(cur, shift(cur, cur_w))
            cur_w *= 2
    return F.when(
        n >= k, F.slice(res, 1, F.greatest(n - (k - 1), F.lit(0)))
    )


def with_shingles(
    df: DataFrame, text_col: str, out_col: str, k: int = 3
) -> DataFrame:
    """df + `out_col` k-shingle array (closure-free; see `shingles_of`)."""
    return df.withColumn(
        out_col, shingles_of(F.split(F.col(text_col), " "), k)
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = N_MINHASH_DEFAULT,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, mh0..mh{n-1}) — in-row, no shuffle, no Python."""
    d = with_shingles(df, text_col, "_grams", shingle_k).where(
        F.col("_grams").isNotNull()
    )

    def sig(j: int):
        prefix = f"{j}|"
        return F.array_min(
            F.transform(
                F.col("_grams"),
                lambda s: hex_hash(F.concat(F.lit(prefix), s)),
            )
        ).alias(f"mh{j}")

    return d.select(id_col, *[sig(j) for j in range(n_hashes)])


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str = "doc_id", rows_per_band: int = 2
) -> DataFrame:
    """Band the signature columns and self-join per band bucket ->
    (id_a, id_b) candidate pairs (deduplicated across bands).

    The shuffle key is (band_idx, band_hash) — tiny. At scale, hot buckets
    (boilerplate near-dups) are handled by AQE skew-join splitting.
    """
    mh_cols = [c for c in sigs.columns if c.startswith("mh")]
    bands = [
        mh_cols[i : i + rows_per_band]
        for i in range(0, len(mh_cols), rows_per_band)
    ]
    exploded = None
    for bi, cols in enumerate(bands):
        b = sigs.select(
            F.col(id_col),
            F.lit(bi).alias("band"),
            F.concat_ws("_", *[F.col(c) for c in cols]).alias("bkey"),
        )
        exploded = b if exploded is None else exploded.unionByName(b)
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def jaccard_verify(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
) -> DataFrame:
    """Exact word-set Jaccard for candidate pairs; keeps pairs >= threshold.
    Joins the (small) candidate set back to the corpus twice — semi-join
    shaped, so the corpus is scanned, never shuffled on text."""
    ws = df.select(
        F.col(id_col),
        F.array_distinct(F.split(F.col(text_col), " ")).alias("ws"),
    )
    a = ws.select(F.col(id_col).alias("id_a"), F.col("ws").alias("ws_a"))
    b = ws.select(F.col(id_col).alias("id_b"), F.col("ws").alias("ws_b"))
    j = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("ws_a", "ws_b"))
    union = F.size("ws_a") + F.size("ws_b") - inter
    return (
        j.withColumn("jaccard", inter / union)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
) -> DataFrame:
    """End-to-end near-dup removal: signatures -> LSH pairs -> Jaccard
    verify -> drop the higher id of each confirmed pair (greedy, matches
    the usual near-dedup convention of keeping the first-seen doc)."""
    sigs = minhash_signatures(df, id_col, text_col)
    pairs = lsh_candidate_pairs(sigs, id_col)
    dups = (
        jaccard_verify(df, pairs, id_col, text_col, threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return df.join(dups, id_col, "left_anti")


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 16
) -> DataFrame:
    """Per-doc SimHash fingerprint via relational bit votes."""
    spark = df.sparkSession
    tok = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("w"),
    )
    h = tok.withColumn("hw", hex_hash(F.col("w")))
    bit_df = spark.range(0, bits).select(F.col("id").cast("int").alias("b"))
    votes = (
        h.crossJoin(F.broadcast(bit_df))
        .groupBy(id_col, "b")
        .agg(
            F.sum(F.when(F.expr("(hw >> b) & 1") == 1, 1).otherwise(-1)).alias(
                "s"
            )
        )
    )
    return votes.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(1L, b)")).otherwise(0)
        ).alias("simhash")
    )
