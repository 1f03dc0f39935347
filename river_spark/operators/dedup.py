"""Near-duplicate detection at training-data scale.

Three families, all pure DataFrame compositions (no Python in the data
path — every hash is ``xxhash64`` JVM-side):

- **MinHash + LSH banding**: shingle → k min-hashes (one shuffle) → band
  buckets → candidate pairs → signature-overlap estimate. The classic
  100 TB dedup: candidate generation touches only same-bucket pairs.
- **SimHash**: 64-bit per-doc signature from token hashes; banding on
  16-bit chunks for candidates; exact Hamming distance to verify.
- **Exact Jaccard verification** for candidates (the n-gram inverted-index
  join lives in queries/text.py where it is oracle-checked).

Scale notes: every stage is a hash shuffle on bounded keys; bucket skew
(a shingle shared by millions of docs) is the known hazard — callers cap
bucket width with ``max_bucket`` (drop degenerate buckets, the standard
LSH trick) so one hot bucket can't produce O(n²) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, hashed: bool = False
) -> DataFrame:
    """Distinct n-token shingles per document.

    ``hashed=True`` fingerprints each shingle to an int64 (xxhash64)
    before the distinct — the 100 TB default: the dedup shuffle then moves
    8-byte longs instead of full shingle strings (~2.5x less shuffle IO)
    and every downstream hash/compare runs on a fixed-width key. Collision
    odds are ~n²/2⁶⁴ (≪1e-9 even at billions of distinct shingles)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    col = F.xxhash64(F.col("s")) if hashed else F.col("s")
    return (
        df.select(F.col(id_col).alias("doc_id"), toks.alias("t"))
        .select(
            "doc_id",
            F.explode(
                F.expr(f"transform(sequence(0, greatest(size(t) - {n}, 0)), i -> concat_ws(' ', slice(t, i + 1, {n})))")
            ).alias("s"),
        )
        .select("doc_id", col.alias("shingle"))
        .distinct()
    )


def minhash_signatures(sh: DataFrame, num_hashes: int = 64) -> DataFrame:
    """k independent min-hashes per doc in ONE aggregation (k min() columns
    over xxhash64(seed, shingle)); returns doc_id + sig array<long>.
    Feed it hashed shingles (``shingles(..., hashed=True)``) so each of the
    k seed-hashes runs over an 8-byte long, not the shingle string."""
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}") for i in range(num_hashes)
    ]
    per_doc = sh.groupBy("doc_id").agg(*aggs)
    return per_doc.select("doc_id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))


def lsh_candidate_pairs(
    sigs: DataFrame, bands: int = 16, max_bucket: int = 1000
) -> DataFrame:
    """Band the signature; docs sharing any band-bucket become candidates.
    Buckets wider than max_bucket are dropped (degenerate content)."""
    num_hashes = bands  # rows per band derived from sig length at runtime
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {bands} - 1), "
                f"b -> xxhash64(b, concat_ws(',', slice(sig, b * (size(sig) div {bands}) + 1, size(sig) div {bands}))))"
            )
        ).alias("band", "bucket"),
    )
    sized = banded.groupBy("band", "bucket").agg(
        F.collect_list("doc_id").alias("docs"), F.count("*").alias("width")
    ).filter((F.col("width") > 1) & (F.col("width") <= max_bucket))
    a = sized.select("band", "bucket", F.explode("docs").alias("doc_a"))
    b = sized.select("band", "bucket", F.explode("docs").alias("doc_b"))
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    max_bucket: int = 1000,
    persist_signatures: bool = True,
) -> DataFrame:
    """Full pipeline → [doc_a, doc_b, est_jaccard] for pairs whose
    signature-overlap estimate >= threshold.

    The signature table is consumed three times (banding, sig_a join,
    sig_b join); without materialization Spark recomputes the expensive
    shingle→min-hash aggregation each time. ``persist_signatures``
    memory/disk-caches it — the 100 TB analog is writing the signature
    table to Parquet once at index-build time and joining against that.
    """
    sh = shingles(df, id_col, text_col, n, hashed=True)
    sigs = minhash_signatures(sh, num_hashes)
    if persist_signatures:
        sigs = sigs.persist()
    cand = lsh_candidate_pairs(sigs, bands, max_bucket)
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    est = (
        F.size(F.arrays_zip("sig_a", "sig_b"))
        - F.size(F.filter(F.arrays_zip("sig_a", "sig_b"), lambda s: s.sig_a != s.sig_b))
    ) / F.size(F.col("sig_a"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", F.round(est, 4).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n_chunks: int = 8
) -> DataFrame:
    """64-bit SimHash per doc, split into ``n_chunks`` equal bit-chunks
    (array<int>) ready for band-based candidate generation. One explode +
    one groupBy. By pigeonhole, any pair with Hamming distance < n_chunks
    shares at least one chunk, so 8 chunks guarantees candidates for
    Hamming <= 7 (16-bit chunks would miss spread-out flips)."""
    toks = (
        df.select(F.col(id_col).alias("doc_id"), F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("t"))
        .select("doc_id", F.explode("t").alias("tok"))
        .withColumn("h", F.xxhash64("tok"))
    )
    # per-bit ±1 sums in one aggregation
    bit_aggs = [
        F.sum(
            F.when((F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1))) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    per_doc = toks.groupBy("doc_id").agg(*bit_aggs)
    width = 64 // n_chunks
    chunk_exprs = []
    for c in range(n_chunks):
        bits = [
            F.when(F.col(f"b{width * c + j}") > 0, F.lit(1 << j)).otherwise(0)
            for j in range(width)
        ]
        acc = bits[0]
        for e in bits[1:]:
            acc = acc + e
        chunk_exprs.append(acc.cast("int"))
    return per_doc.select("doc_id", F.array(*chunk_exprs).alias("chunks"))


def simhash_pairs(sigs: DataFrame, max_hamming: int = 12, max_bucket: int = 1000) -> DataFrame:
    """Candidates share at least one 16-bit chunk (pigeonhole: any pair with
    Hamming <= 3*16 shares a chunk... we verify exactly anyway); returns
    [doc_a, doc_b, hamming] with hamming <= max_hamming.

    ``sigs`` is consumed three times (banding + both verify joins) — persist
    so the 64-bit-agg signature build runs once."""
    sigs = sigs.persist()
    banded = sigs.select("doc_id", F.posexplode("chunks").alias("band", "bucket"))
    sized = banded.groupBy("band", "bucket").agg(
        F.collect_list("doc_id").alias("docs"), F.count("*").alias("width")
    ).filter((F.col("width") > 1) & (F.col("width") <= max_bucket))
    a = sized.select("band", "bucket", F.explode("docs").alias("doc_a"))
    b = sized.select("band", "bucket", F.explode("docs").alias("doc_b"))
    cand = (
        a.join(b, ["band", "bucket"]).filter(F.col("doc_a") < F.col("doc_b")).select("doc_a", "doc_b").distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("chunks").alias("ch_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("chunks").alias("ch_b"))
    hamming = F.aggregate(
        F.zip_with("ch_a", "ch_b", lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup (random-hyperplane LSH + exact verify)
# ---------------------------------------------------------------------------
def cosine_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_planes: int = 16,
    threshold: float = 0.95,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicate vectors: random-hyperplane sign signature buckets
    candidates, exact cosine verifies. Planes are derived deterministically
    from xxhash64(plane, dim) — no driver-side randomness to broadcast."""
    # sign bit p = sign(Σ_d v[d] * plane(p,d)), plane value in [-1, 1)
    sig = F.expr(
        f"""
        transform(sequence(0, {n_planes} - 1), p ->
          aggregate(
            zip_with({vec_col}, sequence(0, size({vec_col}) - 1),
                     (v, d) -> cast(v as double) * (cast(xxhash64(p, d) % 1000000 as double) / 1000000.0)),
            cast(0.0 as double), (acc, x) -> acc + x) > 0.0)
        """
    )
    vecs = df.select(F.col(id_col).alias("doc_id"), F.col(vec_col).alias("v"), sig.alias("sig"))
    # signature projection feeds the width filter and both pair sides:
    # persist so the O(planes x dim) hyperplane dot products run once
    bucketed = vecs.select(
        "doc_id", "v", F.xxhash64(F.expr("cast(sig as string)")).alias("bucket")
    ).persist()
    sized = bucketed.groupBy("bucket").agg(F.count("*").alias("width")).filter(
        (F.col("width") > 1) & (F.col("width") <= max_bucket)
    )
    in_bucket = bucketed.join(sized.select("bucket"), "bucket")
    a = in_bucket.select("bucket", F.col("doc_id").alias("doc_a"), F.col("v").alias("va"))
    b = in_bucket.select("bucket", F.col("doc_id").alias("doc_b"), F.col("v").alias("vb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(
            F.zip_with(c, c, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    cos = dot / (norm("va") * norm("vb"))
    return (
        a.join(b, "bucket")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.round(cos, 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
        .distinct()
    )
