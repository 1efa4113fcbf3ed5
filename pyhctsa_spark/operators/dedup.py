"""Deduplication operators for training-data pipelines.

All hot-path expressions are JVM-side built-ins (xxhash64, higher-order
array functions) — no Python in the scan path; Catalyst sees plain
aggregates and joins it can push down, reorder, and (for the small
sides) broadcast. Each operator returns a DataFrame and is paired with
a DuckDB oracle in plans/oracle_queries.py where SQL-expressible.

At 100 TB: exact dedup is one hash-aggregate (combiner-friendly);
MinHash-LSH shuffles only (band_id, band_hash, doc_id) tuples — ~100
bytes/doc instead of documents; candidate verification joins are
doc-pair-local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by content hash: one row per distinct text
    with its canonical (min) id and the duplicate count."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_copies"),
        )
    )


def dedup_keep_first(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Drop exact duplicates, keeping the smallest id per content hash
    (deterministic winner — no 'first seen' nondeterminism)."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def _shingle_df(
    df: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    """(id, sh: array<string>) distinct k-word shingles per doc.

    Two-step projection on purpose: ``words`` must be a real column
    before the shingle transform references it ~3k times — inlining the
    split() into the expression tree re-splits the text once per
    element_at (measured 10x the whole stage cost). A non-cheap,
    multiply-referenced alias is a projection barrier Catalyst keeps.
    """
    words = df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("_w"))
    # docs shorter than k words have no k-shingles — filter BEFORE the
    # transform: sequence(0, negative) descends and element_at then
    # reads indices <= 0, an ArrayIndexOutOfBounds under ANSI mode
    words = words.where(F.size("_w") >= k)
    idx = F.sequence(F.lit(0), F.size("_w") - k)
    sh = F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(F.col("_w"), i + j + 1) for j in range(k)]
            ),
        )
    )
    # no trailing where(size(sh) > 0): after the >= k filter the array
    # is non-empty BY CONSTRUCTION (>= 1 window, array_distinct keeps
    # >= 1), and the redundant predicate was costing a full second
    # interpreted evaluation of the transform — Catalyst pushes the
    # filter into the scan, so every shingle was built twice (3x across
    # a join boundary; measured 32 -> 21 s on the 50k-doc pass)
    return words.select(id_col, sh.alias("sh"))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """MinHash signatures over k-word shingles.

    sig[s] = min over shingles of xxhash64(shingle, seed=s), computed as
    explode(shingles) -> 64 partial min-aggregates. Each shingle is
    materialized and hashed exactly once (an earlier higher-order-function
    formulation re-evaluated the shingle construction inside the 64-seed
    lambda — 64x the string work per row); the shuffle carries only 64
    partially-combined longs per doc, so this is the 100 TB shape too.

    Pass ``shingles`` (a persisted ``_shingle_df`` output) to reuse an
    already-tokenized corpus — at warehouse scale the tokenize+shingle
    scan is the dominant cost and must run ONCE per pipeline.
    """
    sh = shingles if shingles is not None else _shingle_df(
        df, text_col, id_col, shingle_k
    )
    exploded = sh.select(F.col(id_col), F.explode("sh").alias("sh"))
    aggs = [
        F.min(F.xxhash64(F.col("sh"), F.lit(s))).alias(f"_m{s}")
        for s in range(num_hashes)
    ]
    return (
        exploded.groupBy(id_col)
        .agg(*aggs)
        .select(
            id_col,
            F.array(*[F.col(f"_m{s}") for s in range(num_hashes)]).alias(
                "minhash_sig"
            ),
        )
    )


def minhash_lsh_candidates(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
    cleanup: list | None = None,
) -> DataFrame:
    """LSH banding: docs sharing any band bucket become candidate pairs,
    with the signature-estimated Jaccard attached.

    Shuffle volume is (band_id, band_hash, id) only. The self-join runs
    on the banded table grouped by bucket; AQE splits skewed buckets.
    """
    banded = sig_df.select(
        id_col,
        "minhash_sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band_id"),
                    F.xxhash64(
                        F.slice(F.col("minhash_sig"), b * rows_per_band + 1, rows_per_band)
                    ).alias("band_hash"),
                ),
            )
        ).alias("band"),
    ).select(id_col, "minhash_sig", "band.band_id", "band.band_hash")
    # materialize the banded signature table before the self-join — both
    # aliases below would otherwise recompute the full signature pipeline
    # (at warehouse scale this is the persisted signature table)
    banded = banded.persist()
    if cleanup is not None:
        cleanup.append(banded)
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col(f"a.band_id") == F.col(f"b.band_id"))
            & (F.col(f"a.band_hash") == F.col(f"b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.minhash_sig").alias("sig_a"),
            F.col("b.minhash_sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda v: v,
            )
        )
        / F.size("sig_a")
    ).cast("double")
    return pairs.select("id_a", "id_b", est.alias("est_jaccard"))


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """End-to-end MinHash-LSH near-duplicate pairs above a signature-
    Jaccard threshold."""
    # persisted shingles: the cache boundary stops
    # InferFiltersFromGenerate's size(sh)>0 being pushed into the scan,
    # which would build every shingle twice (see _shingle_df)
    sh = _shingle_df(df, text_col, id_col, shingle_k).persist()
    sigs = minhash_signatures(
        df, text_col, id_col, num_hashes, shingle_k, shingles=sh
    )
    cands = minhash_lsh_candidates(sigs, id_col, bands, num_hashes // bands)
    return cands.where(F.col("est_jaccard") >= threshold)


def derive_lsh_banding(
    num_hashes: int, threshold: float, target_recall: float = 0.95
) -> tuple[int, int]:
    """Pick (bands, rows_per_band) so LSH candidate recall at the given
    Jaccard threshold is >= target_recall.

    recall(J) = 1 - (1 - J^r)^(n/r). Larger r prunes more candidates but
    loses recall at low J; this chooses the LARGEST r that still meets
    the target (fewest candidate pairs at the contracted recall). r=1
    always satisfies the target (every shared minhash value collides),
    so the function cannot fail — but a low threshold genuinely costs
    candidate volume, and that cost is now explicit rather than a
    silent recall hole.
    """
    best = None
    r = 1
    while r <= num_hashes:
        if num_hashes % r == 0:
            recall = 1.0 - (1.0 - threshold**r) ** (num_hashes // r)
            if recall >= target_recall:
                best = (num_hashes // r, r)
        r *= 2
    if best is None:
        best = (num_hashes, 1)
    return best


def _rep_election(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """ONE window pass over md5(text): tag every row with its
    exact-duplicate group's representative (``_rep`` = min id over the
    content-hash partition). Returned persisted — both downstream uses
    (member map + representative rows) reuse the single pass instead of
    re-hashing the corpus text. Shared by minhash_verified_pairs'
    exact-collapse and near_dup_clusters so the content-hash and
    rep-tie-break conventions cannot drift between the pair path and
    the cluster path.

    Lifecycle note: the persist is released by session teardown (the
    spark-submit jobs) or ``spark.catalog.clearCache()`` (bench does
    this between reps) — a long-lived interactive session running
    dedup repeatedly should do the same, since the returned DataFrame
    is lazy and the operator cannot know when both consumers have
    materialized."""
    w = Window.partitionBy(F.md5(F.col(text_col)))
    return df.withColumn("_rep", F.min(id_col).over(w)).persist()


def _verified_pairs_core(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    bands: int | None,
    shingle_k: int,
    threshold: float,
    cleanup: list | None = None,
) -> DataFrame:
    """The naive (no exact-collapse) LSH + verify pipeline; see
    ``minhash_verified_pairs`` for the contract."""
    if bands is None:
        bands, _ = derive_lsh_banding(num_hashes, threshold)
    # the shingle table feeds the signature build AND both sides of the
    # verify join — materialize once so the corpus is tokenized ONCE
    sh_df = _shingle_df(df, text_col, id_col, shingle_k).persist()
    if cleanup is not None:
        cleanup.append(sh_df)
    sigs = minhash_signatures(
        df, text_col, id_col, num_hashes, shingle_k, shingles=sh_df
    )
    cands = minhash_lsh_candidates(
        sigs, id_col, bands, num_hashes // bands, cleanup=cleanup
    ).select("id_a", "id_b")
    a = sh_df.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh_df.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    ic = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = ic / (F.size("sh_a") + F.size("sh_b") - ic).cast("double")
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select(
            F.col("id_a").alias("d1"),
            F.col("id_b").alias("d2"),
            jac.alias("_j"),
        )
        .where(F.col("_j") >= threshold)
        .select("d1", "d2", F.round("_j", 6).alias("jaccard"))
    )


def minhash_verified_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int | None = None,
    shingle_k: int = 3,
    threshold: float = 0.3,
    collapse_exact: bool = True,
    cleanup: list | None = None,
) -> DataFrame:
    """MinHash-LSH candidates verified with EXACT shingle Jaccard.

    This is the production near-dup shape: LSH banding prunes the pair
    space (shuffle volume = band tuples, never documents), then each
    surviving candidate pair is verified pair-locally against the true
    Jaccard of its distinct k-shingle sets.

    By default the banding is DERIVED from ``threshold`` so candidate
    recall at the threshold is >= 0.95 (derive_lsh_banding) — a fixed
    16x4 banding has only ~12%% recall at J=0.3, silently missing
    moderate-similarity pairs. Pass ``bands`` explicitly to override
    (recall is then the caller's contract).

    ``collapse_exact`` (default on) elects one representative per
    EXACT-duplicate content group before the expensive stages, then
    expands the representative pairs back to member pairs. Output is
    identical to the naive pipeline — Jaccard depends only on the
    shingle set, so within-group pairs are exactly 1.0 and cross-group
    pairs inherit their representatives' value — but shingling,
    signatures, banding and verify all run on unique content only. On
    a crawl-shaped corpus (10x exact copies) this is the difference
    between tokenizing 50k and 5k documents (~6x measured end-to-end);
    at warehouse scale it also removes the k-copies -> k^2/2 band-join
    blowup inside duplicate clusters. Disable when the corpus is known
    duplicate-free (e.g. already exact-deduped) to skip the collapse
    window's shuffle.
    """
    if not collapse_exact:
        return _verified_pairs_core(
            df, text_col, id_col, num_hashes, bands, shingle_k, threshold,
            cleanup=cleanup,
        )
    # eligibility mirrors _shingle_df's pre-filter: docs with fewer
    # than k words have no shingles and are absent from naive output —
    # they must not resurface as J=1.0 within-group pairs
    eligible = df.select(F.col(id_col), F.col(text_col)).where(
        F.size(F.split(F.col(text_col), " ")) >= shingle_k
    )
    with_rep = _rep_election(eligible, text_col, id_col)
    if cleanup is not None:
        cleanup.append(with_rep)
    members = with_rep.select(
        F.col("_rep"), F.col(id_col).alias("_m")
    )
    reps = with_rep.where(F.col(id_col) == F.col("_rep")).select(
        id_col, text_col
    )
    rep_pairs = _verified_pairs_core(
        reps, text_col, id_col, num_hashes, bands, shingle_k, threshold,
        cleanup=cleanup,
    )
    # cross-group: every member pair across two near-dup groups carries
    # the representatives' exact Jaccard (identical shingle sets)
    m1 = members.select(F.col("_rep").alias("d1"), F.col("_m").alias("m1"))
    m2 = members.select(F.col("_rep").alias("d2"), F.col("_m").alias("m2"))
    cross = (
        rep_pairs.join(m1, "d1").join(m2, "d2")
        .select(
            F.least("m1", "m2").alias("d1"),
            F.greatest("m1", "m2").alias("d2"),
            "jaccard",
        )
    )
    # within-group: exact copies, Jaccard exactly 1
    x, y = members.alias("x"), members.alias("y")
    within = (
        x.join(y, (F.col("x._rep") == F.col("y._rep"))
               & (F.col("x._m") < F.col("y._m")))
        .select(
            F.col("x._m").alias("d1"),
            F.col("y._m").alias("d2"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    return cross.unionByName(within)


_HEXLUT = "0123456789abcdef"


def simhash_md5(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash with md5-derived word-hash bits, emitted as two
    32-bit halves (fp_hi, fp_lo).

    Same bit-vote construction as ``simhash64`` but the per-word hash
    bits come from the md5 hex digest (bit b = bit (3 - b%4) of hex
    nibble b//4), which an ANSI-SQL oracle can recompute exactly —
    xxhash64 is Spark-only, md5 is universal.

    Shape: explode(distinct words) -> project md5 once per word -> 64
    partial sum-aggregates of ±1 bit votes (the md5 lives in a Project
    under the Aggregate, so it is computed once per word, not once per
    vote). Shuffle volume = 64 partially-combined longs per doc.
    """
    words = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("w"),
    )
    hashed = words.select(id_col, F.md5("w").alias("h"))
    # nibble table computed ONCE per word (16 conv calls) instead of
    # once per BIT (64) — the array is a non-cheap multiply-referenced
    # alias, a projection barrier Catalyst keeps, so the 64 vote
    # expressions below read it instead of re-deriving conv(substring)
    # each (same integers, 4x less per-word work — optimization r6)
    nibbled = hashed.select(
        id_col,
        F.array(*[
            F.conv(F.substring(F.col("h"), i + 1, 1), 16, 10).cast("int")
            for i in range(16)
        ]).alias("_nib"),
    )

    def _bit(b: int):
        nib = F.element_at(F.col("_nib"), b // 4 + 1)
        return F.shiftright(nib, 3 - b % 4).bitwiseAND(F.lit(1))

    votes = nibbled.groupBy(id_col).agg(
        *[F.sum(_bit(b) * 2 - 1).alias(f"_v{b}") for b in range(64)]
    )

    def _half(lo_bit: int):
        acc = F.lit(0).cast("long")
        for b in range(lo_bit, lo_bit + 32):
            acc = acc + F.when(
                F.col(f"_v{b}") > 0, F.lit(1 << (b - lo_bit)).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        return acc

    return votes.select(
        id_col, _half(32).alias("fp_hi"), _half(0).alias("fp_lo")
    )


def simhash_blocked(
    sim_df: DataFrame, id_col: str = "doc_id", n_chunks: int = 4,
) -> DataFrame:
    """Explode (fp_hi, fp_lo) fingerprints into ``n_chunks`` pigeonhole
    blocking keys: one row per (doc, chunk_id) with the chunk's bit
    value. Shared by the near-pair join and the bucket-fan-out
    diagnostics (bench)."""
    if n_chunks not in (2, 4, 8, 16, 32):
        # chunks must tile both 32-bit halves evenly; an odd/ragged
        # count silently duplicates low bits and never blocks on the
        # high ones, voiding the pigeonhole recall contract
        raise ValueError(
            f"n_chunks must be one of 2/4/8/16/32, got {n_chunks}"
        )
    width = 64 // n_chunks
    per_half = n_chunks // 2
    mask = (1 << width) - 1
    chunk_structs = []
    for c in range(n_chunks):
        src = F.col("fp_lo") if c < per_half else F.col("fp_hi")
        chunk_structs.append(
            F.struct(
                F.lit(c).alias("chunk_id"),
                F.shiftright(src, (c % per_half) * width)
                .bitwiseAND(F.lit(mask))
                .alias("chunk_val"),
            )
        )
    return sim_df.select(
        id_col, "fp_hi", "fp_lo", F.explode(F.array(*chunk_structs)).alias("c")
    ).select(id_col, "fp_hi", "fp_lo", "c.chunk_id", "c.chunk_val")


def simhash_candidate_count(
    sim_df: DataFrame, id_col: str = "doc_id", n_chunks: int = 4,
) -> int:
    """Exact number of candidate pairs the blocked self-join would
    examine (sum of k*(k-1)/2 over buckets) — computed from bucket sizes
    alone, one aggregation, no join. The scale diagnostic for choosing
    the blocking tier."""
    sizes = (
        simhash_blocked(sim_df, id_col, n_chunks)
        .groupBy("chunk_id", "chunk_val")
        .count()
    )
    row = sizes.select(
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("cand")
    ).first()
    return int(row["cand"] or 0)


def simhash_near_pairs_2x32(
    sim_df: DataFrame, id_col: str = "doc_id", max_hamming: int = 3,
    n_chunks: int = 4,
) -> DataFrame:
    """Near-duplicate pairs over (fp_hi, fp_lo) split fingerprints,
    blocked on ``n_chunks`` equal bit-chunks (pigeonhole: full recall to
    hamming n_chunks - 1).

    Scale note: bucket fan-out is the quadratic constant. With 8x8-bit
    chunks each chunk_id has only 256 buckets, so candidate pairs grow
    ~8*(N/256)^2 — a skew bomb at billions of docs. The default 4x16-bit
    blocking (65,536 buckets per chunk_id, full recall to hamming 3)
    shrinks the in-bucket quadratic constant 256x; keep n_chunks=8 as
    the high-recall tier (hamming <= 7) for corpora small enough to
    afford it (Manku et al., WWW'07 — the 64-bit chunk-permutation
    scheme).
    """
    if max_hamming > n_chunks - 1:
        raise ValueError(
            f"pigeonhole blocking with {n_chunks} chunks only guarantees "
            f"full recall to hamming {n_chunks - 1}, got {max_hamming}"
        )
    # materialize before the self-join: both aliases would otherwise
    # recompute the fingerprint aggregation (the persisted-fingerprint
    # table shape at warehouse scale)
    blocked = simhash_blocked(sim_df, id_col, n_chunks).persist()
    a, b = blocked.alias("a"), blocked.alias("b")
    hamming = (
        F.bit_count(F.col("a.fp_lo").bitwiseXOR(F.col("b.fp_lo")))
        + F.bit_count(F.col("a.fp_hi").bitwiseXOR(F.col("b.fp_hi")))
    ).cast("long")
    return (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming.alias("hamming"),
        )
        # filter BEFORE the dropDuplicates shuffle: a pair's hamming is
        # the same in every chunk it collides in, so discarding far
        # pairs first dedupes only the qualifying pairs — 14x fewer
        # rows through the exchange on the sf0.1 corpus (2.4M candidate
        # collisions -> 166k near pairs; optimization r6, guide §2.3)
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def simhash_near_pairs_collapsed(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n_chunks: int = 4,
) -> DataFrame:
    """``simhash_near_pairs_2x32`` with an exact-duplicate pre-collapse:
    bit-identical output on any corpus, dramatically cheaper on
    crawl-shaped ones. The SimHash fingerprint is a pure function of the
    text, so the k copies of a page share one fingerprint — computing it
    k times and letting k identical fingerprints meet in every blocking
    bucket (a k^2 candidate blowup per duplicate group) buys nothing.
    Instead: elect one representative per distinct content
    (_rep_election — the same convention as the MinHash collapse), run
    the fingerprint + blocked self-join over representatives only, then
    expand — within-group pairs at hamming 0 (identical text), and
    cross-group member pairs inheriting their representatives' hamming
    (identical fingerprints ⇒ identical distances)."""
    # NULL-text rows never get a fingerprint on the naive path (explode
    # of split(NULL) drops them), so they must not form an
    # "exact-duplicate group" here either: md5(NULL) is NULL, and the
    # window over it would lump ALL null-text docs into one bogus
    # hamming-0 clique
    with_rep = _rep_election(
        df.select(F.col(id_col), F.col(text_col))
        .where(F.col(text_col).isNotNull()),
        text_col, id_col,
    )
    members = with_rep.select("_rep", F.col(id_col).alias("_m"))
    reps = with_rep.where(F.col(id_col) == F.col("_rep")).select(
        id_col, text_col
    )
    rep_pairs = simhash_near_pairs_2x32(
        simhash_md5(reps, text_col, id_col), id_col, max_hamming, n_chunks
    )
    m1 = members.select(F.col("_rep").alias("id_a"), F.col("_m").alias("m1"))
    m2 = members.select(F.col("_rep").alias("id_b"), F.col("_m").alias("m2"))
    cross = (
        rep_pairs.join(m1, "id_a").join(m2, "id_b")
        .select(
            F.least("m1", "m2").alias("id_a"),
            F.greatest("m1", "m2").alias("id_b"),
            "hamming",
        )
    )
    x, y = members.alias("x"), members.alias("y")
    within = (
        x.join(y, (F.col("x._rep") == F.col("y._rep"))
               & (F.col("x._m") < F.col("y._m")))
        .select(
            F.col("x._m").alias("id_a"),
            F.col("y._m").alias("id_b"),
            F.lit(0).cast("long").alias("hamming"),
        )
    )
    return cross.unionByName(within)


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over word hashes: bit j of the fingerprint is the
    majority vote of bit j across xxhash64(word).

    explode(distinct words) -> project xxhash64 once per word -> 64
    partial ±1-vote sum-aggregates (same single-hash-evaluation shape as
    simhash_md5; an aggregate-over-array formulation re-hashed every
    word once per bit)."""
    words = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("w"),
    )
    hashed = words.select(id_col, F.xxhash64("w").alias("h"))
    # bit masks as Python int64 literals (bit 63 = sign bit in two's
    # complement); shift functions need literal counts, masks don't
    masks = [(1 << b) if b < 63 else -(2**63) for b in range(64)]
    votes = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.col("h").bitwiseAND(F.lit(m)) != 0, 1).otherwise(-1)
            ).alias(f"_v{b}")
            for b, m in enumerate(masks)
        ]
    )
    fp = F.lit(0).cast("long")
    for b, m in enumerate(masks):
        fp = fp + F.when(
            F.col(f"_v{b}") > 0, F.lit(m).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return votes.select(id_col, fp.alias("simhash"))


def simhash_near_pairs(
    sim_df: DataFrame, id_col: str = "doc_id", max_hamming: int = 8,
    n_chunks: int = 8,
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance, blocked on
    (64/n_chunks)-bit chunks. Pigeonhole: a pair within Hamming <=
    n_chunks-1 is guaranteed to share at least one chunk, so the default
    8x8-bit blocking has full recall for max_hamming <= 7 (coarser
    chunks cut candidate volume but lose recall at higher radii)."""
    bits = 64 // n_chunks
    mask = (1 << bits) - 1
    chunks = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("chunk_id"),
                    F.shiftright(F.col("simhash"), c * bits)
                    .bitwiseAND(F.lit(mask))
                    .alias("chunk_val"),
                )
                for c in range(n_chunks)
            ]
        )
    )
    blocked = sim_df.select(id_col, "simhash", chunks.alias("c")).select(
        id_col, "simhash", "c.chunk_id", "c.chunk_val"
    ).persist()  # both self-join sides read the fingerprint table once
    a, b = blocked.alias("a"), blocked.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming.alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .where(F.col("hamming") <= max_hamming)
    )


def _release_local_checkpoint(df: DataFrame) -> None:
    """Free a localCheckpoint's storage blocks.

    ``DataFrame.unpersist()`` only talks to the SQL CacheManager and
    does NOT release checkpoint RDD blocks, so per-batch checkpoints
    accumulate in executor storage for the session's lifetime. The
    blocks live on the RDD inside the checkpointed plan's LogicalRDD
    node — reach it and unpersist there. After release the frame is
    UNREADABLE (a local checkpoint keeps no lineage): call this only
    on frames that will never be scanned again.
    """
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        # non-LogicalRDD plan (not actually checkpointed) or a torn-
        # down JVM during interpreter shutdown — nothing to release
        pass


class _CheckpointHandle:
    """Adapter giving a localCheckpointed frame the same ``unpersist()``
    surface the cleanup lists expect from persisted frames, releasing
    the checkpoint blocks instead (see _release_local_checkpoint)."""

    def __init__(self, df: DataFrame):
        self._df = df

    def unpersist(self, blocking: bool = False) -> None:
        _release_local_checkpoint(self._df)


def dedup_components(
    pairs: DataFrame, max_iterations: int = 50, cleanup: list | None = None,
    max_collect_edges: int = 1_000_000,
) -> DataFrame:
    """Connected components over near-duplicate pairs: returns
    (doc_id, component_id) with component_id = the minimum doc id
    reachable through the pair graph (iterative min-label propagation;
    converges in O(component diameter) rounds, each one join + one
    aggregate — the standard large-graph CC pattern when no graph
    library is present).

    Input: any pair table with columns id_a, id_b.

    Cache lifecycle: iteration state is localCheckpointed (truncating
    the per-round plan lineage — persist alone lets the nested
    cached-plan analysis cost blow up across rounds), and checkpoint
    blocks are explicitly RELEASED: the edge table and each superseded
    label round are dropped inside this function the moment the next
    round is materialized, and the FINAL label table's release handle
    is appended to ``cleanup`` so a long-running stream's per-batch
    storage census stays flat (tests/test_neardup_stream.
    test_batches_do_not_accumulate_cache). A released checkpoint cannot
    be recomputed (no lineage), so callers must only unpersist the
    cleanup handles after the batch's outputs are fully written —
    exactly the contract the rest of the cleanup machinery already has.

    Small graphs (<= ``max_collect_edges`` distinct undirected edges —
    the verified near-dup pair set is normally FAR smaller than the
    corpus) take a DRIVER fast path: collect the edge list, run
    union-find with min-label roots, return a one-slice local frame.
    Identical output (component_id = min reachable id for every
    endpoint node), none of the per-round join/aggregate jobs whose
    fixed scheduling cost dominates at this size (optimization r6,
    guide §1.2: the distributed algorithm was right for huge graphs and
    wrong for bounded ones — same guard pattern as knn_ivf's
    max_broadcast_queries). Larger graphs use the iterative min-label
    propagation unchanged; ``max_collect_edges=0`` forces it.
    """
    undirected = (
        pairs.select("id_a", "id_b").distinct().localCheckpoint(eager=True)
    )
    if undirected.count() <= max_collect_edges:
        rows = undirected.collect()
        _release_local_checkpoint(undirected)
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for a, b in rows:
            if a not in parent:
                parent[a] = a
            if b not in parent:
                parent[b] = b
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra
        root_min: dict = {}
        for x in parent:
            r = find(x)
            m = root_min.get(r)
            if m is None or x < m:
                root_min[r] = x
        from pyspark.sql import types as T

        from ._local_df import one_slice_df

        idt = pairs.schema["id_a"].dataType
        schema = T.StructType([
            T.StructField("doc_id", idt),
            T.StructField("component_id", idt),
        ])
        return one_slice_df(
            pairs.sparkSession,
            [(x, root_min[find(x)]) for x in parent],
            schema,
        )
    edges = (
        undirected.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(
            undirected.select(
                F.col("id_b").alias("src"), F.col("id_a").alias("dst")
            )
        )
        .distinct()
    )
    # materialize the edge table once: every propagation round joins it,
    # and without this each round re-executes the entire upstream pair
    # pipeline (measured: the 10x-corpus clustering spent most of its
    # wall re-deriving minhash edges per iteration)
    edges = edges.localCheckpoint(eager=True)
    _release_local_checkpoint(undirected)
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("component_id", F.col("doc_id"))
    )
    cached_labels: DataFrame | None = None

    def _retire_and_return(final: DataFrame) -> DataFrame:
        _release_local_checkpoint(edges)
        if cleanup is not None:
            cleanup.append(_CheckpointHandle(final))
        return final
    def _neighbor_min(lbl):
        # each node's minimum label among its neighbors
        return (
            edges.join(lbl, edges.dst == lbl.doc_id)
            .groupBy("src")
            .agg(F.min("component_id").alias("nbr_min"))
        )

    for i in range(max_iterations):
        # each node adopts the min label among itself and its neighbors
        neighbor_min = _neighbor_min(labels)
        updated = (
            labels.join(neighbor_min, labels.doc_id == neighbor_min.src, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("component_id"),
                    F.coalesce(F.col("nbr_min"), F.col("component_id")),
                ).alias("component_id"),
            )
        )
        # convergence check every few rounds (an action; cheap on the
        # label table which is tiny relative to the corpus)
        if i % 4 == 3 or i == max_iterations - 1:
            # eager checkpoint materializes the new round FIRST; only
            # then is the previous round's checkpoint released (a
            # released local checkpoint has no lineage to recompute)
            ckpt = updated.localCheckpoint(eager=True)
            changed = (
                ckpt.alias("u")
                .join(labels.alias("l"), "doc_id")
                .where(F.col("u.component_id") != F.col("l.component_id"))
                .limit(1)
                .count()
            )
            if cached_labels is not None:
                _release_local_checkpoint(cached_labels)
            cached_labels = ckpt
            labels = ckpt
            if changed == 0:
                return _retire_and_return(labels)
        else:
            labels = updated
    # the final permitted round may have applied the LAST needed change:
    # run one extra verification round before declaring failure
    neighbor_min = _neighbor_min(labels)
    still_changing = (
        labels.join(neighbor_min, labels.doc_id == neighbor_min.src)
        .where(F.col("nbr_min") < F.col("component_id"))
        .limit(1)
        .count()
    )
    if still_changing == 0:
        return _retire_and_return(labels)
    # never return silently-partial labels: a component whose diameter
    # exceeds the round budget would get a wrong, split component_id
    _release_local_checkpoint(edges)
    if cached_labels is not None:
        _release_local_checkpoint(cached_labels)
    raise RuntimeError(
        f"connected components did not converge within {max_iterations} "
        "min-label rounds — raise max_iterations (graph diameter exceeds "
        "the budget)"
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    planes: int = 8,
    tables: int = 12,
    min_cosine: float = 0.95,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Embedding near-duplicates via MULTI-TABLE random-hyperplane LSH
    with exact in-bucket cosine verification.

    Per-pair recall at cosine c is 1 - (1 - p^planes)^tables with
    p = 1 - arccos(c)/pi: the defaults (8 planes x 12 tables) give
    ~0.999 at c = 0.95 while a random pair lands in a shared bucket in
    ~4.6% of tables — a single 16-plane table (the previous shape) had
    only ~18% recall at 0.95. More planes = cheaper verify, lower
    recall; more tables buy it back linearly in index size.

    The 96 hyperplane projections run as ONE Arrow-batched matmul per
    batch (pandas UDF -> BLAS) — the scale shape for dense projections;
    per-element JVM lambdas would be interpreted per plane. Candidates
    shuffle only (table, bucket, id) tuples; verification is pair-local.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _make_bucket_udf(dim_hint: int):
        import numpy as np
        Wm = np.random.default_rng(seed).standard_normal(
            (tables * planes, dim_hint)
        )
        pow2 = 2 ** np.arange(planes, dtype=np.int64)

        @pandas_udf("array<long>", "scalar")
        def buckets(vecs):
            X = np.vstack(vecs.to_numpy()).astype(np.float64)
            S = (X @ Wm[:, : X.shape[1]].T) >= 0.0  # (n, tables*planes)
            codes = S.reshape(len(X), tables, planes) @ pow2  # (n, tables)
            return pd.Series(list(codes))

        return buckets

    if dim is None:
        # probe the dimension with one bounded job; an empty or
        # NULL-first corpus must fail with a clear message, not a
        # NoneType subscript (pass dim= explicitly to skip the probe)
        first = (
            df.where(F.col(vec_col).isNotNull())
            .select(F.size(F.col(vec_col)).alias("d"))
            .first()
        )
        if first is None:
            raise ValueError(
                "embedding_near_dup_pairs: no non-null embeddings to "
                "probe the dimension from — pass dim= explicitly or "
                "provide a non-empty corpus"
            )
        dim = int(first["d"])
    bucket_udf = _make_bucket_udf(dim)
    base = (
        df.select(
            F.col(id_col),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
        )
        .withColumn(
            "_norm",
            F.sqrt(F.aggregate(F.col("_v"), F.lit(0.0), lambda a, x: a + x * x)),
        )
        .withColumn("_codes", bucket_udf(F.col("_v")))
    )
    blocked = base.select(
        id_col, "_v", "_norm", F.posexplode("_codes").alias("tbl", "code")
    ).persist()  # both self-join sides read the bucket table once
    a, b = blocked.alias("a"), blocked.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a._v"), F.col("b._v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # an all-zero embedding (norm 0) always collides with its kind in
    # every table; NULL cosine instead of an ANSI DIVIDE_BY_ZERO abort —
    # the min_cosine filter then drops the degenerate pairs
    nprod = F.col("a._norm") * F.col("b._norm")
    cos = F.when(nprod > 0, dot / nprod)
    return (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.code") == F.col("b.code"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cos.alias("cosine"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .where(F.col("cosine") >= min_cosine)
    )


def near_dup_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.3,
    shingle_k: int = 3,
    cleanup: list | None = None,
) -> DataFrame:
    """End-to-end near-duplicate clustering — the production dedup
    deliverable with LINEAR output size (one (doc_id, cluster_id) row
    per document, cluster_id = min doc id in the cluster).

    Pipeline shape for a duplicate-heavy crawl corpus:
      1. exact collapse: group identical content by hash, elect the
         min-id representative — the quadratic pair blowup of exact
         copies (k copies -> k(k-1)/2 pairs) never happens;
      2. MinHash-LSH + exact-Jaccard verify over REPRESENTATIVES only;
      3. min-label connected components over the verified pair graph;
      4. broadcast the rep -> cluster map back onto all documents.
    Shuffle volume: content hashes (step 1), band tuples (step 2),
    component labels (step 3) — never document pair products.

    Recall contract: the LSH banding is derived from ``threshold``
    (derive_lsh_banding, candidate recall >= 0.95 at the threshold), so
    clusters are complete down to the stated Jaccard level; lowering the
    threshold buys that completeness with more candidate pairs.
    """
    with_rep = _rep_election(df, text_col, id_col)
    if cleanup is not None:
        cleanup.append(with_rep)
    rep_map = with_rep.select(id_col, F.col("_rep").alias("rep_id"))
    reps = with_rep.where(F.col(id_col) == F.col("_rep")).drop("_rep")
    pairs = minhash_verified_pairs(
        reps, text_col, id_col, shingle_k=shingle_k, threshold=threshold,
        collapse_exact=False,  # reps are already content-unique
        cleanup=cleanup,
    )
    comp = dedup_components(
        pairs.select(
            F.col("d1").alias("id_a"), F.col("d2").alias("id_b")
        ),
        cleanup=cleanup,
    )
    return (
        rep_map.join(
            comp.withColumnRenamed("doc_id", "_rep"),
            rep_map.rep_id == F.col("_rep"),
            "left",
        )
        .select(
            id_col,
            F.coalesce(F.col("component_id"), F.col("rep_id")).alias(
                "cluster_id"
            ),
        )
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    threshold: float = 0.8,
    max_df: int = 64,
    collapse_exact: bool = True,
) -> DataFrame:
    """Asymmetric near-duplicate detection by shingle CONTAINMENT
    (RefinedWeb-style): for each candidate pair, c1 = |A∩B| / |A| and
    c2 = |A∩B| / |B| over distinct ``shingle_k``-word shingles; pairs
    with max(c1, c2) >= threshold survive. Containment catches the
    quote-expansion / subset case Jaccard misses — a short doc fully
    embedded in a long one has J ≈ |A|/|B| (small) but c1 = 1.0.

    Candidates are pairs sharing at least one RARE shingle
    (document frequency 2..max_df): the df cap bounds every inverted-
    index bucket, so candidate volume is linear in corpus size.
    Ubiquitous shingles are pruned from candidacy only — the verify
    step recomputes the intersection over ALL shingles pair-locally,
    so surviving pairs carry exact containments. A pair sharing ONLY
    df > max_df shingles is missed by construction; that happens when
    every shared shingle also occurs in > max_df other documents,
    i.e. the overlap is itself boilerplate.

    ``collapse_exact`` (default on) collapses byte-identical documents
    to one representative before the expensive stages, exactly like
    minhash_verified_pairs — with one containment-specific twist that
    keeps the fast path OUTPUT-INVISIBLE: shingle document frequency is
    counted over ORIGINAL documents (each representative contributes
    its exact-duplicate group size), because the df candidacy cap is
    defined against the uncollapsed corpus. A shingle carried by a
    1000-copy crawl page is boilerplate (df >= 1000) whether or not the
    copies were collapsed first; an unweighted count would resurrect it
    as "rare". Representative pairs then expand back to member pairs,
    and within-group pairs are emitted only for groups that still own
    at least one indexable shingle (the naive pipeline's candidacy
    condition for exact copies).

    Returns (d1, d2, inter, n1, n2, c1, c2) with d1 < d2.
    """
    if collapse_exact:
        eligible = df.select(F.col(id_col), F.col(text_col)).where(
            F.size(F.split(F.col(text_col), " ")) >= shingle_k
        )
        with_rep = _rep_election(eligible, text_col, id_col)
        members = with_rep.select(F.col("_rep"), F.col(id_col).alias("_m"))
        base = with_rep.where(F.col(id_col) == F.col("_rep")).select(
            id_col, text_col
        )
        weights = members.groupBy("_rep").agg(F.count("*").alias("_w"))
    else:
        base, members, weights = df, None, None

    # the shingle table feeds the index build AND both sides of the
    # verify join AND (collapsed path) the within-group sizes —
    # materialize once, tokenize once
    sh_df = _shingle_df(base, text_col, id_col, shingle_k).persist()
    tok = sh_df.select(F.col(id_col).alias("d"), F.explode("sh").alias("s"))
    if weights is not None:
        dfreq = (
            tok.join(weights.select(F.col("_rep").alias("d"), "_w"), "d")
            .groupBy("s")
            .agg(F.sum("_w").alias("_df"))
        )
    else:
        dfreq = tok.groupBy("s").agg(F.count("*").alias("_df"))
    # candidate index: shingles carried by 2..max_df ORIGINAL documents.
    # The cap bounds every index bucket, so the self-join below emits at
    # most max_df^2/2 pairs per shingle — linear in corpus size, never
    # quadratic in it.
    idx = dfreq.where(
        (F.col("_df") >= 2) & (F.col("_df") <= int(max_df))
    ).select("s")
    itok = tok.join(idx, "s").persist()
    a = itok.select(F.col("s"), F.col("d").alias("d1"))
    b = itok.select(F.col("s"), F.col("d").alias("d2"))
    cands = (
        a.join(b, "s")
        .where(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
    )
    # exact verify, pair-local: true intersection over ALL shingles
    # (the df cap prunes candidates only, never the measure)
    sa = sh_df.select(F.col(id_col).alias("d1"), F.col("sh").alias("sh_a"))
    sb = sh_df.select(F.col(id_col).alias("d2"), F.col("sh").alias("sh_b"))
    ic = F.size(F.array_intersect("sh_a", "sh_b"))
    pairs = (
        cands.join(sa, "d1")
        .join(sb, "d2")
        .select(
            "d1",
            "d2",
            ic.cast("long").alias("inter"),
            F.size("sh_a").cast("long").alias("n1"),
            F.size("sh_b").cast("long").alias("n2"),
        )
        .withColumn(
            "c1", F.round(F.col("inter") / F.col("n1").cast("double"), 6)
        )
        .withColumn(
            "c2", F.round(F.col("inter") / F.col("n2").cast("double"), 6)
        )
        .where(
            F.greatest("c1", "c2") >= F.lit(float(threshold)).cast("double")
        )
    )
    if not collapse_exact:
        return pairs

    # cross-group expansion: relabel by (least, greatest) member ids;
    # the directional containments follow the swap
    m1 = members.select(F.col("_rep").alias("d1"), F.col("_m").alias("m1"))
    m2 = members.select(F.col("_rep").alias("d2"), F.col("_m").alias("m2"))
    swapped = F.col("m1") > F.col("m2")
    cross = (
        pairs.join(m1, "d1")
        .join(m2, "d2")
        .select(
            F.least("m1", "m2").alias("d1"),
            F.greatest("m1", "m2").alias("d2"),
            "inter",
            F.when(swapped, F.col("n2")).otherwise(F.col("n1")).alias("n1"),
            F.when(swapped, F.col("n1")).otherwise(F.col("n2")).alias("n2"),
            F.when(swapped, F.col("c2")).otherwise(F.col("c1")).alias("c1"),
            F.when(swapped, F.col("c1")).otherwise(F.col("c2")).alias("c2"),
        )
    )
    # within-group: exact copies — containment (1.0, 1.0), inter = n —
    # but ONLY for groups with at least one indexable shingle: in the
    # naive pipeline two exact copies are candidates iff some shingle
    # of their shared content has df <= max_df (df >= group size always
    # holds, so a > max_df-copy group can never pair even with itself)
    idx_reps = itok.select(F.col("d").alias("_rep")).distinct()
    nsh = sh_df.select(
        F.col(id_col).alias("_rep"), F.size("sh").cast("long").alias("_n")
    )
    x, y = members.alias("x"), members.alias("y")
    within = (
        x.join(
            y,
            (F.col("x._rep") == F.col("y._rep"))
            & (F.col("x._m") < F.col("y._m")),
        )
        .select(F.col("x._rep").alias("_rep"),
                F.col("x._m").alias("d1"), F.col("y._m").alias("d2"))
        .join(idx_reps, "_rep")
        .join(nsh, "_rep")
        .select(
            "d1",
            "d2",
            F.col("_n").alias("inter"),
            F.col("_n").alias("n1"),
            F.col("_n").alias("n2"),
            F.lit(1.0).alias("c1"),
            F.lit(1.0).alias("c2"),
        )
    )
    return cross.unionByName(within)
