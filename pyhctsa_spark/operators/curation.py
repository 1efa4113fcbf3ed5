"""Corpus-curation operators for training-data pipelines: sequence
packing, deterministic weighted source mixing, PII redaction,
deterministic global shuffle, passage-level dedup statistics,
hash-range dataset splits, and exact-substring span dedup.

All are deterministic — every random-looking decision (sampling,
shuffle order, shard assignment) is derived from md5 of the row key, so
the same input always produces the same output on any cluster size and
both the engine and the DuckDB oracle compute identical answers. All
except ``exact_substring_dedup`` are pure JVM expressions (no Python in
the scan path); the span-dedup text cut is one Arrow-batched
``mapInArrow`` pass (never per-row Python).

Scale notes (the 100 TB contract of each op):
- ``pack_sequences``: the only stateful step is a running-sum window
  partitioned by (source, shard). A window partition is processed by
  ONE task, so each (source, shard) stream is a unit of parallelism AND
  a straggler bound: size ``n_shards`` to the corpus (rows of the
  dominant source / n_shards ≈ what one task should sort — e.g. a 90%-
  one-source crawl at 10^10 docs wants n_shards in the thousands, not
  the default 4). The shuffle carries token COUNTS, never text.
- ``source_mix`` / ``pii_redact``: map-side only, zero shuffle; filters
  and projections reach the parquet scan.
- ``global_shuffle``: hash-derived shard + within-shard sort = one
  shuffle, never a single-ordering bottleneck (a global ORDER BY would
  range-partition fine too, but per-shard output files are what a
  training loader wants anyway).
- ``passage_dedup_stats``: explode fixed-width blocks -> hash-aggregate
  counts (map-side partial combine) -> join back. Same shape as exact
  dedup; nothing quadratic, nothing collected.
- ``exact_substring_dedup``: gram rows are O(total words); the
  first-occurrence rank and the per-doc regroup are the only shuffles,
  and the coverage-union text cut is one Arrow-batched pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_HEX = "0123456789abcdef"


def md5_u32(col: Column, salt: str) -> Column:
    """First 32 bits of md5(salt || col) as a BIGINT in [0, 2^32).

    Built nibble-by-nibble with instr() so the identical expression runs
    in DuckDB (which lacks conv(hex)) — the cross-engine uniform-hash
    primitive shared by source_mix and global_shuffle.
    """
    h = F.md5(F.concat(F.lit(salt), col.cast("string")))
    u = F.lit(0).cast("long")
    for i in range(8):
        nib = F.instr(F.lit(_HEX), F.substring(h, i + 1, 1)) - 1
        u = u + nib.cast("long") * F.lit(16 ** (7 - i)).cast("long")
    return u


def pack_sequences(
    df: DataFrame,
    seq_len: int = 64,
    n_shards: int = 4,
    text_col: str = "text",
    doc_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Pack variable-length documents into fixed ``seq_len``-token
    training sequences by deterministic concat-and-chunk (the GPT-style
    packing a pretraining loader consumes).

    Documents are laid end-to-end in ``doc_col`` order within a
    (source, shard) stream; each document contributes one output row
    per training sequence it overlaps:

      (source, shard, seq_id, doc_id, offset_in_seq, tok_start, tok_len)

    where tok_start/tok_len address the slice of the document's tokens
    and offset_in_seq is where that slice lands inside sequence seq_id.
    A reader can reassemble every sequence exactly from these spans; the
    last sequence of each shard is the only one allowed to be partial.

    Tokens are whitespace words of ``text_col`` (swap in a real
    tokenizer's count column upstream for byte-exact budgets).
    """
    n_tok = F.size(F.split(F.col(text_col), " "))
    shard = (md5_u32(F.col(doc_col), "pack:") % n_shards).alias("shard")
    base = df.select(
        F.col(source_col).alias("source"),
        shard,
        F.col(doc_col).alias("doc_id"),
        n_tok.alias("n_tok"),
    )
    w = (
        Window.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = base.select(
        "source",
        "shard",
        "doc_id",
        "n_tok",
        F.coalesce(F.sum("n_tok").over(w), F.lit(0)).alias("start"),
    )
    # integer DIV, not floor(double /): token offsets at 100 TB exceed
    # double's 2^53 exact-integer range long before they overflow a long
    spans = placed.select(
        "source",
        "shard",
        "doc_id",
        "n_tok",
        "start",
        F.explode(
            F.sequence(
                F.expr(f"start DIV {seq_len}"),
                F.expr(f"(start + n_tok - 1) DIV {seq_len}"),
            )
        ).alias("seq_id"),
    )
    L = F.lit(seq_len).cast("long")
    seq_lo = F.col("seq_id") * L
    seg_lo = F.greatest(F.col("start"), seq_lo)
    seg_hi = F.least(F.col("start") + F.col("n_tok"), seq_lo + L)
    return spans.select(
        "source",
        "shard",
        "seq_id",
        "doc_id",
        (seg_lo - seq_lo).cast("long").alias("offset_in_seq"),
        (seg_lo - F.col("start")).cast("long").alias("tok_start"),
        (seg_hi - seg_lo).cast("long").alias("tok_len"),
    )


def temperature_mix(
    df: DataFrame,
    tau: float = 0.5,
    doc_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Temperature-based source rebalancing (the multilingual /
    UniMax-style mixing rule): source s is downsampled at rate
    (n_min / n_s)^(1-tau), so the smallest source keeps everything and
    large sources flatten toward it — tau=1 keeps natural proportions,
    tau=0 equalizes expected counts. The keep decision is the same
    md5-uniform as source_mix (reproducible row-for-row, map-side);
    the per-source rates come from one tiny count aggregate broadcast
    back onto the scan.

    tau=0.5 routes through sqrt — IEEE-correctly-rounded in every
    engine, which is what makes the doc_temperature_mix value oracle
    bit-stable (general tau uses pow; see the libm note in
    functions/hll_state.py before oracling other taus).

    Returns the surviving rows plus their source's ``rate``."""
    counts = df.groupBy(source_col).agg(F.count("*").alias("_n"))
    nmin = counts.agg(F.min("_n").alias("_nmin"))
    ratio = F.col("_nmin").cast("double") / F.col("_n").cast("double")
    if tau == 0.5:
        rate = F.sqrt(ratio)
    else:
        rate = F.pow(ratio, F.lit(1.0 - float(tau)))
    rates = counts.crossJoin(F.broadcast(nmin)).select(
        source_col, rate.alias("rate")
    )
    u = md5_u32(F.col(doc_col), "tmix:") / F.lit(4294967296.0)
    return (
        df.join(F.broadcast(rates), source_col)
        .where(u < F.col("rate"))
    )


def source_mix(
    df: DataFrame,
    weight: Column | dict[str, float],
    doc_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Deterministic weighted source mixing: keep each row with
    probability ``weight`` (its source's sampling rate), decided by a
    content hash instead of an RNG, so the sample is reproducible
    row-for-row across runs, retries, and cluster sizes.

    ``weight`` is either a Column expression in [0, 1] or a
    {source: rate} dict (turned into a CASE; unlisted sources keep 0).
    Map-side only — the filter is a pure projection over the scan.
    """
    if isinstance(weight, dict):
        expr = F.lit(0.0)
        for src, rate in weight.items():
            expr = F.when(F.col(source_col) == src, F.lit(float(rate))).otherwise(expr)
        weight = expr
    u = md5_u32(F.col(doc_col), "mix:") / F.lit(4294967296.0)
    return df.where(u < weight)


# PII patterns: character classes + bounded quantifiers only, so the
# Java regex engine (Spark) and RE2 (DuckDB) match identically. IPs are
# matched before phones so the dotted digit groups are gone by the time
# the looser phone pattern runs.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
IP_RE = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
PHONE_RE = "[0-9]{3}-[0-9]{4,5}"


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub emails, IPv4 addresses, and phone-shaped numbers from
    ``text_col``, replacing them with typed placeholder tokens, and
    count what was removed (the counts feed a filter-or-quarantine
    decision downstream). Pure regexp expressions — map-side, pushdown
    friendly, no Python."""
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0))
    t1 = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    n_ips = F.size(F.regexp_extract_all(t1, F.lit(IP_RE), 0))
    t2 = F.regexp_replace(t1, IP_RE, "<IP>")
    n_phones = F.size(F.regexp_extract_all(t2, F.lit(PHONE_RE), 0))
    t3 = F.regexp_replace(t2, PHONE_RE, "<PHONE>")
    return df.withColumns(
        {
            "redacted": t3,
            "n_emails": n_emails.cast("long"),
            "n_ips": n_ips.cast("long"),
            "n_phones": n_phones.cast("long"),
        }
    )


def global_shuffle(
    df: DataFrame, n_shards: int = 8, doc_col: str = "doc_id"
) -> DataFrame:
    """Deterministic global shuffle for training-example order: every
    row gets a (shard, pos) address derived from md5(doc_id) — shard by
    hash range, position by hash order within the shard. Reading shards
    0..n-1 sequentially yields a fixed pseudo-random permutation of the
    corpus with exactly ONE shuffle and no global sort barrier."""
    h = F.md5(F.concat(F.lit("shuf:"), F.col(doc_col).cast("string")))
    shard = (md5_u32(F.col(doc_col), "shuf:") % n_shards).alias("shard")
    keyed = df.select(F.col(doc_col).alias("doc_id"), shard, h.alias("h"))
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return keyed.select(
        "doc_id", "shard", (F.row_number().over(w)).cast("long").alias("pos")
    )


def split_thresholds(
    weights: tuple[tuple[str, float], ...]
) -> list[tuple[str, int]]:
    """Cumulative md5_u32 thresholds for ``dataset_split``: each split
    owns the hash range [prev, floor(cum * 2^32)). Computed ONCE in
    Python and compared as exact integers, so the engine and the DuckDB
    oracle can never disagree on a float-boundary document.

    Weights must sum to 1 (float tolerance): the last split absorbs
    only ROUNDING, never a missing or excess share — a typo'd 0.9-sum
    spec would otherwise silently hand the gap to the final split."""
    total = sum(float(w) for _n, w in weights)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total!r}")
    out: list[tuple[str, int]] = []
    cum = 0.0
    for name, w in weights:
        cum += float(w)
        out.append((name, min(int(cum * 4294967296.0), 4294967296)))
    out[-1] = (out[-1][0], 4294967296)  # last split absorbs rounding
    return out


def dataset_split(
    df: DataFrame,
    weights: tuple[tuple[str, float], ...] = (
        ("train", 0.9),
        ("val", 0.05),
        ("test", 0.05),
    ),
    salt: str = "split:",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row's split is
    decided by which cumulative-weight bucket its md5(salt || doc_id)
    hash lands in. Reproducible across runs, retries, cluster sizes,
    and INSERTIONS — adding documents later never reassigns an existing
    one (the property a random shuffle-then-slice split lacks, and the
    reason eval-set contamination audits want hash splits). Map-side
    only: a pure projection, no shuffle.
    """
    u = md5_u32(F.col(doc_col), salt)
    ths = split_thresholds(weights)
    # fold from the last bucket down: each earlier threshold test wraps
    # the previous expression, so the FIRST matching range wins
    expr = F.lit(ths[-1][0])
    for name, th in reversed(ths[:-1]):
        expr = F.when(u < F.lit(th).cast("long"), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def corpus_sample(
    df: DataFrame,
    k: int,
    by: str = "source",
    weight_col: str | None = None,
    salt: str = "sample:",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Deterministic uniform / weighted sampling without replacement:
    exactly ``k`` rows per ``by`` group (fewer if the group is smaller).

    Unweighted: keep the k smallest md5(salt || doc_id) hashes per
    group — a uniform k-subset that is reproducible across runs,
    retries, and cluster sizes (the distributed analogue of
    rng.choice(group, k, replace=False)).

    Weighted (Efraimidis–Spirakis A-ES via exponential clocks): each
    row draws u = (md5_u32 + 0.5) / 2^32 and is ranked by
    key = -ln(u) / w ascending — equivalent to the classic top-k by
    u^(1/w), and P(inclusion) is exactly the successive
    weighted-without-replacement draw probability. Rows with w <= 0 or
    NULL are never sampled (their clock never fires). Ranking compares
    round(key, 12) with a doc_id tie-break so the engine and the DuckDB
    oracle can never disagree on a libm-ULP boundary.

    Scale: the only shuffle is the per-group window, and the
    ``rn <= k`` filter is recognized by Spark's InferWindowGroupLimit
    rule — each map task ships only its LOCAL top-k per group
    (WindowGroupLimit(Partial) before the exchange, Final after), so
    the shuffle volume is O(groups x k x tasks), not O(rows), no matter
    how big the corpus is. ``tests/test_curation.py`` pins the
    WindowGroupLimit plan shape.
    """
    u = md5_u32(F.col(doc_col), salt).alias("sample_u32")
    cols = [F.col(doc_col).alias("doc_id"), F.col(by).alias(by), u]
    if weight_col is None:
        keyed = df.select(*cols)
        order = [F.col("sample_u32").asc(), F.col("doc_id").asc()]
    else:
        uu = (F.col("sample_u32").cast("double") + F.lit(0.5).cast("double")) / F.lit(
            4294967296.0
        ).cast("double")
        keyed = (
            df.where(F.col(weight_col).cast("double") > 0)
            .select(*cols, F.col(weight_col).cast("double").alias("_w"))
            .withColumn("sample_key", -F.log(uu) / F.col("_w"))
            .drop("_w")
        )
        order = [F.round("sample_key", 12).asc(), F.col("doc_id").asc()]
    w = Window.partitionBy(by).orderBy(*order)
    out = (
        keyed.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= k)
    )
    if weight_col is not None:
        out = out.withColumn("sample_key", F.round("sample_key", 6))
    return out


def passage_dedup_stats(
    df: DataFrame,
    block_words: int = 8,
    text_col: str = "text",
    doc_col: str = "doc_id",
    max_dup_frac: float = 0.5,
) -> DataFrame:
    """Passage-level duplication profile (the line-dedup stage of
    CCNet/RefinedWeb-style curation, over fixed ``block_words``-word
    blocks since the synthetic corpus has no line structure): for each
    document, the fraction of its complete word blocks whose text occurs
    more than once in the corpus (any doc, including itself), and a keep
    flag at ``max_dup_frac``.

    Drives from the full document set with LEFT joins so short docs
    (no complete block) are kept with NULL stats rather than silently
    dropped — the composite-filter trap from round 3.
    """
    ws = F.split(F.col(text_col), " ")
    nb = F.floor(F.size(ws) / block_words).cast("int")
    docs = df.select(F.col(doc_col).alias("doc_id"), ws.alias("ws"), nb.alias("nb"))
    blocks = (
        docs.where(F.col("nb") >= 1)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.col("nb") - 1),
                    lambda b: F.concat_ws(
                        " ", F.slice("ws", b * block_words + 1, block_words)
                    ),
                )
            ).alias("blk"),
        )
    )
    blocks = blocks.persist()
    freq = blocks.groupBy("blk").agg(F.count("*").alias("occ"))
    per_doc = (
        blocks.join(freq, "blk")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_blocks"),
            F.sum(F.when(F.col("occ") >= 2, 1).otherwise(0)).alias("n_dup_blocks"),
        )
    )
    out = (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_blocks", F.lit(0)).cast("long").alias("n_blocks"),
            F.coalesce("n_dup_blocks", F.lit(0)).cast("long").alias("n_dup_blocks"),
            F.round(
                F.when(
                    F.col("n_blocks") > 0,
                    F.col("n_dup_blocks") / F.col("n_blocks"),
                ),
                6,
            ).alias("dup_frac"),
        )
        .withColumn(
            "keep",
            F.coalesce(F.col("dup_frac") <= F.lit(float(max_dup_frac)), F.lit(True)),
        )
    )
    return out


def exact_substring_dedup(
    df: DataFrame,
    span_words: int = 8,
    text_col: str = "text",
    doc_col: str = "doc_id",
    collapse_exact: bool = True,
) -> DataFrame:
    """Exact-substring span dedup at word granularity (the
    remove-duplicated-spans stage of Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", re-expressed as
    rolling-window grams instead of a suffix array): every
    ``span_words``-word window whose text occurs anywhere else in the
    corpus is removed from all but its globally-first occurrence
    (first by ``(doc_id, pos)`` per gram), overlapping duplicate spans
    merge by coverage union, and the surviving words are re-joined.

    Returns one row per input document:
    ``doc_id, n_words, tokens_removed, dup_frac, clean_text``.
    A document shorter than ``span_words`` words is passed through
    unchanged; a NULL text yields NULL stats (kept, never dropped).

    Scale shape: the gram table is O(total words) rows of
    ``(doc_id, pos, md5)`` — the standard linear cost of exact-substring
    dedup. Two shuffles: the per-gram first-occurrence rank (hash key:
    uniform by construction, no skew) and the per-doc regroup of
    duplicate positions. The text-cut step is one Arrow-batched pass
    (coverage union via a numpy difference array), never per-row Python
    in a scan.

    ``collapse_exact`` (default on) is the crawl-multiplicity fast
    path, OUTPUT-INVISIBLE by construction: grams are built and ranked
    over one representative per byte-identical content group only.
    That is exact because (a) identical texts carry identical grams at
    identical positions, so the globally-first occurrence of any gram
    always lies in a representative (each group's min id), meaning the
    rep-only ranking marks exactly what the naive ranking marks; and
    (b) every eligible non-representative copy trails its
    representative at every position, so it is fully covered — emitted
    closed-form as (n_words, n_words, 1.0, ''). Byte-identical copies
    therefore never multiply the gram table (the same pre-collapse
    that carries MinHash at 10x, BENCH.md).
    """
    import numpy as np
    import pyarrow as pa
    from pyspark.sql import types as T

    L = int(span_words)
    if L < 2:
        raise ValueError(f"span_words must be >= 2, got {span_words}")
    base = df.select(
        F.col(doc_col).alias("doc_id"), F.col(text_col).alias("_text")
    )
    member_rows = None
    if collapse_exact:
        elig = base.where(F.size(F.split(F.col("_text"), " ")) >= L)
        grp = Window.partitionBy(F.md5(F.col("_text")))
        with_rep = elig.withColumn(
            "_rep", F.min("doc_id").over(grp)
        ).persist()
        members = with_rep.where(F.col("doc_id") != F.col("_rep"))
        nw = F.size(F.split(F.col("_text"), " ")).cast("int")
        member_rows = members.select(
            "doc_id",
            nw.alias("n_words"),
            nw.alias("tokens_removed"),
            F.lit(1.0).alias("dup_frac"),
            F.lit("").alias("clean_text"),
        )
        rep_ids = with_rep.where(
            F.col("doc_id") == F.col("_rep")
        ).select("doc_id")
        gram_source = base.join(rep_ids, "doc_id")
        cut_input = base.join(
            members.select("doc_id"), "doc_id", "left_anti"
        )
    else:
        gram_source, cut_input = base, base
    words = gram_source.select(
        "doc_id", F.split(F.col("_text"), " ").alias("_w")
    )
    # docs shorter than L words have no L-grams — filter BEFORE the
    # transform (sequence(0, negative) descends; element_at then reads
    # index <= 0, an error under ANSI mode)
    eligible = words.where(F.size("_w") >= L)
    idx = F.sequence(F.lit(0), F.size("_w") - L)
    grams = eligible.select(
        "doc_id",
        F.posexplode(
            F.transform(
                idx,
                lambda p: F.md5(
                    F.concat_ws(
                        " ",
                        *[F.element_at(F.col("_w"), p + j + 1) for j in range(L)],
                    )
                ),
            )
        ).alias("pos", "h"),
    )
    rank_w = Window.partitionBy("h").orderBy("doc_id", "pos")
    marks = (
        grams.select("doc_id", "pos", F.row_number().over(rank_w).alias("rn"))
        .where(F.col("rn") > 1)
    )
    per_doc = marks.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("pos")).alias("_dup_pos")
    )
    joined = cut_input.join(per_doc, "doc_id", "left")

    # doc_id keeps the INPUT column's type (string corpora and int64
    # synthetic tables both pass through untouched)
    id_type = joined.schema["doc_id"].dataType
    id_pa = pa.from_numpy_dtype(np.int64) if isinstance(
        id_type, T.LongType
    ) else (
        pa.int32() if isinstance(id_type, T.IntegerType) else pa.string()
    )
    if not isinstance(id_type, (T.LongType, T.IntegerType, T.StringType)):
        raise TypeError(f"unsupported doc_id type {id_type}")
    out_schema = T.StructType(
        [
            T.StructField("doc_id", id_type),
            T.StructField("n_words", T.IntegerType()),
            T.StructField("tokens_removed", T.IntegerType()),
            T.StructField("clean_text", T.StringType()),
        ]
    )
    pa_schema = pa.schema(
        [
            ("doc_id", id_pa),
            ("n_words", pa.int32()),
            ("tokens_removed", pa.int32()),
            ("clean_text", pa.string()),
        ]
    )

    def cut(batches):
        for rb in batches:
            names = rb.schema.names
            ids = rb.column(names.index("doc_id"))
            texts = rb.column(names.index("_text")).to_pylist()
            poss = rb.column(names.index("_dup_pos")).to_pylist()
            nw: list = []
            rm: list = []
            clean: list = []
            for t, ps in zip(texts, poss):
                if t is None:
                    nw.append(None)
                    rm.append(None)
                    clean.append(None)
                    continue
                wl = np.array(t.split(" "), dtype=object)
                n = len(wl)
                nw.append(n)
                if not ps:
                    rm.append(0)
                    clean.append(" ".join(wl))
                    continue
                p = np.asarray(ps, dtype=np.int64)
                diff = np.zeros(n + 1, dtype=np.int64)
                np.add.at(diff, p, 1)
                np.add.at(diff, np.minimum(p + L, n), -1)
                cov = np.cumsum(diff[:n]) > 0
                rm.append(int(cov.sum()))
                clean.append(" ".join(wl[~cov]))
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(nw, pa.int32()),
                    pa.array(rm, pa.int32()),
                    pa.array(clean, pa.string()),
                ],
                schema=pa_schema,
            )

    cut_df = joined.mapInArrow(cut, out_schema)
    out = cut_df.select(
        "doc_id",
        "n_words",
        "tokens_removed",
        F.round(
            F.col("tokens_removed").cast("double") / F.col("n_words"), 6
        ).alias("dup_frac"),
        "clean_text",
    )
    if member_rows is not None:
        out = out.unionByName(member_rows)
    return out


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Snapshot diff between two corpus versions: per-document status
    ``added`` (only in new), ``removed`` (only in old), ``changed``
    (both, md5(text) differs), ``unchanged`` — the audit a pipeline
    runs before an incremental refresh (what will the index appends,
    dedup re-probes and cagg deltas actually see?).

    One full-outer equi-join on the id, comparing md5 fingerprints so
    text bytes never leave their scan tasks — at 100 TB this is two
    id-hashed shuffles of (id, 32-byte fp) rows, and bucketing both
    snapshots by id removes even those. Returns
    ``(doc_id, status, n_chars_old, n_chars_new)``.
    """
    o = old.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col)).alias("_fp_o"),
        F.length(text_col).cast("long").alias("n_chars_old"),
        F.lit(1).alias("_in_o"),
    )
    n = new.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col)).alias("_fp_n"),
        F.length(text_col).cast("long").alias("n_chars_new"),
        F.lit(1).alias("_in_n"),
    )
    # presence comes from the join side, not the fingerprint — a NULL
    # text (NULL md5) in a present row must not read as an absent row;
    # NULL<->value and NULL<->NULL text transitions compare null-safe
    status = (
        F.when(F.col("_in_o").isNull(), F.lit("added"))
        .when(F.col("_in_n").isNull(), F.lit("removed"))
        .when(~F.col("_fp_o").eqNullSafe(F.col("_fp_n")), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return o.join(n, "doc_id", "full_outer").select(
        "doc_id", status.alias("status"), "n_chars_old", "n_chars_new"
    )
