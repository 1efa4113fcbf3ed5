"""Real byte-pair-encoding tokenization for token-budget accounting.

Classic BPE (Sennrich et al. 2016, public algorithm): train merges on a
word-frequency table, then tokenize by applying merges in rank order.
Rank-order application is exact for pair BPE: a merge's pair can only
exist after its component tokens do, so every pair's rank exceeds its
components' creation ranks and no revisiting is needed.

Spark-first shape for 100 TB corpora: tokenize each DISTINCT word once
(explode -> distinct-word table -> Arrow-batched UDF over the VOCABULARY,
not the corpus), then a broadcast join maps per-occurrence rows to token
counts — the Python-side work is O(|vocab|), never O(corpus).

The committed merges table (resources/bpe_merges.json) is trained
offline by scripts/gen_bpe_merges.py on the sf0.01 document corpus; the
driver oracle replays merge application as a DuckDB recursive CTE over
a delimiter-wrapped token string, so the engine count is value-checked
end-to-end.
"""

import json
import os
from collections import Counter
from typing import Optional

from pyspark.sql import DataFrame, functions as F

MERGES_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "resources", "bpe_merges.json",
)


def train_bpe_merges(
    word_counts: dict[str, int], num_merges: int = 100
) -> list[tuple[str, str]]:
    """Learn BPE merges from a word-frequency dict.

    Deterministic: the most frequent adjacent pair wins each round, ties
    broken by lexicographic pair order. Stops early when no pair occurs
    at least twice.
    """
    vocab = {tuple(w): c for w, c in word_counts.items() if w}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for toks, c in vocab.items():
            for i in range(len(toks) - 1):
                pairs[(toks[i], toks[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        a, b = best[0]
        merges.append((a, b))
        merged = a + b
        new_vocab = {}
        for toks, c in vocab.items():
            out = []
            i = 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def bpe_tokenize(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply merges in rank order (exact, see module docstring)."""
    toks = list(word)
    for a, b in merges:
        if len(toks) < 2:
            break
        out = []
        i = 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


def load_merges(path: Optional[str] = None) -> list[tuple[str, str]]:
    if path is not None:
        with open(path) as f:
            return [tuple(m) for m in json.load(f)["merges"]]
    # importlib.resources (not open(MERGES_PATH)): a --py-files
    # deployment imports the package FROM THE ZIP, where a filesystem
    # path into the package directory does not exist
    from importlib import resources

    raw = (
        resources.files("pyhctsa_spark.resources")
        .joinpath("bpe_merges.json")
        .read_text()
    )
    return [tuple(m) for m in json.loads(raw)["merges"]]


def bpe_token_count(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    merges: Optional[list[tuple[str, str]]] = None,
) -> DataFrame:
    """Per-document REAL BPE token count under the committed merges.

    Plan shape: explode words -> aggregate per-(doc, word) occurrence
    counts -> tokenize only the DISTINCT word vocabulary in an
    Arrow-batched UDF -> broadcast the (word, n_tok) map back -> sum.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    merges = merges if merges is not None else load_merges()

    @pandas_udf("long")
    def word_tok_len(words: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}

        def n(w: str) -> int:
            if w not in cache:
                cache[w] = len(bpe_tokenize(w, merges))
            return cache[w]

        return words.map(n)

    occ = (
        df.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("_w"))
        .where(F.col("_w") != "")
        .groupBy(id_col, "_w")
        .agg(F.count("*").alias("_c"))
    )
    # occ feeds BOTH the vocabulary build and the join probe side —
    # materialize so the corpus is scanned and word-exploded exactly
    # once. localCheckpoint (not persist): the returned DataFrame keeps
    # a live dependency on occ, so a persist here could never be
    # unpersisted and would leak one cached table per invocation;
    # checkpoint blocks are owned by the executors and reclaimed with
    # the lineage, no caller-side contract needed.
    occ = occ.localCheckpoint(eager=True)
    vocab = occ.select("_w").distinct().withColumn("_n", word_tok_len("_w"))
    return (
        occ.join(F.broadcast(vocab), "_w")
        .groupBy(id_col)
        .agg(F.sum(F.col("_c") * F.col("_n")).alias("n_bpe_tokens_real"))
    )
