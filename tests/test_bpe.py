"""Real BPE: training determinism, textbook merge behavior, the
rank-order-equals-lowest-rank equivalence, and the Spark path."""

import sys
from os.path import abspath, dirname

import numpy as np

sys.path.insert(0, dirname(dirname(abspath(__file__))))

from pyhctsa_spark.operators.bpe import (  # noqa: E402
    bpe_token_count,
    bpe_tokenize,
    load_merges,
    train_bpe_merges,
)


def test_train_textbook_example():
    # Sennrich et al.'s canonical toy corpus shape: frequent pair merges
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_bpe_merges(counts, 10)
    assert merges[0] == ("e", "s")  # es appears 9 times (newest+widest)
    assert ("es", "t") in merges[:2]
    # after enough merges the frequent whole words become single tokens
    assert bpe_tokenize("newest", merges)[-1].endswith("est")


def test_train_deterministic_and_tie_break():
    counts = {"ab": 2, "cd": 2}
    m1 = train_bpe_merges(counts, 4)
    m2 = train_bpe_merges(counts, 4)
    assert m1 == m2
    assert m1[0] == ("a", "b")  # lexicographic tie-break


def test_tokenize_applies_in_rank_order():
    merges = [("a", "b"), ("ab", "c")]
    assert bpe_tokenize("abc", merges) == ["abc"]
    assert bpe_tokenize("abab", merges) == ["ab", "ab"]
    # leftmost-nonoverlapping within a merge round
    assert bpe_tokenize("aaa", [("a", "a")]) == ["aa", "a"]
    assert bpe_tokenize("aaaa", [("a", "a")]) == ["aa", "aa"]


def test_rank_order_equals_lowest_rank_present():
    """Exactness argument check: rank-order application matches the
    iterative lowest-rank-present algorithm on random words."""
    rng = np.random.default_rng(3)
    alphabet = "abcd"
    corpus = {
        "".join(rng.choice(list(alphabet), size=rng.integers(2, 9))): int(c)
        for c in rng.integers(1, 20, size=40)
    }
    merges = train_bpe_merges(corpus, 20)
    ranks = {m: i for i, m in enumerate(merges)}

    def lowest_rank_tokenize(word):
        toks = list(word)
        while len(toks) > 1:
            pairs = [(ranks.get((toks[i], toks[i + 1]), 1 << 30), i)
                     for i in range(len(toks) - 1)]
            best_rank, _ = min(pairs)
            if best_rank >= 1 << 30:
                break
            a, b = merges[best_rank]
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out
        return toks

    for _ in range(200):
        w = "".join(rng.choice(list(alphabet), size=rng.integers(1, 12)))
        assert bpe_tokenize(w, merges) == lowest_rank_tokenize(w), w


def test_committed_merges_regenerate():
    import subprocess

    r = subprocess.run(
        [sys.executable, "scripts/gen_bpe_merges.py", "--check"],
        capture_output=True, text=True, cwd=dirname(dirname(abspath(__file__))),
    )
    assert r.returncode == 0, r.stdout + r.stderr


def test_spark_count_matches_local(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {
        r.doc_id: r.n_bpe_tokens_real
        for r in bpe_token_count(docs).collect()
    }
    merges = load_merges()
    local = docs.select("doc_id", "text").toPandas()
    for _, row in local.head(40).iterrows():
        want = sum(
            len(bpe_tokenize(w, merges))
            for w in row.text.split(" ") if w
        )
        assert got[row.doc_id] == want, row.doc_id


# --- hypothesis property fuzz ------------------------------------------------
from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=60, deadline=None)
@given(
    word=st.text(alphabet="abcde", min_size=1, max_size=16),
    seed=st.integers(0, 2**31 - 1),
)
def test_hyp_tokenize_concat_invariant(word, seed):
    """Tokens always concatenate back to the word, for merges trained on
    random corpora."""
    rng = np.random.default_rng(seed)
    corpus = {
        "".join(rng.choice(list("abcde"), size=int(rng.integers(1, 10)))): int(c)
        for c in rng.integers(1, 30, size=25)
    }
    merges = train_bpe_merges(corpus, 15)
    toks = bpe_tokenize(word, merges)
    assert "".join(toks) == word
    assert all(toks)  # no empty tokens
