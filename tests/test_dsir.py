"""DSIR importance-resampling selection (operators/dsir.py): exact
scalar replay of the full pipeline (hashlib md5, math.log) vs the
engine, edge-case rows, top-fraction semantics, and plan shape."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from pyhctsa_spark.operators.dsir import (
    GUMBEL_SALT,
    HASH_SALT,
    U32,
    dsir_select,
    dsir_top_fraction,
)

# two "languages" with mostly-disjoint vocab so target alignment is
# visible; one NULL text and one single-word doc as edge rows
DOCS = [
    (1, "the cat sat on the mat", "en"),
    (2, "a dog ran in the park", "en"),
    (3, "the cat and the dog", "en"),
    (4, "le chat dort sur le tapis", "fr"),
    (5, "un chien court dans le parc", "fr"),
    (6, "le chat et le chien", "fr"),
    (7, "cat", "en"),
    (8, None, "en"),
    (9, "the dog sat in the mat park", "en"),
    (10, "chat chien tapis parc dort", "fr"),
]
N_BUCKETS = 64
ALPHA = 1.0
THRESHOLD = 0.0


def _md5_u32(key, salt: str) -> int:
    return int(
        hashlib.md5((salt + str(key)).encode()).hexdigest()[:8], 16
    )


def _scalar_dsir() -> dict[int, tuple[float | None, float | None, bool]]:
    """Independent scalar replay: bag of hashed unigrams+bigrams,
    add-alpha bucket model, gumbel threshold selection."""
    grams: dict[int, list[int]] = {}
    for doc_id, text, _lang in DOCS:
        if text is None:
            grams[doc_id] = []
            continue
        ws = text.split(" ")
        gs = list(ws) + [
            f"{ws[i]} {ws[i + 1]}" for i in range(len(ws) - 1)
        ]
        grams[doc_id] = [_md5_u32(g, HASH_SALT) % N_BUCKETS for g in gs]
    c_raw: dict[int, int] = {}
    c_tgt: dict[int, int] = {}
    for doc_id, _text, lang in DOCS:
        for b in grams[doc_id]:
            c_raw[b] = c_raw.get(b, 0) + 1
            if lang == "en":
                c_tgt[b] = c_tgt.get(b, 0) + 1
    r_tot = sum(c_raw.values())
    t_tot = sum(c_tgt.values())
    ab = ALPHA * N_BUCKETS
    lr = {
        b: math.log(c_tgt.get(b, 0) + ALPHA)
        - math.log(t_tot + ab)
        - math.log(c_raw[b] + ALPHA)
        + math.log(r_tot + ab)
        for b in c_raw
    }
    out: dict[int, tuple[float | None, float | None, bool]] = {}
    for doc_id, text, _lang in DOCS:
        if text is None:
            out[doc_id] = (None, None, False)
            continue
        logw = sum(lr[b] for b in grams[doc_id])
        u = (_md5_u32(doc_id, GUMBEL_SALT) + 0.5) / U32
        score = logw - math.log(-math.log(u))
        out[doc_id] = (logw, score, score >= THRESHOLD)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string"
    )


def test_dsir_matches_scalar_replay(spark, docs_df):
    got = {
        r["doc_id"]: r
        for r in dsir_select(
            docs_df,
            F.col("lang") == "en",
            threshold=THRESHOLD,
            n_buckets=N_BUCKETS,
            alpha=ALPHA,
        ).collect()
    }
    want = _scalar_dsir()
    assert set(got) == {d for d, _t, _l in DOCS}
    for doc_id, (logw, score, sel) in want.items():
        row = got[doc_id]
        if logw is None:
            assert row["logw6"] is None and row["gscore6"] is None
            assert row["selected"] is False
            continue
        assert row["logw6"] == pytest.approx(logw, abs=2e-6)
        assert row["gscore6"] == pytest.approx(score, abs=2e-6)
        # flag comparison only away from the threshold boundary
        if abs(score - THRESHOLD) > 1e-5:
            assert row["selected"] == sel, doc_id


def test_dsir_selection_prefers_target(spark, docs_df):
    """Target-language docs must outscore the disjoint-vocab rest."""
    rows = dsir_select(
        docs_df, F.col("lang") == "en", threshold=0.0, n_buckets=N_BUCKETS
    ).collect()
    lang = {d: lg for d, _t, lg in DOCS}
    en = [r["logw6"] for r in rows if lang[r["doc_id"]] == "en" and r["logw6"] is not None]
    fr = [r["logw6"] for r in rows if lang[r["doc_id"]] == "fr"]
    assert min(en) > max(fr)


def test_dsir_top_fraction_exact_count(spark, docs_df):
    out = dsir_top_fraction(
        docs_df, F.col("lang") == "en", fraction=0.5, n_buckets=N_BUCKETS
    ).collect()
    n_scoreable = sum(1 for _d, t, _l in DOCS if t is not None)
    want_k = math.ceil(0.5 * n_scoreable)
    assert sum(1 for r in out if r["selected"]) == want_k
    assert len(out) == len(DOCS)
    # selected set = top-k by (gscore6 desc, doc_id)
    scored = sorted(
        (r for r in out if r["gscore6"] is not None),
        key=lambda r: (-r["gscore6"], r["doc_id"]),
    )
    assert all(r["selected"] for r in scored[:want_k])
    assert not any(r["selected"] for r in scored[want_k:])


def test_dsir_top_fraction_validates(spark, docs_df):
    with pytest.raises(ValueError):
        dsir_top_fraction(docs_df, F.col("lang") == "en", fraction=0.0)


def test_dsir_plan_broadcasts_model(spark, docs_df):
    """The bucket-model join must be broadcast (the model is
    O(n_buckets)); no nested-loop/cartesian anywhere."""
    plan = (
        dsir_select(docs_df, F.col("lang") == "en", threshold=0.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
