"""Round-12 scale-safety guards: the simhash default flip to the wide
xxhash form, the unblocked embedding cross-join row cap, block-aware
exact-vector collapse, the opt-in exact-set collapse verification, and
graceful degradation of the ANN refine re-rank on an incomplete refine
corpus (VERDICT r11 'Next round' #1-2 + ADVICE r11 findings)."""

import inspect

import pytest
from pyspark.sql import functions as F

from photon_ml_spark.operators import dedup, similarity

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    return e.withColumn(
        "qe", F.transform("embedding", lambda x: x.cast("double"))
    ).cache()


def test_simhash_default_is_scale_form():
    """A default-argument call must plan the WIDE signature (2^15
    buckets per band at bands=4), not the 16-bit LCG oracle shape the
    round-11 100x ledger measured at 562x wall."""
    for fn in (dedup.simhash_signatures, dedup.simhash_neardup_pairs):
        params = inspect.signature(fn).parameters
        assert params["bits"].default == 60, fn.__name__
        assert params["bit_hash"].default == "xxhash", fn.__name__
    assert dedup.SIMHASH_BITS == 60
    assert dedup.SIMHASH_ORACLE_BITS == 16
    # default bands=4 -> 60/4 = 15 bits -> 32768 buckets per band
    bands = inspect.signature(dedup.simhash_neardup_pairs).parameters[
        "bands"
    ].default
    assert 2 ** (dedup.SIMHASH_BITS // bands) >= 32768


def test_cosine_full_cross_guard(emb, monkeypatch):
    """block_col=None is a full self cross-join: above the documented
    row cap it must raise instead of OOM, unless the caller opts in
    with allow_full_cross=True. Blocked calls never pay the guard."""
    small = emb.limit(40)
    monkeypatch.setattr(similarity, "FULL_CROSS_MAX_ROWS", 10)
    with pytest.raises(ValueError, match="allow_full_cross"):
        similarity.cosine_neardup_pairs(small, 0.9, vec_col="qe").count()
    # opt-in accepts the quadratic cost
    n_opt = similarity.cosine_neardup_pairs(
        small, 0.9, vec_col="qe", allow_full_cross=True
    ).count()
    # the collapse_exact path threads the opt-in through its recursion
    n_col = similarity.cosine_neardup_pairs(
        small, 0.9, vec_col="qe", allow_full_cross=True,
        collapse_exact=True,
    ).count()
    assert n_opt == n_col
    # blocked form is the scale path: no guard, no opt-in needed
    similarity.cosine_neardup_pairs(
        small, 0.9, block_col="label", vec_col="qe"
    ).count()
    monkeypatch.setattr(similarity, "FULL_CROSS_MAX_ROWS", 100_000)
    assert (
        similarity.cosine_neardup_pairs(small, 0.9, vec_col="qe").count()
        == n_opt
    )


def test_collapse_exact_respects_block_col(spark):
    """Bit-identical vectors in DIFFERENT blocks must not merge when
    the block is not a function of the vector (ADVICE r11 #1): the
    collapsed blocked run emits exactly the uncollapsed blocked run's
    pairs — no cross-block pairs at cosine 1.0."""
    v = [1.0, 0.0, 0.0]
    w = [0.9, 0.1, 0.0]
    rows = [
        (1, "en", v), (2, "en", v),   # same block, identical -> pair
        (3, "fr", v), (4, "fr", w),   # other block, 3 identical to 1/2
        (5, "en", w),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, lang string, embedding array<double>"
    )
    blocked = {
        (r.id_a, r.id_b)
        for r in similarity.cosine_neardup_pairs(
            df, 0.95, block_col="lang"
        ).collect()
    }
    collapsed = {
        (r.id_a, r.id_b)
        for r in similarity.cosine_neardup_pairs(
            df, 0.95, block_col="lang", collapse_exact=True
        ).collect()
    }
    assert collapsed == blocked
    assert (1, 2) in collapsed
    assert (1, 3) not in collapsed and (2, 3) not in collapsed


def test_collapse_exact_sets_verify_clean(docs):
    """verify=True exact-compares each member's shingle set against its
    representative's; on a real corpus (honest fingerprints) it must
    pass and return the identical membership/rep relation."""
    base = docs.limit(30)
    dups = base.filter(F.col("doc_id") % 3 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    sids = dedup.token_ids(base.unionByName(dups), n=1).cache()
    m0, r0 = dedup.collapse_exact_sets(sids)
    m1, r1 = dedup.collapse_exact_sets(sids, verify=True)
    assert {tuple(r) for r in m0.collect()} == {
        tuple(r) for r in m1.collect()
    }
    assert r0.count() == r1.count()
    sids.unpersist()


def test_refine_incomplete_corpus_keeps_quantized_score(
    spark, emb, tmp_path
):
    """An incomplete refine frame must degrade gracefully (ADVICE r11
    #2): shortlist ids missing from the refine corpus keep their
    quantized score instead of vanishing, so every query still gets k
    rows."""
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    corpus = emb.select("vec_id", "qe")
    idx = str(tmp_path / "ivf_sq8_partial_refine")
    similarity.save_ivf_index(
        emb, idx, k=4, vec_col="qe", seed=42, max_iter=5, sq8=True
    )
    k = 5
    # refine corpus missing every odd id — roughly half the shortlist
    partial = corpus.filter(F.col("vec_id") % 2 == 0)
    refined = similarity.ivf_topk_from_index(
        spark, idx, queries, k=k, n_probe=4, vec_col="qe",
        refine=partial, refine_factor=2,
    ).collect()
    per_q = {}
    for r in refined:
        per_q.setdefault(r.query_id, []).append(r)
    assert all(len(v) == k for v in per_q.values())
    assert len(per_q) == queries.count()
    # missing-side rows survive with a finite (quantized) score
    odd = [r for r in refined if r.vec_id % 2 == 1]
    assert odd, "some odd ids should make the top-k"
    assert all(r.cosine is not None for r in refined)
    # even ids carry the TRUE cosine (exact re-rank applied)
    true_cos = {
        (r.query_id, r.vec_id): round(r.cosine, 9)
        for r in similarity.cosine_topk(
            corpus, queries, k=corpus.count(), vec_col="qe"
        ).collect()
    }
    for r in refined:
        if r.vec_id % 2 == 0:
            assert round(r.cosine, 9) == true_cos[(r.query_id, r.vec_id)]
