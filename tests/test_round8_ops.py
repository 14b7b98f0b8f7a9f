"""Behavioral tests for the round-8 operators on PLANTED corpora:
x_dedup_span must flag aligned cross-document duplication and ignore
unique text; x_perplexity_filter must drop a gibberish outlier while
keeping ordinary documents (the oracle gate proves engine parity; these
prove the SEMANTICS on constructed cases the fixture can't isolate)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kafka_connect_sse_spark.registry import queries


def _write_docs(tmp_path, rows):
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir, exist_ok=True)
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array(["srcT"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(sf_dir, "documents.parquet"))
    return sf_dir


@pytest.fixture(scope="module")
def q():
    return queries()


def test_span_dedup_flags_exact_copy_and_aligned_prefix(spark, tmp_path, q):
    """Exact copy -> every span duplicated in both docs (drop); unique doc
    -> zero duplicated spans; aligned 80-char shared prefix on a 400-char
    doc -> exactly 2 of 10 spans duplicated (no drop).  SPAN_K=40."""
    from kafka_connect_sse_spark.operators.dedup import SPAN_K

    words = ("alpha bravo charlie delta echo foxtrot golf hotel india "
             "juliet kilo lima mike november oscar papa quebec romeo "
             "sierra tango uniform victor whiskey xray yankee zulu ")
    base = (words * 4)[:400]
    unique = ("one two three four five six seven eight nine ten eleven "
              "twelve thirteen fourteen fifteen sixteen " * 8)[:400]
    assert len(base) == len(unique) == 400
    prefix_shared = base[: 2 * SPAN_K] + unique[2 * SPAN_K:]
    rows = [
        (1, base, "en"),
        (2, base, "en"),          # exact copy of 1
        (3, unique, "en"),        # no cross-doc spans... except vs 4's tail
        (4, prefix_shared, "en"),  # first 2 spans == doc 1/2's first 2
    ]
    sf_dir = _write_docs(tmp_path, rows)
    out = {
        r["doc_id"]: r.asDict()
        for r in q["x_dedup_span"](spark, sf_dir).collect()
    }
    assert out[1]["n_spans"] == 10 and out[2]["n_spans"] == 10
    assert out[1]["dup_ratio"] == 1.0 and out[1]["drop_doc"]
    assert out[2]["dup_ratio"] == 1.0 and out[2]["drop_doc"]
    # doc 4 shares its 2 aligned prefix spans with docs 1/2 and its tail
    # (spans 3..10, identical offsets) with doc 3
    assert out[4]["n_dup_spans"] >= 2 and not out[1]["n_dup_spans"] < 10
    # doc 3's tail-sharing with doc 4 is aligned too (same construction),
    # so assert the INVARIANT rather than a magic count: dup counts are
    # symmetric evidence — every dup span of 3 exists in 4's span set
    assert out[3]["n_dup_spans"] == out[4]["n_spans"] - 2 == 8
    assert out[4]["n_dup_spans"] == 10 and out[4]["drop_doc"]


def test_span_dedup_all_unique_corpus_is_clean(spark, tmp_path, q):
    rows = [
        (i, f"doc {i} " + " ".join(f"w{i}x{j}" for j in range(30)), "en")
        for i in range(5)
    ]
    sf_dir = _write_docs(tmp_path, rows)
    out = q["x_dedup_span"](spark, sf_dir).collect()
    assert len(out) == 5
    assert all(r["n_dup_spans"] == 0 and not r["drop_doc"] for r in out)
    assert all(r["n_spans"] > 0 for r in out)


def test_perplexity_filter_drops_gibberish_outlier(spark, tmp_path, q):
    """12 documents built from a tiny shared vocabulary (high bigram
    probability under the corpus LM) + one gibberish document whose
    bigrams each occur once (probability ~ alpha/(c1 + alpha*V)) —
    the outlier's NLL must exceed the language mean + 0.15 and be the
    ONLY dropped document."""
    common = "the cat sat on the mat and the dog sat on the rug "
    rows = [(i, (common * 3).strip(), "en") for i in range(12)]
    gibberish = " ".join(f"zq{i}a wfx{i}b vkj{i}c" for i in range(12))
    rows.append((99, gibberish, "en"))
    sf_dir = _write_docs(tmp_path, rows)
    out = {
        r["doc_id"]: r.asDict()
        for r in q["x_perplexity_filter"](spark, sf_dir).collect()
    }
    assert len(out) == 13
    assert not out[99]["keep_doc"]
    assert out[99]["nll"] > out[99]["lang_nll"]
    assert all(out[i]["keep_doc"] for i in range(12))


def test_perplexity_filter_is_per_language(spark, tmp_path, q):
    """The LM is per-language: an identical token sequence is scored
    against ITS language's counts, so a doc that is ordinary in lang A
    but planted as the lone alien in lang B gets a higher NLL there."""
    en_common = "spark shuffles keys into partitions for the join "
    rows = [(i, (en_common * 3).strip(), "en") for i in range(8)]
    de_common = "der zug faehrt um acht uhr vom gleis neun ab "
    rows += [(100 + i, (de_common * 3).strip(), "de") for i in range(8)]
    # the alien: English-vocabulary text labeled 'de'
    rows.append((999, (en_common * 3).strip(), "de"))
    sf_dir = _write_docs(tmp_path, rows)
    out = {
        r["doc_id"]: r.asDict()
        for r in q["x_perplexity_filter"](spark, sf_dir).collect()
    }
    assert out[999]["nll"] > out[0]["nll"]
    assert not out[999]["keep_doc"]
    assert all(out[100 + i]["keep_doc"] for i in range(8))


# ---- round-8 continuation ops: x_zipf_fit / x_cooccur_pmi /
# ---- x_cms_heavy_hitters (planted-corpus semantics; oracle gate
# ---- proves engine parity separately)


def test_zipf_fit_recovers_planted_power_law(spark, tmp_path, q):
    """Corpus built with freq(token_r) ~ round(1000 / r) (Zipf s=1) must
    fit slope ≈ -1 with high r2; token totals must be exact."""
    counts = {f"w{r:02d}": max(1, round(1000 / r)) for r in range(1, 21)}
    words = [w for w, n in counts.items() for _ in range(n)]
    # spread over a few docs so the count pass actually aggregates
    docs, step = [], 200
    for i in range(0, len(words), step):
        chunk = " ".join(words[i : i + step])
        docs.append((i // step, chunk, "en"))
    sf_dir = _write_docs(tmp_path, docs)
    row = q["x_zipf_fit"](spark, sf_dir).collect()[0]
    assert row["n_vocab"] == 20
    assert row["n_tokens"] == sum(counts.values())
    assert -1.15 <= row["zipf_slope"] <= -0.85
    assert row["zipf_r2"] >= 0.97


def test_zipf_fit_flat_corpus_slope_zero(spark, tmp_path, q):
    """Uniform token frequencies (the synthetic-corpus signature) must
    fit slope ≈ 0 — the quality signal the op exists to raise."""
    docs = [(i, " ".join(f"u{j}" for j in range(30)), "en") for i in range(10)]
    sf_dir = _write_docs(tmp_path, docs)
    row = q["x_zipf_fit"](spark, sf_dir).collect()[0]
    assert row["n_vocab"] == 30 and row["n_tokens"] == 300
    assert abs(row["zipf_slope"]) < 1e-6


def test_cooccur_pmi_ranks_exclusive_pair_above_frequent_pair(spark, tmp_path, q):
    """'aaa bbb' appear ONLY together (high PMI); 'xxx yyy' co-occur the
    same number of times but each also appears everywhere else (low
    PMI).  PMI must rank the exclusive collocation first even though raw
    counts are equal — the exact property raw bigram counts miss."""
    collocated = " ".join(["aaa bbb"] * 8)          # 8 aaa-bbb pairs
    diluted = " ".join(["xxx yyy"] * 8)             # 8 xxx-yyy pairs...
    filler = " ".join(["xxx zzz yyy qqq"] * 40)     # ...but xxx/yyy common
    docs = [(1, collocated, "en"), (2, diluted, "en"), (3, filler, "en")]
    sf_dir = _write_docs(tmp_path, docs)
    out = q["x_cooccur_pmi"](spark, sf_dir).collect()
    by_pair = {(r["x"], r["y"]): r for r in out}
    assert ("aaa", "bbb") in by_pair and ("xxx", "yyy") in by_pair
    ab, xy = by_pair[("aaa", "bbb")], by_pair[("xxx", "yyy")]
    assert ab["nxy"] == 8
    assert ab["pmi"] > xy["pmi"]
    assert ab["rnk"] < xy["rnk"]
    # support threshold: a pair occurring fewer than PMI_MIN_PAIR times
    # must not be reported even though its PMI would be extreme
    assert not any(r["nxy"] < 5 for r in out)


def test_cms_heavy_hitters_guarantees_hold_on_skewed_corpus(spark, tmp_path, q):
    """Planted skew: 'hot' dominates; every CMS guarantee boolean must
    hold and the candidate exact counts must be the true frequencies
    (doc 0 is the % 20 == 0 sample shard and contains every token, so
    the sample proposes all of them)."""
    base = "hot " * 50 + "warm " * 20 + " ".join(f"cold{j}" for j in range(10))
    docs = [(i, base.strip(), "en") for i in range(10)]  # doc 0 in sample
    sf_dir = _write_docs(tmp_path, docs)
    out = q["x_cms_heavy_hitters"](spark, sf_dir).collect()
    assert 0 < len(out) <= 20
    by_tok = {r["token"]: r for r in out}
    assert by_tok["hot"]["exact_count"] == 500
    assert by_tok["warm"]["exact_count"] == 200
    for r in out:
        assert r["overestimates"], r
        assert r["within_bound"], r
        assert r["merge_consistent"], r


def _write_docs_src(tmp_path, rows):
    """rows: (doc_id, text, lang, source)."""
    sf_dir = str(tmp_path / "sfsrc")
    os.makedirs(sf_dir, exist_ok=True)
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(sf_dir, "documents.parquet"))
    return sf_dir


def test_ks_drift_detects_shifted_lengths_and_passes_identical(spark, tmp_path, q):
    """src0 docs all length 10, others all length 30 -> disjoint CDFs,
    KS = 1.0.  Identical length distributions -> KS = 0.0."""
    shifted = [(i, "aaaaa aaaa", "en", "src0") for i in range(5)] + [
        (i + 10, "b" * 30, "en", "src1") for i in range(5)
    ]
    row = q["x_ks_drift"](spark, _write_docs_src(tmp_path / "a", shifted)).collect()[0]
    assert row["n_a"] == 5 and row["n_b"] == 5
    assert row["ks_stat"] == 1.0
    same = [(i, "x" * 20, "en", "src0") for i in range(5)] + [
        (i + 10, "y" * 20, "en", "src1") for i in range(5)
    ]
    row = q["x_ks_drift"](spark, _write_docs_src(tmp_path / "b", same)).collect()[0]
    assert row["ks_stat"] == 0.0


def test_chi2_keyness_ranks_exclusive_token_over_shared(spark, tmp_path, q):
    """'marker' appears only in src0, 'shared' uniformly everywhere.
    Keyness must rank marker far above shared (shared's chi2 ~ 0)."""
    rows = [
        (i, "marker " * 10 + "shared " * 10, "en", "src0") for i in range(3)
    ] + [(i + 10, "other " * 10 + "shared " * 10, "en", "src1") for i in range(3)]
    out = q["x_chi2_keyness"](spark, _write_docs_src(tmp_path, rows)).collect()
    by_tok = {r["w"]: r for r in out}
    assert by_tok["marker"]["n_focus"] == 30 and by_tok["marker"]["n_rest"] == 0
    assert by_tok["marker"]["chi2"] > by_tok["shared"]["chi2"]
    assert by_tok["marker"]["rnk"] < by_tok["shared"]["rnk"]
    # 'other' is exclusively NON-focus: equally key, symmetric statistic
    assert by_tok["other"]["chi2"] == by_tok["marker"]["chi2"]
