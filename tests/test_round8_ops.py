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


def _write_docs_emb(tmp_path, rows, vecs):
    """rows: (doc_id, text, lang, source); vecs: (vec_id, [floats], label)."""
    sf_dir = str(tmp_path / "sfemb")
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
    emb = pa.table(
        {
            "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
            "embedding": pa.array(
                [v[1] for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([v[2] for v in vecs], pa.int32()),
        }
    )
    pq.write_table(emb, os.path.join(sf_dir, "embeddings.parquet"))
    return sf_dir


def test_split_leakage_safe_keeps_near_dup_cluster_together(spark, tmp_path, q):
    """Docs 3 and 4 carry IDENTICAL embeddings (cos=1 -> one cluster,
    canonical id 3); everyone else is orthogonal.  Per-doc hashing would
    send doc 4 to train (md5('4') leads 'a') — cluster-aware assignment
    must send it wherever doc 3 goes (md5('3') leads 'e' -> test).  The
    expected per-split rollup is recomputed in-test from hashlib over the
    cluster mapping, so counts, cluster counts, and token sums all pin."""
    import hashlib
    from collections import defaultdict

    rows = [(i, f"tok{i} " * (i + 1) + "end", "en", "srcT") for i in range(6)]
    # vecs: 3 and 4 identical; others one-hot on distinct axes
    def onehot(k):
        v = [0.0] * 8
        v[k] = 1.0
        return v

    vecs = [(i, onehot(i if i != 4 else 3), 0) for i in range(6)]
    sf_dir = _write_docs_emb(tmp_path, rows, vecs)
    out = {r["split"]: r for r in q["x_split_leakage_safe"](spark, sf_dir).collect()}

    cluster = {i: (3 if i == 4 else i) for i in range(6)}
    exp = defaultdict(lambda: [0, set(), 0])
    for doc_id, text, _, _ in rows:
        cl = cluster[doc_id]
        nib = hashlib.md5(str(cl).encode()).hexdigest()[0]
        split = "val" if nib in "cd" else "test" if nib in "ef" else "train"
        exp[split][0] += 1
        exp[split][1].add(cl)
        exp[split][2] += len(text.split(" "))
    assert set(out) == set(exp)
    for split, (n_docs, cls, n_toks) in exp.items():
        r = out[split]
        assert (r["n_docs"], r["n_clusters"], r["n_tokens"]) == (
            n_docs, len(cls), n_toks,
        ), (split, r)
    # the pair itself must cohabit: doc 3's nibble is 'e' -> test has both
    assert hashlib.md5(b"3").hexdigest()[0] == "e"
    assert out["test"]["n_docs"] >= 2


def test_domain_mix_caps_rare_domain_and_evens_shares(spark, tmp_path, q):
    """src_big holds ~96% of tokens, src_small ~4%: the small domain's
    uniform-target weight (0.5/0.04 = 12.5) must cap at 5.0, the big
    domain downweights below 1, and the resampled shares sit strictly
    closer to uniform than the raw shares."""
    rows = [(i, "w " * 48 + "w", "en", "src_big") for i in range(10)] + [
        (100, "w " * 19 + "w", "en", "src_small")
    ]
    out = {r["source"]: r for r in q["x_domain_mix"](spark, _write_docs_src(tmp_path, rows)).collect()}
    big, small = out["src_big"], out["src_small"]
    assert big["n_tokens"] == 490 and small["n_tokens"] == 20
    assert small["mix_weight"] == 5.0  # capped (uncapped would be ~12.75)
    assert big["mix_weight"] < 1.0
    assert small["resampled_tokens"] == 100  # floor(5.0 * 20)
    assert abs(small["resampled_share"] - 0.5) < abs(small["actual_share"] - 0.5)
    assert abs(big["resampled_share"] - 0.5) < abs(big["actual_share"] - 0.5)
    assert abs(small["resampled_share"] + big["resampled_share"] - 1.0) < 1e-9


def test_curriculum_order_stages_easy_before_hard(spark, tmp_path, q):
    """8 docs, one language, two difficulty levels (mean word length 2
    vs 8): the 4 easy docs must fill stages 1-2 and the 4 hard docs
    stages 3-4, each stage holding exactly 2 docs (ntile balance)."""
    easy = [(i, "ab " * 9 + "ab", "en", "srcT") for i in range(4)]
    hard = [(i + 10, "abcdefgh " * 9 + "abcdefgh", "en", "srcT") for i in range(4)]
    out = q["x_curriculum_order"](spark, _write_docs_src(tmp_path, easy + hard)).collect()
    by_stage = {r["stage"]: r for r in out}
    assert set(by_stage) == {1, 2, 3, 4}
    assert all(r["n_docs"] == 2 for r in out)
    # stages 1-2 = easy ids {0..3} (sum 6 split 2+2... pinned via ids_sum)
    assert by_stage[1]["ids_sum"] + by_stage[2]["ids_sum"] == sum(range(4))
    assert by_stage[3]["ids_sum"] + by_stage[4]["ids_sum"] == sum(
        i + 10 for i in range(4)
    )
    assert by_stage[1]["avg_difficulty"] < by_stage[3]["avg_difficulty"]


# -- dedicated current-code tests for the r4 rows deferred to round 9 --
# (window-rotation protocol: a deferred row must carry independent
# evidence that TODAY's code is right, not just its old driver record)


def test_dedup_prefix_clusters_shared_header_only(spark, tmp_path, q):
    """Docs 1 and 2 share their first PREFIX_K tokens then diverge (the
    boilerplate-header case whole-document hashing misses); doc 3 is
    unique.  Exactly one cluster: n_docs=2, keep_id=min, ids checksum."""
    from kafka_connect_sse_spark.operators.dedup import PREFIX_K

    header = " ".join(f"h{i}" for i in range(PREFIX_K))
    rows = [
        (1, header + " tail one here", "en", "srcT"),
        (2, header + " different ending entirely", "en", "srcT"),
        (3, "completely unrelated document text", "en", "srcT"),
    ]
    out = q["x_dedup_prefix"](spark, _write_docs_src(tmp_path, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_docs"], r["keep_id"], r["ids_sum"]) == (2, 1, 3)


def test_data_card_reports_deterministic_top_lang_and_median(spark, tmp_path, q):
    """srcA: 3 en + 1 de docs -> top_lang 'en', n_langs 2; srcB: single
    doc.  Token totals and the exact median of n_chars pin the rollup
    (even count -> interpolated midpoint, integral here)."""
    rows = [
        (1, "a b c", "en", "srcA"),        # 5 chars, 3 toks
        (2, "d e f g", "en", "srcA"),      # 7 chars, 4 toks
        (3, "h i", "en", "srcA"),          # 3 chars, 2 toks
        (4, "j k l m n", "de", "srcA"),    # 9 chars, 5 toks
        (5, "o p q", "fr", "srcB"),        # 5 chars, 3 toks
    ]
    out = {r["source"]: r for r in q["x_data_card"](spark, _write_docs_src(tmp_path, rows)).collect()}
    a = out["srcA"]
    assert (a["n_docs"], a["total_tokens"], a["n_langs"], a["top_lang"]) == (
        4, 14, 2, "en",
    )
    assert a["median_chars"] == 6.0  # (5 + 7) / 2
    b = out["srcB"]
    assert (b["n_docs"], b["top_lang"], b["median_chars"]) == (1, "fr", 5.0)


def test_hard_negatives_picks_closest_other_label(spark, tmp_path, q):
    """Query 0 (label 0) must rank the near-parallel label-1 vector
    first among negatives and NEVER return a same-label vector, however
    close.  Same-label vec 12 is nearly identical to the query — a
    similarity-only top-k would pick it; hard-negative mining must not."""
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),          # query
        (10, [0.9, 0.1, 0.0, 0.0], 1),          # hard negative (closest)
        (11, [0.0, 1.0, 0.0, 0.0], 1),          # easy negative
        (12, [0.99, 0.01, 0.0, 0.0], 0),        # same-label near-dup: excluded
    ]
    rows = [(i, "t", "en", "srcT") for i, _, _ in vecs]
    sf_dir = _write_docs_emb(tmp_path, rows, vecs)
    out = [r for r in q["x_hard_negatives"](spark, sf_dir).collect() if r["query_id"] == 0]
    assert [r["negative_id"] for r in sorted(out, key=lambda r: r["rnk"])] == [10, 11]
    assert all(r["neg_label"] != 0 for r in out)


def test_bm25_saturates_tf_and_normalizes_length(spark, tmp_path, q):
    """Repeating a query term lifts the score sub-linearly (k1
    saturation), a longer document with the SAME tf scores lower (b
    length normalization), and a doc with no query terms scores 0."""
    rows = [
        (1, "join " * 5 + "x " * 4 + "x", "en", "srcT"),   # tf=5, dl=10
        (2, "join " + "x " * 8 + "x", "en", "srcT"),        # tf=1, dl=10
        (3, "join " + "x " * 28 + "x", "en", "srcT"),       # tf=1, dl=30
        (4, "y " * 9 + "y", "en", "srcT"),                  # tf=0
    ]
    out = {r["doc_id"]: r for r in q["x_bm25_score"](spark, _write_docs_src(tmp_path, rows)).collect()}
    assert out[1]["bm25"] > out[2]["bm25"] > out[3]["bm25"] > out[4]["bm25"]
    assert out[4]["bm25"] == 0.0
    # saturation: 5x the tf must NOT give 5x the score
    assert out[1]["bm25"] < 5 * out[2]["bm25"]


def test_source_overlap_finds_shared_shingles_only(spark, tmp_path, q):
    """srcA and srcB share exactly one 3-shingle ('common phrase here');
    srcC shares nothing.  Exactly one pair row, with exact Jaccard and
    containment of the shingle vocabularies."""
    rows = [
        (1, "common phrase here tail a", "en", "srcA"),   # 3 shingles
        (2, "lead b common phrase here", "en", "srcB"),   # 3 shingles
        (3, "totally different text altogether now", "en", "srcC"),
    ]
    out = q["x_source_overlap"](spark, _write_docs_src(tmp_path, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["src_a"], r["src_b"], r["n_common"]) == ("srcA", "srcB", 1)
    assert (r["n_a"], r["n_b"]) == (3, 3)
    assert r["jaccard"] == round(1 / 5, 6)
    assert r["containment"] == round(1 / 3, 6)


def test_quality_classifier_keeps_rich_doc_drops_degenerate(spark, tmp_path, q):
    """A 100-token stopword-rich diverse doc scores a confidently-positive
    logit (keep); a 50-copies-of-one-word doc scores negative (drop).
    The flag must agree with the sign test on the reported probability
    (keep <=> prob >= 0.5) since both derive from the same logit."""
    rich = " ".join(
        ["the", "a", "of", "and", "to", "in"] * 10
        + [f"word{i}" for i in range(40)]
    )
    degenerate = " ".join(["zzzz"] * 50)
    rows = [(1, rich, "en"), (2, degenerate, "en")]
    out = {
        r["doc_id"]: r
        for r in q["x_quality_classifier"](
            spark, _write_docs(tmp_path, rows)
        ).collect()
    }
    assert out[1]["keep"] is True and out[1]["quality_prob"] > 0.5
    assert out[2]["keep"] is False and out[2]["quality_prob"] < 0.5
    for r in out.values():
        assert 0.0 < r["quality_prob"] < 1.0
        assert r["keep"] == (r["quality_prob"] >= 0.5)


def test_importance_resample_prefers_target_looking_docs(spark, tmp_path, q):
    """Target domain = lang 'en', whose docs are all 'spark'-token mass.
    Of two same-length German docs, the one written in the target's
    vocabulary ('spark') must outweigh the one in raw-only vocabulary
    ('und') — DSIR ranks by profile similarity to the target, not by
    membership."""
    rows = [
        (1, " ".join(["spark"] * 20), "en", "srcT"),
        (2, " ".join(["spark"] * 20), "en", "srcT"),
        (3, " ".join(["spark"] * 20), "de", "srcT"),   # target-looking
        (4, " ".join(["und"] * 20), "de", "srcT"),     # raw-only vocab
    ]
    out = {
        r["doc_id"]: r
        for r in q["x_importance_resample"](
            spark, _write_docs_src(tmp_path, rows)
        ).collect()
    }
    assert out[3]["log_weight"] > out[4]["log_weight"]
    assert out[3]["n_tokens"] == out[4]["n_tokens"] == 20


def test_pack_efficiency_bins_and_waste(spark, tmp_path, q):
    """10-token docs land in the 16 bin (waste 1 - 10/16 = 0.375);
    a 33-token doc lands in the 64 bin (waste 1 - 33/64); shares
    divide the doc count."""
    rows = [
        (1, " ".join(["w"] * 10), "en"),
        (2, " ".join(["w"] * 10), "en"),
        (3, " ".join(["w"] * 33), "en"),
    ]
    out = {
        r["bin_cap"]: r
        for r in q["x_pack_efficiency"](
            spark, _write_docs(tmp_path, rows)
        ).collect()
    }
    assert set(out) == {16, 64}
    b16, b64 = out[16], out[64]
    assert (b16["n_docs"], b16["sum_tokens"], b16["padded_tokens"]) == (2, 20, 32)
    assert b16["pad_waste"] == 0.375
    assert b64["n_docs"] == 1 and b64["pad_waste"] == round(1 - 33 / 64, 6)
    assert b16["doc_share"] == round(2 / 3, 6)


def test_dedup_semantic_drops_all_but_one_clique_member(spark, tmp_path, q):
    """Vectors 0..7 seed the centroids; 8 duplicates 0 exactly and 9
    near-duplicates it, so cell 0 holds a 3-clique of near-identical
    vectors — EXACTLY ONE survives (the farthest-from-centroid rule has
    a unique lexicographic minimum in a clique); singleton cells 1..7
    are never dropped."""
    basis = [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
        [0.0, 0.0, 0.0, 1.0],
        [1.0, 1.0, 0.0, 0.0],
        [0.0, 1.0, 1.0, 0.0],
        [0.0, 0.0, 1.0, 1.0],
        [1.0, 0.0, 0.0, 1.0],
    ]
    vecs = [(i, basis[i], 0) for i in range(8)]
    vecs.append((8, [1.0, 0.0, 0.0, 0.0], 0))
    vecs.append((9, [0.999, 0.01, 0.0, 0.0], 0))
    rows = [(i, "t", "en", "srcT") for i, _, _ in vecs]
    sf_dir = _write_docs_emb(tmp_path, rows, vecs)
    out = {r["vec_id"]: r for r in q["x_dedup_semantic"](spark, sf_dir).collect()}
    assert len(out) == 10
    trio = [out[0], out[8], out[9]]
    assert all(r["cell"] == 0 for r in trio)
    assert sum(1 for r in trio if not r["dropped"]) == 1
    assert sum(1 for r in trio if r["dropped"]) == 2
    for i in range(1, 8):
        assert out[i]["dropped"] is False


def test_dup_graph_degree_histogram_counts_partners(spark, tmp_path, q):
    """A 3-clique of identical docs (degree 2 each), an identical pair
    (degree 1 each), two unique docs (degree 0): histogram is exactly
    {2: 3 docs, 1: 2 docs, 0: 2 docs}, ids_sum pinning membership."""
    clique = "alpha bravo charlie delta echo foxtrot golf hotel"
    pair = "one two three four five six seven eight nine ten"
    rows = [
        (1, clique, "en"),
        (2, clique, "en"),
        (3, clique, "en"),
        (4, pair, "en"),
        (5, pair, "en"),
        (6, "solo unique words never repeated anywhere else at all", "en"),
        (7, "another entirely distinct document with its own tokens", "en"),
    ]
    out = {
        r["degree"]: r
        for r in q["x_dup_graph_degree"](
            spark, _write_docs(tmp_path, rows)
        ).collect()
    }
    assert {(d, r["n_docs"]) for d, r in out.items()} == {(2, 3), (1, 2), (0, 2)}
    assert out[2]["ids_sum"] == 1 + 2 + 3
    assert out[1]["ids_sum"] == 4 + 5
    assert out[0]["ids_sum"] == 6 + 7


def test_vocab_coverage_monotone_and_exact_on_planted_freqs(spark, tmp_path, q):
    """Planted frequencies: 'aa' x 6, 'bb' x 3, 60 singletons -> total 69.
    With VOCAB_KS = (100, 1000, 10000) every k exceeds the 62-token
    vocab, so all three rows cover 100% with n_top = 62; coverage is
    monotone in k by construction."""
    text1 = " ".join(["aa"] * 6 + ["bb"] * 3 + [f"u{i}" for i in range(30)])
    text2 = " ".join([f"v{i}" for i in range(30)])
    rows = [(1, text1, "en"), (2, text2, "en")]
    out = sorted(
        q["x_vocab_coverage"](spark, _write_docs(tmp_path, rows)).collect(),
        key=lambda r: r["k"],
    )
    assert [r["k"] for r in out] == [100, 1000, 10000]
    for r in out:
        assert r["n_top_tokens"] == 62
        assert r["covered_tokens"] == r["total_tokens"] == 69
        assert r["coverage"] == 1.0


def test_source_novelty_credits_first_source_only(spark, tmp_path, q):
    """srcA and srcB share one document text (identical shingles); srcA
    sorts first so it takes ALL the novelty credit; srcC is disjoint and
    fully novel.  srcB's novelty ratio must be exactly 0."""
    shared = "alpha bravo charlie delta echo foxtrot"
    rows = [
        (1, shared, "en", "srcA"),
        (2, shared, "en", "srcB"),
        (3, "uno dos tres cuatro cinco seis", "en", "srcC"),
    ]
    out = {
        r["source"]: r
        for r in q["x_source_novelty"](
            spark, _write_docs_src(tmp_path, rows)
        ).collect()
    }
    assert out["srcA"]["novelty_ratio"] == 1.0
    assert out["srcB"]["novelty_ratio"] == 0.0
    assert out["srcB"]["distinct_shingles"] == out["srcA"]["distinct_shingles"] == 4
    assert out["srcC"]["novelty_ratio"] == 1.0


def test_tokenizer_fertility_penalizes_fragmenting_text(spark, tmp_path, q):
    """'de' docs are digit-punctuation soup (every word fragments into
    several BPE-ish tokens); 'en' docs are plain lowercase words
    (fertility exactly 1.0).  The fertility gap is the tokenizer-bias
    signal the op exists to expose."""
    rows = [
        (1, "plain lower words only here", "en"),
        (2, "ab1cd ef2gh ij3kl", "de"),   # each word -> 3 tokens
    ]
    out = {
        r["lang"]: r
        for r in q["x_tokenizer_fertility"](
            spark, _write_docs(tmp_path, rows)
        ).collect()
    }
    assert out["en"]["fertility"] == 1.0
    assert out["de"]["fertility"] == 3.0
    assert out["de"]["bpe_tokens"] == 9


def test_embed_outliers_flags_exactly_the_far_tail(spark, tmp_path, q):
    """99 vectors at the origin-ish cluster + 1 far point: ceil(0.99*100)
    = 100... so shrink: 10 vectors -> ceil(0.99*10) = 10 means zero
    outliers; with 200 vectors ceil gives 198 -> exactly the 2 farthest
    flagged.  Plant 198 near-identical + 2 distant vectors and assert
    the flags land on the planted ids."""
    vecs = [(i, [1.0, 0.0, 0.0, 0.0], 0) for i in range(198)]
    vecs.append((500, [9.0, 9.0, 9.0, 9.0], 0))
    vecs.append((501, [-9.0, -9.0, -9.0, 9.0], 0))
    rows = [(i, "t", "en", "srcT") for i, _, _ in vecs]
    sf_dir = _write_docs_emb(tmp_path, rows, vecs)
    out = {r["vec_id"]: r for r in q["x_embed_outliers"](spark, sf_dir).collect()}
    flagged = {v for v, r in out.items() if r["is_outlier"]}
    assert flagged == {500, 501}


def _write_events(tmp_path, rows):
    """rows: (event_id, ts_iso, user_id, event_type)."""
    import datetime as dt

    sf_dir = str(tmp_path / "sfev")
    os.makedirs(sf_dir, exist_ok=True)
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [dt.datetime.fromisoformat(r[1]) for r in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(sf_dir, "events.parquet"))
    return sf_dir


def test_funnel_requires_strict_stage_order(spark, tmp_path, q):
    """User 1 converts in order (view<click<purchase); user 2 purchased
    BEFORE clicking — the funnel must not credit that purchase; user 3
    clicked but never viewed — no stage reached past n_users."""
    rows = [
        (1, "2024-01-01T00:00:01", 1, "view"),
        (2, "2024-01-01T00:00:02", 1, "click"),
        (3, "2024-01-01T00:00:03", 1, "purchase"),
        (4, "2024-01-01T00:00:01", 2, "purchase"),
        (5, "2024-01-01T00:00:02", 2, "view"),
        (6, "2024-01-01T00:00:03", 2, "click"),
        (7, "2024-01-01T00:00:01", 3, "click"),
    ]
    r = q["q_funnel_stages"](spark, _write_events(tmp_path, rows)).collect()[0]
    assert (r["n_users"], r["reached_view"], r["reached_click"],
            r["reached_purchase"]) == (3, 2, 2, 1)
    assert r["conv_overall"] == round(1 / 3, 6)


def test_retention_cohort_counts_day_offsets(spark, tmp_path, q):
    """Three users first seen on day 0: one returns next day (D1), one
    returns on day 7 (D7), one never returns.  Same-day repeat events
    count once (DISTINCT user-day)."""
    rows = [
        (1, "2024-01-01T10:00:00", 1, "view"),
        (2, "2024-01-01T11:00:00", 1, "click"),   # same-day dup activity
        (3, "2024-01-02T10:00:00", 1, "view"),     # D1 return
        (4, "2024-01-01T10:00:00", 2, "view"),
        (5, "2024-01-08T10:00:00", 2, "view"),     # D7 return
        (6, "2024-01-01T10:00:00", 3, "view"),     # never returns
    ]
    out = q["q_retention_cohort"](spark, _write_events(tmp_path, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_users"], r["retained_d1"], r["retained_d7"]) == (3, 1, 1)
    assert r["rate_d1"] == round(1 / 3, 6)


def test_attribution_credits_latest_preceding_touch(spark, tmp_path, q):
    """Purchase after view->click credits CLICK (latest touch, not
    first); a purchase with no prior touch lands in 'none'; an 'error'
    event between touch and purchase must not steal credit."""
    rows = [
        (1, "2024-01-01T00:00:01", 1, "view"),
        (2, "2024-01-01T00:00:02", 1, "click"),
        (3, "2024-01-01T00:00:03", 1, "error"),
        (4, "2024-01-01T00:00:04", 1, "purchase"),   # -> click
        (5, "2024-01-01T00:00:01", 2, "view"),
        (6, "2024-01-01T00:00:02", 2, "purchase"),   # -> view
        (7, "2024-01-01T00:00:01", 3, "purchase"),   # -> none
    ]
    out = {
        r["attributed"]: r["n_purchases"]
        for r in q["q_attribution_last_touch"](
            spark, _write_events(tmp_path, rows)
        ).collect()
    }
    assert out == {"click": 1, "view": 1, "none": 1}


def test_anomaly_zscore_flags_planted_spike(spark, tmp_path, q):
    """'view' runs 10 events/day for 9 days then 100 on day 10: the
    spike day's z = (100-19)/sqrt((10900-190²/10)/9) ≈ 2.846 > 2 →
    flagged; every 10-count day sits at z ≈ -0.316 → unflagged."""
    rows = []
    eid = 0
    for day in range(1, 10):
        for i in range(10):
            rows.append((eid, f"2024-01-{day:02d}T00:00:{i:02d}", 1, "view"))
            eid += 1
    for i in range(100):
        rows.append((eid, f"2024-01-10T00:{i // 60:02d}:{i % 60:02d}", 1, "view"))
        eid += 1
    out = {
        r["day"]: r
        for r in q["q_anomaly_zscore_daily"](
            spark, _write_events(tmp_path, rows)
        ).collect()
    }
    assert len(out) == 10
    assert out["2024-01-10"]["is_anomaly"] is True
    assert out["2024-01-10"]["z"] > 2.8
    assert all(not r["is_anomaly"] for d, r in out.items() if d != "2024-01-10")


def _write_lineitem(tmp_path, rows):
    """rows: (l_partkey, l_extendedprice, l_discount)."""
    sf_dir = str(tmp_path / "sfli")
    os.makedirs(sf_dir, exist_ok=True)
    tbl = pa.table(
        {
            "l_partkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_extendedprice": pa.array([r[1] for r in rows], pa.float64()),
            "l_discount": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    pq.write_table(tbl, os.path.join(sf_dir, "lineitem.parquet"))
    return sf_dir


def test_pareto_abc_exact_boundary_is_class_a(spark, tmp_path, q):
    """Revenues 80/15/5: the top part's cumulative share is EXACTLY 80%
    — the boundary compare (cum*100 <= total*80, exact decimals) must
    class it A, the 95% part B, the tail C."""
    rows = [(1, 80.0, 0.0), (2, 15.0, 0.0), (3, 5.0, 0.0)]
    out = {
        r["abc"]: r
        for r in q["q_pareto_abc"](spark, _write_lineitem(tmp_path, rows)).collect()
    }
    assert out["A"]["n_parts"] == 1 and out["A"]["class_revenue"] == 80.0
    assert out["B"]["n_parts"] == 1 and out["B"]["class_revenue"] == 15.0
    assert out["C"]["n_parts"] == 1 and out["C"]["class_revenue"] == 5.0
    assert out["A"]["revenue_share"] == 0.8


def test_rfm_segments_rank_users_on_all_three_axes(spark, tmp_path, q):
    """Four users with strictly ordered recency (last-seen day), event
    frequency, and identical-per-event value: user 1 is (1,1,1) on every
    axis, user 4 is (4,4,4); ids_sum pins the cell membership."""
    rows = []
    eid = 0
    for uid, (day, n_ev) in enumerate(
        [(10, 8), (8, 6), (6, 4), (4, 2)], start=1
    ):
        for i in range(n_ev):
            rows.append(
                (eid, f"2024-01-{day:02d}T00:00:{i:02d}", uid, "view")
            )
            eid += 1
    out = {
        (r["r_q"], r["f_q"], r["m_q"]): r
        for r in q["q_rfm_segments"](
            spark, _write_events(tmp_path, rows)
        ).collect()
    }
    assert set(out) == {(1, 1, 1), (2, 2, 2), (3, 3, 3), (4, 4, 4)}
    assert out[(1, 1, 1)]["ids_sum"] == 1
    assert out[(4, 4, 4)]["ids_sum"] == 4
    assert out[(1, 1, 1)]["total_events"] == 8


def _write_lineitem_rf(tmp_path, rows):
    """rows: (l_returnflag, l_extendedprice)."""
    sf_dir = str(tmp_path / "sflirf")
    os.makedirs(sf_dir, exist_ok=True)
    tbl = pa.table(
        {
            "l_returnflag": pa.array([r[0] for r in rows], pa.string()),
            "l_extendedprice": pa.array([r[1] for r in rows], pa.float64()),
        }
    )
    pq.write_table(tbl, os.path.join(sf_dir, "lineitem.parquet"))
    return sf_dir


def test_mad_fence_survives_the_outlier_that_moves_a_zscore_fence(
    spark, tmp_path, q
):
    """Group A: nine 10s and one 1000 — the median/MAD fence (10, 0)
    still flags the 1000 (a mean/std fence would have been dragged
    toward it); group B: 1..5 has MAD 1 and no outliers."""
    rows = [("A", 10.0)] * 9 + [("A", 1000.0)] + [
        ("B", float(v)) for v in (1, 2, 3, 4, 5)
    ]
    out = {
        r["l_returnflag"]: r
        for r in q["q_agg_mad"](spark, _write_lineitem_rf(tmp_path, rows)).collect()
    }
    a, b = out["A"], out["B"]
    assert (a["median_price"], a["mad_price"], a["n_outliers"]) == (10.0, 0.0, 1)
    assert (b["median_price"], b["mad_price"], b["n_outliers"]) == (3.0, 1.0, 0)


def test_fn_interval_clamps_month_end_and_mondays(spark, tmp_path, q):
    """2024-12-31 + 2 months must CLAMP to 2025-02-28; day-of-week is
    days-since-Monday-2024-01-01 mod 7 (Jan 31 2024 = Wednesday = 2);
    week_start truncates to the preceding Monday."""
    import datetime as dt

    rows = [
        (1, "2024-01-31T12:00:00", 1, "view"),
        (2, "2024-12-31T12:00:00", 1, "view"),
    ]
    out = {
        r["event_id"]: r
        for r in q["q_fn_interval"](spark, _write_events(tmp_path, rows)).collect()
    }
    jan = out[1]
    assert jan["week_start"] == dt.date(2024, 1, 29)
    assert jan["month_end"] == dt.date(2024, 1, 31)
    assert (jan["qtr"], jan["dow_mon0"], jan["days_in_month"]) == (1, 2, 31)
    assert jan["plus_2m"] == dt.date(2024, 3, 31)
    dec = out[2]
    assert dec["plus_2m"] == dt.date(2025, 2, 28)  # month-end clamp


def test_pca_power_finds_dominant_axis(spark, tmp_path, q):
    """Ten vectors hugging axis 2 (with a small axis-1 component so the
    e1 start is not orthogonal): the returned direction must put its
    dominant loading on dim 2, normalized to ~unit length."""
    vecs = [
        (i, [0.1, 5.0 + 0.01 * i, 0.05 * (i % 2), 0.0], 0)
        for i in range(10)
    ]
    rows = [(i, "t", "en", "srcT") for i, _, _ in vecs]
    sf_dir = _write_docs_emb(tmp_path, rows, vecs)
    out = {r["dim"]: r for r in q["x_embed_pca_power"](spark, sf_dir).collect()}
    assert len(out) == 4
    loadings = {d: abs(r["loading"]) for d, r in out.items()}
    assert max(loadings, key=loadings.get) == 2
    assert loadings[2] > 0.99
    norm = sum(v * v for v in loadings.values()) ** 0.5
    assert abs(norm - 1.0) < 1e-4
    assert out[1]["lambda_est"] > 0


def test_triangle_count_on_planted_graph(spark, tmp_path, q):
    """Users 2,4,6 co-occur in one minute bucket (a 3-clique = 1
    triangle, 3 edges, 3 wedges); users 8,10 form an isolated edge;
    user 12 is alone.  User 7 ALSO sits in the clique's minute but is
    ODD — the deterministic vertex sample (user_id % 2 = 0) must drop
    it, or edges would be 7 and wedges/triangles would grow.  Expect
    edges 4, wedges 3 (clique paths only; the pair has none) and
    exactly 1 triangle; clustering = 3*1/3 = 1.0."""
    rows = [
        (1, "2024-01-01T00:00:01", 2, "view"),
        (2, "2024-01-01T00:00:02", 4, "view"),
        (3, "2024-01-01T00:00:03", 6, "view"),
        (4, "2024-01-01T00:00:04", 7, "view"),  # odd: sampled out
        (5, "2024-01-01T01:00:01", 8, "view"),
        (6, "2024-01-01T01:00:02", 10, "view"),
        (7, "2024-01-01T02:00:01", 12, "view"),
    ]
    r = q["q_triangle_count"](spark, _write_events(tmp_path, rows)).collect()[0]
    assert (r["n_edges"], r["n_wedges"], r["n_triangles"]) == (4, 3, 1)
    assert r["global_clustering"] == 1.0


def test_stream_compaction_keeps_latest_with_id_tiebreak(spark, tmp_path, q):
    """Three records for (user 1, view): latest ts wins; two records
    share the max ts so the higher event_id breaks the tie — exactly the
    batch q_compact_latest ordering, maintained as stream state."""
    rows = [
        (1, "2024-01-01T00:00:01", 1, "view"),
        (7, "2024-01-01T00:00:05", 1, "view"),
        (9, "2024-01-01T00:00:05", 1, "view"),   # same ts, higher id wins
        (2, "2024-01-01T00:00:02", 2, "click"),
    ]
    out = {
        (r["user_id"], r["event_type"]): r
        for r in q["s_compact_latest"](spark, _write_events(tmp_path, rows)).collect()
    }
    assert out[(1, "view")]["last_event_id"] == 9
    assert out[(1, "view")]["last_ts"] == "2024-01-01 00:00:05"
    assert out[(2, "click")]["last_event_id"] == 2


def test_cluster_purity_separates_planted_labels(spark, tmp_path, q):
    """Centroid-seed vectors 0..7 alternate labels; extra vectors hug
    axis 1 with label 0 and axis 2 with label 1 — cell 0 and cell 1 must
    be pure (purity 1.0) with the planted majority labels, and the
    global purity is exact integer division."""
    basis = [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
        [0.0, 0.0, 0.0, 1.0],
        [1.0, 1.0, 0.0, 0.0],
        [0.0, 1.0, 1.0, 0.0],
        [0.0, 0.0, 1.0, 1.0],
        [1.0, 0.0, 0.0, 1.0],
    ]
    vecs = [(i, basis[i], i % 2) for i in range(8)]
    vecs += [(10, [0.99, 0.01, 0.0, 0.0], 0), (11, [0.98, 0.02, 0.0, 0.0], 0)]
    vecs += [(12, [0.01, 0.99, 0.0, 0.0], 1), (13, [0.02, 0.98, 0.0, 0.0], 1)]
    rows = [(i, "t", "en", "srcT") for i, _, _ in vecs]
    sf_dir = _write_docs_emb(tmp_path, rows, vecs)
    out = {r["cell"]: r for r in q["x_cluster_purity"](spark, sf_dir).collect()}
    c0, c1 = out[0], out[1]
    assert (c0["n_members"], c0["majority_label"], c0["cell_purity"]) == (3, 0, 1.0)
    assert (c1["n_members"], c1["majority_label"], c1["cell_purity"]) == (3, 1, 1.0)
    total = sum(r["n_members"] for r in out.values())
    maj = sum(r["n_majority"] for r in out.values())
    assert out[0]["global_purity"] == round(maj / total, 6)
