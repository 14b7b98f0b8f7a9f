"""Round-12 session-2 behavioral tests: UniMax waterfilling, target
encoding, Friedman blocked ranks, Bollinger bands, ECE calibration.
Each op gets (a) the driver-style cross-engine gate at sf0.01 and
(b) hand-computed / invariant assertions that catch semantic bugs
mirrored on both engines (the gate's blind spot)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kafka_connect_sse_spark.registry import oracle_sql, queries

SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def q():
    return queries()


@pytest.fixture(scope="module")
def osql():
    return oracle_sql()


def _duck_views(sf_dir: str, tables):
    import duckdb

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _cross_engine(spark, q, osql, name, sf_dir, tables):
    from tools.check_correctness import canon

    spdf = q[name](spark, sf_dir).toPandas()
    con = _duck_views(sf_dir, tables)
    opdf = con.execute(osql[name]).df()
    scols, srows, shash = canon(spdf)
    ocols, orows, ohash = canon(opdf)
    assert scols == ocols, (name, scols, ocols)
    assert shash == ohash, (name, srows[:4], orows[:4])
    return spdf


def test_unimax_gate_and_waterfilling_invariants(spark, q, osql):
    from kafka_connect_sse_spark.operators.pipeline import (
        UNIMAX_BUDGET_X,
        UNIMAX_EPOCH_CAP,
    )

    df = _cross_engine(
        spark, q, osql, "x_unimax_mixture", SF001, ["documents"]
    )
    total = int(df["n_tokens"].sum())
    budget = UNIMAX_BUDGET_X * total
    # nobody exceeds the epoch cap, and the budget is never overspent
    assert (df["alloc_tokens"] <= df["cap_tokens"]).all()
    assert (
        df["epochs"] <= UNIMAX_EPOCH_CAP + 1e-9
    ).all()
    assert int(df["alloc_tokens"].sum()) <= budget
    # the fixture exercises BOTH branches (constants are sized for it)
    assert df["capped"].any() and (~df["capped"]).any()
    # every capped language gets exactly its cap; every uncapped
    # language gets the SAME equal share, and that share is at least
    # as big as any cap that was granted (waterfilling order)
    capped = df[df["capped"]]
    uncapped = df[~df["capped"]]
    assert (capped["alloc_tokens"] == capped["cap_tokens"]).all()
    assert uncapped["alloc_tokens"].nunique() == 1
    assert uncapped["alloc_tokens"].min() >= capped["cap_tokens"].max()


def test_unimax_greedy_reference_loop_agrees(spark, q):
    """Replay the UniMax greedy loop in plain Python and demand the
    closed-form window implementation lands on the same allocation."""
    from kafka_connect_sse_spark.operators.pipeline import (
        UNIMAX_BUDGET_X,
        UNIMAX_EPOCH_CAP,
    )

    df = (
        q["x_unimax_mixture"](spark, SF001)
        .toPandas()
        .sort_values(["cap_tokens", "lang"])
        .reset_index(drop=True)
    )
    total = int(df["n_tokens"].sum())
    remaining = UNIMAX_BUDGET_X * total
    langs_left = len(df)
    expect = {}
    share = None  # frozen equal share once the first language uncaps
    for _, r in df.iterrows():
        cap = int(r["cap_tokens"])
        if share is None and cap * langs_left <= remaining:
            expect[r["lang"]] = cap  # cheap language: grant its cap
            remaining -= cap
            langs_left -= 1
        else:
            # waterfilling switch point: every remaining language
            # splits the leftover budget equally (integer floor)
            if share is None:
                share = remaining // langs_left
            expect[r["lang"]] = share
    got = dict(zip(df["lang"], df["alloc_tokens"].astype(int)))
    assert got == expect


def test_target_encoding_gate_and_shrinkage(spark, q, osql):
    from kafka_connect_sse_spark.operators.pipeline import TENC_SMOOTH

    df = _cross_engine(
        spark,
        q,
        osql,
        "x_target_encoding",
        SF001,
        ["orders", "customer"],
    )
    assert len(df) == 5  # mktsegments
    mu = df["global_mean"].iloc[0]
    for _, r in df.iterrows():
        # encoding sits strictly between the raw mean and the global
        # mean (proper shrinkage), closer to raw for bigger n
        lo, hi = sorted([r["raw_mean"], mu])
        assert lo - 1e-6 <= r["encoded"] <= hi + 1e-6, dict(r)
        assert abs(
            r["shrink"] - r["n_orders"] / (r["n_orders"] + TENC_SMOOTH)
        ) < 1e-6


def test_friedman_gate_and_rank_sum_identity(spark, q, osql):
    df = _cross_engine(
        spark, q, osql, "q_agg_friedman", SF001, ["events"]
    )
    k = int(df["k"].iloc[0])
    n = int(df["n_blocks"].iloc[0])
    assert len(df) == k == 5
    # rank sums over all treatments must total n·k(k+1)/2 (each block
    # hands out ranks 1..k exactly once, ties averaged) — doubled form
    assert int(df["rank_sum_x2"].sum()) == n * k * (k + 1)
    assert (df["df"] == k - 1).all()
    # statistic non-negative and the decision matches the literal table
    qstat = df["friedman_q"].iloc[0]
    crit = df["chi2_crit_95"].iloc[0]
    assert qstat >= 0
    assert bool(df["reject"].iloc[0]) == (qstat > crit)


def test_bollinger_gate_and_band_geometry(spark, q, osql):
    df = _cross_engine(
        spark, q, osql, "q_ts_bollinger", SF001, ["events"]
    )
    assert (df["upper_band"] >= df["sma"]).all()
    assert (df["lower_band"] <= df["sma"]).all()
    warm = df[df["n_win"] < 7]
    full = df[df["n_win"] == 7]
    assert warm["breakout"].isna().all()
    assert full["breakout"].notna().all()
    # flag consistent with the rounded band comparison
    for _, r in full.iterrows():
        if r["total"] > r["upper_band"]:
            assert r["breakout"] == "up"
        elif r["total"] < r["lower_band"]:
            assert r["breakout"] == "down"
        else:
            assert r["breakout"] == "in"


def test_ece_gate_and_weighted_gap_identity(spark, q, osql):
    df = _cross_engine(
        spark, q, osql, "x_ece_calibration", SF001, ["embeddings"]
    )
    assert df["n"].sum() == 500  # every vector lands in exactly one bin
    assert (df["acc"] >= 0).all() and (df["acc"] <= 1).all()
    assert (df["avg_conf"] >= 0).all() and (df["avg_conf"] <= 1).all()
    # per-bin mean confidence must fall inside the bin's span (bins
    # are floor(conf*10): [lo, lo+0.1))
    for _, r in df.iterrows():
        assert r["conf_lo"] - 1e-6 <= r["avg_conf"] < r["conf_lo"] + 0.1 + 1e-6
    # the scalar ECE is the weight-gap fold it claims to be
    ece = df["ece"].iloc[0]
    assert (df["ece"] == ece).all()
    manual = float((df["gap"] * df["weight"]).sum())
    assert abs(ece - manual) < 5e-6
    assert 0 <= ece <= 1


def test_kcore_gate_and_peel_matches_reference_simulation(spark, q, osql):
    """Cross-engine gate + an independent pure-Python peel of the same
    co-activity graph must reproduce the whole trajectory."""
    import collections

    df = _cross_engine(
        spark, q, osql, "q_graph_kcore", SF001, ["events"]
    ).sort_values("round")
    from kafka_connect_sse_spark.operators.joins import (
        KCORE_K,
        KCORE_ROUNDS,
        _coactivity_edges,
    )

    assert len(df) == KCORE_ROUNDS + 1
    # monotone non-increasing peel
    assert (df["n_nodes"].diff().dropna() <= 0).all()
    assert (df["n_edges"].diff().dropna() <= 0).all()
    # independent simulation
    edges = [
        (r["u"], r["v"])
        for r in _coactivity_edges(spark, SF001).collect()
    ]
    adj = collections.defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    nodes = set(adj)
    expect = [(len(nodes), len(edges))]
    for _ in range(KCORE_ROUNDS):
        keep = {n for n in nodes if len(adj[n] & nodes) >= KCORE_K}
        nodes = keep
        n_e = sum(len(adj[n] & nodes) for n in nodes) // 2
        expect.append((len(nodes), n_e))
    got = list(zip(df["n_nodes"].astype(int), df["n_edges"].astype(int)))
    assert got == expect
    # the fixture converges within the unroll, and the flag says so
    assert bool(df["converged"].iloc[0]) == (
        expect[-1][0] == expect[-2][0]
    )
    assert df["converged"].iloc[0]


def test_langid_kappa_consistent_with_confusion_matrix(spark, q, osql):
    df = _cross_engine(
        spark, q, osql, "x_langid_kappa", SF001, ["documents"]
    )
    assert len(df) == 1
    r = df.iloc[0]
    # recompute kappa from the already-verified confusion matrix op
    cm = q["x_langid_confusion"](spark, SF001).toPandas()
    n = int(cm["n"].sum())
    agree = int(
        cm[
            (
                (cm["lang"] == "en") & (cm["langid_pred"] == "en_like")
            )
            | ((cm["lang"] != "en") & (cm["langid_pred"] == "other"))
        ]["n"].sum()
    )
    t_en = int(cm[cm["lang"] == "en"]["n"].sum())
    p_en = int(cm[cm["langid_pred"] == "en_like"]["n"].sum())
    assert (int(r["n"]), int(r["agree"])) == (n, agree)
    assert (int(r["t_en"]), int(r["p_en"])) == (t_en, p_en)
    po = agree / n
    pe = (t_en * p_en + (n - t_en) * (n - p_en)) / (n * n)
    assert abs(r["kappa"] - (po - pe) / (1 - pe)) < 1e-6
    assert -1 <= r["kappa"] <= 1


def test_dp_quantile_gate_and_concentration(spark, q, osql):
    df = _cross_engine(
        spark, q, osql, "x_dp_quantile_release", SF001, ["lineitem"]
    )
    assert len(df) == 3
    assert df["dp_median"].between(1, 50).all()
    # at n~20k per flag the exponential mechanism's mass concentrates:
    # the release must land within one grid step of the true median
    # (this is exactly the guard that caught the pre-shift underflow,
    # where flag A released 1 against a true median of 25)
    assert (df["dp_median"] - df["true_median"]).abs().max() <= 1


def test_ttest_paired_gate_and_pandas_replication(spark, q, osql):
    df = _cross_engine(
        spark, q, osql, "q_agg_ttest_paired", SF001, ["events"]
    )
    assert len(df) == 1
    r = df.iloc[0]
    # independent replication: pandas over the raw parquet
    import pandas as pd

    ev = pd.read_parquet(f"{SF001}/events.parquet")
    ev = ev[ev.event_type.isin(["purchase", "click"])]
    cents = (ev.value * 100).round().astype("int64")
    g = ev.assign(cents=cents).groupby("user_id")
    agg = g.apply(
        lambda x: pd.Series(
            {
                "sp": x.loc[x.event_type == "purchase", "cents"].sum(),
                "np": (x.event_type == "purchase").sum(),
                "sc": x.loc[x.event_type == "click", "cents"].sum(),
                "nc": (x.event_type == "click").sum(),
            }
        ),
        include_groups=False,
    )
    both = agg[(agg["np"] > 0) & (agg["nc"] > 0)]
    d = (both.sp - both.sc).astype("int64")
    n = len(d)
    assert int(r["n_pairs"]) == n
    assert abs(r["mean_diff"] - d.mean() / 100.0) < 1e-4
    t = (d.mean()) / (d.std(ddof=1) / n**0.5)
    assert abs(r["t_stat"] - t) < 1e-4
    assert bool(r["reject_95"]) == (abs(r["t_stat"]) > 1.96)
    # paired family coherence: the t-test keeps zero diffs, wilcoxon
    # drops them — so its n can never exceed ours
    w = q["q_agg_wilcoxon_signed"](spark, SF001).toPandas()
    ncol = [c for c in w.columns if c in ("n", "n_pairs")][0]
    assert int(w[ncol].iloc[0]) <= n


def test_mmr_gate_and_python_greedy_replication(spark, q, osql):
    """Independent pure-Python greedy over the same rounded cosines
    must reproduce every pick and score."""
    import pandas as pd

    df = _cross_engine(
        spark, q, osql, "x_embed_mmr_diversify", SF001, ["embeddings"]
    ).sort_values("pick")
    from kafka_connect_sse_spark.operators.similarity import (
        MMR_K,
        MMR_LAMBDA,
        MMR_POOL,
    )

    lam = float(MMR_LAMBDA)
    emb = pd.read_parquet(f"{SF001}/embeddings.parquet")
    vecs = {
        int(r.vec_id): [float(x) for x in r.embedding]
        for r in emb.itertuples()
    }

    def cos(a, b):
        # sequential fold, the dot() accumulation order
        d = ns = nb = 0.0
        for x, y in zip(a, b):
            d += x * y
            ns += x * x
            nb += y * y
        return round(d / (ns**0.5 * nb**0.5), 6)

    qe = vecs[0]
    rel = {i: cos(v, qe) for i, v in vecs.items() if i != 0}
    pool = sorted(rel, key=lambda i: (-rel[i], i))[:MMR_POOL]
    sims = {
        (a, b): cos(vecs[a], vecs[b])
        for a in pool
        for b in pool
        if a != b
    }
    sel = [max(pool, key=lambda i: (rel[i], -i))]
    scores = [rel[sel[0]]]
    for _ in range(MMR_K - 1):
        cand = [c for c in pool if c not in sel]
        sc = {
            c: round(
                lam * rel[c]
                - (1 - lam) * max(sims[(c, s)] for s in sel),
                7,
            )
            for c in cand
        }
        nxt = max(cand, key=lambda c: (sc[c], -c))
        sel.append(nxt)
        scores.append(sc[nxt])
    assert list(df["vec_id"].astype(int)) == sel
    for got, exp in zip(df["mmr_score"], scores):
        assert abs(got - exp) < 1e-9
    # diversification actually happened: the MMR set is not simply the
    # top-K by raw relevance
    topk = sorted(rel, key=lambda i: (-rel[i], i))[:MMR_K]
    assert set(sel) != set(topk)


def test_streaming_bollinger_gate_and_alert_semantics(spark, q, osql):
    df = _cross_engine(
        spark, q, osql, "s_bollinger_alert", SF001, ["events"]
    )
    assert len(df) > 0  # the fixture produces alerts
    assert set(df["direction"]) <= {"up", "down"}
    # every alert is genuinely outside its band: n vs sma ± 2sd
    for _, r in df.iterrows():
        lo = r["sma"] - 2 * r["sd"]
        hi = r["sma"] + 2 * r["sd"]
        if r["direction"] == "up":
            assert r["n"] > hi - 1e-4
        else:
            assert r["n"] < lo + 1e-4
    # alerts must be a strict subset of all completed windows
    ev = q["s_window_tumbling"](spark, SF001).toPandas()
    assert len(df) < len(ev)


def test_gumbel_fit_gate_and_moment_identities(spark, q, osql):
    df = _cross_engine(
        spark, q, osql, "q_agg_gumbel_fit", SF001, ["events"]
    )
    assert len(df) == 5
    for _, r in df.iterrows():
        assert r["beta_hat"] > 0
        # mu_hat = mean - gamma*beta (method-of-moments identity)
        assert abs(
            r["mu_hat"] - (r["mean_max"] - 0.5772156649015329 * r["beta_hat"])
        ) < 1e-4
        # the 30-block return level must exceed the location parameter
        # (ln(-ln(1-1/30)) < 0) and, for a 30-day fixture, sit above
        # the mean of the daily maxima
        assert r["return_level_30"] > r["mu_hat"]
        assert r["return_level_30"] > r["mean_max"]


def test_poisson_rate_gate_and_exposure_normalization(spark, q, osql):
    df = _cross_engine(
        spark, q, osql, "q_agg_poisson_rate_test", SF001, ["events"]
    )
    r = df.iloc[0]
    assert r["days_weekend"] + r["days_weekday"] == 30
    assert abs(
        r["rate_weekend"] - r["k_weekend"] / r["days_weekend"]
    ) < 1e-6
    assert abs(
        r["rate_weekday"] - r["k_weekday"] / r["days_weekday"]
    ) < 1e-6
    assert bool(r["reject_95"]) == (abs(r["z"]) > 1.96)
