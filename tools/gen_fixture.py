"""Deterministic fixture generator for scale tiers above the driver's.

The driver ships read-only parquet fixtures at sf0.001/0.01/0.1
(/root/testdata, TESTDATA.md).  SCALE.md's cross-SF scaling evidence
needs a tier where the data-dependent term dominates locally (VERDICT r4
item 2), so this tool synthesizes an sf1 (or any --sf) tier that matches
the driver fixtures' SCHEMAS (pyarrow-verified, timestamps us) and
empirical DISTRIBUTIONS (profiled from sf0.1):

  table       rows @ sf1   model
  region      5            fixed (TPC-H style)
  nation      25           fixed, NATION_i, region i%5
  customer    150k * sf    uniform nation/segment, acctbal U(-1000,10000)
  supplier    10k * sf     same shape
  part        200k * sf    adj+noun name, Brand#1..25, 6 types,
                           retail = 900 + (key % 1000)/10  (exact rule)
  orders      1.5M * sf    seq keys, U custkey, date U(1995..2001-08)
  lineitem    6M * sf      U orderkey (some orders empty — as shipped),
                           qty int 1..50, price U(900,105k) 2dp
  events      1M * sf      ts = cumsum(Exp(30d/N)) from 2024-01-01,
                           value Exp(mean 50) 2dp, props {"k": 0..99}
  documents   50k * sf     10..100 tokens drawn Zipf(s=1.07) from a
                           50k-word vocabulary (round 11 — the old
                           30-word uniform vocab made every shingle
                           hot at sf10; see zipf_vocab()); ~8% carry a
                           12-token boilerplate header (hot postings);
                           5% near-dups: ORDERED copy of a >=60-token
                           base with one 'dup' token inserted (keeps
                           shingle-Jaccard >= ~0.89, the LSH
                           high-recall regime); ~0.16% exact dups
  embeddings  8k @ sf1     unit-norm gaussian float32[64], label 0..9
                           (sub-linear like the driver: 500@0.01,
                           2000@0.1 — 4x per decade)

Everything is seeded (PCG64, per-table seeds off --seed) — same flags,
bit-identical output.  Correctness at this tier is still Spark-vs-DuckDB
on the SAME files, so the tier proves scaling, not fixture fidelity; the
distribution match just keeps every operator's selectivities realistic
(hardcoded date ranges, category values, near-dup structure all live).

Usage:
    python tools/gen_fixture.py --sf 1 --out /root/repo/testdata/sf1
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

US = 1_000_000
DAY_US = 86_400 * US

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]

# --- Zipfian document vocabulary (round 11, VERDICT r10 item 3) ---
# The original 30-word VOCAB makes EVERY 3-shingle hot at sf10 density
# (uniform df ~150, max 516 — BENCH_sf10_r10.json), a df distribution
# no real corpus has: posting-list cost attributions measured on it
# were meaningless and the guarded containment run was vacuous.  Real
# text is Zipfian: rank-k word probability ∝ 1/k^s with s ≈ 1.07, so
# most shingles are unique (df=1) and a short head is ubiquitous.
# Words are syllable-encodings of their rank (head words short, tail
# words long — also text-like).  Boilerplate headers (site chrome) on
# ~8% of docs supply the genuinely-hot posting lists the containment
# auto-knee cap exists to drop.
ZIPF_V = 50_000
ZIPF_S = 1.07
_SYL = ["ba", "ce", "di", "fo", "gu", "ha", "je", "ki", "lo", "mu",
        "na", "pe", "qi", "ro", "su", "ta", "ve", "wi", "xo", "zu"]


def zipf_vocab() -> np.ndarray:
    words = []
    for k in range(ZIPF_V):
        w, k2 = _SYL[k % 20], k // 20
        while k2:
            w += _SYL[k2 % 20]
            k2 //= 20
        words.append(w)
    return np.array(words)


def zipf_cdf() -> np.ndarray:
    w = 1.0 / np.arange(1, ZIPF_V + 1) ** ZIPF_S
    return np.cumsum(w / w.sum())


BOILER_FRAC = 0.08  # fraction of fresh docs carrying a boilerplate header
BOILERPLATE = [
    " ".join(f"hdr{t}tok{j}" for j in range(12)) for t in range(4)
]
ADJS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]

EPOCH_1995 = np.datetime64("1995-01-01", "us").astype("int64")
EPOCH_2001_08 = np.datetime64("2001-08-01", "us").astype("int64")
EPOCH_2001_11 = np.datetime64("2001-11-04", "us").astype("int64")
EPOCH_2024 = np.datetime64("2024-01-01", "us").astype("int64")


def _ts(col: np.ndarray) -> pa.Array:
    return pa.array(col.astype("int64"), type=pa.timestamp("us"))


def _write(out: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out, f"{name}.parquet")
    pq.write_table(table, path)
    print(f"  {name}: {table.num_rows} rows -> {path}")


def gen_dims(out: str) -> None:
    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))


def gen_customer(out: str, n: int, seed: int) -> None:
    r = np.random.default_rng(seed)
    _write(out, "customer", pa.table({
        "c_custkey": np.arange(n, dtype="int64"),
        "c_name": [f"Customer#{k:09d}" for k in range(n)],
        "c_nationkey": pa.array(r.integers(0, 25, n), pa.int32()),
        "c_acctbal": np.round(r.uniform(-1000, 10000, n), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[r.integers(0, 5, n)]),
    }))


def gen_supplier(out: str, n: int, seed: int) -> None:
    r = np.random.default_rng(seed)
    _write(out, "supplier", pa.table({
        "s_suppkey": np.arange(n, dtype="int64"),
        "s_name": [f"Supplier#{k:09d}" for k in range(n)],
        "s_nationkey": pa.array(r.integers(0, 25, n), pa.int32()),
        "s_acctbal": np.round(r.uniform(-1000, 10000, n), 2),
    }))


def gen_part(out: str, n: int, seed: int) -> None:
    r = np.random.default_rng(seed)
    keys = np.arange(n, dtype="int64")
    adj = np.array(ADJS)[r.integers(0, len(ADJS), n)]
    noun = np.array(NOUNS)[r.integers(0, len(NOUNS), n)]
    _write(out, "part", pa.table({
        "p_partkey": keys,
        "p_name": pa.array([f"{a} {b}" for a, b in zip(adj, noun)]),
        "p_brand": pa.array([f"Brand#{i}" for i in r.integers(1, 26, n)]),
        "p_type": pa.array(np.array(PTYPES)[r.integers(0, 6, n)]),
        "p_size": pa.array(r.integers(1, 51, n), pa.int32()),
        "p_retailprice": 900.0 + (keys % 1000) / 10.0,
    }))


def gen_orders(out: str, n: int, n_cust: int, seed: int) -> None:
    r = np.random.default_rng(seed)
    _write(out, "orders", pa.table({
        "o_orderkey": np.arange(n, dtype="int64"),
        "o_custkey": r.integers(0, n_cust, n),
        "o_orderstatus": pa.array(np.array(["O", "P", "F"])[r.integers(0, 3, n)]),
        "o_totalprice": np.round(r.uniform(1000, 500000, n), 2),
        "o_orderdate": _ts(r.integers(EPOCH_1995, EPOCH_2001_08, n) // DAY_US * DAY_US),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[r.integers(0, 5, n)]),
    }))


def gen_lineitem(out: str, n: int, n_ord: int, n_part: int, n_supp: int,
                 seed: int) -> None:
    r = np.random.default_rng(seed)
    path = os.path.join(out, "lineitem.parquet")
    schema = pa.schema([
        ("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
        ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
        ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
        ("l_discount", pa.float64()), ("l_tax", pa.float64()),
        ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
        ("l_shipdate", pa.timestamp("us")),
    ])
    with pq.ParquetWriter(path, schema) as w:
        done = 0
        while done < n:
            m = min(1_000_000, n - done)
            w.write_table(pa.table({
                "l_orderkey": r.integers(0, n_ord, m),
                "l_partkey": r.integers(0, n_part, m),
                "l_suppkey": r.integers(0, n_supp, m),
                "l_linenumber": pa.array(r.integers(1, 8, m), pa.int32()),
                "l_quantity": r.integers(1, 51, m).astype("float64"),
                "l_extendedprice": np.round(r.uniform(900, 105000, m), 2),
                "l_discount": np.round(r.uniform(0, 0.1, m), 2),
                "l_tax": np.round(r.uniform(0, 0.08, m), 2),
                "l_returnflag": pa.array(np.array(["A", "N", "R"])[r.integers(0, 3, m)]),
                "l_linestatus": pa.array(np.array(["O", "F"])[r.integers(0, 2, m)]),
                "l_shipdate": _ts(r.integers(EPOCH_1995 + DAY_US, EPOCH_2001_11, m) // DAY_US * DAY_US),
            }, schema=schema))
            done += m
    print(f"  lineitem: {n} rows -> {path}")


def gen_events(out: str, n: int, n_users: int, seed: int) -> None:
    r = np.random.default_rng(seed)
    gaps = r.exponential(30 * DAY_US / n, n)
    ts = EPOCH_2024 + np.cumsum(gaps).astype("int64")
    ks = r.integers(0, 100, n)
    _write(out, "events", pa.table({
        "event_id": np.arange(n, dtype="int64"),
        "ts": _ts(ts),
        "user_id": r.integers(0, n_users, n),
        "event_type": pa.array(np.array(EVENT_TYPES)[r.integers(0, 5, n)]),
        "value": np.round(r.exponential(50.0, n), 2),
        "props": pa.array([f'{{"k": {k}}}' for k in ks]),
    }))


def gen_documents(out: str, n: int, seed: int) -> None:
    r = np.random.default_rng(seed)
    vocab = zipf_vocab()
    cdf = zipf_cdf()
    texts: list[str] = []
    langs: list[str] = []
    long_ids: list[int] = []  # near-dup base candidates (>= 60 tokens)
    for i in range(n):
        u = r.uniform()
        if long_ids and u < 0.05:
            # near-dup of an earlier LONG doc: ORDERED copy with one
            # 'dup' token inserted.  Insertion (not shuffle) preserves
            # 3-gram shingle overlap, and restricting bases to >= 60
            # tokens pins planted pairs at shingle-Jaccard >= ~0.89 —
            # the banded-LSH high-recall regime the driver fixture also
            # sits in (its measured min J is 0.889;
            # tests/test_minhash_recall.py documents the analytic bound)
            base = long_ids[int(r.integers(0, len(long_ids)))]
            toks = texts[base].split(" ")
            toks.insert(int(r.integers(0, len(toks) + 1)), "dup")
            texts.append(" ".join(toks))
            langs.append(langs[base])
        elif i > 50 and u < 0.0516:
            # exact duplicate text (~0.16%)
            base = int(r.integers(0, i))
            texts.append(texts[base])
            langs.append(langs[base])
        else:
            nw = int(r.integers(10, 101))
            # Zipf draws via inverse-CDF (searchsorted, not choice(p=..)
            # which would rebuild the cumulative per call)
            body = " ".join(vocab[np.searchsorted(cdf, r.random(nw))])
            if r.uniform() < BOILER_FRAC:
                # site-chrome header: the hot-posting-list source;
                # dup branches copy base text wholesale, inheriting it
                body = (
                    BOILERPLATE[int(r.integers(0, len(BOILERPLATE)))]
                    + " " + body
                )
            texts.append(body)
            langs.append(LANGS[int(r.choice(len(LANGS), p=LANG_P))])
            if nw >= 60:
                long_ids.append(i)
    _write(out, "documents", pa.table({
        "doc_id": np.arange(n, dtype="int64"),
        "text": texts,
        "lang": langs,
        "source": pa.array([f"src{int(s)}" for s in r.integers(0, 20, n)]),
        "n_chars": np.array([len(t) for t in texts], dtype="int64"),
    }))


def gen_embeddings(out: str, n: int, seed: int) -> None:
    r = np.random.default_rng(seed)
    v = r.standard_normal((n, 64)).astype("float32")
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    _write(out, "embeddings", pa.table({
        "vec_id": np.arange(n, dtype="int64"),
        "embedding": pa.array(list(v), pa.list_(pa.float32())),
        "label": pa.array(r.integers(0, 10, n), pa.int32()),
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument(
        "--documents", type=int, default=None,
        help="override document count (the near-dup ORACLES are all-pairs "
        "by design; cap this if the DuckDB side must stay tractable)",
    )
    ap.add_argument(
        "--only", default=None,
        help="regenerate a single table (e.g. 'documents') in place — "
        "per-table seeds make every other table bit-identical anyway",
    )
    a = ap.parse_args()
    out = a.out or f"/root/repo/testdata/sf{a.sf:g}"
    os.makedirs(out, exist_ok=True)
    sf = a.sf
    n_docs = a.documents if a.documents is not None else int(50_000 * sf)
    # embeddings grow 4x per 10x sf (driver pattern: 500@.01, 2000@.1)
    n_emb = int(round(2000 * 4 ** np.log10(sf / 0.1)))
    print(f"generating sf{sf:g} -> {out}"
          + (f" (only {a.only})" if a.only else ""))
    gens = {
        "dims": lambda: gen_dims(out),
        "customer": lambda: gen_customer(out, int(150_000 * sf), a.seed + 1),
        "supplier": lambda: gen_supplier(out, int(10_000 * sf), a.seed + 2),
        "part": lambda: gen_part(out, int(200_000 * sf), a.seed + 3),
        "orders": lambda: gen_orders(
            out, int(1_500_000 * sf), int(150_000 * sf), a.seed + 4),
        "lineitem": lambda: gen_lineitem(
            out, int(6_000_000 * sf), int(1_500_000 * sf),
            int(200_000 * sf), int(10_000 * sf), a.seed + 5),
        "events": lambda: gen_events(
            out, int(1_000_000 * sf), max(int(15_000 * sf), 1), a.seed + 6),
        "documents": lambda: gen_documents(out, n_docs, a.seed + 7),
        "embeddings": lambda: gen_embeddings(out, n_emb, a.seed + 8),
    }
    for name, fn in gens.items():
        if a.only is None or name == a.only:
            fn()
    with open(os.path.join(out, "MANIFEST.json"), "w") as f:
        json.dump({"sf": sf, "seed": a.seed, "documents": n_docs,
                   "embeddings": n_emb}, f)
    print("done")


if __name__ == "__main__":
    main()
