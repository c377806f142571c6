#!/usr/bin/env python
"""Generate sf1 test data (10x sf0.1) for the scale-proof bench run
(VERDICT r8 #4).

/root/testdata is read-only and the driver provides sf<=0.1 only, so
this writes a seeded, schema- and domain-faithful 10x scale-up to
sf1_data/ in the repo: same parquet physical schemas as the driver
files (int32 where the driver has int32, timestamp[us], list<float>),
same member-key domains the catalogs cut on (region keys 0-4,
NATION_i with n_regionkey = key % 5, Brand#1..25, the five market
segments, event types, doc langs/sources), and the same structural
properties the extension queries need (exact-duplicate and near-
duplicate documents for d01/d09, ~4 lineitems per order, Jan-2024
event stream).  Marginal distributions are approximations of the
sf0.1 observables, which is sufficient for a wall-clock scaling test;
value-level correctness stays pinned by the sf0.01 oracle gate.

Usage: python scripts/gen_sf1.py [out_dir]   (default: <repo>/sf1_data)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = 10  # x sf0.1

N_CUST = 15_000 * SF
N_SUPP = 1_000 * SF
N_PART = 20_000 * SF
N_ORD = 150_000 * SF
N_LINE = 600_000 * SF
N_EV = 100_000 * SF
N_DOC = 5_000 * SF
N_EMB = 2_000 * SF

SEGMENTS = ["AUTOMOBILE", "FURNITURE", "MACHINERY", "HOUSEHOLD",
            "BUILDING"]
PTYPES = ["ECONOMY", "LARGE", "STANDARD", "MEDIUM", "SMALL", "PROMO"]
PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
LANGS = ["en", "de", "fr", "es", "zh"]
VOCAB = ("batch part spark line column order small sort fast value "
         "scan hash slow group agg filter query big key window row "
         "table stream merge data a vector join scale plan shuffle "
         "stage tuple page block index cache disk net").split()


def _write(out: str, name: str, cols: dict, schema: pa.Schema) -> None:
    pq.write_table(pa.table(cols, schema=schema),
                   os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {len(next(iter(cols.values())))} rows")


def main(out: str) -> None:
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    us = lambda arr: arr.astype("datetime64[us]")
    day0 = np.datetime64("1995-01-01")

    _write(out, "region",
           {"r_regionkey": np.arange(5, dtype=np.int64),
            "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE",
                       "MIDDLE EAST"]},
           pa.schema([("r_regionkey", pa.int64()),
                      ("r_name", pa.string())]))

    _write(out, "nation",
           {"n_nationkey": np.arange(25, dtype=np.int64),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": (np.arange(25) % 5).astype(np.int64)},
           pa.schema([("n_nationkey", pa.int64()),
                      ("n_name", pa.string()),
                      ("n_regionkey", pa.int64())]))

    _write(out, "customer",
           {"c_custkey": np.arange(N_CUST, dtype=np.int64),
            "c_name": [f"Customer#{i:09d}" for i in range(N_CUST)],
            "c_nationkey": rng.integers(0, 25, N_CUST).astype(np.int32),
            "c_acctbal": np.round(rng.uniform(-1000, 10000, N_CUST), 2),
            "c_mktsegment": np.array(SEGMENTS)[
                rng.integers(0, 5, N_CUST)]},
           pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string()),
                      ("c_nationkey", pa.int32()),
                      ("c_acctbal", pa.float64()),
                      ("c_mktsegment", pa.string())]))

    _write(out, "supplier",
           {"s_suppkey": np.arange(N_SUPP, dtype=np.int64),
            "s_name": [f"Supplier#{i:09d}" for i in range(N_SUPP)],
            "s_nationkey": rng.integers(0, 25, N_SUPP).astype(np.int32),
            "s_acctbal": np.round(rng.uniform(-1000, 10000, N_SUPP), 2)},
           pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string()),
                      ("s_nationkey", pa.int32()),
                      ("s_acctbal", pa.float64())]))

    adjs = ["large", "hot", "small", "cold", "dim", "light", "dark",
            "fast", "slow", "new"]
    nouns = ["ring", "bolt", "case", "disk", "wire", "pipe", "gear",
             "plate", "lens", "coil"]
    _write(out, "part",
           {"p_partkey": np.arange(N_PART, dtype=np.int64),
            "p_name": [f"{adjs[i % 10]} {nouns[(i // 10) % 10]}"
                       for i in range(N_PART)],
            "p_brand": [f"Brand#{1 + i % 25}" for i in range(N_PART)],
            "p_type": np.array(PTYPES)[rng.integers(0, 6, N_PART)],
            "p_size": rng.integers(1, 51, N_PART).astype(np.int64),
            "p_retailprice": np.round(
                900.0 + (np.arange(N_PART) % 1000) / 10.0, 1)},
           pa.schema([("p_partkey", pa.int64()), ("p_name", pa.string()),
                      ("p_brand", pa.string()), ("p_type", pa.string()),
                      ("p_size", pa.int64()),
                      ("p_retailprice", pa.float64())]))

    odate = day0 + rng.integers(0, 2404, N_ORD).astype("timedelta64[D]")
    _write(out, "orders",
           {"o_orderkey": np.arange(N_ORD, dtype=np.int64),
            "o_custkey": rng.integers(0, N_CUST, N_ORD).astype(np.int64),
            "o_orderstatus": np.array(["O", "F", "P"])[
                rng.integers(0, 3, N_ORD)],
            "o_totalprice": np.round(
                rng.uniform(1000, 500000, N_ORD), 2),
            "o_orderdate": us(odate),
            "o_orderpriority": np.array(PRIOS)[
                rng.integers(0, 5, N_ORD)]},
           pa.schema([("o_orderkey", pa.int64()),
                      ("o_custkey", pa.int64()),
                      ("o_orderstatus", pa.string()),
                      ("o_totalprice", pa.float64()),
                      ("o_orderdate", pa.timestamp("us")),
                      ("o_orderpriority", pa.string())]))

    sdate = day0 + rng.integers(1, 2500, N_LINE).astype("timedelta64[D]")
    _write(out, "lineitem",
           {"l_orderkey": rng.integers(0, N_ORD, N_LINE).astype(np.int64),
            "l_partkey": rng.integers(0, N_PART, N_LINE).astype(np.int64),
            "l_suppkey": rng.integers(0, N_SUPP, N_LINE).astype(np.int64),
            "l_linenumber": rng.integers(1, 8, N_LINE).astype(np.int32),
            "l_quantity": rng.integers(1, 51, N_LINE).astype(np.float64),
            "l_extendedprice": np.round(
                rng.uniform(900, 100000, N_LINE), 2),
            "l_discount": rng.integers(0, 11, N_LINE) / 100.0,
            "l_tax": rng.integers(0, 9, N_LINE) / 100.0,
            "l_returnflag": np.array(["N", "A", "R"])[
                rng.integers(0, 3, N_LINE)],
            "l_linestatus": np.array(["O", "F"])[
                rng.integers(0, 2, N_LINE)],
            "l_shipdate": us(sdate)},
           pa.schema([("l_orderkey", pa.int64()),
                      ("l_partkey", pa.int64()),
                      ("l_suppkey", pa.int64()),
                      ("l_linenumber", pa.int32()),
                      ("l_quantity", pa.float64()),
                      ("l_extendedprice", pa.float64()),
                      ("l_discount", pa.float64()),
                      ("l_tax", pa.float64()),
                      ("l_returnflag", pa.string()),
                      ("l_linestatus", pa.string()),
                      ("l_shipdate", pa.timestamp("us"))]))

    ev0 = np.datetime64("2024-01-01T00:00:00.000000")
    ts = np.sort(ev0 + rng.integers(
        0, 30 * 86_400_000_000, N_EV).astype("timedelta64[us]"))
    _write(out, "events",
           {"event_id": np.arange(N_EV, dtype=np.int64),
            "ts": us(ts),
            "user_id": rng.integers(0, 1500 * SF, N_EV).astype(np.int64),
            "event_type": np.array(EVENT_TYPES)[
                rng.choice(5, N_EV, p=[.35, .3, .1, .1, .15])],
            "value": np.round(rng.exponential(80, N_EV), 2),
            "props": [f'{{"k": {k}}}'
                      for k in rng.integers(0, 100, N_EV)]},
           pa.schema([("event_id", pa.int64()),
                      ("ts", pa.timestamp("us")),
                      ("user_id", pa.int64()),
                      ("event_type", pa.string()),
                      ("value", pa.float64()),
                      ("props", pa.string())]))

    # documents: ~96% unique, ~2% exact duplicates of earlier docs
    # (d01), ~2% near-duplicates (one word substituted; d03/d04/d09)
    n_base = int(N_DOC * 0.96)
    vocab = np.array(VOCAB)
    lens = rng.integers(8, 101, n_base)
    texts = [" ".join(vocab[rng.integers(0, len(vocab), n)])
             for n in lens]
    dup_src = rng.integers(0, n_base, N_DOC - n_base)
    for j, src in enumerate(dup_src):
        t = texts[src]
        if j % 2:                      # near-dup: swap one word
            w = t.split()
            w[int(rng.integers(0, len(w)))] = str(
                vocab[int(rng.integers(0, len(vocab)))])
            t = " ".join(w)
        texts.append(t)
    _write(out, "documents",
           {"doc_id": np.arange(N_DOC, dtype=np.int64),
            "text": texts,
            "lang": np.array(LANGS)[
                rng.choice(5, N_DOC, p=[.4, .2, .15, .15, .1])],
            "source": [f"src{i}" for i in rng.integers(0, 20, N_DOC)],
            "n_chars": np.array([len(t) for t in texts],
                                dtype=np.int64)},
           pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                      ("lang", pa.string()), ("source", pa.string()),
                      ("n_chars", pa.int64())]))

    emb = rng.normal(0.0, 0.12, (N_EMB, 64)).clip(-0.4, 0.4) \
             .astype(np.float32)
    _write(out, "embeddings",
           {"vec_id": np.arange(N_EMB, dtype=np.int64),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.ravel(), type=pa.float32()), 64).cast(
                pa.list_(pa.float32())),
            "label": rng.integers(0, 10, N_EMB).astype(np.int32)},
           pa.schema([("vec_id", pa.int64()),
                      ("embedding", pa.list_(pa.float32())),
                      ("label", pa.int32())]))


if __name__ == "__main__":
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "sf1_data")
    main(out_dir)
    print(f"sf1 data written to {out_dir}")
