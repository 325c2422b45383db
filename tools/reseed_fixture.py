"""Reseeded regeneration of the driver's synthetic fixture (VERDICT r7
item 6).

The driver's testdata (TESTDATA.md, seed=42) is read-only and its
generator lives driver-side, so oracle-vs-engine agreement has only
ever been exercised on ONE draw of the data.  This tool regenerates a
structurally faithful fixture — same schemas, dtypes, key ranges,
category vocabularies, date windows, and text/embedding construction
(31-word corpus vocabulary, unit-norm dim-64 near-random embeddings) —
from a DIFFERENT seed, so the full oracle sweep can prove no oracle has
quietly overfit to seed-42 idiosyncrasies (a boundary value sitting on
a rounding edge, a recall floor holding only on one blob draw, ...).

Distributions were measured off /root/testdata/sf0.01 (round 8); every
literal the registered queries depend on (NATION_i names, Brand#N,
ECONOMY/…, 'small'/'red' part-name words, 1-URGENT/2-HIGH priorities,
order status F, 1996 ship dates, dense distinct event_id, vec_id<10
query set) is reproduced by construction, with fresh draws everywhere
else.

Usage:
    python tools/reseed_fixture.py OUT_DIR [SEED] [--sf SF]
    python tools/check_oracles.py OUT_DIR          # the actual test
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
P_ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
P_NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
P_TYPE = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
RETFLAGS = ["A", "N", "R"]
LINESTATUS = ["F", "O"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "zh", "es", "de", "fr"]
LANG_P = [0.44, 0.14, 0.14, 0.14, 0.14]
DOC_VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
EMB_DIM = 64
N_LABELS = 10


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))


def generate(out_dir: str, seed: int, sf: float = 0.01) -> None:
    rng = np.random.RandomState(seed)
    os.makedirs(out_dir, exist_ok=True)
    scale = sf / 0.01  # measured counts below are the sf0.01 fixture's
    n_cust, n_supp, n_part = int(1500 * scale), int(100 * scale), int(2000 * scale)
    n_ord, n_li = int(15000 * scale), int(60000 * scale)
    # events/docs scale linearly; embeddings scale SUBLINEARLY in the
    # driver's generator (500 at sf0.001 AND sf0.01, 2000 at sf0.1) —
    # the first --sf=0.1 reseed run used 500*scale=5000 and immediately
    # broke three fixture-count assumptions (near-dup router exact
    # branch, IVF-PQ retention at rerank depth, recursive-spine depth
    # via the events window below), so the counts now mirror the
    # measured driver fixtures exactly.
    n_ev, n_doc = int(10000 * scale), int(500 * scale)
    n_emb = 500 if scale <= 1 else int(500 * scale * 0.4)

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.randint(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": [SEGMENTS[i] for i in rng.randint(0, 5, n_cust)],
    }))
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.randint(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [
            f"{P_ADJ[a]} {P_NOUN[b]}"
            for a, b in zip(rng.randint(0, 8, n_part), rng.randint(0, 8, n_part))
        ],
        "p_brand": [f"Brand#{i}" for i in rng.randint(1, 26, n_part)],
        "p_type": [P_TYPE[i] for i in rng.randint(0, 6, n_part)],
        "p_size": pa.array(rng.randint(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + (np.arange(n_part) % 1000) / 10.0, 2),
    }))

    day = np.timedelta64(1, "D")
    o_date = np.datetime64("1995-01-01") + rng.randint(0, 2404, n_ord) * day
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.randint(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": [STATUSES[i] for i in rng.randint(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": pa.array(o_date.astype("datetime64[us]")),
        "o_orderpriority": [PRIORITIES[i] for i in rng.randint(0, 5, n_ord)],
    }))
    l_okey = rng.randint(0, n_ord, n_li)
    # ship 1-120 days after the (per-order) order date — keeps the
    # Q21 lateness predicate (> o_orderdate + 30 days) two-sided
    l_ship = o_date[l_okey] + rng.randint(1, 121, n_li) * day
    qty = rng.randint(1, 51, n_li).astype(float)
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_okey, pa.int64()),
        "l_partkey": pa.array(rng.randint(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.randint(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.randint(1, 8, n_li), pa.int32()),
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * rng.uniform(900, 2100, n_li), 2),
        "l_discount": np.round(rng.randint(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.randint(0, 9, n_li) / 100.0, 2),
        "l_returnflag": [RETFLAGS[i] for i in rng.randint(0, 3, n_li)],
        "l_linestatus": [LINESTATUS[i] for i in rng.randint(0, 2, n_li)],
        "l_shipdate": pa.array(l_ship.astype("datetime64[us]")),
    }))

    # events: dense distinct event_id, ~30 days of exponential arrivals
    # AT EVERY SF (the driver fixture keeps the window fixed and packs
    # more events into it; a fixed per-event gap stretched --sf=0.1 to
    # 300 days and overflowed the recursive date spine's default depth)
    gaps_us = rng.exponential(259e6 / max(scale, 1e-9), n_ev).astype("int64")
    ts = np.datetime64("2024-01-01T00:00:00", "us") + np.cumsum(gaps_us) * np.timedelta64(1, "us")
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array(rng.randint(0, max(2, int(150 * scale)), n_ev), pa.int64()),
        "event_type": [EVENT_TYPES[i] for i in rng.randint(0, 5, n_ev)],
        "value": np.round(np.clip(rng.exponential(50.0, n_ev), 0.01, None), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.randint(0, 100, n_ev)],
    }))

    # documents: 31-word vocab, 10-110 tokens, plus ~6% PLANTED
    # near-duplicates (a copy of an earlier doc with 1-3 tokens
    # resampled) so the minhash/LSH/connected-components surfaces have
    # true pairs to find, like the driver's fixture (25 minhash pairs
    # at sf0.01 seed 42)
    texts = [
        " ".join(
            DOC_VOCAB[j] for j in rng.randint(0, len(DOC_VOCAB), rng.randint(10, 111))
        )
        for _ in range(n_doc)
    ]
    for i in rng.choice(np.arange(n_doc // 2, n_doc), max(1, n_doc // 16), replace=False):
        toks = texts[int(rng.randint(0, n_doc // 2))].split(" ")
        for _ in range(rng.randint(1, 4)):
            toks[int(rng.randint(0, len(toks)))] = DOC_VOCAB[
                int(rng.randint(0, len(DOC_VOCAB)))
            ]
        texts[int(i)] = " ".join(toks)
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": [LANGS[i] for i in rng.choice(5, n_doc, p=LANG_P)],
        "source": [f"src{i % 20}" for i in range(n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: unit-norm near-random vectors (the measured fixture
    # has no meaningful blob signal — label centroid norms match the
    # 1/sqrt(n) of pure noise), labels uniform, vec_id 0..n-1 so the
    # ANN query set (vec_id < 10) exists by construction
    X = rng.normal(0, 1, (n_emb, EMB_DIM))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array(
            [row.astype(np.float32) for row in X], pa.list_(pa.float32())
        ),
        "label": pa.array(rng.randint(0, N_LABELS, n_emb), pa.int32()),
    }))


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    # a mis-typed flag must be an ERROR, not a silently-default sf:
    # `--sf 0.1` (space form) once generated an sf0.01 fixture that
    # nearly passed as the sf0.1-SCALE gate — only the row count gave
    # it away.  Same rationale as scale_sweep's --only name check.
    bad = [a for a in flags if not a.startswith("--sf=")]
    if bad or len(args) > 2 or len(flags) > 1:
        reason = bad or args[2:] or [f"repeated flags {flags}"]
        print(
            f"error: unrecognized arguments {reason} — usage: "
            "reseed_fixture.py OUT_DIR [SEED] [--sf=SF]",
            file=sys.stderr,
        )
        sys.exit(2)
    out = args[0] if args else ".reseed/sf0.01"
    seed = int(args[1]) if len(args) > 1 else 777
    sf = 0.01
    for a in flags:
        # a malformed VALUE (--sf=, --sf=O.1) is the same usage-error
        # class as a mis-typed flag name — never an uncaught traceback
        try:
            sf = float(a.split("=", 1)[1])
        except ValueError:
            print(
                f"error: malformed {a!r} — usage: "
                "reseed_fixture.py OUT_DIR [SEED] [--sf=SF]",
                file=sys.stderr,
            )
            sys.exit(2)
    generate(out, seed, sf)
    print(f"wrote reseeded fixture (seed={seed}, sf={sf}) to {out}")
