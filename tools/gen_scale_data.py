"""Deterministic scale-data generator for the measured scale-up run
(VERDICT r4 #1).

The driver provides testdata only up to sf0.1; validating the 100x
scale claim needs a measured multi-SF data point. This generator
reproduces the driver tables' observable generative process — same
schemas, value domains, and distribution shapes, measured from
/root/testdata (documented per column below) — at any SF, so
per-query timing ratios between two SFs of THIS generator are a clean
scaling measurement (same process, 10x the rows).

It does NOT try to be byte-identical to the driver data (seeds are
ours); correctness at generated SFs is still pinned by the same
DuckDB oracles, which are data-independent statements.

Row counts scale as in the driver data (TPC-H proportions):
customer 150k/SF, supplier 10k/SF, part 200k/SF, orders 1.5M/SF,
lineitem ~Poisson(4)/order (≈6M/SF), events 1M/SF over 15k/SF users,
documents 50k/SF, embeddings 20k/SF; region/nation fixed dims.

Usage: python tools/gen_scale_data.py <sf> <out_dir>
e.g.   python tools/gen_scale_data.py 1.0 scaledata/sf1
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# measured from /root/testdata/sf0.1 (see SCALE.md "measured scale-up")
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
MKTSEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
P_ADJ = ["large", "hot", "blue", "old", "cold", "new", "red", "small"]
P_NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
DOC_VOCAB = [  # the 31-word vocabulary observed at every driver SF
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_W = [0.41, 0.15, 0.15, 0.15, 0.14]
N_SOURCES = 20
DUP_RATE = 0.0016  # extra exact-copy docs (8/5000 observed at sf0.1)

EPOCH = np.datetime64("1970-01-01", "us")
ORDER_D0 = (np.datetime64("1995-01-01") - np.datetime64("1970-01-01")).astype(int)
ORDER_DAYS = (np.datetime64("2001-08-01") - np.datetime64("1995-01-01")).astype(int)
EV_T0 = (np.datetime64("2024-01-01T00:00:00") - EPOCH).astype("timedelta64[us]").astype(int)
EV_SPAN_US = 30 * 86400 * 10**6  # events span 30 days of 2024-01


def _days_to_us(days: np.ndarray) -> pa.Array:
    return pa.array((days.astype("int64") * 86400 * 10**6), type=pa.timestamp("us"))


# rows per parquet file: a 100 TB table is thousands of files, never
# one — single-file fixtures serialize map-only scans to ONE Spark
# task (no byte-range split pays off at these sizes), which showed up
# as fake 13-28x "super-linear scaling" for linear operators in the
# first r5 sweep. Sized so sf0.1 gets 2-4 files and sf1 gets 10-40
# per scaling table.
ROWS_PER_FILE = {
    "customer": 50_000, "supplier": 5_000, "part": 50_000,
    "orders": 200_000, "lineitem": 400_000, "events": 100_000,
    "documents": 10_000, "embeddings": 10_000,
}


def _write(out_dir: str, name: str, cols: dict) -> None:
    table = pa.table(cols)
    per = ROWS_PER_FILE.get(name)
    if per is None or table.num_rows <= per:
        pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
        print(f"  {name}: {table.num_rows} rows (1 file)")
        return
    # Spark reads `name.parquet` as a directory of part files
    d = os.path.join(out_dir, f"{name}.parquet")
    os.makedirs(d, exist_ok=True)
    n_files = -(-table.num_rows // per)
    for i in range(n_files):
        pq.write_table(
            table.slice(i * per, per), os.path.join(d, f"part-{i:04d}.parquet")
        )
    print(f"  {name}: {table.num_rows} rows ({n_files} files)")


def generate(sf: float, out_dir: str, seed: int = 7) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    _write(out_dir, "region", {
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    })
    _write(out_dir, "nation", {
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    })
    _write(out_dir, "customer", {
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": np.array(MKTSEGMENTS)[rng.integers(0, 5, n_cust)],
    })
    _write(out_dir, "supplier", {
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    })
    adj = np.array(P_ADJ)[rng.integers(0, len(P_ADJ), n_part)]
    noun = np.array(P_NOUN)[rng.integers(0, len(P_NOUN), n_part)]
    _write(out_dir, "part", {
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": np.char.add(np.char.add(adj, " "), noun),
        "p_brand": np.array([f"Brand#{i}" for i in range(25)])[
            rng.integers(0, 25, n_part)
        ],
        "p_type": np.array(P_TYPES)[rng.integers(0, len(P_TYPES), n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        # exact driver grid: 900 + (partkey % 1000)/10
        "p_retailprice": 900.0 + (np.arange(n_part) % 1000) / 10.0,
    })

    odate_days = ORDER_D0 + rng.integers(0, ORDER_DAYS + 1, n_ord)
    _write(out_dir, "orders", {
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": _days_to_us(odate_days),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
    })

    # lineitems per order ~ Poisson(4); orders drawing 0 have no lines
    per_order = rng.poisson(4.0, n_ord)
    l_orderkey = np.repeat(np.arange(n_ord), per_order)
    n_li = len(l_orderkey)
    linenumber = np.concatenate(
        [np.arange(1, k + 1) for k in per_order if k > 0]
    ) if n_li else np.array([], dtype=int)
    # shipdate is INDEPENDENT of the parent order date in the driver
    # data (offset quantiles span the full ±6.6y range, median ≈ +47d):
    # uniform date in the order range plus uniform(1..95) days
    ship_days = (
        ORDER_D0
        + rng.integers(0, ORDER_DAYS + 1, n_li)
        + rng.integers(1, 96, n_li)
    )
    _write(out_dir, "lineitem", {
        "l_orderkey": pa.array(l_orderkey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(linenumber, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": rng.integers(0, 11, n_li) / 100.0,
        "l_tax": rng.integers(0, 9, n_li) / 100.0,
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
        "l_shipdate": _days_to_us(ship_days),
    })

    _write(out_dir, "events", {
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(
            EV_T0 + rng.integers(0, EV_SPAN_US, n_ev), pa.timestamp("us")
        ),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": np.array([f'{{"k": {k}}}' for k in range(100)])[
            rng.integers(0, 100, n_ev)
        ],
    })

    n_words = rng.integers(10, 100, n_doc)
    vocab = np.array(DOC_VOCAB)
    word_idx = rng.integers(0, len(vocab), int(n_words.sum()))
    bounds = np.concatenate([[0], np.cumsum(n_words)])
    texts = [
        " ".join(vocab[word_idx[bounds[i] : bounds[i + 1]]]) for i in range(n_doc)
    ]
    # planted exact duplicates at the observed constant rate
    for i in rng.choice(np.arange(1, n_doc), int(DUP_RATE * n_doc), replace=False):
        texts[i] = texts[rng.integers(0, i)]
    _write(out_dir, "documents", {
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": np.array(LANGS)[rng.choice(5, n_doc, p=LANG_W)],
        "source": np.array([f"src{i}" for i in range(N_SOURCES)])[
            rng.integers(0, N_SOURCES, n_doc)
        ],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })

    emb = rng.standard_normal((n_emb, 64)).astype("float32")
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    _write(out_dir, "embeddings", {
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    })


if __name__ == "__main__":
    sf = float(sys.argv[1])
    out = sys.argv[2]
    print(f"generating sf={sf} -> {out}")
    generate(sf, out)
