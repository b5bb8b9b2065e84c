"""Generate an sf1-equivalent fixture (10x sf0.1) with the driver
tables' schemas and marginal distributions.

The driver's synthetic tables (TESTDATA.md, read-only) stop at sf0.1.
This generator reproduces their OBSERVED shape — schemas byte-for-byte
(arrow types incl. events' TIMESTAMP(NANOS)), per-column marginals
measured from sf0.1 (all columns are independent there: corr(extended-
price, quantity*retailprice) ~ 0.001, shipdate unrelated to orderdate,
o_totalprice unrelated to lineitem sums), and the corpus' planted
structure (31-word vocab with the rare 'dup' tail token on ~5% of
docs, ~0.16% exact-duplicate pairs sharing lang/source with their
source doc, 'en' at ~2x the other four langs, unit-norm 64-dim
embeddings with planted cos∈[0.505,0.535) boundary near-dup pairs so
SRP recall is tested AT the threshold) — at 10x the rows, so the engine can be
validated one decade above the largest driver fixture.

Usage:
    python tools/gen_fixture.py [out_dir] [scale_mult]

Defaults: out_dir=/root/repo/fixtures/sf1, scale_mult=10 (x sf0.1).
Deterministic (numpy PCG64 seeded per table). ~600 MB at sf1.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MS = 1000
DAY_MS = 86_400_000

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
ADJS = ["large", "hot", "blue", "small", "cold", "red", "green", "dim"]
NOUNS = ["ring", "bolt", "screw", "plate", "rod", "gear", "cap", "disk"]
TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ETYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["de", "en", "es", "fr", "zh"]
LANG_W = [0.148, 0.41, 0.148, 0.147, 0.147]  # en ~2.8x observed at sf0.1
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


def _rng(name: str) -> np.random.Generator:
    # hashlib, not hash(): Python string hashing is salted per process
    import hashlib

    h = hashlib.md5(f"sf1-fixture:{name}".encode()).hexdigest()
    return np.random.default_rng(int(h[:15], 16))


def _ts_ms(rng, lo_day: str, hi_day: str, n: int) -> np.ndarray:
    """Uniform midnight-day timestamps in [lo, hi], ms since epoch."""
    lo = np.datetime64(lo_day).astype("datetime64[D]").astype(np.int64)
    hi = np.datetime64(hi_day).astype("datetime64[D]").astype(np.int64)
    return rng.integers(lo, hi + 1, n) * DAY_MS


def write(out: str, name: str, table: pa.Table) -> None:
    os.makedirs(out, exist_ok=True)
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows", flush=True)


def gen(out: str, mult: int = 10, only: set[str] | None = None) -> None:
    """``only`` restricts generation to a table subset (third-decade
    probes grow ONLY documents+embeddings x10 over sf10 — the two
    tables whose operator families carry the super-linear risk — and
    symlink the rest from the sf10 fixture; regenerating a 600M-row
    lineitem nobody probes would be pure disk burn)."""

    def want(t: str) -> bool:
        return only is None or t in only

    # row counts = mult x sf0.1
    n_supp = 1_000 * mult
    n_cust = 15_000 * mult
    n_part = 20_000 * mult
    n_ord = 150_000 * mult
    n_li = 600_000 * mult
    n_ev = 100_000 * mult
    n_doc = 5_000 * mult
    n_emb = 2_000 * mult

    t0 = time.time()
    if want("region") or want("nation"):
        write(out, "region", pa.table({
            "r_regionkey": pa.array(range(5), pa.int32()),
            "r_name": REGIONS,
        }))
        write(out, "nation", pa.table({
            "n_nationkey": pa.array(range(25), pa.int32()),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
        }))

    if want("supplier"):
        r = _rng("supplier")
        write(out, "supplier", pa.table({
            "s_suppkey": pa.array(range(n_supp), pa.int64()),
            "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
            "s_nationkey": pa.array(r.integers(0, 25, n_supp), pa.int32()),
            "s_acctbal": np.round(r.uniform(-1000, 10000, n_supp), 2),
        }))

    if want("customer"):
        r = _rng("customer")
        write(out, "customer", pa.table({
            "c_custkey": pa.array(range(n_cust), pa.int64()),
            "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
            "c_nationkey": pa.array(r.integers(0, 25, n_cust), pa.int32()),
            "c_acctbal": np.round(r.uniform(-1000, 10000, n_cust), 2),
            "c_mktsegment": pa.array(
                np.array(SEGMENTS)[r.integers(0, 5, n_cust)]
            ),
        }))

    if want("part"):
        r = _rng("part")
        pk = np.arange(n_part, dtype=np.int64)
        write(out, "part", pa.table({
            "p_partkey": pa.array(pk, pa.int64()),
            "p_name": [
                f"{ADJS[a]} {NOUNS[b]}"
                for a, b in zip(r.integers(0, 8, n_part), r.integers(0, 8, n_part))
            ],
            "p_brand": pa.array(
                [f"Brand#{i}" for i in r.integers(0, 25, n_part)]
            ),
            "p_type": pa.array(np.array(TYPES)[r.integers(0, 6, n_part)]),
            "p_size": pa.array(r.integers(1, 51, n_part), pa.int32()),
            # deterministic (sf0.1 invariant): 900 + 0.1 * (partkey % 1000)
            "p_retailprice": np.round(900.0 + 0.1 * (pk % 1000), 2),
        }))

    if want("orders"):
        r = _rng("orders")
        write(out, "orders", pa.table({
            "o_orderkey": pa.array(range(n_ord), pa.int64()),
            "o_custkey": pa.array(r.integers(0, n_cust, n_ord), pa.int64()),
            "o_orderstatus": pa.array(
                np.array(["F", "O", "P"])[r.integers(0, 3, n_ord)]
            ),
            "o_totalprice": np.round(r.uniform(1000, 500000, n_ord), 2),
            "o_orderdate": pa.array(
                _ts_ms(r, "1995-01-01", "2001-08-01", n_ord), pa.timestamp("ms")
            ),
            "o_orderpriority": pa.array(
                np.array(PRIORITIES)[r.integers(0, 5, n_ord)]
            ),
        }))

    if want("lineitem"):
        r = _rng("lineitem")
        write(out, "lineitem", pa.table({
            "l_orderkey": pa.array(r.integers(0, n_ord, n_li), pa.int64()),
            "l_partkey": pa.array(r.integers(0, n_part, n_li), pa.int64()),
            "l_suppkey": pa.array(r.integers(0, n_supp, n_li), pa.int64()),
            "l_linenumber": pa.array(r.integers(1, 8, n_li), pa.int32()),
            "l_quantity": r.integers(1, 51, n_li).astype(np.float64),
            "l_extendedprice": np.round(r.uniform(900, 105000, n_li), 2),
            "l_discount": r.integers(0, 11, n_li) / 100.0,
            "l_tax": r.integers(0, 9, n_li) / 100.0,
            "l_returnflag": pa.array(
                np.array(["A", "N", "R"])[r.integers(0, 3, n_li)]
            ),
            "l_linestatus": pa.array(
                np.array(["F", "O"])[r.integers(0, 2, n_li)]
            ),
            "l_shipdate": pa.array(
                _ts_ms(r, "1995-01-02", "2001-11-04", n_li), pa.timestamp("ms")
            ),
        }))

    if want("events"):
        r = _rng("events")
        jan1 = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
        feb1 = np.datetime64("2024-01-31").astype("datetime64[us]").astype(np.int64)
        ts_us = np.sort(r.integers(jan1, feb1, n_ev))
        write(out, "events", pa.table({
            "event_id": pa.array(range(n_ev), pa.int64()),
            # TIMESTAMP(NANOS): the driver tables carry ns — the engine's
            # nanosAsLong read path must be exercised at sf1 too
            "ts": pa.array(ts_us * 1000, pa.timestamp("ns")),
            "user_id": pa.array(r.integers(0, 1500 * mult, n_ev), pa.int64()),
            "event_type": pa.array(np.array(ETYPES)[r.integers(0, 5, n_ev)]),
            "value": np.round(r.exponential(50.0, n_ev), 2),
            "props": pa.array([f'{{"k": {k}}}' for k in r.integers(0, 100, n_ev)]),
        }))

    if want("documents"):
        r = _rng("documents")
        lens = r.integers(10, 101, n_doc)
        vocab = np.array(VOCAB)
        texts = []
        for i in range(n_doc):
            toks = vocab[r.integers(0, len(vocab), lens[i])]
            t = " ".join(toks)
            if r.random() < 0.05:  # rare tail token (~5% at sf0.1)
                t += " dup"
            texts.append(t)
        # planted exact duplicates: ~8 pairs per 5000 docs at sf0.1.
        # Reject a == b (a no-op "pair") and any id already used as a source
        # or target — overwriting an earlier plant would silently drop the
        # realized duplicate rate below the documented ~0.16%.
        langs = np.array(LANGS)[r.choice(5, n_doc, p=LANG_W)]
        sources = np.array([f"src{i}" for i in r.integers(0, 20, n_doc)])
        planted: set[int] = set()
        pairs_planted = 0
        while pairs_planted < 8 * mult:
            a, b = (int(x) for x in r.integers(0, n_doc, 2))
            if a == b or a in planted or b in planted:
                continue
            texts[b] = texts[a]
            # a real duplicate is the SAME document crawled twice: it shares
            # lang and (usually) source, so metadata-aware dedup queries see
            # the planted pairs too — independent metadata on an identical
            # text would be a fixture artifact, not a realistic duplicate
            langs[b] = langs[a]
            sources[b] = sources[a]
            planted.update((a, b))
            pairs_planted += 1
        write(out, "documents", pa.table({
            "doc_id": pa.array(range(n_doc), pa.int64()),
            "text": texts,
            "lang": pa.array(langs),
            "source": pa.array(sources),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }))

    if want("embeddings"):
        r = _rng("embeddings")
        vecs = r.standard_normal((n_emb, 64)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        # planted BOUNDARY near-dup pairs: cosine just above the 0.5
        # threshold the near-dup queries use, a handful per decade — so the
        # SRP recall pin keeps testing the hardest (most-plane-flips) pairs
        # at every scale, not just whatever the random corpus happens to
        # produce.  vecs[b] = t*a + sqrt(1-t^2)*u with u ⟂ a keeps unit norm.
        emb_planted: set[int] = set()
        boundary_planted = 0
        while boundary_planted < 4 * mult:
            a, b = (int(x) for x in r.integers(0, n_emb, 2))
            if a == b or a in emb_planted or b in emb_planted:
                continue
            t_cos = 0.505 + 0.03 * r.random()  # in [0.505, 0.535): above 0.5 after 4dp rounding
            va = vecs[a].astype(np.float64)
            u = r.standard_normal(64)
            u -= (u @ va) * va
            u /= np.linalg.norm(u)
            vb = t_cos * va + np.sqrt(1.0 - t_cos * t_cos) * u
            vecs[b] = (vb / np.linalg.norm(vb)).astype(np.float32)
            emb_planted.update((a, b))
            boundary_planted += 1
        write(out, "embeddings", pa.table({
            "vec_id": pa.array(range(n_emb), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(r.integers(0, 10, n_emb), pa.int32()),
        }))

    manifest = {
        "generator": "tools/gen_fixture.py",
        "scale_mult_vs_sf0.1": mult,
        "only": sorted(only) if only else None,
        "rows": {
            "supplier": n_supp, "customer": n_cust, "part": n_part,
            "orders": n_ord, "lineitem": n_li, "events": n_ev,
            "documents": n_doc, "embeddings": n_emb,
        },
        "planted": {
            "exact_dup_doc_pairs": (
                pairs_planted if want("documents") else None
            ),
            "boundary_embedding_pairs": (
                boundary_planted if want("embeddings") else None
            ),
            "boundary_cos_range": [0.505, 0.535],
        },
    }
    with open(os.path.join(out, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"done in {time.time() - t0:.1f}s -> {out}")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/fixtures/sf1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    only = set(sys.argv[3:]) or None
    gen(out, mult, only=only)
