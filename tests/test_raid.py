"""Erasure-coding operator tests (operators/raid.py): the GF(2^8)
column/SQL codegen must agree with the plain-Python field model, and
stripe encode/decode must round-trip arbitrary data for any erasure."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from hadoop_20_spark.operators import raid


def test_gf_field_axioms():
    """Spot-check the Python model IS GF(256): associativity,
    distributivity, inverses (on a random sample — the full field is
    65k pairs; sampling keeps the suite fast)."""
    rng = random.Random(7)
    for _ in range(300):
        a, b, c = (rng.randrange(256) for _ in range(3))
        assert raid.gf_mul_py(a, raid.gf_mul_py(b, c)) == raid.gf_mul_py(
            raid.gf_mul_py(a, b), c
        )
        assert raid.gf_mul_py(a, b ^ c) == raid.gf_mul_py(a, b) ^ raid.gf_mul_py(a, c)
    for a in range(1, 256):
        assert raid.gf_mul_py(a, raid.gf_inv_py(a)) == 1
    # g=2 generates the multiplicative group under 0x11D
    seen = {raid.gf_pow_py(2, n) for n in range(255)}
    assert len(seen) == 255


def test_gf_column_and_sql_match_model(spark):
    """Every constant multiple computed via the power-column staging —
    on Spark Columns AND through the DuckDB SQL twins — equals the
    Python model, for every byte value and a spread of constants."""
    consts = [0, 1, 2, 3, 29, 41, 128, 142, 255]
    df = raid.with_gf_powers(
        spark.range(256).select(F.col("id").cast("int").alias("b")), "b", "m"
    )
    got = df.select(
        "b", *[raid.gf_combine("m", c).alias(f"c{c}") for c in consts]
    ).collect()
    for r in got:
        for c in consts:
            assert r[f"c{c}"] == raid.gf_mul_py(r["b"], c), (r["b"], c)

    con = duckdb.connect()
    powers = raid.gf_powers_sql("b", "m")
    ctes = ["m0 AS (SELECT unnest(range(256)) AS b)"]
    for t in range(8):
        ctes.append(f"p{t} AS (SELECT *, {powers[t]} FROM " + (f"p{t-1})" if t else "m0)"))
    sel = ", ".join(f"{raid.gf_combine_sql('m', c)} AS c{c}" for c in consts)
    rows = con.execute(
        "WITH " + ", ".join(ctes) + f" SELECT b, {sel} FROM p7 ORDER BY b"
    ).fetchall()
    for row in rows:
        b = row[0]
        for k, c in enumerate(consts, start=1):
            assert row[k] == raid.gf_mul_py(b, c), (b, c)


def test_rs_model_recovers_any_pair():
    """The two-erasure decode recovers the original blocks for random
    stripes and EVERY erased index pair (k=6, 16-byte blocks)."""
    rng = random.Random(42)
    k, w = 6, 16
    data = [[rng.randrange(256) for _ in range(w)] for _ in range(k)]
    for i in range(k):
        for j in range(i + 1, k):
            _, _, di, dj = raid.rs_model_py(data, i, j)
            assert di == data[i], (i, j)
            assert dj == data[j], (i, j)


def test_xor_stripe_roundtrip_spark(spark):
    """Distributed single-parity encode + decode == original content,
    including a SHORT final stripe (zero-padding semantics)."""
    rng = random.Random(3)
    rows = [
        (b // 4, b % 4, p, rng.randrange(1 << 60))
        for b in range(14)  # 3 full stripes + a 2-block tail
        for p in range(5)
    ]
    blocks = spark.createDataFrame(
        rows, "stripe long, idx long, pos long, w long"
    )
    parity = raid.xor_parity(blocks, "stripe", "pos", "w")
    recon = raid.xor_reconstruct(
        blocks, parity, F.col("idx") == 1, "stripe", "idx", "pos", "w"
    )
    orig = {(r["stripe"], r["pos"]): r["w"] for r in rows_df(blocks, 1)}
    got = {(r["stripe"], r["pos"]): r["recon"] for r in recon.collect()}
    assert got == orig


def rows_df(blocks, idx):
    return blocks.filter(F.col("idx") == idx).select("stripe", "pos", "w").collect()


def test_rs_two_erasure_spark_matches_model(spark):
    """End-to-end RS(5,2) on Spark relations: P/Q encode via power
    columns + bit_xor, survivor-reduced decode of an erased PAIR —
    byte-identical to the Python model."""
    rng = random.Random(11)
    k, w, n_stripes = 5, 8, 6
    stripes = [
        [[rng.randrange(256) for _ in range(w)] for _ in range(k)]
        for _ in range(n_stripes)
    ]
    rows = [
        (s, l, t, stripes[s][l][t])
        for s in range(n_stripes)
        for l in range(k)
        for t in range(w)
    ]
    df = raid.with_gf_powers(
        spark.createDataFrame(rows, "stripe long, idx long, pos long, b long"),
        "b",
        "m",
    )
    contrib = F.coalesce(
        *[
            F.when(F.col("idx") == l, raid.gf_combine("m", raid.gf_pow_py(2, l)))
            for l in range(k)
        ]
    )
    i, j = 1, 3
    gi, _, inv = raid.rs_decode_constants(i, j)
    surv = (
        df.withColumn("qc", contrib)
        .filter(~F.col("idx").isin(i, j))
        .groupBy("stripe", "pos")
        .agg(F.expr("bit_xor(b)").alias("sp"), F.expr("bit_xor(qc)").alias("sq"))
    )
    dec = (
        df.withColumn("qc", contrib)
        .groupBy("stripe", "pos")
        .agg(F.expr("bit_xor(b)").alias("p"), F.expr("bit_xor(qc)").alias("q"))
        .join(surv, ["stripe", "pos"])
        .select(
            "stripe",
            "pos",
            F.col("p").bitwiseXOR(F.col("sp")).alias("pstar"),
            F.col("q").bitwiseXOR(F.col("sq")).alias("qstar"),
        )
    )
    dec = raid.with_gf_powers(dec, "pstar", "pp")
    dec = dec.withColumn(
        "t1", F.col("qstar").bitwiseXOR(raid.gf_combine("pp", gi))
    )
    dec = raid.with_gf_powers(dec, "t1", "tt")
    dec = dec.select(
        "stripe",
        "pos",
        raid.gf_combine("tt", inv).alias("dj"),
    ).withColumn("dj", F.col("dj").cast("long"))
    got_dj = {(r["stripe"], r["pos"]): r["dj"] for r in dec.collect()}
    for s in range(n_stripes):
        _, _, di_m, dj_m = raid.rs_model_py(stripes[s], i, j)
        for t in range(w):
            assert got_dj[(s, t)] == dj_m[t] == stripes[s][j][t], (s, t)


def test_registry_raid_drills_verify_zero_mismatch(spark):
    """The registry drills are SELF-verifying: their n_mismatch column
    (reconstructed vs original content, computed in-query) must be 0 on
    every stripe — this catches a shared-math bug the oracle hash
    cannot (both engines run the same GF algebra)."""
    from hadoop_20_spark.queries import REGISTRY

    for name in ("raid_xor_erasure", "raid_rs_two_erasure"):
        rows = REGISTRY[name].fn(spark, "/root/testdata/sf0.001").collect()
        assert rows and all(r["n_mismatch"] == 0 for r in rows), name


def test_xor_erasure_covers_every_slot(spark):
    """The md5-chosen erased index actually exercises all k slots
    across stripes (a fixed slot would leave k-1 decode paths untested)."""
    from hadoop_20_spark.queries import REGISTRY

    rows = REGISTRY["raid_xor_erasure"].fn(spark, "/root/testdata/sf0.001").collect()
    assert {r["erased_idx"] for r in rows} == {0, 1, 2, 3, 4}


def test_parity_delta_maintenance_registry(spark):
    """Maintained parity == rebuilt parity on every stripe, and the
    delta drill actually changes a meaningful fraction of blocks."""
    from hadoop_20_spark.queries import REGISTRY

    rows = REGISTRY["raid_parity_delta_maintenance"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert all(r["n_mismatch"] == 0 for r in rows)
    changed = sum(r["n_changed_blocks"] for r in rows)
    assert 0 < changed < 500  # ~1/7 of 500 blocks
    # changed stripes must actually MOVE the parity fingerprint
    assert all(
        (r["maintained_fp"] != r["parity_old_fp"]) == (r["n_changed_blocks"] > 0)
        for r in rows
    )


def test_block_placement_invariants(spark):
    """Placement invariants re-checked from the placed rows: zero
    violations, every node used, every rack carries replicas, and the
    cluster sits near balance (the md5 placement is uniform)."""
    from hadoop_20_spark.queries import REGISTRY

    rows = REGISTRY["block_placement_audit"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 40
    assert all(r["n_violations"] == 0 for r in rows)
    assert {r["rack"] for r in rows} == set(range(8))
    assert sum(r["n_primary"] for r in rows) * 3 == sum(r["n_total"] for r in rows)


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    data=st.lists(
        st.lists(st.integers(0, 255), min_size=4, max_size=4),
        min_size=3,
        max_size=8,
    ),
    pair=st.tuples(st.integers(0, 7), st.integers(0, 7)),
)
@settings(max_examples=60, deadline=None)
def test_rs_model_property_any_stripe_any_pair(data, pair):
    """Hypothesis: RS(k,2) recovers ANY two erased blocks of ANY stripe
    content (k in 3..8, 4-byte blocks, arbitrary bytes)."""
    i, j = pair
    k = len(data)
    i %= k
    j %= k
    if i == j:
        j = (j + 1) % k
    i, j = min(i, j), max(i, j)
    _, _, di, dj = raid.rs_model_py(data, i, j)
    assert di == data[i] and dj == data[j]


@given(
    stripe=st.lists(st.integers(0, (1 << 60) - 1), min_size=2, max_size=9),
    erased=st.integers(0, 8),
)
@settings(max_examples=60, deadline=None)
def test_xor_parity_model_property(stripe, erased):
    """XOR parity recovers any single erased word-block (pure model:
    parity ^ survivors == erased content)."""
    e = erased % len(stripe)
    parity = 0
    for w in stripe:
        parity ^= w
    surv = 0
    for li, w in enumerate(stripe):
        if li != e:
            surv ^= w
    assert parity ^ surv == stripe[e]
