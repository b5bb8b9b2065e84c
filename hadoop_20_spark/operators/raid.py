"""Erasure-coding primitives: the HDFS-RAID analog.

The reference's distinctive storage feature (public facebookarchive/
hadoop-20, src/contrib/raid): RaidNode derives PARITY files from data
blocks so HDFS can drop replication below 3x —
``org/apache/hadoop/raid/XOREncoder.java`` / ``XORDecoder.java`` for
single-parity striping, and ``org/apache/hadoop/raid/ReedSolomonCode.java``
for the GF(2^8) RS(k, m) code that tolerates multiple lost blocks per
stripe (the "DiskReduce" design: 3x replication -> ~1.4x with RS(10,4)).

Spark-first re-expression: a block is a ROW of (stripe, block index,
content words/bytes); parity is a bounded-domain AGGREGATE —
``bit_xor`` per (stripe, word position) with map-side partials — and
decode is the same aggregate over the SURVIVING blocks joined back to
the parity relation.  Nothing here is an RDD or a UDF: GF(2^8)
arithmetic compiles to pure integer codegen (shift/mask/xor CASE), so
the identical math runs in the DuckDB oracle.

GF(2^8) is the field of bytes under the AES/RAID-6 polynomial
x^8+x^4+x^3+x^2+1 (0x11D).  Multiplication by the generator g=2 is one
shift + conditional xor with 0x1D; multiplication by an ARBITRARY
constant c is the XOR of the mul2-chains at c's set bits.  To keep both
engines' expression trees LINEAR (a naive nested mul2^7 duplicates its
operand 2^7 times), callers first project the 8 "power columns"
x, 2x, 4x, ..., 128x (each level referencing the previous ATTRIBUTE,
not the previous expression) and then any constant multiple is a flat
XOR of a subset — the same staging works as SQL CTE columns.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GF_POLY = 0x11D  # x^8 + x^4 + x^3 + x^2 + 1 (RAID-6 / AES field)
_REDUCE = GF_POLY & 0xFF  # 0x1D: the xor applied when the high bit shifts out


# ---------------------------------------------------------------------------
# Plain-Python field model: constants for decode matrices + the test oracle
# ---------------------------------------------------------------------------


def gf_mul_py(a: int, b: int) -> int:
    """GF(2^8) product by peasant multiplication (test/model path and
    the driver-side source of decode constants)."""
    r = 0
    a &= 0xFF
    b &= 0xFF
    while b:
        if b & 1:
            r ^= a
        a <<= 1
        if a & 0x100:
            a ^= GF_POLY
        b >>= 1
    return r


def gf_pow_py(a: int, n: int) -> int:
    r = 1
    base = a & 0xFF
    while n:
        if n & 1:
            r = gf_mul_py(r, base)
        base = gf_mul_py(base, base)
        n >>= 1
    return r


def gf_inv_py(a: int) -> int:
    """Multiplicative inverse via Fermat: a^(2^8 - 2).  a must be nonzero."""
    if a & 0xFF == 0:
        raise ZeroDivisionError("0 has no GF(256) inverse")
    return gf_pow_py(a, 254)


# ---------------------------------------------------------------------------
# Column-side GF arithmetic (pure codegen; byte-valued int columns)
# ---------------------------------------------------------------------------


def gf_mul2(c: Column) -> Column:
    """Multiply a byte column by the generator g=2: (b<<1) mod the field
    polynomial.  References its operand twice — apply only to plain
    attributes (see `with_gf_powers`)."""
    return (
        F.shiftleft(c, 1)
        .bitwiseAND(F.lit(255))
        .bitwiseXOR(F.when(c >= 128, F.lit(_REDUCE)).otherwise(F.lit(0)))
    )


def with_gf_powers(df: DataFrame, col: str, prefix: str) -> DataFrame:
    """Project the 8 GF power columns prefix0..prefix7 where
    prefix{t} = (2^t) * col in GF(2^8).  Each level is computed from the
    PREVIOUS power attribute, so the plan stays linear in depth."""
    out = df.withColumn(f"{prefix}0", F.col(col).cast("int"))
    for t in range(1, 8):
        out = out.withColumn(f"{prefix}{t}", gf_mul2(F.col(f"{prefix}{t-1}")))
    return out


def gf_combine(prefix: str, const: int) -> Column:
    """constant * x given x's power columns: XOR of the powers at the
    constant's set bits (distributivity over the field's characteristic-2
    addition)."""
    const &= 0xFF
    if const == 0:
        return F.lit(0)
    terms = [F.col(f"{prefix}{t}") for t in range(8) if (const >> t) & 1]
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseXOR(t)
    return out


# ---------------------------------------------------------------------------
# SQL-side twins (DuckDB oracle): same staging, CTE power columns
# ---------------------------------------------------------------------------


def gf_mul2_sql(e: str) -> str:
    """DuckDB rendering of gf_mul2 over a bare column reference."""
    return f"xor((({e}) << 1) & 255, CASE WHEN ({e}) >= 128 THEN {_REDUCE} ELSE 0 END)"


def gf_powers_sql(col: str, prefix: str) -> list[str]:
    """SELECT-list fragments adding prefix0..prefix7 for ``col``; stage
    them through consecutive CTEs (each level reads the previous CTE's
    column) exactly like with_gf_powers."""
    frags = [f"CAST({col} AS BIGINT) AS {prefix}0"]
    for t in range(1, 8):
        frags.append(f"{gf_mul2_sql(f'{prefix}{t-1}')} AS {prefix}{t}")
    return frags


def gf_combine_sql(prefix: str, const: int) -> str:
    const &= 0xFF
    if const == 0:
        return "0"
    terms = [f"{prefix}{t}" for t in range(8) if (const >> t) & 1]
    e = terms[0]
    for t in terms[1:]:
        e = f"xor({e}, {t})"
    return e


# ---------------------------------------------------------------------------
# Stripe-level coding over (stripe, idx, pos, value) relations
# ---------------------------------------------------------------------------


def xor_parity(blocks: DataFrame, stripe: str, pos: str, value: str) -> DataFrame:
    """Single-parity encode (XOREncoder.java): parity word at each
    (stripe, position) = XOR over the stripe's blocks.  One
    bounded-domain aggregate, map-side partials; absent blocks in a
    short stripe behave as zero padding (XOR identity) — exactly the
    block-padding semantics of the reference's stripe reader."""
    return blocks.groupBy(stripe, pos).agg(
        F.expr(f"bit_xor({value})").alias("parity")
    )


def xor_reconstruct(
    blocks: DataFrame,
    parity: DataFrame,
    erased: Column,
    stripe: str,
    idx: str,
    pos: str,
    value: str,
) -> DataFrame:
    """Single-erasure decode (XORDecoder.java): the lost block's word =
    parity XOR surviving blocks' words.  ``erased`` is a per-row
    predicate marking the erased block; returns (stripe, pos, recon)."""
    survivors = blocks.filter(~erased)
    s = survivors.groupBy(stripe, pos).agg(
        F.expr(f"bit_xor({value})").alias("s_xor")
    )
    return (
        parity.join(s, [stripe, pos], "left")
        .select(
            stripe,
            pos,
            F.col("parity")
            .bitwiseXOR(F.coalesce(F.col("s_xor"), F.lit(0)))
            .alias("recon"),
        )
    )


def rs_decode_constants(i: int, j: int) -> tuple[int, int, int]:
    """Constants for recovering data blocks (i, j) from P+Q parities:
    with P* = D_i ^ D_j and Q* = g^i.D_i ^ g^j.D_j (survivor-reduced
    parities), D_j = A * (Q* ^ g^i * P*) where A = inv(g^i ^ g^j), and
    D_i = P* ^ D_j.  Returns (g^i, g^j, A) — ints the caller bakes into
    the codegen (ReedSolomonCode.java#decode's matrix inversion,
    specialized to the two-erasure case)."""
    if i == j:
        raise ValueError("erased indexes must differ")
    gi, gj = gf_pow_py(2, i), gf_pow_py(2, j)
    return gi, gj, gf_inv_py(gi ^ gj)


def rs_model_py(
    data: Sequence[Sequence[int]], i: int, j: int
) -> tuple[list[int], list[int], list[int], list[int]]:
    """Plain-Python RS(k, 2) reference model for the property tests:
    given a stripe (list of blocks, each a list of bytes), returns
    (P, Q, recovered D_i, recovered D_j) after erasing blocks i and j."""
    w = len(data[0])
    p = [0] * w
    q = [0] * w
    for l, blk in enumerate(data):
        gl = gf_pow_py(2, l)
        for t in range(w):
            p[t] ^= blk[t]
            q[t] ^= gf_mul_py(gl, blk[t])
    gi, gj, inv = rs_decode_constants(i, j)
    di, dj = [], []
    for t in range(w):
        pstar, qstar = p[t], q[t]
        for l, blk in enumerate(data):
            if l not in (i, j):
                pstar ^= blk[t]
                qstar ^= gf_mul_py(gf_pow_py(2, l), blk[t])
        d_j = gf_mul_py(inv, qstar ^ gf_mul_py(gi, pstar))
        dj.append(d_j)
        di.append(pstar ^ d_j)
    return p, q, di, dj
