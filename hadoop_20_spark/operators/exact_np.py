"""Bit-exact numpy replicas of the Spark expression arithmetic used by
the k-means / assignment family.

Every helper here reproduces a specific Spark expression tree BIT FOR
BIT, so a driver- or Arrow-hosted computation can substitute for the
expression plan without changing any result (the swap is a physical
strategy, like ``_assign_cells_gemm`` — but unlike the GEMM's
measured-agreement float rounding, these are *provably* exact and are
therefore allowed on oracle-gate paths):

- ``seq_dot`` / ``seq_norm`` — the ``dot()`` / ``norm()`` higher-order
  folds.  Spark evaluates ``aggregate(zip_with(a, b, x*y), 0.0,
  acc+v)`` as a strict left fold: one IEEE-754 double multiply and one
  add per coordinate, in array order.  The numpy form performs the
  SAME rounded operations in the SAME order, vectorized across rows
  (one mul + one add per coordinate step), so every partial — and the
  final sum — is the identical double.
- ``round_half_up`` — ``F.round(x, s)`` on DOUBLE.  Spark rounds via
  ``BigDecimal.valueOf(x).setScale(s, HALF_UP).toDouble``:
  ``BigDecimal.valueOf`` goes through ``Double.toString``, the
  shortest decimal that round-trips — the same string
  ``repr(float)`` produces in Python (both are correctly-rounded
  shortest representations, verified over an 80k-value battery
  including crafted half-way boundaries: 0 mismatches at 4dp and
  8dp after −0.0 normalization; BigDecimal has no signed zero, so
  Spark's round returns +0.0 where a sign-preserving quantize gives
  −0.0).  The vectorized fast path ``sign(x)·floor(|x|·10^s + 0.5)``
  is exact wherever ``|x|·10^s + 0.5`` is provably not adjacent to an
  integer: the float error of that expression is ≤ a few ulp ≈
  ``t·2⁻⁵⁰`` plus the repr gap ≤ ``0.5·ulp(|x|)·10^s ≈ t·2⁻⁵³``, so
  any value whose distance to the nearest integer exceeds
  ``max(1e-9, t·1e-12)`` — a >1000× margin — rounds identically under
  float and exact decimal arithmetic; the rare values inside the
  margin (and any ``|x|·10^s ≥ 2^52``, where float spacing exceeds 1)
  are recomputed through :mod:`decimal` exactly.
- ``to_scaled_int`` — ``CAST(x AS DECIMAL(30,10))`` as a scaled int64
  (unscaled value).  Spark's cast is
  ``BigDecimal.valueOf(x).setScale(10, HALF_UP)`` — same shortest-repr
  + HALF_UP rule, same fast-path/fixup argument (0 mismatches over the
  battery).  Exact integer sums of these are the decimal(30,10) sums
  of the mean pass, order-independent by construction.
- ``decimal_mean`` — ``ROUND(CAST(SUM(dec) AS DOUBLE) / COUNT, 8)``:
  the unscaled-int sum is converted with correctly-rounded
  decimal→double (``float(Decimal(S).scaleb(-10))``, the same
  correctly-rounded conversion as ``Decimal.toDouble``), divided by
  the count in IEEE doubles, and rounded with the exact rule above.

Fallback discipline: callers must verify inputs are finite,
uniform-width, non-null and zero-norm-free before trusting the
assignment kernel (Spark ANSI mode makes a zero-norm cosine a
DIVIDE_BY_ZERO error, not a NULL — the caller falls back to the
expression plan, which raises the same designed error).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal


def seq_dot(V, C):
    """(n, d) × (k, d) → (n, k) dot products, each accumulated as
    Spark's sequential fold: acc ← acc + (vᵢ·cᵢ), one rounded multiply
    and one rounded add per coordinate, in coordinate order."""
    import numpy as np

    n, d = V.shape
    k = C.shape[0]
    acc = np.zeros((n, k), dtype=np.float64)
    for i in range(d):
        acc += V[:, i : i + 1] * C[None, :, i].reshape(1, k)
    return acc


def seq_norm(V):
    """Per-row ``norm()``: sqrt of the sequential self-dot fold.
    np.sqrt is IEEE correctly rounded, as is Spark's SQRT."""
    import numpy as np

    n, d = V.shape
    acc = np.zeros(n, dtype=np.float64)
    for i in range(d):
        acc += V[:, i] * V[:, i]
    return np.sqrt(acc)


def _exact_round_scalar(x: float, digits: int) -> float:
    q = Decimal(1).scaleb(-digits)
    r = float(Decimal(repr(x)).quantize(q, ROUND_HALF_UP))
    return 0.0 if r == 0.0 else r  # BigDecimal has no −0.0


def round_half_up(a, digits: int):
    """Vectorized exact F.round(x, digits) for finite double arrays."""
    import numpy as np

    p = float(10**digits)
    absx = np.abs(a)
    t = absx * p + 0.5
    out = np.sign(a) * np.floor(t) / p
    # exact-decimal fixup where the float fast path could differ
    risky = (np.abs(t - np.rint(t)) < np.maximum(1e-9, t * 1e-12)) | (
        absx * p >= 2.0**52
    )
    if risky.any():
        flat_out = out.reshape(-1)
        flat_in = np.asarray(a).reshape(-1)
        for idx in np.nonzero(risky.reshape(-1))[0]:
            flat_out[idx] = _exact_round_scalar(float(flat_in[idx]), digits)
    out[out == 0.0] = 0.0  # normalize −0.0 → +0.0 (BigDecimal semantics)
    return out


def to_scaled_int(a):
    """Vectorized exact CAST(x AS DECIMAL(30,10)) as unscaled int64.
    Caller guarantees |x| < 1e6 and finite (int64-safe: 1e6·1e10 =
    1e16 ≪ 2^63)."""
    import numpy as np

    y = np.abs(a) * 1e10 + 0.5
    out = (np.sign(a) * np.floor(y)).astype(np.int64)
    risky = (np.abs(y - np.rint(y)) < np.maximum(1e-9, y * 1e-12)) | (
        np.abs(a) * 1e10 >= 2.0**52
    )
    if risky.any():
        flat_out = out.reshape(-1)
        flat_in = np.asarray(a).reshape(-1)
        for idx in np.nonzero(risky.reshape(-1))[0]:
            flat_out[idx] = int(
                Decimal(repr(float(flat_in[idx])))
                .scaleb(10)
                .quantize(Decimal(1), ROUND_HALF_UP)
            )
    return out


def decimal_mean(unscaled_sum: int, count: int) -> float:
    """ROUND(CAST(sum_dec AS DOUBLE) / count, 8) — sum_dec is the exact
    decimal(30,10) sum carried as its unscaled integer."""
    s_dbl = float(Decimal(unscaled_sum).scaleb(-10))  # correctly rounded
    return _exact_round_scalar(s_dbl / count, 8)


def lloyd_assign(V, cent_ids, C):
    """The Lloyd-loop assignment argmax, bit-identical to the
    expression form: sim = round(dot/(norm_v·norm_c), 4); pick max sim,
    ties to the smallest cent_id (``cent_ids`` must be ascending — the
    first argmax hit IS the smallest id).  Returns (n,) int64 cells.

    Caller guarantees: V and C finite, no zero rows (a zero norm is an
    ANSI DIVIDE_BY_ZERO on the expression path — fall back there so
    the designed error raises)."""
    import numpy as np

    dots = seq_dot(V, C)
    vn = seq_norm(V)
    cn = seq_norm(C)
    sims = dots / (vn[:, None] * cn[None, :])
    if not np.isfinite(sims).all():
        # F.round on a non-finite double raises in the expression plan
        # (BigDecimal.valueOf); mirror the fail-loud outcome
        raise ValueError(
            "lloyd_assign: non-finite cosine similarity (overflow or "
            "denormal-norm underflow) — the expression plan raises here"
        )
    r = round_half_up(sims, 4)
    idx = np.argmax(r, axis=1)  # first max → smallest cent_id
    return np.asarray(cent_ids, dtype=np.int64)[idx]
