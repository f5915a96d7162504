"""Expression builders shared across the engine.

Deterministic floating-point aggregation
----------------------------------------
``sum(double)`` is order-dependent: a distributed Spark plan and a
single-node oracle (DuckDB) add partial sums in different orders and can
disagree in the last bits, which breaks exact value-hash comparison.

Quantized summation makes the aggregate order-independent AND
engine-independent:

1. per-row value computed in double (bit-deterministic given identical
   inputs and operation order);
2. scaled by a **power of two** — exact in IEEE arithmetic (exponent
   shift only), unlike decimal casts, whose ``v * 10^n`` scaling is
   inexact and rounds differently across engines near ties;
3. ``floor`` to an integer — exact;
4. summed as ``decimal(38,0)`` — exact, associative, no overflow;
5. cast back to double (correctly rounded) and unscaled (exact).

The quantization error (2^-20 ≈ 1e-6 absolute by default) is far below
anything that matters analytically, and both engines agree bit-for-bit.
Because the result is partition-order-independent, correctness checks
remain valid at 100 TB where partition counts differ wildly from test
runs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: default quantization: 2^20 — 1e-6 absolute resolution, leaves
#: headroom for |value| up to ~2^42 before the scaled integer loses
#: exactness in double (2^53 mantissa).
Q_BITS = 20


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _scale(bits: int) -> float:
    return float(1 << bits)


def q_sum(c: Column | str, alias: str | None = None, *, bits: int = Q_BITS) -> Column:
    """Order- and engine-independent sum of a double expression."""
    q = _scale(bits)
    out = (
        F.sum(F.floor(_col(c) * F.lit(q)).cast("decimal(38,0)")).cast("double")
        / F.lit(q)
    )
    return out.alias(alias) if alias else out


def q_avg(c: Column | str, alias: str | None = None, *, bits: int = Q_BITS) -> Column:
    """Order- and engine-independent mean (quantized sum / non-null count)."""
    e = _col(c)
    out = q_sum(e, bits=bits) / F.count(e)
    return out.alias(alias) if alias else out


def q_sum_term(c: Column | str, *, bits: int = Q_BITS) -> Column:
    """The per-row quantized term, for use inside window/pivot sums:
    ``sum(q_sum_term(x)).cast('double') / 2^bits``."""
    return F.floor(_col(c) * F.lit(_scale(bits))).cast("decimal(38,0)")


def oracle_q_sum(expr: str, *, bits: int = Q_BITS) -> str:
    """DuckDB SQL mirroring :func:`q_sum` bit-for-bit."""
    q = _scale(bits)
    return (
        f"CAST(SUM(CAST(floor(({expr}) * {q!r}) AS DECIMAL(38,0))) AS DOUBLE)"
        f" / {q!r}"
    )


def oracle_q_avg(expr: str, *, bits: int = Q_BITS) -> str:
    """DuckDB SQL mirroring :func:`q_avg` bit-for-bit."""
    return f"{oracle_q_sum(expr, bits=bits)} / COUNT({expr})"
