"""Bit-exact SQL literals for IEEE doubles (both dialects).

``CAST(<bare decimal> AS DOUBLE)`` is NOT round-trip safe for arbitrary
doubles: both Spark and DuckDB parse the bare literal as DECIMAL first,
and a 17-significant-digit repr has an integer mantissa above 2^53 —
DuckDB's DECIMAL→DOUBLE cast then computes mantissa/10^scale in floating
point and can land 1 ulp off the value ``repr`` encoded (measured:
``CAST(-104.94000000000001 AS DOUBLE)`` → -104.93999999999999773).
An EXPONENT-marked literal skips DECIMAL entirely — both engines parse
``-104.94000000000001e0`` with correctly-rounded strtod semantics, so
``repr`` (shortest round-trip decimal) survives bit-exactly.
"""

from __future__ import annotations

import math


def double_literal(v: float) -> str:
    """Render ``v`` so Spark and DuckDB both materialize the exact same
    IEEE double (strtod of the shortest round-trip repr)."""
    v = float(v)
    if math.isnan(v) or math.isinf(v):
        raise ValueError(f"non-finite double literal: {v}")
    r = repr(v)
    return r if ("e" in r or "E" in r) else r + "e0"
