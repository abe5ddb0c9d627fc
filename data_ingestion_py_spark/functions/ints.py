"""Integer arithmetic helpers that match the DuckDB oracle exactly.

Round-3 ADVICE flagged Spark ``div`` (truncates toward zero) vs
DuckDB ``//`` as a negative-numerator parity hazard on the assumption
that DuckDB floors. Measured reality (duckdb 1.0.0, pinned by
``tests/test_intmath.py``): DuckDB ``//`` ALSO truncates toward zero
(``-7 // 2 = -3``), exactly like Spark's ``div`` and C integer
division — the engines agree for negative numerators too, so the
integer HALF_UP mean is parity-safe over negative value sums with no
rewrite needed. The helper exists so every integer mean shares one
audited form.
"""

from __future__ import annotations


def trunc_div_sql(a: str, b: str) -> str:
    """SQL snippet computing ``(a) div (b)`` — truncation toward zero,
    which is ALSO what DuckDB's ``//`` does (see module docstring)."""
    return f"((({a})) div (({b})))"


def half_up_mean_sql(sum_col: str, n_col: str, scale: int = 100) -> str:
    """SQL snippet for the integer HALF_UP mean at 4 decimal places:
    ``(2*sum*scale + n) div (2*n)`` — divide the result by 10000.0 to
    get the float. Oracle-parity-exact for negative sums as well as
    positive (both engines truncate toward zero)."""
    return trunc_div_sql(f"2 * {sum_col} * {scale} + {n_col}", f"2 * {n_col}")
