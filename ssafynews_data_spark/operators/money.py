"""Accumulation-order-proof money arithmetic for oracle-checked sums.

The failure class (first caught on reseeded fixtures: q9 round-flip,
cusum half-cent, percentile midpoints): ``round(sum(<double money
expr>), 2)`` compares a Spark sum and a DuckDB sum whose accumulation
orders differ.  For PRODUCTS of money columns (price × discount terms)
the true total has 1e-4/1e-6 precision, so it lands EXACTLY on a .xx5
cent boundary with probability ~1/100 per output row — and there the
two engines' differently-ordered double sums (apart by ~1e-7) round to
different cents.  Plain-column sums are immune (the true total is
exact cents, never at a boundary), but every summed product is a time
bomb.

The fix, by construction instead of by luck: money columns in the
fixtures are 2-decimal by contract (asserted in
tests/test_relational.py::test_money_columns_are_integer_cents), so
each row's product is an EXACT BIGINT in 1e-4 (or 1e-6 with tax)
dollars.  Summing integers is order-independent — both engines compute
the IDENTICAL integer — and the final half-up quantization to cents is
``floor`` over a double derived from that identical integer, which no
engine rounding algorithm can break (the cusum lesson: even round()
on an identical double can tie-break differently per engine; floor
cannot).

BIGINT headroom: |e4| <= 1e9/row, |e6| <= 1.1e11/row, so an int64 sum
would overflow 2^63 beyond ~9e9 (e4) / ~8e7 (e6) rows PER GROUP —
reachable at the 100 TB north star (q1 groups by two flags), and Spark
wraps long sums SILENTLY in non-ANSI mode while DuckDB widens BIGINT
sums to HUGEINT.  Enforcement (round 9): every registered money sum
goes through ``sum_units`` — decimal(38, 0) accumulation, exact to
1e38 (~1e27 rows per group at e6) and raising on overflow rather than
wrapping — and the quantization helpers convert the identical integer
to double only at the final floor, so values are bit-identical to the
int64 path wherever both are exact
(tests/test_relational5.py::test_sum_units_decimal_matches_int64_path
proves equality on the fixture AND shows the int64 wrap the decimal
path removes).

Python helpers build the Spark Columns; the *_SQL fragments are the
identical DuckDB expressions for oracle strings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str) -> Column:
    """Exact integer cents of a 2-decimal money double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def disc_price_e4() -> Column:
    """l_extendedprice * (1 - l_discount) in exact 1e-4 dollars."""
    return cents("l_extendedprice") * (100 - cents("l_discount"))


def sum_units(units: Column) -> Column:
    """Overflow-proof exact sum of integer money units (the module
    docstring's headroom enforcement): decimal(38, 0) accumulation —
    exact at any realistic group size (38 digits ≈ 1e19× the headroom
    of long at e6-unit rows), and both engines derive downstream
    doubles from the identical integer (DuckDB's BIGINT sum is already
    HUGEINT).  Failure mode if 38 digits were EVER exceeded: with
    spark.sql.ansi.enabled=false (the driver's session default) Spark
    returns NULL for an overflowing decimal aggregate — it does NOT
    raise — so the guarantee is "never a silently WRAPPED wrong
    number": an overflow would surface as a NULL revenue, which the
    DuckDB oracle mirror (HUGEINT, non-null) flags as a value
    mismatch.  Sessions that need a hard error instead can set
    spark.sql.ansi.enabled=true; the plan is unchanged.

    Measured cost (sf0.1 solo A/B, docs/SCALE.md round 9): Q1's seven
    aggregates over 600k rows read 0.57s long vs 0.77s decimal — ~35%
    on the heaviest money consumer, a flat per-row decimal-accumulate
    tax that does NOT change the plan shape (same partial aggregation,
    same single exchange).  If that tax ever matters at cluster scale,
    the documented alternative is a two-level sum — long partials per
    (group, partition) then decimal over partials — which keeps row
    arithmetic in long at the cost of a partition-size assumption
    (<8e7 money rows of one group per partition); correctness comes
    first here, so the simple decimal form is what ships."""
    return F.sum(units.cast("decimal(38,0)"))


def half_up(sum_units: Column, scale: int) -> Column:
    """Half-up quantization of an exact integer ``sum_units`` (in
    10^-scale dollars; long or decimal) to cent-precision dollars, as
    a double both engines derive from the identical integer."""
    q = 10 ** (scale - 2)  # units per cent
    return F.floor(
        (sum_units + F.lit(q // 2)).cast("double") / F.lit(float(q))
    ).cast("long") / F.lit(100.0)


def avg_half_up(sum_units: Column, n: Column, out_decimals: int, in_scale: int) -> Column:
    """Half-up average of exact integer units to ``out_decimals``:
    floor(sum * 10^out / (n * 10^in) + 0.5) / 10^out — the quotient is
    the same double on both engines because numerator and denominator
    are identical integers (multiplied exactly — long or decimal —
    then cast to double for the one division)."""
    num = (sum_units * F.lit(10**out_decimals)).cast("double")
    den = (n * F.lit(10**in_scale)).cast("double")
    return F.floor(num / den + F.lit(0.5)).cast("long") / F.lit(
        float(10**out_decimals)
    )


#: DuckDB fragments — keep textually in lockstep with the helpers above.
CENTS_SQL = "CAST(round({col} * 100) AS BIGINT)"
DISC_PRICE_E4_SQL = (
    "(CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT)))"
)


def sum_half_up_sql(expr_units: str, scale: int) -> str:
    q = 10 ** (scale - 2)
    return (
        f"CAST(floor((sum({expr_units}) + {q // 2}) / {float(q)}) AS BIGINT)"
        " / 100.0"
    )


def avg_half_up_sql(expr_units: str, out_decimals: int, in_scale: int) -> str:
    return (
        f"CAST(floor(sum({expr_units}) * {10**out_decimals} * 1.0"
        f" / (count(*) * {10**in_scale}) + 0.5) AS BIGINT)"
        f" / {float(10**out_decimals)}"
    )
