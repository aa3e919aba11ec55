"""Hilbert-curve layout planning — the locality-improved sibling of
``zcurve.py`` / ``sink_zorder_layout`` (VERDICT r8 "Next round" #7).

Same contract as the Z-order pair: ``sink_hilbert_layout`` writes lineitem
clustered by a 20-bit Hilbert index (10 bits per key, x = l_orderkey % 1024,
y = l_partkey % 1024), 16 files keyed by the index's top 4 bits; this module
plans 2-D box queries over that layout. The Hilbert curve never makes the
long diagonal jumps Morton order does, so an axis-aligned box covers fewer,
longer contiguous index ranges — fewer BETWEENs for the same exact cover,
tighter row-group stats for skewed boxes.

Encoding is the classic iterative xy→d walk (Hilbert 1891; the bit-twiddling
form popularized by Warren's Hacker's Delight and the Wikipedia reference
implementation): per level, extract the quadrant bits, add the quadrant's
curve offset, and rotate/reflect the remaining coordinates. The same chain
is emitted UNROLLED as pure integer/CASE SQL for both engines
(``hilbert_steps_sql``) — 10 fixed steps, no UDF, no loop state at runtime —
so the sink op differentials bit-for-bit against DuckDB.

Box cover (``hilbert_box_ranges``) needs no rotation-state table: a
quadtree-aligned cell is a contiguous d-range (it is a subtree of the
curve), and the curve ENTERS AND EXITS EVERY CELL AT CELL CORNERS, so the
cell's range is [min(d of its 4 corners), min + size² - 1]. The quadtree
recursion of zcurve.z_box_ranges then carries over unchanged except that
emitted ranges arrive unsorted (curve order ≠ quadrant order) and are
sorted+merged at the end. ``coarsen_ranges`` is reused verbatim —
it is layout-agnostic (any sorted range list + exact residual predicate).
"""

from __future__ import annotations

from .zcurve import coarsen_ranges

H_BITS = 10  # bits per key; keep in sync with ops/quality.py's hilbert sink


def hilbert_xy2d(x: int, y: int, bits: int = H_BITS) -> int:
    """Hilbert index of (x, y) on the 2^bits × 2^bits grid."""
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:  # rotate the lower quadrant
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return d


def hilbert_step_exprs(bits: int = H_BITS) -> list[tuple[str, str, str]]:
    """The xy→d walk unrolled as ``bits`` expression triples
    ``(hx{i+1} expr, hy{i+1} expr, hd{i+1} expr)`` over the previous step's
    columns ``hx{i}, hy{i}, hd{i}`` — IDENTICAL text in Spark SQL and
    DuckDB (plain integer arithmetic + CASE; ((3*rx) ^ ry) is spelled as a
    4-way CASE so no engine-specific XOR operator appears). The caller
    seeds ``hx0 = x, hy0 = y, hd0 = 0`` and reads ``hd{bits}`` as the
    Hilbert index; each step stays inside whole-stage codegen in Spark and
    vectorizes in DuckDB."""
    steps = []
    for i in range(bits):
        s = 1 << (bits - 1 - i)
        x, y, d = f"hx{i}", f"hy{i}", f"hd{i}"
        rx = f"(CASE WHEN ({x} & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN ({y} & {s}) > 0 THEN 1 ELSE 0 END)"
        digit = (
            f"(CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0 "
            f"WHEN {rx} = 0 THEN 1 WHEN {ry} = 1 THEN 2 ELSE 3 END)"
        )
        new_x = (
            f"(CASE WHEN {ry} = 0 THEN "
            f"(CASE WHEN {rx} = 1 THEN {s} - 1 - {y} ELSE {y} END) ELSE {x} END)"
        )
        new_y = (
            f"(CASE WHEN {ry} = 0 THEN "
            f"(CASE WHEN {rx} = 1 THEN {s} - 1 - {x} ELSE {x} END) ELSE {y} END)"
        )
        steps.append((new_x, new_y, f"{d} + {s * s} * {digit}"))
    return steps


def hilbert_box_ranges(
    x0: int, x1: int, y0: int, y1: int, bits: int = H_BITS
) -> list[tuple[int, int]]:
    """EXACT cover: ascending, merged inclusive (d_lo, d_hi) ranges whose
    union contains precisely the Hilbert indices of [x0,x1] × [y0,y1]."""
    if x1 < x0 or y1 < y0:
        return []
    out: list[tuple[int, int]] = []

    def rec(xlo: int, xhi: int, ylo: int, yhi: int) -> None:
        if xhi < x0 or xlo > x1 or yhi < y0 or ylo > y1:
            return
        if x0 <= xlo and xhi <= x1 and y0 <= ylo and yhi <= y1:
            size = xhi - xlo + 1
            d0 = min(
                hilbert_xy2d(cx, cy, bits)
                for cx in (xlo, xhi)
                for cy in (ylo, yhi)
            )
            out.append((d0, d0 + size * size - 1))
            return
        half = (xhi - xlo + 1) // 2
        xm, ym = xlo + half, ylo + half
        rec(xlo, xm - 1, ylo, ym - 1)
        rec(xlo, xm - 1, ym, yhi)
        rec(xm, xhi, ylo, ym - 1)
        rec(xm, xhi, ym, yhi)

    rec(0, 2**bits - 1, 0, 2**bits - 1)
    out.sort()
    merged: list[list[int]] = []
    for lo, hi in out:
        if merged and merged[-1][1] + 1 == lo:
            merged[-1][1] = hi
        else:
            merged.append([lo, hi])
    return [(lo, hi) for lo, hi in merged]


def hilbert_box_predicate(
    x0: int,
    x1: int,
    y0: int,
    y1: int,
    *,
    bits: int = H_BITS,
    prefix_shift: int = 16,
    max_ranges: int = 32,
    hval_col: str = "hval",
    file_col: str = "file_id",
    x_expr: str = "(l_orderkey % 1024)",
    y_expr: str = "(l_partkey % 1024)",
):
    """Spark Column for a 2-D box over a ``sink_hilbert_layout`` table —
    same three-tier structure as zcurve.z_box_predicate:

      file_id IN (<touched prefixes>)    -> PartitionFilters (dir pruning)
      AND (hval BETWEEN ... OR ...)      -> row-group min/max pruning
      AND x BETWEEN ... AND y BETWEEN    -> exact residual (coarsening-safe)
    """
    from functools import reduce

    from pyspark.sql import functions as F

    ranges = coarsen_ranges(hilbert_box_ranges(x0, x1, y0, y1, bits), max_ranges)
    if not ranges:
        return F.lit(False)
    h = F.col(hval_col)
    h_cond = reduce(lambda a, b: a | b, [h.between(lo, hi) for lo, hi in ranges])
    prefixes = sorted(
        {p for lo, hi in ranges for p in range(lo >> prefix_shift, (hi >> prefix_shift) + 1)}
    )
    residual = F.expr(x_expr).between(x0, x1) & F.expr(y_expr).between(y0, y1)
    return F.col(file_col).isin(prefixes) & h_cond & residual


def hilbert_bounds_predicate(
    x_lo: int | None = None,
    x_hi: int | None = None,
    y_lo: int | None = None,
    y_hi: int | None = None,
    *,
    bits: int = H_BITS,
    **kw,
):
    """One-sided / half-open predicates over the Hilbert layout — the
    mirror of zcurve.z_bounds_predicate (see its docstring for the
    clamp-to-domain argument and the coarsening bound): open sides clamp
    to [0, 2^bits - 1] and delegate to the exact box cover."""
    dom = 2**bits - 1
    return hilbert_box_predicate(
        0 if x_lo is None else x_lo,
        dom if x_hi is None else x_hi,
        0 if y_lo is None else y_lo,
        dom if y_hi is None else y_hi,
        bits=bits,
        **kw,
    )
