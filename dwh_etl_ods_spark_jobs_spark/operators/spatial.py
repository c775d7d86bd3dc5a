"""Planar spatial operators: grid-bucketed radius self-join.

The reference warehouse has no spatial surface (its facility dimension
carries codes, not coordinates — cf. ``LoadFacilityInfo`` join keys in
the catalog survey), but a pipeline enriching events with geo columns
needs the classic "all pairs within distance r" primitive, and the naive
form is a cross join. The distributed answer is the uniform-grid
partition join: bucket points into r-sized cells, replicate ONE side of
the join into its 3x3 cell neighborhood, equi-join on the cell key, and
verify the exact distance — every qualifying pair is found in exactly
one (cell, offset) combination, so no post-join dedup pass is needed.

Exactness discipline: integer coordinates (the caller owns the
quantization — meters, micro-degrees, whatever), integer squared
distances; no floats anywhere, so Spark and DuckDB agree bit-for-bit.

Scale: the explode is a bounded x9 map-side fan-out on one side only;
the join keys are uniform grid cells when points are spread. The
adversarial shape is a DENSE CELL (all points in one bucket -> that
cell's pairs are quadratic, which is irreducible: the OUTPUT is
quadratic there). The cell-sizing contract mirrors the
hot-shingle cap discipline: size ``radius`` so cells hold O(100) points at the
target density, and pre-aggregate coincident points upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["grid_radius_pairs", "grid_radius_pairs_sql"]


def grid_radius_pairs(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
    max_per_cell: int | None = None,
) -> DataFrame:
    """All unordered point pairs within EUCLIDEAN distance ``radius``::

        (id_a, id_b, dist2)

    ``points`` carries integer planar coordinates; ``dist2`` is the
    exact integer squared distance (callers threshold on ``radius²`` —
    no square root ever happens, so no float). ``id_a < id_b``; each
    pair appears exactly once (the relative-cell offset of a pair is
    unique, so the 3x3 replication can never double-count).

    ``max_per_cell`` is the in-operator hot-key cap (the hot-shingle /
    copurchase-basket discipline): when set, points in cells holding
    MORE than ``max_per_cell`` points leave the pair domain entirely —
    STATED SEMANTICS, not an approximation flag. A single pathological
    cell (every scraper bot geocoded to (0, 0)) is C(n_cell, 2) pairs
    from one key; the cap bounds that to zero output and linear work
    while the organically-spread points are untouched. Excluded-cell
    census is one groupBy for the caller.

    Scale: cell width = ``radius`` means candidates live in adjacent
    cells ONLY; the left side replicates x9 by a literal inline array
    (map-side, no shuffle), both sides then shuffle ONCE on the uniform
    (cx, cy) grid key and the verify filter runs inside the join. The
    dense-cell contract is documented at module level; the cap above
    makes it enforceable in-operator.
    """
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    r = int(radius)
    pts = points.select(
        F.col(id_col).cast("long").alias("_id"),
        x.alias("_x"),
        y.alias("_y"),
        # floor division keeps negative coordinates on the right cell
        F.floor(x / F.lit(r)).cast("long").alias("_cx"),
        F.floor(y / F.lit(r)).cast("long").alias("_cy"),
    )
    if max_per_cell is not None:
        hot = (
            pts.groupBy("_cx", "_cy")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > int(max_per_cell))
            .select("_cx", "_cy")
        )
        pts = pts.join(hot, ["_cx", "_cy"], "left_anti")
    pts = pts.localCheckpoint(eager=False)  # both join sides read the cells
    offsets = F.expr(
        "array(" + ", ".join(
            f"named_struct('dx', {dx}L, 'dy', {dy}L)"
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ) + ")"
    )
    left = (
        pts.withColumn("_o", F.explode(offsets))
        .select(
            F.col("_id").alias("id_a"),
            F.col("_x").alias("_xa"),
            F.col("_y").alias("_ya"),
            (F.col("_cx") + F.col("_o.dx")).alias("_jx"),
            (F.col("_cy") + F.col("_o.dy")).alias("_jy"),
        )
    )
    right = pts.select(
        F.col("_id").alias("id_b"),
        F.col("_x").alias("_xb"),
        F.col("_y").alias("_yb"),
        F.col("_cx").alias("_jx"),
        F.col("_cy").alias("_jy"),
    )
    dx = F.col("_xa") - F.col("_xb")
    dy = F.col("_ya") - F.col("_yb")
    dist2 = dx * dx + dy * dy
    return (
        left.join(right, ["_jx", "_jy"])
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (dist2 <= F.lit(r) * F.lit(r))
        )
        .select("id_a", "id_b", dist2.cast("long").alias("dist2"))
    )


def grid_radius_pairs_sql(
    points_cte: str,
    id_expr: str,
    x_expr: str,
    y_expr: str,
    radius: int,
    max_per_cell: int | None = None,
) -> str:
    """DuckDB rendering of :func:`grid_radius_pairs` — same grid, same
    single-discovery offset join, same hot-cell exclusion, pure integer
    arithmetic.

    DuckDB's integer ``/`` is float division, so the cell index uses
    explicit ``floor(CAST ... / r)`` to match Spark's ``floor(x / r)``
    on negatives (both engines: floor of the true quotient).
    """
    r = int(radius)
    cap_cte = (
        f"""pts AS (
  SELECT p0.* FROM pts0 p0
  LEFT JOIN (SELECT cx, cy FROM pts0 GROUP BY cx, cy
             HAVING count(*) > {int(max_per_cell)}) h
    ON p0.cx = h.cx AND p0.cy = h.cy
  WHERE h.cx IS NULL
),"""
        if max_per_cell is not None
        else "pts AS (SELECT * FROM pts0),"
    )
    return f"""
WITH pts0 AS (
  SELECT CAST({id_expr} AS BIGINT) AS id,
         CAST({x_expr} AS BIGINT) AS x, CAST({y_expr} AS BIGINT) AS y,
         CAST(floor(CAST({x_expr} AS DOUBLE) / {r}.0) AS BIGINT) AS cx,
         CAST(floor(CAST({y_expr} AS DOUBLE) / {r}.0) AS BIGINT) AS cy
  FROM {points_cte}
),
{cap_cte}
lhs AS (
  SELECT p.id AS id_a, p.x AS xa, p.y AS ya,
         p.cx + o.dx AS jx, p.cy + o.dy AS jy
  FROM pts p,
       (SELECT dx1.r AS dx, dy1.r AS dy
        FROM (SELECT unnest(range(-1, 2)) AS r) dx1,
             (SELECT unnest(range(-1, 2)) AS r) dy1) o
)
SELECT l.id_a, p.id AS id_b,
       CAST((l.xa - p.x) * (l.xa - p.x)
            + (l.ya - p.y) * (l.ya - p.y) AS BIGINT) AS dist2
FROM lhs l JOIN pts p ON l.jx = p.cx AND l.jy = p.cy
WHERE l.id_a < p.id
  AND (l.xa - p.x) * (l.xa - p.x) + (l.ya - p.y) * (l.ya - p.y)
      <= {r}::BIGINT * {r}::BIGINT
"""
