"""Geospatial operators: grid-blocked radius join + density rollup.

The reference has no spatial surface; a complete analytics engine
needs one, and the distributed shape matters at 100 TB: a naive
radius self-join is O(n²) — the scalable plan is GRID BLOCKING
(geohash-style): bucket points into fixed-degree cells, emit each
point into its own cell plus the 3×3 neighbor stencil on ONE side of
the join, equi-join on cell id, then verify the exact haversine
distance. Every qualifying pair is guaranteed to be found as long as
the cell edge ≥ the search radius' angular extent — the same
bound-the-blocking-error argument as the LSH band/pigeonhole designs
elsewhere in this engine.

Latitude guard: longitude degrees shrink by cos(lat), so the angular
extent of a fixed-km radius diverges toward the poles. The synthetic
corpus pins |lat| ≤ 60° where 50 km ≤ 0.9° of longitude; production
would switch to a polar-cap special case or an S2/H3 cell scheme
(same join shape, different cell function).

Determinism: coordinates are integer-derived from customer keys, and
both engines evaluate the IDENTICAL haversine expression tree on IEEE
doubles, so the pair sets (raw-double compare) and rounded distances
hash-match exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table

EARTH_R_KM = 6371.0
RADIUS_KM = 50.0
CELL_DEG = 1.0  # >= 50km angular extent at |lat| <= 60


def synth_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic point-of-presence per customer: integer-derived
    lat in [-60, 60), lon in [-180, 180)."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    lat = ((F.col("c_custkey") * 7919) % 12000) / 100.0 - 60.0
    lon = ((F.col("c_custkey") * 104729) % 36000) / 100.0 - 180.0
    return c.select(
        F.col("c_custkey").alias("point_id"),
        lat.alias("lat"),
        lon.alias("lon"),
    )


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance, written as the exact expression tree the
    oracle SQL mirrors (operand order preserved for IEEE equality)."""
    dphi = F.radians(lat2 - lat1) / 2
    dlmb = F.radians(lon2 - lon1) / 2
    a = F.sin(dphi) * F.sin(dphi) + F.cos(F.radians(lat1)) * F.cos(
        F.radians(lat2)
    ) * F.sin(dlmb) * F.sin(dlmb)
    return 2 * EARTH_R_KM * F.asin(F.sqrt(a))


# Half of the 3×3 neighbor stencil: exactly ONE of each ±offset pair
# (plus the home cell). Every unordered pair of Chebyshev-adjacent
# cells {c, c+off} is covered in exactly one direction, so each
# qualifying point pair is generated ONCE — the build side replicates
# 5× instead of 9×, and no post-join dedup of mirrored pairs is
# needed (the sf10 proof run measured the full-stencil variant at
# 48.8× the sf1 wall; the pair join's shuffle and candidate count
# both halve with the symmetric stencil).
_HALF_STENCIL = ((0, 0), (0, 1), (1, -1), (1, 0), (1, 1))


def _radius_pairs(
    spark: SparkSession,
    sf_dir: str,
    points: DataFrame | None = None,
    radius_km: float = RADIUS_KM,
    cell_deg: float = CELL_DEG,
) -> DataFrame:
    """All point pairs within ``radius_km``, normalized to
    id_a < id_b, with the RAW haversine double (callers round for
    output). Grid blocking: bucket into ``cell_deg``° cells,
    replicate the build side into the half stencil, equi-join on cell
    id, bounding-box prune, exact haversine verify.
    Guaranteed-complete because the cell edge exceeds the radius'
    angular extent at |lat| ≤ 60 in both axes (callers must pick
    cell_deg ≥ radius_km / (110 · cos 60°) ≈ radius_km / 55),
    one of {c→c', c'→c} is always in the half stencil, and the
    longitude cell index WRAPS modulo 360: points at lon ±179.97° are
    ~4 km apart across the anti-meridian, so cells −180 and +179 are
    adjacent on the sphere (caught round 6: the unwrapped grid missed
    850 real pairs at sf1 — latent until a scale with pairs near the
    seam, since the driver's sf0.01 fixture has no 50 km pairs at
    all). Latitude needs no wrap (|lat| ≤ 60 keeps cells off the
    poles)."""
    import math

    pts = points if points is not None else synth_points(spark, sf_dir)
    n_lon_cells = int(round(360.0 / cell_deg))
    # cell_deg must tile the 360° circle EXACTLY: a non-divisor (e.g.
    # 0.7°) leaves a narrower seam cell at the anti-meridian whose
    # edge can undercut the radius' angular extent, silently missing
    # pairs across the seam (ADVICE r6) — fail loudly instead.
    if not math.isclose(n_lon_cells * cell_deg, 360.0, rel_tol=0, abs_tol=1e-9):
        raise ValueError(
            f"cell_deg={cell_deg} does not divide 360° evenly "
            f"({n_lon_cells} cells × {cell_deg}° = {n_lon_cells * cell_deg}°); "
            "the anti-meridian seam cell would be narrower than the "
            "radius requires — pick a divisor of 360"
        )
    half_turn = n_lon_cells // 2
    raw_cx = F.floor(F.col("lon") / cell_deg).cast("long")
    cy = F.floor(F.col("lat") / cell_deg).cast("long")
    # probe side: home cell only (lon index wrapped to [0, n_cells))
    probe = pts.select(
        F.col("point_id").alias("id_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        F.pmod(raw_cx + F.lit(half_turn), F.lit(n_lon_cells)).alias("cx"),
        cy.alias("cy"),
    )
    # build side: replicate into the HALF stencil; home marks the
    # (0,0) copy, whose within-cell pairs need the id-order filter
    # (they appear in both orders; cross-cell pairs appear once)
    offs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(dx).alias("dx"),
                    F.lit(dy).alias("dy"),
                    F.lit(dx == 0 and dy == 0).alias("home"),
                )
                for dx, dy in _HALF_STENCIL
            ]
        )
    ).alias("o")
    build = pts.select(
        F.col("point_id").alias("id_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        raw_cx.alias("bx"),
        cy.alias("by"),
        offs,
    ).select(
        "id_a",
        "lat_a",
        "lon_a",
        F.pmod(
            F.col("bx") + F.col("o.dx") + F.lit(half_turn), F.lit(n_lon_cells)
        ).alias("cx"),
        (F.col("by") + F.col("o.dy")).alias("cy"),
        F.col("o.home").alias("home"),
    )
    cand = build.join(probe, ["cx", "cy"]).where(
        F.when(F.col("home"), F.col("id_a") < F.col("id_b")).otherwise(
            F.col("id_a") != F.col("id_b")
        )
    )
    # Sound bounding-box prefilter before the trig: great-circle km ≥
    # 110.0 × |Δlat°| (meridian arc is ≥110.57 km/deg) and ≥ 110.0 ×
    # cos(max |lat|) × |Δlon°| (parallel arc shrinks by cos lat), so a
    # pair failing either cheap comparison can never pass the 50 km
    # haversine — candidates are pruned with 2 multiplies instead of
    # 5 trig calls. Physical-only: the emitted pair set is unchanged
    # (the sf10 proof measured ~4× fewer haversine evaluations; the
    # surviving ~quadratic growth is the OUTPUT pair count itself,
    # which grows with density² at fixed radius by definition —
    # densify the world 10× and there ARE ~100× more pairs to emit;
    # no plan outruns its own output size. The bounded-output scale
    # query is q_spatial_nn below).
    lat_gap_ok = F.abs(F.col("lat_a") - F.col("lat_b")) * 110.0 <= F.lit(
        radius_km
    )
    cos_max = F.cos(
        F.radians(F.greatest(F.abs(F.col("lat_a")), F.abs(F.col("lat_b"))))
    )
    # wrap-aware lon gap: a pair straddling the anti-meridian has
    # |Δlon| ≈ 360 but a tiny great-circle separation — the true
    # angular gap is min(|Δ|, 360 − |Δ|)
    lon_gap = F.abs(F.col("lon_a") - F.col("lon_b"))
    lon_gap_ok = (
        F.least(lon_gap, F.lit(360.0) - lon_gap) * 110.0 * cos_max
        <= F.lit(radius_km)
    )
    # Cross-cell survivors may arrive with id_a > id_b; the oracle
    # always evaluates haversine(lower-id, higher-id), and libm trig
    # is not guaranteed bit-symmetric under operand swap — so SWAP
    # FIRST, then evaluate the distance with the exact operand order
    # the oracle uses.
    lo_is_a = F.col("id_a") < F.col("id_b")
    lat1 = F.when(lo_is_a, F.col("lat_a")).otherwise(F.col("lat_b"))
    lon1 = F.when(lo_is_a, F.col("lon_a")).otherwise(F.col("lon_b"))
    lat2 = F.when(lo_is_a, F.col("lat_b")).otherwise(F.col("lat_a"))
    lon2 = F.when(lo_is_a, F.col("lon_b")).otherwise(F.col("lon_a"))
    return (
        cand.where(lat_gap_ok & lon_gap_ok)
        .select(
            F.least(F.col("id_a"), F.col("id_b")).alias("id_a"),
            F.greatest(F.col("id_a"), F.col("id_b")).alias("id_b"),
            haversine_km(lat1, lon1, lat2, lon2).alias("dist_km"),
        )
        .where(F.col("dist_km") <= F.lit(radius_km))
    )


def q_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius self-join: all customer-point pairs within 50 km, found
    by 1°-cell grid blocking with a HALF 3×3 neighbor stencil (each
    unordered cell pair covered exactly once — see _radius_pairs) and
    verified with the exact haversine — the standard distributed
    spatial join (the stencil side replicates 5×; the equi-join on
    cell id shuffles (id, lat, lon) only; candidate work is Σ
    cell-pair sizes, not n²). The DuckDB oracle runs the O(n²)
    all-pairs join — the blocked plan must return exactly the same
    pairs. NB the OUTPUT of a fixed-radius all-pairs query is itself
    quadratic in density (fixed fixture world ⇒ ~100× pairs at 10×
    rows); q_spatial_nn is the O(N)-output production shape."""
    return _radius_pairs(spark, sf_dir).select(
        "id_a",
        "id_b",
        (F.round(F.col("dist_km") + F.lit(1e-9), 3) + 0.0).alias("dist_km"),
    )


NN_RADIUS_KM = 40.0  # tighter search radius for the per-point NN query
# (40, not 25: the congruential fixture lattice has min pair distance
# ~31 km at sf0.1 — a 25 km radius returned ZERO rows at every tested
# sf, making the oracle gate vacuous; 40 km yields ~2.4k pairs at
# sf0.1, and tests/test_oracle.py pins the non-vacuity)
NN_CELL_DEG = 0.75  # ≥ 40 km angular extent at |lat| ≤ 60 (40/55.66 ≈ 0.72°)


def q_spatial_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest neighbor within 40 km per point — the bounded-output
    spatial query a pipeline actually runs at 100 TB (q_spatial_join's
    full pair enumeration grows with density²; this output is ≤ one
    row per point no matter how dense the world gets). The tighter
    radius also picks a FINER grid (0.75° cells — the cell size must
    only dominate the radius' angular extent, so a smaller radius
    legitimately buys ~4× fewer per-cell candidates: candidate work
    ∝ N · density · cell_area). Reuses the half-stencil pair
    generation, mirrors each normalized pair to both endpoints
    (map-side, no extra shuffle of the input), and takes min(dist)
    per point — a partial-aggregatable reduction, so the shuffle
    carries |points| rows, not |pairs|. Ties break toward the lower
    neighbor id. Cross-engine determinism caveat (ADVICE r6): each
    engine computes its OWN haversine doubles (JVM Math vs libm can
    differ by ulps), so two near-equidistant neighbors could in
    principle rank differently per engine; WITHIN each engine the
    ranking is consistent because the pair distance is evaluated once
    (lower-id operand first) and reused for both endpoints. The
    fixture's inter-point spacing makes a cross-engine flip
    astronomically unlikely, and the sf0.1 gate additionally asserts
    every point's top-2 neighbor distances are separated by far more
    than accumulated ulp error (tests/test_oracle.py)."""
    pr = _radius_pairs(
        spark, sf_dir, radius_km=NN_RADIUS_KM, cell_deg=NN_CELL_DEG
    )
    both = pr.select(
        F.col("id_a").alias("point_id"),
        F.col("id_b").alias("nn_id"),
        "dist_km",
    ).unionAll(
        pr.select(
            F.col("id_b").alias("point_id"),
            F.col("id_a").alias("nn_id"),
            "dist_km",
        )
    )
    best = both.groupBy("point_id").agg(
        F.min(F.struct(F.col("dist_km"), F.col("nn_id"))).alias("b")
    )
    return best.select(
        "point_id",
        F.col("b.nn_id").alias("nn_id"),
        (F.round(F.col("b.dist_km") + F.lit(1e-9), 3) + 0.0).alias("dist_km"),
    )


def q_geo_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-density rollup (the heatmap aggregate): points per 1° grid
    cell, top-20 densest cells with their mean position. One
    map-side-combinable aggregation over cell ids — at 100 TB the
    shuffle carries |occupied cells| rows."""
    pts = synth_points(spark, sf_dir)
    binned = pts.select(
        F.floor(F.col("lon") / CELL_DEG).cast("long").alias("cx"),
        F.floor(F.col("lat") / CELL_DEG).cast("long").alias("cy"),
        "lat",
        "lon",
    )
    return (
        binned.groupBy("cx", "cy")
        .agg(
            F.count("*").alias("n_points"),
            (F.round(F.avg("lat") + F.lit(1e-9), 4) + 0.0).alias("mean_lat"),
            (F.round(F.avg("lon") + F.lit(1e-9), 4) + 0.0).alias("mean_lon"),
        )
        .orderBy(F.desc("n_points"), F.asc("cx"), F.asc("cy"))
        .limit(20)
    )


_HAVERSINE_SQL = """
    2 * 6371.0 * asin(sqrt(
      sin(radians(b.lat - a.lat) / 2) * sin(radians(b.lat - a.lat) / 2)
      + cos(radians(a.lat)) * cos(radians(b.lat))
        * sin(radians(b.lon - a.lon) / 2) * sin(radians(b.lon - a.lon) / 2)))
"""

_POINTS_SQL = """
    SELECT c_custkey AS point_id,
           (c_custkey * 7919) % 12000 / 100.0 - 60.0 AS lat,
           (c_custkey * 104729) % 36000 / 100.0 - 180.0 AS lon
    FROM customer
"""

ORACLE: dict[str, str] = {
    "q_spatial_join": f"""
        -- brute-force O(n^2) reference for the grid-blocked join
        WITH pts AS ({_POINTS_SQL})
        SELECT a.point_id AS id_a, b.point_id AS id_b,
               round({_HAVERSINE_SQL} + 1e-9, 3) + 0.0 AS dist_km
        FROM pts a JOIN pts b ON a.point_id < b.point_id
        WHERE {_HAVERSINE_SQL} <= 50.0
    """,
    "q_spatial_nn": f"""
        -- brute-force per-point nearest-neighbor-in-radius reference
        WITH pts AS ({_POINTS_SQL}),
        pr AS (
          SELECT a.point_id AS ia, b.point_id AS ib, {_HAVERSINE_SQL} AS d
          FROM pts a JOIN pts b ON a.point_id < b.point_id
          WHERE {_HAVERSINE_SQL} <= 40.0
        ),
        mirrored AS (
          SELECT ia AS point_id, ib AS nn_id, d FROM pr
          UNION ALL
          SELECT ib AS point_id, ia AS nn_id, d FROM pr
        )
        SELECT point_id, nn_id, round(d + 1e-9, 3) + 0.0 AS dist_km
        FROM (
          SELECT point_id, nn_id, d, row_number() OVER (
            PARTITION BY point_id ORDER BY d ASC, nn_id ASC) AS rn
          FROM mirrored
        ) WHERE rn = 1
    """,
    "q_geo_density": f"""
        WITH pts AS ({_POINTS_SQL})
        SELECT CAST(floor(lon / 1.0) AS BIGINT) AS cx,
               CAST(floor(lat / 1.0) AS BIGINT) AS cy,
               count(*) AS n_points,
               round(avg(lat) + 1e-9, 4) + 0.0 AS mean_lat,
               round(avg(lon) + 1e-9, 4) + 0.0 AS mean_lon
        FROM pts GROUP BY 1, 2
        ORDER BY n_points DESC, cx ASC, cy ASC
        LIMIT 20
    """,
}
