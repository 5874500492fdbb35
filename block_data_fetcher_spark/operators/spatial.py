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


def q_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius self-join: all customer-point pairs within 50 km, found
    by 1°-cell grid blocking with a 3×3 neighbor stencil and verified
    with the exact haversine — the standard distributed spatial join
    (the stencil side replicates 9×; the equi-join on cell id shuffles
    (id, lat, lon) only; candidate work is Σ cell-pair sizes, not n²).
    Guaranteed-complete because cell edge (1°) exceeds the radius'
    angular extent at |lat| ≤ 60 in both axes. The DuckDB oracle runs
    the O(n²) all-pairs join — the blocked plan must return exactly
    the same pairs."""
    pts = synth_points(spark, sf_dir)
    cx = F.floor(F.col("lon") / CELL_DEG).cast("long")
    cy = F.floor(F.col("lat") / CELL_DEG).cast("long")
    # probe side: home cell only
    probe = pts.select(
        F.col("point_id").alias("id_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        cx.alias("cx"),
        cy.alias("cy"),
    )
    # build side: replicate into the 3x3 stencil
    offs = F.explode(
        F.array(
            *[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
            ]
        )
    ).alias("o")
    build = pts.select(
        F.col("point_id").alias("id_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        cx.alias("bx"),
        cy.alias("by"),
        offs,
    ).select(
        "id_a",
        "lat_a",
        "lon_a",
        (F.col("bx") + F.col("o.dx")).alias("cx"),
        (F.col("by") + F.col("o.dy")).alias("cy"),
    )
    cand = build.join(probe, ["cx", "cy"]).where(
        F.col("id_a") < F.col("id_b")
    )
    # Sound bounding-box prefilter before the trig: great-circle km ≥
    # 110.0 × |Δlat°| (meridian arc is ≥110.57 km/deg) and ≥ 110.0 ×
    # cos(max |lat|) × |Δlon°| (parallel arc shrinks by cos lat), so a
    # pair failing either cheap comparison can never pass the 50 km
    # haversine — candidates are pruned with 2 multiplies instead of
    # 5 trig calls. Physical-only: the emitted pair set is unchanged
    # (the sf10 proof measured ~4× fewer haversine evaluations; the
    # surviving ~quadratic growth is the OUTPUT pair count itself,
    # which grows with density² at fixed radius by definition).
    lat_gap_ok = F.abs(F.col("lat_a") - F.col("lat_b")) * 110.0 <= F.lit(
        RADIUS_KM
    )
    cos_max = F.cos(
        F.radians(F.greatest(F.abs(F.col("lat_a")), F.abs(F.col("lat_b"))))
    )
    lon_gap_ok = (
        F.abs(F.col("lon_a") - F.col("lon_b")) * 110.0 * cos_max
        <= F.lit(RADIUS_KM)
    )
    dist = haversine_km(
        F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
    )
    return (
        cand.where(lat_gap_ok & lon_gap_ok)
        .withColumn("dist_km", dist)
        .where(F.col("dist_km") <= F.lit(RADIUS_KM))
        .select(
            "id_a",
            "id_b",
            (F.round(F.col("dist_km") + F.lit(1e-9), 3) + 0.0).alias(
                "dist_km"
            ),
        )
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
