"""Trajectory operators over geotagged event streams.

A web-scale image crawl carries (device, timestamp, lng, lat) with every
upload; GPS glitches (cold fixes, tower snaps) inject teleport hops that
poison any location-derived training signal. ``trajectory_stats`` is the
standard cleaning pass: per device, order by time, measure each hop, and
flag hops whose implied speed exceeds ``v_max`` — reported alongside the
jump-cleaned travel distance.

All window SQL (one shuffle on the device key, linear in events), no
UDFs, and every reported number is integerized so the DuckDB oracle
matches bit-for-bit:

* hop distance: ``floor(sqrt(dx^2+dy^2) * 1e6)`` (µdeg, planar like the
  reference's distance kernel — geocoder.cpp:463-468 "not geodesic");
* time delta: ``unix_timestamp`` (Spark) == ``floor(epoch(ts))``
  (DuckDB) — the repo's epoch rule;
* the jump predicate multiplies instead of dividing
  (``dist_u > v_max_u * dt_s``): pure BIGINT arithmetic, no IEEE
  division to disagree on, and a zero dt (same-second fixes) flags any
  nonzero hop instead of dividing by zero.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SCALE6 = "CAST(1000000 AS DOUBLE)"


def hop_dist_u_sql(xp: str, yp: str, x: str, y: str) -> str:
    """Integerized planar hop distance — ONE ANSI text, both dialects."""
    dsq = f"(({x}-{xp})*({x}-{xp}) + ({y}-{yp})*({y}-{yp}))"
    return f"CAST(floor(sqrt({dsq}) * {_SCALE6}) AS BIGINT)"


def trajectory_stats(
    events: DataFrame,
    v_max_udeg_per_s: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lng_col: str = "lng",
    lat_col: str = "lat",
) -> DataFrame:
    """Per-device trajectory profile with GPS-jump flagging.

    Output: user_id, n_events, n_hops, n_jumps, clean_dist_u (sum of
    non-jump hop distances, µdeg). First fix of a device is not a hop.
    One window shuffle + one partial-agg shuffle.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    lagged = (
        events.withColumn("__ep", F.unix_timestamp(F.col(ts_col)))
        .withColumn("__xp", F.lag(lng_col).over(w))
        .withColumn("__yp", F.lag(lat_col).over(w))
        .withColumn("__epp", F.lag("__ep").over(w))
    )
    dist = F.expr(hop_dist_u_sql("__xp", "__yp", lng_col, lat_col))
    hops = lagged.withColumn("__dist_u", dist).withColumn(
        "__is_jump",
        (
            F.col("__dist_u")
            > F.lit(int(v_max_udeg_per_s)) * (F.col("__ep") - F.col("__epp"))
        ).cast("int"),
    )
    return hops.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("__dist_u").alias("n_hops"),
        F.coalesce(F.sum("__is_jump"), F.lit(0)).cast("long").alias("n_jumps"),
        F.coalesce(
            F.sum(
                F.when(F.col("__is_jump") == 0, F.col("__dist_u")).otherwise(
                    F.lit(0)
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("clean_dist_u"),
    )


def trajectory_stats_geo(
    events: DataFrame,
    v_max_m_per_s: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lng_col: str = "lng",
    lat_col: str = "lat",
) -> DataFrame:
    """Geodesic twin of ``trajectory_stats``: hops measured in REAL
    great-circle meters (``functions/geodesy.py``), so ``v_max`` is a
    physical speed (m/s) instead of the planar µdeg/s proxy — at lat 50°
    a µdeg of longitude is 40% shorter than at the equator, so the
    planar flag over- or under-fires with latitude while this one
    doesn't.

    The jump predicate stays pure-integer (``gdist_m > v_max * dt``):
    the meter integerization happens once per hop inside the haversine
    column (the geodesy canon), after which flagging and summing are
    BIGINT arithmetic — same determinism story as the planar operator,
    same one-window + one-agg plan.

    Output: user_id, n_events, n_hops, n_jumps, clean_dist_m.
    """
    from ..functions import geodesy as GD

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    lagged = (
        events.withColumn("__ep", F.unix_timestamp(F.col(ts_col)))
        .withColumn("__xp", F.lag(lng_col).over(w))
        .withColumn("__yp", F.lag(lat_col).over(w))
        .withColumn("__epp", F.lag("__ep").over(w))
    )
    dist = F.expr(
        GD.haversine_m_u_sql("__xp", "__yp", lng_col, lat_col, "spark")
    )
    hops = lagged.withColumn("__gdist_m", dist).withColumn(
        "__is_jump",
        (
            F.col("__gdist_m")
            > F.lit(int(v_max_m_per_s)) * (F.col("__ep") - F.col("__epp"))
        ).cast("int"),
    )
    return hops.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("__gdist_m").alias("n_hops"),
        F.coalesce(F.sum("__is_jump"), F.lit(0)).cast("long").alias("n_jumps"),
        F.coalesce(
            F.sum(
                F.when(F.col("__is_jump") == 0, F.col("__gdist_m")).otherwise(
                    F.lit(0)
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("clean_dist_m"),
    )


def stay_points(
    events: DataFrame,
    max_hop_m: int,
    min_duration_s: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lng_col: str = "lng",
    lat_col: str = "lat",
) -> DataFrame:
    """Stay-point detection (the Li/Zheng GPS-mining stage): a stay is a
    maximal run of consecutive fixes whose successive great-circle hops
    are all <= ``max_hop_m`` meters, lasting >= ``min_duration_s`` —
    "where did this device dwell", the signal behind home/work/POI
    attribution that raw fix streams can't answer.

    Relational formulation (windows only, no sequential scan): the
    geodesic hop (``functions/geodesy``) flags BREAKS (hop > max_hop_m
    or first fix), a running sum over the same per-device sort turns
    breaks into island ids (gaps-and-islands, the ``vectorize_raster``
    trick on the time axis), and one aggregate per (device, island)
    yields dwell span + integerized centroid. One window shuffle + one
    partial agg — linear in fixes, the same plan family as
    ``trajectory_stats``. Semantics note (documented difference from the
    original anchor-based scan): runs are chained by SUCCESSIVE hops, so
    a slow drift of many small hops can exceed ``max_hop_m`` end-to-end
    inside one stay — the relational trade every distributed
    re-formulation of this algorithm makes.

    Returns (user_col, stay_idx, n_fixes, t_start_ep, t_end_ep,
    duration_s, clng_u, clat_u): stay_idx numbers a device's stays in
    time order from 0; centroid is the fix mean, integerized floor(x *
    1e6) with an exact integer-sum/count division in BOTH engines.
    """
    from ..functions import geodesy as GD

    if max_hop_m < 1:
        raise ValueError(f"max_hop_m must be >= 1, got {max_hop_m}")
    if min_duration_s < 0:
        raise ValueError(f"min_duration_s must be >= 0, got {min_duration_s}")
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    lagged = (
        events.withColumn("__ep", F.unix_timestamp(F.col(ts_col)))
        .withColumn("__xp", F.lag(lng_col).over(w))
        .withColumn("__yp", F.lag(lat_col).over(w))
    )
    hop = F.expr(
        GD.haversine_m_u_sql("__xp", "__yp", lng_col, lat_col, "spark")
    )
    # first fix (NULL hop) starts an island; so does any over-radius hop
    brk = F.when(
        hop.isNull() | (hop > F.lit(int(max_hop_m))), F.lit(1)
    ).otherwise(F.lit(0))
    isl = lagged.withColumn("__brk", brk).withColumn(
        "__island", F.sum("__brk").over(w) - 1
    )
    # integerize coordinates BEFORE summing so the centroid division is
    # exact integer arithmetic in both engines (floor-sum/count, never an
    # IEEE mean whose accumulation order could differ)
    stays = isl.groupBy(user_col, "__island").agg(
        F.count(F.lit(1)).alias("n_fixes"),
        F.min("__ep").alias("t_start_ep"),
        F.max("__ep").alias("t_end_ep"),
        F.sum(F.floor(F.col(lng_col) * 1000000).cast("long")).alias("__sx"),
        F.sum(F.floor(F.col(lat_col) * 1000000).cast("long")).alias("__sy"),
    )
    return (
        stays.withColumn(
            "duration_s", F.col("t_end_ep") - F.col("t_start_ep")
        )
        .where(F.col("duration_s") >= int(min_duration_s))
        .withColumn(
            "stay_idx",
            F.row_number().over(
                Window.partitionBy(user_col).orderBy("t_start_ep", "__island")
            )
            - 1,
        )
        .select(
            user_col,
            F.col("stay_idx").cast("long").alias("stay_idx"),
            "n_fixes",
            "t_start_ep",
            "t_end_ep",
            "duration_s",
            F.floor(F.col("__sx") / F.col("n_fixes")).cast("long").alias("clng_u"),
            F.floor(F.col("__sy") / F.col("n_fixes")).cast("long").alias("clat_u"),
        )
    )


# ---------------------------------------------------------------------------
# Origin-destination flow matrix
# ---------------------------------------------------------------------------

def od_matrix(
    events: DataFrame,
    res: int,
    bucket_s: int = 3600,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lng_col: str = "lng",
    lat_col: str = "lat",
) -> DataFrame:
    """Origin-destination flows — the mobility-analytics rollup every
    trajectory dataset feeds (transport planning, demand matrices,
    migration maps): per (device, time bucket), the trip's origin cell
    is its FIRST fix and destination its LAST, then flows aggregate per
    (o_cell, d_cell) pair.

    One window shuffle total: a single sort per (device, bucket) gives
    both endpoints — ``rn = row_number()`` ascending plus ``cnt =
    count(*)`` over the same partition, origin = the rn=1 row and
    destination = the rn=cnt row (no second descending sort, no
    self-join). Two bounded partial-agg shuffles follow (trips, then
    flows). Stationary trips (o = d, including single-fix buckets) are
    real rows — a demand matrix's diagonal.

    Time buckets: ``floor(epoch / bucket_s)`` evaluated as the
    textually-identical double floor (exact below 2^53); the epoch
    itself follows the repo rule (unix_timestamp == floor(epoch(ts))).

    Output: (o_cell, d_cell, n_trips, n_users) — n_users the exact
    distinct-device count per flow.
    """
    from ..functions import cells as C

    if bucket_s < 1:
        raise ValueError(f"bucket_s must be >= 1, got {bucket_s}")
    hb = (
        f"CAST(floor(CAST(__ep AS DOUBLE) / CAST({int(bucket_s)} AS DOUBLE))"
        f" AS BIGINT)"
    )
    pos = (
        events.withColumn("__ep", F.unix_timestamp(F.col(ts_col)))
        .withColumn("__hb", F.expr(hb))
        .withColumn("__cell", F.expr(C.cell_sql(lng_col, lat_col, res, "spark")))
    )
    w = Window.partitionBy(user_col, "__hb").orderBy(ts_col, id_col)
    wc = Window.partitionBy(user_col, "__hb")
    marked = pos.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__cnt", F.count(F.lit(1)).over(wc)
    )
    trips = marked.groupBy(user_col, "__hb").agg(
        F.min(F.when(F.col("__rn") == 1, F.col("__cell"))).alias("o_cell"),
        F.min(
            F.when(F.col("__rn") == F.col("__cnt"), F.col("__cell"))
        ).alias("d_cell"),
    )
    return (
        trips.groupBy("o_cell", "d_cell")
        .agg(
            F.count(F.lit(1)).alias("n_trips"),
            F.countDistinct(user_col).alias("n_users"),
        )
    )


def od_matrix_oracle_sql(
    source_sql: str,
    res: int,
    bucket_s: int = 3600,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> str:
    """DuckDB twin: identical cell/bucket SQL, the same single-sort
    rn/cnt endpoint extraction."""
    from ..functions import cells as C

    cexpr = C.cell_sql("lng", "lat", res, "duckdb")
    hb = (
        f"CAST(floor(CAST(ep AS DOUBLE) / CAST({int(bucket_s)} AS DOUBLE))"
        f" AS BIGINT)"
    )
    return f"""
        WITH pos AS ({source_sql}),
        celled AS (
          SELECT {user_col}, {ts_col}, {id_col},
                 CAST(floor(epoch({ts_col})) AS BIGINT) AS ep,
                 {cexpr} AS cell
          FROM pos
        ),
        marked AS (
          SELECT {user_col}, cell, {hb} AS hb,
                 row_number() OVER (
                   PARTITION BY {user_col}, {hb}
                   ORDER BY {ts_col}, {id_col}
                 ) AS rn,
                 count(*) OVER (
                   PARTITION BY {user_col}, {hb}
                 ) AS cnt
          FROM celled
        ),
        trips AS (
          SELECT {user_col}, hb,
                 min(CASE WHEN rn = 1 THEN cell END) AS o_cell,
                 min(CASE WHEN rn = cnt THEN cell END) AS d_cell
          FROM marked GROUP BY {user_col}, hb
        )
        SELECT o_cell, d_cell,
               count(*)::BIGINT AS n_trips,
               count(DISTINCT {user_col})::BIGINT AS n_users
        FROM trips GROUP BY o_cell, d_cell
    """


# ---------------------------------------------------------------------------
# Travel-direction profiling (initial great-circle bearing, compass sectors)
# ---------------------------------------------------------------------------

def bearing_mdeg_sql(lat1: str, lng1: str, lat2: str, lng2: str) -> str:
    """Initial great-circle bearing from fix 1 to fix 2, integerized to
    MILLIDEGREES in [0, 360000) — one identical-text expression.

    Transcendental caveat (measured, 4000-coordinate fuzz): the raw
    DOUBLE bearing differs between Spark (JVM Math) and DuckDB (libm)
    in the last ulp on ~17% of inputs, unlike the haversine chain —
    atan2 is not correctly-rounded-guaranteed. floor at 1e-6 deg showed
    0/4000 splits; this integerizes at 1e-3 deg for ~1000x more margin
    (boundary-straddle odds ~1e-11/row), pinned by the cross-engine
    fuzz suite."""
    brg = (
        f"atan2(sin(radians({lng2} - {lng1})) * cos(radians({lat2})), "
        f"cos(radians({lat1})) * sin(radians({lat2}))"
        f" - sin(radians({lat1})) * cos(radians({lat2}))"
        f" * cos(radians({lng2} - {lng1})))"
    )
    mdeg = f"CAST(floor(degrees({brg}) * CAST(1000 AS DOUBLE)) AS BIGINT)"
    return f"(({mdeg} + 360000) % 360000)"


def heading_profile(
    events: DataFrame,
    n_sectors: int = 8,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lng_col: str = "lng",
    lat_col: str = "lat",
) -> DataFrame:
    """Dominant travel direction per device: compass-sector histogram of
    successive-fix bearings (the circular-data-safe alternative to a
    naive heading mean, which is meaningless on angles), reporting the
    modal sector. Commute-axis detection, bot-trajectory screening
    (uniform headings), and map-matching priors all start here.

    Same one-window shape as trajectory_stats (lag per device by (ts,
    id)); zero-length hops are excluded (bearing undefined at a point);
    sector = bearing_mdeg / (360000 / n_sectors) via exact integer
    compare-free arithmetic; modal sector by (count desc, sector) —
    deterministic.

    Output: (user_id, dominant_sector, n_in_sector, n_hops).
    """
    if n_sectors < 2 or 360000 % n_sectors != 0:
        raise ValueError(
            f"n_sectors must divide 360000 evenly, got {n_sectors}"
        )
    width = 360000 // n_sectors
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    lagged = (
        events.withColumn("__xp", F.lag(lng_col).over(w))
        .withColumn("__yp", F.lag(lat_col).over(w))
        .where(F.col("__xp").isNotNull())
        .where(
            (F.col("__xp") != F.col(lng_col))
            | (F.col("__yp") != F.col(lat_col))
        )
    )
    # explicit floor: bare CAST(double AS BIGINT) truncates in Spark but
    # ROUNDS in DuckDB (the CLAUDE.md epoch rule's cousin); operands are
    # exact (< 2^53) so the floored quotient is the exact integer
    # division and sector lands in [0, n_sectors)
    sector = F.expr(
        f"CAST(floor(CAST({bearing_mdeg_sql('__yp', '__xp', lat_col, lng_col)}"
        f" AS DOUBLE) / CAST({width} AS DOUBLE)) AS BIGINT)"
    )
    hist = (
        lagged.groupBy(F.col(user_col), sector.alias("sector"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy(user_col)
    top = Window.partitionBy(user_col).orderBy(
        F.col("n").desc(), F.col("sector")
    )
    return (
        hist.withColumn("n_hops", F.sum("n").over(tot))
        .withColumn("__rk", F.row_number().over(top))
        .where(F.col("__rk") == 1)
        .selectExpr(
            f"{user_col}",
            "sector AS dominant_sector",
            "n AS n_in_sector",
            "CAST(n_hops AS BIGINT) AS n_hops",
        )
    )


def co_movement(
    events: DataFrame,
    distance: float,
    bucket_s: int = 86400,
    min_buckets: int = 2,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lng_col: str = "lng",
    lat_col: str = "lat",
) -> DataFrame:
    """Co-movement mining — device pairs repeatedly CLOSE IN SPACE *AND*
    TIME (convoy/companionship detection, the contact-tracing and
    carpool-discovery primitive; for an image corpus: camera pairs that
    shoot the same places on the same days).

    Per (device, time bucket) a single REPRESENTATIVE fix is chosen —
    the first by (ts, event_id), one window pass, deterministic and
    float-free — then the space-time pair join runs through
    ``within_distance_self_join(key_cols=("bucket",))``: blocking is on
    (bucket, 3x3 cell), so pairs only form inside one bucket and the
    all-time corpus joins slice by slice (the temporal key rides the
    shuffle for free — at 10^12 pings no cross-day candidate is ever
    generated). Pairs then roll up per (device, device): bucket count +
    integer min/max distance, kept when seen in >= ``min_buckets``
    distinct buckets.

    One representative per (device, bucket) makes ``count(*)`` already
    a DISTINCT bucket count — no countDistinct shuffle. Time buckets:
    the canonical textually-identical double floor of the repo-rule
    epoch (unix_timestamp == floor(epoch(ts))).

    Output: (user_1, user_2, n_buckets, min_dist_u, max_dist_u),
    user_1 < user_2, all BIGINT.
    """
    from . import spatial_join as SJ

    if min_buckets < 1:
        raise ValueError(f"min_buckets must be >= 1, got {min_buckets}")
    if bucket_s < 1:
        raise ValueError(f"bucket_s must be >= 1, got {bucket_s}")
    hb = (
        f"CAST(floor(CAST(__ep AS DOUBLE) / CAST({int(bucket_s)} AS DOUBLE))"
        f" AS BIGINT)"
    )
    pos = (
        events.withColumn("__ep", F.unix_timestamp(F.col(ts_col)))
        .withColumn("bucket", F.expr(hb))
    )
    w = Window.partitionBy(user_col, "bucket").orderBy(ts_col, id_col)
    reps = (
        pos.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            F.col(user_col).alias("point_id"), "bucket",
            F.col(lng_col).alias("lng"), F.col(lat_col).alias("lat"),
        )
    )
    pairs = SJ.within_distance_self_join(
        reps, distance=distance, key_cols=("bucket",)
    )
    return (
        pairs.groupBy("id_1", "id_2")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.min("dist_u").alias("min_dist_u"),
            F.max("dist_u").alias("max_dist_u"),
        )
        .where(F.col("n_buckets") >= min_buckets)
        .select(
            F.col("id_1").cast("long").alias("user_1"),
            F.col("id_2").cast("long").alias("user_2"),
            "n_buckets", "min_dist_u", "max_dist_u",
        )
    )


def co_movement_oracle_sql(
    source_sql: str,
    distance: float,
    bucket_s: int = 86400,
    min_buckets: int = 2,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> str:
    """DuckDB twin: identical bucket/representative SQL, then the BRUTE
    same-bucket pair join (a.id < b.id, raw-distance filter, the
    point_pairs dist text) — the blocked join's exactly-once contract
    re-derived without cells."""
    hb = (
        f"CAST(floor(CAST(ep AS DOUBLE) / CAST({int(bucket_s)} AS DOUBLE))"
        f" AS BIGINT)"
    )
    d2 = (
        "sqrt((a.lng - b.lng) * (a.lng - b.lng)"
        " + (a.lat - b.lat) * (a.lat - b.lat))"
    )
    return f"""
        WITH pos AS ({source_sql}),
        epd AS (
          SELECT {user_col} AS uid, {ts_col} AS uts, {id_col} AS uev,
                 lng, lat, CAST(floor(epoch({ts_col})) AS BIGINT) AS ep
          FROM pos
        ),
        reps AS (
          SELECT uid, {hb} AS bucket, lng, lat
          FROM epd
          QUALIFY row_number() OVER (
            PARTITION BY uid, {hb} ORDER BY uts, uev
          ) = 1
        ),
        pairs AS (
          SELECT a.uid AS user_1, b.uid AS user_2,
                 CAST(floor({d2} * 1000000.0) AS BIGINT) AS dist_u
          FROM reps a JOIN reps b
            ON a.bucket = b.bucket AND a.uid < b.uid
          WHERE {d2} <= {distance}
        )
        SELECT user_1::BIGINT AS user_1, user_2::BIGINT AS user_2,
               CAST(count(*) AS BIGINT) AS n_buckets,
               min(dist_u) AS min_dist_u, max(dist_u) AS max_dist_u
        FROM pairs
        GROUP BY user_1, user_2
        HAVING count(*) >= {min_buckets}
    """
