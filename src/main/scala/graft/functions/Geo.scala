package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geospatial primitives for station/point analytics — the reference's
  * `stations` dimension carries (latitude, longitude)
  * (`adls_bikeshare_project_IsmaelDawuda.ipynb` schema nb:991) but the
  * notebook never computes with them; this supplies the distance and
  * proximity-join layer a geo-aware pipeline needs.
  */
object Geo {

  private val EarthRadiusKm = 6371.0

  /** Great-circle distance in km (haversine). Pure scalar trigonometry —
    * scan-side, codegen-friendly, replayable in any engine with libm.
    */
  def haversineKm(lat1: Column, lon1: Column,
                  lat2: Column, lon2: Column): Column = {
    val toRad = math.Pi / 180.0
    val dLat = (lat2 - lat1) * toRad
    val dLon = (lon2 - lon1) * toRad
    val a = pow(sin(dLat / 2), 2) +
      cos(lat1 * toRad) * cos(lat2 * toRad) * pow(sin(dLon / 2), 2)
    lit(2 * EarthRadiusKm) * asin(sqrt(a))
  }

  /** All point pairs within `maxKm` of each other — the station-proximity
    * / dedup-by-location self-join, WITHOUT the all-pairs cross product:
    * points land in a lat/lon grid whose cells are ≥ maxKm on each side
    * (longitude width scaled by the corpus's worst-case |lat|, a scalar
    * aggregate broadcast back), one side explodes to its 3×3 neighbor
    * cells, candidates join on the cell key, and the exact haversine
    * verifies. Any true pair is within one cell of itself in both axes,
    * so recall is exact; the verify keeps precision exact.
    *
    * Returns (id_a, id_b, km), id_a < id_b. Latitudes must stay within
    * ±`maxAbsLat` (default 80°) — near the poles longitude cells
    * degenerate and a proximity join should switch to a polar projection
    * (refused loudly here rather than silently missing pairs). Longitude
    * cells do NOT wrap at ±180°: antimeridian-straddling data must be
    * shifted into a continuous frame first (the standard grid-join
    * caveat).
    */
  def neighborPairs(df: DataFrame, idCol: String, latCol: String,
                    lonCol: String, maxKm: Double,
                    maxAbsLat: Double = 80.0): DataFrame = {
    require(maxKm > 0, s"maxKm must be positive: $maxKm")
    require(maxAbsLat > 0 && maxAbsLat < 90)
    val base = df.select(col(idCol).as("id"),
      col(latCol).cast("double").as("lat"),
      col(lonCol).cast("double").as("lon"))
    val guard = base.agg(max(abs(col("lat"))).as("__maxlat"))
    // scalar guard + cell sizing from the corpus's own extent (A5 pattern)
    val maxLatVal = guard.head().getDouble(0)
    require(maxLatVal <= maxAbsLat,
      f"latitudes reach $maxLatVal%.2f° — beyond ±$maxAbsLat%.0f° the " +
        "longitude grid degenerates; use a polar projection")
    val latCell = maxKm / 110.574
    val lonCell = maxKm / (111.320 * math.cos(maxLatVal * math.Pi / 180))
    val cells = base
      .withColumn("__cy", floor(col("lat") / latCell).cast("long"))
      .withColumn("__cx", floor(col("lon") / lonCell).cast("long"))
    val probes = cells
      .withColumn("__dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("id").as("id_a"), col("lat").as("lat_a"),
        col("lon").as("lon_a"),
        (col("__cy") + col("__dy")).as("__cy"),
        (col("__cx") + col("__dx")).as("__cx"))
    probes.join(cells.select(col("id").as("id_b"),
        col("lat").as("lat_b"), col("lon").as("lon_b"),
        col("__cy"), col("__cx")),
      Seq("__cy", "__cx"))
      .where(col("id_a") < col("id_b"))
      .withColumn("km", haversineKm(col("lat_a"), col("lon_a"),
        col("lat_b"), col("lon_b")))
      .where(col("km") <= maxKm)
      .select("id_a", "id_b", "km")
      .distinct()
  }
}
