package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Geo

/** [[Geo]] — haversine reference values and blocked proximity-join
  * exactness.
  */
class GeoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("haversineKm: London-Paris reference distance, zero at identity") {
    val rows = Seq((51.5074, -0.1278, 48.8566, 2.3522),
      (10.0, 20.0, 10.0, 20.0)).toDF("a", "b", "c", "d")
    val got = rows.select(Geo.haversineKm($"a", $"b", $"c", $"d").as("km"))
      .collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 343.5) < 1.0, s"London-Paris: ${got(0)}")
    assert(got(1) === 0.0)
  }

  test("neighborPairs: finds the close pair, not the far point") {
    // B is 0.2° of longitude east of A at the equator ≈ 22.26 km
    val pts = Seq((1L, 0.0, 0.0), (2L, 0.0, 0.2), (3L, 10.0, 10.0))
      .toDF("id", "lat", "lon")
    val got = Geo.neighborPairs(pts, "id", "lat", "lon", maxKm = 25.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length === 1)
    assert(got.head._1 === 1L && got.head._2 === 2L)
    assert(math.abs(got.head._3 - 22.26) < 0.1)
  }

  test("neighborPairs: cell-boundary pairs survive (3x3 probe)") {
    // two points straddling a cell boundary but only ~1.1 km apart
    val pts = Seq((1L, 0.0449, 0.0), (2L, 0.0551, 0.0))
      .toDF("id", "lat", "lon")
    val got = Geo.neighborPairs(pts, "id", "lat", "lon", maxKm = 11.0)
    assert(got.count() === 1)
  }

  test("neighborPairs: polar latitudes are refused, not silently wrong") {
    val pts = Seq((1L, 85.0, 0.0), (2L, 84.9, 0.1)).toDF("id", "lat", "lon")
    assertThrows[IllegalArgumentException] {
      Geo.neighborPairs(pts, "id", "lat", "lon", maxKm = 10.0)
    }
  }
}
