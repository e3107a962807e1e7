package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Observe

/** [[Observe]] — CollectMetrics-based zero-extra-pass telemetry. */
class ObserveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample = Seq(
    (1L, Some(10.0)), (2L, None), (3L, Some(30.0)), (4L, Some(2.5))
  ).toDF("id", "v")

  test("instrumentStandard: metrics ride the main action") {
    val df = Observe.instrumentStandard(sample, "ingest",
      nullCols = Seq("v"), measureCol = Some("v"))
    // collect() runs THIS frame's plan (count() would build its own)
    assert(df.collect().length === 4)
    val m = Observe.metricsOf(df)("ingest")
    assert(m.getAs[Long]("n_rows") === 4L)
    assert(m.getAs[Long]("n_null_v") === 1L)
    assert(math.abs(m.getAs[Double]("sum_v") - 42.5) < 1e-9)
  }

  test("metrics reflect the observed POSITION in the plan") {
    // observe below the filter sees all rows; the action returns fewer
    val df = Observe.instrument(sample, "pre",
      "n" -> count(lit(1))).where($"v" > 5.0)
    assert(df.collect().length === 2)
    assert(Observe.metricsOf(df)("pre").getAs[Long]("n") === 4L)
  }

  test("reconcile: shared metric names compare, mismatches reported") {
    val a = Observe.instrument(sample, "a", "n" -> count(lit(1)),
      "s" -> sum($"id"))
    a.collect()
    val b = Observe.instrument(sample.where($"id" <= 3), "b",
      "n" -> count(lit(1)), "s" -> sum($"id"))
    b.collect()
    val bad = Observe.reconcile(Observe.metricsOf(a)("a"),
      Observe.metricsOf(b)("b"))
    assert(bad === Seq("n", "s"))
    // equal frames reconcile clean
    val d = Observe.instrument(sample, "d", "n" -> count(lit(1)),
      "s" -> sum($"id"))
    d.collect()
    assert(Observe.reconcile(Observe.metricsOf(a)("a"),
      Observe.metricsOf(d)("d")).isEmpty)
  }
}
