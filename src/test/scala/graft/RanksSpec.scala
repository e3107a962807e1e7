package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{Ranks, Stats}

/** [[Ranks.running]] — the distributed replacement for unpartitioned
  * running windows. Every facility is pinned against the plain
  * `Window.orderBy` formulation it replaces, on data deliberately spread
  * over MANY range partitions (unique keys ≫ shuffle partitions), plus
  * the continuous-unique-value shapes the old bounded-domain contract
  * forbade.
  */
class RanksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic pseudo-random frame: 5000 unique keys, shuffled layout
  private lazy val frame = {
    spark.range(5000)
      .select(
        // v is unique per row but deliberately NOT in id order
        ((col("id") * 2654435761L) % 1000003L).cast("double").as("__v"),
        (col("id") % 97 + 1).cast("long").as("t"),
        ((col("id") * 48271L) % 1009L).cast("double").as("p"))
      .localCheckpoint()
  }

  test("running sums match the unpartitioned-window formulation exactly") {
    val got = Ranks.running(frame, Seq(col("__v")),
        sums = Seq("t" -> "cum_t", "p" -> "cum_p"))
      .select("__v", "cum_t", "cum_p")
    val w = Window.orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = frame.select(col("__v"),
      sum("t").over(w).as("cum_t"), sum("p").over(w).as("cum_p"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("descending order, rank, suffix min, and lead all match windows") {
    val got = Ranks.running(frame, Seq(col("__v").desc),
        sums = Seq("t" -> "cum_t"),
        suffixMins = Seq("p" -> "sfx_p"),
        rankCol = Some("rnk"))
      .select("__v", "cum_t", "sfx_p", "rnk")
    val w = Window.orderBy(col("__v").desc)
    val want = frame.select(col("__v"),
      sum("t").over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)).as("cum_t"),
      min("p").over(w.rowsBetween(Window.currentRow,
        Window.unboundedFollowing)).as("sfx_p"),
      row_number().over(w).cast("long").as("rnk"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("leadOrder: next order value, null on the global maximum") {
    val got = Ranks.running(frame, Seq(col("__v")),
        leadOrder = Some("__v" -> "nv"))
      .select("__v", "nv")
    val want = frame.select(col("__v"),
      lead("__v", 1).over(Window.orderBy("__v")).as("nv"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.where(col("nv").isNull).count() === 1L)
  }

  test("multi-column order (p, id) rank: the bhAdjust shape") {
    val f = frame.withColumn("id", monotonically_increasing_id())
      .withColumn("pp", col("p") % 7) // heavy ties on the first key
      .localCheckpoint()
    val got = Ranks.running(f, Seq(col("pp"), col("id")),
        rankCol = Some("rnk"))
      .select("id", "rnk")
    val want = f.select(col("id"),
      row_number().over(Window.orderBy(col("pp"), col("id")))
        .cast("long").as("rnk"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("rank family accepts a continuous unique-valued column (old " +
    "contract's forbidden shape) and matches the quantized-exact answer") {
    // every row a distinct double: distinct ≈ N, where the naive
    // unpartitioned window would single-task-sort the corpus
    val n = 20000
    val rows = spark.range(n)
      .select(col("id"),
        (hash(col("id")).cast("double") / 1e6).as("v"),
        when(col("id") % 3 === 0, "a").otherwise("b").as("g"))
      .localCheckpoint()
    val mw = Stats.mannWhitney(rows, "v", "g", "a", "b").head()
    assert(mw.getAs[Long]("n_a") + mw.getAs[Long]("n_b") === n.toLong)
    // U of unique values: rank-sum identity — recompute driver-side
    val vals = rows.select("v", "g").collect()
      .map(r => (r.getDouble(0), r.getString(1))).sortBy(_._1)
    val rankSumA = vals.zipWithIndex
      .collect { case ((_, "a"), i) => (i + 1).toDouble }.sum
    val na = vals.count(_._2 == "a").toDouble
    val wantU = rankSumA - na * (na + 1) / 2.0
    assert(math.abs(mw.getAs[Double]("u") - wantU) < 1e-6)
    // and the empty-frame edge: no rows at all
    val empty = rows.where(lit(false))
    assert(Stats.prCurve(empty, "v", "id").count() === 0L)
  }

  test("rank family stays CORRECT with exchange reuse disabled (the " +
    "pinned partitioning, not plan reuse, aligns offsets and rows)") {
    // with spark.sql.exchange.reuse=false the offsets and row sides
    // would observe DIFFERENT sampled range boundaries if they executed
    // the exchange independently — the failure mode is silently wrong
    // statistics (and reuse turned out unreliable even when ENABLED
    // under a busy AQE session: q97 lost 94% of its rows through the
    // pid join on some runs). The lazy localCheckpoint pin makes the
    // helper correct regardless of the reuse conf — assert that.
    val key = "spark.sql.exchange.reuse"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "false")
      val got = Ranks.running(frame, Seq(col("__v")),
          sums = Seq("t" -> "c"))
        .orderBy("__v").collect().map(_.getAs[Long]("c")).toSeq
      val want = frame.orderBy("__v").collect()
        .map(_.getAs[Long]("t")).scanLeft(0L)(_ + _).drop(1).toSeq
      assert(got === want)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("groupedRunningSum: matches the per-group window formulation on a " +
    "large spread-out group, keeps a null group, exposes totals") {
    // group sizes force multi-partition spans under 32 shuffle partitions;
    // one group key is null (a real group — the equi-join regression trap)
    val rows = (0 until 5000).map { i =>
      val g = if (i % 10 == 0) null else s"g${i % 3}"
      (g, i.toLong, (i % 7 + 1).toLong)
    }.toDF("g", "id", "m")
    val got = Ranks.groupedRunningSum(rows, Seq("g"),
        Seq(md5(col("id").cast("string")), col("id")), col("m"),
        "run", totalCol = Some("tot"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1)) ->
        (r.getLong(3), r.getLong(4))).toMap
    val w = Window.partitionBy("g")
      .orderBy(md5(col("id").cast("string")), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = rows
      .withColumn("run", sum("m").over(w))
      .withColumn("tot", sum("m").over(Window.partitionBy("g")))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1)) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(got.size === 5000)
    assert(got === want)
    assert(got.keys.exists(_._1.isEmpty), "null group rows were dropped")
  }

  test("liftGain on a continuous unique score matches exact deciles") {
    val n = 1000
    val rows = spark.range(n)
      .select((hash(col("id")).cast("double") / 1e6).as("s"),
        (col("id") % 5 === 0).cast("int").as("y"))
      .localCheckpoint()
    val got = Stats.liftGain(rows, "s", "y")
      .orderBy("decile").collect()
    assert(got.length === 10)
    val sorted = rows.select("s", "y").collect()
      .map(r => (r.getDouble(0), r.getInt(1))).sortBy(-_._1)
    val totalPos = sorted.map(_._2).sum.toDouble
    got.foreach { r =>
      val k = r.getAs[Int]("decile")
      val cut = n * k / 10 // unique scores: boundary is exact
      assert(r.getAs[Long]("cum_rows") === cut.toLong)
      val pos = sorted.take(cut).map(_._2).sum.toLong
      assert(r.getAs[Long]("cum_pos") === pos)
      assert(math.abs(r.getAs[Double]("gain") - pos / totalPos) < 1e-12)
    }
  }
}
