package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{MaterializedViews, MvRewriteRule}

/** [[MvRewriteRule]] — aggregate navigation onto materialized summaries:
  * results must equal the base-table aggregation exactly, the physical
  * scan must actually move to the MV files, and anything outside the
  * soundness envelope must be left alone.
  */
class MvRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val baseDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-base").toString
    (1 to 400).map { i =>
      (s"g${i % 4}", s"h${i % 2}", i.toDouble,
        if (i % 10 == 0) None else Some(i.toLong))
    }.toDF("g", "h", "x", "y")
      .write.mode("overwrite").parquet(dir)
    dir
  }
  private lazy val mvDir: String = {
    val mv = java.nio.file.Files.createTempDirectory("graft-mv").toString
    MaterializedViews.create(spark, spark.read.parquet(baseDir), mv,
      groupCols = Seq("g", "h"), measures = Seq("x", "y"))
    mv
  }

  private def withMv[T](body: => T): T = {
    mvDir // force creation + registration
    spark.conf.set(MvRewriteRule.EnabledKey, "true")
    try body finally spark.conf.set(MvRewriteRule.EnabledKey, "false")
  }

  private def base = spark.read.parquet(baseDir)

  test("rollup navigation: subset grouping re-aggregates the summary") {
    withMv {
      val q = base.groupBy("g")
        .agg(sum("x").as("sx"), count(lit(1)).as("n"),
          min("x").as("mn"), max("x").as("mx"),
          avg("x").as("ax"), count($"y").as("ny"), sum($"y").as("sy"))
      val scan = q.queryExecution.executedPlan.toString
      assert(scan.contains(new java.io.File(mvDir).getName),
        "scan must move to the MV files")
      assert(!scan.contains(new java.io.File(baseDir).getName),
        "base files must not be read")
      val got = q.orderBy("g").collect()
      spark.conf.set(MvRewriteRule.EnabledKey, "false")
      val want = base.groupBy("g")
        .agg(sum("x").as("sx"), count(lit(1)).as("n"),
          min("x").as("mn"), max("x").as("mx"),
          avg("x").as("ax"), count($"y").as("ny"), sum($"y").as("sy"))
        .orderBy("g").collect()
      assert(got.map(_.toSeq).toSeq === want.map(_.toSeq).toSeq)
    }
  }

  test("group-column filters prune MV rows exactly") {
    withMv {
      val q = base.where($"g" === "g1" && $"h" === "h1")
        .groupBy("g").agg(sum("x").as("sx"))
      assert(q.queryExecution.executedPlan.toString
        .contains(new java.io.File(mvDir).getName))
      val got = q.collect().map(_.toSeq)
      spark.conf.set(MvRewriteRule.EnabledKey, "false")
      val want = base.where($"g" === "g1" && $"h" === "h1")
        .groupBy("g").agg(sum("x").as("sx")).collect().map(_.toSeq)
      assert(got.toSeq === want.toSeq)
    }
  }

  test("global COUNT over a fully-filtered summary reports 0, not NULL") {
    withMv {
      val q = base.where($"g" === "no_such_group")
        .agg(count(lit(1)).as("n"))
      assert(q.head().getLong(0) === 0L)
    }
  }

  test("outside the envelope the plan is untouched") {
    withMv {
      val baseName = new java.io.File(baseDir).getName
      // measure filter: not rewritable (MV rows mix matching and not)
      val f = base.where($"x" > 100.0).groupBy("g").agg(sum("x"))
      assert(f.queryExecution.executedPlan.toString.contains(baseName))
      // distinct aggregate: not foldable from partials
      val d = base.groupBy("g").agg(countDistinct("x"))
      assert(d.queryExecution.executedPlan.toString.contains(baseName))
      // non-materialized measure
      val m = base.groupBy("g").agg(sum(length($"h")))
      assert(m.queryExecution.executedPlan.toString.contains(baseName))
      // disabled flag
      spark.conf.set(MvRewriteRule.EnabledKey, "false")
      val off = base.groupBy("g").agg(sum("x"))
      assert(off.queryExecution.executedPlan.toString.contains(baseName))
    }
  }

  test("incremental refresh: delta folds in; rewrite answers the new truth") {
    // an isolated base so the shared fixture stays untouched
    val bDir = java.nio.file.Files.createTempDirectory("graft-mv-b2").toString
    val mv2 = java.nio.file.Files.createTempDirectory("graft-mv-m2").toString
    (1 to 100).map(i => (s"g${i % 3}", i.toDouble)).toDF("g", "x")
      .write.mode("overwrite").parquet(bDir)
    val baseFrame = spark.read.parquet(bDir)
    MaterializedViews.create(spark, baseFrame, mv2,
      groupCols = Seq("g"), measures = Seq("x"))
    // append the delta to the base files AND fold it into the summary
    val delta = (101 to 140).map(i => (s"g${i % 3}", i.toDouble))
      .toDF("g", "x")
    delta.write.mode("append").parquet(bDir)
    MaterializedViews.refresh(spark, baseFrame, delta)
    spark.conf.set(MvRewriteRule.EnabledKey, "true")
    try {
      val q = spark.read.parquet(bDir).groupBy("g")
        .agg(sum("x").as("sx"), count(lit(1)).as("n"), max("x").as("mx"))
      assert(q.queryExecution.executedPlan.toString
        .contains(new java.io.File(mv2).getName))
      val got = q.orderBy("g").collect().map(_.toSeq)
      spark.conf.set(MvRewriteRule.EnabledKey, "false")
      val want = spark.read.parquet(bDir).groupBy("g")
        .agg(sum("x").as("sx"), count(lit(1)).as("n"), max("x").as("mx"))
        .orderBy("g").collect().map(_.toSeq)
      assert(got.toSeq === want.toSeq)
      // refresh ≡ full rebuild, column for column
      val rebuilt = spark.read.parquet(bDir).groupBy("g")
        .agg(count(lit(1)).as("cnt"), sum("x").as("sum_x"),
          min("x").as("min_x"), max("x").as("max_x"),
          count($"x").as("cnt_x"))
        .orderBy("g").collect().map(_.toSeq)
      val stored = spark.read.parquet(mv2)
        .select("g", "cnt", "sum_x", "min_x", "max_x", "cnt_x")
        .orderBy("g").collect().map(_.toSeq)
      assert(stored.toSeq === rebuilt.toSeq)
    } finally spark.conf.set(MvRewriteRule.EnabledKey, "false")
  }

  test("full-group aggregation equals the MV contents directly") {
    withMv {
      val q = base.groupBy("g", "h").agg(sum("x").as("sx"),
        avg("y").as("ay"))
      val got = q.orderBy("g", "h").collect()
      spark.conf.set(MvRewriteRule.EnabledKey, "false")
      val want = base.groupBy("g", "h").agg(sum("x").as("sx"),
        avg("y").as("ay")).orderBy("g", "h").collect()
      assert(got.map(_.toSeq).toSeq === want.map(_.toSeq).toSeq)
    }
  }
}
