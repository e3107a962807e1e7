package graft.tools

import graft.{Engine, SparkEntry}

/** Ad-hoc single-query timer: `runMain graft.tools.QTime <sfDir> q50b... [qXX...]`.
  * Times each named query's full execution (count-materialized) on a fresh
  * engine session — the per-query feedback loop for bench work without
  * paying for the whole Bench suite.
  */
object QTime {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QTime <sfDir> <query> [query...]")
    val dir = args.head
    val spark = Engine.localSession(appName = "graft-qtime")
    args.tail.foreach { q =>
      val f = SparkEntry.queries.getOrElse(q,
        sys.error(s"unknown query $q; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(",")}"))
      val t0 = System.nanoTime()
      val n = f(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"QTIME $q%s rows=$n%d sec=$sec%.2f")
    }
    spark.stop()
  }
}
