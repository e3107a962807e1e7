package graft.tools

import graft.{Engine, TestQueries}

/** Dump formatted physical plans for the named gate queries (all of them
  * with no args) — the `.explain("formatted")` review loop, scriptable.
  *
  * Usage: runMain graft.tools.PlanAudit [sfDir] [query ...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else TestQueries.all.keys.toSeq.sorted
    val spark = Engine.localSession(appName = "plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===== $n =====")
      TestQueries.all(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
