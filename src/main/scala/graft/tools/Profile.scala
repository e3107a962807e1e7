package graft.tools

import graft.{Engine, TestQueries}

/** Scratch profiler: run selected queries twice in one session to split
  * plan/codegen warm-up from steady-state execution.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else TestQueries.all.keys.toSeq
    val spark = Engine.localSession(4, "profile")
    names.foreach { n =>
      val fn = TestQueries.all(n)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val cnt = fn(spark, dir).count()
        println(f"PROFILE $n run$i ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$cnt")
      }
    }
    spark.stop()
  }
}
