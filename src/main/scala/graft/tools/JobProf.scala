package graft.tools

import graft.{Engine, TestQueries}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Job-level profiler for the measure-first loop (optimization guide §1):
  * runs each named query twice in one session with a listener that prints
  * every Spark job's wall time, stage count and task count — the direct
  * view of per-round fixed cost in iterative operators (eager pins,
  * broadcast sub-jobs, probe counts) that per-query totals hide.
  * Usage: runMain graft.tools.JobProf <sfDir> <query> [query...]
  */
object JobProf {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: JobProf <sfDir> <query> [query...]")
    val dir = args.head
    val spark = Engine.localSession(appName = "graft-jobprof")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var stages = 0
    @volatile var tasks = 0
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, (System.nanoTime(),
          Option(js.properties.getProperty("spark.job.description"))
            .getOrElse(js.stageInfos.map(_.name.takeWhile(_ != '\n'))
              .distinct.mkString("|").take(120))))
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += sc.stageInfo.numTasks
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, desc) = starts.getOrDefault(je.jobId, (0L, "?"))
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"  JOB ${je.jobId}%3d $sec%6.3fs  $desc%s")
      }
    }
    // warm the scan infra once so run1 vs run2 isolates codegen/plan cost
    try spark.read.parquet(s"$dir/region.parquet").limit(1).count()
    catch { case _: Throwable => () }
    spark.sparkContext.addSparkListener(listener)
    args.tail.foreach { q =>
      val fn = TestQueries.all.getOrElse(q, sys.error(s"unknown query $q"))
      (1 to 2).foreach { i =>
        stages = 0; tasks = 0
        println(s"==== $q run$i ====")
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        // listener events are async; give the queue a beat before the total
        Thread.sleep(300)
        println(f"JOBPROF $q run$i total=$sec%.3fs rows=$n stages=$stages tasks=$tasks")
      }
    }
    spark.stop()
  }
}
