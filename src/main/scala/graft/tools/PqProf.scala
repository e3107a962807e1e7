package graft.tools

import graft.Engine
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Phase timings for the PQ ANN path (q95's shape) — run twice to split
  * first-plan codegen from steady state.
  */
object PqProf {
  def main(args: Array[String]): Unit = {
    val spark = Engine.localSession(appName = "pqprof")
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    time("warm")(emb.count())
    val n = emb.count().toInt
    for (round <- 1 to 2) {
      time(s"r$round books")(
        Similarity.pqCodebooks(emb, "vec_id", "embedding", 64, 16, 16,
          42L, 1).collect())
      time(s"r$round full_pqTopK")(
        Similarity.pqTopK(emb, emb.where(col("vec_id") <= 20), "vec_id",
          "embedding", dim = 64, k = 3, numSub = 16, ksub = 16,
          refine = (n + 2) / 3, iters = 1).count())
      time(s"r$round prod_pqTopK")(
        Similarity.pqTopK(emb, emb.where(col("vec_id") <= 20), "vec_id",
          "embedding", dim = 64, k = 3, numSub = 16, ksub = 16,
          refine = 8).count())
    }
    spark.stop()
  }
}
