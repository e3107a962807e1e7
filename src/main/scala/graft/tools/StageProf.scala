package graft.tools
import graft.Engine
import graft.operators.{CorpusPipeline, Dedup}
import org.apache.spark.sql.functions._
object StageProf {
  def main(args: Array[String]): Unit = {
    val spark = Engine.localSession(4, "stageprof")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime()-t0)/1e9}%.2fs"); r
    }
    time("warm")(docs.count())
    val ann = time("annotate")(CorpusPipeline.annotate(docs).localCheckpoint())
    val filt = time("filter")(CorpusPipeline.qualityFilter(ann, CorpusPipeline.Config()).localCheckpoint())
    println("filtered rows " + filt.count())
    val fp = time("fp_dedup") {
      val s = filt.groupBy("fp").agg(min(col("doc_id")).as("doc_id")).select("doc_id")
      filt.join(s, Seq("doc_id"), "left_semi").localCheckpoint()
    }
    val cands = time("minhash_cands")(Dedup.minhashCandidatePairs(fp, "doc_id", "text").count())
    println("cands " + cands)
    val keep = time("minhash_keep")(Dedup.minhashKeepIds(fp, "doc_id", "text").count())
    println("keep " + keep)
    time("full_curate")(CorpusPipeline.curate(docs).count())
    spark.stop()
  }
}
