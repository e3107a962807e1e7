package graft.tools

import graft.{Engine, TestQueries}

/** Dump formatted physical plans for plan-quality review (pushdown,
  * broadcast choice, codegen spans). Usage: runMain graft.tools.Explain
  * [sfDir] [query...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q01_scan_project", "q03_filter_predicates", "q08_join_orders_customer",
        "q11_star_join", "q12_topk_suppliers", "q36_minhash_pairs",
        "q39d_ivf_topk", "q66_zorder_stats", "q77_transitive_dedup",
        "q78_contamination", "q79_pack_budget", "q83_bloom_increment",
        "q85_stratified_sample", "q86_source_jaccard_exact",
        "q88_repetition", "q89_unigram_nll")
    val spark = Engine.localSession(4, "explain")
    names.foreach { n =>
      println(s"\n================ $n ================")
      println(TestQueries.all(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
