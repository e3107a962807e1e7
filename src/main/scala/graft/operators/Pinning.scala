package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Lifecycle management for `localCheckpoint`-pinned frames inside
  * iterative loops (connected components, PageRank, label propagation,
  * BFS, k-core).
  *
  * Why this exists: `Dataset.localCheckpoint(eager = true)` truncates
  * lineage by materializing the plan into executor storage blocks
  * (MEMORY_AND_DISK). Those blocks stay pinned until the RDD is
  * unpersisted or the session dies — so a 20-round pointer-jumping loop
  * quietly accumulates 20 superseded label frames against executor
  * memory. On a long-running cluster (or a 269-query bench run in one
  * JVM) that pressure evicts OTHER queries' shuffle/cache blocks and
  * shows up as phantom 17× slowdowns late in the run (round-10 bench's
  * q77 anomaly). Releasing each round's superseded frame bounds the
  * loop's resident footprint to O(2 rounds) regardless of iteration
  * count — the difference between "works in a fresh JVM" and "works in
  * hour six of a shared cluster".
  *
  * Safety contract: only call [[unpin]] on a frame that will NEVER be
  * read again. A local checkpoint REPLACES lineage — once the blocks are
  * dropped the frame is unrecoverable (this is also why these loops
  * offer a reliable-`checkpoint` mode for lossy clusters; see
  * `Dedup.connectedComponents`).
  */
object Pinning {
  /** Release the storage blocks behind a checkpointed frame. Walks the
    * analyzed plan's leaves and unpersists every materialized-RDD leaf
    * (non-blocking — the loop shouldn't wait on block cleanup). No-op on
    * frames that aren't checkpoint-backed; never throws (best-effort
    * memory hygiene must not fail a correct computation).
    */
  def unpin(df: DataFrame): Unit =
    try df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    } catch { case scala.util.control.NonFatal(_) => () }
}
