package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reproducible dataset splitting for training pipelines. Unlike
  * `randomSplit` (seed- AND partitioning-dependent: a repartition reshuffles
  * rows across splits), a content-hash split is a pure function of the key —
  * stable across runs, cluster sizes, and re-reads, and new rows never move
  * existing rows between splits. That stability is what makes train/test
  * contamination auditable at 100 TB: membership is recomputable row-by-row.
  */
object Splits {

  /** Default bucketer: xxhash64 of the key into [0, 100). */
  def hashBucket(key: Column): Column = pmod(xxhash64(key), lit(100))

  /** Assign each row a split label from cumulative percentage boundaries,
    * e.g. `Seq("train" -> 80, "val" -> 90, "test" -> 100)` → 80/10/10.
    * `bucket` maps the key column into [0, 100); the default is
    * [[hashBucket]] (uniform even for clustered/sequential keys).
    *
    * Pure projection — no shuffle, no state; scales with scan bandwidth.
    */
  def hashSplit(df: DataFrame, keyCol: String,
                boundaries: Seq[(String, Int)],
                bucket: Column => Column = hashBucket): DataFrame = {
    require(boundaries.nonEmpty && boundaries.last._2 == 100,
      "boundaries must be cumulative percentages ending at 100")
    require(boundaries.map(_._2) == boundaries.map(_._2).sorted,
      "boundaries must be non-decreasing")
    val b = bucket(col(keyCol))
    val label = boundaries.init.foldRight(lit(boundaries.last._1)) {
      case ((name, hi), rest) => when(b < hi, name).otherwise(rest)
    }
    df.withColumn("split", label)
  }

  /** K-fold assignment for cross-validation: fold = stable hash of the key
    * mod k. Same stability contract as [[hashSplit]] — folds are
    * reproducible row-by-row, and all derived tables keyed the same way
    * fold identically.
    */
  def kFold(df: DataFrame, keyCol: String, k: Int,
            fold: Column => Column = c => xxhash64(c)): DataFrame = {
    require(k > 1)
    df.withColumn("fold", pmod(fold(col(keyCol)), lit(k)).cast("int"))
  }

  /** Content-hash sample: keep rows whose key hashes below `percent`. Same
    * stability rationale as [[hashSplit]] — unlike `df.sample`, membership
    * doesn't depend on partitioning or a per-run RNG stream, so a 1%
    * debug-slice of a 100 TB table is the SAME slice on every run, and
    * samples of related tables taken on a shared key line up (join-able).
    */
  def hashSample(df: DataFrame, keyCol: String, percent: Int,
                 bucket: Column => Column = hashBucket): DataFrame = {
    require(percent > 0 && percent <= 100)
    df.where(bucket(col(keyCol)) < percent)
  }
}
