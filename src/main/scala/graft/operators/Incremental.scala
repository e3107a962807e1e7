package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.BinaryType

/** Incremental (batch-vs-corpus) deduplication — the ingest-time shape of
  * the dedup problem: a new crawl batch arrives and must be reduced to the
  * rows whose key (content fingerprint) is NOT already in the standing
  * corpus, without rescanning the corpus per batch.
  *
  * The tool is a reusable Bloom sketch over the corpus keys, built with
  * Spark's own codegen'd bloom expressions (the same `BloomFilterAggregate`
  * / `BloomFilterMightContain` pair the runtime row-level filter uses, fed
  * `xxhash64` of the key on both sides):
  *
  *  1. BUILD once per corpus version: one scan of the corpus keys folds into
  *     a sketch of a few MB (constant-size partial per task, merged on the
  *     driver like any aggregate). Persist it next to the table and reuse it
  *     for every incoming batch until the corpus changes.
  *  2. PREFILTER each batch scan-side: `might_contain` is a pure projection
  *     — rows that miss the bloom are DEFINITELY new and never shuffle.
  *     With fpp p, only ~(true dups + p·|batch|) rows survive to the join.
  *  3. VERIFY the survivors with an exact anti-join against the corpus
  *     keys, so the result is EXACT — bloom false positives only cost a
  *     little extra join traffic, never a wrongly-dropped row.
  *
  * At 100 TB the corpus side of step 3 is itself prunable (the candidate
  * keys are small → semi-join/DPP prune corpus files), and the sketch stays
  * broadcastable: 4M keys at the default sizing is ~4 MB; for billions of
  * keys, shard the corpus (per date/source) and build one bloom per shard.
  */
object Incremental {

  /** Fold the corpus keys into a serialized Bloom sketch (driver-side bytes,
    * aggregate-sized — the A5-scalar pattern, not a data collect). Returns
    * null when `corpus` is empty.
    */
  def buildBloom(corpus: DataFrame, key: Column, expectedItems: Long): Array[Byte] = {
    require(expectedItems > 0, "expectedItems must be positive")
    val agg = ColumnShim.column(
      new BloomFilterAggregate(ColumnShim.expression(xxhash64(key)), expectedItems)
        .toAggregateExpression())
    corpus.select(agg.as("bf")).head.getAs[Array[Byte]](0)
  }

  /** Membership probe against a built sketch — a codegen'd scan-side
    * predicate (no shuffle, no UDF). False positives possible at the
    * sketch's fpp; false negatives never.
    */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnShim.column(BloomFilterMightContain(
      Literal.create(bloom, BinaryType), ColumnShim.expression(xxhash64(key))))

  /** The batch rows whose `keyCol` does not occur in `corpus` — exact
    * (bloom prefilter + anti-join verify of the bloom-positive survivors).
    * `expectedItems` sizes the sketch; oversizing costs bytes, undersizing
    * costs fpp (extra verify traffic), never correctness.
    *
    * A NULL key is treated as a value: the verify join is null-safe, so a
    * null-key batch row is "new" only while the corpus holds no null key
    * (a plain equi-anti-join would re-admit it forever).
    *
    * `batch` must be a DETERMINISTIC plan — the prefilter and verify
    * branches each evaluate it (the union is what lets definitely-new rows
    * skip the join entirely). Pin a non-deterministic input (sample/rand)
    * with `localCheckpoint` first.
    */
  def newRows(batch: DataFrame, corpus: DataFrame, keyCol: String,
              expectedItems: Long = 1L << 22): DataFrame = {
    val bloom = buildBloom(corpus.select(keyCol), col(keyCol), expectedItems)
    if (bloom == null) batch // empty corpus: every batch row is new
    else {
      val definitelyNew = batch.where(!mightContain(bloom, col(keyCol)))
      val corpusKeys = corpus.select(col(keyCol).as("__ck")).distinct()
      val survivors = batch.where(mightContain(bloom, col(keyCol)))
        .join(corpusKeys, col(keyCol) <=> col("__ck"), "left_anti")
      definitelyNew.unionByName(survivors)
    }
  }

  /** Incremental join maintenance (the delta-join identity): the NEW rows
    * of `(A ∪ ΔA) ⋈ (B ∪ ΔB)` beyond the already-materialized `A ⋈ B` are
    * exactly
    *
    *   ΔA ⋈ B  ∪all  A ⋈ ΔB  ∪all  ΔA ⋈ ΔB
    *
    * — the algebra every materialized join view maintains by. Appending
    * this delta to the stored view IS the refreshed view, so a 100 TB
    * join view updates at the cost of the (small) deltas: each term
    * shuffles ΔA/ΔB fully but the big snapshots only on the join key
    * (and AQE broadcasts the delta side when it fits, leaving the
    * snapshots entirely unshuffled). Insert-only deltas; deletes are the
    * lake layer's tombstone problem, not the view algebra's.
    *
    * `keys` are USING-style join keys (coalesced once in the output).
    */
  def deltaJoin(snapA: DataFrame, deltaA: DataFrame,
                snapB: DataFrame, deltaB: DataFrame,
                keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one join key")
    deltaA.join(snapB, keys)
      .unionByName(snapA.join(deltaB, keys))
      .unionByName(deltaA.join(deltaB, keys))
  }
}
