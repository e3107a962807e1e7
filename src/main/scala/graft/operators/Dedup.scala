package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{Text, Vectors}

/** Corpus deduplication at training-data scale.
  *
  * All strategies follow the same scale discipline: compute signatures
  * scan-side (pure expressions, no UDF), shuffle ONLY on compact keys
  * (hashes / band signatures — never full text), and keep pairwise work
  * confined to within-bucket candidates. `keep` semantics everywhere:
  * min(doc_id) of a duplicate group survives.
  */
object Dedup {

  /** Exact dedup on one or more columns — a single hash-aggregate shuffle
    * keyed on the dedup column(s). Returns the surviving rows' ids.
    */
  def exactKeepIds(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))
      .select(idCol, "n_dups")

  /** Exact dedup returning the surviving rows (dropDuplicates semantics but
    * with deterministic min-id victim selection, unlike `dropDuplicates`
    * which keeps an arbitrary row per key).
    */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.join(exactKeepIds(df, idCol, keyCols).select(idCol), Seq(idCol), "left_semi")

  /** Whitespace/case-insensitive near-exact dedup via 64-bit fingerprint
    * ([[Text.fingerprint]]) — shuffles 8-byte keys instead of full text.
    */
  def fingerprintKeepIds(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), Text.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp").agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))
      .select(idCol, "n_dups")

  // ---- MinHash + LSH -------------------------------------------------------

  /** One MinHash value per (doc, hash function): min over shingles of
    * xxhash64(shingle, seed). Native Catalyst expression
    * ([[graft.functions.expressions.MinHashSig]]) — the HOF formulation
    * measured ~1000× slower (interpreted lambdas per shingle×seed).
    */
  def minhashSignature(text: Column, shingleSize: Int, numHashes: Int): Column =
    graft.functions.expressions.TextHashExpressions
      .minhashSig(text, shingleSize, numHashes)

  /** MinHash-LSH candidate pairs: band the signature (bands × rowsPerBand =
    * numHashes), hash each band, group docs sharing a band bucket, emit
    * within-bucket pairs. The only shuffle is on (band_id, band_hash) —
    * compact keys — and the quadratic step is per-bucket, which LSH keeps
    * small. Pairs are distinct-ed because near-dups co-occur in many bands.
    */
  def minhashCandidatePairs(df: DataFrame, idCol: String, textCol: String,
                            shingleSize: Int = 3, numHashes: Int = 16,
                            bands: Int = 4): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sig = df.select(col(idCol).as("id"),
      minhashSignature(col(textCol), shingleSize, numHashes).as("sig"))
    val banded = sig.select(col("id"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            xxhash64(concat_ws(",",
              slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)), lit(b)).as("bh"))
        }: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Full MinHash dedup: candidate pairs → connected-ish grouping (each doc
    * assimilated to the min id it pairs with) → survivors. One-hop union
    * (sufficient for near-dup clusters found by LSH; iterate for full
    * transitive closure if needed).
    */
  def minhashKeepIds(df: DataFrame, idCol: String, textCol: String,
                     shingleSize: Int = 3, numHashes: Int = 16,
                     bands: Int = 4): DataFrame = {
    val pairs = minhashCandidatePairs(df, idCol, textCol, shingleSize, numHashes, bands)
    val victims = pairs.groupBy("id_b").agg(min("id_a").as("kept_by"))
      .select(col("id_b").as("victim"))
    df.select(col(idCol))
      .join(victims, col(idCol) === col("victim"), "left_anti")
  }

  // ---- SimHash -------------------------------------------------------------

  /** 32-bit SimHash over word shingles: per bit, sum ±1 weighted by shingle
    * hash bit, take sign. Native Catalyst expression
    * ([[graft.functions.expressions.SimHash]]).
    */
  def simhash(text: Column, shingleSize: Int = 2, bits: Int = 32): Column =
    graft.functions.expressions.TextHashExpressions.simhash(text, shingleSize, bits)

  /** SimHash near-dup candidates: docs whose simhash agrees on any of the 4
    * 8-bit blocks (standard block-permutation trick ≈ Hamming distance ≤ 3
    * candidates) — shuffle key is (block_id, block_value).
    */
  def simhashCandidatePairs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))
    val blocked = sigs.select(col("id"), col("sh"),
        explode(array((0 until 4).map { b =>
          struct(lit(b).as("blk"),
            shiftright(col("sh"), b * 8).bitwiseAND(0xFF).as("bv"))
        }: _*)).as("x"))
      .select(col("id"), col("sh"), col("x.blk").as("blk"), col("x.bv").as("bv"))
    val a = blocked.alias("a")
    val b = blocked.alias("b")
    a.join(b, col("a.blk") === col("b.blk") && col("a.bv") === col("b.bv") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
  }

  // ---- n-gram Jaccard ------------------------------------------------------

  /** Exact Jaccard over word n-gram sets for candidate pairs (use after an
    * LSH pass at scale; standalone it's quadratic). `pairs` carries
    * (id_a, id_b); texts are joined back in — the only full-text shuffle,
    * bounded by the candidate count.
    */
  def jaccardVerify(df: DataFrame, pairs: DataFrame, idCol: String,
                    textCol: String, n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sh = df.select(col(idCol),
      array_distinct(Text.shingles(col(textCol), n)).as("sh"))
    pairs
      .join(sh.withColumnRenamed(idCol, "id_a").withColumnRenamed("sh", "sh_a"), Seq("id_a"))
      .join(sh.withColumnRenamed(idCol, "id_b").withColumnRenamed("sh", "sh_b"), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard", when(col("uni") === 0, 0.0).otherwise(col("inter") / col("uni")))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ---- Embedding near-dup --------------------------------------------------

  /** Embedding-cosine near-dup pairs above `threshold`, LSH-bucketed: only
    * vectors sharing a random-hyperplane signature are compared. Planes are
    * seeded literals → deterministic across runs/engines.
    */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                            dim: Int, threshold: Double = 0.95,
                            numPlanes: Int = 8, seed: Long = 42L): DataFrame = {
    val planes = Similarity.randomPlanes(numPlanes, dim, seed)
    val sigs = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      Vectors.lshSignature(col(vecCol), planes).as("sig"))
    val a = sigs.alias("a")
    val b = sigs.alias("b")
    a.join(b, col("a.sig") === col("b.sig") && col("a.id") < col("b.id"))
      .withColumn("cos", Vectors.cosine(col("a.v"), col("b.v")))
      .where(col("cos") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cos"))
  }
}
