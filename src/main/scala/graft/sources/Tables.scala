package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, StructType}

/** Sources, sinks and catalog ops (SURVEY.md §2.1, S1-S6).
  *
  * The reference reads headerless CSV with all-string `_c0…` columns
  * (nb:250-253), persists every stage as a managed table (nb:264, nb:982)
  * and re-reads each stage from the catalog. We keep that surface but make
  * the schema declared at read time where possible — strictly cheaper than
  * read-then-cast because the parquet/CSV scanner prunes and parses directly
  * into the target types.
  */
object Tables {

  /** Parquet table scan from an sf directory (harness testdata layout). */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events `ts` normalization — the testdata's physical type has shifted
    * across vintages, so normalize every case to a session-TZ TIMESTAMP:
    *  - TIMESTAMP(NANOS): with `spark.sql.legacy.parquet.nanosAsLong` it
    *    arrives as long nanos — convert via integer division (`div`: nanos
    *    exceed double's 53-bit mantissa, so `/ 1000` would lose precision);
    *  - timestamp[us] without the UTC flag: Spark 4 infers TIMESTAMP_NTZ
    *    (inferTimestampNTZ defaults true), and `CAST(ntz AS BIGINT)` is
    *    illegal downstream — reinterpret the wall-clock as UTC instant
    *    (session TZ is pinned UTC in [[graft.Engine.configure]]).
    */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  /** embeddings `embedding` normalization — the same testdata-vintage
    * defense as [[loadEvents]]: every vector operator (native
    * CosineSim/MinHash/PQ expressions included) requires `array<float>`,
    * so a regenerated parquet shipping `array<double>` (or any numeric
    * element) would break the whole vector surface at analysis time the
    * way TIMESTAMP_NTZ broke the event surface in round 8. Normalize the
    * element type at the scan; float data passes through untouched.
    */
  def loadEmbeddings(spark: SparkSession, dir: String): DataFrame = {
    val df = load(spark, dir, "embeddings")
    df.schema("embedding").dataType match {
      case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, _) => df
      case _: org.apache.spark.sql.types.ArrayType =>
        df.withColumn("embedding", col("embedding").cast("array<float>"))
      case other =>
        throw new IllegalArgumentException(
          s"embeddings.embedding has non-array type $other")
    }
  }

  /** S1 — headerless CSV scan, all columns arrive as string `_c0…_cN`
    * (nb:250-253). No inferSchema: one pass, conform applies types.
    */
  def readCsvRaw(spark: SparkSession, path: String, sep: String = ","): DataFrame =
    spark.read.format("csv").option("sep", sep).option("header", "false").load(path)

  /** S1 (declared-schema form) — parse straight into the target schema.
    * Preferred at scale: avoids a second projection pass over 100 TB.
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              sep: String = ","): DataFrame =
    spark.read.format("csv").option("sep", sep).option("header", "false")
      .schema(schema).load(path)

  /** JSONL scan with a DECLARED schema — schema-on-read, no inference
    * pass (inference reads the whole dataset once before the real scan;
    * at 100 TB that doubles the job). Malformed lines surface as nulls
    * (PERMISSIVE) — audit with [[graft.operators.Quality.audit]] rather
    * than failing the scan.
    */
  def readJsonl(spark: SparkSession, path: String,
                schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** ORC scan/sink — Spark-native columnar alternative when the lake
    * standard is ORC (Hive estates); same pushdown/pruning machinery as
    * parquet (PushedFilters — spec-pinned).
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** S2 — managed-table scan. */
  def table(spark: SparkSession, name: String): DataFrame = spark.read.table(name)

  /** S3/S4 — overwrite table sink. Parquet-backed (no Delta jars on this
    * classpath — SURVEY.md §1.4); `overwriteSchema` is implicit in a full
    * parquet overwrite. NOTE: unlike Delta, plain parquet has no
    * read-snapshot isolation, so a read-then-overwrite of the SAME table
    * must materialize first — see [[replaceTable]].
    */
  def saveTable(df: DataFrame, name: String): Unit =
    df.write.format("parquet").mode("overwrite").saveAsTable(name)

  /** Self-overwrite with snapshot semantics (stage-3 conform pattern,
    * nb:960-996): localCheckpoint pins the input so the overwrite cannot
    * corrupt its own source. Only used for table-replace-in-place; new
    * pipelines should write to a fresh name instead.
    */
  def replaceTable(df: DataFrame, name: String): Unit =
    saveTable(df.localCheckpoint(eager = true), name)

  /** Date/key-partitioned table sink — the 100 TB layout: facts partitioned
    * by a low-cardinality derived column (e.g. a date) so time-range queries
    * prune at the directory level (SURVEY.md §7.4 risk 7).
    */
  def savePartitioned(df: DataFrame, name: String, partitionCols: Seq[String]): Unit =
    df.write.format("parquet").mode("overwrite")
      .partitionBy(partitionCols: _*).saveAsTable(name)

  /** Bucketed+sorted table sink: co-locates join keys so repeated joins on
    * `bucketCols` skip the shuffle entirely (both sides bucketed the same
    * way → SortMergeJoin with no Exchange).
    */
  def saveBucketed(df: DataFrame, name: String, buckets: Int,
                   bucketCols: Seq[String]): Unit =
    df.write.format("parquet").mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(name)

  /** S5 — DDL drop. */
  def dropTable(spark: SparkSession, name: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $name")

  /** P1+P2 — the reference's conform pass (nb:960-991): bulk rename of
    * positional `_cN` columns then bulk cast to the declared types, as one
    * projection (Catalyst collapses them anyway; one `select` keeps the
    * plan minimal).
    */
  def conform(df: DataFrame, renames: Map[String, String],
              types: Map[String, DataType]): DataFrame = {
    val cols = df.columns.toSeq.map { c =>
      val named = renames.getOrElse(c, c)
      types.get(named) match {
        case Some(t) => col(c).cast(t).as(named)
        case None    => col(c).as(named)
      }
    }
    df.select(cols: _*)
  }
}
