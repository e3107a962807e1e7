package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage-root abstraction for the data-lake layout: the same code runs
  * against a local directory (`file:///...`), HDFS, or Azure Data Lake
  * (`abfss://container@account.dfs.core.windows.net/...`) — Spark resolves
  * the scheme through its Hadoop filesystem connectors, so nothing here is
  * path-scheme-specific.
  *
  * Layout convention (medallion): `<root>/<zone>/<table>` with zones
  * `bronze` (raw), `silver` (conformed), `gold` (marts). Facts are written
  * date-partitioned; dims plain.
  *
  * For ADLS the cluster supplies auth via standard hadoop-azure configs
  * (e.g. `spark.hadoop.fs.azure.account.auth.type.<account>.dfs.core.windows.net`
  * = `OAuth` plus the client-credential keys, or an account key) — config
  * only, no code change. This container has no network egress, so tests
  * exercise the `file://` scheme; the path arithmetic is identical.
  */
final case class Lake(root: String) {
  private def clean(s: String) = s.stripSuffix("/")

  def path(zone: String, table: String): String = s"${clean(root)}/$zone/$table"

  def read(spark: SparkSession, zone: String, table: String): DataFrame =
    spark.read.parquet(path(zone, table))

  def write(df: DataFrame, zone: String, table: String,
            partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path(zone, table))
  }

  /** Promote a table between zones (e.g. bronze → silver after conform). */
  def promote(spark: SparkSession, from: String, to: String, table: String,
              transform: DataFrame => DataFrame,
              partitionCols: Seq[String] = Nil): Unit =
    write(transform(read(spark, from, table)), to, table, partitionCols)
}
