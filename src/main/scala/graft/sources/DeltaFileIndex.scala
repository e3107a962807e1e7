package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Cast, Expression, GenericInternalRow, Literal, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Log-backed [[FileIndex]] for [[DeltaRead]]: serves the snapshot's live
  * file list and partition values straight from the reconstructed
  * `_delta_log` state — NO directory listing ever happens (the log is the
  * source of truth; a listing would also resurrect tombstoned files).
  *
  * This is the piece that makes the Delta read a first-class Spark scan:
  * `listFiles` receives the query's partition predicates and prunes
  * file groups BEFORE the physical scan is planned, so a
  * `WHERE date = ...` over a 10⁵-tuple table touches one group's files —
  * the same planning-time pruning Spark's catalog tables get, with the
  * file metadata (size included) coming from the log's add actions rather
  * than a 100 TB directory walk.
  *
  * Partition values are decoded once per distinct tuple from the
  * protocol's string map (absent key or, for non-string types, "" → NULL)
  * and cast via Catalyst `Cast` under the session time zone, so `date=`
  * partitions compare as real dates, not strings.
  */
final class DeltaFileIndex(
    spark: SparkSession,
    table: Path,
    snap: DeltaRead.Snapshot,
    override val partitionSchema: StructType) extends FileIndex {

  private val fs = table.getFileSystem(spark.sessionState.newHadoopConf())
  private val qualifiedTable = fs.makeQualified(table)
  private val zone = spark.sessionState.conf.sessionLocalTimeZone

  private def decode(rel: String): String =
    try new java.net.URI(rel).getPath
    catch { case _: java.net.URISyntaxException => rel }

  private def valuesRow(pv: Map[String, String]): InternalRow =
    new GenericInternalRow(partitionSchema.fields.map { f =>
      val raw = pv.get(f.name).filterNot(v =>
        v == null || (v.isEmpty && f.dataType != StringType))
      raw.map { v =>
        Cast(Literal(UTF8String.fromString(v), StringType), f.dataType,
          Option(zone)).eval(null)
      }.orNull
    }.asInstanceOf[Array[Any]])

  // one group per distinct partition tuple; built once per snapshot
  private val groups: Seq[(InternalRow, Array[FileStatus])] =
    snap.files.groupBy(_._2).toSeq.map { case (pv, files) =>
      valuesRow(pv) -> files.map { case (rel, _, size) =>
        val p = new Path(qualifiedTable, decode(rel))
        // the protocol requires add.size accurate; trust it (a stat per
        // file would re-introduce the listing this index exists to avoid),
        // falling back to one stat only if a non-conforming log omits it
        val len = if (size > 0) size else fs.getFileStatus(p).getLen
        new FileStatus(len, false, 1, 128L * 1024 * 1024, 0L, p)
      }.toArray
    }

  override def rootPaths: Seq[Path] = Seq(qualifiedTable)

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept =
      if (partitionFilters.isEmpty || partitionSchema.isEmpty) groups
      else {
        // bind the relation-attribute predicates to this index's row shape
        val bound = Predicate.create(
          partitionFilters.reduce(And).transform {
            case a: AttributeReference =>
              val i = partitionSchema.fieldIndex(a.name)
              BoundReference(i, partitionSchema(i).dataType, nullable = true)
          }, Nil)
        groups.filter { case (row, _) => bound.eval(row) }
      }
    kept.map { case (row, files) => PartitionDirectory(row, files) }
  }

  override def inputFiles: Array[String] =
    snap.files.map(f => new Path(qualifiedTable, decode(f._1)).toString).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = snap.files.map(_._3).sum
}
