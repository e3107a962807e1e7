package graft.schema

import org.apache.spark.sql.types._

/** Declared schemas for the six bikeshare tables (SURVEY.md §1.2).
  *
  * Follows the implementation, not the star-schema diagram: string
  * trip/station ids (real ids are alphanumeric), `decimal(10,0)` amounts
  * (bare `'decimal'` cast at nb:988), two date dimensions.
  */
object Bikeshare {

  // Raw CSV column order is positional (nb:250-253); these are the
  // post-conform names/types from the `columns_types` dict (nb:986-991).

  val payments: StructType = StructType(Seq(
    StructField("payment_id", IntegerType),
    StructField("date_id", DateType),
    StructField("amount", DecimalType(10, 0)),
    StructField("rider_id", IntegerType)))

  val trips: StructType = StructType(Seq(
    StructField("trip_id", StringType),
    StructField("rideable_type", StringType),
    StructField("started_at", TimestampType),
    StructField("ended_at", TimestampType),
    StructField("start_station_id", StringType),
    StructField("end_station_id", StringType),
    StructField("rider_id", IntegerType)))

  val riders: StructType = StructType(Seq(
    StructField("rider_id", IntegerType),
    StructField("first", StringType),
    StructField("last", StringType),
    StructField("address", StringType),
    StructField("birthday", DateType),
    StructField("account_start_date", DateType),
    StructField("account_end_date", DateType),
    StructField("is_member", BooleanType)))

  val stations: StructType = StructType(Seq(
    StructField("station_id", StringType),
    StructField("name", StringType),
    StructField("latitude", FloatType),
    StructField("longitude", FloatType)))

  /** Rename map `_cN` → named, per table, for the raw→conform path
    * (P1, nb:976) when data was ingested schema-less.
    */
  def positionalRenames(s: StructType): Map[String, String] =
    s.fields.zipWithIndex.map { case (f, i) => s"_c$i" -> f.name }.toMap

  def types(s: StructType): Map[String, DataType] =
    s.fields.map(f => f.name -> f.dataType).toMap
}
