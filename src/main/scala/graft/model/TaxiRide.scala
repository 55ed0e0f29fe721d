package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Immutable taxi-ride event — the engine's core event type
  * (reference: `datatypes/TaxiRide.scala:36-42`). The reference's
  * mutable fields / no-arg constructor exist only for Flink
  * serialization and are dropped; Spark `Encoder`s handle case classes
  * natively. `GeoPoint` is flattened to `lon`/`lat` columns — friendlier
  * to Parquet column pruning and the DuckDB oracle (SURVEY.md §1.4).
  */
final case class TaxiRide(
    rideId: Long,
    time: Timestamp,
    isStart: Boolean,
    lon: Double,
    lat: Double,
    passengerCnt: Short,
    travelDist: Float)

object TaxiRide {

  val schema: StructType = StructType(Seq(
    StructField("rideId", LongType, nullable = false),
    StructField("time", TimestampType, nullable = false),
    StructField("isStart", BooleanType, nullable = false),
    StructField("lon", DoubleType, nullable = false),
    StructField("lat", DoubleType, nullable = false),
    StructField("passengerCnt", ShortType, nullable = false),
    StructField("travelDist", FloatType, nullable = false)))

  /** The reference's timestamp pattern is `yyyy-MM-DD HH:mm:ss`
    * (`datatypes/TaxiRide.scala:66`) — Joda `DD` is day-of-year, a
    * latent bug that only round-trips on January data. We use the
    * intended day-of-month pattern (SURVEY.md §1.2).
    */
  val TimePattern = "yyyy-MM-dd HH:mm:ss"

  /** CSV line → typed columns (reference `fromString`,
    * `datatypes/TaxiRide.scala:68-90`): 7 comma-separated fields
    *   rideId,time,START|END,lon,lat,passengerCnt,travelDist
    * Empty lon/lat/travelDist default to 0 / −1 is NOT replicated:
    * like the reference we parse empty as 0.0 (`:79-82`).
    * All column work — split + casts — stays in codegen (no UDF).
    */
  def parseCsv(df: DataFrame, lineCol: String): DataFrame = {
    val t = split(col(lineCol), ",")
    df.select(
      t.getItem(0).cast(LongType).as("rideId"),
      to_timestamp(t.getItem(1), TimePattern).as("time"),
      (t.getItem(2) === "START").as("isStart"),
      coalesce(t.getItem(3).try_cast(DoubleType), lit(0.0)).as("lon"),
      coalesce(t.getItem(4).try_cast(DoubleType), lit(0.0)).as("lat"),
      t.getItem(5).cast(ShortType).as("passengerCnt"),
      coalesce(t.getItem(6).try_cast(FloatType), lit(0.0f)).as("travelDist"))
  }

  /** Typed columns → CSV line (reference `toString`,
    * `datatypes/TaxiRide.scala:48-58`).
    */
  def formatCsv: Column = concat_ws(",",
    col("rideId"),
    date_format(col("time"), TimePattern),
    when(col("isStart"), "START").otherwise("END"),
    col("lon"),
    col("lat"),
    col("passengerCnt"),
    col("travelDist"))
}
