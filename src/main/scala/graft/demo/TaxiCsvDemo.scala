package graft.demo

import graft.geo.NycGeo
import graft.model.TaxiRide
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Batch form of the reference's TotalArrivalCount over a real taxi
  * CSV file in the reference's 7-field wire format
  * (`datatypes/TaxiRide.scala:68-90`, `convertTrips.sh:24-31`) — the
  * entry point a user of the reference would reach for first with
  * their own `nycTaxiData.gz` (gz is transparent to `spark.read`).
  *
  *   sbt "runMain graft.demo.TaxiCsvDemo /path/to/rides.csv[.gz]"
  */
object TaxiCsvDemo {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse(sys.error("usage: TaxiCsvDemo <csv path>"))
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rides = TaxiRide.parseCsv(spark.read.text(path).toDF("line"), "line")
    val counts = rides
      .filter(!col("isStart"))
      .filter(NycGeo.isInNYC(col("lon"), col("lat")))
      .groupBy(NycGeo.gridCell(col("lon"), col("lat")).as("cell"))
      .agg(max(col("time")).as("last_time"), sum(col("passengerCnt")).as("cnt"))
      .withColumn("center_lon", NycGeo.cellCenterLon(col("cell")))
      .withColumn("center_lat", NycGeo.cellCenterLat(col("cell")))
      .orderBy(col("cnt").desc)
    counts.show(20, truncate = false)
    spark.stop()
  }
}
