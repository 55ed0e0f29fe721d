package graft.queries

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.zip.GZIPOutputStream

import graft.model.{TaxiFixture, TaxiRide}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §1.2 CSV wire-format codec, driver-checked end-to-end: the seeded
  * taxi fixture written as gz CSV in the reference wire format
  * (`convertTrips.sh:24-31` — `rideId,time,START|END,lon,lat,
  * passengerCnt,travelDist`, time-sorted, seconds resolution), read
  * back through `TaxiRide.parseCsv`, compared against DuckDB's own
  * `read_csv` with explicit types on the same bytes. This is the
  * engine's primary ingest codec (reference
  * `sources/TaxiRideSource.scala:97-104`); the oracle pins timestamp
  * parsing, START/END mapping, and the Double/Float round trips.
  *
  * The fixture is one small gz file — fine for a codec check; the
  * production ingress shape (many splittable files) is exercised by
  * `TaxiReplay.fileStream`. Parsing stays entirely in codegen
  * (split + casts, no UDF).
  */
object CsvQueries {

  private val NRides = 500

  /** Repo-local fixture path — build-root-anchored at runtime
    * ([[graft.Fixtures]]: DuckDB-resolvable absolute path, any
    * checkout location, no launch-dir litter); under target/ so it is
    * never committed.
    */
  val FixturePath = graft.Fixtures.path("taxi_rides.csv.gz")

  /** Write the fixture deterministically (write-to-temp + atomic move:
    * Verify and Bench may both build this query in one JVM).
    */
  private def writeFixture(): String = {
    val path = Paths.get(FixturePath)
    Files.createDirectories(path.getParent)
    val tmp = Files.createTempFile(path.getParent, "taxi_rides", ".csv.gz.tmp")
    val out = new GZIPOutputStream(Files.newOutputStream(tmp))
    try out.write(
      TaxiFixture.csvLines(NRides).mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    path.toString
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "taxi_csv_roundtrip" -> ((s, _) => {
      val file = writeFixture()
      TaxiRide.parseCsv(s.read.text(file), "value")
        .select(
          col("rideId").as("ride_id"),
          unix_millis(col("time")).as("t_ms"),
          col("isStart").cast("int").as("is_start"),
          col("lon"), col("lat"),
          col("passengerCnt").cast("int").as("passengers"),
          col("travelDist").as("travel_dist"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "taxi_csv_roundtrip" ->
      s"""SELECT rideId AS ride_id,
         |  epoch_ms(t) AS t_ms,
         |  CAST(kind = 'START' AS INT) AS is_start,
         |  lon, lat,
         |  CAST(passengers AS INT) AS passengers,
         |  travelDist AS travel_dist
         |FROM read_csv('$FixturePath',
         |  header=false, delim=',',
         |  columns={'rideId':'BIGINT','t':'TIMESTAMP','kind':'VARCHAR',
         |           'lon':'DOUBLE','lat':'DOUBLE',
         |           'passengers':'SMALLINT','travelDist':'FLOAT'},
         |  timestampformat='%Y-%m-%d %H:%M:%S')""".stripMargin
  )
}
