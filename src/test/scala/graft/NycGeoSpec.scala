package graft

import graft.geo.NycGeo
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh-").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Grid math vs hand-computed fixtures + the roundtrip property
  * (SURVEY.md §5.2/§5.3): the center of any in-bounds point's cell maps
  * back to the same cell.
  */
class NycGeoSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("grid cell id matches hand-computed fixtures") {
    import spark.implicits._
    // NW corner cell 0; one cell east = 1; one cell south = 250
    val df = Seq(
      (-74.0493, 40.9994), // x=0, y=0 -> 0
      (-74.0479, 40.9994), // x=1, y=0 -> 1
      (-74.0493, 40.9987), // x=0, y=1 -> 250
      (-73.7007, 40.5006) // SE corner -> x=249, y=399 -> 99999
    ).toDF("lon", "lat")
    val cells = df.select(NycGeo.gridCell(col("lon"), col("lat"))).as[Int].collect()
    assert(cells.toSeq == Seq(0, 1, 250, 99999))
  }

  test("bbox predicate keeps corners, drops outside points") {
    import spark.implicits._
    val df = Seq(
      (-74.05, 40.5, true), (-73.7, 41.0, true),
      (-74.06, 40.7, false), (-73.69, 40.7, false),
      (-73.9, 40.49, false), (-73.9, 41.01, false)
    ).toDF("lon", "lat", "expected")
    val got = df.select(NycGeo.isInNYC(col("lon"), col("lat")) === col("expected")).as[Boolean].collect()
    assert(got.forall(identity))
  }

  test("roundtrip property: cell center lands in the same cell") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(2000)((
      NycGeo.LonWest + rnd.nextDouble() * (NycGeo.LonEast - NycGeo.LonWest),
      NycGeo.LatSouth + rnd.nextDouble() * (NycGeo.LatNorth - NycGeo.LatSouth)))
    val df = pts.toDF("lon", "lat")
      .select(NycGeo.gridCell(col("lon"), col("lat")).as("cell"))
      .select(col("cell"),
        NycGeo.gridCell(
          NycGeo.cellCenterLon(col("cell")).cast("double"),
          NycGeo.cellCenterLat(col("cell")).cast("double")).as("cell2"))
    val mismatches = df.filter(col("cell") =!= col("cell2")).count()
    assert(mismatches == 0)
  }

  test("cell centers are Float-truncated like the reference") {
    import spark.implicits._
    val centers = Seq(0).toDF("cell")
      .select(NycGeo.cellCenterLon(col("cell")), NycGeo.cellCenterLat(col("cell")))
      .as[(Float, Float)].head()
    // reference: -(74.05 - 0*0.0014 - 0.0007).toFloat, (41.0 - 0*0.00125 - 0.000625).toFloat
    assert(centers._1 == (-(74.05 - 0.0007)).toFloat)
    assert(centers._2 == (41.0 - 0.000625).toFloat)
  }
}
