package graft

import graft.model.TaxiRide
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CSV codec round-trip (SURVEY.md §5.2), including the intended
  * `yyyy-MM-dd` pattern (the reference's `yyyy-MM-DD` day-of-year quirk
  * is deliberately not reproduced — SURVEY.md §1.2).
  */
class TaxiRideCodecSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val lines = Seq(
    "1,2013-01-01 00:00:00,START,-73.99,40.75,2,-1.0",
    "1,2013-01-01 00:10:30,END,-73.98,40.76,2,3.5",
    "42,2013-06-15 23:59:59,END,-74.0,40.7,1,0.0") // June: day-of-year bug would corrupt this

  test("parse → format round-trips") {
    import spark.implicits._
    val parsed = TaxiRide.parseCsv(lines.toDF("line"), "line")
    val back = parsed.select(TaxiRide.formatCsv.as("line")).as[String].collect()
    assert(back.toSeq == lines)
  }

  test("parse yields typed fields") {
    import spark.implicits._
    val parsed = TaxiRide.parseCsv(lines.toDF("line"), "line").as[TaxiRide].collect()
    assert(parsed(0).isStart && !parsed(1).isStart)
    assert(parsed(1).travelDist == 3.5f)
    assert(parsed(0).passengerCnt == 2.toShort)
    assert(parsed(2).time.toInstant.toString == "2013-06-15T23:59:59Z")
  }

  test("empty lon/lat default to 0 like the reference") {
    import spark.implicits._
    val parsed = TaxiRide.parseCsv(
      Seq("7,2013-01-02 01:02:03,START,,,1,").toDF("line"), "line").as[TaxiRide].head()
    assert(parsed.lon == 0.0 && parsed.lat == 0.0 && parsed.travelDist == 0.0f)
  }
}
