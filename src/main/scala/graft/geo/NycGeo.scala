package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** NYC geospatial grid as pure Catalyst column expressions.
  *
  * Re-expresses the reference's grid scalar functions
  * (`utils/NycGeoUtils.scala:26-86`) as column arithmetic instead of
  * UDFs, so they constant-fold, participate in whole-stage codegen and
  * can be pushed into scans. A 250×400 grid (~100 m cells) covers
  * lon ∈ [−74.05, −73.7], lat ∈ [40.5, 41.0], numbered row-major from
  * the north-west corner.
  *
  * The reference's `isInNYC` (`utils/NycGeoUtils.scala:48-54`) is a
  * no-op by accident (dangling expressions); we implement the intended
  * bounding-box semantics (SURVEY.md §2 O5).
  *
  * `cellCenterLon/Lat` reproduce the reference's Float truncation
  * (`utils/NycGeoUtils.scala:80,83`) via cast to FloatType — oracle
  * comparisons depend on it (SURVEY.md §7 decision log).
  */
object NycGeo {
  val LonEast: Double = -73.7
  val LonWest: Double = -74.05
  val LatNorth: Double = 41.0
  val LatSouth: Double = 40.5
  val DeltaLon: Double = 0.0014 // ~100 m east-west
  val DeltaLat: Double = 0.00125 // ~100 m north-south
  val CellsPerRow: Int = 250
  val CellsPerColumn: Int = 400

  /** Intended bounding-box predicate (reference O5). */
  def isInNYC(lon: Column, lat: Column): Column =
    lon.between(LonWest, LonEast) && lat.between(LatSouth, LatNorth)

  /** (lon, lat) → grid cell id, row-major from NW (reference O6). */
  def gridCell(lon: Column, lat: Column): Column = {
    val xIdx = floor((lit(math.abs(LonWest)) - abs(lon)) / DeltaLon)
    val yIdx = floor((lit(LatNorth) - lat) / DeltaLat)
    (xIdx + yIdx * CellsPerRow).cast("int")
  }

  /** Cell id → center longitude, Float-truncated like the reference (O12). */
  def cellCenterLon(cell: Column): Column =
    (-(lit(math.abs(LonWest)) - (cell % CellsPerRow) * DeltaLon - DeltaLon / 2))
      .cast("float")

  /** Cell id → center latitude, Float-truncated like the reference (O12). */
  def cellCenterLat(cell: Column): Column =
    (lit(LatNorth) - floor(cell / CellsPerRow) * DeltaLat - DeltaLat / 2)
      .cast("float")

  /** DuckDB SQL fragments for the oracle side — kept adjacent to the
    * Scala expressions above so the two can only drift in one file.
    * All literals are cast to DOUBLE: a bare decimal literal in DuckDB
    * is DECIMAL-typed and would change the arithmetic.
    */
  object Sql {
    val gridCell: String =
      "CAST(FLOOR((74.05::DOUBLE - ABS(lon)) / 0.0014::DOUBLE) + " +
        "FLOOR((41.0::DOUBLE - lat) / 0.00125::DOUBLE) * 250 AS INT)"
    def cellCenterLon(cell: String): String =
      s"CAST(-(74.05::DOUBLE - ($cell % 250) * 0.0014::DOUBLE - 0.0007::DOUBLE) AS REAL)"
    def cellCenterLat(cell: String): String =
      s"CAST(41.0::DOUBLE - FLOOR($cell / 250.0::DOUBLE) * 0.00125::DOUBLE - 0.000625::DOUBLE AS REAL)"
    val isInNYC: String =
      "lon BETWEEN -74.05::DOUBLE AND -73.7::DOUBLE AND lat BETWEEN 40.5::DOUBLE AND 41.0::DOUBLE"
  }
}
