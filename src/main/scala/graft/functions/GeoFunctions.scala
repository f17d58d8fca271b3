package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Spark-native port of the reference's geo UDF surface
  * (official-tutorial/src/main/java/com/bigdata/flink/proj/taxi/util/
  * GeoUtils.java:60-243): NYC bounding box, grid-cell mapping,
  * cell-center recovery, euclidean distance, direction angle.
  *
  * Implemented as pure Column expressions (not Scala UDFs): every one
  * stays inside whole-stage codegen — at 100 TB the difference between
  * a codegen'd expression and a boxed UDF on the hot path is the whole
  * ballgame.
  */
object GeoFunctions {
  // NYC-ish bounding box + grid constants, mirroring GeoUtils
  val LonEast  = -73.7  // GeoUtils.java:LON_EAST
  val LonWest  = -74.05 // GeoUtils.java:LON_WEST
  val LatNorth = 41.0   // GeoUtils.java:LAT_NORTH
  val LatSouth = 40.5   // GeoUtils.java:LAT_SOUTH
  val DeltaLon = 0.0014 // ~100m cell width (GeoUtils.java:DELTA_LON)
  val DeltaLat = 0.00125
  val NumberOfGridX = 250 // (LonEast-LonWest)/DeltaLon

  /** Inside the NYC box (GeoUtils.isInNYC). */
  def isInNYC(lon: Column, lat: Column): Column =
    lon > LonWest && lon < LonEast && lat > LatSouth && lat < LatNorth

  /** (lon,lat) -> grid cell id (GeoUtils.mapToGridCell). */
  def mapToGridCell(lon: Column, lat: Column): Column = {
    val xIndex = floor((lon - lit(LonWest)) / lit(DeltaLon)).cast("int")
    val yIndex = floor((lit(LatNorth) - lat) / lit(DeltaLat)).cast("int")
    xIndex + (yIndex * lit(NumberOfGridX))
  }

  /** Grid cell id -> center lon (GeoUtils.getGridCellCenterLon). */
  def gridCellCenterLon(cell: Column): Column =
    (abs(cell) % lit(NumberOfGridX)).cast("double") * lit(DeltaLon) +
      lit(LonWest) + lit(DeltaLon / 2)

  /** Grid cell id -> center lat (GeoUtils.getGridCellCenterLat). */
  def gridCellCenterLat(cell: Column): Column =
    lit(LatNorth) -
      floor(abs(cell).cast("double") / lit(NumberOfGridX)) * lit(DeltaLat) -
      lit(DeltaLat / 2)

  /** Euclidean distance in degrees (GeoUtils.euclideanDistance shape). */
  def euclideanDistance(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column =
    sqrt(pow(lon2 - lon1, 2) + pow(lat2 - lat1, 2))

  /** Direction angle in degrees [0, 360) (GeoUtils.getDirectionAngle). */
  def directionAngle(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column =
    degrees(atan2(lat2 - lat1, lon2 - lon1))
}
