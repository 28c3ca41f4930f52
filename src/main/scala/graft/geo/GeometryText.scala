package graft.geo

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.model.Schemas.Track

/**
 * Text-geometry ingestion: WKT and GeoJSON `LineString` → `Track` coords.
 *
 * The reference consumes NetTopologySuite `Geometry` values materialized by
 * its Postgres driver (`/root/reference/src/HeatMap.Tiles.Service/Db.cs:39-64`,
 * filtered to LineStrings in `Draw/HeatMapDiffExtensions.cs:37-39`); a
 * deployment switching to this engine typically has those geometries as WKT
 * or GeoJSON text columns. Both parsers are written against the public
 * specs (OGC Simple Features WKT; RFC 7946 GeoJSON), accept only
 * `LineString`, and return null for anything else — the caller's null-drop
 * is exactly the reference's F1/F2 filter pair.
 */
object GeometryText {

  /** `LINESTRING (lon lat, lon lat, ...)` → coords, or null if not a
    * (non-empty) WKT LineString. Case-insensitive keyword, optional extra
    * whitespace; Z/M variants are rejected (the reference draws 2D only). */
  def parseWktLineString(wkt: String): Array[Array[Double]] = {
    if (wkt == null) return null
    val s = wkt.trim
    val up = s.toUpperCase
    if (!up.startsWith("LINESTRING")) return null
    val rest = s.substring("LINESTRING".length).trim
    if (rest.toUpperCase.startsWith("EMPTY")) return null
    if (!rest.startsWith("(") || !rest.endsWith(")")) return null
    val body = rest.substring(1, rest.length - 1).trim
    try {
      val pts = body.split(",").map { p =>
        val nums = p.trim.split("\\s+")
        if (nums.length != 2) return null // Z/M or malformed
        Array(nums(0).toDouble, nums(1).toDouble)
      }
      // OGC WKT (and the reference's NTS stack) requires >= 2 points for a
      // LineString — a degenerate single-point track is malformed, not drawable
      if (pts.length >= 2) pts else null
    } catch { case _: NumberFormatException => null }
  }

  /** GeoJSON `{"type":"LineString","coordinates":[[lon,lat],...]}` →
    * coords, or null for other types / malformed input. Minimal parser for
    * the LineString subset of RFC 7946 (no external JSON dependency). */
  def parseGeoJsonLineString(json: String): Array[Array[Double]] = {
    if (json == null) return null
    val typeRe = """"type"\s*:\s*"([A-Za-z]+)"""".r
    val ty = typeRe.findFirstMatchIn(json).map(_.group(1)).orNull
    if (ty != "LineString") return null
    val coordsIdx = json.indexOf("\"coordinates\"")
    if (coordsIdx < 0) return null
    val start = json.indexOf('[', coordsIdx)
    if (start < 0) return null
    // scan the balanced outer array
    var depth = 0
    var i = start
    var end = -1
    while (i < json.length && end < 0) {
      json.charAt(i) match {
        case '[' => depth += 1
        case ']' => depth -= 1; if (depth == 0) end = i
        case _ =>
      }
      i += 1
    }
    if (end < 0) return null
    val body = json.substring(start + 1, end).trim
    if (body.isEmpty) return null
    try {
      val pts = body.split("""\]\s*,\s*\[""").map { p =>
        val nums = p.replace("[", "").replace("]", "").split(",").map(_.trim.toDouble)
        if (nums.length < 2) return null
        Array(nums(0), nums(1)) // lon, lat; altitude (if any) dropped
      }
      // RFC 7946 §3.1.4: a LineString has two or more positions
      if (pts.length >= 2) pts else null
    } catch { case _: NumberFormatException => null }
  }

  /** (contribution_id, user_id, wkt) rows → tracks, non-LineStrings and
    * malformed rows dropped (the reference's F1/F2 semantics). */
  def tracksFromWkt(rows: DataFrame)(implicit spark: SparkSession): Dataset[Track] = {
    import spark.implicits._
    rows.select("contribution_id", "user_id", "wkt").as[(Long, Long, String)]
      .flatMap { case (id, uid, wkt) =>
        Option(parseWktLineString(wkt)).map(c => Track(id, uid, c))
      }
  }

  /** (contribution_id, user_id, geojson) rows → tracks, same drop rules. */
  def tracksFromGeoJson(rows: DataFrame)(implicit spark: SparkSession): Dataset[Track] = {
    import spark.implicits._
    rows.select("contribution_id", "user_id", "geojson").as[(Long, Long, String)]
      .flatMap { case (id, uid, gj) =>
        Option(parseGeoJsonLineString(gj)).map(c => Track(id, uid, c))
      }
  }
}
