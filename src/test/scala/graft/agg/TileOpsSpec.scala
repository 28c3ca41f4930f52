package graft.agg

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Schemas.GlobalPixel

/** A12 RemoveAll + J5 CopyTilesTo relational semantics vs in-memory oracles. */
class TileOpsSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = graft.spark.Sessions.local(4, "tileops-spec")
  private val Res = 512

  private def px(z: Int, tx: Long, ty: Long, lx: Int, ly: Int, users: Long, trips: Long) =
    GlobalPixel(z, tx * Res + lx, ty * Res + ly, users, trips)

  private val source = Seq(
    px(14, 10, 10, 0, 0, 3, 5), px(14, 10, 10, 1, 2, 4, 7),
    px(14, 11, 10, 5, 5, 2, 2),
    px(13, 5, 5, 9, 9, 6, 6))
  private val target = Seq(
    px(14, 10, 10, 0, 0, 1, 1),   // collides with source -> overwritten
    px(14, 10, 10, 9, 9, 8, 8),   // same tile, source absent -> kept
    px(14, 12, 12, 3, 3, 9, 9))   // untouched tile -> kept

  test("removeTiles drops exactly the selected tiles' pixels (HeatMapDiff.RemoveAll)") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val got = TileOps.removeTiles(s.createDataset(source), Seq((14, 10L, 10L))).collect().toSet
    val want = source.filterNot(p =>
      p.z == 14 && p.gx / Res == 10 && p.gy / Res == 10).toSet
    assert(got === want)
    assert(got.size === 2)
  }

  test("copyTilesTo: per-pixel overwrite within selected tiles, rest preserved") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val got = TileOps.copyTilesTo(
      s.createDataset(source), s.createDataset(target), Seq((14, 10L, 10L))).collect().toSet
    val want = Set(
      px(14, 10, 10, 0, 0, 3, 5),  // source wins on collision (assignment, not add)
      px(14, 10, 10, 1, 2, 4, 7),  // source-only pixel copied
      px(14, 10, 10, 9, 9, 8, 8),  // target pixel the source doesn't touch
      px(14, 12, 12, 3, 3, 9, 9))  // unselected tile untouched
    assert(got === want)
  }

  test("copyTilesTo applies translate and drops non-positive results (value > 0 guard)") {
    implicit val s: SparkSession = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val got = TileOps.copyTilesTo(
      s.createDataset(source), s.createDataset(target), Seq((14, 10L, 10L), (14, 11L, 10L)),
      translate = df => df.withColumn("trips", col("trips") - 2)).collect().toSet
    // (11,10) source pixel had trips=2 -> translated 0 -> dropped entirely
    assert(!got.exists(p => p.gx / Res == 11))
    assert(got.contains(px(14, 10, 10, 0, 0, 3, 3)))
    assert(got.contains(px(14, 10, 10, 1, 2, 4, 5)))
  }
}
