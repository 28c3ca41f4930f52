package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The reference's tile→users text index + per-user cursor files as an
 * interchange source/sink (`/root/reference/src/HeatMap.Tiles.Service/
 * Worker.cs:290-338`):
 *
 *   {dir}/tiles/{z}/{x}/{y}.users       one user id per line
 *   {dir}/users/{userId}/state.txt      last contribution id for the user
 *
 * The engine's own storage is the parquet `tile_users` / `user_cursors`
 * relations; these files exist so a reference deployment's on-disk state
 * can be read in, and engine output can be dropped into reference tooling.
 * Writing is distributed (foreachPartition, executor-local I/O like the
 * MVT sink); reading is a distributed text scan with the tile coordinates
 * parsed from the file path — no driver-side directory walk.
 */
object UsersIndexFiles {

  /** Sink: (z, tx, ty, users: array<bigint>) rows → {z}/{x}/{y}.users
    * files, one line per user in array order. */
  def writeIndex(index: DataFrame, dir: String): Unit = {
    index.select(col("z").cast("int"), col("tx").cast("long"),
        col("ty").cast("long"), col("users").cast("array<long>"))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        rows.foreach { r =>
          val d = Paths.get(dir, "tiles", r.getInt(0).toString, r.getLong(1).toString)
          Files.createDirectories(d)
          val lines = r.getSeq[Long](3).map(_.toString).mkString("", "\n", "\n")
          Files.write(d.resolve(s"${r.getLong(2)}.users"),
            lines.getBytes(StandardCharsets.UTF_8))
        }
      }
  }

  /** Source: the whole index as (z, tx, ty, user_id) rows — a distributed
    * text scan; coordinates come from the file path. */
  def readIndex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(s"$dir/tiles/*/*/*.users")
      .withColumn("path", input_file_name())
      .select(
        regexp_extract(col("path"), """tiles/(\d+)/(\d+)/(\d+)\.users""", 1).cast("int").as("z"),
        regexp_extract(col("path"), """tiles/(\d+)/(\d+)/(\d+)\.users""", 2).cast("long").as("tx"),
        regexp_extract(col("path"), """tiles/(\d+)/(\d+)/(\d+)\.users""", 3).cast("long").as("ty"),
        col("value").cast("long").as("user_id"))
  }

  /** The reference's incremental ADD (Worker.cs:298-324), replicated
    * exactly: append the user to each tile's file unless already listed
    * (idempotent — a second add leaves the file byte-identical).
    *
    * Durability: the rewrite goes through a temp file + ATOMIC_MOVE, so a
    * crash mid-write can never leave a truncated `.users` file (readers see
    * the old complete content or the new complete content). Concurrency
    * contract: SINGLE WRITER PER TILE — like the reference's one-process
    * Worker loop; the read-modify-write is not locked, so two concurrent
    * adders to the SAME tile could still lose one user. The engine's
    * distributed writer (`writeIndex`) partitions by tile, which satisfies
    * the contract by construction. */
  def addUserTo(dir: String, userId: Long, tiles: Seq[(Int, Long, Long)]): Unit =
    tiles.foreach { case (z, tx, ty) =>
      val d = Paths.get(dir, "tiles", z.toString, tx.toString)
      Files.createDirectories(d)
      val f = d.resolve(s"$ty.users")
      val existing =
        if (Files.exists(f))
          new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
            .split("\n").filter(_.nonEmpty).toSeq
        else Seq.empty
      if (!existing.contains(userId.toString)) {
        val lines = (existing :+ userId.toString).mkString("", "\n", "\n")
        AtomicWrite.writeVia(d.resolve(s".$ty.users.tmp"), f, lines)
      }
    }

  /** Per-user cursor files (Worker.cs:290-296). */
  def writeUserCursors(cursors: DataFrame, dir: String): Unit =
    cursors.select(col("user_id").cast("long"), col("last_id").cast("long"))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        rows.foreach { r =>
          val d = Paths.get(dir, "users", r.getLong(0).toString)
          Files.createDirectories(d)
          Files.write(d.resolve("state.txt"),
            r.getLong(1).toString.getBytes(StandardCharsets.UTF_8))
        }
      }

  def readUserCursors(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(s"$dir/users/*/state.txt")
      .withColumn("path", input_file_name())
      .select(
        regexp_extract(col("path"), """users/(\d+)/state\.txt""", 1).cast("long").as("user_id"),
        col("value").cast("long").as("last_id"))
  }
}
