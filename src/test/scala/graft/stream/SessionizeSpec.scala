package graft.stream

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Stateful streaming sessionization must converge to the batch
  * window-function oracle under multi-micro-batch slicing. */
class SessionizeSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = graft.spark.Sessions.local(4, "session-spec")

  test("mapGroupsWithState sessions == batch lag-window sessions (3 micro-batches)") {
    implicit val s: SparkSession = spark
    val events = s.read.parquet("/root/testdata/sf0.001/events.parquet")
    // slice id-ordered (≈ ts-ordered) chunks into separate files
    val base = java.nio.file.Files.createTempDirectory("sessionsrc").toString
    import org.apache.spark.sql.functions._
    (0 until 3).foreach { i =>
      events.where(col("event_id") % 3 === i) // deliberately interleaved slices
        .coalesce(1).write.parquet(s"$base/c$i")
    }
    val flat = s"$base/flat"
    new java.io.File(flat).mkdirs()
    (0 until 3).foreach { i =>
      new java.io.File(s"$base/c$i").listFiles().filter(_.getName.endsWith(".parquet"))
        .zipWithIndex.foreach { case (f, j) =>
          java.nio.file.Files.copy(f.toPath, java.nio.file.Paths.get(flat, s"p-$i-$j.parquet"))
        }
    }
    val got = Sessionize.runOnce(flat, events.schema, "sessions_test")
      .collect().map(r => (r.getAs[Long]("user_id"),
        (r.getAs[Long]("n_events"), r.getAs[Long]("last_ts_us")))).toMap
    val want = Sessionize.sessionsBatch(events)
      .collect().map(r => (r.getAs[Long]("user_id"),
        (r.getAs[Long]("n_events"), r.getAs[Long]("last_ts_us")))).toMap
    assert(want.nonEmpty)
    assert(got.keySet === want.keySet)
    // event counts and last timestamps always converge; session counts
    // converge when batch slices respect time order per user — the
    // interleaved slices above break that deliberately for events/ts, so
    // compare n_sessions on the time-ordered slicing below
    got.foreach { case (u, (n, last)) =>
      assert(n === want(u)._1, s"user $u n_events")
      assert(last === want(u)._2, s"user $u last_ts")
    }
  }

  test("time-ordered micro-batches: session counts converge exactly") {
    implicit val s: SparkSession = spark
    import org.apache.spark.sql.functions._
    val events = s.read.parquet("/root/testdata/sf0.001/events.parquet")
    val base = java.nio.file.Files.createTempDirectory("sessionsrc2").toString
    val flat = s"$base/flat"
    new java.io.File(flat).mkdirs()
    (0 until 3).foreach { i =>
      events.where(col("event_id") >= i * 334 && col("event_id") < (i + 1) * 334)
        .coalesce(1).write.parquet(s"$base/c$i")
      new java.io.File(s"$base/c$i").listFiles().filter(_.getName.endsWith(".parquet"))
        .zipWithIndex.foreach { case (f, j) =>
          java.nio.file.Files.copy(f.toPath, java.nio.file.Paths.get(flat, s"p-$i-$j.parquet"))
        }
    }
    val got = Sessionize.runOnce(flat, events.schema, "sessions_test2")
      .collect().map(r => (r.getAs[Long]("user_id"),
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_sessions")))).toMap
    val want = Sessionize.sessionsBatch(events)
      .collect().map(r => (r.getAs[Long]("user_id"),
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_sessions")))).toMap
    assert(got === want)
  }
}
