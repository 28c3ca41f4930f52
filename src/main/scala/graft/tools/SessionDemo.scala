package graft.tools
import org.apache.spark.sql.SparkSession
/** Sessionization demo: streams the events table in 3 micro-batches through
  * mapGroupsWithState and prints converged per-user session stats. */
object SessionDemo {
  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = graft.spark.Sessions.local(8, "session-demo")
    import org.apache.spark.sql.functions._
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val base = java.nio.file.Files.createTempDirectory("sess-demo").toString
    val flat = s"$base/flat"; new java.io.File(flat).mkdirs()
    (0 until 3).foreach { i =>
      events.where(col("event_id") >= i * 334 && col("event_id") < (i + 1) * 334)
        .coalesce(1).write.parquet(s"$base/c$i")
      new java.io.File(s"$base/c$i").listFiles().filter(_.getName.endsWith(".parquet"))
        .zipWithIndex.foreach { case (f, j) =>
          java.nio.file.Files.copy(f.toPath, java.nio.file.Paths.get(flat, s"p-$i-$j.parquet")) }
    }
    val got = graft.stream.Sessionize.runOnce(flat, events.schema, "demo_sessions")
    val total = got.agg(sum("n_sessions"), sum("n_events")).collect().head
    println(s"[sessions] users=${got.count()} total_sessions=${total.getLong(0)} total_events=${total.getLong(1)}")
    spark.stop()
  }
}
