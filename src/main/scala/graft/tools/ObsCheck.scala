package graft.tools

import org.apache.spark.sql.functions._

/** One-off check: does an Observation attached below a
  * `freshLocalCheckpoint` (eager localCheckpoint) fire during the
  * checkpoint materialization? Decides whether the CC loop can fold its
  * convergence count into the per-round checkpoint job. */
object ObsCheck {
  def main(args: Array[String]): Unit = {
    implicit val spark: org.apache.spark.sql.SparkSession = graft.spark.Sessions.local(8, "obs-check")
    val obs = org.apache.spark.sql.Observation("cc")
    val df = spark.range(1000).toDF("n")
      .observe(obs, sum(when(col("n") % 7 === 0, 1L).otherwise(0L)).as("changed"))
    val t0 = System.nanoTime()
    val cp = org.apache.spark.sql.graft.SparkInternals.freshLocalCheckpoint(df)
    println(s"checkpointed rows=${cp.count()} in ${(System.nanoTime() - t0) / 1e9}")
    val t1 = System.nanoTime()
    val got = obs.getAsJava // blocks until the listener fires
    println(s"observation=$got after ${(System.nanoTime() - t1) / 1e9}s")
    spark.stop()
  }
}
