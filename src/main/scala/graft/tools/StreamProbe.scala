package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timing for the streaming near-dedup catalog queries: how much of
  * the per-invocation cost is the id-ordered slice WRITE (static input
  * prep) vs the live stream drive itself. */
object StreamProbe {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[streamprobe] $label sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    implicit val spark: SparkSession = graft.spark.Sessions.local(cpus, "stream-probe")
    import spark.implicits._
    (1 to 3).foreach { r =>
      val docs = graft.queries.Tables.documents(spark, sfDir)
        .where(col("doc_id") < 500)
        .select(col("doc_id").as("id"), col("text"))
      val base = java.nio.file.Files.createTempDirectory("stream-probe").toString
      val flat = t(s"r$r slice write")(
        graft.stream.StreamDedup.writeIdOrderedSlices(docs, 4, 125, base))
      val out = t(s"r$r stream drive")(
        graft.stream.StreamDedup.runOnceText(flat, docs.schema, s"probe_$r${System.nanoTime()}"))
      t(s"r$r collapse count")(out.count())
      graft.stream.StreamDedup.deleteTree(base)
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
