package graft.spark

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's defaults (local mode; on a cluster the
  * same conf arrives via spark-submit). */
object Sessions {
  /** tmpfs shuffle scratch when available (local mode writes shuffle files
    * to disk otherwise; a real cluster has NVMe + network instead). */
  def scratchDir: Option[String] = {
    val d = new java.io.File("/dev/shm")
    if (d.isDirectory && d.canWrite) {
      val s = new java.io.File(d, "spark-local")
      s.mkdirs()
      Some(s.getAbsolutePath)
    } else None
  }

  def local(cpus: Int = 32, app: String = "graft"): SparkSession = {
    val builder0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(app)
      .config("spark.sql.shuffle.partitions", cpus.toString)
    val spark = scratchDir.fold(builder0)(d => builder0.config("spark.local.dir", d))
      // keep TypedImperativeAggregate partials in the hash path (the default
      // 128-key threshold would force a sort-based fallback for tile/pixel
      // grain keys); buffers are compact, so 4096 keys fit trivially
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
