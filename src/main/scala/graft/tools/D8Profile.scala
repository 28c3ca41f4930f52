package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing for the q_d8 probe path: which part of the ~5 s
  * steady cost is the probe itself vs the catalog query's oracle-dump
  * bookkeeping. */
object D8Profile {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[d8prof] $label sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    r
  }

  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = graft.spark.Sessions.local(32, "d8prof")
    import spark.implicits._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val q = graft.queries.GraftQueries.queries("q_d8_lsh_probe")
    val dir = graft.queries.GraftQueries.LshIndexPath
    // round 1 pays dump + index build
    t("round1 full query")(q(spark, sfDir).count())
    (2 to 3).foreach { r =>
      val batch = graft.queries.Tables.documents(spark, sfDir)
        .where(col("doc_id") >= graft.queries.GraftQueries.LshProbeSplit &&
          col("doc_id") < graft.queries.GraftQueries.LshProbeSplit +
            graft.queries.GraftQueries.LshProbeBatch)
      // --- manual replay of probe's internal stages, timed one by one ---
      val prepared = t(s"r$r prep+persist")(
        { val p = graft.dedup.Dedup.shingleSigs(batch, 64).persist(); p.count(); p })
      val newBands = prepared
        .flatMap { case (id, _, sig) =>
          graft.dedup.Dedup.lshBands(sig, 8).zipWithIndex.map { case (h, b) => (id, b, h) }
        }.toDF("doc_id", "band", "bucket")
        .withColumn("bpb", graft.dedup.LshIndex.bpbCol(col("band"), col("bucket")))
        .withColumn("is_new", lit(true)).persist()
      val touched = t(s"r$r touched collect")(
        newBands.select("bpb").distinct().as[Int].collect().toSeq)
      println(s"[d8prof] touched dirs=${touched.length}")
      val idxBands = t(s"r$r idx scan count")({
        val sc = spark.read.parquet(s"$dir/bands")
          .where(col("bpb").isin(touched.map(Integer.valueOf): _*))
        sc.count(); sc
      }).select(col("doc_id"), col("band"), col("bucket"), lit(false).as("is_new"))
      val combined = idxBands.unionByName(newBands.select("doc_id", "band", "bucket", "is_new"))
      val newKeys = broadcast(newBands.select("band", "bucket").distinct())
      val relevant = combined.join(newKeys, Seq("band", "bucket"), "left_semi")
      val capped = graft.spark.BucketCap.cap(relevant, Seq("band", "bucket"), 256, None)
      val cand = t(s"r$r cand self-join")({
        val c = capped.as("l").join(capped.as("r"),
          $"l.band" === $"r.band" && $"l.bucket" === $"r.bucket" && $"l.doc_id" < $"r.doc_id")
          .where($"l.is_new" || $"r.is_new")
          .select($"l.doc_id".as("a"), $"r.doc_id".as("b")).distinct().persist()
        c.count(); c
      })
      val candIds = cand.select(col("a").as("doc_id"))
        .union(cand.select(col("b").as("doc_id"))).distinct()
      val idxSh = spark.read.parquet(s"$dir/shingles").join(candIds, "doc_id")
      val sh = idxSh.unionByName(prepared.map { case (id, s2, _) => (id, s2) }.toDF("doc_id", "sh"))
        .as[(Long, Array[Long])].toDF("doc_id", "sh")
      t(s"r$r refine")(graft.dedup.Dedup.refineJaccard(cand, sh, 0.8).count())
      cand.unpersist(); newBands.unpersist(); prepared.unpersist()
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
