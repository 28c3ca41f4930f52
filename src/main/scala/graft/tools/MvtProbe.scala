package graft.tools

/** Stage-by-stage profile of q_hm_mvt_tiles (the round-3 driver-environment
  * anomaly: 20 s driver vs 1.6 s builder for identical code). Times each
  * half of the query separately, repeated, to locate the repeated cost. */
object MvtProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).map(_.toInt).getOrElse(32)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    implicit val s: org.apache.spark.sql.SparkSession = graft.spark.Sessions.local(cpus, "mvt-probe")
    import s.implicits._
    val k = graft.agg.HeatmapAgg.KAnonymity

    def time[A](label: String)(f: => A): A = {
      var out: Option[A] = None
      val ts = (1 to reps).map { _ =>
        s.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        out = Some(f)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $label%-28s min=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
      out.get
    }

    // ensure the dump exists (not timed — the catalog shares it)
    val warm = graft.queries.GraftQueries.queries("q_hm_mvt_tiles")(s, d)
    println(s"warm full count=${warm.count()}")

    println(s"dump_read_partitions=${s.read.parquet(graft.queries.GraftQueries.CellsDumpPath).rdd.getNumPartitions}")

    // the catalog's own flat projection — keeps the probe measuring the
    // exact decode path q_hm_mvt_tiles runs
    def flat = graft.queries.GraftQueries.cellsDumpFlat(s, d)
    time("flat_decode")(flat.map(t => t._2.length.toLong).reduce(_ + _))
    time("z14_flat_encode")(graft.mvt.MvtJobs.encodeZ14Flat(flat, k).count())
    time("lower_partials_flat")(graft.agg.Pyramid.lowerPartialsFlat(flat, k).count())
    time("lower_fused_encode")(
      graft.mvt.MvtJobs.encodeLowerFused(graft.agg.Pyramid.lowerPartialsFlat(flat, k)).count())

    time("read_cells_count")(s.read.parquet(graft.queries.GraftQueries.CellsDumpPath).count())
    time("read_cells_decode") {
      s.read.parquet(graft.queries.GraftQueries.CellsDumpPath)
        .as[graft.model.Schemas.TileCells].map(t => t.cells.length.toLong).reduce(_ + _)
    }
    def tc = s.read.parquet(graft.queries.GraftQueries.CellsDumpPath)
      .as[graft.model.Schemas.TileCells]
    time("z14_encode")(graft.mvt.MvtJobs.encodeZ14FromTileCells(tc, k).count())
    time("lower_levels")(graft.agg.Pyramid.lowerLevelsFromTiles(tc, k).count())
    time("lower_encode")(
      graft.mvt.MvtJobs.encodeTiles(graft.agg.Pyramid.lowerLevelsFromTiles(tc, k)).count())
    time("full_query")(graft.queries.GraftQueries.queries("q_hm_mvt_tiles")(s, d).count())
    s.stop()
  }
}
