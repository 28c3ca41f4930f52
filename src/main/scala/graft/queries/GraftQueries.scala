package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ann.Ann
import graft.dedup.Dedup
import graft.geo.SpatialJoins
import graft.geo.SpatialJoins.Region
import graft.model.Schemas.Track
import graft.pipeline.HeatmapPipeline
import graft.synth.{ImageSynth, TraceSynth}
import Tables._

/**
 * Graft-native queries: the heatmap pipeline over driver data, spatial
 * joins (point-in-polygon / kNN / raster↔vector), similarity search, hash
 * dedup, and the image-payload plumbing. Oracle-matched where DuckDB can
 * express the identical computation; the rest are rows-only here and
 * exactness-tested against in-repo oracles in ScalaTest.
 */
object GraftQueries {

  /** Synthetic-image row count for the q_img_* queries (deterministic,
    * scale-independent; the image ops are exactness-gated in ImageSynthSpec,
    * not by corpus size). */
  val ImageQueryRows = 1000L

  /** events rows → deterministic tracks (event_id seeds the lattice walk,
    * the real user_id drives k-anonymity). */
  def eventTracks(s: SparkSession, d: String) = {
    import s.implicits._
    // repartition the (id, user) pairs BEFORE the trace walk: the synthesis
    // + rasterization are the CPU-bound narrow stages and the parquet source
    // is a single split at these scales
    events(s, d).select("event_id", "user_id").as[(Long, Long)]
      .repartition(s.sparkContext.defaultParallelism * 2)
      .map { case (id, uid) => Track(id, uid, TraceSynth.trace(TraceSynth.mix64(id))) }
  }

  /** events rows → synthetic points in [3,5)×[50,51.5) (pure arithmetic,
    * reproducible in the oracle SQL). */
  def eventPoints(s: SparkSession, d: String): DataFrame =
    events(s, d).select(
      col("event_id").as("pid"),
      (lit(3.0) + (col("event_id") % 2000).cast("double") / 1000.0).as("lon"),
      (lit(50.0) + (col("event_id") * 3 % 1500).cast("double") / 1000.0).as("lat"))

  val TestRegions: Seq[Region] = Seq(
    Region(1, 3.2, 50.2, 3.8, 50.8),
    Region(2, 4.0, 50.5, 4.6, 51.1),
    Region(3, 3.5, 50.9, 4.9, 51.4),
    Region(4, 4.5, 50.1, 4.9, 50.45))

  val KnnQueries: Seq[(Long, Double, Double)] = Seq(
    (1L, 3.5, 50.5), (2L, 4.2, 51.0), (3L, 4.8, 50.2), (4L, 3.1, 51.4))

  /** Deterministic z14 tile cover of TestRegions — shared by the overlay
    * query (Spark side) and its oracle SQL (as embedded VALUES). */
  lazy val RegionCoverTiles: Seq[(Long, Long, Long)] = TestRegions
    .flatMap(r => SpatialJoins.coverCells(r).map { case (id, cell) =>
      val (tx, ty) = graft.core.Slippy.toTile(SpatialJoins.CellZoom, cell)
      (id, tx, ty)
    })

  /** Fixed path where the q_hm_* queries materialize the rasterizer output
    * (user_id, pkey, trips). Bresenham itself is not SQL-expressible, but
    * everything DOWNSTREAM of it is — materializing the narrow stage lets
    * DuckDB oracle the exact k-anonymity aggregation and pyramid rollup
    * over the identical rows. Overwritten per invocation (deterministic
    * content for a given sf dir). */
  val RasterDumpPath = "/tmp/graft_oracle/raster_pixels.parquet"

  /** Write the raster dump for `d` (skipped when a complete dump for the
    * SAME sf dir already exists — content is deterministic per input, so
    * the three dump-backed queries share one write) and return a reader. */
  private def rasterDump(s: SparkSession, d: String): DataFrame = {
    implicit val sp: SparkSession = s
    val marker = java.nio.file.Paths.get(RasterDumpPath + ".source")
    val fresh = java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker), "UTF-8") == d &&
      java.nio.file.Files.exists(java.nio.file.Paths.get(RasterDumpPath, "_SUCCESS"))
    if (!fresh) {
      java.nio.file.Files.deleteIfExists(marker)
      graft.raster.Rasterize.pixelKeys(eventTracks(s, d)).toDF()
        .write.mode("overwrite").parquet(RasterDumpPath)
      java.nio.file.Files.createDirectories(marker.getParent)
      java.nio.file.Files.write(marker, d.getBytes("UTF-8"))
    }
    s.read.parquet(RasterDumpPath)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- spatial joins (oracle-matched) ----
    "q_geo_pip_join" -> ((s, d) => {
      implicit val sp: SparkSession = s
      SpatialJoins.pointInRegion(eventPoints(s, d), TestRegions)
        .groupBy(col("region_id")).agg(count(lit(1)).as("n"))
    }),

    "q_geo_knn" -> ((s, d) => {
      implicit val sp: SparkSession = s
      SpatialJoins.knnBruteForce(eventPoints(s, d), KnnQueries, 5)
    }),

    "q_geo_knn_exact" -> ((s, d) => {
      implicit val sp: SparkSession = s
      SpatialJoins.knnExact(eventPoints(s, d), KnnQueries, 5)
    }),

    // ---- similarity search (oracle-matched) ----
    "q_ann_cosine_all" -> ((s, d) => {
      implicit val sp: SparkSession = s
      Ann.cosineToVec(embeddings(s, d), 0L)
        .select(col("vec_id"), round(col("sim"), 6).as("sim"))
    }),

    "q_ann_topk" -> ((s, d) => {
      implicit val sp: SparkSession = s
      Ann.cosineToVec(embeddings(s, d), 0L)
        .select(col("vec_id"), round(col("sim"), 6).as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
    }),

    // IVF scale path at full probe: must return exactly the brute-force
    // top-k (DuckDB-oracled); the recall/pruning trade-off is AnnSpec-gated
    "q_ann_ivf_topk" -> ((s, d) => {
      implicit val sp: SparkSession = s
      Ann.ivfTopK(embeddings(s, d), 0L, 10, nProbe = 16, nLists = 16)
        .select(col("vec_id"), round(col("sim"), 6).as("sim"))
    }),

    // ---- heatmap pipeline over driver data ----
    // z14 layer and pyramid stats are DuckDB-oracled by materializing the
    // rasterizer output (the only non-SQL-expressible stage) to parquet and
    // aggregating the identical rows in both engines. The tiled flagship
    // plan is proven equal to this aggregation in HeatmapAggSpec.
    "q_hm_z14_layer" -> ((s, d) => {
      implicit val sp: SparkSession = s
      import sp.implicits._
      graft.agg.HeatmapAgg.globalGrainFused(
        rasterDump(s, d).as[graft.model.Schemas.PixelVisit]).toDF()
    }),

    "q_hm_pyramid_stats" -> ((s, d) => {
      implicit val sp: SparkSession = s
      import sp.implicits._
      val z14 = graft.agg.HeatmapAgg.globalGrainFused(
        rasterDump(s, d).as[graft.model.Schemas.PixelVisit])
      graft.agg.Pyramid.allLevels(z14).toDF()
        .groupBy(col("z"))
        .agg(count(lit(1)).as("pixels"), sum(col("users")).cast("long").as("users"),
          sum(col("trips")).cast("long").as("trips"))
    }),

    "q_hm_mvt_tiles" -> ((s, d) => {
      implicit val sp: SparkSession = s
      val r = HeatmapPipeline.run(eventTracks(s, d))
      HeatmapPipeline.mvt(r.pyramid).toDF()
        .select(col("z"), col("tx"), col("ty"), length(col("mvt")).as("mvt_bytes"))
    }),

    // raster↔vector overlay, DuckDB-oracled: the heat side reads the
    // materialized raster dump; the vector side's z14 cover cells are
    // deterministic constants embedded in the oracle SQL as VALUES
    "q_geo_overlay" -> ((s, d) => {
      implicit val sp: SparkSession = s
      import sp.implicits._
      val heat = graft.agg.HeatmapAgg.globalGrainFused(
        rasterDump(s, d).as[graft.model.Schemas.PixelVisit]).toDF()
      val regionPixels = RegionCoverTiles.toDF("region_id", "tx", "ty")
      heat.withColumn("tx", shiftright(col("gx"), 9))
        .withColumn("ty", shiftright(col("gy"), 9))
        .join(broadcast(regionPixels), Seq("tx", "ty"))
        .groupBy(col("region_id"))
        .agg(count(lit(1)).as("pixels"), sum(col("trips")).cast("long").as("trips"))
    }),

    // the input_hint-shaped path end-to-end: Iceberg-shaped image+caption
    // rows → derived tracks → tiled heatmap (rows-only; every stage is
    // exactness-tested in HeatmapPipelineSpec/ImageSynthSpec)
    "q_hm_from_images" -> ((s, d) => {
      implicit val sp: SparkSession = s
      val tracks = HeatmapPipeline.tracks(HeatmapPipeline.images(2000))
      HeatmapPipeline.run(tracks).pyramid.toDF()
        .groupBy(col("z"))
        .agg(count(lit(1)).as("pixels"), sum(col("trips")).cast("long").as("trips"))
    }),

    // ---- hash dedup (rows-only; kernels exactness-tested in ScalaTest) ----
    "q_d3_minhash_pairs" -> ((s, d) => {
      implicit val sp: SparkSession = s
      Dedup.minhashNearDups(documents(s, d), threshold = 0.8, bands = 8)
        .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
    }),

    "q_d4_simhash" -> ((s, d) => {
      implicit val sp: SparkSession = s
      Dedup.simhashes(documents(s, d))
    }),

    "q_d5_fingerprints" -> ((s, d) => {
      implicit val sp: SparkSession = s
      import sp.implicits._
      documents(s, d).select("doc_id", "text").as[(Long, String)]
        .map { case (id, t) => (id, Dedup.fingerprint(t)) }
        .toDF("doc_id", "fingerprint")
    }),

    "q_ann_lsh_neardups" -> ((s, d) => {
      implicit val sp: SparkSession = s
      Ann.lshNearDupPairs(embeddings(s, d), threshold = 0.2, nPlanes = 8)
        .select(col("a"), col("b"), round(col("sim"), 6).as("sim"))
    }),

    // ---- image payload plumbing (rows-only; PSNR/caption gates in ScalaTest) ----
    "q_img_meta" -> ((s, d) => {
      implicit val sp: SparkSession = s
      import sp.implicits._
      // fixed synthetic-image count: a literal, NOT a count() over events —
      // a query builder must not run driver-side jobs just to size itself
      val n = ImageQueryRows
      HeatmapPipeline.images(n)
        .map { r =>
          val img = ImageSynth.decode(r.bytes)
          val p = ImageSynth.psnr(img, r.phash, r.w, r.h)
          (r.fmt, r.bytes.length.toLong, if (p >= 40.0) 1L else 0L,
            if (r.caption == ImageSynth.captionOf(r.image_id.stripPrefix("img").toLong)) 1L else 0L)
        }
        .toDF("fmt", "nbytes", "psnr_ok", "caption_ok")
        .groupBy(col("fmt"))
        .agg(count(lit(1)).as("n"), sum(col("nbytes")).as("total_bytes"),
          sum(col("psnr_ok")).as("psnr_ok"), sum(col("caption_ok")).as("caption_ok"))
    }),

    "q_img_thumbnails" -> ((s, d) => {
      implicit val sp: SparkSession = s
      graft.image.ImageOps.resize(HeatmapPipeline.images(200), 16, 16).toDF()
        .select(col("image_id"), col("w"), col("h"), length(col("png")).as("png_bytes"))
    }),

    "q_img_frames_stub" -> ((s, d) => {
      implicit val sp: SparkSession = s
      graft.image.ImageOps.frameSample(HeatmapPipeline.images(100).toDF()).toDF()
        .groupBy(col("media_id"))
        .agg(count(lit(1)).as("frames"), max(col("ts_ms")).as("last_ts_ms"))
    }),

    "q_img_features" -> ((s, d) => {
      implicit val sp: SparkSession = s
      import sp.implicits._
      val n = ImageQueryRows
      // batched decode + quadrant-mean feature extraction (the multimodal
      // feature-extract plumbing; per-partition batching like mapInPandas)
      HeatmapPipeline.images(n).mapPartitions { rows =>
        rows.map { r =>
          val img = ImageSynth.decode(r.bytes)
          def quadMean(x0: Int, y0: Int, x1: Int, y1: Int): Double = {
            var sum = 0L; var cnt = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val rgb = img.getRGB(x, y)
                sum += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
                cnt += 3; x += 1
              }
              y += 1
            }
            if (cnt == 0) 0.0 else sum.toDouble / cnt
          }
          (r.image_id, quadMean(0, 0, r.w / 2, r.h / 2), quadMean(r.w / 2, 0, r.w, r.h / 2),
            quadMean(0, r.h / 2, r.w / 2, r.h), quadMean(r.w / 2, r.h / 2, r.w, r.h))
        }
      }.toDF("image_id", "f00", "f01", "f10", "f11")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_geo_pip_join" ->
      """WITH pts AS (SELECT event_id AS pid,
                             3.0 + CAST(event_id % 2000 AS DOUBLE)/1000.0 AS lon,
                             50.0 + CAST(event_id*3 % 1500 AS DOUBLE)/1000.0 AS lat FROM events),
              regions(region_id, lft, bottom, rght, top) AS (VALUES
                (1, 3.2, 50.2, 3.8, 50.8), (2, 4.0, 50.5, 4.6, 51.1),
                (3, 3.5, 50.9, 4.9, 51.4), (4, 4.5, 50.1, 4.9, 50.45))
         SELECT CAST(region_id AS BIGINT) AS region_id, count(*) AS n
         FROM pts JOIN regions ON lon >= lft AND lon <= rght AND lat >= bottom AND lat <= top
         GROUP BY 1""",
    "q_geo_knn" ->
      """WITH pts AS (SELECT event_id AS pid,
                             3.0 + CAST(event_id % 2000 AS DOUBLE)/1000.0 AS lon,
                             50.0 + CAST(event_id*3 % 1500 AS DOUBLE)/1000.0 AS lat FROM events),
              qs(qid, qlon, qlat) AS (VALUES (1, 3.5, 50.5), (2, 4.2, 51.0),
                                             (3, 4.8, 50.2), (4, 3.1, 51.4))
         SELECT CAST(qid AS BIGINT) AS qid, CAST(rn AS INTEGER) AS rn, pid FROM (
           SELECT qid, pid, row_number() OVER (PARTITION BY qid
                    ORDER BY (lon-qlon)*(lon-qlon) + (lat-qlat)*(lat-qlat), pid) AS rn
           FROM pts CROSS JOIN qs) WHERE rn <= 5""",
    "q_geo_knn_exact" ->
      """WITH pts AS (SELECT event_id AS pid,
                             3.0 + CAST(event_id % 2000 AS DOUBLE)/1000.0 AS lon,
                             50.0 + CAST(event_id*3 % 1500 AS DOUBLE)/1000.0 AS lat FROM events),
              qs(qid, qlon, qlat) AS (VALUES (1, 3.5, 50.5), (2, 4.2, 51.0),
                                             (3, 4.8, 50.2), (4, 3.1, 51.4))
         SELECT CAST(qid AS BIGINT) AS qid, CAST(rn AS INTEGER) AS rn, pid FROM (
           SELECT qid, pid, row_number() OVER (PARTITION BY qid
                    ORDER BY (lon-qlon)*(lon-qlon) + (lat-qlat)*(lat-qlat), pid) AS rn
           FROM pts CROSS JOIN qs) WHERE rn <= 5""",
    "q_ann_cosine_all" ->
      """SELECT vec_id, round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6) AS sim
         FROM embeddings WHERE vec_id <> 0""",
    "q_ann_topk" ->
      """SELECT vec_id, round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6) AS sim
         FROM embeddings WHERE vec_id <> 0
         ORDER BY sim DESC, vec_id LIMIT 10""",
    "q_ann_ivf_topk" ->
      """SELECT vec_id, round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6) AS sim
         FROM embeddings WHERE vec_id <> 0
         ORDER BY sim DESC, vec_id LIMIT 10""",
    "q_hm_z14_layer" ->
      s"""SELECT CAST(14 AS INTEGER) AS z, pkey >> 32 AS gx, pkey & 4294967295 AS gy,
                 count(DISTINCT user_id) AS users, CAST(sum(trips) AS BIGINT) AS trips
          FROM read_parquet('$RasterDumpPath/*.parquet')
          GROUP BY pkey HAVING count(DISTINCT user_id) >= 3""",
    "q_hm_pyramid_stats" ->
      s"""WITH z14 AS (
            SELECT pkey >> 32 AS gx, pkey & 4294967295 AS gy,
                   count(DISTINCT user_id) AS users, CAST(sum(trips) AS BIGINT) AS trips
            FROM read_parquet('$RasterDumpPath/*.parquet')
            GROUP BY pkey HAVING count(DISTINCT user_id) >= 3),
          rolled AS (
            SELECT t.z AS z, gx >> (14 - t.z) AS rgx, gy >> (14 - t.z) AS rgy,
                   CAST(sum(users) AS BIGINT) AS users, CAST(sum(trips) AS BIGINT) AS trips
            FROM z14 CROSS JOIN (SELECT CAST(range AS INTEGER) AS z FROM range(0, 15)) t
            GROUP BY 1, 2, 3)
          SELECT z, count(*) AS pixels, CAST(sum(users) AS BIGINT) AS users,
                 CAST(sum(trips) AS BIGINT) AS trips
          FROM rolled GROUP BY z""",
    "q_geo_overlay" -> {
      val values = RegionCoverTiles
        .map { case (id, tx, ty) => s"($id, $tx, $ty)" }.mkString(", ")
      s"""WITH z14 AS (
            SELECT pkey >> 32 AS gx, pkey & 4294967295 AS gy,
                   CAST(sum(trips) AS BIGINT) AS trips
            FROM read_parquet('$RasterDumpPath/*.parquet')
            GROUP BY pkey HAVING count(DISTINCT user_id) >= 3),
          cells(region_id, tx, ty) AS (VALUES $values)
          SELECT CAST(region_id AS BIGINT) AS region_id, count(*) AS pixels,
                 CAST(sum(trips) AS BIGINT) AS trips
          FROM z14 JOIN cells ON (gx >> 9) = tx AND (gy >> 9) = ty
          GROUP BY 1"""
    }
  )
}
