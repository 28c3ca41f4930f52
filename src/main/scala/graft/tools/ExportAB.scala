package graft.tools

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.Schemas.MvtTile

/**
 * A/B the MVT file sink: plain foreachPartition over a SPATIALLY
 * partitioned tile stream (the store-read regime — range partitions carry
 * whole neighborhoods, so an urban core makes one straggler task) vs the
 * histogram-sized balanced range shuffle (`TileRanges.balanced`).
 *
 * Prints one JSON line: wall seconds per variant plus the per-task byte
 * spread (max/mean) that explains them. Usage:
 *   runMain graft.tools.ExportAB [nTiles] [parts] [outBase]
 */
object ExportAB {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 200000
    val parts = if (args.length > 1) args(1).toInt else 8
    val ownTemp = args.length <= 2
    val outBase = if (ownTemp) java.nio.file.Files.createTempDirectory("export-ab").toString
      else args(2)
    implicit val spark: SparkSession = graft.spark.Sessions.local(parts, "export-ab")
    import spark.implicits._

    // skewed world: a 32x32 urban core of fat tiles (64 KB) inside one
    // corner of the key space + a sparse sea of thin tiles (1 KB)
    val tiles: Dataset[MvtTile] = spark.range(n.toLong).map { i =>
      val hot = i < 1024
      val tx = if (hot) 8320L + i % 32 else (i * 2654435761L) % 16000
      val ty = if (hot) 5440L + (i / 32) % 32 else (i * 40503L) % 16000
      MvtTile(14, tx, ty, new Array[Byte](if (hot) 65536 else 1024))
    }
    // the store-read regime: spatially contiguous range partitions
    val spatial = tiles.repartitionByRange(parts, $"tx", $"ty").cache()
    spatial.count() // materialize outside the timed region

    def byteSpread(ds: Dataset[MvtTile]): (Long, Long) = {
      val w = ds.rdd.mapPartitions(it => Iterator.single(it.map(_.mvt.length.toLong).sum)).collect()
      (w.max, w.sum / math.max(w.length, 1))
    }
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // warm both paths once (JIT + FS caches), then measure min-of-3
    graft.mvt.MvtJobs.writeMvtFiles(spatial, s"$outBase/warm-plain")
    graft.mvt.MvtJobs.writeMvtFiles(spatial, s"$outBase/warm-bal", balanceParts = Some(parts))
    val plain = (1 to 3).map(r => timed(
      graft.mvt.MvtJobs.writeMvtFiles(spatial, s"$outBase/plain$r"))).min
    val bal = (1 to 3).map(r => timed(
      graft.mvt.MvtJobs.writeMvtFiles(spatial, s"$outBase/bal$r", balanceParts = Some(parts)))).min

    val (maxP, meanP) = byteSpread(spatial)
    val (maxB, meanB) = byteSpread(graft.mvt.TileRanges.balanced(spatial, parts))
    println(s"""{"tiles":$n,"parts":$parts,"plain_sec":${math.rint(plain * 100) / 100},""" +
      s""""balanced_sec":${math.rint(bal * 100) / 100},""" +
      s""""plain_bytes_max":$maxP,"plain_bytes_mean":$meanP,""" +
      s""""balanced_bytes_max":$maxB,"balanced_bytes_mean":$meanB}""")
    spark.stop()
    if (ownTemp) graft.stream.StreamDedup.deleteTree(outBase) // ~1.6M scratch files
  }
}
