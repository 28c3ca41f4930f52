package graft.spark

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/**
 * Bucket-size cap for LSH candidate self-joins (shared by
 * `Dedup.minhashNearDups` and `Ann.lshNearDupPairs`): every member of a
 * bucket larger than `maxBucket` is dropped from that bucket — the
 * self-join is quadratic in bucket size, so one degenerate bucket
 * (boilerplate corpus, identical-embedding cluster) would otherwise go
 * O(n²) at scale. Drops are observable via `capObs` (`dropped_rows`,
 * `dropped_buckets` — counted on the one-row-per-bucket sizes relation, so
 * the metrics are exact and never silent).
 */
object BucketCap {
  def cap(df: DataFrame, keyCols: Seq[String], maxBucket: Int,
          capObs: Option[Observation]): DataFrame = {
    val keys = keyCols.map(col)
    val sizes = df.groupBy(keys: _*).agg(count(lit(1)).as("bsz"))
    val sizesObs = capObs.fold(sizes)(o => sizes.observe(o,
      sum(when(col("bsz") > maxBucket, col("bsz")).otherwise(0L)).as("dropped_rows"),
      sum(when(col("bsz") > maxBucket, 1L).otherwise(0L)).as("dropped_buckets")))
    df.join(sizesObs, keyCols).where(col("bsz") <= maxBucket).drop("bsz")
  }
}
