package graft.spark

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.expressions.Window
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
 *
 * Plan shape (r7): the unobserved path computes the bucket size with ONE
 * window pass (`count(*) OVER (PARTITION BY keys)`) instead of the old
 * aggregate + join-back — the input subtree is evaluated once instead of
 * twice, one exchange disappears, and the output comes back HASH-PARTITIONED
 * on the bucket keys, which is exactly the distribution the candidate
 * self-join right behind every call needs (its exchanges vanish too). The
 * observed path keeps the aggregate + join-back: the metrics contract
 * counts drops on the one-row-per-bucket sizes relation, which only exists
 * in that shape. Both paths return identical rows (CapSpec-equivalence is
 * definitional: same per-bucket count, same filter).
 */
object BucketCap {
  def cap(df: DataFrame, keyCols: Seq[String], maxBucket: Int,
          capObs: Option[Observation]): DataFrame = {
    val keys = keyCols.map(col)
    capObs match {
      case Some(o) =>
        val sizes = df.groupBy(keys: _*).agg(count(lit(1)).as("bsz"))
        val sizesObs = sizes.observe(o,
          sum(when(col("bsz") > maxBucket, col("bsz")).otherwise(0L)).as("dropped_rows"),
          sum(when(col("bsz") > maxBucket, 1L).otherwise(0L)).as("dropped_buckets"))
        df.join(sizesObs, keyCols).where(col("bsz") <= maxBucket).drop("bsz")
      case None =>
        df.withColumn("bsz", count(lit(1)).over(Window.partitionBy(keys: _*)))
          .where(col("bsz") <= maxBucket).drop("bsz")
    }
  }
}
