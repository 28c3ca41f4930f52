package graft.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Backward AS-OF join — each left row is matched with the single LATEST
 * right row having the same key and `rightTs <= leftTs` (ties on ts broken
 * by the largest right id, so the pick is total and oracle-reproducible);
 * left rows with no earlier right row keep NULL payload (left-outer
 * semantics). The classic market-data / sensor-alignment join Spark lacks
 * as a built-in.
 *
 * Spark-first shape: NOT a join at all. Both sides are tagged and UNIONED,
 * then ONE window partitioned by key and ordered by (ts, side, rightId)
 * carries the last non-null right payload forward; left rows then project
 * it out. Cost is a single hash exchange on the key + one sort — no
 * broadcast requirement, no row-multiplying range join, no per-row probe —
 * so it scales to any right-side size (the composition rung of the
 * custom-operator ladder: built-ins express the semantics exactly, so no
 * custom exec is warranted). Right rows sort BEFORE left rows at equal ts,
 * making the match inclusive, matching `r.ts <= l.ts`.
 *
 * `left` needs (key, ts) plus its own columns; `right` needs (key, ts,
 * rightId) plus the payload columns. Output: every `left` column, then the
 * matched `rightId` and payload columns (NULL when unmatched).
 */
object AsofJoin {

  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
           rightId: String, payload: Seq[String]): DataFrame = {
    // the tie-break contract needs a total integral order on rightId — a
    // lossy cast would NULL it silently and make equal-ts picks arbitrary
    right.schema(rightId).dataType match {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType =>
      case other => throw new IllegalArgumentException(
        s"asof rightId '$rightId' must be an integral column (tie-break order), got $other")
    }
    val leftCols = left.columns.toSeq
    val pickCols = rightId +: payload
    val pSchema = right.select(pickCols.map(col): _*).schema
    val l = left.select(
      col(key).as("__k"), col(ts).as("__ts"), lit(1).as("__side"),
      lit(null).cast("long").as("__rid"),
      struct(leftCols.map(col): _*).as("__l"),
      lit(null).cast(pSchema).as("__p"))
    // join semantics: a NULL key or NULL ts on the right matches NOTHING
    // (the window would otherwise group NULL keys together and nulls-first
    // ordering would let a NULL-ts right row match everything); NULL-key/ts
    // LEFT rows stay, with NULL payload, by the same exclusion
    val r = right.where(col(key).isNotNull && col(ts).isNotNull).select(
      col(key).as("__k"), col(ts).as("__ts"), lit(0).as("__side"),
      col(rightId).cast("long").as("__rid"),
      lit(null).cast(left.schema).as("__l"),
      struct(pickCols.map(col): _*).as("__p"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"), col("__rid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__pick", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__l").isNotNull)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        pickCols.map(c => col(s"__pick.$c").as(c)): _*)
  }
}
