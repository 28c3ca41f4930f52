package graft.tools
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.spark.Sessions.local(8, "entry-smoke")
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.entry(spark).count()
    println(f"[entry] rows=$n elapsed=${(System.nanoTime()-t0)/1e9}%.1fs")
    spark.stop()
  }
}
