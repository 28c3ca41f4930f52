package graft.tools
import org.apache.spark.sql.SparkSession
object D3Probe {
  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = graft.spark.Sessions.local(32, "d3")
    (1 to 2).foreach { _ =>
      val t0 = System.nanoTime()
      val n = graft.queries.GraftQueries.queries("q_d3_minhash_pairs")(spark, "/root/testdata/sf0.1").count()
      println(f"[d3] pairs=$n sec=${(System.nanoTime()-t0)/1e9}%.1f")
    }
    spark.stop()
  }
}
