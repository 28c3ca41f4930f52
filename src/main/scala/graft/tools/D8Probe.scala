package graft.tools
import org.apache.spark.sql.SparkSession

/** Ad-hoc timing for the persisted-LSH probe query (q_d8): run 1 includes
  * the one-time index build, run 2+ is the steady probe cost. */
object D8Probe {
  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = graft.spark.Sessions.local(32, "d8")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    (1 to 3).foreach { _ =>
      val t0 = System.nanoTime()
      val n = graft.queries.GraftQueries.queries("q_d8_lsh_probe")(spark, sfDir).count()
      println(f"[d8] pairs=$n sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    spark.stop()
  }
}
