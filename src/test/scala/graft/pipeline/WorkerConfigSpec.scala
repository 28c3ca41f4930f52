package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Config parsing is fail-fast: a malformed retention knob must kill the
  * service at startup, not silently disable GC (or worse, parse as 0 and
  * unlink everything). */
class WorkerConfigSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = graft.spark.Sessions.local(2, "worker-config-spec")

  private def withConf(kvs: (String, String)*)(f: => Unit): Unit = {
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally kvs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  test("defaults: no retention GC, no age floor") {
    val cfg = WorkerConfig.fromSpark(spark)
    assert(cfg.keepVersions.isEmpty)
    assert(cfg.gcMinAgeSeconds === 0L)
    assert(cfg.userThreshold === 3)
  }

  test("valid retention knobs parse") {
    withConf("spark.graft.keepVersions" -> "4", "spark.graft.gcMinAgeSeconds" -> "600") {
      val cfg = WorkerConfig.fromSpark(spark)
      assert(cfg.keepVersions === Some(4))
      assert(cfg.gcMinAgeSeconds === 600L)
    }
  }

  test("malformed or out-of-range knobs fail loudly at startup") {
    withConf("spark.graft.keepVersions" -> "zero") {
      val e = intercept[IllegalArgumentException](WorkerConfig.fromSpark(spark))
      assert(e.getMessage.contains("keepVersions"))
    }
    withConf("spark.graft.keepVersions" -> "0") {
      intercept[IllegalArgumentException](WorkerConfig.fromSpark(spark))
    }
    withConf("spark.graft.gcMinAgeSeconds" -> "soon") {
      val e = intercept[IllegalArgumentException](WorkerConfig.fromSpark(spark))
      assert(e.getMessage.contains("gcMinAgeSeconds"))
    }
    withConf("spark.graft.gcMinAgeSeconds" -> "-5") {
      intercept[IllegalArgumentException](WorkerConfig.fromSpark(spark))
    }
  }
}
