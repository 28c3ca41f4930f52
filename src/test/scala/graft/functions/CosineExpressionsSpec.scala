package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ann.Ann

/** The codegen'd cosine_sim expression: bitwise equality with the
  * built-in higher-order-function form and native (non-UDF) plan shape. */
class CosineExpressionsSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = graft.spark.Sessions.local(4, "cosine-spec")

  private def vecs(n: Int, dim: Int): Seq[(Long, Array[Float])] = {
    val rnd = new java.util.Random(7)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
  }

  test("cosine_sim == aggregate/zip_with form bitwise; handles zero-norm and nulls") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val data = vecs(300, 24)
    val df = data.toDF("vec_id", "embedding")
    val q = data.head._2.map(_.toDouble)
    val qCol = typedLit(q)

    val native = df.select($"vec_id",
        CosineFunctions.cosineSim(s, $"embedding", qCol).as("sim"))
      .as[(Long, Double)].collect().toMap
    val builtin = df.select($"vec_id",
        Ann.cosineCol(transform($"embedding", _.cast("double")), qCol).as("sim"))
      .as[(Long, Double)].collect().toMap
    assert(native.size === 300)
    native.foreach { case (id, sim) =>
      assert(java.lang.Double.doubleToLongBits(sim) ===
        java.lang.Double.doubleToLongBits(builtin(id)), s"vec $id differs")
    }

    // zero-norm → -1.0 (the Ann.cosineKernel convention, never NaN)
    val zero = Seq((0L, Array.fill(24)(0.0f))).toDF("vec_id", "embedding")
      .select(CosineFunctions.cosineSim(s, $"embedding", qCol)).head().getDouble(0)
    assert(zero === -1.0)
    // null input → null out (null-safe expression)
    val nul = Seq((0L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding")
      .select(CosineFunctions.cosineSim(s, $"embedding", qCol)).head()
    assert(nul.isNullAt(0))
  }

  test("cosine_sim over array<double> vectors == cosineCol bitwise (simsearch path)") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val rnd = new java.util.Random(11)
    val data = (0 until 200).map(i => (i.toLong, Array.fill(16)(rnd.nextGaussian())))
    val df = data.toDF("vec_id", "embedding")
    val q = data.head._2
    val qCol = typedLit(q)
    val native = df.select($"vec_id",
        CosineFunctions.cosineSim(s, $"embedding", qCol).as("sim"))
      .as[(Long, Double)].collect().toMap
    val builtin = df.select($"vec_id", Ann.cosineCol($"embedding", qCol).as("sim"))
      .as[(Long, Double)].collect().toMap
    assert(native.size === 200)
    native.foreach { case (id, sim) =>
      assert(java.lang.Double.doubleToLongBits(sim) ===
        java.lang.Double.doubleToLongBits(builtin(id)), s"vec $id differs")
    }
  }

  test("cosine_sim is a native codegen expression, not a UDF") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val df = vecs(10, 8).toDF("vec_id", "embedding")
    val plan = df.select(CosineFunctions.cosineSim(s, $"embedding",
        typedLit(Array.fill(8)(0.5))))
      .queryExecution.executedPlan.toString
    assert(plan.contains("cosine_sim"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
    // analysis-time type contract
    val bad = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(CosineFunctions.cosineSim(s, $"vec_id", typedLit(Array(0.5)))).collect()
    }
    assert(bad.getMessage.toLowerCase.contains("cosine_sim"))
  }
}
