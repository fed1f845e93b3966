package graft.functions

import org.apache.spark.SparkException
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Vector expressions: codegen (DataFrame path) vs interpreted
  * (direct eval) agreement, reference-value checks, symmetry, and the
  * dimension-mismatch error contract. */
class VectorExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val rnd = new scala.util.Random(7)
  private def vec(n: Int): Array[Double] = Array.fill(n)(rnd.nextDouble() * 2 - 1)

  private def refDot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum
  private def refL2(a: Array[Double], b: Array[Double]): Double =
    math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)

  private def lit(a: Array[Double]) =
    Literal.create(a.toSeq, ArrayType(DoubleType))

  test("interpreted eval matches a scalar reference loop") {
    for (_ <- 1 to 50) {
      val n = 1 + rnd.nextInt(16)
      val a = vec(n); val b = vec(n)
      val dot = VectorDot(lit(a), lit(b)).eval(null).asInstanceOf[Double]
      val l2 = VectorL2Distance(lit(a), lit(b)).eval(null).asInstanceOf[Double]
      val cos = VectorCosineSim(lit(a), lit(b)).eval(null).asInstanceOf[Double]
      val nrm = VectorL2Norm(lit(a)).eval(null).asInstanceOf[Double]
      assert(math.abs(dot - refDot(a, b)) < 1e-12)
      assert(math.abs(l2 - refL2(a, b)) < 1e-12)
      val refCos = refDot(a, b) / (math.sqrt(refDot(a, a)) * math.sqrt(refDot(b, b)))
      assert(math.abs(cos - refCos) < 1e-12)
      assert(math.abs(nrm - math.sqrt(refDot(a, a))) < 1e-12)
    }
  }

  test("codegen (DataFrame) path agrees with interpreted eval bit-for-bit") {
    val rows = (1 to 40).map { _ => val n = 8; (vec(n).toSeq, vec(n).toSeq) }
    import spark.implicits._
    val df = rows.toDF("a", "b")
      .select(vec_dot(col("a"), col("b")).as("dot"),
        vec_l2(col("a"), col("b")).as("l2"),
        vec_cosine_sim(col("a"), col("b")).as("cos"),
        vec_norm(col("a")).as("nrm"))
    val got = df.collect()
    rows.zip(got).foreach { case ((a, b), r) =>
      val aa = a.toArray; val bb = b.toArray
      // bit-identical: same double accumulation order on both paths
      assert(r.getDouble(0) == VectorDot(lit(aa), lit(bb)).eval(null))
      assert(r.getDouble(1) == VectorL2Distance(lit(aa), lit(bb)).eval(null))
      assert(r.getDouble(2) == VectorCosineSim(lit(aa), lit(bb)).eval(null))
      assert(r.getDouble(3) == VectorL2Norm(lit(aa)).eval(null))
    }
  }

  test("symmetry: dot/l2/cosine are commutative") {
    for (_ <- 1 to 20) {
      val a = vec(12); val b = vec(12)
      assert(VectorDot(lit(a), lit(b)).eval(null) == VectorDot(lit(b), lit(a)).eval(null))
      assert(VectorL2Distance(lit(a), lit(b)).eval(null) ==
        VectorL2Distance(lit(b), lit(a)).eval(null))
      assert(VectorCosineSim(lit(a), lit(b)).eval(null) ==
        VectorCosineSim(lit(b), lit(a)).eval(null))
    }
  }

  test("cosine of zero vector is 0.0, cosine bounded in [-1, 1]") {
    val z = Array(0.0, 0.0, 0.0)
    assert(VectorCosineSim(lit(z), lit(vec(3))).eval(null) == 0.0)
    for (_ <- 1 to 50) {
      val c = VectorCosineSim(lit(vec(6)), lit(vec(6))).eval(null).asInstanceOf[Double]
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
  }

  test("dimension mismatch throws (interpreted and codegen paths)") {
    intercept[IllegalArgumentException] {
      VectorDot(lit(vec(4)), lit(vec(5))).eval(null)
    }
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(vec_dot(col("a"), col("b"))).collect()
    }
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: rootMessages(x.getCause))
    assert(rootMessages(e).exists(m => m != null && m.contains("dimension mismatch")))
  }

  test("null input yields null, not a crash") {
    import spark.implicits._
    val df = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    val r = df.select(vec_dot(col("a"), col("b"))).collect()
    assert(r.head.isNullAt(0))
  }
}
