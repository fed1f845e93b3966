package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for dense-vector math over
  * `array<float>` / `array<double>` columns.
  *
  * These replace what the reference delegates to ChromaDB's HNSW engine
  * (kNN distance at `/root/reference/src/api.py:38-42`, L2 space per
  * `/root/reference/jobs/embedder.py:47-50`) with codegen'd columnar
  * compute that stays inside whole-stage codegen — no UDF
  * serialization boundary, no boxing per element. At 100 TB scale a
  * brute-force scan with these expressions is bandwidth-bound, which is
  * exactly what you want; the LSH variants in [[graft.vector.Knn]]
  * bound the candidate set further.
  *
  * All accumulation is in `double`, in element order, so results are
  * bit-identical to a straightforward scalar loop (and to the DuckDB
  * oracle's unnest-and-sum formulation).
  */
private[graft] trait VectorElementAccess { self: Expression =>
  protected def checkVec(dt: DataType, side: String): TypeCheckResult = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires $side to be array<float> or array<double>, got ${other.sql}")
  }

  /** Interpreted-mode element accessor (double-promoting). */
  protected def getterFor(dt: DataType): (ArrayData, Int) => Double = dt match {
    case ArrayType(FloatType, _)  => (a, i) => a.getFloat(i).toDouble
    case ArrayType(DoubleType, _) => (a, i) => a.getDouble(i)
    case other => throw new IllegalStateException(s"unexpected vector type $other")
  }

  /** Codegen element accessor (double-promoting). */
  protected def javaGetter(arr: String, dt: DataType, i: String): String = dt match {
    case ArrayType(FloatType, _)  => s"((double) $arr.getFloat($i))"
    case ArrayType(DoubleType, _) => s"$arr.getDouble($i)"
    case other => throw new IllegalStateException(s"unexpected vector type $other")
  }
}

private[graft] abstract class BinaryVectorExpression
    extends BinaryExpression with VectorElementAccess {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = checkVec(left.dataType, "left")
    if (l.isFailure) l else checkVec(right.dataType, "right")
  }

  /** Combine one aligned element pair into the accumulator state. */
  protected def combine(acc: Array[Double], l: Double, r: Double): Unit
  protected def finish(acc: Array[Double]): Double
  protected def accSize: Int
  /** Java statements combining elements `l`/`r` into accumulators `acc0..`. */
  protected def javaCombine(acc: Seq[String], l: String, r: String): String
  protected def javaFinish(acc: Seq[String]): String

  // Dimension mismatch is an ERROR, not a truncation: a malformed
  // embedding silently yielding a plausible-but-wrong distance is the
  // worst failure mode in a 100 TB similarity pipeline. Both interpreted
  // and codegen paths enforce it identically.
  override def nullSafeEval(leftVal: Any, rightVal: Any): Any = {
    val a = leftVal.asInstanceOf[ArrayData]
    val b = rightVal.asInstanceOf[ArrayData]
    val ga = getterFor(left.dataType)
    val gb = getterFor(right.dataType)
    val n = a.numElements()
    if (b.numElements() != n) {
      throw new IllegalArgumentException(
        s"$prettyName: vector dimension mismatch (${a.numElements()} vs ${b.numElements()})")
    }
    val acc = new Array[Double](accSize)
    var i = 0
    while (i < n) {
      combine(acc, ga(a, i), gb(b, i))
      i += 1
    }
    finish(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val accs = (0 until accSize).map(k => ctx.freshName(s"acc$k"))
      val decls = accs.map(v => s"double $v = 0.0;").mkString("\n")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: vector dimension mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |$decls
         |for (int $i = 0; $i < $n; $i++) {
         |  double l = ${javaGetter(a, left.dataType, i)};
         |  double r = ${javaGetter(b, right.dataType, i)};
         |  ${javaCombine(accs, "l", "r")}
         |}
         |${ev.value} = ${javaFinish(accs)};
       """.stripMargin
    })
}

/** Dot product: `sum(a_i * b_i)` as double. */
case class VectorDot(left: Expression, right: Expression) extends BinaryVectorExpression {
  override def prettyName: String = "vec_dot"
  override protected def accSize: Int = 1
  override protected def combine(acc: Array[Double], l: Double, r: Double): Unit =
    acc(0) += l * r
  override protected def finish(acc: Array[Double]): Double = acc(0)
  override protected def javaCombine(acc: Seq[String], l: String, r: String): String =
    s"${acc(0)} += $l * $r;"
  override protected def javaFinish(acc: Seq[String]): String = acc(0)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Euclidean (L2) distance — the reference's retrieval metric
  * (Chroma default space, `/root/reference/jobs/embedder.py:47-50`). */
case class VectorL2Distance(left: Expression, right: Expression) extends BinaryVectorExpression {
  override def prettyName: String = "vec_l2"
  override protected def accSize: Int = 1
  override protected def combine(acc: Array[Double], l: Double, r: Double): Unit = {
    val d = l - r; acc(0) += d * d
  }
  override protected def finish(acc: Array[Double]): Double = math.sqrt(acc(0))
  override protected def javaCombine(acc: Seq[String], l: String, r: String): String =
    s"double d = $l - $r; ${acc(0)} += d * d;"
  override protected def javaFinish(acc: Seq[String]): String =
    s"java.lang.Math.sqrt(${acc(0)})"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine similarity: `dot / (|a| * |b|)`; 0.0 when either norm is 0. */
case class VectorCosineSim(left: Expression, right: Expression) extends BinaryVectorExpression {
  override def prettyName: String = "vec_cosine_sim"
  override protected def accSize: Int = 3
  override protected def combine(acc: Array[Double], l: Double, r: Double): Unit = {
    acc(0) += l * r; acc(1) += l * l; acc(2) += r * r
  }
  override protected def finish(acc: Array[Double]): Double = {
    val denom = math.sqrt(acc(1)) * math.sqrt(acc(2))
    if (denom == 0.0) 0.0 else acc(0) / denom
  }
  override protected def javaCombine(acc: Seq[String], l: String, r: String): String =
    s"${acc(0)} += $l * $r; ${acc(1)} += $l * $l; ${acc(2)} += $r * $r;"
  override protected def javaFinish(acc: Seq[String]): String =
    s"""((java.lang.Math.sqrt(${acc(1)}) * java.lang.Math.sqrt(${acc(2)})) == 0.0 ?
       | 0.0 : ${acc(0)} / (java.lang.Math.sqrt(${acc(1)}) * java.lang.Math.sqrt(${acc(2)})))""".stripMargin
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** L2 norm of a single vector. */
case class VectorL2Norm(child: Expression)
    extends UnaryExpression with VectorElementAccess {
  override def prettyName: String = "vec_norm"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = checkVec(child.dataType, "input")

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val g = getterFor(child.dataType)
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val x = g(a, i); acc += x * x; i += 1 }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = ${javaGetter(a, child.dataType, i)};
         |  $acc += x * x;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
