package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `size(array_intersect(sa, sb))` for two shingle sets, computed as a
  * HASH-GUIDED linear merge over pre-sorted parallel arrays — exact,
  * with almost no per-element string materialization.
  *
  * Inputs: `(ha, sa)` and `(hb, sb)` where `sa`/`sb` are each doc's
  * distinct shingle strings and `ha`/`hb` the matching xxhash64
  * hashes, BOTH sorted by `(hash, string)` — the
  * [[graft.dedup.Dedup.withHashedShingleArray]] creation invariant.
  *
  * Why: the dedup verify evaluates one overlap per candidate PAIR, and
  * the measured cost there is neither hashing nor comparison but
  * per-element STRING ACCESS — `array_intersect` materializes a
  * UTF8String for every element of both arrays on every evaluation
  * (DedupProbe r18: agg over `size(a)+size(b)` 0.25 s, agg over
  * `array_intersect` 1.2 s, agg over a string-only sorted merge 1.1 s —
  * all the same 74k d04 pairs, so ~0.9 s is pure element access). This
  * merge walks the LONG arrays (allocation-free `getLong`) and touches
  * strings only to confirm hash-equal elements — O(shared + collisions)
  * string reads instead of O(n_a + n_b).
  *
  * Exactness is unconditional: equal hashes are CONFIRMED by a string
  * compare, unequal hashes imply unequal strings (a hash is a function
  * of its string). Duplicate runs count once — `(hash, string)` is a
  * total order, so equal runs are contiguous and skipped on both sides
  * — matching `array_intersect` even on non-distinct input. Null
  * ARRAYS yield null; a null hash ENTRY terminates the merge (the
  * creation point never produces one — every shingle is a non-null
  * concat, so the sorted struct array is null-free end to end).
  */
case class HashedOverlapCount(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  override def prettyName: String = "hashed_overlap_count"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  private def check(dt: DataType, want: DataType, side: String): TypeCheckResult =
    dt match {
      case ArrayType(t, _) if t == want => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires $side to be array<${want.simpleString}>, got ${other.sql}")
    }

  override def checkInputDataTypes(): TypeCheckResult =
    Seq(
      check(first.dataType, LongType, "hashes A"),
      check(second.dataType, StringType, "strings A"),
      check(third.dataType, LongType, "hashes B"),
      check(fourth.dataType, StringType, "strings B"))
      .find(_.isFailure).getOrElse(TypeCheckResult.TypeCheckSuccess)

  override def nullSafeEval(haV: Any, saV: Any, hbV: Any, sbV: Any): Any = {
    val ha = haV.asInstanceOf[ArrayData]
    val sa = saV.asInstanceOf[ArrayData]
    val hb = hbV.asInstanceOf[ArrayData]
    val sb = sbV.asInstanceOf[ArrayData]
    val na = ha.numElements()
    val nb = hb.numElements()
    require(sa.numElements() == na && sb.numElements() == nb,
      s"$prettyName: hash/string arrays misaligned " +
        s"(${sa.numElements()}/$na vs ${sb.numElements()}/$nb)")
    var i = 0
    var j = 0
    var cnt = 0L
    while (i < na && j < nb && !ha.isNullAt(i) && !hb.isNullAt(j)) {
      val hx = ha.getLong(i)
      val hy = hb.getLong(j)
      if (hx < hy) i += 1
      else if (hx > hy) j += 1
      else {
        val x = sa.getUTF8String(i)
        val c = x.compareTo(sb.getUTF8String(j))
        if (c < 0) i += 1
        else if (c > 0) j += 1
        else {
          cnt += 1L
          i += 1; j += 1
          while (i < na && !ha.isNullAt(i) && ha.getLong(i) == hx &&
            sa.getUTF8String(i).compareTo(x) == 0) i += 1
          while (j < nb && !hb.isNullAt(j) && hb.getLong(j) == hx &&
            sb.getUTF8String(j).compareTo(x) == 0) j += 1
        }
      }
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ha, sa, hb, sb) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt")
      val hx = ctx.freshName("hx")
      val hy = ctx.freshName("hy")
      val x = ctx.freshName("x")
      val c = ctx.freshName("c")
      s"""
         |int $na = $ha.numElements();
         |int $nb = $hb.numElements();
         |if ($sa.numElements() != $na || $sb.numElements() != $nb) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: hash/string arrays misaligned");
         |}
         |int $i = 0; int $j = 0; long $cnt = 0L;
         |while ($i < $na && $j < $nb && !$ha.isNullAt($i) && !$hb.isNullAt($j)) {
         |  long $hx = $ha.getLong($i);
         |  long $hy = $hb.getLong($j);
         |  if ($hx < $hy) { $i++; }
         |  else if ($hx > $hy) { $j++; }
         |  else {
         |    org.apache.spark.unsafe.types.UTF8String $x = $sa.getUTF8String($i);
         |    int $c = $x.compareTo($sb.getUTF8String($j));
         |    if ($c < 0) { $i++; }
         |    else if ($c > 0) { $j++; }
         |    else {
         |      $cnt++; $i++; $j++;
         |      while ($i < $na && !$ha.isNullAt($i) && $ha.getLong($i) == $hx &&
         |          $sa.getUTF8String($i).compareTo($x) == 0) { $i++; }
         |      while ($j < $nb && !$hb.isNullAt($j) && $hb.getLong($j) == $hx &&
         |          $sb.getUTF8String($j).compareTo($x) == 0) { $j++; }
         |    }
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression): Expression =
    copy(first = a, second = b, third = c, fourth = d)
}
