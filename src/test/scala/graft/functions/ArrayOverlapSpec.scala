package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** HashedOverlapCount == size(array_intersect) over the
  * (hash, string)-sorted parallel-array layout — randomized
  * (duplicates, empties, skewed sizes, FORCED hash collisions), the
  * codegen DataFrame path vs Spark's own intersect, plus null-array
  * behavior and the misalignment refusal. The dedup verify path
  * (Dedup.jaccardVerifyArrays over withHashedShingleArray frames)
  * rides this law. */
class ArrayOverlapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** The creation layout: structs (h, s) sorted, then split — hashes
    * here are a DELIBERATELY colliding map (mod 7) so equal hashes
    * with different strings are exercised, which real md5-60 never
    * produces; exactness must not depend on hash injectivity. */
  private def layout(xs: org.apache.spark.sql.Column) = {
    val st = array_sort(transform(xs,
      s => struct((crc32(s) % 7).as("h"), s.as("s"))))
    (transform(st, x => x.getField("h")), transform(st, x => x.getField("s")))
  }

  test("matches size(array_intersect) on random arrays incl. forced hash collisions") {
    val rnd = new scala.util.Random(42)
    def arr(): Seq[String] =
      Seq.fill(rnd.nextInt(30))(s"sh_${rnd.nextInt(40)}")
    val rows = (1 to 300).map(i => (i, arr(), arr())) :+
      ((301, Seq.empty[String], Seq("a"))) :+
      ((302, Seq.empty[String], Seq.empty[String])) :+
      ((303, Seq("a", "a", "b"), Seq("a", "b", "b", "c")))
    import spark.implicits._
    val df = rows.toDF("i", "xa", "xb")
    val (ha, sa) = layout(col("xa"))
    val (hb, sb) = layout(col("xb"))
    val out = df.select(col("i"),
        hashed_overlap_count(ha, sa, hb, sb).as("merge"),
        size(array_intersect(col("xa"), col("xb"))).cast("long").as("ref"))
    val bad = out.filter(col("merge") =!= col("ref")).collect()
    assert(bad.isEmpty, s"mismatches: ${bad.take(5).mkString(", ")}")
  }

  test("interpreted eval agrees with the reference on duplicate runs and collisions") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    def hlit(xs: Seq[Long]) =
      Literal(new GenericArrayData(xs.toArray), ArrayType(LongType))
    def slit(xs: Seq[String]) = Literal(
      new GenericArrayData(xs.map(UTF8String.fromString).toArray),
      ArrayType(StringType))
    def run(ha: Seq[Long], sa: Seq[String], hb: Seq[Long], sb: Seq[String]) =
      HashedOverlapCount(hlit(ha), slit(sa), hlit(hb), slit(sb)).eval(null)
    // plain overlap
    assert(run(Seq(1, 2, 3), Seq("a", "b", "c"),
      Seq(2, 3, 4), Seq("b", "c", "d")) === 2L)
    // colliding hashes, different strings (sorted by (h, s)): no match
    assert(run(Seq(5, 5), Seq("p", "q"), Seq(5), Seq("r")) === 0L)
    // colliding hashes, one true match inside the run
    assert(run(Seq(5, 5), Seq("p", "q"), Seq(5, 5), Seq("q", "r")) === 1L)
    // duplicate runs count once (array_intersect semantics)
    assert(run(Seq(1, 1, 2), Seq("a", "a", "b"), Seq(1, 1), Seq("a", "a")) === 1L)
    assert(run(Seq.empty, Seq.empty, Seq(1), Seq("a")) === 0L)
    // misaligned hash/string arrays refuse loudly
    intercept[IllegalArgumentException] {
      run(Seq(1, 2), Seq("a"), Seq(1), Seq("a"))
    }
  }

  test("null array yields null") {
    import spark.implicits._
    val df = Seq((Some(Seq(1L)), Some(Seq("a")), Option.empty[Seq[Long]],
        Option.empty[Seq[String]]))
      .toDF("ha", "sa", "hb", "sb")
      .select(hashed_overlap_count(col("ha"), col("sa"), col("hb"), col("sb")).as("o"))
    assert(df.collect().head.isNullAt(0))
  }

  test("the creation point (withHashedShingleArray) feeds the merge exactly") {
    import spark.implicits._
    import graft.dedup.Dedup
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e g"), (3L, "x y z w v u"),
      (4L, ""), (5L, "a b")) // 5: too short for 3-grams -> empty array
      .toDF("doc_id", "text")
    val sh = Dedup.withHashedShingleArray(
      docs.select(col("doc_id").as("id"), col("text")), "text", 3, "shs", "hs")
    // parallel arrays aligned and (h, s)-sorted
    val mis = sh.filter(size(col("shs")) =!= size(col("hs"))).count()
    assert(mis === 0)
    val a = sh.as("A"); val b = sh.as("B")
    val both = a.crossJoin(b).select(
      hashed_overlap_count(col("A.hs"), col("A.shs"), col("B.hs"), col("B.shs")).as("m"),
      size(array_intersect(col("A.shs"), col("B.shs"))).cast("long").as("r"))
    assert(both.filter(col("m") =!= col("r")).count() === 0)
  }
}
