package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Mutable two-slot buffer for [[Min2ByAgg]]: the two smallest
  * (ord, value) pairs seen so far under lexicographic (ord, value)
  * order — `n` counts the filled slots. */
final class Min2State(
    var d1: Double, var c1: Long,
    var d2: Double, var c2: Long,
    var n: Int) {
  // java.lang.Double.compare, not raw < / == : a NaN distance must
  // sort GREATEST (Spark's own double ordering, what min_by sees) —
  // raw < would let a first-arriving NaN squat in slot 1 forever,
  // making the kept pair depend on partition/merge order
  @inline private def lt(d: Double, c: Long, od: Double, oc: Long): Boolean = {
    val cmp = java.lang.Double.compare(d, od)
    cmp < 0 || (cmp == 0 && c < oc)
  }
  def add(d: Double, c: Long): Unit = {
    if (n == 0) { d1 = d; c1 = c; n = 1 }
    else if (lt(d, c, d1, c1)) {
      d2 = d1; c2 = c1; d1 = d; c1 = c; n = math.min(2, n + 1)
    } else if (n == 1 || lt(d, c, d2, c2)) {
      d2 = d; c2 = c; n = 2
    }
  }
}

/** The two smallest (ord, value) pairs per group — `min_by` widened to
  * keep a runner-up. One pass, O(1) buffer, mergeable partials (the
  * map-side combine is what keeps an n x k broadcast-cross input from
  * ever shuffling more than 2 rows per group), and DETERMINISTIC: ties
  * break lexicographically on (ord, value), no accumulation order in
  * sight.
  *
  * Built for IVF multi-assignment (the FAISS/ScaNN "spilling" recipe:
  * a vector near a list boundary joins its second-nearest list too),
  * where the build needs argmin AND the runner-up centroid in the same
  * single-pass plan shape [[graft.vector.Ivf.assign]] already uses —
  * two separate min_by passes cannot see each other, and a
  * sort-within-group (collect_list / window) materializes the whole
  * k-wide group per id, the exploded-intermediate shape the r15 PQ
  * build OOM taught us to avoid.
  *
  * Output: struct(c1, d1, c2, d2) — c2/d2 NULL when the group held one
  * row; NULL when every row's value was null. Like [[KmvAgg]] this is
  * a build-time aggregate, not a serve hot path, so
  * TypedImperativeAggregate (no codegen) is the right trade.
  *
  * CONTRACT DIVERGENCE from plain `min_by`: a NULL ord with a real
  * value sorts FIRST (it maps to the -Inf sentinel) — the semantics
  * of `min(struct(ord, value))`'s nulls-first ordering, which is what
  * [[graft.vector.Ivf.assign]]'s `min_by(cid, struct(dist, cid))`
  * actually evaluates — whereas SQL `min_by(value, ord)` SKIPS
  * null-ord rows entirely. Callers with genuinely-null ords (or
  * genuine -Inf ord values, which collide with the sentinel) should
  * not swap one for the other.
  */
case class Min2ByAgg(
    ord: Expression,
    value: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Min2State] {

  override def children: Seq[Expression] = Seq(ord, value)
  // a group whose every ord/value was null (e.g. a NULL embedding's
  // distances) evaluates to NULL — parity with what min_by returns
  // there, never an executor-side crash
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("c1", LongType, nullable = false),
    StructField("d1", DoubleType, nullable = false),
    StructField("c2", LongType, nullable = true),
    StructField("d2", DoubleType, nullable = true)))

  override def createAggregationBuffer(): Min2State =
    new Min2State(0d, 0L, 0d, 0L, 0)

  override def update(buf: Min2State, input: InternalRow): Min2State = {
    val d = ord.eval(input)
    val c = value.eval(input)
    // a NULL ord with a real value sorts FIRST — exactly min_by's
    // struct(ord, value) ascending ordering (nulls first), so an
    // all-null-distance group (a NULL embedding's cross rows) keeps
    // the smallest value, bit-identical to the plain assign path
    // (IvfSpec pins the parity)
    if (c != null)
      buf.add(
        if (d == null) Double.NegativeInfinity
        else d.asInstanceOf[Number].doubleValue,
        c.asInstanceOf[Number].longValue)
    buf
  }

  override def merge(a: Min2State, b: Min2State): Min2State = {
    if (b.n >= 1) a.add(b.d1, b.c1)
    if (b.n == 2) a.add(b.d2, b.c2)
    a
  }

  override def eval(buf: Min2State): Any = {
    if (buf.n == 0) return null
    val row = new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(4)
    row.update(0, buf.c1)
    row.update(1, buf.d1)
    if (buf.n == 2) { row.update(2, buf.c2); row.update(3, buf.d2) }
    else { row.update(2, null); row.update(3, null) }
    row
  }

  override def serialize(buf: Min2State): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.n)
    out.writeDouble(buf.d1); out.writeLong(buf.c1)
    out.writeDouble(buf.d2); out.writeLong(buf.c2)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Min2State = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    new Min2State(in.readDouble(), in.readLong(),
      in.readDouble(), in.readLong(), n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): Min2ByAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): Min2ByAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(ord = newChildren(0), value = newChildren(1))
  override def prettyName: String = "min2_by"
}

object Min2ByAgg {
  /** Column form: `min2_by(ord, value)` — aggregate returning
    * struct(c1, d1, c2, d2), the two smallest (ord, value) pairs by
    * lexicographic (ord, value); c2/d2 null for 1-row groups. */
  def min2_by(ord: Column, value: Column): Column =
    GraftShims.column(
      Min2ByAgg(GraftShims.expression(ord), GraftShims.expression(value))
        .toAggregateExpression())
}
