package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

/** s13 (prefiltered IVF ANN) invariants — the contracts q116's
  * rows-only scale tier rides on:
  *   1. every result satisfies the predicate (prefiltering is exact on
  *      membership — only the RANKING is approximate);
  *   2. recall vs the exact filtered top-k meets the fixture floor at
  *      the shipped nProbe;
  *   3. exact degeneration: probing ALL lists equals the exact
  *      filtered top-k — the approximation comes only from routing;
  *   4. the post-filter anti-pattern is demonstrably worse: filtering
  *      an UNfiltered top-k after the fact returns fewer than k rows
  *      exactly when the filter is selective — the failure mode the
  *      prefilter design exists to avoid.
  */
class FilteredAnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val emb = Tables.embeddings(spark, TestSpark.sf)
  private val lists = 16
  private val k = 10

  private def pred(df: DataFrame): DataFrame =
    df.filter(col("label").isin(2, 3) && col("vec_id") % 5 =!= 0)

  private lazy val cents = Ivf.centroids(emb, "vec_id", "embedding", lists)
  private lazy val assigned = Ivf.assign(emb, "vec_id", "embedding", cents)
  private lazy val probeDf = emb.orderBy("vec_id").limit(1).select(col("embedding"))

  private lazy val exactFiltered: Seq[Long] = {
    val probe = emb.orderBy("vec_id").select("embedding").head()
      .getSeq[Float](0).map(_.toDouble)
    Knn.exactTopK(pred(emb), "embedding", "vec_id", probe, k)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
  }

  test("s13: all results satisfy the predicate; recall meets the floor") {
    val rows = Ivf.search(pred(emb), assigned, cents, "vec_id", "embedding",
      probeDf, "embedding", k, nProbe = 4)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(rows.size == k, s"prefilter must fill top-$k; got ${rows.size}")
    val labels = emb.filter(col("vec_id").isin(rows: _*))
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { id =>
      assert(Set(2, 3).contains(labels(id)) && id % 5 != 0,
        s"vec $id violates the predicate")
    }
    val recall = (exactFiltered.toSet intersect rows.toSet).size.toDouble / k
    info(s"prefiltered IVF recall@$k nProbe=4/$lists: $recall")
    assert(recall >= 0.3, s"recall = $recall")
  }

  test("s13: probing every list degenerates to the exact filtered top-k") {
    val all = Ivf.search(pred(emb), assigned, cents, "vec_id", "embedding",
      probeDf, "embedding", k, nProbe = lists)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(all == exactFiltered,
      s"nProbe=all must equal exact; got $all vs $exactFiltered")
  }

  test("post-filtering an unfiltered top-k under-fills — the documented anti-pattern") {
    val post = Ivf.search(emb, assigned, cents, "vec_id", "embedding",
        probeDf, "embedding", k, nProbe = 4)
      .join(pred(emb).select("vec_id"), "vec_id")
    assert(post.count() < k,
      "fixture filter is selective enough that post-filter loses results; " +
        "if this starts holding k rows the fixture predicate needs tightening")
  }
}
