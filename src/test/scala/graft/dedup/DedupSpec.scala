package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exact dedup: idempotent and keeps the minimum id per text") {
    val docs = Seq((3L, "x y z"), (1L, "x y z"), (2L, "a b c")).toDF("doc_id", "text")
    val once = Dedup.exact(docs, "doc_id", "text")
    val rows = once.orderBy("keep_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((1L, 2L), (2L, 1L)))
    // running dedup over the survivors changes nothing
    val survivors = docs.join(once.select(col("keep_id").as("doc_id")), "doc_id")
    assert(Dedup.exact(survivors, "doc_id", "text").count() == 2)
  }

  test("minhash signatures: identical texts share all signatures; bands agree") {
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "q r s t u v"))
      .toDF("doc_id", "text")
    val sh = Dedup.shingleSet(docs, "doc_id", "text")
    val sigs = Dedup.minHashSignatures(sh).collect()
      .map(r => r.getLong(0) -> (1 to 12).map(i => r.getLong(i)).toSeq).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
    val cands = Dedup.lshCandidates(Dedup.bandSignatures(Dedup.minHashSignatures(sh)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands == Set((1L, 2L)))
  }

  test("incremental LSH: frozen base pairs + increment-touching pairs == full recompute") {
    // cross-boundary dups on purpose: (1,2) old-old, (2,11) old-new,
    // (11,12) new-new, 3/13 unrelated
    val all = Seq(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g x"), (3L, "p q r s t u v w"),
      (11L, "a b c d e f g y"), (12L, "a b c d e f g z"), (13L, "k l m n o p q r"))
      .toDF("doc_id", "text")
    val base = all.filter(col("doc_id") < 10)
    val inc = all.filter(col("doc_id") >= 10)
    val t = 0.4
    val basePairs = Dedup.minHashNearDups(base, "doc_id", "text", t)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val docshB = Dedup.shingleArrays(base, "doc_id", "text")
    val docshI = Dedup.shingleArrays(inc, "doc_id", "text")
    val bandsB = Dedup.bandSignaturesOf(docshB)
    val bandsI = Dedup.bandSignaturesOf(docshI)
    // the increment signs ONLY its own docs
    assert(bandsI.select("id").distinct().collect().map(_.getLong(0)).toSet == Set(11L, 12L, 13L))
    val newPairs = Dedup.jaccardVerifyArrays(
        Dedup.lshCandidatesIncremental(bandsI, bandsB.unionByName(bandsI)),
        docshB.unionByName(docshI))
      .filter(col("jaccard") >= t)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every new pair touches >= 1 increment doc; none is old-old
    assert(newPairs.forall { case (a, b) => a >= 10 || b >= 10 })
    val full = Dedup.minHashNearDups(all, "doc_id", "text", t)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((basePairs union newPairs) == full,
      s"base=$basePairs new=$newPairs full=$full")
    // the fixture exercises all three pair classes
    assert(basePairs.nonEmpty && newPairs.exists(p => p._1 < 10 && p._2 >= 10) &&
      newPairs.exists(p => p._1 >= 10 && p._2 >= 10))
  }

  test("prefix-filtered exact Jaccard is LOSSLESS vs the naive all-pairs join") {
    // The prefix-filter principle guarantees identical results; this
    // compares against an independently-computed naive formulation on
    // the real fixture.
    val docs = Tables.documents(spark, TestSpark.sf)
    val fast = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "lang", threshold = 0.3)
      .select("da", "db", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // naive: full shingle self-join within lang
    val sh = Dedup.withShingleArray(
      docs.select(col("doc_id").as("id"), col("lang").as("blk"), col("text")),
      "text", 3, "shs")
      .select(col("id"), col("blk"), explode(col("shs")).as("sh"))
    val inter = sh.select(col("blk"), col("id").as("da"), col("sh"))
      .join(sh.select(col("blk"), col("id").as("db"), col("sh")), Seq("blk", "sh"))
      .filter(col("da") < col("db"))
      .groupBy("da", "db").agg(count(lit(1)).as("ix"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val naive = inter
      .join(sizes.select(col("id").as("da"), col("n").as("na")), "da")
      .join(sizes.select(col("id").as("db"), col("n").as("nb")), "db")
      .select(col("da"), col("db"),
        (col("ix").cast("double") / (col("na") + col("nb") - col("ix"))).as("jaccard"))
      .filter(col("jaccard") >= 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fast == naive)
  }

  test("degenerate inputs: short/empty docs produce no shingles, pairs, or crashes") {
    val docs = Seq((1L, "only two"), (2L, ""), (3L, "one"), (4L, "a b c d e"))
      .toDF("doc_id", "text")
    assert(Dedup.shingleSet(docs, "doc_id", "text").filter(col("id") =!= 4L).count() == 0)
    assert(Dedup.minHashNearDups(docs, "doc_id", "text", 0.5).count() == 0)
    val blocked = docs.withColumn("lang", lit("en"))
    assert(Dedup.ngramJaccardPairs(blocked, "doc_id", "text", "lang", 0.5).count() == 0)
    // simhash still hashes single-token docs (token-level, not shingle-level)
    assert(Dedup.simHash(docs, "doc_id", "text").count() == 3)
  }

  test("connected components: chains merge, singletons keep own label") {
    val edges = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("da", "db")
    val cc = Clusters.connectedComponents(edges, "da", "db")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc(1L) == 1L && cc(2L) == 1L && cc(3L) == 1L)
    assert(cc(7L) == 7L && cc(8L) == 7L)
  }

  test("connected components: throws instead of returning partial labels at maxIter") {
    // a 6-node chain has diameter 5 > maxIter=2 rounds of propagation
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)).toDF("da", "db")
    val e = intercept[IllegalStateException] {
      Clusters.connectedComponents(chain, "da", "db", maxIter = 2)
    }
    assert(e.getMessage.contains("did not converge"))
    // and the same chain converges with enough rounds
    val cc = Clusters.connectedComponents(chain, "da", "db", maxIter = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 6L).forall(cc(_) == 1L))
  }

  test("SimHashAgg (custom aggregate) equals the wide-aggregate formulation on the fixture") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val a = Dedup.simHash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Dedup.simHashWide(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("simhash: identical texts get identical hashes; hash fits in 60 bits") {
    val docs = Seq((1L, "w1 w2 w3 w4"), (2L, "w1 w2 w3 w4"), (3L, "z9 z8 z7"))
      .toDF("doc_id", "text")
    val h = Dedup.simHash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L))
    assert(h(1L) != h(3L))
    assert(h.values.forall(v => v >= 0 && v < (1L << 60)))
  }
}
