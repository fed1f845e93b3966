package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Seeded fuzz harness for the row-level DML algebra: random small
  * tables (nullable columns included) and random predicate trees are
  * run through [[Versioned.deleteWhere]] / [[Versioned.updateWhere]]
  * and compared row-for-row against the REFERENCE semantics computed
  * as plain batch DataFrame algebra on the same input — `DELETE` keeps
  * `NOT coalesce(pred, false)` (FALSE and NULL survive), `UPDATE`
  * applies a CASE projection. Every iteration exercises the full
  * commit path (stats classification, file carry, rewrite, publish) on
  * a FRESH table, so what's fuzzed is the transaction layer's
  * semantics, not just expression evaluation. Deterministic seed —
  * failures reproduce. */
class GraftDmlFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(20260814L)

  private def freshTable(rows: Seq[(Long, java.lang.Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("dml_fuzz").toString
    val df = rows.toDF("k", "v", "s")
    Versioned.appendCommit(spark, dir, df, Some("k"), files = 3)
    dir
  }

  private def randRows(): Seq[(Long, java.lang.Long, String)] = {
    val n = 20 + rnd.nextInt(40)
    (1L to n).map { k =>
      val v: java.lang.Long =
        if (rnd.nextInt(5) == 0) null else Long.box(rnd.nextInt(100).toLong)
      val s = rnd.nextInt(4) match {
        case 0 => null; case 1 => "a"; case 2 => "b"; case 3 => "c"
      }
      (k, v, s)
    }
  }

  /** Random predicate over (k, v, s) from a small grammar; depth ≤ 2. */
  private def randPred(depth: Int = 0): String = {
    def leaf(): String = rnd.nextInt(7) match {
      case 0 => s"k <= ${1 + rnd.nextInt(60)}"
      case 1 => s"k % ${2 + rnd.nextInt(5)} = ${rnd.nextInt(2)}"
      case 2 => s"v > ${rnd.nextInt(100)}"
      case 3 => s"v IS NULL"
      case 4 => s"s = '${Seq("a", "b", "c")(rnd.nextInt(3))}'"
      case 5 => s"s IS NOT NULL"
      case 6 => s"v + k > ${rnd.nextInt(120)}"
    }
    if (depth >= 2 || rnd.nextInt(3) == 0) leaf()
    else rnd.nextInt(3) match {
      case 0 => s"(${randPred(depth + 1)}) AND (${randPred(depth + 1)})"
      case 1 => s"(${randPred(depth + 1)}) OR (${randPred(depth + 1)})"
      case 2 => s"NOT (${randPred(depth + 1)})"
    }
  }

  private def collectSet(df: DataFrame): Set[(Long, Option[Long], Option[String])] =
    df.select("k", "v", "s").collect().map { r =>
      (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        Option(r.getAs[String](2)))
    }.toSet

  test("deleteWhere matches batch NOT(coalesce(pred,false)) on random inputs") {
    (1 to 6).foreach { i =>
      val rows = randRows()
      val pred = randPred()
      val table = freshTable(rows)
      val input = rows.toDF("k", "v", "s")
      val expected = collectSet(
        input.filter(!coalesce(expr(pred), lit(false))))
      Versioned.deleteWhere(spark, table, pred)
      val got = collectSet(Versioned.read(spark, table))
      assert(got == expected,
        s"case $i: DELETE WHERE $pred\nrows=${rows.size} " +
          s"missing=${expected -- got} extra=${got -- expected}")
    }
  }

  test("mergeInto upsert matches the batch full-outer reference on random inputs") {
    (1 to 4).foreach { i =>
      val rows = randRows()
      val table = freshTable(rows)
      // unique-keyed source straddling the target's key range: some
      // matched, some new; values include nulls
      val srcRows = rnd.shuffle((1L to 80L).toList).take(15 + rnd.nextInt(15))
        .map { k =>
          val nv: java.lang.Long =
            if (rnd.nextInt(6) == 0) null else Long.box(rnd.nextInt(500).toLong)
          (k, nv)
        }
      val src = srcRows.toDF("mk", "nv")
      val parse = spark.sessionState.sqlParser.parseExpression(_: String)
      val stats = Versioned.mergeInto(spark, table, src,
        parse("__t_k = __s_mk"),
        matched = Seq(Versioned.UpdateAct(None,
          Seq("v" -> parse("__s_nv"), "s" -> parse("'m'")))),
        notMatched = Seq(Versioned.InsertAct(None,
          Seq("k" -> parse("__s_mk"), "v" -> parse("__s_nv"),
            "s" -> parse("'n'")))),
        notMatchedBySource = Nil)
      val tKeys = rows.map(_._1).toSet
      val matchedKeys = srcRows.map(_._1).filter(tKeys).toSet
      val expected: Set[(Long, Option[Long], Option[String])] =
        rows.filterNot(r => matchedKeys(r._1))
          .map(r => (r._1, Option(r._2).map(Long.unbox), Option(r._3))).toSet ++
          srcRows.filter(r => tKeys(r._1))
            .map(r => (r._1, Option(r._2).map(Long.unbox), Some("m"))).toSet ++
          srcRows.filterNot(r => tKeys(r._1))
            .map(r => (r._1, Option(r._2).map(Long.unbox), Some("n"))).toSet
      val got = collectSet(Versioned.read(spark, table))
      assert(got == expected,
        s"case $i: missing=${expected -- got} extra=${got -- expected}")
      assert(stats.updated == matchedKeys.size &&
        stats.inserted == srcRows.count(r => !tKeys(r._1)),
        s"case $i stats: $stats vs ${matchedKeys.size} matched")
    }
  }

  test("updateWhere matches the batch CASE projection on random inputs") {
    (1 to 6).foreach { i =>
      val rows = randRows()
      val pred = randPred()
      val table = freshTable(rows)
      val input = rows.toDF("k", "v", "s")
      val setV = "coalesce(v, 0) * 2 + k"
      val condTrue = coalesce(expr(pred), lit(false))
      val expected = collectSet(input.select(col("k"),
        when(condTrue, expr(setV).cast("long")).otherwise(col("v")).as("v"),
        when(condTrue, lit("upd")).otherwise(col("s")).as("s")))
      val expectedCount = input.filter(condTrue).count()
      val n = Versioned.updateWhere(spark, table,
        Some(spark.sessionState.sqlParser.parseExpression(pred)),
        Seq("v" -> spark.sessionState.sqlParser.parseExpression(setV),
          "s" -> spark.sessionState.sqlParser.parseExpression("'upd'")))
      assert(n == expectedCount, s"case $i: affected count under $pred")
      val got = collectSet(Versioned.read(spark, table))
      assert(got == expected,
        s"case $i: UPDATE WHERE $pred\nmissing=${expected -- got} " +
          s"extra=${got -- expected}")
    }
  }

  test("merge cascade with DELETE + NOT MATCHED BY SOURCE: stats and state match") {
    (1 to 4).foreach { i =>
      val rows = randRows()
      val table = freshTable(rows)
      val srcRows = rnd.shuffle((1L to 80L).toList).take(15 + rnd.nextInt(15))
        .map { k =>
          val nv: java.lang.Long =
            if (rnd.nextInt(6) == 0) null else Long.box(rnd.nextInt(500).toLong)
          (k, nv)
        }
      val src = srcRows.toDF("mk", "nv")
      val parse = spark.sessionState.sqlParser.parseExpression(_: String)
      // cascade: matched + nv > 250 -> DELETE; matched -> UPDATE;
      // unmatched source -> INSERT; unmatched TARGET with null v ->
      // UPDATE s='stale' (forces the full-table classification path)
      val stats = Versioned.mergeInto(spark, table, src,
        parse("__t_k = __s_mk"),
        matched = Seq(
          Versioned.DeleteAct(Some(parse("__s_nv > 250"))),
          Versioned.UpdateAct(None,
            Seq("v" -> parse("__s_nv"), "s" -> parse("'m'")))),
        notMatched = Seq(Versioned.InsertAct(None,
          Seq("k" -> parse("__s_mk"), "v" -> parse("__s_nv"),
            "s" -> parse("'n'")))),
        notMatchedBySource = Seq(Versioned.UpdateAct(
          Some(parse("__t_v IS NULL")), Seq("s" -> parse("'stale'")))))
      val srcByKey = srcRows.toMap
      val tKeys = rows.map(_._1).toSet
      def del(nv: java.lang.Long) = nv != null && nv > 250L
      val expected: Set[(Long, Option[Long], Option[String])] =
        (rows.flatMap { r =>
          srcByKey.get(r._1) match {
            case Some(nv) if del(nv) => None // matched DELETE
            case Some(nv) => // matched UPDATE (second branch)
              Some((r._1, Option(nv).map(Long.unbox), Some("m")))
            case None if r._2 == null => // not matched by source, v null
              Some((r._1, None, Some("stale")))
            case None =>
              Some((r._1, Option(r._2).map(Long.unbox), Option(r._3)))
          }
        } ++ srcRows.filterNot(r => tKeys(r._1)).map(r =>
          (r._1, Option(r._2).map(Long.unbox), Some("n")))).toSet
      val got = collectSet(Versioned.read(spark, table))
      assert(got == expected,
        s"case $i: missing=${expected -- got} extra=${got -- expected}")
      val expDeleted = srcRows.count(r => tKeys(r._1) && del(r._2))
      val expUpdated = srcRows.count(r => tKeys(r._1) && !del(r._2)) +
        rows.count(r => !srcByKey.contains(r._1) && r._2 == null)
      val expInserted = srcRows.count(r => !tKeys(r._1))
      assert(stats == Versioned.MergeStats(expUpdated, expDeleted, expInserted),
        s"case $i stats: $stats vs ($expUpdated, $expDeleted, $expInserted)")
    }
  }

  test("SQL MERGE WITH SCHEMA EVOLUTION matches the batch reference on random inputs") {
    spark.conf.set("spark.sql.catalog.fgraft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.fgraft.warehouse",
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get("target", "fgraft_wh")).toString)
    (1 to 2).foreach { i =>
      val rows = randRows()
      val t = "fz_" + java.util.UUID.randomUUID().toString
        .replace("-", "").take(10)
      spark.sql(s"CREATE TABLE fgraft.$t (k BIGINT, v BIGINT, s STRING) " +
        "TBLPROPERTIES ('key' = 'k')")
      rows.toDF("k", "v", "s").createOrReplaceTempView("fz_base")
      spark.sql(s"INSERT INTO fgraft.$t SELECT * FROM fz_base")
      val srcRows = rnd.shuffle((1L to 80L).toList).take(10 + rnd.nextInt(10))
        .map(k => (k, k * 3, s"p$k"))
      srcRows.toDF("mk", "nv", "p").createOrReplaceTempView("fz_src")
      spark.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO fgraft.$t AS t
           |USING fz_src AS s ON t.k = s.mk
           |WHEN MATCHED THEN UPDATE SET v = s.nv, p = s.p
           |WHEN NOT MATCHED THEN
           |  INSERT (k, v, s, p) VALUES (s.mk, s.nv, 'n', s.p)
           |""".stripMargin)
      val srcByKey = srcRows.map(r => r._1 -> r).toMap
      val tKeys = rows.map(_._1).toSet
      val expected: Set[(Long, Option[Long], Option[String], Option[String])] =
        (rows.map { r =>
          srcByKey.get(r._1) match {
            case Some((_, nv, pp)) =>
              (r._1, Some(nv), Option(r._3), Some(pp))
            case None =>
              (r._1, Option(r._2).map(Long.unbox), Option(r._3), None)
          }
        } ++ srcRows.filterNot(r => tKeys(r._1)).map(r =>
          (r._1, Some(r._2), Some("n"), Some(r._3)))).toSet
      val got = spark.sql(s"SELECT k, v, s, p FROM fgraft.$t")
        .collect().map { r =>
          (r.getLong(0),
            if (r.isNullAt(1)) None else Some(r.getLong(1)),
            Option(r.getAs[String](2)), Option(r.getAs[String](3)))
        }.toSet
      assert(got == expected,
        s"case $i: missing=${expected -- got} extra=${got -- expected}")
      spark.sql(s"DROP TABLE fgraft.$t")
    }
  }

  test("merge over a live deletion vector: dead rows insert, arithmetic stays exact") {
    // DV-masked rows do not exist for MERGE: a source row keyed on one
    // is NOT MATCHED and inserts; the rewritten file's DV entries drop
    // without resurrecting the dead rows; stats.deleted counts LIVE
    // rows only (the manifest arithmetic must subtract the DV'd rows
    // of touched files).
    val dir = java.nio.file.Files.createTempDirectory("dml_dv").toString
    Versioned.appendCommit(spark, dir,
      (1L to 10L).map(k => (k, k * 10, s"v$k")).toDF("k", "v", "s"),
      Some("k"), files = 2)
    Versioned.deleteMergeOnRead(spark, dir, Seq(2L, 3L).toDF("k"), "k")
    val parse = spark.sessionState.sqlParser.parseExpression(_: String)
    val stats = Versioned.mergeInto(spark, dir,
      Seq((2L, 200L), (4L, 400L), (11L, 1100L)).toDF("mk", "nv"),
      parse("__t_k = __s_mk"),
      matched = Seq(
        Versioned.DeleteAct(Some(parse("__s_nv > 350"))),
        Versioned.UpdateAct(None, Seq("v" -> parse("__s_nv")))),
      notMatched = Seq(Versioned.InsertAct(None,
        Seq("k" -> parse("__s_mk"), "v" -> parse("__s_nv"),
          "s" -> parse("'n'")))),
      notMatchedBySource = Nil)
    assert(stats == Versioned.MergeStats(0L, 1L, 2L),
      s"k=4 deleted (live match), k=2 and k=11 inserted (2 is DV-dead): $stats")
    val got = Versioned.read(spark, dir).select("k", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = ((1L to 10L).toSet -- Set(2L, 3L, 4L)).map(k => (k, k * 10)) ++
      Set((2L, 200L), (11L, 1100L))
    assert(got == expected, s"missing=${expected -- got} extra=${got -- expected}")
  }
}
