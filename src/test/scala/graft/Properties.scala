package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.text.Chunkers
import graft.vector.HashingEmbedder

/** Pure-ScalaCheck property suite (runs under sbt's ScalaCheck test
  * framework; no Spark session — these pin the driver-side pure
  * functions that distributed operators are built from, over randomized
  * input rather than fixtures). */
object GraftProperties extends Properties("graft") {

  private val textGen: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumStr.suchThat(_.nonEmpty), Gen.const("🎉"),
      Gen.oneOf("word.", "stop!", "really?", "plain")))
      .map(_.mkString(" "))

  property("fixedSize chunks reconstruct the input for any text/width") =
    forAll(textGen, Gen.choose(1, 64)) { (s, w) =>
      Chunkers.fixedSize(s, w).mkString == s
    }

  property("fixedSize chunk count equals ceil(codepoints/width)") =
    forAll(textGen.suchThat(_.nonEmpty), Gen.choose(1, 64)) { (s, w) =>
      val cp = s.codePointCount(0, s.length)
      Chunkers.fixedSize(s, w).length == math.ceil(cp.toDouble / w).toInt
    }

  property("tokenWindows covers every token at least once") =
    forAll(textGen, Gen.choose(1, 8), Gen.choose(1, 8)) { (s, w, st) =>
      val stride = math.min(st, w) // stride > window would skip tokens
      val toks = s.split("\\s+").filter(_.nonEmpty)
      val joined = Chunkers.tokenWindows(s, w, stride).mkString(" ")
      toks.forall(joined.contains(_))
    }

  property("embedder is deterministic and unit-norm (or zero) for any text") =
    forAll(textGen) { s =>
      val e = HashingEmbedder(32)
      val v1 = e.embed(s); val v2 = e.embed(s)
      val norm = math.sqrt(v1.map(x => x.toDouble * x).sum)
      (v1.toSeq == v2.toSeq) &&
        (math.abs(norm - 1.0) < 1e-4 || v1.forall(_ == 0f))
    }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (j == 0) i else if (i == 0) j else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  property("q45 length banding is lossless: lev(a,b)<=D implies |len(a)-len(b)|<=D") =
    forAll(Gen.alphaStr.map(_.take(12)), Gen.alphaStr.map(_.take(12)),
      Gen.choose(0, 4)) { (a, b, dd) =>
      lev(a, b) > dd || math.abs(a.length - b.length) <= dd
    }

  property("semantic chunking partitions the sentence sequence in order") =
    forAll(textGen) { s =>
      val embed = (t: String) => HashingEmbedder(16).embed(t)
      val sents = Chunkers.sentences(s)
      val chunks = Chunkers.semantic(s, embed)
      // chunk concatenation (space-joined) equals sentence concatenation
      Prop.propBoolean(chunks.mkString(" ") == sents.mkString(" "))
    }
}
