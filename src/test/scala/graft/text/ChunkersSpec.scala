package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.vector.HashingEmbedder

class ChunkersSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)
  private def randomAscii(n: Int): String =
    (0 until n).map(_ => (32 + rnd.nextInt(95)).toChar).mkString

  test("fixedSize: concatenation reconstructs the input exactly") {
    for (_ <- 1 to 200) {
      val s = randomAscii(rnd.nextInt(120))
      val w = 1 + rnd.nextInt(50)
      assert(Chunkers.fixedSize(s, w).mkString == s)
    }
  }

  test("fixedSize: every chunk <= width code points; all but last exactly width") {
    for (_ <- 1 to 200) {
      val s = randomAscii(1 + rnd.nextInt(80))
      val w = 1 + rnd.nextInt(20)
      val chunks = Chunkers.fixedSize(s, w)
      def cp(c: String) = c.codePointCount(0, c.length)
      assert(chunks.init.forall(cp(_) == w))
      assert(cp(chunks.last) <= w && cp(chunks.last) > 0)
    }
  }

  test("fixedSize counts code points, not UTF-16 units (non-BMP input)") {
    // the emoji is one code point but two UTF-16 chars
    val s = "ab🎉cd" // "ab🎉cd": 5 code points
    val chunks = Chunkers.fixedSize(s, 2)
    assert(chunks == Seq("ab", "🎉c", "d"))
    // chunk count matches the q23 oracle's ceil(length/width) over code points
    assert(chunks.length == math.ceil(5 / 2.0).toInt)
  }

  test("fixedSize: null and empty yield no chunks") {
    assert(Chunkers.fixedSize(null, 5).isEmpty)
    assert(Chunkers.fixedSize("", 5).isEmpty)
  }

  test("sentences: splits on terminal punctuation + whitespace") {
    assert(Chunkers.sentences("One. Two! Three? Four") ==
      Seq("One.", "Two!", "Three?", "Four"))
  }

  test("tokenWindows: short text is one window; stride advances correctly") {
    assert(Chunkers.tokenWindows("a b", 5, 2) == Seq("a b"))
    assert(Chunkers.tokenWindows("a b c d e", 3, 2) == Seq("a b c", "c d e"))
  }

  test("semantic: deterministic and loses no sentence") {
    val embed = (s: String) => HashingEmbedder(16).embed(s)
    val text = "The cat sat. Dogs bark loudly! Quantum physics is hard. " +
      "The feline rested. More physics follows?"
    val a = Chunkers.semantic(text, embed)
    assert(a == Chunkers.semantic(text, embed), "must be deterministic")
    val joined = a.mkString(" ")
    Chunkers.sentences(text).foreach(s => assert(joined.contains(s)))
  }
}
