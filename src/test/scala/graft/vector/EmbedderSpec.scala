package graft.vector

import org.scalatest.funsuite.AnyFunSuite

class EmbedderSpec extends AnyFunSuite {
  private val e = HashingEmbedder(64)

  test("deterministic across calls; dimension respected") {
    val v1 = e.embed("the quick brown fox")
    val v2 = e.embed("the quick brown fox")
    assert(v1.toSeq == v2.toSeq)
    assert(v1.length == 64)
  }

  test("non-empty text embeds to a unit vector; empty/null to zero") {
    val v = e.embed("hello world")
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    assert(e.embed("").forall(_ == 0f))
    assert(e.embed(null).forall(_ == 0f))
  }

  test("case-insensitive and token-order-sensitive only through counts") {
    assert(e.embed("Alpha Beta").toSeq == e.embed("alpha beta").toSeq)
    assert(e.embed("alpha beta").toSeq == e.embed("beta alpha").toSeq,
      "bag-of-words: order must not matter")
  }
}
