package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins the property the q328 oracle depends on: the Scala side runs
  * Viterbi DP with a (cost, n_pieces, pieces-string) lexicographic
  * objective, the DuckDB side enumerates EVERY segmentation and takes
  * the argmin — these must agree on all inputs, including cost ties
  * (quantized costs tie constantly). The DP's exchange argument: two
  * prefix-states cover the same letters, so their strings first
  * differ at a space-vs-letter position and order is preserved under
  * any common suffix. */
class UnigramSpec extends AnyFunSuite {

  /** brute force: all segmentations via recursion, global argmin */
  private def brute(w: String, costs: Map[String, Long],
      maxLen: Int): (String, Int, Long) = {
    def segs(i: Int): Seq[List[String]] =
      if (i == w.length) Seq(Nil)
      else (1 to math.min(maxLen, w.length - i)).flatMap { l =>
        val p = w.substring(i, i + l)
        if (costs.contains(p)) segs(i + l).map(p :: _) else Nil
      }
    segs(0).map { ps =>
      (ps.mkString(" "), ps.size, ps.map(costs).sum)
    }.minBy { case (s, n, c) => (c, n, s) }
  }

  // deterministic word soup over a tiny alphabet: small alphabets
  // maximize repeated substrings, i.e. cost ties — the case where the
  // string tiebreak carries the whole determinism burden
  private def word(seed: Long, len: Int): String = {
    var x = seed
    val sb = new StringBuilder
    for (_ <- 0 until len) {
      x = x * 6364136223846793005L + 1442695040888963407L
      sb.append(('a' + ((x >>> 33) % 3)).toChar)
    }
    sb.toString
  }

  test("DP equals brute-force argmin under heavy cost ties") {
    for (seed <- 1 to 200) {
      val w = word(seed.toLong, 2 + seed % 9)
      val pieces = (for {
        i <- 0 until w.length
        l <- 1 to math.min(4, w.length - i)
      } yield w.substring(i, i + l)).distinct
      // coarse costs: many pieces share a cost, forcing tiebreaks
      val costs = pieces.map(p => (p, (5 - p.length).toLong)).toMap
      assert(TextAnalysis.unigramViterbi(w, costs, 4) ==
        brute(w, costs, 4), s"mismatch on '$w' (coarse costs)")
    }
  }

  test("DP equals brute force with frequency-shaped costs") {
    for (seed <- 1 to 200) {
      val w = word(seed.toLong * 7919L, 2 + seed % 10)
      val pieces = (for {
        i <- 0 until w.length
        l <- 1 to math.min(4, w.length - i)
      } yield w.substring(i, i + l)).distinct
      // deterministic pseudo-frequency costs, small range (more ties)
      val costs = pieces.map(p =>
        (p, 1L + (math.abs(p.hashCode.toLong) + seed) % 5)).toMap
      assert(TextAnalysis.unigramViterbi(w, costs, 4) ==
        brute(w, costs, 4), s"mismatch on '$w' (freq costs)")
    }
  }

  test("totality: singletons alone segment any word") {
    val costs = Map("a" -> 2L, "b" -> 2L, "c" -> 2L)
    assert(TextAnalysis.unigramViterbi("cabba", costs, 4) ==
      (("c a b b a", 5, 10L)))
  }

  test("cheaper long piece wins over singleton chain") {
    val costs = Map("a" -> 2L, "b" -> 2L, "ab" -> 3L, "abab" -> 4L)
    // cost ties at 7 between "ab abab" and "abab ab" (both 2 pieces);
    // the string tiebreak picks "ab abab" (space < letter at pos 2)
    assert(TextAnalysis.unigramViterbi("ababab", costs, 4) ==
      (("ab abab", 2, 7L)))
  }
}
