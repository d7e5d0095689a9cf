package graft.operators

import scala.collection.mutable.ListBuffer

import graft.SparkSpec

class BpeEncodeSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: greedy-left non-overlapping merge of each
    * (a, b) in priority order — the semantics bpeEncode's fold chain
    * must reproduce distributed. */
  private def refEncode(word: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(word.map(_.toString).toList) { case (syms, (a, b)) =>
      val out = ListBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toList
    }

  private val docs = Seq(
    (1L, "the theme thereof"),
    (2L, "breathe the heat"),
    (3L, "a lone e"),           // length-1 words must still tokenize
    (4L, "42 --- 17"),          // no [a-z] word: absent from output
    (5L, "aaaaa aa a"))         // overlapping-merge greedy-left case
    .toDF("doc_id", "text")

  test("bpeEncode matches the driver-side greedy-left reference") {
    val merges = Seq(("t", "h"), ("th", "e"), ("e", "a"), ("a", "a"))
    val got = TextAnalysis.bpeEncode(docs, merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val expected = docs.collect().map { r =>
      val id = r.getLong(0)
      val words = r.getString(1).toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
      val toks = words.toSeq.flatMap(w => refEncode(w, merges))
      id -> ((toks.size.toLong, toks.mkString(" ")))
    }.filter(_._2._1 > 0).toMap
    assert(got == expected)
  }

  test("token concatenation recovers the lowercased word stream") {
    val merges = Seq(("a", "a"), ("aa", "a"), ("t", "h"))
    TextAnalysis.bpeEncode(docs, merges).collect().foreach { r =>
      val doc = docs.filter($"doc_id" === r.getLong(0))
        .head().getString(1)
      val wordChars = doc.toLowerCase.split("[^a-z]+")
        .filter(_.nonEmpty).mkString
      assert(r.getString(2).replace(" ", "") == wordChars,
        s"doc ${r.getLong(0)}: token concat must equal its word chars")
    }
  }

  test("round-trip: pair recount over encoded words reproduces the " +
      "training loop's next merge pick") {
    // The "encode state = training state" law. Train n+1 merges; encode
    // with the first n; recount adjacent symbol pairs inside each
    // encoded length>=2 word occurrence. The (n+1)th training merge
    // must be EXACTLY the recount's argmax under the training
    // tie-break (freq desc, then a, then b), with the same frequency —
    // i.e. the encoded corpus IS the training loop's round-n state.
    // (Test 1 pins bpeEncode == refEncode, so recounting via refEncode
    // transfers the law to the distributed operator.)
    val n = 4
    val all = TextAnalysis.bpeMerges(docs, n + 1).orderBy($"step").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(all.length == n + 1, "fixture corpus must sustain n+1 merges")
    val merges = all.take(n).map(t => (t._1, t._2)).toSeq
    val recount = docs.collect().flatMap { r =>
      r.getString(1).toLowerCase.split("[^a-z]+").filter(_.length >= 2)
        .flatMap { w =>
          val toks = refEncode(w, merges)
          toks.zip(toks.drop(1))
        }
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ((ea, eb), ef) =
      recount.toSeq.sortBy { case ((a, b), f) => (-f, a, b) }.head
    assert((all(n)._1, all(n)._2) == ((ea, eb)),
      s"training picked (${all(n)._1}, ${all(n)._2}), recount says ($ea, $eb)")
    assert(all(n)._3 == ef, "pair frequency must match too")
    // and no earlier trained pair may survive its own merge stage:
    // the FIRST pair can never reappear (later merges only consume it)
    assert(!recount.contains((merges.head._1, merges.head._2)),
      s"first trained pair ${merges.head} must be fully merged")
  }
}
