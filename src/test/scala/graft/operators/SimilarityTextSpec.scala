package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Unit tests for the similarity-search and text-analysis library
  * functions on synthetic inputs. */
class SimilarityTextSpec extends SparkSpec {

  private def emb(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("bruteForceTopK ranks by cosine with deterministic tiebreak") {
    // query 0 = (1,0); candidates: 10 parallel, 11 orthogonal, 12 diagonal
    val d = emb(
      (0L, Seq(1f, 0f)),
      (10L, Seq(5f, 0f)),
      (11L, Seq(0f, 3f)),
      (12L, Seq(1f, 1f)))
    val r = Similarity.bruteForceTopK(d, col("vec_id") < 10, 3)
      .orderBy(col("rk")).collect()
      .map(x => (x.getInt(1), x.getLong(2), x.getDouble(3)))
    assert(r.map(_._2).toSeq == Seq(10L, 12L, 11L))
    assert(r.head._3 == 1.0)
  }

  test("lshBuckets: identical vectors land in the same bucket, buckets in range") {
    val d = emb(
      (1L, Seq.tabulate(64)(i => i.toFloat / 64)),
      (2L, Seq.tabulate(64)(i => i.toFloat / 64)),
      (3L, Seq.tabulate(64)(i => -(i.toFloat) / 64)))
    val r = Similarity.lshBuckets(d).select("vec_id", "bucket").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(r(1L) == r(2L))
    assert(r(3L) != r(1L)) // opposite vector flips every hyperplane sign
    assert(r.values.forall(b => b >= 0 && b < 256))
  }

  test("langId is deterministic and scores marker occurrences") {
    import spark.implicits._
    val d = Seq((1L, "the cat and the dog"), (2L, "zzz qqq"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.langId(d).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2))).toList
    assert(r.map(_._1) == List(1L, 2L))
    val doc1 = r.head
    assert(doc1._3 > 0) // 'the'/'and' markers present
  }

  test("qualityScore ratios are consistent") {
    import spark.implicits._
    val d = Seq((1L, "the the the the")).toDF("doc_id", "text")
    val row = TextAnalysis.qualityScore(d).collect().head
    assert(row.getLong(2) == 4L)             // n_tokens
    assert(row.getDouble(3) == 0.25)          // distinct_ratio
    assert(row.getDouble(4) == 1.0)           // stopword_ratio
    assert(row.getDouble(5) == 3.0)           // mean_token_len
  }

  test("fingerprint is order-sensitive (a true rolling hash)") {
    import spark.implicits._
    val d = Seq((1L, "a b c"), (2L, "c b a"), (3L, "a b c"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.fingerprint(d).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(r(1L) == r(3L))
    assert(r(1L) != r(2L))
  }

  test("tokenStats counts regex token classes") {
    import spark.implicits._
    val d = Seq((1L, "ab1 cd, ef")).toDF("doc_id", "text")
    val row = TextAnalysis.tokenStats(d).collect().head
    assert(row.getLong(1) == 3L) // ws tokens: ab1 / cd, / ef
    // bpe-ish: ab, 1, cd, ',', ef
    assert(row.getLong(2) == 5L)
  }

  test("quantizeInt8: half-up rounding, extreme maps to ±127, zero vector safe") {
    val d = emb(
      (1L, Seq(1f, -0.5f, 0.25f, 0f)),
      (2L, Seq(0f, 0f, 0f, 0f)))
    val r = Similarity.quantizeInt8(d).orderBy(col("vec_id")).collect()
      .map(x => (x.getLong(0), x.getDouble(1), x.getString(2), x.getDouble(3)))
    // scale = 1/127; v/scale = [127, -63.5, 31.75, 0] -> floor(x+0.5)
    assert(r(0)._3 == "127,-63,32,0")
    assert(math.abs(r(0)._2 - 1.0 / 127) < 1e-6)
    // worst residual |-0.5 - (-63/127)| = 0.5/127, rounded DOWN at 6dp
    assert(r(0)._4 > 0 && r(0)._4 < 0.5 / 127)
    // all-zero vector: scale 0 guard, zero error
    assert(r(1) == ((2L, 0.0, "0,0,0,0", 0.0)))
  }

  test("quantizeInt8 invariant on random vectors: residual <= scale/2, codes in [-127,127]") {
    val rnd = new scala.util.Random(41)
    val d = emb((0 until 30).map(i =>
      (i.toLong, Seq.fill(64)((rnd.nextFloat() - 0.5f) * 10f))): _*)
    val rows = Similarity.quantizeInt8(d).collect()
    rows.foreach { r =>
      val scale = r.getDouble(1)
      val codes = r.getString(2).split(",").map(_.toInt)
      val maxErr = r.getDouble(3)
      assert(codes.forall(c => c >= -127 && c <= 127))
      // half-up rounding bounds each residual by scale/2 (plus the 6dp
      // output rounding of both fields)
      assert(maxErr <= scale / 2 + 1e-6,
        s"vec ${r.getLong(0)}: maxErr=$maxErr scale=$scale")
    }
  }

  test("proximitySearch matches a brute-force pair scan on random token streams") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Vector("a", "b", "c", "d")
    val docs = (0L until 40L).map { id =>
      (id, Seq.fill(30)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    for (d <- Seq(1, 3, 10)) {
      val got = TextAnalysis.proximitySearch(df, "a", "b", d)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      val expected = docs.flatMap { case (id, text) =>
        val toks = text.split(" ")
        val pairs = for {
          (ta, i) <- toks.zipWithIndex if ta == "a"
          (tb, j) <- toks.zipWithIndex
          if tb == "b" && j > i && j - i <= d
        } yield j - i
        if (pairs.isEmpty) None
        else Some(id -> (pairs.size.toLong, pairs.min.toLong))
      }.toMap
      assert(got == expected, s"maxDist=$d")
    }
  }

  test("bigramPmi: hand-checked counts; empty and 1-token docs are safe") {
    import spark.implicits._
    val docs = Seq((0L, "a b a b"), (1L, "a"), (2L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramPmi(docs, minCount = 1L, topK = 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    // unigrams a=3 b=2; pairs (a,b)=2 (b,a)=1, N=3
    // pmi(a,b)=ln(2*3/(3*2))=0; pmi(b,a)=ln(1*3/(2*3))=-0.6931
    assert(out.toSeq == Seq(
      ("a", "b", 2L, 3L, 2L, 0.0),
      ("b", "a", 1L, 2L, 3L, -0.6931)))
  }

  test("bigramLmScore: hand-checked smoothed log-probs; short docs absent") {
    import spark.implicits._
    val docs = Seq((0L, "a b a b"), (1L, "a b"), (2L, "x q"), (3L, "a"),
      (4L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // unigrams: a=4 b=3 x=1 q=1, V=4
    // bigram counts: (a,b)=3 (b,a)=1 (x,q)=1
    def p(nab: Long, na: Long) = math.log((nab + 1.0) / (na + 4.0))
    def r4(x: Double) = math.rint(x * 10000) / 10000
    val d0 = r4((p(3, 4) + p(1, 3) + p(3, 4)) / 3) // a b, b a, a b
    val d1 = r4(p(3, 4))
    val d2 = r4(p(1, 1))
    assert(out(0L) == ((3L, d0)))
    assert(out(1L) == ((1L, d1)))
    assert(out(2L) == ((1L, d2)))
    assert(!out.contains(3L) && !out.contains(4L))
    // the common-bigram doc reads as more probable than the rare one
    assert(out(1L)._2 > out(2L)._2)
  }

  test("bm25TopK: rare-term doc outranks common-term doc, k bounds the result") {
    import spark.implicits._
    // 'rare' appears in one doc, 'common' in all four: idf makes doc 1
    // the clear winner; doc 4 matches nothing and must not appear
    val d = Seq(
      (1L, "rare common x y z"),
      (2L, "common a b c d e f g h i j k l m n o p q r s t u v w"),
      (3L, "common q r s"),
      (4L, "nothing here at all")).toDF("doc_id", "text")
    val r = TextAnalysis.bm25TopK(d, Seq("rare", "common"), k = 3).collect()
      .map(x => (x.getLong(0), x.getDouble(1)))
    assert(r.length == 3)
    assert(r.head._1 == 1L) // rare-term match dominates
    assert(r.map(_._1).toSet == Set(1L, 2L, 3L))
    // longer doc is penalized: doc 3's 'common' beats doc 2's
    val byId = r.toMap
    assert(byId(3L) > byId(2L))
    assert(r.map(_._2).forall(_ > 0))
  }

  test("topPrincipalComponent replays a driver-side power iteration and finds a planted axis") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val dim = 8
    // planted dominant axis along dim 2 (0-based index 2), noise elsewhere
    val vecs = (1L to 40L).map { id =>
      val base = Array.fill(dim)((rnd.nextDouble() - 0.5) * 0.2)
      base(2) += (if (id % 2 == 0) 1.0 else -1.0)
      id -> base.map(_.toFloat)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.topPrincipalComponent(df, iters = 3)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // driver-side replay of the exact recurrence
    val n = vecs.size
    val mu = Array.tabulate(dim)(j => vecs.map(_._2(j).toDouble).sum / n)
    val cent = vecs.map { case (_, v) =>
      Array.tabulate(dim)(j => v(j).toDouble - mu(j)) }
    var v = Array.tabulate(dim)(j => if (j == 0) 1.0 else 0.0)
    for (_ <- 1 to 3) {
      val w = Array.fill(dim)(0.0)
      cent.foreach { c =>
        val d = (0 until dim).map(j => c(j) * v(j)).sum
        (0 until dim).foreach(j => w(j) += c(j) * d)
      }
      val nrm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / nrm)
    }
    (1 to dim).foreach { i =>
      assert(math.abs(got(i) - math.rint(v(i - 1) * 10000) / 10000) <= 1e-4,
        s"dim $i: got ${got(i)} expected ${v(i - 1)}")
    }
    // the planted axis dominates the direction
    assert(math.abs(got(3)) > 0.9, s"planted axis weight ${got(3)}")
  }

  test("kmeansClusters separates planted poles and replays a driver-side Lloyd exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(42L)
    val dim = 8
    // two planted poles with small jitter; ids interleaved so the init
    // picks one seed from each pole region
    def jitter(base: Double) =
      Array.fill(dim)((base + (rnd.nextDouble() - 0.5) * 0.1).toFloat)
    val vecs = (1L to 30L).map { id =>
      id -> jitter(if (id % 2 == 0) 0.9 else -0.9)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.kmeansClusters(df, 2, 2).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap

    // driver-side replay of the SAME integer-grid algorithm
    val q = vecs.map { case (id, v) =>
      id -> v.map(x => math.round(x.toDouble * 1e6))
    }.toMap
    def dist(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var cents: Map[Long, Array[Long]] =
      q.keys.toSeq.sorted.take(2).zipWithIndex
        .map { case (id, i) => i.toLong -> q(id) }.toMap
    def assign(cs: Map[Long, Array[Long]]): Map[Long, Long] =
      q.map { case (id, v) =>
        id -> cs.toSeq.map { case (cid, c) => (dist(v, c), cid) }.min._2
      }
    for (_ <- 1 to 2) {
      val a = assign(cents)
      cents = a.groupBy(_._2).map { case (cid, members) =>
        val vs = members.keys.map(q).toSeq
        cid -> Array.tabulate(dim)(j =>
          math.floor(vs.map(_(j)).sum.toDouble / vs.size).toLong)
      }
    }
    val expected = assign(cents)
    assert(got == expected)
    // and the poles actually separate: evens together, odds together
    assert(got.filterKeys(_ % 2 == 0).values.toSet.size == 1)
    assert(got.filterKeys(_ % 2 == 1).values.toSet.size == 1)
    assert(got(2L) != got(1L))
  }

  test("bpeMerges: frequency-descending, deterministic, hand-checked first merge") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat the hat"), (2L, "the thin cat sat"),
      (3L, "that hat is that cat"), (4L, "this is the thing"))
      .toDF("doc_id", "text")
    val run1 = TextAnalysis.bpeMerges(docs, nMerges = 6).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    // merge frequencies can never increase: any pair involving the new
    // symbol ab is bounded by count(ab) = f, and pre-existing pairs only
    // lose occurrences to the merge
    val freqs = run1.map(_._5)
    assert(freqs.zip(freqs.tail).forall { case (x, y) => x >= y },
      s"frequencies not non-increasing: ${freqs.toSeq}")
    // hand-check the head: (t,h) rides the(4) thin that(2) this thing
    // = 9 occurrences; (a,t) rides cat(3) hat(2) sat that(2) = 8 and
    // survives the th-merge untouched (that = [th,a,t] keeps its (a,t))
    assert(run1(0) == ((1, "t", "h", "th", 9L)), run1(0).toString)
    assert(run1(1) == ((2, "a", "t", "at", 8L)), run1(1).toString)
    // deterministic: an independent run yields the identical trajectory
    val run2 = TextAnalysis.bpeMerges(docs, nMerges = 6).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(run1.toSeq == run2.toSeq)
  }

  test("charEntropy: hand-checked bits, degenerate and empty inputs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aabb"), // two equiprobable symbols -> exactly 1 bit
      (2L, "abcd"), // four equiprobable -> exactly 2 bits
      (3L, "aaaa"), // degenerate -> 0 bits
      (4L, ""), // empty -> 0 bits, 0 distinct
      (5L, "aab")) // 2/3,1/3 -> 0.9183
      .toDF("doc_id", "text")
    val r = TextAnalysis.charEntropy(docs).orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getInt(2), x.getDouble(3)))
    assert(r(0) == ((1L, 4L, 2, 1.0)))
    assert(r(1) == ((2L, 4L, 4, 2.0)))
    assert(r(2) == ((3L, 4L, 1, 0.0)))
    assert(r(3) == ((4L, 0L, 0, 0.0)))
    assert(r(4) == ((5L, 3L, 2, 0.9183)))
  }

  test("charEntropy counts CODE POINTS: a supplementary-plane emoji is " +
      "one symbol, not two surrogate halves") {
    import spark.implicits._
    // U+1F600 GRINNING FACE = surrogate pair in UTF-16
    val docs = Seq((1L, "😀😀"), // 2 identical emoji
      (2L, "a😀")) // 2 distinct symbols -> 1 bit
      .toDF("doc_id", "text")
    val r = TextAnalysis.charEntropy(docs).orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getInt(2), x.getDouble(3)))
    assert(r(0) == ((1L, 2L, 1, 0.0)))
    assert(r(1) == ((2L, 2L, 2, 1.0)))
  }

  test("hostLineDedup: per-host threshold, distinct-doc counting, order kept") {
    import spark.implicits._
    val pages = Seq(
      // host a: 'nav' on 4 distinct pages -> boilerplate at minDocs=4
      (1L, "a", "nav\nalpha one\nbeta two"),
      (2L, "a", "nav\ngamma three"),
      (3L, "a", "nav\nnav\ndelta four"), // in-page dup: both drop
      (4L, "a", "nav"), // every line boilerplate -> empty clean_text
      // host b: the SAME 'nav' text on only 2 pages -> kept (per-host)
      (5L, "b", "nav\nepsilon five"),
      (6L, "b", "nav\nzeta six"),
      // host c: 'x' on 3 distinct pages, 4 OCCURRENCES — an
      // occurrence-counting bug would cross the threshold; distinct-doc
      // counting must keep it
      (7L, "c", "x\nx\nseven"),
      (8L, "c", "x\neight"),
      (9L, "c", "x\nnine"))
      .toDF("doc_id", "host", "text")
    val r = TextAnalysis.hostLineDedup(pages, minDocs = 4)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3)))
    assert(r(0) == ((1L, 2L, 1L, "alpha one\nbeta two")), r(0).toString)
    assert(r(1) == ((2L, 1L, 1L, "gamma three")))
    assert(r(2) == ((3L, 1L, 2L, "delta four"))) // both occurrences drop
    assert(r(3) == ((4L, 0L, 1L, "")))
    assert(r(4) == ((5L, 2L, 0L, "nav\nepsilon five")))
    assert(r(5) == ((6L, 2L, 0L, "nav\nzeta six")))
    assert(r(6) == ((7L, 3L, 0L, "x\nx\nseven"))) // 3 distinct < 4
    assert(r(7) == ((8L, 2L, 0L, "x\neight")))
    assert(r(8) == ((9L, 2L, 0L, "x\nnine")))
  }

  test("hostLineDedup is total on its input: an all-empty page still " +
      "reports (0, 0, '') instead of vanishing") {
    import spark.implicits._
    val pages = Seq(
      (1L, "a", "only\ncontent"),
      (2L, "a", ""), // no lines at all
      (3L, "a", "\n\n")) // only empty lines
      .toDF("doc_id", "host", "text")
    val r = TextAnalysis.hostLineDedup(pages, minDocs = 2)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3)))
    assert(r.toSeq == Seq(
      (1L, 2L, 0L, "only\ncontent"),
      (2L, 0L, 0L, ""),
      (3L, 0L, 0L, "")))
  }
}
