package graft.operators

import graft.SparkSpec

class TrainingPipelineSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("ngramRows: distinct positional n-grams, docs shorter than n drop out") {
    val r = TrainingPipeline.ngramRows(docs((1L, "a b c d"), (2L, "a")), 2)
      .collect().map(x => (x.getLong(0), x.getString(1))).toSet
    assert(r == Set((1L, "a b"), (1L, "b c"), (1L, "c d")))
  }

  test("decontaminate flags only docs overlapping the benchmark") {
    val corpus = docs(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated words in this one here now"))
    val bench = docs((100L, "quick brown fox jumps elsewhere entirely"))
    val r = TrainingPipeline.decontaminate(corpus, bench, n = 4).collect()
    // doc 1 shares exactly one 4-gram ("quick brown fox jumps")
    assert(r.map(x => (x.getLong(0), x.getLong(1))).toSet == Set((1L, 1L)))
  }

  test("repetitionSignals: fractions and keep flag") {
    val r = TrainingPipeline.repetitionSignals(
      docs((1L, "a a a a b"), (2L, "a b c d e")), maxDupFrac = 0.55,
      maxTopFrac = 0.5).collect()
      .map(x => x.getLong(0) -> ((x.getDouble(2), x.getDouble(3), x.getInt(4))))
      .toMap
    // doc 1: 5 tokens, 2 distinct -> dup 0.6, top 4/5 = 0.8 -> dropped
    assert(r(1L) == ((0.6, 0.8, 0)))
    // doc 2: all distinct -> dup 0.0, top 0.2 -> kept
    assert(r(2L) == ((0.0, 0.2, 1)))
  }

  test("packSequences: concatenate-and-chunk pack assignment per source") {
    import spark.implicits._
    // source s: docs of 3,3,3 tokens, budget 5 -> cum starts 0,3,6 ->
    // packs 0,0,1
    val d = Seq((1L, "a b c", "s"), (2L, "d e f", "s"), (3L, "g h i", "s"))
      .toDF("doc_id", "text", "source")
    val r = TrainingPipeline.packSequences(d, budget = 5L).collect()
      .map(x => (x.getLong(1), x.getLong(2), x.getLong(3))).toSet
    assert(r == Set((0L, 2L, 6L), (1L, 1L, 3L))) // (pack_id, n_docs, sum_tokens)
  }

  test("deterministicShuffle: total, reproducible, positions contiguous per shard") {
    val d = docs((0L until 100L).map(i => (i, s"doc $i")): _*)
    val once = TrainingPipeline.deterministicShuffle(d, nShards = 4, seed = 7L)
      .collect().map(x => (x.getLong(0), x.getLong(2), x.getLong(3))).toSet
    val again = TrainingPipeline.deterministicShuffle(d, nShards = 4, seed = 7L)
      .collect().map(x => (x.getLong(0), x.getLong(2), x.getLong(3))).toSet
    assert(once == again) // bit-identical across runs, unlike rand()
    assert(once.size == 100)
    // per-shard positions are 1..n with no gaps
    once.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3) == (1L to rows.size).toSet)
    }
    // a different seed yields a different permutation
    val other = TrainingPipeline.deterministicShuffle(d, nShards = 4, seed = 8L)
      .collect().map(x => (x.getLong(0), x.getLong(2), x.getLong(3))).toSet
    assert(other != once)
  }

  test("incrementalDedup drops seen digests and dedups the batch internally") {
    import spark.implicits._
    val newDocs = docs((10L, "already seen"), (11L, "fresh text"),
      (12L, "fresh text"), (13L, "also new"))
    val seen = Seq("already seen").toDF("t")
      .select(org.apache.spark.sql.functions.md5($"t").as("digest"))
    val r = TrainingPipeline.incrementalDedup(newDocs, seen).collect()
      .map(x => (x.getLong(0), x.getLong(2))).toSet
    // 10 dropped (seen); 11/12 collapse to 11 with n_in_batch=2
    assert(r == Set((11L, 2L), (13L, 1L)))
  }

  test("incrementalDedup NULL contract: null-text rows excluded from both sides") {
    import spark.implicits._
    // a null digest in `seen` must not empty the result (SQL NOT IN
    // semantics), and a null-text batch row must not survive (left_anti
    // null-never-matches semantics) — the pinned contract excludes both
    val newDocs = Seq((10L, null: String), (11L, "fresh text"))
      .toDF("doc_id", "text")
    val seen = Seq(Some("kept digest"), None).toDF("t")
      .select(org.apache.spark.sql.functions.md5($"t").as("digest"))
    val r = TrainingPipeline.incrementalDedup(newDocs, seen).collect()
      .map(x => (x.getLong(0), x.getLong(2))).toSet
    assert(r == Set((11L, 1L)))
  }

  test("chunkTokens: overlapping windows, short tail chunk, empty doc dropped") {
    val r = TrainingPipeline.chunkTokens(
      docs((1L, "a b c d e f g"), (2L, "")), size = 4, stride = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2), x.getLong(3)))
    // 7 tokens, starts 0,3,6 -> chunks of 4,4,1 tokens
    assert(r.toSet == Set(
      (1L, 0L, "a b c d", 4L), (1L, 1L, "d e f g", 4L), (1L, 2L, "g", 1L)))
  }

  test("weightedSystematicSample lands marks proportionally to weight") {
    import spark.implicits._
    // one heavy doc (w=80) among ten light ones (w=2 each): total 100,
    // k=5 -> step 20; the heavy doc spans 4 marks but is kept once,
    // and at least one light doc after it catches a remaining mark
    val d = ((1 to 10).map(i => (i.toLong, "t", "s", 2L)) :+ (0L, "t", "s", 80L))
      .toDF("doc_id", "text", "source", "n_chars")
    val r = TrainingPipeline.weightedSystematicSample(d, "n_chars", perSourceK = 5)
      .collect().map(_.getLong(1)).toSet
    assert(r.contains(0L)) // the heavy doc is always selected
    val again = TrainingPipeline.weightedSystematicSample(d, "n_chars", perSourceK = 5)
      .collect().map(_.getLong(1)).toSet
    assert(r == again)
  }

  test("decontaminate matches a driver-side brute force on a random corpus") {
    val rnd = new scala.util.Random(43)
    def randDoc() = Seq.fill(12)(s"w${rnd.nextInt(30)}").mkString(" ")
    val corpusDocs = (0 until 25).map(i => (i.toLong, randDoc()))
    val benchDocs = (100 until 105).map(i => (i.toLong, randDoc()))
    val n = 4
    def grams(t: String): Set[String] =
      t.split(" ").sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet
    val benchGrams = benchDocs.flatMap(d => grams(d._2)).toSet
    val expected = corpusDocs
      .map { case (id, t) => id -> (grams(t) & benchGrams).size.toLong }
      .filter(_._2 >= 1).toMap
    val got = TrainingPipeline.decontaminate(
      docs(corpusDocs: _*), docs(benchDocs: _*), n = n).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(got == expected)
  }

  test("packSequences conserves docs and tokens; pack ids are non-decreasing per source") {
    import spark.implicits._
    val rnd = new scala.util.Random(44)
    val d = (1 to 60).map { i =>
      val nTok = 1 + rnd.nextInt(40)
      (i.toLong, Seq.fill(nTok)("t").mkString(" "), s"src${i % 3}")
    }.toDF("doc_id", "text", "source")
    val r = TrainingPipeline.packSequences(d, budget = 50L).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.map(_._3).sum == 60) // every doc lands in exactly one pack
    assert(r.map(_._4).sum == // token totals preserved
      d.collect().map(_.getString(1).split(" ").length.toLong).sum)
    r.groupBy(_._1).foreach { case (_, packs) =>
      val ids = packs.map(_._2).sorted
      assert(ids.head == 0L) // first pack starts at 0
      assert(ids.distinct.length == ids.length)
    }
  }

  test("weightedSystematicSample on random weights: between 1 and k picks per source") {
    import spark.implicits._
    val rnd = new scala.util.Random(45)
    val d = (1 to 80).map(i =>
      (i.toLong, "t", s"src${i % 4}", 1L + rnd.nextInt(500)))
      .toDF("doc_id", "text", "source", "n_chars")
    val k = 6
    val bySource = TrainingPipeline.weightedSystematicSample(d, "n_chars", k)
      .collect().groupBy(_.getString(0)).view.mapValues(_.length)
    assert(bySource.size == 4)
    bySource.foreach { case (src, cnt) =>
      assert(cnt >= 1 && cnt <= k, s"$src picked $cnt of k=$k")
    }
  }

  test("weightedSystematicSample ignores negative weights (monotonic axis)") {
    import spark.implicits._
    // a negative weight would make the cumulative axis non-monotonic and
    // let the mark-crossing predicate double-select; the guard drops it
    val d = Seq((1L, "t", "s", 10L), (2L, "t", "s", -50L), (3L, "t", "s", 10L))
      .toDF("doc_id", "text", "source", "n_chars")
    val r = TrainingPipeline.weightedSystematicSample(d, "n_chars", perSourceK = 2)
      .collect().map(x => (x.getLong(1), x.getLong(2)))
    assert(!r.exists(_._1 == 2L))          // negative-weight doc never kept
    assert(r.map(_._1).distinct.length == r.length) // no duplicate picks
    assert(r.nonEmpty && r.length <= 2)
  }

  test("weightedSystematicSample never drops a small source (ceil step)") {
    import spark.implicits._
    // total weight 3 < k=5: floor-division step would be 0 and silently
    // drop the whole source; ceil step keeps every doc
    val d = Seq((1L, "t", "s", 1L), (2L, "t", "s", 1L), (3L, "t", "s", 1L))
      .toDF("doc_id", "text", "source", "n_chars")
    val r = TrainingPipeline.weightedSystematicSample(d, "n_chars", perSourceK = 5)
    assert(r.count() == 3)
    // a source barely above k still yields <= k picks, not `tot`
    val d2 = (1 to 11).map(i => (i.toLong, "t", "s", 1L))
      .toDF("doc_id", "text", "source", "n_chars")
    val n2 = TrainingPipeline.weightedSystematicSample(d2, "n_chars", perSourceK = 6)
      .count()
    assert(n2 >= 1 && n2 <= 6, s"got $n2 picks for k=6")
    // an all-zero-weight source yields nothing but must not divide by
    // zero (ANSI mode throws on DIV 0)
    val d3 = Seq((1L, "t", "s", 0L), (2L, "t", "s", 0L))
      .toDF("doc_id", "text", "source", "n_chars")
    assert(TrainingPipeline.weightedSystematicSample(d3, "n_chars", 5).count() == 0)
  }

  test("sourceQuota caps per source deterministically") {
    import spark.implicits._
    val d = (1 to 30).map(i => (i.toLong, s"text $i", s"src${i % 2}"))
      .toDF("doc_id", "text", "source")
    val r1 = TrainingPipeline.sourceQuota(d, cap = 5).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(r1.groupBy(_._1).forall(_._2.length == 5))
    val r2 = TrainingPipeline.sourceQuota(d, cap = 5).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(r1.toSet == r2.toSet)
  }

  test("temperatureMixture: sqrt allocation, min-1 clamp, deterministic") {
    import spark.implicits._
    // sizes 100 / 9 / 1 -> w = 10 / 3 / 1, sum 14; K = 10 ->
    // k = max(1, 100/14)=7, max(1, 30/14)=2, max(1, 10/14)=1
    val d = ((1 to 100).map(i => (i.toLong, s"a $i", "big")) ++
      (101 to 109).map(i => (i.toLong, s"b $i", "mid")) ++
      Seq((110L, "c solo", "tiny")))
      .toDF("doc_id", "text", "source")
    val r = TrainingPipeline.temperatureMixture(d, 10).collect()
      .map(x => (x.getString(0), x.getLong(1)))
    val bySource = r.groupBy(_._1).view.mapValues(_.length).toMap
    assert(bySource == Map("big" -> 7, "mid" -> 2, "tiny" -> 1))
    // deterministic: identical pick set on a rerun
    val r2 = TrainingPipeline.temperatureMixture(d, 10).collect()
      .map(x => (x.getString(0), x.getLong(1)))
    assert(r.toSet == r2.toSet)
  }

  test("sourceComposition: entropy and KL match hand computation") {
    import spark.implicits._
    // source A: 2 en + 2 fr (uniform -> H = ln 2); source B: 4 en
    // (H = 0). Corpus: 6 en, 2 fr -> q_en = 0.75, q_fr = 0.25.
    // KL(A) = .5 ln(.5/.75) + .5 ln(.5/.25); KL(B) = ln(1/0.75)
    val d = Seq(
      (1L, "x", "en", "A"), (2L, "x", "en", "A"),
      (3L, "x", "fr", "A"), (4L, "x", "fr", "A"),
      (5L, "x", "en", "B"), (6L, "x", "en", "B"),
      (7L, "x", "en", "B"), (8L, "x", "en", "B"))
      .toDF("doc_id", "text", "lang", "source")
    val r = TrainingPipeline.sourceComposition(d).collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getDouble(2), x.getDouble(3)))).toMap
    def r4(v: Double) = BigDecimal(v).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r("A") == ((4L, r4(math.log(2)),
      r4(0.5 * math.log(0.5 / 0.75) + 0.5 * math.log(0.5 / 0.25)))))
    assert(r("B") == ((4L, 0.0, r4(math.log(1 / 0.75)))))
  }
}
