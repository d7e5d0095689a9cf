package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.engine.Materialize

/** The Materialize contract, asserted: a loop operator leaves NOTHING in
  * the block manager beyond its own (caller-owned, checkpoint-backed)
  * result — no corpus-scale cache, no superseded round checkpoint — and
  * `Materialize.free(result)` releases the rest, leaving
  * `getPersistentRDDs` exactly where it started.
  *
  * This is the round-8 VERDICT/ADVICE leak class: kCoreLoop's final-round
  * caches, pcLoop's comp/centered, bigramLmScore's stream, lpaLoop's
  * edge frame — all previously masked by Verify/Bench's per-query
  * clearCache and invisible to `sbt test` until this spec.
  */
class CacheHygieneSpec extends SparkSpec {
  import spark.implicits._

  private def edges: DataFrame =
    Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (5L, 3L),
        (6L, 1L), (2L, 6L))
      .toDF("src", "dst")

  private def wedges: DataFrame =
    edges.withColumn("w", org.apache.spark.sql.functions.lit(2L))

  private def docs: DataFrame =
    Seq((1L, "the cat sat on the mat"), (2L, "the cat sat on a hat"),
        (3L, "dogs bark at the moon all night"), (4L, "the cat sat"),
        (5L, "moon night moon night moon"))
      .toDF("doc_id", "text")

  private def vecs: DataFrame = {
    val dim = 64
    (0L until 12L).map { id =>
      (id, Array.tabulate(dim)(i => ((id * 31 + i * 7) % 13 - 6).toFloat))
    }.toDF("vec_id", "embedding")
  }

  /** Run `op`, force an action, free the result; assert the persistent-RDD
    * set returns to its starting state. */
  private def assertClean(label: String)(op: => DataFrame): Unit = {
    val sc = spark.sparkContext
    // isolate from anything a prior suite left behind
    spark.catalog.clearCache()
    sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    val before = sc.getPersistentRDDs.keySet
    val result = op
    result.count() // the operator's action
    val afterAction = sc.getPersistentRDDs.keySet -- before
    Materialize.free(result)
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"$label leaked persistent RDDs $leaked (held after free(result); " +
        s"after action alone: $afterAction)")
  }

  test("pageRank frees internal caches; free(result) releases the rest") {
    assertClean("pageRank")(Graph.pageRank(edges, iters = 7))
  }

  test("debug mode: freeing a frame whose checkpoint blocks another " +
      "live adopted frame references fails LOUDLY, not as a silent " +
      "downstream recompute") {
    System.setProperty(Materialize.DebugProperty, "true")
    try {
      // contract misuse: two adopted results sharing one checkpointed
      // input — freeing either would strip the other's blocks
      val base = edges.localCheckpoint()
      val a = Materialize.adopt(base.filter($"src" < 4L), Seq(base))
      val b = Materialize.adopt(base.filter($"src" >= 4L), Seq(base))
      b.count()
      val ex = intercept[IllegalStateException](Materialize.free(a))
      assert(ex.getMessage.contains("still referenced"),
        s"wrong failure: ${ex.getMessage}")
      // the guard is symmetric and nothing was unpersisted: the other
      // frame's blocks are intact
      intercept[IllegalStateException](Materialize.free(b))
      assert(b.count() == 3)
      // the legitimate composition: ONE outer owner adopts both — its
      // free covers the whole closure, no false positive among the
      // siblings it is releasing
      val outer = Materialize.adopt(a.unionByName(b), Seq(a, b))
      Materialize.free(outer)
      // and non-shared adopted frames never trip the assert
      val base2 = edges.localCheckpoint()
      val solo = Materialize.adopt(base2.select($"src"), Seq(base2))
      solo.count()
      Materialize.free(solo)
    } finally System.clearProperty(Materialize.DebugProperty)
  }

  test("personalizedPageRank is hygienic") {
    assertClean("personalizedPageRank")(
      Graph.personalizedPageRank(edges, Seq(1L).toDF("node"), iters = 6))
  }

  test("weightedPageRank is hygienic") {
    assertClean("weightedPageRank")(Graph.weightedPageRank(wedges, iters = 6))
  }

  test("labelPropagation frees the cached edge frame") {
    assertClean("labelPropagation")(Graph.labelPropagation(edges, iters = 7))
  }

  test("weightedLabelPropagation is hygienic") {
    assertClean("weightedLabelPropagation")(
      Graph.weightedLabelPropagation(wedges, iters = 6))
  }

  test("khopDistances frees pending round frames and the edge cache") {
    assertClean("khopDistances")(
      Graph.khopDistances(edges, Seq(1L).toDF("node"), maxHops = 7))
  }

  test("kCore frees final-round keep/edge caches (the r8 VERDICT leak)") {
    assertClean("kCore")(Graph.kCore(edges, k = 2, rounds = 5))
  }

  test("weightedKCore is hygienic") {
    assertClean("weightedKCore")(
      Graph.weightedKCore(wedges, minStrength = 4.0, rounds = 4))
  }

  test("triangleCount frees the oriented-edge cache") {
    assertClean("triangleCount")(Graph.triangleCount(edges))
  }

  test("connectedComponents frees edge checkpoints and superseded labels") {
    assertClean("connectedComponents")(
      Dedup.connectedComponents(
        Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id1", "id2")))
  }

  test("topPrincipalComponent frees comp and the centered frame") {
    assertClean("topPrincipalComponent")(
      Similarity.topPrincipalComponent(vecs, iters = 3))
  }

  test("pcaOutliers frees the shared centered frame (the r8 ADVICE leak)") {
    assertClean("pcaOutliers")(Similarity.pcaOutliers(vecs, iters = 3, topN = 5))
  }

  test("bigramLmScore frees the token stream cache (the r8 VERDICT leak)") {
    assertClean("bigramLmScore")(TextAnalysis.bigramLmScore(docs))
  }

  test("bigramPmi frees the counts cache") {
    assertClean("bigramPmi")(
      TextAnalysis.bigramPmi(docs, minCount = 1L, topK = 10))
  }

  test("associationRules frees the basket-item checkpoint (q192 fix)") {
    assertClean("associationRules")(
      Basket.associationRules(
        Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (3L, 12L))
          .toDF("b", "i"),
        org.apache.spark.sql.functions.col("b"),
        org.apache.spark.sql.functions.col("i"),
        minSupport = 1L))
  }

  test("minhashLshPairs: free(result) releases the adopted shingle/" +
      "band/candidate caches") {
    assertClean("minhashLshPairs")(
      Dedup.minhashLshPairs(docs, threshold = 0.5))
  }

  test("jaccardPrefixPairs adopted caches release via free(result)") {
    assertClean("jaccardPrefixPairs")(
      Dedup.jaccardPrefixPairs(docs, threshold = 0.5))
  }

  test("simhashPairs / containmentPairs / spanDedup are adopt-hygienic") {
    assertClean("simhashPairs")(Dedup.simhashPairs(docs))
    assertClean("containmentPairs")(Dedup.containmentPairs(docs, 0.6))
    assertClean("spanDedup")(Dedup.spanDedup(docs, w = 3))
  }

  test("dropNearDuplicates chains the inner operator's adopted caches") {
    assertClean("dropNearDuplicates")(
      Dedup.dropNearDuplicates(docs, threshold = 0.5))
  }

  test("kmeansClusters adopted vector cache releases via free(result)") {
    assertClean("kmeansClusters")(
      Similarity.kmeansClusters(vecs, k = 3, iters = 2))
  }

  test("keySkewProfile adopted counts cache releases via free(result)") {
    assertClean("keySkewProfile")(
      SkewJoin.keySkewProfile(edges, "src"))
  }

  test("bpeMerges frees every round frame including mid-loop checkpoints") {
    val sc = spark.sparkContext
    spark.catalog.clearCache()
    sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    val before = sc.getPersistentRDDs.keySet
    // result is a driver-local merge table — no free(result) step needed
    TextAnalysis.bpeMerges(docs, nMerges = 7).count()
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"bpeMerges leaked persistent RDDs $leaked")
  }
}
