package graft.operators

import graft.SparkSpec

/** The fixture contract (q179) gates aggregate recall on near-uniform
  * vectors; these pin the sharper laws on structured data: PQ with
  * enough codebook resolution recovers clustered neighborhoods exactly,
  * and the whole pipeline (train + encode + ADC + re-rank) is
  * deterministic across runs. */
class PqSpec extends SparkSpec {

  // 48 vectors in 4 well-separated clusters (cluster = id % 4, center
  // c*10 in every dim, per-vector jitter 1e-3·rank — so the 4 probes
  // vec_id 0..3 each sit in a different cluster)
  private def clustered() = {
    import spark.implicits._
    (0 until 48).map { id =>
      val c = id % 4
      val jitter = (id / 4) * 0.001f
      (id.toLong, Array.fill(8)(c * 10.0f + jitter))
    }.toDF("vec_id", "embedding")
  }

  test("clustered data: shortlist+re-rank recovers exact top-5 fully") {
    val r = Similarity.pqProbeRecalls(clustered(),
      m = 2, k = 4, iters = 3, nProbes = 4, topK = 5, shortlistK = 10)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(r.keySet == Set(0L, 1L, 2L, 3L))
    assert(r.values.forall(_ == 5L), s"expected 5/5 per probe, got $r")
  }

  test("pipeline is deterministic: two runs produce identical recalls") {
    def run() = Similarity.pqProbeRecalls(clustered(),
      m = 2, k = 4, iters = 2, nProbes = 4, topK = 5, shortlistK = 8)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSortedSet
    assert(run() == run())
  }

  private implicit class ToSortedSet(a: Array[(Long, Long)]) {
    def toSortedSet: Seq[(Long, Long)] = a.toSeq.sorted
  }
}
