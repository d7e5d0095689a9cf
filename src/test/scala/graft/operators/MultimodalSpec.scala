package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("frameSample: empty payloads emit no frames; stride keeps every Nth") {
    import spark.implicits._
    val media = Seq((1L, ""), (2L, "a" * 100)).toDF("doc_id", "t")
      .select($"doc_id", $"t".cast("binary").as("media"))
    val r = Multimodal.frameSample(media, frameBytes = 32, stride = 3).collect()
    // empty doc: no bogus zero-length frame (int division truncation trap)
    assert(!r.exists(_.getLong(0) == 1L))
    // 100 bytes -> frame idxs 0..3, stride 3 keeps 0 and 3
    val kept = r.filter(_.getLong(0) == 2L)
    assert(kept.map(_.getLong(1)).toSet == Set(0L, 3L))
    assert(kept.find(_.getLong(1) == 0L).get.getString(2) == "a" * 32)
    assert(kept.find(_.getLong(1) == 3L).get.getString(2) == "a" * 4)
  }
}
