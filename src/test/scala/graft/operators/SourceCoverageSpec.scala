package graft.operators

import java.nio.file.Files

import graft.SparkSpec

class SourceCoverageSpec extends SparkSpec {

  test("raw-text staging survives tabs and newlines embedded in text") {
    import spark.implicits._
    // a tab would truncate the parse at field 2; a newline would split one
    // doc across two lines — staging normalizes both to spaces
    val docs = Seq(
      (1L, "hello\tworld and\nmore"),
      (2L, "plain text here")).toDF("doc_id", "text")
    val staged = Files.createTempDirectory("graft_rawtext_").toString
    val r = SourceCoverage.rawTextTokenCounts(spark, docs, staged)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(r == Map(1L -> 4L, 2L -> 3L))
  }
}
