package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Builds its own session (withExtensions must be set at construction),
  * so it does not share SparkSpec's. getOrCreate() returns the existing
  * SparkContext but applies extensions to the new session. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("cosine_sim is injected session-wide via GraftExtensions") {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    val r = s.sql(
      "SELECT cosine_sim(array(1.0D, 2.0D), array(2.0D, 4.0D)) AS c")
      .collect().head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }
}
