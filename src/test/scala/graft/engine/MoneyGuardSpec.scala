package graft.engine

import org.apache.spark.sql.functions.{col, round}

import graft.SparkSpec

/** Pins the round-13 money-sum representation switch: footer-only row
  * counting, the overflow-ceiling arithmetic, the promotion decision,
  * and value parity between the two representations. */
class MoneyGuardSpec extends SparkSpec {

  test("tableRows reads the exact count from footers only") {
    val dir = "/root/testdata/sf0.001"
    val expected = spark.read.parquet(s"$dir/orders.parquet").count()
    assert(MoneyGuard.tableRows(dir, "orders") == expected)
  }

  test("tableRows sums part files in a directory layout") {
    import spark.implicits._
    val out = s"${sys.props("java.io.tmpdir")}/graft_moneyguard_${System.nanoTime()}"
    (1L to 1000L).toDF("v").repartition(4)
      .write.parquet(s"$out/t.parquet")
    try assert(MoneyGuard.tableRows(out, "t") == 1000L)
    finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
      }
      rm(new java.io.File(out))
    }
  }

  test("ceiling arithmetic: rows x maxAbs x unit must fit a long") {
    // micro-units at 200k currency: 2e11 per row
    val c = MoneyGuard.integerUnitCeiling(1000000, 200000.0)
    assert(c == Long.MaxValue / 200000000000L)
    // the ceiling row count is safe, one past it is not
    assert(BigInt(c) * 200000000000L <= BigInt(Long.MaxValue))
    assert(BigInt(c + 1) * 200000000000L > BigInt(Long.MaxValue))
  }

  test("promotion decision: long shape under the ceiling, decimal past it") {
    val ceiling = MoneyGuard.integerUnitCeiling(1000000, 200000.0)
    val under = MoneyGuard.moneySum(col("v"), 1000000, ceiling, 200000.0)
    val over = MoneyGuard.moneySum(col("v"), 1000000, ceiling + 1, 200000.0)
    assert(under.toString.toLowerCase.contains("bigint"),
      s"under-ceiling shape must sum longs: $under")
    assert(over.toString.toLowerCase.contains("decimal(38,6)"),
      s"over-ceiling shape must sum DECIMAL(38,6): $over")
  }

  test("both representations agree to 4dp on grid-valued money") {
    import spark.implicits._
    val df = (0 until 5000).map(i => (i % 7, (i * 137 % 99991) / 100.0))
      .toDF("g", "v")
    def run(rows: Long) = df.groupBy($"g")
      .agg(round(MoneyGuard.moneySum($"v", 100, rows, 1000.0), 4).as("t"))
      .orderBy($"g").collect().map(_.getDouble(1)).toSeq
    val fast = run(rows = 1) // forces the long shape
    val slow = run(rows = Long.MaxValue) // forces the decimal shape
    assert(fast == slow)
  }
}
