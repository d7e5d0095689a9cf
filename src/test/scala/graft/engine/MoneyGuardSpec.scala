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
    assert(over.toString.toLowerCase.contains("decimal(38,0)"),
      s"over-ceiling shape must sum integer sub-units in DECIMAL(38,0): $over")
  }

  test("tableRows resolves an explicit file:// scheme via Hadoop FS") {
    val dir = "/root/testdata/sf0.001"
    val expected = spark.read.parquet(s"$dir/orders.parquet").count()
    assert(MoneyGuard.tableRows(s"file://$dir", "orders") == expected)
  }

  test("promoted shape is single-rounded past 2^53 sub-units") {
    import spark.implicits._
    // 600k rows x ~1.9e10 micro-units/row: S ~ 1.14e16 > 2^53, the
    // regime where summing CURRENCY decimals and casting would round
    // twice. The promoted shape must equal double(exact S)/unit.
    val n = 600000L
    val df = spark.range(n)
      .selectExpr("19000.0 + cast(id % 1000 as double) / 1e6 as v")
    val got = df.agg(
      MoneyGuard.moneySum($"v", 1000000L, Long.MaxValue, 20000.0).as("t"))
      .collect()(0).getDouble(0)
    val s = BigInt(19000000000L) * n + BigInt(499500L) * (n / 1000L)
    assert(got == s.toDouble / 1e6,
      s"promoted sum must be double(S)/unit: got $got, want ${s.toDouble / 1e6}")
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
