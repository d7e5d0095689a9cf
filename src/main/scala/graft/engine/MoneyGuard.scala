package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, round, sum}

/** Money-sum representation switch — round-13 ENFORCEMENT of the
  * SCALING.md integer-unit ceiling.
  *
  * The exact-money discipline (see q01) sums integer sub-units in a
  * codegen'd long — the fast shape — but a long sum has a capacity:
  * rows × maxAbs × unit must stay under 2⁶³. Through round 12 that
  * ceiling was measured and DOCUMENTED (micro-units certify to ~sf30);
  * past it the sums would wrap silently. This guard makes the switch
  * automatic: the row count comes from parquet FOOTERS only (metadata
  * plane — one O(footer) tail read per file, the file bodies are never
  * touched), and a query promotes to the q332 DECIMAL(38,6) path the
  * moment the worst-case accumulated magnitude could overflow.
  *
  * The bound is deliberately per-TABLE, not per-group: it assumes
  * nothing about how rows distribute over groups, so promotion fires
  * strictly BEFORE any possible per-group overflow (the measured
  * per-group ceiling sits well above the guard's promotion point).
  * Early promotion costs only speed, never correctness — both
  * representations are exact on grid-valued money inputs.
  *
  * Reference analogue: the incrementation law's exactness contract
  * (README.md's f(A+B)=f(A)+f(B)) — a sum that silently wraps breaks
  * the law invisibly.
  */
object MoneyGuard {

  private def footerRows(path: String): Long =
    graft.operators.ParquetFooter.readFooter(path)
      .flatMap(graft.operators.ParquetFooter.parseFooter)
      .map(_.numRows)
      .getOrElse(throw new IllegalStateException(
        s"unreadable parquet footer: $path"))

  /** Exact row count for `dir/table.parquet` from parquet footers
    * only. Single files and part-file directories both resolve; an
    * unreadable footer throws (a guard that silently under-counts
    * would defeat its purpose). Small layouts read on the driver; a
    * many-file table (the 100 TB shape) distributes the footer reads
    * so the guard never becomes a sequential driver stall. */
  def tableRows(dir: String, table: String): Long =
    tableRows(None, dir, table)

  def tableRows(spark: Option[org.apache.spark.sql.SparkSession],
      dir: String, table: String): Long = {
    val base = new java.io.File(s"$dir/$table.parquet")
    def collect(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(collect)
      else if (f.getName.endsWith(".parquet")) Seq(f)
      else Seq.empty
    val files = collect(base)
    require(files.nonEmpty, s"no parquet files under $base")
    spark match {
      case Some(s) if files.size > 64 =>
        val paths = files.map(_.getPath)
        s.sparkContext.parallelize(paths, math.min(paths.size, 256))
          .map(footerRows).sum().toLong
      case _ => files.map(f => footerRows(f.getPath)).sum
    }
  }

  /** Highest row count at which a `unit`-scaled long sum of values
    * bounded by `maxAbsCurrency` provably cannot overflow. */
  def integerUnitCeiling(unit: Long, maxAbsCurrency: Double): Long =
    Long.MaxValue / math.ceil(maxAbsCurrency * unit).toLong

  /** An exact money sum of `c` (currency units, values on the 1/unit
    * grid, |value| ≤ maxAbsCurrency): integer sub-units while `rows`
    * is under the overflow ceiling, DECIMAL(38,6) beyond. Returns the
    * sum in currency units (a double column), exact in both shapes. */
  def moneySum(c: Column, unit: Long, rows: Long,
      maxAbsCurrency: Double): Column =
    if (rows <= integerUnitCeiling(unit, maxAbsCurrency))
      sum(round(c * unit).cast("long")) / lit(unit.toDouble)
    else
      sum(c.cast("decimal(38,6)")).cast("double")
}
