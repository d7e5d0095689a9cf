package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Jaro–Winkler string similarity (public
  * algorithm, Winkler 1990; the record-linkage standard the [[graft.
  * operators.Linkage]] family's edit-distance misses — JW weighs
  * agreeing PREFIXES, the signal in names/titles, and is O(n·m) with a
  * banded match window instead of the full DP table).
  *
  * Why a custom Expression (SURVEY.md §4 candidate (b)): no Spark
  * builtin exists; a UDF would box two strings per row and break the
  * WholeStageCodegen span. This expression stays inside codegen — the
  * generated code is one static call into [[JaroWinkler.compute]],
  * which runs on a zero-copy view of the UTF8String bytes for ASCII
  * input (no String decode per row) and on the decoded chars
  * otherwise, with two small scratch arrays either way.
  *
  * Variant pinned (and oracle-checked against DuckDB's
  * `jaro_winkler_similarity`): Jaro with floor(max/2)−1 match window;
  * Winkler prefix bonus p = 0.1 over a common prefix capped at 4,
  * applied ONLY when jaro > 0.7 (the boost threshold both DuckDB /
  * RapidFuzz and the original Winkler code use); any empty side
  * scores 0.0, both-empty included. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects (string, string), got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_winkler"
}

object JaroWinkler {

  /** Zero-copy char view over ASCII bytes — the fast path's input.
    * subSequence is never called by [[core]]. */
  private final class AsciiSeq(bytes: Array[Byte]) extends CharSequence {
    override def length(): Int = bytes.length
    override def charAt(i: Int): Char = (bytes(i) & 0x7f).toChar
    override def subSequence(a: Int, b: Int): CharSequence =
      throw new UnsupportedOperationException
    override def toString: String = new String(bytes, 0, bytes.length,
      java.nio.charset.StandardCharsets.US_ASCII)
  }

  /** Static entry the generated code calls. ASCII inputs (numChars ==
    * numBytes) run over the raw bytes with no String decode; non-ASCII
    * falls back to the decoded chars so the comparison unit is a
    * UTF-16 char either way. NOTE the byte-based oracle (DuckDB)
    * compares BYTES — agreement beyond ASCII is not claimed. */
  def compute(a: UTF8String, b: UTF8String): Double = {
    if (a.numBytes == a.numChars && b.numBytes == b.numChars)
      core(new AsciiSeq(a.getBytes), new AsciiSeq(b.getBytes))
    else core(a.toString, b.toString)
  }

  def computeStr(s1: String, s2: String): Double = core(s1, s2)

  /** The one algorithm body — both entry paths feed it, so the fast
    * path can never drift from the reference path. */
  private def core(s1: CharSequence, s2: CharSequence): Double = {
    val n1 = s1.length
    val n2 = s2.length
    // any empty side scores 0.0 — including BOTH empty (the DuckDB /
    // reference-implementation convention this expression is pinned to;
    // some libraries score two empties 1.0)
    if (n1 == 0 || n2 == 0) return 0.0
    val window = math.max(math.max(n1, n2) / 2 - 1, 0)
    val m1 = new Array[Boolean](n1)
    val m2 = new Array[Boolean](n2)
    // match pass: each s2 char may match at most one s1 char, scanned
    // left to right within the banded window
    var matches = 0
    var i = 0
    while (i < n1) {
      val from = math.max(0, i - window)
      val until = math.min(n2, i + window + 1)
      var j = from
      var done = false
      while (j < until && !done) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transposition pass: matched chars compared in order
    var t = 0
    var k = 0
    i = 0
    while (i < n1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / n1 + m / n2 + (m - t / 2.0) / m) / 3.0
    // Winkler prefix bonus, boost-threshold variant
    if (jaro <= 0.7) return jaro
    var l = 0
    val cap = math.min(4, math.min(n1, n2))
    while (l < cap && s1.charAt(l) == s2.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  /** Register `jaro_winkler(a, b)` for SQL/expr() use on this session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler",
      exprs => {
        require(exprs.length == 2, "jaro_winkler takes exactly 2 arguments")
        JaroWinkler(exprs.head, exprs(1))
      },
      "built-in")
}
