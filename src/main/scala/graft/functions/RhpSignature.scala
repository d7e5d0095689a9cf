package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression: 8-bit random-hyperplane LSH signature of a
  * 64-dim numeric array — bit m is set iff dot(plane_m, v) >= 0.
  *
  * Why native (SURVEY.md §4 candidate (b)): the `functions._` formulation
  * — aggregate(zip_with(planes, sequence(...), ...)) over a typedLit
  * plane matrix — is interpreted per element AND re-materializes the
  * 8x64 literal per row; it breaks the WholeStageCodegen span exactly
  * like the interpreted cosine did (the measured 7.6x gap on q46). The
  * signature pass is THE linear scan of LSH indexing — at 100 TB it
  * touches every vector — so it gets the same fused-loop treatment as
  * [[CosineSimilarity]]: one pass, plane matrix shared as a reference
  * object, zero per-row allocation.
  *
  * The planes are deterministic md5-derived constants (component i of
  * plane m = (h60(md5("m_i")) % 2001 - 1000)/1000 ∈ [-1, 1]), identical
  * to what the DuckDB oracle replays (Similarity q47/q86/q98 oracles).
  * Null input, null elements, or length != 64 yield null.
  */
case class RhpSignature(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rhp_signature expects array<float|double>, got ${other.catalogString}")
    }

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != RhpSignature.Dim) return null
    val planes = RhpSignature.flatPlanes
    val isFloat = elemIsFloat
    var bucket = 0L
    var m = 0
    while (m < RhpSignature.Planes) {
      var dot = 0.0
      var i = 0
      while (i < RhpSignature.Dim) {
        if (v.isNullAt(i)) return null
        val x: Double = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        dot += planes(m * RhpSignature.Dim + i) * x
        i += 1
      }
      if (dot >= 0.0) bucket |= (1L << m)
      m += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val planesRef = ctx.addReferenceObj("rhpPlanes", RhpSignature.flatPlanes,
      "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val bucket = ctx.freshName("bucket")
      val bad = ctx.freshName("bad")
      s"""
        if ($v.numElements() != ${RhpSignature.Dim}) {
          ${ev.isNull} = true;
        } else {
          long $bucket = 0L;
          boolean $bad = false;
          for (int $m = 0; $m < ${RhpSignature.Planes} && !$bad; $m++) {
            double $dot = 0.0;
            for (int $i = 0; $i < ${RhpSignature.Dim}; $i++) {
              if ($v.isNullAt($i)) { $bad = true; break; }
              $dot += $planesRef[$m * ${RhpSignature.Dim} + $i]
                      * (double) $v.$get($i);
            }
            if ($dot >= 0.0) $bucket |= (1L << $m);
          }
          if ($bad) {
            ${ev.isNull} = true;
          } else {
            ${ev.value} = $bucket;
          }
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "rhp_signature"
}

object RhpSignature {
  val Planes = 8
  val Dim = 64

  /** Deterministic hyperplane matrix, row-major [m * Dim + i] — the same
    * md5 formula the DuckDB oracles interpolate, computed once per JVM. */
  lazy val flatPlanes: Array[Double] = {
    val out = new Array[Double](Planes * Dim)
    val md = java.security.MessageDigest.getInstance("MD5")
    var m = 0
    while (m < Planes) {
      var i = 0
      while (i < Dim) {
        md.reset()
        val hex = md.digest(s"${m}_$i".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(15)
        out(m * Dim + i) =
          ((java.lang.Long.parseLong(hex, 16) % 2001) - 1000) / 1000.0
        i += 1
      }
      m += 1
    }
    out
  }

  /** Register `rhp_signature(v)` for SQL/expr() use on this session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rhp_signature",
      exprs => {
        require(exprs.length == 1, "rhp_signature takes exactly 1 argument")
        RhpSignature(exprs.head)
      },
      "built-in")
}
