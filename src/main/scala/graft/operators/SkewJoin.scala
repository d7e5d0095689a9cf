package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual fallback when AQE's runtime
  * skew splitting (enabled in GraftSession) isn't available or the skew
  * is known up front.
  *
  * The reference has no answer to skew at all: one hot key = one reducer
  * processing the whole group serially (its hash partitioner,
  * /root/reference/shuffler.py:71-77, sends every occurrence of a key to
  * one worker). Here the build side is exploded SALT ways and the probe
  * side picks a uniform salt, so a hot key's rows spread over SALT tasks.
  *
  * Cost model: replicates the RIGHT side SALT times — use when
  * |right| * SALT << |left partition skew|. At 100 TB with a hot fact key
  * and a dimension-ish right side this is the standard trade.
  */
object SkewJoin {

  /** Inner equi-join `left.leftKey == right.rightKey` with the left side's
    * skew spread over `salt` buckets. */
  def saltedInnerJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      salt: Int = 8): DataFrame = {
    require(salt > 0)
    // probe side: uniform per-row salt (any assignment is correct; a hash
    // of the row id spreads rows evenly without an RNG column)
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)))
    // build side: replicate each row across every salt bucket
    val saltedRight = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(salt - 1L))))
    saltedLeft
      .join(saltedRight,
        col(leftKey) === col(rightKey) &&
          saltedLeft("_salt") === saltedRight("_salt"))
      .drop("_salt")
  }
}
