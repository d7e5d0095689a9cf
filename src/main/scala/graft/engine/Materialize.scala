package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic block-manager hygiene for iterative operators.
  *
  * The engine's loop operators (PageRank/LPA/k-hop/k-core/CC/power
  * iteration/bigram LM) share intermediates via `cache()` and truncate
  * lineage via `localCheckpoint()`. Both pin executor storage:
  * CacheManager entries for `cache()`, raw RDD blocks for
  * `localCheckpoint()` — and `Dataset.unpersist` releases ONLY the
  * former (it goes through CacheManager, which has never heard of the
  * checkpoint RDD). Left alone, a long-lived session calling these
  * operators as a library accumulates one corpus-scale frame per
  * call/round until the ContextCleaner happens to GC the references —
  * the leak the Verify/Bench per-query `clearCache` masked.
  *
  * Contract adopted by every loop operator (the "materialized result"
  * contract):
  *  1. the operator eagerly `localCheckpoint`s its FINAL, output-scale
  *     result,
  *  2. then calls [[free]] on every internal cache and superseded
  *     checkpoint before returning — nothing corpus-scale stays pinned,
  *  3. the caller owns the returned frame's (output-scale) blocks:
  *     release them with [[free]], or let the ContextCleaner reclaim
  *     them when the frame is garbage collected.
  *
  * Asserted per operator in `CacheHygieneSpec` via
  * `sparkContext.getPersistentRDDs`.
  */
object Materialize {

  /** Internal frames a LAZY-returning operator hands to its result's
    * owner (see [[adopt]]): freed when the caller frees the result.
    * Weak keys — once the caller drops the result frame, the entry
    * vanishes and the frames' RDD blocks become ContextCleaner-eligible
    * (CacheManager entries then live until clearCache, the documented
    * residual of the lazy variant). */
  private val adopted = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[Dataset[_], Seq[Dataset[_]]]())

  /** Debug-mode ownership tracking (see [[free]]'s CAVEAT): with
    * `-Dgraft.materialize.debug=true`, [[adopt]] records which
    * checkpoint-RDD ids each live owner pins, and [[free]] THROWS when
    * asked to release a block another live adopted frame still
    * references — contract misuse fails loudly at the free site
    * instead of surfacing later as a mysterious recompute (or a
    * wrong-looking slow plan) on the surviving frame. Off by default:
    * production free() stays check-free; tests opt in. */
  val DebugProperty = "graft.materialize.debug"
  private def debugEnabled: Boolean =
    java.lang.Boolean.getBoolean(DebugProperty)

  /** owner -> checkpoint-RDD ids it pins (weak keys: a dropped owner
    * stops asserting). */
  private val debugOwnership = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[Dataset[_], Set[Int]]())

  private def checkpointIds(df: Dataset[_]): Set[Int] = {
    val b = Set.newBuilder[Int]
    try df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => b += lr.rdd.id
      case _ => ()
    } catch { case scala.util.control.NonFatal(_) => () }
    b.result()
  }

  /** The LAZY variant of the contract, for operators where the eager
    * final checkpoint measurably breaks the fused pipeline (PageRank:
    * one action runs all rounds in one adaptive job; materializing the
    * result first measured 2-3x slower end-to-end). The result frame
    * stays lazy and still-pinned internals are REGISTERED against it:
    * [[free]](result) releases them deterministically, and Verify/Bench
    * style session hygiene (clearCache + unpersist-all) catches the
    * rest. */
  def adopt(owner: DataFrame, frames: Seq[Dataset[_]]): DataFrame = {
    adopted.put(owner, frames)
    if (debugEnabled)
      debugOwnership.put(owner,
        (checkpointIds(owner) ++ frames.flatMap(checkpointIds)))
    owner
  }

  /** Release every block backing `df`: its CacheManager entry (if it
    * was `cache()`d), any `localCheckpoint` RDDs in its plan, and any
    * [[adopt]]ed internal frames registered by the operator that
    * produced it.
    *
    * CAVEAT: the plan walk frees LogicalRDD blocks found ANYWHERE in
    * `df`'s tree — only call this on a frame whose checkpointed inputs
    * are not shared with another live frame (true for the operators'
    * internal intermediates, which is the intended use).
    */
  def free(df: Dataset[_]): Unit = {
    if (debugEnabled) debugCheckAndDeregister(df)
    // NonFatal only: swallowing OutOfMemoryError / InterruptedException
    // here would break thread interruption and hide fatal state
    try df.unpersist(blocking = false)
    catch { case scala.util.control.NonFatal(_) => () }
    try df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    } catch { case scala.util.control.NonFatal(_) => () }
    Option(adopted.remove(df)).foreach(_.foreach(free))
  }

  /** The debug-mode guard: everything `df` will release transitively
    * (its own plan's checkpoint RDDs plus those of its whole adoption
    * closure) must not intersect the blocks any OTHER live registered
    * owner pins. Throws BEFORE anything is unpersisted; on success the
    * closure is deregistered up front so sibling frames freed by the
    * recursion cannot false-positive against each other. */
  private def debugCheckAndDeregister(df: Dataset[_]): Unit = {
    val closure = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[Dataset[_], java.lang.Boolean]())
    def collect(d: Dataset[_]): Unit =
      if (closure.add(d))
        Option(adopted.get(d)).toSeq.flatten.foreach(collect)
    collect(df)
    import scala.jdk.CollectionConverters._
    val freeing = closure.asScala.flatMap(checkpointIds).toSet
    val owners = debugOwnership.synchronized {
      debugOwnership.asScala.toList
    }
    val conflicts = owners.collect {
      case (owner, ids) if !closure.contains(owner) &&
        ids.exists(freeing.contains) =>
        s"owner@${System.identityHashCode(owner).toHexString} pins RDD " +
          s"ids ${ids.intersect(freeing).toSeq.sorted.mkString(",")}"
    }
    if (conflicts.nonEmpty)
      throw new IllegalStateException(
        "Materialize.free would release checkpoint blocks still " +
          s"referenced by ${conflicts.size} other live adopted " +
          s"frame(s): ${conflicts.mkString("; ")} — free the owning " +
          "frame instead, or drop the other reference first " +
          s"(detected because -D$DebugProperty=true)")
    closure.asScala.foreach(debugOwnership.remove)
  }

  /** [[free]] over a batch, tolerating repeats. */
  def freeAll(dfs: Iterable[Dataset[_]]): Unit = dfs.foreach(free)

  /** Test-only tap (PlanAuditSpec): when set, [[handoff]] passes each
    * pre-checkpoint result frame to the callback BEFORE materializing
    * and freeing — the returned frame is a bare checkpoint scan, so a
    * post-hoc explain can no longer see the loop's real internal plan
    * (cached round frames, join strategies); the tap can, while the
    * caches are still registered. Never set outside tests. */
  @volatile private[graft] var auditTap: Option[DataFrame => Unit] = None

  /** Eagerly materialize `result` (localCheckpoint), then [[free]] the
    * superseded frames — the tail every loop operator shares. Returns
    * the checkpoint-backed frame the caller owns. */
  def handoff(result: DataFrame, superseded: Iterable[Dataset[_]]): DataFrame = {
    auditTap.foreach(f => f(result))
    val out = result.localCheckpoint()
    freeAll(superseded)
    out
  }
}
