package graft.jobs

import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.collection.mutable
import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.SparkSession

/** Job orchestration surface — the reference's scheduler/runner
  * (/root/reference/scheduler.py), re-expressed as a typed ADT + a small
  * driver-side runner. Spark replaces every distributed concern (phases,
  * retries, shuffle); what remains is exactly what the reference's
  * ~400 scheduler lines do: a persistent priority queue with three job
  * types and group-failure semantics.
  *
  * Semantics preserved:
  *  - three job types: mapreduce / script / file_transfer
  *    (/root/reference/scheduler.py:63-69);
  *  - priority DESCENDING, ties FIFO (/root/reference/scheduler.py:429);
  *  - `runOnce` deletes the job after success
  *    (/root/reference/scheduler.py:44-57);
  *  - `forceRun` re-runs already-finished jobs
  *    (/root/reference/scheduler.py:449-467);
  *  - a failure cascade-deletes every job sharing `groupName` so
  *    dependents never run on missing inputs
  *    (/root/reference/scheduler.py:386-397,461);
  *  - per-job runtimes retained (last 50,
  *    /root/reference/scheduler.py:469-494).
  */
sealed trait JobSpec {
  def name: String
  def priority: Int
  def groupName: Option[String]
  def runOnce: Boolean
}

/** A Spark job: any driver program against the session. */
final case class SparkJob(
    name: String,
    run: SparkSession => Unit,
    priority: Int = 0,
    groupName: Option[String] = None,
    runOnce: Boolean = false) extends JobSpec

/** The reference's `script` job — run a local subprocess, success = exit 0
  * (/root/reference/scheduler.py:106-125). */
final case class ScriptJob(
    name: String,
    command: Seq[String],
    priority: Int = 0,
    groupName: Option[String] = None,
    runOnce: Boolean = false) extends JobSpec

/** The reference's `file_transfer` job family
  * (/root/reference/scheduler.py:127-171) over the Hadoop FileSystem API
  * (local fs here; any HDFS/S3A URI on a cluster). */
final case class TransferJob(
    name: String,
    transferType: TransferType,
    src: String,
    dst: String,
    priority: Int = 0,
    groupName: Option[String] = None,
    runOnce: Boolean = false) extends JobSpec

sealed trait TransferType
object TransferType {
  case object Copy extends TransferType       // upload / download
  case object Delete extends TransferType
  case object Auxiliary extends TransferType  // upload_auxiliary: stage broadcast data
}

/** `etaSeconds` is the queue's PRE-RUN estimate for this execution
  * (median of recent recorded runtimes — [[JobQueue.estimateRuntime]]),
  * None on a job's first run. Surfacing prediction next to actual is
  * what makes the estimator auditable. */
final case class JobResult(name: String, ok: Boolean, seconds: Double,
    error: Option[String], etaSeconds: Option[Double] = None)

/** Persistent priority queue + runner. The finished-set survives restarts
  * via a JSON-lines journal, like JOBS.data under flock
  * (/root/reference/scheduler.py:586-600) — single-writer here, the
  * driver. Job BODIES are closures and cannot be journaled: on restart
  * the caller resubmits its job definitions and any job the journal
  * recorded as finished is re-marked finished (so it is skipped unless
  * `forceRun`), which is the same contract the reference's scheduler
  * gives restarted runners.
  */
final class JobQueue(stateFile: Option[String] = None) {

  private case class Entry(job: JobSpec, seq: Long)
  private val entries = mutable.ArrayBuffer.empty[Entry]
  private val finished = mutable.Set.empty[String]
  private val failed = mutable.ArrayBuffer.empty[JobResult]
  private val runtimes = mutable.Map.empty[String, mutable.ArrayBuffer[Double]]
  private var seqCounter = 0L

  // restore: names the journal recorded as finished in a previous
  // process; applied when the job is resubmitted
  private val journaledFinished: Set[String] = stateFile match {
    case Some(f) if Files.exists(Paths.get(f)) =>
      val nameRe = """"name":"((?:[^"\\]|\\.)*)"""".r
      val finRe = """"finished":(true|false)""".r
      scala.jdk.CollectionConverters.ListHasAsScala(
        Files.readAllLines(Paths.get(f))).asScala
        .flatMap { line =>
          for {
            nm <- nameRe.findFirstMatchIn(line).map(m => JobQueue.unescape(m.group(1)))
            fin <- finRe.findFirstMatchIn(line).map(_.group(1) == "true")
            if fin
          } yield nm
        }.toSet
    case _ => Set.empty
  }

  def submit(job: JobSpec): Unit = synchronized {
    require(!entries.exists(_.job.name == job.name), s"duplicate job ${job.name}")
    entries += Entry(job, { seqCounter += 1; seqCounter })
    if (journaledFinished.contains(job.name)) finished += job.name
    persist()
  }

  def jobs: Seq[JobSpec] = synchronized(ordered.map(_.job))
  def finishedJobs: Set[String] = synchronized(finished.toSet)
  def failures: Seq[JobResult] = synchronized(failed.toSeq)
  def runtimeHistory(name: String): Seq[Double] =
    synchronized(runtimes.getOrElse(name, Nil).toSeq)

  /** Next-run ETA: median of the job's last `k` recorded runtimes
    * (reference analogue: the scheduler's runtime-estimation surface,
    * /root/reference/scheduler.py:603-708 — carried there as dead code;
    * live here). Median, not mean: one straggler run (GC pause, cold
    * cache) must not poison the estimate. None until the job has run
    * at least once. */
  def estimateRuntime(name: String, k: Int = 5): Option[Double] =
    synchronized {
      val h = runtimes.getOrElse(name, Nil).takeRight(k).toSeq.sorted
      if (h.isEmpty) None
      else if (h.size % 2 == 1) Some(h(h.size / 2))
      else Some((h(h.size / 2 - 1) + h(h.size / 2)) / 2)
    }

  /** Priority desc, then submission order (ties FIFO). */
  private def ordered: Seq[Entry] =
    entries.sortBy(e => (-e.job.priority, e.seq)).toSeq

  private def nextRunnable(forceRun: Boolean, skip: collection.Set[String]): Option[Entry] =
    ordered.find(e => !skip.contains(e.job.name) &&
      (forceRun || !finished.contains(e.job.name)))

  /** Run all runnable jobs to completion, highest priority first —
    * the Runner loop (/root/reference/scheduler.py:30-57). */
  def runAll(spark: SparkSession, forceRun: Boolean = false): Seq[JobResult] = {
    val results = mutable.ArrayBuffer.empty[JobResult]
    val ranThisPass = mutable.Set.empty[String]
    var next = synchronized(nextRunnable(forceRun, ranThisPass))
    while (next.isDefined) {
      val entry = next.get
      ranThisPass += entry.job.name
      val eta = estimateRuntime(entry.job.name) // pre-run, from history only
      val t0 = System.nanoTime()
      val outcome = Try(execute(spark, entry.job))
      val secs = (System.nanoTime() - t0) / 1e9
      val res = outcome match {
        case Success(_) =>
          JobResult(entry.job.name, ok = true, secs, None, eta)
        case Failure(e) => JobResult(entry.job.name, ok = false, secs,
          Some(e.getMessage), eta)
      }
      results += res
      synchronized {
        val hist = runtimes.getOrElseUpdate(entry.job.name,
          mutable.ArrayBuffer.empty)
        hist += secs
        if (hist.size > 50) hist.dropInPlace(hist.size - 50) // keep last 50
        if (res.ok) {
          finished += entry.job.name
          if (entry.job.runOnce) entries.filterInPlace(_.job.name != entry.job.name)
        } else {
          failed += res
          // cascade: drop the whole group so dependents never run
          entry.job.groupName match {
            case Some(g) => entries.filterInPlace(_.job.groupName != Some(g))
            case None => entries.filterInPlace(_.job.name != entry.job.name)
          }
        }
        persist()
        next = nextRunnable(forceRun, ranThisPass)
      }
    }
    results.toSeq
  }

  private def execute(spark: SparkSession, job: JobSpec): Unit = job match {
    case SparkJob(_, run, _, _, _) => run(spark)
    case ScriptJob(name, cmd, _, _, _) =>
      import scala.sys.process._
      val code = Process(cmd).!
      if (code != 0) throw new RuntimeException(s"script $name exited $code")
    case TransferJob(_, tt, src, dst, _, _, _) =>
      val conf = spark.sparkContext.hadoopConfiguration
      val srcPath = new org.apache.hadoop.fs.Path(src)
      val fs = srcPath.getFileSystem(conf)
      tt match {
        case TransferType.Copy | TransferType.Auxiliary =>
          val dstPath = new org.apache.hadoop.fs.Path(dst)
          org.apache.hadoop.fs.FileUtil.copy(
            fs, srcPath, dstPath.getFileSystem(conf), dstPath,
            false, conf)
        case TransferType.Delete =>
          fs.delete(srcPath, true)
      }
  }

  /** Journal queue metadata (not closures) as JSON lines. Names and
    * groups are JSON-escaped — a quote in a job name must not corrupt
    * the journal. */
  private def persist(): Unit = stateFile.foreach { f =>
    import JobQueue.escape
    val lines = ordered.map { e =>
      val g = e.job.groupName
        .map(s => "\"" + escape(s) + "\"").getOrElse("null")
      s"""{"name":"${escape(e.job.name)}","priority":${e.job.priority},"group":$g,""" +
        s""""runOnce":${e.job.runOnce},"finished":${finished.contains(e.job.name)}}"""
    }
    Files.write(Paths.get(f), lines.mkString("\n").getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }
}

object JobQueue {
  private[jobs] def escape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private[jobs] def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"'  => sb += '"'; i += 2
          case '\\' => sb += '\\'; i += 2
          case 'n'  => sb += '\n'; i += 2
          case 'r'  => sb += '\r'; i += 2
          case 't'  => sb += '\t'; i += 2
          case 'u' if i + 6 <= s.length =>
            sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
            i += 6
          case other => sb += other; i += 2
        }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }
}
