package graft.jobs

import java.nio.file.Files

import graft.SparkSpec

class JobsSpec extends SparkSpec {

  test("jobs run in priority-descending order, ties FIFO") {
    val q = new JobQueue()
    val order = scala.collection.mutable.ArrayBuffer.empty[String]
    def j(name: String, prio: Int) =
      SparkJob(name, _ => order += name, priority = prio)
    q.submit(j("low", 1))
    q.submit(j("high", 10))
    q.submit(j("mid-a", 5))
    q.submit(j("mid-b", 5))
    val res = q.runAll(spark)
    assert(order.toList == List("high", "mid-a", "mid-b", "low"))
    assert(res.forall(_.ok))
  }

  test("failure cascade-deletes the whole group; other groups continue") {
    val q = new JobQueue()
    val ran = scala.collection.mutable.ArrayBuffer.empty[String]
    q.submit(SparkJob("g1-boom", _ => throw new RuntimeException("boom"),
      priority = 10, groupName = Some("g1")))
    q.submit(SparkJob("g1-dependent", _ => ran += "g1-dependent",
      priority = 5, groupName = Some("g1")))
    q.submit(SparkJob("g2-ok", _ => ran += "g2-ok",
      priority = 1, groupName = Some("g2")))
    val res = q.runAll(spark)
    assert(ran.toList == List("g2-ok"))
    assert(q.failures.map(_.name) == Seq("g1-boom"))
    assert(res.count(_.ok) == 1 && res.count(!_.ok) == 1)
  }

  test("runOnce deletes after success; finished jobs don't re-run unless forced") {
    val q = new JobQueue()
    var n = 0
    q.submit(SparkJob("once", _ => n += 1, runOnce = true))
    q.submit(SparkJob("sticky", _ => n += 10))
    q.runAll(spark)
    assert(n == 11)
    assert(q.jobs.map(_.name) == Seq("sticky")) // "once" deleted
    q.runAll(spark) // sticky already finished -> no-op
    assert(n == 11)
    q.runAll(spark, forceRun = true)
    assert(n == 21)
  }

  test("script job: success on exit 0, failure otherwise") {
    val q = new JobQueue()
    q.submit(ScriptJob("ok", Seq("true"), priority = 2))
    q.submit(ScriptJob("bad", Seq("false"), priority = 1))
    val res = q.runAll(spark)
    assert(res.find(_.name == "ok").get.ok)
    assert(!res.find(_.name == "bad").get.ok)
  }

  test("transfer job copies and deletes via the Hadoop FileSystem API") {
    val dir = Files.createTempDirectory("xfer_")
    val src = dir.resolve("a.txt")
    Files.writeString(src, "payload")
    val dst = dir.resolve("b.txt")
    val q = new JobQueue()
    q.submit(TransferJob("cp", TransferType.Copy, src.toString, dst.toString,
      priority = 2))
    q.submit(TransferJob("rm", TransferType.Delete, src.toString, "",
      priority = 1))
    val res = q.runAll(spark)
    assert(res.forall(_.ok))
    assert(Files.exists(dst) && !Files.exists(src))
  }

  test("journal restore: resubmitted finished jobs skip unless forced; names escape") {
    val f = Files.createTempFile("jobs_", ".data").toString
    var n = 0
    val tricky = "job \"quoted\"\twith\ncontrol chars"
    locally {
      val q = new JobQueue(Some(f))
      q.submit(SparkJob(tricky, _ => n += 1))
      q.runAll(spark)
      assert(n == 1)
    }
    // journal stays one valid JSON object per line despite the quotes
    Files.readAllLines(java.nio.file.Paths.get(f)).forEach { line =>
      assert(line.startsWith("{") && line.endsWith("}"))
    }
    // a fresh queue (simulated restart) restores the finished-set when
    // the job is resubmitted
    val q2 = new JobQueue(Some(f))
    q2.submit(SparkJob(tricky, _ => n += 1))
    q2.runAll(spark)
    assert(n == 1) // restored as finished -> skipped
    q2.runAll(spark, forceRun = true)
    assert(n == 2)
  }

  test("state journal persists queue metadata; runtimes are tracked") {
    val f = Files.createTempFile("jobs_", ".data").toString
    val q = new JobQueue(Some(f))
    q.submit(SparkJob("a", _ => (), priority = 3, groupName = Some("g")))
    q.runAll(spark)
    val journal = Files.readString(java.nio.file.Paths.get(f))
    assert(journal.contains("\"name\":\"a\"") && journal.contains("\"finished\":true"))
    assert(q.runtimeHistory("a").nonEmpty)
  }
}
