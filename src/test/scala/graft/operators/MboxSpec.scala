package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class MboxSpec extends AnyFunSuite {

  private def msg(from: String, subject: String, body: String): Array[Byte] =
    s"""From: $from
       |Subject: $subject
       |Date: Thu, 1 Jan 2026 00:00:00 +0000
       |
       |$body""".stripMargin.getBytes("UTF-8")

  test("round-trip: two messages split back with envelopes, bodies " +
      "unquoted, and the EML decoder reads each") {
    val m1 = msg("a@x.test", "hi", "line one\nFrom the start\nbye\n")
    val m2 = msg("b@x.test", "Re: hi", ">From quoted once\nend\n")
    val blob = Mbox.encode(Seq(("a@x.test", m1), ("b@x.test", m2)))
    val parts = Mbox.split(blob).get
    assert(parts.length == 2)
    assert(parts(0)._1.startsWith("From a@x.test "))
    assert(parts(1)._1.startsWith("From b@x.test "))
    val e1 = Eml.parseEmail(parts(0)._2).get
    val e2 = Eml.parseEmail(parts(1)._2).get
    assert(e1.from.contains("a@x.test"))
    assert(e1.textBody.get.contains("\nFrom the start\n"))
    assert(e2.textBody.get.startsWith(">From quoted once"))
    assert(!e2.textBody.get.startsWith(">>From"))
  }

  test("quoting is applied on write: the raw blob carries >From and " +
      ">>From, never a bare body-line From_") {
    val m1 = msg("a@x.test", "s", "From here\n>From there\nok\n")
    val blob = new String(Mbox.encode(Seq(("a@x.test", m1))), "UTF-8")
    assert(blob.contains("\n>From here\n"))
    assert(blob.contains("\n>>From there\n"))
    // exactly one envelope line
    assert(blob.linesIterator.count(_.startsWith("From ")) == 1)
  }

  test("a quoted From line mid-body does NOT split the message, and " +
      "an unquoted From after a NON-blank line does not either") {
    // hand-built mboxo-style blob: "From " only splits after a blank
    val raw = ("From a@x.test Thu Jan  1 00:00:00 2026\n" +
      "From: a@x.test\nSubject: s\n\n" +
      "body line\n" +
      "From not an envelope (prev line non-blank)\n" +
      "tail\n").getBytes("UTF-8")
    val parts = Mbox.split(raw).get
    assert(parts.length == 1)
    val em = Eml.parseEmail(parts(0)._2).get
    assert(em.textBody.get.contains("From not an envelope"))
  }

  test("decode contract: null, empty, non-mbox leading bytes -> None") {
    assert(Mbox.split(null).isEmpty)
    assert(Mbox.split(Array.emptyByteArray).isEmpty)
    assert(Mbox.split("not a mailbox\n".getBytes("UTF-8")).isEmpty)
    assert(Mbox.split("From".getBytes("UTF-8")).isEmpty) // no space
  }

  test("fixture shape: every residue class splits to 1 + id%3 " +
      "messages, thread heads keep the single-quoted >From plant") {
    (0L to 24L).foreach { id =>
      val msgs = (0L to id % 3).map(k => Mbox.fixtureMessage(id, k))
      val parts = Mbox.split(Mbox.encode(msgs)).get
      assert(parts.length == (id % 3 + 1), s"id=$id")
      parts.zipWithIndex.foreach { case ((env, mb), k) =>
        val em = Eml.parseEmail(mb).get
        assert(env.startsWith("From user"))
        assert(em.subject.get.stripPrefix("Re: ") == s"topic ${id % 5}")
        assert(em.textBody.get.contains("\nFrom the start"))
        if (k == 0)
          assert(em.textBody.get.contains("\n>From before"))
      }
    }
  }
}
