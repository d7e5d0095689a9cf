package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the attestation-completeness gate (Verify's round-6 lesson: 8
  * crashed queries vanished from the correctness artifact with no
  * signal). A query counts as attested by EITHER a result dir or a
  * `._FAILED` marker; anything else must be named in the MISSING line. */
class VerifySpec extends AnyFunSuite {

  test("a query with neither result nor failure marker is reported missing") {
    val expected = Set("q01_a", "q02_b", "q03_c", "q04_d")
    val outDir = Set(
      "q01_a",            // result parquet dir
      "q02_b._FAILED",    // crashed, marker written
      "oracle_sql.json")  // non-query artifact, ignored
    assert(Verify.missingAttestations(expected, outDir) ==
      Seq("q03_c", "q04_d"))
  }

  test("complete runs report nothing missing (markers count as attested)") {
    val expected = Set("q01_a", "q02_b")
    assert(Verify.missingAttestations(expected,
      Set("q01_a", "q02_b._FAILED")).isEmpty)
  }

  test("subset runs only expect the subset") {
    assert(Verify.missingAttestations(Set("q05_e"), Set.empty) ==
      Seq("q05_e"))
  }
}
