package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** The oracle-surgery guard: every oracle built by post-hoc
  * replacement on another oracle's SQL must fail LOUDLY when the
  * donor text drifts, never silently degrade to the unpatched
  * query. */
class OracleSurgerySpec extends AnyFunSuite {

  test("replaceOnce: patches a unique pattern, rejects zero or " +
    "many occurrences") {
    assert(LlmQueries.replaceOnce("a X b", "X", "Y") == "a Y b")
    val missing = intercept[IllegalArgumentException] {
      LlmQueries.replaceOnce("a b", "X", "Y")
    }
    assert(missing.getMessage.contains("found 0"))
    val dup = intercept[IllegalArgumentException] {
      LlmQueries.replaceOnce("X a X", "X", "Y")
    }
    assert(dup.getMessage.contains("found 2"))
    // pattern longer than the donor: zero windows, still loud
    intercept[IllegalArgumentException] {
      LlmQueries.replaceOnce("ab", "abc", "Y")
    }
  }

  test("the era/gate surgeries build against today's donor SQL") {
    // would throw if Bm25Sql or D82GopherNgramsSql lost an anchor
    val era = LlmQueries.bm25SqlEra("doc_id < 10", "doc_id % 2 = 0")
    assert(era.contains("WHERE doc_id < 10") &&
      era.contains("WHERE doc_id % 2 = 0") && !era.contains("LIMIT 128"))
    assert(LlmQueries.sql.contains("d84_gopher_full_gate"))
  }
}
