package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DecisionsSpec extends SparkSpec {
  import spark.implicits._

  test("unique auto-assigns, decisions cover ambiguity, rest pends") {
    val cands = Seq(
      ("miles", "kind of blue", 1L),
      ("smith", "album a", 10L), ("smith", "album a", 11L),
      ("jones", "album b", 20L), ("jones", "album b", 21L))
      .toDF("name", "context", "cand_id")
    // decision keys match casefolded/trimmed (ref normalize_string)
    val dec = Seq(("SMITH", " album a ", 11L))
      .toDF("name", "context", "assigned_id")
    val (assigned, pending) = Decisions.resolveWithDecisions(cands, dec)
    val a = assigned.orderBy("name").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getString(3)))
    assert(a.toSeq == Seq(("miles", 1L, "unique"),
      ("smith", 11L, "user_decision")))
    val p = pending.collect().map(r => (r.getString(0), r.getLong(2)))
    assert(p.toSeq == Seq(("jones", 2L)))

    // the single-pass form classifies identically (pending → null id)
    val all = Decisions.resolveAll(cands, dec).orderBy("name").collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getString(3)))
    assert(all.toSeq == Seq(
      ("jones", None, "pending"),
      ("miles", Some(1L), "unique"),
      ("smith", Some(11L), "user_decision")))
  }

  test("case/whitespace variants are ONE group under the normalized key") {
    // raw-keyed grouping would see two singleton groups and auto-assign
    // both as 'unique' with conflicting ids; normalized keying makes
    // them one ambiguous group that pends
    val cands = Seq(("Smith", "Album A", 1L), ("smith", " album a ", 2L))
      .toDF("name", "context", "cand_id")
    val dec = Seq.empty[(String, String, Long)]
      .toDF("name", "context", "assigned_id")
    val (assigned, pending) = Decisions.resolveWithDecisions(cands, dec)
    assert(assigned.count() == 0)
    val p = pending.collect()
    assert(p.length == 1 && p.head.getLong(2) == 2L)
  }

  test("colliding decision variants collapse to one deterministic row") {
    val cands = Seq(("ann", "c", 1L), ("ann", "c", 2L))
      .toDF("name", "context", "cand_id")
    // two decision spellings of one normalized key must not fan out
    val dec = Seq(("Ann", " C ", 7L), ("ann", "c", 9L))
      .toDF("name", "context", "assigned_id")
    val (assigned, pending) = Decisions.resolveWithDecisions(cands, dec)
    val a = assigned.collect()
    assert(a.length == 1 && a.head.getLong(2) == 9L) // deterministic max
    assert(pending.count() == 0)
  }

  test("retirement needs a synthetic id AND exactly one real candidate") {
    val dec = Seq(
      ("a", "c", "synth:a", "user"),  // one real → retires
      ("b", "c", "synth:b", "user"),  // two reals → stays
      ("d", "c", "synth:d", "user"),  // no real → stays
      ("e", "c", "mb-9", "user"))     // not synthetic → stays
      .toDF("name", "context", "assigned_id", "decision_source")
    val real = Seq(("a", "c", "mb-1"), ("b", "c", "mb-2"), ("b", "c", "mb-3"))
      .toDF("name", "context", "real_id")
    val (updated, proposals) = Decisions.retireSynthetic(dec, real,
      c => c.startsWith("synth:"))
    val u = updated.orderBy("name").collect()
      .map(r => (r.getString(0), r.getString(2), r.getString(3)))
    assert(u.toSeq == Seq(
      ("a", "mb-1", "retired_to_real"), ("b", "synth:b", "user"),
      ("d", "synth:d", "user"), ("e", "mb-9", "user")))
    val pr = proposals.collect().map(r =>
      (r.getString(0), r.getString(2), r.getString(3)))
    assert(pr.toSeq == Seq(("a", "synth:a", "mb-1")))
  }
}
