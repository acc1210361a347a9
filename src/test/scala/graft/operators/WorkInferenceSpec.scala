package graft.operators

import graft.SparkSpec

class WorkInferenceSpec extends SparkSpec {
  import spark.implicits._

  private val lookup = Seq(
    // (work_id, mbid, title_norm, aliases, role_names, role_mbids, vetted)
    (9L, "mb-9", "symphony five", null: String,
      "composer:Ludwig Van", "composer:amb-1", false),
    (10L, "mb-10", "moonlight", "symphony five\\\\mondschein",
      null: String, null: String, true),
    (11L, "mb-11", "quiet", null: String,
      "composer:Someone", null: String, true))
    .toDF("work_id", "musicbrainz_workid", "work_title_norm",
      "alias_tokens", "role_names", "role_mbids", "is_user_vetted")

  private val tracks = Seq(
    // exact workid + exact title + composer corroboration → tier A
    ("t1", "symphony five", "mb-9", "Ludwig van", null: String),
    // exact title on a vetted work, no corroboration → C, blocked
    ("t2", "moonlight", null: String, null: String, null: String),
    // alias-only, vetted → C, blocked by both guards
    ("t3", "mondschein", null, null, null),
    // exact unique title + vetted + composer → B, applies
    ("t4", "quiet", null, "someone", null),
    // nothing matches → D
    ("t5", "nothing here", null, null, null))
    .toDF("track_id", "title_norm", "workid", "composer", "artist_mbid")

  private val out = WorkInference.inferWorks(tracks, "track_id",
    "title_norm", "workid", Map("composer" -> "composer"),
    Seq("artist_mbid"), lookup)
    .collect().map(r => r.getString(0) -> r).toMap

  test("scores sum across sources; best and margin are per track") {
    val t1 = out("t1")
    // w9: 35 title + 70 workid + 10 composer = 115; w10 alias: 20+40=60
    assert(t1.getLong(1) == 9L && t1.getLong(3) == 115L)
    assert(t1.getLong(4) == 60L && t1.getLong(5) == 2L)
    assert(out("t2").getLong(3) == 75L) // 35 + 40 vetted
    assert(out("t3").getLong(3) == 60L) // 20 + 40 vetted
    assert(out("t4").getLong(3) == 85L) // 35 + 40 + 10
  }

  test("tiers follow the reference thresholds") {
    assert(out("t1").getString(11) == "A")
    assert(out("t2").getString(11) == "C")
    assert(out("t3").getString(11) == "C")
    assert(out("t4").getString(11) == "B")
    assert(out("t5").getString(11) == "D")
  }

  test("auto-apply needs tier A/B plus both guardrails clear") {
    assert(out("t1").getInt(12) == 1)
    assert(out("t2").getInt(12) == 0) // title-only, no corroboration
    assert(out("t3").getInt(12) == 0) // alias-only + route block
    assert(out("t4").getInt(12) == 1) // unique exact title + corroboration
    assert(out("t5").getInt(12) == 0)
  }

  test("no-candidate tracks surface as tier D with zeroed scores") {
    val t5 = out("t5")
    assert(t5.isNullAt(1) && t5.getLong(3) == 0L && t5.getLong(5) == 0L)
  }

  test("roles outside the rule table do not corroborate") {
    import org.apache.spark.sql.functions._
    // same t2 shape but with a matching name routed through an UNRULED
    // role: person_match must stay false (guardrail keeps blocking)
    val t = Seq(("tx", "quiet", null: String, "someone"))
      .toDF("track_id", "title_norm", "workid", "producer")
    val r = WorkInference.inferWorks(t, "track_id", "title_norm",
      "workid", Map("producer" -> "producer"), Seq.empty, lookup)
      .collect().head
    assert(!r.getBoolean(10))        // person_match
    assert(r.getLong(3) == 75L)      // 35 title + 40 vetted, no +10
    assert(r.getInt(12) == 0)        // still blocked from auto-apply
  }
}
