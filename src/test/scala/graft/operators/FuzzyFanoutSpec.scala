package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private val names = Seq("progressive rock", "progresive rock", "jazz",
    "prog rock", "jazz fusion").toDF("name")

  test("tfCosinePairs: typo pair scores high, unrelated pairs drop out") {
    val pairs = Fuzzy.tfCosinePairs(names, "name", 3, 0.5).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(pairs.contains(("progresive rock", "progressive rock")))
    assert(pairs(("progresive rock", "progressive rock")) > 0.85)
    assert(!pairs.keys.exists(p => p._1 == "jazz" && p._2 == "prog rock"))
  }

  test("tfCosinePairs: identical normalized names collapse via distinct") {
    val dup = Seq("Jazz", "jazz ", "rock").toDF("name")
    // "Jazz" and "jazz " normalize to the same value → no self-pair
    assert(Fuzzy.tfCosinePairs(dup, "name", 3, 0.0)
      .filter($"name_a" === "jazz" && $"name_b" === "jazz").count() == 0)
  }

  test("tfidfCosinePairs downweights corpus-common grams") {
    val df = Seq("the rock band", "the jazz band", "xqzwy")
      .toDF("name")
    val tf = Fuzzy.tfCosinePairs(df, "name", 3, 0.0)
      .filter($"name_a" === "the jazz band" && $"name_b" === "the rock band")
      .collect().head.getDouble(2)
    val tfidf = Fuzzy.tfidfCosinePairs(df, "name", 3, 0.0)
      .filter($"name_a" === "the jazz band" && $"name_b" === "the rock band")
      .collect().head.getDouble(2)
    // shared grams ("the", " ba", "band") are corpus-common → idf shrinks them
    assert(tfidf < tf)
  }
}

class FanoutSpec extends SparkSpec {
  import spark.implicits._

  test("rolePersonPairs parses role:person segments; malformed → null role") {
    val r = Seq("producer:Eno; engineer:Lillywhite;justname")
      .toDF("c").select(Fanout.rolePersonPairs(col("c")).as("a"))
      .select(explode(col("a")).as("x"))
      .select(col("x.role"), col("x.person")).collect()
      .map(x => (if (x.isNullAt(0)) null else x.getString(0), x.getString(1)))
    assert(r.toSeq == Seq(("producer", "Eno"), ("engineer", "Lillywhite"),
      (null, "justname")))
  }

  test("guardedSplit: comma guarded before Jr/III, plain delimiters split") {
    assert(Fanout.guardedSplit("Smith, Jr; Davis & Jones, Sally")
      == Seq("Smith, Jr", "Davis", "Jones", "Sally"))
    assert(Fanout.guardedSplit("Hank Williams, III and Bob")
      == Seq("Hank Williams, III", "Bob"))
  }

  test("guardedSplit: order-preserving dedupe, empties dropped") {
    assert(Fanout.guardedSplit("B; A;; B / A") == Seq("B", "A"))
    assert(Fanout.guardedSplit(null) == Seq.empty)
  }
}
