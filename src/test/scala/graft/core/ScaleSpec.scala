package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.DelimitedSources

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedCount equals plain count under a hot key") {
    val hot = (1 to 5000).map(i => ("hot", i.toLong)) ++
      (1 to 10).map(i => ("cold", i.toLong))
    val df = hot.toDF("k", "id")
    val salted = Scale.saltedCount(df, "k", "id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == Map("hot" -> 5000L, "cold" -> 10L))
  }

  test("salt spreads a hot key across buckets") {
    val df = (1 to 1000).map(i => ("hot", i.toLong)).toDF("k", "id")
    val buckets = df.select(Scale.salt(col("id"), 16)).distinct().count()
    assert(buckets > 8, s"only $buckets of 16 salt buckets used")
  }

  test("saltedJoin equals the plain join under a hot key") {
    val fact = ((1 to 4000).map(i => (1L, i.toLong)) ++
      (1 to 20).map(i => (2L, i.toLong)) ++
      Seq((99L, 0L))).toDF("k", "id") // 99 has no dim row
    val dim = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val salted = Scale.saltedJoin(fact, dim, "k", "id", n = 8)
    val plain = fact.join(dim, Seq("k"))
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
    // the hot key's rows really occupy several (key, salt) buckets
    val spread = fact.filter(col("k") === 1)
      .select(Scale.salt(col("id"), 8)).distinct().count()
    assert(spread > 4, s"hot key used only $spread of 8 buckets")
  }
}

class WikidataSourceSpec extends SparkSpec {

  test("S13: keeps only entities with an allowed identifier claim") {
    val dir = Files.createTempDirectory("wd")
    Files.writeString(dir.resolve("d.json"),
      """{"id":"Q1","labels":{"en":"Miles Davis"},"claims":{"P434":"mbid-1"}}
        |{"id":"Q2","labels":{"en":"Nobody"},"claims":{}}
        |{"id":"Q3","labels":{"en":"Eno"},"claims":{"P1728":"amg-1"}}
        |""".stripMargin)
    val df = DelimitedSources.readWikidataEntities(spark, dir.toString,
      Seq("P434", "P1728")).orderBy("entity_id").collect()
    assert(df.map(_.getString(0)).toSeq == Seq("Q1", "Q3"))
    assert(df.head.getString(1) == "Miles Davis")
    assert(df.head.getString(2) == "mbid-1")
  }
}
