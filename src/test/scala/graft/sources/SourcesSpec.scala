package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class DelimitedSourcesSpec extends SparkSpec {

  test("readMbTsv: tab-separated, \\N nulls, explicit schema") {
    val dir = Files.createTempDirectory("mbtsv")
    Files.writeString(dir.resolve("artists.tsv"),
      "1\tThe Beatles\tgroup\n2\t\\N\tperson\n3\tMiles Davis\t\\N\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("kind", StringType)))
    val df = DelimitedSources.readMbTsv(spark, dir.toString, schema)
      .orderBy("id").collect()
    assert(df.length == 3)
    assert(df(0).getString(1) == "The Beatles")
    assert(df(1).isNullAt(1)) // \N → null
    assert(df(2).isNullAt(2))
  }

  test("readDrScores: pipe format with row validation") {
    val dir = Files.createTempDirectory("dr")
    Files.writeString(dir.resolve("dr.txt"),
      "/music/album1|DR12\n/music/album2|DR8\ngarbage line\n/x|DRnope\n")
    val df = DelimitedSources.readDrScores(spark, dir.toString)
    val ok = df.filter(col("valid")).orderBy("key").collect()
    assert(ok.length == 2)
    assert(ok.head.getString(0) == "/music/album1" && ok.head.getInt(1) == 12)
    assert(df.filter(!col("valid")).count() == 2)
  }

  test("CSV report sink round-trips") {
    val dir = Files.createTempDirectory("csvout").toString + "/r"
    import spark.implicits._
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    DelimitedSources.writeCsvReport(df, dir)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() == 2 && back.columns.toSeq == Seq("k", "v"))
  }

  test("JSONL round-trip preserves escapes, unicode, nulls, and types") {
    import spark.implicits._
    val dir = Files.createTempDirectory("jsonl").toString
    val rows = Seq(
      (1L, "plain text", Some(42L)),
      (2L, "quote \" backslash \\ tab \t newline \n done", Some(0L)),
      (3L, "unicode: caffè 音楽 🎵 ñ", None),
      (4L, "", Some(-7L)))
    val df = rows.toDF("id", "text", "n")
      .select($"id", $"text", $"n".cast("long"))
    DelimitedSources.writeJsonl(df, dir)
    val back = DelimitedSources.readJsonl(spark, dir, df.schema)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(back.toSeq == rows)
    // and it really is one JSON object per line
    import scala.jdk.CollectionConverters._
    val lines = Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
      .filter(_.toString.endsWith(".json"))
      .flatMap(p => Files.readAllLines(p).asScala).toSeq
    assert(lines.size == 4)
    assert(lines.forall(l => l.startsWith("{") && l.endsWith("}")))
  }
}

class AlibStoreSpec extends SparkSpec {
  import spark.implicits._

  private val alib = Seq(
    ("/a/1.flac", "Artist A", "g1", 2),
    ("/a/2.flac", "Artist B", null, 0),
    ("/b/3.flac", "Artist C", "g2", 1))
    .toDF("__path", "artist", "genre", "__sqlmodded")

  test("upsert: incoming wins on collision, others survive") {
    val incoming = Seq(("/a/1.flac", "Artist A2", "g9", 3),
      ("/c/4.flac", "Artist D", null, 0))
      .toDF("__path", "artist", "genre", "__sqlmodded")
    val merged = AlibStore.upsert(alib, incoming, "__path")
    assert(merged.count() == 4)
    val a1 = merged.filter($"__path" === "/a/1.flac").collect().head
    assert(a1.getString(1) == "Artist A2")
  }

  test("upsertEvolving: new incoming column evolves schema, backfills null") {
    val incoming = Seq(("/a/1.flac", "Artist A2", "g9", 3, "hi-res"))
      .toDF("__path", "artist", "genre", "__sqlmodded", "quality")
    val merged = AlibStore.upsertEvolving(alib, incoming, "__path")
    assert(merged.columns.toSeq
      == Seq("__path", "artist", "genre", "__sqlmodded", "quality"))
    val byPath = merged.collect().map(r => r.getString(0) -> r).toMap
    assert(byPath("/a/1.flac").getString(4) == "hi-res")
    // pre-existing rows read NULL for the never-seen column
    assert(byPath("/b/3.flac").isNullAt(4))
    // and an incoming side missing existing columns backfills too
    val narrow = Seq(("/z/9.flac", "New Artist"))
      .toDF("__path", "artist")
    val merged2 = AlibStore.upsertEvolving(alib, narrow, "__path")
    val z = merged2.filter($"__path" === "/z/9.flac").collect().head
    assert(z.getString(1) == "New Artist" && z.isNullAt(2))
  }

  test("pruneOrphans keeps only live keys (S9 set difference)") {
    val live = Seq("/a/1.flac", "/b/3.flac").toDF("__path")
    val pruned = AlibStore.pruneOrphans(alib, live, "__path")
    assert(pruned.select("__path").collect().map(_.getString(0)).sorted.toSeq
      == Seq("/a/1.flac", "/b/3.flac"))
  }

  test("buildExport narrows to changed columns + touched rows (S11)") {
    val changelog = Seq(("/a/1.flac", "genre"), ("/a/1.flac", "genre"))
      .toDF("key", "column")
    val exp = AlibStore.buildExport(alib, changelog, "__path",
      systemCols = Seq("__path", "__sqlmodded"))
    assert(exp.columns.toSet == Set("__path", "__sqlmodded", "genre"))
    assert(exp.count() == 1)
    assert(exp.collect().head.getString(0) == "/a/1.flac")
  }

  test("resetSqlmodded nulls the counter (M5)") {
    val r = AlibStore.resetSqlmodded(alib)
    assert(r.filter($"__sqlmodded".isNotNull).count() == 0)
  }

  test("rebuildDroppingEmpty drops all-null non-system columns (M6)") {
    val withEmpty = alib.withColumn("dead", lit(null).cast("string"))
    val rebuilt = AlibStore.rebuildDroppingEmpty(withEmpty)
    assert(!rebuilt.columns.contains("dead"))
    assert(rebuilt.columns.contains("genre")) // partially-null survives
    assert(rebuilt.columns.contains("__sqlmodded")) // system always kept
  }

  test("renameWithRewrite updates table and changelog history (M8)") {
    val changelog = Seq(("/a/1.flac", "genre", "old", "new"))
      .toDF("key", "column", "old_value", "new_value")
    val renames = Seq(("/a/1.flac", "/z/1.flac")).toDF("old", "new")
    val (na, nl) = AlibStore.renameWithRewrite(alib, changelog, "__path",
      renames)
    assert(na.filter($"__path" === "/z/1.flac").count() == 1)
    assert(na.filter($"__path" === "/a/1.flac").count() == 0)
    assert(nl.collect().head.getString(0) == "/z/1.flac")
  }

  test("applyKeepColumns nulls non-keep non-system columns (P4)") {
    val kept = AlibStore.applyKeepColumns(alib, keep = Set("artist"))
    assert(kept.filter($"genre".isNotNull).count() == 0)
    assert(kept.filter($"artist".isNotNull).count() == 3)
    assert(kept.filter($"__path".isNotNull).count() == 3)
  }

}
