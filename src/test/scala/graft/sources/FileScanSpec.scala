package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec

class FileScanSpec extends SparkSpec {

  test("S1-S3: binaryFile scan filters extensions recursively, parse stub") {
    implicit val s = spark
    val root = Files.createTempDirectory("scan")
    Files.createDirectories(root.resolve("Album/cd 1"))
    Files.writeString(root.resolve("Album/cd 1/track01.flac"), "AAAA")
    Files.writeString(root.resolve("Album/track02.mp3"), "BBBBBB")
    Files.writeString(root.resolve("Album/cover.jpg"), "not audio")

    val scanned = FileScan.scanAudioFiles(spark, root.toString)
    assert(scanned.count() == 2) // jpg filtered by glob

    val parsed = FileScan.parseTags(scanned)
    val rows = parsed.orderBy("__filename").collect()
    assert(rows.map(_.getAs[String]("__filename")).toSeq
      == Seq("track01.flac", "track02.mp3"))
    assert(rows.head.getAs[Long]("__size") == 4L)
    assert(rows.forall(_.getAs[String]("__dirpath").nonEmpty))
  }

  test("S10: export groups rows per directory, one manifest each") {
    import spark.implicits._
    val rows = Seq(
      ("/lib/a/1.flac", "/lib/a"), ("/lib/a/2.flac", "/lib/a"),
      ("/lib/b/3.flac", "/lib/b"), ("/other/4.flac", "/other"))
      .toDF("__path", "__dirpath")
    val out = Files.createTempDirectory("exp").toString
    FileScan.exportByDirectory(rows, "/lib", out)
    val manifests = Files.list(Paths.get(out)).toArray.map(_.toString).sorted
    assert(manifests.length == 2) // /other filtered by prefix
    val a = manifests.find(_.contains("_lib_a")).get
    assert(Files.readString(Paths.get(a))
      == "/lib/a/1.flac\n/lib/a/2.flac")
  }

  test("S10: tag export writes DELETE for empty, SET per value, mtime mode") {
    import spark.implicits._
    val rows = Seq(
      ("/lib/a/1.flac", "/lib/a", "rock\\\\jazz"),
      ("/lib/a/2.flac", "/lib/a", null: String))
      .toDF("__path", "__dirpath", "genre")
    val out = Files.createTempDirectory("expTag").toString
    FileScan.exportByDirectory(rows, "/lib", out,
      tagCols = Seq("genre"), mtimeMode = "bump")
    val a = Files.list(Paths.get(out)).toArray.map(_.toString)
      .find(_.contains("_lib_a")).get
    assert(Files.readString(Paths.get(a)) == Seq(
      "/lib/a/1.flac\t__mtime\tbump",
      "/lib/a/1.flac\tgenre\tSET\trock",
      "/lib/a/1.flac\tgenre\tSET\tjazz",
      "/lib/a/2.flac\t__mtime\tbump",
      "/lib/a/2.flac\tgenre\tDELETE").mkString("\n"))
    intercept[IllegalArgumentException] {
      FileScan.exportByDirectory(rows, "/lib", out, mtimeMode = "nope")
    }
  }

  test("M7: changelog migration backfills rowid-keyed rows") {
    import spark.implicits._
    val oldLog = Seq((10L, "genre", "a", "b", "s1"), (11L, "year", "x", "y", "s1"))
      .toDF("rowid", "column", "old_value", "new_value", "script")
    val map = Seq((10L, "/p/1.flac")).toDF("rowid", "key")
    val migrated = graft.cdc.Cdc.migrateChangelog(oldLog, map)
      .orderBy("key").collect()
    assert(migrated.head.getString(0) == "/p/1.flac")
    assert(migrated(1).getString(0) == "rowid:11") // unresolvable keeps a tag
  }
}
