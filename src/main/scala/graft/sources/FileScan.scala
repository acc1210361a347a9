package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-scan source and export sink (SURVEY §2.1 S1-S3, S10).
  *
  * - S1/S2: the reference's hand-rolled recursive scandir + per-drive
  *   thread pools (ref `tags2db.py:418-475`) are replaced wholesale by
  *   Spark's distributed file listing: `binaryFile` with a glob filter.
  * - S3: tag parsing (ref `tags2db.py:478-512`) is a per-partition map
  *   over file bytes; the actual audio-tag decode is STUBBED (no tag
  *   libraries here) with a deterministic fake — the scan/partition/
  *   schema plumbing is real.
  * - S10: export-to-files writes tags back grouped by directory (ref
  *   `tags2db.py:1447-1741` partitions by `__dirpath` so one worker owns
  *   a directory) — re-expressed as repartition + foreachPartition.
  */
object FileScan {

  /** S1: recursive scan for audio-extension files. Column pruning
    * matters: selecting only path/length skips reading file content
    * (binaryFile materializes `content` lazily per column). */
  def scanAudioFiles(spark: SparkSession, root: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.{flac,wv,m4a,aiff,ape,mp3,ogg}")
      .option("recursiveFileLookup", "true")
      .load(root)

  /** S3: parse scanned files into tag rows. STUB decode — derives
    * deterministic pseudo-tags from the path and byte length; swap the
    * body for a real tag reader without changing the plan. */
  def parseTags(scanned: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    scanned.select(col("path"), col("length")).as[(String, Long)]
      .mapPartitions { it =>
        it.map { case (path, len) =>
          val base = path.substring(path.lastIndexOf('/') + 1)
          val dir = path.substring(0, math.max(path.lastIndexOf('/'), 0))
          (path, dir, base, len, base.hashCode.toLong & 0x7fffffffL)
        }
      }.toDF("__path", "__dirpath", "__filename", "__size", "__sig")
  }

  /** S10: export rows under a path prefix back to per-directory files,
    * one partition per directory so a single task owns each dir (the
    * reference's grouping rationale, tags2db.py:1570-1610).
    *
    * Tag-write semantics modeled from the reference's writer
    * (tags2db.py:1447-1741): a NULL/empty cell DELETEs the tag from the
    * file, a delimited cell splits into one SET per value, and the file
    * mtime is either preserved or bumped (`mtimeMode` ∈ preserve|bump —
    * the reference restores the original mtime unless told otherwise).
    * The physical write is a per-directory manifest of
    * `path<TAB>tag<TAB>action[<TAB>value]` lines standing in for the
    * actual tag library call; with `tagCols` empty it degrades to the
    * path-only manifest. */
  def exportByDirectory(rows: DataFrame, prefix: String, outRoot: String,
                        tagCols: Seq[String] = Nil,
                        mtimeMode: String = "preserve"): Unit = {
    require(mtimeMode == "preserve" || mtimeMode == "bump",
      s"unknown mtime mode: $mtimeMode")
    rows
      .filter(col("__dirpath").startsWith(prefix))
      .repartition(col("__dirpath"))
      .sortWithinPartitions("__dirpath", "__path")
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val byDir = it.toSeq.groupBy(_.getAs[String]("__dirpath"))
        byDir.foreach { case (dir, rs) =>
          // leading "dir" keeps the name from starting with '_' or '.',
          // which Hadoop input formats treat as hidden and skip on read
          val safe = "dir" + dir.replaceAll("[^A-Za-z0-9._-]", "_")
          val target = Paths.get(outRoot, safe + ".manifest")
          Files.createDirectories(target.getParent)
          val sorted = rs.sortBy(_.getAs[String]("__path"))
          val body =
            if (tagCols.isEmpty) sorted.map(_.getAs[String]("__path")).mkString("\n")
            else sorted.flatMap { r =>
              val p = r.getAs[String]("__path")
              val tagLines = tagCols.flatMap { tc =>
                val v = r.getAs[String](tc)
                if (v == null || v.isEmpty) Seq(s"$p\t$tc\tDELETE")
                else v.split(graft.core.MultiValue.DelimRe).toSeq
                  .map(t => s"$p\t$tc\tSET\t$t")
              }
              s"$p\t__mtime\t$mtimeMode" +: tagLines
            }.mkString("\n")
          Files.writeString(target, body)
        }
      }
  }
}
