package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Snapshots

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val table = Seq(
    (1L, "a  a", "x"), (2L, "b", "y"), (3L, "c c", "z"))
    .toDF("id", "t", "u")

  private val steps = Seq(
    Transform("01_ws", Seq("t"),
      df => df.withColumn("t", regexp_replace(col("t"), " +", " "))),
    Transform("02_up", Seq("u"),
      df => df.withColumn("u", upper(col("u")))))

  test("pipeline threads state and tags changelog per step") {
    val (fin, log) = Pipeline.run(table, "id", steps)
    assert(fin.filter($"t" === "a a").count() == 1)
    assert(fin.filter($"u" === "X").count() == 1)
    val byScript = log.groupBy("script").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byScript == Map("01_ws" -> 1L, "02_up" -> 3L))
  }

  test("pipeline is idempotent: second run emits zero changelog rows") {
    val (fin, _) = Pipeline.run(table, "id", steps)
    val (_, log2) = Pipeline.run(fin, "id", steps)
    assert(log2.count() == 0)
  }
}

class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(("a", Some(1)), ("b", None), (null, Some(3)))
    .toDF("s", "n")

  test("coverage counts populated cells per column in one pass") {
    val r = Snapshots.coverage(df, "run1").collect().head
    assert(r.getAs[Long]("n_rows") == 3)
    assert(r.getAs[Long]("n_s") == 2)
    assert(r.getAs[Long]("n_n") == 2)
    assert(r.getAs[String]("run_id") == "run1")
  }

  test("coverageLong + compare produce per-column deltas") {
    val before = Snapshots.coverageLong(df, "r0")
    val after = Snapshots.coverageLong(
      df.withColumn("s", coalesce(col("s"), lit("filled"))), "r1")
    val deltas = Snapshots.compare(before, after).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(deltas == Map("s" -> 1L, "n" -> 0L))
  }

  test("run store: lastTwoRuns reads the two latest stored captures") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_snapruns").toString + "/store"
    def snap(n: Long) = Seq(n).toDF("n_docs")
    Snapshots.appendRun(snap(10), "r0", 0, dir, overwrite = true)
    Snapshots.appendRun(snap(12), "r1", 1, dir)
    Snapshots.appendRun(snap(15), "r2", 2, dir)
    val (before, after) = Snapshots.lastTwoRuns(spark.read.parquet(dir))
    assert(before.select("run_id", "n_docs").collect().map(r =>
      (r.getString(0), r.getLong(1))).toSeq == Seq(("r1", 12L)))
    assert(after.select("run_id", "n_docs").collect().map(r =>
      (r.getString(0), r.getLong(1))).toSeq == Seq(("r2", 15L)))
    // a keyed snapshot is rejected: the store owns the run columns
    intercept[IllegalArgumentException] {
      Snapshots.appendRun(snap(1).withColumn("run_id", lit("x")),
        "r3", 3, dir)
    }
  }

  test("run store: a single-run store fails loudly, not empty-delta") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_snapruns1").toString + "/store"
    Snapshots.appendRun(Seq(10L).toDF("n_docs"), "r0", 0, dir,
      overwrite = true)
    val e = intercept[IllegalArgumentException] {
      Snapshots.lastTwoRuns(spark.read.parquet(dir))
    }
    assert(e.getMessage.contains("need at least two"))
  }

  test("run store: a seq GAP (crashed crawl) still diffs the two " +
    "latest landed runs") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_snapruns3").toString + "/store"
    def snap(n: Long) = Seq(n).toDF("n_docs")
    Snapshots.appendRun(snap(10), "r0", 0, dir, overwrite = true)
    Snapshots.appendRun(snap(12), "r2", 2, dir) // seq 1 never landed
    Snapshots.appendRun(snap(15), "r5", 5, dir) // nor 3-4
    val (before, after) = Snapshots.lastTwoRuns(spark.read.parquet(dir))
    assert(before.select("run_id").head.getString(0) == "r2")
    assert(after.select("run_id").head.getString(0) == "r5")
  }

  test("run store: legitimately VARYING capture sizes across runs " +
    "diff cleanly (a group appearing between crawls is not corruption)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_snapruns4").toString + "/store"
    // row-per-group long-form captures: run 1 gains a group
    Snapshots.appendRun(Seq(("en", 10L)).toDF("grp", "n_docs"),
      "r0", 0, dir, overwrite = true)
    Snapshots.appendRun(Seq(("en", 12L), ("de", 3L)).toDF("grp", "n_docs"),
      "r1", 1, dir)
    val (before, after) = Snapshots.lastTwoRuns(spark.read.parquet(dir))
    assert(before.count() == 1 && after.count() == 2)
  }

  test("run store: a SAME-run_id re-append (doubled capture rows) " +
    "fails loudly, not fanned out") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_snapruns5").toString + "/store"
    def snap(n: Long) = Seq(n).toDF("n_docs")
    Snapshots.appendRun(snap(10), "r0", 0, dir, overwrite = true)
    Snapshots.appendRun(snap(12), "r1", 1, dir)
    Snapshots.appendRun(snap(12), "r1", 1, dir) // crashed-crawl retry
    val e = intercept[IllegalArgumentException] {
      Snapshots.lastTwoRuns(spark.read.parquet(dir))
    }
    assert(e.getMessage.contains("re-appended"))
  }

  test("run store: a SAME-run_id re-append with DRIFTED recomputed " +
    "values (no exact duplicate row) still fails loudly") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_snapruns6").toString + "/store"
    def snap(n: Long) = Seq(n).toDF("n_docs")
    Snapshots.appendRun(snap(10), "r0", 0, dir, overwrite = true)
    Snapshots.appendRun(snap(12), "r1", 1, dir)
    // the retry recomputed a non-deterministic capture: same run_id,
    // same seq, different value — neither content check can see it
    Snapshots.appendRun(snap(13), "r1", 1, dir)
    val e = intercept[IllegalArgumentException] {
      Snapshots.lastTwoRuns(spark.read.parquet(dir))
    }
    assert(e.getMessage.contains("several appends share one run_seq"))
  }

  test("run store: a store UPGRADED mid-life (pre-stamp runs + a " +
    "stamped append) is healthy, not refused") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_snapruns8").toString + "/store"
    // two legacy runs written WITHOUT the stamp (the pre-r16 layout)
    Seq((10L, "r0", 0)).toDF("n_docs", "run_id", "run_seq")
      .write.mode("overwrite").parquet(dir)
    Seq((12L, "r1", 1)).toDF("n_docs", "run_id", "run_seq")
      .write.mode("append").parquet(dir)
    // the first post-upgrade crawl appends a stamped run: legacy rows
    // read the stamp as null (0 distinct stamps), the new run as 1 —
    // neither is a retry, and the diff must come back clean.
    // loadRunStore is the read path: its mergeSchema keeps the stamp
    // visible even when plain schema inference would pick a pre-stamp
    // footer and silently disarm the detector
    Snapshots.appendRun(Seq(15L).toDF("n_docs"), "r2", 2, dir)
    val store = Snapshots.loadRunStore(spark, dir)
    assert(store.columns.contains("__graft_append_id"))
    val (before, after) = Snapshots.lastTwoRuns(store)
    assert(before.select("run_id").head.getString(0) == "r1")
    assert(after.select("run_id").head.getString(0) == "r2")
    // a DRIFTED retry of the stamped run on this upgraded store is
    // still caught — the advisor's scenario: only the merged-schema
    // read can see the two stamps under one seq
    Snapshots.appendRun(Seq(16L).toDF("n_docs"), "r2", 2, dir)
    val e = intercept[IllegalArgumentException] {
      Snapshots.lastTwoRuns(Snapshots.loadRunStore(spark, dir))
    }
    assert(e.getMessage.contains("several appends share one run_seq"))
  }

  test("run store: the append stamp never reaches the returned " +
    "frames and a stamped snapshot is refused") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_snapruns7").toString + "/store"
    def snap(n: Long) = Seq(n).toDF("n_docs")
    Snapshots.appendRun(snap(10), "r0", 0, dir, overwrite = true)
    Snapshots.appendRun(snap(12), "r1", 1, dir)
    val (before, after) = Snapshots.lastTwoRuns(spark.read.parquet(dir))
    assert(!before.columns.contains("__graft_append_id"))
    assert(!after.columns.contains("__graft_append_id"))
    intercept[IllegalArgumentException] {
      Snapshots.appendRun(
        snap(1).withColumn("__graft_append_id", lit("x")), "r2", 2, dir)
    }
  }

  test("run store: a re-appended run_seq fails loudly, not fanned out") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_snapruns2").toString + "/store"
    def snap(n: Long) = Seq(n).toDF("n_docs")
    Snapshots.appendRun(snap(10), "r0", 0, dir, overwrite = true)
    Snapshots.appendRun(snap(12), "r1", 1, dir)
    // the crashed-crawl re-append the reference's PRIMARY KEY rejects
    Snapshots.appendRun(snap(13), "r1b", 1, dir)
    val e = intercept[IllegalArgumentException] {
      Snapshots.lastTwoRuns(spark.read.parquet(dir))
    }
    assert(e.getMessage.contains("re-appended"))
  }
}
