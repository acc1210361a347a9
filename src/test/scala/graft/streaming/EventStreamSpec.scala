package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec

class EventStreamSpec extends SparkSpec {

  test("AvailableNow file-stream hourly agg matches the batch query") {
    // file source needs a directory; stage the events parquet into one
    val dir = Files.createTempDirectory("evstream").toString
    val ckpt = Files.createTempDirectory("evckpt").toString
    Files.copy(Paths.get(s"$sf0001/events.parquet"),
      Paths.get(s"$dir/events.parquet"))

    val agg = EventStream.hourlyAgg(EventStream.readEvents(spark, dir))
    var last: Array[org.apache.spark.sql.Row] = Array.empty
    EventStream.runAvailableNow(agg, ckpt, mode = "complete") { (b, _) =>
      val rows = b.collect()
      if (rows.nonEmpty) last = rows
    }

    val batch = graft.queries.StreamQueries.defs("st_hourly_window")(
      spark, sf0001).collect()
    val got = last.map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getLong(3))).toSet
    val want = batch.map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getLong(3))).toSet
    assert(got == want)
  }

  test("stateful sessionize (flatMapGroupsWithState) matches the batch query") {
    implicit val s = spark
    val dir = Files.createTempDirectory("evsess").toString
    val ckpt = Files.createTempDirectory("evsessck").toString
    Files.copy(Paths.get(s"$sf0001/events.parquet"),
      Paths.get(s"$dir/events.parquet"))

    val sess = EventStream.sessionize(
      EventStream.readEvents(spark, dir), gapNanos = 1800000000000L).toDF()
    var got = Map.empty[Long, (Long, Long)]
    EventStream.runAvailableNow(sess, ckpt, mode = "append") { (b, _) =>
      b.collect().foreach { r =>
        got += r.getLong(0) -> ((r.getLong(1), r.getLong(2)))
      }
    }

    val want = graft.queries.StreamQueries.defs("st_sessions")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == want)
  }

  test("streaming dedup (watermarked) keeps exactly one survivor per key") {
    val dir = Files.createTempDirectory("evdedup").toString
    val ckpt = Files.createTempDirectory("evdedupck").toString
    Files.copy(Paths.get(s"$sf0001/events.parquet"),
      Paths.get(s"$dir/events.parquet"))

    val keys = Seq("user_id", "event_type")
    val dd = EventStream.dedupStream(EventStream.readEvents(spark, dir), keys)
    var got = Set.empty[(Long, String)]
    var n = 0L
    EventStream.runAvailableNow(dd, ckpt, mode = "append") { (b, _) =>
      val rows = b.collect()
      n += rows.length
      rows.foreach(r => got += ((r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"))))
    }

    val want = graft.queries.StreamQueries.defs("st_dedup")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == want)
    assert(n == want.size, "a key emitted more than one survivor")
  }

  test("pinned-survivor dedup (flatMapGroupsWithState) equals the batch summary") {
    implicit val s = spark
    val dir = Files.createTempDirectory("evdedup2").toString
    val ckpt = Files.createTempDirectory("evdedup2ck").toString
    Files.copy(Paths.get(s"$sf0001/events.parquet"),
      Paths.get(s"$dir/events.parquet"))

    val dd = EventStream.dedupPinned(EventStream.readEvents(spark, dir)).toDF()
    // later batches supersede earlier per-key rows (running summary)
    var got = Map.empty[(Long, String), (Long, Long, Long)]
    EventStream.runAvailableNow(dd, ckpt, mode = "append") { (b, _) =>
      b.collect().foreach { r =>
        got += (r.getLong(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))
      }
    }

    // full-row equality against the batch twin — not just key sets:
    // the survivor (first_ts, keeper) is pinned, so every column must
    // agree with the deterministic batch aggregate
    val want = graft.queries.StreamQueries.defs("st_dedup")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(want.nonEmpty && got == want)
  }

  test("stream-stream attribution join matches the batch twin") {
    val dir = Files.createTempDirectory("evattr").toString
    val ckpt = Files.createTempDirectory("evattrck").toString
    Files.copy(Paths.get(s"$sf0001/events.parquet"),
      Paths.get(s"$dir/events.parquet"))

    // two filtered views over ONE file stream — clicks and purchases
    // are separate streaming frames joined with event-time bounds
    val ev = EventStream.readEvents(spark, dir)
    val join = EventStream.attributeJoin(ev)
    var got = Set.empty[(Long, Long, Long, Long)]
    EventStream.runAvailableNow(join, ckpt, mode = "append") { (b, _) =>
      b.collect().foreach(r =>
        got += ((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))))
    }

    val want = graft.queries.StreamQueries.defs("st_attrib_join")(
      spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(want.nonEmpty, "attribution join is vacuous at sf0.001")
    assert(got == want)
  }

  test("AvailableNow new-rows anti-join matches the batch s7 query") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("evs7").toString
    val ckpt = Files.createTempDirectory("evs7ck").toString
    Files.copy(Paths.get(s"$sf0001/part.parquet"),
      Paths.get(s"$dir/part.parquet"))
    val schema = spark.read.parquet(s"$dir/part.parquet").schema
    val incoming = spark.readStream.schema(schema).parquet(dir)
    val existing = graft.core.Tables.lineitem(spark, sf0001)
      .filter(col("l_quantity") > 45)
    val newRows = EventStream.newRowsAntiJoin(incoming, existing,
      "p_partkey", "l_partkey").select("p_partkey")
    var got = Set.empty[Long]
    EventStream.runAvailableNow(newRows, ckpt, mode = "append") { (b, _) =>
      got ++= b.collect().map(_.getLong(0))
    }
    val want = graft.queries.JoinQueries.defs("s7_new_anti")(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    assert(want.nonEmpty && got == want)
  }

  test("AvailableNow modified-rows semi-join matches the batch s8 query") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("evs8").toString
    val ckpt = Files.createTempDirectory("evs8ck").toString
    Files.copy(Paths.get(s"$sf0001/orders.parquet"),
      Paths.get(s"$dir/orders.parquet"))
    val schema = spark.read.parquet(s"$dir/orders.parquet").schema
    val incoming = spark.readStream.schema(schema).parquet(dir)
    val existing = graft.core.Tables.lineitem(spark, sf0001)
    val changed = EventStream.modifiedSemiJoin(incoming, existing,
      col("o_orderkey") === col("l_orderkey") &&
        datediff(col("l_shipdate").cast("date"),
          col("o_orderdate").cast("date")) > 100)
      .select("o_orderkey")
    var got = Set.empty[Long]
    EventStream.runAvailableNow(changed, ckpt, mode = "append") { (b, _) =>
      got ++= b.collect().map(_.getLong(0))
    }
    val want = graft.queries.JoinQueries.defs("s8_modified_semi")(
      spark, sf0001).collect().map(_.getLong(0)).toSet
    assert(want.nonEmpty && got == want)
  }

  test("cross-corpus span probe is invariant under micro-batch splits") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    val dir = Files.createTempDirectory("evxs").toString
    val ckpt = Files.createTempDirectory("evxsck").toString
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val incoming = docs.filter(col("doc_id") % 5 === 0)
    // stage the incoming half as TWO separate files so AvailableNow
    // with maxFilesPerTrigger=1 runs TWO micro-batches — exercising
    // crossDupSpansAgainst's batch-split-invariance claim, not just
    // the trivial single-batch case
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("evxsstage").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(s"$dir/$name"))
    }
    stage(incoming.filter(col("doc_id") % 2 === 0), "a.parquet")
    stage(incoming.filter(col("doc_id") % 2 =!= 0), "b.parquet")
    val seen = Dedup.existingGramSet(
      docs.filter(col("doc_id") % 5 =!= 0), "text").localCheckpoint(true)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    var got = Set.empty[Seq[Any]]
    var batches = 0
    EventStream.runAvailableNow(stream, ckpt, mode = "append") { (b, _) =>
      batches += 1
      got ++= Dedup.crossDupSpansAgainst(b, seen, "doc_id", "text")
        .collect().map(_.toSeq)
    }
    assert(batches >= 2, s"expected >= 2 micro-batches, got $batches")
    val want = Dedup.crossDupSpans(incoming,
        docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text")
      .collect().map(_.toSeq).toSet
    assert(want.nonEmpty && got == want)
  }

  test("streaming ANN probe is invariant under query micro-batch splits") {
    import org.apache.spark.sql.functions._
    import graft.operators.Quantization
    val dir = Files.createTempDirectory("evap").toString
    val ckpt = Files.createTempDirectory("evapck").toString
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 10 === 0)
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("evapstage").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(s"$dir/$name"))
    }
    stage(queries.filter(col("vec_id") % 20 === 0), "a.parquet")
    stage(queries.filter(col("vec_id") % 20 =!= 0), "b.parquet")
    val idx = Quantization.ivfPqIndex(emb, "vec_id", "embedding",
      nlist = 4, coarseIters = 2, m = 4, ksub = 4, pqIters = 2)
    val stream = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    var got = Set.empty[Seq[Any]]
    var batches = 0
    EventStream.runAvailableNow(stream, ckpt, mode = "append") { (b, _) =>
      batches += 1
      got ++= Quantization.ivfPqSearch(b, "vec_id", "embedding",
        idx, nprobe = 2, topK = 3).collect().map(_.toSeq)
    }
    assert(batches >= 2, s"expected >= 2 micro-batches, got $batches")
    val want = Quantization.ivfPqTopK(emb, "vec_id", "embedding",
        nlist = 4, coarseIters = 2, m = 4, ksub = 4, pqIters = 2,
        nprobe = 2, topK = 3, queryFilter = col("id") % 10 === 0)
      .collect().map(_.toSeq).toSet
    assert(want.nonEmpty && got == want)
  }

  test("folded rollup maintenance is invariant under micro-batch splits") {
    import org.apache.spark.sql.functions._
    import graft.operators.Incremental
    val dir = Files.createTempDirectory("evir").toString
    val ckpt = Files.createTempDirectory("evirck").toString
    val events = graft.core.Tables.events(spark, sf0001)
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("evirstage").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(s"$dir/$name"))
    }
    // the staged halves are already ts-normalized (long nanos), so the
    // stream reads them with a long schema directly
    stage(events.filter(col("event_id") % 2 === 0), "a.parquet")
    stage(events.filter(col("event_id") % 2 =!= 0), "b.parquet")
    def partial(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n"), min("ts").as("lo"), max("ts").as("hi"))
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$dir/a.parquet").schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    var state: Option[org.apache.spark.sql.DataFrame] = None
    var batches = 0
    EventStream.runAvailableNow(stream, ckpt, mode = "append") { (b, _) =>
      batches += 1
      val pa = partial(b)
      state = Some((state match {
        case None => pa
        case Some(prev) => Incremental.mergeRollups(Seq(prev, pa),
          Seq("user_id", "event_type"),
          Seq("n" -> "sum", "lo" -> "min", "hi" -> "max"))
      }).localCheckpoint(true))
    }
    assert(batches >= 2, s"expected >= 2 micro-batches, got $batches")
    val got = state.get.collect().map(_.toSeq).toSet
    val want = partial(events).collect().map(_.toSeq).toSet
    assert(want.nonEmpty && got == want)
  }

  test("streaming cross-corpus near-dup is invariant under batch splits") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    val dir = Files.createTempDirectory("evxn").toString
    val ckpt = Files.createTempDirectory("evxnck").toString
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val incoming = docs.filter(col("doc_id") % 7 === 0)
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("evxnstage").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(s"$dir/$name"))
    }
    stage(incoming.filter(col("doc_id") % 2 === 0), "a.parquet")
    stage(incoming.filter(col("doc_id") % 2 =!= 0), "b.parquet")
    val idx = Dedup.prefixCrossIndex(
      docs.filter(col("doc_id") % 7 =!= 0), "doc_id", "text",
      k = 5, theta = 0.5)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    var got = Set.empty[Seq[Any]]
    var batches = 0
    EventStream.runAvailableNow(stream, ckpt, mode = "append") { (b, _) =>
      batches += 1
      got ++= Dedup.prefixCrossJaccardAgainst(b, idx, "doc_id", "text")
        .collect().map(_.toSeq)
    }
    assert(batches >= 2, s"expected >= 2 micro-batches, got $batches")
    val want = Dedup.prefixCrossJaccard(incoming,
        docs.filter(col("doc_id") % 7 =!= 0), "doc_id", "text",
        k = 5, theta = 0.5)
      .collect().map(_.toSeq).toSet
    assert(want.nonEmpty && got == want)
  }

  test("streaming decontamination is invariant under micro-batch splits") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    val dir = Files.createTempDirectory("evdc").toString
    val ckpt = Files.createTempDirectory("evdcck").toString
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("evdcstage").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(s"$dir/$name"))
    }
    stage(docs.filter(col("doc_id") % 2 === 0), "a.parquet")
    stage(docs.filter(col("doc_id") % 2 =!= 0), "b.parquet")
    val bench = docs.filter(col("doc_id") % 37 === 0)
      .select(concat_ws(" ",
        slice(split(col("text"), "\\s+"), 1, 15)).as("btext"))
      .localCheckpoint(true)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    var got = Set.empty[Seq[Any]]
    var batches = 0
    EventStream.runAvailableNow(stream, ckpt, mode = "append") { (b, _) =>
      batches += 1
      got ++= Dedup.decontaminate(b, "doc_id", "text", bench, "btext")
        .collect().map(_.toSeq)
    }
    assert(batches >= 2, s"expected >= 2 micro-batches, got $batches")
    val want = Dedup.decontaminate(docs, "doc_id", "text", bench, "btext")
      .collect().map(_.toSeq).toSet
    assert(want.nonEmpty && got == want)
  }

  test("streaming upsert sink folds to the same state as the batch MERGE") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("evups").toString
    val ckpt = Files.createTempDirectory("evupsck").toString
    val store = Files.createTempDirectory("evupsstore").toString
    // incoming stream = the customer table staged as a file source
    Files.copy(Paths.get(s"$sf0001/customer.parquet"),
      Paths.get(s"$dir/customer.parquet"))
    val customer = spark.read.parquet(s"$sf0001/customer.parquet")
      .select(col("c_custkey"), col("c_name"))
    // initial store: stale names for low keys plus store-only rows
    val initial = customer.filter(col("c_custkey") <= 40)
      .select(col("c_custkey"), concat(lit("OLD "), col("c_name")).as("c_name"))
      .unionByName(customer.filter(col("c_custkey") <= 5)
        .select((col("c_custkey") + 1000000).as("c_custkey"), col("c_name")))

    val ups = new EventStream.UpsertStore(spark, store, initial, "c_custkey")
    val incoming = spark.readStream.schema(spark.read
        .parquet(s"$dir/customer.parquet").schema).parquet(dir)
      .select(col("c_custkey"), col("c_name"))
    EventStream.runAvailableNow(incoming, ckpt, mode = "append")(ups.sink)

    val want = graft.sources.AlibStore.upsert(initial, customer, "c_custkey")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val got = ups.current.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == want)
    // incoming wins: no stale names survive; store-only rows do
    assert(!got.exists(_._2.startsWith("OLD ")))
    assert(got.count(_._1 > 1000000) == 5)
  }
}
