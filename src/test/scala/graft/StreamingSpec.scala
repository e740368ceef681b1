package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.Event

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(minute: Int): Timestamp = new Timestamp(86400000L + minute * 60000L)

  test("hourlyAggregate: tumbling windows close as the watermark advances") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val agg = StreamingOps.hourlyAggregate(
      mem.toDF().withColumn("event_type", lit("click")), "ts", "10 minutes")
    val q = agg.writeStream.format("memory").queryName("hourly")
      .outputMode("append").start()
    try {
      mem.addData(Event(1, ts(5), 1, 1.0), Event(1, ts(20), 2, 2.0))   // hour 0
      q.processAllAvailable()
      mem.addData(Event(1, ts(130), 3, 5.0))                           // hour 2 -> closes hour 0
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_type, n, total_value FROM hourly").collect()
      assert(rows.length == 1)
      assert(rows.head.getLong(1) == 2 && rows.head.getDouble(2) == 3.0)
    } finally q.stop()
  }

  test("sessionize: gap splits sessions, watermark timeout emits them") {
    import spark.implicits._
    implicit val s = spark
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val sessions = StreamingOps.sessionize(mem.toDS(), gapMs = 10 * 60000L)
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: events at minute 0 and 5 (one session), then 30 (new session)
      mem.addData(Event(1, ts(0), 1, 1.0), Event(1, ts(5), 2, 2.0))
      q.processAllAvailable()
      mem.addData(Event(1, ts(30), 3, 4.0))   // gap 25 min > 10 -> splits
      q.processAllAvailable()
      mem.addData(Event(2, ts(120), 4, 8.0))  // advance watermark far -> times out session 2
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, n_events, total_value FROM sessions ORDER BY session_start_ms").collect()
      assert(rows.length >= 2)
      val first = rows.head
      assert(first.getLong(0) == 1 && first.getLong(1) == 2 && first.getDouble(2) == 3.0)
      val second = rows(1)
      assert(second.getLong(0) == 1 && second.getLong(1) == 1 && second.getDouble(2) == 4.0)
    } finally q.stop()
  }

  test("dedupStream drops duplicate ids within the watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val out = StreamingOps.dedupStream(mem.toDF(), "event_id", "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData(Event(1, ts(0), 100, 1.0), Event(1, ts(1), 100, 1.0), Event(2, ts(2), 101, 2.0))
      q.processAllAvailable()
      mem.addData(Event(1, ts(3), 100, 1.0))   // duplicate id again, within watermark
      q.processAllAvailable()
      val n = spark.sql("SELECT count(DISTINCT event_id) c, count(*) n FROM dedup_out").head
      assert(n.getLong(0) == 2 && n.getLong(1) == 2)
    } finally q.stop()
  }

  test("stream-stream interval join: purchases joined to recent clicks") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val c = clicks.toDF().withWatermark("ts", "10 minutes")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("event_id").as("click_id"))
    val p = purchases.toDF().withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
    // each purchase joined to clicks within the prior 30 minutes
    val joined = p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - org.apache.spark.sql.functions.expr("INTERVAL 30 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      clicks.addData(Event(1, ts(0), 10, 0), Event(1, ts(50), 11, 0), Event(2, ts(5), 12, 0))
      purchases.addData(Event(1, ts(20), 20, 9.99))   // joins click 10 (20 min before)
      q.processAllAvailable()
      val rows = spark.sql("SELECT purchase_id, click_id FROM ss_join").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((20L, 10L)))                 // click 11 is later; click 12 other user
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join: unmatched click null-pads after watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val c = clicks.toDF().withWatermark("ts", "10 minutes")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("event_id").as("click_id"))
    val p = purchases.toDF().withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
    // every click emits; purchase within the NEXT 30 minutes if one exists
    val joined = c.join(p,
      col("p_user") === col("c_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"),
      "left_outer")
    val q = joined.writeStream.format("memory").queryName("ss_left")
      .outputMode("append").start()
    try {
      clicks.addData(Event(1, ts(0), 10, 0), Event(2, ts(0), 11, 0))
      purchases.addData(Event(1, ts(20), 20, 9.99))   // converts click 10
      q.processAllAvailable()
      // click 11 cannot null-pad yet: its join window is open until the
      // watermark passes ts(0) + 30min on BOTH streams
      val early = spark.sql("SELECT click_id FROM ss_left WHERE purchase_id IS NULL").count()
      assert(early == 0)
      clicks.addData(Event(9, ts(120), 90, 0))        // advance both watermarks
      purchases.addData(Event(9, ts(120), 91, 0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT click_id, purchase_id FROM ss_left").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(rows.contains((10L, 20L)), rows)          // matched pair
      assert(rows.contains((11L, -1L)), rows)          // null-padded after close
    } finally q.stop()
  }

  test("slidingCounts: events land in overlapping windows, closed by the watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val agg = StreamingOps.slidingCounts(
      mem.toDF().withColumn("event_type", lit("click")), "ts", "10 minutes",
      width = "60 minutes", slide = "30 minutes")
    val q = agg.writeStream.format("memory").queryName("sliding")
      .outputMode("append").start()
    try {
      mem.addData(Event(1, ts(40), 1, 1.0))   // windows [0,60) and [30,90)
      q.processAllAvailable()
      mem.addData(Event(1, ts(200), 2, 1.0))  // advances watermark, closes both
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT CAST(unix_millis(window.start) AS BIGINT) / 60000 - 1440 AS m, n FROM sliding")
        .collect().map(r => r.getDouble(0).toLong -> r.getLong(1)).toMap
      assert(rows == Map(0L -> 1L, 30L -> 1L))  // one event, two overlapping windows
    } finally q.stop()
  }

  test("batch Column code runs unchanged on a stream: text quality scoring") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import graft.text.TextFns
    val mem = MemoryStream[(Long, String)]
    val scored = mem.toDF().toDF("doc_id", "text")
      .select(col("doc_id"), TextFns.qualityScore(col("text")).as("q"),
        TextFns.langId(col("text")).as("lang"))
    val q = scored.writeStream.format("memory").queryName("scored")
      .outputMode("append").start()
    try {
      val texts = Seq((1L, "the cat and the dog of the house is in town"),
        (2L, "el la de que los"))
      mem.addData(texts: _*)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, q, lang FROM scored")
        .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2)))).toMap
      // identical Column expressions evaluated in batch
      val batch = texts.toDF("doc_id", "text")
        .select(col("doc_id"), TextFns.qualityScore(col("text")).as("q"),
          TextFns.langId(col("text")).as("lang"))
        .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2)))).toMap
      assert(streamed == batch && batch(2L)._2 == "es")
    } finally q.stop()
  }

  test("PQ encode on a stream: offline-trained codebook, streaming ingest path") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // the serving shape: codebook trained on the batch corpus, applied
    // as the same scan-stage expression to vectors arriving on a stream
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cb = graft.similarity.Pq.train(emb, "embedding", "vec_id", m = 8, k = 16)
    val sample = emb.limit(5).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val mem = MemoryStream[(Long, Seq[Float])]
    val encoded = mem.toDF().toDF("vec_id", "embedding")
      .select(col("vec_id"), graft.similarity.Pq.encodeCol(
        graft.similarity.Similarity.toDouble(col("embedding")), cb).as("codes"))
    val q = encoded.writeStream.format("memory").queryName("pq_stream")
      .outputMode("append").start()
    try {
      mem.addData(sample.toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT vec_id, codes FROM pq_stream")
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      val batch = graft.similarity.Pq.encode(emb.limit(5), "embedding", "vec_id", cb)
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      assert(streamed == batch && streamed.size == 5)
    } finally q.stop()
  }

  test("partitionOverwriteSink: replayed partitions converge instead of duplicating") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString + "/out"
    val mem = MemoryStream[Event]
    val agg = mem.toDF()
      .withColumn("event_type", when(col("event_id") % 2 === 0, "click").otherwise("view"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val q = StreamingOps.partitionOverwriteSink(agg, dir, "event_type").start()
    try {
      mem.addData(Event(1, ts(0), 1, 1.0), Event(1, ts(1), 2, 1.0))
      q.processAllAvailable()
      mem.addData(Event(1, ts(2), 4, 1.0))   // more clicks -> click partition rewritten
      q.processAllAvailable()
      val out = spark.read.parquet(dir).collect()
        .map(r => r.getString(1) -> r.getLong(0)).toMap
      assert(out == Map("click" -> 2L, "view" -> 1L), out.toString)
    } finally q.stop()
  }

  test("cdcSnapshotSink: change stream folds into a versioned snapshot, latest-wins per batch") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc").toString + "/snap"
    val mem = MemoryStream[(Long, String, Long, String)]
    val q = StreamingOps.cdcSnapshotSink(
      mem.toDF().toDF("k", "v", "seq", "op"), dir, "k", "seq", "op").start()
    try {
      // batch 0: inserts
      mem.addData((1L, "a", 1L, "insert"), (2L, "b", 1L, "insert"))
      q.processAllAvailable()
      assert(StreamingOps.latestSnapshot(spark, dir)
        .as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
      // batch 1: update 1, delete 2, insert 3 — with an intra-batch
      // override chain on key 3 (insert then delete then re-insert)
      mem.addData((1L, "a2", 1L, "update"), (2L, "b", 2L, "delete"),
        (3L, "x", 1L, "insert"), (3L, "x", 2L, "delete"), (3L, "c", 3L, "insert"))
      q.processAllAvailable()
      assert(StreamingOps.latestSnapshot(spark, dir)
        .as[(Long, String)].collect().toSet == Set((1L, "a2"), (3L, "c")))
      // prior version still readable (time-travel style)
      assert(spark.read.parquet(s"$dir/v0").count() == 2)
    } finally q.stop()
  }

  test("watermark drops late data: an event older than the watermark never lands") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val agg = StreamingOps.hourlyAggregate(
      mem.toDF().withColumn("event_type", lit("click")), "ts", "10 minutes")
    val q = agg.writeStream.format("memory").queryName("late_drop")
      .outputMode("append").start()
    try {
      mem.addData(Event(1, ts(30), 1, 1.0))    // hour 0
      q.processAllAvailable()
      mem.addData(Event(1, ts(300), 2, 1.0))   // hour 5 -> watermark ~4:50, closes hour 0
      q.processAllAvailable()
      mem.addData(Event(1, ts(35), 3, 99.0))   // LATE: hour 0 is closed -> dropped
      q.processAllAvailable()
      mem.addData(Event(1, ts(600), 4, 1.0))   // advance further; closes hour 5
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT CAST(unix_millis(window.start) AS BIGINT)/3600000 - 24 AS h, n, total_value FROM late_drop")
        .collect().map(r => (r.getDouble(0).toLong, r.getLong(1), r.getDouble(2))).toSet
      // hour 0 emitted with ONLY the on-time event; the late 99.0 never appears
      assert(rows.contains((0L, 1L, 1.0)), rows.toString)
      assert(!rows.exists(r => r._3 == 99.0 || r._3 == 100.0), rows.toString)
    } finally q.stop()
  }

  test("RocksDB state store backs stateful streaming (production state backend)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Event]
      val agg = StreamingOps.hourlyAggregate(
        mem.toDF().withColumn("event_type", lit("click")), "ts", "10 minutes")
      val q = agg.writeStream.format("memory").queryName("rocksdb_hourly")
        .outputMode("append").start()
      try {
        mem.addData(Event(1, ts(5), 1, 1.0), Event(1, ts(20), 2, 2.0))
        q.processAllAvailable()
        mem.addData(Event(1, ts(130), 3, 5.0))
        q.processAllAvailable()
        val rows = spark.sql("SELECT n, total_value FROM rocksdb_hourly").collect()
        assert(rows.length == 1 && rows.head.getLong(0) == 2 && rows.head.getDouble(1) == 3.0)
        // the state store in use really is RocksDB (its custom metrics
        // appear in the progress report)
        assert(q.lastProgress.stateOperators.nonEmpty)
        assert(q.lastProgress.json.toLowerCase.contains("rocksdb"), q.lastProgress.json)
      } finally q.stop()
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("transformWithState running totals accumulate across micro-batches (Spark 4 arbitrary state)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    // transformWithState's backend contract is the RocksDB provider
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Event]
      val q = StreamingOps.runningTotals(mem.toDS())
        .writeStream.format("memory").queryName("tws_totals")
        .outputMode("update").start()
      try {
        mem.addData(Event(1, ts(1), 1, 2.0), Event(1, ts(2), 2, 3.0), Event(2, ts(3), 3, 7.0))
        q.processAllAvailable()
        val b1 = spark.sql("SELECT * FROM tws_totals").as[StreamingOps.RunningTotal]
          .collect().map(r => r.user_id -> r).toMap
        assert(b1(1L) == StreamingOps.RunningTotal(1L, 2L, 5.0))
        assert(b1(2L) == StreamingOps.RunningTotal(2L, 1L, 7.0))
        // second micro-batch folds into surviving state, not from zero
        mem.addData(Event(1, ts(9), 4, 10.0))
        q.processAllAvailable()
        val b2 = spark.sql("SELECT * FROM tws_totals").as[StreamingOps.RunningTotal]
          .collect().filter(_.user_id == 1L)
        assert(b2.contains(StreamingOps.RunningTotal(1L, 3L, 15.0)), b2.mkString(","))
      } finally q.stop()
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streamingEwma folds the recurrence across micro-batches, keys isolated") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Event]
      val q = StreamingOps.streamingEwma(mem.toDS(), alpha = 0.5)
        .writeStream.format("memory").queryName("tws_ewma")
        .outputMode("update").start()
      try {
        mem.addData(Event(1, ts(1), 1, 2.0), Event(1, ts(2), 2, 4.0), Event(2, ts(3), 3, 9.0))
        q.processAllAvailable()
        val b1 = spark.sql("SELECT * FROM tws_ewma").as[StreamingOps.EwmaState]
          .collect().map(r => r.user_id -> r).toMap
        assert(b1(1L) == StreamingOps.EwmaState(1L, 2L, 2.0 * 0.5 + 4.0))
        assert(b1(2L) == StreamingOps.EwmaState(2L, 1L, 9.0))
        // the recurrence continues from state, not from zero — exactly
        // the batch fold over the concatenated history
        mem.addData(Event(1, ts(9), 4, 8.0))
        q.processAllAvailable()
        val b2 = spark.sql("SELECT * FROM tws_ewma").as[StreamingOps.EwmaState]
          .collect().filter(_.user_id == 1L)
        assert(b2.contains(StreamingOps.EwmaState(1L, 3L, (2.0 * 0.5 + 4.0) * 0.5 + 8.0)),
          b2.mkString(","))
      } finally q.stop()
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("Trigger.AvailableNow drains a file source incrementally and terminates") {
    // the periodic-incremental-job pattern: process everything available,
    // checkpoint, exit — rerunnable on a schedule with exactly-once state
    val src = java.nio.file.Files.createTempDirectory("graft-avail").toString
    val chk = java.nio.file.Files.createTempDirectory("graft-avail-chk").toString
    val out = java.nio.file.Files.createTempDirectory("graft-avail-out").toString + "/t"
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    ev.limit(100).write.mode("overwrite").parquet(src)
    def drain(): Unit = {
      val q = spark.readStream.schema(ev.schema).parquet(src)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", chk)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      assert(!q.isActive) // AvailableNow terminates on its own
    }
    drain()
    val afterFirst = spark.read.parquet(out).count()
    assert(afterFirst == 100)
    // new files land; a SECOND scheduled run picks up ONLY the delta
    ev.orderBy(col("event_id").desc).limit(40).write.mode("append").parquet(src)
    drain()
    assert(spark.read.parquet(out).count() == afterFirst + 40)
  }

  test("stream/batch parity: streaming hourly aggregate reproduces the batch answer") {
    import spark.implicits._
    // batch truth on real sf0.001 events (decimal-exact sums like the query)
    val batch = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("hour_bucket", expr("ts div 3600000000000"))
      .groupBy(col("hour_bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap

    // stream the SAME rows through the windowed streaming aggregate
    // (file sources need a directory -> stage the NORMALIZED table; a raw
    // file copy would re-expose whatever physical ts type this testdata
    // generation used, while Tables.events pins the epoch-nanos contract)
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val evn = Tables.events(spark, "/root/testdata/sf0.001")
    evn.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(evn.schema).parquet(dir)
      .withColumn("ts_ts", expr("timestamp_micros(ts div 1000)"))
      .withColumn("value", col("value").cast("decimal(18,2)"))
    val agg = StreamingOps.hourlyAggregate(stream, "ts_ts", "1 hour")
    val q = agg.writeStream.format("memory").queryName("parity")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
        """SELECT CAST(unix_micros(window.start) AS BIGINT) div 3600000000 AS hb,
                  event_type, n, CAST(total_value AS DOUBLE) AS tv FROM parity""")
        .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
      assert(streamed.size == batch.size)
      batch.foreach { case (k, v) =>
        assert(streamed.get(k).contains(v), s"mismatch at $k: ${streamed.get(k)} vs $v")
      }
    } finally q.stop()
  }

  test("streamingNearDupCandidates pairs near-dups ACROSS micro-batches, unrelated docs never pair") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, String)]
      val cand = StreamingOps.streamingNearDupCandidates(
        mem.toDF().toDF("doc_id", "text"), "text", "doc_id")
      val q = cand.writeStream.format("memory").queryName("near_dup_cand")
        .outputMode("append").start()
      try {
        mem.addData((1L, "the quick brown fox jumps over the lazy dog tonight"))
        q.processAllAvailable()
        // batch 2: a near-dup of doc 1 (one word changed) + an unrelated doc
        mem.addData(
          (2L, "the quick brown fox jumps over the lazy cat tonight"),
          (3L, "completely different content with no shared trigrams at all here"))
        q.processAllAvailable()
        val pairs = spark.sql("SELECT DISTINCT id_a, id_b FROM near_dup_cand")
          .as[(Long, Long)].collect().toSet
        assert(pairs.contains((1L, 2L)), pairs) // cross-batch near-dup found
        assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), pairs)
      } finally q.stop()
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streamingDedupVerified: cross-batch dup candidates+verifies+drops; false candidate is cleared") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("stream_dedup").toString
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.streamingDedupVerified(
        mem.toDF().toDF("doc_id", "text"), "text", "doc_id", dir, minJaccard = 0.8)
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      val base = "the quick brown fox jumps over the lazy dog tonight in the park"
      mem.addData((1L, base))
      q.processAllAvailable()
      mem.addData(
        // near-dup of doc 1 (one word changed): must candidate, verify
        // above 0.8, and DROP
        (2L, base.replace("park", "rain")),
        // shares a long shingle run with doc 1 (~1/3 of the union — all
        // but certain some band minimum collides -> candidate) but true
        // jaccard ~0.35: the verify stage must CLEAR it
        (3L, "the quick brown fox jumps over the lazy elephant in a faraway circus tent"),
        // unrelated: never even a candidate
        (4L, "completely different content with no shared trigrams at all here"))
      q.processAllAvailable()
      val pairs = spark.read.parquet(s"$dir/pairs")
        .select("id_a", "id_b", "dropped")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(2)).toMap
      // the true near-dup candidates across batches and drops
      assert(pairs.get((1L, 2L)).contains(true), pairs)
      // the false candidate was proposed by LSH but cleared by verify
      assert(pairs.get((1L, 3L)).contains(false), pairs)
      // unrelated doc never candidates
      assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L), pairs)
      // maintained keep-list: everything but the verified duplicate
      val kept = StreamingOps.currentKeepList(spark, dir)
        .select("doc_id").as[Long].collect().toSet
      assert(kept == Set(1L, 3L, 4L))
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  // Streaming has no DuckDB oracle (the harness oracles batch parquet),
  // so this differential against the oracle-checked batch mirror is the
  // strongest correctness check available for the streaming dedup path:
  // identical docs through both pipelines must yield identical verified
  // duplicate pairs and identical surviving corpora. The corpus keeps
  // every dup group at 2 members, where the streaming first-seen-vs-later
  // pairing and the batch all-pairs bucket pairing provably see the SAME
  // pairs (a 3+ group agrees only on the keep-list: streaming pairs
  // through the bucket's first doc while batch also pairs later members
  // with each other — components still collapse identically).
  test("batch-vs-stream differential: streaming dedup reproduces the batch mirror") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("stream_diff").toString
    val mem = MemoryStream[(Long, String)]
    val base = "the quick brown fox jumps over the lazy dog tonight in the park"
    val batch1 = Seq(
      1L -> base,
      5L -> "an entirely separate report about quarterly financial results and revenue growth")
    val batch2 = Seq(
      // cross-batch near-dup of doc 1 (one word changed): both paths drop it
      2L -> base.replace("park", "rain"),
      // false candidate vs doc 1 (shares a shingle run, true jaccard ~0.35):
      // the verify stage must clear it in BOTH paths
      3L -> "the quick brown fox jumps over the lazy elephant in a faraway circus tent",
      // unrelated
      4L -> "completely different content with no shared trigrams at all here",
      // cross-batch EXACT dup of doc 5: the batch mirror's md5 path and the
      // streaming jaccard-1.0 path must agree
      6L -> "an entirely separate report about quarterly financial results and revenue growth")
    val q = StreamingOps.streamingDedupVerified(
        mem.toDF().toDF("doc_id", "text"), "text", "doc_id", dir, minJaccard = 0.8)
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()

      val allDocs = (batch1 ++ batch2).toDF("doc_id", "text")

      // keep-list equality: the streaming survivors ARE the batch keeps
      val batchKeep = graft.dedup.Dedup
        .dedupCorpusVerified(allDocs, "text", "doc_id", minJaccard = 0.8)
        .filter(col("keep")).select(col("id")).as[Long].collect().toSet
      val streamKeep = StreamingOps.currentKeepList(spark, dir)
        .select(col("doc_id")).as[Long].collect().toSet
      assert(streamKeep == batchKeep, s"stream $streamKeep vs batch $batchKeep")
      assert(streamKeep == Set(1L, 3L, 4L, 5L))

      // verified-pair equality: streaming dropped pairs = batch verified
      // near-dup pairs ∪ batch exact-dup pairs
      val streamDropped = spark.read.parquet(s"$dir/pairs")
        .filter(col("dropped"))
        .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
      val cand = graft.dedup.Dedup
        .minhashCandidates(allDocs, "text", "doc_id").select(col("id_a"), col("id_b"))
      val batchFuzzy = graft.dedup.Dedup
        .jaccardOnPairs(allDocs, "text", "doc_id", cand, "id_a", "id_b", n = 3)
        .filter(col("jaccard") >= 0.8)
        .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
      val exact = graft.dedup.Dedup
        .exactByContent(allDocs, "text", "doc_id").filter(col("n_copies") > 1)
      val batchExact = allDocs
        .select(md5(col("text")).as("text_hash"), col("doc_id").as("other_id"))
        .join(exact, "text_hash").filter(col("other_id") > col("keep_id"))
        .select(col("keep_id"), col("other_id")).as[(Long, Long)].collect().toSet
      assert(streamDropped == (batchFuzzy ++ batchExact),
        s"stream $streamDropped vs batch fuzzy $batchFuzzy + exact $batchExact")

      // the false candidate was examined and CLEARED by the streaming
      // verify (present in the audit trail, not dropped)
      val cleared = spark.read.parquet(s"$dir/pairs").filter(!col("dropped"))
        .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
      assert(cleared.contains((1L, 3L)), cleared)
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("purchaseAttribution: stream-stream join matches clicks in the hour before each purchase") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val joined = StreamingOps.purchaseAttribution(
      purchases.toDF(), clicks.toDF(), watermark = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      clicks.addData(Event(1, ts(0), 10, 0.0), Event(1, ts(30), 11, 0.0),
        Event(2, ts(35), 13, 0.0))
      purchases.addData(Event(1, ts(40), 1, 9.99), Event(1, ts(80), 2, 5.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT purchase_id, click_id FROM attrib ORDER BY purchase_id, click_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      // p1@40 matches clicks at 0 and 30 (both within the preceding hour);
      // p2@80 matches only the click at 30 (the one at 0 is 80 min stale);
      // user 2's click never crosses users
      assert(rows == Seq((1L, 10L), (1L, 11L), (2L, 11L)))
    } finally q.stop()
  }

  test("streamingHeavyHitters: stateful sketch equals the batch sketch in the exact regime") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[String]
    val q = StreamingOps.streamingHeavyHitters(mem.toDF().toDF("v"), "v",
        capacity = 16)
      .writeStream.outputMode("complete").format("memory")
      .queryName("shh").start()
    try {
      val b1 = Seq("a", "a", "b", "c", "a")
      val b2 = Seq("b", "b", "b", "d", "a")
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
      val streamed = spark.table("shh").head.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getString(0), r.getLong(1))).toSet
      val batch = (b1 ++ b2).toDF("v").groupBy()
        .agg(graft.functions.SpaceSavingAgg.spaceSaving(col("v"), 16).as("hh"))
        .head.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(streamed == batch)
      assert(streamed.contains(("b", 4L)) && streamed.contains(("a", 4L)))
    } finally q.stop()
  }

  test("manifestSink: the running manifest equals the batch manifest of all rows so far") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("stream_manifest").toString
    val mem = MemoryStream[(Long, String, String)]
    val b1 = Seq((1L, "p", "aa"), (2L, "q", "bb"))
    val b2 = Seq((3L, "p", "cc"), (4L, "p", "dd"), (5L, "r", "ee"))
    val q = StreamingOps.manifestSink(
        mem.toDF().toDF("id", "part", "text"), s"$dir/m", "part", "id", "text")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      def manifestOf(rows: Seq[(Long, String, String)]) =
        graft.operators.Profile
          .contentManifest(rows.toDF("id", "part", "text"), Seq("part"), "id", "text")
          .as[(String, Long, Long, Long, Long)].collect().toSet
      mem.addData(b1: _*)
      q.processAllAvailable()
      assert(StreamingOps.latestManifest(spark, s"$dir/m")
        .as[(String, Long, Long, Long, Long)].collect().toSet == manifestOf(b1))
      mem.addData(b2: _*)
      q.processAllAvailable()
      // the merged manifest is indistinguishable from a from-scratch batch run
      assert(StreamingOps.latestManifest(spark, s"$dir/m")
        .as[(String, Long, Long, Long, Long)].collect().toSet == manifestOf(b1 ++ b2))
    } finally q.stop()
  }

  test("IngestPipeline: dedup + term-stats + IVF + OOV results under ONE txn identity, exactly-once under replay (r11 #5)") {
    import spark.implicits._
    import graft.pipelines.IngestPipeline
    import graft.sources.VersionedTable
    implicit val sc = spark.sqlContext

    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val nearDup = base.replace("today", "tonight")
    val other = "completely different content about spark query engines and shuffles"
    val third = "yet another unrelated paragraph describing immigration analytics fixtures"
    def emb(a: Float, b: Float) = Array(a, b, 0f, 0f)

    val root = java.nio.file.Files
      .createTempDirectory("graft-ingest-pipeline").toString
    val cfg = IngestPipeline.Config(
      textCol = "text", idCol = "doc_id", embCol = "embedding",
      dedupIndex = s"$root/dedup", statsIndex = s"$root/stats",
      ivfIndex = s"$root/ivf", resultsDir = s"$root/results",
      appId = "ingest-app",
      centroids = Seq(graft.similarity.Ivf.Centroid(0, Seq(1.0, 0, 0, 0)),
        graft.similarity.Ivf.Centroid(1, Seq(0, 1.0, 0, 0))),
      threshold = 0.5, oovGate = 0.5)

    val b0 = Seq((0L, base, emb(1f, 0f)), (2L, other, emb(0f, 1f)),
      (4L, base, emb(0.9f, 0.1f)))
    val b1 = Seq((1L, nearDup, emb(0.8f, 0f)), (5L, third, emb(0f, 0.7f)))
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-ingest-pipeline-ckpt").toString
    val mem = MemoryStream[(Long, String, Array[Float])]
    val q = IngestPipeline.streamingSink(
        mem.toDF().toDF("doc_id", "text", "embedding"), cfg)
      .option("checkpointLocation", ckpt).start()
    try {
      mem.addData(b0: _*); q.processAllAvailable()
      mem.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()

    // decision record: dedup statuses + the OOV gate. Batch 0 ingests
    // into an empty vocabulary (everything unseen -> flagged); batch
    // 1's near-dup shares the kept vocab (low OOV) while the unrelated
    // doc is all-new (flagged)
    def results() = spark.read.parquet(cfg.resultsDir)
      .select(col("id"), col("status"), col("oov_rate"), col("oov_flagged"))
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2), r.getBoolean(3)))
      .toMap
    val res = results()
    assert(res.view.mapValues(_._1).toMap == Map(
      0L -> "kept", 2L -> "kept", 4L -> "dup_within_batch",
      1L -> "dup_of_index", 5L -> "kept"))
    assert(res(0L)._3 && res(2L)._3 && res(4L)._3) // empty-vocab batch
    assert(res(1L)._2 < 0.2 && !res(1L)._3, s"near-dup OOV: ${res(1L)}")
    assert(res(5L)._2 == 1.0 && res(5L)._3)

    // dedup index: every doc seen, once
    assert(VersionedTable.read(spark, cfg.dedupIndex).count() == 5)
    // stats + IVF indexes describe exactly the KEPT corpus {0, 2, 5}
    val kept = Seq((0L, base), (2L, other), (5L, third))
    val wantStats = graft.text.IncrementalStats
      .batchPartials(kept.toDF("doc_id", "text"), "text", "doc_id")
      .groupBy(col("term")).agg(sum(col("df")).as("df"), sum(col("tf")).as("tf"))
      .collect().map(r => Option(r.getString(0)) -> (r.getLong(1), r.getLong(2))).toMap
    def statsNow() = graft.text.IncrementalStats.termStats(spark, cfg.statsIndex)
      .collect().map(r => Option(r.getString(0)) -> (r.getLong(1), r.getLong(2))).toMap
    assert(statsNow() == wantStats)
    def ivfNow() = VersionedTable.read(spark, cfg.ivfIndex)
      .select(col("id"), col("cell_id")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(ivfNow() == Map(0L -> 0, 2L -> 1, 5L -> 1))

    // checkpoint replay of micro-batch 1: every table skips its
    // append, the results partition rewrites byte-identically
    val vDedup = VersionedTable.latestVersion(cfg.dedupIndex)
    val vStats = VersionedTable.latestVersion(cfg.statsIndex)
    val vIvf = VersionedTable.latestVersion(cfg.ivfIndex)
    val vTf = VersionedTable.latestVersion(
      graft.dedup.IncrementalDedup.tokenFreqTable(cfg.dedupIndex))
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    IngestPipeline.processBatch(spark,
        b1.toDF("doc_id", "text", "embedding"), cfg, 1L)
      .write.mode("overwrite").partitionBy("__batch").parquet(cfg.resultsDir)
    assert(results() == res)
    assert(VersionedTable.latestVersion(cfg.dedupIndex) == vDedup)
    assert(VersionedTable.latestVersion(cfg.statsIndex) == vStats)
    assert(VersionedTable.latestVersion(cfg.ivfIndex) == vIvf)
    assert(VersionedTable.latestVersion(
      graft.dedup.IncrementalDedup.tokenFreqTable(cfg.dedupIndex)) == vTf)
    assert(statsNow() == wantStats)
    assert(ivfNow() == Map(0L -> 0, 2L -> 1, 5L -> 1))

    // CRASH WINDOW: batch 2's dedup commit landed but the process died
    // before stats/IVF/results — exactly the partial state a mid-batch
    // crash leaves. The replay must skip the dedup append, commit the
    // missing two, and land the same decisions.
    val b2 = Seq((7L, base + " extended with some extra tokens", emb(1f, 0.2f)))
    graft.dedup.IncrementalDedup.processBatch(spark,
      b2.toDF("doc_id", "text", "embedding"), "text", "doc_id",
      cfg.dedupIndex, cfg.threshold, 2L,
      txnApp = Some(cfg.appId), txn = Some(2L)).collect()
    val vDedup2 = VersionedTable.latestVersion(cfg.dedupIndex)
    IngestPipeline.processBatch(spark,
        b2.toDF("doc_id", "text", "embedding"), cfg, 2L)
      .write.mode("overwrite").partitionBy("__batch").parquet(cfg.resultsDir)
    assert(VersionedTable.latestVersion(cfg.dedupIndex) == vDedup2,
      "replay after partial crash re-appended the dedup index")
    assert(VersionedTable.read(spark, cfg.dedupIndex).count() == 6)
    // doc 7 is kept (J vs base below 0.5 threshold? no — planted to be
    // a kept doc) and now present in BOTH downstream indexes exactly once
    val res2 = results()
    assert(res2.keySet == Set(0L, 1L, 2L, 4L, 5L, 7L))
    assert(ivfNow().keySet == (if (res2(7L)._1 == "kept") Set(0L, 2L, 5L, 7L)
                               else Set(0L, 2L, 5L)))
  }

  test("IngestPipeline OOV gate auto-routes on vocab size; salted branch == broadcast branch (r12 #2/finding)") {
    import spark.implicits._
    import graft.pipelines.IngestPipeline

    // a corpus whose batch-1 token stream is Zipf-hot ("hot" dominates)
    // against a multi-term batch-0 vocabulary — the regime the salted
    // plan exists for, shrunk to spec scale
    def mk(i: Long, body: String) = (i, body, Array(1f, 0f, 0f, 0f))
    val b0 = (0L until 30L).map(i =>
      mk(i, s"term$i alpha beta gamma delta common tokens here w$i"))
    val b1 = (100L until 120L).map(i =>
      mk(i, ("hot " * 40) + s"novel$i unseen$i"))

    def run(saltThreshold: Long): Map[Long, (Long, Long, Double)] = {
      val root = java.nio.file.Files
        .createTempDirectory("graft-oov-route").toString
      val cfg = IngestPipeline.Config(
        textCol = "text", idCol = "doc_id", embCol = "embedding",
        dedupIndex = s"$root/dedup", statsIndex = s"$root/stats",
        ivfIndex = s"$root/ivf", resultsDir = s"$root/results",
        appId = "oov-route",
        centroids = Seq(graft.similarity.Ivf.Centroid(0, Seq(1.0, 0, 0, 0))),
        threshold = 0.5, oovGate = 0.5,
        oovSaltVocabThreshold = saltThreshold, oovSalts = 4)
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      Seq(b0, b1).zipWithIndex.foreach { case (b, i) =>
        IngestPipeline.processBatch(spark,
            b.toDF("doc_id", "text", "embedding"), cfg, i.toLong)
          .write.mode("overwrite").partitionBy("__batch")
          .parquet(cfg.resultsDir)
      }
      spark.read.parquet(cfg.resultsDir).collect()
        .map(r => r.getAs[Long]("id") ->
          ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
            r.getAs[Double]("oov_rate")))).toMap
    }

    // threshold 0 forces the SALTED sort-merge plan for every gated
    // batch; the default-sized threshold keeps the broadcast plan.
    // Identical decisions — the auto-route is a pure plan choice.
    val salted = run(saltThreshold = 0L)
    val broadcast = run(saltThreshold = 1000000L)
    assert(salted == broadcast, s"salted=$salted broadcast=$broadcast")
    // sanity: the gate really computed per-doc OOV (batch 1 is mostly
    // unseen: 40 hot + 2 novel tokens, all absent from batch 0's vocab)
    assert(salted(100L)._3 == 1.0, salted(100L))
  }

  test("IngestPipeline semantic gate: near-dup flagged against the pinned kept-corpus index; replay pure; opt-in schema") {
    import spark.implicits._
    import graft.pipelines.IngestPipeline
    import graft.sources.VersionedTable

    val tA = "the quick brown fox jumps over the lazy dog again and again today"
    val tB = "completely different content about spark query engines and shuffles"
    val tC = "yet another unrelated paragraph describing immigration analytics fixtures"
    def emb(a: Float, b: Float) = Array(a, b, 0f, 0f)

    val root = java.nio.file.Files
      .createTempDirectory("graft-ingest-pipe-sem").toString
    val cfg = IngestPipeline.Config(
      textCol = "text", idCol = "doc_id", embCol = "embedding",
      dedupIndex = s"$root/dedup", statsIndex = s"$root/stats",
      ivfIndex = s"$root/ivf", resultsDir = s"$root/results",
      appId = "ingest-sem",
      centroids = Seq(graft.similarity.Ivf.Centroid(0, Seq(1.0, 0, 0, 0)),
        graft.similarity.Ivf.Centroid(1, Seq(0, 1.0, 0, 0))),
      threshold = 0.5, oovGate = 0.5,
      semanticThreshold = Some(0.9), semanticNProbe = 1)

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    // batch 0: two distinct docs, orthogonal embeddings — no gate (index
    // empty), sem columns null
    val b0 = Seq((0L, tA, emb(1f, 0f)), (2L, tB, emb(0f, 1f)))
    val r0 = IngestPipeline.processBatch(spark,
      b0.toDF("doc_id", "text", "embedding"), cfg, 0L)
    r0.write.mode("overwrite").partitionBy("__batch").parquet(cfg.resultsDir)
    assert(r0.columns.contains("sem_dup_of") && r0.columns.contains("sem_sim"))
    assert(spark.read.parquet(cfg.resultsDir).filter(col("sem_dup_of").isNotNull)
      .count() == 0L)

    // batch 1: doc 5 is a TEXT near-dup of nothing but an EMBEDDING
    // near-dup of kept doc 0; doc 7 (a text dup of 5 — the gates are
    // independent) is semantically far from everything (cos ~0.707 to
    // doc 0, under the 0.9 bar)
    val b1 = Seq((5L, tC, emb(0.99f, 0.01f)),
      (7L, tC + " more words here", emb(0.1f, 0.1f)))
    IngestPipeline.processBatch(spark,
        b1.toDF("doc_id", "text", "embedding"), cfg, 1L)
      .write.mode("overwrite").partitionBy("__batch").parquet(cfg.resultsDir)
    def sems() = spark.read.parquet(cfg.resultsDir)
      .select(col("id"), col("status"), col("sem_dup_of"), col("sem_sim"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    val s1 = sems()
    assert(s1(5L)._1 == "kept", s1(5L)) // the gate FLAGS, never drops
    assert(s1(5L)._2 == Some(0L) && s1(5L)._3.exists(_ > 0.99), s1(5L))
    assert(s1(7L)._2.isEmpty, s1(7L))
    assert(s1(0L)._2.isEmpty && s1(2L)._2.isEmpty)

    // replay purity: ingest batch 2 whose kept doc 9 is EXACTLY doc 7's
    // embedding direction (cos 1.0), then replay batch 1 — an unpinned
    // probe would now flag doc 7 against doc 9; the pin (below batch
    // 1's original commit) must keep the record byte-identical
    IngestPipeline.processBatch(spark,
        Seq((9L, "entirely new material on columnar storage formats",
          emb(0.5f, 0.5f))).toDF("doc_id", "text", "embedding"), cfg, 2L)
      .write.mode("overwrite").partitionBy("__batch").parquet(cfg.resultsDir)
    IngestPipeline.processBatch(spark,
        b1.toDF("doc_id", "text", "embedding"), cfg, 1L)
      .write.mode("overwrite").partitionBy("__batch").parquet(cfg.resultsDir)
    val s2 = sems()
    assert(s2(5L) == s1(5L) && s2(7L) == s1(7L),
      s"replayed semantic gate diverged: ${s2(5L)} ${s2(7L)} vs ${s1(5L)} ${s1(7L)}")

    // opt-in schema: the gate off means the columns are absent
    val off = IngestPipeline.processBatch(spark,
      Seq((9L, tB + " coda", emb(0f, 0.9f)))
        .toDF("doc_id", "text", "embedding"),
      cfg.copy(semanticThreshold = None,
        dedupIndex = s"$root/dedup2", statsIndex = s"$root/stats2",
        ivfIndex = s"$root/ivf2", resultsDir = s"$root/results2",
        appId = "ingest-sem-off"), 0L)
    assert(!off.columns.contains("sem_dup_of") && !off.columns.contains("sem_sim"))
  }

  test("IngestPipeline backend differential: exact and minhash pipelines report identical decisions on a complete-recall corpus") {
    import spark.implicits._
    import graft.pipelines.IngestPipeline

    // dup-heavy corpus in the regime where banded-LSH recall is
    // complete (long shared token runs), so the two backends must agree
    // EXACTLY on every status and OOV figure
    // stride 5 so every family spans BOTH parities - the cross-index
    // dup_of_index leg is exercised, not just within-batch clustering
    val docs = (0 until 40).map { i =>
      val fam = i % 5
      val base = (0 until 14).map(w => s"fam${fam}tok$w").mkString(" ")
      (i.toLong, if (i < 5) base else base + s" variant${i / 5}",
        Array(1f, 0f, 0f, 0f))
    }
    def run(mh: Boolean): Map[Long, (String, Long, Long)] = {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-pipe-diff-$mh").toString
      val cfg = IngestPipeline.Config(
        textCol = "text", idCol = "doc_id", embCol = "embedding",
        dedupIndex = s"$root/dedup", statsIndex = s"$root/stats",
        ivfIndex = s"$root/ivf", resultsDir = s"$root/results",
        appId = s"pipe-diff-$mh",
        centroids = Seq(graft.similarity.Ivf.Centroid(0, Seq(1.0, 0, 0, 0))),
        threshold = 0.5, oovGate = 0.5,
        dedupBackend =
          if (mh) IngestPipeline.DedupBackend.MinHash()
          else IngestPipeline.DedupBackend.Exact,
        docStore = if (mh) Some(s"$root/docstore") else None)
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      Seq(0, 1).foreach { b =>
        IngestPipeline.processBatch(spark,
            docs.filter(_._1 % 2 == b).toDF("doc_id", "text", "embedding"),
            cfg, b.toLong)
          .write.mode("overwrite").partitionBy("__batch").parquet(cfg.resultsDir)
      }
      spark.read.parquet(cfg.resultsDir)
        .select(col("id"), col("status"), col("n_tokens"), col("n_oov"))
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    }
    val exact = run(mh = false)
    val minhash = run(mh = true)
    assert(exact == minhash,
      s"backends diverged:\nexact=$exact\nminhash=$minhash")
    assert(exact.values.count(_._1 == "kept") == 5, exact)
    assert(exact.values.count(_._1 == "dup_of_index") > 0, exact)
  }

  test("IngestPipeline decontamination gate: persisted bench index probed per batch; flags never drop; opt-in schema") {
    import spark.implicits._
    import graft.pipelines.IngestPipeline
    import graft.dedup.Decontaminate

    val evalA = "what is the capital of france the answer is paris of course"
    val evalB = "name the largest planet in the solar system it is jupiter"
    val clean = "completely unrelated prose about spark shuffle partitions and codegen"
    val root = java.nio.file.Files
      .createTempDirectory("graft-ingest-pipe-contam").toString
    Decontaminate.buildBenchIndex(spark,
      Seq((900L, evalA), (901L, evalB)).toDF("doc_id", "text"),
      "text", "doc_id", s"$root/bench")

    val cfg = IngestPipeline.Config(
      textCol = "text", idCol = "doc_id", embCol = "embedding",
      dedupIndex = s"$root/dedup", statsIndex = s"$root/stats",
      ivfIndex = s"$root/ivf", resultsDir = s"$root/results",
      appId = "ingest-contam",
      centroids = Seq(graft.similarity.Ivf.Centroid(0, Seq(1.0, 0, 0, 0))),
      threshold = 0.5, oovGate = 0.5,
      benchIndex = Some(s"$root/bench"))

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    // doc 1 leaks evalA's tail verbatim (>= 2 shared trigrams); doc 3 is
    // clean; doc 5 leaks evalB but is ALSO a text dup of nothing — both
    // gates are independent of dedup status
    val b0 = Seq(
      (1L, "some preamble then the answer is paris of course", Array(1f, 0f, 0f, 0f)),
      (3L, clean, Array(1f, 0f, 0f, 0f)),
      (5L, "trivia says the largest planet in the solar system it is jupiter", Array(1f, 0f, 0f, 0f)))
    val r0 = IngestPipeline.processBatch(spark,
      b0.toDF("doc_id", "text", "embedding"), cfg, 0L)
    r0.write.mode("overwrite").partitionBy("__batch").parquet(cfg.resultsDir)
    val got = spark.read.parquet(cfg.resultsDir)
      .select(col("id"), col("status"), col("contam_flagged"),
        col("contam_overlap"), col("contam_bench_id"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getBoolean(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
    assert(got(1L)._2 && got(1L)._4 == Some(900L), got(1L))
    assert(got(1L)._3 >= 2L, got(1L))
    assert(!got(3L)._2 && got(3L)._3 == 0L && got(3L)._4.isEmpty, got(3L))
    assert(got(5L)._2 && got(5L)._4 == Some(901L), got(5L))
    // flags, never drops: every doc keeps its dedup status
    assert(got.values.forall(_._1 == "kept"), got)
    // replay: identical record (static index, same probe)
    IngestPipeline.processBatch(spark,
        b0.toDF("doc_id", "text", "embedding"), cfg, 0L)
      .write.mode("overwrite").partitionBy("__batch").parquet(cfg.resultsDir)
    val again = spark.read.parquet(cfg.resultsDir)
      .select(col("id"), col("status"), col("contam_flagged"),
        col("contam_overlap"), col("contam_bench_id"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getBoolean(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
    assert(again == got)
    // gate off: columns absent
    val off = IngestPipeline.processBatch(spark,
      Seq((9L, clean + " coda", Array(1f, 0f, 0f, 0f)))
        .toDF("doc_id", "text", "embedding"),
      cfg.copy(benchIndex = None, dedupIndex = s"$root/dedup2",
        statsIndex = s"$root/stats2", ivfIndex = s"$root/ivf2",
        resultsDir = s"$root/results2", appId = "ingest-contam-off"), 0L)
    assert(!off.columns.contains("contam_flagged"))
  }

  test("IngestPipeline auto-retrain: cell count grows at the optimize cadence to hold fill; later batches assign under the new era") {
    import spark.implicits._
    import graft.pipelines.IngestPipeline
    import graft.similarity.IncrementalIvf
    import graft.sources.VersionedTable

    // 16 distinct docs per batch, embeddings spread over 4 directions —
    // a 1-cell seed geometry that a fill target of 8 must outgrow
    def batch(b: Int) = (0 until 16).map { i =>
      val base = Array(0f, 0f, 0f, 0f); base(i % 4) = 1f; base((i + 1) % 4) = 0.3f
      (b * 100L + i, s"batch $b doc $i " + (0 until 8)
        .map(w => s"b${b}d${i}w$w").mkString(" "), base)
    }
    val root = java.nio.file.Files
      .createTempDirectory("graft-ingest-pipe-retrain").toString
    val cfg = IngestPipeline.Config(
      textCol = "text", idCol = "doc_id", embCol = "embedding",
      dedupIndex = s"$root/dedup", statsIndex = s"$root/stats",
      ivfIndex = s"$root/ivf", resultsDir = s"$root/results",
      appId = "ingest-retrain",
      centroids = Seq(graft.similarity.Ivf.Centroid(0, Seq(1.0, 0, 0, 0))),
      threshold = 0.5, oovGate = 0.5,
      optimizeEvery = Some(1), autoRetrainCellFill = Some(8L))

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (0 until 3).foreach { b =>
      IngestPipeline.processBatch(spark,
          batch(b).toDF("doc_id", "text", "embedding"), cfg, b.toLong)
        .write.mode("overwrite").partitionBy("__batch").parquet(cfg.resultsDir)
      IngestPipeline.maintenance(spark, cfg, b.toLong)
    }
    // 48 rows at fill target 8: the cadence must have grown past the
    // 1-cell seed (ceil(16/8)=2 after batch 0, ceil(32/8)=4 after 1, 6
    // after 2) and every stored assignment matches the era that is now
    // active (each retrain reassigns everything; no appends follow the
    // last maintenance)
    val active = IncrementalIvf.activeCentroids(spark, cfg.ivfIndex)
    assert(active.size == 6, s"expected 6 cells, got ${active.size}")
    val rows = VersionedTable.read(spark, cfg.ivfIndex)
    assert(rows.count() == 48L)
    val mismatch = rows.withColumn("__want",
        graft.similarity.Ivf.assignCell(col("vec"), active))
      .filter(col("cell_id") =!= col("__want")).count()
    assert(mismatch == 0L, "stored assignments diverge from the active era")
    // the decision record stayed complete and all-kept (distinct docs)
    val rec = spark.read.parquet(cfg.resultsDir)
    assert(rec.count() == 48L)
    assert(rec.filter(col("status") =!= "kept").count() == 0L)
  }

  test("IngestPipeline on the MinHash backend: five artifacts under one txn identity, exactly-once, maintenance-safe") {
    import spark.implicits._
    import graft.pipelines.IngestPipeline
    import graft.sources.VersionedTable
    implicit val sc = spark.sqlContext

    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val nearDup = base + " tonight" // trigram J = 12/13 — well over 0.3
    val other = "completely different content about spark query engines and shuffles"
    val third = "yet another unrelated paragraph describing immigration analytics fixtures"
    def emb(a: Float, b: Float) = Array(a, b, 0f, 0f)

    val root = java.nio.file.Files
      .createTempDirectory("graft-ingest-pipe-mh").toString
    val cfg = IngestPipeline.Config(
      textCol = "text", idCol = "doc_id", embCol = "embedding",
      dedupIndex = s"$root/dedup", statsIndex = s"$root/stats",
      ivfIndex = s"$root/ivf", resultsDir = s"$root/results",
      appId = "ingest-mh",
      centroids = Seq(graft.similarity.Ivf.Centroid(0, Seq(1.0, 0, 0, 0)),
        graft.similarity.Ivf.Centroid(1, Seq(0, 1.0, 0, 0))),
      threshold = 0.3, oovGate = 0.5,
      dedupBackend = IngestPipeline.DedupBackend.MinHash(),
      docStore = Some(s"$root/docstore"))

    // misconfiguration refuses loudly before touching any table
    val noStore = intercept[IllegalArgumentException] {
      IngestPipeline.processBatch(spark,
        Seq((0L, base, emb(1f, 0f))).toDF("doc_id", "text", "embedding"),
        cfg.copy(docStore = None), 0L)
    }
    assert(noStore.getMessage.contains("docStore"), noStore.getMessage)

    val b0 = Seq((0L, base, emb(1f, 0f)), (2L, other, emb(0f, 1f)),
      (4L, base, emb(0.9f, 0.1f)))
    val b1 = Seq((1L, nearDup, emb(0.8f, 0f)), (5L, third, emb(0f, 0.7f)))
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-ingest-pipe-mh-ckpt").toString
    val mem = MemoryStream[(Long, String, Array[Float])]
    val q = IngestPipeline.streamingSink(
        mem.toDF().toDF("doc_id", "text", "embedding"), cfg)
      .option("checkpointLocation", ckpt).start()
    try {
      mem.addData(b0: _*); q.processAllAvailable()
      mem.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()

    def results() = spark.read.parquet(cfg.resultsDir)
      .select(col("id"), col("status"), col("oov_rate"), col("oov_flagged"))
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2), r.getBoolean(3)))
      .toMap
    val res = results()
    assert(res.view.mapValues(_._1).toMap == Map(
      0L -> "kept", 2L -> "kept", 4L -> "dup_within_batch",
      1L -> "dup_of_index", 5L -> "kept"), res)
    assert(res(1L)._2 < 0.2 && !res(1L)._3, s"near-dup OOV: ${res(1L)}")
    assert(res(5L)._2 == 1.0 && res(5L)._3)

    // the fifth artifact: EVERY ingested doc (kept and dup) in the doc
    // store exactly once — band rows without fetchable text would be
    // silent missed duplicates later
    def storeIds() = VersionedTable.read(spark, cfg.docStore.get)
      .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(storeIds() == Seq(0L, 1L, 2L, 4L, 5L))
    // the MinHash index is slim band rows for all 5 docs; NO tf sidecar
    assert(VersionedTable.read(spark, cfg.dedupIndex)
      .select(col("id")).distinct().count() == 5)
    assert(VersionedTable.latestVersion(
      graft.dedup.IncrementalDedup.tokenFreqTable(cfg.dedupIndex)) == -1L,
      "MinHash backend must not create the exact face's tf sidecar")

    // replay of micro-batch 1: all FIVE tables skip their append, the
    // results partition rewrites identically
    val vers0 = Seq(cfg.dedupIndex, cfg.statsIndex, cfg.ivfIndex,
      cfg.docStore.get).map(VersionedTable.latestVersion)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    IngestPipeline.processBatch(spark,
        b1.toDF("doc_id", "text", "embedding"), cfg, 1L)
      .write.mode("overwrite").partitionBy("__batch").parquet(cfg.resultsDir)
    assert(results() == res)
    assert(Seq(cfg.dedupIndex, cfg.statsIndex, cfg.ivfIndex,
      cfg.docStore.get).map(VersionedTable.latestVersion) == vers0)

    // CRASH WINDOW in the backend's own commit order: the doc store
    // landed, the band commit did not. The replay must skip the store
    // append (no second copy) and redo the band rows.
    val b2 = Seq((7L, nearDup + " encore", emb(1f, 0.2f)))
    VersionedTable.commit(
      b2.toDF("id", "text", "embedding").select(col("id"), col("text")),
      cfg.docStore.get, "append", Some(2L), Some(cfg.appId),
      expectedVersion = None)
    val vStore2 = VersionedTable.latestVersion(cfg.docStore.get)
    IngestPipeline.processBatch(spark,
        b2.toDF("doc_id", "text", "embedding"), cfg, 2L)
      .write.mode("overwrite").partitionBy("__batch").parquet(cfg.resultsDir)
    assert(VersionedTable.latestVersion(cfg.docStore.get) == vStore2,
      "replay after the store-committed/bands-crashed window re-appended the doc store")
    assert(storeIds() == Seq(0L, 1L, 2L, 4L, 5L, 7L))
    assert(results()(7L)._1 == "dup_of_index", results()(7L))

    // maintenance on the minhash branch: index + doc store compaction
    // and vacuum run, everything stays correct and ingest keeps working
    IngestPipeline.maintenance(spark, cfg.copy(compactEvery = 1,
      optimizeEvery = Some(1), retainVersions = Some(1)), batchId = 0L)
    assert(storeIds() == Seq(0L, 1L, 2L, 4L, 5L, 7L))
    IngestPipeline.processBatch(spark,
        Seq((9L, other + " encore", emb(0f, 1f)))
          .toDF("doc_id", "text", "embedding"), cfg, 3L)
      .write.mode("overwrite").partitionBy("__batch").parquet(cfg.resultsDir)
    assert(results()(9L)._1 == "dup_of_index", results()(9L))
  }

  test("IngestPipeline semantic preflight (opt-in): a collapsed embedding space is REFUSED with the measured fraction; the 1.0 default disables") {
    import spark.implicits._
    import graft.pipelines.IngestPipeline

    // the degenerate regime BENCH_PIPELINE_GATES_r13 measured: a dense
    // 1-D grid in component 0, components 1-3 shared by every doc — at
    // threshold 0.999 each probe admits a constant FRACTION of the
    // corpus and the gate's pair set is O(batch x index)
    def gridBatch(b: Int) = (0 until 120).map { i =>
      (b * 1000L + i, s"grid $b $i " + (0 until 6)
        .map(w => s"g${b}x${i}w$w").mkString(" "),
        Array((i % 100) / 100f, 0.25f, 0.5f, 0.75f))
    }
    val root = java.nio.file.Files
      .createTempDirectory("graft-ingest-preflight").toString
    val cfg = IngestPipeline.Config(
      textCol = "text", idCol = "doc_id", embCol = "embedding",
      dedupIndex = s"$root/dedup", statsIndex = s"$root/stats",
      ivfIndex = s"$root/ivf", resultsDir = s"$root/results",
      appId = "ingest-preflight",
      centroids = Seq(graft.similarity.Ivf.Centroid(0, Seq(0.0, 0.25, 0.5, 0.75)),
        graft.similarity.Ivf.Centroid(1, Seq(1.0, 0.25, 0.5, 0.75))),
      threshold = 0.5, oovGate = 0.5,
      semanticThreshold = Some(0.999),
      // opt IN to the refusal (ADVICE r14 flipped the default to 1.0 —
      // disabled — because same-cell candidate pairs are cosine-biased
      // by construction and a tight refusing default would surprise
      // upgrading pipelines with first-batch refusals)
      semanticAdmissionBound = 0.05)

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    // batch 0: index empty, no preflight, gate trivially clean
    IngestPipeline.processBatch(spark,
        gridBatch(0).toDF("doc_id", "text", "embedding"), cfg, 0L)
      .write.mode("overwrite").partitionBy("__batch").parquet(cfg.resultsDir)
    // batch 1: first probe of a non-empty index — the preflight samples
    // the collapsed space and must refuse BEFORE the gate builds the
    // O(batch x index) pair set, naming the measured fraction
    val e = intercept[IllegalArgumentException] {
      IngestPipeline.processBatch(spark,
          gridBatch(1).toDF("doc_id", "text", "embedding"), cfg, 1L)
        .write.mode("overwrite").partitionBy("__batch").parquet(cfg.resultsDir)
    }
    assert(e.getMessage.contains("preflight REFUSED")
      && e.getMessage.contains("admits"), e.getMessage)

    // the 1.0 default disables the guard: the same batch processes (the
    // gate faithfully executes the degenerate config when not told to
    // refuse)
    val off = cfg.copy(semanticAdmissionBound = 1.0,
      resultsDir = s"$root/results-off", appId = "ingest-preflight-off")
    assert(IngestPipeline.Config(textCol = "t", idCol = "i", embCol = "e",
      dedupIndex = "d", statsIndex = "s", ivfIndex = "v", resultsDir = "r",
      appId = "a", centroids = Seq.empty).semanticAdmissionBound == 1.0,
      "the preflight must default DISABLED (migration contract)")
    IngestPipeline.processBatch(spark,
        gridBatch(1).toDF("doc_id", "text", "embedding"), off, 1L)
      .write.mode("overwrite").partitionBy("__batch")
      .parquet(s"$root/results-off")

    // the pass case for REAL well-spread embeddings at a sane threshold
    // is every existing semantic-gate test and q_ingest_pipeline_semantic
    // itself — all run with the preflight live at the default bound
  }

  test("coded pipeline maintenance: cell-fill advisory fires past the bound, names the cutover, and the cutover clears it (VERDICT r14 #1)") {
    import spark.implicits._
    import graft.pipelines.IngestPipeline

    def emb(seed: Int): Array[Float] = {
      val a = new Array[Float](8)
      a(seed % 8) = 1f; a((seed + 3) % 8) = 0.4f; a
    }
    def batch(b: Int) = (0 until 24).map { i =>
      (b * 100L + i, s"fill $b $i " + (0 until 6)
        .map(w => s"f${b}x${i}w$w").mkString(" "), emb(i))
    }
    val trainDf = batch(0).toDF("doc_id", "text", "embedding")
    val cents = graft.similarity.Ivf.trainCentroids(trainDf, "embedding",
      "doc_id", nCells = 2, iters = 1)
    val cb = graft.similarity.Pq.train(trainDf, "embedding", "doc_id",
      m = 2, k = 8)
    val root = java.nio.file.Files
      .createTempDirectory("graft-coded-fill").toString
    val fills = scala.collection.mutable.ArrayBuffer
      .empty[IngestPipeline.CodedFillStats]
    val cfg = IngestPipeline.Config(
      textCol = "text", idCol = "doc_id", embCol = "embedding",
      dedupIndex = s"$root/dedup", statsIndex = s"$root/stats",
      ivfIndex = s"$root/ivf", resultsDir = s"$root/results",
      appId = "coded-fill", centroids = cents,
      threshold = 0.5, oovGate = 0.5,
      compactEvery = 2,
      pqCodebook = Some(cb),
      codedCellFillBound = Some(5L),
      onCodedFill = Some(fills += _))
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (0 until 2).foreach { b =>
      IngestPipeline.processBatch(spark,
          batch(b).toDF("doc_id", "text", "embedding"), cfg, b.toLong)
        .write.mode("overwrite").partitionBy("__batch")
        .parquet(cfg.resultsDir)
      IngestPipeline.maintenance(spark, cfg, b.toLong)
    }
    // the cadence (compactEvery = 2) fired at batch 1: 48 kept rows
    // over 2 cells = mean fill 24 > bound 5 — the advisory surfaces
    // the measured fill and the exact remediation
    assert(fills.size == 1, s"advisory count: ${fills.size}")
    val s = fills.head
    assert(s.ivfIndex == cfg.ivfIndex && s.cells == 2 && s.rows == 48L
      && s.meanFill == 24.0 && s.bound == 5L && s.batchId == 1L, s.toString)
    assert(s.retrainCall.contains("retrainCodedIvf")
      && s.retrainCall.contains("QUIESCE"), s.retrainCall)

    // the sanctioned cutover absorbs the growth: under the successor
    // Config (16 cells, same 48 rows -> mean fill 3) the same cadence
    // stays silent — the miniature of the stress harness's ramp reset
    val cfg2 = IngestPipeline.retrainCodedIvf(spark, cfg,
        s"$root/ivf2", nCells = 16, iters = 1, sampleFraction = 1.0,
        pq = graft.similarity.IncrementalIvf.PqSpec(m = 2, k = 8))
      .copy(onCodedFill = Some(fills += _))
    assert(cfg2.centroids.size == 16)
    IngestPipeline.maintenance(spark, cfg2, 3L) // 3 % 2 == 1: cadence fires
    assert(fills.size == 1,
      s"advisory fired under the retrained geometry: ${fills.last}")

    // default hook (None): the advisory goes to stderr and must not
    // throw — the loud-but-harmless production default
    IngestPipeline.maintenance(spark, cfg.copy(onCodedFill = None), 1L)
  }

  test("retrainCall recommends the two-term optimum sqrt(b*rows/a), not linear rows/bound (VERDICT r15 #1)") {
    import graft.pipelines.IngestPipeline.CodedFillStats
    // the formula itself, at explicit slopes: cells* = ceil(sqrt(b*rows/a))
    val s = CodedFillStats("t", rows = 117420L, cells = 40, meanFill = 2935.5,
      bound = 40L, batchId = 5L,
      probeCostPerCellSec = 0.0059, fillCostPerRowSec = 0.0014)
    val expect = math.ceil(math.sqrt(0.0014 * 117420L / 0.0059)).toInt
    assert(s.optimalCells == expect && expect == 167, s.optimalCells.toString)
    assert(s.retrainCall.contains(s"nCells = $expect"), s.retrainCall)
    // √corpus growth: 100x the corpus recommends ~10x the cells — the
    // linear rows/bound policy would have recommended 100x (the sf1
    // overshoot this formula replaces)
    val s100 = s.copy(rows = s.rows * 100L)
    assert(math.abs(s100.optimalCells - 10.0 * s.optimalCells)
      <= 0.02 * s100.optimalCells, s"${s.optimalCells} -> ${s100.optimalCells}")
    // probe-term-bound regime: cells* at or below the current count
    // must SAY a cutover cannot help and point at the bound instead
    val bound = s.copy(cells = 500)
    assert(bound.retrainCall.contains("cannot reduce")
      && bound.retrainCall.contains((bound.rows / bound.optimalCells).toString),
      bound.retrainCall)
    // defaults carry the measured r16 slopes (re-measured against the
    // codegen NearestCells selection; BENCH_ASSIGN_PROBE_r16.json)
    val d = CodedFillStats("t", rows = 117420L, cells = 40,
      meanFill = 2935.5, bound = 40L, batchId = 5L)
    assert(d.optimalCells == math.ceil(math.sqrt(
      CodedFillStats.MeasuredFillCostPerRowSec * 117420L /
        CodedFillStats.MeasuredProbeCostPerCellSec)).toInt)
  }

  test("semantic admission drift after admission WARNS at the maintenance cadence, never refuses mid-stream (VERDICT r14 #3)") {
    import spark.implicits._
    import graft.pipelines.IngestPipeline

    // batch 0: orthogonal one-hot embeddings at HIGH ids — the startup
    // preflight measures fraction 0 and admits. batch 1: a collapsed
    // wave (100 copies of one vector) at LOW ids, so the cadence
    // re-measure's lowest-id sample sees the drifted distribution.
    def spread(i: Int): Array[Float] = {
      val a = new Array[Float](8); a(i % 8) = 1f; a
    }
    val flat = Array(1f, 1f, 1f, 1f, 1f, 1f, 1f, 1f)
    val b0 = (0 until 8).map(i => (1000L + i,
      s"spread $i " + (0 until 6).map(w => s"s${i}w$w").mkString(" "),
      spread(i)))
    val b1 = (0 until 100).map(i => (i.toLong,
      s"collapsed $i " + (0 until 6).map(w => s"k${i}w$w").mkString(" "),
      flat))
    val b2 = (0 until 4).map(i => (5000L + i,
      s"tail $i " + (0 until 6).map(w => s"t${i}w$w").mkString(" "),
      spread(i)))
    val cents = graft.similarity.Ivf.trainCentroids(
      b0.toDF("doc_id", "text", "embedding"), "embedding", "doc_id",
      nCells = 2, iters = 1)
    val root = java.nio.file.Files
      .createTempDirectory("graft-sem-drift").toString
    val drifts = scala.collection.mutable.ArrayBuffer
      .empty[IngestPipeline.SemanticDriftStats]
    val cfg = IngestPipeline.Config(
      textCol = "text", idCol = "doc_id", embCol = "embedding",
      dedupIndex = s"$root/dedup", statsIndex = s"$root/stats",
      ivfIndex = s"$root/ivf", resultsDir = s"$root/results",
      appId = "sem-drift", centroids = cents,
      threshold = 0.5, oovGate = 0.5,
      compactEvery = 2,
      semanticThreshold = Some(0.9),
      semanticAdmissionBound = 0.2,
      onSemanticDrift = Some(drifts += _))
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    def run(rows: Seq[(Long, String, Array[Float])], b: Long): Unit = {
      IngestPipeline.processBatch(spark,
          rows.toDF("doc_id", "text", "embedding"), cfg, b)
        .write.mode("overwrite").partitionBy("__batch")
        .parquet(cfg.resultsDir)
      IngestPipeline.maintenance(spark, cfg, b)
    }
    run(b0, 0L) // index empty at gate time: no preflight yet
    run(b1, 1L) // startup preflight vs the SPREAD index: fraction 0, admits;
                // then the cadence (1 % 2 == 1) re-measures the now-
                // collapsed index and must WARN
    assert(drifts.size == 1, s"drift warnings: ${drifts.size}")
    val dft = drifts.head
    assert(dft.fraction > 0.2 && dft.bound == 0.2 && dft.batchId == 1L
      && dft.threshold == 0.9, dft.toString)
    // mid-stream the pipeline keeps running — the drift warned, the
    // startup refusal does not re-fire on the memoized key
    run(b2, 2L)
    assert(spark.read.parquet(cfg.resultsDir)
      .filter(col("__batch") === 2).count() == 4L)
  }

  test("auto-retrain memo clear under a RACING maintenance claimant: fresh lease refuses AND keeps the memo; stale lease tombstone-breaks, retrains, clears, re-measures (VERDICT r15 #5)") {
    import spark.implicits._
    import graft.pipelines.IngestPipeline
    import graft.sources.MaintenanceLease
    import java.nio.file.Files

    // spread index first (preflight admits), then a collapsed wave at
    // LOW ids so a post-clear re-measure sees degeneracy and refuses —
    // the observable for "memo cleared": same drift-test geometry
    def spread(i: Int): Array[Float] = {
      val a = new Array[Float](8); a(i % 8) = 1f; a
    }
    val flat = Array(1f, 1f, 1f, 1f, 1f, 1f, 1f, 1f)
    def docs(ids: Seq[Long], tag: String, emb: Long => Array[Float]) =
      ids.map(i => (i, s"$tag $i " + (0 until 6)
        .map(w => s"$tag${i}w$w").mkString(" "), emb(i)))
    val b0 = docs(1000L until 1008L, "sp", i => spread(i.toInt))
    val b1 = docs(2000L until 2004L, "tl", i => spread(i.toInt))
    val collapsed = docs(0L until 100L, "kk", _ => flat)
    val b4 = docs(3000L until 3004L, "hf", i => spread(i.toInt))
    val b6 = docs(4000L until 4004L, "zf", i => spread(i.toInt))

    val cents = graft.similarity.Ivf.trainCentroids(
      b0.toDF("doc_id", "text", "embedding"), "embedding", "doc_id",
      nCells = 2, iters = 1)
    val root = Files.createTempDirectory("graft-retrain-race").toString
    val cfg = IngestPipeline.Config(
      textCol = "text", idCol = "doc_id", embCol = "embedding",
      dedupIndex = s"$root/dedup", statsIndex = s"$root/stats",
      ivfIndex = s"$root/ivf", resultsDir = s"$root/results",
      appId = "retrain-race", centroids = cents,
      threshold = 0.5, oovGate = 0.5,
      compactEvery = 64, // keep the cadence re-measure out of the way
      optimizeEvery = Some(2),
      autoRetrainCellFill = Some(50L),
      semanticThreshold = Some(0.9),
      semanticAdmissionBound = 0.2)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    def run(rows: Seq[(Long, String, Array[Float])], b: Long,
            maint: Boolean = true): Unit = {
      IngestPipeline.processBatch(spark,
          rows.toDF("doc_id", "text", "embedding"), cfg, b)
        .write.mode("overwrite").partitionBy("__batch")
        .parquet(cfg.resultsDir)
      if (maint) IngestPipeline.maintenance(spark, cfg, b)
    }
    run(b0, 0L) // seeds the index; gate sees an empty pinned snapshot
    run(b1, 1L) // startup preflight vs the spread index: admits, memo SET
                // (maintenance(1): fill 6 <= 50, no retrain, no clear)
    run(collapsed, 2L) // index now mostly collapsed; memo intact -> no
                       // re-measure, the batch sails through

    // RACING claimant holds a FRESH lease on the ivf index: the
    // cadence's retrainInPlace must refuse AT THE DOOR — and because
    // the index did NOT change, the preflight memo must survive
    val lease = MaintenanceLease.leasePath(cfg.ivfIndex)
    Files.write(lease, "retrainInPlace pid=99999 thread=rival token=rival-tok"
      .getBytes("UTF-8"))
    val e = intercept[IllegalStateException] {
      IngestPipeline.maintenance(spark, cfg, 3L) // 112 rows / 2 cells > 50
    }
    assert(e.getMessage.contains("lease") && e.getMessage.contains("held"),
      e.getMessage)
    assert(graft.similarity.IncrementalIvf
      .activeCentroids(spark, cfg.ivfIndex).size == 2,
      "refused retrain must not have advanced the centroid era")
    run(b4, 4L, maint = false) // memo intact: no re-measure, no refusal

    // the claimant goes STALE: the breaker renames it to a tombstone,
    // re-claims, retrains in place, and the memo clear at the retrain
    // site must make the NEXT gate re-measure the retrained index
    Files.setLastModifiedTime(lease,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 7L * 3600 * 1000))
    IngestPipeline.maintenance(spark, cfg, 5L)
    assert(graft.similarity.IncrementalIvf
      .activeCentroids(spark, cfg.ivfIndex).size == 3,
      "stale-broken retrain must have grown the cell count (112/50 -> 3)")
    assert(!Files.exists(lease),
      "the breaker's own lease must be released after the retrain")
    val refused = intercept[IllegalArgumentException] { run(b6, 6L) }
    assert(refused.getMessage.contains("preflight REFUSED"),
      s"memo must be cleared by the retrain -> re-measure refuses the " +
        s"collapsed index; got: ${refused.getMessage}")
  }

  test("IngestPipeline coded gate (pqCodebook): codes stored, ADC gate matches the float gate, auto-retrain combination refuses") {
    import spark.implicits._
    import graft.pipelines.IngestPipeline
    import graft.sources.VersionedTable

    // well-spread planted 8-dim embeddings (PQ m=2 subspaces of 4)
    def emb(seed: Int): Array[Float] = {
      val a = new Array[Float](8)
      a(seed % 8) = 1f; a((seed + 3) % 8) = 0.4f; a
    }
    def batch(b: Int) = (0 until 24).map { i =>
      (b * 100L + i, s"coded $b $i " + (0 until 6)
        .map(w => s"c${b}x${i}w$w").mkString(" "), emb(i))
    }
    val trainDf = batch(0).toDF("doc_id", "text", "embedding")
    val cents = graft.similarity.Ivf.trainCentroids(trainDf, "embedding",
      "doc_id", nCells = 2, iters = 1)
    val cb = graft.similarity.Pq.train(trainDf, "embedding", "doc_id",
      m = 2, k = 8)

    def run(root: String, coded: Boolean, appId: String) = {
      val cfg = IngestPipeline.Config(
        textCol = "text", idCol = "doc_id", embCol = "embedding",
        dedupIndex = s"$root/dedup", statsIndex = s"$root/stats",
        ivfIndex = s"$root/ivf", resultsDir = s"$root/results",
        appId = appId, centroids = cents,
        threshold = 0.5, oovGate = 0.5,
        semanticThreshold = Some(0.9),
        // the planted 8-direction space is deliberately repetitive
        // (exact-copy triples make the parity flags deterministic), so
        // the admission preflight would rightly refuse it — disabled
        // here; the preflight has its own test above
        semanticAdmissionBound = 1.0,
        pqCodebook = if (coded) Some(cb) else None,
        adcCandidates = 1000, // covers every candidate: exact parity
        optimizeEvery = Some(2), retainVersions = Some(10))
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      (0 until 3).foreach { b =>
        IngestPipeline.processBatch(spark,
            batch(b).toDF("doc_id", "text", "embedding"), cfg, b.toLong)
          .write.mode("overwrite").partitionBy("__batch")
          .parquet(cfg.resultsDir)
        IngestPipeline.maintenance(spark, cfg, b.toLong)
      }
      cfg
    }
    val codedCfg = run(java.nio.file.Files
      .createTempDirectory("graft-pipe-coded").toString, coded = true,
      appId = "pipe-coded")
    val floatCfg = run(java.nio.file.Files
      .createTempDirectory("graft-pipe-float").toString, coded = false,
      appId = "pipe-float")

    // the coded index carries codes; the maintenance cadence (compact +
    // vacuum at optimizeEvery=2) preserved them
    val rows = VersionedTable.read(spark, codedCfg.ivfIndex)
    assert(rows.columns.contains("codes"))
    assert(rows.filter(col("codes").isNull).count() == 0L)
    // the pinned codebook round-trips
    assert(graft.similarity.IncrementalIvf.loadCodebook(spark,
      graft.similarity.IncrementalIvf.codebookTable(codedCfg.ivfIndex)) == cb)

    // decision parity: with adcCandidates covering every candidate the
    // coded gate's records equal the float gate's, column for column
    def recs(dir: String) = spark.read.parquet(dir)
      .select(col("id"), col("__batch").cast("long").as("__batch"),
        col("status"), col("sem_dup_of"), col("sem_sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), Option(r.get(3)), Option(r.get(4))))).toMap
    val c = recs(codedCfg.resultsDir); val f = recs(floatCfg.resultsDir)
    assert(c == f, s"coded/float divergence: ${
      c.collect { case (k, v) if f.get(k) != Some(v) => (k, v, f.get(k)) }
        .take(3)}")
    assert(c.values.exists(_._2.nonEmpty),
      "no semantic flags at all — the parity check proved nothing")

    // the coded + auto-retrain combination refuses at the door, both
    // faces (the documented path: retrain(pq=...) to a NEW table)
    val badCfg = codedCfg.copy(autoRetrainCellFill = Some(8L))
    val e1 = intercept[IllegalArgumentException] {
      IngestPipeline.processBatch(spark,
        batch(3).toDF("doc_id", "text", "embedding"), badCfg, 3L)
    }
    assert(e1.getMessage.contains("mutually exclusive"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      IngestPipeline.maintenance(spark, badCfg, 3L)
    }
    assert(e2.getMessage.contains("mutually exclusive"), e2.getMessage)

    // ---- the sanctioned coded cutover (retrainCodedIvf) -------------
    // retrain the coded pipeline's IVF to a NEW table (fresh centroids
    // + fresh codebook on one pinned sample) and continue under the
    // returned Config
    val rowsBefore = VersionedTable.read(spark, codedCfg.ivfIndex).count()
    val newIvf = codedCfg.ivfIndex.stripSuffix("/ivf") + "/ivf2"
    val cfg1 = IngestPipeline.retrainCodedIvf(spark, codedCfg, newIvf,
      nCells = 4, iters = 1, sampleFraction = 1.0,
      pq = graft.similarity.IncrementalIvf.PqSpec(m = 2, k = 8))
    assert(cfg1.ivfIndex == newIvf && cfg1.pqCodebook.isDefined)
    val newRows = VersionedTable.read(spark, cfg1.ivfIndex)
    assert(newRows.count() == rowsBefore, "cutover lost or invented rows")
    assert(newRows.filter(col("codes").isNull).count() == 0L)
    assert(graft.similarity.IncrementalIvf.loadCodebook(spark,
        graft.similarity.IncrementalIvf.codebookTable(cfg1.ivfIndex))
      == cfg1.pqCodebook.get)
    // exactly-once ACROSS the cutover: the new table inherits the
    // source's txn watermarks, so a replayed pre-cutover batch appends
    // NOTHING to it (without the seed the fresh table's empty txn log
    // would silently double that batch's vectors)
    IngestPipeline.processBatch(spark,
        batch(1).toDF("doc_id", "text", "embedding"), cfg1, 1L)
      .write.mode("overwrite").partitionBy("__batch")
      .parquet(cfg1.resultsDir)
    assert(VersionedTable.read(spark, cfg1.ivfIndex).count() == rowsBefore,
      "pre-cutover replay re-appended to the retrained index")
    // and the pipeline CONTINUES: a fresh batch appends under the new
    // era and the gate flags its exact-copy neighbours in the
    // retrained index
    val r3 = IngestPipeline.processBatch(spark,
      batch(3).toDF("doc_id", "text", "embedding"), cfg1, 3L)
    r3.write.mode("overwrite").partitionBy("__batch").parquet(cfg1.resultsDir)
    assert(VersionedTable.read(spark, cfg1.ivfIndex).count() > rowsBefore)
    assert(r3.filter(col("sem_dup_of").isNotNull).count() > 0L,
      "post-cutover gate found no exact-copy neighbours")
    // a float pipeline refuses this helper (it has in-place retrain)
    val e3 = intercept[IllegalArgumentException] {
      IngestPipeline.retrainCodedIvf(spark, floatCfg,
        floatCfg.ivfIndex + "2", 4, 1, 1.0,
        graft.similarity.IncrementalIvf.PqSpec(m = 2, k = 8))
    }
    assert(e3.getMessage.contains("coded-index cutover"), e3.getMessage)
  }
}
