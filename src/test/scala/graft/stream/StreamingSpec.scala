package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.stream.Streaming.UserEvent

/** B10 streaming semantics: batch-equivalence via MemoryStream replay,
  * watermark late-data drop, stateful dedup, stream-static join, and
  * flatMapGroupsWithState (SURVEY §5.2 layer 3). */
class StreamingSpec extends SparkSpec {

  private def ts(minutes: Long): Timestamp =
    new Timestamp(1704067200000L + minutes * 60000L) // 2024-01-01 00:00 UTC

  private def sampleEvents: Seq[UserEvent] =
    graft.core.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("ts", "event_id").limit(300)
      .collect().map(r => UserEvent(r.getLong(0), r.getTimestamp(1),
        r.getLong(2), r.getString(3), r.getDouble(4))).toSeq

  private def runToCompletion(stream: MemoryStream[UserEvent],
      df: org.apache.spark.sql.DataFrame, mode: OutputMode, name: String) = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("tumbling window agg: streaming replay equals batch twin") {
    import spark.implicits._
    val events = sampleEvents
    val stream = MemoryStream[UserEvent](1, spark, None)
    stream.addData(events)
    val got = runToCompletion(stream,
      Streaming.tumblingCounts(stream.toDF()), OutputMode.Complete(), "tumbling")
      .select("bucket_start", "event_type", "n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    val expected = Streaming.tumblingCounts(events.toDF())
      .select("bucket_start", "event_type", "n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("session window agg: streaming replay equals batch twin") {
    import spark.implicits._
    val events = sampleEvents
    val stream = MemoryStream[UserEvent](2, spark, None)
    // feed in two chunks to force multiple micro-batches
    val (first, second) = events.splitAt(events.size / 2)
    stream.addData(first)
    stream.addData(second)
    val got = runToCompletion(stream,
      Streaming.sessionCounts(stream.toDF()), OutputMode.Complete(), "sessions")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    val expected = Streaming.sessionCounts(events.toDF())
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(got === expected)
  }

  test("watermark drops rows later than the allowed delay (append mode)") {
    import spark.implicits._
    val stream = MemoryStream[UserEvent](3, spark, None)
    val agg = Streaming.tumblingCounts(stream.toDF(), watermark = "10 minutes")
    val q = agg.writeStream.format("memory").queryName("late")
      .outputMode(OutputMode.Append()).start()
    // batch 1: events in hour 0 and hour 2; watermark advances to 2h50m-10m
    stream.addData(UserEvent(1, ts(5), 1, "view", 1.0))
    stream.addData(UserEvent(2, ts(170), 1, "view", 1.0))
    q.processAllAvailable()
    // batch 2: a straggler from hour 0 — older than watermark, must be dropped
    stream.addData(UserEvent(3, ts(6), 1, "view", 1.0))
    q.processAllAvailable()
    // batch 3: advance watermark far enough to finalize every window
    stream.addData(UserEvent(4, ts(600), 1, "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val hour0 = spark.table("late")
      .filter(col("bucket_start") === ts(0)).select("n").collect()
    assert(hour0.map(_.getLong(0)).toSeq === Seq(1L),
      "late row must not be counted into the finalized hour-0 window")
  }

  test("dropDuplicatesWithinWatermark removes replayed event_ids") {
    import spark.implicits._
    val stream = MemoryStream[UserEvent](4, spark, None)
    val q = Streaming.dedupEvents(stream.toDF()).writeStream
      .format("memory").queryName("dedup").outputMode(OutputMode.Append()).start()
    stream.addData(UserEvent(100, ts(1), 1, "view", 1.0))
    stream.addData(UserEvent(100, ts(2), 1, "view", 1.0)) // same id, replayed
    stream.addData(UserEvent(101, ts(2), 1, "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup").select("event_id").collect().map(_.getLong(0))
    assert(ids.sorted.toSeq === Seq(100L, 101L))
  }

  test("stream-static rule join matches the batch firewall pipeline") {
    import spark.implicits._
    val events = sampleEvents
    val stream = MemoryStream[UserEvent](5, spark, None)
    stream.addData(events)
    val got = runToCompletion(stream,
      Streaming.streamRuleCounts(stream.toDF()),
      OutputMode.Complete(), "rulehits")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val expected = Streaming.streamRuleCounts(events.toDF())
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got === expected)
    assert(got.values.sum === events.size, "every event first-matches exactly one rule")
  }

  test("foreachBatch parquet sink lands micro-batches idempotently") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_sink_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sink_ck").toString
    val stream = MemoryStream[UserEvent](7, spark, None)
    val q = Streaming.sinkToParquet(
      Streaming.dedupEvents(stream.toDF()), out, ckpt).start()
    stream.addData(UserEvent(1, ts(0), 1, "view", 1.0))
    q.processAllAvailable()
    stream.addData(UserEvent(2, ts(1), 1, "click", 2.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(out)
    assert(rows.select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      === Seq(1L, 2L))
    assert(rows.columns.contains("batch_id"),
      "batch id partitioning must be visible to readers")
  }

  test("flatMapGroupsWithState accumulates per-user running stats") {
    import spark.implicits._
    val stream = MemoryStream[UserEvent](6, spark, None)
    val q = Streaming.runningUserStats(stream.toDS()).writeStream
      .format("memory").queryName("userstats").outputMode(OutputMode.Update()).start()
    stream.addData(UserEvent(1, ts(0), 7, "view", 10.0),
      UserEvent(2, ts(1), 7, "click", 5.0))
    q.processAllAvailable()
    stream.addData(UserEvent(3, ts(2), 7, "view", 2.5))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("userstats").orderBy("n_events")
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    // update mode emits one row per batch touched: (2, 15.0) then (3, 17.5)
    assert(rows.toSeq === Seq((2L, 15.0), (3L, 17.5)))
  }

  test("transformWithState TTL expires idle state (counts restart)") {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming" +
      ".state.RocksDBStateStoreProvider")
    try {
      // TTL expiry is evaluated on state ACCESS (an expired value reads as
      // absent), so one continuous query with an idle gap between batches
      // proves it. CRITICAL: under TimeMode.ProcessingTime the operator
      // always reports "may need another batch" (timers/TTL can expire at
      // any moment), so `noNewData` is never set — processAllAvailable
      // NEVER settles and Trigger.AvailableNow NEVER terminates (both
      // verified hangs). The only safe wait is polling the sink with a
      // deadline.
      val stream = MemoryStream[UserEvent](11, spark, None)
      val q = Streaming.runningUserStatsTws(stream.toDS(),
          stateTtl = Some(java.time.Duration.ofMillis(500))).writeStream
        .format("memory").queryName("userstats_ttl")
        .outputMode(OutputMode.Update())
        .start()
      def awaitSink(want: Seq[(Long, Double)]): Seq[(Long, Double)] = {
        val deadline = System.currentTimeMillis + 120000
        var got = Seq.empty[(Long, Double)]
        while (got != want && System.currentTimeMillis < deadline) {
          Option(q.exception.orNull).foreach(throw _)
          got = spark.table("userstats_ttl").collect()
            .map(r => (r.getLong(1), r.getDouble(2))).toSeq
          if (got != want) Thread.sleep(200)
        }
        got
      }
      try {
        stream.addData(UserEvent(1, ts(0), 7, "view", 10.0),
          UserEvent(2, ts(1), 7, "click", 5.0))
        assert(awaitSink(Seq((2L, 15.0))) === Seq((2L, 15.0)))
        Thread.sleep(2000) // comfortably past the 500ms TTL
        stream.addData(UserEvent(3, ts(2), 7, "view", 2.5))
        // user 7's state expired while idle: the second batch RESTARTS at
        // (1, 2.5) instead of reaching (3, 17.5)
        val want = Seq((2L, 15.0), (1L, 2.5))
        assert(awaitSink(want) === want)
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("chained stateful ops: dedup then windowed agg in one query") {
    import spark.implicits._
    val stream = MemoryStream[UserEvent](16, spark, None)
    val q = Streaming.dedupedTumblingCounts(stream.toDF()).writeStream
      .format("memory").queryName("dedup_agg")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // event 100 arrives three times (twice in batch 1, once in batch 2)
      stream.addData(UserEvent(100, ts(5), 1, "view", 1.0),
        UserEvent(100, ts(5), 1, "view", 1.0),
        UserEvent(101, ts(20), 2, "click", 2.0))
      q.processAllAvailable()
      stream.addData(UserEvent(100, ts(5), 1, "view", 1.0),
        UserEvent(102, ts(30), 1, "view", 3.0))
      q.processAllAvailable()
      // sentinel far in the future flushes the finalized hour-0 windows
      stream.addData(UserEvent(999, ts(600), 9, "error", 0.0))
      q.processAllAvailable()
      val got = spark.table("dedup_agg")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
        .toSet
      // hour 0: view counted TWICE would be 3 — dedup makes it 2 (ids
      // 100, 102); click 1
      assert(got === Set((ts(0), "view", 2L), (ts(0), "click", 1L)))
    } finally q.stop()
  }

  test("transformWithState survives a restart from its checkpoint") {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming" +
      ".state.RocksDBStateStoreProvider")
    try {
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_tws_restart").toString
      val stream = MemoryStream[UserEvent](15, spark, None)
      // the memory sink refuses checkpoint recovery — foreachBatch is the
      // fault-tolerant sink shape, collecting into a driver-local buffer
      val got = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Double)]
      def runOnce(): Unit = {
        // TimeMode.None (no TTL/timers) — AvailableNow terminates cleanly
        val q = Streaming.runningUserStatsTws(stream.toDS()).writeStream
          .option("checkpointLocation", ckpt)
          .outputMode(OutputMode.Update())
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch {
            (batch: org.apache.spark.sql.Dataset[Streaming.UserStats],
                _: Long) =>
              got.synchronized {
                got ++= batch.collect()
                  .map(s => (s.user_id, s.n_events, s.total_value))
              }; ()
          }
          .start()
        assert(q.awaitTermination(120000), "AvailableNow must terminate")
      }
      stream.addData(UserEvent(1, ts(0), 7, "view", 10.0),
        UserEvent(2, ts(1), 7, "click", 5.0))
      runOnce()
      assert(got.toSeq === Seq((7L, 2L, 15.0)))
      // second, separate query run: RocksDB state reloads from the
      // checkpoint — counts CONTINUE at (3, 17.5), they don't restart
      stream.addData(UserEvent(3, ts(2), 7, "view", 2.5))
      runOnce()
      assert(got.toSeq === Seq((7L, 2L, 15.0), (7L, 3L, 17.5)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("Trigger.AvailableNow drains everything then terminates on its own") {
    import spark.implicits._
    val events = sampleEvents
    val stream = MemoryStream[UserEvent](14, spark, None)
    stream.addData(events)
    val q = Streaming.tumblingCounts(stream.toDF()).writeStream
      .format("memory").queryName("avail_now")
      .outputMode(OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    // self-terminating batch-of-a-stream (the backfill/cron shape) — the
    // processing-time TWS ops are the one documented exception
    assert(q.awaitTermination(120000), "AvailableNow must self-terminate")
    val got = spark.table("avail_now").select("bucket_start", "event_type", "n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val expected = Streaming.tumblingCounts(events.toDF())
      .select("bucket_start", "event_type", "n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("transformWithState MapState keeps per-type counts keyed in state") {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming" +
      ".state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[UserEvent](13, spark, None)
      val q = Streaming.typeCountsTws(stream.toDS()).writeStream
        .format("memory").queryName("type_counts")
        .outputMode(OutputMode.Update())
        .start()
      try {
        stream.addData(UserEvent(1, ts(0), 7, "view", 1.0),
          UserEvent(2, ts(1), 7, "view", 1.0),
          UserEvent(3, ts(2), 7, "click", 1.0))
        q.processAllAvailable()
        stream.addData(UserEvent(4, ts(3), 7, "view", 1.0))
        q.processAllAvailable()
        val rows = spark.table("type_counts").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        // batch 1 emits the touched types (click 1, view 2); batch 2 only
        // the view refresh (3) — counts carried in MapState entries
        assert(rows.toSeq === Seq((7L, "click", 1L), (7L, "view", 2L),
          (7L, "view", 3L)))
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState event-time timers close idle sessions") {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming" +
      ".state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[UserEvent](12, spark, None)
      val q = Streaming.sessionizeTws(stream.toDS(),
          gapMs = 30L * 60000L, watermark = "10 minutes").writeStream
        .format("memory").queryName("tws_sessions")
        .outputMode(OutputMode.Append())
        .start()
      try {
        // burst 1 and burst 2 are 5 minutes apart — same session
        stream.addData(UserEvent(1, ts(0), 7, "view", 10.0))
        q.processAllAvailable()
        stream.addData(UserEvent(2, ts(5), 7, "click", 5.0))
        q.processAllAvailable()
        assert(spark.table("tws_sessions").isEmpty,
          "session still open — nothing may emit before the watermark")
        // user 8 three hours later pushes the watermark to ts(180)-10min,
        // far past user 7's ts(5)+30min horizon -> timer fires, session
        // closes and emits; user 8's own session stays open (unemitted)
        stream.addData(UserEvent(3, ts(180), 8, "view", 1.0))
        q.processAllAvailable()
        val rows = spark.table("tws_sessions").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
            r.getTimestamp(3), r.getTimestamp(4)))
        assert(rows.toSeq === Seq((7L, 2L, 15.0, ts(0), ts(5))))
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("stream-stream interval join equals its batch twin") {
    import spark.implicits._
    val rows = Seq(
      UserEvent(1, ts(0), 7, "click", 0.0),
      UserEvent(2, ts(10), 7, "purchase", 99.0),   // within 30m of click 1
      UserEvent(3, ts(50), 7, "purchase", 11.0),   // outside the horizon
      UserEvent(4, ts(5), 8, "click", 0.0),
      UserEvent(5, ts(20), 9, "purchase", 5.0))    // no matching user click
    val stream = MemoryStream[UserEvent](9, spark, None)
    stream.addData(rows: _*)
    val streamed = runToCompletion(stream,
      Streaming.clickPurchaseAttribution(stream.toDF()),
      OutputMode.Append(), "attribution")
      .orderBy("click_id", "purchase_id")
      .collect().map(_.toSeq).toSeq
    val batch = Streaming.clickPurchaseAttribution(rows.toDF())
      .orderBy("click_id", "purchase_id")
      .collect().map(_.toSeq).toSeq
    assert(streamed === batch)
    assert(streamed.map(r => (r(1), r(2))) === Seq((1L, 2L)))
  }

  test("stream-stream LEFT OUTER join emits null rows after the watermark") {
    import spark.implicits._
    val stream = MemoryStream[UserEvent](10, spark, None)
    val q = Streaming.clickPurchaseAttribution(stream.toDF(),
        joinType = "left_outer").writeStream
      .format("memory").queryName("attribution_outer")
      .outputMode(OutputMode.Append()).start()
    // user 7 converts; user 8's click never matches
    stream.addData(UserEvent(1, ts(0), 7, "click", 0.0),
      UserEvent(2, ts(10), 7, "purchase", 99.0),
      UserEvent(3, ts(5), 8, "click", 0.0))
    q.processAllAvailable()
    val eager = spark.table("attribution_outer").collect()
    // inner match emits eagerly; the unmatched click must NOT emit yet —
    // a purchase inside its horizon could still arrive
    assert(eager.map(_.getLong(1)).toSet === Set(1L))
    // watermark jumps far past click 3's horizon → its null row flushes.
    // The advancing events must SURVIVE the click/purchase filters (a
    // filtered-out row never reaches the EventTimeWatermark node), and the
    // global watermark is the min over both sides — so advance each side,
    // then run one more (empty-input) batch for the eviction to land.
    stream.addData(UserEvent(4, ts(600), 9, "click", 0.0),
      UserEvent(5, ts(600), 9, "purchase", 1.0))
    q.processAllAvailable()
    stream.addData(UserEvent(6, ts(610), 9, "click", 0.0),
      UserEvent(7, ts(610), 9, "purchase", 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("attribution_outer")
      .orderBy("click_id").collect()
    // matched pairs (incl. among the advancing events) + click 3's null row
    val pairs = rows.map(r => (r.getLong(1),
      if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(pairs === Set((1L, 2L), (3L, -1L), (4L, 5L), (4L, 7L), (6L, 7L)))
    val unmatched = rows.find(_.getLong(1) == 3L).get
    assert(unmatched.isNullAt(2) && unmatched.isNullAt(4),
      "unmatched click must carry null purchase columns")
  }

  test("transformWithState matches the flatMapGroupsWithState semantics") {
    import spark.implicits._
    // transformWithState only runs on the RocksDB state store; scope the
    // provider switch to this query (runtime conf, restored after).
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming" +
      ".state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[UserEvent](8, spark, None)
      val q = Streaming.runningUserStatsTws(stream.toDS()).writeStream
        .format("memory").queryName("userstats_tws")
        .outputMode(OutputMode.Update()).start()
      stream.addData(UserEvent(1, ts(0), 7, "view", 10.0),
        UserEvent(2, ts(1), 7, "click", 5.0))
      q.processAllAvailable()
      stream.addData(UserEvent(3, ts(2), 7, "view", 2.5))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("userstats_tws").orderBy("n_events")
        .collect().map(r => (r.getLong(1), r.getDouble(2)))
      // identical update-mode trace to the flatMapGroupsWithState twin
      assert(rows.toSeq === Seq((2L, 15.0), (3L, 17.5)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("online corpus-dup flags equal the batch index probe (B10.12)") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val docs = graft.core.Tables.documents(spark, sf)
    val split = 400L
    val corpus = docs.filter(col("doc_id") < split)
    val shardRows = docs.filter(col("doc_id") >= split)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val dir = java.nio.file.Files
      .createTempDirectory("graft_stream_index").toString
    graft.sim.IncrementalDedup.writeIndex(corpus, "doc_id", "text", dir)

    val stream = MemoryStream[(Long, String)](42, spark, None)
    val flags = Streaming.streamCorpusDupFlags(
      stream.toDF().toDF("doc_id", "text"), dir)
    assert(flags.isStreaming, "the flag stream must stay a streaming plan")
    val q = flags.writeStream.format("memory").queryName("dupflags")
      .outputMode(OutputMode.Append()).start()
    // two micro-batches — flags must be complete regardless of batching
    val (first, rest) = shardRows.splitAt(50)
    stream.addData(first); q.processAllAvailable()
    stream.addData(rest); q.processAllAvailable()
    q.stop()

    val got = spark.table("dupflags").select("doc_id")
      .as[Long].collect().toSet
    val expected = graft.sim.IncrementalDedup.corpusHits(spark,
        docs.filter(col("doc_id") >= split), "doc_id", "text", dir,
        0.8, 32, 8, 3)
      .as[Long].collect().toSet
    assert(got === expected,
      s"missed=${expected.diff(got).size} extra=${got.diff(expected).size}")
    assert(got.nonEmpty, "fixture must produce cross-corpus dup flags")
    // per-(doc, corpus member) idempotence contract: flags may repeat per
    // colliding band but each pair carries one jaccard value
    val pairRows = spark.table("dupflags")
      .select("doc_id", "dup_of", "jaccard").distinct()
      .groupBy("doc_id", "dup_of").count()
    assert(pairRows.filter(col("count") > 1).count() === 0L,
      "a (doc, dup_of) pair must have exactly one distinct jaccard")
  }

  test("streaming passage spans equal the batch shingle-index probe (B10.13)") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val docs = graft.core.Tables.documents(spark, sf)
    val split = 400L
    val k = 8
    val dir = java.nio.file.Files
      .createTempDirectory("graft_passage_idx").toString
    graft.text.SubstringDedup.appendShingleIndex(
      docs.filter(col("doc_id") < split), k, dir)
    val shard = docs.filter(col("doc_id") >= split)
    val shardRows = shard.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq

    val sunk = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Int, Int, Long)]
    val stream = MemoryStream[(Long, String)](44, spark, None)
    val q = Streaming.streamPassageSpans(
        stream.toDF().toDF("doc_id", "text"), k, dir,
        (spans, _) => sunk ++= spans.collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))))
      .start()
    // documents arrive whole, split across two micro-batches — spans are
    // per-doc, so batching must not change the union of emitted spans
    val (first, rest) = shardRows.splitAt(50)
    stream.addData(first); q.processAllAvailable()
    stream.addData(rest); q.processAllAvailable()
    q.stop()

    val expected = graft.text.SubstringDedup.shardDupSpans(shard, k, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    assert(sunk.toSet === expected)
    assert(sunk.size === sunk.toSet.size, "no span may be emitted twice")
    assert(expected.nonEmpty, "fixture must contain cross-corpus passages")
  }

  test("streaming semantic dup flags equal the batch IVF-index probe (B10.14)") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val emb = graft.core.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val split = 64L
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sem_stream_idx").toString
    graft.sim.SemDedup.writeIndex(
      emb.filter(col("vec_id") < split), dir, nCentroids = 16, iters = 3)
    // shard = fresh vectors + planted scaled copies of corpus vectors
    // (exact-direction → cosine 1 → must flag against their originals)
    val offset = 10000L
    val shard = emb.filter(col("vec_id") >= split)
      .select((col("vec_id") + offset).as("vec_id"), col("embedding"))
      .union(emb.filter(col("vec_id") < split && col("vec_id") % 4 === 0)
        .select((col("vec_id") + 2 * offset).as("vec_id"),
          transform(col("embedding"), x => x * 0.5).as("embedding")))
      .localCheckpoint()
    val shardRows = shard.as[(Long, Seq[Double])].collect().toSeq

    val sunk = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val stream = MemoryStream[(Long, Seq[Double])](45, spark, None)
    val q = Streaming.streamSemDupFlags(
        stream.toDF().toDF("vec_id", "embedding"), dir,
        (flags, _) => sunk ++= flags.select("vec_id", "dup_of").collect()
          .map(r => (r.getLong(0), r.getLong(1))))
      .start()
    // vectors arrive whole, split across two micro-batches — the cluster
    // assignment and index prune are per-batch, so batching must not
    // change the union of emitted flags
    val (first, rest) = shardRows.splitAt(shardRows.size / 2)
    stream.addData(first); q.processAllAvailable()
    stream.addData(rest); q.processAllAvailable()
    q.stop()

    // production streams deliver EMPTY micro-batches too: the probe's
    // cluster-set collect is then empty and the index filter is an
    // empty IN — must yield zero flags, never throw
    val emptyFlags = graft.sim.SemDedup.corpusDupFlags(spark,
      shard.filter(col("vec_id") < 0), dir, 0.99)
    assert(emptyFlags.count() === 0L)

    val expected = graft.sim.SemDedup
      .corpusDupFlags(spark, shard, dir, 0.99)
      .select("vec_id", "dup_of").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sunk.toSet === expected)
    assert(expected.nonEmpty, "fixture must flag the planted copies")
    // every planted copy flags its original; fresh vectors stay clean
    assert(expected.forall { case (v, d) =>
      v >= 2 * offset && d === v - 2 * offset })
    assert(sunk.size === sunk.toSet.size, "no flag may be emitted twice")
  }

  test("live corpus-dup flags pick up an index republished between batches") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val docs = graft.core.Tables.documents(spark, sf)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_live_index").toString
    // index v1: corpus = docs < 200; v2 republish: corpus = docs < 400.
    // The probe batch (docs >= 400) is identical both times, so any flag
    // difference is attributable ONLY to the index refresh.
    graft.sim.IncrementalDedup.writeIndex(
      docs.filter(col("doc_id") < 200), "doc_id", "text", dir)
    val shardRows = docs.filter(col("doc_id") >= 400)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq

    val sunk = scala.collection.mutable.Map.empty[Long, Set[(Long, Long)]]
    val stream = MemoryStream[(Long, String)](43, spark, None)
    val q = Streaming.streamCorpusDupFlagsLive(
        stream.toDF().toDF("doc_id", "text"), dir,
        (flags, id) => sunk(id) = flags.select("doc_id", "dup_of")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
      .start()
    stream.addData(shardRows); q.processAllAvailable()
    // republish IN PLACE (atomic overwrite, the writeIndex contract)
    graft.sim.IncrementalDedup.writeIndex(
      docs.filter(col("doc_id") < 400), "doc_id", "text", dir)
    stream.addData(shardRows); q.processAllAvailable()
    q.stop()

    // probes whatever index is on disk NOW — valid only after the final
    // republish above, hence the V2 name (a corpus-bound parameter here
    // would imply this can reproduce the v1 expectation, which it cannot
    // without rebuilding the index in a scratch dir — ADVICE r8)
    def batchExpectedV2(): Set[(Long, Long)] =
      Streaming.streamCorpusDupFlags(
          docs.filter(col("doc_id") >= 400).select("doc_id", "text"), dir)
        .select("doc_id", "dup_of").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // after the test's final republish the on-disk index is v2 — the batch
    // probe against it must equal the live stream's SECOND batch
    val expectedV2 = batchExpectedV2()
    assert(sunk(1L) === expectedV2,
      "batch after republish must see the refreshed index")
    // the first batch ran against v1: strictly fewer corpus members to hit,
    // and a strict subset of the v2 flags (v1's corpus ⊂ v2's)
    assert(sunk(0L).subsetOf(expectedV2))
    assert(sunk(0L) !== expectedV2,
      "fixture must add new dup targets in the republished index half")
    assert(sunk(0L).forall(_._2 < 200) &&
      expectedV2.exists(f => f._2 >= 200 && f._2 < 400))
  }
}
