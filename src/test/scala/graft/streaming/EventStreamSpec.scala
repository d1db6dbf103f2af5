package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import graft.SparkSpec

class EventStreamSpec extends SparkSpec {

  // modern base: epoch-adjacent event times sit on the initial watermark
  // boundary and get dropped as late data
  private val Base = 1704067200000L // 2024-01-01T00:00:00Z
  private def ts(minutes: Long): Timestamp =
    new Timestamp(Base + minutes * 60000L)

  test("windowed aggregation: file stream equals the batch twin") {
    val src = "/root/testdata/sf0.001/events.parquet"
    val dir = Files.createTempDirectory("graft_stream").toString
    // file source monitors a directory; stage the table file into one
    Files.copy(java.nio.file.Paths.get(src),
      java.nio.file.Paths.get(dir, "events.parquet"))

    // read batch under the SAME schema as the stream (plain parquet read
    // infers TIMESTAMP_NTZ, which compares unequal as LocalDateTime rows)
    val batch = EventStream.windowedCounts(
        spark.read.schema(EventStream.Schema).parquet(dir))
      .orderBy("window_start", "event_type").collect().toSeq
    assert(batch.nonEmpty)

    val q = EventStream.windowedCounts(EventStream.readStream(spark, dir))
      .writeStream.format("memory").queryName("wc")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("wc")
        .orderBy("window_start", "event_type").collect().toSeq
      assert(streamed == batch)
    } finally q.stop()
  }

  test("sessionize: sessions finalize as the watermark passes end + gap") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_sess").toString
    def write(name: String, rows: Seq[(Long, Timestamp, Long, String, Double, String)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$dir/$name")

    // user 1: two sessions (40-min gap); user 2: one session
    write("b1", Seq(
      (0L, ts(0), 1L, "click", 1.25, "{}"),
      (1L, ts(10), 1L, "view", 2.50, "{}"),
      (2L, ts(50), 1L, "click", 4.00, "{}"),
      (3L, ts(12), 2L, "view", 8.00, "{}")))

    val q = EventStream.sessionize(spark,
        EventStream.readStream(spark, s"$dir/*"), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val phase1 = spark.table("sess")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1),
          r.getTimestamp(2), r.getLong(3), r.getDouble(4))).toSet
      // the watermark (max ts - delay = +49 min) passes end + gap for
      // user 1's first session (+10 +30) and user 2's session (+12 +30),
      // so both finalize; user 1's second session (+50 +30 = +80 min)
      // stays buffered in state.
      assert(phase1 == Set(
        (1L, ts(0), ts(10), 2L, 3.75),
        (2L, ts(12), ts(12), 1L, 8.0)))

      // a much later event advances the watermark past the pending
      // timeout -> user 1's second session emits
      write("b2", Seq((4L, ts(200), 99L, "click", 0.10, "{}")))
      q.processAllAvailable()
      val phase2 = spark.table("sess")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1),
          r.getTimestamp(2), r.getLong(3), r.getDouble(4))).toSet
      assert(phase2 == phase1 + ((1L, ts(50), ts(50), 1L, 4.0)))
    } finally q.stop()

    // the batch twin draws the same session boundaries (plus user 99's
    // session, which the stream still holds open)
    val batch = EventStream.sessionizeBatch(
      spark.read.schema(EventStream.Schema).parquet(s"$dir/*"), gapMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        r.getTimestamp(2), r.getLong(3), r.getDouble(4))).toSet
    assert(batch == Set(
      (1L, ts(0), ts(10), 2L, 3.75),
      (1L, ts(50), ts(50), 1L, 4.0),
      (2L, ts(12), ts(12), 1L, 8.0),
      (99L, ts(200), ts(200), 1L, 0.1)))
  }

  test("sessionizeBatch matches an in-memory reference on random event sets (property)") {
    import spark.implicits._
    // seeded pseudo-random events: duplicate timestamps, shuffled input
    // order, multiple users — the reference splits per-user time-sorted
    // events on the 30-min gap and sums integer cents, mirroring the
    // production contract
    val rnd = new scala.util.Random(7)
    val gapMin = 30
    val events = new scala.util.Random(9)
      .shuffle(Seq.tabulate(400) { i =>
        val user = 1L + rnd.nextInt(5)
        val minutes = rnd.nextInt(600)
        val value = rnd.nextInt(10000) / 100.0
        (i.toLong, ts(minutes.toLong), user, "e", value, "{}")
      })
    val expected = events.groupBy(_._3).flatMap { case (user, evs) =>
      val sorted = evs.map(e => (e._2.getTime, e._5)).sortBy(_._1)
      val sessions = scala.collection.mutable.ListBuffer
        .empty[scala.collection.mutable.ListBuffer[(Long, Double)]]
      sorted.foreach { e =>
        if (sessions.nonEmpty &&
          e._1 - sessions.last.last._1 <= gapMin * 60000L) sessions.last += e
        else sessions += scala.collection.mutable.ListBuffer(e)
      }
      sessions.map { s =>
        (user, new Timestamp(s.head._1), new Timestamp(s.last._1),
          s.size.toLong,
          s.map(e => math.floor(e._2 * 100 + 0.5).toLong).sum / 100.0)
      }
    }.toSet
    val got = EventStream.sessionizeBatch(
      events.toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
      gapMinutes = gapMin)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        r.getTimestamp(2), r.getLong(3), r.getDouble(4))).toSet
    assert(got == expected)
  }

  test("sessionize null contract: null user/ts dropped, null value = 0.0 (round-5 review)") {
    import spark.implicits._
    // the schema declares user_id/ts/value nullable; the stream's
    // primitive encoder would crash on a null while the batch twin's
    // sum() silently skipped it — both paths now share one contract
    val events = Seq(
      (1L, ts(0), java.lang.Long.valueOf(7L), "e", java.lang.Double.valueOf(1.5), "{}"),
      (2L, ts(1), java.lang.Long.valueOf(7L), "e", null.asInstanceOf[java.lang.Double], "{}"),
      (3L, ts(2), null.asInstanceOf[java.lang.Long], "e", java.lang.Double.valueOf(9.0), "{}"),
      (4L, null.asInstanceOf[Timestamp], java.lang.Long.valueOf(7L), "e", java.lang.Double.valueOf(9.0), "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventStream.sessionizeBatch(events).collect()
    assert(out.length == 1)
    // user 7 keeps BOTH non-null-ts events (null value contributes 0.0)
    assert(out(0).getLong(0) == 7L)
    assert(out(0).getLong(3) == 2L)
    assert(out(0).getDouble(4) == 1.5)
  }

  test("advanceSessions: incremental+compacted equals full-history sessionization (property)") {
    // Drives the pure per-user state-step over random multi-batch streams
    // with a monotone watermark (incoming ts always > wm, Spark's late
    // filter) and checks, at every step, that the CUMULATIVE emissions
    // equal the sessions a full-history computation marks final at that
    // watermark — i.e. settled-prefix compaction never changes a
    // boundary or an aggregate. Also asserts the state bound compaction
    // exists for: <= 1 settled entry per kept session.
    val rnd = new scala.util.Random(11)
    def sessionsOf(events: Seq[(Long, Long)], gap: Long): List[List[(Long, Long)]] = {
      val sorted = events.sortBy(_._1).toList
      val out = scala.collection.mutable.ListBuffer.empty[List[(Long, Long)]]
      val cur = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
      sorted.foreach { e =>
        if (cur.nonEmpty && e._1 - cur.last._1 > gap) { out += cur.toList; cur.clear() }
        cur += e
      }
      if (cur.nonEmpty) out += cur.toList
      out.toList
    }
    for (trial <- 1 to 25) {
      val gap = (5 + rnd.nextInt(60)).toLong
      var wm = -1000L
      var kept = List.empty[List[SessionEvent]]
      val all = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
      val emitted = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long, Long)]
      for (_ <- 1 to 1 + rnd.nextInt(7)) {
        val incoming = List.fill(rnd.nextInt(6))(
          SessionEvent.raw(wm + 1 + rnd.nextInt(250), 1L + rnd.nextInt(100)))
        all ++= incoming.map(e => (e.ts, e.cents))
        val (emit, keep) =
          EventStream.advanceSessions(kept.flatten, incoming, wm, gap)
        kept = keep
        emitted ++= emit.map(s => (s.map(_.start).min, s.last.ts,
          s.map(_.n).sum, s.map(_.cents).sum))
        // reference: full history, finalized = last + gap < wm — STRICT,
        // matching advanceSessions' finality test (ADVICE r04: a session
        // with last + gap == wm must stay open, because a row at exactly
        // ts == wm may still be admitted by Spark's late filter and
        // would extend it)
        val expectFinal = sessionsOf(all.toSeq, gap)
          .filter(s => s.last._1 + gap < wm)
          .map(s => (s.head._1, s.last._1, s.size.toLong, s.map(_._2).sum))
        assert(emitted.toList.sorted == expectFinal.sorted,
          s"trial $trial wm=$wm")
        // compaction bound: at most one settled entry per kept session
        keep.foreach(s =>
          assert(s.count(e => e.ts + gap < wm) <= 1, s"trial $trial"))
        wm += rnd.nextInt(200)
      }
      // end state: emitted + kept together cover the full history exactly
      val finalAll = sessionsOf(all.toSeq, gap)
        .map(s => (s.head._1, s.last._1, s.size.toLong, s.map(_._2).sum))
      val (lastEmit, lastKeep) =
        EventStream.advanceSessions(kept.flatten, Nil, Long.MaxValue / 2, gap)
      assert(lastKeep.isEmpty)
      val total = emitted.toList ++ lastEmit.map(s => (s.map(_.start).min,
        s.last.ts, s.map(_.n).sum, s.map(_.cents).sum))
      assert(total.sorted == finalAll.sorted, s"trial $trial end")
    }
  }

  test("advanceSessions: watermark-boundary event merges, never splits (ADVICE r04)") {
    // The exact boundary the strict inequality exists for: a session ends
    // at ts=100 with gap=50, and the watermark sits at EXACTLY 150
    // (= last + gap). Under the conservative reading of Spark's late
    // filter a row at ts == watermark may still be admitted, so the
    // session must stay open...
    val gap = 50L
    val s0 = List(SessionEvent.raw(100L, 7L))
    val (emit0, keep0) = EventStream.advanceSessions(Nil, s0, 150L, gap)
    assert(emit0.isEmpty && keep0.size == 1)
    // ...and an event at exactly ts == wm == last + gap EXTENDS it into
    // one session (batch semantics: 150 - 100 <= gap), rather than
    // opening a second one against an already-emitted first
    val boundary = List(SessionEvent.raw(150L, 3L))
    val (emit1, keep1) =
      EventStream.advanceSessions(keep0.flatten, boundary, 150L, gap)
    assert(emit1.isEmpty && keep1.size == 1 && keep1.head.size == 2)
    // once the watermark passes strictly, ONE merged session emits
    val (emit2, keep2) =
      EventStream.advanceSessions(keep1.flatten, Nil, 201L, gap)
    assert(keep2.isEmpty && emit2.size == 1)
    val s = emit2.head
    assert(s.map(_.start).min == 100L && s.last.ts == 150L &&
      s.map(_.cents).sum == 10L && s.map(_.n).sum == 2L)
  }

  test("sessionize: out-of-order in-watermark straggler still merges (ADVICE r03)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_sess_ooo").toString
    def write(name: String, rows: Seq[(Long, Timestamp, Long, String, Double, String)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$dir/$name")

    // batch 1 delivers +0 and +60 (a 60-min gap: two sessions so far);
    // batch 2 delivers a STRAGGLER at +20 — inside the 2h watermark, and
    // inside session 1's gap window, so it must extend session 1 even
    // though a newer event already opened session 2. Inline-on-gap
    // emission (the pre-r4 design) had already emitted session 1 and
    // would double-count the straggler into session 2.
    write("b1", Seq(
      (0L, ts(0), 5L, "click", 1.00, "{}"),
      (1L, ts(60), 5L, "view", 2.00, "{}")))

    val q = EventStream.sessionize(spark,
        EventStream.readStream(spark, s"$dir/*"), gapMinutes = 30,
        watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName("sess_ooo")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      write("b2", Seq((2L, ts(20), 5L, "click", 4.00, "{}")))
      q.processAllAvailable()
      // flush: advance the watermark (+600 - 2h = +480) past both sessions
      write("b3", Seq((3L, ts(600), 99L, "click", 0.10, "{}")))
      q.processAllAvailable()
      val streamed = spark.table("sess_ooo")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1),
          r.getTimestamp(2), r.getLong(3), r.getDouble(4))).toSet
      assert(streamed == Set(
        (5L, ts(0), ts(20), 2L, 5.0),
        (5L, ts(60), ts(60), 1L, 2.0)))

      // batch twin agrees on every closed session
      val batch = EventStream.sessionizeBatch(
        spark.read.schema(EventStream.Schema).parquet(s"$dir/*"),
        gapMinutes = 30)
        .collect().map(r => (r.getLong(0), r.getTimestamp(1),
          r.getTimestamp(2), r.getLong(3), r.getDouble(4))).toSet
      assert(batch == streamed + ((99L, ts(600), ts(600), 1L, 0.1)))
    } finally q.stop()
  }
}
