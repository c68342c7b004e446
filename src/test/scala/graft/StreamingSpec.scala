package graft

import graft.streaming.{AEvent, SDoc, SEvent, Streams}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming behaviour through real micro-batches: the windowed
  * transform matches its batch twin, and sessionize emits sessions
  * once the watermark closes them. */
class StreamingSpec extends SparkSpecBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val events = Seq(
    SEvent(1, ts("2024-01-01 10:05:00"), "click", 10.0),
    SEvent(1, ts("2024-01-01 10:20:00"), "click", 20.0),
    SEvent(1, ts("2024-01-01 11:30:00"), "view", 30.0), // >30min gap → new session
    SEvent(2, ts("2024-01-01 10:45:00"), "click", 40.0),
    // late watermark-advancing tail so earlier windows/sessions close
    SEvent(9, ts("2024-01-02 00:00:00"), "view", 0.0))

  test("windowedCounts through a MemoryStream equals the batch windowedAgg") {
    import TestSession.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SEvent]
    mem.addData(events: _*)
    val q = Streams.windowedCounts(mem.toDF()).writeStream
      .format("memory").queryName("wc_out").outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("wc_out")
      .select(col("window_start"), col("event_type"), col("cnt"), col("sum_cents"))
      .collect().map(_.toSeq).toSet
    val batch = Streams.windowedAgg(events.toDF())
      .collect().map(_.toSeq).toSet
    // append mode only emits windows the watermark has passed; every
    // emitted row must match the batch result, and the closed 10:00
    // and 11:00 windows must be present
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch), s"streamed=$streamed batch=$batch")
    assert(streamed.exists(_.toString.contains("2024-01-01 10:00")), streamed.toString)
  }

  test("slidingCounts through a MemoryStream equals the batch slidingAgg, two windows per event") {
    import TestSession.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SEvent]
    mem.addData(events: _*)
    val q = Streams.slidingCounts(mem.toDF()).writeStream
      .format("memory").queryName("sl_out").outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("sl_out")
      .select(col("window_start"), col("event_type"), col("cnt"), col("sum_cents"))
      .collect().map(_.toSeq).toSet
    val batchDf = Streams.slidingAgg(events.toDF())
    val batch = batchDf.collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch), s"streamed=$streamed batch=$batch")
    // overlap accounting: each event is a member of exactly 2 windows
    assert(batchDf.agg(sum(col("cnt"))).first.getLong(0) == 2L * events.size)
    // the 10:05 click lands in both the 09:30 and 10:00 window starts
    assert(batch.exists(_.toString.contains("2024-01-01 09:30")), batch.toString)
    assert(batch.exists(_.toString.contains("2024-01-01 10:00")), batch.toString)
  }

  test("dedupStream drops within-horizon duplicate texts across micro-batches") {
    import TestSession.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SDoc]
    val q = Streams.dedupStream(mem.toDF()).writeStream
      .format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      // batch 1: one in-batch duplicate pair
      mem.addData(
        SDoc(1, ts("2024-01-01 10:00:00"), "alpha text"),
        SDoc(2, ts("2024-01-01 10:01:00"), "alpha text"),
        SDoc(3, ts("2024-01-01 10:02:00"), "beta text"))
      q.processAllAvailable()
      // batch 2: a cross-batch duplicate (within the watermark
      // horizon → state still remembers "alpha text") plus a new doc
      mem.addData(
        SDoc(4, ts("2024-01-01 10:30:00"), "alpha text"),
        SDoc(5, ts("2024-01-01 10:31:00"), "gamma text"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("dedup_out").select(col("text")).collect().map(_.getString(0))
    assert(got.length == 3, s"expected 3 survivors, got ${got.toSeq}")
    assert(got.toSet == Set("alpha text", "beta text", "gamma text"))
  }

  test("userWindowCounts through a MemoryStream feeds topkPerWindow identically to batch") {
    import TestSession.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SEvent]
    mem.addData(events: _*)
    val q = Streams.userWindowCountsStream(mem.toDF()).writeStream
      .format("memory").queryName("uwc_out").outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("uwc_out")
      .select(col("window_start"), col("user_id"), col("cnt"))
      .collect().map(_.toSeq).toSet
    val batchCounts = Streams.userWindowCounts(events.toDF())
      .collect().map(_.toSeq).toSet
    // closed windows' counts match the batch twin exactly
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batchCounts), s"streamed=$streamed batch=$batchCounts")
    // the downstream rank (the non-streamable half) on the batch twin:
    // user 1 wins the 10:00 window with 2 clicks over user 2's 1
    val top = Streams.topkPerWindow(events.toDF())
      .filter(col("window_start") === ts("2024-01-01 10:00:00"))
      .orderBy(col("rn")).collect()
    assert(top.map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("cnt"))).toSeq ==
      Seq((1L, 2L), (2L, 1L)), top.mkString(", "))
  }

  test("intervalJoin pairs clicks with same-user views inside the hour, through micro-batches") {
    import TestSession.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[SEvent]
    val views = MemoryStream[SEvent]
    val q = Streams.intervalJoin(clicks.toDF(), views.toDF()).writeStream
      .format("memory").queryName("ij_out").outputMode("append").start()
    try {
      clicks.addData(SEvent(1, ts("2024-01-01 10:00:00"), "click", 1.0))
      views.addData(
        SEvent(1, ts("2024-01-01 10:30:00"), "view", 1.0), // in window → match
        SEvent(1, ts("2024-01-01 12:00:00"), "view", 1.0), // past the hour → no match
        SEvent(2, ts("2024-01-01 10:15:00"), "view", 1.0)) // other user → no match
      q.processAllAvailable()
      // a view arriving in a LATER micro-batch still joins the
      // buffered click state
      views.addData(SEvent(1, ts("2024-01-01 10:45:00"), "view", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ij_out")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
    assert(got == Set(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00")),
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:45:00"))), got.toString)
  }

  test("sessionWindowCounts through a MemoryStream equals the batch sessionWindowAgg") {
    import TestSession.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SEvent]
    mem.addData(events: _*)
    val q = Streams.sessionWindowCounts(mem.toDF()).writeStream
      .format("memory").queryName("sw_out").outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("sw_out")
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
      .collect().map(_.toSeq).toSet
    val batch = Streams.sessionWindowAgg(events.toDF())
      .collect().map(_.toSeq).toSet
    // append mode only emits sessions the watermark has closed; every
    // emitted session must match the batch twin, and user 1's first
    // session (10:05..10:20, builtin end = last event + gap) must be
    // among them
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch), s"streamed=$streamed batch=$batch")
    assert(streamed.contains(Seq(1L, ts("2024-01-01 10:05:00"), ts("2024-01-01 10:50:00"), 2L)),
      streamed.toString)
  }

  test("sessionize emits closed sessions with correct bounds, counts, and late-event merging") {
    import TestSession.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SEvent]
    // batch 1 WITHOUT the watermark-advancing tail, so batch 2's late
    // event is still above the watermark (below it, Spark drops the
    // row before the state function ever sees it)
    mem.addData(events.filter(_.user_id != 9): _*)
    val q = Streams.sessionize(mem.toDS()).writeStream
      .format("memory").queryName("sess_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      // a LATE out-of-order event for user 2 (10:40 < the state's 10:45
      // end, within the gap) must merge without moving the window
      // backward
      mem.addData(SEvent(2, ts("2024-01-01 10:40:00"), "click", 5.0))
      q.processAllAvailable()
      // two watermark-advancing batches: the first moves the watermark
      // past every open session's timeout, the second triggers the
      // timeout pass that emits them
      mem.addData(SEvent(9, ts("2024-01-02 00:00:00"), "view", 0.0))
      q.processAllAvailable()
      mem.addData(SEvent(9, ts("2024-01-03 00:00:00"), "view", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sess_out")
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet
    // user 1: first session = 2 events 10:05..10:20 (closed by the 11:30 event)
    assert(got.contains((1L, ts("2024-01-01 10:05:00"), ts("2024-01-01 10:20:00"), 2L)), got.toString)
    // user 1 second session closes via timeout
    assert(got.exists(s => s._1 == 1L && s._4 == 1L), got.toString)
    // user 2: late event merged -> 10:40..10:45 with 2 events (never
    // an inverted start > end window)
    assert(got.contains((2L, ts("2024-01-01 10:40:00"), ts("2024-01-01 10:45:00"), 2L)), got.toString)
    assert(got.forall(s => !s._2.after(s._3)), s"inverted session window: $got")
  }

  test("enrichStream joins a static dim per micro-batch with no state") {
    import TestSession.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "BUILDING"), (2L, "MACHINERY"), (9L, "FURNITURE"))
      .toDF("c_custkey", "c_mktsegment")
    val mem = MemoryStream[SEvent]
    val q = Streams.enrichStream(mem.toDF(), dim).writeStream
      .format("memory").queryName("enrich_out").outputMode("append").start()
    try {
      mem.addData(events.take(3): _*)
      q.processAllAvailable()
      mem.addData(events.drop(3): _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("enrich_out")
      .select(col("user_id"), col("ts"), col("segment"), col("v_cents"))
      .collect().map(_.toSeq).toSet
    val batch = Streams.enrichStream(events.toDF(), dim)
      .select(col("user_id"), col("ts"), col("segment"), col("v_cents"))
      .collect().map(_.toSeq).toSet
    // stateless per-row enrichment: the stream emits EXACTLY the batch
    // rows (no watermark holdback, nothing buffered)
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    assert(streamed.exists(_.toString.contains("BUILDING")), streamed.toString)
  }

  test("cdcStream upsert replay equals the batch last-change-wins state") {
    import TestSession.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.CEvent
    val changes = Seq(
      CEvent(1, 1L, ts("2024-01-01 10:00:00"), "signup", 1.0),
      CEvent(1, 2L, ts("2024-01-01 10:10:00"), "purchase", 5.0),
      CEvent(2, 3L, ts("2024-01-01 10:05:00"), "view", 2.0),
      CEvent(2, 4L, ts("2024-01-01 10:20:00"), "error", 0.0), // tombstone
      CEvent(3, 5L, ts("2024-01-01 10:30:00"), "click", 7.0),
      // out-of-order LATE change for user 1 — must NOT win
      CEvent(1, 0L, ts("2024-01-01 09:00:00"), "view", 9.0))
    val mem = MemoryStream[CEvent]
    val q = Streams.cdcStream(mem.toDS()).writeStream
      .format("memory").queryName("cdc_out").outputMode("update").start()
    try {
      mem.addData(changes.take(3): _*)
      q.processAllAvailable()
      mem.addData(changes.drop(3): _*)
      q.processAllAvailable()
    } finally q.stop()
    // replay the upsert stream in arrival order: last emission per key
    // wins; deleted=true removes the key
    val emitted = spark.table("cdc_out").collect()
    val replayed = emitted.zipWithIndex
      .groupBy(_._1.getAs[Long]("user_id"))
      .map { case (u, rows) => u -> rows.maxBy(_._2)._1 }
      .filter(!_._2.getAs[Boolean]("deleted"))
      .map { case (u, r) => (u, r.getAs[String]("last_type"), r.getAs[Long]("v_cents")) }
      .toSet
    val batch = Streams.cdcBatch(changes.toDF())
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(replayed == batch, s"replayed=$replayed batch=$batch")
    assert(replayed == Set((1L, "purchase", 500L), (3L, "click", 700L)), replayed.toString)
  }

  test("anomalyStream through a MemoryStream equals the batch trailing-frame twin") {
    import TestSession.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // user 1: 9 calm events (1.00) then a 10x spike — the spike has
    // trail_n >= 8 and v*n > 4*sum, so exactly it is flagged
    val calm = (1 to 9).map(i =>
      AEvent(1, i.toLong, ts(f"2024-01-01 10:${i}%02d:00"), 1.0))
    val spike = AEvent(1, 10L, ts("2024-01-01 10:10:00"), 10.0)
    val other = (1 to 5).map(i =>
      AEvent(2, (100 + i).toLong, ts(f"2024-01-01 10:${i}%02d:00"), 2.0))
    val allEvents = (calm :+ spike) ++ other
    val mem = MemoryStream[AEvent]
    // split across micro-batches so ring state must survive a batch boundary
    val q = Streams.anomalyStream(mem.toDS()).writeStream
      .format("memory").queryName("anom_out").outputMode("append").start()
    try {
      mem.addData(calm.take(5): _*)
      q.processAllAvailable()
      mem.addData((calm.drop(5) :+ spike) ++ other: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("anom_out")
      .select(col("user_id"), col("event_id"), col("v_cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Streams.anomalyBatch(
        allEvents.toDF().withColumnRenamed("value", "value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    assert(streamed == Set((1L, 10L, 1000L)), streamed.toString)
  }

  test("parquet foreachBatch sink: checkpointed restart + batch replay stay exactly-once") {
    import TestSession.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_sink_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sink_ckpt").toString
    val mem = MemoryStream[SEvent]
    def cols(df: org.apache.spark.sql.DataFrame) = df
      .select(col("window_start"), col("event_type"), col("cnt"), col("sum_cents"))
      .collect().map(_.toSeq).toSeq

    // first incarnation: half the stream, then a clean stop
    mem.addData(events.take(3): _*)
    val q1 = Streams.sinkToParquet(Streams.windowedCounts(mem.toDF()), out, ckpt)
    try q1.processAllAvailable() finally q1.stop()

    // SECOND incarnation from the SAME checkpoint dir: committed
    // offsets resume (no reprocessing of the first half), the
    // watermark-advancing tail closes the earlier windows
    mem.addData(events.drop(3): _*)
    val q2 = Streams.sinkToParquet(Streams.windowedCounts(mem.toDF()), out, ckpt)
    try q2.processAllAvailable() finally q2.stop()

    val sunk = spark.read.parquet(out)
    val rows = cols(sunk)
    val batch = Streams.windowedAgg(events.toDF()).collect().map(_.toSeq).toSet
    assert(rows.nonEmpty)
    // exactly-once across the restart: append-mode emits each closed
    // window once, so any duplicate row means the restart re-delivered
    assert(rows.distinct.size == rows.size, s"duplicate rows after restart: $rows")
    assert(rows.toSet.subsetOf(batch), s"sunk=$rows batch=$batch")
    assert(rows.exists(_.toString.contains("2024-01-01 10:00")), rows.toString)

    // replay simulation: re-run the LAST batch id's merge by hand (the
    // crash-between-write-and-commit window) — the dynamic-overwrite
    // merge must be idempotent, not append a second copy
    val lastId = sunk.agg(max(col("batch_id").cast("long"))).first.getLong(0)
    val replayed = sunk.filter(col("batch_id") === lastId).drop("batch_id")
    Streams.mergeBatch(replayed, lastId, out)
    val after = cols(spark.read.parquet(out))
    assert(after.sortBy(_.toString) == rows.sortBy(_.toString),
      s"batch replay changed sink contents: before=$rows after=$after")
  }

  test("stream_sink_parquet registry key: multi-batch file-source run lands every event exactly once") {
    val sunk = Registry.byName("stream_sink_parquet").build(spark, sfDir)
    val events = sources.Tables.events(spark, sfDir)
    val n = events.count()
    // exactly-once: total rows == source rows AND the event_id set is
    // duplicate-free — a re-appended replay fails the first, a dropped
    // micro-batch fails both
    assert(sunk.count() == n)
    assert(sunk.select("event_id").distinct().count() == n)
  }
}
