package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(minute * 60000L)

  test("windowedStats: watermarked sliding windows aggregate per key") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val out = StreamOps.windowedStats(
      in.toDF.toDF("ts", "user", "value"),
      "ts", "user", "value", "10 minutes", "5 minutes", "5 minutes")
    val q = out.writeStream.format("memory").queryName("ws")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((ts(1), "u1", 10.0), (ts(2), "u1", 20.0), (ts(3), "u2", 5.0))
      q.processAllAvailable()
      // advance event time far past watermark to close the early windows
      in.addData((ts(60), "u1", 1.0))
      q.processAllAvailable()
      val rows = spark.table("ws").collect()
      val u1 = rows.filter(r => r.getAs[String]("user") == "u1" &&
        r.getAs[Timestamp]("window_start").getTime == 0L)
      assert(u1.length == 1)
      assert(u1.head.getAs[Long]("n") == 2L)
      assert(u1.head.getAs[Double]("value_sum") == 30.0)
    } finally q.stop()
  }

  test("streamingWindowedDistinct: HLL windowed uniques, batch parity") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val out = StreamOps.streamingWindowedDistinct(
      in.toDF.toDF("ts", "user"), "ts", "user", "10 minutes", "5 minutes")
    val q = out.writeStream.format("memory").queryName("swd")
      .outputMode(OutputMode.Append).start()
    try {
      // window [0,10): users 1,2,3 with a repeat; spread over batches
      in.addData((ts(1), 1L), (ts(2), 2L), (ts(3), 1L))
      q.processAllAvailable()
      in.addData((ts(4), 3L), (ts(5), 2L))
      q.processAllAvailable()
      in.addData((ts(60), 9L)) // advance watermark, close the window
      q.processAllAvailable()
      val rows = spark.table("swd").collect()
        .filter(_.getAs[Timestamp]("window_start").getTime == 0L)
      assert(rows.length == 1)
      val got = rows.head.getAs[Long]("approx_distinct")
      assert(rows.head.getAs[Long]("n_events") == 5L)
      // HLL++ is deterministic: the streamed estimate must equal the
      // batch estimate on the same slice (merge order cannot matter)
      val batch = Seq((ts(1), 1L), (ts(2), 2L), (ts(3), 1L), (ts(4), 3L),
          (ts(5), 2L)).toDF("ts", "user")
        .agg(approx_count_distinct(col("user"), 0.05)).head.getLong(0)
      assert(got == batch, s"stream $got != batch $batch")
      assert(got >= 2 && got <= 4, s"3 true uniques estimated as $got")
    } finally q.stop()
  }

  test("streamingAmsF2: windowed sketch counters, exact batch parity") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val out = StreamOps.streamingAmsF2(
      in.toDF.toDF("ts", "h"), "ts", "h", "10 minutes", "5 minutes")
    val q = out.writeStream.format("memory").queryName("samsf2")
      .outputMode(OutputMode.Append).start()
    try {
      // one window [0,10): a skewed item mix split across micro-batches.
      // Items carry SPREAD hash-like values (production callers pass
      // strHash output over [0, P)): the sign parity needs well-mixed
      // inputs — tiny adjacent ints (7, 11, 13, 17) produce correlated
      // signs and a wildly biased toy estimate (measured 87.75 vs
      // F2=30), which is a property of the degenerate inputs, not the
      // sketch
      val a = 712334556677L % 1000000007L
      val b = 98765432101L % 1000000007L
      val c = 55544433322L % 1000000007L
      val d = 31415926535L % 1000000007L
      val items = Seq(a, a, a, b, b, c, d, d, d, d)
      in.addData(items.take(4).zipWithIndex.map { case (h, i) => (ts(i), h) }: _*)
      q.processAllAvailable()
      in.addData(items.drop(4).zipWithIndex.map { case (h, i) => (ts(4 + i), h) }: _*)
      q.processAllAvailable()
      in.addData((ts(60), 99L)) // advance watermark, close the window
      q.processAllAvailable()
      val rows = spark.table("samsf2").collect()
        .filter(_.getAs[Timestamp]("window_start").getTime == 0L)
      assert(rows.length == 1)
      val r = rows.head
      assert(r.getAs[Long]("n_events") == 10L)
      // counter-exact parity with the batch formula on the same slice
      // (addition is associative — micro-batch boundaries cannot matter)
      val P = 1000000007L
      (1 to 16).foreach { j =>
        val expect = items.map { h =>
          val t = h + j * 1000003L
          if (t * t % P % 2 == 0) 1L else -1L
        }.sum
        assert(r.getAs[Long](s"s$j") == expect, s"counter s$j")
      }
      val sq = (1 to 16).map(j => { val v = r.getAs[Long](s"s$j"); v * v }).sum
      assert(r.getAs[Double]("f2_est") == sq / 16.0)
      // F2 truth for this slice is 3^2+2^2+1^2+4^2 = 30; per-counter
      // sd on 4 items is ~33 (2(F2²−F4) = 1092), mean-of-16 sd ~8.3 —
      // a loose 4σ sanity band, the exact assertions above are the test
      assert(math.abs(r.getAs[Double]("f2_est") - 30.0) < 34.0,
        s"estimate ${r.getAs[Double]("f2_est")} outside 4 sigma of F2=30")
    } finally q.stop()
  }

  test("foreachBatchScorer applies a fitted batch model per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    // fit a linear AE on static rank-1 data, then score a stream with it
    val fitDf = (0 until 50).map(i => (i.toLong, Seq(i * 0.1, i * 0.1)))
      .toDF("id", "features")
    val model = graft.score.LinearAE.fit(fitDf, "id", "features", k = 1,
      sampleSize = 50)
    val in = MemoryStream[(Long, Seq[Double])]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val q = StreamOps.foreachBatchScorer(
      in.toDF.toDF("id", "features"),
      batch => model.transform(batch, "features", "err"),
      (scored, _) => seen.synchronized {
        seen ++= scored.select("id", "err").collect()
          .map(r => (r.getLong(0), r.getDouble(1)))
      },
      ckpt)
    try {
      in.addData((1L, Seq(0.5, 0.5)), (2L, Seq(5.0, -5.0)))
      q.awaitTermination()
      val m = seen.toMap
      assert(m(1L) < 1e-10)   // on the learned subspace
      assert(m(2L) > 1.0)     // far off-subspace
    } finally q.stop()
  }

  test("IdempotentSink: a replayed batchId is skipped, new ones apply") {
    StreamOps.IdempotentSink.clear("t1")
    val applied = scala.collection.mutable.ArrayBuffer.empty[Long]
    val sink = new StreamOps.IdempotentSink("t1",
      (_, id) => applied.synchronized { applied += id })
    val df = spark.range(1).toDF()
    sink(df, 0L); sink(df, 1L)
    sink(df, 0L) // at-least-once replay: must be a no-op
    sink(df, 2L)
    assert(applied.toSeq == Seq(0L, 1L, 2L))
    // a batch whose sink THROWS must stay unmarked: the replay retries
    // it instead of silently dropping the data forever
    StreamOps.IdempotentSink.clear("t3")
    var failOnce = true
    val flaky = scala.collection.mutable.ArrayBuffer.empty[Long]
    val fsink = new StreamOps.IdempotentSink("t3", (_, id) => {
      if (id == 7L && failOnce) { failOnce = false; sys.error("transient") }
      flaky.synchronized { flaky += id }
    })
    intercept[RuntimeException] { fsink(df, 7L) }
    fsink(df, 7L) // replay after failure: must apply
    fsink(df, 7L) // replay after success: must skip
    assert(flaky.toSeq == Seq(7L))
    // a different query key has an independent ledger
    StreamOps.IdempotentSink.clear("t2")
    val other = scala.collection.mutable.ArrayBuffer.empty[Long]
    new StreamOps.IdempotentSink("t2",
      (_, id) => other.synchronized { other += id })(df, 0L)
    assert(other.toSeq == Seq(0L))
  }

  test("streamingSessionize: gap-break within a batch, timeout via watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val out = StreamOps.streamingSessionize(
      in.toDF.toDF("ts", "user", "value"),
      "ts", "user", "value", gapMs = 5 * 60000L, watermarkDelay = "0 seconds")
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append).start()
    try {
      // u1: events at minutes 1,2 then 20,21 — the in-batch gap break
      // closes the first session immediately
      in.addData((ts(1), "u1", 1.0), (ts(2), "u1", 2.0),
        (ts(20), "u1", 3.0), (ts(21), "u1", 4.0))
      q.processAllAvailable()
      val first = spark.table("sess").collect()
      assert(first.length == 1)
      assert(first.head.getAs[String]("key") == "u1")
      assert(first.head.getAs[Timestamp]("session_start") == ts(1))
      assert(first.head.getAs[Timestamp]("session_end") == ts(2))
      assert(first.head.getAs[Long]("n_events") == 2L)
      assert(first.head.getAs[Double]("value_sum") == 3.0)
      // a far-future event for another key advances the watermark past
      // 21min + gap, timing out u1's open session
      in.addData((ts(120), "u2", 9.0))
      q.processAllAvailable()
      in.addData((ts(121), "u2", 1.0)) // one more batch so the timeout fires
      q.processAllAvailable()
      val rows = spark.table("sess").collect()
      val u1Late = rows.filter(r => r.getAs[String]("key") == "u1" &&
        r.getAs[Timestamp]("session_start") == ts(20))
      assert(u1Late.length == 1)
      assert(u1Late.head.getAs[Long]("n_events") == 2L)
      assert(u1Late.head.getAs[Double]("value_sum") == 7.0)
    } finally q.stop()
  }

  test("streamingSessionize: late in-gap event extends start; stale event splits") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val out = StreamOps.streamingSessionize(
      in.toDF.toDF("ts", "user", "value"),
      "ts", "user", "value", gapMs = 5 * 60000L, watermarkDelay = "15 minutes")
    val q = out.writeStream.format("memory").queryName("sessl")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((ts(10), "u1", 1.0), (ts(11), "u1", 2.0))
      q.processAllAvailable()
      // minute 9 is late but in-gap: merges and extends start backwards;
      // minute 1 is stale (> gap before the open session): its own session
      in.addData((ts(9), "u1", 4.0), (ts(1), "u1", 8.0))
      q.processAllAvailable()
      val stale = spark.table("sessl").collect()
      assert(stale.length == 1)
      assert(stale.head.getAs[Timestamp]("session_start") == ts(1) &&
        stale.head.getAs[Long]("n_events") == 1L &&
        stale.head.getAs[Double]("value_sum") == 8.0)
      // close the merged session via watermark advance
      in.addData((ts(120), "u2", 0.0))
      q.processAllAvailable()
      in.addData((ts(121), "u2", 0.0))
      q.processAllAvailable()
      val merged = spark.table("sessl").collect()
        .filter(r => r.getAs[String]("key") == "u1" &&
          r.getAs[Long]("n_events") == 3L)
      assert(merged.length == 1)
      assert(merged.head.getAs[Timestamp]("session_start") == ts(9))
      assert(merged.head.getAs[Timestamp]("session_end") == ts(11))
      assert(merged.head.getAs[Double]("value_sum") == 7.0)
    } finally q.stop()
  }

  test("streamingSessionize: adjacent stale events gap-merge like batch") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val out = StreamOps.streamingSessionize(
      in.toDF.toDF("ts", "user", "value"),
      "ts", "user", "value", gapMs = 5 * 60000L, watermarkDelay = "60 minutes")
    val q = out.writeStream.format("memory").queryName("sessm")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((ts(30), "u1", 1.0), (ts(31), "u1", 2.0))
      q.processAllAvailable()
      // four stale events, all > gap before the open session's start:
      // minutes 1,2,3 are within gap of each other (ONE session, the
      // batch Sessionizer's answer), minute 12 is its own
      in.addData((ts(1), "u1", 1.0), (ts(2), "u1", 2.0), (ts(3), "u1", 4.0),
        (ts(12), "u1", 8.0))
      q.processAllAvailable()
      val rows = spark.table("sessm").collect()
        .map(r => (r.getAs[Timestamp]("session_start"),
          r.getAs[Timestamp]("session_end"),
          r.getAs[Long]("n_events"), r.getAs[Double]("value_sum")))
        .sortBy(_._1.getTime)
      assert(rows.toSeq == Seq((ts(1), ts(3), 3L, 7.0), (ts(12), ts(12), 1L, 8.0)))
    } finally q.stop()
  }

  test("runningMaxPerKey keeps cumulative state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Double)]
    val out = StreamOps.runningMaxPerKey(in.toDF.toDF("k", "v"), "k", "v")
    val q = out.writeStream.format("memory").queryName("rm")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(("a", 1.0), ("a", 3.0), ("b", 2.0))
      q.processAllAvailable()
      in.addData(("a", 2.0), ("b", 9.0))
      q.processAllAvailable()
      val last = spark.table("rm").collect()
        .map(r => (r.getString(0), r.getDouble(1)))
        .groupBy(_._1).map { case (k, vs) => k -> vs.last._2 }
      assert(last("a") == 3.0) // 2.0 did not lower the running max
      assert(last("b") == 9.0)
    } finally q.stop()
  }

  test("streamingNearDupAlerts matches batch banded candidates across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, String)]
    val out = StreamOps.streamingNearDupAlerts(
      in.toDF.toDF("doc_id", "text"), "doc_id", "text")
    val q = out.writeStream.format("memory").queryName("nda")
      .outputMode(OutputMode.Append).start()
    try {
      val a = "the quick brown fox jumps over the lazy dog again and again today"
      val c = "completely different content with nothing shared at all here now"
      in.addData((1L, a), (3L, c))
      q.processAllAvailable()
      in.addData((2L, a)) // near-dup arriving in a LATER batch
      q.processAllAvailable()
      val alerts = spark.table("nda").collect()
        .map(r => (r.getLong(2), r.getLong(3))).distinct.toSet
      assert(alerts.contains((1L, 2L)), s"dup not flagged: $alerts")
      assert(!alerts.exists(p => p._1 == 3L || p._2 == 3L),
        "disjoint doc must not alert")
      // parity: the batch banded candidate set is exactly the alert set
      val batch = graft.dedup.MinHashLSH.candidatePairs(
          Seq((1L, a), (2L, a), (3L, c)).toDF("doc_id", "text"),
          "doc_id", "text", n = 3, k = 16, bands = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(alerts.map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
        == batch, s"stream $alerts != batch $batch")
    } finally q.stop()
  }

  test("streamingEwma carries the fold across batches and matches batch ewmaByKey") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, Double)]
    val out = StreamOps.streamingEwma(in.toDF.toDF("k", "t", "v"),
      "k", "t", "v", alpha = 0.5)
    val q = out.writeStream.format("memory").queryName("sewma")
      .outputMode(OutputMode.Update).start()
    try {
      // batch 1 arrives out of order WITHIN the batch (sorted by t first)
      val b1 = Seq((1L, 2L, 20.0), (1L, 1L, 10.0), (2L, 1L, 4.0))
      // batch 2 continues key 1 in time order across batches
      val b2 = Seq((1L, 3L, 30.0), (1L, 4L, 40.0))
      in.addData(b1: _*)
      q.processAllAvailable()
      in.addData(b2: _*)
      q.processAllAvailable()
      val last = spark.table("sewma").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
        .groupBy(_._1).map { case (k, vs) => k -> vs.maxBy(_._2._1)._2 }
      // exact parity with the batch operator on the concatenated data
      val batch = graft.seq.Rolling.ewmaByKey(
          (b1 ++ b2).toDF("k", "t", "v"), Seq("k"), "t", "v", alpha = 0.5)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(last(1L) == batch(1L), s"streaming ${last(1L)} vs batch ${batch(1L)}")
      assert(last(2L) == batch(2L))
      // and the fold really is the expected closed form:
      // 10 → 15 → 22.5 → 31.25
      assert(last(1L) == ((4L, 31.25)))
    } finally q.stop()
  }

  test("streamStreamJoin matches keys within the event-time interval only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long, String)]
    val buys = MemoryStream[(Timestamp, Long, Double)]
    val out = StreamOps.streamStreamJoin(
      clicks.toDF.toDF("ts", "uid", "page"),
      buys.toDF.toDF("ts", "uid", "amount"),
      keyCol = "uid", tsCol = "ts",
      leftWatermark = "10 minutes", rightWatermark = "10 minutes",
      before = "0 minutes", after = "15 minutes")
    val q = out.writeStream.format("memory").queryName("ssj")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData((ts(1), 1L, "home"), (ts(2), 2L, "search"))
      buys.addData(
        (ts(10), 1L, 5.0),   // within 15 min of u1's click → joins
        (ts(40), 2L, 9.0),   // 38 min after u2's click → outside window
        (ts(5), 3L, 7.0))    // no clicking user 3 → no partner
      q.processAllAvailable()
      val rows = spark.table("ssj").collect()
        .map(r => (r.getAs[Long]("l_uid"), r.getAs[String]("l_page"),
          r.getAs[Double]("r_amount")))
      assert(rows.toSet == Set((1L, "home", 5.0)))
    } finally q.stop()
  }

  test("stream-static broadcast enrichment join resolves per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.broadcast
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("uid", "tier")
    val in = MemoryStream[(Timestamp, Long, Double)]
    val out = in.toDF.toDF("ts", "uid", "amount")
      .join(broadcast(dim), Seq("uid"), "left")
    val q = out.writeStream.format("memory").queryName("ssj_static")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((ts(1), 1L, 5.0), (ts(2), 3L, 7.0))
      q.processAllAvailable()
      val rows = spark.table("ssj_static").collect()
        .map(r => (r.getAs[Long]("uid"), Option(r.getAs[String]("tier")))).toSet
      assert(rows === Set((1L, Some("gold")), (3L, None)))
    } finally q.stop()
  }

  test("streamingDedup drops repeated keys across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val out = StreamOps.streamingDedup(
      in.toDF.toDF("ts", "doc_id", "text"), Seq("doc_id"), "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("sd")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((ts(1), 1L, "a"), (ts(1), 2L, "b"), (ts(2), 1L, "a-dup"))
      q.processAllAvailable()
      in.addData((ts(3), 2L, "b-dup"), (ts(3), 3L, "c"))
      q.processAllAvailable()
      val ids = spark.table("sd").select("doc_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("enrich: stream-static broadcast join per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val in = MemoryStream[(Long, Double)]
    val out = StreamOps.enrich(in.toDF.toDF("user_id", "value"), dim,
      Seq("user_id"))
    val q = out.writeStream.format("memory").queryName("en")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((1L, 5.0), (2L, 6.0), (3L, 7.0))
      q.processAllAvailable()
      val rows = spark.table("en").collect()
        .map(r => r.getAs[Long]("user_id") -> r.getAs[String]("tier")).toMap
      assert(rows == Map(1L -> "gold", 2L -> "silver")) // 3 has no dim row
    } finally q.stop()
  }

  test("streamingPsi flags a shifted window against a frozen baseline") {
    implicit val sqlCtx = spark.sqlContext
    val baseline = (1 to 100).map(_.toDouble).toDF("x")
    val base = graft.drift.Drift.fitPsiBaseline(baseline, Seq("x"), bins = 5)
    val in = MemoryStream[(Timestamp, Double)]
    val out = StreamOps.streamingPsi(in.toDF.toDF("ts", "x"), "ts", base,
      "10 minutes", "5 minutes")
    val q = out.writeStream.format("memory").queryName("sp")
      .outputMode(OutputMode.Append).start()
    try {
      // window [0,10): the baseline distribution; [10,20): shifted mass
      in.addData((1 to 100).map(i => (ts(1 + i % 3), i.toDouble)): _*)
      in.addData((1 to 100).map(i => (ts(11 + i % 3), 500.0 + i)): _*)
      q.processAllAvailable()
      in.addData((ts(60), 1.0)) // advance watermark to close both windows
      q.processAllAvailable()
      val rows = spark.table("sp").collect()
        .map(r => r.getAs[Timestamp]("window_start").getTime ->
          r.getAs[Double]("psi")).toMap
      assert(rows.contains(0L) && rows.contains(600000L))
      assert(math.abs(rows(0L)) < 0.05,
        s"same-distribution window psi should be ~0, got ${rows(0L)}")
      assert(rows(600000L) > 0.25,
        s"shifted window psi should flag, got ${rows(600000L)}")
    } finally q.stop()
  }

  test("streamingPsi per-window psi equals batch Drift.psi on the same slice") {
    implicit val sqlCtx = spark.sqlContext
    val baseline = (1 to 100).map(_.toDouble).toDF("x")
    val base = graft.drift.Drift.fitPsiBaseline(baseline, Seq("x"), bins = 5)
    // two windows with different mixes: in-distribution, and half-shifted
    val w0 = (1 to 100).map(i => (ts(1 + i % 3), i.toDouble))
    val w1 = (1 to 100).map(i =>
      (ts(11 + i % 3), if (i % 2 == 0) 500.0 + i else i.toDouble))
    val in = MemoryStream[(Timestamp, Double)]
    val out = StreamOps.streamingPsi(in.toDF.toDF("ts", "x"), "ts", base,
      "10 minutes", "5 minutes")
    val q = out.writeStream.format("memory").queryName("spp")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(w0 ++ w1: _*)
      q.processAllAvailable()
      in.addData((ts(60), 1.0)) // advance watermark to close both windows
      q.processAllAvailable()
      val streamed = spark.table("spp").collect()
        .map(r => r.getAs[Timestamp]("window_start").getTime ->
          r.getAs[Double]("psi")).toMap
      // batch twin: Drift.psi(baseline, <window slice>) with the same
      // bins — same edges (same fit path), same eps smoothing; the only
      // representational difference is the term-sum (decimal-exact in
      // batch, fixed-order double in the stream), so parity is asserted
      // at the shared round-at-6 output scale
      Seq(0L -> w0, 600000L -> w1).foreach { case (wStart, slice) =>
        val batchPsi = graft.drift.Drift.psi(
            baseline, slice.map(_._2).toDF("x"), Seq("x"), bins = 5)
          .collect().head.getAs[Double]("psi")
        assert(math.abs(streamed(wStart) - batchPsi) <= 1e-6,
          s"window $wStart: streaming ${streamed(wStart)} vs batch $batchPsi")
      }
    } finally q.stop()
  }

  test("thresholdAlerts is a stateless pass-through filter") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Double)]
    val out = StreamOps.thresholdAlerts(in.toDF.toDF("id", "score"), "score", 0.5)
    val q = out.writeStream.format("memory").queryName("ta")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((1L, 0.1), (2L, 0.9), (3L, 0.6))
      q.processAllAvailable()
      val ids = spark.table("ta").select("id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(2L, 3L))
    } finally q.stop()
  }

  test("streamingHeavyHitters: sharded MG is a superset of batch-exact " +
      "heavy hitters with the per-shard error bound") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val out = StreamOps.streamingHeavyHitters(in.toDF.toDF("item"), "item",
      buckets = 2, capacity = 4)
    val q = out.writeStream.format("memory").queryName("shh")
      .outputMode(OutputMode.Update).start()
    val b1 = Seq.fill(30)("hot") ++ Seq.fill(10)("warm") ++
      ('a' to 'f').map(_.toString)
    val b2 = Seq.fill(20)("hot") ++ Seq.fill(10)("warm") ++
      ('g' to 'l').map(_.toString)
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val rows = spark.table("shh").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
      // final emission per shard = rows carrying that shard's max n
      // (n_shard strictly grows whenever the group is invoked)
      val fin = rows.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
        val mx = rs.map(_._4).max; rs.filter(_._4 == mx).toSeq
      }
      val all = b1 ++ b2
      val trueCounts = all.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      // totals: the shards' final ns partition the stream
      assert(fin.groupBy(_._1).map(_._2.head._4).sum == all.size.toLong)
      // superset: batch-exact heavy hitters (freq > n/4) all tracked
      import spark.implicits._
      val exact = graft.core.HeavyHitters.exact(
        all.toDF("item"), "item", k = 4)
        .select("item").as[String].collect().toSet
      val tracked = fin.map(_._2).toSet
      assert(exact.subsetOf(tracked), s"missing: ${exact diff tracked}")
      // MG bound per tracked item: lb <= true <= lb + n_shard/capacity
      fin.foreach { case (_, item, lb, nShard) =>
        val t = trueCounts(item)
        assert(lb <= t, s"$item lb $lb > true $t")
        assert(t - lb <= nShard / 4, s"$item true $t - lb $lb > ${nShard / 4}")
      }
    } finally q.stop()
  }
}
