package graft

import graft.seq.Sequencer
import org.apache.spark.sql.functions._

class SeqSpec extends SparkSpec {
  import spark.implicits._

  private def series = Seq(
    ("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0), ("a", 4L, 4.0),
    ("b", 1L, 10.0), ("b", 2L, 20.0)
  ).toDF("k", "o", "v")

  test("slidingSequences: n < t per series yields no sequences (utils.py:105-108)") {
    val out = Sequencer.slidingSequences(series, Seq("k"), Seq(col("o")), col("v"), t = 3)
    val rows = out.select("k", "row_id", "seq").collect()
    // series a has 4 rows -> 2 sequences (ends 3,4); series b has 2 < 3 -> none
    assert(rows.map(_.getString(0)).forall(_ == "a"))
    assert(rows.map(_.getInt(1)).sorted.toSeq == Seq(3, 4))
    val seqAt3 = rows.find(_.getInt(1) == 3).get.getSeq[Double](2)
    assert(seqAt3 == Seq(1.0, 2.0, 3.0), "oldest->newest order")
  }

  test("slidingSequences: t = 1 is identity-per-row; t > n empty") {
    val one = Sequencer.slidingSequences(series, Seq("k"), Seq(col("o")), col("v"), t = 1)
    assert(one.count() == 6)
    val none = Sequencer.slidingSequences(series, Seq("k"), Seq(col("o")), col("v"), t = 5)
    assert(none.count() == 0)
  }

  test("expandMembers dedups overlapping windows") {
    val flagged = Seq(("a", 3), ("a", 4)).toDF("k", "row_id")
    val m = Sequencer.expandMembers(flagged, Seq("k"), t = 3)
    // windows {1,2,3} and {2,3,4} -> union {1,2,3,4}
    assert(m.select("member_row_id").as[Int].collect().sorted.toSeq == Seq(1, 2, 3, 4))
  }

  test("multi-feature windows: array-valued sequences give (t, f) tensors") {
    import org.apache.spark.sql.functions._
    // the reference's LSTM input is (timesteps, features); passing an
    // array-valued column to slidingSequences yields array<array<_>>
    val df = Seq(
      (1L, 1L, 1.0, 10.0), (1L, 2L, 2.0, 20.0), (1L, 3L, 3.0, 30.0)
    ).toDF("sid", "ord", "a", "b")
    val seqs = graft.seq.Sequencer.slidingSequences(
      df, Seq("sid"), Seq(col("ord")), array(col("a"), col("b")), t = 2)
    val r = seqs.orderBy("row_id").collect()
    assert(r.length == 2)
    val first = r(0).getSeq[Seq[Double]](r(0).fieldIndex("seq"))
    assert(first == Seq(Seq(1.0, 10.0), Seq(2.0, 20.0)))
    // flatten to the (t*f) vector the linear-AE scorer consumes
    val flat = seqs.select(flatten(col("seq")).as("v")).orderBy(col("v"))
      .head.getSeq[Double](0)
    assert(flat.length == 4)
  }

  test("padAlignScores: first t-1 rows of each series get null score") {
    val base = Sequencer.withRowId(series, Seq("k"), Seq(col("o")))
    val scores = Sequencer
      .slidingSequences(series, Seq("k"), Seq(col("o")), col("v"), t = 3)
      .select(col("k"), col("row_id"), lit(1.0).as("seq_score"))
    val aligned = Sequencer.padAlignScores(base, scores, Seq("k", "row_id"))
    val nulls = aligned.where(col("seq_score").isNull).count()
    assert(nulls == 2 + 2, "a: rows 1-2 padded; b: both rows padded (n<t)")
  }

  test("sessionize: gap starts a new session; summary is layout-proof") {
    import graft.seq.Sessionizer
    // user 1: events at t=0,10,20, then a jump to 1000 (gap>100), 1010
    // user 2: single event
    val ev = Seq(
      (1L, 1L, 0L, 1.0), (1L, 2L, 10L, 2.0), (1L, 3L, 20L, 3.0),
      (1L, 4L, 1000L, 4.0), (1L, 5L, 1010L, 5.0),
      (2L, 6L, 5L, 9.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val out = Sessionizer.sessionStats(ev, Seq("user_id"), col("ts"),
        Seq(col("event_id")), gap = 100L, valueCol = col("value"))
      .orderBy("user_id", "session_seq").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 0L, 3L), (1L, 1L, 2L), (2L, 0L, 1L)))
    assert(out.head.getDouble(5) == 6.0) // 1+2+3 in session 0
    val shuffled = Sessionizer.sessionStats(ev.repartition(7), Seq("user_id"),
        col("ts"), Seq(col("event_id")), 100L, col("value"))
      .orderBy("user_id", "session_seq").collect()
    assert(out.map(_.toSeq).toSeq == shuffled.map(_.toSeq).toSeq)
  }
  test("asOf: latest right row at or before each left row, per key") {
    import graft.seq.AsOfJoin
    val right = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 15L, "c"))
      .toDF("k", "ts", "v")
    val left = Seq((1L, 5L), (1L, 10L), (1L, 25L), (2L, 14L), (3L, 9L))
      .toDF("k", "ts")
    val out = AsOfJoin.asOf(left, right, "k", "ts", Seq("v"))
      .orderBy("k", "ts").collect()
    // (k, ts) -> matched (asof_ts, v); ties (ts=10) see the right row
    assert(out.map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        Option(r.getString(3)).getOrElse("-"))).toSeq ==
      Seq((1L, 5L, -1L, "-"), (1L, 10L, 10L, "a"), (1L, 25L, 20L, "b"),
        (2L, 14L, -1L, "-"), (3L, 9L, -1L, "-")))
    // layout-proof: same result on a different partitioning
    val shuffled = AsOfJoin.asOf(left.repartition(7), right.repartition(3),
      "k", "ts", Seq("v")).orderBy("k", "ts").collect()
    assert(out.map(_.toSeq).toSeq == shuffled.map(_.toSeq).toSeq)
  }

  test("asOf: non-orderable (MapType) payload still analyzes and joins") {
    import graft.seq.AsOfJoin
    val right = Seq((1L, 10L, Map("x" -> 1)), (1L, 20L, Map("y" -> 2)))
      .toDF("k", "ts", "m")
    val left = Seq((1L, 15L), (1L, 25L)).toDF("k", "ts")
    // the struct tiebreak is skipped (Map is not orderable); the join
    // itself must not fail analysis
    val out = AsOfJoin.asOf(left, right, "k", "ts", Seq("m"))
      .orderBy("ts").collect()
    assert(out(0).getLong(2) == 10L &&
      out(0).getMap[String, Int](3) == Map("x" -> 1))
    assert(out(1).getLong(2) == 20L &&
      out(1).getMap[String, Int](3) == Map("y" -> 2))
  }

  test("asOf: tolerance discards stale matches; null payload still matches") {
    import graft.seq.AsOfJoin
    val right = Seq((1L, 10L, Some("a")), (1L, 50L, None)).toDF("k", "ts", "v")
    val left = Seq((1L, 12L), (1L, 40L), (1L, 51L)).toDF("k", "ts")
    val out = AsOfJoin.asOf(left, right, "k", "ts", Seq("v"),
        tolerance = Some(5L))
      .orderBy("ts").collect()
    // ts=12: match at 10 within 5. ts=40: match at 10 is 30 old -> null.
    // ts=51: right row at 50 has NULL v but still matches (struct carry).
    assert(!out(0).isNullAt(2) && out(0).getString(3) == "a")
    assert(out(1).isNullAt(2) && out(1).isNullAt(3))
    assert(!out(2).isNullAt(2) && out(2).getLong(2) == 50L && out(2).isNullAt(3))
  }

  test("rolling features match a hand-computed trailing window") {
    import spark.implicits._
    val df = Seq((1, 1, 10.0), (1, 2, 20.0), (1, 3, 30.0), (1, 4, 40.0), (1, 5, 50.0),
      (2, 6, 5.0)).toDF("k", "ord", "v")
    val out = graft.seq.Rolling.rolling(df, Seq("k"), col("ord"), col("v"), k = 3)
      .orderBy("ord").collect()
    // ord=4: window {20,30,40} -> avg 30, min 20, max 40, n 3, lag 30, delta 10
    val r4 = out(3)
    assert(r4.getLong(3) === 3L)
    assert(r4.getDouble(4) === 30.0)
    assert(r4.getDouble(5) === 10.0) // sample std of {20,30,40}
    assert(r4.getDouble(6) === 20.0 && r4.getDouble(7) === 40.0)
    assert(r4.getDouble(8) === 30.0 && r4.getDouble(9) === 10.0)
    // key 2 is independent: n=1, std/lag/delta null
    val r6 = out(5)
    assert(r6.getLong(3) === 1L)
    assert(r6.isNullAt(5) && r6.isNullAt(8) && r6.isNullAt(9))
  }

  test("rolling std is null for first row and zero-clamped on constant windows") {
    import spark.implicits._
    val df = (1 to 5).map(i => (1, i, 7.0)).toDF("k", "ord", "v")
    val out = graft.seq.Rolling.rolling(df, Seq("k"), col("ord"), col("v"), k = 4)
      .orderBy("ord").collect()
    assert(out(0).isNullAt(5))
    (1 until 5).foreach(i => assert(out(i).getDouble(5) === 0.0))
  }

  test("packing: distributed exclusive prefix sum matches a sequential fold") {
    import graft.seq.Packing
    val data = (0L until 1000L).map(i => (i, i * 7 % 23))
    val expected = data.map(_._2).scanLeft(0L)(_ + _).init
    // deliberately scrambled partitioning: the scan must be layout-free
    val df = data.toDF("id", "w").repartition(7, col("w"))
    val got = Packing.exclusivePrefixSum(df, "id", "w")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.length == 1000)
    got.zipWithIndex.foreach { case ((k, w, cum), i) =>
      assert(k == i && w == data(i.toInt)._2 && cum == expected(i.toInt))
    }
  }

  test("packing: concat-and-chunk pack assignment and per-pack stats") {
    import graft.seq.Packing
    // docs of 60 tokens, budget 100: starts at 0,60,120,... →
    // packs 0,0,1,1,2,3,3,4,4,5 for the first ten docs
    val df = (0L until 10L).map(i => (i, 60L)).toDF("id", "w")
    val packs = Packing.packSequences(df, "id", "w", budget = 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val expect = Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L,
      5L -> 3L, 6L -> 3L, 7L -> 4L, 8L -> 4L, 9L -> 5L)
    assert(packs == expect)
    val stats = Packing.packStats(df, "id", "w", budget = 100L)
      .orderBy("pack_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(stats.toSeq == Seq((0L, 2L, 120L), (1L, 2L, 120L), (2L, 1L, 60L),
      (3L, 2L, 120L), (4L, 2L, 120L), (5L, 1L, 60L)))
    // zero-weight docs pack into the chunk at their offset, not a new one
    val z = Seq((0L, 0L), (1L, 5L), (2L, 0L)).toDF("id", "w")
    val zp = Packing.packSequences(z, "id", "w", budget = 4L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(zp == Map(0L -> 0L, 1L -> 0L, 2L -> 1L))
  }

  test("packSequencesByGroup: the stream restarts per group") {
    import graft.seq.Packing
    val df = (Seq.tabulate(4)(i => ("a", i.toLong, 60L)) ++
      Seq(("b", 0L, 150L), ("b", 1L, 150L))).toDF("g", "id", "w")
    val packs = Packing.packSequencesByGroup(df, "g", "id", "w", budget = 100L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(4)).toMap
    assert(packs == Map(("a", 0L) -> 0L, ("a", 1L) -> 0L, ("a", 2L) -> 1L,
      ("a", 3L) -> 1L, ("b", 0L) -> 0L, ("b", 1L) -> 1L))
    val stats = Packing.packStatsByGroup(df, "g", "id", "w", budget = 100L)
      .orderBy("group", "pack_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(stats.toSeq == Seq(("a", 0L, 2L, 120L), ("a", 1L, 2L, 120L),
      ("b", 0L, 1L, 150L), ("b", 1L, 1L, 150L)))
  }

  test("resampleFfill: regular grid, last-per-bucket, forward fill, gaps") {
    import graft.seq.Resample
    import java.sql.Timestamp
    def ts(min: Int) = new Timestamp(min * 60000L)
    val df = Seq(
      ("a", ts(0), 1.0), ("a", ts(3), 2.0),   // bucket 0: last obs wins (2.0)
      ("a", ts(25), 9.0),                     // bucket 2; bucket 1 is a gap
      ("b", ts(10), 7.0)                      // single-point key
    ).toDF("k", "ts", "v")
    val out = Resample.resampleFfill(df, "k", "ts", "v", stepSeconds = 600L)
      .orderBy("key", "bucket").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      ("a", 0L, 2.0, true),   // last observation in the bucket
      ("a", 1L, 2.0, false),  // gap: carried forward
      ("a", 2L, 9.0, true),
      ("b", 1L, 7.0, true)))  // grid spans only the key's own range
    // LongType ts = nanoseconds (the harness parquet shape): exact
    // integer bucketing, including a ts exactly ON a bucket boundary
    val nanos = Seq(
      ("a", 0L, 1.0), ("a", 600L * 1000000000L, 5.0), // boundary-exact
      ("a", 1250L * 1000000000L, 6.0)
    ).toDF("k", "ts", "v")
    val nOut = Resample.resampleFfill(nanos, "k", "ts", "v", stepSeconds = 600L)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(1), r.getDouble(3), r.getBoolean(4)))
    assert(nOut.toSeq == Seq((0L, 1.0, true), (1L, 5.0, true), (2L, 6.0, true)))
    // pre-1970 nanos must FLOOR, not truncate toward zero: -1ns is
    // bucket -1 (same as the timestamp path), never bucket 0
    val neg = Seq(("a", -1L, 3.0), ("a", 0L, 4.0)).toDF("k", "ts", "v")
    val negOut = Resample.resampleFfill(neg, "k", "ts", "v", stepSeconds = 600L)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(1), r.getDouble(3), r.getBoolean(4)))
    assert(negOut.toSeq == Seq((-1L, 3.0, true), (0L, 4.0, true)))
  }

  test("packTexts materializes pack members concatenated in key order") {
    import graft.seq.Packing
    val df = Seq((2L, 60L, "bb"), (0L, 60L, "aa"), (1L, 60L, "mid"),
      (3L, 60L, "cc")).toDF("id", "w", "txt")
    // budget 100: packs {0,1}, {2,3} — text joins in id order regardless
    // of input row order
    val out = Packing.packTexts(df, "id", "w", "txt", budget = 100L)
      .orderBy("pack_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq((0L, 2L, 120L, "aa mid"), (1L, 2L, 120L, "bb cc")))
  }

  test("lengthBuckets: threshold bucketing and padding waste to bucket max") {
    import graft.seq.Packing
    val df = Seq(5L, 20L, 30L, 70L).toDF("tokens")
    val out = Packing.lengthBuckets(df, "tokens", Seq(16L, 64L))
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (0L, 1L, 5L, 5L, 0L),     // below 16
      (1L, 2L, 50L, 30L, 10L),  // [16,64): pad 20→30 wastes 10
      (2L, 1L, 70L, 70L, 0L)))  // 64+
    // padding waste is always non-negative and zero for singletons
    intercept[IllegalArgumentException] {
      Packing.lengthBuckets(df, "tokens", Seq(64L, 16L))
    }
  }

  test("intervalJoin: containment matches brute force, half-open bounds") {
    import graft.seq.IntervalJoin
    val pts = Seq(0L, 5L, 10L, 15L, 99L, 100L, 101L, 250L)
      .map(t => (t, s"p$t")).toDF("t", "pid")
    val ivs = Seq((1L, 0L, 100L), (2L, 10L, 11L), (3L, 90L, 260L),
      (4L, 50L, 50L), (5L, 60L, 40L)) // 4: empty, 5: inverted — match nothing
      .toDF("iid", "st", "en")
    for (w <- Seq(1L, 7L, 100L, 1000L)) { // bucket width must not change results
      val got = IntervalJoin.containment(pts, ivs, "t", "st", "en", w)
        .select("iid", "t").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (t, _) <- Seq(0L, 5L, 10L, 15L, 99L, 100L, 101L, 250L).map(t => (t, ()))
        (iid, st, en) <- Seq((1L, 0L, 100L), (2L, 10L, 11L), (3L, 90L, 260L))
        if t >= st && t < en
      } yield (iid, t)).toSet
      assert(got == want, s"width $w")
    }
    // each matching pair appears exactly once (no bucket-replication dupes)
    val rows = IntervalJoin.containment(pts, ivs, "t", "st", "en", 10L)
      .select("iid", "t").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == rows.toSet.size)
  }

  test("linearFit: exact line recovered, degenerate keys null out") {
    import graft.seq.Trend
    // key a: y = 3 + 2x exactly → slope 2, intercept 3, r2 = 1
    // key b: single point; key c: constant x — both degenerate
    // key d: constant y → slope 0, r2 null (0/0)
    val df = (Seq.tabulate(10)(i => ("a", i.toLong, 3.0 + 2.0 * i)) ++
      Seq(("b", 5L, 7.0), ("c", 2L, 1.0), ("c", 2L, 9.0),
        ("d", 1L, 4.0), ("d", 2L, 4.0), ("d", 3L, 4.0)))
      .toDF("k", "x", "y")
    val out = Trend.linearFit(df, Seq("k"), "x", "y").collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(math.abs(a.getAs[Double]("slope") - 2.0) < 1e-9)
    assert(math.abs(a.getAs[Double]("intercept") - 3.0) < 1e-9)
    assert(math.abs(a.getAs[Double]("r2") - 1.0) < 1e-9)
    assert(out("b").isNullAt(out("b").fieldIndex("slope")))
    assert(out("c").isNullAt(out("c").fieldIndex("slope")))
    val d = out("d")
    assert(math.abs(d.getAs[Double]("slope")) < 1e-9)
    assert(d.isNullAt(d.fieldIndex("r2")))
    // centering invariance: shifting x by a huge epoch offset changes nothing
    val shifted = df.withColumn("x", col("x") + lit(1700000000000000L))
    val s = Trend.linearFit(shifted, Seq("k"), "x", "y").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(math.abs(s("a").getAs[Double]("slope") - 2.0) < 1e-9)
  }

  test("ewmaByKey: sequential fold per key, seeded with first value") {
    import graft.seq.Rolling
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0),
      ("b", 5L, 4.0), // singleton: ewma = the value itself
      ("c", 2L, 8.0), ("c", 1L, 2.0) // out-of-order input: sorted by ts
    ).toDF("k", "ts", "v")
    val out = Rolling.ewmaByKey(df, Seq("k"), "ts", "v", alpha = 0.5)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // a: 10 → 10*.5+20*.5=15 → 15*.5+30*.5=22.5
    assert(out("a") == ((3L, 22.5)))
    assert(out("b") == ((1L, 4.0)))
    // c sorts (1,2.0),(2,8.0): 2 → 2*.5+8*.5=5
    assert(out("c") == ((2L, 5.0)))
  }

  test("holtWintersByKey: hand-computed fold with seasonal rotation") {
    import spark.implicits._
    import graft.seq.Rolling
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0))
      .toDF("k", "ts", "v")
    val out = Rolling.holtWintersByKey(df, Seq("k"), "ts", "v",
      alpha = 0.5, beta = 0.5, gamma = 0.5, period = 2).collect()(0)
    // init l=10 b=0 s=[0,0]
    // x=20: l=.5*20+.5*10=15, b=.5*5+.5*0=2.5, seas=.5*5=2.5 → s=[0,2.5]
    // x=30: l=.5*30+.5*17.5=23.75, b=.5*8.75+.5*2.5=5.625,
    //       seas=.5*6.25=3.125 → s=[2.5,3.125]
    assert(out.getAs[Long]("n") == 3L)
    assert(out.getAs[Double]("level") == 23.75)
    assert(out.getAs[Double]("trend") == 5.625)
    assert(out.getAs[Double]("next_season") == 2.5)
    assert(out.getAs[Double]("forecast") == 31.875)
    // gamma = 0 degenerates to plain Holt (zero seasonals forever)
    val holt = Rolling.holtByKey(df, Seq("k"), "ts", "v", 0.5, 0.5)
      .collect()(0)
    val hw0 = Rolling.holtWintersByKey(df, Seq("k"), "ts", "v",
      0.5, 0.5, gamma = 0.0, period = 2).collect()(0)
    assert(hw0.getAs[Double]("level") == holt.getAs[Double]("level"))
    assert(hw0.getAs[Double]("trend") == holt.getAs[Double]("trend"))
    assert(hw0.getAs[Double]("next_season") == 0.0)
  }

  test("holtBacktestByKey: one-step errors scored BEFORE state update") {
    import spark.implicits._
    import graft.seq.Rolling
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0))
      .toDF("k", "ts", "v")
    val out = Rolling.holtBacktestByKey(df, Seq("k"), "ts", "v", 0.5, 0.5)
      .collect()(0)
    // x=20: forecast 10 → err 10, naive 10; state l=15 b=2.5
    // x=30: forecast 17.5 → err 12.5, naive 10
    assert(out.getAs[Long]("n") == 3L)
    assert(out.getAs[Double]("mae") == 11.25)
    assert(out.getAs[Double]("mae_naive") == 10.0)
    assert(out.getAs[Double]("skill") == 1.0 - 22.5 / 20.0)
    // singleton series: metrics null, never divide by zero
    val one = Rolling.holtBacktestByKey(
      Seq(("b", 1L, 5.0)).toDF("k", "ts", "v"), Seq("k"), "ts", "v", 0.5, 0.5)
      .collect()(0)
    assert(one.getAs[Long]("n") == 1L && one.isNullAt(2) && one.isNullAt(4))
  }
}
