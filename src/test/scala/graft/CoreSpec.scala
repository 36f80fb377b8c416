package graft

class CardinalitySpec extends SparkSpec {
  test("cardinality: exact counts right, HLL within 5%") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val rows = graft.core.Profiler
      .cardinality(li, Seq("l_returnflag", "l_orderkey"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows("l_returnflag")._1 == 3L)
    val (exact, approx) = rows("l_orderkey")
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"HLL $approx vs exact $exact")
  }
}

import graft.core.{Profiler, Quantiles, SchemaAlign, Stats}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class CoreSpec extends SparkSpec {
  import spark.implicits._

  test("Profiler counts null vs NaN separately from valid, in one pass") {
    val df = Seq(
      (1L, Some(1.0)), (2L, Some(Double.NaN)), (3L, None), (4L, Some(0.0))
    ).toDF("id", "x")
    val p = Profiler.profile(df, Seq("x")).collect().head
    assert(p.getString(0) == "x")
    assert(p.getLong(1) == 2) // n_valid: 1.0 and 0.0
    assert(p.getLong(2) == 2) // n_invalid: NaN + null
    assert(p.getLong(3) == 1) // n_zero
    assert(p.getDouble(4) == 0.0 && p.getDouble(5) == 1.0)
    assert(p.getDouble(6) == 0.5)
  }

  test("Profiler.denseFeatureCols drops >95% sparse columns") {
    val rows = (1 to 100).map(i => (i.toDouble, if (i <= 4) 1.0 else 0.0))
    val df = rows.toDF("dense", "sparse")
    assert(Profiler.denseFeatureCols(df, Seq("dense", "sparse")) == Seq("dense"))
  }

  test("Stats exact decimal mean/stddev match closed form") {
    val df = Seq(2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0).toDF("x")
    val r = df.agg(Stats.dmean($"x"), Stats.dstddevSamp($"x"), Stats.dvarPop($"x")).head()
    assert(r.getDouble(0) == 5.0)
    assert(math.abs(r.getDouble(1) - 2.13808993529939517) < 1e-12)
    assert(math.abs(r.getDouble(2) - 4.0) < 1e-12)
  }

  test("Quantiles.exact matches interpolated percentile; IQR fence") {
    val df = (1 to 4).map(_.toDouble).toDF("x")
    assert(Quantiles.exactQuantiles(df, "x", Seq(0.5)) == Seq(2.5))
    // q1=1.75 q3=3.25 iqr=1.5 fence=5.5
    assert(math.abs(Quantiles.iqrUpperFence(df, "x") - 5.5) < 1e-12)
  }

  test("Quantiles.clipToQuantiles winsorizes to [p1,p99]") {
    val df = ((1 to 100).map(_.toDouble) :+ 10000.0).toDF("x")
    val clipped = Quantiles.clipToQuantiles(df, Seq("x"), 0.01, 0.99)
    val mx = clipped.agg(max($"x")).head().getDouble(0)
    assert(mx < 10000.0)
  }

  test("SchemaAlign adds typed nulls, drops extras, reorders") {
    val target = StructType(Seq(
      StructField("a", IntegerType), StructField("b", DoubleType)))
    val df = Seq((1, "junk")).toDF("a", "c")
    val out = SchemaAlign.alignTo(df, target)
    assert(out.columns.toSeq == Seq("a", "b"))
    assert(out.schema("b").dataType == DoubleType)
    assert(out.head().isNullAt(1))
  }

  test("SchemaAlign.boolsToInt casts booleans") {
    val df = Seq((true, 1), (false, 2)).toDF("flag", "x")
    val out = SchemaAlign.boolsToInt(df)
    assert(out.schema("flag").dataType == IntegerType)
    assert(out.orderBy("x").collect().map(_.getInt(0)).toSeq == Seq(1, 0))
  }

  test("corrMatrix matches known correlations and handles constants") {
    import spark.implicits._
    val df = (1 to 100).map { i =>
      val x = i.toDouble
      (x, 2.0 * x + 1.0, -3.0 * x, 5.0)
    }.toDF("a", "b", "c", "k")
    val m = graft.core.Stats.corrMatrix(df, Seq("a", "b", "c", "k"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) null else java.lang.Double.valueOf(r.getDouble(2)))).toMap
    assert(math.abs(m(("a", "b")).doubleValue - 1.0) < 1e-12)
    assert(math.abs(m(("a", "c")).doubleValue + 1.0) < 1e-12)
    assert(m(("a", "k")) == null) // constant column -> undefined corr
    assert(m.size === 6)
  }

  test("corrMatrix is pairwise-complete under nulls") {
    import spark.implicits._
    val df = Seq[(java.lang.Double, java.lang.Double, java.lang.Double)](
      (1.0, 1.0, 9.0), (2.0, 2.0, null), (3.0, 3.0, 1.0), (4.0, null, 4.0))
      .toDF("x", "y", "z")
    val m = graft.core.Stats.corrMatrix(df, Seq("x", "y", "z"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // x~y over rows 1-3 only: perfectly linear
    assert(math.abs(m(("x", "y")) - 1.0) < 1e-12)
  }

  test("SchemaAlign.padFeatures zero-pads narrow arrays, keeps exact, nulls pass") {
    val df = Seq((1, Seq(1.0, 2.0)), (2, Seq(1.0, 2.0, 3.0))).toDF("id", "features")
    val out = SchemaAlign.padFeatures(df, "features", 3).orderBy("id")
      .collect().map(_.getSeq[Double](1))
    assert(out(0) == Seq(1.0, 2.0, 0.0))
    assert(out(1) == Seq(1.0, 2.0, 3.0))
    val withNull = Seq((1, Option.empty[Seq[Double]])).toDF("id", "features")
    assert(SchemaAlign.padFeatures(withNull, "features", 3).head().isNullAt(1))
  }

  test("SchemaAlign.padFeatures fails loudly on wider-than-dim arrays") {
    val wide = Seq((1, Seq(1.0, 2.0, 3.0, 4.0))).toDF("id", "features")
    val e = intercept[Throwable] {
      SchemaAlign.padFeatures(wide, "features", 3).collect()
    }
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("feature dim mismatch"),
      s"expected a loud dim-mismatch error, got: $chain")
  }

  test("snapshot diff classifies added/removed/changed/unchanged by content hash") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "text")
    val b = Seq((2L, "y"), (3L, "zz"), (4L, "w")).toDF("id", "text")
    val hash = (df: org.apache.spark.sql.DataFrame) =>
      graft.text.TextOps.strHash(df("text"))
    val st = graft.core.Versioning.diffStatus(a, b, "id", hash)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(st == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "added"))
    val sum = graft.core.Versioning.diffSummary(a, b, "id", hash)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sum == Map("removed" -> 1L, "unchanged" -> 1L, "changed" -> 1L,
      "added" -> 1L))
    // identical snapshots: everything unchanged
    val same = graft.core.Versioning.diffSummary(a, a, "id", hash)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(same == Map("unchanged" -> 3L))
    // null content hashes: presence flags, not hash nullness, drive the
    // classification — null<=>null is unchanged, null vs value is changed
    val an = Seq((1L, null.asInstanceOf[String]), (2L, "y"))
      .toDF("id", "text")
    val bn = Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val stn = graft.core.Versioning.diffStatus(an, bn, "id", hash)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(stn == Map(1L -> "unchanged", 2L -> "changed"))
  }

  test("applyChanges: upsert/delete/latest-wins CDC merge semantics") {
    import spark.implicits._
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val changes = Seq(
      (2L, "b2", "U", 1L),  // update existing
      (3L, "c2", "U", 1L),  // update…
      (3L, "x", "D", 2L),   // …overridden by a later delete (latest wins)
      (4L, "d", "I", 1L),   // insert new
      (5L, "e", "U", 1L),   // U on absent id inserts (upsert)
      (9L, "x", "D", 1L),   // D on absent id is a no-op
      (4L, "d0", "I", 0L)   // earlier change for id 4 loses to seq 1
    ).toDF("id", "v", "op", "seq")
    val out = graft.core.Versioning.applyChanges(snap, changes, "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a", 2L -> "b2", 4L -> "d", 5L -> "e"))
    // idempotent: re-applying the same batch yields the same state
    val again = graft.core.Versioning.applyChanges(
        Seq((1L, "a"), (2L, "b2"), (4L, "d"), (5L, "e")).toDF("id", "v"),
        changes, "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == out)
  }

  test("mutualInfo: independence → 0, determinism → min entropy, known value") {
    import graft.core.InfoTheory
    import spark.implicits._
    // tolerance: every p·log2(…) term is quantized to DECIMAL(38,10)
    // before summing (the order-free exact-sum trade), so sums carry up
    // to ~5e-11 per term of representation error — assert at 1e-9
    val eps = 1e-9
    // independent: every (a, b) combination equally likely → MI = 0
    val indep = (for { a <- Seq("x", "y"); b <- Seq("p", "q", "r") }
      yield (a, b)).toDF("a", "b")
    val r1 = InfoTheory.mutualInfo(indep, "a", "b").head
    assert(math.abs(r1.getAs[Double]("mi")) < eps)
    assert(math.abs(r1.getAs[Double]("h_a") - 1.0) < eps)          // log2(2)
    assert(math.abs(r1.getAs[Double]("h_b") - math.log(3) / math.log(2)) < eps)
    assert(math.abs(r1.getAs[Double]("nmi")) < eps)
    // deterministic b = f(a): MI = H(b), NMI = 1
    val det = Seq(("x", "p"), ("x", "p"), ("y", "q"), ("z", "r")).toDF("a", "b")
    val r2 = InfoTheory.mutualInfo(det, "a", "b").head
    assert(math.abs(r2.getAs[Double]("mi") - r2.getAs[Double]("h_b")) < eps)
    assert(math.abs(r2.getAs[Double]("nmi") - 1.0) < eps)
    // null categories are excluded before counting
    val withNull = Seq(("x", "p"), ("x", null), (null, "q")).toDF("a", "b")
    val r3 = InfoTheory.mutualInfo(withNull, "a", "b").head
    assert(r3.getAs[Double]("h_a") == 0.0 && r3.getAs[Double]("mi") == 0.0)
  }

  test("zorder: known morton keys, locality, and the 32-bit envelope") {
    import graft.core.ZOrder
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq((3L, 5L), (0L, 0L), (1L, 0L), (0L, 1L), (0xffffffffL, 0L))
      .toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zkey(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // interleave x into even bits, y into odd: (3,5) → 0b100111 = 39
    assert(df((3L, 5L)) == 39L)
    assert(df((0L, 0L)) == 0L && df((1L, 0L)) == 1L && df((0L, 1L)) == 2L)
    // full 32-bit x spreads to all even bits — positive, no sign wrap
    assert(df((0xffffffffL, 0L)) == 0x5555555555555555L)
    // locality: every 2^16-key z-cell is a 256×256 box in (x, y)
    val grid = (for { x <- 0L until 600L by 7L; y <- 0L until 600L by 11L }
      yield (x, y)).toDF("x", "y")
    val cells = grid.select(
        ZOrder.zcell(col("x"), col("y"), 16).as("cell"), col("x"), col("y"))
      .groupBy("cell")
      .agg((max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"))
      .collect()
    assert(cells.nonEmpty)
    cells.foreach { r =>
      assert(r.getLong(1) < 256L && r.getLong(2) < 256L,
        s"z-cell ${r.getLong(0)} spans dx=${r.getLong(1)} dy=${r.getLong(2)}")
    }
  }
}
