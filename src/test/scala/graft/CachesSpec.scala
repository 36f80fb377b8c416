package graft

import java.util.concurrent.CountDownLatch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.Caches

/** Lifecycle contracts of [[graft.core.Caches.checkpointOnce]]: the
  * racing-builder dedup path and the per-key LRU trim's block release.
  * (releaseAll itself is exercised implicitly by Bench/Verify and is a
  * session boundary — not safe to call mid-suite under a shared session.)
  */
class CachesSpec extends SparkSpec {
  import spark.implicits._

  private def ckRdd(df: DataFrame) =
    df.queryExecution.analyzed.collect { case l: LogicalRDD => l.rdd }.head
      match {
        // storage lives on the wrapped checkpoint RDD, not the guard
        case g: graft.core.GuardedCheckpointRdd => g.dependencies.head.rdd
        case r => r
      }

  test("checkpointOnce: racing builders converge on one memoized frame") {
    val df = (1 to 100).toDF("v").withColumn("race", lit("cachesspec"))
    val start = new CountDownLatch(2)
    val out = new Array[DataFrame](2)
    val threads = (0 to 1).map { i =>
      new Thread(() => {
        start.countDown(); start.await()
        out(i) = Caches.checkpointOnce("cachesspec-race", df)
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    // Whether or not the race fired this run, both callers must hold the
    // SAME frame (memo identity), it must be actionable, and a third call
    // must hit the memo.
    assert(out(0) eq out(1))
    assert(out(0).count() == 100)
    assert(Caches.checkpointOnce("cachesspec-race", df) eq out(0))
    assert(ckRdd(out(0)).getStorageLevel != StorageLevel.NONE)
  }

  test("checkpointOnce: LRU trim unpersists the dropped frame's blocks") {
    val key = "cachesspec-trim"
    val frames = (0 to 64).map { i => // maxCkPerKey = 64, so #0 is trimmed
      Caches.checkpointOnce(key, (1 to 10).toDF("v").withColumn("i", lit(i)))
    }
    assert(ckRdd(frames.head).getStorageLevel == StorageLevel.NONE,
      "oldest entry past the per-key bound must have its blocks released")
    assert(ckRdd(frames.last).getStorageLevel != StorageLevel.NONE,
      "surviving entries stay persisted")
    // the survivor still hits the memo and still computes
    val again = Caches.checkpointOnce(
      key, (1 to 10).toDF("v").withColumn("i", lit(64)))
    assert(again eq frames.last)
    assert(again.count() == 10)
  }

  test("checkpointOnce: re-actioning a trimmed frame fails LOUD by name") {
    val key = "cachesspec-loud"
    System.setProperty("graft.caches.maxCkPerKey", "2")
    try {
      val first = Caches.checkpointOnce(
        key, (1 to 10).toDF("v").withColumn("i", lit(1000)))
      assert(first.count() == 10) // live guard passes through untouched
      (1001 to 1002).foreach { i => // push #1000 past the per-key bound
        Caches.checkpointOnce(
          key, (1 to 10).toDF("v").withColumn("i", lit(i))).count()
      }
      val ex = intercept[Exception] { first.count() }
      def msgs(t: Throwable): List[String] =
        if (t == null) Nil
        else Option(t.getMessage).toList ::: msgs(t.getCause)
      assert(msgs(ex).exists(_.contains(s"checkpointOnce('$key')")),
        s"expected the named GuardedCheckpointRdd error, got: $ex")
    } finally System.clearProperty("graft.caches.maxCkPerKey")
  }
}
