package graft

import graft.dedup.Components
import graft.text.TfIdf
import org.apache.spark.sql.functions._

class TfIdfComponentsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "apple banana cherry date")
  ).toDF("doc_id", "text")

  test("termFreq and docFreq count multiplicities and documents") {
    val tf = TfIdf.termFreq(docs, "doc_id", "text")
    assert(tf.where(col("id") === 1 && col("term") === "apple")
      .head.getAs[Long]("tf") == 2L)
    val df = TfIdf.docFreq(tf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(df("banana") == 3L && df("apple") == 2L && df("date") == 1L)
  }

  test("rare terms outrank common ones; top-k deterministic") {
    val top = TfIdf.topTerms(docs, "doc_id", "text", k = 1, rational = true)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // 'date' is unique to doc 3 → highest idf there
    assert(top(3L) == "date")
    // doc 1: apple tf=2, idf=(4/3) beats banana tf=1 idf=1
    assert(top(1L) == "apple")
  }

  test("log and rational IDF agree on per-document term ordering") {
    val a = TfIdf.topTerms(docs, "doc_id", "text", 2, rational = true)
      .select("id", "rank", "term").collect().map(_.toString).sorted.toSeq
    val b = TfIdf.topTerms(docs, "doc_id", "text", 2, rational = false)
      .select("id", "rank", "term").collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("connected components: chain and clique collapse to min id") {
    // components: {1,2,3,4} via chain, {10,11} via single edge
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
    val cc = Components.connectedComponents(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("long chains converge within the iteration budget (pointer jumping)") {
    // a 60-vertex path: naive one-hop propagation needs 60 rounds,
    // pointer jumping fits comfortably inside maxIter=20
    val pairs = (0L until 59L).map(i => (i, i + 1)).toDF("a", "b")
    val cc = Components.connectedComponents(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(cc.length == 60)
    assert(cc.forall(_._2 == 0L), s"unconverged: ${cc.filter(_._2 != 0L).take(5).toSeq}")
  }

  test("clusters summarizes component sizes") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val cl = Components.clusters(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl == Map(1L -> 3L, 10L -> 2L))
  }
}
