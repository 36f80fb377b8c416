package graft

import graft.sim.Pq
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("PQ: codes in range and dual-path assignment agrees bitwise") {
    val m = Pq.fit(emb, "vec_id", "embedding", m = 8, k = 16)
    val enc = Pq.encode(emb, "vec_id", "embedding", m)
    val bad = (0 until 8).map(mi =>
      col(s"code_$mi") < 0 || col(s"code_$mi") >= 16).reduce(_ || _)
    assert(enc.where(bad).count() == 0L)
    // dual path vs the KMeans scorer on each sub-slice
    val withCheck = (0 until 8).foldLeft(enc) { (acc, mi) =>
      val km = new graft.sim.KMeans.Model(m.codebooks(mi))
      km.transform(acc.withColumn(s"sub_$mi",
        slice(transform(col("vec"), x => x.cast("double")), mi * 8 + 1, 8)),
        s"sub_$mi", s"chk_$mi")
    }
    val mismatch = (0 until 8).map(mi =>
      col(s"code_$mi") =!= col(s"chk_$mi")).reduce(_ || _)
    assert(withCheck.where(mismatch).count() == 0L)
  }

  test("PQ: identical vectors get identical codes") {
    val m = Pq.fit(emb, "vec_id", "embedding", m = 8, k = 16)
    val dup = emb.where(col("vec_id") === 3)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"),
        col("label"))
    val enc = Pq.encode(emb.unionByName(dup), "vec_id", "embedding", m)
      .where(col("id").isin(3L, 100003L))
      .select(array((0 until 8).map(mi => col(s"code_$mi")): _*).as("codes"))
      .collect().map(_.getSeq[Int](0))
    assert(enc.length == 2 && enc(0) == enc(1))
  }

  test("PQ: k=16 codebooks beat the k=1 (per-sub-space mean) baseline") {
    val m16 = Pq.fit(emb, "vec_id", "embedding", m = 8, k = 16)
    val m1 = Pq.fit(emb, "vec_id", "embedding", m = 8, k = 1)
    def totalErr(model: Pq.Model): Double =
      Pq.encode(emb, "vec_id", "embedding", model)
        .select((0 until 8).map(mi => col(s"qerr_$mi")).reduce(_ + _).as("e"))
        .agg(sum("e")).collect()(0).getDouble(0)
    assert(totalErr(m16) < totalErr(m1))
  }

  test("IVF-PQ top-k: well-formed output and recall floor at the " +
      "registered operating point") {
    val model = Pq.fit(emb, "vec_id", "embedding", m = 8, k = 256)
    val approx = Pq.ivfPqTopK(emb, "vec_id", "embedding", k = 3, model,
      nCells = 16, nprobe = 8, rerankFactor = 32,
      queryPred = col("id") < 100)
    val rows = approx.collect()
    // ≤ k rows per query, ranks contiguous from 1, cosine valid
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Int]("rank")).sorted
      assert(ranks.length <= 3 && ranks.toSeq == (1 to ranks.length))
    }
    assert(rows.forall(r => math.abs(r.getAs[Double]("cos")) <= 1.0 + 1e-9))
    val brute = graft.sim.Ann.cosineTopK(emb, "vec_id", "embedding", k = 3,
      queryPred = col("id") < 100)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect got).size.toDouble / brute.size
    // r10 RecallCheck at the re-registered knee (nprobe 8, rerank 32):
    // 0.837 / 0.883 / 0.820 at sf0.001/0.01/0.1 — floor 0.7
    assert(recall >= 0.7, s"IVF-PQ recall@3 regressed: $recall")
  }

  test("PQ audit: anchors and invariants on the test frame") {
    val r = Pq.audit(emb, "vec_id", "embedding", m = 8, k = 16).collect()(0)
    assert(r.getAs[Long]("n_vecs") == 500L)
    assert(r.getAs[Long]("dim") == 64L)
    assert(r.getAs[Long]("bytes_raw") == 512L)
    assert(r.getAs[Long]("bytes_pq") == 8L)
    Seq("codes_valid", "assign_ok", "qerr_nonneg", "qerr_minimal")
      .foreach(f => assert(r.getAs[Boolean](f), f))
  }
}
