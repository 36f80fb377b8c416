package graft

import graft.core.{PrefixScan, Profiler, Quantiles, Stats}
import graft.eval.Metrics
import graft.features.{FrequencyIndexer, Imputers}
import graft.score.ZScoreAnomaly
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Driver contract — each entry in `queries` is one operator from
  * SURVEY.md §2 exercised on the harness tables (TESTDATA.md); each entry
  * in `oracleSql` is the DuckDB-equivalent SQL the driver hash-compares
  * against at sf0.01.
  *
  * Determinism rules applied throughout (both sides):
  *  - additive aggregates accumulate in DECIMAL(38,10) (exact,
  *    associative — partition-order-independent), cast to DOUBLE last;
  *  - every output is ORDER BY'd on a unique key;
  *  - free-floating doubles are round()ed to a fixed scale.
  */
object SparkEntry {

  private val lineitemNumerics =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
  private val anomalyFeatures = lineitemNumerics

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Z-score anomaly detection over lineitem numeric features — the
    * reference's score→quantile-threshold→flag flow (SURVEY.md §3.2)
    * with a model-free scorer.
    */
  def entry(spark: SparkSession): DataFrame =
    qZscoreAnomaly(spark, "/root/testdata/sf0.001")

  // ----------------------------------------------------------------- //

  private def li(s: SparkSession, dir: String) = Tables.load(s, dir, "lineitem")
  private def em(s: SparkSession, dir: String) = Tables.load(s, dir, "embeddings")

  /** A1/A8 — grouped aggregation (sums, exact mean, count). */
  private def qPricingSummary(s: SparkSession, dir: String): DataFrame =
    li(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(Stats.dsum(col("l_quantity")), 4).as("sum_qty"),
        round(Stats.dsum(col("l_extendedprice")), 4).as("sum_base_price"),
        round(Stats.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("sum_disc_price"),
        round(Stats.dsum(col("l_quantity")) / count(lit(1)), 6).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Shared pruned lineitem slice for the stats/quantile family
    * (q02/q03/q14/q16): all four scan the same few numeric columns, so
    * ONE pruned projection is cached under ONE retention key and
    * reused across the family (the q39 pattern; round-6 advice item 8,
    * A/B'd and kept — numbers in PLANS.md). Values are unchanged:
    * caching swaps the scan for an InMemoryTableScan and every
    * consumer's math is order-independent (decimal partials, exact
    * order statistics).
    */
  private def liStats(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_orderkey", "l_linestatus") ++ lineitemNumerics
    val df = li(s, dir).select(cols.map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.shared_li_stats", df)
    df
  }

  /** A1/A9/A10 — single-pass numeric column profiler (replaces the
    * reference's job-per-column loop, SURVEY.md §4).
    */
  private def qProfile(s: SparkSession, dir: String): DataFrame =
    Profiler.profile(par(liStats(s, dir)), lineitemNumerics)

  /** A6/A7 — exact quantiles + IQR upper fence as a long table. */
  private def qQuantiles(s: SparkSession, dir: String): DataFrame = {
    val ps = Seq(0.25, 0.5, 0.75, 0.9, 0.95, 0.99)
    val df = liStats(s, dir)
    val qs = Quantiles.exactQuantiles(df, "l_extendedprice", ps)
    val fence = qs(2) + 1.5 * (qs(2) - qs(0))
    val rows = ps.zip(qs).map { case (p, v) => (f"p$p%.2f", v) } :+ (("iqr_fence", fence))
    import s.implicits._
    rows.toDF("quantile", "value")
      .select(col("quantile"), round(col("value"), 6).as("value"))
      .orderBy("quantile")
  }

  /** P1/P5/L3 — filter + projection + top-k (TakeOrderedAndProject). */
  private def qFilterTopk(s: SparkSession, dir: String): DataFrame =
    li(s, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
        col("l_discount") > lit(0.04))
      // round at 4, not 2: the product of a 2-dp price and a 2-dp
      // (1-discount) has EXACTLY ≤4 decimal digits, so round(.,4) is
      // an identity and cannot tie — round(.,2) hits true .xx5 ties
      // at sf0.1 where Spark's shortest-repr HALF_UP and DuckDB's
      // binary-double rounding disagree (the q90 divergence class)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"), asc("l_linenumber"))
      .limit(100)

  /** P3/J1 — schema-aligned union of customer and supplier. */
  private def qUnionAlign(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer").select(
      col("c_name").as("name"), col("c_acctbal").as("acctbal"),
      col("c_nationkey").as("nationkey"), col("c_mktsegment").as("mktsegment"),
      lit("customer").as("kind"))
    val sup = Tables.load(s, dir, "supplier").select(
      col("s_name").as("name"), col("s_acctbal").as("acctbal"),
      col("s_nationkey").as("nationkey"), lit("supplier").as("kind"))
    graft.core.SchemaAlign.unionAligned(c, sup).orderBy("kind", "name")
  }

  /** A2/P6 — mean imputation over an induced-null column, verified via a
    * grouped checksum of the imputed values.
    */
  private def qImputeMean(s: SparkSession, dir: String): DataFrame = {
    val base = li(s, dir).withColumn("qty_n",
      when(col("l_orderkey") % 7 === 0, lit(null).cast(DoubleType))
        .otherwise(col("l_quantity").cast(DoubleType)))
    val fill = Imputers.fit(base, Seq("qty_n"), Imputers.Mean)
    base.groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        count(when(col("qty_n").isNull, 1)).as("n_filled"),
        round(Stats.dsum(coalesce(col("qty_n"), lit(fill("qty_n")))), 4)
          .as("sum_imputed"))
      .orderBy("l_returnflag")
  }

  /** F3 + A6 + P9 — the flagship: z-score anomaly detection. */
  private def qZscoreAnomaly(s: SparkSession, dir: String): DataFrame = {
    // pruned input cached across the fit pass, the scoring pass, and
    // steady-state reruns (retention-bounded)
    val base = par(li(s, dir))
      .select((Seq("l_orderkey", "l_linenumber") ++ anomalyFeatures).map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q07", base)
    ZScoreAnomaly.detect(base, anomalyFeatures, p = 0.95,
        keep = Seq("l_orderkey", "l_linenumber"))
      .filter(col("is_anomaly"))
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("anomaly_score"), 6).as("anomaly_score"))
      .orderBy(desc("anomaly_score"), asc("l_orderkey"), asc("l_linenumber"))
  }

  /** A5 — frequency-descending string indexing (StringIndexer parity). */
  private def qStringIndex(s: SparkSession, dir: String): DataFrame =
    FrequencyIndexer.fit(Tables.load(s, dir, "orders"), "o_orderpriority")
      .labels.select(col("label"), col("label_index"))
      .orderBy("label_index")

  /** A11/A12 — confusion counts + derived rates in one aggregate. */
  private def qConfusion(s: SparkSession, dir: String): DataFrame = {
    val d = li(s, dir)
      .withColumn("label", when(col("l_returnflag") === "R", 1).otherwise(0))
      .withColumn("predicted", col("l_extendedprice") > 30000.0)
    Metrics.rates(d, "label", "predicted")
  }

  /** A13 — exact ROC AUC via the tie-corrected rank-sum identity over a
    * distributed prefix scan (integer-exact numerator; no
    * single-partition window — the windowed trapezoid `Metrics.aucDF`
    * remains as the small-data baseline).
    */
  private def qRocAuc(s: SparkSession, dir: String): DataFrame = {
    val d = li(s, dir)
      .withColumn("label", when(col("l_returnflag") === "R", 1).otherwise(0))
    Metrics.aucRankSum(d, "label", "l_extendedprice")
  }

  // --- W1-W3 sequence operators on events ---------------------------- //

  private def ev(s: SparkSession, dir: String) = Tables.load(s, dir, "events")
  private val seqT = 5
  private val seqOrder = Seq(col("ts"), col("event_id"))

  /** W1 — sliding sequences per user (size-5, stride-1); sequence sum
    * computed FROM the built array (exercises ArrayType path).
    */
  private def qSlidingSeq(s: SparkSession, dir: String): DataFrame =
    graft.seq.Sequencer
      .slidingSequences(ev(s, dir), Seq("user_id"), seqOrder, col("value"), seqT)
      .select(col("user_id"), col("row_id"),
        round(aggregate(col("seq"), lit(0.0), (acc, x) => acc + x), 4).as("seq_sum"))
      .orderBy("user_id", "row_id")

  /** W2 — expand flagged sequences (seq_sum > 450) to distinct member rows. */
  private def qSeqExpand(s: SparkSession, dir: String): DataFrame = {
    val seqs = graft.seq.Sequencer
      .slidingSequences(ev(s, dir), Seq("user_id"), seqOrder, col("value"), seqT)
      .withColumn("seq_sum", aggregate(col("seq"), lit(0.0), (acc, x) => acc + x))
      .where(col("seq_sum") > 450.0)
    graft.seq.Sequencer.expandMembers(seqs, Seq("user_id"), seqT)
      .orderBy("user_id", "member_row_id")
  }

  /** W3 — pad-align per-sequence scores onto source rows (first t−1 rows
    * of each series get null), aggregated per user for a compact check.
    */
  private def qPadAlign(s: SparkSession, dir: String): DataFrame = {
    val base = graft.seq.Sequencer.withRowId(ev(s, dir), Seq("user_id"), seqOrder)
    val scores = graft.seq.Sequencer
      .slidingSequences(ev(s, dir), Seq("user_id"), seqOrder, col("value"), seqT)
      .select(col("user_id"), col("row_id"),
        (aggregate(col("seq"), lit(0.0), (acc, x) => acc + x) / seqT).as("seq_score"))
    graft.seq.Sequencer.padAlignScores(base, scores, Seq("user_id", "row_id"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_rows"),
        count(when(col("seq_score").isNull, 1)).as("n_padded"),
        round(Stats.dsum(col("seq_score")), 4).as("score_sum"))
      .orderBy("user_id")
  }

  // --- feature/eval coverage ---------------------------------------- //

  /** A3 — median imputation (exact percentile path). */
  private def qImputeMedian(s: SparkSession, dir: String): DataFrame = {
    val base = liStats(s, dir).withColumn("price_n",
      when(col("l_orderkey") % 5 === 0, lit(null).cast(DoubleType))
        .otherwise(col("l_extendedprice").cast(DoubleType)))
    val fill = Imputers.fit(base, Seq("price_n"), Imputers.MedianExact)
    base.groupBy(col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        count(when(col("price_n").isNull, 1)).as("n_filled"),
        round(Stats.dsum(coalesce(col("price_n"), lit(fill("price_n")))), 4)
          .as("sum_imputed"))
      .orderBy("l_linestatus")
  }

  /** A4/F3 — z-score standardization, verified via grouped checksums. */
  private def qStandardize(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice")
    // pruned input cached across the fit agg and the transform agg
    val df = li(s, dir).select((cols :+ "l_returnflag").map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q15", df)
    val model = graft.features.Standardizer.fit(df, cols)
    model.transform(df, suffix = "_z")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        round(Stats.dsum(col("l_quantity_z")), 4).as("sum_z_qty"),
        round(Stats.dsum(col("l_extendedprice_z")), 4).as("sum_z_price"),
        round(max(abs(col("l_quantity_z"))), 6).as("max_abs_z_qty"))
      .orderBy("l_returnflag")
  }

  /** P11/F5 — winsorize to [p01, p99], verified via aggregates. */
  private def qClip(s: SparkSession, dir: String): DataFrame = {
    val clipped = Quantiles.clipToQuantiles(liStats(s, dir), Seq("l_extendedprice"))
    clipped.agg(
      round(min(col("l_extendedprice")), 4).as("min_clipped"),
      round(max(col("l_extendedprice")), 4).as("max_clipped"),
      round(Stats.dsum(col("l_extendedprice")), 4).as("sum_clipped"))
  }

  /** A10 — zero/missing fraction per column in one pass. */
  private def qSparseFractions(s: SparkSession, dir: String): DataFrame = {
    val base = li(s, dir)
      .withColumn("qty_n",
        when(col("l_orderkey") % 7 === 0, lit(null).cast(DoubleType))
          .otherwise(col("l_quantity").cast(DoubleType)))
      .withColumn("tax_d", col("l_tax").cast(DoubleType))
    Profiler.sparseFractions(base, Seq("qty_n", "tax_d"))
  }

  /** A14 — Youden-J optimal threshold over the ROC points. */
  private def qYouden(s: SparkSession, dir: String): DataFrame = {
    val d = li(s, dir)
      .withColumn("label", when(col("l_returnflag") === "R", 1).otherwise(0))
    Metrics.youdenJ(d, "label", "l_extendedprice")
      .select(round(col("score"), 4).as("score"), round(col("j"), 6).as("j"))
  }

  /** T5 — duplicate-n-gram repetition fractions (Gopher-style quality
    * filter): map-only, per-doc 2-gram and 3-gram dup fractions.
    */
  private def qRepetition(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    doc(s, dir).select(col("doc_id"),
        round(TextOps.dupNgramFraction(col("text"), 2), 6).as("dup2"),
        round(TextOps.dupNgramFraction(col("text"), 3), 6).as("dup3"))
      .orderBy("doc_id")
  }

  /** T6 — PII detection + redaction (emails / phones / IPv4), the
    * corpus-scrubbing stage: pure regex Column expressions, map-only.
    * Deterministic PII is injected per doc_id so counts and the
    * redacted-text hash are meaningfully nonzero on synthetic text.
    */
  private def qPiiRedact(s: SparkSession, dir: String): DataFrame = {
    import graft.text.{Pii, TextOps}
    val t = concat(col("text"),
      when(col("doc_id") % 7 === 0,
        concat(lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com"))).otherwise(lit("")),
      when(col("doc_id") % 11 === 0, lit(" from 192.168.1.77")).otherwise(lit("")),
      when(col("doc_id") % 13 === 0, lit(" call +1 555 0100")).otherwise(lit("")))
    doc(s, dir).withColumn("t", t)
      .select(col("doc_id"),
        Pii.emailCount(col("t")).as("n_email"),
        Pii.phoneCount(col("t")).as("n_phone"),
        Pii.ipv4Count(col("t")).as("n_ip"),
        TextOps.strHash(Pii.redact(col("t"))).as("redacted_hash"))
      .orderBy("doc_id")
  }

  /** T7 — benchmark decontamination: 3-gram overlap of every corpus
    * document (doc_id ≥ 20) against the "benchmark" set (doc_id < 20) —
    * broadcast shingle semi-join, the pre-training leak check.
    */
  private def qDecontam(s: SparkSession, dir: String): DataFrame = {
    val d = doc(s, dir)
    graft.text.Decontam.contamination(
        d.where(col("doc_id") >= 20), d.where(col("doc_id") < 20),
        "doc_id", "text", n = 3)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }

  /** W6 — as-of join: each event picks up the most recent prior error
    * event's value for its user (point-in-time enrichment). Union-scan
    * form — one shuffle on the key, no range-join pair blowup; DuckDB's
    * native ASOF JOIN is the oracle.
    */
  private def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).withColumn("ts_us", expr("ts div 1000"))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("event_type"), col("value"))
    // marker stream deduped to one row per (user, ts): at equal
    // timestamps the as-of pick would otherwise be engine-dependent
    val err = e.where(col("event_type") === "error")
      .groupBy(col("user_id"), col("ts_us")).agg(max(col("value")).as("err_value"))
    graft.seq.AsOfJoin.asOf(e, err, "user_id", "ts_us", Seq("err_value"))
      .select(col("event_id"), col("user_id"), col("ts_us"), col("event_type"),
        col("asof_ts").as("err_ts"), col("asof_err_value").as("err_value"))
      .orderBy("event_id")
  }

  /** W5 — gap-based sessionization over events (30-minute gap): per-key
    * ordered window (parallel across users, no global window), session
    * summaries with decimal-exact value sums. Oracle-checked end to end
    * including the gap logic.
    */
  private def qSessionize(s: SparkSession, dir: String): DataFrame = {
    val gapUs = 30L * 60 * 1000 * 1000 // 30 min in micros
    // micro-precision timestamps on BOTH engines: DuckDB TIMESTAMP is
    // microseconds, so the nanos-as-long column is integer-divided down
    // before the gap compare (otherwise a gap within 1 µs of the
    // threshold could sessionize differently across engines)
    val base = ev(s, dir).withColumn("ts_us", expr("ts div 1000"))
    graft.seq.Sessionizer.sessionStats(base, Seq("user_id"),
        col("ts_us"), Seq(col("event_id")), gapUs, col("value"))
      .select(col("user_id"), col("session_seq"), col("n_events"),
        col("start_ts"), col("end_ts"), round(col("sum_value"), 4).as("sum_value"))
      .orderBy("user_id", "session_seq")
  }

  // --- distribution drift (data-quality monitoring) ------------------ //

  /** D1 — PSI per numeric feature between early (baseline) and late
    * (current) shipment populations: decile edges from the baseline via
    * the distributed order-statistic selection, then one fused
    * (column, bin) aggregate per frame — narrow keys only.
    */
  private def qPsiDrift(s: SparkSession, dir: String): DataFrame = {
    val l = li(s, dir)
    val cut = lit("1998-01-01").cast("timestamp")
    graft.drift.Drift.psi(
        l.where(col("l_shipdate") < cut), l.where(col("l_shipdate") >= cut),
        Seq("l_quantity", "l_extendedprice", "l_discount"), bins = 10)
      .orderBy("feature")
  }

  /** D2 — exact two-sample Kolmogorov–Smirnov statistic between
    * purchase and click event values — distributed prefix scan, no
    * single-partition window, sup evaluated at every distinct value.
    */
  private def qKsDrift(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    graft.drift.Drift.ks(
      e.where(col("event_type") === "purchase"),
      e.where(col("event_type") === "click"), "value")
  }

  /** D3 — chi-square categorical drift: event-type mix of even- vs
    * odd-id events (a scale-free split — both sides are non-empty at
    * every sf, unlike an absolute id cut).
    */
  private def qChi2Drift(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    graft.drift.Drift.chiSquare(
      e.where(col("event_id") % 2 === 0), e.where(col("event_id") % 2 === 1),
      "event_type")
  }

  /** W7 — rolling trailing-window features per user over the event
    * stream: moving count/avg/std/min/max + lag delta. One shuffle on
    * the key, per-key ordered windows, decimal-exact windowed sums
    * (engines disagree on windowed-double association order).
    */
  private def qRollingFeats(s: SparkSession, dir: String): DataFrame =
    graft.seq.Rolling.rolling(ev(s, dir), Seq("user_id"), col("event_id"),
        col("value"), k = 4)
      .select(col("event_id"), col("user_id"), col("roll_n"),
        round(col("roll_avg"), 6).as("roll_avg"),
        round(col("roll_std"), 6).as("roll_std"),
        round(col("roll_min"), 6).as("roll_min"),
        round(col("roll_max"), 6).as("roll_max"),
        round(col("roll_delta"), 6).as("roll_delta"))
      .orderBy("event_id")

  /** A16 — pairwise Pearson correlation matrix of the lineitem numeric
    * features in ONE mergeable aggregate pass (pairwise-complete
    * validity, exact decimal moments).
    */
  private def qCorrMatrix(s: SparkSession, dir: String): DataFrame =
    Stats.corrMatrix(par(li(s, dir)), lineitemNumerics)
      .select(col("col_x"), col("col_y"), round(col("corr"), 6).as("corr"))
      .orderBy("col_x", "col_y")

  /** F7 — robust (median/IQR) scaling, the outlier-insensitive scaler:
    * fused distributed quantile fit, codegen'd transform, grouped
    * decimal checksum of the scaled values.
    */
  private def qRobustScale(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice")
    val base = li(s, dir)
    val m = graft.features.RobustScaler.fit(base, cols)
    m.transform(base, "_r")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        round(Stats.dsum(col("l_quantity_r")), 4).as("sum_qty_scaled"),
        round(Stats.dsum(col("l_extendedprice_r")), 4).as("sum_price_scaled"))
      .orderBy("l_returnflag")
  }

  /** A17 — exact per-group quantiles via the fused grouped selection
    * (no per-group value buffers, no single-reducer percentile).
    */
  private def qGroupedQuantiles(s: SparkSession, dir: String): DataFrame =
    graft.core.OrderStats.groupedQuantiles(li(s, dir), "l_returnflag",
        "l_extendedprice", Seq(0.25, 0.5, 0.95))
      .select(col("l_returnflag"), col("p"), round(col("value"), 6).as("value"))
      .orderBy("l_returnflag", "p")

  // --- text analysis over documents (training-data pipeline ops) ----- //

  private def doc(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")
  /** Post-scan round-robin repartition (the reference's own L5
    * `repartition(32)`, `app/AE_model.py:29`). The harness's local
    * parquet files hold ONE row group each, so a bare scan is a single
    * task; queries whose cost is per-row compute (model scoring,
    * multi-agg profiling, shingle explosion) repartition first so the
    * narrow stages use every core. Cheap scan-bound queries skip it —
    * the shuffle would cost more than it buys.
    */
  private def par(df: DataFrame) =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** T1 — token counting (whitespace, distinct, BPE-ish, regex) +
    * rolling-hash fingerprint, one codegen'd map stage per document.
    */
  private def qTextStats(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    doc(s, dir).select(col("doc_id"),
      TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
      TextOps.uniqueTokenCount(col("text")).cast("long").as("n_uniq"),
      TextOps.bpeTokenCount(col("text")).as("bpe_tokens"),
      TextOps.regexTokenCount(col("text")).cast("long").as("regex_tokens"),
      TextOps.fingerprint(col("text")).as("fingerprint"))
      .orderBy("doc_id")
  }

  /** T2 — language identification (lexicon-overlap argmax) with a
    * per-(actual, predicted) confusion rollup.
    */
  private def qLangId(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    doc(s, dir)
      .select(col("lang"), TextOps.tokens(col("text")).as("toks"))
      .select(col("lang"), TextOps.langIdFromTokens(col("toks")).as("lang_pred"))
      .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))
      .orderBy("lang", "lang_pred")
  }

  /** T3 — per-document quality scoring (stopword/unique ratios, length
    * prior blend).
    */
  private def qTextQuality(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    doc(s, dir).select(col("doc_id"),
      round(TextOps.stopwordRatio(col("text")), 6).as("stopword_ratio"),
      round(TextOps.avgTokenLen(col("text")), 6).as("avg_token_len"),
      round(TextOps.uniqueRatio(col("text")), 6).as("unique_ratio"),
      round(TextOps.qualityScore(col("text")), 6).as("quality"))
      .orderBy("doc_id")
  }

  // --- deduplication over documents / embeddings --------------------- //

  /** D1 — exact dedup by content hash on a frame with induced duplicates
    * (every 10th doc re-inserted under a shifted id). Only (hash, id)
    * shuffles — document bodies never move.
    */
  private def qExactDedup(s: SparkSession, dir: String): DataFrame = {
    val d = doc(s, dir).select(col("doc_id"), col("text"))
    val withDups = d.unionByName(
      d.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
    graft.dedup.Dedup.exactDupGroups(withDups, "doc_id", "text")
      .select(col("content_hash"), col("n_dups"), col("canonical_id"))
      .orderBy("canonical_id")
  }

  /** D2 — all-pairs 3-gram Jaccard near-dup detection (correctness
    * baseline for D3's LSH path).
    */
  private def qJaccardPairs(s: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.jaccardPairs(par(doc(s, dir)), "doc_id", "text",
        n = 3, threshold = 0.5)
      .orderBy("a", "b")

  /** D3 — MinHash(16) + 4-band LSH candidates, exact-Jaccard verified.
    * The scale path: shuffles band keys, verifies only in-bucket pairs.
    */
  private def qMinHashLsh(s: SparkSession, dir: String): DataFrame =
    graft.dedup.MinHashLSH.nearDupPairs(doc(s, dir), "doc_id", "text",
        n = 3, k = 16, bands = 4, threshold = 0.5)
      .orderBy("a", "b")

  /** D4 — per-document 24-bit SimHash fingerprints. */
  private def qSimHash(s: SparkSession, dir: String): DataFrame =
    graft.dedup.SimHash.fingerprints(doc(s, dir), "doc_id", "text")
      .orderBy("id")

  /** D5 — SimHash Hamming-distance near-dup pairs (≤ 1 bit), via the
    * exact banded path (pigeonhole: ≤1 differing bit ⇒ ≥2 intact
    * chunks), verified against the brute-force oracle.
    */
  private def qSimHashPairs(s: SparkSession, dir: String): DataFrame =
    graft.dedup.SimHash.nearPairs(doc(s, dir), "doc_id", "text", maxDist = 1)
      .orderBy("a", "b")

  /** D6 — embedding-cosine near-dup pairs over the embeddings table. */
  private def qCosineDups(s: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.cosineDupPairs(
        em(s, dir), "vec_id", "embedding",
        threshold = 0.45)
      .orderBy("a", "b")

  /** D6s — LSH-bucketed embedding near-dup pairs: the 100 TB twin of
    * q28. Bucket equi-join candidates + in-bucket exact cosine — the
    * plan contains no BroadcastNestedLoopJoin; q28 remains the labeled
    * all-pairs correctness baseline.
    */
  private def qLshCosineDups(s: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.lshCosineDupPairs(
        em(s, dir), "vec_id", "embedding",
        threshold = 0.45, dim = 64, tables = 8, bitsPerTable = 6)
      .orderBy("a", "b")

  // --- similarity search over embeddings ----------------------------- //

  /** N1 — brute-force cosine top-3 neighbors (codegen'd dot kernel) for
    * query vectors id < 100; the exactness baseline for N2.
    */
  private def qCosineTopK(s: SparkSession, dir: String): DataFrame =
    graft.sim.Ann.cosineTopK(em(s, dir),
        "vec_id", "embedding", k = 3, queryPred = col("id") < 100)
      .orderBy("a", "rank")

  /** N2 — random-hyperplane LSH ANN (16 tables × 4 bits), exact
    * re-rank within buckets only: the 100 TB path. Registered at the
    * MEASURED operating point (r8 RecallCheck: recall@10 = 0.73 at
    * sf0.1 vs 0.13 for the old 4×8 banding — same 64 total planes,
    * wider OR over narrower buckets; AnnSpec floors the recall per
    * build so a params regression fails the suite).
    */
  private def qLshAnn(s: SparkSession, dir: String): DataFrame =
    graft.sim.Ann.lshTopK(em(s, dir),
        "vec_id", "embedding", k = 3, dim = 64, tables = 16,
        bitsPerTable = 4, queryPred = col("id") < 100)
      .orderBy("a", "rank")

  // --- joins, sampling, augmentation --------------------------------- //

  /** J — multiway star join with broadcast dims: revenue by nation for
    * one region+year. lineitem⋈orders shuffles on the fact keys; nation
    * and region are broadcast (no shuffle); the date filter pushes into
    * the orders scan. The canonical 100 TB join shape.
    */
  private def qJoinRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = SparkEntry.li(s, dir)
    val ord = Tables.load(s, dir, "orders")
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val cust = Tables.load(s, dir, "customer")
    val nat = Tables.load(s, dir, "nation")
    val reg = Tables.load(s, dir, "region").where(col("r_name") === "ASIA")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(
        round(Stats.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("n_name")
  }

  /** R1' — deterministic content-hash sampling (the engine's scale-sane
    * replacement for RNG sampling: stable under retries and engine
    * changes), verified via grouped aggregates of the sampled set.
    */
  private def qHashSample(s: SparkSession, dir: String): DataFrame =
    graft.aug.Sampling.hashSample(li(s, dir), "l_orderkey", 0.1, seed = 42L)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        round(Stats.dsum(col("l_extendedprice")), 4).as("sum_price"))
      .orderBy("l_returnflag")

  /** R2 — deterministic SMOTE: 50 synthetic minority rows (label=7) by
    * k-NN interpolation over embeddings; checksummed via the synthetic
    * vector's squared norm.
    */
  private def qSmote(s: SparkSession, dir: String): DataFrame =
    graft.aug.Smote.oversample(em(s, dir),
        "vec_id", "embedding", col("label") === 7, k = 5, target = 50)
      .select(col("synth_id"), col("a"), col("b"), round(col("u"), 6).as("u"),
        round(graft.sim.GraftFunctions.norm2(col("vec")), 6).as("vec_norm2"))
      .orderBy("synth_id")

  /** R1/R3 — Spark-native seeded sample + full shuffle, SELF-VERIFYING
    * (the q190/q191 audit pattern; closes the engine's last rows-only
    * row). rand(seed)'s stream is engine-private, so instead of emitting
    * RNG-dependent rows the query emits deterministic anchors (the exact
    * lineitem row count and class count, cross-engine-checked) plus
    * distributional invariants the oracle pins TRUE:
    *  - `frac_in_band`  — |n_sampled − p·N| ≤ 6σ, σ = √(N·p·(1−p)): the
    *    Bernoulli(p) sample size sits inside its binomial envelope;
    *  - `chi2_ok`       — Σ_c (n_c − p·N_c)²/(p·(1−p)·N_c) < 30: the
    *    per-returnflag sampled counts match their exact expected counts
    *    (each class is an independent Binomial(N_c, p); the bound is a
    *    ~1e-6 tail for 3 classes, robust to any healthy RNG stream);
    *  - `subset_ok`     — without-replacement sampling draws a multiset
    *    SUBSET: for every (l_orderkey, l_linenumber) the sampled count
    *    never exceeds the base count (the synthetic lineitem carries
    *    duplicate business keys, so the check is per-key counts, not
    *    distinctness);
    *  - `perm_ok`       — the rand(seed) shuffle is a true permutation:
    *    zipWithIndex over the sorted frame yields exactly n indices with
    *    max = n−1 (forces the sort to materialize — the aggregate-only
    *    form would let Catalyst drop it).
    * A broken sampler (wrong fraction, replacement, skew) or shuffle
    * (dropped/duplicated rows) now fails the hard correctness gate.
    * Deterministic oracle twin for membership/order semantics: q176.
    */
  private def qSampleShuffle(s: SparkSession, dir: String): DataFrame = {
    val p = 0.01
    val base = li(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
    // exact per-class totals: one grouped aggregate, ≤3 rows collected
    val totals = base.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nTotal = totals.values.sum
    val sampled = graft.aug.Sampling.seededSample(base, p, seed = 42L)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sCounts = sampled.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nSamp = sCounts.values.sum
    val fracOk =
      math.abs(nSamp - p * nTotal) <= 6.0 * math.sqrt(nTotal * p * (1 - p))
    val chi2 = totals.map { case (c, nc) =>
      val obs = sCounts.getOrElse(c, 0L).toDouble
      val exp = p * nc
      (obs - exp) * (obs - exp) / (exp * (1 - p))
    }.sum
    val subsetOk = sampled.groupBy("l_orderkey", "l_linenumber")
      .agg(count(lit(1)).as("sn"))
      .join(base.groupBy("l_orderkey", "l_linenumber")
        .agg(count(lit(1)).as("bn")), Seq("l_orderkey", "l_linenumber"))
      .where(col("sn") > col("bn")).count() == 0L
    // permutation check, two halves: (a) zipWithIndex over the sorted
    // frame still forces the shuffle's sort to MATERIALIZE (an
    // aggregate-only form would let Catalyst drop it) and pins the row
    // count; (b) a key-multiset signature — count + Σ xxhash64(key) as
    // exact decimal — compared between sampled and shuffled pins that
    // the shuffle is a PERMUTATION of the sample (zipWithIndex indices
    // are 0..n−1 by construction, so the old max-index check could not
    // catch a shuffle that dropped one row and duplicated another)
    val shuffled = graft.aug.Sampling.shuffle(sampled, seed = 42L)
    val permCnt = shuffled.select("l_orderkey").rdd
      .zipWithIndex().map(_._2).count()
    def keySig(df: DataFrame) = df.agg(
      count(lit(1)),
      sum(xxhash64(col("l_orderkey"), col("l_linenumber"))
        .cast(DecimalType(38, 0)))).head()
    val (sigS, sigH) = (keySig(sampled), keySig(shuffled))
    sampled.unpersist()
    val permOk = permCnt == nSamp && sigS.getLong(0) == sigH.getLong(0) &&
      sigS.getDecimal(1) == sigH.getDecimal(1)
    s.range(1).select(
      lit(nTotal).as("n_rows"),
      lit(totals.size.toLong).as("n_classes"),
      lit(fracOk).as("frac_in_band"),
      lit(chi2 < 30.0).as("chi2_ok"),
      lit(subsetOk).as("subset_ok"),
      lit(permOk).as("perm_ok"))
  }

  // --- native models: driver fit → broadcast → distributed score ----- //

  /** M1 — Isolation Forest end-to-end (the reference's flagship IF flow,
    * `app/IsolationForest_AE.py`): fit 100 iTrees on a deterministic
    * driver pool, broadcast, score every row distributed, flag the p90
    * tail. SELF-VERIFYING (the q190/q191 audit pattern): a random
    * forest's scores have no SQL twin, so the query outputs the exact
    * row count plus in-query invariants the oracle pins TRUE — score
    * range (0,1], planted synthetic extremes scoring above the normal
    * pool's median, and the p90 flag fraction landing in its band. A
    * broken forest (degenerate trees, bad path-length math, wrong
    * normalization) fails the hard correctness gate, not just a spec.
    */
  private def qIsolationForest(s: SparkSession, dir: String): DataFrame = {
    val feats = array(lineitemNumerics.map(c => col(c).cast("double")): _*)
    // composite key = total order: the fit pool is tie-free deterministic.
    // One slim persisted projection feeds both the pool TakeOrdered and
    // the scoring pass — the scan + repartition + array construction run
    // once instead of twice.
    val base = par(li(s, dir)).withColumn("features", feats)
      .withColumn("fit_id", col("l_orderkey") * 10 + col("l_linenumber"))
      .select(col("fit_id"), col("features"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val model = graft.score.IsolationForest.fit(
      base, "fit_id", "features", numTrees = 100, maxSamples = 16)
    // cache only the score column — the wide features arrays would
    // dominate the cached bytes
    val scored = model.transform(base, "features", "if_score")
      .select(col("if_score"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // approx quantiles (mergeable sketch, no global sort) — the scale
    // path for thresholds on distributed scores; deterministic
    val qs = scored
      .agg(graft.core.Quantiles.approx(col("if_score"), Seq(0.5, 0.9)))
      .head().getSeq[Double](0)
    val (median, thr) = (qs(0), qs(1))
    // the threshold action above materialized `scored`, so the wide
    // features frame is spent — release it NOW rather than retaining it.
    base.unpersist()
    // planted extremes: 4 synthetic rows far outside the data envelope,
    // scored through the SAME broadcast forest — the audit's anomaly
    // ground truth (reference analog: the labeled failure rows of
    // `app/IsolationForest_AE.py:367-399`)
    val dim = lineitemNumerics.size
    val planted = s.range(4).select(
      transform(sequence(lit(1), lit(dim)),
        j => lit(1.0e12) + col("id").cast("double") * j.cast("double"))
        .as("features"))
    val plantedMin = model.transform(planted, "features", "ps")
      .agg(min(col("ps"))).head().getDouble(0)
    val a = scored.agg(
      count(lit(1)).as("n"),
      count(when(col("if_score") <= 0 || col("if_score") > 1, 1)).as("bad"),
      count(when(col("if_score") > thr, 1)).as("flagged")).head()
    graft.core.Caches.retain("entry.q35", scored)
    val (n, bad, flagged) = (a.getLong(0), a.getLong(1), a.getLong(2))
    import s.implicits._
    Seq((n, 4L, bad == 0L, plantedMin > median,
        flagged <= (n * 0.12).toLong && flagged >= (n * 0.02).toLong))
      .toDF("n_rows", "n_planted", "scores_in_unit", "planted_above_median",
        "flag_frac_ok")
  }

  /** M2 — linear-AE (PCA) reconstruction-error scoring over embeddings:
    * fit top-8 components on the driver pool, broadcast, score
    * distributed. SELF-VERIFYING: eigenvectors have no SQL twin, so the
    * output is the exact (row count, dim, k) plus in-query invariants
    * the oracle pins TRUE — every error non-negative and bounded by the
    * centered squared norm (k = 0 reconstruction), error monotonically
    * non-increasing in k over the NESTED bases (k = 8 basis truncated
    * to k = 2 — more components can only absorb more variance), and the
    * fitted basis orthonormal to 1e-8. Projection-math or basis bugs
    * now fail the hard correctness gate.
    */
  private def qLinearAE(s: SparkSession, dir: String): DataFrame = {
    val base = em(s, dir)
      .withColumn("features", col("embedding").cast("array<double>"))
    val m8 = graft.score.LinearAE.fit(base, "vec_id", "features", k = 8)
    // truncations of the SAME fitted basis: nested by construction, so
    // err8 <= err2 <= err0 holds row-wise as a mathematical identity
    val m2 = new graft.score.LinearAE.Model(m8.mean, m8.components.take(2))
    val m0 = new graft.score.LinearAE.Model(m8.mean, Array.empty)
    val scored = m8.transform(
      m2.transform(m0.transform(base, "features", "err0"),
        "features", "err2"),
      "features", "err8")
    val a = scored.agg(
      count(lit(1)).as("n"),
      count(when(col("err8") < 0, 1)).as("neg"),
      count(when(col("err8") > col("err2") + lit(1e-9) ||
        col("err2") > col("err0") + lit(1e-9), 1)).as("nonmono")).head()
    val ortho = basisOrthonormal(m8.components)
    import s.implicits._
    Seq((a.getLong(0), m8.mean.length.toLong, 8L, a.getLong(1) == 0L,
        a.getLong(2) == 0L, ortho))
      .toDF("n_rows", "dim", "k", "err_nonneg", "err_monotone_k",
        "basis_orthonormal")
  }

  /** max |⟨wᵢ,wⱼ⟩ − δᵢⱼ| < 1e-8 over a fitted component basis. */
  private def basisOrthonormal(comps: Array[Array[Double]]): Boolean = {
    var ok = true
    for (i <- comps.indices; j <- i until comps.length) {
      val dot = comps(i).zip(comps(j)).map { case (x, y) => x * y }.sum
      val expect = if (i == j) 1.0 else 0.0
      if (math.abs(dot - expect) > 1e-8) ok = false
    }
    ok
  }

  /** M2n — nonlinear MLP autoencoder (Dense-AE parity,
    * `app/AE_model.py:114-191`): driver-fit 64→16→64 tanh AE on the
    * deterministic pool, broadcast weights, distributed reconstruction
    * error, p95 threshold (`app/AE_model.py:197`), report the flagged
    * anomalies. Deterministic but not SQL-replicable (rows-only check).
    */
  private def qMlpAe(s: SparkSession, dir: String): DataFrame = {
    val base = em(s, dir)
      .withColumn("features", col("embedding").cast("array<double>"))
    val model = graft.score.MlpAE.fit(base, "vec_id", "features",
      hidden = 16, epochs = 60)
    val scored = model.transform(base, "features", "recon_error")
      .select(col("vec_id"), col("recon_error"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val thr = Quantiles.exactQuantiles(scored, "recon_error", Seq(0.95)).head
    graft.core.Caches.retain("entry.q53", scored)
    // SELF-VERIFYING audit (q190/q191 pattern): trained weights aren't
    // SQL-expressible, so the output is the exact row count plus
    // invariants the oracle pins TRUE — MSE scores non-negative, the
    // TRAINED net beating its own Xavier-init weights on the fit pool
    // (60 Adam epochs must reduce reconstruction loss), and the exact
    // p95 flag fraction within its band. A diverged fit, a broken
    // forward pass, or a wrong threshold fails the hard gate.
    mlpAudit(s, base, model, scored, thr,
      init = graft.score.MlpAE.fit(base, "vec_id", "features",
        hidden = 16, epochs = 0))
  }

  /** Shared MLP-AE audit body for q53/q103: distributed invariants over
    * the scored frame + driver-side trained-vs-init loss on the pool.
    */
  private def mlpAudit(s: SparkSession, base: DataFrame,
                       model: graft.score.MlpAE.Model,
                       scored: DataFrame, thr: Double,
                       init: graft.score.MlpAE.Model,
                       poolSize: Int = 4096): DataFrame = {
    val pool = graft.score.FitPool.collect(base, "vec_id", "features", poolSize)
    def meanLoss(m: graft.score.MlpAE.Model): Double =
      pool.map(m.score).sum / pool.length
    val trainedBeatsInit = meanLoss(model) < meanLoss(init)
    val a = scored.agg(
      count(lit(1)).as("n"),
      count(when(col("recon_error") < 0, 1)).as("neg"),
      count(when(col("recon_error") > thr, 1)).as("flagged")).head()
    val (n, neg, flagged) = (a.getLong(0), a.getLong(1), a.getLong(2))
    import s.implicits._
    Seq((n, neg == 0L, trainedBeatsInit,
        flagged <= (n * 0.05).toLong && flagged >= 1L))
      .toDF("n_rows", "err_nonneg", "trained_beats_init", "flag_frac_ok")
  }

  /** M2n-deep — the reference's ENHANCED Dense AE shape
    * (`app/AE_model.py:114-191`: a deep relu encoder-decoder,
    * 512→256→128→48→… in its configs) scaled to the embedding dim:
    * driver-fit multi-layer relu stack on the deterministic pool,
    * broadcast weights, distributed reconstruction error, p95
    * threshold. Deterministic but not SQL-replicable (rows-only).
    */
  private def qDeepAe(s: SparkSession, dir: String): DataFrame = {
    val base = em(s, dir)
      .withColumn("features", col("embedding").cast("array<double>"))
    val model = graft.score.MlpAE.fitStack(base, "vec_id", "features",
      hidden = Seq(32, 16, 8, 16, 32), activation = "relu",
      epochs = 30, sampleSize = 1024)
    val scored = model.transform(base, "features", "recon_error")
      .select(col("vec_id"), col("recon_error"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val thr = Quantiles.exactQuantiles(scored, "recon_error", Seq(0.95)).head
    graft.core.Caches.retain("entry.q103", scored)
    // same self-verifying audit as q53 (see mlpAudit): deep relu stack
    // must beat its own init after 30 epochs, scores non-negative, p95
    // flag fraction in band — the oracle pins every boolean TRUE
    mlpAudit(s, base, model, scored, thr,
      init = graft.score.MlpAE.fitStack(base, "vec_id", "features",
        hidden = Seq(32, 16, 8, 16, 32), activation = "relu",
        epochs = 0, sampleSize = 1024),
      poolSize = 1024)
  }

  /** E2E — the curation pipeline composed end to end, the way a
    * pretraining-data run chains it: C4 rule filter (q82) →
    * standing-corpus exact dedup + incoming-batch delta dedup (q78) →
    * benchmark decontamination (q61, integer-arithmetic threshold:
    * keep iff 2·n_contaminated ≤ n_shingles, no float compare to tie)
    * → deterministic split assignment (q95) → per-split sequence
    * packing (q87). Proves the operators compose with no row-id or
    * ordering assumptions between stages; oracle-checked end to end
    * over the composed SQL. Scale shape inherits from the parts:
    * bodies shuffle only into the final per-split window; dedup and
    * decontam move (hash, id) pairs and broadcast benchmark shingles.
    */
  private def qCurationPipeline(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    val d = doc(s, dir)
    // par() first: the C4 token walks + the content hash are the
    // per-row compute bulk, and the one-row-group scan would otherwise
    // run them on a single core (A/B: 6.0 s → see PLANS.md)
    val stats = par(d).select(col("doc_id"), col("text"),
      TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
      TextOps.avgTokenLen(col("text")).as("avg_len"),
      TextOps.stopwordRatio(col("text")).as("sw_ratio"),
      TextOps.dupNgramFraction(col("text"), 2).as("dup_frac"))
    val passAll = TextOps.c4Rules(col("n_tokens"), col("avg_len"),
      col("sw_ratio"), col("dup_frac")).map(_._2).reduce(_ && _)
    // persisted: the corpus side is referenced by its own dedup reps
    // join AND the batch's anti-join; re-walking the C4 stats per
    // reference would triple the text scans. The content hash is
    // computed ONCE here and passed into both dedup operators as a
    // column ref — three hash walks become one.
    val kept = stats.where(passAll).select(col("doc_id"), col("text"),
        TextOps.strHash(col("text")).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val preHashed: Column => Column = _ => col("h")
    val corpus = kept.where(col("doc_id") % 5 < 4)
    val batch = kept.where(col("doc_id") % 5 === 4)
    val merged = graft.dedup.Dedup.dropExactDups(corpus, "doc_id", "text", preHashed)
      .unionByName(
        graft.dedup.Dedup.deltaDedup(batch, corpus, "doc_id", "text", preHashed))
      .drop("h")
      .where(col("doc_id") >= 20)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cont = graft.text.Decontam.contamination(
      merged, d.where(col("doc_id") < 20), "doc_id", "text", n = 3)
    val cleanIds = cont.where(col("n_contaminated") * 2 <= col("n_shingles"))
      .select(col("id").as("doc_id"))
    val clean = merged.join(cleanIds, Seq("doc_id"), "left_semi")
    val split = graft.aug.Sampling.splitAssign(clean, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val weighted = split.select(col("split"), col("doc_id"),
      TextOps.bpeTokenCount(col("text")).as("tokens"))
    graft.core.Caches.retain("entry.q102", kept, merged)
    graft.seq.Packing.packStatsByGroup(weighted, "split", "doc_id", "tokens",
        budget = 512L)
      .withColumnRenamed("group", "split")
      .orderBy("split", "pack_id")
  }

  /** F6 — VAE loss pieces as a distributed query (`app/LSTM_VAE.py:46-95`):
    * per-row reconstruction MSE + KL divergence over (x, x̂, μ, logσ²)
    * array columns — one codegen'd map stage. Training stays driver-side
    * like the reference's Keras fit; the loss math itself is engine
    * surface, and fully oracle-checked (deterministic derived μ/logσ²).
    */
  private def qVaeLoss(s: SparkSession, dir: String): DataFrame = {
    import graft.score.VaeLoss
    val base = em(s, dir).select(
      col("vec_id"),
      col("embedding").as("x"),
      transform(col("embedding"), v => v.cast(DoubleType) * lit(0.9)).as("xhat"),
      transform(col("embedding"), v => v.cast(DoubleType) * lit(0.5)).as("mu"),
      transform(col("embedding"), v => -abs(v.cast(DoubleType))).as("logvar"))
    base.select(col("vec_id"),
        VaeLoss.mse(col("x"), col("xhat")).as("m"),
        VaeLoss.klDivergence(col("mu"), col("logvar")).as("k"))
      .select(col("vec_id"), round(col("m"), 6).as("mse"),
        round(col("k"), 6).as("kl"), round(col("m") + col("k"), 6).as("loss"))
      .orderBy("vec_id")
  }

  // --- multimodal binary + grid search ------------------------------- //

  /** X1 — multimodal binary plumbing: text encoded to a binary payload
    * (stand-in for image/audio bytes), typed metadata struct attached,
    * byte-level metadata extracted (length, rolling byte hash, histogram
    * checksum). Byte ops run in JVM UDFs over the blob — the engine's
    * mapInPandas-analog boundary; everything around stays codegen'd.
    */
  private def qBinaryMeta(s: SparkSession, dir: String): DataFrame = {
    import graft.multimodal.Binary
    val bin = Binary.withMeta(
      doc(s, dir).withColumn("content", encode(col("text"), "UTF-8")),
      "content", mediaType = lit("text/plain"))
    bin.select(col("doc_id"),
      col("media_meta.media_type").as("media_type"),
      length(col("content")).cast("long").as("n_bytes"),
      Binary.byteHashCol(col("content")).as("byte_hash"),
      aggregate(Binary.byteHistogramCol(col("content")),
        lit(0L), (acc, x) => acc + x * x).as("hist_checksum"))
      .orderBy("doc_id")
  }

  /** A15 — single-pass grid search: F1 at each quantile threshold of the
    * score, 30 conditional aggregates in one scan (no grid cross join).
    */
  private def qGridThreshold(s: SparkSession, dir: String): DataFrame = {
    val d = li(s, dir)
      .withColumn("label", when(col("l_returnflag") === "R", 1).otherwise(0))
    graft.eval.GridSearch.thresholdGrid(d, "label", "l_extendedprice",
        Seq(0.5, 0.6, 0.7, 0.8, 0.9, 0.95))
      .select(col("p"), round(col("threshold"), 4).as("threshold"),
        col("tp"), col("fp"), col("fn"), round(col("f1"), 6).as("f1"))
      .orderBy("p")
  }

  /** P2/P3/P4/J2 end-to-end — the reference's test-vs-train schema
    * reconciliation (`app/test_AE.py:50-83`): a mutated "test" frame
    * (training column missing, unexpected extra column, boolean flag)
    * aligned back to the training schema — missing column restored as a
    * typed null, extra dropped, field order restored, bool cast to int.
    * Pure metadata operations: the plan is a single projection over the
    * scan, no shuffle.
    */
  private def qSchemaAlign(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(s, dir, "customer")
    val target = cust.select(col("c_custkey"), col("c_name"), col("c_acctbal"),
      col("c_mktsegment"), (col("c_custkey") % 2 === 0).as("is_even"))
    val mutated = cust.select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
      lit("junk").as("c_extra"), (col("c_custkey") % 2 === 0).as("is_even"))
    graft.core.SchemaAlign.boolsToInt(
        graft.core.SchemaAlign.alignTo(mutated, target.schema))
      .orderBy("c_custkey")
  }

  /** A15m — model-hyperparameter grid for the native isolation forest
    * with the reference's stability score
    * (`app/IsolationForest_AE_enhanced.py:39-146`). Driver loop over
    * the grid; ALL candidates' scoring moments from ONE distributed agg
    * pass. SELF-VERIFYING: forest scores have no SQL twin, so each grid
    * row carries its exact (num_trees, max_samples) coordinates plus
    * in-query invariants the oracle pins TRUE — mean score in (0,1),
    * σ ≥ 0, range in [0,1], the reference's stability statistic in
    * (0,1]. A degenerate candidate (collapsed scores, broken moments)
    * fails the hard gate on its own grid row.
    */
  private def qIfGrid(s: SparkSession, dir: String): DataFrame = {
    val feats = array(lineitemNumerics.map(c => col(c).cast("double")): _*)
    // (l_orderkey, l_linenumber) is the table key; a composite sort id
    // makes the fit pool a total order (no tie-dependent rows)
    val base = par(li(s, dir)).withColumn("features", feats)
      .withColumn("fit_id", col("l_orderkey") * 10 + col("l_linenumber"))
    graft.eval.GridSearch.ifParamGrid(base, "fit_id", "features",
        grid = Seq((50, 16), (100, 16), (50, 64), (100, 64)))
      .select(col("num_trees"), col("max_samples"),
        (col("mean_score") > 0 && col("mean_score") < 1).as("mean_in_unit"),
        (col("std_score") >= 0).as("std_nonneg"),
        (col("score_range") >= 0 && col("score_range") <= 1).as("range_valid"),
        (col("stability") > 0 && col("stability") <= 1).as("stability_in_unit"))
      .orderBy("num_trees", "max_samples")
  }

  /** A15cv — k-fold cross-validated threshold grid (GridSearchCV
    * analog, `app/IsolationForest_AE.py:210-247`): deterministic hash
    * folds, per-fold exact train-side thresholds, held-out confusion
    * cells. The CV structure itself is oracle-checked — fold
    * assignment, per-fold quantiles, and held-out counts all replicate
    * in SQL.
    */
  private def qCvGrid(s: SparkSession, dir: String): DataFrame =
    graft.eval.GridSearch.cvThresholdGrid(
        li(s, dir)
          .withColumn("rid", col("l_orderkey") * 10 + col("l_linenumber"))
          .withColumn("label", when(col("l_returnflag") === "R", 1).otherwise(0)),
        "rid", "label", "l_extendedprice", ps = Seq(0.8, 0.9, 0.95), k = 5)
      .select(col("p"), col("fold"), round(col("threshold"), 4).as("threshold"),
        col("tp"), col("fp"), col("fn"), round(col("f1"), 6).as("f1"))
      .orderBy("p", "fold")

  // --- reconstruction-error scoring (F1/F2) -------------------------- //

  /** F1 — variance-normalized MAE record scoring (`lib/utils.py:39-63`):
    * x̂ = per-feature train means (the trivial linear reconstruction),
    * vars = population variances (np.var semantics), score thresholded
    * at p95 — the Dense-AE flow with an oracle-checkable reconstruction.
    */
  private def qReconMae(s: SparkSession, dir: String): DataFrame = {
    val cols = lineitemNumerics
    // pruned input cached across the stats pass, the scoring pass, and
    // steady-state reruns (retention-bounded)
    val df = par(li(s, dir))
      .select((Seq("l_orderkey", "l_linenumber") ++ cols).map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val aggs = cols.flatMap { c =>
      val d = col(c).cast(DoubleType)
      Seq(Stats.dmean(d).as(s"${c}__mu"), Stats.dvarPop(d).as(s"${c}__var"))
    }
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val mus = cols.indices.map(i => r.getDouble(2 * i))
    val vars = cols.indices.map(i => r.getDouble(2 * i + 1))
    // cache only the report columns — caching the 16-col frame would
    // multiply the cached bytes for nothing
    val scored = df.withColumn("score",
        graft.score.ReconstructionError.varNormalizedMaeCols(
          cols.map(col), mus, vars))
      .select(col("l_orderkey"), col("l_linenumber"), col("score"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val thr = Quantiles.exactQuantiles(scored, "score", Seq(0.95)).head
    graft.core.Caches.retain("entry.q39", df, scored)
    scored.where(col("score") > thr)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("score"), 6).as("recon_mae"))
      .orderBy(desc("recon_mae"), asc("l_orderkey"), asc("l_linenumber"))
  }

  /** F2 — sequence reconstruction scoring over the W1 sliding windows:
    * per-timestep F1 against the global mean, averaged over the window.
    */
  private def qSeqReconMae(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val r = e.agg(
      Stats.dmean(col("value").cast(DoubleType)),
      Stats.dvarPop(col("value").cast(DoubleType))).head()
    val (mu, vr) = (r.getDouble(0), r.getDouble(1))
    graft.seq.Sequencer
      .slidingSequences(e, Seq("user_id"), seqOrder, col("value"), seqT)
      .select(col("user_id"), col("row_id"),
        round(graft.score.ReconstructionError.seqVarNormalizedMae(
          transform(col("seq"), v => array(v)), Seq(mu), Seq(vr)), 6)
          .as("seq_recon_mae"))
      .orderBy("user_id", "row_id")
  }

  /** S6/A2-A5 — the full fitted feature pipeline end-to-end (impute →
    * frequency-index → assemble → standardize), checksummed per group.
    * The reference's `Pipeline.fit/transform` flow in one query.
    */
  private def qFeaturePipeline(s: SparkSession, dir: String): DataFrame = {
    import graft.features.FeaturePipeline
    // persisted: the pipeline fit runs one job per stage kind (fills,
    // two label tables, z-params) plus the final query — five scans of
    // the same projection without it
    val base = par(li(s, dir)).withColumn("qty_n",
      when(col("l_orderkey") % 7 === 0, lit(null).cast(DoubleType))
        .otherwise(col("l_quantity").cast(DoubleType)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val spec = FeaturePipeline.Spec(
      imputeCols = Seq("qty_n"),
      imputeStrategy = graft.features.Imputers.Mean,
      indexCols = Seq("l_returnflag", "l_linestatus"),
      numericCols = Seq("qty_n", "l_extendedprice"),
      standardize = true)
    val out = FeaturePipeline.fit(base, spec).transform(base)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        round(Stats.dsum(aggregate(col("features"), lit(0.0), (a, x) => a + x)), 4)
          .as("feat_checksum"))
      .orderBy("l_returnflag")
    graft.core.Caches.retain("entry.q41", base)
    out
  }

  /** K1 — skew-salted two-stage aggregation: hot keys spread over 32
    * salt buckets, decimal partials merged exactly — bit-identical to
    * the plain GROUP BY the oracle runs (the correctness contract of
    * the salting rewrite).
    */
  private def qSaltedAgg(s: SparkSession, dir: String): DataFrame =
    graft.core.Skew.saltedSumCount(li(s, dir), Seq("l_returnflag"),
        "l_extendedprice", spread = col("l_orderkey"), buckets = 32)
      .select(col("l_returnflag"),
        round(col("sum_l_extendedprice"), 4).as("sum_price"), col("n"))
      .orderBy("l_returnflag")

  /** N3 — IVF ANN: k-means coarse cells (fit on a deterministic pool,
    * broadcast), nprobe-cell candidate search, exact re-rank.
    * Registered at the MEASURED r10 knee (nprobe = 8 of 16 cells —
    * recall@3 0.837/0.883/0.843 at sf0.001/0.01/0.1; the r9 nprobe=4
    * point's 0.56–0.65 was a recall trap for users trusting the
    * default). The harness embeddings have weak intrinsic cluster
    * structure, so recall tracks the scanned fraction near-linearly —
    * the measured tradeoff curve lives in PLANS.md; on real corpora
    * with cluster structure the same nprobe/nCells fraction buys far
    * more. SELF-VERIFYING: centroids have no SQL twin, so the query
    * audits itself in-query against the exact brute-force top-k (the
    * q29 path) over the SAME query set and the oracle pins the
    * booleans TRUE — recall@k ≥ 0.75 (just under the weakest measured
    * SF point) and every reported cosine in [−1, 1]. An index whose
    * defaults stop returning real neighbors fails the hard
    * correctness gate.
    */
  private def qIvfAnn(s: SparkSession, dir: String): DataFrame = {
    val e = em(s, dir)
    val ivf = graft.sim.Ann.ivfTopK(e,
        "vec_id", "embedding", k = 3, nCells = 16, nprobe = 8,
        queryPred = col("id") < 100)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val brute = graft.sim.Ann.cosineTopK(e,
      "vec_id", "embedding", k = 3, queryPred = col("id") < 100)
    val nTrue = brute.count()
    val nHit = brute.select("a", "b")
      .join(ivf.select("a", "b"), Seq("a", "b"), "left_semi").count()
    val recall = nHit.toDouble / nTrue
    val badCos = ivf.agg(count(when(
      col("cos") < lit(-1.0 - 1e-9) || col("cos") > lit(1.0 + 1e-9), 1)))
      .head().getLong(0)
    graft.core.Caches.retain("entry.q45", ivf)
    val nQueries = e.where(col("vec_id") < 100).count()
    import s.implicits._
    Seq((nQueries, 3L, recall >= 0.75, badCos == 0L))
      .toDF("n_queries", "k", "recall_ge_floor", "cos_in_range")
  }

  /** T4 — TF-IDF top-3 terms per document (rational IDF for exact
    * cross-engine arithmetic; log variant in the library).
    */
  private def qTfIdf(s: SparkSession, dir: String): DataFrame =
    graft.text.TfIdf.topTerms(
        doc(s, dir).where(col("doc_id") < 50), "doc_id", "text",
        k = 3, rational = true)
      .orderBy("id", "rank")

  /** D7 — near-dup clustering: connected components over the Jaccard
    * ≥ 0.5 pair graph (min-label propagation), the dedup
    * canonicalization step. Oracle = recursive min-reachable-id CTE.
    */
  private def qDedupClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = graft.dedup.Dedup.jaccardPairs(par(doc(s, dir)), "doc_id", "text",
      n = 3, threshold = 0.5)
    graft.dedup.Components.connectedComponents(pairs, "a", "b")
      .orderBy("id")
  }

  /** Q1 — declarative data-quality suite in one aggregation pass +
    * one referential anti-join (the deequ-style engine-native form of
    * the reference's defensive checks).
    */
  private def qQualityChecks(s: SparkSession, dir: String): DataFrame = {
    import graft.core.Checks
    import graft.core.Checks._
    val l = li(s, dir)
    val base = Checks.run(l, Seq(
      MaxNullFraction("l_quantity", 0.01),
      InRange("l_discount", 0.0, 0.05),
      Unique("l_orderkey"),
      NonEmpty,
      Finite("l_extendedprice")))
    val orphans = Checks.referentialOrphans(
      l, "l_orderkey", Tables.load(s, dir, "orders"), "o_orderkey")
    import s.implicits._
    val refRow = Seq(("referential(l_orderkey->orders)",
      orphans.toDouble, 0.0, orphans == 0L))
      .toDF("check", "observed", "threshold", "passed")
    base.unionByName(refRow).orderBy("check")
  }

  /** A13' — binned approximate ROC AUC: the documented scale path for
    * continuous scores (window input = bins, not distinct scores).
    */
  private def qBinnedRoc(s: SparkSession, dir: String): DataFrame = {
    val d = li(s, dir)
      .withColumn("label", when(col("l_returnflag") === "R", 1).otherwise(0))
    Metrics.binnedRocAuc(d, "label", "l_extendedprice", bins = 20)
  }

  /** L' — ranking window functions (row_number + lag delta): top-2
    * orders per customer by price.
    */
  private def qRanking(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables.load(s, dir, "orders")
      .where(col("o_custkey") < 200)
      .withColumn("rank", row_number().over(w))
      .withColumn("delta_to_prev",
        round(coalesce(lag("o_totalprice", 1).over(w) - col("o_totalprice"),
          lit(0.0)), 4))
      .where(col("rank") <= 2)
      .select(col("o_custkey"), col("rank"), col("o_orderkey"),
        round(col("o_totalprice"), 4).as("total"), col("delta_to_prev"))
      .orderBy("o_custkey", "rank")
  }

  /** A1' — exact per-column cardinality (the oracle-checkable column of
    * `Profiler.cardinality`; the HLL approx column is spec-tested —
    * sketches aren't cross-engine comparable).
    */
  private def qCardinality(s: SparkSession, dir: String): DataFrame =
    Profiler.cardinality(li(s, dir),
        Seq("l_returnflag", "l_linestatus", "l_orderkey", "l_quantity"))
      .select("column_name", "n_distinct")
      .orderBy("column_name")

  /** S2 — the SQL entry surface (`spark.sql` over registered tables,
    * the reference's `app/main.py` shape): orders per priority per year,
    * straight ANSI SQL through the same Catalyst pipeline.
    */
  private def qSqlSurface(s: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(s, dir)
    s.sql(
      """SELECT year(o_orderdate) AS yr, o_orderpriority,
        |  count(*) AS n,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE), 4) AS sum_total
        |FROM orders
        |WHERE o_orderstatus <> 'X'
        |GROUP BY year(o_orderdate), o_orderpriority
        |ORDER BY yr, o_orderpriority""".stripMargin)
  }

  /** M3 — sequence anomaly scoring end-to-end (the engine's LSTM-AE
    * capability analog, SURVEY.md §7: sequence scoring with a pluggable
    * scorer): W1 sliding windows → fixed-length sequence vectors →
    * linear-AE (PCA) reconstruction error, fit on a deterministic pool,
    * scored distributed. SELF-VERIFYING: the W1 sequence COUNT is exact
    * SQL (Σ_user max(n_u − t + 1, 0)) and anchors the oracle row; the
    * model side ships its invariants as booleans the oracle pins TRUE —
    * errors non-negative, bounded by the centered norm (k = 0), and
    * monotone over the nested k = 2 → 1 → 0 bases.
    */
  private def qSeqAeScore(s: SparkSession, dir: String): DataFrame = {
    // persisted: the sliding-window frame (scan + window shuffle) feeds
    // BOTH the fit-pool TakeOrdered and the scoring pass — without the
    // cache the whole window computation runs twice (q35/q39 pattern)
    val seqs = graft.seq.Sequencer
      .slidingSequences(ev(s, dir), Seq("user_id"), seqOrder, col("value"), seqT)
      .withColumn("features", col("seq").cast("array<double>"))
      .withColumn("seq_key",
        col("user_id").cast("long") * 1000000L + col("row_id"))
      .select(col("seq_key"), col("features"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m2 = graft.score.LinearAE.fit(seqs, "seq_key", "features", k = 2)
    val m1 = new graft.score.LinearAE.Model(m2.mean, m2.components.take(1))
    val m0 = new graft.score.LinearAE.Model(m2.mean, Array.empty)
    graft.core.Caches.retain("entry.q44", seqs)
    val scored = m2.transform(
      m1.transform(m0.transform(seqs, "features", "err0"), "features", "err1"),
      "features", "err2")
    val a = scored.agg(
      count(lit(1)).as("n"),
      count(when(col("err2") < 0, 1)).as("neg"),
      count(when(col("err2") > col("err1") + lit(1e-9) ||
        col("err1") > col("err0") + lit(1e-9), 1)).as("nonmono")).head()
    import s.implicits._
    Seq((a.getLong(0), seqT.toLong, a.getLong(1) == 0L, a.getLong(2) == 0L,
        basisOrthonormal(m2.components)))
      .toDF("n_seqs", "seq_len", "err_nonneg", "err_monotone_k",
        "basis_orthonormal")
  }

  /** A9 — per-group population and sample variance (exact-sum identity). */
  private def qVariance(s: SparkSession, dir: String): DataFrame =
    li(s, dir).groupBy(col("l_returnflag"))
      .agg(
        round(Stats.dvarPop(col("l_quantity")), 6).as("var_pop_qty"),
        round(Stats.dvarSamp(col("l_quantity")), 6).as("var_samp_qty"),
        round(Stats.dstddevSamp(col("l_discount")), 6).as("std_disc"))
      .orderBy("l_returnflag")

  /** A13'' — full ROC-curve export (the reference's headline evaluation
    * artifact: the fpr/tpr arrays it plots, `lib/utils.py:117-151`,
    * `app/AE_model.py:294-319`), via the distributed prefix scan — one
    * row per distinct score, no single-partition window anywhere.
    */
  private def qRocCurve(s: SparkSession, dir: String): DataFrame = {
    val d = li(s, dir)
      .withColumn("label", when(col("l_returnflag") === "R", 1).otherwise(0))
    Metrics.rocCurve(d, "label", "l_quantity")
      .select(col("score"), round(col("tpr"), 6).as("tpr"),
        round(col("fpr"), 6).as("fpr"))
      .orderBy("score")
  }

  /** A13'' binned — the ROC curve's scale path for continuous scores:
    * quantile-bucketed, one row per bin instead of per distinct score.
    */
  private def qBinnedRocCurve(s: SparkSession, dir: String): DataFrame = {
    val d = li(s, dir)
      .withColumn("label", when(col("l_returnflag") === "R", 1).otherwise(0))
    Metrics.binnedRocCurve(d, "label", "l_extendedprice", bins = 20)
      .select(col("bin").cast("long").as("bin"), round(col("tpr"), 6).as("tpr"),
        round(col("fpr"), 6).as("fpr"))
      .orderBy("bin")
  }

  /** R4' — deterministic stratified sampling (hash-bucketed per-class
    * fractions, the oracle-checkable twin of RNG `sampleBy`), verified
    * via per-class aggregates of the sampled set.
    */
  private def qStratSample(s: SparkSession, dir: String): DataFrame =
    graft.aug.Sampling.hashStratifiedSample(li(s, dir), "l_returnflag",
        "l_orderkey", Map("A" -> 0.05, "N" -> 0.25, "R" -> 0.5), seed = 42L)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        round(Stats.dsum(col("l_extendedprice")), 4).as("sum_price"))
      .orderBy("l_returnflag")

  /** P3'/J2' — feature-dimension guard + zero-pad (`app/test_AE.py:
    * 138-165`): a "test-time" frame assembled with only 3 of the 5
    * training features is padded back to the training width; the
    * position-weighted checksum proves pad values AND positions (a
    * truncation or left-pad would shift the weights).
    */
  private def qDimPad(s: SparkSession, dir: String): DataFrame = {
    val narrow = li(s, dir).withColumn("features",
      array(Seq("l_quantity", "l_extendedprice", "l_discount")
        .map(c => col(c).cast(DoubleType)): _*))
    val padded = graft.core.SchemaAlign.padFeatures(narrow, "features", dim = 5)
    val weighted = (1 to 5)
      .map(i => element_at(col("features"), i) * lit(i.toDouble))
      .reduce(_ + _)
    padded.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        round(Stats.dsum(weighted), 4).as("checksum"),
        max(size(col("features"))).cast("long").as("dim"))
      .orderBy("l_returnflag")
  }

  /** MM' — REAL image-container metadata decode (PNG/JPEG/GIF header
    * bytes → dimensions + bit depth, pure byte arithmetic, no codec):
    * synthetic headers built from doc_id round-trip through the parser
    * and are checked against a known-answer oracle. Pixel decode stays
    * the documented stub (q37 covers the byte-level plumbing).
    */
  private def qImageMeta(s: SparkSession, dir: String): DataFrame = {
    import graft.multimodal.Binary
    doc(s, dir).select(col("doc_id"))
      .withColumn("img", Binary.synthHeaderCol(col("doc_id")))
      .select(col("doc_id"), Binary.imageMetaCol(col("img")).as("m"))
      .select(col("doc_id"), col("m.format").as("format"),
        col("m.width").cast("long").as("width"),
        col("m.height").cast("long").as("height"),
        col("m.bit_depth").cast("long").as("bit_depth"))
      .orderBy("doc_id")
  }

  /** MM-PX — REAL PNG PIXEL decode, dependency-free (closes the pixel
    * half of the multimodal boundary for PNG): deterministic truecolor
    * PNGs are built per doc_id by [[graft.multimodal.Binary.synthPng]]
    * (real zlib IDAT via Deflater, real CRC-32s, scanline filter type
    * cycling y%5 so every defilter path executes), then fully decoded
    * back — chunk walk, CRC verify, Inflater, none/sub/up/average/
    * paeth defiltering — and reduced to per-channel pixel statistics.
    * The oracle recomputes the statistics from the closed-form pixel
    * formula with exact integer arithmetic: a single wrong byte
    * anywhere in the deflate→inflate→defilter path breaks sum_px and
    * hash-mismatches the row. Integer anchors (n_px, sum_px) are
    * exact; mean is a terminating-or-never-tying rational at scale 6
    * for this id range (checked: no x.xxxxxx5 midpoints for id < 60);
    * std follows the repo's sqrt-at-6 convention. JPEG/PCM/video
    * payloads remain behind the documented stub (their entropy coders
    * need a codec library PNG doesn't).
    */
  private def qPngDecode(s: SparkSession, dir: String): DataFrame = {
    import graft.multimodal.Binary
    doc(s, dir).where(col("doc_id") < 60).select(col("doc_id"))
      .withColumn("png", Binary.synthPngCol(col("doc_id")))
      .select(col("doc_id"),
        explode(Binary.pngChannelStatsCol(col("png"))).as("st"))
      .select(col("doc_id"),
        col("st._1").cast("long").as("channel"),
        col("st._2").as("n_px"),
        col("st._3").as("sum_px"),
        round(col("st._4"), 6).as("mean_px"),
        round(col("st._5"), 6).as("std_px"))
      .orderBy("doc_id", "channel")
  }

  /** MM-PCM — REAL WAV PCM decode, dependency-free (closes the sample
    * half of the multimodal boundary for WAV): deterministic PCM WAVs
    * are built per doc_id by [[graft.multimodal.Binary.synthWavPcm]]
    * (real RIFF layout with an ancillary LIST chunk so chunk-skipping
    * executes), then fully decoded back — word-aligned chunk walk, fmt
    * validation, int16 LE sample decode — and reduced to per-channel
    * sample statistics. Integer anchors (n_samp, sum_s, sum_sq,
    * peak_abs) are exact longs; mean/RMS follow the repo's
    * round-at-6 / sqrt-at-6 conventions. The oracle recomputes every
    * sample from the closed-form formula in exact integer arithmetic —
    * one wrong byte in the RIFF walk breaks sum_sq. Compressed audio
    * (FLAC/MP3) stays behind the documented stub.
    */
  private def qWavDecode(s: SparkSession, dir: String): DataFrame = {
    import graft.multimodal.Binary
    doc(s, dir).where(col("doc_id") < 80).select(col("doc_id"))
      .withColumn("wav", Binary.synthWavPcmCol(col("doc_id")))
      .select(col("doc_id"),
        explode(Binary.wavChannelStatsCol(col("wav"))).as("st"))
      .select(col("doc_id"),
        col("st._1").cast("long").as("channel"),
        col("st._2").as("n_samp"),
        col("st._3").as("sum_s"),
        col("st._4").as("sum_sq"),
        col("st._5").as("peak_abs"),
        round(col("st._3").cast("double") / col("st._2"), 6).as("mean_s"),
        round(sqrt(col("st._4").cast("double") / col("st._2")), 6).as("rms_s"))
      .orderBy("doc_id", "channel")
  }

  /** MM-GIF — REAL GIF pixel decode, dependency-free (closes the pixel
    * half of the multimodal boundary for GIF): deterministic 16-color
    * GIFs are built per doc_id by [[graft.multimodal.Binary.synthGif]]
    * (real LZW compression, sub-block framing, a graphic-control
    * extension so the skip path executes), then fully decoded back —
    * screen descriptor, global color table, extension skip, LZW decode
    * with the cScSc case and code-width growth — and reduced through
    * the palette to per-channel pixel statistics. The oracle
    * recomputes the palette→pixel formula in exact integer arithmetic:
    * a single wrong index anywhere in the LZW dictionary machinery
    * breaks sum_px and hash-mismatches the row.
    */
  private def qGifDecode(s: SparkSession, dir: String): DataFrame = {
    import graft.multimodal.Binary
    doc(s, dir).where(col("doc_id") < 60).select(col("doc_id"))
      .withColumn("gif", Binary.synthGifCol(col("doc_id")))
      .select(col("doc_id"),
        explode(Binary.gifChannelStatsCol(col("gif"))).as("st"))
      .select(col("doc_id"),
        col("st._1").cast("long").as("channel"),
        col("st._2").as("n_px"),
        col("st._3").as("sum_px"),
        round(col("st._4"), 6).as("mean_px"),
        round(col("st._5"), 6).as("std_px"))
      .orderBy("doc_id", "channel")
  }

  /** MM-JPG — REAL baseline JPEG entropy decode (DC-exact profile):
    * deterministic DC-only grayscale JPEGs are built per doc_id by
    * [[graft.multimodal.Binary.synthJpeg]] (real Annex-K Huffman
    * tables in DHT, category+EXTEND coding of the DC diff chain, EOB
    * per block, 0xFF stuffing), then fully decoded back — marker walk,
    * DHT canonical-code reconstruction, entropy decode, dequant, exact
    * integer IDCT for flat blocks — and reduced to luma statistics.
    * Because each block codes the DIFFERENCE from its predecessor, one
    * wrong Huffman bit corrupts every later block: sum_px is a
    * whole-stream integrity check the oracle recomputes from the
    * closed-form clamp(dc·2+128) block values. General AC blocks run a
    * float IDCT (tested in spec, not oracle-checked — lossy math).
    */
  private def qJpegDecode(s: SparkSession, dir: String): DataFrame = {
    import graft.multimodal.Binary
    doc(s, dir).where(col("doc_id") < 60).select(col("doc_id"))
      .withColumn("jpg", Binary.synthJpegCol(col("doc_id")))
      .select(col("doc_id"), Binary.jpegLumaStatsCol(col("jpg")).as("st"))
      .select(col("doc_id"),
        col("st._1").as("n_px"),
        col("st._2").as("sum_px"),
        round(col("st._3"), 6).as("mean_px"),
        round(col("st._4"), 6).as("std_px"))
      .orderBy("doc_id")
  }

  /** S9 — JSON round-trip surface: a JSONL corpus is the standard
    * training-data interchange format, and the engine must serialize
    * and re-parse it without loss. Each document becomes a nested JSON
    * payload via `to_json(struct(...))` — including a `note` field
    * deliberately stuffed with quote/newline/tab/backslash characters
    * to exercise the escaper — then `from_json` parses it back against
    * an explicit schema, and an in-query audit counts field-exact
    * round-trips (id, nested meta, array length, long field): the
    * oracle pins `json_ok` TRUE and recomputes the aggregates from the
    * base columns, so any serialization loss flips the row. Both
    * directions are codegen'd Catalyst expressions (JacksonGenerator/
    * JacksonParser), not UDFs — per-row map work at any scale.
    */
  private def qJsonRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val d = par(doc(s, dir))
      .select(col("doc_id"), col("lang"), col("source"), col("text"),
        col("n_chars"))
      .withColumn("quoted", concat(lit("\""), col("lang"), lit("\n\t"),
        col("source"), lit("\\end\"")))
    val payload = d.withColumn("payload", to_json(struct(
      col("doc_id").as("id"),
      struct(col("lang").as("lang"), col("quoted").as("note")).as("meta"),
      split(col("text"), " ").as("words"),
      col("n_chars").as("nc"))))
    val sch = StructType(Seq(
      StructField("id", LongType),
      StructField("meta", StructType(Seq(
        StructField("lang", StringType), StructField("note", StringType)))),
      StructField("words", ArrayType(StringType)),
      StructField("nc", LongType)))
    val p = payload.withColumn("r", from_json(col("payload"), sch))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q235", p)
    val a = p.agg(
      count(when(col("r.id") === col("doc_id") &&
        col("r.meta.lang") === col("lang") &&
        col("r.meta.note") === col("quoted") &&
        col("r.nc") === col("n_chars") &&
        size(col("r.words")) === size(split(col("text"), " ")), 1)).as("ok"),
      count(lit(1)).as("n")).head()
    val jsonOk = a.getLong(0) == a.getLong(1)
    p.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("r.words")).cast("long")).as("sum_words"),
        sum(col("r.nc")).as("sum_chars"))
      .withColumn("json_ok", lit(jsonOk))
      .orderBy("source")
  }

  /** D18 — winnowing substring fingerprints (MOSS): the
    * guarantee-carrying local fingerprint scheme — any shared run of
    * ≥ w+k−1 tokens yields a shared fingerprint (details and scale
    * shape in [[graft.dedup.Winnowing]]). Emits the top shared-
    * fingerprint document pairs plus corpus totals; the oracle replays
    * gram hashing, the per-document window-min selection, and the
    * inverted-index pair join end-to-end.
    */
  private def qWinnowing(s: SparkSession, dir: String): DataFrame = {
    val d = par(doc(s, dir))
    val fp = graft.dedup.Winnowing.fingerprints(d, "doc_id", "text",
        k = 4, w = 4)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q236", fp)
    val st = fp.agg(countDistinct(col("doc_id")).as("corpus_docs"),
      count(lit(1)).as("corpus_fps"))
    val pairs = fp.as("x").join(fp.as("y"),
        col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("shared_fps"))
    pairs.crossJoin(st) // 1-row aggregate: broadcast, not a pair blowup
      .orderBy(desc("shared_fps"), asc("a"), asc("b"))
      .limit(15)
  }

  /** J5 — blocking QUALITY report (Christen's record-linkage metrics):
    * reduction ratio and pair completeness of the q129 prefix-blocking
    * scheme, measured against exact all-pairs edit-distance ground
    * truth on a deterministic eval subset (c_custkey &lt; 1500 — an
    * ABSOLUTE cap, so the labeled baseline costs the same at every
    * corpus scale, exactly how production ER evaluation samples its
    * truth set; the operator under test, the blocked join, stays
    * linear in the full corpus). ONE all-pairs pass computes distance
    * and block agreement together — truth, candidates, and
    * blocked-found counts come from the same levenshtein evaluation.
    * Every metric is an exact scaled integer; the oracle replays
    * subset → truth → candidates → blocked matches end-to-end (DuckDB
    * `levenshtein` ≡ Spark's, q129-established).
    */
  private def qBlockingQuality(s: SparkSession, dir: String): DataFrame = {
    val c = par(Tables.load(s, dir, "customer")
        .where(col("c_custkey") < 1500))
      .select(col("c_custkey").as("id"), col("c_name").as("name"),
        substring(col("c_name"), 1, 16).as("blk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q237", c)
    val m = c.count()
    val a = c.as("x").crossJoin(c.as("y")) // labeled all-pairs baseline
      .where(col("x.id") < col("y.id"))
      .select((levenshtein(col("x.name"), col("y.name")) <= 1).as("is_match"),
        (col("x.blk") === col("y.blk")).as("same_blk"))
      .agg(count(when(col("is_match"), 1)).as("n_truth"),
        count(when(col("same_blk"), 1)).as("n_cand"),
        count(when(col("is_match") && col("same_blk"), 1)).as("n_found"))
      .head()
    val (nTruth, nCand, nFound) = (a.getLong(0), a.getLong(1), a.getLong(2))
    val nAll = m * (m - 1) / 2
    import s.implicits._
    Seq((m, nAll, nTruth, nCand, nFound,
        1000000L - (if (nAll > 0) nCand * 1000000L / nAll else 0L),
        if (nTruth > 0) nFound * 1000000L / nTruth else 1000000L))
      .toDF("n_eval", "n_allpairs", "n_truth", "n_candidates", "n_found",
        "reduction_e6", "completeness_e6")
  }

  /** T31 — compression-ratio quality signal (deflate bytes per char,
    * the Gopher/Dolma "too compressible = boilerplate" filter; module
    * rationale in [[graft.text.Compress]]). zlib byte counts are not
    * engine-mirrorable, so the registered query is a self-verifying
    * audit (the q190 pattern): the oracle pins per-source doc counts
    * plus three structural invariants that only hold if the
    * measurement is real zlib output — ratios bounded by the
    * stored-block worst case, text||text costing ≤ 64 bytes over text
    * (the whole second copy is back-references), and repetition
    * compressing strictly better than reversed-novelty at corpus
    * level. Per-doc ratios remain available to library users via
    * `Compress.withCompressionRatio`.
    */
  private def qCompressionSignal(s: SparkSession, dir: String): DataFrame = {
    import graft.text.Compress
    val d = par(doc(s, dir)).select(col("doc_id"), col("source"), col("text"))
      .withColumn("raw_len", length(col("text")).cast("long"))
      .withColumn("c_len", Compress.deflatedLenCol(col("text")).cast("long"))
      .withColumn("c_dup",
        Compress.deflatedLenCol(concat(col("text"), col("text"))).cast("long"))
      .withColumn("c_rev",
        Compress.deflatedLenCol(concat(col("text"), reverse(col("text")))).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q238", d)
    val a = d.agg(
      count(when(col("c_len") > 0 &&
        col("c_len") <= col("raw_len") + col("raw_len") / 1000 + 64, 1)).as("nb"),
      count(when(col("c_dup") <= col("c_len") + 64, 1)).as("nd"),
      sum(col("c_dup")).as("sd"), sum(col("c_rev")).as("sr"),
      count(lit(1)).as("n")).head()
    val boundedOk = a.getLong(0) == a.getLong(4)
    val dupOk = a.getLong(1) == a.getLong(4)
    val repBeatsNovel = a.getLong(2) < a.getLong(3)
    d.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .withColumn("ratio_bounded", lit(boundedOk))
      .withColumn("dup_compresses", lit(dupOk))
      .withColumn("repetition_beats_novelty", lit(repBeatsNovel))
      .orderBy("source")
  }

  /** A24 — Local Outlier Factor (density-ratio anomaly score; math
    * and engine-parity discipline in [[graft.sim.Lof]]): the LOCAL
    * complement to the engine's global anomaly family (IF q35, AE
    * q36/q53, Mahalanobis q132, HBOS q136). Eval subset vec_id < 250
    * keeps the labeled all-pairs kNN baseline bounded (the 100 TB path
    * feeds the same math from IVF/LSH candidates); every derived
    * quantity is micro-unit integer so the oracle replays kNN →
    * k-distance → reachability → lrd → LOF bitwise.
    */
  private def qLof(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "embeddings").where(col("vec_id") < 250)
    graft.sim.Lof.scores(e, "vec_id", "embedding", k = 5)
      .select(col("id"), col("k_dist_micro"), col("lrd_micro"),
        round(col("lof"), 6).as("lof"))
      .orderBy(desc("lof"), asc("id")).limit(10)
  }

  /** A25 — grid-blocked exact DBSCAN (cell completeness + scale story
    * in [[graft.sim.Dbscan]]): density clustering with a noise class
    * over a closed-form 2-D fixture — three planted 1×1 blobs 10
    * units apart plus a sparse noise field, integer centi-unit
    * coordinates so every distance predicate is exact. The oracle
    * recomputes the SAME clustering from the O(n²) pair join (the
    * grid is a complete candidate set, so both must agree exactly) and
    * replays core/border/noise roles and min-id component labels.
    */
  private def qDbscan(s: SparkSession, dir: String): DataFrame = {
    val pts = doc(s, dir).where(col("doc_id") < 400)
      .select(col("doc_id").as("id"))
      .withColumn("x", when(col("id") % 4 < 3,
          (col("id") % 4) * 1000 + (col("id") * 7) % 100)
        .otherwise(lit(3000) + (col("id") * 31) % 3000))
      .withColumn("y", when(col("id") % 4 < 3,
          (col("id") % 4) * 1000 + (col("id") * 13) % 100)
        .otherwise((col("id") * 37) % 3000))
    val labeled = graft.sim.Dbscan.cluster(pts, "id", "x", "y",
      epsCenti = 50L, minPts = 5)
    val st = labeled.agg(
      count(when(col("role") === "noise", 1)).as("n_noise"),
      count(lit(1)).as("n_points"))
    labeled.where(col("role") =!= "noise")
      .groupBy("cluster")
      .agg(count(when(col("role") === "core", 1)).as("n_core"),
        count(when(col("role") === "border", 1)).as("n_border"))
      .crossJoin(st) // 1-row aggregate
      .orderBy("cluster")
  }

  /** D19 — LSH dedup QUALITY evaluation (the q237 blocking-metrics
    * story applied to the MinHash family): pair completeness and
    * precision of the banded 16×4 candidate generation vs exact
    * Jaccard ≥ 0.5 ground truth — the measurement that justifies
    * trusting LSH dedup unmodified at corpus scale. Both sides are
    * inverted-index equi-joins (truth via shared-shingle join, not
    * all-pairs), so the eval itself is corpus-scalable; the oracle
    * replays shingles → exact Jaccard AND signatures → bands →
    * candidates end-to-end with the same hash family.
    */
  private def qLshQuality(s: SparkSession, dir: String): DataFrame = {
    val d = par(doc(s, dir))
    val truth = graft.dedup.Dedup.jaccardPairs(d, "doc_id", "text",
        n = 3, threshold = 0.5)
      .select(col("a"), col("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q241", truth)
    val cand = graft.dedup.MinHashLSH.candidatePairs(d, "doc_id", "text",
        n = 3, k = 16, bands = 4)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q241", cand)
    val nTruth = truth.count()
    val nCand = cand.count()
    val nFound = cand.join(truth, Seq("a", "b"), "left_semi").count()
    import s.implicits._
    Seq((nTruth, nCand, nFound,
        if (nTruth > 0) nFound * 1000000L / nTruth else 1000000L,
        if (nCand > 0) nFound * 1000000L / nCand else 0L))
      .toDF("n_truth", "n_candidates", "n_found",
        "completeness_e6", "precision_e6")
  }

  /** G1 — differentially-private-style noisy count release with
    * DETERMINISTIC Laplace noise: per (source, lang) group, count +
    * Laplace(1/ε) noise drawn by inverse CDF from the engine's
    * hash-uniform (`Sampling.keyBucket` over the group-name hash — the
    * same u the weighted sampler races on), plus k-anonymity-style
    * suppression of groups below 5. Real DP would draw fresh
    * randomness per release; the deterministic draw is what makes the
    * mechanism TESTABLE (the oracle replays hash → uniform → inverse
    * CDF exactly; ln rounds at 6 per the q96 transcendental rule).
    * One map-side-combined aggregate; noise is per-GROUP map work.
    */
  private def qDpRelease(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    val eps = 0.5
    val g = doc(s, dir).groupBy("source", "lang")
      .agg(count(lit(1)).as("n"))
      .withColumn("u",
        (graft.aug.Sampling.keyBucket(
          TextOps.strHash(concat_ws("|", col("source"), col("lang"))),
          seed = 271L).cast("double") + lit(0.5)) / lit(1000000.0))
      .withColumn("noise", round(
        lit(-1.0 / eps) * signum(col("u") - lit(0.5)) *
          log(lit(1.0) - lit(2.0) * abs(col("u") - lit(0.5))), 6))
      .withColumn("suppressed", col("n") < 5)
      .withColumn("noisy_count",
        when(col("suppressed"), lit(null).cast("double"))
          .otherwise(round(col("n") + col("noise"), 6)))
    g.select(col("source"), col("lang"), col("suppressed"),
        col("noisy_count"))
      .orderBy("source", "lang")
  }

  /** D20 — dup-cluster SURVIVORSHIP (canonical record selection): the
    * step after dedup detection — each near-dup cluster (connected
    * components over exact Jaccard ≥ 0.5 pairs, the q47/q222
    * machinery) keeps its best member by lexical-diversity score
    * (u·10⁶ div n_tok, the q223 integer-exact density), ties to the
    * smallest doc_id via one packed integer argmax key (score·2³³ −
    * doc_id — deterministic, no argmax ambiguity). Emits per-cluster
    * keep/drop accounting; the oracle replays components, scoring,
    * and the packed argmax end-to-end.
    */
  private def qSurvivorship(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    val d = par(doc(s, dir))
    val pairs = graft.dedup.Dedup.jaccardPairs(d, "doc_id", "text",
      n = 3, threshold = 0.5)
    val comp = graft.dedup.Components.connectedComponents(pairs, "a", "b")
      .withColumnRenamed("id", "doc_id")
    val toks = TextOps.tokens(col("text"))
    val scored = d.select(col("doc_id"),
        size(toks).cast("long").as("n_tok"),
        size(array_distinct(toks)).cast("long").as("u"))
      .where(col("n_tok") > 0)
      .withColumn("score", expr("u * 1000000 div n_tok"))
      .withColumn("pick", col("score") * lit(8589934592L) - col("doc_id"))
    val rooted = scored.join(comp, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("component"), col("doc_id")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q243", rooted)
    val best = rooted.groupBy("cluster").agg(
      count(lit(1)).as("n_members"),
      sum("n_tok").as("total_tokens"),
      max("pick").as("best_pick"))
    best.where(col("n_members") >= 2)
      .join(rooted.select(col("cluster"), col("pick").as("best_pick"),
        col("doc_id").as("canonical_doc"), col("n_tok").as("kept_tokens")),
        Seq("cluster", "best_pick"))
      .select(col("cluster"), col("n_members"), col("canonical_doc"),
        col("kept_tokens"),
        (col("total_tokens") - col("kept_tokens")).as("dropped_tokens"))
      .orderBy("cluster")
  }

  /** SK5 — KMV (k-minimum-values / theta-style) set sketches with
    * SET OPERATIONS: where HLL (q191) only unions, KMV estimates
    * INTERSECTION too — k smallest value-hashes per set, estimate
    * (k−1)·P/h₍k₎, Jaccard from the merged k-set (Beyer et al.,
    * SIGMOD 2007). Fully deterministic (same hash family as MinHash),
    * so unlike randomized sketches this one gets a FULL value oracle:
    * exact cardinalities AND estimates are both replayed. Per-set
    * k-smallest runs as a vocab-bound partitioned window; the merged
    * top-k is a distributed TakeOrdered. Sets: the distinct token
    * vocabularies of the even/odd document halves.
    */
  private def qKmvSets(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    import org.apache.spark.sql.expressions.Window
    val k = 128
    val P = 1000000007L
    // set elements: distinct 3-gram shingles of the even/odd halves
    // (the token vocabulary is only ~31 words on this corpus; shingles
    // are the cardinality the sketch exists for)
    val tok = par(doc(s, dir))
      .select((col("doc_id") % 2).as("half"),
        explode(graft.dedup.Dedup.shingles(col("text"), 3)).as("w"))
      .distinct()
      .withColumn("h", TextOps.strHash(col("w")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q244", tok)
    // per-half k smallest hashes: two shingle-vocab-sized partitions
    // (bounded by vocabulary, not corpus — the BPE-trainer class)
    val kth = tok.withColumn("rk", row_number().over(
        Window.partitionBy("half").orderBy(asc("h"), asc("w"))))
      .where(col("rk") === k)
      .select(col("half"), col("h").as("hk"))
    // merged k-set over the union vocabulary: distributed top-k
    val membership = tok.groupBy("w", "h")
      .agg(max(when(col("half") === 0, 1).otherwise(0)).as("in_a"),
        max(when(col("half") === 1, 1).otherwise(0)).as("in_b"))
    val mergedK = membership.orderBy(asc("h"), asc("w")).limit(k)
    val mk = mergedK.agg(max("h").as("hu"),
      sum(when(col("in_a") === 1 && col("in_b") === 1, 1L).otherwise(0L))
        .as("n_both")).head()
    val (hu, nBoth) = (mk.getLong(0), mk.getLong(1))
    val exact = tok.agg(
      countDistinct(when(col("half") === 0, col("w"))).as("ea"),
      countDistinct(when(col("half") === 1, col("w"))).as("eb"),
      countDistinct(col("w")).as("eu")).head()
    val kths = kth.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    import s.implicits._
    Seq((k.toLong, exact.getLong(0), exact.getLong(1), exact.getLong(2),
        exact.getLong(0) + exact.getLong(1) - exact.getLong(2),
        kths(0L), kths(1L), hu, nBoth))
      .toDF("k", "exact_a", "exact_b", "exact_union", "exact_inter",
        "hk_a", "hk_b", "hk_u", "n_both")
      // estimates derived in-plan so rounding is Spark's round(), the
      // exact convention the oracle mirrors with DuckDB round()
      .select(col("k"), col("exact_a"), col("exact_b"),
        col("exact_union"), col("exact_inter"),
        round(lit((k - 1).toDouble * P) / col("hk_a"), 6).as("est_a"),
        round(lit((k - 1).toDouble * P) / col("hk_b"), 6).as("est_b"),
        round(lit((k - 1).toDouble * P) / col("hk_u"), 6).as("est_union"),
        round(col("n_both").cast("double") / lit(k.toDouble) *
          (lit((k - 1).toDouble * P) / col("hk_u")), 6).as("est_inter"))
  }

  /** A26 — Weight-of-Evidence encoding + Information Value (the credit
    * -scoring standard for categorical predictive power): per segment,
    * WoE = ln(((good+0.5)·B)/((bad+0.5)·G)) (0.5 Laplace adjustment so
    * empty cells stay finite), IV = Σ (gᵢ/G − bᵢ/B)·WoEᵢ. "Bad" =
    * order status F on the customer's segment. ln rounds at 6 (the
    * transcendental rule) and IV accumulates 6-dp terms through the
    * exact decimal sum, so the whole thing value-oracles. One
    * broadcast dim join + one map-side-combined aggregate.
    */
  private def qWoe(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    val c = Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val seg = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(when(col("o_orderstatus") =!= "F", 1)).as("n_good"),
        count(when(col("o_orderstatus") === "F", 1)).as("n_bad"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q245", seg)
    val t = seg.agg(sum("n_good"), sum("n_bad")).head()
    val (g, b) = (t.getLong(0), t.getLong(1))
    val woe = round(log(((col("n_good") + lit(0.5)) * lit(b.toDouble)) /
      ((col("n_bad") + lit(0.5)) * lit(g.toDouble))), 6)
    val scored = seg.withColumn("woe", woe)
      .withColumn("term", round(
        (col("n_good") / lit(g.toDouble) - col("n_bad") / lit(b.toDouble)) *
          col("woe"), 6))
    val iv = scored.agg(Stats.dsum(col("term")).as("iv")).head().getDouble(0)
    scored.select(col("segment"), col("n_good"), col("n_bad"), col("woe"))
      .withColumn("iv", round(lit(iv), 6))
      .orderBy("segment")
  }

  /** G6 — k-core decomposition (R-round peeling) of the q156 brand
    * co-occurrence graph: repeatedly drop vertices with in-survivor
    * degree &lt; 3. Spam/bot rings and boilerplate hubs live in dense
    * cores; peeling is the standard scale algorithm (each round one
    * equi-join + grouped count — no global state). Both engines run
    * exactly R=8 rounds and report `fixpoint_reached` (round 8 ==
    * round 7) — TRUE here, making the fixed-R answer THE k-core; the
    * oracle replays all 8 rounds as chained CTEs.
    */
  private def qKCore(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(s, dir, "part").select(col("p_partkey"), col("p_brand"))
    val ob = li(s, dir).select(col("l_orderkey"), col("l_partkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("ok"), col("p_brand").as("b"))
      .distinct()
    val e = ob.toDF("ok", "b1")
      .join(ob.toDF("ok2", "b2"), col("ok") === col("ok2") && col("b1") < col("b2"))
      .groupBy("b1", "b2").agg(count(lit(1)).as("np"))
      .where(col("np") >= 5).select("b1", "b2")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q246", e)
    val ed = e.select(col("b1").as("src"), col("b2").as("dst"))
      .union(e.select(col("b2").as("src"), col("b1").as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q246", ed)
    val kk = 3
    var surv = ed.select(col("src").as("v")).distinct()
    var prevCount = -1L
    var lastCount = -2L
    (1 to 8).foreach { _ =>
      prevCount = lastCount
      val sv = surv
      surv = graft.core.Caches.checkpointOnce("entry.q246", ed
        .join(sv.withColumnRenamed("v", "src"), "src")
        .join(sv.withColumnRenamed("v", "dst"), "dst")
        .groupBy(col("src").as("v")).agg(count(lit(1)).as("dg"))
        .where(col("dg") >= kk).select("v"))
      lastCount = surv.count()
    }
    val fix = lastCount == prevCount
    val coreDeg = ed
      .join(surv.withColumnRenamed("v", "src"), "src")
      .join(surv.withColumnRenamed("v", "dst"), "dst")
      .groupBy(col("src").as("brand")).agg(count(lit(1)).as("core_degree"))
    coreDeg.withColumn("k", lit(kk.toLong))
      .withColumn("fixpoint_reached", lit(fix))
      .select(col("brand"), col("k"), col("core_degree"),
        col("fixpoint_reached"))
      .orderBy("brand")
  }

  /** A27 — association RULES over the brand co-occurrence incidence
    * (the step after q144's raw pair counts): directed X→Y with
    * support, confidence = n(X,Y)/n(X), lift = n(X,Y)·N/(n(X)·n(Y)) —
    * all exact scaled integers (zero rounding classes). The pair stage
    * is the order-incidence self-join (bucket-confined by order);
    * marginals broadcast. Top-15 by lift with a total (lift, X, Y)
    * order, distributed TakeOrdered.
    */
  private def qAssocRules(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(s, dir, "part").select(col("p_partkey"), col("p_brand"))
    val ob = li(s, dir).select(col("l_orderkey"), col("l_partkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("ok"), col("p_brand").as("b"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q247", ob)
    val nOrders = ob.select("ok").distinct().count()
    val supp = ob.groupBy("b").agg(count(lit(1)).as("nb"))
    val pair = ob.toDF("ok", "x")
      .join(ob.toDF("ok2", "y"), col("ok") === col("ok2") && col("x") =!= col("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("nxy"))
      .where(col("nxy") >= 5)
    pair
      .join(supp.withColumnRenamed("b", "x").withColumnRenamed("nb", "nx"), "x")
      .join(supp.withColumnRenamed("b", "y").withColumnRenamed("nb", "ny"), "y")
      .withColumn("confidence_e6", expr("nxy * 1000000 div nx"))
      .withColumn("lift_e6", expr(s"nxy * $nOrders * 1000000 div (nx * ny)"))
      .select(col("x").as("antecedent"), col("y").as("consequent"),
        col("nxy").as("support"), col("confidence_e6"), col("lift_e6"))
      .orderBy(desc("lift_e6"), col("antecedent"), col("consequent"))
      .limit(15)
  }

  /** A28 — rank-aggregated OUTLIER ENSEMBLE: three mirrorable robust
    * scores on the same column (|z|, the 0.6745-scaled MAD score, IQR
    * exceedance) are each converted to average ranks via the two-phase
    * prefix-scan ranker ([[graft.core.Rank.avgRank]] — no global
    * window), and the consensus is the mean rank: the standard
    * rank-aggregation trick that makes incommensurable score scales
    * combinable (and what production outlier ensembles do with
    * IF/LOF/AE members — those live in q35/q239/q36; this query keeps
    * the ensemble fully value-oracled by using SQL-mirrorable
    * members). Exact decimal moments + exact-selection quantiles; the
    * oracle replays scores → tie-corrected ranks → consensus.
    */
  private def qOutlierEnsemble(s: SparkSession, dir: String): DataFrame = {
    val base = par(li(s, dir)).select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").cast("double").as("x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q248", base)
    val stRow = base.agg(Stats.dmean(col("x")).as("mu"),
      Stats.dstddevSamp(col("x")).as("sd")).head()
    val (mu, sd) = (stRow.getDouble(0), stRow.getDouble(1))
    val qs = graft.core.OrderStats.quantilesOf(base, "x", Seq(0.25, 0.5, 0.75))
    val (q1v, medv, q3v) = (qs(0), qs(1), qs(2))
    val dev = base.withColumn("d", abs(col("x") - lit(medv)))
    val madv = graft.core.OrderStats.quantilesOf(dev, "d", Seq(0.5)).head
    val scored = base
      .withColumn("s1", abs((col("x") - lit(mu)) / lit(sd)))
      .withColumn("s2", abs(lit(0.6745) * (col("x") - lit(medv)) / lit(madv)))
      .withColumn("s3", greatest(lit(0.0), col("x") - lit(q3v),
        lit(q1v) - col("x")) / (lit(q3v) - lit(q1v)))
    val ranked = graft.core.Rank.avgRank(
      graft.core.Rank.avgRank(
        graft.core.Rank.avgRank(scored, "s1", "r1", "entry.q248.r1"),
        "s2", "r2", "entry.q248.r2"),
      "s3", "r3", "entry.q248.r3")
    ranked
      .withColumn("consensus",
        round((col("r1") + col("r2") + col("r3")) / lit(3.0), 6))
      .select(col("l_orderkey"), col("l_linenumber"), col("consensus"),
        round(col("s1"), 6).as("z_score"),
        round(col("s2"), 6).as("mad_score"),
        round(col("s3"), 6).as("iqr_score"))
      .orderBy(desc("consensus"), col("l_orderkey"), col("l_linenumber"))
      .limit(15)
  }

  /** D21 — composed curation pipeline v2, the session-2 capstone
    * (q102's sibling built from the NEW operators): winnowing
    * substring fingerprints (q236) → near-dup graph (pairs sharing ≥ 2
    * fingerprints) → connected components → survivorship (q243's
    * packed argmax keeps the most diverse member per cluster) →
    * cluster-safe split (q222's root-hash rule: every cluster member,
    * kept or dropped, lands in the canonical root's split). One oracle
    * replays the whole composition end-to-end — fingerprints,
    * window-min, pair join, components, scoring, argmax, split hash —
    * so a regression anywhere in five operators breaks this row.
    */
  private def qCurationV2(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    val d = par(doc(s, dir))
    val fp = graft.dedup.Winnowing.fingerprints(d, "doc_id", "text",
        k = 4, w = 4)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q249", fp)
    val edges = fp.as("x").join(fp.as("y"),
        col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("nshared"))
      .where(col("nshared") >= 2)
      .select("a", "b")
    val comp = graft.dedup.Components.connectedComponents(edges, "a", "b")
      .withColumnRenamed("id", "doc_id")
    val toks = TextOps.tokens(col("text"))
    val scored = d.select(col("doc_id"),
        size(toks).cast("long").as("n_tok"),
        size(array_distinct(toks)).cast("long").as("u"))
      .where(col("n_tok") > 0)
      .withColumn("score", expr("u * 1000000 div n_tok"))
      .withColumn("pick", col("score") * lit(8589934592L) - col("doc_id"))
    val rooted = scored.join(comp, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("component"), col("doc_id")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q249", rooted)
    val best = rooted.groupBy("cluster").agg(max("pick").as("best_pick"))
    val labeled = rooted.join(best, "cluster")
      .withColumn("kept", col("pick") === col("best_pick"))
    val split = graft.aug.Sampling.splitAssign(labeled, "cluster",
      Seq("train" -> 0.9, "test" -> 0.1))
    split.groupBy("split")
      .agg(count(when(col("kept"), 1)).as("n_docs_kept"),
        count(when(!col("kept"), 1)).as("n_docs_dropped"),
        sum(when(col("kept"), col("n_tok")).otherwise(0L)).as("tokens_kept"),
        sum(when(!col("kept"), col("n_tok")).otherwise(0L)).as("tokens_dropped"))
      .orderBy("split")
  }

  /** V9 — FILTERED vector search measurement: top-k under a metadata
    * predicate is the production vector-DB problem (pre-filter = exact
    * top-k over the predicate subset; post-filter = over-fetch the
    * global top-k′ and filter, the cheap path every ANN index offers).
    * This query MEASURES the recall cost of post-filtering at k′ = 4k
    * under a 25%-selective predicate — the number that tells a user
    * when the cheap path is safe. Both paths and the recall join are
    * replayed exactly by the oracle (bitwise cosines via the fixed-
    * order fold, per-query partitioned windows, id tie-breaks).
    */
  private def qFilteredAnn(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.sim.VectorMath
    val e = Tables.load(s, dir, "embeddings")
      .select(col("vec_id").cast("long").as("id"), col("embedding").as("vec"),
        col("label"))
      .withColumn("n2", VectorMath.norm2(col("vec")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q250", e)
    val pairs = e.as("q").where(col("q.id") < 50)
      .join(e.as("t"), col("q.id") =!= col("t.id"))
      .select(col("q.id").as("qid"), col("t.id").as("tid"),
        (col("t.label") % 4 === 1).as("ok"),
        (VectorMath.dot(col("q.vec"), col("t.vec")) /
          (sqrt(col("q.n2")) * sqrt(col("t.n2")))).as("cos"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q250", pairs)
    val wq = Window.partitionBy("qid").orderBy(desc("cos"), asc("tid"))
    val exact = pairs.where(col("ok"))
      .withColumn("rk", row_number().over(wq)).where(col("rk") <= 3)
      .select(col("qid"), col("tid"))
    val post = pairs.withColumn("gr", row_number().over(wq))
      .where(col("gr") <= 12).where(col("ok"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(asc("gr"))))
      .where(col("rk") <= 3)
      .select(col("qid"), col("tid"))
    val m = exact.join(post, Seq("qid", "tid"), "left_semi")
      .groupBy("qid").agg(count(lit(1)).as("matched"))
    val per = exact.groupBy("qid").agg(count(lit(1)).as("n_exact"))
      .join(m, Seq("qid"), "left")
      .withColumn("matched", coalesce(col("matched"), lit(0L)))
    per.agg(count(lit(1)).as("n_queries"),
        sum("n_exact").as("sum_exact"),
        sum("matched").as("sum_matched"),
        count(when(col("matched") < col("n_exact"), 1)).as("n_degraded"))
      .withColumn("recall_e6",
        expr("sum_matched * 1000000 div sum_exact"))
  }

  /** V10 — intrinsic-dimension estimate by the Two-NN method (Facco
    * et al., Scientific Reports 2017): d ≈ 1/mean(ln(r₂/r₁)) over each
    * point's two nearest neighbors — the standard measurement of how
    * much of an embedding space's nominal dimensionality is actually
    * used (collapsed representations ⇒ low d̂; d̂ drives PQ/IVF sizing
    * decisions). Exact 2-NN on the eval subset (labeled baseline, the
    * q29 pattern); ln terms round at 6 and accumulate through the
    * exact decimal sum; zero-distance pairs (exact dups) are excluded
    * and counted. Fully value-oracled.
    */
  private def qIntrinsicDim(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.sim.VectorMath
    val v = Tables.load(s, dir, "embeddings").where(col("vec_id") < 300)
      .select(col("vec_id").cast("long").as("id"), col("embedding").as("vec"))
      .withColumn("n2", VectorMath.norm2(col("vec")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q251", v)
    val nn = v.as("x").join(v.as("y"), col("x.id") =!= col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        (lit(1.0) - VectorMath.dot(col("x.vec"), col("y.vec")) /
          (sqrt(col("x.n2")) * sqrt(col("y.n2")))).as("dist"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("a").orderBy(asc("dist"), asc("b"))))
      .where(col("rk") <= 2)
    val rr = nn.groupBy("a").agg(
        min(when(col("rk") === 1, col("dist"))).as("r1"),
        min(when(col("rk") === 2, col("dist"))).as("r2"))
    val terms = rr
      .withColumn("usable", col("r1") > 0)
      .withColumn("t", when(col("usable"), round(log(col("r2") / col("r1")), 6)))
    terms.agg(count(when(col("usable"), 1)).as("n_used"),
        count(when(!col("usable"), 1)).as("n_excluded"),
        (Stats.dsum(col("t")) /
          count(when(col("usable"), 1)).cast("double")).as("mu_raw"))
      .select(col("n_used"), col("n_excluded"),
        round(col("mu_raw"), 6).as("mu"),
        round(lit(1.0) / col("mu_raw"), 6).as("d_hat"))
  }

  /** V11 — greedy k-center coreset selection (farthest-point
    * traversal, the 2-approximation of the k-center objective): the
    * DIVERSITY-maximizing data-selection step — where q223 selects by
    * per-doc quality, k-center selects points that COVER the embedding
    * space (max-min distance), the standard coreset/active-learning
    * primitive. Deterministic: seeded at the minimum id, ties to the
    * smaller id; each round is one map over the running min-distance
    * column with the new center as a plan literal (the PQ typedlit
    * lesson — never a 64-element expression tree per dimension) + one
    * distributed argmax. Emits (round, center, coverage radius); the
    * oracle replays all 8 rounds as chained MATERIALIZED CTEs.
    */
  private def qKCenter(s: SparkSession, dir: String): DataFrame = {
    import graft.sim.VectorMath
    val v = Tables.load(s, dir, "embeddings").where(col("vec_id") < 200)
      .select(col("vec_id").cast("long").as("id"), col("embedding").as("vec"))
      .withColumn("n2", VectorMath.norm2(col("vec")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q252", v)
    def distTo(cvec: Seq[Float], cn2: Double) =
      lit(1.0) - VectorMath.dot(col("vec"), typedlit(cvec)) /
        (sqrt(col("n2")) * lit(math.sqrt(cn2)))
    var cur = v.withColumn("md", lit(Double.MaxValue))
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
    (1 to 8).foreach { r =>
      val pick =
        if (r == 1) cur.orderBy(asc("id")).limit(1)
        else cur.orderBy(desc("md"), asc("id")).limit(1)
      val row = pick.select(col("id"), col("vec"), col("n2")).head()
      val (cid, cvec, cn2) =
        (row.getLong(0), row.getSeq[Float](1), row.getDouble(2))
      cur = graft.core.Caches.checkpointOnce("entry.q252",
        cur.withColumn("md", least(col("md"), distTo(cvec, cn2))))
      val radius = cur.agg(max("md")).head().getDouble(0)
      out += ((r.toLong, cid, radius))
    }
    import s.implicits._
    out.toSeq.toDF("round", "center_id", "radius_raw")
      .select(col("round"), col("center_id"),
        round(col("radius_raw"), 6).as("coverage_radius"))
      .orderBy("round")
  }

  /** D22 — dedup FUNNEL report: the cumulative stage accounting every
    * production pipeline publishes — exact text dedup, then MinHash-
    * verified near-dup (Jaccard ≥ 0.5) components on the survivors,
    * then winnowing substring overlap (≥ 2 shared fingerprints)
    * components on THOSE survivors; each stage keeps the minimum-id
    * root (keep-first policy, q231's attribution order). Per stage:
    * docs in / removed / out and surviving tokens. The oracle replays
    * the whole three-stage cascade — each stage's input is the
    * previous stage's survivor set, so stage-2/3 counts are
    * order-sensitive and pin the cascade, not just the parts.
    */
  private def qDedupFunnel(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    val d = par(doc(s, dir)).select(col("doc_id"), col("text"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q253", d)
    def stats(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum("n_tok")).head()
      (r.getLong(0), r.getLong(1))
    }
    val (n0, _) = stats(d)
    val surv1 = d.join(
        d.groupBy("text").agg(min("doc_id").as("doc_id")).select("doc_id"),
        Seq("doc_id"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q253", surv1)
    val (n1, t1) = stats(surv1)
    val comp2 = graft.dedup.Components.connectedComponents(
        graft.dedup.Dedup.jaccardPairs(surv1, "doc_id", "text", 3, 0.5),
        "a", "b")
      .withColumnRenamed("id", "doc_id")
    val surv2 = surv1.join(comp2, Seq("doc_id"), "left")
      .where(col("component").isNull || col("component") === col("doc_id"))
      .drop("component")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q253", surv2)
    val (n2, t2) = stats(surv2)
    val fp = graft.dedup.Winnowing.fingerprints(surv2, "doc_id", "text", 4, 4)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q253", fp)
    val pairs3 = fp.as("x").join(fp.as("y"),
        col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("ns")).where(col("ns") >= 2).select("a", "b")
    val comp3 = graft.dedup.Components.connectedComponents(pairs3, "a", "b")
      .withColumnRenamed("id", "doc_id")
    val surv3 = surv2.join(comp3, Seq("doc_id"), "left")
      .where(col("component").isNull || col("component") === col("doc_id"))
    val (n3, t3) = stats(surv3)
    import s.implicits._
    Seq((1L, "exact", n0, n0 - n1, n1, t1),
        (2L, "near_dup", n1, n1 - n2, n2, t2),
        (3L, "substring", n2, n2 - n3, n3, t3))
      .toDF("stage", "name", "n_in", "n_removed", "n_out", "tokens_out")
  }

  /** R6 — EPOCH-AWARE sampling plan: given a 4×-corpus token budget
    * and sqrt-temperature source weights (α = 0.5 — sqrt is correctly-
    * rounded IEEE, identical cross-engine, which is exactly why q92
    * chose it over pow), compute each source's planned tokens and
    * implied epochs, flagging anything over 4 epochs (the Muennighoff
    * et al. repetition knee — data repeated beyond ~4 epochs stops
    * helping). The weight normalizer sums sqrt terms in SOURCE ORDER
    * on both engines (ordered fold ≡ ordered list_reduce). The
    * planning table every budgeted pretraining run starts from.
    */
  private def qEpochPlan(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    val perSource = doc(s, dir).groupBy("source")
      .agg(sum(size(TextOps.tokens(col("text"))).cast("long")).as("tok"))
      .orderBy("source")
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val total = perSource.map(_._2).sum
    val budget = 4L * total
    // ordered fold, exactly mirrored by list_reduce(... ORDER BY source)
    val sw = perSource.map(_._2.toDouble)
      .foldLeft(0.0)((a, n) => a + math.sqrt(n))
    import s.implicits._
    perSource.toSeq.toDF("source", "tokens")
      .withColumn("weight_e6",
        expr(s"CAST(floor(sqrt(CAST(tokens AS DOUBLE)) / $sw * 1000000) AS BIGINT)"))
      .withColumn("planned_tokens",
        expr(s"CAST(floor($budget * sqrt(CAST(tokens AS DOUBLE)) / $sw) AS BIGINT)"))
      .withColumn("epochs_e2", expr("planned_tokens * 100 div tokens"))
      .withColumn("over_repetition_knee", col("epochs_e2") > 400)
      .orderBy("source")
  }

  /** G7 — dataset CONTENT MANIFEST (Merkle-style chunked hash tree):
    * the content-addressable integrity record a dataset release ships
    * — change one byte anywhere and the root moves. Two levels:
    * per-source chunks of 64 docs (chunk hash = doc-id-ordered fold of
    * content hashes — bounded work per group), then a source root =
    * chunk-id-ordered fold of chunk hashes. The tree shape is WHY this
    * scales: a flat chain hash is inherently sequential over the whole
    * corpus; the tree folds only within bounded chunks and over the
    * (64×-smaller) chunk table — recursing levels keeps every fold
    * bounded at any corpus size. Both folds replay in DuckDB as
    * ORDER-pinned list_reduce.
    */
  private def qManifest(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    val d = par(doc(s, dir)).select(col("doc_id"), col("source"),
        col("n_chars"), TextOps.strHash(col("text")).as("h"))
      .withColumn("chunk", expr("doc_id div 64"))
    val P = 1000000007L
    val R = 1000003L
    val chunks = d.groupBy("source", "chunk")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
        // bounded in-chunk ordered fold (<= 64 entries per group)
        aggregate(
          array_sort(collect_list(struct(col("doc_id"), col("h")))),
          lit(13L),
          (acc, e) => (acc * lit(R) + e.getField("h")) % lit(P))
          .as("chunk_hash"))
    chunks.groupBy("source")
      .agg(sum("n_docs").as("n_docs"), sum("sum_chars").as("sum_chars"),
        aggregate(
          array_sort(collect_list(struct(col("chunk"), col("chunk_hash")))),
          lit(13L),
          (acc, e) => (acc * lit(R) + e.getField("chunk_hash")) % lit(P))
          .as("root_hash"))
      .orderBy("source")
  }

  /** J6 — sorted-neighborhood (SNM) blocking quality: the OTHER
    * classic ER blocking scheme — global sort by the key, compare only
    * within a sliding window of w=10 ranks — measured with the SAME
    * metrics, truth set, and eval subset as q237's prefix blocking, so
    * the two rows are directly comparable (SNM catches prefix-straddling
    * typos that prefix blocking misses; prefix blocking has no window
    * cliff). The subset is an absolute cap (constant 1500), so the
    * rank window runs over a bounded frame — the documented exemption
    * class; at corpus scale SNM ranks come from the PrefixScan ranker.
    */
  private def qSnmQuality(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the bounded-frame rank window coalesces to ONE partition — the
    // pair stage must re-spread or the BNLJ runs on a single task
    // (the q237 lesson, reintroduced by the window)
    val c = par(Tables.load(s, dir, "customer")
        .where(col("c_custkey") < 1500)
        .select(col("c_custkey").as("id"), col("c_name").as("name"))
        .withColumn("rk", row_number().over(
          Window.orderBy(asc("name"), asc("id"))))) // bounded 1500-row frame
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q256", c)
    val m = c.count()
    val a = c.as("x").crossJoin(c.as("y")) // labeled all-pairs baseline
      .where(col("x.id") < col("y.id"))
      .select((levenshtein(col("x.name"), col("y.name")) <= 1).as("is_match"),
        (abs(col("x.rk") - col("y.rk")) <= 10).as("in_window"))
      .agg(count(when(col("is_match"), 1)).as("n_truth"),
        count(when(col("in_window"), 1)).as("n_cand"),
        count(when(col("is_match") && col("in_window"), 1)).as("n_found"))
      .head()
    val (nTruth, nCand, nFound) = (a.getLong(0), a.getLong(1), a.getLong(2))
    val nAll = m * (m - 1) / 2
    import s.implicits._
    Seq((m, nAll, nTruth, nCand, nFound,
        1000000L - (if (nAll > 0) nCand * 1000000L / nAll else 0L),
        if (nTruth > 0) nFound * 1000000L / nTruth else 1000000L))
      .toDF("n_eval", "n_allpairs", "n_truth", "n_candidates", "n_found",
        "reduction_e6", "completeness_e6")
  }

  /** A29 — CUPED variance reduction (Deng et al., WSDM 2013): the
    * industry-standard A/B trick — adjust the metric by a
    * pre-experiment covariate, y′ = y − θ(x − x̄) with θ = cov(x,y)/
    * var(x), shrinking variance by the squared correlation without
    * biasing the treatment difference. Covariate: the customer's
    * account balance (pre-dates the order); assignment: deterministic
    * hash split. θ/x̄ come from decimal-exact moments (2-dp inputs ⇒
    * 4-dp products, exactly castable); adjusted values round at 6
    * BEFORE any decimal sum (the full-fraction-cast gotcha), and the
    * variance-reduction ratio is floor-scaled. Fully value-oracled.
    */
  private def qCuped(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    val c = Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"))
    val d = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"),
        col("o_totalprice").cast("double").as("y"),
        col("c_acctbal").cast("double").as("x"))
      .withColumn("grp", when(graft.aug.Sampling.keyBucket(
        col("o_orderkey"), 1234L) < 500000, "A").otherwise("B"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q257", d)
    val st = d.agg(Stats.dcovSamp(col("x"), col("y")).as("cov"),
      Stats.dvarSamp(col("x")).as("vx"),
      Stats.dmean(col("x")).as("mx")).head()
    val theta = st.getDouble(0) / st.getDouble(1)
    val mx = st.getDouble(2)
    val adj = d.withColumn("ya",
      round(col("y") - lit(theta) * (col("x") - lit(mx)), 6))
    adj.groupBy("grp").agg(count(lit(1)).as("n"),
        round(Stats.dmean(col("y")), 6).as("mean_y"),
        round(Stats.dmean(col("ya")), 6).as("mean_y_adj"),
        (floor(Stats.dvarSamp(col("ya")) / Stats.dvarSamp(col("y")) *
          lit(1000000.0))).cast("long").as("var_ratio_e6"))
      .orderBy("grp")
  }

  /** A30 — quantile treatment effects: per-quantile metric difference
    * between the hash-split arms — the distributional view a mean
    * comparison (q141 Welch) hides (an effect concentrated in the
    * tail moves q90 and nothing else). Exact grouped quantiles via
    * the distributed selection machinery; both engines interpolate
    * identically (the q69-pinned quantile_cont parity).
    */
  private def qQte(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice").cast("double").as("y"))
      .withColumn("grp", when(graft.aug.Sampling.keyBucket(
        col("o_orderkey"), 1234L) < 500000, "A").otherwise("B"))
    val qs = graft.core.OrderStats.groupedQuantiles(d, "grp", "y",
      Seq(0.1, 0.25, 0.5, 0.75, 0.9))
    val a = qs.where(col("grp") === "A")
      .select(col("p"), col("value").as("va"))
    val b = qs.where(col("grp") === "B")
      .select(col("p"), col("value").as("vb"))
    a.join(b, "p")
      .select(col("p"), round(col("va"), 6).as("q_a"),
        round(col("vb"), 6).as("q_b"),
        round(col("vb") - col("va"), 6).as("qte"))
      .orderBy("p")
  }

  /** A31 — sample-ratio-mismatch (SRM) guardrail: THE first check any
    * A/B readout runs — χ² of observed arm counts against the design
    * ratio; a mismatch means broken assignment/logging and invalidates
    * everything downstream. Two rows: the healthy hash split (flag
    * must be false) and a deliberately corrupted twin dropping ~3% of
    * one arm (flag must be true — the q165 corrupted-twin pattern, so
    * the check's DETECTION is itself verified). The statistic is
    * closed-form (no CDF needed — compared against the 3.84 critical
    * value for 1 dof); counts and χ² replay exactly.
    */
  private def qSrm(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "orders").select(col("o_orderkey"))
      .withColumn("b", graft.aug.Sampling.keyBucket(col("o_orderkey"), 1234L))
      .withColumn("grp", when(col("b") < 500000, "A").otherwise("B"))
      .withColumn("drop2", col("grp") === "B" &&
        graft.aug.Sampling.keyBucket(col("o_orderkey"), 99L) < 30000)
    def row(name: String, df: DataFrame) = {
      val r = df.agg(count(when(col("grp") === "A", 1)).as("na"),
        count(when(col("grp") === "B", 1)).as("nb")).head()
      val (na, nb) = (r.getLong(0), r.getLong(1))
      val e = (na + nb).toDouble / 2.0
      val chi2 = (na - e) * (na - e) / e + (nb - e) * (nb - e) / e
      (name, na, nb, chi2)
    }
    val healthy = row("healthy", d)
    val corrupted = row("corrupted", d.where(!col("drop2")))
    import s.implicits._
    Seq(healthy, corrupted).toDF("scenario", "n_a", "n_b", "chi2_raw")
      .select(col("scenario"), col("n_a"), col("n_b"),
        round(col("chi2_raw"), 6).as("chi2"),
        (col("chi2_raw") > 3.841).as("srm_detected"))
      .orderBy("scenario")
  }

  /** A32 — delta-method inference for a RATIO metric (revenue per
    * order at the customer unit): the standard A/B pitfall — the unit
    * of analysis (customer) differs from the unit of the ratio
    * (order), so naive per-order variance is wrong; the delta method
    * gives Var(ȳ/x̄) ≈ (Var y + R²·Var x − 2R·Cov)/(x̄²·n). Everything
    * from decimal-exact per-customer moments (spend 2-dp, counts int),
    * standard errors sqrt-at-6, and the two-arm z-score computed from
    * the collected per-arm rows. Fully value-oracled.
    */
  private def qRatioDelta(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    val per = o.groupBy("o_custkey")
      .agg(count(lit(1)).cast("double").as("x"),
        Stats.dsum(col("o_totalprice")).as("y")) // 2-dp: decimal-exact
      .withColumn("grp", when(graft.aug.Sampling.keyBucket(
        col("o_custkey"), 777L) < 500000, "A").otherwise("B"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q260", per)
    val st = per.groupBy("grp").agg(
        count(lit(1)).as("n"),
        Stats.dmean(col("x")).as("mx"), Stats.dmean(col("y")).as("my"),
        Stats.dvarSamp(col("x")).as("vx"), Stats.dvarSamp(col("y")).as("vy"),
        Stats.dcovSamp(col("x"), col("y")).as("cxy"))
      .orderBy("grp").collect()
    def arm(r: org.apache.spark.sql.Row) = {
      val (n, mx, my, vx, vy, cxy) = (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
      val ratio = my / mx
      val varR = (vy + ratio * ratio * vx - 2.0 * ratio * cxy) /
        (mx * mx * n.toDouble)
      (r.getString(0), n, ratio, varR)
    }
    val Array(a, b) = st.map(arm)
    val z = (b._3 - a._3) / math.sqrt(a._4 + b._4)
    import s.implicits._
    Seq((a._1, a._2, a._3, a._4, z), (b._1, b._2, b._3, b._4, z))
      .toDF("grp", "n_units", "ratio_raw", "var_raw", "z_raw")
      .select(col("grp"), col("n_units"),
        round(col("ratio_raw"), 6).as("revenue_per_order"),
        round(sqrt(col("var_raw")), 6).as("se"),
        round(col("z_raw"), 6).as("z_diff"))
      .orderBy("grp")
  }

  /** D16 — cluster-safe train/test split: q98 DETECTS eval leakage;
    * this PREVENTS it. Near-dup clusters (connected components over
    * the Jaccard ≥ 0.5 pair graph, the q47 machinery) are collapsed to
    * their canonical root, and the split hash is taken over the ROOT —
    * every member of a near-dup cluster lands in the same split by
    * construction, so a test document can never have a training-set
    * near-duplicate. The `no_leakage` boolean re-verifies the
    * guarantee by recomputation (roots spanning >1 split), and the
    * oracle replays components + hash + split end-to-end. Scale shape:
    * the pair graph is banded (Dedup.jaccardPairs), components are
    * iterative equi-joins, the split is one hash — no new shuffles
    * beyond the dedup family's own.
    */
  private def qClusterSafeSplit(s: SparkSession, dir: String): DataFrame = {
    val d = par(doc(s, dir))
    // maxShingleDocFreq = 256: hot-shingle cap on the pair stage — a
    // single boilerplate shingle (header, stop phrase) makes the
    // per-shingle self-join quadratic in its doc frequency on a real
    // crawl. The fixture's max 3-gram df is 25 at sf0.1 (measured), so
    // the cap changes nothing here while pinning the scale-safe
    // candidate rule; the oracle replays the identical exclusion.
    // Dropping hot shingles from INTERSECTIONS only (sizes stay full)
    // biases boilerplate-heavy pairs BELOW the 0.5 threshold — the
    // conservative direction for leakage prevention's candidate graph.
    val pairs = graft.dedup.Dedup.jaccardPairs(d, "doc_id", "text",
      n = 3, threshold = 0.5, maxShingleDocFreq = 256L)
    val comp = graft.dedup.Components.connectedComponents(pairs, "a", "b")
      .withColumnRenamed("id", "doc_id")
    val rooted = d.select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .withColumn("root", coalesce(col("component"), col("doc_id")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q222", rooted)
    val split = graft.aug.Sampling.splitAssign(rooted, "root",
      Seq("train" -> 0.9, "test" -> 0.1))
    val noLeak = split.groupBy("root")
      .agg(countDistinct(col("split")).as("ns"))
      .where(col("ns") > 1).count() == 0L
    split.groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("root")).as("n_clusters"))
      .withColumn("no_leakage", lit(noLeak))
      .orderBy("split")
  }

  /** T27 — token-budget corpus selection: pick documents maximizing
    * lexical diversity (distinct-token ratio, integer-exact density
    * score) under a global token budget (25% of corpus tokens) — the
    * data-selection step before a fixed-compute pretraining run.
    * Selection is a GLOBAL greedy prefix: order by (density desc,
    * doc_id), running token total via the two-phase [[PrefixScan]]
    * (no single-partition window), keep while the running total fits.
    * The (score, id) pair packs into one integer sort key —
    * (10⁶ − density)·2³³ + doc_id — so the prefix-scan order is total
    * and deterministic, and the oracle mirrors it with the same
    * integer arithmetic.
    */
  private def qTokenBudget(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    val toks = TextOps.tokens(col("text"))
    val d = doc(s, dir).select(col("doc_id"), col("source"),
        size(toks).cast("long").as("n_tok"),
        size(array_distinct(toks)).cast("long").as("u"))
      .where(col("n_tok") > 0)
      .withColumn("key",
        (lit(1000000L) - expr("u * 1000000 div n_tok")) * lit(8589934592L) +
          col("doc_id"))
    val budget = d.agg(sum("n_tok")).head().getLong(0) / 4
    val (scanned, _) = graft.core.PrefixScan.exclusive(
      d, "key", Seq("n_tok"), "entry.q223")
    scanned.where(col("cum_n_tok_below") + col("n_tok") <= budget)
      .groupBy("source")
      .agg(count(lit(1)).as("n_selected"),
        sum("n_tok").as("tokens_selected"))
      .orderBy("source")
  }

  /** N8 — two-table kNN JOIN (query set × corpus, the retrieval /
    * RAG-eval shape, vs q29's self-join): exact cosine top-3 of each
    * query row over a DISJOINT corpus partition. Labeled brute-force
    * baseline like q29 — the sublinear paths (q30/q45/q215) are the
    * scale story; this is the ground-truth operator they're audited
    * against.
    */
  private def qKnnJoin(s: SparkSession, dir: String): DataFrame = {
    val e = em(s, dir)
    graft.sim.Ann.knnJoin(
        e.where(col("vec_id") < 50), e.where(col("vec_id") >= 50),
        "vec_id", "embedding", k = 3)
      .orderBy("a", "rank")
  }

  /** T28 — domain mixture reweighting (the DoReMi-flavoured one-step
    * proxy, Xie et al. 2023): per-language excess loss under the
    * corpus-self-fit bigram LM (q96) lifts that domain's sampling
    * weight above its natural frequency — train harder on what the
    * model finds hard. Weights are the deterministic closed form
    * w ∝ frac·(1 + max(0, L_domain − L_corpus)) (linear excess, not a
    * softmax — exp() is last-ulp engine-divergent, +/× are not), all
    * means taken over 6-dp-rounded per-doc scores so every decimal
    * sum is exact cross-engine.
    */
  private def qDomainWeights(s: SparkSession, dir: String): DataFrame = {
    val d = doc(s, dir)
    val sc = graft.text.BigramLm.score(d, "doc_id", "text")
    val wl = d.select(col("doc_id").as("id"), col("lang")).join(sc, "id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q225", wl)
    val per = wl.groupBy("lang").agg(count(lit(1)).as("n_docs"),
      (Stats.dsum(col("avg_logp")) / count(lit(1))).as("m"))
    val all = wl.agg(
      (Stats.dsum(col("avg_logp")) / count(lit(1))).as("m_all"),
      count(lit(1)).as("n_all"))
    val joined = per.crossJoin(all)
      .withColumn("excess", greatest(lit(0.0), col("m_all") - col("m")))
      .withColumn("wr", round(
        (col("n_docs").cast("double") / col("n_all").cast("double")) *
          (lit(1.0) + col("excess")), 6))
    val z = joined.agg(Stats.dsum(col("wr")).as("z"))
    joined.crossJoin(z)
      .select(col("lang"), col("n_docs"),
        round(col("m"), 6).as("mean_logp"),
        round(col("excess"), 6).as("excess_loss"),
        round(col("wr") / col("z"), 6).as("weight"))
      .orderBy("lang")
  }

  /** N9 — matryoshka truncation audit (Kusupati et al. 2022): how well
    * does the 16-dim PREFIX of the 64-dim embedding preserve the full
    * similarity structure? Per query: Pearson correlation between
    * full-dim and truncated-dim cosines over a fixed target set, plus
    * whether the top-1 neighbor survives truncation — the measurement
    * behind "store the short prefix hot, re-rank with the full vector"
    * tiered vector storage (64→16 dims = 4× less hot storage/bandwidth
    * at 100 TB). Both cosines are computed by the same deterministic
    * kernel; the correlation runs over 6-dp-rounded cosines so the
    * moment sums are decimal-exact cross-engine.
    */
  private def qMatryoshka(s: SparkSession, dir: String): DataFrame = {
    graft.sim.GraftFunctions.register(s)
    import graft.sim.GraftFunctions.{dot, norm2}
    val v = em(s, dir).select(col("vec_id").cast("long").as("id"),
        col("embedding").as("vec"))
      .withColumn("v16", slice(col("vec"), 1, 16))
      .withColumn("n2", norm2(col("vec")))
      .withColumn("n2_16", norm2(col("v16")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q226", v)
    val q = v.where(col("id") < 30).select(col("id").as("a"),
      col("vec").as("qv"), col("v16").as("qv16"),
      col("n2").as("qn2"), col("n2_16").as("qn2_16"))
    val t = v.where(col("id") >= 30 && col("id") < 130)
      .select(col("id").as("b"), col("vec").as("tv"), col("v16").as("tv16"),
        col("n2").as("tn2"), col("n2_16").as("tn2_16"))
    val pairs = q.join(t, col("a") =!= col("b"))
      .select(col("a"), col("b"),
        round(dot(col("qv"), col("tv")) /
          (sqrt(col("qn2")) * sqrt(col("tn2"))), 6).as("c64"),
        round(dot(col("qv16"), col("tv16")) /
          (sqrt(col("qn2_16")) * sqrt(col("tn2_16"))), 6).as("c16"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q226", pairs)
    val n = count(lit(1)).cast("double")
    val stats = pairs.groupBy("a").agg(
      count(lit(1)).as("n_targets"),
      ((n * Stats.dsum(col("c64") * col("c16")) -
        Stats.dsum(col("c64")) * Stats.dsum(col("c16"))) /
        (sqrt(n * Stats.dsum(col("c64") * col("c64")) -
          Stats.dsum(col("c64")) * Stats.dsum(col("c64"))) *
         sqrt(n * Stats.dsum(col("c16") * col("c16")) -
           Stats.dsum(col("c16")) * Stats.dsum(col("c16"))))).as("corr"),
      max(struct(col("c64"), (-col("b")).as("nb"))).getField("nb").as("t64n"),
      max(struct(col("c16"), (-col("b")).as("nb"))).getField("nb").as("t16n"))
    stats.select(col("a"), col("n_targets"),
        round(col("corr"), 6).as("corr_64_16"),
        (col("t64n") === col("t16n")).as("top1_match"))
      .orderBy("a")
  }

  /** T29 — iterative BPE tokenizer TRAINING ([[graft.text.BpeTrainer]],
    * 6 greedy merge rounds over the distinct-word table — the full
    * trainer, vs q200's single-round pair statistics). Later rounds'
    * argmax depends on merged state no SQL engine can replay without
    * reimplementing the trainer, so the query is SELF-VERIFYING (the
    * q190/q191 pattern): exact SQL anchors — n_words, total_tokens,
    * total_chars, and the ROUND-1 merge (the weighted char-bigram
    * argmax IS SQL-expressible, and single-char symbols make the
    * (p1, p2) order identical to 2-char string order) — plus
    * invariants the oracle pins TRUE:
    *  - `symbols_decreasing`: the weighted symbol count strictly drops
    *    every round (each applied merge removes ≥1 symbol occurrence);
    *  - `merges_positive`: every selected pair had weighted count > 0;
    *  - `merged_pairs_eliminated`: no trained merge's pair is adjacent
    *    anywhere in the FINAL state (greedy left-to-right removes all
    *    occurrences, and a merge can never re-create an eliminated
    *    adjacency — it replaces two symbols with one, preserving
    *    order);
    *  - `concat_ok`: every word's final symbols concatenate back to
    *    the original word (the trainer never loses or invents bytes).
    */
  private def qBpeTrain(s: SparkSession, dir: String): DataFrame = {
    import graft.text.BpeTrainer
    val trained = BpeTrainer.train(doc(s, dir), "text", k = 6)
    val w = trained.words
    val anchors = w.agg(count(lit(1)).as("n_words"),
      sum("c").as("total_tokens"),
      sum(length(col("w")).cast("long") * col("c")).as("total_chars"),
      min(concat_ws("", col("syms")) === col("w")).as("concat_ok"))
      .head()
    val decreasing = {
      val seq = anchors.getLong(2) +: trained.weightedSymbols
      seq.zip(seq.tail).forall { case (a, b) => b < a }
    }
    val positive = trained.merges.forall(_.count > 0L)
    val eliminated = trained.merges.forall { m =>
      w.select(explode(
          when(size(col("syms")) >= 2, transform(
            sequence(lit(1), size(col("syms")) - 1),
            i => element_at(col("syms"), i) === lit(m.p1) &&
              element_at(col("syms"), i + 1) === lit(m.p2)))
            .otherwise(array().cast("array<boolean>"))).as("hit"))
        .where(col("hit")).count() == 0L
    }
    import s.implicits._
    Seq((anchors.getLong(0), anchors.getLong(1), anchors.getLong(2), 6L,
        trained.merges.head.p1 + trained.merges.head.p2,
        decreasing, positive, eliminated, anchors.getBoolean(3)))
      .toDF("n_words", "total_tokens", "total_chars", "n_merges",
        "first_merge", "symbols_decreasing", "merges_positive",
        "merged_pairs_eliminated", "concat_ok")
  }

  /** D17 — n-gram NOVELTY scoring: per document, the fraction of its
    * distinct 5-grams whose FIRST corpus occurrence (minimum doc_id
    * over the ingestion order) is an earlier document — the
    * attribution signal behind "keep the first, drop the rest" dedup
    * policies and prefix-ordered decontamination. One shuffle: 5-grams
    * group to their min owner (map-side combinable), join back
    * per-doc; no pairwise stage at all — this is the linear-cost
    * companion to the quadratic span/pair operators (q79's coverage
    * uses cross-doc counts; novelty uses first-owner order).
    * Summarized per source with exact integer ratios (scaled 1e6).
    */
  private def qNgramNovelty(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    val d = par(doc(s, dir))
    // tokens hoisted into their own projection: referenced inside the
    // transform lambda they would be re-split once per n-gram position
    // (the documented HOF shared-subtree inlining trap)
    val grams = d.select(col("doc_id"), col("source"),
        TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("source"),
        explode(array_distinct(when(size(col("toks")) >= 5,
          transform(sequence(lit(1), size(col("toks")) - 4),
            i => array_join(slice(col("toks"), i, lit(5)), " ")))
          .otherwise(array().cast("array<string>")))).as("g"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q231", grams)
    val firstOwner = grams.groupBy("g").agg(min("doc_id").as("first_doc"))
    val perDoc = grams.join(firstOwner, "g")
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("first_doc") === col("doc_id"), 1)).as("n_novel"))
    perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_grams").as("n_grams"),
        sum("n_novel").as("n_novel"))
      .withColumn("novelty_e6", expr("n_novel * 1000000 div n_grams"))
      .orderBy("source")
  }

  /** T30 — Zipf's-law fit of the token frequency spectrum: ranks the
    * vocabulary by count and fits ln(count) = a + s·ln(rank) by OLS —
    * s ≈ −1 is the natural-language signature, and a corpus whose
    * slope drifts (template spam: flat head; boilerplate: cliff) fails
    * downstream quality assumptions. The ranking window runs over the
    * VOCABULARY table (already aggregated, metadata-sized — the
    * documented exemption class), with a (count desc, token asc) total
    * order; ln values round at 6 before the exact decimal moment sums
    * (the q96 pattern for transcendentals).
    */
  private def qZipfFit(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    import org.apache.spark.sql.expressions.Window
    val vocab = par(doc(s, dir))
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val ranked = vocab.withColumn("rank",
        row_number().over(Window.orderBy(desc("cnt"), asc("w"))))
      .select(round(log(col("rank").cast("double")), 6).as("x"),
        round(log(col("cnt").cast("double")), 6).as("y"))
    val n = count(lit(1)).cast("double")
    ranked.agg(count(lit(1)).as("n_vocab"),
        ((n * Stats.dsum(col("x") * col("y")) -
          Stats.dsum(col("x")) * Stats.dsum(col("y"))) /
          (n * Stats.dsum(col("x") * col("x")) -
            Stats.dsum(col("x")) * Stats.dsum(col("x")))).as("slope"),
        (Stats.dsum(col("y")) / n).as("my"),
        (Stats.dsum(col("x")) / n).as("mx"))
      .select(col("n_vocab"), round(col("slope"), 6).as("zipf_slope"),
        round(col("my") - col("slope") * col("mx"), 6).as("intercept"))
  }

  /** T31 — BPE ENCODE with the trained merges (q227's tokenizer put to
    * work): every corpus word encoded by the trainer's final symbol
    * state, fertility (BPE tokens per word) measured corpus-wide.
    * Encoded state is merge-order-dependent (not SQL-replayable), so
    * the audit is DUAL-PATH: a second, independent encoder — iterated
    * separator-string `replace` (p1␟p2 → p1p2), which is also greedy
    * left-to-right non-overlapping — re-encodes every word in pure
    * column ops, and `dual_path_ok` pins both paths identical on every
    * word. Anchors (n_words, total_tokens=chars-upper-bound pieces)
    * are SQL-exact; fertility bounds pinned: 1 ≤ tokens/word and
    * tokens < chars (6 positive merges must strictly compress).
    */
  private def qBpeEncode(s: SparkSession, dir: String): DataFrame = {
    import graft.text.BpeTrainer
    val sep = "\u0001"
    val trained = BpeTrainer.train(doc(s, dir), "text", k = 6)
    val w0 = trained.words
    // independent path: symbols joined AND bracketed by the separator
    // (\u2423a\u2423b\u2423 — brackets stop a pattern matching ACROSS symbol
    // boundaries: merge (b,a) must not fire inside [ab, a]); each merge
    // is a left-to-right regex replace whose trailing separator is a
    // LOOKAHEAD, so adjacent matches don't consume each other's
    // boundary ([a,b,a,b] under (a,b) must become [ab, ab], exactly as
    // the trainer's fold does)
    val init = concat(lit(sep),
      concat_ws(sep, BpeTrainer.charSyms(col("w"))), lit(sep))
    val viaReplace = trained.merges.foldLeft(init) {
      case (acc, m) =>
        regexp_replace(acc,
          java.util.regex.Pattern.quote(sep + m.p1 + sep + m.p2) +
            s"(?=${java.util.regex.Pattern.quote(sep)})",
          java.util.regex.Matcher.quoteReplacement(sep + m.p1 + m.p2))
    }
    val audited = w0.withColumn("alt",
      filter(split(viaReplace, java.util.regex.Pattern.quote(sep)),
        x => x =!= ""))
    val r = audited.agg(
      count(lit(1)).as("n_words"),
      sum("c").as("total_word_occurrences"),
      sum(size(col("syms")).cast("long") * col("c")).as("total_bpe_tokens"),
      sum(length(col("w")).cast("long") * col("c")).as("total_chars"),
      min(col("alt") === col("syms")).as("dual_path_ok"),
      min(size(col("syms")) >= 1).as("fert_ge_1")).head()
    import s.implicits._
    Seq((r.getLong(0), r.getLong(1), r.getLong(3), 6L,
        r.getBoolean(4), r.getBoolean(5),
        r.getLong(2) < r.getLong(3)))
      .toDF("n_words", "total_word_occurrences", "total_chars", "n_merges",
        "dual_path_ok", "fert_ge_1", "compressed")
  }

  /** K2 — key-skew diagnostic report: the partition-planning measurement
    * behind the salting/AQE decisions (q43's salted aggregate, skew-join
    * levers). Per key-column: distinct keys, max/mean key frequency,
    * the skew ratio (hot key vs expected uniform share), and the exact
    * Gini coefficient of the key-frequency distribution — rank-weighted
    * via the distributed prefix scan over the (frequency, key) total
    * order, no single-partition window on data. All integer arithmetic
    * until the final ratios.
    */
  private def qSkewReport(s: SparkSession, dir: String): DataFrame = {
    def report(df: DataFrame, keyCol: String, label: String): DataFrame = {
      val freq = df.groupBy(col(keyCol).cast("long").as("k"))
        .agg(count(lit(1)).as("f"))
      // unique sort key (f, k): pack into one long (f < 2^31, k < 2^32)
      val keyed = freq
        .withColumn("sk", col("f") * lit(4294967296L) + col("k"))
        .withColumn("one", lit(1L))
      val (scanned, totals) = graft.core.PrefixScan.exclusive(
        keyed, "sk", Seq("f", "one"), s"entry.q230.$label")
      val total = totals(0)
      val n = totals(1)
      // Gini over key frequencies, rank-weighted with the ascending
      // (f, k) rank recovered from the scan's exclusive ones-count:
      // G = (2*SUM(rank_i * f_i) - (n+1)*F) / (n*F) — all integers
      // until the final scaled division
      val giniNum = scanned.agg(
        sum((col("cum_one_below") + lit(1L)) * col("f"))).head().getLong(0)
      val giniE6 = (BigInt(2) * BigInt(giniNum) -
        BigInt(n + 1) * BigInt(total)) * BigInt(1000000) /
        (BigInt(n) * BigInt(total))
      val maxF = freq.agg(max("f")).head().getLong(0)
      import s.implicits._
      // every output is INTEGER-exact (scaled by 1e6 where fractional):
      // no double rounding class anywhere in this query
      Seq((label, n, total, maxF,
          total * 1000000L / n,
          maxF * n * 1000000L / total,
          giniE6.toLong))
        .toDF("key_col", "n_keys", "n_rows", "max_freq", "mean_freq_e6",
          "skew_ratio_e6", "gini_e6")
    }
    report(li(s, dir), "l_orderkey", "lineitem.l_orderkey")
      .union(report(ev(s, dir), "user_id", "events.user_id"))
      .orderBy("key_col")
  }

  /** MM'' — REAL audio-container metadata decode (WAV RIFF-chunk walk +
    * FLAC STREAMINFO bit unpack → rate/channels/bits/frames/duration,
    * pure byte arithmetic, no codec): synthetic headers built from
    * doc_id round-trip through the parser and are checked against a
    * known-answer oracle. PCM decode stays the documented stub.
    */
  private def qAudioMeta(s: SparkSession, dir: String): DataFrame = {
    import graft.multimodal.Binary
    doc(s, dir).select(col("doc_id"))
      .withColumn("au", Binary.synthAudioHeaderCol(col("doc_id")))
      .select(col("doc_id"), Binary.audioMetaCol(col("au")).as("m"))
      .select(col("doc_id"), col("m.format").as("format"),
        col("m.sample_rate").cast("long").as("sample_rate"),
        col("m.channels").cast("long").as("channels"),
        col("m.bits_per_sample").cast("long").as("bits_per_sample"),
        col("m.n_frames").as("n_frames"),
        col("m.duration_ms").as("duration_ms"))
      .orderBy("doc_id")
  }

  /** V1 — int8 symmetric embedding quantization (the vector-store
    * memory-compression step before ANN indexing): per-vector max-abs
    * scale, half-up integer codes, auditable max dequantization error.
    * Pure map stage (codegen'd HOF expressions, no shuffle beyond the
    * final tiny sort).
    */
  private def qEmbedQuant(s: SparkSession, dir: String): DataFrame = {
    import graft.sim.Quantize
    // NB the raw scale keeps a distinct name from the rounded output
    // column: a lambda in the same select that references `scale`
    // binds to the projection's `round(...) AS scale` alias, not the
    // child column (HOF lambda resolution quirk), silently computing
    // the error against the ROUNDED scale
    em(s, dir)
      .withColumn("scale_raw", Quantize.scaleCol(col("embedding")))
      .withColumn("q", Quantize.quantize(col("embedding"), col("scale_raw")))
      .withColumn("max_err_raw",
        Quantize.dequantError(col("embedding"), col("q"), col("scale_raw")))
      .select(col("vec_id"), col("label"),
        round(col("scale_raw"), 6).as("scale"),
        Quantize.codeSum(col("q")).as("q_sum"),
        Quantize.codeL1(col("q")).as("q_l1"),
        round(col("max_err_raw"), 6).as("max_err"))
      .orderBy("vec_id")
  }

  /** K1 — sequence packing (concat-and-chunk, the standard pretraining
    * batching): documents concatenated in doc_id order, cut every 512
    * BPE-ish tokens, each doc assigned to the chunk where it starts;
    * per-pack doc counts and token mass. The global running sum is the
    * two-phase distributed prefix scan — no single-partition window.
    */
  private def qSeqPack(s: SparkSession, dir: String): DataFrame = {
    val d = doc(s, dir).select(col("doc_id"),
      graft.text.TextOps.bpeTokenCount(col("text")).as("tokens"))
    graft.seq.Packing.packStats(d, "doc_id", "tokens", budget = 512L)
      .orderBy("pack_id")
  }

  /** D7 — incremental (delta) dedup at ingest: a new batch (doc_id %
    * 5 = 4) is anti-joined against the existing corpus's content
    * hashes, then exact-deduped within itself — the kept set unioned
    * with the corpus stays exactly-deduplicated. Only (hash, id) pairs
    * shuffle.
    */
  private def qDeltaDedup(s: SparkSession, dir: String): DataFrame = {
    val d = doc(s, dir)
    val corpus = d.where(col("doc_id") % 5 < 4)
    val batch = d.where(col("doc_id") % 5 === 4)
    graft.dedup.Dedup.deltaDedup(batch, corpus, "doc_id", "text")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** D8 — duplicated-span coverage (the ExactSubstr partial-dup signal,
    * Lee et al. 2021): per document, the fraction of tokens covered by
    * a 5-gram appearing verbatim in ≥2 distinct documents. Catches
    * boilerplate/quoted passages whole-document near-dup misses.
    */
  private def qDupSpans(s: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.dupSpanCoverage(doc(s, dir), "doc_id", "text", n = 5)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")

  /** Z1 — z-order layout keys (the OPTIMIZE ZORDER BY primitive):
    * Morton-interleave (l_partkey, l_suppkey), then per-z-cell extent
    * stats — each 256×256 cell's min/max on BOTH dimensions stays
    * tight, which is exactly why min/max file stats prune two-sided
    * filters on a z-laid-out table.
    */
  private def qZorder(s: SparkSession, dir: String): DataFrame = {
    import graft.core.ZOrder
    li(s, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        ZOrder.zkey(col("l_partkey"), col("l_suppkey")).as("zkey"),
        ZOrder.zcell(col("l_partkey"), col("l_suppkey"), 16).as("zcell"))
      .groupBy("zcell")
      .agg(count(lit(1)).as("n"),
        min("l_partkey").as("min_part"), max("l_partkey").as("max_part"),
        min("l_suppkey").as("min_supp"), max("l_suppkey").as("max_supp"),
        min("zkey").as("min_z"), max("zkey").as("max_z"))
      .orderBy("zcell")
  }

  /** T7 — corpus vocabulary (the tokenizer-training frequency table):
    * total count + document frequency per token, count ≥ 50, one
    * explode + one map-side-combinable aggregate.
    */
  private def qVocab(s: SparkSession, dir: String): DataFrame =
    graft.text.Vocab.vocabulary(doc(s, dir), "doc_id", "text", minCount = 50L)
      .orderBy(desc("n"), asc("token"))

  /** T8 — C4/Gopher-style rule-based quality filtering: per-source
    * kept counts and per-rule failure counts in ONE aggregate pass.
    * Token-derived stats are hoisted into their own projection first
    * (HOF lambdas inline shared subtrees — evaluating four rules off
    * the raw text column would re-walk the token array per rule).
    */
  private def qQualityFilter(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    val t = col("text")
    val stats = doc(s, dir).select(col("source"),
      TextOps.tokenCount(t).cast("long").as("n_tokens"),
      TextOps.avgTokenLen(t).as("avg_len"),
      TextOps.stopwordRatio(t).as("sw_ratio"),
      TextOps.dupNgramFraction(t, 2).as("dup_frac"))
    val rules = TextOps.c4Rules(col("n_tokens"), col("avg_len"),
      col("sw_ratio"), col("dup_frac"))
    val passAll = rules.map(_._2).reduce(_ && _)
    val failCounts = rules.map { case (name, p) =>
      count(when(!p, 1)).as(s"n_fail_$name")
    }
    stats.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        (count(when(passAll, 1)).as("n_kept") +: failCounts): _*)
      .orderBy("source")
  }

  /** R5 — deterministic negative sampling (the contrastive-training
    * draw): 4 hash-drawn negatives per anchor, never the anchor
    * itself; payload fetch is a plain equi-join on neg_id.
    */
  private def qNegSample(s: SparkSession, dir: String): DataFrame = {
    val e = em(s, dir)
    graft.aug.Sampling.negativeSamples(e, "vec_id", k = 4)
      .join(e.select(col("vec_id").as("neg_id"),
        col("label").cast("long").as("neg_label")), "neg_id")
      .select(col("anchor"), col("j"), col("neg_id"), col("neg_label"))
      .orderBy("anchor", "j")
  }

  /** V2 — per-label embedding centroids (class prototypes): narrow
    * (label, dim) component means with DECIMAL partials, reduced to a
    * position-weighted checksum + squared norm per label.
    */
  private def qLabelCentroids(s: SparkSession, dir: String): DataFrame =
    graft.sim.Centroids.labelCentroids(em(s, dir), "label", "embedding")
      .groupBy("group")
      .agg(max("n").as("n"),
        round(Stats.dsum(col("mean") * col("dim").cast("double")), 6)
          .as("centroid_checksum"),
        round(Stats.dsum(col("mean") * col("mean")), 6).as("norm2"))
      .select(col("group").cast("long").as("label"), col("n"),
        col("centroid_checksum"), col("norm2"))
      .orderBy("label")

  /** DV1 — snapshot diff (dataset versioning): yesterday's corpus
    * (doc_id % 7 ≠ 3) vs today's (all docs, 1-in-10 texts revised) →
    * added/changed/unchanged churn counts by content hash; the
    * training-data release-note summary.
    */
  private def qSnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val d = doc(s, dir)
    val snapA = d.where(col("doc_id") % 7 =!= 3)
    val snapB = d.withColumn("text",
      when(col("doc_id") % 10 === 0, concat(col("text"), lit(" rev2")))
        .otherwise(col("text")))
    graft.core.Versioning.diffSummary(snapA, snapB, "doc_id",
      df => graft.text.TextOps.strHash(df("text")))
      .orderBy("status")
  }

  /** K2 — length-bucketed batching stats (the dynamic-batching tuner):
    * docs bucketed by BPE-ish token count; per bucket, the padding
    * waste of batching to the bucket max.
    */
  private def qLengthBuckets(s: SparkSession, dir: String): DataFrame = {
    val d = doc(s, dir)
      .select(graft.text.TextOps.bpeTokenCount(col("text")).as("tokens"))
    graft.seq.Packing.lengthBuckets(d, "tokens", Seq(16L, 32L, 48L, 64L))
      .orderBy("bucket")
  }

  /** K3 — per-group (monolingual) sequence packing: the token stream
    * restarts per language, so the running sum is an ordinary window
    * PARTITIONED BY lang — parallel across groups, no global scan.
    */
  private def qGroupedPack(s: SparkSession, dir: String): DataFrame = {
    val d = doc(s, dir).select(col("lang"), col("doc_id"),
      graft.text.TextOps.bpeTokenCount(col("text")).as("tokens"))
    graft.seq.Packing.packStatsByGroup(d, "lang", "doc_id", "tokens",
        budget = 512L)
      .withColumnRenamed("group", "lang")
      .orderBy("lang", "pack_id")
  }

  /** T9 — inverted-index posting lists (the search-index build): per
    * term, document frequency + first-10 doc ids; hot-term lists are
    * capped BEFORE collecting, so no executor materializes "the"'s
    * full postings.
    */
  private def qPostings(s: SparkSession, dir: String): DataFrame =
    graft.text.Vocab.postings(doc(s, dir), "doc_id", "text",
        cap = 10, minDf = 5L)
      .orderBy("token")

  /** A13''' — precision–recall curve export: the imbalance-robust
    * companion to q70's ROC curve, as the same no-window prefix-scan
    * projection.
    */
  private def qPrCurve(s: SparkSession, dir: String): DataFrame = {
    val d = li(s, dir)
      .withColumn("label", when(col("l_returnflag") === "R", 1).otherwise(0))
    Metrics.prCurve(d, "label", "l_quantity")
      .select(col("score"), round(col("precision"), 6).as("precision"),
        round(col("recall"), 6).as("recall"))
      .orderBy("score")
  }

  /** A16 — calibration/reliability bins: per score-quantile bin, the
    * count, mean score, and observed positive rate (the reliability-
    * diagram table; "are high scores still enriched for positives?").
    */
  private def qCalibration(s: SparkSession, dir: String): DataFrame = {
    val d = li(s, dir)
      .withColumn("label", when(col("l_returnflag") === "R", 1).otherwise(0))
    // mean rounded at 6, not 4: a mean of 2-dp money over n rows can be
    // a TRUE tie at the 5th decimal (bin 8 at sf0.01 is exactly
    // x.59795), where Spark's shortest-repr HALF_UP and DuckDB's
    // binary-double rounding disagree; at scale 6 the terminating
    // expansions end before the rounding digit and non-terminating
    // ones can never tie
    Metrics.calibrationBins(d, "label", "l_extendedprice", bins = 10)
      .select(col("bin").cast("long").as("bin"), col("n"),
        round(col("mean_score"), 6).as("mean_score"),
        round(col("pos_rate"), 6).as("pos_rate"))
      .orderBy("bin")
  }

  /** SK2 — salted skew join: lineitem⋈part on the (potentially hot)
    * part key via replicate-and-salt, then revenue per brand. The
    * oracle is the PLAIN join + group-by — the salted plan must be
    * row-identical.
    */
  private def qSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(s, dir, "part")
      .select(col("p_partkey"), col("p_brand"))
    val joined = graft.core.Skew.saltedJoin(
      li(s, dir).select(col("l_partkey").as("p_partkey"),
        col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
      p, Seq("p_partkey"), spread = col("l_orderkey"), buckets = 8)
    joined.groupBy("p_brand")
      .agg(count(lit(1)).as("n"),
        round(Stats.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("revenue"))
      .orderBy("p_brand")
  }

  /** R6 — temperature mixture sampling (α = 0.5 source rebalancing):
    * per-language keep rates computed from the data (upsample
    * low-resource languages relative to their share), applied as a
    * deterministic hash sample; per-language kept counts + char mass.
    */
  private def qTemperatureMix(s: SparkSession, dir: String): DataFrame =
    graft.aug.Sampling.temperatureSample(doc(s, dir), "lang", "doc_id",
        targetFraction = 0.5)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"), sum("n_chars").as("sum_chars"))
      .orderBy("lang")

  /** K4 — materialized training sequences: q77's pack assignment joined
    * back to the text and concatenated in key order; per-pack collects
    * are bounded by the pack capacity. Verified via length + content
    * hash per pack.
    */
  private def qPackTexts(s: SparkSession, dir: String): DataFrame = {
    val d = doc(s, dir).select(col("doc_id"),
      graft.text.TextOps.bpeTokenCount(col("text")).as("tokens"), col("text"))
    graft.seq.Packing.packTexts(d, "doc_id", "tokens", "text", budget = 512L)
      .select(col("pack_id"), col("n_docs"), col("doc_tokens"),
        length(col("text")).cast("long").as("text_len"),
        graft.text.TextOps.strHash(col("text")).as("text_hash"))
      .orderBy("pack_id")
  }

  /** T10 — deterministic token masking (denoising-objective prep):
    * 15% of tokens masked by a pure (doc_id, position) hash — the
    * same example corrupts identically across epochs/engines.
    */
  private def qSpanMask(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    doc(s, dir)
      .withColumn("masked", TextOps.maskTokens(col("doc_id"), col("text"), pct = 15))
      .select(col("doc_id"),
        size(col("masked")).cast("long").as("n_tokens"),
        size(filter(col("masked"), t => t === "<mask>")).cast("long").as("n_masked"),
        TextOps.strHash(array_join(col("masked"), " ")).as("masked_hash"))
      .orderBy("doc_id")
  }

  /** R7 — deterministic train/val/test split assignment: hash-bucket
    * ranges give every doc a stable split label (join-stable,
    * leak-proof under re-ingestion); per-split counts + char mass.
    */
  private def qSplitAssign(s: SparkSession, dir: String): DataFrame =
    graft.aug.Sampling.splitAssign(doc(s, dir), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("sum_chars"))
      .orderBy("split")

  /** T11 — bigram LM quality scoring (the CCNet-style perplexity
    * filter, self-fit): mean add-one-smoothed bigram log-probability
    * per document; low scores flag garbled/boilerplate text.
    */
  private def qBigramLm(s: SparkSession, dir: String): DataFrame =
    graft.text.BigramLm.score(doc(s, dir), "doc_id", "text")
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")

  /** T12 — quality-pruned corpus (keep-best selection): per source,
    * keep the top half of documents by quality score (deterministic
    * doc_id tiebreak); per-source kept counts and quality mass. The
    * per-source window ranks in parallel across sources.
    */
  private def qQualityPrune(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = doc(s, dir).select(col("source"), col("doc_id"), col("n_chars"),
      graft.text.TextOps.qualityScore(col("text")).as("q"))
    val w = Window.partitionBy("source")
    val ranked = scored
      .withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy(desc("q"), asc("doc_id"))))
      .withColumn("n_src", count(lit(1)).over(w))
      .where(col("rk") <= ceil(col("n_src") * lit(0.5)))
    ranked.groupBy("source")
      .agg(count(lit(1)).as("n_kept"),
        round(Stats.dsum(col("q")), 6).as("quality_mass"),
        sum("n_chars").as("sum_chars"))
      .orderBy("source")
  }

  /** D9 — train/test leakage audit: split assignment (q95's hash
    * ranges) × prefix fingerprints (first-8-token hash, the cheap
    * near-dup key) — fingerprint groups that straddle the train/test
    * boundary are eval leakage (the decontamination check applied to
    * the corpus's OWN splits; this corpus has no EXACT text dups, but
    * shared prefixes cross the boundary).
    */
  private def qSplitLeakage(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    val split = graft.aug.Sampling.splitAssign(doc(s, dir), "doc_id",
      Seq("train" -> 0.9, "test" -> 0.1))
    val prefixFp = TextOps.strHash(
      array_join(slice(TextOps.tokens(col("text")), 1, 8), " "))
    val groups = split
      .select(prefixFp.as("h"), col("split"))
      .groupBy("h")
      .agg(count(when(col("split") === "train", 1)).as("n_train"),
        count(when(col("split") === "test", 1)).as("n_test"))
      .where(col("n_train") > 0 && col("n_test") > 0)
    groups.agg(count(lit(1)).as("n_leaky_groups"),
      coalesce(sum("n_train"), lit(0L)).as("n_train_docs"),
      coalesce(sum("n_test"), lit(0L)).as("n_test_docs"))
  }

  /** P12 — pivot (long → wide): revenue matrix returnflag × linestatus
    * via the relational pivot; one partial-aggregated pass, columns
    * fixed by the explicit value list (no value-discovery scan).
    */
  private def qPivot(s: SparkSession, dir: String): DataFrame =
    li(s, dir)
      .withColumn("rev",
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DecimalType(38, 10)))
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(round(sum("rev").cast(DoubleType), 4))
      .withColumnRenamed("F", "rev_f").withColumnRenamed("O", "rev_o")
      .orderBy("l_returnflag")

  /** P13 — unpivot (wide → long, melt): per-row numeric columns
    * stacked to (metric, value) then profiled — the tidy-data
    * reshape feeding any per-metric operator.
    */
  private def qUnpivot(s: SparkSession, dir: String): DataFrame =
    li(s, dir)
      .select(col("l_returnflag"), expr(
        """stack(3, 'quantity', CAST(l_quantity AS DOUBLE),
          | 'price', CAST(l_extendedprice AS DOUBLE),
          | 'discount', CAST(l_discount AS DOUBLE)) AS (metric, value)""".stripMargin))
      .groupBy("l_returnflag", "metric")
      .agg(count(lit(1)).as("n"), round(Stats.dsum(col("value")), 4).as("sum_value"))
      .orderBy("l_returnflag", "metric")

  /** W5 — time-series resampling + forward fill (telemetry gap
    * repair, the step the reference's evenly-spaced LSTM windows
    * presume happened upstream): 6-hour grid per user, last
    * observation per bucket, gaps carried forward; per-user grid
    * size, observed count, and filled-value checksum.
    */
  private def qResample(s: SparkSession, dir: String): DataFrame =
    graft.seq.Resample.resampleFfill(ev(s, dir), "user_id", "ts", "value",
        stepSeconds = 21600L)
      .groupBy(col("key").as("user_id"))
      .agg(count(lit(1)).as("n_points"),
        count(when(col("observed"), 1)).as("n_observed"),
        round(Stats.dsum(col("value")), 4).as("value_checksum"))
      .orderBy("user_id")

  /** Per-source domain capping (Sampling.capPerGroup) — keep ≤ cap docs
    * per source by deterministic hash rank; output pins WHICH rows
    * survive via an exact id checksum per source. Uses the counted
    * variant (small-group bypass) so the registered query exercises the
    * scale path; the spec pins its equality with the plain window.
    */
  private def qSourceCap(s: SparkSession, dir: String): DataFrame = {
    val capped = graft.aug.Sampling.capPerGroupCounted(
      doc(s, dir).select("doc_id", "source"), "source", "doc_id", cap = 15)
    capped.groupBy("source")
      .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("id_checksum"))
      .orderBy("source")
  }

  /** Canonical text normalization (TextOps.normalize): per-doc raw vs
    * normalized length and the hash of the normalized text (the
    * pre-dedup canonical form). Normalized text is projected ONCE into
    * its own column, then hashed/measured — not recomputed per output.
    */
  private def qNormalize(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    doc(s, dir)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_raw"),
        TextOps.normalize(col("text")).as("norm"))
      .select(col("doc_id"), col("n_raw"),
        length(col("norm")).cast("long").as("n_norm"),
        TextOps.strHash(col("norm")).as("norm_hash"))
      .orderBy("doc_id")
  }

  /** Unigram token entropy (TextOps.tokenEntropy) — the vocabulary-
    * diversity quality signal, per doc. Token array hoisted into its
    * own projection (HOF-inlining gotcha); entropy summed in sorted
    * distinct-token order for cross-engine fold parity.
    */
  private def qTokenEntropy(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    par(doc(s, dir))
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        round(TextOps.tokenEntropyFromTokens(col("toks")), 6).as("entropy_bits"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        col("entropy_bits"))
      .orderBy("doc_id")
  }

  /** CDC merge (Versioning.applyChanges): a change batch derived
    * deterministically from the documents table — updates (seq 1) on
    * ids ≡ 0 (mod 4), deletes (seq 2) overriding half of them
    * (ids ≡ 0 mod 8 — exercises latest-wins), inserts at shifted ids —
    * applied to the ids ≢ 3 (mod 4) snapshot; per-source exact
    * checksums pin the merged state.
    */
  private def qCdcMerge(s: SparkSession, dir: String): DataFrame = {
    val d = doc(s, dir).select(col("doc_id"), col("source"), col("n_chars"))
    val snapshot = d.where(col("doc_id") % 4 < 3)
    val upd = d.where(col("doc_id") % 4 === 3).select(
      (col("doc_id") - 3).as("doc_id"), col("source"),
      (col("n_chars") + 1000).as("n_chars"), lit("U").as("op"), lit(1L).as("seq"))
    val del = d.where(col("doc_id") % 8 === 3).select(
      (col("doc_id") - 3).as("doc_id"), col("source"), col("n_chars"),
      lit("D").as("op"), lit(2L).as("seq"))
    val ins = d.where(col("doc_id") % 4 === 3).select(
      (col("doc_id") + 10000000L).as("doc_id"), col("source"), col("n_chars"),
      lit("I").as("op"), lit(1L).as("seq"))
    val merged = graft.core.Versioning.applyChanges(
      snapshot, upd.unionByName(del).unionByName(ins), "doc_id")
    merged.groupBy("source")
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_checksum"),
        sum(col("n_chars")).as("chars_checksum"))
      .orderBy("source")
  }

  /** Feature discretization (features.Discretizer): equal-frequency
    * bins on price (exact distributed k-quantile edges) + equal-width
    * bins on quantity (one min/max pass), reported as a long per-bin
    * table. Rides the shared stats-family cache.
    */
  private def qDiscretize(s: SparkSession, dir: String): DataFrame = {
    import graft.features.Discretizer
    val df = liStats(s, dir)
    val ef = Discretizer.fitEqualFreq(df, Seq("l_extendedprice"), 8)
    val ew = Discretizer.fitEqualWidth(df, Seq("l_quantity"), 6)
    def leg(m: Discretizer.Model, c: String) =
      m.transform(df.select(col(c)))
        .groupBy(col(s"${c}_bin").cast("long").as("bin"))
        .agg(count(lit(1)).as("n"),
          round(Stats.dsum(col(c).cast("double")), 4).as("sum_value"))
        .select(lit(c).as("column_name"), col("bin"), col("n"), col("sum_value"))
    leg(ef, "l_extendedprice").unionByName(leg(ew, "l_quantity"))
      .orderBy("column_name", "bin")
  }

  /** Target encoding (features.TargetEncoder): m-estimate-smoothed
    * per-brand mean of a binary label + the per-brand checksum of the
    * leave-one-out row encodings (pins every row's LOO value).
    */
  private def qTargetEncode(s: SparkSession, dir: String): DataFrame = {
    import graft.features.TargetEncoder
    val p = Tables.load(s, dir, "part")
      .select(col("p_brand"), (col("p_size") > 25).cast("int").as("y"))
    val enc = TargetEncoder.encodings(p, "p_brand", "y", m = 10.0)
      .select(col("p_brand"), col("n"), round(col("enc"), 6).as("enc"))
    val loo = TargetEncoder.looTransform(p, "p_brand", "y")
      .groupBy("p_brand")
      .agg(round(Stats.dsum(col("loo_enc")), 6).as("loo_checksum"))
    enc.join(loo, Seq("p_brand")).orderBy("p_brand")
  }

  /** Interval containment join (seq.IntervalJoin): every ~97th event
    * anchors a 2 h half-open interval; all events falling inside any
    * interval match via the bucketed range join (bucket = interval
    * width ⇒ ≤ 2 buckets per interval, one equi-join, no nested loop).
    * Micro-precision longs on both engines (the q58 convention).
    */
  private def qIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val twoH = 2L * 3600 * 1000 * 1000
    val e = ev(s, dir).withColumn("ts_us", expr("ts div 1000"))
    val anchors = e.where(col("event_id") % 97 === 0)
      .select(col("event_id").as("anchor_id"), col("ts_us").as("start_us"),
        (col("ts_us") + lit(twoH)).as("end_us"))
    val pts = e.select(col("event_id"), col("ts_us"), col("value"))
    graft.seq.IntervalJoin.containment(pts, anchors, "ts_us",
        "start_us", "end_us", bucketWidth = twoH)
      .groupBy("anchor_id")
      .agg(count(lit(1)).as("n_points"), sum(col("event_id")).as("id_checksum"),
        round(Stats.dsum(col("value")), 4).as("value_checksum"))
      .orderBy("anchor_id")
  }

  /** Per-user EWMA (seq.Rolling.ewmaByKey): the sequential smoothing
    * fold, distributed one-key-per-group; α = 0.5 and a (ts, value)
    * sort key keep the fold bitwise cross-engine.
    */
  private def qEwma(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).select(col("user_id"),
      expr("ts div 1000").as("ts_us"), col("value"))
    graft.seq.Rolling.ewmaByKey(e, Seq("user_id"), "ts_us", "value", alpha = 0.5)
      .select(col("user_id"), col("n"), round(col("ewma"), 6).as("ewma"))
      .orderBy("user_id")
  }

  /** Mutual information between flag and status (core.InfoTheory):
    * one joint-count pass; entropies/MI as decimal-exact sums of
    * fixed-shape double terms.
    */
  private def qMutualInfo(s: SparkSession, dir: String): DataFrame =
    graft.core.InfoTheory.mutualInfo(li(s, dir), "l_returnflag", "l_linestatus")
      .select(round(col("h_a"), 6).as("h_flag"),
        round(col("h_b"), 6).as("h_status"),
        round(col("mi"), 6).as("mi"), round(col("nmi"), 6).as("nmi"))

  /** Quality-weighted subsample (Sampling.weightedSample): k docs drawn
    * ∝ n_chars via the deterministic exponential race; TakeOrdered
    * top-k, never a global sort.
    */
  private def qWeightedSample(s: SparkSession, dir: String): DataFrame =
    graft.aug.Sampling.weightedSample(
        doc(s, dir).select("doc_id", "source", "n_chars"),
        "doc_id", "n_chars", k = 100)
      .orderBy("doc_id")

  /** Hashing-trick featurization (TextOps.hashedTokens/hashFeatures):
    * 64-dim token-count vectors, pinned by nnz / L1 / position-weighted
    * checksums. Tokens hashed once in their own projection.
    */
  private def qFeatureHash(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    val dim = 64
    par(doc(s, dir))
      .select(col("doc_id"), TextOps.hashedTokens(col("text"), dim).as("hs"))
      .select(col("doc_id"), TextOps.hashFeaturesFromHashed(col("hs"), dim).as("f"))
      .select(col("doc_id"),
        size(filter(col("f"), c => c > 0)).cast("long").as("nnz"),
        aggregate(col("f"), lit(0L), (a, c) => a + c).as("l1"),
        aggregate(
          transform(sequence(lit(1L), lit(dim.toLong)),
            i => element_at(col("f"), i.cast("int")) * i),
          lit(0L), (a, c) => a + c).as("wsum"))
      .orderBy("doc_id")
  }

  /** Vocabulary-id encoding (Vocab.encode): docs tokenized against the
    * fitted top-256 vocab with OOV bucketing; per-doc length / OOV /
    * position-weighted id checksums pin every id at every position.
    */
  private def qVocabEncode(s: SparkSession, dir: String): DataFrame = {
    val vs = 256
    graft.text.Vocab.encode(doc(s, dir), "doc_id", "text", vocabSize = vs)
      .select(col("id").as("doc_id"),
        size(col("ids")).cast("long").as("n_tokens"),
        size(filter(col("ids"), t => t === vs)).cast("long").as("n_oov"),
        aggregate(
          transform(sequence(lit(1L), size(col("ids")).cast("long")),
            i => element_at(col("ids"), i.cast("int")).cast("long") * i),
          lit(0L), (a, c) => a + c).as("id_checksum"))
      .orderBy("doc_id")
  }

  /** Overlapping chunking (TextOps.chunkTexts): 40-token chunks with
    * 8-token overlap, one row per chunk, pinned by per-chunk token
    * count and content hash.
    */
  private def qChunk(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    par(doc(s, dir))
      .select(col("doc_id"),
        posexplode(TextOps.chunkTexts(TextOps.tokens(col("text")), 40, 8))
          .as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        TextOps.tokenCount(col("chunk")).cast("long").as("chunk_tokens"),
        TextOps.strHash(col("chunk")).as("chunk_hash"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** PCA over the embeddings table (sim.Pca): distributed
    * treeAggregate covariance fit + driver Jacobi eigensolve, k = 4
    * codegen'd dot-product scores per row. SELF-VERIFYING: eigenvectors
    * aren't SQL-expressible, so the query audits the decomposition
    * in-query and the oracle pins the booleans TRUE — eigenvalues
    * descending and non-negative, basis orthonormal, and the variance
    * identity mean(‖x−μ‖² − Σⱼpcⱼ²) = trace(Σ) − Σ top-k λ (both sides
    * from the SAME full-data fit — an eigensolve or projection bug
    * breaks the equality). Exact anchors: row count and dimension.
    */
  private def qPca(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val m = graft.sim.Pca.fit(e, "v", k = 4)
    val evalsOk = m.eigenvalues.forall(_ >= -1e-9) &&
      m.eigenvalues.zip(m.eigenvalues.tail).forall { case (a, b) => a >= b - 1e-12 }
    // centered squared norm via the k = 0 linear-AE scorer sharing μ
    val m0 = new graft.score.LinearAE.Model(m.mean, Array.empty)
    val scored = m.transform(m0.transform(par(e), "v", "sq"), "v")
    val projSq = (0 until 4).map(j => col(s"pc$j") * col(s"pc$j"))
      .reduce(_ + _)
    val a = scored.agg(
      count(lit(1)).as("n"),
      Stats.dmean(col("sq") - projSq).as("mean_resid"),
      Stats.dmean(col("sq")).as("mean_sq"),
      count(when(col("sq") - projSq < lit(-1e-6), 1)).as("neg")).head()
    val (n, meanResid, meanSq, neg) =
      (a.getLong(0), a.getDouble(1), a.getDouble(2), a.getLong(3))
    // population identity: E[residual] = trace(cov) − Σ top-k eigenvalues;
    // trace comes from mean ‖x−μ‖² over the same rows the fit consumed
    val expected = meanSq - m.eigenvalues.sum
    val identityOk = math.abs(meanResid - expected) <=
      1e-6 * math.max(1.0, meanSq)
    import s.implicits._
    Seq((n, m.mean.length.toLong, 4L, evalsOk, basisOrthonormal(m.components),
        identityOk, neg == 0L))
      .toDF("n_rows", "dim", "k", "evals_descending", "basis_orthonormal",
        "var_identity_ok", "resid_nonneg")
  }

  /** Per-user OLS trend (seq.Trend.linearFit): slope rescaled to
    * per-hour units so the 6-dp rounding keeps signal (raw slope is
    * per-microsecond). One window + one aggregate on the same key.
    */
  private def qTrend(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).select(col("user_id"),
      expr("ts div 1000").as("x"), col("value").as("y"))
    graft.seq.Trend.linearFit(e, Seq("user_id"), "x", "y")
      .select(col("user_id"), col("n"),
        round(col("slope") * lit(3.6e9), 6).as("slope_per_hour"),
        round(col("intercept"), 6).as("intercept"),
        round(col("r2"), 6).as("r2"))
      .orderBy("user_id")
  }

  /** Decile lift/gains table — the marketing-science twin of the ROC
    * family: rank rows by score into exact deciles (OrderStats edges,
    * the q49/q108 bin shape), then per decile report positive rate,
    * cumulative gain (fraction of all positives captured) and lift vs
    * the base rate. The cumulative window runs over the 10-row decile
    * table, not the data.
    */
  private def qLiftGains(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = li(s, dir).select(
      (col("l_returnflag") === "R").cast("int").as("y"),
      col("l_extendedprice").cast("double").as("score"))
    val edges = graft.core.OrderStats.quantilesOf(
      base, "score", (1 until 10).map(_.toDouble / 10)).distinct
    val bin = edges.foldLeft(lit(0)) { (acc, e) =>
      acc + when(col("score") > lit(e), 1).otherwise(0)
    }
    val perBin = base.withColumn("decile", bin.cast("long"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n"), sum(col("y")).cast("long").as("pos"))
    // descending deciles: highest scores first (decile 9 = top)
    val w = Window.orderBy(desc("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBin
      .withColumn("cum_pos", sum(col("pos")).over(w))
      .withColumn("cum_n", sum(col("n")).over(w))
      .select(col("decile"), col("n"), col("pos"),
        round(col("cum_pos").cast("double") /
          sum(col("pos")).over(Window.partitionBy()), 6).as("gain"),
        round((col("cum_pos").cast("double") / col("cum_n")) /
          (sum(col("pos")).over(Window.partitionBy()).cast("double") /
            sum(col("n")).over(Window.partitionBy())), 6).as("lift"))
      .orderBy(desc("decile"))
  }

  /** Median/MAD robust anomaly score — the outlier-insensitive twin of
    * q07's z-score (median and MAD ignore the outliers themselves;
    * mean/std do not): flag rows with |0.6745·(x−med)/MAD| > 3.5 (the
    * Iglewicz–Hoaglin modified z-score). Both statistics are exact
    * distributed order-statistic selections; scoring is codegen'd
    * column math with plan literals.
    */
  private def qMadScore(s: SparkSession, dir: String): DataFrame = {
    val base = li(s, dir).select(col("l_orderkey"),
      col("l_extendedprice").cast("double").as("x"))
    val med = graft.core.OrderStats.quantilesOf(base, "x", Seq(0.5)).head
    val dev = base.withColumn("d", abs(col("x") - lit(med)))
    val mad = graft.core.OrderStats.quantilesOf(dev, "d", Seq(0.5)).head
    val mz = lit(0.6745) * (col("x") - lit(med)) / lit(mad)
    base.withColumn("mz", mz)
      .agg(count(lit(1)).as("n"),
        count(when(abs(col("mz")) > 3.5, 1)).as("n_flagged"),
        round(max(col("mz")), 6).as("max_mz"), round(min(col("mz")), 6).as("min_mz"))
      .withColumn("median", round(lit(med), 6))
      .withColumn("mad", round(lit(mad), 6))
  }

  /** A18 — Spearman rank correlation matrix: rank-robust dependence
    * over the lineitem numerics. Ranks derive from per-distinct-value
    * tie counts + the two-phase prefix scan (no global window), join
    * back on the value, then Pearson over exact decimal moments.
    */
  private def qSpearman(s: SparkSession, dir: String): DataFrame =
    graft.core.Rank.spearmanMatrix(li(s, dir), lineitemNumerics, "q121")
      .select(col("col_x"), col("col_y"), round(col("rho"), 6).as("rho"))
      .orderBy("col_x", "col_y")

  /** A19 — Cramér's V association between two categorical columns
    * (orders status × priority): one contingency-table scan, broadcast
    * marginals, χ² normalized to [0,1].
    */
  private def qCramersV(s: SparkSession, dir: String): DataFrame =
    graft.drift.Drift.cramersV(Tables.load(s, dir, "orders"),
      "o_orderstatus", "o_orderpriority")

  /** Q5 — Benford first-digit conformance of l_extendedprice: the
    * fabricated-data screen; arithmetic digit extraction, 9-bucket
    * map-side-combined aggregate, Nigrini MAD summary.
    */
  private def qBenford(s: SparkSession, dir: String): DataFrame =
    graft.drift.Drift.benford(li(s, dir), "l_extendedprice")
      .orderBy("digit")

  /** A20 — per-priority Gini concentration of order value: sorted-rank
    * identity with the rank window PARTITIONED by group (parallel
    * across groups), exact decimal Σ i·xᵢ.
    */
  private def qGini(s: SparkSession, dir: String): DataFrame =
    graft.core.Inequality.giniByGroup(Tables.load(s, dir, "orders"),
        Seq("o_orderpriority"), "o_totalprice", col("o_orderkey"))
      .select(col("o_orderpriority"), col("n"),
        round(col("total"), 4).as("total"), round(col("gini"), 6).as("gini"))
      .orderBy("o_orderpriority")

  /** W8 — per-user CUSUM changepoint detection over the event stream:
    * the persistent-level-shift detector (prefix-sum minus running-min
    * closed form — per-key windows only). In-control μ/σ come from one
    * exact-decimal global aggregate; k = σ/2 (tuned for a 1σ shift),
    * h = 4σ. Output: per-user alarm summary.
    */
  private def qCusum(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).select(col("user_id"), col("event_id"),
      col("value").cast("double").as("value"))
    val st = e.agg(Stats.dmean(col("value")).as("mu"),
      Stats.dstddevSamp(col("value")).as("sd")).head()
    val (mu, sd) = (st.getDouble(0), st.getDouble(1))
    graft.seq.Changepoint.cusum(e, Seq("user_id"), Seq(col("event_id")),
        "value", mu, sd / 2.0, 4.0 * sd)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(col("alarm")).cast("long").as("n_alarms"),
        round(max(col("cusum_pos")), 6).as("max_pos"),
        round(max(col("cusum_neg")), 6).as("max_neg"))
      .orderBy("user_id")
  }

  /** A21 — exact weighted quantiles (quantity-weighted price
    * distribution): cumulative-weight selection over the per-value
    * prefix scan — the statistic unweighted quantiles get wrong when
    * rows carry multiplicity.
    */
  private def qWeightedQuantiles(s: SparkSession, dir: String): DataFrame =
    graft.core.WeightedQuantile.quantiles(li(s, dir), "l_extendedprice",
        "l_quantity", Seq(0.25, 0.5, 0.75, 0.95), "q126")
      .select(col("p"), round(col("value"), 6).as("value"))
      .orderBy("p")

  /** A22 — ROLLUP grouping-set aggregation (flag → flag×status →
    * grand total) with an explicit grouping level — the OLAP subtotal
    * surface; one shuffle computes every grouping set via partial
    * aggregation.
    */
  private def qRollup(s: SparkSession, dir: String): DataFrame =
    li(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        round(Stats.dsum(col("l_extendedprice")), 4).as("sum_price"),
        (grouping(col("l_returnflag")) * 2 +
          grouping(col("l_linestatus"))).cast("long").as("lvl"))
      .orderBy("lvl", "l_returnflag", "l_linestatus")

  /** L6 — Pareto frontier of the part catalog (maximize retail price,
    * minimize size): two-phase local-frontier + global-merge skyline —
    * no O(n²) self-join, only frontiers move between stages.
    */
  private def qSkyline(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(s, dir, "part")
      .withColumn("neg_size", -col("p_size").cast("double"))
    graft.core.Skyline.skyline(p, Seq("p_retailprice", "neg_size"))
      .select(col("p_partkey"), col("p_name"), col("p_size"),
        col("p_retailprice"))
      .orderBy("p_partkey")
  }

  /** J4 — blocked fuzzy self-join on customer names (edit distance ≤ 1
    * within a 16-char-prefix block): the record-linkage shape — equi-
    * join on the block key, quadratic comparison only within blocks.
    * Output summarizes pairs per block (the pair list is the operator;
    * the query checks its exact cardinality profile).
    */
  private def qFuzzyPairs(s: SparkSession, dir: String): DataFrame =
    graft.text.FuzzyJoin.blockedPairs(Tables.load(s, dir, "customer"),
        "c_custkey", "c_name", substring(col("c_name"), 1, 16), 1)
      .groupBy(substring(col("text_a"), 1, 16).as("block"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("id_a")).as("n_left"),
        max(col("dist")).as("max_dist"))
      .orderBy("block")

  /** R5 — deterministic Poisson bootstrap CI for the mean order value:
    * the shuffle-free bootstrap (per-replicate hash-derived Poisson(1)
    * weights, all replicates in one map-side-combined pass) — THE
    * resampling shape that survives 100 TB, where a true resample
    * would be R full shuffles.
    */
  private def qBootstrapCi(s: SparkSession, dir: String): DataFrame =
    graft.aug.Bootstrap.meanCi(Tables.load(s, dir, "orders"),
        "o_orderkey", "o_totalprice", replicates = 40, alpha = 0.025,
        seed = 42L)
      .select(round(col("estimate"), 6).as("estimate"),
        round(col("ci_lo"), 6).as("ci_lo"),
        round(col("ci_hi"), 6).as("ci_hi"),
        col("n"), col("n_replicates"))

  /** A23 — isotonic (monotone) calibration of price→return-rate via
    * the PAV≡minimax identity on quantile bins: the data-proportional
    * work is one binning pass; the fit is relational algebra over the
    * ≤20-row bin table (triangle join + max-of-min), no sequential
    * pooling, oracle-replayable.
    */
  private def qIsotonic(s: SparkSession, dir: String): DataFrame = {
    val d = li(s, dir)
      .withColumn("label", when(col("l_returnflag") === "R", 1).otherwise(0))
    graft.eval.Isotonic.fitBins(d, "label", "l_extendedprice", bins = 20)
      .select(col("bin"), col("n"), col("pos"),
        round(col("rate"), 6).as("rate"),
        round(col("fitted"), 6).as("fitted"))
      .orderBy("bin")
  }

  /** F8 — Mahalanobis multivariate anomaly score over (quantity,
    * price): covariance-aware distance, one exact-moment fit
    * aggregate, driver 2×2 adjugate inverse as plan literals,
    * codegen'd quadratic form, χ²₂(0.99) flag threshold.
    */
  private def qMahalanobis(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice")
    val base = graft.score.Mahalanobis.completeCase(li(s, dir), cols)
    val m = graft.score.Mahalanobis.fit(base, cols)
    base.select(m.score.as("d2"))
      .agg(count(lit(1)).as("n"),
        count(when(col("d2") > 9.21034, 1)).as("n_flagged"),
        round(max(col("d2")), 6).as("max_d2"),
        round(Stats.dsum(col("d2")) / count(lit(1)), 6).as("mean_d2"))
  }

  /** W9 — Theil–Sen robust trend per user: median of all pairwise
    * slopes — the breakdown-resistant twin of q118's OLS (one wild
    * value corrupts OLS; the slope median shrugs). Pairs form inside
    * each key only (equi-join on the key, quadratic in per-key series
    * length, parallel across keys); the median is the fused grouped
    * exact selection — no per-group buffers.
    */
  private def qTheilSen(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).select(col("user_id"),
        expr("ts div 1000").as("us"), col("value").cast("double").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q133", e)
    val a = e.select(col("user_id"), col("us").as("us_a"), col("v").as("v_a"))
    val b = e.select(col("user_id"), col("us").as("us_b"), col("v").as("v_b"))
    val slopes = a.join(b, Seq("user_id"))
      .where(col("us_a") < col("us_b"))
      .select(col("user_id"), ((col("v_b") - col("v_a")) /
        ((col("us_b") - col("us_a")).cast("double") / lit(3600000000.0)))
        .as("slope"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q133", slopes)
    val med = graft.core.OrderStats.groupedQuantiles(
      slopes, "user_id", "slope", Seq(0.5))
    val counts = slopes.groupBy("user_id").agg(count(lit(1)).as("n_pairs"))
    counts.join(med, "user_id")
      .select(col("user_id"), col("n_pairs"),
        round(col("value"), 6).as("med_slope_per_hr"))
      .orderBy("user_id")
  }

  /** W10 — event funnel (view → click → purchase, 7-day completion):
    * per-step earliest-qualifying-timestamp chaining — three grouped
    * min-aggregates, each joined to the previous step's frame (all
    * user-cardinality-sized), never a per-user event sort. The classic
    * product-analytics operator.
    */
  private def qFunnel(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).select(col("user_id"),
      expr("ts div 1000").as("us"), col("event_type"))
    val s1 = e.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("t1"))
    val s2 = e.where(col("event_type") === "click").join(s1, "user_id")
      .where(col("us") > col("t1"))
      .groupBy("user_id").agg(min("us").as("t2"), min("t1").as("t1"))
    val s3 = e.where(col("event_type") === "purchase").join(s2, "user_id")
      .where(col("us") > col("t2"))
      .groupBy("user_id").agg(min("us").as("t3"), min("t1").as("t1"))
    val completed = s3.where(col("t3") - col("t1") <= 604800000000L)
    val n1 = s1.agg(count(lit(1)).as("step1_users"))
    val n2 = s2.agg(count(lit(1)).as("step2_users"))
    val n3 = s3.agg(count(lit(1)).as("step3_users"))
    val n4 = completed.agg(count(lit(1)).as("completed_7d"))
    n1.crossJoin(n2).crossJoin(n3).crossJoin(n4)
      .select(col("step1_users"), col("step2_users"), col("step3_users"),
        col("completed_7d"),
        round(col("step2_users").cast("double") /
          col("step1_users").cast("double"), 6).as("conv_1_2"),
        round(col("step3_users").cast("double") /
          col("step2_users").cast("double"), 6).as("conv_2_3"))
  }

  /** W11 — weekly cohort retention: cohort = first-activity week,
    * retention = fraction of the cohort active k weeks later. Exact
    * integer week bucketing (micros div 7d — floor-exact, no date-lib
    * divergence), one distinct-activity aggregate, cohort sizes joined
    * from the offset-0 row.
    */
  private def qRetention(s: SparkSession, dir: String): DataFrame = {
    val wk = 604800000000L
    val e = ev(s, dir).select(col("user_id"), expr("ts div 1000").as("us"))
    val first = e.groupBy("user_id").agg(min("us").as("first_us"))
    val act = e.join(first, "user_id")
      .select(expr(s"first_us div $wk").as("cohort_wk"),
        expr(s"(us - first_us) div $wk").as("week_offset"), col("user_id"))
      .distinct()
    val byCell = act.groupBy("cohort_wk", "week_offset")
      .agg(countDistinct("user_id").as("n_active"))
    val base = byCell.where(col("week_offset") === 0)
      .select(col("cohort_wk"), col("n_active").as("cohort_size"))
    byCell.join(broadcast(base), "cohort_wk")
      .select(col("cohort_wk"), col("week_offset"), col("n_active"),
        col("cohort_size"),
        round(col("n_active").cast("double") /
          col("cohort_size").cast("double"), 6).as("retention"))
      .orderBy("cohort_wk", "week_offset")
  }

  /** F9 — HBOS (histogram-based outlier score) over the lineitem
    * numerics: per-feature equal-width-histogram densities, score =
    * Σ −log₁₀ density — the linear-time anomaly baseline
    * complementing q132's covariance-aware Mahalanobis. Fit = one
    * min/max pass + ONE conditional-count aggregate; scoring is a
    * literal when-chain (no join/broadcast/UDF).
    */
  private def qHbos(s: SparkSession, dir: String): DataFrame = {
    val base = li(s, dir)
    val m = graft.score.Hbos.fit(base, lineitemNumerics, bins = 10)
    base.select(m.score.as("score"))
      .agg(count(lit(1)).as("n"),
        round(Stats.dsum(col("score")) / count(lit(1)), 6).as("mean_score"),
        round(max(col("score")), 6).as("max_score"),
        round(min(col("score")), 6).as("min_score"))
  }

  /** W12 — day-of-week seasonal profile + residual anomaly per user:
    * the seasonality-aware twin of q07's global z-score (a Monday
    * spike is only anomalous relative to MONDAYS). Exact integer dow
    * bucketing (no date-lib divergence), per-(user, dow) exact-decimal
    * means, residual flags at 2σ of the residual distribution.
    */
  private def qSeasonalResid(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).select(col("user_id"),
      expr("((ts div 1000) div 86400000000 + 4) % 7").as("dow"),
      col("value").cast("double").as("v"))
    val prof = e.groupBy("user_id", "dow").agg(Stats.dmean(col("v")).as("mu"))
    val r = e.join(prof, Seq("user_id", "dow"))
      .select(col("user_id"), (col("v") - col("mu")).as("resid"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q137", r)
    val sd = r.agg(Stats.dstddevSamp(col("resid"))).head().getDouble(0)
    r.groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        count(when(abs(col("resid")) > lit(2.0 * sd), 1)).as("n_flagged"),
        round(max(abs(col("resid"))), 6).as("max_abs_resid"))
      .orderBy("user_id")
  }

  /** W13 — event-type Markov transition matrix: per-user ordered
    * lead() pairs (one shuffle on the key, windows within partitions),
    * then global transition counts and row-normalized probabilities —
    * the behavioral-model summary of the event stream.
    */
  private def qTransitions(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = ev(s, dir).select(col("user_id"), col("event_id"),
      expr("ts div 1000").as("us"), col("event_type"))
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val pairs = e.withColumn("next", lead(col("event_type"), 1).over(w))
      .where(col("next").isNotNull)
    val wc = Window.partitionBy("cur")
    pairs.groupBy(col("event_type").as("cur"), col("next"))
      .agg(count(lit(1)).as("n"))
      .select(col("cur"), col("next"), col("n"),
        round(col("n").cast("double") /
          sum(col("n")).over(wc).cast("double"), 6).as("p"))
      .orderBy("cur", "next")
  }

  /** W14 — sliding 7-day distinct active users per day: the rolling-
    * engagement metric. Exact sliding DISTINCT resists plain windows
    * (COUNT(DISTINCT) OVER isn't supported and would buffer users);
    * instead each (user, activity-day) pair — already deduplicated,
    * bounded by users × days — fans out to the ≤7 report days it
    * covers via a compact range join, then one distinct-count per day.
    * Fan-out is 7× the DEDUPED activity table, never 7× the events.
    */
  private def qSlidingDau(s: SparkSession, dir: String): DataFrame = {
    val day = 86400000000L
    val act = ev(s, dir)
      .select(col("user_id"), expr(s"(ts div 1000) div $day").as("d"))
      .distinct()
    val days = act.select(col("d").as("report_d")).distinct()
    act.join(days,
        col("report_d") >= col("d") && col("report_d") <= col("d") + 6)
      .groupBy("report_d")
      .agg(countDistinct("user_id").as("dau_7d"))
      .orderBy("report_d")
  }

  /** P12 — SCD2 validity intervals from a change log: per (user) the
    * ordered event stream becomes [valid_from, valid_to) rows via
    * lead() — one shuffle on the key, the warehouse history-modeling
    * primitive (current rows carry a null valid_to).
    */
  private def qScd2(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = ev(s, dir).select(col("user_id"), col("event_id"),
      expr("ts div 1000").as("us"), col("event_type"))
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val iv = e.withColumn("valid_to", lead(col("us"), 1).over(w))
    iv.groupBy("user_id")
      .agg(count(lit(1)).as("n_versions"),
        count(when(col("valid_to").isNull, 1)).as("n_current"),
        sum(when(col("valid_to").isNotNull,
          col("valid_to") - col("us"))).cast("long").as("total_covered_us"),
        max(col("valid_to") - col("us")).as("max_interval_us"))
      .orderBy("user_id")
  }

  /** A15b — Welch two-sample t-test (unequal variances): the A/B-test
    * primitive. Group moments are ONE conditional-aggregate pass
    * (exact decimal sums per [[Stats]]); t and the Welch–Satterthwaite
    * df are pure double arithmetic over those moments, expression-
    * shape-mirrored in the oracle so IEEE rounding agrees bitwise.
    */
  private def qWelch(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
      .select(col("o_orderpriority").as("g"),
        col("o_totalprice").cast("double").as("v"))
      .where(col("g").isin("1-URGENT", "5-LOW"))
    val ag = o.groupBy("g").agg(count(lit(1)).cast("double").as("n"),
      Stats.dmean(col("v")).as("m"), Stats.dvarSamp(col("v")).as("s2"))
    val r = ag.agg(
      max(when(col("g") === "1-URGENT", col("n"))).as("n1"),
      max(when(col("g") === "1-URGENT", col("m"))).as("m1"),
      max(when(col("g") === "1-URGENT", col("s2"))).as("s21"),
      max(when(col("g") === "5-LOW", col("n"))).as("n2"),
      max(when(col("g") === "5-LOW", col("m"))).as("m2"),
      max(when(col("g") === "5-LOW", col("s2"))).as("s22"))
    val se1 = col("s21") / col("n1")
    val se2 = col("s22") / col("n2")
    val se = se1 + se2
    r.select(col("n1").cast("long").as("n1"), col("n2").cast("long").as("n2"),
      round(col("m1"), 6).as("mean1"), round(col("m2"), 6).as("mean2"),
      round((col("m1") - col("m2")) / sqrt(se), 6).as("t_stat"),
      round(se * se / (se1 * se1 / (col("n1") - lit(1.0)) +
        se2 * se2 / (col("n2") - lit(1.0))), 6).as("df"))
  }

  /** A16 — RFM customer segmentation: recency / frequency / monetary
    * per customer from the order history, each quintile-binned with the
    * [[graft.features.Discretizer]] exact-quantile machinery (the q108
    * edge convention — distinct edges, bin = count of edges strictly
    * below). One groupBy builds the per-customer frame; the fit is one
    * fused 3-column distributed selection; binning is codegen'd
    * literal comparisons — no global ntile window anywhere.
    */
  private def qRfm(s: SparkSession, dir: String): DataFrame = {
    import graft.features.Discretizer
    val per = Tables.load(s, dir, "orders")
      .select(col("o_custkey"),
        expr("unix_timestamp(o_orderdate) div 86400").as("day"),
        col("o_totalprice").cast("double").as("tp"))
      .groupBy("o_custkey")
      .agg(max(col("day")).as("last_day"), count(lit(1)).as("freq"),
        Stats.dsum(col("tp")).as("monetary"))
    val maxDay = per.agg(max("last_day")).head().getLong(0)
    val rfm = per.select(col("o_custkey"),
        (lit(maxDay) - col("last_day")).cast("double").as("recency"),
        col("freq").cast("double").as("frequency"), col("monetary"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q142", rfm)
    val m = Discretizer.fitEqualFreq(rfm,
      Seq("recency", "frequency", "monetary"), 5)
    m.transform(rfm)
      .groupBy(col("recency_bin").cast("long").as("r"),
        col("frequency_bin").cast("long").as("f"),
        col("monetary_bin").cast("long").as("m"))
      .agg(count(lit(1)).as("n_customers"),
        round(Stats.dsum(col("monetary")), 4).as("sum_monetary"))
      .orderBy("r", "f", "m")
  }

  /** A17 — Pareto / ABC analysis: parts ranked by revenue, classified
    * by cumulative share (A ≤ 80%, B ≤ 95%, C rest). The cumulative
    * sum is the distributed two-phase [[PrefixScan]] — no
    * single-partition window — over exact integer cents, and the class
    * boundaries are pure integer comparisons (incl·5 ≤ tot·4), so
    * revenue ties cannot flip the per-class aggregates and no floating
    * comparison can diverge cross-engine.
    */
  private def qPareto(s: SparkSession, dir: String): DataFrame = {
    val pr = li(s, dir)
      .select(col("l_partkey"),
        expr("CAST(round(l_extendedprice * 100) AS LONG)").as("cents"))
      .groupBy("l_partkey").agg(sum("cents").as("cents"))
      .select(col("cents"), (-col("cents")).as("neg"))
    val (scanned, totals) = PrefixScan.exclusive(pr, "neg", Seq("cents"), "q143")
    val tot = totals(0)
    val incl = col("cum_cents_below") + col("cents")
    scanned.select(col("cents"),
        when(incl * 5 <= tot * 4L, "A")
          .when(incl * 20 <= tot * 19L, "B").otherwise("C").as("cls"))
      .groupBy("cls").agg(count(lit(1)).as("n_parts"),
        sum(col("cents")).as("revenue_cents"),
        round(sum(col("cents")).cast("double") / lit(tot.toDouble), 6)
          .as("rev_share"))
      .orderBy("cls")
  }

  /** A18 — market-basket association rules over brands co-occurring in
    * an order: support / confidence / lift for each brand pair. The
    * (order, brand) incidence deduplicates first (one shuffle, rows
    * bounded by orders × brands-per-order); the pair join shuffles on
    * the order key with per-key width bounded by the brand alphabet;
    * the part dim and the single-brand counts broadcast.
    */
  private def qBasket(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(s, dir, "part").select(col("p_partkey"), col("p_brand"))
    val ob = li(s, dir).select(col("l_orderkey"), col("l_partkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("ok"), col("p_brand").as("b"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q144", ob)
    val nOrders = ob.select("ok").distinct().count()
    val singles = ob.groupBy("b").agg(count(lit(1)).as("nb"))
    val pairs = ob.toDF("ok", "b1")
      .join(ob.toDF("ok2", "b2"), col("ok") === col("ok2") && col("b1") < col("b2"))
      .groupBy("b1", "b2").agg(count(lit(1)).as("n_pair"))
    pairs.join(broadcast(singles.toDF("b1", "n1")), "b1")
      .join(broadcast(singles.toDF("b2", "n2")), "b2")
      .where(col("n_pair") >= 5)
      .select(col("b1"), col("b2"), col("n_pair"),
        round(col("n_pair").cast("double") / lit(nOrders.toDouble), 6)
          .as("support"),
        round(col("n_pair").cast("double") / col("n1").cast("double"), 6)
          .as("confidence"),
        round(col("n_pair").cast("double") * lit(nOrders.toDouble) /
          (col("n1").cast("double") * col("n2").cast("double")), 6).as("lift"))
      .orderBy("b1", "b2")
  }

  /** W15 — autocorrelation function of the daily event-count series at
    * calendar lags 1..7. The heavy stage is the distributed daily
    * aggregate; the series itself is bounded by distinct days, so the
    * mean/denominator scalars and the lag equi-join run on a tiny
    * persisted frame. Deviation products are decimal-summed
    * (order-independent) per the [[Stats]] convention.
    */
  private def qAcf(s: SparkSession, dir: String): DataFrame = {
    val daily = ev(s, dir)
      .select(expr("(ts div 1000) div 86400000000").as("d"))
      .groupBy("d").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q145", daily)
    val mu = daily.agg(Stats.dmean(col("c").cast("double"))).head().getDouble(0)
    val dev = daily.select(col("d"), (col("c").cast("double") - lit(mu)).as("x"))
    val denom = dev.agg(Stats.dsum(col("x") * col("x"))).head().getDouble(0)
    dev.select(col("d"), col("x"),
        explode(array((1 to 7).map(i => lit(i)): _*)).as("k"))
      .join(dev.toDF("d2", "y"), col("d2") === col("d") + col("k"))
      .groupBy("k").agg(count(lit(1)).as("n_pairs"),
        round(Stats.dsum(col("x") * col("y")) / lit(denom), 6).as("acf"))
      .orderBy("k")
  }

  /** A19 — Jensen–Shannon divergence between the price distributions of
    * two segments over shared pooled-decile bins: the symmetric,
    * bounded drift measure complementing PSI (q63) and KS (q64). Edges
    * come from one exact distributed selection; per-(bin, group) counts
    * are ONE conditional aggregate; the ~10 ln-terms decimal-sum per
    * the q96 convention (`ln` of identical doubles is libm-identical).
    */
  private def qJsDiv(s: SparkSession, dir: String): DataFrame = {
    val base = li(s, dir).where(col("l_returnflag").isin("R", "N"))
      .select(col("l_returnflag").as("g"),
        col("l_extendedprice").cast("double").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q146", base)
    val edges = Quantiles.exactQuantiles(base, "v",
      (1 until 10).map(_.toDouble / 10)).distinct
    val bin = edges.foldLeft(lit(0)) { (acc, e) =>
      acc + when(col("v") > lit(e), 1).otherwise(0)
    }
    val cnt = base.groupBy(bin.as("bin")).agg(
      count(when(col("g") === "R", 1)).as("na"),
      count(when(col("g") === "N", 1)).as("nb"))
    val tot = cnt.agg(sum("na").as("ta"), sum("nb").as("tb"))
    val terms = cnt.crossJoin(tot)
      .select((col("na").cast("double") / col("ta").cast("double")).as("p"),
        (col("nb").cast("double") / col("tb").cast("double")).as("q"))
      .select(col("p"), col("q"), ((col("p") + col("q")) * 0.5).as("m"))
      .select(
        when(col("p") > 0, col("p") * log(col("p") / col("m")))
          .otherwise(0.0).as("tp"),
        when(col("q") > 0, col("q") * log(col("q") / col("m")))
          .otherwise(0.0).as("tq"))
    terms.agg(count(lit(1)).as("n_bins"),
      round((Stats.dsum(col("tp")) + Stats.dsum(col("tq"))) * 0.5, 6)
        .as("js_divergence"))
  }

  /** A20 — exact heavy hitters over document languages with a Misra–Gries
    * candidate prune ([[graft.core.HeavyHitters]]): one map-only
    * sketch pass emits ≤ k keys per partition, one recount pass counts
    * only candidates (everything else folds into an overflow bucket) —
    * at 100 TB of a high-cardinality key the shuffle carries the
    * candidate set, not one partial per distinct item. The exact
    * recount makes the output independent of the sketch's
    * order-sensitivity.
    */
  private def qHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    graft.core.HeavyHitters.exact(doc(s, dir).select(col("lang")), "lang", 5)
      .withColumnRenamed("item", "lang")
  }

  /** G1 — weighted PageRank over the nation trade graph (customer
    * nation → supplier nation, weighted by lineitem count). The edge
    * aggregation is the heavy distributed stage; the power iteration
    * ([[PageRank]]) is narrow joins + decimal-summed aggregates, and
    * the oracle unrolls the same ten iterations as generated CTEs.
    */
  private def qPageRank(s: SparkSession, dir: String): DataFrame = {
    val l = li(s, dir).select(col("l_orderkey"), col("l_suppkey"))
    val o = Tables.load(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val c = Tables.load(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
    val sup = Tables.load(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val edges = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
    val r = graft.core.PageRank.run(edges, d = 0.85, iters = 10, cacheKey = "q148")
    val nat = Tables.load(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
    r.join(broadcast(nat), col("node") === col("n_nationkey"))
      .select(col("n_name"), round(col("r"), 6).as("pr"))
      .orderBy("n_name")
  }

  /** W16 — Kaplan–Meier survival curve for time-to-purchase: per user,
    * duration (days) from first event to first purchase, censored at
    * the corpus horizon when no purchase occurs. The per-user
    * reduction is the distributed stage; at-risk counts and the
    * cumulative ln-product run on the duration table (bounded by
    * distinct day values), with ln terms decimal-summed per the q96
    * convention and a full-death guard (d = n ⇒ S = 0 thereafter).
    */
  private def qKaplanMeier(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = ev(s, dir).select(col("user_id"),
      expr("ts div 1000").as("us"), col("event_type"))
    val maxUs = e.agg(max("us")).head().getLong(0)
    val per = e.groupBy("user_id").agg(min("us").as("first_us"),
      min(when(col("event_type") === "purchase", col("us"))).as("p_us"))
    val tbl = per
      .select(expr(s"(coalesce(p_us, ${maxUs}) - first_us) div 86400000000").as("t"),
        when(col("p_us").isNotNull, 1L).otherwise(0L).as("died"))
      .groupBy("t").agg(sum("died").as("d"), count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q149", tbl)
    val tot = tbl.agg(sum("c")).head().getLong(0)
    val wPrev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    val wInc = Window.orderBy("t")
    val ar = tbl.withColumn("n_at_risk",
      lit(tot) - coalesce(sum("c").over(wPrev), lit(0L)))
    val term = when(col("d") < col("n_at_risk"),
      log(lit(1.0) - col("d").cast("double") / col("n_at_risk").cast("double"))
        .cast(DecimalType(38, 18)))
    val zf = when(col("d") >= col("n_at_risk"), 1).otherwise(0)
    ar.withColumn("zcum", max(zf).over(wInc))
      .withColumn("cum", sum(term).over(wInc))
      .where(col("d") > 0)
      .select(col("t"), col("n_at_risk"), col("d"),
        round(when(col("zcum") === 1, lit(0.0))
          .otherwise(exp(col("cum").cast("double"))), 6).as("survival"))
      .orderBy("t")
  }

  /** W17 — top first-5-event-type paths: the user-journey summary.
    * One key shuffle ranks events per user; paths assemble via
    * order-preserving array_sort over (rank, type) structs — no
    * unordered collect_list dependence — and the bounded path strings
    * aggregate map-side.
    */
  private def qEventPaths(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    ev(s, dir).select(col("user_id"), col("event_id"),
        expr("ts div 1000").as("us"), col("event_type"))
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
      .groupBy("user_id")
      .agg(expr("array_join(transform(array_sort(collect_list(struct(rn, event_type))), x -> x.event_type), '>')").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_users"))
      .orderBy(desc("n_users"), col("path"))
      .limit(20)
  }

  /** A21 — trimmed + winsorized mean of extended price at the 10/90
    * fences: the robust-location twins (drop the tails vs clamp them).
    * Edges come from one exact distributed selection; both means are
    * conditional decimal aggregates in ONE pass.
    */
  private def qTrimmedMean(s: SparkSession, dir: String): DataFrame = {
    val base = li(s, dir).select(col("l_extendedprice").cast("double").as("v"))
    val qs = Quantiles.exactQuantiles(base, "v", Seq(0.1, 0.9))
    val (p10, p90) = (qs(0), qs(1))
    val v = col("v")
    val kept = when(v >= p10 && v <= p90, v)
    val wins = when(v < p10, lit(p10)).when(v > p90, lit(p90)).otherwise(v)
    base.agg(count(lit(1)).as("n"),
      count(kept).as("n_kept"),
      round(Stats.dmean(kept), 6).as("trimmed_mean"),
      round(Stats.dmean(wins), 6).as("winsorized_mean"))
  }

  /** A22 — Mann–Whitney U (rank-sum) test between two order-priority
    * groups: the nonparametric twin of q141's Welch t. Ranks are the
    * distributed average-tie ranks of [[Rank.avgRank]] (no global
    * window); the tie-corrected normal approximation runs on exact
    * decimal rank sums.
    */
  private def qMannWhitney(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
      .select(col("o_orderpriority").as("g"),
        col("o_totalprice").cast("double").as("v"))
      .where(col("g").isin("1-URGENT", "5-LOW"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q152", o)
    val ranked = graft.core.Rank.avgRank(o, "v", "rk", "q152_rank")
    val ag = ranked.agg(
      count(when(col("g") === "1-URGENT", 1)).cast("double").as("n1"),
      count(when(col("g") === "5-LOW", 1)).cast("double").as("n2"),
      Stats.dsum(when(col("g") === "1-URGENT", col("rk"))).as("r1"))
    val t = col("t").cast("double")
    val tc = o.groupBy("v").agg(count(lit(1)).as("t"))
      .agg(Stats.dsum(t * t * t - t).as("tsum"))
    val n = col("n1") + col("n2")
    val u1 = col("r1") - col("n1") * (col("n1") + lit(1.0)) / lit(2.0)
    val sigma = sqrt(col("n1") * col("n2") / lit(12.0) *
      ((n + lit(1.0)) - col("tsum") / (n * (n - lit(1.0)))))
    ag.crossJoin(tc).select(
      col("n1").cast("long").as("n1"), col("n2").cast("long").as("n2"),
      round(u1, 4).as("u1"),
      round((u1 - col("n1") * col("n2") / lit(2.0)) / sigma, 6).as("z"))
  }

  /** A23 — two-proportion z-test on conversion (did the user purchase
    * at least twice — "ever purchased" saturates at ~1 in this data and
    * the pooled variance degenerates) between the even/odd user-id
    * cohorts: the categorical A/B primitive. One per-user reduction,
    * one conditional aggregate, pooled-variance z in mirrored double
    * arithmetic, null z when the pooled proportion is degenerate.
    */
  private def qPropZtest(s: SparkSession, dir: String): DataFrame = {
    val per = ev(s, dir).groupBy("user_id")
      .agg(when(sum(when(col("event_type") === "purchase", 1).otherwise(0))
        .geq(2), 1).otherwise(0).as("conv"))
      .select((col("user_id") % 2 === 0).as("a"), col("conv"))
    val ag = per.agg(
      count(when(col("a"), 1)).cast("double").as("n1"),
      count(when(!col("a"), 1)).cast("double").as("n2"),
      sum(when(col("a"), col("conv"))).cast("double").as("x1"),
      sum(when(!col("a"), col("conv"))).cast("double").as("x2"))
    val p1 = col("x1") / col("n1")
    val p2 = col("x2") / col("n2")
    val pp = (col("x1") + col("x2")) / (col("n1") + col("n2"))
    ag.select(col("n1").cast("long").as("n1"), col("n2").cast("long").as("n2"),
      col("x1").cast("long").as("conv1"), col("x2").cast("long").as("conv2"),
      round(p1, 6).as("p1"), round(p2, 6).as("p2"),
      round(when(pp > 0.0 && pp < 1.0,
        (p1 - p2) / sqrt(pp * (lit(1.0) - pp) *
          (lit(1.0) / col("n1") + lit(1.0) / col("n2")))), 6).as("z"))
  }

  /** W18 — classical seasonal decomposition of the daily event-count
    * series: trend = centered 7-row moving average (complete windows
    * only), seasonal = day-of-week mean of the detrended series,
    * residual = remainder. The distributed stage is the daily
    * aggregate; the decomposition runs on the bounded day table. Both
    * engines apply identical ROWS-window semantics, so parity holds
    * even across calendar gaps.
    */
  private def qSeasonalDecompose(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = ev(s, dir)
      .select(expr("(ts div 1000) div 86400000000").as("d"))
      .groupBy("d").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q154", daily)
    val w7 = Window.orderBy("d").rowsBetween(-3, 3)
    val dt = daily
      .withColumn("trend", when(count(lit(1)).over(w7) === 7,
        sum("c").over(w7).cast("double") / lit(7.0)))
      .withColumn("detr", col("c").cast("double") - col("trend"))
      .withColumn("dow", (col("d") + 4) % 7)
    val se = dt.groupBy("dow").agg(Stats.dmean(col("detr")).as("seasonal"))
    dt.join(broadcast(se), "dow")
      .select(col("d"), col("c"), round(col("trend"), 6).as("trend"),
        round(col("seasonal"), 6).as("seasonal"),
        round(col("detr") - col("seasonal"), 6).as("resid"))
      .orderBy("d")
  }

  /** F10 — quantile normalization of three lineitem measures onto
    * their consensus distribution (the cross-sample calibration step
    * from genomics, applied as feature prep): each column's sorted
    * values align by position via the distributed [[PrefixScan]] (no
    * global row_number window), the target is the positionwise mean,
    * and each column reports its correlation with — and mean absolute
    * deviation from — the consensus. Tied positions swap freely but
    * carry equal values, so every output is tie-order invariant.
    */
  private def qQuantileNormalize(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val tabs = cols.zipWithIndex.map { case (c, i) =>
      val base = li(s, dir).select(col(c).cast("double").as(s"v$i"),
        lit(1L).as("one"))
      val (scanned, _) = PrefixScan.exclusive(base, s"v$i", Seq("one"), s"q155_$i")
      scanned.select(col("cum_one_below").as("pos"), col(s"v$i"))
    }
    val t = tabs(0).join(tabs(1), "pos").join(tabs(2), "pos")
      .withColumn("tg", (col("v0") + col("v1") + col("v2")) / lit(3.0))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q155", t)
    val aggs = cols.indices.flatMap { i =>
      val x = col(s"v$i"); val y = col("tg")
      Seq(Stats.dsum(x).as(s"sx_$i"), Stats.dsum(x * x).as(s"sxx_$i"),
        Stats.dsum(x * y).as(s"sxy_$i"),
        Stats.dsum(abs(x - y)).as(s"sad_$i"))
    } ++ Seq(Stats.dsum(col("tg")).as("sy"),
      Stats.dsum(col("tg") * col("tg")).as("syy"),
      count(lit(1)).cast("double").as("n"))
    val m = t.agg(aggs.head, aggs.tail: _*)
    val rows = cols.zipWithIndex.map { case (c, i) =>
      val n = col("n")
      val vx = n * col(s"sxx_$i") - col(s"sx_$i") * col(s"sx_$i")
      val vy = n * col("syy") - col("sy") * col("sy")
      val num = n * col(s"sxy_$i") - col(s"sx_$i") * col("sy")
      struct(lit(c).as("column_name"),
        round(num / (sqrt(vx) * sqrt(vy)), 6).as("corr_consensus"),
        round(col(s"sad_$i") / n, 6).as("mad_consensus"))
    }
    m.select(explode(array(rows: _*)).as("p"))
      .select(col("p.column_name"), col("p.corr_consensus"),
        col("p.mad_consensus"))
      .orderBy("column_name")
  }

  /** G2 — triangle census of the brand co-occurrence graph (edges =
    * brand pairs sharing ≥ 5 orders, from the q144 incidence): global
    * clustering coefficient = 3·triangles / connected triples. The
    * oriented (b1 < b2) edge list makes each triangle count exactly
    * once; the census is two equi-joins over the persisted edge table
    * and the triple count is pure integer degree arithmetic.
    */
  private def qTriangles(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(s, dir, "part").select(col("p_partkey"), col("p_brand"))
    val ob = li(s, dir).select(col("l_orderkey"), col("l_partkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("ok"), col("p_brand").as("b"))
      .distinct()
    val e = ob.toDF("ok", "b1")
      .join(ob.toDF("ok2", "b2"), col("ok") === col("ok2") && col("b1") < col("b2"))
      .groupBy("b1", "b2").agg(count(lit(1)).as("np"))
      .where(col("np") >= 5).select("b1", "b2")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q156", e)
    val deg = e.select(col("b1").as("b")).union(e.select(col("b2").as("b")))
      .groupBy("b").agg(count(lit(1)).as("dg"))
    val triples = deg.agg(sum(col("dg") * (col("dg") - 1) / 2).as("triples"))
    val tri = e.toDF("x", "y")
      .join(e.toDF("y", "z2").withColumnRenamed("y", "y2"),
        col("y") === col("y2"))
      .join(e.toDF("x3", "z3"),
        col("x") === col("x3") && col("z2") === col("z3"))
      .agg(count(lit(1)).as("tri"))
    val ne = e.agg(count(lit(1)).as("n_edges"))
    ne.crossJoin(tri).crossJoin(triples)
      .select(col("n_edges"), col("tri").as("n_triangles"),
        col("triples").cast("long").as("n_triples"),
        round(lit(3.0) * col("tri").cast("double") /
          col("triples").cast("double"), 6).as("clustering_coef"))
  }

  /** A24 — log-rank test comparing time-to-purchase survival between
    * the even/odd user cohorts: the standard two-sample censored-data
    * test, sharing q149's duration machinery. Per event time, observed
    * vs expected cohort-A deaths under the hypergeometric null; the
    * statistic runs on decimal-summed terms over the bounded
    * distinct-duration table.
    */
  private def qLogRank(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = ev(s, dir).select(col("user_id"),
      expr("ts div 1000").as("us"), col("event_type"))
    val maxUs = e.agg(max("us")).head().getLong(0)
    val per = e.groupBy("user_id").agg(min("us").as("first_us"),
      min(when(col("event_type") === "purchase", col("us"))).as("p_us"))
    val tbl = per.select(
        expr(s"(coalesce(p_us, ${maxUs}) - first_us) div 86400000000").as("t"),
        when(col("p_us").isNotNull, 1L).otherwise(0L).as("died"),
        (col("user_id") % 2 === 0).as("a"))
      .groupBy("t").agg(
        sum(when(col("a"), col("died")).otherwise(0L)).as("d1"),
        sum("died").as("d"),
        count(when(col("a"), 1)).as("c1"),
        count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q157", tbl)
    val tots = tbl.agg(sum("c1"), sum("c")).head()
    val (tot1, tot) = (tots.getLong(0), tots.getLong(1))
    val wPrev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    val ar = tbl
      .withColumn("n1", lit(tot1) - coalesce(sum("c1").over(wPrev), lit(0L)))
      .withColumn("n", lit(tot) - coalesce(sum("c").over(wPrev), lit(0L)))
      .where(col("d") > 0)
    val dD = col("d").cast("double"); val n1D = col("n1").cast("double")
    val nD = col("n").cast("double")
    val e1 = dD * n1D / nD
    val v1 = when(col("n") > 1,
      dD * (n1D / nD) * (lit(1.0) - n1D / nD) *
        (nD - dD) / (nD - lit(1.0))).otherwise(lit(0.0))
    val agg = ar.agg(count(lit(1)).as("n_event_times"),
      Stats.dsum(col("d1").cast("double") - e1).as("oe"),
      Stats.dsum(v1).as("v"))
    agg.select(col("n_event_times"), round(col("oe"), 6).as("o_minus_e"),
      round(col("v"), 6).as("var_sum"),
      round(col("oe") / sqrt(col("v")), 6).as("z"))
  }

  /** W19 — Pettitt changepoint test on the daily event-count series:
    * the rank-based nonparametric location-shift detector. Ranks come
    * from the windowless [[graft.core.Rank.avgRank]]; the U statistic
    * is exact integer arithmetic over cumulative rank sums on the
    * bounded day table, and the changepoint is the earliest argmax of
    * |U|.
    */
  private def qPettitt(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = ev(s, dir)
      .select(expr("(ts div 1000) div 86400000000").as("d"))
      .groupBy("d").agg(count(lit(1)).cast("double").as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q158", daily)
    val nN = daily.count()
    val ranked = graft.core.Rank.avgRank(daily, "c", "rk", "q158_rank")
    val wInc = Window.orderBy("d")
    val ut = ranked
      .withColumn("pos", row_number().over(wInc))
      .withColumn("srk", sum(col("rk").cast(DecimalType(38, 10))).over(wInc)
        .cast("double"))
      .where(col("pos") < nN) // U_n ≡ 0 by construction; t ranges 1..n−1
      .select(col("d"),
        (lit(2.0) * col("srk") - col("pos").cast("double") *
          lit((nN + 1).toDouble)).as("u"))
    val top = ut.orderBy(abs(col("u")).desc, col("d")).limit(1)
    val k = abs(col("u"))
    top.select(col("d").as("changepoint_day"), col("u").cast("long").as("u"),
      round(lit(2.0) * exp(lit(-6.0) * k * k /
        lit((nN.toDouble * nN * nN + nN.toDouble * nN))), 6).as("p_approx"))
  }

  /** T1 — pointwise mutual information of word pairs co-occurring in a
    * document: the collocation/association mine over the corpus. The
    * (doc, word) incidence deduplicates once (the q144 basket shape on
    * text); pair counts shuffle on the doc key with per-doc width
    * bounded by the distinct-word count; PMI is mirrored double
    * arithmetic over exact counts.
    */
  private def qPmi(s: SparkSession, dir: String): DataFrame = {
    val dw = doc(s, dir).select(col("doc_id"),
        explode(expr("filter(split(text, ' '), t -> t != '')")).as("w"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q159", dw)
    val nD = dw.select("doc_id").distinct().count()
    val wc = dw.groupBy("w").agg(count(lit(1)).as("cw"))
    val pairs = dw.toDF("doc_id", "w1")
      .join(dw.toDF("doc2", "w2"),
        col("doc_id") === col("doc2") && col("w1") < col("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cab"))
      .where(col("cab") >= 5)
    pairs.join(broadcast(wc.toDF("w1", "c1")), "w1")
      .join(broadcast(wc.toDF("w2", "c2")), "w2")
      .select(col("w1"), col("w2"), col("cab"),
        round(log(col("cab").cast("double") * lit(nD.toDouble) /
          (col("c1").cast("double") * col("c2").cast("double"))), 6).as("pmi"))
      .orderBy(desc("pmi"), col("w1"), col("w2"))
      .limit(20)
  }

  /** O6 — CUBE over (returnflag, linestatus): all four grouping sets in
    * ONE pass — Spark expands the grouping sets map-side and the
    * partials stay mergeable decimal sums, so the cube costs one
    * shuffle, not four scans. `grouping_id` disambiguates levels; null
    * markers project to 'ALL' so the output carries no null-ordering
    * ambiguity between engines.
    */
  private def qCube(s: SparkSession, dir: String): DataFrame =
    li(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        round(Stats.dsum(col("l_quantity")), 4).as("sum_qty"),
        round(Stats.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("revenue"))
      .select(col("gid").cast("long").as("gid"),
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("sum_qty"), col("revenue"))
      .orderBy("gid", "rf", "ls")

  /** A25 — Kruskal–Wallis H across the returnflag groups on quantity:
    * the k-sample generalization of Mann–Whitney. Ranks come from the
    * windowless [[graft.core.Rank.avgRank]] (prefix scan over the
    * bounded distinct-value table — quantity has ~50 distinct values,
    * so ties dominate and the tie correction is load-bearing). Rank
    * sums are decimal partials; H and the tie term are mirrored double
    * arithmetic over exact counts.
    */
  private def qKruskal(s: SparkSession, dir: String): DataFrame = {
    val d = col("l_quantity").cast("double")
    val base = li(s, dir)
      .where(col("l_quantity").isNotNull && !isnan(d))
      .select(col("l_returnflag").as("g"), d.as("v"))
    val ranked = graft.core.Rank.avgRank(base, "v", "rk", "q161_rank")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q161", ranked)
    val grp = ranked.groupBy("g").agg(count(lit(1)).as("nj"),
      Stats.dsum(col("rk")).as("rj"))
    // second-level rj²/nj terms are wide doubles whose decimal casts
    // differ between engines in low digits — over 3 rows use the
    // order-defined IEEE fold instead (see orderedFoldSum)
    val summ = grp.agg(sum("nj").as("n"), count(lit(1)).as("k"),
      orderedFoldSum(col("g"),
        col("rj") * col("rj") / col("nj").cast("double")).as("s2"))
    val ties = ranked.groupBy("v")
      .agg(count(lit(1)).cast("double").as("t"))
      .agg(Stats.dsum(col("t") * col("t") * col("t") - col("t")).as("tsum"))
    val nD = col("n").cast("double")
    val h = lit(12.0) / (nD * (nD + lit(1.0))) * col("s2") -
      lit(3.0) * (nD + lit(1.0))
    val cc = lit(1.0) - col("tsum") / (nD * nD * nD - nD)
    summ.crossJoin(ties).select(col("n"), col("k"),
      round(h, 6).as("h"), round(cc, 6).as("tie_c"),
      round(h / cc, 6).as("h_adj"))
  }

  /** A26 — Jarque–Bera normality screen per numeric column: skewness,
    * excess kurtosis, and JB = n/6·(S² + K²/4) from CENTRAL moments —
    * one fused pass for all means, one fused pass for all (x−μ)^p
    * sums, both over the shared cached stats slice. Centering first
    * keeps the decimal partials inside DECIMAL(38,10) headroom (raw
    * Σx⁴ of a 10⁵-scale column would overflow near SF1000); μ is a
    * driver scalar folded into the second pass as a literal.
    */
  private def qJarqueBera(s: SparkSession, dir: String): DataFrame = {
    val cols = lineitemNumerics
    val t = par(liStats(s, dir))
    def vd(c: String) = {
      val d = col(c).cast("double")
      when(col(c).isNotNull && !isnan(d), d)
    }
    val meanAggs = cols.flatMap { c =>
      Seq(Stats.dsum(vd(c)).as(s"s_$c"), count(vd(c)).as(s"n_$c"))
    }
    val mrow = t.agg(meanAggs.head, meanAggs.tail: _*).head()
    val mus = cols.map { c =>
      c -> mrow.getAs[Double](s"s_$c") / mrow.getAs[Long](s"n_$c").toDouble
    }.toMap
    val cAggs = cols.flatMap { c =>
      val v = vd(c) - lit(mus(c))
      Seq(count(vd(c)).as(s"n_$c"), Stats.dsum(v * v).as(s"m2_$c"),
        Stats.dsum(v * v * v).as(s"m3_$c"),
        Stats.dsum(v * v * v * v).as(s"m4_$c"))
    }
    val m = t.agg(cAggs.head, cAggs.tail: _*)
    val rows = cols.map { c =>
      val nD = col(s"n_$c").cast("double")
      val m2 = col(s"m2_$c") / nD
      val m3 = col(s"m3_$c") / nD
      val m4 = col(s"m4_$c") / nD
      val sk = m3 / pow(m2, lit(1.5))
      val ku = m4 / (m2 * m2) - lit(3.0)
      struct(lit(c).as("column_name"), col(s"n_$c").as("n"),
        round(sk, 6).as("skewness"), round(ku, 6).as("kurtosis_excess"),
        round(nD / lit(6.0) * (sk * sk + ku * ku / lit(4.0)), 6).as("jb"))
    }
    m.select(explode(array(rows: _*)).as("p"))
      .select(col("p.column_name"), col("p.n"), col("p.skewness"),
        col("p.kurtosis_excess"), col("p.jb"))
      .orderBy("column_name")
  }

  /** A27 — one-way ANOVA F across the returnflag groups on extended
    * price: between/within sums of squares from per-group decimal
    * partials of the CENTERED values (grand mean subtracted first, the
    * q162 pattern). Centering is load-bearing for cross-engine
    * determinism, not just conditioning: uncentered Σsj²/nj terms have
    * 10-bit binary fractions, so their 54-bit-precision sums land on
    * exact double midpoints where Java (half-up) and strtod
    * (half-even) disagree — observed 1-ulp flips at two of three
    * scales. Centered terms carry full-length decimal tails, making
    * midpoints measure-zero. The grand totals derive from the k group
    * rows, so the second aggregation is over a bounded table.
    */
  private def qAnova(s: SparkSession, dir: String): DataFrame = {
    val d = col("l_extendedprice").cast("double")
    val v = when(col("l_extendedprice").isNotNull && !isnan(d), d)
    centeredAnovaF(li(s, dir).select(col("l_returnflag").as("g"), v.as("v")))
  }

  /** Shared core of q163/q172: one-way F over a (g, v) frame with the
    * grand mean subtracted first (see qAnova's determinism note —
    * centering makes the double-midpoint tie class measure-zero).
    * [[centeredAnovaSql]] is its oracle twin over a `d(g, v)` CTE.
    */
  private def centeredAnovaF(gv: DataFrame): DataFrame = {
    val mrow = gv.agg(Stats.dsum(col("v")).as("s"), count(col("v")).as("c")).head()
    // round the centering constant to 6 dp: every caller feeds v with
    // ≤6 decimal places, so vc = v − mu stays EXACTLY representable in
    // DECIMAL(38,10) and the first-level sums are decimal-exact on both
    // engines. An unrounded mu has a full double fraction, and the two
    // engines' double→decimal casts disagree on half-ulp cases (Spark
    // shortest-repr string vs DuckDB ×10¹⁰ double multiply) — observed
    // as a last-digit ss_within flip on q195 at sf0.1. Centering is a
    // numerical-conditioning device; a ≤5e-7 shift of the center is
    // statistically nil and F is invariant to it up to that epsilon.
    val mu = math.round(
      mrow.getAs[Double]("s") / mrow.getAs[Long]("c").toDouble * 1e6) / 1e6
    // Two determinism guards, both observed failing in the wild:
    // centering makes the grp-level sums well-conditioned (see qAnova
    // note), and the SECOND level avoids decimal casts entirely —
    // both engines' double→decimal casts are APPROXIMATIONS for wide
    // values (Spark goes through the shortest-repr string, DuckDB
    // multiplies by 10¹⁰ in double), whose low-digit junk surfaces
    // whenever a small-row-count sum lands near a double rounding
    // boundary. Over the BOUNDED group table the order-defined IEEE
    // fold is exactly mirrorable instead (list_reduce ORDER BY g).
    val vc = col("v") - lit(mu)
    // Integer micro-unit accumulation: vc is a ≤6-dp value (callers
    // feed ≤6-dp v, mu is 6-dp), so w = round(vc·10⁶) recovers its
    // EXACT integer micro-units on both engines (the double is within
    // 3e-5 of the integer — any rounding convention agrees), and Σw,
    // Σw² in exact decimal arithmetic are bitwise mirrorable. Summing
    // vc² as doubles is not: the product carries a full fraction, and
    // the engines' double→decimal casts (Spark shortest-repr string,
    // DuckDB ×10^scale double multiply) disagree on half-ulp cases —
    // observed flipping q195's ss_within last ulp at sf0.1.
    val w = round(vc * lit(1000000.0)).cast(DecimalType(38, 0))
    val grp = gv.groupBy("g")
      .agg(count(vc).as("nj"),
        (sum(w).cast(DoubleType) / lit(1000000.0)).as("sj"),
        (sum(w * w).cast(DoubleType) / lit(1.0e12)).as("sj2"))
    val njD = col("nj").cast("double")
    val summ = grp.agg(sum("nj").as("n"), count(lit(1)).as("k"),
      orderedFoldSum(col("g"), col("sj")).as("st"),
      orderedFoldSum(col("g"),
        col("sj2") - col("sj") * col("sj") / njD).as("ssw"),
      orderedFoldSum(col("g"), col("sj") * col("sj") / njD).as("sb_part"))
    val nD = col("n").cast("double"); val kD = col("k").cast("double")
    val ssb = col("sb_part") - col("st") * col("st") / nD
    val f = (ssb / (kD - lit(1.0))) / (col("ssw") / (nD - kD))
    // SS columns round to INTEGERS, not 6 dp: at ss ~ 1e14, DuckDB's
    // round(x, 6) computes x·10⁶ (≈1e20, far past 2⁵³) and hands back a
    // DIFFERENT double — the scale-0 round has no multiply and both
    // engines agree. Sub-integer digits of a 1e14 sum are noise anyway;
    // f_stat is O(1) and keeps its 6 dp.
    summ.select(col("n"), col("k"), round(ssb).as("ss_between"),
      round(col("ssw")).as("ss_within"), round(f, 6).as("f_stat"))
  }

  /** Order-defined IEEE sum over a BOUNDED group table (second-level
    * aggregates): collect (key, term) pairs, sort, left-fold plain
    * double adds — NO decimal casts. Both engines' double→decimal
    * casts are approximations for wide values (Spark rounds through
    * the shortest-repr string, DuckDB multiplies by 10^scale in
    * double), and over a handful of rows that junk is not averaged
    * away — observed flipping q172's ss_within across the nearest-
    * double boundary. The fold is mirrored exactly by
    * `list_reduce(list(term ORDER BY key), (s, x) -> s + x)`.
    */
  private def orderedFoldSum(key: Column, term: Column): Column = {
    val arr = array_sort(collect_list(struct(key.as("k"), term.as("v"))))
    aggregate(slice(arr, lit(2), size(arr) - lit(1)),
      element_at(arr, 1).getField("v"), (s, x) => s + x.getField("v"))
  }

  /** Oracle twin of [[centeredAnovaF]]: emits the full statement given
    * the body of a `d` CTE producing (g, v) rows.
    */
  private def centeredAnovaSql(dBody: String): String = {
    val nD = "CAST(n AS DOUBLE)"; val kD = "CAST(k AS DOUBLE)"
    val ssb = "(sb_part - st * st / " + nD + ")"
    val vc = "(v - m)"
    s"""WITH d AS ($dBody),
       | mu AS (SELECT round(${Stats.Sql.dsumWide("v")} /
       |   CAST(count(v) AS DOUBLE), 6) AS m FROM d),
       | grp AS (SELECT g, count($vc) AS nj,
       |   CAST(CAST(sum(CAST(round(($vc) * 1000000.0) AS HUGEINT)) AS VARCHAR)
       |     AS DOUBLE) / 1000000.0 AS sj,
       |   CAST(CAST(sum(CAST(round(($vc) * 1000000.0) AS HUGEINT) *
       |     CAST(round(($vc) * 1000000.0) AS HUGEINT)) AS VARCHAR)
       |     AS DOUBLE) / 1.0e12 AS sj2
       |  FROM d, mu GROUP BY g),
       | summ AS (SELECT CAST(sum(nj) AS BIGINT) AS n, count(*) AS k,
       |   list_reduce(list(sj ORDER BY g), (s, x) -> s + x) AS st,
       |   list_reduce(list(sj2 - sj * sj / CAST(nj AS DOUBLE) ORDER BY g),
       |     (s, x) -> s + x) AS ssw,
       |   list_reduce(list(sj * sj / CAST(nj AS DOUBLE) ORDER BY g),
       |     (s, x) -> s + x) AS sb_part FROM grp)
       | SELECT n, k, round($ssb) AS ss_between, round(ssw) AS ss_within,
       |  round(($ssb / ($kD - 1.0)) / (ssw / ($nD - $kD)), 6) AS f_stat
       | FROM summ""".stripMargin.replaceAll("\n", " ")
  }

  /** T2 — BM25 relevance scoring of the corpus against a fixed term
    * set: the classic retrieval ranker over the q81 vocabulary
    * machinery. Corpus stats (N, df per term, avgdl) reduce to a
    * handful of driver scalars in ONE pass over the tokenized frame;
    * scoring is then a pure codegen'd map stage (idf constants folded
    * into the plan) + TakeOrdered top-k — no join, no second shuffle.
    */
  /** The BM25-scored frame behind q164 and q212's lexical leg:
    * (doc_id, dl, score) with the RAW score (rounding happens at each
    * query's output edge — q212 ranks on the raw value exactly like
    * the oracle does).
    */
  private def bm25Frame(s: SparkSession, dir: String,
                        terms: Seq[String]): DataFrame = {
    val base = doc(s, dir)
      .select(col("doc_id"), expr("split(text, ' ')").as("toks"))
      .withColumn("dl", size(col("toks")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q164", base)
    val statAggs = Seq(count(lit(1)).as("n_docs"),
      Stats.dsum(col("dl")).as("sdl")) ++
      terms.zipWithIndex.map { case (t, i) =>
        count(when(array_contains(col("toks"), t), 1)).as(s"df_$i")
      }
    val st = base.agg(statAggs.head, statAggs.tail: _*).head()
    val nD = st.getAs[Long]("n_docs").toDouble
    val avgdl = st.getAs[Double]("sdl") / nD
    val dlD = col("dl").cast("double")
    val score = terms.zipWithIndex.map { case (t, i) =>
      val dfD = st.getAs[Long](s"df_$i").toDouble
      val idf = math.log((nD - dfD + 0.5) / (dfD + 0.5) + 1.0)
      val tf = size(expr(s"filter(toks, x -> x = '$t')")).cast("double")
      lit(idf) * tf / (tf + lit(1.2) *
        (lit(1.0) - lit(0.75) + lit(0.75) * dlD / lit(avgdl)))
    }.reduce(_ + _)
    base.select(col("doc_id"), col("dl").cast("long").as("dl"),
      score.as("score"))
  }

  private def qBm25(s: SparkSession, dir: String): DataFrame =
    bm25Frame(s, dir, Seq("join", "hash", "filter"))
      .select(col("doc_id"), col("dl"), round(col("score"), 6).as("bm25"))
      .orderBy(desc("bm25"), col("doc_id")).limit(20)

  /** Q1 — referential-integrity audit across the star schema's FK
    * relationships (+ one deliberately-corrupted twin proving
    * detection): the deequ-style orphan check. Each relationship
    * reduces the child to DISTINCT (fk, row-count) pairs FIRST — only
    * fixed-width keys and counts shuffle, never payload — then one
    * left-anti join against the parent's key set. Child rows re-derive
    * from the same bounded key table, so the audit costs one narrow
    * shuffle + one anti-join per relationship.
    */
  private def qRefIntegrity(s: SparkSession, dir: String): DataFrame = {
    def rel(name: String, child: DataFrame, fk: String,
            parent: DataFrame, pk: String): DataFrame = {
      val ck = child.select(col(fk).as("k")).where(col("k").isNotNull)
        .groupBy("k").agg(count(lit(1)).as("cnt"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      graft.core.Caches.retain(s"q165_$name", ck)
      val orph = ck.join(parent.select(col(pk).as("k")).distinct(),
        Seq("k"), "left_anti")
      ck.agg(count(lit(1)).as("fk_keys"), sum("cnt").as("child_rows"))
        .crossJoin(orph.agg(count(lit(1)).as("orphan_keys"),
          coalesce(sum("cnt"), lit(0L)).as("orphan_rows")))
        .select(lit(name).as("relationship"), col("fk_keys"),
          col("child_rows").cast("long").as("child_rows"),
          col("orphan_keys"),
          col("orphan_rows").cast("long").as("orphan_rows"))
    }
    val o = Tables.load(s, dir, "orders"); val liT = li(s, dir)
    val cust = Tables.load(s, dir, "customer")
    Seq(
      rel("customer.nationkey->nation", cust, "c_nationkey",
        Tables.load(s, dir, "nation"), "n_nationkey"),
      rel("lineitem.orderkey->orders", liT, "l_orderkey", o, "o_orderkey"),
      rel("lineitem.orderkey->orders[mod3-corrupted]", liT, "l_orderkey",
        o.where(col("o_orderkey") % 3 =!= 0), "o_orderkey"),
      rel("lineitem.partkey->part", liT, "l_partkey",
        Tables.load(s, dir, "part"), "p_partkey"),
      rel("orders.custkey->customer", o, "o_custkey", cust, "c_custkey"))
      .reduce(_ union _).orderBy("relationship")
  }

  /** A28 — Kendall tau-b between daily order count and daily revenue:
    * the rank-correlation twin of q121's Spearman, computed by exact
    * pair classification over the day-level series. The pair join is
    * bounded by the CALENDAR (distinct days), not the data — at any SF
    * it is a ~2.4k×2.4k comparison of 24-byte rows — so the quadratic
    * step is scale-free by construction; the revenue doubles feeding
    * the equality tests are wide-sum parity-safe on both engines.
    */
  private def qKendall(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.load(s, dir, "orders")
      .groupBy(expr("unix_timestamp(o_orderdate) div 86400").as("d"))
      .agg(count(lit(1)).cast("double").as("x"),
        Stats.dsum(col("o_totalprice")).as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q166", daily)
    val nDays = daily.count()
    val p = daily.toDF("d1", "x1", "y1")
      .join(daily.toDF("d2", "x2", "y2"), col("d1") < col("d2"))
    val conc = (col("x1") < col("x2") && col("y1") < col("y2")) ||
      (col("x1") > col("x2") && col("y1") > col("y2"))
    val disc = (col("x1") < col("x2") && col("y1") > col("y2")) ||
      (col("x1") > col("x2") && col("y1") < col("y2"))
    val tx = col("x1") === col("x2") && col("y1") =!= col("y2")
    val ty = col("y1") === col("y2") && col("x1") =!= col("x2")
    val agg = p.agg(count(when(conc, 1)).as("nc"), count(when(disc, 1)).as("nd"),
      count(when(tx, 1)).as("tie_x"), count(when(ty, 1)).as("tie_y"))
    val ncD = col("nc").cast("double"); val ndD = col("nd").cast("double")
    val txD = col("tie_x").cast("double"); val tyD = col("tie_y").cast("double")
    agg.select(lit(nDays).as("n_days"), col("nc"), col("nd"),
      col("tie_x"), col("tie_y"),
      round((ncD - ndD) /
        sqrt((ncD + ndD + txD) * (ncD + ndD + tyD)), 6).as("tau_b"))
  }

  /** W20 — Holt linear-trend smoothing of each nation's monthly
    * revenue ([[graft.seq.Rolling.holtByKey]]): level+trend state with
    * a one-step forecast. One narrow join tree (orders⋈customer
    * shuffled on custkey, nation broadcast), one shuffle on the
    * 25-key group, per-key fold state bounded by the month count.
    */
  private def qHolt(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders").select(col("o_custkey"),
      col("o_totalprice"),
      (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("ym"))
    val c = Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.load(s, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    val monthly = o.join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("ym"))
      .agg(Stats.dsum(col("o_totalprice")).as("rev"))
    graft.seq.Rolling.holtByKey(monthly, Seq("n_name"), "ym", "rev",
        alpha = 0.5, beta = 0.3)
      .select(col("n_name"), col("n"), round(col("level"), 6).as("level"),
        round(col("trend"), 6).as("trend"),
        round(col("forecast"), 6).as("forecast"))
      .orderBy("n_name")
  }

  /** S1' — item–item collaborative similarity: cosine between brands
    * over the customer×brand purchase-count matrix (the
    * neighborhood-method recommender primitive). Entirely EXACT
    * integer arithmetic until the final cosine: counts, squared norms
    * and pair dot-products are integer sums (bitwise cross-engine),
    * so no decimal machinery is needed. The pair join shuffles the
    * (customer, brand, n) incidence on the customer key with per-key
    * fan-out bounded by the brand count (~25), the same shape as q144
    * baskets; norms broadcast back onto the bounded pair table.
    */
  private def qItemSim(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(s, dir, "part").select(col("p_partkey"), col("p_brand"))
    val o = Tables.load(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val cb = li(s, dir).select(col("l_orderkey"), col("l_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("o_custkey").as("cust"), col("p_brand").as("b"))
      .agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q168", cb)
    val norms = cb.groupBy("b").agg(sum(col("n") * col("n")).as("sn2"))
      .select(col("b"), sqrt(col("sn2").cast("double")).as("nrm"))
    val pairs = cb.toDF("cust", "b1", "n1")
      .join(cb.toDF("cust2", "b2", "n2"),
        col("cust") === col("cust2") && col("b1") < col("b2"))
      .groupBy("b1", "b2").agg(sum(col("n1") * col("n2")).as("dot"))
    pairs
      .join(broadcast(norms.toDF("b1", "nrm1")), "b1")
      .join(broadcast(norms.toDF("b2", "nrm2")), "b2")
      .select(col("b1"), col("b2"), col("dot").cast("long").as("dot"),
        round(col("dot").cast("double") / (col("nrm1") * col("nrm2")), 6)
          .as("cosine"))
      .orderBy(desc("cosine"), col("b1"), col("b2"))
      .limit(20)
  }

  /** Q2 — functional-dependency audit (X → Y candidates with the g3
    * violation measure: minimum rows to delete for the FD to hold =
    * Σ_x (n_x − max_y n_xy)). Two narrow count shuffles per candidate
    * — (x,y) pairs then x — nothing wider than keys and counts ever
    * moves; TPC-H's brand→mfgr FD genuinely holds while type→size is
    * genuinely violated, so both verdict branches are exercised.
    */
  private def qFdAudit(s: SparkSession, dir: String): DataFrame = {
    def fd(name: String, t: DataFrame, x: String, y: String): DataFrame = {
      val perX = t.groupBy(col(x).as("x"), col(y).as("y"))
        .agg(count(lit(1)).as("c"))
        .groupBy("x").agg(sum("c").as("nx"), max("c").as("mx"),
          count(lit(1)).as("ndv"))
      perX.agg(count(lit(1)).as("lhs_values"),
        count(when(col("ndv") > 1, 1)).as("violating_lhs"),
        sum(col("nx") - col("mx")).as("vr"))
        .select(lit(name).as("fd"), col("lhs_values"), col("violating_lhs"),
          col("vr").cast("long").as("violation_rows"),
          (col("violating_lhs") === 0).as("holds"))
    }
    val part = Tables.load(s, dir, "part")
    Seq(
      fd("customer: c_nationkey->c_mktsegment",
        Tables.load(s, dir, "customer"), "c_nationkey", "c_mktsegment"),
      fd("nation: n_nationkey->n_regionkey",
        Tables.load(s, dir, "nation"), "n_nationkey", "n_regionkey"),
      fd("orders: o_custkey->o_orderpriority",
        Tables.load(s, dir, "orders"), "o_custkey", "o_orderpriority"),
      fd("part: p_name->p_brand", part, "p_name", "p_brand"),
      fd("part: p_type->p_size", part, "p_type", "p_size"))
      .reduce(_ union _).orderBy("fd")
  }

  /** A29 — NDCG@100 of the returnflag classifier ranking (binary
    * gains): the graded ranking-quality companion to q10's AUC. The
    * top-k cut is a TakeOrdered (never a global sort); positions are
    * minted by a window over the ALREADY-bounded k-row frame, so the
    * single-partition window is k-bounded by construction. IDCG sums
    * the ideal discount series over a driver-bounded range.
    */
  private def qNdcg(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = 100
    val d = li(s, dir).select(
      when(col("l_returnflag") === "R", 1).otherwise(0).as("label"),
      col("l_extendedprice").as("score"), col("l_orderkey"), col("l_linenumber"))
    val nPos = d.agg(sum("label")).head().getLong(0)
    val ord = Seq(desc("score"), asc("l_orderkey"), asc("l_linenumber"))
    val top = d.orderBy(ord: _*).limit(k)
      .withColumn("pos", row_number().over(Window.orderBy(ord: _*)))
    val dcg = top.agg(Stats.dsum(col("label").cast("double") /
      log2(col("pos").cast("double") + lit(1.0))).as("dcg"))
    val idcg = s.range(1L, math.min(k.toLong, nPos) + 1L).toDF("i")
      .agg(Stats.dsum(lit(1.0) /
        log2(col("i").cast("double") + lit(1.0))).as("idcg"))
    dcg.crossJoin(idcg).select(lit(k).as("k"), lit(nPos).as("n_pos"),
      round(col("dcg"), 6).as("dcg"), round(col("idcg"), 6).as("idcg"),
      round(col("dcg") / col("idcg"), 6).as("ndcg"))
  }

  /** A30 — decision-stump split finder: weighted Gini impurity of the
    * label at each decile threshold of the score column — the
    * single-feature CART split step, and the one-node version of a
    * tree ensemble's feature-importance scan. Thresholds come from the
    * distributed exact-selection engine; ALL candidate splits evaluate
    * in ONE conditional-aggregation pass (no per-threshold scans), so
    * the scan count is independent of the candidate count.
    */
  private def qStump(s: SparkSession, dir: String): DataFrame = {
    val ps = (1 to 9).map(_ / 10.0)
    val d = col("l_extendedprice").cast("double")
    val base = li(s, dir)
      .select(when(col("l_returnflag") === "R", 1).otherwise(0).as("y"),
        d.as("v"))
      .where(col("v").isNotNull && !isnan(col("v")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q171", base)
    val ts = graft.core.OrderStats.quantilesOf(base, "v", ps)
    val aggs = Seq(count(lit(1)).as("n"), sum("y").as("pos")) ++
      ts.zipWithIndex.flatMap { case (t, i) =>
        Seq(count(when(col("v") <= lit(t), 1)).as(s"nl_$i"),
          sum(when(col("v") <= lit(t), col("y")).otherwise(0)).as(s"pl_$i"))
      }
    val m = base.agg(aggs.head, aggs.tail: _*)
    val rows = ts.zipWithIndex.map { case (t, i) =>
      val nD = col("n").cast("double")
      val nlD = col(s"nl_$i").cast("double")
      val nrD = nD - nlD
      val pL = col(s"pl_$i").cast("double") / nlD
      val pR = (col("pos").cast("double") - col(s"pl_$i").cast("double")) / nrD
      val gL = lit(1.0) - pL * pL - (lit(1.0) - pL) * (lit(1.0) - pL)
      val gR = lit(1.0) - pR * pR - (lit(1.0) - pR) * (lit(1.0) - pR)
      val g = when(col(s"nl_$i") > 0 && col(s"nl_$i") < col("n"),
        nlD / nD * gL + nrD / nD * gR)
      struct(lit(ps(i)).as("p"), lit(t).as("threshold"),
        col(s"nl_$i").as("n_left"), col(s"pl_$i").cast("long").as("pos_left"),
        round(g, 6).as("gini_split"))
    }
    m.select(explode(array(rows: _*)).as("r"))
      .select(col("r.p"), round(col("r.threshold"), 6).as("threshold"),
        col("r.n_left"), col("r.pos_left"), col("r.gini_split"))
      .orderBy("p")
  }

  /** A31 — Brown–Forsythe (median-based Levene) test for variance
    * homogeneity across the returnflag groups: the robust companion
    * to q163's mean-comparison F — same [[centeredAnovaF]] core, run
    * on per-group median absolute deviations. Group medians come from
    * the grouped exact-selection engine and join back broadcast, so
    * the transform stays a map stage.
    */
  private def qBrownForsythe(s: SparkSession, dir: String): DataFrame = {
    val d = col("l_extendedprice").cast("double")
    val base = li(s, dir)
      .select(col("l_returnflag").as("g"), d.as("v0"))
      .where(col("v0").isNotNull && !isnan(col("v0")))
    val med = graft.core.OrderStats
      .groupedQuantiles(base, "g", "v0", Seq(0.5))
      .select(col("g"), col("value").as("md"))
    centeredAnovaF(base.join(broadcast(med), "g")
      .select(col("g"), abs(col("v0") - col("md")).as("v")))
  }

  /** A32 — two-predictor OLS (extendedprice ~ quantity + discount) by
    * exact normal equations: grand means first (driver scalars), then
    * ONE pass of centered second moments (decimal partials, wide-sum
    * parity), then the closed-form 2×2 solve — no iteration, no
    * gradient steps, bitwise-reproducible. The R² derives from the
    * same moments (SSR = b₁S₁y + b₂S₂y), so the whole fit is two
    * scans total.
    */
  private def qOls(s: SparkSession, dir: String): DataFrame = {
    def vd(c: String) = {
      val d = col(c).cast("double")
      when(col(c).isNotNull && !isnan(d), d)
    }
    val ok = vd("l_extendedprice").isNotNull && vd("l_quantity").isNotNull &&
      vd("l_discount").isNotNull
    val base = li(s, dir).where(ok)
      .select(vd("l_extendedprice").as("y"), vd("l_quantity").as("x1"),
        vd("l_discount").as("x2"))
    val mrow = base.agg(Stats.dsum(col("y")).as("sy"),
      Stats.dsum(col("x1")).as("s1"), Stats.dsum(col("x2")).as("s2"),
      count(lit(1)).as("c")).head()
    val nL = mrow.getAs[Long]("c"); val nD = nL.toDouble
    val muY = mrow.getAs[Double]("sy") / nD
    val mu1 = mrow.getAs[Double]("s1") / nD
    val mu2 = mrow.getAs[Double]("s2") / nD
    val cy = col("y") - lit(muY); val c1 = col("x1") - lit(mu1)
    val c2 = col("x2") - lit(mu2)
    val m = base.agg(Stats.dsum(c1 * c1).as("s11"), Stats.dsum(c2 * c2).as("s22"),
      Stats.dsum(c1 * c2).as("s12"), Stats.dsum(c1 * cy).as("s1y"),
      Stats.dsum(c2 * cy).as("s2y"), Stats.dsum(cy * cy).as("syy"))
    val det = col("s11") * col("s22") - col("s12") * col("s12")
    val b1 = (col("s22") * col("s1y") - col("s12") * col("s2y")) / det
    val b2 = (col("s11") * col("s2y") - col("s12") * col("s1y")) / det
    val b0 = lit(muY) - b1 * lit(mu1) - b2 * lit(mu2)
    val r2 = (b1 * col("s1y") + b2 * col("s2y")) / col("syy")
    m.select(lit(nL).as("n"), round(b0, 6).as("b0"), round(b1, 6).as("b1"),
      round(b2, 6).as("b2"), round(r2, 6).as("r2"))
  }

  /** A33 — Cohen's kappa between two deterministic document-quality
    * raters (char-count vs token-count rules): chance-corrected
    * inter-rater agreement, the label-audit statistic for annotation
    * pipelines. One conditional-count pass; κ from exact cell counts.
    */
  private def qKappa(s: SparkSession, dir: String): DataFrame = {
    val r1 = col("n_chars") >= 500
    val r2 = size(expr("split(text, ' ')")) >= 80
    val m = doc(s, dir).agg(count(lit(1)).as("n"),
      count(when(r1 && r2, 1)).as("n11"),
      count(when(r1 && !r2, 1)).as("n10"),
      count(when(!r1 && r2, 1)).as("n01"),
      count(when(!r1 && !r2, 1)).as("n00"))
    val nD = col("n").cast("double")
    val po = (col("n11") + col("n00")).cast("double") / nD
    val pe = (col("n11") + col("n10")).cast("double") / nD *
      ((col("n11") + col("n01")).cast("double") / nD) +
      (col("n00") + col("n01")).cast("double") / nD *
        ((col("n00") + col("n10")).cast("double") / nD)
    m.select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
      round(po, 6).as("po"), round(pe, 6).as("pe"),
      round((po - pe) / (lit(1.0) - pe), 6).as("kappa"))
  }

  /** T3 — vocabulary overlap between corpus sources (Jaccard over
    * distinct word sets): the corpus-composition diagnostic before
    * mixing sources into a training set. The (source, word) incidence
    * deduplicates once; the pair join shuffles on the word key with
    * fan-out bounded by the source count squared.
    */
  private def qVocabOverlap(s: SparkSession, dir: String): DataFrame = {
    val sw = doc(s, dir).select(col("source"),
        explode(expr("filter(split(text, ' '), t -> t != '')")).as("w"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q175", sw)
    val vs = sw.groupBy("source").agg(count(lit(1)).as("v"))
    val pairs = sw.toDF("s1", "w")
      .join(sw.toDF("s2", "w2"), col("w") === col("w2") && col("s1") < col("s2"))
      .groupBy("s1", "s2").agg(count(lit(1)).as("inter"))
    pairs
      .join(broadcast(vs.toDF("s1", "v1")), "s1")
      .join(broadcast(vs.toDF("s2", "v2")), "s2")
      .select(col("s1"), col("s2"), col("v1"), col("v2"), col("inter"),
        round(col("inter").cast("double") /
          (col("v1") + col("v2") - col("inter")).cast("double"), 6)
          .as("jaccard"))
      .orderBy("s1", "s2")
  }

  /** R1/R3 oracle twin of q34 (which is rows-only by RNG nature): the
    * deterministic-hash sample composed with the deterministic-hash
    * permutation ([[graft.aug.Sampling.hashShuffled]]). The head of the
    * permutation plus the sample count pin BOTH the membership (R1) and
    * the ordering (R3) semantics in a cross-engine-checkable form.
    * Head extraction is TakeOrderedAndProject — distributed top-k, no
    * single-partition window.
    */
  private def qSampleShuffleAudit(s: SparkSession, dir: String): DataFrame = {
    val sampled = graft.aug.Sampling.hashSample(li(s, dir), "l_orderkey",
        fraction = 0.01, seed = 7L)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    graft.aug.Sampling.hashShuffled(sampled, "l_orderkey", 99L,
        col("l_orderkey"), col("l_linenumber"))
      .select(graft.aug.Sampling.keyBucket(col("l_orderkey"), 99L).as("shuffle_key"),
        col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .limit(50)
  }

  /** T-series lead–lag cross-correlation (CCF): Pearson correlation
    * between the daily click count and the purchase count k days LATER,
    * k = 0..5 — the "does activity lead conversions" diagnostic that
    * complements q145's autocorrelation. The daily frame is ≤ one row
    * per day, so the per-lag self-join fans out 6× over a tiny frame;
    * moments are decimal sums over integer-exact counts, so the oracle
    * math is digit-identical.
    */
  private def qCcf(s: SparkSession, dir: String): DataFrame = {
    val daily = ev(s, dir)
      .where(col("event_type").isin("click", "purchase"))
      .select(expr("(ts div 1000) div 86400000000").as("d"), col("event_type"))
      .groupBy("d")
      .agg(count(when(col("event_type") === "click", 1)).cast("double").as("x"),
        count(when(col("event_type") === "purchase", 1)).cast("double").as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q177", daily)
    val lagged = daily.select(col("d"), col("x"),
        explode(array((0 to 5).map(i => lit(i)): _*)).as("k"))
      .join(daily.select(col("d").as("d2"), col("y")),
        col("d2") === col("d") + col("k"))
    val n = col("n_pairs").cast("double")
    lagged.groupBy("k").agg(count(lit(1)).as("n_pairs"),
        Stats.dsum(col("x")).as("sx"), Stats.dsum(col("y")).as("sy"),
        Stats.dsum(col("x") * col("x")).as("sxx"),
        Stats.dsum(col("y") * col("y")).as("syy"),
        Stats.dsum(col("x") * col("y")).as("sxy"))
      .select(col("k"), col("n_pairs"),
        round((n * col("sxy") - col("sx") * col("sy")) /
          (sqrt(n * col("sxx") - col("sx") * col("sx")) *
           sqrt(n * col("syy") - col("sy") * col("sy"))), 6).as("ccf"))
      .orderBy("k")
  }

  /** Effect size between the click and purchase value distributions:
    * Cohen's d on the pooled sample SD, with the Hedges' g small-sample
    * correction — the "is the difference MEANINGFUL" companion to
    * q141's Welch significance test. Two mergeable moment aggregates;
    * scalar algebra on a one-row frame.
    */
  private def qCohensD(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).where(col("event_type").isin("click", "purchase"))
      .select(col("event_type").as("g"), col("value").cast("double").as("v"))
    val ag = e.groupBy("g").agg(count(lit(1)).cast("double").as("n"),
      Stats.dmean(col("v")).as("m"), Stats.dvarSamp(col("v")).as("s2"))
    val r = ag.agg(
      max(when(col("g") === "click", col("n"))).as("n1"),
      max(when(col("g") === "click", col("m"))).as("m1"),
      max(when(col("g") === "click", col("s2"))).as("s21"),
      max(when(col("g") === "purchase", col("n"))).as("n2"),
      max(when(col("g") === "purchase", col("m"))).as("m2"),
      max(when(col("g") === "purchase", col("s2"))).as("s22"))
    val dof = col("n1") + col("n2") - lit(2.0)
    val sp = sqrt(((col("n1") - lit(1.0)) * col("s21") +
      (col("n2") - lit(1.0)) * col("s22")) / dof)
    val dEff = (col("m1") - col("m2")) / sp
    r.select(col("n1").cast("long").as("n1"), col("n2").cast("long").as("n2"),
      round(col("m1"), 6).as("mean1"), round(col("m2"), 6).as("mean2"),
      round(sp, 6).as("pooled_sd"), round(dEff, 6).as("cohens_d"),
      round(dEff * (lit(1.0) - lit(3.0) / (lit(4.0) * dof - lit(1.0))), 6)
        .as("hedges_g"))
  }

  /** Herfindahl–Hirschman concentration of order revenue across
    * customers, per order priority: HHI = Σ share² — the market-
    * concentration audit (is one customer dominating a segment?).
    * Two-level aggregate: exact integer cents per (priority, customer),
    * then one mergeable moment pass per priority. Squaring happens in
    * DOUBLE on both engines (same IEEE op), the sums in DECIMAL.
    */
  private def qHhi(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.load(s, dir, "orders")
      .select(col("o_orderpriority").as("g"), col("o_custkey"),
        expr("CAST(round(o_totalprice * 100) AS LONG)").as("cents"))
      .groupBy("g", "o_custkey").agg(sum("cents").as("cents"))
    per.select(col("g"), col("cents").cast("double").as("c"))
      .groupBy("g").agg(count(lit(1)).as("n_customers"),
        Stats.dsum(col("c")).as("tot"),
        Stats.dsum(col("c") * col("c")).as("ss"))
      .select(col("g").as("priority"), col("n_customers"),
        round(col("tot") / lit(100.0), 2).as("revenue"),
        round(col("ss") / (col("tot") * col("tot")), 6).as("hhi"))
      .orderBy("priority")
  }

  /** Lorenz curve of customer lifetime order value in deciles: per
    * decile of customers (poorest→richest), the decile's share of total
    * revenue and the cumulative share — the inequality curve behind
    * q124's Gini scalar. Rank-range decile assignment WITHOUT a global
    * window: per DISTINCT value, the exclusive prefix count from
    * [[graft.core.PrefixScan]] gives the value's rank interval, and its
    * overlap with each decile's boundary interval is pure arithmetic —
    * tie-order-independent by construction, so engine-exact. At 100 TB
    * the scanned frame is one row per distinct value, not per customer.
    */
  private def qLorenz(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.load(s, dir, "orders")
      .select(col("o_custkey"),
        expr("CAST(round(o_totalprice * 100) AS LONG)").as("cents"))
      .groupBy("o_custkey").agg(sum("cents").as("cents"))
    val byVal = per.groupBy("cents").agg(count(lit(1)).as("n"))
      .withColumn("vsum", col("cents") * col("n"))
    val (scanned, totals) =
      PrefixScan.exclusive(byVal, "cents", Seq("n", "vsum"), "q180")
    val nT = totals(0)
    val cT = totals(1)
    val ex = scanned.select(col("cents"), col("n"), col("cum_n_below").as("cum"),
        explode(array((0 to 9).map(i => lit(i)): _*)).as("decile"))
      .withColumn("b_lo", expr(s"(${nT}L * decile) div 10"))
      .withColumn("b_hi", expr(s"(${nT}L * (decile + 1)) div 10"))
      .withColumn("in_d", greatest(lit(0L),
        least(col("cum") + col("n"), col("b_hi")) -
          greatest(col("cum"), col("b_lo"))))
      .withColumn("le_d", greatest(lit(0L),
        least(col("n"), col("b_hi") - col("cum"))))
    ex.groupBy("decile").agg(sum("in_d").as("n_customers"),
        Stats.dsum(col("in_d").cast("double") * col("cents").cast("double"))
          .as("dc"),
        Stats.dsum(col("le_d").cast("double") * col("cents").cast("double"))
          .as("cc"))
      .select(col("decile"), col("n_customers"),
        round(col("dc") / lit(cT.toDouble), 6).as("value_share"),
        round(col("cc") / lit(cT.toDouble), 6).as("cum_share"))
      .orderBy("decile")
  }

  /** Degree histogram of the supplier–part bipartite graph (who supplies
    * what): per side, how many nodes have each degree — the graph-shape
    * profile (hubs vs long tail) that sizes any downstream graph
    * algorithm. One distinct edge scan feeds two narrow count-of-counts
    * aggregates.
    */
  private def qDegreeHist(s: SparkSession, dir: String): DataFrame = {
    val edges = li(s, dir).select(col("l_suppkey"), col("l_partkey")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q181", edges)
    val sup = edges.groupBy("l_suppkey").agg(count(lit(1)).as("deg"))
      .groupBy("deg").agg(count(lit(1)).as("n_nodes"))
      .withColumn("side", lit("supplier"))
    val prt = edges.groupBy("l_partkey").agg(count(lit(1)).as("deg"))
      .groupBy("deg").agg(count(lit(1)).as("n_nodes"))
      .withColumn("side", lit("part"))
    sup.unionByName(prt).select("side", "deg", "n_nodes")
      .orderBy("side", "deg")
  }

  /** Corpus composition audit — the language mix per source: per source
    * its document count, language count, the dominant language's share
    * and the language-distribution entropy (bits). The before-mixing
    * diagnostic for multilingual corpus assembly (a source whose
    * entropy jumps between snapshots changed its crawl mix). One
    * (source, lang) aggregate, then a per-source fold — both narrow.
    */
  private def qLangMix(s: SparkSession, dir: String): DataFrame = {
    val c = doc(s, dir).groupBy("source", "lang").agg(count(lit(1)).as("n"))
    val tot = c.groupBy("source").agg(sum("n").as("n_docs"),
      count(lit(1)).as("n_langs"))
    c.join(tot, "source")
      .withColumn("p", col("n").cast("double") / col("n_docs").cast("double"))
      .groupBy("source").agg(
        max("n_langs").as("n_langs"), max("n_docs").as("n_docs"),
        round(max("p"), 6).as("top_share"),
        round(lit(0.0) - Stats.dsum(col("p") * log2(col("p"))), 6)
          .as("entropy_bits"))
      .orderBy("source")
  }

  /** Near-duplicate cluster size distribution: how many dup clusters of
    * each size the corpus holds — the dedup planning statistic (many
    * small clusters → cheap pair removal; one giant cluster → template
    * spam needing a different rule). Reuses the q47 component labeling;
    * two count-of-counts aggregates on the tiny (id → component) frame.
    */
  private def qClusterSizeHist(s: SparkSession, dir: String): DataFrame = {
    val pairs = graft.dedup.Dedup.jaccardPairs(par(doc(s, dir)), "doc_id", "text",
      n = 3, threshold = 0.5)
    graft.dedup.Components.connectedComponents(pairs, "a", "b")
      .groupBy("component").agg(count(lit(1)).as("sz"))
      .groupBy("sz").agg(count(lit(1)).as("n_clusters"))
      .orderBy("sz")
  }

  /** Daily OHLC bars of purchase values: open/close by (ts, event_id)
    * order, high/low/mean over the day — the classic downsample-for-
    * charting aggregation. ONE mergeable aggregate: open/close ride
    * lexicographic min/max over a (ts, event_id, v) struct (the unique
    * key makes the selection deterministic), no window anywhere.
    */
  private def qOhlc(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).where(col("event_type") === "purchase")
      .select(expr("(ts div 1000) div 86400000000").as("d"),
        col("ts"), col("event_id"), col("value").cast("double").as("v"))
    e.groupBy("d").agg(
        min(struct(col("ts"), col("event_id"), col("v"))).as("fst"),
        max(struct(col("ts"), col("event_id"), col("v"))).as("lst"),
        count(lit(1)).as("n"),
        round(min("v"), 6).as("low"), round(max("v"), 6).as("high"),
        Stats.dsum(col("v")).as("sv"))
      .select(col("d"), col("n"),
        round(col("fst.v"), 6).as("open"), round(col("lst.v"), 6).as("close"),
        col("low"), col("high"),
        round(col("sv") / col("n").cast("double"), 6).as("mean"))
      .orderBy("d")
  }

  /** Tokenizer fertility by language: per lang, characters per
    * whitespace token and BPE-ish subword tokens per word — the
    * tokenizer-suitability diagnostic (a language whose fertility is 2×
    * the corpus median pays 2× the context budget per sentence; the
    * standard argument for retraining a tokenizer before a multilingual
    * run). One pass, all counts from codegen'd string expressions.
    */
  private def qFertility(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    par(doc(s, dir))
      .select(col("lang"), length(col("text")).cast("long").as("chars"),
        TextOps.tokenCount(col("text")).cast("long").as("ws"),
        TextOps.bpeTokenCount(col("text")).cast("long").as("bpe"))
      .groupBy("lang").agg(count(lit(1)).as("n_docs"),
        sum("chars").as("chars"), sum("ws").as("ws_tokens"),
        sum("bpe").as("bpe_tokens"))
      .select(col("lang"), col("n_docs"), col("ws_tokens"), col("bpe_tokens"),
        round(col("chars").cast("double") / col("ws_tokens").cast("double"), 6)
          .as("chars_per_word"),
        round(col("bpe_tokens").cast("double") / col("ws_tokens").cast("double"), 6)
          .as("fertility"))
      .orderBy("lang")
  }

  /** Cross-source duplication matrix: for each (source, source) pair,
    * how many near-duplicate document pairs span them — the corpus-
    * licensing/provenance audit (mirror sites show up as off-diagonal
    * mass; template spam as diagonal mass). Near-dup pairs come from
    * the exact n-gram Jaccard path; two broadcast-able doc→source joins
    * label the ends.
    */
  private def qCrossSourceDups(s: SparkSession, dir: String): DataFrame = {
    val pairs = graft.dedup.Dedup.jaccardPairs(par(doc(s, dir)), "doc_id", "text",
      n = 3, threshold = 0.5)
    val src = doc(s, dir).select(col("doc_id"), col("source"))
    pairs.join(src.toDF("a", "s_a"), "a").join(src.toDF("b", "s_b"), "b")
      .select(least(col("s_a"), col("s_b")).as("s1"),
        greatest(col("s_a"), col("s_b")).as("s2"))
      .groupBy("s1", "s2").agg(count(lit(1)).as("n_dup_pairs"))
      .orderBy("s1", "s2")
  }

  /** Balanced class weights over the embeddings labels — the
    * `n_samples / (n_classes * n_c)` inverse-frequency weighting every
    * imbalanced trainer consumes. One narrow aggregate + a broadcast
    * scalar.
    */
  private def qClassWeights(s: SparkSession, dir: String): DataFrame = {
    val c = em(s, dir).groupBy("label").agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q188", c)
    val r0 = c.agg(sum("n"), count(lit(1))).head()
    val total = r0.getLong(0)
    val k = r0.getLong(1)
    c.select(col("label"), col("n"),
        round(lit(total.toDouble) / (lit(k.toDouble) * col("n").cast("double")), 6)
          .as("weight"))
      .orderBy("label")
  }

  /** Odds ratio with 95% CI for the error outcome between two hash
    * cohorts of users — the epidemiological 2×2 effect measure
    * complementing q153's significance z-test: OR = ad/bc with the Woolf
    * log-interval. One conditional-count aggregate; exact integer cells.
    */
  private def qOddsRatio(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).select(
      (col("user_id") % 2 === 0).as("exposed"),
      (col("event_type") === "error").as("bad"))
    val m = e.agg(
      count(when(col("exposed") && col("bad"), 1)).as("a"),
      count(when(col("exposed") && !col("bad"), 1)).as("b"),
      count(when(!col("exposed") && col("bad"), 1)).as("c"),
      count(when(!col("exposed") && !col("bad"), 1)).as("d"))
    val or = (col("a") * col("d")).cast("double") /
      (col("b") * col("c")).cast("double")
    val se = sqrt(lit(1.0) / col("a") + lit(1.0) / col("b") +
      lit(1.0) / col("c") + lit(1.0) / col("d"))
    m.select(col("a"), col("b"), col("c"), col("d"),
      round(or, 6).as("odds_ratio"),
      round(exp(log(or) - lit(1.959963984540054) * se), 6).as("ci_lo"),
      round(exp(log(or) + lit(1.959963984540054) * se), 6).as("ci_hi"))
  }

  /** Self-verifying GK quantile sketch (core.Sketches.quantileAudit):
    * the single-pass mergeable substitute for OrderStats at 100 TB,
    * shipped with its acceptance audit — the oracle asserts the
    * bound-check column as literal TRUE, so a sketch that violates its
    * rank guarantee fails the correctness gate.
    */
  private def qQuantileSketch(s: SparkSession, dir: String): DataFrame =
    graft.core.Sketches.quantileAudit(liStats(s, dir), "l_extendedprice",
      Seq(0.25, 0.5, 0.75, 0.95), accuracy = 200)

  /** Self-verifying HLL++ cardinality sketch per group — same audit
    * pattern as q190: exact distinct count (cross-engine-checked) plus
    * the 3·rsd bound boolean the oracle pins TRUE.
    */
  private def qHllAudit(s: SparkSession, dir: String): DataFrame =
    graft.core.Sketches.distinctAudit(li(s, dir), "l_linestatus",
      "l_partkey", rsd = 0.05)

  /** Analytic window-function suite over per-user event streams: lag
    * delta (inter-event micros), percent_rank and cume_dist of the
    * value within the user's history, ntile(4) session-quartile — the
    * four rank-analytic primitives not exercised elsewhere, all over
    * ONE hash-partitioned (user_id) window family (no global window;
    * ties broken by the unique event_id). Head-200 via distributed
    * top-k for a bounded deterministic output.
    */
  private def qWindowSuite(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = ev(s, dir).select(col("user_id"), col("event_id"),
      expr("ts div 1000").as("us"), col("value").cast("double").as("v"))
    val wt = Window.partitionBy("user_id").orderBy("us", "event_id")
    val wv = Window.partitionBy("user_id").orderBy("v", "event_id")
    e.select(col("user_id"), col("event_id"),
        (col("us") - lag("us", 1).over(wt)).as("delta_us"),
        round(percent_rank().over(wv), 6).as("pr"),
        round(cume_dist().over(wv), 6).as("cd"),
        ntile(4).over(wv).as("tile"))
      .orderBy("user_id", "event_id")
      .limit(200)
  }

  /** Arbitrary GROUPING SETS through the SQL surface (the shape cube
    * q160 and rollup q127 are special cases of): three chosen sets in
    * ONE Expand+aggregate pass, 'ALL' markers dodging cross-engine null
    * ordering.
    */
  private def qGroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(s, dir)
    s.sql(
      """SELECT coalesce(l_returnflag, 'ALL') AS rflag,
        |  coalesce(l_linestatus, 'ALL') AS lstatus,
        |  count(*) AS n,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE), 4) AS sum_qty
        | FROM lineitem
        | GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |   (l_returnflag), (l_linestatus))
        | ORDER BY rflag, lstatus""".stripMargin)
  }

  /** Explicit LEFT SEMI join surface: per market segment, customers
    * with and without orders. Two customer scans, one orders scan: the
    * "without" column is ARITHMETIC (n_customers − n_with_orders), not
    * a third scan through a LEFT ANTI join — at 100× the data the r8
    * three-scan form paid a full extra pass of both tables for a number
    * the report already implies (r8 advisory #3). The LEFT ANTI plan
    * shape itself stays a registered, plan-audited surface via
    * [[antiJoinOrphans]] (PlanAuditSpec pins the SEMI here and the ANTI
    * there, and that q48's referential check keeps planning one).
    */
  private def qSemiAnti(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val o = Tables.load(s, dir, "orders").select(col("o_custkey"))
    val withO = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_with_orders"))
    c.groupBy("c_mktsegment").agg(count(lit(1)).as("n_customers"))
      .join(withO, Seq("c_mktsegment"), "left")
      .select(col("c_mktsegment").as("segment"), col("n_customers"),
        coalesce(col("n_with_orders"), lit(0L)).as("n_with_orders"),
        (col("n_customers") - coalesce(col("n_with_orders"), lit(0L)))
          .as("n_without_orders"))
      .orderBy("segment")
  }

  /** The LEFT ANTI existence-join shape, kept as a first-class audited
    * surface (PlanAuditSpec asserts the anti hash join): customers with
    * no orders, per segment. Not a registered query — q194 reports the
    * same number arithmetically with one fewer scan; this is the plan
    * shape a caller uses when they need the ROWS, not the count.
    */
  def antiJoinOrphans(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val o = Tables.load(s, dir, "orders").select(col("o_custkey"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_without_orders"))
      .orderBy("c_mktsegment")
  }

  /** A33 — Levene's homogeneity-of-variance test (mean-centered),
    * completing the spread-test family with q172's Brown–Forsythe
    * (median-centered, the robust twin): same one-way F over absolute
    * deviations, centered on per-group MEANS (one mergeable aggregate
    * instead of the grouped median selection).
    */
  private def qLevene(s: SparkSession, dir: String): DataFrame = {
    val d = col("l_extendedprice").cast("double")
    val base = li(s, dir)
      .select(col("l_returnflag").as("g"), d.as("v0"))
      .where(col("v0").isNotNull && !isnan(col("v0")))
    // center on round(mean, 6), not the raw mean: 2-dp data minus a
    // 6-dp center keeps |x − c| exactly representable in DECIMAL(38,10),
    // where a full-fraction center makes the two engines' double→decimal
    // casts disagree on half-ulp cases (Spark rounds via shortest-repr
    // string, DuckDB multiplies by 10¹⁰ in double — the q172 scaladoc
    // class, observed shifting ss_between at 1e-5 here). The center
    // choice is conventional in Levene's test; a 1e-6 shift of a 5e4
    // magnitude center is statistically nil but buys bitwise parity.
    val mn = base.groupBy("g").agg(round(Stats.dmean(col("v0")), 6).as("mn"))
    centeredAnovaF(base.join(broadcast(mn), "g")
      .select(col("g"), abs(col("v0") - col("mn")).as("v")))
  }

  /** Poisson rate-ratio test between even and odd days: event counts,
    * exposure days, the rate ratio and its log-scale z statistic — the
    * count-data companion to q153's proportion test. Pure conditional
    * counts; exact integers both sides.
    */
  private def qRateRatio(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
      .select(expr("(ts div 1000) div 86400000000").as("d"))
      .select(col("d"), (col("d") % 2 === 0).as("even"))
    val m = e.agg(
      count(when(col("even"), 1)).as("c1"),
      count(when(!col("even"), 1)).as("c2"),
      countDistinct(when(col("even"), col("d"))).as("d1"),
      countDistinct(when(!col("even"), col("d"))).as("d2"))
    val r1 = col("c1").cast("double") / col("d1").cast("double")
    val r2 = col("c2").cast("double") / col("d2").cast("double")
    m.select(col("c1"), col("c2"), col("d1"), col("d2"),
      round(r1 / r2, 6).as("rate_ratio"),
      round(log(r1 / r2) /
        sqrt(lit(1.0) / col("c1") + lit(1.0) / col("c2")), 6).as("z"))
  }

  /** Per-user inter-event gap profile: event count, gap count, mean and
    * max gap in micros — the telemetry-cadence health table (a user
    * whose max gap dwarfs the mean has a collection outage). The lag
    * window and the aggregate share ONE user_id hash exchange.
    */
  private def qGapStats(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    ev(s, dir)
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("us"))
      .withColumn("gap", col("us") - lag("us", 1).over(w))
      .groupBy("user_id").agg(count(lit(1)).as("n_events"),
        count(col("gap")).as("n_gaps"),
        // nearest MICROSECOND (scale-0 round): integer micros over a
        // 2·5-smooth gap count produce exact 4-dp midpoints where the
        // engines' round(x, 4) conventions split (observed at sf0.1);
        // scale-0 has no ×10^k multiply and exact .5 rounds up on both
        round(Stats.dmean(col("gap").cast("double"))).as("mean_gap_us"),
        max("gap").as("max_gap_us"))
      .orderBy("user_id")
  }

  /** DAU/MAU stickiness per 30-day window: average daily active users
    * over the window's monthly active users — the engagement ratio.
    * Exact distinct counts via two narrow (window, user) dedups; no
    * approximate sketches so the oracle is exact.
    */
  private def qStickiness(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).select(
      expr("(ts div 1000) div 86400000000").as("d"),
      expr("((ts div 1000) div 86400000000) div 30").as("m"),
      col("user_id"))
    val daily = e.select("m", "d", "user_id").distinct()
      .groupBy("m", "d").agg(count(lit(1)).as("dau"))
    val dauAvg = daily.groupBy("m").agg(count(lit(1)).as("n_days"),
      Stats.dmean(col("dau").cast("double")).as("avg_dau"))
    val mau = e.select("m", "user_id").distinct()
      .groupBy("m").agg(count(lit(1)).as("mau"))
    dauAvg.join(mau, "m")
      .select(col("m"), col("n_days"), col("mau"),
        round(col("avg_dau"), 6).as("avg_dau"),
        round(col("avg_dau") / col("mau").cast("double"), 6).as("stickiness"))
      .orderBy("m")
  }

  /** D13 — SemDeDup (Abbas et al. 2023): semantic deduplication by
    * k-means clustering the embedding space and pruning cosine
    * near-duplicates ONLY within clusters — the step that makes
    * embedding dedup tractable at corpus scale (all-pairs is O(n²);
    * clustering confines the quadratic work to cluster-sized buckets,
    * and k grows with n so bucket sizes stay bounded).
    *
    * Cluster assignment is a pure codegen'd HOF arg-min over the
    * broadcast centers literal (no UDF in the hot path); the prune rule
    * is deterministic — drop a vector iff an in-cluster LOWER-ID
    * neighbor has cosine ≥ θ — so the kept set is a pure function of
    * the data and the fitted centers.
    *
    * Self-verifying audit (the q190/q191 pattern — centers are
    * driver-fit model state DuckDB cannot refit): exact SQL anchors
    * (n_vecs, k, dim) plus in-query invariants the oracle pins TRUE:
    * `assign_ok` cross-checks the codegen arg-min assignment against
    * the independent broadcast-model scorer ([[graft.sim.KMeans]]'s
    * sequential-fold UDF) on every row; `cos_bounded` checks every
    * in-cluster pair cosine is a valid similarity; `pruned_frac_ok`
    * bounds the prune rate at half the corpus.
    */
  private def qSemDedup(s: SparkSession, dir: String): DataFrame = {
    // k from the √n scale recipe (SemDedup.kForCorpus) rather than a
    // fixed benchmark point: bucket sizes stay ~√n as the corpus grows,
    // and the oracle pins the SAME formula in SQL, so a drifting k is a
    // hash mismatch, not a silent re-tune
    val e = em(s, dir)
    val k = graft.dedup.SemDedup.kForCorpus(e.count())
    graft.dedup.SemDedup.audit(e, "vec_id", "embedding",
      k = k, theta = 0.45)
  }

  /** T25 — CCNet perplexity bucketing (Wenzek et al. 2020): documents
    * split per language into head/middle/tail thirds by LM score —
    * the standard quality-stratification step before sampling a
    * pretraining mix (train mostly on head+middle, drop tail). LM =
    * q96's corpus-self-fit add-one bigram model; tertile edges per
    * language via the distributed exact-quantile selection
    * ([[graft.core.OrderStats]] — no single-reducer percentile);
    * bucketing is a broadcast join of the 2-row-per-language edge
    * table. Higher avg log-prob = more probable text = "head".
    */
  private def qPerplexityBuckets(s: SparkSession, dir: String): DataFrame = {
    val d = doc(s, dir)
    val scored = graft.text.BigramLm.score(d, "doc_id", "text")
    // persisted: the scored frame feeds BOTH the tertile-edge selection
    // and the bucket pass — without it the whole LM pipeline (explode,
    // two count tables, two joins) runs twice (bench-measured 2.2s→
    // roughly the single-pass cost)
    val withLang = scored.join(
        d.select(col("doc_id").cast("long").as("id"), col("lang")), "id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.perplexityBuckets", withLang)
    val edges = graft.core.OrderStats.groupedQuantiles(
      withLang, "lang", "avg_logp", Seq(1.0 / 3, 2.0 / 3))
    val e2 = edges.groupBy("lang").agg(
      max(when(col("p") === 1.0 / 3, col("value"))).as("t1"),
      max(when(col("p") === 2.0 / 3, col("value"))).as("t2"))
    withLang.join(broadcast(e2), "lang")
      .withColumn("bucket",
        when(col("avg_logp") >= col("t2"), "head")
          .when(col("avg_logp") >= col("t1"), "middle")
          .otherwise("tail"))
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n"),
        round(Stats.dmean(col("avg_logp")), 6).as("mean_logp"))
      .orderBy("lang", "bucket")
  }

  /** T26 — BPE merge-pair statistics: corpus-wide adjacent character
    * pair frequencies — the exact quantity the first iteration of
    * byte-pair-encoding tokenizer training maximizes over (Sennrich et
    * al. 2016). One explode to words, one codegen'd HOF expansion to
    * in-word character bigrams, one map-side-combinable count (the key
    * space is bounded by charset², so partial aggregation collapses
    * the corpus before any shuffle), top-32 via TakeOrderedAndProject
    * with a total (cnt desc, pair asc) order so the cut is
    * deterministic cross-engine.
    */
  private def qBpePairs(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    val words = par(doc(s, dir))
      .select(explode(TextOps.tokens(col("text"))).as("w"))
    val pairs = words.select(explode(
      when(length(col("w")) >= 2,
        transform(sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2))))
        .otherwise(array().cast("array<string>"))).as("pair"))
    pairs.groupBy("pair").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("pair")).limit(32)
  }

  /** W5 — RANGE-frame sliding window: per-user rolling 6-hour event
    * count and value sum, the time-based frame (`RANGE BETWEEN
    * <interval> PRECEDING AND CURRENT ROW`) as opposed to the
    * row-count frames everywhere else — frame membership follows the
    * ORDER BY *value* (event time in micros), so co-timed events are
    * peers and gaps shrink the frame. Hash-partitioned per-user
    * windows (no global window); the rolling sum accumulates in
    * DECIMAL(38,10) so window-internal addition order (segment trees
    * vs sequential) cannot flip a bit cross-engine. Reduced per user
    * to peak concurrency / peak rolling mass / total rolling mass.
    *
    * The double→DECIMAL(38,10) cast below is the documented divergence
    * class (Spark: shortest-repr string, HALF_UP; DuckDB: ×10^scale in
    * double) — it is EXACT here because events.value is 2-decimal money
    * of magnitude < 10^3 (measured across SFs): Spark's shortest repr
    * is the 2-dp literal, and DuckDB's scaled product sits ~9 orders of
    * magnitude under the 2^52/10^10 ≈ 4.5e5 safety bound, so both
    * engines recover the identical decimal. A full-fraction or
    * ≥ 450k-magnitude value column must NOT take this path unrounded —
    * recover integer units first (see the Verify skill notes).
    */
  private def qRangeWindow(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sixHoursUs = 21600000000L
    val e = ev(s, dir).select(col("user_id"),
      expr("ts div 1000").as("us"),
      col("value").cast(DecimalType(38, 10)).as("v"))
    val w = Window.partitionBy("user_id").orderBy("us")
      .rangeBetween(-sixHoursUs, 0)
    e.withColumn("roll_n", count(lit(1)).over(w))
      .withColumn("roll_sum", sum("v").over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        max("roll_n").as("max_roll_n"),
        round(max("roll_sum").cast(DoubleType), 4).as("max_roll_sum"),
        round(sum("roll_sum").cast(DoubleType), 4).as("sum_roll_sum"))
      .orderBy("user_id")
  }

  /** D14 — MinHash estimator-quality audit: per LSH candidate pair,
    * the signature-estimated Jaccard next to the exact shingle-set
    * Jaccard ([[graft.dedup.MinHashLSH.estimateAudit]]). Run this
    * before trusting a banded dedup config on a new corpus: if
    * |est − exact| is wide at the dedup threshold, k is too small.
    */
  private def qMinhashEstAudit(s: SparkSession, dir: String): DataFrame =
    graft.dedup.MinHashLSH.estimateAudit(doc(s, dir), "doc_id", "text",
        n = 3, k = 16, bands = 4)
      .orderBy("a", "b")

  /** A34 — Cochran–Mantel–Haenszel stratified 2×2 association test +
    * Mantel–Haenszel pooled odds ratio: "is exposure associated with
    * outcome after controlling for the stratifying variable" — the
    * confounder-adjusted companion to q189's crude odds ratio (and the
    * aggregate-vs-stratified discrepancy IS Simpson's paradox when the
    * two disagree). One conditional-count pass builds every stratum's
    * 2×2 table; E/V/OR terms are fixed-shape double arithmetic over
    * exact integer counts (products of four ~n counts overflow int64
    * at sf0.1 scale — computed in double, identically parenthesized on
    * both engines).
    */
  private def qCmh(s: SparkSession, dir: String): DataFrame = {
    val t = li(s, dir).select(
      col("l_returnflag").as("g"),
      (col("l_discount") > 0.05).as("x"),
      (col("l_tax") > 0.04).as("y"))
    val cells = t.groupBy("g").agg(
      count(when(col("x") && col("y"), 1)).as("a"),
      count(when(col("x") && !col("y"), 1)).as("b"),
      count(when(!col("x") && col("y"), 1)).as("c"),
      count(when(!col("x") && !col("y"), 1)).as("d"))
    val n = (col("a") + col("b") + col("c") + col("d")).cast(DoubleType)
    val ad = col("a").cast(DoubleType)
    val e = (col("a") + col("b")).cast(DoubleType) *
      (col("a") + col("c")).cast(DoubleType) / n
    val v = ((col("a") + col("b")).cast(DoubleType) *
        (col("c") + col("d")).cast(DoubleType)) *
      ((col("a") + col("c")).cast(DoubleType) *
        (col("b") + col("d")).cast(DoubleType)) /
      (n * n * (n - lit(1.0)))
    val per = cells.select(col("g"), col("a"), ad.as("ae"), e.as("ee"),
      v.as("ve"),
      (col("a").cast(DoubleType) * col("d").cast(DoubleType) / n).as("rr"),
      (col("b").cast(DoubleType) * col("c").cast(DoubleType) / n).as("ss"))
    // cross-stratum sums of full-fraction doubles: fold in stratum-key
    // order over a sorted struct array (order-fixed, bitwise
    // cross-engine — the q106 convention; decimal widening is NOT safe
    // here, double→decimal casts of full-fraction values are the
    // documented divergence class)
    val folded = per.agg(count(lit(1)).as("n_strata"), sum("a").as("sum_a"),
      sort_array(collect_list(struct(col("g"), col("ee"), col("ve"),
        col("rr"), col("ss")))).as("xs"))
    def fsum(field: String) = aggregate(col("xs"), lit(0.0),
      (acc, x) => acc + x.getField(field))
    folded.select(col("n_strata"), col("sum_a"), fsum("ee").as("sum_e"),
        fsum("ve").as("sum_v"), fsum("rr").as("sum_r"), fsum("ss").as("sum_s"))
      .select(col("n_strata"), col("sum_a"),
        round(col("sum_e"), 6).as("sum_e"),
        round(col("sum_v"), 6).as("sum_v"),
        round(pow(abs(col("sum_a").cast(DoubleType) - col("sum_e")) - lit(0.5), 2) /
          col("sum_v"), 6).as("cmh"),
        round(col("sum_r") / col("sum_s"), 6).as("or_mh"))
  }

  /** D15 — dedup threshold sweep: pair and affected-document counts at
    * a ladder of Jaccard thresholds over the LSH candidate set — the
    * planning table that picks a dedup θ for a new corpus (how much am
    * I about to delete?) from ONE candidate-generation pass; the
    * threshold ladder explodes AFTER the quadratic stage, so the sweep
    * costs one extra narrow aggregate, not five dedup runs.
    */
  private def qDedupSweep(s: SparkSession, dir: String): DataFrame = {
    val thetas = Seq(0.3, 0.5, 0.7, 0.8, 0.9)
    val pairs = graft.dedup.MinHashLSH.nearDupPairs(doc(s, dir), "doc_id",
        "text", n = 3, k = 16, bands = 4, threshold = 0.0)
      .select(col("a"), col("b"), col("jaccard"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sel = pairs
      .select(explode(array(thetas.map(lit(_)): _*)).as("theta"),
        col("a"), col("b"), col("jaccard"))
      .where(col("jaccard") >= col("theta"))
    val nPairs = sel.groupBy("theta").agg(count(lit(1)).as("n_pairs"))
    val nDocs = sel
      .select(col("theta"), explode(array(col("a"), col("b"))).as("id"))
      .groupBy("theta").agg(countDistinct("id").as("n_docs"))
    graft.core.Caches.retain("entry.dedupSweep", pairs)
    nPairs.join(nDocs, Seq("theta"), "left")
      .select(col("theta"), col("n_pairs"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"))
      .orderBy("theta")
  }

  /** G1 — deletion-propagation purge (the GDPR/right-to-be-forgotten
    * shape): a deletion list of user ids anti-joined out of the event
    * log, with a per-event-type before/after/deleted reconciliation
    * AND the residual count of surviving rows for deleted users — the
    * audit a data-governance pipeline must publish with every purge.
    * The anti join is a hash equi-join on the user id (the q194-family
    * LEFT ANTI surface, here as a registered at-scale operator);
    * reconciliation reuses one conditional-count pass per side.
    */
  private def qPurgeAudit(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).select(col("user_id"), col("event_type"))
    val del = e.select("user_id").where(col("user_id") % 13 === 0).distinct()
    val purged = e.join(del, Seq("user_id"), "left_anti")
      .groupBy("event_type").agg(count(lit(1)).as("n_after"),
        count(when(col("user_id") % 13 === 0, 1)).as("n_residual"))
    e.groupBy("event_type").agg(count(lit(1)).as("n_before"))
      .join(purged, Seq("event_type"), "left")
      .select(col("event_type"), col("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"),
        (col("n_before") - coalesce(col("n_after"), lit(0L))).as("n_deleted"),
        coalesce(col("n_residual"), lit(0L)).as("n_residual"))
      .orderBy("event_type")
  }

  /** A35 — Benjamini–Hochberg FDR correction: the multiple-testing
    * step-up over a family of per-event-type hypotheses (here: a
    * 3-bucket day-of-cycle uniformity χ² with df=2, whose survival
    * function is exactly e^(−χ²/2) — elementary, so p-values are
    * engine-exact with no special functions). Rank p ascending, reject
    * all ranks ≤ k* where k* = max{i : p_i ≤ (i/m)·α} — the step-up
    * rule that plain per-test α misstates. The ranking window runs
    * over the aggregated family table (one row per event type — cards
    * bounded by the hypothesis family, not the data), never over raw
    * events.
    */
  private def qBhFdr(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val alpha = 0.05
    val e = ev(s, dir).select(col("event_type"),
      expr("((ts div 1000) div 86400000000) % 3").as("b"))
    val byType = e.groupBy("event_type").agg(
      count(when(col("b") === 0, 1)).as("n0"),
      count(when(col("b") === 1, 1)).as("n1"),
      count(when(col("b") === 2, 1)).as("n2"),
      count(lit(1)).as("t"))
    val exp3 = col("t").cast(DoubleType) / lit(3.0)
    def term(c: Column) = pow(c.cast(DoubleType) - exp3, 2) / exp3
    val scored = byType.withColumn("chi2",
        term(col("n0")) + term(col("n1")) + term(col("n2")))
      .withColumn("p", exp(col("chi2") / lit(-2.0)))
    val w = Window.orderBy("p", "event_type")
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    scored.withColumn("rank", row_number().over(w))
      .withColumn("m", count(lit(1)).over(wAll))
      .withColumn("crit",
        col("rank").cast(DoubleType) / col("m").cast(DoubleType) * lit(alpha))
      .withColumn("kstar",
        coalesce(max(when(col("p") <= col("crit"), col("rank"))).over(wAll),
          lit(0)))
      .select(col("event_type"), col("t").as("n"),
        round(col("chi2"), 6).as("chi2"), round(col("p"), 6).as("p"),
        col("rank").cast("long").as("rank"),
        (col("rank") <= col("kstar")).as("reject"))
      .orderBy("rank")
  }

  /** J4 — relational set operations: INTERSECT / EXCEPT on distinct
    * key sets and INTERSECT ALL / EXCEPT ALL on multisets — the set
    * algebra surface (Catalyst plans these as semi/anti hash joins and
    * count-compare aggregates; nothing here should ever nested-loop).
    * Sets: customers with a high-value order vs customers with an
    * urgent order.
    */
  private def qSetOps(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    val m1 = o.where(col("o_totalprice") > 150000).select("o_custkey")
    val m2 = o.where(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    val s1 = m1.distinct()
    val s2 = m2.distinct()
    def cnt(op: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n")).select(lit(op).as("op"), col("n"))
    cnt("except_all", m1.exceptAll(m2))
      .unionByName(cnt("except_hp_minus_urgent", s1.except(s2)))
      .unionByName(cnt("except_urgent_minus_hp", s2.except(s1)))
      .unionByName(cnt("intersect", s1.intersect(s2)))
      .unionByName(cnt("intersect_all", m1.intersectAll(m2)))
      .orderBy("op")
  }

  /** T27 — tokenizer vocabulary coverage on a held-out split: fit a
    * top-V vocabulary on the train split only (q95's leak-proof hash
    * split), measure per-language OOV rate on the test split — the
    * coverage report that decides whether a tokenizer's V is large
    * enough per language BEFORE training with it. The vocabulary is
    * bounded by V, so the membership join broadcasts.
    */
  private def qTokenizerCoverage(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    val vocabSize = 256
    val split = graft.aug.Sampling.splitAssign(doc(s, dir), "doc_id",
      Seq("train" -> 0.9, "test" -> 0.1))
    val vocab = split.where(col("split") === "train")
      .select(explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("token")).limit(vocabSize)
      .select(col("token"), lit(1).as("in_vocab"))
    split.where(col("split") === "test")
      .select(col("lang"), explode(TextOps.tokens(col("text"))).as("token"))
      .join(broadcast(vocab), Seq("token"), "left")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("in_vocab").isNull, 1)).as("n_oov"))
      .select(col("lang"), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast(DoubleType) /
          col("n_tokens").cast(DoubleType), 6).as("oov_rate"))
      .orderBy("lang")
  }

  /** N4 — hard-negative mining for contrastive training: for each
    * anchor embedding, the top-3 most-similar vectors with a DIFFERENT
    * label, candidates confined to shared LSH buckets (the registered
    * 16×4 banding) with exact cosine re-rank — the metric-learning
    * companion to q83's random negatives (hard negatives carry the
    * gradient signal; random ones mostly don't). Plane signs are
    * hoisted into their own projection so the 64 plane dots run once
    * per vector.
    */
  private def qHardNegatives(s: SparkSession, dir: String): DataFrame = {
    import graft.sim.{Ann, GraftFunctions}
    import org.apache.spark.sql.expressions.Window
    GraftFunctions.register(s)
    val v = em(s, dir).select(col("vec_id").cast("long").as("id"),
        col("embedding").as("vec"), col("label"))
      .withColumn("n2", GraftFunctions.norm2(col("vec")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bk = v
      .select(col("id"), Ann.planeSigns(col("vec"), 64, 64).as("signs"))
      .select(col("id"), posexplode(Ann.bucketsFromSigns(col("signs"), 16, 4)))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "bucket")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = bk.as("qx").where(col("qx.id") < 100)
      .join(bk.as("tx"),
        col("qx.tbl") === col("tx.tbl") &&
          col("qx.bucket") === col("tx.bucket") &&
          col("qx.id") =!= col("tx.id"))
      .select(col("qx.id").as("qid"), col("tx.id").as("tid"))
      .distinct()
    val scoredPairs = cand
      .join(v.select(col("id").as("qid"), col("vec").as("qvec"),
        col("n2").as("qn2"), col("label").as("label_a")), "qid")
      .join(v.select(col("id").as("tid"), col("vec").as("tvec"),
        col("n2").as("tn2"), col("label").as("label_b")), "tid")
      .where(col("label_a") =!= col("label_b"))
      .select(col("qid").as("a"), col("tid").as("b"),
        col("label_a"), col("label_b"),
        (GraftFunctions.dot(col("qvec"), col("tvec")) /
          (sqrt(col("qn2")) * sqrt(col("tn2")))).as("cos"))
    graft.core.Caches.retain("entry.hardNegatives", v, bk)
    scoredPairs
      .withColumn("rank", row_number().over(
        Window.partitionBy("a").orderBy(desc("cos"), asc("b"))))
      .where(col("rank") <= 3)
      .select(col("a"), col("b"), col("rank"), col("label_a"),
        col("label_b"), round(col("cos"), 6).as("cos"))
      .orderBy("a", "rank")
  }

  /** T28 — corpus data card: the per-source datasheet a curated
    * release ships (Datasheets for Datasets / Dolma-style): document
    * and token volumes, language spread with the dominant language,
    * mean quality, exact-duplicate and too-short counts — every signal
    * from ONE pass over the corpus plus two narrow per-source
    * aggregates; the kind of composed reporting query a 100 TB corpus
    * runs nightly.
    */
  private def qDataCard(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    import org.apache.spark.sql.expressions.Window
    val d = doc(s, dir).select(col("source"), col("lang"),
        TextOps.tokenCount(col("text")).cast("long").as("n_toks"),
        TextOps.qualityScore(col("text")).as("q"),
        TextOps.strHash(col("text")).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val base = d.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum("n_toks").as("n_tokens"),
      count(when(col("n_toks") < 20, 1)).as("n_short"),
      round(Stats.dmean(col("q")), 6).as("mean_quality"))
    val topLang = d.groupBy("source", "lang").agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy(desc("cnt"), asc("lang"))))
    val langs = topLang.groupBy("source").agg(
      count(lit(1)).as("n_langs"),
      max(when(col("rk") === 1, col("lang"))).as("top_lang"))
    val dups = d.groupBy("source", "h").agg(count(lit(1)).as("nh"))
      .groupBy("source")
      .agg(coalesce(sum(when(col("nh") > 1, col("nh"))), lit(0L))
        .as("n_dup_docs"))
    graft.core.Caches.retain("entry.dataCard", d)
    base.join(langs, "source").join(dups, "source")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("n_langs"), col("top_lang"), col("mean_quality"),
        col("n_dup_docs"), col("n_short"))
      .orderBy("source")
  }

  /** N5 — product quantization ([[graft.sim.Pq]]): M=8 sub-space
    * codebooks of k=16 centroids over the 64-dim embeddings — 512
    * bytes/vector down to 8. Self-verifying audit (codebooks are
    * driver-fit model state): anchors n/dim/M/k/bytes, invariants
    * codes-in-range, dual-path arg-min agreement, nonneg + minimal
    * per-sub-space quantization error.
    */
  private def qPqQuantize(s: SparkSession, dir: String): DataFrame =
    graft.sim.Pq.audit(em(s, dir), "vec_id", "embedding", m = 8, k = 16)

  /** N6 — hybrid retrieval with reciprocal-rank fusion: the lexical
    * leg ranks the top-100 documents by BM25 (q164's scorer) and the
    * semantic leg the top-100 embeddings by cosine to the query
    * vector; RRF fuses `Σ 1/(60+rank)` over the legs a candidate
    * appears in — the standard hybrid-search merge (rank-based, so the
    * two legs' incomparable score scales never touch). Each leg's cut
    * is a distributed TakeOrderedAndProject with a total tie-break
    * order; the ranking window then runs over the 100-row cut (bounded
    * by the parameter, never the corpus — the q115 convention).
    * Missing-leg ranks report 0. Fully oracle-checked.
    */
  private def qHybridRrf(s: SparkSession, dir: String): DataFrame = {
    import graft.sim.GraftFunctions
    import org.apache.spark.sql.expressions.Window
    GraftFunctions.register(s)
    val rrfK = 60
    val topN = 100
    val lex = bm25Frame(s, dir, Seq("join", "hash", "filter"))
      .orderBy(desc("score"), asc("doc_id")).limit(topN)
      .withColumn("rank_lex", row_number().over(
        Window.orderBy(desc("score"), asc("doc_id"))))
      .select(col("doc_id").cast("long").as("id"), col("rank_lex"))
    val v = em(s, dir).select(col("vec_id").cast("long").as("id"),
        col("embedding").as("vec"))
      .withColumn("n2", GraftFunctions.norm2(col("vec")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = v.where(col("id") === 0)
      .select(col("vec").as("qvec"), col("n2").as("qn2"))
    val sem = v.where(col("id") =!= 0).crossJoin(broadcast(q))
      .select(col("id"), (GraftFunctions.dot(col("vec"), col("qvec")) /
        (sqrt(col("n2")) * sqrt(col("qn2")))).as("cos"))
      .orderBy(desc("cos"), asc("id")).limit(topN)
      .withColumn("rank_sem", row_number().over(
        Window.orderBy(desc("cos"), asc("id"))))
      .select(col("id"), col("rank_sem"))
    graft.core.Caches.retain("entry.hybridRrf", v)
    val fused = lex.join(sem, Seq("id"), "full_outer")
      .select(col("id"),
        coalesce(col("rank_lex"), lit(0)).cast("long").as("rank_lex"),
        coalesce(col("rank_sem"), lit(0)).cast("long").as("rank_sem"),
        (coalesce(lit(1.0) / (lit(rrfK) + col("rank_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("rank_sem")), lit(0.0)))
          .as("rrf"))
    fused.orderBy(desc("rrf"), asc("id")).limit(20)
      .select(col("id"), col("rank_lex"), col("rank_sem"),
        round(col("rrf"), 6).as("rrf"))
  }

  /** MM''' — REAL video-container metadata decode (ISO-BMFF/MP4 box
    * walk → brand/timescale/duration/track-count, pure byte
    * arithmetic, no codec; Long cursors throughout per the byte-walk
    * rule): synthetic MP4 skeletons built from doc_id — every 4th with
    * the 64-bit mvhd v1 layout — round-trip through the parser against
    * a known-answer oracle. Frame decode stays the documented stub.
    * Completes the image (q74) / audio (q75) / video container
    * triple.
    */
  private def qVideoMeta(s: SparkSession, dir: String): DataFrame = {
    import graft.multimodal.Binary
    doc(s, dir).select(col("doc_id"))
      .withColumn("vid", Binary.synthVideoHeaderCol(col("doc_id")))
      .select(col("doc_id"), Binary.videoMetaCol(col("vid")).as("m"))
      .select(col("doc_id"), col("m.format").as("format"),
        col("m.major_brand").as("major_brand"),
        col("m.timescale").as("timescale"),
        col("m.duration_ms").as("duration_ms"),
        col("m.n_tracks").cast("long").as("n_tracks"))
      .orderBy("doc_id")
  }

  /** S9 — count-min sketch with an EXACT oracle: the D×W counter
    * matrix is one (row, cell)-keyed mergeable aggregate over the
    * deterministic hash family (the MinHash family shape over the
    * polynomial string hash), so the sketch — and every tracked key's
    * estimate `min_j counter[j][h_j(key)]` — computes bitwise
    * identically on both engines. Unlike the GK/HLL audits (q190/q191,
    * bound-checked), the CMS is fully value-checked: per tracked hot
    * key the oracle compares the exact true count, the exact estimate,
    * and the deterministic one-sided guarantee est ≥ true. Sketch
    * size is D·W cells regardless of corpus size — the fixed-memory
    * substitute for exact counting at 100 TB.
    */
  private def qCountMinSketch(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    val depth = 4
    val width = 256
    val tracked = (1L to 20L)
    val keyed = li(s, dir)
      .select(col("l_partkey").cast("string").as("key"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def cellOf(j: Column, key: Column): Column =
      ((lit(2L) * j + lit(1L)) * TextOps.strHash(key) +
        lit(7919L) * j + lit(12345L)) % lit(TextOps.P) % lit(width.toLong)
    val counters = keyed
      .select(explode(sequence(lit(0L), lit(depth - 1L))).as("j"), col("key"))
      .select(col("j"), cellOf(col("j"), col("key")).as("h"))
      .groupBy("j", "h").agg(count(lit(1)).as("c"))
    val cells = keyed.sparkSession
      .range(1, 21).select(col("id").as("partkey"))
      .select(col("partkey"),
        explode(sequence(lit(0L), lit(depth - 1L))).as("j"))
      .select(col("partkey"), col("j"),
        cellOf(col("j"), col("partkey").cast("string")).as("h"))
    val est = cells.join(counters, Seq("j", "h"))
      .groupBy("partkey").agg(min("c").as("est"))
    val truth = keyed.where(col("key").isin(tracked.map(_.toString): _*))
      .groupBy("key").agg(count(lit(1)).as("true_cnt"))
      .select(col("key").cast("long").as("partkey"), col("true_cnt"))
    graft.core.Caches.retain("entry.cms", keyed)
    truth.join(est, "partkey")
      .select(col("partkey"), col("true_cnt"), col("est"),
        (col("est") >= col("true_cnt")).as("est_ge_true"),
        (col("est") - col("true_cnt")).as("overestimate"))
      .orderBy("partkey")
  }

  /** N7 — IVF-PQ ANN ([[graft.sim.Pq.ivfPqTopK]]): coarse 16-cell
    * inverted file + 8×256 product-quantized ADC scoring + exact
    * re-rank of the 16k shortlist — the billion-scale vector-store
    * read path end to end. Registered at the measured r10 knee
    * (nprobe = 8, rerank 32 — the r9 nprobe=4 point's 0.56–0.65
    * recall@3 was the cell-probe ceiling, i.e. ADC loses almost
    * nothing after re-rank; doubling the probed cells moves the
    * ceiling, see q45 and the PLANS.md tradeoff curve). Same
    * self-verifying audit shape as q45: in-query recall vs the exact
    * top-k pinned ≥ 0.7 (PQ shortlist truncation costs a few points
    * vs exact-IVF's 0.75 floor), cosine validity pinned.
    */
  private def qIvfPq(s: SparkSession, dir: String): DataFrame = {
    val e = em(s, dir)
    val model = graft.sim.Pq.fit(e, "vec_id", "embedding", m = 8, k = 256)
    val approx = graft.sim.Pq.ivfPqTopK(e, "vec_id", "embedding", k = 3,
        model, nCells = 16, nprobe = 8, rerankFactor = 32,
        queryPred = col("id") < 100)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val brute = graft.sim.Ann.cosineTopK(e,
      "vec_id", "embedding", k = 3, queryPred = col("id") < 100)
    val nTrue = brute.count()
    val nHit = brute.select("a", "b")
      .join(approx.select("a", "b"), Seq("a", "b"), "left_semi").count()
    val recall = nHit.toDouble / nTrue
    val badCos = approx.agg(count(when(
      col("cos") < lit(-1.0 - 1e-9) || col("cos") > lit(1.0 + 1e-9), 1)))
      .head().getLong(0)
    graft.core.Caches.retain("entry.q215", approx)
    val nQueries = e.where(col("vec_id") < 100).count()
    import s.implicits._
    Seq((nQueries, 3L, 8L, 256L, recall >= 0.7, badCos == 0L))
      .toDF("n_queries", "k", "pq_m", "pq_k", "recall_ge_floor",
        "cos_in_range")
  }

  /** V1 — incremental view maintenance: a materialized per-group
    * aggregate (n, decimal sum) updated from a CDC delta batch by
    * MERGING partial aggregates — the lakehouse pattern that avoids
    * rescanning the base table on every ingest. The delta here is the
    * last day of orders (by order date); `base ⊎ delta` is maintained
    * as `agg(base) + agg(delta)` (group-wise outer merge of two small
    * aggregate states), and the oracle recomputes the view from the
    * full table — the in-query `ivm_ok` boolean pins
    * incremental == full-recompute per group, which only holds because
    * the aggregate state is mergeable and decimal-exact (a double sum
    * would drift under the split). Merge cost is O(groups), not
    * O(rows).
    */
  private def qIncrementalAgg(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
      .select(col("o_orderpriority").as("g"),
        expr("unix_timestamp(o_orderdate) div 86400").as("day"),
        col("o_totalprice").cast(DecimalType(38, 10)).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cut = o.agg(max(col("day"))).head().getLong(0)
    val isDelta = col("day") === cut
    def agg0(df: DataFrame) = df.groupBy("g")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
    val base = agg0(o.where(!isDelta))
    val delta = agg0(o.where(isDelta))
    val merged = base.as("b").join(delta.as("d"), Seq("g"), "full_outer")
      .select(col("g"),
        (coalesce(col("b.n"), lit(0L)) + coalesce(col("d.n"), lit(0L))).as("n"),
        (coalesce(col("b.s"), lit(BigDecimal(0)).cast(DecimalType(38, 10))) +
          coalesce(col("d.s"), lit(BigDecimal(0)).cast(DecimalType(38, 10))))
          .as("s"))
    val full = agg0(o).withColumnRenamed("n", "n_full")
      .withColumnRenamed("s", "s_full")
    graft.core.Caches.retain("entry.ivm", o)
    merged.join(full, "g")
      .select(col("g"), col("n"),
        round(col("s").cast(DoubleType), 4).as("sum_price"),
        (col("n") === col("n_full") && col("s") === col("s_full")).as("ivm_ok"))
      .orderBy("g")
  }

  /** E1 — multi-touch attribution (linear model): every purchase's
    * value is split equally across the user's touch events (any
    * non-purchase event) in the 7 days before it; purchases with no
    * touches credit a 'direct' bucket. Per-touch credit is computed in
    * integer MICRO-units (`round(v·10⁶ / n_touches)` — the double
    * division is deterministic, its scale-0 round is engine-exact, and
    * integer micros sum exactly; a raw double credit sum would be
    * partition-order-dependent). The purchase×touch pairing is a
    * per-user equi-join with a time-window residual predicate —
    * fan-out bounded by per-user activity, never a global range join.
    */
  private def qAttribution(s: SparkSession, dir: String): DataFrame = {
    val sevenDaysUs = 7L * 86400000000L
    val e = ev(s, dir).select(col("user_id"), col("event_id"),
        col("event_type"), expr("ts div 1000").as("us"),
        col("value").cast(DoubleType).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        col("us").as("p_us"), col("v"))
    val touches = e.where(col("event_type") =!= "purchase")
      .select(col("user_id"), col("event_type").as("touch_type"),
        col("us").as("t_us"))
    val pairs = purchases.join(touches, Seq("user_id"))
      .where(col("t_us") < col("p_us") && col("t_us") >= col("p_us") - sevenDaysUs)
    val counted = pairs.groupBy("p_id", "v")
      .agg(count(lit(1)).as("n_touches"))
    val credited = pairs
      .join(counted.select(col("p_id"), col("n_touches")), "p_id")
      .select(col("touch_type"),
        round(col("v") * lit(1000000.0) / col("n_touches").cast(DoubleType))
          .cast("long").as("credit_micro"))
    val direct = purchases.join(
        counted.select(col("p_id"), col("n_touches")), Seq("p_id"), "left_anti")
      .select(lit("direct").as("touch_type"),
        round(col("v") * lit(1000000.0)).cast("long").as("credit_micro"))
    graft.core.Caches.retain("entry.attribution", e)
    credited.unionByName(direct)
      .groupBy("touch_type")
      .agg(count(lit(1)).as("n_credited"),
        round(sum("credit_micro").cast(DoubleType) / lit(1000000.0), 4)
          .as("credit"))
      .orderBy("touch_type")
  }

  /** A36 — Holt–Winters additive triple smoothing
    * ([[graft.seq.Rolling.holtWintersByKey]]): monthly revenue per
    * nation with a 12-month seasonal component — the seasonality-aware
    * companion to q167's Holt. Same distributed shape (one key per
    * group, order-fixed sequential fold), seasonal state carried by
    * rotation so the fold needs no time index.
    */
  private def qHoltWinters(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders").select(col("o_custkey"),
      col("o_totalprice"),
      (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("ym"))
    val c = Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.load(s, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    val monthly = o.join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("ym"))
      .agg(Stats.dsum(col("o_totalprice")).as("rev"))
    graft.seq.Rolling.holtWintersByKey(monthly, Seq("n_name"), "ym", "rev",
        alpha = 0.5, beta = 0.3, gamma = 0.2, period = 12)
      .select(col("n_name"), col("n"), round(col("level"), 6).as("level"),
        round(col("trend"), 6).as("trend"),
        round(col("next_season"), 6).as("next_season"),
        round(col("forecast"), 6).as("forecast"))
      .orderBy("n_name")
  }

  /** A37 — split-conformal prediction interval: the
    * distribution-free uncertainty wrapper around ANY point predictor
    * (Vovk; Angelopoulos & Bates 2021). Hash-split train/cal/test; the
    * predictor is the per-segment train mean; q-hat is the (1-alpha)
    * calibration-residual quantile via the distributed exact
    * interpolated selection; test coverage of |y - yhat| <= q-hat is
    * then reported. Every number recomputes exactly in SQL: the oracle
    * is a full value check, not an audit.
    */
  private def qConformal(s: SparkSession, dir: String): DataFrame = {
    val alpha = 0.1
    val o = Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority").as("seg"),
        col("o_totalprice").cast(DoubleType).as("y"))
    val split = graft.aug.Sampling.splitAssign(o, "o_orderkey",
        Seq("train" -> 0.5, "cal" -> 0.25, "test" -> 0.25))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val means = split.where(col("split") === "train")
      .groupBy("seg").agg(Stats.dmean(col("y")).as("yhat"))
    val withResid = split.join(broadcast(means), "seg")
      .withColumn("r", abs(col("y") - col("yhat")))
    val cal = withResid.where(col("split") === "cal")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nCal = cal.count()
    // q-hat at the PLAIN (1-alpha) interpolated quantile — constant
    // fraction on both engines (DuckDB's quantile_cont cannot take a
    // computed fraction); the finite-sample-corrected
    // k = ceil((n_cal+1)(1-alpha)) order statistic is the production
    // refinement — same plan, a rank instead of a fraction
    val qhat = graft.core.OrderStats.quantilesOf(cal, "r",
      Seq(1.0 - alpha)).head
    graft.core.Caches.retain("entry.conformal", split, cal)
    split.where(col("split") === "test")
      .join(broadcast(means), "seg")
      .agg(count(lit(1)).as("n_test"),
        count(when(abs(col("y") - col("yhat")) <= qhat, 1)).as("n_covered"))
      .select(lit(nCal).as("n_cal"),
        round(lit(qhat), 4).as("qhat"), col("n_test"), col("n_covered"),
        round(col("n_covered").cast(DoubleType) /
          col("n_test").cast(DoubleType), 6).as("coverage"))
  }

  /** A38 — walk-forward forecast backtest
    * ([[graft.seq.Rolling.holtBacktestByKey]]): the monthly-revenue
    * Holt smoother scored by expanding-window one-step-ahead MAE
    * against the naive last-value baseline, per nation — forecast
    * validation with no look-ahead, errors accumulated inside the
    * order-fixed fold so the MAEs are engine-exact. A negative skill
    * honestly reports where persistence beats the smoother.
    */
  private def qForecastBacktest(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders").select(col("o_custkey"),
      col("o_totalprice"),
      (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("ym"))
    val c = Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.load(s, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    val monthly = o.join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("ym"))
      .agg(Stats.dsum(col("o_totalprice")).as("rev"))
    graft.seq.Rolling.holtBacktestByKey(monthly, Seq("n_name"), "ym", "rev",
        alpha = 0.5, beta = 0.3)
      .select(col("n_name"), col("n"), round(col("mae"), 6).as("mae"),
        round(col("mae_naive"), 6).as("mae_naive"),
        round(col("skill"), 6).as("skill"))
      .orderBy("n_name")
  }

  /** D24 — PARAGRAPH-level exact dedup (the CCNet/RefinedWeb
    * "hash each paragraph, keep the first occurrence" pass — Wenzek
    * et al. 2020 §3.1): documents segment into NON-overlapping
    * 10-token blocks (the corpus has no newlines, so fixed-width
    * blocks stand in for paragraphs), each block hashes once, and a
    * block instance survives iff it is the global first occurrence of
    * its hash (min packed (doc_id, pos) — the integer-argmax
    * tie-break pattern). Complements q79 (OVERLAPPING spans →
    * coverage) and q23 (whole-doc dedup): this is the granularity
    * that strips shared boilerplate without dropping whole documents.
    * Cost is linear: one explode (n/10 blocks per doc — 10× CHEAPER
    * than a shingle explode), one map-combinable groupBy(hash), one
    * hash-keyed join back; per-source rollup with exact scaled-integer
    * retention fractions.
    */
  private def qParagraphDedup(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    val B = 10
    val paras = par(doc(s, dir))
      .select(col("doc_id"), col("source"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("source"), posexplode(
        transform(sequence(lit(0), ((size(col("toks")) - 1) / B).cast("int")),
          i => struct(
            TextOps.strHash(array_join(slice(col("toks"), i * B + 1, lit(B)), " ")).as("h"),
            least(lit(B), size(col("toks")) - i * B).cast("long").as("ntok")))))
      .select(col("doc_id"), col("source"), col("pos").cast("long").as("pos"),
        col("col.h").as("h"), col("col.ntok").as("ntok"))
    val byHash = paras.groupBy("h").agg(count(lit(1)).as("n_inst"),
      min(col("doc_id") * lit(1000000L) + col("pos")).as("fo"))
    paras.join(byHash, "h")
      .groupBy("source")
      .agg(countDistinct("doc_id").as("n_docs"),
        count(lit(1)).as("n_paras"),
        count(when(col("n_inst") > 1, 1)).as("n_dup_paras"),
        sum("ntok").as("n_tokens"),
        sum(when(col("n_inst") > 1, col("ntok")).otherwise(lit(0L)))
          .as("dup_tokens"),
        sum(when(col("doc_id") * lit(1000000L) + col("pos") === col("fo"),
          col("ntok")).otherwise(lit(0L))).as("kept_tokens"))
      .withColumn("kept_e6", expr("kept_tokens * 1000000 div n_tokens"))
      .orderBy("source")
  }

  /** D25 — DSIR-style importance weighting for data selection (Xie et
    * al. 2023, "Data Selection for Language Models via Importance
    * Resampling"): hashed-bigram bag-of-features, target = the English
    * slice, raw = the whole corpus; per-document weight is the mean
    * Laplace-smoothed log-likelihood ratio of its bigram buckets.
    * Scale shape: bigrams hash into a FIXED 1024-bucket feature space,
    * so both distribution fits are map-combinable aggregates to 1024
    * rows, the fitted log-ratio table broadcasts, and scoring is a
    * broadcast-join map pass — no shuffle grows with the corpus.
    * Determinism: ln rounds at 6 per bucket (the q96 transcendental
    * pattern), per-doc means are decimal-exact sums of those rounded
    * values; selection = weight > 0 (more target-like than raw).
    */
  private def qDsir(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    val NB = 1024
    val d = par(doc(s, dir))
      .select(col("doc_id"), col("source"), col("lang"),
        TextOps.tokens(col("text")).as("toks"))
    val inst = d.select(col("doc_id"), col("source"), col("lang"),
        explode(when(size(col("toks")) >= 2,
          transform(sequence(lit(1), size(col("toks")) - 1),
            i => TextOps.strHash(concat(
              element_at(col("toks"), i), lit(" "),
              element_at(col("toks"), i + 1))) % NB))
          .otherwise(array().cast("array<long>"))).as("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q262", inst)
    val tgt = inst.where(col("lang") === "en")
      .groupBy("b").agg(count(lit(1)).as("ct"))
    val raw = inst.groupBy("b").agg(count(lit(1)).as("cr"))
    val nT = inst.where(col("lang") === "en").count()
    val nR = inst.count()
    val lr = raw.join(tgt, Seq("b"), "left")
      .select(col("b"), round(
        log((coalesce(col("ct"), lit(0L)) + lit(1)).cast(DoubleType) /
          lit((nT + NB).toDouble)) -
        log((col("cr") + lit(1)).cast(DoubleType) / lit((nR + NB).toDouble)),
        6).as("lr"))
    inst.join(broadcast(lr), "b")
      .groupBy("doc_id", "source")
      .agg(round(Stats.dsum(col("lr")) / count(lit(1)), 6).as("w"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        round(Stats.dsum(col("w")) / count(lit(1)), 6).as("mean_w"),
        count(when(col("w") > 0, 1)).as("n_selected"))
      .orderBy("source")
  }

  /** C7 — simplified SILHOUETTE score per label cluster (Rousseeuw
    * 1987; the "simplified" centroid form — a = distance to own
    * centroid, b = nearest other centroid — is the linear-cost variant
    * every large-scale library ships, vs the O(n²) exact form): the
    * cluster-quality measurement missing from the k-means/gap-stats
    * family (q197 measures k-selection, this measures assignment
    * quality). Two-phase: per-(label, dim) exact means (map-combinable
    * aggregate to k×64 rows, driver-collected under a loud bound),
    * then ONE codegen'd map pass with the centroids as plan literals —
    * the q211 typedlit lesson; no join, no shuffle beyond the final
    * k-row rollup. Determinism: centroid means are dsum/count (bit
    * identical cross-engine), distances fold per-dim squares in fixed
    * 1..64 order exactly like the oracle's list_reduce (the q29 dot
    * pattern), so a, b, s are bitwise reproducible; rounding happens
    * only at the output.
    */
  private def qSilhouette(s: SparkSession, dir: String): DataFrame = {
    val e = em(s, dir).select(col("vec_id"),
      col("label").cast("long").as("label"), col("embedding"))
    val cent = graft.sim.Centroids.labelCentroids(e, "label", "embedding")
      .select(col("group").cast("long").as("label"), col("dim"), col("mean"))
      .collect()
    require(cent.length <= 4096,
      s"silhouette centroid collect guard: ${cent.length} (k*dims) > 4096")
    val byLabel: Seq[(Long, Array[Double])] =
      cent.groupBy(_.getLong(0)).toSeq.sortBy(_._1).map { case (l, rows) =>
        l -> rows.sortBy(_.getLong(1)).map(_.getDouble(2)).toArray
      }
    val dims = byLabel.head._2.length
    def d2To(c: Array[Double]): Column =
      aggregate(sequence(lit(1), lit(dims)), lit(0.0), (acc, i) => {
        val d = element_at(col("embedding"), i.cast("int")).cast(DoubleType) -
          element_at(typedlit(c.toSeq), i.cast("int"))
        acc + d * d
      })
    val withD = byLabel.foldLeft(e) { case (df, (l, c)) =>
      df.withColumn(s"d2_$l", d2To(c))
    }
    val aCol = sqrt(coalesce(byLabel.map { case (l, _) =>
      when(col("label") === l, col(s"d2_$l")) }: _*))
    val bCol = sqrt(least(byLabel.map { case (l, _) =>
      when(col("label") =!= l, col(s"d2_$l")) }: _*))
    withD.select(col("label"), aCol.as("a"), bCol.as("b"),
        ((col("b") - col("a")) / greatest(col("a"), col("b"))).as("sil"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        round(Stats.dsum(col("a")) / count(lit(1)), 6).as("mean_a"),
        round(Stats.dsum(col("b")) / count(lit(1)), 6).as("mean_b"),
        round(Stats.dsum(col("sil")) / count(lit(1)), 6).as("mean_sil"))
      .orderBy("label")
  }

  /** C8 — Johnson–Lindenstrauss random projection with a measured
    * distortion audit: embeddings project 64→16 dims through a
    * deterministic ±1 sign matrix (sign(i,j) from a closed-form parity
    * — reproducible anywhere, nothing to store or broadcast), scaled
    * by 1/√16 (exact: division by 4). Distortion = ‖p(a)−p(b)‖²/‖a−b‖²
    * over a hash-sampled set of adjacent-id pairs (equi-join, never a
    * cross product). This is the cheap-projection leg of the ANN
    * family: JL says pairwise geometry survives a 4× dim cut, and this
    * query MEASURES it (mean/min/max ratio + the fraction inside the
    * [0.5, 1.5] band) instead of assuming it. Projection and distance
    * folds run in fixed dim order (the q29 pattern) so every ratio is
    * bitwise reproducible; rounding only at the output.
    */
  private def qJlProjection(s: SparkSession, dir: String): DataFrame = {
    val dIn = 64
    val dOut = 16
    // sign(i,j): parity of (131i+137j)² mod 1000003 — the SQUARE is
    // load-bearing. A LINEAR parity ((31i+17j)%2 = (-1)^(i+j)) is a
    // rank-1 matrix that collapses every output dim onto one
    // projection (measured band coverage 0.25), and a multiply-mod
    // Knuth hash alternates parity between adjacent cells (columns
    // pairwise anticorrelated, band 0.39–0.48). The quadratic-residue
    // parity measures rank 16, mean |column corr| 0.085, band 0.88 on
    // both Gaussian and the harness embeddings — matching the JL
    // prediction sd ≈ √(2/16) ≈ 0.35.
    val proj: Column = transform(sequence(lit(1), lit(dOut)), j =>
      aggregate(sequence(lit(1), lit(dIn)), lit(0.0), (acc, i) => {
        val v = element_at(col("embedding"), i.cast("int")).cast(DoubleType)
        val x = i.cast("long") * 131L + j.cast("long") * 137L
        acc + when((x * x) % 1000003L % 2 === 0, v).otherwise(-v)
      }) / lit(4.0))
    val e = em(s, dir).select(col("vec_id"), col("embedding"))
      .withColumn("p", proj)
    val a = e.select(col("vec_id").as("ida"), col("embedding").as("va"),
      col("p").as("pa"))
    val b = e.select(col("vec_id").as("idb"), col("embedding").as("vb"),
      col("p").as("pb"))
    def fold2(x: String, y: String, n: Int): Column =
      aggregate(sequence(lit(1), lit(n)), lit(0.0), (acc, i) => {
        val d = element_at(col(x), i.cast("int")).cast(DoubleType) -
          element_at(col(y), i.cast("int")).cast(DoubleType)
        acc + d * d
      })
    val pairs = a.where(graft.aug.Sampling.keyBucket(col("ida"), 5151L) <
        lit(200000L))
      .join(b, col("idb") === col("ida") + 1)
      .select(fold2("va", "vb", dIn).as("od2"), fold2("pa", "pb", dOut).as("pd2"))
      .where(col("od2") > 0)
      .withColumn("ratio", col("pd2") / col("od2"))
    pairs.agg(count(lit(1)).as("n_pairs"),
      round(Stats.dsum(col("ratio")) / count(lit(1)), 6).as("mean_ratio"),
      round(min("ratio"), 6).as("min_ratio"),
      round(max("ratio"), 6).as("max_ratio"),
      count(when(col("ratio") >= 0.5 && col("ratio") <= 1.5, 1))
        .as("n_in_band"))
  }

  /** X7 — POWER ANALYSIS / minimum-detectable-effect planning (the
    * step BEFORE every experiment the q141/q257–q260 family analyzes):
    * per metric (event_type), given the realized arm sizes under the
    * hash assignment and the metric's exact-decimal sd, the absolute
    * and relative MDE at alpha=0.05 two-sided / 80% power —
    * (z_{0.975}+z_{0.80})·sd·√(1/n_a+1/n_b) with the z constants as
    * plan literals. One map-combinable aggregate to k metric rows; the
    * relative MDE ships as an exact floor-scaled integer.
    */
  private def qPowerMde(s: SparkSession, dir: String): DataFrame = {
    val zsum = lit(1.959964 + 0.841621)
    val ev = Tables.load(s, dir, "events")
    val arm = graft.aug.Sampling.keyBucket(col("user_id"), 31L) < lit(500000L)
    ev.groupBy("event_type")
      .agg(count(when(arm, 1)).as("n_a"),
        count(when(!arm, 1)).as("n_b"),
        Stats.dmean(col("value")).as("mean_raw"),
        Stats.dstddevSamp(col("value")).as("sd_raw"))
      .withColumn("mde_abs_raw", zsum * col("sd_raw") *
        sqrt(lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
      .select(col("event_type"), col("n_a"), col("n_b"),
        round(col("mean_raw"), 6).as("mean_value"),
        round(col("sd_raw"), 6).as("sd_value"),
        round(col("mde_abs_raw"), 6).as("mde_abs"),
        floor(col("mde_abs_raw") / col("mean_raw") * 1e6).cast("long")
          .as("mde_rel_e6"))
      .orderBy("event_type")
  }

  /** X8 — mSPRT always-valid sequential test (Johari, Pekelis &
    * Walsh 2017 — the "peeking problem" fix): the event stream in
    * arrival (event_id) order, a checkpoint every 500 events, and at
    * each checkpoint the two-sample mixture-SPRT log-likelihood ratio
    * for the arm mean difference under known variance —
    * logΛ = ½ln(V/(V+τ²)) + δ²τ²/(2V(V+τ²)), V = σ²(1/n_a+1/n_b),
    * τ² = σ²/4; reject when logΛ > ln(1/α) (α=0.05, literal
    * 2.995732). Scale shape: the running per-arm counts/sums come from
    * the two-phase distributed PrefixScan (the W4 machinery — NO
    * single-partition window over the stream); arm sums accumulate in
    * exact integer cents, σ² is the decimal-exact population variance
    * broadcast from a 1-row frame, and only ln rounds at the output
    * (the q96 transcendental pattern).
    */
  private def qMsprt(s: SparkSession, dir: String): DataFrame = {
    val isA = graft.aug.Sampling.keyBucket(col("user_id"), 31L) < lit(500000L)
    // detection-proof pair (the q259 pattern): the HEALTHY stream has
    // identical arms (the test must NOT reject — always-validity in
    // action), the SHIFTED twin bumps arm B values ×1.25 in exact
    // cents (the test MUST cross the boundary) — both scenarios run
    // through the same scan
    def stream(shifted: Boolean): DataFrame = {
      val vc = round(col("value") * 100).cast("long")
      // /4 of a small int is exact in double; cast back restores LONG
      // (a bare Column `/` is double division — PrefixScan needs longs)
      val vcB = if (shifted) ((vc * 5L) / lit(4)).cast("long") else vc
      val ev = Tables.load(s, dir, "events")
        .select(col("event_id"), col("value"),
          when(isA, 1L).otherwise(0L).as("cnt_a"),
          when(isA, vc).otherwise(0L).as("sum_a_c"),
          when(!isA, 1L).otherwise(0L).as("cnt_b"),
          when(!isA, vcB).otherwise(0L).as("sum_b_c"))
      val tag = if (shifted) "shifted" else "healthy"
      val (scanned, _) = PrefixScan.exclusive(ev, "event_id",
        Seq("cnt_a", "sum_a_c", "cnt_b", "sum_b_c"), s"entry.q266.$tag")
      // sigma^2 stays the HEALTHY-stream variance in both scenarios
      // (the planning constant of the known-variance mSPRT)
      val sig = Tables.load(s, dir, "events")
        .agg(Stats.dvarPop(col("value")).as("sig2"))
      scanned
        .select((col("cum_cnt_a_below") + col("cnt_a") +
            col("cum_cnt_b_below") + col("cnt_b")).as("n"),
          (col("cum_cnt_a_below") + col("cnt_a")).as("n_a"),
          (col("cum_cnt_b_below") + col("cnt_b")).as("n_b"),
          (col("cum_sum_a_c_below") + col("sum_a_c")).as("sa_c"),
          (col("cum_sum_b_c_below") + col("sum_b_c")).as("sb_c"))
        .where(col("n") % 500 === 0 && col("n_a") > 0 && col("n_b") > 0)
        .crossJoin(broadcast(sig))
        .withColumn("scenario", lit(tag))
    }
    val cp = stream(shifted = false).unionByName(stream(shifted = true))
    val delta = (col("sa_c").cast(DoubleType) / col("n_a") -
      col("sb_c").cast(DoubleType) / col("n_b")) / lit(100.0)
    val tau2 = col("sig2") / lit(4.0)
    val vv = col("sig2") * (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))
    val logLam = lit(0.5) * log(vv / (vv + tau2)) +
      delta * delta * tau2 / (lit(2.0) * vv * (vv + tau2))
    cp.select(col("scenario"), col("n"), col("n_a"), col("n_b"),
        round(delta, 6).as("delta"),
        round(logLam, 6).as("log_lambda"),
        (logLam > lit(2.995732)).as("rejected"))
      .orderBy("scenario", "n")
  }

  /** M9 — TEMPERATURE SCALING calibration (Guo et al. 2017 — the
    * one-parameter post-hoc calibrator every model-serving pipeline
    * runs): standardized-price logits z against the return flag, NLL(θ)
    * = Σ softplus(θz) − yθz minimized by three unrolled NEWTON steps on
    * θ = 1/T — gradient Σ z(p−y) and curvature Σ z²p(1−p) are ONE
    * map-combinable aggregate per step (distributed second-order
    * optimization with driver-side scalar state, the k-means shape).
    * Determinism: per-row transcendentals (softplus with the u>30
    * linear guard, sigmoid) round at 6 BEFORE their exact decimal
    * sums; θ rounds at 6 between steps (HALF_UP, mirroring round());
    * the oracle replays all three steps in MATERIALIZED CTE stages.
    * Each row reports the θ entering the step, its NLL, and the θ the
    * Newton update produced (raw Newton can overshoot before settling
    * — the trace shows it honestly; NLL at the final θ is the lowest).
    */
  private def qTempScaling(s: SparkSession, dir: String): DataFrame = {
    val base0 = li(s, dir).select(col("l_extendedprice").cast(DoubleType)
      .as("x"), when(col("l_returnflag") === "R", 1.0).otherwise(0.0).as("y"))
    val mo = base0.agg(Stats.dmean(col("x")).as("mu"),
      Stats.dstddevSamp(col("x")).as("sd")).head()
    val (mu, sd) = (mo.getDouble(0), mo.getDouble(1))
    val base = par(base0).withColumn("z", (col("x") - lit(mu)) / lit(sd))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q267", base)
    def softplus(u: Column): Column =
      when(u > 30.0, u).otherwise(log(lit(1.0) + exp(u)))
    def step(theta: Double): (Double, Double, Double) = {
      val u = lit(theta) * col("z")
      val p = lit(1.0) / (lit(1.0) + exp(-u))
      val r = base.agg(
        Stats.dsum(round(softplus(u) - col("y") * u, 6)).as("nll"),
        Stats.dsum(round(col("z") * (p - col("y")), 6)).as("g"),
        Stats.dsum(round(col("z") * col("z") * p * (lit(1.0) - p), 6))
          .as("h")).head()
      (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    }
    def r6(v: Double): Double = java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    var theta = 1.0
    val rows = (1 to 3).map { k =>
      val (nll, g, h) = step(theta)
      val next = r6(theta - g / h)
      val row = (k.toLong, theta, r6(nll), next)
      theta = next
      row
    }
    import s.implicits._
    rows.toDF("iter", "theta_in", "nll", "theta_out")
  }

  /** X9 — exact ENERGY DISTANCE between two value distributions
    * (Székely & Rizzo; the metric two-sample test that sees ANY
    * distributional difference, not just location like q64's KS or
    * q141's t): D² = 2E|X−Y| − E|X−X′| − E|Y−Y′|. The textbook form is
    * O(n²) pairwise; here every pairwise |x−y| sum collapses to ONE
    * distributed prefix scan over the merged value order — for each
    * element, (v·cnt_below − sum_below) against each group's running
    * totals sums exactly the cross-pair absolute differences (each
    * unequal pair counted once at its larger element; ties contribute
    * v−v = 0 wherever they land). Values are exact integer CENTS, so
    * all three pair-sums are overflow-checked BIGINTs with ZERO float
    * divergence — the U-statistic expectations and D² are the only
    * doubles, derived at the end. O(n log n) via the two-phase
    * PrefixScan (W4 machinery), no window, no pair join.
    */
  private def qEnergyDistance(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .where(col("event_type").isin("click", "view"))
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("vc"))
      .withColumn("key", col("vc") * lit(10000000L) + col("event_id"))
      .withColumn("ca", when(col("event_type") === "click", 1L).otherwise(0L))
      .withColumn("sa", when(col("event_type") === "click", col("vc"))
        .otherwise(0L))
      .withColumn("cb", when(col("event_type") === "view", 1L).otherwise(0L))
      .withColumn("sb", when(col("event_type") === "view", col("vc"))
        .otherwise(0L))
    val (sc, _) = PrefixScan.exclusive(ev, "key",
      Seq("ca", "sa", "cb", "sb"), "entry.q268")
    val agg = sc.select(col("ca"), col("cb"),
        (col("vc") * col("cum_ca_below") - col("cum_sa_below")).as("dA"),
        (col("vc") * col("cum_cb_below") - col("cum_sb_below")).as("dB"))
      .agg(sum("ca").as("n_a"), sum("cb").as("n_b"),
        sum(when(col("ca") === 1, col("dB")).otherwise(0L)
          + when(col("cb") === 1, col("dA")).otherwise(0L)).as("sxy"),
        sum(when(col("ca") === 1, col("dA")).otherwise(0L)).as("sxx"),
        sum(when(col("cb") === 1, col("dB")).otherwise(0L)).as("syy"))
    agg.select(col("n_a"), col("n_b"), col("sxy"), col("sxx"), col("syy"),
        (col("sxy").cast(DoubleType) /
          (col("n_a").cast(DoubleType) * col("n_b").cast(DoubleType)))
          .as("exy_c"),
        (lit(2.0) * col("sxx").cast(DoubleType) /
          (col("n_a").cast(DoubleType) * (col("n_a").cast(DoubleType) - 1.0)))
          .as("exx_c"),
        (lit(2.0) * col("syy").cast(DoubleType) /
          (col("n_b").cast(DoubleType) * (col("n_b").cast(DoubleType) - 1.0)))
          .as("eyy_c"))
      .select(col("n_a"), col("n_b"), col("sxy"), col("sxx"), col("syy"),
        round(col("exy_c") / 100.0, 6).as("e_xy"),
        round(col("exx_c") / 100.0, 6).as("e_xx"),
        round(col("eyy_c") / 100.0, 6).as("e_yy"),
        round((lit(2.0) * col("exy_c") - col("exx_c") - col("eyy_c")) / 100.0,
          6).as("energy_d2"))
  }

  /** X10 — NEYMAN ALLOCATION for stratified sampling design (Neyman
    * 1934; the budget-split answer to "how many rows per stratum"):
    * per stratum h, allocate n·N_h·σ_h / Σ N_hσ_h — strata that are
    * big AND noisy get the samples. Complements q72/q113 (which
    * EXECUTE samples) with the DESIGN step, and reports proportional
    * allocation beside it so the design delta is visible. One
    * map-combinable aggregate to k strata + a broadcast total; exact
    * decimal σ, share as floor-scaled integers.
    */
  private def qNeyman(s: SparkSession, dir: String): DataFrame = {
    val budget = 1000.0
    val st = Tables.load(s, dir, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_pop"),
        Stats.dstddevSamp(col("value")).as("sd_raw"))
      .withColumn("ns", col("n_pop").cast(DoubleType) * col("sd_raw"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q269", st)
    val tot = st.agg(Stats.dsum(round(col("ns"), 6)).as("tot_ns"),
      sum("n_pop").as("n_tot"))
    st.crossJoin(broadcast(tot))
      .select(col("event_type"), col("n_pop"),
        round(col("sd_raw"), 6).as("sd_value"),
        floor(round(col("ns"), 6) / col("tot_ns") * 1e6).cast("long")
          .as("share_e6"),
        floor(round(col("ns"), 6) / col("tot_ns") * budget).cast("long")
          .as("neyman_n"),
        floor(col("n_pop").cast(DoubleType) / col("n_tot").cast(DoubleType)
          * budget).cast("long").as("prop_n"))
      .orderBy("event_type")
  }

  /** G5 — label-propagation COMMUNITIES ([[graft.core.LabelProp]])
    * over the brand co-occurrence graph (same ≥5-support edges as
    * q246's k-core): 4 synchronous rounds with the deterministic
    * (max count, then min label) update, then community rollup with a
    * sorted member list. The deterministic tie-break makes classic
    * LPA — usually randomized — exactly SQL-replayable: the oracle
    * unrolls all 4 rounds as MATERIALIZED CTE stages.
    */
  private def qLabelProp(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(s, dir, "part").select(col("p_partkey"), col("p_brand"))
    val ob = li(s, dir).select(col("l_orderkey"), col("l_partkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("ok"), col("p_brand").as("b"))
      .distinct()
    val e = ob.toDF("ok", "b1")
      .join(ob.toDF("ok2", "b2"), col("ok") === col("ok2") && col("b1") < col("b2"))
      .groupBy("b1", "b2").agg(count(lit(1)).as("np"))
      .where(col("np") >= 5).select("b1", "b2")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q270", e)
    graft.core.LabelProp.run(e, "b1", "b2", rounds = 4)
      .groupBy("lbl")
      .agg(count(lit(1)).as("n_members"),
        concat_ws(",", sort_array(collect_list(col("v")))).as("members"))
      .select(col("lbl").as("community"), col("n_members"), col("members"))
      .orderBy("community")
  }

  /** D26 — FELLEGI–SUNTER probabilistic record linkage (Fellegi &
    * Sunter 1969 — the decision-theoretic scoring layer the blocking
    * family q237/q241/q256 feeds): a corrupted twin of customer
    * (name digit bumped 1-in-7, segment rotated 1-in-11, balance
    * shifted 1-in-5 — the q259 detection-proof pattern) links back via
    * a (nation, name-prefix) BLOCK equi-join; each candidate pair
    * scores Σ of per-field agreement log-weights ln(m/u) /
    * ln((1−m)/(1−u)) with the m/u literals in the plan, and the
    * link / possible / non-link decision bands are evaluated against
    * ground truth (same custkey), so the output MEASURES the
    * operating points (true/false links per band) instead of assuming
    * them. Quadratic work stays block-confined; weights round at 6
    * per field before exact decimal pair sums.
    */
  private def qFellegiSunter(s: SparkSession, dir: String): DataFrame = {
    def w(m: Double, u: Double): (Double, Double) =
      (math.log(m / u), math.log((1.0 - m) / (1.0 - u)))
    val (wnA, wnD) = w(0.95, 0.001) // name
    val (wsA, wsD) = w(0.95, 0.2) // segment
    val (wbA, wbD) = w(0.98, 0.01) // balance-within-1
    val c = Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_name"),
        col("c_acctbal"), col("c_mktsegment"))
    val twin = c.select(col("c_custkey").as("t_custkey"),
      col("c_nationkey").as("t_nationkey"),
      when(col("c_custkey") % 7 === 0,
        concat(substring(col("c_name"), 1, 16),
          lit("9"), substring(col("c_name"), 18, 99)))
        .otherwise(col("c_name")).as("t_name"),
      when(col("c_custkey") % 5 === 0, col("c_acctbal") + lit(1.5))
        .otherwise(col("c_acctbal")).as("t_acctbal"),
      when(col("c_custkey") % 11 === 0, lit("ROTATED"))
        .otherwise(col("c_mktsegment")).as("t_mktsegment"))
    // block on (nation, name-prefix-15): the 9-digit zero-padded id
    // means chars 10..15 are the HIGH six digits, i.e. the key/1000
    // range — block sizes stay BOUNDED as the corpus grows (new
    // customers mint new ranges). A 12-char prefix only reaches the
    // top-3 digits — constant "000" below key 1e6, which silently
    // degenerates to nation-only blocking: ScaleAb measured exponent
    // 1.78 (1.5 s → 92 s at 10×) before this fix, 0.0x after. The
    // 1-in-7 corruption sits at char 17 (inside the last-3 digits),
    // safely OUTSIDE the blocking prefix.
    val pairs = c.join(twin,
      col("c_nationkey") === col("t_nationkey") &&
        substring(col("c_name"), 1, 15) === substring(col("t_name"), 1, 15))
    val weight =
      round(when(col("c_name") === col("t_name"), wnA).otherwise(wnD), 6) +
      round(when(col("c_mktsegment") === col("t_mktsegment"), wsA)
        .otherwise(wsD), 6) +
      round(when(abs(col("c_acctbal") - col("t_acctbal")) <= 1.0, wbA)
        .otherwise(wbD), 6)
    pairs.select(weight.as("fs_w"),
        (col("c_custkey") === col("t_custkey")).as("is_true"))
      .withColumn("decision",
        when(col("fs_w") > 5.0, "link")
          .when(col("fs_w") < 0.0, "non_link").otherwise("possible"))
      .groupBy("decision")
      .agg(count(lit(1)).as("n_pairs"),
        count(when(col("is_true"), 1)).as("n_true"),
        round(Stats.dsum(col("fs_w")) / count(lit(1)), 6).as("mean_w"))
      .orderBy("decision")
  }

  /** X11 — exact SHAPLEY channel attribution (Shapley 1953 applied to
    * marketing response — the game-theoretic upgrade of q217's
    * first/last/linear heuristics): players = the four non-purchase
    * event channels, v(S) = observed conversion rate of users whose
    * exposure set is exactly S. The corpus-sized work is ONE user
    * rollup to a 4-bit exposure mask + purchase flag and ONE 16-row
    * coalition aggregate; the exponential Shapley lattice lives
    * entirely on metadata (16 coalitions, driver-enumerated exactly
    * like the oracle's bitmask joins). Exactness: v scales to
    * integer-e6 conversion rates, the |S|!(n−|S|−1)! weights are the
    * integers {6,2,2,6} (×24 = 4!), so every marginal-contribution sum
    * is INTEGER arithmetic — the only double is the final /24e6
    * display division.
    */
  private def qShapleyAttribution(s: SparkSession, dir: String): DataFrame = {
    val channels = Seq("click" -> 1, "view" -> 2, "signup" -> 4, "error" -> 8)
    val ev = Tables.load(s, dir, "events")
    // exposure uses a SPARSIFIED stream (event_id % 13 < 4) so masks
    // actually vary — on the full stream every active user touches
    // every channel and Shapley degenerates to the uniform 1/4 split
    // (measured); conversion stays on the full stream
    val mask = channels.map { case (c, b) =>
      max(when(col("event_type") === c && col("event_id") % 13 < 4, b)
        .otherwise(0)) }.reduce(_ + _)
    val perUser = ev.groupBy("user_id")
      .agg(mask.as("mask"),
        max(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("conv"))
    val coal = perUser.groupBy("mask")
      .agg(count(lit(1)).as("n"), sum("conv").as("nc"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val v6 = (0 until 16).map { m =>
      m -> coal.get(m).map { case (n, nc) => nc * 1000000L / n }.getOrElse(0L)
    }.toMap
    val wFac = Map(0 -> 6L, 1 -> 2L, 2 -> 2L, 3 -> 6L)
    import s.implicits._
    channels.map { case (name, bit) =>
      val phiX = (0 until 16).filter(m => (m & bit) == 0).map { m =>
        wFac(Integer.bitCount(m)) * (v6(m | bit) - v6(m))
      }.sum
      val nExposed = coal.collect {
        case (m, (n, _)) if (m & bit) != 0 => n }.sum
      (name, nExposed, phiX,
        BigDecimal(phiX.toDouble / 24.0 / 1000000.0)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toDF("channel", "n_exposed_users", "phi_x24e6", "shapley_value")
      .orderBy("channel")
  }

  /** X12 — stratified IPW-free ATE (the causal-inference composition of
    * the experimentation family: q257 reduces variance WITHIN an
    * experiment, this estimates the effect when assignment is only
    * conditionally balanced): strata = order priority, treatment = the
    * hash arm, ATE = Σ_h (N_h/N)(ȳ_hT − ȳ_hC) with the conservative
    * two-sample SE² = Σ_h (N_h/N)²(s²_hT/n_hT + s²_hC/n_hC) — the
    * blocked-difference estimator (Imbens & Rubin ch. 9). One grouped
    * decimal-exact aggregate per stratum + a broadcast total; every
    * moment mirrors in SQL.
    */
  private def qStratifiedAte(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
      .select(col("o_orderpriority").as("stratum"),
        col("o_totalprice").cast(DoubleType).as("y"),
        (graft.aug.Sampling.keyBucket(col("o_orderkey"), 1234L) <
          lit(500000L)).as("t"))
    val st = o.groupBy("stratum")
      .agg(count(lit(1)).as("n_h"),
        count(when(col("t"), 1)).as("n_t"),
        count(when(!col("t"), 1)).as("n_c"),
        Stats.dmean(when(col("t"), col("y"))).as("my_t"),
        Stats.dmean(when(!col("t"), col("y"))).as("my_c"),
        Stats.dvarSamp(when(col("t"), col("y"))).as("v_t"),
        Stats.dvarSamp(when(!col("t"), col("y"))).as("v_c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q273", st)
    val tot = st.agg(sum("n_h").as("n_tot"))
    val wgt = col("n_h").cast(DoubleType) / col("n_tot").cast(DoubleType)
    val per = st.crossJoin(broadcast(tot))
      .select(col("stratum"), col("n_h"), col("n_t"), col("n_c"),
        round(col("my_t") - col("my_c"), 6).as("diff_h"),
        (wgt * (col("my_t") - col("my_c"))).as("wdiff_raw"),
        (wgt * wgt * (col("v_t") / col("n_t") + col("v_c") / col("n_c")))
          .as("wvar_raw"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q273", per)
    val ate = per.agg(
      Stats.dsum(round(col("wdiff_raw"), 6)).as("ate"),
      Stats.dsum(round(col("wvar_raw"), 6)).as("var_ate")).head()
    per.select(col("stratum"), col("n_h"), col("n_t"), col("n_c"),
        col("diff_h"))
      .withColumn("ate", round(lit(ate.getDouble(0)), 6))
      .withColumn("se_ate", round(sqrt(lit(ate.getDouble(1))), 6))
      .orderBy("stratum")
  }

  /** SK5 — AMS F₂ sketch (Alon–Matias–Szegedy 1996, the second
    * frequency moment = self-join size / repeat rate of the bigram
    * stream): 16 ±1 counters, each ONE map-combinable sum — the
    * streaming-friendly estimator beside the exact Σc² pass it is
    * verified against (the q190/q214 sketch-audit pattern, except here
    * BOTH the estimate and the truth are exact integers, so the oracle
    * value-checks the estimator itself, not just an invariant). Signs
    * come from the quadratic-residue parity of (h + j·1000003)² mod P
    * — the q264 lesson: affine/multiplicative parities are correlated
    * across counters (measured rel-err −0.70 to −0.82 on this corpus);
    * the squared form measures −0.10 (mean-of-16) as AMS variance
    * predicts. The bigram hash is HOISTED into its own projection
    * (the HOF inlining trap — 16 counter lambdas would otherwise
    * re-hash per counter). Everything is integer arithmetic; the only
    * divisions are by powers of two (exact in double).
    */
  private def qAmsF2(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    val P = 1000000007L
    val inst = par(doc(s, dir))
      .select(TextOps.tokens(col("text")).as("toks"))
      .select(explode(when(size(col("toks")) >= 2,
        transform(sequence(lit(1), size(col("toks")) - 1),
          i => TextOps.strHash(concat(
            element_at(col("toks"), i), lit(" "),
            element_at(col("toks"), i + 1)))))
        .otherwise(array().cast("array<long>"))).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q274", inst)
    val sums = (1 to 16).map { j =>
      val t = col("h") + lit(j * 1000003L)
      sum(when((t * t) % P % 2 === 0, 1L).otherwise(-1L)).as(s"s$j")
    }
    val sk = inst.agg(sums.head, sums.tail: _*).head()
    val ss = (0 until 16).map(sk.getLong)
    val ex = inst.groupBy("h").agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_distinct"), sum(col("c") * col("c")).as("f2"),
        sum("c").as("n_inst")).head()
    val (nDistinct, f2, nInst) = (ex.getLong(0), ex.getLong(1), ex.getLong(2))
    val sq = ss.map(v => v * v)
    val estMean = sq.sum / 16.0
    val groupMeans = sq.grouped(4).map(g => g.sum / 4.0).toSeq.sorted
    val estMom = (groupMeans(1) + groupMeans(2)) / 2.0
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    import s.implicits._
    Seq((nInst, nDistinct, f2, r6(estMean), r6(estMom),
        r6((estMean - f2) / f2), r6((estMom - f2) / f2)))
      .toDF("n_inst", "n_distinct", "f2_exact", "f2_est_mean", "f2_est_mom",
        "rel_err_mean", "rel_err_mom")
  }

  /** X13 — instrumental-variables LATE via the WALD estimator (Imbens
    * & Angrist 1994 — the encouragement-design answer when uptake is
    * voluntary): Z = the hash assignment, D = deterministic uptake
    * (2/3 of encouraged comply, 1/7 of control always-take), LATE =
    * ITT / compliance-difference. Scenario pair: the NULL stream is
    * raw revenue, the INJECTED twin adds exactly +500 to every taker.
    * Because both scenarios share the identical draw, the noise
    * CANCELS in the twin difference: late(injected) − late(null) =
    * 500.000000 exactly (ITT shifts by exactly 500·compliance over
    * the same compliance) — the q259/q266 detection-proof pattern
    * applied to identification, with an EXACT recovery identity
    * instead of a statistical one. The per-scenario point estimates
    * honestly carry the small-sample noise their SE reports. One
    * grouped decimal-exact aggregate per scenario; delta-method SE =
    * SE(ITT)/|compliance|.
    */
  private def qIvLate(s: SparkSession, dir: String): DataFrame = {
    val z = graft.aug.Sampling.keyBucket(col("o_orderkey"), 777L) <
      lit(500000L)
    val d = (z && col("o_custkey") % 3 =!= 0) ||
      (!z && col("o_custkey") % 7 === 0)
    val base = Tables.load(s, dir, "orders")
      .select(z.as("z"), d.as("d"), col("o_totalprice").cast(DoubleType)
        .as("y0"))
    def arm(df: DataFrame, scenario: String): DataFrame = {
      val y = if (scenario == "injected")
        col("y0") + when(col("d"), 500.0).otherwise(0.0)
      else col("y0")
      df.withColumn("y", y)
        .groupBy("z")
        .agg(count(lit(1)).as("n"),
          Stats.dmean(col("y")).as("my"),
          Stats.dvarSamp(col("y")).as("vy"),
          count(when(col("d"), 1)).as("n_d"))
        .withColumn("scenario", lit(scenario))
    }
    val g = arm(base, "null").unionByName(arm(base, "injected"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q275", g)
    val z1 = g.where(col("z")).select(col("scenario"), col("n").as("n1"),
      col("my").as("my1"), col("vy").as("vy1"), col("n_d").as("nd1"))
    val z0 = g.where(!col("z")).select(col("scenario"), col("n").as("n0"),
      col("my").as("my0"), col("vy").as("vy0"), col("n_d").as("nd0"))
    val itt = col("my1") - col("my0")
    val comp = col("nd1").cast(DoubleType) / col("n1") -
      col("nd0").cast(DoubleType) / col("n0")
    val seItt = sqrt(col("vy1") / col("n1") + col("vy0") / col("n0"))
    z1.join(z0, "scenario")
      .select(col("scenario"), (col("n1") + col("n0")).as("n"),
        round(itt, 6).as("itt"),
        round(comp, 6).as("compliance_diff"),
        round(itt / comp, 6).as("late"),
        round(seItt / abs(comp), 6).as("se_late"))
      .orderBy("scenario")
  }

  /** X14 — difference-in-differences with a PLACEBO pre-trend check
    * (Card & Krueger shape): treated = the user hash arm, period =
    * a deterministic event-id phase, DiD = (ΔT) − (ΔC). Scenario
    * pair on the identical draw: the injected twin adds exactly +25
    * to treated-post values, so did(injected) − did(null) = 25.000000
    * EXACTLY (shared noise cancels); the placebo contrast (two PRE
    * sub-periods) is by construction identical across scenarios — the
    * parallel-trends diagnostic that separates a real design from a
    * trend artifact. One grouped aggregate per scenario over
    * (treated, phase) cells; exact decimal moments, closed-form SE
    * from the four cell variances.
    */
  private def qDid(s: SparkSession, dir: String): DataFrame = {
    val treated = graft.aug.Sampling.keyBucket(col("user_id"), 31L) <
      lit(500000L)
    val base = Tables.load(s, dir, "events")
      .select(treated.as("t"), (col("event_id") % 10).as("phase"),
        col("value").cast(DoubleType).as("y0"))
    def cells(scenario: String): DataFrame = {
      val post = col("phase") >= 5
      val y = if (scenario == "injected")
        col("y0") + when(col("t") && post, 25.0).otherwise(0.0)
      else col("y0")
      base.withColumn("y", y)
        .withColumn("grp",
          when(post, "post").when(col("phase") < 2, "pre_a")
            .otherwise("pre_b"))
        .groupBy("t", "grp")
        .agg(count(lit(1)).as("n"), Stats.dmean(col("y")).as("my"),
          Stats.dvarSamp(col("y")).as("vy"))
        .withColumn("scenario", lit(scenario))
    }
    val g = cells("null").unionByName(cells("injected"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q276", g)
    def cell(t: Boolean, grp: String, suffix: String): DataFrame =
      g.where(col("t") === t && col("grp") === grp)
        .select(col("scenario"), col("n").as(s"n_$suffix"),
          col("my").as(s"my_$suffix"), col("vy").as(s"vy_$suffix"))
    val j = cell(true, "post", "tp").join(cell(true, "pre_a", "ta"), "scenario")
      .join(cell(true, "pre_b", "tb"), "scenario")
      .join(cell(false, "post", "cp"), "scenario")
      .join(cell(false, "pre_a", "ca"), "scenario")
      .join(cell(false, "pre_b", "cb"), "scenario")
    // pre = both pre sub-periods pooled by exact-count weighting
    val preT = (col("my_ta") * col("n_ta") + col("my_tb") * col("n_tb")) /
      (col("n_ta") + col("n_tb"))
    val preC = (col("my_ca") * col("n_ca") + col("my_cb") * col("n_cb")) /
      (col("n_ca") + col("n_cb"))
    val did = (col("my_tp") - preT) - (col("my_cp") - preC)
    val placebo = (col("my_tb") - col("my_ta")) -
      (col("my_cb") - col("my_ca"))
    val seDid = sqrt(col("vy_tp") / col("n_tp") + col("vy_cp") / col("n_cp") +
      col("vy_ta") / col("n_ta") + col("vy_ca") / col("n_ca"))
    j.select(col("scenario"),
        (col("n_tp") + col("n_ta") + col("n_tb") + col("n_cp") +
          col("n_ca") + col("n_cb")).as("n"),
        round(did, 6).as("did"),
        round(seDid, 6).as("se_did"),
        round(placebo, 6).as("placebo_pre_trend"))
      .orderBy("scenario")
  }

  /** X15 — regression discontinuity (sharp RDD, Thistlethwaite &
    * Campbell 1960): running variable = account balance, cutoff 5000,
    * bandwidth ±2000; per side, a closed-form local LINEAR fit of
    * customer revenue on the centered running variable (the q173 OLS
    * moments, decimal-exact), jump = the difference of the two
    * intercepts AT the cutoff. The injected twin adds exactly +300
    * above the cutoff; on the shared draw the twin difference
    * jump(injected) − jump(null) = 300.000000 EXACTLY, while the
    * per-scenario jumps honestly carry the local-linear small-sample
    * noise (tens of thousands at n≈25/side — RDD needs bandwidth-
    * scaled data, and the output shows why).
    * The fit is one grouped aggregate over (scenario, side) — four
    * rows of sufficient statistics, everything else is driver-free
    * column arithmetic.
    */
  private def qRdd(s: SparkSession, dir: String): DataFrame = {
    val cut = 5000.0
    val bw = 2000.0
    val o = Tables.load(s, dir, "orders")
      .groupBy("o_custkey").agg(Stats.dsum(col("o_totalprice")).as("rev"))
    val c = Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal").cast(DoubleType).as("x"))
    val base = c.join(o, col("c_custkey") === col("o_custkey"))
      .where(abs(col("x") - cut) <= bw)
      .select((col("x") - cut).as("xc"), (col("x") >= cut).as("right"),
        col("rev").as("y0"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q277", base)
    def fits(scenario: String): DataFrame = {
      val y = if (scenario == "injected")
        col("y0") + when(col("right"), 300.0).otherwise(0.0)
      else col("y0")
      val n = count(lit(1)).cast(DoubleType)
      base.withColumn("y", y)
        .groupBy("right")
        .agg(count(lit(1)).as("n"),
          ((n * Stats.dsum(col("xc") * col("y")) -
            Stats.dsum(col("xc")) * Stats.dsum(col("y"))) /
            (n * Stats.dsum(col("xc") * col("xc")) -
              Stats.dsum(col("xc")) * Stats.dsum(col("xc")))).as("b"),
          (Stats.dsum(col("y")) / n).as("my"),
          (Stats.dsum(col("xc")) / n).as("mx"))
        .select(col("right"), col("n"), col("b"),
          (col("my") - col("b") * col("mx")).as("a"))
        .withColumn("scenario", lit(scenario))
    }
    val g = fits("null").unionByName(fits("injected"))
    val l = g.where(!col("right")).select(col("scenario"),
      col("n").as("n_left"), col("a").as("a_l"), col("b").as("b_l"))
    val r = g.where(col("right")).select(col("scenario"),
      col("n").as("n_right"), col("a").as("a_r"), col("b").as("b_r"))
    l.join(r, "scenario")
      .select(col("scenario"), col("n_left"), col("n_right"),
        round(col("a_l"), 6).as("intercept_left"),
        round(col("a_r"), 6).as("intercept_right"),
        round(col("b_l"), 6).as("slope_left"),
        round(col("b_r"), 6).as("slope_right"),
        round(col("a_r") - col("a_l"), 6).as("jump"))
      .orderBy("scenario")
  }

  /** X16 — RAKING / iterative proportional fitting (Deming & Stephan
    * 1940 — the survey-weighting workhorse; completes the weighting
    * family beside q269's Neyman DESIGN and q113's weighted
    * EXECUTION): a 30% hash sample of events is re-weighted so its
    * (event_type × value-band) margins match the full population's.
    * The corpus-sized work is exactly TWO map-combinable cell
    * aggregates (population and sample); the IPF loop runs on the
    * 15-cell metadata frame as driver scalar state (the k-means/q267
    * shape) — 3 rounds × (row-fit, column-fit). Determinism: cell
    * weights round at 6 after every multiplicative update and the
    * margin sums are decimal-exact over those rounded values, so the
    * oracle replays all 6 half-rounds in MATERIALIZED CTE stages.
    */
  private def qRaking(s: SparkSession, dir: String): DataFrame = {
    val band = when(col("value") < 50, "lo")
      .when(col("value") < 200, "mid").otherwise("hi")
    val ev = Tables.load(s, dir, "events")
      .select(col("event_id"), col("event_type").as("r"), band.as("c"))
    val pop = ev.groupBy("r", "c").agg(count(lit(1)).as("n_pop"))
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(2))
      .toMap
    val samp = graft.aug.Sampling.hashSample(ev, "event_id", 0.3, seed = 99L)
      .groupBy("r", "c").agg(count(lit(1)).as("n_samp"))
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(2))
      .toMap
    val cells = pop.keySet.toSeq.sorted
    val rows = cells.map(_._1).distinct.sorted
    val colsB = cells.map(_._2).distinct.sorted
    val nPopTot = pop.values.sum
    val nSampTot = samp.values.sum
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // w starts uniform N/n; each half-round scales by target/achieved
    // margin; sums accumulate over ROUNDED per-cell products so the
    // fold is order-free (decimal-sum semantics, mirrored in SQL)
    var w = cells.map(k => k -> r6(nPopTot.toDouble / nSampTot)).toMap
    def dsumLocal(vs: Seq[Double]): Double =
      vs.map(v => BigDecimal.valueOf(v)).sum.toDouble
    (1 to 3).foreach { _ =>
      val rowFac = rows.map { r =>
        val target = cells.filter(_._1 == r).map(k => pop(k)).sum.toDouble
        val got = dsumLocal(cells.filter(_._1 == r).map(k =>
          r6(w(k) * samp.getOrElse(k, 0L).toDouble)))
        r -> (if (got > 0) target / got else 1.0)
      }.toMap
      w = w.map { case (k, v) => k -> r6(v * rowFac(k._1)) }
      val colFac = colsB.map { c =>
        val target = cells.filter(_._2 == c).map(k => pop(k)).sum.toDouble
        val got = dsumLocal(cells.filter(_._2 == c).map(k =>
          r6(w(k) * samp.getOrElse(k, 0L).toDouble)))
        c -> (if (got > 0) target / got else 1.0)
      }.toMap
      w = w.map { case (k, v) => k -> r6(v * colFac(k._2)) }
    }
    import s.implicits._
    cells.map { k =>
      (k._1, k._2, pop(k), samp.getOrElse(k, 0L), w(k),
        r6(w(k) * samp.getOrElse(k, 0L).toDouble))
    }.toDF("event_type", "band", "n_pop", "n_samp", "weight", "w_mass")
      .orderBy("event_type", "band")
  }

  /** X17 — exact WASSERSTEIN-1 drift (earth-mover distance, THE
    * distribution-shift metric of ML monitoring — companion to q268's
    * energy distance and q64's KS): W₁ = ∫|F_A − F_B| dx computed
    * EXACTLY as Σ |cumA·n_B − cumB·n_A|·gap over distinct cent values
    * — an integer numerator, one division at the end. The window runs
    * over the PRE-AGGREGATED distinct-value frame (the documented
    * rocPoints exemption class: #distinct cents, not #events, and
    * partitioned by scenario). Healthy/shifted scenario pair (the
    * q266 pattern): identical arms must read ≈0 dollars, the ×1.25
    * arm-B twin must read the planted shift.
    */
  private def qW1Drift(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val isA = graft.aug.Sampling.keyBucket(col("user_id"), 31L) < lit(500000L)
    val base = Tables.load(s, dir, "events")
      .select(isA.as("a"), round(col("value") * 100).cast("long").as("vc"))
    def scen(shifted: Boolean): DataFrame = {
      val vc = if (shifted)
        when(col("a"), col("vc")).otherwise((col("vc") * 5L / lit(4)).cast("long"))
      else col("vc")
      base.select(col("a"), vc.as("v"))
        .groupBy("v")
        .agg(count(when(col("a"), 1)).as("ca"),
          count(when(!col("a"), 1)).as("cb"))
        .withColumn("scenario", lit(if (shifted) "shifted" else "healthy"))
    }
    val g = scen(false).unionByName(scen(true))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q279", g)
    val tot = g.groupBy("scenario")
      .agg(sum("ca").as("n_a"), sum("cb").as("n_b"))
    val wsp = Window.partitionBy("scenario").orderBy("v")
    val cum = g.select(col("scenario"), col("v"),
        sum("ca").over(wsp.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).as("cuma"),
        sum("cb").over(wsp.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).as("cumb"),
        (lead("v", 1).over(wsp) - col("v")).as("gap"))
      .join(broadcast(tot), "scenario")
    cum.groupBy("scenario")
      .agg(max("n_a").as("n_a"), max("n_b").as("n_b"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("gap").isNotNull,
          abs(col("cuma") * col("n_b") - col("cumb") * col("n_a")) *
            col("gap")).otherwise(0L)).as("w1_num"))
      .select(col("scenario"), col("n_a"), col("n_b"), col("n_distinct"),
        col("w1_num"),
        round(col("w1_num").cast(DoubleType) /
          (col("n_a").cast(DoubleType) * col("n_b").cast(DoubleType)) /
          lit(100.0), 6).as("w1_dollars"))
      .orderBy("scenario")
  }

  /** D27 — greedy MAX-COVERAGE corpus selection (the facility-location
    * / submodular objective behind "pick the subset that covers the
    * most content" data-selection recipes — Nemhauser's greedy carries
    * the (1−1/e) guarantee): 8 rounds, each picking the document whose
    * shingle set adds the most UNCOVERED 3-grams (tie-break min
    * doc_id), then folding its shingles into the covered set.
    * Complements q252's k-center (geometric diversity) with the
    * set-coverage view. Per round: one anti-join against the covered
    * set + one grouped count + a 1-row driver argmax (the k-center
    * shape); `localCheckpoint` truncates the growing covered-set
    * lineage. The oracle unrolls all 8 rounds as MATERIALIZED stages.
    */
  private def qCoverageSelect(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    val grams = par(doc(s, dir))
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(array_distinct(
        when(size(col("toks")) >= 3,
          transform(sequence(lit(1), size(col("toks")) - 2),
            i => TextOps.strHash(array_join(slice(col("toks"), i, lit(3)), " "))))
          .otherwise(array().cast("array<long>")))).as("g"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q280", grams)
    val total = grams.select("g").distinct().count()
    var covered = s.range(0).select(col("id").as("g"))
    var cum = 0L
    val picks = (1 to 8).map { k =>
      val gain = grams.join(covered, Seq("g"), "left_anti")
        .groupBy("doc_id").agg(count(lit(1)).as("new_g"))
        .orderBy(desc("new_g"), asc("doc_id")).limit(1).head()
      val (docId, g) = (gain.getLong(0), gain.getLong(1))
      covered = graft.core.Caches.checkpointOnce("entry.q280", covered
        .union(grams.where(col("doc_id") === docId).select("g"))
        .distinct())
      cum += g
      (k.toLong, docId, g, cum, cum * 1000000L / total)
    }
    import s.implicits._
    picks.toDF("rank", "doc_id", "gain", "cum_covered", "coverage_e6")
  }

  /** A39 — BRIER SCORE with the Murphy decomposition (Murphy 1973):
    * brier = reliability − resolution + uncertainty — the calibration
    * summary behind q90's reliability diagram (q90 shows the bins,
    * this reduces them to the three decision-theoretic components and
    * CHECKS the identity, reporting the rounding residual honestly).
    * Probabilities come from a fixed-θ logistic on the standardized
    * price (θ = q267's converged operating point); per-row and per-bin
    * terms round at 6 before their exact decimal sums, two
    * map-combinable aggregate levels (rows → 10 bins → 1).
    */
  private def qBrier(s: SparkSession, dir: String): DataFrame = {
    val mo = li(s, dir).agg(
      Stats.dmean(col("l_extendedprice")).as("mu"),
      Stats.dstddevSamp(col("l_extendedprice")).as("sd")).head()
    val (mu, sd) = (mo.getDouble(0), mo.getDouble(1))
    val theta = 0.025
    val base = par(li(s, dir)).select(
        when(col("l_returnflag") === "R", 1.0).otherwise(0.0).as("y"),
        round(lit(1.0) / (lit(1.0) +
          exp(-(lit(theta) * ((col("l_extendedprice") - lit(mu)) / lit(sd))))),
          6).as("p"))
      .withColumn("bin", least(lit(9L), floor(col("p") * 10).cast("long")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q281", base)
    val glob = base.agg(count(lit(1)).as("n_tot"),
      (Stats.dsum(col("y")) / count(lit(1))).as("ybar"),
      round(Stats.dsum(round((col("p") - col("y")) * (col("p") - col("y")),
        6)) / count(lit(1)), 6).as("brier"))
    val bins = base.groupBy("bin")
      .agg(count(lit(1)).as("nk"),
        (Stats.dsum(col("p")) / count(lit(1))).as("pk"),
        (Stats.dsum(col("y")) / count(lit(1))).as("yk"))
    bins.crossJoin(broadcast(glob))
      .select(col("n_tot"), col("ybar"), col("brier"),
        round(col("nk") * (col("pk") - col("yk")) * (col("pk") - col("yk")),
          6).as("rel_t"),
        round(col("nk") * (col("yk") - col("ybar")) * (col("yk") - col("ybar")),
          6).as("res_t"))
      .groupBy("n_tot", "ybar", "brier")
      .agg(round(Stats.dsum(col("rel_t")) / col("n_tot"), 6).as("reliability"),
        round(Stats.dsum(col("res_t")) / col("n_tot"), 6).as("resolution"))
      .select(col("n_tot"), col("brier"), col("reliability"),
        col("resolution"),
        round(col("ybar") * (lit(1.0) - col("ybar")), 6).as("uncertainty"),
        round(col("brier") - (col("reliability") - col("resolution") +
          col("ybar") * (lit(1.0) - col("ybar"))), 6).as("identity_gap"))
  }

  /** T32 — COLLOCATION detection by Dunning's log-likelihood ratio
    * (Dunning 1993 — the statistically sound cousin of q159's PMI,
    * which overweights rare pairs): adjacent bigrams scored by the
    * 2×2 G² statistic of (bigram count vs first/second-position
    * unigram margins). Counts are exact corpus aggregates; each of
    * the four k·ln(kN/(RC)) terms rounds at 6 before the fixed-order
    * sum (the q96 transcendental pattern); top-20 by (G², pair) via
    * the distributed top-k. Margin joins are vocabulary-sized →
    * broadcast.
    */
  private def qCollocations(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    val bi = par(doc(s, dir))
      .select(TextOps.tokens(col("text")).as("toks"))
      .select(explode(when(size(col("toks")) >= 2,
        transform(sequence(lit(1), size(col("toks")) - 1),
          i => struct(element_at(col("toks"), i).as("w1"),
            element_at(col("toks"), i + 1).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
        .as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q282", bi)
    val pair = bi.groupBy("w1", "w2").agg(count(lit(1)).as("cab"))
      .where(col("cab") >= 5)
    val c1 = bi.groupBy("w1").agg(count(lit(1)).as("c1"))
    val c2 = bi.groupBy("w2").agg(count(lit(1)).as("c2"))
    val nTot = bi.count()
    def term(k: Column, r: Column, c: Column): Column =
      round(when(k > 0, k.cast(DoubleType) *
        log(k.cast(DoubleType) * lit(nTot.toDouble) /
          (r.cast(DoubleType) * c.cast(DoubleType)))).otherwise(0.0), 6)
    val k11 = col("cab")
    val k12 = col("c1") - col("cab")
    val k21 = col("c2") - col("cab")
    val k22 = lit(nTot) - col("c1") - col("c2") + col("cab")
    val r2 = lit(nTot) - col("c1")
    val cc2 = lit(nTot) - col("c2")
    val g2 = lit(2.0) * (term(k11, col("c1"), col("c2")) +
      term(k12, col("c1"), cc2) + term(k21, r2, col("c2")) +
      term(k22, r2, cc2))
    pair.join(broadcast(c1), "w1").join(broadcast(c2), "w2")
      .select(col("w1"), col("w2"), col("cab"), col("c1"), col("c2"),
        round(g2, 6).as("llr"))
      .orderBy(desc("llr"), asc("w1"), asc("w2"))
      .limit(20)
  }

  /** A40 — PINBALL (quantile) LOSS evaluation (Koenker & Bassett
    * 1978's check function — the proper scoring rule for quantile
    * forecasts, completing the q219/q220 forecast-evaluation family):
    * a hash-split train half fits per-segment means, the held-out
    * half scores them at τ ∈ {0.1, 0.5, 0.9}. Per-row losses round at
    * 6 before exact decimal means; the asymmetry constants are
    * COMPUTED (τ − 1.0) on both engines — the parsed literal "-0.9"
    * is a DIFFERENT double than 0.1 − 1.0, the documented
    * cross-engine literal trap.
    */
  private def qPinball(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority").as("seg"),
        col("o_totalprice").cast(DoubleType).as("y"))
    val isTrain = graft.aug.Sampling.keyBucket(col("o_orderkey"), 17L) <
      lit(500000L)
    val base = o.withColumn("train", isTrain)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q283", base)
    val means = base.where(col("train"))
      .groupBy("seg").agg(Stats.dmean(col("y")).as("yhat"))
    val test = base.where(!col("train"))
      .join(broadcast(means), "seg")
      .withColumn("e", col("y") - col("yhat"))
    import s.implicits._
    val taus = Seq(0.1, 0.5, 0.9).toDF("tau")
    test.crossJoin(broadcast(taus))
      .groupBy("tau")
      .agg(count(lit(1)).as("n_test"),
        round(Stats.dsum(round(greatest(col("tau") * col("e"),
          (col("tau") - lit(1.0)) * col("e")), 6)) / count(lit(1)), 6)
          .as("pinball"))
      .orderBy("tau")
  }

  /** A41 — HORVITZ–THOMPSON estimation from the unequal-probability
    * stratified sample (Horvitz & Thompson 1952 — the estimator that
    * makes q72's designs USABLE: every weighted-sample consumer
    * implicitly runs it): per-class inclusion probabilities with
    * exact INTEGER inverse weights (1/0.2, 1/0.05, 1/0.5 → 5, 20, 2 —
    * so Σw·y is pure 2-dp decimal arithmetic, zero float classes),
    * estimate vs the KNOWN per-class population total, plus the
    * stratified SE √(N²(1−f)s²/n). The output is the
    * estimate-vs-truth measurement itself — the q259 philosophy:
    * don't assume the estimator works, show it.
    */
  private def qHtTotal(s: SparkSession, dir: String): DataFrame = {
    val fr = Map("A" -> 0.2, "N" -> 0.05, "R" -> 0.5)
    val base = li(s, dir).select(col("l_orderkey"), col("l_linenumber"),
      col("l_returnflag").as("cls"),
      col("l_extendedprice").cast(DoubleType).as("y"))
    val pop = base.groupBy("cls")
      .agg(count(lit(1)).as("n_pop"),
        round(Stats.dsum(col("y")), 4).as("t_true"))
    val samp = graft.aug.Sampling.hashStratifiedSample(
        base.withColumn("k", col("l_orderkey") * 10 + col("l_linenumber")),
        "cls", "k", fr, seed = 7L)
      .withColumn("w", when(col("cls") === "A", 5L)
        .when(col("cls") === "N", 20L).otherwise(2L))
      .groupBy("cls")
      .agg(count(lit(1)).as("n_samp"),
        max("w").as("inv_pi"),
        round(Stats.dsum(col("w") * col("y")), 4).as("t_hat"),
        Stats.dvarSamp(col("y")).as("s2"))
    pop.join(samp, "cls")
      .select(col("cls"), col("n_pop"), col("n_samp"), col("inv_pi"),
        col("t_hat"), col("t_true"),
        round(col("t_hat") / col("t_true"), 6).as("ratio"),
        round(sqrt(col("n_pop").cast(DoubleType) *
          col("n_pop").cast(DoubleType) *
          (lit(1.0) - col("n_samp").cast(DoubleType) /
            col("n_pop").cast(DoubleType)) *
          col("s2") / col("n_samp").cast(DoubleType)), 4).as("se_t"))
      .orderBy("cls")
  }

  /** X20 — UPLIFT deciles + Qini accumulation (Radcliffe 2007 — the
    * heterogeneous-treatment-effect view the ATE family q273/q257
    * averages away): customers hash-assigned to arms, scored by
    * account balance, cut into exact OrderStats deciles; per decile
    * the treated-vs-control conversion gap, plus the Qini-style
    * cumulative incremental-conversion curve walked from the top
    * decile down. Ships the q259 detection-proof twin: a `healthy`
    * scenario (no effect — uplift reads ≈0 noise) beside an
    * `injected` one whose planted lift GROWS with the score decile
    * (hash-drawn extra conversions at decile·2pp among treated), so
    * the decile table visibly recovers the planted heterogeneity.
    * Conversion is data-driven (any order > 480k); Qini terms round
    * at 6 then accumulate as DECIMAL window sums over the 10-row
    * pre-aggregated decile frame (the rocPoints exemption class).
    */
  private def qUplift(s: SparkSession, dir: String): DataFrame = {
    import graft.aug.Sampling.keyBucket
    val conv = Tables.load(s, dir, "orders")
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(max(when(col("o_totalprice") > 480000.0, 1).otherwise(0))
        .as("base_conv"))
    val cust = Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"))
    val edges = graft.core.OrderStats.quantilesOf(
      cust, "c_acctbal", (1 until 10).map(_.toDouble / 10)).distinct.sorted
    val bin = edges.map(e => when(col("c_acctbal") > lit(e), 1).otherwise(0))
      .reduce(_ + _)
    val base = cust.join(conv, Seq("c_custkey"), "left")
      .na.fill(0, Seq("base_conv"))
      .withColumn("decile", bin.cast("long"))
      .withColumn("treated", keyBucket(col("c_custkey"), 23L) < lit(500000L))
      .withColumn("lift_draw", keyBucket(col("c_custkey"), 97L))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q285", base)
    val injectedConv = greatest(col("base_conv"),
      when(col("treated") && col("lift_draw") < col("decile") * lit(20000L),
        1).otherwise(0))
    val scen = base.withColumn("scenario", lit("healthy"))
        .withColumn("conv", col("base_conv"))
      .unionByName(base.withColumn("scenario", lit("injected"))
        .withColumn("conv", injectedConv))
    val per = scen.groupBy("scenario", "decile")
      .agg(count(when(col("treated"), 1)).as("n_t"),
        count(when(!col("treated"), 1)).as("n_c"),
        sum(when(col("treated"), col("conv"))).as("conv_t"),
        sum(when(!col("treated"), col("conv"))).as("conv_c"))
    val term = round(col("conv_t").cast(DoubleType) -
      col("conv_c").cast(DoubleType) * col("n_t").cast(DoubleType) /
        col("n_c").cast(DoubleType), 6)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("scenario").orderBy(desc("decile"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    per.withColumn("qini_cum",
        round(sum(term.cast("decimal(38,10)")).over(w).cast(DoubleType), 6))
      .select(col("scenario"), col("decile"), col("n_t"), col("n_c"),
        round(col("conv_t").cast(DoubleType) / col("n_t").cast(DoubleType), 6)
          .as("rate_t"),
        round(col("conv_c").cast(DoubleType) / col("n_c").cast(DoubleType), 6)
          .as("rate_c"),
        round(col("conv_t").cast(DoubleType) / col("n_t").cast(DoubleType) -
          col("conv_c").cast(DoubleType) / col("n_c").cast(DoubleType), 6)
          .as("uplift"),
        col("qini_cum"))
      .orderBy("scenario", "decile")
  }

  /** X21 — retrieval-quality metrics (MRR / MAP@10 / P@10 / hit@10)
    * over the exact cosine top-10 of q224's kNN-join shape, with
    * label-match relevance: the RAG/IR evaluation layer that turns the
    * retrieval operators (q212 fusion, q224 ground truth, q30/q45/q215
    * sublinear paths) into MEASURED search quality. AP@10 normalizes
    * by min(R, 10) with R = the label's corpus frequency (broadcast
    * margin join); precision terms are exact small-integer ratios
    * computed inside the per-query ≤10-row rank frame (bounded window,
    * partitioned by query), rounded at 6 before their decimal means.
    */
  private def qRetrievalEval(s: SparkSession, dir: String): DataFrame = {
    val e = em(s, dir)
    val labels = e.select(col("vec_id").cast("long").as("id"),
      col("label").cast("long").as("lbl"))
    val top = graft.sim.Ann.knnJoin(
      e.where(col("vec_id") < 50), e.where(col("vec_id") >= 50),
      "vec_id", "embedding", k = 10)
    val rels = labels.groupBy("lbl").agg(count(lit(1)).as("r_all"))
      .join(labels.where(col("id") >= 50).groupBy("lbl")
        .agg(count(lit(1)).as("r_corpus")), "lbl")
    val t = top
      .join(broadcast(labels.withColumnRenamed("id", "a")
        .withColumnRenamed("lbl", "la")), "a")
      .join(broadcast(labels.withColumnRenamed("id", "b")
        .withColumnRenamed("lbl", "lb")), "b")
      .withColumn("rel", when(col("la") === col("lb"), 1).otherwise(0))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("a").orderBy("rank")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val scored = t.withColumn("cum_rel", sum("rel").over(w))
      .withColumn("ap_term", round(col("rel").cast(DoubleType) *
        col("cum_rel").cast(DoubleType) / col("rank").cast(DoubleType), 6))
    val perQ = scored.groupBy("a", "la")
      .agg(Stats.dsum(col("ap_term")).as("ap_num"),
        sum("rel").as("n_rel_found"),
        min(when(col("rel") === 1, col("rank"))).as("first_rel"))
      .join(broadcast(rels.withColumnRenamed("lbl", "la")), "la")
      .withColumn("ap", round(col("ap_num") /
        least(col("r_corpus"), lit(10L)).cast(DoubleType), 6))
      .withColumn("rr", round(coalesce(lit(1.0) /
        col("first_rel").cast(DoubleType), lit(0.0)), 6))
    perQ.agg(count(lit(1)).as("n_queries"),
        round(Stats.dsum(col("rr")) / count(lit(1)), 6).as("mrr"),
        round(Stats.dsum(col("ap")) / count(lit(1)), 6).as("map10"),
        round(sum("n_rel_found").cast(DoubleType) /
          (count(lit(1)) * lit(10L)).cast(DoubleType), 6).as("p10"),
        round(count(when(col("n_rel_found") > 0, 1)).cast(DoubleType) /
          count(lit(1)).cast(DoubleType), 6).as("hit10"))
  }

  /** X22 — multiclass nearest-centroid classification with the FULL
    * confusion-derived metric sheet (per-class precision/recall/F1 +
    * macro-F1 + accuracy): the k>2 generalization of the binary
    * A11/A12 family (q09), evaluated honestly on a hash-split holdout
    * (centroids fit on ~60% of vectors, scored on the rest). Per-test
    * distances reuse the q263 plan-literal centroid fold (no join in
    * the scoring pass); argmin label = min label attaining the exact
    * minimum distance (same arithmetic both engines, so the tie rule
    * is engine-stable). Class margins and the two 1-row overall
    * aggregates broadcast.
    */
  private def qCentroidClassifier(s: SparkSession, dir: String): DataFrame = {
    import graft.aug.Sampling.keyBucket
    val e = em(s, dir).select(col("vec_id").cast("long").as("id"),
        col("label").cast("long").as("label"), col("embedding"))
      .withColumn("train", keyBucket(col("id"), 31L) < lit(600000L))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q287", e)
    val cent = graft.sim.Centroids.labelCentroids(
        e.where(col("train")), "label", "embedding")
      .select(col("group").cast("long").as("label"), col("dim"), col("mean"))
      .collect()
    require(cent.length <= 4096,
      s"centroid classifier collect guard: ${cent.length} (k*dims) > 4096")
    val byLabel: Seq[(Long, Array[Double])] =
      cent.groupBy(_.getLong(0)).toSeq.sortBy(_._1).map { case (l, rows) =>
        l -> rows.sortBy(_.getLong(1)).map(_.getDouble(2)).toArray
      }
    val dims = byLabel.head._2.length
    def d2To(c: Array[Double]): Column =
      aggregate(sequence(lit(1), lit(dims)), lit(0.0), (acc, i) => {
        val d = element_at(col("embedding"), i.cast("int")).cast(DoubleType) -
          element_at(typedlit(c.toSeq), i.cast("int"))
        acc + d * d
      })
    val withD = byLabel.foldLeft(e.where(!col("train"))) {
      case (df, (l, c)) => df.withColumn(s"d2_$l", d2To(c))
    }
    val dmin = least(byLabel.map { case (l, _) => col(s"d2_$l") }: _*)
    val pred = least(byLabel.map { case (l, _) =>
      when(col(s"d2_$l") === dmin, lit(l)) }: _*)
    val scored = withD.select(col("id"), col("label"), pred.as("pred"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q287.scored", scored)
    val byTrue = scored.groupBy("label")
      .agg(count(lit(1)).as("n_true"),
        count(when(col("pred") === col("label"), 1)).as("tp"))
    val byPred = scored.groupBy(col("pred").as("label"))
      .agg(count(lit(1)).as("n_pred"))
    val cls = byTrue.join(byPred, Seq("label"), "left")
      .na.fill(0L, Seq("n_pred"))
      .withColumn("precision", round(when(col("n_pred") > 0,
        col("tp").cast(DoubleType) / col("n_pred").cast(DoubleType))
        .otherwise(0.0), 6))
      .withColumn("recall", round(col("tp").cast(DoubleType) /
        col("n_true").cast(DoubleType), 6))
      .withColumn("f1", round(when(col("precision") + col("recall") > 0,
        lit(2.0) * col("precision") * col("recall") /
          (col("precision") + col("recall"))).otherwise(0.0), 6))
    val overall = cls.agg(
      round(Stats.dsum(col("f1")) / count(lit(1)), 6).as("macro_f1"),
      round(sum("tp").cast(DoubleType) / sum("n_true").cast(DoubleType), 6)
        .as("accuracy"))
    cls.crossJoin(broadcast(overall))
      .select(col("label"), col("n_true"), col("n_pred"), col("tp"),
        col("precision"), col("recall"), col("f1"),
        col("macro_f1"), col("accuracy"))
      .orderBy("label")
  }

  /** X23 — interpolated Kneser–Ney bigram LM (Kneser & Ney 1995; the
    * smoothing KenLM ships as its default — the CCNet filter's actual
    * LM family, where q96's add-one is the classroom baseline): fit on
    * a 90% hash split of documents, scored on the 10% holdout, so the
    * discount/backoff machinery is exercised by genuinely UNSEEN
    * bigrams. Singleton train tokens (and all OOV test tokens) map to
    * `<unk>`; P(w2|w1) = max(c12−D,0)/c1 + (D·N1+(w1·)/c1)·Pcont(w2)
    * with D = 0.75 and the CONTINUATION unigram Pcont(w2) =
    * N1+(·w2)/T — the Kneser–Ney insight that backoff mass should
    * follow how many contexts a word completes, not how often it
    * occurs. Unseen-context (c1 or N1+fw null) backs off to Pcont
    * alone; a 0.5/T floor guards the (never-observed-in-practice)
    * unseen-continuation case deterministically on both engines.
    * Scale shape: count tables stay distributed (vocab² keys), scoring
    * is hash equi-joins on token keys, bigrams form via a positional
    * self-join (linear shuffle), and per-doc reduction sums ln terms
    * in DECIMAL(38,18) (the q96/PSI order-free convention).
    */
  private def qKneserNey(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    import graft.aug.Sampling.keyBucket
    val t = par(doc(s, dir)).select(col("doc_id"),
      TextOps.tokens(col("text")).as("toks"),
      (keyBucket(col("doc_id"), 71L) < lit(900000L)).as("train"))
    val tok = t.select(col("doc_id"), col("train"),
        posexplode(col("toks")).as(Seq("i", "w")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = tok.where(col("train")).groupBy("w")
      .agg(count(lit(1)).as("c_raw")).where(col("c_raw") >= 2)
      .select(col("w"), lit(1).as("inv"))
    val mapped = tok.join(vocab, Seq("w"), "left")
      .select(col("doc_id"), col("train"), col("i"),
        when(col("inv").isNotNull, col("w")).otherwise(lit("<unk>")).as("mw"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bg = mapped
      .select(col("doc_id"), col("train"), col("i"), col("mw").as("w1"))
      .join(mapped.select(col("doc_id"), (col("i") - 1).as("i"),
        col("mw").as("w2")), Seq("doc_id", "i"))
      .select(col("doc_id"), col("train"), col("w1"), col("w2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q288", tok, mapped, bg)
    val c12 = bg.where(col("train")).groupBy("w1", "w2")
      .agg(count(lit(1)).as("c12"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q288.c12", c12)
    val c1 = mapped.where(col("train")).groupBy(col("mw").as("w1"))
      .agg(count(lit(1)).as("c1"))
    val fw = c12.groupBy("w1").agg(count(lit(1)).as("n1fw"))
    val bw = c12.groupBy("w2").agg(count(lit(1)).as("n1bw"))
    val tt = c12.agg(count(lit(1)).as("tbig"))
    val d = lit(0.75)
    val tD = col("tbig").cast(DoubleType)
    val pcont = coalesce(col("n1bw").cast(DoubleType) / tD, lit(0.5) / tD)
    val p = when(col("c1").isNotNull && col("n1fw").isNotNull,
      greatest(coalesce(col("c12").cast(DoubleType), lit(0.0)) - d, lit(0.0)) /
        col("c1").cast(DoubleType) +
        ((d * col("n1fw").cast(DoubleType)) / col("c1").cast(DoubleType)) *
          pcont).otherwise(pcont)
    bg.where(!col("train"))
      .join(c12, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .join(fw, Seq("w1"), "left")
      .join(bw, Seq("w2"), "left")
      .crossJoin(broadcast(tt))
      .select(col("doc_id"), log(p).cast(DecimalType(38, 18)).as("lp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum("lp").cast(DoubleType) / count(lit(1)), 6).as("avg_logp"))
      .withColumn("ppl", round(exp(-col("avg_logp")), 6))
      .orderBy("doc_id")
  }

  /** X24 — Good–Turing frequency-of-frequencies estimation (Good 1953;
    * the unseen-mass machinery under Katz backoff and every corpus
    * coverage claim), computed over token TRIGRAM types — the corpus's
    * unigram vocabulary is a closed ~31-word set with no rare types
    * (min count 26 even at sf0.001), so unigram GT would be vacuous;
    * trigrams have a real Zipf tail (~9.4k singletons). Reports the
    * train-split frequency-of-frequencies table N_r, the Turing
    * estimate r* = (r+1)·N_{r+1}/N_r for r ≤ 5, and the headline
    * prediction — unseen-type mass p0 = N_1/N — put to an EMPIRICAL
    * test against the holdout's measured OOV trigram rate (the
    * validation most GT write-ups skip). One distributed trigram
    * count; the FoF rollup and r* self-join run on the tiny
    * count-of-counts frame; the OOV probe is one hash anti-join shape
    * (left join + null filter) on trigram keys.
    */
  private def qGoodTuring(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    import graft.aug.Sampling.keyBucket
    val tok = par(doc(s, dir)).select(col("doc_id"),
        TextOps.tokens(col("text")).as("toks"),
        (keyBucket(col("doc_id"), 73L) < lit(900000L)).as("train"))
      .where(size(col("toks")) >= 3)
      .select(col("train"), explode(expr(
        "transform(sequence(0, size(toks) - 3), " +
          "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))")).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val uni = tok.where(col("train")).groupBy("w")
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q289", tok, uni)
    val fof = uni.groupBy("c").agg(count(lit(1)).as("n_r"))
    val totals = uni.agg(sum("c").as("n_train_tokens"))
    val n1 = fof.agg(coalesce(sum(when(col("c") === 1, col("n_r"))), lit(0L))
      .as("n1"))
    val oov = tok.where(!col("train"))
      .join(uni.select(col("w"), lit(1).as("inv")), Seq("w"), "left")
      .agg(count(lit(1)).as("n_test_tokens"),
        count(when(col("inv").isNull, 1)).as("n_oov"))
    val rows = fof.select(col("c").as("r"), col("n_r"))
      .join(fof.select((col("c") - 1).as("r"), col("n_r").as("n_r1")),
        Seq("r"), "left")
      .where(col("r") >= 1 && col("r") <= 5)
      .withColumn("r_star", round((col("r").cast(DoubleType) + lit(1.0)) *
        coalesce(col("n_r1").cast(DoubleType), lit(0.0)) /
        col("n_r").cast(DoubleType), 6))
    rows.crossJoin(broadcast(totals)).crossJoin(broadcast(n1))
      .crossJoin(broadcast(oov))
      .select(col("r"), col("n_r"), col("r_star"), col("n_train_tokens"),
        round(col("n1").cast(DoubleType) /
          col("n_train_tokens").cast(DoubleType), 6).as("p0_pred"),
        col("n_test_tokens"), col("n_oov"),
        round(col("n_oov").cast(DoubleType) /
          col("n_test_tokens").cast(DoubleType), 6).as("oov_rate"))
      .orderBy("r")
  }

  /** X25 — link prediction on the part co-purchase graph (Liben-Nowell
    * & Kleinberg 2003): hold out a 20% hash split of edges, score
    * distance-2 non-edge candidates on the training graph with the
    * three classical indices — common neighbors, Jaccard, Adamic–Adar
    * (Σ 1/ln deg(m), the inverse-log damping of promiscuous middles) —
    * and report each index's exact tie-aware AUC at recovering the
    * held-out edges against true non-edges. The graph is q156's
    * co-occurrence construction at part grain (co-ordered ≥ 2 times);
    * candidate generation is the adjacency self-join (quadratic work
    * confined to per-node neighborhoods, the triangle-count shape);
    * AUC runs as integer pair-counting over the per-method
    * distinct-score frame (no per-pair window). Test edges outside
    * distance 2 are unreachable by ANY common-neighbor index —
    * n_test_total vs n_pos makes that coverage limit explicit.
    * Node grain: parts are folded onto K = 6·⌈√(#orders)⌉ supernodes
    * (pk % K) so co-occurrence density stays SF-INVARIANT — at raw
    * part grain instances grow ∝ SF but candidate pairs ∝ SF², so the
    * npair ≥ 2 graph empties out by sf0.1 (zero reachable positives →
    * AUC div/0; the q271 blocking-degeneration class). On a real
    * corpus you'd keep the natural item grain; the √n fold is the
    * fixture-density recipe, documented here as such.
    */
  private def qLinkPrediction(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.aug.Sampling.keyBucket
    val raw = li(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").cast("long").as("pk"))
    val kk = raw.agg(
      (ceil(sqrt(countDistinct(col("ok")))).cast("long") * lit(6L)).as("k"))
    val ob = raw.crossJoin(broadcast(kk))
      .select(col("ok"), (col("pk") % col("k")).as("pk"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val co = ob.toDF("ok", "p1")
      .join(ob.toDF("ok2", "p2"), col("ok") === col("ok2") && col("p1") < col("p2"))
      .groupBy("p1", "p2").agg(count(lit(1)).as("npair"))
      .where(col("npair") >= 2)
      // pre-mod the combined pair key: p1·1000003+p2 reaches ~2e10 at
      // sf0.1 and keyBucket's 2654435761 multiplier would overflow Long
      .withColumn("test",
        keyBucket((col("p1") * lit(1000003L) + col("p2")) % lit(1000000007L),
          83L) < lit(200000L))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val trainE = co.where(!col("test")).select("p1", "p2")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val adj = trainE.union(trainE.select(col("p2"), col("p1"))).toDF("a", "b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q290", ob, co, trainE, adj)
    val deg = adj.groupBy("a").agg(count(lit(1)).as("dg"))
    val mids = adj.toDF("x", "m")
      .join(adj.toDF("mm", "y"), col("m") === col("mm"))
      .where(col("x") < col("y")).select("x", "m", "y")
      .join(deg.select(col("a").as("m"), col("dg").as("dgm")), Seq("m"))
    val pairScores = mids.groupBy("x", "y").agg(
      count(lit(1)).as("cn"),
      round(Stats.dsum(lit(1.0) / log(col("dgm").cast(DoubleType))), 6).as("aa"))
    val scored = pairScores
      .join(trainE.select(col("p1").as("x"), col("p2").as("y"),
        lit(1).as("istr")), Seq("x", "y"), "left")
      .where(col("istr").isNull).drop("istr")
      .join(co.where(col("test")).select(col("p1").as("x"), col("p2").as("y"),
        lit(1).as("pos")), Seq("x", "y"), "left")
      .na.fill(0, Seq("pos"))
      .join(deg.select(col("a").as("x"), col("dg").as("dgx")), Seq("x"))
      .join(deg.select(col("a").as("y"), col("dg").as("dgy")), Seq("y"))
      .withColumn("jac", round(col("cn").cast(DoubleType) /
        (col("dgx") + col("dgy") - col("cn")).cast(DoubleType), 6))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q290.scored", scored)
    val long = scored.select(lit("cn").as("method"),
        col("cn").cast(DoubleType).as("score"), col("pos"))
      .unionByName(scored.select(lit("jaccard").as("method"),
        col("jac").as("score"), col("pos")))
      .unionByName(scored.select(lit("adamic_adar").as("method"),
        col("aa").as("score"), col("pos")))
    // tie-aware Mann–Whitney AUC via integer pair counting over the
    // per-method DISTINCT-SCORE frame (the rocPoints exemption class)
    val byScore = long.groupBy("method", "score").agg(
      sum(col("pos")).cast("long").as("np"),
      sum(lit(1) - col("pos")).cast("long").as("nn"))
    val w = Window.partitionBy("method").orderBy("score")
      .rowsBetween(Window.unboundedPreceding, -1)
    val won = byScore
      .withColumn("cum_nn", coalesce(sum("nn").over(w), lit(0L)))
      .withColumn("won2",
        lit(2L) * col("np") * col("cum_nn") + col("np") * col("nn"))
    val agg = won.groupBy("method").agg(sum("np").as("n_pos"),
      sum("nn").as("n_neg"), sum("won2").as("won2"))
    val testTotal = co.where(col("test")).agg(count(lit(1)).as("n_test_total"))
    agg.crossJoin(broadcast(testTotal))
      .select(col("method"), col("n_pos"), col("n_neg"), col("n_test_total"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("won2").cast(DoubleType) /
            (lit(2.0) * col("n_pos").cast(DoubleType) *
              col("n_neg").cast(DoubleType)), 6)).as("auc"))
      .orderBy("method")
  }

  /** X26 — Hill tail-index estimation (Hill 1975; the heavy-tail
    * exponent behind every "is this power-law?" claim about document
    * lengths, degree distributions, and revenue concentration):
    * α̂(k) = k / Σ_{i≤k}(ln x_(i) − ln x_(k+1)) over the top-k order
    * statistics, swept at k ∈ {50, 100, 200}. Detection-proof twin:
    * the `healthy` arm runs on raw o_totalprice (a sum of bounded
    * uniforms — NO power tail, so α̂ drifts upward with k and the
    * sweep visibly disagrees with itself), while `pareto_injected`
    * transforms the same keys through an exact inverse-CDF Pareto
    * (α = 2.5, x_m = 100) built from the deterministic hash uniform —
    * the estimator recovers ≈ 2.5 STABLY across the k sweep. The
    * distributed stage is two TakeOrdered top-201 cuts; everything
    * after runs on the bounded pooled frame.
    */
  private def qHillTail(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.aug.Sampling.keyBucket
    val o = Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val healthy = o.select(lit("healthy").as("scenario"),
      col("o_totalprice").cast(DoubleType).as("v"))
    val u = (keyBucket(col("o_orderkey"), 131L).cast(DoubleType) + lit(0.5)) /
      lit(1000000.0)
    val injected = o.select(lit("pareto_injected").as("scenario"),
      (lit(100.0) * exp(log(lit(1.0) / u) / lit(2.5))).as("v"))
    def top(df: DataFrame) = df.orderBy(desc("v")).limit(201)
    val pool = top(healthy).unionByName(top(injected))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q291", pool)
    val ranked = pool
      .withColumn("rk", row_number().over(
        Window.partitionBy("scenario").orderBy(desc("v"))))
      .withColumn("lnv", log(col("v")))
    Seq(50, 100, 200).map { k =>
      val thr = ranked.where(col("rk") === k + 1)
        .select(col("scenario"), col("lnv").as("ln_thr"), col("v").as("x_k1"))
      ranked.where(col("rk") <= k)
        .groupBy("scenario").agg(Stats.dsum(col("lnv")).as("sum_ln"))
        .join(thr, Seq("scenario"))
        .select(col("scenario"), lit(k).as("k"),
          round(col("x_k1"), 6).as("x_threshold"),
          round(lit(k.toDouble) /
            (col("sum_ln") - lit(k.toDouble) * col("ln_thr")), 6)
            .as("alpha_hat"))
    }.reduce(_ unionByName _).orderBy("scenario", "k")
  }

  /** X27 — McNemar's paired test (McNemar 1947; the CORRECT way to
    * compare two classifiers evaluated on the SAME examples — marginal
    * accuracies hide that errors are paired): language-ID task
    * (is-English vs the `lang` column) comparing the lexicon-argmax
    * detector (q21's langId) against an intentionally crude
    * contains-"the" heuristic. Continuity-corrected
    * χ² = (max(|b−c|−1,0))²/(b+c) over the discordant counts b
    * (A right, B wrong) and c (A wrong, B right) — the only cells the
    * hypothesis touches. One conditional aggregate over documents;
    * complements q174 (kappa measures AGREEMENT between raters,
    * McNemar tests ACCURACY difference against truth).
    */
  private def qMcnemar(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    val d = doc(s, dir).select(
      (col("lang") === "en").as("truth"),
      (TextOps.langId(col("text")) === "en").as("pa"),
      array_contains(TextOps.tokens(col("text")), "the").as("pb"))
    val m = d.agg(count(lit(1)).as("n"),
      count(when(col("pa") === col("truth"), 1)).as("ok_a"),
      count(when(col("pb") === col("truth"), 1)).as("ok_b"),
      count(when(col("pa") === col("truth") && col("pb") =!= col("truth"), 1))
        .as("b"),
      count(when(col("pa") =!= col("truth") && col("pb") === col("truth"), 1))
        .as("c"))
    val cc = greatest(abs(col("b") - col("c")).cast(DoubleType) - lit(1.0),
      lit(0.0))
    m.select(col("n"),
      round(col("ok_a").cast(DoubleType) / col("n").cast(DoubleType), 6)
        .as("acc_a"),
      round(col("ok_b").cast(DoubleType) / col("n").cast(DoubleType), 6)
        .as("acc_b"),
      col("b"), col("c"),
      round(when(col("b") + col("c") > 0,
        (cc * cc) / (col("b") + col("c")).cast(DoubleType))
        .otherwise(lit(0.0)), 6).as("mcnemar_chi2"))
  }

  /** X28 — HITS hubs/authorities ([[graft.core.Hits]], Kleinberg 1999)
    * on the supplier→part supply bipartite graph (distinct
    * (l_suppkey, l_partkey) edges): hubs = suppliers whose catalog
    * concentrates on widely-supplied parts, authorities = parts
    * carried by the strongest hubs — the mutual-reinforcement ranking
    * PageRank (q148) can't express (PageRank needs a stochastic walk;
    * HITS is the adjacency's principal singular pair). Four power
    * iterations (each is two full passes over the edge table — the
    * top-10 ranking is stable well before that on this graph, and
    * every extra iteration costs two 590k-row aggregates at sf0.1),
    * L2-normalized per half-step, decimal-summed contributions;
    * output is the top-10 per side ordered by rounded score with id
    * tie-break.
    */
  private def qHits(s: SparkSession, dir: String): DataFrame = {
    val edges = li(s, dir).select(col("l_suppkey").cast("long").as("hub"),
      col("l_partkey").cast("long").as("auth"))
    val (h, a) = graft.core.Hits.run(edges, iters = 4, cacheKey = "q293")
    val topH = h.select(lit("hub").as("side"), col("hub").as("node"),
        round(col("h"), 6).as("score"))
      .orderBy(desc("score"), col("node")).limit(10)
    val topA = a.select(lit("authority").as("side"), col("auth").as("node"),
        round(col("a"), 6).as("score"))
      .orderBy(desc("score"), col("node")).limit(10)
    topA.unionByName(topH).orderBy(col("side"), desc("score"), col("node"))
  }

  /** X29 — Bloom-filter false-positive-rate audit: build a
    * double-hashed Bloom filter (k = 5, m = 8n bits; Kirsch &
    * Mitzenmacher 2006's h1 + i·h2 scheme in pure integer arithmetic)
    * over a 90% hash split of order keys, probe it with the DISJOINT
    * 10% holdout — every hit is a false positive by construction — and
    * report the measured FPR beside the (1 − e^(−kn/m))^k theory the
    * q78 delta-dedup bloom prepass relies on. Fully relational: the
    * bit array is a DISTINCT bit-position table, membership is "all k
    * positions present" counted per probe key via one hash equi-join —
    * no bitmap state, so the construction shuffles O(kn) fixed-width
    * longs and scales like any aggregation.
    */
  private def qBloomFpr(s: SparkSession, dir: String): DataFrame = {
    import graft.aug.Sampling.keyBucket
    val P = 1000000007L
    val o = Tables.load(s, dir, "orders")
      .select(col("o_orderkey").cast("long").as("key"),
        (keyBucket(col("o_orderkey"), 11L) < lit(900000L)).as("train"))
    val mrow = o.where(col("train")).agg(count(lit(1)).as("n_train"),
      (count(lit(1)) * lit(8L)).as("m"))
    val h1 = ((col("key") * lit(2654435761L) + lit(40503L)) % lit(P)
      + lit(P)) % lit(P)
    val h2 = (((col("key") * lit(40503L) + lit(2654435761L)) % lit(P)
      + lit(P)) % lit(P)) + lit(1L)
    val pos = o.crossJoin(broadcast(mrow))
      .select(col("key"), col("train"), col("m"),
        explode(expr("sequence(0, 4)")).as("i"), h1.as("h1"), h2.as("h2"))
      .select(col("key"), col("train"), col("m"),
        ((col("h1") + col("i") * col("h2")) % col("m")).as("pos"))
    val bits = pos.where(col("train")).select(col("pos")).distinct()
      .withColumn("hit", lit(1))
    val probe = pos.where(!col("train")).join(bits, Seq("pos"), "left")
      .groupBy("key").agg((count(col("hit")) === 5).as("fp"))
    probe.agg(count(lit(1)).as("n_test"),
        count(when(col("fp"), 1)).as("fp_count"))
      .crossJoin(broadcast(mrow))
      .select(col("n_train"), col("n_test"), col("m").as("m_bits"),
        lit(5).as("k_hashes"), col("fp_count"),
        round(col("fp_count").cast(DoubleType) /
          col("n_test").cast(DoubleType), 6).as("fpr_measured"),
        round(pow(lit(1.0) - exp(lit(-5.0) *
          col("n_train").cast(DoubleType) / col("m").cast(DoubleType)),
          5.0), 6).as("fpr_theory"))
  }

  /** X30 — Heaps' law fit (Heaps 1978; vocabulary growth V(n) ≈ K·n^β,
    * the planning curve behind "how big must the tokenizer vocab be at
    * 100 TB"): cumulative trigram-type counts at ten document-prefix
    * checkpoints (doc_ids are dense 0..N−1, so prefix d = doc_id <
    * ⌊N·d/10⌋ exactly), fit by log-log OLS over the 10-point frame.
    * The distributed stages are one first-occurrence aggregate
    * (min doc_id per type) and one per-doc token count; each joins a
    * broadcast 10-row checkpoint frame on a range predicate — a
    * constant ×10 linear blowup, never quadratic. The OLS runs on 10
    * rows. Trigram types, not unigrams, for the same reason as q289:
    * the unigram vocab is closed at ~31 words.
    */
  private def qHeaps(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    val t = par(doc(s, dir)).select(col("doc_id"),
        TextOps.tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 3), " +
          "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))")).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q295", t)
    val nd = doc(s, dir).agg(count(lit(1)).as("nd"))
    val cp = s.range(1, 11).toDF("d").crossJoin(broadcast(nd))
      .select(col("d"), floor(col("nd") * col("d") / lit(10)).as("cut"))
    val first = t.groupBy("w").agg(min("doc_id").as("fd"))
    val vd = first.join(broadcast(cp), col("fd") < col("cut"))
      .groupBy("d", "cut").agg(count(lit(1)).as("v_types"))
    val tc = t.groupBy("doc_id").agg(count(lit(1)).as("c"))
    val ntok = tc.join(broadcast(cp), col("doc_id") < col("cut"))
      .groupBy(col("d").as("d2")).agg(sum("c").as("n_tokens"))
    val pts = vd.join(ntok, col("d") === col("d2")).drop("d2")
      .withColumn("x", log(col("n_tokens").cast(DoubleType)))
      .withColumn("y", log(col("v_types").cast(DoubleType)))
    val fit = pts.agg(Stats.dsum(col("x")).as("sx"),
        Stats.dsum(col("y")).as("sy"),
        Stats.dsum(col("x") * col("y")).as("sxy"),
        Stats.dsum(col("x") * col("x")).as("sxx"),
        count(lit(1)).cast(DoubleType).as("n"))
      .select(((col("sxy") - col("sx") * col("sy") / col("n")) /
        (col("sxx") - col("sx") * col("sx") / col("n"))).as("beta_raw"),
        col("sx"), col("sy"), col("n"))
      .select(round(col("beta_raw"), 6).as("heaps_beta"),
        round(exp(col("sy") / col("n") -
          col("beta_raw") * col("sx") / col("n")), 6).as("heaps_k"))
    pts.crossJoin(broadcast(fit))
      .select(col("d").cast("int").as("decile"), col("cut"),
        col("n_tokens"), col("v_types"), col("heaps_beta"), col("heaps_k"))
      .orderBy("decile")
  }

  /** X31 — TextRank keyword extraction (Mihalcea & Tarau 2004):
    * weighted PageRank over the word co-occurrence graph (±2-token
    * window within a document, symmetrized, weight = co-occurrence
    * count), reusing [[graft.core.PageRank]] verbatim — the graph
    * CONSTRUCTION is the corpus-sized stage (positional equi-self-joins
    * at offsets 1 and 2, one grouped count), while the power iteration
    * runs on the ≤|vocab|² metadata frame. The corpus-level analog of
    * per-document TextRank: which words sit at the densest
    * co-occurrence crossroads.
    */
  private def qTextRank(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    val tok = par(doc(s, dir)).select(col("doc_id"),
        posexplode(TextOps.tokens(col("text"))).as(Seq("i", "w")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q296", tok)
    val pairs = Seq(1, 2).map { o =>
      tok.select(col("doc_id"), col("i"), col("w").as("wa"))
        .join(tok.select(col("doc_id"), (col("i") - o).as("i"),
          col("w").as("wb")), Seq("doc_id", "i"))
        .select(col("wa"), col("wb"))
    }.reduce(_ unionByName _)
    // one distributed grouped count on the canonical orientation, then
    // symmetrize the vocab-sized frame (not the corpus-sized pairs)
    val cnt = pairs.where(col("wa") =!= col("wb"))
      .groupBy(least(col("wa"), col("wb")).as("a"),
        greatest(col("wa"), col("wb")).as("b"))
      .agg(count(lit(1)).as("w"))
    val edges = cnt.select(col("a").as("src"), col("b").as("dst"), col("w"))
      .unionByName(cnt.select(col("b").as("src"), col("a").as("dst"),
        col("w")))
    val r = graft.core.PageRank.run(edges, d = 0.85, iters = 10,
      cacheKey = "q296.pr")
    r.select(col("node").as("word"), round(col("r"), 6).as("textrank"))
      .orderBy(desc("textrank"), col("word"))
  }

  /** X32 — Durbin–Watson autocorrelation diagnostic (Durbin & Watson
    * 1950) on the residuals of the daily-revenue trend OLS: the
    * standard "is the regression error serially correlated" check that
    * q173's OLS sheet omits. Daily sums are exact decimal; the trend
    * fit uses the exact-moment aggregates; residuals are rounded to
    * 6 dp and squared in integer micro-units (DECIMAL(38,0) — the
    * engine-exact sums-of-squares recipe), so DW is bitwise
    * cross-engine. The lag window runs over the bounded ~30-row daily
    * frame (rocPoints exemption class); the only corpus-sized stage is
    * the daily aggregate. Reports DW ∈ [0,4] and ρ̂ ≈ 1 − DW/2.
    */
  private def qDurbinWatson(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = ev(s, dir)
      .select(expr("(ts div 1000) div 86400000000").as("day"), col("value"))
      .groupBy("day").agg(Stats.dsum(col("value")).as("y"))
    val m0 = daily.agg(min("day").as("d0"))
    val pts = daily.crossJoin(broadcast(m0))
      .select(col("day"), (col("day") - col("d0"))
        .cast(DoubleType).as("x"), col("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q297", pts)
    val fit = pts.agg(Stats.dsum(col("x")).as("sx"),
        Stats.dsum(col("y")).as("sy"),
        Stats.dsum(col("x") * col("y")).as("sxy"),
        Stats.dsum(col("x") * col("x")).as("sxx"),
        count(lit(1)).cast(DoubleType).as("nn"))
      .select(((col("sxy") - col("sx") * col("sy") / col("nn")) /
        (col("sxx") - col("sx") * col("sx") / col("nn"))).as("b"),
        col("sx"), col("sy"), col("nn"))
      .select(col("b"), ((col("sy") - col("b") * col("sx")) / col("nn"))
        .as("a"), col("nn"))
    val e6 = pts.crossJoin(broadcast(fit))
      .select(col("day"), col("nn"),
        round(round(col("y") - col("a") - col("b") * col("x"), 6) *
          lit(1e6)).cast(DecimalType(38, 0)).as("e6"))
    val w = Window.orderBy("day")
    val dd = e6.withColumn("p6", lag("e6", 1).over(w))
    dd.agg(max(col("nn")).as("n_days"),
        sum(when(col("p6").isNotNull,
          (col("e6") - col("p6")) * (col("e6") - col("p6")))).as("num"),
        sum(col("e6") * col("e6")).as("den"))
      .select(col("n_days").cast("long").as("n_days"),
        round(col("num").cast(DoubleType) / col("den").cast(DoubleType), 6)
          .as("dw"),
        round(lit(1.0) - col("num").cast(DoubleType) /
          col("den").cast(DoubleType) / lit(2.0), 6).as("rho_hat"))
  }

  /** X33 — cross-source token-distribution JS divergence matrix: the
    * LM-level answer to "which corpus sources are linguistically
    * close" (q187 asks it at the duplicate level, q183 at the language
    * level). Per-source unigram distributions with add-0.5 smoothing
    * over the shared vocab, JS(p,q) in nats for every source pair.
    * The only corpus-sized stage is one (source, word) grouped count;
    * the grid, the pair self-join, and the divergence sums all run on
    * the ≤ sources×vocab metadata frame. At 100 TB the same plan holds:
    * the count output is #sources·|vocab| rows regardless of corpus
    * size.
    */
  private def qSourceJs(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    val cnt = par(doc(s, dir)).select(col("source"),
        explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q298", cnt)
    val vocab = cnt.select("w").distinct()
    val tot = cnt.groupBy("source").agg(sum("c").as("n"))
    val vsize = vocab.agg(count(lit(1)).as("v"))
    val grid = tot.crossJoin(broadcast(vocab))
      .join(cnt, Seq("source", "w"), "left").na.fill(0, Seq("c"))
      .crossJoin(broadcast(vsize))
      .select(col("source"), col("w"),
        ((col("c").cast(DoubleType) + lit(0.5)) /
          (col("n").cast(DoubleType) + lit(0.5) *
            col("v").cast(DoubleType))).as("p"))
    val pairs = grid.toDF("s1", "w", "p1")
      .join(grid.toDF("s2", "w2", "p2"),
        col("w") === col("w2") && col("s1") < col("s2"))
    pairs.select(col("s1"), col("s2"),
        (col("p1") * log(col("p1") / ((col("p1") + col("p2")) / 2)) +
          col("p2") * log(col("p2") / ((col("p1") + col("p2")) / 2))).as("t"))
      .groupBy("s1", "s2")
      .agg(round(Stats.dsum(col("t")) * 0.5, 6).as("js_divergence"))
      .orderBy("s1", "s2")
  }

  /** X34 — Maximal Marginal Relevance diversified retrieval (Carbonell
    * & Goldstein 1998): for 20 query vectors, take the exact top-20
    * cosine candidates, then greedily pick 5 results maximizing
    * λ·rel − (1−λ)·max-sim-to-already-picked (λ = 0.7) — the standard
    * redundancy-pruning rerank behind "diverse top-k" product
    * surfaces. The distributed stage is the brute-force candidate
    * scoring (the q29 labeled-baseline shape, broadcast query side);
    * the candidate-pair similarity grid and all five greedy rounds run
    * on the bounded ≤20×20-per-query frame (rocPoints exemption
    * class). Dot products use the codegen'd sequential-loop kernel
    * ([[graft.sim.DotProductExpr]]) — same fold order as the oracle's
    * list_reduce, so similarities are bitwise cross-engine.
    */
  private def qMmr(s: SparkSession, dir: String): DataFrame = {
    import graft.sim.GraftFunctions
    import org.apache.spark.sql.expressions.Window
    GraftFunctions.register(s)
    // both weights as EXPLICIT literals: 1.0 − 0.7 in IEEE is
    // 0.30000000000000004, which would diverge from the oracle's 0.3
    val lam = 0.7
    val oneMinusLam = 0.3
    val v = em(s, dir).select(col("vec_id").as("id"),
        col("embedding").as("vec"),
        GraftFunctions.norm2(col("embedding")).as("n2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = v.where(col("id") < 20).toDF("qid", "qv", "qn2")
    val rel0 = v.toDF("cid", "cv", "cn2").join(broadcast(q),
        col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), col("cv"), col("cn2"),
        (GraftFunctions.dot(col("qv"), col("cv")) /
          (sqrt(col("qn2")) * sqrt(col("cn2")))).as("rel"))
    val wTop = Window.partitionBy("qid").orderBy(desc("rel"), col("cid"))
    val cand = rel0.withColumn("rk", row_number().over(wTop))
      .where(col("rk") <= 20).drop("rk")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q299", v, cand)
    // candidate-pair cosine grid, bounded 20×20 per query
    val pairs = cand.select(col("qid"), col("cid").as("pa"),
        col("cv").as("va"), col("cn2").as("na"))
      .join(cand.select(col("qid"), col("cid").as("pb"),
        col("cv").as("vb"), col("cn2").as("nb")), Seq("qid"))
      .where(col("pa") =!= col("pb"))
      .select(col("qid"), col("pa"), col("pb"),
        (GraftFunctions.dot(col("va"), col("vb")) /
          (sqrt(col("na")) * sqrt(col("nb")))).as("sim"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q299.pairs", pairs)
    val slim = cand.select(col("qid"), col("cid"), col("rel"))
    val wPick = Window.partitionBy("qid").orderBy(desc("score"), col("cid"))
    var picked = graft.core.Caches.checkpointOnce("q299.pairs",
      slim.withColumn("score", col("rel"))
        .withColumn("rk", row_number().over(wPick)).where(col("rk") === 1)
        .select(col("qid"), col("cid"), lit(1).as("pick"), col("score")))
    for (r <- 2 to 5) {
      val ms = pairs.join(picked.select(col("qid"),
          col("cid").as("pb")), Seq("qid", "pb"))
        .groupBy(col("qid"), col("pa").as("cid"))
        .agg(max(col("sim")).as("msim"))
      val scored = slim.join(picked.select(col("qid"), col("cid"),
          lit(1).as("sel")), Seq("qid", "cid"), "left")
        .where(col("sel").isNull).drop("sel")
        .join(ms, Seq("qid", "cid"))
        .withColumn("score", lit(lam) * col("rel") -
          lit(oneMinusLam) * col("msim"))
      val next = scored.withColumn("rk", row_number().over(wPick))
        .where(col("rk") === 1)
        .select(col("qid"), col("cid"), lit(r).as("pick"), col("score"))
      picked = graft.core.Caches.checkpointOnce("q299.pairs",
        picked.unionByName(next))
    }
    picked.select(col("qid"), col("pick"), col("cid"),
        round(col("score"), 6).as("score"))
      .orderBy("qid", "pick")
  }

  /** X35 — Ljung–Box portmanteau test (Ljung & Box 1978) on the q297
    * daily-trend residuals: Q = n(n+2)·Σ_{k≤10} ρ̂_k²/(n−k), the
    * "is there ANY autocorrelation up to lag 10" companion to q297's
    * lag-1 Durbin–Watson. Residuals quantize to exact integer
    * micro-units; every lag-k product and the denominator are exact
    * decimal sums over the bounded ~30-row daily frame (lag via
    * day+k self-join, no data-sized window), so ρ̂_k and Q are
    * bitwise cross-engine.
    */
  private def qLjungBox(s: SparkSession, dir: String): DataFrame = {
    val daily = ev(s, dir)
      .select(expr("(ts div 1000) div 86400000000").as("day"), col("value"))
      .groupBy("day").agg(Stats.dsum(col("value")).as("y"))
    val m0 = daily.agg(min("day").as("d0"))
    val pts = daily.crossJoin(broadcast(m0))
      .select(col("day"), (col("day") - col("d0"))
        .cast(DoubleType).as("x"), col("y"))
    val fit = pts.agg(Stats.dsum(col("x")).as("sx"),
        Stats.dsum(col("y")).as("sy"),
        Stats.dsum(col("x") * col("y")).as("sxy"),
        Stats.dsum(col("x") * col("x")).as("sxx"),
        count(lit(1)).cast(DoubleType).as("nn"))
      .select(((col("sxy") - col("sx") * col("sy") / col("nn")) /
        (col("sxx") - col("sx") * col("sx") / col("nn"))).as("b"),
        col("sx"), col("sy"), col("nn"))
      .select(col("b"), ((col("sy") - col("b") * col("sx")) / col("nn"))
        .as("a"), col("nn"))
    val e6 = pts.crossJoin(broadcast(fit))
      .select(col("day"), col("nn"),
        round(round(col("y") - col("a") - col("b") * col("x"), 6) *
          lit(1e6)).cast(DecimalType(38, 0)).as("e6"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q300", e6)
    val den = e6.agg(sum(col("e6") * col("e6")).as("den"),
      max("nn").as("n"))
    val ks = s.range(1, 11).toDF("k")
    // lag-k pairs explicitly: t and t+k rows joined on day+k
    val pr = e6.select(col("day"), col("e6")).crossJoin(broadcast(ks))
      .join(e6.select(col("day").as("dk"), col("e6").as("f6")),
        col("dk") === col("day") + col("k"))
      .groupBy("k").agg(sum(col("e6") * col("f6")).as("num"))
    val rho = pr.crossJoin(broadcast(den))
      .select(col("k"), col("n"),
        (col("num").cast(DoubleType) / col("den").cast(DoubleType))
          .as("rho_raw"))
    val qstat = rho.agg(max(col("n")).as("n2"),
        Stats.dsum(col("rho_raw") * col("rho_raw") /
          (col("n") - col("k").cast(DoubleType))).as("srho"))
      .select(round(col("n2") * (col("n2") + 2.0) * col("srho"), 6)
        .as("q_stat"), lit(10).as("df"))
    rho.crossJoin(broadcast(qstat))
      .select(col("k").cast("int").as("lag"),
        round(col("rho_raw"), 6).as("rho"), col("q_stat"), col("df"))
      .orderBy("lag")
  }

  /** X36 — 1-D two-component Gaussian-mixture EM (Dempster et al.
    * 1977) with a QUANTIZED E-step: responsibilities round to integer
    * micro-units before the M-step sums, so every iteration's
    * sufficient statistics are exact integer decimals (ΣR, ΣR·X,
    * ΣR·X², with X = exact centi-units of the 2-dp money value) and
    * the whole 6-iteration trajectory is bitwise cross-engine — the
    * same determinism trick as the q297 residual recipe, applied to an
    * iterative fit. Detection-proof twin: `healthy` runs on raw
    * events.value (unimodal — components collapse toward each other),
    * `bimodal_injected` adds 400.00 to a deterministic half of the
    * keys and EM recovers the two planted means and the 50/50 mixing
    * weight. Params stay in 1-row-per-scenario broadcast frames
    * (never collected); each iteration is one scan + one grouped
    * aggregate, localCheckpointed to keep lineage flat.
    */
  private def qGmmEm(s: SparkSession, dir: String): DataFrame = {
    import graft.aug.Sampling.keyBucket
    val base = ev(s, dir).select(col("event_id"), col("value"))
    val x = base.select(lit("healthy").as("scenario"),
        round(col("value") * 100).cast(DecimalType(38, 0)).as("xc"))
      .unionByName(base.select(lit("bimodal_injected").as("scenario"),
        (round(col("value") * 100) +
          when(keyBucket(col("event_id"), 17L) < lit(500000L), lit(40000L))
            .otherwise(lit(0L))).cast(DecimalType(38, 0)).as("xc")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q301", x)
    val xd = col("xc").cast(DoubleType) / lit(100.0)
    // init: quartile-spread means from exact min/max, pooled sd, pi=.5
    var par = x.groupBy("scenario").agg(
        min(col("xc")).cast(DoubleType).as("mn"),
        max(col("xc")).cast(DoubleType).as("mx"),
        Stats.dsum(xd).as("sx"), Stats.dsum(xd * xd).as("sxx"),
        count(lit(1)).cast(DoubleType).as("n"))
      .select(col("scenario"),
        (col("mn") / 100.0 + (col("mx") - col("mn")) / 100.0 / 4.0).as("mu1"),
        (col("mn") / 100.0 + (col("mx") - col("mn")) / 100.0 * 3.0 / 4.0)
          .as("mu2"),
        sqrt(greatest(col("sxx") / col("n") -
          (col("sx") / col("n")) * (col("sx") / col("n")), lit(1e-6)))
          .as("s1"),
        sqrt(greatest(col("sxx") / col("n") -
          (col("sx") / col("n")) * (col("sx") / col("n")), lit(1e-6)))
          .as("s2"),
        lit(0.5).as("p1"))
    par = graft.core.Caches.checkpointOnce("entry.q301", par)
    def phi(mu: Column, sd: Column) =
      exp(lit(-0.5) * ((xd - mu) / sd) * ((xd - mu) / sd)) /
        (sd * math.sqrt(2.0 * math.Pi))
    for (_ <- 1 to 6) {
      val g1 = col("p1") * phi(col("mu1"), col("s1"))
      val g2 = (lit(1.0) - col("p1")) * phi(col("mu2"), col("s2"))
      val resp = x.join(broadcast(par), Seq("scenario"))
        .select(col("scenario"), col("xc"),
          round(g1 / (g1 + g2) * lit(1e6)).cast(DecimalType(38, 0)).as("r1"))
      val mstep = resp.groupBy("scenario").agg(
        sum(col("r1")).as("sr1"),
        sum(col("r1") * col("xc")).as("srx1"),
        sum(col("r1") * col("xc") * col("xc")).as("srxx1"),
        sum(lit(1000000L).cast(DecimalType(38, 0)) - col("r1")).as("sr2"),
        sum((lit(1000000L).cast(DecimalType(38, 0)) - col("r1")) *
          col("xc")).as("srx2"),
        sum((lit(1000000L).cast(DecimalType(38, 0)) - col("r1")) *
          col("xc") * col("xc")).as("srxx2"),
        count(lit(1)).cast(DoubleType).as("n"))
      par = mstep.select(col("scenario"),
        (col("srx1").cast(DoubleType) / col("sr1").cast(DoubleType) /
          lit(100.0)).as("mu1"),
        (col("srx2").cast(DoubleType) / col("sr2").cast(DoubleType) /
          lit(100.0)).as("mu2"),
        sqrt(greatest(col("srxx1").cast(DoubleType) /
          col("sr1").cast(DoubleType) / lit(10000.0) -
          (col("srx1").cast(DoubleType) / col("sr1").cast(DoubleType) /
            lit(100.0)) * (col("srx1").cast(DoubleType) /
            col("sr1").cast(DoubleType) / lit(100.0)), lit(1e-6))).as("s1"),
        sqrt(greatest(col("srxx2").cast(DoubleType) /
          col("sr2").cast(DoubleType) / lit(10000.0) -
          (col("srx2").cast(DoubleType) / col("sr2").cast(DoubleType) /
            lit(100.0)) * (col("srx2").cast(DoubleType) /
            col("sr2").cast(DoubleType) / lit(100.0)), lit(1e-6))).as("s2"),
        (col("sr1").cast(DoubleType) / lit(1e6) / col("n")).as("p1"))
      par = graft.core.Caches.checkpointOnce("entry.q301", par)
    }
    par.select(col("scenario"), round(col("p1"), 6).as("pi1"),
        round(col("mu1"), 6).as("mu1"), round(col("s1"), 6).as("sigma1"),
        round(col("mu2"), 6).as("mu2"), round(col("s2"), 6).as("sigma2"),
        round(col("mu2") - col("mu1"), 6).as("mean_gap"))
      .orderBy("scenario")
  }

  /** X37 — Friedman rank test (Friedman 1937): the repeated-measures
    * companion to q161's Kruskal–Wallis — daily revenue by event type
    * forms a (day × type) block design; types are ranked WITHIN each
    * day (row_number over the bounded ~30×5 daily frame; exact decimal
    * sums make ties practically impossible and the type-name tiebreak
    * keeps both engines identical if one occurs), and
    * χ²_F = 12/(nk(k+1))·ΣR_j² − 3n(k+1) is exact integer arithmetic
    * until the final division. One corpus-sized grouped aggregate.
    */
  private def qFriedman(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = ev(s, dir)
      .select(expr("(ts div 1000) div 86400000000").as("day"),
        col("event_type"), col("value"))
      .groupBy("day", "event_type").agg(Stats.dsum(col("value")).as("y"))
    val w = Window.partitionBy("day").orderBy(desc("y"), col("event_type"))
    val ranked = daily.withColumn("rk", row_number().over(w))
    val rj = ranked.groupBy("event_type")
      .agg(sum("rk").as("r_sum"), count(lit(1)).as("n_days"))
    val tot = rj.agg(sum(col("r_sum") * col("r_sum")).as("ssr"),
        max("n_days").as("n"), count(lit(1)).as("k"))
      .select(round(lit(12.0) /
        (col("n").cast(DoubleType) * col("k").cast(DoubleType) *
          (col("k").cast(DoubleType) + 1.0)) * col("ssr").cast(DoubleType) -
        lit(3.0) * col("n").cast(DoubleType) *
          (col("k").cast(DoubleType) + 1.0), 6).as("friedman_chi2"),
        (col("k") - 1).cast("int").as("df"))
    rj.crossJoin(broadcast(tot))
      .select(col("event_type"), col("r_sum"),
        round(col("r_sum").cast(DoubleType) /
          col("n_days").cast(DoubleType), 6).as("mean_rank"),
        col("friedman_chi2"), col("df"))
      .orderBy("event_type")
  }

  /** X38 — single change-point by binary segmentation (Scott & Knott
    * 1974 / the CUSUM-fit alternative to q158's Pettitt): over the
    * daily-revenue series, pick the split t maximizing the
    * between-segment fit g(t) = (Σ_L x)²/n_L + (Σ_R x)²/n_R — exactly
    * equivalent to minimizing SSE_L + SSE_R. Prefix sums run over the
    * bounded ~30-row daily frame; all Σx terms are exact centi-unit
    * decimals so g's components are identical doubles cross-engine and
    * the argmax is deterministic. Detection-proof twin: `healthy` =
    * raw series (split explains ~nothing); `shift_injected` adds
    * 5000.00/day from day 20 on — the argmax recovers day 20 and the
    * variance-explained ratio jumps.
    */
  private def qBinseg(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily0 = ev(s, dir)
      .select(expr("(ts div 1000) div 86400000000").as("day"), col("value"))
      .groupBy("day")
      .agg(sum(round(col("value") * 100).cast(DecimalType(38, 0))).as("xc"))
    val m0 = daily0.agg(min("day").as("d0"))
    val daily = daily0.crossJoin(broadcast(m0))
      .select((col("day") - col("d0")).as("t"), col("xc"))
    val series = daily.select(lit("healthy").as("scenario"), col("t"),
        col("xc"))
      .unionByName(daily.select(lit("shift_injected").as("scenario"),
        col("t"), (col("xc") + when(col("t") >= 20, lit(500000L))
          .otherwise(lit(0L)).cast(DecimalType(38, 0))).as("xc")))
    val w = Window.partitionBy("scenario").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = series.withColumn("cx", sum("xc").over(w))
      .withColumn("ct", count(lit(1)).over(w))
    val tot = series.groupBy("scenario").agg(sum("xc").as("tx"),
      count(lit(1)).as("tn"),
      sum(col("xc") * col("xc")).as("txx"))
    val g = pre.join(tot, Seq("scenario"))
      .where(col("ct") >= 2 && col("tn") - col("ct") >= 2)
      .select(col("scenario"), col("t"),
        ((col("cx") * col("cx")).cast(DoubleType) /
          col("ct").cast(DoubleType) +
          ((col("tx") - col("cx")) * (col("tx") - col("cx")))
            .cast(DoubleType) /
            (col("tn") - col("ct")).cast(DoubleType)).as("gg"),
        (col("txx").cast(DoubleType) -
          (col("tx") * col("tx")).cast(DoubleType) /
            col("tn").cast(DoubleType)).as("sse_tot"))
    val wPick = Window.partitionBy("scenario").orderBy(desc("gg"), col("t"))
    // var_explained = (g(t) − (Σx)²/n) / SSE_tot — both terms from
    // exact decimal components, so the ratio is engine-identical
    g.join(tot.select(col("scenario"),
        ((col("tx") * col("tx")).cast(DoubleType) /
          col("tn").cast(DoubleType)).as("gm")), Seq("scenario"))
      .withColumn("rk", row_number().over(wPick)).where(col("rk") === 1)
      .select(col("scenario"), (col("t") + 1).as("split_day"),
        round((col("gg") - col("gm")) / col("sse_tot"), 6)
          .as("var_explained"))
      .orderBy("scenario")
  }

  /** X39 — Chow structural-break test (Chow 1960) on the daily-revenue
    * trend: fit OLS pooled and on the two halves split at day 15,
    * F = ((SSE_p − SSE_1 − SSE_2)/k) / ((SSE_1 + SSE_2)/(n − 2k)) with
    * k = 2 — the parametric companion to q303's binseg and q158's
    * Pettitt (those find WHERE; Chow tests WHETHER a given split's
    * regimes differ). Every moment enters as an exact centi-unit
    * integer decimal; centered sums form as exact decimal numerators
    * (n·Σxy − Σx·Σy) before ONE cast to double, so SSEs and F are
    * bitwise cross-engine. Detection twin: `slope_injected` adds a
    * +2000.00/day kink from day 15 — F explodes; `healthy` stays
    * small. One corpus-sized daily aggregate; the rest is the bounded
    * 30-row frame.
    */
  private def qChow(s: SparkSession, dir: String): DataFrame = {
    val daily0 = ev(s, dir)
      .select(expr("(ts div 1000) div 86400000000").as("day"), col("value"))
      .groupBy("day")
      .agg(sum(round(col("value") * 100).cast(DecimalType(38, 0))).as("yc"))
    val m0 = daily0.agg(min("day").as("d0"))
    val daily = daily0.crossJoin(broadcast(m0))
      .select((col("day") - col("d0")).as("t"), col("yc"))
    val series = daily.select(lit("healthy").as("scenario"), col("t"),
        col("yc"))
      .unionByName(daily.select(lit("slope_injected").as("scenario"),
        col("t"), (col("yc") + when(col("t") >= 15,
          (col("t") - lit(14)) * lit(200000L)).otherwise(lit(0L))
          .cast(DecimalType(38, 0))).as("yc")))
      .withColumn("seg", when(col("t") < 15, lit(1)).otherwise(lit(2)))
    def sse(grouped: DataFrame): DataFrame =
      // exact decimal numerators, ONE cast to double per centered sum
      grouped.select(col("scenario"), col("grp"),
        ((col("n") * col("syy") - col("sy") * col("sy"))
          .cast(DoubleType) / col("n").cast(DoubleType)).as("cyy"),
        ((col("n") * col("sxy") - col("sx") * col("sy"))
          .cast(DoubleType) / col("n").cast(DoubleType)).as("cxy"),
        ((col("n") * col("sxx") - col("sx") * col("sx"))
          .cast(DoubleType) / col("n").cast(DoubleType)).as("cxx"),
        col("n"))
        .select(col("scenario"), col("grp"), col("n"),
          (col("cyy") - col("cxy") * col("cxy") / col("cxx")).as("sse"))
    val d0 = lit(0L).cast(DecimalType(38, 0))
    def moments(df: DataFrame, grp: Column): DataFrame =
      df.groupBy(col("scenario"), grp.as("grp")).agg(
        count(lit(1)).cast(DecimalType(38, 0)).as("n"),
        sum(col("t").cast(DecimalType(38, 0))).as("sx"),
        sum(col("yc")).as("sy"),
        sum(col("t").cast(DecimalType(38, 0)) *
          col("t").cast(DecimalType(38, 0))).as("sxx"),
        sum(col("t").cast(DecimalType(38, 0)) * col("yc")).as("sxy"),
        sum(col("yc") * col("yc")).as("syy"))
    val pooled = sse(moments(series, lit(0)))
      .select(col("scenario"), col("sse").as("sse_p"),
        col("n").cast(DoubleType).as("nn"))
    val segs = sse(moments(series, col("seg")))
      .groupBy("scenario").agg(Stats.dsum(col("sse")).as("sse_12"))
    pooled.join(segs, Seq("scenario"))
      .select(col("scenario"), col("nn").cast("long").as("n_days"),
        round(((col("sse_p") - col("sse_12")) / lit(2.0)) /
          (col("sse_12") / (col("nn") - lit(4.0))), 6).as("f_chow"))
      .orderBy("scenario")
  }

  /** X40 — shingle containment (Broder 1997's asymmetric resemblance):
    * containment(A→B) = |S(A)∩S(B)| / |S(A)| over 3-token shingle
    * SETS — the quote/excerpt detector Jaccard misses (a short doc
    * fully contained in a long one has high containment but low
    * Jaccard; q24/q25 only measure the symmetric kind). Pair
    * generation is the inverted-index shape: join docs on shared
    * shingle, grouped count = the intersection size directly — with a
    * document-frequency cap (shingles in > 50 docs dropped, the
    * stopword-shingle guard) bounding the per-key fan-out exactly like
    * the q129 prefix-blocking rule. Output: pairs with containment
    * ≥ 0.5 plus their Jaccard for contrast, top-20.
    */
  private def qContainment(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    val sh = par(doc(s, dir)).select(col("doc_id"),
        TextOps.tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 3), " +
          "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))")).as("w"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q305", sh)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val dfCap = sh.groupBy("w").agg(count(lit(1)).as("df"))
      .where(col("df") <= 50).select("w")
    val inter = sh.join(dfCap, Seq("w"))
      .select(col("doc_id").as("a"), col("w"))
      .join(sh.join(dfCap, Seq("w")).select(col("doc_id").as("b"), col("w")),
        Seq("w"))
      .where(col("a") =!= col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter.join(sizes.select(col("doc_id").as("a"), col("sz").as("sza")),
        Seq("a"))
      .join(sizes.select(col("doc_id").as("b"), col("sz").as("szb")),
        Seq("b"))
      .select(col("a"), col("b"), col("inter"), col("sza"), col("szb"),
        round(col("inter").cast(DoubleType) /
          col("sza").cast(DoubleType), 6).as("containment"),
        round(col("inter").cast(DoubleType) /
          (col("sza") + col("szb") - col("inter")).cast(DoubleType), 6)
          .as("jaccard"))
      .where(col("containment") >= 0.5)
      .orderBy(desc("containment"), col("a"), col("b"))
      .limit(20)
  }

  /** X41 — Lincoln–Petersen capture–recapture (Petersen 1896) put to a
    * test it can't cheat: estimate the trigram-type population from
    * two overlapping document samples (disjoint hash splits A and B of
    * the corpus, "capture" = type appears in the sample), N̂ =
    * n_A·n_B/m — then report it against the EXACT type count the
    * engine can compute anyway. The honest twist: types are NOT
    * equal-catchability — a singleton trigram lives in exactly one
    * document and can be caught by at most ONE sample, deflating the
    * overlap m, so N̂ = n_A·n_B/m OVERestimates (measured +51% at
    * sf0.001) — the rel_err column quantifies the classic
    * heterogeneous-catchability bias instead of hiding it. One
    * distributed type-per-sample aggregate; the LP arithmetic is a
    * 1-row frame.
    */
  private def qCaptureRecapture(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    import graft.aug.Sampling.keyBucket
    val tri = par(doc(s, dir)).select(col("doc_id"),
        TextOps.tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 3), " +
          "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))")).as("w"))
    val marked = tri.select(col("w"),
        (keyBucket(col("doc_id"), 29L) < lit(500000L)).as("in_a"))
      .groupBy("w").agg(max(when(col("in_a"), 1).otherwise(0)).as("ca"),
        max(when(!col("in_a"), 1).otherwise(0)).as("cb"))
    marked.agg(sum(col("ca")).cast("long").as("n_a"),
        sum(col("cb")).cast("long").as("n_b"),
        sum(col("ca") * col("cb")).cast("long").as("m_both"),
        count(lit(1)).as("n_true"))
      .select(col("n_a"), col("n_b"), col("m_both"), col("n_true"),
        round(col("n_a").cast(DoubleType) * col("n_b").cast(DoubleType) /
          col("m_both").cast(DoubleType), 2).as("n_hat"),
        round((col("n_a").cast(DoubleType) * col("n_b").cast(DoubleType) /
          col("m_both").cast(DoubleType) -
          col("n_true").cast(DoubleType)) /
          col("n_true").cast(DoubleType), 6).as("rel_err"))
  }

  /** X42 — Cochran's Q test (Cochran 1950): the k-classifier
    * generalization of q292's McNemar — three binary language
    * detectors (lexicon argmax, contains-"the", contains-"and")
    * scored against the lang column on the SAME documents;
    * Q = (k−1)·[k·ΣC_j² − (ΣC_j)²] / [k·ΣR_i − ΣR_i²] over
    * per-classifier correct totals C_j and per-document correct
    * counts R_i. Pure integer arithmetic until the final division —
    * one conditional aggregate over the corpus.
    */
  private def qCochranQ(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    val d = doc(s, dir).select(
      (col("lang") === "en").as("truth"),
      (TextOps.langId(col("text")) === "en").as("pa"),
      array_contains(TextOps.tokens(col("text")), "the").as("pb"),
      array_contains(TextOps.tokens(col("text")), "and").as("pc"))
    val rows = d.select(
      when(col("pa") === col("truth"), 1L).otherwise(0L).as("xa"),
      when(col("pb") === col("truth"), 1L).otherwise(0L).as("xb"),
      when(col("pc") === col("truth"), 1L).otherwise(0L).as("xc"))
      .withColumn("ri", col("xa") + col("xb") + col("xc"))
    rows.agg(count(lit(1)).as("n"), sum("xa").as("ca"),
        sum("xb").as("cb"), sum("xc").as("cc"),
        sum("ri").as("sr"), sum(col("ri") * col("ri")).as("srr"))
      .select(col("n"), col("ca"), col("cb"), col("cc"),
        round(lit(2.0) * (lit(3.0) *
          (col("ca") * col("ca") + col("cb") * col("cb") +
            col("cc") * col("cc")).cast(DoubleType) -
          ((col("ca") + col("cb") + col("cc")) *
            (col("ca") + col("cb") + col("cc"))).cast(DoubleType)) /
          (lit(3.0) * col("sr").cast(DoubleType) -
            col("srr").cast(DoubleType)), 6).as("cochran_q"),
        lit(2).as("df"))
  }

  /** X43 — Page's L trend test (Page 1963): ordered-alternatives rank
    * test over the q302 block design — where Friedman asks "do the
    * event types differ at all", Page asks "do they follow THIS
    * order" (alphabetical type order as the registered hypothesis;
    * the statistic is demonstrative on label-ordered data).
    * L = Σ_j j·R_j with exact integer ranks; the standardization
    * μ_L = n·k(k+1)²/4, σ_L² = n·k²(k+1)(k²−1)/144 is closed-form
    * integer arithmetic until the final z.
    */
  private def qPageTrend(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = ev(s, dir)
      .select(expr("(ts div 1000) div 86400000000").as("day"),
        col("event_type"), col("value"))
      .groupBy("day", "event_type").agg(Stats.dsum(col("value")).as("y"))
    val w = Window.partitionBy("day").orderBy(desc("y"), col("event_type"))
    val ranked = daily.withColumn("rk", row_number().over(w))
    val wj = Window.orderBy("event_type")
    val rj = ranked.groupBy("event_type")
      .agg(sum("rk").as("r_sum"), count(lit(1)).as("n_days"))
      .withColumn("j", row_number().over(wj))
    val tot = rj.agg(sum(col("j") * col("r_sum")).as("l_stat"),
        max("n_days").as("n"), count(lit(1)).as("k"))
      .select(col("l_stat").cast("long").as("page_l"),
        col("n"), col("k"),
        (col("n").cast(DoubleType) * col("k").cast(DoubleType) *
          (col("k") + 1).cast(DoubleType) *
          (col("k") + 1).cast(DoubleType) / lit(4.0)).as("mu_l"),
        sqrt(col("n").cast(DoubleType) *
          col("k").cast(DoubleType) * col("k").cast(DoubleType) *
          (col("k") + 1).cast(DoubleType) *
          (col("k") * col("k") - 1).cast(DoubleType) / lit(144.0))
          .as("sd_l"))
    rj.crossJoin(broadcast(tot))
      .select(col("event_type"), col("j"), col("r_sum"), col("page_l"),
        round((col("page_l").cast(DoubleType) - col("mu_l")) /
          col("sd_l"), 6).as("z"))
      .orderBy("j")
  }

  /** X44 — entropy rate of the event stream (Shannon 1948; the
    * information-gain companion to q138's transition matrix):
    * H(next|cur) = −Σ p(cur,next)·ln p(next|cur) vs the memoryless
    * H(next), with the difference = the mutual information one step of
    * memory buys. Transition pairs form per user via the q138 lead
    * shape; the entropy arithmetic runs on the 25-cell transition
    * frame in exact-count ratios (ln of identical doubles).
    */
  private def qEntropyRate(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = ev(s, dir).select(col("user_id"), col("event_id"),
      expr("ts div 1000").as("us"), col("event_type"))
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val cells = e.withColumn("next", lead(col("event_type"), 1).over(w))
      .where(col("next").isNotNull)
      .groupBy(col("event_type").as("cur"), col("next"))
      .agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q309", cells)
    val curTot = cells.groupBy("cur").agg(sum("n").as("nc"))
    val nextTot = cells.groupBy("next").agg(sum("n").as("nx"))
    val tot = cells.agg(sum("n").as("nt"))
    val hCond = cells.join(curTot, Seq("cur")).crossJoin(broadcast(tot))
      .select(((col("n").cast(DoubleType) / col("nt").cast(DoubleType)) *
        (lit(0.0) - log(col("n").cast(DoubleType) /
          col("nc").cast(DoubleType)))).as("t"))
      .agg(Stats.dsum(col("t")).as("h_cond"))
    val hMarg = nextTot.crossJoin(broadcast(tot))
      .select(((col("nx").cast(DoubleType) / col("nt").cast(DoubleType)) *
        (lit(0.0) - log(col("nx").cast(DoubleType) /
          col("nt").cast(DoubleType)))).as("t"))
      .agg(Stats.dsum(col("t")).as("h_marg"))
    hCond.crossJoin(broadcast(hMarg)).crossJoin(broadcast(tot))
      .select(col("nt").as("n_transitions"),
        round(col("h_cond"), 6).as("entropy_rate"),
        round(col("h_marg"), 6).as("entropy_marginal"),
        round(col("h_marg") - col("h_cond"), 6).as("memory_gain"))
  }

  /** X45 — sequential pattern support ("A then B", existential per
    * user) with lift against order-blind co-occurrence: the
    * sequence-mining primitive under funnel analysis that q150's
    * prefix paths and q134's fixed funnel don't cover. The classic
    * trap is the per-user event self-join (66² pairs/user); the
    * existential semantics collapse it — "some A before some B" ⇔
    * min_ts(A) < max_ts(B) — so one (user, type) min/max aggregate
    * plus a per-user 5×5 type join (bounded by the type-vocabulary,
    * not the event count) computes exact support at ANY corpus size.
    * Semantics: FIRST occurrence of A before FIRST occurrence of B
    * (funnel order) — unconstrained "some A before some B" saturates
    * at support 1.0 on this stream (66 events/user over 5 types),
    * which reads as broken rather than measured; the first-vs-first
    * fraction sits near 0.5 on iid data and its deviation IS the
    * order-bias measurement. Microsecond ties count as not-before
    * (strict <) on both engines.
    */
  private def qSeqPatterns(s: SparkSession, dir: String): DataFrame = {
    val spans = ev(s, dir)
      .select(col("user_id"), col("event_type"),
        expr("ts div 1000").as("us"))
      .groupBy("user_id", "event_type")
      .agg(min("us").as("mn"), max("us").as("mx"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q310", spans)
    val users = spans.select("user_id").distinct()
      .agg(count(lit(1)).as("nu"))
    val pats = spans.toDF("user_id", "ta", "mna", "mxa")
      .join(spans.toDF("uid2", "tb", "mnb", "mxb"),
        col("user_id") === col("uid2") && col("ta") =!= col("tb"))
      .groupBy(col("ta").as("antecedent"), col("tb").as("consequent"))
      .agg(count(when(col("mna") < col("mnb"), 1)).as("n_seq"),
        count(lit(1)).as("n_both"))
    val single = spans.groupBy("event_type")
      .agg(count(lit(1)).as("n_has"))
    pats.join(single.select(col("event_type").as("antecedent"),
        col("n_has").as("na")), Seq("antecedent"))
      .join(single.select(col("event_type").as("consequent"),
        col("n_has").as("nb")), Seq("consequent"))
      .crossJoin(broadcast(users))
      .select(col("antecedent"), col("consequent"), col("n_seq"),
        round(col("n_seq").cast(DoubleType) /
          col("nu").cast(DoubleType), 6).as("support"),
        round(col("n_seq").cast(DoubleType) * col("nu").cast(DoubleType) /
          (col("na").cast(DoubleType) * col("nb").cast(DoubleType)), 6)
          .as("lift"))
      .orderBy("antecedent", "consequent")
  }

  /** X46 — overdispersion diagnostic + negative-binomial fit for
    * events-per-user counts (the "is Poisson good enough" gate every
    * count model needs): dispersion index D = s²/x̄, the Poisson
    * dispersion test χ² = (n−1)·D with its normal approximation
    * z = √(2χ²) − √(2df−1), and the method-of-moments NB parameters
    * r = x̄²/(s²−x̄), p = x̄/s². Counts are exact integers; variance
    * uses the exact-decimal moment recipe, so every statistic is
    * engine-identical. One grouped count + one moment aggregate.
    */
  private def qOverdispersion(s: SparkSession, dir: String): DataFrame = {
    val per = ev(s, dir).groupBy("user_id")
      .agg(count(lit(1)).cast(DecimalType(38, 0)).as("c"))
    val m = per.agg(count(lit(1)).cast(DecimalType(38, 0)).as("n"),
        sum(col("c")).as("sc"), sum(col("c") * col("c")).as("scc"))
      .select(col("n").cast(DoubleType).as("n"),
        (col("sc").cast(DoubleType) / col("n").cast(DoubleType)).as("mean"),
        (((col("n") * col("scc") - col("sc") * col("sc"))
          .cast(DoubleType)) /
          (col("n").cast(DoubleType) * (col("n").cast(DoubleType) - 1.0)))
          .as("variance"))
    m.select(col("n").cast("long").as("n_users"),
        round(col("mean"), 6).as("mean"),
        round(col("variance"), 6).as("variance"),
        round(col("variance") / col("mean"), 6).as("dispersion"),
        round(sqrt(lit(2.0) * (col("n") - 1.0) * col("variance") /
          col("mean")) - sqrt(lit(2.0) * (col("n") - 1.0) - 1.0), 6)
          .as("poisson_z"),
        round(col("mean") * col("mean") /
          (col("variance") - col("mean")), 6).as("nb_r"),
        round(col("mean") / col("variance"), 6).as("nb_p"))
  }

  /** X47 — effective sample size of temperature-mix importance weights
    * (Kong 1992; the "did re-weighting waste my corpus" diagnostic for
    * the q92/q225 mixing family): target q_d ∝ p_d^τ (τ = 0.5) over
    * document LANGUAGES (the skewed dimension — en is ~44% of the
    * corpus; sources are uniform and would make the diagnostic
    * vacuous), per-doc weight w_d = q_d/p_d, ESS = (Σw)²/Σw² — equal
    * to n only when weights are uniform; the ess_fraction column is
    * the usable-corpus fraction after re-weighting. Everything reduces
    * on the per-language count frame (Σ over docs of a per-language
    * weight = n_d·w_d in closed form).
    */
  private def qEssWeights(s: SparkSession, dir: String): DataFrame = {
    val cnt = doc(s, dir).groupBy("lang").agg(count(lit(1)).as("nd"))
    val tot = cnt.agg(sum("nd").as("n"))
    val g = cnt.crossJoin(broadcast(tot))
      .select(col("lang"), col("nd"), col("n"),
        (col("nd").cast(DoubleType) / col("n").cast(DoubleType)).as("p"))
      .withColumn("q_raw", sqrt(col("p")))
    val z = g.agg(Stats.dsum(col("q_raw")).as("zq"))
    val w = g.crossJoin(broadcast(z))
      .select(col("lang"), col("nd"), col("n"),
        ((col("q_raw") / col("zq")) / col("p")).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q311", w)
    val ess = w.agg(
        Stats.dsum(col("nd").cast(DoubleType) * col("w")).as("sw"),
        Stats.dsum(col("nd").cast(DoubleType) * col("w") * col("w"))
          .as("sww"), max("n").as("n"))
      .select(round(col("sw") * col("sw") / col("sww"), 2).as("ess"),
        round(col("sw") * col("sw") / col("sww") /
          col("n").cast(DoubleType), 6).as("ess_fraction"))
    w.crossJoin(broadcast(ess))
      .select(col("lang"), col("nd").as("n_docs"),
        round(col("w"), 6).as("weight"), col("ess"), col("ess_fraction"))
      .orderBy("lang")
  }

  /** X48 — global graph statistics sheet on the co-purchase graph
    * (q290's SF-invariant √n-supernode grain): degree assortativity
    * (Newman 2002 — do high-degree nodes link to high-degree nodes?)
    * as the exact Pearson correlation of endpoint degrees over both
    * edge orientations, and the global clustering coefficient
    * 3·triangles/wedges (Watts–Strogatz's transitivity in its
    * closed-triple form, the q156 triangle shape). Every sum is over
    * integer degrees/counts (exact decimal) — bitwise cross-engine.
    * The quadratic work is bucket-confined exactly as in q156/q290.
    */
  private def qGraphStats(s: SparkSession, dir: String): DataFrame = {
    val raw = li(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").cast("long").as("pk"))
    val kk = raw.agg(
      (ceil(sqrt(countDistinct(col("ok")))).cast("long") * lit(6L)).as("k"))
    val ob = raw.crossJoin(broadcast(kk))
      .select(col("ok"), (col("pk") % col("k")).as("pk"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val edges = ob.toDF("ok", "p1")
      .join(ob.toDF("ok2", "p2"), col("ok") === col("ok2") && col("p1") < col("p2"))
      .groupBy("p1", "p2").agg(count(lit(1)).as("npair"))
      .where(col("npair") >= 2).select("p1", "p2")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val adj = edges.union(edges.select(col("p2"), col("p1"))).toDF("a", "b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q313", ob, edges, adj)
    val deg = adj.groupBy("a").agg(count(lit(1)).cast("long").as("dg"))
    // assortativity: Pearson over directed edge list of (deg_a, deg_b)
    val de = adj.join(deg.toDF("a", "da"), Seq("a"))
      .join(deg.toDF("b", "db"), Seq("b"))
      .select(col("da").cast(DecimalType(38, 0)).as("x"),
        col("db").cast(DecimalType(38, 0)).as("y"))
    val mo = de.agg(count(lit(1)).cast(DecimalType(38, 0)).as("m"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val assort = mo.select(
      (((col("m") * col("sxy") - col("sx") * col("sy")).cast(DoubleType)) /
        (sqrt((col("m") * col("sxx") - col("sx") * col("sx"))
          .cast(DoubleType)) *
          sqrt((col("m") * col("syy") - col("sy") * col("sy"))
            .cast(DoubleType)))).as("assortativity"),
      (col("m") / lit(2)).cast("long").as("n_edges"))
    // triangles via the directed wedge join (a < m < c canonical form)
    val tri = edges.toDF("x", "m")
      .join(edges.toDF("m2", "y"), col("m") === col("m2"))
      .join(edges.toDF("x2", "y2"),
        col("x") === col("x2") && col("y") === col("y2"))
      .agg(count(lit(1)).cast("long").as("n_tri"))
    val wedges = deg.agg(
      sum(expr("dg * (dg - 1) div 2").cast(DecimalType(38, 0)))
        .cast("long").as("n_wedges"))
    val nn = deg.agg(count(lit(1)).as("n_nodes"))
    assort.crossJoin(broadcast(tri)).crossJoin(broadcast(wedges))
      .crossJoin(broadcast(nn))
      .select(col("n_nodes"), col("n_edges"),
        round(col("assortativity"), 6).as("assortativity"),
        col("n_tri"), col("n_wedges"),
        round(lit(3.0) * col("n_tri").cast(DoubleType) /
          col("n_wedges").cast(DoubleType), 6).as("clustering_coef"))
  }

  /** X49 — Wald–Wolfowitz runs test (1940) on the signs of the q297
    * daily-trend residuals: R runs of same-signed residuals against
    * μ_R = 2·n₊·n₋/n + 1, σ²_R = (μ_R−1)(μ_R−2)/(n−1) — positive
    * autocorrelation shows as too FEW runs, the nonparametric
    * cross-check of q297's DW and q300's Ljung–Box (all three
    * diagnostics now triangulate the same residual series). Residual
    * signs come from the exact micro-unit quantization; the run count
    * is a lag comparison over the bounded ~30-row daily frame.
    */
  private def qRunsTest(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = ev(s, dir)
      .select(expr("(ts div 1000) div 86400000000").as("day"), col("value"))
      .groupBy("day").agg(Stats.dsum(col("value")).as("y"))
    val m0 = daily.agg(min("day").as("d0"))
    val pts = daily.crossJoin(broadcast(m0))
      .select(col("day"), (col("day") - col("d0"))
        .cast(DoubleType).as("x"), col("y"))
    val fit = pts.agg(Stats.dsum(col("x")).as("sx"),
        Stats.dsum(col("y")).as("sy"),
        Stats.dsum(col("x") * col("y")).as("sxy"),
        Stats.dsum(col("x") * col("x")).as("sxx"),
        count(lit(1)).cast(DoubleType).as("nn"))
      .select(((col("sxy") - col("sx") * col("sy") / col("nn")) /
        (col("sxx") - col("sx") * col("sx") / col("nn"))).as("b"),
        col("sx"), col("sy"), col("nn"))
      .select(col("b"), ((col("sy") - col("b") * col("sx")) / col("nn"))
        .as("a"))
    val sgn = pts.crossJoin(broadcast(fit))
      .select(col("day"),
        when(round(round(col("y") - col("a") - col("b") * col("x"), 6) *
          lit(1e6)) >= 0, lit(1)).otherwise(lit(-1)).as("sg"))
    val w = Window.orderBy("day")
    val runs = sgn.withColumn("prev", lag("sg", 1).over(w))
      .agg(count(lit(1)).as("n"),
        count(when(col("sg") === 1, 1)).as("n_pos"),
        count(when(col("sg") === -1, 1)).as("n_neg"),
        (count(when(col("prev").isNull ||
          col("sg") =!= col("prev"), 1)).cast("long")).as("n_runs"))
    runs.select(col("n"), col("n_pos"), col("n_neg"), col("n_runs"),
        (lit(2.0) * col("n_pos").cast(DoubleType) *
          col("n_neg").cast(DoubleType) / col("n").cast(DoubleType) +
          lit(1.0)).as("mu_r"))
      .select(col("n"), col("n_pos"), col("n_neg"), col("n_runs"),
        round(col("mu_r"), 6).as("mu_runs"),
        round((col("n_runs").cast(DoubleType) - col("mu_r")) /
          sqrt((col("mu_r") - 1.0) * (col("mu_r") - 2.0) /
            (col("n").cast(DoubleType) - 1.0)), 6).as("z"))
  }

  /** X50 — Theil T inequality index with exact within/between-nation
    * decomposition (Theil 1967): the additively-decomposable
    * inequality measure q124's Gini and q179's HHI can't provide —
    * T = Σ_g s_g·T_g + Σ_g s_g·ln(s_g/(n_g/n)) splits customer-revenue
    * inequality into within-nation and between-nation parts, and the
    * output carries the identity audit |T − within − between| < 1e-7
    * (measured residual 4.4e-9 at sf0.1 — accumulated double rounding
    * across the per-customer term pass). Per-customer
    * revenue is an exact centi-unit sum; the per-customer term pass is
    * the only corpus-sized stage.
    */
  private def qTheil(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
      .select(col("o_custkey"), round(col("o_totalprice") * 100)
        .cast(DecimalType(38, 0)).as("yc"))
    val c = Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val per = o.groupBy("o_custkey").agg(sum("yc").as("yc"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").as("nation"), col("yc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q315", per)
    val gtot = per.groupBy("nation").agg(sum("yc").as("ycg"),
      count(lit(1)).cast("long").as("ng"))
    val tot = gtot.agg(sum("ycg").as("yct"), sum("ng").as("nt"))
    // per-customer terms for T_total and (via the group mean) T_within
    val terms = per.join(broadcast(gtot), Seq("nation"))
      .crossJoin(broadcast(tot))
      .select(col("nation"),
        ((col("yc").cast(DoubleType) / col("yct").cast(DoubleType)) *
          log((col("yc").cast(DoubleType) / col("yct").cast(DoubleType)) *
            col("nt").cast(DoubleType))).as("t_tot"),
        ((col("yc").cast(DoubleType) / col("ycg").cast(DoubleType)) *
          log((col("yc").cast(DoubleType) / col("ycg").cast(DoubleType)) *
            col("ng").cast(DoubleType))).as("t_g"))
    val tTotal = terms.agg(Stats.dsum(col("t_tot")).as("t_total"))
    val tWithin = terms.groupBy("nation")
      .agg(Stats.dsum(col("t_g")).as("tg"))
      .join(broadcast(gtot), Seq("nation")).crossJoin(broadcast(tot))
      .select(((col("ycg").cast(DoubleType) / col("yct").cast(DoubleType)) *
        col("tg")).as("w"))
      .agg(Stats.dsum(col("w")).as("t_within"))
    val tBetween = gtot.crossJoin(broadcast(tot))
      .select(((col("ycg").cast(DoubleType) / col("yct").cast(DoubleType)) *
        log((col("ycg").cast(DoubleType) / col("yct").cast(DoubleType)) /
          (col("ng").cast(DoubleType) / col("nt").cast(DoubleType))))
        .as("tb"))
      .agg(Stats.dsum(col("tb")).as("t_between"))
    tTotal.crossJoin(broadcast(tWithin)).crossJoin(broadcast(tBetween))
      .select(round(col("t_total"), 6).as("theil_total"),
        round(col("t_within"), 6).as("theil_within"),
        round(col("t_between"), 6).as("theil_between"),
        // tolerance 1e-7: the identity residual is accumulated double
        // rounding across the per-customer term pass (measured 4.4e-9
        // at 150k customers / sf0.1, growing ~linearly in n)
        (abs(col("t_total") - col("t_within") - col("t_between")) <
          lit(1e-7)).as("decomposition_ok"))
  }

  /** X51 — Bradley–Terry pairwise-preference ratings via the MM
    * algorithm (Bradley & Terry 1952; Hunter 2004's minorization
    * update θ_i ← W_i / Σ_j n_ij/(θ_i+θ_j)) — the model behind Elo,
    * arena-style LLM eval leaderboards, and every "A beats B" rating.
    * Comparisons: within an order, supplier a beats supplier b when
    * a's extendedprice total for that order exceeds b's (exact 2-dp
    * decimals; ties are no-games, documented). The pair aggregate is
    * the only corpus-sized stage; eight MM iterations run on the
    * bounded supplier-pair frame (five registered iterations — MM converges geometrically and each costs a full pair-frame pass) with the q301 determinism recipe —
    * ratings quantize to 1e-9 after each update, so the whole
    * trajectory is bitwise cross-engine. Mean-normalized; top-20.
    */
  private def qBradleyTerry(s: SparkSession, dir: String): DataFrame = {
    val perOs = li(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
        round(col("l_extendedprice") * 100).cast(DecimalType(38, 0))
          .as("pc"))
      .groupBy("ok", "sk").agg(sum("pc").as("pc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q316.perOs", perOs)
    val games = perOs.toDF("ok", "sa", "pa")
      .join(perOs.toDF("ok2", "sb", "pb"),
        col("ok") === col("ok2") && col("sa") =!= col("sb"))
      .where(col("pa") =!= col("pb"))
      .groupBy("sa", "sb")
      .agg(count(lit(1)).as("n_ij"),
        count(when(col("pa") > col("pb"), 1)).as("w_ij"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q316", games)
    val wins = games.groupBy(col("sa").as("i"))
      .agg(sum("w_ij").cast(DoubleType).as("wi"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q316.wins", wins)
    var theta = graft.core.Caches.checkpointOnce("q316",
      wins.select(col("i"), lit(1.0).as("th")).coalesce(1))
    for (_ <- 1 to 5) {
      val denom = games
        .join(broadcast(theta.toDF("i", "thi")), col("sa") === col("i"))
        .join(broadcast(theta.toDF("j", "thj")), col("sb") === col("j"))
        .groupBy(col("sa"))
        .agg(Stats.dsum(col("n_ij").cast(DoubleType) /
          (col("thi") + col("thj"))).as("dn"))
      val raw = wins.join(denom, col("i") === col("sa"))
        .select(col("i"), (col("wi") / col("dn")).as("tr"))
      val mean = raw.agg(Stats.dsum(col("tr")).as("st"),
        count(lit(1)).cast(DoubleType).as("nn"))
      theta = graft.core.Caches.checkpointOnce("q316",
        raw.crossJoin(broadcast(mean))
          .select(col("i"),
            (round(col("tr") / (col("st") / col("nn")) * lit(1e9)) /
              lit(1e9)).as("th"))
          .coalesce(1))
    }
    theta.join(wins, Seq("i"))
      .select(col("i").as("supplier"), col("wi").cast("long").as("wins"),
        round(col("th"), 6).as("rating"))
      .orderBy(desc("rating"), col("supplier")).limit(20)
  }

  /** X52 — AGMS join-size estimation (Alon–Gianella–Matias–Szegedy
    * 1999/2002): |A⋈B| = Σ_k a_k·b_k estimated by the inner product of
    * ±1 atomic sketches — the classic sketch the q274 F2 machinery
    * exists FOR in a query optimizer (join cardinality from one pass
    * per side, no key-level statistics). A = lineitem part keys, B =
    * part keys restricted to a 20% order hash split (real skewed
    * multiplicities on both sides). 16 counters per side computed in
    * ONE conditional aggregate pass; estimator = mean and
    * median-of-4-group-means of the counter products, reported beside
    * the EXACT join size (one grouped-count pass) with relative
    * errors. Same sign-hash family and driver-side median as q274,
    * widened to 64 counters: the estimator variance is ~F2(A)·F2(B)
    * per counter and this join is dense (every key matches), so 16
    * counters sat at ±50% — 64 lands within a few percent (measured
    * +3.4% mean / −15% median-of-means at sf0.1).
    */
  private def qJoinSizeAms(s: SparkSession, dir: String): DataFrame = {
    import graft.aug.Sampling.keyBucket
    val P = 1000000007L
    val base = li(s, dir).select(
        ((col("l_partkey").cast("long") * lit(2654435761L)) % lit(P))
          .as("h"),
        (keyBucket(col("l_orderkey"), 41L) < lit(200000L)).as("in_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q317", base)
    val xi = (1 to 64).map { j =>
      val t = col("h") + lit(j * 1000003L)
      when((t * t) % lit(P) % 2 === 0, 1L).otherwise(-1L)
    }
    val aggs = xi.zipWithIndex.flatMap { case (x, i) =>
      Seq(sum(x).as(s"a${i + 1}"),
        sum(when(col("in_b"), x).otherwise(lit(0L))).as(s"b${i + 1}"))
    }
    val sk = base.agg(aggs.head, aggs.tail: _*).head()
    val prods = (0 until 64).map(i =>
      sk.getLong(2 * i).toDouble * sk.getLong(2 * i + 1).toDouble)
    val estMean = prods.sum / 64.0
    val groupMeans = prods.grouped(8).map(_.sum / 8.0).toSeq.sorted
    val estMom = (groupMeans(3) + groupMeans(4)) / 2.0
    val ex = base.groupBy("h")
      .agg(count(lit(1)).as("a"), count(when(col("in_b"), 1)).as("b"))
      .agg(sum("a").as("n_a"), sum("b").as("n_b"),
        sum(col("a") * col("b")).as("jx")).head()
    val (nA, nB, jx) = (ex.getLong(0), ex.getLong(1), ex.getLong(2))
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    import s.implicits._
    Seq((nA, nB, jx, r6(estMean), r6(estMom),
      r6((estMean - jx.toDouble) / jx.toDouble),
      r6((estMom - jx.toDouble) / jx.toDouble)))
      .toDF("n_a", "n_b", "join_exact", "est_mean", "est_mom",
        "rel_err_mean", "rel_err_mom")
  }

  /** X53 — k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala
    * 2007): the privacy-risk sheet beside the governance family (q205
    * GDPR purge, q242 DP release). Quasi-identifier = (nation,
    * mktsegment) on customers, sensitive attribute = acctbal in 1000-
    * unit buckets; reports equivalence-class statistics, the fraction
    * of rows in classes below k ∈ {2,5}, and the minimum/violating-l
    * diversity. One grouped aggregate over the corpus; all metrics
    * integer-exact until the final fractions.
    */
  private def qKAnonymity(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer").select(col("c_nationkey"),
      col("c_mktsegment"),
      floor(col("c_acctbal") / 1000.0).cast("long").as("sbucket"))
    val cls = c.groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("k"), countDistinct("sbucket").as("l"))
    cls.agg(sum("k").as("n_rows"), count(lit(1)).as("n_classes"),
        min("k").as("min_k"),
        sum(when(col("k") < 2, col("k")).otherwise(lit(0L)))
          .as("rows_k_lt_2"),
        sum(when(col("k") < 5, col("k")).otherwise(lit(0L)))
          .as("rows_k_lt_5"),
        min("l").as("min_l"),
        count(when(col("l") < 3, 1)).as("classes_l_lt_3"))
      .select(col("n_rows"), col("n_classes"), col("min_k"),
        round(col("rows_k_lt_2").cast(DoubleType) /
          col("n_rows").cast(DoubleType), 6).as("pct_rows_k_lt_2"),
        round(col("rows_k_lt_5").cast(DoubleType) /
          col("n_rows").cast(DoubleType), 6).as("pct_rows_k_lt_5"),
        col("min_l"),
        round(col("classes_l_lt_3").cast(DoubleType) /
          col("n_classes").cast(DoubleType), 6).as("pct_classes_l_lt_3"))
  }

  /** X54 — Mann–Kendall trend test + Sen's slope (Mann 1945; Sen
    * 1968): the nonparametric trend battery beside q133's Theil–Sen
    * regression — S = Σ_{i<j} sign(x_j − x_i) with the no-ties
    * variance n(n−1)(2n+5)/18 and continuity-corrected z, plus Sen's
    * slope as the exact median of the 435 pairwise slopes (avg of the
    * two middle order statistics on the bounded pair frame).
    * Detection twin: `trend_injected` adds +2000.00·t — Sen's slope
    * recovers ≈2000 and z leaves the null band; `healthy` stays
    * inside it. Daily sums exact centi-units; the pair join is the
    * bounded ~30-row frame against itself.
    */
  private def qMannKendall(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily0 = ev(s, dir)
      .select(expr("(ts div 1000) div 86400000000").as("day"), col("value"))
      .groupBy("day")
      .agg(sum(round(col("value") * 100).cast(DecimalType(38, 0))).as("xc"))
    val m0 = daily0.agg(min("day").as("d0"))
    val daily = daily0.crossJoin(broadcast(m0))
      .select((col("day") - col("d0")).as("t"), col("xc"))
    val series = daily.select(lit("healthy").as("scenario"), col("t"),
        col("xc"))
      .unionByName(daily.select(lit("trend_injected").as("scenario"),
        col("t"), (col("xc") + col("t") * lit(200000L))
          .cast(DecimalType(38, 0)).as("xc")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q319", series)
    val pairs = series.toDF("scenario", "ti", "xi")
      .join(series.toDF("sc2", "tj", "xj"),
        col("scenario") === col("sc2") && col("ti") < col("tj"))
      .select(col("scenario"),
        signum((col("xj") - col("xi")).cast(DoubleType)).as("sg"),
        ((col("xj") - col("xi")).cast(DoubleType) / lit(100.0) /
          (col("tj") - col("ti")).cast(DoubleType)).as("slope"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q319.pairs", pairs)
    val wS = Window.partitionBy("scenario").orderBy("slope")
    val med = pairs
      .withColumn("rk", row_number().over(wS))
      .withColumn("np", count(lit(1)).over(Window.partitionBy("scenario")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .where(col("rk") === expr("(np + 1) div 2") ||
        col("rk") === expr("np div 2 + 1"))
      .groupBy("scenario").agg(Stats.dsum(col("slope")).as("msum"),
        count(lit(1)).cast(DoubleType).as("mc"))
      .select(col("scenario"), (col("msum") / col("mc")).as("sen"))
    val st = pairs.groupBy("scenario")
      .agg(sum(col("sg").cast(DecimalType(38, 0))).cast("long").as("s_mk"))
    val n = series.groupBy("scenario").agg(count(lit(1)).as("n"))
    st.join(n, Seq("scenario")).join(med, Seq("scenario"))
      .select(col("scenario"), col("n"), col("s_mk"),
        round(when(col("s_mk") > 0,
          (col("s_mk").cast(DoubleType) - 1.0)).otherwise(
          when(col("s_mk") < 0, col("s_mk").cast(DoubleType) + 1.0)
            .otherwise(lit(0.0))) /
          sqrt(col("n").cast(DoubleType) * (col("n").cast(DoubleType) - 1.0) *
            (lit(2.0) * col("n").cast(DoubleType) + 5.0) / lit(18.0)), 6)
          .as("z"),
        round(col("sen"), 6).as("sen_slope"))
      .orderBy("scenario")
  }

  /** X55 — Hurst exponent by rescaled-range analysis (Hurst 1951;
    * Mandelbrot & Wallis 1969): log(R/S) vs log(n) over block sizes
    * n ∈ {8, 16, 24} on the daily series. Detection twin: `healthy`
    * is the (near-iid) daily revenue — H̄ hovers near the 0.5 noise
    * band; `walk_injected` REPLACES the series with a deterministic
    * hash-sign random walk (cumulative ±1000.00 steps), whose R/S
    * slope runs near 1 — the long-memory signature R/S exists to
    * detect. Block R and S come from exact centi-unit cumulative
    * sums and moments over the bounded ~30-row frame; the final OLS
    * runs on 3 points per scenario. Caveat carried in the numbers:
    * plain R/S overestimates H at small n (the Anis–Lloyd bias —
    * healthy reads ≈0.72, not 0.5, on 30 points); the registered
    * measurement is the healthy-vs-walk CONTRAST (0.72 vs 1.02),
    * not an absolute H estimate.
    */
  private def qHurst(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.aug.Sampling.keyBucket
    val daily0 = ev(s, dir)
      .select(expr("(ts div 1000) div 86400000000").as("day"), col("value"))
      .groupBy("day")
      .agg(sum(round(col("value") * 100).cast(DecimalType(38, 0))).as("xc"))
    val m0 = daily0.agg(min("day").as("d0"))
    val base = daily0.crossJoin(broadcast(m0))
      .select((col("day") - col("d0")).as("t"), col("xc"))
    val wWalk = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val walk = base.select(col("t"),
        when(keyBucket(col("t") + lit(7700L), 37L) < lit(500000L),
          lit(100000L)).otherwise(lit(-100000L))
          .cast(DecimalType(38, 0)).as("step"))
      .withColumn("xc", sum("step").over(wWalk)).drop("step")
    val series = base.select(lit("healthy").as("scenario"), col("t"),
        col("xc"))
      .unionByName(walk.select(lit("walk_injected").as("scenario"),
        col("t"), col("xc")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("q320", series)
    val sizes = Seq(8, 16, 24)
    val rs = sizes.map { bn =>
      val blk = series.select(col("scenario"), col("t"), col("xc"),
          expr(s"t div $bn").as("blk"))
      // block mean from exact sums; per-row deviation; cumulative
      // deviation range R and block sd S over the bounded frame
      val bm = blk.groupBy("scenario", "blk")
        .agg(sum("xc").as("sxc"), count(lit(1)).as("bc"))
        .where(col("bc") === bn)
      val dev = blk.join(bm, Seq("scenario", "blk"))
        .select(col("scenario"), col("blk"), col("t"),
          (col("xc").cast(DoubleType) -
            col("sxc").cast(DoubleType) / col("bc").cast(DoubleType))
            .as("d"),
          col("bc"))
      val wCum = Window.partitionBy("scenario", "blk").orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = dev.withColumn("cd",
        sum(col("d").cast(DecimalType(38, 10))).over(wCum)
          .cast(DoubleType))
      cum.groupBy("scenario", "blk")
        .agg((greatest(max("cd"), lit(0.0)) -
          least(min("cd"), lit(0.0))).as("r"),
          sqrt(Stats.dsum(col("d") * col("d")) /
            max(col("bc")).cast(DoubleType)).as("sd"))
        .where(col("sd") > 0)
        .select(col("scenario"), lit(bn).as("n"),
          (col("r") / col("sd")).as("rs"))
    }.reduce(_ unionByName _)
    val pts = rs.groupBy("scenario", "n")
      .agg(Stats.dsum(col("rs")).as("srs"),
        count(lit(1)).cast(DoubleType).as("nb"))
      .select(col("scenario"), col("n"),
        log(col("srs") / col("nb")).as("y"),
        log(col("n").cast(DoubleType)).as("x"))
    val fit = pts.groupBy("scenario").agg(
        Stats.dsum(col("x")).as("sx"), Stats.dsum(col("y")).as("sy"),
        Stats.dsum(col("x") * col("y")).as("sxy"),
        Stats.dsum(col("x") * col("x")).as("sxx"),
        count(lit(1)).cast(DoubleType).as("np"))
      .select(col("scenario"),
        round((col("sxy") - col("sx") * col("sy") / col("np")) /
          (col("sxx") - col("sx") * col("sx") / col("np")), 6)
          .as("hurst_h"))
    pts.select(col("scenario"), col("n"),
        round(exp(col("y")), 6).as("rs_mean"))
      .join(fit, Seq("scenario"))
      .orderBy("scenario", "n")
  }

  /** MM-JPG-COLOR — REAL baseline COLOR JPEG decode (3-component YCbCr
    * 4:2:0, the dominant in-the-wild profile; closes the r10 verdict's
    * "missing #2" color gap over the Huffman/IDCT machinery already
    * built for q234): deterministic DC-only color JPEGs per doc_id
    * ([[graft.multimodal.Binary.synthColorJpeg]] — two quant tables,
    * two Huffman table PAIRS so table selection is exercised, MCU-
    * interleaved scan with three independent DC difference chains),
    * fully decoded back — marker walk, SOF0 sampling validation, MCU
    * entropy decode, dequant, exact integer path for flat blocks — and
    * reduced to per-plane integer sums. One wrong bit in ANY of the
    * three chains corrupts every later block of that component and
    * flips that plane's sum; the oracle recomputes all three planes
    * from the closed-form clamp(dc·2+128) block values. stubDecode's
    * boundary shrinks to progressive JPEG / FLAC / MP4 frames.
    */
  private def qColorJpeg(s: SparkSession, dir: String): DataFrame = {
    import graft.multimodal.Binary
    doc(s, dir).where(col("doc_id") < 60).select(col("doc_id"))
      .withColumn("jpg", Binary.synthColorJpegCol(col("doc_id")))
      .select(col("doc_id"), Binary.jpegColorStatsCol(col("jpg")).as("st"))
      .select(col("doc_id"),
        col("st._1").cast("long").as("width"),
        col("st._2").cast("long").as("height"),
        col("st._3").as("sum_y"),
        col("st._4").as("sum_cb"),
        col("st._5").as("sum_cr"))
      .orderBy("doc_id")
  }

  /** ST-E2E — the streaming surface's oracle-checked BATCH TWIN
    * (r10 verdict item 7): sessionize → daily session-length
    * distribution → PSI drift alert, the exact composition the
    * incremental path runs as streamingSessionize → streamingPsi with
    * a fitPsiBaseline literal. Conventions are the streaming ops' own:
    * 30-min gap on micro timestamps, fixed bin edges as x.5 literals
    * (integer session lengths can never sit ON an edge), baseline
    * proportions frozen from the first 15 days and carried as driver
    * literals (the PsiBaseline shape), per-bin eps=1e-6 smoothing on
    * BOTH sides, psi summed in fixed bin order 0..3 (the oracle chains
    * the same left-associated expression), alert at psi > 0.2 on the
    * ROUNDED value. StreamingSpec/StreamParity pin stream == batch per
    * stage on the same slice; this row documents end-to-end what the
    * stream computes, inside the hard correctness gate.
    */
  private def qStreamPipelineTwin(s: SparkSession, dir: String): DataFrame = {
    val gapUs = 30L * 60 * 1000 * 1000
    val eps = 1e-6
    val base = ev(s, dir).withColumn("ts_us", expr("ts div 1000"))
    val sess = graft.seq.Sessionizer.sessionStats(base, Seq("user_id"),
        col("ts_us"), Seq(col("event_id")), gapUs, col("value"))
      .select(col("n_events"),
        expr("CAST(start_ts AS BIGINT) div 86400000000").as("day"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Caches.retain("entry.q322", sess)
    val edges = Seq(1.5, 3.5, 6.5)
    val binned = sess.withColumn("bin",
      graft.drift.Drift.binIndex(col("n_events").cast("double"), edges))
    val minDay = sess.agg(min("day")).head().getLong(0)
    // frozen baseline: first 15 days' bin proportions, eps-smoothed —
    // collected to ≤4 rows and carried as literals, the PsiBaseline
    // contract streamingPsi consumes
    val baseRows = binned.where(col("day") < minDay + 15)
      .groupBy("bin").agg(count(lit(1)).as("nb")).collect()
    val baseTot = baseRows.map(_.getLong(1)).sum.toDouble
    val pb = Array.tabulate(4) { bI =>
      val nb = baseRows.find(_.getInt(0) == bI).map(_.getLong(1)).getOrElse(0L)
      math.max(nb.toDouble / baseTot, eps)
    }
    val dayAgg = binned.groupBy("day").agg(
      count(lit(1)).as("n_sessions"),
      count(when(col("bin") === 0, 1)).as("c0"),
      count(when(col("bin") === 1, 1)).as("c1"),
      count(when(col("bin") === 2, 1)).as("c2"),
      count(when(col("bin") === 3, 1)).as("c3"))
    def term(bI: Int): Column = {
      val pc = greatest(col(s"c$bI").cast("double") /
        col("n_sessions").cast("double"), lit(eps))
      (pc - lit(pb(bI))) * log(pc / lit(pb(bI)))
    }
    dayAgg
      .withColumn("psi", round((0 to 3).map(term).reduce(_ + _), 6))
      .select(col("day"), col("n_sessions"), col("psi"),
        (col("psi") > lit(0.2)).as("alert"))
      .orderBy("day")
  }

  // ----------------------------------------------------------------- //

  /** Queries deliberately registered without an oracle — the driver
    * records a rows-only check. EMPTY since round 10: q34, the last
    * rows-only row, now ships a distributional self-verifying audit
    * (exact lineitem anchors + binomial-band / chi-square / no-dup /
    * permutation-length booleans the oracle pins TRUE — the q190/q191
    * pattern), so every registered query sits inside the hard gate.
    */
  def rowsOnlyQueries: Set[String] = Set.empty

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (qPricingSummary _),
    "q02_profile" -> (qProfile _),
    "q03_quantiles" -> (qQuantiles _),
    "q04_filter_topk" -> (qFilterTopk _),
    "q05_union_align" -> (qUnionAlign _),
    "q06_impute_mean" -> (qImputeMean _),
    "q07_zscore_anomaly" -> (qZscoreAnomaly _),
    "q08_string_index" -> (qStringIndex _),
    "q09_confusion" -> (qConfusion _),
    "q10_roc_auc" -> (qRocAuc _),
    "q11_sliding_seq" -> (qSlidingSeq _),
    "q12_seq_expand" -> (qSeqExpand _),
    "q13_pad_align" -> (qPadAlign _),
    "q14_impute_median" -> (qImputeMedian _),
    "q15_standardize" -> (qStandardize _),
    "q16_clip" -> (qClip _),
    "q17_sparse_fractions" -> (qSparseFractions _),
    "q18_youden" -> (qYouden _),
    "q19_variance" -> (qVariance _),
    "q20_text_stats" -> (qTextStats _),
    "q21_lang_id" -> (qLangId _),
    "q22_text_quality" -> (qTextQuality _),
    "q23_exact_dedup" -> (qExactDedup _),
    "q24_jaccard_pairs" -> (qJaccardPairs _),
    "q25_minhash_lsh" -> (qMinHashLsh _),
    "q26_simhash" -> (qSimHash _),
    "q27_simhash_pairs" -> (qSimHashPairs _),
    "q28_cosine_dups" -> (qCosineDups _),
    "q29_cosine_topk" -> (qCosineTopK _),
    "q30_lsh_ann" -> (qLshAnn _),
    "q31_join_revenue" -> (qJoinRevenue _),
    "q32_hash_sample" -> (qHashSample _),
    "q33_smote" -> (qSmote _),
    "q34_sample_shuffle" -> (qSampleShuffle _),
    "q35_iforest" -> (qIsolationForest _),
    "q36_linear_ae" -> (qLinearAE _),
    "q37_binary_meta" -> (qBinaryMeta _),
    "q38_grid_threshold" -> (qGridThreshold _),
    "q39_recon_mae" -> (qReconMae _),
    "q40_seq_recon_mae" -> (qSeqReconMae _),
    "q41_feature_pipeline" -> (qFeaturePipeline _),
    "q42_salted_agg" -> (qSaltedAgg _),
    "q43_sql_surface" -> (qSqlSurface _),
    "q44_seq_ae_score" -> (qSeqAeScore _),
    "q45_ivf_ann" -> (qIvfAnn _),
    "q46_tfidf" -> (qTfIdf _),
    "q47_dedup_clusters" -> (qDedupClusters _),
    "q48_quality_checks" -> (qQualityChecks _),
    "q49_binned_roc" -> (qBinnedRoc _),
    "q50_ranking" -> (qRanking _),
    "q51_cardinality" -> (qCardinality _),
    "q52_lsh_cosine_dups" -> (qLshCosineDups _),
    "q53_mlp_ae" -> (qMlpAe _),
    "q54_if_grid" -> (qIfGrid _),
    "q55_schema_align" -> (qSchemaAlign _),
    "q56_cv_grid" -> (qCvGrid _),
    "q57_vae_loss" -> (qVaeLoss _),
    "q58_sessionize" -> (qSessionize _),
    "q59_repetition" -> (qRepetition _),
    "q60_pii_redact" -> (qPiiRedact _),
    "q61_decontam" -> (qDecontam _),
    "q62_asof_join" -> (qAsofJoin _),
    "q63_psi_drift" -> (qPsiDrift _),
    "q64_ks_drift" -> (qKsDrift _),
    "q65_chi2_drift" -> (qChi2Drift _),
    "q66_rolling_feats" -> (qRollingFeats _),
    "q67_corr_matrix" -> (qCorrMatrix _),
    "q68_robust_scale" -> (qRobustScale _),
    "q69_grouped_quantiles" -> (qGroupedQuantiles _),
    "q70_roc_curve" -> (qRocCurve _),
    "q71_binned_roc_curve" -> (qBinnedRocCurve _),
    "q72_strat_sample" -> (qStratSample _),
    "q73_dim_pad" -> (qDimPad _),
    "q74_image_meta" -> (qImageMeta _),
    "q75_audio_meta" -> (qAudioMeta _),
    "q76_embed_quant" -> (qEmbedQuant _),
    "q77_seq_pack" -> (qSeqPack _),
    "q78_delta_dedup" -> (qDeltaDedup _),
    "q79_dup_spans" -> (qDupSpans _),
    "q80_zorder" -> (qZorder _),
    "q81_vocab" -> (qVocab _),
    "q82_quality_filter" -> (qQualityFilter _),
    "q83_neg_sample" -> (qNegSample _),
    "q84_label_centroids" -> (qLabelCentroids _),
    "q85_snapshot_diff" -> (qSnapshotDiff _),
    "q86_length_buckets" -> (qLengthBuckets _),
    "q87_grouped_pack" -> (qGroupedPack _),
    "q88_postings" -> (qPostings _),
    "q89_pr_curve" -> (qPrCurve _),
    "q90_calibration" -> (qCalibration _),
    "q91_salted_join" -> (qSaltedJoin _),
    "q92_temperature_mix" -> (qTemperatureMix _),
    "q93_pack_texts" -> (qPackTexts _),
    "q94_span_mask" -> (qSpanMask _),
    "q95_split_assign" -> (qSplitAssign _),
    "q96_bigram_lm" -> (qBigramLm _),
    "q97_quality_prune" -> (qQualityPrune _),
    "q98_split_leakage" -> (qSplitLeakage _),
    "q99_pivot" -> (qPivot _),
    "q100_unpivot" -> (qUnpivot _),
    "q101_resample" -> (qResample _),
    "q102_curation_pipeline" -> (qCurationPipeline _),
    "q103_deep_ae" -> (qDeepAe _),
    "q104_source_cap" -> (qSourceCap _),
    "q105_normalize" -> (qNormalize _),
    "q106_token_entropy" -> (qTokenEntropy _),
    "q107_cdc_merge" -> (qCdcMerge _),
    "q108_discretize" -> (qDiscretize _),
    "q109_target_encode" -> (qTargetEncode _),
    "q110_interval_join" -> (qIntervalJoin _),
    "q111_ewma" -> (qEwma _),
    "q112_mutual_info" -> (qMutualInfo _),
    "q113_weighted_sample" -> (qWeightedSample _),
    "q114_feature_hash" -> (qFeatureHash _),
    "q115_vocab_encode" -> (qVocabEncode _),
    "q116_chunk" -> (qChunk _),
    "q117_pca" -> (qPca _),
    "q118_trend" -> (qTrend _),
    "q119_lift_gains" -> (qLiftGains _),
    "q120_mad_score" -> (qMadScore _),
    "q121_spearman" -> (qSpearman _),
    "q122_cramers_v" -> (qCramersV _),
    "q123_benford" -> (qBenford _),
    "q124_gini" -> (qGini _),
    "q125_cusum" -> (qCusum _),
    "q126_weighted_quantiles" -> (qWeightedQuantiles _),
    "q127_rollup" -> (qRollup _),
    "q128_skyline" -> (qSkyline _),
    "q129_fuzzy_pairs" -> (qFuzzyPairs _),
    "q130_bootstrap_ci" -> (qBootstrapCi _),
    "q131_isotonic" -> (qIsotonic _),
    "q132_mahalanobis" -> (qMahalanobis _),
    "q133_theilsen" -> (qTheilSen _),
    "q134_funnel" -> (qFunnel _),
    "q135_retention" -> (qRetention _),
    "q136_hbos" -> (qHbos _),
    "q137_seasonal_resid" -> (qSeasonalResid _),
    "q138_transitions" -> (qTransitions _),
    "q139_sliding_dau" -> (qSlidingDau _),
    "q140_scd2" -> (qScd2 _),
    "q141_welch_ttest" -> (qWelch _),
    "q142_rfm" -> (qRfm _),
    "q143_pareto" -> (qPareto _),
    "q144_basket_pairs" -> (qBasket _),
    "q145_acf" -> (qAcf _),
    "q146_js_div" -> (qJsDiv _),
    "q147_heavy_hitters" -> (qHeavyHitters _),
    "q148_pagerank" -> (qPageRank _),
    "q149_kaplan_meier" -> (qKaplanMeier _),
    "q150_event_paths" -> (qEventPaths _),
    "q151_trimmed_mean" -> (qTrimmedMean _),
    "q152_mannwhitney" -> (qMannWhitney _),
    "q153_prop_ztest" -> (qPropZtest _),
    "q154_seasonal_decompose" -> (qSeasonalDecompose _),
    "q155_quantile_normalize" -> (qQuantileNormalize _),
    "q156_triangles" -> (qTriangles _),
    "q157_logrank" -> (qLogRank _),
    "q158_pettitt" -> (qPettitt _),
    "q159_pmi" -> (qPmi _),
    "q160_cube" -> (qCube _),
    "q161_kruskal" -> (qKruskal _),
    "q162_jarque_bera" -> (qJarqueBera _),
    "q163_anova" -> (qAnova _),
    "q164_bm25" -> (qBm25 _),
    "q165_ref_integrity" -> (qRefIntegrity _),
    "q166_kendall" -> (qKendall _),
    "q167_holt" -> (qHolt _),
    "q168_item_sim" -> (qItemSim _),
    "q169_fd_audit" -> (qFdAudit _),
    "q170_ndcg" -> (qNdcg _),
    "q171_stump" -> (qStump _),
    "q172_brown_forsythe" -> (qBrownForsythe _),
    "q173_ols" -> (qOls _),
    "q174_kappa" -> (qKappa _),
    "q175_vocab_overlap" -> (qVocabOverlap _),
    "q176_sample_shuffle_audit" -> (qSampleShuffleAudit _),
    "q177_ccf" -> (qCcf _),
    "q178_cohens_d" -> (qCohensD _),
    "q179_hhi" -> (qHhi _),
    "q180_lorenz" -> (qLorenz _),
    "q181_degree_hist" -> (qDegreeHist _),
    "q182_stickiness" -> (qStickiness _),
    "q183_lang_mix" -> (qLangMix _),
    "q184_cluster_size_hist" -> (qClusterSizeHist _),
    "q185_ohlc" -> (qOhlc _),
    "q186_fertility" -> (qFertility _),
    "q187_cross_source_dups" -> (qCrossSourceDups _),
    "q188_class_weights" -> (qClassWeights _),
    "q189_odds_ratio" -> (qOddsRatio _),
    "q190_quantile_sketch" -> (qQuantileSketch _),
    "q191_hll_audit" -> (qHllAudit _),
    "q192_window_suite" -> (qWindowSuite _),
    "q193_grouping_sets" -> (qGroupingSets _),
    "q194_semi_anti" -> (qSemiAnti _),
    "q195_levene" -> (qLevene _),
    "q196_rate_ratio" -> (qRateRatio _),
    "q197_gap_stats" -> (qGapStats _),
    "q198_semdedup" -> (qSemDedup _),
    "q199_perplexity_buckets" -> (qPerplexityBuckets _),
    "q200_bpe_pairs" -> (qBpePairs _),
    "q201_range_window" -> (qRangeWindow _),
    "q202_minhash_est_audit" -> (qMinhashEstAudit _),
    "q203_cmh" -> (qCmh _),
    "q204_dedup_sweep" -> (qDedupSweep _),
    "q205_purge_audit" -> (qPurgeAudit _),
    "q206_bh_fdr" -> (qBhFdr _),
    "q207_set_ops" -> (qSetOps _),
    "q208_tokenizer_coverage" -> (qTokenizerCoverage _),
    "q209_hard_negatives" -> (qHardNegatives _),
    "q210_data_card" -> (qDataCard _),
    "q211_pq_quantize" -> (qPqQuantize _),
    "q212_hybrid_rrf" -> (qHybridRrf _),
    "q213_video_meta" -> (qVideoMeta _),
    "q214_count_min" -> (qCountMinSketch _),
    "q215_ivfpq_ann" -> (qIvfPq _),
    "q216_incremental_agg" -> (qIncrementalAgg _),
    "q217_attribution" -> (qAttribution _),
    "q218_holt_winters" -> (qHoltWinters _),
    "q219_conformal" -> (qConformal _),
    "q220_forecast_backtest" -> (qForecastBacktest _),
    "q221_png_decode" -> (qPngDecode _),
    "q222_cluster_safe_split" -> (qClusterSafeSplit _),
    "q223_token_budget" -> (qTokenBudget _),
    "q224_knn_join" -> (qKnnJoin _),
    "q225_domain_weights" -> (qDomainWeights _),
    "q226_matryoshka" -> (qMatryoshka _),
    "q227_bpe_train" -> (qBpeTrain _),
    "q228_zipf_fit" -> (qZipfFit _),
    "q229_bpe_encode" -> (qBpeEncode _),
    "q230_skew_report" -> (qSkewReport _),
    "q231_ngram_novelty" -> (qNgramNovelty _),
    "q232_wav_decode" -> (qWavDecode _),
    "q233_gif_decode" -> (qGifDecode _),
    "q234_jpeg_decode" -> (qJpegDecode _),
    "q235_json_roundtrip" -> (qJsonRoundtrip _),
    "q236_winnowing" -> (qWinnowing _),
    "q237_blocking_quality" -> (qBlockingQuality _),
    "q238_compression_signal" -> (qCompressionSignal _),
    "q239_lof" -> (qLof _),
    "q240_dbscan" -> (qDbscan _),
    "q241_lsh_quality" -> (qLshQuality _),
    "q242_dp_release" -> (qDpRelease _),
    "q243_survivorship" -> (qSurvivorship _),
    "q244_kmv_sets" -> (qKmvSets _),
    "q245_woe" -> (qWoe _),
    "q246_kcore" -> (qKCore _),
    "q247_assoc_rules" -> (qAssocRules _),
    "q248_outlier_ensemble" -> (qOutlierEnsemble _),
    "q249_curation_v2" -> (qCurationV2 _),
    "q250_filtered_ann" -> (qFilteredAnn _),
    "q251_intrinsic_dim" -> (qIntrinsicDim _),
    "q252_kcenter" -> (qKCenter _),
    "q253_dedup_funnel" -> (qDedupFunnel _),
    "q254_epoch_plan" -> (qEpochPlan _),
    "q255_manifest" -> (qManifest _),
    "q256_snm_quality" -> (qSnmQuality _),
    "q257_cuped" -> (qCuped _),
    "q258_qte" -> (qQte _),
    "q259_srm" -> (qSrm _),
    "q260_ratio_delta" -> (qRatioDelta _),
    "q261_paragraph_dedup" -> (qParagraphDedup _),
    "q262_dsir" -> (qDsir _),
    "q263_silhouette" -> (qSilhouette _),
    "q264_jl_projection" -> (qJlProjection _),
    "q265_power_mde" -> (qPowerMde _),
    "q266_msprt" -> (qMsprt _),
    "q267_temp_scaling" -> (qTempScaling _),
    "q268_energy_distance" -> (qEnergyDistance _),
    "q269_neyman" -> (qNeyman _),
    "q270_label_prop" -> (qLabelProp _),
    "q271_fellegi_sunter" -> (qFellegiSunter _),
    "q272_shapley_attribution" -> (qShapleyAttribution _),
    "q273_stratified_ate" -> (qStratifiedAte _),
    "q274_ams_f2" -> (qAmsF2 _),
    "q275_iv_late" -> (qIvLate _),
    "q276_did" -> (qDid _),
    "q277_rdd" -> (qRdd _),
    "q278_raking" -> (qRaking _),
    "q279_w1_drift" -> (qW1Drift _),
    "q280_coverage_select" -> (qCoverageSelect _),
    "q281_brier" -> (qBrier _),
    "q282_collocations" -> (qCollocations _),
    "q283_pinball" -> (qPinball _),
    "q284_ht_total" -> (qHtTotal _),
    "q285_uplift" -> (qUplift _),
    "q286_retrieval_eval" -> (qRetrievalEval _),
    "q287_centroid_classifier" -> (qCentroidClassifier _),
    "q288_kneser_ney" -> (qKneserNey _),
    "q289_good_turing" -> (qGoodTuring _),
    "q290_link_prediction" -> (qLinkPrediction _),
    "q291_hill_tail" -> (qHillTail _),
    "q292_mcnemar" -> (qMcnemar _),
    "q293_hits" -> (qHits _),
    "q294_bloom_fpr" -> (qBloomFpr _),
    "q295_heaps" -> (qHeaps _),
    "q296_textrank" -> (qTextRank _),
    "q297_durbin_watson" -> (qDurbinWatson _),
    "q298_source_js" -> (qSourceJs _),
    "q299_mmr" -> (qMmr _),
    "q300_ljung_box" -> (qLjungBox _),
    "q301_gmm_em" -> (qGmmEm _),
    "q302_friedman" -> (qFriedman _),
    "q303_binseg" -> (qBinseg _),
    "q304_chow" -> (qChow _),
    "q305_containment" -> (qContainment _),
    "q306_capture_recapture" -> (qCaptureRecapture _),
    "q307_cochran_q" -> (qCochranQ _),
    "q308_page_trend" -> (qPageTrend _),
    "q309_entropy_rate" -> (qEntropyRate _),
    "q310_seq_patterns" -> (qSeqPatterns _),
    "q311_overdispersion" -> (qOverdispersion _),
    "q312_ess_weights" -> (qEssWeights _),
    "q313_graph_stats" -> (qGraphStats _),
    "q314_runs_test" -> (qRunsTest _),
    "q315_theil" -> (qTheil _),
    "q316_bradley_terry" -> (qBradleyTerry _),
    "q317_join_size_ams" -> (qJoinSizeAms _),
    "q318_k_anonymity" -> (qKAnonymity _),
    "q319_mann_kendall" -> (qMannKendall _),
    "q320_hurst" -> (qHurst _),
    "q321_color_jpeg" -> (qColorJpeg _),
    "q322_stream_pipeline" -> (qStreamPipelineTwin _)
  )

  // --- DuckDB oracle SQL ------------------------------------------- //

  private def dsumSql(x: String) = Stats.Sql.dsum(x)

  private val profileSql: String = lineitemNumerics.map { c =>
    val d = s"CAST($c AS DOUBLE)"
    val valid = s"($c IS NOT NULL AND NOT isnan($d))"
    val vd = s"(CASE WHEN $valid THEN $d END)"
    s"""SELECT '$c' AS column_name,
       | count(*) FILTER (WHERE $valid) AS n_valid,
       | count(*) - count(*) FILTER (WHERE $valid) AS n_invalid,
       | count(*) FILTER (WHERE $valid AND $d = 0.0) AS n_zero,
       | min($vd) AS min_value, max($vd) AS max_value,
       | round(${dsumSql(vd)} / count($vd), 6) AS mean_value,
       | round(${Stats.Sql.dstddevSamp(vd)}, 6) AS std_value
       | FROM lineitem""".stripMargin.replaceAll("\n", " ")
  }.mkString(" UNION ALL ") + " ORDER BY column_name"

  private val quantilesSql: String = {
    val ps = Seq(0.25, 0.5, 0.75, 0.9, 0.95, 0.99)
    // labels match qQuantiles (p0.25 style)
    val qRows = ps.map { p =>
      val label = f"p$p%.2f"
      s"SELECT '$label' AS quantile, round(quantile_cont(l_extendedprice, $p), 6) AS value FROM lineitem"
    }
    val fence =
      "SELECT 'iqr_fence' AS quantile, round(quantile_cont(l_extendedprice, 0.75) + 1.5*(quantile_cont(l_extendedprice, 0.75) - quantile_cont(l_extendedprice, 0.25)), 6) AS value FROM lineitem"
    (qRows :+ fence).mkString(" UNION ALL ") + " ORDER BY quantile"
  }

  private val zscoreAnomalySql: String = {
    val mus = anomalyFeatures.map(c =>
      s"${dsumSql(c)} / count($c) AS mu_$c, ${Stats.Sql.dstddevSamp(c)} AS sd_$c").mkString(", ")
    val terms = anomalyFeatures.map(c =>
      s"coalesce(abs((CAST($c AS DOUBLE) - mu_$c) / sd_$c), 0.0)").mkString(" + ")
    s"""WITH s AS (SELECT $mus FROM lineitem),
       | scored AS (SELECT l_orderkey, l_linenumber,
       |   ($terms) / ${anomalyFeatures.size}.0 AS score FROM lineitem, s),
       | thr AS (SELECT quantile_cont(score, 0.95) AS t FROM scored)
       | SELECT l_orderkey, l_linenumber, round(score, 6) AS anomaly_score
       | FROM scored, thr WHERE score > t
       | ORDER BY anomaly_score DESC, l_orderkey, l_linenumber""".stripMargin
      .replaceAll("\n", " ")
  }

  // tie-corrected rank-sum AUC: 2U = Σ pos_s·(2·cum_neg_below + neg_s),
  // AUC = 2U/(2PN) — integer-exact numerator, one double division
  // (mathematically equal to the trapezoid over the tie-collapsed ROC)
  private val rocAucSql: String =
    """WITH d AS (SELECT CASE WHEN l_returnflag='R' THEN 1 ELSE 0 END AS y, CAST(l_extendedprice AS DOUBLE) AS score FROM lineitem),
      | per AS (SELECT score, count(*) FILTER (WHERE y=1) AS pos, count(*) FILTER (WHERE y=0) AS neg FROM d GROUP BY score),
      | c AS (SELECT pos, neg, coalesce(sum(neg) OVER (ORDER BY score ASC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_neg_below FROM per),
      | tot AS (SELECT count(*) FILTER (WHERE y=1) AS p, count(*) FILTER (WHERE y=0) AS n FROM d)
      | SELECT round(CAST(sum(CAST(pos AS DECIMAL(38,0)) * (2*cum_neg_below + neg)) AS DOUBLE)
      |   / (2.0 * p * n), 6) AS auc
      | FROM c, tot GROUP BY p, n""".stripMargin
      .replaceAll("\n", " ")

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         | round(${dsumSql("l_quantity")}, 4) AS sum_qty,
         | round(${dsumSql("l_extendedprice")}, 4) AS sum_base_price,
         | round(${dsumSql("l_extendedprice*(1.0-l_discount)")}, 4) AS sum_disc_price,
         | round(${dsumSql("l_quantity")} / count(*), 6) AS avg_qty,
         | count(*) AS count_order
         | FROM lineitem GROUP BY l_returnflag, l_linestatus
         | ORDER BY l_returnflag, l_linestatus""".stripMargin.replaceAll("\n", " "),
    "q02_profile" -> profileSql,
    "q03_quantiles" -> quantilesSql,
    "q04_filter_topk" ->
      """SELECT l_orderkey, l_linenumber, round(l_extendedprice*(1.0-l_discount), 4) AS revenue
        | FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01' AND l_discount > 0.04
        | ORDER BY revenue DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin.replaceAll("\n", " "),
    "q05_union_align" ->
      """SELECT c_name AS name, c_acctbal AS acctbal, c_nationkey AS nationkey, c_mktsegment AS mktsegment, 'customer' AS kind FROM customer
        | UNION ALL
        | SELECT s_name, s_acctbal, s_nationkey, NULL, 'supplier' FROM supplier
        | ORDER BY kind, name""".stripMargin.replaceAll("\n", " "),
    "q06_impute_mean" -> {
      val fill = s"${dsumSql("qty_n")} / count(qty_n)"
      s"""WITH base AS (SELECT l_returnflag, CASE WHEN l_orderkey % 7 = 0 THEN NULL ELSE CAST(l_quantity AS DOUBLE) END AS qty_n FROM lineitem),
         | f AS (SELECT $fill AS fill FROM base)
         | SELECT l_returnflag, count(*) AS n,
         |  count(*) FILTER (WHERE qty_n IS NULL) AS n_filled,
         |  round(${dsumSql("coalesce(qty_n, fill)")}, 4) AS sum_imputed
         | FROM base, f GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin.replaceAll("\n", " ")
    },
    "q07_zscore_anomaly" -> zscoreAnomalySql,
    "q08_string_index" ->
      """SELECT o_orderpriority AS label, CAST(row_number() OVER (ORDER BY count(*) DESC, o_orderpriority ASC) AS BIGINT) - 1 AS label_index
        | FROM orders WHERE o_orderpriority IS NOT NULL GROUP BY o_orderpriority
        | ORDER BY label_index""".stripMargin.replaceAll("\n", " "),
    "q09_confusion" ->
      """WITH d AS (SELECT CASE WHEN l_returnflag='R' THEN 1 ELSE 0 END AS y, (l_extendedprice > 30000.0) AS p FROM lineitem),
        | c AS (SELECT count(*) FILTER (WHERE y=1 AND p) AS tp, count(*) FILTER (WHERE y=0 AND p) AS fp,
        |        count(*) FILTER (WHERE y=0 AND NOT p) AS tn, count(*) FILTER (WHERE y=1 AND NOT p) AS fn FROM d)
        | SELECT tp, fp, tn, fn,
        |  round(CAST(tp AS DOUBLE)/nullif(tp+fn,0), 6) AS detection_rate,
        |  round(CAST(fp AS DOUBLE)/nullif(fp+tn,0), 6) AS false_positive_rate,
        |  round(CAST(tp AS DOUBLE)/nullif(tp+fp,0), 6) AS precision_,
        |  round(CAST(2*tp AS DOUBLE)/nullif(2*tp+fp+fn,0), 6) AS f1 FROM c""".stripMargin.replaceAll("\n", " "),
    "q10_roc_auc" -> rocAucSql,
    "q11_sliding_seq" ->
      """WITH d AS (SELECT user_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS row_id,
        |  count(*)     OVER w AS n5,
        |  round(sum(value) OVER w, 4) AS seq_sum
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
        | SELECT user_id, row_id, seq_sum FROM d WHERE n5 = 5 ORDER BY user_id, row_id""".stripMargin.replaceAll("\n", " "),
    "q12_seq_expand" ->
      """WITH d AS (SELECT user_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS row_id,
        |  count(*)     OVER w AS n5,
        |  sum(value)   OVER w AS seq_sum
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
        | SELECT DISTINCT user_id, CAST(unnest(generate_series(row_id - 4, row_id)) AS INT) AS member_row_id
        | FROM d WHERE n5 = 5 AND seq_sum > 450.0 ORDER BY user_id, member_row_id""".stripMargin.replaceAll("\n", " "),
    "q13_pad_align" ->
      s"""WITH d AS (SELECT user_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS row_id,
        |  count(*)     OVER w AS n5,
        |  sum(value)   OVER w AS seq_sum
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)),
        | s AS (SELECT user_id, row_id, CASE WHEN n5 = 5 THEN seq_sum / 5 END AS seq_score FROM d)
        | SELECT user_id, count(*) AS n_rows,
        |  count(*) FILTER (WHERE seq_score IS NULL) AS n_padded,
        |  round(${dsumSql("seq_score")}, 4) AS score_sum
        | FROM s GROUP BY user_id ORDER BY user_id""".stripMargin.replaceAll("\n", " "),
    "q14_impute_median" -> {
      s"""WITH base AS (SELECT l_linestatus, CASE WHEN l_orderkey % 5 = 0 THEN NULL ELSE CAST(l_extendedprice AS DOUBLE) END AS price_n FROM lineitem),
         | f AS (SELECT quantile_cont(price_n, 0.5) AS fill FROM base)
         | SELECT l_linestatus, count(*) AS n,
         |  count(*) FILTER (WHERE price_n IS NULL) AS n_filled,
         |  round(${dsumSql("coalesce(price_n, fill)")}, 4) AS sum_imputed
         | FROM base, f GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin.replaceAll("\n", " ")
    },
    "q15_standardize" -> {
      val muQ = Stats.Sql.dmean("l_quantity"); val sdQ = Stats.Sql.dstddevSamp("l_quantity")
      val muP = Stats.Sql.dmean("l_extendedprice"); val sdP = Stats.Sql.dstddevSamp("l_extendedprice")
      s"""WITH s AS (SELECT $muQ AS mu_q, $sdQ AS sd_q, $muP AS mu_p, $sdP AS sd_p FROM lineitem),
         | z AS (SELECT l_returnflag,
         |   (CAST(l_quantity AS DOUBLE) - mu_q) / sd_q AS zq,
         |   (CAST(l_extendedprice AS DOUBLE) - mu_p) / sd_p AS zp
         |   FROM lineitem, s)
         | SELECT l_returnflag, count(*) AS n,
         |  round(${dsumSql("zq")}, 4) AS sum_z_qty,
         |  round(${dsumSql("zp")}, 4) AS sum_z_price,
         |  round(max(abs(zq)), 6) AS max_abs_z_qty
         | FROM z GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin.replaceAll("\n", " ")
    },
    "q16_clip" -> {
      s"""WITH b AS (SELECT quantile_cont(l_extendedprice, 0.01) AS lo, quantile_cont(l_extendedprice, 0.99) AS hi FROM lineitem),
         | c AS (SELECT least(greatest(CAST(l_extendedprice AS DOUBLE), lo), hi) AS v FROM lineitem, b)
         | SELECT round(min(v), 4) AS min_clipped, round(max(v), 4) AS max_clipped,
         |  round(${dsumSql("v")}, 4) AS sum_clipped FROM c""".stripMargin.replaceAll("\n", " ")
    },
    "q17_sparse_fractions" ->
      """WITH base AS (SELECT
        |  CASE WHEN l_orderkey % 7 = 0 THEN NULL ELSE CAST(l_quantity AS DOUBLE) END AS qty_n,
        |  CAST(l_tax AS DOUBLE) AS tax_d FROM lineitem)
        | SELECT 'qty_n' AS column_name,
        |  round(avg(CASE WHEN qty_n IS NOT NULL AND NOT isnan(qty_n) AND qty_n = 0.0 THEN 1.0 ELSE 0.0 END), 6) AS zero_frac,
        |  round(avg(CASE WHEN qty_n IS NOT NULL AND NOT isnan(qty_n) THEN 0.0 ELSE 1.0 END), 6) AS missing_frac FROM base
        | UNION ALL
        | SELECT 'tax_d',
        |  round(avg(CASE WHEN tax_d IS NOT NULL AND NOT isnan(tax_d) AND tax_d = 0.0 THEN 1.0 ELSE 0.0 END), 6),
        |  round(avg(CASE WHEN tax_d IS NOT NULL AND NOT isnan(tax_d) THEN 0.0 ELSE 1.0 END), 6) FROM base
        | ORDER BY column_name""".stripMargin.replaceAll("\n", " "),
    "q18_youden" ->
      """WITH d AS (SELECT CASE WHEN l_returnflag='R' THEN 1 ELSE 0 END AS y, CAST(l_extendedprice AS DOUBLE) AS score FROM lineitem),
        | per AS (SELECT score, count(*) FILTER (WHERE y=1) AS pos, count(*) FILTER (WHERE y=0) AS neg FROM d GROUP BY score),
        | tot AS (SELECT count(*) FILTER (WHERE y=1) AS p, count(*) FILTER (WHERE y=0) AS n FROM d),
        | roc AS (SELECT score, CAST(sum(pos) OVER w AS DOUBLE) / p AS tpr, CAST(sum(neg) OVER w AS DOUBLE) / n AS fpr
        |   FROM per, tot WINDOW w AS (ORDER BY score DESC ROWS UNBOUNDED PRECEDING))
        | SELECT round(score, 4) AS score, round(tpr - fpr, 6) AS j
        | FROM roc ORDER BY (tpr - fpr) DESC, score ASC LIMIT 1""".stripMargin.replaceAll("\n", " "),
    "q19_variance" -> {
      s"""SELECT l_returnflag,
         | round(${Stats.Sql.dvarPop("l_quantity")}, 6) AS var_pop_qty,
         | round(${Stats.Sql.dvarSamp("l_quantity")}, 6) AS var_samp_qty,
         | round(${Stats.Sql.dstddevSamp("l_discount")}, 6) AS std_disc
         | FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin.replaceAll("\n", " ")
    },
    "q20_text_stats" -> {
      import graft.text.TextOps.{Sql => T}
      s"""SELECT doc_id,
         | ${T.tokenCount("text")} AS n_tokens,
         | ${T.uniqueTokenCount("text")} AS n_uniq,
         | ${T.bpeTokenCount("text")} AS bpe_tokens,
         | CAST(len(regexp_extract_all(text, '[a-z0-9]+', 0)) AS BIGINT) AS regex_tokens,
         | ${T.fingerprint("text")} AS fingerprint
         | FROM documents ORDER BY doc_id""".stripMargin.replaceAll("\n", " ")
    },
    "q21_lang_id" -> {
      import graft.text.TextOps.{Sql => T}
      s"""SELECT lang, lang_pred, count(*) AS n
         | FROM (SELECT lang, ${T.langId("text")} AS lang_pred FROM documents)
         | GROUP BY lang, lang_pred ORDER BY lang, lang_pred""".stripMargin.replaceAll("\n", " ")
    },
    "q22_text_quality" -> {
      import graft.text.TextOps.{Sql => T}
      s"""SELECT doc_id,
         | round(${T.stopwordRatio("text")}, 6) AS stopword_ratio,
         | round(${T.avgTokenLen("text")}, 6) AS avg_token_len,
         | round(${T.uniqueRatio("text")}, 6) AS unique_ratio,
         | round(${T.qualityScore("text")}, 6) AS quality
         | FROM documents ORDER BY doc_id""".stripMargin.replaceAll("\n", " ")
    },
    "q23_exact_dedup" -> {
      import graft.text.TextOps.{Sql => T}
      s"""WITH base AS (SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 10000, text FROM documents WHERE doc_id % 10 = 0),
         | h AS (SELECT doc_id, ${T.strHash("text")} AS content_hash FROM base)
         | SELECT content_hash, count(*) AS n_dups, min(doc_id) AS canonical_id
         | FROM h GROUP BY content_hash HAVING count(*) > 1
         | ORDER BY canonical_id""".stripMargin.replaceAll("\n", " ")
    },
    "q24_jaccard_pairs" -> {
      val sh = graft.dedup.Dedup.Sql.shingles("text", 3)
      s"""WITH s AS (SELECT doc_id, $sh AS sh FROM documents),
         | e AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
         | sz AS (SELECT doc_id, len(sh) AS n_sh FROM s),
         | i AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
         |   FROM e x JOIN e y ON x.shingle = y.shingle AND x.doc_id < y.doc_id GROUP BY 1, 2),
         | v AS (SELECT a, b, inter, CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) AS jaccard
         |   FROM i JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b)
         | SELECT a, b, inter, round(jaccard, 6) AS jaccard FROM v
         | WHERE jaccard >= 0.5 ORDER BY a, b""".stripMargin.replaceAll("\n", " ")
    },
    "q25_minhash_lsh" -> {
      import graft.dedup.MinHashLSH.{Sql => M}
      val sh = graft.dedup.Dedup.Sql.shingles("text", 3)
      s"""WITH s AS (SELECT doc_id, $sh AS sh FROM documents),
         | ne AS (SELECT doc_id, sh FROM s WHERE len(sh) > 0),
         | sg AS (SELECT doc_id, sh, ${M.signatureFromShingles("sh", 16)} AS sig FROM ne),
         | bands AS (SELECT doc_id, unnest(${M.bandKeyList("sig", 16, 4)}) AS band_key,
         |   unnest(generate_series(0, 3)) AS band_idx FROM sg),
         | cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM bands x JOIN bands y
         |   ON x.band_idx = y.band_idx AND x.band_key = y.band_key AND x.doc_id < y.doc_id),
         | v AS (SELECT a, b, len(list_intersect(sa.sh, sb.sh)) AS inter, len(sa.sh) AS na, len(sb.sh) AS nb
         |   FROM cand JOIN ne sa ON sa.doc_id = a JOIN ne sb ON sb.doc_id = b)
         | SELECT a, b, inter, round(CAST(inter AS DOUBLE) / (na + nb - inter), 6) AS jaccard
         | FROM v WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.5
         | ORDER BY a, b""".stripMargin.replaceAll("\n", " ")
    },
    "q26_simhash" -> {
      import graft.dedup.SimHash.{Sql => S}
      s"""SELECT doc_id AS id, ${S.simhash("text")} AS simhash
         | FROM documents ORDER BY id""".stripMargin.replaceAll("\n", " ")
    },
    "q27_simhash_pairs" -> {
      import graft.dedup.SimHash.{Sql => S}
      s"""WITH f AS (SELECT doc_id AS id, ${S.simhash("text")} AS s FROM documents)
         | SELECT x.id AS a, y.id AS b, bit_count(xor(x.s, y.s)) AS hamming
         | FROM f x JOIN f y ON x.id < y.id
         | WHERE bit_count(xor(x.s, y.s)) <= 1 ORDER BY a, b""".stripMargin.replaceAll("\n", " ")
    },
    "q28_cosine_dups" -> {
      import graft.sim.VectorMath.{Sql => V}
      s"""WITH v AS (SELECT vec_id, embedding, ${V.norm2("embedding")} AS n2 FROM embeddings),
         | p AS (SELECT x.vec_id AS a, y.vec_id AS b,
         |   ${V.dot("x.embedding", "y.embedding")} / (sqrt(x.n2) * sqrt(y.n2)) AS cos
         |   FROM v x JOIN v y ON x.vec_id < y.vec_id)
         | SELECT a, b, round(cos, 6) AS cos FROM p WHERE cos >= 0.45
         | ORDER BY a, b""".stripMargin.replaceAll("\n", " ")
    },
    "q59_repetition" -> {
      import graft.text.TextOps.{Sql => T}
      s"""SELECT doc_id, round(${T.dupNgramFraction("text", 2)}, 6) AS dup2,
         | round(${T.dupNgramFraction("text", 3)}, 6) AS dup3
         | FROM documents ORDER BY doc_id""".stripMargin.replaceAll("\n", " ")
    },
    "q60_pii_redact" -> {
      import graft.text.Pii.{Sql => P}
      import graft.text.TextOps.{Sql => T}
      s"""WITH d AS (SELECT doc_id, text ||
         |  CASE WHEN doc_id % 7 = 0 THEN ' contact user' || doc_id || '@example.com' ELSE '' END ||
         |  CASE WHEN doc_id % 11 = 0 THEN ' from 192.168.1.77' ELSE '' END ||
         |  CASE WHEN doc_id % 13 = 0 THEN ' call +1 555 0100' ELSE '' END AS t
         |  FROM documents)
         | SELECT doc_id, ${P.emailCount("t")} AS n_email,
         |  ${P.phoneCount("t")} AS n_phone, ${P.ipv4Count("t")} AS n_ip,
         |  ${T.strHash(P.redact("t"))} AS redacted_hash
         | FROM d ORDER BY doc_id""".stripMargin.replaceAll("\n", " ")
    },
    "q61_decontam" -> {
      import graft.dedup.Dedup.{Sql => D}
      s"""WITH c AS (SELECT doc_id, ${D.shingles("text", 3)} AS sh FROM documents WHERE doc_id >= 20),
         | b AS (SELECT DISTINCT unnest(${D.shingles("text", 3)}) AS shingle FROM documents WHERE doc_id < 20),
         | x AS (SELECT doc_id, unnest(sh) AS shingle FROM c),
         | h AS (SELECT doc_id, count(*) AS n_hit FROM x JOIN b USING (shingle) GROUP BY doc_id)
         | SELECT c.doc_id, CAST(len(c.sh) AS BIGINT) AS n_shingles,
         |  coalesce(h.n_hit, 0) AS n_contaminated,
         |  CASE WHEN len(c.sh) > 0 THEN round(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / len(c.sh), 6) END AS contamination
         | FROM c LEFT JOIN h USING (doc_id) ORDER BY c.doc_id""".stripMargin.replaceAll("\n", " ")
    },
    "q62_asof_join" -> {
      s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value FROM events),
         | r AS (SELECT user_id, ts_us AS err_ts, max(value) AS err_value FROM e
         |   WHERE event_type = 'error' GROUP BY user_id, ts_us)
         | SELECT e.event_id, e.user_id, e.ts_us, e.event_type, r.err_ts, r.err_value
         | FROM e ASOF LEFT JOIN r ON e.user_id = r.user_id AND e.ts_us >= r.err_ts
         | ORDER BY e.event_id""".stripMargin.replaceAll("\n", " ")
    },
    "q58_sessionize" -> {
      val gapUs = 30L * 60 * 1000 * 1000
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tsn, value FROM events),
         | s AS (SELECT user_id, tsn, value,
         |   CASE WHEN lag(tsn) OVER w IS NULL OR tsn - lag(tsn) OVER w > $gapUs THEN 1 ELSE 0 END AS is_new,
         |   event_id FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id)),
         | t AS (SELECT user_id, tsn, value, event_id,
         |   CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY tsn, event_id ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_seq
         |   FROM s)
         | SELECT user_id, session_seq, count(*) AS n_events,
         |  min(tsn) AS start_ts, max(tsn) AS end_ts,
         |  round(${graft.core.Stats.Sql.dsum("value")}, 4) AS sum_value
         | FROM t GROUP BY user_id, session_seq ORDER BY user_id, session_seq""".stripMargin.replaceAll("\n", " ")
    },
    "q57_vae_loss" -> {
      import graft.score.VaeLoss.{Sql => V}
      s"""WITH v AS (SELECT vec_id,
         |   embedding AS x,
         |   list_transform(embedding, e -> CAST(e AS DOUBLE) * 0.9) AS xhat,
         |   list_transform(embedding, e -> CAST(e AS DOUBLE) * 0.5) AS mu,
         |   list_transform(embedding, e -> -abs(CAST(e AS DOUBLE))) AS logvar
         |  FROM embeddings),
         | l AS (SELECT vec_id, ${V.mse("x", "xhat")} AS m, ${V.klDivergence("mu", "logvar")} AS k FROM v)
         | SELECT vec_id, round(m, 6) AS mse, round(k, 6) AS kl, round(m + k, 6) AS loss
         | FROM l ORDER BY vec_id""".stripMargin.replaceAll("\n", " ")
    },
    "q56_cv_grid" -> {
      import graft.eval.GridSearch.{FoldC1, FoldC2, FoldP}
      s"""WITH d AS (SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         |   CAST(l_extendedprice AS DOUBLE) AS s,
         |   (((((l_orderkey*10 + l_linenumber) % $FoldP + $FoldP) % $FoldP) * ${FoldC1 % FoldP} + $FoldC2) % $FoldP) % 5 AS fold
         |   FROM lineitem),
         | g AS (${
             (for (p <- Seq(0.8, 0.9, 0.95); f <- 0 until 5) yield
               s"SELECT CAST($p AS DOUBLE) AS p, $f AS f, " +
                 s"(SELECT quantile_cont(s, $p) FROM d WHERE fold <> $f) AS thr"
             ).mkString(" UNION ALL ")
           }),
         | c AS (SELECT g.p, g.f AS fold, g.thr,
         |   count(*) FILTER (WHERE d.s IS NOT NULL AND NOT isnan(d.s) AND d.s > g.thr AND d.y = 1) AS tp,
         |   count(*) FILTER (WHERE d.s IS NOT NULL AND NOT isnan(d.s) AND d.s > g.thr AND d.y = 0) AS fp,
         |   count(*) FILTER (WHERE NOT (d.s IS NOT NULL AND NOT isnan(d.s) AND d.s > g.thr) AND d.y = 1) AS fn
         |   FROM d JOIN g ON d.fold = g.f GROUP BY 1, 2, 3)
         | SELECT p, fold, round(thr, 4) AS threshold, tp, fp, fn,
         |  round(CASE WHEN 2*tp+fp+fn = 0 THEN NULL ELSE 2.0*tp/(2*tp+fp+fn) END, 6) AS f1
         | FROM c ORDER BY p, fold""".stripMargin.replaceAll("\n", " ")
    },
    "q55_schema_align" ->
      s"""SELECT c_custkey, c_name, CAST(NULL AS DOUBLE) AS c_acctbal,
         | c_mktsegment, CAST(c_custkey % 2 = 0 AS INT) AS is_even
         | FROM customer ORDER BY c_custkey""".stripMargin.replaceAll("\n", " "),
    "q52_lsh_cosine_dups" -> {
      import graft.sim.Ann.{Sql => A}
      import graft.sim.VectorMath.{Sql => V}
      s"""WITH v AS (SELECT vec_id AS id, embedding AS vec, ${V.norm2("embedding")} AS n2 FROM embeddings),
         | bk AS (SELECT id, unnest(${A.lshBuckets("vec", 64, 8, 6)}) AS bucket,
         |   unnest(generate_series(0, 7)) AS tbl FROM v),
         | cand AS (SELECT DISTINCT x.id AS a, y.id AS b FROM bk x JOIN bk y
         |   ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.id < y.id),
         | p AS (SELECT a, b,
         |   ${V.dot("av.vec", "bv.vec")} / (sqrt(av.n2) * sqrt(bv.n2)) AS cos
         |   FROM cand JOIN v av ON av.id = a JOIN v bv ON bv.id = b)
         | SELECT a, b, round(cos, 6) AS cos FROM p WHERE cos >= 0.45
         | ORDER BY a, b""".stripMargin.replaceAll("\n", " ")
    },
    "q29_cosine_topk" -> {
      import graft.sim.VectorMath.{Sql => V}
      s"""WITH v AS (SELECT vec_id AS id, embedding AS vec, ${V.norm2("embedding")} AS n2 FROM embeddings),
         | p AS (SELECT x.id AS a, y.id AS b,
         |   ${V.dot("x.vec", "y.vec")} / (sqrt(x.n2) * sqrt(y.n2)) AS cos
         |   FROM v x JOIN v y ON x.id <> y.id WHERE x.id < 100),
         | r AS (SELECT a, b, cos, row_number() OVER (PARTITION BY a ORDER BY cos DESC, b ASC) AS rank FROM p)
         | SELECT a, b, rank, round(cos, 6) AS cos FROM r WHERE rank <= 3
         | ORDER BY a, rank""".stripMargin.replaceAll("\n", " ")
    },
    "q30_lsh_ann" -> {
      import graft.sim.Ann.{Sql => A}
      import graft.sim.VectorMath.{Sql => V}
      // signs materialized ONCE per row in their own CTE column (the
      // 16×4 banding would otherwise inline the 64-plane family per
      // (table, bit) element — quadratic in the SQL engine)
      s"""WITH v AS (SELECT vec_id AS id, embedding AS vec, ${V.norm2("embedding")} AS n2 FROM embeddings),
         | sg AS (SELECT id, ${A.signsList("vec", 64, 64)} AS signs FROM v),
         | bk AS (SELECT id, unnest(${A.bucketsFromSigns("signs", 16, 4)}) AS bucket,
         |   unnest(generate_series(0, 15)) AS tbl FROM sg),
         | cand AS (SELECT DISTINCT q.id AS qid, t.id AS tid FROM bk q JOIN bk t
         |   ON q.tbl = t.tbl AND q.bucket = t.bucket AND q.id <> t.id WHERE q.id < 100),
         | p AS (SELECT qid AS a, tid AS b,
         |   ${V.dot("qv.vec", "tv.vec")} / (sqrt(qv.n2) * sqrt(tv.n2)) AS cos
         |   FROM cand JOIN v qv ON qv.id = qid JOIN v tv ON tv.id = tid),
         | r AS (SELECT a, b, cos, row_number() OVER (PARTITION BY a ORDER BY cos DESC, b ASC) AS rank FROM p)
         | SELECT a, b, rank, round(cos, 6) AS cos FROM r WHERE rank <= 3
         | ORDER BY a, rank""".stripMargin.replaceAll("\n", " ")
    },
    "q31_join_revenue" ->
      s"""SELECT n_name,
         | round(${dsumSql("l_extendedprice*(1.0-l_discount)")}, 4) AS revenue,
         | count(*) AS n_lines
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         | JOIN customer ON o_custkey = c_custkey
         | JOIN nation ON c_nationkey = n_nationkey
         | JOIN region ON n_regionkey = r_regionkey
         | WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
         | GROUP BY n_name ORDER BY n_name""".stripMargin.replaceAll("\n", " "),
    "q32_hash_sample" -> {
      import graft.aug.Sampling.{Sql => Smp}
      s"""SELECT l_returnflag, count(*) AS n,
         | round(${dsumSql("l_extendedprice")}, 4) AS sum_price
         | FROM lineitem WHERE ${Smp.samplePred("l_orderkey", 0.1, 42L)}
         | GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin.replaceAll("\n", " ")
    },
    "q33_smote" -> {
      import graft.sim.VectorMath.{Sql => V}
      val P = graft.text.TextOps.P
      s"""WITH m0 AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE label = 7),
         | m AS (SELECT id, vec, CAST(row_number() OVER (ORDER BY id) AS BIGINT) - 1 AS rn,
         |   ${V.norm2("vec")} AS n2 FROM m0),
         | nn0 AS (SELECT x.rn AS arn, y.rn AS brn,
         |   (x.n2 + y.n2 - 2.0 * ${V.dot("x.vec", "y.vec")}) AS d2
         |   FROM m x JOIN m y ON x.id <> y.id),
         | nn AS (SELECT arn, brn, row_number() OVER (PARTITION BY arn ORDER BY d2 ASC, brn ASC) AS nnrank FROM nn0),
         | cnt AS (SELECT count(*) AS nm FROM m),
         | synth AS (SELECT CAST(r AS BIGINT) AS synth_id, CAST(r AS BIGINT) % nm AS arn,
         |   ((CAST(r AS BIGINT) * 2654435761 + 97) % $P + $P) % $P % 5 + 1 AS pick,
         |   CAST(((CAST(r AS BIGINT) * 1103515245 + 12345) % $P + $P) % $P AS DOUBLE) / $P.0 AS u
         |   FROM generate_series(0, 49) g(r), cnt),
         | picked AS (SELECT synth_id, s.arn, nn.brn, u FROM synth s JOIN nn
         |   ON nn.arn = s.arn AND nn.nnrank = s.pick),
         | built AS (SELECT synth_id, ma.id AS a, mb.id AS b, u,
         |   list_transform(generate_series(1, len(ma.vec)),
         |     i -> CAST(ma.vec[i] AS DOUBLE) + u * (CAST(mb.vec[i] AS DOUBLE) - CAST(ma.vec[i] AS DOUBLE))) AS vec
         |   FROM picked JOIN m ma ON ma.rn = picked.arn JOIN m mb ON mb.rn = picked.brn)
         | SELECT synth_id, a, b, round(u, 6) AS u, round(${V.norm2("vec")}, 6) AS vec_norm2
         | FROM built ORDER BY synth_id""".stripMargin.replaceAll("\n", " ")
    },
    // --- model-family self-verifying audits (the q190/q191 pattern):
    // the oracle computes the exact anchors (counts, dims, grid
    // coordinates) and PINS every in-query invariant boolean as literal
    // TRUE — a model whose guarantee breaks hash-mismatches its row
    "q34_sample_shuffle" ->
      """SELECT count(*) AS n_rows,
        | count(DISTINCT l_returnflag) AS n_classes,
        | TRUE AS frac_in_band, TRUE AS chi2_ok, TRUE AS subset_ok,
        | TRUE AS perm_ok FROM lineitem""".stripMargin
        .replaceAll("\n", " "),
    "q35_iforest" ->
      """SELECT count(*) AS n_rows, CAST(4 AS BIGINT) AS n_planted,
        | TRUE AS scores_in_unit, TRUE AS planted_above_median,
        | TRUE AS flag_frac_ok FROM lineitem""".stripMargin
        .replaceAll("\n", " "),
    "q36_linear_ae" ->
      """SELECT count(*) AS n_rows, CAST(max(len(embedding)) AS BIGINT) AS dim,
        | CAST(8 AS BIGINT) AS k, TRUE AS err_nonneg, TRUE AS err_monotone_k,
        | TRUE AS basis_orthonormal FROM embeddings""".stripMargin
        .replaceAll("\n", " "),
    "q44_seq_ae_score" ->
      s"""SELECT CAST(coalesce(sum(CASE WHEN c >= $seqT THEN c - ${seqT - 1} END), 0) AS BIGINT) AS n_seqs,
         | CAST($seqT AS BIGINT) AS seq_len, TRUE AS err_nonneg,
         | TRUE AS err_monotone_k, TRUE AS basis_orthonormal
         | FROM (SELECT count(*) AS c FROM events GROUP BY user_id)""".stripMargin
        .replaceAll("\n", " "),
    "q45_ivf_ann" ->
      """SELECT count(*) AS n_queries, CAST(3 AS BIGINT) AS k,
        | TRUE AS recall_ge_floor, TRUE AS cos_in_range
        | FROM embeddings WHERE vec_id < 100""".stripMargin
        .replaceAll("\n", " "),
    "q53_mlp_ae" ->
      """SELECT count(*) AS n_rows, TRUE AS err_nonneg,
        | TRUE AS trained_beats_init, TRUE AS flag_frac_ok
        | FROM embeddings""".stripMargin.replaceAll("\n", " "),
    "q54_if_grid" ->
      """SELECT * FROM (VALUES (50, 16, TRUE, TRUE, TRUE, TRUE),
        | (50, 64, TRUE, TRUE, TRUE, TRUE), (100, 16, TRUE, TRUE, TRUE, TRUE),
        | (100, 64, TRUE, TRUE, TRUE, TRUE))
        | AS t(num_trees, max_samples, mean_in_unit, std_nonneg, range_valid,
        | stability_in_unit) ORDER BY num_trees, max_samples""".stripMargin
        .replaceAll("\n", " "),
    "q103_deep_ae" ->
      """SELECT count(*) AS n_rows, TRUE AS err_nonneg,
        | TRUE AS trained_beats_init, TRUE AS flag_frac_ok
        | FROM embeddings""".stripMargin.replaceAll("\n", " "),
    "q117_pca" ->
      """SELECT count(*) AS n_rows, CAST(max(len(embedding)) AS BIGINT) AS dim,
        | CAST(4 AS BIGINT) AS k, TRUE AS evals_descending,
        | TRUE AS basis_orthonormal, TRUE AS var_identity_ok,
        | TRUE AS resid_nonneg FROM embeddings""".stripMargin
        .replaceAll("\n", " "),
    "q37_binary_meta" -> {
      val codes = "list_transform(list_filter(string_split(text, ''), c -> c <> ''), c -> ascii(c)::BIGINT)"
      val byteHash = s"list_reduce(list_prepend(13::BIGINT, $codes), (acc, b) -> (acc * 31 + b) % ${graft.multimodal.Binary.P})"
      val hist = s"list_transform(generate_series(0, 15), b -> len(list_filter($codes, c -> (c // 16) = b))::BIGINT)"
      s"""SELECT doc_id, 'text/plain' AS media_type,
         | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         | $byteHash AS byte_hash,
         | list_reduce(list_prepend(0::BIGINT, list_transform($hist, x -> x * x)), (a, b) -> a + b) AS hist_checksum
         | FROM documents ORDER BY doc_id""".stripMargin.replaceAll("\n", " ")
    },
    "q38_grid_threshold" -> {
      val grid = Seq(0.5, 0.6, 0.7, 0.8, 0.9, 0.95).map(p =>
        s"SELECT CAST($p AS DOUBLE) AS p, quantile_cont(s, $p) AS thr FROM d")
        .mkString(" UNION ALL ")
      s"""WITH d AS (SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         |   CAST(l_extendedprice AS DOUBLE) AS s FROM lineitem),
         | g AS ($grid),
         | c AS (SELECT p, thr,
         |   count(*) FILTER (WHERE s IS NOT NULL AND NOT isnan(s) AND s > thr AND y = 1) AS tp,
         |   count(*) FILTER (WHERE s IS NOT NULL AND NOT isnan(s) AND s > thr AND y = 0) AS fp,
         |   count(*) FILTER (WHERE NOT (s IS NOT NULL AND NOT isnan(s) AND s > thr) AND y = 1) AS fn
         |   FROM d, g GROUP BY p, thr)
         | SELECT p, round(thr, 4) AS threshold, tp, fp, fn,
         |  round(CASE WHEN 2*tp+fp+fn = 0 THEN NULL
         |    ELSE 2.0*tp/(2*tp+fp+fn) END, 6) AS f1
         | FROM c ORDER BY p""".stripMargin.replaceAll("\n", " ")
    },
    "q39_recon_mae" -> {
      val stats = lineitemNumerics.map { c =>
        s"${Stats.Sql.dmean(c)} AS mu_$c, ${Stats.Sql.dvarPop(c)} AS var_$c"
      }.mkString(", ")
      // same fold order as the Spark side: ((((0+t1)+t2)+t3)+t4)/4
      // (0.0+x == x exactly in IEEE for finite x)
      val terms = lineitemNumerics.map(c =>
        s"abs(CAST($c AS DOUBLE) - mu_$c) / greatest(var_$c, 0.000001)")
        .mkString(" + ")
      s"""WITH s AS (SELECT $stats FROM lineitem),
         | sc AS (SELECT l_orderkey, l_linenumber, ($terms) / ${lineitemNumerics.size}.0 AS score
         |   FROM lineitem, s),
         | thr AS (SELECT quantile_cont(score, 0.95) AS t FROM sc)
         | SELECT l_orderkey, l_linenumber, round(score, 6) AS recon_mae
         | FROM sc, thr WHERE score > t
         | ORDER BY recon_mae DESC, l_orderkey, l_linenumber""".stripMargin
        .replaceAll("\n", " ")
    },
    "q40_seq_recon_mae" -> {
      val mu = Stats.Sql.dmean("value")
      val vr = Stats.Sql.dvarPop("value")
      s"""WITH s AS (SELECT $mu AS mu, $vr AS vr FROM events),
         | d AS (SELECT user_id,
         |   row_number() OVER w AS row_id,
         |   count(*)     OVER v AS n5,
         |   list(CAST(value AS DOUBLE)) OVER v AS vals
         |   FROM events
         |   WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
         |          v AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
         | SELECT user_id, row_id,
         |  round(list_reduce(list_prepend(0.0::DOUBLE,
         |    list_transform(vals, x -> (0.0 + abs(x - mu) / greatest(vr, 0.000001)) / 1.0)),
         |    (acc, t) -> acc + t) / 5.0, 6) AS seq_recon_mae
         | FROM d, s WHERE n5 = 5 ORDER BY user_id, row_id""".stripMargin
        .replaceAll("\n", " ")
    },
    "q41_feature_pipeline" -> {
      def mu(x: String) = Stats.Sql.dmean(x)
      def sd(x: String) = Stats.Sql.dstddevSamp(x)
      s"""WITH base AS (SELECT l_returnflag, l_linestatus,
         |   CASE WHEN l_orderkey % 7 = 0 THEN NULL ELSE CAST(l_quantity AS DOUBLE) END AS qty_n,
         |   CAST(l_extendedprice AS DOUBLE) AS price FROM lineitem),
         | fill AS (SELECT ${Stats.Sql.dsum("qty_n")} / count(qty_n) AS f FROM base),
         | rf AS (SELECT l_returnflag AS v, CAST(row_number() OVER (ORDER BY count(*) DESC, l_returnflag ASC) AS BIGINT) - 1 AS idx
         |   FROM base WHERE l_returnflag IS NOT NULL GROUP BY l_returnflag),
         | lst AS (SELECT l_linestatus AS v, CAST(row_number() OVER (ORDER BY count(*) DESC, l_linestatus ASC) AS BIGINT) - 1 AS idx
         |   FROM base WHERE l_linestatus IS NOT NULL GROUP BY l_linestatus),
         | feat AS (SELECT b.l_returnflag, coalesce(b.qty_n, fill.f) AS f1, b.price AS f2,
         |   CAST(rf.idx AS DOUBLE) AS f3, CAST(lst.idx AS DOUBLE) AS f4
         |   FROM base b JOIN rf ON rf.v = b.l_returnflag JOIN lst ON lst.v = b.l_linestatus CROSS JOIN fill),
         | st AS (SELECT ${mu("f1")} AS mu1, ${sd("f1")} AS sd1, ${mu("f2")} AS mu2, ${sd("f2")} AS sd2,
         |   ${mu("f3")} AS mu3, ${sd("f3")} AS sd3, ${mu("f4")} AS mu4, ${sd("f4")} AS sd4 FROM feat),
         | z AS (SELECT l_returnflag,
         |   ((f1 - mu1) / sd1 + (f2 - mu2) / sd2 + (f3 - mu3) / sd3 + (f4 - mu4) / sd4) AS fs
         |   FROM feat, st)
         | SELECT l_returnflag, count(*) AS n, round(${Stats.Sql.dsum("fs")}, 4) AS feat_checksum
         | FROM z GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
        .replaceAll("\n", " ")
    },
    "q42_salted_agg" ->
      s"""SELECT l_returnflag, round(${dsumSql("l_extendedprice")}, 4) AS sum_price,
         | count(*) AS n FROM lineitem GROUP BY l_returnflag
         | ORDER BY l_returnflag""".stripMargin.replaceAll("\n", " "),
    "q43_sql_surface" ->
      s"""SELECT CAST(year(o_orderdate) AS INT) AS yr, o_orderpriority, count(*) AS n,
         | round(${dsumSql("o_totalprice")}, 4) AS sum_total
         | FROM orders WHERE o_orderstatus <> 'X'
         | GROUP BY year(o_orderdate), o_orderpriority
         | ORDER BY yr, o_orderpriority""".stripMargin.replaceAll("\n", " "),
    "q46_tfidf" -> {
      val toks = graft.text.TextOps.Sql.toks("text")
      s"""WITH d AS (SELECT doc_id AS id, text FROM documents WHERE doc_id < 50),
         | n AS (SELECT count(*) AS nd FROM d),
         | tf AS (SELECT id, unnest($toks) AS term FROM d),
         | tfc AS (SELECT id, term, count(*) AS tf FROM tf GROUP BY id, term),
         | dfc AS (SELECT term, count(*) AS df FROM tfc GROUP BY term),
         | sc AS (SELECT id, tfc.term, tf, tf * ((1.0 + nd) / (1.0 + df)) AS tfidf
         |   FROM tfc JOIN dfc ON dfc.term = tfc.term CROSS JOIN n),
         | r AS (SELECT id, term, tf, tfidf,
         |   row_number() OVER (PARTITION BY id ORDER BY tfidf DESC, term ASC) AS rank FROM sc)
         | SELECT id, rank, term, tf, round(tfidf, 6) AS tfidf
         | FROM r WHERE rank <= 3 ORDER BY id, rank""".stripMargin.replaceAll("\n", " ")
    },
    "q47_dedup_clusters" -> {
      val sh = graft.dedup.Dedup.Sql.shingles("text", 3)
      s"""WITH s AS (SELECT doc_id, $sh AS sh FROM documents),
         | e AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
         | sz AS (SELECT doc_id, len(sh) AS n_sh FROM s),
         | i AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
         |   FROM e x JOIN e y ON x.shingle = y.shingle AND x.doc_id < y.doc_id GROUP BY 1, 2),
         | p AS (SELECT a, b FROM i JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
         |   WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.5),
         | ed AS (SELECT a AS src, b AS dst FROM p UNION SELECT b, a FROM p),
         | verts AS (SELECT DISTINCT src AS id FROM ed),
         | reach AS (WITH RECURSIVE rr(id, r) AS (
         |     SELECT id, id FROM verts
         |     UNION
         |     SELECT ed.src, rr.r FROM ed JOIN rr ON rr.id = ed.dst)
         |   SELECT * FROM rr)
         | SELECT id, min(r) AS component FROM reach GROUP BY id
         | ORDER BY id""".stripMargin.replaceAll("\n", " ")
    },
    "q48_quality_checks" ->
      """WITH agg AS (SELECT
        |  avg(CASE WHEN l_quantity IS NULL OR isnan(CAST(l_quantity AS DOUBLE)) THEN 1.0 ELSE 0.0 END) AS o0,
        |  CAST(count(*) FILTER (WHERE CAST(l_discount AS DOUBLE) < 0.0 OR CAST(l_discount AS DOUBLE) > 0.05) AS DOUBLE) AS o1,
        |  CAST(count(l_orderkey) - count(DISTINCT l_orderkey) AS DOUBLE) AS o2,
        |  CAST(count(*) AS DOUBLE) AS o3,
        |  CAST(count(*) FILTER (WHERE isnan(CAST(l_extendedprice AS DOUBLE)) OR CAST(l_extendedprice AS DOUBLE) = CAST('infinity' AS DOUBLE) OR CAST(l_extendedprice AS DOUBLE) = CAST('-infinity' AS DOUBLE)) AS DOUBLE) AS o4
        |  FROM lineitem),
        | orph AS (SELECT CAST(count(*) AS DOUBLE) AS o5 FROM lineitem
        |  WHERE l_orderkey IS NOT NULL AND l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL))
        | SELECT * FROM (
        |  SELECT 'null_fraction(l_quantity)' AS "check", round(o0, 6) AS observed, CAST(0.01 AS DOUBLE) AS threshold, o0 <= 0.01 AS passed FROM agg
        |  UNION ALL SELECT 'in_range(l_discount)', round(o1, 6), CAST(0.0 AS DOUBLE), o1 <= 0.0 FROM agg
        |  UNION ALL SELECT 'unique(l_orderkey)', round(o2, 6), CAST(0.0 AS DOUBLE), o2 <= 0.0 FROM agg
        |  UNION ALL SELECT 'non_empty', round(o3, 6), CAST(1.0 AS DOUBLE), o3 >= 1.0 FROM agg
        |  UNION ALL SELECT 'finite(l_extendedprice)', round(o4, 6), CAST(0.0 AS DOUBLE), o4 <= 0.0 FROM agg
        |  UNION ALL SELECT 'referential(l_orderkey->orders)', round(o5, 6), CAST(0.0 AS DOUBLE), o5 <= 0.0 FROM orph)
        | ORDER BY "check"""".stripMargin.replaceAll("\n", " "),
    "q49_binned_roc" -> {
      val ps = (1 until 20).map(_.toDouble / 20)
      val qcols = ps.zipWithIndex.map { case (p, i) =>
        s"quantile_cont(s, $p) AS t$i"
      }.mkString(", ")
      val binExpr = ps.indices.map(i => s"CASE WHEN s > t$i THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH d AS (SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         |   CAST(l_extendedprice AS DOUBLE) AS s FROM lineitem),
         | q AS (SELECT $qcols FROM d),
         | b AS (SELECT y, ($binExpr) AS bin FROM d, q),
         | pb AS (SELECT bin, count(*) FILTER (WHERE y = 1) AS pos,
         |   count(*) FILTER (WHERE y = 0) AS neg FROM b GROUP BY bin),
         | tot AS (SELECT count(*) FILTER (WHERE y = 1) AS p, count(*) FILTER (WHERE y = 0) AS n FROM d),
         | r AS (SELECT bin, CAST(sum(pos) OVER w AS DOUBLE) / p AS tpr,
         |   CAST(sum(neg) OVER w AS DOUBLE) / n AS fpr
         |   FROM pb, tot WINDOW w AS (ORDER BY bin DESC ROWS UNBOUNDED PRECEDING)),
         | tr AS (SELECT CAST((fpr - coalesce(lag(fpr) OVER v, 0.0)) * (tpr + coalesce(lag(tpr) OVER v, 0.0)) / 2.0 AS DECIMAL(38,18)) AS area
         |   FROM r WINDOW v AS (ORDER BY fpr ASC, tpr ASC))
         | SELECT round(CAST(sum(area) AS DOUBLE), 6) AS auc_binned FROM tr""".stripMargin
        .replaceAll("\n", " ")
    },
    "q50_ranking" ->
      """WITH r AS (SELECT o_custkey, o_orderkey, o_totalprice,
        |   row_number() OVER w AS rank,
        |   round(coalesce(lag(o_totalprice) OVER w - o_totalprice, 0.0), 4) AS delta_to_prev
        |   FROM orders WHERE o_custkey < 200
        |   WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC))
        | SELECT o_custkey, rank, o_orderkey, round(o_totalprice, 4) AS total, delta_to_prev
        | FROM r WHERE rank <= 2 ORDER BY o_custkey, rank""".stripMargin.replaceAll("\n", " "),
    "q51_cardinality" ->
      """SELECT column_name, n_distinct FROM (
        |  SELECT 'l_returnflag' AS column_name, count(DISTINCT l_returnflag) AS n_distinct FROM lineitem
        |  UNION ALL SELECT 'l_linestatus', count(DISTINCT l_linestatus) FROM lineitem
        |  UNION ALL SELECT 'l_orderkey', count(DISTINCT l_orderkey) FROM lineitem
        |  UNION ALL SELECT 'l_quantity', count(DISTINCT l_quantity) FROM lineitem)
        | ORDER BY column_name""".stripMargin.replaceAll("\n", " "),
    "q63_psi_drift" -> {
      val ps = (1 until 10).map(_.toDouble / 10)
      val psArr = ps.mkString("[", ", ", "]")
      s"""WITH vb AS (
         |  SELECT 0 AS ci, CAST(l_quantity AS DOUBLE) AS v FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-01-01'
         |  UNION ALL SELECT 1, CAST(l_extendedprice AS DOUBLE) FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-01-01'
         |  UNION ALL SELECT 2, CAST(l_discount AS DOUBLE) FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-01-01'),
         | vc AS (
         |  SELECT 0 AS ci, CAST(l_quantity AS DOUBLE) AS v FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01'
         |  UNION ALL SELECT 1, CAST(l_extendedprice AS DOUBLE) FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01'
         |  UNION ALL SELECT 2, CAST(l_discount AS DOUBLE) FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01'),
         | ed AS (SELECT DISTINCT ci, round(edge, 6) AS edge FROM (
         |   SELECT ci, unnest(quantile_cont(v, $psArr)) AS edge FROM vb GROUP BY ci)),
         | bb AS (SELECT vb.ci AS ci, (SELECT count(*) FROM ed WHERE ed.ci = vb.ci AND vb.v > ed.edge) AS bin
         |   FROM vb WHERE vb.v IS NOT NULL AND NOT isnan(vb.v)),
         | cb AS (SELECT vc.ci AS ci, (SELECT count(*) FROM ed WHERE ed.ci = vc.ci AND vc.v > ed.edge) AS bin
         |   FROM vc WHERE vc.v IS NOT NULL AND NOT isnan(vc.v)),
         | nb AS (SELECT ci, bin, count(*) AS cnt_b FROM bb GROUP BY ci, bin),
         | nc AS (SELECT ci, bin, count(*) AS cnt_c FROM cb GROUP BY ci, bin),
         | j AS (SELECT coalesce(nb.ci, nc.ci) AS ci, coalesce(nb.bin, nc.bin) AS bin,
         |   coalesce(cnt_b, 0) AS cnt_b, coalesce(cnt_c, 0) AS cnt_c
         |   FROM nb FULL OUTER JOIN nc ON nb.ci = nc.ci AND nb.bin = nc.bin),
         | t AS (SELECT ci,
         |   greatest(CAST(cnt_b AS DOUBLE) / sum(cnt_b) OVER (PARTITION BY ci), 1e-6) AS pb,
         |   greatest(CAST(cnt_c AS DOUBLE) / sum(cnt_c) OVER (PARTITION BY ci), 1e-6) AS pc FROM j),
         | terms AS (SELECT ci, CAST((pc - pb) * ln(pc / pb) AS DECIMAL(38,18)) AS term FROM t),
         | p AS (SELECT ci, round(CAST(sum(term) AS DOUBLE), 6) AS psi FROM terms GROUP BY ci)
         | SELECT CASE ci WHEN 0 THEN 'l_quantity' WHEN 1 THEN 'l_extendedprice' ELSE 'l_discount' END AS feature,
         |   psi FROM p ORDER BY feature""".stripMargin.replaceAll("\n", " ")
    },
    "q64_ks_drift" ->
      """WITH u AS (
        |  SELECT CAST(value AS DOUBLE) AS v, 1 AS s FROM events WHERE event_type = 'purchase'
        |    AND value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))
        |  UNION ALL
        |  SELECT CAST(value AS DOUBLE) AS v, 0 AS s FROM events WHERE event_type = 'click'
        |    AND value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))),
        | per AS (SELECT v, count(*) FILTER (WHERE s = 1) AS ca, count(*) FILTER (WHERE s = 0) AS cb
        |   FROM u GROUP BY v),
        | tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb FROM per),
        | cum AS (SELECT sum(ca) OVER w AS cuma, sum(cb) OVER w AS cumb FROM per
        |   WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING))
        | SELECT round(max(abs(CAST(cuma AS DOUBLE) / CAST(na AS DOUBLE)
        |     - CAST(cumb AS DOUBLE) / CAST(nb AS DOUBLE))), 6) AS ks,
        |   na AS n_a, nb AS n_b FROM cum, tot GROUP BY na, nb""".stripMargin.replaceAll("\n", " "),
    "q65_chi2_drift" ->
      """WITH nb AS (SELECT event_type AS cat, count(*) AS cnt_b FROM events WHERE event_id % 2 = 0 GROUP BY 1),
        | nc AS (SELECT event_type AS cat, count(*) AS cnt_c FROM events WHERE event_id % 2 = 1 GROUP BY 1),
        | j AS (SELECT coalesce(nb.cat, nc.cat) AS cat, coalesce(cnt_b, 0) AS cnt_b, coalesce(cnt_c, 0) AS cnt_c
        |   FROM nb FULL OUTER JOIN nc ON nb.cat = nc.cat),
        | t AS (SELECT cat, cnt_b, cnt_c,
        |   CAST(sum(cnt_c) OVER () AS DOUBLE) *
        |     greatest(CAST(cnt_b AS DOUBLE) / CAST(sum(cnt_b) OVER () AS DOUBLE), 1e-6) AS e FROM j)
        | SELECT round(CAST(sum(CAST((CAST(cnt_c AS DOUBLE) - e) * (CAST(cnt_c AS DOUBLE) - e) / e AS DECIMAL(38,18))) AS DOUBLE), 6) AS chi2,
        |   CAST(count(*) AS BIGINT) AS n_categories,
        |   CAST(sum(cnt_b) AS BIGINT) AS n_base, CAST(sum(cnt_c) AS BIGINT) AS n_cur
        | FROM t""".stripMargin.replaceAll("\n", " "),
    "q66_rolling_feats" -> {
      import graft.seq.Rolling.{Sql => R}
      s"""SELECT event_id, user_id, roll_n, round(roll_avg, 6) AS roll_avg,
         |  round(roll_std, 6) AS roll_std, round(roll_min, 6) AS roll_min,
         |  round(roll_max, 6) AS roll_max, round(roll_delta, 6) AS roll_delta
         | FROM (SELECT event_id, user_id,
         |   ${R.n("value")} AS roll_n,
         |   ${R.avg("value")} AS roll_avg,
         |   ${R.std("value")} AS roll_std,
         |   min(CAST(value AS DOUBLE)) OVER wf AS roll_min,
         |   max(CAST(value AS DOUBLE)) OVER wf AS roll_max,
         |   CAST(value AS DOUBLE) - lag(CAST(value AS DOUBLE)) OVER wl AS roll_delta
         |  FROM events
         |  WINDOW wf AS (PARTITION BY user_id ORDER BY event_id ROWS 3 PRECEDING),
         |         wl AS (PARTITION BY user_id ORDER BY event_id))
         | ORDER BY event_id""".stripMargin.replaceAll("\n", " ")
    },
    "q67_corr_matrix" -> {
      val cols = lineitemNumerics
      val pairs = for { i <- cols.indices; j <- (i + 1) until cols.length }
        yield (cols(i), cols(j))
      val selects = pairs.map { case (a, b) =>
        val x = s"CAST($a AS DOUBLE)"; val y = s"CAST($b AS DOUBLE)"
        val valid = s"$a IS NOT NULL AND NOT isnan($x) AND $b IS NOT NULL AND NOT isnan($y)"
        s"""SELECT '$a' AS col_x, '$b' AS col_y,
           | round(CASE WHEN vx > 0.0 AND vy > 0.0 THEN num / (sqrt(vx) * sqrt(vy)) END, 6) AS corr
           | FROM (SELECT CAST(n AS DOUBLE) * sxx - sx * sx AS vx,
           |   CAST(n AS DOUBLE) * syy - sy * sy AS vy,
           |   CAST(n AS DOUBLE) * sxy - sx * sy AS num
           |  FROM (SELECT count(*) AS n, ${dsumSql(x)} AS sx, ${dsumSql(y)} AS sy,
           |   ${dsumSql(s"$x * $x")} AS sxx, ${dsumSql(s"$y * $y")} AS syy,
           |   ${dsumSql(s"$x * $y")} AS sxy FROM lineitem WHERE $valid))""".stripMargin
          .replaceAll("\n", " ")
      }
      selects.mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY col_x, col_y")
    },
    "q68_robust_scale" -> {
      val sq = "(CAST(l_quantity AS DOUBLE) - qq[2]) / (qq[3] - qq[1])"
      val sp = "(CAST(l_extendedprice AS DOUBLE) - qp[2]) / (qp[3] - qp[1])"
      s"""WITH q AS (SELECT
         |   quantile_cont(CAST(l_quantity AS DOUBLE), [0.25, 0.5, 0.75]) AS qq,
         |   quantile_cont(CAST(l_extendedprice AS DOUBLE), [0.25, 0.5, 0.75]) AS qp
         |  FROM lineitem)
         | SELECT l_returnflag, count(*) AS n,
         |  round(${dsumSql(sq)}, 4) AS sum_qty_scaled,
         |  round(${dsumSql(sp)}, 4) AS sum_price_scaled
         | FROM lineitem, q GROUP BY l_returnflag, qq, qp
         | ORDER BY l_returnflag""".stripMargin.replaceAll("\n", " ")
    },
    "q69_grouped_quantiles" ->
      """SELECT l_returnflag, p, round(v, 6) AS value FROM (
        |  SELECT l_returnflag, CAST(0.25 AS DOUBLE) AS p,
        |    quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25) AS v FROM lineitem GROUP BY l_returnflag
        |  UNION ALL SELECT l_returnflag, CAST(0.5 AS DOUBLE),
        |    quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) FROM lineitem GROUP BY l_returnflag
        |  UNION ALL SELECT l_returnflag, CAST(0.95 AS DOUBLE),
        |    quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95) FROM lineitem GROUP BY l_returnflag)
        | ORDER BY l_returnflag, p""".stripMargin.replaceAll("\n", " "),
    "q70_roc_curve" ->
      """WITH d AS (SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
        |   CAST(l_quantity AS DOUBLE) AS s FROM lineitem
        |   WHERE l_quantity IS NOT NULL AND NOT isnan(CAST(l_quantity AS DOUBLE))),
        | per AS (SELECT s AS score, count(*) FILTER (WHERE y = 1) AS pos,
        |   count(*) FILTER (WHERE y = 0) AS neg FROM d GROUP BY s),
        | tot AS (SELECT CAST(sum(pos) AS DOUBLE) AS p, CAST(sum(neg) AS DOUBLE) AS n FROM per),
        | c AS (SELECT score, sum(pos) OVER w AS ctp, sum(neg) OVER w AS cfp FROM per
        |   WINDOW w AS (ORDER BY score DESC ROWS UNBOUNDED PRECEDING))
        | SELECT score, round(CAST(ctp AS DOUBLE) / p, 6) AS tpr,
        |   round(CAST(cfp AS DOUBLE) / n, 6) AS fpr
        | FROM c, tot ORDER BY score""".stripMargin.replaceAll("\n", " "),
    "q71_binned_roc_curve" -> {
      val ps = (1 until 20).map(_.toDouble / 20)
      val qcols = ps.zipWithIndex.map { case (p, i) =>
        s"quantile_cont(s, $p) AS t$i"
      }.mkString(", ")
      val binExpr = ps.indices.map(i => s"CASE WHEN s > t$i THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH d AS (SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         |   CAST(l_extendedprice AS DOUBLE) AS s FROM lineitem),
         | q AS (SELECT $qcols FROM d),
         | b AS (SELECT y, ($binExpr) AS bin FROM d, q),
         | pb AS (SELECT bin, count(*) FILTER (WHERE y = 1) AS pos,
         |   count(*) FILTER (WHERE y = 0) AS neg FROM b GROUP BY bin),
         | tot AS (SELECT CAST(count(*) FILTER (WHERE y = 1) AS DOUBLE) AS p,
         |   CAST(count(*) FILTER (WHERE y = 0) AS DOUBLE) AS n FROM d)
         | SELECT CAST(bin AS BIGINT) AS bin,
         |   round(CAST(sum(pos) OVER w AS DOUBLE) / p, 6) AS tpr,
         |   round(CAST(sum(neg) OVER w AS DOUBLE) / n, 6) AS fpr
         | FROM pb, tot WINDOW w AS (ORDER BY bin DESC ROWS UNBOUNDED PRECEDING)
         | ORDER BY bin""".stripMargin.replaceAll("\n", " ")
    },
    "q72_strat_sample" -> {
      import graft.aug.Sampling.{Sql => Smp}
      s"""SELECT l_returnflag, count(*) AS n,
         | round(${dsumSql("l_extendedprice")}, 4) AS sum_price
         | FROM lineitem
         | WHERE ${Smp.stratPred("l_orderkey", "l_returnflag",
        Map("A" -> 0.05, "N" -> 0.25, "R" -> 0.5), 42L)}
         | GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
        .replaceAll("\n", " ")
    },
    "q73_dim_pad" -> {
      val weighted = "CAST(l_quantity AS DOUBLE) * 1.0" +
        " + CAST(l_extendedprice AS DOUBLE) * 2.0" +
        " + CAST(l_discount AS DOUBLE) * 3.0"
      s"""SELECT l_returnflag, count(*) AS n,
         | round(${dsumSql(s"($weighted)")}, 4) AS checksum,
         | CAST(5 AS BIGINT) AS dim
         | FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
        .replaceAll("\n", " ")
    },
    "q74_image_meta" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'gif' END AS format,
        |  CAST(doc_id % 1920 + 1 AS BIGINT) AS width,
        |  CAST(doc_id % 1080 + 1 AS BIGINT) AS height,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN (CASE WHEN doc_id % 2 = 0 THEN 8 ELSE 16 END)
        |    WHEN doc_id % 3 = 1 THEN 8 ELSE doc_id % 8 + 1 END AS BIGINT) AS bit_depth
        | FROM documents ORDER BY doc_id""".stripMargin.replaceAll("\n", " "),
    "q75_audio_meta" ->
      """WITH p AS (SELECT doc_id,
        |   ([8000, 16000, 24000, 44100, 48000])[CAST(doc_id % 5 AS INTEGER) + 1] AS rate
        |  FROM documents)
        | SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'wav' ELSE 'flac' END AS format,
        |  CAST(rate AS BIGINT) AS sample_rate,
        |  CAST(doc_id % 3 + 1 AS BIGINT) AS channels,
        |  CAST(CASE WHEN doc_id % 4 < 2 THEN 16 ELSE 24 END AS BIGINT) AS bits_per_sample,
        |  CAST((doc_id % 10 + 1) * rate // 100 AS BIGINT) AS n_frames,
        |  CAST((doc_id % 10 + 1) * 10 AS BIGINT) AS duration_ms
        | FROM p ORDER BY doc_id""".stripMargin.replaceAll("\n", " "),
    "q76_embed_quant" -> {
      import graft.sim.Quantize.{Sql => Q}
      s"""WITH s AS (SELECT vec_id, label, embedding,
         |   ${Q.scaleCol("embedding")} AS scale FROM embeddings),
         | qq AS (SELECT vec_id, label, embedding, scale,
         |   ${Q.quantize("embedding", "scale")} AS q FROM s)
         | SELECT vec_id, label, round(scale, 6) AS scale,
         |  ${Q.codeSum("q")} AS q_sum,
         |  ${Q.codeL1("q")} AS q_l1,
         |  round(${Q.dequantError("embedding", "q", "scale")}, 6) AS max_err
         | FROM qq ORDER BY vec_id""".stripMargin.replaceAll("\n", " ")
    },
    "q77_seq_pack" -> {
      val rel = s"(SELECT doc_id, ${graft.text.TextOps.Sql.bpeTokenCount("text")} AS tokens FROM documents)"
      s"SELECT * FROM (${graft.seq.Packing.Sql.packStats(rel, "doc_id", "tokens", 512L)}) ORDER BY pack_id"
    },
    "q78_delta_dedup" -> {
      val h = graft.text.TextOps.Sql.strHash("text")
      s"""WITH corpus AS (SELECT * FROM documents WHERE doc_id % 5 < 4),
         | batch AS (SELECT doc_id, lang, n_chars, $h AS h FROM documents WHERE doc_id % 5 = 4),
         | ch AS (SELECT DISTINCT $h AS h FROM corpus),
         | fresh AS (SELECT batch.* FROM batch LEFT JOIN ch ON batch.h = ch.h WHERE ch.h IS NULL),
         | reps AS (SELECT h, min(doc_id) AS rep FROM fresh GROUP BY h)
         | SELECT doc_id, lang, n_chars FROM fresh JOIN reps ON fresh.doc_id = reps.rep
         | ORDER BY doc_id""".stripMargin.replaceAll("\n", " ")
    },
    "q79_dup_spans" -> {
      val toks = graft.text.TextOps.Sql.toks("text")
      val gh = graft.text.TextOps.Sql.strHash("array_to_string(toks[pos:pos+4], ' ')")
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         | g0 AS (SELECT doc_id, unnest(generate_series(1, greatest(len(toks) - 4, 0))) AS pos, toks FROM t),
         | g AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos, $gh AS gh FROM g0),
         | dup AS (SELECT gh FROM g GROUP BY gh HAVING count(DISTINCT doc_id) >= 2),
         | ds AS (SELECT doc_id, pos FROM g JOIN dup USING (gh)),
         | cv AS (SELECT doc_id, least(5, coalesce(lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) - pos, 5)) AS contrib FROM ds),
         | cov AS (SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS covered_tokens,
         |   count(*) AS n_dup_starts FROM cv GROUP BY doc_id)
         | SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         |  coalesce(n_dup_starts, 0) AS n_dup_starts,
         |  coalesce(covered_tokens, 0) AS covered_tokens,
         |  CASE WHEN len(toks) > 0 THEN round(CAST(coalesce(covered_tokens, 0) AS DOUBLE) / len(toks), 6) ELSE 0.0 END AS coverage
         | FROM t LEFT JOIN cov ON t.doc_id = cov.doc_id ORDER BY t.doc_id""".stripMargin
        .replaceAll("\n", " ")
    },
    "q80_zorder" -> {
      import graft.core.ZOrder.{Sql => Z}
      s"""SELECT ${Z.zcell("l_partkey", "l_suppkey", 16)} AS zcell, count(*) AS n,
         | min(l_partkey) AS min_part, max(l_partkey) AS max_part,
         | min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp,
         | min(${Z.zkey("l_partkey", "l_suppkey")}) AS min_z,
         | max(${Z.zkey("l_partkey", "l_suppkey")}) AS max_z
         | FROM lineitem GROUP BY 1 ORDER BY zcell""".stripMargin
        .replaceAll("\n", " ")
    },
    "q81_vocab" ->
      s"""SELECT * FROM (${graft.text.Vocab.Sql.vocabulary("documents", "doc_id", "text", 50L)})
         | ORDER BY n DESC, token""".stripMargin.replaceAll("\n", " "),
    "q82_quality_filter" -> {
      import graft.text.TextOps.{Sql => T}
      s"""WITH st AS (SELECT source,
         |   CAST(${T.tokenCount("text")} AS BIGINT) AS n_tokens,
         |   ${T.avgTokenLen("text")} AS avg_len,
         |   ${T.stopwordRatio("text")} AS sw_ratio,
         |   ${T.dupNgramFraction("text", 2)} AS dup_frac
         |  FROM documents)
         | SELECT source, count(*) AS n_docs,
         |  count(*) FILTER (WHERE n_tokens >= 20 AND avg_len >= 2.0 AND avg_len <= 12.0
         |    AND sw_ratio > 0.0 AND dup_frac <= 0.9) AS n_kept,
         |  count(*) FILTER (WHERE NOT (n_tokens >= 20)) AS n_fail_min_tokens,
         |  count(*) FILTER (WHERE NOT (avg_len >= 2.0 AND avg_len <= 12.0)) AS n_fail_avg_token_len,
         |  count(*) FILTER (WHERE NOT (sw_ratio > 0.0)) AS n_fail_has_stopword,
         |  count(*) FILTER (WHERE NOT (dup_frac <= 0.9)) AS n_fail_low_repetition
         | FROM st GROUP BY source ORDER BY source""".stripMargin.replaceAll("\n", " ")
    },
    "q83_neg_sample" -> {
      val neg = graft.aug.Sampling.Sql.negId("anchor", "j", "cnt", 7L)
      s"""WITH nn AS (SELECT count(*) AS cnt FROM embeddings),
         | a AS (SELECT vec_id AS anchor FROM embeddings),
         | c AS (SELECT anchor, CAST(unnest(generate_series(0, 3)) AS BIGINT) AS j FROM a),
         | neg AS (SELECT anchor, j, CAST($neg AS BIGINT) AS neg_id FROM c, nn)
         | SELECT anchor, j, neg_id, CAST(e.label AS BIGINT) AS neg_label
         | FROM neg JOIN embeddings e ON e.vec_id = neg.neg_id
         | ORDER BY anchor, j""".stripMargin.replaceAll("\n", " ")
    },
    "q84_label_centroids" -> {
      val cm = graft.sim.Centroids.Sql.labelCentroids("embeddings", "label", "embedding")
      s"""WITH cm AS ($cm)
         | SELECT CAST("group" AS BIGINT) AS label, max(n) AS n,
         |  round(${dsumSql("(mean * CAST(dim AS DOUBLE))")}, 6) AS centroid_checksum,
         |  round(${dsumSql("(mean * mean)")}, 6) AS norm2
         | FROM cm GROUP BY "group" ORDER BY label""".stripMargin.replaceAll("\n", " ")
    },
    "q85_snapshot_diff" -> {
      val hA = graft.text.TextOps.Sql.strHash("text")
      val hB = graft.text.TextOps.Sql.strHash(
        "(CASE WHEN doc_id % 10 = 0 THEN text || ' rev2' ELSE text END)")
      s"""WITH a AS (SELECT doc_id, $hA AS h FROM documents WHERE doc_id % 7 <> 3),
         | b AS (SELECT doc_id, $hB AS h FROM documents),
         | j AS (SELECT coalesce(a.doc_id, b.doc_id) AS id, a.h AS ha, b.h AS hb
         |   FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
         | SELECT CASE WHEN ha IS NULL THEN 'added' WHEN hb IS NULL THEN 'removed'
         |   WHEN ha = hb THEN 'unchanged' ELSE 'changed' END AS status,
         |  count(*) AS n
         | FROM j GROUP BY 1 ORDER BY status""".stripMargin.replaceAll("\n", " ")
    },
    "q86_length_buckets" -> {
      val rel = s"(SELECT ${graft.text.TextOps.Sql.bpeTokenCount("text")} AS tokens FROM documents)"
      s"""SELECT * FROM (${graft.seq.Packing.Sql.lengthBuckets(rel, "tokens", Seq(16L, 32L, 48L, 64L))})
         | ORDER BY bucket""".stripMargin.replaceAll("\n", " ")
    },
    "q87_grouped_pack" -> {
      val bpe = graft.text.TextOps.Sql.bpeTokenCount("text")
      s"""WITH t AS (SELECT lang, doc_id, $bpe AS tokens FROM documents),
         | c AS (SELECT lang, doc_id, tokens,
         |   CAST(coalesce(sum(tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |     ROWS UNBOUNDED PRECEDING), 0) - tokens AS BIGINT) AS cum_before
         |  FROM t)
         | SELECT lang, cum_before // 512 AS pack_id, count(*) AS n_docs,
         |  CAST(sum(tokens) AS BIGINT) AS doc_tokens
         | FROM c GROUP BY lang, pack_id ORDER BY lang, pack_id""".stripMargin
        .replaceAll("\n", " ")
    },
    "q88_postings" ->
      s"""SELECT * FROM (${graft.text.Vocab.Sql.postings("documents", "doc_id", "text", 10, 5L)})
         | ORDER BY token""".stripMargin.replaceAll("\n", " "),
    "q97_quality_prune" -> {
      val q = graft.text.TextOps.Sql.qualityScore("text")
      s"""WITH sc AS (SELECT source, doc_id, n_chars, $q AS q FROM documents),
         | r AS (SELECT source, doc_id, n_chars, q,
         |   row_number() OVER (PARTITION BY source ORDER BY q DESC, doc_id) AS rk,
         |   count(*) OVER (PARTITION BY source) AS n_src FROM sc)
         | SELECT source, count(*) AS n_kept,
         |  round(${dsumSql("q")}, 6) AS quality_mass,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
         | FROM r WHERE rk <= ceil(n_src * 0.5)
         | GROUP BY source ORDER BY source""".stripMargin.replaceAll("\n", " ")
    },
    "q98_split_leakage" -> {
      val sc = graft.aug.Sampling.Sql.splitCase("doc_id",
        Seq("train" -> 0.9, "test" -> 0.1), 42L)
      val h = graft.text.TextOps.Sql.strHash(
        s"array_to_string((${graft.text.TextOps.Sql.toks("text")})[1:8], ' ')")
      s"""WITH sp AS (SELECT doc_id, text, $sc AS split FROM documents),
         | g AS (SELECT $h AS h,
         |   count(*) FILTER (WHERE split = 'train') AS n_train,
         |   count(*) FILTER (WHERE split = 'test') AS n_test
         |  FROM sp WHERE split IS NOT NULL GROUP BY h)
         | SELECT count(*) AS n_leaky_groups,
         |  CAST(coalesce(sum(n_train), 0) AS BIGINT) AS n_train_docs,
         |  CAST(coalesce(sum(n_test), 0) AS BIGINT) AS n_test_docs
         | FROM g WHERE n_train > 0 AND n_test > 0""".stripMargin
        .replaceAll("\n", " ")
    },
    "q96_bigram_lm" -> {
      val sc = graft.text.BigramLm.Sql.score("documents", "doc_id", "text")
      s"""SELECT id AS doc_id, n_bigrams, avg_logp FROM ($sc)
         | ORDER BY doc_id""".stripMargin.replaceAll("\n", " ")
    },
    "q101_resample" -> {
      s"""WITH obs AS (SELECT user_id AS key,
         |   CAST(floor(epoch(ts) / 21600) AS BIGINT) AS bucket,
         |   arg_max(CAST(value AS DOUBLE), ts) AS v
         |  FROM events GROUP BY 1, 2),
         | span AS (SELECT key, min(bucket) AS b0, max(bucket) AS b1 FROM obs GROUP BY key),
         | grid AS (SELECT key, unnest(generate_series(b0, b1)) AS bucket FROM span),
         | j AS (SELECT g.key, g.bucket, obs.v,
         |   last_value(obs.v IGNORE NULLS) OVER (PARTITION BY g.key ORDER BY g.bucket
         |     ROWS UNBOUNDED PRECEDING) AS fv
         |  FROM grid g LEFT JOIN obs ON obs.key = g.key AND obs.bucket = g.bucket)
         | SELECT key AS user_id, count(*) AS n_points,
         |  count(*) FILTER (WHERE v IS NOT NULL) AS n_observed,
         |  round(${dsumSql("fv")}, 4) AS value_checksum
         | FROM j GROUP BY key ORDER BY user_id""".stripMargin.replaceAll("\n", " ")
    },
    "q99_pivot" -> {
      def cell(status: String) =
        s"round(CAST(sum(CASE WHEN l_linestatus = '$status' THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,10)) END) AS DOUBLE), 4)"
      s"""SELECT l_returnflag, ${cell("F")} AS rev_f, ${cell("O")} AS rev_o
         | FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
        .replaceAll("\n", " ")
    },
    "q100_unpivot" -> {
      def leg(metric: String, colName: String) =
        s"""SELECT l_returnflag, '$metric' AS metric, count(*) AS n,
           | round(${dsumSql(s"CAST($colName AS DOUBLE)")}, 4) AS sum_value
           | FROM lineitem GROUP BY l_returnflag""".stripMargin.replaceAll("\n", " ")
      s"""SELECT * FROM (${leg("quantity", "l_quantity")}
         | UNION ALL ${leg("price", "l_extendedprice")}
         | UNION ALL ${leg("discount", "l_discount")})
         | ORDER BY l_returnflag, metric""".stripMargin.replaceAll("\n", " ")
    },
    "q95_split_assign" -> {
      val sc = graft.aug.Sampling.Sql.splitCase("doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), 42L)
      s"""SELECT split, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars
         | FROM (SELECT $sc AS split, n_chars FROM documents)
         | WHERE split IS NOT NULL GROUP BY split ORDER BY split""".stripMargin
        .replaceAll("\n", " ")
    },
    "q102_curation_pipeline" -> {
      import graft.text.TextOps.{Sql => T}
      import graft.dedup.Dedup.{Sql => D}
      val h = T.strHash("text")
      val sc = graft.aug.Sampling.Sql.splitCase("doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), 42L)
      val bpe = T.bpeTokenCount("text")
      s"""WITH st AS (SELECT doc_id, text,
         |   CAST(${T.tokenCount("text")} AS BIGINT) AS n_tokens,
         |   ${T.avgTokenLen("text")} AS avg_len,
         |   ${T.stopwordRatio("text")} AS sw_ratio,
         |   ${T.dupNgramFraction("text", 2)} AS dup_frac
         |  FROM documents),
         | kept AS (SELECT doc_id, text FROM st
         |   WHERE n_tokens >= 20 AND avg_len >= 2.0 AND avg_len <= 12.0
         |     AND sw_ratio > 0.0 AND dup_frac <= 0.9),
         | corpus AS (SELECT doc_id, text, $h AS h FROM kept WHERE doc_id % 5 < 4),
         | creps AS (SELECT h, min(doc_id) AS rep FROM corpus GROUP BY h),
         | corpusd AS (SELECT c.doc_id, c.text FROM corpus c JOIN creps ON c.doc_id = creps.rep),
         | batch AS (SELECT doc_id, text, $h AS h FROM kept WHERE doc_id % 5 = 4),
         | ch AS (SELECT DISTINCT h FROM corpus),
         | freshall AS (SELECT b.doc_id, b.text, b.h FROM batch b LEFT JOIN ch ON b.h = ch.h WHERE ch.h IS NULL),
         | breps AS (SELECT h, min(doc_id) AS rep FROM freshall GROUP BY h),
         | fresh AS (SELECT f.doc_id, f.text FROM freshall f JOIN breps ON f.doc_id = breps.rep),
         | merged AS (SELECT * FROM corpusd UNION ALL SELECT * FROM fresh),
         | mc AS (SELECT doc_id, text, ${D.shingles("text", 3)} AS sh FROM merged WHERE doc_id >= 20),
         | bsh AS (SELECT DISTINCT unnest(${D.shingles("text", 3)}) AS shingle FROM documents WHERE doc_id < 20),
         | x AS (SELECT doc_id, unnest(sh) AS shingle FROM mc),
         | hits AS (SELECT doc_id, count(*) AS n_hit FROM x JOIN bsh USING (shingle) GROUP BY doc_id),
         | clean AS (SELECT mc.doc_id, mc.text FROM mc LEFT JOIN hits USING (doc_id)
         |   WHERE coalesce(n_hit, 0) * 2 <= len(sh)),
         | w AS (SELECT split, doc_id, $bpe AS tokens
         |   FROM (SELECT doc_id, text, $sc AS split FROM clean) WHERE split IS NOT NULL),
         | c AS (SELECT split, doc_id, tokens,
         |   CAST(coalesce(sum(tokens) OVER (PARTITION BY split ORDER BY doc_id
         |     ROWS UNBOUNDED PRECEDING), 0) - tokens AS BIGINT) AS cum_before
         |  FROM w)
         | SELECT split, cum_before // 512 AS pack_id, count(*) AS n_docs,
         |  CAST(sum(tokens) AS BIGINT) AS doc_tokens
         | FROM c GROUP BY split, pack_id ORDER BY split, pack_id""".stripMargin
        .replaceAll("\n", " ")
    },
    "q93_pack_texts" -> {
      val bpe = graft.text.TextOps.Sql.bpeTokenCount("text")
      val h = graft.text.TextOps.Sql.strHash("text")
      s"""WITH t AS (SELECT doc_id, $bpe AS tokens, text FROM documents),
         | c AS (SELECT doc_id, tokens, text,
         |   CAST(coalesce(sum(tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING), 0) - tokens AS BIGINT) AS cum_before
         |  FROM t),
         | g AS (SELECT cum_before // 512 AS pack_id, count(*) AS n_docs,
         |   CAST(sum(tokens) AS BIGINT) AS doc_tokens,
         |   string_agg(text, ' ' ORDER BY doc_id) AS text
         |  FROM c GROUP BY 1)
         | SELECT pack_id, n_docs, doc_tokens,
         |  CAST(length(text) AS BIGINT) AS text_len, $h AS text_hash
         | FROM g ORDER BY pack_id""".stripMargin.replaceAll("\n", " ")
    },
    "q94_span_mask" -> {
      val masked = graft.text.TextOps.Sql.maskTokens("doc_id", "text", 15)
      val h = graft.text.TextOps.Sql.strHash("array_to_string(masked, ' ')")
      s"""SELECT doc_id, CAST(len(masked) AS BIGINT) AS n_tokens,
         | CAST(len(list_filter(masked, t -> t = '<mask>')) AS BIGINT) AS n_masked,
         | $h AS masked_hash
         | FROM (SELECT doc_id, $masked AS masked FROM documents)
         | ORDER BY doc_id""".stripMargin.replaceAll("\n", " ")
    },
    "q92_temperature_mix" -> {
      import graft.aug.Sampling.{Sql => Smp}
      s"""WITH cnt AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
         | tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nt,
         |   list_reduce(list_prepend(0.0::DOUBLE, list(sqrt(CAST(n AS DOUBLE)) ORDER BY lang)), (a, b) -> a + b) AS sw
         |  FROM cnt),
         | r AS (SELECT lang, least(1.0, floor(0.5 * nt) * sqrt(CAST(n AS DOUBLE)) / (sw * CAST(n AS DOUBLE))) AS rate
         |  FROM cnt, tot),
         | kept AS (SELECT d.lang, d.n_chars FROM documents d JOIN r ON d.lang = r.lang
         |  WHERE ${Smp.keyBucket("d.doc_id", 42L)} < CAST(floor(rate * 1000000) AS BIGINT))
         | SELECT lang, count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS sum_chars
         | FROM kept GROUP BY lang ORDER BY lang""".stripMargin.replaceAll("\n", " ")
    },
    "q91_salted_join" ->
      s"""SELECT p_brand, count(*) AS n,
         | round(${dsumSql("CAST(l_extendedprice AS DOUBLE) * (1.0 - CAST(l_discount AS DOUBLE))")}, 4) AS revenue
         | FROM lineitem JOIN part ON l_partkey = p_partkey
         | GROUP BY p_brand ORDER BY p_brand""".stripMargin.replaceAll("\n", " "),
    "q89_pr_curve" ->
      """WITH d AS (SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
        |   CAST(l_quantity AS DOUBLE) AS s FROM lineitem
        |   WHERE l_quantity IS NOT NULL AND NOT isnan(CAST(l_quantity AS DOUBLE))),
        | per AS (SELECT s AS score, count(*) FILTER (WHERE y = 1) AS pos,
        |   count(*) FILTER (WHERE y = 0) AS neg FROM d GROUP BY s),
        | tot AS (SELECT CAST(sum(pos) AS DOUBLE) AS p FROM per),
        | c AS (SELECT score, sum(pos) OVER w AS ctp, sum(pos + neg) OVER w AS cpred FROM per
        |   WINDOW w AS (ORDER BY score DESC ROWS UNBOUNDED PRECEDING))
        | SELECT score, round(CAST(ctp AS DOUBLE) / CAST(cpred AS DOUBLE), 6) AS precision,
        |   round(CAST(ctp AS DOUBLE) / p, 6) AS recall
        | FROM c, tot ORDER BY score""".stripMargin.replaceAll("\n", " "),
    "q90_calibration" -> {
      // DISTINCT edge table (the q63 pattern), matching the Scala
      // side's `.distinct` — a per-threshold CASE sum would diverge on
      // bin LABELS whenever two quantiles tie
      val ps = (1 until 10).map(_.toDouble / 10).mkString("[", ", ", "]")
      s"""WITH d AS (SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         |   CAST(l_extendedprice AS DOUBLE) AS s FROM lineitem),
         | ed AS (SELECT DISTINCT edge FROM
         |   (SELECT unnest(quantile_cont(s, $ps)) AS edge FROM d)),
         | b AS (SELECT y, s, (SELECT count(*) FROM ed WHERE d.s > ed.edge) AS bin FROM d)
         | SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n,
         |  round(${dsumSql("s")} / count(*), 6) AS mean_score,
         |  round(CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS pos_rate
         | FROM b GROUP BY bin ORDER BY bin""".stripMargin.replaceAll("\n", " ")
    },
    "q104_source_cap" -> {
      val b = graft.aug.Sampling.Sql.keyBucket("doc_id", 42L)
      s"""SELECT source, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_checksum
         | FROM (SELECT source, doc_id,
         |   row_number() OVER (PARTITION BY source ORDER BY $b, doc_id) AS rn
         |  FROM documents)
         | WHERE rn <= 15 GROUP BY source ORDER BY source""".stripMargin
        .replaceAll("\n", " ")
    },
    "q105_normalize" -> {
      import graft.text.TextOps.{Sql => T}
      s"""SELECT doc_id, CAST(length(text) AS BIGINT) AS n_raw,
         | CAST(length(norm) AS BIGINT) AS n_norm,
         | ${T.strHash("norm")} AS norm_hash
         | FROM (SELECT doc_id, text, ${T.normalize("text")} AS norm FROM documents)
         | ORDER BY doc_id""".stripMargin.replaceAll("\n", " ")
    },
    "q106_token_entropy" -> {
      import graft.text.TextOps.{Sql => T}
      s"""SELECT doc_id, CAST(${T.tokenCount("text")} AS BIGINT) AS n_tokens,
         | round(${T.tokenEntropy("text")}, 6) AS entropy_bits
         | FROM documents ORDER BY doc_id""".stripMargin.replaceAll("\n", " ")
    },
    "q107_cdc_merge" -> {
      s"""WITH d AS (SELECT doc_id, source, n_chars FROM documents),
         | snap AS (SELECT * FROM d WHERE doc_id % 4 < 3),
         | changes AS (
         |  SELECT doc_id - 3 AS doc_id, source, n_chars + 1000 AS n_chars,
         |    'U' AS op, 1 AS seq FROM d WHERE doc_id % 4 = 3
         |  UNION ALL SELECT doc_id - 3, source, n_chars, 'D', 2 FROM d WHERE doc_id % 8 = 3
         |  UNION ALL SELECT doc_id + 10000000, source, n_chars, 'I', 1 FROM d WHERE doc_id % 4 = 3),
         | latest AS (SELECT * FROM (SELECT c.*,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY seq DESC, op ASC) AS rn
         |   FROM changes c) WHERE rn = 1),
         | merged AS (
         |  SELECT s.doc_id, s.source, s.n_chars FROM snap s
         |   WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.doc_id = s.doc_id)
         |  UNION ALL SELECT doc_id, source, n_chars FROM latest WHERE op <> 'D')
         | SELECT source, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_checksum,
         |  CAST(sum(n_chars) AS BIGINT) AS chars_checksum
         | FROM merged GROUP BY source ORDER BY source""".stripMargin
        .replaceAll("\n", " ")
    },
    "q108_discretize" -> {
      val ps = (1 until 8).map(_.toDouble / 8).mkString("[", ", ", "]")
      s"""WITH d AS (SELECT CAST(l_extendedprice AS DOUBLE) AS s FROM lineitem),
         | ed AS (SELECT DISTINCT edge FROM
         |   (SELECT unnest(quantile_cont(s, $ps)) AS edge FROM d)),
         | l1 AS (SELECT 'l_extendedprice' AS column_name,
         |   CAST((SELECT count(*) FROM ed WHERE d.s > ed.edge) AS BIGINT) AS bin, s FROM d),
         | q AS (SELECT CAST(l_quantity AS DOUBLE) AS s FROM lineitem),
         | mm AS (SELECT min(s) AS mn, max(s) AS mx FROM q),
         | ew AS (SELECT DISTINCT mn + (mx - mn) / 6 * i AS edge
         |   FROM mm, (SELECT unnest(generate_series(1, 5)) AS i)),
         | l2 AS (SELECT 'l_quantity' AS column_name,
         |   CAST((SELECT count(*) FROM ew WHERE q.s > ew.edge) AS BIGINT) AS bin, s FROM q),
         | u AS (SELECT * FROM l1 UNION ALL SELECT * FROM l2)
         | SELECT column_name, bin, count(*) AS n, round(${dsumSql("s")}, 4) AS sum_value
         | FROM u GROUP BY column_name, bin
         | ORDER BY column_name, bin""".stripMargin.replaceAll("\n", " ")
    },
    "q109_target_encode" -> {
      val yd = "CAST(y AS DOUBLE)"
      s"""WITH p AS (SELECT p_brand, CASE WHEN p_size > 25 THEN 1 ELSE 0 END AS y FROM part),
         | pr AS (SELECT ${dsumSql(yd)} / count($yd) AS prior FROM p),
         | g AS (SELECT p_brand, count($yd) AS n, ${dsumSql(yd)} AS sum_y
         |   FROM p GROUP BY p_brand),
         | enc AS (SELECT p_brand, n,
         |   round((sum_y + 10.0 * prior) / (CAST(n AS DOUBLE) + 10.0), 6) AS enc
         |  FROM g, pr),
         | loo AS (SELECT p.p_brand,
         |   CASE WHEN g.n > 1 THEN (g.sum_y - CAST(p.y AS DOUBLE)) / CAST(g.n - 1 AS DOUBLE)
         |        ELSE prior END AS v
         |  FROM p JOIN g USING (p_brand) CROSS JOIN pr),
         | ls AS (SELECT p_brand, round(${dsumSql("v")}, 6) AS loo_checksum
         |   FROM loo GROUP BY p_brand)
         | SELECT enc.p_brand, n, enc, loo_checksum FROM enc JOIN ls USING (p_brand)
         | ORDER BY p_brand""".stripMargin.replaceAll("\n", " ")
    },
    "q110_interval_join" -> {
      s"""WITH e AS (SELECT event_id, epoch_us(ts) AS t, value FROM events),
         | a AS (SELECT event_id AS anchor_id, t AS st, t + 7200000000 AS en
         |   FROM e WHERE event_id % 97 = 0)
         | SELECT anchor_id, count(*) AS n_points,
         |  CAST(sum(e.event_id) AS BIGINT) AS id_checksum,
         |  round(${dsumSql("value")}, 4) AS value_checksum
         | FROM a JOIN e ON e.t >= a.st AND e.t < a.en
         | GROUP BY anchor_id ORDER BY anchor_id""".stripMargin.replaceAll("\n", " ")
    },
    "q111_ewma" -> {
      s"""SELECT user_id, CAST(len(l) AS BIGINT) AS n,
         | round(list_reduce(l, (s, v) -> s * 0.5 + v * 0.5), 6) AS ewma
         | FROM (SELECT user_id, list(CAST(value AS DOUBLE) ORDER BY epoch_us(ts), value) AS l
         |   FROM events GROUP BY user_id)
         | ORDER BY user_id""".stripMargin.replaceAll("\n", " ")
    },
    "q112_mutual_info" -> {
      def p(c: String) = s"(CAST($c AS DOUBLE) / n)"
      def plogp(c: String) = s"(${p(c)} * log2(${p(c)}))"
      val term = s"(${p("nab")} * log2(${p("nab")} / (${p("na")} * ${p("nb")})))"
      s"""WITH j AS (SELECT l_returnflag AS a, l_linestatus AS b, count(*) AS nab
         |   FROM lineitem
         |   WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
         |   GROUP BY 1, 2),
         | nn AS (SELECT CAST(sum(nab) AS DOUBLE) AS n FROM j),
         | ma AS (SELECT a, sum(nab) AS na FROM j GROUP BY a),
         | mb AS (SELECT b, sum(nab) AS nb FROM j GROUP BY b),
         | ha AS (SELECT 0.0 - ${dsumSql(plogp("na"))} AS h FROM ma, nn),
         | hb AS (SELECT 0.0 - ${dsumSql(plogp("nb"))} AS h FROM mb, nn),
         | mi AS (SELECT ${dsumSql(term)} AS mi
         |   FROM j JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN nn)
         | SELECT round(ha.h, 6) AS h_flag, round(hb.h, 6) AS h_status,
         |  round(mi.mi, 6) AS mi,
         |  round(CASE WHEN least(ha.h, hb.h) > 0.0 THEN mi.mi / least(ha.h, hb.h)
         |        ELSE 0.0 END, 6) AS nmi
         | FROM ha, hb, mi""".stripMargin.replaceAll("\n", " ")
    },
    "q113_weighted_sample" -> {
      val race = graft.aug.Sampling.Sql.raceKey("doc_id", "n_chars", 42L)
      s"""SELECT doc_id, source, n_chars FROM
         | (SELECT doc_id, source, n_chars FROM documents
         |   WHERE n_chars IS NOT NULL AND n_chars > 0
         |   ORDER BY $race, doc_id LIMIT 100)
         | ORDER BY doc_id""".stripMargin.replaceAll("\n", " ")
    },
    "q114_feature_hash" -> {
      import graft.text.TextOps.{Sql => T}
      s"""WITH h AS (SELECT doc_id, ${T.hashedTokens("text", 64)} AS hs FROM documents),
         | f AS (SELECT doc_id, ${T.hashFeaturesFromHashed("hs", 64)} AS f FROM h)
         | SELECT doc_id,
         |  CAST(len(list_filter(f, c -> c > 0)) AS BIGINT) AS nnz,
         |  CAST(list_reduce(list_prepend(0, f), (a, c) -> a + c) AS BIGINT) AS l1,
         |  CAST(list_reduce(list_prepend(0,
         |    list_transform(generate_series(1, 64), i -> f[i] * i)), (a, c) -> a + c) AS BIGINT) AS wsum
         | FROM f ORDER BY doc_id""".stripMargin.replaceAll("\n", " ")
    },
    "q115_vocab_encode" -> {
      import graft.text.TextOps.{Sql => T}
      val vs = 256
      s"""WITH c AS (SELECT token, count(*) AS n FROM
         |   (SELECT unnest(${T.toks("text")}) AS token FROM documents) GROUP BY token),
         | v AS (SELECT token, row_number() OVER (ORDER BY n DESC, token) - 1 AS tok_id
         |   FROM (SELECT * FROM c ORDER BY n DESC, token LIMIT $vs)),
         | p AS (SELECT doc_id, u.pos AS pos, u.tok AS token FROM
         |   (SELECT doc_id, unnest(list_transform(generate_series(1, len(t)),
         |      i -> {'pos': i, 'tok': t[i]})) AS u
         |    FROM (SELECT doc_id, ${T.toks("text")} AS t FROM documents))),
         | j AS (SELECT doc_id, pos, coalesce(tok_id, $vs) AS tid
         |   FROM p LEFT JOIN v USING (token))
         | SELECT doc_id, count(*) AS n_tokens,
         |  count(*) FILTER (WHERE tid = $vs) AS n_oov,
         |  CAST(sum(pos * tid) AS BIGINT) AS id_checksum
         | FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin
        .replaceAll("\n", " ")
    },
    "q116_chunk" -> {
      import graft.text.TextOps.{Sql => T}
      val ch = T.chunkTexts("text", 40, 8)
      s"""SELECT doc_id, CAST(u.ci AS BIGINT) AS chunk_idx,
         | CAST(${T.tokenCount("u.ch")} AS BIGINT) AS chunk_tokens,
         | ${T.strHash("u.ch")} AS chunk_hash
         | FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(chunks)),
         |    i -> {'ci': i - 1, 'ch': chunks[i]})) AS u
         |   FROM (SELECT doc_id, $ch AS chunks FROM documents))
         | ORDER BY doc_id, chunk_idx""".stripMargin.replaceAll("\n", " ")
    },
    "q118_trend" -> {
      import graft.seq.Trend.{Sql => T}
      s"""WITH b AS (SELECT user_id,
         |   CAST(epoch_us(ts) - min(epoch_us(ts)) OVER (PARTITION BY user_id) AS DOUBLE) AS x,
         |   CAST(value AS DOUBLE) AS y FROM events),
         | g AS (SELECT user_id, CAST(count(*) AS DOUBLE) AS n,
         |   ${dsumSql("x")} AS sx, ${dsumSql("y")} AS sy,
         |   ${dsumSql("x * x")} AS sxx, ${dsumSql("x * y")} AS sxy,
         |   ${dsumSql("y * y")} AS syy
         |  FROM b GROUP BY user_id)
         | SELECT user_id, CAST(n AS BIGINT) AS n,
         |  round(${T.slope} * 3600000000.0, 6) AS slope_per_hour,
         |  round(${T.intercept}, 6) AS intercept,
         |  round(${T.r2}, 6) AS r2
         | FROM g ORDER BY user_id""".stripMargin.replaceAll("\n", " ")
    },
    "q119_lift_gains" -> {
      val ps = (1 until 10).map(_.toDouble / 10).mkString("[", ", ", "]")
      s"""WITH d AS (SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         |   CAST(l_extendedprice AS DOUBLE) AS s FROM lineitem),
         | ed AS (SELECT DISTINCT edge FROM
         |   (SELECT unnest(quantile_cont(s, $ps)) AS edge FROM d)),
         | b AS (SELECT y, (SELECT count(*) FROM ed WHERE d.s > ed.edge) AS decile FROM d),
         | p AS (SELECT CAST(decile AS BIGINT) AS decile, count(*) AS n,
         |   CAST(sum(y) AS BIGINT) AS pos FROM b GROUP BY decile),
         | c AS (SELECT decile, n, pos,
         |   CAST(sum(pos) OVER (ORDER BY decile DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos,
         |   CAST(sum(n) OVER (ORDER BY decile DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n,
         |   CAST(sum(pos) OVER () AS BIGINT) AS tot_pos,
         |   CAST(sum(n) OVER () AS BIGINT) AS tot_n FROM p)
         | SELECT decile, n, pos,
         |  round(CAST(cum_pos AS DOUBLE) / tot_pos, 6) AS gain,
         |  round((CAST(cum_pos AS DOUBLE) / cum_n) / (CAST(tot_pos AS DOUBLE) / tot_n), 6) AS lift
         | FROM c ORDER BY decile DESC""".stripMargin.replaceAll("\n", " ")
    },
    "q120_mad_score" -> {
      s"""WITH d AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem),
         | m AS (SELECT quantile_cont(x, 0.5) AS med FROM d),
         | md AS (SELECT quantile_cont(abs(x - med), 0.5) AS mad FROM d, m),
         | z AS (SELECT x, med, mad, 0.6745 * (x - med) / mad AS mz FROM d, m, md)
         | SELECT count(*) AS n,
         |  count(*) FILTER (WHERE abs(mz) > 3.5) AS n_flagged,
         |  round(med, 6) AS median, round(mad, 6) AS mad,
         |  round(max(mz), 6) AS max_mz, round(min(mz), 6) AS min_mz
         | FROM z GROUP BY med, mad""".stripMargin.replaceAll("\n", " ")
    },
    "q121_spearman" -> {
      val cols = lineitemNumerics
      val pairs = for { i <- cols.indices; j <- (i + 1) until cols.length }
        yield (cols(i), cols(j))
      val selects = pairs.map { case (a, b) =>
        val valid = s"$a IS NOT NULL AND NOT isnan(CAST($a AS DOUBLE)) AND " +
          s"$b IS NOT NULL AND NOT isnan(CAST($b AS DOUBLE))"
        // average-tie rank = rank() (min rank) + (ties - 1)/2; ranks are
        // half-integers, so the decimal moment sums are exact
        s"""SELECT '$a' AS col_x, '$b' AS col_y,
           | round(CASE WHEN vx > 0.0 AND vy > 0.0 THEN num / (sqrt(vx) * sqrt(vy)) END, 6) AS rho
           | FROM (SELECT CAST(n AS DOUBLE) * sxy - sx * sy AS num,
           |   CAST(n AS DOUBLE) * sxx - sx * sx AS vx,
           |   CAST(n AS DOUBLE) * syy - sy * sy AS vy
           |  FROM (SELECT count(*) AS n, ${dsumSql("rx")} AS sx, ${dsumSql("ry")} AS sy,
           |   ${dsumSql("rx * rx")} AS sxx, ${dsumSql("ry * ry")} AS syy,
           |   ${dsumSql("rx * ry")} AS sxy
           |  FROM (SELECT
           |    rank() OVER (ORDER BY CAST($a AS DOUBLE)) + (count(*) OVER (PARTITION BY CAST($a AS DOUBLE)) - 1) / 2.0 AS rx,
           |    rank() OVER (ORDER BY CAST($b AS DOUBLE)) + (count(*) OVER (PARTITION BY CAST($b AS DOUBLE)) - 1) / 2.0 AS ry
           |   FROM lineitem WHERE $valid)))""".stripMargin.replaceAll("\n", " ")
      }
      selects.mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY col_x, col_y")
    },
    "q122_cramers_v" ->
      """WITH ct AS (SELECT o_orderstatus AS a, o_orderpriority AS b, count(*) AS o
        |   FROM orders GROUP BY 1, 2),
        | tt AS (SELECT CAST(sum(o) AS BIGINT) AS n, count(DISTINCT a) AS r,
        |   count(DISTINCT b) AS c FROM ct),
        | rt AS (SELECT a, CAST(sum(o) AS BIGINT) AS ra FROM ct GROUP BY a),
        | cl AS (SELECT b, CAST(sum(o) AS BIGINT) AS cb FROM ct GROUP BY b),
        | x AS (SELECT n, r, c, CAST(sum(CAST(
        |     (CAST(o AS DOUBLE) - CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / CAST(n AS DOUBLE))
        |     * (CAST(o AS DOUBLE) - CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / CAST(n AS DOUBLE))
        |     / (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / CAST(n AS DOUBLE))
        |    AS DECIMAL(38,18))) AS DOUBLE)
        |   + (CAST(n AS DOUBLE) - CAST(sum(CAST(
        |     CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / CAST(n AS DOUBLE)
        |    AS DECIMAL(38,18))) AS DOUBLE)) AS chi2
        |  FROM ct JOIN rt USING (a) JOIN cl USING (b) CROSS JOIN tt
        |  GROUP BY n, r, c)
        | SELECT n, r AS n_cat_a, c AS n_cat_b, round(chi2, 6) AS chi2,
        |  round(CASE WHEN least(r, c) > 1 THEN
        |    sqrt(chi2 / (CAST(n AS DOUBLE) * (CAST(least(r, c) AS DOUBLE) - 1.0))) END, 6) AS cramers_v
        | FROM x""".stripMargin.replaceAll("\n", " "),
    "q123_benford" ->
      """WITH d AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem
        |   WHERE l_extendedprice IS NOT NULL
        |     AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
        |     AND CAST(l_extendedprice AS DOUBLE) > 0),
        | dg AS (SELECT CASE WHEN rawd = 10 THEN 1 WHEN rawd = 0 THEN 9 ELSE rawd END AS digit
        |   FROM (SELECT CAST(floor(x / pow(10.0, floor(log10(x)))) AS INT) AS rawd FROM d)),
        | c AS (SELECT digit, count(*) AS n_obs FROM dg GROUP BY digit),
        | f AS (SELECT digit, n_obs,
        |   CAST(n_obs AS DOUBLE) / CAST(sum(n_obs) OVER () AS DOUBLE) AS freq_obs,
        |   log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) AS freq_exp FROM c),
        | g AS (SELECT digit, n_obs, freq_obs, freq_exp,
        |   abs(freq_obs - freq_exp) AS dev FROM f)
        | SELECT digit, n_obs, round(freq_obs, 6) AS freq_obs,
        |  round(freq_exp, 6) AS freq_exp, round(dev, 6) AS dev,
        |  round(avg(dev) OVER (), 6) AS mad
        | FROM g ORDER BY digit""".stripMargin.replaceAll("\n", " "),
    "q124_gini" -> {
      s"""WITH d AS (SELECT o_orderpriority AS g, CAST(o_totalprice AS DOUBLE) AS x,
         |   o_orderkey AS k FROM orders
         |  WHERE o_totalprice IS NOT NULL AND NOT isnan(CAST(o_totalprice AS DOUBLE))
         |    AND CAST(o_totalprice AS DOUBLE) >= 0),
         | r AS (SELECT g, x, row_number() OVER (PARTITION BY g ORDER BY x, k) AS rk FROM d)
         | SELECT g AS o_orderpriority, count(*) AS n,
         |  round(${dsumSql("x")}, 4) AS total,
         |  round(CASE WHEN count(*) > 1 AND ${dsumSql("x")} > 0.0 THEN
         |    2.0 * ${dsumSql("rk * x")} / (CAST(count(*) AS DOUBLE) * ${dsumSql("x")})
         |      - (CAST(count(*) AS DOUBLE) + 1.0) / CAST(count(*) AS DOUBLE) END, 6) AS gini
         | FROM r GROUP BY g ORDER BY g""".stripMargin.replaceAll("\n", " ")
    },
    "q125_cusum" -> {
      val mu = s"${dsumSql("v")} / count(v)"
      val sd = "sqrt((s2 - s1 * s1 / nn) / (nn - 1.0))"
      s"""WITH e AS (SELECT user_id, event_id, CAST(value AS DOUBLE) AS v FROM events),
         | st AS (SELECT s1 / nn AS mu, $sd AS sd FROM
         |   (SELECT ${dsumSql("v")} AS s1, ${dsumSql("v * v")} AS s2,
         |     CAST(count(v) AS DOUBLE) AS nn FROM e)),
         | p AS (SELECT user_id, event_id, sd,
         |   CAST(sum(CAST(v - mu - sd / 2.0 AS DECIMAL(38,10)))
         |     OVER (PARTITION BY user_id ORDER BY event_id ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS pp,
         |   CAST(sum(CAST(mu - v - sd / 2.0 AS DECIMAL(38,10)))
         |     OVER (PARTITION BY user_id ORDER BY event_id ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS qq
         |  FROM e, st),
         | c AS (SELECT user_id, sd,
         |   pp - least(0.0, min(pp) OVER (PARTITION BY user_id ORDER BY event_id ROWS UNBOUNDED PRECEDING)) AS cp,
         |   qq - least(0.0, min(qq) OVER (PARTITION BY user_id ORDER BY event_id ROWS UNBOUNDED PRECEDING)) AS cn
         |  FROM p)
         | SELECT user_id, count(*) AS n,
         |  CAST(sum(CASE WHEN cp > 4.0 * sd OR cn > 4.0 * sd THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
         |  round(max(cp), 6) AS max_pos, round(max(cn), 6) AS max_neg
         | FROM c GROUP BY user_id ORDER BY user_id""".stripMargin.replaceAll("\n", " ")
    },
    "q126_weighted_quantiles" ->
      """WITH d AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v,
        |   CAST(l_quantity AS BIGINT) AS w FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
        |    AND l_quantity IS NOT NULL AND CAST(l_quantity AS BIGINT) > 0),
        | pv AS (SELECT v, CAST(sum(w) AS BIGINT) AS w FROM d GROUP BY v),
        | sc AS (SELECT v, sum(w) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum FROM pv),
        | t AS (SELECT CAST(sum(w) AS BIGINT) AS tot FROM pv)
        | SELECT CAST(p.p AS DOUBLE) AS p, round(min(sc.v), 6) AS value
        | FROM (VALUES (0.25), (0.5), (0.75), (0.95)) AS p(p), sc, t
        | WHERE sc.cum >= greatest(CAST(ceil(CAST(p.p AS DOUBLE) * tot) AS BIGINT), 1)
        | GROUP BY p.p ORDER BY p""".stripMargin.replaceAll("\n", " "),
    "q127_rollup" -> {
      s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
         |  round(${dsumSql("l_extendedprice")}, 4) AS sum_price,
         |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS lvl
         | FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         | ORDER BY lvl, l_returnflag, l_linestatus""".stripMargin.replaceAll("\n", " ")
    },
    "q128_skyline" ->
      """SELECT s.p_partkey, s.p_name, s.p_size, s.p_retailprice
        | FROM part s WHERE NOT EXISTS (
        |  SELECT 1 FROM part t
        |  WHERE CAST(t.p_retailprice AS DOUBLE) >= CAST(s.p_retailprice AS DOUBLE)
        |    AND CAST(t.p_size AS DOUBLE) <= CAST(s.p_size AS DOUBLE)
        |    AND (CAST(t.p_retailprice AS DOUBLE) > CAST(s.p_retailprice AS DOUBLE)
        |      OR CAST(t.p_size AS DOUBLE) < CAST(s.p_size AS DOUBLE)))
        | ORDER BY s.p_partkey""".stripMargin.replaceAll("\n", " "),
    "q129_fuzzy_pairs" ->
      """WITH k AS (SELECT substr(c_name, 1, 16) AS block, c_custkey AS id,
        |   c_name AS name FROM customer),
        | p AS (SELECT a.block, a.id AS id_a, b.id AS id_b,
        |   levenshtein(a.name, b.name) AS dist
        |  FROM k a JOIN k b ON a.block = b.block AND a.id < b.id
        |  WHERE levenshtein(a.name, b.name) <= 1)
        | SELECT block, count(*) AS n_pairs, count(DISTINCT id_a) AS n_left,
        |  CAST(max(dist) AS INTEGER) AS max_dist
        | FROM p GROUP BY block ORDER BY block""".stripMargin.replaceAll("\n", " "),
    "q130_bootstrap_ci" -> {
      val reps = 40
      // rank literals via the SAME IEEE expressions meanCi evaluates at
      // runtime (0.025·40 rounds ABOVE 1.0, so loRank is 2, not 1)
      val loR = math.ceil(0.025 * reps).toLong.max(1L)
      val hiR = math.ceil((1.0 - 0.025) * reps).toLong
      val bucket = graft.aug.Sampling.Sql.keyBucket("(k * 64 + r)", 42L)
      val w = graft.aug.Bootstrap.Sql.poissonWeight(bucket)
      s"""WITH base AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
         |   CAST(o_totalprice AS DOUBLE) AS x FROM orders
         |  WHERE o_totalprice IS NOT NULL AND NOT isnan(CAST(o_totalprice AS DOUBLE))),
         | reps AS (SELECT CAST(range AS BIGINT) AS r FROM range($reps)),
         | wts AS (SELECT r, x, $w AS w FROM base, reps),
         | means AS (SELECT r, ${dsumSql("w * x")} / CAST(sum(w) AS DOUBLE) AS m
         |   FROM wts GROUP BY r),
         | rk AS (SELECT m, row_number() OVER (ORDER BY m, r) AS rk FROM means),
         | bd AS (SELECT min(CASE WHEN rk = $loR THEN m END) AS lo,
         |   min(CASE WHEN rk = $hiR THEN m END) AS hi FROM rk),
         | e AS (SELECT ${dsumSql("x")} / count(x) AS est, count(*) AS n FROM base)
         | SELECT round(est, 6) AS estimate, round(lo, 6) AS ci_lo,
         |  round(hi, 6) AS ci_hi, n, CAST($reps AS BIGINT) AS n_replicates
         | FROM e, bd""".stripMargin.replaceAll("\n", " ")
    },
    "q131_isotonic" -> {
      val ps = (1 until 20).map(_.toDouble / 20).mkString("[", ", ", "]")
      s"""WITH d AS (SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         |   CAST(l_extendedprice AS DOUBLE) AS s FROM lineitem),
         | ed AS (SELECT DISTINCT edge FROM
         |   (SELECT unnest(quantile_cont(s, $ps)) AS edge FROM d)),
         | b AS (SELECT y, (SELECT count(*) FROM ed WHERE d.s > ed.edge) AS bin FROM d),
         | pb AS (SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n,
         |   CAST(sum(y) AS BIGINT) AS pos FROM b GROUP BY bin),
         | spans AS (SELECT j.bin AS j, l.bin AS l,
         |   CAST(sum(m.pos) AS DOUBLE) / CAST(sum(m.n) AS DOUBLE) AS rate
         |  FROM pb j, pb l, pb m
         |  WHERE j.bin <= l.bin AND m.bin >= j.bin AND m.bin <= l.bin
         |  GROUP BY j.bin, l.bin),
         | mm AS (SELECT pb.bin AS bin, s.j AS j, min(s.rate) AS minr
         |   FROM pb, spans s WHERE s.j <= pb.bin AND s.l >= pb.bin
         |   GROUP BY pb.bin, s.j),
         | f AS (SELECT bin, max(minr) AS fitted FROM mm GROUP BY bin)
         | SELECT pb.bin, pb.n, pb.pos,
         |  round(CAST(pb.pos AS DOUBLE) / CAST(pb.n AS DOUBLE), 6) AS rate,
         |  round(f.fitted, 6) AS fitted
         | FROM pb JOIN f USING (bin) ORDER BY bin""".stripMargin.replaceAll("\n", " ")
    },
    "q132_mahalanobis" -> {
      val valid = "l_quantity IS NOT NULL AND NOT isnan(CAST(l_quantity AS DOUBLE)) " +
        "AND l_extendedprice IS NOT NULL AND NOT isnan(CAST(l_extendedprice AS DOUBLE))"
      val det = "(vx * vy - cxy * cxy)"
      s"""WITH cc AS (SELECT CAST(l_quantity AS DOUBLE) AS x,
         |   CAST(l_extendedprice AS DOUBLE) AS y FROM lineitem WHERE $valid),
         | m AS (SELECT ${Stats.Sql.dmean("x")} AS mx, ${Stats.Sql.dmean("y")} AS my,
         |   ${Stats.Sql.dvarSamp("x")} AS vx, ${Stats.Sql.dvarSamp("y")} AS vy,
         |   ${Stats.Sql.dcovSamp("x", "y", "count(*)")} AS cxy FROM cc),
         | sc AS (SELECT
         |   (vy / $det) * (x - mx) * (x - mx)
         |   + ((-cxy) / $det) * (x - mx) * (y - my)
         |   + ((-cxy) / $det) * (y - my) * (x - mx)
         |   + (vx / $det) * (y - my) * (y - my) AS d2
         |  FROM cc, m)
         | SELECT count(*) AS n,
         |  count(CASE WHEN d2 > CAST(9.21034 AS DOUBLE) THEN 1 END) AS n_flagged,
         |  round(max(d2), 6) AS max_d2,
         |  round(${dsumSql("d2")} / count(*), 6) AS mean_d2
         | FROM sc""".stripMargin.replaceAll("\n", " ")
    },
    "q133_theilsen" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, CAST(value AS DOUBLE) AS v
        |   FROM events),
        | p AS (SELECT a.user_id AS user_id,
        |   (b.v - a.v) / (CAST(b.us - a.us AS DOUBLE) / 3600000000.0) AS slope
        |  FROM e a JOIN e b ON a.user_id = b.user_id AND a.us < b.us)
        | SELECT user_id, count(*) AS n_pairs,
        |  round(quantile_cont(slope, 0.5), 6) AS med_slope_per_hr
        | FROM p GROUP BY user_id ORDER BY user_id""".stripMargin.replaceAll("\n", " "),
    "q134_funnel" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
        | s1 AS (SELECT user_id, min(us) AS t1 FROM e
        |   WHERE event_type = 'view' GROUP BY user_id),
        | s2 AS (SELECT e.user_id AS user_id, min(us) AS t2, min(t1) AS t1
        |   FROM e JOIN s1 USING (user_id)
        |   WHERE event_type = 'click' AND us > t1 GROUP BY e.user_id),
        | s3 AS (SELECT e.user_id AS user_id, min(us) AS t3, min(t1) AS t1
        |   FROM e JOIN s2 USING (user_id)
        |   WHERE event_type = 'purchase' AND us > t2 GROUP BY e.user_id),
        | c AS (SELECT * FROM s3 WHERE t3 - t1 <= 604800000000)
        | SELECT (SELECT count(*) FROM s1) AS step1_users,
        |  (SELECT count(*) FROM s2) AS step2_users,
        |  (SELECT count(*) FROM s3) AS step3_users,
        |  (SELECT count(*) FROM c) AS completed_7d,
        |  round(CAST((SELECT count(*) FROM s2) AS DOUBLE)
        |    / CAST((SELECT count(*) FROM s1) AS DOUBLE), 6) AS conv_1_2,
        |  round(CAST((SELECT count(*) FROM s3) AS DOUBLE)
        |    / CAST((SELECT count(*) FROM s2) AS DOUBLE), 6) AS conv_2_3""".stripMargin
        .replaceAll("\n", " "),
    "q135_retention" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        | f AS (SELECT user_id, min(us) AS first_us FROM e GROUP BY user_id),
        | act AS (SELECT DISTINCT first_us // 604800000000 AS cohort_wk,
        |   (us - first_us) // 604800000000 AS week_offset, e.user_id AS user_id
        |  FROM e JOIN f USING (user_id)),
        | bc AS (SELECT cohort_wk, week_offset,
        |   count(DISTINCT user_id) AS n_active FROM act GROUP BY 1, 2),
        | b0 AS (SELECT cohort_wk, n_active AS cohort_size FROM bc
        |   WHERE week_offset = 0)
        | SELECT bc.cohort_wk, bc.week_offset, bc.n_active, b0.cohort_size,
        |  round(CAST(bc.n_active AS DOUBLE) / CAST(b0.cohort_size AS DOUBLE), 6)
        |   AS retention
        | FROM bc JOIN b0 USING (cohort_wk)
        | ORDER BY cohort_wk, week_offset""".stripMargin.replaceAll("\n", " "),
    "q136_hbos" -> {
      val cols = lineitemNumerics
      val eCtes = cols.zipWithIndex.map { case (c, i) =>
        s"e$i AS (SELECT DISTINCT mn + (mx - mn) / 10 * i AS edge FROM (SELECT min(CAST($c AS DOUBLE)) AS mn, max(CAST($c AS DOUBLE)) AS mx FROM lineitem), (SELECT unnest(generate_series(1, 9)) AS i))"
      }
      val bCtes = cols.zipWithIndex.map { case (c, i) =>
        s"b$i AS (SELECT (SELECT count(*) FROM e$i WHERE CAST(l.$c AS DOUBLE) > e$i.edge) AS bin, count(*) AS nb FROM lineitem l GROUP BY 1)"
      }
      val binSel = cols.zipWithIndex.map { case (c, i) =>
        s"(SELECT count(*) FROM e$i WHERE CAST(l.$c AS DOUBLE) > e$i.edge) AS bin$i"
      }.mkString(", ")
      val scoreTerms = cols.indices.map { i =>
        s"(- log10(greatest(CAST(b$i.nb AS DOUBLE), 1.0) / CAST(t.n AS DOUBLE)))"
      }.mkString(" + ")
      val joins = cols.indices.map(i => s"JOIN b$i ON r.bin$i = b$i.bin").mkString(" ")
      s"""WITH t AS (SELECT count(*) AS n FROM lineitem),
         | ${eCtes.mkString(", ")},
         | ${bCtes.mkString(", ")},
         | r AS (SELECT $binSel FROM lineitem l),
         | sc AS (SELECT $scoreTerms AS score FROM r $joins CROSS JOIN t)
         | SELECT count(*) AS n,
         |  round(${dsumSql("score")} / count(*), 6) AS mean_score,
         |  round(max(score), 6) AS max_score,
         |  round(min(score), 6) AS min_score FROM sc""".stripMargin
        .replaceAll("\n", " ")
    },
    "q137_seasonal_resid" ->
      s"""WITH e AS (SELECT user_id,
         |   ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow,
         |   CAST(value AS DOUBLE) AS v FROM events),
         | p AS (SELECT user_id, dow, ${Stats.Sql.dmean("v")} AS mu
         |   FROM e GROUP BY user_id, dow),
         | r AS (SELECT e.user_id AS user_id, v - mu AS resid
         |   FROM e JOIN p USING (user_id, dow)),
         | g AS (SELECT ${Stats.Sql.dstddevSamp("resid")} AS sd FROM r)
         | SELECT user_id, count(*) AS n,
         |  count(CASE WHEN abs(resid) > 2.0 * sd THEN 1 END) AS n_flagged,
         |  round(max(abs(resid)), 6) AS max_abs_resid
         | FROM r, g GROUP BY user_id, sd ORDER BY user_id""".stripMargin
        .replaceAll("\n", " "),
    "q138_transitions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
        |   FROM events),
        | p AS (SELECT event_type AS cur, lead(event_type)
        |   OVER (PARTITION BY user_id ORDER BY us, event_id) AS next FROM e),
        | c AS (SELECT cur, next, count(*) AS n FROM p
        |   WHERE next IS NOT NULL GROUP BY cur, next)
        | SELECT cur, next, n,
        |  round(CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY cur) AS DOUBLE), 6) AS p
        | FROM c ORDER BY cur, next""".stripMargin.replaceAll("\n", " "),
    "q139_sliding_dau" ->
      """WITH act AS (SELECT DISTINCT user_id,
        |   epoch_us(ts) // 86400000000 AS d FROM events),
        | days AS (SELECT DISTINCT d AS report_d FROM act)
        | SELECT report_d, count(DISTINCT user_id) AS dau_7d
        | FROM act JOIN days ON report_d >= d AND report_d <= d + 6
        | GROUP BY report_d ORDER BY report_d""".stripMargin.replaceAll("\n", " "),
    "q140_scd2" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
        |   FROM events),
        | iv AS (SELECT user_id, us, lead(us)
        |   OVER (PARTITION BY user_id ORDER BY us, event_id) AS valid_to FROM e)
        | SELECT user_id, count(*) AS n_versions,
        |  count(CASE WHEN valid_to IS NULL THEN 1 END) AS n_current,
        |  CAST(sum(CASE WHEN valid_to IS NOT NULL THEN valid_to - us END) AS BIGINT)
        |   AS total_covered_us,
        |  max(valid_to - us) AS max_interval_us
        | FROM iv GROUP BY user_id ORDER BY user_id""".stripMargin.replaceAll("\n", " "),
    "q141_welch_ttest" -> {
      val se = "(s21/n1 + s22/n2)"
      s"""WITH o AS (SELECT o_orderpriority AS g, CAST(o_totalprice AS DOUBLE) AS v
         |   FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
         | a AS (SELECT g, CAST(count(*) AS DOUBLE) AS n,
         |   ${Stats.Sql.dmean("v")} AS m, ${Stats.Sql.dvarSamp("v")} AS s2
         |   FROM o GROUP BY g),
         | w AS (SELECT
         |   max(CASE WHEN g = '1-URGENT' THEN n END) AS n1,
         |   max(CASE WHEN g = '1-URGENT' THEN m END) AS m1,
         |   max(CASE WHEN g = '1-URGENT' THEN s2 END) AS s21,
         |   max(CASE WHEN g = '5-LOW' THEN n END) AS n2,
         |   max(CASE WHEN g = '5-LOW' THEN m END) AS m2,
         |   max(CASE WHEN g = '5-LOW' THEN s2 END) AS s22 FROM a)
         | SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
         |  round(m1, 6) AS mean1, round(m2, 6) AS mean2,
         |  round((m1 - m2) / sqrt$se, 6) AS t_stat,
         |  round($se * $se / ((s21/n1) * (s21/n1) / (n1 - 1.0) +
         |    (s22/n2) * (s22/n2) / (n2 - 1.0)), 6) AS df
         | FROM w""".stripMargin.replaceAll("\n", " ")
    },
    "q142_rfm" -> {
      val ps = "[0.2, 0.4, 0.6, 0.8]"
      s"""WITH per AS (SELECT o_custkey,
         |   max(epoch_us(o_orderdate) // 86400000000) AS last_day,
         |   count(*) AS freq,
         |   ${dsumSql("CAST(o_totalprice AS DOUBLE)")} AS monetary
         |  FROM orders GROUP BY o_custkey),
         | mx AS (SELECT max(last_day) AS md FROM per),
         | rfm AS (SELECT CAST(md - last_day AS DOUBLE) AS recency,
         |   CAST(freq AS DOUBLE) AS frequency, monetary FROM per, mx),
         | er AS (SELECT DISTINCT edge FROM
         |   (SELECT unnest(quantile_cont(recency, $ps)) AS edge FROM rfm)),
         | ef AS (SELECT DISTINCT edge FROM
         |   (SELECT unnest(quantile_cont(frequency, $ps)) AS edge FROM rfm)),
         | em AS (SELECT DISTINCT edge FROM
         |   (SELECT unnest(quantile_cont(monetary, $ps)) AS edge FROM rfm)),
         | b AS (SELECT
         |   (SELECT count(*) FROM er WHERE rfm.recency > er.edge) AS r,
         |   (SELECT count(*) FROM ef WHERE rfm.frequency > ef.edge) AS f,
         |   (SELECT count(*) FROM em WHERE rfm.monetary > em.edge) AS m,
         |   monetary FROM rfm)
         | SELECT r, f, m, count(*) AS n_customers,
         |  round(${dsumSql("monetary")}, 4) AS sum_monetary
         | FROM b GROUP BY r, f, m ORDER BY r, f, m""".stripMargin
        .replaceAll("\n", " ")
    },
    "q143_pareto" ->
      """WITH pr AS (SELECT l_partkey,
        |   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem GROUP BY l_partkey),
        | t AS (SELECT sum(cents) AS tot FROM pr),
        | c AS (SELECT cents,
        |   sum(cents) OVER (ORDER BY cents DESC, l_partkey) AS incl FROM pr),
        | k AS (SELECT cents, tot,
        |   CASE WHEN incl * 5 <= tot * 4 THEN 'A'
        |        WHEN incl * 20 <= tot * 19 THEN 'B' ELSE 'C' END AS cls
        |  FROM c, t)
        | SELECT cls, count(*) AS n_parts,
        |  CAST(sum(cents) AS BIGINT) AS revenue_cents,
        |  round(CAST(sum(cents) AS DOUBLE) / CAST(max(tot) AS DOUBLE), 6) AS rev_share
        | FROM k GROUP BY cls ORDER BY cls""".stripMargin.replaceAll("\n", " "),
    "q144_basket_pairs" ->
      """WITH ob AS (SELECT DISTINCT l_orderkey AS ok, p_brand AS b
        |   FROM lineitem JOIN part ON l_partkey = p_partkey),
        | no AS (SELECT CAST(count(DISTINCT ok) AS DOUBLE) AS n FROM ob),
        | s AS (SELECT b, count(*) AS nb FROM ob GROUP BY b),
        | pr AS (SELECT x.b AS b1, y.b AS b2, count(*) AS n_pair
        |   FROM ob x JOIN ob y ON x.ok = y.ok AND x.b < y.b GROUP BY x.b, y.b)
        | SELECT b1, b2, n_pair,
        |  round(CAST(n_pair AS DOUBLE) / n, 6) AS support,
        |  round(CAST(n_pair AS DOUBLE) / CAST(s1.nb AS DOUBLE), 6) AS confidence,
        |  round(CAST(n_pair AS DOUBLE) * n /
        |    (CAST(s1.nb AS DOUBLE) * CAST(s2.nb AS DOUBLE)), 6) AS lift
        | FROM pr JOIN s s1 ON pr.b1 = s1.b JOIN s s2 ON pr.b2 = s2.b
        | CROSS JOIN no WHERE n_pair >= 5
        | ORDER BY b1, b2""".stripMargin.replaceAll("\n", " "),
    "q145_acf" ->
      s"""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS d, count(*) AS c
         |   FROM events GROUP BY 1),
         | m AS (SELECT ${Stats.Sql.dmean("CAST(c AS DOUBLE)")} AS mu FROM daily),
         | dev AS (SELECT d, CAST(c AS DOUBLE) - mu AS x FROM daily, m),
         | dn AS (SELECT ${dsumSql("x * x")} AS denom FROM dev),
         | ks AS (SELECT CAST(unnest(generate_series(1, 7)) AS INT) AS k)
         | SELECT k, count(*) AS n_pairs,
         |  round(${dsumSql("a.x * b.x")} / max(denom), 6) AS acf
         | FROM dev a CROSS JOIN ks JOIN dev b ON b.d = a.d + k CROSS JOIN dn
         | GROUP BY k ORDER BY k""".stripMargin.replaceAll("\n", " "),
    "q146_js_div" -> {
      val ps = (1 until 10).map(_.toDouble / 10).mkString("[", ", ", "]")
      s"""WITH b AS (SELECT l_returnflag AS g, CAST(l_extendedprice AS DOUBLE) AS v
         |   FROM lineitem WHERE l_returnflag IN ('R', 'N')),
         | ed AS (SELECT DISTINCT edge FROM
         |   (SELECT unnest(quantile_cont(v, $ps)) AS edge FROM b)),
         | bn AS (SELECT (SELECT count(*) FROM ed WHERE b.v > ed.edge) AS bin,
         |   count(CASE WHEN g = 'R' THEN 1 END) AS na,
         |   count(CASE WHEN g = 'N' THEN 1 END) AS nb
         |  FROM b GROUP BY 1),
         | t AS (SELECT sum(na) AS ta, sum(nb) AS tb FROM bn),
         | pq AS (SELECT CAST(na AS DOUBLE) / CAST(ta AS DOUBLE) AS p,
         |   CAST(nb AS DOUBLE) / CAST(tb AS DOUBLE) AS q FROM bn, t),
         | mm AS (SELECT p, q, (p + q) * 0.5 AS m FROM pq),
         | tm AS (SELECT
         |   CASE WHEN p > 0 THEN p * ln(p / m) ELSE 0.0 END AS tp,
         |   CASE WHEN q > 0 THEN q * ln(q / m) ELSE 0.0 END AS tq FROM mm)
         | SELECT count(*) AS n_bins,
         |  round((${dsumSql("tp")} + ${dsumSql("tq")}) * 0.5, 6) AS js_divergence
         | FROM tm""".stripMargin.replaceAll("\n", " ")
    },
    "q147_heavy_hitters" ->
      """WITH t AS (SELECT count(*) AS n FROM documents),
        | g AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang)
        | SELECT lang, cnt,
        |  round(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE), 6) AS share
        | FROM g, t WHERE cnt * 5 > n ORDER BY lang""".stripMargin
        .replaceAll("\n", " "),
    "q148_pagerank" -> {
      val d = "CAST(0.85 AS DOUBLE)"
      val iterCtes = (1 to 10).map { t =>
        s"r$t AS (SELECT n.node, (CAST(1.0 AS DOUBLE) - $d) / nn + $d * coalesce(c.s, CAST(0.0 AS DOUBLE)) AS r FROM nodes n CROSS JOIN nc LEFT JOIN (SELECT e.dst AS cnode, ${dsumSql("r.r * CAST(e.w AS DOUBLE) / CAST(e.outw AS DOUBLE)")} AS s FROM e JOIN r${t - 1} r ON e.src = r.node GROUP BY e.dst) c ON n.node = c.cnode)"
      }
      s"""WITH base AS (SELECT c_nationkey AS src, s_nationkey AS dst, count(*) AS w
         |   FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |   JOIN customer ON o_custkey = c_custkey
         |   JOIN supplier ON l_suppkey = s_suppkey
         |   GROUP BY c_nationkey, s_nationkey),
         | ow AS (SELECT src, sum(w) AS outw FROM base GROUP BY src),
         | e AS (SELECT base.src, base.dst, base.w, ow.outw
         |   FROM base JOIN ow ON base.src = ow.src),
         | nodes AS (SELECT src AS node FROM base UNION SELECT dst FROM base),
         | nc AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM nodes),
         | r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn AS r
         |   FROM nodes CROSS JOIN nc),
         | ${iterCtes.mkString(", ")}
         | SELECT n_name, round(r.r, 6) AS pr
         | FROM r10 r JOIN nation ON r.node = n_nationkey
         | ORDER BY n_name""".stripMargin.replaceAll("\n", " ")
    },
    "q149_kaplan_meier" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
        | mx AS (SELECT max(us) AS mu FROM e),
        | per AS (SELECT user_id, min(us) AS first_us,
        |   min(CASE WHEN event_type = 'purchase' THEN us END) AS p_us
        |  FROM e GROUP BY user_id),
        | dd AS (SELECT (coalesce(p_us, mu) - first_us) // 86400000000 AS t,
        |   CASE WHEN p_us IS NOT NULL THEN 1 ELSE 0 END AS died FROM per, mx),
        | tb AS (SELECT t, sum(died) AS d, count(*) AS c FROM dd GROUP BY t),
        | tt AS (SELECT sum(c) AS tot FROM tb),
        | ar AS (SELECT t, d, c, tot - coalesce(sum(c) OVER
        |   (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |   AS n_at_risk FROM tb, tt),
        | tm AS (SELECT t, d, n_at_risk,
        |   CASE WHEN d < n_at_risk THEN CAST(ln(CAST(1.0 AS DOUBLE) -
        |     CAST(d AS DOUBLE) / CAST(n_at_risk AS DOUBLE)) AS DECIMAL(38,18)) END AS term,
        |   CASE WHEN d >= n_at_risk THEN 1 ELSE 0 END AS zf FROM ar),
        | sv AS (SELECT t, d, n_at_risk, max(zf) OVER (ORDER BY t) AS zcum,
        |   sum(term) OVER (ORDER BY t) AS cum FROM tm)
        | SELECT t, CAST(n_at_risk AS BIGINT) AS n_at_risk, CAST(d AS BIGINT) AS d,
        |  round(CASE WHEN zcum = 1 THEN CAST(0.0 AS DOUBLE)
        |    ELSE exp(CAST(cum AS DOUBLE)) END, 6) AS survival
        | FROM sv WHERE d > 0 ORDER BY t""".stripMargin.replaceAll("\n", " "),
    "q150_event_paths" ->
      """WITH e AS (SELECT user_id, event_type,
        |   row_number() OVER (PARTITION BY user_id
        |     ORDER BY epoch_us(ts), event_id) AS rn FROM events),
        | p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        |   FROM e WHERE rn <= 5 GROUP BY user_id)
        | SELECT path, count(*) AS n_users FROM p GROUP BY path
        | ORDER BY n_users DESC, path LIMIT 20""".stripMargin
        .replaceAll("\n", " "),
    "q151_trimmed_mean" -> {
      val kept = "CASE WHEN v >= p10 AND v <= p90 THEN v END"
      val wins = "CASE WHEN v < p10 THEN p10 WHEN v > p90 THEN p90 ELSE v END"
      s"""WITH b AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem),
         | q AS (SELECT quantile_cont(v, 0.1) AS p10,
         |   quantile_cont(v, 0.9) AS p90 FROM b)
         | SELECT count(*) AS n, count($kept) AS n_kept,
         |  round(${Stats.Sql.dmean(kept)}, 6) AS trimmed_mean,
         |  round(${Stats.Sql.dmean(wins)}, 6) AS winsorized_mean
         | FROM b, q""".stripMargin.replaceAll("\n", " ")
    },
    "q152_mannwhitney" -> {
      val u1 = "(r1 - n1 * (n1 + 1.0) / 2.0)"
      val sigma = "sqrt(n1 * n2 / 12.0 * ((n1 + n2 + 1.0) - tsum / ((n1 + n2) * (n1 + n2 - 1.0))))"
      val t3 = "CAST(t AS DOUBLE) * CAST(t AS DOUBLE) * CAST(t AS DOUBLE) - CAST(t AS DOUBLE)"
      s"""WITH o AS (SELECT o_orderpriority AS g, CAST(o_totalprice AS DOUBLE) AS v
         |   FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
         | rk AS (SELECT g, rank() OVER (ORDER BY v) +
         |   (count(*) OVER (PARTITION BY v) - 1) / 2.0 AS rk FROM o),
         | ag AS (SELECT
         |   CAST(count(CASE WHEN g = '1-URGENT' THEN 1 END) AS DOUBLE) AS n1,
         |   CAST(count(CASE WHEN g = '5-LOW' THEN 1 END) AS DOUBLE) AS n2,
         |   ${dsumSql("CASE WHEN g = '1-URGENT' THEN rk END")} AS r1 FROM rk),
         | tc AS (SELECT ${dsumSql(t3)} AS tsum
         |   FROM (SELECT count(*) AS t FROM o GROUP BY v))
         | SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
         |  round($u1, 4) AS u1,
         |  round(($u1 - n1 * n2 / 2.0) / $sigma, 6) AS z
         | FROM ag, tc""".stripMargin.replaceAll("\n", " ")
    },
    "q153_prop_ztest" -> {
      val pp = "((x1 + x2) / (n1 + n2))"
      s"""WITH per AS (SELECT user_id,
         |   CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 2
         |     THEN 1 ELSE 0 END AS conv
         |  FROM events GROUP BY user_id),
         | ag AS (SELECT
         |   CAST(count(CASE WHEN user_id % 2 = 0 THEN 1 END) AS DOUBLE) AS n1,
         |   CAST(count(CASE WHEN user_id % 2 <> 0 THEN 1 END) AS DOUBLE) AS n2,
         |   CAST(sum(CASE WHEN user_id % 2 = 0 THEN conv END) AS DOUBLE) AS x1,
         |   CAST(sum(CASE WHEN user_id % 2 <> 0 THEN conv END) AS DOUBLE) AS x2
         |  FROM per)
         | SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
         |  CAST(x1 AS BIGINT) AS conv1, CAST(x2 AS BIGINT) AS conv2,
         |  round(x1 / n1, 6) AS p1, round(x2 / n2, 6) AS p2,
         |  round(CASE WHEN $pp > 0.0 AND $pp < 1.0 THEN
         |    (x1 / n1 - x2 / n2) / sqrt($pp * (CAST(1.0 AS DOUBLE) - $pp) *
         |    (CAST(1.0 AS DOUBLE) / n1 + CAST(1.0 AS DOUBLE) / n2)) END, 6) AS z
         | FROM ag""".stripMargin.replaceAll("\n", " ")
    },
    "q154_seasonal_decompose" ->
      s"""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS d, count(*) AS c
         |   FROM events GROUP BY 1),
         | t AS (SELECT d, c, CASE WHEN count(*) OVER w = 7
         |   THEN CAST(sum(c) OVER w AS DOUBLE) / 7.0 END AS trend
         |  FROM daily
         |  WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
         | dt AS (SELECT d, c, trend, CAST(c AS DOUBLE) - trend AS detr,
         |   (d + 4) % 7 AS dow FROM t),
         | se AS (SELECT dow, ${Stats.Sql.dmean("detr")} AS seasonal
         |   FROM dt GROUP BY dow)
         | SELECT d, c, round(trend, 6) AS trend,
         |  round(seasonal, 6) AS seasonal,
         |  round(detr - seasonal, 6) AS resid
         | FROM dt JOIN se USING (dow) ORDER BY d""".stripMargin
        .replaceAll("\n", " "),
    "q155_quantile_normalize" -> {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
      val sCtes = cols.zipWithIndex.map { case (c, i) =>
        s"s$i AS (SELECT row_number() OVER (ORDER BY CAST($c AS DOUBLE)) - 1 AS pos, CAST($c AS DOUBLE) AS v$i FROM lineitem)"
      }
      val moms = cols.indices.flatMap { i =>
        Seq(s"${dsumSql(s"v$i")} AS sx_$i", s"${dsumSql(s"v$i * v$i")} AS sxx_$i",
          s"${dsumSql(s"v$i * tg")} AS sxy_$i",
          s"${dsumSql(s"abs(v$i - tg)")} AS sad_$i")
      } ++ Seq(s"${dsumSql("tg")} AS sy", s"${dsumSql("tg * tg")} AS syy",
        "CAST(count(*) AS DOUBLE) AS n")
      val legs = cols.zipWithIndex.map { case (c, i) =>
        s"""SELECT '$c' AS column_name,
           | round((n * sxy_$i - sx_$i * sy) /
           |   (sqrt(n * sxx_$i - sx_$i * sx_$i) * sqrt(n * syy - sy * sy)), 6)
           |   AS corr_consensus,
           | round(sad_$i / n, 6) AS mad_consensus FROM m""".stripMargin
          .replaceAll("\n", " ")
      }
      s"""WITH ${sCtes.mkString(", ")},
         | t AS (SELECT s0.pos, v0, v1, v2, (v0 + v1 + v2) / 3.0 AS tg
         |   FROM s0 JOIN s1 ON s0.pos = s1.pos JOIN s2 ON s0.pos = s2.pos),
         | m AS (SELECT ${moms.mkString(", ")} FROM t)
         | SELECT * FROM (${legs.mkString(" UNION ALL ")})
         | ORDER BY column_name""".stripMargin.replaceAll("\n", " ")
    },
    "q156_triangles" ->
      """WITH ob AS (SELECT DISTINCT l_orderkey AS ok, p_brand AS b
        |   FROM lineitem JOIN part ON l_partkey = p_partkey),
        | e AS (SELECT x.b AS b1, y.b AS b2 FROM ob x JOIN ob y
        |   ON x.ok = y.ok AND x.b < y.b GROUP BY x.b, y.b
        |   HAVING count(*) >= 5),
        | deg AS (SELECT b, count(*) AS dg FROM
        |   (SELECT b1 AS b FROM e UNION ALL SELECT b2 FROM e) GROUP BY b),
        | tp AS (SELECT CAST(sum(dg * (dg - 1) / 2) AS BIGINT) AS triples FROM deg),
        | tr AS (SELECT count(*) AS tri FROM e e1
        |   JOIN e e2 ON e1.b2 = e2.b1
        |   JOIN e e3 ON e1.b1 = e3.b1 AND e2.b2 = e3.b2),
        | ne AS (SELECT count(*) AS n_edges FROM e)
        | SELECT n_edges, tri AS n_triangles, triples AS n_triples,
        |  round(CAST(3.0 AS DOUBLE) * CAST(tri AS DOUBLE) /
        |    CAST(triples AS DOUBLE), 6) AS clustering_coef
        | FROM ne, tr, tp""".stripMargin.replaceAll("\n", " "),
    "q157_logrank" -> {
      val e1 = "(CAST(d AS DOUBLE) * CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))"
      val v1 = "CASE WHEN n > 1 THEN CAST(d AS DOUBLE) * " +
        "(CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE)) * " +
        "(CAST(1.0 AS DOUBLE) - CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE)) * " +
        "(CAST(n AS DOUBLE) - CAST(d AS DOUBLE)) / (CAST(n AS DOUBLE) - CAST(1.0 AS DOUBLE)) " +
        "ELSE CAST(0.0 AS DOUBLE) END"
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
         | mx AS (SELECT max(us) AS mu FROM e),
         | per AS (SELECT user_id, min(us) AS first_us,
         |   min(CASE WHEN event_type = 'purchase' THEN us END) AS p_us
         |  FROM e GROUP BY user_id),
         | dd AS (SELECT (coalesce(p_us, mu) - first_us) // 86400000000 AS t,
         |   CASE WHEN p_us IS NOT NULL THEN 1 ELSE 0 END AS died,
         |   user_id % 2 = 0 AS a FROM per, mx),
         | tb AS (SELECT t, sum(CASE WHEN a THEN died ELSE 0 END) AS d1,
         |   sum(died) AS d, count(CASE WHEN a THEN 1 END) AS c1, count(*) AS c
         |  FROM dd GROUP BY t),
         | tt AS (SELECT sum(c1) AS tot1, sum(c) AS tot FROM tb),
         | ar AS (SELECT t, d1, d,
         |   tot1 - coalesce(sum(c1) OVER
         |     (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n1,
         |   tot - coalesce(sum(c) OVER
         |     (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n
         |  FROM tb, tt),
         | fl AS (SELECT * FROM ar WHERE d > 0),
         | ag AS (SELECT count(*) AS n_event_times,
         |   ${dsumSql(s"CAST(d1 AS DOUBLE) - $e1")} AS oe,
         |   ${dsumSql(v1)} AS v FROM fl)
         | SELECT n_event_times, round(oe, 6) AS o_minus_e,
         |  round(v, 6) AS var_sum, round(oe / sqrt(v), 6) AS z
         | FROM ag""".stripMargin.replaceAll("\n", " ")
    },
    "q158_pettitt" -> {
      val den = "(CAST(nn AS DOUBLE) * nn * nn + CAST(nn AS DOUBLE) * nn)"
      s"""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS d,
         |   CAST(count(*) AS DOUBLE) AS c FROM events GROUP BY 1),
         | nc AS (SELECT count(*) AS nn FROM daily),
         | rkt AS (SELECT d, rank() OVER (ORDER BY c) +
         |   (count(*) OVER (PARTITION BY c) - 1) / 2.0 AS rk FROM daily),
         | ut AS (SELECT d, row_number() OVER (ORDER BY d) AS pos,
         |   CAST(sum(CAST(rk AS DECIMAL(38,10))) OVER (ORDER BY d) AS DOUBLE) AS srk
         |  FROM rkt),
         | uu AS (SELECT d, CAST(2.0 AS DOUBLE) * srk -
         |   CAST(pos AS DOUBLE) * CAST(nn + 1 AS DOUBLE) AS u
         |  FROM ut, nc WHERE pos < nn),
         | top AS (SELECT d, u FROM uu ORDER BY abs(u) DESC, d LIMIT 1)
         | SELECT d AS changepoint_day, CAST(u AS BIGINT) AS u,
         |  round(CAST(2.0 AS DOUBLE) * exp(CAST(-6.0 AS DOUBLE) * abs(u) * abs(u) /
         |    $den), 6) AS p_approx
         | FROM top, nc""".stripMargin.replaceAll("\n", " ")
    },
    "q159_pmi" ->
      """WITH dw AS (SELECT DISTINCT doc_id, w FROM
        |   (SELECT doc_id, unnest(list_filter(string_split(text, ' '),
        |     t -> t <> '')) AS w FROM documents)),
        | nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM dw),
        | wc AS (SELECT w, count(*) AS cw FROM dw GROUP BY w),
        | pr AS (SELECT x.w AS w1, y.w AS w2, count(*) AS cab
        |   FROM dw x JOIN dw y ON x.doc_id = y.doc_id AND x.w < y.w
        |   GROUP BY x.w, y.w HAVING count(*) >= 5)
        | SELECT w1, w2, cab,
        |  round(ln(CAST(cab AS DOUBLE) * n /
        |    (CAST(c1.cw AS DOUBLE) * CAST(c2.cw AS DOUBLE))), 6) AS pmi
        | FROM pr JOIN wc c1 ON pr.w1 = c1.w JOIN wc c2 ON pr.w2 = c2.w
        | CROSS JOIN nd
        | ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin
        .replaceAll("\n", " "),
    "q160_cube" ->
      s"""SELECT CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT) AS gid,
         | coalesce(l_returnflag, 'ALL') AS rf,
         | coalesce(l_linestatus, 'ALL') AS ls,
         | count(*) AS n, round(${dsumSql("l_quantity")}, 4) AS sum_qty,
         | round(${dsumSql("l_extendedprice*(1.0-l_discount)")}, 4) AS revenue
         | FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         | ORDER BY gid, rf, ls""".stripMargin.replaceAll("\n", " "),
    "q161_kruskal" -> {
      val nD = "CAST(n AS DOUBLE)"
      val h = s"(12.0 / ($nD * ($nD + 1.0)) * s2 - 3.0 * ($nD + 1.0))"
      val cc = s"(1.0 - tsum / ($nD * $nD * $nD - $nD))"
      s"""WITH base AS (SELECT l_returnflag AS g, CAST(l_quantity AS DOUBLE) AS v
         |   FROM lineitem WHERE l_quantity IS NOT NULL
         |   AND NOT isnan(CAST(l_quantity AS DOUBLE))),
         | rkt AS (SELECT g, v, rank() OVER (ORDER BY v) +
         |   (count(*) OVER (PARTITION BY v) - 1) / 2.0 AS rk FROM base),
         | grp AS (SELECT g, count(*) AS nj, ${Stats.Sql.dsumWide("rk")} AS rj
         |   FROM rkt GROUP BY g),
         | summ AS (SELECT CAST(sum(nj) AS BIGINT) AS n, count(*) AS k,
         |   list_reduce(list(rj * rj / CAST(nj AS DOUBLE) ORDER BY g),
         |     (s, x) -> s + x) AS s2 FROM grp),
         | tt AS (SELECT ${Stats.Sql.dsumWide("t * t * t - t")} AS tsum FROM
         |   (SELECT CAST(count(*) AS DOUBLE) AS t FROM rkt GROUP BY v))
         | SELECT n, k, round($h, 6) AS h, round($cc, 6) AS tie_c,
         |  round($h / $cc, 6) AS h_adj
         | FROM summ, tt""".stripMargin.replaceAll("\n", " ")
    },
    "q162_jarque_bera" -> {
      def vd(c: String) =
        s"(CASE WHEN $c IS NOT NULL AND NOT isnan(CAST($c AS DOUBLE)) THEN CAST($c AS DOUBLE) END)"
      val mAggs = lineitemNumerics.map(c =>
        s"${Stats.Sql.dsumWide(vd(c))} / CAST(count(${vd(c)}) AS DOUBLE) AS mu_$c").mkString(", ")
      val cAggs = lineitemNumerics.flatMap { c =>
        val dv = s"(${vd(c)} - mu_$c)"
        Seq(s"count(${vd(c)}) AS n_$c",
          s"${Stats.Sql.dsumWide(s"$dv * $dv")} AS m2_$c",
          s"${Stats.Sql.dsumWide(s"$dv * $dv * $dv")} AS m3_$c",
          s"${Stats.Sql.dsumWide(s"$dv * $dv * $dv * $dv")} AS m4_$c")
      }.mkString(", ")
      val legs = lineitemNumerics.map { c =>
        val nD = s"CAST(n_$c AS DOUBLE)"
        val m2 = s"(m2_$c / $nD)"; val m3 = s"(m3_$c / $nD)"
        val m4 = s"(m4_$c / $nD)"
        val sk = s"($m3 / pow($m2, 1.5))"
        val ku = s"($m4 / ($m2 * $m2) - 3.0)"
        s"""SELECT '$c' AS column_name, n_$c AS n, round($sk, 6) AS skewness,
           | round($ku, 6) AS kurtosis_excess,
           | round($nD / 6.0 * ($sk * $sk + $ku * $ku / 4.0), 6) AS jb
           | FROM cm""".stripMargin.replaceAll("\n", " ")
      }
      s"""WITH m AS (SELECT $mAggs FROM lineitem),
         | cm AS (SELECT $cAggs FROM lineitem, m)
         | SELECT * FROM (${legs.mkString(" UNION ALL ")})
         | ORDER BY column_name""".stripMargin.replaceAll("\n", " ")
    },
    "q163_anova" -> centeredAnovaSql(
      "SELECT l_returnflag AS g, (CASE WHEN l_extendedprice IS NOT NULL " +
        "AND NOT isnan(CAST(l_extendedprice AS DOUBLE)) " +
        "THEN CAST(l_extendedprice AS DOUBLE) END) AS v FROM lineitem"),
    "q164_bm25" -> {
      val terms = Seq("join", "hash", "filter")
      val dfAggs = terms.zipWithIndex.map { case (t, i) =>
        s"count(CASE WHEN list_contains(toks, '$t') THEN 1 END) AS df_$i"
      }.mkString(", ")
      val idfs = terms.indices.map { i =>
        val dfD = s"CAST(df_$i AS DOUBLE)"
        s"ln((CAST(n_docs AS DOUBLE) - $dfD + 0.5) / ($dfD + 0.5) + 1.0) AS idf_$i"
      }.mkString(", ")
      val score = terms.zipWithIndex.map { case (t, i) =>
        val tf = s"CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE)"
        s"idf_$i * $tf / ($tf + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl))"
      }.mkString(" + ")
      s"""WITH b AS (SELECT doc_id, string_split(text, ' ') AS toks,
         |   len(string_split(text, ' ')) AS dl FROM documents),
         | st AS (SELECT count(*) AS n_docs,
         |   ${dsumSql("dl")} / CAST(count(*) AS DOUBLE) AS avgdl, $dfAggs FROM b),
         | co AS (SELECT n_docs, avgdl, $idfs FROM st)
         | SELECT doc_id, CAST(dl AS BIGINT) AS dl, round($score, 6) AS bm25
         | FROM b, co ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin
        .replaceAll("\n", " ")
    },
    "q165_ref_integrity" -> {
      val rels = Seq(
        ("customer.nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey", ""),
        ("lineitem.orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey", ""),
        ("lineitem.orderkey->orders[mod3-corrupted]", "lineitem", "l_orderkey", "orders", "o_orderkey", " AND o_orderkey % 3 <> 0"),
        ("lineitem.partkey->part", "lineitem", "l_partkey", "part", "p_partkey", ""),
        ("orders.custkey->customer", "orders", "o_custkey", "customer", "c_custkey", ""))
      val ctes = rels.zipWithIndex.map { case ((_, child, fk, parent, pk, pf), i) =>
        s"""ck$i AS (SELECT $fk AS k, count(*) AS cnt FROM $child
           | WHERE $fk IS NOT NULL GROUP BY $fk),
           | or$i AS (SELECT count(*) AS ok, CAST(coalesce(sum(cnt), 0) AS BIGINT) AS orr
           |  FROM ck$i WHERE NOT EXISTS
           |  (SELECT 1 FROM $parent WHERE $pk = ck$i.k$pf))""".stripMargin
          .replaceAll("\n", " ")
      }.mkString(", ")
      val legs = rels.zipWithIndex.map { case ((name, _, _, _, _, _), i) =>
        s"""SELECT '$name' AS relationship,
           | (SELECT count(*) FROM ck$i) AS fk_keys,
           | (SELECT CAST(sum(cnt) AS BIGINT) FROM ck$i) AS child_rows,
           | ok AS orphan_keys, orr AS orphan_rows FROM or$i""".stripMargin
          .replaceAll("\n", " ")
      }
      s"WITH $ctes SELECT * FROM (${legs.mkString(" UNION ALL ")}) ORDER BY relationship"
    },
    "q166_kendall" -> {
      val ncD = "CAST(nc AS DOUBLE)"; val ndD = "CAST(nd AS DOUBLE)"
      val txD = "CAST(tie_x AS DOUBLE)"; val tyD = "CAST(tie_y AS DOUBLE)"
      s"""WITH daily AS (SELECT epoch_us(o_orderdate) // 86400000000 AS d,
         |   CAST(count(*) AS DOUBLE) AS x, ${Stats.Sql.dsumWide("o_totalprice")} AS y
         |  FROM orders GROUP BY 1),
         | p AS (SELECT a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
         |   FROM daily a JOIN daily b ON a.d < b.d),
         | ag AS (SELECT
         |   count(CASE WHEN (x1 < x2 AND y1 < y2) OR (x1 > x2 AND y1 > y2) THEN 1 END) AS nc,
         |   count(CASE WHEN (x1 < x2 AND y1 > y2) OR (x1 > x2 AND y1 < y2) THEN 1 END) AS nd,
         |   count(CASE WHEN x1 = x2 AND y1 <> y2 THEN 1 END) AS tie_x,
         |   count(CASE WHEN y1 = y2 AND x1 <> x2 THEN 1 END) AS tie_y FROM p),
         | nn AS (SELECT count(*) AS n_days FROM daily)
         | SELECT n_days, nc, nd, tie_x, tie_y,
         |  round(($ncD - $ndD) /
         |    sqrt(($ncD + $ndD + $txD) * ($ncD + $ndD + $tyD)), 6) AS tau_b
         | FROM ag, nn""".stripMargin.replaceAll("\n", " ")
    },
    "q167_holt" -> {
      val lNew = "0.5 * x[1] + (1.0 - 0.5) * (s[1] + s[2])"
      s"""WITH monthly AS (SELECT n_name,
         |   CAST(year(o_orderdate) AS INT) * 12 + CAST(month(o_orderdate) AS INT) AS ym,
         |   ${Stats.Sql.dsumWide("o_totalprice")} AS rev
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name, ym),
         | ser AS (SELECT n_name, list(rev ORDER BY ym) AS l
         |   FROM monthly GROUP BY n_name),
         | hs AS (SELECT n_name, CAST(len(l) AS BIGINT) AS n,
         |   list_reduce(list_transform(l, v -> [v, 0.0]),
         |     (s, x) -> [$lNew,
         |       0.3 * (($lNew) - s[1]) + (1.0 - 0.3) * s[2]]) AS st
         |  FROM ser)
         | SELECT n_name, n, round(st[1], 6) AS level, round(st[2], 6) AS trend,
         |  round(st[1] + st[2], 6) AS forecast FROM hs
         | ORDER BY n_name""".stripMargin.replaceAll("\n", " ")
    },
    "q168_item_sim" ->
      """WITH cb AS (SELECT o_custkey AS cust, p_brand AS b, count(*) AS n
        |   FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |   JOIN part ON l_partkey = p_partkey GROUP BY 1, 2),
        | nm AS (SELECT b, sqrt(CAST(sum(n * n) AS DOUBLE)) AS nrm
        |   FROM cb GROUP BY b),
        | pr AS (SELECT a.b AS b1, c.b AS b2, CAST(sum(a.n * c.n) AS BIGINT) AS dot
        |   FROM cb a JOIN cb c ON a.cust = c.cust AND a.b < c.b
        |   GROUP BY a.b, c.b)
        | SELECT b1, b2, dot,
        |  round(CAST(dot AS DOUBLE) / (n1.nrm * n2.nrm), 6) AS cosine
        | FROM pr JOIN nm n1 ON pr.b1 = n1.b JOIN nm n2 ON pr.b2 = n2.b
        | ORDER BY cosine DESC, b1, b2 LIMIT 20""".stripMargin
        .replaceAll("\n", " "),
    "q169_fd_audit" -> {
      val fds = Seq(
        ("customer: c_nationkey->c_mktsegment", "customer", "c_nationkey", "c_mktsegment"),
        ("nation: n_nationkey->n_regionkey", "nation", "n_nationkey", "n_regionkey"),
        ("orders: o_custkey->o_orderpriority", "orders", "o_custkey", "o_orderpriority"),
        ("part: p_name->p_brand", "part", "p_name", "p_brand"),
        ("part: p_type->p_size", "part", "p_type", "p_size"))
      val legs = fds.map { case (name, t, x, y) =>
        s"""SELECT '$name' AS fd, count(*) AS lhs_values,
           | count(CASE WHEN ndv > 1 THEN 1 END) AS violating_lhs,
           | CAST(sum(nx - mx) AS BIGINT) AS violation_rows,
           | count(CASE WHEN ndv > 1 THEN 1 END) = 0 AS holds
           | FROM (SELECT x, sum(c) AS nx, max(c) AS mx, count(*) AS ndv
           |   FROM (SELECT $x AS x, $y AS y, count(*) AS c FROM $t GROUP BY 1, 2)
           |   GROUP BY x)""".stripMargin.replaceAll("\n", " ")
      }
      s"SELECT * FROM (${legs.mkString(" UNION ALL ")}) ORDER BY fd"
    },
    "q170_ndcg" ->
      s"""WITH d AS (SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS label,
         |   l_extendedprice AS score, l_orderkey, l_linenumber FROM lineitem),
         | np AS (SELECT CAST(sum(label) AS BIGINT) AS n_pos FROM d),
         | top AS (SELECT label, row_number() OVER
         |   (ORDER BY score DESC, l_orderkey, l_linenumber) AS pos
         |  FROM d ORDER BY score DESC, l_orderkey, l_linenumber LIMIT 100),
         | dc AS (SELECT ${dsumSql("CAST(label AS DOUBLE) / log2(CAST(pos AS DOUBLE) + 1.0)")} AS dcg FROM top),
         | ic AS (SELECT ${dsumSql("1.0 / log2(CAST(i AS DOUBLE) + 1.0)")} AS idcg
         |   FROM (SELECT unnest(generate_series(1, least(100, n_pos))) AS i FROM np))
         | SELECT 100 AS k, n_pos, round(dcg, 6) AS dcg, round(idcg, 6) AS idcg,
         |  round(dcg / idcg, 6) AS ndcg FROM dc, ic, np""".stripMargin
        .replaceAll("\n", " "),
    "q171_stump" -> {
      val ps = (1 to 9).map(_ / 10.0)
      val qts = ps.zipWithIndex.map { case (p, i) =>
        s"quantile_cont(v, $p) AS t_$i"
      }.mkString(", ")
      val ags = ps.indices.flatMap { i =>
        Seq(s"count(CASE WHEN v <= t_$i THEN 1 END) AS nl_$i",
          s"sum(CASE WHEN v <= t_$i THEN y ELSE 0 END) AS pl_$i")
      }.mkString(", ")
      val legs = ps.zipWithIndex.map { case (p, i) =>
        val nD = "CAST(n AS DOUBLE)"; val nlD = s"CAST(nl_$i AS DOUBLE)"
        val nrD = s"($nD - $nlD)"
        val pL = s"(CAST(pl_$i AS DOUBLE) / $nlD)"
        val pR = s"((CAST(pos AS DOUBLE) - CAST(pl_$i AS DOUBLE)) / $nrD)"
        val gL = s"(1.0 - $pL * $pL - (1.0 - $pL) * (1.0 - $pL))"
        val gR = s"(1.0 - $pR * $pR - (1.0 - $pR) * (1.0 - $pR))"
        val g = s"CASE WHEN nl_$i > 0 AND nl_$i < n THEN " +
          s"$nlD / $nD * $gL + $nrD / $nD * $gR END"
        s"""SELECT CAST($p AS DOUBLE) AS p, round(t_$i, 6) AS threshold,
           | nl_$i AS n_left, CAST(pl_$i AS BIGINT) AS pos_left,
           | round($g, 6) AS gini_split FROM ag, qt""".stripMargin
          .replaceAll("\n", " ")
      }
      s"""WITH d AS (SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         |   CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
         |   WHERE l_extendedprice IS NOT NULL
         |   AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
         | qt AS (SELECT $qts FROM d),
         | ag AS (SELECT count(*) AS n, sum(y) AS pos, $ags FROM d, qt)
         | SELECT * FROM (${legs.mkString(" UNION ALL ")})
         | ORDER BY p""".stripMargin.replaceAll("\n", " ")
    },
    "q172_brown_forsythe" -> centeredAnovaSql(
      """SELECT b.g, abs(b.v0 - m.md) AS v FROM
        | (SELECT l_returnflag AS g, CAST(l_extendedprice AS DOUBLE) AS v0
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL
        |  AND NOT isnan(CAST(l_extendedprice AS DOUBLE))) b
        | JOIN (SELECT l_returnflag AS g,
        |   quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) AS md
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL
        |  AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
        |  GROUP BY l_returnflag) m ON b.g = m.g""".stripMargin
        .replaceAll("\n", " ")),
    "q173_ols" -> {
      def vd(c: String) =
        s"(CASE WHEN $c IS NOT NULL AND NOT isnan(CAST($c AS DOUBLE)) THEN CAST($c AS DOUBLE) END)"
      val det = "(s11 * s22 - s12 * s12)"
      val b1 = s"((s22 * s1y - s12 * s2y) / $det)"
      val b2 = s"((s11 * s2y - s12 * s1y) / $det)"
      s"""WITH b AS (SELECT y, x1, x2 FROM
         |  (SELECT ${vd("l_extendedprice")} AS y, ${vd("l_quantity")} AS x1,
         |    ${vd("l_discount")} AS x2 FROM lineitem)
         |  WHERE y IS NOT NULL AND x1 IS NOT NULL AND x2 IS NOT NULL),
         | mu AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |   ${Stats.Sql.dsumWide("y")} / CAST(count(*) AS DOUBLE) AS muY,
         |   ${Stats.Sql.dsumWide("x1")} / CAST(count(*) AS DOUBLE) AS mu1,
         |   ${Stats.Sql.dsumWide("x2")} / CAST(count(*) AS DOUBLE) AS mu2 FROM b),
         | m AS (SELECT
         |   ${Stats.Sql.dsumWide("(x1 - mu1) * (x1 - mu1)")} AS s11,
         |   ${Stats.Sql.dsumWide("(x2 - mu2) * (x2 - mu2)")} AS s22,
         |   ${Stats.Sql.dsumWide("(x1 - mu1) * (x2 - mu2)")} AS s12,
         |   ${Stats.Sql.dsumWide("(x1 - mu1) * (y - muY)")} AS s1y,
         |   ${Stats.Sql.dsumWide("(x2 - mu2) * (y - muY)")} AS s2y,
         |   ${Stats.Sql.dsumWide("(y - muY) * (y - muY)")} AS syy FROM b, mu)
         | SELECT n, round(muY - $b1 * mu1 - $b2 * mu2, 6) AS b0,
         |  round($b1, 6) AS b1, round($b2, 6) AS b2,
         |  round(($b1 * s1y + $b2 * s2y) / syy, 6) AS r2
         | FROM m, mu""".stripMargin.replaceAll("\n", " ")
    },
    "q174_kappa" -> {
      val r1 = "n_chars >= 500"
      val r2 = "len(string_split(text, ' ')) >= 80"
      val nD = "CAST(n AS DOUBLE)"
      val po = s"(CAST(n11 + n00 AS DOUBLE) / $nD)"
      val pe = s"(CAST(n11 + n10 AS DOUBLE) / $nD * (CAST(n11 + n01 AS DOUBLE) / $nD) + " +
        s"CAST(n00 + n01 AS DOUBLE) / $nD * (CAST(n00 + n10 AS DOUBLE) / $nD))"
      s"""WITH m AS (SELECT count(*) AS n,
         |  count(CASE WHEN $r1 AND $r2 THEN 1 END) AS n11,
         |  count(CASE WHEN $r1 AND NOT ($r2) THEN 1 END) AS n10,
         |  count(CASE WHEN NOT ($r1) AND $r2 THEN 1 END) AS n01,
         |  count(CASE WHEN NOT ($r1) AND NOT ($r2) THEN 1 END) AS n00
         | FROM documents)
         | SELECT n, n11, n10, n01, n00, round($po, 6) AS po,
         |  round($pe, 6) AS pe,
         |  round(($po - $pe) / (1.0 - $pe), 6) AS kappa FROM m""".stripMargin
        .replaceAll("\n", " ")
    },
    "q175_vocab_overlap" ->
      """WITH sw AS (SELECT DISTINCT source, w FROM
        |   (SELECT source, unnest(list_filter(string_split(text, ' '),
        |     t -> t <> '')) AS w FROM documents)),
        | vs AS (SELECT source, count(*) AS v FROM sw GROUP BY source),
        | pr AS (SELECT a.source AS s1, b.source AS s2, count(*) AS inter
        |   FROM sw a JOIN sw b ON a.w = b.w AND a.source < b.source
        |   GROUP BY 1, 2)
        | SELECT s1, s2, va.v AS v1, vb.v AS v2, inter,
        |  round(CAST(inter AS DOUBLE) /
        |    CAST((va.v + vb.v - inter) AS DOUBLE), 6) AS jaccard
        | FROM pr JOIN vs va ON pr.s1 = va.source
        | JOIN vs vb ON pr.s2 = vb.source
        | ORDER BY s1, s2""".stripMargin.replaceAll("\n", " "),
    "q176_sample_shuffle_audit" -> {
      import graft.aug.Sampling.{Sql => Smp}
      s"""SELECT ${Smp.keyBucket("l_orderkey", 99L)} AS shuffle_key,
         | l_orderkey, l_linenumber, l_extendedprice
         | FROM lineitem WHERE ${Smp.samplePred("l_orderkey", 0.01, 7L)}
         | ORDER BY shuffle_key, l_orderkey, l_linenumber
         | LIMIT 50""".stripMargin.replaceAll("\n", " ")
    },
    "q177_ccf" -> {
      val n = "CAST(count(*) AS DOUBLE)"
      def w(x: String) = Stats.Sql.dsumWide(x)
      s"""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS d,
         |   CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS DOUBLE) AS x,
         |   CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS DOUBLE) AS y
         |  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1),
         | l AS (SELECT a.d, g.k, a.x, b.y
         |  FROM daily a
         |  CROSS JOIN (SELECT unnest(generate_series(0, 5)) AS k) g
         |  JOIN daily b ON b.d = a.d + g.k)
         | SELECT k, count(*) AS n_pairs,
         |  round(($n * ${w("x*y")} - ${w("x")} * ${w("y")}) /
         |   (sqrt($n * ${w("x*x")} - ${w("x")} * ${w("x")}) *
         |    sqrt($n * ${w("y*y")} - ${w("y")} * ${w("y")})), 6) AS ccf
         | FROM l GROUP BY k ORDER BY k""".stripMargin.replaceAll("\n", " ")
    },
    "q178_cohens_d" -> {
      val sp = "sqrt(((n1 - 1.0) * s21 + (n2 - 1.0) * s22) / (n1 + n2 - 2.0))"
      val d = s"((m1 - m2) / $sp)"
      s"""WITH e AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v
         |   FROM events WHERE event_type IN ('click', 'purchase')),
         | a AS (SELECT g, CAST(count(*) AS DOUBLE) AS n,
         |   ${Stats.Sql.dmean("v")} AS m, ${Stats.Sql.dvarSamp("v")} AS s2
         |   FROM e GROUP BY g),
         | w AS (SELECT
         |   max(CASE WHEN g = 'click' THEN n END) AS n1,
         |   max(CASE WHEN g = 'click' THEN m END) AS m1,
         |   max(CASE WHEN g = 'click' THEN s2 END) AS s21,
         |   max(CASE WHEN g = 'purchase' THEN n END) AS n2,
         |   max(CASE WHEN g = 'purchase' THEN m END) AS m2,
         |   max(CASE WHEN g = 'purchase' THEN s2 END) AS s22 FROM a)
         | SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
         |  round(m1, 6) AS mean1, round(m2, 6) AS mean2,
         |  round($sp, 6) AS pooled_sd, round($d, 6) AS cohens_d,
         |  round($d * (1.0 - 3.0 / (4.0 * (n1 + n2 - 2.0) - 1.0)), 6) AS hedges_g
         | FROM w""".stripMargin.replaceAll("\n", " ")
    },
    "q179_hhi" -> {
      val c = "CAST(cents AS DOUBLE)"
      s"""WITH per AS (SELECT o_orderpriority AS g, o_custkey,
         |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
         |  FROM orders GROUP BY 1, 2),
         | a AS (SELECT g, count(*) AS n_customers,
         |   ${Stats.Sql.dsumWide(c)} AS tot,
         |   ${Stats.Sql.dsumWide(s"$c*$c")} AS ss FROM per GROUP BY g)
         | SELECT g AS priority, n_customers, round(tot / 100.0, 2) AS revenue,
         |  round(ss / (tot * tot), 6) AS hhi FROM a ORDER BY priority""".stripMargin
        .replaceAll("\n", " ")
    },
    "q180_lorenz" -> {
      s"""WITH per AS (SELECT o_custkey,
         |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
         |  FROM orders GROUP BY 1),
         | v AS (SELECT cents, count(*) AS n FROM per GROUP BY cents),
         | sc AS (SELECT cents, n, CAST(COALESCE(sum(n) OVER (ORDER BY cents
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
         |   FROM v),
         | t AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
         |   CAST(sum(cents * n) AS BIGINT) AS ct FROM v),
         | e AS (SELECT decile, cents, n, cum, ct,
         |   (nt * decile) // 10 AS b_lo, (nt * (decile + 1)) // 10 AS b_hi
         |  FROM sc CROSS JOIN t
         |  CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS decile)),
         | f AS (SELECT decile, cents, ct,
         |   greatest(0, least(cum + n, b_hi) - greatest(cum, b_lo)) AS in_d,
         |   greatest(0, least(n, b_hi - cum)) AS le_d FROM e)
         | SELECT decile, CAST(sum(in_d) AS BIGINT) AS n_customers,
         |  round(${Stats.Sql.dsumWide("CAST(in_d AS DOUBLE) * CAST(cents AS DOUBLE)")} /
         |    CAST(max(ct) AS DOUBLE), 6) AS value_share,
         |  round(${Stats.Sql.dsumWide("CAST(le_d AS DOUBLE) * CAST(cents AS DOUBLE)")} /
         |    CAST(max(ct) AS DOUBLE), 6) AS cum_share
         | FROM f GROUP BY decile ORDER BY decile""".stripMargin
        .replaceAll("\n", " ")
    },
    "q181_degree_hist" ->
      """WITH edges AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
        | sup AS (SELECT 'supplier' AS side, deg, count(*) AS n_nodes FROM
        |   (SELECT l_suppkey, count(*) AS deg FROM edges GROUP BY 1) GROUP BY 2),
        | prt AS (SELECT 'part' AS side, deg, count(*) AS n_nodes FROM
        |   (SELECT l_partkey, count(*) AS deg FROM edges GROUP BY 1) GROUP BY 2)
        | SELECT side, deg, n_nodes FROM (SELECT * FROM sup UNION ALL SELECT * FROM prt)
        | ORDER BY side, deg""".stripMargin.replaceAll("\n", " "),
    "q182_stickiness" ->
      s"""WITH e AS (SELECT epoch_us(ts) // 86400000000 AS d,
         |   (epoch_us(ts) // 86400000000) // 30 AS m, user_id FROM events),
         | daily AS (SELECT m, d, count(*) AS dau FROM
         |   (SELECT DISTINCT m, d, user_id FROM e) GROUP BY m, d),
         | da AS (SELECT m, count(*) AS n_days,
         |   ${Stats.Sql.dmean("CAST(dau AS DOUBLE)")} AS avg_dau
         |  FROM daily GROUP BY m),
         | ma AS (SELECT m, count(*) AS mau FROM
         |   (SELECT DISTINCT m, user_id FROM e) GROUP BY m)
         | SELECT da.m AS m, n_days, mau, round(avg_dau, 6) AS avg_dau,
         |  round(avg_dau / CAST(mau AS DOUBLE), 6) AS stickiness
         | FROM da JOIN ma ON da.m = ma.m ORDER BY m""".stripMargin
        .replaceAll("\n", " "),
    "q183_lang_mix" -> {
      s"""WITH c AS (SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2),
         | t AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_docs,
         |   count(*) AS n_langs FROM c GROUP BY source),
         | j AS (SELECT c.source, n_langs, n_docs,
         |   CAST(n AS DOUBLE) / CAST(n_docs AS DOUBLE) AS p
         |  FROM c JOIN t ON c.source = t.source)
         | SELECT source, max(n_langs) AS n_langs, max(n_docs) AS n_docs,
         |  round(max(p), 6) AS top_share,
         |  round(0.0 - ${dsumSql("p * log2(p)")}, 6) AS entropy_bits
         | FROM j GROUP BY source ORDER BY source""".stripMargin
        .replaceAll("\n", " ")
    },
    "q184_cluster_size_hist" -> {
      val sh = graft.dedup.Dedup.Sql.shingles("text", 3)
      s"""WITH s AS (SELECT doc_id, $sh AS sh FROM documents),
         | e AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
         | sz AS (SELECT doc_id, len(sh) AS n_sh FROM s),
         | i AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
         |   FROM e x JOIN e y ON x.shingle = y.shingle AND x.doc_id < y.doc_id GROUP BY 1, 2),
         | p AS (SELECT a, b FROM i JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
         |   WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.5),
         | ed AS (SELECT a AS src, b AS dst FROM p UNION SELECT b, a FROM p),
         | verts AS (SELECT DISTINCT src AS id FROM ed),
         | reach AS (WITH RECURSIVE rr(id, r) AS (
         |     SELECT id, id FROM verts
         |     UNION
         |     SELECT ed.src, rr.r FROM ed JOIN rr ON rr.id = ed.dst)
         |   SELECT * FROM rr),
         | comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
         | cs AS (SELECT component, count(*) AS sz FROM comp GROUP BY component)
         | SELECT sz, count(*) AS n_clusters FROM cs GROUP BY sz
         | ORDER BY sz""".stripMargin.replaceAll("\n", " ")
    },
    "q185_ohlc" -> {
      s"""WITH e AS (SELECT epoch_us(ts) // 86400000000 AS d, epoch_us(ts) AS us,
         |   event_id, CAST(value AS DOUBLE) AS v
         |  FROM events WHERE event_type = 'purchase'),
         | r AS (SELECT d, v,
         |   row_number() OVER (PARTITION BY d ORDER BY us, event_id) AS rn_a,
         |   row_number() OVER (PARTITION BY d ORDER BY us DESC, event_id DESC) AS rn_z
         |  FROM e)
         | SELECT d, count(*) AS n,
         |  round(max(CASE WHEN rn_a = 1 THEN v END), 6) AS open,
         |  round(max(CASE WHEN rn_z = 1 THEN v END), 6) AS close,
         |  round(min(v), 6) AS low, round(max(v), 6) AS high,
         |  round(${dsumSql("v")} / CAST(count(*) AS DOUBLE), 6) AS mean
         | FROM r GROUP BY d ORDER BY d""".stripMargin.replaceAll("\n", " ")
    },
    "q186_fertility" -> {
      import graft.text.TextOps.{Sql => T}
      s"""WITH d AS (SELECT lang, length(text) AS chars,
         |   ${T.tokenCount("text")} AS ws, ${T.bpeTokenCount("text")} AS bpe
         |  FROM documents)
         | SELECT lang, count(*) AS n_docs, CAST(sum(ws) AS BIGINT) AS ws_tokens,
         |  CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
         |  round(CAST(sum(chars) AS DOUBLE) / CAST(sum(ws) AS DOUBLE), 6) AS chars_per_word,
         |  round(CAST(sum(bpe) AS DOUBLE) / CAST(sum(ws) AS DOUBLE), 6) AS fertility
         | FROM d GROUP BY lang ORDER BY lang""".stripMargin.replaceAll("\n", " ")
    },
    "q187_cross_source_dups" -> {
      val sh = graft.dedup.Dedup.Sql.shingles("text", 3)
      s"""WITH s AS (SELECT doc_id, $sh AS sh FROM documents),
         | e AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
         | sz AS (SELECT doc_id, len(sh) AS n_sh FROM s),
         | i AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
         |   FROM e x JOIN e y ON x.shingle = y.shingle AND x.doc_id < y.doc_id GROUP BY 1, 2),
         | p AS (SELECT a, b FROM i JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
         |   WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.5)
         | SELECT least(da.source, db.source) AS s1,
         |  greatest(da.source, db.source) AS s2, count(*) AS n_dup_pairs
         | FROM p JOIN documents da ON da.doc_id = p.a
         | JOIN documents db ON db.doc_id = p.b
         | GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replaceAll("\n", " ")
    },
    "q188_class_weights" ->
      """WITH c AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label),
        | t AS (SELECT CAST(sum(n) AS DOUBLE) AS total,
        |   CAST(count(*) AS DOUBLE) AS k FROM c)
        | SELECT label, n, round(total / (k * CAST(n AS DOUBLE)), 6) AS weight
        | FROM c, t ORDER BY label""".stripMargin.replaceAll("\n", " "),
    "q189_odds_ratio" -> {
      val or = "(CAST(a * d AS DOUBLE) / CAST(b * c AS DOUBLE))"
      val se = "sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)"
      s"""WITH e AS (SELECT (user_id % 2 = 0) AS exposed,
         |   (event_type = 'error') AS bad FROM events),
         | m AS (SELECT
         |   count(CASE WHEN exposed AND bad THEN 1 END) AS a,
         |   count(CASE WHEN exposed AND NOT bad THEN 1 END) AS b,
         |   count(CASE WHEN NOT exposed AND bad THEN 1 END) AS c,
         |   count(CASE WHEN NOT exposed AND NOT bad THEN 1 END) AS d FROM e)
         | SELECT a, b, c, d, round($or, 6) AS odds_ratio,
         |  round(exp(ln($or) - 1.959963984540054 * $se), 6) AS ci_lo,
         |  round(exp(ln($or) + 1.959963984540054 * $se), 6) AS ci_hi
         | FROM m""".stripMargin.replaceAll("\n", " ")
    },
    "q190_quantile_sketch" -> {
      // the oracle computes the exact quantiles and PINS the sketch's
      // bound check as literal TRUE: a guarantee violation on the Spark
      // side hash-mismatches the correctness row
      val ps = Seq(0.25, 0.5, 0.75, 0.95)
      ps.map { p =>
        s"""SELECT '${f"p$p%.2f"}' AS quantile,
           | round(quantile_cont(l_extendedprice, $p), 6) AS exact_value,
           | TRUE AS within_bound FROM lineitem""".stripMargin
          .replaceAll("\n", " ")
      }.mkString(" UNION ALL ") + " ORDER BY quantile"
    },
    "q191_hll_audit" ->
      """SELECT l_linestatus, count(DISTINCT l_partkey) AS exact,
        | TRUE AS within_bound
        | FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin
        .replaceAll("\n", " "),
    "q192_window_suite" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
        |   CAST(value AS DOUBLE) AS v FROM events)
        | SELECT user_id, event_id,
        |  us - lag(us, 1) OVER (PARTITION BY user_id ORDER BY us, event_id) AS delta_us,
        |  round(percent_rank() OVER (PARTITION BY user_id ORDER BY v, event_id), 6) AS pr,
        |  round(cume_dist() OVER (PARTITION BY user_id ORDER BY v, event_id), 6) AS cd,
        |  ntile(4) OVER (PARTITION BY user_id ORDER BY v, event_id) AS tile
        | FROM e ORDER BY user_id, event_id LIMIT 200""".stripMargin
        .replaceAll("\n", " "),
    "q193_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rflag,
        |  coalesce(l_linestatus, 'ALL') AS lstatus, count(*) AS n,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE), 4) AS sum_qty
        | FROM lineitem
        | GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |   (l_returnflag), (l_linestatus))
        | ORDER BY rflag, lstatus""".stripMargin.replaceAll("\n", " "),
    "q194_semi_anti" ->
      """SELECT c_mktsegment AS segment, count(*) AS n_customers,
        |  count(CASE WHEN EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey) THEN 1 END) AS n_with_orders,
        |  count(CASE WHEN NOT EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey) THEN 1 END) AS n_without_orders
        | FROM customer c GROUP BY c_mktsegment ORDER BY segment""".stripMargin
        .replaceAll("\n", " "),
    "q195_levene" -> centeredAnovaSql(
      s"""SELECT b.g, abs(b.v0 - m.mn) AS v FROM
         | (SELECT l_returnflag AS g, CAST(l_extendedprice AS DOUBLE) AS v0
         |  FROM lineitem WHERE l_extendedprice IS NOT NULL
         |  AND NOT isnan(CAST(l_extendedprice AS DOUBLE))) b
         | JOIN (SELECT l_returnflag AS g,
         |   round(${Stats.Sql.dsumWide("CAST(l_extendedprice AS DOUBLE)")} /
         |     CAST(count(l_extendedprice) AS DOUBLE), 6) AS mn
         |  FROM lineitem WHERE l_extendedprice IS NOT NULL
         |  AND NOT isnan(CAST(l_extendedprice AS DOUBLE)) GROUP BY 1) m
         | ON b.g = m.g""".stripMargin.replaceAll("\n", " ")),
    "q196_rate_ratio" -> {
      val r1 = "(CAST(c1 AS DOUBLE) / CAST(d1 AS DOUBLE))"
      val r2 = "(CAST(c2 AS DOUBLE) / CAST(d2 AS DOUBLE))"
      s"""WITH e AS (SELECT epoch_us(ts) // 86400000000 AS d,
         |   (epoch_us(ts) // 86400000000) % 2 = 0 AS even FROM events),
         | m AS (SELECT count(CASE WHEN even THEN 1 END) AS c1,
         |   count(CASE WHEN NOT even THEN 1 END) AS c2,
         |   count(DISTINCT CASE WHEN even THEN d END) AS d1,
         |   count(DISTINCT CASE WHEN NOT even THEN d END) AS d2 FROM e)
         | SELECT c1, c2, d1, d2, round($r1 / $r2, 6) AS rate_ratio,
         |  round(ln($r1 / $r2) / sqrt(1.0/c1 + 1.0/c2), 6) AS z
         | FROM m""".stripMargin.replaceAll("\n", " ")
    },
    "q197_gap_stats" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
         | g AS (SELECT user_id,
         |   us - lag(us, 1) OVER (PARTITION BY user_id ORDER BY us, event_id) AS gap
         |  FROM e)
         | SELECT user_id, count(*) AS n_events, count(gap) AS n_gaps,
         |  round(${Stats.Sql.dsum("CAST(gap AS DOUBLE)")} /
         |    count(gap)) AS mean_gap_us,
         |  CAST(max(gap) AS BIGINT) AS max_gap_us
         | FROM g GROUP BY user_id ORDER BY user_id""".stripMargin
        .replaceAll("\n", " "),
    // self-verifying audit (q190/q191 pattern): centers are driver-fit
    // model state; the oracle computes the exact anchors and pins every
    // invariant boolean TRUE — a broken assignment or similarity
    // hash-mismatches its row
    "q198_semdedup" ->
      """SELECT count(*) AS n_vecs,
        | CAST(least(4096, greatest(4, CAST(ceil(sqrt(count(*))) AS BIGINT))) AS BIGINT) AS k,
        | CAST(max(len(embedding)) AS BIGINT) AS dim, TRUE AS assign_ok,
        | TRUE AS cos_bounded, TRUE AS pruned_frac_ok
        | FROM embeddings""".stripMargin.replaceAll("\n", " "),
    "q199_perplexity_buckets" -> {
      val sc = graft.text.BigramLm.Sql.score("documents", "doc_id", "text")
      s"""WITH sc AS ($sc),
         | wl AS (SELECT sc.id, sc.avg_logp, d.lang
         |   FROM sc JOIN documents d ON d.doc_id = sc.id),
         | ed AS (SELECT lang, quantile_cont(avg_logp, 1.0/3) AS t1,
         |   quantile_cont(avg_logp, 2.0/3) AS t2 FROM wl GROUP BY lang)
         | SELECT lang,
         |  CASE WHEN avg_logp >= t2 THEN 'head'
         |    WHEN avg_logp >= t1 THEN 'middle' ELSE 'tail' END AS bucket,
         |  count(*) AS n,
         |  round(${Stats.Sql.dmean("avg_logp")}, 6) AS mean_logp
         | FROM wl JOIN ed USING (lang)
         | GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin
        .replaceAll("\n", " ")
    },
    "q200_bpe_pairs" -> {
      val toks = graft.text.TextOps.Sql.toks("text")
      s"""WITH w AS (SELECT unnest($toks) AS w FROM documents),
         | p AS (SELECT unnest(list_transform(
         |     generate_series(1, length(w) - 1), i -> substring(w, i, 2))) AS pair
         |   FROM w)
         | SELECT pair, count(*) AS cnt FROM p GROUP BY pair
         | ORDER BY cnt DESC, pair LIMIT 32""".stripMargin
        .replaceAll("\n", " ")
    },
    "q201_range_window" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us,
        |   CAST(value AS DECIMAL(38,10)) AS v FROM events),
        | r AS (SELECT user_id, count(*) OVER w AS roll_n, sum(v) OVER w AS roll_sum
        |   FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us
        |     RANGE BETWEEN 21600000000 PRECEDING AND CURRENT ROW))
        | SELECT user_id, count(*) AS n_events, max(roll_n) AS max_roll_n,
        |  round(CAST(max(roll_sum) AS DOUBLE), 4) AS max_roll_sum,
        |  round(CAST(sum(roll_sum) AS DOUBLE), 4) AS sum_roll_sum
        | FROM r GROUP BY user_id ORDER BY user_id""".stripMargin
        .replaceAll("\n", " "),
    "q202_minhash_est_audit" -> {
      import graft.dedup.MinHashLSH.{Sql => M}
      val sh = graft.dedup.Dedup.Sql.shingles("text", 3)
      s"""WITH s AS (SELECT doc_id, $sh AS sh FROM documents),
         | ne AS (SELECT doc_id, sh FROM s WHERE len(sh) > 0),
         | sg AS (SELECT doc_id, sh, ${M.signatureFromShingles("sh", 16)} AS sig FROM ne),
         | bands AS (SELECT doc_id, unnest(${M.bandKeyList("sig", 16, 4)}) AS band_key,
         |   unnest(generate_series(0, 3)) AS band_idx FROM sg),
         | cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM bands x JOIN bands y
         |   ON x.band_idx = y.band_idx AND x.band_key = y.band_key AND x.doc_id < y.doc_id),
         | v AS (SELECT a, b,
         |   len(list_filter(list_transform(generate_series(1, 16),
         |     i -> sa.sig[i] = sb.sig[i]), x -> x)) AS n_eq,
         |   len(list_intersect(sa.sh, sb.sh)) AS inter,
         |   len(sa.sh) AS na, len(sb.sh) AS nb
         |   FROM cand JOIN sg sa ON sa.doc_id = a JOIN sg sb ON sb.doc_id = b)
         | SELECT a, b, CAST(n_eq AS BIGINT) AS n_eq,
         |  round(CAST(n_eq AS DOUBLE) / 16, 6) AS est_jaccard,
         |  round(CAST(inter AS DOUBLE) / (na + nb - inter), 6) AS jaccard
         | FROM v ORDER BY a, b""".stripMargin.replaceAll("\n", " ")
    },
    "q203_cmh" -> {
      val n = "(CAST(a + b + c + d AS DOUBLE))"
      val ee = s"(CAST(a + b AS DOUBLE) * CAST(a + c AS DOUBLE) / $n)"
      val ve = s"((CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)) * (CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE)) / ($n * $n * ($n - 1.0)))"
      val rr = s"(CAST(a AS DOUBLE) * CAST(d AS DOUBLE) / $n)"
      val ss = s"(CAST(b AS DOUBLE) * CAST(c AS DOUBLE) / $n)"
      def fold(l: String) =
        s"list_reduce(list_prepend(0.0::DOUBLE, $l), (acc, x) -> acc + x)"
      s"""WITH t AS (SELECT l_returnflag AS g, l_discount > 0.05 AS x,
         |   l_tax > 0.04 AS y FROM lineitem),
         | cells AS (SELECT g,
         |   count(CASE WHEN x AND y THEN 1 END) AS a,
         |   count(CASE WHEN x AND NOT y THEN 1 END) AS b,
         |   count(CASE WHEN NOT x AND y THEN 1 END) AS c,
         |   count(CASE WHEN NOT x AND NOT y THEN 1 END) AS d
         |  FROM t GROUP BY g),
         | per AS (SELECT g, a, $ee AS ee, $ve AS ve, $rr AS rr, $ss AS ss FROM cells),
         | f AS (SELECT count(*) AS n_strata, CAST(sum(a) AS BIGINT) AS sum_a,
         |   ${fold("list(ee ORDER BY g)")} AS sum_e,
         |   ${fold("list(ve ORDER BY g)")} AS sum_v,
         |   ${fold("list(rr ORDER BY g)")} AS sum_r,
         |   ${fold("list(ss ORDER BY g)")} AS sum_s FROM per)
         | SELECT n_strata, sum_a, round(sum_e, 6) AS sum_e,
         |  round(sum_v, 6) AS sum_v,
         |  round(pow(abs(CAST(sum_a AS DOUBLE) - sum_e) - 0.5, 2) / sum_v, 6) AS cmh,
         |  round(sum_r / sum_s, 6) AS or_mh
         | FROM f""".stripMargin.replaceAll("\n", " ")
    },
    "q204_dedup_sweep" -> {
      import graft.dedup.MinHashLSH.{Sql => M}
      val sh = graft.dedup.Dedup.Sql.shingles("text", 3)
      s"""WITH s AS (SELECT doc_id, $sh AS sh FROM documents),
         | ne AS (SELECT doc_id, sh FROM s WHERE len(sh) > 0),
         | sg AS (SELECT doc_id, sh, ${M.signatureFromShingles("sh", 16)} AS sig FROM ne),
         | bands AS (SELECT doc_id, unnest(${M.bandKeyList("sig", 16, 4)}) AS band_key,
         |   unnest(generate_series(0, 3)) AS band_idx FROM sg),
         | cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM bands x JOIN bands y
         |   ON x.band_idx = y.band_idx AND x.band_key = y.band_key AND x.doc_id < y.doc_id),
         | v AS (SELECT a, b, round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
         |     (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 6) AS j
         |   FROM cand JOIN ne sa ON sa.doc_id = a JOIN ne sb ON sb.doc_id = b),
         | th AS (SELECT unnest([0.3::DOUBLE, 0.5::DOUBLE, 0.7::DOUBLE,
         |   0.8::DOUBLE, 0.9::DOUBLE]) AS theta),
         | sel AS (SELECT theta, a, b FROM v JOIN th ON j >= theta),
         | np AS (SELECT theta, count(*) AS n_pairs FROM sel GROUP BY theta),
         | nd AS (SELECT theta, count(DISTINCT id) AS n_docs FROM
         |   (SELECT theta, a AS id FROM sel UNION ALL SELECT theta, b FROM sel)
         |  GROUP BY theta)
         | SELECT np.theta, np.n_pairs, coalesce(nd.n_docs, 0) AS n_docs
         | FROM np LEFT JOIN nd ON nd.theta = np.theta
         | ORDER BY np.theta""".stripMargin.replaceAll("\n", " ")
    },
    "q205_purge_audit" ->
      """WITH e AS (SELECT user_id, event_type FROM events),
        | p AS (SELECT event_type, count(*) AS n_after,
        |   count(CASE WHEN user_id % 13 = 0 THEN 1 END) AS n_residual
        |  FROM e WHERE user_id NOT IN
        |    (SELECT DISTINCT user_id FROM e WHERE user_id % 13 = 0)
        |  GROUP BY event_type)
        | SELECT b.event_type, b.n_before,
        |  coalesce(p.n_after, 0) AS n_after,
        |  b.n_before - coalesce(p.n_after, 0) AS n_deleted,
        |  coalesce(p.n_residual, 0) AS n_residual
        | FROM (SELECT event_type, count(*) AS n_before FROM e GROUP BY event_type) b
        | LEFT JOIN p ON p.event_type = b.event_type
        | ORDER BY b.event_type""".stripMargin.replaceAll("\n", " "),
    "q206_bh_fdr" -> {
      val exp3 = "(CAST(t AS DOUBLE) / 3.0)"
      def term(c: String) = s"pow(CAST($c AS DOUBLE) - $exp3, 2) / $exp3"
      s"""WITH e AS (SELECT event_type,
         |   (epoch_us(ts) // 86400000000) % 3 AS b FROM events),
         | bt AS (SELECT event_type,
         |   count(CASE WHEN b = 0 THEN 1 END) AS n0,
         |   count(CASE WHEN b = 1 THEN 1 END) AS n1,
         |   count(CASE WHEN b = 2 THEN 1 END) AS n2,
         |   count(*) AS t FROM e GROUP BY event_type),
         | sc AS (SELECT event_type, t,
         |   ${term("n0")} + ${term("n1")} + ${term("n2")} AS chi2 FROM bt),
         | rk AS (SELECT event_type, t, chi2, exp(chi2 / -2.0) AS p,
         |   row_number() OVER (ORDER BY exp(chi2 / -2.0), event_type) AS rank,
         |   count(*) OVER () AS m FROM sc),
         | wc AS (SELECT *, CAST(rank AS DOUBLE) / CAST(m AS DOUBLE) * 0.05 AS crit FROM rk),
         | ks AS (SELECT coalesce(max(CASE WHEN p <= crit THEN rank END), 0) AS kstar FROM wc)
         | SELECT event_type, t AS n, round(chi2, 6) AS chi2, round(p, 6) AS p,
         |  CAST(rank AS BIGINT) AS rank, rank <= kstar AS reject
         | FROM wc CROSS JOIN ks ORDER BY rank""".stripMargin
        .replaceAll("\n", " ")
    },
    "q207_set_ops" ->
      """WITH m1 AS (SELECT o_custkey FROM orders WHERE o_totalprice > 150000),
        | m2 AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
        | s1 AS (SELECT DISTINCT o_custkey FROM m1),
        | s2 AS (SELECT DISTINCT o_custkey FROM m2)
        | SELECT 'except_all' AS op, count(*) AS n
        |   FROM (SELECT * FROM m1 EXCEPT ALL SELECT * FROM m2)
        | UNION ALL SELECT 'except_hp_minus_urgent', count(*)
        |   FROM (SELECT * FROM s1 EXCEPT SELECT * FROM s2)
        | UNION ALL SELECT 'except_urgent_minus_hp', count(*)
        |   FROM (SELECT * FROM s2 EXCEPT SELECT * FROM s1)
        | UNION ALL SELECT 'intersect', count(*)
        |   FROM (SELECT * FROM s1 INTERSECT SELECT * FROM s2)
        | UNION ALL SELECT 'intersect_all', count(*)
        |   FROM (SELECT * FROM m1 INTERSECT ALL SELECT * FROM m2)
        | ORDER BY op""".stripMargin.replaceAll("\n", " "),
    "q208_tokenizer_coverage" -> {
      import graft.text.TextOps.{Sql => T}
      val sc = graft.aug.Sampling.Sql.splitCase("doc_id",
        Seq("train" -> 0.9, "test" -> 0.1), 42L)
      s"""WITH sp AS (SELECT doc_id, lang, text, $sc AS split FROM documents),
         | tt AS (SELECT unnest(${T.toks("text")}) AS token FROM sp
         |   WHERE split = 'train'),
         | voc AS (SELECT token FROM (SELECT token, count(*) AS n FROM tt
         |   GROUP BY token ORDER BY n DESC, token LIMIT 256)),
         | te AS (SELECT lang, unnest(${T.toks("text")}) AS token FROM sp
         |   WHERE split = 'test'),
         | j AS (SELECT lang, te.token, voc.token AS vt FROM te
         |   LEFT JOIN voc ON voc.token = te.token)
         | SELECT lang, count(*) AS n_tokens,
         |  count(CASE WHEN vt IS NULL THEN 1 END) AS n_oov,
         |  round(CAST(count(CASE WHEN vt IS NULL THEN 1 END) AS DOUBLE) /
         |    CAST(count(*) AS DOUBLE), 6) AS oov_rate
         | FROM j GROUP BY lang ORDER BY lang""".stripMargin
        .replaceAll("\n", " ")
    },
    "q209_hard_negatives" -> {
      import graft.sim.Ann.{Sql => A}
      import graft.sim.VectorMath.{Sql => V}
      s"""WITH v AS (SELECT vec_id AS id, embedding AS vec, label,
         |   ${V.norm2("embedding")} AS n2 FROM embeddings),
         | sg AS (SELECT id, ${A.signsList("vec", 64, 64)} AS signs FROM v),
         | bk AS (SELECT id, unnest(${A.bucketsFromSigns("signs", 16, 4)}) AS bucket,
         |   unnest(generate_series(0, 15)) AS tbl FROM sg),
         | cand AS (SELECT DISTINCT q.id AS qid, t.id AS tid FROM bk q JOIN bk t
         |   ON q.tbl = t.tbl AND q.bucket = t.bucket AND q.id <> t.id WHERE q.id < 100),
         | p AS (SELECT qid AS a, tid AS b, qv.label AS label_a, tv.label AS label_b,
         |   ${V.dot("qv.vec", "tv.vec")} / (sqrt(qv.n2) * sqrt(tv.n2)) AS cos
         |   FROM cand JOIN v qv ON qv.id = qid JOIN v tv ON tv.id = tid
         |   WHERE qv.label <> tv.label),
         | r AS (SELECT a, b, label_a, label_b, cos,
         |   row_number() OVER (PARTITION BY a ORDER BY cos DESC, b ASC) AS rank FROM p)
         | SELECT a, b, CAST(rank AS BIGINT) AS rank, label_a, label_b,
         |  round(cos, 6) AS cos
         | FROM r WHERE rank <= 3 ORDER BY a, rank""".stripMargin
        .replaceAll("\n", " ")
    },
    "q210_data_card" -> {
      import graft.text.TextOps.{Sql => T}
      s"""WITH d AS (SELECT source, lang,
         |   CAST(${T.tokenCount("text")} AS BIGINT) AS n_toks,
         |   ${T.qualityScore("text")} AS q, ${T.strHash("text")} AS h
         |  FROM documents),
         | base AS (SELECT source, count(*) AS n_docs,
         |   CAST(sum(n_toks) AS BIGINT) AS n_tokens,
         |   count(CASE WHEN n_toks < 20 THEN 1 END) AS n_short,
         |   round(${Stats.Sql.dmean("q")}, 6) AS mean_quality
         |  FROM d GROUP BY source),
         | lc AS (SELECT source, lang, count(*) AS cnt,
         |   row_number() OVER (PARTITION BY source ORDER BY count(*) DESC, lang)
         |     AS rk
         |  FROM d GROUP BY source, lang),
         | langs AS (SELECT source, count(*) AS n_langs,
         |   max(CASE WHEN rk = 1 THEN lang END) AS top_lang FROM lc GROUP BY source),
         | dups AS (SELECT source,
         |   coalesce(sum(CASE WHEN nh > 1 THEN nh END), 0) AS n_dup_docs
         |  FROM (SELECT source, h, count(*) AS nh FROM d GROUP BY source, h)
         |  GROUP BY source)
         | SELECT base.source, n_docs, n_tokens, n_langs, top_lang,
         |  mean_quality, CAST(n_dup_docs AS BIGINT) AS n_dup_docs, n_short
         | FROM base JOIN langs ON langs.source = base.source
         | JOIN dups ON dups.source = base.source
         | ORDER BY base.source""".stripMargin.replaceAll("\n", " ")
    },
    // self-verifying audit (q190/q191 pattern): PQ codebooks are
    // driver-fit model state; anchors + pinned-TRUE invariants
    "q211_pq_quantize" ->
      """SELECT count(*) AS n_vecs, CAST(max(len(embedding)) AS BIGINT) AS dim,
        | CAST(8 AS BIGINT) AS m, CAST(16 AS BIGINT) AS k,
        | CAST(max(len(embedding)) * 8 AS BIGINT) AS bytes_raw,
        | CAST(8 AS BIGINT) AS bytes_pq, TRUE AS codes_valid,
        | TRUE AS assign_ok, TRUE AS qerr_nonneg, TRUE AS qerr_minimal
        | FROM embeddings""".stripMargin.replaceAll("\n", " "),
    "q212_hybrid_rrf" -> {
      import graft.sim.VectorMath.{Sql => V}
      val terms = Seq("join", "hash", "filter")
      val dfAggs = terms.zipWithIndex.map { case (t, i) =>
        s"count(CASE WHEN list_contains(toks, '$t') THEN 1 END) AS df_$i"
      }.mkString(", ")
      val idfs = terms.indices.map { i =>
        val dfD = s"CAST(df_$i AS DOUBLE)"
        s"ln((CAST(n_docs AS DOUBLE) - $dfD + 0.5) / ($dfD + 0.5) + 1.0) AS idf_$i"
      }.mkString(", ")
      val score = terms.zipWithIndex.map { case (t, i) =>
        val tf = s"CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE)"
        s"idf_$i * $tf / ($tf + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl))"
      }.mkString(" + ")
      s"""WITH b AS (SELECT doc_id, string_split(text, ' ') AS toks,
         |   len(string_split(text, ' ')) AS dl FROM documents),
         | st AS (SELECT count(*) AS n_docs,
         |   ${dsumSql("dl")} / CAST(count(*) AS DOUBLE) AS avgdl, $dfAggs FROM b),
         | co AS (SELECT n_docs, avgdl, $idfs FROM st),
         | lexcut AS (SELECT doc_id, $score AS score FROM b, co
         |   ORDER BY score DESC, doc_id LIMIT 100),
         | lex AS (SELECT doc_id AS id,
         |   row_number() OVER (ORDER BY score DESC, doc_id) AS rank_lex FROM lexcut),
         | ve AS (SELECT vec_id AS id, embedding AS vec,
         |   ${V.norm2("embedding")} AS n2 FROM embeddings),
         | qv AS (SELECT vec AS qvec, n2 AS qn2 FROM ve WHERE id = 0),
         | semcut AS (SELECT ve.id,
         |   ${V.dot("ve.vec", "qv.qvec")} / (sqrt(ve.n2) * sqrt(qv.qn2)) AS cos
         |   FROM ve, qv WHERE ve.id <> 0 ORDER BY cos DESC, ve.id LIMIT 100),
         | sem AS (SELECT id,
         |   row_number() OVER (ORDER BY cos DESC, id) AS rank_sem FROM semcut),
         | fused AS (SELECT coalesce(lex.id, sem.id) AS id,
         |   CAST(coalesce(rank_lex, 0) AS BIGINT) AS rank_lex,
         |   CAST(coalesce(rank_sem, 0) AS BIGINT) AS rank_sem,
         |   coalesce(1.0 / (60 + rank_lex), 0.0) +
         |     coalesce(1.0 / (60 + rank_sem), 0.0) AS rrf
         |  FROM lex FULL OUTER JOIN sem ON lex.id = sem.id)
         | SELECT id, rank_lex, rank_sem, round(rrf, 6) AS rrf
         | FROM fused ORDER BY rrf DESC, id LIMIT 20""".stripMargin
        .replaceAll("\n", " ")
    },
    "q213_video_meta" ->
      """SELECT doc_id, 'mp4' AS format,
        |  CASE WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END AS major_brand,
        |  ([600, 1000, 24000, 30000, 90000])[CAST(doc_id % 5 AS INTEGER) + 1]::BIGINT AS timescale,
        |  CAST((doc_id % 120 + 1) * 500 AS BIGINT) AS duration_ms,
        |  CAST(doc_id % 3 + 1 AS BIGINT) AS n_tracks
        | FROM documents ORDER BY doc_id""".stripMargin.replaceAll("\n", " "),
    "q214_count_min" -> {
      import graft.text.TextOps.{Sql => T}
      val P = graft.text.TextOps.P
      def cell(j: String, key: String) =
        s"((((2*$j + 1) * ${T.strHash(key)} + 7919*$j + 12345) % $P) % 256)"
      s"""WITH k AS (SELECT CAST(l_partkey AS VARCHAR) AS key FROM lineitem),
         | js AS (SELECT unnest(generate_series(0, 3)) AS j),
         | rows_ AS (SELECT j, ${cell("j", "key")} AS h FROM k CROSS JOIN js),
         | counters AS (SELECT j, h, count(*) AS c FROM rows_ GROUP BY j, h),
         | cells AS (SELECT partkey, j, ${cell("j", "CAST(partkey AS VARCHAR)")} AS h
         |   FROM (SELECT unnest(generate_series(1, 20)) AS partkey) CROSS JOIN js),
         | est AS (SELECT partkey, min(c) AS est FROM cells
         |   JOIN counters USING (j, h) GROUP BY partkey),
         | truth AS (SELECT CAST(key AS BIGINT) AS partkey, count(*) AS true_cnt
         |   FROM k WHERE CAST(key AS BIGINT) BETWEEN 1 AND 20 GROUP BY key)
         | SELECT CAST(truth.partkey AS BIGINT) AS partkey, true_cnt,
         |  CAST(est AS BIGINT) AS est, est >= true_cnt AS est_ge_true,
         |  CAST(est - true_cnt AS BIGINT) AS overestimate
         | FROM truth JOIN est ON est.partkey = truth.partkey
         | ORDER BY partkey""".stripMargin.replaceAll("\n", " ")
    },
    // q45-pattern self-verifying audit: PQ codebooks + IVF cells are
    // driver-fit model state; the oracle pins the in-query recall
    // floor and cosine validity TRUE
    "q215_ivfpq_ann" ->
      """SELECT count(*) AS n_queries, CAST(3 AS BIGINT) AS k,
        | CAST(8 AS BIGINT) AS pq_m, CAST(256 AS BIGINT) AS pq_k,
        | TRUE AS recall_ge_floor, TRUE AS cos_in_range
        | FROM embeddings WHERE vec_id < 100""".stripMargin
        .replaceAll("\n", " "),
    // the oracle recomputes the VIEW from the full table; ivm_ok (the
    // incremental == full-recompute parity, provable only because the
    // aggregate state is mergeable + decimal-exact) is pinned TRUE
    "q216_incremental_agg" ->
      """SELECT o_orderpriority AS g, count(*) AS n,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE), 4)
        |    AS sum_price, TRUE AS ivm_ok
        | FROM orders GROUP BY o_orderpriority ORDER BY g""".stripMargin
        .replaceAll("\n", " "),
    "q217_attribution" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
        |   CAST(value AS DOUBLE) AS v FROM events),
        | p AS (SELECT user_id, event_id AS p_id, us AS p_us, v FROM e
        |   WHERE event_type = 'purchase'),
        | t AS (SELECT user_id, event_type AS touch_type, us AS t_us FROM e
        |   WHERE event_type <> 'purchase'),
        | pr AS (SELECT p_id, v, touch_type FROM p JOIN t USING (user_id)
        |   WHERE t_us < p_us AND t_us >= p_us - 604800000000),
        | cn AS (SELECT p_id, count(*) AS n_touches FROM pr GROUP BY p_id),
        | cr AS (SELECT touch_type,
        |   CAST(round(v * 1000000.0 / CAST(n_touches AS DOUBLE)) AS BIGINT)
        |     AS credit_micro
        |  FROM pr JOIN cn USING (p_id)),
        | dr AS (SELECT 'direct' AS touch_type,
        |   CAST(round(v * 1000000.0) AS BIGINT) AS credit_micro
        |  FROM p WHERE p_id NOT IN (SELECT p_id FROM cn)),
        | u AS (SELECT * FROM cr UNION ALL SELECT * FROM dr)
        | SELECT touch_type, count(*) AS n_credited,
        |  round(CAST(sum(credit_micro) AS DOUBLE) / 1000000.0, 4) AS credit
        | FROM u GROUP BY touch_type ORDER BY touch_type""".stripMargin
        .replaceAll("\n", " "),
    "q218_holt_winters" -> {
      // state s: [level, trend, season_1..season_12]; each series value
      // is pre-wrapped to the same 14-wide shape so list_reduce's
      // first-element init matches the Spark fold's init exactly
      val lNew = "0.5 * (x[1] - s[3]) + (1.0 - 0.5) * (s[1] + s[2])"
      val bNew = s"0.3 * (($lNew) - s[1]) + (1.0 - 0.3) * s[2]"
      val seasNew = s"0.2 * (x[1] - ($lNew)) + (1.0 - 0.2) * s[3]"
      s"""WITH monthly AS (SELECT n_name,
         |   CAST(year(o_orderdate) AS INT) * 12 + CAST(month(o_orderdate) AS INT) AS ym,
         |   ${Stats.Sql.dsumWide("o_totalprice")} AS rev
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name, ym),
         | ser AS (SELECT n_name, list(rev ORDER BY ym) AS l
         |   FROM monthly GROUP BY n_name),
         | hs AS (SELECT n_name, CAST(len(l) AS BIGINT) AS n,
         |   list_reduce(
         |     list_transform(l, v -> list_concat([v, 0.0],
         |       list_transform(generate_series(1, 12), i -> 0.0))),
         |     (s, x) -> list_concat(list_concat([$lNew, $bNew], s[4:]),
         |       [$seasNew])) AS st
         |  FROM ser)
         | SELECT n_name, n, round(st[1], 6) AS level,
         |  round(st[2], 6) AS trend, round(st[3], 6) AS next_season,
         |  round(st[1] + st[2] + st[3], 6) AS forecast FROM hs
         | ORDER BY n_name""".stripMargin.replaceAll("\n", " ")
    },
    "q219_conformal" -> {
      val sc = graft.aug.Sampling.Sql.splitCase("o_orderkey",
        Seq("train" -> 0.5, "cal" -> 0.25, "test" -> 0.25), 42L)
      s"""WITH o AS (SELECT o_orderkey, o_orderpriority AS seg,
         |   CAST(o_totalprice AS DOUBLE) AS y, $sc AS split FROM orders),
         | m AS (SELECT seg, ${Stats.Sql.dmean("y")} AS yhat FROM o
         |   WHERE split = 'train' GROUP BY seg),
         | cal AS (SELECT abs(y - yhat) AS r FROM o JOIN m USING (seg)
         |   WHERE split = 'cal'),
         | qh AS (SELECT count(*) AS n_cal, quantile_cont(r, 0.9) AS qhat
         |   FROM cal),
         | te AS (SELECT count(*) AS n_test,
         |   count(CASE WHEN abs(y - yhat) <= qhat THEN 1 END) AS n_covered
         |  FROM o JOIN m USING (seg) CROSS JOIN qh WHERE split = 'test')
         | SELECT n_cal, round(qhat, 4) AS qhat, n_test, n_covered,
         |  round(CAST(n_covered AS DOUBLE) / CAST(n_test AS DOUBLE), 6)
         |    AS coverage
         | FROM te CROSS JOIN qh""".stripMargin.replaceAll("\n", " ")
    },
    "q220_forecast_backtest" -> {
      // state s: [level, trend, sum_abs_err, sum_abs_naive, prev];
      // each value pre-wrapped to the same 5-wide shape so
      // list_reduce's first-element init matches the Spark fold
      val lNew = "0.5 * x[1] + (1.0 - 0.5) * (s[1] + s[2])"
      s"""WITH monthly AS (SELECT n_name,
         |   CAST(year(o_orderdate) AS INT) * 12 + CAST(month(o_orderdate) AS INT) AS ym,
         |   ${Stats.Sql.dsumWide("o_totalprice")} AS rev
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name, ym),
         | ser AS (SELECT n_name, list(rev ORDER BY ym) AS l
         |   FROM monthly GROUP BY n_name),
         | hs AS (SELECT n_name, CAST(len(l) AS BIGINT) AS n,
         |   list_reduce(list_transform(l, v -> [v, 0.0, 0.0, 0.0, v]),
         |     (s, x) -> [$lNew,
         |       0.3 * (($lNew) - s[1]) + (1.0 - 0.3) * s[2],
         |       s[3] + abs(x[1] - (s[1] + s[2])),
         |       s[4] + abs(x[1] - s[5]), x[1]]) AS st
         |  FROM ser)
         | SELECT n_name, n,
         |  round(CASE WHEN n > 1 THEN st[3] / CAST(n - 1 AS DOUBLE) END, 6) AS mae,
         |  round(CASE WHEN n > 1 THEN st[4] / CAST(n - 1 AS DOUBLE) END, 6) AS mae_naive,
         |  round(CASE WHEN n > 1 AND st[4] > 0.0 THEN 1.0 - st[3] / st[4] END, 6) AS skill
         | FROM hs ORDER BY n_name""".stripMargin.replaceAll("\n", " ")
    },
    // the PNG pixel formula mirrored in exact integer arithmetic: the
    // Spark side must reproduce EVERY decoded byte (deflate → inflate
    // → five defilters) for sum_px to match
    "q221_png_decode" ->
      """WITH ids AS (SELECT doc_id, doc_id % 13 + 4 AS w,
        |   doc_id % 11 + 4 AS h FROM documents WHERE doc_id < 60),
        | px AS (SELECT i.doc_id, c.c AS channel, i.w * i.h AS n,
        |   ((x.x * 7 + y.y * 13 + c.c * 101 + i.doc_id * 31) % 256) AS v
        |  FROM ids i, range(0, 16) x(x), range(0, 14) y(y),
        |   range(0, 3) c(c)
        |  WHERE x.x < i.w AND y.y < i.h)
        | SELECT doc_id, CAST(channel AS BIGINT) AS channel,
        |  CAST(count(*) AS BIGINT) AS n_px,
        |  CAST(sum(v) AS BIGINT) AS sum_px,
        |  round(CAST(sum(v) AS DOUBLE) / count(*), 6) AS mean_px,
        |  round(sqrt(greatest(CAST(0 AS DOUBLE),
        |    CAST(sum(v * v) AS DOUBLE) / count(*) -
        |    (CAST(sum(v) AS DOUBLE) / count(*)) *
        |    (CAST(sum(v) AS DOUBLE) / count(*)))), 6) AS std_px
        | FROM px GROUP BY doc_id, channel
        | ORDER BY doc_id, channel""".stripMargin.replaceAll("\n", " "),
    "q222_cluster_safe_split" -> {
      val sh = graft.dedup.Dedup.Sql.shingles("text", 3)
      val bucket = graft.aug.Sampling.Sql.keyBucket("root", 42L)
      s"""WITH s AS (SELECT doc_id, $sh AS sh FROM documents),
         | e AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
         | ep AS (SELECT doc_id, shingle FROM e WHERE shingle NOT IN (
         |   SELECT shingle FROM e GROUP BY shingle HAVING count(*) > 256)),
         | sz AS (SELECT doc_id, len(sh) AS n_sh FROM s),
         | i AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
         |   FROM ep x JOIN ep y ON x.shingle = y.shingle AND x.doc_id < y.doc_id GROUP BY 1, 2),
         | p AS (SELECT a, b FROM i JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
         |   WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.5),
         | ed AS (SELECT a AS src, b AS dst FROM p UNION SELECT b, a FROM p),
         | verts AS (SELECT DISTINCT src AS id FROM ed),
         | reach AS (WITH RECURSIVE rr(id, r) AS (
         |     SELECT id, id FROM verts
         |     UNION
         |     SELECT ed.src, rr.r FROM ed JOIN rr ON rr.id = ed.dst)
         |   SELECT * FROM rr),
         | comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
         | r2 AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS root
         |   FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
         | sp AS (SELECT doc_id, root,
         |   CASE WHEN $bucket < 900000 THEN 'train' ELSE 'test' END AS split FROM r2),
         | st AS (SELECT count(*) = 0 AS no_leak FROM (
         |   SELECT root FROM sp GROUP BY root HAVING count(DISTINCT split) > 1))
         | SELECT split, count(*) AS n_docs,
         |  CAST(count(DISTINCT root) AS BIGINT) AS n_clusters,
         |  no_leak AS no_leakage
         | FROM sp CROSS JOIN st GROUP BY split, no_leak
         | ORDER BY split""".stripMargin.replaceAll("\n", " ")
    },
    "q223_token_budget" -> {
      val toks = graft.text.TextOps.Sql.toks("text")
      s"""WITH t AS (SELECT doc_id, source, $toks AS toks FROM documents),
         | d AS (SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_tok,
         |   CAST(len(list_distinct(toks)) AS BIGINT) AS u
         |  FROM t WHERE len(toks) > 0),
         | k AS (SELECT *,
         |   (1000000 - (u * 1000000) // n_tok) * 8589934592 + doc_id AS key FROM d),
         | b AS (SELECT sum(n_tok) // 4 AS budget FROM d),
         | c AS (SELECT *, sum(n_tok) OVER (ORDER BY key
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM k)
         | SELECT source, count(*) AS n_selected,
         |  CAST(sum(n_tok) AS BIGINT) AS tokens_selected
         | FROM c CROSS JOIN b WHERE cum <= budget
         | GROUP BY source ORDER BY source""".stripMargin.replaceAll("\n", " ")
    },
    "q224_knn_join" -> {
      import graft.sim.VectorMath.{Sql => V}
      s"""WITH v AS (SELECT vec_id AS id, embedding AS vec, ${V.norm2("embedding")} AS n2 FROM embeddings),
         | p AS (SELECT x.id AS a, y.id AS b,
         |   ${V.dot("x.vec", "y.vec")} / (sqrt(x.n2) * sqrt(y.n2)) AS cos
         |   FROM v x JOIN v y ON y.id >= 50 WHERE x.id < 50),
         | r AS (SELECT a, b, cos, row_number() OVER (PARTITION BY a ORDER BY cos DESC, b ASC) AS rank FROM p)
         | SELECT a, b, rank, round(cos, 6) AS cos FROM r WHERE rank <= 3
         | ORDER BY a, rank""".stripMargin.replaceAll("\n", " ")
    },
    "q225_domain_weights" -> {
      val sc = graft.text.BigramLm.Sql.score("documents", "doc_id", "text")
      s"""WITH sc AS ($sc),
         | wl AS (SELECT sc.id, sc.avg_logp, d.lang
         |   FROM sc JOIN documents d ON d.doc_id = sc.id),
         | per AS (SELECT lang, count(*) AS n_docs,
         |   ${Stats.Sql.dsum("avg_logp")} / count(*) AS m FROM wl GROUP BY lang),
         | alla AS (SELECT ${Stats.Sql.dsum("avg_logp")} / count(*) AS m_all,
         |   count(*) AS n_all FROM wl),
         | j AS (SELECT lang, n_docs, m,
         |   greatest(CAST(0 AS DOUBLE), m_all - m) AS excess,
         |   round((CAST(n_docs AS DOUBLE) / CAST(n_all AS DOUBLE)) *
         |     (1.0 + greatest(CAST(0 AS DOUBLE), m_all - m)), 6) AS wr
         |  FROM per CROSS JOIN alla),
         | z AS (SELECT ${Stats.Sql.dsum("wr")} AS z FROM j)
         | SELECT lang, n_docs, round(m, 6) AS mean_logp,
         |  round(excess, 6) AS excess_loss, round(wr / z, 6) AS weight
         | FROM j CROSS JOIN z ORDER BY lang""".stripMargin.replaceAll("\n", " ")
    },
    "q226_matryoshka" -> {
      import graft.sim.VectorMath.{Sql => V}
      val ds = graft.core.Stats.Sql.dsum _
      s"""WITH v AS (SELECT vec_id AS id, embedding AS vec,
         |   embedding[1:16] AS v16, ${V.norm2("embedding")} AS n2,
         |   ${V.norm2("embedding[1:16]")} AS n2_16 FROM embeddings),
         | p AS (SELECT x.id AS a, y.id AS b,
         |   round(${V.dot("x.vec", "y.vec")} / (sqrt(x.n2) * sqrt(y.n2)), 6) AS c64,
         |   round(${V.dot("x.v16", "y.v16")} / (sqrt(x.n2_16) * sqrt(y.n2_16)), 6) AS c16
         |  FROM v x JOIN v y ON y.id >= 30 AND y.id < 130 AND x.id <> y.id
         |  WHERE x.id < 30),
         | top AS (SELECT a,
         |   max(b) FILTER (WHERE r64 = 1) AS t64, max(b) FILTER (WHERE r16 = 1) AS t16
         |  FROM (SELECT a, b,
         |    row_number() OVER (PARTITION BY a ORDER BY c64 DESC, b ASC) AS r64,
         |    row_number() OVER (PARTITION BY a ORDER BY c16 DESC, b ASC) AS r16 FROM p)
         |  GROUP BY a),
         | m AS (SELECT a, count(*) AS n_targets,
         |   (CAST(count(*) AS DOUBLE) * ${ds("c64 * c16")} - ${ds("c64")} * ${ds("c16")}) /
         |   (sqrt(CAST(count(*) AS DOUBLE) * ${ds("c64 * c64")} - ${ds("c64")} * ${ds("c64")}) *
         |    sqrt(CAST(count(*) AS DOUBLE) * ${ds("c16 * c16")} - ${ds("c16")} * ${ds("c16")})) AS corr
         |  FROM p GROUP BY a)
         | SELECT m.a, m.n_targets, round(m.corr, 6) AS corr_64_16,
         |  (top.t64 = top.t16) AS top1_match
         | FROM m JOIN top ON top.a = m.a ORDER BY m.a""".stripMargin.replaceAll("\n", " ")
    },
    // BPE trainer audit: rounds ≥2 depend on merged state (not SQL-
    // replayable), but round 1's argmax IS — plus the corpus anchors —
    // and the oracle pins the trainer's invariant booleans TRUE
    "q227_bpe_train" -> {
      val toks = graft.text.TextOps.Sql.toks("text")
      s"""WITH tk AS (SELECT unnest($toks) AS w FROM documents),
         | wc AS (SELECT w, count(*) AS c FROM tk GROUP BY w),
         | bg AS (SELECT substr(w, CAST(i AS INT), 2) AS pair, c FROM (
         |   SELECT w, c, unnest(generate_series(1, length(w) - 1)) AS i FROM wc)),
         | pc AS (SELECT pair, sum(c) AS cnt FROM bg GROUP BY pair),
         | fm AS (SELECT pair FROM pc ORDER BY cnt DESC, pair ASC LIMIT 1)
         | SELECT CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(c) AS BIGINT) AS total_tokens,
         |  CAST(sum(length(w) * c) AS BIGINT) AS total_chars,
         |  CAST(6 AS BIGINT) AS n_merges,
         |  (SELECT pair FROM fm) AS first_merge,
         |  TRUE AS symbols_decreasing, TRUE AS merges_positive,
         |  TRUE AS merged_pairs_eliminated, TRUE AS concat_ok
         | FROM wc""".stripMargin.replaceAll("\n", " ")
    },
    "q228_zipf_fit" -> {
      val toks = graft.text.TextOps.Sql.toks("text")
      val ds = graft.core.Stats.Sql.dsum _
      s"""WITH tk AS (SELECT unnest($toks) AS w FROM documents),
         | vc AS (SELECT w, count(*) AS cnt FROM tk GROUP BY w),
         | rk AS (SELECT round(ln(CAST(row_number() OVER (ORDER BY cnt DESC, w ASC) AS DOUBLE)), 6) AS x,
         |   round(ln(CAST(cnt AS DOUBLE)), 6) AS y FROM vc),
         | m AS (SELECT CAST(count(*) AS BIGINT) AS n_vocab,
         |   (CAST(count(*) AS DOUBLE) * ${ds("x * y")} - ${ds("x")} * ${ds("y")}) /
         |   (CAST(count(*) AS DOUBLE) * ${ds("x * x")} - ${ds("x")} * ${ds("x")}) AS slope,
         |   ${ds("y")} / CAST(count(*) AS DOUBLE) AS my,
         |   ${ds("x")} / CAST(count(*) AS DOUBLE) AS mx
         |  FROM rk)
         | SELECT n_vocab, round(slope, 6) AS zipf_slope,
         |  round(my - slope * mx, 6) AS intercept FROM m""".stripMargin
        .replaceAll("\n", " ")
    },
    // BPE encode audit: encoded state is merge-order-dependent; the
    // oracle pins corpus anchors + the dual-path/fertility booleans
    "q229_bpe_encode" -> {
      val toks = graft.text.TextOps.Sql.toks("text")
      s"""WITH tk AS (SELECT unnest($toks) AS w FROM documents),
         | wc AS (SELECT w, count(*) AS c FROM tk GROUP BY w)
         | SELECT CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(c) AS BIGINT) AS total_word_occurrences,
         |  CAST(sum(length(w) * c) AS BIGINT) AS total_chars,
         |  CAST(6 AS BIGINT) AS n_merges,
         |  TRUE AS dual_path_ok, TRUE AS fert_ge_1, TRUE AS compressed
         | FROM wc""".stripMargin.replaceAll("\n", " ")
    },
    "q230_skew_report" -> {
      def leg(rel: String, key: String, label: String): String =
        s"""SELECT '$label' AS key_col, CAST(n AS BIGINT) AS n_keys,
           | CAST(total AS BIGINT) AS n_rows, CAST(maxf AS BIGINT) AS max_freq,
           | CAST(total * 1000000 // n AS BIGINT) AS mean_freq_e6,
           | CAST(maxf * n * 1000000 // total AS BIGINT) AS skew_ratio_e6,
           | CAST((2 * gn - (n + 1) * total) * 1000000 // (n * total) AS BIGINT) AS gini_e6
           | FROM (SELECT count(*) AS n, sum(f) AS total, max(f) AS maxf,
           |   sum(rnk * f) AS gn FROM (
           |   SELECT f, row_number() OVER (ORDER BY f, k) AS rnk FROM (
           |     SELECT $key AS k, count(*) AS f FROM $rel GROUP BY 1)))""".stripMargin
      (leg("lineitem", "l_orderkey", "lineitem.l_orderkey") +
        " UNION ALL " + leg("events", "user_id", "events.user_id") +
        " ORDER BY key_col").replaceAll("\n", " ")
    },
    "q231_ngram_novelty" -> {
      val toks = graft.text.TextOps.Sql.toks("text")
      s"""WITH t AS (SELECT doc_id, source, $toks AS toks FROM documents),
         | g AS (SELECT doc_id, source, unnest(list_distinct(
         |   CASE WHEN len(toks) >= 5 THEN list_transform(
         |     generate_series(1, len(toks) - 4),
         |     i -> array_to_string(toks[i:i+4], ' '))
         |   ELSE [] END)) AS g FROM t),
         | fo AS (SELECT g, min(doc_id) AS first_doc FROM g GROUP BY g),
         | pd AS (SELECT doc_id, source, count(*) AS n_grams,
         |   count(CASE WHEN first_doc = doc_id THEN 1 END) AS n_novel
         |  FROM g JOIN fo USING (g) GROUP BY doc_id, source)
         | SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_grams) AS BIGINT) AS n_grams,
         |  CAST(sum(n_novel) AS BIGINT) AS n_novel,
         |  CAST(sum(n_novel) * 1000000 // sum(n_grams) AS BIGINT) AS novelty_e6
         | FROM pd GROUP BY source ORDER BY source""".stripMargin
        .replaceAll("\n", " ")
    },
    // the WAV sample formula mirrored in exact integer arithmetic: the
    // Spark side must reproduce EVERY int16 sample (RIFF chunk walk →
    // LE decode) for sum_sq to match
    "q232_wav_decode" ->
      """WITH ids AS (SELECT doc_id, doc_id % 2 + 1 AS ch,
        |   40 + (doc_id % 20) * 5 AS frames
        |  FROM documents WHERE doc_id < 80),
        | sm AS (SELECT i.doc_id, c.c AS channel,
        |   ((s.i * 7 + c.c * 101 + i.doc_id * 31) % 4001) - 2000 AS v
        |  FROM ids i, range(0, 135) s(i), range(0, 2) c(c)
        |  WHERE s.i < i.frames AND c.c < i.ch)
        | SELECT doc_id, CAST(channel AS BIGINT) AS channel,
        |  CAST(count(*) AS BIGINT) AS n_samp,
        |  CAST(sum(v) AS BIGINT) AS sum_s,
        |  CAST(sum(v * v) AS BIGINT) AS sum_sq,
        |  CAST(max(abs(v)) AS BIGINT) AS peak_abs,
        |  round(CAST(sum(v) AS DOUBLE) / count(*), 6) AS mean_s,
        |  round(sqrt(CAST(sum(v * v) AS DOUBLE) / count(*)), 6) AS rms_s
        | FROM sm GROUP BY doc_id, channel
        | ORDER BY doc_id, channel""".stripMargin.replaceAll("\n", " "),
    // the GIF palette→pixel formula mirrored exactly: the Spark side
    // must reproduce EVERY LZW-decoded index for sum_px to match
    "q233_gif_decode" ->
      """WITH ids AS (SELECT doc_id, doc_id % 12 + 4 AS w,
        |   doc_id % 9 + 4 AS h FROM documents WHERE doc_id < 60),
        | px AS (SELECT i.doc_id, c.c AS channel,
        |   (((x.x * 5 + y.y * 11 + i.doc_id) % 16) *
        |     (CASE c.c WHEN 0 THEN 17 WHEN 1 THEN 29 ELSE 23 END) +
        |    i.doc_id * (CASE c.c WHEN 0 THEN 7 WHEN 1 THEN 13 ELSE 3 END))
        |    % 256 AS v
        |  FROM ids i, range(0, 15) x(x), range(0, 12) y(y), range(0, 3) c(c)
        |  WHERE x.x < i.w AND y.y < i.h)
        | SELECT doc_id, CAST(channel AS BIGINT) AS channel,
        |  CAST(count(*) AS BIGINT) AS n_px,
        |  CAST(sum(v) AS BIGINT) AS sum_px,
        |  round(CAST(sum(v) AS DOUBLE) / count(*), 6) AS mean_px,
        |  round(sqrt(greatest(CAST(0 AS DOUBLE),
        |    CAST(sum(v * v) AS DOUBLE) / count(*) -
        |    (CAST(sum(v) AS DOUBLE) / count(*)) *
        |    (CAST(sum(v) AS DOUBLE) / count(*)))), 6) AS std_px
        | FROM px GROUP BY doc_id, channel
        | ORDER BY doc_id, channel""".stripMargin.replaceAll("\n", " "),
    // the JPEG DC-block formula mirrored exactly: flat 8x8 blocks at
    // quant 16 decode to clamp(dc*2 + 128); the DC diff chain means
    // the Spark side must Huffman-decode the whole stream correctly
    "q234_jpeg_decode" ->
      """WITH ids AS (SELECT doc_id, doc_id % 3 + 1 AS bw,
        |   doc_id % 2 + 1 AS bh FROM documents WHERE doc_id < 60),
        | blk AS (SELECT i.doc_id,
        |   least(255, greatest(0,
        |     ((x.x * 5 + y.y * 9 + i.doc_id * 13) % 200 - 100) * 2 + 128))
        |   AS v
        |  FROM ids i, range(0, 3) x(x), range(0, 2) y(y)
        |  WHERE x.x < i.bw AND y.y < i.bh)
        | SELECT doc_id,
        |  CAST(64 * count(*) AS BIGINT) AS n_px,
        |  CAST(64 * sum(v) AS BIGINT) AS sum_px,
        |  round(CAST(sum(v) AS DOUBLE) / count(*), 6) AS mean_px,
        |  round(sqrt(greatest(CAST(0 AS DOUBLE),
        |    CAST(sum(v * v) AS DOUBLE) / count(*) -
        |    (CAST(sum(v) AS DOUBLE) / count(*)) *
        |    (CAST(sum(v) AS DOUBLE) / count(*)))), 6) AS std_px
        | FROM blk GROUP BY doc_id ORDER BY doc_id""".stripMargin
      .replaceAll("\n", " "),
    // the oracle recomputes the aggregates from BASE columns and pins
    // json_ok TRUE — any to_json/from_json loss flips the audit column
    "q235_json_roundtrip" ->
      """SELECT source, count(*) AS n_docs,
        | CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_words,
        | CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        | TRUE AS json_ok
        | FROM documents GROUP BY source ORDER BY source""".stripMargin
      .replaceAll("\n", " "),
    "q236_winnowing" -> {
      val toks = graft.text.TextOps.Sql.toks("text")
      val h = graft.text.TextOps.Sql.strHash("array_to_string(toks[i:i+3], ' ')")
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         | t2 AS (SELECT doc_id, list_transform(
         |    generate_series(1, len(toks) - 3), i -> $h) AS hs
         |  FROM t WHERE len(toks) >= 4),
         | g AS (SELECT doc_id,
         |   unnest(generate_series(1, len(hs))) - 1 AS pos,
         |   unnest(hs) AS hh FROM t2),
         | wmin AS (SELECT doc_id, pos, min(hh) OVER (PARTITION BY doc_id
         |   ORDER BY pos ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp
         |  FROM g),
         | f AS (SELECT DISTINCT doc_id, fp FROM wmin WHERE pos >= 3),
         | st AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS corpus_docs,
         |   CAST(count(*) AS BIGINT) AS corpus_fps FROM f),
         | p AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS shared_fps
         |  FROM f x JOIN f y ON x.fp = y.fp AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2)
         | SELECT a, b, shared_fps, corpus_docs, corpus_fps
         | FROM p CROSS JOIN st
         | ORDER BY shared_fps DESC, a, b LIMIT 15""".stripMargin
        .replaceAll("\n", " ")
    },
    // subset -> truth -> candidates -> blocked matches, end-to-end;
    // DuckDB levenshtein == Spark levenshtein (q129-established)
    "q237_blocking_quality" ->
      """WITH c AS (SELECT c_custkey AS id, c_name AS name FROM customer
        |   WHERE c_custkey < 1500),
        | m AS (SELECT count(*) AS n_eval FROM c),
        | tr AS (SELECT count(*) AS n_truth FROM c a JOIN c b
        |   ON a.id < b.id AND levenshtein(a.name, b.name) <= 1),
        | k AS (SELECT substr(name, 1, 16) AS blk, id FROM c),
        | cd AS (SELECT count(*) AS n_cand FROM k x JOIN k y
        |   ON x.blk = y.blk AND x.id < y.id),
        | fd AS (SELECT count(*) AS n_found FROM c a JOIN c b
        |   ON substr(a.name, 1, 16) = substr(b.name, 1, 16)
        |   AND a.id < b.id AND levenshtein(a.name, b.name) <= 1)
        | SELECT n_eval, n_eval * (n_eval - 1) // 2 AS n_allpairs,
        |  n_truth, n_cand AS n_candidates, n_found,
        |  1000000 - CASE WHEN n_eval > 1
        |    THEN n_cand * 1000000 // (n_eval * (n_eval - 1) // 2)
        |    ELSE 0 END AS reduction_e6,
        |  CASE WHEN n_truth > 0 THEN n_found * 1000000 // n_truth
        |    ELSE 1000000 END AS completeness_e6
        | FROM m CROSS JOIN tr CROSS JOIN cd CROSS JOIN fd""".stripMargin
      .replaceAll("\n", " "),
    // self-verifying audit (zlib byte counts are not mirrorable): the
    // oracle pins doc counts + the three structural invariants
    "q238_compression_signal" ->
      """SELECT source, count(*) AS n_docs, TRUE AS ratio_bounded,
        | TRUE AS dup_compresses, TRUE AS repetition_beats_novelty
        | FROM documents GROUP BY source ORDER BY source""".stripMargin
      .replaceAll("\n", " "),
    // full LOF replay: kNN -> k-distance -> reachability -> lrd -> LOF,
    // every derived quantity in micro-unit integers
    "q239_lof" -> {
      import graft.sim.VectorMath.{Sql => V}
      s"""WITH v AS (SELECT vec_id AS id, embedding AS vec,
         |   ${V.norm2("embedding")} AS n2 FROM embeddings WHERE vec_id < 250),
         | p AS (SELECT x.id AS a, y.id AS b,
         |   1.0 - ${V.dot("x.vec", "y.vec")} / (sqrt(x.n2) * sqrt(y.n2)) AS dist
         |  FROM v x JOIN v y ON x.id <> y.id),
         | r AS (SELECT a, b, dist, row_number() OVER (PARTITION BY a
         |   ORDER BY dist ASC, b ASC) AS rank FROM p),
         | knn AS (SELECT a, b, CAST(round(dist * 1e6) AS BIGINT) AS dm
         |  FROM r WHERE rank <= 5),
         | kd AS (SELECT a, max(dm) AS kdm FROM knn GROUP BY a),
         | re AS (SELECT knn.a, knn.b, greatest(kd.kdm, knn.dm) AS rm
         |  FROM knn JOIN kd ON kd.a = knn.b),
         | lrd AS (SELECT a, CAST(round(count(*) * 1e12 /
         |   CAST(sum(rm) AS DOUBLE)) AS BIGINT) AS lm FROM re GROUP BY a),
         | sb AS (SELECT knn.a, sum(l2.lm) AS slb, count(*) AS nb FROM knn
         |  JOIN lrd l2 ON l2.a = knn.b GROUP BY knn.a)
         | SELECT sb.a AS id, kd.kdm AS k_dist_micro, lrd.lm AS lrd_micro,
         |  round(CAST(slb AS DOUBLE) / (CAST(nb AS DOUBLE) * CAST(lrd.lm AS DOUBLE)), 6)
         |   AS lof
         | FROM sb JOIN lrd ON lrd.a = sb.a JOIN kd ON kd.a = sb.a
         | ORDER BY lof DESC, id LIMIT 10""".stripMargin.replaceAll("\n", " ")
    },
    // the oracle clusters from the O(n^2) pair join -- the grid-blocked
    // candidate set is complete, so Spark must agree exactly
    "q240_dbscan" ->
      """WITH pts AS (SELECT doc_id AS id,
        |   CASE WHEN doc_id % 4 < 3
        |     THEN (doc_id % 4) * 1000 + (doc_id * 7) % 100
        |     ELSE 3000 + (doc_id * 31) % 3000 END AS x,
        |   CASE WHEN doc_id % 4 < 3
        |     THEN (doc_id % 4) * 1000 + (doc_id * 13) % 100
        |     ELSE (doc_id * 37) % 3000 END AS y
        |  FROM documents WHERE doc_id < 400),
        | nbr AS (SELECT p.id AS a, q.id AS b FROM pts p JOIN pts q
        |  ON p.id <> q.id
        |  AND (p.x - q.x) * (p.x - q.x) + (p.y - q.y) * (p.y - q.y) <= 2500),
        | cnt AS (SELECT p.id, 1 + count(n.b) AS n_in_eps FROM pts p
        |  LEFT JOIN nbr n ON n.a = p.id GROUP BY p.id),
        | core AS (SELECT id FROM cnt WHERE n_in_eps >= 5),
        | ce AS (SELECT a, b FROM nbr
        |  WHERE a < b AND a IN (SELECT id FROM core)
        |    AND b IN (SELECT id FROM core)),
        | ed AS (SELECT a AS src, b AS dst FROM ce UNION SELECT b, a FROM ce),
        | verts AS (SELECT DISTINCT src AS id FROM ed),
        | reach AS (WITH RECURSIVE rr(id, r) AS (
        |     SELECT id, id FROM verts
        |     UNION
        |     SELECT ed.src, rr.r FROM ed JOIN rr ON rr.id = ed.dst)
        |   SELECT * FROM rr),
        | comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
        | corelab AS (SELECT c.id, coalesce(m.component, c.id) AS cluster
        |  FROM core c LEFT JOIN comp m ON m.id = c.id),
        | borderlab AS (SELECT n.a AS id, min(cl.cluster) AS cluster
        |  FROM nbr n JOIN corelab cl ON cl.id = n.b
        |  WHERE n.a NOT IN (SELECT id FROM core) GROUP BY n.a),
        | lab AS (SELECT p.id,
        |   CASE WHEN c.cluster IS NOT NULL THEN 'core'
        |     WHEN b.cluster IS NOT NULL THEN 'border'
        |     ELSE 'noise' END AS role,
        |   coalesce(c.cluster, b.cluster) AS cluster
        |  FROM pts p LEFT JOIN corelab c ON c.id = p.id
        |   LEFT JOIN borderlab b ON b.id = p.id),
        | st AS (SELECT CAST(count(CASE WHEN role = 'noise' THEN 1 END)
        |    AS BIGINT) AS n_noise,
        |   CAST(count(*) AS BIGINT) AS n_points FROM lab)
        | SELECT cluster, CAST(count(CASE WHEN role = 'core' THEN 1 END)
        |   AS BIGINT) AS n_core,
        |  CAST(count(CASE WHEN role = 'border' THEN 1 END) AS BIGINT)
        |   AS n_border, n_noise, n_points
        | FROM lab CROSS JOIN st WHERE role <> 'noise'
        | GROUP BY cluster, n_noise, n_points
        | ORDER BY cluster""".stripMargin.replaceAll("\n", " "),
    // truth (shared-shingle exact Jaccard) and candidates (signatures
    // -> bands) replayed with the same hash family, metrics exact
    "q241_lsh_quality" -> {
      import graft.dedup.MinHashLSH.{Sql => M}
      val sh = graft.dedup.Dedup.Sql.shingles("text", 3)
      s"""WITH s AS (SELECT doc_id AS id, $sh AS sh FROM documents),
         | ne AS (SELECT id, sh FROM s WHERE len(sh) > 0),
         | e AS (SELECT id, unnest(sh) AS shingle FROM ne),
         | sz AS (SELECT id, len(sh) AS n_sh FROM ne),
         | i AS (SELECT x.id AS a, y.id AS b, count(*) AS inter
         |  FROM e x JOIN e y ON x.shingle = y.shingle AND x.id < y.id
         |  GROUP BY 1, 2),
         | tr AS (SELECT a, b FROM i JOIN sz sa ON sa.id = a
         |  JOIN sz sb ON sb.id = b
         |  WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.5),
         | sg AS (SELECT id, ${M.signatureFromShingles("sh", 16)} AS sig FROM ne),
         | bands AS (SELECT id, unnest(${M.bandKeyList("sig", 16, 4)}) AS band_key,
         |  unnest(generate_series(0, 3)) AS band_idx FROM sg),
         | cand AS (SELECT DISTINCT x.id AS a, y.id AS b FROM bands x
         |  JOIN bands y ON x.band_idx = y.band_idx
         |   AND x.band_key = y.band_key AND x.id < y.id),
         | f AS (SELECT count(*) AS n_found FROM cand JOIN tr USING (a, b)),
         | tc AS (SELECT count(*) AS n_truth FROM tr),
         | cc AS (SELECT count(*) AS n_candidates FROM cand)
         | SELECT n_truth, n_candidates, n_found,
         |  CASE WHEN n_truth > 0 THEN n_found * 1000000 // n_truth
         |   ELSE 1000000 END AS completeness_e6,
         |  CASE WHEN n_candidates > 0 THEN n_found * 1000000 // n_candidates
         |   ELSE 0 END AS precision_e6
         | FROM tc CROSS JOIN cc CROSS JOIN f""".stripMargin
        .replaceAll("\n", " ")
    },
    // hash -> uniform -> inverse-CDF Laplace replayed exactly; ln
    // rounds at 6 (the q96 transcendental rule)
    "q242_dp_release" -> {
      val h = graft.text.TextOps.Sql.strHash("concat(source, '|', lang)")
      val bucket = graft.aug.Sampling.Sql.keyBucket(s"($h)", 271L)
      s"""WITH g AS (SELECT source, lang, count(*) AS n FROM documents
         |  GROUP BY source, lang),
         | u AS (SELECT source, lang, n,
         |  (CAST($bucket AS DOUBLE) + 0.5) / 1000000.0 AS u FROM g),
         | z AS (SELECT source, lang, n,
         |  round((0.0 - 2.0) * sign(u - 0.5) *
         |    ln(1.0 - 2.0 * abs(u - 0.5)), 6) AS noise FROM u)
         | SELECT source, lang, n < 5 AS suppressed,
         |  CASE WHEN n < 5 THEN NULL ELSE round(n + noise, 6) END
         |   AS noisy_count
         | FROM z ORDER BY source, lang""".stripMargin.replaceAll("\n", " ")
    },
    // components + density scoring + packed argmax replayed end-to-end
    "q243_survivorship" -> {
      val sh = graft.dedup.Dedup.Sql.shingles("text", 3)
      val toks = graft.text.TextOps.Sql.toks("text")
      s"""WITH s AS (SELECT doc_id, $sh AS sh FROM documents),
         | e AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
         | sz AS (SELECT doc_id, len(sh) AS n_sh FROM s),
         | i AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
         |  FROM e x JOIN e y ON x.shingle = y.shingle
         |   AND x.doc_id < y.doc_id GROUP BY 1, 2),
         | p AS (SELECT a, b FROM i JOIN sz sa ON sa.doc_id = a
         |  JOIN sz sb ON sb.doc_id = b
         |  WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.5),
         | ed AS (SELECT a AS src, b AS dst FROM p UNION SELECT b, a FROM p),
         | verts AS (SELECT DISTINCT src AS id FROM ed),
         | reach AS (WITH RECURSIVE rr(id, r) AS (
         |     SELECT id, id FROM verts
         |     UNION
         |     SELECT ed.src, rr.r FROM ed JOIN rr ON rr.id = ed.dst)
         |   SELECT * FROM rr),
         | comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
         | t AS (SELECT doc_id, $toks AS toks FROM documents),
         | sc AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tok,
         |  CAST(len(list_distinct(toks)) AS BIGINT) AS u FROM t
         |  WHERE len(toks) > 0),
         | r2 AS (SELECT sc.doc_id, sc.n_tok,
         |  ((sc.u * 1000000) // sc.n_tok) * 8589934592 - sc.doc_id AS pick,
         |  coalesce(c.component, sc.doc_id) AS cluster
         |  FROM sc LEFT JOIN comp c ON c.id = sc.doc_id),
         | b AS (SELECT cluster, count(*) AS n_members,
         |  sum(n_tok) AS total_tokens, max(pick) AS best_pick
         |  FROM r2 GROUP BY cluster)
         | SELECT b.cluster, CAST(b.n_members AS BIGINT) AS n_members,
         |  r2.doc_id AS canonical_doc, r2.n_tok AS kept_tokens,
         |  CAST(b.total_tokens - r2.n_tok AS BIGINT) AS dropped_tokens
         | FROM b JOIN r2 ON r2.cluster = b.cluster AND r2.pick = b.best_pick
         | WHERE b.n_members >= 2 ORDER BY b.cluster""".stripMargin
        .replaceAll("\n", " ")
    },
    // KMV is deterministic, so exact cardinalities AND estimates are
    // both replayed with the same hash family
    "q244_kmv_sets" -> {
      val sh = graft.dedup.Dedup.Sql.shingles("text", 3)
      val h = graft.text.TextOps.Sql.strHash("w")
      s"""WITH s AS (SELECT doc_id % 2 AS half, unnest($sh) AS w
         |  FROM documents),
         | d AS (SELECT DISTINCT half, w FROM s),
         | hx AS (SELECT half, w, $h AS h FROM d),
         | rk AS (SELECT half, h, w, row_number() OVER (PARTITION BY half
         |   ORDER BY h, w) AS rk FROM hx),
         | kt AS (SELECT half, h AS hk FROM rk WHERE rk = 128),
         | mem AS (SELECT w, h,
         |   max(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS in_a,
         |   max(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS in_b
         |  FROM hx GROUP BY w, h),
         | mk AS (SELECT * FROM mem ORDER BY h, w LIMIT 128),
         | mku AS (SELECT max(h) AS hu, sum(CASE WHEN in_a = 1 AND in_b = 1
         |   THEN 1 ELSE 0 END) AS n_both FROM mk),
         | ex AS (SELECT count(DISTINCT CASE WHEN half = 0 THEN w END) AS ea,
         |  count(DISTINCT CASE WHEN half = 1 THEN w END) AS eb,
         |  count(DISTINCT w) AS eu FROM hx),
         | ka AS (SELECT hk FROM kt WHERE half = 0),
         | kb AS (SELECT hk FROM kt WHERE half = 1)
         | SELECT CAST(128 AS BIGINT) AS k, CAST(ea AS BIGINT) AS exact_a,
         |  CAST(eb AS BIGINT) AS exact_b, CAST(eu AS BIGINT) AS exact_union,
         |  CAST(ea + eb - eu AS BIGINT) AS exact_inter,
         |  round(127.0 * 1000000007 / ka.hk, 6) AS est_a,
         |  round(127.0 * 1000000007 / kb.hk, 6) AS est_b,
         |  round(127.0 * 1000000007 / hu, 6) AS est_union,
         |  round(CAST(n_both AS DOUBLE) / 128.0 *
         |    (127.0 * 1000000007 / hu), 6) AS est_inter
         | FROM ex CROSS JOIN ka CROSS JOIN kb CROSS JOIN mku""".stripMargin
        .replaceAll("\n", " ")
    },
    "q245_woe" -> {
      val iv = dsumSql("term")
      s"""WITH seg AS (SELECT c_mktsegment AS segment,
         |  count(CASE WHEN o_orderstatus <> 'F' THEN 1 END) AS n_good,
         |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_bad
         | FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1),
         | t AS (SELECT CAST(sum(n_good) AS DOUBLE) AS g,
         |  CAST(sum(n_bad) AS DOUBLE) AS b FROM seg),
         | w AS (SELECT segment, n_good, n_bad,
         |  round(ln(((n_good + 0.5) * b) / ((n_bad + 0.5) * g)), 6) AS woe,
         |  g, b FROM seg CROSS JOIN t),
         | w2 AS (SELECT segment, n_good, n_bad, woe,
         |  round((CAST(n_good AS DOUBLE) / g - CAST(n_bad AS DOUBLE) / b)
         |    * woe, 6) AS term FROM w),
         | ivv AS (SELECT round($iv, 6) AS iv FROM w2)
         | SELECT segment, CAST(n_good AS BIGINT) AS n_good,
         |  CAST(n_bad AS BIGINT) AS n_bad, woe, iv
         | FROM w2 CROSS JOIN ivv ORDER BY segment""".stripMargin
        .replaceAll("\n", " ")
    },
    // all 8 peeling rounds replayed as chained CTEs; fixpoint flag
    // compares rounds 7 and 8 on both engines
    "q246_kcore" -> {
      // MATERIALIZED: DuckDB inlines plain CTEs per reference — each
      // round references its predecessor twice, so the un-materialized
      // chain inlines 2^8 copies of the whole pipeline
      val rounds = (1 to 8).map { r =>
        val prev = if (r == 1) "verts" else s"s${r - 1}"
        s"s$r AS MATERIALIZED (SELECT e.src AS v FROM ed e JOIN $prev a ON e.src = a.v" +
          s" JOIN $prev b ON e.dst = b.v GROUP BY e.src HAVING count(*) >= 3)"
      }.mkString(", ")
      s"""WITH p0 AS MATERIALIZED (SELECT l_orderkey AS ok, p_brand AS b
         |  FROM lineitem
         |  JOIN part ON l_partkey = p_partkey GROUP BY 1, 2),
         | e AS MATERIALIZED (SELECT x.b AS b1, y.b AS b2 FROM p0 x JOIN p0 y
         |  ON x.ok = y.ok AND x.b < y.b GROUP BY 1, 2 HAVING count(*) >= 5),
         | ed AS MATERIALIZED (SELECT b1 AS src, b2 AS dst FROM e
         |  UNION ALL SELECT b2, b1 FROM e),
         | verts AS (SELECT DISTINCT src AS v FROM ed),
         | $rounds,
         | fx AS (SELECT (SELECT count(*) FROM s8) = (SELECT count(*) FROM s7)
         |   AS fixpoint_reached)
         | SELECT e2.src AS brand, CAST(3 AS BIGINT) AS k,
         |  CAST(count(*) AS BIGINT) AS core_degree, fixpoint_reached
         | FROM ed e2 JOIN s8 a ON e2.src = a.v JOIN s8 b ON e2.dst = b.v
         | CROSS JOIN fx
         | GROUP BY e2.src, fixpoint_reached ORDER BY brand""".stripMargin
        .replaceAll("\n", " ")
    },
    "q247_assoc_rules" ->
      """WITH p0 AS (SELECT l_orderkey AS ok, p_brand AS b FROM lineitem
        |  JOIN part ON l_partkey = p_partkey GROUP BY 1, 2),
        | n AS (SELECT count(DISTINCT ok) AS no FROM p0),
        | s AS (SELECT b, count(*) AS nb FROM p0 GROUP BY b),
        | pr AS (SELECT x.b AS x, y.b AS y, count(*) AS nxy FROM p0 x
        |  JOIN p0 y ON x.ok = y.ok AND x.b <> y.b GROUP BY 1, 2
        |  HAVING count(*) >= 5)
        | SELECT pr.x AS antecedent, pr.y AS consequent,
        |  CAST(nxy AS BIGINT) AS support,
        |  CAST(nxy * 1000000 // sx.nb AS BIGINT) AS confidence_e6,
        |  CAST(nxy * no * 1000000 // (sx.nb * sy.nb) AS BIGINT) AS lift_e6
        | FROM pr JOIN s sx ON sx.b = pr.x JOIN s sy ON sy.b = pr.y
        | CROSS JOIN n
        | ORDER BY lift_e6 DESC, antecedent, consequent
        | LIMIT 15""".stripMargin.replaceAll("\n", " "),
    // scores -> tie-corrected average ranks -> consensus, replayed with
    // the q120/q07-established stat mirrors
    "q248_outlier_ensemble" -> {
      val mu = s"${dsumSql("x")} / count(x)"
      val sd = Stats.Sql.dstddevSamp("x")
      s"""WITH d AS (SELECT l_orderkey, l_linenumber,
         |  CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem),
         | st AS (SELECT $mu AS mu, $sd AS sd,
         |  quantile_cont(x, 0.25) AS q1, quantile_cont(x, 0.5) AS med,
         |  quantile_cont(x, 0.75) AS q3 FROM d),
         | md AS (SELECT quantile_cont(abs(x - med), 0.5) AS mad FROM d, st),
         | sc AS (SELECT l_orderkey, l_linenumber,
         |  abs((x - mu) / sd) AS s1,
         |  abs(0.6745 * (x - med) / mad) AS s2,
         |  greatest(0.0, x - q3, q1 - x) / (q3 - q1) AS s3
         |  FROM d, st, md),
         | t1 AS (SELECT s1 AS v, count(*) AS ties FROM sc GROUP BY s1),
         | m1 AS (SELECT v, coalesce(sum(ties) OVER (ORDER BY v
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |   + (ties + 1) / 2.0 AS r FROM t1),
         | t2 AS (SELECT s2 AS v, count(*) AS ties FROM sc GROUP BY s2),
         | m2 AS (SELECT v, coalesce(sum(ties) OVER (ORDER BY v
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |   + (ties + 1) / 2.0 AS r FROM t2),
         | t3 AS (SELECT s3 AS v, count(*) AS ties FROM sc GROUP BY s3),
         | m3 AS (SELECT v, coalesce(sum(ties) OVER (ORDER BY v
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |   + (ties + 1) / 2.0 AS r FROM t3),
         | j AS (SELECT sc.l_orderkey, sc.l_linenumber, sc.s1, sc.s2, sc.s3,
         |  m1.r AS r1, m2.r AS r2, m3.r AS r3 FROM sc
         |  JOIN m1 ON m1.v = sc.s1 JOIN m2 ON m2.v = sc.s2
         |  JOIN m3 ON m3.v = sc.s3)
         | SELECT l_orderkey, l_linenumber,
         |  round((r1 + r2 + r3) / 3.0, 6) AS consensus,
         |  round(s1, 6) AS z_score, round(s2, 6) AS mad_score,
         |  round(s3, 6) AS iqr_score
         | FROM j ORDER BY consensus DESC, l_orderkey, l_linenumber
         | LIMIT 15""".stripMargin.replaceAll("\n", " ")
    },
    // the whole five-operator composition replayed: fingerprints ->
    // window-min -> pair join -> components -> argmax -> split hash
    "q249_curation_v2" -> {
      val toks = graft.text.TextOps.Sql.toks("text")
      val h = graft.text.TextOps.Sql.strHash("array_to_string(toks[i:i+3], ' ')")
      val bucket = graft.aug.Sampling.Sql.keyBucket("cluster", 42L)
      s"""WITH t AS MATERIALIZED (SELECT doc_id, $toks AS toks FROM documents),
         | t2 AS (SELECT doc_id, list_transform(
         |    generate_series(1, len(toks) - 3), i -> $h) AS hs
         |  FROM t WHERE len(toks) >= 4),
         | g AS (SELECT doc_id,
         |   unnest(generate_series(1, len(hs))) - 1 AS pos,
         |   unnest(hs) AS hh FROM t2),
         | wmin AS (SELECT doc_id, pos, min(hh) OVER (PARTITION BY doc_id
         |   ORDER BY pos ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp
         |  FROM g),
         | f AS MATERIALIZED (SELECT DISTINCT doc_id, fp FROM wmin
         |  WHERE pos >= 3),
         | pr AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS ns
         |  FROM f x JOIN f y ON x.fp = y.fp AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2),
         | p AS MATERIALIZED (SELECT a, b FROM pr WHERE ns >= 2),
         | ed AS MATERIALIZED (SELECT a AS src, b AS dst FROM p
         |  UNION SELECT b, a FROM p),
         | verts AS (SELECT DISTINCT src AS id FROM ed),
         | reach AS (WITH RECURSIVE rr(id, r) AS (
         |     SELECT id, id FROM verts
         |     UNION
         |     SELECT ed.src, rr.r FROM ed JOIN rr ON rr.id = ed.dst)
         |   SELECT * FROM rr),
         | comp AS MATERIALIZED (SELECT id, min(r) AS component FROM reach
         |  GROUP BY id),
         | sc AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tok,
         |  CAST(len(list_distinct(toks)) AS BIGINT) AS u FROM t
         |  WHERE len(toks) > 0),
         | r2 AS MATERIALIZED (SELECT sc.doc_id, sc.n_tok,
         |  ((sc.u * 1000000) // sc.n_tok) * 8589934592 - sc.doc_id AS pick,
         |  coalesce(c.component, sc.doc_id) AS cluster
         |  FROM sc LEFT JOIN comp c ON c.id = sc.doc_id),
         | b AS (SELECT cluster, max(pick) AS best_pick FROM r2
         |  GROUP BY cluster),
         | lab AS (SELECT r2.cluster, r2.n_tok,
         |  r2.pick = b.best_pick AS kept
         |  FROM r2 JOIN b ON b.cluster = r2.cluster),
         | sp AS (SELECT *, CASE WHEN $bucket < 900000 THEN 'train'
         |   ELSE 'test' END AS split FROM lab)
         | SELECT split,
         |  CAST(count(CASE WHEN kept THEN 1 END) AS BIGINT) AS n_docs_kept,
         |  CAST(count(CASE WHEN NOT kept THEN 1 END) AS BIGINT)
         |   AS n_docs_dropped,
         |  CAST(sum(CASE WHEN kept THEN n_tok ELSE 0 END) AS BIGINT)
         |   AS tokens_kept,
         |  CAST(sum(CASE WHEN NOT kept THEN n_tok ELSE 0 END) AS BIGINT)
         |   AS tokens_dropped
         | FROM sp GROUP BY split ORDER BY split""".stripMargin
        .replaceAll("\n", " ")
    },
    // both retrieval paths replayed: exact filtered top-3 vs
    // post-filtered global top-12, then the recall join
    "q250_filtered_ann" -> {
      import graft.sim.VectorMath.{Sql => V}
      s"""WITH v AS (SELECT vec_id AS id, embedding AS vec, label,
         |  ${V.norm2("embedding")} AS n2 FROM embeddings),
         | p AS MATERIALIZED (SELECT q.id AS qid, t.id AS tid,
         |  t.label % 4 = 1 AS ok,
         |  ${V.dot("q.vec", "t.vec")} / (sqrt(q.n2) * sqrt(t.n2)) AS cos
         |  FROM v q JOIN v t ON q.id <> t.id WHERE q.id < 50),
         | ex AS (SELECT qid, tid FROM (SELECT qid, tid, row_number()
         |   OVER (PARTITION BY qid ORDER BY cos DESC, tid) AS rk
         |  FROM p WHERE ok) WHERE rk <= 3),
         | gl AS (SELECT qid, tid, ok, row_number() OVER (PARTITION BY qid
         |   ORDER BY cos DESC, tid) AS gr FROM p),
         | po AS (SELECT qid, tid FROM (SELECT qid, tid, row_number()
         |   OVER (PARTITION BY qid ORDER BY gr) AS rk
         |  FROM gl WHERE gr <= 12 AND ok) WHERE rk <= 3),
         | m AS (SELECT ex.qid, count(po.tid) AS matched,
         |  count(*) AS n_exact
         |  FROM ex LEFT JOIN po ON po.qid = ex.qid AND po.tid = ex.tid
         |  GROUP BY ex.qid)
         | SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |  CAST(sum(n_exact) AS BIGINT) AS sum_exact,
         |  CAST(sum(matched) AS BIGINT) AS sum_matched,
         |  CAST(count(CASE WHEN matched < n_exact THEN 1 END) AS BIGINT)
         |   AS n_degraded,
         |  CAST(sum(matched) * 1000000 // sum(n_exact) AS BIGINT)
         |   AS recall_e6
         | FROM m""".stripMargin.replaceAll("\n", " ")
    },
    // exact 2-NN -> ln(r2/r1) at 6 -> decimal-exact mean -> 1/mu
    "q251_intrinsic_dim" -> {
      import graft.sim.VectorMath.{Sql => V}
      val mu = s"(${dsumSql("t")} / CAST(count(CASE WHEN usable THEN 1 END) AS DOUBLE))"
      s"""WITH v AS (SELECT vec_id AS id, embedding AS vec,
         |  ${V.norm2("embedding")} AS n2 FROM embeddings WHERE vec_id < 300),
         | p AS (SELECT x.id AS a, y.id AS b,
         |  1.0 - ${V.dot("x.vec", "y.vec")} / (sqrt(x.n2) * sqrt(y.n2)) AS dist
         |  FROM v x JOIN v y ON x.id <> y.id),
         | r AS (SELECT a, b, dist, row_number() OVER (PARTITION BY a
         |   ORDER BY dist, b) AS rk FROM p),
         | rr AS (SELECT a, min(CASE WHEN rk = 1 THEN dist END) AS r1,
         |  min(CASE WHEN rk = 2 THEN dist END) AS r2
         |  FROM r WHERE rk <= 2 GROUP BY a),
         | tt AS (SELECT r1 > 0 AS usable,
         |  CASE WHEN r1 > 0 THEN round(ln(r2 / r1), 6) END AS t FROM rr)
         | SELECT CAST(count(CASE WHEN usable THEN 1 END) AS BIGINT) AS n_used,
         |  CAST(count(CASE WHEN NOT usable THEN 1 END) AS BIGINT)
         |   AS n_excluded,
         |  round($mu, 6) AS mu,
         |  round(1.0 / $mu, 6) AS d_hat
         | FROM tt""".stripMargin.replaceAll("\n", " ")
    },
    // all 8 farthest-point rounds replayed as chained MATERIALIZED CTEs
    "q252_kcenter" -> {
      import graft.sim.VectorMath.{Sql => V}
      def dist(m: String) =
        s"1.0 - ${V.dot(s"$m.vec", "c.vec")} / (sqrt($m.n2) * sqrt(c.n2))"
      val ctes = (1 to 8).map { r =>
        val pick =
          if (r == 1) "(SELECT min(id) FROM v)"
          else s"(SELECT id FROM m${r - 1} ORDER BY md DESC, id LIMIT 1)"
        val md =
          if (r == 1) s"${dist("v")}"
          else s"least(m.md, ${dist("m")})"
        val src = if (r == 1) "v" else s"m${r - 1} m"
        val proj = if (r == 1) "v.id, v.vec, v.n2" else "m.id, m.vec, m.n2"
        s"""c$r AS (SELECT id, vec, n2 FROM v WHERE id = $pick),
           | m$r AS MATERIALIZED (SELECT $proj, $md AS md
           |  FROM $src, c$r c)""".stripMargin
      }.mkString(", ")
      val rows = (1 to 8).map { r =>
        s"""SELECT $r AS "round", (SELECT id FROM c$r) AS center_id,
           | round((SELECT max(md) FROM m$r), 6) AS coverage_radius"""
          .stripMargin
      }.mkString(" UNION ALL ")
      s"""WITH v AS MATERIALIZED (SELECT vec_id AS id, embedding AS vec,
         |  ${V.norm2("embedding")} AS n2 FROM embeddings WHERE vec_id < 200),
         | $ctes
         | SELECT * FROM ($rows) ORDER BY "round"""".stripMargin
        .replaceAll("\n", " ")
    },
    // the three-stage cascade replayed in sequence: each stage's input
    // is the previous stage's survivor set
    "q253_dedup_funnel" -> {
      val toks = graft.text.TextOps.Sql.toks("text")
      val sh = graft.dedup.Dedup.Sql.shingles("text", 3)
      val h = graft.text.TextOps.Sql.strHash("array_to_string(toks[i:i+3], ' ')")
      s"""WITH d AS MATERIALIZED (SELECT doc_id, text,
         |  CAST(len($toks) AS BIGINT) AS n_tok FROM documents),
         | k1 AS (SELECT min(doc_id) AS doc_id FROM d GROUP BY text),
         | s1 AS MATERIALIZED (SELECT d.* FROM d JOIN k1 USING (doc_id)),
         | shg AS (SELECT doc_id, $sh AS sh FROM s1),
         | e2 AS (SELECT doc_id, unnest(sh) AS shingle FROM shg),
         | sz AS (SELECT doc_id, len(sh) AS n_sh FROM shg),
         | i2 AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
         |  FROM e2 x JOIN e2 y ON x.shingle = y.shingle
         |   AND x.doc_id < y.doc_id GROUP BY 1, 2),
         | p2 AS (SELECT a, b FROM i2 JOIN sz sa ON sa.doc_id = a
         |  JOIN sz sb ON sb.doc_id = b
         |  WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.5),
         | ed2 AS MATERIALIZED (SELECT a AS src, b AS dst FROM p2
         |  UNION SELECT b, a FROM p2),
         | v2 AS (SELECT DISTINCT src AS id FROM ed2),
         | r2c AS (WITH RECURSIVE rr(id, r) AS (
         |     SELECT id, id FROM v2
         |     UNION
         |     SELECT ed2.src, rr.r FROM ed2 JOIN rr ON rr.id = ed2.dst)
         |   SELECT * FROM rr),
         | c2 AS MATERIALIZED (SELECT id, min(r) AS component FROM r2c
         |  GROUP BY id),
         | s2 AS MATERIALIZED (SELECT s1.* FROM s1 LEFT JOIN c2
         |  ON c2.id = s1.doc_id
         |  WHERE c2.component IS NULL OR c2.component = s1.doc_id),
         | t3 AS (SELECT doc_id, $toks AS toks FROM s2),
         | t32 AS (SELECT doc_id, list_transform(
         |    generate_series(1, len(toks) - 3), i -> $h) AS hs
         |  FROM t3 WHERE len(toks) >= 4),
         | g3 AS (SELECT doc_id,
         |   unnest(generate_series(1, len(hs))) - 1 AS pos,
         |   unnest(hs) AS hh FROM t32),
         | w3 AS (SELECT doc_id, pos, min(hh) OVER (PARTITION BY doc_id
         |   ORDER BY pos ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp
         |  FROM g3),
         | f3 AS MATERIALIZED (SELECT DISTINCT doc_id, fp FROM w3
         |  WHERE pos >= 3),
         | pr3 AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS ns
         |  FROM f3 x JOIN f3 y ON x.fp = y.fp AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2),
         | p3 AS (SELECT a, b FROM pr3 WHERE ns >= 2),
         | ed3 AS MATERIALIZED (SELECT a AS src, b AS dst FROM p3
         |  UNION SELECT b, a FROM p3),
         | v3 AS (SELECT DISTINCT src AS id FROM ed3),
         | r3c AS (WITH RECURSIVE rr(id, r) AS (
         |     SELECT id, id FROM v3
         |     UNION
         |     SELECT ed3.src, rr.r FROM ed3 JOIN rr ON rr.id = ed3.dst)
         |   SELECT * FROM rr),
         | c3 AS MATERIALIZED (SELECT id, min(r) AS component FROM r3c
         |  GROUP BY id),
         | s3 AS MATERIALIZED (SELECT s2.* FROM s2 LEFT JOIN c3
         |  ON c3.id = s2.doc_id
         |  WHERE c3.component IS NULL OR c3.component = s2.doc_id),
         | st AS (SELECT
         |  (SELECT CAST(count(*) AS BIGINT) FROM d) AS n0,
         |  (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n1,
         |  (SELECT CAST(sum(n_tok) AS BIGINT) FROM s1) AS t1,
         |  (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n2,
         |  (SELECT CAST(sum(n_tok) AS BIGINT) FROM s2) AS t2,
         |  (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n3,
         |  (SELECT CAST(sum(n_tok) AS BIGINT) FROM s3) AS t3v)
         | SELECT * FROM (
         |  SELECT CAST(1 AS BIGINT) AS stage, 'exact' AS name, n0 AS n_in,
         |   n0 - n1 AS n_removed, n1 AS n_out, t1 AS tokens_out FROM st
         |  UNION ALL SELECT 2, 'near_dup', n1, n1 - n2, n2, t2 FROM st
         |  UNION ALL SELECT 3, 'substring', n2, n2 - n3, n3, t3v FROM st)
         | ORDER BY stage""".stripMargin.replaceAll("\n", " ")
    },
    // sqrt-temperature weights with an ORDER-pinned normalizer fold
    "q254_epoch_plan" -> {
      val toks = graft.text.TextOps.Sql.toks("text")
      s"""WITH cnt AS (SELECT source, CAST(sum(len($toks)) AS BIGINT)
         |   AS tokens FROM documents GROUP BY source),
         | tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS total,
         |  list_reduce(list_prepend(0.0::DOUBLE,
         |    list(sqrt(CAST(tokens AS DOUBLE)) ORDER BY source)),
         |   (a, b) -> a + b) AS sw FROM cnt)
         | SELECT source, tokens,
         |  CAST(floor(sqrt(CAST(tokens AS DOUBLE)) / sw * 1000000)
         |   AS BIGINT) AS weight_e6,
         |  CAST(floor(4 * total * sqrt(CAST(tokens AS DOUBLE)) / sw)
         |   AS BIGINT) AS planned_tokens,
         |  CAST(floor(4 * total * sqrt(CAST(tokens AS DOUBLE)) / sw)
         |   AS BIGINT) * 100 // tokens AS epochs_e2,
         |  CAST(floor(4 * total * sqrt(CAST(tokens AS DOUBLE)) / sw)
         |   AS BIGINT) * 100 // tokens > 400 AS over_repetition_knee
         | FROM cnt, tot ORDER BY source""".stripMargin.replaceAll("\n", " ")
    },
    // both tree levels replayed as ORDER-pinned list_reduce folds
    "q255_manifest" -> {
      val h = graft.text.TextOps.Sql.strHash("text")
      s"""WITH d AS (SELECT doc_id, source, n_chars, doc_id // 64 AS chunk,
         |  $h AS h FROM documents),
         | ck AS (SELECT source, chunk, count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |  list_reduce(list_prepend(13::BIGINT, list(h ORDER BY doc_id)),
         |   (a, b) -> (a * 1000003 + b) % 1000000007) AS chunk_hash
         |  FROM d GROUP BY source, chunk)
         | SELECT source, CAST(sum(n_docs) AS BIGINT) AS n_docs,
         |  CAST(sum(sum_chars) AS BIGINT) AS sum_chars,
         |  list_reduce(list_prepend(13::BIGINT,
         |    list(chunk_hash ORDER BY chunk)),
         |   (a, b) -> (a * 1000003 + b) % 1000000007) AS root_hash
         | FROM ck GROUP BY source ORDER BY source""".stripMargin
        .replaceAll("\n", " ")
    },
    // same metrics/truth/subset as q237 -> the two blocking schemes
    // are directly comparable
    "q256_snm_quality" ->
      """WITH c AS (SELECT c_custkey AS id, c_name AS name FROM customer
        |  WHERE c_custkey < 1500),
        | r AS (SELECT id, name, row_number() OVER (ORDER BY name, id)
        |  AS rk FROM c),
        | m AS (SELECT count(*) AS n_eval FROM c),
        | agg AS (SELECT
        |  count(CASE WHEN levenshtein(x.name, y.name) <= 1 THEN 1 END)
        |   AS n_truth,
        |  count(CASE WHEN abs(x.rk - y.rk) <= 10 THEN 1 END) AS n_cand,
        |  count(CASE WHEN levenshtein(x.name, y.name) <= 1
        |   AND abs(x.rk - y.rk) <= 10 THEN 1 END) AS n_found
        |  FROM r x JOIN r y ON x.id < y.id)
        | SELECT n_eval, n_eval * (n_eval - 1) // 2 AS n_allpairs, n_truth,
        |  n_cand AS n_candidates, n_found,
        |  1000000 - CASE WHEN n_eval > 1
        |   THEN n_cand * 1000000 // (n_eval * (n_eval - 1) // 2)
        |   ELSE 0 END AS reduction_e6,
        |  CASE WHEN n_truth > 0 THEN n_found * 1000000 // n_truth
        |   ELSE 1000000 END AS completeness_e6
        | FROM m CROSS JOIN agg""".stripMargin.replaceAll("\n", " "),
    // theta/mean from decimal-exact moments; adjusted values rounded
    // at 6 before their decimal sums (full-fraction-cast gotcha)
    "q257_cuped" -> {
      val bucket = graft.aug.Sampling.Sql.keyBucket("o_orderkey", 1234L)
      val cov = Stats.Sql.dcovSamp("x", "y", "count(*)")
      val vx = Stats.Sql.dvarSamp("x")
      val mx = Stats.Sql.dmean("x")
      s"""WITH d AS MATERIALIZED (SELECT o_orderkey,
         |  CAST(o_totalprice AS DOUBLE) AS y, CAST(c_acctbal AS DOUBLE) AS x,
         |  CASE WHEN $bucket < 500000 THEN 'A' ELSE 'B' END AS grp
         |  FROM orders JOIN customer ON o_custkey = c_custkey),
         | st AS (SELECT ($cov) / ($vx) AS theta, $mx AS mx FROM d),
         | adj AS (SELECT grp, y,
         |  round(y - theta * (x - mx), 6) AS ya FROM d, st)
         | SELECT grp, CAST(count(*) AS BIGINT) AS n,
         |  round(${Stats.Sql.dmean("y")}, 6) AS mean_y,
         |  round(${Stats.Sql.dmean("ya")}, 6) AS mean_y_adj,
         |  CAST(floor(${Stats.Sql.dvarSamp("ya")} /
         |    ${Stats.Sql.dvarSamp("y")} * 1000000.0) AS BIGINT)
         |   AS var_ratio_e6
         | FROM adj GROUP BY grp ORDER BY grp""".stripMargin
        .replaceAll("\n", " ")
    },
    "q258_qte" -> {
      val bucket = graft.aug.Sampling.Sql.keyBucket("o_orderkey", 1234L)
      val ps = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
      val parts = ps.map(p =>
        s"SELECT grp, CAST($p AS DOUBLE) AS p, quantile_cont(y, $p) AS v" +
          " FROM d GROUP BY grp").mkString(" UNION ALL ")
      s"""WITH d AS MATERIALIZED (SELECT
         |  CASE WHEN $bucket < 500000 THEN 'A' ELSE 'B' END AS grp,
         |  CAST(o_totalprice AS DOUBLE) AS y FROM orders),
         | q AS ($parts)
         | SELECT a.p, round(a.v, 6) AS q_a, round(b.v, 6) AS q_b,
         |  round(b.v - a.v, 6) AS qte
         | FROM q a JOIN q b ON a.p = b.p AND a.grp = 'A' AND b.grp = 'B'
         | ORDER BY a.p""".stripMargin.replaceAll("\n", " ")
    },
    "q259_srm" -> {
      val b1 = graft.aug.Sampling.Sql.keyBucket("o_orderkey", 1234L)
      val b2 = graft.aug.Sampling.Sql.keyBucket("o_orderkey", 99L)
      s"""WITH d AS (SELECT CASE WHEN $b1 < 500000 THEN 'A' ELSE 'B' END
         |   AS grp, $b2 AS b2 FROM orders),
         | h AS (SELECT 'healthy' AS scenario,
         |  count(CASE WHEN grp = 'A' THEN 1 END) AS na,
         |  count(CASE WHEN grp = 'B' THEN 1 END) AS nb FROM d),
         | c AS (SELECT 'corrupted' AS scenario,
         |  count(CASE WHEN grp = 'A' THEN 1 END) AS na,
         |  count(CASE WHEN grp = 'B' THEN 1 END) AS nb FROM d
         |  WHERE NOT (grp = 'B' AND b2 < 30000)),
         | u AS (SELECT scenario, na, nb, (na + nb) / 2.0 AS e
         |  FROM (SELECT * FROM h UNION ALL SELECT * FROM c))
         | SELECT scenario, CAST(na AS BIGINT) AS n_a,
         |  CAST(nb AS BIGINT) AS n_b,
         |  round((na - e) * (na - e) / e + (nb - e) * (nb - e) / e, 6)
         |   AS chi2,
         |  ((na - e) * (na - e) / e + (nb - e) * (nb - e) / e) > 3.841
         |   AS srm_detected
         | FROM u ORDER BY scenario""".stripMargin.replaceAll("\n", " ")
    },
    // delta-method pieces from decimal-exact per-customer moments; the
    // two-arm z recomputed from the same per-arm quantities
    "q260_ratio_delta" -> {
      val bucket = graft.aug.Sampling.Sql.keyBucket("o_custkey", 777L)
      val cov = Stats.Sql.dcovSamp("x", "y", "count(*)")
      s"""WITH per AS MATERIALIZED (SELECT o_custkey,
         |  CAST(count(*) AS DOUBLE) AS x,
         |  ${Stats.Sql.dsum("o_totalprice")} AS y,
         |  CASE WHEN $bucket < 500000 THEN 'A' ELSE 'B' END AS grp
         |  FROM orders GROUP BY o_custkey),
         | st AS MATERIALIZED (SELECT grp, CAST(count(*) AS BIGINT) AS n,
         |  ${Stats.Sql.dmean("x")} AS mx, ${Stats.Sql.dmean("y")} AS my,
         |  ${Stats.Sql.dvarSamp("x")} AS vx, ${Stats.Sql.dvarSamp("y")} AS vy,
         |  $cov AS cxy
         |  FROM per GROUP BY grp),
         | ar AS (SELECT grp, n, my / mx AS ratio,
         |  (vy + (my / mx) * (my / mx) * vx - 2.0 * (my / mx) * cxy) /
         |   (mx * mx * CAST(n AS DOUBLE)) AS var_r FROM st),
         | z AS (SELECT (b.ratio - a.ratio) / sqrt(a.var_r + b.var_r) AS zz
         |  FROM ar a, ar b WHERE a.grp = 'A' AND b.grp = 'B')
         | SELECT grp, n AS n_units, round(ratio, 6) AS revenue_per_order,
         |  round(sqrt(var_r), 6) AS se, round(zz, 6) AS z_diff
         | FROM ar CROSS JOIN z ORDER BY grp""".stripMargin
        .replaceAll("\n", " ")
    },
    "q261_paragraph_dedup" -> {
      val toks = graft.text.TextOps.Sql.toks("text")
      val hash = graft.text.TextOps.Sql.strHash(
        "array_to_string(toks[((i-1)*10+1):((i-1)*10+10)], ' ')")
      s"""WITH t AS MATERIALIZED (SELECT doc_id, source, $toks AS toks
         |  FROM documents),
         | p AS MATERIALIZED (SELECT doc_id, source,
         |   s['pos'] AS pos, s['h'] AS h, s['ntok'] AS ntok FROM (
         |  SELECT doc_id, source,
         |   unnest(list_transform(generate_series(1, (len(toks)-1)//10 + 1),
         |    i -> {'pos': CAST(i-1 AS BIGINT), 'h': $hash,
         |     'ntok': CAST(least(10, len(toks)-(i-1)*10) AS BIGINT)})) AS s
         |  FROM t)),
         | f AS (SELECT h, count(*) AS n_inst,
         |   min(doc_id*1000000 + pos) AS fo FROM p GROUP BY h)
         | SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  CAST(count(*) AS BIGINT) AS n_paras,
         |  CAST(count(CASE WHEN n_inst > 1 THEN 1 END) AS BIGINT)
         |   AS n_dup_paras,
         |  CAST(sum(ntok) AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN n_inst > 1 THEN ntok ELSE 0 END) AS BIGINT)
         |   AS dup_tokens,
         |  CAST(sum(CASE WHEN doc_id*1000000+pos = fo THEN ntok ELSE 0 END)
         |   AS BIGINT) AS kept_tokens,
         |  CAST(sum(CASE WHEN doc_id*1000000+pos = fo THEN ntok ELSE 0 END)
         |   * 1000000 // sum(ntok) AS BIGINT) AS kept_e6
         | FROM p JOIN f USING (h) GROUP BY source ORDER BY source"""
        .stripMargin.replaceAll("\n", " ")
    },
    "q262_dsir" -> {
      val toks = graft.text.TextOps.Sql.toks("text")
      val bh = graft.text.TextOps.Sql.strHash("toks[i] || ' ' || toks[i+1]")
      s"""WITH t AS MATERIALIZED (SELECT doc_id, source, lang, $toks AS toks
         |  FROM documents),
         | inst AS MATERIALIZED (SELECT doc_id, source, lang,
         |   unnest(CASE WHEN len(toks) >= 2 THEN
         |    list_transform(generate_series(1, len(toks)-1),
         |     i -> ($bh) % 1024) ELSE [] END) AS b FROM t),
         | nt AS (SELECT count(*) AS n FROM inst WHERE lang = 'en'),
         | nr AS (SELECT count(*) AS n FROM inst),
         | tgt AS (SELECT b, count(*) AS ct FROM inst WHERE lang = 'en'
         |  GROUP BY b),
         | raw AS (SELECT b, count(*) AS cr FROM inst GROUP BY b),
         | lr AS (SELECT raw.b AS b,
         |   round(ln((coalesce(ct, 0)+1) / CAST(nt.n + 1024 AS DOUBLE))
         |    - ln((cr+1) / CAST(nr.n + 1024 AS DOUBLE)), 6) AS lr
         |  FROM raw LEFT JOIN tgt ON raw.b = tgt.b, nt, nr),
         | pd AS (SELECT doc_id, source,
         |   round(${Stats.Sql.dsum("lr")} / count(*), 6) AS w
         |  FROM inst JOIN lr USING (b) GROUP BY doc_id, source)
         | SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  round(${Stats.Sql.dsum("w")} / count(*), 6) AS mean_w,
         |  CAST(count(CASE WHEN w > 0 THEN 1 END) AS BIGINT) AS n_selected
         | FROM pd GROUP BY source ORDER BY source""".stripMargin
        .replaceAll("\n", " ")
    },
    // centroid means are UNROUNDED dsum/count (bit-identical); per-dim
    // squared diffs fold in fixed 1..64 order both sides
    "q263_silhouette" -> {
      s"""WITH e AS MATERIALIZED (SELECT vec_id,
         |  CAST(label AS BIGINT) AS label, embedding FROM embeddings),
         | cd AS (SELECT label, dim,
         |   ${Stats.Sql.dsum("CAST(embedding[dim] AS DOUBLE)")} / count(*)
         |    AS mean
         |  FROM (SELECT label, unnest(generate_series(1, len(embedding)))
         |    AS dim, embedding FROM e) GROUP BY label, dim),
         | c AS MATERIALIZED (SELECT label AS cl,
         |   list(mean ORDER BY dim) AS cv FROM cd GROUP BY label),
         | d AS MATERIALIZED (SELECT e.vec_id, e.label, c.cl,
         |   list_reduce(list_prepend(0.0::DOUBLE,
         |    list_transform(generate_series(1, len(e.embedding)),
         |     i -> (CAST(e.embedding[i] AS DOUBLE) - cv[i]) *
         |          (CAST(e.embedding[i] AS DOUBLE) - cv[i]))),
         |    (acc, x) -> acc + x) AS d2
         |  FROM e CROSS JOIN c),
         | ab AS (SELECT vec_id, label,
         |   sqrt(max(CASE WHEN cl = label THEN d2 END)) AS a,
         |   sqrt(min(CASE WHEN cl <> label THEN d2 END)) AS b
         |  FROM d GROUP BY vec_id, label),
         | sv AS (SELECT label, a, b, (b - a) / greatest(a, b) AS sil
         |  FROM ab)
         | SELECT label, CAST(count(*) AS BIGINT) AS n,
         |  round(${Stats.Sql.dsum("a")} / count(*), 6) AS mean_a,
         |  round(${Stats.Sql.dsum("b")} / count(*), 6) AS mean_b,
         |  round(${Stats.Sql.dsum("sil")} / count(*), 6) AS mean_sil
         | FROM sv GROUP BY label ORDER BY label""".stripMargin
        .replaceAll("\n", " ")
    },
    "q264_jl_projection" -> {
      val bucket = graft.aug.Sampling.Sql.keyBucket("ida", 5151L)
      s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding,
         |  list_transform(generate_series(1, 16), j ->
         |   list_reduce(list_prepend(0.0::DOUBLE,
         |    list_transform(generate_series(1, 64), i ->
         |     CASE WHEN ((i*131 + j*137) * (i*131 + j*137)) % 1000003 % 2 = 0
         |      THEN CAST(embedding[i] AS DOUBLE)
         |      ELSE -CAST(embedding[i] AS DOUBLE) END)),
         |    (acc, x) -> acc + x) / 4.0) AS p FROM embeddings),
         | pr AS (SELECT a.vec_id AS ida,
         |   list_reduce(list_prepend(0.0::DOUBLE,
         |    list_transform(generate_series(1, 64), i ->
         |     (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE)) *
         |     (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE)))),
         |    (acc, x) -> acc + x) AS od2,
         |   list_reduce(list_prepend(0.0::DOUBLE,
         |    list_transform(generate_series(1, 16), i ->
         |     (a.p[i] - b.p[i]) * (a.p[i] - b.p[i]))),
         |    (acc, x) -> acc + x) AS pd2
         |  FROM e a JOIN e b ON b.vec_id = a.vec_id + 1),
         | r AS (SELECT pd2 / od2 AS ratio FROM pr
         |  WHERE $bucket < 200000 AND od2 > 0)
         | SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         |  round(${Stats.Sql.dsum("ratio")} / count(*), 6) AS mean_ratio,
         |  round(min(ratio), 6) AS min_ratio,
         |  round(max(ratio), 6) AS max_ratio,
         |  CAST(count(CASE WHEN ratio >= 0.5 AND ratio <= 1.5 THEN 1 END)
         |   AS BIGINT) AS n_in_band
         | FROM r""".stripMargin.replaceAll("\n", " ")
    },
    "q265_power_mde" -> {
      val arm = s"(${graft.aug.Sampling.Sql.keyBucket("user_id", 31L)}) < 500000"
      s"""WITH g AS (SELECT event_type,
         |  count(CASE WHEN $arm THEN 1 END) AS n_a,
         |  count(CASE WHEN NOT ($arm) THEN 1 END) AS n_b,
         |  ${Stats.Sql.dmean("value")} AS mean_raw,
         |  ${Stats.Sql.dstddevSamp("value")} AS sd_raw
         |  FROM events GROUP BY event_type),
         | m AS (SELECT *, (1.959964 + 0.841621) * sd_raw *
         |   sqrt(1.0/n_a + 1.0/n_b) AS mde_raw FROM g)
         | SELECT event_type, CAST(n_a AS BIGINT) AS n_a,
         |  CAST(n_b AS BIGINT) AS n_b,
         |  round(mean_raw, 6) AS mean_value, round(sd_raw, 6) AS sd_value,
         |  round(mde_raw, 6) AS mde_abs,
         |  CAST(floor(mde_raw / mean_raw * 1e6) AS BIGINT) AS mde_rel_e6
         | FROM m ORDER BY event_type""".stripMargin.replaceAll("\n", " ")
    },
    "q266_msprt" -> {
      val arm = s"(${graft.aug.Sampling.Sql.keyBucket("user_id", 31L)}) < 500000"
      s"""WITH base AS MATERIALIZED (SELECT event_id, value, ($arm) AS arm,
         |  CAST(round(value*100) AS BIGINT) AS vc FROM events),
         | s2 AS MATERIALIZED (SELECT ${Stats.Sql.dvarPop("value")} AS sig2
         |  FROM base),
         | ev AS MATERIALIZED (
         |  SELECT 'healthy' AS scenario, event_id,
         |   CASE WHEN arm THEN 1 ELSE 0 END AS ca,
         |   CASE WHEN arm THEN vc ELSE 0 END AS sa,
         |   CASE WHEN NOT arm THEN 1 ELSE 0 END AS cb,
         |   CASE WHEN NOT arm THEN vc ELSE 0 END AS sb FROM base
         |  UNION ALL
         |  SELECT 'shifted', event_id,
         |   CASE WHEN arm THEN 1 ELSE 0 END,
         |   CASE WHEN arm THEN vc ELSE 0 END,
         |   CASE WHEN NOT arm THEN 1 ELSE 0 END,
         |   CASE WHEN NOT arm THEN (vc*5)//4 ELSE 0 END FROM base),
         | c AS (SELECT scenario,
         |   row_number() OVER (PARTITION BY scenario ORDER BY event_id)
         |    AS n,
         |   sum(ca) OVER w AS n_a, sum(sa) OVER w AS sa_c,
         |   sum(cb) OVER w AS n_b, sum(sb) OVER w AS sb_c
         |  FROM ev WINDOW w AS (PARTITION BY scenario ORDER BY event_id
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         | k AS (SELECT * FROM c WHERE n % 500 = 0 AND n_a > 0 AND n_b > 0),
         | x AS (SELECT scenario, n, n_a, n_b,
         |   (CAST(sa_c AS DOUBLE)/n_a - CAST(sb_c AS DOUBLE)/n_b)/100.0
         |    AS delta,
         |   sig2/4.0 AS t2, sig2*(1.0/n_a + 1.0/n_b) AS vv FROM k, s2),
         | y AS (SELECT scenario, n, n_a, n_b, delta,
         |   0.5*ln(vv/(vv+t2)) + delta*delta*t2/(2.0*vv*(vv+t2)) AS ll
         |  FROM x)
         | SELECT scenario, CAST(n AS BIGINT) AS n, CAST(n_a AS BIGINT)
         |  AS n_a, CAST(n_b AS BIGINT) AS n_b, round(delta, 6) AS delta,
         |  round(ll, 6) AS log_lambda, ll > 2.995732 AS rejected
         | FROM y ORDER BY scenario, n""".stripMargin.replaceAll("\n", " ")
    },
    "q267_temp_scaling" -> {
      def sp(u: String) =
        s"(CASE WHEN ($u) > 30 THEN ($u) ELSE ln(1.0 + exp($u)) END)"
      def sums(th: String, tag: String) = {
        val u = s"($th * z)"
        val p = s"(1.0/(1.0 + exp(-$u)))"
        s"""i$tag AS MATERIALIZED (SELECT
           |  ${Stats.Sql.dsum(s"round(${sp(u)} - y * $u, 6)")} AS nll,
           |  ${Stats.Sql.dsum(s"round(z * ($p - y), 6)")} AS g,
           |  ${Stats.Sql.dsum(s"round(z * z * $p * (1.0 - $p), 6)")} AS h
           |  FROM b${if (tag == "1") "" else s", t${tag.toInt - 1}"})"""
          .stripMargin
      }
      val thPrev = Map("1" -> "1.0", "2" -> "t1.th", "3" -> "t2.th")
      val chain = (1 to 3).map { k =>
        val tag = k.toString
        val tDef = s"""t$tag AS MATERIALIZED (SELECT
           |  round(${thPrev(tag)} - i$tag.g/i$tag.h, 6) AS th,
           |  round(i$tag.nll, 6) AS nll
           |  FROM i$tag${if (k == 1) "" else s", t${k - 1}"})""".stripMargin
        s"${sums(thPrev(tag), tag)}, $tDef"
      }.mkString(", ")
      s"""WITH st AS MATERIALIZED (SELECT
         |  ${Stats.Sql.dmean("CAST(l_extendedprice AS DOUBLE)")} AS mu,
         |  ${Stats.Sql.dstddevSamp("CAST(l_extendedprice AS DOUBLE)")} AS sd
         |  FROM lineitem),
         | b AS MATERIALIZED (SELECT
         |  (CAST(l_extendedprice AS DOUBLE) - mu)/sd AS z,
         |  CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y
         |  FROM lineitem, st),
         | $chain
         | SELECT CAST(1 AS BIGINT) AS iter, 1.0 AS theta_in,
         |  t1.nll AS nll, t1.th AS theta_out FROM t1
         | UNION ALL SELECT CAST(2 AS BIGINT), t1.th, t2.nll, t2.th
         |  FROM t1, t2
         | UNION ALL SELECT CAST(3 AS BIGINT), t2.th, t3.nll, t3.th
         |  FROM t2, t3
         | ORDER BY iter""".stripMargin.replaceAll("\n", " ")
    },
    "q268_energy_distance" ->
      """WITH ev AS MATERIALIZED (SELECT event_id, event_type,
        |  CAST(round(value*100) AS BIGINT) AS vc FROM events
        |  WHERE event_type IN ('click', 'view')),
        | w AS (SELECT event_type, vc,
        |  coalesce(sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END)
        |   OVER wb, 0) AS cca,
        |  coalesce(sum(CASE WHEN event_type='click' THEN vc ELSE 0 END)
        |   OVER wb, 0) AS csa,
        |  coalesce(sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END)
        |   OVER wb, 0) AS ccb,
        |  coalesce(sum(CASE WHEN event_type='view' THEN vc ELSE 0 END)
        |   OVER wb, 0) AS csb
        |  FROM ev WINDOW wb AS (ORDER BY vc*10000000 + event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        | d AS (SELECT event_type, vc*cca - csa AS da, vc*ccb - csb AS db
        |  FROM w),
        | a AS (SELECT
        |  count(CASE WHEN event_type='click' THEN 1 END) AS n_a,
        |  count(CASE WHEN event_type='view' THEN 1 END) AS n_b,
        |  sum((CASE WHEN event_type='click' THEN db ELSE 0 END) +
        |      (CASE WHEN event_type='view' THEN da ELSE 0 END)) AS sxy,
        |  sum(CASE WHEN event_type='click' THEN da ELSE 0 END) AS sxx,
        |  sum(CASE WHEN event_type='view' THEN db ELSE 0 END) AS syy
        |  FROM d),
        | x AS (SELECT n_a, n_b, sxy, sxx, syy,
        |  CAST(sxy AS DOUBLE)/(CAST(n_a AS DOUBLE)*CAST(n_b AS DOUBLE))
        |   AS exy,
        |  2.0*CAST(sxx AS DOUBLE)/(CAST(n_a AS DOUBLE)*(CAST(n_a AS DOUBLE)-1.0))
        |   AS exx,
        |  2.0*CAST(syy AS DOUBLE)/(CAST(n_b AS DOUBLE)*(CAST(n_b AS DOUBLE)-1.0))
        |   AS eyy FROM a)
        | SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |  CAST(sxy AS BIGINT) AS sxy, CAST(sxx AS BIGINT) AS sxx,
        |  CAST(syy AS BIGINT) AS syy,
        |  round(exy/100.0, 6) AS e_xy, round(exx/100.0, 6) AS e_xx,
        |  round(eyy/100.0, 6) AS e_yy,
        |  round((2.0*exy - exx - eyy)/100.0, 6) AS energy_d2
        | FROM x""".stripMargin.replaceAll("\n", " "),
    "q269_neyman" -> {
      val ns = "round(CAST(n_pop AS DOUBLE)*sd_raw, 6)"
      s"""WITH st AS MATERIALIZED (SELECT event_type, count(*) AS n_pop,
         |  ${Stats.Sql.dstddevSamp("value")} AS sd_raw
         |  FROM events GROUP BY event_type),
         | t AS (SELECT ${Stats.Sql.dsum(ns)} AS tot_ns,
         |  sum(n_pop) AS n_tot FROM st)
         | SELECT event_type, CAST(n_pop AS BIGINT) AS n_pop,
         |  round(sd_raw, 6) AS sd_value,
         |  CAST(floor($ns/tot_ns*1e6) AS BIGINT) AS share_e6,
         |  CAST(floor($ns/tot_ns*1000.0) AS BIGINT) AS neyman_n,
         |  CAST(floor(CAST(n_pop AS DOUBLE)/CAST(n_tot AS DOUBLE)*1000.0)
         |   AS BIGINT) AS prop_n
         | FROM st, t ORDER BY event_type""".stripMargin.replaceAll("\n", " ")
    },
    "q270_label_prop" -> {
      // MATERIALIZED chain: each round references its predecessor
      // (q246's 2^R inlining lesson)
      val rounds = (1 to 4).map { r =>
        val prev = if (r == 1) "l0" else s"l${r - 1}"
        s"c$r AS MATERIALIZED (SELECT ed.dst AS v, p.lbl AS nl, count(*) AS c" +
          s" FROM ed JOIN $prev p ON ed.src = p.v GROUP BY 1, 2), " +
          s"l$r AS MATERIALIZED (SELECT c$r.v AS v, min(nl) AS lbl FROM c$r" +
          s" JOIN (SELECT v, max(c) AS mc FROM c$r GROUP BY v) m" +
          s" ON c$r.v = m.v AND c$r.c = m.mc GROUP BY c$r.v)"
      }.mkString(", ")
      s"""WITH p0 AS MATERIALIZED (SELECT l_orderkey AS ok, p_brand AS b
         |  FROM lineitem
         |  JOIN part ON l_partkey = p_partkey GROUP BY 1, 2),
         | e AS MATERIALIZED (SELECT x.b AS b1, y.b AS b2 FROM p0 x JOIN p0 y
         |  ON x.ok = y.ok AND x.b < y.b GROUP BY 1, 2 HAVING count(*) >= 5),
         | ed AS MATERIALIZED (SELECT b1 AS src, b2 AS dst FROM e
         |  UNION ALL SELECT b2, b1 FROM e),
         | l0 AS MATERIALIZED (SELECT DISTINCT src AS v, src AS lbl FROM ed),
         | $rounds
         | SELECT lbl AS community, CAST(count(*) AS BIGINT) AS n_members,
         |  string_agg(v, ',' ORDER BY v) AS members
         | FROM l4 GROUP BY lbl ORDER BY community""".stripMargin
        .replaceAll("\n", " ")
    },
    "q271_fellegi_sunter" ->
      """WITH t AS MATERIALIZED (SELECT c_custkey AS t_custkey,
        |  c_nationkey AS t_nationkey,
        |  CASE WHEN c_custkey % 7 = 0 THEN
        |   substr(c_name, 1, 16) || '9' || substr(c_name, 18)
        |   ELSE c_name END AS t_name,
        |  CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 1.5
        |   ELSE c_acctbal END AS t_acctbal,
        |  CASE WHEN c_custkey % 11 = 0 THEN 'ROTATED'
        |   ELSE c_mktsegment END AS t_mktsegment
        |  FROM customer),
        | p AS (SELECT
        |  round(CASE WHEN c_name = t_name THEN ln(0.95/0.001)
        |   ELSE ln((1.0-0.95)/(1.0-0.001)) END, 6)
        |  + round(CASE WHEN c_mktsegment = t_mktsegment THEN ln(0.95/0.2)
        |   ELSE ln((1.0-0.95)/(1.0-0.2)) END, 6)
        |  + round(CASE WHEN abs(c_acctbal - t_acctbal) <= 1.0
        |   THEN ln(0.98/0.01) ELSE ln((1.0-0.98)/(1.0-0.01)) END, 6)
        |   AS fs_w,
        |  (c_custkey = t_custkey) AS is_true
        |  FROM customer JOIN t ON c_nationkey = t_nationkey
        |   AND substr(c_name, 1, 15) = substr(t_name, 1, 15))
        | SELECT CASE WHEN fs_w > 5.0 THEN 'link'
        |   WHEN fs_w < 0.0 THEN 'non_link' ELSE 'possible' END AS decision,
        |  CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(count(CASE WHEN is_true THEN 1 END) AS BIGINT) AS n_true,
        |  round(CAST(sum(CAST(fs_w AS DECIMAL(38,10))) AS DOUBLE)
        |   / count(*), 6) AS mean_w
        | FROM p GROUP BY 1 ORDER BY decision""".stripMargin
        .replaceAll("\n", " "),
    "q272_shapley_attribution" ->
      """WITH pu AS MATERIALIZED (SELECT user_id,
        |  max(CASE WHEN event_type='click' AND event_id % 13 < 4
        |   THEN 1 ELSE 0 END) +
        |  max(CASE WHEN event_type='view' AND event_id % 13 < 4
        |   THEN 2 ELSE 0 END) +
        |  max(CASE WHEN event_type='signup' AND event_id % 13 < 4
        |   THEN 4 ELSE 0 END) +
        |  max(CASE WHEN event_type='error' AND event_id % 13 < 4
        |   THEN 8 ELSE 0 END) AS mask,
        |  max(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY user_id),
        | coal AS MATERIALIZED (SELECT mask, count(*) AS n, sum(conv) AS nc
        |  FROM pu GROUP BY mask),
        | allm AS (SELECT unnest(generate_series(0, 15)) AS mask),
        | vv AS MATERIALIZED (SELECT a.mask AS mask,
        |   coalesce(nc * 1000000 // n, 0) AS v6
        |  FROM allm a LEFT JOIN coal c ON a.mask = c.mask),
        | ch AS (SELECT 'click' AS channel, 1 AS bit
        |  UNION ALL SELECT 'view', 2 UNION ALL SELECT 'signup', 4
        |  UNION ALL SELECT 'error', 8),
        | t AS (SELECT ch.channel, sum(
        |   (CASE ((vs.mask & 1) + ((vs.mask >> 1) & 1) +
        |          ((vs.mask >> 2) & 1) + ((vs.mask >> 3) & 1))
        |    WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END)
        |   * (vb.v6 - vs.v6)) AS phi_x
        |  FROM ch JOIN vv vs ON (vs.mask & ch.bit) = 0
        |   JOIN vv vb ON vb.mask = vs.mask + ch.bit
        |  GROUP BY ch.channel),
        | ex AS (SELECT ch.channel, sum(c.n) AS n_exposed FROM ch
        |  JOIN coal c ON (c.mask & ch.bit) <> 0 GROUP BY ch.channel)
        | SELECT t.channel AS channel,
        |  CAST(coalesce(ex.n_exposed, 0) AS BIGINT) AS n_exposed_users,
        |  CAST(phi_x AS BIGINT) AS phi_x24e6,
        |  round(CAST(phi_x AS DOUBLE)/24.0/1000000.0, 6) AS shapley_value
        | FROM t LEFT JOIN ex ON t.channel = ex.channel
        | ORDER BY channel""".stripMargin.replaceAll("\n", " "),
    "q273_stratified_ate" -> {
      val bucket = graft.aug.Sampling.Sql.keyBucket("o_orderkey", 1234L)
      val yt = "(CASE WHEN t THEN y END)"
      val yc = "(CASE WHEN NOT t THEN y END)"
      s"""WITH o AS MATERIALIZED (SELECT o_orderpriority AS stratum,
         |  CAST(o_totalprice AS DOUBLE) AS y, ($bucket) < 500000 AS t
         |  FROM orders),
         | st AS MATERIALIZED (SELECT stratum, count(*) AS n_h,
         |  count(CASE WHEN t THEN 1 END) AS n_t,
         |  count(CASE WHEN NOT t THEN 1 END) AS n_c,
         |  ${Stats.Sql.dmean(yt)} AS my_t, ${Stats.Sql.dmean(yc)} AS my_c,
         |  ${Stats.Sql.dvarSamp(yt)} AS v_t, ${Stats.Sql.dvarSamp(yc)} AS v_c
         |  FROM o GROUP BY stratum),
         | tt AS (SELECT sum(n_h) AS n_tot FROM st),
         | per AS MATERIALIZED (SELECT stratum, n_h, n_t, n_c,
         |  round(my_t - my_c, 6) AS diff_h,
         |  (CAST(n_h AS DOUBLE)/CAST(n_tot AS DOUBLE)) * (my_t - my_c)
         |   AS wdiff_raw,
         |  (CAST(n_h AS DOUBLE)/CAST(n_tot AS DOUBLE)) *
         |  (CAST(n_h AS DOUBLE)/CAST(n_tot AS DOUBLE)) *
         |  (v_t/n_t + v_c/n_c) AS wvar_raw
         |  FROM st, tt),
         | a AS (SELECT ${Stats.Sql.dsum("round(wdiff_raw, 6)")} AS ate,
         |  ${Stats.Sql.dsum("round(wvar_raw, 6)")} AS var_ate FROM per)
         | SELECT stratum, CAST(n_h AS BIGINT) AS n_h,
         |  CAST(n_t AS BIGINT) AS n_t, CAST(n_c AS BIGINT) AS n_c,
         |  diff_h, round(ate, 6) AS ate, round(sqrt(var_ate), 6) AS se_ate
         | FROM per, a ORDER BY stratum""".stripMargin.replaceAll("\n", " ")
    },
    "q274_ams_f2" -> {
      val toks = graft.text.TextOps.Sql.toks("text")
      val bh = graft.text.TextOps.Sql.strHash("toks[i] || ' ' || toks[i+1]")
      val sums = (1 to 16).map { j =>
        val t = s"(h + ${j * 1000003L})"
        s"sum(CASE WHEN ($t*$t) % 1000000007 % 2 = 0 THEN 1 ELSE -1 END)" +
          s" AS s$j"
      }.mkString(", ")
      val sqsum = (1 to 16).map(j => s"s$j*s$j").mkString(" + ")
      val moms = (0 until 4).map { g =>
        val t = (1 to 4).map(k => s"s${g * 4 + k}*s${g * 4 + k}")
          .mkString(" + ")
        s"($t)/4.0"
      }.mkString(", ")
      s"""WITH tk AS MATERIALIZED (SELECT $toks AS toks FROM documents),
         | inst AS MATERIALIZED (SELECT unnest(CASE WHEN len(toks) >= 2 THEN
         |   list_transform(generate_series(1, len(toks)-1), i -> $bh)
         |   ELSE [] END) AS h FROM tk),
         | sk AS MATERIALIZED (SELECT $sums FROM inst),
         | ex AS (SELECT count(*) AS n_distinct, sum(c*c) AS f2,
         |   sum(c) AS n_inst
         |  FROM (SELECT h, count(*) AS c FROM inst GROUP BY h)),
         | es AS (SELECT CAST(($sqsum) AS DOUBLE)/16.0 AS est_mean,
         |  (SELECT (l[2] + l[3])/2.0 FROM
         |   (SELECT list_sort([$moms]) AS l)) AS est_mom
         |  FROM sk)
         | SELECT CAST(n_inst AS BIGINT) AS n_inst,
         |  CAST(n_distinct AS BIGINT) AS n_distinct,
         |  CAST(f2 AS BIGINT) AS f2_exact,
         |  round(est_mean, 6) AS f2_est_mean, round(est_mom, 6) AS f2_est_mom,
         |  round((est_mean - CAST(f2 AS DOUBLE))/CAST(f2 AS DOUBLE), 6)
         |   AS rel_err_mean,
         |  round((est_mom - CAST(f2 AS DOUBLE))/CAST(f2 AS DOUBLE), 6)
         |   AS rel_err_mom
         | FROM ex, es""".stripMargin.replaceAll("\n", " ")
    },
    "q275_iv_late" -> {
      val z = s"(${graft.aug.Sampling.Sql.keyBucket("o_orderkey", 777L)}) < 500000"
      val comp = "(CAST(nd1 AS DOUBLE)/n1 - CAST(nd0 AS DOUBLE)/n0)"
      s"""WITH o AS MATERIALIZED (SELECT ($z) AS z,
         |  ((($z) AND o_custkey % 3 <> 0) OR
         |   (NOT ($z) AND o_custkey % 7 = 0)) AS d,
         |  CAST(o_totalprice AS DOUBLE) AS y0 FROM orders),
         | sc AS MATERIALIZED (
         |  SELECT 'null' AS scenario, z, d, y0 AS y FROM o
         |  UNION ALL SELECT 'injected', z, d,
         |   y0 + CASE WHEN d THEN 500.0 ELSE 0.0 END FROM o),
         | g AS MATERIALIZED (SELECT scenario, z, count(*) AS n,
         |  ${Stats.Sql.dmean("y")} AS my, ${Stats.Sql.dvarSamp("y")} AS vy,
         |  count(CASE WHEN d THEN 1 END) AS n_d
         |  FROM sc GROUP BY scenario, z),
         | j AS (SELECT a.scenario AS scenario, a.n AS n1, a.my AS my1,
         |   a.vy AS vy1, a.n_d AS nd1, b.n AS n0, b.my AS my0,
         |   b.vy AS vy0, b.n_d AS nd0
         |  FROM g a JOIN g b ON a.scenario = b.scenario
         |   AND a.z AND NOT b.z)
         | SELECT scenario, CAST(n1 + n0 AS BIGINT) AS n,
         |  round(my1 - my0, 6) AS itt,
         |  round($comp, 6) AS compliance_diff,
         |  round((my1 - my0) / $comp, 6) AS late,
         |  round(sqrt(vy1/n1 + vy0/n0) / abs($comp), 6) AS se_late
         | FROM j ORDER BY scenario""".stripMargin.replaceAll("\n", " ")
    },
    "q276_did" -> {
      val treated =
        s"(${graft.aug.Sampling.Sql.keyBucket("user_id", 31L)}) < 500000"
      s"""WITH e AS MATERIALIZED (SELECT ($treated) AS t,
         |  event_id % 10 AS phase, CAST(value AS DOUBLE) AS y0 FROM events),
         | sc AS MATERIALIZED (
         |  SELECT 'null' AS scenario, t, phase, y0 AS y FROM e
         |  UNION ALL SELECT 'injected', t, phase,
         |   y0 + CASE WHEN t AND phase >= 5 THEN 25.0 ELSE 0.0 END FROM e),
         | g AS MATERIALIZED (SELECT scenario, t,
         |  CASE WHEN phase >= 5 THEN 'post' WHEN phase < 2 THEN 'pre_a'
         |   ELSE 'pre_b' END AS grp,
         |  count(*) AS n, ${Stats.Sql.dmean("y")} AS my,
         |  ${Stats.Sql.dvarSamp("y")} AS vy
         |  FROM sc GROUP BY 1, 2, 3),
         | j AS (SELECT tp.scenario AS scenario,
         |  tp.n AS n_tp, tp.my AS my_tp, tp.vy AS vy_tp,
         |  ta.n AS n_ta, ta.my AS my_ta, ta.vy AS vy_ta,
         |  tb.n AS n_tb, tb.my AS my_tb,
         |  cp.n AS n_cp, cp.my AS my_cp, cp.vy AS vy_cp,
         |  ca.n AS n_ca, ca.my AS my_ca, ca.vy AS vy_ca,
         |  cb.n AS n_cb, cb.my AS my_cb
         |  FROM g tp, g ta, g tb, g cp, g ca, g cb
         |  WHERE tp.scenario = ta.scenario AND tp.scenario = tb.scenario
         |   AND tp.scenario = cp.scenario AND tp.scenario = ca.scenario
         |   AND tp.scenario = cb.scenario
         |   AND tp.t AND tp.grp = 'post' AND ta.t AND ta.grp = 'pre_a'
         |   AND tb.t AND tb.grp = 'pre_b'
         |   AND NOT cp.t AND cp.grp = 'post'
         |   AND NOT ca.t AND ca.grp = 'pre_a'
         |   AND NOT cb.t AND cb.grp = 'pre_b'),
         | x AS (SELECT scenario,
         |  n_tp + n_ta + n_tb + n_cp + n_ca + n_cb AS n,
         |  (my_tp - (my_ta*n_ta + my_tb*n_tb)/(n_ta + n_tb)) -
         |  (my_cp - (my_ca*n_ca + my_cb*n_cb)/(n_ca + n_cb)) AS did,
         |  sqrt(vy_tp/n_tp + vy_cp/n_cp + vy_ta/n_ta + vy_ca/n_ca)
         |   AS se_did,
         |  (my_tb - my_ta) - (my_cb - my_ca) AS placebo FROM j)
         | SELECT scenario, CAST(n AS BIGINT) AS n, round(did, 6) AS did,
         |  round(se_did, 6) AS se_did,
         |  round(placebo, 6) AS placebo_pre_trend
         | FROM x ORDER BY scenario""".stripMargin.replaceAll("\n", " ")
    },
    "q277_rdd" -> {
      val nD = "CAST(count(*) AS DOUBLE)"
      s"""WITH o AS MATERIALIZED (SELECT o_custkey,
         |  ${Stats.Sql.dsum("o_totalprice")} AS rev FROM orders
         |  GROUP BY o_custkey),
         | b AS MATERIALIZED (SELECT
         |  CAST(c_acctbal AS DOUBLE) - 5000.0 AS xc,
         |  CAST(c_acctbal AS DOUBLE) >= 5000.0 AS rgt, rev AS y0
         |  FROM customer JOIN o ON c_custkey = o_custkey
         |  WHERE abs(CAST(c_acctbal AS DOUBLE) - 5000.0) <= 2000.0),
         | sc AS MATERIALIZED (
         |  SELECT 'null' AS scenario, xc, rgt, y0 AS y FROM b
         |  UNION ALL SELECT 'injected', xc, rgt,
         |   y0 + CASE WHEN rgt THEN 300.0 ELSE 0.0 END FROM b),
         | g AS MATERIALIZED (SELECT scenario, rgt, count(*) AS n,
         |  ($nD * ${Stats.Sql.dsum("xc*y")} -
         |   ${Stats.Sql.dsum("xc")} * ${Stats.Sql.dsum("y")}) /
         |  ($nD * ${Stats.Sql.dsum("xc*xc")} -
         |   ${Stats.Sql.dsum("xc")} * ${Stats.Sql.dsum("xc")}) AS slope,
         |  ${Stats.Sql.dsum("y")} / $nD AS my,
         |  ${Stats.Sql.dsum("xc")} / $nD AS mx
         |  FROM sc GROUP BY 1, 2),
         | g2 AS (SELECT scenario, rgt, n, slope, my - slope*mx AS a FROM g),
         | f AS (SELECT l.scenario AS scenario, l.n AS n_left,
         |   r.n AS n_right, l.a AS a_l, r.a AS a_r, l.slope AS b_l,
         |   r.slope AS b_r
         |  FROM g2 l JOIN g2 r ON l.scenario = r.scenario
         |   AND NOT l.rgt AND r.rgt)
         | SELECT scenario, CAST(n_left AS BIGINT) AS n_left,
         |  CAST(n_right AS BIGINT) AS n_right,
         |  round(a_l, 6) AS intercept_left, round(a_r, 6) AS intercept_right,
         |  round(b_l, 6) AS slope_left, round(b_r, 6) AS slope_right,
         |  round(a_r - a_l, 6) AS jump
         | FROM f ORDER BY scenario""".stripMargin.replaceAll("\n", " ")
    },
    "q278_raking" -> {
      val pred = graft.aug.Sampling.Sql.samplePred("event_id", 0.3, 99L)
      def half(prev: String, out: String, margin: String) = {
        val fTab = s"f_$out"
        s"""$fTab AS MATERIALIZED (SELECT $margin,
           | CAST(sum(n_pop) AS DOUBLE) AS target,
           | ${Stats.Sql.dsum("round(w * n_samp, 6)")} AS got
           | FROM $prev GROUP BY $margin),
           |$out AS MATERIALIZED (SELECT p.r AS r, p.c AS c, p.n_pop AS n_pop,
           | p.n_samp AS n_samp,
           | round(p.w * (CASE WHEN f.got > 0 THEN f.target/f.got
           |  ELSE 1.0 END), 6) AS w
           | FROM $prev p JOIN $fTab f ON p.$margin = f.$margin)"""
          .stripMargin
      }
      val chain = (1 to 3).flatMap { k =>
        Seq(half(if (k == 1) "w0" else s"w${2 * k - 2}", s"w${2 * k - 1}", "r"),
          half(s"w${2 * k - 1}", s"w${2 * k}", "c"))
      }.mkString(", ")
      s"""WITH ev AS MATERIALIZED (SELECT event_id, event_type AS r,
         |  CASE WHEN value < 50 THEN 'lo' WHEN value < 200 THEN 'mid'
         |   ELSE 'hi' END AS c FROM events),
         | popc AS MATERIALIZED (SELECT r, c, count(*) AS n_pop FROM ev
         |  GROUP BY r, c),
         | sampc AS MATERIALIZED (SELECT r, c, count(*) AS n_samp FROM ev
         |  WHERE $pred GROUP BY r, c),
         | cells AS MATERIALIZED (SELECT p.r AS r, p.c AS c, p.n_pop AS n_pop,
         |  coalesce(s.n_samp, 0) AS n_samp
         |  FROM popc p LEFT JOIN sampc s ON p.r = s.r AND p.c = s.c),
         | tot AS (SELECT sum(n_pop) AS np, sum(n_samp) AS ns FROM cells),
         | w0 AS MATERIALIZED (SELECT r, c, n_pop, n_samp,
         |  round(CAST(np AS DOUBLE)/ns, 6) AS w FROM cells, tot),
         | $chain
         | SELECT r AS event_type, c AS band, CAST(n_pop AS BIGINT) AS n_pop,
         |  CAST(n_samp AS BIGINT) AS n_samp, w AS weight,
         |  round(w * n_samp, 6) AS w_mass
         | FROM w6 ORDER BY event_type, band""".stripMargin
        .replaceAll("\n", " ")
    },
    "q279_w1_drift" -> {
      val arm = s"(${graft.aug.Sampling.Sql.keyBucket("user_id", 31L)}) < 500000"
      s"""WITH base AS MATERIALIZED (SELECT ($arm) AS a,
         |  CAST(round(value*100) AS BIGINT) AS vc FROM events),
         | sc AS MATERIALIZED (
         |  SELECT 'healthy' AS scenario, a, vc AS v FROM base
         |  UNION ALL SELECT 'shifted', a,
         |   CASE WHEN a THEN vc ELSE (vc*5)//4 END FROM base),
         | g AS MATERIALIZED (SELECT scenario, v,
         |  count(CASE WHEN a THEN 1 END) AS ca,
         |  count(CASE WHEN NOT a THEN 1 END) AS cb
         |  FROM sc GROUP BY scenario, v),
         | t AS (SELECT scenario, sum(ca) AS n_a, sum(cb) AS n_b FROM g
         |  GROUP BY scenario),
         | c AS (SELECT scenario, v, sum(ca) OVER w AS cuma,
         |  sum(cb) OVER w AS cumb,
         |  lead(v) OVER (PARTITION BY scenario ORDER BY v) - v AS gap
         |  FROM g WINDOW w AS (PARTITION BY scenario ORDER BY v
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         | x AS (SELECT c.scenario AS scenario, count(*) AS n_distinct,
         |  sum(CASE WHEN gap IS NOT NULL
         |   THEN abs(cuma*n_b - cumb*n_a)*gap ELSE 0 END) AS w1_num,
         |  max(n_a) AS n_a, max(n_b) AS n_b
         |  FROM c JOIN t ON c.scenario = t.scenario GROUP BY c.scenario)
         | SELECT scenario, CAST(n_a AS BIGINT) AS n_a,
         |  CAST(n_b AS BIGINT) AS n_b,
         |  CAST(n_distinct AS BIGINT) AS n_distinct,
         |  CAST(w1_num AS BIGINT) AS w1_num,
         |  round(CAST(w1_num AS DOUBLE) /
         |   (CAST(n_a AS DOUBLE)*CAST(n_b AS DOUBLE)) / 100.0, 6)
         |   AS w1_dollars
         | FROM x ORDER BY scenario""".stripMargin.replaceAll("\n", " ")
    },
    "q280_coverage_select" -> {
      val toks = graft.text.TextOps.Sql.toks("text")
      val hash = graft.text.TextOps.Sql.strHash(
        "array_to_string(toks[i:i+2], ' ')")
      val rounds = (1 to 8).map { k =>
        val notCov = if (k == 1) ""
        else s" LEFT JOIN c${k - 1} ON gr.g = c${k - 1}.g" +
          s" WHERE c${k - 1}.g IS NULL"
        val pick = s"p$k AS MATERIALIZED (SELECT gr.doc_id AS doc_id," +
          s" count(*) AS gain FROM gr$notCov GROUP BY gr.doc_id" +
          s" ORDER BY gain DESC, gr.doc_id LIMIT 1)"
        val cov = if (k == 1)
          s"c1 AS MATERIALIZED (SELECT DISTINCT g FROM gr JOIN p1 USING (doc_id))"
        else
          s"c$k AS MATERIALIZED (SELECT g FROM c${k - 1} UNION" +
            s" SELECT g FROM gr JOIN p$k USING (doc_id))"
        s"$pick, $cov"
      }.mkString(", ")
      val out = (1 to 8).map { k =>
        s"SELECT CAST($k AS BIGINT) AS rank, doc_id, CAST(gain AS BIGINT)" +
          s" AS gain, CAST((SELECT count(*) FROM c$k) AS BIGINT)" +
          s" AS cum_covered, CAST((SELECT count(*) FROM c$k) * 1000000" +
          s" // (SELECT u FROM tot) AS BIGINT) AS coverage_e6 FROM p$k"
      }.mkString(" UNION ALL ")
      s"""WITH t AS MATERIALIZED (SELECT doc_id, $toks AS toks
         |  FROM documents),
         | gr AS MATERIALIZED (SELECT DISTINCT doc_id, g FROM (
         |  SELECT doc_id, unnest(CASE WHEN len(toks) >= 3 THEN
         |   list_transform(generate_series(1, len(toks)-2), i -> $hash)
         |   ELSE [] END) AS g FROM t)),
         | tot AS (SELECT count(DISTINCT g) AS u FROM gr),
         | $rounds
         | $out ORDER BY rank""".stripMargin.replaceAll("\n", " ")
    },
    "q281_brier" -> {
      val mu = Stats.Sql.dmean("CAST(l_extendedprice AS DOUBLE)")
      val sd = Stats.Sql.dstddevSamp("CAST(l_extendedprice AS DOUBLE)")
      s"""WITH st AS MATERIALIZED (SELECT $mu AS mu, $sd AS sd
         |  FROM lineitem),
         | b AS MATERIALIZED (SELECT
         |  CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y,
         |  round(1.0/(1.0 + exp(-(0.025 *
         |   ((CAST(l_extendedprice AS DOUBLE) - mu)/sd)))), 6) AS p
         |  FROM lineitem, st),
         | b2 AS MATERIALIZED (SELECT y, p,
         |  least(9, CAST(floor(p*10) AS BIGINT)) AS bin FROM b),
         | g AS MATERIALIZED (SELECT count(*) AS n_tot,
         |  ${Stats.Sql.dsum("y")}/count(*) AS ybar,
         |  round(${Stats.Sql.dsum("round((p - y)*(p - y), 6)")}/count(*), 6)
         |   AS brier FROM b2),
         | k AS MATERIALIZED (SELECT bin, count(*) AS nk,
         |  ${Stats.Sql.dsum("p")}/count(*) AS pk,
         |  ${Stats.Sql.dsum("y")}/count(*) AS yk FROM b2 GROUP BY bin),
         | r AS (SELECT n_tot, ybar, brier,
         |  round(${Stats.Sql.dsum("round(nk*(pk - yk)*(pk - yk), 6)")}
         |   / n_tot, 6) AS reliability,
         |  round(${Stats.Sql.dsum("round(nk*(yk - ybar)*(yk - ybar), 6)")}
         |   / n_tot, 6) AS resolution
         |  FROM k CROSS JOIN g GROUP BY n_tot, ybar, brier)
         | SELECT CAST(n_tot AS BIGINT) AS n_tot, brier, reliability,
         |  resolution, round(ybar*(1.0 - ybar), 6) AS uncertainty,
         |  round(brier - (reliability - resolution + ybar*(1.0 - ybar)), 6)
         |   AS identity_gap
         | FROM r""".stripMargin.replaceAll("\n", " ")
    },
    "q282_collocations" -> {
      val toks = graft.text.TextOps.Sql.toks("text")
      def t(k: String, r: String, c: String) =
        s"round(CASE WHEN ($k) > 0 THEN CAST($k AS DOUBLE) * " +
          s"ln(CAST($k AS DOUBLE) * CAST(nt AS DOUBLE) / " +
          s"(CAST($r AS DOUBLE) * CAST($c AS DOUBLE))) ELSE 0.0 END, 6)"
      val g2 = s"2.0 * (${t("cab", "c1", "c2")} + " +
        s"${t("c1 - cab", "c1", "nt - c2")} + " +
        s"${t("c2 - cab", "nt - c1", "c2")} + " +
        s"${t("nt - c1 - c2 + cab", "nt - c1", "nt - c2")})"
      s"""WITH tk AS MATERIALIZED (SELECT $toks AS toks FROM documents),
         | bi AS MATERIALIZED (SELECT b['w1'] AS w1, b['w2'] AS w2 FROM (
         |  SELECT unnest(CASE WHEN len(toks) >= 2 THEN
         |   list_transform(generate_series(1, len(toks)-1),
         |    i -> {'w1': toks[i], 'w2': toks[i+1]}) ELSE [] END) AS b
         |  FROM tk)),
         | n AS (SELECT count(*) AS nt FROM bi),
         | pr AS (SELECT w1, w2, count(*) AS cab FROM bi GROUP BY w1, w2
         |  HAVING count(*) >= 5),
         | m1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY w1),
         | m2 AS (SELECT w2, count(*) AS c2 FROM bi GROUP BY w2),
         | x AS (SELECT pr.w1 AS w1, pr.w2 AS w2, cab, c1, c2, nt
         |  FROM pr JOIN m1 ON pr.w1 = m1.w1 JOIN m2 ON pr.w2 = m2.w2, n)
         | SELECT w1, w2, CAST(cab AS BIGINT) AS cab,
         |  CAST(c1 AS BIGINT) AS c1, CAST(c2 AS BIGINT) AS c2,
         |  round($g2, 6) AS llr
         | FROM x ORDER BY llr DESC, w1, w2 LIMIT 20""".stripMargin
        .replaceAll("\n", " ")
    },
    "q283_pinball" -> {
      val train =
        s"(${graft.aug.Sampling.Sql.keyBucket("o_orderkey", 17L)}) < 500000"
      s"""WITH b AS MATERIALIZED (SELECT o_orderkey,
         |  o_orderpriority AS seg, CAST(o_totalprice AS DOUBLE) AS y,
         |  ($train) AS train FROM orders),
         | m AS MATERIALIZED (SELECT seg, ${Stats.Sql.dmean("y")} AS yhat
         |  FROM b WHERE train GROUP BY seg),
         | t AS MATERIALIZED (SELECT tau, y - yhat AS e
         |  FROM b JOIN m USING (seg),
         |   (SELECT unnest([0.1::DOUBLE, 0.5::DOUBLE, 0.9::DOUBLE]) AS tau)
         |  WHERE NOT train)
         | SELECT tau, CAST(count(*) AS BIGINT) AS n_test,
         |  round(${Stats.Sql.dsum(
               "round(greatest(tau*e, (tau - CAST(1.0 AS DOUBLE))*e), 6)")}
         |   / count(*), 6) AS pinball
         | FROM t GROUP BY tau ORDER BY tau""".stripMargin
        .replaceAll("\n", " ")
    },
    "q284_ht_total" -> {
      val pred = graft.aug.Sampling.Sql.stratPred("k", "cls",
        Map("A" -> 0.2, "N" -> 0.05, "R" -> 0.5), 7L)
      s"""WITH b AS MATERIALIZED (SELECT
         |  l_orderkey*10 + l_linenumber AS k, l_returnflag AS cls,
         |  CAST(l_extendedprice AS DOUBLE) AS y FROM lineitem),
         | pop AS (SELECT cls, count(*) AS n_pop,
         |  round(${Stats.Sql.dsum("y")}, 4) AS t_true FROM b GROUP BY cls),
         | s AS MATERIALIZED (SELECT cls, y,
         |  CASE cls WHEN 'A' THEN 5 WHEN 'N' THEN 20 ELSE 2 END AS w
         |  FROM b WHERE $pred),
         | sa AS (SELECT cls, count(*) AS n_samp, max(w) AS inv_pi,
         |  round(${Stats.Sql.dsum("w*y")}, 4) AS t_hat,
         |  ${Stats.Sql.dvarSamp("y")} AS s2 FROM s GROUP BY cls)
         | SELECT cls, CAST(n_pop AS BIGINT) AS n_pop,
         |  CAST(n_samp AS BIGINT) AS n_samp,
         |  CAST(inv_pi AS BIGINT) AS inv_pi, t_hat, t_true,
         |  round(t_hat/t_true, 6) AS ratio,
         |  round(sqrt(CAST(n_pop AS DOUBLE)*CAST(n_pop AS DOUBLE)*
         |   (1.0 - CAST(n_samp AS DOUBLE)/CAST(n_pop AS DOUBLE))*s2
         |   /CAST(n_samp AS DOUBLE)), 4) AS se_t
         | FROM pop JOIN sa USING (cls) ORDER BY cls""".stripMargin
        .replaceAll("\n", " ")
    },
    "q285_uplift" -> {
      val treat = graft.aug.Sampling.Sql.keyBucket("c_custkey", 23L)
      val draw = graft.aug.Sampling.Sql.keyBucket("c_custkey", 97L)
      s"""WITH conv AS (SELECT o_custkey AS c_custkey,
         |  max(CASE WHEN o_totalprice > 480000.0 THEN 1 ELSE 0 END)
         |   AS base_conv FROM orders GROUP BY o_custkey),
         | ed AS (SELECT DISTINCT edge FROM (SELECT unnest(
         |   quantile_cont(c_acctbal, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6,
         |    0.7, 0.8, 0.9])) AS edge FROM customer)),
         | b AS MATERIALIZED (SELECT c.c_custkey,
         |  COALESCE(v.base_conv, 0) AS base_conv,
         |  (SELECT count(*) FROM ed WHERE c.c_acctbal > ed.edge) AS decile,
         |  ($treat) < 500000 AS treated, ($draw) AS lift_draw
         |  FROM customer c LEFT JOIN conv v USING (c_custkey)),
         | sc AS (SELECT 'healthy' AS scenario, decile, treated,
         |   base_conv AS conv FROM b
         |  UNION ALL SELECT 'injected', decile, treated,
         |   greatest(base_conv, CASE WHEN treated AND
         |    lift_draw < decile * 20000 THEN 1 ELSE 0 END) FROM b),
         | per AS (SELECT scenario, decile,
         |   count(*) FILTER (WHERE treated) AS n_t,
         |   count(*) FILTER (WHERE NOT treated) AS n_c,
         |   sum(conv) FILTER (WHERE treated) AS conv_t,
         |   sum(conv) FILTER (WHERE NOT treated) AS conv_c
         |  FROM sc GROUP BY scenario, decile)
         | SELECT scenario, CAST(decile AS BIGINT) AS decile,
         |  CAST(n_t AS BIGINT) AS n_t, CAST(n_c AS BIGINT) AS n_c,
         |  round(CAST(conv_t AS DOUBLE) / CAST(n_t AS DOUBLE), 6) AS rate_t,
         |  round(CAST(conv_c AS DOUBLE) / CAST(n_c AS DOUBLE), 6) AS rate_c,
         |  round(CAST(conv_t AS DOUBLE) / CAST(n_t AS DOUBLE) -
         |   CAST(conv_c AS DOUBLE) / CAST(n_c AS DOUBLE), 6) AS uplift,
         |  round(CAST(sum(CAST(round(CAST(conv_t AS DOUBLE) -
         |    CAST(conv_c AS DOUBLE) * CAST(n_t AS DOUBLE) /
         |    CAST(n_c AS DOUBLE), 6) AS DECIMAL(38,10)))
         |   OVER (PARTITION BY scenario ORDER BY decile DESC
         |    ROWS UNBOUNDED PRECEDING) AS DOUBLE), 6) AS qini_cum
         | FROM per ORDER BY scenario, decile""".stripMargin
        .replaceAll("\n", " ")
    },
    "q286_retrieval_eval" -> {
      import graft.sim.VectorMath.{Sql => V}
      s"""WITH v AS MATERIALIZED (SELECT vec_id AS id,
         |  CAST(label AS BIGINT) AS lbl, embedding AS vec,
         |  ${V.norm2("embedding")} AS n2 FROM embeddings),
         | rc AS (SELECT lbl, count(*) AS r_corpus FROM v
         |  WHERE id >= 50 GROUP BY lbl),
         | p AS (SELECT x.id AS a, x.lbl AS la, y.id AS b, y.lbl AS lb,
         |   ${V.dot("x.vec", "y.vec")} / (sqrt(x.n2) * sqrt(y.n2)) AS cos
         |  FROM v x JOIN v y ON y.id >= 50 WHERE x.id < 50),
         | r AS (SELECT a, la, b, lb, CASE WHEN la = lb THEN 1 ELSE 0 END
         |   AS rel, row_number() OVER (PARTITION BY a
         |    ORDER BY cos DESC, b ASC) AS rank FROM p),
         | t AS (SELECT a, la, rel, rank,
         |   CAST(sum(rel) OVER (PARTITION BY a ORDER BY rank
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_rel
         |  FROM r WHERE rank <= 10),
         | pq AS (SELECT a, la,
         |   ${Stats.Sql.dsum(
             "round(CAST(rel AS DOUBLE) * CAST(cum_rel AS DOUBLE) / CAST(rank AS DOUBLE), 6)")}
         |    AS ap_num,
         |   CAST(sum(rel) AS BIGINT) AS n_rel_found,
         |   min(CASE WHEN rel = 1 THEN rank END) AS first_rel
         |  FROM t GROUP BY a, la),
         | pj AS (SELECT pq.*, round(ap_num / CAST(least(rc.r_corpus,
         |    10) AS DOUBLE), 6) AS ap,
         |   round(COALESCE(CAST(1 AS DOUBLE) / CAST(first_rel AS DOUBLE),
         |    CAST(0 AS DOUBLE)), 6) AS rr
         |  FROM pq JOIN rc ON rc.lbl = pq.la)
         | SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |  round(${Stats.Sql.dsum("rr")} / count(*), 6) AS mrr,
         |  round(${Stats.Sql.dsum("ap")} / count(*), 6) AS map10,
         |  round(CAST(sum(n_rel_found) AS DOUBLE) /
         |   CAST(count(*) * 10 AS DOUBLE), 6) AS p10,
         |  round(CAST(count(*) FILTER (WHERE n_rel_found > 0) AS DOUBLE) /
         |   CAST(count(*) AS DOUBLE), 6) AS hit10
         | FROM pj""".stripMargin.replaceAll("\n", " ")
    },
    "q287_centroid_classifier" -> {
      val train = graft.aug.Sampling.Sql.keyBucket("vec_id", 31L)
      s"""WITH e AS MATERIALIZED (SELECT CAST(vec_id AS BIGINT) AS id,
         |  CAST(label AS BIGINT) AS label, embedding,
         |  ($train) < 600000 AS train FROM embeddings),
         | cd AS (SELECT label, dim,
         |   ${Stats.Sql.dsum("CAST(embedding[dim] AS DOUBLE)")} / count(*)
         |    AS mean
         |  FROM (SELECT label, unnest(generate_series(1, len(embedding)))
         |    AS dim, embedding FROM e WHERE train) GROUP BY label, dim),
         | c AS MATERIALIZED (SELECT label AS cl,
         |   list(mean ORDER BY dim) AS cv FROM cd GROUP BY label),
         | d AS MATERIALIZED (SELECT e.id, e.label, c.cl,
         |   list_reduce(list_prepend(0.0::DOUBLE,
         |    list_transform(generate_series(1, len(e.embedding)),
         |     i -> (CAST(e.embedding[i] AS DOUBLE) - cv[i]) *
         |          (CAST(e.embedding[i] AS DOUBLE) - cv[i]))),
         |    (acc, x) -> acc + x) AS d2
         |  FROM e CROSS JOIN c WHERE NOT e.train),
         | pr AS (SELECT id, label, min(cl) FILTER (WHERE d2 = md) AS pred
         |  FROM (SELECT id, label, cl, d2,
         |    min(d2) OVER (PARTITION BY id) AS md FROM d)
         |  GROUP BY id, label),
         | bt AS (SELECT label, count(*) AS n_true,
         |   count(*) FILTER (WHERE pred = label) AS tp
         |  FROM pr GROUP BY label),
         | bp AS (SELECT pred AS label, count(*) AS n_pred
         |  FROM pr GROUP BY pred),
         | cls AS (SELECT bt.label, bt.n_true,
         |   COALESCE(bp.n_pred, 0) AS n_pred, bt.tp,
         |   round(CASE WHEN COALESCE(bp.n_pred, 0) > 0 THEN
         |    CAST(bt.tp AS DOUBLE) / CAST(bp.n_pred AS DOUBLE)
         |    ELSE CAST(0 AS DOUBLE) END, 6) AS precision,
         |   round(CAST(bt.tp AS DOUBLE) / CAST(bt.n_true AS DOUBLE), 6)
         |    AS recall
         |  FROM bt LEFT JOIN bp ON bp.label = bt.label),
         | cf AS (SELECT *, round(CASE WHEN precision + recall > 0 THEN
         |    CAST(2 AS DOUBLE) * precision * recall / (precision + recall)
         |    ELSE CAST(0 AS DOUBLE) END, 6) AS f1 FROM cls),
         | o AS (SELECT round(${Stats.Sql.dsum("f1")} / count(*), 6)
         |    AS macro_f1,
         |   round(CAST(sum(tp) AS DOUBLE) / CAST(sum(n_true) AS DOUBLE), 6)
         |    AS accuracy FROM cf)
         | SELECT label, CAST(n_true AS BIGINT) AS n_true,
         |  CAST(n_pred AS BIGINT) AS n_pred, CAST(tp AS BIGINT) AS tp,
         |  precision, recall, f1, macro_f1, accuracy
         | FROM cf CROSS JOIN o ORDER BY label""".stripMargin
        .replaceAll("\n", " ")
    },
    "q288_kneser_ney" -> {
      import graft.text.TextOps.{Sql => T}
      val split = graft.aug.Sampling.Sql.keyBucket("doc_id", 71L)
      s"""WITH t AS MATERIALIZED (SELECT doc_id, ${T.toks("text")} AS toks,
         |  ($split) < 900000 AS train FROM documents),
         | tp AS (SELECT doc_id, train, toks,
         |  unnest(generate_series(1, len(toks))) AS i FROM t),
         | tok AS MATERIALIZED (SELECT doc_id, train, i, (toks)[i] AS w
         |  FROM tp),
         | vocab AS MATERIALIZED (SELECT w FROM tok WHERE train
         |  GROUP BY w HAVING count(*) >= 2),
         | mapped AS MATERIALIZED (SELECT tok.doc_id, tok.train, tok.i,
         |  CASE WHEN vocab.w IS NOT NULL THEN tok.w ELSE '<unk>' END AS mw
         |  FROM tok LEFT JOIN vocab ON vocab.w = tok.w),
         | bg AS MATERIALIZED (SELECT a.doc_id, a.train, a.mw AS w1,
         |  b.mw AS w2 FROM mapped a JOIN mapped b
         |  ON b.doc_id = a.doc_id AND b.i = a.i + 1),
         | c12 AS MATERIALIZED (SELECT w1, w2, count(*) AS c12 FROM bg
         |  WHERE train GROUP BY w1, w2),
         | c1 AS (SELECT mw AS w1, count(*) AS c1 FROM mapped WHERE train
         |  GROUP BY mw),
         | fw AS (SELECT w1, count(*) AS n1fw FROM c12 GROUP BY w1),
         | bw AS (SELECT w2, count(*) AS n1bw FROM c12 GROUP BY w2),
         | tt AS (SELECT count(*) AS tbig FROM c12),
         | sc AS (SELECT g.doc_id, CAST(ln(
         |   CASE WHEN c1.c1 IS NOT NULL AND fw.n1fw IS NOT NULL THEN
         |    greatest(COALESCE(CAST(c12.c12 AS DOUBLE), 0.0) - 0.75, 0.0)
         |     / CAST(c1.c1 AS DOUBLE)
         |    + ((0.75 * CAST(fw.n1fw AS DOUBLE)) / CAST(c1.c1 AS DOUBLE))
         |     * (COALESCE(CAST(bw.n1bw AS DOUBLE) / CAST(tbig AS DOUBLE),
         |        0.5 / CAST(tbig AS DOUBLE)))
         |   ELSE COALESCE(CAST(bw.n1bw AS DOUBLE) / CAST(tbig AS DOUBLE),
         |    0.5 / CAST(tbig AS DOUBLE)) END) AS DECIMAL(38,18)) AS lp
         |  FROM bg g LEFT JOIN c12 ON c12.w1 = g.w1 AND c12.w2 = g.w2
         |  LEFT JOIN c1 ON c1.w1 = g.w1 LEFT JOIN fw ON fw.w1 = g.w1
         |  LEFT JOIN bw ON bw.w2 = g.w2 CROSS JOIN tt WHERE NOT g.train)
         | SELECT doc_id, count(*) AS n_bigrams,
         |  round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS avg_logp,
         |  round(exp(-round(CAST(sum(lp) AS DOUBLE) / count(*), 6)), 6)
         |   AS ppl
         | FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin
        .replaceAll("\n", " ")
    },
    "q289_good_turing" -> {
      import graft.text.TextOps.{Sql => T}
      val split = graft.aug.Sampling.Sql.keyBucket("doc_id", 73L)
      s"""WITH t0 AS (SELECT doc_id, ${T.toks("text")} AS toks,
         |  ($split) < 900000 AS train FROM documents),
         | tk AS MATERIALIZED (SELECT train,
         |  toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] AS w
         |  FROM t0, unnest(generate_series(0, len(toks) - 3)) AS u(i)
         |  WHERE len(toks) >= 3),
         | uni AS MATERIALIZED (SELECT w, count(*) AS c FROM tk WHERE train
         |  GROUP BY w),
         | fof AS MATERIALIZED (SELECT c, count(*) AS n_r FROM uni
         |  GROUP BY c),
         | tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_train_tokens FROM uni),
         | none AS (SELECT COALESCE(CAST(sum(CASE WHEN c = 1 THEN n_r END)
         |   AS BIGINT), 0) AS n1 FROM fof),
         | ov AS (SELECT CAST(count(*) AS BIGINT) AS n_test_tokens,
         |  CAST(count(*) FILTER (WHERE uni.w IS NULL) AS BIGINT) AS n_oov
         |  FROM tk LEFT JOIN uni ON uni.w = tk.w WHERE NOT tk.train),
         | rr AS (SELECT f.c AS r, CAST(f.n_r AS BIGINT) AS n_r,
         |  round((CAST(f.c AS DOUBLE) + 1.0) *
         |   COALESCE(CAST(g.n_r AS DOUBLE), 0.0) / CAST(f.n_r AS DOUBLE), 6)
         |   AS r_star
         |  FROM fof f LEFT JOIN fof g ON g.c = f.c + 1
         |  WHERE f.c BETWEEN 1 AND 5)
         | SELECT r, n_r, r_star, n_train_tokens,
         |  round(CAST(n1 AS DOUBLE) / CAST(n_train_tokens AS DOUBLE), 6)
         |   AS p0_pred,
         |  n_test_tokens, n_oov,
         |  round(CAST(n_oov AS DOUBLE) / CAST(n_test_tokens AS DOUBLE), 6)
         |   AS oov_rate
         | FROM rr CROSS JOIN tot CROSS JOIN none CROSS JOIN ov
         | ORDER BY r""".stripMargin.replaceAll("\n", " ")
    },
    "q290_link_prediction" -> {
      val split = graft.aug.Sampling.Sql.keyBucket(
        "((CAST(p1 AS BIGINT) * 1000003 + p2) % 1000000007)", 83L)
      s"""WITH kk AS (SELECT CAST(ceil(sqrt(count(DISTINCT l_orderkey)))
         |   AS BIGINT) * 6 AS k FROM lineitem),
         | ob AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok,
         |  CAST(l_partkey AS BIGINT) % k AS pk
         |  FROM lineitem CROSS JOIN kk),
         | co AS MATERIALIZED (SELECT p1, p2, ($split) < 200000 AS test
         |  FROM (SELECT a.pk AS p1, b.pk AS p2, count(*) AS npair
         |   FROM ob a JOIN ob b ON b.ok = a.ok AND a.pk < b.pk
         |   GROUP BY a.pk, b.pk) WHERE npair >= 2),
         | tre AS MATERIALIZED (SELECT p1, p2 FROM co WHERE NOT test),
         | adj AS MATERIALIZED (SELECT p1 AS a, p2 AS b FROM tre
         |  UNION ALL SELECT p2, p1 FROM tre),
         | deg AS MATERIALIZED (SELECT a, count(*) AS dg FROM adj
         |  GROUP BY a),
         | mids AS (SELECT e1.a AS x, e1.b AS m, e2.b AS y, deg.dg AS dgm
         |  FROM adj e1 JOIN adj e2 ON e2.a = e1.b AND e1.a < e2.b
         |  JOIN deg ON deg.a = e1.b),
         | ps AS (SELECT x, y, CAST(count(*) AS BIGINT) AS cn,
         |  round(${graft.core.Stats.Sql.dsum(
               "(1.0 / ln(CAST(dgm AS DOUBLE)))")}, 6) AS aa
         |  FROM mids GROUP BY x, y),
         | sc AS MATERIALIZED (SELECT ps.x, ps.y, ps.cn, ps.aa,
         |  CASE WHEN te.p1 IS NOT NULL THEN 1 ELSE 0 END AS pos,
         |  dx.dg AS dgx, dy.dg AS dgy,
         |  round(CAST(ps.cn AS DOUBLE) /
         |   CAST(dx.dg + dy.dg - ps.cn AS DOUBLE), 6) AS jac
         |  FROM ps LEFT JOIN tre ON tre.p1 = ps.x AND tre.p2 = ps.y
         |  LEFT JOIN (SELECT p1, p2 FROM co WHERE test) te
         |   ON te.p1 = ps.x AND te.p2 = ps.y
         |  JOIN deg dx ON dx.a = ps.x JOIN deg dy ON dy.a = ps.y
         |  WHERE tre.p1 IS NULL),
         | lng AS (SELECT 'cn' AS method, CAST(cn AS DOUBLE) AS score, pos
         |   FROM sc
         |  UNION ALL SELECT 'jaccard', jac, pos FROM sc
         |  UNION ALL SELECT 'adamic_adar', aa, pos FROM sc),
         | bys AS (SELECT method, score, CAST(sum(pos) AS BIGINT) AS np,
         |  CAST(sum(1 - pos) AS BIGINT) AS nn FROM lng
         |  GROUP BY method, score),
         | won AS (SELECT method, np, nn, COALESCE(CAST(sum(nn) OVER
         |   (PARTITION BY method ORDER BY score
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |   AS BIGINT), 0) AS cum_nn FROM bys),
         | ag AS (SELECT method, CAST(sum(np) AS BIGINT) AS n_pos,
         |  CAST(sum(nn) AS BIGINT) AS n_neg,
         |  CAST(sum(2 * np * cum_nn + np * nn) AS BIGINT) AS won2
         |  FROM won GROUP BY method),
         | ttl AS (SELECT CAST(count(*) AS BIGINT) AS n_test_total FROM co
         |  WHERE test)
         | SELECT method, n_pos, n_neg, n_test_total,
         |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
         |   round(CAST(won2 AS DOUBLE) /
         |    (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)), 6)
         |  END AS auc
         | FROM ag CROSS JOIN ttl ORDER BY method""".stripMargin
        .replaceAll("\n", " ")
    },
    "q291_hill_tail" -> {
      val bucket = graft.aug.Sampling.Sql.keyBucket("o_orderkey", 131L)
      s"""WITH h AS (SELECT 'healthy' AS scenario,
         |  CAST(o_totalprice AS DOUBLE) AS v FROM orders
         |  ORDER BY v DESC LIMIT 201),
         | i AS (SELECT 'pareto_injected' AS scenario,
         |  100.0 * exp(ln(1.0 / ((CAST(($bucket) AS DOUBLE) + 0.5)
         |   / 1000000.0)) / 2.5) AS v FROM orders
         |  ORDER BY v DESC LIMIT 201),
         | pool AS MATERIALIZED (SELECT * FROM h UNION ALL
         |  SELECT * FROM i),
         | rk AS MATERIALIZED (SELECT scenario, v, ln(v) AS lnv,
         |  row_number() OVER (PARTITION BY scenario ORDER BY v DESC)
         |   AS rk FROM pool),
         | ks AS (SELECT unnest([50, 100, 200]) AS k),
         | su AS (SELECT ks.k, rk.scenario,
         |  ${graft.core.Stats.Sql.dsum("lnv")} AS sum_ln
         |  FROM rk CROSS JOIN ks WHERE rk.rk <= ks.k
         |  GROUP BY ks.k, rk.scenario),
         | th AS (SELECT ks.k, rk.scenario, rk.lnv AS ln_thr, rk.v AS x_k1
         |  FROM rk JOIN ks ON rk.rk = ks.k + 1)
         | SELECT su.scenario, su.k, round(th.x_k1, 6) AS x_threshold,
         |  round(CAST(su.k AS DOUBLE) /
         |   (su.sum_ln - CAST(su.k AS DOUBLE) * th.ln_thr), 6)
         |   AS alpha_hat
         | FROM su JOIN th ON th.k = su.k AND th.scenario = su.scenario
         | ORDER BY su.scenario, su.k""".stripMargin.replaceAll("\n", " ")
    },
    "q292_mcnemar" -> {
      import graft.text.TextOps.{Sql => T}
      s"""WITH d AS (SELECT (lang = 'en') AS truth,
         |  (${T.langId("text")}) = 'en' AS pa,
         |  list_contains(${T.toks("text")}, 'the') AS pb FROM documents),
         | m AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(count(*) FILTER (WHERE pa = truth) AS BIGINT) AS ok_a,
         |  CAST(count(*) FILTER (WHERE pb = truth) AS BIGINT) AS ok_b,
         |  CAST(count(*) FILTER (WHERE pa = truth AND pb <> truth)
         |   AS BIGINT) AS b,
         |  CAST(count(*) FILTER (WHERE pa <> truth AND pb = truth)
         |   AS BIGINT) AS c FROM d)
         | SELECT n, round(CAST(ok_a AS DOUBLE) / CAST(n AS DOUBLE), 6)
         |   AS acc_a,
         |  round(CAST(ok_b AS DOUBLE) / CAST(n AS DOUBLE), 6) AS acc_b,
         |  b, c,
         |  round(CASE WHEN b + c > 0 THEN
         |   (greatest(CAST(abs(b - c) AS DOUBLE) - 1.0, 0.0) *
         |    greatest(CAST(abs(b - c) AS DOUBLE) - 1.0, 0.0))
         |    / CAST(b + c AS DOUBLE)
         |   ELSE 0.0 END, 6) AS mcnemar_chi2
         | FROM m""".stripMargin.replaceAll("\n", " ")
    },
    "q293_hits" -> {
      val iterCtes = (1 to 4).map { t =>
        s"""ar$t AS MATERIALIZED (SELECT auth, ${dsumSql("h")} AS ar
           | FROM e JOIN h${t - 1} USING (hub) GROUP BY auth),
           | an$t AS (SELECT ${dsumSql("ar * ar")} AS an2 FROM ar$t),
           | a$t AS MATERIALIZED (SELECT auth, ar / sqrt(an2) AS a
           | FROM ar$t CROSS JOIN an$t),
           | hr$t AS MATERIALIZED (SELECT hub, ${dsumSql("a")} AS hr
           | FROM e JOIN a$t USING (auth) GROUP BY hub),
           | hn$t AS (SELECT ${dsumSql("hr * hr")} AS hn2 FROM hr$t),
           | h$t AS MATERIALIZED (SELECT hub, hr / sqrt(hn2) AS h
           | FROM hr$t CROSS JOIN hn$t)""".stripMargin
      }
      s"""WITH e AS MATERIALIZED (SELECT DISTINCT
         |  CAST(l_suppkey AS BIGINT) AS hub,
         |  CAST(l_partkey AS BIGINT) AS auth FROM lineitem),
         | nh AS (SELECT CAST(count(DISTINCT hub) AS DOUBLE) AS n FROM e),
         | h0 AS (SELECT DISTINCT hub, CAST(1.0 AS DOUBLE) / sqrt(n) AS h
         |  FROM e CROSS JOIN nh),
         | ${iterCtes.mkString(", ")}
         | SELECT side, node, score FROM (
         |  (SELECT 'authority' AS side, auth AS node, round(a, 6) AS score
         |   FROM a4 ORDER BY round(a, 6) DESC, auth LIMIT 10)
         |  UNION ALL
         |  (SELECT 'hub', hub, round(h, 6) FROM h4
         |   ORDER BY round(h, 6) DESC, hub LIMIT 10))
         | ORDER BY side, score DESC, node""".stripMargin
        .replaceAll("\n", " ")
    },
    "q294_bloom_fpr" -> {
      val split = graft.aug.Sampling.Sql.keyBucket("o_orderkey", 11L)
      s"""WITH o AS (SELECT CAST(o_orderkey AS BIGINT) AS key,
         |  ($split) < 900000 AS train FROM orders),
         | mr AS (SELECT CAST(count(*) AS BIGINT) AS n_train,
         |  CAST(count(*) AS BIGINT) * 8 AS m FROM o WHERE train),
         | pos AS (SELECT key, train, m,
         |  ((((key * 2654435761 + 40503) % 1000000007) + 1000000007)
         |    % 1000000007
         |   + i * (((((key * 40503 + 2654435761) % 1000000007)
         |    + 1000000007) % 1000000007) + 1)) % m AS pos
         |  FROM o CROSS JOIN mr, unnest(generate_series(0, 4)) AS u(i)),
         | bits AS MATERIALIZED (SELECT DISTINCT pos FROM pos
         |  WHERE train),
         | probe AS (SELECT p.key, count(b.pos) = 5 AS fp
         |  FROM pos p LEFT JOIN bits b ON b.pos = p.pos
         |  WHERE NOT p.train GROUP BY p.key),
         | ag AS (SELECT CAST(count(*) AS BIGINT) AS n_test,
         |  CAST(count(*) FILTER (WHERE fp) AS BIGINT) AS fp_count
         |  FROM probe)
         | SELECT n_train, n_test, m AS m_bits, 5 AS k_hashes, fp_count,
         |  round(CAST(fp_count AS DOUBLE) / CAST(n_test AS DOUBLE), 6)
         |   AS fpr_measured,
         |  round(pow(1.0 - exp(-5.0 * CAST(n_train AS DOUBLE) /
         |   CAST(m AS DOUBLE)), 5.0), 6) AS fpr_theory
         | FROM ag CROSS JOIN mr""".stripMargin.replaceAll("\n", " ")
    },
    "q295_heaps" -> {
      import graft.text.TextOps.{Sql => T}
      s"""WITH t0 AS (SELECT doc_id, ${T.toks("text")} AS toks
         |  FROM documents),
         | t AS MATERIALIZED (SELECT doc_id,
         |  toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] AS w
         |  FROM t0, unnest(generate_series(0, len(toks) - 3)) AS u(i)
         |  WHERE len(toks) >= 3),
         | nd AS (SELECT count(*) AS nd FROM documents),
         | cp AS (SELECT i AS d, CAST(floor(CAST(nd * i AS DOUBLE) / 10)
         |   AS BIGINT) AS cut
         |  FROM nd, unnest(generate_series(1, 10)) AS u(i)),
         | fst AS MATERIALIZED (SELECT w, min(doc_id) AS fd FROM t
         |  GROUP BY w),
         | vd AS (SELECT d, cut, CAST(count(*) AS BIGINT) AS v_types
         |  FROM fst JOIN cp ON fst.fd < cp.cut GROUP BY d, cut),
         | tc AS (SELECT doc_id, count(*) AS c FROM t GROUP BY doc_id),
         | ntok AS (SELECT d AS d2, CAST(sum(c) AS BIGINT) AS n_tokens
         |  FROM tc JOIN cp ON tc.doc_id < cp.cut GROUP BY d),
         | pts AS MATERIALIZED (SELECT d, cut, n_tokens, v_types,
         |  ln(CAST(n_tokens AS DOUBLE)) AS x,
         |  ln(CAST(v_types AS DOUBLE)) AS y
         |  FROM vd JOIN ntok ON vd.d = ntok.d2),
         | ft AS (SELECT (${dsumSql("x * y")} - ${dsumSql("x")} *
         |   ${dsumSql("y")} / CAST(count(*) AS DOUBLE)) /
         |  (${dsumSql("x * x")} - ${dsumSql("x")} * ${dsumSql("x")} /
         |   CAST(count(*) AS DOUBLE)) AS beta_raw,
         |  ${dsumSql("x")} AS sx, ${dsumSql("y")} AS sy,
         |  CAST(count(*) AS DOUBLE) AS n FROM pts),
         | fit AS (SELECT round(beta_raw, 6) AS heaps_beta,
         |  round(exp(sy / n - beta_raw * sx / n), 6) AS heaps_k FROM ft)
         | SELECT CAST(d AS INT) AS decile, cut, n_tokens, v_types,
         |  heaps_beta, heaps_k
         | FROM pts CROSS JOIN fit ORDER BY decile""".stripMargin
        .replaceAll("\n", " ")
    },
    "q296_textrank" -> {
      import graft.text.TextOps.{Sql => T}
      val d = "CAST(0.85 AS DOUBLE)"
      val iterCtes = (1 to 10).map { t =>
        s"""r$t AS MATERIALIZED (SELECT n.node,
           | (CAST(1.0 AS DOUBLE) - $d) / nn +
           | $d * coalesce(c.s, CAST(0.0 AS DOUBLE)) AS r
           | FROM nodes n CROSS JOIN nc LEFT JOIN (SELECT e.dst AS cnode,
           |  ${dsumSql("r.r * CAST(e.w AS DOUBLE) / CAST(e.outw AS DOUBLE)")}
           |  AS s FROM e JOIN r${t - 1} r ON e.src = r.node
           |  GROUP BY e.dst) c ON n.node = c.cnode)""".stripMargin
      }
      s"""WITH t0 AS (SELECT doc_id, ${T.toks("text")} AS toks
         |  FROM documents),
         | tok AS MATERIALIZED (SELECT doc_id, i, (toks)[i] AS w
         |  FROM t0, unnest(generate_series(1, len(toks))) AS u(i)),
         | pr AS (SELECT a.w AS wa, b.w AS wb FROM tok a JOIN tok b
         |   ON b.doc_id = a.doc_id AND b.i = a.i + 1
         |  UNION ALL SELECT a.w, b.w FROM tok a JOIN tok b
         |   ON b.doc_id = a.doc_id AND b.i = a.i + 2),
         | cnt AS MATERIALIZED (SELECT least(wa, wb) AS a,
         |  greatest(wa, wb) AS b, count(*) AS w FROM pr
         |  WHERE wa <> wb GROUP BY least(wa, wb), greatest(wa, wb)),
         | base AS (SELECT a AS src, b AS dst, w FROM cnt
         |  UNION ALL SELECT b, a, w FROM cnt),
         | ow AS (SELECT src, sum(w) AS outw FROM base GROUP BY src),
         | e AS MATERIALIZED (SELECT base.src, base.dst, base.w, ow.outw
         |  FROM base JOIN ow ON base.src = ow.src),
         | nodes AS (SELECT src AS node FROM base UNION SELECT dst
         |  FROM base),
         | nc AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM nodes),
         | r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn AS r
         |  FROM nodes CROSS JOIN nc),
         | ${iterCtes.mkString(", ")}
         | SELECT node AS word, round(r, 6) AS textrank FROM r10
         | ORDER BY textrank DESC, word""".stripMargin
        .replaceAll("\n", " ")
    },
    "q297_durbin_watson" -> {
      s"""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
         |  ${dsumSql("value")} AS y FROM events GROUP BY day),
         | m0 AS (SELECT min(day) AS d0 FROM daily),
         | pts AS MATERIALIZED (SELECT day,
         |  CAST(day - d0 AS DOUBLE) AS x, y FROM daily CROSS JOIN m0),
         | ft AS (SELECT (${dsumSql("x * y")} - ${dsumSql("x")} *
         |   ${dsumSql("y")} / CAST(count(*) AS DOUBLE)) /
         |  (${dsumSql("x * x")} - ${dsumSql("x")} * ${dsumSql("x")} /
         |   CAST(count(*) AS DOUBLE)) AS b,
         |  ${dsumSql("x")} AS sx, ${dsumSql("y")} AS sy,
         |  CAST(count(*) AS DOUBLE) AS nn FROM pts),
         | fit AS (SELECT b, (sy - b * sx) / nn AS a, nn FROM ft),
         | e6 AS MATERIALIZED (SELECT day, nn,
         |  CAST(round(round(y - a - b * x, 6) * 1e6) AS HUGEINT) AS e6
         |  FROM pts CROSS JOIN fit),
         | dd AS (SELECT nn, e6,
         |  lag(e6) OVER (ORDER BY day) AS p6 FROM e6),
         | ag AS (SELECT max(nn) AS n_days,
         |  sum(CASE WHEN p6 IS NOT NULL
         |   THEN (e6 - p6) * (e6 - p6) END) AS num,
         |  sum(e6 * e6) AS den FROM dd)
         | SELECT CAST(n_days AS BIGINT) AS n_days,
         |  round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS dw,
         |  round(1.0 - CAST(num AS DOUBLE) / CAST(den AS DOUBLE) / 2.0, 6)
         |   AS rho_hat
         | FROM ag""".stripMargin.replaceAll("\n", " ")
    },
    "q298_source_js" -> {
      import graft.text.TextOps.{Sql => T}
      s"""WITH cnt AS MATERIALIZED (SELECT source, w, count(*) AS c
         |  FROM (SELECT source, unnest(${T.toks("text")}) AS w
         |   FROM documents) GROUP BY source, w),
         | vocab AS (SELECT DISTINCT w FROM cnt),
         | tot AS (SELECT source, sum(c) AS n FROM cnt GROUP BY source),
         | vs AS (SELECT count(*) AS v FROM vocab),
         | grid AS MATERIALIZED (SELECT t.source, vo.w,
         |  (COALESCE(CAST(c.c AS DOUBLE), 0.0) + 0.5) /
         |  (CAST(t.n AS DOUBLE) + 0.5 * CAST(vs.v AS DOUBLE)) AS p
         |  FROM tot t CROSS JOIN vocab vo CROSS JOIN vs
         |  LEFT JOIN cnt c ON c.source = t.source AND c.w = vo.w),
         | pr AS (SELECT g1.source AS s1, g2.source AS s2,
         |  g1.p * ln(g1.p / ((g1.p + g2.p) / 2)) +
         |  g2.p * ln(g2.p / ((g1.p + g2.p) / 2)) AS t
         |  FROM grid g1 JOIN grid g2
         |   ON g1.w = g2.w AND g1.source < g2.source)
         | SELECT s1, s2, round(${dsumSql("t")} * 0.5, 6) AS js_divergence
         | FROM pr GROUP BY s1, s2 ORDER BY s1, s2""".stripMargin
        .replaceAll("\n", " ")
    },
    "q299_mmr" -> {
      import graft.sim.VectorMath.{Sql => V}
      val rounds = (2 to 5).map { r =>
        s"""ms$r AS (SELECT p.qid, p.pa AS cid, max(p.sim) AS msim
           | FROM pairs p JOIN sel${r - 1} s
           |  ON s.qid = p.qid AND s.cid = p.pb GROUP BY p.qid, p.pa),
           | pick$r AS MATERIALIZED (SELECT qid, cid, $r AS pick, score
           | FROM (SELECT c.qid, c.cid,
           |   0.7 * c.rel - 0.3 * m.msim AS score,
           |   row_number() OVER (PARTITION BY c.qid
           |    ORDER BY (0.7 * c.rel - 0.3 * m.msim) DESC, c.cid) AS rk
           |  FROM cand c JOIN ms$r m ON m.qid = c.qid AND m.cid = c.cid
           |  LEFT JOIN sel${r - 1} s ON s.qid = c.qid AND s.cid = c.cid
           |  WHERE s.cid IS NULL) WHERE rk = 1),
           | sel$r AS MATERIALIZED (SELECT * FROM sel${r - 1}
           | UNION ALL SELECT * FROM pick$r)""".stripMargin
      }
      s"""WITH v AS MATERIALIZED (SELECT vec_id AS id, embedding AS vec,
         |  ${V.norm2("embedding")} AS n2 FROM embeddings),
         | q AS (SELECT id AS qid, vec AS qv, n2 AS qn2 FROM v
         |  WHERE id < 20),
         | rel0 AS (SELECT q.qid, c.id AS cid,
         |  ${V.dot("q.qv", "c.vec")} / (sqrt(q.qn2) * sqrt(c.n2)) AS rel
         |  FROM v c JOIN q ON q.qid <> c.id),
         | cand AS MATERIALIZED (SELECT qid, cid, rel FROM
         |  (SELECT qid, cid, rel, row_number() OVER (PARTITION BY qid
         |    ORDER BY rel DESC, cid) AS rk FROM rel0) WHERE rk <= 20),
         | pairs AS MATERIALIZED (SELECT a.qid, a.cid AS pa, b.cid AS pb,
         |  ${V.dot("va.vec", "vb.vec")} / (sqrt(va.n2) * sqrt(vb.n2))
         |   AS sim
         |  FROM cand a JOIN cand b ON b.qid = a.qid AND b.cid <> a.cid
         |  JOIN v va ON va.id = a.cid JOIN v vb ON vb.id = b.cid),
         | sel1 AS MATERIALIZED (SELECT qid, cid, 1 AS pick, rel AS score
         |  FROM (SELECT qid, cid, rel, row_number() OVER
         |   (PARTITION BY qid ORDER BY rel DESC, cid) AS rk FROM cand)
         |  WHERE rk = 1),
         | ${rounds.mkString(", ")}
         | SELECT qid, pick, cid, round(score, 6) AS score FROM sel5
         | ORDER BY qid, pick""".stripMargin.replaceAll("\n", " ")
    },
    "q300_ljung_box" -> {
      s"""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
         |  ${dsumSql("value")} AS y FROM events GROUP BY day),
         | m0 AS (SELECT min(day) AS d0 FROM daily),
         | pts AS MATERIALIZED (SELECT day,
         |  CAST(day - d0 AS DOUBLE) AS x, y FROM daily CROSS JOIN m0),
         | ft AS (SELECT (${dsumSql("x * y")} - ${dsumSql("x")} *
         |   ${dsumSql("y")} / CAST(count(*) AS DOUBLE)) /
         |  (${dsumSql("x * x")} - ${dsumSql("x")} * ${dsumSql("x")} /
         |   CAST(count(*) AS DOUBLE)) AS b,
         |  ${dsumSql("x")} AS sx, ${dsumSql("y")} AS sy,
         |  CAST(count(*) AS DOUBLE) AS nn FROM pts),
         | fit AS (SELECT b, (sy - b * sx) / nn AS a, nn FROM ft),
         | e6 AS MATERIALIZED (SELECT day, nn,
         |  CAST(round(round(y - a - b * x, 6) * 1e6) AS HUGEINT) AS e6
         |  FROM pts CROSS JOIN fit),
         | den AS (SELECT sum(e6 * e6) AS den, max(nn) AS n FROM e6),
         | ks AS (SELECT unnest(generate_series(1, 10)) AS k),
         | pr AS (SELECT ks.k, sum(a.e6 * b.e6) AS num
         |  FROM e6 a CROSS JOIN ks JOIN e6 b ON b.day = a.day + ks.k
         |  GROUP BY ks.k),
         | rho AS MATERIALIZED (SELECT k, n,
         |  CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS rho_raw
         |  FROM pr CROSS JOIN den),
         | qs AS (SELECT max(n) AS n2, ${dsumSql(
             "rho_raw * rho_raw / (n - CAST(k AS DOUBLE))")} AS srho
         |  FROM rho),
         | qstat AS (SELECT round(n2 * (n2 + 2.0) * srho, 6) AS q_stat,
         |  10 AS df FROM qs)
         | SELECT CAST(k AS INT) AS lag, round(rho_raw, 6) AS rho,
         |  q_stat, df
         | FROM rho CROSS JOIN qstat ORDER BY lag""".stripMargin
        .replaceAll("\n", " ")
    },
    "q301_gmm_em" -> {
      val split = graft.aug.Sampling.Sql.keyBucket("event_id", 17L)
      val xd = "CAST(xc AS DOUBLE) / 100.0"
      def phi(mu: String, sd: String) =
        s"exp(-0.5 * (($xd - $mu) / $sd) * (($xd - $mu) / $sd)) / " +
          s"($sd * sqrt(2 * pi()))"
      val iters = (1 to 6).map { t =>
        val g1 = s"(p1 * ${phi("mu1", "s1")})"
        val g2 = s"((1.0 - p1) * ${phi("mu2", "s2")})"
        s"""resp$t AS MATERIALIZED (SELECT x.scenario, x.xc,
           | CAST(round($g1 / ($g1 + $g2) * 1e6) AS HUGEINT) AS r1
           | FROM x JOIN p${t - 1} USING (scenario)),
           | ms$t AS MATERIALIZED (SELECT scenario,
           |  sum(r1) AS sr1, sum(r1 * xc) AS srx1,
           |  sum(r1 * xc * xc) AS srxx1,
           |  sum(1000000 - r1) AS sr2, sum((1000000 - r1) * xc) AS srx2,
           |  sum((1000000 - r1) * xc * xc) AS srxx2,
           |  CAST(count(*) AS DOUBLE) AS n
           | FROM resp$t GROUP BY scenario),
           | p$t AS MATERIALIZED (SELECT scenario,
           |  CAST(srx1 AS DOUBLE) / CAST(sr1 AS DOUBLE) / 100.0 AS mu1,
           |  CAST(srx2 AS DOUBLE) / CAST(sr2 AS DOUBLE) / 100.0 AS mu2,
           |  sqrt(greatest(CAST(srxx1 AS DOUBLE) / CAST(sr1 AS DOUBLE)
           |    / 10000.0 -
           |   (CAST(srx1 AS DOUBLE) / CAST(sr1 AS DOUBLE) / 100.0) *
           |   (CAST(srx1 AS DOUBLE) / CAST(sr1 AS DOUBLE) / 100.0),
           |   0.000001)) AS s1,
           |  sqrt(greatest(CAST(srxx2 AS DOUBLE) / CAST(sr2 AS DOUBLE)
           |    / 10000.0 -
           |   (CAST(srx2 AS DOUBLE) / CAST(sr2 AS DOUBLE) / 100.0) *
           |   (CAST(srx2 AS DOUBLE) / CAST(sr2 AS DOUBLE) / 100.0),
           |   0.000001)) AS s2,
           |  CAST(sr1 AS DOUBLE) / 1e6 / n AS p1
           | FROM ms$t)""".stripMargin
      }
      s"""WITH x AS MATERIALIZED (
         | SELECT 'healthy' AS scenario,
         |  CAST(round(value * 100) AS HUGEINT) AS xc FROM events
         | UNION ALL
         | SELECT 'bimodal_injected',
         |  CAST(round(value * 100) + (CASE WHEN ($split) < 500000
         |   THEN 40000 ELSE 0 END) AS HUGEINT) FROM events),
         | p0 AS MATERIALIZED (SELECT scenario,
         |  CAST(min(xc) AS DOUBLE) / 100.0 +
         |   (CAST(max(xc) AS DOUBLE) - CAST(min(xc) AS DOUBLE))
         |    / 100.0 / 4.0 AS mu1,
         |  CAST(min(xc) AS DOUBLE) / 100.0 +
         |   (CAST(max(xc) AS DOUBLE) - CAST(min(xc) AS DOUBLE))
         |    / 100.0 * 3.0 / 4.0 AS mu2,
         |  sqrt(greatest(${dsumSql(s"($xd) * ($xd)")} /
         |    CAST(count(*) AS DOUBLE) -
         |   (${dsumSql(xd)} / CAST(count(*) AS DOUBLE)) *
         |   (${dsumSql(xd)} / CAST(count(*) AS DOUBLE)), 0.000001)) AS s1,
         |  sqrt(greatest(${dsumSql(s"($xd) * ($xd)")} /
         |    CAST(count(*) AS DOUBLE) -
         |   (${dsumSql(xd)} / CAST(count(*) AS DOUBLE)) *
         |   (${dsumSql(xd)} / CAST(count(*) AS DOUBLE)), 0.000001)) AS s2,
         |  CAST(0.5 AS DOUBLE) AS p1
         | FROM x GROUP BY scenario),
         | ${iters.mkString(", ")}
         | SELECT scenario, round(p1, 6) AS pi1, round(mu1, 6) AS mu1,
         |  round(s1, 6) AS sigma1, round(mu2, 6) AS mu2,
         |  round(s2, 6) AS sigma2, round(mu2 - mu1, 6) AS mean_gap
         | FROM p6 ORDER BY scenario""".stripMargin.replaceAll("\n", " ")
    },
    "q302_friedman" -> {
      s"""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
         |  event_type, ${dsumSql("value")} AS y FROM events
         |  GROUP BY day, event_type),
         | ranked AS (SELECT event_type, row_number() OVER
         |  (PARTITION BY day ORDER BY y DESC, event_type) AS rk
         |  FROM daily),
         | rj AS MATERIALIZED (SELECT event_type,
         |  CAST(sum(rk) AS BIGINT) AS r_sum,
         |  CAST(count(*) AS BIGINT) AS n_days FROM ranked
         |  GROUP BY event_type),
         | tot AS (SELECT CAST(sum(r_sum * r_sum) AS BIGINT) AS ssr,
         |  max(n_days) AS n, CAST(count(*) AS BIGINT) AS k FROM rj),
         | f AS (SELECT round(12.0 / (CAST(n AS DOUBLE) *
         |   CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0)) *
         |   CAST(ssr AS DOUBLE) - 3.0 * CAST(n AS DOUBLE) *
         |   (CAST(k AS DOUBLE) + 1.0), 6) AS friedman_chi2,
         |  CAST(k - 1 AS INT) AS df FROM tot)
         | SELECT event_type, r_sum,
         |  round(CAST(r_sum AS DOUBLE) / CAST(n_days AS DOUBLE), 6)
         |   AS mean_rank, friedman_chi2, df
         | FROM rj CROSS JOIN f ORDER BY event_type""".stripMargin
        .replaceAll("\n", " ")
    },
    "q303_binseg" -> {
      s"""WITH daily0 AS (SELECT epoch_us(ts) // 86400000000 AS day,
         |  sum(CAST(round(value * 100) AS HUGEINT)) AS xc FROM events
         |  GROUP BY day),
         | m0 AS (SELECT min(day) AS d0 FROM daily0),
         | daily AS (SELECT day - d0 AS t, xc FROM daily0 CROSS JOIN m0),
         | series AS MATERIALIZED (
         |  SELECT 'healthy' AS scenario, t, xc FROM daily
         |  UNION ALL
         |  SELECT 'shift_injected', t,
         |   xc + (CASE WHEN t >= 20 THEN 500000 ELSE 0 END) FROM daily),
         | pre AS (SELECT scenario, t,
         |  sum(xc) OVER (PARTITION BY scenario ORDER BY t
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cx,
         |  count(*) OVER (PARTITION BY scenario ORDER BY t
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ct
         |  FROM series),
         | tot AS (SELECT scenario, sum(xc) AS tx,
         |  CAST(count(*) AS BIGINT) AS tn, sum(xc * xc) AS txx
         |  FROM series GROUP BY scenario),
         | g AS MATERIALIZED (SELECT pre.scenario, pre.t,
         |  CAST(cx * cx AS DOUBLE) / CAST(ct AS DOUBLE) +
         |   CAST((tx - cx) * (tx - cx) AS DOUBLE) /
         |   CAST(tn - ct AS DOUBLE) AS gg,
         |  CAST(txx AS DOUBLE) - CAST(tx * tx AS DOUBLE) /
         |   CAST(tn AS DOUBLE) AS sse_tot,
         |  CAST(tx * tx AS DOUBLE) / CAST(tn AS DOUBLE) AS gm
         |  FROM pre JOIN tot ON tot.scenario = pre.scenario
         |  WHERE ct >= 2 AND tn - ct >= 2)
         | SELECT scenario, t + 1 AS split_day,
         |  round((gg - gm) / sse_tot, 6) AS var_explained
         | FROM (SELECT scenario, t, gg, gm, sse_tot, row_number() OVER
         |  (PARTITION BY scenario ORDER BY gg DESC, t) AS rk FROM g)
         | WHERE rk = 1 ORDER BY scenario""".stripMargin
        .replaceAll("\n", " ")
    },
    "q304_chow" -> {
      s"""WITH daily0 AS (SELECT epoch_us(ts) // 86400000000 AS day,
         |  sum(CAST(round(value * 100) AS HUGEINT)) AS yc FROM events
         |  GROUP BY day),
         | m0 AS (SELECT min(day) AS d0 FROM daily0),
         | daily AS (SELECT day - d0 AS t, yc FROM daily0 CROSS JOIN m0),
         | series AS MATERIALIZED (
         |  SELECT 'healthy' AS scenario, t, yc,
         |   CASE WHEN t < 15 THEN 1 ELSE 2 END AS seg FROM daily
         |  UNION ALL
         |  SELECT 'slope_injected', t,
         |   yc + (CASE WHEN t >= 15 THEN (t - 14) * 200000 ELSE 0 END),
         |   CASE WHEN t < 15 THEN 1 ELSE 2 END FROM daily),
         | mo AS (SELECT scenario, grp,
         |  CAST(count(*) AS HUGEINT) AS n,
         |  sum(CAST(t AS HUGEINT)) AS sx, sum(yc) AS sy,
         |  sum(CAST(t AS HUGEINT) * CAST(t AS HUGEINT)) AS sxx,
         |  sum(CAST(t AS HUGEINT) * yc) AS sxy,
         |  sum(yc * yc) AS syy
         |  FROM (SELECT scenario, t, yc, 0 AS grp FROM series
         |   UNION ALL SELECT scenario, t, yc, seg FROM series)
         |  GROUP BY scenario, grp),
         | ss AS MATERIALIZED (SELECT scenario, grp, n,
         |  (CAST(n * syy - sy * sy AS DOUBLE) / CAST(n AS DOUBLE)) -
         |  (CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n AS DOUBLE)) *
         |  (CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n AS DOUBLE)) /
         |  (CAST(n * sxx - sx * sx AS DOUBLE) / CAST(n AS DOUBLE)) AS sse
         |  FROM mo),
         | pooled AS (SELECT scenario, sse AS sse_p,
         |  CAST(n AS DOUBLE) AS nn FROM ss WHERE grp = 0),
         | segs AS (SELECT scenario, ${dsumSql("sse")} AS sse_12 FROM ss
         |  WHERE grp <> 0 GROUP BY scenario)
         | SELECT p.scenario, CAST(nn AS BIGINT) AS n_days,
         |  round(((sse_p - sse_12) / 2.0) / (sse_12 / (nn - 4.0)), 6)
         |   AS f_chow
         | FROM pooled p JOIN segs s ON s.scenario = p.scenario
         | ORDER BY p.scenario""".stripMargin.replaceAll("\n", " ")
    },
    "q305_containment" -> {
      import graft.text.TextOps.{Sql => T}
      s"""WITH t0 AS (SELECT doc_id, ${T.toks("text")} AS toks
         |  FROM documents),
         | sh AS MATERIALIZED (SELECT DISTINCT doc_id,
         |  toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] AS w
         |  FROM t0, unnest(generate_series(0, len(toks) - 3)) AS u(i)
         |  WHERE len(toks) >= 3),
         | sz AS (SELECT doc_id, count(*) AS s FROM sh GROUP BY doc_id),
         | cap AS MATERIALIZED (SELECT w FROM sh GROUP BY w
         |  HAVING count(*) <= 50),
         | it AS (SELECT a.doc_id AS a, b.doc_id AS b,
         |  CAST(count(*) AS BIGINT) AS inter
         |  FROM sh a JOIN cap ON cap.w = a.w
         |  JOIN sh b ON b.w = a.w AND b.doc_id <> a.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         | SELECT a, b, inter, CAST(sa.s AS BIGINT) AS sza,
         |  CAST(sb.s AS BIGINT) AS szb,
         |  round(CAST(inter AS DOUBLE) / CAST(sa.s AS DOUBLE), 6)
         |   AS containment,
         |  round(CAST(inter AS DOUBLE) /
         |   CAST(sa.s + sb.s - inter AS DOUBLE), 6) AS jaccard
         | FROM it JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
         | WHERE round(CAST(inter AS DOUBLE) / CAST(sa.s AS DOUBLE), 6)
         |  >= 0.5
         | ORDER BY containment DESC, a, b LIMIT 20""".stripMargin
        .replaceAll("\n", " ")
    },
    "q306_capture_recapture" -> {
      import graft.text.TextOps.{Sql => T}
      val split = graft.aug.Sampling.Sql.keyBucket("doc_id", 29L)
      s"""WITH t0 AS (SELECT doc_id, ${T.toks("text")} AS toks
         |  FROM documents),
         | tri AS (SELECT doc_id,
         |  toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] AS w
         |  FROM t0, unnest(generate_series(0, len(toks) - 3)) AS u(i)
         |  WHERE len(toks) >= 3),
         | mk AS MATERIALIZED (SELECT w,
         |  max(CASE WHEN ($split) < 500000 THEN 1 ELSE 0 END) AS ca,
         |  max(CASE WHEN ($split) < 500000 THEN 0 ELSE 1 END) AS cb
         |  FROM tri GROUP BY w),
         | ag AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
         |  CAST(sum(cb) AS BIGINT) AS n_b,
         |  CAST(sum(ca * cb) AS BIGINT) AS m_both,
         |  CAST(count(*) AS BIGINT) AS n_true FROM mk)
         | SELECT n_a, n_b, m_both, n_true,
         |  round(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) /
         |   CAST(m_both AS DOUBLE), 2) AS n_hat,
         |  round((CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) /
         |   CAST(m_both AS DOUBLE) - CAST(n_true AS DOUBLE)) /
         |   CAST(n_true AS DOUBLE), 6) AS rel_err
         | FROM ag""".stripMargin.replaceAll("\n", " ")
    },
    "q307_cochran_q" -> {
      import graft.text.TextOps.{Sql => T}
      s"""WITH d AS (SELECT (lang = 'en') AS truth,
         |  (${T.langId("text")}) = 'en' AS pa,
         |  list_contains(${T.toks("text")}, 'the') AS pb,
         |  list_contains(${T.toks("text")}, 'and') AS pc
         |  FROM documents),
         | r AS (SELECT CASE WHEN pa = truth THEN 1 ELSE 0 END AS xa,
         |  CASE WHEN pb = truth THEN 1 ELSE 0 END AS xb,
         |  CASE WHEN pc = truth THEN 1 ELSE 0 END AS xc FROM d),
         | ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(xa) AS BIGINT) AS ca, CAST(sum(xb) AS BIGINT) AS cb,
         |  CAST(sum(xc) AS BIGINT) AS cc,
         |  CAST(sum(xa + xb + xc) AS BIGINT) AS sr,
         |  CAST(sum((xa + xb + xc) * (xa + xb + xc)) AS BIGINT) AS srr
         |  FROM r)
         | SELECT n, ca, cb, cc,
         |  round(2.0 * (3.0 * CAST(ca * ca + cb * cb + cc * cc AS DOUBLE)
         |   - CAST((ca + cb + cc) * (ca + cb + cc) AS DOUBLE)) /
         |   (3.0 * CAST(sr AS DOUBLE) - CAST(srr AS DOUBLE)), 6)
         |   AS cochran_q, 2 AS df
         | FROM ag""".stripMargin.replaceAll("\n", " ")
    },
    "q308_page_trend" -> {
      s"""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
         |  event_type, ${dsumSql("value")} AS y FROM events
         |  GROUP BY day, event_type),
         | ranked AS (SELECT event_type, row_number() OVER
         |  (PARTITION BY day ORDER BY y DESC, event_type) AS rk
         |  FROM daily),
         | rj AS MATERIALIZED (SELECT event_type,
         |  CAST(sum(rk) AS BIGINT) AS r_sum,
         |  CAST(count(*) AS BIGINT) AS n_days,
         |  row_number() OVER (ORDER BY event_type) AS j
         |  FROM ranked GROUP BY event_type),
         | tot AS (SELECT CAST(sum(j * r_sum) AS BIGINT) AS page_l,
         |  max(n_days) AS n, CAST(count(*) AS BIGINT) AS k FROM rj),
         | st AS (SELECT page_l,
         |  CAST(n AS DOUBLE) * CAST(k AS DOUBLE) *
         |   CAST(k + 1 AS DOUBLE) * CAST(k + 1 AS DOUBLE) / 4.0 AS mu_l,
         |  sqrt(CAST(n AS DOUBLE) * CAST(k AS DOUBLE) *
         |   CAST(k AS DOUBLE) * CAST(k + 1 AS DOUBLE) *
         |   CAST(k * k - 1 AS DOUBLE) / 144.0) AS sd_l FROM tot)
         | SELECT event_type, CAST(j AS BIGINT) AS j, r_sum, page_l,
         |  round((CAST(page_l AS DOUBLE) - mu_l) / sd_l, 6) AS z
         | FROM rj CROSS JOIN st ORDER BY j""".stripMargin
        .replaceAll("\n", " ")
    },
    "q309_entropy_rate" -> {
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
         |  event_type FROM events),
         | pr AS (SELECT event_type AS cur, lead(event_type) OVER
         |  (PARTITION BY user_id ORDER BY us, event_id) AS next FROM e),
         | cells AS MATERIALIZED (SELECT cur, next, count(*) AS n
         |  FROM pr WHERE next IS NOT NULL GROUP BY cur, next),
         | ct AS (SELECT cur, sum(n) AS nc FROM cells GROUP BY cur),
         | nt AS (SELECT next, sum(n) AS nx FROM cells GROUP BY next),
         | tt AS (SELECT CAST(sum(n) AS BIGINT) AS ntr FROM cells),
         | hc AS (SELECT ${dsumSql(
           "(CAST(n AS DOUBLE) / CAST(ntr AS DOUBLE)) * " +
             "(0.0 - ln(CAST(n AS DOUBLE) / CAST(nc AS DOUBLE)))")}
         |   AS h_cond
         |  FROM cells JOIN ct USING (cur) CROSS JOIN tt),
         | hm AS (SELECT ${dsumSql(
           "(CAST(nx AS DOUBLE) / CAST(ntr AS DOUBLE)) * " +
             "(0.0 - ln(CAST(nx AS DOUBLE) / CAST(ntr AS DOUBLE)))")}
         |   AS h_marg
         |  FROM nt CROSS JOIN tt)
         | SELECT ntr AS n_transitions, round(h_cond, 6) AS entropy_rate,
         |  round(h_marg, 6) AS entropy_marginal,
         |  round(h_marg - h_cond, 6) AS memory_gain
         | FROM hc CROSS JOIN hm CROSS JOIN tt""".stripMargin
        .replaceAll("\n", " ")
    },
    "q310_seq_patterns" -> {
      s"""WITH spans AS MATERIALIZED (SELECT user_id, event_type,
         |  min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx FROM events
         |  GROUP BY user_id, event_type),
         | u AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu
         |  FROM spans),
         | pats AS (SELECT a.event_type AS antecedent,
         |  b.event_type AS consequent,
         |  CAST(count(*) FILTER (WHERE a.mn < b.mn) AS BIGINT) AS n_seq
         |  FROM spans a JOIN spans b ON b.user_id = a.user_id
         |   AND b.event_type <> a.event_type
         |  GROUP BY a.event_type, b.event_type),
         | sg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_has
         |  FROM spans GROUP BY event_type)
         | SELECT antecedent, consequent, n_seq,
         |  round(CAST(n_seq AS DOUBLE) / CAST(nu AS DOUBLE), 6)
         |   AS support,
         |  round(CAST(n_seq AS DOUBLE) * CAST(nu AS DOUBLE) /
         |   (CAST(sa.n_has AS DOUBLE) * CAST(sb.n_has AS DOUBLE)), 6)
         |   AS lift
         | FROM pats JOIN sg sa ON sa.event_type = antecedent
         | JOIN sg sb ON sb.event_type = consequent CROSS JOIN u
         | ORDER BY antecedent, consequent""".stripMargin
        .replaceAll("\n", " ")
    },
    "q311_overdispersion" -> {
      s"""WITH per AS (SELECT user_id, CAST(count(*) AS HUGEINT) AS c
         |  FROM events GROUP BY user_id),
         | mo AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(c) AS sc,
         |  sum(c * c) AS scc FROM per),
         | m AS (SELECT CAST(n AS DOUBLE) AS n,
         |  CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
         |  CAST(n * scc - sc * sc AS DOUBLE) /
         |   (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS variance
         |  FROM mo)
         | SELECT CAST(n AS BIGINT) AS n_users, round(mean, 6) AS mean,
         |  round(variance, 6) AS variance,
         |  round(variance / mean, 6) AS dispersion,
         |  round(sqrt(2.0 * (n - 1.0) * variance / mean) -
         |   sqrt(2.0 * (n - 1.0) - 1.0), 6) AS poisson_z,
         |  round(mean * mean / (variance - mean), 6) AS nb_r,
         |  round(mean / variance, 6) AS nb_p
         | FROM m""".stripMargin.replaceAll("\n", " ")
    },
    "q312_ess_weights" -> {
      s"""WITH cnt AS (SELECT lang, CAST(count(*) AS BIGINT) AS nd
         |  FROM documents GROUP BY lang),
         | tot AS (SELECT CAST(sum(nd) AS BIGINT) AS n FROM cnt),
         | g AS MATERIALIZED (SELECT lang, nd, n,
         |  CAST(nd AS DOUBLE) / CAST(n AS DOUBLE) AS p,
         |  sqrt(CAST(nd AS DOUBLE) / CAST(n AS DOUBLE)) AS q_raw
         |  FROM cnt CROSS JOIN tot),
         | z AS (SELECT ${dsumSql("q_raw")} AS zq FROM g),
         | w AS MATERIALIZED (SELECT lang, nd, n,
         |  (q_raw / zq) / p AS w FROM g CROSS JOIN z),
         | ess AS (SELECT round(${dsumSql("CAST(nd AS DOUBLE) * w")} *
         |   ${dsumSql("CAST(nd AS DOUBLE) * w")} /
         |   ${dsumSql("CAST(nd AS DOUBLE) * w * w")}, 2) AS ess,
         |  round(${dsumSql("CAST(nd AS DOUBLE) * w")} *
         |   ${dsumSql("CAST(nd AS DOUBLE) * w")} /
         |   ${dsumSql("CAST(nd AS DOUBLE) * w * w")} /
         |   CAST(max(n) AS DOUBLE), 6) AS ess_fraction FROM w)
         | SELECT lang, nd AS n_docs, round(w, 6) AS weight, ess,
         |  ess_fraction
         | FROM w CROSS JOIN ess ORDER BY lang""".stripMargin
        .replaceAll("\n", " ")
    },
    "q313_graph_stats" -> {
      s"""WITH kk AS (SELECT CAST(ceil(sqrt(count(DISTINCT l_orderkey)))
         |   AS BIGINT) * 6 AS k FROM lineitem),
         | ob AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok,
         |  CAST(l_partkey AS BIGINT) % k AS pk
         |  FROM lineitem CROSS JOIN kk),
         | edges AS MATERIALIZED (SELECT p1, p2
         |  FROM (SELECT a.pk AS p1, b.pk AS p2, count(*) AS npair
         |   FROM ob a JOIN ob b ON b.ok = a.ok AND a.pk < b.pk
         |   GROUP BY a.pk, b.pk) WHERE npair >= 2),
         | adj AS MATERIALIZED (SELECT p1 AS a, p2 AS b FROM edges
         |  UNION ALL SELECT p2, p1 FROM edges),
         | deg AS MATERIALIZED (SELECT a, CAST(count(*) AS BIGINT) AS dg
         |  FROM adj GROUP BY a),
         | de AS (SELECT CAST(dx.dg AS HUGEINT) AS x,
         |  CAST(dy.dg AS HUGEINT) AS y
         |  FROM adj JOIN deg dx ON dx.a = adj.a
         |  JOIN deg dy ON dy.a = adj.b),
         | mo AS (SELECT CAST(count(*) AS HUGEINT) AS m, sum(x) AS sx,
         |  sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx,
         |  sum(y * y) AS syy FROM de),
         | asr AS (SELECT CAST(m * sxy - sx * sy AS DOUBLE) /
         |  (sqrt(CAST(m * sxx - sx * sx AS DOUBLE)) *
         |   sqrt(CAST(m * syy - sy * sy AS DOUBLE))) AS assortativity,
         |  CAST(m // 2 AS BIGINT) AS n_edges FROM mo),
         | tri AS (SELECT CAST(count(*) AS BIGINT) AS n_tri
         |  FROM edges e1 JOIN edges e2 ON e2.p1 = e1.p2
         |  JOIN edges e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2),
         | wg AS (SELECT CAST(sum(dg * (dg - 1) // 2) AS BIGINT)
         |   AS n_wedges FROM deg),
         | nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg)
         | SELECT n_nodes, n_edges, round(assortativity, 6)
         |   AS assortativity, n_tri, n_wedges,
         |  round(3.0 * CAST(n_tri AS DOUBLE) /
         |   CAST(n_wedges AS DOUBLE), 6) AS clustering_coef
         | FROM asr CROSS JOIN tri CROSS JOIN wg CROSS JOIN nn"""
        .stripMargin.replaceAll("\n", " ")
    },
    "q314_runs_test" -> {
      s"""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
         |  ${dsumSql("value")} AS y FROM events GROUP BY day),
         | m0 AS (SELECT min(day) AS d0 FROM daily),
         | pts AS MATERIALIZED (SELECT day,
         |  CAST(day - d0 AS DOUBLE) AS x, y FROM daily CROSS JOIN m0),
         | ft AS (SELECT (${dsumSql("x * y")} - ${dsumSql("x")} *
         |   ${dsumSql("y")} / CAST(count(*) AS DOUBLE)) /
         |  (${dsumSql("x * x")} - ${dsumSql("x")} * ${dsumSql("x")} /
         |   CAST(count(*) AS DOUBLE)) AS b,
         |  ${dsumSql("x")} AS sx, ${dsumSql("y")} AS sy,
         |  CAST(count(*) AS DOUBLE) AS nn FROM pts),
         | fit AS (SELECT b, (sy - b * sx) / nn AS a FROM ft),
         | sgn AS (SELECT day, CASE WHEN
         |   round(round(y - a - b * x, 6) * 1e6) >= 0 THEN 1 ELSE -1
         |  END AS sg FROM pts CROSS JOIN fit),
         | lg AS (SELECT sg, lag(sg) OVER (ORDER BY day) AS prev
         |  FROM sgn),
         | runs AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(count(*) FILTER (WHERE sg = 1) AS BIGINT) AS n_pos,
         |  CAST(count(*) FILTER (WHERE sg = -1) AS BIGINT) AS n_neg,
         |  CAST(count(*) FILTER (WHERE prev IS NULL OR sg <> prev)
         |   AS BIGINT) AS n_runs FROM lg),
         | mu AS (SELECT n, n_pos, n_neg, n_runs,
         |  2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE) /
         |   CAST(n AS DOUBLE) + 1.0 AS mu_r FROM runs)
         | SELECT n, n_pos, n_neg, n_runs, round(mu_r, 6) AS mu_runs,
         |  round((CAST(n_runs AS DOUBLE) - mu_r) /
         |   sqrt((mu_r - 1.0) * (mu_r - 2.0) /
         |    (CAST(n AS DOUBLE) - 1.0)), 6) AS z
         | FROM mu""".stripMargin.replaceAll("\n", " ")
    },
    "q315_theil" -> {
      s"""WITH per AS MATERIALIZED (SELECT c_nationkey AS nation,
         |  yc FROM (SELECT o_custkey,
         |   sum(CAST(round(o_totalprice * 100) AS HUGEINT)) AS yc
         |   FROM orders GROUP BY o_custkey) o
         |  JOIN customer ON c_custkey = o_custkey),
         | gtot AS MATERIALIZED (SELECT nation, sum(yc) AS ycg,
         |  CAST(count(*) AS BIGINT) AS ng FROM per GROUP BY nation),
         | tot AS (SELECT sum(ycg) AS yct, CAST(sum(ng) AS BIGINT) AS nt
         |  FROM gtot),
         | terms AS (SELECT per.nation,
         |  (CAST(yc AS DOUBLE) / CAST(yct AS DOUBLE)) *
         |   ln((CAST(yc AS DOUBLE) / CAST(yct AS DOUBLE)) *
         |    CAST(nt AS DOUBLE)) AS t_tot,
         |  (CAST(yc AS DOUBLE) / CAST(ycg AS DOUBLE)) *
         |   ln((CAST(yc AS DOUBLE) / CAST(ycg AS DOUBLE)) *
         |    CAST(ng AS DOUBLE)) AS t_g
         |  FROM per JOIN gtot ON gtot.nation = per.nation CROSS JOIN tot),
         | tt AS (SELECT ${dsumSql("t_tot")} AS t_total FROM terms),
         | tw AS (SELECT ${dsumSql(
           "(CAST(ycg AS DOUBLE) / CAST(yct AS DOUBLE)) * tg")}
         |   AS t_within
         |  FROM (SELECT nation, ${dsumSql("t_g")} AS tg FROM terms
         |   GROUP BY nation) x
         |  JOIN gtot ON gtot.nation = x.nation CROSS JOIN tot),
         | tb AS (SELECT ${dsumSql(
           "(CAST(ycg AS DOUBLE) / CAST(yct AS DOUBLE)) * " +
             "ln((CAST(ycg AS DOUBLE) / CAST(yct AS DOUBLE)) / " +
             "(CAST(ng AS DOUBLE) / CAST(nt AS DOUBLE)))")} AS t_between
         |  FROM gtot CROSS JOIN tot)
         | SELECT round(t_total, 6) AS theil_total,
         |  round(t_within, 6) AS theil_within,
         |  round(t_between, 6) AS theil_between,
         |  (abs(t_total - t_within - t_between) < 0.0000001)
         |   AS decomposition_ok
         | FROM tt CROSS JOIN tw CROSS JOIN tb""".stripMargin
        .replaceAll("\n", " ")
    },
    "q316_bradley_terry" -> {
      val iters = (1 to 5).map { t =>
        s"""dn$t AS (SELECT sa, ${dsumSql(
             "CAST(n_ij AS DOUBLE) / (ti.th + tj.th)")} AS dn
           | FROM games JOIN t${t - 1} ti ON ti.i = games.sa
           | JOIN t${t - 1} tj ON tj.i = games.sb GROUP BY sa),
           | raw$t AS MATERIALIZED (SELECT wins.i, wi / dn AS tr
           | FROM wins JOIN dn$t ON dn$t.sa = wins.i),
           | mn$t AS (SELECT ${dsumSql("tr")} AS st,
           |  CAST(count(*) AS DOUBLE) AS nn FROM raw$t),
           | t$t AS MATERIALIZED (SELECT i,
           |  round(tr / (st / nn) * 1e9) / 1e9 AS th
           | FROM raw$t CROSS JOIN mn$t)""".stripMargin
      }
      s"""WITH perOs AS MATERIALIZED (SELECT l_orderkey AS ok,
         |  l_suppkey AS sk,
         |  sum(CAST(round(l_extendedprice * 100) AS HUGEINT)) AS pc
         |  FROM lineitem GROUP BY l_orderkey, l_suppkey),
         | games AS MATERIALIZED (SELECT a.sk AS sa, b.sk AS sb,
         |  CAST(count(*) AS BIGINT) AS n_ij,
         |  CAST(count(*) FILTER (WHERE a.pc > b.pc) AS BIGINT) AS w_ij
         |  FROM perOs a JOIN perOs b ON b.ok = a.ok AND a.sk <> b.sk
         |  WHERE a.pc <> b.pc GROUP BY a.sk, b.sk),
         | wins AS MATERIALIZED (SELECT sa AS i,
         |  CAST(sum(w_ij) AS DOUBLE) AS wi FROM games GROUP BY sa),
         | t0 AS MATERIALIZED (SELECT i, CAST(1.0 AS DOUBLE) AS th
         |  FROM wins),
         | ${iters.mkString(", ")}
         | SELECT t5.i AS supplier, CAST(wi AS BIGINT) AS wins,
         |  round(th, 6) AS rating
         | FROM t5 JOIN wins ON wins.i = t5.i
         | ORDER BY rating DESC, supplier LIMIT 20""".stripMargin
        .replaceAll("\n", " ")
    },
    "q317_join_size_ams" -> {
      val split = graft.aug.Sampling.Sql.keyBucket("l_orderkey", 41L)
      val sums = (1 to 64).flatMap { j =>
        val t = s"(h + ${j * 1000003L})"
        val xi = s"(CASE WHEN ($t*$t) % 1000000007 % 2 = 0 THEN 1 ELSE -1 END)"
        Seq(s"sum($xi) AS a$j",
          s"sum(CASE WHEN in_b THEN $xi ELSE 0 END) AS b$j")
      }.mkString(", ")
      val prodSum = (1 to 64).map(j => s"CAST(a$j*b$j AS DOUBLE)")
        .mkString(" + ")
      val moms = (0 until 8).map { g =>
        val t = (1 to 8).map(k => s"CAST(a${g * 8 + k}*b${g * 8 + k} AS DOUBLE)")
          .mkString(" + ")
        s"($t)/8.0"
      }.mkString(", ")
      s"""WITH base AS MATERIALIZED (SELECT
         |  (CAST(l_partkey AS BIGINT) * 2654435761) % 1000000007 AS h,
         |  ($split) < 200000 AS in_b FROM lineitem),
         | sk AS MATERIALIZED (SELECT $sums FROM base),
         | ex AS (SELECT CAST(sum(a) AS BIGINT) AS n_a,
         |  CAST(sum(b) AS BIGINT) AS n_b,
         |  CAST(sum(a * b) AS BIGINT) AS jx
         |  FROM (SELECT h, count(*) AS a,
         |   count(*) FILTER (WHERE in_b) AS b FROM base GROUP BY h)),
         | es AS (SELECT ($prodSum)/64.0 AS est_mean,
         |  (SELECT (l[4] + l[5])/2.0 FROM
         |   (SELECT list_sort([$moms]) AS l)) AS est_mom FROM sk)
         | SELECT n_a, n_b, jx AS join_exact,
         |  round(est_mean, 6) AS est_mean, round(est_mom, 6) AS est_mom,
         |  round((est_mean - CAST(jx AS DOUBLE))/CAST(jx AS DOUBLE), 6)
         |   AS rel_err_mean,
         |  round((est_mom - CAST(jx AS DOUBLE))/CAST(jx AS DOUBLE), 6)
         |   AS rel_err_mom
         | FROM ex, es""".stripMargin.replaceAll("\n", " ")
    },
    "q318_k_anonymity" -> {
      s"""WITH c AS (SELECT c_nationkey, c_mktsegment,
         |  CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS sbucket
         |  FROM customer),
         | cls AS MATERIALIZED (SELECT c_nationkey, c_mktsegment,
         |  CAST(count(*) AS BIGINT) AS k,
         |  CAST(count(DISTINCT sbucket) AS BIGINT) AS l
         |  FROM c GROUP BY c_nationkey, c_mktsegment),
         | ag AS (SELECT CAST(sum(k) AS BIGINT) AS n_rows,
         |  CAST(count(*) AS BIGINT) AS n_classes, min(k) AS min_k,
         |  CAST(sum(CASE WHEN k < 2 THEN k ELSE 0 END) AS BIGINT)
         |   AS rk2,
         |  CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
         |   AS rk5,
         |  min(l) AS min_l,
         |  CAST(count(*) FILTER (WHERE l < 3) AS BIGINT) AS cl3
         |  FROM cls)
         | SELECT n_rows, n_classes, min_k,
         |  round(CAST(rk2 AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
         |   AS pct_rows_k_lt_2,
         |  round(CAST(rk5 AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
         |   AS pct_rows_k_lt_5,
         |  min_l,
         |  round(CAST(cl3 AS DOUBLE) / CAST(n_classes AS DOUBLE), 6)
         |   AS pct_classes_l_lt_3
         | FROM ag""".stripMargin.replaceAll("\n", " ")
    },
    "q319_mann_kendall" -> {
      s"""WITH daily0 AS (SELECT epoch_us(ts) // 86400000000 AS day,
         |  sum(CAST(round(value * 100) AS HUGEINT)) AS xc FROM events
         |  GROUP BY day),
         | m0 AS (SELECT min(day) AS d0 FROM daily0),
         | daily AS (SELECT day - d0 AS t, xc FROM daily0 CROSS JOIN m0),
         | series AS MATERIALIZED (
         |  SELECT 'healthy' AS scenario, t, xc FROM daily
         |  UNION ALL SELECT 'trend_injected', t, xc + t * 200000
         |  FROM daily),
         | pairs AS MATERIALIZED (SELECT a.scenario,
         |  sign(CAST(b.xc - a.xc AS DOUBLE)) AS sg,
         |  CAST(b.xc - a.xc AS DOUBLE) / 100.0 /
         |   CAST(b.t - a.t AS DOUBLE) AS slope
         |  FROM series a JOIN series b
         |   ON b.scenario = a.scenario AND a.t < b.t),
         | rkd AS (SELECT scenario, slope, row_number() OVER
         |  (PARTITION BY scenario ORDER BY slope) AS rk,
         |  count(*) OVER (PARTITION BY scenario) AS np FROM pairs),
         | med AS (SELECT scenario,
         |  ${dsumSql("slope")} / CAST(count(*) AS DOUBLE) AS sen
         |  FROM rkd WHERE rk = (np + 1) // 2 OR rk = np // 2 + 1
         |  GROUP BY scenario),
         | st AS (SELECT scenario,
         |  CAST(sum(CAST(sg AS HUGEINT)) AS BIGINT) AS s_mk FROM pairs
         |  GROUP BY scenario),
         | nn AS (SELECT scenario, CAST(count(*) AS BIGINT) AS n
         |  FROM series GROUP BY scenario)
         | SELECT st.scenario, n, s_mk,
         |  round((CASE WHEN s_mk > 0 THEN CAST(s_mk AS DOUBLE) - 1.0
         |   WHEN s_mk < 0 THEN CAST(s_mk AS DOUBLE) + 1.0
         |   ELSE 0.0 END) /
         |   sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) *
         |    (2.0 * CAST(n AS DOUBLE) + 5.0) / 18.0), 6) AS z,
         |  round(sen, 6) AS sen_slope
         | FROM st JOIN nn ON nn.scenario = st.scenario
         | JOIN med ON med.scenario = st.scenario
         | ORDER BY st.scenario""".stripMargin.replaceAll("\n", " ")
    },
    "q320_hurst" -> {
      val wk = graft.aug.Sampling.Sql.keyBucket("(t + 7700)", 37L)
      val perSize = Seq(8, 16, 24).map { bn =>
        s"""blk$bn AS (SELECT scenario, t, xc, t // $bn AS blk
           | FROM series),
           | bm$bn AS (SELECT scenario, blk, sum(xc) AS sxc,
           |  CAST(count(*) AS BIGINT) AS bc FROM blk$bn
           |  GROUP BY scenario, blk HAVING count(*) = $bn),
           | dev$bn AS (SELECT b.scenario, b.blk, b.t,
           |  CAST(b.xc AS DOUBLE) -
           |   CAST(m.sxc AS DOUBLE) / CAST(m.bc AS DOUBLE) AS d, m.bc
           |  FROM blk$bn b JOIN bm$bn m
           |   ON m.scenario = b.scenario AND m.blk = b.blk),
           | cum$bn AS (SELECT scenario, blk, d, bc,
           |  CAST(sum(CAST(d AS DECIMAL(38,10))) OVER
           |   (PARTITION BY scenario, blk ORDER BY t
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |   AS DOUBLE) AS cd FROM dev$bn),
           | rs$bn AS (SELECT scenario, $bn AS n,
           |  (greatest(max(cd), 0.0) - least(min(cd), 0.0)) /
           |   sqrt(${dsumSql("d * d")} / CAST(max(bc) AS DOUBLE)) AS rs
           |  FROM cum$bn GROUP BY scenario, blk
           |  HAVING sqrt(${dsumSql("d * d")} / CAST(max(bc) AS DOUBLE))
           |   > 0)""".stripMargin
      }
      s"""WITH daily0 AS (SELECT epoch_us(ts) // 86400000000 AS day,
         |  sum(CAST(round(value * 100) AS HUGEINT)) AS xc FROM events
         |  GROUP BY day),
         | m0 AS (SELECT min(day) AS d0 FROM daily0),
         | base AS (SELECT day - d0 AS t, xc FROM daily0 CROSS JOIN m0),
         | walk AS (SELECT t, sum(CASE WHEN ($wk) < 500000
         |   THEN 100000 ELSE -100000 END) OVER (ORDER BY t
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS xc
         |  FROM base),
         | series AS MATERIALIZED (
         |  SELECT 'healthy' AS scenario, t, xc FROM base
         |  UNION ALL SELECT 'walk_injected', t, CAST(xc AS HUGEINT)
         |  FROM walk),
         | ${perSize.mkString(", ")},
         | rs AS (SELECT * FROM rs8 UNION ALL SELECT * FROM rs16
         |  UNION ALL SELECT * FROM rs24),
         | pts AS MATERIALIZED (SELECT scenario, n,
         |  ln(${dsumSql("rs")} / CAST(count(*) AS DOUBLE)) AS y,
         |  ln(CAST(n AS DOUBLE)) AS x FROM rs GROUP BY scenario, n),
         | fit AS (SELECT scenario,
         |  round((${dsumSql("x * y")} - ${dsumSql("x")} * ${dsumSql("y")}
         |    / CAST(count(*) AS DOUBLE)) /
         |   (${dsumSql("x * x")} - ${dsumSql("x")} * ${dsumSql("x")}
         |    / CAST(count(*) AS DOUBLE)), 6) AS hurst_h
         |  FROM pts GROUP BY scenario)
         | SELECT pts.scenario, n, round(exp(y), 6) AS rs_mean, hurst_h
         | FROM pts JOIN fit ON fit.scenario = pts.scenario
         | ORDER BY pts.scenario, n""".stripMargin.replaceAll("\n", " ")
    },
    // all three YCbCr planes recomputed from the closed-form DC
    // formulas — clamp(dc·2+128) per flat block, 64 samples each
    "q321_color_jpeg" ->
      """WITH ids AS (SELECT doc_id, doc_id % 2 + 1 AS mcus
        |   FROM documents WHERE doc_id < 60),
        | yb AS (SELECT i.doc_id, least(255, greatest(0,
        |     ((x.x * 7 + y.y * 11 + i.doc_id * 13) % 200 - 100) * 2 + 128)) AS v
        |  FROM ids i, range(0, 4) x(x), range(0, 2) y(y)
        |  WHERE x.x < i.mcus * 2),
        | cbb AS (SELECT i.doc_id, least(255, greatest(0,
        |     ((x.x * 5 + i.doc_id * 17) % 160 - 80) * 2 + 128)) AS v
        |  FROM ids i, range(0, 2) x(x) WHERE x.x < i.mcus),
        | crb AS (SELECT i.doc_id, least(255, greatest(0,
        |     ((x.x * 3 + i.doc_id * 19) % 160 - 80) * 2 + 128)) AS v
        |  FROM ids i, range(0, 2) x(x) WHERE x.x < i.mcus),
        | ys AS (SELECT doc_id, CAST(64 * sum(v) AS BIGINT) AS sum_y FROM yb GROUP BY doc_id),
        | cbs AS (SELECT doc_id, CAST(64 * sum(v) AS BIGINT) AS sum_cb FROM cbb GROUP BY doc_id),
        | crs AS (SELECT doc_id, CAST(64 * sum(v) AS BIGINT) AS sum_cr FROM crb GROUP BY doc_id)
        | SELECT i.doc_id, CAST(i.mcus * 16 AS BIGINT) AS width,
        |  CAST(16 AS BIGINT) AS height, sum_y, sum_cb, sum_cr
        | FROM ids i JOIN ys USING (doc_id) JOIN cbs USING (doc_id)
        |  JOIN crs USING (doc_id)
        | ORDER BY i.doc_id""".stripMargin.replaceAll("\n", " "),
    // full pipeline replay: sessionize (q58's machinery) -> day bins ->
    // frozen first-15-day baseline -> psi in the SAME left-associated
    // bin order 0..3 the Spark reduce chains -> alert on the rounded psi
    "q322_stream_pipeline" -> {
      val gapUs = 30L * 60 * 1000 * 1000
      def pcT(b: Int) = s"greatest(CAST(c$b AS DOUBLE) / CAST(n_sessions AS DOUBLE), 1e-6)"
      def t(b: Int) = s"(${pcT(b)} - pb$b) * ln(${pcT(b)} / pb$b)"
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tsn FROM events),
         | s AS (SELECT user_id, tsn, event_id,
         |   CASE WHEN lag(tsn) OVER w IS NULL OR tsn - lag(tsn) OVER w > $gapUs THEN 1 ELSE 0 END AS is_new
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id)),
         | t AS (SELECT user_id, tsn,
         |   sum(is_new) OVER (PARTITION BY user_id ORDER BY tsn, event_id ROWS UNBOUNDED PRECEDING) AS session_seq
         |  FROM s),
         | sess AS (SELECT count(*) AS ne, min(tsn) // 86400000000 AS day
         |  FROM t GROUP BY user_id, session_seq),
         | b AS (SELECT day, CAST(ne > 1.5 AS INT) + CAST(ne > 3.5 AS INT)
         |   + CAST(ne > 6.5 AS INT) AS bin FROM sess),
         | d0 AS (SELECT min(day) AS d0 FROM b),
         | bl AS (SELECT bin, count(*) AS nb FROM b, d0 WHERE day < d0 + 15 GROUP BY bin),
         | blt AS (SELECT count(*) AS tb FROM b, d0 WHERE day < d0 + 15),
         | pb AS (SELECT
         |   greatest(coalesce(max(CASE WHEN bin = 0 THEN nb END), 0) / CAST(tb AS DOUBLE), 1e-6) AS pb0,
         |   greatest(coalesce(max(CASE WHEN bin = 1 THEN nb END), 0) / CAST(tb AS DOUBLE), 1e-6) AS pb1,
         |   greatest(coalesce(max(CASE WHEN bin = 2 THEN nb END), 0) / CAST(tb AS DOUBLE), 1e-6) AS pb2,
         |   greatest(coalesce(max(CASE WHEN bin = 3 THEN nb END), 0) / CAST(tb AS DOUBLE), 1e-6) AS pb3
         |  FROM bl, blt GROUP BY tb),
         | dc AS (SELECT day, CAST(count(*) AS BIGINT) AS n_sessions,
         |   count(*) FILTER (WHERE bin = 0) AS c0,
         |   count(*) FILTER (WHERE bin = 1) AS c1,
         |   count(*) FILTER (WHERE bin = 2) AS c2,
         |   count(*) FILTER (WHERE bin = 3) AS c3
         |  FROM b GROUP BY day),
         | p AS (SELECT day, n_sessions,
         |   round(${t(0)} + ${t(1)} + ${t(2)} + ${t(3)}, 6) AS psi
         |  FROM dc, pb)
         | SELECT day, n_sessions, psi, psi > 0.2 AS alert
         | FROM p ORDER BY day""".stripMargin.replaceAll("\n", " ")
    }
  )
}
