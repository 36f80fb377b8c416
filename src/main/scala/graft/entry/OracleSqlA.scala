package graft

import graft.core.{PrefixScan, Profiler, Quantiles, Stats}
import graft.eval.Metrics
import graft.features.{FrequencyIndexer, Imputers}
import graft.score.ZScoreAnomaly
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** DuckDB oracle SQL, part A — see [[SparkEntry.oracleSql]]. */
private[graft] trait OracleSqlA { this: SparkEntry.type =>

  private[graft] lazy val oracleSqlA: Map[String, String] = Map(
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
  )
}
