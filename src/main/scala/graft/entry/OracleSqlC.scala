package graft

import graft.core.{PrefixScan, Profiler, Quantiles, Stats}
import graft.eval.Metrics
import graft.features.{FrequencyIndexer, Imputers}
import graft.score.ZScoreAnomaly
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** DuckDB oracle SQL, part C — see [[SparkEntry.oracleSql]]. */
private[graft] trait OracleSqlC { this: SparkEntry.type =>

  private[graft] lazy val oracleSqlC: Map[String, String] = Map(
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
    },
    // q323: IDENTICAL closed form to q234 — same DC layout, flat quant
    // 16, clamp(dc*2+128) — but the Spark side reconstructs it through
    // the six-scan PROGRESSIVE coding (three scans contribute to each
    // DC; EOBn runs cover the AC bands), so the same oracle pins a
    // completely different entropy decoder
    "q323_jpeg_progressive" ->
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
    // q324: the q234 closed form a third time — the Spark side decodes
    // a RESTART-marker coding (DRI/RSTn segments, per-segment DC chain)
    "q324_jpeg_restart" ->
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
    // q325: each FLAC block is a 192-sample CONSTANT subframe of
    // (id*31 + j*17) % 1000 - 500 — n/sum scale by 192, mean/std are
    // the block-value moments (equal block sizes), all exact-rational
    // on both sides
    "q325_flac_decode" ->
      """WITH ids AS (SELECT doc_id, doc_id % 3 + 1 AS nb
        |   FROM documents WHERE doc_id < 60),
        | blk AS (SELECT i.doc_id,
        |   (i.doc_id * 31 + j.j * 17) % 1000 - 500 AS v
        |  FROM ids i, range(0, 3) j(j) WHERE j.j < i.nb)
        | SELECT doc_id,
        |  CAST(192 * count(*) AS BIGINT) AS n_samples,
        |  CAST(192 * sum(v) AS BIGINT) AS sum_samples,
        |  round(CAST(sum(v) AS DOUBLE) / count(*), 6) AS mean_s,
        |  round(sqrt(greatest(CAST(0 AS DOUBLE),
        |    CAST(sum(v * v) AS DOUBLE) / count(*) -
        |    (CAST(sum(v) AS DOUBLE) / count(*)) *
        |    (CAST(sum(v) AS DOUBLE) / count(*)))), 6) AS std_s
        | FROM blk GROUP BY doc_id ORDER BY doc_id""".stripMargin
      .replaceAll("\n", " "),
    // q326: the oracle recomputes per-bucket counts / char sums / the
    // polynomial content hash from the RAW documents table — the Spark
    // side must round-trip every byte through gzip members + WARC
    // framing + UTF-8 to match sum_hash
    "q326_warc_ingest" -> {
      val h = graft.text.TextOps.Sql.strHash("text")
      s"""SELECT doc_id % 24 AS bucket,
         | count(*) AS n_records,
         | CAST(sum(len(text)) AS BIGINT) AS sum_chars,
         | CAST(sum($h) AS BIGINT) AS sum_hash
         | FROM documents WHERE doc_id < 240
         | GROUP BY 1 ORDER BY bucket""".stripMargin.replaceAll("\n", " ")
    },
    // q327: replays the whole crawl-to-corpus funnel from the raw table
    // — quality rules, content-hash keep-first dedup among quality
    // survivors, q223's integer key + running-total budget selection
    "q327_crawl_capstone" -> {
      val toks = graft.text.TextOps.Sql.toks("text")
      val h = graft.text.TextOps.Sql.strHash("text")
      s"""WITH t AS (SELECT doc_id, source, $toks AS toks, $h AS h
         |   FROM documents WHERE doc_id < 960),
         | f AS (SELECT doc_id, source, h,
         |   CAST(len(toks) AS BIGINT) AS n_tok,
         |   CAST(len(list_distinct(toks)) AS BIGINT) AS u,
         |   (CAST(len(toks) AS BIGINT) >= 5 AND
         |    CAST(len(toks) AS BIGINT) <= 2000 AND
         |    CAST(len(list_distinct(toks)) AS BIGINT) * 1000000 >=
         |      CAST(len(toks) AS BIGINT) * 300000) AS quality
         |  FROM t),
         | fi AS (SELECT h, min(doc_id) AS first_id FROM f WHERE quality
         |   GROUP BY h),
         | k AS (SELECT f.*,
         |   (f.quality AND f.doc_id = fi.first_id) AS kept
         |  FROM f LEFT JOIN fi ON f.h = fi.h),
         | b AS (SELECT COALESCE(sum(n_tok), 0) // 4 AS budget
         |   FROM k WHERE kept),
         | c AS (SELECT source, n_tok,
         |   sum(n_tok) OVER (ORDER BY
         |     (1000000 - (u * 1000000) // n_tok) * 8589934592 + doc_id
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM k WHERE kept),
         | sel AS (SELECT source, count(*) AS n_selected,
         |   CAST(sum(n_tok) AS BIGINT) AS tokens_selected
         |  FROM c CROSS JOIN b WHERE cum <= budget GROUP BY source),
         | fun AS (SELECT source, count(*) AS n_parsed,
         |   count(*) FILTER (WHERE quality) AS n_quality,
         |   count(*) FILTER (WHERE kept) AS n_unique
         |  FROM k GROUP BY source)
         | SELECT fun.source, fun.n_parsed, fun.n_quality, fun.n_unique,
         |  CAST(COALESCE(sel.n_selected, 0) AS BIGINT) AS n_selected,
         |  CAST(COALESCE(sel.tokens_selected, 0) AS BIGINT)
         |    AS tokens_selected
         | FROM fun LEFT JOIN sel ON fun.source = sel.source
         | ORDER BY fun.source""".stripMargin.replaceAll("\n", " ")
    },
    // q328: every MP3 header field is a closed form of doc_id; the
    // Spark side must frame-walk the real byte chain to recover them
    "q328_mp3_meta" ->
      """WITH d AS (SELECT doc_id,
        |   CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
        |     ELSE 32000 END AS sample_rate,
        |   CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS channels,
        |   (doc_id % 10 + 1) * 1152 AS n_samples
        |  FROM documents WHERE doc_id < 120)
        | SELECT doc_id, 'mp3' AS format,
        |  CAST(sample_rate AS BIGINT) AS sample_rate,
        |  CAST(channels AS BIGINT) AS channels,
        |  CAST(n_samples AS BIGINT) AS n_samples,
        |  CAST(n_samples * 1000 // sample_rate AS BIGINT) AS duration_ms
        | FROM d ORDER BY doc_id""".stripMargin.replaceAll("\n", " "),
    // q329: the oracle replays the ingest policy (conversions + 2xx
    // responses kept, 404 captures dropped) and recomputes counts and
    // the content hash of kept texts from the RAW documents table — the
    // Spark side must round-trip bytes through gzip members + WARC +
    // HTTP framing + charset decode to match; offsets_ok is the
    // Spark-checked split-index invariant, TRUE by construction
    "q329_warc_responses" -> {
      val h = graft.text.TextOps.Sql.strHash("text")
      s"""SELECT doc_id % 48 AS bucket,
         | count(*) AS n_records,
         | count(*) FILTER (WHERE doc_id % 2 = 0) AS n_response,
         | count(*) FILTER (WHERE doc_id % 10 = 4) AS n_404,
         | count(*) FILTER (WHERE doc_id % 2 = 1 OR doc_id % 10 <> 4)
         |   AS n_kept,
         | CAST(COALESCE(sum(len(text)) FILTER (WHERE doc_id % 2 = 1
         |   OR doc_id % 10 <> 4), 0) AS BIGINT) AS sum_chars,
         | CAST(COALESCE(sum($h) FILTER (WHERE doc_id % 2 = 1
         |   OR doc_id % 10 <> 4), 0) AS BIGINT) AS sum_hash,
         | TRUE AS offsets_ok
         | FROM documents
         | GROUP BY 1 ORDER BY bucket""".stripMargin.replaceAll("\n", " ")
    },
    // q330: every WebP header field is a closed form of doc_id; the
    // Spark side must walk real RIFF framing + stream headers (start
    // codes, bit-packed dims, version/flag bits) to recover them
    "q330_webp_meta" ->
      """SELECT doc_id,
        | CASE doc_id % 3 WHEN 0 THEN 'vp8' WHEN 1 THEN 'vp8l'
        |   ELSE 'vp8x' END AS variant,
        | CAST(doc_id % 1920 + 1 AS BIGINT) AS width,
        | CAST(doc_id % 1080 + 1 AS BIGINT) AS height,
        | (doc_id % 3 <> 0 AND doc_id % 2 = 0) AS has_alpha
        | FROM documents WHERE doc_id < 120
        | ORDER BY doc_id""".stripMargin.replaceAll("\n", " "),
    // q331: every Opus field is a closed form of doc_id; the Spark side
    // must walk real Ogg pages (lacing, per-page CRC, OpusHead, EOS
    // granule arithmetic) to recover them
    "q331_opus_meta" ->
      """SELECT doc_id, 'opus' AS format,
        | CAST(CASE doc_id % 3 WHEN 0 THEN 48000 WHEN 1 THEN 44100
        |   ELSE 16000 END AS BIGINT) AS sample_rate,
        | CAST(doc_id % 2 + 1 AS BIGINT) AS channels,
        | CAST((doc_id % 10 + 1) * 960 AS BIGINT) AS n_samples_48k,
        | CAST((doc_id % 10 + 1) * 960 * 1000 // 48000 AS BIGINT)
        |   AS duration_ms
        | FROM documents WHERE doc_id < 120
        | ORDER BY doc_id""".stripMargin.replaceAll("\n", " "),
    // q332: full SQL re-derivation of the streaming near-dup alert
    // semantics — shingles -> minhash signatures -> band keys ->
    // per-bucket min-id alerts — over the q23-style clone injection
    "q332_stream_neardup_twin" -> {
      import graft.dedup.MinHashLSH.{Sql => M}
      val sh = graft.dedup.Dedup.Sql.shingles("text", 3)
      s"""WITH base AS (SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 10000, text FROM documents
         |    WHERE doc_id % 10 = 0),
         | s AS (SELECT doc_id, $sh AS sh FROM base),
         | ne AS (SELECT doc_id, sh FROM s WHERE len(sh) > 0),
         | sg AS (SELECT doc_id,
         |   ${M.signatureFromShingles("sh", 16)} AS sig FROM ne),
         | bands AS (SELECT doc_id,
         |   unnest(${M.bandKeyList("sig", 16, 4)}) AS band_key,
         |   unnest(generate_series(0, 3)) AS band_idx FROM sg),
         | f AS (SELECT band_idx, band_key, min(doc_id) AS first_id
         |   FROM bands GROUP BY 1, 2),
         | a AS (SELECT f.first_id, b.doc_id AS dup_id FROM bands b
         |   JOIN f ON b.band_idx = f.band_idx AND b.band_key = f.band_key
         |   WHERE b.doc_id <> f.first_id)
         | SELECT first_id, dup_id, count(*) AS n_bands FROM a
         | GROUP BY 1, 2 ORDER BY first_id, dup_id"""
        .stripMargin.replaceAll("\n", " ")
    },
    // q333: the oracle replays the closed-form 5-color palette over an
    // (x, y) grid; the Spark side must survive the full VP8L coding
    // path (Huffman groups, LZ77, color cache, subtract-green) to
    // reproduce the channel sums
    "q333_vp8l_decode" ->
      """WITH d AS (SELECT doc_id, 16 + doc_id % 17 AS w,
        |   16 + doc_id % 13 AS h FROM documents WHERE doc_id < 90),
        | g AS (SELECT d.doc_id, d.w, d.h,
        |   ((x.x // 4 + y.y + d.doc_id) % 5) AS c
        |  FROM d, range(0, 33) x(x), range(0, 29) y(y)
        |  WHERE x.x < d.w AND y.y < d.h)
        | SELECT doc_id, CAST(max(w) AS BIGINT) AS width,
        |  CAST(max(h) AS BIGINT) AS height,
        |  CAST(sum((c * 50 + doc_id) % 256) AS BIGINT) AS sum_r,
        |  CAST(sum((c * 33 + 2 * doc_id) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((c * 77 + 3 * doc_id) % 256) AS BIGINT) AS sum_b
        | FROM g GROUP BY doc_id ORDER BY doc_id"""
        .stripMargin.replaceAll("\n", " "),
    // q334/q335: the oracle states expected canonical/host/eTLD+1 as
    // closed forms of doc_id — the Spark side must run the REAL
    // canonicalizer over the messy raw variants to match
    "q334_url_canonical" ->
      s"""WITH d AS (SELECT doc_id, (doc_id // 2) % 6 AS fam,
         |   CAST((doc_id // 2) % 50 AS VARCHAR) AS n
         |  FROM documents WHERE doc_id < 600)
         | SELECT doc_id, $UrlCanonicalSql AS canonical,
         |  $UrlHostSql AS host, $UrlRegSql AS registrable,
         |  CAST(CASE fam WHEN 1 THEN 2 WHEN 5 THEN 1 ELSE 0 END
         |    AS BIGINT) AS n_params
         | FROM d ORDER BY doc_id""".stripMargin.replaceAll("\n", " "),
    // q336: the oracle states the exact extracted text per rule family
    // as a closed form — a leaked tag or swallowed entity diverges it
    "q336_html_extract" -> {
      val t = """CASE doc_id % 5
        | WHEN 0 THEN 'alpha ' || doc_id || chr(10) || 'beta'
        | WHEN 1 THEN 'x' || doc_id || ' yz' || chr(10) || 'w'
        | WHEN 2 THEN 'bold ' || doc_id || '&<tag>'
        | WHEN 3 THEN 'a' || chr(10) || 'b ' || doc_id
        | ELSE 'TA' || doc_id || chr(10) || '"q"A' END"""
        .stripMargin.replaceAll("\n", " ")
      s"""SELECT doc_id, $t AS text_out,
         | CAST(len(string_split($t, chr(10))) AS BIGINT) AS n_lines,
         | CAST(len($t) AS BIGINT) AS n_chars
         | FROM documents WHERE doc_id < 300
         | ORDER BY doc_id""".stripMargin.replaceAll("\n", " ")
    },
    // q337: every verdict for both agents is a closed form of the path
    // family; the Spark side must run the real RFC 9309 evaluation
    "q337_robots" ->
      """SELECT doc_id,
        | CASE doc_id % 6 WHEN 0 THEN '/a' WHEN 1 THEN '/private/x'
        |  WHEN 2 THEN '/private/public/y' WHEN 3 THEN '/doc.pdf'
        |  WHEN 4 THEN '/bot-only/z' ELSE '/files/report.pdf' END AS path,
        | (doc_id % 6 NOT IN (1, 3, 5)) AS allowed_star,
        | (doc_id % 6 <> 4) AS allowed_bot,
        | CAST(doc_id % 7 AS BIGINT) AS delay_star,
        | CAST(-1 AS BIGINT) AS delay_bot
        | FROM documents WHERE doc_id < 300
        | ORDER BY doc_id""".stripMargin.replaceAll("\n", " "),
    // q338: replays all four frontier stages from doc_id closed forms —
    // canonical identity via (fam, n), keep-first via a min window,
    // robots verdicts as family CASEs, extracted text as literals
    "q338_frontier_capstone" -> {
      val h = graft.text.TextOps.Sql.strHash("txt")
      val txt = """CASE doc_id % 5
        | WHEN 0 THEN 'alpha ' || doc_id || chr(10) || 'beta'
        | WHEN 1 THEN 'x' || doc_id || ' yz' || chr(10) || 'w'
        | WHEN 2 THEN 'bold ' || doc_id || '&<tag>'
        | WHEN 3 THEN 'a' || chr(10) || 'b ' || doc_id
        | ELSE 'TA' || doc_id || chr(10) || '"q"A' END"""
        .stripMargin.replaceAll("\n", " ")
      s"""WITH d AS (SELECT doc_id, (doc_id // 2) % 6 AS fam,
         |   (doc_id // 2) % 50 AS n FROM documents WHERE doc_id < 600),
         | f AS (SELECT doc_id, fam,
         |   CASE fam WHEN 2 THEN 'shop' || n || '.co.uk'
         |     ELSE 'site' || n || '.com' END AS registrable,
         |   min(doc_id) OVER (PARTITION BY fam, n) AS first_id FROM d),
         | t AS (SELECT registrable, (doc_id = first_id) AS kept,
         |   (doc_id = first_id AND fam NOT IN (1, 4)) AS fetched,
         |   $txt AS txt FROM f)
         | SELECT registrable, count(*) AS n_frontier,
         |  count(*) FILTER (WHERE kept) AS n_unique,
         |  count(*) FILTER (WHERE fetched) AS n_allowed,
         |  CAST(COALESCE(sum(len(txt)) FILTER (WHERE fetched), 0)
         |    AS BIGINT) AS sum_chars,
         |  CAST(COALESCE(sum($h) FILTER (WHERE fetched), 0)
         |    AS BIGINT) AS sum_hash
         | FROM t GROUP BY 1 ORDER BY registrable"""
        .stripMargin.replaceAll("\n", " ")
    },
    // q339: every resolved target is a closed form of doc_id in
    // document order; the two non-edges (fragment, mailto) are NULL
    "q339_link_extract" ->
      """WITH d AS (SELECT doc_id, CAST(doc_id % 40 AS VARCHAR) AS n
        |  FROM documents WHERE doc_id < 300),
        | g AS (SELECT d.doc_id, d.n, i.i AS link_idx
        |  FROM d, range(0, 8) i(i))
        | SELECT doc_id, CAST(link_idx AS BIGINT) AS link_idx,
        | CASE link_idx
        |  WHEN 0 THEN 'http://ext' || n || '.org/x'
        |  WHEN 1 THEN 'http://cdn' || n || '.net/lib.js'
        |  WHEN 2 THEN 'http://site' || n || '.com/top'
        |  WHEN 3 THEN 'http://site' || n || '.com/up/a.html'
        |  WHEN 4 THEN 'http://site' || n || '.com/dir/sub/b.html'
        |  WHEN 5 THEN 'http://site' || n || '.com/dir/page.html?q=1'
        |  ELSE NULL END AS target
        | FROM g ORDER BY doc_id, link_idx"""
        .stripMargin.replaceAll("\n", " "),
    // q340: both sitemap kinds as closed forms — even docs a 3-entry
    // urlset (entity/CDATA locs, explicit + default priorities), odd
    // docs a 2-entry sitemapindex
    "q340_sitemap" ->
      """WITH d AS (SELECT doc_id, CAST(doc_id % 30 AS VARCHAR) AS n,
        |   doc_id % 2 = 0 AS is_set FROM documents WHERE doc_id < 240),
        | g AS (SELECT d.*, i.i AS idx FROM d, range(0, 3) i(i)
        |  WHERE is_set OR i.i < 2)
        | SELECT doc_id, CAST(idx AS BIGINT) AS idx,
        | CASE WHEN is_set THEN 'urlset' ELSE 'sitemapindex' END AS kind,
        | CASE WHEN is_set
        |   THEN 'http://site' || n || '.com/p' || idx || '?a=1&b=' || idx
        |   ELSE 'http://site' || n || '.com/sm' || idx || '.xml.gz'
        |   END AS loc,
        | CASE WHEN is_set THEN '2026-0' || (idx + 1) || '-15'
        |   ELSE '' END AS lastmod,
        | CAST(CASE WHEN NOT is_set THEN 0.5 WHEN idx = 0 THEN 0.9
        |   WHEN idx = 1 THEN 0.3 ELSE 0.5 END AS DOUBLE) AS priority
        | FROM g ORDER BY doc_id, idx"""
        .stripMargin.replaceAll("\n", " "),
    // q341: both feed kinds as closed forms — even docs a 3-item RSS
    // channel (guid default-to-link, CDATA/entity titles), odd docs a
    // 2-entry Atom feed (rel selection, id default-to-link)
    "q341_feed_parse" ->
      """WITH d AS (SELECT doc_id, CAST(doc_id % 30 AS VARCHAR) AS n,
        |   doc_id % 2 = 0 AS is_rss FROM documents WHERE doc_id < 240),
        | g AS (SELECT d.*, i.i AS idx FROM d, range(0, 3) i(i)
        |  WHERE is_rss OR i.i < 2),
        | l AS (SELECT g.*,
        |  CASE WHEN is_rss THEN 'http://site' || n || '.com/post' || idx
        |   ELSE 'http://blog' || n || '.example/e' || idx || '?a=1&b=' || idx
        |   END AS link FROM g)
        | SELECT doc_id, CAST(idx AS BIGINT) AS idx,
        | CASE WHEN is_rss THEN 'rss' ELSE 'atom' END AS kind,
        | CASE WHEN is_rss THEN 'Site News' ELSE 'Blog' END AS feed_title,
        | CASE WHEN is_rss THEN 'A & B ' || idx
        |   ELSE 'Entry ' || idx END AS title,
        | link,
        | CASE WHEN is_rss THEN '0' || (idx + 1) || ' Jun 2026'
        |   ELSE '2026-07-0' || (idx + 1) || 'T00:00:00Z' END AS pub_date,
        | CASE WHEN is_rss AND idx = 0 THEN 'tag:site' || n || ',p0'
        |   WHEN NOT is_rss AND idx = 0 THEN 'urn:b' || n || ':e0'
        |   ELSE link END AS entry_id
        | FROM l ORDER BY doc_id, idx"""
        .stripMargin.replaceAll("\n", " "),
    // q342: the synthetic-PDF text/pages/version closed forms — the
    // parse itself (COS scan, Flate, escapes) happens Spark-side; the
    // oracle recomputes what the four variants must extract to
    "q342_pdf_text" ->
      """WITH d AS (SELECT doc_id, doc_id % 4 AS v, doc_id % 3 = 0 AS two
        |  FROM documents),
        | p AS (SELECT doc_id, two,
        |  CASE v
        |   WHEN 0 THEN 'Hello (doc) ' || doc_id || chr(10) ||
        |     'Line two of ' || doc_id
        |   WHEN 1 THEN 'Flate doc ' || doc_id || chr(10) ||
        |     'Line two of ' || doc_id
        |   WHEN 2 THEN 'World doc ' || doc_id
        |   ELSE 'Hex doc ' || doc_id || chr(10) || 'Next line ' || doc_id
        |   END AS page1 FROM d)
        | SELECT doc_id, '1.4' AS version,
        | CAST(CASE WHEN two THEN 2 ELSE 1 END AS BIGINT) AS n_pages,
        | page1 || CASE WHEN two THEN chr(10) || 'Page 2 of ' || doc_id
        |   ELSE '' END AS text, FALSE AS encrypted
        | FROM p ORDER BY doc_id"""
        .stripMargin.replaceAll("\n", " "),
    // q376: the /Encrypt gate — encrypted stubs flag with zero pages
    // and EMPTY text (ciphertext must never reach the text path),
    // plain docs pin encrypted = FALSE with their normal page count
    "q376_pdf_encrypt" ->
      """SELECT doc_id,
        | CASE WHEN doc_id % 3 = 0 THEN '1.6' ELSE '1.4' END AS version,
        | CAST(CASE WHEN doc_id % 3 = 0 THEN 0 ELSE 1 END AS BIGINT)
        |  AS n_pages,
        | doc_id % 3 = 0 AS text_empty,
        | doc_id % 3 = 0 AS encrypted
        | FROM documents WHERE doc_id < 240 ORDER BY doc_id"""
        .stripMargin.replaceAll("\n", " "),
    // q343: AVIF metadata closed forms (box walk happens Spark-side)
    "q343_avif_meta" ->
      """SELECT doc_id,
        | CASE WHEN doc_id % 5 = 0 THEN 'avis' ELSE 'avif' END AS brand,
        | CAST(doc_id % 1920 + 1 AS BIGINT) AS width,
        | CAST(doc_id % 1080 + 1 AS BIGINT) AS height,
        | CAST(CASE doc_id % 3 WHEN 0 THEN 8 WHEN 1 THEN 10 ELSE 12 END
        |   AS BIGINT) AS bit_depth,
        | doc_id % 2 = 0 AS has_alpha
        | FROM documents WHERE doc_id < 120 ORDER BY doc_id"""
        .stripMargin.replaceAll("\n", " "),
    // q344: the oracle REPLAYS the quality stats from the same content
    // strings (line algebra via list_transform/list_filter, alpha via
    // regexp strip, keep rule recomposed) — not asserted constants
    "q344_code_corpus" ->
      """WITH d AS (SELECT doc_id, doc_id % 6 AS f,
        |   CAST(doc_id % 10 AS VARCHAR) AS dg
        |  FROM documents WHERE doc_id < 300),
        | c AS (SELECT doc_id, f,
        |  CASE f
        |   WHEN 0 THEN '#!/usr/bin/env python' || chr(10) ||
        |     '# comment ' || dg || chr(10) || 'x = ' || dg ||
        |     chr(10) || chr(10) || 'print(x)'
        |   WHEN 1 THEN '// header ' || dg || chr(10) || 'const x = ' ||
        |     dg || ';' || chr(10) || 'console.log(x);'
        |   WHEN 2 THEN '// SPDX-License-Identifier: MIT' || chr(10) ||
        |     'fn main() { let x = ' || dg || '; }'
        |   WHEN 3 THEN '/* Licensed under the Apache License, Version 2.0 */'
        |     || chr(10) || 'class Main { int x = ' || dg || '; }'
        |   WHEN 4 THEN '// Code generated by protoc. DO NOT EDIT.' ||
        |     chr(10) || 'package p' || chr(10) || 'var x = ' || dg
        |   ELSE repeat('var a=' || dg || ';', 130) END AS content,
        |  CASE f WHEN 0 THEN '#' ELSE '//' END AS pfx,
        |  CASE f WHEN 0 THEN 'python' WHEN 1 THEN 'javascript'
        |   WHEN 2 THEN 'rust' WHEN 3 THEN 'java' WHEN 4 THEN 'go'
        |   ELSE 'javascript' END AS lang,
        |  CASE f WHEN 2 THEN 'MIT' WHEN 3 THEN 'Apache-2.0'
        |   ELSE 'none' END AS license,
        |  f = 4 AS autogen FROM d),
        | s AS (SELECT doc_id, lang, license, autogen,
        |  string_split(content, chr(10)) AS lines,
        |  length(regexp_replace(content, '[^A-Za-z]', '', 'g'))::DOUBLE
        |    / length(content) AS alpha_raw, pfx FROM c),
        | t AS (SELECT doc_id, lang, license, autogen, alpha_raw,
        |  len(lines) AS n_lines,
        |  list_max(list_transform(lines, x -> length(x))) AS max_line,
        |  list_sum(list_transform(lines, x -> length(x)))::DOUBLE
        |    / len(lines) AS mean_raw,
        |  len(list_filter(lines, x -> trim(x) <> '' AND
        |    starts_with(trim(x), pfx)))::DOUBLE /
        |  len(list_filter(lines, x -> trim(x) <> '')) AS comment_raw
        |  FROM s)
        | SELECT doc_id, lang, license, autogen,
        |  CAST(n_lines AS BIGINT) AS n_lines,
        |  CAST(max_line AS BIGINT) AS max_line,
        |  round(mean_raw, 6) AS mean_line,
        |  round(alpha_raw, 6) AS alpha_frac,
        |  round(comment_raw, 6) AS comment_frac,
        |  (max_line <= 1000 AND mean_raw <= 100.0 AND
        |   alpha_raw >= 0.25 AND NOT autogen) AS keep
        | FROM t ORDER BY doc_id"""
        .stripMargin.replaceAll("\n", " "),
    // q345: markdown extraction closed forms — heading/emphasis/link
    // stripping, fence content verbatim, rule drop + blank collapse
    "q345_markdown_text" ->
      """WITH d AS (SELECT doc_id, doc_id % 3 AS g,
        |   CAST(doc_id % 10 AS VARCHAR) AS dg
        |  FROM documents WHERE doc_id < 240)
        | SELECT doc_id,
        | CASE g
        |  WHEN 0 THEN 'Title ' || dg || chr(10) || chr(10) ||
        |   'Body bold ' || dg || ' and link ' || dg || '.' ||
        |   chr(10) || chr(10) || 'item one ' || dg || chr(10) ||
        |   'item two ' || dg
        |  WHEN 1 THEN 'Intro ' || dg || chr(10) || chr(10) ||
        |   'var x = ' || dg || '; // *keep*' || chr(10) || chr(10) ||
        |   'quote ' || dg
        |  ELSE 'Sub em ' || dg || chr(10) || chr(10) ||
        |   'Text code ' || dg || ' end' END AS text
        | FROM d ORDER BY doc_id"""
        .stripMargin.replaceAll("\n", " "),
    // q346: ZIP member closed forms (EOCD/central-dir/CRC work is
    // Spark-side; usize replayed as length of the same text)
    "q346_zip_ingest" ->
      """WITH d AS (SELECT doc_id, CAST(doc_id % 10 AS VARCHAR) AS dg
        |  FROM documents),
        | g AS (SELECT d.*, i.i AS idx FROM d, range(0, 3) i(i)),
        | e AS (SELECT doc_id, idx,
        |  CASE idx WHEN 0 THEN 'src/main.py' WHEN 1 THEN 'README.md'
        |   ELSE 'gen/auto.go' END AS name,
        |  CASE idx WHEN 0 THEN 'stored' ELSE 'deflate' END AS method,
        |  CASE idx
        |   WHEN 0 THEN '# module ' || dg || chr(10) || 'x = ' || dg ||
        |     chr(10)
        |   WHEN 1 THEN '# Readme ' || dg || chr(10) || chr(10) ||
        |     'Hello ' || dg || chr(10)
        |   ELSE '// Code generated by tool. DO NOT EDIT.' || chr(10) ||
        |     'package p' || chr(10) || 'var x = ' || dg || chr(10)
        |   END AS text FROM g)
        | SELECT doc_id, CAST(idx AS BIGINT) AS idx, name, method,
        |  CAST(length(text) AS BIGINT) AS usize, TRUE AS crc_ok, text
        | FROM e ORDER BY doc_id, idx"""
        .stripMargin.replaceAll("\n", " "),
    // q347: tar.gz member closed forms (gzip + ustar checksum work is
    // Spark-side)
    "q347_tar_ingest" ->
      """WITH d AS (SELECT doc_id, CAST(doc_id % 10 AS VARCHAR) AS dg
        |  FROM documents WHERE doc_id < 120),
        | g AS (SELECT d.*, i.i AS idx FROM d, range(0, 3) i(i)),
        | e AS (SELECT doc_id, idx,
        |  CASE idx WHEN 0 THEN 'src' WHEN 1 THEN 'src/lib.rs'
        |   ELSE 'notes.txt' END AS name,
        |  CASE idx WHEN 0 THEN 'dir' ELSE 'file' END AS type_flag,
        |  CASE idx WHEN 0 THEN ''
        |   WHEN 1 THEN '// SPDX-License-Identifier: MIT' || chr(10) ||
        |     'fn f' || dg || '() {}' || chr(10)
        |   ELSE 'note ' || dg || chr(10) END AS text FROM g)
        | SELECT doc_id, CAST(idx AS BIGINT) AS idx, name,
        |  CAST(length(text) AS BIGINT) AS size, type_flag, text
        | FROM e ORDER BY doc_id, idx"""
        .stripMargin.replaceAll("\n", " "),
    // q348: the per-language rollup recomposed from per-family
    // constants x the doc count (each doc contributes the same five
    // analyzed files; only the digit payload varies)
    "q348_code_capstone" ->
      """WITH n AS (SELECT count(*) AS c FROM documents
        |   WHERE doc_id < 600),
        | v(lang, keep_per, lines_per, mit_per) AS (VALUES
        |  ('go', 0, 3, 0), ('markdown', 1, 3, 0), ('python', 1, 2, 0),
        |  ('rust', 1, 2, 1), ('unknown', 1, 1, 0))
        | SELECT lang, CAST(c AS BIGINT) AS n_files,
        |  CAST(c * keep_per AS BIGINT) AS n_keep,
        |  CAST(c * lines_per AS BIGINT) AS n_lines,
        |  CAST(c * mit_per AS BIGINT) AS n_mit
        | FROM v, n ORDER BY lang"""
        .stripMargin.replaceAll("\n", " "),
    // q349: DOCX paragraph/run/tab/break closed forms (zip + OOXML
    // walk happens Spark-side)
    "q349_docx_text" ->
      """SELECT doc_id, CAST(3 AS BIGINT) AS n_paragraphs,
        | 'Title & heading ' || (doc_id % 10) || chr(10) ||
        | 'Cell A' || (doc_id % 10) || chr(9) ||
        | 'Cell B' || (doc_id % 10) || chr(10) ||
        | 'Line one ' || (doc_id % 10) || chr(10) ||
        | 'Line two ' || (doc_id % 10) AS text
        | FROM documents WHERE doc_id < 240 ORDER BY doc_id"""
        .stripMargin.replaceAll("\n", " "),
    // q350: EPUB spine-ordered chapter extraction closed forms
    "q350_epub_text" ->
      """SELECT doc_id, CAST(2 AS BIGINT) AS n_chapters,
        | 'Chapter one ' || (doc_id % 10) || chr(10) ||
        | 'First body ' || (doc_id % 10) || chr(10) ||
        | 'Second chapter ' || (doc_id % 10) || ' & end' AS text
        | FROM documents WHERE doc_id < 240 ORDER BY doc_id"""
        .stripMargin.replaceAll("\n", " "),
    // q351: BMP/ICO/TIFF metadata closed forms (top-down BMP heights,
    // both TIFF byte orders, the ICO 0-means-256 rule all Spark-side)
    "q351_legacy_image_meta" ->
      """SELECT doc_id,
        | CASE doc_id % 3 WHEN 0 THEN 'bmp' WHEN 1 THEN 'ico'
        |  ELSE 'tiff' END AS format,
        | CAST(CASE WHEN doc_id % 3 = 1 THEN doc_id % 256 + 1
        |  ELSE doc_id % 1920 + 1 END AS BIGINT) AS width,
        | CAST(CASE WHEN doc_id % 3 = 1 THEN doc_id % 256 + 1
        |  ELSE doc_id % 1080 + 1 END AS BIGINT) AS height,
        | CAST(CASE doc_id % 3
        |  WHEN 0 THEN CASE (doc_id // 3) % 3 WHEN 0 THEN 8
        |   WHEN 1 THEN 24 ELSE 32 END
        |  WHEN 1 THEN CASE WHEN doc_id % 2 = 0 THEN 32 ELSE 8 END
        |  ELSE CASE (doc_id // 3) % 3 WHEN 0 THEN 1 WHEN 1 THEN 8
        |   ELSE 16 END END AS BIGINT) AS bit_depth
        | FROM documents WHERE doc_id < 300 ORDER BY doc_id"""
        .stripMargin.replaceAll("\n", " "),
    // q352: notebook cell closed forms (from_json + markdown render
    // happen Spark-side; markdown cells must render, code stays raw)
    "q352_ipynb_cells" ->
      """WITH d AS (SELECT doc_id, CAST(doc_id % 10 AS VARCHAR) AS dg
        |  FROM documents WHERE doc_id < 240),
        | g AS (SELECT d.*, i.i AS idx FROM d, range(0, 3) i(i))
        | SELECT doc_id, CAST(idx AS BIGINT) AS cell_idx,
        | CASE idx WHEN 1 THEN 'code' ELSE 'markdown' END AS cell_type,
        | CASE idx
        |  WHEN 0 THEN 'Note ' || dg || chr(10) || 'Body ' || dg
        |  WHEN 1 THEN 'x = ' || dg || chr(10) || 'print(x)'
        |  ELSE 'End ' || dg END AS text
        | FROM g ORDER BY doc_id, cell_idx"""
        .stripMargin.replaceAll("\n", " "),
    // q353: (dep, kind) rollup replayed from the manifest closed
    // forms — express only on even docs, version digits make
    // n_versions a real distinct count
    "q353_deps_rollup" ->
      """WITH d AS (SELECT doc_id, doc_id % 10 AS dg,
        |   doc_id % 2 = 0 AS even FROM documents WHERE doc_id < 600)
        | SELECT * FROM (
        |  SELECT 'express' AS dep, 'runtime' AS kind,
        |   count(*) FILTER (WHERE even) AS n_uses,
        |   CAST(1 AS BIGINT) AS n_versions FROM d
        |  UNION ALL SELECT 'jest', 'dev', count(*),
        |   count(DISTINCT dg) FROM d
        |  UNION ALL SELECT 'lodash', 'runtime', count(*),
        |   count(DISTINCT dg) FROM d
        |  UNION ALL SELECT 'react', 'runtime', count(*),
        |   CAST(1 AS BIGINT) FROM d
        |  UNION ALL SELECT 'serde', 'runtime', count(*),
        |   count(DISTINCT dg) FROM d
        |  UNION ALL SELECT 'rand', 'runtime', count(*),
        |   count(DISTINCT dg) FROM d
        |  UNION ALL SELECT 'tokio', 'runtime',
        |   count(*) FILTER (WHERE even),
        |   count(DISTINCT dg) FILTER (WHERE even) FROM d
        |  UNION ALL SELECT 'criterion', 'dev', count(*),
        |   count(DISTINCT dg) FROM d)
        | ORDER BY dep, kind"""
        .stripMargin.replaceAll("\n", " "),
    // q354: per-file diff stats closed forms (file boundaries, hunk
    // validation, /dev/null deletion rule all Spark-side)
    "q354_diff_stats" ->
      """WITH d AS (SELECT doc_id, CAST(doc_id % 10 AS VARCHAR) AS dg
        |  FROM documents WHERE doc_id < 240),
        | g AS (SELECT d.*, i.i AS idx FROM d, range(0, 2) i(i))
        | SELECT doc_id, CAST(idx AS BIGINT) AS idx,
        | CASE idx WHEN 0 THEN 'src/app_' || dg || '.py'
        |  ELSE 'README.md' END AS path,
        | CAST(1 AS BIGINT) AS n_hunks,
        | CAST(CASE idx WHEN 0 THEN 2 ELSE 0 END AS BIGINT) AS n_added,
        | CAST(CASE idx WHEN 0 THEN 1 ELSE 2 END AS BIGINT) AS n_removed
        | FROM g ORDER BY doc_id, idx"""
        .stripMargin.replaceAll("\n", " "),
    // q355: EXIF closed forms — orientation/datetime from the APP1
    // TIFF walk, dims from the SOF walk past it, one hash
    "q355_exif_meta" ->
      """SELECT doc_id,
        | CAST(doc_id % 8 + 1 AS BIGINT) AS orientation,
        | '2026:08:' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') ||
        |  ' 12:' || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0') ||
        |  ':00' AS datetime,
        | CAST(doc_id % 1920 + 1 AS BIGINT) AS width,
        | CAST(doc_id % 1080 + 1 AS BIGINT) AS height
        | FROM documents WHERE doc_id < 240 ORDER BY doc_id"""
        .stripMargin.replaceAll("\n", " "),
    // q356: subtitle cue closed forms — SRT on even docs, VTT (with
    // cue ids + settings tolerated) on odd; sexagesimal carries in
    // the expected millis
    "q356_subtitles" ->
      """WITH d AS (SELECT doc_id, CAST(doc_id % 10 AS VARCHAR) AS dg,
        |   doc_id % 2 = 0 AS is_srt FROM documents WHERE doc_id < 240),
        | g AS (SELECT d.*, i.i + 1 AS idx FROM d, range(0, 3) i(i)
        |  WHERE is_srt OR i.i < 2)
        | SELECT doc_id, CAST(idx AS BIGINT) AS cue_idx,
        | CAST(CASE WHEN is_srt THEN
        |   CASE idx WHEN 1 THEN 1000 WHEN 2 THEN 3000 ELSE 60000 END
        |  ELSE CASE idx WHEN 1 THEN 5000 ELSE 10000 END
        |  END AS BIGINT) AS start_ms,
        | CAST(CASE WHEN is_srt THEN
        |   CASE idx WHEN 1 THEN 2500 WHEN 2 THEN 4000 ELSE 90250 END
        |  ELSE CASE idx WHEN 1 THEN 7100 ELSE 12000 END
        |  END AS BIGINT) AS end_ms,
        | CASE WHEN is_srt THEN
        |   CASE idx WHEN 1 THEN 'Hello ' || dg
        |    WHEN 2 THEN 'Line one ' || dg || chr(10) || 'Line two ' || dg
        |    ELSE 'End ' || dg END
        |  ELSE CASE idx WHEN 1 THEN 'Intro ' || dg
        |   ELSE 'Body ' || dg END END AS cue_text
        | FROM g ORDER BY doc_id, cue_idx"""
        .stripMargin.replaceAll("\n", " "),
    // q357: page-head metadata closed forms (commented-out decoy
    // title excluded, canonical/og absent on odd docs)
    "q357_page_meta" ->
      """SELECT doc_id,
        | 'Page & ' || (doc_id % 10) AS title,
        | 'Desc ' || (doc_id % 10) AS description,
        | CASE WHEN doc_id % 2 = 0
        |  THEN 'http://site.com/p' || (doc_id % 10) ELSE '' END
        |  AS canonical,
        | CASE WHEN doc_id % 2 = 0 THEN 'OG ' || (doc_id % 10) ELSE '' END
        |  AS og_title
        | FROM documents WHERE doc_id < 240 ORDER BY doc_id"""
        .stripMargin.replaceAll("\n", " "),
    // q358: SVG dims — attribute path (even) and viewBox path (odd)
    "q358_svg_meta" ->
      """SELECT doc_id, 'svg' AS format,
        | CAST(doc_id % 1920 + 1 AS BIGINT) AS width,
        | CAST(doc_id % 1080 + 1 AS BIGINT) AS height
        | FROM documents WHERE doc_id < 240 ORDER BY doc_id"""
        .stripMargin.replaceAll("\n", " "),
    // q359: ID3v2 tag content + the MP3 walk past it (q328's frame
    // math: MPEG-1, frames = id%10+1, 1152 samples each)
    "q359_id3_meta" ->
      """SELECT doc_id,
        | CAST(CASE doc_id % 3 WHEN 0 THEN 4 WHEN 1 THEN 3 ELSE 2 END
        |  AS BIGINT) AS version,
        | 'Track ' || (doc_id % 100) AS title,
        | 'Artist ' || (doc_id % 30) AS artist,
        | 'Album ' || (doc_id % 12) AS album,
        | CAST(CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
        |  ELSE 32000 END AS BIGINT) AS sample_rate,
        | CAST((doc_id % 10 + 1) * 1152 AS BIGINT) AS n_samples
        | FROM documents WHERE doc_id < 240 ORDER BY doc_id"""
        .stripMargin.replaceAll("\n", " "),
    // q360: the vision-pair manifest recomposed from closed forms —
    // dims/orientation from the EXIF fixtures, cue counts/chars/
    // millis from the SRT fixtures, the usable rule recombined
    "q360_vision_capstone" ->
      """WITH d AS (SELECT doc_id, doc_id % 10 AS dgn,
        |   doc_id % 8 + 1 AS orientation, doc_id % 1920 + 1 AS w,
        |   doc_id % 1080 + 1 AS h,
        |   CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS n_cues
        |  FROM documents WHERE doc_id < 600),
        | e AS (SELECT *,
        |  13 + CASE WHEN n_cues = 2 THEN 13 ELSE 0 END AS cap_chars,
        |  dgn * 1000 + 500 +
        |   CASE WHEN n_cues = 2 THEN 2000 ELSE 0 END AS cap_ms,
        |  (w >= h AND orientation = 1 AND n_cues = 2) AS usable FROM d)
        | SELECT CAST(orientation AS BIGINT) AS orientation,
        |  count(*) AS n_pairs,
        |  count(*) FILTER (WHERE usable) AS n_usable,
        |  CAST(sum(cap_chars) AS BIGINT) AS caption_chars,
        |  CAST(sum(cap_ms) AS BIGINT) AS caption_ms
        | FROM e GROUP BY orientation ORDER BY orientation"""
        .stripMargin.replaceAll("\n", " "),
    // q361: web-table grid closed forms — header detection, entity
    // cells, tag-soup implicit closure, the decoy exclusion
    "q361_html_tables" ->
      """WITH d AS (SELECT doc_id, CAST(doc_id % 10 AS VARCHAR) AS dg
        |  FROM documents WHERE doc_id < 240),
        | g AS (SELECT d.*, i.i AS r FROM d, range(0, 4) i(i))
        | SELECT doc_id,
        | CAST(CASE WHEN r = 3 THEN 1 ELSE 0 END AS BIGINT) AS table_idx,
        | CAST(CASE WHEN r = 3 THEN 0 ELSE r END AS BIGINT) AS row_idx,
        | r = 0 AS is_header,
        | CAST(CASE WHEN r = 3 THEN 1 ELSE 2 END AS BIGINT) AS n_cells,
        | CASE r WHEN 0 THEN 'Name | Val'
        |  WHEN 1 THEN 'alpha & ' || dg || ' | ' || dg
        |  WHEN 2 THEN 'beta ' || dg || ' | x' || dg
        |  ELSE 'solo ' || dg END AS row_text
        | FROM g ORDER BY doc_id, table_idx, row_idx"""
        .stripMargin.replaceAll("\n", " "),
    // q362: CID-font PDF text closed form — the Type0/Identity-H CMap
    // walk happens Spark-side; the oracle replays what every CMap
    // section form must decode to (A..Z range, Greek array form,
    // multi-unit AE-ligature bfchar, then the simple-font line)
    "q362_pdf_cid" ->
      """SELECT doc_id, '1.6' AS version, CAST(1 AS BIGINT) AS n_pages,
        | 'CID ' || chr(65 + CAST(doc_id % 26 AS INT)) || chr(10) ||
        |  chr(913 + CAST(doc_id % 3 AS INT)) || chr(198) || '!' ||
        |  chr(10) || 'plain ' || (doc_id % 100) AS text
        | FROM documents WHERE doc_id < 240 ORDER BY doc_id"""
        .stripMargin.replaceAll("\n", " "),
    // q364: ObjStm-packed PDF text closed form (the inflate + object
    // expansion + tree walk happen Spark-side)
    "q364_pdf_objstm" ->
      """SELECT doc_id, '1.5' AS version, CAST(1 AS BIGINT) AS n_pages,
        | 'ObjStm doc ' || doc_id || chr(10) ||
        |  'Packed tree ' || (doc_id % 50) AS text
        | FROM documents WHERE doc_id < 240 ORDER BY doc_id"""
        .stripMargin.replaceAll("\n", " "),
    // q365: ZIP64 member closed forms (the sentinel/locator/extra-field
    // resolution happens Spark-side)
    "q365_zip64" ->
      """WITH d AS (SELECT doc_id, CAST(doc_id % 10 AS VARCHAR) AS dg,
        |   1 + doc_id % 4 AS reps FROM documents WHERE doc_id < 240),
        | e AS (
        |  SELECT doc_id, 'META/manifest.txt' AS name, 'deflate' AS method,
        |   'manifest ' || dg || chr(10) AS text FROM d
        |  UNION ALL
        |  SELECT doc_id, 'big/data.bin', 'stored',
        |   repeat('payload ' || dg || ' ', CAST(reps AS INT)) FROM d)
        | SELECT doc_id, name, method,
        |  CAST(strlen(text) AS BIGINT) AS usize, TRUE AS crc_ok,
        |  text FROM e ORDER BY doc_id, name""".stripMargin
        .replaceAll("\n", " "),
    // q366: the tar record zoo — GNU long names, PAX overrides,
    // symlink targets — replayed closed-form
    "q366_tar_special" ->
      """WITH d AS (SELECT doc_id, CAST(doc_id % 10 AS VARCHAR) AS dg
        |  FROM documents WHERE doc_id < 240),
        | e AS (
        |  SELECT doc_id,
        |   'depth' || dg || '/' || repeat('nested/', 14) ||
        |     'gnu_long_name_' || dg || '.txt' AS name,
        |   'gnu payload ' || dg || chr(10) AS text, 'file' AS tf FROM d
        |  UNION ALL
        |  SELECT doc_id, 'pax' || dg || '/' || repeat('p/', 10) ||
        |     'pax_override_' || dg || '.md',
        |   'pax payload ' || dg || chr(10), 'file' FROM d
        |  UNION ALL
        |  SELECT doc_id, 'link' || dg, 'depth' || dg || '/target',
        |   'symlink' FROM d
        |  UNION ALL
        |  SELECT doc_id, 'plain' || dg || '.txt',
        |   'plain ' || dg || chr(10), 'file' FROM d)
        | SELECT doc_id, name,
        |  CAST(CASE WHEN tf = 'symlink' THEN 0
        |   ELSE strlen(text) END AS BIGINT) AS size,
        |  tf AS type_flag, text
        | FROM e ORDER BY doc_id, name""".stripMargin
        .replaceAll("\n", " "),
    // q367: FLAC VORBIS_COMMENT closed forms (block walk Spark-side)
    "q367_flac_tags" ->
      """SELECT doc_id, 'graft ' || doc_id AS vendor,
        | 'Flac Track ' || (doc_id % 100) AS title,
        | 'Flac Artist ' || (doc_id % 30) AS artist,
        | 'Flac Album ' || (doc_id % 12) AS album,
        | CAST(4 AS BIGINT) AS n_comments,
        | CAST(CASE doc_id % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |  WHEN 2 THEN 24000 WHEN 3 THEN 44100 ELSE 48000 END AS BIGINT)
        |  AS sample_rate
        | FROM documents WHERE doc_id < 240 ORDER BY doc_id"""
        .stripMargin.replaceAll("\n", " "),
    // q368: OpusTags closed forms (Ogg page walk + shared Vorbis
    // comment parse Spark-side); duration from the q331 closed form
    "q368_opus_tags" ->
      """SELECT doc_id, 'graft ' || doc_id AS vendor,
        | 'Opus Track ' || (doc_id % 100) AS title,
        | 'Opus Artist ' || (doc_id % 30) AS artist,
        | CAST(3 AS BIGINT) AS n_comments,
        | CAST((doc_id % 10 + 1) * 20 AS BIGINT) AS duration_ms
        | FROM documents WHERE doc_id < 240 ORDER BY doc_id"""
        .stripMargin.replaceAll("\n", " "),
    // q369: ASS subtitle cue closed forms (the section/Format/override
    // parsing happens Spark-side)
    "q369_ass_subs" ->
      """WITH d AS (SELECT doc_id, CAST(doc_id % 10 AS VARCHAR) AS dg
        |  FROM documents WHERE doc_id < 240),
        | e AS (
        |  SELECT doc_id, 1 AS cue_idx, 1000 AS start_ms, 2500 AS end_ms,
        |   'Styled hello ' || dg AS cue_text FROM d
        |  UNION ALL
        |  SELECT doc_id, 2, 60250, 120000,
        |   'Line one ' || dg || chr(10) || 'Line two, with comma ' || dg
        |   FROM d)
        | SELECT doc_id, CAST(cue_idx AS BIGINT) AS cue_idx,
        |  CAST(start_ms AS BIGINT) AS start_ms,
        |  CAST(end_ms AS BIGINT) AS end_ms, cue_text
        | FROM e ORDER BY doc_id, cue_idx""".stripMargin
        .replaceAll("\n", " "),
    // q370: EPUB OPF metadata closed forms (container/OPF walk
    // Spark-side)
    "q370_epub_meta" ->
      """SELECT doc_id, 'Book & Tale ' || (doc_id % 10) AS title,
        | 'Author ' || (doc_id % 10) AS creator, 'en' AS language,
        | CAST(2 AS BIGINT) AS n_spine
        | FROM documents WHERE doc_id < 240 ORDER BY doc_id"""
        .stripMargin.replaceAll("\n", " "),
    // q371: XLSX workbook summary closed forms (the SpreadsheetML walk
    // happens Spark-side): workbook-ordered sheets, all five cell
    // types, a rich-text shared string, self-closing cells excluded
    "q371_xlsx_cells" ->
      """SELECT doc_id, CAST(2 AS BIGINT) AS n_sheets,
        | CAST(4 AS BIGINT) AS n_rows, CAST(10 AS BIGINT) AS n_cells,
        | CAST(3 AS BIGINT) AS n_shared,
        | 'Name & id ' || (doc_id % 10) || chr(10) ||
        |  'City ' || (doc_id % 7) || chr(10) ||
        |  'Inline ' || (doc_id % 10) || chr(10) ||
        |  'F' || (doc_id % 10) || chr(10) ||
        |  'Sheet two ' || (doc_id % 10) || chr(10) ||
        |  'Region ' || (doc_id % 5) AS text_cells,
        | round((doc_id % 100) + (doc_id % 9) + 7.5, 2) AS num_sum
        | FROM documents ORDER BY doc_id"""
        .stripMargin.replaceAll("\n", " "),
    // q372: PPTX slide text closed forms — slide ORDER comes from the
    // sldIdLst (the fixture reverses the filename order on purpose)
    "q372_pptx_text" ->
      """SELECT doc_id, CAST(2 AS BIGINT) AS n_slides,
        | CAST(3 AS BIGINT) AS n_paras,
        | 'Deck & notes ' || (doc_id % 10) || chr(10) ||
        |  'Point ' || (doc_id % 5) || ' extra' || chr(10) ||
        |  'Closing ' || (doc_id % 7) AS text
        | FROM documents WHERE doc_id < 240 ORDER BY doc_id"""
        .stripMargin.replaceAll("\n", " "),
    // q373: JSON-LD + OpenGraph entity rows — closed forms; the decoy
    // (comment/inline-JS), invalid-first, CDATA, and array-wrap lanes
    // all resolve to the same valid block Spark-side
    "q373_jsonld" ->
      """SELECT doc_id, 'OG ' || (doc_id % 10) AS og_title,
        | 'article' AS og_type,
        | 'http://img.site/p' || (doc_id % 10) || '.png' AS og_image,
        | CASE WHEN doc_id % 7 = 0 THEN '' ELSE 'Article' END AS ld_type,
        | CASE WHEN doc_id % 7 = 0 THEN ''
        |  ELSE 'Story ' || (doc_id % 10) END AS ld_name,
        | CASE WHEN doc_id % 7 = 0 THEN ''
        |  ELSE 'Writer ' || (doc_id % 30) END AS ld_author,
        | CASE WHEN doc_id % 7 = 0 THEN ''
        |  ELSE '2024-0' || (doc_id % 9 + 1) || '-01' END AS ld_date
        | FROM documents WHERE doc_id < 240 ORDER BY doc_id"""
        .stripMargin.replaceAll("\n", " "),
    // q374: Ogg Vorbis identification-header closed forms (the page
    // walk + CRC happen Spark-side); rates divisible by 100 make the
    // sample and duration math exact
    "q374_vorbis_id" ->
      """WITH d AS (SELECT doc_id,
        |  CASE doc_id % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |   WHEN 2 THEN 24000 WHEN 3 THEN 44100 ELSE 48000 END AS rate,
        |  doc_id % 10 + 1 AS dn FROM documents WHERE doc_id < 240)
        | SELECT doc_id, CAST(doc_id % 2 + 1 AS BIGINT) AS channels,
        | CAST(rate AS BIGINT) AS sample_rate,
        | CAST((doc_id % 8 + 1) * 32000 AS BIGINT) AS bitrate_nominal,
        | CAST(256 AS BIGINT) AS blocksize0,
        | CAST(2048 AS BIGINT) AS blocksize1,
        | CAST(dn * rate // 100 AS BIGINT) AS n_samples,
        | CAST(dn * 10 AS BIGINT) AS duration_ms
        | FROM d ORDER BY doc_id""".stripMargin.replaceAll("\n", " "),
    // q375: Matroska/WebM EBML closed forms — doctype/timescale by
    // parity, duration in ms after the timescale rebase, per-track
    // type census with codecs in track order
    "q375_mkv_meta" ->
      """WITH d AS (SELECT doc_id, doc_id % 10 AS m10, doc_id % 3 AS m3,
        |   doc_id % 2 AS m2 FROM documents WHERE doc_id < 240),
        | g AS (SELECT d.*, t.t FROM d, range(0, 3) t(t) WHERE t < m3 + 1),
        | f AS (SELECT doc_id, t, (doc_id + t) % 3 AS ty FROM g),
        | a AS (SELECT doc_id,
        |   count(*) FILTER (WHERE ty = 0) AS n_video,
        |   count(*) FILTER (WHERE ty = 1) AS n_audio,
        |   count(*) FILTER (WHERE ty = 2) AS n_subs,
        |   string_agg(CASE ty WHEN 0 THEN 'V_VP9' WHEN 1 THEN 'A_OPUS'
        |    ELSE 'S_TEXT/UTF8' END, ',' ORDER BY t) AS codecs
        |  FROM f GROUP BY doc_id)
        | SELECT d.doc_id,
        | CASE WHEN m2 = 0 THEN 'matroska' ELSE 'webm' END AS doctype,
        | CAST(CASE WHEN m2 = 0 THEN 1000000 ELSE 500000 END AS BIGINT)
        |  AS timescale,
        | CAST((m10 + 1) * 1000 * (1 + m2) AS BIGINT) AS duration_ms,
        | CAST(n_video AS BIGINT) AS n_video,
        | CAST(n_audio AS BIGINT) AS n_audio,
        | CAST(n_subs AS BIGINT) AS n_subs, codecs
        | FROM d JOIN a USING (doc_id) ORDER BY doc_id"""
        .stripMargin.replaceAll("\n", " "),
    // q377: EML/MIME closed forms — subjects carry the RFC 2047
    // decodes (B, Q with underscore-space, adjacent-word joining),
    // texts the QP soft-break and base64+html paths
    "q377_eml_parse" ->
      """WITH d AS (SELECT doc_id, doc_id % 10 AS m, doc_id % 3 AS k
        |  FROM documents WHERE doc_id < 240)
        | SELECT doc_id,
        | 'user' || (doc_id % 30) || '@example.com' AS from_addr,
        | CASE WHEN k = 0 THEN 'list' || (doc_id % 7) ||
        |   '@example.org, second@example.org'
        |  ELSE 'list' || (doc_id % 7) || '@example.org' END AS to_addr,
        | CASE k WHEN 0 THEN 'Plain note ' || m
        |  WHEN 1 THEN 'Réport ' || m
        |  ELSE 'Résumé ' || m || ' final' END AS subject,
        | CAST(CASE k WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 2 END AS BIGINT)
        |  AS n_parts,
        | CAST(CASE k WHEN 1 THEN 1 ELSE 0 END AS BIGINT)
        |  AS n_attachments,
        | CASE k WHEN 0 THEN 'Hello body ' || m || chr(10) || 'Bye ' || m
        |  WHEN 1 THEN 'Café one ' || m || ' two' || chr(10) ||
        |   'Para ' || m || chr(10) || 'End ' || m
        |  ELSE 'Alt body ' || m || chr(10) || 'Html alt ' || m
        |  END AS text
        | FROM d ORDER BY doc_id""".stripMargin.replaceAll("\n", " "),
    // q378: ODT closed forms (the content.xml walk happens Spark-side)
    "q378_odt_text" ->
      """SELECT doc_id, CAST(3 AS BIGINT) AS n_paragraphs,
        | 'Odt title ' || (doc_id % 10) AS title,
        | 'Heading ' || (doc_id % 10) || chr(10) ||
        |  'Cell' || chr(9) || 'styled ' || (doc_id % 10) || chr(10) ||
        |  'One & two ' || (doc_id % 10) || chr(10) ||
        |  'three four ' || (doc_id % 10) AS text
        | FROM documents WHERE doc_id < 240 ORDER BY doc_id"""
        .stripMargin.replaceAll("\n", " "),
    // q379: RTF closed forms — destinations vanish, escapes decode,
    // the \uc fallback char is skipped
    "q379_rtf_text" ->
      """WITH d AS (SELECT doc_id,
        |  'Café doc ' || (doc_id % 10) || chr(10) ||
        |  'Bold ' || (doc_id % 10) || ' and é plain ' || (doc_id % 7) ||
        |  chr(10) || 'Col A' || (doc_id % 10) || chr(9) ||
        |  'Col B' || (doc_id % 10) || chr(10) ||
        |  'Brace {x' || (doc_id % 10) || '} end' AS text
        |  FROM documents WHERE doc_id < 240)
        | SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n_chars
        | FROM d ORDER BY doc_id""".stripMargin.replaceAll("\n", " "),
    // q380: sfnt font-metadata closed forms — Windows name records
    // win over the Mac decoys Spark-side
    "q380_font_meta" ->
      """SELECT doc_id,
        | CASE WHEN doc_id % 4 = 3 THEN 'otf' ELSE 'ttf' END AS format,
        | CAST(3 AS BIGINT) AS n_tables,
        | 'Graft Sans ' || (doc_id % 10) AS family,
        | CASE doc_id % 3 WHEN 0 THEN 'Regular' WHEN 1 THEN 'Bold'
        |  ELSE 'Italic' END AS subfamily,
        | CAST(doc_id % 500 + 10 AS BIGINT) AS n_glyphs,
        | CAST(CASE WHEN doc_id % 2 = 0 THEN 1000 ELSE 2048 END
        |  AS BIGINT) AS units_per_em
        | FROM documents WHERE doc_id < 240 ORDER BY doc_id"""
        .stripMargin.replaceAll("\n", " "),
    // q381: Avro OCF closed forms — 2 blocks of id%3+1 records each,
    // record index global across blocks, codec by parity
    "q381_avro_ingest" ->
      """WITH d AS (SELECT doc_id, doc_id % 3 + 1 AS pb
        |  FROM documents),
        | g AS (SELECT doc_id, t.t AS i FROM d, range(0, 6) t(t)
        |  WHERE t < 2 * pb)
        | SELECT doc_id,
        | CASE WHEN doc_id % 2 = 1 THEN 'deflate' ELSE 'null' END AS codec,
        | CAST(2 AS BIGINT) AS n_blocks, CAST(i AS BIGINT) AS rec_idx,
        | 'item ' || (doc_id % 10) || '-' || i AS name,
        | CAST(doc_id * 10 + i AS BIGINT) AS n,
        | CAST(doc_id % 7 + 0.5 AS DOUBLE) AS score,
        | (doc_id + i) % 2 = 0 AS ok
        | FROM g ORDER BY doc_id, rec_idx"""
        .stripMargin.replaceAll("\n", " "),
    // q382: iCalendar closed forms — two events per doc, folded
    // escaped summary, VALARM excluded, durations from the UTC stamps
    "q382_ics_events" ->
      """WITH d AS (SELECT doc_id, doc_id % 10 AS m, doc_id % 12 AS h,
        |   (doc_id % 4 + 1) * 10 AS dur, 10 + doc_id % 8 AS h2
        |  FROM documents WHERE doc_id < 240),
        | e AS (
        |  SELECT doc_id, 0 AS ev_idx,
        |   'Standup, team ' || m || ' and planning ' || m AS summary,
        |   'Room ' || m AS location,
        |   '2024-03-01 ' || lpad(CAST(h AS VARCHAR), 2, '0') ||
        |    ':00:00' AS start_ts,
        |   CAST(dur AS BIGINT) AS duration_min FROM d
        |  UNION ALL
        |  SELECT doc_id, 1, 'Review ' || (doc_id % 7), '',
        |   '2024-03-02 ' || h2 || ':00:00', CAST(30 AS BIGINT) FROM d)
        | SELECT doc_id, CAST(ev_idx AS BIGINT) AS ev_idx, summary,
        |  location, start_ts, duration_min
        | FROM e ORDER BY doc_id, ev_idx"""
        .stripMargin.replaceAll("\n", " "),
    // q383: protobuf wire census closed forms — id%5+1 varints, one
    // fixed64/fixed32, the string that must NOT probe as nested, the
    // 4-byte inner message that must
    "q383_proto_census" ->
      """WITH d AS (SELECT doc_id, doc_id % 5 + 1 AS nv
        |  FROM documents WHERE doc_id < 240)
        | SELECT doc_id, CAST(nv + 4 AS BIGINT) AS n_fields,
        | CAST(nv AS BIGINT) AS n_varint, CAST(1 AS BIGINT) AS n_fixed64,
        | CAST(2 AS BIGINT) AS n_len, CAST(1 AS BIGINT) AS n_fixed32,
        | CAST(1 AS BIGINT) AS n_nested, CAST(12 AS BIGINT) AS max_field,
        | CAST(nv * doc_id * 3 + nv * (nv + 1) / 2 AS BIGINT)
        |  AS varint_sum,
        | CAST(10 AS BIGINT) AS len_bytes
        | FROM d ORDER BY doc_id""".stripMargin.replaceAll("\n", " "),
    // q384: sqlite_master closed forms — id%3+1 tables, the index row
    // filtered Spark-side, rootpage k+2
    "q384_sqlite_master" ->
      """WITH d AS (SELECT doc_id, doc_id % 10 AS m, doc_id % 3 + 1 AS nt
        |  FROM documents WHERE doc_id < 240),
        | g AS (SELECT doc_id, m, nt, t.t AS k FROM d, range(0, 3) t(t)
        |  WHERE t < nt)
        | SELECT doc_id, CAST(512 AS BIGINT) AS page_size,
        | CAST(nt + 2 AS BIGINT) AS n_pages, 'utf-8' AS encoding,
        | CAST(k AS BIGINT) AS tbl_idx,
        | 't' || k || '_' || m AS name,
        | CAST(k + 2 AS BIGINT) AS rootpage,
        | 'CREATE TABLE t' || k || '_' || m || ' (a INT, b TEXT)' AS sql
        | FROM g ORDER BY doc_id, tbl_idx"""
        .stripMargin.replaceAll("\n", " "),
    // q385: zstd/LZ4/XZ frame-header closed forms — FCS widths, the
    // 2-byte +256 bias, window exponents, checksum kinds
    "q385_frame_meta" ->
      """WITH d AS (SELECT doc_id, doc_id % 3 AS f, doc_id % 4 AS k4,
        |   doc_id % 2 AS k2, doc_id % 8 AS k8
        |  FROM documents WHERE doc_id < 240)
        | SELECT doc_id,
        | CASE f WHEN 0 THEN 'zstd' WHEN 1 THEN 'lz4' ELSE 'xz' END
        |  AS format,
        | CAST(CASE
        |  WHEN f = 0 AND k4 = 0 THEN -1
        |  WHEN f = 0 AND k4 = 1 THEN doc_id % 200
        |  WHEN f = 0 AND k4 = 2 THEN doc_id + 256
        |  WHEN f = 0 THEN doc_id * 1000 + 5
        |  WHEN f = 1 AND k2 = 1 THEN doc_id * 777 + 1
        |  ELSE -1 END AS BIGINT) AS content_size,
        | CAST(CASE
        |  WHEN f = 0 AND k4 = 1 THEN doc_id % 200
        |  WHEN f = 0 THEN (CAST(1 AS BIGINT) << (k8 + 10))
        |  WHEN f = 1 THEN (CAST(1 AS BIGINT) << (2 * k4 + 16))
        |  ELSE -1 END AS BIGINT) AS window_size,
        | CASE
        |  WHEN f = 0 THEN
        |   (CASE WHEN k2 = 0 THEN 'xxh64' ELSE 'none' END)
        |  WHEN f = 1 THEN
        |   (CASE WHEN k2 = 1 THEN 'xxh32' ELSE 'none' END)
        |  ELSE (CASE k4 WHEN 0 THEN 'none' WHEN 1 THEN 'crc32'
        |   WHEN 2 THEN 'crc64' ELSE 'sha256' END)
        | END AS checksum,
        | (f = 0 OR f = 2 OR k4 = 1) AS block_independent
        | FROM d ORDER BY doc_id""".stripMargin.replaceAll("\n", " "),
    // q386: mbox closed forms — three synthEml shapes per file at
    // shifted ids, the >From unquote visible in message 0's text
    "q386_mbox_parse" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 240),
        | g AS (SELECT doc_id, t.t AS k, doc_id + t.t AS j
        |  FROM d, range(0, 3) t(t)),
        | f AS (SELECT doc_id, k, j % 3 AS s, j % 10 AS m,
        |  j % 30 AS u FROM g)
        | SELECT doc_id, CAST(k AS BIGINT) AS msg_idx,
        | 'user' || u || '@example.com' AS from_addr,
        | CASE s WHEN 0 THEN 'Plain note ' || m
        |  WHEN 1 THEN 'Réport ' || m
        |  ELSE 'Résumé ' || m || ' final' END AS subject,
        | CAST(CASE s WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 2 END AS BIGINT)
        |  AS n_parts,
        | CAST(CASE s WHEN 1 THEN 1 ELSE 0 END AS BIGINT)
        |  AS n_attachments,
        | CASE s
        |  WHEN 0 THEN (CASE WHEN k = 0 THEN 'From the start' || chr(10)
        |    ELSE '' END) || 'Hello body ' || m || chr(10) || 'Bye ' || m
        |  WHEN 1 THEN 'Café one ' || m || ' two' || chr(10) ||
        |   'Para ' || m || chr(10) || 'End ' || m
        |  ELSE 'Alt body ' || m || chr(10) || 'Html alt ' || m
        | END AS text
        | FROM f ORDER BY doc_id, msg_idx"""
        .stripMargin.replaceAll("\n", " "),
    // q387: WOFF1 wraps the q380 sfnt — identical closed forms
    "q387_woff_meta" ->
      """SELECT doc_id,
        | CASE WHEN doc_id % 4 = 3 THEN 'otf' ELSE 'ttf' END AS format,
        | CAST(3 AS BIGINT) AS n_tables,
        | 'Graft Sans ' || (doc_id % 10) AS family,
        | CASE doc_id % 3 WHEN 0 THEN 'Regular' WHEN 1 THEN 'Bold'
        |  ELSE 'Italic' END AS subfamily,
        | CAST(doc_id % 500 + 10 AS BIGINT) AS n_glyphs,
        | CAST(CASE WHEN doc_id % 2 = 0 THEN 1000 ELSE 2048 END
        |  AS BIGINT) AS units_per_em
        | FROM documents WHERE doc_id < 240 ORDER BY doc_id"""
        .stripMargin.replaceAll("\n", " "),
    // q388: vCard closed forms — folded FN, escaped-semicolon ORG,
    // TYPE params skipped, first-wins
    "q388_vcards" ->
      """WITH d AS (SELECT doc_id, doc_id % 10 AS m, doc_id % 7 AS k7,
        |   doc_id % 5 AS k5 FROM documents WHERE doc_id < 240),
        | e AS (
        |  SELECT doc_id, 0 AS card_idx, 'Fam' || m AS family,
        |   'Giv' || k7 AS given, 'Giv' || k7 || ' Fam' || m AS fn,
        |   'g' || m || '@corp.example' AS email,
        |   '+1-555-010' || m AS tel, 'Acme; Sons ' || m AS org FROM d
        |  UNION ALL
        |  SELECT doc_id, 1, 'Solo' || k5, '', 'Solo' || k5, '', '', ''
        |   FROM d)
        | SELECT doc_id, CAST(card_idx AS BIGINT) AS card_idx, family,
        |  given, fn, email, tel, org
        | FROM e ORDER BY doc_id, card_idx"""
        .stripMargin.replaceAll("\n", " "),
    // q389: git loose-object closed forms — the commit size is pinned
    // by REBUILDING the content string oracle-side
    "q389_git_objects" ->
      """WITH d AS (SELECT doc_id, doc_id % 3 AS s, doc_id % 10 AS m,
        |   doc_id % 30 AS u, doc_id % 7 AS k7, doc_id % 20 + 1 AS nb,
        |   doc_id % 4 + 1 AS nt, (doc_id % 5) % 3 AS np
        |  FROM documents WHERE doc_id < 240),
        | c AS (SELECT *,
        |   repeat(printf('%08x', doc_id * 1000003 + 1), 5) AS tsha,
        |   'Dev ' || u || ' <d' || u || '@example.com>' AS auth,
        |   1700000000 + doc_id * 60 AS ep FROM d),
        | cc AS (SELECT *,
        |   'tree ' || tsha || chr(10) ||
        |   (CASE np WHEN 0 THEN '' WHEN 1 THEN 'parent ' ||
        |     repeat(printf('%08x', doc_id * 1000003 + 100), 5) || chr(10)
        |    ELSE 'parent ' ||
        |     repeat(printf('%08x', doc_id * 1000003 + 100), 5) ||
        |     chr(10) || 'parent ' ||
        |     repeat(printf('%08x', doc_id * 1000003 + 101), 5) ||
        |     chr(10) END) ||
        |   'author ' || auth || ' ' || ep || ' +0000' || chr(10) ||
        |   'committer ' || auth || ' ' || ep || ' +0000' || chr(10) ||
        |   chr(10) || 'feat: change ' || m || chr(10) || chr(10) ||
        |   'body detail ' || k7 || chr(10) AS cmt,
        |   CASE nt WHEN 1 THEN '100644 file0.txt'
        |    WHEN 2 THEN '100644 file0.txt' || chr(10) || '40000 dir1'
        |    WHEN 3 THEN '100644 file0.txt' || chr(10) || '40000 dir1' ||
        |     chr(10) || '100644 file2.txt'
        |    ELSE '100644 file0.txt' || chr(10) || '40000 dir1' ||
        |     chr(10) || '100644 file2.txt' || chr(10) || '40000 dir3'
        |    END AS tlist FROM c)
        | SELECT doc_id,
        | CASE s WHEN 0 THEN 'blob' WHEN 1 THEN 'commit' ELSE 'tree' END
        |  AS obj_type,
        | CAST(CASE s WHEN 0 THEN 12 * nb + greatest(0, nb - 9)
        |   WHEN 1 THEN length(cmt)
        |   ELSE CASE nt WHEN 1 THEN 37 WHEN 2 THEN 68 WHEN 3 THEN 105
        |    ELSE 136 END END AS BIGINT) AS size,
        | CAST(CASE s WHEN 0 THEN nb ELSE 0 END AS BIGINT) AS n_lines,
        | CASE s WHEN 1 THEN tsha ELSE '' END AS tree_sha,
        | CAST(CASE s WHEN 1 THEN np ELSE 0 END AS BIGINT) AS n_parents,
        | CASE s WHEN 1 THEN auth ELSE '' END AS author,
        | CAST(CASE s WHEN 1 THEN ep ELSE 0 END AS BIGINT)
        |  AS author_epoch,
        | CASE s WHEN 1 THEN 'feat: change ' || m ELSE '' END AS message,
        | CAST(CASE s WHEN 2 THEN nt ELSE 0 END AS BIGINT) AS n_entries,
        | CASE s WHEN 2 THEN tlist ELSE '' END AS listing
        | FROM cc ORDER BY doc_id""".stripMargin.replaceAll("\n", " "),
    // q390: PCAP census closed forms — per-packet sizes summed over a
    // range, TCP/UDP/ARP cycling by packet index
    "q390_pcap_census" ->
      """WITH d AS (SELECT doc_id, doc_id % 10 + 5 AS n,
        |   doc_id % 5 + 1 AS step FROM documents WHERE doc_id < 240),
        | g AS (SELECT doc_id, n, step, t.t AS k FROM d, range(0, 15) t(t)
        |  WHERE t < n),
        | p AS (SELECT doc_id, n, step, k,
        |   14 + (CASE WHEN k % 3 = 2 THEN 0 ELSE 20 END) +
        |    ((doc_id + k) % 20 + 6) AS incl FROM g),
        | a AS (SELECT doc_id, min(n) AS n, min(step) AS step,
        |   sum(incl) AS tb,
        |   count(*) FILTER (WHERE k % 3 = 0) AS tcp,
        |   count(*) FILTER (WHERE k % 3 = 1) AS udp,
        |   count(*) FILTER (WHERE k % 3 = 2) AS arp
        |  FROM p GROUP BY doc_id)
        | SELECT doc_id,
        | CASE WHEN doc_id % 2 = 0 THEN 'little' ELSE 'big' END AS endian,
        | CASE WHEN doc_id % 4 = 3 THEN 'ns' ELSE 'us' END AS resolution,
        | CAST(1 AS BIGINT) AS link_type, CAST(n AS BIGINT) AS n_packets,
        | CAST(tb AS BIGINT) AS total_bytes,
        | CAST(tcp + udp AS BIGINT) AS n_ipv4,
        | CAST(tcp AS BIGINT) AS n_tcp, CAST(udp AS BIGINT) AS n_udp,
        | CAST(arp AS BIGINT) AS n_arp, CAST(0 AS BIGINT) AS n_other,
        | CAST((n - 1) * step AS BIGINT) AS span_ms
        | FROM a ORDER BY doc_id""".stripMargin.replaceAll("\n", " "),
    // q391: PO catalog closed forms — header excluded, fuzzy not
    // translated, plural counted once, continuations joined
    "q391_po_stats" ->
      """SELECT doc_id,
        | CAST(3 + doc_id % 3 AS BIGINT) AS n_entries,
        | CAST(2 + doc_id % 3 AS BIGINT) AS n_translated,
        | CAST(1 AS BIGINT) AS n_fuzzy, CAST(1 AS BIGINT) AS n_plural,
        | 'Hello world ' || (doc_id % 10) || chr(10) AS first_id,
        | 'Hola mundo ' || (doc_id % 10) || chr(10) AS first_str
        | FROM documents WHERE doc_id < 240 ORDER BY doc_id"""
        .stripMargin.replaceAll("\n", " "),
    // q392: parquet footer closed forms — per (row-group, column)
    // codec cycle, sizes, INT64 stats on even columns only; the
    // thrift compact decode happens Spark-side
    "q392_parquet_footer" ->
      """WITH d AS (SELECT doc_id, doc_id % 3 + 2 AS k,
        |   doc_id % 2 + 1 AS g, doc_id % 50 + 10 AS rpg
        |  FROM documents WHERE doc_id < 240),
        | rj AS (SELECT d.*, r.r AS rg FROM d, range(0, 2) r(r)
        |  WHERE r < g),
        | cj AS (SELECT rj.*, j.j AS j FROM rj, range(0, 4) j(j)
        |  WHERE j < k)
        | SELECT doc_id, CAST(1 AS BIGINT) AS version,
        | CAST(g * rpg AS BIGINT) AS n_rows, CAST(g AS BIGINT) AS n_groups,
        | CAST(k AS BIGINT) AS n_leaves,
        | 'graft-writer 1.' || (doc_id % 10) AS created_by,
        | CAST(rg AS BIGINT) AS rg, 'c' || j AS path,
        | CASE (doc_id + j) % 3 WHEN 0 THEN 'uncompressed'
        |  WHEN 1 THEN 'snappy' ELSE 'gzip' END AS codec,
        | CAST(rpg AS BIGINT) AS num_values,
        | CAST(1000 + 10 * j + rg + doc_id % 100 - (j + 1) AS BIGINT)
        |  AS compressed,
        | CAST(1000 + 10 * j + rg + doc_id % 100 AS BIGINT)
        |  AS uncompressed,
        | CASE WHEN j % 2 = 0 THEN CAST(doc_id + rg AS BIGINT)
        |  ELSE NULL END AS min_i64,
        | CASE WHEN j % 2 = 0 THEN CAST(doc_id + rg + rpg - 1 AS BIGINT)
        |  ELSE NULL END AS max_i64,
        | CASE WHEN j % 2 = 0 THEN CAST((doc_id + j) % 3 AS BIGINT)
        |  ELSE NULL END AS null_count
        | FROM cj ORDER BY doc_id, rg, path"""
        .stripMargin.replaceAll("\n", " "),
    // q393: pcapng closed forms — the q390 packet mix on interface 0
    // plus the second-interface "other" packets every 3rd id; the
    // block/option walk happens Spark-side
    "q393_pcapng_census" ->
      """WITH d AS (SELECT doc_id, doc_id % 10 + 5 AS n,
        |   doc_id % 5 + 1 AS step, doc_id % 3 = 0 AS two
        |  FROM documents WHERE doc_id < 240),
        | g AS (SELECT doc_id, n, step, two, t.t AS k
        |  FROM d, range(0, 15) t(t) WHERE t < n),
        | p AS (SELECT doc_id, n, step, two, k,
        |   14 + (CASE WHEN k % 3 = 2 THEN 0 ELSE 20 END) +
        |    ((doc_id + k) % 20 + 6) AS incl FROM g),
        | a AS (SELECT doc_id, min(n) AS n, min(step) AS step,
        |   bool_or(two) AS two, sum(incl) AS tb,
        |   count(*) FILTER (WHERE k % 3 = 0) AS tcp,
        |   count(*) FILTER (WHERE k % 3 = 1) AS udp,
        |   count(*) FILTER (WHERE k % 3 = 2) AS arp
        |  FROM p GROUP BY doc_id)
        | SELECT doc_id,
        | CASE WHEN doc_id % 2 = 0 THEN 'little' ELSE 'big' END AS endian,
        | CASE WHEN doc_id % 4 = 3 THEN 'ns' ELSE 'us' END AS resolution,
        | CAST(CASE WHEN two THEN 2 ELSE 1 END AS BIGINT) AS n_interfaces,
        | CAST(1 AS BIGINT) AS link_type,
        | CAST(n + CASE WHEN two THEN 2 ELSE 0 END AS BIGINT) AS n_packets,
        | CAST(tb + CASE WHEN two THEN 32 ELSE 0 END AS BIGINT)
        |  AS total_bytes,
        | CAST(tcp + udp AS BIGINT) AS n_ipv4,
        | CAST(tcp AS BIGINT) AS n_tcp, CAST(udp AS BIGINT) AS n_udp,
        | CAST(arp AS BIGINT) AS n_arp,
        | CAST(CASE WHEN two THEN 2 ELSE 0 END AS BIGINT) AS n_other,
        | CAST((n - 1) * step AS BIGINT) AS span_ms
        | FROM a ORDER BY doc_id"""
        .stripMargin.replaceAll("\n", " "),
    // q394: CBOR census closed forms — per-entry kind cycle summed
    // over e = id%3+2 entries + the neg entry + the 5th-id tag wrap
    "q394_cbor_census" ->
      """WITH d AS (SELECT doc_id, doc_id % 3 + 2 AS e,
        |   CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS tag,
        |   doc_id % 2 + 1 AS an FROM documents WHERE doc_id < 240),
        | g AS (SELECT d.*, j.j FROM d, range(0, 4) j(j) WHERE j < e),
        | per AS (SELECT doc_id, j,
        |   CASE j % 4 WHEN 0 THEN 1 WHEN 2 THEN an ELSE 0 END AS vi,
        |   CASE j % 4 WHEN 0 THEN doc_id * 10 + j
        |    WHEN 2 THEN 2 * an + an * (an - 1) // 2 ELSE 0 END AS vs,
        |   CASE j % 4 WHEN 1 THEN 1 ELSE 0 END AS vstr,
        |   CASE j % 4 WHEN 1 THEN 4 ELSE 0 END AS vstrb,
        |   CASE j % 4 WHEN 2 THEN 1 ELSE 0 END AS va,
        |   CASE j % 4 WHEN 3 THEN 1 ELSE 0 END AS vb,
        |   2 + CASE j % 4 WHEN 2 THEN an ELSE 0 END AS vn
        |  FROM g),
        | agg AS (SELECT doc_id, sum(vi) AS vi, sum(vs) AS vs,
        |   sum(vstr) AS vstr, sum(vstrb) AS vstrb, sum(va) AS va,
        |   sum(vb) AS vb, sum(vn) AS vn FROM per GROUP BY doc_id)
        | SELECT d.doc_id,
        | CASE WHEN tag = 1 THEN 'tag' ELSE 'map' END AS top_type,
        | CAST(tag + 1 + vn + 2 AS BIGINT) AS n_nodes,
        | CAST(vi + 1 AS BIGINT) AS n_int,
        | CAST(e + vstr + 1 AS BIGINT) AS n_str,
        | CAST(va AS BIGINT) AS n_arr, CAST(1 AS BIGINT) AS n_map,
        | CAST(vb AS BIGINT) AS n_bool, CAST(tag AS BIGINT) AS n_tag,
        | CAST(CASE WHEN e >= 3 THEN 3 ELSE 2 END + tag AS BIGINT)
        |  AS max_depth,
        | CAST(vs - (doc_id % 100 + 1) AS BIGINT) AS int_sum,
        | CAST(2 * e + vstrb + 3 AS BIGINT) AS str_bytes
        | FROM d JOIN agg USING (doc_id) ORDER BY doc_id"""
        .stripMargin.replaceAll("\n", " "),
    // q395: MessagePack census closed forms — same entry cycle as
    // CBOR plus the always-present float64 and the 4th-id fixext
    "q395_msgpack_census" ->
      """WITH d AS (SELECT doc_id, doc_id % 3 + 2 AS e,
        |   CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS ext,
        |   doc_id % 2 + 1 AS an FROM documents WHERE doc_id < 240),
        | g AS (SELECT d.*, j.j FROM d, range(0, 4) j(j) WHERE j < e),
        | per AS (SELECT doc_id, j,
        |   CASE j % 4 WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 2 THEN an
        |    ELSE 0 END AS vi,
        |   CASE j % 4 WHEN 0 THEN doc_id % 100 + j
        |    WHEN 1 THEN 1000 + doc_id % 1000
        |    WHEN 2 THEN 2 * an + an * (an - 1) // 2 ELSE 0 END AS vs,
        |   CASE j % 4 WHEN 2 THEN 1 ELSE 0 END AS va,
        |   CASE j % 4 WHEN 3 THEN 1 ELSE 0 END AS vb,
        |   2 + CASE j % 4 WHEN 2 THEN an ELSE 0 END AS vn
        |  FROM g),
        | agg AS (SELECT doc_id, sum(vi) AS vi, sum(vs) AS vs,
        |   sum(va) AS va, sum(vb) AS vb, sum(vn) AS vn
        |  FROM per GROUP BY doc_id)
        | SELECT d.doc_id, 'map' AS top_type,
        | CAST(1 + vn + 4 + ext * 2 AS BIGINT) AS n_nodes,
        | CAST(vi + 1 AS BIGINT) AS n_int,
        | CAST(e + 2 + ext AS BIGINT) AS n_str,
        | CAST(va AS BIGINT) AS n_arr, CAST(1 AS BIGINT) AS n_map,
        | CAST(vb AS BIGINT) AS n_bool, CAST(1 AS BIGINT) AS n_float,
        | CAST(ext AS BIGINT) AS n_ext,
        | CAST(CASE WHEN e >= 3 THEN 3 ELSE 2 END AS BIGINT) AS max_depth,
        | CAST(vs - (doc_id % 30 + 1) AS BIGINT) AS int_sum,
        | CAST(2 * e + 3 + 1 + ext AS BIGINT) AS str_bytes
        | FROM d JOIN agg USING (doc_id) ORDER BY doc_id"""
        .stripMargin.replaceAll("\n", " "),
    // q397: ORC footer closed forms — per-stripe spans over a range
    // join; the PostScript/chunk-frame/deflate walk happens Spark-side
    "q397_orc_footer" ->
      """WITH d AS (SELECT doc_id, doc_id % 3 + 1 AS g,
        |   doc_id % 4 + 1 AS m, doc_id % 50 + 10 AS rp
        |  FROM documents WHERE doc_id < 240),
        | sj AS (SELECT d.*, k.k FROM d, range(0, 3) k(k) WHERE k < g)
        | SELECT doc_id,
        | CASE WHEN doc_id % 2 = 1 THEN 'zlib' ELSE 'none' END
        |  AS compression,
        | CAST(doc_id % 9 AS BIGINT) AS writer_version,
        | CAST(3 + g * 1000 AS BIGINT) AS content_length,
        | CAST(g * rp AS BIGINT) AS n_rows,
        | CAST(m + 1 AS BIGINT) AS n_types,
        | CAST(k AS BIGINT) AS stripe_idx,
        | CAST(3 + k * 1000 AS BIGINT) AS offset,
        | CAST(50 + k AS BIGINT) AS index_len,
        | CAST(800 + 10 * k + doc_id % 100 AS BIGINT) AS data_len,
        | CAST(40 + k AS BIGINT) AS footer_len,
        | CAST(rp AS BIGINT) AS stripe_rows
        | FROM sj ORDER BY doc_id, stripe_idx"""
        .stripMargin.replaceAll("\n", " "),
    // q398: thrift-compact census closed forms — 9 fields (7 top + 2
    // nested), ints = list + three scalars, the long-form id 200
    "q398_thrift_census" ->
      """WITH d AS (SELECT doc_id, doc_id % 3 + 1 AS n
        |  FROM documents WHERE doc_id < 240)
        | SELECT doc_id, CAST(9 AS BIGINT) AS n_fields,
        | CAST(n + 3 AS BIGINT) AS n_int, CAST(1 AS BIGINT) AS n_bool,
        | CAST(2 AS BIGINT) AS n_str, CAST(1 AS BIGINT) AS n_double,
        | CAST(1 AS BIGINT) AS n_list, CAST(1 AS BIGINT) AS n_struct,
        | CAST(200 AS BIGINT) AS max_field_id,
        | CAST(2 AS BIGINT) AS max_depth,
        | CAST(doc_id % 100 + n * doc_id * 10 + n * (n - 1) // 2
        |   - (doc_id % 50) - 1 + doc_id % 30 AS BIGINT) AS int_sum,
        | CAST(4 AS BIGINT) AS str_bytes
        | FROM d ORDER BY doc_id"""
        .stripMargin.replaceAll("\n", " "),
    // q399: delta-log closed forms — k adds, the 4th-id remove, the
    // 5th-id protocol line, partitions distinct by construction
    "q399_delta_log" ->
      """WITH d AS (SELECT doc_id, doc_id % 10 AS dg,
        |   doc_id % 3 + 1 AS k FROM documents WHERE doc_id < 600),
        | a AS (SELECT doc_id, dg, k, j.j FROM d, range(0, 3) j(j)
        |  WHERE j < k),
        | s AS (SELECT doc_id, sum(1000 + 10 * j + dg) AS ba
        |  FROM a GROUP BY doc_id)
        | SELECT d.doc_id,
        | CAST(1 + k + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END +
        |  CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS BIGINT)
        |  AS n_actions,
        | CAST(k AS BIGINT) AS n_adds,
        | CAST(s.ba AS BIGINT) AS bytes_added,
        | CAST(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS BIGINT)
        |  AS n_removes,
        | doc_id % 5 = 0 AS has_protocol,
        | CAST(k AS BIGINT) AS n_partitions,
        | 'm-' || dg AS meta_id
        | FROM d JOIN s USING (doc_id) ORDER BY doc_id"""
        .stripMargin.replaceAll("\n", " "),
    // q396: pack-index v2 closed forms — crc sums are exact (no
    // modulus bites below 2^31), the large-offset escape every 3rd id
    "q396_git_pack_idx" ->
      """WITH d AS (SELECT doc_id, doc_id % 20 + 5 AS n,
        |   doc_id % 3 = 0 AS big, doc_id % 50 AS m50
        |  FROM documents WHERE doc_id < 240)
        | SELECT doc_id, CAST(n AS BIGINT) AS n_objects,
        | CAST(CASE WHEN big THEN 1 ELSE 0 END AS BIGINT) AS n_large,
        | CAST(n * doc_id * 1000 + 17 * n * (n - 1) // 2 AS BIGINT)
        |  AS sum_crc,
        | CAST(CASE WHEN big THEN 2147483648 + doc_id
        |  ELSE 12 + (n - 1) * (100 + m50) END AS BIGINT) AS max_offset,
        | printf('%02x%02x%02x%02x', 0, 0,
        |  CAST((doc_id * 3 + 22) % 256 AS INT),
        |  CAST((doc_id * 3 + 33) % 256 AS INT)) AS first_sha8,
        | printf('%02x%02x%02x%02x',
        |  CAST((n - 1) * 256 // n AS INT), CAST(n - 1 AS INT),
        |  CAST((doc_id * 3 + (n - 1) * 5 + 22) % 256 AS INT),
        |  CAST((doc_id * 3 + (n - 1) * 5 + 33) % 256 AS INT))
        |  AS last_sha8
        | FROM d ORDER BY doc_id"""
        .stripMargin.replaceAll("\n", " "),
    // q363: per-track MP4 sample-table closed forms (the ISO-BMFF walk
    // happens Spark-side) — stts runs, both stsz forms, mdhd clocks
    "q363_mp4_tracks" ->
      """WITH d AS (SELECT doc_id, doc_id % 5 AS m5, doc_id % 3 AS m3,
        |   doc_id % 100 AS m100 FROM documents WHERE doc_id < 240),
        | g AS (SELECT d.*, t.t FROM d, range(0, 3) t(t) WHERE t < m3 + 1),
        | f AS (SELECT doc_id, t, 15 + m5 AS n,
        |   (10 + m5) * (100 + t) + 1000 AS sum_delta,
        |   1000 * (t + 1) AS timescale,
        |   CASE WHEN (t + doc_id) % 2 = 0 THEN 'vide' ELSE 'soun' END
        |     AS handler, m100 FROM g)
        | SELECT doc_id, CAST(t AS BIGINT) AS track_idx, handler,
        |  CAST(timescale AS BIGINT) AS timescale,
        |  CAST(sum_delta * 1000 // timescale AS BIGINT) AS duration_ms,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST(sum_delta AS BIGINT) AS sum_delta,
        |  CAST(CASE WHEN t % 2 = 0 THEN n * (256 + m100)
        |   ELSE 100 * n + 6 * (n // 4) +
        |     CASE n % 4 WHEN 1 THEN 0 WHEN 2 THEN 1 WHEN 3 THEN 3
        |       ELSE 0 END
        |   END AS BIGINT) AS total_bytes
        | FROM f ORDER BY doc_id, track_idx"""
        .stripMargin.replaceAll("\n", " "),
    "q335_domain_stats" ->
      s"""WITH d AS (SELECT doc_id, (doc_id // 2) % 6 AS fam,
         |   CAST((doc_id // 2) % 50 AS VARCHAR) AS n
         |  FROM documents WHERE doc_id < 600),
         | e AS (SELECT $UrlCanonicalSql AS canonical,
         |   $UrlHostSql AS host, $UrlRegSql AS registrable FROM d)
         | SELECT registrable, count(*) AS n_urls,
         |  count(DISTINCT host) AS n_hosts,
         |  count(DISTINCT canonical) AS n_canonical
         | FROM e GROUP BY registrable ORDER BY registrable"""
        .stripMargin.replaceAll("\n", " ")
  )

  /** Shared closed forms for the q334/q335 oracle rows. */
  private val UrlCanonicalSql: String =
    """CASE fam WHEN 0 THEN 'http://site' || n || '.com/a/c'
      | WHEN 1 THEN 'http://site' || n || '.com/p?a=1&b=2'
      | WHEN 2 THEN 'http://shop' || n || '.co.uk/'
      | WHEN 3 THEN 'https://site' || n || '.com/s'
      | WHEN 4 THEN 'http://a.b.site' || n || '.com/d'
      | ELSE 'http://site' || n || '.com:8080/e?x=1' END"""
      .stripMargin.replaceAll("\n", " ")
  private val UrlHostSql: String =
    """CASE fam WHEN 2 THEN 'shop' || n || '.co.uk'
      | WHEN 4 THEN 'a.b.site' || n || '.com'
      | ELSE 'site' || n || '.com' END""".stripMargin.replaceAll("\n", " ")
  private val UrlRegSql: String =
    """CASE fam WHEN 2 THEN 'shop' || n || '.co.uk'
      | ELSE 'site' || n || '.com' END""".stripMargin.replaceAll("\n", " ")
}
