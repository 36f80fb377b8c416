package graft

import graft.core.{PrefixScan, Profiler, Quantiles, Stats}
import graft.eval.Metrics
import graft.features.{FrequencyIndexer, Imputers}
import graft.score.ZScoreAnomaly
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** DuckDB oracle SQL, part B — see [[SparkEntry.oracleSql]]. */
private[graft] trait OracleSqlB { this: SparkEntry.type =>

  private[graft] lazy val oracleSqlB: Map[String, String] = Map(
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
  )
}
