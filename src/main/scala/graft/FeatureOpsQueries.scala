package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Feature-engineering-ops wave (round 11): the three supervised-feature
  * stages between raw facts and the per-store model matrix.
  *
  * Reference intent — every query names its consumer (r10 verdict
  * "next" #4):
  *  - q540: leave-one-out target encoding with prior smoothing
  *    (Micci-Barreca 2001, SIGKDD Expl.) — THE high-cardinality
  *    categorical encoder: enc_i = (S_g − y_i + m·P) / (n_g − 1 + m),
  *    m = 20, P the global mean, all in exact cents with floor div.
  *    The "−y_i" is the leakage guard supervised pipelines get wrong;
  *    the spec replays a group by hand to certify a row never sees its
  *    own label. Consumer: q246's supervised feature-matrix
  *    materialization for the q31/q32 per-store models.
  *  - q541: mutual-information feature ranking (Battiti 1994, the
  *    filter method behind sklearn's mutual_info_classif): MI(X;Y) =
  *    Σ_cells (n_xy/N)·ln(n_xy·N / (n_x·n_y)) for four candidate
  *    categorical features against the late-shipment label, exact at
  *    e9 via the shared graft.ops.FixedLn kernel — its THIRD consumer.
  *    One fact scan explodes all four features into a long table; each
  *    MI is three hash aggregates, never a per-feature rescan.
  *    Consumer: choosing q246's feature columns before training cost
  *    is spent.
  *  - q542: Huber robust trend via two pinned IRLS rounds (Huber 1964;
  *    Holland & Welsch 1977 for the IRLS form): start from q154's
  *    exact OLS, reweight w = min(1, c/|resid|) with c = 2·median|r|
  *    (the MAD-free integer cutoff), weighted OLS in DECIMAL(38,0).
  *    Where q172's Theil–Sen pays pairwise slopes, Huber pays two
  *    extra linear passes — the robust trend at any series length.
  *    Consumer: the q31/q32 trend features on promo-spike-polluted
  *    stores (family: q111 MAD, q420 Hampel, q172 Theil–Sen).
  *
  * House rules: exact integers, sign-explicit sdiv, DECIMAL(38,0) lifts
  * where BIGINT products overflow, per-key aggregates, ordered outputs.
  */
object FeatureOpsQueries {

  private def sdiv(num: String, den: String) =
    s"case when ($num) >= 0 then ($num) div ($den) else -((-($num)) div ($den)) end"
  private def sdivSql(num: String, den: String) =
    s"CASE WHEN ($num) >= 0 THEN ($num) // ($den) ELSE -((-($num)) // ($den)) END"

  /** smoothing pseudo-count for q540 */
  private val M = 20

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G485: leave-one-out target encoding (smoothed) ─────────────────
    "q540_target_encoding" -> ((s, dir) => {
      val od = Tables.orders(s, dir)
        .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").cast("long").as("g"),
          col("o_orderpriority").as("pr"),
          col("o_orderkey").cast("long").as("ok"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("y"))
      val glob = od.agg(expr("sum(y) div count(1)").as("p"))
      val grp = od.groupBy("g", "pr")
        .agg(count(lit(1)).as("n_g"), sum("y").as("s_g"))
      val enc = od.join(grp, Seq("g", "pr")).crossJoin(broadcast(glob))
        .withColumn("enc", expr(s"(s_g - y + $M * p) div (n_g - 1 + $M)"))
      enc.groupBy("g", "pr")
        .agg(count(lit(1)).as("n"),
          min("enc").as("enc_min"), max("enc").as("enc_max"),
          expr("bit_xor(md5_60(concat(cast(ok as string), ':', " +
            "cast(enc as string))))").as("xor60_enc"))
        .orderBy("g", "pr")
    }),

    // ── G486: mutual-information feature ranking ───────────────────────
    "q541_mutual_information" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).select(col("o_orderkey"),
          col("o_orderpriority")), col("l_orderkey") === col("o_orderkey"))
        .select(
          expr("case when l_returnflag = 'R' then 1L else 0L end").as("y"),
          posexplode(array(
            col("o_orderpriority"),
            expr("cast(cast(l_quantity as bigint) div 10 as string)"),
            col("l_linestatus"),
            expr("cast(month(to_date(l_shipdate)) as string)")))
            .as(Seq("fid", "x")))
      val f = expr("element_at(array('priority', 'qty_decade', 'linestatus', " +
        "'ship_month'), cast(fid as int) + 1)")
      val cells = li.groupBy(f.as("feature"), col("x"), col("y"))
        .agg(count(lit(1)).as("n_xy"))
      val nx = cells.groupBy("feature", "x").agg(sum("n_xy").as("n_x"))
      val ny = cells.groupBy("feature", "y").agg(sum("n_xy").as("n_y"))
      val nn = cells.groupBy("feature").agg(sum("n_xy").as("nn"))
      // magnitude guard: the kernel computes hi·1e9, so both ratio legs
      // are rescaled to ~e6 (same floor both engines; the ratio — all
      // ln cares about — moves by < 1e-6 relative, identically)
      val t0 = cells.join(nx, Seq("feature", "x"))
        .join(ny, Seq("feature", "y")).join(broadcast(nn), Seq("feature"))
        .withColumn("pnum", expr("n_xy * nn"))
        .withColumn("pden", expr("n_x * n_y"))
        .withColumn("sc", expr("greatest(1L, greatest(pnum, pden) div 1000000)"))
        .withColumn("hi", expr("greatest(pnum, pden) div sc"))
        .withColumn("lo", expr("greatest(1L, least(pnum, pden) div sc)"))
      val terms = graft.ops.FixedLn.lnE9(t0, "hi", "lo", "lnr")
        .withColumn("term", expr(
          "n_xy * (case when pnum >= pden then lnr else -lnr end)"))
      terms.groupBy("feature")
        .agg(count(lit(1)).as("n_cells"), max("nn").as("n_rows"),
          expr(sdiv("sum(term)", "max(nn)")).as("mi_e9"))
        .orderBy(col("mi_e9").desc, col("feature"))
    }),

    // ── G487: Huber robust trend (two pinned IRLS rounds) ──────────────
    "q542_huber_trend" -> ((s, dir) => {
      val dec = "decimal(38, 0)"
      val nd = Tables.orders(s, dir)
        .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").cast("long").as("g"),
          expr("datediff(to_date(o_orderdate), date '1970-01-01')").as("dn"))
        .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("y"))
      val d0 = nd.agg(min("dn").as("d0"))
      // the day-grain series feeds FIVE aggregate passes (OLS, two
      // medians, two weighted OLS) — land it once per (JVM, sfDir)
      // instead of re-joining orders×customer per pass (3.5 s -> under
      // budget at sf0.1; q441's lineage-checkpoint discipline)
      val basePath = PipelineQueries.cachedFixture(s"huberbase|$dir") { work =>
        nd.crossJoin(broadcast(d0)).withColumn("x", col("dn") - col("d0"))
          .select("g", "x", "y")
          .write.mode("overwrite").parquet(s"$work/base")
      }
      // spread: the fixture lands as one file; five aggregate passes
      // otherwise each scan it in one task
      val base = graft.ops.Relational.spread(s.read.parquet(s"$basePath/base"))
      // round 0: plain exact OLS per g (q154's discipline)
      def wols(df: DataFrame): DataFrame = df
        .groupBy("g").agg(
          sum("w").as("sw"), sum(expr("w * x")).as("swx"),
          sum(expr(s"cast(w as $dec) * y")).as("swy"),
          sum(expr(s"cast(w as $dec) * x * y")).as("swxy"),
          sum(expr("w * x * x")).as("swxx"))
        .withColumn("bnum", expr(s"cast(sw as $dec) * swxy - cast(swx as $dec) * swy"))
        .withColumn("bden", expr(s"cast(sw as $dec) * swxx - cast(swx as $dec) * swx"))
        .withColumn("b_e6", expr("cast(" +
          sdiv("bnum * 1000000", s"greatest(bden, cast(1 as $dec))") +
          " as bigint)"))
        .withColumn("a_e6", expr("cast(" +
          sdiv(s"swy * 1000000 - cast(b_e6 as $dec) * swx", "sw") +
          " as bigint)"))
        .select("g", "b_e6", "a_e6")
      val ols = wols(base.withColumn("w", lit(1L)))
      // one IRLS round: residuals vs (a, b), cutoff c = 2·median|r|
      // (med2 = exact percentile of 2|r| — the q111 ×2 idiom), weights
      // w_e6 = min(1e6, med2·1e6 div |r|)
      def irls(coef: DataFrame): DataFrame = {
        val r = base.join(broadcast(coef), Seq("g"))
          .withColumn("absr", expr(
            s"abs(y - (${sdiv("a_e6 + b_e6 * x", "1000000")}))"))
        val med = r.groupBy("g")
          .agg(expr("cast(percentile(absr * 2, 0.5) as bigint)").as("med2"))
        r.join(broadcast(med), Seq("g"))
          .withColumn("w", expr("case when absr = 0 then 1000000L " +
            "else least(1000000L, med2 * 1000000 div absr) end"))
      }
      val w1 = irls(ols)
      val fit1 = wols(w1)
      val w2 = irls(fit1)
      val fit2 = wols(w2).withColumnRenamed("b_e6", "b_huber_e6")
        .select("g", "b_huber_e6")
      val audit = w2.groupBy("g").agg(count(lit(1)).as("n_days"),
        sum(when(col("w") < 1000000L, 1L).otherwise(0L)).as("n_down"),
        expr("max(med2) div 2").as("mad_cents"))
      ols.select(col("g"), col("b_e6").as("b_ols_e6"))
        .join(fit2, Seq("g")).join(audit, Seq("g"))
        .select("g", "n_days", "b_ols_e6", "b_huber_e6", "n_down", "mad_cents")
        .orderBy("g")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q540_target_encoding" ->
      s"""WITH od AS MATERIALIZED (SELECT c.c_nationkey AS g,
         |    o.o_orderpriority AS pr, o.o_orderkey AS ok,
         |    CAST(round(o.o_totalprice * 100) AS BIGINT) AS y
         |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
         |gm AS (SELECT SUM(y) // COUNT(*) AS p FROM od),
         |grp AS (SELECT g, pr, COUNT(*) AS n_g, SUM(y) AS s_g FROM od
         |  GROUP BY 1, 2),
         |enc AS (SELECT od.g, od.pr, od.ok,
         |    (s_g - y + $M * p) // (n_g - 1 + $M) AS enc
         |  FROM od JOIN grp ON od.g = grp.g AND od.pr = grp.pr, gm)
         |SELECT CAST(g AS BIGINT) AS g, pr, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(MIN(enc) AS BIGINT) AS enc_min,
         |  CAST(MAX(enc) AS BIGINT) AS enc_max,
         |  bit_xor(CAST('0x' || substr(md5(CAST(ok AS VARCHAR) || ':' ||
         |    CAST(enc AS VARCHAR)), 1, 15) AS BIGINT)) AS xor60_enc
         |FROM enc GROUP BY 1, 2 ORDER BY g, pr""".stripMargin,

    "q541_mutual_information" -> {
      s"""WITH li AS MATERIALIZED (SELECT
         |    CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         |    u.fid, u.x
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey,
         |  LATERAL (SELECT UNNEST(range(4)) AS fid,
         |    UNNEST([o.o_orderpriority,
         |      CAST(CAST(l.l_quantity AS BIGINT) // 10 AS VARCHAR),
         |      l.l_linestatus,
         |      CAST(month(CAST(l.l_shipdate AS DATE)) AS VARCHAR)]) AS x) u),
         |cells AS (SELECT list_extract(['priority', 'qty_decade',
         |    'linestatus', 'ship_month'], CAST(fid AS INT) + 1) AS feature,
         |    x, y, COUNT(*) AS n_xy
         |  FROM li GROUP BY 1, 2, 3),
         |nx AS (SELECT feature, x, SUM(n_xy) AS n_x FROM cells GROUP BY 1, 2),
         |ny AS (SELECT feature, y, SUM(n_xy) AS n_y FROM cells GROUP BY 1, 2),
         |nn AS (SELECT feature, SUM(n_xy) AS nn FROM cells GROUP BY 1),
         |t00 AS (SELECT c.feature, c.n_xy, nn.nn,
         |    c.n_xy * nn.nn AS pnum, nx.n_x * ny.n_y AS pden
         |  FROM cells c JOIN nx ON c.feature = nx.feature AND c.x = nx.x
         |  JOIN ny ON c.feature = ny.feature AND c.y = ny.y
         |  JOIN nn ON c.feature = nn.feature),
         |t01 AS (SELECT *,
         |    GREATEST(1, GREATEST(pnum, pden) // 1000000) AS sc FROM t00),
         |t0 AS (SELECT *, GREATEST(pnum, pden) // sc AS hi,
         |    GREATEST(1, LEAST(pnum, pden) // sc) AS lo FROM t01),
         |${graft.ops.FixedLn.sqlLnE9Stages("t0", "hi", "lo", "lnr", "lx")},
         |t AS (SELECT feature, nn,
         |    n_xy * (CASE WHEN pnum >= pden THEN lnr ELSE -lnr END) AS term
         |  FROM lx12)
         |SELECT feature, CAST(COUNT(*) AS BIGINT) AS n_cells,
         |  CAST(MAX(nn) AS BIGINT) AS n_rows,
         |  CAST(${sdivSql("SUM(term)", "MAX(nn)")} AS BIGINT) AS mi_e9
         |FROM t GROUP BY feature ORDER BY mi_e9 DESC, feature""".stripMargin
    },

    "q542_huber_trend" -> {
      def wolsSql(src: String, out: String): String =
        s"""${out}0 AS (SELECT g, SUM(w) AS sw, SUM(w * x) AS swx,
           |    SUM(CAST(w AS HUGEINT) * y) AS swy,
           |    SUM(CAST(w AS HUGEINT) * x * y) AS swxy,
           |    SUM(w * x * x) AS swxx
           |  FROM $src GROUP BY g),
           |${out}1 AS (SELECT g, sw, swx, swy,
           |    CAST(sw AS HUGEINT) * swxy - CAST(swx AS HUGEINT) * swy AS bnum,
           |    CAST(sw AS HUGEINT) * swxx - CAST(swx AS HUGEINT) * swx AS bden
           |  FROM ${out}0),
           |$out AS (SELECT g, CAST(${sdivSql("bnum * 1000000",
              "GREATEST(bden, 1)")} AS BIGINT) AS b_e6,
           |    CAST(${sdivSql(
              "swy * 1000000 - CAST(" + sdivSql("bnum * 1000000",
                "GREATEST(bden, 1)") + " AS HUGEINT) * swx",
              "sw")} AS BIGINT) AS a_e6
           |  FROM ${out}1)""".stripMargin
      def irlsSql(coef: String, out: String): String =
        s"""${out}r AS MATERIALIZED (SELECT b.g, b.x, b.y,
           |    ABS(b.y - (${sdivSql("c.a_e6 + c.b_e6 * b.x", "1000000")}))
           |      AS absr
           |  FROM base b JOIN $coef c ON b.g = c.g),
           |${out}m AS (SELECT g, CAST(quantile_cont(absr * 2, 0.5) AS BIGINT)
           |    AS med2 FROM ${out}r GROUP BY g),
           |$out AS MATERIALIZED (SELECT r.g, r.x, r.y, m.med2,
           |    CASE WHEN r.absr = 0 THEN 1000000
           |      ELSE LEAST(1000000, m.med2 * 1000000 // r.absr) END AS w
           |  FROM ${out}r r JOIN ${out}m m ON r.g = m.g)""".stripMargin
      s"""WITH nd AS (SELECT c.c_nationkey AS g,
         |    date_diff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE))
         |      AS dn,
         |    SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS y
         |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         |  GROUP BY 1, 2),
         |d0 AS (SELECT MIN(dn) AS d0 FROM nd),
         |base AS MATERIALIZED (SELECT g, dn - d0 AS x, y FROM nd, d0),
         |b1 AS (SELECT g, x, y, 1 AS w FROM base),
         |${wolsSql("b1", "ols")},
         |${irlsSql("ols", "w1")},
         |${wolsSql("w1", "fit1")},
         |${irlsSql("fit1", "w2")},
         |${wolsSql("w2", "fit2")},
         |audit AS (SELECT g, COUNT(*) AS n_days,
         |    SUM(CASE WHEN w < 1000000 THEN 1 ELSE 0 END) AS n_down,
         |    MAX(med2) // 2 AS mad_cents
         |  FROM w2 GROUP BY g)
         |SELECT CAST(o.g AS BIGINT) AS g, CAST(a.n_days AS BIGINT) AS n_days,
         |  CAST(o.b_e6 AS BIGINT) AS b_ols_e6,
         |  CAST(f.b_e6 AS BIGINT) AS b_huber_e6,
         |  CAST(a.n_down AS BIGINT) AS n_down,
         |  CAST(a.mad_cents AS BIGINT) AS mad_cents
         |FROM ols o JOIN fit2 f ON o.g = f.g JOIN audit a ON o.g = a.g
         |ORDER BY o.g""".stripMargin
    }
  )
}
