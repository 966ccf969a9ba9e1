package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Service-layer operators (round 9, eighth wave): the Merkle repair
  * shipment, cross-series correlation at lags, item-item collaborative
  * filtering, percentile semantics (CONT vs DISC), and session
  * dwell-time profiles.
  *
  * Reference intent: the reference serves one user-facing product — a
  * store dashboard backed by Postgres reads (services/forecast-service/app/main.py,
  * web-ui). These operators are the service features the same product
  * grows into: replica repair that ships only the diff, leading-
  * indicator analysis between metric series, "customers also bought"
  * from the order history itself, and the percentile-definition
  * fine print that makes two dashboards disagree on the same data.
  */
object ServiceQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G150: Merkle repair shipment (anti-entropy, round 2) ───────────
    // q171 finds WHICH buckets diverge; this computes WHAT to ship:
    // within the disagreeing buckets ONLY (semi-join on the bucket
    // census — the recursion step that makes anti-entropy cheap), a
    // full-outer row compare classifies every difference as missing
    // (dropped from the replica) or stale (value drifted). Per-bucket
    // shipment ledger out; rows outside dirty buckets are never read
    // past the first checksum pass. The same deterministic corruption
    // fixture as q171, so the oracle states the diff from the rules
    // (md5 % 97 dropped; % 89 of the survivors perturbed).
    "q205_merkle_repair" -> ((s, dir) => {
      val base = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          expr("cast(round(value * 1000000) as bigint)").as("v6"))
      val hmod = (m: Int) => expr(
        s"cast(conv(substring(md5(cast(event_id as string)), 1, 8), 16, 10) as bigint) % $m")
      val replica = base
        .filter(hmod(97) =!= 0)
        .withColumn("v6", when(hmod(89) === 0, col("v6") + 1).otherwise(col("v6")))
      val dirty = AnalyticsQueries.queries("q171_merkle_reconcile")(s, dir)
        .filter(!col("in_sync")).select("bucket")
      def inDirty(df: DataFrame) = df
        .withColumn("bucket", expr("event_id % 64"))
        .join(broadcast(dirty), Seq("bucket"), "left_semi")
      inDirty(base).as("b")
        .join(inDirty(replica).select(col("event_id"), col("v6").as("rv6")),
          Seq("event_id"), "left")
        .withColumn("kind",
          when(col("rv6").isNull, "missing")
            .when(col("rv6") =!= col("v6"), "stale"))
        .filter(col("kind").isNotNull)
        .groupBy("bucket")
        .agg(sum(when(col("kind") === "missing", 1L).otherwise(0L)).as("n_missing"),
          sum(when(col("kind") === "stale", 1L).otherwise(0L)).as("n_stale"))
        .orderBy("bucket")
    }),

    // ── G151: cross-correlation at lags (leading-indicator scan) ───────
    // Does the error series LEAD the purchase series? Pearson r between
    // daily error volume on day d and purchase volume on day d+lag, for
    // lag ∈ [−2, 2]. The corpus collapses to two tiny daily series
    // (one conditional aggregate); the lag alignment is a self-join of
    // |days| rows with a shifted key (equi-join — the lag lives in the
    // join key, not a theta condition); moment sums follow the q67
    // exact-DECIMAL discipline with the one final double division both
    // engines compute identically. The argmax lag is the
    // lead/lag estimate an ops dashboard quotes.
    "q206_cross_correlation" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("xe"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("yp"))
      val lags = s.range(-2, 3).select(col("id").cast(IntegerType).as("lag"))
      val xs = daily.select(col("day"), col("xe")).crossJoin(broadcast(lags))
        .withColumn("jday", date_add(col("day"), col("lag")))
      val joined = xs.join(daily.select(col("day").as("jday"), col("yp")), Seq("jday"))
      val dec = DecimalType(38, 0)
      val d = (c: org.apache.spark.sql.Column) => c.cast(DoubleType)
      joined.groupBy("lag")
        .agg(count(lit(1)).as("n"),
          sum(col("xe").cast(dec)).as("sx"), sum(col("yp").cast(dec)).as("sy"),
          sum((col("xe") * col("yp")).cast(dec)).as("sxy"),
          sum((col("xe") * col("xe")).cast(dec)).as("sxx"),
          sum((col("yp") * col("yp")).cast(dec)).as("syy"))
        .select(col("lag").cast(LongType).as("lag"), col("n"),
          ((d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
            (sqrt(d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
              sqrt(d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy"))))).as("r"))
        .orderBy("lag")
    }),

    // ── G152: item-item collaborative filtering ("also bought") ────────
    // The recommender the sales domain asks for first: score parts a
    // target customer has NOT bought by their co-order counts with the
    // parts they HAVE (item-item CF, co-occurrence flavor — q198's
    // affinity table put to work). Target = the busiest customer
    // (most orders, tie → lowest custkey) — deterministic, and in
    // production a parameter. The owned-part set is tiny → broadcast
    // semi/anti joins; scores aggregate over the bounded pair table;
    // top-10 via TakeOrdered. No per-user loop — the same plan scores
    // any number of users by swapping the filter for a join.
    "q207_item_cf" -> ((s, dir) => {
      val items = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_orderkey").as("okey"),
          col("l_partkey").as("pk"))
      val target = items.select("cust", "okey").distinct()
        .groupBy("cust").agg(count(lit(1)).as("n_orders"))
        .orderBy(col("n_orders").desc, col("cust")).limit(1).select("cust")
      val owned = items.join(broadcast(target), Seq("cust"))
        .select("pk").distinct()
      // ride the landed co-occurrence matrix (LakeQueries.basketTables);
      // both orientations of each undirected (pa < pb, co) row
      val co = LakeQueries.basketTables(s, dir)._2
      val directed = co.select(col("pa").as("own"), col("pb").as("part"), col("co"))
        .unionByName(co.select(col("pb").as("own"), col("pa").as("part"), col("co")))
      directed
        .join(broadcast(owned.withColumnRenamed("pk", "own")), Seq("own"), "left_semi")
        .join(broadcast(owned.withColumnRenamed("pk", "part")), Seq("part"), "left_anti")
        .groupBy("part")
        .agg(sum("co").as("score"), count(lit(1)).as("n_owned_links"))
        .select(col("part"), col("score"), col("n_owned_links"))
        .orderBy(col("score").desc, col("part"))
        .limit(10)
    }),

    // ── G153: percentile semantics bridge (CONT vs DISC, both exact) ───
    // Two dashboards disagree on "the p90" because one interpolates
    // (CONT) and one picks a member (DISC). This emits both, per event
    // type, over the e6-int values — CONT as the one engine-identical
    // double (q13/q149 pairing: Spark `percentile` ≡ DuckDB
    // quantile_cont), DISC as the exact order statistic at
    // ⌈p·n⌉ (lower-value convention, BIGINT) — and the member gap.
    // DISC is computed by rank selection (q131's ceil-rank rule), not
    // a second percentile call, so its definition is explicit in the
    // plan rather than delegated to either engine's fine print.
    "q208_percentile_bridge" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("event_type"), expr("cast(round(value * 1000000) as bigint)").as("v6"))
      val cont = e.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          expr("percentile(v6, 0.5)").as("p50_cont"),
          expr("percentile(v6, 0.9)").as("p90_cont"))
      val w = Window.partitionBy("event_type").orderBy("v6")
      val ranked = e
        .withColumn("rnk", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy("event_type")))
      val disc = ranked
        .filter(col("rnk") === expr("(cnt + 1) div 2") ||
          col("rnk") === expr("(9 * cnt + 9) div 10"))
        .groupBy("event_type")
        .agg(min(when(col("rnk") === expr("(cnt + 1) div 2"), col("v6"))).as("p50_disc"),
          min(when(col("rnk") === expr("(9 * cnt + 9) div 10"), col("v6"))).as("p90_disc"))
      cont.join(disc, Seq("event_type"))
        .select("event_type", "n", "p50_cont", "p50_disc", "p90_cont", "p90_disc")
        .orderBy("event_type")
    }),

    // ── G154: session dwell-time profile (engagement depth) ────────────
    // q50 counts sessions; product questions are about DWELL — how long
    // a session lasts and what starts it. Sessions form with the q50
    // machinery (30-min gap islands) on ONE user exchange; each
    // session's first event type (min_by over the same partitioning)
    // keys the profile; dwell sums exactly in µs. Output ≤|types| rows:
    // session count, mean dwell (integer div), and max dwell per
    // entry type — the "which entry point holds users" table.
    "q209_session_dwell" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val sess = e
        .withColumn("new_s",
          when(col("us") - lag("us", 1).over(w) > 1800000000L || lag("us", 1).over(w).isNull, 1L)
            .otherwise(0L))
        .withColumn("sid", sum("new_s").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sess.groupBy("user_id", "sid")
        .agg((max("us") - min("us")).as("dwell_us"),
          min_by(col("event_type"), struct(col("us"), col("event_id"))).as("entry"))
        .groupBy("entry")
        .agg(count(lit(1)).as("n_sessions"),
          sum("dwell_us").as("total_dwell_us"),
          expr("sum(dwell_us) div count(1)").as("mean_dwell_us"),
          max("dwell_us").as("max_dwell_us"))
        .orderBy("entry")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q205_merkle_repair" ->
      """WITH base AS (SELECT event_id, user_id,
        |                CAST(round(value * 1000000) AS BIGINT) AS v6 FROM events),
        |marks AS (SELECT event_id, v6,
        |            CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)
        |              AS BIGINT) % 97 = 0 AS dropped,
        |            CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)
        |              AS BIGINT) % 89 = 0 AS perturbed
        |          FROM base),
        |diffs AS (SELECT event_id % 64 AS bucket,
        |            CASE WHEN dropped THEN 'missing'
        |                 WHEN perturbed THEN 'stale' END AS kind
        |          FROM marks WHERE dropped OR perturbed)
        |SELECT bucket,
        |       CAST(SUM(CASE WHEN kind = 'missing' THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_missing,
        |       CAST(SUM(CASE WHEN kind = 'stale' THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_stale
        |FROM diffs GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q206_cross_correlation" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
        |                 SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS xe,
        |                 SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS yp
        |               FROM events GROUP BY 1),
        |lags AS (SELECT CAST(r.l AS INT) AS lag FROM range(-2, 3) r(l)),
        |j AS (SELECT lag, a.xe, b.yp
        |      FROM daily a CROSS JOIN lags
        |      JOIN daily b ON b.day = a.day + lag * INTERVAL 1 DAY),
        |m AS (SELECT lag, COUNT(*) AS n,
        |        SUM(CAST(xe AS HUGEINT)) AS sx, SUM(CAST(yp AS HUGEINT)) AS sy,
        |        SUM(CAST(xe AS HUGEINT) * yp) AS sxy,
        |        SUM(CAST(xe AS HUGEINT) * xe) AS sxx,
        |        SUM(CAST(yp AS HUGEINT) * yp) AS syy
        |      FROM j GROUP BY 1)
        |SELECT CAST(lag AS BIGINT) AS lag, n,
        |       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |       (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |        sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r
        |FROM m ORDER BY lag""".stripMargin,

    "q207_item_cf" ->
      """WITH items AS (SELECT o_custkey AS cust, l_orderkey AS okey,
        |                 l_partkey AS pk
        |               FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
        |t AS (SELECT cust FROM (
        |        SELECT cust, COUNT(*) AS n_orders FROM (
        |          SELECT DISTINCT cust, okey FROM items) GROUP BY cust)
        |      ORDER BY n_orders DESC, cust LIMIT 1),
        |owned AS (SELECT DISTINCT pk FROM items WHERE cust = (SELECT cust FROM t)),
        |basket AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS pk
        |           FROM lineitem),
        |co AS (SELECT a.pk AS pa, b.pk AS pb
        |       FROM basket a JOIN basket b
        |         ON b.okey = a.okey AND b.pk != a.pk)
        |SELECT pb AS part, COUNT(*) AS score,
        |       CAST(COUNT(DISTINCT pa) AS BIGINT) AS n_owned_links
        |FROM co
        |WHERE pa IN (SELECT pk FROM owned) AND pb NOT IN (SELECT pk FROM owned)
        |GROUP BY pb ORDER BY score DESC, part LIMIT 10""".stripMargin,

    "q208_percentile_bridge" ->
      """WITH e AS (SELECT event_type,
        |             CAST(round(value * 1000000) AS BIGINT) AS v6 FROM events),
        |cont AS (SELECT event_type, COUNT(*) AS n,
        |           quantile_cont(v6, 0.5) AS p50_cont,
        |           quantile_cont(v6, 0.9) AS p90_cont
        |         FROM e GROUP BY 1),
        |r AS (SELECT event_type, v6,
        |        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v6) AS rnk,
        |        COUNT(*) OVER (PARTITION BY event_type) AS cnt
        |      FROM e),
        |disc AS (SELECT event_type,
        |           MIN(CASE WHEN rnk = (cnt + 1) // 2 THEN v6 END) AS p50_disc,
        |           MIN(CASE WHEN rnk = (9 * cnt + 9) // 10 THEN v6 END) AS p90_disc
        |         FROM r WHERE rnk = (cnt + 1) // 2 OR rnk = (9 * cnt + 9) // 10
        |         GROUP BY 1)
        |SELECT cont.event_type, n, p50_cont, p50_disc, p90_cont, p90_disc
        |FROM cont JOIN disc ON disc.event_type = cont.event_type
        |ORDER BY cont.event_type""".stripMargin,

    "q209_session_dwell" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        |           FROM events),
        |l AS (SELECT user_id, event_id, event_type, us,
        |        CASE WHEN us - LAG(us) OVER (PARTITION BY user_id
        |               ORDER BY us, event_id) > 1800000000
        |             OR LAG(us) OVER (PARTITION BY user_id
        |               ORDER BY us, event_id) IS NULL
        |             THEN 1 ELSE 0 END AS new_s
        |      FROM e),
        |s AS (SELECT user_id, event_type, us, event_id,
        |        SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                         ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM l),
        |entry AS (SELECT user_id, sid, event_type AS entry FROM (
        |            SELECT user_id, sid, event_type,
        |              ROW_NUMBER() OVER (PARTITION BY user_id, sid
        |                ORDER BY us, event_id) AS rn
        |            FROM s) WHERE rn = 1),
        |sess AS (SELECT s.user_id, s.sid,
        |           MAX(us) - MIN(us) AS dwell_us, MIN(entry) AS entry
        |         FROM s JOIN entry
        |           ON entry.user_id = s.user_id AND entry.sid = s.sid
        |         GROUP BY 1, 2)
        |SELECT entry, COUNT(*) AS n_sessions,
        |       CAST(SUM(dwell_us) AS BIGINT) AS total_dwell_us,
        |       CAST(SUM(dwell_us) // COUNT(*) AS BIGINT) AS mean_dwell_us,
        |       CAST(MAX(dwell_us) AS BIGINT) AS max_dwell_us
        |FROM sess GROUP BY entry ORDER BY entry""".stripMargin
  )
}
