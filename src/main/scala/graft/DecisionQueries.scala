package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Decision-layer analytics (round 10, thirty-second wave): held-out
  * evaluation of the Markov next-event model, channel-presence
  * conversion lift, EXACT isotonic calibration (pool-adjacent-
  * violators via the max-min interval formula), and an RLE layout
  * advisor whose run counts need no window at all.
  *
  * Reference intent: the reference never evaluates beyond RMSE and
  * never calibrates; these are the "is the model/layout actually
  * good" ops. Two structural tricks carry the wave: (a) floor(·) is
  * monotone, so max-min over FLOORED interval averages equals the
  * floored exact PAV solution — isotonic regression with zero floats;
  * (b) under a prefix sort order, each column's RLE run count equals
  * the distinct count of its sort-key PREFIX, so the advisor is pure
  * aggregates where the naive form is a corpus-wide ordered window.
  */
object DecisionQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G246: Markov next-event model, held-out accuracy ───────────────
    // q115 builds the transition matrix; this op evaluates it like a
    // model: users hash-split 75/25 (q51's discipline), per-prev-state
    // argmax next from TRAIN transitions only, accuracy measured on
    // TEST transitions. Transitions from a per-user lag window (one
    // user_id shuffle); matrix and predictions are |types|² rows.
    // The per-state accuracy row exposes which states are actually
    // predictable (the majority-class baseline comes free as the
    // argmax count share).
    "q301_markov_eval" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"),
          unix_timestamp(col("ts")).as("sec"), col("event_id"))
      val w = Window.partitionBy("user_id").orderBy(col("sec"), col("event_id"))
      val trans = e.withColumn("next_type", lead("event_type", 1).over(w))
        .filter(col("next_type").isNotNull)
        .withColumn("is_train", expr(
          "cast(conv(substring(md5(cast(user_id as string)), 1, 4), 16, 10) as bigint) % 4 < 3"))
      val model = trans.filter(col("is_train"))
        .groupBy(col("event_type"), col("next_type")).agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("event_type").orderBy(col("c").desc, col("next_type").asc)))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("next_type").as("pred"))
      trans.filter(!col("is_train"))
        .join(broadcast(model), Seq("event_type"), "left")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_test"),
          sum(when(col("next_type") === col("pred"), 1L).otherwise(0L)).as("n_correct"))
        .withColumn("acc_e4", expr("n_correct * 10000 div n_test"))
        .orderBy("event_type")
    }),

    // ── G247: channel-presence conversion lift ─────────────────────────
    // For every non-purchase event type: the purchase rate of users who
    // have that channel in their history vs those who don't, as exact
    // e4 rates + lift. One (user, distinct type) explode + a broadcast
    // 1-row total — the with/without split is arithmetic (without =
    // total − with), not a second scan. The "does this touchpoint
    // matter at all" screen that runs before q153's attribution split.
    "q302_channel_lift" -> ((s, dir) => {
      val ut = Tables.events(s, dir)
        .select(col("user_id"), col("event_type")).distinct()
      val conv = ut.filter(col("event_type") === "purchase")
        .select(col("user_id"), lit(1L).as("cv"))
      val users = ut.select("user_id").distinct()
        .join(conv, Seq("user_id"), "left").na.fill(0L, Seq("cv"))
      val tot = users.agg(count(lit(1)).as("n_all"), sum("cv").as("conv_all"))
      ut.filter(col("event_type") =!= "purchase")
        .join(users, Seq("user_id"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_with"), sum("cv").as("conv_with"))
        .crossJoin(broadcast(tot))
        .select(col("event_type"), col("n_with"),
          expr("conv_with * 10000 div n_with").as("rate_with_e4"),
          expr("case when n_all > n_with then (conv_all - conv_with) * 10000 div (n_all - n_with) else null end")
            .as("rate_without_e4"),
          expr("""case when n_all > n_with and conv_all > conv_with
                  then (conv_with * 10000 div n_with) * 10000
                       div ((conv_all - conv_with) * 10000 div (n_all - n_with))
                  else null end""").as("lift_e4"))
        .orderBy("event_type")
    }),

    // ── G248: exact isotonic calibration (PAV by max-min intervals) ────
    // Calibrate P(purchase | value-decile): raw per-decile rates are
    // not monotone; the isotonic fit ŷ_k = max_{i≤k} min_{j≥k} avg(i..j)
    // IS the pool-adjacent-violators solution (Robertson 1988), and
    // because floor is monotone it commutes with max/min — so running
    // the formula on e9-FLOORED interval averages returns exactly
    // floor(exact PAV). Deciles via distributedNtile (corpus-safe);
    // everything after is 10-row algebra: prefix sums by triangular
    // join, 55 interval averages, two nested groupBys. Zero floats,
    // zero windows, spec-asserts monotonicity.
    "q303_isotonic_calibration" -> ((s, dir) => {
      val scored = Tables.events(s, dir)
        .select(round(col("value") * 1000000).cast(LongType).as("v6"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"),
          col("event_id"))
      val dec = graft.ops.Relational.distributedNtile(scored,
          Seq(col("v6").asc, col("event_id").asc), 10,
          scored.agg(count(lit(1)).as("n_total")), "k")
        .groupBy(col("k").cast(LongType).as("k"))
        .agg(count(lit(1)).as("n_k"), sum("y").as("pos_k"))
      val pre = dec.select(col("k").as("m"), col("n_k").as("nm"), col("pos_k").as("pm"))
      val prefix = dec.join(broadcast(pre), col("m") <= col("k"))
        .groupBy("k", "n_k", "pos_k")
        .agg(sum("nm").as("cn"), sum("pm").as("cp"))
      val lo = prefix.select(col("k").as("i"), (col("cn") - col("n_k")).as("cn0"),
        (col("cp") - col("pos_k")).as("cp0"))
      val hi = prefix.select(col("k").as("j"), col("cn").as("cnj"), col("cp").as("cpj"))
      val intervals = lo.join(broadcast(hi), col("i") <= col("j"))
        .select(col("i"), col("j"),
          expr("(cpj - cp0) * 1000000000 div (cnj - cn0)").as("avg_e9"))
      val ks = dec.select(col("k"), col("n_k"), col("pos_k"))
      val minOverJ = ks.join(broadcast(intervals),
          col("i") <= col("k") && col("j") >= col("k"))
        .groupBy("k", "n_k", "pos_k", "i")
        .agg(min("avg_e9").as("minj"))
      minOverJ.groupBy("k", "n_k", "pos_k")
        .agg(max("minj").as("iso_e9"))
        .withColumn("raw_e9", expr("pos_k * 1000000000 div n_k"))
        .select("k", "n_k", "pos_k", "raw_e9", "iso_e9")
        .orderBy("k")
    }),

    // ── G249: RLE layout advisor (runs without windows) ────────────────
    // How compressible is each column under the candidate sort order
    // (status, priority, month)? The naive run count lags every row
    // over a GLOBAL ordered window — the canonical scale-killer. The
    // identity that kills it: under a prefix sort, each key column's
    // runs are CONTIGUOUS, so runs(col_i) = COUNT(DISTINCT prefix_i) —
    // three distinct-counts from one scan, no ordering anywhere in the
    // plan. Emits runs, the e4 compression ratio (runs/rows), and the
    // advisor verdict runs·20 < rows ("RLE wins" at 20:1).
    "q304_rle_advisor" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(col("o_orderstatus").as("st"),
        col("o_orderpriority").as("pr"),
        date_format(col("o_orderdate"), "yyyy-MM").as("mo"))
      val agg = o.agg(count(lit(1)).as("n_rows"),
        countDistinct(col("st")).as("r1"),
        countDistinct(col("st"), col("pr")).as("r2"),
        countDistinct(col("st"), col("pr"), col("mo")).as("r3"))
      agg.select(explode(array(
          struct(lit("1_status").as("column_name"), col("r1").as("runs"), col("n_rows")),
          struct(lit("2_priority").as("column_name"), col("r2").as("runs"), col("n_rows")),
          struct(lit("3_month").as("column_name"), col("r3").as("runs"), col("n_rows"))))
          .as("e"))
        .select(col("e.column_name"), col("e.runs"), col("e.n_rows"))
        .withColumn("ratio_e4", expr("runs * 10000 div n_rows"))
        .withColumn("rle_wins", expr("runs * 20 < n_rows"))
        .orderBy("column_name")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q301_markov_eval" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
        |                  CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS sec FROM events),
        |t AS (SELECT user_id, event_type,
        |        LEAD(event_type) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS next_type
        |      FROM e),
        |tr AS (SELECT *, CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4) AS BIGINT) % 4 < 3 AS is_train
        |       FROM t WHERE next_type IS NOT NULL),
        |m AS (SELECT event_type, next_type AS pred FROM (
        |        SELECT event_type, next_type, COUNT(*) AS c,
        |          ROW_NUMBER() OVER (PARTITION BY event_type
        |            ORDER BY COUNT(*) DESC, next_type) AS rn
        |        FROM tr WHERE is_train GROUP BY event_type, next_type)
        |      WHERE rn = 1)
        |SELECT tr.event_type, CAST(COUNT(*) AS BIGINT) AS n_test,
        |       CAST(SUM(CASE WHEN tr.next_type = m.pred THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
        |       CAST(SUM(CASE WHEN tr.next_type = m.pred THEN 1 ELSE 0 END) * 10000
        |            // COUNT(*) AS BIGINT) AS acc_e4
        |FROM tr LEFT JOIN m ON tr.event_type = m.event_type
        |WHERE NOT is_train
        |GROUP BY tr.event_type ORDER BY tr.event_type""".stripMargin,

    "q302_channel_lift" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |u AS (SELECT user_id,
        |        MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS cv
        |      FROM ut GROUP BY user_id),
        |tot AS (SELECT COUNT(*) AS n_all, SUM(cv) AS conv_all FROM u),
        |w AS (SELECT ut.event_type, COUNT(*) AS n_with, SUM(u.cv) AS conv_with
        |      FROM ut JOIN u USING (user_id)
        |      WHERE ut.event_type != 'purchase'
        |      GROUP BY ut.event_type)
        |SELECT event_type, CAST(n_with AS BIGINT) AS n_with,
        |       CAST(conv_with * 10000 // n_with AS BIGINT) AS rate_with_e4,
        |       CAST(CASE WHEN n_all > n_with
        |            THEN (conv_all - conv_with) * 10000 // (n_all - n_with) END AS BIGINT) AS rate_without_e4,
        |       CAST(CASE WHEN n_all > n_with AND conv_all > conv_with
        |            THEN (conv_with * 10000 // n_with) * 10000
        |                 // ((conv_all - conv_with) * 10000 // (n_all - n_with)) END AS BIGINT) AS lift_e4
        |FROM w, tot ORDER BY event_type""".stripMargin,

    "q303_isotonic_calibration" ->
      """WITH s AS (SELECT CAST(round(value*1000000) AS BIGINT) AS v6,
        |             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
        |             event_id
        |           FROM events),
        |d AS (SELECT CAST(NTILE(10) OVER (ORDER BY v6, event_id) AS BIGINT) AS k, y FROM s),
        |dec AS (SELECT k, COUNT(*) AS n_k, SUM(y) AS pos_k FROM d GROUP BY k),
        |pre AS (SELECT a.k, a.n_k, a.pos_k, SUM(b.n_k) AS cn, SUM(b.pos_k) AS cp
        |        FROM dec a JOIN dec b ON b.k <= a.k
        |        GROUP BY a.k, a.n_k, a.pos_k),
        |iv AS (SELECT lo.k AS i, hi.k AS j,
        |         (hi.cp - (lo.cp - lo.pos_k)) * 1000000000
        |           // (hi.cn - (lo.cn - lo.n_k)) AS avg_e9
        |       FROM pre lo JOIN pre hi ON lo.k <= hi.k),
        |mj AS (SELECT dec.k, dec.n_k, dec.pos_k, iv.i, MIN(iv.avg_e9) AS minj
        |       FROM dec JOIN iv ON iv.i <= dec.k AND iv.j >= dec.k
        |       GROUP BY dec.k, dec.n_k, dec.pos_k, iv.i)
        |SELECT k, CAST(n_k AS BIGINT) AS n_k, CAST(pos_k AS BIGINT) AS pos_k,
        |       CAST(pos_k * 1000000000 // n_k AS BIGINT) AS raw_e9,
        |       CAST(MAX(minj) AS BIGINT) AS iso_e9
        |FROM mj GROUP BY k, n_k, pos_k ORDER BY k""".stripMargin,

    "q304_rle_advisor" ->
      """WITH o AS (SELECT o_orderstatus AS st, o_orderpriority AS pr,
        |                  strftime(o_orderdate, '%Y-%m') AS mo FROM orders),
        |a AS (SELECT COUNT(*) AS n_rows,
        |        COUNT(DISTINCT st) AS r1,
        |        COUNT(DISTINCT (st, pr)) AS r2,
        |        COUNT(DISTINCT (st, pr, mo)) AS r3
        |      FROM o),
        |e AS (SELECT '1_status' AS column_name, r1 AS runs, n_rows FROM a
        |      UNION ALL SELECT '2_priority', r2, n_rows FROM a
        |      UNION ALL SELECT '3_month', r3, n_rows FROM a)
        |SELECT column_name, CAST(runs AS BIGINT) AS runs,
        |       CAST(n_rows AS BIGINT) AS n_rows,
        |       CAST(runs * 10000 // n_rows AS BIGINT) AS ratio_e4,
        |       runs * 20 < n_rows AS rle_wins
        |FROM e ORDER BY column_name""".stripMargin
  )
}
