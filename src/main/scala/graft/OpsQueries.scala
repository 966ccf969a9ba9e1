package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Relational.boundedGlobalRank

/** Operations-engineering operators (round 9, twenty-second wave):
  * change-log compaction, the watermark-lateness operating curve,
  * max-min fair quota allocation, and degree assortativity.
  *
  * Reference intent: the reference's log is append-only and its one
  * stream has no lateness policy or capacity control
  * (services/airflow/dags/spark_streaming.py); operating a 100-TB
  * pipeline means compacting change logs, CHOOSING a watermark from
  * the observed lateness curve, rationing shared capacity fairly, and
  * knowing the dup graph's mixing structure. Exact integers.
  */
object OpsQueries {

  /** Plan-time md5 hex (ring vnode positions are literals, not per-row
    * work); same digest as SQL md5() so the oracle regenerates the ring. */
  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G202: change-log compaction (last-writer-wins + tombstones) ────
    // The Kafka-compaction read: a deterministic I/U/D change log
    // (derived relationally from orders — both engines generate the
    // identical log, no fixture) compacts to each key's LAST write,
    // with DELETE tombstones erasing the key. One (key)-partitioned
    // rank over the log + a tombstone filter; the ledger counts live /
    // deleted / superseded rows and checksums the survivor state
    // (q220 discipline — commits to the exact compacted table without
    // shipping it). q121 merges a DELTA into a base; THIS collapses
    // the raw log itself — the upstream half of the CDC story.
    "q257_log_compaction" -> ((s, dir) => {
      val log = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("v_c"))
        .withColumn("seq", explode(expr(
          "sequence(0, cast(conv(substring(md5(cast(k as string)), 1, 2), 16, 10) as int) % 3)")))
        .withColumn("op", expr(
          """case when seq = 0 then 'I'
            |     when cast(conv(substring(md5(concat(cast(k as string), '#', cast(seq as string))), 1, 2), 16, 10) as bigint) % 5 = 0 then 'D'
            |     else 'U' end""".stripMargin))
        .withColumn("v_c", expr("v_c + seq * 7"))
      val w = Window.partitionBy("k").orderBy(col("seq").desc)
      val last = log.withColumn("rn", row_number().over(w))
      val survivors = last.filter(col("rn") === 1 && col("op") =!= "D")
      val counts = last.agg(
        count(lit(1)).as("n_log_rows"),
        sum(when(col("rn") === 1 && col("op") =!= "D", 1L).otherwise(0L)).as("n_live"),
        sum(when(col("rn") === 1 && col("op") === "D", 1L).otherwise(0L)).as("n_tombstoned"),
        sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_superseded"))
      counts.crossJoin(survivors.agg(
        sum(expr(
          "cast(conv(substring(md5(concat(cast(k as string), '=', cast(v_c as string))), 1, 12), 16, 10) as decimal(38,0))"))
          .as("state_checksum")))
    }),

    // ── G203: watermark-lateness operating curve (what-if sweep) ───────
    // q168 measured delay percentiles; the DECISION needs the curve:
    // for delay D ∈ {1h, 6h, 24h, 72h}, what fraction of rows would a
    // D-watermark drop? Arrival order = event_id (the measured stream
    // order), delay = running-max event time minus own time — computed
    // ONCE on one (type)-ordered window exchange, then the four
    // operating points are conditional sums over the same pass. The
    // four-row-per-type curve is what you pin to the SLA, not a
    // folklore "10 minutes".
    "q258_lateness_curve" -> ((s, dir) => {
      val w = Window.partitionBy("event_type").orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val delays = Tables.events(s, dir)
        .select(col("event_type"), col("event_id"), unix_micros(col("ts")).as("us"))
        .withColumn("delay_s", expr("greatest(max(us) over (partition by event_type order by event_id rows unbounded preceding) - us, 0L) div 1000000"))
      val grid = Seq(3600L, 21600L, 86400L, 259200L)
      delays.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          grid.map(d => sum(when(col("delay_s") > d, 1L).otherwise(0L))
            .as(s"drop_$d")): _*)
        .selectExpr("event_type", "n",
          s"stack(4, ${grid.map(d => s"${d}L, drop_$d").mkString(", ")}) as (delay_s, n_dropped)")
        .withColumn("drop_e6", expr("n_dropped * 1000000 div n"))
        .orderBy("event_type", "delay_s")
    }),

    // ── G204: max-min fair quota allocation (water-filling) ────────────
    // Ration capacity C = ½·Σdemand across event types max-min fairly.
    // Closed form on sorted demands: per rank k the candidate level is
    // (C − prefix-below_k) / (n − k + 1), and the true water level is
    // L* = max_k of those candidates (for ranks past the break the
    // candidate goes negative and the max ignores it — the classical
    // identity Σ min(dᵢ, L*) = C solved without iteration); every
    // type gets min(demand, ⌊L*⌋). Rank/prefix/max windows on a
    // |types|-row table — no loop, provably Σalloc ≤ C with max-min
    // optimality (spec asserts both).
    "q259_fair_share" -> ((s, dir) => {
      val demand = Tables.events(s, dir)
        .groupBy("event_type").agg(count(lit(1)).as("d"))
      val w = boundedGlobalRank(col("d").asc, col("event_type").asc)
      val ranked = demand
        .withColumn("rk", row_number().over(w).cast(LongType))
        .withColumn("below", coalesce(sum("d").over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("n_types", count(lit(1)).over(
          Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      val total = demand.agg(sum("d").as("td"))
      val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      ranked.crossJoin(broadcast(total))
        .withColumn("c", expr("td div 2"))
        .withColumn("cand", expr(
          """case when c - below < 0 then -((below - c) div (n_types - rk + 1) + 1)
            |     else (c - below) div (n_types - rk + 1) end""".stripMargin))
        .withColumn("level", max("cand").over(wAll))
        .withColumn("alloc", greatest(least(col("d"), col("level")), lit(0L)))
        .select("event_type", "d", "rk", "level", "alloc")
        .orderBy("rk")
    }),

    // ── G205: degree assortativity of the dup graph (mixing structure) ─
    // Do high-degree documents duplicate other high-degree documents?
    // The Pearson correlation of endpoint degrees over the landed pair
    // table — all five moments exact DECIMAL(38,0) (q67's discipline),
    // the final r is the single engine-identical double. Assortative
    // (r>0) dup graphs mean template farms; disassortative ones mean
    // hub-and-spoke near-copies — it changes which clustering
    // strategy scales (q64's exponent is degree-mixing-sensitive).
    "q260_degree_assortativity" -> ((s, dir) => {
      val pairs = FeatureQueries.dupPairsTable(s, dir).select("doc_a", "doc_b")
      val deg = pairs.select(col("doc_a").as("d")).union(pairs.select(col("doc_b").as("d")))
        .groupBy("d").agg(count(lit(1)).as("deg"))
      val dec = DecimalType(38, 0)
      val e = pairs
        .join(deg.select(col("d").as("doc_a"), col("deg").as("da")), "doc_a")
        .join(deg.select(col("d").as("doc_b"), col("deg").as("db")), "doc_b")
        // symmetrize: each edge contributes both (da,db) and (db,da)
        .select(col("da").as("x"), col("db").as("y"))
      val sym = e.union(e.select(col("y").as("x"), col("x").as("y")))
      sym.agg(count(lit(1)).as("n"),
          sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
          sum((col("x") * col("x")).cast(dec)).as("sxx"),
          sum((col("y") * col("y")).cast(dec)).as("syy"),
          sum((col("x") * col("y")).cast(dec)).as("sxy"))
        .withColumn("num", expr("cast(n as decimal(38,0)) * sxy - sx * sy"))
        .withColumn("denx", expr("cast(n as decimal(38,0)) * sxx - sx * sx"))
        .withColumn("deny", expr("cast(n as decimal(38,0)) * syy - sy * sy"))
        .withColumn("r", expr(
          "cast(num as double) / sqrt(cast(denx as double) * cast(deny as double))"))
        .select(col("n"), col("num"), col("denx"), col("deny"), col("r"))
    }),

    // ── G217: consistent-hash shard map audit (q272) ───────────────────
    // The layout question every 1000-executor deployment answers before
    // it moves a byte: hash documents onto a 4-node × 32-vnode md5 ring
    // (owner = first vnode clockwise of md5(doc_id), wrapping), then add
    // a 5th node and measure the REMAP — consistent hashing's whole
    // point is that only ~1/(n+1) of keys move, vs ~n/(n+1) for mod-n.
    // The ring is 128/160 plan-time md5 constants (a generated frame,
    // broadcast); assignment is one broadcast join + min-aggregate per
    // epoch — the corpus never shuffles on the ring, only on doc_id.
    // Output: per-node doc counts before/after + the moved-doc count,
    // ORDER BY node; the spec checks the remap fraction against theory.
    "q272_consistent_hash" -> ((s, dir) => {
      def ring(nodes: Int): DataFrame = {
        import s.implicits._
        (for { n <- 0 until nodes; v <- 0 until 32 }
          yield (md5Hex(s"node$n:v$v"), n.toLong))
          .toDF("pos", "node")
      }
      // spread: each epoch's 128/160-way broadcast ring fan-out + partial
      // min-agg otherwise runs inside the single-row-group scan's one task
      val docs = graft.ops.Relational.spread(Tables.documents(s, dir))
        .select(col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
      def owners(nodes: Int): DataFrame = {
        val r = ring(nodes)
        docs.crossJoin(broadcast(r))
          .groupBy("doc_id", "h")
          .agg(
            min(when(col("pos") >= col("h"), struct(col("pos"), col("node")))).as("cw"),
            min(struct(col("pos"), col("node"))).as("wrap"))
          .select(col("doc_id"),
            coalesce(col("cw.node"), col("wrap.node")).as("owner"))
      }
      val before = owners(4).withColumnRenamed("owner", "o4")
      val after = owners(5).withColumnRenamed("owner", "o5")
      val both = before.join(after, "doc_id")
      both.groupBy(col("o4").as("node"))
        .agg(count(lit(1)).as("n_before"),
          sum(when(col("o4") =!= col("o5"), 1L).otherwise(0L)).as("n_moved"))
        .join(after.groupBy(col("o5").as("node"))
          .agg(count(lit(1)).as("n_after")), Seq("node"), "full_outer")
        .select(col("node"),
          coalesce(col("n_before"), lit(0L)).as("n_before"),
          coalesce(col("n_after"), lit(0L)).as("n_after"),
          coalesce(col("n_moved"), lit(0L)).as("n_moved"))
        .orderBy("node")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q257_log_compaction" ->
      """WITH log0 AS (SELECT o_orderkey AS k,
        |               CAST(round(o_totalprice * 100) AS BIGINT) AS v0,
        |               UNNEST(range(0, CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2)
        |                 AS BIGINT) % 3 + 1)) AS seq
        |             FROM orders),
        |log1 AS (SELECT k, seq, v0 + seq * 7 AS v_c,
        |           CASE WHEN seq = 0 THEN 'I'
        |                WHEN CAST('0x' || substr(md5(CAST(k AS VARCHAR) || '#' ||
        |                  CAST(seq AS VARCHAR)), 1, 2) AS BIGINT) % 5 = 0 THEN 'D'
        |                ELSE 'U' END AS op
        |         FROM log0),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
        |      FROM log1),
        |counts AS (SELECT COUNT(*) AS n_log_rows,
        |    SUM(CASE WHEN rn = 1 AND op != 'D' THEN 1 ELSE 0 END) AS n_live,
        |    SUM(CASE WHEN rn = 1 AND op = 'D' THEN 1 ELSE 0 END) AS n_tombstoned,
        |    SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS n_superseded
        |  FROM r),
        |chk AS (SELECT SUM(CAST(CAST('0x' || substr(md5(CAST(k AS VARCHAR) || '=' ||
        |          CAST(v_c AS VARCHAR)), 1, 12) AS BIGINT) AS HUGEINT)) AS state_checksum
        |        FROM r WHERE rn = 1 AND op != 'D')
        |SELECT CAST(n_log_rows AS BIGINT) AS n_log_rows,
        |       CAST(n_live AS BIGINT) AS n_live,
        |       CAST(n_tombstoned AS BIGINT) AS n_tombstoned,
        |       CAST(n_superseded AS BIGINT) AS n_superseded,
        |       CAST(chk.state_checksum AS DECIMAL(38,0)) AS state_checksum
        |FROM counts, chk""".stripMargin,

    "q258_lateness_curve" ->
      """WITH d AS (SELECT event_type, event_id, epoch_us(ts) AS us FROM events),
        |x AS (SELECT event_type,
        |        GREATEST(MAX(us) OVER (PARTITION BY event_type ORDER BY event_id
        |          ROWS UNBOUNDED PRECEDING) - us, 0) // 1000000 AS delay_s
        |      FROM d),
        |a AS (SELECT event_type, COUNT(*) AS n,
        |        SUM(CASE WHEN delay_s > 3600 THEN 1 ELSE 0 END) AS d1,
        |        SUM(CASE WHEN delay_s > 21600 THEN 1 ELSE 0 END) AS d2,
        |        SUM(CASE WHEN delay_s > 86400 THEN 1 ELSE 0 END) AS d3,
        |        SUM(CASE WHEN delay_s > 259200 THEN 1 ELSE 0 END) AS d4
        |      FROM x GROUP BY event_type),
        |u AS (SELECT event_type, n, 3600 AS delay_s, d1 AS n_dropped FROM a
        |      UNION ALL SELECT event_type, n, 21600, d2 FROM a
        |      UNION ALL SELECT event_type, n, 86400, d3 FROM a
        |      UNION ALL SELECT event_type, n, 259200, d4 FROM a)
        |SELECT event_type, CAST(n AS BIGINT) AS n, CAST(delay_s AS BIGINT) AS delay_s,
        |       CAST(n_dropped AS BIGINT) AS n_dropped,
        |       CAST(n_dropped * 1000000 // n AS BIGINT) AS drop_e6
        |FROM u ORDER BY event_type, delay_s""".stripMargin,

    "q259_fair_share" ->
      """WITH demand AS (SELECT event_type, COUNT(*) AS d FROM events GROUP BY 1),
        |r AS (SELECT event_type, d,
        |        CAST(ROW_NUMBER() OVER (ORDER BY d, event_type) AS BIGINT) AS rk,
        |        COALESCE(SUM(d) OVER (ORDER BY d, event_type
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below,
        |        COUNT(*) OVER () AS n_types,
        |        SUM(d) OVER () AS td
        |      FROM demand),
        |c2 AS (SELECT *, td // 2 AS c,
        |         CASE WHEN (td // 2) - below < 0
        |              THEN -((below - (td // 2)) // (n_types - rk + 1) + 1)
        |              ELSE ((td // 2) - below) // (n_types - rk + 1) END AS cand
        |       FROM r),
        |l AS (SELECT *, MAX(cand) OVER () AS level FROM c2)
        |SELECT event_type, CAST(d AS BIGINT) AS d, rk,
        |       CAST(level AS BIGINT) AS level,
        |       CAST(GREATEST(LEAST(d, level), 0) AS BIGINT) AS alloc
        |FROM l ORDER BY rk""".stripMargin,

    "q260_degree_assortativity" -> {
      val q23 = TextQueries.oracleSql("q23_minhash_dup_pairs")
      s"""WITH p AS (SELECT doc_a, doc_b FROM ($q23)),
         |deg AS (SELECT d, COUNT(*) AS deg FROM (
         |          SELECT doc_a AS d FROM p UNION ALL SELECT doc_b FROM p)
         |        GROUP BY d),
         |e AS (SELECT da.deg AS x, db.deg AS y
         |      FROM p JOIN deg da ON da.d = p.doc_a
         |             JOIN deg db ON db.d = p.doc_b),
         |sym AS (SELECT x, y FROM e UNION ALL SELECT y AS x, x AS y FROM e),
         |m AS (SELECT COUNT(*) AS n,
         |        SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         |        SUM(CAST(x AS HUGEINT) * x) AS sxx, SUM(CAST(y AS HUGEINT) * y) AS syy,
         |        SUM(CAST(x AS HUGEINT) * y) AS sxy
         |      FROM sym)
         |SELECT CAST(n AS BIGINT) AS n,
         |       CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DECIMAL(38,0)) AS num,
         |       CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DECIMAL(38,0)) AS denx,
         |       CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DECIMAL(38,0)) AS deny,
         |       CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE) /
         |         sqrt(CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE) *
         |              CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE)) AS r
         |FROM m""".stripMargin
    },

    "q272_consistent_hash" ->
      """WITH ring AS (SELECT md5('node' || CAST(n AS VARCHAR) || ':v' || CAST(vv AS VARCHAR)) AS pos,
        |                     n AS node
        |              FROM range(0, 5) t(n), range(0, 32) u(vv)),
        |r4 AS (SELECT * FROM ring WHERE node < 4),
        |d AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
        |p4 AS (SELECT d.doc_id,
        |         COALESCE(MIN(CASE WHEN r.pos >= d.h THEN r.pos END), MIN(r.pos)) AS opos
        |       FROM d CROSS JOIN r4 r GROUP BY d.doc_id, d.h),
        |w4 AS (SELECT p4.doc_id, r.node AS o4 FROM p4 JOIN r4 r ON r.pos = p4.opos),
        |p5 AS (SELECT d.doc_id,
        |         COALESCE(MIN(CASE WHEN r.pos >= d.h THEN r.pos END), MIN(r.pos)) AS opos
        |       FROM d CROSS JOIN ring r GROUP BY d.doc_id, d.h),
        |w5 AS (SELECT p5.doc_id, r.node AS o5 FROM p5 JOIN ring r ON r.pos = p5.opos),
        |b AS (SELECT w4.doc_id, o4, o5 FROM w4 JOIN w5 USING (doc_id)),
        |bef AS (SELECT o4 AS node, COUNT(*) AS n_before,
        |          SUM(CASE WHEN o4 != o5 THEN 1 ELSE 0 END) AS n_moved
        |        FROM b GROUP BY o4),
        |aft AS (SELECT o5 AS node, COUNT(*) AS n_after FROM b GROUP BY o5)
        |SELECT COALESCE(bef.node, aft.node) AS node,
        |       CAST(COALESCE(n_before, 0) AS BIGINT) AS n_before,
        |       CAST(COALESCE(n_after, 0) AS BIGINT) AS n_after,
        |       CAST(COALESCE(n_moved, 0) AS BIGINT) AS n_moved
        |FROM bef FULL OUTER JOIN aft ON bef.node = aft.node
        |ORDER BY node""".stripMargin
  )
}
