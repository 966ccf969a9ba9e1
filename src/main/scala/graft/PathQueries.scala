package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Navigation, sampling and storage-advice operators (round 9,
  * nineteenth wave): session path census, deterministic negative
  * sampling for training pairs, and a dictionary-encoding advisor.
  *
  * Reference intent: the reference renders one store's series at a
  * time (services/web-ui/app/main.py) — it never asks "how do users
  * move", never constructs training negatives, never chooses an
  * encoding. All three are daily jobs on a 100-TB pipeline; all three
  * are here as exact relational plans.
  */
object PathQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G193: session path census (top navigation prefixes) ────────────
    // q115 counts transitions (bigrams), q164 trigram windows; the
    // navigation question is about PATHS: the first three steps of
    // each (user, day) session, censused. Deterministic ordered
    // collection — sort_array over (ts, event_id, type) structs makes
    // collect_list order-independent — then a prefix slice and one
    // census aggregate. Per-session state is ≤3 structs however long
    // the session; the census key space is |types|³-bounded.
    "q248_path_census" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(sort_array(collect_list(struct(col("ts"), col("event_id"),
          col("event_type")))).as("evs"))
        .withColumn("path", expr(
          "array_join(transform(slice(evs, 1, 3), x -> x.event_type), '>')"))
        .groupBy("path")
        .agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path").asc)
        .limit(10)
    }),

    // ── G194: deterministic negative sampling (training-pair build) ────
    // Recommender/contrastive training needs (user, item⁻) pairs the
    // user did NOT touch. RNG-free: for each positive (c, p) and draw
    // j ∈ 1..3, candidate = parts[md5(c,p,j) mod |parts|], anti-joined
    // against the user's positives, keep the first 2 survivors by draw
    // order. The ledger (drawn / self-collisions / kept / per-rank
    // checksum) is exact; the emitted CHECKSUM commits to the exact
    // sampled multiset without shipping it (q220's order-independent
    // DECIMAL discipline). Plan: positives × 3 broadcast draws, one
    // equi-join on the dense part index (broadcast dim), one anti-join
    // on positives — never a corpus×parts cross.
    "q249_negative_samples" -> ((s, dir) => {
      val pos = FlowQueries.ratingsTable(s, dir).select("c", "p")
      // dense 1..N part index via contiguousIds over a range-partitioned
      // sort — the part dimension grows with SF, so no unpartitioned
      // row_number window; ids are identical (partition-major = key order).
      val dim = graft.ops.Relational.contiguousIds(
          Tables.part(s, dir).select(col("p_partkey"))
            .repartitionByRange(32, col("p_partkey"))
            .sortWithinPartitions("p_partkey"), "__r0")
        .withColumn("idx", (col("__r0") + 1).cast(LongType)).drop("__r0")
      // same value as dim.count() (one id row per part row) without
      // executing the contiguousIds zipWithIndex jobs at plan-build time
      val nParts = Tables.part(s, dir).count()
      val draws = pos.crossJoin(broadcast(s.range(1, 4).select(col("id").as("j"))))
        .withColumn("idx", expr(
          s"""cast(conv(substring(md5(concat(cast(c as string), ':', cast(p as string),
             |  ':', cast(j as string))), 1, 12), 16, 10) as bigint) % $nParts + 1""".stripMargin))
        .join(dim, "idx")
        .withColumn("neg_p", col("p_partkey"))
      val nonSelf = draws.filter(col("neg_p") =!= col("p"))
      val survivors = nonSelf.join(
          pos.select(col("c"), col("p").as("neg_p")).withColumn("hit", lit(true)),
          Seq("c", "neg_p"), "left")
        .filter(col("hit").isNull)
        .withColumn("rk", row_number().over(
          Window.partitionBy("c", "p").orderBy("j")))
        .filter(col("rk") <= 2)
      survivors.groupBy(col("rk").cast(LongType).as("rk"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(expr(
            "cast(conv(substring(md5(concat(cast(c as string), '|', cast(neg_p as string))), 1, 12), 16, 10) as decimal(38,0))"))
            .as("checksum"))
        .orderBy("rk")
    }),

    // ── G195: dictionary-encoding advisor (storage layout economics) ───
    // Which columns should dictionary-encode? Exact integer model from
    // ONE scan: stack the candidate columns to (col, val) rows, then
    // raw_bytes = Σ string length, dict_bytes = Σ distinct-value
    // lengths + ⌈n·ceil_log2(ndv)/8⌉ — ceil_log2 as length(bin(ndv−1)),
    // engine-mirrored. The low-NDV status/priority columns win big,
    // the key column loses; ratio_e4 IS the advisor's verdict, the
    // same arithmetic a columnar writer runs per row group at scale.
    "q250_dict_advisor" -> ((s, dir) => {
      val stacked = Tables.orders(s, dir).selectExpr(
        """explode(array(
          |  struct('o_orderstatus' as cname, o_orderstatus as v),
          |  struct('o_orderpriority' as cname, o_orderpriority as v),
          |  struct('o_orderkey' as cname, cast(o_orderkey as string) as v))) as e"""
          .stripMargin)
        .select(col("e.cname").as("cname"), col("e.v").as("v"))
      val perVal = stacked.groupBy("cname", "v")
        .agg(count(lit(1)).as("n"))
        .withColumn("len", length(col("v")).cast(LongType))
      perVal.groupBy("cname")
        .agg(sum("n").as("n_rows"), count(lit(1)).as("ndv"),
          sum(expr("n * len")).as("raw_bytes"),
          sum("len").as("dict_entry_bytes"))
        .withColumn("bitw", expr(
          "case when ndv <= 1 then 0 else length(bin(ndv - 1)) end").cast(LongType))
        .withColumn("dict_bytes", expr("dict_entry_bytes + (n_rows * bitw + 7) div 8"))
        .withColumn("ratio_e4", expr("dict_bytes * 10000 div raw_bytes"))
        .select("cname", "n_rows", "ndv", "raw_bytes", "dict_bytes", "ratio_e4")
        .orderBy("cname")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q248_path_census" ->
      """WITH sess AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |                (list(event_type ORDER BY ts, event_id))[1:3] AS p3
        |              FROM events GROUP BY 1, 2)
        |SELECT array_to_string(p3, '>') AS path, COUNT(*) AS n_sessions
        |FROM sess GROUP BY 1
        |ORDER BY n_sessions DESC, path LIMIT 10""".stripMargin,

    "q249_negative_samples" ->
      """WITH pos AS (SELECT o.o_custkey AS c, l.l_partkey AS p
        |             FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |             GROUP BY 1, 2),
        |dim AS (SELECT p_partkey, CAST(ROW_NUMBER() OVER (ORDER BY p_partkey)
        |          AS BIGINT) AS idx FROM part),
        |np AS (SELECT COUNT(*) AS n FROM part),
        |draws AS (SELECT pos.c, pos.p, j.j,
        |            CAST('0x' || substr(md5(CAST(pos.c AS VARCHAR) || ':' ||
        |              CAST(pos.p AS VARCHAR) || ':' || CAST(j.j AS VARCHAR)), 1, 12)
        |              AS BIGINT) % np.n + 1 AS idx
        |          FROM pos CROSS JOIN (SELECT UNNEST(range(1, 4)) AS j) j, np),
        |cand AS (SELECT d.c, d.p, d.j, dim.p_partkey AS neg_p
        |         FROM draws d JOIN dim USING (idx)
        |         WHERE dim.p_partkey != d.p),
        |surv AS (SELECT cand.*,
        |           ROW_NUMBER() OVER (PARTITION BY cand.c, cand.p ORDER BY cand.j) AS rk
        |         FROM cand LEFT JOIN pos p2
        |           ON p2.c = cand.c AND p2.p = cand.neg_p
        |         WHERE p2.c IS NULL)
        |SELECT CAST(rk AS BIGINT) AS rk, COUNT(*) AS n_pairs,
        |       SUM(CAST(CAST('0x' || substr(md5(CAST(c AS VARCHAR) || '|' ||
        |         CAST(neg_p AS VARCHAR)), 1, 12) AS BIGINT) AS HUGEINT)) AS checksum
        |FROM surv WHERE rk <= 2 GROUP BY rk ORDER BY rk""".stripMargin,

    "q250_dict_advisor" ->
      """WITH stacked AS (
        |  SELECT 'o_orderstatus' AS cname, o_orderstatus AS v FROM orders
        |  UNION ALL
        |  SELECT 'o_orderpriority', o_orderpriority FROM orders
        |  UNION ALL
        |  SELECT 'o_orderkey', CAST(o_orderkey AS VARCHAR) FROM orders),
        |pv AS (SELECT cname, v, COUNT(*) AS n, CAST(length(v) AS BIGINT) AS len
        |       FROM stacked GROUP BY 1, 2),
        |agg AS (SELECT cname, SUM(n) AS n_rows, COUNT(*) AS ndv,
        |          SUM(n * len) AS raw_bytes, SUM(len) AS dict_entry_bytes
        |        FROM pv GROUP BY cname),
        |b AS (SELECT *, CASE WHEN ndv <= 1 THEN 0
        |        ELSE CAST(length(printf('%b', ndv - 1)) AS BIGINT) END AS bitw
        |      FROM agg)
        |SELECT cname, CAST(n_rows AS BIGINT) AS n_rows, CAST(ndv AS BIGINT) AS ndv,
        |       CAST(raw_bytes AS BIGINT) AS raw_bytes,
        |       CAST(dict_entry_bytes + (n_rows * bitw + 7) // 8 AS BIGINT) AS dict_bytes,
        |       CAST((dict_entry_bytes + (n_rows * bitw + 7) // 8) * 10000
        |            // raw_bytes AS BIGINT) AS ratio_e4
        |FROM b ORDER BY cname""".stripMargin
  )
}
