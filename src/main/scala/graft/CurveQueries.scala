package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Curve-and-complexity wave (round 10, seventy-fifth wave): Hilbert
  * vs Morton layout economics, and LZ78 compressibility scoring.
  *
  * q458 settles the liquid-clustering question on real keys: map
  * (customer, day) to a 1024×1024 grid, linearize by BOTH
  * space-filling curves — Morton (q159's bit interleave) and Hilbert
  * (the 1891 curve via Hamilton's xy2d bit algorithm, a 10-level
  * fold of quadrant rotations — exact integers, mirrored in the
  * oracle) — bucket each into 4096-cell pages, and count pages
  * touched by 16 fixed design rectangles of varying aspect. Hilbert
  * never splits a locality the way Morton's Z-jumps do; the per-rect
  * winner table says by how much, on THIS data. q459 scores every
  * document's LZ78 phrase complexity (Lempel–Ziv 1978): the
  * incremental-dictionary fold (extend the current phrase while it
  * stays in the dictionary, else emit + reset), phrases ≤ tokens by
  * construction — the integer compressibility signal that flags
  * boilerplate and repetition without a float entropy in sight,
  * aggregated per source beside q78's repetition filter.
  */
object CurveQueries {

  private val Bits = 10
  private val Page = 4096L

  /** 16 fixed query rectangles (design literals, mirrored verbatim). */
  private val Rects: Seq[(Long, Long, Long, Long, Long)] =
    (0 until 16).map { i =>
      val (w, h) = (i % 4) match {
        case 0 => (256L, 256L); case 1 => (1024L, 64L)
        case 2 => (64L, 1024L); case _ => (512L, 512L)
      }
      val x0 = (i * 257L) % (1024L - w.min(1023L))
      val y0 = (i * 971L) % (1024L - h.min(1023L))
      (i.toLong, x0, (x0 + w - 1).min(1023L), y0, (y0 + h - 1).min(1023L))
    }

  /** Hilbert xy2d as one fold expression (Spark dialect). The
    * canonical rotation flips with n−1 = 1023, NOT s−1: the s−1
    * variant drives coordinates negative, where Spark pmod and
    * DuckDB % diverge — q416's trap, met again in the wild. */
  private[graft] def hilbertD(xc: String, yc: String): String = {
    val sE = s"shiftleft(1L, cast(${Bits - 1} - k as int))"
    val rx = s"pmod(acc.x div $sE, 2L)"
    val ry = s"pmod(acc.y div $sE, 2L)"
    s"""aggregate(sequence(0, ${Bits - 1}),
       |  named_struct('x', $xc, 'y', $yc, 'd', 0L),
       |  (acc, k) -> named_struct(
       |    'x', case when $ry = 1L then acc.x
       |         else (case when $rx = 1L then 1023L - acc.y
       |               else acc.y end) end,
       |    'y', case when $ry = 1L then acc.y
       |         else (case when $rx = 1L then 1023L - acc.x
       |               else acc.x end) end,
       |    'd', acc.d + $sE * $sE * ((3L * $rx) ^ $ry)),
       |  st -> st.d)""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G405: Hilbert vs Morton page-touch economics ───────────────────
    "q458_hilbert_layout" -> ((s, dir) => {
      // spread: the per-row Hilbert + Morton curve folds otherwise run
      // inside the single-row-group scan's one task (guide §2.5)
      val pts = graft.ops.Relational.spread(Tables.orders(s, dir))
        .select(expr("pmod(o_custkey, 1024)").as("x0"),
          expr("pmod(cast(datediff(to_date(o_orderdate), " +
            "to_date('1990-01-01')) as bigint), 1024)").as("y0"))
        .withColumn("hd", expr(hilbertD("x0", "y0")))
        .withColumn("zd", expr(
          s"""aggregate(sequence(0, ${Bits - 1}), 0L, (a, k) ->
             |  a + shiftleft(pmod(x0 div shiftleft(1L, k), 2L),
             |        cast(2 * k as int))
             |    + shiftleft(pmod(y0 div shiftleft(1L, k), 2L),
             |        cast(2 * k + 1 as int)))""".stripMargin))
        .withColumn("hp", expr(s"hd div $Page"))
        .withColumn("zp", expr(s"zd div $Page"))
      val rects = s.createDataFrame(Rects).toDF("rid", "rx0", "rx1", "ry0", "ry1")
      pts.crossJoin(broadcast(rects))
        .filter(col("x0").between(col("rx0"), col("rx1")) &&
          col("y0").between(col("ry0"), col("ry1")))
        .groupBy("rid")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("hp")).as("h_pages"),
          countDistinct(col("zp")).as("z_pages"))
        .withColumn("hilbert_wins", expr(
          "case when h_pages < z_pages then 1L else 0L end"))
        .withColumn("morton_wins", expr(
          "case when z_pages < h_pages then 1L else 0L end"))
        .select("rid", "n_rows", "h_pages", "z_pages", "hilbert_wins",
          "morton_wins")
        .orderBy("rid")
    }),

    // ── G406: LZ78 phrase complexity per document ──────────────────────
    "q459_lz_complexity" -> ((s, dir) => {
      import graft.functions.TextFunctions.tokens
      // spread: the per-doc LZ78 dictionary fold otherwise runs inside
      // the single-row-group scan's one task (guide §2.5)
      val perDoc = graft.ops.Relational.spread(Tables.documents(s, dir))
        .select(col("doc_id"), col("source"),
          tokens(lower(col("text"))).as("ts"))
        .filter(size(col("ts")) >= 1)
        .withColumn("n_toks", size(col("ts")).cast("long"))
        .withColumn("ph", expr(
          """aggregate(ts,
            |  named_struct('dict', cast(array() as array<string>),
            |               'cur', '', 'ph', 0L),
            |  (acc, z) -> case when array_contains(acc.dict,
            |      case when acc.cur = '' then z
            |           else concat(acc.cur, ' ', z) end)
            |    then named_struct('dict', acc.dict,
            |      'cur', case when acc.cur = '' then z
            |             else concat(acc.cur, ' ', z) end,
            |      'ph', acc.ph)
            |    else named_struct(
            |      'dict', concat(acc.dict, array(
            |        case when acc.cur = '' then z
            |             else concat(acc.cur, ' ', z) end)),
            |      'cur', '', 'ph', acc.ph + 1L) end,
            |  st -> st.ph + (case when st.cur != '' then 1L else 0L end))"""
            .stripMargin))
        .withColumn("ratio_e4", expr("ph * 10000 div n_toks"))
      perDoc.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"),
          sum("ph").as("n_phrases"),
          expr("sum(ratio_e4) div count(1)").as("mean_ratio_e4"),
          min("ratio_e4").as("min_ratio_e4"),
          max("ratio_e4").as("max_ratio_e4"),
          sum(expr("case when ph > n_toks then 1L else 0L end")).as("n_viol"))
        .orderBy("source")
    })
  )

  def oracleSql: Map[String, String] = {
    val rectsSql = Rects.map { case (i, x0, x1, y0, y1) =>
      s"($i, $x0, $x1, $y0, $y1)" }.mkString(", ")
    Map(

    "q458_hilbert_layout" ->
      s"""WITH RECURSIVE pts AS (SELECT
        |    o_orderkey AS k,
        |    o_custkey % 1024 AS x0,
        |    ((date_diff('day', DATE '1990-01-01',
        |      CAST(o_orderdate AS DATE)) % 1024) + 1024) % 1024 AS y0
        |  FROM orders),
        |hil AS (
        |  SELECT k, x0, y0, 0::BIGINT AS step, x0 AS x, y0 AS y,
        |    0::BIGINT AS d
        |  FROM pts
        |  UNION ALL
        |  SELECT k, x0, y0, step + 1,
        |    CASE WHEN (y // (1::BIGINT << (${Bits - 1} - CAST(step AS INT)))) % 2 = 1
        |      THEN x ELSE (CASE WHEN (x // (1::BIGINT <<
        |        (${Bits - 1} - CAST(step AS INT)))) % 2 = 1
        |        THEN 1023 - y
        |        ELSE y END) END,
        |    CASE WHEN (y // (1::BIGINT << (${Bits - 1} - CAST(step AS INT)))) % 2 = 1
        |      THEN y ELSE (CASE WHEN (x // (1::BIGINT <<
        |        (${Bits - 1} - CAST(step AS INT)))) % 2 = 1
        |        THEN 1023 - x
        |        ELSE x END) END,
        |    d + (1::BIGINT << (${Bits - 1} - CAST(step AS INT)))
        |      * (1::BIGINT << (${Bits - 1} - CAST(step AS INT)))
        |      * xor(3 * ((x // (1::BIGINT << (${Bits - 1} - CAST(step AS INT)))) % 2),
        |            (y // (1::BIGINT << (${Bits - 1} - CAST(step AS INT)))) % 2)
        |  FROM hil WHERE step < $Bits),
        |hfin AS (SELECT k, x0, y0, d FROM hil WHERE step = $Bits),
        |mz AS (SELECT k, x0, y0,
        |    list_sum(list_transform(range(0, $Bits), kk ->
        |      ((x0 // (1::BIGINT << CAST(kk AS INT))) % 2)
        |        * (1::BIGINT << CAST(2 * kk AS INT))
        |      + ((y0 // (1::BIGINT << CAST(kk AS INT))) % 2)
        |        * (1::BIGINT << CAST(2 * kk + 1 AS INT)))) AS z
        |  FROM pts),
        |pg AS (SELECT h.k, h.x0, h.y0, h.d // $Page AS hp, mz.z // $Page AS zp
        |  FROM hfin h JOIN mz ON h.k = mz.k),
        |rects(rid, rx0, rx1, ry0, ry1) AS (VALUES $rectsSql)
        |SELECT CAST(r.rid AS BIGINT) AS rid,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(DISTINCT pg.hp) AS BIGINT) AS h_pages,
        |  CAST(COUNT(DISTINCT pg.zp) AS BIGINT) AS z_pages,
        |  CAST(CASE WHEN COUNT(DISTINCT pg.hp) < COUNT(DISTINCT pg.zp)
        |    THEN 1 ELSE 0 END AS BIGINT) AS hilbert_wins,
        |  CAST(CASE WHEN COUNT(DISTINCT pg.zp) < COUNT(DISTINCT pg.hp)
        |    THEN 1 ELSE 0 END AS BIGINT) AS morton_wins
        |FROM pg JOIN rects r ON pg.x0 BETWEEN r.rx0 AND r.rx1
        |  AND pg.y0 BETWEEN r.ry0 AND r.ry1
        |GROUP BY r.rid ORDER BY rid""".stripMargin,

    "q459_lz_complexity" ->
      """WITH RECURSIVE t AS (SELECT doc_id, source,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS ts
        |  FROM documents WHERE len(regexp_split_to_array(
        |    trim(lower(text)), '\s+')) >= 1),
        |seq AS (SELECT doc_id, source, len(ts) AS n_toks,
        |    UNNEST(ts) AS tok, generate_subscripts(ts, 1) AS i FROM t),
        |rec AS (
        |  SELECT doc_id, 0::BIGINT AS i, CAST([] AS VARCHAR[]) AS dict,
        |    '' AS cur, 0::BIGINT AS ph
        |  FROM t
        |  UNION ALL
        |  SELECT s.doc_id, s.i,
        |    CASE WHEN list_contains(r.dict,
        |        CASE WHEN r.cur = '' THEN s.tok
        |             ELSE r.cur || ' ' || s.tok END)
        |      THEN r.dict
        |      ELSE list_append(r.dict,
        |        CASE WHEN r.cur = '' THEN s.tok
        |             ELSE r.cur || ' ' || s.tok END) END,
        |    CASE WHEN list_contains(r.dict,
        |        CASE WHEN r.cur = '' THEN s.tok
        |             ELSE r.cur || ' ' || s.tok END)
        |      THEN (CASE WHEN r.cur = '' THEN s.tok
        |            ELSE r.cur || ' ' || s.tok END)
        |      ELSE '' END,
        |    r.ph + CASE WHEN list_contains(r.dict,
        |        CASE WHEN r.cur = '' THEN s.tok
        |             ELSE r.cur || ' ' || s.tok END) THEN 0 ELSE 1 END
        |  FROM rec r JOIN seq s ON s.doc_id = r.doc_id AND s.i = r.i + 1),
        |fin AS (SELECT r.doc_id, s2.source, s2.n_toks,
        |    r.ph + (CASE WHEN r.cur != '' THEN 1 ELSE 0 END) AS ph
        |  FROM rec r
        |  JOIN (SELECT DISTINCT doc_id, source, n_toks FROM seq) s2
        |    ON r.doc_id = s2.doc_id
        |  WHERE r.i = s2.n_toks),
        |rt AS (SELECT *, ph * 10000 // n_toks AS ratio_e4 FROM fin)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
        |  CAST(SUM(ph) AS BIGINT) AS n_phrases,
        |  CAST(SUM(ratio_e4) // COUNT(*) AS BIGINT) AS mean_ratio_e4,
        |  CAST(MIN(ratio_e4) AS BIGINT) AS min_ratio_e4,
        |  CAST(MAX(ratio_e4) AS BIGINT) AS max_ratio_e4,
        |  CAST(SUM(CASE WHEN ph > n_toks THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_viol
        |FROM rt GROUP BY source ORDER BY source""".stripMargin
    )
  }
}
