package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Graph link-structure analytics over the near-dup pair graph (round
  * 10, twenty-eighth wave): common-neighbor link prediction, majority
  * label propagation (2 synchronous rounds), edge embeddedness, and
  * modularity of the propagated communities.
  *
  * Reference intent: the reference has no graph surface at all; these
  * are the standard link-mining ops (Liben-Nowell & Kleinberg 2003 for
  * CN link prediction, Raghavan 2007 for LPA, Newman 2004 for
  * modularity) a dedup/curation pipeline runs on its candidate-pair
  * graph to find missed duplicates (predicted links), template families
  * (communities), and tie strength (embeddedness). Everything is
  * bounded by the PAIR table — O(|pairs|) or O(Σ deg²) two-hop work,
  * independent of corpus size; q116's degree audit is the documented
  * hot-node pre-check before the two-hop joins.
  */
object GraphLinkQueries {

  /** Undirected adjacency (both directions) of the q23 dup-pair graph. */
  private def adj(s: SparkSession, dir: String): DataFrame = {
    val p = FeatureQueries.dupPairsTable(s, dir).select("doc_a", "doc_b")
    p.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .unionAll(p.select(col("doc_b").as("u"), col("doc_a").as("v")))
  }

  /** One synchronous majority-label round: every node adopts the most
    * frequent label among its neighbors AND itself, ties to the
    * smallest label — fully deterministic, no RNG, no async order. */
  private def lpaRound(adjDf: DataFrame, labels: DataFrame): DataFrame = {
    val withSelf = adjDf.unionAll(
      labels.select(col("doc_id").as("u"), col("doc_id").as("v")))
    withSelf.join(labels.withColumnRenamed("doc_id", "v"), Seq("v"))
      .groupBy(col("u"), col("lbl"))
      .agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("u").orderBy(col("c").desc, col("lbl").asc)))
      .filter(col("rn") === 1)
      .select(col("u").as("doc_id"), col("lbl"))
  }

  /** Two-round LPA labels, materialized once per (JVM, sfDir) — q288
    * (census) and q290 (modularity) consume the SAME label table the
    * way a real pipeline lands one community assignment for many
    * downstream audits. The pair-table dependency resolves before the
    * memo (cachedFixture is non-reentrant). */
  private def lpaLabels(s: SparkSession, dir: String): DataFrame = {
    FeatureQueries.dupPairsTable(s, dir)
    val work = PipelineQueries.cachedFixture(s"lpa|$dir") { work =>
      val a = adj(s, dir)
      val nodes = a.select(col("u").as("doc_id")).distinct()
      val l0 = nodes.select(col("doc_id"), col("doc_id").as("lbl"))
      lpaRound(a, lpaRound(a, l0))
        .write.mode("overwrite").parquet(s"$work/lpa")
    }
    s.read.parquet(s"$work/lpa")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G232: common-neighbor link prediction (missed-duplicate scan) ──
    // Non-adjacent doc pairs sharing the most neighbors in the dup
    // graph — the classic "you probably missed this duplicate" signal
    // (two docs each near-dup of the same third doc are likely near-
    // dups of each other even if LSH banding missed the pair). Two-hop
    // self-join on the adjacency (cost Σ deg² — q116 is the hot-node
    // pre-audit), existing edges removed by anti-join, top-20 by count
    // with id tiebreaks.
    "q287_link_prediction" -> ((s, dir) => {
      val a = adj(s, dir)
      val twoHop = a.select(col("u").as("x"), col("v").as("w"))
        .join(a.select(col("u").as("w"), col("v").as("y")), Seq("w"))
        .filter(col("x") < col("y"))
        .groupBy(col("x").as("doc_a"), col("y").as("doc_b"))
        .agg(count(lit(1)).as("common_neighbors"))
      val existing = FeatureQueries.dupPairsTable(s, dir).select("doc_a", "doc_b")
      twoHop.join(existing, Seq("doc_a", "doc_b"), "left_anti")
        .orderBy(col("common_neighbors").desc, col("doc_a").asc, col("doc_b").asc)
        .limit(20)
    }),

    // ── G233: majority label propagation, 2 synchronous rounds ─────────
    // Template-family detection without full CC: every node repeatedly
    // adopts the most frequent label among neighbors∪self (ties to the
    // smallest label — deterministic, unlike classic random-order LPA),
    // two bounded rounds, then the community-size census. Differs from
    // q64's CC: LPA can SPLIT a connected component into dense cores
    // where min-label CC must merge it. Per round: one |adj|-row join +
    // a partitioned argmax window.
    "q288_label_propagation" -> ((s, dir) => {
      lpaLabels(s, dir)
        .groupBy("lbl").agg(count(lit(1)).as("comm_size"))
        .groupBy("comm_size").agg(count(lit(1)).as("n_comms"))
        .orderBy("comm_size")
    }),

    // ── G234: edge embeddedness (tie-strength census) ──────────────────
    // For every dup EDGE: common neighbors of its endpoints over the
    // union of their other neighbors — embeddedness 0 marks bridges
    // (suspect pairs connecting unrelated families), high embeddedness
    // marks redundant in-family ties (safe to verify last). CN via the
    // same two-hop join restricted to existing edges; union size from
    // the degree table: |N(u)∪N(v)|−{u,v} = deg(u)+deg(v)−cn−2. Top-20
    // most-embedded edges with the exact e6 ratio.
    "q289_edge_embeddedness" -> ((s, dir) => {
      val a = adj(s, dir)
      val deg = a.groupBy(col("u").as("n")).agg(count(lit(1)).as("deg"))
      val edges = FeatureQueries.dupPairsTable(s, dir).select("doc_a", "doc_b")
      val cn = a.select(col("u").as("doc_a"), col("v").as("w"))
        .join(a.select(col("u").as("w"), col("v").as("doc_b")), Seq("w"))
        .join(edges, Seq("doc_a", "doc_b"), "left_semi")
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("cn"))
      edges.join(cn, Seq("doc_a", "doc_b"), "left")
        .na.fill(0L, Seq("cn"))
        .join(deg.withColumnRenamed("n", "doc_a").withColumnRenamed("deg", "deg_a"), Seq("doc_a"))
        .join(deg.withColumnRenamed("n", "doc_b").withColumnRenamed("deg", "deg_b"), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("cn"),
          expr("deg_a + deg_b - cn - 2").as("union_others"),
          expr("cn * 1000000 div greatest(deg_a + deg_b - cn - 2, 1)").as("emb_e6"))
        .orderBy(col("emb_e6").desc, col("doc_a").asc, col("doc_b").asc)
        .limit(20)
    }),

    // ── G235: modularity of the LPA communities (partition quality) ────
    // Newman modularity Q = Σ_c (e_c/m − (d_c/2m)²) of the q288
    // partition, exact: Q_e9 = Σ_c (4·m·e_c − d_c²)·1e9 div (4·m²),
    // floored per community (documented floor — identical in both
    // engines). The acceptance score for ANY community assignment; CC
    // would score all-internal edges by construction, LPA earns its
    // score. Cost: one label join per edge endpoint + a per-community
    // aggregate.
    "q290_modularity" -> ((s, dir) => {
      val labels = lpaLabels(s, dir)
      val edges = FeatureQueries.dupPairsTable(s, dir).select("doc_a", "doc_b")
      val m = edges.agg(count(lit(1)).as("m"))
      val lab = labels.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("lbl", "la")
      val labB = labels.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("lbl", "lb")
      val ec = edges.join(lab, Seq("doc_a")).join(labB, Seq("doc_b"))
        .filter(col("la") === col("lb"))
        .groupBy(col("la").as("lbl")).agg(count(lit(1)).as("e_c"))
      val dc = adj(s, dir)
        .join(labels.withColumnRenamed("doc_id", "u"), Seq("u"))
        .groupBy("lbl").agg(count(lit(1)).as("d_c"))
      val perComm = dc.join(ec, Seq("lbl"), "left").na.fill(0L, Seq("e_c"))
        .crossJoin(broadcast(m))
        .withColumn("q_term_e9", expr("(4 * m * e_c - d_c * d_c) * 1000000000 div (4 * m * m)"))
      perComm.agg(max("m").as("m"), count(lit(1)).as("n_comms"),
          sum("e_c").as("internal_edges"), sum("q_term_e9").as("q_e9"))
        .select(col("m"), col("n_comms"), col("internal_edges"), col("q_e9"))
    })
  )

  def oracleSql: Map[String, String] = {
    val q23 = TextQueries.oracleSql("q23_minhash_dup_pairs")
    val base =
      s"""p AS (SELECT doc_a, doc_b FROM ($q23)),
         |adj AS (SELECT doc_a AS u, doc_b AS v FROM p
         |        UNION ALL SELECT doc_b, doc_a FROM p)""".stripMargin
    val lpa =
      s"""nodes AS (SELECT DISTINCT u AS doc_id FROM adj),
         |l0 AS (SELECT doc_id, doc_id AS lbl FROM nodes),
         |ws1 AS (SELECT u, v FROM adj UNION ALL SELECT doc_id, doc_id FROM l0),
         |r1 AS (SELECT u AS doc_id, lbl FROM (
         |         SELECT ws1.u, l0.lbl, COUNT(*) AS c,
         |           ROW_NUMBER() OVER (PARTITION BY ws1.u
         |             ORDER BY COUNT(*) DESC, l0.lbl) AS rn
         |         FROM ws1 JOIN l0 ON ws1.v = l0.doc_id
         |         GROUP BY ws1.u, l0.lbl) WHERE rn = 1),
         |ws2 AS (SELECT u, v FROM adj UNION ALL SELECT doc_id, doc_id FROM r1),
         |r2 AS (SELECT u AS doc_id, lbl FROM (
         |         SELECT ws2.u, r1.lbl, COUNT(*) AS c,
         |           ROW_NUMBER() OVER (PARTITION BY ws2.u
         |             ORDER BY COUNT(*) DESC, r1.lbl) AS rn
         |         FROM ws2 JOIN r1 ON ws2.v = r1.doc_id
         |         GROUP BY ws2.u, r1.lbl) WHERE rn = 1)""".stripMargin
    Map(

      "q287_link_prediction" ->
        s"""WITH $base,
           |th AS (SELECT a1.u AS doc_a, a2.v AS doc_b, COUNT(*) AS common_neighbors
           |       FROM adj a1 JOIN adj a2 ON a1.v = a2.u AND a1.u < a2.v
           |       GROUP BY a1.u, a2.v),
           |nonedge AS (SELECT th.* FROM th
           |            LEFT JOIN p ON th.doc_a = p.doc_a AND th.doc_b = p.doc_b
           |            WHERE p.doc_a IS NULL)
           |SELECT doc_a, doc_b, CAST(common_neighbors AS BIGINT) AS common_neighbors
           |FROM nonedge
           |ORDER BY common_neighbors DESC, doc_a, doc_b LIMIT 20""".stripMargin,

      "q288_label_propagation" ->
        s"""WITH $base,
           |$lpa,
           |cs AS (SELECT lbl, COUNT(*) AS comm_size FROM r2 GROUP BY lbl)
           |SELECT CAST(comm_size AS BIGINT) AS comm_size,
           |       CAST(COUNT(*) AS BIGINT) AS n_comms
           |FROM cs GROUP BY comm_size ORDER BY comm_size""".stripMargin,

      "q289_edge_embeddedness" ->
        s"""WITH $base,
           |deg AS (SELECT u AS n, COUNT(*) AS deg FROM adj GROUP BY u),
           |cn AS (SELECT a1.u AS doc_a, a2.v AS doc_b, COUNT(*) AS cn
           |       FROM adj a1 JOIN adj a2 ON a1.v = a2.u
           |       JOIN p ON a1.u = p.doc_a AND a2.v = p.doc_b
           |       GROUP BY a1.u, a2.v)
           |SELECT p.doc_a, p.doc_b,
           |       CAST(COALESCE(cn.cn, 0) AS BIGINT) AS cn,
           |       CAST(da.deg + db.deg - COALESCE(cn.cn, 0) - 2 AS BIGINT) AS union_others,
           |       CAST(COALESCE(cn.cn, 0) * 1000000
           |            // GREATEST(da.deg + db.deg - COALESCE(cn.cn, 0) - 2, 1) AS BIGINT) AS emb_e6
           |FROM p
           |LEFT JOIN cn ON p.doc_a = cn.doc_a AND p.doc_b = cn.doc_b
           |JOIN deg da ON p.doc_a = da.n
           |JOIN deg db ON p.doc_b = db.n
           |ORDER BY emb_e6 DESC, p.doc_a, p.doc_b LIMIT 20""".stripMargin,

      "q290_modularity" ->
        s"""WITH $base,
           |$lpa,
           |m AS (SELECT COUNT(*) AS m FROM p),
           |ec AS (SELECT la.lbl, COUNT(*) AS e_c
           |       FROM p JOIN r2 la ON p.doc_a = la.doc_id
           |              JOIN r2 lb ON p.doc_b = lb.doc_id
           |       WHERE la.lbl = lb.lbl GROUP BY la.lbl),
           |dc AS (SELECT r2.lbl, COUNT(*) AS d_c
           |       FROM adj JOIN r2 ON adj.u = r2.doc_id GROUP BY r2.lbl),
           |pc AS (SELECT dc.lbl, dc.d_c, COALESCE(ec.e_c, 0) AS e_c,
           |              (4 * m.m * COALESCE(ec.e_c, 0) - dc.d_c * dc.d_c)
           |                * 1000000000 // (4 * m.m * m.m) AS q_term_e9
           |       FROM dc LEFT JOIN ec ON dc.lbl = ec.lbl, m)
           |SELECT CAST(MAX(m.m) AS BIGINT) AS m,
           |       CAST(COUNT(*) AS BIGINT) AS n_comms,
           |       CAST(SUM(e_c) AS BIGINT) AS internal_edges,
           |       CAST(SUM(q_term_e9) AS BIGINT) AS q_e9
           |FROM pc, m""".stripMargin
    )
  }
}
