package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions._

/** Data-governance and lifecycle operators: PII scrubbing, corpus rarity
  * scoring, SCD2 history build, CDC merge-upsert, join-key skew
  * profiling, and winsorization. The reference keeps its data honest by
  * hand (`db/init.sql` recreates the schema wholesale; the Airflow DAG
  * re-ingests the full CSV per run) — at 100 TB every one of these has
  * to be an incremental, declarative plan instead.
  *
  * Shared discipline with the rest of the library: scaled-BIGINT
  * arithmetic (`div`, never float `/`), total orders on (ts, event_id)
  * for every window, and DuckDB oracle SQL generated from the same
  * definition.
  */
object GovernanceQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G63: PII scrub (regex redaction audit) ─────────────────────────
    // Redact digit runs from the free-form props payload (the stand-in
    // for ids/phones/account numbers in this synthetic corpus — the
    // patterns swap, the plan doesn't) and report per-event-type hit
    // rate, characters removed, and the count of distinct post-redaction
    // templates. Pure narrow map (regexp_replace is codegen'd — no UDF)
    // feeding a 5-group partial aggregate: zero data shuffled besides
    // the 5-row agg, the same plan at any corpus size.
    "q118_pii_scrub" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("event_type"), col("props"),
          regexp_replace(col("props"), "\\d+", "#").as("red"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("red") =!= col("props"), 1L).otherwise(0L)).as("n_hit"),
          sum((length(col("props")) - length(col("red"))).cast(LongType))
            .as("chars_removed"),
          countDistinct(col("red")).as("n_templates"))
        .orderBy("event_type")
    }),

    // ── G64: corpus rarity score ───────────────────────────────────────
    // Per-document mean inverse token probability — the integer-exact
    // cousin of a unigram-LM perplexity filter (CCNet-style): documents
    // dominated by corpus-rare tokens score high (gibberish / OCR noise),
    // common prose scores low. term = (1e6 · N_total) div cnt(tok), doc
    // score = Σ term div n_toks — floor-div throughout, so every engine
    // agrees bit-for-bit. Plan: one token-keyed vocab aggregate, one
    // token-keyed equi-join (vocab is corpus-shaped → shuffle join, not
    // broadcast), one doc-keyed aggregate; the 1-row total is the only
    // broadcast. At ≥10¹³-token corpora drop the scale factor to e3 (or
    // lift term to DECIMAL(38,0) as q114 does) — the e6 numerator of a
    // singleton token is the only bigint-overflow edge.
    "q119_rarity_score" -> ((s, dir) => {
      val inst = Tables.documents(s, dir)
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      val vocab = inst.groupBy("tok").agg(count(lit(1)).as("cnt"))
      val total = vocab.agg(sum(col("cnt")).as("n_total"))
      inst.join(vocab, "tok")
        .crossJoin(broadcast(total))
        .withColumn("term", expr("(1000000L * n_total) div cnt"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_toks"), sum(col("term")).as("sum_term"))
        .withColumn("rarity_e6", expr("sum_term div n_toks"))
        .select("doc_id", "n_toks", "rarity_e6")
        .orderBy("doc_id")
    }),

    // ── G65: SCD2 history build ────────────────────────────────────────
    // Slowly-changing-dimension type 2 from a change log: collapse each
    // user's event stream to its state CHANGES (lag ≠ current), then
    // stamp [valid_from, valid_to) validity intervals (lead), a version
    // number, and the is_current flag. The warehouse-dimension twin of
    // q109's snapshot diff. ONE shuffle on user_id: both window passes
    // and the change filter share the same (user_id | ts, event_id)
    // sort, so Catalyst plans a single exchange+sort reused three times.
    // Interval bounds are epoch-µs BIGINTs (the q57 timestamp
    // discipline) — open-ended current rows carry NULL valid_to_us.
    "q120_scd2" -> ((s, dir) => scd2History(s, dir).orderBy("user_id", "version")),

    // ── G79: SCD2 point-in-time lookup (feature-store correctness) ─────
    // The join that makes G65's dimension USEFUL: each purchase event
    // resolved against the user's state valid AT that event's time —
    // the point-in-time-correct feature lookup that prevents label
    // leakage in training data. Composed from the library's own
    // operators: the q120 history feeds ops/Relational.asOfJoin (union +
    // carry-forward window — ONE user_id shuffle, no per-row interval
    // scan, no theta join). The (version, state) struct payload makes
    // exact-timestamp ties resolve to the HIGHEST version — identical
    // to interval containment over the [from, to) tiling, which the
    // oracle states directly as a containment join.
    "q134_scd2_lookup" -> ((s, dir) => {
      val ch = scd2History(s, dir)
        .select(col("user_id"), col("valid_from_us"),
          struct(col("version"), col("state")).as("vs"))
      val p = Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), expr("unix_micros(ts)").as("ts_us"))
      graft.ops.Relational.asOfJoin(p, ch, Seq("user_id"),
          col("ts_us"), col("valid_from_us"), col("vs"), "vsx")
        .select(col("event_id"), col("user_id"),
          col("vsx.state").as("state_at"), col("vsx.version").as("version_at"))
        .orderBy("event_id")
    }),

    // ── G66: CDC merge-upsert ──────────────────────────────────────────
    // MERGE semantics without a table format: base = per-user profile
    // over the older half of the log, delta = the newer half; full-outer
    // join on the key emits the merged row plus its action (insert /
    // update / keep). Both sides are pre-aggregated map-side before the
    // single key-shuffle full-outer join — the incremental-profile
    // refresh shape that replaces the reference's full CSV re-ingest per
    // DAG run. The split point is derived from the data (min + half the
    // span, one 1-row broadcast), so the query is sf-invariant.
    "q121_merge_upsert" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"),
          round(col("value") * 1000000).cast(LongType).as("v6"))
      val split = e.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(expr("date_add(d0, cast(datediff(d1, d0) div 2 as int))")
          .as("split"))
      val es = e.crossJoin(broadcast(split))
      def prof(side: DataFrame, p: String): DataFrame = side
        .groupBy("user_id")
        .agg(count(lit(1)).as(p + "n"), sum(col("v6")).as(p + "v"),
          max(col("day")).as(p + "l"))
      val base  = prof(es.filter(col("day") <= col("split")), "b")
      val delta = prof(es.filter(col("day") > col("split")), "d")
      base.join(delta, Seq("user_id"), "full_outer")
        .withColumn("action",
          when(col("bn").isNull, "insert")
            .when(col("dn").isNull, "keep").otherwise("update"))
        .withColumn("n_events", coalesce(col("bn"), lit(0L)) + coalesce(col("dn"), lit(0L)))
        .withColumn("total_v6", coalesce(col("bv"), lit(0L)) + coalesce(col("dv"), lit(0L)))
        .withColumn("last_day",
          greatest(coalesce(col("bl"), col("dl")), coalesce(col("dl"), col("bl"))))
        .select("user_id", "action", "n_events", "total_v6", "last_day")
        .orderBy("user_id")
    }),

    // ── G67: join-key skew profiler ────────────────────────────────────
    // The pre-join diagnostic that decides broadcast vs shuffle vs
    // salting (q47's input, made queryable): for each candidate join
    // key, cardinality, heaviest-key share, and skew ratio
    // (max/avg × 100). Each profile is two stacked aggregates — the
    // per-key count combines map-side, the 1-row rollup is free — so
    // profiling a 100 TB fact table costs one pass per key, no sort.
    // Overflow bound (ADVICE r7): skew_x100 = max_cnt·n_keys·100 needs
    // max_cnt·n_keys < 9.2e16; a 10^12-row table with 10^9 keys and a
    // 10^8-row hot key sits at 10^19 — past the edge. At that scale drop
    // the ×100 factor or lift the product to DECIMAL(38,0) first (the
    // q114 discipline); the ppm column p_max_e6 is safe much longer
    // (max_cnt ≤ n_rows < 9.2e12 before its e6 product can wrap).
    "q122_skew_profile" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      def prof(keyed: DataFrame, name: String): DataFrame = keyed
        .groupBy("k").agg(count(lit(1)).as("c"))
        .agg(sum(col("c")).as("n_rows"), count(lit(1)).as("n_keys"),
          max(col("c")).as("max_cnt"))
        .withColumn("key_name", lit(name))
      prof(e.select(col("user_id").as("k")), "user_id")
        .unionByName(prof(e.select(col("event_type").as("k")), "event_type"))
        .unionByName(prof(e.select(to_date(col("ts")).cast(StringType).as("k")), "day"))
        .withColumn("p_max_e6", expr("max_cnt * 1000000 div n_rows"))
        .withColumn("skew_x100", expr("max_cnt * n_keys * 100 div n_rows"))
        .select("key_name", "n_rows", "n_keys", "max_cnt", "p_max_e6", "skew_x100")
        .orderBy("key_name")
    }),

    // ── G68: winsorization (exact rank-based clip) ─────────────────────
    // Clip value to its per-group [p05, p95] — the outlier-taming twin
    // of q92/q111 that keeps rows instead of dropping them. Percentiles
    // are EXACT rank selection (rank ceil(q·n) under the (v6, event_id)
    // total order), not interpolated floats, so engines agree exactly.
    // The per-group row_number is the price of exactness; with groups as
    // coarse as event_type the at-scale variant swaps in q61's GK sketch
    // bounds and keeps this same clip-aggregate tail. Bounds join back
    // via broadcast (one row per group).
    "q123_winsorize" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("event_type"), col("event_id"),
          round(col("value") * 1000000).cast(LongType).as("v6"))
      val w = Window.partitionBy("event_type").orderBy(col("v6"), col("event_id"))
      val ranked = e.withColumn("rk", row_number().over(w))
      val ranks = e.groupBy("event_type").agg(count(lit(1)).as("n"))
        .withColumn("lo_rk", expr("(n * 5 + 99) div 100"))
        .withColumn("hi_rk", expr("(n * 95 + 99) div 100"))
      val bounds = ranked.join(broadcast(ranks), "event_type")
        .filter(col("rk") === col("lo_rk") || col("rk") === col("hi_rk"))
        .groupBy("event_type")
        .agg(min(when(col("rk") === col("lo_rk"), col("v6"))).as("lo_v6"),
          min(when(col("rk") === col("hi_rk"), col("v6"))).as("hi_v6"),
          min(col("n")).as("n"))
      e.join(broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(min(col("n")).as("n"), min(col("lo_v6")).as("lo_v6"),
          min(col("hi_v6")).as("hi_v6"),
          sum(when(col("v6") < col("lo_v6"), 1L).otherwise(0L)).as("n_clip_lo"),
          sum(when(col("v6") > col("hi_v6"), 1L).otherwise(0L)).as("n_clip_hi"),
          sum(greatest(col("lo_v6"), least(col("hi_v6"), col("v6"))))
            .as("sum_clip_v6"))
        .orderBy("event_type")
    }),

    // ── G69: referential-integrity audit ───────────────────────────────
    // Orphan-FK counts for every edge of the star schema in one
    // manifest — the data-quality gate a warehouse runs before
    // publishing a snapshot. The three lineitem edges share ONE fact
    // scan (r7 read it once per edge): three BROADCAST left-outer
    // marker joins chain inside a single codegen pipeline over that
    // scan (distinct parent keys broadcast; no explode fan-out, no
    // fact shuffle — an earlier r8 cut exploded to (edge, key) rows
    // and paid a 3×-row shuffle join that broadcasts beat at every
    // measured SF), then ONE 1-row conditional aggregate unstacks into
    // the per-edge manifest. A 100 TB-parent edge that can't broadcast
    // swaps in the q110 Bloom-prune (`ops/Bloom.antiJoin`) or the
    // (edge, key)-shuffle form with the identical verdict. Output is
    // |edges| rows, never data-shaped. Single-scan shape is
    // spec-asserted (GovernanceSpec).
    "q124_fk_audit" -> ((s, dir) => {
      def keys(df: DataFrame, k: String, as: String) =
        broadcast(df.select(col(k).as(as)).distinct())
      val liAudit = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_partkey", "l_suppkey")
        .join(keys(Tables.orders(s, dir), "o_orderkey", "ok"),
          col("l_orderkey") === col("ok"), "left_outer")
        .join(keys(Tables.part(s, dir), "p_partkey", "pk"),
          col("l_partkey") === col("pk"), "left_outer")
        .join(keys(Tables.supplier(s, dir), "s_suppkey", "sk"),
          col("l_suppkey") === col("sk"), "left_outer")
        .agg(count(lit(1)).as("n_child"),
          sum(when(col("ok").isNull, 1L).otherwise(0L)).as("orph_o"),
          sum(when(col("pk").isNull, 1L).otherwise(0L)).as("orph_p"),
          sum(when(col("sk").isNull, 1L).otherwise(0L)).as("orph_s"))
        .selectExpr("""stack(3,
          'lineitem->orders',   n_child, orph_o,
          'lineitem->part',     n_child, orph_p,
          'lineitem->supplier', n_child, orph_s) AS (rel, n_child, n_orphans)""")
      // orders->customer: different child table — the broadcast-dim
      // anti-join shape stands alone
      val ordOrphans = Tables.orders(s, dir).select(col("o_custkey").as("k"))
        .join(Tables.customer(s, dir).select(col("c_custkey").as("k")).distinct(),
          Seq("k"), "left_anti")
      val ocAudit = Tables.orders(s, dir).agg(count(lit(1)).as("n_child"))
        .crossJoin(ordOrphans.agg(count(lit(1)).as("n_orphans")))
        .withColumn("rel", lit("orders->customer"))
        .select("rel", "n_child", "n_orphans")
      liAudit.unionByName(ocAudit)
        .withColumn("orphan_ppm", expr("n_orphans * 1000000 div n_child"))
        .select("rel", "n_child", "n_orphans", "orphan_ppm")
        .orderBy("rel")
    }),

    // ── G70: exact-quota stratified sample ─────────────────────────────
    // Deterministic N-per-stratum sampling (eval-set carving, labeling
    // budgets): rank docs inside each lang by md5(doc_id) — a stable
    // pseudo-random total order every engine reproduces — and keep the
    // first 10. Unlike q75's Bernoulli hash-filter the quota is EXACT;
    // one shuffle on the stratum key, and the window input is already
    // cut to (id, lang) pairs so the sort carries 16 bytes/row, not
    // documents.
    "q125_group_sample" -> ((s, dir) => {
      val w = Window.partitionBy("lang")
        .orderBy(md5(col("doc_id").cast(StringType)), col("doc_id"))
      Tables.documents(s, dir).select(col("doc_id"), col("lang"))
        .withColumn("rk", row_number().over(w).cast(LongType))
        .filter(col("rk") <= 10)
        .orderBy("lang", "rk")
    }),

    // ── G71: token-drift monitor ───────────────────────────────────────
    // Distribution shift between two corpus snapshots (stand-in split:
    // doc_id parity): per-token rate ratio (B vs A, each normalized by
    // its side's token mass), floor-div e4, min-support 5 per side to
    // bound small-count noise. Top-20 by ratio = TakeOrdered, no global
    // sort. One token-keyed aggregate carries both sides' counts in a
    // single pass (conditional sums, no self-join); the 1-row mass
    // totals broadcast. The monitor that catches a crawl-source flip
    // before it poisons the mixture.
    // Overflow bound (ADVICE r7): ratio_e4 = cnt_b·na·10⁴ wraps BIGINT
    // once cnt_b·na ≥ 9.2e14 — i.e. a 10¹²-token side mass with any
    // token above ~900 hits on the other side. At that corpus scale
    // reduce the factor to e2 or lift the numerator to DECIMAL(38,0) as
    // q114 does (same fix as q122's skew_x100); the e4 floor-div itself
    // is the only scale-sensitive term.
    // ── G73: candidate-key uniqueness audit ────────────────────────────
    // The PK-side complement of q124's FK audit: for each declared
    // candidate key, n_rows, n_keys, duplicate-key groups, and the worst
    // multiplicity — the constraint check a warehouse runs because
    // parquet enforces nothing. One partial-agg groupBy per key (the
    // per-key count combines map-side) and a 1-row rollup; output is
    // |keys| rows, never data-shaped. A duplicate-free key reads
    // n_dup_keys = 0, max_mult = 1.
    "q128_pk_audit" -> ((s, dir) => {
      def audit(df: DataFrame, name: String, keys: Seq[String]): DataFrame =
        df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
          .agg(sum(col("c")).as("n_rows"), count(lit(1)).as("n_keys"),
            sum(when(col("c") > 1, 1L).otherwise(0L)).as("n_dup_keys"),
            max(col("c")).as("max_mult"))
          .withColumn("key_name", lit(name))
      audit(Tables.lineitem(s, dir), "lineitem(l_orderkey,l_linenumber)",
          Seq("l_orderkey", "l_linenumber"))
        .unionByName(audit(Tables.orders(s, dir), "orders(o_orderkey)", Seq("o_orderkey")))
        .unionByName(audit(Tables.events(s, dir), "events(event_id)", Seq("event_id")))
        .unionByName(audit(Tables.documents(s, dir), "documents(doc_id)", Seq("doc_id")))
        .select("key_name", "n_rows", "n_keys", "n_dup_keys", "max_mult")
        .orderBy("key_name")
    }),

    // ── G74: order-independent table checksum ──────────────────────────
    // Snapshot reconciliation without moving data: each row serializes
    // to a canonical '|'-joined string (BIGINT-rendered numbers only —
    // floats ride as scaled ints, the engine-portable form), hashes to
    // a 60-bit value (15 hex of md5 — BIGINT-safe in every engine), and
    // XOR-aggregates per partition group. XOR is commutative/
    // associative with no overflow, so the checksum is row-order- and
    // partitioning-independent and combines map-side: comparing two
    // 100 TB replicas costs one scan each side and ships |groups| rows.
    // The per-group split (returnflag / orderstatus) localizes a
    // mismatch the way partition-level rsync does.
    "q129_table_checksum" -> ((s, dir) => {
      def sum60(df: DataFrame, name: String, grp: Column): DataFrame =
        df.groupBy(grp.as("grp"))
          .agg(count(lit(1)).as("n_rows"),
            expr("bit_xor(h)").as("xor60"))
          .withColumn("table_name", lit(name))
      // md5_60 kernel == conv(substring(md5(s),1,15),16,10) without the
      // per-row hex materialization + base-16 parse (MinHashKernelSpec
      // asserts the identity; the oracle keeps the declarative SQL form)
      val li = Tables.lineitem(s, dir)
        .withColumn("ser", concat_ws("|",
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"),
          round(col("l_quantity") * 100).cast(LongType)))
        .withColumn("h", expr("md5_60(ser)"))
      val o = Tables.orders(s, dir)
        .withColumn("ser", concat_ws("|",
          col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast(LongType)))
        .withColumn("h", expr("md5_60(ser)"))
      sum60(li, "lineitem", col("l_returnflag"))
        .unionByName(sum60(o, "orders", col("o_orderstatus")))
        .select("table_name", "grp", "n_rows", "xor60")
        .orderBy("table_name", "grp")
    }),

    // ── G76: exact decile drift ────────────────────────────────────────
    // The numeric twin of q126's token drift: split events by event_id
    // parity into snapshots A/B, take the EXACT per-event_type deciles
    // of value on each side (ceil-rank selection under the (v6,
    // event_id) total order — q123's discipline), and report the
    // per-decile shift. delta6 is a plain difference, no signed
    // division. The per-(side, type) row_number is the price of
    // exactness; at 100 TB swap in q61's GK sketch bounds per side and
    // keep this same compare tail.
    "q131_quantile_drift" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("event_type"), col("event_id"),
          round(col("value") * 1000000).cast(LongType).as("v6"),
          (col("event_id") % 2 === 0).as("a"))
      val w = Window.partitionBy("a", "event_type").orderBy(col("v6"), col("event_id"))
      val ranked = e.withColumn("rk", row_number().over(w).cast(LongType))
      val targets = e.groupBy("a", "event_type").agg(count(lit(1)).as("n"))
        .withColumn("d", explode(array((1L to 9L).map(lit(_)): _*)))
        .withColumn("rk", expr("(n * d + 9) div 10"))
        .select("a", "event_type", "d", "rk")
      ranked.join(targets, Seq("a", "event_type", "rk"))
        .groupBy("event_type", "d")
        .agg(min(when(col("a"), col("v6"))).as("va6"),
          min(when(!col("a"), col("v6"))).as("vb6"))
        .withColumn("delta6", col("vb6") - col("va6"))
        .orderBy("event_type", "d")
    }),

    // ── G82: CUSUM changepoint detection ───────────────────────────────
    // Where did the event rate shift? Per event_type, the day whose
    // cumulative deviation from the overall daily mean is largest — the
    // classic CUSUM changepoint, kept integer-exact by scaling each
    // deviation by D (n_day·D − N instead of n_day − N/D, so no
    // fractional mean). Plan: one (type, day) aggregate (map-side
    // combine), a 1-row-per-type mean broadcast back, a running-sum
    // window over ≤|days| rows per type, and an argmax via max_by with
    // an (abs, earliest-day) total order. The monitor that catches a
    // pipeline source going quiet or doubling — q126's temporal twin.
    // Overflow: cusum ≤ N·D — a 10¹²-row type over 10⁴ days sits at
    // 10¹⁶, inside BIGINT; beyond that scale deviations by D/gcd or
    // lift to DECIMAL(38,0) (q114's rule).
    "q137_changepoint" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val totals = daily.groupBy("event_type")
        .agg(sum(col("n")).as("ntot"), count(lit(1)).as("d"))
      val w = Window.partitionBy("event_type").orderBy("day")
      daily.join(broadcast(totals), "event_type")
        .withColumn("dev_xd", col("n") * col("d") - col("ntot"))
        .withColumn("cusum_xd", sum(col("dev_xd")).over(w))
        .groupBy("event_type")
        .agg(min(col("d")).as("n_days"),
          max_by(struct(col("day"), col("cusum_xd")),
            struct(abs(col("cusum_xd")),
              -datediff(col("day"), lit("1970-01-01")))).as("m"))
        .select(col("event_type"), col("n_days"),
          col("m.day").as("drift_day"), col("m.cusum_xd").as("max_cusum_xd"))
        .orderBy("event_type")
    }),

    // ── G86: inter-event cadence profile ───────────────────────────────
    // Per-user temporal cadence: exact moments of the gaps between
    // consecutive events (count, sum, min, max in µs; the squared sum
    // lifted to DECIMAL(38,0) — a 30-day gap in µs squares past BIGINT,
    // q114's rule). The behavioral-bot / SLA signal q115's transition
    // matrix doesn't see: WHAT follows what vs HOW FAST. ONE shuffle on
    // user_id (the lag window), then a per-user aggregate reusing the
    // same partitioning — Catalyst plans a single exchange.
    "q141_event_cadence" -> ((s, dir) => {
      val dec = DecimalType(38, 0)
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("us", expr("unix_micros(ts)"))
        .withColumn("prev_us", lag(col("us"), 1).over(w))
        .filter(col("prev_us").isNotNull)
        .select(col("user_id"), (col("us") - col("prev_us")).as("gap_us"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_gaps"),
          sum(col("gap_us")).as("sum_gap_us"),
          min(col("gap_us")).as("min_gap_us"),
          max(col("gap_us")).as("max_gap_us"),
          sum((col("gap_us").cast(dec) * col("gap_us").cast(dec)).cast(dec))
            .cast(dec).as("sum_gap2"))
        .withColumn("mean_gap_us", expr("sum_gap_us div n_gaps"))
        .orderBy("user_id")
    }),

    // ── G84: Benford first-digit audit ─────────────────────────────────
    // Fraud/corruption screen on a numeric column: the distribution of
    // first significant digits of value vs Benford's law. Digits come
    // from the BIGINT string form (identical rendering both engines —
    // no float log10); the Benford expectations are shared e4 literals
    // (round(log10(1+1/d)·10⁴)), and deviations are plain differences
    // of exact scaled ints. A 9-row digit spine LEFT-joins the observed
    // counts so missing digits surface as zeros. One map-side-combining
    // aggregate over the fact scan; output is always 9 rows.
    "q139_benford" -> ((s, dir) => {
      import s.implicits._
      val benford = Seq(1L -> 3010L, 2L -> 1761L, 3L -> 1249L, 4L -> 969L,
        5L -> 792L, 6L -> 669L, 7L -> 580L, 8L -> 512L, 9L -> 458L)
        .toDF("digit", "benford_e4")
      val v = Tables.events(s, dir)
        .select(round(col("value") * 1000000).cast(LongType).as("v6"))
        .filter(col("v6") =!= 0L)
        .select(substring(abs(col("v6")).cast(StringType), 1, 1).cast(LongType).as("digit"))
      val obs = v.groupBy("digit").agg(count(lit(1)).as("n_obs"))
      val total = v.agg(count(lit(1)).as("n"))
      benford.join(obs, Seq("digit"), "left_outer")
        .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
        .crossJoin(broadcast(total))
        .withColumn("share_e4", expr("n_obs * 10000 div n"))
        .withColumn("dev_e4", col("share_e4") - col("benford_e4"))
        .select("digit", "n_obs", "share_e4", "benford_e4", "dev_e4")
        .orderBy("digit")
    }),

    // ── G85: k-anonymity audit ─────────────────────────────────────────
    // Before an events extract ships, how identifying is the quasi-id
    // (event_type, day)? For each event type: group count, groups whose
    // anonymity set (distinct users) is below k=5, the worst set size,
    // and the small-group rate. The privacy gate next to q118's PII
    // scrub: re-identification risk lives in SMALL groups, not in any
    // single column. Two stacked aggregates (per-quasi-id distinct
    // users, then per-type rollup) — the distinct is the only
    // corpus-shaped shuffle; output is |types| rows.
    "q140_k_anonymity" -> ((s, dir) => {
      val groups = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(countDistinct(col("user_id")).as("aset"))
      groups.groupBy("event_type")
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("aset") < 5, 1L).otherwise(0L)).as("n_small"),
          min(col("aset")).as("min_aset"))
        .withColumn("small_e4", expr("n_small * 10000 div n_groups"))
        .orderBy("event_type")
    }),

    // ── G83: χ² independence audit (event_type × day-of-week) ──────────
    // Is traffic composition stable across the week, or does one event
    // type cluster on particular days? Pearson's χ² per contingency
    // cell, kept engine-exact by DECIMAL(38,0) arithmetic: term_e6 =
    // (obs·N − r·c)²·10⁶ div (N·r·c) — the numerator squares past
    // BIGINT at ~10⁵ rows, so the q114 decimal-lift rule applies from
    // the start (DuckDB mirrors in HUGEINT). Row/col/grand totals are
    // re-aggregated from the |types|·|dows| cell table (never the fact
    // table) and broadcast back; the only fact-scan work is the first
    // (type, dow) map-side aggregate. Output is the per-type χ²
    // contribution — |types| rows, never data-shaped.
    "q138_chi2_independence" -> ((s, dir) => {
      val dec = DecimalType(38, 0)
      val cells = Tables.events(s, dir)
        .groupBy(col("event_type"), (dayofweek(col("ts")) - 1).cast(LongType).as("dow"))
        .agg(count(lit(1)).as("obs"))
      val rows = cells.groupBy("event_type").agg(sum(col("obs")).as("r"))
      val cols = cells.groupBy("dow").agg(sum(col("obs")).as("c"))
      val n = cells.agg(sum(col("obs")).as("nn"))
      cells.join(broadcast(rows), "event_type")
        .join(broadcast(cols), "dow")
        .crossJoin(broadcast(n))
        .withColumn("num",
          col("obs").cast(dec) * col("nn").cast(dec) - col("r").cast(dec) * col("c").cast(dec))
        .withColumn("term_e6", expr(
          "cast((num * num * cast(1000000 as decimal(38,0))) div (cast(nn as decimal(38,0)) * cast(r as decimal(38,0)) * cast(c as decimal(38,0))) as bigint)"))
        .groupBy("event_type")
        .agg(min(col("r")).as("n_obs"), count(lit(1)).as("n_cells"),
          sum(col("term_e6")).as("chi2_e6"))
        .orderBy("event_type")
    }),

    // ── G80: bottom-k sketch sample (custom Catalyst aggregate) ────────
    // q125's exact stratified sample re-planned for 100 TB: the rank
    // window sorts every stratum; `bottomk_md5` (plans/Aggregates.scala,
    // a TypedImperativeAggregate) keeps only the k smallest-md5 values
    // per group in an O(k) heap that partial-aggregates MAP-SIDE and
    // merges associatively — k rows per (mapper, stratum) cross the
    // wire instead of the stratum. Same deterministic pseudo-random
    // total order as q125 (md5 of the id string), so the oracle states
    // the rank-window definition and green proves sketch ≡ sort.
    "q135_bottomk_sample" -> ((s, dir) => {
      Tables.documents(s, dir)
        .groupBy("lang")
        .agg(expr("bottomk_md5(cast(doc_id as string), 8)").as("vs"))
        .select(col("lang"), posexplode(col("vs")).as(Seq("p", "doc")))
        .select(col("lang"), (col("p") + 1).cast(LongType).as("pos"),
          col("doc").cast(LongType).as("doc_id"))
        .orderBy("lang", "pos")
    }),

    "q126_token_drift" -> ((s, dir) => {
      val inst = Tables.documents(s, dir)
        .select((col("doc_id") % 2 === 0).as("a"),
          explode(tokens(col("text"))).as("tok"))
      val counts = inst.groupBy("tok").agg(
        sum(when(col("a"), 1L).otherwise(0L)).as("cnt_a"),
        sum(when(!col("a"), 1L).otherwise(0L)).as("cnt_b"))
      val mass = counts.agg(sum(col("cnt_a")).as("na"), sum(col("cnt_b")).as("nb"))
      counts.filter(col("cnt_a") >= 5 && col("cnt_b") >= 5)
        .crossJoin(broadcast(mass))
        .withColumn("ratio_e4", expr("cnt_b * na * 10000 div (cnt_a * nb)"))
        .orderBy(col("ratio_e4").desc, col("tok").asc).limit(20)
        .select("tok", "cnt_a", "cnt_b", "ratio_e4")
    })
  )

  /** G65's SCD2 dimension build (shared by q120 and q134's lookup). */
  private[graft] def scd2History(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .withColumn("valid_from_us", expr("unix_micros(ts)"))
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(w))
      .withColumn("version", row_number().over(w).cast(LongType))
      .withColumn("is_current", col("valid_to_us").isNull)
      .select(col("user_id"), col("event_type").as("state"),
        col("valid_from_us"), col("valid_to_us"), col("version"),
        col("is_current"))
  }

  /** SCD2 CTE mirror of [[scd2History]] — shared by the q120/q134 oracles. */
  private val scd2Cte: String =
    """WITH s AS (SELECT user_id, event_type, ts, event_id,
      |             LAG(event_type) OVER (PARTITION BY user_id
      |               ORDER BY ts, event_id) AS prev FROM events),
      |     c AS (SELECT user_id, event_type, ts, event_id FROM s
      |           WHERE prev IS NULL OR prev <> event_type),
      |     scd AS (SELECT user_id, event_type AS state,
      |       epoch_ns(ts) // 1000 AS valid_from_us,
      |       LEAD(epoch_ns(ts) // 1000) OVER (PARTITION BY user_id
      |         ORDER BY ts, event_id) AS valid_to_us,
      |       CAST(ROW_NUMBER() OVER (PARTITION BY user_id
      |         ORDER BY ts, event_id) AS BIGINT) AS version,
      |       LEAD(ts) OVER (PARTITION BY user_id
      |         ORDER BY ts, event_id) IS NULL AS is_current
      |     FROM c)""".stripMargin

  def oracleSql: Map[String, String] = Map(

    "q118_pii_scrub" ->
      """WITH r AS (SELECT event_type, props,
        |             regexp_replace(props, '\d+', '#', 'g') AS red FROM events)
        |SELECT event_type, COUNT(*) AS n_rows,
        |       CAST(SUM(CASE WHEN red <> props THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
        |       CAST(SUM(length(props) - length(red)) AS BIGINT) AS chars_removed,
        |       CAST(COUNT(DISTINCT red) AS BIGINT) AS n_templates
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q119_rarity_score" ->
      s"""WITH t AS (SELECT doc_id, UNNEST(${sqlTokens("text")}) AS tok FROM documents),
         |     v AS (SELECT tok, COUNT(*) AS cnt FROM t GROUP BY tok),
         |     n AS (SELECT SUM(cnt) AS n_total FROM v),
         |     j AS (SELECT t.doc_id, (1000000 * n.n_total) // v.cnt AS term
         |           FROM t JOIN v ON t.tok = v.tok, n)
         |SELECT doc_id, COUNT(*) AS n_toks,
         |       CAST(SUM(term) // COUNT(*) AS BIGINT) AS rarity_e6
         |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q120_scd2" ->
      (scd2Cte + "\nSELECT * FROM scd ORDER BY user_id, version"),

    "q134_scd2_lookup" ->
      (scd2Cte +
        """,
          |     p AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us
          |           FROM events WHERE event_type = 'purchase')
          |SELECT p.event_id, p.user_id, scd.state AS state_at,
          |       scd.version AS version_at
          |FROM p JOIN scd ON p.user_id = scd.user_id
          |  AND scd.valid_from_us <= p.ts_us
          |  AND (scd.valid_to_us IS NULL OR p.ts_us < scd.valid_to_us)
          |ORDER BY event_id""".stripMargin),

    "q121_merge_upsert" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |             CAST(round(value*1000000) AS BIGINT) AS v6 FROM events),
        |     sp AS (SELECT MIN(day) + CAST(date_diff('day', MIN(day), MAX(day)) // 2
        |              AS INTEGER) AS split FROM e),
        |     b AS (SELECT user_id, COUNT(*) AS bn, SUM(v6) AS bv, MAX(day) AS bl
        |           FROM e, sp WHERE day <= split GROUP BY user_id),
        |     d AS (SELECT user_id, COUNT(*) AS dn, SUM(v6) AS dv, MAX(day) AS dl
        |           FROM e, sp WHERE day > split GROUP BY user_id)
        |SELECT COALESCE(b.user_id, d.user_id) AS user_id,
        |       CASE WHEN b.user_id IS NULL THEN 'insert'
        |            WHEN d.user_id IS NULL THEN 'keep' ELSE 'update' END AS action,
        |       CAST(COALESCE(bn, 0) + COALESCE(dn, 0) AS BIGINT) AS n_events,
        |       CAST(COALESCE(bv, 0) + COALESCE(dv, 0) AS BIGINT) AS total_v6,
        |       greatest(COALESCE(bl, dl), COALESCE(dl, bl)) AS last_day
        |FROM b FULL JOIN d ON b.user_id = d.user_id
        |ORDER BY user_id""".stripMargin,

    "q122_skew_profile" ->
      """WITH n AS (SELECT COUNT(*) AS n_rows FROM events),
        |     u AS (SELECT COUNT(*) AS n_keys, MAX(c) AS max_cnt FROM
        |             (SELECT COUNT(*) AS c FROM events GROUP BY user_id)),
        |     t AS (SELECT COUNT(*) AS n_keys, MAX(c) AS max_cnt FROM
        |             (SELECT COUNT(*) AS c FROM events GROUP BY event_type)),
        |     d AS (SELECT COUNT(*) AS n_keys, MAX(c) AS max_cnt FROM
        |             (SELECT COUNT(*) AS c FROM events GROUP BY CAST(ts AS DATE))),
        |     a AS (SELECT 'user_id' AS key_name, n_keys, max_cnt FROM u
        |           UNION ALL SELECT 'event_type', n_keys, max_cnt FROM t
        |           UNION ALL SELECT 'day', n_keys, max_cnt FROM d)
        |SELECT key_name, CAST(n.n_rows AS BIGINT) AS n_rows,
        |       CAST(n_keys AS BIGINT) AS n_keys, max_cnt,
        |       max_cnt * 1000000 // n.n_rows AS p_max_e6,
        |       max_cnt * n_keys * 100 // n.n_rows AS skew_x100
        |FROM a, n ORDER BY key_name""".stripMargin,

    "q123_winsorize" ->
      """WITH e AS (SELECT event_type, event_id,
        |             CAST(round(value*1000000) AS BIGINT) AS v6 FROM events),
        |     r AS (SELECT event_type, v6, ROW_NUMBER() OVER (PARTITION BY event_type
        |             ORDER BY v6, event_id) AS rk FROM e),
        |     k AS (SELECT event_type, COUNT(*) AS n, (COUNT(*)*5 + 99) // 100 AS lo_rk,
        |             (COUNT(*)*95 + 99) // 100 AS hi_rk FROM e GROUP BY event_type),
        |     b AS (SELECT r.event_type,
        |             MIN(CASE WHEN rk = lo_rk THEN v6 END) AS lo_v6,
        |             MIN(CASE WHEN rk = hi_rk THEN v6 END) AS hi_v6
        |           FROM r JOIN k ON r.event_type = k.event_type
        |           WHERE rk = lo_rk OR rk = hi_rk GROUP BY r.event_type)
        |SELECT e.event_type, CAST(k.n AS BIGINT) AS n, b.lo_v6, b.hi_v6,
        |       CAST(SUM(CASE WHEN v6 < lo_v6 THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
        |       CAST(SUM(CASE WHEN v6 > hi_v6 THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
        |       CAST(SUM(GREATEST(lo_v6, LEAST(hi_v6, v6))) AS BIGINT) AS sum_clip_v6
        |FROM e JOIN b ON e.event_type = b.event_type
        |     JOIN k ON e.event_type = k.event_type
        |GROUP BY e.event_type, k.n, b.lo_v6, b.hi_v6
        |ORDER BY e.event_type""".stripMargin,

    "q124_fk_audit" ->
      """WITH a AS (
        |  SELECT 'lineitem->orders' AS rel,
        |         (SELECT COUNT(*) FROM lineitem) AS n_child,
        |         (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
        |            (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
        |  UNION ALL SELECT 'orders->customer',
        |         (SELECT COUNT(*) FROM orders),
        |         (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
        |            (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |  UNION ALL SELECT 'lineitem->part',
        |         (SELECT COUNT(*) FROM lineitem),
        |         (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
        |            (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
        |  UNION ALL SELECT 'lineitem->supplier',
        |         (SELECT COUNT(*) FROM lineitem),
        |         (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
        |            (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)))
        |SELECT rel, CAST(n_child AS BIGINT) AS n_child,
        |       CAST(n_orphans AS BIGINT) AS n_orphans,
        |       n_orphans * 1000000 // n_child AS orphan_ppm
        |FROM a ORDER BY rel""".stripMargin,

    "q125_group_sample" ->
      """WITH r AS (SELECT doc_id, lang,
        |             CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
        |           FROM documents)
        |SELECT doc_id, lang, rk FROM r WHERE rk <= 10
        |ORDER BY lang, rk""".stripMargin,

    "q128_pk_audit" ->
      """WITH li AS (SELECT COUNT(*) AS c FROM lineitem GROUP BY l_orderkey, l_linenumber),
        |     o  AS (SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey),
        |     ev AS (SELECT COUNT(*) AS c FROM events GROUP BY event_id),
        |     d  AS (SELECT COUNT(*) AS c FROM documents GROUP BY doc_id),
        |     a AS (
        |  SELECT 'lineitem(l_orderkey,l_linenumber)' AS key_name, SUM(c) AS n_rows,
        |         COUNT(*) AS n_keys, SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS n_dup_keys,
        |         MAX(c) AS max_mult FROM li
        |  UNION ALL SELECT 'orders(o_orderkey)', SUM(c), COUNT(*),
        |         SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END), MAX(c) FROM o
        |  UNION ALL SELECT 'events(event_id)', SUM(c), COUNT(*),
        |         SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END), MAX(c) FROM ev
        |  UNION ALL SELECT 'documents(doc_id)', SUM(c), COUNT(*),
        |         SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END), MAX(c) FROM d)
        |SELECT key_name, CAST(n_rows AS BIGINT) AS n_rows,
        |       CAST(n_keys AS BIGINT) AS n_keys,
        |       CAST(n_dup_keys AS BIGINT) AS n_dup_keys, max_mult
        |FROM a ORDER BY key_name""".stripMargin,

    "q129_table_checksum" ->
      """WITH li AS (SELECT l_returnflag AS grp,
        |  CAST('0x' || substr(md5(concat_ws('|', l_orderkey, l_linenumber,
        |    l_partkey, l_suppkey, CAST(round(l_quantity*100) AS BIGINT))), 1, 15)
        |    AS BIGINT) AS h FROM lineitem),
        |     o AS (SELECT o_orderstatus AS grp,
        |  CAST('0x' || substr(md5(concat_ws('|', o_orderkey, o_custkey,
        |    o_orderstatus, CAST(round(o_totalprice*100) AS BIGINT))), 1, 15)
        |    AS BIGINT) AS h FROM orders),
        |     a AS (
        |  SELECT 'lineitem' AS table_name, grp, COUNT(*) AS n_rows, bit_xor(h) AS xor60
        |  FROM li GROUP BY grp
        |  UNION ALL
        |  SELECT 'orders', grp, COUNT(*), bit_xor(h) FROM o GROUP BY grp)
        |SELECT table_name, grp, CAST(n_rows AS BIGINT) AS n_rows, xor60
        |FROM a ORDER BY table_name, grp""".stripMargin,

    "q131_quantile_drift" ->
      """WITH e AS (SELECT event_type, event_id,
        |             CAST(round(value*1000000) AS BIGINT) AS v6,
        |             event_id % 2 = 0 AS a FROM events),
        |     r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY a, event_type
        |             ORDER BY v6, event_id) AS BIGINT) AS rk FROM e),
        |     k AS (SELECT a, event_type, COUNT(*) AS n FROM e GROUP BY a, event_type),
        |     t AS (SELECT a, event_type, CAST(d AS BIGINT) AS d, (n*d + 9) // 10 AS rk
        |           FROM k CROSS JOIN (SELECT UNNEST(range(1, 10)) AS d)),
        |     j AS (SELECT r.event_type, t.d, r.a, r.v6
        |           FROM r JOIN t ON r.a = t.a AND r.event_type = t.event_type
        |                        AND r.rk = t.rk)
        |SELECT event_type, d,
        |       MIN(CASE WHEN a THEN v6 END) AS va6,
        |       MIN(CASE WHEN NOT a THEN v6 END) AS vb6,
        |       MIN(CASE WHEN NOT a THEN v6 END) - MIN(CASE WHEN a THEN v6 END) AS delta6
        |FROM j GROUP BY event_type, d ORDER BY event_type, d""".stripMargin,

    "q141_event_cadence" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us,
        |             LAG(epoch_ns(ts) // 1000) OVER (PARTITION BY user_id
        |               ORDER BY ts, event_id) AS prev_us
        |           FROM events),
        |     g AS (SELECT user_id, us - prev_us AS gap_us FROM e
        |           WHERE prev_us IS NOT NULL)
        |SELECT user_id, COUNT(*) AS n_gaps,
        |       CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us,
        |       MIN(gap_us) AS min_gap_us, MAX(gap_us) AS max_gap_us,
        |       CAST(SUM(CAST(gap_us AS HUGEINT) * gap_us) AS DECIMAL(38,0)) AS sum_gap2,
        |       CAST(SUM(gap_us) // COUNT(*) AS BIGINT) AS mean_gap_us
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q139_benford" ->
      """WITH b AS (SELECT * FROM (VALUES (1, 3010), (2, 1761), (3, 1249),
        |             (4, 969), (5, 792), (6, 669), (7, 580), (8, 512),
        |             (9, 458)) AS t(digit, benford_e4)),
        |     v AS (SELECT CAST(substr(CAST(abs(CAST(round(value*1000000) AS BIGINT))
        |             AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |           FROM events WHERE CAST(round(value*1000000) AS BIGINT) <> 0),
        |     o AS (SELECT digit, COUNT(*) AS n_obs FROM v GROUP BY digit),
        |     n AS (SELECT COUNT(*) AS n FROM v)
        |SELECT CAST(b.digit AS BIGINT) AS digit,
        |       CAST(COALESCE(o.n_obs, 0) AS BIGINT) AS n_obs,
        |       CAST(COALESCE(o.n_obs, 0) * 10000 // n.n AS BIGINT) AS share_e4,
        |       CAST(b.benford_e4 AS BIGINT) AS benford_e4,
        |       CAST(COALESCE(o.n_obs, 0) * 10000 // n.n - b.benford_e4 AS BIGINT) AS dev_e4
        |FROM b LEFT JOIN o ON b.digit = o.digit, n
        |ORDER BY digit""".stripMargin,

    "q140_k_anonymity" ->
      """WITH g AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |             COUNT(DISTINCT user_id) AS aset
        |           FROM events GROUP BY 1, 2)
        |SELECT event_type, COUNT(*) AS n_groups,
        |       CAST(SUM(CASE WHEN aset < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_small,
        |       CAST(MIN(aset) AS BIGINT) AS min_aset,
        |       CAST(SUM(CASE WHEN aset < 5 THEN 1 ELSE 0 END) * 10000 // COUNT(*)
        |         AS BIGINT) AS small_e4
        |FROM g GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q138_chi2_independence" ->
      """WITH cells AS (SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow,
        |                 COUNT(*) AS obs FROM events GROUP BY 1, 2),
        |     r AS (SELECT event_type, SUM(obs) AS r FROM cells GROUP BY event_type),
        |     c AS (SELECT dow, SUM(obs) AS c FROM cells GROUP BY dow),
        |     n AS (SELECT SUM(obs) AS nn FROM cells),
        |     t AS (SELECT cells.event_type,
        |             CAST(obs AS HUGEINT) * nn - CAST(r.r AS HUGEINT) * c.c AS num,
        |             CAST(nn AS HUGEINT) * r.r * c.c AS den, r.r AS rr
        |           FROM cells JOIN r ON cells.event_type = r.event_type
        |                      JOIN c ON cells.dow = c.dow, n)
        |SELECT event_type, CAST(MIN(rr) AS BIGINT) AS n_obs,
        |       COUNT(*) AS n_cells,
        |       CAST(SUM(CAST((num * num * 1000000) // den AS BIGINT)) AS BIGINT) AS chi2_e6
        |FROM t GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q137_changepoint" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
        |               FROM events GROUP BY 1, 2),
        |     t AS (SELECT event_type, SUM(n) AS ntot, COUNT(*) AS d
        |           FROM daily GROUP BY event_type),
        |     c AS (SELECT daily.event_type, day,
        |             SUM(n * d - ntot) OVER (PARTITION BY daily.event_type
        |               ORDER BY day ROWS UNBOUNDED PRECEDING) AS cusum_xd,
        |             d
        |           FROM daily JOIN t ON daily.event_type = t.event_type),
        |     r AS (SELECT event_type, d AS n_days, day AS drift_day,
        |             cusum_xd,
        |             ROW_NUMBER() OVER (PARTITION BY event_type
        |               ORDER BY abs(cusum_xd) DESC, day ASC) AS rn
        |           FROM c)
        |SELECT event_type, CAST(n_days AS BIGINT) AS n_days, drift_day,
        |       CAST(cusum_xd AS BIGINT) AS max_cusum_xd
        |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin,

    "q135_bottomk_sample" ->
      """WITH r AS (SELECT lang, doc_id,
        |             CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |               ORDER BY md5(CAST(doc_id AS VARCHAR)),
        |                        CAST(doc_id AS VARCHAR)) AS BIGINT) AS pos
        |           FROM documents)
        |SELECT lang, pos, doc_id FROM r WHERE pos <= 8
        |ORDER BY lang, pos""".stripMargin,

    "q126_token_drift" ->
      s"""WITH t AS (SELECT doc_id % 2 = 0 AS a,
         |             UNNEST(${sqlTokens("text")}) AS tok FROM documents),
         |     c AS (SELECT tok,
         |             CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
         |             CAST(SUM(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS cnt_b
         |           FROM t GROUP BY tok),
         |     m AS (SELECT SUM(cnt_a) AS na, SUM(cnt_b) AS nb FROM c)
         |SELECT tok, cnt_a, cnt_b,
         |       CAST(cnt_b * na * 10000 // (cnt_a * nb) AS BIGINT) AS ratio_e4
         |FROM c, m WHERE cnt_a >= 5 AND cnt_b >= 5
         |ORDER BY ratio_e4 DESC, tok ASC LIMIT 20""".stripMargin
  )
}
