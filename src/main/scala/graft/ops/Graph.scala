package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives for corpus curation — the step AFTER
  * near-dup pair generation (q23/q24/q27/q42): pairs are edges, duplicate
  * clusters are connected components, and "keep one doc per cluster"
  * is a groupBy over the component label.
  */
object Graph {

  /** Connected components by DELTA-ITERATED min-label propagation with
    * pull-based pointer jumping.
    *
    * Labels only ever decrease, and a vertex's neighbors only need to be
    * re-examined when ITS label changed — so each round works off the
    * frontier `delta` (rows whose label changed last round), not the
    * whole graph:
    *
    *   push: edges ⋈ delta(src)          — changed labels flow one hop
    *   jump: labels ⋈ delta(on comp)     — v whose LABEL changed adopts
    *                                       its label's new label (path
    *                                       doubling, pull form)
    *   merge: labels LEFT JOIN candidates, comp := least — and the rows
    *          that improved become next round's delta.
    *
    * Near-dup graphs converge with a long tail (the 16-copy scale
    * fixture runs ~16 rounds, but rounds 5+ change only a handful of
    * chain vertices): in the non-delta form every one of those tail
    * rounds re-joined the FULL edge and label tables (the r9 scale probe
    * measured exponent 0.766 on q64, the dedup family's worst). With the
    * frontier form the tail joins are delta-sized — AQE sees the
    * materialized frontier is tiny and broadcasts it, so the full label
    * table is never shuffled again after the frontier collapses.
    * Convergence is O(log diameter) rounds as before (push is one hop,
    * jump doubles compressed-path length; sf0.1 has real >20-deep
    * near-dup chains where plain one-hop propagation visibly stalls).
    *
    * One deliberate driver-side scalar per round (documented control-flow
    * boundary, same class as the forecaster's fold loop): |delta| — the
    * loop ends when no label improved. No row data is ever collected.
    * Lineage is cut per round with localCheckpoint (on a cluster: a
    * reliable checkpoint dir); without it the plan tree doubles every
    * round and the 10th iteration replans 2^10 joins.
    *
    * Output: one row per vertex, (id, comp) with comp = min vertex id
    * reachable — identical to the non-delta form (any correct CC yields
    * this labeling; DuckDB-oracle-gated via q64/q65).
    */
  def connectedComponents(vertices: DataFrame, idCol: String,
                          edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 30): DataFrame = {
    require(vertices.schema(idCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"connectedComponents needs a numeric id column, got ${vertices.schema(idCol).dataType}")
    var e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .localCheckpoint(true)
    var labels = vertices.select(col(idCol).as("id"))
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    // round-1 frontier: every vertex (its "change" is taking its own id)
    var delta = labels
    var deltaCount = delta.count()
    var vertCount = deltaCount // exact driver-known |labels| (shrinks at contraction)
    val debug = sys.env.contains("GRAFT_CC_DEBUG")
    // Checkpointed (RDD-backed) frames report DEFAULT size stats, so
    // Catalyst would sort-merge-join every round even when the frontier
    // is 200 rows. The frontier/candidate row counts are already known
    // driver-side (the per-round convergence scalar), so the hint is
    // exact, not a guess: broadcast whenever the known count is under
    // the threshold. 4M rows is right for local[*] (one JVM — a
    // broadcast is just a shared map); on a multi-executor cluster set
    // this to the usual ~10MB-equivalent row count.
    val bcastMaxRows = sys.env.getOrElse("GRAFT_CC_BCAST_ROWS", "4000000").toLong
    def hint(df: DataFrame, n: Long): DataFrame =
      if (n <= bcastMaxRows) broadcast(df) else df
    // Iterated QUOTIENT CONTRACTION (public CC-by-contraction, e.g.
    // Kiveris et al.'s star-contraction family): after a few
    // propagation rounds most vertices point at a far-away label, so
    // the quotient graph on the CURRENT LABELS — edges (L(u), L(v)),
    // self-loops dropped — is both much smaller and much shallower
    // than the original. Components of the quotient are exactly the
    // images of the original components (each label block lives inside
    // one component, so quotienting is component-preserving), and each
    // component's global min id m survives as a quotient vertex
    // (comp(m) = m always). Running the SAME delta loop on the
    // quotient and composing the label maps at the end therefore
    // yields the identical (id, min-reachable-id) labeling — but the
    // long tail of rounds (which previously each paid the full-|E|
    // push scan AND the fixed per-round scheduling floor, the r9 scale
    // probe's q64 cost) now runs on the contracted graph. Snapshots
    // stack: contraction at rounds 3 and 8 covers chains hundreds deep.
    // First contraction is unconditional (round 3); later ones only fire
    // while the frontier is still >1k rows — a near-converged loop gains
    // nothing from paying the quotient rebuild plus its full round 1.
    val contractAt = Set(3, 8)
    var snapshots: List[(DataFrame, Long)] = Nil // (id→label map, |labels| rows)
    var i = 0
    while (i < maxIter && deltaCount > 0) {
      if (contractAt.contains(i) && (i == 3 || deltaCount > 1000)) {
        val snap = labels // original(-quotient) ids → current labels
        val lblVerts = labels.select(col("comp").as("id")).distinct()
          .localCheckpoint(true)
        val nVerts = lblVerts.count()
        snapshots ::= (snap, nVerts)
        val m = labels // quotient endpoint rewrite map (vertCount rows)
        e = e.as("e")
          .join(hint(m, vertCount).as("ms"), col("e.src") === col("ms.id"))
          .join(hint(m, vertCount).as("md"), col("e.dst") === col("md.id"))
          .select(col("ms.comp").as("src"), col("md.comp").as("dst"))
          .filter(col("src") =!= col("dst"))
          .distinct()
          .localCheckpoint(true)
        labels = lblVerts.withColumn("comp", col("id"))
        delta = labels
        deltaCount = nVerts
        vertCount = nVerts
        if (debug) System.err.println(s"[cc] contracted at round $i -> $nVerts vertices")
      }
      val t0 = System.nanoTime()
      val d = hint(delta, deltaCount)
      // candidates from the frontier only: one-hop push + pull jump.
      // Contributions from UNCHANGED labels are already folded into
      // their neighbors (min is idempotent), so skipping them is exact.
      val push = e.as("e").join(d.as("d"), col("e.src") === col("d.id"))
        .select(col("e.dst").as("id"), col("d.comp").as("comp"))
      // jump has TWO directions, both frontier-sized. Pull: v whose
      // pointer d changed adopts d's new label. Self: a vertex that just
      // ADOPTED pointer w must read comp(w) once — w may have compressed
      // BEFORE the adoption, and without this leg v would keep the stale
      // w forever (the fixpoint would terminate label-inconsistent).
      val jumpPull = labels.as("l").join(d.as("d"), col("l.comp") === col("d.id"))
        .select(col("l.id").as("id"), col("d.comp").as("comp"))
      val jumpSelf = d.as("d").join(labels.as("l"), col("d.comp") === col("l.id"))
        .select(col("d.id").as("id"), col("l.comp").as("comp"))
      val cand = push.union(jumpPull).union(jumpSelf)
        .groupBy("id").agg(min(col("comp")).as("cand"))
        .localCheckpoint(true)
      val candCount = cand.count()
      // merge: the known-small candidate table broadcasts against the
      // label table — the |V| side stays map-side, never shuffled.
      val mergedPre = labels.as("l")
        .join(hint(cand, candCount).as("c"), col("l.id") === col("c.id"), "left")
        .select(col("l.id").as("id"),
          least(col("l.comp"), coalesce(col("c.cand"), col("l.comp"))).as("comp"),
          (coalesce(col("c.cand"), col("l.comp")) < col("l.comp")).as("__chg"))
      // stats-RESETTING checkpoint: the plain localCheckpoint carries
      // originStats forward, and in a loop the size estimate COMPOUNDS
      // (×3 bits per round here — by round 12 the driver spends seconds
      // per round in BigInteger multiplies inside the stats visitor).
      // The joins above don't need stats: the broadcast decisions are
      // made with exact driver-known row counts via hint().
      val merged = org.apache.spark.sql.GraftCheckpoint.localCheckpointStatsReset(mergedPre)
      labels = merged.select("id", "comp")
      delta = merged.filter(col("__chg")).select("id", "comp")
      deltaCount = delta.count()
      i += 1
      if (debug) System.err.println(
        f"[cc] round $i: ${(System.nanoTime() - t0) / 1e9}%.2f s delta=$deltaCount cand=$candCount")
    }
    // Expansion: compose the contraction maps back out, latest quotient
    // first — comp(v) = comp_final(L_k(…L_1(v)…)). Each fold joins a
    // snapshot map against the (strictly smaller) resolved quotient
    // labeling; the quotient side's row count is driver-known, so the
    // broadcast decision is exact, never a stats guess.
    snapshots.foldLeft(labels) { case (acc, (snap, nAcc)) =>
      snap.as("s").join(hint(acc, nAcc).as("a"), col("s.comp") === col("a.id"))
        .select(col("s.id").as("id"), col("a.comp").as("comp"))
    }
  }
}
