package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed graph primitives for corpus curation — the step AFTER
  * near-dup pair generation (q23/q24/q27/q42): pairs are edges, duplicate
  * clusters are connected components, and "keep one doc per cluster"
  * is a groupBy over the component label.
  */
object Graph {

  /** Connected components by min-label propagation.
    *
    * Each round: every vertex takes the min of its own label and its
    * neighbors' labels — one equi-join (edges ⋈ labels on src) plus one
    * groupBy(id).min shuffle — then POINTER-JUMPS (label := label of its
    * label, a self-join on the label column): path compression halves
    * chain depth every round, so convergence is O(log diameter) rounds,
    * not O(diameter). sf0.1 has real >20-deep near-dup chains — plain
    * propagation visibly stalls there; with jumping the same graphs
    * close in <10 rounds. Every step is an equi-join/aggregation
    * partitioned on vertex id, AQE/skew-governed.
    *
    * Two deliberate driver-side scalars per round (documented control-
    * flow boundary, same class as the forecaster's fold loop): labels
    * only ever DECREASE, so Σlabels is a convergence certificate — one
    * decimal agg per round, no row data collected. Lineage is cut per
    * round with localCheckpoint (on a cluster: a reliable checkpoint
    * dir); without it the plan tree doubles every round and the 10th
    * iteration replans 2^10 joins.
    *
    * `idCol` must be numeric (the certificate sums labels as DECIMAL; a
    * non-numeric id would cast to null and corrupt the convergence
    * test) — doc ids are. An empty vertex frame returns immediately
    * (SUM over zero rows is null, not a certificate).
    */
  def connectedComponents(vertices: DataFrame, idCol: String,
                          edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 20): DataFrame = {
    require(vertices.schema(idCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"connectedComponents needs a numeric id column, got ${vertices.schema(idCol).dataType}")
    // SELF-LOOPS are added once up front: propagation then reads "min
    // label over src∪self per dst" off ONE join+aggregate — r7 unioned
    // `labels` into the propagation every round, which both evaluated
    // the live label plan twice per round and (with a checkpointed
    // label relation on each side of the union) tripped Union
    // constraint rewriting at analysis.
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .union(vertices.select(col(idCol).as("src"), col(idCol).as("dst")))
      .localCheckpoint(true)
    var labels = vertices.select(col(idCol).as("id"))
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    def certificate(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("comp").cast(DecimalType(38, 0)))).head().getDecimal(0)
    var prev = certificate(labels)
    if (prev == null) return labels // zero vertices: nothing to propagate
    val debug = sys.env.contains("GRAFT_CC_DEBUG")
    var i = 0
    var done = false
    while (i < maxIter && !done) {
      val t0 = System.nanoTime()
      // one join + one partial-agg min per round (self-loops make the
      // "own label" case just another edge). Checkpoint BEFORE the
      // self-join below: it cuts the per-round lineage and gives the
      // two join sides independent attribute ids.
      val propagated = e.as("e").join(labels.as("l"), col("e.src") === col("l.id"))
        .select(col("e.dst").as("id"), col("l.comp").as("comp"))
        .groupBy("id").agg(min(col("comp")).as("comp"))
        .localCheckpoint(true)
      // pointer jump: a label is always itself a vertex id, so the inner
      // self-join is total; comp := min(comp, comp[comp]). Checkpointed
      // EAGERLY: without it the self-join executed twice per round —
      // once under the certificate action and again re-derived as next
      // round's input (r7 scale probe: q64 was the dedup family's worst
      // exponent; this halves its per-round join work). One jump per
      // round is the measured optimum here: a double-jump variant (two
      // chained checkpointed self-joins per round) was tried in r8 and
      // tripled checkpoint-storage pressure — per-round time exploded
      // ~50× past round 10 on the 16-copy fixture while barely cutting
      // the round count (the convergence tail is breadth, not depth).
      val next = propagated.as("a")
        .join(propagated.as("b"), col("a.comp") === col("b.id"))
        .select(col("a.id").as("id"),
          least(col("a.comp"), col("b.comp")).as("comp"))
        .localCheckpoint(true)
      val cert = certificate(next)
      done = cert.compareTo(prev) == 0
      prev = cert
      labels = next
      i += 1
      if (debug) System.err.println(
        f"[cc] round $i: ${(System.nanoTime() - t0) / 1e9}%.2f s cert=$cert done=$done")
    }
    labels
  }
}
