package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Relational._

/** Property tests (SURVEY §5): operator laws that hold for ANY input,
  * not just the golden testdata — latestPerKey idempotence and
  * uniqueness, inclusive date-sequence cardinality, lookback-window
  * bounds. Generators are ScalaCheck Gens sampled with fixed seeds so
  * runs are reproducible. */
class PropertySpec extends AnyFunSuite {

  lazy val spark = Engine.session("property-test")
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val rowsGen: Gen[List[(Int, Int, Int)]] =
    Gen.nonEmptyListOf(for {
      key <- Gen.choose(0, 5)
      id <- Gen.choose(0, 50)
      v <- Gen.choose(0, 1000)
    } yield (key, id, v))

  test("latestPerKey is idempotent and keeps exactly one row per key, the max id") {
    samples(rowsGen, 8).foreach { rows =>
      val df = rows.toDF("k", "id", "v")
      val once = latestPerKey(df, Seq("k"), col("id"))
      val twice = latestPerKey(once, Seq("k"), col("id"))
      val got = once.select("k", "id").as[(Int, Int)].collect().toMap
      val expect = rows.groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).max }
      assert(got == expect, s"input: $rows")
      assert(twice.collect().toSet == once.collect().toSet)
    }
  }

  test("dateIndex(start, start+n) is inclusive of both ends: n+1 rows") {
    val gen = for {
      n <- Gen.choose(0, 30)
      off <- Gen.choose(0L, 3000L)
    } yield (n, off)
    samples(gen, 8).foreach { case (n, dayOffset) =>
      val d0 = java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(dayOffset))
      val df = Seq(Tuple1(d0)).toDF("d")
      val idx = dateIndex(df, col("d"), date_add(col("d"), n), "day")
      assert(idx.count() == n + 1)
      val days = idx.select("day").as[java.sql.Date].collect().map(_.toLocalDate)
      assert(days.min == d0.toLocalDate && days.max == d0.toLocalDate.plusDays(n.toLong))
    }
  }

  test("sessionize matches a sequential in-memory reference for any event times") {
    val gen = for {
      gap <- Gen.choose(1L, 50L)
      evs <- Gen.nonEmptyListOf(for {
        key <- Gen.choose(0, 3)
        t <- Gen.choose(0L, 500L)
      } yield (key, t))
    } yield (gap, evs)
    samples(gen, 6).foreach { case (gap, evs) =>
      // unique (key, time) so the (time, id) tiebreak can't mask order bugs
      val rows = evs.distinct.zipWithIndex.map { case ((k, t), i) => (k, i.toLong, t) }
      val got = sessionize(rows.toDF("k", "id", "t"), Seq("k"), col("t"), col("id"), gap)
        .select("k", "id", "session_id").as[(Int, Long, Long)].collect()
        .map { case (k, id, s0) => (k, id) -> s0 }.toMap
      // reference: walk each key's events in (t, id) order, split on gap
      rows.groupBy(_._1).foreach { case (k, rs) =>
        var sess = 0L
        var prev = Long.MinValue
        rs.sortBy(r => (r._3, r._2)).foreach { case (_, id, t) =>
          if (prev == Long.MinValue || t - prev > gap) sess += 1
          prev = t
          assert(got((k, id)) == sess, s"gap=$gap rows=$rows: ($k,$id)")
        }
      }
    }
  }

  test("connectedComponents matches union-find on random graphs") {
    val gen = for {
      n <- Gen.choose(1, 40)
      edges <- Gen.listOf(for {
        a <- Gen.choose(0L, 39L)
        b <- Gen.choose(0L, 39L)
      } yield (a % n, b % n))
    } yield (n.toLong, edges)
    samples(gen, 6).foreach { case (n, edges0) =>
      val edges = edges0.filter { case (a, b) => a != b }
      // union-find reference
      val parent = Array.tabulate(n.toInt)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) => parent(find(a.toInt)) = find(b.toInt) }
      val expectComp = (0 until n.toInt).map { v =>
        v.toLong -> (0 until n.toInt).filter(u => find(u) == find(v)).min.toLong
      }.toMap
      val verts = (0L until n).toDF("id")
      val edf = (if (edges.isEmpty) Seq((0L, 0L)) else edges).toDF("a", "b")
      val got = graft.ops.Graph.connectedComponents(verts, "id", edf, "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(got == expectComp, s"n=$n edges=$edges")
    }
  }

  test("rangeJoin equals the naive point-in-interval theta join for any bin width") {
    val gen = for {
      binW <- Gen.choose(1L, 10L)
      points <- Gen.nonEmptyListOf(Gen.choose(0L, 100L))
      ivs <- Gen.nonEmptyListOf(for {
        lo <- Gen.choose(0L, 100L)
        w <- Gen.choose(0L, 30L)
      } yield (lo, lo + w))
    } yield (binW, points, ivs)
    samples(gen, 6).foreach { case (binW, points, ivs0) =>
      val ivs = ivs0.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
      val left = points.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
      val right = ivs.toDF("iid", "lo", "hi")
      val got = graft.ops.Relational.rangeJoin(left, col("p"), right, col("lo"), col("hi"), binW)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      val expect = (for {
        (pid, p) <- points.zipWithIndex.map { case (p, i) => (i.toLong, p) }
        (iid, lo, hi) <- ivs if p >= lo && p <= hi
      } yield (pid, iid)).toSet
      assert(got == expect, s"binW=$binW points=$points ivs=$ivs")
    }
  }

  test("asOfJoin picks the latest right row at-or-before each left time, any input") {
    val gen = for {
      lefts <- Gen.nonEmptyListOf(for {
        k <- Gen.choose(0, 2); t <- Gen.choose(0L, 50L)
      } yield (k, t))
      rights <- Gen.listOf(for {
        k <- Gen.choose(0, 2); t <- Gen.choose(0L, 50L); v <- Gen.choose(1L, 999L)
      } yield (k, t, v))
    } yield (lefts, rights)
    samples(gen, 6).foreach { case (lefts0, rights) =>
      val lefts = lefts0.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val l = lefts.toDF("lid", "k", "lt")
      val r = (if (rights.isEmpty) Seq((99, -1L, 1L)) else rights).toDF("k", "rt", "pay")
      val got = graft.ops.Relational.asOfJoin(l, r, Seq("k"), col("lt"), col("rt"),
          col("pay"), "asof_pay")
        .select("lid", "asof_pay").collect()
        .map(row => row.getLong(0) -> (if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap
      lefts.foreach { case (lid, k, lt) =>
        // reference: among right rows with rt <= lt in this key, the
        // (rt, pay)-lexicographic max payload (the operator's tie rule)
        val cands = (if (rights.isEmpty) Nil else rights)
          .filter { case (rk, rt, _) => rk == k && rt <= lt }
        val expect = if (cands.isEmpty) None else Some(cands.maxBy(c => (c._2, c._3))._3)
        assert(got(lid) == expect, s"left=($lid,$k,$lt) rights=$rights")
      }
    }
  }

  test("contiguousIds over range-partitioned sorted input equals ROW_NUMBER by that key") {
    val gen = Gen.nonEmptyListOf(Gen.choose(0, 100000)).map(_.distinct)
    samples(gen, 6).foreach { keys =>
      val df = keys.toDF("k")
        .repartitionByRange(8, col("k")).sortWithinPartitions("k")
      val got = contiguousIds(df, "rid").select("rid", "k")
        .as[(Long, Int)].collect().sortBy(_._1)
      val expect = keys.sorted.zipWithIndex.map { case (k, i) => (i.toLong, k) }
      assert(got.toSeq == expect, s"keys=$keys")
    }
  }

  test("spreadCompute pins parallelism on small frames, never shrinks a known-large one") {
    val p = spark.sparkContext.defaultParallelism
    // small frame (stats: 8 bytes/row, far under p × 64 MB): the helper
    // must pin round-robin parallelism at defaultParallelism
    val small = spark.range(1000).toDF("id")
    assert(spreadCompute(small).rdd.getNumPartitions == p)
    // known-large frame (estimate > p × 64 MB): returned UNTOUCHED —
    // repartition(p) would SHRINK a production-size frame's parallelism
    // and concentrate per-key state (VERDICT r14 "next" #7)
    val rows = (BigInt(p.toLong) * (64L << 20) / 8 + 8).toLong
    val big = spark.range(rows).toDF("id")
    assert(spreadCompute(big) eq big)
  }

  test("gapFillDaily yields a dense daily spine per key with last value carried forward") {
    val gen = Gen.nonEmptyListOf(for {
      k <- Gen.choose(0, 3)
      off <- Gen.choose(0, 40)
      v <- Gen.choose(0L, 1000L)
    } yield (k, off, v)).map(_.groupBy(r => (r._1, r._2)).map(_._2.head).toList)
    samples(gen, 6).foreach { rows =>
      val base = java.time.LocalDate.parse("2024-01-01")
      val df = rows.map { case (k, off, v) =>
        (k, java.sql.Date.valueOf(base.plusDays(off.toLong)), v)
      }.toDF("k", "day", "v")
      val got = gapFillDaily(df, Seq("k"), "day")
        .select("k", "day", "v", "observed")
        .as[(Int, java.sql.Date, Long, Long)].collect()
        .map { case (k, d, v, o) => (k, d.toLocalDate, v, o) }.toSeq
      rows.groupBy(_._1).foreach { case (k, ks) =>
        val byDay = ks.map { case (_, off, v) => base.plusDays(off.toLong) -> v }.toMap
        val (lo, hi) = (byDay.keys.min, byDay.keys.max)
        val mine = got.filter(_._1 == k).sortBy(_._2.toEpochDay)
        // dense: one row per day in [lo, hi], nothing outside
        assert(mine.map(_._2) == Iterator.iterate(lo)(_.plusDays(1)).takeWhile(!_.isAfter(hi)).toSeq)
        mine.foreach { case (_, d, v, o) =>
          val lastObs = Iterator.iterate(d)(_.minusDays(1)).find(byDay.contains).get
          assert(v == byDay(lastObs), s"k=$k d=$d")       // carried value
          assert(o == (if (byDay.contains(d)) 1L else 0L)) // observed marker
        }
      }
    }
  }

  test("gapFillDaily tolerates duplicate (key, day) rows: no phantom dates, spine stays dense") {
    // ADVICE r5 (medium): without the __run >= 1 clamp, a duplicate day
    // makes lead() yield the tied day, __run = 0, and sequence(0, -1)
    // (negative default step) fabricates a spurious day-1 row.
    val base = java.sql.Date.valueOf("2024-01-10")
    val dup = java.sql.Date.valueOf("2024-01-12")
    val df = Seq((1, base, 10L), (1, dup, 20L), (1, dup, 30L)).toDF("k", "day", "v")
    val got = gapFillDaily(df, Seq("k"), "day")
      .select("day", "observed").as[(java.sql.Date, Long)].collect().toSeq
    // no date outside [Jan 10, Jan 12], in particular no Jan 11 marked observed
    // and no phantom Jan 9 / duplicate-minus-one row
    assert(got.map(_._1.toLocalDate).forall(d =>
      !d.isBefore(base.toLocalDate) && !d.isAfter(dup.toLocalDate)))
    // dense spine still covered: 10, 11, 12 all present
    assert(got.map(_._1.toLocalDate).toSet ==
      Set(base.toLocalDate, base.toLocalDate.plusDays(1), dup.toLocalDate))
    // each duplicate input row surfaces as its own observed row
    assert(got.count { case (d, o) => d == dup && o == 1L } == 2)
    assert(got.count(_._2 == 0L) == 1) // only Jan 11 is filled
  }

  test("lookbackDays keeps exactly the dates in [anchor-(n-1), anchor]") {
    val gen = for {
      n <- Gen.choose(1, 20)
      offsets <- Gen.nonEmptyListOf(Gen.choose(0, 59))
    } yield (n, offsets)
    samples(gen, 8).foreach { case (n, offsets) =>
      val anchor = java.time.LocalDate.parse("2024-03-01")
      val df = offsets.map(o => Tuple1(java.sql.Date.valueOf(anchor.minusDays(o.toLong)))).toDF("d")
      val kept = lookbackDays(df, col("d"), lit(java.sql.Date.valueOf(anchor)), n)
        .as[java.sql.Date].collect().map(_.toLocalDate)
      assert(kept.toSet == offsets.filter(_ < n).map(o => anchor.minusDays(o.toLong)).toSet,
        s"n=$n offsets=$offsets")
    }
  }
}
