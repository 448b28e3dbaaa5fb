package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's ratio-normalization (VERDICT r14 #1) must read the box,
  * not the code: uniform load shifts every per-query ratio together
  * (the median IS the load factor), while a real regression in a few
  * queries must NOT move the median — that separation is the entire
  * point of replacing the cal-probe scaling in the degraded regime. */
class BenchNormSpec extends AnyFunSuite {

  private val ref = (1 to 40).map(i => s"q$i" -> (0.1 + i * 0.05)).toMap

  test("uniform box load reads as exactly the load factor") {
    val loaded = ref.map { case (k, v) => k -> v * 1.4 }
    val r = Bench.medianRatio(loaded, ref)
    assert(r.isDefined && math.abs(r.get - 1.4) < 1e-9, s"got $r")
  }

  test("a few regressed queries cannot move the median") {
    // 4 of 40 queries regress 5x on an otherwise clean box: the box
    // reading stays 1.0 — the regression surfaces in the detail map,
    // not in the normalization factor
    val run = ref.map { case (k, v) =>
      k -> (if (Set("q3", "q7", "q11", "q13")(k)) v * 5 else v)
    }
    val r = Bench.medianRatio(run, ref)
    assert(r.isDefined && math.abs(r.get - 1.0) < 1e-9, s"got $r")
  }

  test("load and regression separate: normalized total still moves") {
    // 1.5x-loaded box AND q5 regressed 10x: the median reads the load,
    // so raw/median keeps the regression visible in the total
    val run = ref.map { case (k, v) =>
      k -> (if (k == "q5") v * 1.5 * 10 else v * 1.5)
    }
    val r = Bench.medianRatio(run, ref).get
    assert(math.abs(r - 1.5) < 1e-9)
    val normTotal = run.values.sum / r
    val cleanTotal = ref.values.sum
    assert(normTotal > cleanTotal * 1.05,
      s"regression hidden: $normTotal vs $cleanTotal")
  }

  test("sub-floor queries are excluded from the ratio") {
    // tiny queries time at scheduling noise — a 10x swing on a 10 ms
    // query must not contaminate the box reading
    val noisy = ref + ("tiny" -> 0.01)
    val run = ref.map { case (k, v) => k -> v * 1.2 } + ("tiny" -> 0.1)
    val r = Bench.medianRatio(run, noisy)
    assert(r.isDefined && math.abs(r.get - 1.2) < 1e-9, s"got $r")
  }

  test("thin common set yields no ratio rather than a misleading one") {
    assert(Bench.medianRatio(Map("q1" -> 1.0), ref).isEmpty)
    assert(Bench.medianRatio(
      ref.map { case (k, v) => ("x" + k) -> v }, ref).isEmpty)
  }

  test("ratio quartiles separate uniform load from non-uniform degradation") {
    // uniform 1.4x load: quartiles collapse onto the median — the
    // artifact reads "trust the normalization"
    val (u25, u75) = Bench.ratioQuartiles(
      ref.map { case (k, v) => k -> v * 1.4 }, ref).get
    assert(math.abs(u25 - 1.4) < 1e-9 && math.abs(u75 - 1.4) < 1e-9)
    // the VERDICT r15 #3 case: half the vector at 1.1x, half at 2.0x —
    // the median alone can't distinguish this from a clean 1.5x box,
    // but the quartiles straddle the split
    val skewed = ref.map { case (k, v) =>
      k -> (if (k.drop(1).toInt % 2 == 0) v * 1.1 else v * 2.0)
    }
    val (s25, s75) = Bench.ratioQuartiles(skewed, ref).get
    assert(s25 <= 1.1 + 1e-9 && s75 >= 2.0 - 1e-9, s"($s25, $s75)")
    // a few regressed queries on a clean box: quartiles stay at 1.0 —
    // the regression belongs to the detail map, not the box reading
    val reg = ref.map { case (k, v) =>
      k -> (if (Set("q3", "q7")(k)) v * 5 else v)
    }
    val (r25, r75) = Bench.ratioQuartiles(reg, ref).get
    assert(math.abs(r25 - 1.0) < 1e-9 && math.abs(r75 - 1.0) < 1e-9)
    // thin common set → none, same rule as the median
    assert(Bench.ratioQuartiles(Map("q1" -> 1.0), ref).isEmpty)
  }

  test("budget pass aggregation: min + lower median, never best-of") {
    // full three passes: identical to the historical min+median
    val p1 = Map("a" -> 3.0, "b" -> 1.0)
    val p2 = Map("a" -> 1.0, "b" -> 2.0)
    val p3 = Map("a" -> 2.0, "b" -> 3.0)
    assert(Bench.aggregatePasses(Seq(p1, p2, p3)) ==
      Map("a" -> (1.0, 2.0), "b" -> (1.0, 2.0)))
    // two passes (budget skipped pass3): lower median = the min —
    // degrades conservative, not optimistic
    assert(Bench.aggregatePasses(Seq(p1, p2)) ==
      Map("a" -> (1.0, 1.0), "b" -> (1.0, 1.0)))
    // one pass: min = med = the only sample
    assert(Bench.aggregatePasses(Seq(p1)) ==
      Map("a" -> (3.0, 3.0), "b" -> (1.0, 1.0)))
    // a failure in ANY pass poisons the query, like the 3-pass rule
    val pf = Map("a" -> -1.0, "b" -> 2.5)
    assert(Bench.aggregatePasses(Seq(p1, pf, p3))("a") == (-1.0, -1.0))
    assert(Bench.aggregatePasses(Seq(p1, pf, p3))("b") == (1.0, 2.5))
  }

  test("knee reliability: unknown box regime is not healthy (ADVICE r16)") {
    assert(Bench.kneeReliable(bracketed = true, Some(1.0)))
    assert(Bench.kneeReliable(bracketed = true, Some(1.15)))
    assert(!Bench.kneeReliable(bracketed = true, Some(1.16)))
    // the fixed case: no ratio available (non-sf0.1 run / thin common
    // set) must NOT vacuously read as a healthy box
    assert(!Bench.kneeReliable(bracketed = true, None))
    assert(!Bench.kneeReliable(bracketed = false, Some(1.0)))
  }

  test("pinned reference vector: healthy r14 core + r15/r16 extensions") {
    assert(BenchRef.sf == "sf0.1")
    assert(BenchRef.queries.size >= 215)
    // the r14 MEASURED core still sums to the pinned healthy total;
    // the extension entries (q197+: r15 healthy-run measurements for
    // the selection family, de-loaded derivations for the perceptual
    // family pending a healthy round-16 re-pin — see BenchRef) are
    // excluded from this sum check
    val ext = (197 to 299).map(n => s"q$n").toSet
    val core = BenchRef.queries.filterNot { case (k, _) => ext(k) }
    assert(core.size == 196)
    assert(math.abs(core.values.sum - BenchRef.totalSec) < 1.0,
      "pinned per-query mins should sum to ~the pinned total")
    // self-ratio is identity: a rerun of the exact reference reads 1.0
    val r = Bench.medianRatio(BenchRef.queries, BenchRef.queries)
    assert(r.contains(1.0))
  }
}
