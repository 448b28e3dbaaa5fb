package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** q104's blocking layout is EXACT, not probabilistic: 4 blocks of 15
  * bits over a 60-bit fingerprint, threshold Hamming ≤ 3 — by
  * pigeonhole, 3 differing bits can touch at most 3 blocks, so every
  * qualifying pair agrees on ≥ 1 full block and is found by the
  * (block-index, block-value) equi-join. This spec pins that recall
  * guarantee against brute force so a future re-band (the q31 failure
  * mode from round-5 advice: layout drifting away from the threshold)
  * breaks a test, not silently the operator's semantics. */
class SimHashBandingSpec extends AnyFunSuite {

  private def blocks(h: Long): Seq[Long] =
    (0 until 4).map(i => (h >>> (15 * i)) & 0x7fffL)

  test("4x15-bit banding finds EVERY pair at Hamming <= 3 (pigeonhole)") {
    val rnd = new Random(42)
    // mix of independent prints and deliberate near-dups (<=4 flipped bits)
    val base = Array.fill(120)(rnd.nextLong() & ((1L << 60) - 1))
    val sigs = base ++ base.take(60).map { h =>
      var x = h
      val flips = rnd.nextInt(5) // 0..4 bit flips
      (0 until flips).foreach(_ => x ^= 1L << rnd.nextInt(60))
      x
    }
    val exact = for {
      i <- sigs.indices; j <- sigs.indices if i < j
      if java.lang.Long.bitCount(sigs(i) ^ sigs(j)) <= 3
    } yield (i, j)
    val banded = for {
      i <- sigs.indices; j <- sigs.indices if i < j
      if blocks(sigs(i)).zip(blocks(sigs(j))).exists { case (a, b) => a == b }
      if java.lang.Long.bitCount(sigs(i) ^ sigs(j)) <= 3
    } yield (i, j)
    assert(exact.nonEmpty, "fixture must contain qualifying pairs")
    assert(banded == exact, "banding must have 100% recall at hd<=3")
  }

  test("first-matching-block rule emits each candidate pair exactly once") {
    val rnd = new Random(7)
    val sigs = Array.fill(300)(rnd.nextLong() & ((1L << 60) - 1))
    for (i <- sigs.indices; j <- sigs.indices if i < j) {
      val (ba, bb) = (blocks(sigs(i)), blocks(sigs(j)))
      val matching = (0 until 4).filter(k => ba(k) == bb(k))
      // the join emits the pair once per matching block; the filter
      // "all earlier blocks differ" keeps exactly the first
      val kept = matching.count(k => (0 until k).forall(p => ba(p) != bb(p)))
      assert(kept == (if (matching.isEmpty) 0 else 1))
    }
  }
}
