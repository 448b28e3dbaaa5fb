package graft

import graft.functions.{ImageCodec, ImageOps}
import graft.functions.ImageOps.Gray

/** Semantic pins for the perceptual image-dedup family (q206-q208,
  * q216) — properties the oracle hash can't express as invariants: the
  * hash kernels' algebra (gradient-sign semantics, brightness-shift
  * invariance, the per-lane positivity rule), the real-codec path
  * actually feeding the fingerprint, the production-width banded join
  * matching an independent replay of its df-capped relation, and
  * q208's clique-free cluster construction being EXACTLY the
  * verified-pair graph's components. */
class PerceptualQueriesSpec extends SparkSpec {

  import graft.operators.WidePhash

  // the q88/q145 plane formula, re-derived independently (code-point
  // indexed) so the query-path test pins the whole chain
  private def plane(text: String): Array[Byte] = {
    val cps = text.codePoints().toArray
    val n = math.max(1, cps.length)
    Array.tabulate(512) { i =>
      val c = if (cps.isEmpty) 0 else cps((i * 7) % n)
      (if ((c * (i + 1)) % 17 == 0) 40 else 255).toByte
    }
  }

  test("cellSums: 8x8 grid over 32x16 sums each 4x2 block exactly") {
    // plane with pixel value = x (column index): cell (cx, cy) sum is
    // 2 * (4*cx*4 + 0+1+2+3) = 32*cx + 12, independent of cy
    val px = Array.tabulate(512)(i => (i % 32).toByte)
    val cells = ImageOps.cellSums(Gray(32, 16, px), 8, 8)
    assert(cells.length == 64)
    for (c <- 0 until 64) assert(cells(c) == 32 * (c % 8) + 12, s"cell $c")
    intercept[IllegalArgumentException] {
      ImageOps.cellSums(Gray(32, 16, px), 7, 8) // 7 does not tile 32
    }
  }

  test("dHash63/aHash63: gradient-sign semantics, hand case") {
    // cells strictly decreasing: every neighbor comparison true
    val dec = Array.tabulate(64)(i => 1000 - i)
    assert(ImageOps.dHash63(dec) == (1L << 63) - 1) // all 63 bits
    // strictly increasing: no bit set
    assert(ImageOps.dHash63(dec.reverse) == 0L)
    // aHash: one cell far above the mean sets only (at most) its bit
    val flat = Array.fill(64)(100)
    assert(ImageOps.aHash63(flat) == 0L) // equal to mean is NOT above
    val spike = flat.clone(); spike(5) = 10000
    val ah = ImageOps.aHash63(spike)
    assert((ah & (1L << 5)) != 0)
    // cells 0..4 and 6..62 are below the lifted mean → no other bits
    assert(ah == (1L << 5))
    intercept[IllegalArgumentException] { ImageOps.dHash63(Array(1, 2)) }
    intercept[IllegalArgumentException] { ImageOps.aHash63(Array(1, 2)) }
  }

  test("both hashes are brightness-shift invariant and stay positive") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 50) {
      val cells = Array.fill(64)(rnd.nextInt(1500))
      val shifted = cells.map(_ + 123)
      assert(ImageOps.dHash63(cells) == ImageOps.dHash63(shifted))
      // aHash compares cell*64 vs total; a uniform shift adds 64c to
      // both sides, so the verdict is unchanged — exact integer algebra
      assert(ImageOps.aHash63(cells) == ImageOps.aHash63(shifted))
      assert(ImageOps.dHash63(cells) >= 0 && ImageOps.aHash63(cells) >= 0)
    }
  }

  test("dHashWide: lane layout, brightness invariance, per-lane positivity") {
    // strictly decreasing cells: all 252 comparisons true — lanes
    // 0..3 each carry 63 set bits (the full 63-bit positive word)
    val dec = Array.tabulate(256)(i => 10000 - i)
    assert(ImageOps.dHashWide(dec).toSeq == Seq.fill(4)((1L << 63) - 1))
    assert(ImageOps.dHashWide(dec.reverse).toSeq == Seq.fill(4)(0L))
    // comparison g lands in lane g/63 bit g%63: flip exactly one
    val flat = Array.fill(256)(100)
    for (g <- Seq(0, 62, 63, 125, 126, 251)) {
      val c = flat.clone(); c(g) = 200 // cells(g) > cells(g+1)
      val lanes = ImageOps.dHashWide(c)
      assert(lanes(g / 63) == (1L << (g % 63)), s"comparison $g")
      // ...except the preceding comparison g−1 (cells(g−1) vs the
      // bumped cells(g)) is unaffected because 100 > 200 is false
      assert(lanes.zipWithIndex.filter(_._2 != g / 63).forall(_._1 == 0L))
    }
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val cells = Array.fill(256)(rnd.nextInt(1500))
      val shifted = cells.map(_ + 321)
      assert(ImageOps.dHashWide(cells).toSeq ==
        ImageOps.dHashWide(shifted).toSeq)
      assert(ImageOps.dHashWide(cells).forall(_ >= 0L))
    }
    intercept[IllegalArgumentException] {
      ImageOps.dHashWide(Array.fill(64)(1))
    }
    // the block split: 12 blocks of 21 bits, lane b/3 shifted by
    // 21·(b%3) — one hand case against an independent formula
    val lanes = Array(0x123456789abcdL, 0x7fffffffffffffffL & ~(1L << 63),
      0L, 0x40000000000000L)
    for (b <- 0 until 12)
      assert(WidePhash.block(lanes, b) ==
        ((lanes(b / 3) >>> (21 * (b % 3))) & ((1L << 21) - 1)), s"block $b")
  }

  test("q206 fingerprints the DECODED PNG bytes — codec path equals plane math") {
    val rows = SparkEntry.queries("q206_image_phash")(spark, sf0001)
      .collect()
    assert(rows.length > 0)
    val texts = spark.read.parquet(s"$sf0001/documents.parquet")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
      .toMap
    rows.foreach { r =>
      val text = texts(r.getAs[Long]("doc_id"))
      // independent re-derivation WITHOUT the codec: textPlane → cells
      val cells = ImageOps.cellSums(Gray(32, 16, plane(text)), 8, 8)
      assert(r.getAs[Long]("dhash") == ImageOps.dHash63(cells))
      assert(r.getAs[Long]("ahash") == ImageOps.aHash63(cells))
      // and the production-width fingerprint over the 16×16 grid
      val wide = ImageOps.dHashWide(
        ImageOps.cellSums(Gray(32, 16, plane(text)), 16, 16))
      assert(Seq("w0", "w1", "w2", "w3").map(r.getAs[Long]) == wide.toSeq)
      // and the codec really is lossless on this plane (the identity
      // the oracle depends on)
      val enc = ImageCodec.encode(Gray(32, 16, plane(text)), "png")
      val dec = ImageCodec.decode(enc).get
      assert(dec.px.sameElements(plane(text)))
    }
  }

  /** The q206 wide fingerprints, for the replay tests below. */
  private def wideHashes: Map[Long, Array[Long]] =
    SparkEntry.queries("q206_image_phash")(spark, sf0001)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        Array(r.getAs[Long]("w0"), r.getAs[Long]("w1"),
          r.getAs[Long]("w2"), r.getAs[Long]("w3"))).toMap

  /** Independent replay of the df-capped wide relation: a pair
    * survives iff the fingerprints are identical (hd 0, cap-exempt) or
    * hd ≤ HdMax AND some matching 21-bit block's bucket holds ≤ DfCap
    * DISTINCT fingerprints. */
  private def expectedWidePairs(
      hashes: Map[Long, Array[Long]]): Set[(Long, Long, Int)] = {
    val distinct = hashes.values.map(_.toSeq).toSet.map((s: Seq[Long]) => s.toArray)
    val bdf = scala.collection.mutable.Map.empty[(Int, Long), Int]
    for (h <- distinct; k <- 0 until WidePhash.Blocks)
      bdf.updateWith((k, WidePhash.block(h, k)))(c => Some(c.getOrElse(0) + 1))
    val ids = hashes.keys.toArray.sorted
    val out = Set.newBuilder[(Long, Long, Int)]
    for (i <- ids.indices; j <- (i + 1) until ids.length) {
      val (ha, hb) = (hashes(ids(i)), hashes(ids(j)))
      val d = WidePhash.hd(ha, hb)
      if (d == 0) out += ((ids(i), ids(j), 0))
      else if (d <= WidePhash.HdMax &&
        (0 until WidePhash.Blocks).exists(k =>
          WidePhash.block(ha, k) == WidePhash.block(hb, k) &&
            bdf((k, WidePhash.block(ha, k))) <= WidePhash.DfCap))
        out += ((ids(i), ids(j), d))
    }
    out.result()
  }

  test("q207 pairs == independent replay of the df-capped wide relation") {
    val hashes = wideHashes
    val pairs = SparkEntry.queries("q207_image_near_dup")(spark, sf0001)
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      assert(a < b, s"unordered pair $r")
      assert(r.getAs[Int]("hd") == WidePhash.hd(hashes(a), hashes(b)) &&
        r.getAs[Int]("hd") <= WidePhash.HdMax, s"bad hd: $r")
    }
    val got = pairs.map(r => (r.getAs[Long]("doc_a"),
      r.getAs[Long]("doc_b"), r.getAs[Int]("hd"))).toSet
    assert(got.size == pairs.length, "duplicate pair rows")
    val expect = expectedWidePairs(hashes)
    assert(got == expect,
      s"capped relation mismatch: extra=${(got -- expect).take(5)} " +
        s"missing=${(expect -- got).take(5)} (got ${got.size}, " +
        s"expect ${expect.size})")
    assert(pairs.exists(_.getAs[Int]("hd") == 0),
      "testdata contains identical-fingerprint docs; hd=0 pairs must appear")
    assert(pairs.exists(_.getAs[Int]("hd") > 0),
      "cross-fingerprint near dups must survive the banding + cap")
  }

  test("fingerprint63: exact gain invariance, frame guard") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 20) {
      val x = Array.fill(256)(rnd.nextDouble() - 0.5)
      val fp = graft.functions.AudioDsp.fingerprint63(x)
      // energies scale by g² under gain g, so every double-difference
      // keeps its sign EXACTLY — the Haitsma-Kalker robustness claim
      // is algebraic here, not approximate
      assert(fp == graft.functions.AudioDsp.fingerprint63(x.map(_ * 2.0)))
      assert(fp == graft.functions.AudioDsp.fingerprint63(x.map(_ * 0.5)))
      assert(fp >= 0L)
    }
    intercept[IllegalArgumentException] {
      graft.functions.AudioDsp.fingerprint63(new Array[Double](128))
    }
  }

  test("q209 equals an independent synthesis → fingerprint63 re-derivation") {
    val rows = SparkEntry.queries("q209_audio_fingerprint")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    val texts = spark.read.parquet(s"$sf0001/documents.parquet")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
      .toMap
    rows.foreach { r =>
      val cps = texts(r.getAs[Long]("doc_id")).codePoints().toArray
      val nch = math.max(1, cps.length)
      val x = Array.tabulate(256) { i =>
        ((cps((i * 11) % nch) * (i + 7)) % 97) / 97.0 - 0.5
      }
      assert(r.getAs[Long]("fp") ==
        graft.functions.AudioDsp.fingerprint63(x))
    }
  }

  test("q210/q211 coherent: recall arithmetic, planted-pair accounting") {
    val pairs = SparkEntry.queries("q210_audio_near_dup")(spark, sf0001)
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach(r => assert(r.getAs[Int]("hd") <= 3))
    val planted = pairs.count { r =>
      val (a, b) = (r.getAs[Long]("clip_a"), r.getAs[Long]("clip_b"))
      b - a == 1 && a % 2 == 0
    }
    val rec = SparkEntry.queries("q211_audio_fp_recall")(spark, sf0001)
      .collect().head
    assert(rec.getAs[Long]("n_recovered") == planted)
    assert(rec.getAs[Long]("n_collisions") == pairs.length - planted)
    assert(rec.getAs[Long]("n_hd0") + rec.getAs[Long]("n_hd1") +
      rec.getAs[Long]("n_hd2") + rec.getAs[Long]("n_hd3") ==
      rec.getAs[Long]("n_recovered"))
    assert(rec.getAs[Long]("recall_bp") ==
      10000L * rec.getAs[Long]("n_recovered") / rec.getAs[Long]("n_planted"))
    // the gate must recover the overwhelming majority of planted
    // degradations (measured 9440 bp at sf0.01) — a fingerprint or
    // banding regression craters this long before the oracle drifts
    assert(rec.getAs[Long]("recall_bp") >= 8500,
      s"planted-pair recall collapsed: $rec")
  }

  test("q212 funnel: monotone survivors, image drop == q208's non-canonicals") {
    val r = SparkEntry.queries("q212_multimodal_dedup_funnel")(spark, sf0001)
      .collect().head
    val (n, t, i, a) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_after_text"),
      r.getAs[Long]("n_after_image"), r.getAs[Long]("n_after_audio"))
    assert(n >= t && t >= i && i >= a && a > 0, s"non-monotone funnel: $r")
    // the testdata's texts are all distinct, so the text stage passes
    // everything through — and with every cluster member surviving,
    // the min-SURVIVING-member rule (ADVICE r15: the image stage keeps
    // one copy per cluster even when the global canonical was dropped
    // upstream) reduces to "keep the canonical", so the image-stage
    // drop is EXACTLY the non-canonical cluster members q208 reports
    assert(t == n, s"precondition drifted: texts no longer all distinct ($r)")
    val drop = SparkEntry.queries("q208_image_dup_clusters")(spark, sf0001)
      .collect().map(c => c.getAs[Long]("n_docs") - 1).sum
    assert(t - i == drop,
      s"image stage dropped ${t - i}, q208's non-canonicals total $drop")
  }

  test("q216: wide gate beats narrow on the same planted degradation") {
    val r = SparkEntry.queries("q216_phash_width_recall")(spark, sf0001)
      .collect().head
    val nPlanted = r.getAs[Long]("n_planted")
    assert(nPlanted > 0)
    // recall arithmetic, both arms (integer basis points)
    assert(r.getAs[Long]("narrow_recall_bp") ==
      10000L * r.getAs[Long]("narrow_recovered") / nPlanted)
    assert(r.getAs[Long]("wide_recall_bp") ==
      10000L * r.getAs[Long]("wide_recovered") / nPlanted)
    // per-band accounting closes
    assert(r.getAs[Long]("wide_hd0_3") + r.getAs[Long]("wide_hd4_7") +
      r.getAs[Long]("wide_hd8_11") == r.getAs[Long]("wide_recovered"))
    // pair-volume accounting (computed from group sizes, never the
    // expanded cliques): collisions = total verified pairs − recovered
    assert(r.getAs[Long]("wide_collisions") ==
      r.getAs[Long]("wide_pairs") - r.getAs[Long]("wide_recovered"))
    assert(r.getAs[Long]("wide_collisions") >= 0)
    // THE claim this query exists to pin (VERDICT r15 #1): on ~2%
    // pixel noise the production-width df-capped gate recovers far
    // more planted degradations than the narrow 63-bit gate — measured
    // 7580 vs 2900 bp at sf0.001, 7540 vs 3280 at sf0.01. Floors sit
    // well under the measured values so only a real regression (hash,
    // banding, or cap) trips them, not corpus drift.
    assert(r.getAs[Long]("wide_recall_bp") > r.getAs[Long]("narrow_recall_bp"),
      s"wide gate no longer beats narrow: $r")
    assert(r.getAs[Long]("wide_recall_bp") >= 6500,
      s"wide recall collapsed: $r")
    assert(r.getAs[Long]("narrow_recall_bp") >= 1500,
      s"narrow arm collapsed (fixture drifted?): $r")
  }

  test("q213/q214/q215: planted clips recovered at the true alignment under the df cap") {
    val frames = SparkEntry.queries("q213_video_fingerprint")(spark, sf0001)
      .collect()
    assert(frames.nonEmpty && frames.length % 8 == 0,
      s"8 frames per video expected, got ${frames.length}")
    val matches = SparkEntry.queries("q214_video_clip_match")(spark, sf0001)
      .collect()
    val rec = SparkEntry.queries("q215_clip_match_recall")(spark, sf0001)
      .collect().head
    val nDocs = frames.length / 8
    val planted = matches.filter { m =>
      val (a, b) = (m.getAs[Long]("vid_a"), m.getAs[Long]("vid_b"))
      b - a == 1 && a % 2 == 0 && m.getAs[Long]("offset") == 2L
    }
    // the df cap sacrifices clips whose frames are stop-hashes — the
    // measured price (474/500 at sf0.01, and it killed ALL 1883
    // collision alignments); the gate must still recover the
    // overwhelming majority, at the true offset
    assert(rec.getAs[Long]("n_planted") == nDocs)
    assert(rec.getAs[Long]("n_recovered") == planted.length)
    assert(rec.getAs[Long]("recall_bp") ==
      10000L * rec.getAs[Long]("n_recovered") / nDocs)
    assert(rec.getAs[Long]("recall_bp") >= 9000,
      s"planted-clip recall collapsed: $rec")
    assert(rec.getAs[Long]("n_full_span") <= rec.getAs[Long]("n_recovered"))
    assert(rec.getAs[Long]("n_other") ==
      matches.length - planted.length)
    // alignment threshold really binds: no match row below 4 frames
    assert(matches.forall(_.getAs[Long]("n_matched") >= 4L))
  }

  test("q218 == q213 value-for-value: the GIF container round trip is exact") {
    val direct = SparkEntry.queries("q213_video_fingerprint")(spark, sf0001)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("frame_id")) -> r.getAs[Long]("fhash")).toMap
    val viaBytes = SparkEntry
      .queries("q218_video_decode_fingerprint")(spark, sf0001)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("frame_id")) -> r.getAs[Long]("fhash")).toMap
    assert(viaBytes.nonEmpty && viaBytes == direct,
      s"container path diverged from plane math: ${viaBytes.size} vs " +
        s"${direct.size} frames")
    // and the multi-frame codec really is lossless, frame for frame
    val io = graft.functions.ImageOps
    val frames = (0 until 8).map(j => io.Gray(32, 16, Array.tabulate(512) {
      i => (40 + ((i % 32 + j) % 8) * 25).toByte
    }))
    val decoded = graft.functions.ImageCodec.decodeFrames(
      graft.functions.ImageCodec.encodeGifFrames(frames))
    assert(decoded.length == 8)
    for ((g, j) <- decoded.zipWithIndex)
      assert(g.px.sameElements(frames(j).px), s"frame $j lossy")
    assert(graft.functions.ImageCodec.decodeFrames("junk".getBytes).isEmpty)
  }

  test("q208 clusters == union-find over the verified-pair graph") {
    val pairs = SparkEntry.queries("q207_image_near_dup")(spark, sf0001)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .groupBy(find)
    val expect = members.map { case (root, ms) =>
      // canonical = MIN member; union-find with min-root merging
      // guarantees root == min
      (root, ms.length.toLong, ms.max)
    }.toSet
    val got = SparkEntry.queries("q208_image_dup_clusters")(spark, sf0001)
      .collect().map(r => (r.getAs[Long]("canonical_doc"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("max_doc"))).toSet
    assert(got == expect,
      s"cluster mismatch: extra=${got -- expect} missing=${expect -- got}")
  }
}
