package graft

import graft.functions.{ImageCodec, ImageOps}
import graft.functions.ImageOps.Gray

/** Semantic pins for the perceptual image-dedup family (q206-q208) —
  * properties the oracle hash can't express as invariants: the hash
  * kernels' algebra (gradient-sign semantics, brightness-shift
  * invariance, the 63-bit positivity rule), the real-codec path
  * actually feeding the fingerprint, and q208's clique-free cluster
  * construction being EXACTLY the verified-pair graph's components. */
class PerceptualQueriesSpec extends SparkSpec {

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
      // and the codec really is lossless on this plane (the identity
      // the oracle depends on)
      val enc = ImageCodec.encode(Gray(32, 16, plane(text)), "png")
      val dec = ImageCodec.decode(enc).get
      assert(dec.px.sameElements(plane(text)))
    }
  }

  test("q207 pairs: ordered, verified hd ≤ 3, exact-dup pairs present") {
    val hashes = SparkEntry.queries("q206_image_phash")(spark, sf0001)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dhash"))
      .toMap
    val pairs = SparkEntry.queries("q207_image_near_dup")(spark, sf0001)
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      assert(a < b, s"unordered pair $r")
      val hd = java.lang.Long.bitCount(hashes(a) ^ hashes(b))
      assert(r.getAs[Int]("hd") == hd && hd <= 3, s"bad hd: $r")
    }
    // the banded join misses nothing: recompute the full relation
    val ids = hashes.keys.toArray.sorted
    var expect = 0
    for (i <- ids.indices; j <- (i + 1) until ids.length)
      if (java.lang.Long.bitCount(
        hashes(ids(i)) ^ hashes(ids(j))) <= 3) expect += 1
    assert(pairs.length == expect,
      s"banded join found ${pairs.length} pairs, brute force $expect")
    assert(pairs.exists(_.getAs[Int]("hd") == 0),
      "testdata contains exact dup docs; hd=0 pairs must appear")
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
    // everything through — which makes the image-stage drop EXACTLY
    // the non-canonical cluster members q208 reports
    assert(t == n, s"precondition drifted: texts no longer all distinct ($r)")
    val drop = SparkEntry.queries("q208_image_dup_clusters")(spark, sf0001)
      .collect().map(c => c.getAs[Long]("n_docs") - 1).sum
    assert(t - i == drop,
      s"image stage dropped ${t - i}, q208's non-canonicals total $drop")
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
