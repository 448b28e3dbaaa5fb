package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.{ImageCodec, ImageOps}

/** Streaming perceptual IMAGE dedup — the stateful front of the batch
  * dHash pipeline (q206/q207): every arriving image is decoded from
  * its real container bytes, fingerprinted, and checked against the
  * images already seen whose 63-bit dHash shares a 16-bit block;
  * matching pairs stream out the moment the duplicate arrives — the
  * gate a multimodal crawl ingest runs BEFORE paying for OCR or
  * captioning (the reference OCRs every submission unconditionally,
  * `src/workers/ocr_worker.py:118-190`; this is the curation front it
  * lacks).
  *
  * State design (the 100 TB story, the [[StreamingNearDup]] rules):
  * state is keyed by (block-idx, block-value) — the same key the
  * batch join buckets on — so it shards with the shuffle and a hot
  * block never concentrates more than its own bucket. Each key
  * retains at most `maxPerBand` (imgId, hash) entries (16 bytes
  * each), newest-first, and `stateTtlMs` drops idle keys wholesale,
  * so total state is O(active blocks · maxPerBand) regardless of
  * stream length. Pairs are verified exactly (XOR + popcount ≤ 3)
  * and de-duplicated across the 4 blocks by the batch side's
  * first-matching-block rule — a pair is emitted at block k only when
  * blocks 0..k−1 of the two hashes all differ — so each dup pair
  * emits exactly once, with no downstream distinct.
  *
  * Undecodable bytes and frames the 8×8 grid cannot tile emit
  * nothing and occupy no state: the gate's contract is "emit dup
  * evidence", and an unfingerprintable image has none — it flows to
  * the pipeline's validation path (P5), not the dedup path.
  */
object StreamingImageDedup {

  /** One incoming image: real container bytes (PNG/BMP/GIF). */
  final case class Img(imgId: Long, bytes: Array[Byte])

  private[streaming] final case class BandedImg(
      band: Long, imgId: Long, h: Long)

  /** One detected duplicate: `imgId` arrived and matched `matchId` at
    * Hamming distance `hd` ≤ 3. */
  final case class DupPair(imgId: Long, matchId: Long, hd: Int)

  /** bytes → 63-bit dHash through the REAL decode path; None when the
    * bytes don't decode or the frame doesn't tile the 8×8 grid. */
  def hash(bytes: Array[Byte]): Option[Long] =
    ImageCodec.decode(bytes)
      .filter(g => g.w % 8 == 0 && g.h % 8 == 0)
      .map(g => ImageOps.dHash63(ImageOps.cellSums(g, 8, 8)))

  /** Block k of the 63-bit hash (16+16+16+15 bits, the q207 split). */
  private[streaming] def block(h: Long, k: Int): Long =
    if (k < 3) (h >>> (16 * k)) & 0xffffL else h >>> 48

  /** Composite state key: block index in the high bits, value low. */
  private[streaming] def bands(imgId: Long, h: Long): Seq[BandedImg] =
    (0 until 4).map(k => BandedImg((k.toLong << 48) | block(h, k), imgId, h))

  /** Matching pairs, emitted as each duplicate arrives. */
  def attach(imgs: Dataset[Img], maxPerBand: Int = 64,
      stateTtlMs: Long = 0L): Dataset[DupPair] = {
    import imgs.sparkSession.implicits._
    val timeoutConf =
      if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    imgs
      .flatMap(im => hash(im.bytes).toSeq.flatMap(h => bands(im.imgId, h)))
      .groupByKey(_.band)
      .flatMapGroupsWithState[List[(Long, Long)], DupPair](
        OutputMode.Append(), timeoutConf) {
        (key, in, state: GroupState[List[(Long, Long)]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val bidx = (key >>> 48).toInt
            var seen = state.getOption.getOrElse(Nil)
            val out = Seq.newBuilder[DupPair]
            in.toSeq.sortBy(_.imgId).foreach { bi =>
              seen.foreach { case (id, h2) =>
                if (id != bi.imgId &&
                  java.lang.Long.bitCount(bi.h ^ h2) <= 3 &&
                  (0 until bidx).forall(j =>
                    block(bi.h, j) != block(h2, j)))
                  out += DupPair(bi.imgId, id,
                    java.lang.Long.bitCount(bi.h ^ h2))
              }
              // one slot per imgId (the StreamingNearDup replay rule)
              seen = ((bi.imgId, bi.h) :: seen.filterNot(_._1 == bi.imgId))
                .take(maxPerBand)
            }
            state.update(seen)
            if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
            out.result().iterator
          }
      }
  }
}
