package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import scala.util.hashing.MurmurHash3

/** Streaming NEAR-duplicate detection — the stateful front of the batch
  * MinHash-LSH pipeline (q28/q29): every arriving document is checked
  * against the documents already seen whose signatures share an LSH
  * band, and matching pairs stream out the moment the duplicate
  * arrives — the gate a crawl ingest runs before paying for downstream
  * processing, where the batch pass (q29) only finds the dup after the
  * fact.
  *
  * State design (the 100 TB story): state is keyed by LSH BAND — the
  * same key the batch join buckets on — so it shards with the shuffle
  * and a hot band never concentrates more than its own bucket. Each
  * band retains at most `maxPerBand` (docId, signature) entries,
  * newest-first (the same bounded-candidates rule q29 gets from
  * banding), so per-key state is O(maxPerBand · k) ints regardless of
  * stream length, and `stateTtlMs` drops idle band KEYS wholesale so
  * the key count is bounded too (the [[StreamingDedup]] horizon rule).
  * Pairs are emitted per matching band;
  * a doc pair sharing BOTH bands emits twice — downstream dedup is one
  * `dropDuplicatesWithinWatermark` on the pair key (kept out of this
  * operator so the spec can observe raw emissions).
  *
  * Within a batch, docs process in docId order (the SessionProcessor
  * sort-by-offset rule) so emissions are arrival-order deterministic
  * under MemoryStream replay.
  */
object StreamingNearDup {

  /** One incoming document. */
  final case class Doc(docId: Long, text: String)

  private[streaming] final case class BandedDoc(
      band: Long, docId: Long, sig: Array[Int])

  /** One detected near-dup: `docId` arrived and matched `matchId`. */
  final case class DupPair(docId: Long, matchId: Long, estJaccard: Double)

  val K = 8 // minhash permutations; 2 bands x 4 rows (the q28/q78 layout)

  /** k-permutation minhash over 3-word shingles (murmur3 row seeds). */
  private[streaming] def signature(text: String): Array[Int] = {
    val words = text.split(' ')
    val shingles =
      if (words.length < 3) Array(text)
      else words.sliding(3).map(_.mkString(" ")).toArray
    Array.tabulate(K) { i =>
      var min = Int.MaxValue
      shingles.foreach { sh =>
        val h = MurmurHash3.stringHash(sh, i)
        if (h < min) min = h
      }
      min
    }
  }

  private[streaming] def bands(docId: Long, sig: Array[Int]): Seq[BandedDoc] =
    (0 until 2).map { b =>
      var acc = (b + 1).toLong
      var i = 4 * b
      while (i < 4 * b + 4) { acc = acc * 1000003L + sig(i); i += 1 }
      BandedDoc(acc, docId, sig)
    }

  private[streaming] def estJaccard(a: Array[Int], b: Array[Int]): Double = {
    var m = 0; var i = 0
    while (i < K) { if (a(i) == b(i)) m += 1; i += 1 }
    m.toDouble / K
  }

  /** Matching pairs, emitted as each duplicate arrives. `stateTtlMs > 0`
    * bounds TOTAL state like [[StreamingDedup]]'s horizon: a band key
    * idle longer than the TTL is dropped wholesale (processing-time
    * timeout), so state is O(active bands · maxPerBand) instead of
    * growing with every distinct document ever seen — without it, a
    * mostly-unique stream grows two band keys per document forever. */
  def attach(docs: Dataset[Doc], threshold: Double = 0.5,
      maxPerBand: Int = 64, stateTtlMs: Long = 0L): Dataset[DupPair] = {
    import docs.sparkSession.implicits._
    val timeoutConf =
      if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    docs
      .flatMap(d => bands(d.docId, signature(d.text)))
      .groupByKey(_.band)
      .flatMapGroupsWithState[List[(Long, Array[Int])], DupPair](
        OutputMode.Append(), timeoutConf) {
        (_, in, state: GroupState[List[(Long, Array[Int])]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var seen = state.getOption.getOrElse(Nil)
            val out = Seq.newBuilder[DupPair]
            in.toSeq.sortBy(_.docId).foreach { bd =>
              seen.foreach { case (id, sig) =>
                if (id != bd.docId) {
                  val j = estJaccard(sig, bd.sig)
                  if (j >= threshold) out += DupPair(bd.docId, id, j)
                }
              }
              // one slot per docId: a redelivered/replayed doc must not
              // occupy multiple maxPerBand slots (evicting genuinely
              // distinct candidates early) nor emit duplicate pairs
              // against its own stale copy (ADVICE r7)
              seen = ((bd.docId, bd.sig) :: seen.filterNot(_._1 == bd.docId))
                .take(maxPerBand)
            }
            state.update(seen)
            if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
            out.result().iterator
          }
      }
  }
}
