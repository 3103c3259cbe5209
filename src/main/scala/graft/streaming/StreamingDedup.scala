package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** Incremental MinHash+LSH near-duplicate detection over a document
  * STREAM — the dedup pass of a training-data pipeline run continuously
  * instead of as a batch sweep (reference analog: the streaming dedup
  * executor keeps every seen key in a state table,
  * src/stream/src/executor/dedup/append_only_dedup.rs:27; here the state
  * is keyed by LSH bucket instead of by exact key, which generalizes the
  * same shape to NEAR-duplicates).
  *
  * Shape: each micro-batch's documents are MinHash-signed and banded with
  * the SAME staged-projection pipeline as the batch operator
  * ([[Dedup.withMinhashSignature]]), then grouped by (band, band-key).
  * Per-bucket keyed state holds the member ids seen so far; each new
  * member emits candidate pairs against all existing members exactly once
  * — discovery is incremental and cross-batch (a duplicate arriving a
  * week after its twin is still caught, because the bucket remembers).
  *
  * Scale: per-bucket state is capped at `maxBucket` ids; a bucket that
  * outgrows the cap is degenerate for dedup (a band shared by hundreds of
  * documents carries no signal, and is the only quadratic hazard), so it
  * collapses to a tombstone flag — state stays O(min(bucket, cap)) per
  * bucket, O(corpus × bands) total, the same bound as the reference's
  * dedup state table. Pair emission is O(new × existing) within capped
  * buckets — O(duplicates found), not O(n²).
  *
  * Downstream, pairs are best merged into an MV keyed (id_a, id_b): the
  * PK merge deduplicates pairs rediscovered by other bands or re-emitted
  * on micro-batch retry (idempotent epochs).
  *
  * Divergence from the batch operator: the batch form drops an
  * over-`maxBucket` bucket wholesale; the stream cannot retract pairs it
  * emitted before the bucket degenerated, so pairs found early in a
  * later-degenerate bucket survive. Monotone emission is inherent to
  * streaming dedup; both forms agree whenever no bucket crosses the cap.
  */
object StreamingDedup {

  /** A document's membership in one LSH band bucket. */
  case class BandMember(bucket: String, id: Long)

  /** An emitted near-dup candidate pair, id_a < id_b. */
  case class CandidatePair(id_a: Long, id_b: Long)

  /** Per-bucket state: member ids seen so far; degenerate buckets keep
    * only the flag (bounded state under adversarial skew).
    */
  case class BucketState(ids: Seq[Long], degenerate: Boolean)

  /** Candidate near-dup pairs over a streaming (id, text) DataFrame.
    * Same signature/banding parameters as
    * [[Dedup.minhashCandidatePairs]]; output is Update-mode (pairs
    * appear once, when the later member arrives).
    */
  def candidatePairs(
      docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 12, bands: Int = 2, shingleLen: Int = 3,
      maxBucket: Int = 64): Dataset[CandidatePair] = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val spark = docs.sparkSession
    import spark.implicits._

    val sig = Dedup.withMinhashSignature(
      docs.select(col(idCol).cast("long").as("__id"), col(textCol)),
      textCol, "__sig", numHashes, shingleLen)
      .where(size(col("__sig")) > 0)
    val banded = sig.select(col("__id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => concat_ws(",", slice(col("__sig"), b * rows + 1, lit(rows))))))
      .toDF("__id", "band", "key")
      .select(concat_ws("|", col("band"), col("key")).as("bucket"),
        col("__id").as("id"))
      .as[BandMember]

    implicit val stEnc = Encoders.product[BucketState]
    banded.groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        (_: String, members: Iterator[BandMember],
         state: GroupState[BucketState]) => {
          val st = state.getOption.getOrElse(BucketState(Nil, degenerate = false))
          if (st.degenerate) {
            // tombstone: swallow members, emit nothing, stay O(1)
            members.foreach(_ => ())
            Iterator.empty
          } else {
            val existing = st.ids
            val incoming = members.map(_.id).toSeq.distinct
              .filterNot(existing.contains).sorted
            if (existing.size + incoming.size > maxBucket) {
              state.update(BucketState(Nil, degenerate = true))
              Iterator.empty
            } else {
              // new × existing, plus new × new combinations — each pair
              // emitted exactly once (by the later-arriving member)
              val pairs =
                (for (n <- incoming; e <- existing)
                  yield CandidatePair(math.min(n, e), math.max(n, e))) ++
                (for {
                  i <- incoming.indices
                  j <- (i + 1) until incoming.size
                } yield CandidatePair(incoming(i), incoming(j)))
              if (incoming.nonEmpty)
                state.update(BucketState(existing ++ incoming, degenerate = false))
              pairs.iterator
            }
          }
        })
  }
}
