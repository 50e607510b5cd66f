package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming FUZZY decontamination screen — the ingest-time twin of batch
  * q211: every arriving document is checked against the banded-MinHash
  * index of a STATIC held-out eval set, and its band collisions are
  * emitted immediately, so benchmark near-copies are flagged before they
  * ever enter the training corpus.
  *
  * Unlike [[NearDupStream]] (whose reference index GROWS with the stream
  * and therefore lives as keyed state), the eval set here is fixed and
  * benchmark-sized — so this needs NO state store, no watermark, and no
  * capacity bound: the eval band index is a static relation that Spark
  * re-resolves (and, under the threshold, re-broadcasts) per micro-batch,
  * the same stream-static stance as [[EnrichStream]]. Swap the underlying
  * eval-set files and the next batch screens against the new snapshot.
  *
  * Emissions are band-grain (doc, eval_doc, band_pos), exactly like
  * NearDupStream: a downstream `.distinct()` per micro-batch makes the
  * per-pair candidate decision, and confirmed candidates are
  * Jaccard-verified by the batch pass (q211's exact-shingle verification)
  * — the same candidates-then-verify tiering as the batch dedup arc.
  *
  * Band construction is BATCH-IDENTICAL (the q36–q38 md5 MinHash via the
  * codegen'd [[graft.functions.MinHashSignatureExpression]]), so the
  * streamed candidate set provably equals q211's candidate generation on
  * the same rows — `DecontamStreamSpec` pins that equality plus the
  * statelessness of the plan.
  */
object DecontamStream {

  /** The batch-identical band derivation for a (doc_id, text) frame:
    * MinHash signature (8 windows from 2 md5s per shingle) → 2 band keys
    * (md5 over 4 signature components each). Docs too short for one
    * shingle have NULL signatures and are excluded, matching the batch
    * side's symmetric filter.
    */
  def bandFrame(docs: DataFrame): DataFrame = {
    val sig =
      graft.functions.MinHashSignatureExpression.minhashSignature(col("text"))
    docs
      .withColumn("sig", sig)
      .filter(element_at(col("sig"), 1).isNotNull)
      .select(col("doc_id"),
        posexplode(array(
          md5(concat_ws("|",
            (0 until 4).map(j => element_at(col("sig"), j + 1)): _*)),
          md5(concat_ws("|",
            (4 until 8).map(j => element_at(col("sig"), j + 1)): _*))))
          .as(Seq("band_pos", "bkey")))
      .select(col("doc_id"), col("band_pos").cast("int").as("band_pos"),
        col("bkey"))
  }

  /** Screen a streaming (doc_id, text) frame against a static eval set.
    * Returns the band-grain collision stream (doc_id, eval_doc, band_pos).
    * The eval side is indexed once per micro-batch and broadcast — work
    * per batch scales with batch size × band hits, never corpus × eval.
    */
  def screen(docs: DataFrame, evalDocs: DataFrame): DataFrame = {
    val idx = bandFrame(evalDocs).withColumnRenamed("doc_id", "eval_doc")
    bandFrame(docs)
      .join(broadcast(idx), Seq("band_pos", "bkey"))
      .select(col("doc_id"), col("eval_doc"), col("band_pos"))
  }
}
