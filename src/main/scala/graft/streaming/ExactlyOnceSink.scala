package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Exactly-once keyed sink — the `foreachBatch` pattern that turns Structured
  * Streaming's at-least-once batch delivery into exactly-once TABLE state:
  * every micro-batch upserts into a versioned parquet table, and the applied
  * batchId is recorded WITH the version, so a re-delivered batch (failure →
  * replay) is detected and skipped instead of double-applied. This is the
  * sink-side half of end-to-end exactly-once (the source side is the
  * checkpoint's offset log).
  *
  * Table layout: `dir/v=<batchId>/` holds the FULL keyed state after that
  * batch (read: max committed version only — one directory, pruned scan).
  * Upsert = previous state unioned with the batch, latest (ts, then batch
  * order) wins per key — the same MERGE shape as batch q98. A compaction
  * pass (q109's) would garbage-collect old versions in production; state
  * size is the key cardinality, not the stream length.
  *
  * Not oracle-checkable (DuckDB has no streams); `ExactlyOnceSinkSpec` pins
  * upsert semantics, replay idempotence, and crash-mid-batch recovery (a
  * version directory without its commit marker is ignored and re-written).
  */
object ExactlyOnceSink {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def committedVersions(spark: SparkSession, dir: String): Seq[Long] = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("_commit_"))
      .map(_.stripPrefix("_commit_").toLong)
  }

  /** Latest committed table state (empty frame with the sink schema if no
    * batch has committed yet). Only the max COMMITTED version's directory
    * is read — an orphaned version dir from a crash mid-write has no commit
    * marker and is invisible.
    */
  def readTable(spark: SparkSession, dir: String): DataFrame = {
    val versions = committedVersions(spark, dir)
    if (versions.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "key BIGINT, ts_us BIGINT, payload STRING"))
    else spark.read.parquet(s"$dir/v=${versions.max}")
  }

  /** Apply one micro-batch (idempotently): no-op if `batchId` was already
    * committed; otherwise write the merged state as version `batchId` and
    * only then drop the commit marker (write-then-commit ordering makes a
    * crash between the two a clean retry, never a half-applied batch).
    * Public and deterministic so the spec can drive replay directly.
    */
  def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      dir: String): Boolean = {
    val done = committedVersions(spark, dir)
    if (done.contains(batchId)) false
    else {
      val prev = readTable(spark, dir)
      // latest ts wins per key; the incoming batch beats prior state on a
      // ts tie (deterministic via the is_new flag, mirroring q98's MERGE)
      val merged = prev.withColumn("is_new", lit(0))
        .unionByName(batch.select(col("key"), col("ts_us"), col("payload"))
          .withColumn("is_new", lit(1)))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("key"))
            .orderBy(col("ts_us").desc, col("is_new").desc)))
        .filter(col("rn") === 1)
        .drop("rn", "is_new")
      merged.write.mode("overwrite").parquet(s"$dir/v=$batchId")
      fs(spark, dir).create(new Path(dir, s"_commit_$batchId"), true).close()
      true
    }
  }

  /** Wire a streaming keyed frame (`key` long, `ts_us` long, `payload`
    * string) into the sink.
    */
  def attach(updates: DataFrame, dir: String, checkpoint: String): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, batch, batchId, dir)
        ()
      }
      .start()
}
