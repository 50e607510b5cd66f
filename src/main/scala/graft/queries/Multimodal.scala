package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` columns + typed
  * metadata, with the decode step stubbed (no image/audio codecs in this
  * environment — see the builder prompt) behind a deterministic fake.
  *
  * What is REAL and tested here is the Spark-side plumbing a multimodal
  * pipeline needs at 100 TB: binary columns flowing through parquet-friendly
  * schemas, per-partition batched "decode" (one codec context per partition,
  * not per row — the same shape a JNI/FFmpeg binding would need), and typed
  * metadata extraction that stays in codegen.
  */
object Multimodal {
  import Tables._

  /** A fake "stored media object": the document text's UTF-8 bytes standing
    * in for an encoded image payload.
    */
  final case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** Typed decode output — what a real `decode_image` would emit. */
  final case class MediaMeta(
      doc_id: Long, n_bytes: Int, fake_width: Int, fake_height: Int,
      fake_format: String)

  /** STUB decode: a real implementation would hand `payload` to an image
    * codec here. The deterministic fake derives metadata purely from the
    * byte length so tests (and the oracle) can pin the plumbing. Runs per
    * PARTITION so a real codec would amortize its init cost.
    */
  def decodeStub(rows: Iterator[MediaRow]): Iterator[MediaMeta] = {
    // real codec init would happen once here, per partition
    rows.map { r =>
      val n = r.payload.length
      MediaMeta(r.doc_id, n, n % 640, (n * 7) % 480,
        (n % 3) match { case 0 => "jpg"; case 1 => "png"; case _ => "webp" })
    }
  }

  /** The typed Dataset pipeline: text -> binary payload -> partition-batched
    * decode -> typed metadata.
    */
  def decodePipeline(s: SparkSession, d: String): Dataset[MediaMeta] = {
    import s.implicits._
    documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
      .mapPartitions(decodeStub _)
  }

  /** q45: metadata extraction expressed in pure (codegen'd) expressions —
    * byte length and derived fake dimensions, oracle-checkable since the
    * stub is deterministic arithmetic on octet_length.
    */
  private def q45(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(
        col("doc_id"),
        octet_length(col("text")).as("n_bytes"),
        (octet_length(col("text")) % 640).as("fake_width"),
        (octet_length(col("text")) * 7 % 480).as("fake_height"),
        when(octet_length(col("text")) % 3 === 0, "jpg")
          .when(octet_length(col("text")) % 3 === 1, "png")
          .otherwise("webp").as("fake_format"))
      .orderBy(col("doc_id"))

  private val o45 = """
    SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           CAST(octet_length(encode(text)) % 640 AS INT) AS fake_width,
           CAST(octet_length(encode(text)) * 7 % 480 AS INT) AS fake_height,
           CASE octet_length(encode(text)) % 3 WHEN 0 THEN 'jpg'
                WHEN 1 THEN 'png' ELSE 'webp' END AS fake_format
    FROM documents ORDER BY doc_id"""

  /** q46: the mapPartitions decode path itself (same values as q45, produced
    * through the typed Dataset pipeline instead of expressions).
    */
  private def q46(s: SparkSession, d: String): DataFrame =
    decodePipeline(s, d).toDF().orderBy(col("doc_id"))

  private val o46 = """
    SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           CAST(octet_length(encode(text)) % 640 AS INT) AS fake_width,
           CAST(octet_length(encode(text)) * 7 % 480 AS INT) AS fake_height,
           CASE octet_length(encode(text)) % 3 WHEN 0 THEN 'jpg'
                WHEN 1 THEN 'png' ELSE 'webp' END AS fake_format
    FROM documents ORDER BY doc_id"""

  /** Typed feature vector from a payload — the feature-extract stage. */
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Int, n_tokens: Int, hash_bucket: Int,
      first_cp: Int)

  /** STUB feature extraction (a real one would run an image/audio encoder):
    * deterministic integer features of the payload, per partition. Every
    * feature is SQL-expressible, so unlike the decode stub this stage is
    * fully oracle-checked.
    */
  def featureStub(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.map { r =>
      val s = new String(r.payload, java.nio.charset.StandardCharsets.UTF_8)
      var h = 0L
      s.codePoints().forEach(cp => h = (h * 31 + cp) % 1000000007L)
      MediaFeatures(r.doc_id, r.payload.length,
        s.trim.split("\\s+").length, (h % 1000L).toInt,
        if (s.isEmpty) -1 else s.codePointAt(0))
    }

  /** STUB resize: scales the fake dimensions preserving aspect (pure
    * integer arithmetic on the metadata — a real implementation would
    * transform pixels here).
    */
  def resizeStub(rows: Iterator[MediaMeta], maxW: Int): Iterator[MediaMeta] =
    rows.map { m =>
      if (m.fake_width <= maxW || m.fake_width == 0) m
      else m.copy(
        fake_width = maxW,
        fake_height = m.fake_height * maxW / m.fake_width)
    }

  /** STUB frame sampling for "video" payloads: every k-th 16-byte window's
    * offset — the shape of a keyframe extractor (offsets only; a real one
    * would decode frames).
    */
  def frameSampleStub(rows: Iterator[MediaRow], stride: Int): Iterator[(Long, Seq[Int])] =
    rows.map { r =>
      val n = math.max(0, (r.payload.length - 16) / stride + 1)
      (r.doc_id, (0 until n).map(_ * stride))
    }

  /** q58: the feature-extract stage end-to-end through the typed pipeline,
    * oracle-checked against the same integer arithmetic in SQL.
    */
  private def q58(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.parallelize(s, documents(s, d))
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
      .mapPartitions(featureStub _)
      .toDF()
      .orderBy(col("doc_id"))
  }

  private val o58 = """
    SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_tokens,
           CAST(list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, length(text) + 1),
                 i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
             (a, b) -> (a * 31 + b) % 1000000007) % 1000 AS INT)
             AS hash_bucket,
           CAST(ascii(substr(text, 1, 1)) AS INT) AS first_cp
    FROM documents ORDER BY doc_id"""

  /** q86: the resize stage through the typed pipeline (decode -> resize per
    * partition) — deterministic integer arithmetic, so fully oracle-checked.
    */
  private def q86(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    decodePipeline(s, d)
      .mapPartitions(rows => resizeStub(rows, maxW = 320))
      .toDF()
      .orderBy(col("doc_id"))
  }

  private val o86 = """
    SELECT doc_id, n_bytes,
           CASE WHEN fw <= 320 OR fw = 0 THEN fw ELSE 320 END AS fake_width,
           CASE WHEN fw <= 320 OR fw = 0 THEN fh
                ELSE CAST(fh * 320 // fw AS INT) END AS fake_height,
           fake_format
    FROM (SELECT doc_id,
            CAST(octet_length(encode(text)) AS INT) AS n_bytes,
            CAST(octet_length(encode(text)) % 640 AS INT) AS fw,
            CAST(octet_length(encode(text)) * 7 % 480 AS INT) AS fh,
            CASE octet_length(encode(text)) % 3 WHEN 0 THEN 'jpg'
                 WHEN 1 THEN 'png' ELSE 'webp' END AS fake_format
          FROM documents)
    ORDER BY doc_id"""

  /** q87: the frame-sampling stage ("video" keyframe offsets at stride 64)
    * — offsets are pure arithmetic on payload length, so the sampled
    * positions are oracle-checked end-to-end.
    */
  private def q87(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
      .mapPartitions(rows => frameSampleStub(rows, stride = 64))
      .toDF("doc_id", "offsets")
      .select(
        col("doc_id"),
        size(col("offsets")).as("n_frames"),
        array_join(transform(slice(col("offsets"), 1, 5),
          x => x.cast("string")), " ").as("first5_offsets"),
        element_at(col("offsets"), -1).as("last_offset"))
      .orderBy(col("doc_id"))
  }

  private val o87 = """
    SELECT doc_id, CAST(n AS INT) AS n_frames,
           array_to_string(list_transform(range(0, least(n, 5)),
             i -> CAST(i * 64 AS VARCHAR)), ' ') AS first5_offsets,
           CAST((n - 1) * 64 AS INT) AS last_offset
    FROM (SELECT doc_id,
            -- trunc-toward-zero division mirrors the JVM stub's `/` exactly
            -- (DuckDB's // floors, which differs for payloads < 16 bytes)
            greatest(CAST(trunc((CAST(octet_length(encode(text)) AS INT) - 16)
                                / 64.0) AS INT) + 1, 0) AS n
          FROM documents)
    ORDER BY doc_id"""

  /** STUB perceptual hash (aHash shape): sample 64 evenly-spaced "pixels"
    * from the payload (a real implementation would decode and downscale to
    * an 8x8 grayscale grid here), threshold each against the sample mean,
    * and emit the 64 bits as four 16-bit band keys. Returned as bands
    * rather than one 64-bit word so the downstream pigeonhole join needs
    * no bit slicing — and no signed-overflow care at bit 63.
    */
  def phashStub(rows: Iterator[MediaRow]): Iterator[(Long, Int, Int, Int, Int)] =
    rows.flatMap { r =>
      val n = r.payload.length
      if (n == 0) None
      else {
        val px = Array.tabulate(64)(i => r.payload((i * n) / 64) & 0xff)
        val mu = px.sum / 64.0
        val bands = Array.tabulate(4) { b =>
          var v = 0
          var j = 0
          while (j < 16) { if (px(b * 16 + j) > mu) v |= 1 << j; j += 1 }
          v
        }
        Some((r.doc_id, bands(0), bands(1), bands(2), bands(3)))
      }
    }

  /** q212: perceptual-hash image near-dup — the image-modality member of
    * the dedup tier (the pass a LAION-scale image corpus runs where text
    * dedup runs MinHash): aHash each payload via [[phashStub]], then find
    * all pairs within hamming distance 3 of each other's 64-bit hash using
    * the 4-band pigeonhole (two hashes ≤ 3 bits apart MUST agree on at
    * least one 16-bit band), verified by an exact popcount on the candidate
    * pairs only. Identical scale stance to q102's SimHash radius search:
    * candidates form only inside shared band buckets, never all-pairs; the
    * hash itself is one partition-batched map over the payload (a real
    * codec would amortize decode the same way).
    */
  private def q212(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ph = Tables.parallelize(s, documents(s, d))
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
      .mapPartitions(phashStub _)
      .toDF("doc_id", "b0", "b1", "b2", "b3")
      .persist()
    val bands = ph.select(col("doc_id"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
        .as(Seq("band_pos", "bval")))
    val cands = bands.as("x")
      .join(bands.as("y"),
        col("x.band_pos") === col("y.band_pos") &&
        col("x.bval") === col("y.bval") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val out = cands
      .join(ph.as("a"), col("doc_a") === col("a.doc_id"))
      .join(ph.as("b"), col("doc_b") === col("b.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (bit_count(col("a.b0").bitwiseXOR(col("b.b0"))) +
         bit_count(col("a.b1").bitwiseXOR(col("b.b1"))) +
         bit_count(col("a.b2").bitwiseXOR(col("b.b2"))) +
         bit_count(col("a.b3").bitwiseXOR(col("b.b3")))).cast("int")
          .as("hamming"))
      .filter(col("hamming") <= 3)
      .orderBy(col("doc_a"), col("doc_b"))
    Cached.scopedTo(out, ph)
  }

  /** DuckDB mirror of [[phashStub]]: ascii() on an ASCII corpus is the
    * byte value (Verify asserts the corpus is ASCII-only), `(i*n)//64`
    * floors identically to the JVM's non-negative int division, and the
    * 16-bit band sums are exact in doubles. */
  private val o212 = """
    WITH px AS (
      SELECT doc_id,
             list_transform(range(0, 64), i ->
               ascii(substr(text, (i * length(text)) // 64 + 1, 1))) AS p
      FROM documents WHERE length(text) > 0),
    bits AS (
      SELECT doc_id, p, list_sum(p) / 64.0 AS mu FROM px),
    ph AS (
      SELECT doc_id,
             CAST(list_sum(list_transform(range(0, 16), j ->
               CASE WHEN p[j + 1] > mu THEN power(2, j) ELSE 0 END)) AS INT)
               AS b0,
             CAST(list_sum(list_transform(range(0, 16), j ->
               CASE WHEN p[16 + j + 1] > mu THEN power(2, j) ELSE 0 END))
               AS INT) AS b1,
             CAST(list_sum(list_transform(range(0, 16), j ->
               CASE WHEN p[32 + j + 1] > mu THEN power(2, j) ELSE 0 END))
               AS INT) AS b2,
             CAST(list_sum(list_transform(range(0, 16), j ->
               CASE WHEN p[48 + j + 1] > mu THEN power(2, j) ELSE 0 END))
               AS INT) AS b3
      FROM bits),
    bands AS (
      SELECT doc_id, band_pos,
             CASE band_pos WHEN 0 THEN b0 WHEN 1 THEN b1
                           WHEN 2 THEN b2 ELSE b3 END AS bval
      FROM ph, (SELECT unnest([0, 1, 2, 3]) AS band_pos) bp),
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM bands x JOIN bands y
        ON x.band_pos = y.band_pos AND x.bval = y.bval
       AND x.doc_id < y.doc_id)
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
              + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
             AS INT) AS hamming
    FROM cand c
    JOIN ph a ON a.doc_id = c.doc_a
    JOIN ph b ON b.doc_id = c.doc_b
    WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
        + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= 3
    ORDER BY doc_a, doc_b"""

  /** STUB per-frame feature: the byte at each q87 keyframe offset (a real
    * implementation would decode the frame and emit a luma histogram or
    * embedding here). Same per-partition batching contract as
    * [[decodeStub]]; offsets are exactly q87's stride-64 grid.
    */
  def frameFeatureStub(rows: Iterator[MediaRow],
      stride: Int): Iterator[(Long, Array[Int])] =
    rows.map { r =>
      val n = math.max((r.payload.length - 16) / stride + 1, 0)
      // bounds-checked read (0 past the end) keeps the stub total on
      // degenerate payloads, matching the oracle's ascii('') = 0
      (r.doc_id, Array.tabulate(n) { i =>
        val off = i * stride
        if (off < r.payload.length) r.payload(off) & 0xff else 0
      })
    }

  /** q252: shot-boundary detection — the video-modality screen between
    * q87's frame sampling and a real scene segmenter: per-frame features
    * (stubbed: one byte per keyframe; a real pipeline puts a luma
    * histogram or CLIP embedding here) are diffed frame-over-frame and a
    * boundary is declared where the jump exceeds the threshold — the cut
    * count and mean inter-frame change a video-curation pipeline uses to
    * drop static or strobing clips before captioning. The Spark side runs
    * the partition-batched stub (codec amortization shape) and finishes
    * in array expressions; all math is exact integers until the one final
    * rounded mean.
    */
  private def q252(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.parallelize(s, documents(s, d))
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
      .mapPartitions(rows => frameFeatureStub(rows, stride = 64))
      .toDF("doc_id", "feats")
      .select(col("doc_id"), size(col("feats")).as("n_frames"),
        expr("""aggregate(
            zip_with(slice(feats, 2, size(feats) - 1),
                     slice(feats, 1, size(feats) - 1),
                     (a, b) -> abs(a - b)),
            0, (acc, x) -> acc + IF(x > 32, 1, 0))""").as("n_boundaries"),
        expr("""CASE WHEN size(feats) > 1 THEN round(
            aggregate(
              zip_with(slice(feats, 2, size(feats) - 1),
                       slice(feats, 1, size(feats) - 1),
                       (a, b) -> abs(a - b)),
              0, (acc, x) -> acc + x)
            / CAST(size(feats) - 1 AS DOUBLE), 6) END""").as("mean_change"))
      .orderBy(col("doc_id"))
  }

  // the feature list indexes BYTES of the UTF-8 payload on BOTH sides
  // (Spark reads payload(i*64) & 0xff; the oracle extracts the same byte
  // from hex(encode(text)) at hex position i*128+1) — equal by
  // construction on non-ASCII text too, not by corpus accident
  private val o252 = """
    WITH f AS (
      SELECT doc_id,
             greatest(CAST(trunc((CAST(octet_length(encode(text)) AS INT)
                                  - 16) / 64.0) AS INT) + 1, 0) AS n,
             hex(encode(text)) AS hx
      FROM documents),
    feats AS (
      SELECT doc_id, n,
             list_transform(range(0, n),
               i -> CAST('0x' || substring(hx, CAST(i * 128 + 1 AS INT), 2)
                         AS INT)) AS fl
      FROM f),
    diffs AS (
      SELECT doc_id, n,
             list_transform(range(1, n),
               i -> abs(fl[CAST(i + 1 AS INT)] - fl[CAST(i AS INT)])) AS dl
      FROM feats)
    SELECT doc_id, n AS n_frames,
           CAST(coalesce(list_sum(list_transform(dl,
             x -> CASE WHEN x > 32 THEN 1 ELSE 0 END)), 0) AS INT)
             AS n_boundaries,
           CASE WHEN n > 1 THEN
             round(CAST(list_sum(dl) AS DOUBLE) / (n - 1), 6) END
             AS mean_change
    FROM diffs ORDER BY doc_id"""

  /** q253: voice-activity screen (audio modality) — the VAD pass an audio
    * corpus runs before transcription to drop silence and measure speech
    * density: the payload is windowed (32-byte windows standing in for
    * PCM frames), per-window energy is the exact byte sum, a window is
    * "voiced" above the threshold, and the report is each clip's voiced
    * fraction plus its voiced SEGMENT count (gaps-and-islands over the
    * window sequence — rises only, no self-join). Pure integer arithmetic
    * per row until the one rounded fraction, so the flagged set is
    * bit-stable cross-engine; per-row list folds bounded by payload size.
    */
  private def q253(s: SparkSession, d: String): DataFrame =
    Tables.parallelize(s, documents(s, d))
      .select(col("doc_id"),
        expr("CAST(CAST(octet_length(encode(text, 'UTF-8')) AS INT) DIV 32 AS INT)")
          .as("w"),
        col("text"))
      .withColumn("vi", expr("""
        CASE WHEN w >= 1 THEN transform(sequence(0, w - 1), j ->
          IF(aggregate(transform(sequence(1, 32),
               b -> ascii(substring(text, j * 32 + b, 1))),
             0, (acc, x) -> acc + x) > 2560, 1, 0))
        ELSE array() END"""))
      .select(col("doc_id"), col("w").cast("long").as("n_windows"),
        expr("aggregate(vi, 0, (acc, x) -> acc + x)").cast("long")
          .as("n_voiced"),
        expr("""CASE WHEN w >= 1 THEN round(
            aggregate(vi, 0, (acc, x) -> acc + x) / CAST(w AS DOUBLE), 6)
          END""").as("voiced_frac"),
        expr("""CASE WHEN w >= 2 THEN
            element_at(vi, 1) + aggregate(sequence(1, w - 1),
              0, (acc, j) -> acc + element_at(vi, j + 1)
                                 * (1 - element_at(vi, j)))
          WHEN w = 1 THEN element_at(vi, 1)
          ELSE 0 END""").cast("long").as("n_segments"))
      .orderBy(col("doc_id"))

  private val o253 = """
    WITH f AS (
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS INT) // 32 AS w, text
      FROM documents),
    v AS (
      SELECT doc_id, w,
             CASE WHEN w >= 1 THEN list_transform(range(0, w), j ->
               CASE WHEN list_sum(list_transform(range(1, 33),
                 b -> ascii(substr(text, CAST(j * 32 + b AS INT), 1))))
                 > 2560 THEN 1 ELSE 0 END)
             ELSE [] END AS vi
      FROM f)
    SELECT doc_id, CAST(w AS BIGINT) AS n_windows,
           CAST(coalesce(list_sum(vi), 0) AS BIGINT) AS n_voiced,
           CASE WHEN w >= 1 THEN
             round(CAST(list_sum(vi) AS DOUBLE) / w, 6) END AS voiced_frac,
           CAST(CASE WHEN w >= 1 THEN
             vi[1] + coalesce(list_sum(list_transform(range(1, w), j ->
               vi[CAST(j + 1 AS INT)] * (1 - vi[CAST(j AS INT)]))), 0)
           ELSE 0 END AS BIGINT) AS n_segments
    FROM v ORDER BY doc_id"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q252_shot_boundaries", q252, Some(o252)),
    QueryDef("q253_audio_vad", q253, Some(o253)),
    QueryDef("q45_multimodal_meta", q45, Some(o45)),
    QueryDef("q46_multimodal_decode", q46, Some(o46)),
    QueryDef("q58_multimodal_features", q58, Some(o58)),
    QueryDef("q86_multimodal_resize", q86, Some(o86)),
    QueryDef("q87_frame_sample", q87, Some(o87)),
    QueryDef("q212_phash_neardup", q212, Some(o212)))
}
