package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: media as opaque
  * `BINARY` columns with typed metadata, decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The actual codec work (image/audio/video decode) requires native
  * libraries that are NOT in this environment, so the decode kernel is a
  * clearly-marked injection point with a deterministic fake default — but
  * all the Spark-side plumbing is real and tested: schema shape, binary
  * column flow, partition-batched processing (the Scala analog of
  * `mapInPandas` — one decoder instantiation per partition, streamed
  * iterator, no per-row setup cost), and metadata pushdown-friendly layout
  * (metadata in flat columns so scans prune the heavy bytes).
  *
  * At 100 TB: media bytes dominate I/O, so every stage keeps metadata-only
  * paths separate from byte-touching paths; repartitioning is done on the
  * cheap metadata before the decode stage so decode work spreads evenly.
  */
object MultimodalOps {

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("mime", StringType, nullable = true),
    StructField("bytes", BinaryType, nullable = true)))

  val MetaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("mime", StringType, nullable = true),
    StructField("n_bytes", LongType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** A decoder turns raw bytes into (width, height, duration_ms). Real
    * deployments inject an image/audio codec here; the default is a
    * deterministic fake derived from the byte content so tests and demo
    * pipelines are reproducible without native libs.
    */
  type Decoder = Array[Byte] => (Int, Int, Long)

  /** Deterministic fake decode: dimensions/duration derived from a simple
    * byte fold. Replace with a real codec via [[decodeMeta]]'s parameter.
    */
  val fakeDecoder: Decoder = { bytes =>
    val h = bytes.foldLeft(1125899906842597L)((acc, b) => acc * 31 + (b & 0xff))
    val w = 16 + math.floorMod(h, 4096).toInt
    val ht = 16 + math.floorMod(h >> 12, 4096).toInt
    (w, ht, math.floorMod(h >> 24, 600000L))
  }

  /** Partition-batched decode (the `mapInPandas` analog): the decoder is
    * materialized once per partition and applied over the streamed row
    * iterator, producing the flat metadata schema. Binary payloads are
    * dropped on output so downstream stages shuffle only metadata.
    */
  def decodeMeta(media: DataFrame, decoder: Decoder = fakeDecoder): DataFrame = {
    val enc = RowEncoder.encoderFor(MetaSchema)
    // ordinal access — the select fixes the column order, and per-row
    // getAs(name) would pay a field-name lookup per access in the hot loop
    media.select("media_id", "mime", "bytes").mapPartitions { rows =>
      val d = decoder // one instantiation per partition
      rows.map { r =>
        val bytes = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
        if (bytes == null)
          Row(r.getLong(0), r.getString(1), null, null, null, null)
        else {
          val (w, h, dur) = d(bytes)
          Row(r.getLong(0), r.getString(1), bytes.length.toLong, w, h, dur)
        }
      }
    }(enc)
  }

  /** Metadata-only path: byte length without touching a decoder — stays a
    * pure column expression (codegen, prunable).
    */
  def withByteLength(media: DataFrame): DataFrame =
    media.withColumn("n_bytes", octet_length(col("bytes")).cast("long"))

  val FeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false),
      nullable = true)))

  /** A feature extractor turns raw bytes into a fixed-width embedding.
    * Real deployments inject a vision/audio encoder; the default is a
    * deterministic fake (per-dimension byte folds, normalized to [0, 1))
    * so the plumbing — batch shape, `ARRAY<FLOAT>` output ready for the
    * [[graft.functions.Similarity]] ANN tier — is testable without native
    * libs.
    */
  type FeatureExtractor = Array[Byte] => Array[Float]

  def fakeFeatureExtractor(dim: Int): FeatureExtractor = { bytes =>
    // One fold over the bytes, then a per-dimension finalizer mix
    // (murmur3-style avalanche) — O(n_bytes + dim), not O(dim × n_bytes).
    var acc = 1125899906842597L
    var i = 0
    while (i < bytes.length) { acc = acc * 31 + (bytes(i) & 0xff); i += 1 }
    val out = new Array[Float](dim)
    var d = 0
    while (d < dim) {
      var h = acc ^ (d * 0x9E3779B97F4A7C15L)
      h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
      out(d) = (math.floorMod(h, 1000000L).toDouble / 1000000.0).toFloat
      d += 1
    }
    out
  }

  /** Partition-batched feature extraction (same `mapInPandas`-analog shape
    * as [[decodeMeta]]): one extractor instantiation per partition, bytes
    * dropped on output so only (id, embedding) shuffles — the stage that
    * feeds decoded media into the embedding dedup/ANN operators.
    */
  def extractFeatures(media: DataFrame, dim: Int = 8,
                      extractor: Option[FeatureExtractor] = None): DataFrame = {
    val enc = RowEncoder.encoderFor(FeatureSchema)
    val chosen = extractor.getOrElse(fakeFeatureExtractor(dim))
    media.select("media_id", "bytes").mapPartitions { rows =>
      val f = chosen // one instantiation per partition
      rows.map { r =>
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        Row(r.getLong(0), if (bytes == null) null else f(bytes))
      }
    }(enc)
  }

  /** Resize planning: aspect-preserving fit into a `maxW` x `maxH` box —
    * scale = min(maxW/w, maxH/h, 1) (never upscales), targets floored with
    * a 1-pixel floor so degenerate aspect ratios can't reach zero. Pure
    * double arithmetic over the decoded dims (map-only, oracle-replayable);
    * the pixel work itself is the same native-codec injection point as
    * [[Decoder]].
    */
  def resizePlan(meta: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    require(maxW >= 1 && maxH >= 1, s"box ${maxW}x$maxH must be >= 1x1")
    val scale = least(
      lit(maxW.toDouble) / col("width"),
      lit(maxH.toDouble) / col("height"),
      lit(1.0))
    // Explicit null propagation: Spark's least/greatest SKIP nulls, so an
    // undecodable row (NULL dims from decodeMeta) would otherwise get a
    // confident 1x1 target instead of NULL — downstream must skip
    // unreadable media, not "resize" it (the extractFeatures contract).
    def ifDims(c: Column): Column =
      when(col("width").isNull || col("height").isNull,
        lit(null).cast("long")).otherwise(c)
    meta
      .withColumn("target_w",
        ifDims(greatest(floor(col("width") * scale), lit(1L)).cast("long")))
      .withColumn("target_h",
        ifDims(greatest(floor(col("height") * scale), lit(1L)).cast("long")))
  }

  /** Frame sampling plan for video-like media: one row per sampled frame
    * timestamp (every `everyMs` within duration) — a pure generator
    * (explode of an in-plan sequence), no bytes touched.
    */
  def frameSamplePlan(meta: DataFrame, everyMs: Long): DataFrame = {
    // Fail on the driver at plan time, not per-row on an executor with
    // "sequence step must not be zero" after the upstream decode ran.
    require(everyMs >= 1, s"everyMs=$everyMs must be >= 1")
    meta.where(col("duration_ms").isNotNull && col("duration_ms") > 0)
      .withColumn("frame_ms",
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs))))
      .select("media_id", "frame_ms")
  }

  /** Frame-level exact dedup across media: digest every sampled frame's
    * OWN byte window and report the duplicate groups with a
    * deterministic canonical keeper — the video counterpart of document
    * exact-dedup (the same intro/outro/test-pattern frames recur across
    * a crawl's videos; a training pipeline drops all but one). Frame i
    * hashes bytes [i·frameBytes, (i+1)·frameBytes) of its media — the
    * content-window digest stands in for a perceptual frame hash the
    * way [[fakeDecoder]] stands in for a codec, and media sharing an
    * intro (a byte-prefix) legitimately share exactly the leading
    * frames' digests, the duplicate structure the op exists to find.
    * Frames whose window lies past the media's end are skipped (an
    * empty window is not content; hashing it would weld every short
    * medium into one giant fake group).
    *
    * Scale shape: frame generation is the pure [[frameSamplePlan]]
    * generator over decoded METADATA (no bytes); bytes re-attach once by
    * media id (colocatable — a real pipeline fuses decode+digest into
    * one partition pass and never re-joins) and are dropped at the
    * digest projection, so the dedup exchange carries (digest, id, ms)
    * only — the document-dedup discipline. The canonical keeper is an
    * order-free min(struct), no window function needed.
    *
    * @param frameBytes bytes per frame window
    * @return per duplicate digest: (digest, n_frames, n_media,
    *         keep_media, keep_frame_ms), groups of 1 omitted
    */
  def frameDedup(media: DataFrame, everyMs: Long, frameBytes: Int = 100,
                 decoder: Decoder = fakeDecoder): DataFrame = {
    require(frameBytes >= 1, s"frameBytes=$frameBytes must be positive")
    val frames = frameSamplePlan(decodeMeta(media, decoder), everyMs)
    val idx = (col("frame_ms") / lit(everyMs)).cast("long")
    val digests = frames
      .join(media.select(col("media_id"), col("bytes")), Seq("media_id"))
      .where(length(col("bytes")) > idx * frameBytes)
      .select(col("media_id"), col("frame_ms"),
        md5(col("bytes").substr((idx * frameBytes + 1).cast("int"),
          lit(frameBytes))).as("digest"))
    digests
      .groupBy(col("digest"))
      .agg(count(lit(1)).as("n_frames"),
        count_distinct(col("media_id")).as("n_media"),
        min(struct(col("media_id"), col("frame_ms"))).as("__keep"))
      .where(col("n_frames") > 1L)
      .select(col("digest"), col("n_frames"), col("n_media"),
        col("__keep.media_id").as("keep_media"),
        col("__keep.frame_ms").as("keep_frame_ms"))
  }

  /** Perceptual frame NEAR-dup — the aHash step [[frameDedup]]'s exact
    * digests cannot do (re-encoded or slightly-corrupted frames share
    * no md5): each sampled frame's 64-byte window folds to the classic
    * average hash (bit j set iff pixel j is above the frame mean —
    * exact integer comparison p_j·64 > Σp, no float mean), and frames
    * pair through the SAME Hamming-LSH banding join the SimHash text
    * tier runs — never an all-pairs scan. Byte values stand in for
    * decoded pixels exactly the way [[fakeDecoder]] stands in for a
    * codec: swap the window expression for a real luma plane and
    * everything downstream (fingerprint fold, banding, Hamming verify)
    * is already the production plan.
    *
    * Scale shape: frame grid from decoded METADATA; windows attach by
    * media id once and reduce IMMEDIATELY to (composite frame id,
    * 64-bit fingerprint) before any exchange — the banding join sees 16
    * bytes per frame, never the media. Composite id = media_id·2²⁰ +
    * frame index (loud require: index < 2²⁰, media_id < 2⁴³). The
    * fingerprint is the fused [[graft.expressions.AHash64]] kernel
    * (two allocation-free byte passes in whole-stage codegen);
    * [[aHash64Composed]] is the spec's reference semantics.
    *
    * @return (media_a, frame_a_ms, media_b, frame_b_ms, hamming) with
    *         (media, frame) pairs ordered lexicographically
    */
  /** The composable aHash formulation, kept as the spec's reference
    * semantics for the fused [[graft.expressions.AHash64]] kernel (same
    * role as the other `*Composed` references): the pixel array binds
    * once per frame via a single-element-array let, its sum once more —
    * without the nested lets the sum would re-fold per BIT.
    */
  private[graft] def aHash64Composed(windowCol: String): Column = {
    val n = 64
    val w = windowCol
    expr(
      s"""transform(array(transform(sequence(1, $n), j ->
         |    CAST(ascii(substr($w, j, 1)) AS BIGINT))), ps ->
         |  transform(array(aggregate(ps, 0L, (a, x) -> a + x)), s ->
         |    aggregate(sequence(0, ${n - 1}), 0L, (acc, j) ->
         |      acc | CASE WHEN element_at(ps, j + 1) * ${n}L > s
         |        THEN shiftleft(1L, j) ELSE 0L END))[0])[0]""".stripMargin)
  }

  def framePerceptualPairs(media: DataFrame, everyMs: Long,
                           maxHamming: Int = 3,
                           decoder: Decoder = fakeDecoder): DataFrame =
    decodeFramePairKeys(graft.ops.Dedup.hammingPairsOf(
      frameFingerprints(media, everyMs, decoder), maxHamming), everyMs)

  /** The composite (media, frame)-keyed pair columns back out of the
    * packed long key — shared by the full banding join above and the
    * incremental probe (`incremental_frame_neardup`).
    */
  def decodeFramePairKeys(pairs: DataFrame, everyMs: Long): DataFrame =
    pairs.select(
      expr("id_a div 1048576").as("media_a"),
      (pmod(col("id_a"), lit(1048576L)) * everyMs).as("frame_a_ms"),
      expr("id_b div 1048576").as("media_b"),
      (pmod(col("id_b"), lit(1048576L)) * everyMs).as("frame_b_ms"),
      col("hamming"))

  /** The sampled frames' 64-bit aHash fingerprints as a generic (id, sh)
    * frame (id = media_id·2²⁰ + frame index, overflow-guarded) — the
    * input of [[framePerceptualPairs]]' banding join and the unit the
    * incremental tier persists/probes.
    */
  def frameFingerprints(media: DataFrame, everyMs: Long,
                        decoder: Decoder = fakeDecoder): DataFrame = {
    val n = 64
    val frames = frameSamplePlan(decodeMeta(media, decoder), everyMs)
    val idx = (col("frame_ms") / lit(everyMs)).cast("long")
    val guardId = when(
      idx >= lit(1048576L) || col("media_id") >= lit(8796093022208L),
      raise_error(format_string(
        "graft.MultimodalOps.framePerceptualPairs: frame index %d /" +
          " media id %d overflow the composite key — lengthen everyMs" +
          " or re-key media first", idx, col("media_id"))).cast("long"))
      .otherwise(col("media_id") * lit(1048576L) + idx)
    // The window slices with CHARACTER semantics (length/substr over the
    // bytes cast to string) while AHash64 hashes raw UTF-8 bytes — the
    // two agree exactly on ASCII media bytes (the fakeDecoder contract)
    // and silently diverge past 0x7F. Enforce the contract loudly: a
    // non-ASCII window (octet_length > length) fails instead of
    // fingerprinting different pixels than the composed reference would.
    val win = col("__t").substr((idx * n + 1L).cast("int"), lit(n))
    val guardWin = when(octet_length(win) =!= length(win),
      raise_error(format_string(
        "graft.MultimodalOps.framePerceptualPairs: media %d frame %d " +
          "window contains non-ASCII bytes — the character-sliced " +
          "window and the byte-hashing AHash64 kernel would disagree; " +
          "decode to a real luma plane first", col("media_id"), idx))
        .cast("string"))
      .otherwise(win)
    val fp = frames
      .join(media.select(col("media_id"),
        col("bytes").cast("string").as("__t")), Seq("media_id"))
      .where(length(col("__t")) >= (idx + 1L) * n)
      .select(guardId.as("id"), guardWin.as("__w"))
      .select(col("id"),
        graft.expressions.AHash64.ahash(col("__w")).as("sh"))
    fp
  }
}
