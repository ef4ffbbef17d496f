package graft.multimodal

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted inside a typed
  * `mapPartitions` pass (one codec init per partition — the shape a real
  * image/audio decoder needs). The container ships no codec libraries, so
  * [[MediaCodec.decodeStub]] is a clearly-marked deterministic fake; the
  * Spark-side plumbing — binary schema, typed Dataset encoders, partition
  * batching — is real and oracle-verified.
  */
object Multimodal {

  /** The binary envelope: what a real pipeline would carry per media blob. */
  final case class MediaRecord(doc_id: Long, media_type: String, blob: Array[Byte])

  /** One sampled frame of a decoded multi-frame container (the 1→N
    * video-decode shape): the container's frame count plus the sampled
    * frame's raster-level channel sums.
    */
  final case class SampledFrame(
      doc_id: Long,
      n_frames: Int,
      frame_index: Int,
      width: Int,
      height: Int,
      sum_red: Long,
      sum_green: Long)

  /** Metadata of a resized blob (the 1→1 transform shape). */
  final case class ResizedMeta(
      doc_id: Long,
      media_type: String,
      n_bytes_in: Int,
      n_bytes_out: Int,
      out_checksum: Long)

  /** Decoded audio container metadata (the real-codec audio shape). */
  final case class AudioMeta(
      doc_id: Long,
      media_type: String,
      sample_rate: Int,
      channels: Int,
      n_frames: Long)

  /** Decoded (stubbed) features. */
  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      header_checksum: Long)

  /** ImageIO's default stream cache backs every read/write with a TEMP
    * FILE (FileCache*ImageStream in java.io.tmpdir): at sf0.1 the codec
    * family paid ~120k tmp-file create/delete cycles per q149 run,
    * making the measured time hostage to /tmp and page-cache state —
    * the round-9 round-end artifact read q149 at 3.5× its committed
    * same-code pair value. These rasters are ≤80×80, so the in-memory
    * stream cache is strictly better. The setter is a JVM-global static
    * boolean write (idempotent, ~free); it is called at every codec
    * boundary so executor JVMs are covered in any deployment, not just
    * local mode.
    */
  private[multimodal] def imageIoInMemory(): Unit =
    javax.imageio.ImageIO.setUseCache(false)

  object MediaCodec {
    /** STUB: stands in for an image/audio/video decoder (none available in
      * this container). Derives deterministic fake dimensions from the blob
      * so the full pipeline stays verifiable end-to-end. A real deployment
      * replaces only this function (and keeps the mapPartitions shape for
      * per-partition codec initialization).
      */
    def decodeStub(r: MediaRecord): MediaFeatures = {
      val n = r.blob.length
      val checksum = r.blob.iterator.take(16).map(b => (b & 0xffL)).sum
      MediaFeatures(r.doc_id, r.media_type, n,
        width = 16 + n % 64,
        height = 16 + (n * 7) % 64,
        n_frames = 1 + n % 8,
        header_checksum = checksum)
    }

    /** REAL codec path: container-header decode via `javax.imageio` —
      * pure JVM, present in every JDK, no native libraries — for the
      * formats the JDK ships readers for (PNG/JPEG/GIF/BMP). Reader
      * lookup goes by content signature, and `getWidth`/`getHeight`
      * parse only the header (no pixel decode), so the per-row cost is
      * O(header) regardless of payload size. Payloads no reader
      * recognizes (this fixture's text blobs; video/audio in any
      * deployment without codec jars) fall back to [[decodeStub]] — the
      * documented honest stand-in.
      */
    def decode(r: MediaRecord): MediaFeatures = {
      imageIoInMemory()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(r.blob))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) decodeStub(r)
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, true, true)
            // getNumImages without search is free; -1 (unknown without a
            // full-stream scan, e.g. JPEG) reports as 1 still image
            val frames = reader.getNumImages(false) match {
              case n if n > 0 => n
              case _ => 1
            }
            MediaFeatures(r.doc_id, r.media_type, r.blob.length,
              width = reader.getWidth(0),
              height = reader.getHeight(0),
              n_frames = frames,
              header_checksum = r.blob.iterator.take(16).map(b => b & 0xffL).sum)
          } finally reader.dispose()
        }
      } finally iis.close()
    }

    /** STUB resize (1 blob → 1 smaller blob): keeps every `factor`-th
      * byte — stands in for an image/audio downsample. Deterministic, so
      * the resized payload's length and checksum are oracle-verifiable.
      * A real deployment swaps in the codec call; the typed-Dataset
      * mapPartitions plumbing around it is the production shape.
      */
    def resizeStub(r: MediaRecord, factor: Int): MediaRecord = {
      val out = Array.tabulate(
        (r.blob.length + factor - 1) / factor)(i => r.blob(i * factor))
      MediaRecord(r.doc_id, r.media_type + s";resized=1/$factor", out)
    }

  }

  val queries: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // q35: binary-column metadata: byte length and content digest of the
    // payload column (md5 is engine-portable), typed with a media type.
    QueryDef.sql("q35_binary_metadata") { (s, d) =>
      // derives from mediaRecords (the documented single source of the
      // binary envelope) so a media_type/encoding change cannot leave
      // q35 silently on an old format while q36/q44/q51 move
      mediaRecords(s, d)
        .select(
          col("doc_id"),
          col("media_type"),
          octet_length(col("blob")).as("n_bytes"),
          md5(col("blob")).as("content_md5"))
        .orderBy("doc_id")
    } {
      """SELECT doc_id,
        |  'text/plain;lang=' || lang AS media_type,
        |  CAST(OCTET_LENGTH(ENCODE(text)) AS INT) AS n_bytes,
        |  MD5(text) AS content_md5
        |FROM documents
        |ORDER BY doc_id""".stripMargin
    },

    // ------------------------------------------------------------------
    // q36: the full decode pipeline through a typed Dataset +
    // mapPartitions (stubbed codec). The oracle replays the stub's
    // integer arithmetic on the byte length — possible only because the
    // stub is deterministic.
    // ------------------------------------------------------------------
    // q44: REAL 1→N VIDEO FRAME SAMPLING, oracle-verified — a
    // deterministic multi-frame (animated) GIF is synthesized per doc
    // through the real javax.imageio GIF SEQUENCE writer, then the real
    // GIF reader counts its frames (getNumImages(true) — a genuine
    // container scan), samples the video-thumbnail triple {first,
    // middle, last}, decodes each sampled frame with read(i) and
    // traverses every pixel for channel sums. Frame count, dimensions
    // and sums exist ONLY inside the container bytes; the oracle
    // predicts them in closed form from the generator (frames are
    // two-color indexed rasters — bit-lossless GIF round-trip by
    // construction), so the hash match proves the multi-frame codec
    // path end-to-end. This de-stubs the former byte-offset sampler the
    // way q171 de-stubbed q51's resize claim.
    QueryDef.sql("q44_frame_samples")(frameSamples) {
      """WITH m AS (
        |  SELECT doc_id, CAST(OCTET_LENGTH(ENCODE(text)) AS INT) AS n
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, n,
        |    8 + n % 24 AS w, 8 + (n * 3) % 24 AS h, 1 + n % 8 AS nf
        |  FROM m),
        |f AS (
        |  SELECT DISTINCT doc_id, n, w, h, nf, fi FROM (
        |    SELECT doc_id, n, w, h, nf,
        |      UNNEST([0, nf // 2, nf - 1]) AS fi
        |    FROM p) t)
        |SELECT doc_id, CAST(nf AS INT) AS n_frames,
        |  CAST(fi AS INT) AS frame_index,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST((w // 2) * h * ((n + 31 * fi) % 256)
        |     + (w - w // 2) * h * ((n * 7 + 13 * fi) % 256) AS BIGINT)
        |    AS sum_red,
        |  CAST((w // 2) * h * ((n * 3 + 17 * fi) % 256)
        |     + (w - w // 2) * h * ((n + 5 * fi) % 256) AS BIGINT)
        |    AS sum_green
        |FROM f
        |ORDER BY doc_id, frame_index""".stripMargin
    },

    // ------------------------------------------------------------------
    // q51: 1→1 resize transform (the image/audio downsample shape):
    // typed mapPartitions emits the resized blob's metadata; the stub
    // keeps every 4th byte, so the oracle replays it with hex-pair
    // extraction over the UTF-8 bytes.
    QueryDef.sql("q51_media_resize")(mediaResize) {
      """WITH m AS (
        |  SELECT doc_id, 'text/plain;lang=' || lang || ';resized=1/4' AS media_type,
        |    HEX(ENCODE(text)) AS h,
        |    CAST(OCTET_LENGTH(ENCODE(text)) AS INT) AS n
        |  FROM documents)
        |SELECT doc_id, media_type,
        |  n AS n_bytes_in,
        |  CAST((n + 3) // 4 AS INT) AS n_bytes_out,
        |  CAST(COALESCE(LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, n, 4),
        |    j -> CAST(('0x' || SUBSTRING(h, 2 * j - 1, 2)) AS INT))), 0) AS BIGINT)
        |    AS out_checksum
        |FROM m
        |ORDER BY doc_id""".stripMargin
    },

    QueryDef.sql("q36_media_features")(mediaFeatures) {
      // Byte-faithful oracle (see q44): header checksum over the first 16
      // UTF-8 bytes via hex-pair extraction, matching the stub's byte sum.
      """WITH m AS (
        |  SELECT doc_id, 'text/plain;lang=' || lang AS media_type,
        |    CAST(OCTET_LENGTH(ENCODE(text)) AS INT) AS n,
        |    HEX(ENCODE(text)) AS h
        |  FROM documents)
        |SELECT doc_id, media_type,
        |  n AS n_bytes,
        |  16 + n % 64 AS width,
        |  16 + (n * 7) % 64 AS height,
        |  1 + n % 8 AS n_frames,
        |  CAST(COALESCE(LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, LEAST(16, n)),
        |                 i -> CAST(('0x' || SUBSTRING(h, 2 * i - 1, 2)) AS INT))), 0)
        |       AS BIGINT) AS header_checksum
        |FROM m
        |ORDER BY doc_id""".stripMargin
    },

    // ------------------------------------------------------------------
    // q104: REAL image decode, oracle-verified. PNG payloads are
    // synthesized per document with pixel dimensions derived from the
    // document's byte length, then decoded by MediaCodec.decode's real
    // javax.imageio header parse — the width/height in the output exist
    // ONLY inside the PNG container bytes, so the oracle (which predicts
    // them from n_chars independently) passes only if the codec path
    // genuinely parses the image header. The encode and decode both ride
    // the per-partition mapPartitions shape a native codec needs.
    QueryDef.sql("q104_image_decode")(imageDecode) {
      """SELECT doc_id,
        |  'image/png' AS media_type,
        |  16 + CAST(OCTET_LENGTH(ENCODE(text)) AS INT) % 64 AS width,
        |  16 + (CAST(OCTET_LENGTH(ENCODE(text)) AS INT) * 7) % 64 AS height,
        |  1 AS n_frames
        |FROM documents
        |ORDER BY doc_id""".stripMargin
    },

    // ------------------------------------------------------------------
    // q120: REAL audio-container decode, oracle-verified — q104's twin
    // for the audio stub. A WAV (RIFF) container is synthesized per
    // document with sample rate / channel count / frame count derived
    // from the payload length (written by javax.sound.sampled's REAL
    // WAVE writer), then the metadata is recovered by AudioSystem's real
    // RIFF header parse. Those three fields exist only inside the
    // container bytes, so the oracle (predicting them from n_chars
    // independently) passes only if the audio codec path genuinely
    // parses the header. Same per-partition mapPartitions shape a
    // native audio codec (ffmpeg/libsndfile) would ride.
    QueryDef.sql("q120_audio_decode")(audioDecode) {
      """SELECT doc_id,
        |  'audio/wav' AS media_type,
        |  8000 + (CAST(OCTET_LENGTH(ENCODE(text)) AS INT) % 8) * 1000
        |    AS sample_rate,
        |  1 + CAST(OCTET_LENGTH(ENCODE(text)) AS INT) % 2 AS channels,
        |  CAST(100 + (CAST(OCTET_LENGTH(ENCODE(text)) AS INT) * 3) % 900
        |    AS BIGINT) AS n_frames
        |FROM documents
        |ORDER BY doc_id""".stripMargin
    },

    // ------------------------------------------------------------------
    // q149: REAL PIXEL-LEVEL image decode, oracle-verified — the raster
    // upgrade of q104's header proof. Channel sums are computed by
    // traversing every pixel of the re-decoded PNG; the oracle predicts
    // them in closed form from the gradient the encoder wrote (red a
    // function of x only, green of y only), so a hash-match proves the
    // decode touched every pixel, not just the IHDR. Means are one
    // division of exact ints on both engines.
    QueryDef.sql("q149_pixel_decode")(pixelDecode) {
      """WITH base AS (
        |  SELECT doc_id,
        |    CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n
        |  FROM documents),
        |dims AS (
        |  SELECT doc_id, n,
        |    CAST(16 + n % 64 AS INT) AS width,
        |    CAST(16 + (n * 7) % 64 AS INT) AS height
        |  FROM base),
        |sums AS (
        |  SELECT doc_id, width, height,
        |    CAST(height * LIST_SUM(LIST_TRANSFORM(RANGE(0, width),
        |      x -> (n + x) % 256)) AS BIGINT) AS sum_red,
        |    CAST(width * LIST_SUM(LIST_TRANSFORM(RANGE(0, height),
        |      y -> (n * 3 + y) % 256)) AS BIGINT) AS sum_green
        |  FROM dims)
        |SELECT doc_id, width, height, sum_red, sum_green,
        |  CAST(sum_red AS DOUBLE) / CAST(width * height AS DOUBLE)
        |    AS mean_red,
        |  CAST(sum_green AS DOUBLE) / CAST(width * height AS DOUBLE)
        |    AS mean_green
        |FROM sums
        |ORDER BY doc_id""".stripMargin
    },

    // ------------------------------------------------------------------
    // q158: IMAGE DEDUP ON THE DECODED RASTER — exact duplicate-image
    // groups keyed by an md5 digest of the decoded pixel array: the
    // content-addressed dedup a multimodal corpus runs BEFORE any
    // embedding work (byte-level digests miss re-encodes; raster
    // digests don't). By the gradient construction two synthesized
    // images are pixel-identical iff their payload lengths are
    // congruent mod 256, so the oracle predicts the exact group
    // partition without decoding anything — the hash-match proves the
    // decode+digest path groups precisely right. The perceptual
    // near-dup path (aHash banding + hamming verify, for NEAR-identical
    // rasters where no exact oracle can exist) is the
    // [[perceptualNearDup]] API, spec-verified against this query's
    // exact groups.
    // ------------------------------------------------------------------
    // q171: REAL IMAGE RESIZE, oracle-verified — the de-stubbed upgrade
    // of q51's byte-stub resize (which stays as the honest fallback for
    // payloads no codec reads). The decoded q149-style gradient raster
    // is half-scaled by Java2D's REAL scaling pipeline (Graphics2D
    // drawImage under a pinned NEAREST_NEIGHBOUR hint), then the
    // resized raster is traversed for channel sums. Nearest-neighbour
    // half-scale has an exact closed form — dst(X,Y) samples
    // src(2X+1, 2Y+1), probed and pinned against the JDK's rounding
    // (floor((dst+0.5)/scale)) — so the oracle predicts the resized
    // sums from the gradient alone; a hash match proves a real
    // resample of the decoded raster, pixel for pixel. (Bilinear has no
    // such closed form at the 255→0 gradient wrap, so the proof rides
    // the hint Java2D can be held exactly to.) Same per-partition
    // mapPartitions codec boundary as q149.
    QueryDef.sql("q171_image_resize_real")(imageResizeReal) {
      """WITH base AS (
        |  SELECT doc_id,
        |    CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n
        |  FROM documents),
        |dims AS (
        |  SELECT doc_id, n,
        |    CAST(16 + n % 64 AS INT) AS w,
        |    CAST(16 + (n * 7) % 64 AS INT) AS h
        |  FROM base),
        |o AS (
        |  SELECT doc_id, n, w, h,
        |    CAST(w // 2 AS INT) AS w2, CAST(h // 2 AS INT) AS h2
        |  FROM dims)
        |SELECT doc_id, w AS width_in, h AS height_in,
        |  w2 AS width_out, h2 AS height_out,
        |  CAST(h2 * LIST_SUM(LIST_TRANSFORM(RANGE(0, w2),
        |    x -> (n + 2 * x + 1) % 256)) AS BIGINT) AS sum_red,
        |  CAST(w2 * LIST_SUM(LIST_TRANSFORM(RANGE(0, h2),
        |    y -> (n * 3 + 2 * y + 1) % 256)) AS BIGINT) AS sum_green
        |FROM o
        |ORDER BY doc_id""".stripMargin
    },

    // ------------------------------------------------------------------
    // q172: FULL-SAMPLE AUDIO DECODE, oracle-verified — the q149-grade
    // upgrade of q120's header proof. The WAV payload now carries a
    // deterministic NON-silent PCM ramp (16-bit signed little-endian,
    // sample i = (n + 7i) % 4001 − 2000, interleaved across channels),
    // written by the JDK's real WAVE writer; the decode side re-reads
    // the container with AudioSystem's real RIFF parse and traverses
    // EVERY sample for sum and abs-sum. Those sums exist only in the
    // PCM body, so the oracle's closed-form prediction passes only if
    // the codec path decodes every byte of audio — header-only parsing
    // (q120's proof level) cannot fake it. Exact int arithmetic
    // end-to-end; same mapPartitions codec boundary.
    QueryDef.sql("q172_audio_pcm_decode")(audioPcmDecode) {
      """WITH base AS (
        |  SELECT doc_id,
        |    CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, n,
        |    CAST(8000 + (n % 8) * 1000 AS INT) AS sample_rate,
        |    CAST(1 + n % 2 AS INT) AS channels,
        |    CAST(100 + (n * 3) % 900 AS BIGINT) AS n_frames
        |  FROM base)
        |SELECT doc_id, sample_rate, channels, n_frames,
        |  CAST(LIST_SUM(LIST_TRANSFORM(RANGE(0, n_frames * channels),
        |    i -> (n + i * 7) % 4001 - 2000)) AS BIGINT) AS sum_samples,
        |  CAST(LIST_SUM(LIST_TRANSFORM(RANGE(0, n_frames * channels),
        |    i -> ABS((n + i * 7) % 4001 - 2000))) AS BIGINT) AS sum_abs
        |FROM p
        |ORDER BY doc_id""".stripMargin
    },

    // ------------------------------------------------------------------
    // q283: AUDIO HEADROOM / CLIPPING AUDIT — the gain-normalization
    // census a speech pipeline runs before training: per clip, the
    // share of samples at or beyond the |v| ≥ 1900 policy threshold,
    // the exact peak, the exact int64 energy Σv², and the squared crest
    // factor peak²·n/Σv² (the dynamics number that separates speech
    // from tone/noise). Decode is the real WAV codec at the
    // per-partition boundary (q172's posture); the oracle replays the
    // synthesis recurrence in closed form, so a hash match proves the
    // decode visited every sample and thresholded it correctly. The
    // derived ratios are single IEEE chains over exact integers.
    QueryDef.sql("q283_audio_clipping") { (s, d) =>
      audioClippingAudit(s, d)
        .select(col("doc_id"), col("n_samples"), col("peak"),
          col("n_clipped"),
          expr("CAST(n_clipped AS DOUBLE) / CAST(n_samples AS DOUBLE)")
            .as("clip_share"),
          col("sum_sq"),
          expr("CASE WHEN sum_sq = 0 THEN NULL ELSE " +
            "(CAST(peak AS DOUBLE) * CAST(peak AS DOUBLE) * " +
            "CAST(n_samples AS DOUBLE)) / CAST(sum_sq AS DOUBLE) END")
            .as("crest_sq"))
        .orderBy("doc_id")
    } {
      """WITH base AS (
        |  SELECT doc_id,
        |    CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, n,
        |    CAST(1 + n % 2 AS INT) AS channels,
        |    CAST(100 + (n * 3) % 900 AS BIGINT) AS n_frames
        |  FROM base),
        |st AS (
        |  SELECT doc_id, n_frames * channels AS n_samples,
        |    LIST_MAX(LIST_TRANSFORM(RANGE(0, n_frames * channels),
        |      i -> ABS((n + i * 7) % 4001 - 2000))) AS peak,
        |    LIST_SUM(LIST_TRANSFORM(RANGE(0, n_frames * channels),
        |      i -> CASE WHEN ABS((n + i * 7) % 4001 - 2000) >= 1900
        |        THEN 1 ELSE 0 END)) AS n_clipped,
        |    LIST_SUM(LIST_TRANSFORM(RANGE(0, n_frames * channels),
        |      i -> ((n + i * 7) % 4001 - 2000)
        |        * ((n + i * 7) % 4001 - 2000))) AS sum_sq
        |  FROM p)
        |SELECT doc_id, CAST(n_samples AS BIGINT) AS n_samples,
        |  CAST(peak AS BIGINT) AS peak,
        |  CAST(n_clipped AS BIGINT) AS n_clipped,
        |  CAST(n_clipped AS DOUBLE) / CAST(n_samples AS DOUBLE)
        |    AS clip_share,
        |  CAST(sum_sq AS BIGINT) AS sum_sq,
        |  CASE WHEN sum_sq = 0 THEN NULL ELSE
        |    (CAST(peak AS DOUBLE) * CAST(peak AS DOUBLE)
        |      * CAST(n_samples AS DOUBLE)) / CAST(sum_sq AS DOUBLE) END
        |    AS crest_sq
        |FROM st
        |ORDER BY doc_id""".stripMargin
    },

    QueryDef.sql("q158_image_raster_dedup")(imageRasterDedup) {
      """WITH base AS (
        |  SELECT doc_id,
        |    CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) % 256 AS cls
        |  FROM documents)
        |SELECT MIN(doc_id) AS keep_doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_members
        |FROM base GROUP BY cls HAVING COUNT(*) >= 2
        |ORDER BY keep_doc_id""".stripMargin
    },

    // ------------------------------------------------------------------
    // q191: CORPUS CHANNEL HISTOGRAM — the 16-bin red/green intensity
    // histogram over EVERY decoded pixel in the corpus: the dataset
    // brightness/exposure profile a multimodal pipeline computes before
    // choosing normalization constants (and the per-channel drift
    // monitor once it's in production). Scale shape: the histogram is
    // accumulated INSIDE mapPartitions into two 16-long arrays — one
    // emission of ≤ 16 rows per partition, so the shuffle moves
    // O(partitions × bins) rows no matter how many trillion pixels were
    // traversed; the keyed agg then folds partials. The oracle predicts
    // every bin count in closed form from the gradient construction
    // (red varies only with x, green only with y — each row/column
    // contributes h/w copies of one value), so a hash match proves the
    // real decode visited every pixel AND binned it correctly.
    QueryDef.sql("q191_channel_histogram")(channelHistogram) {
      """WITH base AS (
        |  SELECT doc_id,
        |    CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n
        |  FROM documents),
        |dims AS (
        |  SELECT doc_id, n,
        |    CAST(16 + n % 64 AS BIGINT) AS w,
        |    CAST(16 + (n * 7) % 64 AS BIGINT) AS h
        |  FROM base),
        |bins AS (SELECT UNNEST(GENERATE_SERIES(0, 15)) AS bin),
        |per AS (
        |  SELECT b.bin,
        |    d.h * LIST_SUM(LIST_TRANSFORM(RANGE(0, d.w),
        |      x -> CASE WHEN ((d.n + x) % 256) // 16 = b.bin
        |        THEN 1 ELSE 0 END)) AS nr,
        |    d.w * LIST_SUM(LIST_TRANSFORM(RANGE(0, d.h),
        |      y -> CASE WHEN ((d.n * 3 + y) % 256) // 16 = b.bin
        |        THEN 1 ELSE 0 END)) AS ng
        |  FROM dims d, bins b)
        |SELECT bin, CAST(SUM(nr) AS BIGINT) AS n_red,
        |  CAST(SUM(ng) AS BIGINT) AS n_green
        |FROM per GROUP BY bin
        |ORDER BY bin""".stripMargin
    },

    // ------------------------------------------------------------------
    // q203: AUDIO ZERO-CROSSING FEATURES — the classic cheap audio
    // feature (speech/music/noise discriminator, silence trimming) over
    // the real WAV path: per-channel strict sign flips between
    // consecutive frames, plus the peak amplitude. The oracle predicts
    // both in closed form from the ramp construction — a crossing exists
    // only between specific consecutive same-channel samples of the PCM
    // body, so a hash match proves the decoder walked every frame of
    // every channel in interleaved order (q120's header parse or q172's
    // channel-blind flat sum cannot fake per-channel adjacency). All
    // integer arithmetic; same per-partition codec boundary.
    QueryDef.sql("q203_audio_zero_crossings")(audioZeroCrossings) {
      """WITH base AS (
        |  SELECT doc_id,
        |    CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, n,
        |    CAST(1 + n % 2 AS INT) AS channels,
        |    CAST(100 + (n * 3) % 900 AS BIGINT) AS n_frames
        |  FROM base)
        |SELECT doc_id, channels, n_frames,
        |  CAST(LIST_SUM(LIST_TRANSFORM(RANGE(0, CAST(channels AS BIGINT)),
        |    c -> LIST_SUM(LIST_TRANSFORM(RANGE(0, n_frames - 1),
        |      j -> CASE WHEN
        |          ((n + (j * channels + c) * 7) % 4001 - 2000)
        |          * ((n + ((j + 1) * channels + c) * 7) % 4001 - 2000) < 0
        |        THEN 1 ELSE 0 END)))) AS BIGINT) AS n_crossings,
        |  CAST(LIST_MAX(LIST_TRANSFORM(RANGE(0, n_frames * channels),
        |    i -> ABS((n + i * 7) % 4001 - 2000))) AS BIGINT) AS peak
        |FROM p
        |ORDER BY doc_id""".stripMargin
    }
  )

  /** The binary-envelope view of the fixture: one [[MediaRecord]] per
    * document, the payload as an opaque blob (what a real pipeline gets
    * from its object store). Single source for every multimodal query —
    * its media_type/encoding choices are mirrored in all four oracles.
    */
  private def mediaRecords(s: SparkSession, d: String) = {
    import s.implicits._
    Tables(s, d, "documents")
      .select(
        col("doc_id"),
        concat(lit("text/plain;lang="), col("lang")).as("media_type"),
        encode(col("text"), "UTF-8").as("blob"))
      .as[MediaRecord]
  }

  /** Deterministic multi-frame (animated) GIF synthesizer — q44's
    * fixture, the video analog of [[gradientPng]]: `1 + n % 8` frames of
    * `(8 + n % 24) × (8 + 3n % 24)` pixels, frame `f` a two-color
    * vertical split (left half color A(f), right half color B(f), both
    * closed-form in (n, f)). Frames are TYPE_BYTE_INDEXED over an
    * EXPLICIT 2-entry IndexColorModel: the JDK GIF writer re-palettizes
    * non-indexed input through a fixed 216-color web palette (lossy —
    * the raster oracle would see quantized channels), while an indexed
    * raster's palette is written verbatim, making the GIF round-trip
    * bit-lossless by construction. Written through the real
    * `javax.imageio` GIF SEQUENCE writer (prepareWriteSequence /
    * writeToSequence), so the blob is a genuine multi-frame container —
    * the frame count exists only inside its bytes.
    */
  private def animatedGif(docId: Long, n: Int): MediaRecord = {
    imageIoInMemory()
    val w = 8 + n % 24
    val h = 8 + (n * 3) % 24
    val nf = 1 + n % 8
    val wl = w / 2
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nf) {
        val cm = new java.awt.image.IndexColorModel(8, 2,
          Array(((n + 31 * f) % 256).toByte, ((n * 7 + 13 * f) % 256).toByte),
          Array(((n * 3 + 17 * f) % 256).toByte, ((n + 5 * f) % 256).toByte),
          Array(((n + f) % 256).toByte, ((n * 11 + f) % 256).toByte))
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.setSample(x, y, 0, if (x < wl) 0 else 1)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      ios.close()
      writer.dispose()
    }
    MediaRecord(docId, "image/gif", bos.toByteArray)
  }

  /** q44's body: synthesized animated GIF → REAL multi-frame decode →
    * thumbnail-style frame sampling. The reader counts frames with
    * `getNumImages(true)` (a genuine container scan — seekForwardOnly
    * must be off) and samples the classic video-thumbnail triple
    * {first, middle, last} (deduped when the clip is short); each
    * sampled frame is decoded with `read(i)` and traversed
    * pixel-by-pixel for channel sums. Frame count, dimensions and sums
    * all exist only inside the container bytes — the oracle predicts
    * them closed-form from the generator, so a hash match proves the
    * real multi-frame codec path end-to-end (the q149/q171 pattern).
    * Same per-partition codec boundary as every other real codec here.
    */
  def frameSamples(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaRecords(s, d)
      .mapPartitions(_.map(r => animatedGif(r.doc_id, r.blob.length)))
      .mapPartitions { it =>
        imageIoInMemory()
        it.flatMap { r =>
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(r.blob))
          val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
          try {
            reader.setInput(iis)
            val nf = reader.getNumImages(true)
            Seq(0, nf / 2, nf - 1).distinct.sorted.map { f =>
              val img = reader.read(f)
              val (w, h) = (img.getWidth, img.getHeight)
              val px = img.getRGB(0, 0, w, h, null, 0, w)
              var (sr, sg) = (0L, 0L)
              var i = 0
              while (i < px.length) {
                sr += (px(i) >> 16) & 0xff
                sg += (px(i) >> 8) & 0xff
                i += 1
              }
              SampledFrame(r.doc_id, nf, f, w, h, sr, sg)
            }
          } finally {
            reader.dispose()
            iis.close()
          }
        }
      }
      .toDF()
      .orderBy("doc_id", "frame_index")
  }

  def mediaResize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaRecords(s, d)
      .mapPartitions { it =>
        // per-partition codec init would happen here
        it.map { r =>
          val rz = MediaCodec.resizeStub(r, 4)
          ResizedMeta(r.doc_id, rz.media_type, r.blob.length, rz.blob.length,
            rz.blob.iterator.map(b => b & 0xffL).sum)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  def mediaFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaRecords(s, d)
      .mapPartitions { it =>
        // per-partition codec init would happen here; decode() parses
        // real image containers and falls back to the stub for payloads
        // without a JDK reader (this fixture's text blobs)
        it.map(MediaCodec.decode)
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** q104's body: synthesize a PNG per document (dimensions derived from
    * the payload length), then recover those dimensions with the REAL
    * codec path. See the QueryDef comment for why this proves the decode.
    */
  def imageDecode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaRecords(s, d)
      .mapPartitions { it =>
        // encode stage: one ByteArrayOutputStream per row, ImageIO's
        // writer registry is JVM-static (the "codec init" analog)
        imageIoInMemory()
        it.map { r =>
          val n = r.blob.length
          val img = new java.awt.image.BufferedImage(
            16 + n % 64, 16 + (n * 7) % 64,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          MediaRecord(r.doc_id, "image/png", bos.toByteArray)
        }
      }
      .mapPartitions(_.map(MediaCodec.decode))
      .toDF()
      .select(col("doc_id"), col("media_type"), col("width"), col("height"),
        col("n_frames"))
      .orderBy("doc_id")
  }

  /** q120's body: synthesize a WAV container per document (PCM silence
    * under a real RIFF header written by the JDK's WAVE writer), then
    * recover rate/channels/frames with the REAL AudioSystem parse. See
    * the QueryDef comment for why this proves the decode.
    */
  def audioDecode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import javax.sound.sampled._
    mediaRecords(s, d)
      .mapPartitions { it =>
        // encode stage: the AudioSystem provider registry is JVM-static
        // (the per-partition "codec init" analog)
        it.map { r =>
          val n = r.blob.length
          val rate = 8000 + (n % 8) * 1000
          val channels = 1 + n % 2
          val frames = 100 + (n * 3) % 900
          val fmt = new AudioFormat(rate.toFloat, 16, channels, true, false)
          val pcm = new Array[Byte](frames * 2 * channels)
          val ais = new AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
          MediaRecord(r.doc_id, "audio/wav", bos.toByteArray)
        }
      }
      .mapPartitions { it =>
        it.map { r =>
          val aff = AudioSystem.getAudioFileFormat(
            new java.io.ByteArrayInputStream(r.blob))
          val f = aff.getFormat
          AudioMeta(r.doc_id, r.media_type, f.getSampleRate.toInt,
            f.getChannels, aff.getFrameLength.toLong)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** Per-image channel statistics recovered from a REAL raster decode —
    * q149's body. Every pixel is written (red a function of x, green of
    * y, both offset by the payload length), PNG-encoded losslessly, then
    * re-read via `ImageIO.read` and traversed pixel-by-pixel; the sums
    * exist only in the raster, so matching the oracle's closed-form
    * prediction proves the FULL decode path (q104 proved the header
    * parse only). This is the feature-extraction stage shape of a real
    * multimodal pipeline (mean-brightness / channel-stats quality gates
    * before CLIP scoring), with the codec boundary inside
    * `mapPartitions` exactly where a native decoder would sit.
    */
  final case class PixelStats(doc_id: Long, width: Int, height: Int,
      sum_red: Long, sum_green: Long)

  /** Gradient-PNG synthesizer shared by q149/q158: red varies with x,
    * green with y, both offset by the payload length `n` — so two
    * payloads produce pixel-identical images iff n ≡ n′ (mod 256), the
    * closed-form fact q158's oracle stands on. Bulk raster write: one
    * setRGB(int[]) call per image (the per-pixel path costs a
    * bounds+model check per pixel, measured ~2× slower at sf0.1).
    */
  private def gradientPng(docId: Long, n: Int): MediaRecord = {
    val w = 16 + n % 64
    val h = 16 + (n * 7) % 64
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val g = (n * 3 + y) % 256
      var x = 0
      while (x < w) {
        px(y * w + x) = (((n + x) % 256) << 16) | (g << 8) | (n % 256)
        x += 1
      }
      y += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w)
    imageIoInMemory()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    MediaRecord(docId, "image/png", bos.toByteArray)
  }

  /** q172's decoded-PCM stats row. */
  final case class PcmStats(doc_id: Long, sample_rate: Int, channels: Int,
      n_frames: Long, sum_samples: Long, sum_abs: Long)

  /** q172's body: synthesize a WAV with a deterministic PCM ramp, then
    * decode it back and traverse every sample. See the QueryDef comment.
    */
  /** The deterministic WAV fixture both audio queries decode: 16-bit
    * signed little-endian PCM ramp (sample i = (n + 7i) % 4001 − 2000,
    * interleaved across channels), written through the JDK's real WAVE
    * writer. Factored so q172 (sample sums) and q203 (zero crossings)
    * provably read the same container bytes.
    */
  private def synthWavRecords(s: SparkSession, d: String) = {
    import s.implicits._
    import javax.sound.sampled._
    mediaRecords(s, d)
      .mapPartitions { it =>
        it.map { r =>
          val n = r.blob.length
          val rate = 8000 + (n % 8) * 1000
          val channels = 1 + n % 2
          val frames = 100 + (n * 3) % 900
          val pcm = new Array[Byte](frames * 2 * channels)
          var i = 0
          while (i < frames * channels) {
            val v = (n + i * 7) % 4001 - 2000
            pcm(2 * i) = (v & 0xff).toByte
            pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new AudioFormat(rate.toFloat, 16, channels, true, false)
          val ais = new AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
          MediaRecord(r.doc_id, "audio/wav", bos.toByteArray)
        }
      }
  }

  def audioPcmDecode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import javax.sound.sampled._
    synthWavRecords(s, d)
      .mapPartitions { it =>
        it.map { r =>
          val ais = AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.blob))
          val f = ais.getFormat
          val body = ais.readAllBytes()
          ais.close()
          var (sum, sabs) = (0L, 0L)
          var i = 0
          while (i + 1 < body.length) {
            // 16-bit signed little-endian, as the format reports
            val v = ((body(i) & 0xff) | (body(i + 1) << 8)).toShort.toLong
            sum += v
            sabs += math.abs(v)
            i += 2
          }
          PcmStats(r.doc_id, f.getSampleRate.toInt, f.getChannels,
            ais.getFrameLength, sum, sabs)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** q283's per-doc headroom row (exact integer stats; the derived
    * ratios are appended as single IEEE chains in the QueryDef).
    */
  final case class ClipStats(doc_id: Long, n_samples: Long, peak: Long,
      n_clipped: Long, sum_sq: Long)

  /** q283's body: decode the real WAV container and audit headroom —
    * samples at or beyond the |v| ≥ 1900 policy threshold (the
    * clipping-risk census a speech pipeline runs before gain
    * normalization), the exact peak, and the exact int64 energy Σv²
    * (crest-factor input). Same per-partition codec boundary as
    * q172/q203; one row per clip crosses the shuffle.
    */
  def audioClippingAudit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import javax.sound.sampled._
    synthWavRecords(s, d)
      .mapPartitions { it =>
        it.map { r =>
          val ais = AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.blob))
          val body = ais.readAllBytes()
          ais.close()
          var (n, peak, nclip, sumsq) = (0L, 0L, 0L, 0L)
          var i = 0
          while (i + 1 < body.length) {
            val v = ((body(i) & 0xff) | (body(i + 1) << 8)).toShort.toLong
            val a = math.abs(v)
            n += 1L
            if (a > peak) peak = a
            if (a >= 1900L) nclip += 1L
            sumsq += v * v
            i += 2
          }
          ClipStats(r.doc_id, n, peak, nclip, sumsq)
        }
      }
      .toDF()
  }

  /** q203's per-doc audio feature row. */
  final case class ZcrStats(doc_id: Long, channels: Int, n_frames: Long,
      n_crossings: Long, peak: Long)

  /** q203's body: decode the real WAV container and compute per-channel
    * zero-crossing counts (strict sign flips between consecutive frames
    * of the SAME channel — the interleaved body is walked with a
    * per-channel previous-sample array) plus the peak amplitude. See the
    * QueryDef comment for the oracle argument.
    */
  def audioZeroCrossings(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import javax.sound.sampled._
    synthWavRecords(s, d)
      .mapPartitions { it =>
        it.map { r =>
          val ais = AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.blob))
          val f = ais.getFormat
          val ch = f.getChannels
          val body = ais.readAllBytes()
          ais.close()
          val prev = new Array[Long](ch)
          var (crossings, peak) = (0L, 0L)
          var sample = 0
          while (2 * sample + 1 < body.length) {
            val v = ((body(2 * sample) & 0xff) |
              (body(2 * sample + 1) << 8)).toShort.toLong
            val c = sample % ch
            if (sample >= ch && prev(c) * v < 0) crossings += 1
            prev(c) = v
            if (math.abs(v) > peak) peak = math.abs(v)
            sample += 1
          }
          ZcrStats(r.doc_id, ch, ais.getFrameLength, crossings, peak)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** q171's resized-raster stats row. */
  final case class ResizedStats(doc_id: Long, width_in: Int, height_in: Int,
      width_out: Int, height_out: Int, sum_red: Long, sum_green: Long)

  /** q171's body: gradient PNG → real decode → REAL Java2D half-scale
    * (nearest-neighbour hint, see the QueryDef comment for the pinned
    * sampling rule) → channel sums over the RESIZED raster.
    */
  def imageResizeReal(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaRecords(s, d)
      .mapPartitions(_.map(r => gradientPng(r.doc_id, r.blob.length)))
      .mapPartitions { it =>
        imageIoInMemory()
        it.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.blob))
          val (w, h) = (img.getWidth, img.getHeight)
          val (w2, h2) = (w / 2, h / 2)
          val out = new java.awt.image.BufferedImage(
            w2, h2, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
          g.drawImage(img, 0, 0, w2, h2, null)
          g.dispose()
          val px = out.getRGB(0, 0, w2, h2, null, 0, w2)
          var (sr, sg) = (0L, 0L)
          var i = 0
          while (i < px.length) {
            sr += (px(i) >> 16) & 0xff
            sg += (px(i) >> 8) & 0xff
            i += 1
          }
          ResizedStats(r.doc_id, w, h, w2, h2, sr, sg)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** Decode a PNG blob back to (width, height, packed-RGB pixels). */
  private def decodeRaster(r: MediaRecord): (Int, Int, Array[Int]) = {
    imageIoInMemory()
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.blob))
    val (w, h) = (img.getWidth, img.getHeight)
    (w, h, img.getRGB(0, 0, w, h, null, 0, w))
  }

  /** 64-bit average-hash (aHash) of a decoded raster: 8×8 block
    * luminance sums, bit i set iff block i's mean luminance is ≥ the
    * global mean — compared by integer cross-multiplication
    * (sumᵢ·N ≥ total·cntᵢ), so the hash is exact integer arithmetic
    * end-to-end. Identical rasters hash identically; near-identical
    * rasters differ in few bits — the blocking key for perceptual
    * near-dup.
    */
  private def aHash64(w: Int, h: Int, px: Array[Int]): Long = {
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        val p = px(y * w + x)
        val lum = ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
        val bi = by * 8 + x * 8 / w
        sums(bi) += lum
        cnts(bi) += 1
        x += 1
      }
      y += 1
    }
    val total = sums.sum
    val n = w.toLong * h
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (cnts(i) > 0 && sums(i) * n >= total * cnts(i)) hash |= (1L << i)
      i += 1
    }
    hash
  }

  final case class RasterKey(doc_id: Long, digest: String, ahash: Long)

  /** The synthesized-image relation with raster digest + aHash — one
    * encode/decode pass feeding both q158 (exact groups on the digest)
    * and [[perceptualNearDup]] (banded aHash candidates).
    */
  private def rasterKeys(s: SparkSession, d: String) = {
    import s.implicits._
    mediaRecords(s, d)
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { r =>
          val (w, h, px) = decodeRaster(gradientPng(r.doc_id, r.blob.length))
          md.reset()
          val bb = java.nio.ByteBuffer.allocate(px.length * 4 + 8)
          bb.putInt(w).putInt(h)
          px.foreach(bb.putInt)
          val digest = md.digest(bb.array()).map("%02x".format(_)).mkString
          RasterKey(r.doc_id, digest, aHash64(w, h, px))
        }
      }
  }

  /** q158's body: exact duplicate-image groups on the decoded-raster
    * digest — one codec pass, one digest shuffle, groups ≥ 2 with the
    * keep-lowest-id canonical (the q68 rule).
    */
  def imageRasterDedup(s: SparkSession, d: String): DataFrame =
    rasterKeys(s, d).toDF()
      .groupBy(col("digest"))
      .agg(min(col("doc_id")).as("keep_doc_id"),
        count(lit(1)).as("n_members"))
      .filter(col("n_members") >= 2)
      .select(col("keep_doc_id"), col("n_members"))
      .orderBy("keep_doc_id")

  /** Perceptual near-dup pairs: aHash bands (8×8 bits) generate
    * candidates — any two rasters within `maxHamming` ≤ 7 bits share at
    * least one intact band (pigeonhole), so the banded join is
    * answer-preserving at that radius — verified by `bit_count` of the
    * hash XOR, with `exact` flagging raster-digest equality. The near
    * radius has no closed-form oracle (that is its point); the spec
    * pins it against q158's exact groups instead.
    */
  def perceptualNearDup(s: SparkSession, d: String, maxHamming: Int): DataFrame = {
    val keys = graft.Checkpoints.checkpointLazy(rasterKeys(s, d).toDF())
    bandedNearDupPairs(keys, maxHamming)
  }

  /** The banded candidate join on an already-keyed (doc_id, digest,
    * ahash) relation — split out so the pigeonhole guarantee is
    * testable on adversarial hashes (bit 63 set, hamming 1–7) without
    * routing through the codec.
    */
  def bandedNearDupPairs(keys: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming <= 7, "8 bands preserve answers only to hamming 7")
    val bands = keys.select(col("doc_id"), col("digest"), col("ahash"),
      explode(expr(
        // unsigned bitfield extraction: div/% would mangle the 8-bit
        // fields whenever bit 63 is set (negative long), silently
        // voiding the pigeonhole recall guarantee for those hashes.
        "transform(sequence(0, 7), b -> struct(b AS band, " +
          "shiftrightunsigned(ahash, b * 8) & 255L AS bval))")).as("e"))
      .select(col("doc_id"), col("digest"), col("ahash"),
        col("e.band"), col("e.bval"))
    val a = bands.select(col("band"), col("bval"),
      col("doc_id").as("doc_a"), col("digest").as("dig_a"), col("ahash").as("ah_a"))
    val b = bands.select(col("band").as("band_b"), col("bval").as("bval_b"),
      col("doc_id").as("doc_b"), col("digest").as("dig_b"), col("ahash").as("ah_b"))
    a.join(b, col("band") === col("band_b") && col("bval") === col("bval_b") &&
        col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("dig_a"), col("dig_b"),
        col("ah_a"), col("ah_b"))
      .distinct()
      .withColumn("hamming", expr("bit_count(ah_a ^ ah_b)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"),
        (col("dig_a") === col("dig_b")).as("exact"))
      .orderBy("doc_a", "doc_b")
  }

  /** q191's per-partition histogram row: one of 16 bins with its red /
    * green pixel counts from this partition's decoded rasters.
    */
  final case class HistBins(bin: Long, n_red: Long, n_green: Long)

  /** q191: corpus-wide 16-bin channel histogram over decoded pixels.
    * Per-partition codec boundary (q149's posture); the per-partition
    * fold emits 16 rows regardless of pixel count.
    */
  def channelHistogram(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaRecords(s, d)
      .mapPartitions { it =>
        val nr = new Array[Long](16)
        val ng = new Array[Long](16)
        it.foreach { r0 =>
          val (w, h, px) =
            decodeRaster(gradientPng(r0.doc_id, r0.blob.length))
          require(w > 0 && h > 0)
          var i = 0
          while (i < px.length) {
            val rgb = px(i)
            nr(((rgb >> 16) & 0xff) / 16) += 1
            ng(((rgb >> 8) & 0xff) / 16) += 1
            i += 1
          }
        }
        (0 until 16).iterator.map(b => HistBins(b.toLong, nr(b), ng(b)))
      }
      .toDF()
      .groupBy(col("bin"))
      .agg(sum(col("n_red")).as("n_red"), sum(col("n_green")).as("n_green"))
      .orderBy("bin")
  }

  def pixelDecode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaRecords(s, d)
      .mapPartitions { it =>
        it.map { r => gradientPng(r.doc_id, r.blob.length) }
      }
      .mapPartitions { it =>
        imageIoInMemory()
        it.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.blob))
          val (w, h) = (img.getWidth, img.getHeight)
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          var (sr, sg) = (0L, 0L)
          var i = 0
          while (i < px.length) {
            val rgb = px(i)
            sr += (rgb >> 16) & 0xff
            sg += (rgb >> 8) & 0xff
            i += 1
          }
          PixelStats(r.doc_id, w, h, sr, sg)
        }
      }
      .toDF()
      .select(col("doc_id"), col("width"), col("height"),
        col("sum_red"), col("sum_green"),
        (col("sum_red").cast("double") /
          (col("width") * col("height")).cast("double")).as("mean_red"),
        (col("sum_green").cast("double") /
          (col("width") * col("height")).cast("double")).as("mean_green"))
      .orderBy("doc_id")
  }
}
