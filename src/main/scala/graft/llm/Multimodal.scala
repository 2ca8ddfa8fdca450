package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `BINARY`
  * payloads with typed metadata, processed by per-partition batch
  * decoders. The Spark-side contract — schema, partitioning, batch
  * iteration shape — is real; the codec itself is STUBBED with a
  * deterministic fake (media libraries are not in this container), so
  * swapping in a real decoder changes one function.
  *
  * Scale notes: payloads never pass through a shuffle here — decode is
  * a narrow `mapPartitions` over the scan; only the small extracted
  * feature rows continue down the pipeline. At 100 TB the payload
  * column stays in parquet (never collected), and per-file row-group
  * sizing (`spark.sql.files.maxPartitionBytes`) bounds executor
  * memory per batch.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features (what a real image/audio decoder would emit).
    * `width`/`height` are None for payloads no codec can decode —
    * honest nulls, never fabricated dimensions (a plausible-looking
    * fake would silently poison any consumer that trusts it).
    */
  final case class MediaFeatures(media_id: Long, kind: String,
                                 n_bytes: Int, checksum: Long,
                                 width: Option[Int], height: Option[Int])

  /** Build a deterministic synthetic media table from the documents
    * fixture: payload = utf-8 bytes of (source ':' doc_id), kind
    * cycles image/audio/video.
    */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(concat(col("source"), lit(":"), col("doc_id")), "utf-8").as("payload"))

  /** JPEG dimensions from the first SOF0/1/2 frame header — a pure
    * marker walk over the byte stream, no entropy decode. Returns
    * None on desync, truncation, or SOS/EOI before any SOF.
    */
  def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None // marker desync
      val marker = b(i + 1) & 0xff
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) i += 2 // standalone
      else if (marker == 0xd9 || marker == 0xda) return None // EOI/SOS before SOF
      else {
        val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
        if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
          if (i + 8 >= b.length) return None
          val h = ((b(i + 5) & 0xff) << 8) | (b(i + 6) & 0xff)
          val w = ((b(i + 7) & 0xff) << 8) | (b(i + 8) & 0xff)
          return Some((w, h))
        }
        i += 2 + len
      }
    }
    None
  }

  /** Decoder: PNG payloads (signature-detected) are REALLY decoded —
    * width/height from IHDR, checksum over the decoded pixels — via
    * the pure-JDK [[graft.sources.Png]] codec; JPEG dimensions come
    * from the SOF marker walk ([[jpegDims]]). Every other payload
    * kind (PCM audio, video containers: codecs not in this container)
    * is the declared stub: byte-level checksum, NULL dimensions —
    * never fabricated values. The per-partition batch shape is
    * identical either way, so swapping in real codecs changes only
    * this function.
    */
  private def decodeStub(r: MediaRow): MediaFeatures = {
    val isPng = r.payload.length > 8 &&
      (r.payload(0) & 0xff) == 0x89 && r.payload(1) == 'P' &&
      r.payload(2) == 'N' && r.payload(3) == 'G'
    // a signature-matching but corrupt payload must yield honest NULL
    // dims + the raw-byte checksum, never a task failure — but ONLY
    // for the exception set the hardened decoder actually throws on
    // malformed input (the PngSpec fuzz contract); anything else is a
    // genuine decoder defect and must surface
    val decoded = if (isPng)
      try Some(graft.sources.Png.decode(r.payload)) catch {
        case _: IllegalArgumentException          => None
        case _: ArrayIndexOutOfBoundsException    => None
        case _: NegativeArraySizeException        => None
        case _: java.util.zip.DataFormatException => None
      }
    else None
    decoded match {
      case Some((w, h, pix)) =>
        val sum = pix.foldLeft(0L)((acc, p) => (acc * 31 + (p & 0xffffffffL)) % 1000000007L)
        MediaFeatures(r.media_id, r.kind, r.payload.length, sum, Some(w), Some(h))
      case None =>
        decodeNonPng(r)
    }
  }

  private def decodeNonPng(r: MediaRow): MediaFeatures = {
    val sum = r.payload.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)
    val dims = jpegDims(r.payload)
    MediaFeatures(r.media_id, r.kind, r.payload.length, sum,
      width = dims.map(_._1), height = dims.map(_._2))
  }

  /** Feature extraction: narrow per-partition map over the media
    * table (no shuffle; payloads die here).
    */
  def extractFeatures(media: DataFrame)(implicit s: SparkSession): Dataset[MediaFeatures] = {
    import s.implicits._
    media.as[MediaRow].mapPartitions(_.map(decodeStub))
  }

  /** A thumbnail row: source dims + the re-encoded PNG thumbnail.
    * All-None for payloads no codec decodes (honest nulls again).
    */
  final case class MediaThumb(media_id: Long, kind: String,
                              width: Option[Int], height: Option[Int],
                              thumb_w: Option[Int], thumb_h: Option[Int],
                              thumb: Option[Array[Byte]])

  /** REAL image resize (the training-pipeline `resize` step): decode
    * PNG via the pure-JDK codec or JPEG via the JDK ImageIO reader,
    * downscale with DETERMINISTIC nearest-neighbor center sampling
    * (no AWT interpolation — identical bytes on every run/JVM), and
    * re-encode as PNG. Never upscales; non-image payloads → None.
    */
  def thumbnailOf(payload: Array[Byte], maxDim: Int): Option[(Int, Int, Int, Int, Array[Byte])] = {
    require(maxDim > 0, "maxDim must be positive")
    decodeImage(payload).map { case (w, h, pix) =>
      val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
      val tw = math.max(1, math.floor(w * scale).toInt)
      val th = math.max(1, math.floor(h * scale).toInt)
      val out = new Array[Int](tw * th)
      var y = 0
      while (y < th) {
        val sy = math.min(h - 1, ((y + 0.5) * h / th).toInt)
        var x = 0
        while (x < tw) {
          val sx = math.min(w - 1, ((x + 0.5) * w / tw).toInt)
          out(y * tw + x) = pix(sy * w + sx)
          x += 1
        }
        y += 1
      }
      (w, h, tw, th, graft.sources.Png.encode(tw, th, out))
    }
  }

  /** Thumbnail extraction over the media table — same narrow
    * per-partition batch shape as [[extractFeatures]] (no shuffle;
    * full-size payloads die in the map, only thumbnails continue).
    */
  def thumbnails(media: DataFrame, maxDim: Int)
                (implicit s: SparkSession): Dataset[MediaThumb] = {
    import s.implicits._
    media.as[MediaRow].mapPartitions(_.map { r =>
      thumbnailOf(r.payload, maxDim) match {
        case Some((w, h, tw, th, png)) =>
          MediaThumb(r.media_id, r.kind, Some(w), Some(h), Some(tw), Some(th), Some(png))
        case None =>
          MediaThumb(r.media_id, r.kind, None, None, None, None, None)
      }
    })
  }

  /** 64-bit perceptual average-hash (aHash) of an image payload: the
    * decoded image sampled to an 8×8 luma grid (nearest-center, the
    * [[thumbnailOf]] convention), bit k set iff cell k's luma exceeds
    * the grid mean. Compared via `luma·64 > Σluma` in exact integers —
    * no rounding seam — which makes the hash INVARIANT under uniform
    * brightness shifts (the mean shifts identically), the property
    * that lets it catch re-encoded/re-leveled copies byte hashes
    * miss. None for undecodable payloads.
    */
  def aHashOf(payload: Array[Byte]): Option[Long] =
    decodeImage(payload).map { case (w, h, pix) =>
      val luma = new Array[Long](64)
      var i = 0
      while (i < 64) {
        val sy = math.min(h - 1, ((i / 8 + 0.5) * h / 8).toInt)
        val sx = math.min(w - 1, ((i % 8 + 0.5) * w / 8).toInt)
        val p = pix(sy * w + sx)
        luma(i) = (299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff)
          + 114L * (p & 0xff)) / 1000L
        i += 1
      }
      val sum = luma.sum
      (0 until 64).foldLeft(0L)((acc, k) =>
        if (luma(k) * 64L > sum) acc | (1L << k) else acc)
    }

  /** Shared image decode (PNG via the in-repo codec, JPEG via
    * ImageIO) — the [[thumbnailOf]] front half, factored for reuse.
    */
  private def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    val isPng = payload.length > 8 &&
      (payload(0) & 0xff) == 0x89 && payload(1) == 'P' &&
      payload(2) == 'N' && payload(3) == 'G'
    val isJpeg = payload.length > 2 &&
      (payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8
    if (isPng)
      try { val (w, h, pix) = graft.sources.Png.decode(payload); Some((w, h, pix)) }
      catch { case _: Exception => None }
    else if (isJpeg)
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        if (img == null) None
        else Some((img.getWidth, img.getHeight,
          img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)))
      } catch { case _: Exception => None }
    else None
  }

  /** An image-hash bucket row: hash, multiplicity, kept id. */
  final case class HashBucket(ahash: Long, n_images: Long, keep_id: Long)

  /** Perceptual-hash image dedup: aHash per payload on the executors
    * (payloads never shuffle — only the 8-byte hash and id continue),
    * one hash aggregation for the duplicate buckets. The visual
    * sibling of exact dedup; at 100 TB this is the standard
    * image-corpus dedup pass (hash at ingest, bucket at rest).
    */
  def imageHashBuckets(media: DataFrame)
                      (implicit s: SparkSession): DataFrame = {
    import s.implicits._
    media.as[MediaRow]
      .mapPartitions(_.flatMap(r =>
        aHashOf(r.payload).map(h => (r.media_id, h))))
      .toDF("media_id", "ahash")
      .groupBy("ahash")
      .agg(count(lit(1)).as("n_images"), min(col("media_id")).as("keep_id"))
      .filter(col("n_images") > 1)
  }

  /** Deterministic PNG media fixture over the documents table: 16×16
    * patterns keyed by `doc_id mod 7`, with odd ids uniformly
    * brightness-shifted (+24 per channel, clamped below saturation) —
    * byte-distinct from their even siblings but aHash-identical, the
    * invariance [[aHashOf]] exists to demonstrate.
    */
  def syntheticPngMedia(docs: DataFrame)(implicit s: SparkSession): DataFrame = {
    import s.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions(_.map { id =>
      val k = (id % 7).toInt
      val shift = if (id % 2 == 1) 24 else 0
      val pix = Array.tabulate(16 * 16) { i =>
        val x = i % 16; val y = i / 16
        // pattern values stay ≤ 192 so the +24 shift never clips
        val v = ((x * (k + 3) + y * (2 * k + 5)) % 7) * 32 + shift
        0xff000000 | (v << 16) | (v << 8) | v
      }
      MediaRow(id, "image/png", graft.sources.Png.encode(16, 16, pix))
    }).toDF()
  }

  /** Frame-sampling plumbing for video-like payloads: fan one payload
    * out to `n` frame rows (UDTF/generator shape) — the decode of each
    * frame is again the stub.
    */
  def sampleFrames(media: DataFrame, n: Int)(implicit s: SparkSession): DataFrame =
    media.select(col("media_id"), col("kind"),
        posexplode(transform(sequence(lit(0), lit(n - 1)),
          i => substring(base64(col("payload")), lit(1), i * 4 + 4))).as(Seq("frame_no", "frame_b64")))
      .withColumn("frame_len", length(col("frame_b64")))
}
