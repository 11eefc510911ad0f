package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.{ByteBuffer, ByteOrder}

/** Multimodal-column plumbing (LLM-pipeline north star): image/audio/
  * video payloads ride as opaque `binary` columns with typed metadata;
  * decode/feature-extract/resize/frame-sample run as partition-local
  * batch transforms.
  *
  * Codec reality (r15): PNG decode is REAL — [[RealCodec]] wires
  * `javax.imageio` (shipped with the JDK) behind the [[Codec]] seam
  * for probe/decodeFrame/embed. Audio/video stay env-gated: no such
  * library exists in this container, so [[StubCodec]] remains the
  * deterministic fake over a self-describing synthetic header that
  * keeps every stage of the Spark plumbing (schema, batching,
  * partition locality, output shape) executable and tested for those
  * modalities. Swapping codecs changes no Spark code.
  *
  * Scale notes: all transforms are `mapPartitions` — codec state
  * (decoder contexts, model weights) initializes once per partition,
  * not per row, which is the point of batch-shaped UDFs. Payloads
  * never shuffle unless the caller repartitions; metadata-only plans
  * prune the binary column at the parquet scan.
  */
object MediaOps {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaMeta(media_id: Long, kind: String, width: Int, height: Int,
                       sample_rate: Int, n_frames: Int, n_bytes: Long)
  case class MediaFeature(media_id: Long, feature: Array[Float])
  case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Synthetic self-describing payload: magic "GRFT", then width,
    * height, sampleRate, nFrames (LE int32 each), then body bytes.
    * Stands in for a real container format in tests. */
  def syntheticPayload(width: Int, height: Int, sampleRate: Int,
                       nFrames: Int, body: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 16 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("GRFT".getBytes("ASCII"))
    buf.putInt(width); buf.putInt(height); buf.putInt(sampleRate); buf.putInt(nFrames)
    buf.put(body)
    buf.array()
  }

  /** The codec boundary. A production build implements this with real
    * decoders; the container has none, so the deterministic stub below
    * is the only implementation. */
  trait Codec {
    def probe(payload: Array[Byte]): (Int, Int, Int, Int) // w, h, rate, frames
    def decodeFrame(payload: Array[Byte], idx: Int): Array[Byte]
    def embed(payload: Array[Byte], dim: Int): Array[Float]
  }

  /** STUB — deterministic fake over the synthetic header. A real
    * implementation would call the platform codec here (`???` marks
    * the boundary in [[RealCodec]]). */
  object StubCodec extends Codec with Serializable {
    private def header(p: Array[Byte]): ByteBuffer = {
      require(p.length >= 20 && p(0) == 'G' && p(1) == 'R' && p(2) == 'F' && p(3) == 'T',
        "not a GRFT synthetic payload")
      ByteBuffer.wrap(p, 4, 16).order(ByteOrder.LITTLE_ENDIAN)
    }
    override def probe(p: Array[Byte]): (Int, Int, Int, Int) = {
      val h = header(p); (h.getInt, h.getInt, h.getInt, h.getInt)
    }
    override def decodeFrame(p: Array[Byte], idx: Int): Array[Byte] = {
      val (_, _, _, nFrames) = probe(p)
      require(idx >= 0 && idx < nFrames, s"frame $idx out of $nFrames")
      val body = p.drop(20)
      val sz = math.max(1, body.length / math.max(1, nFrames))
      body.slice(idx * sz, math.min(body.length, (idx + 1) * sz))
    }
    override def embed(p: Array[Byte], dim: Int): Array[Float] = {
      // deterministic byte-histogram projection — a stand-in embedding
      val out = new Array[Float](dim)
      p.drop(20).foreach(b => out((b & 0xff) % dim) += 1.0f)
      val n = math.sqrt(out.map(x => x.toDouble * x).sum)
      if (n > 0) out.map(x => (x / n).toFloat) else out
    }
  }

  /** REAL codec for PNG stills via `javax.imageio` (r15 — the JDK
    * ships the PNG reader, proven in this JVM by MediaHllSpec; before
    * this round the object was the repo's one `???` boundary).
    * `probe` is the header-only IHDR parse ([[PngCodec]] — no pixel
    * decode); `decodeFrame` decodes the raster and returns row-major
    * packed RGBA bytes (PNG is single-frame, so only index 0 exists);
    * `embed` pools the raster into a dim-bucket integer-luma
    * histogram, L2-normalized — a deterministic pixel-space feature
    * (integer ITU-R 601 luma, no float path). Bit-stability across
    * JVMs (ADVICE r15 #3): 8-bit component RGB/RGBA and grayscale
    * rasters — every PNG the fixtures or ImageIO write — are read as
    * RAW raster samples (`Raster.getSample`), which bypasses
    * ColorModel/ICC color management entirely, so the claim holds even
    * for ICC-tagged payloads. Exotic layouts (palette-indexed, 16-bit
    * channels) fall back to `getRGB`, where color-management
    * conversion applies and bit-stability is only guaranteed for
    * untagged sRGB-like payloads. Audio/video containers stay
    * env-gated: the container
    * ships no other decoder, and wiring javacpp-ffmpeg here changes
    * no Spark code — the [[Codec]] seam is the point. */
  object RealCodec extends Codec with Serializable {
    private def image(p: Array[Byte]): java.awt.image.BufferedImage = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
      require(img != null, "payload is not an image this JVM decodes (PNG expected)")
      img
    }
    /** Per-pixel (r, g, b, a) reader. For 8-bit-component,
      * non-premultiplied RGB/RGBA and grayscale rasters the samples are
      * read directly off the Raster (band index = component index, so
      * band 0 is red even in BGR-interleaved storage) — no
      * ColorModel/ICC conversion touches the values, which is what
      * makes the integer pixel path bit-stable across JVM versions and
      * platforms. Palette-indexed images (raster sample = palette
      * index, not a component) and 16-bit channels fall back to
      * `getRGB`, which converts through the color model. */
    private def pixelReader(img: java.awt.image.BufferedImage): (Int, Int) => (Int, Int, Int, Int) = {
      val cm = img.getColorModel
      val raster = img.getRaster
      val bands = raster.getNumBands
      val eightBit = (0 until cm.getNumComponents).forall(cm.getComponentSize(_) == 8)
      val indexed = cm.isInstanceOf[java.awt.image.IndexColorModel]
      val csType = cm.getColorSpace.getType
      if (!indexed && eightBit && !cm.isAlphaPremultiplied &&
          csType == java.awt.color.ColorSpace.TYPE_RGB && bands >= 3)
        (x, y) => (raster.getSample(x, y, 0), raster.getSample(x, y, 1),
          raster.getSample(x, y, 2),
          if (bands >= 4) raster.getSample(x, y, 3) else 255)
      else if (!indexed && eightBit && !cm.isAlphaPremultiplied &&
               csType == java.awt.color.ColorSpace.TYPE_GRAY)
        (x, y) => { val g = raster.getSample(x, y, 0)
          (g, g, g, if (bands >= 2) raster.getSample(x, y, 1) else 255) }
      else
        (x, y) => { val argb = img.getRGB(x, y)
          ((argb >> 16) & 0xff, (argb >> 8) & 0xff, argb & 0xff, (argb >>> 24) & 0xff) }
    }
    override def probe(payload: Array[Byte]): (Int, Int, Int, Int) = {
      val (w, h, _, _) = PngCodec.probe(payload)
      (w, h, 0, 1) // stills: no sample rate, exactly one frame
    }
    override def decodeFrame(payload: Array[Byte], idx: Int): Array[Byte] = {
      require(idx == 0, s"PNG has exactly one frame, got index $idx")
      val img = image(payload)
      val px = pixelReader(img)
      val w = img.getWidth; val h = img.getHeight
      val out = new Array[Byte](w * h * 4)
      var i = 0; var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val (r, g, b, a) = px(x, y)
          out(i) = r.toByte
          out(i + 1) = g.toByte
          out(i + 2) = b.toByte
          out(i + 3) = a.toByte
          i += 4; x += 1
        }
        y += 1
      }
      out
    }
    override def embed(payload: Array[Byte], dim: Int): Array[Float] = {
      val img = image(payload)
      val px = pixelReader(img)
      val out = new Array[Float](dim)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val (r, g, b, _) = px(x, y)
          val lum = (299 * r + 587 * g + 114 * b) / 1000
          out(lum * dim / 256) += 1.0f
          x += 1
        }
        y += 1
      }
      val n = math.sqrt(out.map(v => v.toDouble * v).sum)
      if (n > 0) out.map(v => (v / n).toFloat) else out
    }
  }

  /** REAL metadata probe for PNG payloads — unlike pixel decode, the
    * metadata parse needs NO image library: the 8-byte signature and
    * the fixed-offset big-endian IHDR fields (width/height at bytes
    * 16/20, bit depth/color type at 24/25 — public PNG spec, RFC
    * 2083 §3) are the whole job. This is the piece of the multimodal
    * decode story that is genuinely implemented rather than stubbed;
    * MediaHllSpec proves it on a REAL ImageIO-written PNG. */
  object PngCodec {
    val Signature: Array[Byte] =
      Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte, 0x0d, 0x0a, 0x1a, 0x0a)

    /** (width, height, bitDepth, colorType); rejects non-PNG bytes. */
    def probe(p: Array[Byte]): (Int, Int, Int, Int) = {
      require(p.length >= 26 && p.view.take(8).sameElements(Signature), "not a PNG")
      val b = ByteBuffer.wrap(p, 16, 10).order(ByteOrder.BIG_ENDIAN)
      (b.getInt, b.getInt, b.get() & 0xff, b.get() & 0xff)
    }
  }

  /** The same IHDR parse as [[PngCodec.probe]], expressed as codegen'd
    * Catalyst column functions (binary substring → hex → conv) so it
    * runs distributed inside whole-stage codegen, no UDF. Shared by
    * the declared key and the real-PNG spec so one set of expressions
    * is proven against both synthetic and ImageIO-written payloads. */
  def pngMeta(df: DataFrame, payloadCol: String): DataFrame = {
    val p = col(payloadCol)
    df.select(
      col("*"),
      (hex(substring(p, 1, 8)) === lit("89504E470D0A1A0A")).as("is_png"),
      conv(hex(substring(p, 17, 4)), 16, 10).cast("long").as("width"),
      conv(hex(substring(p, 21, 4)), 16, 10).cast("long").as("height"),
      conv(hex(substring(p, 25, 1)), 16, 10).cast("int").as("bit_depth"),
      conv(hex(substring(p, 26, 1)), 16, 10).cast("int").as("color_type"),
      length(p).as("n_bytes"))
  }

  /** DECLARED media-metadata key: build a PNG header per document
    * (signature + IHDR with dimensions derived from doc_id), then
    * parse it back with [[pngMeta]]'s binary expressions — the
    * metadata-extraction stage of an image-curation pipeline as a
    * zero-shuffle codegen'd projection (scan → project → sort). The
    * oracle recomputes the expected fields from doc_id arithmetic, so
    * a single flipped byte anywhere in the build/parse round-trip
    * fails the hash. Payload bytes never shuffle; only parsed integers
    * reach the presentation sort. */
  def qMediaMeta(spark: SparkSession, dir: String): DataFrame = {
    val d = graft.Tables.documents(spark, dir).select(
      col("doc_id"),
      (lit(16) + pmod(col("doc_id"), lit(1024))).cast("int").as("w"),
      (lit(16) + pmod(col("doc_id") * 7, lit(768))).cast("int").as("h"))
    val png = d.withColumn("payload", concat(
      unhex(lit("89504E470D0A1A0A")), // signature
      unhex(lit("0000000D49484452")), // IHDR length 13 + chunk type
      unhex(lpad(hex(col("w")), 8, "0")),
      unhex(lpad(hex(col("h")), 8, "0")),
      unhex(lit("0806000000")))) // 8-bit RGBA, deflate/adam7 defaults
    pngMeta(png, "payload")
      .select(col("doc_id"), col("is_png"), col("width"), col("height"),
        col("bit_depth"), col("color_type"), col("n_bytes"))
      .orderBy(col("doc_id"))
      .limit(300)
  }

  /** Metadata extraction: one codec probe per row, partition-local. */
  def probeAll(media: Dataset[MediaRow], codec: Codec = StubCodec): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, rate, frames) = codec.probe(r.payload)
        MediaMeta(r.media_id, r.kind, w, h, rate, frames, r.payload.length.toLong)
      }
    }
  }

  /** Frame sampling for video-kind payloads: every `stride`-th frame. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int,
                   codec: Codec = StubCodec): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val (_, _, _, nFrames) = codec.probe(r.payload)
        (0 until nFrames by stride).iterator
          .map(i => Frame(r.media_id, i, codec.decodeFrame(r.payload, i)))
      }
    }
  }

  /** Feature extraction to a fixed-dim float vector — the column shape
    * every similarity operator (VectorOps) consumes. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 64,
                      codec: Codec = StubCodec): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions(rows => rows.map(r => MediaFeature(r.media_id, codec.embed(r.payload, dim))))
  }

  /** Metadata-only projection from a parquet media table: the binary
    * column must be pruned at the scan (asserted in spec). */
  def metaOnly(spark: SparkSession, mediaParquet: String): DataFrame =
    spark.read.parquet(mediaParquet).select(col("media_id"), col("kind"))

  /** DECLARED binary-payload key (the oracle-verifiable slice of the
    * multimodal story): documents' text encoded to an opaque binary
    * payload column, then per source the payload count, total byte
    * size, DISTINCT-content count (exact content-hash dedup over
    * binary — the media-file dedup primitive), and the minimum
    * content hash as a stable fingerprint. Proves binary columns flow
    * scan → project → aggregate with byte-exact semantics: Spark
    * md5/base64 run over the payload BYTES and DuckDB's VARCHAR md5
    * hashes the same UTF-8 bytes, so the hashes — and therefore the
    * dedup counts — must agree bit-for-bit. Payloads never shuffle:
    * the agg ships 32-char hashes, not bytes (the SCALE.md rule for
    * 100 TB media tables). */
  def qBinaryPayload(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.documents(spark, dir)
      .select(col("source"),
        encode(col("text"), "UTF-8").as("payload"))
      .select(col("source"), length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("content_hash"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_payloads"),
        sum(col("n_bytes")).cast("long").as("total_bytes"),
        countDistinct(col("content_hash")).as("n_distinct"),
        min(col("content_hash")).as("min_hash"))
      .orderBy(col("source"))
  }
}
