package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus decode / feature-extract / frame-sample stages.
  *
  * The decodes are REAL, pure-JVM, no codec library: uncompressed 24-bit
  * BMP, 8-bit RGB PNG (CRC-verified chunk walk, zlib IDAT, all five
  * scanline filters), palette GIF (LSB-first variable-width LZW,
  * interlace remap), RIFF/PCM WAV, and RIFF AVI (nested LISTs, raw BGR
  * frames). The transform stages (bilinear resize, audio resample,
  * per-image stats, scene cuts) operate on those real decodes; the only
  * remaining external seam is the VLM forward pass (ingest/VisualCaption).
  * Everything Spark-side is real: binary column schema, mapPartitions
  * batch shape, frame-range arithmetic, and the partitioning-friendly
  * layout (payload stays columnar, metadata is a pruned struct — a scan
  * that only needs metadata never reads payload bytes at 100 TB).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("source", StringType, nullable = false),
      StructField("bytes", LongType, nullable = false),
      StructField("codec", StringType, nullable = false))), nullable = false)))

  /** derive a media table from a text corpus (payload = utf8 bytes — a
    * deterministic stand-in for real image/audio bytes) */
  def fromDocuments(docs: DataFrame, idCol: String, textCol: String,
                    sourceCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col(idCol) % 3 + 1).cast("int")).as("modality"),
      col(textCol).cast("binary").as("payload"),
      struct(
        col(sourceCol).as("source"),
        length(col(textCol).cast("binary")).cast("long").as("bytes"),
        lit("raw/v1").as("codec")).as("meta"))

  // ------------------------------------------------------------- resize --

  /** REAL bilinear image resize over uncompressed 24-bit BMP payloads.
    * Pure integer fixed-point arithmetic (8.8 weights, round-half
    * -up at 16.16), align-corners source mapping — so the result is exactly
    * reproducible by a SQL oracle and bit-stable across JVMs/locales:
    *
    *   fx = dx * (w - 1) * 256 / (ow - 1)   (integer division; 0 when ow=1)
    *   x0 = fx / 256, xf = fx % 256, x1 = min(x0 + 1, w - 1)
    *   out = (Σ corner * weight + 32768) / 65536   per channel
    *
    * Identity property: ow = w, oh = h reproduces the source pixels exactly
    * (all fractional weights are then zero) — spec-gated. Returns a new
    * well-formed bottom-up 24-bit BMP, so the output feeds [[decodeBmp]]
    * and any downstream image stage unchanged. */
  private[graft] def resizeBmpBilinear(bytes: Array[Byte], ow: Int, oh: Int): Array[Byte] = {
    require(ow >= 1 && oh >= 1, "target dims must be >= 1")
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 54 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte,
      "not a BMP payload")
    val dataOffset = bb.getInt(10)
    val w = bb.getInt(18)
    val hRaw = bb.getInt(22)
    val bottomUp = hRaw > 0
    val h = math.abs(hRaw)
    require(bb.getShort(28) == 24, "24-bit only")
    require(bb.getInt(30) == 0, "BI_RGB only")
    val srcStride = ((3 * w + 3) / 4) * 4
    require(bytes.length >= dataOffset + srcStride * h, "truncated pixel data")
    // channel accessor in image coordinates (y = 0 is the top row)
    def ch(x: Int, y: Int, c: Int): Int = {
      val row = if (bottomUp) h - 1 - y else y
      bytes(dataOffset + row * srcStride + 3 * x + c) & 0xff
    }
    val outStride = ((3 * ow + 3) / 4) * 4
    val out = java.nio.ByteBuffer.allocate(54 + outStride * oh)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte)
    out.putInt(54 + outStride * oh).putInt(0).putInt(54)
    out.putInt(40).putInt(ow).putInt(oh) // positive height: bottom-up
    out.putShort(1).putShort(24)
    out.putInt(0).putInt(outStride * oh)
    out.putInt(2835).putInt(2835).putInt(0).putInt(0)
    var storedRow = 0
    while (storedRow < oh) {
      val dy = oh - 1 - storedRow // bottom-up writer
      // Long fixed-point: dx·(w−1)·256 overflows Int around ~2900px dims
      val fy = if (oh == 1) 0L else dy.toLong * (h - 1) * 256 / (oh - 1)
      val y0 = (fy / 256).toInt; val yf = (fy % 256).toInt
      val y1 = math.min(y0 + 1, h - 1)
      var dx = 0
      while (dx < ow) {
        val fx = if (ow == 1) 0L else dx.toLong * (w - 1) * 256 / (ow - 1)
        val x0 = (fx / 256).toInt; val xf = (fx % 256).toInt
        val x1 = math.min(x0 + 1, w - 1)
        var c = 0
        while (c < 3) { // stored B, G, R order
          val v = ((256 - xf) * (256 - yf) * ch(x0, y0, c) +
                   xf * (256 - yf) * ch(x1, y0, c) +
                   (256 - xf) * yf * ch(x0, y1, c) +
                   xf * yf * ch(x1, y1, c) + 32768) / 65536
          out.put(v.toByte)
          c += 1
        }
        dx += 1
      }
      var pad = outStride - 3 * ow
      while (pad > 0) { out.put(0.toByte); pad -= 1 }
      storedRow += 1
    }
    out.array()
  }

  /** Distributed resize stage: per-row target dims derived from media_id
    * (callers pass closed-form rules so an oracle can replay them). Pure
    * map — no shuffle; payload in, resized payload out, meta updated. The
    * 100 TB shape: resize cost is linear in output pixels and perfectly
    * partition-parallel. */
  def resizeBmp(media: DataFrame, owOf: Long => Int, ohOf: Long => Int): DataFrame = {
    val idIdx = media.schema.fieldIndex("media_id")
    val modIdx = media.schema.fieldIndex("modality")
    val payloadIdx = media.schema.fieldIndex("payload")
    val metaIdx = media.schema.fieldIndex("meta")
    media.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val resized = resizeBmpBilinear(
          r.getAs[Array[Byte]](payloadIdx), owOf(id), ohOf(id))
        val meta = r.getStruct(metaIdx)
        Row(id, r.getString(modIdx), resized,
          Row(meta.getString(0), resized.length.toLong,
            meta.getString(2) + ";bilinear"))
      }
    }(Encoders.row(mediaSchema))
  }

  /** Grayscale 8×8 BMP fixture with per-image PSEUDO-RANDOM texture:
    * v(x, y) = first byte of md5("key:x:y") — portable across engines (the
    * same rule a SQL oracle computes with substr(md5(…), 1, 2)). Unlike
    * [[encodeBmp]]'s fixed-direction gradient (whose dHash sign pattern is
    * near-identical for every key — all right-neighbors brighter),
    * independent per-pixel bytes give DIVERSE difference hashes: distinct
    * keys land ≥ ~12 hamming apart, so a ≤ 6 threshold separates real
    * duplicates from noise. `perturb` flips one pixel by +128 (x=2, y=4) —
    * a controlled near-duplicate 1–2 hamming away from its unperturbed
    * twin, exercising the verify stage's in-band distances. r = g = b ⇒
    * integer luma = v exactly. */
  private[graft] def encodeBmpGray(key: Long, perturb: Boolean = false): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val w = 8; val h = 8
    val stride = 24 // 3*8, already 4-aligned
    val buf = java.nio.ByteBuffer.allocate(54 + stride * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + stride * h).putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    buf.putInt(0).putInt(stride * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var sr = 0
    while (sr < h) {
      val y = h - 1 - sr
      var x = 0
      while (x < w) {
        val base = md.digest(s"$key:$x:$y".getBytes("UTF-8"))(0) & 0xff
        val v = if (perturb && x == 2 && y == 4) (base + 128) % 256 else base
        buf.put(v.toByte); buf.put(v.toByte); buf.put(v.toByte)
        x += 1
      }
      sr += 1
    }
    buf.array()
  }

  /** 56-bit difference hash (dHash) — the perceptual near-dup key for
    * images, feeding the same downstream machinery as simhash/minhash:
    * exact-match grouping, or hamming-banded pair joins at scale. Bilinear-
    * resize to an 8×8 luma grid ([[resizeBmpBilinear]] — integer-exact, so
    * the hash is oracle-replayable), then bit (x, y) = 1 iff
    * luma(x+1, y) > luma(x, y): 7 comparisons × 8 rows = 56 bits, packed
    * as Σ 2^(y·7+x) — deliberately < 2^63 so the value is a plain BIGINT
    * in every engine. Robust to scale/brightness-preserving re-encodes;
    * any gradient flip alters exactly the crossing bits. */
  private[graft] def dhash(bytes: Array[Byte]): Long = {
    val r = resizeBmpBilinear(bytes, 8, 8)
    // our own writer's fixed layout: offset 54, stride 24 (3·8, already
    // 4-aligned), bottom-up rows, B-G-R
    def luma(x: Int, y: Int): Int = {
      val off = 54 + (7 - y) * 24 + 3 * x
      val b = r(off) & 0xff; val g = r(off + 1) & 0xff; val rr = r(off + 2) & 0xff
      (299 * rr + 587 * g + 114 * b) / 1000
    }
    var acc = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 7) {
        if (luma(x + 1, y) > luma(x, y)) acc |= 1L << (y * 7 + x)
        x += 1
      }
      y += 1
    }
    acc
  }

  /** dHash over an arbitrary LUMA plane — the single-channel twin of
    * [[dhash]] for sources that decode straight to luma (PDF-embedded
    * images, JPEG Y planes): fixed-point bilinear to 8×8 in luma space,
    * then the same 56-bit pack. For an 8×8 input the resample is the
    * identity, so the hash is bit-exact replayable by an oracle that
    * knows the pixel rule. (Note the channel-order difference from the
    * BMP path, which bilinears R/G/B separately THEN takes luma — the
    * two agree on 8×8 inputs and differ only by floor-rounding
    * elsewhere.) */
  private[graft] def dhashLuma(luma: Array[Int], w: Int, h: Int): Long = {
    def at(x: Int, y: Int): Int = luma(y * w + x)
    def sample(dx: Int, dy: Int): Int = {
      val fx = if (w == 1) 0 else dx * (w - 1) * 256 / 7
      val fy = if (h == 1) 0 else dy * (h - 1) * 256 / 7
      val x0 = fx >> 8; val xf = fx & 255; val x1 = math.min(x0 + 1, w - 1)
      val y0 = fy >> 8; val yf = fy & 255; val y1 = math.min(y0 + 1, h - 1)
      ((256 - xf) * (256 - yf) * at(x0, y0) + xf * (256 - yf) * at(x1, y0) +
        (256 - xf) * yf * at(x0, y1) + xf * yf * at(x1, y1) + 32768) >> 16
    }
    var acc = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      var prev = sample(0, y)
      while (x < 7) {
        val next = sample(x + 1, y)
        if (next > prev) acc |= 1L << (y * 7 + x)
        prev = next
        x += 1
      }
      y += 1
    }
    acc
  }

  /** per-image dHash features (media_id, dhash, n_bits) via mapPartitions */
  def dhashFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("dhash", LongType, nullable = false),
      StructField("n_bits", LongType, nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { it =>
      it.map { r =>
        val h = dhash(r.getAs[Array[Byte]](payloadIdx))
        Row(r.getLong(idIdx), h, java.lang.Long.bitCount(h).toLong)
      }
    }(Encoders.row(outSchema))
  }

  // ------------------------------------------------- audio fingerprint --

  /** 56-bit audio DIFFERENCE fingerprint — the dHash idea in the time
    * domain (the chromaprint/echoprint family radically simplified to
    * stay integer-exact): frame energies e(f) = Σ v² over `frame`-sample
    * windows, bit f set iff e(f) > e(f+1). Energy is a sum of squared
    * 16-bit ints (≤ ~4.3e9 per 4-sample frame — exact BIGINT both
    * engines), so every bit of every fingerprint is oracle-replayable.
    * Same downstream contract as [[dhash]]: exact-match grouping or
    * banded-hamming pair joins ([[graft.ops.Dedup.bandedHammingPairs]]),
    * 56 bits packed below 2^63. */
  private[graft] def audioFingerprint(bytes: Array[Byte], frame: Int = 4,
                                      bits: Int = 56): Long = {
    val (_, s) = wavSamples(bytes)
    val nf = bits + 1
    require(s.length >= frame * nf,
      s"audio too short for a $bits-bit fingerprint (${s.length} samples)")
    val e = new Array[Long](nf)
    var f = 0
    while (f < nf) {
      var acc = 0L
      var j = 0
      while (j < frame) { val v = s(f * frame + j).toLong; acc += v * v; j += 1 }
      e(f) = acc
      f += 1
    }
    var fp = 0L
    var b = 0
    while (b < bits) { if (e(b) > e(b + 1)) fp |= (1L << b); b += 1 }
    fp
  }

  /** per-clip fingerprint features (media_id, afp, n_bits) via
    * mapPartitions — the audio twin of [[dhashFeatures]] */
  def audioFingerprintFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("afp", LongType, nullable = false),
      StructField("n_bits", LongType, nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { it =>
      it.map { r =>
        val fp = audioFingerprint(r.getAs[Array[Byte]](payloadIdx))
        Row(r.getLong(idIdx), fp, java.lang.Long.bitCount(fp).toLong)
      }
    }(Encoders.row(outSchema))
  }

  /** Keyed near-dup WAV fixture — the audio twin of [[encodeBmpGray]]:
    * 228 samples (57 4-sample frames) whose 16-bit values follow the md5
    * rule sample(key, i) = hex16(md5("key:i")) − 32768, so colliding
    * keys carry IDENTICAL audio and the oracle recomputes every
    * fingerprint bit. `perturb` shifts sample 5 by +8192 (mod 2^16) — a
    * controlled near-duplicate whose fingerprint differs only in frame
    * 1's two comparisons (hamming ≤ 2). */
  private[graft] def encodeWavKeyed(key: Long, perturb: Boolean): Array[Byte] = {
    val n = 228
    val md = java.security.MessageDigest.getInstance("MD5")
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      val d = md.digest(s"$key:$i".getBytes("UTF-8"))
      var v = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
      if (perturb && i == 5) v = (v + 8192) % 65536
      samples(i) = (v - 32768).toShort
      md.reset()
      i += 1
    }
    encodeWavPcm(samples, 8000)
  }

  // ------------------------------------------------------ audio resample --

  /** mono 16-bit PCM samples + rate (same tolerant RIFF chunk walk as
    * [[decodeWav]], which stays a no-copy stats path — this one
    * materializes the sample array because resampling needs it) */
  private def wavSamples(bytes: Array[Byte]): (Int, Array[Short]) = {
    require(bytes.length >= 44 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE", "not a WAV payload")
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var off = 12
    var rate = -1
    var dataOff = -1
    var dataLen = -1
    while (off + 8 <= bytes.length && (rate < 0 || dataOff < 0)) {
      val id = new String(bytes, off, 4, "US-ASCII")
      val len = bb.getInt(off + 4)
      require(len >= 0 && off + 8 + len <= bytes.length, s"truncated chunk $id")
      id match {
        case "fmt " =>
          require(bb.getShort(off + 8) == 1 && bb.getShort(off + 10) == 1 &&
            bb.getShort(off + 22) == 16, "16-bit mono PCM only")
          rate = bb.getInt(off + 12)
        case "data" => dataOff = off + 8; dataLen = len
        case _      => ()
      }
      off += 8 + len + (len & 1)
    }
    require(rate > 0 && dataOff >= 0, "missing fmt/data chunk")
    val n = dataLen / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) { out(i) = bb.getShort(dataOff + 2 * i); i += 1 }
    (rate, out)
  }

  /** minimal canonical RIFF/PCM writer (16-bit mono) */
  private def encodeWavPcm(samples: Array[Short], rate: Int): Array[Byte] = {
    val dataLen = 2 * samples.length
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
    buf.putShort(2).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort(_))
    buf.array()
  }

  /** Fixed-point linear audio resample to `outRate` — the audio twin of
    * [[resizeBmpBilinear]], same 8.8 align-corners mapping and the same
    * oracle-exactness discipline. Output length m = max(2, n·outRate/inRate)
    * (integer division); sample j interpolates
    *
    *   f = j·(n−1)·256 / (m−1);  i0 = f/256, fr = f%256
    *   acc = s[i0]·(256−fr) + s[i1]·fr
    *   out = (acc ± 128) / 256   (+128 when acc ≥ 0, −128 otherwise)
    *
    * Symmetric round-half-away-from-zero via truncating division — Java's
    * `/` and DuckDB's integer `//` both truncate toward zero (DuckDB:
    * -5 // 2 = -2), so negative samples round identically in both engines,
    * and a zero-fraction tap (fr = 0) is EXACT: identity resample (m = n)
    * is lossless, constant signals stay constant. */
  private[graft] def resampleWavLinear(bytes: Array[Byte], outRate: Int): Array[Byte] = {
    require(outRate > 0, "outRate must be positive")
    val (inRate, s) = wavSamples(bytes)
    val n = s.length
    require(n >= 2, "need at least 2 samples to resample")
    val m = math.max(2L, n.toLong * outRate / inRate).toInt
    val out = new Array[Short](m)
    var j = 0
    while (j < m) {
      val f = j.toLong * (n - 1) * 256 / (m - 1)
      val i0 = (f / 256).toInt; val fr = (f % 256).toInt
      val i1 = math.min(i0 + 1, n - 1)
      val acc = s(i0).toLong * (256 - fr) + s(i1).toLong * fr
      out(j) = ((acc + (if (acc >= 0) 128 else -128)) / 256).toShort
      j += 1
    }
    encodeWavPcm(out, outRate)
  }

  /** distributed resample stage: payload in, resampled payload out, meta
    * updated — pure map, no shuffle (the 100 TB shape) */
  def resampleWav(media: DataFrame, outRate: Int): DataFrame = {
    val idIdx = media.schema.fieldIndex("media_id")
    val modIdx = media.schema.fieldIndex("modality")
    val payloadIdx = media.schema.fieldIndex("payload")
    val metaIdx = media.schema.fieldIndex("meta")
    media.mapPartitions { it =>
      it.map { r =>
        val resampled = resampleWavLinear(r.getAs[Array[Byte]](payloadIdx), outRate)
        val meta = r.getStruct(metaIdx)
        Row(r.getLong(idIdx), r.getString(modIdx), resampled,
          Row(meta.getString(0), resampled.length.toLong,
            meta.getString(2) + s";lin$outRate"))
      }
    }(Encoders.row(mediaSchema))
  }

  // --------------------------------------------------------- features --

  /** Audio feature extraction (the VAD/ASR-preprocessing basics): sample
    * count, zero-crossing count (sign-product test, integer-exact),
    * total energy Σv² (exact in 64 bits at 16-bit depth), and RMS
    * (rounded 1e-4 — the only float). Per-row map over payload bytes. */
  def audioFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("zero_crossings", LongType, nullable = false),
      StructField("energy", LongType, nullable = false),
      StructField("rms", DoubleType, nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { it =>
      it.map { r =>
        val (_, s) = wavSamples(r.getAs[Array[Byte]](payloadIdx))
        var zc = 0L; var energy = 0L
        var i = 0
        while (i < s.length) {
          val v = s(i).toLong
          energy += v * v
          if (i > 0 && s(i - 1).toLong * v < 0) zc += 1
          i += 1
        }
        // an empty (but structurally valid) data chunk yields zeros, not a
        // NaN→BigDecimal crash that would fail the whole task
        val rms = if (s.isEmpty) 0.0
          else BigDecimal(math.sqrt(energy.toDouble / s.length))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        Row(r.getLong(idIdx), s.length.toLong, zc, energy, rms)
      }
    }(Encoders.row(outSchema))
  }

  /** Image statistics (exposure/contrast screening): luma min/max/sum and
    * a 4-bin luma histogram (bin = luma/64) — all integer-exact. */
  def imageStats(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("lum_min", LongType, nullable = false),
      StructField("lum_max", LongType, nullable = false),
      StructField("lum_sum", LongType, nullable = false),
      StructField("h0", LongType, nullable = false),
      StructField("h1", LongType, nullable = false),
      StructField("h2", LongType, nullable = false),
      StructField("h3", LongType, nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val dataOffset = bb.getInt(10)
        val w = bb.getInt(18); val h = math.abs(bb.getInt(22))
        val stride = ((3 * w + 3) / 4) * 4
        var mn = 255L; var mx = 0L; var sum = 0L
        val hist = new Array[Long](4)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val off = dataOffset + y * stride + 3 * x
            val b = bytes(off) & 0xff; val g = bytes(off + 1) & 0xff
            val rr = bytes(off + 2) & 0xff
            val lum = (299 * rr + 587 * g + 114 * b) / 1000
            if (lum < mn) mn = lum
            if (lum > mx) mx = lum
            sum += lum
            hist(lum / 64) += 1
            x += 1
          }
          y += 1
        }
        Row(r.getLong(idIdx), mn, mx, sum, hist(0), hist(1), hist(2), hist(3))
      }
    }(Encoders.row(outSchema))
  }

  // ---------------------------------------------------------------- BMP --

  /** Deterministic 24-bit uncompressed BMP fixture for `docId`: dimensions
    * and every pixel are closed-form functions of (docId, x, y), so a SQL
    * oracle can compute the DECODED statistics without parsing bytes — any
    * stride/padding/row-order mistake in the parser shows up as a hash
    * mismatch. Width 4–8 (width 5 and 7 exercise the 4-byte row padding),
    * height 3–6, rows stored bottom-up as the format default. */
  private[graft] def encodeBmp(docId: Long): Array[Byte] = {
    val did = (docId % 256).toInt
    val w = (4 + docId % 5).toInt
    val h = (3 + docId % 4).toInt
    val stride = ((3 * w + 3) / 4) * 4
    val dataSize = stride * h
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte) // magic
    buf.putInt(54 + dataSize)           // file size
    buf.putInt(0)                       // reserved
    buf.putInt(54)                      // pixel data offset
    buf.putInt(40)                      // BITMAPINFOHEADER size
    buf.putInt(w).putInt(h)             // height > 0 => bottom-up
    buf.putShort(1)                     // planes
    buf.putShort(24)                    // bits per pixel
    buf.putInt(0)                       // BI_RGB (uncompressed)
    buf.putInt(dataSize)
    buf.putInt(2835).putInt(2835)       // 72 DPI
    buf.putInt(0).putInt(0)             // palette (none)
    var storedRow = 0
    while (storedRow < h) {
      val y = h - 1 - storedRow // bottom-up: first stored row is the image bottom
      var x = 0
      while (x < w) {
        buf.put((( did + 7 * x + 13 * y) % 256).toByte)       // B
        buf.put(((2 * did + 3 * x + 5 * y) % 256).toByte)     // G
        buf.put((( did + x * y) % 256).toByte)                // R
        x += 1
      }
      var pad = stride - 3 * w
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      storedRow += 1
    }
    buf.array()
  }

  final case class BmpFeatures(width: Int, height: Int, nPx: Long,
                               sumLuma: Long, probeLuma: Long)

  /** Parse an uncompressed 24-bit BMP: magic, little-endian header fields
    * (data offset, width, signed height — negative means top-down), stride
    * padded to 4 bytes, B-G-R byte order. Emits integer statistics (exact,
    * hash-stable): pixel count, summed integer luma (299R+587G+114B)/1000,
    * and the luma of probe pixel (x=1, y=2 from top-left, clamped) — the
    * probe pixel is what catches a row-order or stride bug that a
    * permutation-invariant mean would hide. */
  private[graft] def decodeBmp(bytes: Array[Byte]): BmpFeatures = {
    require(bytes.length >= 54 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte,
      "not a BMP payload")
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val dataOffset = bb.getInt(10)
    val w = bb.getInt(18)
    val hRaw = bb.getInt(22)
    val bottomUp = hRaw > 0
    val h = math.abs(hRaw)
    require(bb.getShort(28) == 24, s"unsupported bpp ${bb.getShort(28)} (24-bit only)")
    require(bb.getInt(30) == 0, "unsupported compression (BI_RGB only)")
    val stride = ((3 * w + 3) / 4) * 4
    require(bytes.length >= dataOffset + stride * h, "truncated pixel data")
    val probeX = math.min(1, w - 1)
    val probeY = math.min(2, h - 1)
    var sum = 0L
    var probe = 0L
    var yImg = 0
    while (yImg < h) {
      val rowOff = dataOffset + (if (bottomUp) h - 1 - yImg else yImg) * stride
      var x = 0
      while (x < w) {
        val off = rowOff + 3 * x
        val b = bytes(off) & 0xff
        val g = bytes(off + 1) & 0xff
        val r = bytes(off + 2) & 0xff
        val luma = (299 * r + 587 * g + 114 * b) / 1000
        sum += luma
        if (x == probeX && yImg == probeY) probe = luma
        x += 1
      }
      yImg += 1
    }
    BmpFeatures(w, h, w.toLong * h, sum, probe)
  }

  /** media table whose payloads are REAL BMP bytes built per-row from the
    * fixture rule (UDF justified: generating binary fixtures, not a hot
    * analytical path — the decode side is where scan-speed matters and that
    * is mapPartitions below). */
  def bmpFromDocuments(docs: DataFrame, idCol: String): DataFrame = {
    val enc = udf((id: Long) => encodeBmp(id))
    docs.select(
      col(idCol).cast("long").as("media_id"),
      lit("image").as("modality"),
      enc(col(idCol).cast("long")).as("payload"),
      struct(lit("bmp-fixture").as("source"),
        length(enc(col(idCol).cast("long"))).cast("long").as("bytes"),
        lit("bmp/24").as("codec")).as("meta"))
  }

  /** REAL image decode via mapPartitions — the production batch shape
    * (per-partition iterator, no per-row JVM object churn beyond the row
    * itself, decoder state initialized once per partition if it had any). */
  def decodeBmpFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_px", LongType, nullable = false),
      StructField("sum_luma", LongType, nullable = false),
      StructField("probe_luma", LongType, nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { it =>
      it.map { r =>
        val f = decodeBmp(r.getAs[Array[Byte]](payloadIdx))
        Row(r.getLong(idIdx), f.width, f.height, f.nPx, f.sumLuma, f.probeLuma)
      }
    }(Encoders.row(outSchema))
  }

  // ---------------------------------------------------------------- WAV --

  /** Deterministic PCM WAV fixture for `docId` — the audio twin of
    * [[encodeBmp]]: 16-bit mono little-endian samples at 8 kHz, sample
    * count and every sample a closed-form function of (docId, i), so a SQL
    * oracle recomputes the DECODED statistics without touching bytes. Odd
    * docIds get a junk `LIST` chunk between `fmt ` and `data`, making the
    * decoder's RIFF chunk WALK load-bearing (a parser that assumes `data`
    * at a fixed offset breaks the hash on half the corpus). */
  private[graft] def encodeWav(docId: Long): Array[Byte] = {
    val did = (docId % 256).toInt
    val n = (16 + docId % 17).toInt
    val junk = docId % 2 == 1
    val junkLen = if (junk) 12 else 0 // "LIST" + len + 4 payload bytes
    val dataLen = 2 * n
    val riffLen = 4 + 24 + junkLen + 8 + dataLen
    val buf = java.nio.ByteBuffer.allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(riffLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1)        // PCM
    buf.putShort(1)        // mono
    buf.putInt(8000)       // sample rate
    buf.putInt(8000 * 2)   // byte rate
    buf.putShort(2)        // block align
    buf.putShort(16)       // bits per sample
    if (junk) {
      buf.put("LIST".getBytes("US-ASCII")).putInt(4)
      buf.put("INFO".getBytes("US-ASCII"))
    }
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      buf.putShort((((did * 31 + i * 997) % 65536) - 32768).toShort)
      i += 1
    }
    buf.array()
  }

  final case class WavFeatures(sampleRate: Int, channels: Int, nSamples: Long,
                               sumSamples: Long, probeSample: Long, maxAbs: Long)

  /** Parse a PCM WAV: RIFF/WAVE magic, then a real chunk walk (chunks in
    * any order, unknown chunks skipped via their declared length, odd
    * lengths padded per spec) to find `fmt ` and `data`. 16-bit mono PCM
    * only. Emits exact integer statistics: sample count, summed samples,
    * probe sample i=3 (clamped) — the probe catches an endianness or
    * offset bug that the permutation-invariant sum would hide — and max
    * absolute amplitude. */
  private[graft] def decodeWav(bytes: Array[Byte]): WavFeatures = {
    require(bytes.length >= 44 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE", "not a WAV payload")
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var off = 12
    var sampleRate = -1
    var channels = -1
    var dataOff = -1
    var dataLen = -1
    while (off + 8 <= bytes.length && (sampleRate < 0 || dataOff < 0)) {
      val id = new String(bytes, off, 4, "US-ASCII")
      val len = bb.getInt(off + 4)
      require(len >= 0 && off + 8 + len <= bytes.length, s"truncated chunk $id")
      id match {
        case "fmt " =>
          require(bb.getShort(off + 8) == 1, "unsupported format (PCM only)")
          channels = bb.getShort(off + 10).toInt
          sampleRate = bb.getInt(off + 12)
          require(bb.getShort(off + 22) == 16, "unsupported bit depth (16 only)")
        case "data" =>
          dataOff = off + 8
          dataLen = len
        case _ => () // unknown chunk: skip by declared length
      }
      off += 8 + len + (len & 1) // RIFF pads odd-length chunks
    }
    require(sampleRate > 0 && dataOff >= 0, "missing fmt/data chunk")
    require(channels == 1, s"unsupported channel count $channels (mono only)")
    val n = dataLen / 2
    val probeIdx = math.min(3, n - 1)
    var sum = 0L
    var probe = 0L
    var maxAbs = 0L
    var i = 0
    while (i < n) {
      val v = bb.getShort(dataOff + 2 * i).toLong
      sum += v
      if (i == probeIdx) probe = v
      if (math.abs(v) > maxAbs) maxAbs = math.abs(v)
      i += 1
    }
    WavFeatures(sampleRate, channels, n, sum, probe, maxAbs)
  }

  /** media table whose payloads are REAL RIFF/PCM WAV bytes (same fixture
    * discipline as [[bmpFromDocuments]]) */
  def wavFromDocuments(docs: DataFrame, idCol: String): DataFrame = {
    val enc = udf((id: Long) => encodeWav(id))
    docs.select(
      col(idCol).cast("long").as("media_id"),
      lit("audio").as("modality"),
      enc(col(idCol).cast("long")).as("payload"),
      struct(lit("wav-fixture").as("source"),
        length(enc(col(idCol).cast("long"))).cast("long").as("bytes"),
        lit("pcm_s16le/8000/1").as("codec")).as("meta"))
  }

  /** REAL audio decode via mapPartitions — same production batch shape as
    * [[decodeBmpFeatures]] */
  def decodeWavFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("sample_rate", LongType, nullable = false),
      StructField("channels", LongType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("sum_samples", LongType, nullable = false),
      StructField("probe_sample", LongType, nullable = false),
      StructField("max_abs", LongType, nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { it =>
      it.map { r =>
        val f = decodeWav(r.getAs[Array[Byte]](payloadIdx))
        Row(r.getLong(idIdx), f.sampleRate.toLong, f.channels.toLong,
          f.nSamples, f.sumSamples, f.probeSample, f.maxAbs)
      }
    }(Encoders.row(outSchema))
  }

  // ---------------------------------------------------------------- AVI --

  /** Deterministic uncompressed AVI fixture for `docId` — the VIDEO twin of
    * [[encodeBmp]]/[[encodeWav]], completing the modality set with a real
    * container: RIFF('AVI ') holding LIST('hdrl') (avih main header +
    * LIST('strl') with a 'vids'/'DIB ' stream header and a
    * BITMAPINFOHEADER strf) and LIST('movi') with one '00db' chunk per
    * frame of raw bottom-up 24-bit BGR pixels (same stride padding as
    * BMP). Dimensions, frame count, and every pixel are closed-form in
    * (docId, x, y, frame), so a SQL oracle recomputes the DECODED
    * statistics without parsing bytes. */
  private[graft] def encodeAvi(docId: Long): Array[Byte] = {
    val did = (docId % 256).toInt
    buildAvi((4 + docId % 3).toInt, (3 + docId % 2).toInt,
      (2 + docId % 3).toInt,
      pxR = (x, y, f) => (did + x * y + 29 * f) % 256,
      pxG = (x, y, f) => (2 * did + 3 * x + 5 * y + 11 * f) % 256,
      pxB = (x, y, f) => (did + 7 * x + 13 * y + 17 * f) % 256)
  }

  /** Keyed near-dup AVI fixture — the video twin of [[encodeWavKeyed]]:
    * 57 constant-gray frames whose level follows the md5 rule
    * v(key, f) = byte0(md5("key:f")), so colliding keys carry IDENTICAL
    * video and the frame-sum profile replays closed-form. `perturb`
    * shifts frame 5's level by +64 (mod 256) — a temporal-fingerprint
    * near-duplicate touching only that frame's two comparisons. */
  private[graft] def encodeAviKeyed(key: Long, perturb: Boolean): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val levels = Array.tabulate(57) { f =>
      val base = md.digest(s"$key:$f".getBytes("UTF-8"))(0) & 0xff
      md.reset()
      if (perturb && f == 5) (base + 64) % 256 else base
    }
    buildAvi(4, 3, 57,
      pxR = (_, _, f) => levels(f),
      pxG = (_, _, f) => levels(f),
      pxB = (_, _, f) => levels(f))
  }

  /** canonical uncompressed-AVI writer shared by the fixtures */
  private def buildAvi(w: Int, h: Int, frames: Int,
                       pxR: (Int, Int, Int) => Int,
                       pxG: (Int, Int, Int) => Int,
                       pxB: (Int, Int, Int) => Int): Array[Byte] = {
    val stride = ((3 * w + 3) / 4) * 4
    val frameBytes = stride * h
    // 'hdrl' payload: subtype + avih chunk + LIST('strl') chunk
    val strlLen = 4 + (8 + 56) + (8 + 40)
    val hdrlSize = 4 + (8 + 56) + (8 + strlLen)
    // riff layout: 'AVI ' + LIST hdrl + LIST movi
    val moviSize = 4 + frames * (8 + frameBytes)
    val riffLen = 4 + (8 + hdrlSize) + (8 + moviSize)
    val buf = java.nio.ByteBuffer.allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = buf.put(s.getBytes("US-ASCII")): Unit
    fourcc("RIFF"); buf.putInt(riffLen); fourcc("AVI ")
    fourcc("LIST"); buf.putInt(hdrlSize); fourcc("hdrl")
    fourcc("avih"); buf.putInt(56)
    buf.putInt(100000)            // microseconds per frame (10 fps)
    buf.putInt(frameBytes * 10)   // max bytes/sec
    buf.putInt(0)                 // padding granularity
    buf.putInt(0x10)              // AVIF_HASINDEX off, plain flags
    buf.putInt(frames)            // total frames
    buf.putInt(0)                 // initial frames
    buf.putInt(1)                 // streams
    buf.putInt(frameBytes)        // suggested buffer
    buf.putInt(w).putInt(h)
    buf.putInt(0).putInt(0).putInt(0).putInt(0) // reserved
    fourcc("LIST"); buf.putInt(strlLen); fourcc("strl")
    fourcc("strh"); buf.putInt(56)
    fourcc("vids"); fourcc("DIB ")
    buf.putInt(0)                 // flags
    buf.putShort(0).putShort(0)   // priority, language
    buf.putInt(0)                 // initial frames
    buf.putInt(1).putInt(10)      // scale, rate → 10 fps
    buf.putInt(0)                 // start
    buf.putInt(frames)            // length in frames
    buf.putInt(frameBytes)        // suggested buffer
    buf.putInt(-1)                // quality (default)
    buf.putInt(frameBytes)        // sample size
    buf.putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort) // rcFrame
    fourcc("strf"); buf.putInt(40)
    buf.putInt(40).putInt(w).putInt(h)
    buf.putShort(1).putShort(24)  // planes, bpp
    buf.putInt(0)                 // BI_RGB
    buf.putInt(frameBytes)
    buf.putInt(2835).putInt(2835).putInt(0).putInt(0)
    fourcc("LIST"); buf.putInt(moviSize); fourcc("movi")
    var f = 0
    while (f < frames) {
      fourcc("00db"); buf.putInt(frameBytes)
      var storedRow = 0
      while (storedRow < h) {
        val y = h - 1 - storedRow // bottom-up rows, like BMP
        var x = 0
        while (x < w) {
          buf.put(pxB(x, y, f).toByte)
          buf.put(pxG(x, y, f).toByte)
          buf.put(pxR(x, y, f).toByte)
          x += 1
        }
        var pad = stride - 3 * w
        while (pad > 0) { buf.put(0.toByte); pad -= 1 }
        storedRow += 1
      }
      f += 1
    }
    buf.array()
  }

  final case class AviFeatures(width: Int, height: Int, nFrames: Int,
                               sumLuma: Long, probeLuma: Long)

  /** Parse an uncompressed AVI: RIFF('AVI ') walk with nested LIST
    * recursion — avih supplies (width, height, frames), LIST('movi')'s
    * '00db' chunks supply raw bottom-up BGR frames. Emits exact integer
    * statistics: total frames, summed luma over every pixel of every
    * frame, and the luma of pixel (x=1, y=1) of frame 1 (second frame,
    * clamped) — the probe catches frame-order, stride, or row-order bugs
    * the total sum cannot see. */
  private[graft] def decodeAvi(bytes: Array[Byte]): AviFeatures = {
    require(bytes.length >= 24 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "AVI ", "not an AVI payload")
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var w = -1; var h = -1; var frames = -1
    var sum = 0L; var probe = 0L; var frameIdx = 0
    def walkFrame(off: Int, len: Int): Unit = {
      require(w > 0 && h > 0, "movi before avih")
      val stride = ((3 * w + 3) / 4) * 4
      require(len >= stride * h, s"truncated frame $frameIdx")
      val probeX = math.min(1, w - 1)
      val probeY = math.min(1, h - 1)
      val probeF = math.min(1, frames - 1)
      var yImg = 0
      while (yImg < h) {
        val rowOff = off + (h - 1 - yImg) * stride // bottom-up
        var x = 0
        while (x < w) {
          val o = rowOff + 3 * x
          val luma = (299 * (bytes(o + 2) & 0xff) + 587 * (bytes(o + 1) & 0xff) +
            114 * (bytes(o) & 0xff)) / 1000
          sum += luma
          if (frameIdx == probeF && x == probeX && yImg == probeY) probe = luma
          x += 1
        }
        yImg += 1
      }
      frameIdx += 1
    }
    def walk(off0: Int, end: Int): Unit = {
      var off = off0
      while (off + 8 <= end) {
        val id = new String(bytes, off, 4, "US-ASCII")
        val len = bb.getInt(off + 4)
        require(len >= 0 && off + 8 + len <= bytes.length, s"truncated chunk $id")
        id match {
          case "LIST" => walk(off + 12, off + 8 + len) // skip the subtype fourcc
          case "avih" =>
            frames = bb.getInt(off + 8 + 16)
            w = bb.getInt(off + 8 + 32)
            h = bb.getInt(off + 8 + 36)
          case "00db" => walkFrame(off + 8, len)
          case _ => () // strh/strf/junk: skipped by declared length
        }
        off += 8 + len + (len & 1) // RIFF pads odd chunks
      }
    }
    walk(12, bytes.length)
    require(w > 0 && h > 0 && frames >= 0, "missing avih header")
    require(frameIdx == frames, s"frame count mismatch: header $frames, movi $frameIdx")
    AviFeatures(w, h, frames, sum, probe)
  }

  /** per-frame luma sums (same tolerant RIFF walk as [[decodeAvi]],
    * materializing the per-frame series because temporal ops need it) */
  private def aviFrameLumaSums(bytes: Array[Byte]): Array[Long] = {
    require(bytes.length >= 24 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "AVI ", "not an AVI payload")
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var w = -1; var h = -1
    val sums = scala.collection.mutable.ArrayBuffer.empty[Long]
    def walk(off0: Int, end: Int): Unit = {
      var off = off0
      while (off + 8 <= end) {
        val id = new String(bytes, off, 4, "US-ASCII")
        val len = bb.getInt(off + 4)
        require(len >= 0 && off + 8 + len <= bytes.length, s"truncated chunk $id")
        id match {
          case "LIST" => walk(off + 12, off + 8 + len)
          case "avih" => w = bb.getInt(off + 8 + 32); h = bb.getInt(off + 8 + 36)
          case "00db" =>
            require(w > 0 && h > 0, "movi before avih")
            val stride = ((3 * w + 3) / 4) * 4
            require(len >= stride * h, "truncated frame")
            var s = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val o = off + 8 + y * stride + 3 * x // row order irrelevant for a sum
                s += (299 * (bytes(o + 2) & 0xff) + 587 * (bytes(o + 1) & 0xff) +
                  114 * (bytes(o) & 0xff)) / 1000
                x += 1
              }
              y += 1
            }
            sums += s
          case _ => ()
        }
        off += 8 + len + (len & 1)
      }
    }
    walk(12, bytes.length)
    sums.toArray
  }

  /** Scene-cut detection — THE temporal video primitive: per-frame luma
    * sums, consecutive-frame deltas, a cut wherever |delta| exceeds the
    * threshold. Integer-exact end to end, so the oracle replays it from
    * the pixel rule. Per-row map work; at scale each video is one task's
    * sequential frame walk — embarrassingly parallel across a corpus. */
  def videoSceneCuts(media: DataFrame, threshold: Long): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_frames", LongType, nullable = false),
      StructField("n_cuts", LongType, nullable = false),
      StructField("max_abs_delta", LongType, nullable = false),
      StructField("first_delta", LongType, nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { it =>
      it.map { r =>
        val sums = aviFrameLumaSums(r.getAs[Array[Byte]](payloadIdx))
        var cuts = 0L; var maxAbs = 0L
        var i = 1
        while (i < sums.length) {
          val d = sums(i) - sums(i - 1)
          if (math.abs(d) > threshold) cuts += 1
          if (math.abs(d) > maxAbs) maxAbs = math.abs(d)
          i += 1
        }
        val first = if (sums.length > 1) sums(1) - sums(0) else 0L
        Row(r.getLong(idIdx), sums.length.toLong, cuts, maxAbs, first)
      }
    }(Encoders.row(outSchema))
  }

  /** 56-bit TEMPORAL video fingerprint — ordinal-signature video copy
    * detection (Hampapur et al.'s ordinal measures family, reduced to
    * the pairwise-order core): bit f set iff frame f's luma sum exceeds
    * frame f+1's, over the first 57 frames. Integer-exact (the sums are
    * exact longs), so every bit replays in SQL; same downstream contract
    * as [[dhash]]/[[audioFingerprint]] — banded-hamming near-dup with the
    * pigeonhole recall guarantee. */
  private[graft] def videoFingerprint(bytes: Array[Byte], bits: Int = 56): Long = {
    val sums = aviFrameLumaSums(bytes)
    require(sums.length >= bits + 1,
      s"video too short for a $bits-bit fingerprint (${sums.length} frames)")
    var fp = 0L
    var b = 0
    while (b < bits) { if (sums(b) > sums(b + 1)) fp |= (1L << b); b += 1 }
    fp
  }

  /** per-video fingerprint features (media_id, vfp, n_bits) */
  def videoFingerprintFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("vfp", LongType, nullable = false),
      StructField("n_bits", LongType, nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { it =>
      it.map { r =>
        val fp = videoFingerprint(r.getAs[Array[Byte]](payloadIdx))
        Row(r.getLong(idIdx), fp, java.lang.Long.bitCount(fp).toLong)
      }
    }(Encoders.row(outSchema))
  }

  /** media table whose payloads are REAL AVI bytes (fixture discipline of
    * [[bmpFromDocuments]]/[[wavFromDocuments]]) */
  def aviFromDocuments(docs: DataFrame, idCol: String): DataFrame = {
    val enc = udf((id: Long) => encodeAvi(id))
    docs.select(
      col(idCol).cast("long").as("media_id"),
      lit("video").as("modality"),
      enc(col(idCol).cast("long")).as("payload"),
      struct(lit("avi-fixture").as("source"),
        length(enc(col(idCol).cast("long"))).cast("long").as("bytes"),
        lit("rawvideo/bgr24").as("codec")).as("meta"))
  }

  /** REAL video decode via mapPartitions — same batch shape as the image
    * and audio decodes */
  def decodeAviFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("sum_luma", LongType, nullable = false),
      StructField("probe_luma", LongType, nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { it =>
      it.map { r =>
        val f = decodeAvi(r.getAs[Array[Byte]](payloadIdx))
        Row(r.getLong(idIdx), f.width, f.height, f.nFrames, f.sumLuma, f.probeLuma)
      }
    }(Encoders.row(outSchema))
  }

  // ---------------------------------------------------------------- PNG --

  /** PNG Paeth predictor (RFC 2083 §6.6) — shared by the fixture encoder
    * and the decoder's recon pass */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Deterministic PNG fixture for `docId` — same pixel-rule family as
    * [[encodeBmp]] on different dims: REAL zlib IDAT over filtered
    * scanlines where row y uses filter `y % 5`, so all five PNG filter
    * types (None/Sub/Up/Average/Paeth) are encode-applied and must be
    * decode-reversed; odd docIds split the IDAT across two chunks, making
    * the chunk walk + concatenation load-bearing. CRC32 per chunk
    * (decoder-verified). */
  private[graft] def encodePng(docId: Long): Array[Byte] = {
    val did = (docId % 256).toInt
    val w = (5 + docId % 4).toInt
    val h = (4 + docId % 3).toInt
    def chan(x: Int, y: Int, c: Int): Int =
      if (y < 0 || x < 0) 0
      else c match {
        case 0 => (did + x * y) % 256
        case 1 => (2 * did + 3 * x + 5 * y) % 256
        case _ => (did + 7 * x + 13 * y) % 256
      }
    val stride = 3 * w
    val raw = new Array[Byte](h * (1 + stride))
    var y = 0
    while (y < h) {
      val rowOff = y * (1 + stride)
      val ft = y % 5
      raw(rowOff) = ft.toByte
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          val cur = chan(x, y, c)
          val left = chan(x - 1, y, c)
          val up = chan(x, y - 1, c)
          val ul = chan(x - 1, y - 1, c)
          val f = ft match {
            case 0 => cur
            case 1 => cur - left
            case 2 => cur - up
            case 3 => cur - (left + up) / 2
            case _ => cur - paeth(left, up, ul)
          }
          raw(rowOff + 1 + x * 3 + c) = (f & 0xFF).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    val defl = {
      val d = new java.util.zip.Deflater() // default = zlib wrapper
      d.setInput(raw); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      out.toByteArray
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt,
      0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte), 0, 8)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
      out.write(len, 0, 4)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb, 0, 4)
      out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32
      crc.update(tb); crc.update(data)
      out.write(java.nio.ByteBuffer.allocate(4)
        .putInt(crc.getValue.toInt).array(), 0, 4)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    chunk("IHDR", ihdr)
    if (docId % 2 == 1 && defl.length >= 2) {
      chunk("IDAT", defl.take(defl.length / 2))
      chunk("IDAT", defl.drop(defl.length / 2))
    } else chunk("IDAT", defl)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  final case class PngFeatures(width: Int, height: Int, nPx: Long,
                               sumLuma: Long, probeLuma: Long)

  /** Parse an 8-bit RGB non-interlaced PNG (RFC 2083): signature, chunk
    * walk with CRC verification (IDAT chunks concatenated, ancillary
    * chunks skipped), zlib inflate, and the per-row filter recon pass
    * (all five filter types, bpp = 3). Same exact integer statistics as
    * [[decodeBmp]]; probe pixel (1,2) catches filter/row-order bugs the
    * permutation-invariant sum would hide. */
  private[graft] def decodePng(bytes: Array[Byte]): PngFeatures = {
    require(bytes.length >= 8 && (bytes(0) & 0xFF) == 0x89 &&
      bytes(1) == 'P'.toByte && bytes(2) == 'N'.toByte && bytes(3) == 'G'.toByte,
      "not a PNG payload")
    def be32(o: Int): Int =
      ((bytes(o) & 0xFF) << 24) | ((bytes(o + 1) & 0xFF) << 16) |
        ((bytes(o + 2) & 0xFF) << 8) | (bytes(o + 3) & 0xFF)
    var i = 8
    var w = 0; var h = 0
    var seenIhdr = false
    val idat = new java.io.ByteArrayOutputStream()
    var end = false
    while (!end && i + 12 <= bytes.length) {
      val len = be32(i)
      require(len >= 0 && i + 12 + len <= bytes.length, "truncated chunk")
      val typ = new String(bytes, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new java.util.zip.CRC32
      crc.update(bytes, i + 4, 4 + len)
      require(crc.getValue.toInt == be32(i + 8 + len), s"$typ crc mismatch")
      typ match {
        case "IHDR" =>
          w = be32(i + 8); h = be32(i + 12)
          require(bytes(i + 16) == 8 && bytes(i + 17) == 2 && bytes(i + 20) == 0,
            "unsupported PNG (8-bit RGB non-interlaced only)")
          seenIhdr = true
        case "IDAT" => idat.write(bytes, i + 8, len)
        case "IEND" => end = true
        case _ => () // ancillary chunk: skipped
      }
      i += 12 + len
    }
    require(seenIhdr && w > 0 && h > 0, "missing IHDR")
    val raw = {
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) throw new IllegalArgumentException("bad IDAT")
        out.write(buf, 0, n)
      }
      inf.end()
      out.toByteArray
    }
    val stride = 3 * w
    require(raw.length == h * (1 + stride), "decompressed size mismatch")
    val recon = new Array[Int](h * stride)
    var y = 0
    while (y < h) {
      val ft = raw(y * (1 + stride)) & 0xFF
      require(ft <= 4, s"bad filter type $ft")
      var k = 0
      while (k < stride) {
        val filt = raw(y * (1 + stride) + 1 + k) & 0xFF
        val left = if (k >= 3) recon(y * stride + k - 3) else 0
        val up = if (y > 0) recon((y - 1) * stride + k) else 0
        val ul = if (y > 0 && k >= 3) recon((y - 1) * stride + k - 3) else 0
        val v = ft match {
          case 0 => filt
          case 1 => filt + left
          case 2 => filt + up
          case 3 => filt + (left + up) / 2
          case _ => filt + paeth(left, up, ul)
        }
        recon(y * stride + k) = v & 0xFF
        k += 1
      }
      y += 1
    }
    val probeX = math.min(1, w - 1)
    val probeY = math.min(2, h - 1)
    var sum = 0L
    var probe = 0L
    y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = y * stride + 3 * x
        val luma = (299 * recon(o) + 587 * recon(o + 1) + 114 * recon(o + 2)) / 1000
        sum += luma
        if (x == probeX && y == probeY) probe = luma
        x += 1
      }
      y += 1
    }
    PngFeatures(w, h, w.toLong * h, sum, probe)
  }

  /** media table of REAL PNG payloads (fixture rule above) */
  def pngFromDocuments(docs: DataFrame, idCol: String): DataFrame = {
    val enc = udf((id: Long) => encodePng(id))
    docs.select(
      col(idCol).cast("long").as("media_id"),
      lit("image").as("modality"),
      enc(col(idCol).cast("long")).as("payload"),
      struct(lit("png-fixture").as("source"),
        length(enc(col(idCol).cast("long"))).cast("long").as("bytes"),
        lit("png/rgb8").as("codec")).as("meta"))
  }

  /** REAL PNG decode via mapPartitions (the [[decodeBmpFeatures]] shape) */
  def decodePngFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_px", LongType, nullable = false),
      StructField("sum_luma", LongType, nullable = false),
      StructField("probe_luma", LongType, nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { it =>
      it.map { r =>
        val f = decodePng(r.getAs[Array[Byte]](payloadIdx))
        Row(r.getLong(idIdx), f.width, f.height, f.nPx, f.sumLuma, f.probeLuma)
      }
    }(Encoders.row(outSchema))
  }

  // ---------------------------------------------------------------- GIF --

  /** Deterministic GIF89a fixture for `docId`: a 256-entry global color
    * table whose palette entries AND pixel indices are closed-form
    * functions of (docId, x, y), with the index stream LZW-compressed in
    * GIF's LSB-FIRST variable-width code packing (a different bit
    * discipline from the PDF layer's MSB-first LZW) and split into
    * ≤255-byte sub-blocks. The encoder emits a ClearCode before every
    * literal — valid GIF LZW exercising the decoder's reset machinery —
    * and odd docIds prepend a Graphic Control Extension so the block walk
    * must skip extensions. */
  private[graft] def encodeGif(docId: Long): Array[Byte] = {
    val did = (docId % 256).toInt
    val w = (6 + docId % 3).toInt
    val h = (5 + docId % 2).toInt
    def idx(x: Int, y: Int) = (x + 3 * y + did) % 256
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"), 0, 6)
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    le16(w); le16(h)
    out.write(0xF7) // global color table, 256 entries, 8-bit resolution
    out.write(0)    // background index
    out.write(0)    // aspect
    var i = 0
    while (i < 256) {
      out.write((did + i) % 256)
      out.write((2 * did + 3 * i) % 256)
      out.write((did + 7 * i) % 256)
      i += 1
    }
    if (docId % 2 == 1) { // Graphic Control Extension: must be skipped
      out.write(0x21); out.write(0xF9); out.write(4)
      out.write(0); le16(0); out.write(0); out.write(0)
    }
    out.write(0x2C) // image descriptor
    le16(0); le16(0); le16(w); le16(h)
    out.write(0) // no local table, not interlaced
    out.write(8) // LZW minimum code size
    // clear-per-literal 9-bit codes, LSB-first packing
    val codes = (0 until h).flatMap(y => (0 until w)
      .flatMap(x => Seq(256, idx(x, y)))) :+ 257
    val packed = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nb = 0
    codes.foreach { c =>
      acc |= (c.toLong << nb); nb += 9
      while (nb >= 8) { packed.write((acc & 0xFF).toInt); acc >>= 8; nb -= 8 }
    }
    if (nb > 0) packed.write((acc & 0xFF).toInt)
    val data = packed.toByteArray
    var off = 0
    while (off < data.length) {
      val n = math.min(255, data.length - off)
      out.write(n); out.write(data, off, n); off += n
    }
    out.write(0)    // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }

  final case class GifFeatures(width: Int, height: Int, nPx: Long,
                               sumLuma: Long, probeLuma: Long)

  /** Parse a GIF87a/89a: header + logical screen descriptor, global color
    * table, extension-block skipping, image descriptor, and a GENERAL
    * GIF-LZW decompressor (LSB-first variable 9–12-bit codes, table
    * growth, ClearCode reset, EOI) — not just the fixture's clear-heavy
    * shape — plus the 4-pass interlace row remap. Local color tables are
    * refused. Same
    * integer statistics as the other image decoders. */
  private[graft] def decodeGif(bytes: Array[Byte]): GifFeatures = {
    require(bytes.length >= 13 &&
      new String(bytes, 0, 3, java.nio.charset.StandardCharsets.US_ASCII) == "GIF",
      "not a GIF payload")
    def u8(o: Int) = bytes(o) & 0xFF
    def le16(o: Int) = u8(o) | (u8(o + 1) << 8)
    val packed = u8(10)
    require((packed & 0x80) != 0, "no global color table")
    val tableSize = 2 << (packed & 7)
    val palette = new Array[Int](tableSize * 3)
    var p = 13
    var i = 0
    while (i < tableSize * 3) { palette(i) = u8(p); p += 1; i += 1 }
    // walk blocks to the first image descriptor
    while (p < bytes.length && u8(p) == 0x21) { // extension: label + sub-blocks
      p += 2
      while (u8(p) != 0) p += 1 + u8(p)
      p += 1
    }
    require(p < bytes.length && u8(p) == 0x2C, "no image descriptor")
    val w = le16(p + 5); val h = le16(p + 7)
    val ipacked = u8(p + 9)
    require((ipacked & 0x80) == 0, "local color tables unsupported")
    val interlaced = (ipacked & 0x40) != 0
    p += 10
    val minCode = u8(p); p += 1
    // concatenate data sub-blocks
    val data = new java.io.ByteArrayOutputStream()
    while (u8(p) != 0) { data.write(bytes, p + 1, u8(p)); p += 1 + u8(p) }
    val stream = data.toByteArray
    // general GIF-LZW decode, LSB-first
    val clear = 1 << minCode
    val eoi = clear + 1
    val pixels = new java.io.ByteArrayOutputStream()
    var dict = mutable.ArrayBuffer.empty[Array[Byte]]
    def resetDict(): Unit = {
      dict = mutable.ArrayBuffer.tabulate(clear)(j => Array(j.toByte)) ++
        Seq(Array.emptyByteArray, Array.emptyByteArray) // clear + eoi slots
    }
    resetDict()
    var width = minCode + 1
    var acc = 0L; var nb = 0
    var bi = 0
    var prev: Array[Byte] = null
    var done = false
    while (!done) {
      while (nb < width && bi < stream.length) {
        acc |= ((stream(bi) & 0xFFL) << nb); nb += 8; bi += 1
      }
      if (nb < width) done = true // stream exhausted without EOI: stop
      else {
        val code = (acc & ((1L << width) - 1)).toInt
        acc >>= width; nb -= width
        if (code == clear) { resetDict(); width = minCode + 1; prev = null }
        else if (code == eoi) done = true
        else {
          require(code < dict.length || (code == dict.length && prev != null),
            s"invalid LZW code $code")
          val entry =
            if (code < dict.length) dict(code)
            else prev :+ prev(0) // the KwKwK case
          pixels.write(entry, 0, entry.length)
          if (prev != null && dict.length < 4096) dict += (prev :+ entry(0))
          prev = entry
          if (dict.length == (1 << width) && width < 12) width += 1
        }
      }
    }
    val px0 = pixels.toByteArray
    require(px0.length >= w * h, "short pixel stream")
    // interlaced rows arrive in the 4-pass order (8/8 from 0, 8/8 from 4,
    // 4/4 from 2, 2/2 from 1) — remap to natural order (GIF89a App. E)
    val px =
      if (!interlaced) px0
      else {
        val order = (0 until h by 8) ++ (4 until h by 8) ++
          (2 until h by 4) ++ (1 until h by 2)
        val out = new Array[Byte](w * h)
        order.zipWithIndex.foreach { case (target, src) =>
          System.arraycopy(px0, src * w, out, target * w, w)
        }
        out
      }
    val probeX = math.min(1, w - 1)
    val probeY = math.min(2, h - 1)
    var sum = 0L; var probe = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val ix = px(y * w + x) & 0xFF
        require(ix < tableSize, "palette index out of range")
        val luma = (299 * palette(3 * ix) + 587 * palette(3 * ix + 1) +
          114 * palette(3 * ix + 2)) / 1000
        sum += luma
        if (x == probeX && y == probeY) probe = luma
        x += 1
      }
      y += 1
    }
    GifFeatures(w, h, w.toLong * h, sum, probe)
  }

  /** media table of REAL GIF payloads (fixture rule above) */
  def gifFromDocuments(docs: DataFrame, idCol: String): DataFrame = {
    val enc = udf((id: Long) => encodeGif(id))
    docs.select(
      col(idCol).cast("long").as("media_id"),
      lit("image").as("modality"),
      enc(col(idCol).cast("long")).as("payload"),
      struct(lit("gif-fixture").as("source"),
        length(enc(col(idCol).cast("long"))).cast("long").as("bytes"),
        lit("gif/8i").as("codec")).as("meta"))
  }

  /** REAL GIF decode via mapPartitions (the [[decodeBmpFeatures]] shape) */
  def decodeGifFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_px", LongType, nullable = false),
      StructField("sum_luma", LongType, nullable = false),
      StructField("probe_luma", LongType, nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { it =>
      it.map { r =>
        val f = decodeGif(r.getAs[Array[Byte]](payloadIdx))
        Row(r.getLong(idIdx), f.width, f.height, f.nPx, f.sumLuma, f.probeLuma)
      }
    }(Encoders.row(outSchema))
  }

  // -------------------------------------------------------------- μ-law --

  /** G.711 μ-law WAV fixture (format tag 7, 8-bit samples at 8 kHz) —
    * the telephony/ASR-corpus encoding; every byte is a closed-form
    * function of (docId, i) so the oracle expands the SAME bytes through
    * the closed-form μ-law formula */
  private[graft] def encodeWavMulaw(docId: Long): Array[Byte] = {
    val did = (docId % 256).toInt
    val n = (40 + docId % 20).toInt
    val riffLen = 4 + 24 + 8 + n
    val buf = java.nio.ByteBuffer.allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(riffLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(7)      // WAVE_FORMAT_MULAW
    buf.putShort(1)      // mono
    buf.putInt(8000)
    buf.putInt(8000)     // byte rate (1 byte/sample)
    buf.putShort(1)      // block align
    buf.putShort(8)      // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(n)
    var i = 0
    while (i < n) { buf.put(((did * 7 + i * 13) % 256).toByte); i += 1 }
    buf.array()
  }

  /** the table-free CCITT G.711 μ-law expansion (public spec formula) */
  private[graft] def mulawToPcm(b: Int): Int = {
    val c = ~b & 0xFF
    val sign = c & 0x80
    val exponent = (c >> 4) & 0x07
    val mantissa = c & 0x0F
    val mag = (((mantissa << 3) + 0x84) << exponent) - 0x84
    if (sign != 0) -mag else mag
  }

  /** Parse a μ-law WAV (format tag 7): RIFF chunk walk + per-byte G.711
    * expansion to linear PCM16; same stats shape as [[decodeWav]] */
  private[graft] def decodeWavMulaw(bytes: Array[Byte]): WavFeatures = {
    require(bytes.length >= 12 &&
      new String(bytes, 0, 4, java.nio.charset.StandardCharsets.US_ASCII) == "RIFF" &&
      new String(bytes, 8, 4, java.nio.charset.StandardCharsets.US_ASCII) == "WAVE",
      "not a WAV payload")
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var p = 12
    var rate = 0; var channels = 0
    var dataOff = -1; var dataLen = 0
    while (p + 8 <= bytes.length) {
      val tag = new String(bytes, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val len = bb.getInt(p + 4)
      require(len >= 0 && p + 8 + len <= bytes.length, s"truncated $tag chunk")
      tag match {
        case "fmt " =>
          require(bb.getShort(p + 8) == 7, "not a mu-law WAV (format tag != 7)")
          channels = bb.getShort(p + 10)
          rate = bb.getInt(p + 12)
          require(bb.getShort(p + 22) == 8, "mu-law samples are 8-bit")
        case "data" => dataOff = p + 8; dataLen = len
        case _ => () // LIST/INFO etc.: skipped
      }
      p += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(rate > 0 && dataOff >= 0, "missing fmt or data chunk")
    var sum = 0L; var maxAbs = 0L; var probe = 0L
    var i = 0
    while (i < dataLen) {
      val s = mulawToPcm(bytes(dataOff + i) & 0xFF)
      sum += s
      if (math.abs(s) > maxAbs) maxAbs = math.abs(s)
      if (i == 2) probe = s
      i += 1
    }
    WavFeatures(rate, channels, dataLen.toLong, sum, probe, maxAbs)
  }

  /** media table of REAL μ-law WAV payloads */
  def mulawFromDocuments(docs: DataFrame, idCol: String): DataFrame = {
    val enc = udf((id: Long) => encodeWavMulaw(id))
    docs.select(
      col(idCol).cast("long").as("media_id"),
      lit("audio").as("modality"),
      enc(col(idCol).cast("long")).as("payload"),
      struct(lit("mulaw-fixture").as("source"),
        length(enc(col(idCol).cast("long"))).cast("long").as("bytes"),
        lit("g711/ulaw").as("codec")).as("meta"))
  }

  /** REAL μ-law decode via mapPartitions */
  def decodeMulawFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("sum_samples", LongType, nullable = false),
      StructField("probe_sample", LongType, nullable = false),
      StructField("max_abs", LongType, nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { it =>
      it.map { r =>
        val f = decodeWavMulaw(r.getAs[Array[Byte]](payloadIdx))
        Row(r.getLong(idIdx), f.sampleRate, f.nSamples, f.sumSamples,
          f.probeSample, f.maxAbs)
      }
    }(Encoders.row(outSchema))
  }

  // --------------------------------------------------------------- TIFF --

  /** Deterministic baseline TIFF fixture for `docId` (TIFF 6.0): 8-bit
    * RGB, uncompressed, one strip, little-endian ("II") for even ids and
    * BIG-endian ("MM") for odd — so the decoder's byte-order handling is
    * load-bearing. Same closed-form pixel-rule family as the other image
    * fixtures. */
  private[graft] def encodeTiff(docId: Long): Array[Byte] = {
    val did = (docId % 256).toInt
    val w = (7 + docId % 3).toInt
    val h = (5 + docId % 4).toInt
    val big = docId % 2 == 1
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        px(o) = ((did + x * y) % 256).toByte           // R
        px(o + 1) = ((2 * did + 3 * x + 5 * y) % 256).toByte // G
        px(o + 2) = ((did + 7 * x + 13 * y) % 256).toByte    // B
        x += 1
      }
      y += 1
    }
    val nTags = 9
    // layout: header(8) | pixels | bitsPerSample(6) | IFD
    val pxOff = 8
    val bpsOff = pxOff + px.length
    val ifdOff = bpsOff + 6
    val total = ifdOff + 2 + nTags * 12 + 4
    val buf = java.nio.ByteBuffer.allocate(total)
      .order(if (big) java.nio.ByteOrder.BIG_ENDIAN
             else java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put((if (big) "MM" else "II").getBytes("US-ASCII"))
    buf.putShort(42)
    buf.putInt(ifdOff)
    buf.put(px)
    buf.putShort(8).putShort(8).putShort(8) // BitsPerSample array
    buf.putShort(nTags.toShort)
    def tagShort(id: Int, v: Int): Unit = {
      buf.putShort(id.toShort).putShort(3).putInt(1)
      buf.putShort(v.toShort)
      buf.putShort(0) // value field pads to 4 bytes
    }
    def tagLong(id: Int, v: Int): Unit = {
      buf.putShort(id.toShort).putShort(4).putInt(1).putInt(v)
    }
    tagLong(256, w)          // ImageWidth
    tagLong(257, h)          // ImageLength
    buf.putShort(258).putShort(3).putInt(3).putInt(bpsOff) // BitsPerSample →
    tagShort(259, 1)         // Compression = none
    tagShort(262, 2)         // Photometric = RGB
    tagLong(273, pxOff)      // StripOffsets
    tagShort(277, 3)         // SamplesPerPixel
    tagLong(278, h)          // RowsPerStrip
    tagLong(279, px.length)  // StripByteCounts
    buf.putInt(0) // next IFD
    buf.array()
  }

  final case class TiffFeatures(width: Int, height: Int, nPx: Long,
                                sumLuma: Long, probeLuma: Long)

  /** Parse a baseline TIFF 6.0: both byte orders, IFD tag walk with
    * SHORT/LONG value types (inline or offset-stored), multi-strip
    * gather; uncompressed 8-bit RGB only (compressed/planar/paletted
    * variants are refused, never garbled). */
  private[graft] def decodeTiff(bytes: Array[Byte]): TiffFeatures = {
    require(bytes.length >= 8, "not a TIFF payload")
    val order = new String(bytes, 0, 2, java.nio.charset.StandardCharsets.US_ASCII) match {
      case "II" => java.nio.ByteOrder.LITTLE_ENDIAN
      case "MM" => java.nio.ByteOrder.BIG_ENDIAN
      case _ => throw new IllegalArgumentException("not a TIFF payload")
    }
    val bb = java.nio.ByteBuffer.wrap(bytes).order(order)
    require(bb.getShort(2) == 42, "bad TIFF magic")
    val ifd = bb.getInt(4)
    val n = bb.getShort(ifd) & 0xFFFF
    // tag id → every value as Long (SHORT/LONG, inline when it fits)
    val tags = mutable.Map.empty[Int, IndexedSeq[Long]]
    for (k <- 0 until n) {
      val off = ifd + 2 + k * 12
      val id = bb.getShort(off) & 0xFFFF
      val typ = bb.getShort(off + 2) & 0xFFFF
      val count = bb.getInt(off + 4)
      val size = typ match { case 3 => 2; case 4 => 4; case 1 => 1; case _ => -1 }
      if (size > 0) {
        val inline = size * count <= 4
        val base = if (inline) off + 8 else bb.getInt(off + 8)
        tags(id) = (0 until count).map { i =>
          typ match {
            case 3 => (bb.getShort(base + 2 * i) & 0xFFFF).toLong
            case 4 => bb.getInt(base + 4 * i).toLong & 0xFFFFFFFFL
            case _ => (bytes(base + i) & 0xFF).toLong
          }
        }
      } // other types (RATIONAL etc.) are metadata: ignored
    }
    def one(id: Int): Long = tags.get(id).flatMap(_.headOption)
      .getOrElse(throw new IllegalArgumentException(s"missing tag $id"))
    val w = one(256).toInt; val h = one(257).toInt
    require(one(259) == 1, "compressed TIFFs unsupported")
    require(one(262) == 2, "non-RGB photometric unsupported")
    require(one(277) == 3 && tags(258).forall(_ == 8), "8-bit RGB only")
    require(!tags.get(284).exists(_.headOption.contains(2L)), "planar unsupported")
    val offs = tags(273); val counts = tags(279)
    require(offs.length == counts.length, "strip tables disagree")
    val px = new java.io.ByteArrayOutputStream()
    offs.zip(counts).foreach { case (o, c) =>
      require(o + c <= bytes.length, "truncated strip")
      px.write(bytes, o.toInt, c.toInt)
    }
    val data = px.toByteArray
    require(data.length >= w * h * 3, "short pixel data")
    val probeX = math.min(1, w - 1); val probeY = math.min(2, h - 1)
    var sum = 0L; var probe = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        val luma = (299 * (data(o) & 0xFF) + 587 * (data(o + 1) & 0xFF) +
          114 * (data(o + 2) & 0xFF)) / 1000
        sum += luma
        if (x == probeX && y == probeY) probe = luma
        x += 1
      }
      y += 1
    }
    TiffFeatures(w, h, w.toLong * h, sum, probe)
  }

  /** media table of REAL TIFF payloads (fixture rule above) */
  def tiffFromDocuments(docs: DataFrame, idCol: String): DataFrame = {
    val enc = udf((id: Long) => encodeTiff(id))
    docs.select(
      col(idCol).cast("long").as("media_id"),
      lit("image").as("modality"),
      enc(col(idCol).cast("long")).as("payload"),
      struct(lit("tiff-fixture").as("source"),
        length(enc(col(idCol).cast("long"))).cast("long").as("bytes"),
        lit("tiff/rgb8").as("codec")).as("meta"))
  }

  /** REAL TIFF decode via mapPartitions (the [[decodeBmpFeatures]] shape) */
  def decodeTiffFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_px", LongType, nullable = false),
      StructField("sum_luma", LongType, nullable = false),
      StructField("probe_luma", LongType, nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { it =>
      it.map { r =>
        val f = decodeTiff(r.getAs[Array[Byte]](payloadIdx))
        Row(r.getLong(idIdx), f.width, f.height, f.nPx, f.sumLuma, f.probeLuma)
      }
    }(Encoders.row(outSchema))
  }

  // --------------------------------------------------------------- JPEG --

  /** media table of REAL baseline JPEG payloads ([[Jpeg.encodeJpeg]]) */
  def jpegFromDocuments(docs: DataFrame, idCol: String): DataFrame = {
    val enc = udf((id: Long) => Jpeg.encodeJpeg(id))
    docs.select(
      col(idCol).cast("long").as("media_id"),
      lit("image").as("modality"),
      enc(col(idCol).cast("long")).as("payload"),
      struct(lit("jpeg-fixture").as("source"),
        length(enc(col(idCol).cast("long"))).cast("long").as("bytes"),
        lit("jpeg/baseline").as("codec")).as("meta"))
  }

  /** REAL JPEG decode via mapPartitions (the [[decodeBmpFeatures]] shape) */
  def decodeJpegFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_px", LongType, nullable = false),
      StructField("sum_luma", LongType, nullable = false),
      StructField("probe_luma", LongType, nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { it =>
      it.map { r =>
        val f = Jpeg.decodeJpeg(r.getAs[Array[Byte]](payloadIdx))
        Row(r.getLong(idIdx), f.width, f.height, f.nPx, f.sumLuma, f.probeLuma)
      }
    }(Encoders.row(outSchema))
  }

  /** frame sampling: split payload into `n` contiguous byte ranges (last
    * frame takes the remainder); per-row generator, no shuffle */
  def frameSample(media: DataFrame, n: Int): DataFrame =
    media
      .withColumn("frame_len", expr(s"CAST(length(payload) DIV $n AS INT)"))
      .select(col("media_id"), col("modality"),
        posexplode(expr(
          s"""transform(sequence(0, $n - 1), i ->
             |  CASE WHEN i < $n - 1
             |       THEN substring(payload, i * frame_len + 1, frame_len)
             |       ELSE substring(payload, i * frame_len + 1, length(payload) - i * frame_len)
             |  END)""".stripMargin)).as(Seq("frame_idx", "frame")))
      .withColumn("frame_bytes", length(col("frame")).cast("long"))
}
