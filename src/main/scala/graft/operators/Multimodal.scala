package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` + typed metadata.
  *
  * The container ships no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic STUB (`fakeDecode`) — but everything Spark
  * cares about is real and tested: the schema (binary payload + metadata
  * struct), the batched `mapPartitions` execution shape (the Scala analogue
  * of `mapInPandas` — per-partition batch processing, no per-row driver
  * round-trips), partitioning behavior, and the frame-sampling explode.
  * Swapping `fakeDecode` for a JNI/codec call changes no plan shape.
  */
object Multimodal {

  /** One decoded media record (the post-"decode" shape). */
  final case class MediaFeatures(
      doc_id: Long,
      mime: String,
      n_bytes: Long,
      width: Long,
      height: Long,
      feature: Array[Double])

  /** Wrap a text table into a media table: payload = utf-8 bytes as `binary`,
    * metadata struct carried alongside. At 100 TB the payload column stays
    * columnar parquet binary — never stringified, never collected. */
  def asMediaTable(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col(textCol), "UTF-8").as("content"),
      struct(
        lit("text/plain").as("mime"),
        octet_length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes")).as("meta"))

  /** STUB decode kernel — deterministic fake standing in for a real codec.
    * Derives "dimensions" and a 4-dim "feature vector" purely from payload
    * bytes so tests and oracles are stable. The payload hash is the first
    * 60 bits of md5 (not an ad-hoc rolling hash) precisely so the feature
    * values are REPLAYABLE IN SQL — DuckDB computes the identical value as
    * `CAST('0x' || substr(md5(text), 1, 15) AS BIGINT)`, which is what lets
    * q_multimodal_decode hash-oracle a payload-dependent feature. */
  private[operators] def fakeDecode(docId: Long, mime: String, content: Array[Byte]): MediaFeatures = {
    val n = content.length.toLong
    val md = java.security.MessageDigest.getInstance("MD5").digest(content)
    // first 15 hex chars = top 60 bits, always non-negative in a Long
    var h = 0L
    var i = 0
    while (i < 15) { h = (h << 4) | ((md(i / 2) >> (if (i % 2 == 0) 4 else 0)) & 0xF); i += 1 }
    MediaFeatures(
      doc_id = docId,
      mime = mime,
      n_bytes = n,
      width = (n % 640L) + 1L,
      height = (n % 480L) + 1L,
      feature = Array((n % 251L).toDouble, (n % 127L).toDouble, (h % 1009L).toDouble, (h % 509L).toDouble))
  }

  /** "Decode + featurize" over the media table: batched per-partition pass
    * (mapPartitions), mirroring how a pandas-UDF batch kernel would run.
    * Output is a flat typed Dataset ready for downstream SQL. */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("meta.mime").as("mime"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { batch => batch.map { case (id, mime, bytes) => fakeDecode(id, mime, bytes) } }
  }

  /** One decoded PCM-WAV record — REAL binary decode (see [[decodeWavPcm]]). */
  final case class WavFeatures(
      doc_id: Long,
      sample_rate: Long,
      n_channels: Long,
      bits_per_sample: Long,
      n_samples: Long,
      peak_abs: Long,
      sum_abs: Long,
      mean_abs: Double)

  /** Deterministic 16-bit mono PCM WAV bytes: a sine tone at `freqHz`.
    * StrictMath keeps the samples bit-identical across JVMs/platforms, so
    * synth→decode round-trips are reproducible. Exists so the WAV decode
    * path has REAL well-formed input in an environment with no media files. */
  def synthesizeWavPcm(
      freqHz: Int,
      nSamples: Int,
      sampleRate: Int = 8000,
      amplitude: Int = 16384): Array[Byte] = {
    val dataSize = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataSize)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1) // PCM, mono
    bb.putInt(sampleRate); bb.putInt(sampleRate * 2) // byte rate = rate * block align
    bb.putShort(2); bb.putShort(16) // block align, bits
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataSize)
    var i = 0
    while (i < nSamples) {
      bb.putShort((amplitude * StrictMath.sin(2 * StrictMath.PI * freqHz * i / sampleRate)).toShort)
      i += 1
    }
    bb.array()
  }

  /** Deterministic 16-bit mono PCM WAV bytes: an INTEGER sawtooth tone.
    * sample(i) = ((i·freqHz mod sampleRate) · 65536) / sampleRate − 32768 —
    * pure int64 math (truncating division), so the synthesis parameters are
    * replayable in SQL, which is what makes the WAV decode query
    * hash-oracle-able (the sine tier's transcendental samples are not; that
    * path stays spec-pinned in ExtensionSpec). These formulas are PINNED by
    * the q_multimodal_wav DuckDB oracle — change them only together. */
  def synthesizeWavSaw(
      freqHz: Int,
      nSamples: Int,
      sampleRate: Int = 8000): Array[Byte] = {
    val dataSize = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataSize)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1) // PCM, mono
    bb.putInt(sampleRate); bb.putInt(sampleRate * 2)
    bb.putShort(2); bb.putShort(16) // block align, bits
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataSize)
    var i = 0
    while (i < nSamples) {
      val phase = (i.toLong * freqHz) % sampleRate
      bb.putShort((phase * 65536L / sampleRate - 32768L).toShort)
      i += 1
    }
    bb.array()
  }

  /** [[synthesizeWavSaw]] with a frame gate: every sample whose
    * 200-sample frame index satisfies `(i div 200) % gateMod == 0` is
    * SILENCED — a deterministic speech-pause stand-in that gives the
    * activity segmenter real on/off structure. Same pure-int64 sample
    * formula (SQL-replayable); PINNED by the q_wav_activity oracle —
    * change them only together. */
  def synthesizeWavGated(
      freqHz: Int,
      nSamples: Int,
      gateMod: Int = 3,
      sampleRate: Int = 8000): Array[Byte] = {
    require(gateMod > 1, s"gateMod must be > 1: $gateMod")
    val dataSize = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataSize)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1) // PCM, mono
    bb.putInt(sampleRate); bb.putInt(sampleRate * 2)
    bb.putShort(2); bb.putShort(16) // block align, bits
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataSize)
    var i = 0
    while (i < nSamples) {
      val gated = (i / 200) % gateMod == 0
      val phase = (i.toLong * freqHz) % sampleRate
      bb.putShort(
        if (gated) 0 else (phase * 65536L / sampleRate - 32768L).toShort)
      i += 1
    }
    bb.array()
  }

  /** Voice-activity segments over a [[wavFrameEnergy]] frame table —
    * gaps-and-islands on the frames whose energy clears the amplitude
    * threshold: the compare is the EXACT integer
    * `sumsq > thresholdAmp²·n_samples` (rms > T without the sqrt), so
    * no float can flip a frame's membership. Per segment: frame span,
    * exact energy sums, rms. The silence-trim / VAD gating step the
    * frame-energy scaladoc promises downstream.
    *
    * Plan: filter + one key-ordered window + one (doc, island)
    * aggregate — a single doc-hashed exchange over frame rows. */
  def activitySegments(
      frames: DataFrame, thresholdAmp: Long = 16384L): DataFrame = {
    require(thresholdAmp > 0, s"thresholdAmp must be positive: $thresholdAmp")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame"))
    frames
      .filter(col("sumsq") >
        lit(thresholdAmp * thresholdAmp) * col("n_samples"))
      .withColumn("__isl", col("frame") - row_number().over(w))
      .groupBy(col("doc_id"), col("__isl"))
      .agg(min(col("frame")).cast("long").as("start_frame"),
        max(col("frame")).cast("long").as("end_frame"),
        count(lit(1)).cast("long").as("n_frames"),
        sum(col("n_samples")).cast("long").as("n_samples"),
        sum(col("sumsq")).cast("long").as("sumsq"))
      .drop("__isl")
      .withColumn("rms",
        round(sqrt(col("sumsq").cast("double") / col("n_samples")), 6))
  }

  /** RIFF/PCM parser: walks the chunk list (even-padded), requires
    * format = 1 (PCM) at 16 bits, scans the data chunk once for amplitude
    * stats. Tolerant contract like ElbLogParser: malformed/truncated/
    * non-PCM input → None, never an exception. */
  /** Walk the RIFF chunk list and locate the 16-bit PCM data chunk:
    * (dataOffset, nInt16Samples, channels, rate, bits). Shared by the
    * summary decoder ([[parseWav]]) and the frame-energy decoder
    * ([[parseWavFrames]]), so the byte-level format handling exists once. */
  private def wavPcmData(bytes: Array[Byte]): Option[(Int, Int, Long, Long, Long)] = {
    if (bytes == null) return None // nullable binary cell -> drop, don't NPE
    def tag(o: Int): String =
      if (bytes.length >= o + 4) new String(bytes, o, 4, "US-ASCII") else ""
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var off = 12
    var fmt: Option[(Long, Long, Long)] = None // channels, rate, bits
    while (off + 8 <= bytes.length) {
      val id = tag(off)
      val size = bb.getInt(off + 4)
      // compare in Long: a crafted size near Int.MaxValue would wrap
      // off+8+size negative and sneak past an Int-typed bounds check
      if (size < 0 || off.toLong + 8L + size > bytes.length) return None // truncated
      id match {
        case "fmt " if size >= 16 =>
          if (bb.getShort(off + 8) != 1) return None // compressed — needs a codec
          fmt = Some((bb.getShort(off + 10).toLong, bb.getInt(off + 12).toLong,
            bb.getShort(off + 22).toLong))
        case "data" =>
          return fmt.collect { case (ch, rate, bits) if bits == 16 && ch >= 1 =>
            (off + 8, size / 2, ch, rate, bits)
          }
        case _ => () // skip LIST/INFO/etc.
      }
      off += 8 + size + (size % 2) // RIFF chunks are even-padded
    }
    None // no data chunk
  }

  private[operators] def parseWav(docId: Long, bytes: Array[Byte]): Option[WavFeatures] =
    wavPcmData(bytes).map { case (dataOff, n, ch, rate, bits) =>
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 0; var sum = 0L; var peak = 0L
      while (i < n) {
        val a = math.abs(bb.getShort(dataOff + 2 * i).toLong)
        sum += a; if (a > peak) peak = a; i += 1
      }
      WavFeatures(docId, rate, ch, bits, n / ch, peak, sum,
        if (n == 0) 0d else sum.toDouble / n)
    }

  final case class WavFrame(
      doc_id: Long,
      frame: Long,
      n_samples: Long,
      sumsq: Long)

  /** Per-frame energy over the decoded PCM stream: non-overlapping
    * `frameLen`-sample frames, each with its EXACT integer Σx² — the
    * energy-envelope primitive under silence trimming and voice-activity
    * gating (the audio analogue of the text quality gate). The decoder
    * emits only integers; the rms (√(Σx²/n)) is derived in the SQL
    * expression layer so both engines apply their own round(…, 6) to the
    * identical integer inputs. Trailing partial frames keep their true n. */
  private[operators] def parseWavFrames(
      docId: Long, bytes: Array[Byte], frameLen: Int): Iterator[WavFrame] =
    wavPcmData(bytes) match {
      case None => Iterator.empty
      case Some((dataOff, n, _, _, _)) =>
        val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        (0 until (n + frameLen - 1) / frameLen).iterator.map { f =>
          val start = f * frameLen
          val len = math.min(frameLen, n - start)
          var i = 0; var sq = 0L
          while (i < len) {
            val a = bb.getShort(dataOff + 2 * (start + i)).toLong
            sq += a * a; i += 1
          }
          WavFrame(docId, f.toLong, len.toLong, sq)
        }
    }

  final case class WavSample(doc_id: Long, n: Long, i: Long, amp: Long)

  /** Per-SAMPLE decode (capped at `maxSamples` per payload) — the raw
    * stream the spectral operators consume; same batched mapPartitions
    * shape as the other decoders. Emits (doc, capped n, index,
    * amplitude); unparseable payloads drop by the tolerant-parse
    * contract. */
  def wavSamples(media: DataFrame, maxSamples: Int = 2048): Dataset[WavSample] = {
    require(maxSamples > 0, s"maxSamples must be positive: $maxSamples")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        wavPcmData(bytes) match {
          case None => Iterator.empty
          case Some((dataOff, n0, _, _, _)) =>
            val bb = java.nio.ByteBuffer.wrap(bytes)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            val n = math.min(n0, maxSamples)
            (0 until n).iterator.map(i =>
              WavSample(id, n.toLong, i.toLong,
                bb.getShort(dataOff + 2 * i).toLong))
        }
      })
  }

  /** Dominant-frequency estimate via a direct DFT sweep over the
    * decoded samples — the real audio feature a curation pipeline
    * wants ("is this payload tonal, and at what pitch?"): for each
    * bin k in 1..maxBins, energy_k = re² + im² with
    * re = Σᵢ amp·cos(2πki/n), im = Σᵢ amp·sin(2πki/n); the peak bin
    * wins (energy desc, k tie-break). Per-sample trig terms are
    * micro-quantized (cos/sin match engines libm-for-libm; a raw
    * double Σ would be order-dependent), so re/im are exact longs and
    * the energy compare is deterministic. Output: peak bin, its energy
    * in amplitude² units, and the bin's frequency in Hz.
    *
    * Plan: samples × broadcast bin list → one (doc, k) hash aggregate
    * → per-doc TakeOrdered-style pick. Work is n·maxBins narrow rows
    * per payload. */
  def wavDominantFreq(
      media: DataFrame, maxBins: Int = 64, maxSamples: Int = 2048,
      sampleRate: Int = 8000): DataFrame = {
    require(maxBins >= 1, s"maxBins must be >= 1: $maxBins")
    val spark = media.sparkSession
    val bins = broadcast(spark.range(1, maxBins + 1)
      .select(col("id").cast("long").as("k")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("__e2").desc, col("k"))
    wavSamples(media, maxSamples).toDF()
      .crossJoin(bins)
      .withColumn("re_t", expr(dftTermMicroSql("cos")))
      .withColumn("im_t", expr(dftTermMicroSql("sin")))
      .groupBy(col("doc_id"), col("n"), col("k"))
      .agg(sum(col("re_t")).cast("long").as("re_micro"),
        sum(col("im_t")).cast("long").as("im_micro"))
      // energy stays an EXACT decimal: the double form re²+im² differed
      // by 1 ulp across engines (FMA contraction on one side), and a
      // decimal→double cast past 2^53 has the r10 1-ulp cast hazard —
      // so the argmax compares exact integers and the exposed copy is
      // STRING-rendered per the decimal contract
      .withColumn("__e2",
        (col("re_micro").cast("decimal(38,0)") * col("re_micro") +
          col("im_micro").cast("decimal(38,0)") * col("im_micro"))
          .cast("decimal(38,0)"))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") === 1)
      .select(col("doc_id"), col("n").as("n_samples"),
        col("k").as("k_peak"),
        col("__e2").cast("string").as("peak_energy_sq"),
        expr(s"round(CAST(k AS DOUBLE) * $sampleRate / n, 6)")
          .as("freq_hz"))
  }

  /** Micro-quantized per-sample DFT term amp·fn(2πki/n). The phase
    * k·i reduces mod n in EXACT integer arithmetic before the trig
    * call — cos/sin of large arguments hit libm argument-reduction
    * differences across engines (measured: the unreduced form
    * hash-mismatched), while [0, 2π) is the well-conditioned core
    * range both agree on. Shared with the oracle. */
  def dftTermMicroSql(fn: String): String =
    s"CAST(ROUND(1000000 * amp * $fn(2 * PI() * ((k * i) % n) / n), 0)" +
      " AS BIGINT)"

  /** Distributed frame-energy decode: same batched mapPartitions shape as
    * [[decodeWavPcm]], fanning each payload out to its frame rows —
    * per-row work is bounded by frameLen, per-doc output by its duration. */
  def wavFrameEnergy(media: DataFrame, frameLen: Int = 200): Dataset[WavFrame] = {
    require(frameLen > 0, s"frameLen must be positive: $frameLen")
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => parseWavFrames(id, bytes, frameLen) })
  }

  /** REAL decode over a (doc_id, content: binary) media table: parse each
    * payload as PCM WAV, emit per-record audio features; unparseable rows
    * drop out (tolerant-parse contract). Same batched mapPartitions shape
    * as [[decodeFeatures]] — this is the proof that the multimodal plumbing
    * carries actual binary formats, not only the stub codec: PCM WAV needs
    * byte parsing, not a codec library, so it runs everywhere. */
  def decodeWavPcm(media: DataFrame): Dataset[WavFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => parseWav(id, bytes) })
  }

  /** One decoded BMP record — REAL binary decode (see [[decodeBmp24]]). */
  final case class BmpFeatures(
      doc_id: Long,
      width: Long,
      height: Long,
      bits_per_pixel: Long,
      n_px: Long,
      px00: Long,
      peak_px: Long,
      mean_px: Double)

  /** Deterministic 24-bit uncompressed BMP bytes (BITMAPINFOHEADER,
    * bottom-up rows, 4-byte row padding): pixel (x, y) is the gray value
    * v = (seed + x + 3·y) mod 251 in all three channels. Pure integer
    * math, so the synthesis parameters — not the bytes — are replayable in
    * SQL, which is what makes the decode query oracle-able (unlike the
    * WAV tier's transcendental sine). Exists so the BMP decode path has
    * REAL well-formed input in an environment with no media files. */
  def synthesizeBmp24(seed: Long, width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"degenerate bitmap: ${width}x$height")
    val stride = (width * 3 + 3) & ~3 // rows pad to 4-byte boundaries
    val dataSize = stride * height
    val bb = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte); bb.putInt(54 + dataSize)
    bb.putInt(0); bb.putInt(54) // reserved, pixel-array offset
    bb.putInt(40); bb.putInt(width); bb.putInt(height) // BITMAPINFOHEADER
    bb.putShort(1); bb.putShort(24) // planes, bpp
    bb.putInt(0); bb.putInt(dataSize) // BI_RGB (uncompressed), image size
    bb.putInt(2835); bb.putInt(2835); bb.putInt(0); bb.putInt(0) // ppm, palette
    var fy = 0 // file rows run bottom-up: file row fy is logical y = h-1-fy
    while (fy < height) {
      val y = height - 1 - fy
      var x = 0
      while (x < width) {
        val v = ((seed + x + 3L * y) % 251L).toByte
        bb.put(v).put(v).put(v) // B, G, R
        x += 1
      }
      var pad = width * 3
      while (pad < stride) { bb.put(0.toByte); pad += 1 }
      fy += 1
    }
    bb.array()
  }

  /** BMP (BITMAPINFOHEADER, 24-bit BI_RGB) parser: fixed-offset header
    * fields, then one pass over the pixel array honoring bottom-up row
    * order and 4-byte row padding. Tolerant contract like [[parseWav]]:
    * malformed / truncated / paletted / compressed input → None, never an
    * exception. All size arithmetic runs in Long — crafted width/height
    * near Int.MaxValue must not wrap the bounds check and read past (or
    * allocate for) the buffer. Stats use the blue channel (the synthesized
    * input is gray, all channels equal); px00 is logical pixel (0, 0) —
    * FIRST pixel of the LAST stored row, so a decoder that ignored
    * bottom-up order or mis-sized the stride would get it wrong. */
  /** Validate the BMP header and locate the pixel array:
    * (dataOffset, width, height, stride). Shared by the summary decoder
    * ([[parseBmp24]]) and the tile decoder ([[parseBmpTiles]]). */
  private def bmpPixelData(bytes: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (bytes == null || bytes.length < 54) return None
    if (bytes(0) != 'B'.toByte || bytes(1) != 'M'.toByte) return None
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val dataOffset = bb.getInt(10)
    val headerSize = bb.getInt(14)
    val width = bb.getInt(18)
    val height = bb.getInt(22) // negative would mean top-down; reject
    val planes = bb.getShort(26)
    val bpp = bb.getShort(28)
    val compression = bb.getInt(30)
    if (headerSize < 40 || planes != 1 || bpp != 24 || compression != 0) return None
    if (width <= 0 || height <= 0) return None
    val stride = (width.toLong * 3 + 3) & ~3L
    // 14 + headerSize must add in Long: headerSize near Int.MaxValue wraps
    // an Int sum negative and a bogus header sneaks past
    if (dataOffset.toLong < 14L + headerSize) return None
    // reject stride alone first: with BOTH dims crafted near Int.MaxValue,
    // stride * height (≤ 2^31 · 6·2^31) overflows even Long and wraps the
    // truncation check negative; once stride ≤ bytes.length ≤ Int.MaxValue
    // the product is ≤ 2^62 and exact
    if (stride > bytes.length) return None
    if (dataOffset.toLong + stride * height > bytes.length) return None // truncated
    Some((dataOffset, width, height, stride))
  }

  private[operators] def parseBmp24(docId: Long, bytes: Array[Byte]): Option[BmpFeatures] = {
    val (dataOffset, width, height, stride) = bmpPixelData(bytes) match {
      case None => return None
      case Some(h) => h
    }
    var sum = 0L; var peak = 0L
    var fy = 0
    while (fy < height) {
      val rowStart = dataOffset.toLong + fy * stride
      var x = 0
      while (x < width) {
        val v = (bytes((rowStart + 3L * x).toInt) & 0xFF).toLong
        sum += v; if (v > peak) peak = v
        x += 1
      }
      fy += 1
    }
    val px00 = (bytes((dataOffset.toLong + (height - 1) * stride).toInt) & 0xFF).toLong
    val nPx = width.toLong * height
    Some(BmpFeatures(docId, width, height, 24L, nPx, px00, peak, // bpp=24 validated in bmpPixelData
      sum.toDouble / nPx)) // exact integer sum -> the division is oracle-stable
  }

  /** (doc_id, content) media table of synthesized BMPs over a documents
    * table: width = 1 + doc_id mod 64, height = 1 + n_chars mod 48. These
    * formulas are PINNED by the q_multimodal_image DuckDB oracle — change
    * them only together. Shared by the driver query and ScaleSmoke so the
    * oracle-checked path is the one exercised at scale. */
  def synthesizeBmpTable(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), col("n_chars"))
      // single-file parquet = ONE partition; spread the synth+decode
      // kernel (explicit count: AQE would coalesce these few KB back)
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[(Long, Long)]
      .mapPartitions(_.map { case (id, nc) =>
        (id, synthesizeBmp24(id, width = (1 + id % 64).toInt, height = (1 + nc % 48).toInt))
      })
      .toDF("doc_id", "content")
  }

  final case class BmpTile(
      doc_id: Long,
      tile_x: Long,
      tile_y: Long,
      n_px: Long,
      sum_px: Long)

  /** Block-mean tiling over the decoded pixel grid — the resize /
    * patch-extraction primitive: `tile`×`tile` blocks (logical top-left
    * origin; edge tiles keep their true pixel count), each with its EXACT
    * integer luminance sum, so the per-tile mean (the downsampled image)
    * derives in the SQL layer and the oracle replays the pixel formula
    * per tile. Per-row output is bounded by ⌈w/t⌉·⌈h/t⌉. */
  private[operators] def parseBmpTiles(
      docId: Long, bytes: Array[Byte], tile: Int): Iterator[BmpTile] =
    bmpPixelData(bytes) match {
      case None => Iterator.empty
      case Some((dataOffset, width, height, stride)) =>
        val tilesX = (width + tile - 1) / tile
        val tilesY = (height + tile - 1) / tile
        val sums = Array.ofDim[Long](tilesX * tilesY)
        val counts = Array.ofDim[Long](tilesX * tilesY)
        var fy = 0
        while (fy < height) {
          val y = height - 1 - fy // file rows are bottom-up
          val rowStart = dataOffset.toLong + fy * stride
          val ty = y / tile
          var x = 0
          while (x < width) {
            val idx = ty * tilesX + x / tile
            sums(idx) += (bytes((rowStart + 3L * x).toInt) & 0xFF).toLong
            counts(idx) += 1L
            x += 1
          }
          fy += 1
        }
        (0 until tilesX * tilesY).iterator.map { i =>
          BmpTile(docId, (i % tilesX).toLong, (i / tilesX).toLong, counts(i), sums(i))
        }
    }

  /** Distributed tile decode: same batched mapPartitions shape as
    * [[decodeBmp24]], fanning each image out to its tile rows. */
  def bmpTileMeans(media: DataFrame, tile: Int = 8): Dataset[BmpTile] = {
    require(tile > 0, s"tile must be positive: $tile")
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => parseBmpTiles(id, bytes, tile) })
  }

  /** Otsu's threshold per image — the classical histogram-based
    * binarization (foreground/background split maximizing between-class
    * variance): over the REAL BMP pixel decode (the tile kernel at
    * tile = 1), build the per-image gray histogram, prefix it, and for
    * each candidate threshold t (class 0 = px ≤ t) score
    * J(t) ∝ (s0·N − S·w0)²/(w0·(N − w0)) — the numerator is an EXACT
    * long from exact prefix sums, squared and divided in two IEEE ops
    * (no fused multiply-add shape, so no FMA-contraction hazard), and
    * the argmax breaks ties on the lowest t. Degenerate thresholds
    * (empty class) drop by contract. Emits the threshold, the
    * foreground fraction, and the exact numerator for audit.
    *
    * Plan: pixel decode → (doc, px) histogram → per-doc ranged prefix
    * → broadcast per-doc totals → argmax pick. Work ∝ pixels, state ∝
    * distinct gray levels per image. */
  def bmpOtsu(media: DataFrame): DataFrame = {
    val px = bmpTileMeans(media, tile = 1).toDF()
      .select(col("doc_id"), col("sum_px").as("px"))
    val hist = px.groupBy(col("doc_id"), col("px"))
      .agg(count(lit(1)).cast("long").as("cnt"))
      .withColumn("pxc", (col("px") * col("cnt")).cast("long"))
    val c = graft.operators.Eval.rangedCumsum(
      hist, Seq("doc_id"), "px", Seq("cnt", "pxc"))
    val tot = broadcast(c.groupBy(col("doc_id"))
      .agg(sum(col("cnt")).cast("long").as("n_px"),
        sum(col("pxc")).cast("long").as("s_tot")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("j").desc, col("px"))
    c.join(tot, Seq("doc_id"))
      .filter(col("cum_cnt") > 0L && col("cum_cnt") < col("n_px"))
      .withColumn("d",
        (col("cum_pxc") * col("n_px") - col("s_tot") * col("cum_cnt"))
          .cast("long"))
      .withColumn("j", expr(otsuJSql))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") === 1)
      .select(col("doc_id"), col("n_px"), col("px").as("threshold"),
        col("d").as("j_num"),
        expr("round(CAST(n_px - cum_cnt AS DOUBLE) / n_px, 6)")
          .as("fg_frac"))
  }

  /** Between-class objective over (d, cum_cnt, n_px): d²/(w0·w1) in
    * two IEEE ops. Shared with the oracle. */
  val otsuJSql: String =
    "(CAST(d AS DOUBLE) * d) / " +
      "(CAST(cum_cnt AS DOUBLE) * (n_px - cum_cnt))"

  /** Perceptual difference-hash (dHash) from the tile-mean grid: one bit
    * per horizontally-adjacent tile pair — set when the left tile is
    * brighter — packed in (tile_y, tile_x) order into a BIGINT. The
    * brightness comparison is the EXACT integer cross-product
    * sum_a·n_b > sum_b·n_a (never a float mean compare, so no tie
    * ambiguity and the SQL oracle replays every bit). Images one tile or
    * narrower have no pairs and drop out, like unparseable payloads.
    *
    * This is the image near-dup primitive: re-encoded/slightly-edited
    * copies keep their brightness gradients, so their dHashes sit within
    * a small Hamming distance — bucket by hash bands and verify with
    * bit_count(xor), exactly the SimHash recipe on the text side.
    *
    * Plan shape: tile rows self-join per image (equi-join on
    * (doc, ty, tx+1) — narrow, image-local), one per-doc window for bit
    * positions, one per-doc agg to pack. Grid ≤ ⌈w/t⌉·⌈h/t⌉ keeps every
    * stage bounded per image. */
  def imageDHash(media: DataFrame, tile: Int = 8): DataFrame = {
    val t = bmpTileMeans(media, tile).toDF()
    val lft = t.select(col("doc_id"), col("tile_x"), col("tile_y"),
      col("n_px").as("n_a"), col("sum_px").as("s_a"))
    val rgt = t.select(col("doc_id"), (col("tile_x") - 1L).as("tile_x"),
      col("tile_y"), col("n_px").as("n_b"), col("sum_px").as("s_b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("tile_y"), col("tile_x"))
    lft.join(rgt, Seq("doc_id", "tile_x", "tile_y"))
      .withColumn("k", (row_number().over(w) - 1).cast("int"))
      .withColumn("bit",
        when(col("s_a") * col("n_b") > col("s_b") * col("n_a"), 1L).otherwise(0L))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_bits"),
        sum(expr("bit * shiftleft(CAST(1 AS BIGINT), k)")).cast("long").as("dhash"))
  }

  /** Perceptual average-hash (aHash) from the same tile-mean grid as
    * [[imageDHash]]: one bit per tile — set when the tile outshines the
    * WHOLE image's mean (vs dHash's horizontal gradient). The compare
    * is the exact integer cross-product sum_tile·n_img > sum_img·n_tile,
    * so the oracle replays every bit. aHash survives global gradient
    * edits dHash keys on (and vice versa) — fuse both for robust image
    * near-dup, same Hamming-LSH downstream. One per-image total + the
    * tile window + one pack aggregate. */
  def imageAHash(media: DataFrame, tile: Int = 8): DataFrame = {
    val t = bmpTileMeans(media, tile).toDF()
    val tot = t.groupBy(col("doc_id"))
      .agg(sum(col("sum_px")).cast("long").as("s_tot"),
        sum(col("n_px")).cast("long").as("n_tot"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("tile_y"), col("tile_x"))
    t.join(tot, Seq("doc_id"))
      .withColumn("k", (row_number().over(w) - 1).cast("int"))
      .withColumn("bit",
        when(col("sum_px") * col("n_tot") > col("s_tot") * col("n_px"),
          1L).otherwise(0L))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_bits"),
        sum(expr("bit * shiftleft(CAST(1 AS BIGINT), k)")).cast("long")
          .as("ahash"))
  }

  /** REAL image decode over a (doc_id, content: binary) media table: parse
    * each payload as 24-bit BMP, emit per-image dimension + pixel stats;
    * unparseable rows drop out. Second real format next to [[decodeWavPcm]]
    * — proves the multimodal binary column is format-plural, same batched
    * mapPartitions shape. */
  def decodeBmp24(media: DataFrame): Dataset[BmpFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => parseBmp24(id, bytes) })
  }

  /** Frame sampling: every `step`-th byte offset becomes a "frame" row —
    * the explode/posexplode shape of video frame extraction. Pure columnar
    * (sequence + posexplode), no kernel needed. */
  def sampleFrames(media: DataFrame, step: Int): DataFrame =
    media
      .select(
        col("doc_id"),
        col("meta.n_bytes").as("n_bytes"),
        // zero-byte payloads must yield zero frames, not an illegal
        // sequence(0, -1, step) boundary error
        posexplode(
          when(col("meta.n_bytes") > 0L,
            sequence(lit(0L), col("meta.n_bytes") - 1, lit(step.toLong)))
            .otherwise(array().cast("array<bigint>")))
          .as(Seq("frame_idx", "byte_offset")))
      .select(
        col("doc_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        col("byte_offset").as("byte_offset"))

  /** Sobel edge energy over the REAL BMP pixel decode — the feature-
    * extraction convolution of an image pipeline, run as two SEPARABLE
    * window passes instead of an 8-neighbor self-join: Sobel factors as
    * [1,2,1]ᵀ⊗[-1,0,1], so Gx is a horizontal central difference
    * (lead−lag over x within each pixel row) followed by a [1,2,1]
    * vertical smooth (lag+2·cur+lead over y within each pixel column),
    * and Gy is the transpose. Everything is exact integer arithmetic
    * over codegen'd window functions — no joins, no floats until the
    * final mean. Interior pixels only (every window term non-null);
    * images narrower than 3 px in either dimension drop out.
    *
    * Output per image: dims, interior count, the exact Σ(|Gx|+|Gy|)
    * edge energy, and the per-pixel mean gradient (round 6).
    *
    * Scale shape: pixel rows partition by (doc, row) / (doc, col) —
    * image-local windows, image-bounded state, corpus-size parallel. */
  def bmpSobelEnergy(media: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val px = bmpTileMeans(media, tile = 1).toDF()
      .select(col("doc_id"), col("tile_x").as("x"), col("tile_y").as("y"),
        col("sum_px").as("v"))
    val wx = Window.partitionBy(col("doc_id"), col("y")).orderBy(col("x"))
    val wy = Window.partitionBy(col("doc_id"), col("x")).orderBy(col("y"))
    val g = px
      .withColumn("dx", lead(col("v"), 1).over(wx) - lag(col("v"), 1).over(wx))
      .withColumn("dy", lead(col("v"), 1).over(wy) - lag(col("v"), 1).over(wy))
      .withColumn("gx",
        lag(col("dx"), 1).over(wy) + col("dx") * 2L + lead(col("dx"), 1).over(wy))
      .withColumn("gy",
        lag(col("dy"), 1).over(wx) + col("dy") * 2L + lead(col("dy"), 1).over(wx))
      .filter(col("gx").isNotNull && col("gy").isNotNull)
    g.groupBy(col("doc_id"))
      .agg(
        (max(col("x")) + 2L).as("width"), // interior x ranges 1..w-2
        (max(col("y")) + 2L).as("height"),
        count(lit(1)).cast("long").as("n_interior"),
        sum(abs(col("gx")) + abs(col("gy"))).cast("long")
          .as("sobel_energy"))
      .withColumn("mean_grad", expr(
        "round(CAST(sobel_energy AS DOUBLE) / CAST(n_interior AS DOUBLE), 6)"))
  }
}
