package graft

import graft.operators.{Dedup, Eval, Multimodal, Normalize, Profiling, Retrieval, RuntimeFilter, Sampling, Sessionize, Similarity, Survival, TextAnalysis, Urls}
import graft.sources.ElbLogParser
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize.MaterializeOps
import graft.SparkEntry._

/** Multimodal-family driver registrations — one slice of [[SparkEntry.queries]] /
  * [[SparkEntry.oracleSql]] (the round-14 monolith split: same entries,
  * same names, merged with a duplicate-key guard in SparkEntry). */
private[graft] object MultimodalEntries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> ((s, dir) => {
      val media = Multimodal.asMediaTable(table(s, dir, "documents"))
      val frames = Multimodal.sampleFrames(media, step = 16)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_frames"))
      media
        .select(col("doc_id"), col("meta.mime").as("mime"), col("meta.n_bytes").as("n_bytes"))
        .join(frames, "doc_id")
    }),
    "q_wav_spectrum" -> ((s, dir) => {
      // Dominant frequency via direct DFT sweep over the DECODED
      // sawtooth payloads (8 docs, bins 1..64): per-sample trig terms
      // micro-quantized so re/im are exact longs; the peak bin should
      // track each doc's synth tone (pinned in the spec).
      import s.implicits._
      val media = table(s, dir, "documents")
        .filter(col("doc_id") < 8L)
        .select(col("doc_id"), col("n_chars"))
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .as[(Long, Long)]
        .mapPartitions(_.map { case (id, nc) =>
          (id, Multimodal.synthesizeWavSaw(
            (100 + id % 400).toInt, (500 + nc % 500).toInt))
        }).toDF("doc_id", "content")
      Multimodal.wavDominantFreq(media)
    }),
    "q_multimodal_wav" -> ((s, dir) => {
      // REAL binary decode, no codec library: synthesize deterministic PCM
      // WAV payloads (integer sawtooth tones parameterized per doc), then
      // parse them back with the RIFF/PCM byte decoder. Proves the
      // multimodal binary column carries an actual media format end-to-end
      // — the stub codec (q_multimodal_decode) stands in only for formats
      // that NEED external codecs. The sawtooth samples are pure int64
      // formulas, so the ORACLE replays synth + amplitude stats per sample
      // in SQL (generate_series) and the decode output hash-matches — like
      // the BMP tier. The sine tier stays spec-pinned in ExtensionSpec.
      import s.implicits._
      val media = table(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
        // single-file parquet = ONE partition; spread the synth+decode
        // kernel (explicit count: AQE would coalesce these few KB back)
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .as[(Long, Long)]
        .mapPartitions(_.map { case (id, nc) =>
          (id, Multimodal.synthesizeWavSaw(
            freqHz = (100 + id % 400).toInt,
            nSamples = (500 + nc % 500).toInt))
        })
        .toDF("doc_id", "content")
      Multimodal.decodeWavPcm(media).toDF()
        .select(col("doc_id"), col("sample_rate"), col("n_channels"),
          col("bits_per_sample"), col("n_samples"), col("peak_abs"), col("sum_abs"))
    }),
    "q_wav_frame_energy" -> ((s, dir) => {
      // Frame-wise RMS energy over the decoded PCM stream (200-sample
      // frames) — the audio feature-extraction step past whole-file stats:
      // silence trimming / VAD gating consume exactly this envelope. Same
      // saw-tone synthesis as q_multimodal_wav (pure int64 formulas), so
      // the oracle replays frame Σx² sample-by-sample in SQL.
      import s.implicits._
      val media = table(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .as[(Long, Long)]
        .mapPartitions(_.map { case (id, nc) =>
          (id, Multimodal.synthesizeWavSaw(
            freqHz = (100 + id % 400).toInt,
            nSamples = (500 + nc % 500).toInt))
        })
        .toDF("doc_id", "content")
      Multimodal.wavFrameEnergy(media, frameLen = 200).toDF()
        .withColumn("rms",
          round(sqrt(col("sumsq").cast("double") / col("n_samples")), 6))
    }),
    "q_image_dhash" -> ((s, dir) => {
      // Perceptual dHash over the synthesized BMP corpus + the Hamming
      // distance to the previous image id (lag window) — the image-side
      // near-dup fingerprint, every bit from exact integer tile compares.
      val h = Multimodal.imageDHash(
        Multimodal.synthesizeBmpTable(table(s, dir, "documents")), tile = 8)
      val w = Window.orderBy(col("doc_id"))
      h.withColumn("hamming_prev",
        bit_count(col("dhash").bitwiseXOR(lag(col("dhash"), 1).over(w))).cast("long"))
    }),
    "q_image_ahash" -> ((s, dir) => {
      // Average-hash over the synthesized BMP corpus + Hamming to the
      // previous id — the global-brightness fingerprint next to
      // q_image_dhash's gradient one; every bit exact.
      val h = Multimodal.imageAHash(
        Multimodal.synthesizeBmpTable(table(s, dir, "documents")), tile = 8)
      val w = Window.orderBy(col("doc_id"))
      h.withColumn("hamming_prev",
        bit_count(col("ahash").bitwiseXOR(lag(col("ahash"), 1).over(w)))
          .cast("long"))
    }),
    "q_image_sobel" -> ((s, dir) =>
      // Sobel edge energy per decoded BMP via two separable window
      // passes (no joins): exact integer |Gx|+|Gy| over interior
      // pixels — the feature-extraction convolution of an image
      // pipeline; the oracle replays the gray-ramp pixel formula.
      Multimodal.bmpSobelEnergy(
        Multimodal.synthesizeBmpTable(table(s, dir, "documents")))),
    "q_image_otsu" -> ((s, dir) =>
      // Otsu binarization threshold per decoded BMP: exact-integer
      // between-class numerator, two-IEEE-op objective, lowest-t
      // tie-break; emits threshold + foreground fraction.
      Multimodal.bmpOtsu(
        Multimodal.synthesizeBmpTable(table(s, dir, "documents")))),
    "q_image_tiles" -> ((s, dir) =>
      // Block-mean 8×8 tiling over the REAL BMP decode — the resize /
      // patch-extraction step of an image pipeline, as exact integer
      // per-tile sums (mean derived in the SQL layer). Same synthesized
      // gray-ramp corpus as q_multimodal_image, so the oracle replays the
      // pixel formula tile-by-tile.
      Multimodal.bmpTileMeans(
        Multimodal.synthesizeBmpTable(table(s, dir, "documents")), tile = 8).toDF()
        .withColumn("mean_px",
          round(col("sum_px").cast("double") / col("n_px"), 6))),
    "q_multimodal_image" -> ((s, dir) => {
      // REAL image decode, no codec library: synthesize deterministic
      // 24-bit BMPs (gray ramp parameterized by doc_id/n_chars), parse
      // them back with the fixed-offset BMP header/pixel decoder. Unlike
      // the WAV tier's transcendental sine, the pixel math is pure integer
      // formulas, so the ORACLE replays the synthesis in SQL and the
      // decode output hash-matches — a fully-oracled real binary format.
      Multimodal.decodeBmp24(Multimodal.synthesizeBmpTable(table(s, dir, "documents")))
        .toDF()
        .withColumn("mean_px", round(col("mean_px"), 6))
    }),
    "q_multimodal_decode" -> ((s, dir) =>
      // Batched stub-decode kernel (mapPartitions) — deterministic fake
      // codec; plumbing is real. The fake feature hash is md5-based
      // (Multimodal.fakeDecode) so even the payload-dependent feature
      // replays in SQL — fully hash-oracled.
      Multimodal.decodeFeatures(Multimodal.asMediaTable(table(s, dir, "documents")))
        .toDF()
        .select(col("doc_id"), col("mime"), col("n_bytes"), col("width"), col("height"),
          round(element_at(col("feature"), 3), 6).as("f3"))),

    // ---- Round 2: temporal joins, sampling/splits, quality, shape ops
    "q_wav_activity" -> ((s, dir) => {
      // Voice-activity segments over the decoded frame-energy stream:
      // a GATED saw tone (every third 200-sample frame silenced) gives
      // real on/off structure; segment membership is the exact integer
      // compare sumsq > T^2*n, islands by frame - row_number.
      import s.implicits._
      val media = table(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .as[(Long, Long)]
        .mapPartitions(_.map { case (id, nc) =>
          (id, Multimodal.synthesizeWavGated(
            freqHz = (100 + id % 400).toInt,
            nSamples = (500 + nc % 500).toInt))
        })
        .toDF("doc_id", "content")
      Multimodal.activitySegments(
        Multimodal.wavFrameEnergy(media, frameLen = 200).toDF(),
        thresholdAmp = 16384L)
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id, 'text/plain' AS mime,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  CAST((octet_length(CAST(text AS BLOB)) + 15) // 16 AS BIGINT) AS n_frames
        |FROM documents""".stripMargin,
    "q_multimodal_image" ->
      // replays the BMP SYNTHESIS formulas (not the bytes): w/h from
      // doc_id/n_chars, pixel (x, y) = (doc_id + x + 3y) mod 251, px00 =
      // logical pixel (0, 0); the Spark side must decode the actual binary
      // (stride, padding, bottom-up rows) to reproduce these numbers
      """WITH p AS (SELECT doc_id, 1 + doc_id % 64 AS w, 1 + n_chars % 48 AS h
        |  FROM documents),
        |v AS (SELECT doc_id, w, h,
        |  [ (doc_id + (i % w) + 3*(i // w)) % 251 FOR i IN range(0, w*h) ] AS px
        |FROM p)
        |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(24 AS BIGINT) AS bits_per_pixel, CAST(w*h AS BIGINT) AS n_px,
        |  CAST(doc_id % 251 AS BIGINT) AS px00,
        |  CAST(list_max(px) AS BIGINT) AS peak_px,
        |  round(CAST(list_sum(px) AS DOUBLE)/(w*h), 6) AS mean_px
        |FROM v""".stripMargin,
    "q_wav_spectrum" ->
      s"""WITH p AS (SELECT doc_id, 100 + doc_id % 400 AS freq,
         |    LEAST(500 + n_chars % 500, 2048) AS n
         |  FROM documents WHERE doc_id < 8),
         |samp AS (SELECT doc_id, n, unnest(range(0, n)) AS i, freq
         |  FROM p),
         |sv AS (SELECT doc_id, n, i,
         |    ((i * freq) % 8000) * 65536 // 8000 - 32768 AS amp
         |  FROM samp),
         |sk AS (SELECT sv.*, k FROM sv,
         |  (SELECT unnest(range(1, 65)) AS k)),
         |t AS (SELECT doc_id, n, k,
         |    ${graft.operators.Multimodal.dftTermMicroSql("cos")} AS re_t,
         |    ${graft.operators.Multimodal.dftTermMicroSql("sin")} AS im_t
         |  FROM sk),
         |g AS (SELECT doc_id, n, k,
         |    CAST(SUM(re_t) AS BIGINT) AS re_micro,
         |    CAST(SUM(im_t) AS BIGINT) AS im_micro
         |  FROM t GROUP BY 1, 2, 3),
         |e AS (SELECT doc_id, n, k,
         |    CAST(CAST(re_micro AS DECIMAL(38,0)) * re_micro +
         |      CAST(im_micro AS DECIMAL(38,0)) * im_micro
         |      AS DECIMAL(38,0)) AS e2
         |  FROM g)
         |SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
         |  CAST(k AS BIGINT) AS k_peak,
         |  CAST(e2 AS VARCHAR) AS peak_energy_sq,
         |  round(CAST(k AS DOUBLE) * 8000 / n, 6) AS freq_hz
         |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY e2 DESC, k) AS r FROM e)
         |WHERE r = 1""".stripMargin,
    "q_multimodal_wav" ->
      // replays the SAWTOOTH SYNTHESIS formulas per sample (not the bytes):
      // freq/n from doc_id/n_chars, sample(i) = ((i·freq) mod 8000)·65536
      // // 8000 − 32768 — the Spark side must parse the actual RIFF/PCM
      // binary (chunk walk, fmt gate, data scan) to reproduce these stats
      """WITH p AS (SELECT doc_id, 100 + doc_id % 400 AS freq,
        |    500 + n_chars % 500 AS n FROM documents),
        |v AS (SELECT doc_id, n,
        |  [ abs(((i * freq) % 8000) * 65536 // 8000 - 32768) FOR i IN range(0, n) ] AS amp
        |FROM p)
        |SELECT doc_id, CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(1 AS BIGINT) AS n_channels, CAST(16 AS BIGINT) AS bits_per_sample,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST(list_max(amp) AS BIGINT) AS peak_abs,
        |  CAST(list_sum(amp) AS BIGINT) AS sum_abs
        |FROM v""".stripMargin,
    "q_wav_frame_energy" ->
      // replays the saw-tone synthesis sample-by-sample (same integer
      // formula as q_multimodal_wav, signed not abs) and folds exact Σx²
      // per 200-sample frame; rms derives from the integers in SQL round()
      """WITH p AS (SELECT doc_id, 100 + doc_id % 400 AS freq,
        |    500 + n_chars % 500 AS n FROM documents),
        |s AS (SELECT doc_id, freq, unnest(range(0, n)) AS i FROM p),
        |v AS (SELECT doc_id, i // 200 AS frame,
        |  ((i * freq) % 8000) * 65536 // 8000 - 32768 AS x FROM s)
        |SELECT doc_id, CAST(frame AS BIGINT) AS frame,
        |  CAST(COUNT(*) AS BIGINT) AS n_samples,
        |  CAST(SUM(x * x) AS BIGINT) AS sumsq,
        |  round(sqrt(CAST(SUM(x * x) AS DOUBLE) / COUNT(*)), 6) AS rms
        |FROM v GROUP BY doc_id, frame""".stripMargin,
    "q_image_dhash" ->
      // replays tile sums from the pixel formula, then every dHash bit via
      // the exact integer cross-product compare; Hamming via bit_count(xor)
      """WITH p AS (SELECT doc_id, 1 + doc_id % 64 AS w, 1 + n_chars % 48 AS h
        |  FROM documents),
        |s AS (SELECT doc_id, w, unnest(range(0, w*h)) AS i FROM p),
        |t AS (SELECT doc_id, (i % w) // 8 AS tile_x, (i // w) // 8 AS tile_y,
        |    CAST(COUNT(*) AS BIGINT) AS n_px,
        |    CAST(SUM((doc_id + (i % w) + 3*(i // w)) % 251) AS BIGINT) AS sum_px
        |  FROM s GROUP BY 1, 2, 3),
        |pr AS (SELECT a.doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY a.doc_id
        |      ORDER BY a.tile_y, a.tile_x) - 1 AS k,
        |    CASE WHEN a.sum_px * b.n_px > b.sum_px * a.n_px
        |      THEN 1 ELSE 0 END AS bit
        |  FROM t a JOIN t b ON b.doc_id = a.doc_id
        |    AND b.tile_y = a.tile_y AND b.tile_x = a.tile_x + 1),
        |hh AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bits,
        |    CAST(SUM(bit * (CAST(1 AS BIGINT) << k)) AS BIGINT) AS dhash
        |  FROM pr GROUP BY 1)
        |SELECT doc_id, n_bits, dhash,
        |  CAST(bit_count(xor(dhash, lag(dhash, 1) OVER (ORDER BY doc_id)))
        |    AS BIGINT) AS hamming_prev
        |FROM hh""".stripMargin,
    "q_image_ahash" ->
      // replays tile + whole-image sums from the pixel formula; every
      // aHash bit via the exact integer cross-product compare
      """WITH p AS (SELECT doc_id, 1 + doc_id % 64 AS w, 1 + n_chars % 48 AS h
        |  FROM documents),
        |s AS (SELECT doc_id, w, unnest(range(0, w*h)) AS i FROM p),
        |t AS (SELECT doc_id, (i % w) // 8 AS tile_x, (i // w) // 8 AS tile_y,
        |    CAST(COUNT(*) AS BIGINT) AS n_px,
        |    CAST(SUM((doc_id + (i % w) + 3*(i // w)) % 251) AS BIGINT) AS sum_px
        |  FROM s GROUP BY 1, 2, 3),
        |tt AS (SELECT doc_id, CAST(SUM(sum_px) AS BIGINT) AS s_tot,
        |    CAST(SUM(n_px) AS BIGINT) AS n_tot FROM t GROUP BY 1),
        |pr AS (SELECT t.doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY t.doc_id
        |      ORDER BY tile_y, tile_x) - 1 AS k,
        |    CASE WHEN sum_px * n_tot > s_tot * n_px THEN 1 ELSE 0 END
        |      AS bit
        |  FROM t JOIN tt USING (doc_id)),
        |hh AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bits,
        |    CAST(SUM(bit * (CAST(1 AS BIGINT) << k)) AS BIGINT) AS ahash
        |  FROM pr GROUP BY 1)
        |SELECT doc_id, n_bits, ahash,
        |  CAST(bit_count(xor(ahash, lag(ahash, 1) OVER (ORDER BY doc_id)))
        |    AS BIGINT) AS hamming_prev
        |FROM hh""".stripMargin,
    "q_image_sobel" ->
      // the same gray-ramp replay as q_image_tiles, then the identical
      // separable Sobel windows the engine runs over the decoded pixels
      """WITH p AS (SELECT doc_id, 1 + doc_id % 64 AS w, 1 + n_chars % 48 AS h
        |  FROM documents),
        |s AS (SELECT doc_id, w, unnest(range(0, w*h)) AS i FROM p),
        |v AS (SELECT doc_id, i % w AS x, i // w AS y,
        |    (doc_id + (i % w) + 3*(i // w)) % 251 AS v FROM s),
        |d AS (SELECT doc_id, x, y,
        |    LEAD(v, 1) OVER wx - LAG(v, 1) OVER wx AS dx,
        |    LEAD(v, 1) OVER wy - LAG(v, 1) OVER wy AS dy
        |  FROM v WINDOW wx AS (PARTITION BY doc_id, y ORDER BY x),
        |    wy AS (PARTITION BY doc_id, x ORDER BY y)),
        |g AS (SELECT doc_id, x, y,
        |    LAG(dx, 1) OVER wy2 + dx * 2 + LEAD(dx, 1) OVER wy2 AS gx,
        |    LAG(dy, 1) OVER wx2 + dy * 2 + LEAD(dy, 1) OVER wx2 AS gy
        |  FROM d WINDOW wy2 AS (PARTITION BY doc_id, x ORDER BY y),
        |    wx2 AS (PARTITION BY doc_id, y ORDER BY x))
        |SELECT doc_id, CAST(MAX(x) + 2 AS BIGINT) AS width,
        |  CAST(MAX(y) + 2 AS BIGINT) AS height,
        |  CAST(COUNT(*) AS BIGINT) AS n_interior,
        |  CAST(SUM(abs(gx) + abs(gy)) AS BIGINT) AS sobel_energy,
        |  round(CAST(SUM(abs(gx) + abs(gy)) AS DOUBLE) / COUNT(*), 6)
        |    AS mean_grad
        |FROM g WHERE gx IS NOT NULL AND gy IS NOT NULL
        |GROUP BY 1""".stripMargin,
    "q_image_otsu" ->
      s"""WITH p AS (SELECT doc_id, 1 + doc_id % 64 AS w,
         |    1 + n_chars % 48 AS h FROM documents),
         |s AS (SELECT doc_id, w, unnest(range(0, w*h)) AS i FROM p),
         |v AS (SELECT doc_id,
         |    (doc_id + (i % w) + 3*(i // w)) % 251 AS px FROM s),
         |hist AS (SELECT doc_id, px, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM v GROUP BY 1, 2),
         |c AS (SELECT doc_id, px, cnt,
         |    CAST(SUM(cnt) OVER pw AS BIGINT) AS cum_cnt,
         |    CAST(SUM(px * cnt) OVER pw AS BIGINT) AS cum_pxc,
         |    CAST(SUM(cnt) OVER (PARTITION BY doc_id) AS BIGINT)
         |      AS n_px,
         |    CAST(SUM(px * cnt) OVER (PARTITION BY doc_id) AS BIGINT)
         |      AS s_tot
         |  FROM hist WINDOW pw AS (PARTITION BY doc_id ORDER BY px
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |f AS (SELECT doc_id, px, cum_cnt, n_px,
         |    CAST(cum_pxc * n_px - s_tot * cum_cnt AS BIGINT) AS d
         |  FROM c WHERE cum_cnt > 0 AND cum_cnt < n_px),
         |j AS (SELECT *, ${graft.operators.Multimodal.otsuJSql} AS j
         |  FROM f)
         |SELECT doc_id, n_px, CAST(px AS BIGINT) AS threshold,
         |  d AS j_num,
         |  round(CAST(n_px - cum_cnt AS DOUBLE) / n_px, 6) AS fg_frac
         |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY j DESC, px) AS r FROM j)
         |WHERE r = 1""".stripMargin,
    "q_image_tiles" ->
      // replays the gray-ramp pixel formula (same as q_multimodal_image)
      // grouped into 8×8 logical tiles; edge tiles keep their true n_px
      """WITH p AS (SELECT doc_id, 1 + doc_id % 64 AS w, 1 + n_chars % 48 AS h
        |  FROM documents),
        |s AS (SELECT doc_id, w, unnest(range(0, w*h)) AS i FROM p),
        |v AS (SELECT doc_id, (i % w) // 8 AS tile_x, (i // w) // 8 AS tile_y,
        |  (doc_id + (i % w) + 3*(i // w)) % 251 AS px FROM s)
        |SELECT doc_id, CAST(tile_x AS BIGINT) AS tile_x,
        |  CAST(tile_y AS BIGINT) AS tile_y,
        |  CAST(COUNT(*) AS BIGINT) AS n_px, CAST(SUM(px) AS BIGINT) AS sum_px,
        |  round(CAST(SUM(px) AS DOUBLE) / COUNT(*), 6) AS mean_px
        |FROM v GROUP BY doc_id, tile_x, tile_y""".stripMargin,
    "q_multimodal_decode" ->
      // replays the stub codec's formulas: dims from the byte length, f3
      // from the md5-derived 60-bit payload hash (same bytes: DuckDB md5
      // hashes the VARCHAR's UTF-8 encoding, the kernel hashes the binary
      // content column = UTF-8 encode of text)
      """SELECT doc_id, 'text/plain' AS mime,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  CAST(octet_length(CAST(text AS BLOB)) % 640 + 1 AS BIGINT) AS width,
        |  CAST(octet_length(CAST(text AS BLOB)) % 480 + 1 AS BIGINT) AS height,
        |  round(CAST(CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) % 1009 AS DOUBLE), 6) AS f3
        |FROM documents""".stripMargin,
    "q_wav_activity" ->
      // replays the GATED saw synthesis sample-by-sample (the
      // synthesizeWavGated formula), folds exact frame sums, then the
      // same integer threshold + gaps-and-islands segmentation
      """WITH p AS (SELECT doc_id, 100 + doc_id % 400 AS freq,
        |    500 + n_chars % 500 AS n FROM documents),
        |s AS (SELECT doc_id, freq, unnest(range(0, n)) AS i FROM p),
        |v AS (SELECT doc_id, i // 200 AS frame,
        |    CASE WHEN (i // 200) % 3 = 0 THEN 0
        |      ELSE ((i * freq) % 8000) * 65536 // 8000 - 32768 END AS x
        |  FROM s),
        |f AS (SELECT doc_id, CAST(frame AS BIGINT) AS frame,
        |    CAST(COUNT(*) AS BIGINT) AS n_samples,
        |    CAST(SUM(x * x) AS BIGINT) AS sumsq
        |  FROM v GROUP BY 1, 2),
        |a AS (SELECT *, frame - row_number() OVER (PARTITION BY doc_id
        |      ORDER BY frame) AS isl
        |  FROM f WHERE sumsq > 268435456 * n_samples),
        |g AS (SELECT doc_id, isl,
        |    CAST(MIN(frame) AS BIGINT) AS start_frame,
        |    CAST(MAX(frame) AS BIGINT) AS end_frame,
        |    CAST(COUNT(*) AS BIGINT) AS n_frames,
        |    CAST(SUM(n_samples) AS BIGINT) AS n_samples,
        |    CAST(SUM(sumsq) AS BIGINT) AS sumsq
        |  FROM a GROUP BY 1, 2)
        |SELECT doc_id, start_frame, end_frame, n_frames, n_samples,
        |  sumsq, round(sqrt(CAST(sumsq AS DOUBLE) / n_samples), 6) AS rms
        |FROM g""".stripMargin,
  )
}
