package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-local batches.
  *
  * IMAGE decode is REAL: `javax.imageio` ships with every JVM
  * (PNG/JPEG/GIF/BMP), so [[decodeImage]] returns actual dimensions and
  * an 8-bucket luma-histogram feature, and [[resizeEncode]] performs an
  * actual pixel resize + PNG re-encode — no external dependency, and the
  * same code runs on any executor. AUDIO decode is REAL ([[decodeWav]]
  * chunk-walks RIFF/WAVE and decodes PCM16), and VIDEO container
  * metadata is REAL ([[decodeMp4]] box-walks ISO-BMFF/MP4 for
  * timescale/duration/tracks/dimensions/codec — frame PIXEL decode is
  * out of scope pure-JVM, exactly as it is for Delta/Iceberg-hosted
  * corpora, where frame extraction runs in a codec UDF). Bytes NO
  * installed reader accepts fall back to [[decodeStub]]'s
  * deterministic pseudo-features, so the batched pipeline shape —
  * bounded mapPartitions batches (the mapInPandas analog), size-aware
  * repartitioning, typed schema — processes every modality uniformly
  * and adding a codec never changes the plumbing.
  */
object Multimodal {

  /** Typed metadata carried alongside the opaque payload. */
  final case class MediaMeta(mimeType: String, sizeBytes: Long)

  final case class MediaRecord(media_id: Long, media: Array[Byte], meta: MediaMeta)

  final case class DecodedMedia(
      media_id: Long, sizeBytes: Long, width: Int, height: Int,
      nFrames: Int, feature: Array[Float])

  /** STUB decode for modalities with no in-JVM codec (audio/video):
    * deterministic pseudo-dimensions and a tiny feature vector derived
    * from the raw bytes.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    // Long arithmetic + floorMod: the products overflow Int for
    // payloads past ~69 MB, where Scala's % would then yield NEGATIVE
    // pseudo-dimensions/features. Identical values in the non-overflow
    // regime (all operands non-negative), so the oracle grid is
    // unchanged.
    val n = bytes.length.toLong
    val first = if (bytes.nonEmpty) (bytes(0) & 0xff).toLong else 0L
    val width = (16 + n % 640).toInt
    val height = (16 + Math.floorMod(n * 31 + first, 480L)).toInt
    val nFrames = (1 + first % 30).toInt
    val feature = Array.tabulate(8)(i =>
      Math.floorMod(n * (i + 1) + first, 997L) / 997.0f)
    (width, height, nFrames, feature)
  }

  /** REAL image decode through the JDK's own `javax.imageio`
    * (PNG/JPEG/GIF/BMP — present on every JVM, no dependency): actual
    * (width, height, 1 frame) plus an 8-bucket luma histogram sampled on
    * a ≤64×64 grid, so the feature stays O(1) per image regardless of
    * resolution. None when no installed reader accepts the bytes
    * (corrupt payload, non-image modality) — callers fall back to the
    * stub and the pipeline shape is unchanged.
    */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Float])] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val hist = new Array[Float](8)
        val sx = math.max(1, w / 64)
        val sy = math.max(1, h / 64)
        var n = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            hist(lum >> 5) += 1f
            n += 1
            x += sx
          }
          y += sy
        }
        if (n > 0) { var i = 0; while (i < 8) { hist(i) /= n; i += 1 } }
        Some((w, h, 1, hist))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Build a media table from any (id, payload-string) source — used by
    * tests/fixtures since no binary table ships in testdata. Bytes are the
    * UTF-8 payload; metadata is typed.
    */
  def mediaFromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("media"),
      struct(
        lit("application/octet-stream").as("mimeType"),
        octet_length(col(textCol)).cast("long").as("sizeBytes")
      ).as("meta"))

  /** Batched decode/feature-extraction over the binary column — the
    * mapInPandas analog: each partition is processed in bounded batches so
    * a codec can amortize setup per batch without unbounded memory.
    * Size-aware repartition first: payload bytes, not row counts, drive
    * decode cost at scale.
    */
  def extractFeatures(
      media: DataFrame, batchSize: Int = 64, numPartitions: Int = 0
  ): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    val src = (if (numPartitions > 0) media.repartition(numPartitions, col("media_id"))
               else media)
      .select(col("media_id").cast("long"), col("media"),
        col("meta.sizeBytes").cast("long").as("sizeBytes"))
      .as[(Long, Array[Byte], Long)]
    src.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch setup point: a stateful codec would init here once
        // per batch; ImageIO is stateless so decode is per-row
        batch.iterator.map { case (id, bytes, size) =>
          val (w, h, f, feat) =
            decodeImage(bytes).getOrElse(decodeStub(bytes))
          DecodedMedia(id, size, w, h, f, feat)
        }
      }
    }
  }

  final case class ResizedMedia(
      media_id: Long, out_width: Int, out_height: Int, resized: Boolean,
      media: Array[Byte])

  /** REAL resize + re-encode for image payloads: decode via ImageIO,
    * scale the longest side down to `maxDim` (never upscale) with
    * bilinear interpolation, re-encode PNG (lossless, always writable).
    * Non-image payloads pass through byte-identical with `resized =
    * false` and zeroed dimensions — a mixed-modality table keeps every
    * row, and downstream stages key on the flag. Batched mapPartitions,
    * same shape as [[extractFeatures]].
    */
  def resizeEncode(media: DataFrame, maxDim: Int,
      batchSize: Int = 64): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    require(maxDim > 0, "maxDim must be positive")
    media.select(col("media_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytes) =>
            val img = try Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes)))
            catch { case scala.util.control.NonFatal(_) => None }
            img match {
              case Some(src) =>
                val w = src.getWidth
                val h = src.getHeight
                val long = math.max(w, h)
                if (long <= maxDim) ResizedMedia(id, w, h, resized = false, bytes)
                else {
                  val ow = math.max(1, w * maxDim / long)
                  val oh = math.max(1, h * maxDim / long)
                  val dst = new java.awt.image.BufferedImage(ow, oh,
                    java.awt.image.BufferedImage.TYPE_INT_RGB)
                  val g = dst.createGraphics()
                  try {
                    g.setRenderingHint(
                      java.awt.RenderingHints.KEY_INTERPOLATION,
                      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                    g.drawImage(src, 0, 0, ow, oh, null): Unit
                  } finally g.dispose()
                  val bos = new java.io.ByteArrayOutputStream()
                  javax.imageio.ImageIO.write(dst, "png", bos)
                  ResizedMedia(id, ow, oh, resized = true, bos.toByteArray)
                }
              case None => // not an image: pass through untouched
                ResizedMedia(id, 0, 0, resized = false, bytes)
            }
          }
        }
      }
  }

  /** STUB resize plan: metadata-only transform over already-decoded
    * dimensions (the real pixel path is [[resizeEncode]]).
    */
  def resize(decoded: Dataset[DecodedMedia], maxDim: Int): DataFrame =
    decoded.toDF().withColumn("scale_e4",
      when(greatest(col("width"), col("height")) <= maxDim, lit(10000L))
        .otherwise(floor(lit(maxDim) * lit(10000.0) / greatest(col("width"), col("height"))).cast("long")))
      .withColumn("out_width", floor(col("width") * col("scale_e4") / lit(10000.0)).cast("int"))
      .withColumn("out_height", floor(col("height") * col("scale_e4") / lit(10000.0)).cast("int"))

  /** Deterministic frame sampling plan: every `stride`-th frame index. */
  def frameSamplePlan(decoded: Dataset[DecodedMedia], stride: Int): DataFrame =
    decoded.toDF().select(col("media_id"),
      sequence(lit(0), col("nFrames") - 1, lit(stride)).as("frame_indices"))

  // ---------- audio: REAL RIFF/WAV PCM decode (pure JVM) ----------

  /** Parsed WAV metadata + integer-grid waveform statistics. Every
    * field is exact integer arithmetic over the decoded samples, so the
    * decode is verifiable in any engine.
    */
  final case class WavMeta(
      sampleRate: Int, nChannels: Int, bitsPerSample: Int, nSamples: Long,
      durationMs: Long, sumSq: Long, zeroCrossings: Long, peakAbs: Int)

  /** REAL RIFF/WAVE parser — pure JVM, no codec dependency: validates
    * the RIFF/WAVE container, then WALKS the chunk list (word-aligned,
    * skipping unknown chunks like LIST/INFO) to find `fmt ` (must be
    * PCM, format tag 1) and `data`, and decodes the 16-bit
    * little-endian PCM samples. Returns None for anything that is not
    * a well-formed PCM16 WAV (truncated header, missing chunks,
    * compressed format) — callers fall back to [[decodeStub]], keeping
    * the mixed-modality pipeline total. [[decodeMp4]] is the video
    * counterpart (container metadata; no pure-JVM pixel codec exists).
    *
    * Statistics are exact integers: `sumSq` = Σ s², `zeroCrossings` =
    * #{i : s_i·s_{i+1} < 0} over the channel-interleaved stream,
    * `peakAbs` = max |s|, `durationMs` = frames·1000 div rate.
    */
  def decodeWav(bytes: Array[Byte]): Option[WavMeta] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def u32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)).toLong |
        (u8(i + 3).toLong << 24)
    def tag(i: Int): String =
      new String(bytes, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var fmt: Option[(Int, Int, Int, Int)] = None // (format, ch, rate, bits)
    var data: Option[(Int, Int)] = None // (offset, size)
    var p = 12
    while (p + 8 <= bytes.length) {
      val id = tag(p)
      val size = u32(p + 4)
      if (size < 0 || p + 8 + size > bytes.length) return None
      val sz = size.toInt
      if (id == "fmt " && sz >= 16)
        fmt = Some((u16(p + 8), u16(p + 10), u32(p + 12).toInt, u16(p + 22)))
      else if (id == "data") data = Some((p + 8, sz))
      p += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    (fmt, data) match {
      case (Some((1, ch, rate, 16)), Some((off, sz)))
          if ch >= 1 && rate > 0 && sz % 2 == 0 =>
        val n = sz / 2
        var sumSq = 0L
        var zc = 0L
        var peak = 0
        var prev = 0
        var i = 0
        while (i < n) {
          val s = (u16(off + 2 * i) << 16) >> 16 // sign-extend LE int16
          sumSq += s.toLong * s
          if (i > 0 && prev.toLong * s < 0) zc += 1
          val a = math.abs(s)
          if (a > peak) peak = a
          prev = s
          i += 1
        }
        val frames = n.toLong / ch
        Some(WavMeta(rate, ch, 16, n.toLong, frames * 1000L / rate,
          sumSq, zc, peak))
      case _ => None
    }
  }

  /** Serialize PCM16 samples into a REAL WAV container — RIFF header,
    * `fmt ` chunk, a LIST/INFO chunk (so [[decodeWav]] genuinely has
    * to walk and skip unknown chunks — a fixed-offset "parser" fails
    * on it), then `data`.
    */
  def encodeWav(samples: Array[Short], sampleRate: Int,
      nChannels: Int = 1): Array[Byte] = {
    val info = "GRFT".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val dataSz = samples.length * 2
    val listSz = 4 + info.length // "INFO" + payload
    val riffSz = 4 + (8 + 16) + (8 + listSz + (listSz & 1)) + (8 + dataSz)
    val bb = java.nio.ByteBuffer.allocate(8 + riffSz)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(riffSz).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16)
      .putShort(1.toShort).putShort(nChannels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * nChannels * 2) // byte rate
      .putShort((nChannels * 2).toShort)  // block align
      .putShort(16.toShort)
    bb.put("LIST".getBytes).putInt(listSz).put("INFO".getBytes).put(info)
    if ((listSz & 1) == 1) bb.put(0.toByte)
    bb.put("data".getBytes).putInt(dataSz)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Build a REAL WAV media table from any (id, payload-string) source
    * (no binary audio ships in testdata): sample i is the i-th code
    * point of the text, centered and scaled to int16
    * (`(cp mod 256 − 128)·256`), at a per-row sample rate
    * `8000 + (id mod 8)·1000` Hz mono — a pure integer function of the
    * row, so an independent engine can verify the DECODER by computing
    * the expected statistics from the text directly. Batched
    * mapPartitions, the same shape as [[extractFeatures]].
    */
  def wavFromText(df: DataFrame, idCol: String, textCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
        coalesce(col(textCol), lit("")).as("__t"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, text) =>
            val cps = text.codePoints().toArray
            val samples = cps.map(cp => (((cp % 256) - 128) * 256).toShort)
            val rate = 8000 + (((id % 8) + 8) % 8).toInt * 1000
            (id, encodeWav(samples, rate))
          }
        }
      }.toDF("media_id", "media")
  }

  // ---------- video: REAL ISO-BMFF/MP4 container metadata (pure JVM) ----------

  /** Parsed MP4 container metadata: movie-header timescale/duration,
    * track count, the first track's presentation dimensions (tkhd
    * 16.16 fixed-point, integer part) and sample-description codec
    * fourcc. Pure integer arithmetic — verifiable in any engine.
    */
  final case class Mp4Meta(timescale: Int, durationUnits: Long,
      durationMs: Long, nTracks: Int, width: Int, height: Int,
      codec: String)

  /** REAL ISO-BMFF (MP4) box walker — pure JVM, no codec dependency
    * (the [[decodeWav]] playbook applied to the last stubbed modality):
    * validates the `ftyp` brand box, then WALKS the top-level box list
    * (skipping `free`/`mdat`/unknown boxes, including 64-bit
    * largesize boxes) to `moov`, and within it parses
    *
    *  - `mvhd` (version 0): movie timescale and duration;
    *  - each `trak`'s `tkhd` (version 0): the track's presentation
    *    width/height — 16.16 fixed-point at payload offsets 76/80;
    *  - each `trak`'s `mdia`/`minf`/`stbl`/`stsd`: the first sample
    *    entry's codec fourcc (`avc1`, `hev1`, `mp4a`, …).
    *
    * Returns the movie header fields, the track count, and the FIRST
    * track's dimensions + fourcc (our synthesizer and real muxers both
    * put the primary video track first); None for anything that is not
    * a well-formed version-0 MP4 (missing ftyp/moov/mvhd, truncated
    * box, nested overrun) — callers fall back to [[decodeStub]],
    * keeping the mixed-modality pipeline total.
    */
  def decodeMp4(bytes: Array[Byte]): Option[Mp4Meta] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def u64(i: Int): Long = (u32(i) << 32) | u32(i + 4)
    def tag(i: Int): String =
      new String(bytes, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    // walk the children of [start, end): (type, payloadStart, payloadEnd)
    def children(start: Int, end: Int): Option[List[(String, Int, Int)]] = {
      var p = start
      val out = scala.collection.mutable.ListBuffer[(String, Int, Int)]()
      while (p < end) {
        if (p + 8 > end) return None
        val sz32 = u32(p)
        val (hdr, sz) =
          if (sz32 == 1L) { // 64-bit largesize
            if (p + 16 > end) return None
            (16, u64(p + 8))
          } else if (sz32 == 0L) (8, (end - p).toLong) // box extends to end
          else (8, sz32)
        if (sz < hdr || p + sz > end) return None
        out += ((tag(p + 4), p + hdr, p + sz.toInt))
        p += sz.toInt
      }
      Some(out.toList)
    }
    def child(cs: List[(String, Int, Int)], t: String): Option[(Int, Int)] =
      cs.collectFirst { case (`t`, a, b) => (a, b) }
    if (bytes.length < 8) return None
    for {
      top <- children(0, bytes.length)
      _ <- child(top, "ftyp")
      (ms, me) <- child(top, "moov")
      moov <- children(ms, me)
      (hs, he) <- child(moov, "mvhd")
      // version-0 mvhd payload: ver/flags 4 + ctime 4 + mtime 4 +
      // timescale 4 + duration 4
      if he - hs >= 20 && u8(hs) == 0
      traks = moov.collect { case ("trak", a, b) => (a, b) }
      if traks.nonEmpty
      first <- children(traks.head._1, traks.head._2)
      (ts, te) <- child(first, "tkhd")
      // version-0 tkhd payload: ver/flags 4, ctime 4, mtime 4, id 4,
      // rsvd 4, duration 4, rsvd 8, layer/alt/vol/rsvd 8, matrix 36,
      // then width/height as 16.16 fixed
      if te - ts >= 84 && u8(ts) == 0
      (mds, mde) <- child(first, "mdia")
      mdia <- children(mds, mde)
      (mis, mie) <- child(mdia, "minf")
      minf <- children(mis, mie)
      (sts, ste) <- child(minf, "stbl")
      stbl <- children(sts, ste)
      (sds, sde) <- child(stbl, "stsd")
      // stsd payload: ver/flags 4 + entry_count 4, then the first
      // sample entry's own (size, fourcc) header
      if sde - sds >= 16 && u32(sds + 4) >= 1
    } yield {
      val timescale = u32(hs + 12)
      val duration = u32(hs + 16)
      Mp4Meta(timescale.toInt, duration,
        if (timescale > 0) duration * 1000L / timescale else 0L,
        traks.size, (u32(ts + 76) >> 16).toInt, (u32(ts + 80) >> 16).toInt,
        tag(sds + 12))
    }
  }

  /** Serialize a REAL minimal ISO-BMFF container: `ftyp`, a `free` box,
    * the `mdat` payload BEFORE `moov` (so a fixed-offset "parser" fails
    * — [[decodeMp4]] genuinely has to walk), then
    * `moov(mvhd, trak(tkhd, mdia(mdhd, hdlr, minf(stbl(stsd(entry))))),
    * …)`. One trak per (fourcc, width, height) triple, in order.
    */
  def encodeMp4(timescale: Int, durationUnits: Long,
      tracks: Seq[(String, Int, Int)], mdat: Array[Byte]): Array[Byte] = {
    def be32(v: Long): Array[Byte] = Array(
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def fourcc(s: String): Array[Byte] =
      s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    def box(t: String, payload: Array[Byte]*): Array[Byte] = {
      val n = 8L + payload.map(_.length.toLong).sum
      (be32(n) ++ fourcc(t)) ++ payload.flatten
    }
    val mvhd = box("mvhd", Array[Byte](0, 0, 0, 0), // version 0 + flags
      be32(0), be32(0), // ctime, mtime
      be32(timescale.toLong), be32(durationUnits),
      be32(0x00010000L), // rate 1.0
      Array.fill[Byte](70)(0), // vol/rsvd/matrix/predefines
      be32(tracks.size + 1L)) // next track id
    val traks = tracks.zipWithIndex.map { case ((cc, w, h), i) =>
      val tkhd = box("tkhd", Array[Byte](0, 0, 0, 7), // v0, enabled flags
        be32(0), be32(0), be32(i + 1L), be32(0), be32(durationUnits),
        Array.fill[Byte](8)(0), // reserved
        Array.fill[Byte](8)(0), // layer/alt-group/volume/reserved
        be32(0x00010000L), be32(0), be32(0), be32(0), be32(0x00010000L),
        be32(0), be32(0), be32(0), be32(0x40000000L), // identity matrix
        be32(w.toLong << 16), be32(h.toLong << 16))
      val mdhd = box("mdhd", Array[Byte](0, 0, 0, 0),
        be32(0), be32(0), be32(timescale.toLong), be32(durationUnits),
        Array[Byte](0x55, 0xC4.toByte, 0, 0)) // language 'und' + predefined
      val hdlr = box("hdlr", Array[Byte](0, 0, 0, 0), be32(0),
        fourcc(if (cc == "mp4a") "soun" else "vide"),
        Array.fill[Byte](12)(0), Array[Byte](0))
      val entry = box(cc, Array.fill[Byte](6)(0), // sample-entry reserved
        Array[Byte](0, 1)) // data-reference index
      val stsd = box("stsd", Array[Byte](0, 0, 0, 0), be32(1), entry)
      val stbl = box("stbl", stsd)
      val minf = box("minf", stbl)
      val mdia = box("mdia", mdhd, hdlr, minf)
      box("trak", tkhd, mdia)
    }
    val moov = box("moov", (mvhd +: traks): _*)
    val ftyp = box("ftyp", fourcc("isom"), be32(512), fourcc("isom"),
      fourcc("iso2"))
    val free = box("free", fourcc("GRFT"))
    ftyp ++ free ++ box("mdat", mdat) ++ moov
  }

  /** Build a REAL MP4 media table from any (id, payload-string) source
    * (no binary video ships in testdata): every container field is a
    * pure integer function of the row — timescale `600 + (id mod
    * 4)·100`, duration `chars·25` units, `1 + (id mod 2)` tracks, a
    * first video track at `(160 + chars mod 480) × (120 + id mod 240)`
    * with fourcc `[avc1, hev1, vp09][(id + chars) mod 3]` (plus an
    * `mp4a` audio track on odd ids), mdat = the UTF-8 text — so an
    * independent engine can verify the WALKER by recomputing the
    * expected metadata from the text directly. Batched mapPartitions,
    * the [[wavFromText]] shape.
    */
  def mp4FromText(df: DataFrame, idCol: String, textCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
        coalesce(col(textCol), lit("")).as("__t"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, text) =>
            val chars = text.codePointCount(0, text.length).toLong
            val timescale = (600 + Math.floorMod(id, 4L) * 100).toInt
            val video = (Seq("avc1", "hev1", "vp09")(
              Math.floorMod(id + chars, 3L).toInt),
              (160 + chars % 480).toInt,
              (120 + Math.floorMod(id, 240L)).toInt)
            val tracks =
              if (Math.floorMod(id, 2L) == 1L) Seq(video, ("mp4a", 0, 0))
              else Seq(video)
            (id, encodeMp4(timescale, chars * 25, tracks,
              text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
          }
        }
      }.toDF("media_id", "media")
  }

  /** Batched MP4 metadata extraction over a binary media column: REAL
    * box walk via [[decodeMp4]]; rows whose payload is not a
    * well-formed MP4 are DROPPED (modality dispatch by decode success —
    * the [[extractAudioMeta]] contract).
    */
  def extractVideoMeta(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { case (id, bytes) =>
            decodeMp4(bytes).map(m => (id, m.timescale, m.durationUnits,
              m.durationMs, m.nTracks, m.width, m.height, m.codec))
          }
        }
      }.toDF("media_id", "timescale", "duration_units", "duration_ms",
        "n_tracks", "width", "height", "codec")
  }

  /** Batched WAV decode over a binary media column: REAL parse via
    * [[decodeWav]]; rows whose payload is not a PCM16 WAV are DROPPED
    * (the caller's non-audio stream goes through [[extractFeatures]]'s
    * image/stub path instead — modality dispatch by decode success,
    * the same contract as [[resizeEncode]]'s pass-through).
    */
  def extractAudioMeta(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { case (id, bytes) =>
            decodeWav(bytes).map(m => (id, m.sampleRate, m.nChannels,
              m.bitsPerSample, m.nSamples, m.durationMs, m.sumSq,
              m.zeroCrossings, m.peakAbs))
          }
        }
      }.toDF("media_id", "sample_rate", "n_channels", "bits", "n_samples",
        "duration_ms", "sum_sq", "zero_crossings", "peak_abs")
  }
}
