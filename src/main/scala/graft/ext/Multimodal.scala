package graft.ext

import java.io.ByteArrayInputStream
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video carried as opaque
  * `binary` payloads with typed metadata, processed in partition-sized
  * batches. The Spark-side mechanics — schema, partitioning, batch
  * iterator shape, explode of per-frame rows — are real and tested.
  *
  * All three modality paths are real end to end: payloads are
  * genuine PNG files (written by [[PngCodec]], a deterministic
  * stored-deflate encoder) decoded through `javax.imageio.ImageIO`,
  * genuine WAV files (written by [[WavCodec]]) parsed through
  * `javax.sound.sampled`, and genuine AVI containers (written by
  * [[AviCodec]], uncompressed 24-bit DIB frames) parsed by a RIFF
  * chunk walk in [[MediaCodec.decodeVideo]] — dims/pixels/sample-
  * rate/frame-counts come out of actual decoders, so a codec bug
  * fails the cross-engine hash check. (The JDK ships no video FRAME
  * codec, so video frames are uncompressed DIB — the container
  * parse, the level a 100 TB ingest pipeline reads for metadata
  * extraction and frame chunking, is real; only pixel-level
  * transcode would need an ffmpeg-JNI build.)
  *
  * Scale: payloads never pass through a shuffle — decode/feature
  * extraction is mapPartitions (narrow); only the small extracted
  * metadata/features move. That is the invariant that matters at
  * 100 TB of media.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class AudioFrameRow(media_id: Long, frame_idx: Int, n_samples: Int,
    rms_milli: Long, zcr: Int)
  case class MediaFeatures(media_id: Long, kind: String, byte_len: Int,
      width: Int, height: Int, n_frames: Int, checksum: Long)
  case class FrameRow(media_id: Long, frame_idx: Int, frame_hash: Long)

  /** Minimal deterministic PNG writer: 8-bit truecolor, single STORED
    * (uncompressed) deflate block, None filter per scanline. Every
    * byte is a pure function of (w, h, rgb), so the encoded size is a
    * closed formula — `pngLength` — that a second engine can compute
    * without running the encoder, while the bytes remain a fully
    * compliant PNG that any decoder (javax.imageio here) parses.
    * Limited to rawLen = h·(1+3w) ≤ 65535 (one stored block), plenty
    * for synthetic test media. */
  object PngCodec {
    private val SIG = Array[Byte](137.toByte, 80, 78, 71, 13, 10, 26, 10)

    /** Encoded size: 8 (sig) + 25 (IHDR) + [12 + 2 + 5 + raw + 4]
      * (IDAT: chunk overhead, zlib header, stored-block header, raw
      * scanlines, adler) + 12 (IEND) = raw + 68. */
    def pngLength(w: Int, h: Int): Int = h * (1 + 3 * w) + 68

    def encode(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
      val raw = scanlines(w, h)
      var p = 0
      for (_ <- 0 until h) {
        p += 1 // filter byte (already 0 = None)
        for (_ <- 0 until w) {
          raw(p) = r.toByte; raw(p + 1) = g.toByte; raw(p + 2) = b.toByte
          p += 3
        }
      }
      container(w, h, raw)
    }

    private def scanlines(w: Int, h: Int): Array[Byte] = {
      val rawLen = h * (1 + 3 * w)
      require(rawLen <= 0xffff, s"single stored block only (raw $rawLen)")
      new Array[Byte](rawLen)
    }

    /** Wrap filled scanlines in the PNG container (IHDR + one
      * stored-deflate IDAT + IEND) — shared by both pixel fills. */
    private def container(w: Int, h: Int, raw: Array[Byte]): Array[Byte] = {
      val rawLen = raw.length
      val out = java.nio.ByteBuffer.allocate(pngLength(w, h))
      out.put(SIG)
      val ihdr = java.nio.ByteBuffer.allocate(13)
      ihdr.putInt(w).putInt(h)
        .put(8.toByte)  // bit depth
        .put(2.toByte)  // color type: truecolor
        .put(0.toByte).put(0.toByte).put(0.toByte) // deflate/adaptive/no-interlace
      putChunk(out, "IHDR", ihdr.array())
      val idat = java.nio.ByteBuffer.allocate(rawLen + 11)
      idat.put(0x78.toByte).put(0x01.toByte)        // zlib CMF/FLG (31-check ok)
      idat.put(0x01.toByte)                         // final stored block
      idat.put((rawLen & 0xff).toByte).put(((rawLen >> 8) & 0xff).toByte)
      idat.put((~rawLen & 0xff).toByte).put(((~rawLen >> 8) & 0xff).toByte)
      idat.put(raw)
      val adler = new java.util.zip.Adler32
      adler.update(raw)
      idat.putInt(adler.getValue.toInt)
      putChunk(out, "IDAT", idat.array())
      putChunk(out, "IEND", Array.emptyByteArray)
      out.array()
    }

    private def putChunk(out: java.nio.ByteBuffer, kind: String,
        data: Array[Byte]): Unit = {
      out.putInt(data.length)
      val kb = kind.getBytes("US-ASCII")
      out.put(kb).put(data)
      val crc = new java.util.zip.CRC32
      crc.update(kb); crc.update(data)
      out.putInt(crc.getValue.toInt)
    }

    /** Block-pattern grayscale variant: pixel (x, y) carries
      * r = g = b = v(x/8, y/8) — an 8×8-block mosaic, the shape the
      * perceptual-hash pipeline needs (a solid color d-hashes to all
      * zeros). Same container layout as [[encode]]. */
    def encodeGray(w: Int, h: Int, v: (Int, Int) => Int): Array[Byte] = {
      val raw = scanlines(w, h)
      var p = 0
      for (y <- 0 until h) {
        p += 1 // filter byte (already 0 = None)
        for (x <- 0 until w) {
          val g = (v(x / 8, y / 8) & 0xff).toByte
          raw(p) = g; raw(p + 1) = g; raw(p + 2) = g
          p += 3
        }
      }
      container(w, h, raw)
    }
  }

  /** Minimal deterministic WAV writer: canonical 44-byte PCM16-mono
    * RIFF header + constant-amplitude samples. Like [[PngCodec]],
    * every byte is a pure function of (sampleRate, nSamples, amp) and
    * the encoded size is a closed formula (44 + 2·nSamples), while
    * the bytes remain a fully compliant WAV that javax.sound.sampled
    * parses. */
  object WavCodec {
    def wavLength(nSamples: Int): Int = 44 + 2 * nSamples

    def encode(sampleRate: Int, nSamples: Int, amp: Int): Array[Byte] = {
      val dataLen = nSamples * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      bb.put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      bb.putShort(1)                  // PCM
      bb.putShort(1)                  // mono
      bb.putInt(sampleRate)
      bb.putInt(sampleRate * 2)       // byte rate
      bb.putShort(2)                  // block align
      bb.putShort(16)                 // bits per sample
      bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
      var i = 0
      while (i < nSamples) { bb.putShort(amp.toShort); i += 1 }
      bb.array()
    }
  }

  /** Minimal deterministic AVI writer: RIFF('AVI ') with the
    * canonical hdrl LIST (avih + one 'vids' strl with a 24-bit
    * BI_RGB BITMAPINFOHEADER) and a movi LIST of `frames`
    * uncompressed '00db' DIB frames in constant color. Like
    * [[PngCodec]]/[[WavCodec]], every byte is a pure function of
    * (w, h, frames, r, g, b) and the encoded size is the closed
    * formula [[aviLength]], while the bytes remain a structurally
    * compliant AVI any RIFF walker parses. DIB discipline: rows
    * bottom-up, BGR byte order, rows padded to 4 bytes. */
  object AviCodec {
    /** DIB scanline stride: 3w rounded up to a 4-byte boundary. */
    def rowBytes(w: Int): Int = (3 * w + 3) & ~3

    /** Encoded size: 12 (RIFF hdr) + 200 (hdrl LIST: 8+4 + avih 64 +
      * strl LIST 124) + 12 (movi LIST hdr) + frames·(8 + stride·h). */
    def aviLength(w: Int, h: Int, frames: Int): Int =
      224 + frames * (8 + rowBytes(w) * h)

    def encode(w: Int, h: Int, frames: Int, r: Int, g: Int, b: Int): Array[Byte] = {
      require(w > 0 && h > 0 && frames > 0,
        s"AVI dims/frames must be positive: ${w}x$h x$frames")
      require(frames.toLong * (8L + rowBytes(w).toLong * h) + 224L <= Int.MaxValue,
        s"AVI payload exceeds one allocation: ${w}x$h x$frames")
      val rb = rowBytes(w)
      val fb = rb * h
      val bb = java.nio.ByteBuffer.allocate(aviLength(w, h, frames))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fcc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
      fcc("RIFF"); bb.putInt(aviLength(w, h, frames) - 8); fcc("AVI ")
      fcc("LIST"); bb.putInt(192); fcc("hdrl")
      fcc("avih"); bb.putInt(56)
      bb.putInt(40000)          // dwMicroSecPerFrame: 25 fps
      bb.putInt(fb * 25)        // dwMaxBytesPerSec
      bb.putInt(0)              // dwPaddingGranularity
      bb.putInt(0)              // dwFlags: no index
      bb.putInt(frames)         // dwTotalFrames
      bb.putInt(0)              // dwInitialFrames
      bb.putInt(1)              // dwStreams
      bb.putInt(fb)             // dwSuggestedBufferSize
      bb.putInt(w); bb.putInt(h)
      bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0) // dwReserved
      fcc("LIST"); bb.putInt(116); fcc("strl")
      fcc("strh"); bb.putInt(56)
      fcc("vids"); fcc("DIB ")  // fccType / fccHandler
      bb.putInt(0)              // dwFlags
      bb.putShort(0); bb.putShort(0) // wPriority / wLanguage
      bb.putInt(0)              // dwInitialFrames
      bb.putInt(1); bb.putInt(25) // dwScale / dwRate
      bb.putInt(0)              // dwStart
      bb.putInt(frames)         // dwLength
      bb.putInt(fb)             // dwSuggestedBufferSize
      bb.putInt(0)              // dwQuality
      bb.putInt(fb)             // dwSampleSize
      bb.putShort(0); bb.putShort(0) // rcFrame left/top
      bb.putShort(w.toShort); bb.putShort(h.toShort) // rcFrame right/bottom
      fcc("strf"); bb.putInt(40)
      bb.putInt(40)             // biSize
      bb.putInt(w); bb.putInt(h)
      bb.putShort(1); bb.putShort(24) // biPlanes / biBitCount
      bb.putInt(0)              // biCompression: BI_RGB
      bb.putInt(fb)             // biSizeImage
      bb.putInt(0); bb.putInt(0) // biXPelsPerMeter / biYPelsPerMeter
      bb.putInt(0); bb.putInt(0) // biClrUsed / biClrImportant
      fcc("LIST"); bb.putInt(4 + frames * (8 + fb)); fcc("movi")
      val row = new Array[Byte](rb)
      var x = 0
      while (x < w) { // BGR order, tail padding stays zero
        row(3 * x) = b.toByte; row(3 * x + 1) = g.toByte
        row(3 * x + 2) = r.toByte
        x += 1
      }
      var f = 0
      while (f < frames) {
        fcc("00db"); bb.putInt(fb)
        var y = 0
        while (y < h) { bb.put(row); y += 1 }
        f += 1
      }
      bb.array()
    }
  }

  object MediaCodec {
    /** Portable 60-bit hash (value of the first 15 hex chars of md5 —
      * bytes 0..6 plus the high nibble of byte 7), same construction
      * as [[Dedup.portableHash60]] so the DuckDB oracle recomputes it
      * exactly. The digest instance is caller-provided: hoisted once
      * per partition in [[extractFeatures]], not allocated per row. */
    def hash60(md: MessageDigest, bytes: Array[Byte]): Long = {
      val d = md.digest(bytes)
      var v = 0L
      var i = 0
      while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
      (v << 4) | ((d(7) & 0xffL) >>> 4)
    }

    /** REAL image decode: parses the PNG payload with javax.imageio.
      * Width/height/pixel come from the actual decoder, so the
      * oracle's formula-predicted dims only hash-match if encoder and
      * decoder both work. The checksum is content-addressed from the
      * DECODED values (dims + top-left pixel) — the oracle replays it
      * without needing md5-over-binary. The reader is caller-provided
      * (hoisted once per partition): ImageIO.read's per-call reader
      * lookup dominates tiny-image decode cost. */
    def decodeImage(md: MessageDigest, reader: javax.imageio.ImageReader,
        m: MediaRow): MediaFeatures = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new ByteArrayInputStream(m.payload))
      reader.setInput(iis)
      val img = try reader.read(0) finally iis.close()
      require(img != null, s"media ${m.media_id}: undecodable image payload")
      val w = img.getWidth
      val h = img.getHeight
      val rgb = img.getRGB(0, 0)
      val key = s"img|$w|$h|${(rgb >> 16) & 0xff}|${(rgb >> 8) & 0xff}|${rgb & 0xff}"
      MediaFeatures(m.media_id, m.kind, m.payload.length, w, h,
        n_frames = 1, checksum = hash60(md, key.getBytes("UTF-8")))
    }

    /** REAL audio decode: parses the WAV payload with
      * javax.sound.sampled. Sample rate, bit depth, frame count, and
      * the first decoded sample all come from the actual parser; the
      * checksum is content-addressed from those DECODED values, so the
      * oracle's formula predictions only hash-match if encoder and
      * decoder both work. Feature mapping: width = kHz, height = bits
      * per sample. */
    def decodeAudio(md: MessageDigest, m: MediaRow): MediaFeatures = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(m.payload))
      try {
        val fmt = ais.getFormat
        val rate = fmt.getSampleRate.toInt
        val bits = fmt.getSampleSizeInBits
        val frames = ais.getFrameLength.toInt
        val buf = new Array[Byte](2)
        val n = ais.read(buf)
        require(n == 2, s"media ${m.media_id}: could not read first sample")
        val first = (buf(1) << 8) | (buf(0) & 0xff) // little-endian int16
        val key = s"wav|$rate|$frames|$first"
        MediaFeatures(m.media_id, m.kind, m.payload.length,
          width = rate / 1000, height = bits,
          n_frames = 1 + frames % 8,
          checksum = hash60(md, key.getBytes("UTF-8")))
      } finally ais.close()
    }

    /** REAL video container parse: a RIFF chunk walk over the AVI
      * payload — signature check, avih main header (dims + declared
      * frame total), then the movi frame chunks counted one by one
      * with the first frame's bottom-left pixel read out of the DIB
      * data (BGR order). Dims, frame count, and pixel all come from
      * the actual walk — the declared total must equal the counted
      * '00db'/'00dc' chunks or the payload is rejected — and the
      * checksum is content-addressed from the DECODED values, so the
      * oracle's formula predictions only hash-match if encoder and
      * parser both work. This is the metadata/chunking level a corpus
      * ingest reads; pixel-level transcode would be an ffmpeg-JNI
      * build with this exact signature. */
    def decodeVideo(md: MessageDigest, m: MediaRow): MediaFeatures = {
      val bb = java.nio.ByteBuffer.wrap(m.payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fourcc(): String = {
        val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
      }
      require(fourcc() == "RIFF" && { bb.getInt; fourcc() == "AVI " },
        s"media ${m.media_id}: not a RIFF/AVI payload")
      var w = -1; var h = -1; var declared = -1
      var nFrames = 0
      var pr = -1; var pg = -1; var pb = -1
      while (bb.remaining >= 8) {
        val id = fourcc()
        val sz = bb.getInt
        val next = bb.position() + sz + (sz & 1) // RIFF word alignment
        if (id == "LIST") fourcc() // descend: sub-chunks follow inline
        else if (id == "avih") {
          val base = bb.position()
          declared = bb.getInt(base + 16)
          w = bb.getInt(base + 32)
          h = bb.getInt(base + 36)
          bb.position(next)
        } else if (id.length == 4 && (id.endsWith("db") || id.endsWith("dc"))) {
          if (nFrames == 0 && sz >= 3) { // bottom-left pixel, BGR
            val p = bb.position()
            pb = m.payload(p) & 0xff
            pg = m.payload(p + 1) & 0xff
            pr = m.payload(p + 2) & 0xff
          }
          nFrames += 1
          bb.position(next)
        } else bb.position(next)
      }
      require(w > 0 && h > 0, s"media ${m.media_id}: no avih header")
      require(nFrames == declared,
        s"media ${m.media_id}: avih declares $declared frames, movi has $nFrames")
      val key = s"avi|$w|$h|$nFrames|$pr|$pg|$pb"
      MediaFeatures(m.media_id, m.kind, m.payload.length, w, h,
        n_frames = nFrames, checksum = hash60(md, key.getBytes("UTF-8")))
    }

    /** Dispatch: every modality hits a real parser (PNG via
      * javax.imageio, WAV via javax.sound.sampled, AVI via the RIFF
      * chunk walk). */
    def decode(md: MessageDigest, reader: javax.imageio.ImageReader,
        m: MediaRow): MediaFeatures = m.kind match {
      case "image" => decodeImage(md, reader, m)
      case "audio" => decodeAudio(md, m)
      case _ => decodeVideo(md, m)
    }

    /** Per-frame-index portable hash, precomputed once per JVM
      * (n_frames ≤ 8 by construction: image 1, audio 1 + frames % 8,
      * video 1 + id % 6 generated frames). */
    private lazy val frameIdxHash: Array[Long] = {
      val md = MessageDigest.getInstance("MD5")
      Array.tabulate(8)(i => hash60(md, s"f|$i".getBytes("UTF-8")))
    }

    /** STUB frame sampler — real impl would seek/decode keyframes.
      * frame_hash XORs the payload checksum with a per-index portable
      * hash (no multiplication: 64-bit wrap-around isn't portable to
      * engines with strict overflow checks). */
    def sampleFramesStub(f: MediaFeatures, stride: Int): Seq[FrameRow] =
      (0 until f.n_frames by stride).map(i =>
        FrameRow(f.media_id, i, f.checksum ^ frameIdxHash(i)))

    /** STUB resize — real impl would rescale pixel data; the stub
      * rescales the metadata and re-derives the checksum the way a
      * real resampler changes bytes deterministically. */
    def resizeStub(f: MediaFeatures, maxDim: Int): MediaFeatures = {
      val scale = math.min(1.0, maxDim.toDouble / math.max(f.width, f.height))
      f.copy(
        width = math.max(1, (f.width * scale).toInt),
        height = math.max(1, (f.height * scale).toInt),
        checksum = f.checksum ^ (maxDim.toLong << 32))
    }
  }

  /** Width/height an image payload is generated with — a pure
    * function of the media id, which is exactly what lets the DuckDB
    * oracle predict what the real decoder must recover. */
  def imageDims(id: Long): (Int, Int) =
    ((16 + id % 48).toInt, (16 + (id / 3) % 48).toInt)

  /** Audio parameters a WAV payload is generated with — pure
    * functions of the media id, which the DuckDB oracle replays to
    * predict what the real parser must recover. */
  def audioParams(id: Long): (Int, Int, Int) =
    (8000 + (id % 8).toInt * 1000,      // sample rate (8–15 kHz)
      32 + ((id / 3) % 64).toInt,       // sample count
      ((id % 100) * 100).toInt)         // constant amplitude (≤ 9900)

  /** Video parameters an AVI payload is generated with — pure
    * functions of the media id, which the DuckDB oracle replays to
    * predict what the RIFF walk must recover. */
  def videoParams(id: Long): (Int, Int, Int) =
    ((16 + id % 24).toInt,              // width
      (16 + (id / 3) % 24).toInt,       // height
      (1 + id % 6).toInt)               // frame count (≤ 6)

  /** Synthesize a media table from the documents corpus. Kind rotates
    * through the three modalities; every row carries a REAL container
    * — PNG, WAV, or AVI — with parameters derived from the id. A
    * narrow map — payload bytes are born on the executor and never
    * shuffle. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, _) =>
      (id % 3) match {
        case 0 =>
          val (w, h) = imageDims(id)
          MediaRow(id, "image", PngCodec.encode(w, h,
            (id % 256).toInt, ((id / 256) % 256).toInt, ((id / 65536) % 256).toInt))
        case 1 =>
          val (rate, n, amp) = audioParams(id)
          MediaRow(id, "audio", WavCodec.encode(rate, n, amp))
        case _ =>
          val (w, h, n) = videoParams(id)
          MediaRow(id, "video", AviCodec.encode(w, h, n,
            (id % 256).toInt, ((id / 256) % 256).toInt, ((id / 65536) % 256).toInt))
      }
    }
  }

  /** Batch decode: one codec context (the PNG ImageReader + digest)
    * per partition — the expensive init a real codec needs — then
    * per-row decode: the canonical mapPartitions shape. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = MessageDigest.getInstance("MD5")
      val reader = javax.imageio.ImageIO
        .getImageReadersByFormatName("png").next()
      // dispose the reader's native/cached state no matter how the
      // partition ends: normal exhaustion, an early stop (limit), or a
      // decode throw — task-completion fires in all three
      var disposed = false
      def dispose(): Unit = if (!disposed) { disposed = true; reader.dispose() }
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => dispose()))
      new Iterator[MediaFeatures] {
        def hasNext: Boolean = {
          val h = rows.hasNext
          if (!h) dispose()
          h
        }
        def next(): MediaFeatures =
          try MediaCodec.decode(md, reader, rows.next())
          catch { case e: Throwable => dispose(); throw e }
      }
    }
  }

  /** Per-frame audio features from a REAL WAV decode — the energy/
    * zero-crossing pass a speech pipeline runs before VAD gating and
    * silence trimming: the full int16 sample stream parses through
    * javax.sound.sampled, frames of `frameLen` samples (last frame
    * partial) each report exact sample count, RMS energy
    * (milli-units: Σs² is an exact long, the per-frame sqrt is one
    * IEEE op — for constant-amplitude content it lands EXACTLY on
    * |amp|·1000, which is the oracle contract), and the zero-crossing
    * count (sign flips, zero counted non-negative — exact int).
    *
    * Scale shape: per-row decode inside mapPartitions (the honest
    * codec shape — no payload shuffle), output rows bounded by
    * samples/frameLen. Non-audio rows are skipped. */
  def audioFrameFeatures(media: Dataset[MediaRow],
      frameLen: Int = 16): Dataset[AudioFrameRow] = {
    import media.sparkSession.implicits._
    require(frameLen >= 1, "frameLen >= 1")
    media.filter(_.kind == "audio").mapPartitions { rows =>
      rows.flatMap { m =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(m.payload))
        try {
          // the int16-mono-LE decode below is only valid for exactly
          // that format — a stereo/8-bit/big-endian WAV would silently
          // produce garbage features, and an unspecified frame length
          // (-1) would blow up the buffer sizing, so both fail loudly
          // with the media id instead (ADVICE r11)
          val fmt = ais.getFormat
          require(fmt.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
              fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
              !fmt.isBigEndian,
            s"media ${m.media_id}: unsupported audio format $fmt " +
              "(need 16-bit mono little-endian signed PCM)")
          require(ais.getFrameLength >= 0 &&
              ais.getFrameLength <= Int.MaxValue / 2,
            s"media ${m.media_id}: unusable frame length ${ais.getFrameLength}")
          val frames = ais.getFrameLength.toInt
          val bytes = new Array[Byte](frames * 2)
          var off = 0
          while (off < bytes.length) {
            val k = ais.read(bytes, off, bytes.length - off)
            require(k > 0, s"media ${m.media_id}: truncated sample stream")
            off += k
          }
          val out = scala.collection.mutable.ArrayBuffer.empty[AudioFrameRow]
          var idx = 0
          var i = 0
          while (i < frames) {
            val n = math.min(frameLen, frames - i)
            var sumsq = 0L; var z = 0; var prev = 0
            var j = 0
            while (j < n) {
              val s = (((bytes(2 * (i + j) + 1) & 0xff) << 8) |
                (bytes(2 * (i + j)) & 0xff)).toShort.toInt
              sumsq += s.toLong * s
              if (j > 0 && ((s < 0) != (prev < 0))) z += 1
              prev = s
              j += 1
            }
            out += AudioFrameRow(m.media_id, idx, n,
              math.round(math.sqrt(sumsq.toDouble / n) * 1000.0), z)
            idx += 1
            i += n
          }
          out
        } finally ais.close()
      }
    }
  }

  /** Energy-threshold VAD gate over [[audioFrameFeatures]] output —
    * the silence-trim decision a speech corpus applies before
    * transcription (silent clips cost inference budget and train
    * nothing): per clip, frames at-or-above the RMS threshold count
    * as speech; clips with zero speech frames flag `is_silent`.
    * Exact-long counts, one micro-rounded ratio division.
    * Scale shape: one media-keyed aggregation over the frame rows —
    * map-side combined, nothing payload-sized moves. */
  def vadGate(frames: Dataset[AudioFrameRow],
      rmsThresholdMilli: Long = 1000L): DataFrame = {
    import org.apache.spark.sql.functions._
    frames.toDF().groupBy("media_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("rms_milli") >= rmsThresholdMilli, 1L)
          .otherwise(0L)).as("n_speech"))
      .select(col("media_id"), col("n_frames"), col("n_speech"),
        round(col("n_speech").cast("double") * 1e6 /
          col("n_frames").cast("double"), 0).cast("long")
          .as("speech_ratio_micro"),
        (col("n_speech") === 0L).as("is_silent"))
  }

  /** Per-frame explode with a sampling stride. */
  def sampleFrames(feats: Dataset[MediaFeatures], stride: Int = 2): Dataset[FrameRow] = {
    import feats.sparkSession.implicits._
    feats.flatMap(f => MediaCodec.sampleFramesStub(f, stride))
  }

  /** Bounded-dimension resize pass (narrow map — payload metadata only
    * moves; at scale the resized bytes would be written back
    * partitioned by kind). */
  def resizeAll(feats: Dataset[MediaFeatures], maxDim: Int = 32): Dataset[MediaFeatures] = {
    import feats.sparkSession.implicits._
    feats.map(MediaCodec.resizeStub(_, maxDim))
  }

  // ---- perceptual-hash image near-dup (dHash) -------------------------

  /** JVM twin of the portable md5-60 string hash (first 15 hex chars
    * of md5 == top 60 bits of the digest) — the generator/oracle
    * contract for the pattern images. */
  def hash60Str(md: MessageDigest, s: String): Long =
    MediaCodec.hash60(md, s.getBytes("UTF-8"))

  /** The 9×8 block mosaic of pattern image `id`: families (id div 3)
    * share a base mosaic; variant (id mod 3) overlays that many +96
    * perturbation blocks at hash-chosen coordinates applied ONCE per
    * image (not per block lookup), so within-family pairs differ in
    * ≤ 2 blocks (≤ 4 d-hash bits) and cross-family pairs are
    * unrelated mosaics. Every term is the portable md5-60, so the
    * DuckDB oracle recomputes the exact grid without decoding
    * anything. */
  def patternGrid(md: MessageDigest, id: Long): Array[Array[Int]] = {
    val fam = id / 3
    val variant = (id % 3).toInt
    val grid = Array.tabulate(9, 8)((bx, by) =>
      (hash60Str(md, s"px|$fam|$bx|$by") % 256).toInt)
    for (j <- 1 to variant) {
      val px = (hash60Str(md, s"pb|$fam|$j") % 9).toInt
      val py = (hash60Str(md, s"pq|$fam|$j") % 8).toInt
      grid(px)(py) = (grid(px)(py) + 96) % 256
    }
    grid
  }

  /** One 72×64 block-mosaic PNG per document id (REAL container, like
    * [[mediaFromDocuments]] — payload born on the executor, never
    * shuffled). The mosaic is materialized once per image — the
    * encoder's per-pixel callback must not re-hash per pixel. */
  def patternImages(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      val md = MessageDigest.getInstance("MD5")
      ids.map { id =>
        val grid = patternGrid(md, id)
        MediaRow(id, "image", PngCodec.encodeGray(72, 64, (bx, by) => grid(bx)(by)))
      }
    }
  }

  /** The classic difference perceptual hash over a DECODED image:
    * average-pool the grayscale to a 9×8 grid, emit one bit per
    * horizontally adjacent cell pair (avg[cx] < avg[cx+1]) — 64 bits.
    * Cell means are exact integer math (sum of r+g+b over the cell
    * div 3·cellArea), so the hash is bit-deterministic. Dims must
    * grid-align (the generator emits 72×64). */
  def dHash64(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    require(w % 9 == 0 && h % 8 == 0, s"dims $w x $h not 9x8-grid-aligned")
    val cw = w / 9; val ch = h / 8
    // one bulk raster grab — per-pixel getRGB pays a color-model
    // lookup per call and dominates decode on small images
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    val sums = Array.ofDim[Long](9, 8)
    var y = 0
    while (y < h) {
      val cy = y / ch
      var x = 0
      while (x < w) {
        val rgb = px(y * w + x)
        sums(x / cw)(cy) +=
          ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    val avg = Array.tabulate(9, 8)((cx, cy) => sums(cx)(cy) / (3L * cw * ch))
    var bits = 0L
    var cy = 0
    while (cy < 8) {
      var bx = 0
      while (bx < 8) {
        if (avg(bx)(cy) < avg(bx + 1)(cy)) bits |= 1L << (cy * 8 + bx)
        bx += 1
      }
      cy += 1
    }
    bits
  }

  /** Batch perceptual hashing: decode every payload with the
    * per-partition reader context (the [[extractFeatures]] shape) and
    * d-hash the real pixels. @return (media_id, dhash). */
  def imageDHashes(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val reader = javax.imageio.ImageIO
        .getImageReadersByFormatName("png").next()
      var disposed = false
      def dispose(): Unit = if (!disposed) { disposed = true; reader.dispose() }
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => dispose()))
      rows.map { m =>
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(m.payload))
        reader.setInput(iis)
        val img = try reader.read(0) finally iis.close()
        (m.media_id, dHash64(img))
      }
    }.toDF("media_id", "dhash")
  }

  /** Per-image luminance statistics from the REAL pixel decode — the
    * exposure/degenerate-image screen an image corpus runs before
    * training (all-black scans, blown-out whites, near-constant
    * frames): exact pixel sum as a long, mean in milli-units (one
    * rounded division), exact min/max. A near-zero min-max spread is
    * the constant-image signal the quality gate drops.
    *
    * Scale shape: per-row decode in mapPartitions with the shared
    * reader context (the [[imageDHashes]] discipline) — no payload
    * shuffle; output is one row per image. The mosaic test corpus
    * makes the decoded stats md5-predictable, so the oracle replays
    * them without decoding — a hash-match proves encoder, decoder,
    * and the pixel accumulation at once. */
  def imageStats(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { rows =>
      val reader = javax.imageio.ImageIO
        .getImageReadersByFormatName("png").next()
      var disposed = false
      def dispose(): Unit = if (!disposed) { disposed = true; reader.dispose() }
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => dispose()))
      rows.map { m =>
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(m.payload))
        reader.setInput(iis)
        val img = try reader.read(0) finally iis.close()
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        var sum = 0L; var lo = 255; var hi = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = raster.getSample(x, y, 0)
            sum += v
            if (v < lo) lo = v
            if (v > hi) hi = v
            x += 1
          }
          y += 1
        }
        (m.media_id, w, h,
          math.round(sum.toDouble * 1000.0 / (w.toLong * h)),
          lo, hi)
      }
    }.toDF("media_id", "width", "height", "mean_milli",
      "min_luma", "max_luma")
  }

  /** Banded Hamming near-dup join over d-hashes — the SimHash
    * candidate machinery ([[Dedup.bandedHammingPairs]]) applied to
    * images: never all-pairs, exact popcount verify.
    * @return (id_a, id_b, hamming ≤ maxHamming). */
  def nearDupImages(hashes: DataFrame, maxHamming: Int = 3): DataFrame =
    Dedup.bandedHammingPairs(hashes, "media_id", "dhash", maxHamming)
      .select(col("a_id").as("id_a"), col("b_id").as("id_b"), col("hamming"))
}
