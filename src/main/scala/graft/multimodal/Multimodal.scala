package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media travel as opaque `binary` columns next to a typed
  * metadata struct, and per-batch transforms run as `mapPartitions`
  * over the binary payloads — the Scala-side equivalent of a Python
  * `mapInPandas` stage (iterator-of-batches in, iterator-of-batches
  * out; one JVM object per row, bytes never copied through a string).
  *
  * IMAGES decode for real: [[decodeImage]] uses the JDK's own
  * `javax.imageio` (PNG/JPEG/BMP/GIF ship with Java), so width/height/
  * channels/mean-luma are true pixel statistics, and [[encodeGrayPng]]
  * is the matching lossless re-encode. AUDIO in PCM containers decodes
  * for real too: [[decodeAudio]] uses the JDK's own
  * `javax.sound.sampled` (WAV/AIFF/AU PCM ship with Java), so sample
  * rate / channels / duration / per-channel RMS are true sample
  * statistics, and [[encodeWavPcm16]] is the matching lossless
  * re-encode. Only COMPRESSED codecs (opus/vorbis/h264 — genuinely
  * absent from the JDK and this container) still go through
  * [[decodeStub]], a clearly-marked deterministic FAKE that "decodes"
  * a payload to byte-level statistics. Everything around all three —
  * the schema contract, the batch iteration shape, partition sizing,
  * null passthrough — is the real plumbing a production codec drops
  * into.
  */
object Multimodal {

  /** Schema of the metadata struct carried beside every media column. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Output schema of the (stubbed) per-payload feature extractor. */
  val featureType: StructType = StructType(Seq(
    StructField("n_bytes", IntegerType),
    StructField("mean_byte", DoubleType),
    StructField("byte_entropy", DoubleType)))

  /** STUB — deterministic fake decode standing in for a COMPRESSED
    * codec (opus/vorbis/h264 — the formats genuinely absent from the
    * JDK and this container). Images ([[decodeImage]]) and PCM audio
    * ([[decodeAudio]]) decode for real; a production compressed codec
    * would replace this with sample statistics. This one computes
    * byte-level statistics so that pipeline tier stays end-to-end
    * testable.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Double, Double) = {
    if (bytes == null || bytes.isEmpty) return (0, 0.0, 0.0)
    val hist = new Array[Long](256)
    var sum = 0L
    bytes.foreach { b => val u = b & 0xff; hist(u) += 1; sum += u }
    val n = bytes.length.toDouble
    val entropy = hist.foldLeft(0.0) { (acc, c) =>
      if (c == 0) acc else { val p = c / n; acc - p * math.log(p) / math.log(2) }
    }
    (bytes.length, sum / n, entropy)
  }

  /** Output schema of the REAL image decode ([[decodeImage]]). */
  val imageFeatureType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("mean_luma", DoubleType)))

  /** Output schema of the thumbnail resample ([[thumbnailGray]]). */
  val thumbFeatureType: StructType = StructType(Seq(
    StructField("thumb_w", IntegerType),
    StructField("thumb_h", IntegerType),
    StructField("thumb_sum", DoubleType)))

  /** Deterministic nearest-neighbor downsample of a decoded image to
    * `nw × nh`: sample the source at (⌊X·w/nw⌋, ⌊Y·h/nh⌋) — EXACT
    * integer index arithmetic, no interpolation kernel, so the
    * resample is replayable in SQL (q_multimodal_thumb closes the
    * form on checkerboard fixtures). Returns the luma sum of the
    * nw·nh sampled pixels — a sum, not a mean: integer-valued
    * gray sums stay exact where a mean's integer ratio would sit on
    * rounding boundaries (the q_gap_stats lesson). Luma per sampled
    * pixel follows [[decodeImage]] (BT.601 for ≥3 bands, raw sample
    * for gray).
    */
  def thumbnailGray(bytes: Array[Byte], nw: Int, nh: Int): Option[(Int, Int, Double)] = {
    require(nw > 0 && nh > 0, "thumbnail dims must be positive")
    if (bytes == null || bytes.isEmpty) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) return None
    val r = img.getRaster
    val (w, h, bands) = (img.getWidth, img.getHeight, r.getNumBands)
    var sum = 0.0
    var yy = 0
    while (yy < nh) {
      val sy = yy * h / nh
      var xx = 0
      while (xx < nw) {
        val sx = xx * w / nw
        sum +=
          (if (bands >= 3)
            0.299 * r.getSample(sx, sy, 0) + 0.587 * r.getSample(sx, sy, 1) +
              0.114 * r.getSample(sx, sy, 2)
          else r.getSample(sx, sy, 0).toDouble)
        xx += 1
      }
      yy += 1
    }
    Some((nw, nh, sum))
  }

  /** Append [[thumbnailGray]] features — same one-pass mapPartitions
    * shape as [[extractImageFeatures]], NULL struct on undecodable.
    */
  def extractThumbFeatures(
      df: DataFrame, binCol: String, outCol: String, nw: Int, nh: Int): DataFrame = {
    val outSchema = df.schema.add(outCol, thumbFeatureType)
    val enc = Encoders.row(outSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        val feat = thumbnailGray(bytes, nw, nh)
          .map { case (tw, th, s) => Row(tw, th, s) }
          .orNull
        Row.fromSeq(r.toSeq :+ feat)
      }
    }(enc)
  }

  /** REAL image decode via the JDK's own `javax.imageio` (PNG, JPEG,
    * BMP, GIF — no external codec needed): (width, height, channels,
    * mean luma). Luma is ITU-R BT.601 (0.299 R + 0.587 G + 0.114 B)
    * for ≥3-band images, the raw sample for grayscale — read straight
    * from the raster, never through `getRGB` (which color-space
    * converts and would break bit-exact grayscale round-trips).
    * Undecodable or empty payloads → None; only COMPRESSED audio/video
    * (opus/h264) still go through [[decodeStub]] — PCM audio decodes
    * for real via [[decodeAudio]].
    */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Int, Double)] = {
    if (bytes == null || bytes.isEmpty) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) return None
    val r = img.getRaster
    val (w, h, bands) = (img.getWidth, img.getHeight, r.getNumBands)
    var sum = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        sum +=
          (if (bands >= 3)
            0.299 * r.getSample(x, y, 0) + 0.587 * r.getSample(x, y, 1) +
              0.114 * r.getSample(x, y, 2)
          else r.getSample(x, y, 0).toDouble)
        x += 1
      }
      y += 1
    }
    Some((w, h, bands, sum / (w.toLong * h)))
  }

  /** 8-bit grayscale PNG encode of a row-major pixel matrix — the
    * re-encode half of a real image pipeline (and the deterministic
    * fixture generator for testing [[decodeImage]]: gray PNG is
    * lossless, so decode(encode(p)) == p exactly).
    */
  def encodeGrayPng(pixels: Array[Array[Int]]): Array[Byte] = {
    val h = pixels.length
    val w = pixels(0).length
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, pixels(y)(x) & 0xff); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Output schema of the REAL audio decode ([[decodeAudio]]). */
  val audioFeatureType: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_frames", LongType),
    StructField("duration_sec", DoubleType),
    StructField("rms", ArrayType(DoubleType, containsNull = false))))

  /** REAL audio decode via the JDK's own `javax.sound.sampled`
    * (WAV/AIFF/AU PCM containers ship with Java — no external codec):
    * (sample rate, channels, frame count, duration seconds,
    * per-channel RMS of samples normalized to [−1, 1]). Handles
    * signed/unsigned PCM at 8 or 16 bits, either endianness — the
    * full `javax.sound` PCM matrix. Undecodable payloads (including
    * compressed codecs, which genuinely are not in the JDK) → None;
    * those still flow through [[decodeStub]]'s byte-statistics tier.
    *
    * Normalization contract (pinned in MultimodalSpec and the
    * q_multimodal_audio oracle): 16-bit → sample/32768, 8-bit signed →
    * sample/128, 8-bit unsigned → (sample−128)/128. Powers of two, so
    * the normalized values — and square-wave RMS — are EXACT doubles.
    */
  def decodeAudio(bytes: Array[Byte]): Option[(Int, Int, Long, Double, Array[Double])] = {
    if (bytes == null || bytes.isEmpty) return None
    val in =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => return None }
    try {
      val fmt = in.getFormat
      val enc = fmt.getEncoding
      val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
      val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
      val bits = fmt.getSampleSizeInBits
      val ch = fmt.getChannels
      if (!(signed || unsigned) || (bits != 8 && bits != 16) || ch < 1) return None
      val data = in.readAllBytes()
      val bytesPerSample = bits / 8
      val frameBytes = bytesPerSample * ch
      val nFrames = data.length / frameBytes
      val ss = new Array[Double](ch)
      var f = 0
      while (f < nFrames) {
        var c = 0
        while (c < ch) {
          val off = f * frameBytes + c * bytesPerSample
          val v =
            if (bits == 8) {
              val raw = data(off) & 0xff
              if (unsigned) (raw - 128) / 128.0 else data(off) / 128.0
            } else {
              val (b0, b1) = (data(off) & 0xff, data(off + 1) & 0xff)
              val raw = if (fmt.isBigEndian) (b0 << 8) | b1 else (b1 << 8) | b0
              val s = if (unsigned) raw - 32768 else (raw << 16) >> 16
              s / 32768.0
            }
          ss(c) += v * v
          c += 1
        }
        f += 1
      }
      val rms = ss.map(s => if (nFrames > 0) math.sqrt(s / nFrames) else 0.0)
      val rate = fmt.getSampleRate.toInt
      Some((rate, ch, nFrames.toLong,
        if (rate > 0) nFrames.toDouble / rate else 0.0, rms))
    } catch { case _: Exception => None }
    finally in.close()
  }

  /** 16-bit signed little-endian PCM WAV encode of per-channel sample
    * arrays (all the same length) — the re-encode half of a real audio
    * pipeline, and the deterministic fixture generator for
    * [[decodeAudio]] (PCM WAV is lossless, so decoded statistics equal
    * closed-form values exactly).
    */
  def encodeWavPcm16(channels: Array[Array[Short]], sampleRate: Int): Array[Byte] = {
    require(channels.nonEmpty && channels.forall(_.length == channels(0).length),
      "equal-length per-channel sample arrays")
    val ch = channels.length
    val n = channels(0).length
    val pcm = new Array[Byte](n * ch * 2)
    var f = 0
    while (f < n) {
      var c = 0
      while (c < ch) {
        val s = channels(c)(f)
        val off = (f * ch + c) * 2
        pcm(off) = (s & 0xff).toByte
        pcm(off + 1) = ((s >> 8) & 0xff).toByte
        c += 1
      }
      f += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, ch, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Raw 16-bit PCM frames per channel through the codec
    * (javax.sound.sampled) — the sample-exact complement of
    * [[decodeAudio]]'s normalized statistics, for transforms that must
    * re-encode (resampling, channel ops). Signed 16-bit PCM only;
    * anything else returns None (quarantine).
    */
  def decodePcm16(bytes: Array[Byte]): Option[(Int, Array[Array[Short]])] = {
    if (bytes == null || bytes.isEmpty) return None
    val in =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => return None }
    try {
      val fmt = in.getFormat
      if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        || fmt.getSampleSizeInBits != 16 || fmt.getChannels < 1) return None
      val ch = fmt.getChannels
      val data = in.readAllBytes()
      val nFrames = data.length / (2 * ch)
      val out = Array.ofDim[Short](ch, nFrames)
      var f = 0
      while (f < nFrames) {
        var c = 0
        while (c < ch) {
          val off = (f * ch + c) * 2
          val (b0, b1) = (data(off) & 0xff, data(off + 1) & 0xff)
          val raw = if (fmt.isBigEndian) (b0 << 8) | b1 else (b1 << 8) | b0
          out(c)(f) = ((raw << 16) >> 16).toShort
          c += 1
        }
        f += 1
      }
      Some((fmt.getSampleRate.toInt, out))
    } catch { case _: Exception => None }
    finally in.close()
  }

  /** Nearest-neighbor sample-rate conversion — the audio twin of
    * [[thumbnailGray]]'s resample, in the same EXACT integer index
    * arithmetic: dstFrames = ⌊srcFrames·dstRate/srcRate⌋ and output
    * frame i reads source frame ⌊i·srcRate/dstRate⌋ (always in range:
    * i < dstFrames ⟹ i·src/dst < srcFrames). No interpolation — a
    * production pipeline would drop a polyphase filter into this exact
    * slot; the index contract (and everything around it) is what the
    * engine owns, and integer floors make it replayable in any engine.
    */
  def resampleNearest(
      chans: Array[Array[Short]],
      srcRate: Int,
      dstRate: Int): Array[Array[Short]] = {
    require(srcRate > 0 && dstRate > 0, "positive sample rates")
    val srcFrames = if (chans.isEmpty) 0L else chans(0).length.toLong
    val dstFrames = (srcFrames * dstRate / srcRate).toInt
    chans.map { c =>
      Array.tabulate[Short](dstFrames)(i => c((i.toLong * srcRate / dstRate).toInt))
    }
  }

  /** Greatest common divisor (positive inputs). */
  private def gcd(a: Int, b: Int): Int = if (b == 0) a else gcd(b, a % b)

  /** Q15 integer tap table of the Hann-windowed-sinc lowpass for an
    * L/M rational rate conversion (round-10 directive #8 — the real
    * resampler for the slot [[resampleNearest]] documents). Standard
    * construction: upsample by L, lowpass at the tighter of the two
    * Nyquists (cutoff 1/max(L,M) in the upsampled domain), downsample
    * by M; gain L compensates the zero-stuffing. Taps are quantized
    * ONCE to integers (round half up, Q15) so the convolution — and
    * therefore every emitted sample — is pure integer arithmetic,
    * replayable exactly by a SQL oracle that receives this table as
    * literals. Index k runs −H..H with H = zeroCrossings·max(L,M);
    * taps(k + H) stores C[k].
    */
  private[graft] def sincTaps(l: Int, m: Int, zeroCrossings: Int = 8): Array[Int] = {
    require(l > 0 && m > 0 && zeroCrossings > 0)
    val p = math.max(l, m)
    val h = zeroCrossings * p
    Array.tabulate(2 * h + 1) { idx =>
      val k = idx - h
      val x = k.toDouble / p
      val sinc = if (k == 0) 1.0 else math.sin(math.Pi * x) / (math.Pi * x)
      val hann = 0.5 * (1.0 + math.cos(math.Pi * k / (h + 1.0)))
      math.round(l.toDouble / p * sinc * hann * 32768.0).toInt
    }
  }

  /** Polyphase windowed-sinc sample-rate conversion — the production
    * tier next to [[resampleNearest]] (which ALIASES: it keeps source
    * energy above the destination Nyquist; MultimodalResampleSpec
    * measures the suppression gap on a planted out-of-band tone).
    * Same frame-count contract as nearest (dstFrames =
    * ⌊srcFrames·L/M⌋ for the reduced ratio L/M) and the same
    * integer-exact replayability: y[j] = clamp(⌊(Σₙ x[n]·C[jM−nL] +
    * 2¹⁴) / 2¹⁵⌋) over the Q15 taps of [[sincTaps]], edges
    * zero-padded. Work per output sample is the (2H+1)/L live taps of
    * its polyphase branch — scan-local, no state across rows.
    */
  def resampleSinc(
      chans: Array[Array[Short]],
      srcRate: Int,
      dstRate: Int,
      zeroCrossings: Int = 8): Array[Array[Short]] = {
    require(srcRate > 0 && dstRate > 0, "positive sample rates")
    val g = gcd(srcRate, dstRate)
    val l = dstRate / g
    val m = srcRate / g
    val taps = sincTaps(l, m, zeroCrossings)
    val h = (taps.length - 1) / 2
    val srcFrames = if (chans.isEmpty) 0 else chans(0).length
    val dstFrames = (srcFrames.toLong * l / m).toInt
    chans.map { c =>
      Array.tabulate[Short](dstFrames) { j =>
        val center = j.toLong * m // in upsampled-index units
        var acc = 0L
        // n ranges where |jM − nL| ≤ H and 0 ≤ n < srcFrames
        var n = math.max(0L, (center - h + l - 1) / l).toInt
        val nEnd = math.min(srcFrames - 1L, (center + h) / l).toInt
        while (n <= nEnd) {
          val k = (center - n.toLong * l).toInt // ∈ [−H, H]
          acc += c(n).toLong * taps(k + h)
          n += 1
        }
        val y = Math.floorDiv(acc + 16384L, 32768L)
        math.max(-32768L, math.min(32767L, y)).toShort
      }
    }
  }

  /** Output schema of [[resampleAudioFeatures]]: frame counts plus the
    * per-channel EXACT integer sum of squared samples of the
    * resampled-and-re-encoded audio (shorts: sums stay well inside a
    * long) — all-integer so the oracle replay has no float boundary
    * anywhere.
    */
  val resampleFeatureType: StructType = StructType(Seq(
    StructField("src_frames", LongType),
    StructField("dst_frames", LongType),
    StructField("sum_sq", ArrayType(LongType))))

  /** decode → [[resampleNearest]] to `dstRate` → [[encodeWavPcm16]] →
    * decode again → integer sample statistics: the resample runs
    * THROUGH the real codec in both directions, so the emitted stats
    * certify the full decode/transform/encode loop, not just the index
    * math. Non-PCM16 rows get a NULL struct (quarantine).
    */
  def resampleAudioFeatures(
      df: DataFrame,
      binCol: String,
      dstRate: Int,
      outCol: String): DataFrame =
    resampleFeaturesWith(df, binCol, dstRate, outCol)(resampleNearest)

  /** [[resampleAudioFeatures]] with the windowed-sinc tier in the
    * resampler slot — identical codec loop and stats contract. */
  def resampleSincFeatures(
      df: DataFrame,
      binCol: String,
      dstRate: Int,
      outCol: String): DataFrame =
    resampleFeaturesWith(df, binCol, dstRate, outCol)(resampleSinc(_, _, _))

  private def resampleFeaturesWith(
      df: DataFrame,
      binCol: String,
      dstRate: Int,
      outCol: String)(
      resampler: (Array[Array[Short]], Int, Int) => Array[Array[Short]]): DataFrame = {
    val outSchema = df.schema.add(outCol, resampleFeatureType)
    val enc = Encoders.row(outSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        val feat = decodePcm16(bytes).flatMap { case (srcRate, chans) =>
          val res = resampler(chans, srcRate, dstRate)
          decodePcm16(encodeWavPcm16(res, dstRate)).map { case (_, back) =>
            val sums = back.map { c =>
              var s = 0L
              var i = 0
              while (i < c.length) { s += c(i).toLong * c(i); i += 1 }
              s
            }
            Row(if (chans.isEmpty) 0L else chans(0).length.toLong,
              if (back.isEmpty) 0L else back(0).length.toLong,
              sums.toSeq)
          }
        }.orNull
        Row.fromSeq(r.toSeq :+ feat)
      }
    }(enc)
  }

  /** Append [[decodeAudio]] features for a binary audio column — same
    * one-pass mapPartitions shape as [[extractImageFeatures]];
    * undecodable rows get a NULL struct (quarantine filtering, not
    * silent loss).
    */
  def extractAudioFeatures(df: DataFrame, binCol: String, outCol: String): DataFrame = {
    val outSchema = df.schema.add(outCol, audioFeatureType)
    val enc = Encoders.row(outSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        val feat = decodeAudio(bytes)
          .map { case (rate, ch, nf, dur, rms) => Row(rate, ch, nf, dur, rms.toSeq) }
          .orNull
        Row.fromSeq(r.toSeq :+ feat)
      }
    }(enc)
  }

  /** Append [[decodeImage]] features for a binary image column — same
    * one-pass mapPartitions shape as [[extractFeatures]]; undecodable
    * rows get a NULL struct (they stay in the frame for quarantine
    * filtering rather than silently vanishing).
    */
  def extractImageFeatures(df: DataFrame, binCol: String, outCol: String): DataFrame = {
    val outSchema = df.schema.add(outCol, imageFeatureType)
    val enc = Encoders.row(outSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        val feat = decodeImage(bytes)
          .map { case (w, h, c, luma) => Row(w, h, c, luma) }
          .orNull
        Row.fromSeq(r.toSeq :+ feat)
      }
    }(enc)
  }

  /** Append extracted features for a binary media column. Runs as one
    * `mapPartitions` pass (no shuffle); rows with NULL payloads get a
    * NULL feature struct. Partition sizing note: payloads dominate row
    * width, so upstream readers should size partitions by bytes
    * (`spark.sql.files.maxPartitionBytes`), not row count.
    */
  def extractFeatures(df: DataFrame, binCol: String, outCol: String): DataFrame = {
    val outSchema = df.schema.add(outCol, featureType)
    val enc = Encoders.row(outSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        val feat = if (bytes == null) null else {
          val (n, mean, ent) = decodeStub(bytes)
          Row(n, mean, ent)
        }
        Row.fromSeq(r.toSeq :+ feat)
      }
    }(enc)
  }

  /** Deterministic frame sampling over a "video" payload: treats the
    * binary as `n_frames` equal slices (per the metadata struct) and
    * keeps every `stride`-th frame's slice. Emits one row per kept
    * frame — the explode shape a real frame sampler has. Payload
    * slicing is real; only the codec is faked.
    */
  def sampleFrames(df: DataFrame, binCol: String, metaCol: String, stride: Int): DataFrame = {
    require(stride > 0, "stride must be positive")
    val outSchema = df.schema
      .add("frame_idx", IntegerType)
      .add("frame_bytes", BinaryType)
    val enc = Encoders.row(outSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    val metaIdx = df.schema.fieldIndex(metaCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        val meta = if (r.isNullAt(metaIdx)) null else r.getStruct(metaIdx)
        if (bytes == null || meta == null || meta.isNullAt(3) || meta.getInt(3) <= 0) Iterator.empty
        else {
          val nFrames = meta.getInt(3)
          val frameLen = math.max(1, bytes.length / nFrames)
          (0 until nFrames by stride).iterator.map { f =>
            val fromI = f * frameLen
            val until = if (f == nFrames - 1) bytes.length else math.min(bytes.length, fromI + frameLen)
            Row.fromSeq(r.toSeq :+ f :+ java.util.Arrays.copyOfRange(bytes, math.min(fromI, bytes.length), until))
          }
        }
      }
    }(enc)
  }

  /** "Resize" stub: real resample would decode → scale → re-encode;
    * the stub keeps every k-th byte (deterministic downsample) and
    * rewrites the metadata struct accordingly. The column/metadata
    * rewrite shape is the real contract.
    */
  def resize(df: DataFrame, binCol: String, metaCol: String, factor: Int): DataFrame = {
    require(factor > 0, "factor must be positive")
    val enc = Encoders.row(df.schema)
    val binIdx = df.schema.fieldIndex(binCol)
    val metaIdx = df.schema.fieldIndex(metaCol)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        if (bytes == null) r
        else {
          val out = Array.tabulate(bytes.length / factor)(i => bytes(i * factor))
          val meta = if (r.isNullAt(metaIdx)) null else {
            val m = r.getStruct(metaIdx)
            Row(m.get(0),
              if (m.isNullAt(1)) null else m.getInt(1) / factor,
              if (m.isNullAt(2)) null else m.getInt(2) / factor,
              m.get(3))
          }
          val vals = r.toSeq.toArray
          vals(binIdx) = out
          vals(metaIdx) = meta
          Row.fromSeq(vals.toIndexedSeq)
        }
      }
    }(enc)
  }
}
