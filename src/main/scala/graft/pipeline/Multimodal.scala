package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, processed by a batched per-partition "decode" stage — the
  * Spark-side shape of an image/audio feature-extraction pipeline.
  *
  * The real decode (image resize, audio frame-sample, …) would call a
  * native library unavailable in this environment, so [[decodeStub]] is a
  * deterministic fake: it consumes raw bytes in fixed-size batches (the
  * batch shape a vectorized decoder needs) and emits per-payload features.
  * Everything around it — binary column, schema, partitioning, batched
  * iteration, typed output — is real and oracle-checked (the features are
  * byte arithmetic DuckDB can replay on the UTF-8 text).
  */
object Multimodal {
  private type Q = (SparkSession, String) => DataFrame

  final case class Payload(doc_id: Long, bin: Array[Byte])
  final case class Features(doc_id: Long, byte_len: Long, checksum: Long,
    head_byte: Int, n_chunks: Long)
  private implicit val encPayload: Encoder[Payload] = Encoders.product[Payload]
  private implicit val encFeatures: Encoder[Features] = Encoders.product[Features]

  /** Batched decode stub: iterates payloads in batches of 64 (a vectorized
    * decoder's natural unit), emits deterministic byte-level features.
    */
  def decodeStub(batch: Seq[Payload]): Seq[Features] =
    batch.map { p =>
      var sum = 0L
      var i = 0
      while (i < p.bin.length) { sum += (p.bin(i) & 0xFF); i += 1 }
      Features(p.doc_id, p.bin.length.toLong, sum % 997,
        if (p.bin.isEmpty) -1 else p.bin(0) & 0xFF,
        (p.bin.length.toLong + 255) / 256)
    }

  /** M1 — binary ingest → batched decode → typed features. */
  private val decode: Q = (s, dir) => {
    val payloads = Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("bin"))
      .as[Payload](encPayload)
    payloads.mapPartitions { it =>
      it.grouped(64).flatMap(g => decodeStub(g.toSeq))
    }(encFeatures).toDF()
  }

  final case class Frame(doc_id: Long, frame_idx: Int, offset: Long,
    frame_len: Int, checksum: Long)
  private implicit val encFrame: Encoder[Frame] = Encoders.product[Frame]

  /** Frame-sampling stub: fixed 256-byte "frames", keep every 2nd (the
    * video keyframe-sampling shape: one media payload fans out to many
    * frame rows, each independently processable downstream).
    */
  def frameSampleStub(batch: Seq[Payload], stride: Int = 256,
      every: Int = 2): Seq[Frame] =
    batch.flatMap { p =>
      val n = (p.bin.length + stride - 1) / stride
      (0 until n).filter(_ % every == 0).map { f =>
        val off = f * stride
        val len = math.min(stride, p.bin.length - off)
        var sum = 0L
        var i = off
        while (i < off + len) { sum += (p.bin(i) & 0xFF); i += 1 }
        Frame(p.doc_id, f, off.toLong, len, sum % 997)
      }
    }

  /** M2 — media → sampled frame rows: the explode-shaped half of a video
    * pipeline (decode is [[decodeStub]]-style per frame afterwards).
    */
  private val frameSample: Q = (s, dir) => {
    val payloads = Tables.documents(s, dir)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("bin"))
      .as[Payload](encPayload)
    payloads.mapPartitions { it =>
      it.grouped(64).flatMap(g => frameSampleStub(g.toSeq))
    }(encFrame).toDF()
  }

  final case class Resized(doc_id: Long, out_len: Int, stride: Int,
    checksum: Long)
  private implicit val encResized: Encoder[Resized] = Encoders.product[Resized]

  /** Resize stub: stride-sample the payload down to ≤`target` bytes — the
    * image-thumbnail shape (a real resize kernel replaces the byte picker;
    * the batching, stride arithmetic and bounded output size are the real
    * plumbing).
    */
  def resizeStub(batch: Seq[Payload], target: Int = 64): Seq[Resized] =
    batch.map { p =>
      val blen = p.bin.length
      val stride = math.max(1, blen / target)
      val n = math.min(target, (blen - 1) / stride + 1)
      var sum = 0L
      var i = 0
      while (i < n) { sum += (p.bin(i * stride) & 0xFF); i += 1 }
      Resized(p.doc_id, n, stride, sum % 997)
    }

  /** M3 — media → fixed-budget downsample ("resize"): one bounded-size
    * derived payload per input, the third plumbing shape next to decode
    * (M1) and frame fan-out (M2).
    */
  private val resize: Q = (s, dir) => {
    val payloads = Tables.documents(s, dir)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("bin"))
      .as[Payload](encPayload)
    payloads.mapPartitions { it =>
      it.grouped(64).flatMap(g => resizeStub(g.toSeq))
    }(encResized).toDF()
  }

  final case class FrameEnergy(doc_id: Long, frame_idx: Int, fsum: Long,
    flen: Int)
  private implicit val encFrameEnergy: Encoder[FrameEnergy] =
    Encoders.product[FrameEnergy]

  /** Per-frame RAW energy (sum of byte values, unmodded — deltas need the
    * full magnitude, the mod-997 checksum convention would wrap them) plus
    * the frame length, over the same fixed 256-byte framing as
    * [[frameSampleStub]], every frame kept.
    */
  def frameEnergyStub(batch: Seq[Payload], stride: Int = 256): Seq[FrameEnergy] =
    batch.flatMap { p =>
      val n = (p.bin.length + stride - 1) / stride
      (0 until n).map { f =>
        val off = f * stride
        val len = math.min(stride, p.bin.length - off)
        var sum = 0L
        var i = off
        while (i < off + len) { sum += (p.bin(i) & 0xFF); i += 1 }
        FrameEnergy(p.doc_id, f, sum, len)
      }
    }

  /** Scene-change threshold in PER-BYTE mean-energy units — length-
    * normalized so the short last frame of a payload is judged on its
    * density, not its truncated raw sum. Fixture-calibrated to split
    * meaningfully (adjacent-frame mean deltas: median ~0.95, p90 ~3.4 —
    * tau 1 keeps roughly half the non-first frames); a real pipeline
    * tunes this per codec/content.
    */
  val KeyframeTau = 1L

  /** M6 — keyframe selection (scene-change detection): the SELECTION half
    * of a video sampling pipeline whose fan-out half is M2 — a real run
    * keeps only frames that differ enough from their predecessor (plus
    * every first frame), cutting the downstream vision-encoder load by the
    * scene-change rate rather than a blind every-Nth stride.
    *
    * The shape is the load-bearing part: per-frame energy comes out of the
    * same batched `mapPartitions` decode stage as M1–M4 (a real frame
    * differencer replaces the byte sum), and the TEMPORAL logic — lag,
    * delta, threshold — is declarative Catalyst on one doc_id-keyed
    * window, so the decode parallelizes per partition while the sequence
    * logic shuffles each document's frame rows exactly once.
    *
    * The keyframe test compares per-byte MEAN energies |s_i/l_i −
    * s_{i−1}/l_{i−1}| > τ, evaluated CROSS-MULTIPLIED in exact integers
    * (|s_i·l_{i−1} − s_{i−1}·l_i| > τ·l_i·l_{i−1}) so the flag can never
    * ride an IEEE division boundary; the reported `mean_diff` is the
    * floor-rounded 6dp division (the dyadic-halves idiom). First frames
    * report −1 and always key.
    */
  private val keyframes: Q = (s, dir) => {
    val payloads = Tables.documents(s, dir)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("bin"))
      .as[Payload](encPayload)
    val fe = payloads.mapPartitions { it =>
      it.grouped(64).flatMap(g => frameEnergyStub(g.toSeq))
    }(encFrameEnergy).toDF()
    val w = Window.partitionBy("doc_id").orderBy("frame_idx")
    fe.withColumn("pf", lag(col("fsum"), 1).over(w))
      .withColumn("pl", lag(col("flen"), 1).over(w))
      .select(col("doc_id"), col("frame_idx"), col("fsum"), col("flen"),
        when(col("pf").isNull, lit(-1.0)).otherwise(
          floor(abs(col("fsum").cast("double") / col("flen") -
            col("pf").cast("double") / col("pl")) * 1e6 + 0.5) / 1e6)
          .as("mean_diff"),
        (col("pf").isNull ||
          abs(col("fsum") * col("pl") - col("pf") * col("flen")) >
            lit(KeyframeTau) * col("flen") * col("pl")).as("is_key"))
  }

  final case class AudioQc(doc_id: Long, n_samples: Long, n_frames: Long,
    peak_dev: Int, energy_mod: Long, silence_frames: Long)
  private implicit val encAudioQc: Encoder[AudioQc] = Encoders.product[AudioQc]

  /** Audio-QC stub: treat the payload as 8-bit-offset PCM, frame into
    * 64-sample windows, report peak deviation, total energy (mod a prime
    * — the checksum convention of this family), and the count of silent
    * frames (frame max deviation < 16) — the voice-activity /
    * clipping-detection pass an audio curation pipeline runs before
    * transcription. Integer arithmetic end-to-end → exact oracle.
    */
  def audioQcStub(batch: Seq[Payload], frame: Int = 64,
      silence: Int = 16): Seq[AudioQc] =
    batch.map { p =>
      val n = p.bin.length
      val nf = (n + frame - 1) / frame
      var peak = 0
      var energy = 0L
      var silent = 0L
      var f = 0
      while (f < nf) {
        var fmax = 0
        var i = f * frame
        val end = math.min(n, i + frame)
        while (i < end) {
          val d = math.abs((p.bin(i) & 0xFF) - 128)
          if (d > fmax) fmax = d
          energy += d.toLong * d
          i += 1
        }
        if (fmax < silence) silent += 1
        if (fmax > peak) peak = fmax
        f += 1
      }
      AudioQc(p.doc_id, n.toLong, nf.toLong, peak, energy % 1000003L, silent)
    }

  /** M4 — audio QC features: the fourth multimodal plumbing shape (per-
    * window aggregation inside the payload) next to decode (M1), frame
    * fan-out (M2), and downsample (M3).
    */
  private val audioQc: Q = (s, dir) => {
    val payloads = Tables.documents(s, dir)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("bin"))
      .as[Payload](encPayload)
    payloads.mapPartitions { it =>
      it.grouped(64).flatMap(g => audioQcStub(g.toSeq))
    }(encAudioQc).toDF()
  }

  final case class AudioFrame(doc_id: Long, frame_idx: Int, fe: Long,
    fl: Int)
  private implicit val encAudioFrame: Encoder[AudioFrame] =
    Encoders.product[AudioFrame]

  /** Per-frame energy (Σ d², d = |sample−128| — m04's 8-bit-offset-PCM
    * deviation) and frame length over m04's 64-sample framing, every
    * frame emitted as a row.
    */
  def audioFrameStub(batch: Seq[Payload], frame: Int = 64): Seq[AudioFrame] =
    batch.flatMap { p =>
      val n = p.bin.length
      val nf = (n + frame - 1) / frame
      (0 until nf).map { f =>
        var i = f * frame
        val end = math.min(n, i + frame)
        var energy = 0L
        while (i < end) {
          val d = math.abs((p.bin(i) & 0xFF) - 128)
          energy += d.toLong * d
          i += 1
        }
        AudioFrame(p.doc_id, f, energy, end - f * frame)
      }
    }

  /** VAD energy gate in PER-SAMPLE mean-energy units (the classic
    * frame-energy voice-activity detector): a frame is VOICED iff
    * Σd² ≥ τ·len, evaluated in exact integers. Fixture-calibrated to
    * split (per-frame mean energy: p5 1743, median 1980, p95 2264 —
    * τ 1950 silences ~40%); a real pipeline tunes τ per codec/noise
    * floor, or learns it per stream.
    */
  val VadTau = 1950L

  /** Segments shorter than this many frames are flagged, not served — the
    * min-duration rule every ASR front-end applies so isolated energy
    * blips don't become utterances.
    */
  val MinVadFrames = 2L

  /** M7 — VAD utterance segmentation: the composition of m04's frame QC
    * into the SEGMENT EXTRACTION pass an audio curation pipeline runs
    * before transcription — maximal runs of consecutive voiced frames
    * become utterance candidates with start/end/length/energy, and the
    * min-duration flag separates servable utterances from blips.
    *
    * Shape: per-frame energy rows come out of the same batched
    * `mapPartitions` decode stage as m01–m06 (a real VAD replaces the
    * byte-deviation energy with a spectral one; the framing, the energy
    * gate, and everything downstream are unchanged), and the RUN
    * DETECTION is the declarative gaps-and-islands idiom — island key =
    * frame_idx − row_number() per doc over voiced frames only, exact
    * integers — then one aggregate per island. Both stages key on
    * doc-derived keys, so at 100 TB the frame stream shuffles by document
    * and never globally. Integer arithmetic end-to-end → exact oracle
    * (energy sum mod 1000003, m04's checksum convention).
    */
  private val vadSegments: Q = (s, dir) => {
    val payloads = Tables.documents(s, dir)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("bin"))
      .as[Payload](encPayload)
    val frames = payloads.mapPartitions { it =>
      it.grouped(64).flatMap(g => audioFrameStub(g.toSeq))
    }(encAudioFrame).toDF()
    val voiced = frames.filter(col("fe") >= lit(VadTau) * col("fl"))
    val wDoc = Window.partitionBy("doc_id").orderBy("frame_idx")
    val segs = voiced
      .withColumn("grp", col("frame_idx") - row_number().over(wDoc))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("frame_idx")).as("start_frame"),
        max(col("frame_idx")).as("end_frame"),
        count(lit(1)).as("n_frames"),
        (sum(col("fe")) % 1000003L).as("energy_mod"))
    val wSeg = Window.partitionBy("doc_id").orderBy("start_frame")
    segs.withColumn("seg_idx", row_number().over(wSeg))
      .select(col("doc_id"), col("seg_idx"), col("start_frame"),
        col("end_frame"), col("n_frames"), col("energy_mod"),
        (col("n_frames") >= MinVadFrames).as("servable"))
  }

  final case class Decoded(doc_id: Long, width: Int, height: Int)
  private implicit val encDecoded: Encoder[Decoded] = Encoders.product[Decoded]

  // ImageIO defaults to FILE-backed image streams (one temp file per
  // encode/decode — a million tmpfs creates per sf1 pass, and wall time
  // then tracks the tmp dir's state). Memory-backed streams are the
  // right shape for byte-array round-trips. NOTE: setUseCache is a
  // PROCESS-GLOBAL ImageIO mutation, executed at object init — it
  // applies to every ImageIO user in the JVM, not just this module.
  javax.imageio.ImageIO.setUseCache(false)

  /** Synthesize one real JPEG per doc: dims derived from doc_id, solid
    * fill color likewise (setRGB, no AWT graphics pipeline — headless
    * safe). This is the fixture/ingest half of m01b: the binary column
    * exactly as it would arrive from object storage.
    */
  def encodeJpeg(id: Long): Array[Byte] = {
    val w = 8 + (id % 24).toInt
    val h = 8 + ((id * 7) % 24).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (((id * 37) % 256) << 16 | ((id * 59) % 256) << 8 |
      ((id * 83) % 256)).toInt
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** M1b — REAL image decode (round-4 VERDICT item 6): the operator under
    * test parses actual JPEG bytes with `javax.imageio` inside the same
    * batched `mapPartitions` plumbing as [[decodeStub]] and emits the
    * decoded dimensions. The oracle predicts width/height from doc_id
    * (the fixture formula) — the Spark path can only satisfy it by
    * round-tripping a real JPEG container. m01 keeps the stub codec for
    * the byte-arithmetic feature oracle; this is its real-decode twin.
    */
  private val imageDecode: Q = (s, dir) => {
    val ids = Tables.documents(s, dir).select(col("doc_id"))
      .as[Long](Encoders.scalaLong)
    val payloads = ids.mapPartitions(it =>
      it.map(id => Payload(id, encodeJpeg(id))))(encPayload)
    payloads.mapPartitions { it =>
      it.grouped(64).flatMap(_.map { p =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(p.bin))
        Decoded(p.doc_id, img.getWidth, img.getHeight)
      })
    }(encDecoded).toDF()
  }

  final case class DocText(doc_id: Long, text: String)
  private implicit val encDocText: Encoder[DocText] = Encoders.product[DocText]
  final case class PairQc(doc_id: Long, width: Int, height: Int,
    n_words: Long)
  private implicit val encPairQc: Encoder[PairQc] = Encoders.product[PairQc]

  /** m08's filter dials (the LAION-400M §2.2 recipe shape — image-size
    * floor, aspect-ratio band, caption-length floor — recut to the
    * fixture's 8–31-px dim formula so every rule actually fires).
    */
  val MinPairDim = 12
  val MinCaptionWords = 5L

  /** M8 — image-text pair filtering (the LAION-400M curation recipe,
    * Schuhmann et al. 2021: a crawled (image, caption) pair survives only
    * if the image is big enough, not absurdly elongated, and the caption
    * is a real sentence): each doc's image payload is REALLY decoded
    * (javax.imageio round-trip inside the same batched `mapPartitions`
    * stage as m01b — the oracle predicts dims from the fixture formula,
    * so the Spark path can only match by parsing actual JPEG bytes) and
    * the caption stats ride the same pass; the three reason flags and the
    * keep decision are exact integer rules (the aspect band is the
    * cross-multiplied w ≤ 2h ∧ h ≤ 2w — no division to disagree on).
    *
    * At 100 TB this is the multimodal family's p05: the decode stage is
    * the expensive scan (batched, partition-parallel, one pass), the
    * decision is row-local, and the manifest out is what the dataloader
    * consumes — keep flags with reasons, not a destructive drop.
    */
  private val pairFilter: Q = (s, dir) => {
    val dt = Tables.documents(s, dir)
      .select(col("doc_id"), col("text")).as[DocText](encDocText)
    val qc = dt.mapPartitions { it =>
      it.grouped(64).flatMap(_.map { d =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(encodeJpeg(d.doc_id)))
        PairQc(d.doc_id, img.getWidth, img.getHeight,
          d.text.split(" ", -1).length.toLong)
      })
    }(encPairQc).toDF()
    qc.withColumn("small_image",
        col("width") < MinPairDim || col("height") < MinPairDim)
      .withColumn("extreme_aspect",
        !(col("width") <= lit(2) * col("height") &&
          col("height") <= lit(2) * col("width")))
      .withColumn("short_caption", col("n_words") < MinCaptionWords)
      .withColumn("keep",
        !col("small_image") && !col("extreme_aspect") && !col("short_caption"))
  }

  /** Patterned JPEG fixture for the perceptual-hash family: a 64×64
    * grayscale image of 8×8 macro-blocks ALIGNED to the JPEG DCT grid,
    * whose block values walk ±16 from 128 along each row — the SIGN of
    * each horizontal neighbor difference encodes one bit of a per-id
    * 56-bit signature (7 comparisons × 8 rows). DCT-aligned flat blocks
    * quantize as pure DC (error ≲ ±4 at default quality), so the
    * 16-level step margin survives the lossy round-trip and the decoded
    * dHash equals the planted signature. `nudge` bumps ONE pixel by +1 —
    * a byte-different, perceptually identical twin (the near-dup the
    * operator must find; exact dedup by content hash would miss it).
    */
  private def mix56(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
  def encodePatternedJpeg(baseId: Long, nudge: Boolean): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val sig = mix56(baseId)
    var by = 0
    while (by < 8) {
      var v = 128
      var bx = 0
      while (bx < 8) {
        var y = by * 8
        while (y < by * 8 + 8) {
          var x = bx * 8
          while (x < bx * 8 + 8) {
            val vv = if (nudge && x == 0 && y == 0) v + 1 else v
            img.setRGB(x, y, vv << 16 | vv << 8 | vv)
            x += 1
          }
          y += 1
        }
        if (bx < 7) {
          val bit = (sig >>> (by * 7 + bx)) & 1L
          v = if (bit == 1L) v + 16 else v - 16
        }
        bx += 1
      }
      by += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  final case class Hashed(doc_id: Long, phash: Long)
  private implicit val encHashed: Encoder[Hashed] = Encoders.product[Hashed]

  /** Decode a JPEG and compute the 56-bit dHash: average each 8×8 block's
    * green channel, then bit (bx, by) = 1 iff block(bx+1, by) > block(bx,
    * by) — the standard difference-hash, robust to re-encoding/scaling
    * noise that breaks exact byte dedup.
    */
  def dHash56(bytes: Array[Byte]): Long = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    val bw = img.getWidth / 8
    val bh = img.getHeight / 8
    val means = Array.ofDim[Double](8, 8)
    var by = 0
    while (by < 8) {
      var bx = 0
      while (bx < 8) {
        var sum = 0L
        var y = by * bh
        while (y < (by + 1) * bh) {
          var x = bx * bw
          while (x < (bx + 1) * bw) {
            sum += (img.getRGB(x, y) >> 8) & 0xFF
            x += 1
          }
          y += 1
        }
        means(by)(bx) = sum.toDouble / (bw * bh)
        bx += 1
      }
      by += 1
    }
    var h = 0L
    by = 0
    while (by < 8) {
      var bx = 0
      while (bx < 7) {
        if (means(by)(bx + 1) > means(by)(bx))
          h |= 1L << (by * 7 + bx)
        bx += 1
      }
      by += 1
    }
    h
  }

  /** M5 — perceptual-hash image NEAR-dedup: the multimodal twin of the
    * d03/d04 text families — exact content hashing misses re-encoded /
    * resized / pixel-perturbed image duplicates, so training pipelines
    * dedup images by a perceptual hash. Every 5th doc gets an injected
    * byte-different pixel-nudged twin (id + 1e6, the d-family clone
    * pattern); the operator decodes real JPEG bytes (batched
    * mapPartitions, the m01b plumbing), computes the 56-bit dHash
    * row-locally, and hands the (doc_id, phash) relation to
    * [[phashPairs]] — see its scaladoc for the two-stage production
    * shape. No SQL oracle for the full composition (a JPEG decoder is
    * not expressible in DuckDB) — but the PAIR stage itself is oracled
    * end-to-end as m05b over a DuckDB-replicable synthetic hash relation,
    * and PipelineSpec pins exact recovery here: all injected twins found
    * at Hamming 0, zero false pairs across the corpus.
    */
  /** Band-bucket occupancy-cap FLOOR for [[phashPairs]] (the d03/d04
    * lesson applied to images). The effective cap scales with expected
    * occupancy — see [[PhashOccFactor]].
    */
  val PhashBucketCap = 16

  /** Occupancy-cap multiple: a (band, bval) bucket is dropped only when
    * its DISTINCT-signature count exceeds `PhashOccFactor ×` the EXPECTED
    * uniform occupancy `S / 2^14` (floored at [[PhashBucketCap]]). The r10
    * absolute cap saturated at S ≈ 2^14·16 ≈ 260k signatures — beyond
    * that, expected occupancy exceeded the cap EVERYWHERE and near-dup
    * recall collapsed. Scaled, the cap keeps every statistically normal
    * bucket alive at any corpus size and drops only genuinely degenerate
    * band values (≥ 8× over-represented visual structure: flat frames,
    * letterbox borders). Per-signature candidate work is then
    * ≤ 4·PhashOccFactor·S/2^14 — the honest cost of Hamming-3 search
    * with 14-bit bands, paid only on DISTINCT signatures because the
    * exact-signature stage collapses duplicate mass first.
    */
  val PhashOccFactor = 8.0

  /** The pair stage of m05 over a (doc_id, phash) relation — the
    * PRODUCTION shape (r10 carried design, shipped r11):
    *
    *  1. **Exact-signature groups first**: `groupBy(phash)`, rep =
    *     min(doc_id); every member links to its group rep at Hamming 0.
    *     A duplicate GROUP of any size G emits G−1 rep→member pairs —
    *     LINEAR (the r10 pairwise join emitted C(G,2) under a cap and
    *     dropped the group entirely past cap, so a 17×-reposted photo
    *     was lost; now it is recovered at any G).
    *  2. **Band-join DISTINCT signatures only** for the Hamming-1..3
    *     links: 4 × 14-bit bands (a pair at Hamming ≤ 3 leaves ≥ 1 band
    *     intact — pigeonhole), per-(band, bval) occupancy capped at
    *     `max(PhashBucketCap, ceil(PhashOccFactor·S/2^14))` over DISTINCT
    *     signatures S, XOR-popcount verify. Links are emitted between
    *     group REPS — members resolve through their rep, so the output
    *     stays linear in the corpus.
    *
    * Factored out so the degenerate-corpus boundedness pin and the m05b
    * DuckDB oracle can drive it with a synthetic hash relation.
    */
  def phashPairs(hashed0: DataFrame): DataFrame = {
    // the input feeds TWO consumers (the signature groupBy and the
    // group-pair join) — barrier it, or each consumer recomputes the
    // upstream hash derivation from scratch: for m05 that is the whole
    // corpus's JPEG decode paid twice (measured 3.5 → 8.5 s at sf1)
    val hashed = Tables.barrier(hashed0)
    // stage 1: exact-signature groups (barrier'd — feeds the rep pairs,
    // the band stage, and the S count)
    val sigs = Tables.barrier(hashed.groupBy(col("phash"))
      .agg(min(col("doc_id")).as("rep")))
    val groupPairs = hashed.join(sigs, Seq("phash"))
      .filter(col("doc_id") =!= col("rep"))
      .select(col("rep").as("a_id"), col("doc_id").as("b_id"),
        lit(0).as("hamming"))
    // stage 2: distinct signatures, occupancy-scaled cap
    val nSig = sigs.agg(count(lit(1)).as("ns"))
    val cap = greatest(lit(PhashBucketCap.toLong),
      ceil(lit(PhashOccFactor) * col("ns") / lit(16384.0)).cast("long"))
    val banded = sigs
      .crossJoin(broadcast(nSig))
      .select(col("rep"), col("phash"), cap.as("cap"),
        explode(array((0 until 4).map(k =>
          struct(lit(k).as("band"),
            shiftright(col("phash"), k * 14).bitwiseAND(lit(0x3FFFL))
              .as("bval"))): _*)).as("b"))
      .select(col("rep"), col("phash"), col("cap"),
        col("b.band").as("band"), col("b.bval").as("bval"))
      .withColumn("occ", count(lit(1)).over(
        Window.partitionBy(col("band"), col("bval"))))
      .filter(col("occ") <= col("cap"))
      .select(col("rep"), col("phash"), col("band"), col("bval"))
    val links = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.rep") < col("b.rep"))
      .select(col("a.rep").as("a_id"), col("b.rep").as("b_id"),
        col("a.phash").as("ah"), col("b.phash").as("bh"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("ah").bitwiseXOR(col("bh"))).cast("int"))
      .filter(col("hamming") <= 3)
      .select(col("a_id"), col("b_id"), col("hamming"))
    groupPairs.unionByName(links)
  }

  /** Twin-id offset for [[phashNearDup]]'s injected near-duplicates:
    * one above the corpus max doc_id, so a twin id can never shadow a
    * real doc whatever the corpus's id layout (the r9 advisor finding:
    * a fixed +1e6 offset silently collides on corpora with sparse
    * clone-band id strides — ScaleGen's sf1 ids reach 9e7). One
    * single-column max over the id relation, paid once at plan build —
    * the twin injection is the FIXTURE device that makes recall
    * pinnable, not a production stage.
    */
  private[graft] def twinBase(ids: org.apache.spark.sql.Dataset[Long]): Long = {
    // max over an EMPTY relation is a single null row — guard so an
    // empty corpus yields an empty m05 result instead of an NPE at
    // plan-build time
    val row = ids.toDF("id").agg(max(col("id"))).head
    (if (row.isNullAt(0)) 0L else row.getLong(0)) + 1L
  }

  private val phashNearDup: Q = (s, dir) => {
    val ids = Tables.documents(s, dir).select(col("doc_id"))
      .as[Long](Encoders.scalaLong)
    val tb = twinBase(ids)
    val hashed = ids.mapPartitions { it =>
      it.grouped(64).flatMap(_.flatMap { id =>
        val base = Hashed(id, dHash56(encodePatternedJpeg(id, nudge = false)))
        if (id % 5 == 0)
          Seq(base, Hashed(tb + id,
            dHash56(encodePatternedJpeg(id, nudge = true))))
        else Seq(base)
      })
    }(encHashed).toDF()
    phashPairs(hashed)
  }

  /** m05b — [[phashPairs]] under a FULL DuckDB oracle (r10 VERDICT #3,
    * the d03b/d04b twin pattern): the one piece of m05 DuckDB cannot
    * replay is the JPEG decode, so this entry drives the IDENTICAL pair
    * stage with a synthetic (doc_id, phash) relation both engines derive
    * from `documents` by pure integer arithmetic. The fixture exercises
    * every branch of the production shape:
    *  - exact-duplicate groups: docs share `g = doc_id % 128` group
    *    signatures (spread over the full 56 bits by an odd multiplier),
    *    with variants `r = doc_id % 7` — r ∈ {0,1,6} hash identically →
    *    multi-member groups recovered by the group stage;
    *  - Hamming-1/2/3 links between DISTINCT signatures: r = 2/3/4 XOR
    *    1/2/3 planted bits into the group base → found via the intact
    *    bands;
    *  - a Hamming-8 decoy (r = 5, XOR 0xF0F0): a band-join CANDIDATE
    *    (bands 2–3 intact) that the popcount verify must reject;
    *  - a hot-band family (doc_id % 50 == 7): ~N/50 DISTINCT signatures
    *    pinned to one (band0, band1) value pair with consecutive-j
    *    Hamming-≤3 neighbors — WITHOUT the occupancy cap these buckets
    *    emit C(N/50, 2) candidates including real links; with it they are
    *    dropped, so an engine that disagrees on the cap arithmetic
    *    hash-mismatches. The oracle pins the cap, not just the popcount.
    */
  private def synthPhash(doc: Column): Column = {
    val flips = when(doc % 7 === 2, lit(8L)) // 1<<3
      .when(doc % 7 === 3, lit(2147614720L)) // (1<<17)|(1<<31)
      .when(doc % 7 === 4, lit(140737488879648L)) // (1<<5)|(1<<19)|(1<<47)
      .when(doc % 7 === 5, lit(61680L)) // 0xF0F0
      .otherwise(lit(0L))
    when(doc % 50 === 7,
      lit(49207978L) + expr("doc_id DIV 50") * lit(268435456L))
      .otherwise(((doc % 128) * lit(129934812399721L)).bitwiseXOR(flips))
  }

  private val phashPairsSynth: Q = (s, dir) =>
    phashPairs(Tables.documents(s, dir)
      .select(col("doc_id"), synthPhash(col("doc_id")).as("phash")))

  val queries: Map[String, Q] = Map(
    "m01_multimodal_decode" -> decode,
    "m01b_image_decode" -> imageDecode,
    "m02_frame_sample" -> frameSample,
    "m03_resize_sample" -> resize,
    "m04_audio_qc" -> audioQc,
    "m06_keyframes" -> keyframes,
    "m07_vad_segments" -> vadSegments,
    "m08_pair_filter" -> pairFilter,
    "m05_phash_neardup" -> phashNearDup,
    "m05b_phash_pairs" -> phashPairsSynth)

  /** The corpus is ASCII, so UTF-8 bytes == character codes and DuckDB can
    * replay the byte features with `ascii`/`octet_length`.
    */
  val oracle: Map[String, String] = Map(
    "m05b_phash_pairs" ->
      """WITH hashed AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 50 = 7 THEN
        |      49207978 + (doc_id // 50) * 268435456
        |    ELSE xor((doc_id % 128) * 129934812399721,
        |      CASE doc_id % 7
        |        WHEN 2 THEN 8
        |        WHEN 3 THEN 2147614720
        |        WHEN 4 THEN 140737488879648
        |        WHEN 5 THEN 61680
        |        ELSE 0 END)
        |    END AS phash
        |  FROM documents),
        |sigs AS MATERIALIZED (
        |  SELECT phash, min(doc_id) AS rep FROM hashed GROUP BY 1),
        |gp AS (
        |  SELECT s.rep AS a_id, h.doc_id AS b_id, 0 AS hamming
        |  FROM hashed h JOIN sigs s USING (phash)
        |  WHERE h.doc_id != s.rep),
        |ns AS (SELECT count(*) AS n FROM sigs),
        |banded AS MATERIALIZED (
        |  SELECT rep, phash, band, bval FROM (
        |    SELECT rep, phash, b.band,
        |           (phash >> (b.band * 14)) & 16383 AS bval,
        |           count(*) OVER (PARTITION BY b.band,
        |             (phash >> (b.band * 14)) & 16383) AS occ
        |    FROM sigs, (SELECT unnest([0, 1, 2, 3]) AS band) b)
        |  WHERE occ <= greatest(16,
        |    CAST(ceil(8.0 * (SELECT n FROM ns) / 16384.0) AS BIGINT))),
        |links AS (
        |  SELECT a_id, b_id, CAST(bit_count(xor(ah, bh)) AS INT) AS hamming
        |  FROM (
        |    SELECT DISTINCT a.rep AS a_id, b.rep AS b_id,
        |           a.phash AS ah, b.phash AS bh
        |    FROM banded a JOIN banded b
        |      ON a.band = b.band AND a.bval = b.bval AND a.rep < b.rep)
        |  WHERE bit_count(xor(ah, bh)) <= 3)
        |SELECT a_id, b_id, CAST(hamming AS INT) AS hamming FROM gp
        |UNION ALL SELECT a_id, b_id, hamming FROM links""".stripMargin,
    "m04_audio_qc" ->
      """WITH src AS (
        |  SELECT doc_id, text, octet_length(encode(text)) AS n
        |  FROM documents WHERE len(text) > 0),
        |samp AS (
        |  SELECT doc_id, n, (i - 1) // 64 AS f,
        |    abs(ascii(substr(text, i, 1)) - 128) AS d
        |  FROM (SELECT doc_id, text, n,
        |          unnest(generate_series(1, len(text))) AS i
        |        FROM src)),
        |fr AS (
        |  SELECT doc_id, n, f, max(d) AS fmax,
        |    CAST(sum(CAST(d AS BIGINT) * d) AS BIGINT) AS fe
        |  FROM samp GROUP BY 1, 2, 3)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
        |  CAST(count(*) AS BIGINT) AS n_frames,
        |  CAST(max(fmax) AS INT) AS peak_dev,
        |  CAST(CAST(sum(fe) AS BIGINT) % 1000003 AS BIGINT) AS energy_mod,
        |  CAST(sum(CASE WHEN fmax < 16 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS silence_frames
        |FROM fr GROUP BY 1, 2""".stripMargin,
    "m01b_image_decode" ->
      """SELECT doc_id,
        |  CAST(8 + doc_id % 24 AS INT) AS width,
        |  CAST(8 + (doc_id * 7) % 24 AS INT) AS height
        |FROM documents""".stripMargin,
    "m01_multimodal_decode" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  CAST(list_reduce(list_prepend(0,
        |         list_transform(generate_series(1, len(text)), i -> ascii(substr(text, i, 1)))),
        |       (a, x) -> a + x) % 997 AS BIGINT) AS checksum,
        |  CASE WHEN len(text) = 0 THEN -1 ELSE ascii(substr(text, 1, 1)) END AS head_byte,
        |  CAST((octet_length(encode(text)) + 255) // 256 AS BIGINT) AS n_chunks
        |FROM documents""".stripMargin,
    "m08_pair_filter" ->
      // dims from the fixture formula (the m01b honesty stance: the Spark
      // side can only match by decoding real JPEG bytes); every rule in
      // exact integers, the aspect band cross-multiplied
      s"""WITH qc AS (
        |  SELECT doc_id,
        |    CAST(8 + doc_id % 24 AS INT) AS width,
        |    CAST(8 + (doc_id * 7) % 24 AS INT) AS height,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
        |  FROM documents)
        |SELECT doc_id, width, height, n_words,
        |  (width < $MinPairDim OR height < $MinPairDim) AS small_image,
        |  NOT (width <= 2 * height AND height <= 2 * width) AS extreme_aspect,
        |  n_words < $MinCaptionWords AS short_caption,
        |  NOT (width < $MinPairDim OR height < $MinPairDim)
        |    AND (width <= 2 * height AND height <= 2 * width)
        |    AND n_words >= $MinCaptionWords AS keep
        |FROM qc""".stripMargin,
    "m07_vad_segments" ->
      s"""WITH fr AS MATERIALIZED (
        |  SELECT doc_id, CAST(f AS INT) AS frame_idx,
        |    CAST(list_reduce(list_prepend(0, list_transform(
        |           generate_series(f * 64 + 1, least(blen, f * 64 + 64)),
        |           i -> (ascii(substr(text, i, 1)) - 128) *
        |                (ascii(substr(text, i, 1)) - 128))),
        |         (a, x) -> a + x) AS BIGINT) AS fe,
        |    CAST(least(64, blen - f * 64) AS INT) AS fl
        |  FROM (
        |    SELECT doc_id, text, octet_length(encode(text)) AS blen,
        |           unnest(generate_series(0,
        |             (octet_length(encode(text)) + 63) // 64 - 1)) AS f
        |    FROM documents WHERE len(text) > 0)),
        |voiced AS (
        |  SELECT doc_id, frame_idx, fe,
        |         frame_idx - row_number() OVER (PARTITION BY doc_id
        |           ORDER BY frame_idx) AS grp
        |  FROM fr WHERE fe >= $VadTau * fl),
        |segs AS (
        |  SELECT doc_id, grp, min(frame_idx) AS start_frame,
        |         max(frame_idx) AS end_frame,
        |         CAST(count(*) AS BIGINT) AS n_frames,
        |         CAST(CAST(sum(fe) AS BIGINT) % 1000003 AS BIGINT)
        |           AS energy_mod
        |  FROM voiced GROUP BY 1, 2)
        |SELECT doc_id, CAST(row_number() OVER (PARTITION BY doc_id
        |         ORDER BY start_frame) AS INT) AS seg_idx,
        |       start_frame, end_frame, n_frames, energy_mod,
        |       n_frames >= $MinVadFrames AS servable
        |FROM segs""".stripMargin,
    "m06_keyframes" ->
      s"""WITH fr AS MATERIALIZED (
        |  SELECT doc_id, CAST(f AS INT) AS frame_idx,
        |    CAST(list_reduce(list_prepend(0, list_transform(
        |           generate_series(f * 256 + 1, f * 256 + least(256, blen - f * 256)),
        |           i -> ascii(substr(text, i, 1)))),
        |         (a, x) -> a + x) AS BIGINT) AS fsum,
        |    CAST(least(256, blen - f * 256) AS INT) AS flen
        |  FROM (
        |    SELECT doc_id, text, octet_length(encode(text)) AS blen,
        |           unnest(generate_series(0,
        |             (octet_length(encode(text)) + 255) // 256 - 1)) AS f
        |    FROM documents WHERE len(text) > 0)),
        |d AS (
        |  SELECT doc_id, frame_idx, fsum, flen,
        |         lag(fsum) OVER w_kf AS pf, lag(flen) OVER w_kf AS pl
        |  FROM fr
        |  WINDOW w_kf AS (PARTITION BY doc_id ORDER BY frame_idx))
        |SELECT doc_id, frame_idx, fsum, flen,
        |  CASE WHEN pf IS NULL THEN -1.0
        |       ELSE floor(abs(CAST(fsum AS DOUBLE) / flen -
        |                      CAST(pf AS DOUBLE) / pl) * 1e6 + 0.5) / 1e6
        |  END AS mean_diff,
        |  (pf IS NULL OR abs(fsum * pl - pf * flen) >
        |     $KeyframeTau * flen * pl) AS is_key
        |FROM d""".stripMargin,
    "m02_frame_sample" ->
      """SELECT doc_id, CAST(f AS INT) AS frame_idx,
        |  CAST(f * 256 AS BIGINT) AS offset,
        |  CAST(least(256, blen - f * 256) AS INT) AS frame_len,
        |  CAST(list_reduce(list_prepend(0, list_transform(
        |         generate_series(f * 256 + 1, f * 256 + least(256, blen - f * 256)),
        |         i -> ascii(substr(text, i, 1)))),
        |       (a, x) -> a + x) % 997 AS BIGINT) AS checksum
        |FROM (
        |  SELECT doc_id, text, octet_length(encode(text)) AS blen,
        |         unnest(generate_series(0,
        |           (octet_length(encode(text)) + 255) // 256 - 1)) AS f
        |  FROM documents WHERE len(text) > 0)
        |WHERE f % 2 = 0""".stripMargin,
    "m03_resize_sample" ->
      """SELECT doc_id,
        |  CAST(least(64, (blen - 1) // stride + 1) AS INT) AS out_len,
        |  CAST(stride AS INT) AS stride,
        |  CAST(list_reduce(list_prepend(0, list_transform(
        |         generate_series(0, least(63, (blen - 1) // stride)),
        |         i -> ascii(substr(text, i * stride + 1, 1)))),
        |       (a, x) -> a + x) % 997 AS BIGINT) AS checksum
        |FROM (
        |  SELECT doc_id, text, blen, greatest(blen // 64, 1) AS stride
        |  FROM (SELECT doc_id, text, octet_length(encode(text)) AS blen
        |        FROM documents WHERE len(text) > 0))""".stripMargin)
}
