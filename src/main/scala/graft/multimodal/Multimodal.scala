package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with typed metadata, and decode /
  * feature-extraction runs batched per partition.
  *
  * The decode itself is STUBBED (no media libraries in this
  * environment) with a deterministic fake that derives pixel
  * dimensions and a checksum from the payload bytes — the Spark
  * plumbing around it (schema, binary transport, per-partition
  * batching, output shape) is real and spec-tested, and swapping
  * the stub for a JNI/codec call changes nothing structural.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media: Array[Byte], media_type: String)
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Int,
    width: Int, height: Int, checksum: Long)

  /** Attach a synthetic binary media column to the documents table
    * (payload = utf-8 text bytes standing in for encoded media). */
  def attachMedia(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"),
        encode(col("text"), "UTF-8").as("media"),
        concat(lit("image/fake-"), col("lang")).as("media_type"))
      .as[MediaRow]
  }

  /** Aspect-preserving resize planning: fit (width, height) into a
    * `box`×`box` square with integer arithmetic (`div`, never
    * double division — a double quotient can round up across an
    * integer boundary and change the floor). The byte transform
    * itself would run inside the decode stub; the dimension math is
    * the oracle-checkable part. */
  def resizePlan(features: Dataset[MediaFeatures], box: Int = 224): DataFrame =
    features.toDF().select(col("doc_id"), col("width"), col("height"),
      expr(s"CAST(width * $box DIV greatest(width, height) AS INT)")
        .as("out_w"),
      expr(s"CAST(height * $box DIV greatest(width, height) AS INT)")
        .as("out_h"))

  /** Frame sampling for video-like payloads: treat the payload as
    * ⌊n_bytes / frameBytes⌋ frames (min 1 — a trailing partial frame
    * is not a frame; the stride below is the ceiling) and take every
    * ⌈n_frames / maxFrames⌉-th frame — uniform temporal sampling,
    * ≤ `maxFrames` refs per doc. Map-side only (`sequence` +
    * `explode`, no shuffle); each ref carries the byte offset a real
    * demuxer would seek to. */
  def frameSample(features: Dataset[MediaFeatures],
      frameBytes: Int = 256, maxFrames: Int = 8): DataFrame = {
    val nf = greatest(lit(1L), expr(s"n_bytes DIV $frameBytes"))
    features.toDF()
      .select(col("doc_id"), nf.as("nf"))
      .withColumn("stride", expr(s"(nf + ${maxFrames - 1}) DIV $maxFrames"))
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("nf") - 1, col("stride")))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * frameBytes).as("byte_offset"))
  }

  case class AudioWindow(doc_id: Long, win_idx: Int, byte_offset: Long,
    energy: Long, peak: Int)

  /** Windowed energy over audio-like payloads — the stub stand-in
    * for PCM frame analysis (silence trimming, loudness gating,
    * segment selection in a speech-data pipeline). Windows of `win`
    * bytes every `hop` bytes (last full window only; a short payload
    * is one clamped window); per window energy = Σ byte² and peak =
    * max byte — integer arithmetic end to end, so the oracle replays
    * it exactly over ascii() of the text payload. Map-side only
    * (mapPartitions, no shuffle); a real decoder swaps in at the
    * byte-source boundary like [[decodeFeatures]]. */
  def audioEnergy(media: Dataset[MediaRow], win: Int = 256,
      hop: Int = 128): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        val n = r.media.length
        val nw = if (n <= win) 1 else (n - win) / hop + 1
        (0 until nw).map { wi =>
          val s = wi * hop
          val e = math.min(s + win, n)
          var energy = 0L
          var peak = 0
          var i = s
          while (i < e) {
            val b = r.media(i) & 0xFF
            energy += b.toLong * b
            if (b > peak) peak = b
            i += 1
          }
          AudioWindow(r.doc_id, wi, s.toLong, energy, peak)
        }
      }
    }.toDF()
  }

  case class FrameDelta(doc_id: Long, frame_idx: Int, energy: Long,
    delta: Long, is_cut: Boolean)

  /** Scene-cut detection over video-like payloads — the stub
    * stand-in for shot-boundary detection (frame-difference
    * thresholding, the classic first pass of any video curation
    * pipeline): split the payload into ⌊n / frameBytes⌋ full frames
    * (a short payload is one clamped frame; the partial tail is not
    * a frame, matching [[frameSample]]), per-frame energy = Σ bytes,
    * and a cut wherever |energy − previous energy| exceeds
    * `threshold`. Integer arithmetic end to end so the oracle
    * replays it exactly over ascii() of the text payload. Map-side
    * only (mapPartitions, the per-doc frame fold needs no shuffle);
    * a real frame decoder + histogram distance swaps in at the same
    * boundary as [[decodeFeatures]]. */
  def sceneCuts(media: Dataset[MediaRow], frameBytes: Int = 256,
      threshold: Long = 300): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        val n = r.media.length
        val nf = if (n < frameBytes) 1 else n / frameBytes
        var prev = 0L
        (0 until nf).map { fi =>
          val s = fi * frameBytes
          val e = math.min(s + frameBytes, n)
          var energy = 0L
          var i = s
          while (i < e) { energy += (r.media(i) & 0xFF); i += 1 }
          val delta = if (fi == 0) 0L else math.abs(energy - prev)
          prev = energy
          FrameDelta(r.doc_id, fi, energy, delta,
            fi > 0 && delta > threshold)
        }
      }
    }.toDF()
  }

  case class MediaHash(doc_id: Long, phash: Long)

  /** Perceptual hash (dHash) over the decoded payload — the image
    * near-dup primitive: split the payload into 61 positional
    * segments (the stub's stand-in for the 61 pixel columns of a
    * downscaled grayscale image), sum the byte values in each, and
    * take the 60 gradient bits (bit i = segment i outranks segment
    * i+1) — exactly dHash's structure, so small local edits flip few
    * bits while reordering the content is a different image. 60 bits
    * (not 64) keeps the code positive in every engine's signed
    * 64-bit integer, the same portability choice as the checksum
    * below; the oracle replays the segmentation with integer
    * arithmetic over ascii() of the characters (payloads here are
    * ASCII text bytes). */
  def phash(media: Dataset[MediaRow]): Dataset[MediaHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val seg = new Array[Long](61)
      it.map { r =>
        java.util.Arrays.fill(seg, 0L)
        val n = r.media.length
        // empty payload → all-zero segments → code 0 (the division
        // below would otherwise throw on the first byte of nothing)
        var i = 0
        while (i < n) {
          // segment = floor(i·61 / n): the same 61-way split however
          // long the payload, exact in integer arithmetic
          seg((i.toLong * 61 / n).toInt) += (r.media(i) & 0xFF)
          i += 1
        }
        var code = 0L
        i = 0
        while (i < 60) {
          code = (code << 1) | (if (seg(i) > seg(i + 1)) 1L else 0L)
          i += 1
        }
        MediaHash(r.doc_id, code)
      }
    }
  }

  /** Near-dup pairs by perceptual hash: the shared banded-hamming
    * kernel ([[graft.dedup.Dedup.bandedHammingPairs]]) at 4 bands ×
    * 15 bits + exact `bit_count(xor)` verification — per-bucket
    * joins, never n², integer arithmetic every engine replays.
    * Unlike SimHash's documented-heuristic wider radius, this
    * surface PROMISES pigeonhole recall, so radii past the 4-band
    * guarantee are rejected rather than silently lossy. */
  def phashPairs(hashes: Dataset[MediaHash], maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      s"4×15-bit banding guarantees recall only for hamming ≤ 3; " +
        s"got $maxHamming — add bands instead of widening the radius")
    graft.dedup.Dedup.bandedHammingPairs(hashes.toDF(), "doc_id", "phash",
        bands = 4, bandBits = 15, maxHamming)
      .select(col("a"), col("b"), col("hamming").cast("long").as("hamming"))
  }

  /** STUB decode: stands in for an image decoder. Deterministic
    * dimensions/checksum from the bytes; processes each partition
    * in batches of `batchSize` the way a vectorized decoder would.
    * The checksum is the first 60 bits of md5(payload) — a content
    * hash every engine reproduces bit-for-bit (a wrapping `*31`
    * accumulator would be Java-only semantics: SQL BIGINTs error on
    * overflow instead of wrapping), which is what makes this query
    * oracle-checkable rather than rows-only. */
  def decodeFeatures(media: Dataset[MediaRow], batchSize: Int = 64)
      : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // one digest per partition, reset per row — allocation-free in
      // the row loop, the way a vectorized decoder would reuse buffers
      val md = java.security.MessageDigest.getInstance("MD5")
      it.grouped(batchSize).flatMap { batch =>
        // a real decoder would hand `batch` to the codec in one call
        batch.map { r =>
          val n = r.media.length
          md.reset()
          val dig = md.digest(r.media)
          // first 15 hex chars = 60 bits: always non-negative, exact
          // in any engine's signed 64-bit integer
          var cs = 0L
          var i = 0
          while (i < 15) {
            val nib = if (i % 2 == 0) (dig(i / 2) >> 4) & 0xF
                      else dig(i / 2) & 0xF
            cs = (cs << 4) | nib
            i += 1
          }
          MediaFeatures(r.doc_id, r.media_type, n,
            width = 16 + (n % 64), height = 16 + ((n / 64) % 64), checksum = cs)
        }
      }
    }
  }

  /** Voice-activity segmentation over [[audioEnergy]] windows — the
    * silence-trimming pass of a speech-data pipeline: a window is
    * "speech" when its energy clears `threshold`, and consecutive
    * speech windows merge into segments by gaps-and-islands
    * (win_idx − rank among the doc's speech windows is constant
    * within a run). Emits per segment the window span, byte span a
    * trimmer would cut at, and total energy — integer arithmetic end
    * to end, so the oracle replays it exactly.
    *
    * Scale shape: the energy scan is map-side; the only shuffle is
    * the per-doc window partition (docs are independent, so the key
    * is perfectly parallel), and segments-per-doc is bounded by
    * windows-per-doc. A real VAD (WebRTC, Silero) swaps in at the
    * per-window energy/probability boundary; the island merge is
    * unchanged. */
  def vadSegments(energyWindows: DataFrame, threshold: Long,
      win: Int = 256, hop: Int = 128): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val speech = energyWindows.filter(col("energy") > threshold)
    val byDoc = Window.partitionBy("doc_id").orderBy("win_idx")
    speech
      .withColumn("island", col("win_idx") - row_number().over(byDoc))
      .groupBy(col("doc_id"), col("island"))
      .agg(min("win_idx").as("start_win"), max("win_idx").as("end_win"),
        count(lit(1)).as("n_wins"), sum("energy").as("seg_energy"))
      .select(col("doc_id"),
        row_number().over(
          Window.partitionBy("doc_id").orderBy("start_win")).as("seg_idx"),
        col("start_win").cast("long").as("start_win"),
        col("end_win").cast("long").as("end_win"),
        col("n_wins").cast("long").as("n_wins"),
        (col("start_win") * hop).cast("long").as("start_byte"),
        (col("end_win") * hop + win).cast("long").as("end_byte"),
        col("seg_energy").cast("long").as("seg_energy"))
  }
}
