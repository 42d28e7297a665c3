package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: images/audio/video ride through the engine
  * as opaque `binary` columns with typed metadata. The Spark-side plumbing
  * (schema, batching, partition sizing) is real; image and audio decode
  * are REAL over the JDK's own codecs ([[decodeImage]] via javax.imageio,
  * [[decodeAudio]] via javax.sound.sampled — no external dependency).
  * [[decodeStub]] stays as the modality-agnostic deterministic path with
  * closed-form oracle math; video decode would need a container library
  * this environment doesn't ship and keeps the stub shape.
  *
  * Scale notes (100 TB):
  *  - Media bytes dominate row size: keep them in their own column so
  *    column pruning drops them for metadata-only queries, and size file
  *    partitions by bytes not rows (`maxPartitionBytes`).
  *  - Decode runs via `mapPartitions` so per-partition codec setup (model
  *    load, JNI init) happens once per task, not once per row — the same
  *    batch shape a pandas/Arrow UDF would have.
  *  - Features come back as fixed-width array<float> ready for the
  *    Similarity operators.
  */
object Multimodal {

  /** One media asset: id, modality tag, raw bytes, sidecar metadata.
    * `media_id` is a string so identity can carry a full 128-bit digest
    * (or a source path) without truncation — at corpus scale the id is a
    * join/dedup key, and a truncated hash key silently conflates distinct
    * assets (birthday bound: 40 bits collide with p≈0.45 at 1 M files). */
  final case class MediaRecord(media_id: String, modality: String,
                               content: Array[Byte], meta: Map[String, String])

  /** Decoded/feature-extracted output: id + fixed-width feature vector +
    * extracted dims. */
  final case class MediaFeatures(media_id: String, modality: String,
                                 width: Int, height: Int, n_frames: Int,
                                 features: Array[Float])

  /** Wrap arbitrary rows into media records (here: fake "images" from text
    * bytes so the plumbing is testable end-to-end without codecs). */
  def asMediaRecords(df: DataFrame, idCol: String, payloadCol: String,
                     modality: String): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("string").as("media_id"),
        lit(modality).as("modality"),
        col(payloadCol).cast("binary").as("content"))
      .withColumn("meta", map(lit("src"), lit(payloadCol)))
      .as[MediaRecord]
  }

  /** Production media ingestion: Spark's built-in `binaryFile` source
    * reads a directory tree as (path, modificationTime, length, content)
    * — the real on-ramp for image/audio/video corpora (no codec needed
    * to INGEST; decode happens downstream via [[decodeStub]]'s
    * mapPartitions shape). Records are keyed by the FULL 128-bit md5 of
    * the file path (hex string): unlike the text operators' 40-bit
    * feature hashes — which feed collision-tolerant aggregates — this is
    * a primary join/dedup key, and a truncated digest conflates distinct
    * assets at corpus scale. Path/length/mtime ride in the sidecar meta.
    *
    * Scale notes: `pathGlobFilter` prunes non-media files at listing
    * time; the source pushes `length < maxBytes` down to the file
    * listing (oversized assets never reach an executor); media bytes
    * stay in their own column so metadata-only queries prune them. */
  def readMediaDir(spark: SparkSession, dir: String, modality: String,
                   pathGlob: String = "*", maxBytes: Long = Long.MaxValue): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", pathGlob)
      .load(dir)
      .filter(col("length") <= maxBytes)
      .select(
        md5(col("path").cast("binary")).as("media_id"),
        lit(modality).as("modality"),
        col("content"),
        map(
          lit("path"), col("path"),
          lit("bytes"), col("length").cast("string"),
          lit("mtime"), col("modificationTime").cast("string")).as("meta"))
      .as[MediaRecord]
  }

  /** Fail-fast duplicate-identity guard: raises if any `media_id` is
    * carried by more than one record (distinct paths hashing to one id,
    * or a caller-supplied id column with repeats). Identity collisions
    * here silently merge distinct assets in every downstream join/dedup,
    * so the guard is an explicit maintenance check. Cost: one aggregation
    * over (media_id, path) — media bytes never move. NOTE: runs an
    * eager Spark action. */
  def requireUniqueIds(records: Dataset[MediaRecord]): Dataset[MediaRecord] = {
    val dups = records.toDF()
      .groupBy("media_id")
      .agg(count(lit(1)).as("n"),
        // diagnostic provenance: mediaFromDir meta carries 'path',
        // the asMediaRecords on-ramp carries 'src' — take whichever exists
        array_sort(collect_set(coalesce(
          element_at(col("meta"), "path"),
          element_at(col("meta"), "src")))).as("paths"))
      .filter(col("n") > 1)
      .limit(5)
      .collect()
    require(dups.isEmpty,
      s"duplicate media_id(s): ${dups.map(r =>
        s"${r.get(0)} ×${r.get(1)} [${r.getSeq[String](2).mkString(", ")}]")
        .mkString("; ")}")
    records
  }

  /** Decoded image output: real dimensions, raster channel count, and
    * per-channel pixel statistics. `channels = 0` (with zero dims and
    * features) marks bytes no installed reader could decode — kept as a
    * row rather than dropped so corrupt-asset rates are queryable. */
  final case class ImageFeatures(media_id: String, modality: String,
                                 width: Int, height: Int, channels: Int,
                                 features: Array[Float])

  /** REAL image decoder over the JDK's `javax.imageio` (PNG, JPEG, GIF,
    * BMP — no external dependency): decodes each record's bytes and
    * extracts true width/height, the raster's channel count, and
    * per-channel statistics as the feature vector — slots
    * [4b, 4b+3] hold band b's (mean, stddev, min, max), each normalized
    * by 255, for up to `featureDim/4` bands; unused slots stay 0.
    *
    * Same execution shape as [[decodeStub]] (which remains the
    * deterministic-math path the oracle checks): `mapPartitions` so
    * per-task codec setup — the ImageIO plugin registry scan, disk
    * cache off — happens once per partition, not per row; the pixel
    * scan is the decode cost and is embarrassingly per-row. Undecodable
    * bytes yield the `channels = 0` marker row, never an executor
    * throw: at corpus scale some assets ARE corrupt, and one bad file
    * must not kill a 10^6-row task. */
  def decodeImage(records: Dataset[MediaRecord],
                  featureDim: Int = 16): Dataset[ImageFeatures] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.content))
          // NonFatal, not just IOException: the JDK's image plugins throw
          // unchecked exceptions on malformed input (CMMException on broken
          // ICC profiles, IllegalArgumentException / IndexOutOfBounds on
          // truncated JPEG/PNG streams) — at corpus scale some assets ARE
          // fuzzed garbage, and one of them must not kill a 10^6-row task
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null)
          ImageFeatures(r.media_id, r.modality, 0, 0, 0,
            Array.fill(featureDim)(0.0f))
        else {
          val raster = img.getRaster
          val w = img.getWidth
          val h = img.getHeight
          val nb = raster.getNumBands
          val feats = Array.fill(featureDim)(0.0f)
          val nStatBands = math.min(nb, featureDim / 4)
          val n = w.toDouble * h.toDouble
          var b = 0
          while (b < nStatBands) {
            var sum = 0.0; var sumSq = 0.0
            var mn = Double.MaxValue; var mx = Double.MinValue
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val v = raster.getSampleDouble(x, y, b)
                sum += v; sumSq += v * v
                if (v < mn) mn = v
                if (v > mx) mx = v
                x += 1
              }
              y += 1
            }
            val mean = sum / n
            val variance = math.max(0.0, sumSq / n - mean * mean)
            feats(b * 4) = (mean / 255.0).toFloat
            feats(b * 4 + 1) = (math.sqrt(variance) / 255.0).toFloat
            feats(b * 4 + 2) = (mn / 255.0).toFloat
            feats(b * 4 + 3) = (mx / 255.0).toFloat
            b += 1
          }
          ImageFeatures(r.media_id, r.modality, w, h, nb, feats)
        }
      }
    }
  }

  /** Decoded audio output: real container-level sample rate, channel and
    * frame counts, duration, and per-channel amplitude statistics.
    * `channels = 0` (zero everything) marks bytes no installed reader
    * could decode — kept as a row, not dropped, so corrupt-asset rates
    * stay queryable, exactly like [[ImageFeatures]]. */
  final case class AudioFeatures(media_id: String, modality: String,
                                 sample_rate: Int, channels: Int,
                                 n_frames: Long, duration_ms: Long,
                                 features: Array[Float])

  /** REAL audio decoder over the JDK's `javax.sound.sampled` (WAV, AIFF,
    * AU — no external dependency): decodes each record's bytes, converts
    * to 16-bit signed PCM when the container holds another encoding the
    * JDK can transcode (8-bit, big-endian, µ-law/a-law), and extracts
    * true sample rate / channels / frame count plus per-channel
    * (rms, peak) amplitude statistics normalized by full scale — slots
    * [2c, 2c+1] hold channel c's pair, for up to `featureDim/2`
    * channels; unused slots stay 0.
    *
    * Same execution shape as [[decodeImage]]: `mapPartitions` so
    * per-task codec setup happens once per partition; the sample scan is
    * the decode cost and is embarrassingly per-row; undecodable bytes
    * yield the `channels = 0` marker row, never an executor throw. */
  def decodeAudio(records: Dataset[MediaRecord],
                  featureDim: Int = 8): Dataset[AudioFeatures] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val bad = (r: MediaRecord) =>
        AudioFeatures(r.media_id, r.modality, 0, 0, 0L, 0L,
          Array.fill(featureDim)(0.0f))
      it.map { r =>
        try {
          val in = AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.content))
          val f = in.getFormat
          val pcm = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
            f.getSampleRate, 16, f.getChannels, f.getChannels * 2,
            f.getSampleRate, false)
          val s = if (f.matches(pcm)) in
                  else AudioSystem.getAudioInputStream(pcm, in)
          val ch = pcm.getChannels
          val bytes = s.readAllBytes()
          val frames = bytes.length / (ch * 2)
          val nStatCh = math.min(ch, featureDim / 2)
          val sumSq = new Array[Double](nStatCh)
          val peak = new Array[Double](nStatCh)
          var i = 0
          while (i < frames) {
            var c = 0
            while (c < nStatCh) {
              val o = (i * ch + c) * 2
              val v = ((bytes(o) & 0xff) | (bytes(o + 1) << 8)).toDouble
              sumSq(c) += v * v
              val a = math.abs(v)
              if (a > peak(c)) peak(c) = a
              c += 1
            }
            i += 1
          }
          val feats = Array.fill(featureDim)(0.0f)
          var c = 0
          while (c < nStatCh) {
            feats(2 * c) =
              (math.sqrt(if (frames == 0) 0.0 else sumSq(c) / frames)
                / 32768.0).toFloat
            feats(2 * c + 1) = (peak(c) / 32768.0).toFloat
            c += 1
          }
          AudioFeatures(r.media_id, r.modality,
            math.round(f.getSampleRate), ch, frames.toLong,
            math.round(frames * 1000.0 / f.getSampleRate), feats)
        } catch {
          // unsupported container, truncated stream, a transcode the JDK
          // cannot provide, or any other unchecked codec failure — all
          // mean "not decodable here", and none may kill the task (same
          // NonFatal discipline as decodeImage)
          case scala.util.control.NonFatal(_) => bad(r)
        }
      }
    }
  }

  /** STUB decoder: deterministic fake features derived from the bytes
    * (length, simple rolling byte statistics). Kept alongside
    * [[decodeImage]] as the modality-agnostic path with closed-form
    * oracle math; a real audio/video implementation would follow
    * decodeImage's shape. */
  def decodeStub(records: Dataset[MediaRecord], featureDim: Int = 16): Dataset[MediaFeatures] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      // per-partition "codec init" happens here (once per task)
      it.map { r =>
        val bytes = r.content
        val feats = Array.tabulate(featureDim) { i =>
          if (bytes.isEmpty) 0.0f
          else {
            var acc = 0L
            var j = i
            while (j < bytes.length) { acc += (bytes(j) & 0xff); j += featureDim }
            (acc % 1000) / 1000.0f
          }
        }
        val w = if (bytes.isEmpty) 0 else 64 + (bytes.length % 64)
        MediaFeatures(r.media_id, r.modality, w, w, 1, feats)
      }
    }
  }

  /** "Resize": here a metadata transform (a real one would re-encode
    * content); kept as a Dataset op so it composes with decode. */
  def resize(features: Dataset[MediaFeatures], w: Int, h: Int): Dataset[MediaFeatures] = {
    val spark = features.sparkSession
    import spark.implicits._
    features.map(f => f.copy(width = w, height = h))
  }

  /** Frame sampling for video-modality rows: keep every nth frame index as
    * metadata (stub — a real impl slices the container). */
  def frameSample(features: Dataset[MediaFeatures], everyNth: Int): Dataset[MediaFeatures] = {
    val spark = features.sparkSession
    import spark.implicits._
    features.map(f => f.copy(n_frames = math.max(1, f.n_frames / math.max(1, everyNth))))
  }

  /** Metadata-only projection used to prove column pruning drops the bytes:
    * byte size + md5 content key, no decode. */
  def metadataView(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol),
      length(col(payloadCol).cast("binary")).as("n_bytes"),
      md5(col(payloadCol).cast("binary")).as("content_key"))
}
