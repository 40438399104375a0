package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing (north star): opaque binary payloads with
  * typed metadata, decoded/feature-extracted in a distributed typed map.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB (`FakeDecoder`) — what is REAL and
  * tested is the Spark-side shape: binary column handling, a
  * case-class row model, mapPartitions batch processing (one decoder
  * instance per partition, the way a JNI/codec handle would amortize),
  * and explodeable per-frame output.
  */
object MultimodalOps {

  /** Row model for a binary asset and its extracted features. */
  final case class Asset(doc_id: Long, payload: Array[Byte])
  final case class AssetMeta(doc_id: Long, n_bytes: Long, width: Long,
      height: Long, n_frames: Long)

  /** STUB decoder: stands in for an image/audio codec. Deterministic
    * arithmetic on the payload so results are verifiable; a real
    * deployment swaps `decode` for the codec call without touching the
    * Spark plumbing. */
  object FakeDecoder {
    def decode(a: Asset): AssetMeta = {
      val n = a.payload.length.toLong
      AssetMeta(a.doc_id, n, 16L + n % 640L, 16L + n % 480L, 1L + n % 5L)
    }
  }

  /** Binary metadata extraction: text → utf-8 payload (the testdata has
    * no true binary column; the cast is the payload source), then
    * per-partition batch decode. The decoder is instantiated once per
    * partition, not per row — the pattern that matters for real codecs. */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select($"doc_id", encode($"text", "utf-8").as("payload"))
      .as[Asset]
      .mapPartitions { it =>
        val decoder = FakeDecoder // one handle per partition
        it.map(decoder.decode)
      }
      .toDF()
  }

  private val binaryMetaSql =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  16 + octet_length(encode(text)) % 640 AS width,
      |  16 + octet_length(encode(text)) % 480 AS height,
      |  1 + octet_length(encode(text)) % 5 AS n_frames
      |FROM documents""".stripMargin

  /** q96 — stub RESIZE (the north-star multimodal op set is decode /
    * feature-extract / resize / frame-sample; this completes it):
    * 4× byte-stride decimation of the payload stands in for pixel
    * decimation — a real deployment swaps the stride loop for the
    * image-library resample without touching the Spark shape. What is
    * REAL here: binary-in/binary-out columnar processing (pure
    * engine-side byte ops via the hex encoding — both engines compute
    * hex() identically, so the resized payload's md5 is IN the hash
    * check), the metadata recompute (new dims from the q50 stub-decode
    * arithmetic), and the stateless one-scan shape that makes the op a
    * safe first pass over 100 TB of media. No decoder handle needed —
    * byte decimation is arithmetic, so this stays whole-stage codegen
    * instead of paying q55's per-partition mapPartitions pattern. */
  def resizeThumbs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // nn = greatest(n, 1) makes the empty-doc guard STRUCTURAL: at
    // n = 0 the raw (n - 1) div 4 term would diverge between engines
    // (Spark div truncates toward zero → 0, DuckDB // floors → -1);
    // clamping in BOTH forms pins thumb_bytes = 1 for empty payloads
    // (a 1-byte thumb of an empty image — the degenerate-input policy)
    // so a new corpus with empty docs cannot silently desynchronize.
    // fanned read (guide §2.5): hex + per-byte stride transform + md5
    // per row — pure map work that a single-split scan serializes
    Tables.fanned(spark, dir, "documents")
      .withColumn("hexstr", hex(encode($"text", "utf-8")))
      .withColumn("n", expr("CAST(length(hexstr) div 2 AS BIGINT)"))
      .withColumn("nn", expr("greatest(n, 1L)"))
      .select($"doc_id",
        $"n".as("orig_bytes"),
        expr("(nn - 1) div 4 + 1").as("thumb_bytes"),
        expr("16 + n % 640").as("orig_width"),
        expr("16 + ((nn - 1) div 4 + 1) % 640").as("thumb_width"),
        md5(expr("array_join(transform(sequence(0L, (nn - 1) div 4), " +
          "i -> substring(hexstr, CAST(i * 8 + 1 AS INT), 2)), '')"))
          .as("thumb_md5"))
  }

  private val resizeThumbsSql =
    """WITH m AS (
      |  SELECT doc_id, text,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS n,
      |    GREATEST(CAST(octet_length(encode(text)) AS BIGINT), 1) AS nn
      |  FROM documents)
      |SELECT doc_id,
      |  n AS orig_bytes,
      |  CAST((nn - 1) // 4 + 1 AS BIGINT) AS thumb_bytes,
      |  CAST(16 + n % 640 AS BIGINT) AS orig_width,
      |  CAST(16 + ((nn - 1) // 4 + 1) % 640 AS BIGINT) AS thumb_width,
      |  md5(array_to_string(list_transform(
      |    range(0, (nn - 1) // 4 + 1),
      |    i -> substr(hex(encode(text)), CAST(i * 8 + 1 AS INT), 2)), ''))
      |    AS thumb_md5
      |FROM m""".stripMargin

  /** Frame sampling: one output row per sampled frame with its byte
    * offset — the explode-shaped step a video pipeline runs before
    * per-frame feature extraction. Built on the same stub decode. */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    binaryMeta(spark, dir)
      .withColumn("frame_idx", explode(expr("sequence(0, n_frames - 1)")))
      .select($"doc_id", $"frame_idx".cast("long").as("frame_idx"),
        ($"frame_idx" * ($"n_bytes" / $"n_frames").cast("long"))
          .cast("long").as("byte_offset"))
  }

  private val frameSampleSql =
    """WITH m AS (
      |  SELECT doc_id,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |    1 + octet_length(encode(text)) % 5 AS n_frames
      |  FROM documents)
      |SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
      |  CAST(f * (n_bytes // n_frames) AS BIGINT) AS byte_offset
      |FROM m, unnest(generate_series(0, n_frames - 1)) t(f)""".stripMargin

  /** Per-asset extracted features. `thumb_md5` is the "resize" stand-in:
    * the hash of the leading 64-byte thumbnail slice. */
  final case class AssetFeatures(doc_id: Long, n_bytes: Long,
      n_space: Long, n_lower: Long, thumb_md5: String)

  /** Feature extraction inside the decode pass: content stats and a
    * thumbnail digest computed per asset in the same one-instance-per-
    * partition batch map a real codec would use (the MessageDigest here
    * plays the role of the expensive per-partition handle). The decoder
    * "decodes" the payload back to its character stream and computes
    * every feature in the CHARACTER domain (thumbnail = first 64 CODE
    * POINTS — `offsetByCodePoints`, not UTF-16 units, so supplementary-
    * plane payloads slice exactly where the oracle's code-point substr
    * does; the space/lowercase counts are single-unit predicates, safe
    * char-wise). n_bytes stays a true byte count. */
  def featureExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select($"doc_id", encode($"text", "utf-8").as("payload"))
      .as[Asset]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { a =>
          val decoded = new String(a.payload, java.nio.charset.StandardCharsets.UTF_8)
          md.reset()
          val thumbEnd = decoded.offsetByCodePoints(0,
            math.min(64, decoded.codePointCount(0, decoded.length)))
          val thumbMd5 = md.digest(decoded.substring(0, thumbEnd)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
            .map("%02x".format(_)).mkString
          AssetFeatures(a.doc_id, a.payload.length.toLong,
            decoded.count(_ == ' ').toLong,
            decoded.count(c => c >= 'a' && c <= 'z').toLong,
            thumbMd5)
        }
      }
      .toDF()
  }

  private val featureExtractSql =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(len(text) - len(replace(text, ' ', '')) AS BIGINT) AS n_space,
      |  CAST(len(text) - len(regexp_replace(text, '[a-z]', '', 'g'))
      |    AS BIGINT) AS n_lower,
      |  md5(substr(text, 1, 64)) AS thumb_md5
      |FROM documents""".stripMargin

  /** Per-frame features. `frame_md5` is the per-frame content digest a
    * frame-level dedup or embedding stage would key on. */
  final case class FrameFeatures(doc_id: Long, frame_idx: Long,
      n_chars_frame: Long, n_space: Long, frame_md5: String)

  /** q84 — frame sampling + per-frame feature extraction in ONE decode
    * pass: the video-pipeline shape (decode once, emit features for
    * every sampled frame) rather than q51's metadata-only explode
    * followed by a second decode. The flatMap inside `mapPartitions`
    * is the explode; the per-partition MessageDigest again stands in
    * for the expensive codec handle. Frame boundaries are computed in
    * the CHARACTER domain (code points — the q55 lesson: byte-wise
    * engine vs char-wise oracle diverges on the first non-ASCII
    * payload), frame length = n_chars div n_frames, trailing remainder
    * chars dropped by the stub's contract; `n_frames` stays the q50
    * stub's byte-derived value so the asset model is consistent.
    *
    * Scale shape: stateless flatMap, rows multiply ≤5× and stay
    * partition-local — the feature table inherits the scan's
    * partitioning for the downstream per-frame stage. */
  def frameFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select($"doc_id", encode($"text", "utf-8").as("payload"))
      .as[Asset]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { a =>
          val meta = FakeDecoder.decode(a)
          val decoded = new String(a.payload,
            java.nio.charset.StandardCharsets.UTF_8)
          val nChars = decoded.codePointCount(0, decoded.length)
          val flen = nChars / meta.n_frames.toInt
          (0 until meta.n_frames.toInt).map { fi =>
            val s = decoded.substring(
              decoded.offsetByCodePoints(0, fi * flen),
              decoded.offsetByCodePoints(0, fi * flen + flen))
            md.reset()
            FrameFeatures(a.doc_id, fi.toLong, flen.toLong,
              s.count(_ == ' ').toLong,
              md.digest(s.getBytes(
                java.nio.charset.StandardCharsets.UTF_8))
                .map("%02x".format(_)).mkString)
          }
        }
      }
      .toDF()
  }

  private val frameFeaturesSql =
    """WITH m AS (
      |  SELECT doc_id, text,
      |    1 + octet_length(encode(text)) % 5 AS n_frames,
      |    len(text) AS n_chars
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, fi,
      |    CAST(n_chars // n_frames AS BIGINT) AS n_chars_frame,
      |    substr(text, 1 + CAST(fi * (n_chars // n_frames) AS INT),
      |      CAST(n_chars // n_frames AS INT)) AS fr
      |  FROM m, unnest(generate_series(0, n_frames - 1)) t(fi))
      |SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx, n_chars_frame,
      |  CAST(len(fr) - len(replace(fr, ' ', '')) AS BIGINT) AS n_space,
      |  md5(fr) AS frame_md5
      |FROM f""".stripMargin

  /** q140's cost model, interpolated into the oracle from the same
    * constants the engine binds: tokens charged per decoded frame (a
    * vision encoder's patch budget) and the multimodal context-window
    * length. */
  private val FrameTokens = 64L
  private val MmSeqLen = 256L

  /** q140 — INTERLEAVED multimodal packing: the q91 contiguous-stream
    * packing under a multimodal COST MODEL — each document costs its
    * text tokens PLUS [[FrameTokens]] per decoded frame (the fixed
    * patch budget a vision encoder charges per image, the way
    * interleaved image-text pretraining actually bills its context) —
    * so the loader reads placements whose offsets already account for
    * image tokens. Frame counts come from the SAME deterministic stub
    * formula the q50 decode path emits (columnar twin, q50's oracle
    * already pins it); shard and order come from q80's salted-md5
    * device under a "mm:" salt, so the multimodal shuffle is
    * independent of the text corpus's q80 permutation.
    *
    * Scale shape: q91's exactly — row-local hash + cost arithmetic,
    * ONE per-shard running-sum window, nShards the scale lever. The
    * decode-dependent frame count is columnar here (no handle
    * needed for a length), so the whole query is whole-stage codegen
    * around that one window. */
  def mmPackedStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val nShards = 16
    val costed = Tables(spark, dir, "documents")
      .select($"doc_id",
        coalesce(size(split($"text", " ")), lit(0)).cast("long")
          .as("n_text_tokens"),
        (lit(1L) + length(encode($"text", "utf-8")) % 5L)
          .as("n_frames"),
        PipelineOps.md5PrefixLong(
          concat(lit("mm:"), $"doc_id".cast("string")), 15)
          .as("shuffle_key"))
      .withColumn("n_image_tokens", $"n_frames" * FrameTokens)
      .withColumn("cost", $"n_text_tokens" + $"n_image_tokens")
      .withColumn("shard", ($"shuffle_key" % nShards).cast("long"))
    val w = Window.partitionBy($"shard")
      .orderBy($"shuffle_key".asc, $"doc_id".asc)
    val wSum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    costed
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("start_off", sum($"cost").over(wSum) - $"cost")
      .select($"doc_id", $"shard", $"pos",
        $"n_text_tokens", $"n_image_tokens", $"cost", $"start_off",
        expr(s"start_off div $MmSeqLen").as("start_seq"),
        expr(s"(start_off + cost - 1) div $MmSeqLen").as("end_seq"))
  }

  private val mmPackedStreamSql =
    s"""WITH c AS (
      |  SELECT doc_id,
      |    CAST(COALESCE(len(string_split(text, ' ')), 0) AS BIGINT)
      |      AS n_text_tokens,
      |    CAST(1 + octet_length(encode(text)) % 5 AS BIGINT) AS n_frames,
      |    CAST(concat('0x', substr(md5(concat('mm:',
      |      CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) AS shuffle_key
      |  FROM documents),
      |k AS (
      |  SELECT doc_id, n_text_tokens,
      |    n_frames * $FrameTokens AS n_image_tokens,
      |    n_text_tokens + n_frames * $FrameTokens AS cost,
      |    shuffle_key, shuffle_key % 16 AS shard
      |  FROM c),
      |p AS (
      |  SELECT doc_id, shard, n_text_tokens, n_image_tokens, cost,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY shard
      |      ORDER BY shuffle_key, doc_id) AS BIGINT) AS pos,
      |    CAST(SUM(cost) OVER (PARTITION BY shard
      |      ORDER BY shuffle_key, doc_id
      |      ROWS UNBOUNDED PRECEDING) - cost AS BIGINT) AS start_off
      |  FROM k)
      |SELECT doc_id, shard, pos, n_text_tokens, n_image_tokens, cost,
      |  start_off,
      |  start_off // $MmSeqLen AS start_seq,
      |  (start_off + cost - 1) // $MmSeqLen AS end_seq
      |FROM p""".stripMargin

  /** q188's frame pitch: digests are taken over FIXED 32-code-point
    * windows (trailing remainder dropped), NOT the q84 stub's
    * per-asset length-derived geometry — a copy that gained or lost a
    * few trailing bytes would otherwise re-frame ENTIRELY differently
    * and share nothing (exactly what made the first cut of this query
    * return zero rows on the near-dup corpus). Fixed pitch is what
    * real scene-hash dedup uses: alignment survives trailing edits. */
  private val DedupFramePitch = 32

  /** q188 — cross-asset near-dup detection in the BINARY domain: two
    * media assets are near-duplicates when they share frame-content
    * digests (re-encoded, re-containered, or trimmed copies keep most
    * frame content — the fixed-pitch digest is the stand-in for a
    * perceptual frame hash). Candidate generation is the dedup
    * family's equi shape: a self-join on `frame_md5` (Σ digest-
    * group², never asset²), then per-pair shared-frame counts against
    * each side's frame inventory, with the containment verdict
    * n_shared·2 ≥ min(na, nb) in cross-multiplied integer form.
    * Within-asset repeated frames are collapsed first (set semantics —
    * a still-frame loop must not inflate overlap).
    *
    * This extends exact/near dedup (q40/q42), semantic dedup (q111),
    * and chunk dedup (q145) to the multimodal column: same
    * fingerprint-block-verify architecture, keyed on decoded content
    * digests instead of text shingles. At 100 TB a hot digest (black
    * frame, intro card) is the skew lever — cap or drop
    * degenerate-frequency digests exactly like q42's band-bucket
    * caps. */
  def mediaDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pitch = DedupFramePitch
    val frames = Tables(spark, dir, "documents")
      .select($"doc_id", encode($"text", "utf-8").as("payload"))
      .as[Asset]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { a =>
          val decoded = new String(a.payload,
            java.nio.charset.StandardCharsets.UTF_8)
          val nChars = decoded.codePointCount(0, decoded.length)
          (0 until nChars / pitch).map { fi =>
            val s = decoded.substring(
              decoded.offsetByCodePoints(0, fi * pitch),
              decoded.offsetByCodePoints(0, fi * pitch + pitch))
            md.reset()
            (a.doc_id, md.digest(s.getBytes(
              java.nio.charset.StandardCharsets.UTF_8))
              .map("%02x".format(_)).mkString)
          }
        }
      }
      .toDF("doc_id", "frame_md5").distinct()
    val counts = frames.groupBy($"doc_id").agg(count(lit(1)).as("nf"))
    val shared = frames.select($"doc_id".as("a_id"), $"frame_md5")
      .join(frames.select($"doc_id".as("b_id"), $"frame_md5"),
        "frame_md5")
      .filter($"a_id" < $"b_id")
      .groupBy($"a_id", $"b_id").agg(count(lit(1)).as("n_shared"))
    shared
      .join(counts.select($"doc_id".as("a_id"), $"nf".as("na")), "a_id")
      .join(counts.select($"doc_id".as("b_id"), $"nf".as("nb")), "b_id")
      .select($"a_id", $"b_id", $"n_shared", $"na", $"nb",
        ($"n_shared" * 2 >= least($"na", $"nb")).as("is_dup"))
  }

  private val mediaDedupSql =
    s"""WITH fr0 AS (
      |  SELECT doc_id,
      |    md5(substr(text, 1 + CAST(fi * $DedupFramePitch AS INT),
      |      $DedupFramePitch)) AS frame_md5
      |  FROM documents,
      |    unnest(generate_series(0,
      |      len(text) // $DedupFramePitch - 1)) t(fi)),
      |fr AS (SELECT DISTINCT doc_id, frame_md5 FROM fr0),
      |cnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nf
      |  FROM fr GROUP BY 1),
      |sh AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |    CAST(COUNT(*) AS BIGINT) AS n_shared
      |  FROM fr a JOIN fr b
      |    ON a.frame_md5 = b.frame_md5 AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT sh.a_id, sh.b_id, sh.n_shared,
      |  ca.nf AS na, cb.nf AS nb,
      |  sh.n_shared * 2 >= least(ca.nf, cb.nf) AS is_dup
      |FROM sh JOIN cnt ca ON ca.doc_id = sh.a_id
      |        JOIN cnt cb ON cb.doc_id = sh.b_id""".stripMargin

  def queries: Seq[Q] = Seq(
    Q("q140_mm_packed_stream", mmPackedStream, Some(mmPackedStreamSql),
      "interleaved multimodal packing: q91's contiguous-stream device " +
        "under a text+frame-token cost model (64 tokens per decoded " +
        "frame) — loader placements billing image tokens into the " +
        "context window"),
    Q("q50_binary_meta", binaryMeta, Some(binaryMetaSql),
      "binary payload metadata via typed mapPartitions (stub decoder)"),
    Q("q51_frame_sample", frameSample, Some(frameSampleSql),
      "per-frame explode with byte offsets"),
    Q("q55_feature_extract", featureExtract, Some(featureExtractSql),
      "in-decoder feature extraction: byte stats + thumbnail digest"),
    Q("q84_frame_features", frameFeatures, Some(frameFeaturesSql),
      "one-pass frame sample + per-frame featurize (digest, char stats) " +
        "via flatMap in the decode partition map"),
    Q("q96_resize_thumbs", resizeThumbs, Some(resizeThumbsSql),
      "stub resize: 4x byte-stride decimation, binary-in/binary-out " +
        "columnar shape, resized payload digest IN the hash check"),
    Q("q188_media_dedup", mediaDedup, Some(mediaDedupSql),
      "multimodal near-dup: assets sharing frame-content digests " +
        "(equi join on digest, set semantics within asset) with " +
        "integer containment verdict — q42's architecture keyed on " +
        "decoded content instead of text shingles"))
}
