package graft.mm

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads with typed
  * metadata, processed partition-wise in fixed-size batches — the
  * shape a decode / feature-extraction / model-inference stage has
  * at scale (one batch = one accelerator call).
  *
  * The decode kernel itself is STUBBED (no image/audio libraries in
  * this container): [[StubKernel.decodeBatch]] is a deterministic
  * stand-in computing byte statistics. Everything around it — the
  * schema, the binary column, the batch iteration, the partition
  * boundaries — is real and tested.
  */
object Multimodal {

  /** A media row: binary payload + typed metadata. */
  case class MediaRow(doc_id: Long, media_type: String,
                      payload: Array[Byte], width: Int, height: Int)

  /** Extracted features per media item. */
  case class MediaFeatures(doc_id: Long, media_type: String,
                           payload_len: Long, first_byte: Int,
                           checksum: Long, mean_byte: Double)

  /** Deterministic stand-in for the real decoder. Takes a whole
    * batch (the accelerator-call shape) and returns one feature row
    * per payload. Swap this object to integrate a real decoder.
    */
  object StubKernel {
    val BatchSize = 64
    def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
      batch.map { m =>
        val bytes = m.payload
        var sum = 0L
        var i = 0
        while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
        MediaFeatures(
          doc_id = m.doc_id,
          media_type = m.media_type,
          payload_len = bytes.length.toLong,
          first_byte = if (bytes.isEmpty) -1 else bytes(0) & 0xff,
          checksum = sum % 997,
          // integer floor at 4dp: avoids double-rounding-mode drift
          // between engines when results are compared
          mean_byte = if (bytes.isEmpty) 0.0
            else (sum * 10000L / bytes.length).toDouble / 10000.0)
      }
  }

  /** Build the media table from `documents`: the UTF-8 bytes of the
    * text stand in for an encoded image; metadata is derived
    * deterministically. At scale this is a parquet table with a
    * large binary column — exactly this schema.
    */
  def attach(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      (when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("doc_id") % 64 + 32).cast("int").as("width"),
      (col("doc_id") % 48 + 24).cast("int").as("height"))

  /** FORMAT SNIFFING — magic-byte detection over binary payloads,
    * the first gate of every real media ingest (extensions and
    * declared container types LIE; the leading bytes don't): each
    * payload's leading bytes classify it as jpeg (FF D8 FF), png
    * (89 50 4E 47), gif (GIF89a), riff (RIFF — wav/avi/webp), or
    * unknown, cross-tabulated against the DECLARED media_type with
    * within-type shares — a hot off-diagonal cell means a feed is
    * mislabeling its blobs and every downstream decoder pays for
    * it. The feed is deterministically stamped by doc_id (first
    * rule wins, the corruptFeed discipline) so the oracle replays
    * the exact mismatch matrix; sniffing compares HEX prefixes
    * (uppercase on both engines) — no binary-literal parity risk.
    * Narrow map + one types×formats aggregate; REAL bytes, no stub.
    */
  def formatSniff(documents: DataFrame): DataFrame = {
    val jpeg = Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte)
    val png = Array(0x89.toByte, 0x50.toByte, 0x4E.toByte, 0x47.toByte)
    val fed = attach(documents).withColumn("payload",
      when(col("doc_id") % 5 === 0, concat(lit(jpeg), col("payload")))
        .when(col("doc_id") % 5 === 1, concat(lit(png), col("payload")))
        .when(col("doc_id") % 5 === 2,
          concat(lit("GIF89a".getBytes("UTF-8")), col("payload")))
        .when(col("doc_id") % 5 === 3,
          concat(lit("RIFF".getBytes("UTF-8")), col("payload")))
        .otherwise(col("payload")))
    val hx = hex(col("payload"))
    val cells = fed.withColumn("sniffed",
        when(hx.startsWith("FFD8FF"), "jpeg")
          .when(hx.startsWith("89504E47"), "png")
          .when(hx.startsWith("474946383961"), "gif")
          .when(hx.startsWith("52494646"), "riff")
          .otherwise("unknown"))
      .groupBy("media_type", "sniffed").agg(count(lit(1)).as("n"))
      .localCheckpoint() // matrix + per-type totals both read it
    val totals = cells.groupBy("media_type")
      .agg(sum("n").as("type_total"))
    cells.join(broadcast(totals), Seq("media_type"))
      .select(col("media_type"), col("sniffed"), col("n"),
        col("type_total"),
        expr("CAST(CAST(n AS DECIMAL(38,0)) * 1000000 " +
          "div type_total AS BIGINT)").as("share_ppm"))
  }

  /** Decode-shard planning: pack payloads into byte-budgeted shards
    * per media type (prefix-sum bucketing over the deterministic
    * doc order) — the batch-shaping step in front of a decode fleet,
    * where each shard is one bounded-bytes accelerator work unit.
    * One window pass per media_type partition; no payload bytes move,
    * only lengths.
    */
  def shardPlan(documents: DataFrame, budgetBytes: Long = 4096L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_type").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    attach(documents)
      .select(col("doc_id"), col("media_type"),
        length(col("payload")).cast("long").as("n_bytes"))
      .withColumn("cum", sum("n_bytes").over(w))
      .select(col("doc_id"), col("media_type"), col("n_bytes"),
        ((col("cum") - col("n_bytes")) / budgetBytes).cast("long").as("shard_id"))
  }

  /** Partition-wise batched decode: each partition's rows are
    * grouped into [[StubKernel.BatchSize]] batches and pushed through
    * the kernel. `mapPartitions` (not a per-row UDF) so the batch
    * boundary — the expensive accelerator round-trip at scale — is
    * explicit and amortized.
    */
  def features(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.grouped(StubKernel.BatchSize).flatMap(StubKernel.decodeBatch)
    }
  }

  /** Feature extraction as a DataFrame op for the driver contract. */
  def featureFrame(spark: SparkSession, documents: DataFrame): DataFrame =
    features(attach(documents))(spark).toDF()

  /** Frame sampling for video payloads: each video row explodes into
    * a deterministic frame index (count and byte offsets derived from
    * payload length — the stand-in for container metadata), with a
    * per-frame fingerprint. The explode is the real plumbing — at
    * scale this is the row-multiplying stage in front of a frame
    * decoder, and it parallelizes per input row with no shuffle.
    */
  def frameSample(documents: DataFrame, maxFrames: Int = 8): DataFrame = {
    val media = attach(documents)
    media.filter(col("media_type") === "video")
      .select(col("doc_id"), length(col("payload")).cast("long").as("payload_len"))
      .withColumn("n_frames", (col("payload_len") % maxFrames + 1).cast("long"))
      .select(col("doc_id"), col("payload_len"), col("n_frames"),
        posexplode(sequence(lit(0L), col("n_frames") - 1)))
      .select(col("doc_id"), col("n_frames"),
        col("col").as("frame_idx"),
        (col("col") * expr("payload_len div n_frames")).as("frame_off"),
        substring(md5(concat(col("doc_id").cast("string"), lit(":"),
          col("col").cast("string"))), 1, 16).as("frame_fp"))
  }

  /** SCENE-CUT detection over sampled video frames — the shot
    * segmentation every video-curation pipeline runs before frame
    * dedup or captioning (a cut boundary is where a new caption
    * starts; frames within a shot are near-identical and one
    * representative suffices). Real decoders compare per-frame color
    * histograms; here the frame slices are REAL payload bytes (the
    * [[frameSample]] offsets applied to the actual binary, not a
    * synthetic fingerprint) and the per-frame signature is the mean
    * byte value in basis points — adjacent-frame mean deltas cross
    * `cutBp` at content discontinuities. The mean is exact-integer
    * (sum·10⁴ div (flen·255), truncating in the positive quadrant —
    * the DuckDB oracle replays the same sum through its hex
    * encoding), so both engines see identical deltas and the
    * threshold can never straddle a float.
    *
    * Shape: every frame of a video derives from ONE input row, so
    * the whole detector is a per-row projection — the frame means
    * build as an array inside the scan, deltas index the previous
    * element, and the cut count folds the delta array: ZERO
    * shuffles, output already per-doc (the first r14 draft exploded
    * frames and lagged over a doc_id window — a corpus exchange the
    * data never needed). Stateless, so the same projection gates a
    * live video stream unchanged. Single-frame videos stay in the
    * output with null deltas (the lm 'unscored' discipline —
    * dropping rows poisons downstream ratios).
    */
  def sceneCuts(documents: DataFrame, maxFrames: Int = 8,
                cutBp: Long = 150L): DataFrame = {
    val media = attach(documents).filter(col("media_type") === "video")
      .select(col("doc_id"), col("payload"),
        octet_length(col("payload")).cast("long").as("plen"))
      .filter(col("plen") >= 1)
      .withColumn("n_frames", (col("plen") % maxFrames + 1).cast("long"))
      .withColumn("flen", expr("plen div n_frames"))
      .filter(col("flen") >= 1)
    // every frame of a video derives from ONE row, so the whole
    // detector is a per-row projection: the frame means come from ONE
    // codegen'd pass over the raw bytes ([[graft.functions.HashOps
    // .frameMeans]] — the r14 HOF formulation materialized a
    // sequence(1, flen) Int array PER FRAME before folding, a
    // multi-million-element allocation per frame on real MB payloads,
    // with INT substring offsets that wrapped past ~1.2 GB; the
    // kernel indexes the byte array directly with no allocation and
    // no offset to wrap — a JVM payload is < 2³¹ bytes, so the long
    // sum·10⁴ is exact with no widening), deltas index the previous
    // element — no explode, no window, NO SHUFFLE anywhere; the
    // output is already per-doc
    media
      .withColumn("means", graft.functions.expressions.frame_means(
        col("payload"), col("n_frames")))
      // sequence(1, 0) DESCENDS in Spark (not empty) — a
      // single-frame video must take the explicit empty arm
      .withColumn("deltas", expr(
        "CASE WHEN n_frames < 2 THEN CAST(array() AS ARRAY<BIGINT>) " +
          "ELSE transform(sequence(1, n_frames - 1), " +
          "i -> abs(means[i] - means[i - 1])) END"))
      .select(col("doc_id"), col("n_frames"),
        expr(s"CAST(size(filter(deltas, d -> d >= $cutBp)) AS BIGINT)")
          .as("n_cuts"),
        expr("array_max(deltas)").as("max_delta_bp"),
        expr("CASE WHEN size(deltas) > 0 THEN " +
          "aggregate(deltas, 0L, (a, d) -> a + d) div size(deltas) END")
          .as("avg_delta_bp"))
  }

  /** Byte-shingle NEAR-dup over binary payloads: 8-byte windows at a
    * 4-byte stride over the hex encoding become the shingle set, then
    * the same inverted-index equi-join + Jaccard verify as the text
    * family — catches payloads that differ by a small patch (metadata
    * edit, re-encode header) which exact [[binaryDedup]] misses.
    * Shingling is a pure per-row map (windows never leave their scan
    * partition); only (doc_id, 16-hex-char shingle) pairs shuffle.
    * `docFilter` bounds the probe subset exactly as in
    * [[graft.dedup.Dedup.ngramJaccard]] (explicit, like that API —
    * no baked-in probe default); corpus-wide at scale rides MinHash
    * banding over the same windows. Payloads shorter than one full
    * 8-byte window (length(hx) < 16, including empty) are dropped —
    * a truncated/empty shingle would pair every tiny payload with
    * every other at jaccard 1.0, the byte twin of the text family's
    * len(toks) >= 3 dropout.
    */
  def binaryNearDup(documents: DataFrame, tau: Double,
                    docFilter: Column): DataFrame = {
    val hexed = attach(documents).filter(docFilter)
      .select(col("doc_id"), hex(col("payload")).as("hx"))
      .filter(length(col("hx")) >= 16)
    val sh = hexed.select(col("doc_id"),
      explode(array_distinct(expr(
        "transform(sequence(0, greatest(cast((length(hx) - 16) / 8 as int), 0))," +
          " i -> substring(hx, i*8 + 1, 16))"))).as("shingle"))
    graft.dedup.Dedup.shingleIntersections(sh)
      .select(col("doc_a"), col("doc_b"),
        round(col("common").cast("double") /
          (col("sz_a") + col("sz_b") - col("common")), 4).as("jaccard"))
      .filter(col("jaccard") >= tau)
  }

  /** Exact binary dedup: group identical payloads per media type by
    * a content hash of the bytes, electing the lowest doc_id keeper.
    * Only (type, 32-byte hash) pairs shuffle — payload bytes stay in
    * their scan partitions, which is what makes this viable when the
    * binary column is the bulk of 100 TB. (The hash is md5 over the
    * hex encoding: engine-portable, and collision-equivalent to
    * hashing the raw bytes.)
    */
  def binaryDedup(documents: DataFrame): DataFrame =
    attach(documents)
      .groupBy(col("media_type"), md5(hex(col("payload"))).as("payload_md5"))
      .agg(min("doc_id").as("keep_doc_id"),
        count(lit(1)).as("n_copies"),
        sum(length(col("payload"))).as("total_bytes"))

  /** Per-media-type byte-entropy audit over the BINARY payloads —
    * the garbage detector for opaque columns: a payload whose byte
    * distribution is near-uniform (entropy → 8 bits) is compressed,
    * encrypted, or corrupt; one near zero is padding or a stuck
    * producer. Text gets this from `text_entropy`; binary columns
    * need it more, because no downstream parser will ever LOOK at
    * the bytes to notice. The codegen'd [[graft.functions.
    * expressions.BinEntropy]] kernel scores each payload in the scan
    * (map-only — payload bytes never shuffle; only per-type partial
    * aggregates move), per-row entropies are 4dp-rounded BEFORE
    * aggregation (the emb_stats discipline — engine-portable
    * averages need engine-identical addends), and the high-entropy
    * flag compares the rounded value so it can never straddle a
    * float boundary differently per engine.
    */
  def entropyAudit(documents: DataFrame,
                   highBits: Double = 5.5): DataFrame = {
    val ent = round(graft.functions.expressions.bin_entropy(col("payload")), 4)
    attach(documents)
      .select(col("media_type"), ent.as("ent"),
        length(col("payload")).cast("long").as("len"))
      .groupBy("media_type")
      .agg(count(lit(1)).as("n_items"),
        sum("len").as("total_bytes"),
        round(avg("ent"), 4).as("avg_entropy"),
        round(min("ent"), 4).as("min_entropy"),
        round(max("ent"), 4).as("max_entropy"),
        sum(when(col("ent") > highBits, 1L).otherwise(0L)).as("n_high"))
  }

  /** Payload INTEGRITY audit — the corrupt-blob sweep a binary
    * column needs precisely because nothing downstream parses the
    * bytes until an accelerator fleet fails on them: per media type,
    * empty/null payload count, metadata-violation count (non-positive
    * dimensions), byte totals, and a COMMUTATIVE payload digest (the
    * [[graft.cdc.Changelog.stateDigest]] discipline over bytes: sum
    * of 60-bit md5 prefixes mod 2⁶²) — two replicas of a 100 TB
    * media table compare these per-type rows instead of shipping a
    * single payload byte. Map-only scan; only the per-type partials
    * shuffle.
    */
  def integrityAudit(documents: DataFrame): DataFrame =
    attach(documents)
      .select(col("media_type"),
        (col("payload").isNull || octet_length(col("payload")) === 0)
          .as("empty"),
        (col("width") <= 0 || col("height") <= 0).as("bad_meta"),
        octet_length(col("payload")).cast("long").as("nb"),
        conv(substring(md5(col("payload")), 1, 15), 16, 10)
          .cast("decimal(38,0)").as("h"))
      .groupBy("media_type")
      .agg(count(lit(1)).as("n_items"),
        sum(when(col("empty"), 1L).otherwise(0L)).as("n_empty"),
        sum(when(col("bad_meta"), 1L).otherwise(0L)).as("n_bad_meta"),
        sum("nb").as("total_bytes"),
        sum("h").as("hs"))
      .select(col("media_type"), col("n_items"), col("n_empty"),
        col("n_bad_meta"), col("total_bytes"),
        expr("CAST(hs % 4611686018427387904 AS BIGINT)").as("digest"))

  /** PERCEPTUAL near-dup pairs over binary payloads — the
    * STRUCTURAL twin of [[binaryNearDup]]'s content-shingle path (a
    * pHash-style brightness-layout signature: two payloads whose
    * byte n-grams differ everywhere still pair when their coarse
    * intensity profile matches — re-encoded/re-containered media,
    * the regime content shingles are blind to): each payload's 64
    * equal slices reduce to integer slice means through the ONE-pass
    * codegen'd [[graft.functions.HashOps.frameMeans]] kernel (no
    * allocation, bytes never leave the scan), bit i of the 64-bit
    * signature is `64·mean_i > Σ means` (strictly-above-average
    * slice — integer-exact, no division anywhere), and near-dups are
    * signature pairs within hamming `radius`. Candidate generation
    * is PIGEONHOLE-LOSSLESS banding — 4 bands of 16 bits; hamming ≤
    * radius < 4 forces at least one identical band, so the (band,
    * value) equi-join loses nothing (the [[graft.dedup.Dedup]]
    * simhash discipline pointed at bytes) — then exact
    * `bit_count(xor)` verification on the candidate pairs; never
    * all-pairs, and only (doc_id, 64-bit sig) rows ever shuffle.
    */
  def phashPairs(documents: DataFrame, radius: Int = 3): DataFrame =
    phashPairsOf(phashCandidates(documents), radius)

  /** [[phashPairs]] on an ALREADY-BUILT candidate frame — the
    * fit-once sharing seam: the pair query and the calibration
    * histogram read one materialized candidate stage instead of each
    * re-running signatures + banding (the knn-edge discipline). */
  def phashPairsOf(cands: DataFrame, radius: Int = 3): DataFrame = {
    require(radius >= 0 && radius < 4,
      s"radius ($radius) must stay below the band count (4) for lossless banding")
    cands.filter(col("hamming") <= radius)
      .select("doc_a", "doc_b", "sig_a", "sig_b", "hamming")
  }

  /** HAMMING CALIBRATION histogram for the perceptual signature —
    * [[phashPairs]]' measurement twin (the `dedup_simhash_hist`
    * discipline pointed at bytes): the exact hamming distribution
    * over the UNFILTERED banded candidates. The radius-3 default is
    * a convention; this is the measurement — near-dup mass low,
    * band-collision noise high, the valley between them is where the
    * radius belongs, and mass hugging the radius from below argues
    * the 16-bit bands are recruiting too loosely. Exactly the
    * candidate stage plus a ≤65-row aggregate.
    */
  def phashHammingHist(documents: DataFrame, radius: Int = 3): DataFrame =
    phashHistOf(phashCandidates(documents), radius)

  /** [[phashHammingHist]] on an already-built candidate frame. */
  def phashHistOf(cands: DataFrame, radius: Int = 3): DataFrame =
    cands.groupBy("hamming")
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("within_radius", col("hamming") <= radius)

  /** Shared candidate stage of [[phashPairs]] / [[phashHammingHist]]:
    * signatures → 4×16-bit banding → distinct colliding pairs with
    * their exact hamming, UNFILTERED. */
  private[graft] def phashCandidates(documents: DataFrame): DataFrame = {
    val slices = 64
    val sigs = attach(documents)
      .select(col("doc_id"), col("payload"))
      .filter(octet_length(col("payload")) >= slices)
      .select(col("doc_id"), graft.functions.expressions.frame_means(
        col("payload"), lit(slices.toLong)).as("means"))
      // bounded 64-element folds — no explode, no shuffle: the bit
      // test multiplies instead of dividing so both engines compare
      // exact integers
      .select(col("doc_id"),
        expr("aggregate(means, CAST(0 AS BIGINT), (a, x) -> a + x)")
          .as("msum"), col("means"))
      .select(col("doc_id"),
        expr(s"aggregate(zip_with(means, sequence(0, ${slices - 1}), " +
          s"(v, i) -> IF(v * $slices > msum, shiftleft(CAST(1 AS BIGINT), i), " +
          "CAST(0 AS BIGINT))), CAST(0 AS BIGINT), (a, x) -> a + x)").as("sig"))
    // 4 × 16-bit bands; shiftrightunsigned + an AND mask — `% 65536`
    // would go NEGATIVE on the unshifted b=0 band whenever bit 63 is
    // set (Spark % keeps the dividend's sign), silently losing every
    // cross-sign collision the unsigned oracle finds
    val bands = sigs
      .select(col("doc_id"), col("sig"), explode(expr("sequence(0, 3)")).as("b"))
      .withColumn("bv", expr("shiftrightunsigned(sig, b * 16) & 65535"))
    bands.as("x")
      .join(bands.as("y"), col("x.b") === col("y.b") &&
        col("x.bv") === col("y.bv") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.sig").as("sig_a"), col("y.sig").as("sig_b"))
      .distinct() // a pair may collide in several bands — emit once
      .withColumn("hamming", expr("CAST(bit_count(sig_a ^ sig_b) AS BIGINT)"))
  }

  /** Corpus BYTE-VALUE histogram per media type — the one-glance
    * distribution report for an opaque binary column (a spike at
    * 0x00 is padding, mass confined to 0x20–0x7E is text
    * masquerading as media, near-uniform mass corroborates the
    * [[entropyAudit]] compressed/encrypted verdict — and the
    * histogram says WHERE the mass sits, which the scalar entropy
    * cannot): per payload the 16 high-nibble counts come from ONE
    * codegen'd pass over the raw bytes
    * ([[graft.functions.HashOps.nibbleHist]] — no hex encoding, no
    * per-byte explode; bytes never leave the scan), the bounded
    * 16-element array explodes AFTER the kernel, and per-(type,
    * nibble) sums are map-side-combined — what shuffles is ≤ 16
    * longs per payload, collapsing to types × 16 rows. Share in
    * exact integer ppm (DECIMAL-widened — byte totals at 100 TB
    * exceed int64×10⁶), every nibble present for every type (a
    * zero count IS the report), window over the bounded types × 16
    * summary only.
    */
  def byteHistogram(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perType = attach(documents)
      .select(col("media_type"), posexplode(
        graft.functions.expressions.nibble_hist(col("payload")))
        .as(Seq("nibble", "cnt")))
      .groupBy(col("media_type"), col("nibble").cast("long").as("nibble"))
      .agg(sum("cnt").as("n_bytes"))
    val w = Window.partitionBy("media_type")
    perType
      .withColumn("tot", sum("n_bytes").over(w))
      .select(col("media_type"), col("nibble"), col("n_bytes"),
        expr("CASE WHEN tot > 0 THEN CAST(CAST(n_bytes AS DECIMAL(38,0)) " +
          "* 1000000 div tot AS BIGINT) END").as("share_ppm"))
  }
}
