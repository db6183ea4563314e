package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing: media payloads travel as opaque `binary`
  * columns with typed metadata; decode/feature-extraction runs per
  * partition behind a pluggable decoder.
  *
  * No image/audio codecs exist in this environment, so `StubDecoder` is a
  * clearly-marked deterministic FAKE — it derives plausible dimensions from
  * the payload bytes. The Spark-side plumbing is real and tested: schema,
  * binary column handling, typed Dataset batch shape, per-partition decode
  * (the Scala analogue of a pandas-batch UDF — the decoder is invoked once
  * per row inside one partition iterator, so a native library would be
  * loaded once per task, not once per row).
  *
  * The synthetic corpus has no media files, so the document text's UTF-8
  * bytes stand in for the payload (an ASCII-safe choice the DuckDB oracle
  * can reproduce with string functions).
  */
object Multimodal {

  /** One decoded media record (the "feature extraction" output schema). */
  case class MediaFeatures(doc_id: Long, byte_len: Int, width: Int,
      height: Int, channels: Int, content_md5: String)

  /** Per-payload decoder contract; real deployments plug libjpeg/ffmpeg
    * bindings here.
    */
  trait MediaDecoder extends Serializable {
    /** @return (width, height, channels) */
    def decode(payload: Array[Byte]): (Int, Int, Int)
  }

  /** STUB: deterministic fake decode — *not* a real codec. Dimensions are
    * derived from payload length and first byte so tests are reproducible.
    */
  object StubDecoder extends MediaDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Int) = {
      val len = payload.length
      val head = if (len > 0) payload(0) & 0xff else 0
      ((len * 7 + 13) % 640 + 1, (len * 3 + head) % 480 + 1, 3)
    }
  }

  /** Typed per-partition decode: the escape hatch the brief sanctions for
    * binary decode (everything else in this library stays declarative).
    */
  def decodeFeatures(spark: SparkSession, payloads: DataFrame,
      decoder: MediaDecoder = StubDecoder): Dataset[MediaFeatures] = {
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          val (w, h, c) = decoder.decode(bytes)
          val digest = md.digest(bytes).map("%02x".format(_)).mkString
          MediaFeatures(id, bytes.length, w, h, c, digest)
        }
      }
  }

  /** Documents with a binary payload column attached. Repartitioned by
    * doc_id so payload hashing parallelizes beyond the input split count
    * (media corpora are few-large-files; decode must not inherit that).
    */
  def withPayload(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text").cast("binary").as("payload"))
      .transform(graft.sources.Tables.cpuPartition(_, col("doc_id")))

  /** media_frames: deterministic stub frame sampling — the video-shaped
    * batch plan (one row per sampled frame, fanned out with explode; a
    * real pipeline would decode keyframes per partition instead of
    * hashing). Frame count derives from the payload, frame ids are
    * md5-chained so any engine reproduces them.
    */
  def mediaFrames(spark: SparkSession, dir: String): DataFrame = {
    val nFrames = (pmod(length(col("payload")), lit(7)) + 1).cast("int")
    withPayload(spark, dir)
      .select(col("doc_id"), nFrames.as("nf"))
      .select(col("doc_id"), col("nf"),
        explode(sequence(lit(0), col("nf") - 1)).as("frame_idx"))
      .select(col("doc_id"), col("nf").as("n_frames"), col("frame_idx"),
        md5(concat(md5(col("doc_id").cast("string")), lit("#"),
          col("frame_idx").cast("string"))).as("frame_md5"))
  }

  /** Aspect-preserving fit of (w, h) into a bounding box — the resize
    * arithmetic a real decoder would apply, kept integral and
    * deterministic (never upscales).
    */
  def fitWithin(w: Int, h: Int, maxW: Int, maxH: Int): (Int, Int) = {
    require(w > 0 && h > 0 && maxW > 0 && maxH > 0)
    val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
    (math.max(1, math.floor(w * scale).toInt),
      math.max(1, math.floor(h * scale).toInt))
  }

  /** multimodal_meta: typed metadata over the binary column — byte length,
    * magic bytes, content hash, and the stub-decoded dimensions, all as a
    * declarative plan (the column mirror of StubDecoder's arithmetic).
    */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    val len = length(col("payload"))
    val head = when(len > 0,
      conv(lower(hex(expr("substring(payload, 1, 1)"))), 16, 10).cast("int"))
      .otherwise(0)
    withPayload(spark, dir)
      .select(col("doc_id"), col("source"),
        len.cast("int").as("byte_len"),
        lower(hex(expr("substring(payload, 1, 4)"))).as("magic"),
        md5(col("payload")).as("content_md5"),
        (pmod(len * 7 + 13, lit(640)) + 1).cast("int").as("width"),
        (pmod(len * 3 + head, lit(480)) + 1).cast("int").as("height"),
        lit(3).as("channels"))
  }

  /** media_dedup: byte-identical asset dedup — the binary-column twin
    * of Dedup.dedupExact. Media payloads dedup by RAW content hash (no
    * normalization exists for opaque bytes; a re-encoded image is a
    * DIFFERENT asset — near-dup for media means perceptual hashing,
    * which needs the codec this environment stubs). canonical = min
    * doc_id per (md5, byte_len); the length rides the key as the
    * standard second factor against hash collisions at corpus scale.
    *
    * Scale shape: one scan, one hash, one window over the content-hash
    * partitions (dup groups) — dedupExact's plan on the payload column.
    */
  def mediaDedup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("content_md5"), col("byte_len"))
    withPayload(spark, dir)
      .select(col("doc_id"), md5(col("payload")).as("content_md5"),
        length(col("payload")).cast("long").as("byte_len"))
      .withColumn("canonical", min(col("doc_id")).over(w))
      .withColumn("n_copies", count(lit(1)).over(w))
      .select(col("doc_id"), col("content_md5"), col("byte_len"),
        col("canonical"), col("n_copies"),
        (col("doc_id") =!= col("canonical")).as("is_dup"))
      .orderBy(col("doc_id"))
  }

  /** frame_dedup chunk width in bytes. 64 keeps the stub readable; a
    * real pipeline uses 4-64 KiB chunks (the fixed-size baseline of
    * the CDC family). Single-sourced into the oracle SQL.
    */
  val FrameChunkBytes = 64

  /** frame_dedup: fixed-size binary chunk dedup across assets — every
    * payload splits into [[FrameChunkBytes]]-byte windows (the stub
    * for decoded keyframes), and chunks whose bytes recur in ≥ 2
    * DISTINCT assets surface with their multiplicity. [[mediaDedup]]
    * catches byte-identical WHOLE assets; this catches PARTIAL overlap
    * (a video re-encoded with a new intro shares every interior chunk
    * — the span_hotspots shape on binary payloads, and the fixed-size
    * baseline the content-defined-chunking literature improves on).
    *
    * Scale shape: one explode bounded by payload size / chunk width
    * (generator inputs are scan attributes), a (chunk, doc) partial
    * agg, then the distinct-asset rollup — the two-level distinct rule,
    * never count(distinct) over raw chunk rows.
    */
  def frameDedup(spark: SparkSession, dir: String): DataFrame = {
    val w = FrameChunkBytes
    // `div`, not `/`: Column / is ALWAYS double division in Spark
    val nChunks = expr(s"(length(payload) + ${w - 1}) div $w").cast("int")
    val perDoc = withPayload(spark, dir)
      .select(col("doc_id"), col("payload"), nChunks.as("nc"))
      .select(col("doc_id"), col("payload"),
        explode(sequence(lit(0), col("nc") - 1)).as("k"))
      .select(col("doc_id"),
        md5(expr(s"substring(payload, k * $w + 1, $w)")).as("chunk_md5"))
      .groupBy(col("chunk_md5"), col("doc_id"))
      .agg(count(lit(1)).as("c"))
    perDoc.groupBy(col("chunk_md5"))
      .agg(count(lit(1)).as("n_assets"), sum(col("c")).as("n_copies"),
        min(col("doc_id")).as("canonical"))
      .filter(col("n_assets") >= 2)
      .orderBy(col("chunk_md5"))
  }

  /** cdc_dedup rolling-window width in bytes (the hash the boundary
    * test reads) and the boundary modulus: a position ends a chunk when
    * its window hash ≡ 0 (mod [[CdcModulus]]), so expected chunk length
    * ≈ [[CdcModulus]] bytes. Single-sourced into the oracle SQL.
    */
  val CdcWindowBytes = 8
  val CdcModulus = 32

  /** cdc_dedup: CONTENT-DEFINED chunking dedup — the upgrade of
    * [[frameDedup]]'s fixed-width baseline. Fixed-width chunking is
    * byte-shift-fragile: prepend ONE byte to a payload and every
    * 64-byte window slides, so no interior chunk of the shifted copy
    * matches the original (the well-known boundary-shift problem the
    * CDC literature — LBFS/Rabin, Gear/FastCDC — exists to solve).
    * Here a chunk boundary is declared wherever the hash of the LAST
    * [[CdcWindowBytes]] bytes satisfies h mod [[CdcModulus]] = 0:
    * boundaries depend only on local CONTENT, so after a shift the
    * cut points realign within one window width and every interior
    * chunk is recovered (CdcDedupSpec plants exactly that byte-shifted
    * duplicate and proves frame_dedup misses it while cdc_dedup finds
    * it). Output is frameDedup's contract: chunks recurring in ≥ 2
    * distinct assets, with multiplicity and canonical owner.
    *
    * The window hash is the first 8 md5 hex digits of the window bytes
    * — portable to the oracle bit-for-bit. A production build replaces
    * it with a Gear table lookup (one add+shift per byte) behind a
    * native Expression; the BOUNDARY RULE and everything downstream
    * are unchanged, which is what the parity gate pins.
    *
    * Plan shape: the boundary scan is a higher-order `filter` over the
    * position array — ONE array evaluation per row (never a per-byte
    * row explode), O(payload) md5 probes inside the lambda reading the
    * materialized payload attribute. The (payload, ends) frame then
    * localCheckpoints BEFORE the chunk explode so the generator and
    * the chunk-hash projection read attributes, not a re-evaluated
    * boundary chain (the chunk_docs Generate rule). After the explode:
    * one md5 per chunk and frameDedup's two-level distinct rollup.
    */
  def cdcDedup(spark: SparkSession, dir: String): DataFrame =
    cdcDedupOf(withPayload(spark, dir))

  /** Frame-shaped twin over any (doc_id, payload) frame — what the
    * spec's planted-duplicate corpus runs through.
    */
  private[graft] def cdcDedupOf(payloads: DataFrame): DataFrame = {
    val wb = CdcWindowBytes
    val boundary = (i: Column) => {
      val h = conv(substring(md5(col("payload").substr(i - lit(wb - 1),
        lit(wb))), 1, 8), 16, 10).cast("long")
      pmod(h, lit(CdcModulus.toLong)) === lit(0L)
    }
    val ends = array_distinct(concat(
      when(col("n") >= wb,
        filter(sequence(lit(wb), col("n")), boundary))
        .otherwise(expr("array()").cast("array<int>")),
      array(col("n"))))
    val chunks = payloads
      .select(col("doc_id"), col("payload"),
        length(col("payload")).cast("int").as("n"))
      .filter(col("n") >= 1)
      .select(col("doc_id"), col("payload"), ends.as("ends"))
      .localCheckpoint(false)
      .select(col("doc_id"), col("payload"), col("ends"),
        posexplode(col("ends")).as(Seq("k", "e")))
      .select(col("doc_id"), col("e"),
        // previous end (0 for the first chunk): element_at is 1-based,
        // so index k IS the previous element; k=0 guarded explicitly
        // (Spark rejects array index 0)
        when(col("k") === 0, lit(0))
          .otherwise(element_at(col("ends"), col("k"))).as("pe"),
        col("payload"))
      .select(col("doc_id"),
        md5(col("payload").substr(col("pe") + 1, col("e") - col("pe")))
          .as("chunk_md5"))
      .groupBy(col("chunk_md5"), col("doc_id"))
      .agg(count(lit(1)).as("c"))
    chunks.groupBy(col("chunk_md5"))
      .agg(count(lit(1)).as("n_assets"), sum(col("c")).as("n_copies"),
        min(col("doc_id")).as("canonical"))
      .filter(col("n_assets") >= 2)
      .orderBy(col("chunk_md5"))
  }

  /** phash_dedup Hamming radius (the dedup_simhash convention: 4
    * 16-bit bands give GUARANTEED recall to distance 3 and LSH-grade
    * recall beyond; pairs are verified by exact Hamming afterwards).
    */
  val PhashMaxHamming = 8

  /** phash_dedup: PERCEPTUAL near-dup for media assets — the average
    * hash (aHash) family: sample a fixed 8×8 = 64-cell grid from the
    * decoded image, threshold each cell against the grid mean, compare
    * 64-bit signatures by Hamming distance. This is the near-dup story
    * [[mediaDedup]]'s doc defers ("near-dup for media means perceptual
    * hashing"): a re-encode/brightness-shift changes every byte (so
    * content-md5 misses it) but barely moves cells relative to their
    * OWN mean — aHash is invariant to monotone global shifts by
    * construction (CdcDedupSpec's analogue here: PhashSpec plants a
    * +1-brightness copy).
    *
    * The DECODE is the stub (no codecs in this environment): cell k
    * samples the payload byte at position ⌊k·len/64⌋+1 — the real
    * pipeline swaps in mean-pooled grayscale cells behind the same
    * 64-cell contract; EVERYTHING downstream (threshold, packing,
    * banding, verify) is the production plan. The threshold is exact
    * integer arithmetic: bit_k = (p_k·64 > Σp) — never a float mean.
    *
    * Signature travels as two 32-bit halves in longs (the BQ-codes
    * convention — a 2^63 bit literal overflows the oracle's BIGINT
    * shift). Candidates: dedup_simhash's 4×16-bit band join with the
    * shared hot-bucket cap ([[Dedup.bandCandidates]]); pairs verified
    * by exact popcount ≤ [[PhashMaxHamming]].
    *
    * Scale shape: the signature is one map pass (64 static byte
    * probes, no explode); banding explodes ×4; the band join is
    * bucket-capped; verify joins signatures back by id. Linear in the
    * corpus with bounded fan-out — the simhash plan on binary assets.
    */
  def phashDedup(spark: SparkSession, dir: String): DataFrame = {
    val base = withPayload(spark, dir)
      .select(col("doc_id"), col("payload"),
        length(col("payload")).cast("long").as("n"))
      .filter(col("n") >= 1)
    def px(k: Int): Column =
      conv(hex(expr(s"substring(payload, ($k * n) div 64 + 1, 1)")),
        16, 10).cast("long")
    val pixels = (0 until 64).map(px)
    val sumPix = pixels.reduce(_ + _)
    def half(from: Int): Column =
      (from until from + 32).map { k =>
        when(pixels(k) * 64 > col("s"), lit(1L << (31 - (k - from))))
          .otherwise(lit(0L))
      }.reduce(_ + _)
    val sigs = base
      .withColumn("s", sumPix)
      .select(col("doc_id"), half(0).as("h1"), half(32).as("h2"))
      .localCheckpoint(false) // feeds the band explode and both verify sides
    val bandKeys = array(
      shiftright(col("h1"), 16).bitwiseAND(lit(0xFFFFL)),
      col("h1").bitwiseAND(lit(0xFFFFL)),
      shiftright(col("h2"), 16).bitwiseAND(lit(0xFFFFL)),
      col("h2").bitwiseAND(lit(0xFFFFL)))
    val banded = sigs
      .select(col("doc_id"), posexplode(bandKeys).as(Seq("band", "key")))
    val cand = Dedup.bandCandidates(banded)
    val ga = sigs.select(col("doc_id").as("id_a"),
      col("h1").as("a1"), col("h2").as("a2"))
    val gb = sigs.select(col("doc_id").as("id_b"),
      col("h1").as("b1"), col("h2").as("b2"))
    cand.join(ga.hint("merge"), "id_a").join(gb.hint("merge"), "id_b")
      .select(col("id_a"), col("id_b"),
        (bit_count(col("a1").bitwiseXOR(col("b1"))) +
          bit_count(col("a2").bitwiseXOR(col("b2")))).cast("int")
          .as("hamming"))
      .filter(col("hamming") <= PhashMaxHamming)
  }

  /** media_shard export geometry: shard count (grows with the corpus;
    * 4 here), volume byte budget, and the shuffle seed (independent of
    * the text-export seeds). Single-sourced into the oracle SQL.
    */
  val MediaShardSeed = "graft-media"
  val MediaShards = 4
  val MediaVolBytes = 65536L

  /** media_shard: the WebDataset-style EXPORT LAYOUT for binary assets —
    * every payload draws a seeded 60-bit hash key (one fixed
    * pseudo-random permutation, the shuffle_assign primitive), lands in
    * `shard = hkey mod |shards|`, and gets a running BYTE OFFSET within
    * its shard's hash order plus the offset-addressed volume index
    * (`byte_offset div volume_bytes` — the streamed-tar convention:
    * readers address members by offset, so a member may straddle the
    * volume boundary exactly as pack_sequences' bins do for tokens).
    * This is the manifest a media training job shuffles and streams by.
    *
    * Scale shape: one shuffle on shard, within-shard window sum — the
    * pack_sequences plan on bytes instead of tokens; no payload bytes
    * move (the manifest carries lengths only; the actual tar write
    * streams per shard partition).
    */
  def mediaShard(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hkey = conv(substring(md5(concat(col("doc_id").cast("string"),
      lit(":" + MediaShardSeed))), 1, 15), 16, 10).cast("long")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("hkey"), col("doc_id"))
    withPayload(spark, dir)
      .select(col("doc_id"), length(col("payload")).cast("long")
        .as("byte_len"))
      .withColumn("hkey", hkey)
      .withColumn("shard",
        pmod(col("hkey"), lit(MediaShards.toLong)).cast("int"))
      .withColumn("byte_offset",
        sum(col("byte_len")).over(w) - col("byte_len"))
      .select(col("doc_id"), col("byte_len"), col("shard"),
        expr(s"(byte_offset div $MediaVolBytes)").cast("int").as("volume"),
        col("byte_offset"))
  }
}
