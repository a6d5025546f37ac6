package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.multimodal.Multimodal

/** Oracle-checked entries for the multimodal plumbing: the fake codec
  * is deterministic arithmetic, so DuckDB can verify the ENTIRE path —
  * binary encoding, partition-batched codec calls, frame explosion —
  * value-for-value. */
object MultimodalQueries {

  /** The ordered (bin, threshold) cut ladder behind the media shape
    * signature: quantized histogram bin `b` cleared at threshold `t`.
    * The first 8 cuts are the oracle-pinned q140 signature (the
    * informative nibbles — 2 = space/punct, 3 = digits, 6/7 =
    * lowercase bands — at two thresholds each); wider dials append
    * finer thresholds over the same bins. Exact dupes have identical
    * histograms, so they agree on EVERY cut — the dupes-subset
    * invariant holds at any width (MultimodalSpec pins two widths). */
  private val sigCuts: Seq[(Int, Int)] =
    (for { b <- Seq(2, 3, 6, 7); t <- Seq(31, 63) } yield (b, t)) ++
      (for { b <- Seq(2, 3, 6, 7); t <- Seq(15, 47, 95, 127) } yield (b, t))

  /** Signature bits [from, from+nBits) of the cut ladder as a Long. */
  private def sigBitsCol(q8: Column, from: Int, nBits: Int): Column =
    sigCuts.slice(from, from + nBits).zipWithIndex.map { case ((b, t), k) =>
      when(element_at(q8, b + 1) > t, lit(1L << k)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Perceptual media near-dup pairs at signature width `sigBits` —
    * the pHash-style dedup pass a media corpus runs before training
    * (near-identical images re-encoded at different sizes). Width is
    * a REAL dial (mirroring annBucket's nBits): quantized feature
    * histograms bucket by the first `sigBits` ladder cuts, candidates
    * come from bucket EQUALITY (never all-pairs), and the join key is
    * BoundedPair-refined by a hash of the quantized vector itself, so
    * an oversize bucket sub-bands until membership fits the 512-row
    * budget — pair work ≤ ~n·budget/2 plus the irreducible true-pair
    * output (the fix for the measured 76× sf1 decade at the fixed
    * 8-bit dial). Why a VALUE hash is the right refinement family
    * here (unlike q23's extra hyperplanes): vec_quant8 is
    * scale-invariant and the confirm bar sits at cos ≥ 1−10⁻⁶, an
    * angle the int8 lattice cannot express between unequal vectors
    * of these norms — confirmed pairs have IDENTICAL q8 (measured: 0
    * unequal-q8 pairs among 52 630 confirmed at sf0.1, 497 at
    * sf0.01; finer threshold cuts were tried first and carried ~1
    * effective bit on the saturated histogram bins, leaving a 43k-row
    * sf1 bucket unsplit). Identical q8 ⇒ identical hash, so the
    * refinement is RECALL-EXACT for this gate while slicing a
    * templated mega-bucket uniformly across its 501 distinct values.
    * At sf ≤ 0.1 every bucket fits the budget and results are
    * byte-identical to the unguarded historical output. Candidates
    * confirm with an exact integer cosine² gate, cross-multiplied on
    * the SQUARE so it stays in Long (dot²·10⁶ ≥ 999998·‖a‖²·‖b‖² ⟺
    * cos² ≥ 0.999998 ⟺ cos ≥ 1−10⁻⁶; dot²·10⁶ tops 6.7·10¹⁶ — the
    * DECIMAL(38,0) formulation measured 1.8× slower per pair). The
    * bar sits at near-identity on purpose: letter-frequency
    * histograms of same-language text all clear cos 0.9999 (that bar
    * measured 8 302 confirmed pairs at sf0.01 — the OUTPUT went
    * quadratic), while 1−10⁻⁶ keeps exactly the re-encode families.
    * Norms ride the barriered row (O(n)), not the pair (O(pairs)). */
  def mediaNearDups(feats: DataFrame, sigBits: Int = 8): DataFrame = {
    require(sigBits >= 1 && sigBits <= sigCuts.length,
      s"sigBits must be in [1, ${sigCuts.length}], got $sigBits")
    val qemb = graft.ops.Barrier(feats
      .select(col("media_id"),
        graft.Functions.vec_quant8(col("features").cast("array<double>")).as("q8"))
      .withColumn("bucket", sigBitsCol(col("q8"), 0, sigBits))
      .withColumn("ref", pmod(xxhash64(col("q8")), lit(1L << graft.ops.BoundedPair.MaxBits)))
      .withColumn("nrm", graft.Functions.vec_dot_int(col("q8"), col("q8"))))
    // budget 512 ≥ the whole sf0.01 corpus: the media buckets are
    // MEGA-skewed (86% of rows share one bucket at every measured sf),
    // so unlike q23's near-uniform hyperplane buckets there is no
    // smaller budget with a regen-proof margin at oracle scale
    val r = graft.ops.BoundedPair.refined(qemb, "bucket", "ref", "pb",
      budget = 512L)
    val a = r.select(col("media_id").as("mx"), col("q8").as("qa"),
      col("pb"), col("nrm").as("na"))
    val b = r.select(col("media_id").as("my"), col("q8").as("qb"),
      col("pb"), col("nrm").as("nb"))
    a.join(b, Seq("pb")).filter(col("mx") < col("my"))
      .select(col("mx"), col("my"),
        graft.Functions.vec_dot_int(col("qa"), col("qb")).as("dot"),
        col("na"), col("nb"))
      .filter(col("dot") > 0 &&
        col("dot") * col("dot") * lit(1000000L) >= lit(999998L) * col("na") * col("nb"))
      .orderBy("mx", "my")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Feature extraction over binary media: 16-bin high-nibble byte
    // histogram per media row, exploded to (media_id, bin, n).
    "q27_mmfeat" -> ((s, d) => {
      val media = Multimodal.mediaFromDocuments(Tables.documents(s, d))
      Multimodal.extractFeatures(s, media)
        .select(col("media_id"), posexplode(col("features")).as(Seq("bin", "n")))
        .select(col("media_id"), col("bin").cast(LongType).as("bin"), col("n"))
        .orderBy("media_id", "bin")
    }),

    // Frame sampling over video rows: fixed 256-byte frames.
    "q28_frames" -> ((s, d) => {
      val media = Multimodal.mediaFromDocuments(Tables.documents(s, d))
      Multimodal.sampleFrames(s, media, frameSize = 256)
        .orderBy("media_id", "frame_id")
    }),

    // Perceptual media near-dup at the oracle-pinned 8-bit signature
    // width — see [[mediaNearDups]] for the full dial: width is a real
    // argument (4 bits → ~780 k bucket pairs at sf0.1 and 5.1 s;
    // 8 bits → ~50 k and ~1 s), and past the width the pair-budget
    // guard sub-bands oversize buckets on the finer ladder cuts.
    "q140_media_neardup" -> ((s, d) => {
      val media = Multimodal.mediaFromDocuments(Tables.documents(s, d))
      mediaNearDups(Multimodal.extractFeatures(s, media), sigBits = 8)
    }),

    // Multimodal → ANN composition: media similarity as a first-class
    // citizen of the integer-ANN stack, not a parallel track. The
    // codec's feature histogram (16 longs) is int8-quantized
    // (vec_quant8 — normalizes away media size), bucketed by a coarse
    // 4-bit shape signature (bins 2/4/6/7 = punct/upper/lower bands,
    // bit set iff the bin clears half of max), and ranked with q49's
    // exact integer kernel inside the query's bucket. Scale shape =
    // q49's: map-only encode, broadcast 1-row query, bucket gate
    // before any scoring, TakeOrderedAndProject.
    "q82_media_ann" -> ((s, d) => {
      val media = Multimodal.mediaFromDocuments(Tables.documents(s, d))
      val feats = Multimodal.extractFeatures(s, media)
      val bins = Seq(2, 4, 6, 7)
      val qemb = graft.ops.Barrier(feats
        .select(col("media_id"),
          graft.Functions.vec_quant8(col("features").cast("array<double>")).as("q8"))
        .withColumn("bucket", bins.zipWithIndex.map { case (b, k) =>
          when(element_at(col("q8"), b + 1) > 63, lit(1L << k)).otherwise(lit(0L))
        }.reduce(_ + _)))
      val q = qemb.filter(col("media_id") === 0)
        .select(col("q8").as("qq"), col("bucket").as("qbucket"))
      qemb.filter(col("media_id") =!= 0)
        .crossJoin(broadcast(q))
        .filter(col("bucket") === col("qbucket"))
        .select(col("media_id"),
          graft.Functions.vec_dot_int(col("q8"), col("qq")).as("qsim"))
        .orderBy(col("qsim").desc, col("media_id"))
        .limit(10)
    }),

    // Modality manifest — the dataset-card rollup for the media
    // track: per kind, row count, payload bytes, frame budget (what
    // the q28 sampler would emit), and the duration ceiling. One
    // partial-agg'd kinds-sized rollup over the media table; the
    // frame count is arithmetic on lengths, not a frames explode.
    "q161_media_manifest" -> ((s, d) => {
      val media = Multimodal.mediaFromDocuments(Tables.documents(s, d))
      media.groupBy("kind")
        .agg(count(lit(1)).as("n_media"),
          sum(length(col("bytes"))).as("bytes_total"),
          sum(expr("(length(bytes) + 255) div 256")).as("frames_total"),
          max(col("meta.duration_ms")).as("max_duration_ms"))
        .orderBy("kind")
    }),

    // Frame-level exact dedup — the video-dedup primitive (identical
    // frames across different videos ⇒ shared content): md5 over each
    // sampled frame's byte slice, grouped; only hashes seen in >1
    // MEDIA survive. The shuffle carries (16-byte hash, media_id)
    // pairs — q15's discipline at frame granularity.
    "q162_frame_dedup" -> ((s, d) => {
      val media = Multimodal.mediaFromDocuments(Tables.documents(s, d))
      val frames = Multimodal.sampleFrames(s, media, frameSize = 256)
      frames.join(media.select(col("media_id"), col("bytes")), Seq("media_id"))
        .select(col("media_id"),
          md5(expr("substring(bytes, off + 1, len)")).as("h"))
        .groupBy("h")
        .agg(countDistinct(col("media_id")).as("n_media"),
          count(lit(1)).as("n_frames"))
        .filter(col("n_media") > 1)
        .orderBy("h")
    }),

    // Scene-change detection — the keyframe-selection primitive a
    // video training pipeline runs before sampling frames for
    // captioning/embedding (consecutive near-identical frames are
    // redundant; scene boundaries are where content changes): per
    // 64-byte frame a 16-bin codec histogram (sampled AND featurized
    // in ONE partition-local codec pass — `frameFeatures`, no join
    // back to the payload), consecutive-frame L1 distance via a
    // media-partitioned lag (per-video frame counts are bounded, the
    // window never concentrates), boundary iff L1 > 24. Single-frame
    // videos have no consecutive pair and drop out — both engines
    // agree on that row set. Exact integers end-to-end; the rollup
    // partial-aggregates per media. The 16-element zip_with is a
    // fixed-width HOF over a COLUMN (nothing re-inlines — the q186
    // lesson applied). | reference scope: training-data extension
    "q195_scenes" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val media = Multimodal.mediaFromDocuments(Tables.documents(s, d))
      val w = Window.partitionBy("media_id").orderBy("frame_id")
      Multimodal.frameFeatures(s, media, frameSize = 64)
        .withColumn("prev", lag(col("features"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("media_id"),
          expr("""aggregate(zip_with(features, prev, (a, b) -> abs(a - b)),
                            0L, (acc, x) -> acc + x)""").as("l1"))
        .groupBy("media_id")
        .agg((count(lit(1)) + 1).as("n_frames"),
          (count(when(col("l1") > 24, 1)) + 1).as("n_scenes"),
          max(col("l1")).as("max_l1"))
        .orderBy("media_id")
    }),

    // VAD-style audio segmentation — the silence-removal pre-pass an
    // audio corpus runs before transcription/training: 64-byte
    // windows, per-window energy Σ byte² (exact Long), voiced iff
    // energy ≥ the corpus-median 628 000 bar, segments = maximal
    // voiced runs. One partition-local pass over the payload (the
    // q28 codec discipline — bytes never leave the map task; output
    // is 4 longs per audio row). Real deployments swap byte² energy
    // for PCM frame energy behind the same `energySegments` seam.
    "q242_audio_vad" -> ((s, d) => {
      val media = Multimodal.mediaFromDocuments(Tables.documents(s, d))
      Multimodal.energySegments(s, media).orderBy("media_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    // windowed ascii² energies replayed with nested indexed lambdas;
    // run starts counted with the (x, i) list_filter convention
    "q242_audio_vad" ->
      """WITH a AS (SELECT doc_id AS media_id, text,
                           length(text) // 64 AS nw
                    FROM documents WHERE doc_id % 3 = 1),
         v AS (SELECT media_id, nw,
                      list_transform(range(0, nw), j ->
                        list_aggregate(list_transform(range(1, 65), i ->
                          CAST(ascii(text[CAST(j*64+i AS BIGINT):CAST(j*64+i AS BIGINT)]) AS BIGINT)
                            * ascii(text[CAST(j*64+i AS BIGINT):CAST(j*64+i AS BIGINT)])), 'sum')
                          >= 628000) vc
               FROM a)
         SELECT media_id, CAST(nw AS BIGINT) AS n_windows,
                CAST(coalesce(len(list_filter(vc, x -> x)), 0) AS BIGINT) AS n_voiced,
                CAST(coalesce(len(list_filter(vc, (x, i) -> x AND (i = 1 OR NOT vc[i-1]))), 0) AS BIGINT) AS n_segments
         FROM v ORDER BY media_id""",
    "q27_mmfeat" ->
      """SELECT doc_id AS media_id, b AS bin,
                CAST(len(list_filter(list_transform(range(1, length(text)+1), i -> ascii(text[i:i]) // 16),
                                     x -> x = b)) AS BIGINT) AS n
         FROM documents, unnest(range(0, 16)) t(b)
         ORDER BY media_id, bin""",
    "q28_frames" ->
      """SELECT doc_id AS media_id, f AS frame_id,
                f * 256 AS off,
                least(256, length(text) - f * 256) AS len
         FROM documents,
              unnest(range(0, CAST(ceil(length(text) / 256.0) AS BIGINT))) t(f)
         WHERE doc_id % 3 = 2
         ORDER BY media_id, frame_id""",
    // q82's quantize+bucket CTEs self-joined on the signature; the
    // cross-multiplied integer cosine² gate confirms.
    "q140_media_neardup" ->
      """WITH f AS (
           SELECT doc_id AS media_id,
                  list_transform(range(0, 16), b ->
                    CAST(len(list_filter(list_transform(range(1, length(text)+1), i -> ascii(text[i:i]) // 16),
                                         x -> x = b)) AS BIGINT)) feats
           FROM documents),
         m AS (
           SELECT media_id, feats,
                  list_max(list_transform(feats, x -> abs(CAST(x AS DOUBLE)))) maxabs
           FROM f),
         v AS (
           SELECT media_id,
                  CASE WHEN maxabs > 0
                       THEN list_transform(feats, x -> greatest(CAST(-127 AS BIGINT),
                              least(CAST(127 AS BIGINT),
                                CAST(floor(CAST(x AS DOUBLE) * 127 / maxabs) AS BIGINT))))
                       ELSE list_transform(feats, x -> CAST(0 AS BIGINT)) END q8
           FROM m),
         b AS (
           SELECT media_id, q8,
                  CAST((CASE WHEN q8[3] > 31 THEN 1 ELSE 0 END)
                     + (CASE WHEN q8[3] > 63 THEN 2 ELSE 0 END)
                     + (CASE WHEN q8[4] > 31 THEN 4 ELSE 0 END)
                     + (CASE WHEN q8[4] > 63 THEN 8 ELSE 0 END)
                     + (CASE WHEN q8[7] > 31 THEN 16 ELSE 0 END)
                     + (CASE WHEN q8[7] > 63 THEN 32 ELSE 0 END)
                     + (CASE WHEN q8[8] > 31 THEN 64 ELSE 0 END)
                     + (CASE WHEN q8[8] > 63 THEN 128 ELSE 0 END) AS BIGINT) bucket
           FROM v),
         p AS (
           SELECT a.media_id mx, bb.media_id my,
                  CAST(list_sum(list_transform(range(1, 17), i -> a.q8[i] * bb.q8[i])) AS BIGINT) dot,
                  CAST(list_sum(list_transform(range(1, 17), i -> a.q8[i] * a.q8[i])) AS BIGINT) na,
                  CAST(list_sum(list_transform(range(1, 17), i -> bb.q8[i] * bb.q8[i])) AS BIGINT) nb
           FROM b a JOIN b bb ON a.bucket = bb.bucket AND a.media_id < bb.media_id)
         SELECT mx, my, dot, na, nb FROM p
         WHERE dot > 0 AND dot * dot * 1000000 >= 999998 * na * nb
         ORDER BY mx, my""",
    "q82_media_ann" ->
      """WITH f AS (
           SELECT doc_id AS media_id,
                  list_transform(range(0, 16), b ->
                    CAST(len(list_filter(list_transform(range(1, length(text)+1), i -> ascii(text[i:i]) // 16),
                                         x -> x = b)) AS BIGINT)) feats
           FROM documents),
         m AS (
           SELECT media_id, feats,
                  list_max(list_transform(feats, x -> abs(CAST(x AS DOUBLE)))) maxabs
           FROM f),
         v AS (
           SELECT media_id,
                  CASE WHEN maxabs > 0
                       THEN list_transform(feats, x -> greatest(CAST(-127 AS BIGINT),
                              least(CAST(127 AS BIGINT),
                                CAST(floor(CAST(x AS DOUBLE) * 127 / maxabs) AS BIGINT))))
                       ELSE list_transform(feats, x -> CAST(0 AS BIGINT)) END q8
           FROM m),
         b AS (
           SELECT media_id, q8,
                  CAST((CASE WHEN q8[3] > 63 THEN 1 ELSE 0 END)
                     + (CASE WHEN q8[5] > 63 THEN 2 ELSE 0 END)
                     + (CASE WHEN q8[7] > 63 THEN 4 ELSE 0 END)
                     + (CASE WHEN q8[8] > 63 THEN 8 ELSE 0 END) AS BIGINT) bucket
           FROM v),
         q AS (SELECT q8 qq, bucket qbucket FROM b WHERE media_id = 0)
         SELECT b.media_id,
                CAST(list_sum(list_transform(range(1, 17), i -> b.q8[i] * qq[i])) AS BIGINT) AS qsim
         FROM b, q WHERE b.media_id <> 0 AND b.bucket = qbucket
         ORDER BY qsim DESC, b.media_id LIMIT 10""",
    // kind from doc_id mod 3; payload = the ASCII text bytes, so
    // length(text) IS the byte length (pinned by the q28 oracle too).
    "q161_media_manifest" ->
      """SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                     WHEN doc_id % 3 = 1 THEN 'audio'
                     ELSE 'video' END AS kind,
                count(*) AS n_media,
                CAST(sum(length(text)) AS BIGINT) AS bytes_total,
                CAST(sum((length(text) + 255) // 256) AS BIGINT) AS frames_total,
                CAST(max(n_chars * 10) AS BIGINT) AS max_duration_ms
         FROM documents GROUP BY 1 ORDER BY kind""",
    // the q28 frame grid; md5 over each frame's character slice
    // (ASCII corpus: char slice = byte slice), cross-media hashes.
    "q162_frame_dedup" ->
      """WITH f AS (
           SELECT doc_id AS media_id,
                  md5(substr(text, CAST(f * 256 + 1 AS BIGINT),
                             least(256, length(text) - f * 256))) h
           FROM documents,
                unnest(range(0, CAST(ceil(length(text) / 256.0) AS BIGINT))) t(f)
           WHERE doc_id % 3 = 2)
         SELECT h, count(DISTINCT media_id) AS n_media, count(*) AS n_frames
         FROM f GROUP BY h HAVING count(DISTINCT media_id) > 1
         ORDER BY h""",
    // per-64-byte-frame high-nibble histograms; consecutive-frame L1;
    // boundary iff L1 > 24; single-frame videos drop (no pair).
    "q195_scenes" ->
      """WITH fr AS (
           SELECT doc_id AS media_id, f AS frame_id,
                  substr(text, CAST(f*64+1 AS BIGINT),
                         CAST(least(64, length(text) - f*64) AS BIGINT)) AS seg
           FROM documents,
                unnest(range(0, CAST(ceil(length(text)/64.0) AS BIGINT))) t(f)
           WHERE doc_id % 3 = 2),
         h AS (
           SELECT media_id, frame_id,
                  list_transform(range(0,16), b ->
                    CAST(len(list_filter(list_transform(range(1, length(seg)+1),
                                                        i -> ascii(seg[i:i]) // 16),
                                         x -> x = b)) AS BIGINT)) feats
           FROM fr),
         d AS (SELECT media_id, frame_id, feats,
                      lag(feats) OVER (PARTITION BY media_id ORDER BY frame_id) prev
               FROM h),
         l AS (SELECT media_id,
                      CAST(list_sum(list_transform(range(1,17),
                                                   i -> abs(feats[i] - prev[i]))) AS BIGINT) l1
               FROM d WHERE prev IS NOT NULL)
         SELECT media_id, CAST(count(*)+1 AS BIGINT) n_frames,
                CAST(1 + count(CASE WHEN l1 > 24 THEN 1 END) AS BIGINT) n_scenes,
                CAST(max(l1) AS BIGINT) max_l1
         FROM l GROUP BY 1 ORDER BY media_id"""
  )
}
