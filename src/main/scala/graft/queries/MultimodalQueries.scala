package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.multimodal.Multimodal

/** Oracle-checked entries for the multimodal plumbing: the fake codec
  * is deterministic arithmetic, so DuckDB can verify the ENTIRE path —
  * binary encoding, partition-batched codec calls, frame explosion —
  * value-for-value. */
object MultimodalQueries {

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
    })
  )

  val oracleSql: Map[String, String] = Map(
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
         ORDER BY media_id, frame_id"""
  )
}
