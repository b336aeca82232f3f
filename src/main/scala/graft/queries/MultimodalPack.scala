package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables.table
import graft.multimodal.Multimodal

/** Multimodal binary-column plumbing. The harness has no binary tables, so
  * document text bytes stand in for media payloads: the binary hygiene
  * (byte length, content digest) is oracle-checked; the stub decode path
  * (mapPartitions batch transform) runs as a rows-only query and is
  * golden-tested in MultimodalSpec.
  */
object MultimodalPack extends QueryPack {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary payload hygiene: byte length + SHA-256 digest survive the
    // string→binary boundary identically on both engines.
    "mm_binary_meta" -> ((s, dir) => {
      table(s, dir, "documents")
        .withColumn("bytes", encode(col("text"), "UTF-8"))
        .select(col("doc_id"), length(col("bytes")).as("byte_len"),
          sha2(col("bytes"), 256).as("sha"))
        .orderBy("doc_id")
    }),

    // Stub decode through the partition-local batch transform (real
    // plumbing, fake codec) — rows-only.
    "mm_decode_stub" -> ((s, dir) => {
      val media = Multimodal.fromText(table(s, dir, "documents"),
        "doc_id", "text", kind = "image")
      Multimodal.decode(media).toDF()
        .select(col("media_id"), col("byteLen"), col("width"), col("height"),
          col("channels"))
        .orderBy("media_id")
    }))

  def oracles: Map[String, String] = Map(
    "mm_binary_meta" ->
      """SELECT doc_id, OCTET_LENGTH(ENCODE(text)) AS byte_len,
         SHA256(text) AS sha
         FROM documents ORDER BY doc_id""")
}
