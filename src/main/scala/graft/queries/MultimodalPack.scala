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

    // ViT patch-grid plan: image dims derived deterministically from the
    // byte length IN THE QUERY (both engines compute them identically),
    // then the ceil-division patch layout is exact integer arithmetic.
    "mm_patch_plan" -> ((s, dir) => {
      val bl = length(encode(col("text"), "UTF-8"))
      val imgs = table(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          (lit(64) + pmod(bl, lit(960))).as("width"),
          (lit(64) + pmod(bl * 7, lit(540))).as("height"))
      Multimodal.patchPlan(imgs, patch = 16)
        .orderBy("media_id")
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
         FROM documents ORDER BY doc_id""",
    "mm_patch_plan" ->
      """WITH imgs AS (
           SELECT doc_id AS media_id,
             CAST(64 + OCTET_LENGTH(ENCODE(text)) % 960 AS INT) AS width,
             CAST(64 + (OCTET_LENGTH(ENCODE(text)) * 7) % 540 AS INT) AS height
           FROM documents)
         SELECT media_id, width, height,
           CAST((width + 15) // 16 AS INT) AS n_cols,
           CAST((height + 15) // 16 AS INT) AS n_rows,
           CAST(((width + 15) // 16) * ((height + 15) // 16) AS INT) AS n_patches,
           CAST(((width + 15) // 16) * 16 - width AS INT) AS pad_x,
           CAST(((height + 15) // 16) * 16 - height AS INT) AS pad_y
         FROM imgs ORDER BY media_id""")
}
