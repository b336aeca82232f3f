package graft.similarity

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF coarse-quantizer persistence with run-stamped directories — the
  * index twin of [[graft.ml.ModelStore]]'s model layout (same
  * conventions: `root/<name>/<runId>/`, "latest" = lexicographic max
  * run id, sortable-timestamp run ids).
  *
  * [[Ann.trainIvf]] re-trains k-means per session; at corpus scale the
  * index IS state — the at-rest corpus ([[VectorStorage]]) was
  * bucketed by ITS cells, so a recurring pass must probe with the SAME
  * centroids or every cell routing is silently wrong. Persisting the
  * centroids (plus a training-sample fingerprint) makes the pairing
  * auditable: a reader can check the index it loaded is the one the
  * corpus was written under.
  *
  * Layout per run:
  *   `centroids.parquet`  (centroid int, i int, x double) — exploded,
  *                        engine-portable, no JVM serialization
  *   `meta.json`          nlist, dim, trainingHash (xxhash64 xor-fold
  *                        of the training sample's vector bytes —
  *                        order-independent, cheap to recompute)
  */
final class IvfStore(spark: SparkSession, root: String) {
  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Order-independent fingerprint of a vector corpus: xor-fold of
    * per-row xxhash64 over the double view — stable across
    * partitioning, layouts and engines; used to tie an index run to
    * the corpus snapshot it was trained on.
    */
  def corpusFingerprint(vectors: DataFrame, idCol: String = "vec_id",
                        vecCol: String = "embedding"): Long = {
    val r = vectors
      .select(xxhash64(col(idCol).cast("long"),
        Ann.asDouble(col(vecCol)).cast("string")).as("h"))
      .agg(expr("bit_xor(h)")).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Persist under `root/indexName/runId/`; returns the run path. */
  def save(indexName: String, runId: String, index: Ann.IvfIndex,
           trainingHash: Long): String = {
    val dir = s"$root/$indexName/$runId"
    import spark.implicits._
    val rows = for {
      (c, ci) <- index.centroids.zipWithIndex
      (x, i) <- c.zipWithIndex
    } yield (ci, i, x)
    rows.toSeq.toDF("centroid", "i", "x")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids.parquet")
    val dim = if (index.centroids.isEmpty) 0 else index.centroids.head.length
    val meta =
      s"""{"nlist":${index.centroids.length},"dim":$dim,"training_hash":$trainingHash}"""
    val out = fs.create(new Path(s"$dir/meta.json"), true)
    try out.write(meta.getBytes("UTF-8")) finally out.close()
    dir
  }

  def load(indexName: String, runId: String): Ann.IvfIndex = {
    val rows = spark.read.parquet(s"$root/$indexName/$runId/centroids.parquet")
      .select("centroid", "i", "x").collect()
    require(rows.nonEmpty, s"empty centroid table for $indexName/$runId")
    val nlist = rows.map(_.getInt(0)).max + 1
    val dim = rows.map(_.getInt(1)).max + 1
    val m = Array.ofDim[Double](nlist, dim)
    rows.foreach(r => m(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    Ann.IvfIndex(m)
  }

  def loadMetaJson(indexName: String, runId: String): String = {
    val p = new Path(s"$root/$indexName/$runId/meta.json")
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  /** Latest run id = lexicographic max directory name (run ids are
    * sortable timestamps — the [[graft.ml.ModelStore.latestRun]] rule).
    */
  def latestRun(indexName: String): Option[String] = {
    val dir = new Path(s"$root/$indexName")
    if (!fs.exists(dir)) None
    else fs.listStatus(dir).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).sorted.lastOption
  }
}
