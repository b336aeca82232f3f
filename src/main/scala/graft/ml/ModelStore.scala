package graft.ml

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.ml.regression.GBTRegressionModel
import org.apache.spark.sql.SparkSession

/** S18 — model persistence with run-stamped directories; "latest" is the
  * lexicographic max run id (ref: src/pm25ml/training/model_storage.py:83-181).
  *
  * Per-run artifacts mirror the reference's layout
  * (model_storage.py:105-120):
  *   `model/`              MLlib native save (the reference gzips an
  *                         XGB/LGBM dump; MLlib's parquet-backed format is
  *                         this engine's native serialization)
  *   `cv_results.parquet`  per-fold CV table — genuinely parquet here
  *                         (the reference writes CSV bytes under the
  *                         .parquet name, a quirk not worth reproducing)
  *   `test_metrics.json`   held-out metrics + run metadata
  */
final class ModelStore(spark: SparkSession, root: String) {
  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def metricsJson(t: ImputationModel.Trained): String = {
    val folds = t.cv.foldR2.mkString("[", ",", "]")
    s"""{"target":"${t.target}","features":${t.features.map("\"" + _ + "\"").mkString("[", ",", "]")},
       |"fold_r2":$folds,"mean_r2":${t.cv.meanR2},"std_r2":${t.cv.stdR2},
       |"test_r2":${t.testR2}}""".stripMargin
  }

  /** Persist under `root/modelName/runId/`; returns the run path. */
  def save(modelName: String, runId: String, t: ImputationModel.Trained): String = {
    val dir = s"$root/$modelName/$runId"
    t.model.write.overwrite().save(s"$dir/model")
    import spark.implicits._
    t.cv.foldR2.zipWithIndex.map { case (r2, fold) => (fold, r2) }
      .toDF("fold", "r2")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/cv_results.parquet")
    val out = fs.create(new Path(s"$dir/test_metrics.json"), true)
    try out.write(metricsJson(t).getBytes("UTF-8")) finally out.close()
    dir
  }

  def loadCvResults(modelName: String, runId: String): org.apache.spark.sql.DataFrame =
    spark.read.parquet(s"$root/$modelName/$runId/cv_results.parquet")

  /** Latest run id for a model = lexicographic max directory name
    * (ref: model_storage.py:155-181 — run ids are sortable timestamps).
    */
  def latestRun(modelName: String): Option[String] = {
    val dir = new Path(s"$root/$modelName")
    if (!fs.exists(dir)) None
    else fs.listStatus(dir).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).sorted.lastOption
  }

  def loadModel(modelName: String, runId: String): GBTRegressionModel =
    GBTRegressionModel.load(s"$root/$modelName/$runId/model")

  def loadMetricsJson(modelName: String, runId: String): String = {
    val p = new Path(s"$root/$modelName/$runId/test_metrics.json")
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }
}
