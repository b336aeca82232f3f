package graft.ml

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.ml.regression.GBTRegressionModel
import org.apache.spark.sql.SparkSession

/** S18 — model persistence with run-stamped directories; "latest" is the
  * lexicographic max run id (ref: src/pm25ml/training/model_storage.py:83-181).
  * The model itself uses MLlib's native save/load; CV metrics ride along as
  * a JSON sidecar.
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
    val out = fs.create(new Path(s"$dir/metrics.json"), true)
    try out.write(metricsJson(t).getBytes("UTF-8")) finally out.close()
    dir
  }

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
    val p = new Path(s"$root/$modelName/$runId/metrics.json")
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }
}
