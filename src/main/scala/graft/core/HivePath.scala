package graft.core

/** Hive-style `k=v` path segments parsed into ordered metadata
  * (ref: src/pm25ml/hive_path.py:4-96). Spark reads these natively as
  * partition columns; this class exists for the orchestration layer, which
  * addresses single partitions (`stage=s/month=2023-01`) without a scan.
  */
final case class HivePath(segments: Seq[(String, String)]) {
  def metadata: Map[String, String] = segments.toMap
  def get(key: String): Option[String] = segments.collectFirst {
    case (k, v) if k == key => v
  }
  def path: String = segments.map { case (k, v) => s"$k=$v" }.mkString("/")
  def child(key: String, value: String): HivePath =
    HivePath(segments :+ (key -> value))
  override def toString: String = path
}

object HivePath {
  /** Parse the `k=v` segments of a path, ignoring non-kv segments
    * (bucket roots, file names).
    */
  def parse(path: String): HivePath =
    HivePath(path.split("/").toSeq
      .filter(_.contains("="))
      .map { seg =>
        val Array(k, v) = seg.split("=", 2)
        k -> v
      })
}
