package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSON-lines corpus source — the interchange format text corpora ship
  * in (one JSON document per line, typically gzip'd shards).
  *
  * Scale rules this reader enforces rather than documents:
  *
  *   - the schema is ALWAYS explicit — `inferSchema` is a full extra
  *     pass over the corpus before the first real one, and a sampled
  *     inference can silently widen/narrow types between runs;
  *   - malformed lines are captured, not fatal and not dropped:
  *     PERMISSIVE mode with a corrupt-record column, so one bad shard
  *     in a 100 TB crawl costs a filter, not a job (and the bad lines
  *     remain inspectable);
  *   - compression is transparent per file extension (Hadoop codecs),
  *     so mixed .jsonl / .jsonl.gz directories read in one pass —
  *     gzip shards are non-splittable, which is fine at the usual
  *     shard sizes (≤1 GB) and why corpora ship pre-sharded.
  */
object JsonlCorpus {

  val CorruptCol = "_corrupt_record"

  /** The documents-table schema in JSONL form. */
  val DocumentsSchema: StructType = StructType.fromDDL(
    "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")

  /** Read a JSONL path (file, directory, or glob) under an explicit
    * schema; malformed lines land in [[CorruptCol]] with every data
    * column null.
    */
  def read(spark: SparkSession, path: String,
           schema: StructType = DocumentsSchema): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Streaming twin of [[read]]: the same explicit-schema, corrupt-
    * capturing reader over a growing shard directory — continuous corpus
    * ingest with `Trigger.AvailableNow` for incremental batch catch-up.
    * Downstream map-side operators (quality gates, Bloom snapshot dedup,
    * PII scrubbing) compose unchanged; StreamingSpec runs the pipeline.
    */
  def readStream(spark: SparkSession, path: String,
                 schema: StructType = DocumentsSchema): DataFrame =
    spark.readStream
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** `(valid rows without the corrupt column, corrupt rows with the raw
    * line in [[CorruptCol]])`. The corrupt side keeps the full schema:
    * Spark refuses a file-scan projection of ONLY the corrupt-record
    * column (the parse that fills it needs the data columns requested),
    * and the null data columns are what makes the raw line inspectable
    * next to where it failed.
    */
  def readSplit(spark: SparkSession, path: String,
                schema: StructType = DocumentsSchema): (DataFrame, DataFrame) = {
    val df = read(spark, path, schema)
    (df.filter(col(CorruptCol).isNull).drop(CorruptCol),
      df.filter(col(CorruptCol).isNotNull))
  }
}
