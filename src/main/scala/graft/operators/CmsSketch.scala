package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch — MERGEABLE approximate frequency table (Cormode &
  * Muthukrishnan 2005), the counting complement of [[KmvSketch]]
  * (distinct counts) and [[graft.text.HeavyHitters]] (exact top-k):
  * "how often does ANY given key occur?", answerable for every key from
  * `depth × width` integers, with per-shard sketches that roll up
  * without touching raw data.
  *
  * The sketch is a d×w count table: row i counts keys under salted hash
  * h_i; `estimate = min_i cnt[i][h_i(x)]` — never an underestimate
  * (every occurrence lands in all d counted cells), overestimates only
  * via collisions (≤ 2N/w with probability ≥ 1 − 2^−d).
  *
  * Engine-portable by construction, like the repo's other sketches:
  * the salted hash is the md5 avalanche key of `value ∥ ':' ∥ i`
  * ([[Sampling.avalancheKey]]), and every cell is an exact BIGINT — the
  * gate oracle replays the ENTIRE sketch and every estimate in SQL with
  * zero float parity surface (unlike implementation-defined CMS
  * libraries, whose hash families differ across engines).
  *
  * 100 TB shape: the build is one map-side-combined aggregation whose
  * shuffle carries at most depth×width rows PER PARTITION (the hash
  * agg combines occurrences of the same cell before the exchange) and
  * exactly depth×width rows after it — the corpus never shuffles.
  * Merge is cell-wise addition (associative/commutative), so per-shard
  * or per-batch sketches at rest roll up in a bounded agg. Estimation
  * broadcasts the d×w table to the probe side.
  */
object CmsSketch {

  /** Salted bucket of `c` for sketch row `i`: avalanche(value:i) mod w. */
  private def bucket(c: org.apache.spark.sql.Column, i: Int, width: Int) =
    pmod(Sampling.avalancheKey(concat(c.cast("string"), lit(s":$i"))),
      lit(width.toLong)).cast("int")

  /** Build the d×w sketch of `valueCol` occurrences: one row per
    * non-empty cell, `(i, bucket, cnt)`. Null values are excluded (they
    * are absence, not a key). Cells never hit stay absent — [[estimate]]
    * treats them as 0.
    */
  def sketch(df: DataFrame, valueCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth out of range: $depth")
    require(width >= 2, s"width out of range: $width")
    val rows = df.filter(col(valueCol).isNotNull)
    val cells = explode(array((0 until depth).map(i =>
      struct(lit(i).as("i"), bucket(col(valueCol), i, width).as("bucket"))): _*))
    rows.select(cells.as("c"))
      .groupBy(col("c.i").as("i"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Cell-wise merge of two sketches built with the same (depth, width)
    * — the per-shard rollup. Union + sum keeps the bounded-cardinality
    * shape: the agg never exceeds depth×width groups.
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("i", "bucket")
      .agg(sum(col("cnt")).as("cnt"))

  /** Estimated occurrence count for each row of `probes.valueCol`:
    * `min_i cnt[i][h_i(x)]`, with absent cells counting 0. The sketch
    * (≤ depth×width rows) broadcasts; the probe side never shuffles.
    */
  def estimate(sk: DataFrame, probes: DataFrame, valueCol: String,
               depth: Int, width: Int): DataFrame = {
    require(depth >= 1, s"depth out of range: $depth")
    val probed = (0 until depth).foldLeft(probes) { (d, i) =>
      d.withColumn(s"__b$i", bucket(col(valueCol), i, width))
    }
    val est = (0 until depth).foldLeft(probed) { (d, i) =>
      d.join(broadcast(sk.where(col("i") === i)
          .select(col("bucket").as(s"__b$i"), col("cnt").as(s"__c$i"))),
        Seq(s"__b$i"), "left")
    }
    val counts = (0 until depth).map(i => coalesce(col(s"__c$i"), lit(0L)))
    est.withColumn("cms_est", least(counts: _*))
      .drop((0 until depth).flatMap(i => Seq(s"__b$i", s"__c$i")): _*)
  }
}
