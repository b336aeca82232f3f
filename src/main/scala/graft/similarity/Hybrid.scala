package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid retrieval fusion — combine independently-produced rankings
  * (BM25 lexical, embedding cosine, any other arm) into one list with
  * reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009):
  * `score(d) = Σ_arms 1 / (k + rank_arm(d))`, arms where `d` is absent
  * contributing 0. RRF needs no score calibration between arms — only
  * ranks — which is why it is the default fusion in hybrid
  * lexical+vector search engines.
  *
  * 100 TB shape: each arm is already a bounded top-N per query (the
  * expensive part — BM25, ANN — happened upstream), so the fusion joins
  * small ranked lists on (query, doc) keys; with per-query lists these
  * broadcast. Determinism: ranks are integers, each reciprocal is one
  * IEEE division, and the arm contributions add in declared arm order —
  * no partition-order-dependent float math.
  */
object Hybrid {

  /** Fuse `arms` (name -> DataFrame with `keyCols` + integer `rankCol`)
    * into one ranking. Output: `keyCols`, one `rank_<name>` column per
    * arm (null where the arm missed the key), and `rrf` rounded to 6dp.
    * Rows for every key present in at least one arm.
    */
  def rrfFuse(arms: Seq[(String, DataFrame)], keyCols: Seq[String],
              rankCol: String, kRrf: Int = 60): DataFrame = {
    require(arms.nonEmpty, "at least one arm required")
    require(arms.map(_._1).distinct.size == arms.size,
      "arm names must be distinct")
    val renamed = arms.map { case (name, df) =>
      df.select((keyCols.map(col) :+
        col(rankCol).cast("int").as(s"rank_$name")): _*)
    }
    val joined = renamed.reduce(_.join(_, keyCols, "full_outer"))
    val score = arms.map { case (name, _) =>
      coalesce(lit(1.0) / (lit(kRrf.toDouble) + col(s"rank_$name")), lit(0.0))
    }.reduce(_ + _)
    joined.withColumn("rrf", round(score, 6))
  }
}
