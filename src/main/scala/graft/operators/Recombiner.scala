package graft.operators

import org.apache.spark.sql.DataFrame

/** Recombine N stage frames into one: full-outer join on the shared id
  * columns with key coalescing; optionally let later frames overwrite
  * clashing value columns of earlier ones
  * (ref: src/pm25ml/combiners/recombiner/recombiner.py:143-178).
  */
object Recombiner {
  val IdColumns: Seq[String] = Seq("grid_id", "date")

  def recombine(frames: Seq[DataFrame], overwriteColumns: Boolean): DataFrame = {
    require(frames.nonEmpty, "no frames to recombine")
    frames.reduce { (a, b) =>
      val keys = IdColumns.filter(k =>
        a.columns.contains(k) && b.columns.contains(k))
      require(keys.nonEmpty, "frames share no id column")
      val sharedValues = a.columns.toSet
        .intersect(b.columns.toSet) -- keys
      val left =
        if (overwriteColumns && sharedValues.nonEmpty)
          a.drop(sharedValues.toSeq: _*) // right side wins (recombiner.py:159-166)
        else {
          require(sharedValues.isEmpty,
            s"clashing value columns without overwrite: ${sharedValues.toSeq.sorted.mkString(",")}")
          a
        }
      // Seq-form join coalesces the key columns (polars coalesce=True)
      left.join(b, keys, "full")
    }
  }
}
