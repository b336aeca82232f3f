package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key (skew) handling for shuffled equi-joins.
  *
  * AQE's skew-join handles most skew at runtime by splitting oversized
  * partitions, so it is the FIRST lever — this operator is for the cases
  * the optimizer cannot rescue: a deliberately pre-planned physical
  * layout (static partitioning for bucketed sinks), shuffled-hash joins
  * where one build key exceeds executor memory, or engines running with
  * AQE off. Salting trades `salt`× replication of the small side for a
  * uniform spread of each hot key across `salt` reducers.
  *
  * The salt must be DETERMINISTIC (a `rand()`-based salt re-rolls on
  * stage retry, silently losing/duplicating rows when a shuffle map task
  * re-runs — determinism-under-retry is the same reason Spark restricts
  * `rand()` in shuffles). Here it hashes the big side's entire row, so
  * two copies of one hot key land on different reducers whenever any
  * payload column differs; fully identical rows co-locate (they are one
  * logical multiplicity, and no hash can separate them).
  *
  * Result is column- and row-identical to the plain equi-join.
  */
object SaltedJoin {

  /** Equi-join `big ⋈ small` on `keys`, with the big side salted
    * `salt` ways and the small side replicated to match. Inner and left
    * joins only (the replicate-right shape preserves exactly those).
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                     salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"salted join supports inner/left, got $joinType")
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "__salt is reserved by saltedEquiJoin")
    val saltCol = pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)),
      lit(salt.toLong))
    val b = big.withColumn("__salt", saltCol)
    val s = small.withColumn("__salt",
      explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
    b.join(s, keys :+ "__salt", joinType).drop("__salt")
  }
}
