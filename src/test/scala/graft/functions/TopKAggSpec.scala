package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.Sampling

class TopKAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      (i.toLong, s"g${rnd.nextInt(7)}", rnd.nextInt(1000).toDouble)
    }.toDF("id", "g", "score").repartition(9)
  }

  test("skew-safe top-k is row-identical to the rank-window plan") {
    val df = corpus(5000, seed = 3)
    val window = Sampling.topKPerGroup(df, Seq("g"),
        Seq(col("score").desc, col("id").asc), k = 4)
      .select("id", "g", "score", "group_rank").collect().toSet
    val heap = Sampling.topKPerGroupSkewSafe(df, Seq("g"),
        struct((-col("score")).as("s"), col("id").as("i")), k = 4)
      .select("id", "g", "score", "group_rank").collect().toSet
    assert(heap === window)
    assert(heap.size === 7 * 4)
  }

  test("aggregate state survives serialization (forced exchange)") {
    // many partitions + tiny groups force partial buffers through the
    // serialize/deserialize + merge path
    val df = corpus(2000, seed = 8).repartition(32)
    val out = Sampling.topKPerGroupSkewSafe(df, Seq("g"),
        struct((-col("score")).as("s"), col("id").as("i")), k = 3)
      .groupBy("g").count().collect().map(_.getLong(1))
    assert(out.forall(_ === 3L))
  }

  test("plan aggregates with partial (map-side) combine, no rank window") {
    val df = corpus(3000, seed = 1)
    val top = Sampling.topKPerGroupSkewSafe(df, Seq("g"),
      struct((-col("score")).as("s"), col("id").as("i")), k = 5)
    top.count()
    val s = top.queryExecution.executedPlan.toString
    assert(s.contains("topk_structs"), "custom aggregate missing from plan")
    assert(!s.contains("Window"), "must not fall back to a rank window")
    // ObjectHashAggregate runs in partial + final mode around the exchange
    assert(s.contains("ObjectHashAggregate"))
  }

  test("ties beyond k are cut by the total order, exactly as the window") {
    val df = Seq(
      (1L, "g", 5.0), (2L, "g", 5.0), (3L, "g", 5.0), (4L, "g", 1.0))
      .toDF("id", "g", "score").repartition(3)
    val got = Sampling.topKPerGroupSkewSafe(df, Seq("g"),
        struct((-col("score")).as("s"), col("id").as("i")), k = 2)
      .select("id", "group_rank").as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 1, 2L -> 2))
  }
}
