package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-pair (2-itemset) mining with a-priori pruning — the
  * market-basket / co-occurrence question over any (basket, item)
  * relation: which item pairs appear together in at least a
  * `minSupportFrac` share of baskets, with the support and lift
  * association measures attached. In a corpus pipeline the same shape
  * answers "which token/domain/entity pairs co-occur beyond chance" —
  * the input is simply (doc, term).
  *
  * Execution, end to end declarative:
  *   1. distinct (basket, item) — presence semantics, duplicates within
  *      a basket don't inflate support;
  *   2. per-item support counts; the A-PRIORI prune keeps only items
  *      with `cnt ≥ ⌈frac·n⌉` (a pair's support is bounded by either
  *      item's, so infrequent items can never form a frequent pair —
  *      Agrawal & Srikant 1994);
  *   3. baskets re-filtered to frequent items, grouped once, and
  *      ordered pairs exploded per basket;
  *   4. pair counts, re-filtered by the same threshold.
  *
  * The threshold is resolved IN-PLAN from the measured basket count (a
  * 1-row aggregate entering via broadcast cross join) — no driver
  * action, so the operator composes lazily like everything else here.
  *
  * 100 TB shape: the corpus shuffles once into the per-basket group;
  * the pair explosion is the one super-linear term and is bounded by
  * `maxBasketItems` — a basket whose FREQUENT-item set exceeds the cap
  * aborts loudly (codegen'd raise_error) instead of silently shuffling
  * C(huge, 2) rows; raise the cap deliberately for wide-basket domains.
  * The a-priori prune is what makes the cap meaningful: raw basket
  * width doesn't matter, only items that individually clear the
  * support floor survive into the explosion, and at any real threshold
  * that set is small (an item in ≥1% of 10¹⁰ baskets is a head item;
  * there are at most 100/frac of them corpus-wide... per basket).
  *
  * All counts are exact BIGINTs; `support` and `lift` are pinned
  * single-expression IEEE trees over exact integers, so the oracle
  * replays every float bit-for-bit.
  */
object FrequentPairs {

  /** Frequent pairs at `minSupportFrac`: one row per unordered pair
    * (item_a < item_b) with
    * `(item_a, item_b, pair_cnt, cnt_a, cnt_b, n_baskets, support, lift)`.
    * Null baskets/items are dropped.
    */
  def frequentPairs(rel: DataFrame, basketCol: String, itemCol: String,
                    minSupportFrac: Double,
                    maxBasketItems: Int = 4096): DataFrame = {
    require(minSupportFrac > 0.0 && minSupportFrac <= 1.0,
      s"minSupportFrac out of (0,1]: $minSupportFrac")
    require(maxBasketItems >= 2, s"maxBasketItems too small: $maxBasketItems")
    // pres feeds the threshold count, the item counts and the kept
    // join; frequent feeds the kept join and both final count lookups.
    // Catalyst re-executes shared subtrees per reference, so without
    // materialization the corpus-sized distinct would run ~6× (the
    // Triangles lesson). Both frames are narrow: (basket, item) pairs
    // and the frequent-item list.
    val pres = rel
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct()
      .localCheckpoint()
    val nB = pres.agg(countDistinct(col("basket")).as("n_baskets"))
    val floorCnt = ceil(lit(minSupportFrac) * col("n_baskets")).as("min_cnt")
    val thresholds = broadcast(nB.select(col("n_baskets"), floorCnt))

    val itemCnt = pres.groupBy("item").agg(count(lit(1)).as("cnt"))
    val frequent = itemCnt.crossJoin(thresholds)
      .filter(col("cnt") >= col("min_cnt"))
      .select("item", "cnt")
      .localCheckpoint()

    val kept = pres.join(frequent, Seq("item"))
    val baskets = kept.groupBy("basket")
      .agg(collect_list(col("item")).as("items"))
      .withColumn("items",
        when(size(col("items")) > maxBasketItems,
          raise_error(concat(lit("frequentPairs: basket "),
            col("basket").cast("string"),
            lit(s" holds more than $maxBasketItems frequent items — " +
              "raise maxBasketItems deliberately or tighten the support " +
              "floor; exploding it would shuffle C(n,2) pair rows"))))
          .otherwise(col("items")))
    val pairs = baskets
      .select(explode(col("items")).as("item_a"), col("items"))
      .select(col("item_a"), explode(col("items")).as("item_b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("pair_cnt"))

    pairs.crossJoin(thresholds)
      .filter(col("pair_cnt") >= col("min_cnt"))
      .join(frequent.select(col("item").as("item_a"), col("cnt").as("cnt_a")),
        Seq("item_a"))
      .join(frequent.select(col("item").as("item_b"), col("cnt").as("cnt_b")),
        Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("pair_cnt"),
        col("cnt_a"), col("cnt_b"), col("n_baskets"),
        (col("pair_cnt").cast("double") / col("n_baskets").cast("double"))
          .as("support"),
        ((col("pair_cnt").cast("double") * col("n_baskets").cast("double")) /
          (col("cnt_a").cast("double") * col("cnt_b").cast("double")))
          .as("lift"))
  }

  /** DuckDB replay of [[frequentPairs]]: same distinct presence set,
    * same in-plan ⌈frac·n⌉ floor, same ordered-pair expansion and the
    * identical support/lift expression trees.
    */
  def oracleSql(relSql: String, minSupportFrac: Double): String =
    s"""WITH rel AS ($relSql),
       pres AS (SELECT DISTINCT basket, item FROM rel
                WHERE basket IS NOT NULL AND item IS NOT NULL),
       nb AS (SELECT COUNT(DISTINCT basket) AS n_baskets,
                CAST(CEIL($minSupportFrac * COUNT(DISTINCT basket)) AS BIGINT)
                  AS min_cnt
              FROM pres),
       ic AS (SELECT item, COUNT(*) AS cnt FROM pres GROUP BY item),
       freq AS (SELECT item, cnt FROM ic CROSS JOIN nb
                WHERE cnt >= min_cnt),
       kept AS (SELECT basket, item FROM pres
                WHERE item IN (SELECT item FROM freq)),
       pc AS (SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS pair_cnt
              FROM kept a JOIN kept b
                ON b.basket = a.basket AND b.item > a.item
              GROUP BY 1, 2)
       SELECT pc.item_a, pc.item_b, pc.pair_cnt, fa.cnt AS cnt_a,
         fb.cnt AS cnt_b, nb.n_baskets,
         CAST(pc.pair_cnt AS DOUBLE) / CAST(nb.n_baskets AS DOUBLE)
           AS support,
         (CAST(pc.pair_cnt AS DOUBLE) * CAST(nb.n_baskets AS DOUBLE))
           / (CAST(fa.cnt AS DOUBLE) * CAST(fb.cnt AS DOUBLE)) AS lift
       FROM pc CROSS JOIN nb
       JOIN freq fa ON fa.item = pc.item_a
       JOIN freq fb ON fb.item = pc.item_b
       WHERE pc.pair_cnt >= nb.min_cnt"""
}
