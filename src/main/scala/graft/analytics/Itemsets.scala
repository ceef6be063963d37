package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-itemset mining (pair level) over basket-shaped data — "parts
  * that ship together" on the star schema, or any (basket, item) table.
  *
  * The classic apriori observation does the scale work: a pair can only be
  * frequent if BOTH items are frequent, so the item table is pruned to
  * frequent items BEFORE the pair-generating self-join. At 100 TB the
  * self-join on the basket key is the one real shuffle; its fan-out is
  * bounded by (frequent items per basket)², and the frequency cut is the
  * valve — exactly the shared-shingle frequency-cut pattern in
  * [[graft.dedup.Dedup.ngramJaccardPairs]]. A skewed mega-basket would
  * square inside one task; cap basket size upstream if baskets are
  * user-generated (retail baskets and order lines are naturally bounded).
  *
  * `lift` is derived from exact BIGINT supports with one IEEE
  * multiplication tree fixed by the column order below — bit-stable
  * cross-engine.
  */
object Itemsets {

  /** Frequent co-occurring item pairs with support counts and lift.
    *
    * @param items      (basketCol, itemCol) rows; duplicates within a basket
    *                   are collapsed (set semantics, standard for itemsets).
    * @param minSupport minimum number of baskets containing the pair (and,
    *                   by apriori, each item).
    */
  def frequentPairs(items: DataFrame, basketCol: String, itemCol: String,
                    minSupport: Long): DataFrame = {
    val baskets = items.select(col(basketCol).as("basket"),
      col(itemCol).as("item")).distinct()
    val nBaskets = baskets.select(col("basket")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val itemSupport = baskets.groupBy(col("item"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    // apriori prune: only frequent items enter the pair join. Supports are
    // NOT carried through the pair shuffle — they join onto the (far
    // smaller) surviving pair set afterwards, so the big shuffle rows stay
    // (basket, item) and nothing wider.
    val frequent = baskets.join(itemSupport.select(col("item")), "item")
      .select(col("basket"), col("item"))
    val pairs = frequent.as("a").join(frequent.as("b"),
        col("a.basket") === col("b.basket") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
      .agg(count(lit(1)).as("support_ab"))
      .filter(col("support_ab") >= minSupport)
      .join(itemSupport.select(col("item").as("item_a"),
        col("support").as("support_a")), "item_a")
      .join(itemSupport.select(col("item").as("item_b"),
        col("support").as("support_b")), "item_b")
    pairs.crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("support_ab"),
        col("support_a"), col("support_b"),
        ((col("support_ab") * col("n_baskets")).cast("double") /
          (col("support_a") * col("support_b")).cast("double")).as("lift"))
  }

  /** Directed association rules from the frequent-pair set: each surviving
    * pair emits both orientations, gated on confidence ≥ minConfPct% via the
    * cross-multiplied integer comparison `100·s_ab ≥ minConfPct·s_antecedent`
    * (no FP threshold); confidence itself is one final division of exact
    * longs. Rule volume is bounded by 2·|frequent pairs| — the expensive
    * work is [[frequentPairs]]' apriori-pruned join, reused as-is.
    */
  def associationRules(items: DataFrame, basketCol: String, itemCol: String,
                       minSupport: Long, minConfPct: Int): DataFrame = {
    // eager anchor (r17): both rule orientations consume the frequent-pair
    // set — unanchored, the whole apriori-pruned pair join ran twice (the
    // pair set is bounded by the support cut, metadata-scale next to the
    // basket table)
    val p = frequentPairs(items, basketCol, itemCol, minSupport)
      .localCheckpoint(true)
    val fwd = p.select(col("item_a").as("antecedent"),
      col("item_b").as("consequent"), col("support_ab"),
      col("support_a").as("support_ant"), col("lift"))
    val bwd = p.select(col("item_b").as("antecedent"),
      col("item_a").as("consequent"), col("support_ab"),
      col("support_b").as("support_ant"), col("lift"))
    fwd.unionByName(bwd)
      .filter(col("support_ab") * 100 >= col("support_ant") * minConfPct)
      .withColumn("confidence",
        col("support_ab").cast("double") / col("support_ant").cast("double"))
  }

  /** Frequent item TRIPLES — apriori level 3. The level-2 prune is what
    * makes this survive scale: a triple can only be frequent if all three
    * of its pairs are, so the candidate stream is cut against the frequent
    * -pair set on every edge BEFORE the counting shuffle — fan-out is
    * bounded by frequent pairs per basket, not (items per basket)³. (The
    * unpruned three-way join is measurably pathological even at sf0.01.)
    *
    * `lift` generalizes to independence of all three:
    * `support_abc · n² / (s_a·s_b·s_c)`, computed through DECIMAL(38) so
    * n² never needs to fit 2⁶³ — exact integers into one fixed-order IEEE
    * division, the [[graft.analytics.Correlation.pearsonMatrix]]
    * discipline.
    */
  def frequentTriples(items: DataFrame, basketCol: String, itemCol: String,
                      minSupport: Long): DataFrame = {
    val baskets = items.select(col(basketCol).as("basket"),
      col(itemCol).as("item")).distinct()
    val nBaskets = baskets.select(col("basket")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val itemSupport = baskets.groupBy(col("item"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    val frequent = baskets.join(itemSupport.select(col("item")), "item")
      .select(col("basket"), col("item"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fp = frequent.as("a").join(frequent.as("b"),
        col("a.basket") === col("b.basket") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("x"), col("b.item").as("y"))
      .agg(count(lit(1)).as("s"))
      .filter(col("s") >= minSupport)
      .select(col("x"), col("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ab = frequent.as("a").join(frequent.as("b"),
        col("a.basket") === col("b.basket") && col("a.item") < col("b.item"))
      .select(col("a.basket").as("basket"), col("a.item").as("ia"),
        col("b.item").as("ib"))
      .join(fp.select(col("x").as("ia"), col("y").as("ib")), Seq("ia", "ib"))
    val abc = ab
      .join(frequent.select(col("basket"), col("item").as("ic")), Seq("basket"))
      .filter(col("ib") < col("ic"))
      .join(fp.select(col("x").as("ia"), col("y").as("ic")), Seq("ia", "ic"))
      .join(fp.select(col("x").as("ib"), col("y").as("ic")), Seq("ib", "ic"))
    val tri = abc
      .groupBy(col("ia").as("item_a"), col("ib").as("item_b"),
        col("ic").as("item_c"))
      .agg(count(lit(1)).as("support_abc"))
      .filter(col("support_abc") >= minSupport)
      .join(itemSupport.select(col("item").as("item_a"),
        col("support").as("support_a")), "item_a")
      .join(itemSupport.select(col("item").as("item_b"),
        col("support").as("support_b")), "item_b")
      .join(itemSupport.select(col("item").as("item_c"),
        col("support").as("support_c")), "item_c")
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    tri.crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("item_c"), col("support_abc"),
        col("support_a"), col("support_b"), col("support_c"),
        ((dec(col("support_abc")) * col("n_baskets") * col("n_baskets"))
          .cast("double") /
          (dec(col("support_a")) * col("support_b") * col("support_c"))
            .cast("double")).as("lift"))
  }
}
