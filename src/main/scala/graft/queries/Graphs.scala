package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared derived graphs, materialized ONCE per SF dir (the
  * [[graft.text.TextAnalysis.materializePostings]] discipline): the
  * significant co-purchase part graph is consumed by seven operators
  * (link prediction, clustering coefficient, BFS, HyperBall, modularity,
  * shortest paths, weak ties), and re-deriving its lineitem self-join in
  * every query is exactly the repeated work a production pipeline
  * materializes as a derived table per snapshot. Each consumer still
  * hash-verifies against an oracle that recomputes the graph from
  * lineitem, so the materialization is proven equivalent on every run.
  *
  * The build cost lands once in whichever consumer runs first; the table
  * is node-bucketed so downstream node-keyed joins can co-locate.
  */
object Graphs {

  private val copurchaseTables =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private val basketTables =
    scala.collection.concurrent.TrieMap.empty[String, String]

  // collision-free, identifier-safe name per dir (hashCode collides
  // across dirs and math.abs(Int.MinValue) is negative)
  private def dirTag(dir: String): String = java.security.MessageDigest
    .getInstance("MD5").digest(dir.getBytes("UTF-8"))
    .map("%02x".format(_)).mkString.take(16)

  /** Distinct (basket = l_orderkey, item = l_partkey) rows, materialized
    * once per SF dir and bucketed+sorted by basket — the shared upstream
    * of both the co-purchase graph build and the whole itemset family
    * (frequent pairs/triples, association rules), each of which otherwise
    * re-scans lineitem and re-pays the same distinct shuffle. Basket
    * bucketing co-locates the per-basket self-joins those consumers run.
    */
  def baskets(s: SparkSession, dir: String): DataFrame = {
    val table = basketTables.getOrElseUpdate(dir, {
      val name = "graft_baskets_" + dirTag(dir)
      graft.maintain.Layout.resetTable(s, name)
      val b = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("basket"), col("l_partkey").as("item"))
        .distinct()
      graft.maintain.Layout.writeBucketed(b, name, "basket", 8,
        sortCols = Seq("basket", "item"))
      name
    })
    s.table(table)
  }

  private val triangleTables =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Per-node triangle participation counts of the co-purchase graph,
    * materialized once per SF dir: the oriented-triangle enumeration
    * ([[graft.dedup.DupClusters.triangleCounts]]) is the shared upstream
    * of the local clustering coefficient (per-node), global transitivity
    * (Σ over nodes = 3·triangles), and the triangle-census health checks —
    * re-enumerating it per query repeats the family's most expensive
    * join. Consumers' oracles still recount triangles naively from
    * lineitem, so the materialization is proven exact on every run.
    */
  def copurchaseTriangles(s: SparkSession, dir: String): DataFrame = {
    val table = triangleTables.getOrElseUpdate(dir, {
      val name = "graft_copurchase_tri_" + dirTag(dir)
      graft.maintain.Layout.resetTable(s, name)
      val tri = graft.dedup.DupClusters.triangleCounts(copurchaseEdges(s, dir))
        .select(col("doc_id").as("node_id"), col("n_triangles"))
      graft.maintain.Layout.writeBucketed(tri, name, "node_id", 8,
        sortCols = Seq("node_id"))
      name
    })
    s.table(table)
  }

  /** Edges (id_a < id_b) of the significant co-purchase graph: part
    * pairs sharing ≥ 2 distinct orders.
    */
  def copurchaseEdges(s: SparkSession, dir: String): DataFrame = {
    val table = copurchaseTables.getOrElseUpdate(dir, {
      val name = "graft_copurchase_" + dirTag(dir)
      graft.maintain.Layout.resetTable(s, name)
      val li = baskets(s, dir).select(col("basket").as("ok"), col("item").as("pk"))
      val edges = li.as("x").join(li.as("y"),
          col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .groupBy(col("x.pk").as("id_a"), col("y.pk").as("id_b"))
        .agg(count(lit(1)).as("__sup"))
        .filter(col("__sup") >= 2)
        .select(col("id_a"), col("id_b"))
      graft.maintain.Layout.writeBucketed(edges, name, "id_a", 8,
        sortCols = Seq("id_a", "id_b"))
      name
    })
    s.table(table)
  }
}
