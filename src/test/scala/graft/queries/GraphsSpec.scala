package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The shared-materialization contract: every per-SF-dir derived table in
  * [[Graphs]] must equal a from-scratch recomputation off the base tables
  * on the same session — the local analog of the oracle discipline (each
  * consumer's DuckDB oracle re-derives from lineitem on every run).
  */
class GraphsSpec extends SparkSpec {

  test("copurchaseTriangles ≡ triangleCounts(recomputed co-purchase edges)") {
    val dir = sf()
    val li = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val edges = li.as("x").join(li.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .groupBy(col("x.pk").as("id_a"), col("y.pk").as("id_b"))
      .agg(count(lit(1)).as("__sup"))
      .filter(col("__sup") >= 2)
      .select(col("id_a"), col("id_b"))
    val fresh = graft.dedup.DupClusters.triangleCounts(edges)
      .select(col("doc_id").as("node_id"), col("n_triangles"))
    val materialized = Graphs.copurchaseTriangles(spark, dir)
    assert(materialized.join(fresh, Seq("node_id"), "full_outer")
      .filter(not(materialized("n_triangles") <=> fresh("n_triangles")))
      .count() == 0L,
      "materialized triangle counts diverged from the from-scratch build")
    assert(materialized.count() > 0L)
  }

  test("copurchaseEdges ≡ recomputed significant co-purchase graph") {
    val dir = sf()
    val li = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val fresh = li.as("x").join(li.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .groupBy(col("x.pk").as("id_a"), col("y.pk").as("id_b"))
      .agg(count(lit(1)).as("__sup"))
      .filter(col("__sup") >= 2)
      .select(col("id_a"), col("id_b"))
    val materialized = Graphs.copurchaseEdges(spark, dir)
    assert(materialized.exceptAll(fresh).isEmpty &&
      fresh.exceptAll(materialized).isEmpty,
      "materialized co-purchase edges diverged from the from-scratch build")
  }

  test("starRingEdges / hubCycleEdges ≡ recomputed planted community graphs") {
    val dir = sf()
    val docs = graft.Tables.documents(spark, dir).select(col("doc_id"))
    val star = docs.filter(col("doc_id") % 10 =!= 0)
      .select((col("doc_id") - col("doc_id") % 10).as("id_a"),
        col("doc_id").as("id_b"))
    val ring = docs.filter(col("doc_id") % 10 === 0 && col("doc_id") % 100 < 90)
      .select(col("doc_id").as("id_a"), (col("doc_id") + 10).as("id_b"))
      .join(docs.select(col("doc_id").as("id_b")), Seq("id_b"), "left_semi")
      .select(col("id_a"), col("id_b"))
    val fresh = star.unionByName(ring)
    val mat = Graphs.starRingEdges(spark, dir)
    assert(mat.exceptAll(fresh).isEmpty && fresh.exceptAll(mat).isEmpty,
      "materialized star-ring edges diverged from the from-scratch build")
    val closing = graft.Tables.documents(spark, dir)
      .filter(col("doc_id") % 10 === 0 && col("doc_id") % 100 === 90)
      .select((col("doc_id") - lit(90L)).as("id_a"), col("doc_id").as("id_b"))
    val freshHub = fresh.unionByName(closing)
    val matHub = Graphs.hubCycleEdges(spark, dir)
    assert(matHub.exceptAll(freshHub).isEmpty &&
      freshHub.exceptAll(matHub).isEmpty,
      "materialized hub-cycle edges diverged from the from-scratch build")
    assert(mat.count() > 0L && matHub.count() > mat.count())
  }
}
