package graft.sim

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf())
  private lazy val index = Ivf.build(emb, nlist = 16)

  test("index is deterministic and covers all cells consulted") {
    val i2 = Ivf.build(emb, nlist = 16)
    assert(index.centroids == i2.centroids)
    val cells = emb.select(Ivf.cellId(col("embedding").cast("array<double>"), index))
      .as[Int].collect()
    assert(cells.forall(c => c >= 0 && c < 16))
    assert(cells.distinct.length > 4, "clustering collapsed to too few cells")
  }

  test("IVF top-k: exact cosines, reasonable recall vs brute force") {
    val queries = emb.filter($"vec_id" < 20)
    val ivf = Ivf.topK(emb, queries, index, k = 3, nprobe = 4)
      .select($"query_id", $"nn_id", $"cosine").as[(Long, Long, Double)].collect()
    assert(ivf.nonEmpty)
    val brute = Similarity.bruteForceTopK(emb, queries, k = 3)
      .select($"query_id", $"nn_id", $"cosine").as[(Long, Long, Double)].collect()
    val bruteMap = brute.map { case (q, n, c) => (q, n) -> c }.toMap
    // every IVF hit that brute force also ranked must carry the same cosine
    ivf.foreach { case (q, n, c) =>
      bruteMap.get((q, n)).foreach(exact => assert(exact == c))
    }
    // recall@3 with nprobe=4/16 on clustered data should be well above chance
    val bruteSet = brute.map { case (q, n, _) => (q, n) }.toSet
    val recall = ivf.count { case (q, n, _) => bruteSet((q, n)) }.toDouble / bruteSet.size
    assert(recall >= 0.5, s"recall@3 = $recall")
  }
}
