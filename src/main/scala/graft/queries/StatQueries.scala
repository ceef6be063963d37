package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact evaluation / inference statistics ([[graft.analytics.Eval]]) and
  * the mechanisms around them: tie-aware ROC AUC and the two-sample
  * Kolmogorov–Smirnov distance on the bucketed two-level cumulative (the
  * naive single-task ORDER-BY-value window IS the oracle — equality proves
  * the sort-free plan), the multi-class classification report, the exact
  * Gini concentration coefficient on the scale-safe StableIds rank, and
  * Warner randomized response with its exact debiasing estimator. Every
  * compared statistic is a ratio of exact integers assembled in one
  * fixed-operand-order IEEE division.
  */
object StatQueries {

  /** Exact tie-aware ROC AUC of the (deliberately uninformative) cent-scaled
    * event value against the purchase label — the integer 2U statistic and
    * its single-division AUC, both under the hash. The oracle computes the
    * naive global cumulative over distinct scores; the operator's bucketed
    * two-level plan must match it exactly.
    */
  private def aucQ(s: SparkSession, dir: String): DataFrame =
    graft.analytics.Eval.aucExact(
      Tables.events(s, dir),
      round(col("value") * 100, 0).cast("long"),
      col("event_type") === "purchase")

  private val aucOracle =
    """WITH e AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) AS s,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      |  FROM events),
      |pv AS (
      |  SELECT s, CAST(sum(y) AS BIGINT) AS p,
      |    CAST(count(*) - sum(y) AS BIGINT) AS n
      |  FROM e GROUP BY s),
      |c AS (
      |  SELECT p, n,
      |    CAST(coalesce(sum(n) OVER (ORDER BY s
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS HUGEINT) AS nb
      |  FROM pv),
      |t AS (
      |  SELECT CAST(sum(p) AS BIGINT) AS n_pos, CAST(sum(n) AS BIGINT) AS n_neg,
      |    CAST(sum(CAST(p AS HUGEINT) * (2 * nb + CAST(n AS HUGEINT)))
      |      AS DECIMAL(38,0)) AS two_u
      |  FROM c)
      |SELECT n_pos, n_neg, two_u,
      |  CASE WHEN n_pos > 0 AND n_neg > 0
      |    THEN CAST(two_u AS DOUBLE) /
      |      (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
      |  END AS auc
      |FROM t""".stripMargin

  /** Exact two-sample KS distance between the click and view value
    * distributions: max-|CDF gap| as an exact integer numerator over the
    * pooled distinct values, one final division. Naive global-window
    * oracle, same proof shape as `q_auc`.
    */
  private def ksQ(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).filter(col("event_type").isin("click", "view"))
    graft.analytics.Eval.ksStatistic(ev,
      round(col("value") * 100, 0).cast("long"),
      col("event_type") === "click",
      col("event_type") === "view")
  }

  private val ksOracle =
    """WITH e AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) AS s,
      |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a,
      |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS b
      |  FROM events WHERE event_type IN ('click', 'view')),
      |pv AS (
      |  SELECT s, CAST(sum(a) AS BIGINT) AS a, CAST(sum(b) AS BIGINT) AS b
      |  FROM e GROUP BY s),
      |c AS (
      |  SELECT s, a, b,
      |    CAST(sum(a) OVER (ORDER BY s
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT) AS ca,
      |    CAST(sum(b) OVER (ORDER BY s
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT) AS cb
      |  FROM pv),
      |t AS (SELECT CAST(sum(a) AS BIGINT) AS n_a, CAST(sum(b) AS BIGINT) AS n_b
      |  FROM pv),
      |m AS (
      |  SELECT CAST(max(abs(ca * CAST(n_b AS HUGEINT)
      |    - cb * CAST(n_a AS HUGEINT))) AS DECIMAL(38,0)) AS d_num
      |  FROM c, t)
      |SELECT n_a, n_b, d_num,
      |  CASE WHEN n_a > 0 AND n_b > 0
      |    THEN CAST(d_num AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
      |  END AS d
      |FROM t, m""".stripMargin

  /** Multi-class classification report of a deterministic value-threshold
    * "model" against the event-type label: per-class tp/fp/fn and
    * single-division precision/recall/F1 (F1 in the reduced
    * 2tp/(2tp+fp+fn) form). Confusion matrix is class²-bounded.
    */
  private def evalMetricsQ(s: SparkSession, dir: String): DataFrame = {
    val pred = when(col("value") >= 300, "error")
      .when(col("value") >= 200, "click")
      .when(col("value") >= 100, "purchase")
      .when(col("value") >= 50, "view")
      .otherwise("signup")
    graft.analytics.Eval.classificationReport(
        Tables.events(s, dir), col("event_type"), pred)
      .select(col("cls"), col("tp"), col("fp"), col("fn"),
        col("precision").as("prec"), col("recall").as("rec"), col("f1"))
      .orderBy(col("cls"))
  }

  private val evalMetricsOracle =
    """WITH p AS (
      |  SELECT event_type AS truth,
      |    CASE WHEN value >= 300 THEN 'error' WHEN value >= 200 THEN 'click'
      |         WHEN value >= 100 THEN 'purchase' WHEN value >= 50 THEN 'view'
      |         ELSE 'signup' END AS pred
      |  FROM events),
      |cm AS (SELECT truth, pred, CAST(count(*) AS BIGINT) AS c
      |  FROM p GROUP BY truth, pred),
      |bt AS (SELECT truth AS cls, CAST(sum(c) AS BIGINT) AS t_cnt
      |  FROM cm GROUP BY truth),
      |bp AS (SELECT pred AS cls, CAST(sum(c) AS BIGINT) AS p_cnt
      |  FROM cm GROUP BY pred),
      |dg AS (SELECT truth AS cls, c AS tp0 FROM cm WHERE truth = pred),
      |j AS (
      |  SELECT COALESCE(bt.cls, bp.cls) AS cls,
      |    COALESCE(tp0, 0) AS tp,
      |    COALESCE(p_cnt, 0) - COALESCE(tp0, 0) AS fp,
      |    COALESCE(t_cnt, 0) - COALESCE(tp0, 0) AS fn
      |  FROM bt FULL JOIN bp ON bt.cls = bp.cls
      |  LEFT JOIN dg ON COALESCE(bt.cls, bp.cls) = dg.cls)
      |SELECT cls, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
      |  CAST(fn AS BIGINT) AS fn,
      |  CASE WHEN tp + fp > 0
      |    THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS prec,
      |  CASE WHEN tp + fn > 0
      |    THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS rec,
      |  CASE WHEN tp * 2 + fp + fn > 0
      |    THEN CAST(tp * 2 AS DOUBLE) / CAST(tp * 2 + fp + fn AS DOUBLE)
      |  END AS f1
      |FROM j ORDER BY cls""".stripMargin

  /** Exact Gini coefficient of per-customer order spend (concentration
    * audit): ranks via the distributed StableIds path, the naive global
    * row_number is the oracle; numerator exact DECIMAL(38), one division.
    */
  private def giniCoeffQ(s: SparkSession, dir: String): DataFrame = {
    val totals = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
    graft.analytics.Eval.giniCoefficient(totals, "o_custkey", "cents")
  }

  private val giniCoeffOracle =
    """WITH t AS (
      |  SELECT o_custkey,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
      |  FROM orders GROUP BY o_custkey),
      |r AS (
      |  SELECT x, CAST(row_number() OVER (ORDER BY x, o_custkey) AS BIGINT) AS i
      |  FROM t),
      |a AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sum_cents,
      |    CAST(sum(CAST(i AS HUGEINT) * CAST(x AS HUGEINT)) AS HUGEINT) AS s1
      |  FROM r)
      |SELECT n, sum_cents,
      |  CAST(2 * s1 - (CAST(n AS HUGEINT) + 1) * CAST(sum_cents AS HUGEINT)
      |    AS DECIMAL(38,0)) AS gini_num,
      |  CASE WHEN n > 0 AND sum_cents > 0
      |    THEN CAST(2 * s1 - (CAST(n AS HUGEINT) + 1) * CAST(sum_cents AS HUGEINT)
      |        AS DOUBLE) /
      |      (CAST(n AS DOUBLE) * CAST(sum_cents AS DOUBLE))
      |  END AS gini
      |FROM a""".stripMargin

  /** Warner randomized response on the purchase flag: deterministic md5
    * coin (p = 3/4 truth), exact integer debias — the noisy observed
    * count, the exact estimator numerator, and the estimate all replayed
    * in the oracle.
    */
  private def randomizedResponseQ(s: SparkSession, dir: String): DataFrame =
    graft.ops.Privacy.randomizedResponse(
      Tables.events(s, dir), col("event_id"),
      col("event_type") === "purchase", seed = "s1")

  private val randomizedResponseOracle = {
    val u32 = OracleSql.md5U32Sql("'rr:s1:' || CAST(event_id AS VARCHAR)")
    s"""WITH e AS (
      |  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS t,
      |    ($u32) % 4 AS draw
      |  FROM events),
      |r AS (
      |  SELECT t, CASE WHEN draw < 3 THEN t ELSE 1 - t END AS rep FROM e),
      |a AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(t) AS BIGINT) AS true_cnt,
      |    CAST(sum(rep) AS BIGINT) AS observed
      |  FROM r)
      |SELECT n, true_cnt, observed,
      |  CAST(4 * observed - 1 * n AS BIGINT) AS est_num,
      |  CAST(4 * observed - 1 * n AS DOUBLE) / 2.0 AS est
      |FROM a""".stripMargin
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_auc" -> (aucQ _),
    "q_ks_test" -> (ksQ _),
    "q_eval_metrics" -> (evalMetricsQ _),
    "q_gini_coefficient" -> (giniCoeffQ _),
    "q_randomized_response" -> (randomizedResponseQ _))

  val oracles: Map[String, String] = Map(
    "q_auc" -> aucOracle,
    "q_ks_test" -> ksOracle,
    "q_eval_metrics" -> evalMetricsOracle,
    "q_gini_coefficient" -> giniCoeffOracle,
    "q_randomized_response" -> randomizedResponseOracle)
}
