package graft.queries

import graft.analytics.TpchSuite
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver registrations + DuckDB oracles for [[graft.analytics.TpchSuite]] —
  * the TPC-H patterns beyond the Q1/Q3/Q4/Q5/Q7/Q9/Q18 set already in
  * [[AnalyticsQueries]]. Oracle discipline follows NOTES.md: exact DECIMAL
  * sums presented as DOUBLE, ratios as one identical-order division,
  * cross-multiplied integer/decimal threshold gates, BIGINT casts on DuckDB
  * integer sums.
  */
object TpchQueries {

  private val q2Oracle =
    """WITH p AS (SELECT p_partkey, p_retailprice FROM part
      |  WHERE p_size <= 15 AND p_type = 'STANDARD'),
      |s AS (SELECT s_suppkey, s_name, s_acctbal, n_name FROM supplier
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),
      |pr AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
      |c AS (SELECT s.s_acctbal, s.s_name, s.n_name, p.p_partkey, p.p_retailprice,
      |    max(s.s_acctbal) OVER (PARTITION BY p.p_partkey) AS mx
      |  FROM pr JOIN p ON pr.l_partkey = p.p_partkey
      |  JOIN s ON pr.l_suppkey = s.s_suppkey)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_retailprice
      |FROM c WHERE s_acctbal = mx
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin

  private val q6Oracle =
    """SELECT CAST(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
      |  CAST(count(*) AS BIGINT) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin

  private val q8Oracle =
    """WITH rev AS (
      |  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |    CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) AS volume,
      |    sn.n_name AS supp_nation
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation cn ON c_nationkey = cn.n_nationkey
      |  JOIN region ON cn.n_regionkey = r_regionkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation sn ON s_nationkey = sn.n_nationkey
      |  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
      |    AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
      |SELECT o_year,
      |  CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_6' THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) AS DOUBLE) AS nation_rev,
      |  CAST(CAST(sum(volume) AS DECIMAL(18,4)) AS DOUBLE) AS total_rev,
      |  round(CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_6' THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) AS DOUBLE) /
      |        CAST(CAST(sum(volume) AS DECIMAL(18,4)) AS DOUBLE), 6) AS mkt_share
      |FROM rev GROUP BY o_year ORDER BY o_year""".stripMargin

  private val q10Oracle =
    """SELECT c_custkey, c_name, c_acctbal, n_name,
      |  CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1995-10-01' AND o_orderdate < TIMESTAMP '1996-01-01'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  private val q11Oracle =
    """WITH v AS (
      |  SELECT l_partkey AS p_partkey,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS value_dec
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE n_name = 'NATION_11' GROUP BY l_partkey),
      |t AS (SELECT CAST(sum(value_dec) AS DECIMAL(28,4)) AS total_dec FROM v)
      |SELECT p_partkey, CAST(value_dec AS DOUBLE) AS value
      |FROM v, t WHERE value_dec * 1000 > total_dec
      |ORDER BY value DESC, p_partkey""".stripMargin

  private val q13Oracle =
    """WITH c AS (
      |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |    AND o_orderpriority <> '4-NOT SPECIFIED'
      |  GROUP BY c_custkey)
      |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
      |FROM c GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  private val q14Oracle =
    """SELECT
      |  CAST(CAST(sum(CASE WHEN p_type = 'PROMO' THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) AS DOUBLE) AS promo_rev,
      |  CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS total_rev,
      |  round(100.0 * CAST(CAST(sum(CASE WHEN p_type = 'PROMO' THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) AS DOUBLE) /
      |        CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE), 4) AS promo_share_pct
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin

  private val q15Oracle =
    """WITH r AS (
      |  SELECT l_suppkey AS s_key,
      |    CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS rev_dec
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey),
      |m AS (SELECT max(rev_dec) AS max_dec FROM r)
      |SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
      |FROM r JOIN supplier ON s_suppkey = s_key, m
      |WHERE rev_dec = max_dec ORDER BY s_suppkey""".stripMargin

  private val q16Oracle =
    """WITH pr AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
      |SELECT p_brand, p_type, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM pr JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 9, 15, 23, 31, 39, 47)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  private val q17Oracle =
    """WITH b AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#3'),
      |l AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty, l_extendedprice
      |  FROM lineitem JOIN b ON l_partkey = p_partkey),
      |s AS (SELECT l_partkey AS sk, CAST(count(*) AS BIGINT) AS n_l,
      |    CAST(sum(qty) AS BIGINT) AS sum_q
      |  FROM l GROUP BY l_partkey)
      |SELECT round(CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) / 7.0, 4) AS avg_yearly,
      |  CAST(count(*) AS BIGINT) AS n_lines
      |FROM l JOIN s ON l_partkey = sk
      |WHERE qty * n_l * 5 < sum_q""".stripMargin

  private val q19Oracle =
    """SELECT CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
      |  CAST(count(*) AS BIGINT) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  private val q20Oracle =
    """WITH g AS (SELECT p_partkey FROM part WHERE p_name LIKE '%gear%'),
      |ps AS (
      |  SELECT l_partkey, l_suppkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
      |  FROM lineitem JOIN g ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  GROUP BY l_partkey, l_suppkey),
      |w AS (SELECT l_suppkey, sq, sum(sq) OVER (PARTITION BY l_partkey) AS tot FROM ps)
      |SELECT DISTINCT s_name, n_name
      |FROM w JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE sq * 2 > tot
      |ORDER BY s_name""".stripMargin

  private val q21Oracle =
    """WITH l AS (SELECT l_orderkey, l_suppkey, l_shipdate FROM lineitem),
      |late AS (
      |  SELECT DISTINCT l.l_orderkey, l.l_suppkey
      |  FROM l JOIN orders ON l.l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F' AND l.l_shipdate > o_orderdate + INTERVAL 60 DAY),
      |waiting AS (
      |  SELECT la.l_orderkey, la.l_suppkey
      |  FROM late la
      |  WHERE EXISTS (SELECT 1 FROM l l2
      |      WHERE l2.l_orderkey = la.l_orderkey AND l2.l_suppkey <> la.l_suppkey)
      |    AND NOT EXISTS (SELECT 1 FROM late l3
      |      WHERE l3.l_orderkey = la.l_orderkey AND l3.l_suppkey <> la.l_suppkey))
      |SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM waiting JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin

  private val q22Oracle =
    """WITH a AS (
      |  SELECT CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) / count(*) AS avg_bal
      |  FROM customer WHERE c_acctbal > 0.0)
      |SELECT n_name, CAST(count(*) AS BIGINT) AS numcust,
      |  CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS totacctbal
      |FROM customer, a
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE c_acctbal > avg_bal
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |    AND o_orderdate >= TIMESTAMP '1999-01-01')
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_best_supplier" -> ((s: SparkSession, d: String) => TpchSuite.bestSupplierPerPart(s, d)),
    "q6_forecast_revenue" -> (TpchSuite.forecastRevenue _),
    "q8_market_share" -> ((s: SparkSession, d: String) => TpchSuite.marketShare(s, d)),
    "q10_returned_items" -> ((s: SparkSession, d: String) => TpchSuite.returnedItems(s, d)),
    "q11_important_parts" -> ((s: SparkSession, d: String) => TpchSuite.importantParts(s, d)),
    "q13_order_distribution" -> ((s: SparkSession, d: String) => TpchSuite.orderCountDistribution(s, d)),
    "q14_promo_revenue" -> (TpchSuite.promoRevenue _),
    "q15_top_supplier" -> (TpchSuite.topSupplier _),
    "q16_part_supplier" -> (TpchSuite.partSupplierRelation _),
    "q17_small_qty_revenue" -> ((s: SparkSession, d: String) => TpchSuite.smallQuantityRevenue(s, d)),
    "q19_disjunctive_revenue" -> (TpchSuite.disjunctiveRevenue _),
    "q20_dominant_suppliers" -> ((s: SparkSession, d: String) => TpchSuite.dominantSuppliers(s, d)),
    "q21_waiting_suppliers" -> ((s: SparkSession, d: String) => TpchSuite.waitingSuppliers(s, d)),
    "q22_dormant_customers" -> ((s: SparkSession, d: String) => TpchSuite.dormantCustomers(s, d)))

  val oracles: Map[String, String] = Map(
    "q2_best_supplier" -> q2Oracle,
    "q6_forecast_revenue" -> q6Oracle,
    "q8_market_share" -> q8Oracle,
    "q10_returned_items" -> q10Oracle,
    "q11_important_parts" -> q11Oracle,
    "q13_order_distribution" -> q13Oracle,
    "q14_promo_revenue" -> q14Oracle,
    "q15_top_supplier" -> q15Oracle,
    "q16_part_supplier" -> q16Oracle,
    "q17_small_qty_revenue" -> q17Oracle,
    "q19_disjunctive_revenue" -> q19Oracle,
    "q20_dominant_suppliers" -> q20Oracle,
    "q21_waiting_suppliers" -> q21Oracle,
    "q22_dormant_customers" -> q22Oracle)
}
