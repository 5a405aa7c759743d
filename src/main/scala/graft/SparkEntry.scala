package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps each implemented operator (SURVEY.md §2 / §2.10) to a
  * (SparkSession, sfDir) => DataFrame; `oracleSql` holds the equivalent
  * DuckDB SQL over the same parquet tables. Column names/aliases are
  * deliberately identical on both sides (driver sorts columns by name and
  * hash-compares values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The MERGE upsert — the reference's semantic heart (queries.py:35-48).
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.q3Merge(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_dedup_full" -> (Queries.q1DedupFull _),
    "q2_latest_by_key" -> (Queries.q2LatestByKey _),
    "q3_merge" -> (Queries.q3Merge _),
    "q4_drift_union" -> (Queries.q4DriftUnion _),
    "q5_audit" -> (Queries.q5Audit _),
    "q7_catalog" -> (Queries.q7Catalog _),
    "q8_fanout_merge" -> (Queries.q8Fanout _),
    "q9_agg" -> (Queries.q9Agg _),
    "q10_star_join" -> (Queries.q10StarJoin _),
    "q11_window_topk" -> (Queries.q11WindowTopK _),
  )

  private val mergeOracle: String = {
    val deltaStamp = "TIMESTAMP '2024-02-01 00:00:00'"
    s"""WITH dest AS (
       |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority,
       |         TIMESTAMP '2024-01-01 00:00:00' AS record_loaded_at
       |  FROM orders
       |), delta AS (
       |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus, o_totalprice + 1000.0 AS o_totalprice,
       |         o_orderdate, o_orderpriority, $deltaStamp AS record_loaded_at
       |  FROM orders WHERE o_orderkey % 10 = 3
       |  UNION ALL
       |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority, $deltaStamp
       |  FROM orders WHERE o_orderkey % 10 = 7
       |  UNION ALL
       |  SELECT o_orderkey + 1000000000, o_custkey, 'N', o_totalprice, o_orderdate, o_orderpriority, $deltaStamp
       |  FROM orders WHERE o_orderkey % 10 = 5
       |), joined AS (
       |  SELECT d.o_orderkey AS d_k, d.o_custkey AS d_c, d.o_orderstatus AS d_s, d.o_totalprice AS d_p,
       |         d.o_orderdate AS d_d, d.o_orderpriority AS d_pr, d.record_loaded_at AS d_t,
       |         s.o_orderkey AS s_k, s.o_custkey AS s_c, s.o_orderstatus AS s_s, s.o_totalprice AS s_p,
       |         s.o_orderdate AS s_d, s.o_orderpriority AS s_pr, s.record_loaded_at AS s_t,
       |         (s.o_orderkey IS NOT NULL AND (
       |            d.o_custkey IS DISTINCT FROM s.o_custkey OR
       |            d.o_orderstatus IS DISTINCT FROM s.o_orderstatus OR
       |            d.o_totalprice IS DISTINCT FROM s.o_totalprice OR
       |            d.o_orderdate IS DISTINCT FROM s.o_orderdate OR
       |            d.o_orderpriority IS DISTINCT FROM s.o_orderpriority)) AS take_s
       |  FROM dest d LEFT JOIN delta s ON d.o_orderkey = s.o_orderkey
       |)
       |SELECT CASE WHEN take_s THEN s_k ELSE d_k END AS o_orderkey,
       |       CASE WHEN take_s THEN s_c ELSE d_c END AS o_custkey,
       |       CASE WHEN take_s THEN s_s ELSE d_s END AS o_orderstatus,
       |       CASE WHEN take_s THEN s_p ELSE d_p END AS o_totalprice,
       |       CASE WHEN take_s THEN s_d ELSE d_d END AS o_orderdate,
       |       CASE WHEN take_s THEN s_pr ELSE d_pr END AS o_orderpriority,
       |       CASE WHEN take_s THEN s_t ELSE d_t END AS record_loaded_at
       |FROM joined
       |UNION ALL
       |SELECT s.* FROM delta s WHERE NOT EXISTS (SELECT 1 FROM dest d WHERE d.o_orderkey = s.o_orderkey)
       |""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "q1_dedup_full" -> "SELECT DISTINCT * FROM lineitem",
    "q2_latest_by_key" ->
      """SELECT event_id, ts, user_id, event_type, value, props FROM (
        |  SELECT e.*, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events e
        |) WHERE rn = 1""".stripMargin,
    "q3_merge" -> mergeOracle,
    "q4_drift_union" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |       CAST(NULL AS VARCHAR) AS c_nationkey_string, CAST(NULL AS VARCHAR) AS c_note
        |FROM customer
        |UNION ALL
        |SELECT c_custkey, c_name, CAST(NULL AS INTEGER), c_acctbal, c_mktsegment,
        |       CAST(c_nationkey AS VARCHAR), 'b'
        |FROM customer""".stripMargin,
    "q5_audit" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(count(*) AS BIGINT) AS n_stamped,
        |       CAST(1 AS BIGINT) AS n_stamps
        |FROM customer""".stripMargin,
    "q7_catalog" ->
      """SELECT * FROM (VALUES
        |  ('l_orderkey','bigint',1),('l_partkey','bigint',2),('l_suppkey','bigint',3),
        |  ('l_linenumber','int',4),('l_quantity','double',5),('l_extendedprice','double',6),
        |  ('l_discount','double',7),('l_tax','double',8),('l_returnflag','string',9),
        |  ('l_linestatus','string',10),('l_shipdate','timestamp_ntz',11)
        |) AS t(column_name, data_type, ordinal_position)""".stripMargin,
    "q8_fanout_merge" -> mergeOracle,
    "q9_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       sum(l_quantity) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_price,
        |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |       avg(l_quantity) AS avg_qty,
        |       count(*) AS count_order,
        |       count(DISTINCT l_partkey) AS distinct_parts
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q10_star_join" ->
      """SELECT r_name, n_name, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q11_window_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rk
        |  FROM orders
        |) WHERE rk <= 3""".stripMargin,
  )
}
