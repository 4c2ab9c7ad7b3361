package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Filter / predicate / projection operators — SURVEY.md §2.2 (F1–F9).
  *
  * Every predicate here is a plain Catalyst expression, so it is pushed into
  * the parquet scan (`PushedFilters` in the formatted plan) and evaluated
  * against row-group min/max stats before any row is materialized — the
  * Spark-native analogue of the reference letting mongod execute its find
  * filters server-side (`QueryScripts_Final.py:15-21,36-39`). At 100 TB this
  * is the difference between scanning a shard and scanning the corpus.
  */
object Filters {

  /** F1 — conjunctive equality + closed range
    * (`QueryScripts_Final.py:15-21`): category == c AND t1 <= length <= t2.
    * TPC-H shape: returnflag equality + quantity range. */
  def equalityAndRange(lineitem: DataFrame, flag: String, lo: Double, hi: Double): DataFrame =
    lineitem
      .filter(col("l_returnflag") === flag && col("l_quantity").between(lo, hi))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_quantity"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** F2 — closed numeric range (`QueryScripts_Final.py:36-39`). */
  def numericRange(orders: DataFrame, lo: Double, hi: Double): DataFrame =
    orders
      .filter(col("o_totalprice").between(lo, hi))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"))
      .orderBy(col("o_orderkey"))

  /** F3 — dynamic conjunctive predicate builder
    * (`YoutubeNetworkAgg_Final.py:247-273`): a list of *optional* predicates
    * folded with AND; an empty list means no filter. The fold happens at plan
    * time — Catalyst sees one ordinary conjunction and pushes it down whole,
    * so "dynamic" costs nothing at runtime. */
  def dynamicFilter(df: DataFrame, predicates: Seq[Column]): DataFrame =
    predicates.reduceOption(_ && _).map(df.filter).getOrElse(df)

  /** F3 applied — the reference GUI's search form (`guiV5.py:236-252`):
    * optional status equality, optional price bounds, optional priority. */
  def searchOrders(orders: DataFrame,
                   status: Option[String] = None,
                   minPrice: Option[Double] = None,
                   maxPrice: Option[Double] = None,
                   priority: Option[String] = None): DataFrame = {
    val preds = Seq(
      status.map(col("o_orderstatus") === _),
      minPrice.map(col("o_totalprice") >= _),
      maxPrice.map(col("o_totalprice") <= _),
      priority.map(col("o_orderpriority") === _)).flatten
    dynamicFilter(orders, preds)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderpriority"))
      .orderBy(col("o_orderkey"))
  }

  /** F4 — array-length filter (`size(related) >= 5`,
    * `PageRank_Spark_v5.py:61`) — see graph.Edges for the arrayed form; the
    * relational twin keeps orders with >= n lineitems via a group-filter. */
  def ordersWithAtLeastNItems(lineitem: DataFrame, n: Int): DataFrame =
    lineitem
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("items"))
      .filter(col("items") >= n)
      .orderBy(col("l_orderkey"))

  /** F5/F6 — null drop + theta (self-pair) filter
    * (`PageRank_Spark_v5.py:90-91`): used inline by graph.Edges. */
  def dropNullAndSelf(edges: DataFrame): DataFrame =
    edges.na.drop(Seq("dst")).filter(col("src") =!= col("dst"))

  /** F7/F8/F9 — projection + rename + cast-in-projection
    * (`guiV5.py:529-537,547`): narrow select with a renamed id and a cast.
    * The ReadSchema of the scan should shrink to exactly these columns. */
  def projectRenameCast(orders: DataFrame): DataFrame =
    orders
      .select(
        col("o_orderkey").cast("string").as("ID"),
        col("o_totalprice"),
        col("o_orderstatus").as("status"))
      .orderBy(col("ID"))
}
