package graft

import org.scalatest.funsuite.AnyFunSuite

/** Reader contract for every driver table: the columns each operator
  * family builds on. A testdata or reader regression (a renamed column,
  * the nanos-timestamp handling in Tables.events, a dropped rebalance)
  * fails here with a named column, not twenty queries deep.
  */
class TablesContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private val expected = Map(
    "region" -> Set("r_regionkey", "r_name"),
    "nation" -> Set("n_nationkey", "n_name", "n_regionkey"),
    "customer" -> Set("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment"),
    "supplier" -> Set("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part" -> Set("p_partkey", "p_name", "p_brand", "p_type", "p_size",
      "p_retailprice"),
    "orders" -> Set("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority"),
    "lineitem" -> Set("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
      "l_linestatus", "l_shipdate"),
    "events" -> Set("event_id", "ts", "user_id", "event_type", "value", "props"),
    "documents" -> Set("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Set("vec_id", "embedding", "label"))

  test("every table loads with its contract columns and at least one row") {
    expected.foreach { case (name, cols) =>
      val df = name match {
        case "events" => Tables.events(spark, sf)
        case "documents" => Tables.documents(spark, sf)
        case "embeddings" => Tables.embeddings(spark, sf)
        case other => Tables.table(spark, sf, other)
      }
      assert(df.columns.toSet == cols, s"$name columns drifted")
      assert(df.limit(1).count() == 1, s"$name is empty")
    }
    // the nanos path specifically: events.ts must arrive as a timestamp
    assert(Tables.events(spark, sf).schema("ts").dataType.typeName == "timestamp")
  }
}
