package graft.model

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Fixture-schema contract: every `Tables.*` loader must yield exactly this
  * StructType on the driver fixtures. The round-7 incident (the driver
  * regenerated `/root/testdata` and `events.ts` flipped from
  * TIMESTAMP(NANOS)-as-long to TIMESTAMP_NTZ, breaking `unix_micros` call
  * sites two layers downstream) motivates pinning the contract right at the
  * source boundary: a regeneration that drifts any column now fails HERE, in
  * one obvious place, and a deliberate schema change is a one-line diff.
  *
  * Timestamp columns are asserted as plain TimestampType — `Tables.nanosToTs`
  * absorbs all encodings the driver has emitted so far (nanos-as-long,
  * TIMESTAMP_NTZ, adjusted-to-UTC micros).
  */
class SchemaContractSpec extends SparkSpec {

  private def fields(pairs: (String, DataType)*): Seq[(String, DataType)] = pairs

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> fields("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> fields(
      "n_nationkey" -> IntegerType, "n_name" -> StringType, "n_regionkey" -> IntegerType),
    "customer" -> fields(
      "c_custkey" -> LongType, "c_name" -> StringType, "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType),
    "supplier" -> fields(
      "s_suppkey" -> LongType, "s_name" -> StringType, "s_nationkey" -> IntegerType,
      "s_acctbal" -> DoubleType),
    "part" -> fields(
      "p_partkey" -> LongType, "p_name" -> StringType, "p_brand" -> StringType,
      "p_type" -> StringType, "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> fields(
      "o_orderkey" -> LongType, "o_custkey" -> LongType, "o_orderstatus" -> StringType,
      "o_totalprice" -> DoubleType, "o_orderdate" -> TimestampType,
      "o_orderpriority" -> StringType),
    "lineitem" -> fields(
      "l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
      "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampType),
    "events" -> fields(
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType),
    "documents" -> fields(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> fields(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
  )

  private def loaderFor(name: String) = name match {
    case "lineitem"   => Tables.lineitem _
    case "orders"     => Tables.orders _
    case "customer"   => Tables.customer _
    case "supplier"   => Tables.supplier _
    case "part"       => Tables.part _
    case "nation"     => Tables.nation _
    case "region"     => Tables.region _
    case "events"     => Tables.events _
    case "documents"  => Tables.documents _
    case "embeddings" => Tables.embeddings _
  }

  for (name <- Tables.names) {
    test(s"$name loads with the pinned contract schema") {
      val df = loaderFor(name)(spark, sf)
      val got = df.schema.fields.toSeq.map(f => (f.name, normalize(f.dataType)))
      assert(got == expected(name),
        s"fixture drift in $name: got ${df.schema.treeString}")
    }
  }

  /** containsNull/valueContainsNull on arrays is a parquet-writer detail the
    * contract doesn't care about. */
  private def normalize(dt: DataType): DataType = dt match {
    case ArrayType(e, _) => ArrayType(normalize(e))
    case other           => other
  }

  test("events ts is a plain TimestampType whatever the fixture encoding") {
    // The one column with a history of encoding drift — assert it separately
    // so the failure message names the incident class directly.
    assert(Tables.events(spark, sf).schema("ts").dataType == TimestampType,
      "events.ts must normalize to TimestampType at the source boundary " +
        "(see Tables.nanosToTs; round-7 TIMESTAMP_NTZ regression)")
  }
}
