package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SCHEMA CONTRACT for the driver-generated tables.
  *
  * The driver has re-encoded a physical column type once already
  * (events.ts: nanos-long → timestamp[us]), which silently broke a
  * whole operator family at analysis time. This suite pins the
  * NORMALIZED schema of every table — as seen through Tables.* — for
  * all three sf dirs, so the next regeneration fails HERE with a
  * one-line diff instead of deep inside an operator; and it proves the
  * normalization helpers fold every known physical encoding to the
  * same logical type and instant.
  */
class TablesSpec extends SparkSpec {

  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1").filter(d => new java.io.File(d).exists())

  // the contract: normalized (name -> type) per table
  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  private def loader(name: String) = name match {
    case "region" => Tables.region _
    case "nation" => Tables.nation _
    case "customer" => Tables.customer _
    case "supplier" => Tables.supplier _
    case "part" => Tables.part _
    case "orders" => Tables.orders _
    case "lineitem" => Tables.lineitem _
    case "events" => Tables.events _
    case "documents" => Tables.documents _
    case "embeddings" => Tables.embeddings _
  }

  test("every table at every sf dir matches the normalized schema contract") {
    assert(sfDirs.nonEmpty)
    for (d <- sfDirs; name <- Tables.all) {
      val got = loader(name)(spark, d).schema
        .map(f => f.name -> f.dataType)
      val want = expected(name).map { case (n, t) => n -> t }
      assert(got == want,
        s"SCHEMA DRIFT in $d/$name.parquet — regenerate-proof the loader " +
          s"(Tables.normalizeTs/normalizeNtz) or update the contract.\n" +
          s"  got:  $got\n  want: $want")
    }
  }

  test("normalizeTs folds all three known ts encodings to the same instants") {
    import spark.implicits._
    // 2024-03-01 12:34:56.789012 UTC, expressed three ways
    val micros = 1709296496789012L
    val asLong = Seq((1L, micros * 1000L)).toDF("id", "ts") // nanos-long
    val asTs = Seq((1L, micros)).toDF("id", "us")
      .select(col("id"), timestamp_micros(col("us")).as("ts"))
    val asNtz = asTs.select(col("id"), col("ts").cast(TimestampNTZType).as("ts"))
    val outs = Seq(asLong, asTs, asNtz).map { df =>
      val n = Tables.normalizeTs(df)
      assert(n.schema("ts").dataType == TimestampType, n.schema.treeString)
      n.select(unix_micros(col("ts"))).head().getLong(0)
    }
    assert(outs.toSet == Set(micros), s"instants diverged: $outs")
  }

  test("normalizeNtz folds all three known encodings to the same wall clock") {
    import spark.implicits._
    val micros = 1709296496789012L
    val asLong = Seq((1L, micros * 1000L)).toDF("id", "d")
    val asTs = Seq((1L, micros)).toDF("id", "us")
      .select(col("id"), timestamp_micros(col("us")).as("d"))
    val asNtz = asTs.select(col("id"), col("d").cast(TimestampNTZType).as("d"))
    val outs = Seq(asLong, asTs, asNtz).map { df =>
      val n = Tables.normalizeNtz(df, "d")
      assert(n.schema("d").dataType == TimestampNTZType, n.schema.treeString)
      n.select(date_format(col("d"), "yyyy-MM-dd HH:mm:ss.SSSSSS")).head().getString(0)
    }
    assert(outs.toSet.size == 1, s"wall clocks diverged: $outs")
    assert(outs.head == "2024-03-01 12:34:56.789012")
  }

  test("unknown ts encodings fail loudly, not silently") {
    import spark.implicits._
    val bad = Seq((1L, "2024-01-01")).toDF("id", "ts")
    val e = intercept[IllegalStateException](Tables.normalizeTs(bad))
    assert(e.getMessage.contains("normalizeTs"))
    val e2 = intercept[IllegalStateException](Tables.normalizeNtz(bad, "ts"))
    assert(e2.getMessage.contains("normalizeNtz"))
  }
}
