package graft

import org.apache.spark.sql.functions._

import graft.avro.{functions => A, FromAvroOcf}
import graft.model.Schemas
import graft.ops.ScalablePrefix
import graft.plans.CodecRoundTripElimination

/** Catalyst extension machinery: round-trip elimination rule and the
  * distributed two-pass prefix aggregate (scale path of A1). */
class PlansSpec extends SparkSpec {
  import spark.implicits._

  test("optimizer rule erases from_avro_ocf(to_avro_ocf(x))") {
    // literal fields -> non-nullable struct, matching the schema's
    // non-null Avro fields (the rule's nullability guard requires it)
    val df = Seq(1).toDF("i")
      .select(A.from_avro_ocf(
        A.to_avro_ocf(struct(lit("a").as("orderId"), lit("p").as("product"),
          lit(1.5f).as("price")), Schemas.orderAvroJson),
        Schemas.orderAvroJson).as("o"))
    val analyzed = df.queryExecution.analyzed
    assert(analyzed.expressions.exists(_.exists(_.isInstanceOf[FromAvroOcf])))
    val optimized = CodecRoundTripElimination(analyzed)
    assert(!optimized.expressions.exists(_.exists(_.isInstanceOf[FromAvroOcf])))
    // runtime injection path (same rule object Catalyst would run)
    spark.experimental.extraOptimizations = Seq(CodecRoundTripElimination)
    try {
      assert(!df.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[FromAvroOcf])))
      assert(df.select($"o.price").head().getFloat(0) === 1.5f)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("rule keeps REORDERED same-typed structs (erasure would silently swap fields)") {
    // orderId/product are both strings: structurally equal to the
    // decoded type in either order, so a name-blind guard would erase
    // this pair — converting the codec's loud "reorder the struct"
    // error into silently swapped columns
    val df = Seq(1).toDF("i")
      .select(A.from_avro_ocf(
        A.to_avro_ocf(struct(lit("p").as("product"), lit("a").as("orderId"),
          lit(1.5f).as("price")), Schemas.orderAvroJson),
        Schemas.orderAvroJson).as("o"))
    val optimized = CodecRoundTripElimination(df.queryExecution.analyzed)
    assert(optimized.expressions.exists(_.exists(_.isInstanceOf[FromAvroOcf])),
      "reordered struct must NOT be erased")
    // and the kept codec pair fails loudly at encode time, as designed
    val e = intercept[Exception] { df.collect() }
    def rootMsg(t: Throwable): String =
      if (t.getCause == null) String.valueOf(t.getMessage)
      else rootMsg(t.getCause) + String.valueOf(t.getMessage)
    assert(rootMsg(e).contains("POSITION") || e.toString.contains("POSITION"))
  }

  test("rule keeps pairs whose nullable child fields lack an Avro null union") {
    // encoding a null orderId would THROW at runtime (non-null Avro
    // field); eliminating the pair would silently pass the null through,
    // so the rule must keep it
    val df = Seq(("a", "p", 1.5f)).toDF("orderId", "product", "price")
      .select(A.from_avro_ocf(
        A.to_avro_ocf(struct($"orderId", $"product", $"price"), Schemas.orderAvroJson),
        Schemas.orderAvroJson).as("o"))
    val optimized = CodecRoundTripElimination(df.queryExecution.analyzed)
    assert(optimized.expressions.exists(_.exists(_.isInstanceOf[FromAvroOcf])))
  }

  test("rule erases pairs where the Avro field is a [null, T] union") {
    val nullableSchema =
      """{"type":"record","namespace":"com.assignment","name":"OrderN","fields":[
        |{"name":"orderId","type":["null","string"]},
        |{"name":"product","type":["null","string"]},
        |{"name":"price","type":["null","float"]}]}""".stripMargin.replace("\n", "")
    val df = Seq(("a", "p", Option(1.5f))).toDF("orderId", "product", "price")
      .select(A.from_avro_ocf(
        A.to_avro_ocf(struct($"orderId", $"product", $"price"), nullableSchema),
        nullableSchema).as("o"))
    val optimized = CodecRoundTripElimination(df.queryExecution.analyzed)
    assert(!optimized.expressions.exists(_.exists(_.isInstanceOf[FromAvroOcf])))
  }

  test("rule also erases raw-datum round trips") {
    import graft.avro.FromAvroDatum
    val df = Seq(1).toDF("i")
      .select(A.from_avro_datum(
        A.to_avro_datum(struct(lit("a").as("orderId"), lit("p").as("product"),
          lit(1.5f).as("price")), Schemas.orderAvroJson),
        Schemas.orderAvroJson).as("o"))
    val analyzed = df.queryExecution.analyzed
    assert(analyzed.expressions.exists(_.exists(_.isInstanceOf[FromAvroDatum])))
    val optimized = CodecRoundTripElimination(analyzed)
    assert(!optimized.expressions.exists(_.exists(_.isInstanceOf[FromAvroDatum])))
  }

  test("rule keeps codec pairs with mismatched schemas") {
    val widened = Schemas.orderAvroJson.replace("\"type\":\"float\"", "\"type\":\"double\"")
    val df = Seq(("a", "p", 1.5f)).toDF("orderId", "product", "price")
      .select(A.from_avro_ocf(
        A.to_avro_ocf(struct($"orderId", $"product", $"price"), Schemas.orderAvroJson),
        widened).as("o"))
    val optimized = CodecRoundTripElimination(df.queryExecution.analyzed)
    assert(optimized.expressions.exists(_.exists(_.isInstanceOf[FromAvroOcf])))
  }

  test("two-pass prefix sum equals the window formulation") {
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(0, 10000)
      .select($"id".as("k"), (($"id" * 7919) % 1000).as("v"))
    val w = Window.orderBy($"k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df.select($"k", count(lit(1)).over(w).as("run_cnt"),
      sum($"v").over(w).as("run_sum")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val got = ScalablePrefix.runningSum(spark, df, "k", "v", numPartitions = 7)
      .select($"k", $"run_cnt", $"run_sum").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got === expected)
  }
}
