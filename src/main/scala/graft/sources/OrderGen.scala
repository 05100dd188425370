package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.avro.functions.to_avro_ocf
import graft.model.Schemas

/** The reference producer (EP1) as a deterministic, distributed source
  * (SURVEY.md §2.1 S1-S3, producer.py:118-145).
  *
  * producer.py draws uuid4 ids, two-word Faker products, and
  * uniform(5.0, 1500.0) prices; here every field is a pure function of
  * (seed, index) via md5, so runs are reproducible, parallelizable from
  * `spark.range` (no driver-side loop), and replayable by the DuckDB
  * oracle. Prices are exact cents in [5.00, 1500.00] matching the
  * producer's range.
  */
object OrderGen {

  /** Two-word product vocabulary (the Faker-words analog). */
  val Words: Seq[String] = Seq(
    "Amber", "Basalt", "Cedar", "Delta", "Ember", "Falcon", "Granite",
    "Harbor", "Indigo", "Juniper", "Kestrel", "Lumen", "Maple", "Nimbus",
    "Onyx", "Pine")

  /** n deterministic orders: (order_id uuid-shaped, product, price). */
  def orders(spark: SparkSession, n: Long, seed: String): DataFrame = {
    val h = md5(concat(lit(s"$seed|"), col("id").cast("string")).cast("binary"))
    val w1 = conv(substring(h, 1, 4), 16, 10).cast("long") % Words.length
    val w2 = conv(substring(h, 5, 4), 16, 10).cast("long") % Words.length
    val cents = conv(substring(h, 9, 8), 16, 10).cast("long") % 149501L + 500L
    spark.range(n).select(
      col("id").as("seq"),
      concat_ws("-",
        substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
        substring(h, 17, 4), substring(h, 21, 12)).as("order_id"),
      concat_ws(" ",
        element_at(array(Words.map(lit): _*), (w1 + 1).cast("int")),
        element_at(array(Words.map(lit): _*), (w2 + 1).cast("int"))).as("product"),
      (cents / 100.0).as("price"))
  }

  /** Kafka-shaped envelopes: value = Avro OCF bytes, key = UTF-8 order
    * id, offset = sequence (producer.py:137-142 produce call shape). */
  def toEnvelopes(orderDf: DataFrame): DataFrame =
    orderDf.select(
      encode(col("order_id"), "UTF-8").as("key"),
      to_avro_ocf(struct(
        col("order_id").as("orderId"),
        col("product"),
        col("price").cast("float").as("price")), Schemas.orderAvroJson).as("value"),
      lit(Schemas.OrdersTopic).as("topic"),
      lit(0).as("partition"),
      col("seq").as("offset"),
      timestamp_seconds(lit(1700000000L) + col("seq")).as("timestamp"),
      array().cast(Schemas.envelope("headers").dataType).as("headers"))

  /** The producer's send+flush: append envelopes to a topic directory
    * (the file-source seam consumed by OrderPipeline.readTopicDir). */
  def writeTopicDir(orderDf: DataFrame, topicDir: String): Unit =
    toEnvelopes(orderDf).write.mode("append").parquet(topicDir)
}
