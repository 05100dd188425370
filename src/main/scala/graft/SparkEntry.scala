package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.avro.functions.{from_avro_ocf, to_avro_ocf}
import graft.llm.{Dedup, Multimodal, Similarity, TextOps}
import graft.model.Schemas
import graft.ops.{Analytics, Router}

/** Driver contract — one entry per implemented operator (SURVEY.md §2),
  * each paired with DuckDB oracle SQL over the same parquet tables.
  *
  * Determinism policy (the driver hash-compares values):
  *  - every query ends with an ORDER BY on a unique key;
  *  - no floating-point value is ever produced by an order-dependent
  *    reduction: monetary sums run in integer cents
  *    (`floor(price*100 + 0.5)` — pure IEEE arithmetic, identical in
  *    Spark and DuckDB), then divide back to doubles;
  *  - aliases match the oracle SQL exactly (driver sorts columns by name).
  */
object SparkEntry
    extends QueryShared
    with ParityQueries
    with GraphQueries
    with LlmQueries1
    with LlmQueries2
    with PipelineQueries
    with StatsQueries
    with TimeSeriesQueries
    with WarehouseQueries1
    with WarehouseQueries2
    with WarehouseQueries3 {

  /** Flagship: the reference's per-message running aggregate trace
    * (A1, consumer.py:166-176) as a deterministic window query. */
  def entry(spark: SparkSession): DataFrame =
    qRunningAvg(spark, "/root/testdata/sf0.001")

  /** Register every dataset table as a temp view so users can drive the
    * engine through `spark.sql(...)` directly (the DataFrame DSL and
    * SQL are the same Catalyst plans; no custom parser needed).
    * `events` needs the nanos-as-long conf (see `events` below), set
    * before its scan is planned. */
  def registerTables(s: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { n =>
      t(s, dir, n).createOrReplaceTempView(n)
    }
    events(s, dir).createOrReplaceTempView("events")
  }

  /** One-time physical-layout preparation for a dataset dir: builds the
    * bucketed table copies q_bucketed_join reads. Benchmark harnesses
    * call this during warmup so the timed pass measures the co-located
    * join, not the layout write — the same convention as excluding
    * index builds from steady-state query timing. (Building the query
    * runs ensureBucketed eagerly; no action needed.) */
  def prepareLayouts(s: SparkSession, dir: String): Unit = {
    qBucketedJoin(s, dir)
    ()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    parityQueryMap ++
    graphQueryMap ++
    llm1QueryMap ++
    llm2QueryMap ++
    pipelineQueryMap ++
    statsQueryMap ++
    timeSeriesQueryMap ++
    warehouse1QueryMap ++
    warehouse2QueryMap ++
    warehouse3QueryMap

  def oracleSql: Map[String, String] =
    parityOracleMap ++
    graphOracleMap ++
    llm1OracleMap ++
    llm2OracleMap ++
    pipelineOracleMap ++
    statsOracleMap ++
    timeSeriesOracleMap ++
    warehouse1OracleMap ++
    warehouse2OracleMap ++
    warehouse3OracleMap

}
