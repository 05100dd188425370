package graft.stream

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Consumer-group partition assignment — the multi-reader half of the
  * reference consumer's group join (consumer.py:116–124:
  * `group.id='order-consumer-group'`, `subscribe(['orders'])`): N
  * cooperating readers split a topic's partitions disjointly, and a
  * membership change (reader added or removed) triggers a rebalance
  * that reassigns partitions for the new generation.
  *
  * Spark mapping. Kafka's group coordinator is a broker-side service
  * that exists because Kafka consumers poll independently and must not
  * double-read. A Spark reader group needs only the DETERMINISTIC
  * ASSIGNMENT FUNCTION: the topic is a shared replayable source, so
  * each reader enforces its own ownership by filtering on its owned
  * partitions — same-generation readers are disjoint and total by
  * construction, with no locks, heartbeats, or coordinator round-trips.
  * This is exactly how Spark's real Kafka connector distributes
  * `KafkaSourceRDD` partitions across executors: assignment is computed,
  * not negotiated.
  *
  * The assignment implements Kafka's RangeAssignor (the default):
  * members sorted lexicographically, contiguous partition blocks, the
  * first (P mod N) members take one extra partition. Message →
  * partition uses the engine's md5/h60 convention over the message key
  * (the default-partitioner `hash(key) % P` analog), replayable in any
  * engine — the same convention every sketch/sampling query shares.
  *
  * At 100 TB nothing here is data-sized: assignments are
  * O(partitions × generations) config state, and the per-reader filter
  * is one codegen'd predicate on the scan.
  */
object ConsumerGroup {

  /** Message partition by md5/h60 over the key bytes — the Kafka
    * default-partitioner analog, engine-portable (DuckDB replay:
    * `CAST('0x' || substr(md5(key), 1, 15) AS BIGINT) % P`). The 60-bit
    * digest is non-negative, so no pmod is needed. */
  def partitionOf(keyBytes: Column, nPartitions: Int): Column =
    conv(substring(md5(keyBytes), 1, 15), 16, 10).cast("long") %
      lit(nPartitions.toLong)

  /** RangeAssignor: partition → member for one generation.
    * Deterministic in the member SET (input order irrelevant). With
    * more members than partitions the trailing members own nothing —
    * Kafka's behavior exactly. */
  def rangeAssignment(nPartitions: Int, members: Seq[String]): Map[Int, String] = {
    require(members.nonEmpty, "a consumer group needs at least one member")
    require(members.distinct.size == members.size,
      s"duplicate member ids in $members")
    val ms = members.sorted
    val n = ms.size
    val npp = nPartitions / n
    val extra = nPartitions % n
    (0 until nPartitions).map { p =>
      val boundary = (npp + 1) * extra
      val i =
        if (p < boundary) p / (npp + 1)
        else extra + (p - boundary) / npp
      p -> ms(i)
    }.toMap
  }

  /** The partitions `memberId` owns in this generation. */
  def ownedPartitions(nPartitions: Int, members: Seq[String],
      memberId: String): Seq[Int] = {
    require(members.contains(memberId),
      s"$memberId is not a member of $members")
    rangeAssignment(nPartitions, members)
      .collect { case (p, m) if m == memberId => p }.toSeq.sorted
  }

  /** Ownership predicate for one member: true iff the message's key
    * hashes into a partition this member owns. */
  def memberFilter(keyBytes: Column, nPartitions: Int, members: Seq[String],
      memberId: String): Column = {
    val owned = ownedPartitions(nPartitions, members, memberId).map(_.toLong)
    partitionOf(keyBytes, nPartitions).isin(owned: _*)
  }

  /** Streaming member view: the shared topic directory filtered to this
    * member's partitions. Running one such stream per member of the
    * SAME generation consumes every message exactly once across the
    * group (disjoint + total by construction of rangeAssignment). */
  def memberStream(spark: SparkSession, topicDir: String, nPartitions: Int,
      members: Seq[String], memberId: String): DataFrame =
    OrderPipeline.readTopicDir(spark, topicDir)
      .filter(memberFilter(col("key"), nPartitions, members, memberId))

  /** Assignment ledger across a sequence of membership generations —
    * the rebalance audit: one row per (generation, partition) with the
    * owner and whether ownership moved vs the previous generation
    * (range rebalances are eager: a membership change can move
    * partitions between SURVIVING members too, which is exactly what
    * this ledger makes visible). Bounded config state, built on the
    * driver. */
  def assignmentLedger(spark: SparkSession, nPartitions: Int,
      generations: Seq[Seq[String]]): DataFrame = {
    import spark.implicits._
    val rows = generations.zipWithIndex.flatMap { case (members, g) =>
      val cur = rangeAssignment(nPartitions, members)
      val prev = if (g == 0) Map.empty[Int, String]
        else rangeAssignment(nPartitions, generations(g - 1))
      (0 until nPartitions).map { p =>
        (g + 1L, p.toLong, cur(p), prev.get(p).exists(_ != cur(p)))
      }
    }
    rows.toDF("generation", "pid", "owner", "moved")
  }
}
