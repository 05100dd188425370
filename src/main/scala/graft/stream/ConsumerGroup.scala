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

  /** Balanced capacities for a member set given each member's surviving
    * ownership: every member gets P/N partitions, and the P mod N
    * "+1" slots go to the members that already HOLD the most (ties:
    * lexicographically smallest) — the capacity choice that maximizes
    * how much of the previous assignment can be kept (exchange
    * argument: a +1 slot keeps an extra partition iff its holder
    * already owns more than P/N). */
  def capacities(nPartitions: Int, prevOwned: Map[String, Int],
      members: Seq[String]): Map[String, Int] = {
    // same guard as rangeAssignment/stickyAssignment: an empty group
    // would otherwise die with a bare '/ by zero' below
    require(members.nonEmpty, "a consumer group needs at least one member")
    val n = members.size
    val npp = nPartitions / n
    val extra = nPartitions % n
    val ranked = members.sortBy(m => (-prevOwned.getOrElse(m, 0), m))
    ranked.zipWithIndex.map { case (m, i) =>
      m -> (npp + (if (i < extra) 1 else 0))
    }.toMap
  }

  /** The information-theoretic floor on partition movement for a
    * membership change: any balanced assignment keeps at most
    * Σ_m min(owned(m), cap(m)) partitions, so at least P minus that
    * must move. [[stickyAssignment]] achieves exactly this bound
    * (pinned by ConsumerGroupSpec); the eager [[rangeAssignment]] can
    * exceed it — the gap is what q_rebalance_churn audits. */
  def minMoves(nPartitions: Int, prev: Map[Int, String],
      members: Seq[String]): Int = {
    // mirror stickyAssignment's survivingOwned: ownership only counts
    // within [0, nPartitions) so the floor and the assignor compute
    // from the SAME partition set even if prev mentions stale ids
    // from a since-shrunk topic
    val owned = prev.collect {
        case (p, m) if p < nPartitions && members.contains(m) => m
      }
      .groupBy(identity).view.mapValues(_.size).toMap
    val cap = capacities(nPartitions, owned, members)
    nPartitions - members.map(m => math.min(owned.getOrElse(m, 0), cap(m))).sum
  }

  /** Cooperative (sticky + balanced) rebalance — Kafka's
    * StickyAssignor discipline made deterministic: each surviving
    * member keeps its LOWEST-numbered partitions up to its balanced
    * capacity; everything else (orphans of departed members plus
    * over-capacity excess) is reassigned in ascending partition order,
    * each to the least-loaded member with spare capacity (ties:
    * lexicographically smallest). Moves exactly [[minMoves]]
    * partitions — the provable optimum — where the eager range
    * rebalance may churn partitions between surviving members. */
  def stickyAssignment(nPartitions: Int, prev: Map[Int, String],
      members: Seq[String]): Map[Int, String] = {
    require(members.nonEmpty, "a consumer group needs at least one member")
    require(members.distinct.size == members.size,
      s"duplicate member ids in $members")
    val ms = members.sorted
    val survivingOwned = prev.collect {
      case (p, m) if p < nPartitions && ms.contains(m) => (p, m)
    }
    val ownedCount = survivingOwned.values.groupBy(identity)
      .view.mapValues(_.size).toMap
    val cap = capacities(nPartitions, ownedCount, ms)
    val kept = survivingOwned.groupBy(_._2).flatMap { case (m, ps) =>
      ps.keys.toSeq.sorted.take(cap(m)).map(_ -> m)
    }
    val load = scala.collection.mutable.Map.empty[String, Int] ++
      ms.map(m => m -> kept.count(_._2 == m))
    var asg = kept
    (0 until nPartitions).filterNot(asg.contains).foreach { p =>
      val m = ms.filter(m => load(m) < cap(m)).minBy(m => (load(m), m))
      asg += p -> m
      load(m) += 1
    }
    asg
  }

  /** The group's commit ledger: per-partition highest consumed offset,
    * from any consumed-output frame carrying (key, offset). This is the
    * group-scoped analog of the reference's manual per-message commit
    * (consumer.py:30,179: `enable.auto.commit=False` + explicit
    * `commit()`): offsets belong to the GROUP, not the member, which is
    * what lets a rebalance hand a partition to a new member without
    * re-delivery. Bounded driver state — one long per partition. */
  def commitLedger(consumed: DataFrame, nPartitions: Int): Map[Int, Long] =
    consumed
      .select(partitionOf(col("key"), nPartitions).cast("int").as("pid"),
        col("offset"))
      .groupBy(col("pid")).agg(max(col("offset")).as("committed"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

  /** Member view that RESUMES from the group's commit ledger: owned
    * partitions only, and within each partition only offsets past the
    * committed position. This is the rebalance handoff contract — a
    * member that takes over a partition (or joins fresh) continues
    * where the GROUP left off instead of re-consuming from earliest,
    * so the union of member outputs across generations is
    * exactly-once (ConsumerGroupSpec proves it across a join +
    * rebalance). The committed map is bounded config state compiled
    * into the filter predicate. */
  def memberStreamFrom(spark: SparkSession, topicDir: String,
      nPartitions: Int, members: Seq[String], memberId: String,
      committed: Map[Int, Long]): DataFrame = {
    // one partition-hash evaluation per row: the ledger rides in as a
    // map LITERAL looked up by pid. The previous fold built a nested
    // CASE WHEN with one COPY of the md5 partition hash per committed
    // partition — up to nPartitions hash evaluations per row on
    // interpreted paths. Bounded model state either way (the ledger is
    // partitions-sized), but the lookup is O(1) per row.
    val committedCol =
      if (committed.isEmpty) lit(-1L)
      else coalesce(
        element_at(
          map(committed.toSeq.sortBy(_._1).flatMap { case (p, off) =>
            Seq(lit(p.toLong), lit(off))
          }: _*),
          partitionOf(col("key"), nPartitions)),
        lit(-1L))
    memberStream(spark, topicDir, nPartitions, members, memberId)
      .filter(col("offset") > committedCol)
  }

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
