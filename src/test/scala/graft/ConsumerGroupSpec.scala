package graft

import org.apache.spark.sql.functions._

import graft.sources.OrderGen
import graft.stream.{ConsumerGroup, OrderPipeline}

/** Multi-reader topic semantics (consumer.py:116–124's group join,
  * SURVEY.md §2.1 S4): N member streams over one topic directory
  * consume disjoint partition sets that together equal the
  * single-reader run, and membership changes rebalance
  * deterministically. */
class ConsumerGroupSpec extends SparkSpec {
  import spark.implicits._

  test("range assignment is disjoint, total, and member-order independent") {
    for (members <- Seq(Seq("a"), Seq("b", "a"), Seq("c", "a", "b"),
        Seq("d", "b", "a", "c"), Seq("r1", "r0"))) {
      val asg = ConsumerGroup.rangeAssignment(8, members)
      assert(asg.keySet === (0 until 8).toSet)            // total
      assert(asg.values.toSet.subsetOf(members.toSet))    // owners are members
      // order independence: assignment depends on the member SET
      assert(asg === ConsumerGroup.rangeAssignment(8, members.sorted))
      // contiguity: each member's partitions form one contiguous block
      asg.groupBy(_._2).foreach { case (_, ps) =>
        val sorted = ps.keys.toSeq.sorted
        assert(sorted === (sorted.head to sorted.last))
      }
    }
    // first (P mod N) sorted members take the extra partition
    val three = ConsumerGroup.rangeAssignment(8, Seq("c0", "c1", "c2"))
    assert(ConsumerGroup.ownedPartitions(8, Seq("c0", "c1", "c2"), "c0") === Seq(0, 1, 2))
    assert(ConsumerGroup.ownedPartitions(8, Seq("c0", "c1", "c2"), "c1") === Seq(3, 4, 5))
    assert(ConsumerGroup.ownedPartitions(8, Seq("c0", "c1", "c2"), "c2") === Seq(6, 7))
    assert(three(7) === "c2")
    // more members than partitions: trailing members own nothing
    val many = ConsumerGroup.rangeAssignment(2, Seq("a", "b", "c"))
    assert(many === Map(0 -> "a", 1 -> "b"))
  }

  test("two member streams split the topic disjointly; union == single reader") {
    val topicDir = tmpDir("graft-cg-topic")
    OrderGen.writeTopicDir(OrderGen.orders(spark, 60L, "cg"), topicDir)
    val members = Seq("r0", "r1")

    def runMember(id: String): Set[(Long, String)] = {
      val q = ConsumerGroup.memberStream(spark, topicDir, 8, members, id)
        .select(col("offset"), col("key").cast("string").as("oid"))
        .writeStream.format("memory").queryName(s"cg_$id")
        .option("checkpointLocation", tmpDir(s"graft-cg-ckpt-$id")).start()
      q.processAllAvailable(); q.stop()
      spark.table(s"cg_$id").as[(Long, String)].collect().toSet
    }
    val r0 = runMember("r0")
    val r1 = runMember("r1")
    assert(r0.nonEmpty && r1.nonEmpty)        // both actually own data
    assert((r0 & r1) === Set.empty)           // no message read twice
    val single = OrderPipeline.readTopicDir(spark, topicDir)
      .select(col("offset"), col("key").cast("string").as("oid"))
      .writeStream.format("memory").queryName("cg_single")
      .option("checkpointLocation", tmpDir("graft-cg-ckpt-single"))
    val qs = single.start(); qs.processAllAvailable(); qs.stop()
    val all = spark.table("cg_single").as[(Long, String)].collect().toSet
    assert((r0 ++ r1) === all)                // group == single reader
    // ownership matches the assignment function message-for-message
    val owned0 = ConsumerGroup.ownedPartitions(8, members, "r0").toSet
    r0.foreach { case (_, oid) =>
      val p = (BigInt(java.security.MessageDigest.getInstance("MD5")
        .digest(oid.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString, 16) >> 4) % 8
      assert(owned0.contains(p.toInt))
    }
  }

  test("rebalance on member add/remove stays disjoint+total and is flagged in the ledger") {
    val gens = Seq(Seq("c0"), Seq("c0", "c1"), Seq("c0", "c1", "c2"), Seq("c0", "c2"))
    gens.foreach { members =>
      val asg = ConsumerGroup.rangeAssignment(8, members)
      assert(asg.keySet === (0 until 8).toSet)
      members.foreach { m =>
        // every member's filter predicate matches exactly its partitions
        val owned = ConsumerGroup.ownedPartitions(8, members, m)
        assert(owned === asg.collect { case (p, o) if o == m => p }.toSeq.sorted)
      }
    }
    val ledger = ConsumerGroup.assignmentLedger(spark, 8, gens)
      .orderBy(col("generation"), col("pid"))
      .as[(Long, Long, String, Boolean)].collect()
    assert(ledger.length === 32)
    // generation 1 (no predecessor): nothing is "moved"
    assert(ledger.filter(_._1 == 1L).forall(!_._4))
    // c1 joining (gen 2) takes partitions 4-7 from c0 — flagged moved
    assert(ledger.filter(r => r._1 == 2L && r._2 >= 4).forall(r => r._3 == "c1" && r._4))
    assert(ledger.filter(r => r._1 == 2L && r._2 < 4).forall(r => r._3 == "c0" && !r._4))
    // c1 leaving (gen 4): exactly its partitions (3,4,5) move — p3 to
    // c0, p4/p5 to c2; survivors' other partitions stay put
    val g4 = ledger.filter(_._1 == 4L)
    assert(g4.forall(r => r._3 == "c0" || r._3 == "c2"))
    assert(g4.filter(_._4).map(_._2).sorted === Array(3L, 4L, 5L))
  }

  test("rebalance handoff resumes from the group commit ledger — exactly once across generations") {
    val topicDir = tmpDir("graft-cg2-topic")
    def run(name: String, df: org.apache.spark.sql.DataFrame): Set[Long] = {
      val q = df.select(col("key"), col("offset"))
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", tmpDir(s"graft-cg2-ckpt-$name")).start()
      q.processAllAvailable(); q.stop()
      spark.table(name).select("offset").as[Long].collect().toSet
    }
    // generation 1: r0 alone consumes offsets 0..39
    OrderGen.writeTopicDir(OrderGen.orders(spark, 40L, "cg2"), topicDir)
    val gen1 = run("cg2_gen1_r0",
      ConsumerGroup.memberStream(spark, topicDir, 8, Seq("r0"), "r0"))
    assert(gen1 === (0L until 40L).toSet)
    // the GROUP commits its positions: per-partition max consumed offset
    val ledger = ConsumerGroup.commitLedger(spark.table("cg2_gen1_r0"), 8)
    assert(ledger.values.max === 39L)
    // generation 2: r1 joins AND 40 more messages arrive
    OrderGen.writeTopicDir(
      OrderGen.orders(spark, 40L, "cg2b").withColumn("seq", col("seq") + 40L),
      topicDir)
    val members = Seq("r0", "r1")
    val g2r0 = run("cg2_gen2_r0", ConsumerGroup.memberStreamFrom(
      spark, topicDir, 8, members, "r0", ledger))
    val g2r1 = run("cg2_gen2_r1", ConsumerGroup.memberStreamFrom(
      spark, topicDir, 8, members, "r1", ledger))
    // disjoint within the generation; nothing re-consumed (r1 took over
    // partitions from the committed position, not from earliest); union
    // across generations is EVERY offset exactly once
    assert((g2r0 & g2r1) === Set.empty)
    assert(((g2r0 ++ g2r1) & gen1) === Set.empty)
    assert((gen1 ++ g2r0 ++ g2r1) === (0L until 80L).toSet)
  }

  test("property: both assignors are disjoint+total+balanced and sticky is move-optimal") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genCase = for {
      p <- Gen.chooseNum(1, 64)
      n <- Gen.chooseNum(1, 12)
      members = (0 until n).map(i => s"m$i")
      prevN <- Gen.chooseNum(0, 12)
      // previous assignment over a possibly-different member universe
      // (departed members appear as owners of orphaned partitions)
      prev <- Gen.listOfN(p, Gen.chooseNum(0, math.max(prevN, 1)))
        .map(_.zipWithIndex.map { case (o, part) => part -> s"m$o" }.toMap)
      usePrev <- Gen.oneOf(true, false)
    } yield (p, members, if (usePrev) prev else Map.empty[Int, String])
    val prop = Prop.forAll(genCase) { case (p, members, prev) =>
      val range = ConsumerGroup.rangeAssignment(p, members)
      val sticky = ConsumerGroup.stickyAssignment(p, prev, members)
      def total(a: Map[Int, String]) = a.keySet == (0 until p).toSet
      def balanced(a: Map[Int, String]) = {
        val loads = members.map(m => a.values.count(_ == m))
        loads.sum == p && loads.max - loads.min <= 1
      }
      val stickyMoves = (0 until p).count(part =>
        !prev.get(part).contains(sticky(part)))
      val floor = ConsumerGroup.minMoves(p, prev, members)
      total(range) && balanced(range) &&
        total(sticky) && balanced(sticky) &&
        (prev.isEmpty || stickyMoves == floor)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("minMoves and stickyAssignment agree when prev mentions stale partition ids") {
    // a since-shrunk topic: prev owns partitions 0..9 but the group now
    // covers only 4 — both the floor and the assignor must compute
    // ownership from the SAME [0, nPartitions) set, so sticky still
    // achieves exactly the floor
    val prev = (0 until 10).map(p => p -> (if (p % 2 == 0) "a" else "b")).toMap
    val members = Seq("a", "b")
    val P = 4
    val next = ConsumerGroup.stickyAssignment(P, prev, members)
    val moved = (0 until P).count(p =>
      prev.get(p).exists(_ != next(p)) || !prev.contains(p))
    assert(moved === ConsumerGroup.minMoves(P, prev, members),
      s"sticky moved $moved != floor for stale prev $prev -> $members")
    // stale ids must not inflate capacity ranking either: member "a"
    // owns 5 stale-inclusive but only 2 in-range, same as "b"
    assert(ConsumerGroup.minMoves(P, prev, members) === 0)
  }

  test("sticky rebalance is balanced, disjoint+total, and move-optimal") {
    val P = 8
    val chains = Seq(
      Seq(Seq("c0"), Seq("c0", "c1"), Seq("c0", "c1", "c2"), Seq("c0", "c2")),
      Seq(Seq("a", "b", "c"), Seq("b", "c"), Seq("b", "c", "d", "e")),
      Seq(Seq("x"), Seq("x", "y", "z"), Seq("z")))
    chains.foreach { gens =>
      var prev = Map.empty[Int, String]
      gens.foreach { members =>
        val next = ConsumerGroup.stickyAssignment(P, prev, members)
        // disjoint + total + balanced (every member within one of P/N)
        assert(next.keySet === (0 until P).toSet)
        val loads = members.map(m => next.values.count(_ == m))
        assert(loads.sum === P)
        assert(loads.max - loads.min <= 1,
          s"unbalanced sticky assignment for $members: $loads")
        // move-optimality: achieves exactly the minMoves floor
        val moved = (0 until P).count(p =>
          prev.get(p).exists(_ != next(p)) || !prev.contains(p))
        if (prev.nonEmpty)
          assert(moved === ConsumerGroup.minMoves(P, prev, members),
            s"sticky moved $moved != floor for $prev -> $members")
        prev = next
      }
    }
    // the q_rebalance_churn generation chain, on the RANGE chain as the
    // query computes it: eager range pays 1 excess move at generation 3
    // (a join shifts p3 between the surviving c0 and c1)
    val gens = Seq(Seq("c0"), Seq("c0", "c1"), Seq("c0", "c1", "c2"), Seq("c0", "c2"))
    val floors = (1 until gens.size).map { g =>
      ConsumerGroup.minMoves(P, ConsumerGroup.rangeAssignment(P, gens(g - 1)), gens(g))
    }
    val rangeMoves = (1 until gens.size).map { g =>
      val a = ConsumerGroup.rangeAssignment(P, gens(g - 1))
      val b = ConsumerGroup.rangeAssignment(P, gens(g))
      (0 until P).count(p => a(p) != b(p))
    }
    assert(floors === Seq(4, 2, 3))
    assert(rangeMoves === Seq(4, 3, 3))
  }
}
