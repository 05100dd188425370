package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway dev profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val descs = new java.util.concurrent.ConcurrentLinkedQueue[String]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        descs.add(Option(js.properties)
          .map(_.getProperty("spark.job.description", "?")).getOrElse("?") +
          " | stages=" + js.stageInfos.map(_.name).mkString(";").take(120))
      }
    })
    val dir = "/root/testdata/sf0.1"
    spark.read.parquet(s"$dir/lineitem.parquet").count()
    jobs.set(0); descs.clear()
    val names = if (args.nonEmpty) args.toSeq else Seq("q_lof")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, dir)
      val t1 = System.nanoTime()
      println(f"[scratch] $n construct ${(t1 - t0) / 1e9}%.3f s, jobs=${jobs.get}")
      import scala.jdk.CollectionConverters._
      descs.asScala.foreach(d => println(s"[scratch]   job: $d"))
      jobs.set(0); descs.clear()
      df.count()
      println(f"[scratch] $n exec jobs=${jobs.get}")
    }
    spark.stop()
  }
}
