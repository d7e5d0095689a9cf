package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec

/** Pins the two claims q168 makes: the RocksDB provider actually backs
  * the state store (progress metrics say so), and results are identical
  * to the default provider — provider choice is config, not semantics. */
class StreamingRocksDbSpec extends SparkSpec {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def runCounts(): (String, Seq[(Long, Long)]) = {
    import spark.implicits._
    val src = Files.createTempDirectory("rocks_src_").toString
    (1L to 100L).map(i => (i % 7, i)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(src)
    val name = "rocks_" + System.nanoTime()
    val q = spark.readStream
      .schema(spark.read.parquet(src).schema).parquet(src)
      .groupBy($"k").agg(count(lit(1)).as("n"))
      .writeStream
      .outputMode(OutputMode.Complete())
      .format("memory").queryName(name)
      .option("checkpointLocation",
        Files.createTempDirectory("rocks_ckpt_").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val metrics = Option(q.lastProgress).map(_.json).getOrElse("")
    val rows = spark.table(name).as[(Long, Long)].collect().sorted.toSeq
    (metrics, rows)
  }

  test("RocksDB provider backs the state store and matches default results") {
    val prev = spark.conf.getOption(ProviderKey)
    val (defaultMetrics, defaultRows) = runCounts()
    assert(!defaultMetrics.contains("rocksdb"))
    try {
      spark.conf.set(ProviderKey, RocksDb)
      val (metrics, rows) = runCounts()
      // provider is live: RocksDB custom metrics appear in progress
      assert(metrics.contains("rocksdb"), s"no rocksdb metrics in $metrics")
      // semantics unchanged: same counts as the default provider
      assert(rows == defaultRows)
      assert(rows.map(_._2).sum == 100L)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }
}
