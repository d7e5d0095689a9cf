package graft.engine

import org.apache.spark.sql.SparkSession

/** Small-file compaction — the table-maintenance pass every long-lived
  * 100 TB dataset needs: streaming ingestion and per-batch sinks leave
  * thousands of KB-scale files whose per-file open/footer cost comes to
  * dominate scan time. Compaction rewrites a directory into files of
  * roughly `targetBytes` (the 128 MB scan-partition sweet spot by
  * default), preserving rows exactly.
  *
  * Sizing uses the INPUT byte size (cheap file listing, no data read) —
  * output files land near the target for similar codecs. repartition()
  * is a full shuffle by design: round-robin rebalancing is what evens
  * out skewed input files; at cluster scale this runs per partition of a
  * date-partitioned table, not over the whole dataset at once.
  */
object Compact {

  /** Rewrite `inDir` (parquet) into `outDir` as ~`targetBytes` files.
    * Returns the number of output data files. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long = 128L * 1024 * 1024): Long = {
    require(targetBytes > 0)
    val conf = spark.sparkContext.hadoopConfiguration
    val in = new org.apache.hadoop.fs.Path(inDir)
    val fs = in.getFileSystem(conf)
    // overwrite mode DELETES outDir before the lazy read of inDir runs —
    // an in-place (or nested) call would destroy the source data.
    // Identity is the FULLY QUALIFIED URI (scheme + authority + path),
    // each path qualified against its OWN filesystem: comparing bare
    // paths would spuriously reject distinct stores with equal paths
    // (s3://a/data vs s3://b/data) and mis-qualify a cross-scheme outDir
    val out = new org.apache.hadoop.fs.Path(outDir)
    val outFs = out.getFileSystem(conf)
    val qIn = fs.makeQualified(in).toUri.toString.stripSuffix("/")
    val qOut = outFs.makeQualified(out).toUri.toString.stripSuffix("/")
    require(qIn != qOut && !qOut.startsWith(qIn + "/") &&
      !qIn.startsWith(qOut + "/"),
      s"outDir must not be inDir or nested with it (in=$qIn out=$qOut)")
    val inputBytes = fs.getContentSummary(in).getLength
    val parts = math.max(1L, (inputBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir)
      .repartition(parts)
      .write.mode("overwrite").parquet(outDir)
    outFs.listStatus(out).count(st => st.getPath.getName.startsWith("part-")).toLong
  }
}
