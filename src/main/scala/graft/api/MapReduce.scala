package graft.api

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions.col

/** Typed compatibility layer for the reference's user-facing paradigm: a
  * map function emitting (key, value) pairs and a reduce function
  * consuming one whole group (/root/reference/README.txt:254-291).
  *
  * Contract preserved from the reference:
  *  - map may emit 0..N pairs per input (empty emission drops the row,
  *    /root/reference/mapper.py:59-62);
  *  - reduce receives the ENTIRE group and may emit 0..N outputs of any
  *    shape (/root/reference/reducer.py:73-93);
  *  - **secondary sort**: the group's values arrive sorted ascending,
  *    because the reference's heap orders whole (key, value) items
  *    (/root/reference/disk_sort.py:33,55,66-74). Spark's
  *    `groupByKey(...).flatMapGroups` does NOT order the iterator, so this
  *    is implemented as repartition(key) + sortWithinPartitions(key, value)
  *    + run detection in mapPartitions — one hash shuffle, sort inside the
  *    post-shuffle stage (Spark's UnsafeExternalSorter spills exactly like
  *    the reference's DiskSort, /root/reference/disk_sort.py:32-97, but
  *    with memory-manager accounting instead of sampled item sizes).
  *  - identity reduce = pure partition-by job → `partitionByKey`.
  *
  * Scale: group values stream through the iterator (never materialized —
  * the reference needed DiskList, /root/reference/disk_list.py, for groups
  * bigger than RAM; here the sorted run is already on disk/spill and the
  * iterator just walks it). Auxiliary data = a real broadcast variable.
  */
object MapReduce {

  /** Full map → shuffle → sorted-group reduce pipeline. */
  def run[I, K, V, O: Encoder](
      input: Dataset[I],
      mapFn: I => IterableOnce[(K, V)],
      reduceFn: (K, Iterator[V]) => IterableOnce[O],
      numPartitions: Option[Int] = None)(
      implicit kvEnc: Encoder[(K, V)]): Dataset[O] = {
    val mapped = input.flatMap(mapFn)
    val parted = numPartitions match {
      case Some(n) => mapped.repartition(n, col("_1"))
      case None => mapped.repartition(col("_1"))
    }
    parted
      .sortWithinPartitions(col("_1"), col("_2"))
      .mapPartitions(it => groupRuns(it).flatMap {
        case (k, vs) => reduceFn(k, vs).iterator
      })
  }

  /** Identity reduce = hash-partition the pairs by key and leave them
    * value-sorted within partitions (the reference's shuffle-only job,
    * /root/reference/README.txt:286-291 template returning the group). */
  def partitionByKey[K, V](pairs: Dataset[(K, V)], numPartitions: Int)(
      implicit kvEnc: Encoder[(K, V)]): Dataset[(K, V)] =
    pairs.repartition(numPartitions, col("_1"))
      .sortWithinPartitions(col("_1"), col("_2"))

  /** Deterministic file-granularity downsample — the reference samples
    * whole input FILES, not rows (/root/reference/mapper.py:103-108), but
    * with an unseeded RNG; this variant keys off a stable hash of the
    * file name so runs are reproducible. Row-level sampling is
    * `ds.sample(fraction, seed)`. */
  def downsampleFiles(paths: Seq[String], fraction: Double): Seq[String] =
    paths.filter { p =>
      val h = java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(p.getBytes("UTF-8")).take(7).map("%02x".format(_)).mkString,
        16)
      (h % 10000) < (fraction * 10000).toLong
    }

  /** Broadcast auxiliary data — the reference ships one JSON doc to every
    * worker (/root/reference/mapper.py:150-157); on Spark it is a real
    * broadcast variable (torrent-distributed, deserialized once per
    * executor, not once per task). */
  def broadcastAux[A](spark: SparkSession, aux: A)(
      implicit ct: scala.reflect.ClassTag[A]) =
    spark.sparkContext.broadcast(aux)

  /** Lazily split a (key, value)-sorted iterator into maximal runs of
    * equal key. Each group's value iterator MUST be consumed before the
    * next group is requested (run() drains it defensively). */
  private[api] def groupRuns[K, V](it: Iterator[(K, V)]): Iterator[(K, Iterator[V])] =
    new Iterator[(K, Iterator[V])] {
      private val buf = it.buffered
      private var current: Iterator[V] = Iterator.empty

      def hasNext: Boolean = {
        while (current.hasNext) current.next() // drain previous group
        buf.hasNext
      }

      def next(): (K, Iterator[V]) = {
        if (!hasNext) throw new NoSuchElementException
        val key = buf.head._1
        val group = new Iterator[V] {
          def hasNext: Boolean = buf.hasNext && buf.head._1 == key
          def next(): V = {
            if (!hasNext) throw new NoSuchElementException
            buf.next()._2
          }
        }
        current = group
        (key, group)
      }
    }
}
