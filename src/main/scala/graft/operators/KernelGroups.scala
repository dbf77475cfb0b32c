package graft.operators

import scala.reflect.ClassTag

import org.apache.spark.HashPartitioner
import org.apache.spark.sql.{Dataset, Encoder}

/** Fixed-width per-group kernel execution (round-15 optimization).
  *
  * The engine's container/codec operators run heavy CPU kernels per
  * group (one container's mux → demux → decode round-trip) behind a
  * byte-light exchange: at sf0.1 the m27 matrix kernel is ~10 s of CPU
  * behind a ~1.5 MB shuffle. `Dataset.groupByKey` routes that exchange
  * through AQE, whose partition coalescing is a BYTES heuristic
  * (`minPartitionSize`, default 1 MiB) — it packed the whole kernel
  * family onto 1–2 tasks (m27 measured wall 10.6 s ≈ task-time 10.4 s:
  * parallelism 1.0, guide §2.5's skew-by-coalescing in its purest
  * form). Lowering the floor session-wide was measured and rejected:
  * it un-serializes the kernels but multiplies per-task fixed costs
  * (codegen instantiation, hash-table allocs) across every OTHER
  * query's byte-light exchange — the round-7 width lesson
  * (`Tables.spread`) applied to shuffles.
  *
  * This helper moves ONLY the kernel exchange out of AQE's reach: an
  * RDD `groupBy` with an explicit [[HashPartitioner]] at cluster width
  * (`defaultParallelism`), so the CPU-dense stage always spreads
  * across the cluster regardless of its byte size, while every
  * relational exchange keeps AQE's byte-based coalescing. The common
  * modular keys (`user_id % 32`) map 1:1 onto partitions (Long
  * hashCode is the value for small ids), so there is no
  * collision-skew. Results are unchanged: the kernels are
  * order-insensitive per group (each sorts its group internally —
  * required already, since `flatMapGroups` arrival order was never
  * deterministic), and group→partition placement affects no value.
  *
  * At 100 TB the exchange carries the same rows it always did (group
  * keys and sample metadata, never decoded payloads); width =
  * `defaultParallelism` scales with the cluster, not with a local
  * constant.
  */
object KernelGroups {

  /** `rows.groupByKey(key).flatMapGroups(fn)` at explicit cluster
    * width. */
  def flatMapKernel[I, K: ClassTag, O: Encoder: ClassTag](rows: Dataset[I])(
      key: I => K)(fn: (K, Iterator[I]) => IterableOnce[O]): Dataset[O] = {
    val s = rows.sparkSession
    val w = s.sparkContext.defaultParallelism
    s.createDataset(
      rows.rdd.groupBy(key, new HashPartitioner(w))
        .flatMap { case (k, it) => fn(k, it.iterator) })
  }

  /** `rows.groupByKey(key).mapGroups(fn)` at explicit cluster width. */
  def mapKernel[I, K: ClassTag, O: Encoder: ClassTag](rows: Dataset[I])(
      key: I => K)(fn: (K, Iterator[I]) => O): Dataset[O] =
    flatMapKernel(rows)(key)((k, it) => Iterator.single(fn(k, it)))
}
