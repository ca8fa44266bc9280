package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard tuning.
  *
  * Scale posture: these settings are the local[N] analogue of what the
  * engine would set on a 1000-executor cluster — AQE on (runtime shuffle
  * coalescing + skew-join splitting), shuffle partitions sized to the
  * parallelism actually available instead of the 200 default, UTC
  * session time zone (the reference normalizes all timestamps to UTC,
  * /root/reference/internal/services/tasks/tasks.go:91-104).
  */
object GraftSession {

  def builder(cores: String): SparkSession.Builder =
    SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", if (cores == "*") "32" else cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // Self-sizing shuffles across scale decades: start every shuffle
      // wide (256 partitions) and let AQE coalesce DOWN to the 64 MB
      // advisory size. `shuffle.partitions` alone pins reduce-task
      // state to data/32 — fine at sf0.1, but a 30× corpus then hands
      // each task 30× the partial-agg/sort state and the decade sweep
      // measured the resulting spill/GC cliff (a4_dedup_by_pk 9.3× for
      // 3× data at sf30). AQE cannot SPLIT an under-partitioned
      // non-skew shuffle, only merge an over-partitioned one — so the
      // initial number must be the high-water mark.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      // Persisted plans bypass AQE coalescing by default and would
      // materialize at the full 256-wide initial width — at a small
      // corpus that is 256 near-empty cached partitions taxing every
      // downstream stage (measured: the sf0.1 dedup pipelines, whose
      // pair graphs are cached, ran 2× slower; letting AQE re-plan
      // cached output restored r4 parity with the start-wide config
      // intact). At scale the cache simply materializes at the
      // AQE-coalesced width it would have had uncached.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  /** Local session for tests and ad-hoc runs. */
  def local(cores: String = "*"): SparkSession = builder(cores).getOrCreate()
}
