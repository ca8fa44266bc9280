package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerBlockUpdated}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Constrained-memory soak for the dedup pipeline. Run with a small
  * heap so the MEMORY_AND_DISK shingle cache actually spills:
  *
  * {{{
  * sbt 'set run/javaOptions ++= Seq("-Xmx1g")' \
  *     'runMain graft.tools.DedupSoak /root/testdata/sf0.1 8'
  * }}}
  *
  * The optional second argument replicates the corpus k-fold under
  * shifted doc ids (identical texts), inflating both the cached
  * shingle frame past the constrained heap (forcing MEMORY_AND_DISK
  * blocks to disk) and the duplicate-pair graph (every doc becomes a
  * k-clique across replicas), so the distributed label loop runs at a
  * pair volume the driver shortcut would refuse.
  *
  * Exercises the two at-scale code paths the normal gate cannot reach:
  *  - the MEMORY_AND_DISK spill of the cached shingle frame (tracked
  *    via block-update events; reported as `disk_spill_bytes`);
  *  - the DISTRIBUTED min-label canonicalize loop (`driverGraphLimit
  *    = 0` disables the driver union-find shortcut entirely), whose
  *    labels are then cross-checked against the driver union-find on
  *    the identical pair set.
  *
  * Prints one JSON line; exits non-zero on any label mismatch. A run
  * that OOMs fails loudly by construction.
  */
object DedupSoak {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the soak's point is surviving on a small heap: no broadcast
      // builds (driver-side hash maps), sort-merge joins only — the
      // same posture a 100 TB job takes with big intermediates
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      // shrink the unified pool so execution pressure must evict the
      // MEMORY_AND_DISK cache to disk instead of keeping everything
      // resident — the at-scale condition this soak exists to hit
      .config("spark.memory.fraction", "0.3")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var diskBytes = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onBlockUpdated(b: SparkListenerBlockUpdated): Unit =
        if (b.blockUpdatedInfo.diskSize > 0) diskBytes += b.blockUpdatedInfo.diskSize
    })
    val replicas = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    val base = graft.core.Tables.documents(spark, sfDir)
    val docs = (1 until replicas).foldLeft(base) { (acc, k) =>
      acc.unionByName(base.withColumn("doc_id",
        col("doc_id") + lit(k.toLong * 10000000L)))
    }
    val pairs = graft.operators.Dedup
      .minhashDupPairs(docs, "doc_id", "text").cache()
    val nPairs = pairs.count()
    val dist = graft.operators.Dedup
      .canonicalize(pairs, driverGraphLimit = 0L).cache()

    // Distributed correctness invariants (no driver graph, any size):
    //  1. fixed point — no pair edge connects two different labels;
    //  2. every label is a ROOT — a canonical_id never itself appears
    //     as a relabeled doc_id.
    // Together with min-propagation's labels-are-member-ids property,
    // these pin the output without collecting the graph.
    def side(k: String, out: String) = dist
      .select(col("doc_id").as(k), col("canonical_id").as(out))
    val labeled = pairs.select(col("i"), col("j"))
      .join(side("i", "li"), Seq("i"), "left")
      .join(side("j", "lj"), Seq("j"), "left")
      .select(coalesce(col("li"), col("i")).as("a"),
        coalesce(col("lj"), col("j")).as("b"))
    val notFixed = labeled.where(col("a") =!= col("b")).count()
    val badRoots = dist.select(col("canonical_id").as("doc_id")).distinct()
      .join(dist, Seq("doc_id"), "leftsemi").count()

    // exact cross-check vs the driver union-find where collecting the
    // graph is still safe on this heap
    val drvMismatch =
      if (nPairs > 1000000L) -1L
      else {
        val drv = graft.operators.Dedup.canonicalize(pairs,
          driverGraphLimit = Long.MaxValue)
        dist.as("a").join(drv.as("b"), Seq("doc_id"), "full")
          .where(not(col("a.canonical_id") <=> col("b.canonical_id"))).count()
      }
    val heapMax = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    println(s"""{"sf_dir":"$sfDir","replicas":$replicas,"pairs":$nPairs,"not_fixed_point":$notFixed,"non_root_labels":$badRoots,"driver_crosscheck_mismatches":$drvMismatch,"heap_max_mb":$heapMax,"disk_spill_bytes":$diskBytes}""")
    spark.stop()
    if (notFixed != 0 || badRoots != 0 || drvMismatch > 0) sys.exit(1)
  }
}
