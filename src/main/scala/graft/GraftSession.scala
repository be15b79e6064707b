package graft

import org.apache.spark.sql.SparkSession

/** Standard session factory: every entry point (tests, Verify, Bench,
  * pipelines) needs the same conf surface — UTC, ns-parquet tolerance,
  * AQE, non-ANSI casts (SafeCasts relies on null-on-garbage), and
  * local-sized shuffle partitioning.
  */
object GraftSession {
  // Catalog tables (bucketing) need a warehouse + embedded metastore;
  // isolate both per-JVM so parallel test JVMs never share Derby locks.
  private lazy val warehouse: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-warehouse").toString
    System.setProperty("derby.system.home", dir)
    dir
  }

  /** Shuffle/AQE tuning shared by every entry point (r12 optimization,
    * guide §2.2 "fewer, larger reduce partitions" + §2.1).
    *
    * - `bypassMergeThreshold=1`: always take the serialized sort-path
    *   shuffle writer (ONE file + index per map task) instead of the
    *   bypass writer's R files per map task. At production reduce
    *   counts (R ≫ 200) the bypass path never applies anyway, so this
    *   aligns the local writer with the at-scale one; locally it
    *   removes R file create/close syscalls per task — measured 4×
    *   on per-task shuffle overhead (160 ms → 40 ms run, 85 ms → 12 ms
    *   CPU per task on a 96-task micro shuffle, ext4 local dirs).
    * - `parallelismFirst=false`: let AQE coalesce post-shuffle
    *   partitions to the advisory SIZE rather than splitting them to
    *   keep every core busy — the guide's recommendation; many
    *   near-empty reduce tasks cost more in fixed per-task overhead
    *   than their parallelism returns.
    * - advisory partition size is SCALE-DEPENDENT, so it is
    *   env-parameterised (`SPARK_GRAFT_ADVISORY_PARTITION`): the local
    *   default 16m keeps sf0.1/SF1 stages parallel enough on one box
    *   while collapsing KB-sized exchanges to one task; production
    *   clusters should run 128m-256m (guide §9).
    */
  def perfConfs: Seq[(String, String)] = Seq(
    "spark.shuffle.sort.bypassMergeThreshold" -> "1",
    "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
      sys.env.getOrElse("SPARK_GRAFT_ADVISORY_PARTITION", "16m"),
    // Let AQE re-optimize CACHED plan builds too (default false for
    // historical compat): the dedup/ANN operators persist their hot
    // intermediate frames, and with this off every persisted build
    // keeps the raw shuffle partition count — locally 32 near-empty
    // partitions per cache, so EVERY downstream cache scan paid 32
    // task launches per stage (measured: 8-10 zero-work 32-task
    // stages of ~150 ms each inside one containment query). With it
    // on, the advisory-size coalescing (above) applies inside cache
    // builds as well, so cached frames carry right-SIZED partitions
    // at any scale. Coalesced reads keep their hash-clustering
    // guarantee, so downstream same-key aggregates stay exchange-free.
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning" -> "true",
    // Whole-stage-codegen compile cache (STATIC conf, default 100
    // entries). Task threads serialize behind CodeGenerator.compile's
    // per-source KeyLock; a multi-stage query has 50-150 codegen units,
    // so at the default size re-running a query evicts its own entries
    // and EVERY stage recompiles with all its tasks parked on the lock
    // (thread dumps: 31/33 task threads in KeyLock.acquireLock under
    // CodeGenerator.compile). 5000 entries lets repeated plans (bench
    // reps, incremental batches, long-lived executors re-running the
    // same pipelines) hit the cache; generated source is id-free with
    // spark.sql.codegen.comments off, so identical plans share entries.
    "spark.sql.codegen.cache.maxEntries" -> "5000")

  def builder(cores: Int = 4): SparkSession.Builder =
    perfConfs.foldLeft(
      SparkSession.builder()
        .config("spark.sql.warehouse.dir", warehouse)
        .master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.ui.enabled", "false")) {
      case (b, (k, v)) => b.config(k, v)
    }

  def get(cores: Int = 4): SparkSession = builder(cores).getOrCreate()
}
