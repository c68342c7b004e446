package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Tuned for the driver's local[32] harness but with settings that
  * transfer to a real cluster: AQE on (runtime re-plan, skew-join
  * splitting, shuffle coalescing), UTC session time zone (oracle
  * parity), and an explicit shuffle-partition count instead of the
  * default 200 (on a cluster this is sized to 2-3x total cores; the
  * driver env pins it to the local core count).
  */
object Sessions {
  def local(appName: String = "graft", cpus: Int = 4): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      // config-time injection of graft's native expressions (dot_long,
      // winnow_fps, char_entropy): every session derived from this
      // context — including newSession() forks with fresh function
      // registries — resolves them without a runtime register() call,
      // which is how a cluster deployment ships them
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // events.parquet carries TIMESTAMP(NANOS); see Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Conf-scoped child sessions, cached per (SparkContext incarnation,
    * conf set) — repeated builder invocations (bench loops, specs)
    * previously called `newSession()` each time and accumulated child
    * sessions whose listeners/state were never released (r16 advice).
    * Keyed by applicationId@startTime so entries from a stopped
    * context are unreachable (same contract as [[Caches.memo]] and
    * FullTpch.sessionFor). Children share the context and external
    * catalog but carry their own conf/temp-view/function state, so a
    * key's opt-in conf never leaks into the caller's session. */
  private val children =
    new java.util.concurrent.ConcurrentHashMap[String, SparkSession]()
  def childWith(s: SparkSession, confs: Seq[(String, String)]): SparkSession = {
    val sc = s.sparkContext
    val tag = confs.map { case (k, v) => s"$k=$v" }.mkString(";")
    children.computeIfAbsent(s"${sc.applicationId}@${sc.startTime}#$tag", _ => {
      val ss = s.newSession()
      confs.foreach { case (k, v) => ss.conf.set(k, v) }
      ss
    })
  }
}
