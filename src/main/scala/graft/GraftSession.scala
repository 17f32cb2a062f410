package graft

import org.apache.spark.sql.SparkSession

/** Library entry point: a SparkSession configured the way the engine
  * expects — extensions registered, AQE + skew-join on, shuffle
  * parallelism sized to the core count (not Spark's default 200, which
  * at local scale just manufactures tiny tasks).
  */
object GraftSession {

  def builder(master: String, cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")

  // ExecutionListenerManager does not dedup: guard against stacking the
  // metrics logger when local() is called twice on a reused session
  // (every [observed] line would then print once per registration)
  private val observedRegistered =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]))

  def local(cores: Int = Runtime.getRuntime.availableProcessors): SparkSession = {
    val s = builder(s"local[$cores]", cores).getOrCreate()
    // getOrCreate may have returned a pre-existing session built without
    // our extensions — make the native functions available regardless
    graft.plans.GraftExtensions.install(s)
    if (observedRegistered.add(s)) s.listenerManager.register(ObservedMetricsLogger)
    s
  }

  /** Prints Dataset `observe` metrics to stderr after each action — the
    * logged-drop channel for scale safety caps (e.g. q52's per-bucket
    * candidate cap): a cap engaging is visible in the run log instead of
    * silently truncating output. */
  private object ObservedMetricsLogger
      extends org.apache.spark.sql.util.QueryExecutionListener {
    override def onSuccess(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution,
        durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (name, row) =>
        System.err.println(s"[observed] $name: $row")
      }
    override def onFailure(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution,
        exception: Exception): Unit = ()
  }
}
