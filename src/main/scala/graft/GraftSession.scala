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

  def local(cores: Int = Runtime.getRuntime.availableProcessors): SparkSession = {
    val s = builder(s"local[$cores]", cores).getOrCreate()
    // getOrCreate may have returned a pre-existing session built without
    // our extensions — make the native functions available regardless
    graft.plans.GraftExtensions.install(s)
    s
  }
}
