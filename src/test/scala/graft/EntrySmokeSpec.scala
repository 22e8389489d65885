package graft

/** The driver calls SparkEntry.entry with ITS OWN session (possibly ANSI
  * mode, no graft extensions registered) — the flagship must run there. */
class EntrySmokeSpec extends SparkSpec {

  test("entry() runs under a vanilla ANSI session and returns rows") {
    val vanilla = spark.newSession()
    vanilla.conf.set("spark.sql.ansi.enabled", "true")
    vanilla.conf.set("spark.sql.shuffle.partitions", "4")
    val df = SparkEntry.entry(vanilla)
    assert(df.count() > 0)
    assert(df.columns.contains("sum_qty"))
  }
}
