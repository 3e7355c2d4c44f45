package graft

/** The bench harness's accretion guard (VERDICT r16 "What's wrong" #3):
  * per-rep live subtree/file counts under every registered scratch dir
  * must be IDENTICAL across reps of an incremental-index entry, so a
  * rep pattern like 6s -> 56s -> 155s can never be ambiguous between
  * co-tenant load and a real state leak. Drives THREE reps of the real
  * `q_dedup_incremental2` entry (two-batch signature-index lifecycle —
  * base build + clean-batch append + grown-index probe) exactly as
  * `Bench.minOfReps` does, snapshotting between reps with the same
  * helpers the harness uses.
  */
class BenchRepGuardSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("three reps of q_dedup_incremental2 leave identical scratch counts") {
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    val fn = SparkEntry.queries("q_dedup_incremental2")
    def rep(): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    rep() // rep 1 materializes the index and sets the baseline
    val base = queries.TextQueries.scratchSnapshot()
    assert(base.nonEmpty, "the entry registered no scratch dirs — the " +
      "guard would be vacuous")
    (2 to 3).foreach { i =>
      rep()
      val snap = queries.TextQueries.scratchSnapshot()
      val delta = queries.TextQueries.scratchDelta(base, snap)
      assert(delta.isEmpty,
        s"rep $i accreted state over rep 1:\n  ${delta.mkString("\n  ")}")
    }
  }

  test("the guard catches an injected accretion") {
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    val before = queries.TextQueries.scratchSnapshot()
    assume(before.nonEmpty) // ordering: the lifecycle test registered dirs
    val victim = before.keys.min
    val planted = new java.io.File(victim, "planted_leak_file")
    try {
      assert(planted.createNewFile())
      val delta = queries.TextQueries.scratchDelta(
        before, queries.TextQueries.scratchSnapshot())
      assert(delta.exists(_.startsWith(victim)),
        s"planted file under $victim not reported; delta=$delta")
    } finally { planted.delete(): Unit }
  }

  test("scratchDelta reports both dir and file count movement") {
    val a = Map("/x" -> ((2L, 5L)), "/y" -> ((1L, 1L)))
    val b = Map("/x" -> ((3L, 5L)), "/y" -> ((1L, 1L)), "/z" -> ((1L, 0L)))
    val d = queries.TextQueries.scratchDelta(a, b)
    assert(d == Seq("/x: dirs 2 -> 3, files 5 -> 5"))
    assert(queries.TextQueries.scratchDelta(a, a).isEmpty)
  }
}
