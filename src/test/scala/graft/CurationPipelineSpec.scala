package graft

import graft.queries.CompositeQueries

/** The staged-materialization contract of
  * [[CompositeQueries.curationPipeline3]]: writing scratch parquet after
  * stages 3 and 4 is an EXECUTION choice, not a semantics change — the
  * staged run must be row-identical to the one-plan form the oracle
  * checks.
  */
class CurationPipelineSpec extends SparkSpec {

  private def rows(pipeline: (org.apache.spark.sql.DataFrame, Option[String]) => org.apache.spark.sql.DataFrame,
      docs: org.apache.spark.sql.DataFrame,
      staged: Option[String]): Set[(Long, String, Long, Long)] =
    pipeline(docs, staged)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("pipeline3: staged parquet checkpoints are row-identical to the one-plan form") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val onePlan = rows(CompositeQueries.curationPipeline3, docs, None)
    val staged = rows(CompositeQueries.curationPipeline3, docs,
      Some(tempDir("graft_pipe3_staged")))
    assert(onePlan.nonEmpty, "pipeline must keep rows at sf0.001")
    assert(staged === onePlan,
      s"staged and one-plan outputs diverge: only-staged=${(staged -- onePlan).take(3)} " +
        s"only-oneplan=${(onePlan -- staged).take(3)}")
  }

  test("pipeline4: staged checkpoints row-identical to the one-plan form") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val onePlan = rows(CompositeQueries.curationPipeline4, docs, None)
    val staged = rows(CompositeQueries.curationPipeline4, docs,
      Some(tempDir("graft_pipe4_staged")))
    assert(onePlan.nonEmpty, "pipeline must keep rows at sf0.001")
    assert(staged === onePlan)
  }

  test("pipeline4 CCNet order: line removal changes downstream Gopher and decontamination verdicts") {
    import spark.implicits._
    // two shared-banner interplays (source d, banner df = 2 → stripped)
    // plus two negative controls in source e where the SAME banner is
    // unique (df = 1 → survives) and kills the doc downstream
    val hashBanner = "#### #### #### ####"
    val alphaBanner = "please join our mailing list today for updates and " +
      "offers plus weekly digest mail from the team right here now"
    assert(alphaBanner.split(" ").length === 20)
    def body(words: Seq[String], n: Int): String =
      Iterator.continually(words).flatten.take(n).mkString(" ")
    val b1 = body(Seq("spark", "quill", "mango", "delta", "crane"), 60)
    val b2 = body(Seq("query", "thorn", "gleam", "brick", "stove"), 60)
    val b3 = body(Seq("vapor", "lunar", "ridge", "ember", "frost"), 56)
    val b4 = body(Seq("tidal", "grove", "plume", "shale", "birch"), 56)
    val docs = Seq(
      // Gopher interplay: the '#' banner fails g_symbol_ratio if kept
      (1L, "d", s"$hashBanner\n$b1"),
      (2L, "d", s"$hashBanner\n$b2"),
      // decontamination interplay: the alpha banner's 3-grams cover the
      // bench doc at ~24% > the 20% threshold if kept
      (3L, "d", s"$alphaBanner\n$b3"),
      (4L, "d", s"$alphaBanner\n$b4"),
      // negative controls: same banners, unique within source e
      (5L, "e", s"$alphaBanner\n${body(Seq("olive", "cedar", "maple", "aspen", "larch"), 56)}"),
      (6L, "e", s"$hashBanner\n${body(Seq("amber", "coral", "slate", "pearl", "onyx1"), 60)}"),
      // the benchmark doc: exactly the alpha banner's content
      (100L, "bench", alphaBanner)
    ).toDF("doc_id", "source", "text")
    val out = CompositeQueries.curationPipeline4(docs, stagedDir = None)
      .select("doc_id", "n_tokens")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L),
      s"stripped docs survive; unique-banner controls are killed downstream: $out")
    assert(out(1L) === 60L && out(2L) === 60L,
      s"n_tokens must count the STRIPPED text: $out")
    assert(out(3L) === 56L && out(4L) === 56L, s"$out")
  }
}
