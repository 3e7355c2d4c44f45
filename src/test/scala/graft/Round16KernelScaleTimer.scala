package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SCALE.md measurement for the fused signature kernels at 10×/100× the
  * sf0.1 corpus (r15 verdict item 2): the kernels' no-shuffle claim says
  * their advantage over the retired explode/groupBy pipelines should HOLD
  * OR GROW with data volume — every r15 row was measured at sf0.1 only
  * (5k docs). Each replica gets a distinct salt token prepended so copies
  * are NOT near-duplicates of each other (pair cardinality stays linear,
  * the compute plane scales cleanly). Both variants read the same
  * materialized parquet; timings are min-of-reps with a plain count(*)
  * control per replication level.
  *
  * `sbt "Test/runMain graft.Round16KernelScaleTimer [sfDir] [reps] [R...]"`
  */
object Round16KernelScaleTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val rs = if (args.length > 2) args.drop(2).map(_.toInt).toSeq
      else Seq(1, 10, 100)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.Md5Prefix32.register(spark)
    graft.functions.MinHashSigAgg.register(spark)
    import graft.operators.{Dedup, Tokenizer}
    import graft.queries.TextQueries.{P, hash32, ngramsCol, perms}

    def timeMin(f: () => Unit): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }.min

    // force FULL evaluation of every output column (count() alone lets
    // Catalyst prune unused aggregate expressions)
    def force(df: DataFrame): Unit = {
      df.select(xxhash64(df.columns.map(col).toIndexedSeq: _*).as("__h"))
        .agg(expr("bit_xor(__h)")).collect(); ()
    }

    // ---- retired shapes, verbatim from the OperatorsSpec parity oracles
    def retiredMinhash(df: DataFrame): DataFrame =
      df.select(col("doc_id"), explode(ngramsCol(col("text"), 3,
          Tokenizer.Ascii)).as("__s"))
        .select(col("doc_id"), (hash32(col("__s")) % P).as("__h"))
        .groupBy(col("doc_id"))
        .agg(graft.functions.MinHashSigAgg.minhashSig(col("__h")).as("__sig"))
        .select(col("doc_id") +: perms.indices.map(j =>
          col("__sig")(j).as(s"m$j")): _*)

    def retiredSimhash64(df: DataFrame): DataFrame = {
      val toks = df.select(col("doc_id"),
          explode(Tokenizer.Ascii.column(col("text"))).as("__tok"))
        .select(col("doc_id"),
          conv(substring(md5(col("__tok")), 1, 8), 16, 10).cast("long").as("__hi"),
          conv(substring(md5(col("__tok")), 9, 8), 16, 10).cast("long").as("__lo"))
      val sums = (0 until 64).map { b =>
        val (h, sh) = if (b < 32) (col("__lo"), b) else (col("__hi"), b - 32)
        sum(when(shiftright(h, sh).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$b")
      }
      val hexSig = concat((0 until 8).map { r =>
        val byteR = (0 until 8).map(c =>
          when(col(s"s${r * 8 + c}") > 0, lit(1 << c)).otherwise(lit(0)))
          .reduce(_ + _)
        lpad(lower(hex(byteR)), 2, "0")
      }: _*)
      toks.groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
        .select(col("doc_id"), hexSig.as("simhash64"))
    }

    def retiredWinnow(df: DataFrame, k: Int = 8, w: Int = 4): DataFrame = {
      val grams = transform(sequence(lit(1), length(col("text")) - (k - 1)),
        i => hash32(col("text").substr(i, lit(k))))
      val wins = when(size(grams) >= w,
          transform(sequence(lit(1), size(grams) - (w - 1)),
            j => array_min(slice(grams, j, lit(w)))))
        .otherwise(array(array_min(grams)))
      df.where(length(col("text")) >= k)
        .select(col("doc_id"), array_sort(array_distinct(wins)).as("fps"))
    }

    println("| R | docs | control count | stage | kernel s | retired s | ratio |")
    println("|---|---|---|---|---|---|---|")
    rs.foreach { r =>
      // materialize the salted replication once; both variants scan it
      val src = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      val rep = (0 until r).map { i =>
        src.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          concat(lit(s"copysalt$i "), col("text")).as("text"))
      }.reduce(_ unionByName _)
      val dir = java.nio.file.Files.createTempDirectory(s"r16k_$r").toString + "/docs"
      rep.repartition(32).write.mode("overwrite").parquet(dir)
      val docs = spark.read.parquet(dir)
      val n = docs.count()
      val control = timeMin(() => { docs.count(); () })
      val stages = Seq[(String, DataFrame => DataFrame, DataFrame => DataFrame)](
        ("minhash32", d => Dedup.minhashSignatures(d, "doc_id", "text"),
          retiredMinhash),
        ("simhash64", d => Dedup.simhash64(d, "doc_id", "text"),
          retiredSimhash64),
        ("winnow", d => Dedup.winnowFingerprints(d, "doc_id", "text"),
          d => retiredWinnow(d)))
      stages.foreach { case (name, kernel, retired) =>
        val tk = timeMin(() => force(kernel(docs)))
        // the retired winnowing shape is interpreted nested-HOF work at
        // ~36 s/rep PER 5k docs (the r13 lambda diagnosis) — measured
        // once per level and SKIPPED at R=100 (an O(R) extrapolation of
        // ~1 h/rep; the cap is printed, not silent)
        if (name == "winnow" && r >= 50)
          println(f"| $r | $n | $control%.2f | $name | $tk%.2f | skipped (~${r * 36} s/rep extrapolated) | — |")
        else {
          val tr =
            if (name == "winnow") { // one rep: magnitude gap ≫ rep noise
              val t0 = System.nanoTime(); force(retired(docs))
              (System.nanoTime() - t0) / 1e9
            } else timeMin(() => force(retired(docs)))
          println(f"| $r | $n | $control%.2f | $name | $tk%.2f | $tr%.2f | ${tk / tr}%.2f |")
        }
      }
      // end-to-end: the kernel-backed near-dup query stays healthy at scale
      val tNear = timeMin(() => {
        Dedup.dedupNear(docs, "doc_id", "text", 0.5).count(); ()
      })
      println(f"| $r | $n | $control%.2f | dedupNear e2e | $tNear%.2f | — | — |")
    }
    spark.stop()
  }
}
