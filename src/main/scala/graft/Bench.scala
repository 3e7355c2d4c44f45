package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Streaming-fixture scratch dirs (input copies + checkpoints) are
    * removed recursively at JVM exit — repeated bench runs must not
    * accrete `/tmp/graft_bench_*` dirs (each carries an events.parquet
    * copy).
    */
  private val scratch = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  java.lang.Runtime.getRuntime.addShutdownHook(new Thread(() =>
    scratch.forEach { p =>
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(p))
    }))
  private def tempDir(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    scratch.add(p.toString)
    p
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // testdata parquet is one small file per table; split finer so local
      // scans use all cores (a real cluster keeps the 128m default)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      // Tables.withEventTs's NTZ cast is value-preserving ONLY under UTC;
      // without pinning, a non-UTC JVM shifts every event instant and the
      // streaming legs' hour windows bucket differently per machine
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session outside any query's timing: scan + two-phase hash
    // agg + broadcast join exercise the codegen/JIT paths the first timed
    // query would otherwise pay for (~2s of compile time at local scale)
    locally {
      import org.apache.spark.sql.functions._
      val r = spark.read.parquet(s"$sfDir/region.parquet")
      val n = spark.read.parquet(s"$sfDir/nation.parquet")
      n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name").agg(count(lit(1)).as("c"), sum("n_nationkey").as("s"))
        .write.format("noop").mode("overwrite").save()
    }
    // min-of-reps per query: one co-tenant stall can no longer dominate a
    // query's number (BENCH_r02 was measured against concurrent sbt runs and
    // reported phantom 10-25x regressions). -1 marks a crashed query so the
    // JSON can't pass it off as fast. When the two reps disagree by >2x the
    // machine was contended mid-query, so a third rep runs — and the full
    // rep list is emitted per query so the artifact itself shows which
    // numbers were noisy instead of needing an after-the-fact re-timing.
    def loadavg(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      catch { case _: Throwable => "" }
    val loadBefore = loadavg()
    // isolated re-timing knobs (absent in driver runs, so the contract is
    // unchanged there): SPARK_GRAFT_ONLY=q_a,q_b limits the run to named
    // queries, SPARK_GRAFT_MIN_REPS=n forces at least n reps per query —
    // together they answer "is this regression real or co-tenant noise"
    // without editing code. A run with EITHER knob set never overwrites
    // the tracked BENCH_FULL.json artifact (a subset or a different rep
    // basis would poison cross-round diffs).
    val only: Option[Set[String]] = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      // a typo'd name would otherwise time ZERO queries and exit 0 with
      // total 0.000 — the opposite of the knob's purpose
      val known = SparkEntry.queries.keySet ++
        Set("stream_windowed_pipeline", "stream_dsl_windowed_count",
          "stream_dsl_windowed_count_rocksdb")
      val unknown = names.diff(known)
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names not in the suite: ${unknown.toSeq.sorted.mkString(", ")}")
      require(names.nonEmpty, "SPARK_GRAFT_ONLY is set but names no queries")
    }
    def wanted(name: String): Boolean = only.forall(_.contains(name))
    val minRepsEnv = sys.env.get("SPARK_GRAFT_MIN_REPS")
    val minReps = minRepsEnv.map { v =>
      try v.trim.toInt
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"SPARK_GRAFT_MIN_REPS must be an integer, got '$v'")
      }
    }.getOrElse(3) // default raised 2→3 in r18 (VERDICT r17 #1): with two
    // reps a single co-tenant stall on rep 2 decides the entry; min-of-3
    // keeps one clean rep through any single-rep excursion. Cross-round
    // note: r18+ artifacts are min-of-3 vs the min-of-2 r16/r17 baseline —
    // a ≤ few-% one-time downward basis shift, recorded in SCALE.md.
    require(minReps >= 1, s"SPARK_GRAFT_MIN_REPS must be >= 1, got $minReps")
    def minOfReps(name: String)(run: () => Unit): (Double, Seq[Double]) = {
      // accretion guard: incremental-index entries materialize persisted
      // indexes under registered scratch dirs keyed per (tag, sf, pid) —
      // the SAME dirs across reps. Rep 1 establishes the baseline (dirs,
      // files) count per path; every later rep must land on IDENTICAL
      // counts, or the rep timings were measuring a growing index (state
      // leaked across reps) and the entry fails loudly naming the path —
      // a rep pattern like 6s -> 56s -> 155s can never again be ambiguous
      // between co-tenant load and a real leak (BENCH_r16, VERDICT r16 #3).
      var baseline: Option[Map[String, (Long, Long)]] = None
      def once(): Double = {
        val t0 = System.nanoTime()
        // only the QUERY runs inside the try: a query failure degrades to
        // the -1.0 entry convention, but the accretion guard below sits
        // OUTSIDE it and rethrows — a state leak is a structural failure
        // of the bench itself and must abort the run (non-zero exit, no
        // BENCH_FULL.json refresh), never land in the tracked artifact
        // disguised as an ordinary failed entry.
        val ran = try {
          run(); true
        }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
        if (!ran) -1.0
        else {
          val t = (System.nanoTime() - t0) / 1e9
          val snap = graft.queries.TextQueries.scratchSnapshot()
          baseline match {
            case None => baseline = Some(snap)
            case Some(b) =>
              val delta = graft.queries.TextQueries.scratchDelta(b, snap)
              require(delta.isEmpty,
                s"[$name] scratch state changed across reps (growth = the " +
                  s"index accreted; shrinkage = a rep deleted persisted " +
                  s"state):\n  ${delta.mkString("\n  ")}")
              // new paths can only appear if a LATER rep materialized an
              // index rep 1 didn't — fold them in so rep 3 checks rep 2's
              baseline = Some(snap)
          }
          t
        }
      }
      var reps = Vector.empty[Double]
      while (reps.length < minReps) {
        val t = once()
        if (t < 0) return (t, reps :+ t)
        reps = reps :+ t
      }
      if (reps.max / reps.min > 2.0) { // contended mid-query: one tiebreak rep
        val c = once()
        if (c >= 0) reps = reps :+ c
      }
      (reps.min, reps)
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => wanted(name) }
      .map { case (name, fn) =>
        // noop sink materializes every row/column (count() would let
        // Catalyst prune the whole projection on scan-shaped queries)
        name -> minOfReps(name) { () =>
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        }
      }
    // streaming-engine throughput: events parquet replayed as a file stream
    // through a windowed count (the reference's core loop, microbatched)
    val streamSecs = if (!wanted("stream_windowed_pipeline"))
      None
    else Some(minOfReps("stream_windowed_pipeline") { () =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
      // file-stream source needs a directory: stage the single file into one
      val streamDir = tempDir("graft_bench_in")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sfDir/events.parquet"),
        streamDir.resolve("events.parquet"))
      val q = Tables.withEventTs(
          spark.readStream.schema(schema).parquet(streamDir.toString))
        .select(org.apache.spark.sql.functions.col("ts"),
          org.apache.spark.sql.functions.col("event_type"),
          org.apache.spark.sql.functions.col("value"))
        .withWatermark("ts", "1 hour")
        .groupBy(org.apache.spark.sql.functions.window(
          org.apache.spark.sql.functions.col("ts"), "1 hour"),
          org.apache.spark.sql.functions.col("event_type"))
        .count()
        .writeStream.format("noop").outputMode("update")
        .option("checkpointLocation",
          tempDir("graft_bench_ckpt").toString)
        .start()
      q.processAllAvailable(); q.stop()
    })
    // same replay through the graft DSL (KStream -> groupByKey -> windowedBy
    // -> count -> changelog), so the measured path is THIS library's
    // streaming surface, not just raw Spark
    val dslStreamSecs = if (!wanted("stream_dsl_windowed_count"))
      None
    else Some(minOfReps("stream_dsl_windowed_count") { () =>
      import org.apache.spark.sql.functions.{col, expr}
      import graft.dsl.{KStream, KV, TumblingWindow}
      import spark.implicits._
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
      val streamDir = tempDir("graft_bench_dsl")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sfDir/events.parquet"),
        streamDir.resolve("events.parquet"))
      val ks = new KStream(Tables.withEventTs(
          spark.readStream.schema(schema).parquet(streamDir.toString))
        .select(col("event_type"), col("value"), col("ts"))
        .map(r => KV(r.getString(0), r.getDouble(1), r.getTimestamp(2))))
      val counted = ks.withWatermarkMs(3600000L)
        .groupByKey.windowedBy(TumblingWindow.of(3600000L)).count
      val q = counted.changelog.writeStream.format("noop").outputMode("update")
        .option("checkpointLocation",
          tempDir("graft_bench_dsl_ckpt").toString)
        .start()
      q.processAllAvailable(); q.stop()
    })
    // the SAME DSL pipeline on the RocksDB state-store provider — the
    // reference's default persistent store is a first-class dial
    // (graft.runtime.Stores), so one driver-facing entry keeps the
    // provider path continuously benchmarked, not just spec'd. The
    // provider is restored afterwards: a session-level conf would
    // otherwise silently re-backend every later streaming entry.
    val dslRocksSecs = if (!wanted("stream_dsl_windowed_count_rocksdb"))
      None
    else Some(minOfReps("stream_dsl_windowed_count_rocksdb") { () =>
      import org.apache.spark.sql.functions.col
      import graft.dsl.{KStream, KV, TumblingWindow}
      import spark.implicits._
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
      val streamDir = tempDir("graft_bench_dslr")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sfDir/events.parquet"),
        streamDir.resolve("events.parquet"))
      val providerKey = "spark.sql.streaming.stateStore.providerClass"
      val changelogKey =
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
      val prev = spark.conf.getOption(providerKey)
      val prevChangelog = spark.conf.getOption(changelogKey)
      graft.runtime.Stores.use(spark, graft.runtime.Stores.RocksDb)
      try {
        val ks = new KStream(Tables.withEventTs(
            spark.readStream.schema(schema).parquet(streamDir.toString))
          .select(col("event_type"), col("value"), col("ts"))
          .map(r => KV(r.getString(0), r.getDouble(1), r.getTimestamp(2))))
        val counted = ks.withWatermarkMs(3600000L)
          .groupByKey.windowedBy(TumblingWindow.of(3600000L)).count
        val q = counted.changelog.writeStream.format("noop").outputMode("update")
          .option("checkpointLocation",
            tempDir("graft_bench_dslr_ckpt").toString)
          .start()
        q.processAllAvailable(); q.stop()
      } finally {
        // restore BOTH confs Stores.use touched — leaving the rocksdb
        // changelog flag behind would hand later provider selections in
        // this session a default Spark never set
        prev match {
          case Some(p) => spark.conf.set(providerKey, p)
          case None => spark.conf.unset(providerKey)
        }
        prevChangelog match {
          case Some(v) => spark.conf.set(changelogKey, v)
          case None => spark.conf.unset(changelogKey)
        }
      }
    })
    val loadAfter = loadavg()
    val allResults = results ++
      streamSecs.map("stream_windowed_pipeline" -> _) ++
      dslStreamSecs.map("stream_dsl_windowed_count" -> _) ++
      dslRocksSecs.map("stream_dsl_windowed_count_rocksdb" -> _)
    // per-query times as integer ms; the full line goes to stdout AND the
    // tracked BENCH_FULL.json, and a compact total-only line prints last so
    // a size-limited log tail always ends with complete JSON (see below)
    def ms(v: Double): String = if (v < 0) "-1" else math.round(v * 1000).toString
    val qs = allResults.map { case (k, (v, _)) => s"\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    // every rep per query: a reader can compute each query's spread (max/min)
    // and see exactly which entries were measured under contention without
    // re-running anything
    val repsJson = allResults.map { case (k, (_, reps)) =>
      s"\"" + k + "\":" + reps.map(ms).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val spreads = allResults.collect { case (_, (v, reps)) if v > 0 =>
      reps.max / reps.min }
    val maxSpread = if (spreads.isEmpty) 1.0 else spreads.max
    val nSpreadGt2 = spreads.count(_ > 2.0)
    val total = results.collect { case (_, (v, _)) if v >= 0 => v }.sum
    // sf is ALWAYS a JSON string (a non-numeric dir basename like "0.1x10"
    // once flipped it between number and string, breaking cross-commit
    // diffs); sf_dir carries the full input path so any replication/scaling
    // scheme is self-describing without overloading sf's meaning
    val sfRaw = sfDir.split("/").last.stripPrefix("sf")
    def jsonStr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val sf = jsonStr(sfRaw)
    val totalStr = BigDecimal(total).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def r2(v: Double): String =
      BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
    // contention sentinel: raw /proc/loadavg before/after plus the spread
    // summary — a run whose loadavg shows dozens of runnable co-tenant
    // processes or whose max_spread is large is self-declared noisy
    val noise = s""""load_before":${jsonStr(loadBefore)},"load_after":${jsonStr(loadAfter)},"max_spread":${r2(maxSpread)},"n_spread_gt2":$nSpreadGt2"""
    val line = s"""{"metric":"total","value":$totalStr,"unit":"sec","qunit":"ms","min_reps":$minReps,"queries":$qs,"reps":$repsJson,$noise,"sf":$sf,"sf_dir":${jsonStr(sfDir)}}"""
    // print order fixed in r19 (VERDICT r18 "what's wrong" #1): the driver
    // parses the LAST stdout line, and printing the compact (per-query-less)
    // line last left every PERF_r*.json per-query/geomean/scaling block
    // empty (`parsed: null` in BENCH_r14..r18). Now the COMPLETE one-line
    // JSON — per-query map included — is the final line; the compact
    // total-only line prints first as a human-readable summary, and the
    // full line is also committed as BENCH_FULL.json.
    val compact = s"""{"metric":"total","value":$totalStr,"unit":"sec",$noise,"sf":$sf,"detail":"BENCH_FULL.json"}"""
    println(compact)
    println(line)
    // only an UNFILTERED run may refresh the tracked artifact (a query
    // filter measures a subset — poison for cross-round diffs). A
    // rep-count override is allowed to refresh since r18: the artifact
    // self-describes its basis via the min_reps field and the per-entry
    // reps arrays, so a min-of-N vs min-of-M comparison is visible to
    // any reader instead of silently wrong.
    if (only.isEmpty)
      try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
        (line + "\n").getBytes("UTF-8"))
      catch { case _: Throwable => () } // best-effort; stdout is the contract
    spark.stop()
  }
}
