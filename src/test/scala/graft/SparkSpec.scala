package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared session per JVM (suites reuse it via getOrCreate). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def ts(ms: Long): Timestamp = new Timestamp(ms)

  /** Temp dir removed recursively at JVM exit — specs must not leave
    * orphan `/tmp/graft_*` dirs behind a test run.
    */
  def tempDir(prefix: String): String =
    SparkSpec.tempDir(prefix)

  override def afterAll(): Unit = {
    // keep the session alive for the next suite (shared JVM)
    super.afterAll()
  }
}

object SparkSpec {
  private val dirs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  java.lang.Runtime.getRuntime.addShutdownHook(new Thread(() =>
    dirs.forEach { p =>
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(p))
    }))

  def tempDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix).toString
    dirs.add(p)
    p
  }
}
