package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole forked test JVM — same config
  * surface as Verify/Bench (UTC, nanosAsLong, small shuffle partitions).
  */
object SparkTest {
  lazy val session: SparkSession = GraftSession.local("4")
}

abstract class SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  val sfDir = "/root/testdata/sf0.001"

  /** Recursive delete for test artifact dirs. Symlinks are removed as
    * links (never followed — fixture dirs produced by ScaleUp symlink
    * shared tables, and cleanup must not reach through them).
    */
  def deleteRecursively(path: String): Unit = Fs.deleteTree(path)
}
