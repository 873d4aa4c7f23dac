package graft

import org.apache.hadoop.fs.Path

/** Tiny forked-JVM driver for the cross-PROCESS GenFencedPointerStore
  * test: each invocation is a genuinely separate process coordinating
  * with the others through nothing but the shared filesystem — no
  * shared JVM state, no in-memory registers.
  *
  * args: <rootDir> <expected | "-" for None> <next>
  * exit: 0 if the conditional flip won, 1 if it lost, 2 on error.
  */
object GenPtrCli {
  def main(args: Array[String]): Unit = {
    try {
      val Array(rootDir, expectedArg, next) = args
      val root = new Path(rootDir)
      val fs = root.getFileSystem(new org.apache.hadoop.conf.Configuration())
      val store = new graft.sources.GenFencedPointerStore
      val expected = if (expectedArg == "-") None else Some(expectedArg)
      val won = store.compareAndSet(fs, root, "_CURRENT", expected, next, () => None)
      sys.exit(if (won) 0 else 1)
    } catch {
      case e: Throwable => System.err.println(e.toString); sys.exit(2)
    }
  }
}
