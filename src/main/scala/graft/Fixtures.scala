package graft

/** Repo-anchored fixture paths: `target/graft-fixtures/<name>`
  * resolved against the nearest enclosing sbt build root (the
  * directory containing `build.sbt`, walking up from the JVM's
  * working dir). This keeps both halves of the old guarantee: the
  * absolute path is embedded in oracle SQL so the driver's DuckDB
  * resolves it regardless of ITS cwd, and the repo works from any
  * checkout location — while a JVM launched from a subdirectory (IDE
  * module cwd, wrapper script) still lands fixtures in the repo's own
  * `target/` instead of littering the launch dir. Falls back to the
  * working dir when no build root is found.
  */
object Fixtures {
  private lazy val root: java.io.File = {
    val cwd = new java.io.File(sys.props("user.dir")).getAbsoluteFile
    Iterator.iterate(cwd)(_.getParentFile)
      .takeWhile(_ != null).take(8)
      .find(d => new java.io.File(d, "build.sbt").isFile)
      .getOrElse(cwd)
  }
  def path(name: String): String =
    new java.io.File(root, s"target/graft-fixtures/$name").getAbsolutePath
}
