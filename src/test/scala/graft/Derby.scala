package graft

/** Embedded Derby is a JVM-wide singleton engine, and ScalaTest runs
  * suites concurrently in one JVM: IngestSpec's and PipelineSpec's JDBC
  * tests can hit the engine mid-boot from the other suite's thread —
  * observed as "EmbeddedDriver is not registered with the JDBC driver
  * manager" and live connections dying mid-test (full-suite flake,
  * round 11; each suite is green in isolation). Every Derby-touching
  * test runs under this lock; the boot call re-registers the autoloaded
  * driver if a prior interleaving left the engine down (it is a no-op on
  * a healthy engine, the documented Derby re-boot idiom). */
object Derby {
  val available: Boolean =
    try { Class.forName("org.apache.derby.jdbc.EmbeddedDriver"); true }
    catch { case _: ClassNotFoundException => false }

  def exclusive[A](body: => A): A = synchronized {
    if (available)
      Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
        .getDeclaredConstructor().newInstance()
    body
  }
}
