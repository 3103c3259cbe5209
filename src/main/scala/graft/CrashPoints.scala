package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

/** Failpoint registry for crash-recovery testing — the madsim analog
  * (reference: src/tests/simulation/ kills nodes at scheduling points and
  * asserts recovery converges; here a forked JVM halts itself at a named
  * point inside the commit path and the harness restarts it).
  *
  * Enabled ONLY via the `graft.crashpoint` system property, formatted
  * `<name>:<n>`: the n-th time [[hit]] is called with `<name>`, the JVM
  * halts immediately (`Runtime.halt` — no shutdown hooks, no finally
  * blocks, the closest in-process stand-in for `kill -9`). With the
  * property unset the per-call cost is one volatile read of a None.
  */
object CrashPoints {

  /** Exit code a crashed child reports — distinct from JVM defaults. */
  val ExitCode = 137

  private val spec: Option[(String, Int)] =
    sys.props.get("graft.crashpoint").map { s =>
      val i = s.lastIndexOf(':')
      (s.substring(0, i), s.substring(i + 1).toInt)
    }

  private val hits = new ConcurrentHashMap[String, AtomicInteger]()

  /** Mark a crash-eligible point in the commit path. No-op unless the
    * `graft.crashpoint` property names this point.
    */
  def hit(name: String): Unit = spec match {
    case Some((n, k)) if n == name =>
      val c = hits.computeIfAbsent(name, _ => new AtomicInteger).incrementAndGet()
      if (c == k) {
        // the message goes to the real stderr even under log capture
        System.err.println(s"CrashPoints: halting at $name (hit $c)")
        Runtime.getRuntime.halt(ExitCode)
      }
    case _ =>
  }
}
