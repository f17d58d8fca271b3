package graft

import org.apache.spark.sql.functions._

/** Liveness proof for the FullExec gate action (same discipline as
  * PlanSpec's GLOBALWIN self-test and ScalingSpec's quadratic probe:
  * a gate earns trust only by being shown to FIRE).
  *
  * The round-9 incident: `graph_assortativity`'s Pearson term product
  * overflowed BIGINT at sf0.1, and every count()-driven gate passed
  * because Catalyst prunes the final projection under count() — the
  * overflowing expression never executed. FullExec's
  * `write.format("noop")` materializes every output column. This spec
  * pins BOTH halves of that story on a minimal reproduction, so if a
  * future Spark version changes either behavior (count() stops
  * pruning, or the noop sink stops evaluating full rows), the gate's
  * premise fails loudly here.
  */
class FullExecSpec extends SparkSpec {

  // ANSI overflow only when the projection actually evaluates (id >= 1):
  // the exact graph_assortativity failure class, minimized
  private def overflowing =
    spark.range(5).select((col("id") + lit(Long.MaxValue)).as("boom"))

  test("count() provably misses a projection-only overflow (the blind spot)") {
    withAnsi {
      assert(overflowing.count() === 5L,
        "count() should prune the overflowing projection and succeed")
    }
  }

  test("noop full-projection write fires on the same overflow (the gate)") {
    withAnsi {
      val e = intercept[Exception] {
        overflowing.write.format("noop").mode("overwrite").save()
      }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(e).exists(c =>
        String.valueOf(c.getMessage).toLowerCase.contains("overflow")),
        s"expected an arithmetic-overflow failure, got: ${e.getMessage}")
    }
  }

  /** The production session (Sessions.build) runs Spark 4's default
    * ANSI mode; the shared test session inherits the same default, but
    * pin it explicitly so this spec can't rot if a suite-level conf
    * ever flips it. */
  private def withAnsi[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try body finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }
}
