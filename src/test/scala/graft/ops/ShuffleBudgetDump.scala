package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Regenerates the golden per-query shuffle budget
  * (src/test/resources/shuffle_budget.tsv) from the current plans:
  *
  *   sbt "Test/runMain graft.ops.ShuffleBudgetDump"
  *
  * Run it ONLY when a plan change is intentional, and say why in the
  * commit message — the budget is the mechanized form of SCALE.md's
  * shuffle inventory, and PlanLintGateSpec fails on any drift.
  */
object ShuffleBudgetDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkSpec.session
    val sf = "/root/testdata/sf0.001"
    val out = new StringBuilder
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n = PlanLint.lint(fn(spark, sf))
        .find(_.rule == "shuffle-count").map(_.detail).getOrElse("?")
      out.append(s"$name\t$n\n")
    }
    val path = Paths.get("src/test/resources/shuffle_budget.tsv")
    Files.createDirectories(path.getParent)
    Files.write(path, out.toString.getBytes(StandardCharsets.UTF_8))
    println(s"[shuffle-budget] wrote ${path.toAbsolutePath}")
    spark.stop()
  }
}
