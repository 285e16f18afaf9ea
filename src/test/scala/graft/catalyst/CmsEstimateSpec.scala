package graft.catalyst

import graft.SparkSpec
import graft.ml.CMSketch
import org.apache.spark.sql.functions._

/** [[CmsEstimate]] — the native Count-Min probe that replaced q55's last
  * operator-path Scala UDF (r9 verdict task 2). Pins:
  *   1. native == UDF output over an entire vocabulary (the expression
  *      must reproduce CMSketch.estimate bit-for-bit, same seeded hash);
  *   2. the one-sided CMS guarantee holds through the native path
  *      (estimate ≥ exact count for every key);
  *   3. null input → null out (UnaryExpression null semantics);
  *   4. q55's executed plan carries NO ScalaUDF / BatchEvalPython node.
  */
class CmsEstimateSpec extends SparkSpec {
  import spark.implicits._

  private def freshSketch(keys: Seq[String]): CMSketch = {
    val sk = CMSketch.empty()
    keys.foreach(k => sk.add(k))
    sk
  }

  test("native cms_estimate == CMSketch.estimate over the whole vocabulary") {
    val corpus = (0 until 5000).map(i => s"term${i % 700}")
    val sketch = freshSketch(corpus)
    val vocab = corpus.distinct
    val native = vocab.toDF("term")
      .select(col("term"),
        GraftFunctions.cmsEstimate(col("term"), sketch).as("est"))
      .as[(String, Long)].collect().toMap
    vocab.foreach { t =>
      assert(native(t) === sketch.estimate(t),
        s"native probe diverged from sketch.estimate for $t")
    }
  }

  test("one-sided guarantee through the native path: estimate >= exact") {
    val corpus = (0 until 20000).map(i => s"w${(i * i) % 997}")
    val sketch = freshSketch(corpus)
    val exact = corpus.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bad = exact.keys.toSeq.toDF("term")
      .select(col("term"),
        GraftFunctions.cmsEstimate(col("term"), sketch).as("est"))
      .as[(String, Long)].collect()
      .filter { case (t, est) => est < exact(t) }
    assert(bad.isEmpty, s"CMS undercounted: ${bad.take(5).toSeq}")
  }

  test("null input yields null") {
    val sketch = freshSketch(Seq("a", "b"))
    val out = Seq(Some("a"), None).toDF("term")
      .select(GraftFunctions.cmsEstimate(col("term"), sketch).as("est"))
      .collect()
    assert(!out(0).isNullAt(0))
    assert(out(1).isNullAt(0))
  }

  test("q55's executed plan has no ScalaUDF/BatchEvalPython node") {
    val df = graft.SparkEntry.queries("q55_heavy_hitters")(
      spark, "/root/testdata/sf0.001")
    df.collect() // materialize so the adaptive plan is final
    val nodes = graft.ops.PlanLint.expand(df.queryExecution.executedPlan)
    val offenders = nodes.filter { n =>
      n.expressions.exists(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.ScalaUDF]))
    }
    assert(offenders.isEmpty,
      s"UDF nodes in q55 plan: ${offenders.map(_.nodeName)}")
    assert(!df.queryExecution.executedPlan.toString.contains("BatchEvalPython"))
  }
}
