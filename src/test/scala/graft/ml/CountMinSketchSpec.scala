package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSketchSpec extends SparkSpec {

  test("sketch never undercounts and stays within the epsilon bound") {
    import spark.implicits._
    // zipf-ish stream: key k appears ~ 10000/k times
    val stream = (1 to 50).flatMap(k => Seq.fill(10000 / k)(s"key$k"))
    val ds = spark.sparkContext.parallelize(stream, 8).toDS()
    val cms = ds.select(CMSketch.aggregator(depth = 5, width = 2048)
      .toColumn.name("sk")).head()
    val n = stream.size
    assert(cms.totalCount === n)
    val eps = math.E / 2048
    (1 to 50).foreach { k =>
      val truth = 10000 / k
      val est = cms.estimate(s"key$k")
      assert(est >= truth, s"undercount for key$k")
      assert(est <= truth + (eps * n * 3).toLong + 1,
        s"key$k overcount: $est vs $truth")
    }
    // absent keys estimate near zero
    assert(cms.estimate("never-seen") <= (eps * n * 3).toLong)
  }

  test("partition-built sketches merge to the same answer as one pass") {
    val data = (1 to 5000).map(i => s"k${i % 37}")
    val whole = data.foldLeft(CMSketch.empty())(_ add _)
    val (l, r) = data.splitAt(2000)
    val merged = l.foldLeft(CMSketch.empty())(_ add _)
      .merge(r.foldLeft(CMSketch.empty())(_ add _))
    (0 until 37).foreach { k =>
      assert(whole.estimate(s"k$k") === merged.estimate(s"k$k"))
    }
  }
}
