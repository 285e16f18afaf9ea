package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SqlModelsSpec extends SparkSpec {

  test("SQL models compile refs, run in dependency order, and audit") {
    import spark.implicits._
    val raw = Seq(
      (1L, "a", 10.0), (2L, "b", -5.0), (3L, "a", 7.5), (4L, "c", 0.0))
      .toDF("id", "category", "amount")

    val models = Seq(
      ("clean", "silver",
        """SELECT id, upper(category) AS category,
          |  CASE WHEN amount < 0 THEN 0 ELSE amount END AS amount
          |FROM {{ source('raw_rows') }}""".stripMargin),
      ("by_category", "gold",
        """SELECT category, count(*) AS n, sum(amount) AS total
          |FROM {{ ref('clean') }} GROUP BY category""".stripMargin))

    val (out, audit) = SqlModels.dag(models, Sink.Cached())
      .run(Map("raw_rows" -> raw))
    assert(out.keySet === Set("clean", "by_category"))
    val byCat = out("by_category").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(byCat("A") === ((2L, 17.5)))
    assert(byCat("B") === ((1L, 0.0))) // negative clamped
    assert(audit.count() === 2)
  }

  test("deps parsing handles multiple refs and whitespace variants") {
    val sql = "SELECT * FROM {{ ref('a') }} JOIN {{ref(\"b\")}} USING (k) " +
      "LEFT JOIN {{ source( 'c' ) }} USING (k) JOIN {{ ref('a') }} x USING (k)"
    assert(SqlModels.deps(sql) === Seq("a", "b", "c"))
  }
}
