package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AssembleSpec extends SparkSpec {
  import spark.implicits._

  private def log = Seq(
    (1L, 10L, 7L, "view"),
    (2L, 20L, 7L, "click"),
    (3L, 30L, 7L, "purchase"),
    (4L, 15L, 9L, "view")
  ).toDF("event_id", "ts", "user_id", "event_type")

  test("threads orders payloads by the given key and reports sizes") {
    val out = Assemble.threads(log, "user_id",
        Seq(col("ts"), col("event_id")), "event_type", maxTurns = 16)
      .collect().map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(out(7L).getAs[String]("convo") == "view click purchase")
    assert(out(7L).getAs[Long]("total_events") == 3L)
    assert(out(7L).getAs[Long]("n_turns") == 3L)
    assert(out(9L).getAs[String]("convo") == "view")
  }

  test("maxTurns caps the transcript but total_events stays uncapped") {
    val out = Assemble.threads(log, "user_id",
        Seq(col("ts"), col("event_id")), "event_type", maxTurns = 2)
      .where($"user_id" === 7L).head()
    assert(out.getAs[String]("convo") == "view click") // first 2 by ts
    assert(out.getAs[Long]("n_turns") == 2L)
    assert(out.getAs[Long]("total_events") == 3L)
  }

  test("tie on the order column is broken by the tie-breaker column") {
    val dup = Seq((2L, 10L, 1L, "b"), (1L, 10L, 1L, "a"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val convo = Assemble.threads(dup, "user_id",
        Seq(col("ts"), col("event_id")), "event_type")
      .head().getAs[String]("convo")
    assert(convo == "a b") // event_id 1 before 2 at equal ts
  }

  test("window and aggregation share one exchange (same key)") {
    val plan = Assemble.threads(log, "user_id",
        Seq(col("ts"), col("event_id")), "event_type")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }
}
