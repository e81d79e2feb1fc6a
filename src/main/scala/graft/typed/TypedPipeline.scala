package graft.typed

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Dataset facade (SURVEY.md §1.3): the engine is DataFrame-first
  * (schema-dynamic, matching the reference), but where a fixed schema is
  * known, `Dataset[T]` buys compile-time field checks. This module gives
  * the events stream a typed model and a typed `Aggregator` for the
  * per-user rollup — the Catalyst plan is identical to the untyped
  * `groupBy().agg()` (ser/de elision via Tungsten encoders), so typing
  * costs nothing at execution time.
  */
object TypedPipeline {

  final case class Event(
      event_id: Long, ts_ns: Long, user_id: Long,
      event_type: String, value: Double)

  final case class UserStats(
      n: Long, purchases: Long, total: Double, maxValue: Double)

  def events(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    graft.sources.Tables.events(spark, dir)
      .select("event_id", "ts_ns", "user_id", "event_type", "value")
      .as[Event]
  }

  /** Typed commutative aggregator: one pass, mergeable partials — the
    * typed equivalent of A3's filtered sums. */
  object UserStatsAgg extends Aggregator[Event, UserStats, UserStats] {
    def zero: UserStats = UserStats(0L, 0L, 0.0, Double.MinValue)
    def reduce(b: UserStats, e: Event): UserStats = UserStats(
      b.n + 1,
      b.purchases + (if (e.event_type == "purchase") 1 else 0),
      b.total + e.value,
      math.max(b.maxValue, e.value))
    def merge(a: UserStats, b: UserStats): UserStats = UserStats(
      a.n + b.n, a.purchases + b.purchases, a.total + b.total,
      math.max(a.maxValue, b.maxValue))
    def finish(r: UserStats): UserStats = r
    def bufferEncoder: Encoder[UserStats] = Encoders.product[UserStats]
    def outputEncoder: Encoder[UserStats] = Encoders.product[UserStats]
  }

  def userStats(ev: Dataset[Event]): Dataset[(Long, UserStats)] = {
    import ev.sparkSession.implicits._
    ev.groupByKey(_.user_id).agg(UserStatsAgg.toColumn.name("stats"))
  }
}
