package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via mapGroupsWithState (SURVEY §2.12 extension:
  * KeyValueGroupedDataset state, the Structured Streaming primitive the
  * reference never needed because its pipeline was stateless).
  *
  * Tracks a running per-city profile of the posting stream: count,
  * cumulative salary, max salary seen. State is one fixed-size record per
  * key — executor memory scales with key cardinality (cities), never with
  * stream length. NoTimeout keeps batches purely data-driven (with
  * ProcessingTimeTimeout the engine schedules timeout-check batches
  * forever, which wedges processAllAvailable-style test harnesses; for
  * production TTL eviction, switch to EventTimeTimeout + watermark).
  */
object Sessionize {

  case class PostingEvent(city: String, salary_avg: Double)
  case class CityProfile(city: String, n_postings: Long,
      total_salary: Double, max_salary: Double)

  def updateProfile(
      city: String,
      events: Iterator[PostingEvent],
      state: GroupState[CityProfile]): CityProfile = {
    val prev = state.getOption.getOrElse(CityProfile(city, 0L, 0.0, 0.0))
    val next = events.foldLeft(prev) { (acc, e) =>
      CityProfile(city, acc.n_postings + 1,
        acc.total_salary + e.salary_avg, math.max(acc.max_salary, e.salary_avg))
    }
    state.update(next)
    next
  }

  /** cleaned postings stream → per-city running profiles (update mode). */
  def cityProfiles(etl: Dataset[_]): Dataset[CityProfile] = {
    implicit val eventEnc = Encoders.product[PostingEvent]
    implicit val profileEnc = Encoders.product[CityProfile]
    etl.select("city", "salary_avg").as[PostingEvent]
      .groupByKey(_.city)(Encoders.STRING)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateProfile)
  }

  val outputMode: OutputMode = OutputMode.Update()
}
