package graft.model

import scala.util.Random

/** Seeded generator for the reference's taxi-event CSV fixture
  * (FIXTURES.md §A): two events per ride (START then END), the union
  * time-sorted like `convertTrips.sh:35`, covering ≥ 45 min of event
  * time, with a fraction of out-of-NYC points (exercises the bbox
  * filter) and drop-offs clustered on hot cells so some
  * (cell, 15-min window) exceed the 50-passenger early threshold
  * (`examples/EarlyArrivalCount.scala:58`).
  */
object TaxiFixture {

  val BaseMs: Long = 1357000200000L // 2013-01-01 00:30:00 UTC

  /** Hot drop-off points (inside the bbox, distinct cells). */
  val HotSpots: Seq[(Double, Double)] = Seq(
    (-73.991, 40.750), (-73.982, 40.768), (-74.005, 40.741))

  final case class Ride(
      rideId: Long,
      startMs: Long,
      endMs: Long,
      startLon: Double,
      startLat: Double,
      endLon: Double,
      endLat: Double,
      passengers: Int)

  def rides(nRides: Int, seed: Long = 42L): Seq[Ride] = {
    val rnd = new Random(seed)
    (0 until nRides).map { i =>
      // departures bunched so hot windows accumulate > 50 passengers
      val startMs = BaseMs + rnd.nextInt(60 * 60 * 1000) // 60-min span
      val durMs = (3 + rnd.nextInt(12)) * 60 * 1000
      val outOfTown = rnd.nextDouble() < 0.1
      val (sLon, sLat) =
        if (outOfTown) (-74.3 + rnd.nextDouble() * 0.1, 40.2 + rnd.nextDouble() * 0.1)
        else inBbox(rnd)
      val (eLon, eLat) =
        if (rnd.nextDouble() < 0.7) jitter(rnd, HotSpots(rnd.nextInt(HotSpots.size)))
        else inBbox(rnd)
      Ride(i.toLong, startMs, startMs + durMs, sLon, sLat, eLon, eLat,
        1 + rnd.nextInt(6))
    }
  }

  private def inBbox(rnd: Random): (Double, Double) =
    (-74.05 + rnd.nextDouble() * 0.35, 40.5 + rnd.nextDouble() * 0.5)

  private def jitter(rnd: Random, p: (Double, Double)): (Double, Double) =
    (p._1 + (rnd.nextDouble() - 0.5) * 0.0005, p._2 + (rnd.nextDouble() - 0.5) * 0.0004)

  /** CSV lines in the reference wire format, time-sorted. */
  def csvLines(nRides: Int, seed: Long = 42L): Seq[String] = {
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern(TaxiRide.TimePattern).withZone(java.time.ZoneOffset.UTC)
    def ts(ms: Long) = fmt.format(java.time.Instant.ofEpochMilli(ms - ms % 1000))
    rides(nRides, seed).flatMap { r =>
      Seq(
        (r.startMs, s"${r.rideId},${ts(r.startMs)},START,${r.startLon},${r.startLat},${r.passengers},-1.0"),
        (r.endMs, s"${r.rideId},${ts(r.endMs)},END,${r.endLon},${r.endLat},${r.passengers},2.5"))
    }.sortBy(_._1).map(_._2)
  }
}
