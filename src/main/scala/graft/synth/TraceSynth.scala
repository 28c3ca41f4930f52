package graft.synth

/**
 * Deterministic GPS-trace synthesis — the graft's image-row → geometry
 * derivation (FIXTURES.md §2): the row's `phash` seeds a random walk of
 * k ∈ [2, 64] points, clustered so a few z14 tiles are hot (exercises
 * salting / skew handling) and so that ≥3 synthetic users overlap on known
 * pixels (exercises the k-anonymity HAVING).
 *
 * All randomness is java.util.Random (spec-pinned LCG ⇒ identical on every
 * JVM). No wall-clock, no global state.
 */
object TraceSynth {

  /** splitmix64 — deterministic seed scramble (public-domain PRNG finalizer). */
  def mix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D4BE45D2A9F2D1L ^ (x >>> 31)
    x
  }

  /** Cluster centers (lon, lat): one hot urban core + satellites. */
  val Centers: Array[(Double, Double)] = Array(
    (4.3517, 50.8503),   // hot: ~50% of traces land here
    (3.7174, 51.0543),
    (4.4025, 51.2194),
    (5.5797, 50.6337),
    (4.7005, 50.8798))

  /** Weighted cluster pick: index 0 gets half the mass. */
  def clusterOf(seed: Long): Int = {
    val r = java.lang.Long.remainderUnsigned(mix64(seed ^ 0xC105723AL), 10L).toInt
    if (r < 5) 0 else 1 + (r - 5) % (Centers.length - 1)
  }

  /** Lattice pitch (degrees): the synthetic "road grid". Traces walk along
    * lattice edges, so different users traverse identical segments and
    * overlap on identical pixels — this is what makes the k-anonymity
    * HAVING (and hot-tile skew) live in the synthetic world. */
  final val Pitch = 4e-4

  /** Hub grid: per city center, a HubGrid×HubGrid lattice of neighborhood
    * hubs spaced HubSpacing apart (~half a z14 tile), so the synthetic
    * world spans hundreds of z14 tiles. 20% of traces pin to hub 0 of
    * center 0 (the hot urban core — exercises skew/salting); the rest
    * scatter uniformly over all hubs. */
  final val HubGrid = 16
  final val HubSpacing = 0.01

  /** (hubLon, hubLat) for a seed. */
  def hubOf(seed: Long): (Double, Double) = {
    val h = mix64(seed ^ 0x48B5A1E6L)
    val hot = java.lang.Long.remainderUnsigned(h, 10L) < 2 // 20% hot core
    if (hot) Centers(0)
    else {
      val centerIdx = clusterOf(seed)
      val (clon, clat) = Centers(centerIdx)
      val cellIdx = java.lang.Long.remainderUnsigned(h >>> 8, (HubGrid * HubGrid).toLong).toInt
      val hx = cellIdx % HubGrid - HubGrid / 2
      val hy = cellIdx / HubGrid - HubGrid / 2
      (clon + hx * HubSpacing, clat + hy * HubSpacing)
    }
  }

  /**
   * Derive the trace for one row. `seed` is the row's phash.
   * Returns k ∈ [2,64] points as Array(lon, lat): a random walk on the
   * road lattice, starting within ±12 cells of the row's hub.
   */
  def trace(seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(mix64(seed))
    val k = 2 + rnd.nextInt(63) // [2, 64]
    val (hlon, hlat) = hubOf(seed)
    // lattice-vertex start near the hub (±12 cells ⇒ dense reuse of edges)
    var ix = math.round(hlon / Pitch) + (rnd.nextInt(25) - 12)
    var iy = math.round(hlat / Pitch) + (rnd.nextInt(25) - 12)
    val pts = new Array[Array[Double]](k)
    var i = 0
    while (i < k) {
      pts(i) = Array(ix * Pitch, iy * Pitch)
      // one cardinal lattice step
      rnd.nextInt(4) match {
        case 0 => ix += 1
        case 1 => ix -= 1
        case 2 => iy += 1
        case 3 => iy -= 1
      }
      i += 1
    }
    pts
  }

  /** user_id = phash mod U, non-negative (FIXTURES.md §2). */
  def userOf(phash: Long, users: Int): Long =
    java.lang.Long.remainderUnsigned(phash, users.toLong)
}
