package graft.operators

/** The sketch family's ONE splitmix64 finalizer — shared by the KLL
  * compaction offsets ([[Quantiles]]) and the reservoir's Algorithm-R /
  * merge draws ([[Reservoir]]), so the counter-seeded determinism both
  * sketches promise rests on a single definition. (Bench's calibration
  * probe keeps its own inlined copy ON PURPOSE: that loop's timing must
  * stay bit-identical across rounds for calib comparability, so it is
  * frozen rather than shared.)
  */
private[graft] object Rng {
  def splitmix64(seed: Long): Long = {
    var x = seed + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
}
