package graft.util

/**
 * The reference's only doctested utilities (geoRpro utils.py:70-104),
 * kept for API parity. In the engine neither drives execution — Spark
 * partitions replace `gen_sublist`'s cpu_count-sized waves
 * (model.py:195-196) and the upper-triangle self-join with `a.id <
 * b.id` replaces `gen_current_front_pairs` (SURVEY.md F13/F14) — but a
 * user porting driver-side code keeps the exact shapes:
 *
 *   genSublist(Seq(1,2,3,4,5,6,7), 3) == Seq(Seq(1,2,3), Seq(4,5,6), Seq(7))
 *   genCurrentFrontPairs(Seq(1,2,3)) == Seq((1,2), (1,3), (2,3))
 */
object Batching {

  /** Blocks of length `inc`; a short trailing block is kept
    * (utils.py:70-89). */
  def genSublist[A](list: Seq[A], inc: Int): Iterator[Seq[A]] =
    list.grouped(inc)

  /** Upper-triangle (current, front) pairs (utils.py:91-104). */
  def genCurrentFrontPairs[A](list: Seq[A]): Iterator[(A, A)] =
    for {
      i <- list.indices.iterator if i < list.length - 1
      j <- (i + 1 until list.length).iterator
    } yield (list(i), list(j))

  /** F12 `sizeof_fmt` (script/filter_imgs.py:32-38): human-readable
    * byte size, exact format parity with the reference's
    * `"%3.1f%s%s"` ladder. */
  def sizeofFmt(num: Double, suffix: String = "B"): String = {
    val units = Seq("", "Ki", "Mi", "Gi", "Ti", "Pi", "Ei", "Zi")
    var n = num
    var i = 0
    while (i < units.length && math.abs(n) >= 1024.0) { n /= 1024.0; i += 1 }
    if (i < units.length) f"$n%3.1f${units(i)}$suffix" else f"$n%.1fYi$suffix"
  }
}
