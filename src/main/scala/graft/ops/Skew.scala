package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew handling for hot-cell joins (SURVEY.md §4.3 item 3; north_star:
 * "salted broadcast joins for hot cells").
 *
 * ccTLD-derived geotags are pathologically hot: every `.de` page lands
 * within ±2° of one centroid, so a handful of cells carry percent-level
 * key mass. A shuffle equi-join on `cell` then puts all of `.de` into
 * one reducer. Remedies, in preference order:
 *
 *  1. `broadcast(small)` — no shuffle of the big side at all; skew
 *     irrelevant. Used wherever the dim side fits (points, polygons,
 *     manifests — the default throughout this engine).
 *  2. Salting (this object) — when BOTH sides are too big to
 *     broadcast: the big side appends `salt = pmod(hash(row-unique),
 *     S)` to the key; the small side explodes each row S times with
 *     salt 0..S-1. The join key becomes (key, salt): a hot key's rows
 *     spread over S reducers. Result set is IDENTICAL to the plain
 *     join (each big-side row meets exactly one replica).
 *  3. AQE skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on
 *     by default) — runtime residual; salting composes with it.
 */
object Skew {

  /** Equi-join `big ⋈ small` on `keys`, salted with factor `s`.
    * `saltSrc` must be a deterministic per-row column of the big side
    * (e.g. a row id) so the salt spreads uniformly; output columns =
    * big's ++ small's non-key columns, exactly like a plain inner
    * equi-join on `keys`. */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                     saltSrc: Column, s: Int = 16): DataFrame = {
    // a salt derived from the join key itself gives every row of a hot
    // key the SAME salt — a plain join in disguise, zero skew spreading
    // (best-effort guard: catches the bare-column misuse; composite
    // expressions over key columns remain the caller's responsibility)
    require(!keys.contains(saltSrc.toString()),
      s"saltSrc ($saltSrc) must be a per-row-unique column of the big " +
        "side (e.g. a row id), not a join key — salting by the key " +
        "assigns a hot key's rows one salt and spreads nothing")
    val saltedBig = big.withColumn("_salt", pmod(hash(saltSrc), lit(s)))
    val saltedSmall = small.withColumn("_salt",
      explode(array((0 until s).map(lit): _*)))
    saltedBig.join(saltedSmall, keys :+ "_salt").drop("_salt")
  }
}
