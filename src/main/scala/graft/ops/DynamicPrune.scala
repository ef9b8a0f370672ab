package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Dynamic file pruning for star-schema joins — the runtime half of data
 * skipping. A selective filter on a dimension table implies most FACT
 * files contain no matching join key, but a planning-time rule cannot
 * know which: the matching keys only exist once the dimension side has
 * run. This operator makes Delta's dynamic file pruning explicit as a
 * deterministic two-phase join (Spark's own `InjectRuntimeFilter` stops
 * at ROW-level bloom filters on the shuffle input — the fact files are
 * still all READ):
 *
 *  1. execute the (small, filtered) dimension side and collect its
 *     distinct join keys, bounded by `maxKeys` — the same driver-memory
 *     contract as a broadcast join's build side;
 *  2. push the keys into the fact scan as a literal predicate, which the
 *     qbeast file index prunes at FILE level: up to
 *     [[DynamicPrune.OrDisjunctCap]] keys become an OR-of-equalities
 *     (each equality its own point query space, so the OTree prunes even
 *     on scattered keys — an IN list would collapse to one covering
 *     range, see `read/QuerySpecBuilder`); beyond that an IN list still
 *     prunes per-file through min/max and bloom stats
 *     (`read/FileStatsPruning`);
 *  3. run the plain inner equi-join over the pruned fact side.
 *
 * Above `maxKeys` DISTINCT keys the key push-down cannot be
 * driver-bounded; the operator falls back to [[Sketch.bloomPreFilter]]
 * (a fixed-size bitset built from the dimension side, applied row-level
 * ahead of the fact shuffle) — still one bounded driver artifact, still
 * exactly the inner join.
 *
 * Correctness is mode-independent: the pushed predicate only removes
 * fact rows whose key matches NO dimension row (the bloom has no false
 * negatives), so every branch returns exactly
 * `fact JOIN dim ON fact(factKey) = dim(dimKey)`.
 *
 * At 100 TB this is the difference between scanning the week's files a
 * dashboard's dimension filter actually touches and scanning the whole
 * fact table to feed a join that drops 99.9% of it.
 */
object DynamicPrune {

  /** Keys at or below this count push down as OR-of-equalities, which
   * the OTree expands into per-key point spaces (must not exceed
   * QuerySpecBuilder.MaxDisjuncts, or the whole disjunction falls back
   * to the unpruned space). */
  val OrDisjunctCap = 32

  /** Default distinct-key cap — the scale of an IN list the driver and
   * every task-side stats probe handle comfortably. */
  val DefaultMaxKeys = 1024

  def dynamicPrunedJoin(
      fact: DataFrame,
      factKey: String,
      dim: DataFrame,
      dimKey: String,
      maxKeys: Int = DefaultMaxKeys): DataFrame = {
    require(maxKeys >= 1, s"maxKeys must be positive, got $maxKeys")
    // NULL keys never satisfy an equi-join: dropping them keeps the
    // collected key set minimal and the pushed predicate null-free
    val distinctKeys = dim.select(col(dimKey)).na.drop().distinct()
    // limit(maxKeys + 1): the driver learns "more than maxKeys" without
    // ever holding more than maxKeys + 1 rows
    val keys = distinctKeys.limit(maxKeys + 1).collect().map(_.get(0))
    val joined: (DataFrame => DataFrame) = prunedFact =>
      prunedFact.join(dim, prunedFact(factKey) === dim(dimKey))
    if (keys.length > maxKeys) {
      // key set too large to inline — fall back to the fixed-size bloom
      // pre-filter (row-level, no false negatives), then the plain join
      joined(Sketch.bloomPreFilter(fact, col(factKey), dim, col(dimKey)))
    } else if (keys.isEmpty) {
      // empty dimension side: the inner join is empty; keep the shape
      // (schema, columns) while letting the scan prune everything
      joined(fact.filter(lit(false)))
    } else if (keys.length <= OrDisjunctCap) {
      val predicate = keys.map(k => col(factKey) === lit(k)).reduce(_ || _)
      joined(fact.filter(predicate))
    } else {
      joined(fact.filter(col(factKey).isin(keys.toIndexedSeq: _*)))
    }
  }

}
