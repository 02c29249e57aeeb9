package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join: every left row picks the LATEST right row of the
  * same key whose timestamp is ≤ (or strictly <) its own — the
  * "enrich each event with the most recent preceding state" primitive of a
  * log pipeline (attribution, config-at-time-of-event, price-as-of-trade;
  * pandas `merge_asof` / DuckDB `ASOF JOIN` semantics, which Spark has no
  * native operator for).
  *
  * Spark-first shape — a RANGE JOIN WITHOUT THE RANGE: the naive
  * `l.join(r, key && r.ts <= l.ts)` + max-per-left explodes to every
  * (left, earlier-right) pair — quadratic per key — and Catalyst plans
  * non-equi conditions as a join-then-filter, so 100 TB would produce
  * petabyte intermediates. Instead both sides UNION into one stream tagged
  * by side, shuffle ONCE on the key, and a per-key time-ordered running
  * `last(right_payload, ignoreNulls)` carries the newest right row forward
  * to every later left row — the classic sort-merge as-of, expressed
  * declaratively so Catalyst keeps it in one Exchange + one Window (the
  * window sort rides the shuffle's local sort; no second shuffle, no
  * blowup). Per-key skew = per-key row count, the same bound as any
  * windowed op over the stream.
  *
  * `>=` vs `>` is an ORDERING choice, not a filter: at equal timestamps the
  * right row sorts before the left row (side 0 < 1) so the running last()
  * already includes it — inclusive semantics; `strict = true` flips the
  * side tags so an equal-ts right row sorts after the left row and falls
  * outside its `rowsBetween(unboundedPreceding, currentRow)` frame.
  * Among several right rows sharing (key, ts) the running last() keeps the
  * one sorting highest — the struct-lexicographic max of the right payload
  * — a deterministic tie, not a task-order accident.
  *
  * The matched right row lands as one nullable struct column
  * (`matchedName`), so left/right column-name collisions cannot happen and
  * an unmatched left row is a plain NULL struct (left-join semantics).
  */
object AsOf {

  /** As-of join `left` to `right` on equal `key` and right.`ts` ≤ left.`ts`
    * (strictly < when `strict`). Both sides must carry `key` and `ts`
    * columns of identical types. Returns every left row (all its columns)
    * plus `matchedName`: the full matched right row as a struct, NULL when
    * no right row precedes.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      matchedName: String = "asof", strict: Boolean = false): DataFrame = {
    require(!left.columns.contains(matchedName),
      s"left already has a column named $matchedName")
    Seq(key, ts).foreach { c =>
      val lt = left.schema(c).dataType; val rt = right.schema(c).dataType
      require(lt == rt, s"$c type mismatch: left $lt vs right $rt")
    }
    val lStruct = struct(left.columns.map(col): _*)
    val rStruct = struct(right.columns.map(col): _*)
    val lType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val rType = org.apache.spark.sql.types.StructType(right.schema.fields)
    // equal-ts ordering encodes the inequality (see scaladoc)
    val (rSide, lSide) = if (strict) (1, 0) else (0, 1)
    val u = left.select(col(key).as("_k"), col(ts).as("_t"),
        lit(lSide).as("_side"), lStruct.as("_l"),
        lit(null).cast(rType).as("_r"))
      .unionByName(right.select(col(key).as("_k"), col(ts).as("_t"),
        lit(rSide).as("_side"), lit(null).cast(lType).as("_l"),
        rStruct.as("_r")))
    // _r as the final sort key: ties among right rows at one (key, ts)
    // resolve to the struct-lexicographic max (left rows' null _r is
    // side-segregated already, so its ordering never matters)
    val timeline = Window.partitionBy("_k")
      .orderBy(col("_t"), col("_side"), col("_r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn(matchedName, last(col("_r"), ignoreNulls = true).over(timeline))
      .filter(col("_side") === lit(lSide))
      .select(left.columns.map(c => col("_l").getField(c).as(c)) :+
        col(matchedName): _*)
  }
}
