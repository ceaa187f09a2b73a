package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query: a Spark DataFrame builder plus (when the semantics are
  * ANSI-SQL-expressible) an equivalent DuckDB SQL string the driver runs as a
  * correctness oracle (hash-compared column-by-column, see Verify.scala).
  *
  * Contract notes (driver compare, see the builder prompt):
  *  - column names must match exactly between Spark result and oracle SQL;
  *  - every floating-point output is either a raw passed-through column or
  *    rounded/decimal-cast so both engines produce bit-identical doubles;
  *  - every query ends in a total deterministic ORDER BY on both sides.
  */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    /** include in the Bench headline set */
    bench: Boolean = false)

object Registry {
  lazy val all: Seq[Q] =
    Relational.qs ++ RagQueries.qs ++ PipelineQueries.qs ++
      TextQueries.qs ++ DedupQueries.qs ++ TimeQueries.qs

  lazy val byName: Map[String, Q] = {
    val m = all.map(q => q.name -> q).toMap
    require(m.size == all.size, "duplicate query names in Registry")
    m
  }
}
