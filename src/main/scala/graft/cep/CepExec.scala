package graft.cep

import org.apache.spark.sql.{Column, DataFrame}
import graft.sql._
import graft.plan.Resolver

/** MATCH_RECOGNIZE execution (reference: cep/ package — SQL:2016 NFA engine).
  * Implemented in a later milestone of this round: groupByKey(partition) +
  * per-key ordered NFA scan (batch), flatMapGroupsWithState (streaming). */
object CepExec {
  def run(df: DataFrame, q: Query, resolver: Resolver, ord: Any): DataFrame =
    throw new UnsupportedOperationException("MATCH_RECOGNIZE: not yet implemented")
}
