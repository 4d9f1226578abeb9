package graft.queries

import graft.Q

/** SURVEY §2b group C — joins. Filled in M2. */
object JoinQueries {
  def all: Seq[Q] = Seq.empty
}
