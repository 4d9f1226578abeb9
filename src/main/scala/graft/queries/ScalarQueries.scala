package graft.queries

import graft.Q

/** SURVEY §2b group G — scalar functions. Filled in M2. */
object ScalarQueries {
  def all: Seq[Q] = Seq.empty
}
