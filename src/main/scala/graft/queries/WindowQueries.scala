package graft.queries

import graft.Q

/** SURVEY §2b group E — window functions. Filled in M2. */
object WindowQueries {
  def all: Seq[Q] = Seq.empty
}
