package graft.queries

import graft.Q

/** SURVEY §2b group H — UDF/UDAF/UDTF. Filled in M2. */
object UdxQueries {
  def all: Seq[Q] = Seq.empty
}
