package graft.operators

import graft.Q

/** SURVEY §2b group L — LLM-pipeline operators. Filled in M5. */
object LlmQueries {
  def all: Seq[Q] = Seq.empty
}
