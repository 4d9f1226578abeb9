package graft.plans

import graft.Q

/** SURVEY §2a reference-semantics layer (M3). Filled in M3. */
object PlanPipeline {
  def all: Seq[Q] = Seq.empty
}
