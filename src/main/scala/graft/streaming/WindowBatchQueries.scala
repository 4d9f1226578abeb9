package graft.streaming

import graft.Q

/** SURVEY §2b group S — event-time windowing, exercised in batch mode
  * (the same `window`/`session_window` expressions power the streaming
  * path; streaming-only behavior is covered by MemoryStream specs).
  * Filled in M4. */
object WindowBatchQueries {
  def all: Seq[Q] = Seq.empty
}
