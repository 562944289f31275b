package graft.queries

/** Training-data pipeline operators (dedup, similarity, text analysis)
  * over the `documents` and `embeddings` tables.
  */
object TextOps {
  def all: Seq[Q] = Seq.empty
}
