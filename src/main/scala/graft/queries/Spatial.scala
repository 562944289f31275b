package graft.queries

/** Spatial operator queries over the deterministic synthetic mini-Goode
  * world (FIXTURES.md §1-§5). Populated as the spatial engine lands.
  */
object Spatial {
  def all: Seq[Q] = Seq.empty
}
