"""Connected components over an edge list — the clustering step that
turns pairwise near-duplicate hits (operators/dedup.py) into dedup
clusters with one canonical representative each.

Algorithm: iterative min-label propagation. Every node starts labeled
with its own id; each round a node takes the minimum label among itself
and its neighbors; at fixpoint every node in a component carries the
component's minimum id. The result is a pure function of the edge set
(no ordering or partitioning sensitivity), which is what lets the
driver check it against a DuckDB recursive-CTE transitive closure.

Scale shape: each round is one join (edges ⋈ labels, both keyed on
node id — Catalyst reuses the hash partitioning across rounds) plus a
min-aggregate; rounds needed = component diameter. Near-dup clusters
are short-diameter by construction (a dup cluster is a clique-ish blob,
not a path), so 3-5 rounds close real corpora. For adversarial
long-chain graphs the upgrade is pointer doubling (large-star /
small-star, Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14) — same join primitive, O(log d) rounds; not needed
for the dedup workload this serves.

The per-round ``localCheckpoint`` truncates lineage (the iterated plan
would otherwise double per round and swamp the optimizer); the label
frame it materializes is one (id, label) pair per *node that appears in
an edge* — at 100 TB that is the near-dup subgraph, orders of magnitude
smaller than the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iters: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """(id, component) for every node appearing in ``edges``;
    ``component`` is the minimum node id reachable from ``id``.
    Raises if the propagation hasn't converged after ``max_iters``
    rounds (deterministic output is part of the contract — a truncated
    run would silently mislabel long chains).

    ``stats``: pass a dict to receive ``{"rounds": r, "state_rows": n}``
    — the convergence round count and the (id, label) state size, which
    is constant across rounds (one row per node in the edge set). Costs
    one extra count; used by ``scripts/scale_probe.py``.

    Tier choice: README "Choosing a dedup tier" decision table.
    """
    a = F.col(src).alias("a")
    b = F.col(dst).alias("b")
    # materialize the edge list once: every round (and every label
    # checkpoint) re-reads it, and the upstream plan that produced the
    # edges (e.g. the whole MinHash pipeline) must not be re-derived
    # per round
    sym = (
        edges.select(a, b)
        .unionAll(edges.select(b.alias("a"), a.alias("b")))
        .distinct()
        .localCheckpoint()
    )
    # Round-0 seed: label = min(self, direct neighbors) in ONE pass over
    # the symmetric edge list — clique-shaped dup clusters converge at
    # the seed, so the loop usually runs exactly one (no-change) round.
    labels = (
        sym.select(F.col("a").alias("id"), F.col("b").alias("label"))
        .unionAll(sym.select(F.col("a").alias("id"), F.col("a").alias("label")))
        .groupBy("id")
        .agg(F.min("label").alias("label"))
        .localCheckpoint()
    )
    for _round in range(max_iters):
        nbr = sym.join(labels, sym["b"] == labels["id"]).select(
            F.col("a").alias("id"), "label"
        )
        # the change flag rides inside the SAME checkpointed frame the
        # next round reads, so convergence costs a scan of materialized
        # rows (limit-1 short circuit), not a second join+shuffle job
        new = (
            labels.unionAll(nbr)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .join(labels.select("id", F.col("label").alias("_old")), "id")
            .select(
                "id", "label", (F.col("label") != F.col("_old")).alias("_chg")
            )
            .localCheckpoint()
        )
        changed = new.where("_chg").limit(1).count()
        labels = new.select("id", "label")
        if changed == 0:
            if stats is not None:
                stats["rounds"] = _round + 1
                stats["state_rows"] = labels.count()
            return labels
    raise RuntimeError(
        f"connected_components: no fixpoint after {max_iters} rounds "
        "(component diameter exceeds the iteration cap)"
    )
