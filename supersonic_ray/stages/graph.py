"""Connected components for dedup clustering.

Near-dedup at corpus scale ends with a graph step: candidate-pair
stages (MinHash/LSH, SimHash, embedding near-dup — stages/text.py,
stages/vectors.py) emit DUPLICATE PAIRS, and keeping one doc per
duplicate CLASS requires the transitive closure of those pairs
(RefinedWeb/FineWeb run exactly this LSH → connected-components →
keep-one-per-cluster chain).  The reference engine has no graph ops;
this is a first-class beyond-reference component like the text stages.

Algorithm: min-label propagation.  Every node starts labeled with
itself; each round, labels flow across edges and every node keeps the
MINIMUM label seen (groupby-min).  Labels are monotone non-increasing,
so the TOTAL label sum strictly decreases until convergence — one tiny
scalar aggregate per round is an exact, distributed stop test.  Round
count = graph diameter, which for dedup graphs is small (duplicate
clusters are shallow); `max_iters` bounds adversarial chains.

Scale shape: each round is one hash join (labels ⋈ edges on the source
endpoint) plus one groupby-min over (node, label) pairs — both
adaptive/partitioned via stages/joins — and the per-round driver
traffic is a single scalar.  Nothing row-wise ever lands on the driver.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def connected_components(edges_ds, a_col: str = "a", b_col: str = "b", max_iters: int = 25):
    """Return a Dataset of (node, component) where component is the
    minimum node id reachable from `node` over the undirected edges.
    Nodes are the distinct edge endpoints (int-typed)."""
    from .joins import hash_join_auto

    def symmetrize(batch: pa.Table) -> pa.Table:
        fwd = pa.table({"src": batch.column(a_col), "dst": batch.column(b_col)})
        rev = pa.table({"src": batch.column(b_col), "dst": batch.column(a_col)})
        return pa.concat_tables([fwd, rev])

    edges = edges_ds.map_batches(symmetrize, batch_format="pyarrow").materialize()

    def init_labels(batch: pa.Table) -> pa.Table:
        n = pc.unique(batch.column("src"))
        return pa.table({"node": n, "label": n})

    labels = (
        edges.map_batches(init_labels, batch_format="pyarrow")
        .groupby("node")
        .min("label")
        .map_batches(
            lambda t: pa.table({"node": t.column("node"), "label": t.column("min(label)")}),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def label_sum(lds) -> int | None:
        # Dataset.sum returns None on an empty dataset
        s = lds.sum("label")
        if isinstance(s, dict):
            s = s.get("sum(label)")
        return None if s is None else int(s)

    prev_sum = label_sum(labels)
    if prev_sum is None:
        # zero edges (a perfectly normal LSH/MinHash outcome) → zero
        # nodes; return the empty (node, component) frame directly
        return labels.map_batches(
            lambda t: pa.table({"node": t.column("node"), "component": t.column("label")}),
            batch_format="pyarrow",
        )
    for _ in range(max_iters):
        # labels flow across edges: node's label reaches every neighbor
        flowed = hash_join_auto(edges, labels, ["src"], ["node"]).map_batches(
            lambda t: pa.table({"node": t.column("dst"), "label": t.column("label")}),
            batch_format="pyarrow",
        )
        merged = (
            labels.union(flowed)
            .groupby("node")
            .min("label")
            .map_batches(
                lambda t: pa.table({"node": t.column("node"), "label": t.column("min(label)")}),
                batch_format="pyarrow",
            )
            .materialize()
        )
        new_sum = label_sum(merged)
        labels = merged
        # labels are monotone non-increasing per node, so an unchanged
        # SUM is an exact convergence proof (no label can have risen)
        if new_sum == prev_sum:
            break
        prev_sum = new_sum

    return labels.map_batches(
        lambda t: pa.table({"node": t.column("node"), "component": t.column("label")}),
        batch_format="pyarrow",
    )
