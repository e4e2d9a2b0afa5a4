"""Strongly connected components + Broder bow-tie web-graph decomposition.

(/root/reference is empty, see SURVEY §0; semantics here are defined by
the published algorithms cited below and pinned by this repo's oracle.)

Why a crawler cares: the web's directed link graph is the canonical
bow-tie (Broder et al., "Graph structure in the Web", WWW 2000) — a
giant strongly connected CORE, an IN region that reaches it, an OUT
region it reaches, TENDRILS/TUBES hanging off, and DISCONNECTED flotsam.
SCC membership and the bow-tie segment per node drive seed selection
(IN pages discover the core), crawl-priority (OUT-only hosts are
sinks), and spam forensics (link farms show up as anomalous mid-size
SCCs).

Algorithm: iterative min-label COLORING with backward confirmation —
the dataflow SCC of Orzan (2004) as used by FW-BW-Trim variants
(McLendon et al., JPDC 2005) and GraphFrames/Pregel renditions:

  repeat until no nodes remain:
    1. color(v)  = min node id that REACHES v in the remaining
       subgraph (min-propagation over reversed edges).  Every color
       class has its root r (color(r) = r = the class minimum).
    2. rcolor(v) = min node id v can reach through edges whose BOTH
       endpoints share v's color (min-propagation, forward).  By
       Orzan's lemma a path from v to its root r stays inside the
       color class, so  rcolor(v) == color(v)  <=>  v and r reach
       each other  <=>  v is in SCC(r).
    3. Emit those members with scc_id = color; peel them off.

Both propagations use POINTER JUMPING (label <- label[label], sound
because labels carry the reachability invariant "label(v) is reachable
from v" / "reaches v"), so a cycle of length L converges in O(log L)
rounds, not O(L) — same acceleration as components.py.  Outer rounds
are bounded by the depth of the color-class peeling order: on real web
graphs the giant SCC plus the singleton IN/OUT sea peel in a handful of
rounds (the Broder structure), though an adversarial long path degrades
to O(n) rounds — the known weakness of every coloring SCC; document,
don't hide.

Scale notes (10^10-node design point):
  * per round: one O(E) shuffle join (relax) + one O(V) join (jump) +
    map-side-combined min aggs; labels/edges are narrow longs.
  * iter_checkpoint() (operators/util.py) truncates iterative lineage
    every round AND resets the carried Catalyst size statistics (swap
    to checkpoint() + setCheckpointDir on a real cluster).  Plain
    localCheckpoint is NOT enough here, in either mode — measured on
    pyspark 4.1: eager=False leaves the logical plan untruncated
    (geometric per-round growth, JVM OOM by round ~22 on a 512-cycle);
    eager=True truncates the plan but carries originStats whose
    sizeInBytes SQUARES per round through the join-product estimator,
    and by round ~30 every planning pass multiplies million-bit
    BigIntegers on the driver (1.5s -> 266s rounds, executors idle).
    See iter_checkpoint's docstring for the measurements.
  * the giant SCC concentrates its *label* key, but groupBy-min partial
    aggregation combines hot labels map-side before the shuffle.
  * convergence tests are one count() action per round — O(log d)
    driver round-trips, same class as components.py / pagerank_fixed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from barkingowl_spark.operators.util import iter_checkpoint

_SUPER = -1  # supernode id for set-reachability probes; below any real id


def _min_reach(
    nodes: DataFrame, edges: DataFrame, max_rounds: int = 48
) -> DataFrame:
    """(node, label): label = MIN node id reachable from `node` by
    following `edges` (src -> dst) — including node itself.  `nodes`
    must cover every id that may appear as a label (i.e. all endpoints).
    Min-propagation + pointer jumping; RuntimeError if no fixpoint in
    max_rounds.

    Convergence honesty (measured): the jump accelerates only where the
    pointer graph v -> label(v) forms non-trivial chains.  Ids that
    DESCEND along a directed path double the covered distance per round
    (O(log d)); ids that ASCEND along the path (e.g. a 0->1->...->0
    cycle) leave label(v)=v ahead of the frontier, the jump is a no-op,
    and convergence is O(d) rounds — measured changed=1/round on a
    512-cycle.  Real crawl graphs carry hash-derived ids (random order
    along any chain), where expected rounds are polylog; an adversarial
    layout should be hash-remapped before propagation (remap node ids
    by a hash bijection, propagate, then recompute true min per class).
    """
    e = edges.select(F.col("src").alias("e_src"), F.col("dst").alias("e_dst"))
    labels = (
        nodes.select(F.col("node"))
        .withColumn("label", F.col("node"))
    )
    labels = iter_checkpoint(labels)
    for _ in range(max_rounds):
        relax = (
            e.join(labels, e["e_dst"] == labels["node"])
            .groupBy("e_src")
            .agg(F.min("label").alias("m"))
        )
        cand = (
            labels.join(relax, labels["node"] == relax["e_src"], "left")
            .select(
                labels["node"],
                F.least(
                    F.col("label"), F.coalesce("m", F.col("label"))
                ).alias("label"),
            )
        )
        # pointer jump: label <- label(label); label(v) is reachable
        # from v and label(label(v)) from label(v), so the composition
        # is a valid (accelerating) relaxation.
        lut = cand.select(
            F.col("node").alias("j_id"), F.col("label").alias("j_label")
        )
        new = (
            cand.join(lut, cand["label"] == lut["j_id"], "left")
            .select(
                cand["node"],
                F.least(
                    cand["label"], F.coalesce("j_label", cand["label"])
                ).alias("label"),
            )
        )
        new = iter_checkpoint(new)
        changed = (
            new.join(labels.withColumnRenamed("label", "prev"), "node")
            .filter(F.col("label") != F.col("prev"))
            .count()
        )
        labels = new
        if changed == 0:
            return labels
    raise RuntimeError(f"_min_reach: no fixpoint in {max_rounds} rounds")


def _reaches_set(
    nodes: DataFrame,
    edges: DataFrame,
    targets: DataFrame,
    max_rounds: int = 48,
) -> DataFrame:
    """(node, hit): hit = node has a directed path (length >= 0) to any
    row of `targets` (a (node) frame).  Supernode trick: add t -> -1
    for every target; -1 undercuts every real id, so hit <=> min
    reachable id == -1."""
    aug_edges = edges.select("src", "dst").union(
        targets.select(
            F.col("node").alias("src"),
            F.lit(_SUPER).cast("long").alias("dst"),
        )
    )
    aug_nodes = nodes.select("node").union(
        targets.select(F.lit(_SUPER).cast("long").alias("node")).limit(1)
    )
    got = _min_reach(aug_nodes, aug_edges, max_rounds)
    return (
        got.filter(F.col("node") != _SUPER)
        .select("node", (F.col("label") == _SUPER).alias("hit"))
    )


def _reverse(edges: DataFrame) -> DataFrame:
    return edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )


def _prep(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Dedup + drop self-loops; node set = edge endpoints (an isolated
    node never appears in an edge list, hence not in the output —
    same contract as components.connected_components)."""
    e = (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    e = iter_checkpoint(e)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    return e, iter_checkpoint(nodes)


def strongly_connected_components(
    edges: DataFrame, max_outer: int = 30, max_rounds: int = 48
) -> DataFrame:
    """(node, scc_id) for every edge endpoint; scc_id = minimum node id
    of the SCC (self for singleton SCCs).  Deterministic: everything is
    a min.  See module docstring for the algorithm + scale shape."""
    e_all, nodes = _prep(edges)
    remaining = nodes
    out: DataFrame | None = None
    for _ in range(max_outer):
        if remaining.count() == 0:
            assert out is not None
            return out
        e = (
            e_all.join(
                remaining.withColumnRenamed("node", "src"), "src", "semi"
            )
            .join(
                remaining.withColumnRenamed("node", "dst"), "dst", "semi"
            )
        )
        e = iter_checkpoint(e)
        # 1) color(v) = min id that reaches v  (min-reach on reversed e)
        colors = _min_reach(remaining, _reverse(e), max_rounds)
        colors = colors.withColumnRenamed("label", "color")
        # 2) class-internal edges, then rcolor = min id reachable inside
        #    the class (forward).
        c_src = colors.select(
            F.col("node").alias("src"), F.col("color").alias("src_c")
        )
        c_dst = colors.select(
            F.col("node").alias("dst"), F.col("color").alias("dst_c")
        )
        e_cc = (
            e.join(c_src, "src")
            .join(c_dst, "dst")
            .filter(F.col("src_c") == F.col("dst_c"))
            .select("src", "dst")
        )
        e_cc = iter_checkpoint(e_cc)
        rcolors = _min_reach(remaining, e_cc, max_rounds).withColumnRenamed(
            "label", "rcolor"
        )
        members = (
            colors.join(rcolors, "node")
            .filter(F.col("color") == F.col("rcolor"))
            .select("node", F.col("color").alias("scc_id"))
        )
        members = iter_checkpoint(members)
        out = (
            members
            if out is None
            else iter_checkpoint(out.union(members))
        )
        remaining = iter_checkpoint(
            remaining.join(members, "node", "left_anti")
        )
    raise RuntimeError(
        f"strongly_connected_components: not peeled in {max_outer} rounds"
    )


def scc_with_sizes(edges: DataFrame) -> DataFrame:
    """(node, scc_id, scc_size) — the driver-query surface."""
    scc = strongly_connected_components(edges)
    sizes = scc.groupBy("scc_id").agg(
        F.count(F.lit(1)).cast("long").alias("scc_size")
    )
    return scc.join(sizes, "scc_id").select("node", "scc_id", "scc_size")


def bowtie(edges: DataFrame, scc_labels: DataFrame | None = None) -> DataFrame:
    """(node, segment): Broder bow-tie decomposition against the LARGEST
    SCC (ties: smallest scc_id):

      CORE          in the largest SCC
      IN            reaches CORE, not in it
      OUT           reachable from CORE, not in it
      TUBE          rest of CORE's weak component, on an IN->OUT path
                    (reachable from IN and reaches OUT) that bypasses
                    the core
      TENDRIL       rest of CORE's weak component, hanging off one side
      DISCONNECTED  a different weak component entirely

    Each reachability flag is one supernode min-reach probe (pointer
    jumping, O(log d) rounds); the weak component comes from
    components.connected_components (pointer jumping too).  The only
    driver-side materialization is the 1-row largest-SCC argmax."""
    from barkingowl_spark.operators.components import connected_components

    e_all, nodes = _prep(edges)
    scc = (
        scc_labels
        if scc_labels is not None
        else strongly_connected_components(edges)
    )
    top = (
        scc.groupBy("scc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .agg(
            F.min(
                F.struct((-F.col("n")).alias("neg"), F.col("scc_id"))
            ).alias("m")
        )
        .select(F.col("m.scc_id").alias("core_id"))
        .collect()
    )
    core_id = top[0]["core_id"]
    core = iter_checkpoint(
        scc.filter(F.col("scc_id") == core_id).select("node")
    )

    reaches_core = _reaches_set(nodes, e_all, core).withColumnRenamed(
        "hit", "to_core"
    )
    from_core = _reaches_set(nodes, _reverse(e_all), core).withColumnRenamed(
        "hit", "from_core"
    )
    flags = iter_checkpoint(reaches_core.join(from_core, "node"))

    in_set = iter_checkpoint(
        flags.filter(F.col("to_core") & ~F.col("from_core")).select("node")
    )
    out_set = iter_checkpoint(
        flags.filter(F.col("from_core") & ~F.col("to_core")).select("node")
    )

    from_in = _reaches_set(nodes, _reverse(e_all), in_set).withColumnRenamed(
        "hit", "from_in"
    )
    to_out = _reaches_set(nodes, e_all, out_set).withColumnRenamed(
        "hit", "to_out"
    )

    wcc = connected_components(e_all, src="src", dst="dst").withColumnRenamed(
        "id", "node"
    )
    core_comp = (
        wcc.filter(F.col("node") == core_id).select("component_id").collect()
    )[0]["component_id"]

    seg = (
        flags.join(from_in, "node")
        .join(to_out, "node")
        .join(wcc, "node")
        .select(
            "node",
            F.when(
                F.col("to_core") & F.col("from_core"), F.lit("CORE")
            )
            .when(F.col("to_core"), F.lit("IN"))
            .when(F.col("from_core"), F.lit("OUT"))
            .when(
                F.col("component_id") != core_comp, F.lit("DISCONNECTED")
            )
            .when(F.col("from_in") & F.col("to_out"), F.lit("TUBE"))
            .otherwise(F.lit("TENDRIL"))
            .alias("segment"),
        )
    )
    return seg
