"""Integer fixed-point SGNS over walk corpora (operators/sgns.py):
the whole training trajectory — walks, pairs, md5 negatives, seeded
init, hard-sigmoid batch rounds — pinned against an INDEPENDENT
pure-Python recurrence, including two stacked rounds (synchronous
update semantics) and the floor-division convention on negatives."""

from __future__ import annotations

import hashlib

from barkingowl_spark.operators.sgns import (
    LR_DEN,
    SCALE,
    sgns_train,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_sgns(edges, dim, rounds, walk_len=3, negatives=2,
             scale=SCALE, lr_den=LR_DEN):
    """Independent recurrence: plain dict/list math, no Spark."""
    from collections import Counter, defaultdict

    adj = defaultdict(set)
    nodes = set()
    for s, d in edges:
        adj[s].add(d)
        nodes.update((s, d))
    nbr = {s: sorted(ds) for s, ds in adj.items()}

    # walks (walks.py contract: one per node, md5 neighbor picks)
    walks = {}
    for u in sorted(nodes):
        cur, path = u, [u]
        for t in range(1, walk_len + 1):
            outs = nbr.get(cur)
            if not outs:
                break
            cur = outs[_h60(f"walk#{u}#{t}") % len(outs)]
            path.append(cur)
        walks[u] = path

    pairs = []
    for path in walks.values():
        for a, b in zip(path, path[1:]):
            pairs.append((a, b))
            pairs.append((b, a))

    vocab = sorted(nodes)  # vid = index + 1
    ex = Counter()
    for c, x in pairs:
        ex[(c, x, 1)] += 1
        for j in range(1, negatives + 1):
            n = vocab[_h60(f"sgnsneg#{c}#{x}#{j}") % len(vocab)]
            ex[(c, n, 0)] += 1

    half, quarter = scale // 2 + 1, scale // 4
    emb = {
        side: {
            (u, d): _h60(f"{tag}#{u}#{d}") % half - quarter
            for u in vocab for d in range(dim)
        }
        for side, tag in (("in", "sgnsin"), ("out", "sgnsout"))
    }

    for _ in range(rounds):
        din, dout = Counter(), Counter()
        for (c, o, label), m in ex.items():
            dot = sum(emb["in"][(c, d)] * emb["out"][(o, d)]
                      for d in range(dim))
            s = min(scale, max(0, dot // (4 * scale) + scale // 2))
            g = (label * scale - s) // lr_den  # Python // floors
            for d in range(dim):
                din[(c, d)] += m * ((g * emb["out"][(o, d)]) // scale)
                dout[(o, d)] += m * ((g * emb["in"][(c, d)]) // scale)
        for k, v in din.items():
            emb["in"][k] += v
        for k, v in dout.items():
            emb["out"][k] += v
    return {(side, u, d): emb[side][(u, d)]
            for side in ("in", "out") for u in vocab
            for d in range(dim)}


def _edges(n=40):
    return [(u, (u * u + 13 * k) % n) for u in range(n)
            for k in (1, 2, 3)]


def test_one_round_matches_python(spark):
    edges = _edges()
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r["side"], r["node"], r["d"]): r["val"]
           for r in sgns_train(df, dim=4, rounds=1).collect()}
    assert got == _py_sgns(edges, dim=4, rounds=1)


def test_two_rounds_are_synchronous(spark):
    """Round 2 must consume round 1's embeddings wholesale — any
    in-round leakage (asynchronous update) diverges from the batch
    recurrence immediately."""
    edges = _edges(24)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r["side"], r["node"], r["d"]): r["val"]
           for r in sgns_train(df, dim=3, rounds=2).collect()}
    exp = _py_sgns(edges, dim=3, rounds=2)
    assert got == exp
    # and the trajectory actually moved (the test isn't vacuous)
    assert exp != _py_sgns(edges, dim=3, rounds=0)


def test_positive_pairs_gain_similarity(spark):
    """Direction check on the objective: after a few rounds, the
    mean in.out dot over positive pairs must exceed the mean over
    the md5 negatives (the SGNS contrast, in fixed point)."""
    edges = _edges(30)
    exp0 = _py_sgns(edges, dim=4, rounds=0)
    exp3 = _py_sgns(edges, dim=4, rounds=3)

    import hashlib as _h
    from collections import defaultdict

    adj = defaultdict(set)
    nodes = set()
    for s, d in edges:
        adj[s].add(d)
        nodes.update((s, d))
    nbr = {s: sorted(ds) for s, ds in adj.items()}
    pairs = []
    for u in sorted(nodes):
        cur, path = u, [u]
        for t in range(1, 4):
            outs = nbr.get(cur)
            if not outs:
                break
            cur = outs[_h60(f"walk#{u}#{t}") % len(outs)]
            path.append(cur)
        for a, b in zip(path, path[1:]):
            pairs.append((a, b))

    def mean_dot(emb, ps):
        tot = 0
        for c, x in ps:
            tot += sum(emb[("in", c, d)] * emb[("out", x, d)]
                       for d in range(4))
        return tot / max(1, len(ps))

    vocab = sorted(nodes)
    negs = [(c, vocab[_h60(f"sgnsneg#{c}#{x}#1") % len(vocab)])
            for c, x in pairs]
    gap0 = mean_dot(exp0, pairs) - mean_dot(exp0, negs)
    gap3 = mean_dot(exp3, pairs) - mean_dot(exp3, negs)
    assert gap3 > gap0


def test_round_lineage_flat(spark):
    """localCheckpoint pins each round: the optimized plan of the
    round-3 result must be no deeper than round-1's (PLANS.md 'SGNS
    round lineage')."""
    df = spark.createDataFrame(_edges(20), "src long, dst long")

    def plan_lines(d):
        return len(d._jdf.queryExecution().optimizedPlan()
                   .toString().splitlines())

    assert plan_lines(sgns_train(df, dim=2, rounds=3)) <= \
        plan_lines(sgns_train(df, dim=2, rounds=1))
