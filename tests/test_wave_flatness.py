"""Long-horizon wave-cost flatness (r02 verdict item 5).

The O(waves x archive) read and the per-wave lineage blowup are the
two ways a frontier loop silently turns quadratic over a long crawl.
test_archive_compaction pins final dir counts at 15 waves; this test
runs a 24-wave chain and asserts the per-wave cost curve itself is
FLAT, using host-noise-immune proxies sampled every wave from inside
the loop (via the CrawlConfig.link_filter hook, which receives the
candidate-links frame each wave):

  * analyzed-plan line count of the wave's links frame — lineage
    accretion (the r01 originStats pathology, un-truncated
    checkpoints, an archive union growing per wave) shows up here as
    a monotone climb;
  * checkpoint-dir entry count — compaction keeps the number of
    archive delta dirs bounded at EVERY wave, not just the last;
  * wall time per wave (BOW_TIMING) — ADVISORY: printed, and bounded
    only through a noise-robust Theil-Sen slope with a generous
    allowance, because this VM's throttling swings 2x within minutes
    (CLAUDE.md).
"""

from __future__ import annotations

import os
import statistics

from barkingowl_spark.plans.crawl import CrawlConfig, run_crawl
from barkingowl_spark.schemas import PAGES_SCHEMA, SEED_SCHEMA

WAVES = 24


def _chain_corpus(spark, n):
    from fixtures.gen_pages import PDF_BODY, _page, pages_rows

    pages = {}
    for i in range(n + 1):
        hrefs = [f"/p{i + 1}"] if i < n else []
        hrefs.append(f"d{i}.pdf")
        pages[f"http://flat.test/p{i}"] = _page(f"c{i}", "x y z", hrefs)
        pages[f"http://flat.test/d{i}.pdf"] = PDF_BODY
    seeds = [("http://flat.test/p0", "c", "f", n, "application/pdf",
              0, 0)]
    return (
        spark.createDataFrame(pages_rows(pages), PAGES_SCHEMA),
        spark.createDataFrame(seeds, SEED_SCHEMA),
    )


def _theil_sen(ys):
    slopes = [
        (ys[j] - ys[i]) / (j - i)
        for i in range(len(ys)) for j in range(i + 1, len(ys))
    ]
    return statistics.median(slopes)


def test_24_wave_run_has_flat_per_wave_cost(
    spark, tmp_path_factory, capfd, monkeypatch
):
    pages_df, seeds_df = _chain_corpus(spark, WAVES - 1)
    ckpt = str(tmp_path_factory.mktemp("flat"))
    plan_nodes, dir_counts = [], []

    def archive_dirs():
        # what read_archive actually unions: per-wave archive delta
        # dirs still on disk + compacted fold dirs (empty wave=K
        # manifest shells left for resume are read-cost-free)
        n = 0
        for e in os.listdir(ckpt):
            if e.startswith("wave=") and os.path.isdir(
                    os.path.join(ckpt, e, "data", "_t=archive")):
                n += 1
        comp = os.path.join(ckpt, "compact")
        if os.path.isdir(comp):
            n += len(os.listdir(comp))
        return n

    def probe(links):
        plan_nodes.append(
            links._jdf.queryExecution().analyzed().toString()
            .count("\n"))
        dir_counts.append(archive_dirs())
        return links

    monkeypatch.setenv("BOW_TIMING", "1")
    state = run_crawl(
        spark, seeds_df, pages_df,
        CrawlConfig(checkpoint_dir=ckpt, archive_compact_every=3,
                    link_filter=probe),
    )
    assert state.wave >= WAVES - 1
    assert state.documents.count() == WAVES  # one pdf per chain page

    # ---- stable proxy 1: no lineage accretion. The links plan must
    # not grow with wave index: compare the late-wave plateau against
    # the early one (first two waves may differ while caches settle).
    early = max(plan_nodes[2:6])
    late = max(plan_nodes[-6:])
    assert late <= early + 2, plan_nodes

    # ---- stable proxy 2: compaction bounds the checkpoint dir count
    # at EVERY wave. Entries grow by ~2/wave without compaction; with
    # compact_every=3 the count must plateau (oscillating inside a
    # small window), so the max over the last third must not exceed
    # the max over the middle third by more than the compaction
    # window itself.
    third = len(dir_counts) // 3
    assert max(dir_counts[-third:]) <= max(
        dir_counts[third:2 * third]) + 3, dir_counts

    # ---- advisory: per-wave wall time slope (Theil-Sen over the
    # BOW_TIMING compute+metrics+write+load components; generous bound
    # because the host throttles). A quadratic archive read would give
    # slope ~ O(median); flat loops measure well under 10%.
    cap = capfd.readouterr()
    lines = [ln for ln in (cap.out + cap.err).splitlines()
             if ln.startswith("BOW_TIMING wave=")]
    times = []
    for ln in lines:
        parts = dict(
            kv.split("=") for kv in ln.split()[1:] if "=" in kv)
        times.append(sum(
            float(parts[k]) for k in ("compute", "metrics", "write",
                                      "load")))
    assert len(times) >= WAVES - 2, f"timing lines missing: {lines[:3]}"
    med = statistics.median(times)
    slope = _theil_sen(times)
    print(f"\n[wave-flatness] median {med:.2f}s/wave, "
          f"theil-sen slope {slope * 1000:.1f} ms/wave, "
          f"plan nodes {plan_nodes[0]}->{plan_nodes[-1]}, "
          f"dirs max {max(dir_counts)}")
    assert slope <= 0.25 * med, (times, slope, med)
