"""Selection job (jobs/select_data.py): scorecard -> quotas ->
deterministic sampling -> splits -> epoch materialization, end to end
with planted host quality structure."""

from __future__ import annotations

import hashlib
import json

import pytest

BODY = ("the city council met on tuesday and the committee voted in "
        "favor of the zoning resolution after a public hearing was "
        "held downtown with residents of the district")
JUNK = "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk jj ii hh gg"


def _u(host, i):
    return int(hashlib.md5(f"{host}#{i}".encode()).hexdigest()[:15],
               16) % 1_000_000


def _split_of(i, val=100_000, test=100_000):
    u = int(hashlib.md5(f"split#{i}".encode()).hexdigest()[:15],
            16) % 1_000_000
    return "val" if u < val else ("test" if u < val + test else "train")


@pytest.fixture(scope="module")
def outdir(spark, tmp_path_factory, request):
    base = tmp_path_factory.mktemp("select")
    rows = []
    for i in range(0, 20):        # h1: clean, unique docs
        rows.append((i, BODY + f" extra{i}", "en", "h1", 1))
    for i in range(20, 40):       # h2: half the docs are dups
        body = BODY + " dup tail words" if i % 2 else BODY + f" u{i}"
        rows.append((i, body, "en", "h2", 1))
    for i in range(40, 50):       # h3: junk (fails quality) -> quota 0
        rows.append((i, JUNK + f" j{i}", "en", "h3", 1))
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long")
    docs.write.parquet(str(base / "docs"))
    from jobs.select_data import main

    main(["--documents", str(base / "docs"),
          "--out", str(base / "out"),
          "--val-ppm", "100000", "--test-ppm", "100000",
          "--budget-tokens", "100000000"])
    return base


def test_quota_sampling(spark, outdir, capsys):
    sample = {r["doc_id"]: r["keep"]
              for r in spark.read.parquet(
                  str(outdir / "out" / "sample")).collect()}
    # h1: quota 1e6 -> everything kept
    assert all(sample[i] for i in range(0, 20))
    # h3: quality floor -> quota 0 -> everything dropped
    assert not any(sample[i] for i in range(40, 50))
    # h2: dup_ppm per corpus-wide keeper rule; 9 of 20 docs are
    # non-keeper dups -> quota = 1e6 - 450000; draws decide
    for i in range(20, 40):
        assert sample[i] == (_u("h2", i) < 550_000), i


def test_splits_and_epochs(spark, outdir, capsys):
    splits = {r["doc_id"]: r["split"]
              for r in spark.read.parquet(
                  str(outdir / "out" / "splits")).collect()}
    sample = {r["doc_id"]: r["keep"]
              for r in spark.read.parquet(
                  str(outdir / "out" / "sample")).collect()}
    kept = {i for i, k in sample.items() if k}
    assert set(splits) == kept
    assert all(splits[i] == _split_of(i) for i in kept)
    # budget >> corpus -> every domain capped at 3 epochs exactly
    # (epochs_ppm == 3e6, zero fractional part)
    train = {i for i in kept if splits[i] == "train"}
    epochs = spark.read.parquet(str(outdir / "out" / "epochs")) \
        .collect()
    assert len(epochs) == 3 * len(train)
    per_doc = {}
    for r in epochs:
        per_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    assert all(sorted(v) == [1, 2, 3] for v in per_doc.values())
    assert set(per_doc) == train
