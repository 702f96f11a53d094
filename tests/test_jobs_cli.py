"""spark-submit CLI surface (jobs/) — every ranker must be reachable
from the command line and rank-identical to its library call.

The jobs are driven in-process (their ``main(argv)``): ``getOrCreate``
reuses the test session, and ``SparkSession.stop`` is no-op'd for the
call so one JVM serves the whole module.  Output rows are read back
from captured stdout exactly as a shell user would see them.
"""

from __future__ import annotations

import importlib.util
import json
from pathlib import Path

import pytest

pytestmark = pytest.mark.usefixtures("spark")

REPO = Path(__file__).resolve().parent.parent
QUERY = "crystal meadow"


def _load_job(name):
    spec = importlib.util.spec_from_file_location(
        f"jobs_cli_{name}", REPO / "jobs" / f"{name}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _no_stop(fn, argv):
    """Run a job main() with SparkSession.stop patched out (the test
    session must survive the call)."""
    from pyspark.sql import SparkSession

    orig = SparkSession.stop
    SparkSession.stop = lambda self: None
    try:
        fn(argv)
    finally:
        SparkSession.stop = orig


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cli") / "idx")
    build = _load_job("build_index")
    _no_stop(
        build.main,
        [
            "--output", out,
            "--synthetic-pages", "300",
            "--analyzer", "tokens",
            "--buckets", "8",
            "--segments", "8",
            "--positions",
            "--impacts",
        ],
    )
    return out


@pytest.fixture(scope="module")
def cidx(spark, index_dir):
    from search_engine_spark.plans.build import load_compact_index

    return load_compact_index(spark, index_dir)


def _run_search(capsys, argv):
    search = _load_job("search")
    capsys.readouterr()  # drop anything pending
    _no_stop(search.main, argv)
    out = capsys.readouterr().out
    return [
        json.loads(line)
        for line in out.strip().splitlines()
        if line.strip().startswith("{")
    ]


def _assert_rank_identical(rows, want_df, key="url"):
    want = want_df.collect()
    assert len(rows) > 0, "CLI returned no rows"
    assert [r[key] for r in rows] == [w[key] for w in want]
    for r, w in zip(rows, want):
        assert r["score"] == pytest.approx(w["score"], abs=1e-12)


def test_cli_bm25(spark, index_dir, cidx, capsys):
    from search_engine_spark.plans.wand import search_compact

    rows = _run_search(
        capsys, ["--index", index_dir, "--query", QUERY, "--limit", "5"]
    )
    _assert_rank_identical(
        rows,
        search_compact(cidx, QUERY, limit=5, analyzer="tokens"),
    )


def test_cli_bm25_no_prune(spark, index_dir, cidx, capsys):
    from search_engine_spark.plans.wand import search_compact

    rows = _run_search(
        capsys,
        ["--index", index_dir, "--query", QUERY, "--limit", "5",
         "--no-prune"],
    )
    _assert_rank_identical(
        rows,
        search_compact(
            cidx, QUERY, limit=5, analyzer="tokens", prune=False
        ),
    )


def test_cli_maxscore(spark, index_dir, cidx, capsys):
    from search_engine_spark.plans.maxscore import search_maxscore_compact

    rows = _run_search(
        capsys,
        ["--index", index_dir, "--query", QUERY, "--limit", "5",
         "--ranker", "maxscore"],
    )
    _assert_rank_identical(
        rows,
        search_maxscore_compact(cidx, QUERY, limit=5, analyzer="tokens"),
    )


def test_cli_lm(spark, index_dir, cidx, capsys):
    from search_engine_spark.plans.lm import search_lm_compact

    rows = _run_search(
        capsys,
        ["--index", index_dir, "--query", QUERY, "--limit", "5",
         "--ranker", "lm", "--mu", "1500"],
    )
    _assert_rank_identical(
        rows,
        search_lm_compact(
            cidx, QUERY, mu=1500.0, limit=5, analyzer="tokens"
        ),
    )


def test_cli_pl2(spark, index_dir, cidx, capsys):
    from search_engine_spark.plans.dfr import search_pl2_compact

    rows = _run_search(
        capsys,
        ["--index", index_dir, "--query", QUERY, "--limit", "5",
         "--ranker", "pl2", "--c", "1.5"],
    )
    _assert_rank_identical(
        rows,
        search_pl2_compact(
            cidx, QUERY, c=1.5, limit=5, analyzer="tokens"
        ),
    )


def test_cli_synonyms(spark, index_dir, cidx, capsys):
    from search_engine_spark.plans.synonyms import search_synonyms_compact

    syn = {"crystal": ["meadow"]}
    rows = _run_search(
        capsys,
        ["--index", index_dir, "--query", "crystal", "--limit", "5",
         "--ranker", "synonyms", "--synonyms", json.dumps(syn)],
    )
    _assert_rank_identical(
        rows,
        search_synonyms_compact(
            cidx, "crystal", synonyms=syn, limit=5, analyzer="tokens"
        ),
    )


def test_cli_prefix(spark, index_dir, cidx, capsys):
    from search_engine_spark.plans.prefix import search_prefix_compact

    rows = _run_search(
        capsys,
        ["--index", index_dir, "--query", "cryst*", "--limit", "5",
         "--ranker", "prefix"],
    )
    _assert_rank_identical(
        rows,
        search_prefix_compact(
            cidx, "cryst*", limit=5, analyzer="tokens"
        ),
    )


def test_cli_wildcard(spark, index_dir, cidx, capsys):
    from search_engine_spark.plans.wildcard import search_wildcard_compact

    rows = _run_search(
        capsys,
        ["--index", index_dir, "--query", "c*ystal", "--limit", "5",
         "--ranker", "wildcard"],
    )
    _assert_rank_identical(
        rows,
        search_wildcard_compact(
            cidx, "c*ystal", limit=5, analyzer="tokens"
        ),
    )


def test_cli_impact(spark, index_dir, cidx, capsys):
    from search_engine_spark.plans.impact import impact_topk_persisted

    rows = _run_search(
        capsys,
        ["--index", index_dir, "--query", QUERY, "--limit", "5",
         "--ranker", "impact"],
    )
    _assert_rank_identical(
        rows,
        impact_topk_persisted(
            cidx, index_dir, QUERY, limit=5, analyzer="tokens"
        ),
    )


def test_cli_rescore(spark, index_dir, cidx, capsys):
    from search_engine_spark.plans.impact import rescore_topk_persisted

    rows = _run_search(
        capsys,
        ["--index", index_dir, "--query", QUERY, "--limit", "5",
         "--ranker", "rescore", "--first-k", "50"],
    )
    _assert_rank_identical(
        rows,
        rescore_topk_persisted(
            cidx, index_dir, QUERY, first_k=50, limit=5,
            analyzer="tokens",
        ),
    )


def test_cli_batch_queries_file(spark, index_dir, cidx, capsys,
                                tmp_path):
    """--queries-file: whole workload in one job, per-query rows
    rank-identical to the single-query path."""
    from search_engine_spark.plans.wand import search_compact

    queries = [QUERY, "falcon harbor", "lantern marble"]
    qf = tmp_path / "queries.txt"
    qf.write_text("\n".join(queries) + "\n")
    rows = _run_search(
        capsys,
        ["--index", index_dir, "--queries-file", str(qf),
         "--limit", "5"],
    )
    assert {r["query"] for r in rows} <= set(queries)
    for qid, q in enumerate(queries):
        got = [r for r in rows if r["query_id"] == qid]
        _assert_rank_identical(
            got, search_compact(cidx, q, limit=5, analyzer="tokens")
        )


def test_cli_batch_requires_exactly_one_query_source(
        spark, index_dir, capsys, tmp_path):
    import pytest as _pytest

    search = _load_job("search")
    with _pytest.raises(SystemExit):
        _no_stop(search.main, ["--index", index_dir])
    qf = tmp_path / "q.txt"
    qf.write_text("crystal\n")
    with _pytest.raises(SystemExit):
        _no_stop(search.main, [
            "--index", index_dir, "--query", "x",
            "--queries-file", str(qf),
        ])


def test_cli_bool(spark, index_dir, cidx, capsys):
    from search_engine_spark.plans.boolquery import search_boolean_compact

    q = "+crystal meadow"
    rows = _run_search(
        capsys,
        ["--index", index_dir, "--query", q, "--limit", "5", "--bool"],
    )
    _assert_rank_identical(
        rows,
        search_boolean_compact(
            cidx, q, limit=5, analyzer="tokens",
            positions_dir=index_dir.rstrip("/") + "/positions",
        ),
    )


def test_cli_impact_requires_artifact(spark, cidx, capsys, tmp_path,
                                      index_dir):
    # an index built without --impacts must fail fast with the hint,
    # not silently fall back to another ranker
    import shutil

    bare = str(tmp_path / "bare_idx")
    shutil.copytree(index_dir, bare)
    import os

    os.remove(os.path.join(bare, "impacts.json"))
    with pytest.raises(SystemExit):
        _run_search(
            capsys,
            ["--index", bare, "--query", QUERY, "--ranker", "impact"],
        )


# ---------------------------------------------------------------------------
# maintenance CLI (jobs/maintain_index.py)
# ---------------------------------------------------------------------------


def test_cli_maintenance_lifecycle(spark, index_dir, tmp_path, capsys):
    import shutil

    idx = str(tmp_path / "m_idx")
    shutil.copytree(index_dir, idx)

    # extra pages parquet for append
    from search_engine_spark.sources.fixtures import pages_df

    extra_path = str(tmp_path / "extra")
    base = pages_df(spark, 40, n_sites=4, seed=42)
    spark.createDataFrame(
        [(r["url"] + "?m=1", r["warc_ts"], r["html"], r["text"],
          r["lang"]) for r in base.collect()],
        base.schema,
    ).write.parquet(extra_path)

    def run(argv):
        maintain = _load_job("maintain_index")
        capsys.readouterr()
        _no_stop(maintain.main, argv)
        out = capsys.readouterr().out
        return json.loads(out.strip().splitlines()[-1])

    st0 = run(["--index", idx, "status"])
    # keep every lifecycle generation readable (itself one commit)
    ret = run(["--index", idx, "retention", "--keep", "8"])
    assert ret["snapshot_retention"] == 8
    appended = run(["--index", idx, "append", "--input", extra_path])
    assert appended["appended"] == 40
    assert appended["gen"] == st0["gen"] + 2

    urls_file = tmp_path / "dead.txt"
    dead = [
        r["url"] + "?m=1" for r in base.limit(4).select("url").collect()
    ]
    urls_file.write_text("\n".join(dead))
    tombed = run(["--index", idx, "tombstone",
                  "--urls-file", str(urls_file)])
    assert tombed["tombstoned"] == 4

    merged = run(["--index", idx, "merge", "--min-epochs", "1"])
    assert merged["merged_epochs"] == 1

    vac = run(["--index", idx, "vacuum"])
    assert vac["vacuumed"] == 4

    st1 = run(["--index", idx, "status"])
    assert st1["n_docs"] == st0["n_docs"] + 40 - 4
    assert st1["retired"], "vacuum should leave a retired generation"
    assert st1["snapshots"] == list(range(st1["gen"] + 1))
    # retention --keep 8 covers every lifecycle generation: expire
    # must delete nothing and gen 0 must stay readable (below)
    exp = run(["--index", idx, "expire"])
    assert exp["expired"] == []
    assert run(["--index", idx, "status"])["retired"] == st1["retired"]

    # the maintained index still answers rank-identically to a direct
    # library query
    from search_engine_spark.plans.incremental import open_index
    from search_engine_spark.plans.wand import search_compact

    rows = _run_search(
        capsys, ["--index", idx, "--query", QUERY, "--limit", "5"]
    )
    _assert_rank_identical(
        rows,
        search_compact(
            open_index(spark, idx), QUERY, limit=5, analyzer="tokens"
        ),
    )

    # time-travel through the CLI: gen 0 predates the append, so no
    # ?m=1 url can appear (current-gen results above may contain them)
    tt = _run_search(
        capsys,
        ["--index", idx, "--query", QUERY, "--limit", "20",
         "--at-gen", "0"],
    )
    assert tt and all("?m=1" not in r["url"] for r in tt)


def test_cli_batch_rejects_at_gen_and_offset(
        spark, index_dir, capsys, tmp_path):
    """Batch mode has neither time-travel nor offset — it must error
    (not silently ignore the flags and return wrong results)."""
    import pytest as _pytest

    search = _load_job("search")
    qf = tmp_path / "q2.txt"
    qf.write_text("crystal\n")
    with _pytest.raises(SystemExit):
        _no_stop(search.main, [
            "--index", index_dir, "--queries-file", str(qf),
            "--at-gen", "0",
        ])
    with _pytest.raises(SystemExit):
        _no_stop(search.main, [
            "--index", index_dir, "--queries-file", str(qf),
            "--offset", "3",
        ])


def test_cli_local_serving(spark, index_dir, cidx, capsys, tmp_path):
    """--local: the no-Spark serving fast path returns the same rows
    and ranks as the Spark path, single-query and batch."""
    from search_engine_spark.plans.wand import search_compact

    rows = _run_search(
        capsys,
        ["--index", index_dir, "--query", QUERY, "--limit", "5",
         "--local"],
    )
    _assert_rank_identical(
        rows, search_compact(cidx, QUERY, limit=5, analyzer="tokens")
    )

    queries = [QUERY, "falcon harbor"]
    qf = tmp_path / "q_local.txt"
    qf.write_text("\n".join(queries) + "\n")
    rows = _run_search(
        capsys,
        ["--index", index_dir, "--queries-file", str(qf),
         "--limit", "5", "--local"],
    )
    for qid, q in enumerate(queries):
        got = [r for r in rows if r["query_id"] == qid]
        _assert_rank_identical(
            got, search_compact(cidx, q, limit=5, analyzer="tokens")
        )


def test_cli_local_rejects_unsupported(spark, index_dir, capsys):
    import pytest as _pytest

    search = _load_job("search")
    with _pytest.raises(SystemExit):
        _no_stop(search.main, [
            "--index", index_dir, "--query", "x", "--local",
            "--ranker", "lm",
        ])
    with _pytest.raises(SystemExit):
        _no_stop(search.main, [
            "--index", index_dir, "--query", "x", "--local",
            "--snippets",
        ])
