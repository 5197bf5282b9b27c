"""Checkpoint/resume: a killed run resumes mid-computation and converges
to the same result as an uninterrupted run."""

import json
import os

import numpy as np

from approximate_pagerank_public_spark.operators.pagerank import pagerank, multi_ppr


def test_resume_matches_uninterrupted(g_rand, tmp_path):
    ckpt = str(tmp_path / "ck")
    full = pagerank(g_rand, mode="broadcast")

    # phase 1: "killed" after 5 iterations (checkpointing every superstep)
    part = pagerank(g_rand, mode="broadcast", max_iter=5, tol=0.0, checkpoint_dir=ckpt)
    assert part.iterations == 5
    manifest = json.load(open(os.path.join(ckpt, "manifest.json")))
    assert manifest["latest"] == 5
    assert len(manifest["iterations"]) == 5
    # per-partition lineage recorded
    lineage = manifest["lineage"]["5"]
    assert sum(p["rows"] for p in lineage) == g_rand.num_vertices

    # phase 2: resume from the checkpoint and run to convergence
    res = pagerank(g_rand, mode="broadcast", checkpoint_dir=ckpt, resume=True)
    assert res.converged
    assert res.metrics[0]["iter"] == 1 and res.metrics[-1]["iter"] == res.iterations
    assert res.iterations == full.iterations
    assert np.allclose(res.ranks_np, full.ranks_np, atol=1e-12)


def test_resume_multi_ppr(g_rand, tmp_path):
    ckpt = str(tmp_path / "ck8")
    sources = [0, 17, 42, 99]
    full = multi_ppr(g_rand, sources)
    multi_ppr(g_rand, sources, max_iter=3, tol=0.0, checkpoint_dir=ckpt, checkpoint_every=1)
    res = multi_ppr(g_rand, sources, checkpoint_dir=ckpt, resume=True)
    assert np.allclose(res.ranks_np, full.ranks_np, atol=1e-12)


def test_distributed_multi_resume(g5, tmp_path):
    """_run_distributed_multi checkpoints via save_df/load_latest_df —
    a killed multi-source distributed run resumes mid-computation and
    matches the uninterrupted run (VERDICT r1 item 6)."""
    ckpt = str(tmp_path / "ckdm")
    sources = [0, 2, 4]
    full = multi_ppr(g5, sources, mode="distributed", max_iter=8, tol=0.0)
    multi_ppr(
        g5, sources, mode="distributed", max_iter=3, tol=0.0, checkpoint_dir=ckpt
    )
    manifest = json.load(open(os.path.join(ckpt, "manifest.json")))
    assert manifest["latest"] == 3 and manifest["mode"] == "dataframe"
    res = multi_ppr(
        g5, sources, mode="distributed", max_iter=8, tol=0.0,
        checkpoint_dir=ckpt, resume=True,
    )
    assert res.metrics[0]["iter"] == 1 and res.metrics[-1]["iter"] == 8
    a = full.ranks().toPandas().sort_values("id")
    b = res.ranks().toPandas().sort_values("id")
    for i in range(len(sources)):
        assert np.allclose(
            a[f"rank_{i}"].to_numpy(), b[f"rank_{i}"].to_numpy(), atol=1e-12
        )


def test_checkpoint_every_k(g_rand, tmp_path):
    ckpt = str(tmp_path / "ck2")
    pagerank(g_rand, mode="broadcast", max_iter=5, tol=0.0, checkpoint_dir=ckpt, checkpoint_every=2)
    manifest = json.load(open(os.path.join(ckpt, "manifest.json")))
    assert manifest["latest"] == 4  # iterations 2 and 4 saved


def test_distributed_resume_matches_uninterrupted(g_rand, tmp_path):
    import numpy as np

    ckpt = str(tmp_path / "ckd")
    full = pagerank(g_rand, mode="distributed", max_iter=8, tol=0.0)
    pagerank(g_rand, mode="distributed", max_iter=4, tol=0.0, checkpoint_dir=ckpt)
    res = pagerank(g_rand, mode="distributed", max_iter=8, tol=0.0, checkpoint_dir=ckpt)
    assert res.metrics[-1]["iter"] == 8 and res.metrics[0]["iter"] == 1
    a = full.ranks().toPandas().sort_values("id")["rank"].to_numpy()
    b = res.ranks().toPandas().sort_values("id")["rank"].to_numpy()
    assert np.allclose(a, b, atol=1e-12)


def test_checkpoint_parity_barrier_vs_per_superstep(g_rand, tmp_path, monkeypatch):
    """Checkpointed runs agree bit-for-bit whether the supersteps run as
    barrier chunks (default) or one Spark job each (fallback), and both
    resume to the same converged state."""
    ck_b = str(tmp_path / "ckb")
    ck_c = str(tmp_path / "ckc")
    pagerank(g_rand, mode="broadcast", max_iter=4, tol=0.0, checkpoint_dir=ck_b)
    res_b = pagerank(g_rand, mode="broadcast", checkpoint_dir=ck_b, resume=True)
    monkeypatch.setenv("SPARK_GRAFT_BARRIER", "0")
    pagerank(g_rand, mode="broadcast", max_iter=4, tol=0.0, checkpoint_dir=ck_c)
    res_c = pagerank(g_rand, mode="broadcast", checkpoint_dir=ck_c, resume=True)
    assert res_b.iterations == res_c.iterations
    assert res_b.converged and res_c.converged
    assert np.array_equal(res_b.ranks_np, res_c.ranks_np)
