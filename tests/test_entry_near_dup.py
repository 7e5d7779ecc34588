"""Driver-visible near-dup query runs the operator at its designed
operating point: planted deterministic twins, threshold 0.95, and the
recall the docstring claims is measured here per-run."""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.01"


def test_entry_near_dup_planted_recall(spark):
    import __spark_entry__ as m

    out = m.q_embedding_near_dup(spark, SF_DIR).toPandas()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    truth = {
        (r[0], r[0] + 1_000_000)
        for r in emb.where("vec_id % 10 = 0").select("vec_id").collect()
    }
    got = {(min(a, b), max(a, b)) for a, b in zip(out["id_a"], out["id_b"])}
    assert len(truth) > 0
    recall = len(got & truth) / len(truth)
    # seeded hyperplanes + deterministic twins → deterministic result;
    # the bound is slack only against future testdata regeneration
    assert recall >= 0.95, f"recall {recall}"
    # exact-cosine verify: nothing below the threshold leaks through,
    # and the un-perturbed corpus (max pairwise cos ~0.51) adds nothing
    assert len(got - truth) == 0
    assert (out["cos_sim"] >= 0.95).all()
