"""Quality evidence for the approximate dedup/ANN paths (VERDICT r1
item 3): measured recall of MinHash-LSH and IVF against their exact,
oracle-checked twins, and an exactness proof for SimHash banding.

The driver's ``embeddings`` table is isotropic noise (mean intra-label
cosine ~0.002), on which NO partitioning ANN can reach high recall at a
real pruning ratio — so the ≥0.9 recall bar is asserted on clustered
synthetic data (where the claim is meaningful), and on the noise table
we assert the weaker, honest property: recall must clearly beat the
expected value of random pruning (≈ nprobe / n_cells)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from datacheck_spark import similarity as SIM
from datacheck_spark.dedup import (
    char_ngrams,
    near_duplicate_pairs_exact,
    near_duplicate_pairs_lsh,
    simhash64,
    simhash_near_duplicates,
)

SF_DIR = "/root/testdata/sf0.01"


class TestIvfRecall:
    @pytest.fixture(scope="class")
    def clustered(self, spark):
        """10 tight clusters in 64-dim: cluster centers ~N(0,1), members
        = center + 0.15·noise (deterministic seed)."""
        rng = np.random.default_rng(7)
        centers = rng.standard_normal((10, 64))
        rows = []
        for i in range(400):
            c = i % 10
            v = centers[c] + 0.15 * rng.standard_normal(64)
            rows.append((i, [float(x) for x in v], c))
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).cache()

    def test_recall_at_10_on_clustered_data(self, clustered):
        q = clustered.where(F.col("vec_id") < 20)
        c = clustered.where(F.col("vec_id") >= 20)
        truth = {
            (r["query_id"], r["neighbor_id"])
            for r in SIM.brute_force_topk(c, q, k=10).collect()
        }
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in SIM.ivf_topk(c, q, k=10, n_cells=10, nprobe=2).collect()
        }
        recall = len(truth & approx) / len(truth)
        # probes 2/10 of the cells but must capture >= 0.9 of true
        # neighbors because neighbors share the query's k-means cell
        assert recall >= 0.9, f"IVF recall@10 = {recall:.3f} on clustered data"

    def test_beats_random_pruning_on_noise_embeddings(self, spark):
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        q = emb.where(F.col("vec_id") < 20)
        c = emb.where(F.col("vec_id") >= 20)
        n_cells, nprobe = 10, 3
        truth = {
            (r["query_id"], r["neighbor_id"])
            for r in SIM.brute_force_topk(c, q, k=10).collect()
        }
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in SIM.ivf_topk(
                c, q, k=10, n_cells=n_cells, nprobe=nprobe
            ).collect()
        }
        recall = len(truth & approx) / len(truth)
        scan_fraction = nprobe / n_cells
        # isotropic noise: random pruning would land at ~scan_fraction;
        # k-means cells must still do clearly better (measured ~0.53)
        assert recall >= scan_fraction + 0.1, (
            f"IVF recall@10 = {recall:.3f}; random pruning "
            f"baseline = {scan_fraction:.2f}"
        )


class TestMinHashRecall:
    def test_lsh_candidates_vs_exact_pairs(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").where(
            F.col("doc_id") < 1000
        )
        truth = {
            (r["id_a"], r["id_b"])
            for r in near_duplicate_pairs_exact(
                docs, ["text"], "doc_id", threshold=0.8
            ).collect()
        }
        lsh = {
            (r["id_a"], r["id_b"])
            for r in near_duplicate_pairs_lsh(
                docs, ["text"], "doc_id", threshold=0.8
            ).collect()
        }
        assert truth, "expected planted near-dup pairs at sim >= 0.8"
        recall = len(truth & lsh) / len(truth)
        # 16 bands x 4 rows: P(collision | sim=0.8) ~ 0.99
        assert recall >= 0.95, f"MinHash-LSH recall = {recall:.3f}"
        # post-verification: every returned pair really is >= threshold,
        # so precision against the truth set is exact
        assert lsh <= truth


class TestSimHashExactness:
    def test_banding_finds_all_hamming3_pairs(self, spark):
        """4×16-bit block banding is pigeonhole-complete for Hamming ≤ 3:
        the banded join must return EXACTLY the all-pairs result."""
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").where(
            F.col("doc_id") < 500
        )
        sigs = {
            r["id"]: r["sh"]
            for r in docs.select(
                F.col("doc_id").cast("string").alias("id"),
                simhash64(char_ngrams(F.col("text"), 3)).alias("sh"),
            ).collect()
        }
        ids = sorted(sigs, key=int)
        arr = np.array([sigs[i] for i in ids], dtype=np.int64).view(np.uint64)
        truth = set()
        for i in range(len(ids)):
            ham = np.vectorize(lambda x: bin(x).count("1"))(
                arr[i] ^ arr[i + 1 :]
            ) if i + 1 < len(ids) else []
            for off, h in enumerate(ham):
                if h <= 3:
                    a, b = ids[i], ids[i + 1 + off]
                    truth.add((min(a, b), max(a, b)))
        banded = {
            (r["id_a"], r["id_b"])
            for r in simhash_near_duplicates(
                docs, "text", "doc_id", max_hamming=3
            ).collect()
        }
        assert banded == truth


class TestEmbeddingLshRecall:
    def test_or_amplified_lsh_vs_exact(self, spark):
        """OR-amplified hyperplane LSH (k=8 planes x L=8 tables) must
        recover >= 0.95 of exact cosine>=0.9 pairs on clustered data —
        the single-table AND-only design recovered ~0.28."""
        rng = np.random.default_rng(11)
        centers = rng.standard_normal((8, 32))
        rows = []
        for i in range(240):
            c = i % 8
            v = centers[c] + 0.1 * rng.standard_normal(32)
            rows.append((i, [float(x) for x in v]))
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        ).cache()
        from datacheck_spark.dedup import embedding_near_duplicates

        truth = {
            (r["id_a"], r["id_b"])
            for r in embedding_near_duplicates(
                df, "embedding", "vec_id", threshold=0.9, lsh_planes=0
            ).collect()
        }
        lsh = {
            (r["id_a"], r["id_b"])
            for r in embedding_near_duplicates(
                df, "embedding", "vec_id", threshold=0.9
            ).collect()
        }
        assert truth, "clustered fixture must contain cos>=0.9 pairs"
        recall = len(truth & lsh) / len(truth)
        assert recall >= 0.95, f"embedding LSH recall = {recall:.3f}"
        assert lsh <= truth  # exact re-check: no false positives
