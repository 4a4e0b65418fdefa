"""ANN recall under corpus growth (r13, VERDICT r12 item 3).

The three declared ANN queries assert mean recall@5 >= 0.8 at fixture
scale only; LSH/IVF recall typically degrades as the corpus outgrows
the table/cell budget. This probe measures RECALL (not just wall) at
Nx the fixture corpus.

Growth model: the verbatim-twin replica scale_probe.py uses is WRONG
for recall — every vector would gain N-1 exact duplicates, the true
top-k would collapse to tie-break noise among twins, and recall would
measure the data shape, not the index. Instead each copy c applies a
seeded ORTHOGONAL transform (per-copy dimension permutation + sign
flips): intra-copy geometry is preserved bit-for-bit (orthogonal maps
preserve norms and cosines), so every copy reproduces the base
corpus's neighbor structure, while cross-copy cosines become
near-orthogonal background noise (std ~ 1/sqrt(64) ≈ 0.125) — the
honest model of "N independent shards drawn from the same
distribution". At large N a few background vectors legitimately enter
the true top-k tail; the probe's exact top-k is recomputed on the
grown corpus, so the ANN index is graded against the truth it
actually faces.

Usage: python tools/ann_recall_probe.py [--copies N] [--json OUT] [sf_dir]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents"
).split()


def replica_dir(sf_dir: str, copies: int) -> str:
    src = f"{sf_dir.rstrip('/')}/embeddings.parquet"
    st = os.stat(src)
    tag = hashlib.md5(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:{copies}:v1-ortho".encode()
    ).hexdigest()[:12]
    return os.path.join("/tmp", f"peps-annrecall-{copies}x-{tag}")


def build_replica(sf_dir: str, out_dir: str, copies: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir.rstrip('/')}/embeddings.parquet")
    vec_id = tbl.column("vec_id").to_numpy()
    label = tbl.column("label").to_numpy()
    emb = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float32)
    n, dim = emb.shape
    os.makedirs(out_dir, exist_ok=True)
    ids, labels, vecs = [], [], []
    for c in range(copies):
        if c == 0:
            ids.append(vec_id)
            labels.append(label)
            vecs.append(emb)
            continue
        rng = np.random.RandomState(100_003 + c)
        perm = rng.permutation(dim)
        signs = rng.choice([-1.0, 1.0], size=dim).astype(np.float32)
        ids.append(vec_id + c * n)
        labels.append(label)
        vecs.append(emb[:, perm] * signs)
    out = pa.table(
        {
            "vec_id": pa.array(np.concatenate(ids), type=pa.int64()),
            "embedding": pa.array(
                list(np.concatenate(vecs)), type=pa.list_(pa.float32())
            ),
            "label": pa.array(np.concatenate(labels), type=pa.int32()),
        }
    )
    pq.write_table(out, os.path.join(out_dir, "embeddings.parquet"))
    for t in TABLES:
        src = f"{sf_dir.rstrip('/')}/{t}.parquet"
        dst = os.path.join(out_dir, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    copies = 10
    if "--copies" in argv:
        i = argv.index("--copies")
        copies = int(argv[i + 1])
        del argv[i : i + 2]
    retune_flag = "--retune" in argv
    if retune_flag:
        argv.remove("--retune")
    sf_dir = argv[0] if argv else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("peps-ann-recall-probe")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    big_dir = replica_dir(sf_dir, copies)
    if not os.path.exists(os.path.join(big_dir, "embeddings.parquet")):
        t0 = time.time()
        build_replica(sf_dir, big_dir, copies)
        print(f"built {copies}x ortho-decorrelated corpus in {time.time()-t0:.1f}s")

    from prioritizing_event_processing_with_apache_kafka_spark.inventory_pipeline import (
        PIPELINE_QUERIES,
    )

    names = ["embedding_ann_lsh", "embedding_ann_ivf", "embedding_ann_pq"]
    results: dict[str, dict] = {}

    def mean_recall(name: str, d: str) -> tuple[float, float]:
        t0 = time.time()
        pdf = (
            PIPELINE_QUERIES[name](spark, d)
            .select("query_id", "recall_vs_exact")
            .distinct()
            .toPandas()
        )
        wall = time.time() - t0
        return float(pdf["recall_vs_exact"].mean()), wall

    if retune_flag:
        # Re-tuned knob sets for the configs the fixture-tuned queries
        # degrade under growth (measured r13: LSH 0.88→0.76, PQ
        # 1.0→0.60 at 100×). The scaling RULES under test:
        # - LSH: hold per-neighbor recall by growing the table count
        #   (union over T independent tables: 1-(1-p^4)^T);
        # - PQ: grow the exact-re-rank shortlist with the corpus (the
        #   ADC shortlist quality per candidate falls as the code
        #   space crowds; rerank is the production knob — FAISS-style
        #   guidance is shortlist ∝ corpus^(1/2..1) for fixed m/ksub).
        from pyspark.sql import functions as F  # noqa: F401

        from prioritizing_event_processing_with_apache_kafka_spark.inventory_pipeline import (
            _with_recall_vs_exact,
        )
        from prioritizing_event_processing_with_apache_kafka_spark.operators import (
            similarity as S,
        )
        from prioritizing_event_processing_with_apache_kafka_spark.sources.tables import (
            load_table,
        )

        def tuned(d: str, method: str, **kw):
            emb = load_table(spark, d, "embeddings")
            queries_df = emb.filter(F.col("vec_id") < 5).select(
                F.col("vec_id").alias("query_id"), "embedding"
            )
            if method == "lsh":
                ann = S.lsh_ann_topk(emb, queries_df, k=5, **kw)
            elif method == "ivf":
                ann = S.ivf_ann_topk(emb, queries_df, k=5, **kw)
            else:
                ann = S.pq_ann_topk(emb, queries_df, k=5, **kw)
            out = _with_recall_vs_exact(
                ann, S.cosine_topk(emb, queries_df, k=5), k=5
            )
            t0 = time.time()
            pdf = (
                out.select("query_id", "recall_vs_exact")
                .distinct()
                .toPandas()
            )
            return float(pdf["recall_vs_exact"].mean()), time.time() - t0

        for method, kw in (
            ("lsh", {"num_planes": 4, "num_tables": 16}),
            ("lsh", {"num_planes": 4, "num_tables": 32}),
            ("pq", {"m": 16, "ksub": 32, "n_iter": 3, "rerank": 128}),
            ("pq", {"m": 16, "ksub": 32, "n_iter": 3, "rerank": 512}),
        ):
            r, w = tuned(big_dir, method, **kw)
            key = f"{method}:{','.join(f'{k}={v}' for k, v in kw.items())}"
            results[key] = {
                f"recall_{copies}x": round(r, 4),
                f"sec_{copies}x": round(w, 3),
            }
            print(key, results[key])
    else:
        for name in names:
            r1, w1 = mean_recall(name, sf_dir)
            rn, wn = mean_recall(name, big_dir)
            results[name] = {
                "recall_1x": round(r1, 4),
                f"recall_{copies}x": round(rn, 4),
                "sec_1x": round(w1, 3),
                f"sec_{copies}x": round(wn, 3),
            }
            print(name, results[name])

    out = {
        "copies": copies,
        "base_sf_dir": sf_dir,
        "growth_model": "per-copy orthogonal transform (dim permutation + sign flips)",
        "queries": results,
    }
    if json_out:
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {json_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
