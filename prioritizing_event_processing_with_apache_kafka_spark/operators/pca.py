"""Distributed PCA / whitening over embedding columns.

Principal-component projection is the standard preprocessing step in
front of embedding-space curation: the SemDeDup recipe (Abbas et al.,
2023, "SemDeDup: Data-efficient learning at web-scale through semantic
deduplication") clusters in a normalized/reduced embedding space, and
IVF/OPQ-style ANN indexes routinely train their coarse quantizers on
PCA-rotated (often whitened) vectors. This module supplies that step
for the `clustering.py` / `similarity.py` operators without leaving
the DataFrame API.

Plan shape (the d ≪ n regime — the only one that exists for embedding
tables: d is 64–4096 while n is billions):

1. ``moment_partials`` — one Arrow-batched ``mapInPandas`` pass emits
   ONE row per input partition holding that partition's zeroth/first/
   second moments: ``(count, Σx, Σxxᵀ)``, the outer-product sum
   computed by BLAS (``X.T @ X``) per batch and accumulated across the
   partition's batches. A partition of any size reduces to
   ``d² + d + 1`` doubles (33 KB at d = 64), so what leaves the map
   side is ~#partitions rows, never ~n — identical philosophy to the
   Misra-Gries partials in ``heavyhitters.py``.
2. ``fit_pca`` — the partials are combined by ONE narrow shuffle
   (posexplode → groupBy position → sum: #partitions × (d²+d+1) tiny
   rows) and a single ``d²+d+1``-value collect; the d×d covariance is
   eigendecomposed driver-side with numpy (a 64×64 ``eigh`` is
   microseconds — this is the same split MLlib's RowMatrix PCA uses:
   distributed Gramian, local eigensolver). The collect is justified
   the same way as the graph-fixpoint scalar: O(d²) values,
   independent of n.
3. ``project_embeddings`` — the (p × d) projection matrix becomes
   literal arrays in native Column expressions (``zip_with`` +
   ``aggregate`` dot products): centering + rotation + optional
   whitening run JVM-side inside whole-stage codegen, no Python in
   the per-row path. At large p·d (≳ 10⁴ multiply-adds per row) an
   Arrow-batched matmul would win — documented, not needed at the
   declared sizes.

Determinism: ``eigh`` on the same covariance is deterministic, and a
sign convention (largest-|coefficient| entry of every component made
positive) pins the one degree of freedom eigenvectors leave loose, so
``fit_pca`` twice on the same data is bit-identical. Eigenvalues are
clipped at 0 (a covariance matrix is PSD; tiny negative eigenvalues
are float noise) and whitening scales use ``1/sqrt(max(λ, 1e-12))``.

Scale notes (100 TB): stage 1's output is one 33 KB row per partition
(100k partitions → 3.3 GB total, 6.6 GB exploded shuffle — trivial
next to the source scan); stage 3 is a map-only pass. Nothing here
shuffles the vectors themselves.

The reference library (`/root/reference`, a Kafka partitioner,
src/main ~560 lines) has no embedding surface; this operator belongs
to the engine's LLM-pipeline extensions mandated by the build brief.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

__all__ = ["PCAModel", "moment_partials", "fit_pca", "project_embeddings"]


_PARTIAL_SCHEMA = StructType(
    [
        StructField("pm_n", LongType()),
        StructField("pm_moments", ArrayType(DoubleType())),
    ]
)


def moment_partials(df: DataFrame, vector_col: str = "embedding") -> DataFrame:
    """One row per input partition: ``pm_n`` (row count) and
    ``pm_moments`` = concat(Σx [d], row-major Σxxᵀ [d²]). Rows with a
    NULL vector are ignored; a ragged vector length raises (moments of
    mixed dimensionality are meaningless)."""
    narrow = df.select(F.col(vector_col).alias("__pca_vec"))

    def summarize(batches):
        import pandas as pd

        n = 0
        s = None
        o = None
        for pdf in batches:
            vecs = [v for v in pdf["__pca_vec"] if v is not None]
            if not vecs:
                continue
            # Explicit length check BEFORE np.asarray: a ragged batch
            # would otherwise surface as numpy's opaque
            # "inhomogeneous shape" error instead of ours.
            lens = {len(v) for v in vecs}
            if len(lens) != 1:
                raise ValueError(
                    f"pca: ragged embedding lengths within a batch: "
                    f"{sorted(lens)}"
                )
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in vecs]
            )
            if s is not None and x.shape[1] != s.shape[0]:
                raise ValueError(
                    f"pca: embedding length changed {s.shape[0]} -> "
                    f"{x.shape[1]} within a partition"
                )
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            xtx = x.T @ x
            o = xtx if o is None else o + xtx
        if n == 0:
            return
        yield pd.DataFrame(
            {
                "pm_n": [n],
                "pm_moments": [
                    np.concatenate([s, o.reshape(-1)]).tolist()
                ],
            }
        )

    return narrow.mapInPandas(summarize, _PARTIAL_SCHEMA)


@dataclass(frozen=True)
class PCAModel:
    """Fitted projection: ``mean`` (d), ``components`` (p rows × d),
    ``eigvals`` (p, descending, population covariance), ``total_var``
    (trace of the population covariance), ``whiten`` flag."""

    mean: tuple[float, ...]
    components: tuple[tuple[float, ...], ...]
    eigvals: tuple[float, ...]
    total_var: float
    whiten: bool

    @property
    def n_components(self) -> int:
        return len(self.components)

    @property
    def dim(self) -> int:
        return len(self.mean)

    @property
    def explained_variance_ratio(self) -> float:
        return float(sum(self.eigvals) / self.total_var) if self.total_var else 1.0


def fit_pca(
    df: DataFrame,
    *,
    vector_col: str = "embedding",
    n_components: int,
    whiten: bool = False,
) -> PCAModel:
    """Fit PCA on ``df[vector_col]`` (array<float|double>, fixed
    length d) via the distributed-moments plan above. Eager: runs one
    Spark job and collects d²+d+1 doubles."""
    if n_components < 1:
        raise ValueError(f"n_components must be >= 1, got {n_components}")
    partials = moment_partials(df, vector_col)
    # Fold the count in as position 0 so ONE explode+groupBy+collect
    # combines every moment (two separate aggs would recompute the
    # mapInPandas source scan twice).
    combined = (
        partials.select(
            F.posexplode(
                F.concat(
                    F.array(F.col("pm_n").cast("double")),
                    F.col("pm_moments"),
                )
            ).alias("pos", "v")
        )
        .groupBy("pos")
        .agg(F.sum("v").alias("v"), F.count(F.lit(1)).alias("n_parts"))
        .orderBy("pos")
    )
    rows = combined.collect()
    if not rows:
        raise ValueError("pca: no non-null vectors to fit on")
    # Cross-PARTITION dimensionality guard: the per-partition ragged
    # check can't see a split where different partitions hold
    # different-length vectors. Moment-array length is d²+d (injective
    # in d), so mixed dims ⇒ mixed lengths ⇒ tail positions present in
    # fewer partials ⇒ non-uniform per-pos counts. Catch it here
    # instead of summing mismatched arrays into a garbage covariance.
    n_parts = {r["n_parts"] for r in rows}
    if len(n_parts) != 1:
        raise ValueError(
            "pca: embedding length differs across partitions "
            "(moment partials have mismatched lengths)"
        )
    flat = np.array([r["v"] for r in rows], dtype=np.float64)
    n = int(round(flat[0]))
    d = int(round((np.sqrt(4 * (len(flat) - 1) + 1) - 1) / 2))
    if d * d + d + 1 != len(flat):
        raise ValueError(
            f"pca: moment vector length {len(flat)} is not d^2+d+1"
        )
    if n_components > d:
        raise ValueError(
            f"n_components={n_components} exceeds embedding dim {d}"
        )
    s = flat[1 : 1 + d]
    o = flat[1 + d :].reshape(d, d)
    mean = s / n
    cov = o / n - np.outer(mean, mean)
    cov = (cov + cov.T) / 2.0  # exact-symmetrize float noise for eigh
    eigvals, eigvecs = np.linalg.eigh(cov)
    order = np.argsort(eigvals)[::-1][:n_components]
    comps = eigvecs[:, order].T  # p × d
    vals = np.clip(eigvals[order], 0.0, None)
    # Sign convention: largest-|coefficient| entry positive.
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PCAModel(
        mean=tuple(float(x) for x in mean),
        components=tuple(tuple(float(x) for x in row) for row in comps),
        eigvals=tuple(float(x) for x in vals),
        total_var=float(np.trace(cov)),
        whiten=whiten,
    )


def _dot_lit(centered: Column, basis: tuple[float, ...]) -> Column:
    lit_basis = F.array(*[F.lit(float(b)) for b in basis])
    return F.aggregate(
        F.zip_with(centered, lit_basis, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def project_embeddings(
    df: DataFrame,
    model: PCAModel,
    *,
    vector_col: str = "embedding",
    out_col: str = "pca",
    round_decimals: int = 6,
) -> DataFrame:
    """Append ``out_col`` = the p-component PCA projection of
    ``vector_col`` (whitened iff the model was fitted with
    ``whiten=True``) as ``array<double>``, computed entirely with
    native Column expressions — centering, p dot products, optional
    per-component scaling — inside whole-stage codegen."""
    lit_mean = F.array(*[F.lit(float(m)) for m in model.mean])
    centered = F.zip_with(
        F.col(vector_col), lit_mean, lambda a, b: a.cast("double") - b
    )
    comps = []
    for i, basis in enumerate(model.components):
        c = _dot_lit(centered, basis)
        if model.whiten:
            c = c / F.lit(float(np.sqrt(max(model.eigvals[i], 1e-12))))
        comps.append(F.round(c, round_decimals))
    return df.withColumn(out_col, F.array(*comps))
