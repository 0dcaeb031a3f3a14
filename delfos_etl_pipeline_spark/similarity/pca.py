"""PCA projection — the TRAINED dimensionality-reduction twin of the
Johnson-Lindenstrauss random projection (emb_project_jl).

JL is data-independent (no fit, exact-oracle-able, preserves pairwise
distances within the JL bound); PCA spends one fit pass to find the
variance-optimal subspace — better reconstruction at equal k on
structured embeddings. The fit aggregates the feature covariance
(d×d scalars — driver-sized at any corpus size) and the projection is
a narrow matrix-multiply per row; ml.feature.PCA wires both through the
JVM. Same long-form (id, out_dim, value) output contract as JL so
downstream consumers can swap tiers. Eigenvector SIGNS are an SVD
convention, not semantics — tests assert the subspace properties
(orthonormality, decreasing explained variance), never raw signs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from delfos_etl_pipeline_spark.similarity.knn import _as_double


def pca_fit_project(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
):
    """(projected long-form DataFrame, fitted PCAModel)."""
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feat = df.select(
        id_col, array_to_vector(_as_double(vec_col)).alias("_fv")
    )
    model = PCA(k=k, inputCol="_fv", outputCol="_p").fit(feat)
    out = (
        model.transform(feat)
        .select(
            id_col,
            F.posexplode(vector_to_array("_p")).alias("out_dim", "value"),
        )
        .select(
            id_col,
            F.col("out_dim").cast("bigint").alias("out_dim"),
            F.round("value", 6).alias("value"),
        )
    )
    return out, model
