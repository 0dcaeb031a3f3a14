from delfos_etl_pipeline_spark.similarity.knn import (  # noqa: F401
    all_pairs_topk,
    brute_force_topk,
    cosine_similarity_col,
    lsh_bucketed_topk,
)
