from delfos_etl_pipeline_spark.dedup.exact import exact_dedup, exact_dedup_summary  # noqa: F401
from delfos_etl_pipeline_spark.dedup.ngram import jaccard_pairs, shingle_sets  # noqa: F401
from delfos_etl_pipeline_spark.dedup.minhash import minhash_lsh_pairs  # noqa: F401
from delfos_etl_pipeline_spark.dedup.simhash import simhash_pairs  # noqa: F401
from delfos_etl_pipeline_spark.dedup.embedding import (  # noqa: F401
    embedding_dedup,
    embedding_near_dup_pairs,
    embedding_near_dup_pairs_lsh,
)
