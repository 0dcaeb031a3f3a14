"""Registry-wide hygiene contracts.

The driver's correctness harness canonicalizes every query's output with
pandas (sort_values over all columns, then value-hash); a cell holding a
Python list/dict is unhashable there, so ArrayType/MapType/StructType
output columns fail the gate BEFORE comparison — the round-4 RED-row
class (`text_inverted_index`, `emb_standardize`). This test builds every
registered query's plan (construction only, nothing executed) and
asserts the schema is scalar-only, so the class cannot recur: complex
intermediates are fine, but the final SELECT must serialize them
(array_join integer-string signatures / posexplode) as the
`mm_byte_histogram` counts contract does.
"""

import pyspark.sql.types as T

from delfos_etl_pipeline_spark import queries as Q

_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


def test_no_complex_typed_output_columns(spark, sf_dir):
    offenders = {}
    for name, fn in Q.queries().items():
        df = fn(spark, sf_dir)
        bad = [
            f.name for f in df.schema.fields if isinstance(f.dataType, _COMPLEX)
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "registered queries emit complex-typed (array/map/struct) output "
        f"columns the driver cannot canonicalize: {offenders}"
    )


def test_oracle_keys_subset_of_queries():
    qs = Q.queries()
    missing = [n for n in Q.oracle_sql() if n not in qs]
    assert not missing, f"oracle_sql entries without a queries() twin: {missing}"


def test_round_window_names_all_registered():
    """Every _R8_* window entry must resolve in QUERIES — a
    claimed-but-unshipped name fails here instead of being silently
    dropped (ADVICE r6). _driver_order() also asserts this at runtime."""
    from delfos_etl_pipeline_spark import queries as qpkg

    for n in (
        qpkg._R8_NEW + qpkg._R8_RECERT + qpkg._R8_STALE_REFRESH
        + qpkg._R7_NEW + qpkg._R7_RECERT
    ):
        assert n in qpkg.QUERIES, n


def test_stale_refresh_no_duplicates():
    from delfos_etl_pipeline_spark import queries as qpkg

    names = qpkg._R8_STALE_REFRESH
    assert len(names) == len(set(names))
