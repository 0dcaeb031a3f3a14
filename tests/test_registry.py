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


_SPARK_INT_WIDTH = {
    T.ByteType: 8,
    T.ShortType: 16,
    T.IntegerType: 32,
    T.LongType: 64,
}
_DUCK_INT_WIDTH = {
    "TINYINT": 8, "UTINYINT": 8,
    "SMALLINT": 16, "USMALLINT": 16,
    "INTEGER": 32, "UINTEGER": 32,
    "BIGINT": 64, "UBIGINT": 64,
    "HUGEINT": 128, "UHUGEINT": 128,
}


def test_integer_width_matches_oracle(spark, sf_dir):
    """Cross-engine integer WIDTH audit (VERDICT r8 item 1). The driver's
    canonicalizer compares dtype width, so a Spark INT column against a
    DuckDB BIGINT oracle column (Spark size()/octet_length()/posexplode
    pos are INT; DuckDB len()/octet_length() are BIGINT) fails the
    schema gate even when every value matches — the text_langid /
    mm_binary_meta class. Mostly plan-construction + DuckDB DESCRIBE,
    so the registry audits in seconds — EXCEPT the persisted-index
    queries (sim_ivf_probe, sim_pq_probe, dedup_minhash_incremental_
    indexed, ...): constructing their plans builds and writes the index
    on first call (real Spark jobs) and seeds the process-global
    per-(process, sf_dir) index caches. That cost and side effect are
    accepted deliberately (ADVICE r9): exempting them would drop the
    width audit for exactly the queries whose restored-parquet schemas
    are most at risk of width drift, and the caches they seed are the
    same build-once state any in-process consumer shares."""
    import os

    import duckdb

    from delfos_etl_pipeline_spark.sources.parquet import TABLES

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    qs, oracles = Q.queries(), Q.oracle_sql()
    offenders = {}
    for name, fn in qs.items():
        if name not in oracles:
            continue
        spark_width = {
            f.name: _SPARK_INT_WIDTH[type(f.dataType)]
            for f in fn(spark, sf_dir).schema.fields
            if type(f.dataType) in _SPARK_INT_WIDTH
        }
        if not spark_width:
            continue
        duck_types = dict(
            con.execute(f"DESCRIBE {oracles[name]}")
            .df()[["column_name", "column_type"]]
            .itertuples(index=False, name=None)
        )
        for col, sw in spark_width.items():
            dw = _DUCK_INT_WIDTH.get(duck_types.get(col, ""))
            if dw is not None and dw != sw:
                offenders[f"{name}.{col}"] = f"spark int{sw} vs oracle int{dw}"
    assert not offenders, (
        "integer width drift between Spark plan and DuckDB oracle "
        f"(driver schema_match hazard): {offenders}"
    )


def test_oracle_keys_subset_of_queries():
    qs = Q.queries()
    missing = [n for n in Q.oracle_sql() if n not in qs]
    assert not missing, f"oracle_sql entries without a queries() twin: {missing}"


def test_round_window_names_all_registered():
    """Every _R12_*/_R11_*/_R10_*/_R9_*/_R8_* window entry must resolve
    in QUERIES — a claimed-but-unshipped name fails here instead of
    being silently dropped (ADVICE r6). _driver_order() also asserts
    this at runtime."""
    from delfos_etl_pipeline_spark import queries as qpkg

    for n in (
        qpkg._R15_R8_LEAD + qpkg._R15_RECERT + qpkg._R15_NEW
        + qpkg._R15_R9_FILL
        + qpkg._R14_R7_LEAD + qpkg._R14_RECERT + qpkg._R14_NEW
        + qpkg._R14_R8_FILL
        + qpkg._R13_RECERT + qpkg._R13_NEW + qpkg._R13_R6_REFRESH
        + qpkg._R13_R7_FILL
        + qpkg._R12_RECERT + qpkg._R12_NEW + qpkg._R12_STALE_REFRESH
        + qpkg._R12_R6_FILL
        + qpkg._R11_RECERT + qpkg._R11_NEW + qpkg._R11_STALE_REFRESH
        + qpkg._R11_R5_FILL
        + qpkg._R10_RECERT + qpkg._R10_NEW + qpkg._R10_STALE_REFRESH
        + qpkg._R10_R4_REFRESH
        + qpkg._R9_NEW + qpkg._R9_RECERT + qpkg._R9_STALE_REFRESH
        + qpkg._R9_TWIN_RECERT
        + qpkg._R8_NEW + qpkg._R8_RECERT + qpkg._R8_STALE_REFRESH
        + qpkg._R7_NEW + qpkg._R7_RECERT
    ):
        assert n in qpkg.QUERIES, n


def test_stale_refresh_no_duplicates():
    """The r16 window is EXACTLY the driver's ~50-slot capacity — a
    duplicate or an overflow silently pushes a claimed re-cert out."""
    from delfos_etl_pipeline_spark import queries as qpkg

    names = qpkg._R16_RECERT + qpkg._R16_R9_FILL
    assert len(names) == len(set(names))
    assert len(names) == 50, len(names)


def test_bench_validate_record_stamped_at_head():
    """The committed bench_validate.json must be produced by the SHIPPED
    engine (VERDICT r14 item 1, third round of the stale-record genus:
    code landing after the validated record shipped an unvalidated
    number every time, and nothing failed). The validator stamps
    engine_tree_hash() — a content hash of every timing-relevant file —
    into the record when it writes it; this test FAILS whenever the
    working tree's engine no longer matches the record's stamp, so an
    engine commit after the record breaks the build instead of
    shipping. Fix = re-run `python bench.py` then
    `python tools/bench_validate.py` (ALONE) and commit the record."""
    import importlib.util
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_validate", os.path.join(repo, "tools", "bench_validate.py")
    )
    bv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bv)
    with open(os.path.join(repo, "bench_validate.json")) as f:
        rec = json.load(f)
    stamp = rec.get("engine_tree_sha256")
    assert stamp is not None, (
        "bench_validate.json carries no engine_tree_sha256 stamp — it "
        "predates the round-15 record discipline (or was written by an "
        "external tool); re-run bench.py + tools/bench_validate.py"
    )
    head = bv.engine_tree_hash()
    assert stamp == head, (
        "bench_validate.json was recorded on a DIFFERENT engine tree "
        f"(record {stamp[:12]}…, working tree {head[:12]}…) — the "
        "validated numbers do not describe the shipped code; re-run "
        "bench.py + tools/bench_validate.py at HEAD and commit the record"
    )
