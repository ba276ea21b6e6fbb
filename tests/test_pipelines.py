"""Job-parity map integrity: every mapped query exists and runs."""

from __future__ import annotations

import importlib

import pytest

from flink_spark.pipelines import JOBS, run_job
from flink_spark.registry import all_queries

from conftest import SF_DIR


def test_every_mapped_query_exists():
    catalog = all_queries()
    for job, parity in JOBS.items():
        for q in parity.queries:
            assert q in catalog, f"{job} maps to unknown query {q}"


def test_every_streaming_ref_resolves():
    for job, parity in JOBS.items():
        for ref in parity.streaming:
            mod_name, fn_name = ref.rsplit(".", 1)
            mod = importlib.import_module(f"flink_spark.streaming.{mod_name}")
            assert hasattr(mod, fn_name), f"{job}: missing streaming op {ref}"


@pytest.mark.parametrize("job", sorted(JOBS))
def test_job_runs(job, spark):
    outs = run_job(spark, SF_DIR, job)
    for name, df in outs.items():
        assert df.count() >= 0, f"{job}/{name}"


def test_operator_coverage_references_resolve():
    from flink_spark.pipelines import OPERATOR_COVERAGE

    catalog = all_queries()
    for op, (_impl, evidence) in OPERATOR_COVERAGE.items():
        for ev in evidence:
            if "::" in ev:  # a test reference: file must exist
                path = ev.split("::")[0]
                assert (
                    __import__("os").path.exists(f"/root/repo/{path}")
                ), f"{op}: missing test file {ev}"
            else:
                assert ev in catalog, f"{op}: unknown query {ev}"
