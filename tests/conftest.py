"""Test harness: run everything on CPU with 8 fake devices.

Per SURVEY.md §5: distributed tests use
``XLA_FLAGS=--xla_force_host_platform_device_count=8`` so shard_map/psum
paths are validated without a TPU slice. Must be set before jax imports.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config update is
# what actually pins the test run to CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
assert jax.default_backend() == "cpu", jax.default_backend()


# ---------------------------------------------------------------------------
# Skip hygiene (VERDICT r2 weak #8): every skip in the default run must be a
# KNOWN env-gated one. A broken import or typo that silently skips a test
# fails the session instead of masquerading as expected.
# ---------------------------------------------------------------------------

EXPECTED_SKIPS = (
    # 50k-word HCLG build, ~1 min: gated on PK2_SLOW_TESTS=1 (see CLAUDE.md)
    "test_arpa.py::test_graph_build_50k_words",
    # compiled pallas-in-shard_map has no interpret-mode path (upstream vma
    # limitation); runs on the real chip via `bench.py --check` ce_mesh
    "test_parallel.py::test_pallas_lstm_inside_shard_map",
)

_unexpected_skips = []


def pytest_runtest_logreport(report):
    if report.skipped and not any(p in report.nodeid for p in EXPECTED_SKIPS):
        _unexpected_skips.append(f"{report.nodeid}: {report.longrepr}")


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_den_pdf_hint():
    """The den-graph pdf-set routing hint (ops/fb_lattice.set_den_pdf_ids)
    is process-global by design — the trainer CLIs set it once per run. An
    in-process CLI test (test_se/test_cli_tools run train_se mains) must not
    leak it into later kernel tests: the one-hot GEMM route silently zeroes
    contributions from pdfs outside the declared set."""
    from pykaldi2_tpu.ops.fb_lattice import set_den_pdf_ids

    set_den_pdf_ids(None)
    yield
    set_den_pdf_ids(None)


def pytest_sessionfinish(session, exitstatus):
    if _unexpected_skips:
        print("\nUNEXPECTED SKIPS — env-gated skips must be allowlisted in "
              "tests/conftest.py EXPECTED_SKIPS:")
        for n in _unexpected_skips:
            print("  " + n)
        session.exitstatus = 1
