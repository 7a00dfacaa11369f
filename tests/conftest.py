"""Test configuration.

Tests run on CPU with 8 virtual devices so sharding/multi-chip paths are
exercised without TPU hardware (SURVEY.md §4: emulate N hosts/chips with
xla_force_host_platform_device_count).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The env var alone is not enough: platform plugins (e.g. the axon TPU
# tunnel) can take priority over JAX_PLATFORMS, so pin the platform through
# the config API before any backend initializes.
import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the Pallas interpret-mode tests are
# dominated by XLA CPU compile time (the unrolled 128-step kernel bodies
# take 1-4 min each to compile); caching makes repeat suite runs ~5x
# faster. The cache-write segfaults observed 2026-08-17 were mmap-count
# exhaustion (see the map guard below), not cache corruption — with the
# guard in place the cache is safe. Set JAX_CACHE_DIR= (empty) to disable.
#
# The dir is suffixed with a host-CPU fingerprint: XLA:CPU AOT results
# embed the compile machine's feature set, and this box migrates between
# hosts with different CPUs — loading a stale entry warns "could lead to
# execution errors such as SIGILL" (observed 2026-08-17).


def _cpu_fingerprint() -> str:
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    return "nofp"


_cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache_gsa_tests")
if _cache_dir:
    _cache_dir = f"{_cache_dir}_{_cpu_fingerprint()}"
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run the slow tier (multi-hour XLA:CPU compiles) too",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-hour-compile tier; excluded by default — run the "
        "full battery with --runslow (or select it alone with -m slow)",
    )


def pytest_collection_modifyitems(config, items):
    # Two tiers (CLAUDE.md): the default run must stay well under an
    # hour on this 1-CPU box; the ~4 multi-hour XLA:CPU-compile tests
    # run only with --runslow or an explicit -m expression naming slow.
    if config.getoption("--runslow") or "slow" in (
        config.getoption("-m") or ""
    ):
        return
    skip = pytest.mark.skip(
        reason="slow tier (use --runslow for the full battery)"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


RESRC = os.path.join(os.path.dirname(__file__), "..", "resrc")

# Every XLA:CPU executable holds ~40+ mmaps for the life of the process
# (measured); a full-suite run compiles enough programs to exhaust
# vm.max_map_count (default 65530), at which point LLVM's JIT dies with
# "LLVM compilation error: Cannot allocate memory" followed by a
# segfault/abort. jax.clear_caches() releases the maps, so drop caches
# whenever the process's map count nears the limit.
_MAPS_FILE = "/proc/self/maps"


def _n_maps() -> int:
    try:
        with open(_MAPS_FILE) as f:
            return sum(1 for _ in f)
    except OSError:
        return 0


def _map_guard_threshold() -> int:
    try:
        with open("/proc/sys/vm/max_map_count") as f:
            limit = int(f.read())
    except (OSError, ValueError):
        limit = 65530
    return int(limit * 0.6)


_MAP_GUARD = _map_guard_threshold()


@pytest.fixture(autouse=True)
def _jit_map_guard():
    yield
    if _n_maps() > _MAP_GUARD:
        jax.clear_caches()


@pytest.fixture(scope="session")
def subst_data():
    from gpuseqalign_tpu.io.subst import parse_subst_file

    return parse_subst_file(os.path.join(RESRC, "subst.json"))


@pytest.fixture(scope="session")
def blosum62(subst_data):
    return subst_data.subst_map["blosum62"]


@pytest.fixture(scope="session")
def seq_data(subst_data):
    from gpuseqalign_tpu.io.fasta import parse_seq_file

    return parse_seq_file(
        os.path.join(RESRC, "seq_generated.fa"), subst_data.letter_map
    )


def random_seq(rng, n, letters=25):
    """Random sequence WITH the prepended header element."""
    body = rng.integers(0, letters, size=n, dtype=np.int32)
    return np.concatenate([np.zeros(1, np.int32), body])


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
