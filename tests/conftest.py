import os
import sys

# before numpy loads: threaded OpenBLAS costs 0.8-6 s on each process's
# first dgemm on this host; Ray workers inherit the var via ray.init
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# nominal hash-aggregator CPU accounting for the whole test session --
# an explicit entry-point call (importing balrog_ray alone no longer
# mutates the global DataContext), before any test creates a Dataset
import balrog_ray  # noqa: E402

balrog_ray.tune_data_context()


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole test run (local mode, 4 CPUs);
    only shuts down a session it started itself."""
    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray:
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True)
    yield
    if owns_ray:
        ray.shutdown()
