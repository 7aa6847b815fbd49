"""Session-scoped Ray fixture — ONE ray.init per pytest session."""

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    # nested list<struct> header columns are not tensors; uniform-length
    # batches otherwise trip the TensorArray cast in to_pandas()
    ctx.enable_tensor_extension_casting = False
    yield ray
    ray.shutdown()
