"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding/halo-exchange logic
is validated on host-platform virtual devices (the standard JAX testing
pattern, replacing the reference's backend-switch conftest,
/root/reference/tests/conftest.py:12-23). Must run before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: env may preset a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate" not in flags:
    # XLA's CPU collective rendezvous hard-ABORTS the process when a
    # participant is >40 s late. Interpret-mode Pallas runs every
    # device's kernel body serially through Python callbacks, so late
    # participants are NORMAL under suite-level memory/cache pressure —
    # the full-suite SIGABRT in test_distributed (r4) was exactly this.
    # Slow is fine; dead is not.
    # r5: the round-5 machine adds ~60% hypervisor CPU steal on 2
    # cores, and 1200 s was still exceeded mid-suite.
    flags += (
        " --xla_cpu_collective_call_terminate_timeout_seconds=7200"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
        " --xla_cpu_collective_timeout_seconds=7200"
    )
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# The axon sitecustomize pins jax_platforms at interpreter start; the env
# var alone does not win. Re-pin to the virtual CPU mesh for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


# Harden Pallas interpret mode against its global-state races (the
# full-suite deadlock, r5) — shared with __graft_entry__.dryrun_multichip,
# which runs WITHOUT this conftest; diagnosis and details live in the
# module docstring.
from keras_geometric_tpu.utils.interpret_hardening import (  # noqa: E402
    harden_interpret_mode,
)

harden_interpret_mode()


@pytest.fixture(autouse=True)
def _reset_interpret_state():
    """Reset Pallas interpret-mode's GLOBAL shared memory between tests.

    interpret_pallas_call keeps one module-level SharedMemory whose
    threading.Barrier is sized to the first multi-device program's
    device count; stale state from an earlier test deadlocks later
    shard_map+interpret tests (threads parked in _barrier until the XLA
    CPU collective rendezvous hard-aborts the process ~40 s later —
    the full-suite SIGABRT at tests/test_distributed.py, r4)."""
    yield
    try:
        # Drain in-flight async programs FIRST: resetting the interpret
        # globals under a still-running program (jax dispatch is async)
        # strands its device threads at a barrier nobody else will join
        # — on this 2-core box that deadlock starves forever (the
        # full-suite hang at test_distributed, r4).
        jax.effects_barrier()
        from jax._src.pallas.mosaic.interpret.interpret_pallas_call import (
            reset_tpu_interpret_mode_state,
        )

        reset_tpu_interpret_mode_state()
    except Exception:
        pass


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled programs between test modules: hundreds of cached
    executables inflate RSS and slow the interpret-mode device threads
    enough to trip collective rendezvous timeouts (see XLA_FLAGS above)."""
    yield
    try:
        jax.clear_caches()
    except Exception:
        pass


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture
def small_graph():
    """The golden 4-node test graph mirroring the reference's fixture shape
    (tests/test_message_passing.py:54-80): edges into node 0 from 1,2; into
    node 1 from 0; into node 3 from 2."""
    x = np.array(
        [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0], [7.0, 8.0]], dtype=np.float32
    )
    # (sender, receiver) pairs
    edge_index = np.array(
        [[1, 2, 0, 2], [0, 0, 1, 3]], dtype=np.int32
    )
    return x, edge_index
